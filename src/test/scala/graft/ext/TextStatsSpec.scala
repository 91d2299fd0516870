package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class TextStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("token counts: whitespace and BPE-ish") {
    val df = Seq("hello world", "a b  c", "don't stop 42!").toDF("t")
    val got = df.select(TextStats.tokensWs(col("t")), TextStats.tokensBpeish(col("t")))
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(got(0) == ((2, 2)))
    assert(got(1) == ((3, 3)))
    // don't -> don,',t ; 42 -> 4,2 ; ! -> ! => 3+2+1+2 = 8? (stop=1) => don(1)+'(1)+t(1)+stop(1)+4(1)+2(1)+!(1)=7
    assert(got(2) == ((3, 7)))
  }

  test("langId picks the language with most stopword hits") {
    val df = Seq(
      "the cat sat on the mat and it is nice",
      "el gato y la casa de los perros",
      "der hund und die katze ist nicht hier",
      "zzz qqq www" // no stopwords at all
    ).toDF("text")
    val got = df.select(TextStats.langId(col("text"))).collect().map(_.getString(0))
    assert(got.toSeq == Seq("en", "es", "de", "und"))
  }

  test("fingerprint is invariant to word order and repetition") {
    val df = Seq(("b a c a", "c b a"), ("a b", "a c")).toDF("x", "y")
    val got = df.select(
      (TextStats.fingerprint(col("x")) === TextStats.fingerprint(col("y"))).as("eq"))
      .collect().map(_.getBoolean(0))
    assert(got.toSeq == Seq(true, false))
  }

  test("rollingHash is deterministic and order-sensitive") {
    val df = Seq(("abc", "abc"), ("abc", "acb")).toDF("x", "y")
    val got = df.select(
      (TextStats.rollingHash(col("x")) === TextStats.rollingHash(col("y"))).as("eq"))
      .collect().map(_.getBoolean(0))
    assert(got.toSeq == Seq(true, false))
  }

  test("quality score stays within [0, 1]") {
    val docs = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
    val mm = docs.select(min(TextStats.qualityScore(col("text"))),
      max(TextStats.qualityScore(col("text")))).first()
    assert(mm.getDouble(0) >= 0.0 && mm.getDouble(1) <= 1.0)
  }

  test("repetitionRatio: repeated 3-grams counted, short docs are 0") {
    // "a b c" ×3 → 7 shingles, 3 distinct → 1 - 3/7
    val df = Seq("a b c a b c a b c", "a b", "u v w x y z").toDF("text")
    val got = df.select(TextStats.repetitionRatio(col("text"), 3)).collect().map(_.getDouble(0))
    assert(got.toSeq == Seq(0.571429, 0.0, 0.0))
  }

  test("ngram_stats native kernel: parity with the interpreted wordShingles HOF on fixture docs") {
    val docs = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
    val sh = Dedup.wordShingles(col("text"), 3)
    val mismatches = docs.select(
        graft.functions.text.ngram_stats(col("text"), 3).as("st"),
        size(sh).as("h_total"),
        size(array_distinct(sh)).as("h_distinct"))
      .filter(col("st.n_ngrams") =!= col("h_total") ||
        col("st.n_distinct") =!= col("h_distinct"))
      .count()
    assert(mismatches == 0)
  }

  test("ngram_stats edge cases: short text, empty string, repeated trailing spaces") {
    // "" splits to [""] (1 word) -> (0,0); "a b  c" splits on single space
    // to ["a","b","","c"] -> 2 shingles
    val df = Seq("", "a b", "a b  c", "x x x x").toDF("text")
    val got = df.select(graft.functions.text.ngram_stats(col("text"), 3).as("st"))
      .select(col("st.n_ngrams"), col("st.n_distinct"))
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(got.toSeq == Seq((0, 0), (0, 0), (2, 2), (2, 1)))
  }

  test("text_profile native kernel: parity with the relational building blocks on fixture docs + edges") {
    val docs = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
      .select("text")
      .unionByName(Seq("", " ", "a", "the the the", "¡hola! señor,  tab\there",
        " padded  ", "x@y !!",
        // supplementary (non-BMP) chars: length()/regexp_replace count code
        // points, so each emoji is ONE char and ONE punct, not two units
        "😀 the 😀😀 ok", "a😀b").toDF("text"))
    val stops = TextStats.LangStopwords.flatMap(_._2)
    val st = graft.functions.text.text_profile(col("text"), stops)
    val mismatches = docs.select(
        st.getField("n_tokens_ws").as("a1"),
        size(split(trim(col("text")), "\\s+")).as("b1"),
        st.getField("n_chars").as("a2"), length(col("text")).as("b2"),
        st.getField("n_non_space").as("a3"),
        length(regexp_replace(col("text"), "\\s", "")).as("b3"),
        st.getField("n_punct").as("a4"),
        (length(col("text")) - length(regexp_replace(col("text"), "[^A-Za-z0-9\\s]", ""))).as("b4"),
        st.getField("n_stop").as("a5"),
        TextStats.stopwordHits(col("text"), stops).as("b5"),
        st.getField("n_bpeish").as("a6"),
        TextStats.tokensBpeish(col("text")).as("b6"))
      .filter(col("a1") =!= col("b1") || col("a2") =!= col("b2") ||
        col("a3") =!= col("b3") || col("a4") =!= col("b4") ||
        col("a5") =!= col("b5") || col("a6") =!= col("b6"))
      .count()
    assert(mismatches == 0)
  }

  test("lang_stop_hits native kernel: parity with the per-language filter-HOF on fixture docs") {
    val docs = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
      .select("text")
      .unionByName(Seq("", "the el der le", "the the the").toDF("text"))
    val hits = graft.functions.text.lang_stop_hits(col("text"),
      TextStats.LangStopwords.map(_._2))
    val checks = TextStats.LangStopwords.zipWithIndex.map { case ((_, sw), i) =>
      (element_at(hits, i + 1) =!= TextStats.stopwordHits(col("text"), sw)).as(s"m$i")
    }
    val mismatches = docs.select(checks: _*)
      .filter(checks.indices.map(i => col(s"m$i")).reduce(_ || _)).count()
    assert(mismatches == 0)
  }

  test("cleanText masks emails and URLs and collapses whitespace") {
    val df = Seq(
      "Contact john.doe@example.com   or https://foo.bar/baz?q=1 \t now",
      "  no pii   here  ").toDF("text")
    val got = df.select(TextStats.cleanText(col("text"))).collect().map(_.getString(0))
    assert(got(0) == "Contact <EMAIL> or <URL> now")
    assert(got(1) == "no pii here")
  }

  test("scrubPii masks SSN / phone / IPv4 and leaves near-misses intact") {
    val df = Seq(
      "ssn 123-45-6789 phone 415-555-0134 host 10.1.2.3 done",
      // near-misses: extra leading digit breaks \b, 3-3-4 is not an SSN,
      // a dotted triple is not an IPv4
      "id 1234-567-8901 ref 12-345-6789 v 1.2.3 ok",
      "") .toDF("t")
    val got = df.select(TextStats.scrubPii(col("t"))).collect().map(_.getString(0))
    assert(got(0) == "ssn <SSN> phone <PHONE> host <IP> done")
    assert(got(1) == "id 1234-567-8901 ref 12-345-6789 v 1.2.3 ok")
    assert(got(2) == "")
  }

  test("piiCounts audits each kind independently") {
    val df = Seq(
      "a 111-22-3333 b 222-33-4444 c 415-555-0134 d 192.168.0.1 e 8.8.8.8 f 1.2.3.4").toDF("t")
    val (s, p, i) = TextStats.piiCounts(col("t"))
    val r = df.select(s, p, i).head()
    assert((r.getInt(0), r.getInt(1), r.getInt(2)) == ((2, 1, 3)))
  }
}

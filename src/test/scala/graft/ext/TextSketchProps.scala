package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Property checks: the native text-sketch expressions agree with
  * independent Spark-built-in derivations on random texts (including
  * empty words from repeated spaces, unicode, and short texts).
  */
class TextSketchProps extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val wordGen: Gen[String] =
    Gen.oneOf(Gen.alphaNumStr.map(_.take(6)), Gen.const(""),
      Gen.oneOf("naïve", "Ωmega", "日本", "a#b"))
  private val textGen: Gen[String] =
    Gen.listOfN(8, wordGen).map(_.mkString(" ")).flatMap(t =>
      Gen.oneOf(t, t.trim, ""))

  private def assertHolds(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), p)
    assert(res.passed, res.status.toString)
  }

  test("MinHashSig == explode+min(md5) built-in derivation on random texts") {
    assertHolds(Prop.forAll(Gen.listOfN(5, textGen)) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = docs.select(col("doc_id"),
          graft.functions.text.minhash_sig(col("text"), 2, 4).as("mh"))
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) null else r.getSeq[String](1).toList)).toMap
      val tok = docs.select(col("doc_id"), split(col("text"), " ").as("ws"))
      val sh = tok.filter(size(col("ws")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(ws) - 1), __i -> " +
            "concat_ws(' ', element_at(ws, __i), element_at(ws, __i + 1)))")).as("sh"))
      val aggs = (0 until 4).map(i =>
        min(md5(concat(lit(s"$i|"), col("sh")))).as(s"m$i"))
      val expected = sh.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
        .collect().map(r => r.getLong(0) -> (1 to 4).map(r.getString).toList).toMap
      docs.collect().forall { r =>
        val id = r.getLong(0)
        expected.get(id) match {
          case Some(e) => got(id) == e
          case None    => got(id) == null // < n words
        }
      }
    })
  }

  test("TextProfile == relational building blocks on random texts incl. supplementary chars") {
    val profWordGen: Gen[String] =
      Gen.oneOf(Gen.alphaNumStr.map(_.take(6)), Gen.const(""), Gen.const("the"),
        Gen.oneOf("naïve", "Ωmega", "日本", "a#b", "😀", "a😀b", "x\ty", "¡!"))
    val profTextGen: Gen[String] =
      Gen.listOfN(8, profWordGen).map(_.mkString(" ")).flatMap(t =>
        Gen.oneOf(t, t.trim, " " + t + "  ", ""))
    val stops = TextStats.LangStopwords.flatMap(_._2)
    assertHolds(Prop.forAll(Gen.listOfN(6, profTextGen)) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val st = graft.functions.text.text_profile(col("text"), stops)
      docs.select(
          (st.getField("n_tokens_ws") === size(split(trim(col("text")), "\\s+"))).as("c1"),
          (st.getField("n_chars") === length(col("text"))).as("c2"),
          (st.getField("n_non_space") ===
            length(regexp_replace(col("text"), "\\s", ""))).as("c3"),
          (st.getField("n_punct") === (length(col("text")) -
            length(regexp_replace(col("text"), "[^A-Za-z0-9\\s]", "")))).as("c4"),
          (st.getField("n_stop") === TextStats.stopwordHits(col("text"), stops)).as("c5"),
          (st.getField("n_bpeish") === TextStats.tokensBpeish(col("text"))).as("c6"))
        .collect().forall(r => (0 until 6).forall(r.getBoolean))
    })
  }

  test("Md5WinnowedFingerprints == HOF slice-min built-in derivation on random ASCII texts") {
    // the independent derivation is the pre-kernel SQL formulation: gram
    // array of md5 hex hashes → every w-window's array_min → distinct.
    // ASCII-only texts (the kernel windows bytes, the HOF windows chars —
    // identical on ASCII, which is also the DuckDB oracle's domain).
    val asciiGen: Gen[String] = for {
      n <- Gen.choose(0, 30)
      cs <- Gen.listOfN(n, Gen.oneOf(('a' to 'e') :+ ' '))
    } yield cs.mkString
    val (l, w) = (6, 3)
    assertHolds(Prop.forAll(Gen.listOfN(6, asciiGen)) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = docs
        .select(col("doc_id"), explode(
          graft.functions.text.md5_winnowed_fingerprints(col("text"), l, w)).as("h"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val expected = docs.filter(length(col("text")) >= l)
        .select(col("doc_id"),
          expr(s"transform(sequence(1, length(text) - ${l - 1}), " +
            s"__i -> md5(cast(substring(text, __i, $l) AS BINARY)))").as("g"))
        .select(col("doc_id"), explode(expr(
          s"array_distinct(transform(sequence(1, greatest(size(g) - ${w - 1}, 1)), " +
            s"__j -> array_min(slice(g, __j, $w))))")).as("h"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      got == expected
    })
  }

  test("SimHash64 == xxhash64 bit-vote built-in derivation on random texts") {
    assertHolds(Prop.forAll(Gen.listOfN(5, textGen)) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = docs.select(col("doc_id"),
          graft.functions.text.simhash64(col("text")).as("sh"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expected = docs
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .select(col("doc_id"), xxhash64(col("w")).as("h"),
          explode(sequence(lit(0), lit(63))).as("b"))
        .groupBy("doc_id", "b")
        .agg(sum(when(expr("(shiftright(h, b) & 1) = 1"), 1L).otherwise(-1L)).as("s"))
        .groupBy("doc_id")
        .agg(sum(when(col("s") > 0, expr("shiftleft(1L, b)")).otherwise(0L)).as("sim"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == expected
    })
  }
}

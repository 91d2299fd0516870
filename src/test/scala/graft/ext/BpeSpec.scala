package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("learns the classic merges on the Sennrich vocabulary") {
    // {"low":5,"lower":2,"newest":6,"widest":3} — the worked example
    // from the BPE paper. Hand computation:
    //   r1: es=9 ties st=9 → (e,s) by pair order;  apply: new es t / wid es t
    //   r2: (es,t)=9 → est
    //   r3: lo=7 ties ow=7 → (l,o)
    val words = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("word", "freq")
    val m = Bpe.train(words, rounds = 3)
    assert(m === Seq(
      Bpe.Merge(1, "e", "s", "es", 9L),
      Bpe.Merge(2, "es", "t", "est", 9L),
      Bpe.Merge(3, "l", "o", "lo", 7L)))
  }

  test("merge application is greedy leftmost-first, non-overlapping") {
    // "aaaa": r1 counts (a,a)=3 but applies only twice → "aa aa";
    // r2 then merges (aa,aa)=1. A naive space-delimited replace would
    // produce "aa a aa"-style off-by-one placements on odd runs.
    val even = Seq(("aaaa", 1L)).toDF("word", "freq")
    assert(Bpe.train(even, 2) === Seq(
      Bpe.Merge(1, "a", "a", "aa", 3L),
      Bpe.Merge(2, "aa", "aa", "aaaa", 1L)))

    // "aaa": greedy pairs the LEFT two → "aa a", so round 2 must see
    // exactly one (aa,a) pair and no (a,aa)
    val odd = Seq(("aaa", 1L)).toDF("word", "freq")
    assert(Bpe.train(odd, 2) === Seq(
      Bpe.Merge(1, "a", "a", "aa", 2L),
      Bpe.Merge(2, "aa", "a", "aaa", 1L)))
  }

  test("train symbolizes words containing a newline character by character") {
    // the symbolization regex needs (?s): without it Java '.' refuses to
    // match at '\n', the word "a\nb" stays unsplit, and round 1 sees no
    // pairs — while the DuckDB oracle's string_split splits every char
    // "a\nb" → "a \n b"; pairs (a,\n) and (\n,b) tie at 4, and the
    // (cnt desc, lft, rgt) break picks lft "\n" (0x0A) before "a"
    val words = Seq(("a\nb", 4L)).toDF("word", "freq")
    val m = Bpe.train(words, rounds = 2)
    assert(m === Seq(
      Bpe.Merge(1, "\n", "b", "\nb", 4L),
      Bpe.Merge(2, "a", "\nb", "a\nb", 4L)))
  }

  test("trainTable runs end-to-end from documents and orders rounds") {
    val docs = Seq((0L, "low low lower newest"), (1L, "newest widest low"))
      .toDF("doc_id", "text")
    val t = Bpe.trainTable(docs, "text", rounds = 4).collect()
    assert(t.length === 4)
    assert(t.map(_.getInt(0)).toSeq === Seq(1, 2, 3, 4))
    // every merged form is the concatenation of its pair
    assert(t.forall(r => r.getString(3) === r.getString(1) + r.getString(2)))
  }

  /** Independent reference encode: symbols as a vector, one exhaustive
    * leftmost-greedy pass per merge in rank order — the textbook
    * Sennrich apply, sharing NO code with the sentinel-replace fold it
    * checks.
    */
  private def refEncode(text: String, merges: Seq[(String, String)]): Seq[String] = {
    var syms = text.map(c => if (c == ' ') "\u0002" else c.toString).toVector
    for ((a, b) <- merges) {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.result()
    }
    syms
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("applyMerges: hand-computed encode, word boundaries, rank order") {
    val merges = Seq("t" -> "h", "th" -> "e", "a" -> "t")
    // "the that " + boundary: 'e' of 'the' can never merge across the
    // space with 't' of 'that'; (a,t) applies AFTER (t,h) consumed the
    // leading t of 'that', so only the 'at' survives as a pair
    val docs = Seq((1L, "the that"), (2L, ""), (3L, "a a a")).toDF("doc_id", "text")
    val got = Bpe.applyMerges(docs, "doc_id", "text", merges)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // the → [the]; that → [th, at... no: (a,t) rank-3 merges a+t → at]
    val exp1 = Seq("the", "\u0002", "th", "at")
    assert(got(0) === ((1L, 4L, md5hex(exp1.mkString(" ")))))
    assert(got(1) === ((2L, 0L, md5hex(""))))
    // no merge matches "a a a" (space marks intervene) → 5 symbols
    assert(got(2)._2 === 5L)
  }

  test("applyMerges == independent reference encode on randomized texts") {
    val merges = Bpe.FixtureMerges
    val rnd = new scala.util.Random(4242)
    val alpha = "abcdef0123 thenorst"
    val texts = (0 until 60).map { i =>
      i.toLong -> (0 until (1 + rnd.nextInt(40)))
        .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    }
    val docs = texts.toDF("doc_id", "text")
    val got = Bpe.applyMerges(docs, "doc_id", "text", merges)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    texts.zip(got).foreach { case ((id, text), (gid, n, h)) =>
      val ref = refEncode(text, merges)
      assert(gid === id)
      assert(n === ref.length.toLong,
        s"token count diverged on doc $id text='$text': got $n, ref ${ref.length} (${ref.mkString("|")})")
      assert(h === md5hex(ref.mkString(" ")),
        s"token sequence diverged on doc $id text='$text' ref=${ref.mkString("|")}")
    }
  }

  test("train -> applyMerges round trip compresses the training corpus") {
    val docs = Seq((0L, "low low lower newest newest newest widest"),
      (1L, "newest widest low lower")).toDF("doc_id", "text")
    val merges = Bpe.train(Bpe.wordCounts(docs, "text"), rounds = 6)
      .map(m => m.lft -> m.rgt)
    val n = Bpe.applyMerges(docs, "doc_id", "text", merges)
      .agg(org.apache.spark.sql.functions.sum("n_tokens")).collect()(0).getLong(0)
    val raw = Bpe.applyMerges(docs, "doc_id", "text", Seq.empty)
      .agg(org.apache.spark.sql.functions.sum("n_tokens")).collect()(0).getLong(0)
    assert(n < raw, s"6 learned merges must shrink the corpus: $n vs $raw")
  }
}

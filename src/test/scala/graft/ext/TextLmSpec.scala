package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class TextLmSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hand-computed add-k bigram surprisal on a tiny corpus") {
    // LM slice = doc 0: "a b a b" → bigrams (a,b)×2, (b,a)×1;
    // c1(a)=2, c1(b)=1; V = |{a,b}| = 2
    val docs = Seq((0L, "a b a b"), (1L, "a b"), (2L, "b c"))
      .toDF("doc_id", "text")
    val out = TextLm.scoreDocs(docs, "doc_id", "text", col("doc_id") === 0)
      .orderBy("doc_id").collect()
    val v = 2.0
    def nll(c12: Long, c1: Long): Double =
      BigDecimal(-math.log((c12 + 0.5) / (c1 + 0.5 * v)))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 1: one bigram (a,b): seen c12=2, c1=2
    val d1 = nll(2, 2)
    // doc 2: one bigram (b,c): unseen pair, c1(b)=1
    val d2 = nll(0, 1)
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((1L, 1L), (2L, 1L)))
    assert(math.abs(out(0).getDouble(2) - math.rint(d1 * 1e6) / 1e6) < 1e-9)
    assert(math.abs(out(1).getDouble(2) - math.rint(d2 * 1e6) / 1e6) < 1e-9)
  }

  test("fluent text scores lower surprisal than scrambled vocabulary") {
    // LM slice repeats a fixed phrasing; the in-distribution doc must
    // beat the doc built from out-of-vocabulary words
    val phrase = "the quick brown fox jumps over the lazy dog"
    val docs = (0L until 13L).map(i => (i * 13L, phrase)) ++
      Seq((1L, phrase), (2L, "zq xv wk jj pp qq rr ss tt"))
    val out = TextLm.scoreDocs(docs.toDF("doc_id", "text"),
        "doc_id", "text", col("doc_id") % 13 === 0)
      .filter(col("doc_id").isin(1L, 2L))
      .orderBy("doc_id").collect()
    assert(out.length == 2)
    assert(out(0).getDouble(2) < out(1).getDouble(2),
      s"in-distribution ${out(0).getDouble(2)} must beat OOV ${out(1).getDouble(2)}")
  }

  test("docs shorter than two tokens are absent, never scored") {
    val docs = Seq((0L, "a b c"), (1L, "solo"), (2L, "x y"))
      .toDF("doc_id", "text")
    val ids = TextLm.scoreDocs(docs, "doc_id", "text", col("doc_id") === 0)
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(2L))
  }
}

package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class Bm25Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("searchTopK: hand-computed BM25 on a three-doc corpus") {
    // doc 1: "cat" twice in 4 tokens; doc 2: once in 4; doc 3: none.
    val docs = Seq(
      (1L, "cat cat dog bird"),
      (2L, "cat fish fish fish"),
      (3L, "dog dog bird fish")).toDF("doc_id", "text")
    val got = Bm25.searchTopK(docs, "doc_id", "text", Seq(1 -> "cat"), k = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._2)

    // N=3, avgdl=4, df(cat)=2 → idf = ln(1 + 1.5/2.5); len factor = 1
    val idf = math.log(1 + 1.5 / 2.5)
    def s(tf: Double) = BigDecimal(idf * tf * 2.2 / (tf + 1.2))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.map(_._2).toSeq == Seq(1L, 2L))
    assert(math.abs(got(0)._3 - s(2.0)) < 1e-9) // tf=2 outranks tf=1
    assert(math.abs(got(1)._3 - s(1.0)) < 1e-9)
    assert(got(0)._3 > got(1)._3)
  }

  test("searchTopK: rare terms outweigh common ones (IDF ordering)") {
    // "rare" appears in 1 of 4 docs, "common" in all 4; the doc with
    // the rare term must outrank docs with only the common term.
    val docs = Seq(
      (1L, "common rare alpha beta"),
      (2L, "common alpha beta gamma"),
      (3L, "common beta gamma delta"),
      (4L, "common gamma delta alpha")).toDF("doc_id", "text")
    val hits = Bm25.searchTopK(docs, "doc_id", "text",
        Seq(7 -> "common rare"), k = 4)
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
      .sortBy(-_._2)
    assert(hits.head._1 == 1L)
    assert(hits.head._2 > hits.tail.map(_._2).max)
    assert(hits.length == 4) // every doc matches "common"
  }

  test("searchTopK: bounded output, deterministic tie-break, multi-query") {
    val docs = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
    val res = Bm25.searchTopK(docs, "doc_id", "text",
      Seq(1 -> "hash join spark", 2 -> "window sort order"), k = 10).cache()
    val perQ = res.groupBy("qid").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(perQ.keySet == Set(1, 2))
    assert(perQ.values.forall(_ <= 10))
    assert(res.collect().forall(_.getDouble(2) > 0.0))
    res.unpersist()
  }
}

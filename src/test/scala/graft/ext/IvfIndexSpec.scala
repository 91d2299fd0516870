package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.core.Tables

class IvfIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("IVF probe recall: full-probe equals brute force, partial probe is a subset") {
    val e = Tables.load(spark, TestSpark.Sf, "embeddings")
    val q = e.filter(col("vec_id") < 5)
    val idx = IvfIndex.build(spark, e, "vec_id", "embedding", nlist = 8)
    assert(idx.assigned.count() == e.count())
    assert(idx.centroids.length == 8)

    // probing ALL lists must reproduce the exact brute-force top-k
    val full = IvfIndex.topK(spark, idx, q, "vec_id", "embedding", k = 5, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getInt(3), r.getLong(1))).sorted
    val brute = Similarity.bruteTopK(e, q, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getInt(3), r.getLong(1))).sorted
    assert(full.toSeq == brute.toSeq)

    // partial probe returns k rows per query with scores <= brute best
    val part = IvfIndex.topK(spark, idx, q, "vec_id", "embedding", k = 5, nprobe = 2)
    val bruteBest = Similarity.bruteTopK(e, q, "vec_id", "embedding", 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    part.collect().foreach(r => assert(r.getDouble(2) <= bruteBest(r.getLong(0)) + 1e-9))
  }

  test("quantizer trains on a bounded sample, assignment still covers the corpus") {
    val e = Tables.load(spark, TestSpark.Sf, "embeddings")
    val n = e.count()
    // trainPerList=4, nlist=4 → budget 16 vectors; corpus is 500+. The
    // stride sample must stay within ~2× the budget while every corpus
    // vector still lands in a posting list, and full-probe stays exact.
    val idx = IvfIndex.build(spark, e, "vec_id", "embedding", nlist = 4, trainPerList = 4)
    assert(idx.assigned.count() == n)
    val stride = math.max(1L, n / 16)
    val sampled = e.filter(
      pmod(xxhash64(col("vec_id").cast("string")), lit(stride)) === 0).count()
    assert(sampled < n && sampled <= 48, s"sample $sampled of $n not bounded")
    val q = e.filter(col("vec_id") < 3)
    val full = IvfIndex.topK(spark, idx, q, "vec_id", "embedding", k = 3, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getInt(3), r.getLong(1))).sorted
    val brute = Similarity.bruteTopK(e, q, "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(0), r.getInt(3), r.getLong(1))).sorted
    assert(full.toSeq == brute.toSeq)
  }
}

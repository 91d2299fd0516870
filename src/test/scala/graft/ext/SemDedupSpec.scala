package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class SemDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** 200 fixture vectors + a deterministic near-identical shadow of each
    * (cos ≈ 0.9996): the planted ground truth is exactly the 200
    * (base, base+10000) pairs.
    */
  private lazy val shadowed = {
    val base = graft.core.Tables.load(spark, TestSpark.Sf, "embeddings")
      .filter(col("vec_id") < 200).select(col("vec_id"), col("embedding"))
    val shadow = base.select((col("vec_id") + 10000).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        (x + when(pmod(i, lit(2)) === 0, lit(0.01f)).otherwise(lit(-0.01f)))
          .cast("float")).as("embedding"))
    base.unionByName(shadow).cache()
  }

  test("semanticDedup: planted shadows collapse onto their base, recall >= 0.95") {
    val assign = SemDedup.ivfAssignment(spark, shadowed, "vec_id", "embedding",
      targetClusterSize = 64)
    val res = SemDedup.semanticDedup(shadowed, "vec_id", "embedding",
      assign, tau = 0.99).cache()
    assert(res.count() == 400)
    val dups = res.filter(col("is_dup") === 1)
      .select("id", "kept_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // a detected shadow keeps its base (min-label CC)
    dups.foreach { case (id, kept) => assert(id == kept + 10000) }
    val recall = dups.size / 200.0
    assert(recall >= 0.95, s"planted shadow recall = $recall")
    res.unpersist()
  }

  test("clusterDupPairs: cross-cluster pairs are never produced; tau gates") {
    // two tight planted groups in disjoint clusters + one outlier
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(0.999f, 0.01f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (4L, Array(0.01f, 0.999f, 0.0f, 0.0f)),
      (5L, Array(0.0f, 0.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val assign = Seq((1L, 0), (2L, 0), (3L, 1), (4L, 1), (5L, 1))
      .toDF("id", "cl")
    val pairs = SemDedup.clusterDupPairs(vecs, "vec_id", "embedding",
        assign, tau = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (3L, 4L))) // 5 matches nobody; no cross-cluster
  }

  test("oversized clusters sub-split: bounded partitions, near-dups still found") {
    // every vector in ONE cluster, cap forces the hyperplane sub-split;
    // identical vectors share every hyperplane bucket, so planted exact
    // dups survive the split by construction
    val base = (0L until 64L).map(i =>
      (i, Array.tabulate(8)(t => math.sin(i * 8 + t).toFloat)))
    val dup = base.take(16).map { case (i, v) => (i + 1000, v) }
    val vecs = (base ++ dup).toDF("vec_id", "embedding")
    val assign = vecs.select(col("vec_id").as("id"), lit(0).as("cl"))
    val pairs = SemDedup.clusterDupPairs(vecs, "vec_id", "embedding",
        assign, tau = 0.999, maxClusterSize = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((0L until 16L).forall(i => pairs.contains((i, i + 1000))))
  }

  test("non-int cluster ids survive a non-empty hub census") {
    // regression: the hub-set rebuild assumed getInt on `cl`, which
    // crashed the first time a LONG-keyed assignment (the md5 axis-sign
    // cells) produced a census entry — i.e. only at bench scale, where a
    // cell first exceeded the cap. Same fixture as the sub-split test
    // but with a BIGINT cl.
    val base = (0L until 64L).map(i =>
      (i, Array.tabulate(8)(t => math.sin(i * 8 + t).toFloat)))
    val dup = base.take(16).map { case (i, v) => (i + 1000, v) }
    val vecs = (base ++ dup).toDF("vec_id", "embedding")
    val assign = vecs.select(col("vec_id").as("id"), lit(7L).as("cl"))
    val pairs = SemDedup.clusterDupPairs(vecs, "vec_id", "embedding",
        assign, tau = 0.999, maxClusterSize = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((0L until 16L).forall(i => pairs.contains((i, i + 1000))))
  }

  test("md5-planted oracled variant recovers most shadows, exemplar is always the base") {
    // the cross-engine-checkable assignment (dedup_semantic_md5): planted
    // shadow recall is bounded below only by sign-flip cell separation
    // (~11% at 6 sign bits with eps ±0.0125 on sd 0.126 dims), and
    // min-label CC must keep the BASE id (< shadow offset) of every
    // component formed purely of base↔shadow pairs
    val out = graft.queries.Catalog.queries("dedup_semantic_md5")(
      TestSpark.spark, TestSpark.Sf).collect()
    assert(out.length >= 400, s"expected >= 400 of 500 shadows dropped, got ${out.length}")
    assert(out.forall(_.getLong(2) < 1000000L),
      "every kept exemplar must be a base id (below the shadow offset)")
  }
}

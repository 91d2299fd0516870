package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.core.Tables

class ShardSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fixture = Tables.load(spark, TestSpark.Sf, "documents")

  test("epochShards: shards balanced to ±1, positions dense per shard") {
    val n = 8
    val got = Shard.epochShards(fixture, "doc_id", nShards = n, epoch = 3)
    val sizes = got.groupBy("shard").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sizes.keySet == (0 until n).toSet, s"missing shards: $sizes")
    assert(sizes.values.max - sizes.values.min <= 1,
      s"round-robin must balance to ±1: $sizes")
    // within each shard, pos is exactly 0..size-1 (dense, no gaps/dups)
    val dense = got.groupBy("shard").agg(
        count(lit(1)).as("c"), min("pos").as("lo"),
        max("pos").as("hi"), countDistinct("pos").as("d"))
      .filter(col("lo") =!= 0 || col("hi") =!= col("c") - 1 || col("d") =!= col("c"))
    assert(dense.isEmpty, "positions must be dense 0..size-1 per shard")
  }

  test("epochShards: same epoch replays exactly, different epoch permutes") {
    val a = Shard.epochShards(fixture, "doc_id", 8, epoch = 3).orderBy("doc_id")
    val b = Shard.epochShards(fixture, "doc_id", 8, epoch = 3).orderBy("doc_id")
    assert(a.collect().toSeq == b.collect().toSeq, "epoch 3 must replay identically")
    val c = Shard.epochShards(fixture, "doc_id", 8, epoch = 4)
    val moved = a.withColumnRenamed("shard", "s3").withColumnRenamed("pos", "p3")
      .join(c, Seq("doc_id"))
      .filter(col("s3") =!= col("shard") || col("p3") =!= col("pos"))
      .count()
    assert(moved > 0, "a different epoch must draw a different permutation")
  }

  test("epochShards: rank order follows the md5 key total order") {
    // reconstruct the permutation from (shard, pos) and check it sorts
    // by the declared key — the property the oracle replays
    val got = Shard.epochShards(fixture, "doc_id", 8, epoch = 3)
      .withColumn("rank", col("pos") * 8 + col("shard"))
    val key = md5(concat(lit("ep:3:"), col("doc_id").cast("string")).cast("binary"))
    val expect = fixture.select(col("doc_id"), key.as("k"))
      .orderBy(col("k"), col("doc_id"))
      .collect().map(_.getLong(0)).toSeq
    val gotOrder = got.orderBy("rank").collect().map(_.getLong(0)).toSeq
    assert(gotOrder == expect, "permutation must be the md5 key order")
  }
}

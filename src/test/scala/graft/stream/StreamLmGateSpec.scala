package graft.stream

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class StreamLmGateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp() = java.nio.file.Files.createTempDirectory("lmgate").toString

  test("fluent batch admitted, OOV batch rejected, decisions versioned by batch") {
    val phrase = "the quick brown fox jumps over the lazy dog again and again"
    val seed = (0L until 20L).map(i => (i, phrase)).toDF("doc_id", "text")
    val st = tmp()
    StreamLmGate.seed(seed, st)
    StreamLmGate.processBatch(Seq((100L, phrase)).toDF("doc_id", "text"), st, 1L)
    StreamLmGate.processBatch(Seq((200L, "zq xv wk jj pp qq rr ss tt uu"))
      .toDF("doc_id", "text"), st, 2L)
    val rows = StreamLmGate.scores(spark, st)
      .select("doc_id", "admitted", "batch")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(rows == Set((100L, 1, 1), (200L, 0, 2)))
  }

  test("a replayed batch overwrites exactly its own partition") {
    val seed = (0L until 13L).map(i => (i, "a b c d e f g")).toDF("doc_id", "text")
    val st = tmp()
    StreamLmGate.seed(seed, st)
    StreamLmGate.processBatch(Seq((100L, "a b c")).toDF("doc_id", "text"), st, 1L)
    StreamLmGate.processBatch(Seq((200L, "d e f")).toDF("doc_id", "text"), st, 2L)
    // crash-replay of batch 1 with its redelivered (identical-id) content
    StreamLmGate.processBatch(Seq((100L, "a b c")).toDF("doc_id", "text"), st, 1L)
    val rows = StreamLmGate.scores(spark, st)
      .groupBy("batch").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(rows == Set((1, 1L), (2, 1L)), "replay must not duplicate batch-1 rows")
  }

  test("the gate LM is static: scoring waves never mutates the seed state") {
    val seed = (0L until 9L).map(i => (i, "a b a b a b")).toDF("doc_id", "text")
    val st = tmp()
    StreamLmGate.seed(seed, st)
    val before = spark.read.parquet(s"$st/lm/c12")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    StreamLmGate.processBatch(Seq((100L, "a b x y z w")).toDF("doc_id", "text"), st, 1L)
    val after = spark.read.parquet(s"$st/lm/c12")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(before == after)
  }
}

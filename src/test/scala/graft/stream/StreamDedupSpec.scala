package graft.stream

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.TestSpark

class StreamDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streaming exact dedup: first occurrence wins across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, Long)] // (doc_id, text, epoch_sec)
    val docs = input.toDF().toDF("doc_id", "text", "sec")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_seconds(
        org.apache.spark.sql.functions.col("sec")))
    val out = CdcStream.dedupStream(docs, "text", "ts")
    val q = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("dedup_stream").start()
    try {
      // batch 1: two distinct texts + an intra-batch duplicate
      input.addData((1L, "alpha beta", 100L), (2L, "gamma delta", 110L),
        (3L, "alpha beta", 120L))
      q.processAllAvailable()
      // batch 2: cross-batch duplicate (within watermark) + one new text
      input.addData((4L, "alpha beta", 130L), (5L, "epsilon zeta", 140L))
      q.processAllAvailable()
      val kept = spark.table("dedup_stream")
        .collect().map(_.getLong(0)).toSet
      // doc 3 (intra-batch dup) and doc 4 (cross-batch dup) are dropped
      assert(kept == Set(1L, 2L, 5L))
    } finally q.stop()
  }
}

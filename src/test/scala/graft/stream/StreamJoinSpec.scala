package graft.stream

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Stream-stream equi join with watermarks — the continuous-mode analog
  * of the reference's two-sided diff consumption (SURVEY.md §2.8
  * `merge_concurrent`): both inputs arrive as streams and join on the key
  * with bounded state.
  */
class StreamJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("watermarked stream-stream inner join matches across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val left = MemoryStream[(Long, java.sql.Timestamp, String)]
    val right = MemoryStream[(Long, java.sql.Timestamp, String)]

    val l = left.toDF().toDF("id", "ts", "lv").withWatermark("ts", "1 hour")
    val r = right.toDF().toDF("id", "ts2", "rv").withWatermark("ts2", "1 hour")
    val joined = l.join(r,
      l("id") === r("id") &&
        r("ts2").between(l("ts") - expr("INTERVAL 1 HOUR"), l("ts") + expr("INTERVAL 1 HOUR")))
      .select(l("id"), col("lv"), col("rv"))

    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj").start()

    def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    left.addData((1L, t(0), "a"), (2L, t(1), "b"))
    q.processAllAvailable()
    assert(spark.table("ssj").count() == 0) // right side empty so far

    right.addData((1L, t(5), "x"), (3L, t(6), "z"))
    q.processAllAvailable()
    val rows = spark.table("ssj").collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(rows.toSet == Set((1L, "a", "x"))) // only key 1 matches within the interval
    q.stop()
  }
}

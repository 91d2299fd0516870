package graft.stream

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.TestSpark

class StreamingCdcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("stateful change events across micro-batches: new, changed, unchanged, deleted") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Boolean)] // (id, payload, isDelete)

    val sigs = StreamingCdc.withSignature(
      input.toDF().toDF("id", "payload", "del"), "id", Seq("payload"), Some("del"))
    val events = StreamingCdc.changeEvents(sigs)
    val q = events.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("cdc_events").start()

    def drain(): Seq[(String, String)] = {
      q.processAllAvailable()
      val out = spark.table("cdc_events").collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq
      out
    }

    // batch 1: two fresh keys
    input.addData((1L, "a", false), (2L, "b", false))
    assert(drain().sorted == Seq("1" -> "new", "2" -> "new"))

    // batch 2: 1 changed, 2 unchanged (swallowed), 3 new
    input.addData((1L, "a2", false), (2L, "b", false), (3L, "c", false))
    assert(drain().sorted == Seq("1" -> "new", "1" -> "changed", "2" -> "new", "3" -> "new").sorted)

    // batch 3: tombstone for 2; unknown-key tombstone ignored
    input.addData((2L, "b", true), (99L, "x", true))
    assert(drain().count(_ == ("2" -> "deleted")) == 1)
    assert(!drain().exists(_._1 == "99"))

    // batch 4: re-insert after delete → new again (memory sink is
    // cumulative: batch 1's new + this one)
    input.addData((2L, "b", false))
    assert(drain().count(_ == ("2" -> "new")) == 2)

    q.stop()
  }
}

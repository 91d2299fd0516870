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

  test("multi-update keys within one micro-batch fold in seq order") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Boolean, Long)] // (id, payload, isDelete, seq)

    val sigs = StreamingCdc.withSignature(
      input.toDF().toDF("id", "payload", "del", "seq"), "id", Seq("payload"),
      Some("del"), Some("seq"))
    val events = StreamingCdc.changeEvents(sigs)
    val q = events.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("cdc_seq_events").start()

    // one batch, three updates to key 7 added in SCRAMBLED order: the
    // seq column (not arrival order) must drive the fold, so the final
    // state is seq=3's payload and the emitted kinds are new+changed+changed
    input.addData((7L, "v3", false, 3L), (7L, "v1", false, 1L), (7L, "v2", false, 2L))
    q.processAllAvailable()
    val kinds = spark.table("cdc_seq_events").collect().map(_.getString(1)).toSeq.sorted
    assert(kinds == Seq("changed", "changed", "new"))

    // next batch: re-sending seq=3's payload must be unchanged (swallowed),
    // proving state holds the seq-max version, not an arbitrary one
    input.addData((7L, "v3", false, 4L))
    q.processAllAvailable()
    assert(spark.table("cdc_seq_events").count() == 3)

    // tombstone then re-insert inside ONE batch, added scrambled: seq
    // order folds the delete (seq=5) before the insert (seq=6), so the
    // key emits deleted + new — not a single 'changed'
    input.addData((7L, "v5", false, 6L), (7L, "old", true, 5L))
    q.processAllAvailable()
    val later = spark.table("cdc_seq_events").collect().map(_.getString(1)).toSeq.sorted
    assert(later == Seq("changed", "changed", "deleted", "new", "new"))
    q.stop()
  }
}

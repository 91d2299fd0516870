package graft.stream

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** State-store durability: the signature cache must survive a full query
  * restart from the checkpoint — the streaming equivalent of the
  * reference's persisted hash tables surviving between runs.
  */
class StreamingCdcRecoverySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** df.write.parquet makes a directory; the file-stream watch dir wants
    * flat files — relocate the single part file.
    */
  private def writeFlat(df: org.apache.spark.sql.DataFrame, dir: String, name: String): Unit = {
    import java.nio.file._
    val tmp = Files.createTempDirectory("cdc_batch").toString
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = Files.list(Paths.get(tmp)).filter(_.toString.endsWith(".parquet")).findFirst().get()
    Files.move(part, Paths.get(dir, name), StandardCopyOption.REPLACE_EXISTING)
  }

  test("signature state survives query restart via checkpoint") {
    val in = java.nio.file.Files.createTempDirectory("cdc_in").toString
    val ckpt = java.nio.file.Files.createTempDirectory("cdc_ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("cdc_out").toString

    // run 1: two fresh rows
    writeFlat(Seq((1L, "a"), (2L, "b")).toDF("id", "payload"), in, "batch1.parquet")
    val out1 = StreamingCdc.runFileStream(spark, in, ckpt, out, "id", Seq("payload"))
    assert(out1.collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq ==
      Seq("1" -> "new", "2" -> "new"))

    // run 2 (fresh query, same checkpoint): 1 changed, 2 unchanged, 3 new.
    // If state had NOT survived, 1 and 2 would both re-classify as "new";
    // the event sink is cumulative, so expect exactly the two run-1 events
    // plus (1, changed) and (3, new).
    writeFlat(Seq((1L, "a2"), (2L, "b"), (3L, "c")).toDF("id", "payload"), in, "batch2.parquet")
    val out2 = StreamingCdc.runFileStream(spark, in, ckpt, out, "id", Seq("payload"))
    val events2 = out2.collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    assert(events2 == Seq("1" -> "changed", "1" -> "new", "2" -> "new", "3" -> "new").sorted,
      events2.toString)
  }
}

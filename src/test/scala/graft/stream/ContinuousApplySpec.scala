package graft.stream

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.core.Pipeline

class ContinuousApplySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def writeFlat(df: org.apache.spark.sql.DataFrame, dir: String, name: String): Unit = {
    import java.nio.file._
    val tmp = Files.createTempDirectory("ca_batch").toString
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = Files.list(Paths.get(tmp)).filter(_.toString.endsWith(".parquet")).findFirst().get()
    Files.move(part, Paths.get(dir, name), StandardCopyOption.REPLACE_EXISTING)
  }

  test("snapshot is maintained continuously across micro-batches, with history") {
    val in = java.nio.file.Files.createTempDirectory("ca_in").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ca_ckpt").toString
    val snap = java.nio.file.Files.createTempDirectory("ca_snap").toString

    writeFlat(Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "name", "value"),
      in, "b1.parquet")
    StreamingCdc.continuousApply(spark, in, ckpt, snap, "id", Seq("name", "value"))
    assert(Pipeline.currentVersion(snap).contains(1L))
    assert(Pipeline.readLatest(spark, snap, "snapshot").count() == 2)

    // batch 2: update row 1, add row 3
    writeFlat(Seq((1L, "a", 99.0), (3L, "c", 30.0)).toDF("id", "name", "value"),
      in, "b2.parquet")
    StreamingCdc.continuousApply(spark, in, ckpt, snap, "id", Seq("name", "value"))
    assert(Pipeline.currentVersion(snap).contains(2L))
    val rows = Pipeline.readLatest(spark, snap, "snapshot")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(rows == Map(1L -> 99.0, 2L -> 20.0, 3L -> 30.0))
    // changelog holds the pre-update version of row 1
    val clog = Pipeline.readChangelog(spark, snap)
      .filter("v = 2").collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(clog.toSeq == Seq((1L, 10.0)))
  }
}

package graft.tools

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev diagnostic for flapping scale ratios: time a family (default the
  * mm_image pair that motivated it in r8) standalone at base and 4×,
  * with per-phase task-metric totals (run / cpu / gc) so a GC-bound
  * phase is visible directly instead of inferred from wall ratios.
  * `SPARK_GRAFT_MMDIAG_ORDER` takes any declared query names — r9 uses
  * it to rule heat in or out on `dedup_substring_winnowed`'s 4.90/5.0.
  */
object MmDiag {
  def main(args: Array[String]): Unit = {
    val dirs = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIRS",
      "/root/testdata/sf0.1,/tmp/sfscale/sf0.4").split(",").toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val gc = new LongAdder; val run = new LongAdder; val cpu = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) { gc.add(m.jvmGCTime); run.add(m.executorRunTime); cpu.add(m.executorCpuTime) }
      }
    })
    val order = sys.env.getOrElse("SPARK_GRAFT_MMDIAG_ORDER",
      "mm_image_dedup_check,mm_image_dedup_check,mm_image_features").split(",").toSeq
    dirs.foreach { dir =>
      spark.catalog.clearCache()
      val scaled = graft.queries.ScaledFixtures.ensure(spark, dir)
      // the PNG render is fixture synthesis for the mm family only —
      // skip it when diagnosing a text/vector family standalone
      if (order.exists(_.startsWith("mm_")))
        graft.queries.Catalog.warmImageMedia(spark, scaled)
      order.zipWithIndex.foreach { case (q, i) =>
        gc.reset(); run.reset(); cpu.reset()
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(q)(spark, scaled)
          .write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"[mmdiag] ${new java.io.File(dir).getName}%-8s #$i $q%-24s wall $wall%7.1f s  " +
          f"taskRun ${run.sum() / 1e3}%8.1f s  taskCpu ${cpu.sum() / 1e9}%8.1f s  taskGc ${gc.sum() / 1e3}%7.1f s")
      }
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Production-shape probe of the streaming EMBEDDING ingest gate
  * ([[graft.stream.StreamVecDup]]): seed the 4×-scaled vector corpus at
  * the O(10^4) prefix fan-out production wants (`indexPrefixes = 4096`,
  * seed-time auto-sized planes), then push TRIGGER-sized batches through
  * `processBatch` and report per-batch wall plus rows actually read — the
  * delta-bounded read contract StreamVecDupSpec pins at unit scale,
  * measured at corpus scale. A batch of ~1k vectors touches ≤ 8k of 4096
  * prefixes worst-case but in practice a few hundred, so the probe read
  * must stay a small multiple of the corpus-vector fetch, NOT the index
  * size. Results land in PERFORMANCE.md.
  *
  * Usage (dir must be an sf-shaped name for ScaledFixtures):
  *   SPARK_GRAFT_VECGATE_DIR=/tmp/sfscale/sf0.4 \
  *     sbt "runMain graft.tools.VecGateProbe"
  */
object VecGateProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_VECGATE_DIR", "/tmp/sfscale/sf0.4")
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_VECGATE_BATCHES", "3").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val scaled = graft.queries.ScaledFixtures.ensure(spark, dir)
    val embs = spark.read.parquet(s"$scaled/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val n = embs.count()
    // trigger-sized batches: vec_id % 1000 == k slices (~n/1000 vectors)
    val seed = embs.filter(pmod(col("vec_id"), lit(1000)) >= nBatches)
    val planes = graft.ext.Dedup.autoPlanes(n, 18)
    val p = graft.stream.StreamVecDup.Params(planes = planes, indexPrefixes = 4096)
    val st = java.nio.file.Files.createTempDirectory("vecgate_probe").toString
    println(s"[vecgate] corpus=$n planes=$planes prefixes=4096 state=$st")
    val t0 = System.nanoTime()
    graft.stream.StreamVecDup.seedCorpus(seed, st, p)
    println(f"[vecgate] seed        ${(System.nanoTime() - t0) / 1e9}%8.1f s")
    val recordsRead = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        recordsRead.addAndGet(t.taskMetrics.inputMetrics.recordsRead)
    }
    def runBatch(b: Int, version: Long, label: String): Unit = {
      // stage the batch to its own parquet first, the way a stream
      // source delivers it: processBatch consumes the batch frame three
      // times (sketch, verify, absorb), and an unpersisted filter over
      // the whole corpus would re-scan 800k rows per consumer — a
      // harness artifact that measured as 50+ s/batch
      val stagedDir = s"$st/.batch_staging/$b"
      embs.filter(pmod(col("vec_id"), lit(1000)) === b)
        .write.mode("overwrite").parquet(stagedDir)
      val batch = spark.read.parquet(stagedDir)
      val bn = batch.count()
      recordsRead.set(0)
      spark.sparkContext.addSparkListener(listener)
      val t1 = System.nanoTime()
      try {
        graft.stream.StreamVecDup.processBatch(batch, st, version, p)
        Thread.sleep(1000) // drain queued listener events
      } finally spark.sparkContext.removeSparkListener(listener)
      val wall = (System.nanoTime() - t1) / 1e9
      println(f"[vecgate] $label%-14s n=$bn%-7d $wall%8.1f s  rows_read=${recordsRead.get()}%,d")
    }
    for (b <- 0 until nBatches) runBatch(b, b + 1L, s"batch=$b")
    // maintenance cadence: fold the flat deltas into the partitioned
    // seed (all versions here are committed — synchronous drain), then
    // prove the post-compaction probe is as delta-bounded as before
    val tC = System.nanoTime()
    graft.stream.StreamVecDup.compactIndex(spark, st, nBatches + 1L)
    println(f"[vecgate] compact     ${(System.nanoTime() - tC) / 1e9}%8.1f s")
    runBatch(nBatches, nBatches + 1L, s"post-compact")
    // mixed layouts (flat deltas + partitioned seed) cannot be counted in
    // one parquet read — sum per batch dir
    val rootP = new org.apache.hadoop.fs.Path(s"$st/index")
    val fs = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val idx = fs.listStatus(rootP).filter(_.getPath.getName.startsWith("batch="))
      .map(d => spark.read.parquet(d.getPath.toString).count()).sum
    println(s"[vecgate] final index rows=$idx")
    spark.stop()
  }
}

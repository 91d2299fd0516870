package graft.stream

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Shared state-layout discipline for the ingest-time dedup gates
  * ([[StreamNearDup]] text, [[StreamVecDup]] embeddings): bucket-prefix
  * partitioned index writes and replay-safe `batch < version` reads.
  * One implementation — a fix to the pruning or replay logic cannot
  * drift between the two gates.
  */
private[stream] object IngestState {
  /** Bucket-prefix partition column: `pb = xxhash64(cols…) mod prefixes`.
    * The delta's distinct prefix set prunes the accumulated-index read at
    * DIRECTORY level at probe time.
    */
  def withPb(idx: DataFrame, prefixes: Int, pbCols: Seq[Column]): DataFrame =
    idx.withColumn("pb", pmod(xxhash64(pbCols: _*), lit(prefixes.toLong)).cast("int"))

  /** Write one batch's index rows under `dir` partitioned by bucket
    * prefix. The repartition on `pb` routes each prefix to exactly one
    * task, so the layout lands as ~one file per touched prefix instead
    * of tasks × prefixes small files.
    */
  def writeIndex(idx: DataFrame, dir: String, prefixes: Int, pbCols: Seq[Column]): Unit =
    withPb(idx, prefixes, pbCols)
      .repartition(col("pb"))
      .write.mode(SaveMode.Overwrite).partitionBy("pb").parquet(dir)

  /** Read a `batch=N`-partitioned state dir restricted to partitions
    * BELOW `maxBatchExclusive`, or an empty frame shaped like `template`
    * when nothing was absorbed yet. The partition filter is load-bearing
    * for replay: pruning happens at directory level, so files under an
    * in-flight `batch=version` partition — which the caller is about to
    * Overwrite — are never opened, even though the eager file listing saw
    * them. Existence is probed through the Hadoop filesystem of the path,
    * so state may live on HDFS/S3, not only the local disk.
    */
  def readOrEmpty(spark: SparkSession, dir: String, template: DataFrame,
                  maxBatchExclusive: Long): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasData = fs.exists(path) &&
      fs.listStatus(path).exists(st => st.isDirectory && st.getPath.getName.startsWith("batch="))
    if (hasData) spark.read.parquet(dir).where(col("batch") < lit(maxBatchExclusive))
    else template.limit(0)
  }

  /** Sketch-geometry manifest. The LSH parameters that define the bucket
    * space (planes/bands/k/prefix fan-out) are a property of the STATE
    * DIR, fixed when the corpus is seeded: a later batch sketched with
    * different geometry lands in a DISJOINT bucket space, the probe join
    * matches nothing, and cross-batch duplicates pass the gate silently —
    * a false-negative failure with no error signal. So the seed persists
    * them here and every processBatch ADOPTS them, instead of trusting
    * each caller (possibly another job, another JVM) to thread identical
    * Params forever.
    */
  def writeParams(spark: SparkSession, stateDir: String,
                  fields: Seq[(String, Long)]): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$stateDir/_params.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val os = fs.create(p, true)
    try os.write(fields.map { case (k, v) => s""""$k":$v""" }
      .mkString("{", ",", "}").getBytes("UTF-8"))
    finally os.close()
  }

  /** The seed-time geometry, or empty for a pre-manifest state dir (the
    * caller's Params then apply unchecked, preserving old behavior).
    */
  def readParams(spark: SparkSession, stateDir: String): Map[String, Long] = {
    val p = new org.apache.hadoop.fs.Path(s"$stateDir/_params.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Map.empty
    else {
      val in = fs.open(p)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      """"(\w+)"\s*:\s*(\d+)""".r.findAllMatchIn(txt)
        .map(m => m.group(1) -> m.group(2).toLong).toMap
    }
  }
}

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
}

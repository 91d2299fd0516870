package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.Dedup

/** Streaming ingest-time near-dup gate: every micro-batch of incoming
  * documents is checked against the committed corpus — WITHOUT ever
  * re-sketching the corpus — then absorbed into it.
  *
  * State layout under `stateDir` (all partitioned by ingest version, so a
  * replayed batch overwrites exactly its own contribution):
  * {{{
  *   docs/batch=N/    raw (id, text) of every absorbed batch
  *   index/batch=N/   the batch's LSH band rows (Dedup.lshIndex)
  *   pairs/batch=N/   verified near-dup pairs the batch introduced
  * }}}
  *
  * Per batch: the batch is sketched ONCE (native MinHashSig, map-side)
  * straight into its index partition; the persisted rows are read back to
  * probe the accumulated index by bucket and Jaccard-verify candidates
  * ([[Dedup.incrementalVerifiedPairs]]). Cost per batch ∝ batch size +
  * collisions; corpus size enters only through the keyed text-fetch join.
  *
  * Exactly-once: the corpus snapshot reads state with a
  * `batch < version` partition filter, so a replayed batch's own prior
  * partitions are pruned out of every plan before the partition
  * Overwrite rewrites them — a crash-replayed batch rewrites identical
  * state whatever write the crash interrupted, and the streaming
  * checkpoint re-delivers any batch whose processing did not finish
  * (StreamNearDupSpec). [[seedCorpus]] sits outside the checkpoint, so a
  * crashed seed must simply be re-run (it overwrites its own version-0
  * partitions; docs land before index so a half-seed can never produce
  * index ids whose text is missing).
  *
  * Reference analog: none — the reference replicates rows; this is the
  * §7.5 training-pipeline extension running at ingest instead of as a
  * full-corpus batch job.
  */
object StreamNearDup {
  final case class Params(idCol: String = "doc_id", textCol: String = "text",
                          threshold: Double = 0.5, shingleN: Int = 3,
                          k: Int = 8, bands: Int = 4)

  /** Read a `batch=N`-partitioned state dir restricted to partitions
    * BELOW `maxBatchExclusive`, or an empty frame shaped like `template`
    * when nothing was absorbed yet. The partition filter is load-bearing
    * for replay: pruning happens at directory level, so files under an
    * in-flight `batch=version` partition — which the caller is about to
    * Overwrite — are never opened, even though the eager file listing saw
    * them. Existence is probed through the Hadoop filesystem of the path,
    * so state may live on HDFS/S3, not only the local disk.
    */
  private def readOrEmpty(spark: SparkSession, dir: String, template: DataFrame,
                          maxBatchExclusive: Long): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasData = fs.exists(path) &&
      fs.listStatus(path).exists(st => st.isDirectory && st.getPath.getName.startsWith("batch="))
    if (hasData) spark.read.parquet(dir).where(col("batch") < lit(maxBatchExclusive))
    else template.limit(0)
  }

  /** Seed the state with an existing corpus as ingest version 0. Not
    * covered by a streaming checkpoint — re-run on failure (idempotent).
    */
  def seedCorpus(docs: DataFrame, stateDir: String, p: Params = Params()): Unit = {
    docs.select(col(p.idCol), col(p.textCol))
      .write.mode(SaveMode.Overwrite).parquet(s"$stateDir/docs/batch=0")
    Dedup.lshIndex(docs, p.idCol, p.textCol, p.shingleN, p.k, p.bands)
      .write.mode(SaveMode.Overwrite).parquet(s"$stateDir/index/batch=0")
  }

  /** Process one ingest batch at `version` (streaming uses batchId+1;
    * version 0 is the seed): emit its near-dup pairs and absorb it.
    * Idempotent under replay of the same (batch, version).
    */
  def processBatch(batch: DataFrame, stateDir: String, version: Long,
                   p: Params = Params()): Unit = {
    val spark = batch.sparkSession
    // the accumulated corpus is everything absorbed at versions BELOW this
    // one: the `batch < version` partition filter keeps a replay's prior
    // `batch=version` files out of the plan entirely (directory-level
    // pruning), so the Overwrite below can never invalidate the lazily
    // executed probe join. With the overlap excluded here, the disjoint
    // corpus/delta id contract of incrementalVerifiedPairs is a plain
    // invariant, replay or not.
    val corpusDocs = readOrEmpty(spark, s"$stateDir/docs",
        batch.select(col(p.idCol), col(p.textCol)), version)
      .select(col(p.idCol), col(p.textCol))
    val corpusIdx = readOrEmpty(spark, s"$stateDir/index",
        Dedup.lshIndex(batch.limit(0), p.idCol, p.textCol, p.shingleN, p.k, p.bands), version)
      .select(col("id"), col("bucket"))
    // sketch the batch exactly once, straight into its index partition,
    // and probe with the materialized rows read back
    Dedup.lshIndex(batch, p.idCol, p.textCol, p.shingleN, p.k, p.bands)
      .write.mode(SaveMode.Overwrite).parquet(s"$stateDir/index/batch=$version")
    val deltaIdx = spark.read.parquet(s"$stateDir/index/batch=$version")
    Dedup.incrementalVerifiedPairs(corpusIdx, corpusDocs, batch,
        p.idCol, p.textCol, p.threshold, p.shingleN, p.k, p.bands,
        deltaIndex = Some(deltaIdx))
      .write.mode(SaveMode.Overwrite).parquet(s"$stateDir/pairs/batch=$version")
    batch.select(col(p.idCol), col(p.textCol))
      .write.mode(SaveMode.Overwrite).parquet(s"$stateDir/docs/batch=$version")
  }

  /** All near-dup pairs detected so far (batch partition column exposed
    * as `ingest_version`).
    */
  def pairs(spark: SparkSession, stateDir: String): DataFrame =
    spark.read.parquet(s"$stateDir/pairs")
      .withColumnRenamed("batch", "ingest_version")

  /** Wire [[processBatch]] to a file-source stream and drain it
    * synchronously (tests / bounded backfills; production swaps the
    * source for Kafka/Delta — the per-batch plan is unchanged).
    */
  def runIngestDedup(spark: SparkSession, inputDir: String, checkpointDir: String,
                     stateDir: String, p: Params = Params()): Unit = {
    val schema = spark.read.parquet(inputDir).schema
    val q = spark.readStream.schema(schema).parquet(inputDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        processBatch(batch.toDF(), stateDir, batchId + 1, p)
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }
}

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
  *   docs/batch=N/           raw (id, text) of every absorbed batch
  *   index/batch=N/pb=X/     the batch's LSH band rows (Dedup.lshIndex),
  *                           sub-partitioned by bucket prefix
  *                           pb = xxhash64(bucket) mod indexPrefixes
  *   pairs/batch=N/          verified near-dup pairs the batch introduced
  * }}}
  *
  * Per batch: the batch is sketched ONCE (native MinHashSig, map-side)
  * straight into its index partition; the persisted rows are read back to
  * probe the accumulated index by bucket and Jaccard-verify candidates
  * ([[Dedup.incrementalVerifiedPairs]]).
  *
  * The probe never scans or shuffles the full accumulated index. The
  * delta's distinct bucket-prefix set (≤ `indexPrefixes` small ints,
  * trivially collectable) prunes the corpus-index read at DIRECTORY level
  * through the `pb` partition column, and the delta side of the probe
  * join is broadcast (a micro-batch is trigger-bounded by construction),
  * so the surviving corpus rows are scanned once and never shuffled.
  * Cost per batch ∝ batch size + the delta's bucket-prefix coverage of
  * the index (→ collisions); the full corpus enters only through the
  * keyed text-fetch join that verifies candidates
  * (StreamNearDupSpec pins the delta-bounded probe via task input
  * metrics, the same witness ContinuousApplyBucketedSpec uses for CDC
  * state).
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
                          k: Int = 8, bands: Int = 4,
                          // bucket-prefix fan-out of the persisted index:
                          // a probe reads ≤ |delta buckets| of these
                          // directories per absorbed batch. Size so that a
                          // typical micro-batch touches a small fraction
                          // (delta_docs × bands ≪ indexPrefixes); 256 keeps
                          // per-batch file counts sane at test scale —
                          // production at 100 TB wants O(10^4).
                          indexPrefixes: Int = 256)

  // state layout + replay-safe reads shared with the vector gate
  private def pbCols = Seq(col("bucket"))

  private def writeIndex(idx: DataFrame, dir: String, p: Params): Unit =
    IngestState.writeIndex(idx, dir, p.indexPrefixes, pbCols)

  private def readOrEmpty(spark: SparkSession, dir: String, template: DataFrame,
                          maxBatchExclusive: Long): DataFrame =
    IngestState.readOrEmpty(spark, dir, template, maxBatchExclusive)

  /** Seed the state with an existing corpus as ingest version 0. Not
    * covered by a streaming checkpoint — re-run on failure (idempotent).
    */
  def seedCorpus(docs: DataFrame, stateDir: String, p: Params = Params()): Unit = {
    docs.select(col(p.idCol), col(p.textCol))
      .write.mode(SaveMode.Overwrite).parquet(s"$stateDir/docs/batch=0")
    writeIndex(Dedup.lshIndex(docs, p.idCol, p.textCol, p.shingleN, p.k, p.bands),
      s"$stateDir/index/batch=0", p)
    // geometry is a property of the state dir — later batches adopt it
    // (see IngestState.writeParams)
    IngestState.writeParams(docs.sparkSession, stateDir, Seq(
      "shingleN" -> p.shingleN.toLong, "k" -> p.k.toLong,
      "bands" -> p.bands.toLong, "indexPrefixes" -> p.indexPrefixes.toLong))
  }

  /** Process one ingest batch at `version` (streaming uses batchId+1;
    * version 0 is the seed): emit its near-dup pairs and absorb it.
    * Idempotent under replay of the same (batch, version). The sketch
    * geometry (shingleN/k/bands/indexPrefixes) is ADOPTED from the state
    * dir's seed-time manifest when present — only idCol/textCol/threshold
    * are taken from the caller's `p`.
    */
  def processBatch(batch: DataFrame, stateDir: String, version: Long,
                   p0: Params = Params()): Unit = {
    val spark = batch.sparkSession
    val seeded = IngestState.readParams(spark, stateDir)
    val p = p0.copy(
      shingleN = seeded.getOrElse("shingleN", p0.shingleN.toLong).toInt,
      k = seeded.getOrElse("k", p0.k.toLong).toInt,
      bands = seeded.getOrElse("bands", p0.bands.toLong).toInt,
      indexPrefixes = seeded.getOrElse("indexPrefixes", p0.indexPrefixes.toLong).toInt)
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
    // sketch the batch exactly once, straight into ONE flat delta file
    // (pb as a data column — the partitioned layout is for the big
    // seed/compacted side only; see IngestState.writeIndexFlat), and
    // probe with the materialized rows read back
    IngestState.writeIndexFlat(
      Dedup.lshIndex(batch, p.idCol, p.textCol, p.shingleN, p.k, p.bands),
      s"$stateDir/index/batch=$version", p.indexPrefixes, pbCols)
    val deltaIdx = spark.read.parquet(s"$stateDir/index/batch=$version")
    // the delta's bucket-prefix footprint: ≤ indexPrefixes distinct small
    // ints (bounded by construction, NOT by data volume). It prunes the
    // corpus-index read below — at DIRECTORY level for the partitioned
    // seed/compacted dirs, by row filter for the (small) flat deltas.
    val deltaPbs = deltaIdx.select("pb").distinct().collect().map(_.getInt(0)).toSeq
    val idxTemplate = IngestState.withPb(
      Dedup.lshIndex(batch.limit(0), p.idCol, p.textCol, p.shingleN, p.k, p.bands),
      p.indexPrefixes, pbCols)
    val corpusIdx = IngestState.readIndexPruned(spark, s"$stateDir/index",
        idxTemplate, version, deltaPbs)
      .select(col("id"), col("bucket"))
    Dedup.incrementalVerifiedPairs(corpusIdx, corpusDocs, batch,
        p.idCol, p.textCol, p.threshold, p.shingleN, p.k, p.bands,
        deltaIndex = Some(deltaIdx.select(col("id"), col("bucket"))),
        broadcastDelta = true)
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

  /** Fold the flat delta indexes of every batch below `uptoExclusive`
    * into the pb-partitioned seed layout. Run on a maintenance cadence;
    * `uptoExclusive` must not exceed the stream checkpoint's last
    * COMMITTED version (see [[IngestState.compactIndex]] for the replay
    * argument).
    */
  def compactIndex(spark: SparkSession, stateDir: String, uptoExclusive: Long): Unit =
    IngestState.compactIndex(spark, s"$stateDir/index", uptoExclusive)

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

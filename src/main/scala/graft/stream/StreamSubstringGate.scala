package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.SubstringDedup

/** Streaming ingest-time EXACT-SUBSTRING gate: every micro-batch of
  * incoming documents is checked for verbatim run overlap (winnowed
  * L-gram fingerprints, the [[graft.ext.SubstringDedup]] discipline)
  * against the accumulated corpus — without ever re-fingerprinting the
  * corpus — then absorbed into it. Completes the ingest-gate family
  * (near-dup [[StreamNearDup]], vector [[StreamVecDup]], LM quality
  * [[StreamLmGate]]) with the boilerplate/quotation-overlap signal none
  * of the others can see.
  *
  * Unlike the near-dup gate there is NO text-verify stage and therefore
  * no docs/ state: a shared fingerprint count IS the decision (each
  * fingerprint witnesses a verbatim ≥ L-byte run; `minShared` of them is
  * the MOSS evidence threshold), so the state is just the fingerprint
  * index — rows of (id, h) under the [[IngestState]] layout:
  * {{{
  *   index/batch=N/pb=X/   seed (+compacted) winnowed fingerprints,
  *                         pb = xxhash64(h) mod indexPrefixes
  *   index/batch=N/        flat per-trigger deltas (pb as data column)
  *   pairs/batch=N/        substring-overlap pairs the batch introduced
  * }}}
  *
  * Per batch: the delta is fingerprinted ONCE (map-side kernel) into its
  * flat index partition; the rows are read back, their distinct
  * bucket-prefix set prunes the corpus-index read (directory-level for
  * the partitioned seed), and the probe join's strategy is left to AQE:
  * a trigger-sized delta broadcasts by the size rule (corpus scanned
  * once, never shuffled), a wave-sized backfill shuffles — the same
  * code serves both regimes. Hub fingerprints are
  * dropped at probe time: a gram whose corpus+delta df exceeds `maxDf`
  * is template noise (license headers), and filtering it BEFORE the
  * pair join bounds per-gram fanout to maxDf — the hub set itself is
  * bounded by the delta's fingerprint count, never corpus-sized.
  * In-batch pairs go through the same capped posting-pair path as the
  * batch variant. Exactly-once replay: `batch < version` partition
  * pruning + per-version Overwrite, the shared [[IngestState]] contract.
  *
  * Two fingerprint modes, fixed at seed time in the state manifest
  * (mismatched geometry would silently probe a disjoint hash space):
  * xxhash64 codegen kernel (production: 8-byte fingerprints, zero
  * per-position allocation) or md5 char grams (DuckDB-replayable — the
  * `dedup_substring_gate` oracle runs this mode).
  *
  * Reference analog: none — §7.5 training-pipeline extension at ingest.
  */
object StreamSubstringGate {
  final case class Params(idCol: String = "doc_id", textCol: String = "text",
                          L: Int = 40, w: Int = 8, minShared: Int = 2,
                          maxDf: Int = 1000, md5Mode: Boolean = false,
                          indexPrefixes: Int = 256)

  private def pbCols = Seq(col("h"))

  private def grams(docs: DataFrame, p: Params): DataFrame =
    if (p.md5Mode) SubstringDedup.md5WinnowGrams(docs, p.idCol, p.textCol, p.L, p.w)
    else SubstringDedup.xxWinnowGrams(docs, p.idCol, p.textCol, p.L, p.w)

  /** Seed the state with an existing corpus as ingest version 0 (index
    * only — no pairs are emitted for the seed, mirroring the other
    * gates). Not covered by a streaming checkpoint — re-run on failure.
    */
  def seedCorpus(docs: DataFrame, stateDir: String, p: Params = Params()): Unit = {
    IngestState.writeIndex(grams(docs, p), s"$stateDir/index/batch=0",
      p.indexPrefixes, pbCols)
    IngestState.writeParams(docs.sparkSession, stateDir, Seq(
      "L" -> p.L.toLong, "w" -> p.w.toLong, "minShared" -> p.minShared.toLong,
      "maxDf" -> p.maxDf.toLong, "md5Mode" -> (if (p.md5Mode) 1L else 0L),
      "indexPrefixes" -> p.indexPrefixes.toLong))
  }

  /** Process one ingest batch at `version` (streaming uses batchId+1):
    * emit the substring-overlap pairs it introduces — against the
    * accumulated corpus AND within the batch — and absorb its
    * fingerprints. Idempotent under replay of the same (batch, version).
    * Geometry is ADOPTED from the seed-time manifest; only idCol/textCol
    * come from the caller's `p`.
    */
  def processBatch(batch: DataFrame, stateDir: String, version: Long,
                   p0: Params = Params()): Unit = {
    val spark = batch.sparkSession
    val seeded = IngestState.readParams(spark, stateDir)
    val p = p0.copy(
      L = seeded.getOrElse("L", p0.L.toLong).toInt,
      w = seeded.getOrElse("w", p0.w.toLong).toInt,
      minShared = seeded.getOrElse("minShared", p0.minShared.toLong).toInt,
      maxDf = seeded.getOrElse("maxDf", p0.maxDf.toLong).toInt,
      md5Mode = seeded.getOrElse("md5Mode", if (p0.md5Mode) 1L else 0L) == 1L,
      indexPrefixes = seeded.getOrElse("indexPrefixes", p0.indexPrefixes.toLong).toInt)
    // fingerprint the batch exactly once, straight into ONE flat delta
    // file; probe with the materialized rows read back
    IngestState.writeIndexFlat(grams(batch, p),
      s"$stateDir/index/batch=$version", p.indexPrefixes, pbCols)
    val deltaIdx = spark.read.parquet(s"$stateDir/index/batch=$version")
      .select(col("id"), col("h"))
    val deltaPbs = spark.read.parquet(s"$stateDir/index/batch=$version")
      .select("pb").distinct().collect().map(_.getInt(0)).toSeq
    val idxTemplate = IngestState.withPb(grams(batch.limit(0), p),
      p.indexPrefixes, pbCols)
    // corpus fingerprints restricted to the delta's bucket prefixes and
    // to batches strictly below this version (replay safety)
    val corpusIdx = IngestState.readIndexPruned(spark, s"$stateDir/index",
      idxTemplate, version, deltaPbs)
    // corpus rows matching a delta fingerprint. NO broadcast hint: a
    // trigger-sized delta's fingerprint set is broadcast by AQE's size
    // rule anyway, while a wave-sized backfill (the bench seeds 167k
    // docs ≈ 17M fingerprints per wave) must shuffle — a forced
    // broadcast there ran the executor out of BytesToBytesMap memory.
    // Letting the planner pick per batch IS the 100 TB posture: the
    // same code serves both regimes.
    // PERSISTED for the batch (the IngestPipeline admMatches discipline,
    // r14): cand feeds BOTH the hub census and the cross-pair join, and
    // an unpersisted plan re-ran the corpus-index probe join once per
    // consumer — at wave scale that is the two heaviest stages of the
    // whole batch executing twice (StageProf r14: 469 + 445 task-s on
    // near-identical join subtrees). At 100 TB the corpus index is the
    // big side; scanning and joining it once per batch instead of twice
    // is the difference that matters.
    val cand = corpusIdx.join(deltaIdx.select(col("h")).distinct(), Seq("h"))
      .select(col("id").as("c_id"), col("h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // hub cap at probe time: total df of h across corpus matches + the
    // delta itself; everything here is bounded by the delta's gram count.
    // hubs feeds the cross-pair anti join AND the in-batch posting path;
    // it is delta-bounded small, so persist it too rather than re-running
    // its two aggregations over cand per consumer.
    val hubs = cand.groupBy("h").agg(count(lit(1)).as("n_c"))
      .join(deltaIdx.groupBy("h").agg(count(lit(1)).as("n_d")), Seq("h"))
      .filter(col("n_c") + col("n_d") > p.maxDf)
      .select(col("h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val crossPairs = cand.join(hubs, Seq("h"), "left_anti")
      .join(deltaIdx.select(col("id").as("d_id"), col("h")), Seq("h"))
      .select(least(col("c_id"), col("d_id")).as("id_a"),
        greatest(col("c_id"), col("d_id")).as("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= p.minShared)
    // in-batch pairs reuse the materialized delta fingerprints through
    // the capped posting-pair path, with the probe-time hub set removed
    // here too: a gram the CORPUS already proves to be template noise
    // must not pair docs within the batch either (a delta-only count
    // would miss hubs whose df is split across corpus and batch); grams
    // hot within the batch alone are nulled by the capped aggregate
    val innerPairs = SubstringDedup.postingPairs(
      deltaIdx.join(hubs, Seq("h"), "left_anti"),
      p.minShared, p.maxDf)
    try crossPairs.unionByName(innerPairs)
      .write.mode(SaveMode.Overwrite).parquet(s"$stateDir/pairs/batch=$version")
    finally { cand.unpersist(); hubs.unpersist() }
  }

  /** All substring-overlap pairs detected so far, versioned by the batch
    * that detected them.
    */
  def pairs(spark: SparkSession, stateDir: String): DataFrame =
    spark.read.parquet(s"$stateDir/pairs")
      // partition discovery infers the batch column as int — surface it
      // as the long the other gates expose
      .withColumn("ingest_version", col("batch").cast("long")).drop("batch")

  /** Fold flat delta indexes below `uptoExclusive` into the partitioned
    * seed layout (see [[IngestState.compactIndex]] for the replay-safety
    * contract on `uptoExclusive`).
    */
  def compactIndex(spark: SparkSession, stateDir: String, uptoExclusive: Long): Unit =
    IngestState.compactIndex(spark, s"$stateDir/index", uptoExclusive)

  /** Wire [[processBatch]] to a file-source stream and drain it
    * synchronously (tests / bounded backfills; production swaps the
    * source for Kafka/Delta — the per-batch plan is unchanged).
    */
  def runIngestGate(spark: SparkSession, inputDir: String, checkpointDir: String,
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

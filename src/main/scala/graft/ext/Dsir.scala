package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (extension beyond reference
  * parity, SURVEY.md §7.5) — the published DSIR recipe (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"): fit
  * two bag-of-hashed-n-gram models, one on a small TARGET domain corpus
  * and one on the RAW pool, weight every raw document by its
  * log importance ratio log p_target(x) − log p_raw(x), and resample a
  * fixed budget without replacement by Gumbel-top-k. This is the data-
  * selection step modern pretraining pipelines run between crawling and
  * training; `text_nb_classifier` is its discriminative cousin (there
  * the model separates two labeled slices; here it reweights toward an
  * unlabeled target DISTRIBUTION).
  *
  * Closed-form and cross-engine deterministic by construction:
  *  - features are unigrams ∪ bigrams of the whitespace token stream,
  *    hashed into m = 4096 buckets via the first 3 hex digits of
  *    md5("b:" + feature) — the [[Sketches]] count-min cell discipline,
  *    so bucketing replays in any engine with md5.
  *  - both multinomials are add-1 smoothed bucket-count tables; the
  *    per-bucket log-ratio rounds to 9 dp and lands in DECIMAL(28,9)
  *    (the [[TextClassifier]] weight discipline: ln arguments are IEEE
  *    divisions of exact integers, the round absorbs last-ulp libm
  *    differences, and the per-doc SUM is exact decimal arithmetic —
  *    order-independent, so any partitioning reproduces it).
  *  - Gumbel noise is derandomized the way every sampler in this repo
  *    is: u = (first 6 md5 hex digits of "g:" + id + 0.5) / 16^6 is an
  *    exact dyadic rational, g = round(−ln(−ln u), 9) is a fixed IEEE
  *    function of it. Gumbel-top-k on (log_w + g) IS importance
  *    resampling without replacement (the paper's Appendix A sampler) —
  *    with the seed fixed, both engines rank the identical keys.
  *
  * Scale shape:
  *  - the model is ≤ m = 4096 rows — BROADCAST to the scoring join, so
  *    scoring a 100 TB pool is one map-side explode + one (id) partial
  *    aggregation; nothing vocabulary-sized ever shuffles (unlike the
  *    NB/LM scorers, whose open vocabularies force shuffle_hash).
  *  - selection never runs a one-task global window: ranking the keys
  *    is [[Packing.distributedRank]]'s two-phase prefix scan (range
  *    partition → per-partition counts → broadcast offsets → parallel
  *    per-partition row_number). Output rank is partition-independent.
  *  - driver state: two scalar totals and the budget — O(1).
  */
object Dsir {
  /** Hash buckets for the n-gram feature space (3 md5 hex digits). */
  val Buckets = 4096

  /** A fitted importance model: (b, wgt DECIMAL(28,9)) over every bucket
    * observed in the RAW pool — any document drawn from that pool only
    * probes buckets it populated itself, so the scoring join is total.
    */
  final case class Model(weights: DataFrame)

  /** md5 bucket of one feature string (the count-min cell rule). */
  private def bucket(f: Column): Column =
    conv(substring(md5(concat(lit("b:"), f).cast("binary")), 1, 3), 16, 10)
      .cast("long")

  /** (id, b) hashed-feature stream: unigrams ∪ bigrams, built map-side
    * by the [[org.apache.spark.sql.graft.DsirFeatureBuckets]] codegen
    * kernel (r15) — the relational slice + zip_with + explode + per-
    * feature md5-hex + conv form it replaces allocated a feature string
    * and a 32-char hex digest per feature (~640 task-s with ~22 s GC per
    * corpus pass at the 500k-doc bench; DsirSpec pins the multiset
    * equivalence, the DuckDB oracle replays the same cells).
    */
  def featureBuckets(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
      explode(graft.functions.text.dsir_feature_buckets(col(textCol))).as("b"))

  /** The pre-r15 relational feature stream — kept ONLY as the
    * equivalence reference for DsirSpec (explode of feature strings +
    * md5-hex + conv per feature; the kernel above is the production
    * path).
    */
  private[graft] def featureBucketsRelational(docs: DataFrame, idCol: String,
                                              textCol: String): DataFrame = {
    val ws = split(col(textCol), " ")
    val n1 = greatest(size(ws) - 1, lit(0))
    val bigrams = zip_with(
      slice(ws, lit(1), n1), slice(ws, lit(2), n1),
      (a, b) => concat_ws(" ", a, b))
    docs.select(col(idCol).as("id"), explode(concat(ws, bigrams)).as("f"))
      .select(col("id"), bucket(col("f")).as("b"))
  }

  /** Per-bucket feature counts of one corpus — the model's STATE. At
    * most m rows, and ADDITIVE: counts from disjoint corpus slices merge
    * by per-bucket SUM ([[mergeCounts]]), so the model maintains per
    * delta without re-scanning the pool (the [[Sketches.cmsMerge]] /
    * [[Checks.mergeStates]] discipline — merged ≡ from-scratch exactly).
    */
  def bucketCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    featureBuckets(docs, idCol, textCol)
      .groupBy("b").agg(count(lit(1)).cast("long").as("cnt"))

  /** Maintenance step: union + per-bucket SUM. Exact and associative. */
  def mergeCounts(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("b").agg(sum("cnt").as("cnt"))

  /** Per-(slice, bucket) feature counts in ONE corpus pass: `sliceCol`
    * labels each document, the explode runs once, and every slice's
    * ≤ m-row state falls out of a single (slice, b) aggregation —
    * (slice, b, cnt). For k disjoint slices this replaces k corpus
    * passes (k serialized explode+md5 jobs — the wall cost that kept
    * `corpus_dsir_incremental` at 2× its target after the r12
    * checkpoint fix came out) with one. Filtering the result per slice
    * IS `bucketCounts` of that slice (DsirSpec pins the identity).
    */
  def bucketCountsBySlice(docs: DataFrame, idCol: String, textCol: String,
                          sliceCol: Column): DataFrame =
    // the label rides the explode map-side — no join back to the docs;
    // buckets from the same codegen kernel as featureBuckets (r15)
    docs.select(sliceCol.as("slice"),
        explode(graft.functions.text.dsir_feature_buckets(col(textCol))).as("b"))
      .groupBy("slice", "b").agg(count(lit(1)).cast("long").as("cnt"))

  /** Fit the importance model from the two count states: a driver fold
    * for the totals and the 9-dp log-ratio
    *   wgt_b = ln((cp_b + 1)/(Tp + m)) − ln((cq_b + 1)/(Tq + m))
    * over every bucket the RAW pool populates.
    */
  def fitFromCounts(targetCounts: DataFrame, rawCounts: DataFrame): Model = {
    val tb = targetCounts.select(col("b"), col("cnt").as("cp"))
    val rb = rawCounts.select(col("b"), col("cnt").as("cq"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tp = tb.agg(coalesce(sum("cp"), lit(0L))).head().getLong(0)
    val tq = rb.agg(coalesce(sum("cq"), lit(0L))).head().getLong(0)
    val w = rb.join(tb, Seq("b"), "left_outer").select(col("b"),
      round(log((coalesce(col("cp"), lit(0L)) + lit(1.0)) / lit((tp + Buckets).toDouble))
          - log((col("cq") + lit(1.0)) / lit((tq + Buckets).toDouble)), 9)
        .cast("decimal(28,9)").as("wgt"))
    // the model is ≤ Buckets = 4096 rows by construction: materialize it
    // to the driver, UNPERSIST the raw-count cache (ADVICE r11 — fit used
    // to leak a cached plan per call, against the Dedup/Bpe/Graph
    // discipline), and rebuild as a local frame. This also severs the
    // model's lineage from the pool scan, so the scoring broadcast ships
    // 4096 literal rows instead of re-deriving them from the corpus.
    val rows = w.collect()
    rb.unpersist()
    val spark = rawCounts.sparkSession
    Model(spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 1), w.schema))
  }

  /** Fit from the corpora directly: one feature pass over each, then
    * [[fitFromCounts]].
    */
  def fit(target: DataFrame, raw: DataFrame, idCol: String, textCol: String): Model =
    fitFromCounts(bucketCounts(target, idCol, textCol),
      bucketCounts(raw, idCol, textCol))

  /** Score `docs` under a fitted model: (idCol, n_feats, log_w) with
    * log_w still in DECIMAL(28,9) (callers add the Gumbel key in decimal
    * space before any double cast). The model broadcasts; the only
    * exchange is the per-id partial aggregation. The caller's id column
    * NAME is preserved so [[select]] resolves it by `idCol` (ADVICE r11:
    * the old (id, …) schema made select's idCol parameter a rename-only
    * fiction that blew up on any frame actually keyed by idCol).
    */
  def logWeights(model: Model, docs: DataFrame, idCol: String, textCol: String): DataFrame =
    featureBuckets(docs, idCol, textCol)
      .join(broadcast(model.weights), Seq("b"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_feats"),
        // narrow the (38,9) sum back to (28,9) BEFORE later adds — the
        // TextClassifier overflow-tie lesson
        sum("wgt").cast("decimal(28,9)").as("log_w"))
      .withColumnRenamed("id", idCol)

  /** Gumbel-top-k resampling of `scored` (the [[logWeights]] output):
    * key = log_w + g(id), ranked by [[Packing.distributedRank]] on
    * (key DESC, id). Returns (id, n_feats, log_w, sel_rank, picked) with
    * picked = rank ≤ budget; log_w is surfaced as a 6-dp double, ranking
    * happened on the exact decimals.
    */
  def select(scored: DataFrame, idCol: String, budget: Long): DataFrame = {
    val id = col(idCol)
    val u = (conv(substring(md5(concat(lit("g:"), id.cast("string"))
        .cast("binary")), 1, 6), 16, 10).cast("double") + lit(0.5)) / lit(16777216.0)
    val keyed = scored.withColumn("__g",
        round(-log(-log(u)), 9).cast("decimal(28,9)"))
      .withColumn("__key", (col("log_w") + col("__g")).cast("decimal(29,9)"))
    Packing.distributedRank(keyed, Seq(col("__key").desc, id.asc))
      .select(id, col("n_feats"),
        // round in DECIMAL space, cast after (the TextClassifier
        // near-tie lesson: rounding through a double diverges engines)
        round(col("log_w"), 6).cast("double").as("log_w"),
        col("rank").as("sel_rank"),
        (col("rank") <= budget).cast("int").as("picked"))
  }
}

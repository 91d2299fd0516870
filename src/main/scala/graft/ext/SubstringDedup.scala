package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact substring-duplication detection (extension beyond reference
  * parity, SURVEY.md §7.5): find documents sharing verbatim character
  * runs of length ≥ L — the "exact substring dedup" of Lee et al. 2022
  * (Deduplicating Training Data Makes Language Models Better), which
  * catches boilerplate and quotation overlap that whole-document and
  * bag-of-words dedup miss. The published recipe builds a corpus-wide
  * suffix array; the distributed shape here is the standard
  * fingerprint-index alternative (Karp-Rabin grams + winnowing, the
  * MOSS/Schleimer et al. 2003 construction), which shards over any
  * number of executors with plain hash partitioning.
  *
  * Two variants:
  *  - [[sharedGramPairs]]: EVERY position's L-gram is indexed — exact
  *    (no sampling gap) and replayable in DuckDB, the oracled gate.
  *    Gram volume is Σ(len-L+1) ≈ corpus chars — linear, but with a
  *    large constant; right for gate-scale corpora and for auditing a
  *    suspect slice.
  *  - [[winnowedGramPairs]]: robust-winnowed sampling — each window of
  *    `w` consecutive grams contributes its minimum hash, so any shared
  *    run of length ≥ L+w-1 chars still collides on at least one
  *    fingerprint (the winnowing guarantee), with ~2/(w+1) of the gram
  *    volume. The 100 TB path.
  *
  * Scale disciplines shared by both:
  *  - grams hash-partition by fingerprint; no doc×doc comparison ever
  *    happens — only docs sharing a fingerprint meet in the join.
  *  - hub fingerprints (boilerplate shared by thousands of docs) would
  *    fan out quadratically in the pair join; `maxDf` drops any
  *    fingerprint seen in more docs than the cap BEFORE the join (the
  *    standard MOSS noise threshold — a gram in 10k docs identifies a
  *    template, not a pair), bounding per-hash fanout to maxDf².
  */
object SubstringDedup {
  /** Distinct (id, fingerprint) pairs at every position. */
  private def allGrams(docs: DataFrame, idCol: String, textCol: String,
                       L: Int): DataFrame =
    docs.filter(length(col(textCol)) >= L)
      .select(col(idCol).as("id"), col(textCol).as("__t"))
      .select(col("id"), explode(expr(s"sequence(1, length(__t) - ${L - 1})")).as("i"),
        col("__t"))
      .select(col("id"), md5(expr(s"substring(__t, i, $L)")).as("h"))
      .distinct()

  /** Doc pairs sharing ≥ `minShared` distinct L-char gram fingerprints,
    * with the shared count. Exact: every position indexed.
    */
  def sharedGramPairs(docs: DataFrame, idCol: String, textCol: String,
                      L: Int = 40, minShared: Int = 5,
                      maxDf: Int = 1000): DataFrame = {
    // the fingerprint index is built ONCE and persisted: without this the
    // hub-count aggregate and both sides of the pair self-join each
    // re-run the explode+distinct from the raw text (4 corpus scans,
    // plan-audited r7 — Spark has no subplan CSE across self-join
    // aliases). At full corpus scale the same index would be WRITTEN,
    // suffix-array-pipeline style, and probed per-slice.
    val g = allGrams(docs, idCol, textCol, L)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // hub fingerprints are FEW (only templates exceed the cap): an anti
    // join against the broadcast hub set beats inner-joining the full
    // keep-list back onto the index
    val hub = g.groupBy("h").agg(count(lit(1)).as("df")).filter(col("df") > maxDf)
      .select("h")
    val kept = g.join(broadcast(hub), Seq("h"), "left_anti")
    val a = kept.as("a"); val b = kept.as("b")
    a.join(b, col("a.h") === col("b.h") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Per-document duplication profile (the corpus metric of Lee et al.
    * 2022): for every position, is its L-gram present in ≥ 2 distinct
    * documents? Returns (id, n_grams, n_dup, dup_frac) — the signal a
    * pipeline thresholds to drop boilerplate-heavy documents, and the
    * aggregate a corpus report tracks over time. Cost: one distinct per
    * (doc, gram), one vocabulary-sized df aggregate, one hash join back
    * — all partitioned by gram hash, linear in corpus chars.
    */
  def dupSpanStats(docs: DataFrame, idCol: String, textCol: String,
                   L: Int = 40): DataFrame = {
    val ph = docs.filter(length(col(textCol)) >= L)
      .select(col(idCol).as("id"), col(textCol).as("__t"))
      .select(col("id"), explode(expr(s"sequence(1, length(__t) - ${L - 1})")).as("i"),
        col("__t"))
      .select(col("id"), md5(expr(s"substring(__t, i, $L)")).as("h"))
    val multi = ph.select("id", "h").distinct()
      .groupBy("h").agg(count(lit(1)).as("nd")).filter(col("nd") >= 2)
      .select("h")
    ph.join(multi.hint("shuffle_hash").withColumn("__m", lit(1)), Seq("h"), "left_outer")
      .groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__m").isNotNull, 1L).otherwise(0L)).as("n_dup"))
      .withColumn("dup_frac", round(col("n_dup") / col("n_grams"), 6))
  }

  /** Robust-winnowed fingerprints: position i survives iff its hash is
    * the window minimum of positions [i, i+w). Any verbatim run of
    * ≥ L+w-1 chars shares at least one surviving fingerprint between
    * its copies. The per-doc window scan is a map-side higher-order
    * function — no shuffle until the (much smaller) fingerprint index.
    */
  def winnowedGramPairs(docs: DataFrame, idCol: String, textCol: String,
                        L: Int = 40, w: Int = 8, minShared: Int = 2,
                        maxDf: Int = 1000): DataFrame = {
    val hashed = docs.filter(length(col(textCol)) >= L)
      .select(col(idCol).as("id"),
        expr(s"transform(sequence(1, length($textCol) - ${L - 1})," +
          s" i -> xxhash64(substring($textCol, i, $L)))").as("hs"))
    // windows run inside ONE array expression per doc (codegen'd HOFs),
    // emitting only the surviving minima — the shuffle never sees the
    // full gram stream
    val g = hashed.select(col("id"),
        explode(expr(s"array_distinct(transform(" +
          s"sequence(0, greatest(size(hs) - $w, 0))," +
          s" i -> array_min(slice(hs, i + 1, $w))))")).as("h"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val hub = g.groupBy("h").agg(count(lit(1)).as("df")).filter(col("df") > maxDf)
      .select("h")
    val kept = g.join(broadcast(hub), Seq("h"), "left_anti")
    val a = kept.as("a"); val b = kept.as("b")
    a.join(b, col("a.h") === col("b.h") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}

package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Entity-resolution (fuzzy) join: match a dirty string column against a
  * clean catalog without the O(n·m) all-pairs edit-distance scan.
  *
  * Shape (the blocking-then-verify pattern every record-linkage system
  * uses, applied Spark-first):
  *   1. q-gram MinHash blocking — each side maps to (id, bucket) rows:
  *      3-grams of the string, k salted hash minima, minima concatenated
  *      pairwise into band buckets. Map-side only (explode + partial
  *      min-agg); nothing crosses the wire but k hashes per row.
  *   2. candidate join on bucket. A frequency cap drops degenerate
  *      buckets (a stopword-like gram pattern shared by a huge block)
  *      BEFORE the join — the cap is applied to the clean side, whose
  *      block sizes are the quadratic term, so a hub bucket can never
  *      materialize cap× candidates per dirty row. At 100 TB this cap is
  *      what bounds the shuffle: candidates are O(rows · bands · cap),
  *      never O(n·m).
  *   3. exact verify — levenshtein(dirty, clean) ≤ maxDist on the
  *      candidate pairs only (codegen'd built-in, no UDF).
  *   4. best-match select — min (distance, clean_id) per dirty id via a
  *      single window over the verified pairs.
  *
  * Two bucketers, same machinery (the house twin discipline):
  *   - [[md5Buckets]]: salted-md5 minima — every step is plain SQL that
  *     DuckDB replays verbatim, so the Catalog entry `join_fuzzy_md5`
  *     cross-engine-gates blocking, cap, verify, and best-match select.
  *   - [[xxBuckets]]: the production path — salted xxhash64 minima,
  *     8-byte long buckets instead of 32-byte hex, same band algebra.
  *     Gated by FuzzyJoinSpec equality against the brute-force lev join.
  */
object FuzzyJoin {

  /** 3-grams of column `c` as an array (whole string when len < 3). */
  private def gramsExpr(c: String): Column =
    expr(s"transform(sequence(1, greatest(length($c) - 2, 1)), i -> substring($c, i, 3))")

  /** Replayable bucketer: 4 salted md5 minima over 3-grams, banded 2×2.
    * Emits (id, bucket) — exactly the dedup_minhash_lsh oracle recipe
    * (Oracles.scala banding CTE), reused cross-table.
    *
    * The minima are computed PER ROW by the codegen'd
    * [[org.apache.spark.sql.graft.CharGramMinHashMd5]] kernel — the
    * relational explode → groupBy(min(md5hex)×4) it replaces (r14)
    * sort-aggregated the full gram volume with an exchange per side,
    * because `min(string)` is not hash-aggregable (the r14 before-plan
    * shows SortAggregate + Exchange under every bucketer call); the
    * kernel keeps the whole blocking signature inside the scan stage,
    * zero shuffle. Identity of results requires ids unique per row
    * (both fuzzy-join entries feed entity tables keyed by doc_id;
    * FuzzyJoinSpec pins kernel ≡ relational on the fixture).
    */
  def md5Buckets(df: DataFrame, idCol: String, strCol: String): DataFrame = {
    // null rows are dropped on the INPUT column, before the kernel runs:
    // a filter on the kernel's alias is pushed below the Project with the
    // alias substituted (PushPredicateThroughNonJoin), and Filter/Project
    // don't share subexpression elimination — the kernel would run twice
    // per row (ADVICE r14). The kernel is null-safe (null in → null out),
    // so the two forms select identical rows.
    val minima = df.filter(col(strCol).isNotNull)
      .select(col(idCol).as("id"),
        graft.functions.text.chargram_minhash_md5(col(strCol), 3, 4).as("__ms"))
    minima.select(col("id"), explode(array(
      md5(concat(element_at(col("__ms"), 1), lit("|"), element_at(col("__ms"), 2))),
      md5(concat(element_at(col("__ms"), 3), lit("|"), element_at(col("__ms"), 4)))))
      .as("bucket"))
  }

  /** The pre-r14 relational md5 bucketer — kept ONLY as the equivalence
    * reference for FuzzyJoinSpec (explode → groupBy sort-aggregates the
    * gram volume; the kernel form above is the production path).
    */
  private[graft] def md5BucketsRelational(df: DataFrame, idCol: String,
                                          strCol: String): DataFrame = {
    val g = df.select(col(idCol).as("id"), explode(gramsExpr(strCol)).as("gram"))
    val ms = (0 until 4).map(k => min(md5(concat(lit(s"$k|"), col("gram")))).as(s"m$k"))
    val minima = g.groupBy("id").agg(ms.head, ms.tail: _*)
    minima.select(col("id"), explode(array(
      md5(concat(col("m0"), lit("|"), col("m1"))),
      md5(concat(col("m2"), lit("|"), col("m3"))))).as("bucket"))
  }

  /** Production bucketer: 4 salted xxhash64 minima over the same
    * 3-grams, banded 2×2 — 8-byte longs where the twin carries 32-byte
    * hex (the substring-gate lesson: key width is the shuffle bill).
    * The band bucket stays a long (minima re-hashed pairwise), so the
    * candidate join compares 8 bytes, never strings. Minima per row via
    * the codegen'd [[org.apache.spark.sql.graft.CharGramMinHashXx]]
    * kernel — same zero-shuffle rationale and per-row contract as
    * [[md5Buckets]].
    */
  def xxBuckets(df: DataFrame, idCol: String, strCol: String): DataFrame = {
    // same input-column null gate as md5Buckets (single kernel eval).
    // NULL-input scope (ADVICE r14): the pre-r14 relational form emitted
    // one degenerate bucket shared by ALL null strings (xxhash64 skips a
    // null child instead of returning null); this path drops null rows.
    // resolve() output is unchanged either way — a null string matches
    // nothing within maxDist — but cross-table reuse of xxBuckets on
    // nullable columns should expect no rows for null input.
    val minima = df.filter(col(strCol).isNotNull)
      .select(col(idCol).as("id"),
        graft.functions.text.chargram_minhash_xx(col(strCol), 3, 4).as("__ms"))
    minima.select(col("id"), explode(array(
      xxhash64(lit(0), element_at(col("__ms"), 1), element_at(col("__ms"), 2)),
      xxhash64(lit(1), element_at(col("__ms"), 3), element_at(col("__ms"), 4))))
      .as("bucket"))
  }

  /** The pre-r14 relational xx bucketer — FuzzyJoinSpec's equivalence
    * reference, mirroring [[md5BucketsRelational]].
    */
  private[graft] def xxBucketsRelational(df: DataFrame, idCol: String,
                                         strCol: String): DataFrame = {
    val g = df.select(col(idCol).as("id"), explode(gramsExpr(strCol)).as("gram"))
    val ms = (0 until 4).map(k => min(xxhash64(lit(k), col("gram"))).as(s"m$k"))
    val minima = g.groupBy("id").agg(ms.head, ms.tail: _*)
    minima.select(col("id"), explode(array(
      xxhash64(lit(0), col("m0"), col("m1")),
      xxhash64(lit(1), col("m2"), col("m3")))).as("bucket"))
  }

  /** Resolve `dirty(idCol, strCol)` against `clean(idCol, strCol)`.
    * Returns (dirty_id, clean_id, dist) — the best verified match per
    * dirty row (ties break on smallest clean_id), dirty rows with no
    * match within `maxDist` absent.
    *
    * `maxBucket`: clean-side block-size cap; buckets with more clean
    * members are dropped from blocking entirely (both engines replay the
    * same HAVING, so the cap is part of the declared semantics, not a
    * heuristic).
    */
  def resolve(dirty: DataFrame, clean: DataFrame,
              idCol: String, strCol: String,
              bucketer: (DataFrame, String, String) => DataFrame,
              maxDist: Int = 3, maxBucket: Int = 64): DataFrame = {
    // The strings ride WITH the bucket rows (corpus-sized joins, before
    // blocking), so the candidate join emits verifiable pairs directly
    // and levenshtein runs INSIDE the bucket join's output stage. The
    // first cut fetched strings by re-joining the candidate set back to
    // both corpora — two sort-merge joins over the candidate volume
    // (O(rows·bands·cap), 64M rows at the 500k-doc bench corpus), which
    // the 4× probe measured as ~2000 task-CPU-s of pure sorting. A pair
    // that matches in both bands costs one extra levenshtein here; the
    // distinct happens after the ≤maxDist filter, on the tiny verified
    // set, instead of on the full candidate volume.
    val db = bucketer(dirty, idCol, strCol)
      .withColumnRenamed("id", "dirty_id").distinct()
      .join(dirty.select(col(idCol).as("dirty_id"), col(strCol).as("d_str")), "dirty_id")
    val cbAll = bucketer(clean, idCol, strCol)
      .withColumnRenamed("id", "clean_id").distinct()
    // clean-side hub cap: compute block sizes once, keep small blocks
    val keep = cbAll.groupBy("bucket").agg(count(lit(1)).as("bn"))
      .filter(col("bn") <= maxBucket).select("bucket")
    val cb = cbAll.join(keep, "bucket")
      .join(clean.select(col(idCol).as("clean_id"), col(strCol).as("c_str")), "clean_id")
    // threshold form (banded O(maxDist·n) instead of full O(m·n) per
    // pair, r14): for pairs within maxDist it returns the EXACT distance
    // — identical survivors, identical dist values, identical best-match
    // select — and for the rest returns -1 without filling the full
    // matrix. The verify stage is the fuzzy join's dominant cost
    // (StageProf r14: ~460 of ~950 task-s), and nearly every candidate
    // fails the cap, so the -1 early exit is where the time goes.
    val verified = db.join(cb, "bucket")
      .withColumn("dist", levenshtein(col("d_str"), col("c_str"), maxDist))
      .filter(col("dist") >= 0)
      .select("dirty_id", "clean_id", "dist").distinct()
    val w = Window.partitionBy("dirty_id").orderBy(col("dist"), col("clean_id"))
    verified.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("dirty_id"), col("clean_id"), col("dist").cast("int").as("dist"))
  }
}

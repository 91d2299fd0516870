package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches (Datasketches HLL via Spark's
  * `hll_sketch_agg` family) — the scale answer to `COUNT(DISTINCT x)
  * GROUP BY g` over 100 TB with recurring ingests.
  *
  * Why sketches and not exact distinct: an exact per-group distinct is a
  * full shuffle of every (group, value) pair on every run. A sketch table
  * is a few KB per group, is computed with map-side partial aggregation
  * (the HLL agg combines locally before the exchange), and — the key
  * property — is MERGEABLE: union(sketch(A), sketch(B)) estimates A ∪ B
  * within the same error bound as a from-scratch sketch, so a committed
  * sketch table is maintained by sketching ONLY the delta and unioning,
  * never re-reading the corpus. (The union's estimate differs sub-percent
  * from the direct sketch's: Datasketches reads a directly-built sketch's
  * HIP accumulator but estimates a union with the composite estimator,
  * and sparse-to-dense promotion points differ. SketchesSpec pins the
  * error bound vs exact, commutativity, idempotent delta replay, and
  * determinism — the properties maintenance actually relies on.)
  * Reference analog: the per-tribe membership counts the reference
  * recomputes from scratch each run (post_update.py) — here the
  * recurring cost is ∝ delta.
  *
  * CDC caveat: HLL is insert-only. Under deletes/updates, recompute the
  * sketches of the affected groups only (the [[graft.core.TribeAgg]]
  * incremental pattern) and replace those rows in the sketch table.
  */
object Sketches {
  /** Per-group HLL sketch of distinct `valueCol`, as a binary column.
    * lgK = 12 → ~2.5 KB/group, standard error ≈ 1.04/sqrt(4096) ≈ 1.6%.
    */
  def distinctSketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
                     lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch"))

  /** Estimated distinct counts from a sketch table. */
  def estimates(sketches: DataFrame, groupCols: Seq[String]): DataFrame =
    sketches.select(groupCols.map(col) :+
      hll_sketch_estimate(col("sketch")).as("approx_distinct"): _*)

  /** The incremental-maintenance step: committed sketch table ∪ delta
    * sketch table, per group. Full-outer on the group keys so groups new
    * in the delta appear and untouched groups pass through; both present
    * → hll_union. No row data crosses the wire — only sketch bytes.
    */
  def mergeSketchTables(a: DataFrame, b: DataFrame, groupCols: Seq[String]): DataFrame =
    mergeBy(a, b, groupCols, hll_union(_, _))

  // ---- KLL quantile-sketch tables (same maintenance discipline; see
  // org.apache.spark.sql.graft.SketchExpressions for why KLL and not
  // percentile_approx: Spark's own aggregate has no persistable state,
  // so a percentile table could never be maintained delta-only).

  /** Per-group KLL quantile sketch of `valueCol`, as a binary column.
    * k = 200 → normalized rank error ≈ 1.65%, ~5 KB/group.
    */
  def quantileSketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
                     k: Int = 200): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(graft.functions.sketch.kll_agg(col(valueCol), k).as("sketch"))

  /** Quantile estimates (one array column, ordered as `probs`) plus the
    * EXACT stream count the sketch tracks, from a sketch table.
    */
  def quantileEstimates(sketches: DataFrame, groupCols: Seq[String],
                        probs: Seq[Double]): DataFrame =
    sketches.select(groupCols.map(col) ++ Seq(
      graft.functions.sketch.kll_n(col("sketch")).as("n"),
      graft.functions.sketch.kll_quantiles(col("sketch"), probs).as("quantiles")): _*)

  /** Incremental maintenance for a quantile-sketch table: committed ∪
    * delta, per group — identical join shape to the HLL merge; only
    * sketch bytes cross the wire.
    */
  def mergeQuantileTables(a: DataFrame, b: DataFrame, groupCols: Seq[String]): DataFrame =
    mergeBy(a, b, groupCols, graft.functions.sketch.kll_union(_, _))

  // ---- md5-HLL: the oracle twin of the Datasketches path ----
  //
  // Classic Flajolet–Fusy–Gandouet–Meunier HyperLogLog with an
  // md5-derived hash, built from plain relational ops so the ENTIRE
  // sketch — hash, register assignment, register merge, estimator,
  // small-range correction — replays in DuckDB SQL and the estimate
  // crosses engines bit-for-bit (the `dedup_semantic_md5` discipline
  // applied to sketches; Datasketches' xxhash + HIP accumulator can't
  // cross). p=12 → m=4096 registers, the same geometry as the
  // production `distinctSketch(lgK=12)`, standard error ≈ 1.6%.
  //
  // Determinism across engines, term by term: the hash is md5 of the
  // value's decimal string (identical hex both sides); bucket and the
  // 48-bit rho window come from hex-digit arithmetic (conv here, a
  // generated digit-sum in the oracle); rho is a generated 48-branch
  // compare chain, NOT floor(log2(x)) — libm log at power-of-two
  // boundaries is exactly the cross-engine hazard an oracle must rule
  // out; the indicator sum Σ 2^-M[j] is scaled by 2^49 and summed in
  // BIGINT (max 4096·2^49 = 2^61 — EXACT, no FP summation order); the
  // final estimate is one IEEE division of identical doubles, and the
  // linear-counting branch's single ln() is rounded at 6 dp (the
  // text-LM oracle's rounding discipline — a last-ulp libm difference
  // is 10 orders below the rounding grain).
  //
  // Registers are a (group, bucket, r) table — mergeable by max(r),
  // which makes merge-then-estimate ≡ estimate-of-full EXACTLY (max of
  // maxes), so the committed ∪ delta maintenance path is pinned by
  // value equality, not an error bound.

  private val HllP = 12
  private val HllM: Int = 1 << HllP            // 4096 registers
  private val HllRestBits = 48                 // hex digits 4..15 of the md5
  /** 0.7213/(1 + 1.079/m) for m=4096, embedded as the exact double so
    * the oracle SQL can carry the IDENTICAL literal. */
  val HllAlpha = 0.7211100396160289

  /** Per-(group, bucket) max-rho register table for distinct `valueCol`,
    * from the md5 hash of its decimal-string form.
    */
  def md5HllRegisters(df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame = {
    val m = md5(col(valueCol).cast("string").cast("binary"))
    val bucket = conv(substring(m, 1, 3), 16, 10).cast("long")
    val rest = conv(substring(m, 4, 12), 16, 10).cast("long")
    val rho = (2 to HllRestBits).foldLeft(
        when(rest >= lit(1L << (HllRestBits - 1)), 1)) { (acc, k) =>
        acc.when(rest >= lit(1L << (HllRestBits - k)), k)
      }.otherwise(HllRestBits + 1)
    df.select(groupCols.map(col) :+ bucket.as("bucket") :+ rho.as("rho"): _*)
      .groupBy(groupCols.map(col) :+ col("bucket"): _*)
      .agg(max("rho").as("r"))
  }

  /** Merge register tables (the sketch-table maintenance step): union,
    * max per (group, bucket). Exactly idempotent and commutative.
    */
  def md5HllMerge(a: DataFrame, b: DataFrame, groupCols: Seq[String]): DataFrame =
    a.unionByName(b).groupBy(groupCols.map(col) :+ col("bucket"): _*)
      .agg(max("r").as("r"))

  /** The HLL estimate from a register table, as `outCol` per group.
    * Σ 2^-M[j] is computed exactly: present registers contribute
    * 2^(49-r) and the V absent ones 2^49 each, summed in BIGINT and
    * divided out of α·m²·2^49 in one IEEE step; linear counting
    * (m·ln(m/V)) replaces the raw estimate below 2.5m when V > 0.
    */
  def md5HllEstimate(regs: DataFrame, groupCols: Seq[String], outCol: String): DataFrame =
    regs.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__np"),
        sum(expr(s"shiftleft(cast(1 as bigint), ${HllRestBits + 1} - r)")).as("__sp"))
      .withColumn("__s",
        col("__sp") + (lit(HllM.toLong) - col("__np")) * lit(1L << (HllRestBits + 1)))
      .withColumn("__raw",
        lit(HllAlpha) * lit((HllM.toDouble) * HllM) * lit((1L << (HllRestBits + 1)).toDouble) /
          col("__s").cast("double"))
      .withColumn("__v", lit(HllM.toLong) - col("__np"))
      .withColumn(outCol, round(
        when(col("__raw") <= lit(2.5 * HllM) && col("__v") > 0,
          lit(HllM.toDouble) * log(lit(HllM.toDouble) / col("__v").cast("double")))
          .otherwise(col("__raw")), 6))
      .select(groupCols.map(col) :+ col(outCol): _*)

  // ---- log-histogram quantile sketch: the oracle twin of the KLL path
  //
  // A DDSketch-shaped quantile sketch (Masson, Lee, Rim: "DDSketch: a
  // fast and fully-mergeable quantile sketch with relative-error
  // guarantees", VLDB'19) built deterministic and SQL-replayable where
  // the paper's is not quite: bucket indices come from INTEGER bit
  // arithmetic over the value's exact cents form, not ceil(log_γ(x)) —
  // libm log at bucket boundaries is the cross-engine hazard, the same
  // one the md5-HLL rho chain avoids. Geometry: values < 32 cents get
  // exact unit buckets (ids 0..31); larger values bucket by
  // (bit_length, next-4-bits) — 16 sub-buckets per octave, ids ≥ 96,
  // width/lo ≤ 1/16, so the mid-bucket representative carries ≤ ~3.1%
  // relative error at any rank. The sketch is a (group, bucket, cnt)
  // table: counts, so the merge is SUM — exact, associative — and
  // merge-then-estimate ≡ estimate-of-full bit-for-bit, same pinning
  // discipline as md5-HLL. KLL (randomized compaction, tighter rank
  // error) stays the production path; this is the cross-engine-checked
  // twin.

  private val LhSub = 16        // sub-buckets per octave (4 bits)
  private val LhDirectMax = 32L // cents below this get exact unit buckets
  private val LhMaxBits = 48    // compare-chain depth: cents < 2^48

  /** Exact non-negative cents from a currency double (prices in the
    * data are cents-exact by construction, so the round is a no-op
    * that both engines resolve identically).
    */
  private def centsOf(valueCol: String) =
    round(col(valueCol) * lit(100.0)).cast("long")

  /** Per-(group, bucket) count table for `valueCol` (a currency
    * double). The log-histogram form of [[quantileSketch]].
    */
  def logHistogram(df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame = {
    val v = centsOf(valueCol)
    // one compare-chain branch per octave, LARGEST first (a when-chain
    // takes the first match), each with a CONSTANT shift: bucket =
    // bit_length(v)·16 + the 4 bits after the leading one. Deterministic
    // in any engine; never floor(log2).
    val bucket = (LhMaxBits - 1 to 6 by -1).foldLeft(
        when(v >= lit(1L << (LhMaxBits - 1)),
          lit(LhMaxBits.toLong * LhSub) + shiftright(v, LhMaxBits - 5) % LhSub) ) { (acc, b) =>
        acc.when(v >= lit(1L << (b - 1)),
          lit(b.toLong * LhSub) + shiftright(v, b - 5) % LhSub)
      }.otherwise(v) // v < 32: exact unit buckets 0..31
    df.select(groupCols.map(col) :+ bucket.as("bucket"): _*)
      .groupBy(groupCols.map(col) :+ col("bucket"): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge log-histogram tables: union, per-bucket count sum. Exact. */
  def logHistMerge(a: DataFrame, b: DataFrame, groupCols: Seq[String]): DataFrame =
    a.unionByName(b).groupBy(groupCols.map(col) :+ col("bucket"): _*)
      .agg(sum("cnt").as("cnt"))

  /** Quantile estimates from a log-histogram table: for each p, the
    * mid-point (in original currency units) of the first bucket whose
    * running count reaches ceil(p·n), one `p{NN}_<tag>` column per
    * prob, plus the exact `n_<tag>` the counts carry. Rank selection
    * and bucket inversion are integer arithmetic; the only doubles are
    * the final mid-point halving and cents→units division — identical
    * everywhere.
    */
  def logHistQuantiles(hist: DataFrame, groupCols: Seq[String], probs: Seq[Double],
                       tag: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cum = hist
      .withColumn("__cum", sum("cnt").over(
        Window.partitionBy(groupCols.map(col): _*).orderBy(col("bucket"))))
      .withColumn("__n", sum("cnt").over(Window.partitionBy(groupCols.map(col): _*)))
    // representative cents of a bucket: direct buckets are exact; a
    // composite bucket (e·16 + sub) spans [(16+sub)·2^(e-5), +2^(e-5))
    // — take the arithmetic midpoint, one constant-width branch per
    // octave (mirrors the forward chain)
    def rep(bucket: Column): Column =
      (7 to LhMaxBits).foldLeft(
        when(bucket < lit(LhDirectMax), bucket.cast("double"))) { (acc, b) =>
        val width = 1L << (b - 5)
        acc.when(bucket >= lit(b.toLong * LhSub) && bucket < lit((b + 1).toLong * LhSub),
          ((lit(LhSub.toLong) + bucket % LhSub) * lit(width)).cast("double")
            + lit(width / 2.0))
      }.otherwise( // b = 6 octave: ids 96..111, width 2
        ((lit(LhSub.toLong) + bucket % LhSub) * lit(2L)).cast("double") + lit(1.0))
    val qs = probs.map { p =>
      val name = s"p${(p * 100).toInt}_$tag"
      val rank = ceil(lit(p) * col("__n")).cast("long")
      name -> min(when(col("__cum") >= rank, col("bucket"))).as(s"__b_$name")
    }
    val agged = cum.groupBy(groupCols.map(col): _*)
      .agg(max(col("__n")).as(s"n_$tag"), qs.map(_._2): _*)
    qs.foldLeft(agged) { case (df, (name, _)) =>
      df.withColumn(name, round(rep(col(s"__b_$name")) / lit(100.0), 6))
        .drop(s"__b_$name")
    }
  }

  // ---- md5 count-min sketch: mergeable per-key frequency estimates ----
  //
  // The frequency sibling of the two sketch families above (Cormode &
  // Muthukrishnan 2005): a d×w counter grid where every occurrence of a
  // key increments one cell per row (cell = hash_r(key) mod w), and a
  // key's frequency estimate is the MIN over its d cells — one-sided
  // (never an undercount), error ≤ εN with probability 1−(1/e)^d for
  // w = ⌈e/ε⌉. Counts are ADDITIVE, so the sketch-table maintenance
  // step is a plain per-cell SUM: merge-then-estimate ≡ estimate-of-full
  // EXACTLY, the same value-equality pinning as the md5-HLL registers
  // (max) and the log-histogram (sum).
  //
  // Why this matters at 100 TB: the exact per-key frequency table
  // (`profile_heavy_hitters`) is key-cardinality-sized and needs a full
  // (key) shuffle per refresh; the CMS state is d·w rows — CONSTANT in
  // both corpus size and key cardinality — maintained by sketching only
  // the delta and summing. Probing k keys touches k·d cells of a
  // broadcast-sized table.
  //
  // Cross-engine determinism: the row hash is md5 of "r:" + the key's
  // decimal string (identical hex both sides); the cell is the first 3
  // hex digits as an integer (w = 4096, the md5-HLL bucket geometry), so
  // the ENTIRE sketch — cell assignment, counter sums, per-cell merge,
  // min-query — replays in DuckDB and estimates cross bit-for-bit.

  val CmsDepth = 4      // rows: P[overshoot > εN] ≤ e^-4 ≈ 1.8%
  val CmsWidth = 4096   // 3 hex digits; ε = e/4096 ≈ 0.066%

  /** Cell index of `value` under hash row `row`: first 3 hex digits of
    * md5("row:value"). The (constant) row prefix makes the d hashes
    * independent without needing d hash families.
    */
  private def cmsCell(value: Column, row: Int): Column =
    conv(substring(md5(concat(lit(s"$row:"), value.cast("string")).cast("binary")),
      1, 3), 16, 10).cast("long")

  /** Build the (r, cell, cnt) counter table for the stream of `valueCol`
    * occurrences. One explode (d rows per input) feeding a partial
    * aggregation — the exchange carries at most d·w rows per partition.
    */
  def cmsTable(df: DataFrame, valueCol: String): DataFrame =
    df.select(explode(array((0 until CmsDepth).map { r =>
        struct(lit(r).as("r"), cmsCell(col(valueCol), r).as("cell"))
      }: _*)).as("p"))
      .groupBy(col("p.r").as("r"), col("p.cell").as("cell"))
      .agg(count(lit(1)).as("cnt"))

  /** Merge counter tables (the maintenance step): union, per-cell SUM.
    * Exact and associative — merged ≡ from-scratch bit-for-bit.
    */
  def cmsMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("r", "cell").agg(sum("cnt").as("cnt"))

  /** Point-query `keys` (a frame with `keyCol`) against a counter table:
    * estimate = min over the key's d cells, absent cells counting 0
    * (unreachable for keys that occur in the sketched stream — their own
    * occurrences populate all d cells). The counter table is d·w rows,
    * so it broadcasts; the probe never shuffles the corpus.
    */
  def cmsEstimate(cms: DataFrame, keys: DataFrame, keyCol: String,
                  outCol: String): DataFrame =
    keys.select(col(keyCol), explode(array((0 until CmsDepth).map { r =>
        struct(lit(r).as("r"), cmsCell(col(keyCol), r).as("cell"))
      }: _*)).as("p"))
      .select(col(keyCol), col("p.r").as("r"), col("p.cell").as("cell"))
      .join(broadcast(cms), Seq("r", "cell"), "left_outer")
      .groupBy(keyCol)
      .agg(min(coalesce(col("cnt"), lit(0L))).as(outCol))

  /** Full-outer merge of two (groupCols, sketch) tables under `union`:
    * groups new in either side pass through, both present → union. The
    * rename-prefix (fresh exprIds) matters — the two sketch tables often
    * share lineage (corpus slice vs delta slice of one frame) and
    * alias-based resolution would be ambiguous in that self-join.
    */
  private def mergeBy(a: DataFrame, b: DataFrame, groupCols: Seq[String],
                      union: (Column, Column) => Column): DataFrame = {
    def pfx(df: DataFrame, p: String) =
      df.select(groupCols.map(c => col(c).as(s"$p$c")) :+ col("sketch").as(s"${p}sketch"): _*)
    val cond = groupCols.map(c => col(s"__a_$c") <=> col(s"__b_$c")).reduce(_ && _)
    pfx(a, "__a_").join(pfx(b, "__b_"), cond, "full_outer")
      .select(groupCols.map(c => coalesce(col(s"__a_$c"), col(s"__b_$c")).as(c)) :+
        when(col("__a_sketch").isNull, col("__b_sketch"))
          .when(col("__b_sketch").isNull, col("__a_sketch"))
          .otherwise(union(col("__a_sketch"), col("__b_sketch"))).as("sketch"): _*)
  }
}

package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic training-mixture scheduling (extension beyond reference
  * parity, SURVEY.md §7.5) — the step AFTER per-row sampling decides a
  * corpus: given per-source mixture weights and a global token budget,
  * select each source's documents in a fixed pseudo-random order until
  * the source's token target is met, and assign every selected document
  * a global interleave step (round-robin across sources), so the
  * training data loader consumes an explicit, reproducible schedule.
  * This is the T5/Pile "mixture weights × token budget" recipe;
  * [[graft.queries.Catalog]]'s `sample_temperature` is its per-row
  * Bernoulli cousin — that one can't hit a token BUDGET, because
  * admission there never sees the running total.
  *
  * Weights are α = 0.5 temperature over per-source token mass, in
  * INTEGER arithmetic end to end: sw_s = floor(sqrt(T_s)) (IEEE sqrt is
  * correctly rounded — exactly reproducible on any engine, unlike ln),
  * target_s = (budget · sw_s) div Σ sw — so targets are exact BIGINTs
  * and the whole schedule replays bit-for-bit in a second engine.
  *
  * Scale shape (the [[Packing.packSequences]] two-phase prefix-scan
  * discipline, applied per source):
  *  - the per-source cumulative token sum is NEVER a one-task
  *    per-source window: documents order by their md5 hex, whose FIRST
  *    DIGIT range-shards each source 16 ways (the digit is the hex
  *    prefix, so shard-then-within-shard order IS the global md5
  *    order). Phase 1 aggregates (source, shard) token totals — a
  *    16·n_sources-row frame, driver-sized; phase 2 runs the real
  *    cumsum window per (source, shard) cell with the earlier shards'
  *    mass added as a broadcast offset.
  *  - selection (`cum_before < target`) is prefix-closed within every
  *    cell, so the interleave rank is a per-cell row_number plus a
  *    selected-count offset — one more driver-sized aggregate over the
  *    (budget-bounded) selected subset, never a global sort.
  *  - driver state: two O(16·n_sources) collects and the source list.
  */
object Mix {
  /** Bounded cache for the admitted selection ([[CacheSlot]] — one live
    * selection per JVM). CONTRACT (ADVICE r13): calls to [[schedule]]
    * are sequential-consume — a later call's swap unpersists the
    * previous selection (still correct via recompute, but its laziness
    * is gone), and swap's unpersist+persist pair is not atomic under
    * concurrent callers. The Runner executes queries serially; revisit
    * with synchronization if concurrent query execution ever lands.
    */
  private val selectedSlot = new CacheSlot

  /** The schedule: (idCol, srcCol, n_tokens, cum_before, step), ordered
    * by `step`. `cum_before` is the source's token mass selected before
    * this document (the admission rule is cum_before < target, so the
    * last pick may overflow the target by part of one document);
    * `step = (k−1)·n_sources + src_idx` interleaves sources round-robin
    * by each pick's within-source position k.
    */
  def schedule(docs: DataFrame, idCol: String, srcCol: String, textCol: String,
               budgetFrac: Double = 0.4): DataFrame = {
    val d = docs.select(col(idCol).as("id"), col(srcCol).as("src"),
        size(split(col(textCol), " ")).cast("long").as("n_tokens"),
        md5(col(idCol).cast("string").cast("binary")).as("hx"))
      .withColumn("shard", conv(substring(col("hx"), 1, 1), 16, 10).cast("int"))

    // ---- phase 1: (source, shard) token totals — 16·n_sources rows
    val cells = d.groupBy("src", "shard").agg(sum("n_tokens").as("cell_tokens"))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val sources = cells.keys.map(_._1).toSeq.distinct.sorted
    val perSource = sources.map(s =>
      s -> (0 to 15).map(sh => cells.getOrElse((s, sh), 0L)).sum).toMap
    val total = perSource.values.sum
    val budget = math.floor(budgetFrac * total.toDouble).toLong
    // integer temperature weights: floor of the correctly-rounded sqrt
    val sw = sources.map(s => s -> math.sqrt(perSource(s).toDouble).toLong).toMap
    val sumSw = sources.map(sw).sum
    val target = sources.map(s => s -> budget * sw(s) / sumSw).toMap
    val srcIdx = sources.zipWithIndex.toMap
    val nSources = sources.size

    // per-cell token offsets: mass of the source's EARLIER shards
    import docs.sparkSession.implicits._
    val offsets = (for {
      s <- sources; sh <- 0 to 15
    } yield (s, sh, (0 until sh).map(p => cells.getOrElse((s, p), 0L)).sum,
        target(s), srcIdx(s)))
      .toDF("src", "shard", "tok_offset", "target", "src_idx")

    // ---- phase 2: real cumsum per cell + offset; admit prefix
    val cellOrder = Window.partitionBy("src", "shard").orderBy("hx", "id")
    val selected = d.join(broadcast(offsets), Seq("src", "shard"))
      .withColumn("cum_before",
        coalesce(sum("n_tokens").over(
          cellOrder.rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
          + col("tok_offset"))
      .filter(col("cum_before") < col("target"))
    // bounded via CacheSlot: the selection is re-read lazily by the
    // returned frame, so the callee can't unpersist — but it CAN
    // release the PREVIOUS call's selection (one live cache per JVM,
    // not one per invocation)
    val selectedC = selectedSlot.swap(selected)

    // ---- phase 3: within-source pick position over the selected
    // subset (prefix-closed per cell ⇒ row_number + selected-count
    // offsets), then the round-robin step
    val selCounts = selectedC.groupBy("src", "shard").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val selOffsets = (for {
      s <- sources; sh <- 0 to 15
    } yield (s, sh, (0 until sh).map(p => selCounts.getOrElse((s, p), 0L)).sum))
      .toDF("src", "shard", "sel_offset")
    selectedC.join(broadcast(selOffsets), Seq("src", "shard"))
      .withColumn("k", row_number().over(cellOrder).cast("long") + col("sel_offset"))
      .select(col("id").as(idCol), col("src").as(srcCol), col("n_tokens"),
        col("cum_before"),
        ((col("k") - 1) * lit(nSources.toLong) + col("src_idx")).as("step"))
      .orderBy("step")
  }
}

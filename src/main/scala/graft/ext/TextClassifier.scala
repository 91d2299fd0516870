package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes text classifier (extension beyond reference
  * parity, SURVEY.md §7.5) — the quality-classifier stage of the public
  * LLM-data recipes (GPT-3's "high-quality corpus" logistic filter,
  * CCNet's fastText language filter): train a linear bag-of-words model
  * on a labeled slice, score the whole corpus, keep the positive tail.
  * NB with add-1 smoothing is the classic closed-form instance — the
  * trained model IS two aggregations (per-class word counts + priors),
  * so training is exactly one corpus pass and scoring is one
  * vocabulary-sized join, with none of SGD's order-dependence to break
  * cross-engine determinism.
  *
  * Scale shape (the [[TextLm]] discipline, applied to classification):
  *  - the model is a vocabulary-sized (word, weight) table — persistable
  *    parquet state, precomputed once; scoring never recomputes it.
  *  - scoring joins are hinted shuffle_hash: the corpus-token side is
  *    huge and append-only, the weight side is bounded; a sort of the
  *    token stream would dominate, a broadcast dies when the vocabulary
  *    outgrows the driver.
  *  - per-token log-likelihood-ratio weights are rounded to 9 dp and
  *    summed as DECIMAL(28,9) — exact, order-independent, so the
  *    distributed per-doc sum is bit-reproducible on any engine and any
  *    partitioning.
  *  - the only driver scalars are the class priors and totals (five
  *    longs — [[TextLm.train]]'s `v` precedent).
  *
  * Binary multinomial NB: for a document with token counts c_w,
  *   log-odds = ln(n_pos/n_neg)
  *            + Σ_w c_w · [ln((cnt_pos(w)+1)/(T_pos+V)) −
  *                         ln((cnt_neg(w)+1)/(T_neg+V))]
  * restricted to vocabulary words (out-of-vocabulary tokens carry no
  * signal either way — the standard inner-join form). Predict positive
  * when log-odds > 0.
  */
object TextClassifier {
  /** A trained model: the vocabulary-sized per-word log-likelihood-ratio
    * weight table (`w`, `wgt` DECIMAL(28,9)) plus the prior log-odds
    * (already rounded to the 9 dp summation grain).
    */
  final case class Nb(weights: DataFrame, bias: BigDecimal)

  private def round9(x: Double): BigDecimal =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)

  /** Train on `docs` labeled by the boolean `label` column expression:
    * one explode + two aggregates (word counts per class; priors). The
    * weight table rows are the model — ln-ratios rounded to 9 dp so the
    * scoring sum is exact decimal arithmetic everywhere.
    */
  /** Bounded cache for the count table ([[CacheSlot]]: one live model
    * per JVM; the previous train's cache releases on the next train).
    * CONTRACT (ADVICE r13): trains are sequential-consume — a later
    * train's swap unpersists the previous model's still-lazily-referenced
    * frame (correct via recompute), and swap is not atomic under
    * concurrent callers; queries run serially today.
    */
  private val cwSlot = new CacheSlot

  def train(docs: DataFrame, idCol: String, textCol: String, label: Column): Nb = {
    val cw = cwSlot.swap(docs
      .select(label.as("pos"), explode(split(col(textCol), " ")).as("w"))
      .groupBy("w")
      .agg(sum(when(col("pos"), 1L).otherwise(0L)).as("cp"),
        sum(when(col("pos"), 0L).otherwise(1L)).as("cn")))
    // totals and vocabulary fold from the (already vocabulary-sized)
    // count table; priors from one count over the training slice
    val t = cw.agg(sum("cp"), sum("cn"), count(lit(1))).head()
    val (tp, tn, v) = (t.getLong(0), t.getLong(1), t.getLong(2))
    val p = docs.select(label.as("pos"))
      .agg(sum(when(col("pos"), 1L).otherwise(0L)),
        sum(when(col("pos"), 0L).otherwise(1L))).head()
    val (np, nn) = (p.getLong(0), p.getLong(1))
    require(np > 0 && nn > 0, s"NB needs both classes in the training slice (np=$np nn=$nn)")
    // ln arguments are IEEE divisions of exact integers — identical on
    // any engine; the 9 dp round absorbs last-ulp libm differences (the
    // TextLm surprisal discipline)
    val weights = cw.select(col("w"),
      round(log((col("cp") + lit(1.0)) / lit((tp + v).toDouble)) -
        log((col("cn") + lit(1.0)) / lit((tn + v).toDouble)), 9)
        .cast("decimal(28,9)").as("wgt"))
    Nb(weights, round9(math.log(np.toDouble) - math.log(nn.toDouble)))
  }

  /** Score `docs` under a trained model: (id, n_vocab_tokens, log_odds).
    * Documents with no vocabulary token are absent (no evidence — the
    * caller decides their fate, as with [[TextLm.scoreDocs]]'s <2-token
    * docs).
    */
  def score(nb: Nb, docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"), explode(split(col(textCol), " ")).as("w"))
      .join(nb.weights.hint("shuffle_hash"), Seq("w"))
      .groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("n_vocab_tokens"), sum("wgt").as("__s"))
      .select(col(idCol), col("n_vocab_tokens"),
        // round in DECIMAL space (exact digits, HALF_UP on both
        // engines), cast to double only AFTER: rounding a near-tie sum
        // through a double diverges cross-engine (Java's round-on-double
        // re-reads the SHORTEST decimal string of the binary value,
        // DuckDB rounds the raw double — 4.530000500 split them). The
        // sum is narrowed to (28,9) BEFORE the bias add: Spark types
        // sum(DECIMAL(28,9)) as (38,9), and (38,9)+(28,9) overflows
        // precision 38, silently dropping to scale 8 — which MINTED a
        // tie (…0496 → …050 → round-up) the oracle's full-scale decimal
        // arithmetic never saw. The narrow is lossless here: |log-odds
        // sums| are O(10³), nineteen integer digits of headroom.
        round(col("__s").cast("decimal(28,9)")
            + lit(nb.bias.bigDecimal).cast("decimal(28,9)"), 6)
          .cast("double").as("log_odds"))
}

package graft.ext

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.graft.{Bridge, BloomMightContainUtf8}
import org.apache.spark.util.sketch.BloomFilter

/** Broadcast-Bloom prefilter for exact-match decontamination at corpus
  * scale (SURVEY.md §7.5; the n-gram-overlap semantics mirror the
  * benchmark-decontamination sweep the reference-style pipelines run
  * before training).
  *
  * The scale story: a held-out benchmark set is FIXED-size (millions of
  * n-grams → a few MB of Bloom bits at 1% fpp), while the corpus side
  * grows without bound. Joining them directly shuffles every corpus
  * shingle (~94M rows at the 4× probe scale) just to discard the ~99%
  * that match nothing. Building the sketch with one tree-aggregate over
  * the benchmark side, broadcasting it once, and probing INSIDE the
  * corpus scan stage means only true matches plus an fpp-bounded sliver
  * of false positives ever reach the exchange — the exact verification
  * join downstream removes the false positives, so the final output is
  * BIT-IDENTICAL to the unfiltered exact join (Bloom has no false
  * negatives) at a fraction of the shuffle volume. At 1000 executors the
  * sketch rides the broadcast once per executor, not per task.
  */
object BloomGate {

  /** One distributed build pass: Bloom bits over the UTF-8 bytes of
    * `col` (deduplication is inherent — no distinct needed), merged
    * tree-wise to the driver, broadcast back. `expected` oversizing is
    * harmless (lower fpp); undersizing degrades fpp, never correctness.
    */
  def build(spark: SparkSession, df: DataFrame, col: String,
            expected: Long, fpp: Double = 0.01): Broadcast[BloomFilter] = {
    import spark.implicits._
    val strings = df.select(org.apache.spark.sql.functions.col(col)).as[String]
    val bf = strings.rdd.treeAggregate(
      BloomFilter.create(math.max(expected, 1L), fpp))(
      seqOp = (f, s) => { if (s != null) f.putBinary(s.getBytes("UTF-8")); f },
      combOp = (a, b) => a.mergeInPlace(b))
    spark.sparkContext.broadcast(bf)
  }

  /** Scan-stage membership probe (no false negatives; fpp false
    * positives). Pairs with [[build]] — same UTF-8-bytes hashing.
    */
  def mightContain(c: Column, bf: Broadcast[BloomFilter]): Column =
    Bridge.column(BloomMightContainUtf8(Bridge.expression(c), bf))
}

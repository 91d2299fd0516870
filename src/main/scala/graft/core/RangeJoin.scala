package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (point-in-interval) join via interval binning.
  *
  * Spark plans a pure inequality join (`p.ts >= iv.start AND p.ts <
  * iv.end`) as a broadcast nested loop — O(points × intervals)
  * comparisons, a non-starter when both sides are large. The bin trick
  * converts it to an equi join: bucket time into fixed bins, explode
  * each interval over the bins it covers, map each point to its single
  * bin, equi-join on the bin id, and verify the exact containment
  * predicate on candidates only. Each (point, interval) match is found
  * exactly once (in the point's bin), so no dedup pass is needed.
  * Shuffle is ∝ points + intervals × (span/binWidth); pick `binSeconds`
  * near the typical interval length so the explode factor stays O(1).
  * (The same shape DuckDB reaches internally with IEJoin and Flink with
  * interval joins; Spark has no native equivalent.)
  */
object RangeJoin {
  /** For every interval (ivId, [ivStart, ivEnd)), the count of points
    * whose `pointTs` falls inside — intervals with no points included
    * with count 0. Timestamp columns; `ivEnd` exclusive.
    */
  def pointInIntervalCounts(points: DataFrame, intervals: DataFrame,
                            pointTs: String, ivId: String, ivStart: String,
                            ivEnd: String, binSeconds: Long,
                            maxBinsPerInterval: Int = 10000): DataFrame = {
    require(binSeconds > 0)
    val w = lit(binSeconds * 1000000L) // bin width in epoch-µs
    def bin(c: Column): Column = floor(unix_micros(c) / w).cast("long")
    // end-exclusive: the last covered bin is the one holding end - 1µs
    val lastBin = floor((unix_micros(col(ivEnd)) - 1) / w).cast("long")
    // fail fast on a corrupt interval instead of exploding one row into
    // millions of bins (a far-future end would blow up the shuffle with
    // an opaque sequence-length error otherwise). The guard is woven into
    // the sequence bound itself — a detached check column would be pruned
    // as dead code by the optimizer.
    val guardedLast = when(
      lastBin - bin(col(ivStart)) >= lit(maxBinsPerInterval.toLong),
      raise_error(concat(
        lit(s"interval spans more than $maxBinsPerInterval bins: id="),
        col(ivId).cast("string"))).cast("long"))
      .otherwise(lastBin)
    val iv = intervals.filter(col(ivStart) < col(ivEnd))
      .select(col(ivId), col(ivStart), col(ivEnd),
        explode(sequence(bin(col(ivStart)), guardedLast)).as("__bin"))
    val pt = points.select(col(pointTs).as("__pts"), bin(col(pointTs)).as("__bin"))
    val matched = pt.join(iv, Seq("__bin"))
      .filter(col("__pts") >= col(ivStart) && col("__pts") < col(ivEnd))
      .groupBy(col(ivId)).agg(count(lit(1)).as("n"))
    intervals.select(col(ivId)).distinct()
      .join(matched, Seq(ivId), "left_outer")
      .withColumn("n", coalesce(col("n"), lit(0L)))
  }
}

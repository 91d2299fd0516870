package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed persistence for the CDC state tables.
  *
  * At 100 TB the dominant recurring cost of the warm pipeline
  * ([[Pipeline.warm]]) is shuffling the snapshot + signature cache on the
  * key for every diff. The reference pays the analogous cost as MySQL
  * primary-key lookups (README.md:14); Spark's answer is bucketing: store
  * snapshot and state bucketed (hash-partitioned + sorted) by the key, and
  * every key-equi join/aggregate against them becomes exchange-free —
  * only the (much smaller) incoming source side still shuffles.
  *
  * Buckets should be sized so one bucket ≈ one task's memory budget
  * (128-512 MB); for a 100 TB snapshot that is O(10^5) buckets.
  */
object Bucketing {
  /** Write `df` bucketed + sorted by `key` as a catalog table. */
  def writeBucketed(df: DataFrame, table: String, key: Seq[String], buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key.head, key.tail: _*)
      .sortBy(key.head, key.tail: _*)
      .saveAsTable(table)

  /** Join two co-bucketed tables on their bucket key: with matching bucket
    * counts Spark plans a sort-merge join with NO Exchange on either side.
    */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
                    key: Seq[String], joinType: String = "inner"): DataFrame =
    spark.table(left).join(spark.table(right), key, joinType)
}

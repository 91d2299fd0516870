package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for key-equi joins.
  *
  * AQE's skew-join splitting (on by default) handles most runtime skew;
  * explicit salting covers the cases AQE cannot: skew on the BUILD side
  * of a shuffled hash join, pre-AQE plan stages (cached/bucketed
  * subplans), and joins whose skew is known ahead of planning. Used when
  * one join key (a mega-tribe, a viral document bucket) would otherwise
  * pin a single task at 100 TB.
  */
object Skew {
  /** Join `large` (skewed) with `small` on `key`, fanning EVERY key
    * across `salts` sub-partitions: the large side gets a deterministic
    * row-hash salt, the small side is replicated once per salt value.
    * Result is identical to the plain join for inner/left joins. Full
    * replication costs |small|×salts — prefer [[saltedJoinHot]] when the
    * hot keys are identifiable.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: Seq[String],
                 salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0)
    val largeSalted = large.withColumn("__salt",
      pmod(xxhash64(large.columns.map(col): _*), lit(salts)).cast("int"))
    val smallReplicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    largeSalted.join(smallReplicated, key :+ "__salt", joinType).drop("__salt")
  }

  /** Hot-key-targeted salted join: only rows whose key appears in `hot`
    * (a 1+-column frame of the skewed key values, broadcast) fan out
    * across `salts` sub-partitions; every other key keeps salt 0 with no
    * replication. Replication cost is ∝ (#hot keys × salts) instead of
    * |small| × salts — the shape production skew joins use (the same
    * hot-key split AQE's OptimizeSkewedJoin performs at runtime, applied
    * where AQE cannot).
    */
  def saltedJoinHot(large: DataFrame, small: DataFrame, key: Seq[String],
                    hot: DataFrame, salts: Int,
                    joinType: String = "inner"): DataFrame = {
    require(salts > 0)
    val hotFlag = broadcast(hot.select(key.map(col): _*).distinct()
      .withColumn("__is_hot", lit(true)))
    val largeSalted = large.join(hotFlag, key, "left_outer")
      .withColumn("__salt",
        when(col("__is_hot"),
          pmod(xxhash64(large.columns.map(col): _*), lit(salts)).cast("int"))
          .otherwise(lit(0)))
      .drop("__is_hot")
    val smallSalted = small.join(hotFlag, key, "left_outer")
      .withColumn("__salt", explode(
        when(col("__is_hot"), sequence(lit(0), lit(salts - 1)))
          .otherwise(array(lit(0)))))
      .drop("__is_hot")
    largeSalted.join(smallSalted, key :+ "__salt", joinType).drop("__salt")
  }

  /** Auto-salting join: sample `large`'s key histogram; keys whose
    * sampled frequency exceeds `skewFactor` × the mean become the hot set
    * for [[saltedJoinHot]]. With no hot keys the plain join runs
    * unchanged — making this safe to leave on a recurring pipeline path
    * (uniform runs pay one sampled aggregate, skewed runs get spread).
    */
  def autoSaltJoin(large: DataFrame, small: DataFrame, key: Seq[String],
                   salts: Int, sampleFraction: Double = 0.05,
                   skewFactor: Double = 8.0,
                   joinType: String = "inner",
                   maxHotKeys: Int = 100000): DataFrame = {
    val counts = large.sample(withReplacement = false, sampleFraction, seed = 7L)
      .groupBy(key.map(col): _*).agg(count(lit(1)).as("__n"))
      .persist()
    try {
      val meanRow = counts.agg(avg(col("__n"))).first()
      val mean = if (meanRow.isNullAt(0)) 0.0 else meanRow.getDouble(0)
      // collect the hot set to the driver: it is small by construction
      // (keys above skewFactor × mean), and a literal relation means the
      // sampled scan+aggregate runs ONCE here — not re-executed inside
      // both sides of the salted plan every time the join runs. The cap
      // guards the pathological case; past it, salting everything via
      // saltedJoin is the right tool, not a hot set.
      val hotRows =
        if (mean == 0.0) Array.empty[org.apache.spark.sql.Row]
        else counts.filter(col("__n") > lit(math.max(mean * skewFactor, 1.0)))
          .select(key.map(col): _*).limit(maxHotKeys + 1).collect()
      require(hotRows.length <= maxHotKeys,
        s"autoSaltJoin: > $maxHotKeys hot keys — skew is not concentrated; use saltedJoin")
      if (hotRows.isEmpty) large.join(small, key, joinType)
      else {
        val schema = org.apache.spark.sql.types.StructType(
          key.map(k => counts.schema(k)))
        val hot = large.sparkSession.createDataFrame(
          java.util.Arrays.asList(hotRows: _*), schema)
        saltedJoinHot(large, small, key, hot, salts, joinType)
      }
    } finally counts.unpersist()
  }
}

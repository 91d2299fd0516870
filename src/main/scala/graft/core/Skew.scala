package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for key-equi joins.
  *
  * AQE's skew-join splitting (on by default) handles most runtime skew;
  * this explicit salting utility covers the cases AQE cannot: skew on the
  * BUILD side of a shuffled hash join, or pre-AQE plan stages (e.g. inside
  * cached/bucketed subplans). Used when one join key (a mega-tribe, a
  * viral document bucket) would otherwise pin a single task at 100 TB.
  */
object Skew {
  /** Join `large` (skewed) with `small` on `key`, fanning each skewed key
    * across `salts` sub-partitions: the large side gets a deterministic
    * row-hash salt, the small side is replicated once per salt value.
    * Result is identical to the plain join for inner/left joins; the
    * shuffle spreads each hot key over `salts` tasks.
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
}

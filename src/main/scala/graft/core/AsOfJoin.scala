package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the latest right row of the same key
  * with `rightTime <= leftTime`. Spark has no native ASOF join operator;
  * per the preference order (SURVEY §7.3 / prompt), this composes
  * existing operators rather than adding a physical node: tag both
  * sides, union, and carry the most recent right payload forward with a
  * running `last(ignoreNulls)` window — one shuffle on (key, time), no
  * per-row point lookups.
  *
  * Right rows sort BEFORE left rows at equal timestamps (`__il` 0 < 1),
  * making the match inclusive (`<=`), mirroring DuckDB's ASOF semantics.
  * Scale: equivalent to one sort-merge pass per key partition; skewed
  * keys behave like any windowed aggregation (AQE/salting apply).
  */
object AsOfJoin {
  /** Timestamps normalize to ntz (so tz-aware and naive inputs compare);
    * any other orderable time type (long sequence numbers, ints) passes
    * through unchanged.
    */
  private def asTime(df: DataFrame, c: String) = {
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    df.schema(c).dataType match {
      case TimestampType | TimestampNTZType => col(c).cast("timestamp_ntz")
      case _                                => col(c)
    }
  }

  def asofLE(left: DataFrame, right: DataFrame, leftKey: String,
             rightKey: String, leftTime: String, rightTime: String,
             rightCols: Seq[String]): DataFrame = {
    val l2 = left.select(
      col(leftKey).as("__k"),
      asTime(left, leftTime).as("__t"),
      lit(1).as("__il"),
      struct(left.columns.map(col): _*).as("__l"),
      lit(null).cast(
        right.select(struct(rightCols.map(col): _*)).schema.head.dataType).as("__r"))
    // drop null-key right rows: Window.partitionBy groups NULLs into one
    // partition, which would let a null-key left row match a null-key
    // right row — DuckDB ASOF (the semantics mirrored here) never matches
    // on NULL equality, so null-key left rows must surface unmatched
    val r2 = right.filter(col(rightKey).isNotNull).select(
      col(rightKey).as("__k"),
      asTime(right, rightTime).as("__t"),
      lit(0).as("__il"),
      lit(null).cast(
        left.select(struct(left.columns.map(col): _*)).schema.head.dataType).as("__l"),
      struct(rightCols.map(col): _*).as("__r"))
    val w = Window.partitionBy("__k")
      .orderBy(col("__t"), col("__il"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l2.unionByName(r2)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__il") === 1)
      .select(col("__l.*") +: rightCols.map(c => col(s"__m.$c").as(c)): _*)
  }
}

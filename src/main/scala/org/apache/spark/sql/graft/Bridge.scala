package org.apache.spark.sql.graft

import org.apache.spark.sql.{classic, Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Converters between the public `Column` API and catalyst `Expression`s.
  *
  * Spark 4 moved these behind `private[sql]` (`ExpressionUtils`,
  * columnNodeSupport.scala in the Spark source tree); placing this object
  * inside the `org.apache.spark.sql` package tree is the standard way for
  * libraries shipping custom catalyst expressions to reach them.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a (resolved) logical plan as a DataFrame — the `Dataset.ofRows`
    * entry point custom operators need (private[sql] in Spark 4).
    */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Register a native expression as a SQL function on a LIVE session
    * (the extensions route only applies at session build).
    */
  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")

  /** Block until the listener bus has delivered every queued event —
    * `SparkContext.listenerBus` is `private[spark]`, and the per-query
    * metric collectors (StageProf) need the drain barrier so late
    * TaskEnd events can't leak across query boundaries (ADVICE r14).
    */
  def drainListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()
}

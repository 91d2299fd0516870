package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.core.Tables

class TopKPerGroupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def scored = {
    val li = Tables.load(spark, TestSpark.Sf, "lineitem")
    li.select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
      col("l_extendedprice"))
  }

  test("native top-k equals the window row_number formulation") {
    val native = TopK.perGroup(scored, Seq("l_suppkey"),
      Seq(("l_extendedprice", false), ("l_orderkey", true), ("l_linenumber", true)), 3)
    val w = Window.partitionBy("l_suppkey")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    val windowed = scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= 3).drop("__rn")
    assert(native.count() == windowed.count())
    assert(native.exceptAll(windowed).isEmpty && windowed.exceptAll(native).isEmpty)
  }

  test("plan uses TopKPerGroupExec, not Window/full Sort") {
    val native = TopK.perGroup(scored, Seq("l_suppkey"),
      Seq(("l_extendedprice", false)), 2)
    val plan = native.queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix
    assert(plan.contains("TopKPerGroup"), plan)
    assert(plan.contains("Exchange hashpartitioning"), plan) // EnsureRequirements honored our distribution
    assert(!plan.contains("Window"), plan)
  }

  test("k larger than any group returns everything") {
    val native = TopK.perGroup(scored, Seq("l_suppkey"),
      Seq(("l_extendedprice", false), ("l_orderkey", true), ("l_linenumber", true)),
      1000000)
    assert(native.count() == scored.count())
  }

  test("unknown column fails fast") {
    intercept[IllegalArgumentException] {
      TopK.perGroup(scored, Seq("nope"), Seq(("l_extendedprice", false)), 3)
    }
  }
}

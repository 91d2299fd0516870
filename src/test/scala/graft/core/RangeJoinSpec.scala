package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("binned counts equal the nested-loop join, including boundaries and empties") {
    // intervals deliberately span bin boundaries; bin width 10s
    val intervals = Seq(
      (1L, ts(0), ts(15)),    // crosses bins 0 and 1
      (2L, ts(10), ts(20)),   // exactly bin 1
      (3L, ts(100), ts(130)), // no points inside
      (4L, ts(20), ts(20))    // empty interval: start == end
    ).toDF("iv_id", "s", "e")
    val points = Seq(ts(0), ts(9), ts(10), ts(14), ts(15), ts(19), ts(20), ts(99))
      .toDF("ts")
    val got = RangeJoin.pointInIntervalCounts(points, intervals,
        "ts", "iv_id", "s", "e", binSeconds = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // brute force (test-only nested loop)
    val brute = intervals.as("i").join(points.as("p"),
        col("p.ts") >= col("i.s") && col("p.ts") < col("i.e"), "left_outer")
      .groupBy(col("i.iv_id")).agg(count(col("p.ts")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == brute)
    // spot semantics: end exclusive, start inclusive, empty intervals 0
    assert(got == Map(1L -> 4L, 2L -> 4L, 3L -> 0L, 4L -> 0L))
  }

  test("corrupt interval fails fast instead of exploding millions of bins") {
    val intervals = Seq((1L, ts(0), ts(10)), (2L, ts(0), ts(100000000L)))
      .toDF("iv_id", "s", "e")
    val points = Seq(ts(1)).toDF("ts")
    val ex = intercept[Exception] {
      RangeJoin.pointInIntervalCounts(points, intervals,
        "ts", "iv_id", "s", "e", binSeconds = 10, maxBinsPerInterval = 1000).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("spans more than 1000 bins")), ex.getMessage)
  }

  test("plan is an equi join on the bin, not a nested loop") {
    val intervals = Seq((1L, ts(0), ts(15))).toDF("iv_id", "s", "e")
    val points = Seq(ts(1)).toDF("ts")
    val plan = RangeJoin.pointInIntervalCounts(points, intervals,
      "ts", "iv_id", "s", "e", 10).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join fell back to a nested loop:\n$plan")
  }
}

package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Property check: the binned range join equals the nested-loop join for
  * random interval sets, point sets, and bin widths (bins misaligned
  * with interval boundaries, zero-length and sub-bin intervals, points
  * on inclusive/exclusive edges).
  */
class RangeJoinProps extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  private val intervalsGen: Gen[List[(Long, Long, Long)]] =
    Gen.listOfN(8, for {
      s <- Gen.choose(0L, 200L)
      len <- Gen.choose(0L, 50L)
    } yield (s, s + len)).map(_.zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) })

  private val pointsGen: Gen[List[Long]] = Gen.listOfN(30, Gen.choose(0L, 260L))

  test("binned == nested loop over random intervals, points, bin widths") {
    val prop = Prop.forAll(intervalsGen, pointsGen, Gen.oneOf(7L, 10L, 33L)) {
      (ivs, pts, binW) =>
        val intervals = ivs.map { case (id, s, e) => (id, ts(s), ts(e)) }
          .toDF("iv_id", "s", "e")
        val points = pts.map(ts).toDF("ts")
        val got = RangeJoin.pointInIntervalCounts(points, intervals,
            "ts", "iv_id", "s", "e", binSeconds = binW)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val brute = intervals.as("i").join(points.as("p"),
            col("p.ts") >= col("i.s") && col("p.ts") < col("i.e"), "left_outer")
          .groupBy(col("i.iv_id")).agg(count(col("p.ts")).as("n"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        got == brute
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }
}

package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.TestSpark

/** Property check: AsOfJoin.asofLE against a brute-force in-memory
  * reference over random keyed time series.
  */
class AsOfJoinProps extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rowGen: Gen[(Int, Int, Int)] = // (key, time, payload)
    Gen.zip(Gen.choose(0, 4), Gen.choose(0, 50), Gen.choose(0, 1000))

  test("asofLE equals the brute-force latest-at-or-before reference") {
    val prop = Prop.forAll(Gen.listOfN(30, rowGen), Gen.listOfN(30, rowGen)) {
      (l: List[(Int, Int, Int)], r: List[(Int, Int, Int)]) =>
        // dedup right per (key, time): keep max payload (mirrors the
        // deterministic-match requirement of the operator)
        val rd = r.groupBy(t => (t._1, t._2)).map(_._2.maxBy(_._3)).toList
        val ld = l.distinct
        val got = AsOfJoin.asofLE(
            ld.toDF("k", "t", "lp"), rd.toDF("rk", "rt", "rp"),
            "k", "rk", "t", "rt", Seq("rp"))
          .collect()
          .map(row => (row.getInt(0), row.getInt(1), Option(row.get(3)).map(_.asInstanceOf[Int])))
          .sortBy(x => (x._1, x._2, x._3))
        val want = ld.map { case (k, t, _) =>
          val m = rd.filter(x => x._1 == k && x._2 <= t)
          (k, t, if (m.isEmpty) None else Some(m.maxBy(x => (x._2, x._3))._3))
        }.sortBy(x => (x._1, x._2, x._3))
        got.toList == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }
}

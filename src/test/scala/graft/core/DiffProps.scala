package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.TestSpark

/** Property-based checks of the diff algebra (SURVEY.md §5.2) over random
  * keyed tables.
  */
class DiffProps extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val key = Seq("id")
  private val cols = Seq("v")

  private val tableGen: Gen[Map[Int, String]] =
    Gen.mapOf(Gen.zip(Gen.choose(0, 30), Gen.alphaStr.map(_.take(4))))

  private def assertHolds(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), p)
    assert(res.passed, res.status.toString)
  }

  test("round trip: apply(diff(i, e), i) == e for random tables") {
    assertHolds(Prop.forAll(tableGen, tableGen) { (i: Map[Int, String], e: Map[Int, String]) =>
      val applied = Diff.diffApply(i.toSeq.toDF("id", "v"), e.toSeq.toDF("id", "v"), key, cols)
        .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
      applied == e
    })
  }

  test("kind counts partition the union of key spaces") {
    assertHolds(Prop.forAll(tableGen, tableGen) { (i: Map[Int, String], e: Map[Int, String]) =>
      val kinds = Diff.classify(i.toSeq.toDF("id", "v"), e.toSeq.toDF("id", "v"), key, cols)
        .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
      val expected = (i.keySet ++ e.keySet).map { k =>
        k -> ((i.get(k), e.get(k)) match {
          case (None, Some(_))              => "new"
          case (Some(_), None)              => "deleted"
          case (Some(a), Some(b)) if a == b => "unchanged"
          case _                            => "changed"
        })
      }.toMap
      kinds == expected
    })
  }
}

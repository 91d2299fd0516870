package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class FunnelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("events_funnel_n: stage timestamps are strictly ordered, stage counts nulls") {
    val rows = Catalog.queries("events_funnel_n")(spark, TestSpark.Sf).collect()
    assert(rows.nonEmpty, "fixture must produce signup-stage users")
    rows.foreach { r =>
      val ts = (1 to 4).map(i => Option(r.getAs[java.time.LocalDateTime](i)))
      assert(ts.head.nonEmpty, "stage 0 (signup) anchors every output row")
      // strict ordering along the chain wherever a stage was reached
      ts.sliding(2).foreach {
        case Seq(Some(a), Some(b)) => assert(a.isBefore(b),
          s"stage timestamps must strictly increase, got $a !< $b for user ${r.get(0)}")
        case _ => ()
      }
      // a stage can only be reached through its predecessor
      ts.sliding(2).foreach {
        case Seq(None, Some(_)) => fail(s"user ${r.get(0)} reached a stage without its predecessor")
        case _ => ()
      }
      assert(r.getInt(5) == ts.count(_.nonEmpty),
        s"stage must equal the number of reached stages for user ${r.get(0)}")
    }
  }

  test("events_funnel_n generalizes events_funnel: identical chain on the shared stages") {
    // the 4-stage fold anchored at signup must agree with the hardcoded
    // 3-stage funnel for users whose signup precedes their whole chain —
    // sanity that the fold's per-stage anchoring is the same construction
    val n4 = Catalog.queries("events_funnel_n")(spark, TestSpark.Sf).collect()
      .map(r => r.getLong(0) -> (Option(r.getAs[java.time.LocalDateTime](2)), Option(r.getAs[java.time.LocalDateTime](3)), Option(r.getAs[java.time.LocalDateTime](4))))
      .toMap
    val f3 = Catalog.queries("events_funnel")(spark, TestSpark.Sf).collect()
      .map(r => r.getLong(0) -> Option(r.getAs[java.time.LocalDateTime](1))).toMap
    // every 4-stage view timestamp is >= the unanchored 3-stage view min
    n4.foreach { case (u, (tv, _, _)) =>
      (tv, f3.get(u).flatten) match {
        case (Some(a), Some(b)) => assert(!a.isBefore(b),
          s"anchored view min cannot precede the unanchored one (user $u)")
        case _ => ()
      }
    }
  }
}

package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class TribeAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixture = {
    val tribe = Seq(10, 20, 30).toDF("t_id")
    val member = Seq((1, 10), (2, 10), (3, 10), (4, 20)).toDF("m_id", "m_tribe")
    val delta = Seq(1, 3).toDF("changed_id") // "player_new" analog
    (tribe, member, delta)
  }

  test("tribeActive: members, null-skipping active count, sqrt normalizer") {
    val (tribe, member, delta) = fixture
    val got = TribeAgg.tribeActive(tribe, member, delta, "t_id", "m_tribe", "m_id")
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(10) == ((3L, 2L, math.pow(3, 0.5))))
    assert(got(20) == ((1L, 0L, 1.0)))
    assert(!got.contains(30)) // inner join: tribes without members drop (post_update.py:33-35)
  }

  test("cold and warm stats shapes agree on sums (incl. 1:N facts)") {
    val (tribe, member, delta) = fixture
    // member 1 carries TWO fact rows: cold counts must not inflate
    val facts = Seq((1, 100.0), (1, 50.0), (2, 10.0), (3, 1.0), (4, 5.0)).toDF("p_id", "stat")
    val active = TribeAgg.tribeActive(tribe, member, delta, "t_id", "m_tribe", "m_id")
    val warm = TribeAgg.tribeStats(tribe, member, facts, delta,
      "t_id", "m_tribe", "m_id", "p_id", Seq("stat"), Some(active))
    val cold = TribeAgg.tribeStats(tribe, member, facts, delta,
      "t_id", "m_tribe", "m_id", "p_id", Seq("stat"), None)
    val w = warm.collect().map(r => r.getInt(0) -> r.getDouble(3)).toMap
    val c = cold.collect().map(r => r.getInt(0) -> r.getDouble(3)).toMap
    assert(w.keySet == c.keySet)
    w.keySet.foreach(k => assert(math.abs(w(k) - c(k)) < 1e-12))
    assert(math.abs(w(10) - 161.0 / math.pow(3, 0.5)) < 1e-12)
    // counts must come from the bridge, not the fanned-out join
    val cm = cold.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(cm(10) == 3L)
  }

  test("incrementalUpdate equals full recompute under change/move/add/delete") {
    import org.apache.spark.sql.functions._
    val tribe = Seq(10, 20, 30, 40).toDF("t_id")
    val oldMembers = Seq((1, 10), (2, 10), (3, 20), (4, 30), (5, 40)).toDF("m_id", "m_tribe")
    // this run: member 3 moves 20 -> 30, member 5 deleted, member 6 joins 10,
    // member 1 changed in place (the "active" delta)
    val newMembers = Seq((1, 10), (2, 10), (3, 30), (4, 30), (6, 10)).toDF("m_id", "m_tribe")
    val touched = Seq(1, 3, 5, 6).toDF("k") // changed + moved + deleted + new
    val delta = Seq(1, 3, 6).toDF("changed_id") // activeKeys ⊆ touched
    val facts = Seq((1, 7.0), (2, 3.0), (3, 5.0), (4, 11.0), (6, 2.0)).toDF("p_id", "stat")

    // previous run's committed aggregates (stale active counts on purpose)
    val oldActive = TribeAgg.tribeActive(tribe, oldMembers, Seq(2).toDF("c"),
      "t_id", "m_tribe", "m_id")
    val oldStats = TribeAgg.tribeStats(tribe, oldMembers,
      Seq((1, 1.0), (2, 3.0), (3, 4.0), (4, 11.0), (5, 9.0)).toDF("p_id", "stat"),
      Seq(2).toDF("c"), "t_id", "m_tribe", "m_id", "p_id", Seq("stat"), None)

    val affected = TribeAgg.affectedTribes(oldMembers, newMembers, touched, "m_tribe", "m_id")
    // tribes 10 (member 1 changed, 6 joined), 20 (3 left), 30 (3 arrived), 40 (5 left)
    assert(affected.collect().map(_.getInt(0)).toSet == Set(10, 20, 30, 40))

    val (incActive, incStats) = TribeAgg.incrementalUpdate(oldActive, oldStats,
      tribe, newMembers, facts, delta, affected,
      "t_id", "m_tribe", "m_id", "p_id", Seq("stat"))
    val fullActive = TribeAgg.tribeActive(tribe, newMembers, delta, "t_id", "m_tribe", "m_id")
    val fullStats = TribeAgg.tribeStats(tribe, newMembers, facts, delta,
      "t_id", "m_tribe", "m_id", "p_id", Seq("stat"), None)

    def mA(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(mA(incActive) == mA(fullActive))
    def mS(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2),
        BigDecimal(r.getDouble(3)).setScale(9, BigDecimal.RoundingMode.HALF_UP)))).toMap
    assert(mS(incStats) == mS(fullStats))
    // tribe 40 lost its only member: gone from both, like the full recompute
    assert(!mA(incActive).contains(40) && !mS(incStats).contains(40))
  }
}

package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class ChecksSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 10 rows with planted violations: one null name, two out-of-range
  // quantities, one bad flag, one duplicated key, two dangling refs
  private def fixture = Seq(
    (1L, 1, Option("a"), 10.0, "A"),
    (1L, 2, Option("b"), 20.0, "N"),
    (2L, 1, Option("c"), -5.0, "R"),     // below range
    (2L, 2, None, 30.0, "A"),            // null name
    (3L, 1, Option("e"), 999.0, "A"),    // above range
    (3L, 1, Option("f"), 40.0, "N"),     // duplicate (3,1) key
    (4L, 1, Option("g"), 50.0, "X"),     // bad flag
    (5L, 1, Option("h"), 1.0, "A"),      // dangling ref (5 not in parent)
    (6L, 1, Option("i"), 2.0, "R"),      // dangling ref
    (7L, 1, Option("j"), 3.0, "N")
  ).toDF("k", "ln", "name", "qty", "flag")

  private def parent = Seq(1L, 2L, 3L, 4L, 7L, 99L).toDF("pk")

  private def runAll(thresholdUnique: Double = 1.0) = Checks.run(fixture, Seq(
    Checks.NotNull("name"),
    Checks.Between("qty", 0.0, 100.0),
    Checks.InSet("flag", Seq("A", "N", "R")),
    Checks.Unique(Seq("k", "ln"), thresholdUnique),
    Checks.RefIn("k", parent, "pk")
  )).collect().map(r => r.getString(0) -> (r.getDouble(1), r.getInt(2))).toMap

  test("each constraint's metric counts exactly its planted violations") {
    val m = runAll()
    assert(m("not_null(name)") == ((0.9, 0)))
    assert(m("between(qty,0.0,100.0)") == ((0.8, 0)))     // -5 and 999
    assert(m("in_set(flag)") == ((0.9, 0)))               // X
    assert(m("unique(k,ln)")._1 == 0.9)                   // 9 distinct / 10
    assert(m("ref_in(k)") == ((0.8, 0)))                  // keys 5, 6 dangling
  }

  test("passed compares the rounded metric against each check's own threshold") {
    val m = runAll(thresholdUnique = 0.85)
    assert(m("unique(k,ln)") == ((0.9, 1)), "0.9 ≥ 0.85 must pass")
    // a fully-clean constraint passes at the default 1.0 threshold
    val clean = Checks.run(fixture, Seq(Checks.NotNull("k"))).head()
    assert((clean.getDouble(1), clean.getInt(2)) == ((1.0, 1)))
  }

  test("all row-local constraints fold into ONE aggregate over one scan") {
    val df = fixture
    val out = Checks.run(df, Seq(
      Checks.NotNull("name"),
      Checks.Between("qty", 0.0, 100.0),
      Checks.InSet("flag", Seq("A", "N", "R"))))
    // no join in the plan (no RefIn declared), exactly one aggregate
    // subtree feeding the explode — the scan count can't exceed one
    val plan = out.queryExecution.optimizedPlan.toString()
    assert(!plan.toLowerCase.contains("join"), s"row-local checks must not join:\n$plan")
    val scans = out.queryExecution.executedPlan.collectLeaves().size
    assert(scans == 1, s"expected a single input scan, got $scans")
  }

  test("RefIn joins the DISTINCT parent keys and preserves child cardinality") {
    // duplicate parent keys must not inflate the child row count (a
    // non-distinct ref side would double-count matched children)
    val dupParent = parent.union(parent)
    val m = Checks.run(fixture, Seq(
      Checks.RefIn("k", dupParent, "pk"),
      Checks.NotNull("k")
    )).collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("ref_in(k)") == 0.8)
    assert(m("not_null(k)") == 1.0, "child cardinality changed by the ref join")
  }

  test("constraint states merge by exact SUM: merged metrics equal the from-scratch pass") {
    val checks = Seq(
      Checks.NotNull("name"),
      Checks.Between("qty", 0.0, 100.0),
      Checks.InSet("flag", Seq("A", "N", "R")),
      Checks.RefIn("k", parent, "pk"))
    val a = fixture.filter(col("k") <= 3)
    val b = fixture.filter(col("k") > 3)
    val merged = Checks.metricsFromState(
      Checks.mergeStates(Checks.state(a, checks), Checks.state(b, checks)), checks)
      .collect().map(_.toSeq).toSeq
    val full = Checks.run(fixture, checks).collect().map(_.toSeq).toSeq
    assert(merged == full, "committed ∪ delta state must reproduce the full pass exactly")
    // three-way split too (associativity over real batches)
    val c3 = Seq(fixture.filter(col("k") <= 2), fixture.filter(col("k") === 3 || col("k") === 4),
      fixture.filter(col("k") > 4)).map(Checks.state(_, checks))
    val merged3 = Checks.metricsFromState(c3.reduce(Checks.mergeStates), checks)
      .collect().map(_.toSeq).toSeq
    assert(merged3 == full)
  }

  test("state rejects the non-additive Unique constraint") {
    val e = intercept[IllegalArgumentException] {
      Checks.state(fixture, Seq(Checks.Unique(Seq("k", "ln"))))
    }
    assert(e.getMessage.contains("not additive"))
  }

  test("the declared profile_constraints suite on the real tables: five green, uniqueness red") {
    val l = spark.read.parquet(s"${TestSpark.Sf}/lineitem.parquet")
    val o = spark.read.parquet(s"${TestSpark.Sf}/orders.parquet")
    val rows = Checks.run(l, Seq(
      Checks.NotNull("l_returnflag"),
      Checks.Between("l_quantity", 1.0, 50.0),
      Checks.Between("l_discount", 0.0, 0.1),
      Checks.InSet("l_returnflag", Seq("A", "N", "R")),
      Checks.Unique(Seq("l_orderkey", "l_linenumber")),
      Checks.RefIn("l_orderkey", o, "o_orderkey"))).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getInt(2))).toMap
    assert(rows.size == 6)
    // the CDC fixture generator reuses (l_orderkey, l_linenumber) across
    // versions BY DESIGN, so the uniqueness constraint is the suite's
    // deterministic red row — the failure-reporting path, exercised on
    // real data (metric ≈ 0.76 at every SF)
    val (uMetric, uPassed) = rows("unique(l_orderkey,l_linenumber)")
    assert(uPassed == 0 && uMetric > 0.7 && uMetric < 0.8, s"unique: $uMetric")
    (rows - "unique(l_orderkey,l_linenumber)").foreach { case (chk, (metric, passed)) =>
      assert(passed == 1, s"constraint $chk failed on clean data: metric=$metric")
    }
  }
}

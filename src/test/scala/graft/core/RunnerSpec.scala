package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.queries.Fixture

/** End-to-end lifecycle: cold parallel extract of three tables, warm
  * incremental second run, post-update aggregates — the reference's whole
  * `run()` (start.py:44-60) in one flow.
  */
class RunnerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("cold run, warm delta run, and post-update aggregates") {
    val base = java.nio.file.Files.createTempDirectory("graft_run").toString
    val d = TestSpark.Sf

    def sources(liQuantityBump: Boolean) = Seq(
      Runner.Source("lineitem",
        () => {
          val e = Fixture.external(spark, d)
          if (liQuantityBump) e.withColumn("l_quantity", col("l_quantity") + 1) else e
        },
        Fixture.Key, Fixture.DataCols),
      Runner.Source("orders", () => Tables.load(spark, d, "orders"),
        Seq("o_orderkey"), Seq("o_custkey", "o_orderstatus", "o_totalprice")),
      Runner.Source("customer", () => Tables.load(spark, d, "customer"),
        Seq("c_custkey"), Seq("c_name", "c_nationkey", "c_acctbal")))

    // run 1: cold — everything lands as v1
    val v1 = Runner.extractAll(spark, sources(liQuantityBump = false), base)
    assert(v1 == Map("lineitem" -> 1L, "orders" -> 1L, "customer" -> 1L))
    val liSnap = Pipeline.readLatest(spark, base + "/lineitem", "snapshot")
    assert(liSnap.count() == Fixture.external(spark, d).count())

    // run 2: warm — lineitem rows all changed, other tables unchanged
    val v2 = Runner.extractAll(spark, sources(liQuantityBump = true), base)
    assert(v2 == Map("lineitem" -> 2L, "orders" -> 2L, "customer" -> 2L))
    val clog = Pipeline.readChangelog(spark, base + "/lineitem").filter("v = 2")
    assert(clog.count() == liSnap.count()) // every row's old version captured
    assert(Pipeline.readChangelog(spark, base + "/orders").filter("v = 2").count() == 0)

    // post-update: per-nation aggregates over the committed customer snapshot
    val delta = Tables.load(spark, d, "orders")
      .filter(col("o_orderkey") % 10 === 0).select("o_custkey").distinct()
    Runner.postUpdate(spark, base,
      Tables.load(spark, d, "nation"),
      Pipeline.readLatest(spark, base + "/customer", "snapshot"),
      Pipeline.readLatest(spark, base + "/orders", "snapshot"),
      delta, "n_nationkey", "c_nationkey", "c_custkey", "o_custkey",
      Seq("o_totalprice"))
    val stats = spark.read.parquet(base + "/tribe_stats")
    assert(stats.count() == 25)
    assert(stats.columns.toSet == Set("n_nationkey", "members", "active", "o_totalprice"))
  }

  test("default commit layout is z-ordered on the key: post-commit keyed scans prune files") {
    val base = java.nio.file.Files.createTempDirectory("graft_zcommit").toString
    val d = TestSpark.Sf
    Runner.extractAll(spark, Seq(Runner.Source("lineitem",
      () => Fixture.external(spark, d), Fixture.Key, Fixture.DataCols)), base)
    val snap = Pipeline.readLatest(spark, base + "/lineitem", "snapshot")
    assert(snap.count() == Fixture.external(spark, d).count())
    val total = snap.select(input_file_name()).distinct().count()
    assert(total >= 2, s"need multiple committed files to prove pruning ($total)")
    // a narrow range on the LEADING key column must touch few files —
    // the z curve keeps min/max stats tight on every key column
    val cut = snap.agg(expr("percentile(l_orderkey, 0.05)")).head().getDouble(0).toLong
    val touched = snap.filter(col("l_orderkey") <= cut)
      .select(input_file_name()).distinct().count()
    assert(touched < total,
      s"keyed scan did not prune the committed snapshot's files ($touched/$total)")
    // and the predicate itself reaches the parquet scan (row-group skip)
    val plan = snap.filter(col("l_orderkey") <= cut)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") && plan.contains("LessThanOrEqual(l_orderkey"),
      s"key predicate must be pushed to the committed-snapshot scan:\n${plan.take(1200)}")
  }

  test("name normalization inside extract: committed, and never churns the diff") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_norm").toString
    def src(aliceElo: Int) = Seq(Runner.Source("player",
      () => Seq((1L, "alice", aliceElo), (2L, "bob#1234", 20), (3L, "carol", 30))
        .toDF("pid", "name", "elo"),
      key = Seq("pid"), dataCols = Seq("name", "elo"),
      // reference normalizes post-download INSIDE extract
      // (download.py:546-555), not as a separate query
      deriveFetched = Scores.normalizeNames(Seq("name"))))

    Runner.extractAll(spark, src(10), base)
    val cold = Pipeline.readLatest(spark, base + "/player", "snapshot")
      .select("name").as[String].collect().sorted
    assert(cold.toSeq == Seq("alice#0000", "bob#1234", "carol#0000"))

    // identical second run: the diff runs against the signature STATE
    // (raw source sigs), so the normalized snapshot names must NOT
    // re-classify anything changed — zero changelog rows at v=2
    Runner.extractAll(spark, src(10), base)
    assert(Pipeline.readChangelog(spark, base + "/player").filter("v = 2").count() == 0)

    // real change: alice's elo moves; the re-fetched row re-normalizes
    Runner.extractAll(spark, src(99), base)
    val warm = Pipeline.readLatest(spark, base + "/player", "snapshot")
    assert(Pipeline.readChangelog(spark, base + "/player").filter("v = 3").count() == 1)
    assert(warm.filter(col("name") === "alice#0000").select("elo").as[Int].head() == 99)
    assert(warm.count() == 3)
  }

  test("postUpdateIncremental: equals full rebuild, carries over untouched tribes") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_inc_pu").toString
    val tribe = Seq(10, 20, 30).toDF("t_id")
    val oldM = Seq((1, 10), (2, 20), (3, 30)).toDF("m_id", "m_tribe")
    val facts0 = Seq((1, 5.0), (2, 7.0), (3, 9.0)).toDF("p_id", "stat")
    // cold: no previous aggregates -> full rebuild fallback
    Runner.postUpdateIncremental(spark, base, tribe, oldM, oldM, facts0,
      Seq(1).toDF("k"), Seq(1).toDF("k"),
      "t_id", "m_tribe", "m_id", "p_id", Seq("stat"))
    assert(spark.read.parquet(base + "/tribe_stats").count() == 3)

    // warm: member 1 changed (tribe 10 affected); tribes 20/30 untouched
    val facts1 = Seq((1, 6.0), (2, 7.0), (3, 9.0)).toDF("p_id", "stat")
    Runner.postUpdateIncremental(spark, base, tribe, oldM, oldM, facts1,
      Seq(1).toDF("k"), Seq(1).toDF("k"),
      "t_id", "m_tribe", "m_id", "p_id", Seq("stat"))
    val inc = spark.read.parquet(base + "/tribe_stats")
      .collect().map(r => r.getInt(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
    val full = TribeAgg.tribeStats(tribe, oldM, facts1, Seq(1).toDF("k"),
      "t_id", "m_tribe", "m_id", "p_id", Seq("stat"), None)
      .collect().map(r => r.getInt(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(inc == full)
    assert(inc(10)._2 == 6.0 && inc(10)._1 == 1L) // recomputed, active
    assert(inc(20) == ((0L, 7.0)))                // carried over, active reset
  }

  test("postUpdateIncremental: interrupted swap marker forces a full rebuild") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_inc_marker").toString
    val tribe = Seq(10, 20).toDF("t_id")
    val m = Seq((1, 10), (2, 20)).toDF("m_id", "m_tribe")
    val facts = Seq((1, 5.0), (2, 7.0)).toDF("p_id", "stat")
    Runner.postUpdateIncremental(spark, base, tribe, m, m, facts,
      Seq(1).toDF("k"), Seq(1).toDF("k"), "t_id", "m_tribe", "m_id", "p_id", Seq("stat"))
    // simulate a crash between the two directory swaps
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(base + "/_agg_swap_incomplete"), "swap")
    val facts2 = Seq((1, 6.0), (2, 8.0)).toDF("p_id", "stat")
    Runner.postUpdateIncremental(spark, base, tribe, m, m, facts2,
      Seq(1).toDF("k"), Seq(1).toDF("k"), "t_id", "m_tribe", "m_id", "p_id", Seq("stat"))
    // full rebuild ran: BOTH tribes reflect facts2, marker cleared
    val stats = spark.read.parquet(base + "/tribe_stats")
      .collect().map(r => r.getInt(0) -> r.getDouble(3)).toMap
    assert(stats == Map(10 -> 6.0, 20 -> 8.0))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(base + "/_agg_swap_incomplete")))
  }

  test("postUpdateIncremental: in-place change with no membership move still counts active") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_inc_active").toString
    val tribe = Seq(10, 20).toDF("t_id")
    val m = Seq((1, 10), (2, 20)).toDF("m_id", "m_tribe")
    val facts = Seq((1, 5.0), (2, 7.0)).toDF("p_id", "stat")
    Runner.postUpdateIncremental(spark, base, tribe, m, m, facts,
      Seq(1).toDF("k"), Seq(1).toDF("k"), "t_id", "m_tribe", "m_id", "p_id", Seq("stat"))
    // member 2 changed IN PLACE: activeKeys has it, touchedKeys (membership
    // delta) is EMPTY — tribe 20 must still be recomputed as active
    Runner.postUpdateIncremental(spark, base, tribe, m, m, facts,
      Seq(2).toDF("k"), Seq.empty[Int].toDF("k"),
      "t_id", "m_tribe", "m_id", "p_id", Seq("stat"))
    val active = spark.read.parquet(base + "/tribe_active")
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(active == Map(10 -> 0L, 20 -> 1L))
  }
}

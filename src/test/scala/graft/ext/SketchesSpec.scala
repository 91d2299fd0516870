package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class SketchesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val G = Seq("g")

  test("estimate within HLL error bound of exact, on the real lineitem table") {
    val l = spark.read.parquet(s"${TestSpark.Sf}/lineitem.parquet")
    val approx = Sketches.estimates(
        Sketches.distinctSketch(l, Seq("l_returnflag"), "l_orderkey"), Seq("l_returnflag"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = l.groupBy("l_returnflag").agg(countDistinct("l_orderkey"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, ex) =>
      val err = math.abs(approx(k).toDouble / ex - 1.0)
      assert(err < 0.05, s"group $k: approx=${approx(k)} exact=$ex err=$err")
    }
  }

  test("mergeability: delta-merged estimate tracks exact; union algebra is commutative and idempotent") {
    val rows = (1 to 5000).map(i => (s"g${i % 7}", (i * 31L) % 1200L))
    val df = rows.toDF("g", "v")
    val corpus = df.filter(col("v") % 10 =!= 0)
    val delta = df.filter(col("v") % 10 === 0)
    val sa = Sketches.distinctSketch(corpus, G, "v")
    val sb = Sketches.distinctSketch(delta, G, "v")
    def est(t: org.apache.spark.sql.DataFrame) = Sketches.estimates(t, G)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val merged = est(Sketches.mergeSketchTables(sa, sb, G))
    // merged estimate within the lgK=12 error bound of the EXACT count —
    // maintaining by delta-union does not degrade accuracy
    val exact = df.groupBy("g").agg(countDistinct("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, ex) =>
      val err = math.abs(merged(k).toDouble / ex - 1.0)
      assert(err < 0.05, s"group $k: merged=${merged(k)} exact=$ex err=$err")
    }
    // union algebra (exact equalities — both sides take the same
    // estimator path): commutative, and re-merging an already-absorbed
    // delta changes nothing (max-register semantics), so replayed
    // maintenance batches are harmless
    assert(est(Sketches.mergeSketchTables(sb, sa, G)) == merged)
    assert(est(Sketches.mergeSketchTables(Sketches.mergeSketchTables(sa, sb, G), sb, G))
      == merged)
  }

  test("merge passes through one-sided groups (new in delta, untouched in corpus)") {
    val a = Seq(("only_a", 1L), ("both", 2L)).toDF("g", "v")
    val b = Seq(("only_b", 9L), ("both", 3L)).toDF("g", "v")
    val merged = Sketches.estimates(
        Sketches.mergeSketchTables(
          Sketches.distinctSketch(a, G, "v"),
          Sketches.distinctSketch(b, G, "v"), G), G)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged == Map("only_a" -> 1L, "only_b" -> 1L, "both" -> 2L))
  }

  test("persisted sketch table round-trips through parquet and keeps merging exactly") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sketch").toString
    val df = (1 to 3000).map(i => (s"g${i % 5}", i.toLong % 700)).toDF("g", "v")
    val corpus = df.filter(col("v") % 7 =!= 0)
    val delta = df.filter(col("v") % 7 === 0)
    Sketches.distinctSketch(corpus, G, "v").write.parquet(s"$tmp/sketches")
    val committed = spark.read.parquet(s"$tmp/sketches")
    val mergedT = Sketches.mergeSketchTables(
      committed, Sketches.distinctSketch(delta, G, "v"), G)
    def est(t: org.apache.spark.sql.DataFrame) = Sketches.estimates(t, G)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val merged = est(mergedT)
    val exact = df.groupBy("g").agg(countDistinct("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, ex) =>
      assert(math.abs(merged(k).toDouble / ex - 1.0) < 0.05,
        s"group $k: merged=${merged(k)} exact=$ex")
    }
    assert(est(mergedT) == merged) // deterministic across evaluations
  }

  // ---- md5-HLL (the oracle twin: Sketches.md5Hll*)

  test("md5-HLL: rho chain matches a bit-arithmetic reference over the md5 hash") {
    // the production chain derives (bucket, rho) from hex-string
    // arithmetic so the DuckDB oracle can replay it; this reference
    // derives them from the raw digest bits — the two must agree for
    // every value, or the generated 48-branch compare chain is off by
    // one somewhere
    def ref(v: Long): (Long, Int) = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(v.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val bucket = java.lang.Long.parseLong(hex.substring(0, 3), 16)
      val rest = java.lang.Long.parseLong(hex.substring(3, 15), 16)
      val rho = if (rest == 0L) 49
                else java.lang.Long.numberOfLeadingZeros(rest) - 16 + 1
      (bucket, rho)
    }
    val vals = (1L to 4000L) ++ Seq(0L, 999999937L)
    val got = Sketches.md5HllRegisters(
        vals.map(v => ("g", v)).toDF("g", "v"), G, "v")
      .collect().map(r => (r.getLong(1), r.getInt(2)))
      .toSet
    val want = vals.map(ref).groupBy(_._1)
      .map { case (b, rs) => (b, rs.map(_._2).max) }.toSet
    assert(got == want)
  }

  test("md5-HLL: estimate in bound vs exact; merge-then-estimate EXACTLY equals full (not just in bound)") {
    val df = (1 to 60000).map(i => ("g" + (i % 3), (i * 17L) % 20011L)).toDF("g", "v")
    def est(regs: org.apache.spark.sql.DataFrame, out: String) =
      Sketches.md5HllEstimate(regs, G, out)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val full = est(Sketches.md5HllRegisters(df, G, "v"), "e")
    val merged = est(Sketches.md5HllMerge(
      Sketches.md5HllRegisters(df.filter(col("v") % 10 =!= 0), G, "v"),
      Sketches.md5HllRegisters(df.filter(col("v") % 10 === 0), G, "v"), G), "e")
    assert(full == merged, "max-register merge must reproduce the full sketch bit-for-bit")
    val exact = df.groupBy("g").agg(countDistinct("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, ex) =>
      val err = math.abs(full(k) / ex - 1.0)
      assert(err < 0.05, s"group $k: approx=${full(k)} exact=$ex err=$err")
    }
  }

  test("md5-HLL: small-range linear counting engages and stays in bound for tiny groups") {
    // 40 distinct values in one group: raw HLL at m=4096 would
    // overestimate badly; the V>0 branch must take over
    val df = (1 to 40).map(i => ("t", i * 1009L)).toDF("g", "v")
    val e = Sketches.md5HllEstimate(Sketches.md5HllRegisters(df, G, "v"), G, "e")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(e("t") - 40.0) < 4.0, s"linear-counting estimate off: ${e("t")}")
  }

  // ---- log-histogram quantile sketch (the oracle twin: Sketches.logHist*)

  test("log-histogram: mid-bucket representative is within the 1/32 relative bound of every value") {
    // push a wide sweep of magnitudes through bucket → quantile-of-one
    // (the p50 of a single-row group IS that row's representative):
    // the round trip must stay within width/2 / lo = 1/32 relative
    val vals = (Seq(0.01, 0.05, 0.31, 0.32, 5.00, 123.45, 999.99) ++
      (1 to 60).map(i => math.pow(1.31, i))).map(v => math.rint(v * 100) / 100.0)
    val df = vals.zipWithIndex.map { case (v, i) => (s"g$i", v) }.toDF("g", "v")
    val got = Sketches.logHistQuantiles(
        Sketches.logHistogram(df, G, "v"), G, Seq(0.5), "t")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    vals.zipWithIndex.foreach { case (v, i) =>
      val r = got(s"g$i")
      if (v * 100 < 32) assert(r == v, s"direct bucket must be exact: $v -> $r")
      else assert(math.abs(r / v - 1.0) <= 1.0 / 32 + 1e-9, s"$v -> $r off by ${r / v - 1.0}")
    }
  }

  test("log-histogram: quantiles in relative bound vs exact; count-sum merge EXACTLY equals full") {
    val l = spark.read.parquet(s"${TestSpark.Sf}/lineitem.parquet")
    val g = Seq("l_returnflag")
    def est(q: org.apache.spark.sql.DataFrame) = q.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val full = est(Sketches.logHistQuantiles(
      Sketches.logHistogram(l, g, "l_extendedprice"), g, Seq(0.5, 0.9, 0.99), "f"))
    val merged = est(Sketches.logHistQuantiles(
      Sketches.logHistMerge(
        Sketches.logHistogram(l.filter(col("l_orderkey") % 10 =!= 0), g, "l_extendedprice"),
        Sketches.logHistogram(l.filter(col("l_orderkey") % 10 === 0), g, "l_extendedprice"),
        g), g, Seq(0.5, 0.9, 0.99), "f"))
    assert(full == merged, "count-sum merge must reproduce the full histogram bit-for-bit")
    val exact = l.groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.5)"), expr("percentile(l_extendedprice, 0.9)"),
        expr("percentile(l_extendedprice, 0.99)"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    exact.foreach { case (k, (e50, e90, e99)) =>
      val (_, p50, p90, p99) = full(k)
      Seq((p50, e50), (p90, e90), (p99, e99)).foreach { case (got, want) =>
        assert(math.abs(got / want - 1.0) < 0.04,
          s"group $k: sketch $got vs exact $want (rel ${got / want - 1.0})")
      }
    }
  }

  test("log-histogram table round-trips through parquet and keeps merging exactly") {
    // the maintenance contract at scale: the committed sketch is a
    // parquet table of (group, bucket, cnt); a delta folds in by count
    // sum and the result must equal the from-scratch sketch exactly —
    // including after the disk round trip
    val tmp = java.nio.file.Files.createTempDirectory("graft_loghist").toString
    val df = (1 to 4000).map(i => ("g" + (i % 4), ((i * 37) % 90000) / 100.0 + 0.37))
      .toDF("g", "v")
    val corpus = df.filter(round(col("v") * 100) % 7 =!= 0)
    val delta = df.filter(round(col("v") * 100) % 7 === 0)
    Sketches.logHistogram(corpus, G, "v").write.parquet(s"$tmp/hist")
    val committed = spark.read.parquet(s"$tmp/hist")
    def q(h: org.apache.spark.sql.DataFrame) =
      Sketches.logHistQuantiles(h, G, Seq(0.5, 0.9), "t")
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val merged = q(Sketches.logHistMerge(
      committed, Sketches.logHistogram(delta, G, "v"), G))
    assert(merged == q(Sketches.logHistogram(df, G, "v")),
      "delta-merged persisted histogram must equal the from-scratch sketch exactly")
  }

  // ---- KLL quantile sketches

  /** True rank of `q` within the sorted values of a group — the metric
    * KLL's guarantee is stated in (|rank(est) − p| ≤ ε, ε ≈ 1.65% at
    * k=200; we allow 3% for the small-n edge).
    */
  private def rankOf(sorted: Array[Double], q: Double): Double =
    sorted.count(_ <= q).toDouble / sorted.length

  test("KLL quantiles land within rank-error bound of exact, on the real lineitem table") {
    val l = spark.read.parquet(s"${TestSpark.Sf}/lineitem.parquet")
    val probs = Seq(0.1, 0.5, 0.9, 0.99)
    val got = Sketches.quantileEstimates(
        Sketches.quantileSketch(l, Seq("l_returnflag"), "l_extendedprice"),
        Seq("l_returnflag"), probs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getSeq[Double](2))).toSeq
    val byGroup = l.select(col("l_returnflag"), col("l_extendedprice").cast("double"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted }
    assert(got.map(_._1).toSet == byGroup.keySet)
    got.foreach { case (g, n, qs) =>
      assert(n == byGroup(g).length, s"group $g: sketch n=$n != ${byGroup(g).length}")
      probs.zip(qs).foreach { case (p, q) =>
        val r = rankOf(byGroup(g), q)
        assert(math.abs(r - p) < 0.03, s"group $g p=$p: est=$q true rank=$r")
      }
    }
  }

  test("KLL delta merge: n stays exact, quantiles stay in bound, one-sided groups pass through") {
    val rows = (1 to 8000).map(i => (s"g${i % 3}", ((i * 1103515245L + 12345) % 100000).toDouble))
    val df = rows.toDF("g", "v")
    val corpus = df.filter(col("v") % 10 =!= 0)
    val delta = df.filter(col("v") % 10 === 0)
    val merged = Sketches.mergeQuantileTables(
      Sketches.quantileSketch(corpus, G, "v"),
      Sketches.quantileSketch(delta, G, "v"), G)
    val est = Sketches.quantileEstimates(merged, G, Seq(0.5, 0.9))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getSeq[Double](2))).toSeq
    val byGroup = rows.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted.toArray }
    est.foreach { case (g, n, qs) =>
      assert(n == byGroup(g).length, s"group $g: merged n=$n (exactness is KLL's invariant)")
      Seq(0.5, 0.9).zip(qs).foreach { case (p, q) =>
        val r = rankOf(byGroup(g), q)
        assert(math.abs(r - p) < 0.03, s"group $g p=$p: est=$q true rank=$r")
      }
    }
    // one-sided pass-through, same contract as the HLL merge
    val a = Seq(("only_a", 1.0), ("both", 2.0)).toDF("g", "v")
    val b = Seq(("only_b", 9.0), ("both", 3.0)).toDF("g", "v")
    val oneSided = Sketches.quantileEstimates(
        Sketches.mergeQuantileTables(
          Sketches.quantileSketch(a, G, "v"),
          Sketches.quantileSketch(b, G, "v"), G), G, Seq(1.0))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getSeq[Double](2).head)).toSet
    assert(oneSided == Set(("only_a", 1L, 1.0), ("only_b", 1L, 9.0), ("both", 2L, 3.0)))
  }

  test("KLL sketch table round-trips through parquet and re-aggregates with kll_merge_agg") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_kll").toString
    val df = (1 to 6000).map(i => (s"g${i % 4}", s"b${i % 2}", (i % 977).toDouble))
      .toDF("g", "sub", "v")
    // per-(g, sub) sketches committed to parquet...
    Sketches.quantileSketch(df, Seq("g", "sub"), "v").write.parquet(s"$tmp/kll")
    val committed = spark.read.parquet(s"$tmp/kll")
    // ...then ROLLED UP to per-g by merging serialized sketches — the
    // re-group path a sketch table exists to serve (no corpus re-read)
    val rolled = committed.groupBy("g")
      .agg(graft.functions.sketch.kll_merge_agg(col("sketch")).as("sketch"))
    val est = Sketches.quantileEstimates(rolled, G, Seq(0.5))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getSeq[Double](2).head)).toSeq
    val byGroup = df.select(col("g"), col("v")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted.toArray }
    est.foreach { case (g, n, q) =>
      assert(n == byGroup(g).length)
      val r = rankOf(byGroup(g), q)
      assert(math.abs(r - 0.5) < 0.03, s"group $g: p50=$q true rank=$r")
    }
  }

  // ---- count-min sketch (the frequency sibling) ----

  test("CMS estimates are one-sided and inside the εN error bound on the real lineitem table") {
    val l = spark.read.parquet(s"${TestSpark.Sf}/lineitem.parquet")
    val n = l.count()
    val exact = l.groupBy("l_suppkey").agg(count(lit(1)).as("exact_n"))
    val cms = Sketches.cmsTable(l, "l_suppkey")
    // cell geometry: every cell id in [0, w), every row id in [0, d)
    val cells = cms.collect()
    assert(cells.forall { r =>
      r.getInt(0) >= 0 && r.getInt(0) < Sketches.CmsDepth &&
        r.getLong(1) >= 0L && r.getLong(1) < Sketches.CmsWidth
    })
    val est = Sketches.cmsEstimate(cms, exact, "l_suppkey", "est")
      .join(exact, "l_suppkey").collect()
      .map(r => (r.getLong(r.fieldIndex("est")), r.getLong(r.fieldIndex("exact_n"))))
    // one-sided: the key's own occurrences are in all d of its cells
    est.foreach { case (e, ex) => assert(e >= ex, s"undercount: $e < $ex") }
    // CM bound: P[overshoot > (e/w)·N] ≤ e^-d per key; allow 3× headroom
    // (deterministic on the fixed fixture — this pins the geometry works)
    val bound = 3.0 * math.E / Sketches.CmsWidth * n
    est.foreach { case (e, ex) =>
      assert(e - ex <= bound, s"overshoot ${e - ex} > bound $bound (n=$n)")
    }
  }

  test("CMS merge is the exact per-cell sum: merged table ≡ from-scratch table, estimates equal") {
    val df = (1 to 9000).map(i => ((i * 37L) % 613L, i.toLong)).toDF("k", "seq")
    val a = df.filter(col("seq") % 10 =!= 0)
    val b = df.filter(col("seq") % 10 === 0)
    val full = Sketches.cmsTable(df, "k")
    val merged = Sketches.cmsMerge(Sketches.cmsTable(a, "k"), Sketches.cmsTable(b, "k"))
    def cellsOf(t: org.apache.spark.sql.DataFrame) =
      t.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(cellsOf(merged) == cellsOf(full),
      "additive counters: committed ∪ delta must equal from-scratch bit-for-bit")
    // merge is commutative but NOT idempotent (counts add — unlike the
    // HLL max-merge): replaying an absorbed delta double-counts it, so
    // CDC replay safety must come from versioning, never from re-merge.
    assert(cellsOf(Sketches.cmsMerge(Sketches.cmsTable(b, "k"), Sketches.cmsTable(a, "k")))
      == cellsOf(full))
    val remerged = cellsOf(Sketches.cmsMerge(merged, Sketches.cmsTable(b, "k")))
    assert(remerged != cellsOf(full), "re-merging an absorbed delta must overcount")
  }

  test("CMS state is constant-size: d·w cells bound the table at any key cardinality") {
    val wide = (1 to 20000).map(i => (i.toLong * 1000003L % 999999937L, i)).toDF("k", "i")
    val cms = Sketches.cmsTable(wide, "k")
    assert(cms.count() <= Sketches.CmsDepth.toLong * Sketches.CmsWidth)
    // absent key: estimate is pure collision mass — small, never negative
    val absent = Seq(-1L).toDF("k")
    val e = Sketches.cmsEstimate(cms, absent, "k", "est").head().getLong(1)
    assert(e >= 0L)
  }
}

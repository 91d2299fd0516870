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
}

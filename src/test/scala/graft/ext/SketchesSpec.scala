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
}

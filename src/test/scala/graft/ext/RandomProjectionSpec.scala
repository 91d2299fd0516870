package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class RandomProjectionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def refProject(vec: Seq[Float], sg: Array[Array[Long]]): Seq[Long] =
    sg.toSeq.map(row => vec.zip(row).map { case (v, s) =>
      s * math.floor(v.toDouble * 1000000.0).toLong }.sum)

  test("projection equals the driver-side integer reference on real embeddings") {
    val embs = spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet")
    val sg = RandomProjection.signs(16, 64)
    val expect = embs.select("vec_id", "embedding").collect().flatMap { r =>
      val id = r.getLong(0)
      refProject(r.getSeq[Float](1), sg).zipWithIndex.map { case (p, j) => (id, j.toLong, p) }
    }.sortBy(t => (t._1, t._2)).toSeq
    val got = RandomProjection.project(embs, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect)
  }

  test("the sign matrix is balanced-ish and deterministic") {
    val sg = RandomProjection.signs(16, 64)
    assert(sg.flatten.forall(s => s == 1L || s == -1L))
    val pos = sg.flatten.count(_ == 1L)
    // md5 nibbles are uniform; 1024 draws stay within 5 sigma of half
    assert(math.abs(pos - 512) < 80, s"sign matrix badly unbalanced: $pos of 1024 positive")
    assert(RandomProjection.signs(16, 64).map(_.toSeq).toSeq == sg.map(_.toSeq).toSeq)
  }

  test("identical vectors project identically; JL preserves cosine structure") {
    val d = 64
    def unit(seed: Int): Seq[Float] = {
      val rnd = new scala.util.Random(seed)
      val v = Seq.fill(d)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    val base = unit(1)
    val near = base.zipWithIndex.map { case (v, i) => if (i == 0) v + 0.01f else v }
    val rows = Seq((1L, base), (2L, base), (3L, near), (4L, unit(2)), (5L, unit(3)))
    val out = RandomProjection.project(rows.toDF("vec_id", "embedding"), "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3.toDouble).toSeq).toMap
    assert(out(1L) == out(2L), "identical vectors must project identically")
    def cos(a: Seq[Double], b: Seq[Double]) = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    // near-duplicates stay near under the projection...
    assert(cos(out(1L), out(3L)) > 0.9, s"near-dup cosine ${cos(out(1L), out(3L))}")
    // ...and independent unit vectors stay scattered (JL at k=16 is
    // coarse — the bound is loose by design)
    assert(math.abs(cos(out(4L), out(5L))) < 0.75)
    assert(math.abs(cos(out(1L), out(4L))) < 0.75)
  }

  test("a dimension mismatch fails LOUDLY, never a silent NULL projection") {
    // zip_with null-pads the shorter side, so without the guard a 3-dim
    // vector against inDim=64 signs would yield NULL proj rows while the
    // DuckDB oracle computed partial sums (ADVICE r11)
    import spark.implicits._
    val bad = Seq((1L, Array(1.0f, 2.0f, 3.0f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      RandomProjection.project(bad, "vec_id", "embedding").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("expected 64-dim vector, got 3")),
      s"want the loud dimension error, got: ${msgs(e).mkString(" | ")}")
  }

  test("the plan is map-side: no joins, no aggregate exchange") {
    val embs = spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet")
    val plan = RandomProjection.project(embs, "vec_id", "embedding")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "sign matrix must be plan literals, not a join")
    assert(!plan.contains("HashAggregate"), "projection must fold per row, not aggregate")
  }
}

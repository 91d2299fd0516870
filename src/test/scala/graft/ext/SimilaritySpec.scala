package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("cosine: identical=1, orthogonal=0, opposite=-1") {
    val df = Seq(
      (Array(1f, 0f), Array(1f, 0f)),
      (Array(1f, 0f), Array(0f, 1f)),
      (Array(1f, 0f), Array(-1f, 0f))
    ).toDF("a", "b")
    val got = df.select(Similarity.cosine(col("a"), col("b"))).collect().map(_.getDouble(0))
    assert(math.abs(got(0) - 1.0) < 1e-12)
    assert(math.abs(got(1)) < 1e-12)
    assert(math.abs(got(2) + 1.0) < 1e-12)
  }

  test("bruteTopK: k rows per query, self excluded, descending") {
    val e = graft.core.Tables.load(spark, TestSpark.Sf, "embeddings")
    val got = Similarity.bruteTopK(e, e.filter(col("vec_id") < 3), "vec_id", "embedding", 4)
    val rows = got.collect()
    assert(rows.length == 12)
    assert(!rows.exists(r => r.getLong(0) == r.getLong(1)))
    rows.groupBy(_.getLong(0)).values.foreach { g =>
      val byRank = g.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("int8 quantized cosine stays close to float cosine") {
    import graft.functions.vectors
    val e = graft.core.Tables.load(spark, TestSpark.Sf, "embeddings").limit(50)
    val a = e.select(col("vec_id").as("ia"), col("embedding").as("va"))
    val b = e.select(col("vec_id").as("ib"), col("embedding").as("vb"))
    val errs = a.join(b, col("ib") === col("ia") + 1)
      .select(abs(vectors.int8_cosine(vectors.quantize_int8(col("va")),
          vectors.quantize_int8(col("vb"))) -
        vectors.float_cosine(col("va"), col("vb"))).as("err"))
      .agg(max("err")).first().getDouble(0)
    assert(errs < 0.02, s"max quantization error $errs")
  }

  test("annTopK: results are a subset of brute-force candidates' quality") {
    val e = graft.core.Tables.load(spark, TestSpark.Sf, "embeddings")
    val q = e.filter(col("vec_id") < 3)
    val ann = Similarity.annTopK(e, q, "vec_id", "embedding", 4, planes = 2)
    val rows = ann.collect()
    assert(rows.nonEmpty) // 2 planes = 4 buckets over 500 vecs: candidates exist
    // every ANN hit must score <= the brute-force best for that query
    val brute1 = Similarity.bruteTopK(e, q, "vec_id", "embedding", 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    rows.foreach(r => assert(r.getDouble(2) <= brute1(r.getLong(0)) + 1e-9))
  }

  test("recallAtK: 1.0 for itself, 0.0 for disjoint, fractional for partial") {
    import spark.implicits._
    val exact = Seq((1L, 10L), (1L, 11L), (1L, 12L), (1L, 13L), (1L, 14L))
      .toDF("qid", "vid")
    val identical = Similarity.recallAtK(exact, exact, 5).collect()
    assert(identical.map(r => (r.getLong(0), r.getDouble(1))).toSet == Set((1L, 1.0)))
    val disjoint = Seq((1L, 99L)).toDF("qid", "vid")
    assert(Similarity.recallAtK(exact, disjoint, 5).first().getDouble(1) == 0.0)
    val partial = Seq((1L, 10L), (1L, 11L), (1L, 99L)).toDF("qid", "vid")
    assert(Similarity.recallAtK(exact, partial, 5).first().getDouble(1) == 0.4)
    // duplicated approx rows must not inflate recall past 1.0
    val duped = Seq((1L, 10L), (1L, 10L), (1L, 10L), (1L, 11L), (1L, 11L))
      .toDF("qid", "vid")
    assert(Similarity.recallAtK(exact, duped, 5).first().getDouble(1) == 0.4)
    // a query with fewer than k true neighbors scores 1.0 when recovered
    val threeTrue = Seq((2L, 1L), (2L, 2L), (2L, 3L)).toDF("qid", "vid")
    assert(Similarity.recallAtK(threeTrue, threeTrue, 5).first().getDouble(1) == 1.0)
    // a full probe of the IVF index must recover the exact result: recall 1
    val e = graft.core.Tables.load(spark, TestSpark.Sf, "embeddings")
    val q = e.filter(col("vec_id") < 3)
    val brute = Similarity.bruteTopK(e, q, "vec_id", "embedding", 5)
    val idx = IvfIndex.build(spark, e, "vec_id", "embedding", nlist = 4)
    val full = IvfIndex.topK(spark, idx, q, "vec_id", "embedding", k = 5, nprobe = 4)
    val recalls = Similarity.recallAtK(brute, full, 5)
      .collect().map(_.getDouble(1))
    assert(recalls.forall(_ == 1.0), recalls.mkString(","))
  }

  test("axisBucketBand twin: bucket bits are dim signs; banded probe matches driver replay") {
    val planes = 6; val bands = 8; val k = 5
    val e = graft.core.Tables.load(spark, TestSpark.Sf, "embeddings")
    val all = e.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    // 1) the bucket expression IS the sign pattern of dims [b*planes, b*planes+planes)
    val bkts = e.filter(col("vec_id") < 20)
      .select(col("vec_id"), array((0 until bands).map(b =>
        Similarity.axisBucketBand(col("embedding"), planes, b)): _*).as("bkts"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    def bucket(v: Array[Float], b: Int): Int =
      (0 until planes).map(p => if (v(b * planes + p) >= 0) 1 << p else 0).sum
    bkts.foreach { case (id, got) =>
      (0 until bands).foreach(b => assert(got(b) == bucket(all(id), b),
        s"vec $id band $b"))
    }
    // 2) the full twin path (any-band candidate join → dedup → cosine
    //    rerank) equals an independent driver replay, row for row
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = (0L until 10L).flatMap { q =>
      val cands = all.keys.filter(v => v != q &&
        (0 until bands).exists(b => bucket(all(q), b) == bucket(all(v), b)))
      cands.toSeq.map(v => (v, cos(all(q), all(v))))
        .sortBy { case (v, c) => (-c, v) }.take(k).zipWithIndex
        .map { case ((v, c), i) => (q, v, BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, i + 1) }
    }.toSet
    val got = Similarity.annTopK(e, e.filter(col("vec_id") < 10), "vec_id",
        "embedding", k, planes, bands, bucketFn = Similarity.axisBucketBand)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(got == expected,
      s"twin mismatch: extra=${got -- expected}, missing=${expected -- got}")
  }

  test("sim_decontaminate: nearest benchmark per doc, self-excluded, flag matches threshold") {
    val df = graft.queries.Catalog.queries("sim_decontaminate")(spark, TestSpark.Sf)
    // scale shape: the benchmark side must broadcast — never a shuffle
    // proportional to the corpus on the small side
    assert(df.queryExecution.executedPlan.toString.contains("Broadcast"),
      "benchmark side of the decontamination sweep must broadcast")
    val got = df.collect()
    val e = graft.core.Tables.load(spark, TestSpark.Sf, "embeddings")
      .select("vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val bench = e.keys.filter(id => id % 97 == 0 && id < 10000000L).toSeq.sorted
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    assert(got.length == e.size, "one row per corpus vector, benchmark vectors included")
    got.foreach { r =>
      val (vid, bid, cs, fl) = (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))
      assert(bid != vid, s"self-match leaked for $vid")
      val (bestCos, bestBid) = bench.filter(_ != vid)
        .map(b => (cos(e(vid), e(b)), b)).maxBy { case (c, b) => (c, -b) }
      assert(bestBid == bid, s"vec $vid: argmax bench $bid != independent $bestBid")
      assert(math.abs(cs - bestCos) < 1e-3, s"vec $vid: cos $cs vs $bestCos")
      assert(fl == (if (bestCos >= 0.35) 1 else 0), s"vec $vid flag")
    }
  }
}

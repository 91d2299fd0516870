package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class PqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val embs = graft.core.Tables.load(spark, TestSpark.Sf, "embeddings")
  private lazy val model = Pq.train(embs, "vec_id", "embedding", m = 16, ks = 32)

  test("encode: m bytes per vector, deterministic, codes vary") {
    val codes = Pq.encode(embs, "vec_id", "embedding", model).cache()
    val lens = codes.select(length(col("code"))).distinct()
      .collect().map(_.getInt(0)).toSeq
    assert(lens == Seq(16)) // 64-dim float32 (256 B) -> 16 B: 16x
    val again = Pq.encode(embs, "vec_id", "embedding", model)
    assert(codes.except(again).isEmpty && again.except(codes).isEmpty)
    assert(codes.select("code").distinct().count() > 100)
    codes.unpersist()
  }

  test("gridModel: encode through the kernel equals the per-dim sign rule") {
    // the sim_pq_rerank_md5 oracle's load-bearing claim, pinned
    // Spark-side: with sign-grid codebooks (±0.5 per dim), PqEncode's
    // per-subspace argmin reduces to matching each dim's sign — code
    // byte j = Σ_t (dim (j*dsub+t) >= 0 ? 1<<t : 0)
    val grid = Pq.gridModel(dim = 64, m = 16)
    val got = Pq.encode(embs.filter(col("vec_id") < 500), "vec_id", "embedding", grid)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("code")).toMap
    val raw = embs.filter(col("vec_id") < 500)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    assert(raw.nonEmpty)
    raw.foreach { case (vid, v) =>
      val want = Array.tabulate(16) { j =>
        (0 until 4).map(t => if (v(j * 4 + t) >= 0) 1 << t else 0).sum.toByte
      }
      assert(java.util.Arrays.equals(got(vid), want), s"vec $vid code mismatch")
    }
  }

  test("ADC score approximates the true dot product within quantization error") {
    val q = embs.filter(col("vec_id") < 3)
    val codes = Pq.encode(embs, "vec_id", "embedding", model)
    val adc = Pq.adcTopK(codes, q, "vec_id", "embedding", model, k = 500)
      .select(col("qid"), col("vid"), col("score"))
    val exact = embs.select(col("vec_id").as("vid"), col("embedding").as("cv"))
      .join(broadcast(q.select(col("vec_id").as("qid"), col("embedding").as("qv"))),
        col("qid") =!= col("vid"))
      .select(col("qid"), col("vid"),
        graft.functions.vectors.float_dot(col("qv"), col("cv")).as("dot"))
    val err = adc.join(exact, Seq("qid", "vid"))
      .select(avg(abs(col("score") - col("dot")))).head().getDouble(0)
    assert(err < 0.15, s"mean |ADC - exact| = $err")
  }

  test("PQ rerank recovers the exact top-k; pure ADC recall is tracked") {
    val q = embs.filter(col("vec_id") < 10)
    val brute = Similarity.bruteTopK(embs, q, "vec_id", "embedding", k = 5)
    val codes = Pq.encode(embs, "vec_id", "embedding", model)

    val rerank = Pq.rerankTopK(codes, embs, q, "vec_id", "embedding",
      model, k = 5, shortlist = 64)
    val rRecall = Similarity.recallAtK(brute, rerank, 5)
      .agg(avg(col("recall_at_5"))).head().getDouble(0)
    assert(rRecall >= 0.9, s"rerank recall@5 = $rRecall")

    val adc = Pq.adcTopK(codes, q, "vec_id", "embedding", model, k = 5)
    val aRecall = Similarity.recallAtK(brute, adc, 5)
      .agg(avg(col("recall_at_5"))).head().getDouble(0)
    // the compressed scan is the WINNOWING stage, not the product — its
    // raw top-5 is noisy by design; the rerank pin above is the quality
    // gate, this floor just tracks that ADC ordering stays informative
    assert(aRecall >= 0.4, s"pure ADC recall@5 = $aRecall")
    assert(rRecall >= aRecall)
  }
}

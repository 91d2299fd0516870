package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.vectors

/** Product quantization — the memory-scale path for similarity search
  * (SURVEY.md §7.5). At 100 TB, float32 embeddings don't fit anywhere
  * useful: PQ stores `m` bytes per vector (64-dim → 8 bytes, 32×) and
  * scores candidates with `m` table lookups per pair (ADC), so the whole
  * corpus can be scanned — or an IVF-pruned slice of it — against an
  * in-register lookup table.
  *
  * Training follows the FAISS discipline: codebooks train on a BOUNDED
  * deterministic sample (quality saturates long before the corpus ends;
  * the id-hash stride matches [[IvfIndex.build]]), driver-local Lloyd's
  * per subspace — m·ks·dsub floats of state, never a corpus-sized
  * structure. Only the single encode pass touches every vector, through
  * the codegen'd [[org.apache.spark.sql.graft.PqEncode]] kernel.
  *
  * Ranking assumes unit-normalized vectors (inner-product ADC == cosine
  * ranking); normalize upstream if the corpus isn't.
  */
object Pq {
  /** Flat codebook: `codebook[(j*ks + c)*dsub + t]`. */
  final case class Model(m: Int, ks: Int, dsub: Int, codebook: Array[Float])

  /** DETERMINISTIC sign-grid codebooks — the DuckDB-replayable twin of
    * [[train]] (the axis-cell discipline applied to the PQ subspaces):
    * subspace `j`'s centroids enumerate the 2^dsub sign combinations at
    * ±`half` per dim (centroid `c`, dim `t` = +half iff bit t of c).
    * [[encode]]'s per-subspace argmin then reduces to matching each
    * dim's sign independently — (|x|∓half)² is minimized by the
    * matching sign — so an oracle recomputes every code as
    * `x >= 0 → bit 1` without replaying Lloyd's, and the ADC luts are
    * EXACT doubles (each entry is ±half·Σ±q over dsub exact terms)
    * both engines cast through REAL identically. Production keeps
    * [[train]]'s k-means codebooks (tighter cells → better shortlists);
    * this is oracle gear for `sim_pq_rerank_md5`, like
    * [[IvfIndex.buildCells]] vs the trained quantizer. Edge: a dim of
    * exactly 0.0f encodes as bit 0 here (PqEncode keeps the lowest
    * centroid on a distance tie) where the sign rule says bit 1 — the
    * fixtures' floats are never exactly zero, and the oracle gate would
    * catch it if one were.
    */
  def gridModel(dim: Int, m: Int, half: Float = 0.5f): Model = {
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val dsub = dim / m
    require(dsub >= 1 && dsub <= 8, s"dsub $dsub outside [1,8]")
    val ks = 1 << dsub
    val codebook = new Array[Float](m * ks * dsub)
    for (j <- 0 until m; c <- 0 until ks; t <- 0 until dsub)
      codebook((j * ks + c) * dsub + t) = if (((c >> t) & 1) == 1) half else -half
    Model(m, ks, dsub, codebook)
  }

  def train(embs: DataFrame, idCol: String, vecCol: String,
            m: Int = 8, ks: Int = 16, sampleMax: Int = 65536,
            iters: Int = 10): Model = {
    val n = embs.count()
    val stride = math.max(1L, n / math.max(1, sampleMax))
    val sample = embs
      .filter(pmod(xxhash64(col(idCol).cast("string")), lit(stride)) === 0)
      .select(col(vecCol)).limit(sampleMax)
      .collect().map(_.getSeq[Float](0).toArray)
    require(sample.nonEmpty, "empty training sample")
    val d = sample.head.length
    require(d % m == 0, s"dim $d not divisible by m=$m")
    val dsub = d / m
    val codebook = new Array[Float](m * ks * dsub)
    var j = 0
    while (j < m) {
      // init: evenly strided sample points (deterministic, spread out)
      val cents = Array.tabulate(ks) { c =>
        val src = sample((c.toLong * sample.length / ks).toInt)
        Array.tabulate(dsub)(t => src(j * dsub + t).toDouble)
      }
      var it = 0
      while (it < iters) {
        val sums = Array.fill(ks)(new Array[Double](dsub))
        val counts = new Array[Long](ks)
        sample.foreach { v =>
          var best = 0
          var bestD = Double.MaxValue
          var c = 0
          while (c < ks) {
            var dist = 0.0
            var t = 0
            while (t < dsub) {
              val diff = v(j * dsub + t) - cents(c)(t)
              dist += diff * diff
              t += 1
            }
            if (dist < bestD) { bestD = dist; best = c }
            c += 1
          }
          counts(best) += 1
          var t = 0
          while (t < dsub) { sums(best)(t) += v(j * dsub + t); t += 1 }
        }
        var c = 0
        while (c < ks) {
          // empty cluster keeps its centroid (stable, deterministic)
          if (counts(c) > 0) {
            var t = 0
            while (t < dsub) { cents(c)(t) = sums(c)(t) / counts(c); t += 1 }
          }
          c += 1
        }
        it += 1
      }
      var c = 0
      while (c < ks) {
        var t = 0
        while (t < dsub) {
          codebook((j * ks + c) * dsub + t) = cents(c)(t).toFloat
          t += 1
        }
        c += 1
      }
      j += 1
    }
    Model(m, ks, dsub, codebook)
  }

  /** Encode the corpus: (id, code) — the 32×-smaller table that gets
    * persisted / cached / shuffled instead of the float vectors.
    */
  def encode(embs: DataFrame, idCol: String, vecCol: String, model: Model): DataFrame =
    embs.select(col(idCol).as("vid"),
      vectors.pq_encode(col(vecCol), model.codebook, model.m, model.ks, model.dsub)
        .as("code"))

  /** ADC top-k: per query, the k best codes by summed LUT score. The
    * query batch is bounded — LUTs (m·ks floats each) are computed
    * driver-side and broadcast; the codes scan is one narrow pass with
    * m lookups per row, and the top-k runs through the bounded-heap
    * operator. Self-matches (qid == vid) are excluded to mirror
    * [[Similarity.bruteTopK]].
    */
  def adcTopK(codes: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, model: Model, k: Int): DataFrame = {
    val spark = codes.sparkSession
    import spark.implicits._
    val luts = queries.select(col(idCol).cast("long"), col(vecCol)).collect().map { r =>
      val q = r.getSeq[Float](1).toArray
      val lut = new Array[Float](model.m * model.ks)
      var j = 0
      while (j < model.m) {
        var c = 0
        while (c < model.ks) {
          var s = 0.0
          var t = 0
          while (t < model.dsub) {
            s += q(j * model.dsub + t).toDouble *
              model.codebook((j * model.ks + c) * model.dsub + t)
            t += 1
          }
          lut(j * model.ks + c) = s.toFloat
          c += 1
        }
        j += 1
      }
      (r.getLong(0), lut)
    }.toSeq
    val lutDf = broadcast(luts.toDF("qid", "lut"))
    val scored = codes.join(lutDf, col("vid") =!= col("qid"))
      .select(col("qid"), col("vid"),
        vectors.pq_lut_score(col("lut"), col("code"), model.ks).as("score"))
    graft.plans.TopK.perGroup(scored, Seq("qid"),
        Seq(("score", false), ("vid", true)), k)
      .select(col("qid"), col("vid"), round(col("score"), 6).as("score"))
  }

  /** PQ shortlist + exact rerank: ADC selects `shortlist` candidates per
    * query from the compressed codes, then ONLY those ids fetch their
    * float vectors (semi-join by id) for an exact cosine top-k. The
    * standard two-stage ANN shape: the 32×-compressed scan does the
    * winnowing, full precision touches `shortlist × queries` rows.
    */
  def rerankTopK(codes: DataFrame, embs: DataFrame, queries: DataFrame,
                 idCol: String, vecCol: String, model: Model,
                 k: Int, shortlist: Int = 64): DataFrame = {
    val cand = adcTopK(codes, queries, idCol, vecCol, model, shortlist)
      .select(col("qid"), col("vid"))
    val vecs = embs.select(col(idCol).as("vid"), col(vecCol).as("cv"),
      vectors.float_norm(col(vecCol)).as("cn"))
    val q = broadcast(queries.select(col(idCol).as("qid"), col(vecCol).as("qv"),
      vectors.float_norm(col(vecCol)).as("qn")))
    val exact = cand.join(vecs, Seq("vid")).join(q, Seq("qid"))
      .select(col("qid"), col("vid"),
        (vectors.float_dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cos"))
    graft.plans.TopK.perGroup(exact, Seq("qid"),
        Seq(("cos", false), ("vid", true)), k)
      .select(col("qid"), col("vid"), round(col("cos"), 6).as("cosim"))
  }
}

package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sign random projection (extension beyond reference parity, SURVEY.md
  * §7.5) — Achlioptas' database-friendly Johnson–Lindenstrauss variant:
  * project d-dim embeddings onto k ≪ d pseudo-random ±1 directions.
  * Angles (hence cosine similarity) are preserved within the JL bound,
  * so the projection is the standard dimensionality-reduction front-end
  * for the ANN family ([[Similarity]], [[IvfIndex]], [[Pq]]): a 100 TB
  * embedding corpus shrinks 4× (64 → 16 dims) BEFORE any index is built
  * or shuffled, and the sign matrix needs no training, no state, and no
  * synchronization — it is a pure function of (j, i).
  *
  * Cross-engine deterministic by construction:
  *  - the sign matrix is md5-derived: s(j,i) = +1 iff the first hex
  *    digit of md5("rp:j:i") < 8. It is a k·d CONSTANT — computed on
  *    the driver and baked into the plan as literals; DuckDB recomputes
  *    the same md5 of the same strings.
  *  - inputs quantize to integers FIRST: q_i = floor(v_i · 10^6) (the
  *    float widens to double exactly, one IEEE multiply is identical on
  *    any engine, floor is exact), and proj_j = Σ_i s(j,i)·q_i is then
  *    pure BIGINT arithmetic — no float summation order anywhere. The
  *    1/√k JL scale factor is deliberately NOT applied: it is a global
  *    constant that cancels in every cosine/ordering downstream, and
  *    dropping it keeps the output exactly representable.
  *
  * Scale shape: one map-side pass — per row, k codegen'd
  * aggregate(zip_with(vec, signs_j, …)) folds over the array column;
  * zero shuffles, zero joins, no per-row hashing (the signs are plan
  * literals). The long-format output (id, j, proj) exists for the
  * oracle; pipeline consumers keep the packed array form.
  */
object RandomProjection {
  /** Default output dimensionality (64 → 16: the JL distortion at k=16
    * is ~1/√16, good enough for coarse ANN routing; rerank stays exact).
    */
  val OutDims = 16

  /** The deterministic ±1 sign matrix, s(j)(i) for out-dim j, in-dim i. */
  def signs(outDim: Int, inDim: Int): Array[Array[Long]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(outDim, inDim) { (j, i) =>
      val h = md.digest(s"rp:$j:$i".getBytes("UTF-8"))
      if (((h(0) >> 4) & 0xf) < 8) 1L else -1L
    }
  }

  /** Exact integer projection of `vecCol` (array<float>) to `outDim`
    * longs, long format: (idCol, j, proj), ordered for the oracle.
    */
  def project(embs: DataFrame, idCol: String, vecCol: String,
              outDim: Int = OutDims, inDim: Int = 64): DataFrame = {
    val sg = signs(outDim, inDim)
    // fail LOUDLY on a dimension mismatch: zip_with null-pads the shorter
    // side, so a wrong-width vector would otherwise yield a silent NULL
    // projection while the DuckDB oracle computes partial sums over the
    // overlapping dims — a quiet cross-engine divergence (ADVICE r11).
    val vec = when(size(col(vecCol)) === inDim, col(vecCol)).otherwise(
      raise_error(concat(
        lit(s"RandomProjection.project: expected $inDim-dim vector, got "),
        size(col(vecCol)).cast("string"))))
    def projExpr(j: Int): Column = aggregate(
      zip_with(vec, lit(sg(j)),
        (v, s) => s * floor(v.cast("double") * lit(1000000.0))),
      lit(0L), (acc, x) => acc + x)
    embs.select(col(idCol),
        explode(array((0 until outDim).map(j =>
          struct(lit(j.toLong).as("j"), projExpr(j).as("proj"))): _*)).as("p"))
      .select(col(idCol), col("p.j").as("j"), col("p.proj").as("proj"))
      .orderBy(idCol, "j")
  }
}

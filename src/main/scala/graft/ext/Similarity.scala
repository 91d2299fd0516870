package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`) — extension beyond reference parity (SURVEY.md §7.5).
  *
  * Two paths: brute-force cosine top-k (baseline, exact; query side
  * broadcast so the corpus never shuffles) and random-hyperplane LSH
  * bucketing (the scale path: bucket key is computed map-side, the
  * candidate join shuffles only within buckets).
  *
  * All vector math is `zip_with`/`aggregate`/`transform` higher-order
  * built-ins — codegen-friendly, no UDFs.
  */
object Similarity {
  /** dot(a, b) with float→double widening. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** Exact top-k by cosine for each query vector. `queries` must be small
    * (it is broadcast); the corpus side is scanned once, no shuffle until
    * the final per-query top-k (a window over qid, k rows each).
    */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("qid"), col(vecCol).as("qv")))
    val c = corpus.select(col(idCol).as("vid"), col(vecCol).as("cv"))
    val scored = c.join(q, col("qid") =!= col("vid"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vid"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("qid"), col("vid"), round(col("cos"), 6).as("cosim"), col("rk"))
  }

  /** Deterministic pseudo-random ±1 hyperplane component for (plane, dim),
    * derived from xxhash64 — no RNG state, reproducible across runs.
    */
  private def signComponent(plane: Int, dimIdx: Column): Column =
    when(pmod(xxhash64(lit(plane.toLong * 1000003L) + dimIdx), lit(2)) === 0, lit(1.0))
      .otherwise(lit(-1.0))

  /** Random-hyperplane LSH bucket: one bit per plane = sign of the dot
    * product with a ±1 hyperplane. Computed map-side per row.
    */
  def hyperplaneBucket(vec: Column, planes: Int): Column = {
    val bits = (0 until planes).map { p =>
      val d = aggregate(
        transform(vec, (x, i) => x.cast("double") * signComponent(p, i.cast("long"))),
        lit(0.0), (acc, v) => acc + v)
      when(d >= 0, lit(1)).otherwise(lit(0)).cast("string")
    }
    concat(bits: _*)
  }

  /** ANN top-k: restrict the candidate set to the query's LSH bucket, then
    * exact-rerank by cosine. Recall < 1 by construction; `planes` trades
    * recall vs candidate count (each plane halves the expected bucket).
    */
  def annTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, planes: Int = 6): DataFrame = {
    val bq = broadcast(queries.select(col(idCol).as("qid"), col(vecCol).as("qv"),
      hyperplaneBucket(col(vecCol), planes).as("bucket")))
    val c = corpus.select(col(idCol).as("vid"), col(vecCol).as("cv"),
      hyperplaneBucket(col(vecCol), planes).as("bucket"))
    val scored = c.join(bq, Seq("bucket")).filter(col("qid") =!= col("vid"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vid"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("qid"), col("vid"), round(col("cos"), 6).as("cosim"), col("rk"))
  }
}

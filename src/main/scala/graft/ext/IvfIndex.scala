package graft.ext

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.vectors

/** IVF (inverted-file) approximate-nearest-neighbor index — the
  * centroid-partitioned scale path complementing the hyperplane-LSH
  * variant in [[Similarity]] (SURVEY.md §7.5).
  *
  * Build: k-means over (a sample of) the corpus → each vector assigned to
  * its nearest centroid ("posting list"). Search: score the query against
  * the centroid table (tiny, broadcast), keep the `nprobe` nearest lists,
  * exact-rerank only those lists' vectors with the codegen'd dot kernel.
  *
  * Scale: the corpus is scanned once at build; at query time only
  * corpus_size × nprobe / nlist vectors are touched, and the
  * centroid-assignment table can be written bucketed by `list` so repeated
  * query batches join without a shuffle.
  */
object IvfIndex {
  final case class Index(centroids: Array[(Int, Array[Float])], assigned: DataFrame)

  /** Train the coarse quantizer and assign every vector to a list.
    *
    * The quantizer trains on a bounded sample — `trainPerList × nlist`
    * vectors (the standard IVF training budget), selected by a
    * deterministic id-hash stride so the index is reproducible across
    * runs and partitionings. Training k-means on the FULL corpus would be
    * 20 full passes through Spark ML before the index exists — at 100 TB
    * that is the build's entire cost; centroid quality saturates long
    * before that. Only the single assignment pass touches every vector.
    */
  /** Right-sized coarse quantizer for a corpus of `n` vectors: the
    * standard IVF heuristic nlist ≈ √n, clamped to [8, 4096]. At √n lists
    * the per-query probe cost (nprobe·n/nlist) and the centroid-scoring
    * cost (nlist) balance; a fixed tiny nlist probes a constant FRACTION
    * of the corpus (nlist=8/nprobe=2 probed 25% at 200k vectors — a scan
    * in disguise), while √n keeps the probed fraction shrinking as the
    * corpus grows.
    */
  def defaultNlist(n: Long): Int =
    math.max(8, math.min(4096, math.round(math.sqrt(n.toDouble)).toInt))

  def build(spark: SparkSession, embs: DataFrame, idCol: String, vecCol: String,
            nlist: Int = 0, seed: Long = 42L, trainPerList: Int = 256,
            maxIter: Int = 20, initMode: String = "k-means||"): Index = {
    val featurized = embs.select(col(idCol).as("vid"), col(vecCol).as("v"),
      array_to_vector(col(vecCol).cast("array<double>")).as("features"))
    val n = featurized.count()
    val k = if (nlist > 0) nlist else defaultNlist(n)
    val target = k.toLong * trainPerList
    val trainSet =
      if (n <= target) featurized
      else featurized.filter(
        pmod(xxhash64(col("vid").cast("string")), lit(math.max(1L, n / target))) === 0)
    val model = new KMeans().setK(k).setSeed(seed).setMaxIter(maxIter)
      .setInitMode(initMode).fit(trainSet)
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) => i -> c.toArray.map(_.toFloat) }
    val assigned = model.transform(featurized)
      .select(col("vid"), col("v"), col("prediction").as("list"))
    Index(centroids, assigned)
  }

  /** ANN top-k through the index: probe the `nprobe` nearest posting lists
    * per query, exact cosine rerank inside them.
    */
  def topK(spark: SparkSession, index: Index, queries: DataFrame, idCol: String,
           vecCol: String, k: Int, nprobe: Int): DataFrame = {
    import spark.implicits._
    val cents = index.centroids.toSeq.toDF("list", "centroid")
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"),
      vectors.float_norm(col(vecCol)).as("qn"))
    // nearest nprobe centroids per query (centroid table is tiny)
    val wc = Window.partitionBy("qid").orderBy(
      (vectors.float_dot(col("qv"), col("centroid")) /
        (col("qn") * vectors.float_norm(col("centroid")))).desc)
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("__cr", row_number().over(wc))
      .filter(col("__cr") <= nprobe)
      .select(col("qid"), col("qv"), col("qn"), col("list"))
    // rerank within the probed lists only
    val scored = index.assigned.join(broadcast(probes), Seq("list"))
      .filter(col("qid") =!= col("vid"))
      .withColumn("cos", vectors.float_dot(col("qv"), col("v")) /
        (col("qn") * vectors.float_norm(col("v"))))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vid"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("qid"), col("vid"), round(col("cos"), 6).as("cosim"), col("rk"))
  }
}

package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.vectors

/** SemDeDup-style semantic deduplication (Abbas et al. 2023 shape):
  * cluster the embedding space coarsely, then prune near-duplicates by
  * exact cosine WITHIN each cluster only — the structure that makes
  * embedding dedup tractable where all-pairs never is.
  *
  * Scale discipline (this is where semantic dedup differs from IVF
  * SEARCH): the cluster count must scale LINEARLY with the corpus —
  * fixed expected cluster size s̄ — because intra-cluster pair volume is
  * Σ sᵢ²/2 ≈ n·s̄/2. IVF's √n sizing would make it n^1.5. With s̄ ≈ 256
  * the pair volume is ~128·n: linear, partition-local after one shuffle
  * on (cluster, sub). Clusters that still exceed `maxClusterSize`
  * (quantizer skew) are sub-split by a hyperplane bucket — a bounded
  * recall trade (cross-sub pairs are missed) that caps the worst-case
  * partition, same guard family as [[graft.core.Skew]].
  *
  * At extreme corpus sizes the k-means assignment itself wants a
  * hierarchical (two-level) quantizer — the assignment input here is an
  * arbitrary (id, cl) frame precisely so that swap stays local.
  */
object SemDedup {
  /** Near-dup pairs (id_a < id_b, cos ≥ tau) within clusters of an
    * arbitrary assignment frame `assign` = (id, cl). Norms are computed
    * once per row before the pair join; the join shuffles each row once
    * on (cl, sub).
    */
  def clusterDupPairs(embs: DataFrame, idCol: String, vecCol: String,
                      assign: DataFrame, tau: Double,
                      maxClusterSize: Int = 4096,
                      subPlanes: Int = 4): DataFrame = {
    val v = embs.select(col(idCol).as("id"), col(vecCol).as("v"),
        vectors.float_norm(col(vecCol)).as("nm"))
      .join(assign.select(col("id"), col("cl")), Seq("id"))
    // oversized clusters (quantizer skew) get a hyperplane sub-key; the
    // size census is cluster-count rows — broadcastable by construction
    val big = v.groupBy("cl").agg(count(lit(1)).as("n"))
      .filter(col("n") > maxClusterSize).select(col("cl"), lit(1).as("__big"))
    val keyed = v.join(broadcast(big), Seq("cl"), "left_outer")
      .withColumn("sub",
        when(col("__big").isNotNull, vectors.hyperplane_bucket(col("v"), subPlanes))
          .otherwise(lit(0)))
      .select(col("cl"), col("sub"), col("id"), col("v"), col("nm"))
    val a = keyed.as("a")
    val b = keyed.as("b")
    a.join(b, col("a.cl") === col("b.cl") && col("a.sub") === col("b.sub") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        (vectors.float_dot(col("a.v"), col("b.v")) / (col("a.nm") * col("b.nm")))
          .as("cos"))
      .filter(col("cos") >= tau)
  }

  /** Full resolution: pairs → connected components → one kept exemplar
    * (lowest id) per component. Returns every input id with its
    * component and keep decision: (id, cluster_id, kept_id, is_dup).
    */
  def semanticDedup(embs: DataFrame, idCol: String, vecCol: String,
                    assign: DataFrame, tau: Double,
                    maxClusterSize: Int = 4096): DataFrame = {
    val pairs = clusterDupPairs(embs, idCol, vecCol, assign, tau, maxClusterSize)
    val cc = Dedup.dupClusters(pairs.select(col("id_a"), col("id_b")))
    embs.select(col(idCol).as("id"))
      .join(cc, Seq("id"), "left_outer")
      .select(col("id"),
        coalesce(col("cluster_id"), col("id")).as("cluster_id"))
      .withColumn("kept_id", col("cluster_id")) // min-label CC ⇒ label IS the kept id
      .withColumn("is_dup", (col("id") =!= col("kept_id")).cast("int"))
  }

  /** Dedup-sized k-means assignment: k = n/targetClusterSize (LINEAR in
    * n — see the header), reusing [[IvfIndex.build]]'s bounded-sample
    * trainer. Returns (id, cl).
    */
  def ivfAssignment(spark: SparkSession, embs: DataFrame, idCol: String,
                    vecCol: String, targetClusterSize: Int = 256,
                    seed: Long = 42L): DataFrame = {
    val n = embs.count()
    val k = math.max(8, math.min(65536, (n / math.max(1, targetClusterSize)).toInt))
    // a LIGHT quantizer on purpose: dedup recall only needs ε-close
    // vectors to land in the same cell, which any sane partition gives —
    // unlike search, where centroid quality sets the probe budget. Five
    // Lloyd's rounds on a 64·k sample keep the build a fraction of the
    // pair-join cost.
    IvfIndex.build(spark, embs, idCol, vecCol, nlist = k, seed = seed,
        trainPerList = 64, maxIter = 5)
      .assigned.select(col("vid").as("id"), col("list").as("cl"))
  }
}

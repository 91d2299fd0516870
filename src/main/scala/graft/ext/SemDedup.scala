package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.vectors

/** SemDeDup-style semantic deduplication (Abbas et al. 2023 shape):
  * cluster the embedding space coarsely, then prune near-duplicates by
  * exact cosine WITHIN each cluster only — the structure that makes
  * embedding dedup tractable where all-pairs never is.
  *
  * Scale discipline — BOTH stages must stay linear in n, and they pull
  * in opposite directions:
  *  - pair volume is Σ sᵢ²/2, so cells must stay bounded-size;
  *  - but k-means ASSIGNMENT costs n·k·d, so k must stay CONSTANT
  *    (k = n/256 would make assignment O(n²) — the same quadratic the
  *    4× scale probe exists to catch).
  * Resolution: k is capped at a constant; past the corpus size where
  * cells outgrow `maxClusterSize`, the hyperplane SUB-SPLIT carries the
  * load, with sub-key width auto-sized from the largest cell
  * (⌈log2(maxCell/cap)⌉ — the [[Dedup.autoPlanes]] discipline), so
  * per-sub-cell size and therefore pair volume stay bounded at ANY n.
  * The recall trade (cross-sub pairs are missed, ~θ/π per plane) is
  * paid only inside oversized cells; at extreme scale a hierarchical
  * two-level quantizer is the standard upgrade — the assignment input
  * is an arbitrary (id, cl) frame precisely so that swap stays local.
  */
object SemDedup {
  /** One live (vec, norm, cl) cache per call site — see CacheSlot. */
  private val vSlot = new CacheSlot

  /** Near-dup pairs (id_a < id_b, cos ≥ tau) within clusters of an
    * arbitrary assignment frame `assign` = (id, cl). Norms are computed
    * once per row before the pair join; the join shuffles each row once
    * on (cl, sub).
    */
  def clusterDupPairs(embs: DataFrame, idCol: String, vecCol: String,
                      assign: DataFrame, tau: Double,
                      maxClusterSize: Int = 4096): DataFrame = {
    // PERSISTED for the call (r15): v has FOUR consumers — the census
    // collect, the keyed frame's two self-join sides, and (through
    // keyed) the pair join — and `assign` is typically the k-means
    // assignment subtree (n·k·d flops); unpersisted, the assignment
    // recomputed once per consumer (StageProf r15: five ~60-84 task-s
    // stages, each a full 113 MB embedding scan + assignment, ~350 of
    // dedup_semantic's ~700 task-s). Bounded: n rows × (vec + norm +
    // cl) ≈ corpus embedding size. Released via the caller-visible
    // CacheSlot discipline below (unpersist on the next call).
    val v = SemDedup.vSlot.swap(
      embs.select(col(idCol).as("id"), col(vecCol).as("v"),
          vectors.float_norm(col(vecCol)).as("nm"))
        .join(assign.select(col("id"), col("cl")), Seq("id")))
    // oversized clusters (constant-k growth or quantizer skew) get a
    // hyperplane sub-key WIDE ENOUGH that expected sub-cell size ≤ cap:
    // planes = ceil(log2(maxCell/cap)) + 1. Sizing from the census keeps
    // pair volume linear at any corpus size; a fixed width would go
    // quadratic as cells outgrow it. The census is cluster-count rows —
    // broadcastable by construction.
    val census = v.groupBy("cl").agg(count(lit(1)).as("n"))
      .filter(col("n") > maxClusterSize).select(col("cl"), col("n"))
      .collect()
    val maxCell = if (census.isEmpty) 0L else census.map(_.getLong(1)).max
    val subPlanes = if (maxCell == 0) 1
      else math.max(1, math.ceil(math.log(maxCell.toDouble / maxClusterSize)
        / math.log(2)).toInt + 1)
    val spark = embs.sparkSession
    // `cl` dtype follows the caller's assignment frame (int k-means ids,
    // long hyperplane masks, …) — rebuild the hub-set frame with that
    // exact dtype instead of assuming one (a .getInt here crashed on the
    // first corpus big enough to make the census non-empty)
    val clType = v.schema("cl").dataType
    val big = spark.createDataFrame(
        java.util.Arrays.asList(census.map(r =>
          org.apache.spark.sql.Row(r.get(0))): _*),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("cl", clType))))
      .withColumn("__big", lit(1))
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
                    maxK: Int = 2048, seed: Long = 42L): DataFrame = {
    val n = embs.count()
    // k CAPPED at a constant: assignment is n·k·d, so k growing with n
    // is O(n²) — past n = maxK·target, cells outgrow the cap and
    // clusterDupPairs' auto-sized sub-split carries the load instead
    val k = math.max(8, math.min(maxK, (n / math.max(1, targetClusterSize)).toInt))
    // a LIGHT quantizer on purpose: dedup recall only needs ε-close
    // vectors to land in the same cell, which any sane partition gives —
    // unlike search, where centroid quality sets the probe budget. Five
    // Lloyd's rounds from RANDOM init on a 64·k sample: k-means|| init
    // alone cost 16 s of a 22.5 s build at k=1562/400k vectors, and its
    // extra spread buys dedup nothing.
    IvfIndex.build(spark, embs, idCol, vecCol, nlist = k, seed = seed,
        trainPerList = 64, maxIter = 5, initMode = "random")
      .assigned.select(col("vid").as("id"), col("list").as("cl"))
  }
}

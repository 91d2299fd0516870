package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph analytics for corpus curation (extension beyond
  * reference parity, SURVEY.md §7.5): PageRank over the host/link graph —
  * the CommonCrawl-style domain-authority signal a pretraining pipeline
  * uses for source weighting and spam demotion.
  *
  * Cross-engine determinism: ranks are FIXED-POINT BIGINTs (units of
  * 1/scale), damping is the integer ratio dampNum/dampDen, and every
  * division is integer floor division. Integer addition is exact and
  * order-independent, so the distributed per-dst contribution sums match
  * a single-node replay (the generated DuckDB oracle) bit-for-bit — the
  * same discipline the md5 MinHash/SimHash oracles use for hashing,
  * applied to iterative numerics. (Float PageRank would diverge across
  * engines via summation order alone.)
  *
  * Scale shape: nodes/edges/ranks are DataFrames; one iteration = one
  * join on src + one groupBy dst (both AQE-planned shuffles) plus a
  * scalar dangling-mass aggregate. Each iteration's ranks are persisted
  * and the previous unpersisted, so lineage stays O(1) across
  * iterations. The per-node state is one long — 1e9 hosts ≈ 16 GB
  * cluster-wide, nothing on the driver.
  */
object Graph {
  val Scale: Long = 1000000000000L // 1e12: rank unit = picos of mass

  /** `iters` rounds of damped PageRank over weighted directed `edges`
    * (src: String, dst: String, w: Long). Returns (node, rank_int) with
    * rank_int in units of 1/scale. Dangling mass (nodes with no
    * out-edges) is redistributed uniformly; floor-division remainders
    * leak negligible mass (≤ N·iters/scale) — the standard price of
    * exact arithmetic.
    */
  def pageRankFixedPoint(edges: DataFrame, iters: Int,
                         scale: Long = Scale,
                         dampNum: Long = 85, dampDen: Long = 100): DataFrame = {
    val spark = edges.sparkSession
    val e0 = edges.select(col("src"), col("dst"), col("w").cast("long").as("w"))
      .persist()
    val nEdges = e0.count()
    // size the iteration parallelism from the edge count (the
    // Dedup.dupClusters discipline): a fixed 32-partition layout makes a
    // small host graph pay ~100 task launches per round for kilobytes —
    // measured 47 s for 10 rounds over 74 nodes — while one partition
    // per ~500k edges keeps rounds 1-task cheap there and fully parallel
    // on a billion-edge web graph
    val p = math.max(1L, math.min(spark.sparkContext.defaultParallelism.toLong,
      nEdges / 500000L + 1L)).toInt
    val e = e0.repartition(p, col("src")).persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .repartition(p, col("node")).persist()
    val outw = e.groupBy("src").agg(sum("w").as("ow")).persist()
    val n = nodes.count()
    require(n > 0, "empty graph")
    e0.unpersist()
    val base = ((dampDen - dampNum) * scale) / (dampDen * n)
    // the dangling STRUCTURE is iteration-invariant; only its mass moves
    val danglingNodes = nodes
      .join(outw, nodes("node") === outw("src"), "left_anti").persist()

    var ranks = nodes.select(col("node"), lit(scale / n).as("r"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      // per-edge contribution floor(r * w / ow), summed per destination
      val contrib = e.join(ranks, e("src") === ranks("node"))
        .join(outw, Seq("src"))
        .select(col("dst").as("cnode"), expr("(r * w) div ow").as("c"))
        .groupBy("cnode").agg(sum("c").as("c"))
      // dangling mass rides in as a broadcast 1-row aggregate so each
      // round is ONE job — the scalar-collect form paid a second driver
      // round-trip per iteration
      val dangRow = danglingNodes.join(ranks, Seq("node"))
        .agg(coalesce(sum("r"), lit(0L)).as("dang"))
      val next = nodes.crossJoin(broadcast(dangRow))
        .join(contrib, nodes("node") === col("cnode"), "left_outer")
        .select(col("node"),
          (lit(base) +
            expr(s"($dampNum * (coalesce(c, 0L) + (dang div ${n}L))) div $dampDen"))
            .as("r"))
        .localCheckpoint(false) // lazy: the count below materializes it
      next.count()
      ranks.unpersist()
      ranks = next
    }
    // the final ranks is CHECKPOINTED and materialized — it reads its
    // own blocks, not these plans — so the working set releases here
    // instead of leaking four graph-sized caches per call (r14 sweep:
    // every bench repeat stacked another set for the session lifetime)
    e.unpersist(); nodes.unpersist(); outw.unpersist(); danglingNodes.unpersist()
    ranks
  }

  /** The DuckDB oracle generator for [[pageRankFixedPoint]]: the same
    * integer recurrence unrolled as a CTE chain (`//` is DuckDB floor
    * division — identical to Spark's `div` on the non-negative values
    * here). `edgeSql` must produce (src, dst, w).
    */
  def pageRankOracleSql(edgeSql: String, iters: Int,
                        scale: Long = Scale,
                        dampNum: Long = 85, dampDen: Long = 100): String = {
    val steps = (1 to iters).map { i =>
      val p = s"r${i - 1}"
      s"""c$i AS MATERIALIZED (SELECT e.dst AS node, sum((r.r * e.w) // o.ow) AS c
         |  FROM $p r JOIN edges e ON r.node = e.src
         |  JOIN outw o ON e.src = o.src GROUP BY 1),
         |d$i AS MATERIALIZED (SELECT COALESCE(sum(r.r), 0) AS dang
         |  FROM $p r LEFT JOIN outw o ON r.node = o.src WHERE o.src IS NULL),
         |r$i AS MATERIALIZED (SELECT nd.node,
         |    (($dampDen - $dampNum) * $scale) // ($dampDen * nn.n)
         |    + ($dampNum * (COALESCE(c.c, 0) + (d$i.dang // nn.n))) // $dampDen AS r
         |  FROM nodes nd CROSS JOIN nn CROSS JOIN d$i
         |  LEFT JOIN c$i c ON nd.node = c.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH edges AS MATERIALIZED ($edgeSql),
       |nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges
       |          UNION SELECT DISTINCT dst FROM edges),
       |outw AS MATERIALIZED (SELECT src, sum(w) AS ow FROM edges GROUP BY 1),
       |nn AS MATERIALIZED (SELECT count(*) AS n FROM nodes),
       |r0 AS MATERIALIZED (SELECT node, $scale // nn.n AS r FROM nodes CROSS JOIN nn),
       |$steps
       |SELECT node, round(CAST(r AS DOUBLE) / $scale, 6) AS rank
       |FROM r$iters ORDER BY node""".stripMargin
  }
}

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
    val e = edges.select(col("src"), col("dst"), col("w").cast("long").as("w"))
      .persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().persist()
    val outw = e.groupBy("src").agg(sum("w").as("ow")).persist()
    val n = nodes.count()
    require(n > 0, "empty graph")
    val base = ((dampDen - dampNum) * scale) / (dampDen * n)

    var ranks = nodes.select(col("node"), lit(scale / n).as("r")).persist()
    for (_ <- 1 to iters) {
      // per-edge contribution floor(r * w / ow), summed per destination
      val contrib = ranks.join(e, ranks("node") === e("src"))
        .join(outw, Seq("src"))
        .select(col("dst").as("node"), expr("(r * w) div ow").as("c"))
        .groupBy("node").agg(sum("c").as("c"))
      // dangling mass: one scalar aggregate per iteration
      val dang = ranks.join(outw, ranks("node") === outw("src"), "left_anti")
        .agg(coalesce(sum("r"), lit(0L))).head().getLong(0)
      val dangPer = dang / n
      val next = nodes.join(contrib, Seq("node"), "left_outer")
        .select(col("node"),
          (lit(base) + expr(s"($dampNum * (coalesce(c, 0L) + $dangPer)) div $dampDen"))
            .as("r"))
        .persist()
      next.count() // materialize before dropping the parent
      ranks.unpersist()
      ranks = next
    }
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

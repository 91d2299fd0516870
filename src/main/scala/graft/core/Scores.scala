package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Derived per-row composite scores + name normalization.
  *
  * The reference injects five derived score expressions into every player
  * scan (formulas dict, reference: src/table.py:5-44, injected at
  * table.py:79-93), then post-download computes `score_overall` as a
  * weighted sum of the five (constants at table.py:30-43, applied as a
  * whole-table UPDATE at download.py:534-544) and normalizes names lacking
  * a `#` suffix (download.py:546-555).
  *
  * The formula *shapes* are reproduced exactly; the columns they read are
  * re-bound to the driver testdata (`lineitem` numerics) per FIXTURES.md §3,
  * since the reference's game-stat tables don't exist here. Everything is
  * plain `Column` arithmetic → whole-stage codegen, no UDFs (SURVEY.md §2.9).
  */
object Scores {
  /** Overall-score normalization constants (reference: table.py:30-43). */
  val OverallWeights: Seq[(String, Double)] = Seq(
    "score_stats"     -> 35.564,
    "score_shaman"    -> 24.956,
    "score_survivor"  -> 1.580,
    "score_racing"    -> 0.861,
    "score_defilante" -> 2.851
  )

  private def p25(c: Column): Column = pow(c.cast("double"), 0.25)
  private def d(name: String): Column = col(name).cast("double")

  /** The five score formulas re-bound to lineitem columns. Shapes mirror
    * reference table.py:5-27: (linear combination of counters) /
    * POWER(denominator counters, 0.25). `+1` guards pow(0, .25)=0 divisors
    * (testdata keys start at 0; the reference's ids start at 1).
    */
  def scoreExprs: Seq[(String, Column)] = Seq(
    "score_stats" ->
      (d("l_extendedprice") + d("l_quantity") * 3) / p25(col("l_orderkey") + 1),
    "score_shaman" ->
      (d("l_extendedprice") * 0.05 + d("l_quantity") * 0.2 +
        d("l_discount") * 0.35 + d("l_tax") * 0.5) / p25(col("l_orderkey") + 1),
    "score_survivor" ->
      (d("l_quantity") * 1.6 + d("l_linenumber") * 0.8) /
        p25((col("l_partkey") + 1) * (col("l_suppkey") + 1)),
    "score_racing" ->
      (d("l_quantity") * 2 + d("l_linenumber")) /
        p25((col("l_orderkey") + 1) * (col("l_partkey") + 1)),
    "score_defilante" ->
      d("l_extendedprice") / p25((col("l_orderkey") + 1) * (col("l_suppkey") + 1))
  )

  /** computed_scores: append the five score columns (reference injects them
    * into the scan select list, table.py:83-93, download.py:392,437-441).
    */
  def withScores(df: DataFrame): DataFrame =
    scoreExprs.foldLeft(df) { case (acc, (n, e)) => acc.withColumn(n, e) }

  /** score_overall: weighted sum of the five scores (reference:
    * table.py:30-43 formula; placeholder `1 as score_overall` during scan
    * then UPDATE post-download, download.py:534-544). Here it is one more
    * column in the same plan — no second pass needed.
    */
  def overallExpr: Column =
    OverallWeights.map { case (n, w) => col(n) / lit(w) }.reduce(_ + _)

  def withOverall(df: DataFrame): DataFrame =
    df.withColumn("score_overall", overallExpr)

  /** name_normalize: append `#0000` to names lacking a `#` (reference:
    * `UPDATE .. SET name=CONCAT(name,'#0000') WHERE name NOT LIKE '%#%'`,
    * download.py:546-555).
    */
  def normalizeName(name: Column): Column =
    when(!name.contains("#"), concat(name, lit("#0000"))).otherwise(name)

  /** Pipeline-composable normalization for [[Runner.Source.deriveFetched]]:
    * the reference applies name normalization inside extract, right after
    * download (download.py:546-555) — so a committed snapshot must already
    * carry normalized names. Compose with the score derivation, e.g.
    * `deriveFetched = Scores.normalizeNames(Seq("name")) andThen
    * (Scores.withOverall _ compose Scores.withScores)` for score-bearing
    * tables, or alone for dimension tables.
    */
  def normalizeNames(nameCols: Seq[String])(df: DataFrame): DataFrame =
    nameCols.foldLeft(df)((acc, n) => acc.withColumn(n, normalizeName(col(n))))
}

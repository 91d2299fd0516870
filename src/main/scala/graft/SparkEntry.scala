package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The query surface lives in [[graft.queries.Catalog]]; this object just
  * re-exports it in the driver's shape.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the warm CDC pipeline (SURVEY §3.2) end-to-end on the two-version
    * lineitem fixture and returns per-kind row counts.
    */
  def entry(spark: SparkSession): DataFrame = {
    import graft.queries.Fixture
    val d = "/root/testdata/sf0.001"
    val e = Fixture.external(spark, d)
    val i = Fixture.internal(spark, d)
    core.Diff.classify(i, e, Fixture.Key, Fixture.dataCols(e))
      .groupBy(col("kind")).agg(count(lit(1)).as("n"))
      .orderBy("kind")
  }

  /** One entry per implemented operator from SURVEY.md §2 (+ §7.5 ext). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Catalog.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = graft.queries.Catalog.oracles
}

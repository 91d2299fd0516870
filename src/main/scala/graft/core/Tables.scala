package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the driver testdata layout (TESTDATA.md).
  *
  * Stands in for the reference's runtime schema discovery from
  * `information_schema` (reference: src/table.py:66-75) — with Parquet the
  * schema travels with the data, so "discovery" is just `df.schema`.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** The `events` fixture stores `ts` as parquet TIMESTAMP(NANOS), which
    * Spark's vectorized reader rejects ([PARQUET_TYPE_ILLEGAL]). Read it
    * as raw nanos (legacy conf) and truncate to Spark's native microsecond
    * timestamps — lossless for all downstream event-time semantics here.
    */
  def loadEvents(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
      // truncating ns→µs with exact integral arithmetic (matches DuckDB): `/` would go through
      // double, which cannot represent ~1.7e18 ns exactly (ulp ≈ 0.4 µs),
      // making apparent rounding nondeterministic
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  val AllTables: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "documents", "embeddings")

  /** Register every testdata table (+ `events`) as a temp view so the
    * whole engine is reachable through the `spark.sql` text surface too.
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit = {
    AllTables.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
    loadEvents(spark, sfDir).createOrReplaceTempView("events")
  }

  /** Dynamic column discovery (reference: src/table.py:66-93 builds select
    * lists from discovered columns). Returns field names, optionally
    * filtered to numeric stat columns (used by the schema-driven aggregate
    * list of group_tribe_stats, reference: src/post_update.py:57-66).
    */
  def numericColumns(df: DataFrame, exclude: Set[String] = Set.empty): Seq[String] = {
    import org.apache.spark.sql.types._
    df.schema.fields.collect {
      case f if !exclude.contains(f.name) && (f.dataType match {
        case _: NumericType => true
        case _              => false
      }) => f.name
    }.toSeq
  }
}

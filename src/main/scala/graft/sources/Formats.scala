package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, DataFrameWriter, Row}

/** Cross-format source/sink fidelity: round-trip a frame through an
  * on-disk text or columnar format and read it back with the writer's
  * schema. The reference ingests exactly one external format (MySQL rows
  * over JDBC — db.py's cursor streams); a complete engine also has to
  * ingest the file formats a data lake actually contains, and the
  * round-trip entries in the Catalog gate the full codec path
  * cross-engine: the aggregate of what came BACK from csv/json/orc must
  * hash-match DuckDB's aggregate over the original parquet.
  *
  * Production posture notes (the choices ARE the test):
  *  - CSV/JSON are schema-less; reading back with an EXPLICIT schema is
  *    the production stance (schema registry), never inference — at
  *    100 TB, inference is a second full scan and a type lottery.
  *  - CSV cannot natively distinguish NULL from the empty string: both
  *    serialize as nothing between delimiters. We pin the lossless
  *    convention — `nullValue = "\\N"` (the MySQL dump sentinel) on both
  *    writer and reader, `emptyValue = ""` — so NULL round-trips as \N
  *    and '' as a quoted empty field. FormatsSpec proves the distinction
  *    survives; the default (both collapse to null) silently corrupts.
  *  - Embedded delimiters/quotes/newlines ride RFC 4180 quoting
  *    (escape = '"', i.e. doubled quotes) and `multiLine` on read.
  *    multiLine makes a file non-splittable at parse time, which is the
  *    honest cost of newline-bearing text in CSV; corpora with embedded
  *    newlines belong in parquet/orc, and the Catalog entry exists to
  *    prove the engine survives them when handed such a file anyway.
  *  - Timestamps ride each format's ISO-8601 default in the session
  *    time zone (both Verify and Bench pin UTC).
  *
  * Scale: both directions are embarrassingly parallel scans — the writer
  * fans out one file per partition, the reader splits (csv/json without
  * multiLine; orc always). No shuffle is introduced by the round trip
  * itself; whatever aggregate follows pays its own exchanges.
  */
object Formats {

  /** MySQL-dump NULL sentinel: unquoted \N in the file. */
  val CsvNullSentinel = "\\N"

  private def configureWrite(w: DataFrameWriter[Row], format: String): DataFrameWriter[Row] =
    format match {
      case "csv" => w
        .option("header", "true")
        .option("escape", "\"") // RFC 4180: quotes double inside quoted fields
        .option("nullValue", CsvNullSentinel)
        .option("emptyValue", "\"\"")
      case _ => w
    }

  private def configureRead(r: DataFrameReader, format: String): DataFrameReader =
    format match {
      case "csv" => r
        .option("header", "true")
        .option("escape", "\"")
        .option("nullValue", CsvNullSentinel)
        .option("emptyValue", "")
        .option("multiLine", "true") // embedded newlines in quoted fields
      case _ => r
    }

  /** Write `df` as `format` under `path` (overwrite), read it back with
    * `df`'s schema. Formats: csv, json, orc, parquet.
    */
  def roundTrip(df: DataFrame, format: String, path: String): DataFrame = {
    val spark = df.sparkSession
    configureWrite(df.write.mode("overwrite").format(format), format).save(path)
    configureRead(spark.read.format(format), format).schema(df.schema).load(path)
  }
}

package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured-Streaming extension (SURVEY.md §2.8, §7.5): the reference
  * processes full snapshots per run with NO event-time semantics; this
  * module adds the watermarked, windowed micro-batch capability a
  * continuous CDC/analytics deployment needs.
  */
object CdcStream {
  /** FileStreamSource wants a DIRECTORY; the fixture is a single parquet
    * file — expose it through a temp dir holding a symlink (prod points
    * at a real dir). Cleanup is registered at creation: deleteOnExit on
    * the link then the (empty) dir, so a long-lived session that calls
    * the streaming helpers repeatedly does not accumulate temp dirs past
    * JVM exit (files are deleted in reverse registration order — link
    * first, then its parent).
    */
  private def eventsStreamDir(sfDir: String): java.nio.file.Path = {
    val dir = java.nio.file.Files.createTempDirectory("graft_events_stream")
    val link = dir.resolve("events.parquet")
    java.nio.file.Files.createSymbolicLink(link,
      java.nio.file.Paths.get(s"$sfDir/events.parquet"))
    dir.toFile.deleteOnExit()
    link.toFile.deleteOnExit()
    dir
  }

  /** Tumbling event-time window aggregation — batch form. Identical
    * semantics to the streaming form below (Spark's `window()` is the
    * same operator in both); this is what `stream_tumbling_counts`
    * declares for the DuckDB oracle.
    */
  def tumblingCountsBatch(events: DataFrame, width: String = "1 hour"): DataFrame =
    events.groupBy(window(col("ts"), width), col("event_type"))
      // decimal sum: exact & order-independent → identical across engines
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(18,2)")).cast("double"), 6).as("total_value"))
      // timestamp_ntz: parquet-written tz-adjusted timestamps read back
      // tz-aware, but the DuckDB oracle's date_trunc is naive (UTC session)
      .select(col("window.start").cast("timestamp_ntz").as("hour_start"),
        col("event_type"), col("n"), col("total_value"))

  /** Sliding event-time windows (`width` every `slide`): each event lands
    * in width/slide windows. Same determinism contract as the tumbling
    * form (decimal sums, ntz window starts).
    */
  def slidingCountsBatch(events: DataFrame, width: String = "2 hours",
                         slide: String = "1 hour"): DataFrame =
    events.groupBy(window(col("ts"), width, slide), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(18,2)")).cast("double"), 6).as("total_value"))
      .select(col("window.start").cast("timestamp_ntz").as("win_start"),
        col("event_type"), col("n"), col("total_value"))

  /** Session windows per user: events closer than `gap` chain into one
    * session (gaps-and-islands). Spark's `session_window` merges windows
    * incrementally; the DuckDB oracle reproduces it with
    * lag + cumulative-sum session ids.
    */
  def sessionizeBatch(events: DataFrame, gap: String = "10 minutes"): DataFrame =
    events.groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(18,2)")).cast("double"), 6).as("total_value"))
      .select(col("session_window.start").cast("timestamp_ntz").as("session_start"),
        col("user_id"), col("n"), col("total_value"))

  /** Streaming session windows: same operator as [[sessionizeBatch]] with
    * a watermark bounding session state (complete mode for the in-memory
    * drain; production would use append + sink).
    */
  def runSessionize(spark: SparkSession, sfDir: String,
                    queryName: String = "sessionize_stream"): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val dir = eventsStreamDir(sfDir)
    val stream = graft.core.Tables.normalizeEventTs(
        spark.readStream.schema(schema).parquet(dir.toString))
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(18,2)")).cast("double"), 6).as("total_value"))
      .select(col("session_window.start").cast("timestamp_ntz").as("session_start"),
        col("user_id"), col("n"), col("total_value"))
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }

  /** Streaming exact dedup: admit only the FIRST occurrence of each
    * content signature, with state bounded by the watermark horizon —
    * the streaming form of [[graft.ext.Dedup.exactFlags]]'s keep-first
    * semantics. Exact dedup over an unbounded stream needs unbounded
    * state; `dropDuplicatesWithinWatermark` is the standard trade: a
    * duplicate arriving within the horizon is dropped, state for
    * signatures older than the watermark is reclaimed. At 100 TB/day the
    * signature state shards by hash across the state store exactly like
    * the CDC signature cache ([[StreamingCdc]]).
    */
  def dedupStream(docs: DataFrame, textCol: String, tsCol: String,
                  watermark: String = "1 hour"): DataFrame =
    docs.withColumn("__sig", md5(col(textCol).cast("binary")))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__sig")
      .drop("__sig")

  /** View→click attribution — batch form: every click within `horizon`
    * after a view by the same user. The two stage scans are
    * pushdown-filtered by event_type; the join shuffles on user_id once.
    * Identical semantics to [[runAttributionJoin]]'s stream-stream form
    * (this is what `stream_join_attrib` declares for the DuckDB oracle).
    */
  def attributionJoinBatch(events: DataFrame,
                           horizon: String = "30 minutes"): DataFrame = {
    val v = events.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"),
        col("ts").as("t_view"))
    val c = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("t_click"))
    v.join(c, "user_id")
      .filter(col("t_click") > col("t_view") &&
        col("t_click") <= col("t_view") + expr(s"INTERVAL $horizon"))
      .select(col("user_id"), col("view_id"), col("click_id"),
        col("t_view").cast("timestamp_ntz").as("t_view"),
        col("t_click").cast("timestamp_ntz").as("t_click"))
  }

  /** Stream-STREAM time-interval join: the same attribution with BOTH
    * sides unbounded. The watermarks plus the time-range predicate are
    * what make the join state finite — a buffered view row is evictable
    * once the click side's watermark passes t_view + horizon, so state
    * is bounded by (event rate × horizon), not stream length; without
    * the range condition Spark would rightly buffer both sides forever.
    * Inner stream-stream joins emit in append mode only, which is also
    * the semantics attribution wants (a pair is immutable once emitted).
    */
  def runAttributionJoin(spark: SparkSession, sfDir: String,
                         queryName: String = "attrib_join_stream",
                         horizon: String = "30 minutes"): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val dir = eventsStreamDir(sfDir)
    def side(eventType: String, idAs: String, tsAs: String) =
      graft.core.Tables.normalizeEventTs(
          spark.readStream.schema(schema).parquet(dir.toString))
        .filter(col("event_type") === eventType)
        .select(col("event_id").as(idAs), col("user_id"), col("ts").as(tsAs))
        .withWatermark(tsAs, "1 hour")
    val v = side("view", "view_id", "t_view")
    val c = side("click", "click_id", "t_click").withColumnRenamed("user_id", "c_user_id")
    val joined = v.join(c,
        col("user_id") === col("c_user_id") &&
        col("t_click") > col("t_view") &&
        col("t_click") <= col("t_view") + expr(s"INTERVAL $horizon"))
      .select(col("user_id"), col("view_id"), col("click_id"),
        col("t_view").cast("timestamp_ntz").as("t_view"),
        col("t_click").cast("timestamp_ntz").as("t_click"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }

  /** Streaming form: parquet micro-batch source → 1h watermark → tumbling
    * window agg → memory sink, drained synchronously (for tests).
    * In production the source/sink swap for Kafka/Delta; the plan is
    * unchanged. State is bounded by the watermark (late rows beyond 1h
    * are dropped — capability the reference lacks entirely).
    */
  def runTumblingCounts(spark: SparkSession, sfDir: String,
                        queryName: String = "tumbling_counts"): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val dir = eventsStreamDir(sfDir)
    // ts physical type varies by fixture generation (see Tables.loadEvents);
    // event-time semantics need session-TZ µs timestamps either way
    val stream = graft.core.Tables.normalizeEventTs(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(dir.toString))
    val agg = stream
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(18,2)")).cast("double"), 6).as("total_value"))
      // timestamp_ntz: parquet-written tz-adjusted timestamps read back
      // tz-aware, but the DuckDB oracle's date_trunc is naive (UTC session)
      .select(col("window.start").cast("timestamp_ntz").as("hour_start"),
        col("event_type"), col("n"), col("total_value"))
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }
}

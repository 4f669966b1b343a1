package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

import graft.Tables

/** Structured Streaming over the events table (SURVEY.md §2 row 39).
  *
  * The hourly aggregation is ONE transform shared by the batch query
  * (q_events_windowed, oracle-checked) and the streaming path — write the
  * logical plan once, run it in either mode. The streaming side adds a
  * watermark so state for closed windows is dropped (bounded state at
  * 100 TB/day event volumes); partitioning is by (event_type, window),
  * i.e. the natural shuffle key of the aggregation.
  *
  * TIME CONTRACT: events.ts physical encoding is the driver's choice
  * (ns-annotated INT64 through round 8, µs TIMESTAMP_NTZ from round 9);
  * every reader — batch loader, streaming file source, test synthetic
  * frames — normalizes to `ts_us` (long epoch-micros) at the boundary
  * via Tables.normalizeTs, and all transforms below consume only
  * `ts_us`. Watermarks need an event-time TIMESTAMP column, so the
  * streaming readers derive `tsw = timestamp_micros(ts_us)` (session tz
  * is pinned UTC, so unix_timestamp(tsw) is exact integer arithmetic).
  */
object EventsStream {

  /** READ schema for the streaming file source — must match the live
    * parquet physical encoding (µs timestamp, read as NTZ). Synthetic
    * test frames may instead carry ns-long `ts`; both shapes funnel
    * through Tables.normalizeTs. */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming file source over the events parquet, normalized to the
    * ts_us contract with the watermarkable `tsw` twin. */
  private def readEvents(spark: SparkSession, dir: String): DataFrame =
    Tables.normalizeTs(
        spark.readStream
          .schema(eventsSchema)
          .option("pathGlobFilter", "events.parquet") // stream source wants a dir
          .parquet(dir))
      .withColumn("tsw", timestamp_micros(col("ts_us")))

  /** Hourly tumbling aggregation per event_type. Works on both batch and
    * streaming DataFrames (the window/groupBy plan is mode-agnostic;
    * the streaming variant drops n_users — distinct aggregation is not
    * available in streaming mode). Accepts raw `ts` of any shipped
    * encoding or an already-normalized `ts_us` frame. */
  def hourlyAgg(events: DataFrame): DataFrame =
    Tables.normalizeTs(events)
      .withColumn("tsw", timestamp_micros(col("ts_us")))
      .groupBy(col("event_type"), window(col("tsw"), "1 hour").as("w"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"),
        count_distinct(col("user_id")).as("n_users"))
      .select(col("event_type"),
        expr("unix_timestamp(w.start) DIV 3600").as("hour"),
        col("n_events"), col("sum_value"), col("n_users"))

  /** View-to-click interval join over (event_id, user_id, event_type,
    * tus: long micros): every click by the same user within `gapUs`
    * after a view. Mode-agnostic — the batch query (oracle-checked) and
    * the watermarked stream-stream join below share it. The join is a
    * user_id hash equi-join plus a range predicate in exact integer
    * micros. */
  def intervalJoin(events: DataFrame,
                   gapUs: Long = 30L * 60 * 1000000L): DataFrame = {
    val v = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"),
        col("tus").as("view_us"))
    val c = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user_id"),
        col("event_id").as("click_id"), col("tus").as("click_us"))
    v.join(c, col("user_id") === col("c_user_id") &&
        col("click_us") >= col("view_us") &&
        col("click_us") - col("view_us") <= gapUs)
      .select(col("user_id"), col("view_id"), col("click_id"),
        (col("click_us") - col("view_us")).as("gap_us"))
  }

  /** LEFT OUTER view→click interval join — the join-matrix member the
    * family was missing (inner stream-stream above, stream-static
    * enrich below): every view emits, matched clicks within `gapUs`
    * attach, unmatched views surface with NULLs — the
    * conversion-funnel shape where NON-conversion is the signal.
    * Mode-agnostic; in streaming mode the null rows for a view emit
    * only once the watermark passes view_ts + gapUs (the outer-join
    * state contract the spec encodes honestly). */
  def intervalJoinOuter(events: DataFrame,
                        gapUs: Long = 30L * 60 * 1000000L): DataFrame = {
    val v = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"),
        col("tus").as("view_us"))
    val c = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user_id"),
        col("event_id").as("click_id"), col("tus").as("click_us"))
    v.join(c, col("user_id") === col("c_user_id") &&
        col("click_us") >= col("view_us") &&
        col("click_us") - col("view_us") <= gapUs, "left_outer")
      .select(col("user_id"), col("view_id"), col("view_us"),
        col("click_id"),
        (col("click_us") - col("view_us")).as("gap_us"),
        col("click_id").isNotNull.as("converted"))
  }

  /** Streaming twin: watermarked LEFT OUTER stream-stream join (both
    * sides watermarked; the range condition bounds the buffered state;
    * null-match rows emit when the watermark clears the view's join
    * window). */
  def intervalJoinOuterStream(spark: SparkSession, dir: String,
                              queryName: String): StreamingQuery = {
    def src = readEvents(spark, dir)
    val v = src.filter(col("event_type") === "view")
      .withWatermark("tsw", "2 hours")
      .select(col("user_id"), col("event_id").as("view_id"),
        col("tsw").as("view_tsw"))
    val c = src.filter(col("event_type") === "click")
      .withWatermark("tsw", "2 hours")
      .select(col("user_id").as("c_user_id"),
        col("event_id").as("click_id"), col("tsw").as("click_tsw"))
    v.join(c, col("user_id") === col("c_user_id") &&
        col("click_tsw") >= col("view_tsw") &&
        col("click_tsw") <= col("view_tsw") + expr("INTERVAL 30 MINUTES"),
        "leftOuter")
      .select(col("user_id"), col("view_id"),
        unix_micros(col("view_tsw")).as("view_us"), col("click_id"),
        (unix_micros(col("click_tsw")) - unix_micros(col("view_tsw")))
          .as("gap_us"),
        col("click_id").isNotNull.as("converted"))
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("append")
      .start()
  }

  /** Stream-stream interval join: both sides watermarked so the view
    * state for users whose join window has passed is dropped — the
    * event-time range condition bounds state exactly as Structured
    * Streaming requires for stream-stream joins. */
  def intervalJoinStream(spark: SparkSession, dir: String,
                         queryName: String): StreamingQuery = {
    def src = readEvents(spark, dir)
    val v = src.filter(col("event_type") === "view")
      .withWatermark("tsw", "2 hours")
      .select(col("user_id"), col("event_id").as("view_id"),
        col("tsw").as("view_tsw"))
    val c = src.filter(col("event_type") === "click")
      .withWatermark("tsw", "2 hours")
      .select(col("user_id").as("c_user_id"),
        col("event_id").as("click_id"), col("tsw").as("click_tsw"))
    v.join(c, col("user_id") === col("c_user_id") &&
        col("click_tsw") >= col("view_tsw") &&
        col("click_tsw") <= col("view_tsw") + expr("INTERVAL 30 MINUTES"))
      .select(col("user_id"), col("view_id"), col("click_id"),
        (unix_micros(col("click_tsw")) - unix_micros(col("view_tsw")))
          .as("gap_us"))
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("append")
      .start()
  }

  /** Streaming exact dedup: drop duplicate events by key within the
    * watermark window — the streaming face of the dedup family
    * (state is bounded by the watermark; at 100 TB/day the key set for
    * the open window is all an executor ever holds). */
  def dedupStream(spark: SparkSession, dir: String,
                  queryName: String): StreamingQuery =
    readEvents(spark, dir)
      .withWatermark("tsw", "2 hours")
      .dropDuplicatesWithinWatermark("user_id", "event_type")
      .select(col("event_id"), col("user_id"), col("event_type"))
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("append")
      .start()

  /** The static dimension for stream enrichment: customer market
    * segments keyed by user id (events.user_id lives in the customer
    * key range by construction). */
  def customerDim(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "customer")
      .select(col("c_custkey").cast("long").as("user_id"),
        col("c_mktsegment").as("segment"))

  /** Stream-static ENRICHMENT join + rollup — the most common
    * Structured Streaming pattern (dimension lookup on a live feed)
    * and the one join kind the family was missing beside stream-stream
    * (intervalJoinStream): the static side joins into every
    * micro-batch broadcast-side, carrying NO state (unlike the
    * watermarked stream-stream join); the plan is mode-agnostic, so
    * this one transform serves the batch CORRECTNESS row and the
    * streaming parity spec. */
  def enrichAgg(events: DataFrame, dim: DataFrame): DataFrame =
    // the customer dim grows with the scale factor — no forced
    // broadcast hint; the planner broadcasts when its size allows
    Tables.normalizeTs(events)
      .join(dim, Seq("user_id"))
      .groupBy(col("segment"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"))

  /** Streaming twin over the file source, complete-mode memory sink. */
  def enrichStream(spark: SparkSession, dir: String,
                   queryName: String): StreamingQuery =
    enrichAgg(readEvents(spark, dir), customerDim(spark, dir))
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("complete")
      .start()

  /** Streaming variant: file source over the events parquet, 2h watermark,
    * update-mode sink provided by the caller (memory sink in tests). */
  def hourlyStream(spark: SparkSession, dir: String,
                   queryName: String): StreamingQuery = {
    val src = readEvents(spark, dir)
      .withWatermark("tsw", "2 hours")
      .groupBy(col("event_type"), window(col("tsw"), "1 hour").as("w"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"))
      .select(col("event_type"),
        expr("unix_timestamp(w.start) DIV 3600").as("hour"),
        col("n_events"), col("sum_value"))
    src.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("complete")
      .start()
  }
}

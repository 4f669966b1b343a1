package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming AS-OF join (VERDICT r12 item 5) — the temporal-enrichment
  * shape production streams actually run: every click matched to the
  * LATEST view by the same user at-or-before the click's event time,
  * with late-arriving views handled by the standard watermark
  * discipline. Batch twin: queries.EventQueries.qAsofJoin (the
  * union+ordered-window form); parity is row-identical on events the
  * watermark has passed (StreamingSpec pins both directions with the
  * outer-join test's emission-bound technique).
  *
  * Why not the CdcStream order-insensitive fold: an as-of match is NOT
  * a fold — a click's answer depends on every view at-or-before it, so
  * an early emission could be invalidated by a late view. The correct
  * streaming shape buffers per-user events until the watermark passes
  * them, then replays the batch twin's exact (ts, kind) ordered scan
  * over the ripe prefix: each click emits EXACTLY ONCE (append mode),
  * matched against the complete view set the watermark guarantees.
  * State per user = one carried (ts, id) view anchor + the not-yet-ripe
  * buffer, bounded by the watermark delay × the user's event rate —
  * the same bound Spark's own stream-stream join state keeps. The
  * shuffle key is user_id: identical to the batch plan's one shuffle.
  *
  * Equal-ts semantics replicate the twin: views sort before clicks at
  * the same timestamp (inclusive <=), and among equal-ts views the max
  * event_id wins (the batch side's pre-dedup), applied here by letting
  * the ascending (ts, kind, id) scan overwrite the anchor.
  */
object AsofStream {

  // tsw rides along only because the event-time-timeout contract
  // requires the watermarked column to reach the stateful operator
  case class Ev(user_id: Long, kind: Int, ts_us: Long, id: Long,
                tsw: java.sql.Timestamp)
  case class Buf(lastViewTs: Long, lastViewId: Long, pending: Array[Ev])
  case class AsofMatch(click_id: Long, user_id: Long, click_ts_us: Long,
                       view_id: Long, view_ts_us: Long, lag_us: Long)

  /** Watermark delay — matches the interval-join family's 2 hours. */
  val DelayExpr = "2 hours"

  private def flush(uid: Long, rows: Iterator[Ev],
                    state: GroupState[Buf]): Iterator[AsofMatch] = {
    val st = state.getOption.getOrElse(Buf(Long.MinValue, -1L, Array.empty))
    val buf = st.pending ++ (if (state.hasTimedOut) Iterator.empty else rows)
    // ms-granular engine watermark; an event is ripe only once the
    // watermark is STRICTLY past its microsecond timestamp — Spark's
    // watermark guarantees completeness only for event times strictly
    // below it, so an event AT the watermark could still gain a
    // same-timestamp late sibling; it stays buffered one more advance
    val wmUs = state.getCurrentWatermarkMs() * 1000L
    val (ripe, rest) = buf.sortBy(e => (e.ts_us, e.kind, e.id))
      .partition(_.ts_us < wmUs)
    var lastTs = st.lastViewTs
    var lastId = st.lastViewId
    val out = Array.newBuilder[AsofMatch]
    ripe.foreach { e =>
      if (e.kind == 0) {
        if (e.ts_us > lastTs || (e.ts_us == lastTs && e.id > lastId)) {
          lastTs = e.ts_us; lastId = e.id
        }
      } else if (lastTs != Long.MinValue) {
        out += AsofMatch(e.id, uid, e.ts_us, lastId, lastTs,
          e.ts_us - lastTs)
      }
    }
    state.update(Buf(lastTs, lastId, rest))
    if (rest.nonEmpty) {
      // wake this group when the watermark reaches its earliest
      // pending event (must be strictly ahead of the current watermark)
      val nextMs = rest.iterator.map(_.ts_us).min / 1000L
      state.setTimeoutTimestamp(
        math.max(nextMs, state.getCurrentWatermarkMs() + 1L))
    }
    out.result().iterator
  }

  /** Streaming view/click events -> exactly-once as-of matches. */
  def asofMatches(events: DataFrame): Dataset[AsofMatch] = {
    implicit val evEnc = Encoders.product[Ev]
    implicit val stEnc = Encoders.product[Buf]
    implicit val outEnc = Encoders.product[AsofMatch]
    implicit val keyEnc = Encoders.scalaLong
    graft.Tables.normalizeTs(events)
      .withColumn("tsw", timestamp_micros(col("ts_us")))
      .filter(col("event_type").isin("view", "click"))
      .withWatermark("tsw", DelayExpr)
      .select(col("user_id").cast("long").as("user_id"),
        when(col("event_type") === "view", 0).otherwise(1).as("kind"),
        col("ts_us"), col("event_id").cast("long").as("id"), col("tsw"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(flush)
  }

  /** File-source streaming run into a memory sink (used by tests). */
  def run(spark: org.apache.spark.sql.SparkSession, dir: String,
          queryName: String): org.apache.spark.sql.streaming.StreamingQuery =
    asofMatches(
      spark.readStream
        .schema(EventsStream.eventsSchema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir))
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("append")
      .start()
}

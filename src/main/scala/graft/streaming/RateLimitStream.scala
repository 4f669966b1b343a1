package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming token-bucket rate limiter — the admission-control twin of
  * queries.EventQueries.qRateLimit (same integer recurrence: tokens in
  * microseconds of refill, t' = min(cap, t + Δt) − P·accept), carried
  * across micro-batches in flatMapGroupsWithState. State per user is
  * TWO longs (token balance, last event time) — bounded regardless of
  * stream length, the same shuffle key (user_id) the batch fold
  * groups by. Within a micro-batch the group's rows sort by
  * (ts_us, event_id), the batch twin's exact tie order, so a
  * single-batch replay is row-identical to the batch query
  * (parity-pinned in StreamingSpec).
  */
object RateLimitStream {

  case class Ev(user_id: Long, ts_us: Long, event_id: Long)
  case class BucketState(tok: Long, lastTs: Long)
  case class Decision(user_id: Long, event_id: Long, ts_us: Long,
                      accepted: Boolean, tok_us: Long)

  private val P = graft.queries.EventQueries.RatePeriodUs
  private val Cap = graft.queries.EventQueries.RateCapUs

  private def updateUser(uid: Long, rows: Iterator[Ev],
                         state: GroupState[BucketState])
      : Iterator[Decision] = {
    val sorted = rows.toArray.sortBy(e => (e.ts_us, e.event_id))
    if (sorted.isEmpty) Iterator.empty
    else {
      var st = state.getOption.getOrElse(BucketState(Cap, -1L))
      val out = sorted.map { e =>
        val delta = if (st.lastTs == -1L) 0L else e.ts_us - st.lastTs
        val t1 = math.min(Cap, st.tok + delta)
        val ok = t1 >= P
        val t2 = if (ok) t1 - P else t1
        st = BucketState(t2, e.ts_us)
        Decision(uid, e.event_id, e.ts_us, ok, t2)
      }
      state.update(st)
      out.iterator
    }
  }

  /** Streaming (or batch) events -> per-event admission decisions. */
  def decisions(events: DataFrame): Dataset[Decision] = {
    implicit val evEnc = Encoders.product[Ev]
    implicit val stEnc = Encoders.product[BucketState]
    implicit val outEnc = Encoders.product[Decision]
    implicit val keyEnc = Encoders.scalaLong
    graft.Tables.normalizeTs(events)
      .select(col("user_id").cast("long").as("user_id"), col("ts_us"),
        col("event_id").cast("long").as("event_id"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(updateUser)
  }

  /** File-source streaming run into a memory sink (used by tests). */
  def run(spark: org.apache.spark.sql.SparkSession, dir: String,
          queryName: String): org.apache.spark.sql.streaming.StreamingQuery =
    decisions(
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

package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization (SURVEY.md §2 row 40, streaming
  * side): the batch twin is queries.EventQueries.qSessionize (lag +
  * running sum); this version maintains per-user session state across
  * micro-batches with flatMapGroupsWithState — the Spark-native way to
  * sessionize an unbounded stream.
  *
  * State per user is three longs (last event time, session count, event
  * count) — bounded regardless of stream length; the shuffle key is
  * user_id, the same key the batch plan uses. Within a micro-batch the
  * group's rows are sorted in memory (per-user per-batch volume is
  * bounded by the trigger interval at production scale).
  */
object SessionStream {

  case class Ev(user_id: Long, ts_us: Long)
  case class SessState(lastTs: Long, sessions: Long, events: Long)
  case class UserSessions(user_id: Long, n_sessions: Long, n_events: Long)

  val GapUs: Long = 30L * 60 * 1000000L

  /** Fold a user's new events into its session state; emit the updated
    * per-user totals (update-mode semantics). */
  private def updateUser(uid: Long, rows: Iterator[Ev],
                         state: GroupState[SessState]): Iterator[UserSessions] = {
    val sorted = rows.toArray.sortBy(_.ts_us)
    if (sorted.isEmpty) {
      Iterator.empty
    } else {
      var st = state.getOption.getOrElse(SessState(Long.MinValue, 0L, 0L))
      sorted.foreach { e =>
        val newSession = st.lastTs == Long.MinValue || e.ts_us - st.lastTs > GapUs
        st = SessState(e.ts_us,
          st.sessions + (if (newSession) 1 else 0),
          st.events + 1)
      }
      state.update(st)
      Iterator.single(UserSessions(uid, st.sessions, st.events))
    }
  }

  /** Streaming (or batch) events -> per-user session totals. */
  def sessionCounts(events: DataFrame): Dataset[UserSessions] = {
    implicit val evEnc = Encoders.product[Ev]
    implicit val stEnc = Encoders.product[SessState]
    implicit val outEnc = Encoders.product[UserSessions]
    implicit val keyEnc = Encoders.scalaLong
    graft.Tables.normalizeTs(events)
      .select(col("user_id").cast("long").as("user_id"), col("ts_us"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update(),
        GroupStateTimeout.NoTimeout())(updateUser)
  }

  /** File-source streaming run into a memory sink (used by tests). */
  def run(spark: org.apache.spark.sql.SparkSession, dir: String,
          queryName: String): org.apache.spark.sql.streaming.StreamingQuery =
    sessionCounts(
      spark.readStream
        .schema(EventsStream.eventsSchema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir))
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("update")
      .start()
}

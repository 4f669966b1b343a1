package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CDC compaction — the unbounded twin of
  * queries.EventQueries.qLatestByKey: maintain the newest record per
  * (user_id, event_type) across micro-batches with
  * flatMapGroupsWithState. State per key is one record (the current
  * survivor) — bounded by key cardinality exactly like the keyed store
  * the stream materializes into; the newest-wins rule is the batch
  * twin's (ts_us DESC, event_id DESC) order, applied as a fold so
  * arrival order inside or across batches cannot change the survivor
  * (parity-pinned in StreamingSpec). Update-mode emission: each batch
  * re-emits only keys whose survivor changed — the Delta-MERGE-shaped
  * output a downstream "current state" view consumes.
  */
object CdcStream {

  case class Chg(user_id: Long, event_type: String, ts_us: Long,
                 event_id: Long, value: Double, k: Option[Long])
  case class Latest(user_id: Long, event_type: String, ts_us: Long,
                    event_id: Long, value: Double, k: Option[Long])

  private def newer(a: Latest, b: Latest): Latest =
    if (a.ts_us > b.ts_us ||
      (a.ts_us == b.ts_us && a.event_id > b.event_id)) a else b

  private def updateKey(key: (Long, String), rows: Iterator[Chg],
                        state: GroupState[Latest]): Iterator[Latest] = {
    val inc = rows.map(c =>
      Latest(c.user_id, c.event_type, c.ts_us, c.event_id, c.value, c.k))
      .reduceOption(newer)
    inc match {
      case None => Iterator.empty
      case Some(cand) =>
        val merged = state.getOption.map(newer(cand, _)).getOrElse(cand)
        val changed = !state.getOption.contains(merged)
        state.update(merged)
        if (changed) Iterator.single(merged) else Iterator.empty
    }
  }

  /** Streaming (or batch) change rows -> latest record per key. */
  def latest(events: DataFrame): Dataset[Latest] = {
    implicit val cEnc = Encoders.product[Chg]
    implicit val lEnc = Encoders.product[Latest]
    implicit val kEnc =
      Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
    graft.Tables.normalizeTs(events)
      .select(col("user_id").cast("long").as("user_id"),
        col("event_type"), col("ts_us"),
        col("event_id").cast("long").as("event_id"), col("value"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .as[Chg]
      .groupByKey(c => (c.user_id, c.event_type))
      .flatMapGroupsWithState(OutputMode.Update(),
        GroupStateTimeout.NoTimeout())(updateKey)
  }

  /** File-source streaming run into a memory sink (used by tests). */
  def run(spark: org.apache.spark.sql.SparkSession, dir: String,
          queryName: String): org.apache.spark.sql.streaming.StreamingQuery =
    latest(
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

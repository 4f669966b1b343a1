package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode, StreamingQuery}

/** STREAMING exact deduplication — redelivery suppression, the
  * at-least-once ingestion guard every event pipeline runs in front of
  * its sink (Kafka redeliveries, producer retries, backfill overlap all
  * surface as the same key arriving twice).
  *
  * Keyed state per event id remembers whether the key has been emitted;
  * the first arrival ships (with the micro-batch's earliest timestamp if
  * several deliveries land together), every later delivery is swallowed.
  * State is one boolean-sized entry per distinct key — production
  * deployments bound it by time with a watermark TTL (the
  * dropDuplicatesWithinWatermark contract); here NoTimeout keeps the
  * batch-mode run exactly deterministic.
  *
  * In BATCH mode (flatMapGroupsWithState over a bounded Dataset) each
  * key's full delivery history arrives as one group, so `n_deliveries`
  * is the true delivery count and the output is fully deterministic —
  * that run carries the family's CORRECTNESS row (the qSessionizeStateful
  * move). In STREAM mode the count only covers the key's first
  * micro-batch (later deliveries are suppressed without re-emission —
  * Append mode cannot revise a shipped row); the suppression SET and
  * kept timestamps are exact in both modes, and the parity spec pins
  * them equal.
  */
object DedupStream {

  case class Delivery(event_id: Long, ts_us: Long)
  case class Kept(event_id: Long, kept_ts_us: Long, n_deliveries: Long,
                  was_redelivered: Boolean)

  /** First-wins state step: emit once per key, earliest ts first. */
  def keptStep(key: Long, rows: Iterator[Delivery],
               state: GroupState[Boolean]): Iterator[Kept] = {
    if (state.exists) { rows.foreach(_ => ()); Iterator.empty }
    else {
      var n = 0L
      var minTs = Long.MaxValue
      rows.foreach { d => n += 1; if (d.ts_us < minTs) minTs = d.ts_us }
      state.update(true)
      Iterator.single(Kept(key, minTs, n, n > 1))
    }
  }

  /** The keyed-state dedup, mode-agnostic up to the state op. */
  def kept(deliveries: DataFrame): DataFrame = {
    val spark = deliveries.sparkSession
    import spark.implicits._
    deliveries.select(col("event_id").cast("long").as("event_id"),
        col("ts_us").cast("long").as("ts_us"))
      .as[Delivery]
      .groupByKey(_.event_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(keptStep)
      .toDF()
  }

  /** Memory-sink stream for the parity spec. */
  def dedupStream(deliveries: DataFrame,
                  queryName: String): StreamingQuery =
    kept(deliveries)
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("append")
      .start()
}

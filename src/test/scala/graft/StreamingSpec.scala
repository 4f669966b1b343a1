package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventsStream

class StreamingSpec extends AnyFunSuite with SharedSpark {

  test("streaming hourly agg equals the batch plan") {
    val q = EventsStream.hourlyStream(spark, SfDir, "ev_hourly_test")
    try {
      q.processAllAvailable()
      val streamed = spark.table("ev_hourly_test")
        .select("event_type", "hour", "n_events", "sum_value")
      val batch = EventsStream.hourlyAgg(Tables.load(spark, SfDir, "events"))
        .select("event_type", "hour", "n_events", "sum_value")
      assert(streamed.count() > 0)
      assert(streamed.exceptAll(batch).count() === 0)
      assert(batch.exceptAll(streamed).count() === 0)
    } finally q.stop()
  }

  test("stateful streaming sessionization matches the batch sessionizer") {
    import graft.streaming.SessionStream
    val q = SessionStream.run(spark, SfDir, "sess_test")
    try {
      q.processAllAvailable()
      // update mode re-emits per batch; keep the last row per user
      val streamed = spark.table("sess_test")
        .groupBy("user_id")
        .agg(max("n_sessions").as("n_sessions"), max("n_events").as("n_events"))
      val batch = graft.queries.EventQueries.qSessionize(spark, SfDir)
        .groupBy("user_id")
        .agg(max("sess_idx").as("n_sessions"),
          sum("n_events").as("n_events"))
      assert(streamed.count() > 0)
      assert(streamed.exceptAll(batch).count() === 0)
      assert(batch.exceptAll(streamed).count() === 0)
    } finally q.stop()
  }

  test("stream-stream interval join equals the batch interval join") {
    val q = EventsStream.intervalJoinStream(spark, SfDir, "ivj_test")
    try {
      q.processAllAvailable()
      val streamed = spark.table("ivj_test")
        .select("user_id", "view_id", "click_id", "gap_us")
      val batch = graft.queries.EventQueries
        .qEventIntervalJoin(spark, SfDir)
        .select("user_id", "view_id", "click_id", "gap_us")
      assert(streamed.count() > 0)
      assert(streamed.exceptAll(batch).count() === 0)
      assert(batch.exceptAll(streamed).count() === 0)
    } finally q.stop()
  }

  test("streaming dedup emits at most one row per key") {
    val q = EventsStream.dedupStream(spark, SfDir, "dedup_test")
    try {
      q.processAllAvailable()
      val out = spark.table("dedup_test")
      assert(out.count() > 0)
      val dups = out.groupBy("user_id", "event_type")
        .count().filter(col("count") > 1).count()
      assert(dups === 0)
    } finally q.stop()
  }
}

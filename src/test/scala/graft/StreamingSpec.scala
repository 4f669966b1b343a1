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
}

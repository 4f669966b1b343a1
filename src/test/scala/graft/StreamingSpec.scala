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

  test("stream-static enrichment join equals the batch join") {
    val q = EventsStream.enrichStream(spark, SfDir, "ev_enrich_test")
    try {
      q.processAllAvailable()
      val streamed = spark.table("ev_enrich_test")
        .select("segment", "event_type", "n_events", "sum_value")
      val batch = EventsStream.enrichAgg(
          Tables.load(spark, SfDir, "events"),
          EventsStream.customerDim(spark, SfDir))
        .select("segment", "event_type", "n_events", "sum_value")
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

  test("native MinHashSig equals the shuffle-based signature pipeline") {
    import graft.operators.Dedup
    val docs = Tables.load(spark, SfDir, "documents")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val native = docs.select(col("doc_id"),
      graft.functions.MinHashSig(col("text"), 5, 64).as("sig"))
      .filter(col("sig").isNotNull)
    val shuffle = Dedup.minhashSignatures(docs, 5, 64)
    assert(native.count() > 0)
    assert(native.exceptAll(shuffle).count() === 0)
    assert(shuffle.exceptAll(native).count() === 0)
  }

  test("row-local minhash band keys equal the shuffle-based pipeline") {
    import graft.operators.Dedup
    val docs = Tables.load(spark, SfDir, "documents")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val rowLocal = Dedup.minhashBandKeysRowLocal(docs, k = 5,
      numHashes = 64, bands = 16)
    val viaShuffle = {
      val sigs = Dedup.minhashSignatures(docs, 5, 64)
      val bandHashes = array((0 until 16).map { bi =>
        aggregate(slice(col("sig"), bi * 4 + 1, 4), lit(0L),
          (acc, m) => (acc * lit(33L) + m) % lit(2147483647L))
      }: _*)
      sigs.select(col("doc_id"), posexplode(bandHashes).as(Seq("band", "bh")))
    }
    assert(rowLocal.count() > 0)
    assert(rowLocal.exceptAll(viaShuffle).count() === 0)
    assert(viaShuffle.exceptAll(rowLocal).count() === 0)
  }

  test("streaming near-dup candidates equal the batch band-bucket join") {
    import graft.streaming.NearDupStream
    val q = NearDupStream.nearDupStream(spark, SfDir, "neardup_test")
    try {
      q.processAllAvailable()
      // orientation of (anchor, doc) depends on arrival order; compare
      // unordered candidate PAIRS per bucket against the batch equi-join
      val streamed = spark.table("neardup_test")
        .select(col("band"), col("bh"),
          least(col("anchor_id"), col("doc_id")).as("ida"),
          greatest(col("anchor_id"), col("doc_id")).as("idb"))
      val keys = graft.operators.Dedup.minhashBandKeysRowLocal(
        Tables.load(spark, SfDir, "documents")
          .select(col("doc_id").cast("long").as("doc_id"), col("text")),
        k = 5, numHashes = 64, bands = 16)
      val a = keys.select(col("band"), col("bh"), col("doc_id").as("ida"))
      val b = keys.select(col("band"), col("bh"), col("doc_id").as("idb"))
      // batch: every unordered pair sharing a bucket, anchored anywhere
      val batch = a.join(b, Seq("band", "bh"))
        .filter(col("ida") < col("idb"))
      assert(streamed.count() > 0)
      // streamed pairs all tie back to a shared bucket...
      assert(streamed.exceptAll(batch).count() === 0)
      // ...and every bucket with >= 2 docs produced >= its size - 1 pairs:
      // the streamed pair count per bucket is exactly n - 1 (one anchor)
      val bucketSizes = keys.groupBy("band", "bh")
        .agg(count(lit(1)).as("n")).filter(col("n") >= 2)
      val streamedCounts = streamed.groupBy("band", "bh")
        .agg(count(lit(1)).as("c"))
      val mismatched = bucketSizes.join(streamedCounts, Seq("band", "bh"),
          "left")
        .filter(coalesce(col("c"), lit(0L)) =!= col("n") - 1)
      assert(mismatched.count() === 0)
      // the deterministic batch twin (q_neardup_anchor's operator) hits
      // exactly the same buckets with the same per-bucket pair counts —
      // only anchor CHOICE (min id vs first arrival) may differ, so pair
      // sets can diverge in >= 3-member buckets but counts cannot
      val twin = graft.streaming.NearDupStream.candidatePairsBatch(
        Tables.load(spark, SfDir, "documents")
          .select(col("doc_id").cast("long").as("doc_id"), col("text")),
        k = 5, numHashes = 64, bands = 16)
        .groupBy("band", "bh").agg(count(lit(1)).as("tc"))
      val diverged = twin.join(streamedCounts, Seq("band", "bh"), "full")
        .filter(coalesce(col("tc"), lit(0L)) =!=
          coalesce(col("c"), lit(0L)))
      assert(diverged.count() === 0)
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

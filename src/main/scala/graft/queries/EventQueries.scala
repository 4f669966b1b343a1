package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.streaming.EventsStream

/** Event-stream queries (SURVEY.md §2 rows 39-40): windowed aggregation
  * (batch twin of the streaming path) and gap-based sessionization.
  * All time arithmetic stays in exact epoch-micros integer space
  * (`ts_us`, normalized at the Tables.eventsUs boundary); DuckDB
  * mirrors via epoch_us(ts).
  */
object EventQueries {

  /** Session gap: 30 minutes, in micros. Session math runs at microsecond
    * resolution — DuckDB timestamps are µs-precision, so whatever the
    * parquet encoding, both sides agree at micros exactly. */
  private val GapUs = 30L * 60 * 1000000L

  /** Events normalized to the `ts_us` long-micros contract
    * (Tables.eventsUs) — the one boundary that absorbs the driver's
    * physical ts encoding (ns INT64 through r8, µs TIMESTAMP_NTZ from
    * r9). DuckDB oracles mirror with epoch_us(ts)/epoch_ns(ts), both
    * timestamp-native. */
  private def events(spark: SparkSession, dir: String): DataFrame =
    Tables.eventsUs(spark, dir)

  def qEventsWindowed(spark: SparkSession, dir: String): DataFrame =
    EventsStream.hourlyAgg(events(spark, dir))

  /** View-to-click interval join: every click by the same user within 30
    * minutes after a view. One transform shared with the streaming path
    * (EventsStream.intervalJoin) — batch here, watermarked stream-stream
    * join there. The join is a user_id hash equi-join with a range
    * predicate; all time arithmetic in exact integer micros. */
  def qEventIntervalJoin(spark: SparkSession, dir: String): DataFrame =
    EventsStream.intervalJoin(
      events(spark, dir).select(col("event_id"), col("user_id"),
        col("event_type"), col("ts_us").as("tus")))

  /** LEFT OUTER interval join (batch twin of the watermarked streaming
    * form) — non-conversion as a first-class output row. */
  def qEventIntervalOuter(spark: SparkSession, dir: String): DataFrame =
    EventsStream.intervalJoinOuter(
      events(spark, dir).select(col("event_id"), col("user_id"),
        col("event_type"), col("ts_us").as("tus")))

  /** Gap-based sessionization: a new session starts after >30 min of user
    * inactivity. One shuffle on user_id (window), one on (user_id,
    * session) for the rollup — at scale both are the same hash key family.
    */
  def qSessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    events(spark, dir)
      .select(col("event_id"), col("ts_us"),
        col("user_id"), col("event_type"), col("value"))
      .withColumn("prev_ts", lag("ts_us", 1).over(byUser))
      .withColumn("new_sess",
        (col("prev_ts").isNull || col("ts_us") - col("prev_ts") > GapUs)
          .cast("long"))
      .withColumn("sess_idx",
        sum("new_sess").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "sess_idx")
      .agg(
        count(lit(1)).as("n_events"),
        min("ts_us").as("start_us"),
        max("ts_us").as("end_us"),
        ((max("ts_us") - min("ts_us")) / lit(1000000L)).as("dur_sec"),
        round(sum("value"), 4).as("sum_value"))
  }

  /** Stream-static enrichment (EventsStream.enrichAgg): events joined
    * to the customer-segment dimension broadcast-side, rolled up per
    * (segment, event_type) — the same transform the streaming parity
    * spec drives through a file-source stream. */
  def qEventEnrich(spark: SparkSession, dir: String): DataFrame =
    EventsStream.enrichAgg(events(spark, dir),
      EventsStream.customerDim(spark, dir))

  /** Event-lateness profile — the measurement a watermark delay is
    * actually SIZED from: within each user's stream (event_id = arrival
    * order), lateness = running-max(event time) − event time, i.e. how
    * far behind the high-water mark each event arrives; rolled into a
    * fixed bucket histogram per event_type (on-time / <1 min / <10 min /
    * <1 h / ≥1 h). Pick the watermark at the bucket that catches the
    * tail you're willing to wait for — guessing it instead is how
    * streaming pipelines silently drop data. The synthetic feed arrives
    * perfectly ordered, so arrival order carries a PLANTED deterministic
    * delivery jitter (event_id mod 7 steps of 2 min — the
    * unicode/deflate/CSV planting move) or every bucket would read zero
    * and the histogram path would go untested. One window per user (the
    * key the stream is already partitioned by) + one map-side-combined
    * histogram aggregate; exact integer micros. */
  def qLatenessProfile(spark: SparkSession, dir: String): DataFrame = {
    val late = events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts_us"))
      .withColumn("arrival_us",
        col("ts_us") + pmod(col("event_id"), lit(7L)) * 120000000L)
      .withColumn("late_us",
        max("ts_us").over(Window.partitionBy("user_id")
          .orderBy("arrival_us", "event_id")
          .rowsBetween(Window.unboundedPreceding, 0)) - col("ts_us"))
    val b = col("late_us")
    late.groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(when(b === 0L, 1L).otherwise(0L)).as("on_time"),
        sum(when(b > 0L && b <= 60000000L, 1L).otherwise(0L))
          .as("late_1m"),
        sum(when(b > 60000000L && b <= 600000000L, 1L).otherwise(0L))
          .as("late_10m"),
        sum(when(b > 600000000L && b <= 3600000000L, 1L).otherwise(0L))
          .as("late_1h"),
        sum(when(b > 3600000000L, 1L).otherwise(0L)).as("late_over_1h"),
        max(b).as("max_late_us"))
  }

  /** Gap sessionization through Spark's NATIVE session_window — the
    * built-in beside row 45's hand-rolled lag+running-sum form, kept as
    * an independent implementation PAIR (prefer the built-in when it
    * exists; keep the portable form as its cross-check). Boundary
    * semantics differ by definition and the oracle encodes the native
    * rule: session_window merges while next.ts < prev.ts + gap (the
    * [ts, ts+gap) windows must OVERLAP), so an exactly-gap-sized pause
    * STARTS a session here where the hand-rolled `> gap` form keeps it.
    * Same one-shuffle plan (hash on user_id, sessions assembled inside
    * the aggregate). */
  def qSessionizeNative(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(col("user_id"),
        session_window(timestamp_micros(col("ts_us")), "30 minutes")
          .as("w"))
      .agg(count(lit(1)).as("n_events"), min("ts_us").as("start_us"),
        max("ts_us").as("end_us"),
        round(sum("value"), 4).as("sum_value"))
      .select(col("user_id"), col("start_us"), col("end_us"),
        ((col("end_us") - col("start_us")) / lit(1000000L))
          .as("dur_sec"),
        col("n_events"), col("sum_value"))

  /** The STATEFUL sessionizer (streaming.SessionStream) run in batch
    * mode — flatMapGroupsWithState over a bounded Dataset processes each
    * user's full history in one group, so the final state equals what
    * the unbounded stream would hold after draining the same events.
    * Session totals depend only on sorted timestamps (ties cannot flip
    * a gap), so the output is deterministic and oracle-checkable: this
    * makes the streaming component a first-class CORRECTNESS row, not
    * just a parity spec. */
  def qSessionizeStateful(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.SessionStream.sessionCounts(events(spark, dir)).toDF()

  /** Streaming windowed HLL cardinality run in batch mode — the sketch
    * family's streaming face (streaming.HllStream): distinct users per
    * hour from a keyed register file whose per-slot MAX merge is
    * commutative/associative/idempotent, so stream and batch registers
    * are bit-identical (stronger than the ordering-caveated dedup/CDC
    * parities). Exact distinct rides in state as the verification
    * column; production keeps only the 512-byte registers. */
  def qStreamHll(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.HllStream.windowCards(events(spark, dir))

  /** The event feed with PLANTED at-least-once redeliveries: every 13th
    * event id arrives a second time 300 s later — the producer-retry /
    * backfill-overlap hazard exact stream dedup exists for. Shared by
    * the batch correctness row and the streaming parity spec. */
  private[graft] def redeliveredFeed(spark: SparkSession,
                                     dir: String): DataFrame = {
    val ev = events(spark, dir)
      .select(col("event_id").cast("long").as("event_id"), col("ts_us"))
    ev.unionByName(ev.filter(col("event_id") % 13 === 2)
      .select(col("event_id"), (col("ts_us") + 300000000L).as("ts_us")))
  }

  /** Streaming exact dedup (redelivery suppression) run in batch mode —
    * streaming.DedupStream's keyed first-wins state step over the
    * planted redelivery feed; each key's full history lands in one
    * group, so kept timestamp AND true delivery count are deterministic
    * (see DedupStream's scaladoc for the stream-mode caveat the parity
    * spec pins). State is O(distinct keys); at 100 TB the watermark TTL
    * variant bounds it by time instead. */
  def qStreamDedup(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.DedupStream.kept(redeliveredFeed(spark, dir))

  /** view -> click -> purchase funnel per user: earliest view, earliest
    * click after it, earliest purchase after that. Three conditional-min
    * aggregations on the same user_id shuffle key; exact integer micros.
    */
  def qFunnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts_us"))
    val tv = ev.groupBy("user_id")
      .agg(min(when(col("event_type") === "view", col("ts_us"))).as("tv"))
    val tc = ev.join(tv, "user_id")
      .groupBy("user_id")
      .agg(min(when(col("event_type") === "click" && col("ts_us") > col("tv"),
        col("ts_us"))).as("tc"))
    val tp = ev.join(tc, "user_id")
      .groupBy("user_id")
      .agg(min(when(col("event_type") === "purchase" && col("ts_us") > col("tc"),
        col("ts_us"))).as("tp"))
    tv.join(tc, "user_id").join(tp, "user_id")
      .select(col("user_id"), col("tv"), col("tc"), col("tp"),
        (when(col("tp").isNotNull, 3)
          .when(col("tc").isNotNull, 2)
          .when(col("tv").isNotNull, 1)
          .otherwise(0)).cast("long").as("stage"))
  }

  /** PageRank over the page-transition graph (the URL-quality signal a
    * web-corpus curation pipeline weights documents by — CommonCrawl
    * rank lists are built this way). Pages are pseudo-URLs
    * (event_id % 97); edges are each user's consecutive page visits
    * (lead window per user — bounded per-key volume), aggregated to
    * weighted transitions. Five power iterations of
    * r'(v) = 0.15/N + 0.85 * Σ r(u)·w(u,v)/out(u): each iteration is
    * ONE equi-join + ONE aggregate on the edge table (AQE broadcasts
    * the rank table while it is small; at web scale the same plan is a
    * shuffle join on src — no driver-side graph state either way). All
    * math in IEEE doubles with explicit double literals (the oracle
    * CASTs 0.85 to DOUBLE — DuckDB would otherwise use exact DECIMAL),
    * final rank rounded to 6. */
  def qPagerank(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("event_id")
    val seq = events(spark, dir)
      .select(col("user_id"), col("event_id"),
        (col("event_id") % 97).as("p"))
      .withColumn("np", lead("p", 1).over(byUser))
    val ed = seq
      .filter(col("np").isNotNull && col("np") =!= col("p"))
      .groupBy(col("p").as("src"), col("np").as("dst"))
      .agg(count(lit(1)).as("w"))
    // eps = 0: exactly 5 power iterations, the fixed-hop form the DuckDB
    // oracle replays hop by hop. The data-driven convergence stop (the
    // web-scale form) is the same operator with eps > 0 — covered by the
    // OperatorsSpec convergence test.
    graft.operators.PageRank.pageRank(ed, eps = 0.0, maxIters = 5)
      .select(col("p").cast("long").as("page"),
        round(col("r"), 6).as("rank"))
  }

  /** Semi-structured extraction: pull the integer field out of the
    * events table's JSON `props` column (the JSONL-corpus shape) —
    * row-local codegen'd path extraction, no UDF; every extraction is
    * pinned by the per-row output. */
  def qJsonExtract(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(col("event_id").cast("long").as("event_id"),
        col("event_type"),
        get_json_object(col("props"), "$.k").as("k_raw"))
      // has_k tests the RAW extraction (field present), matching the
      // oracle's json_extract IS NOT NULL — testing after the long cast
      // would report false for a present-but-non-numeric field while
      // the oracle reports true.
      .withColumn("has_k", col("k_raw").isNotNull)
      .withColumn("k", col("k_raw").cast("long"))
      .withColumn("k_bucket", col("k") % 10)
      .select("event_id", "event_type", "k", "k_bucket", "has_k")

  /** Weekly cohort retention — the product-analytics staple: cohort =
    * the user's first-activity week, retention = fraction of the cohort
    * active again k weeks later. Three stages on the SAME user_id hash
    * key family (distinct user-weeks, per-user min, join-back), then a
    * tiny (cohort, offset) rollup — at 100 TB every wide stage
    * co-partitions on user_id and the final aggregate is bounded by
    * weeks², not events. All time math in exact integer micros
    * (week = us DIV 604800000000). */
  def qRetention(spark: SparkSession, dir: String): DataFrame = {
    val uw = events(spark, dir)
      .select(col("user_id").cast("long").as("user_id"),
        expr("ts_us DIV 604800000000").as("week"))
      .distinct()
    val cohort = uw.groupBy("user_id").agg(min("week").as("cw"))
    val cohortSize = cohort.groupBy("cw").agg(count(lit(1)).as("cohort_n"))
    uw.join(cohort, "user_id")
      .groupBy(col("cw"), (col("week") - col("cw")).as("wk_off"))
      .agg(count(lit(1)).as("n_users"))
      .join(cohortSize, "cw")
      .select(col("cw"), col("wk_off"), col("n_users"), col("cohort_n"),
        round(col("n_users").cast("double")
          / col("cohort_n").cast("double"), 4).as("retention"))
  }

  /** AS-OF (point-in-time) join — the temporal operator Spark has no
    * native form of: every click matched to the LATEST view by the same
    * user at-or-before the click's time. kdb/Flink/QuestDB ship this as
    * a primitive; DuckDB's native ASOF JOIN is the oracle.
    *
    * NOT a range join: the naive form (equi-join on user + ts filter +
    * max-per-click) explodes clicks x all-prior-views before pruning —
    * quadratic per heavy user. This is the union+ordered-window form:
    * tag both sides, ONE shuffle on user_id, sort by (ts, side) within
    * the partition, and a running last_value(ignoreNulls) carries the
    * most recent view forward — each row costs O(1), ties at equal ts
    * resolve view-before-click (kind 0 < 1) matching ASOF's inclusive
    * <=. Views are pre-deduped to max event_id per (user, ts) so the
    * anchor is deterministic on both engines. At 100 TB this is a
    * sort-merge within user partitions — the same shape a stream-table
    * temporal join compiles to. */
  def qAsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts_us"))
    val views = ev.filter(col("event_type") === "view")
      .groupBy("user_id", "ts_us").agg(max("event_id").as("id"))
      .select(col("user_id"), col("ts_us"), col("id"),
        lit(0).as("kind"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_us"), col("event_id").as("id"),
        lit(1).as("kind"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_us"), col("kind"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    views.unionAll(clicks)
      .withColumn("view_id",
        last(when(col("kind") === 0, col("id")), ignoreNulls = true)
          .over(w))
      .withColumn("view_ts",
        last(when(col("kind") === 0, col("ts_us")), ignoreNulls = true)
          .over(w))
      .filter(col("kind") === 1 && col("view_id").isNotNull)
      .select(col("id").as("click_id"), col("user_id"),
        col("ts_us").as("click_ts_us"), col("view_id"),
        col("view_ts").as("view_ts_us"),
        (col("ts_us") - col("view_ts")).as("lag_us"))
  }

  /** Marketing attribution (first / last / linear touch) — the
    * warehouse op beside the as-of join: every purchase attributed to
    * the view/click touches of the same user within a 7-day lookback.
    * Last-touch alone is the as-of join (row 90); first-touch and the
    * linear weight need the WINDOWED touch set, so the shape here is
    * the bounded range join: purchases equi-join touches on user_id
    * with the exact-integer-micros range predicate, then ONE k=1
    * bounded-heap per direction (earliest by (ts, id), latest by
    * (-ts, id)) and a count — never a per-user sort, fan-out bounded
    * by a user's touches in one week (the key any real event store is
    * already hash-distributed on). Purchases with no touch in the
    * window survive with n_touches = 0 (left join). */
  def qAttribution(spark: SparkSession, dir: String): DataFrame = {
    val LookbackUs = 7L * 86400L * 1000000L
    val ev = events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts_us"))
      .localCheckpoint() // purchase side + touch side
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts_us").as("p_us"))
    val touches = ev
      .filter(col("event_type") === "view" ||
        col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("t_id"),
        col("ts_us").as("t_us"))
    val joined = purchases.join(touches, Seq("user_id"))
      .filter(col("t_us") <= col("p_us") &&
        col("t_us") > col("p_us") - LookbackUs)
    val agg = joined.groupBy("user_id", "purchase_id", "p_us")
      .agg(count(lit(1)).as("n_touches"),
        graft.functions.TopKAgg(col("t_us").cast("double"),
          col("t_id"), col("t_id"), 1).as("tf"),
        graft.functions.TopKAgg(-col("t_us").cast("double"),
          col("t_id"), col("t_id"), 1).as("tl"))
      .select(col("user_id"), col("purchase_id"), col("p_us"),
        col("n_touches"),
        element_at(col("tf"), 1).getField("payload").as("first_id"),
        element_at(col("tf"), 1).getField("key").cast("long")
          .as("first_us"),
        element_at(col("tl"), 1).getField("payload").as("last_id"),
        (-element_at(col("tl"), 1).getField("key")).cast("long")
          .as("last_us"))
    purchases.join(agg,
        Seq("user_id", "purchase_id", "p_us"), "left")
      .select(col("user_id"), col("purchase_id"),
        col("p_us").as("purchase_us"),
        coalesce(col("n_touches"), lit(0L)).as("n_touches"),
        col("first_id"), col("first_us"), col("last_id"), col("last_us"),
        when(col("n_touches").isNotNull,
          round(lit(1.0) / col("n_touches").cast("double"), 6))
          .as("linear_weight"))
  }

  /** SCD type-2 dimension build — the CDC/warehouse primitive: collapse
    * each user's attribute observations (props.k, the "segment" field)
    * into versioned validity intervals [eff_from_us, eff_to_us) with an
    * is_current flag. Run-length encoding by ordered change detection:
    * one window pass flags changes (lag), a running sum numbers the
    * versions, a per-(user, version) aggregate collapses runs, and a
    * second window derives eff_to as the next version's start. Every
    * stage partitions on user_id — ONE hash family end to end, so at
    * 100 TB this is a single shuffle reused by window -> agg -> window
    * (the version window is a cheap re-sort within the same partitions).
    * Exact integer micros throughout; ties broken by event_id. */
  def qScd2(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val obs = events(spark, dir)
      .select(col("user_id"), col("ts_us"), col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .filter(col("k").isNotNull)
    val runs = obs
      .withColumn("prev_k", lag("k", 1).over(byUser))
      .withColumn("chg",
        (col("prev_k").isNull || col("k") =!= col("prev_k")).cast("long"))
      .withColumn("version",
        sum("chg").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    val byVersion = Window.partitionBy("user_id").orderBy("version")
    runs.groupBy("user_id", "version")
      // k is constant within a run (a change starts a new version), so
      // min(k) IS the run's value — no struct-min needed
      .agg(min("k").as("k"),
        min("ts_us").as("eff_from_us"),
        count(lit(1)).as("n_obs"))
      .withColumn("eff_to_us", lead("eff_from_us", 1).over(byVersion))
      .withColumn("is_current", col("eff_to_us").isNull)
  }

  /** Per-key anomaly detection — flag events whose value is > 2
    * population standard deviations from its event_type's mean (the
    * telemetry-outlier sweep a pipeline runs before trusting a crawl's
    * metadata). Determinism engineering: values are exact integer cents
    * (2-decimal doubles x100, round half-up identical on both engines
    * for positive values), the per-type moments are EXACT long sums
    * (n, sum_c, sum_c2 — no FP accumulation-order hazard), and z is one
    * fixed IEEE formula over those integers, identical in Spark and
    * DuckDB. Plan: one map-side-combined aggregate to ~|event_type|
    * rows, broadcast back over the scan — one shuffle of 5 rows, the
    * outlier filter itself is map-only. At 100 TB the stats frame stays
    * tiny regardless of corpus size. */
  def qEventAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .select(col("event_id").cast("long").as("event_id"),
        col("event_type"),
        round(col("value") * 100, 0).cast("long").as("cents"))
    val stats = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum("cents").as("sum_c"),
        sum(col("cents") * col("cents")).as("sum_c2"))
      .withColumn("mean_c",
        col("sum_c").cast("double") / col("n").cast("double"))
      .withColumn("var_c",
        col("sum_c2").cast("double") / col("n").cast("double")
          - col("mean_c") * col("mean_c"))
      .filter(col("var_c") > 0)
      .select(col("event_type"), col("mean_c"), col("var_c"))
    ev.join(broadcast(stats), "event_type")
      .withColumn("z",
        (col("cents").cast("double") - col("mean_c")) / sqrt(col("var_c")))
      .filter(abs(col("z")) > 2.0)
      .select(col("event_id"), col("event_type"), col("cents"),
        round(col("z"), 6).as("z"))
  }

  /** CDC compaction (latest-by-key) — the single most common pipeline
    * materialization: reduce an append-only change stream to the newest
    * record per (user_id, event_type). One shuffle + in-partition sort
    * (window row_number over ts desc), the plan Delta MERGE compaction
    * and every "current state" view run at 100 TB; ties broken by
    * event_id so the survivor is deterministic. */
  def qLatestByKey(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts_us").desc, col("event_id").desc)
    events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts_us"),
        col("event_id"), col("value"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  // ------------------------------------------------ temporal split + embargo

  private val SplitCutUs = 1705881600000000L // 2024-01-22T00:00:00Z
  private val EmbargoUs = 2L * 86400L * 1000000L // 2-day purge gap

  /** Temporal train/eval split with an EMBARGO gap — the fourth classic
    * split beside hash (row 61), stratified and dedup-aware (147), and
    * the only correct one for forecasting-shaped tasks: eval must be
    * strictly FUTURE of train, and the purge gap between them absorbs
    * boundary leakage through lagged features and spilled sessions
    * (the purged-CV rule from the time-series literature). Events in
    * [cut, cut+gap) belong to NEITHER side — dropped by contract, and
    * counted, because silently losing data is how embargoes rot.
    *
    * The split itself cannot block USER overlap (the same user on both
    * sides is fine for event-level models, leakage for user-level
    * ones) — so the audit measures it instead of hiding it:
    * `users_both` broadcast back beside the per-side counts. One scan,
    * two bounded aggregates (1 row; n_users rows map-side combined). */
  def qSplitTemporal(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir)
      .select(col("event_id").cast("long").as("event_id"),
        col("user_id").cast("long").as("user_id"), col("ts_us"))
      .withColumn("split",
        when(col("ts_us") < SplitCutUs, lit("train"))
          .when(col("ts_us") < SplitCutUs + EmbargoUs, lit("embargo"))
          .otherwise(lit("eval")))
      .localCheckpoint()
    val m = e.agg(
      sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
      sum(when(col("split") === "embargo", 1L).otherwise(0L))
        .as("n_embargo"),
      sum(when(col("split") === "eval", 1L).otherwise(0L)).as("n_eval"),
      countDistinct(when(col("split") === "train", col("user_id")))
        .as("users_train"),
      countDistinct(when(col("split") === "eval", col("user_id")))
        .as("users_eval"))
    val ub = e.groupBy("user_id")
      .agg(max(when(col("split") === "train", 1L).otherwise(0L)).as("t"),
        max(when(col("split") === "eval", 1L).otherwise(0L)).as("v"))
      .agg(sum(col("t") * col("v")).as("users_both"))
    e.crossJoin(broadcast(m)).crossJoin(broadcast(ub))
  }

  // ------------------------------------------------- token-bucket limiter

  private[graft] val RatePeriodUs = 6L * 3600L * 1000000L // 1 token / 6 h
  private[graft] val RateCapUs = 2L * RatePeriodUs        // burst of 2

  /** Per-user token-bucket rate limiting — the admission-control staple
    * every ingestion edge runs (API quotas, crawl politeness, abuse
    * throttling): a bucket of CAP tokens refilling at 1/PERIOD, spend
    * one per event, reject when empty. Integer-exact by keeping tokens
    * in MICROSECONDS of refill (capacity = 2 periods), so the clamp
    * recurrence t' = min(cap, t + Δt) − P·accept replays identically
    * in both engines. The batch form folds each user's time-ordered
    * events with ONE aggregate HOF over the collected array — state is
    * two longs, per-key history is the same bounded-array assumption
    * sessionization makes; the streaming twin
    * ([[graft.streaming.RateLimitStream]]) carries the identical
    * recurrence across micro-batches in flatMapGroupsWithState,
    * parity-pinned by spec. Tuned so the limiter BITES on this corpus:
    * 88.5% accepted / 1153 throttled at sf0.01 (cap 3/1-per-4h would
    * read 99% — a limiter that never fires tests nothing). */
  def qRateLimit(spark: SparkSession, dir: String): DataFrame = {
    val outT = "array<struct<event_id:bigint,ts_us:bigint," +
      "accepted:boolean,tok_us:bigint>>"
    val evs = events(spark, dir)
      .select(col("user_id").cast("long").as("user_id"), col("ts_us"),
        col("event_id").cast("long").as("event_id"))
      .groupBy("user_id")
      .agg(sort_array(collect_list(struct(col("ts_us"), col("event_id"))))
        .as("evs"))
    val folded = evs.select(col("user_id"), aggregate(
      col("evs"),
      struct(lit(RateCapUs).as("tok"), lit(-1L).as("last"),
        expr(s"CAST(array() AS $outT)").as("out")),
      (acc, x) => {
        val delta = when(acc("last") === -1L, lit(0L))
          .otherwise(x("ts_us") - acc("last"))
        val t1 = least(lit(RateCapUs), acc("tok") + delta)
        val ok = t1 >= RatePeriodUs
        val t2 = when(ok, t1 - RatePeriodUs).otherwise(t1)
        struct(t2.as("tok"), x("ts_us").as("last"),
          concat(acc("out"), array(struct(
            x("event_id").as("event_id"), x("ts_us").as("ts_us"),
            ok.as("accepted"), t2.as("tok_us")))).as("out"))
      },
      acc => acc("out")).as("out"))
      .select(col("user_id"), explode(col("out")).as("r"))
      .select(col("user_id"), col("r.event_id").as("event_id"),
        col("r.ts_us").as("ts_us"), col("r.accepted").as("accepted"),
        col("r.tok_us").as("tok_us"))
      .localCheckpoint() // rows + the throttle marginal
    val m = folded.agg(count(lit(1)).as("n_total"),
      sum(when(!col("accepted"), 1L).otherwise(0L)).as("n_throttled"))
    folded.crossJoin(broadcast(m))
  }

  /** CIDR longest-prefix-match IP enrichment (SURVEY §2 row 219, r17)
    * — the routing-table join every crawl/event pipeline runs to tag
    * traffic with its AS/geo block, and a textbook case of a join
    * relational engines can't express directly (the match key is "the
    * LONGEST prefix of ip present in the table", not an equality).
    * The scale shape is the standard one: the routing table is
    * dimension-sized → BROADCAST; the probe side expands each ip once
    * per prefix LENGTH in use (bounded by construction: lengths 8..24
    * here, ≤ 33 ever — a fixed fan-out, not a range join), equi-joins
    * on (masked_ip, len), and keeps the longest match per event with
    * one bounded-struct max (no window). Synthesized deterministic
    * table: supplier s → prefix length 8 + s%17, base = LCG(s) masked;
    * ip = Knuth-mix(user_id) mod 2^32. All INTEGER arithmetic
    * (mask = ip - ip % 2^(32-len)) so the oracle replays exactly.
    * Output: matched events per (asn, plen) + one unmatched row
    * (asn = -1). */
  def qIpLpmEnrich(spark: SparkSession, dir: String): DataFrame = {
    val P32 = 4294967296L
    val rt0 = Tables.load(spark, dir, "supplier")
      .select(col("s_suppkey").cast("long").as("asn"))
      .withColumn("plen", lit(8L) + pmod(col("asn"), lit(17L)))
      .withColumn("base",
        pmod(col("asn") * 1103515245L + 12345L, lit(P32)))
      .withColumn("pfx", col("base") - pmod(col("base"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(32 - plen AS INT))")))
    // two suppliers can land on the same (pfx, plen): keep min asn so
    // the table is a function of its key (deterministic both sides)
    val rt = rt0.groupBy("pfx", "plen").agg(min("asn").as("asn"))
    val ev = Tables.load(spark, dir, "events")
      .select(col("event_id").cast("long").as("event_id"),
        pmod(col("user_id").cast("long") * 2654435761L, lit(P32))
          .as("ip"))
    // fixed fan-out: one probe row per length IN USE (8..24 by
    // construction — lengths are part of the table's contract, so no
    // collect is needed to learn them)
    val probe = ev.select(col("event_id"), col("ip"),
      explode(array((8 to 24).map(l => lit(l.toLong)): _*)).as("plen"))
      .withColumn("pfx", col("ip") - pmod(col("ip"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(32 - plen AS INT))")))
    val cand = probe.join(broadcast(rt), Seq("pfx", "plen"))
    // longest match, ties to smaller asn: max of (plen, -asn) struct
    val best = cand.groupBy("event_id")
      .agg(max(struct(col("plen"), (-col("asn")).as("nasn"))).as("m"))
      .select(col("event_id"), col("m.plen").as("plen"),
        (-col("m.nasn")).as("asn"))
    val matched = best.groupBy("asn", "plen")
      .agg(count(lit(1)).as("n_events"))
    val unmatched = ev.join(best.select("event_id"),
      Seq("event_id"), "left_anti")
      .agg(count(lit(1)).as("n_events"))
      .select(lit(-1L).as("asn"), lit(0L).as("plen"), col("n_events"))
    matched.unionByName(unmatched)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ip_lpm_enrich" -> (qIpLpmEnrich _),
    "q_rate_limit" -> (qRateLimit _),
    "q_split_temporal" -> (qSplitTemporal _),
    "q_latest_by_key" -> (qLatestByKey _),
    "q_scd2_dimension" -> (qScd2 _),
    "q_event_anomaly" -> (qEventAnomaly _),
    "q_asof_join" -> (qAsofJoin _),
    "q_attribution" -> (qAttribution _),
    "q_retention" -> (qRetention _),
    "q_json_extract" -> (qJsonExtract _),
    "q_pagerank" -> (qPagerank _),
    "q_events_windowed" -> (qEventsWindowed _),
    "q_event_interval_join" -> (qEventIntervalJoin _),
    "q_event_interval_outer" -> (qEventIntervalOuter _),
    "q_sessionize" -> (qSessionize _),
    "q_sessionize_native" -> (qSessionizeNative _),
    "q_lateness_profile" -> (qLatenessProfile _),
    "q_event_enrich" -> (qEventEnrich _),
    "q_sessionize_stateful" -> (qSessionizeStateful _),
    "q_stream_dedup" -> (qStreamDedup _),
    "q_stream_hll" -> (qStreamHll _),
    "q_funnel" -> (qFunnel _))

  /** Unrolled 5-hop PageRank oracle (same edge derivation, same
    * double-cast constants, same left-join teleport form per hop). */
  private val pagerankOracle: String = {
    def hop(prev: String, out: String): String =
      s"""$out AS (
         |  SELECT nd.p,
         |    (SELECT CAST(0.15 AS DOUBLE) / n FROM nn)
         |      + CAST(0.85 AS DOUBLE)
         |        * COALESCE(inc.s, CAST(0 AS DOUBLE)) AS r
         |  FROM nodes nd LEFT JOIN (
         |    SELECT e.dst AS p, SUM(pr.r * e.w / o.outw) AS s
         |    FROM ed e
         |    JOIN $prev pr ON pr.p = e.src
         |    JOIN outd o ON o.src = e.src
         |    GROUP BY 1) inc ON inc.p = nd.p)""".stripMargin
    s"""WITH ev AS (SELECT CAST(user_id AS BIGINT) AS u,
       |              CAST(event_id AS BIGINT) AS eid,
       |              CAST(event_id % 97 AS BIGINT) AS p FROM events),
       |sq AS (SELECT u, p,
       |         LEAD(p) OVER (PARTITION BY u ORDER BY eid) AS np
       |       FROM ev),
       |ed AS (SELECT p AS src, np AS dst, COUNT(*) AS w FROM sq
       |       WHERE np IS NOT NULL AND np <> p GROUP BY 1, 2),
       |outd AS (SELECT src, CAST(SUM(w) AS DOUBLE) AS outw
       |         FROM ed GROUP BY 1),
       |nodes AS (SELECT DISTINCT p FROM
       |          (SELECT src AS p FROM ed
       |           UNION ALL SELECT dst FROM ed) q),
       |nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
       |r0 AS (SELECT p, CAST(1 AS DOUBLE) / (SELECT n FROM nn) AS r
       |       FROM nodes),
       |${hop("r0", "r1")},
       |${hop("r1", "r2")},
       |${hop("r2", "r3")},
       |${hop("r3", "r4")},
       |${hop("r4", "r5")}
       |SELECT p AS page, ROUND(r, 6) AS rank FROM r5""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    // LPM enrichment: the oracle rebuilds the identical routing table
    // and probe expansion with the same integer arithmetic and takes
    // the longest match per event via the same (plen, -asn) max
    "q_ip_lpm_enrich" ->
      """WITH rt0 AS (SELECT CAST(s_suppkey AS BIGINT) AS asn,
        |    8 + CAST(s_suppkey AS BIGINT) % 17 AS plen,
        |    (CAST(s_suppkey AS BIGINT) * 1103515245 + 12345)
        |      % 4294967296 AS base
        |  FROM supplier),
        |rt AS (SELECT pfx, plen, MIN(asn) AS asn FROM (
        |    SELECT asn, plen,
        |      base - base % (CAST(1 AS BIGINT) << CAST(32 - plen AS INT))
        |        AS pfx
        |    FROM rt0) z GROUP BY 1, 2),
        |ev AS (SELECT CAST(event_id AS BIGINT) AS event_id,
        |    (CAST(user_id AS BIGINT) * 2654435761) % 4294967296 AS ip
        |  FROM events),
        |probe AS (SELECT event_id, ip, CAST(u.l AS BIGINT) AS plen,
        |    ip - ip % (CAST(1 AS BIGINT) << CAST(32 - u.l AS INT)) AS pfx
        |  FROM ev, LATERAL (SELECT unnest(generate_series(8, 24)) AS l) u),
        |cand AS (SELECT p.event_id, p.plen, rt.asn
        |         FROM probe p JOIN rt USING (pfx, plen)),
        |best AS (SELECT event_id, plen, -nasn AS asn FROM (
        |    SELECT event_id, plen, nasn, ROW_NUMBER() OVER (
        |        PARTITION BY event_id ORDER BY plen DESC, nasn DESC)
        |        AS rn
        |    FROM (SELECT event_id, plen, -asn AS nasn FROM cand) a) b
        |  WHERE rn = 1),
        |matched AS (SELECT asn, plen, CAST(COUNT(*) AS BIGINT)
        |    AS n_events FROM best GROUP BY 1, 2),
        |unmatched AS (SELECT CAST(-1 AS BIGINT) AS asn,
        |    CAST(0 AS BIGINT) AS plen, CAST(COUNT(*) AS BIGINT)
        |      AS n_events
        |  FROM ev WHERE event_id NOT IN (SELECT event_id FROM best))
        |SELECT * FROM matched UNION ALL SELECT * FROM unmatched""".stripMargin,

    "q_stream_hll" ->
      """WITH ev AS (SELECT epoch_us(ts) // 3600000000 AS win,
        |              CAST(user_id AS BIGINT) AS u FROM events),
        |n AS (SELECT win, COUNT(*) AS n_events FROM ev GROUP BY 1),
        |hs AS (SELECT DISTINCT win,
        |         (u * 2654435761) % 2147483647 AS h FROM ev),
        |ex AS (SELECT win, COUNT(*) AS exact FROM hs GROUP BY 1),
        |rg AS (SELECT win, h % 512 AS j,
        |         MAX(CASE WHEN h // 512 = 0 THEN 23
        |             ELSE CAST(bit_count(xor(h // 512, h // 512 - 1))
        |                  AS BIGINT) END) AS m
        |       FROM hs GROUP BY 1, 2),
        |ag AS (SELECT win, COUNT(*) AS nhit,
        |         SUM(POWER(2.0, -m)) AS hsum FROM rg GROUP BY 1),
        |rw AS (SELECT ag.win, 512 - nhit AS zeros,
        |         CAST(0.7213 AS DOUBLE)
        |             / (1.0 + CAST(1.079 AS DOUBLE) / 512.0)
        |           * 512.0 * 512.0
        |           / (hsum + CAST(512 - nhit AS DOUBLE)) AS raw
        |       FROM ag),
        |es AS (SELECT win, zeros,
        |         ROUND(CASE WHEN zeros > 0
        |                     AND raw <= CAST(2.5 AS DOUBLE) * 512.0
        |           THEN 512.0 * ln(512.0 / CAST(zeros AS DOUBLE))
        |           ELSE raw END, 4) AS est
        |       FROM rw)
        |SELECT n.win, CAST(n.n_events AS BIGINT) AS n_events,
        |  CAST(ex.exact AS BIGINT) AS exact_distinct,
        |  CAST(es.zeros AS BIGINT) AS zeros, es.est AS est_distinct,
        |  ROUND(ABS(es.est - ex.exact) / ex.exact * 100.0, 2)
        |    AS err_pct
        |FROM n JOIN ex USING (win) JOIN es USING (win)""".stripMargin,

    "q_stream_dedup" ->
      """WITH ev AS (SELECT CAST(event_id AS BIGINT) AS event_id,
        |              epoch_us(ts) AS ts_us FROM events),
        |a AS (SELECT event_id, ts_us FROM ev
        |      UNION ALL
        |      SELECT event_id, ts_us + 300000000 FROM ev
        |      WHERE event_id % 13 = 2)
        |SELECT event_id, MIN(ts_us) AS kept_ts_us,
        |  CAST(COUNT(*) AS BIGINT) AS n_deliveries,
        |  COUNT(*) > 1 AS was_redelivered
        |FROM a GROUP BY 1""".stripMargin,
    "q_rate_limit" -> {
      val C = RateCapUs
      val P = RatePeriodUs
      // the clamp recurrence is state-dependent (no window closed form),
      // so the oracle iterates it as a per-user recursive CTE — total
      // work linear in events, iterations = max events per user
      def t1(s: String, e: String) =
        s"least($C, $s.tok + ($e.ts_us - $s.ts_us))"
      s"""WITH RECURSIVE ev AS (
         |  SELECT CAST(user_id AS BIGINT) AS user_id, epoch_us(ts) AS ts_us,
         |         CAST(event_id AS BIGINT) AS event_id,
         |         ROW_NUMBER() OVER (PARTITION BY user_id
         |           ORDER BY epoch_us(ts), event_id) AS rn
         |  FROM events),
         |st AS (
         |  SELECT user_id, rn, ts_us, event_id,
         |         CASE WHEN $C >= $P THEN $C - $P ELSE $C END AS tok,
         |         $C >= $P AS accepted
         |  FROM ev WHERE rn = 1
         |  UNION ALL
         |  SELECT e.user_id, e.rn, e.ts_us, e.event_id,
         |         CASE WHEN ${t1("s", "e")} >= $P
         |              THEN ${t1("s", "e")} - $P
         |              ELSE ${t1("s", "e")} END,
         |         ${t1("s", "e")} >= $P
         |  FROM st s JOIN ev e
         |    ON e.user_id = s.user_id AND e.rn = s.rn + 1),
         |m AS (SELECT COUNT(*) AS n_total,
         |        SUM(CASE WHEN accepted THEN 0 ELSE 1 END) AS n_throttled
         |      FROM st)
         |SELECT st.user_id, st.event_id, st.ts_us, st.accepted,
         |  st.tok AS tok_us, CAST(m.n_total AS BIGINT) AS n_total,
         |  CAST(m.n_throttled AS BIGINT) AS n_throttled
         |FROM st, m""".stripMargin
    },

    "q_split_temporal" ->
      s"""WITH e AS (SELECT CAST(event_id AS BIGINT) AS event_id,
         |             CAST(user_id AS BIGINT) AS user_id,
         |             epoch_us(ts) AS ts_us FROM events),
         |s AS (SELECT *,
         |        CASE WHEN ts_us < $SplitCutUs THEN 'train'
         |             WHEN ts_us < ${SplitCutUs + EmbargoUs} THEN 'embargo'
         |             ELSE 'eval' END AS split FROM e),
         |m AS (SELECT
         |    SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS n_train,
         |    SUM(CASE WHEN split = 'embargo' THEN 1 ELSE 0 END)
         |      AS n_embargo,
         |    SUM(CASE WHEN split = 'eval' THEN 1 ELSE 0 END) AS n_eval,
         |    COUNT(DISTINCT CASE WHEN split = 'train' THEN user_id END)
         |      AS users_train,
         |    COUNT(DISTINCT CASE WHEN split = 'eval' THEN user_id END)
         |      AS users_eval
         |  FROM s),
         |ub AS (SELECT SUM(t * v) AS users_both FROM (
         |         SELECT user_id,
         |           MAX(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS t,
         |           MAX(CASE WHEN split = 'eval' THEN 1 ELSE 0 END) AS v
         |         FROM s GROUP BY 1) u)
         |SELECT s.event_id, s.user_id, s.ts_us, s.split,
         |  CAST(m.n_train AS BIGINT) AS n_train,
         |  CAST(m.n_embargo AS BIGINT) AS n_embargo,
         |  CAST(m.n_eval AS BIGINT) AS n_eval,
         |  CAST(m.users_train AS BIGINT) AS users_train,
         |  CAST(m.users_eval AS BIGINT) AS users_eval,
         |  CAST(ub.users_both AS BIGINT) AS users_both
         |FROM s, m, ub""".stripMargin,
    "q_latest_by_key" ->
      """SELECT CAST(user_id AS BIGINT) AS user_id, event_type,
        |  epoch_us(ts) AS ts_us, CAST(event_id AS BIGINT) AS event_id,
        |  value, CAST(json_extract(props, '$.k') AS BIGINT) AS k
        |FROM events
        |QUALIFY ROW_NUMBER() OVER (
        |  PARTITION BY user_id, event_type
        |  ORDER BY epoch_us(ts) DESC, event_id DESC) = 1""".stripMargin,

    "q_scd2_dimension" ->
      """WITH obs AS (
        |  SELECT CAST(user_id AS BIGINT) AS user_id, epoch_us(ts) AS ts_us,
        |    CAST(event_id AS BIGINT) AS event_id,
        |    CAST(json_extract(props, '$.k') AS BIGINT) AS k
        |  FROM events
        |  WHERE CAST(json_extract(props, '$.k') AS BIGINT) IS NOT NULL),
        |flagged AS (
        |  SELECT *,
        |    CASE WHEN LAG(k) OVER w IS NULL OR k <> LAG(k) OVER w
        |         THEN 1 ELSE 0 END AS chg
        |  FROM obs
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |runs AS (
        |  SELECT *,
        |    CAST(SUM(chg) OVER (PARTITION BY user_id
        |      ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS version
        |  FROM flagged),
        |dim AS (
        |  SELECT user_id, version, MIN(k) AS k,
        |    MIN(ts_us) AS eff_from_us, COUNT(*) AS n_obs
        |  FROM runs GROUP BY 1, 2)
        |SELECT user_id, version, k, eff_from_us, n_obs,
        |  LEAD(eff_from_us) OVER (PARTITION BY user_id ORDER BY version)
        |    AS eff_to_us,
        |  LEAD(eff_from_us) OVER (PARTITION BY user_id ORDER BY version)
        |    IS NULL AS is_current
        |FROM dim""".stripMargin,

    // exact-integer moments, one shared IEEE z formula — see qEventAnomaly
    "q_event_anomaly" ->
      """WITH e AS (
        |  SELECT CAST(event_id AS BIGINT) AS event_id, event_type,
        |    CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
        |  FROM events),
        |st AS (
        |  SELECT event_type, COUNT(*) AS n, SUM(cents) AS sum_c,
        |    SUM(cents * cents) AS sum_c2
        |  FROM e GROUP BY 1),
        |m AS (
        |  SELECT event_type,
        |    CAST(sum_c AS DOUBLE) / CAST(n AS DOUBLE) AS mean_c,
        |    CAST(sum_c2 AS DOUBLE) / CAST(n AS DOUBLE)
        |      - (CAST(sum_c AS DOUBLE) / CAST(n AS DOUBLE))
        |        * (CAST(sum_c AS DOUBLE) / CAST(n AS DOUBLE)) AS var_c
        |  FROM st)
        |SELECT e.event_id, e.event_type, e.cents,
        |  ROUND((CAST(e.cents AS DOUBLE) - m.mean_c) / SQRT(m.var_c), 6)
        |    AS z
        |FROM e JOIN m ON e.event_type = m.event_type
        |WHERE m.var_c > 0
        |  AND ABS((CAST(e.cents AS DOUBLE) - m.mean_c) / SQRT(m.var_c))
        |      > CAST(2.0 AS DOUBLE)""".stripMargin,

    // the oracle is DuckDB's NATIVE ASOF JOIN — an independent
    // implementation of the semantics, not a replay of the engine's
    // window trick (right side pre-deduped so the anchor is unique)
    "q_asof_join" ->
      """WITH e AS (SELECT CAST(event_id AS BIGINT) AS event_id,
        |             CAST(user_id AS BIGINT) AS user_id,
        |             epoch_us(ts) AS tus, event_type FROM events),
        |v AS (SELECT user_id, tus, MAX(event_id) AS view_id
        |      FROM e WHERE event_type = 'view' GROUP BY 1, 2),
        |c AS (SELECT user_id, tus, event_id FROM e
        |      WHERE event_type = 'click')
        |SELECT c.event_id AS click_id, c.user_id,
        |  c.tus AS click_ts_us, v.view_id, v.tus AS view_ts_us,
        |  c.tus - v.tus AS lag_us
        |FROM c ASOF JOIN v
        |  ON c.user_id = v.user_id AND c.tus >= v.tus""".stripMargin,
    // attribution replay: same 7-day range join, first/last by the
    // same (ts, id) / (ts desc, id) rules as the k=1 heaps
    "q_attribution" ->
      """WITH e AS (SELECT CAST(event_id AS BIGINT) AS event_id,
        |             CAST(user_id AS BIGINT) AS user_id,
        |             epoch_us(ts) AS tus, event_type FROM events),
        |p AS (SELECT user_id, event_id AS purchase_id, tus AS p_us
        |      FROM e WHERE event_type = 'purchase'),
        |t AS (SELECT user_id, event_id AS t_id, tus AS t_us FROM e
        |      WHERE event_type IN ('view', 'click')),
        |j AS (SELECT p.user_id, p.purchase_id, p.p_us, t.t_id, t.t_us
        |      FROM p JOIN t ON t.user_id = p.user_id
        |        AND t.t_us <= p.p_us
        |        AND t.t_us > p.p_us - 604800000000),
        |f AS (SELECT j.*,
        |        ROW_NUMBER() OVER (PARTITION BY user_id, purchase_id
        |          ORDER BY t_us, t_id) AS rf,
        |        ROW_NUMBER() OVER (PARTITION BY user_id, purchase_id
        |          ORDER BY t_us DESC, t_id) AS rl
        |      FROM j),
        |a AS (SELECT user_id, purchase_id, p_us,
        |        COUNT(*) AS n_touches,
        |        MIN(CASE WHEN rf = 1 THEN t_id END) AS first_id,
        |        MIN(CASE WHEN rf = 1 THEN t_us END) AS first_us,
        |        MIN(CASE WHEN rl = 1 THEN t_id END) AS last_id,
        |        MIN(CASE WHEN rl = 1 THEN t_us END) AS last_us
        |      FROM f GROUP BY 1, 2, 3)
        |SELECT p.user_id, p.purchase_id, p.p_us AS purchase_us,
        |  COALESCE(a.n_touches, 0) AS n_touches,
        |  a.first_id, a.first_us, a.last_id, a.last_us,
        |  CASE WHEN a.n_touches IS NOT NULL
        |    THEN ROUND(1.0 / CAST(a.n_touches AS DOUBLE), 6) END
        |    AS linear_weight
        |FROM p LEFT JOIN a ON a.user_id = p.user_id
        |  AND a.purchase_id = p.purchase_id""".stripMargin,

    "q_retention" ->
      """WITH uw AS (SELECT DISTINCT CAST(user_id AS BIGINT) AS user_id,
        |  (epoch_ns(ts) // 1000) // 604800000000 AS week FROM events),
        |c AS (SELECT user_id, MIN(week) AS cw FROM uw GROUP BY 1),
        |cs AS (SELECT cw, COUNT(*) AS cohort_n FROM c GROUP BY 1),
        |r AS (SELECT c.cw, uw.week - c.cw AS wk_off, COUNT(*) AS n_users
        |      FROM uw JOIN c USING (user_id) GROUP BY 1, 2)
        |SELECT r.cw, r.wk_off, r.n_users, cs.cohort_n,
        |  ROUND(CAST(r.n_users AS DOUBLE)
        |        / CAST(cs.cohort_n AS DOUBLE), 4) AS retention
        |FROM r JOIN cs USING (cw)""".stripMargin,

    "q_json_extract" ->
      // has_k excludes a literal JSON null explicitly. Spark's
      // get_json_object returns SQL NULL for {"k": null} (has_k =
      // false); DuckDB versions differ on whether json_extract yields
      // SQL NULL or a JSON 'null' VALUE there (the installed one yields
      // SQL NULL — measured), so the json_type guard pins the engine's
      // semantics instead of relying on the DuckDB version or on the
      // testdata never containing JSON nulls.
      """SELECT CAST(event_id AS BIGINT) AS event_id, event_type,
        |  CAST(json_extract(props, '$.k') AS BIGINT) AS k,
        |  CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_bucket,
        |  (json_extract(props, '$.k') IS NOT NULL
        |   AND json_type(json_extract(props, '$.k')) <> 'NULL') AS has_k
        |FROM events""".stripMargin,

    "q_pagerank" -> pagerankOracle,

    "q_events_windowed" ->
      """SELECT event_type,
        |  epoch_ns(ts) // 3600000000000 AS hour,
        |  COUNT(*) AS n_events,
        |  ROUND(SUM(value), 4) AS sum_value,
        |  COUNT(DISTINCT user_id) AS n_users
        |FROM events
        |GROUP BY 1, 2""".stripMargin,

    "q_event_interval_join" ->
      s"""WITH e AS (
         |  SELECT CAST(event_id AS BIGINT) AS event_id,
         |    CAST(user_id AS BIGINT) AS user_id, event_type,
         |    epoch_us(ts) AS tus
         |  FROM events),
         |v AS (SELECT user_id, event_id AS view_id, tus AS view_us
         |      FROM e WHERE event_type = 'view'),
         |c AS (SELECT user_id, event_id AS click_id, tus AS click_us
         |      FROM e WHERE event_type = 'click')
         |SELECT v.user_id, v.view_id, c.click_id,
         |  c.click_us - v.view_us AS gap_us
         |FROM v JOIN c ON v.user_id = c.user_id
         |WHERE c.click_us >= v.view_us
         |  AND c.click_us - v.view_us <= $GapUs""".stripMargin,

    // outer twin: unmatched views survive with NULLs — non-conversion
    // as a first-class row
    "q_event_interval_outer" ->
      s"""WITH e AS (
         |  SELECT CAST(event_id AS BIGINT) AS event_id,
         |    CAST(user_id AS BIGINT) AS user_id, event_type,
         |    epoch_us(ts) AS tus
         |  FROM events),
         |v AS (SELECT user_id, event_id AS view_id, tus AS view_us
         |      FROM e WHERE event_type = 'view'),
         |c AS (SELECT user_id, event_id AS click_id, tus AS click_us
         |      FROM e WHERE event_type = 'click')
         |SELECT v.user_id, v.view_id, v.view_us, c.click_id,
         |  c.click_us - v.view_us AS gap_us,
         |  c.click_id IS NOT NULL AS converted
         |FROM v LEFT JOIN c ON v.user_id = c.user_id
         |  AND c.click_us >= v.view_us
         |  AND c.click_us - v.view_us <= $GapUs""".stripMargin,

    "q_sessionize" ->
      s"""WITH e AS (
         |  SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value
         |  FROM events),
         |flagged AS (
         |  SELECT *,
         |    CASE WHEN LAG(ts_us) OVER w IS NULL
         |           OR ts_us - LAG(ts_us) OVER w > $GapUs
         |         THEN 1 ELSE 0 END AS new_sess
         |  FROM e
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
         |sess AS (
         |  SELECT *,
         |    CAST(SUM(new_sess) OVER (PARTITION BY user_id
         |      ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING)
         |      AS BIGINT) AS sess_idx
         |  FROM flagged)
         |SELECT user_id, sess_idx,
         |  COUNT(*) AS n_events,
         |  MIN(ts_us) AS start_us,
         |  MAX(ts_us) AS end_us,
         |  (MAX(ts_us) - MIN(ts_us)) / CAST(1000000 AS BIGINT) AS dur_sec,
         |  ROUND(SUM(value), 4) AS sum_value
         |FROM sess
         |GROUP BY 1, 2""".stripMargin,

    "q_event_enrich" ->
      """SELECT c.c_mktsegment AS segment, e.event_type,
        |  COUNT(*) AS n_events, ROUND(SUM(e.value), 4) AS sum_value
        |FROM events e JOIN customer c ON c.c_custkey = e.user_id
        |GROUP BY 1, 2""".stripMargin,

    // lateness replayed with the same per-user running max over the
    // jittered arrival order; buckets are exact integer micros
    "q_lateness_profile" ->
      """WITH e AS (
        |  SELECT CAST(user_id AS BIGINT) AS user_id,
        |    CAST(event_id AS BIGINT) AS event_id, event_type,
        |    epoch_us(ts) AS ts_us FROM events),
        |a AS (SELECT *, ts_us + (event_id % 7) * 120000000
        |        AS arrival_us FROM e),
        |l AS (
        |  SELECT event_type,
        |    MAX(ts_us) OVER (PARTITION BY user_id
        |      ORDER BY arrival_us, event_id
        |      ROWS UNBOUNDED PRECEDING) - ts_us AS late_us
        |  FROM a)
        |SELECT event_type, COUNT(*) AS n_events,
        |  CAST(SUM(CASE WHEN late_us = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS on_time,
        |  CAST(SUM(CASE WHEN late_us > 0 AND late_us <= 60000000
        |    THEN 1 ELSE 0 END) AS BIGINT) AS late_1m,
        |  CAST(SUM(CASE WHEN late_us > 60000000
        |    AND late_us <= 600000000 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS late_10m,
        |  CAST(SUM(CASE WHEN late_us > 600000000
        |    AND late_us <= 3600000000 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS late_1h,
        |  CAST(SUM(CASE WHEN late_us > 3600000000 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS late_over_1h,
        |  MAX(late_us) AS max_late_us
        |FROM l GROUP BY 1""".stripMargin,

    // the NATIVE session_window rule: [ts, ts+gap) windows must
    // overlap, so >= gap starts a session (vs the hand-rolled > gap)
    "q_sessionize_native" ->
      s"""WITH e AS (
         |  SELECT event_id, epoch_us(ts) AS ts_us, user_id, value
         |  FROM events),
         |flagged AS (
         |  SELECT *,
         |    CASE WHEN LAG(ts_us) OVER w IS NULL
         |           OR ts_us - LAG(ts_us) OVER w >= $GapUs
         |         THEN 1 ELSE 0 END AS new_sess
         |  FROM e
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
         |sess AS (
         |  SELECT *,
         |    CAST(SUM(new_sess) OVER (PARTITION BY user_id
         |      ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING)
         |      AS BIGINT) AS sess_idx
         |  FROM flagged)
         |SELECT user_id, MIN(ts_us) AS start_us, MAX(ts_us) AS end_us,
         |  (MAX(ts_us) - MIN(ts_us)) / CAST(1000000 AS BIGINT)
         |    AS dur_sec,
         |  COUNT(*) AS n_events, ROUND(SUM(value), 4) AS sum_value
         |FROM sess GROUP BY user_id, sess_idx""".stripMargin,

    // per-user totals of the gap-sessionizer: the stateful streaming
    // operator's final state, replayed with a window + one aggregate
    "q_sessionize_stateful" ->
      s"""WITH e AS (
         |  SELECT user_id, epoch_us(ts) AS ts_us FROM events),
         |flagged AS (
         |  SELECT user_id,
         |    CASE WHEN LAG(ts_us) OVER w IS NULL
         |           OR ts_us - LAG(ts_us) OVER w > $GapUs
         |         THEN 1 ELSE 0 END AS new_sess
         |  FROM e
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)),
         |t AS (
         |  SELECT user_id, CAST(SUM(new_sess) AS BIGINT) AS n_sessions,
         |    COUNT(*) AS n_events
         |  FROM flagged GROUP BY user_id)
         |SELECT user_id, n_sessions, n_events FROM t""".stripMargin,

    "q_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |tv AS (
        |  SELECT user_id,
        |    MIN(CASE WHEN event_type = 'view' THEN ts_us END) AS tv
        |  FROM e GROUP BY 1),
        |tc AS (
        |  SELECT e.user_id,
        |    MIN(CASE WHEN event_type = 'click' AND ts_us > tv
        |        THEN ts_us END) AS tc
        |  FROM e JOIN tv ON e.user_id = tv.user_id GROUP BY 1),
        |tp AS (
        |  SELECT e.user_id,
        |    MIN(CASE WHEN event_type = 'purchase' AND ts_us > tc
        |        THEN ts_us END) AS tp
        |  FROM e JOIN tc ON e.user_id = tc.user_id GROUP BY 1)
        |SELECT tv.user_id, tv, tc, tp,
        |  CAST(CASE WHEN tp IS NOT NULL THEN 3
        |            WHEN tc IS NOT NULL THEN 2
        |            WHEN tv IS NOT NULL THEN 1
        |            ELSE 0 END AS BIGINT) AS stage
        |FROM tv
        |JOIN tc ON tv.user_id = tc.user_id
        |JOIN tp ON tv.user_id = tp.user_id""".stripMargin)
}

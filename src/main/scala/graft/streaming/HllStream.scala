package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode, StreamingQuery}

/** STREAMING windowed cardinality — the sketch family's streaming face:
  * distinct users per hour estimated by a HyperLogLog register file
  * held in keyed state. The register merge (per-slot MAX) is
  * commutative, associative and idempotent, so the stream can absorb
  * arrivals in any batch order and the final registers are IDENTICAL
  * to the batch computation — a stronger parity than the dedup/CDC
  * families can claim (their stream caveats are ordering artifacts;
  * a sketch has none). Constants, hash and estimate mirror the batch
  * HLL rows (RetrievalQueries: Flajolet 2007 harmonic mean + the
  * linear-counting small-range branch), so the batch-mode run carries
  * a full DuckDB correctness row.
  *
  * State per window = the distinct-hash set (the exact verification
  * column the audit needs) + event count; the registers derive from
  * the set at emission. A production deployment keeps ONLY the 512
  * bytes of registers — the exact set here is the verification
  * harness, same as the brute-force twins in the ANN family.
  */
object HllStream {

  private val P = 2147483647L // 2^31 - 1, the batch rows' hash modulus
  private val M = 512

  case class Ev(win: Long, user_id: Long)
  case class WinState(hs: Set[Long], n: Long)
  case class WinCard(win: Long, n_events: Long, exact_distinct: Long,
                     zeros: Long, est_distinct: Double, err_pct: Double)

  private def hash(u: Long): Long = (u * 2654435761L) % P

  private def round(d: Double, s: Int): Double =
    java.math.BigDecimal.valueOf(d)
      .setScale(s, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Flajolet 2007 estimate from the distinct-hash set. */
  private[streaming] def card(win: Long, st: WinState): WinCard = {
    val regs = new Array[Long](M)
    st.hs.foreach { h =>
      val j = (h % M).toInt
      val v = h / M
      val r = if (v == 0) 23L
        else java.lang.Long.numberOfTrailingZeros(v) + 1L
      if (r > regs(j)) regs(j) = r
    }
    var nhit = 0
    var hsum = 0.0
    var j = 0
    while (j < M) { // ascending-j sum of powers of two: exact in double
      if (regs(j) > 0) {
        nhit += 1; hsum += math.pow(2.0, -regs(j).toDouble)
      }
      j += 1
    }
    val zeros = M - nhit
    val alpha = 0.7213 / (1.0 + 1.079 / 512.0)
    val raw = alpha * 512.0 * 512.0 / (hsum + zeros.toDouble)
    val est = round(
      if (zeros > 0 && raw <= 2.5 * 512.0)
        512.0 * math.log(512.0 / zeros.toDouble)
      else raw, 4)
    val exact = st.hs.size.toLong
    WinCard(win, st.n, exact, zeros.toLong, est,
      round(math.abs(est - exact) / exact * 100.0, 2))
  }

  private def absorb(st: WinState, rows: Iterator[Ev]): WinState =
    rows.foldLeft(st)((s, e) =>
      WinState(s.hs + hash(e.user_id), s.n + 1))

  /** Append-mode step for the BATCH run: each window's full history in
    * one group — the emitted card is final and deterministic. */
  def batchStep(win: Long, rows: Iterator[Ev],
                state: GroupState[WinState]): Iterator[WinCard] = {
    val st = absorb(state.getOption.getOrElse(WinState(Set.empty, 0L)),
      rows)
    state.update(st)
    Iterator.single(card(win, st))
  }

  /** Update-mode step for the STREAM: re-emits the running card per
    * micro-batch; the latest emission per window is the final state. */
  def streamStep(win: Long, rows: Iterator[Ev],
                 state: GroupState[WinState]): WinCard = {
    val st = absorb(state.getOption.getOrElse(WinState(Set.empty, 0L)),
      rows)
    state.update(st)
    card(win, st)
  }

  private def evs(events: DataFrame): Dataset[Ev] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(expr("ts_us div 3600000000").as("win"),
      col("user_id").cast("long").as("user_id")).as[Ev]
  }

  /** Batch-mode stateful run (the qSessionizeStateful move). */
  def windowCards(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    evs(events).groupByKey(_.win)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(batchStep)
      .toDF()
  }

  /** Memory-sink stream for the parity spec. */
  def hllStream(events: DataFrame, queryName: String): StreamingQuery = {
    val spark = events.sparkSession
    import spark.implicits._
    evs(events).groupByKey(_.win)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(streamStep)
      .toDF()
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("update")
      .start()
  }
}

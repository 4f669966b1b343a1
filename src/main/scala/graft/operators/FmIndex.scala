package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** FM-index (Ferragina & Manzini 2000, public literature) over the
  * corpus suffix array (SURVEY §2 row 213): the BWT + C-table +
  * blocked-occ rank structure that answers SUBSTRING COUNT queries in
  * O(pattern) index probes — how a 100 TB corpus serves "how often
  * does this passage occur" without scanning (decontamination
  * spot-checks, template frequency, n-gram lookups beyond any fixed
  * shingle width).
  *
  * Multi-string form: suffixes never span documents; bwt[i] is the
  * byte PRECEDING suffix rank i in its own doc (sentinel 0 — below
  * every corpus byte — for doc starts). The LF invariant holds under
  * the engine's total suffix order (ties between bit-identical
  * suffixes break by (doc_id, pos), so prepending the same byte
  * preserves relative order — the multi-string BWT requirement).
  *
  * Structure, all Spark-first, split BUILD/SERVE (r18, VERDICT r17
  * item 1 — the artifact persists via [[SuffixIndex.fmFor]] and every
  * query of the session serves rebuild-free):
  *  - [[buildTables]] → bwt (rn, ch, blk): ord joined one position
  *    left against the packed width-[[SuffixArray.PackW]] key's TOP
  *    BYTE (byte at pos without re-reading text); C table = first-byte
  *    counts (≤ |charset| rows — driver-held, like every bounded model
  *    in the suite); E table = the multi-string sentinel correction;
  *    occ checkpoints = per-(block, ch) counts cumulated per ch over
  *    block index (a window partitioned by ch — parallel across the
  *    charset, never a single-partition window);
  *  - [[serve]] → backward search: per step ONE bounded job — the
  *    ≤ 2·|patterns| (c, i) probes broadcast against blockCum + bwt,
  *    collected driver-side (rows, not data — the BPE
  *    sequential-chain precedent), state updated
  *    lo = C[c] + E(c) + occ(c, lo−1) + 1, hi = C[c] + E(c) + occ(c, hi),
  *    where occ(c, i) = blockCum(i DIV B, c) + a residual count inside
  *    one block, resolved by an equi-join on (blk, ch) with an
  *    rn <= i filter. Steps = max pattern length − 1.
  *
  * The oracle never sees any of this: it counts pattern occurrences
  * by DIRECT substring comparison over every position and derives
  * the rank interval from plain string inequalities — an independent
  * algorithm; one wrong occ anywhere moves sa_lo/sa_hi/n_occ and
  * breaks the hash.
  */
object FmIndex {

  private val B = 4096L // occ checkpoint block width (ranks)

  /** Substring-count with an INLINE build — the spec/parity path.
    * Patterns (pid, pat) against the corpus; returns (pid, pat, n_occ,
    * n_docs, sa_lo, sa_hi) — empty matches normalize to (0, 0, 0, -1).
    * Production serving goes through [[SuffixIndex.fmFor]] +
    * [[serve]]. */
  def substringCount(docs: DataFrame,
                     patterns: Seq[(Long, String)]): DataFrame = {
    val (ord0, _, base0) = SuffixArray.buildWithBase(docs)
    val ord = ord0.localCheckpoint()
    serve(ord, buildTables(ord, base0), patterns)
  }

  /** Top packed BYTE of the width-[[SuffixArray.PackW]] base-256 key =
    * the byte AT pos, without re-reading text. */
  private def topByte(r: Column): Column =
    shiftright(r, 8 * (SuffixArray.PackW - 1))

  /** BUILD: derive the FM serving tables from an already-built suffix
    * order + packed positions table. `ord`/`base0` must be
    * materialized (checkpoint or parquet-backed). The returned frames
    * are localCheckpoint'd so a same-session inline consumer can serve
    * immediately; the artifact path writes them to parquet. */
  def buildTables(ord: DataFrame,
                  base0: DataFrame): SuffixIndex.FmTables = {
    val spark = ord.sparkSession
    import spark.implicits._
    val base = base0.select(col("doc_id"), col("pos"),
      topByte(col("r")).as("ch")) // byte AT pos
    // bwt[rn] = byte at pos-1 (sentinel 0 for pos = 0: left join miss)
    val bwt = ord.select(col("rn"), col("doc_id"),
      (col("pos") - 1L).as("pos"))
      .join(base, Seq("doc_id", "pos"), "left")
      .select(col("rn"), coalesce(col("ch"), lit(0L)).as("ch"),
        expr(s"CAST((rn - 1) DIV $B AS BIGINT)").as("blk"))
      .localCheckpoint() // blockCum build + per-step residual probes
    // C table: C[c] = # suffixes with first byte < c (driver, ≤ charset)
    val firstCnt = base.groupBy("ch").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val n = firstCnt.map(_._2).sum
    // MULTI-STRING SENTINEL CORRECTION E(c): the suffixes EXACTLY
    // equal to "c" (a doc's final byte) sort at the head of the
    // c-block (shorter-first) but are never produced by LF from any
    // ranked suffix — the multi-doc analogue of the classic sentinel
    // row. Every prepend step must skip past them:
    //   lo = C[c] + E(c) + occ(c, lo-1) + 1,  hi = C[c] + E(c) + occ(c, hi)
    // (the init interval keeps them: a bare final byte IS an
    // occurrence of the single-byte pattern). Found by brute-force
    // cross-check on a 3-doc corpus — intervals shifted by exactly
    // Σ E(step bytes) before this term.
    val eTab = base0.filter(col("pos") === col("len") - 1L)
      .select(topByte(col("r")).as("ch"))
      .groupBy("ch").agg(count(lit(1)).as("m"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // occ checkpoints: cum counts per ch up to each block START — on a
    // DENSE (block × charset) grid: a sparse table would zero any
    // lookup whose char skipped a block (rare chars skip most blocks —
    // the first cut undercounted exactly the rare-char patterns).
    // Grid size = (n/B) × |charset| ≈ n/43 rows: index-sized, not
    // corpus-sized, and the per-ch window parallelizes across chars.
    val nBlocks = (n + B - 1) / B
    val chDf = bwt.select("ch").distinct()
    val wCh = Window.partitionBy("ch").orderBy("b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val blockCum = spark.range(1, nBlocks + 1).toDF("b")
      .crossJoin(chDf)
      .join(bwt.groupBy("blk", "ch").agg(count(lit(1)).as("m"))
          .select((col("blk") + 1L).as("b"), col("ch"), col("m")),
        Seq("b", "ch"), "left")
      .withColumn("cum", sum(coalesce(col("m"), lit(0L))).over(wCh))
      .select("b", "ch", "cum") // cum = occ(ch, b*B)
      .localCheckpoint() // probed once per step
    SuffixIndex.FmTables(bwt, blockCum, firstCnt, eTab)
  }

  /** Backward search over built FM tables, all patterns in lockstep —
    * pattern units are UTF-8 BYTES, matching the byte-level suffix
    * order (r18). Returns the resolved SA rank intervals
    * (pid, pat, lo, hi), hi < lo normalized to (0, -1) for empty
    * matches — the shared core of [[serve]] (count rollup) and
    * [[locate]] (occurrence extraction). */
  def intervals(spark: org.apache.spark.sql.SparkSession,
                t: SuffixIndex.FmTables,
                patterns: Seq[(Long, String)]): Seq[(Long, String, Long, Long)] = {
    import spark.implicits._
    val firstCnt = t.firstCnt
    val cTab = scala.collection.mutable.LongMap[Long]()
    var acc = 0L
    firstCnt.foreach { case (c, m) => cTab(c) = acc; acc += m }
    val n = acc
    def cOf(c: Long): Long = cTab.getOrElse(c, {
      // byte absent as a first byte: C = # suffixes starting below c
      firstCnt.takeWhile(_._1 < c).map(_._2).sum
    })
    def nextC(c: Long): Long = {
      val above = firstCnt.dropWhile(_._1 <= c)
      if (above.isEmpty) n else cTab(above.head._1)
    }
    def eOf(c: Long): Long = t.eTab.getOrElse(c, 0L)
    // occ(c, i) for a batch of probes (qid, c, i): blockCum(i DIV B, c)
    // + residual inside block (i DIV B). The residual join used to
    // probe the FULL corpus-sized bwt scan every step (maxLen-1
    // sequential steps = that many corpus scans); the probed blocks are
    // driver-known LITERALS (≤ 2·|patterns| of them), so an isin()
    // prefilter turns each step into a pushed-down, row-group-prunable
    // point read of ≤ blocks·B rows (r18 opt, guide §6: make the
    // predicate reach the scan). Same rows join either way — the
    // prefilter is the join condition's blk leg applied early.
    def occBatch(probes: Seq[(Long, Long, Long)]): Map[Long, Long] = {
      val pr = probes.toDF("qid", "c", "i")
        .withColumn("b", expr(s"CAST(i DIV $B AS BIGINT)"))
      val blkIds = probes.map(_._3 / B).distinct
      val cumPart = pr.join(
        t.blockCum.filter(col("b").isin(blkIds: _*)),
        pr("b") === t.blockCum("b") && pr("c") === t.blockCum("ch"),
        "left")
        .select(col("qid"), coalesce(col("cum"), lit(0L)).as("v"))
      val residPart = t.bwt.filter(col("blk").isin(blkIds: _*))
        .join(broadcast(pr),
          t.bwt("blk") === pr("b") && t.bwt("ch") === pr("c") &&
            t.bwt("rn") <= pr("i"))
        .select(col("qid"), lit(1L).as("v"))
      // coalesce(1) -> SinglePartition satisfies the final aggregate's
      // clustering requirement, so the whole step is ONE single-stage
      // job (the groupBy exchange over ~2|patterns| rows cost a full
      // shuffle barrier per step — the step job floor). The single
      // task streams <= |probes|*B joined rows, a patterns-bounded
      // volume at every corpus scale.
      cumPart.unionByName(residPart).coalesce(1)
        .groupBy("qid").agg(sum("v").as("v"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val pats = patterns.map { case (pid, p) =>
      (pid, p, p.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        .map(b => (b & 0xff).toLong))
    }
    val maxLen = pats.map(_._3.length).max
    // init on the LAST byte
    var state: Map[Long, (Long, Long)] = pats.map { case (pid, _, cs) =>
      val c = cs.last
      pid -> (cOf(c) + 1L, nextC(c))
    }.toMap
    for (step <- 2 to maxLen) {
      val active = pats.filter(_._3.length >= step)
        .filter { case (pid, _, _) =>
          val (lo, hi) = state(pid); lo <= hi
        }
      if (active.nonEmpty) {
        val probes = active.flatMap { case (pid, _, cs) =>
          val c = cs(cs.length - step)
          val (lo, hi) = state(pid)
          Seq((pid * 2, c, lo - 1L), (pid * 2 + 1, c, hi))
        }.filter(_._3 >= 0)
        val occ = occBatch(probes)
        state = state ++ active.map { case (pid, _, cs) =>
          val c = cs(cs.length - step)
          val o1 = occ.getOrElse(pid * 2, 0L)
          val o2 = occ.getOrElse(pid * 2 + 1, 0L)
          pid -> (cOf(c) + eOf(c) + o1 + 1L, cOf(c) + eOf(c) + o2)
        }
      }
      // patterns shorter than step, or already empty: unchanged
      state = state ++ pats.collect {
        case (pid, _, cs) if cs.length >= step && {
          val (lo, hi) = state(pid); lo > hi
        } => pid -> (0L, -1L)
      }
    }
    pats.map { case (pid, p, _) =>
      val (lo, hi) = state(pid)
      if (hi < lo) (pid, p, 0L, -1L) else (pid, p, lo, hi)
    }
  }

  /** rn-range PRUNE of the suffix-order scan (r19, VERDICT r18 item 3):
    * the resolved intervals are driver-known literals, so an OR-chain of
    * `rn BETWEEN lo AND hi` predicates reaches the parquet scan as
    * PushedFilters and prunes to the row groups holding the probed
    * ranks — `ord` is written by the rank-bucketed stitch, so each file
    * holds a contiguous rn range and min/max stats prune. Rows outside
    * every interval can never satisfy the join, so results are
    * unchanged; at 100 TB the pruned read is occurrence-bounded where
    * the unpruned one was corpus-sized. */
  private def rnPruned(ord: DataFrame,
                       ivs: Seq[(Long, String, Long, Long)]): DataFrame = {
    val ranges = ivs.collect { case (_, _, lo, hi) if hi >= lo => (lo, hi) }
    if (ranges.isEmpty) ord.filter(lit(false))
    else ord.filter(ranges.map { case (lo, hi) =>
      col("rn") >= lit(lo) && col("rn") <= lit(hi)
    }.reduce(_ || _))
  }

  /** SERVE: substring counts — backward search to rank intervals, then
    * a doc-level rollup against `ord` (one rn-range-pruned scan with
    * the ≤ |patterns| rank intervals broadcast). */
  def serve(ord: DataFrame, t: SuffixIndex.FmTables,
            patterns: Seq[(Long, String)]): DataFrame = {
    val spark = ord.sparkSession
    import spark.implicits._
    val ivSeq = intervals(spark, t, patterns)
    val iv = ivSeq.toDF("pid", "pat", "lo", "hi")
    val hits = rnPruned(ord, ivSeq).join(broadcast(iv),
      ord("rn") >= iv("lo") && ord("rn") <= iv("hi"))
      .groupBy("pid")
      .agg(count(lit(1)).as("n_occ"),
        countDistinct("doc_id").as("n_docs"))
    iv.join(hits, Seq("pid"), "left")
      .select(col("pid"), col("pat"),
        coalesce(col("n_occ"), lit(0L)).as("n_occ"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        when(col("hi") < col("lo"), 0L).otherwise(col("lo")).as("sa_lo"),
        when(col("hi") < col("lo"), -1L).otherwise(col("hi")).as("sa_hi"))
  }

  /** LOCATE: every occurrence position of every pattern — backward
    * search to rank intervals, then ONE scan of the persisted suffix
    * order with the ≤ |patterns| intervals broadcast; each rank in
    * [lo, hi] IS an occurrence (doc_id, byte offset). The classic FM
    * serving design samples the SA and walks LF to the nearest sample;
    * here the full order is already a standing distributed table (the
    * build/serve artifact q_suffix_dedup pays for anyway), so locate
    * is a broadcast range join against it — no LF walk, no per-rank
    * driver round-trips, and output size = true occurrence count, the
    * lower bound any locate pays. Returns (pid, pat, doc_id, pos). */
  def locate(ord: DataFrame, t: SuffixIndex.FmTables,
             patterns: Seq[(Long, String)]): DataFrame = {
    val spark = ord.sparkSession
    import spark.implicits._
    val ivSeq = intervals(spark, t, patterns).filter(x => x._4 >= x._3)
    val iv = ivSeq.toDF("pid", "pat", "lo", "hi")
    rnPruned(ord, ivSeq).join(broadcast(iv),
      ord("rn") >= iv("lo") && ord("rn") <= iv("hi"))
      .select(col("pid"), col("pat"), col("doc_id"), col("pos"))
  }
}

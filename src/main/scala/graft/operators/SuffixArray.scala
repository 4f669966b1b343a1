package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed suffix array over the documents corpus by PREFIX
  * DOUBLING (Manber–Myers; the distributed formulation follows the
  * published bulk-synchronous builders, e.g. Flick & Aluru SC'15),
  * plus EXACT adjacent-suffix LCP recovered by descending the retained
  * rank levels. This is the structure behind exact substring-level
  * dedup at scale — Lee et al. 2022 ("Deduplicating Training Data
  * Makes Language Models Better") build exactly this over their
  * corpora. The reference toolbox has no text operators; this is a
  * beyond-reference pipeline component (SURVEY §2 row 213) that
  * complements the fixed-width shingle span dedup (row 63): shingles
  * see only k=16 windows, the suffix array measures the TRUE length of
  * every maximal repeat.
  *
  * Algorithmic shape — every step a DataFrame equi-join or a
  * range-partitioned sort of fixed-width integer keys:
  *
  *  - positions (doc_id, pos) carry an initial width-[[PackW]] rank:
  *    the first [[PackW]] UTF-8 BYTES packed base-256 into one long
  *    (NUL-free contract: an embedded 0x00 would collide with the
  *    end-of-string pad 0 — guarded loudly; any other byte value,
  *    including multi-byte UTF-8, ranks exactly in byte order).
  *    Packing starts the doubling at width [[PackW]], saving the
  *    byte-level rounds.
  *  - ONE global stitched index seeds width-[[PackW]] MIN-RANK group ids
  *    (rank() = first-peer position), built WITHOUT a
  *    single-partition window and WITHOUT a sampling pass: a COMPUTED
  *    bucket monotone in the packed key, rank inside each logical
  *    bucket, cumulative per-bucket offsets from a one-row-per-bucket
  *    collect. Rank VALUES are independent of physical partitioning
  *    entirely, so the result is deterministic under any parallelism.
  *  - every doubling round is Larsson–Sadakane LOCAL refinement with
  *    discarding (see [[build]]): r[p+w] comes from lead(w) inside
  *    the per-doc window (positions are contiguous, so a lead of w
  *    rows IS pos+w; -1 past the end makes shorter suffixes sort
  *    first exactly like the byte order), and tie groups split IN
  *    PLACE by group-partitioned windows over the still-tied rows
  *    only — no global re-ranking after the seed round.
  *  - rounds stop as soon as ranks are all-distinct (then every
  *    adjacent LCP < width, which bounds the descent) or once the
  *    width covers the longest document.
  *  - adjacent pairs in suffix order recover their EXACT lcp by greedy
  *    descent over the retained levels, widest first, each width used
  *    at most once (binary decomposition: entering width w the
  *    remaining lcp is < 2w, leaving it < w), finishing inside the
  *    packed width-[[PackW]] block by base-256 byte comparison; a final
  *    min(remaining-length) cap makes the identical-truncated-tail
  *    case exact (two suffixes that are bit-equal to their ends
  *    compare equal at every width, so the raw descent overshoots by
  *    design and the cap restores the true value).
  *
  * Scale: no all-pairs anywhere, no global single-partition window
  * (the usual rank() trap), the only driver-side data are the
  * ≤#partitions offset rows and the max-length scalar. Total cost is
  * O(n log n) in corpus characters — the same asymptotics the
  * published distributed suffix-array builders pay — and each level
  * table is localCheckpoint'd (on a cluster: checkpoint to durable
  * storage) so the descent joins read materialized fixed-width rows
  * instead of replaying the doubling lineage.
  */
object SuffixArray {

  private def df0Parts(df: DataFrame): Int =
    df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt

  /** Packing width: [[positions]] packs [[PackW]] UTF-8 BYTES base-256
    * into one signed long (7 x 8 = 56 bits — the widest byte count
    * that stays exact and non-negative in 63 bits). Byte-level packing
    * (r18, VERDICT r17 item 2) replaces the r17 7-bit-ASCII base-128
    * pack: suffix order is now the UTF-8 BYTE order on ANY corpus —
    * the same memcmp order DuckDB's string comparison (and every
    * byte-order oracle in the suite) already uses — so the r17
    * non-ASCII fail-fast guard is retired. The one remaining packing
    * contract is NUL-freedom (an embedded 0x00 byte would collide with
    * the end-of-string pad 0 and silently mis-rank), guarded loudly
    * below; real text corpora are NUL-free by construction. */
  val PackW = 7

  /** Positions (doc_id, pos, len, r): pos = BYTE offset, len = BYTE
    * length, r = the [[PackW]] UTF-8 bytes from pos packed base-256
    * (pad 0 past the end — sorts below every real byte, matching
    * byte order on NUL-free text). On an ASCII corpus byte offsets
    * and char offsets coincide, so every char-arithmetic oracle is
    * unchanged. */
  def positions(docs: DataFrame): DataFrame = {
    // NUL-freedom guard (the only packing contract left after the r18
    // byte-level pack): an embedded 0x00 collides with the pad digit.
    // Row-local, evaluated before the position explode multiplies rows.
    // [^\x01-\x7F] alone would miss multi-byte UTF-8 (those are FINE
    // now), so the check is a direct chr(0) containment.
    val guarded = when(expr("instr(text, chr(0))") > 0,
      raise_error(concat(
        lit("SuffixArray: embedded NUL byte collides with the " +
          "end-of-string pad digit (doc_id="),
        col("doc_id").cast("string"), lit(")"))))
      .otherwise(col("text"))
    val d = docs
      .select(col("doc_id").cast("long").as("doc_id"),
        encode(guarded, "UTF-8").as("bin"))
      .select(col("doc_id"), col("bin"),
        length(col("bin")).cast("long").as("len"))
      .where(col("len") > 0)
      .select(col("doc_id"), col("bin"), col("len"),
        explode(sequence(lit(0L), col("len") - 1L)).as("pos"))
    // PackW-byte slice → hex → low-order zero pad → one exact conv:
    // all codegen'd built-ins, and conv's 14 hex digits = 56 bits fit
    // a long exactly
    val packed = expr(
      s"CAST(conv(rpad(hex(substring(bin, CAST(pos + 1 AS INT), " +
        s"$PackW)), ${2 * PackW}, '0'), 16, 10) AS BIGINT)")
    d.select(col("doc_id"), col("pos"), col("len"), packed.as("r"))
  }

  /** How bucketIndex numbers rows. Row = row_number over a total key
    * order; MinRank = rank() (first-peer position — equal keys share
    * the index of their group's first row, the Larsson–Sadakane group
    * id). */
  sealed trait IndexMode
  case object Row extends IndexMode
  case object MinRank extends IndexMode

  /** Order-exact 1-based global index over `keys`, stitched from a
    * BUCKET-monotone decomposition: `bucket` must be non-decreasing in
    * the key order and constant within equal keys (both hold for any
    * monotone function of the leading key component). Rows are ranked
    * inside each logical bucket by a parallel window and offset by the
    * cumulative per-bucket ROW counts (bounded collect, one row per
    * bucket). No sampling pass (the bucket is computed, not sampled —
    * one shuffle instead of repartitionByRange's two jobs), no
    * single-partition window, and the rank VALUES depend only on the
    * data, never on physical partitioning.
    * Returns the indexed frame and the total row count. */
  def bucketIndex(df: DataFrame, bucket: Column, keys: Seq[String],
      out: String, mode: IndexMode,
      sizeOut: Option[String] = None): (DataFrame, Long) = {
    val kc = keys.map(col)
    val wb = Window.partitionBy("__b").orderBy(kc: _*)
    // optional KEY-GROUP SIZE in the same pass (r19, the width-28 seed:
    // singleton groups are settled before the first doubling round) —
    // partitioned like wb, so it shares wb's exchange; the unbounded
    // frame is a second Window operator over the already-shuffled rows
    val wg = Window.partitionBy(("__b" +: keys).map(col): _*)
    // EAGER checkpoint of the windowed rows BEFORE the offsets
    // aggregate: the round's pipeline (lead window → bucket shuffle →
    // rank window) then runs exactly once — the offsets collect and
    // every downstream consumer read the stored blocks
    val withLocal = sizeOut.foldLeft(
      df.withColumn("__b", bucket.cast("long"))
        .repartition(col("__b"))
        .withColumn("__lr",
          (mode match {
            case Row => row_number()
            case MinRank => rank()
          }).over(wb).cast("long"))) { (d, so) =>
        d.withColumn(so, count(lit(1)).over(wg))
      }
      .localCheckpoint()
    val cnts = withLocal.groupBy("__b").agg(count(lit(1)).as("m"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offs = cnts.map { case (b, m) =>
      val o = (b, acc); acc += m; o
    }.toMap
    // map-literal lookup, not a when-chain: the first round can have
    // hundreds of buckets (one per leading char pair) and a
    // hundreds-deep conditional tree fights codegen for no reason
    val offCol =
      if (offs.isEmpty) lit(0L)
      else coalesce(element_at(typedlit(offs), col("__b")), lit(0L))
    (withLocal.withColumn(out, col("__lr") + offCol)
      .drop("__b", "__lr"), acc)
  }

  /** Build the suffix order — Larsson–Sadakane prefix doubling with
    * DISCARDING. Ranks are MIN-RANK group ids (the 1-based row index
    * of the group's first row in suffix order — rank() semantics), so
    * a tie group refines LOCALLY: sorting the group by the partner
    * rank r2, the subgroup starting at in-group row m gets rank
    * r + m − 1, with NO global re-indexing — the per-round windows
    * partition by the group id and touch only still-tied rows, and a
    * row whose subgroup reaches size 1 is SETTLED (its rank is final
    * for every wider width) and leaves the working set. One global
    * stitched index seeds width 8; every later round is: one per-doc
    * lead() over the current full rank view (r2 lookup) + two
    * group-partitioned windows over the ACTIVE rows only. On corpora
    * where ties die fast the working set collapses after a few
    * rounds; on near-dup corpora it tracks the duplicated mass —
    * either way never more than the full position count.
    *
    * Returns (ord, levels): ord = (doc_id, pos, len, rn) with rn the
    * 1-based position in the global suffix order (ties between
    * bit-identical suffixes broken by (doc_id, pos), the same total
    * order the oracle's ORDER BY suf, doc_id, pos produces); levels =
    * (width → (doc_id, pos, r)) rank tables retained for the LCP
    * descent — width 8 first and holding the PACKED chars (the
    * descent's digit refine reads them), min-ranks after. */
  def build(docs: DataFrame): (DataFrame, Seq[(Long, DataFrame)]) = {
    val (ord, levels, _) = buildWithBase(docs)
    (ord, levels)
  }

  /** [[build]] plus the checkpointed positions table (doc_id, pos,
    * len, r) — consumers that need per-position chars (FmIndex's BWT
    * reads them off the packed key) reuse the blocks instead of paying
    * the position explode + packing scan twice. */
  /** Seed width: the doubling starts at [[SeedW]] = 4·[[PackW]] = 28
    * bytes (r19, VERDICT r18 item 4). Three per-doc lead()s extend the
    * packed word to a 4-word key (r, r@+7, r@+14, r@+21) — ONE window
    * pass — and the stitched index orders the 4-tuple directly, which
    * is exactly the order (and the min-rank group structure) three
    * doubling rounds would reach: each lead word is a monotone
    * encoding of the next 7-byte slice (0-pad sorts below every real
    * byte on NUL-free text), and -1 for a missing position sorts below
    * every packed value, the same shorter-suffix-first convention the
    * round refinement's coalesce(lead, -1) uses. Kills the two most
    * expensive doubling rounds (7→14→28 refined the FULL position set
    * twice; ProfileSuffix18 measured them 5.2 + 4.0 s of the ~40 s
    * build at sf0.1). */
  val SeedW = 4 * PackW

  def buildWithBase(docs: DataFrame)
      : (DataFrame, Seq[(Long, DataFrame)], DataFrame) = {
    val base = positions(docs).localCheckpoint()
    val nPos = base.count()
    val maxLen =
      if (nPos == 0) 0L
      else base.agg(max("len")).collect()(0).getLong(0)
    val docWin = Window.partitionBy("doc_id").orderBy("pos")
    // the WIDE packed table (doc_id, pos, r, r7, r14, r21): one window
    // pass computes all three leads; checkpointed because BOTH the seed
    // stitch and the LCP descent's sub-SeedW tail read it (the tail
    // resolves the final < 28 bytes in ONE join per side instead of the
    // r18 shape's three level joins + digit refine)
    val wide = base.select("doc_id", "pos", "r")
      .withColumn("r7",
        coalesce(lead(col("r"), PackW).over(docWin), lit(-1L)))
      .withColumn("r14",
        coalesce(lead(col("r"), 2 * PackW).over(docWin), lit(-1L)))
      .withColumn("r21",
        coalesce(lead(col("r"), 3 * PackW).over(docWin), lit(-1L)))
      .localCheckpoint()
    // levels.head is BY CONTRACT the width-PackW wide table (the
    // descent's tail refine reads r/r7/r14/r21 off it)
    val levels = scala.collection.mutable.ArrayBuffer[(Long, DataFrame)](
      (PackW.toLong, wide))
    // width-SeedW min-ranks: the one global stitched index (rank() =
    // first-peer position = the group id); bucket = the top two packed
    // BYTES (monotone in the key, ~|charset|^2 logical buckets). The
    // seed also emits each group's SIZE (same exchange), so singleton
    // groups — rows already distinct at width 28, the vast majority —
    // are SETTLED before the first round ever windows them: round w=28
    // refines only the still-tied rows, exactly as it would had the
    // doubling walked 7→14→28.
    val (r28, _) = bucketIndex(wide, shiftright(col("r"), 8 * (PackW - 2)),
      Seq("r", "r7", "r14", "r21"), "mr", MinRank, sizeOut = Some("gs"))
    // r[pos+w] by lead() inside the per-doc window — positions are the
    // contiguous 0..len-1, so a lead of w rows IS pos+w, and the only
    // full-table shuffle per round is this doc_id hash
    var width = SeedW.toLong
    var settled = List[DataFrame](r28.filter(col("gs") === 1L)
      .select(col("doc_id"), col("pos"), col("mr").as("r")))
    var nActive =
      if (nPos == 0) 0L else r28.filter(col("gs") > 1L).count()
    // the working full view carries an __a flag (still tied?); each
    // round's view doubles as that width's level table. LAZY
    // checkpoints: a view materializes inside the next round's one
    // action (the refined checkpoint), so every round runs exactly one
    // full pass — lead lookup + active filter in the same job.
    var curFull = r28.select(col("doc_id"), col("pos"),
      col("mr").as("r"), (col("gs") > 1L).as("__a"))
    levels += ((SeedW.toLong, curFull.select("doc_id", "pos", "r")))
    while (nActive > 0 && width < maxLen) {
      // (doubling from PackW: widths PackW·2^k — the descent's binary
      // decomposition only needs exact halving, not powers of two)
      val wGrp = Window.partitionBy("r").orderBy("r2", "doc_id", "pos")
      val wSub = Window.partitionBy("r", "r2")
      val refined = curFull
        .withColumn("r2",
          coalesce(lead(col("r"), width.toInt).over(docWin), lit(-1L)))
        .filter(col("__a"))
        .withColumn("rnG", row_number().over(wGrp))
        .withColumn("mrn", min(col("rnG")).over(wSub))
        .withColumn("gs", count(lit(1)).over(wSub))
        .select(col("doc_id"), col("pos"),
          (col("r") + col("mrn") - 1L).as("r"), col("gs"))
        .localCheckpoint()
      width *= 2
      settled = refined.filter(col("gs") === 1L)
        .select("doc_id", "pos", "r") :: settled
      val active = refined.filter(col("gs") > 1L)
        .select("doc_id", "pos", "r")
      nActive = refined.filter(col("gs") > 1L).count()
      // coalesce the union: without it each round's view concatenates
      // every frame's partitions (up to rounds × parallelism tasks per
      // descent join later) — a narrow fan-in, not a shuffle
      curFull = (active.withColumn("__a", lit(true)) :: settled
        .map(_.withColumn("__a", lit(false)))).reduce(_ unionByName _)
        .coalesce(df0Parts(docs)).localCheckpoint(false)
      levels += ((width, curFull.select("doc_id", "pos", "r")))
    }
    val fullRank = curFull.select("doc_id", "pos", "r")
    // rows still tied past maxLen are bit-identical suffixes — the
    // final total order breaks them by (doc_id, pos)
    val (ord, _) = bucketIndex(
      fullRank.join(base.select("doc_id", "pos", "len"),
        Seq("doc_id", "pos")),
      if (nPos == 0) lit(0L)
      else expr(s"CAST(((r - 1) * 64) DIV $nPos AS BIGINT)"),
      Seq("r", "doc_id", "pos"), "rn", Row)
    (ord.select("doc_id", "pos", "len", "rn"), levels.toSeq, base)
  }

  /** Adjacent pairs in suffix order with their EXACT lcp:
    * (rn, da, pa, db, pb, lcp) for each rn → rn+1 neighbour (rn = the
    * LEFT suffix's global index — the apply step's group sessionization
    * keys on it). */
  def adjacentLcp(ord: DataFrame,
      levels: Seq[(Long, DataFrame)]): DataFrame = {
    val a = ord.select(col("rn"), col("doc_id").as("da"),
      col("pos").as("pa"), col("len").as("la"))
    val b = ord.select((col("rn") - 1L).as("rn"),
      col("doc_id").as("db"), col("pos").as("pb"), col("len").as("lb"))
    var pairs = a.join(b, "rn")
      .withColumn("off", lit(0L)).withColumn("lcp", lit(0L))
    var step = 0
    // min-rank level steps, widest first, widths > PackW only — the
    // final < SeedW bytes resolve in the wide-table tail below
    for ((w, tbl) <- levels.sortBy(-_._1) if w > PackW) {
      val ta = tbl.select(col("doc_id").as("da"), col("pos").as("qa"),
        col("r").as("ra"))
      val tb = tbl.select(col("doc_id").as("db"), col("pos").as("qb"),
        col("r").as("rb"))
      // (A remaining-length level skip — filter can-advance rows, probe
      // only those, union the rest back — was MEASURED here r19 and
      // REVERTED: warmed build wall tied, 24.9 vs 25.0 s, and the cold
      // descent got ~25% slower, 9.8 → 12.4 s: the per-level
      // filter+union forks the plan and the extra codegen outweighs
      // the probe-side shrink at any bench sf.)
      pairs = pairs
        .withColumn("qa", col("pa") + col("off"))
        .withColumn("qb", col("pb") + col("off"))
        .join(ta, Seq("da", "qa"), "left")
        .join(tb, Seq("db", "qb"), "left")
        .withColumn("eq", col("ra").isNotNull && col("rb").isNotNull &&
          col("ra") === col("rb"))
        .withColumn("off", col("off") + when(col("eq"), w).otherwise(0L))
        .withColumn("lcp", col("lcp") + when(col("eq"), w).otherwise(0L))
        .drop("qa", "qb", "ra", "rb", "eq")
      step += 1
      if (step % 3 == 0) pairs = pairs.localCheckpoint()
    }
    // sub-SeedW TAIL off the wide packed table (r19): leaving the
    // width-SeedW level the remaining lcp is < 28 = 4 packed words, and
    // ONE (doc, pos+off) probe per side returns all four (r, r7, r14,
    // r21) — a row-local word scan + byte refine replaces the r18
    // shape's width-14/width-7 level joins AND the final digit refine
    // (6 chained joins → 2). Semantics are byte-identical: a word
    // advance certifies 7 equal bytes exactly like a level step (-1
    // never equals a packed value; -1 == -1 means both suffixes ended —
    // the overshoot the length cap repairs, as before), and the byte
    // refine inside the first unequal word is the old digit fold.
    val (_, wide) = levels.head
    val wa = wide.select(col("doc_id").as("da"), col("pos").as("qa"),
      col("r").as("w0a"), col("r7").as("w1a"), col("r14").as("w2a"),
      col("r21").as("w3a"))
    val wb = wide.select(col("doc_id").as("db"), col("pos").as("qb"),
      col("r").as("w0b"), col("r7").as("w1b"), col("r14").as("w2b"),
      col("r21").as("w3b"))
    // digits are 8-bit fields of the packed long — extract by shift,
    // never by double division (a 2^56 packed value exceeds the 2^53
    // exact-double range)
    def digit(c: Column, i: Int): Column =
      shiftright(c, 8 * (PackW - 1 - i)).bitwiseAND(lit(255L))
    // first mismatching byte 0..6 inside one word pair (PackW if equal);
    // a -1 (missing-position) word contributes 0 bytes, the old
    // null-probe semantics
    def byteRef(x: Column, y: Column): Column =
      when(x === -1L || y === -1L, lit(0L)).otherwise(
        (PackW - 1 to 0 by -1)
          .foldLeft(lit(PackW.toLong): Column) { (inner, i) =>
            when(digit(x, i) =!= digit(y, i), lit(i.toLong))
              .otherwise(inner)
          })
    val tailAdd =
      when(col("w0a").isNull || col("w0b").isNull, lit(0L)).otherwise(
        when(col("w0a") =!= col("w0b"), byteRef(col("w0a"), col("w0b")))
          .when(col("w1a") =!= col("w1b"),
            lit(PackW.toLong) + byteRef(col("w1a"), col("w1b")))
          .when(col("w2a") =!= col("w2b"),
            lit(2L * PackW) + byteRef(col("w2a"), col("w2b")))
          .when(col("w3a") =!= col("w3b"),
            lit(3L * PackW) + byteRef(col("w3a"), col("w3b")))
          .otherwise(lit(SeedW.toLong)))
    pairs
      .withColumn("qa", col("pa") + col("off"))
      .withColumn("qb", col("pb") + col("off"))
      .join(wa, Seq("da", "qa"), "left")
      .join(wb, Seq("db", "qb"), "left")
      .withColumn("lcp",
        least(col("lcp") + tailAdd,
          col("la") - col("pa"), col("lb") - col("pb")))
      .select("rn", "da", "pa", "db", "pb", "lcp")
  }

  /** The substring-dedup APPLY step (r17, VERDICT r16 item 3; Lee et
    * al. 2022's ExactSubstr with the keep-one-canonical editorial
    * variant — the step row 213's per-doc statistics stop short of):
    * per doc, the maximal cross-doc duplicated spans of length >=
    * `minLen` are located by the adjacent-LCP structure and REMOVED,
    * keeping the copy in the smallest doc_id (the keep-best
    * precedent).
    *
    * Group semantics — fully relational, oracle-replayable:
    *  - a >=minLen REPEAT GROUP is a maximal run of suffixes in suffix
    *    order whose every adjacent pair has lcp >= minLen (runs are
    *    found by a distributed PREFIX SUM of boundary flags over the
    *    pair index — the bucketIndex stitch applied to sums: local
    *    cumsum per computed bucket + cumulative per-bucket offsets
    *    from a bounded one-row-per-bucket collect, never a
    *    single-partition window);
    *  - a member's REMOVAL LENGTH is its max adjacent in-group lcp
    *    (adjacency attains the max shared prefix, so this is the
    *    maximal duplicated span starting at that position);
    *  - a member is REMOVED iff its doc is not the group's min doc_id.
    *
    * Every surviving cross-doc repeat >= minLen would need both start
    * positions kept; both suffixes sit in one group (lcp(a,b) = min of
    * the adjacent lcps between them >= minLen), whose min-doc rule
    * marks every non-canonical side — so the cleaned SEGMENTS contain
    * no cross-doc repeat >= minLen (the spec re-runs the detector on
    * the segments to pin exactly this; the glued clean_text could
    * fabricate new adjacencies across a cut, which is why the
    * guarantee — and the spec — speak in segments).
    *
    * Returns (doc_id, text, sp) with sp = the doc's MERGED removal
    * intervals array<struct<s,e>> (possibly empty), pre-clean text
    * attached; [[applyDedup]] turns it into the cleaned corpus. */
  def dedupSpans(docs: DataFrame, minLen: Long): DataFrame = {
    val d = docs
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      .localCheckpoint() // build + reassembly share the originals
    val (ord, levels) = build(d)
    val pairs = adjacentLcp(ord, levels)
      .localCheckpoint() // boundary sum + member lcp share it
    dedupSpansOn(d, ord, pairs, minLen)
  }

  /** [[dedupSpans]]'s group/mark/merge stages over an ALREADY-BUILT
    * suffix order + adjacent-LCP pairs — the composition point for the
    * session suffix-index artifact ([[SuffixIndex]]): the apply step
    * reads the standing structure instead of rebuilding it per query
    * (r18, VERDICT r17 item 1). `d` must be the same (doc_id, text)
    * corpus the index was built over; `ord`/`pairs` must be
    * materialized (checkpoint or parquet-backed). */
  def dedupSpansOn(d: DataFrame, ord: DataFrame, pairs: DataFrame,
                   minLen: Long): DataFrame = {
    val nPairs = math.max(pairs.count(), 1L)
    // ---- distributed prefix sum of boundary flags over pair rn ----
    val withB = pairs.select(col("rn"),
      when(col("lcp") >= minLen, 0L).otherwise(1L).as("b"))
      .withColumn("__b",
        expr(s"CAST(((rn - 1) * 64) DIV $nPairs AS BIGINT)"))
    val wLoc = Window.partitionBy("__b").orderBy("rn")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val loc = withB.repartition(col("__b"))
      .withColumn("__s", sum(col("b")).over(wLoc))
      .localCheckpoint() // offsets collect + psum read it once
    val cnts = loc.groupBy("__b").agg(sum("b").as("m"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offs = cnts.map { case (b, m) => val o = (b, acc); acc += m; o }
      .toMap
    val offCol =
      if (offs.isEmpty) lit(0L)
      else coalesce(element_at(typedlit(offs), col("__b")), lit(0L))
    // S(rn) = boundaries among pairs 1..rn; suffix rn's group id is
    // S(rn-1) (0 for rn = 1) — two neighbours share a group iff the
    // pair between them is NOT a boundary
    val psum = loc.select((col("rn") + 1L).as("rn"),
      (col("__s") + offCol).as("gid"))
    // member rows: suffixes with any adjacent in-group (>= minLen)
    // pair; L = max such lcp = the maximal duplicated span at pos
    val memL = pairs.filter(col("lcp") >= minLen)
      .select(col("rn"), col("lcp"))
    val touch = memL
      .unionByName(memL.select((col("rn") + 1L).as("rn"), col("lcp")))
      .groupBy("rn").agg(max("lcp").as("L"))
    // join ORDER (r18 opt, guide §3.2 shape): restrict ord to the
    // touched rns FIRST — touch is only the duplicated positions, a
    // small fraction of the corpus — so the group-id lookup joins a
    // members-sized probe against psum instead of a full corpus×corpus
    // rn merge that the touch filter then throws mostly away. touch
    // and psum are both unique on rn, so the inner/left joins commute
    // row-for-row with the previous sfx-then-touch order.
    val members = ord.select("doc_id", "pos", "rn")
      .join(touch, Seq("rn"))
      .join(psum, Seq("rn"), "left")
      .select(col("doc_id"), col("pos"), col("rn"),
        coalesce(col("gid"), lit(0L)).as("gid"), col("L"))
    val cdoc = members.groupBy("gid").agg(min("doc_id").as("cdoc"))
    val marked = members.join(cdoc, Seq("gid"))
      .filter(col("doc_id") =!= col("cdoc"))
      .select(col("doc_id"), col("pos").as("s"),
        (col("pos") + col("L")).as("e"))
    markedToSpans(d, marked)
  }

  /** Per-doc interval merge over marked removal rows (doc_id, s, e) —
    * row-local HOF over the doc-bounded sorted span array (array_sort
    * on struct = (s, e) lexicographic). Returns (doc_id, text, n_rm,
    * sp) for [[applyDedupFrom]]; shared by the cross-doc apply step
    * and the delta-vs-index matcher. */
  def markedToSpans(d: DataFrame, marked: DataFrame): DataFrame = {
    val spans = marked.groupBy("doc_id").agg(
      count(lit(1)).as("n_rm"),
      array_sort(collect_list(struct(col("s"), col("e")))).as("sp0"))
    val merged = expr(
      """aggregate(sp0, cast(array() as array<struct<s:bigint,e:bigint>>),
        |  (acc, x) -> CASE
        |    WHEN size(acc) > 0 AND element_at(acc, -1).e >= x.s
        |    THEN concat(slice(acc, 1, size(acc) - 1),
        |      array(named_struct('s', element_at(acc, -1).s,
        |        'e', greatest(element_at(acc, -1).e, x.e))))
        |    ELSE concat(acc, array(x)) END)""".stripMargin)
    d.join(spans, Seq("doc_id"), "left")
      .select(col("doc_id"), col("text"),
        coalesce(col("n_rm"), lit(0L)).as("n_rm"),
        when(col("sp0").isNull,
          expr("cast(array() as array<struct<s:bigint,e:bigint>>)"))
          .otherwise(merged).as("sp"))
  }

  // ------------------------------------------- delta-vs-index matching

  /** Greedy decomposition of a window width into label parts: 28/14/7
    * multiples then single bytes, with running offsets — the key shape
    * of the delta matcher ([[deltaSpans]]). 50 → 28@0, 14@28, 7@42,
    * 1@49. */
  def widthParts(minLen: Long): Seq[(Int, Long)] = {
    require(minLen >= 7, s"widthParts: minLen $minLen below pack width")
    val parts = scala.collection.mutable.ArrayBuffer[(Int, Long)]()
    var off = 0L; var rem = minLen
    for (w <- Seq(28, 14, 7)) {
      while (rem >= w) { parts += ((w, off)); off += w; rem -= w }
    }
    while (rem > 0) { parts += ((1, off)); off += 1; rem -= 1 }
    parts.toSeq
  }

  /** Attach composed rank LABELS to a positions frame (doc_id, pos,
    * len, r): l14 = the base-minted id of the (r7, r7@+7) pair, l28 =
    * the id of the (l14, l14@+14) pair. Rank composition (the
    * Larsson–Sadakane invariant read backwards): two positions share a
    * width-2w prefix iff their (label_w, label_w@+w) pairs are equal —
    * so a DELTA position maps into the BASE's label space through two
    * equi-joins on longs, never a string comparison. Delta-side joins
    * are left (an absent pair means the gram does not occur in base —
    * exactly the no-match signal, carried as null). */
  def attachLabels(pos: DataFrame, map14: DataFrame,
                   map28: DataFrame): DataFrame = {
    val docWin = Window.partitionBy("doc_id").orderBy("pos")
    pos
      .withColumn("r7n",
        coalesce(lead(col("r"), PackW).over(docWin), lit(-1L)))
      .join(map14.select(col("k1"), col("k2"), col("id").as("l14")),
        col("r") === col("k1") && col("r7n") === col("k2"), "left")
      .drop("k1", "k2")
      .withColumn("l14n",
        coalesce(lead(col("l14"), 2 * PackW).over(docWin), lit(-1L)))
      .join(map28.select(col("k1"), col("k2"), col("id").as("l28")),
        col("l14") === col("k1") && col("l14n") === col("k2"), "left")
      .drop("k1", "k2")
  }

  /** The composed window KEY at each position: one array<long> element
    * per [[widthParts]] part, read by per-doc lead() at the part's
    * offset. Valid (all parts certify real bytes) only for positions
    * with pos <= len - minLen — callers filter first. Null labels
    * (delta grams absent from base) coalesce to -1, which no
    * base-minted id (>= 1), packed key (>= 0) or byte (1..255) ever
    * equals. */
  def windowKey(minLen: Long): Column = {
    val docWin = Window.partitionBy("doc_id").orderBy("pos")
    def at(c: Column, off: Long): Column =
      if (off == 0L) c else lead(c, off.toInt).over(docWin)
    array(widthParts(minLen).map { case (w, off) =>
      val part = w match {
        case 28 => at(col("l28"), off)
        case 14 => at(col("l14"), off)
        case 7 => at(col("r"), off)
        case 1 => shiftright(at(col("r"), off), 8 * (PackW - 1))
      }
      coalesce(part, lit(-1L))
    }: _*)
  }

  /** INCREMENTAL substring dedup — a NEW batch against the STANDING
    * suffix-index artifact, no rebuild (r18, VERDICT r17 item 4; the
    * minhashDelta asymmetric-join shape applied to suffix order). A
    * delta position p carries a base-duplicated window iff its
    * composed [[windowKey]] appears in the base's distinct window-key
    * table `tup` — and the union of [p, p+minLen) over matched p is
    * EXACTLY the union of all maximal >= minLen base-duplicated spans
    * (every char of such a span lies in some fully-contained minLen
    * window, and every matched window lies in such a span), so the
    * fixed-width matcher loses nothing against the variable-length
    * rebuild semantics. Delta-side cost: one positions scan + two
    * label joins + one semi-join, all equi-joins against persisted
    * read-only tables ([[SuffixIndex.deltaFor]]); the base never
    * rebuilds. Returns (doc_id, text, n_rm, sp) — n_rm = matched
    * window count — for [[applyDedupFrom]]. */
  def deltaSpans(delta: DataFrame, t: SuffixIndex.DeltaTables): DataFrame = {
    val d = delta
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val labeled = attachLabels(positions(d), t.map14, t.map28)
    val marked = labeled
      .withColumn("k", windowKey(t.minLen))
      .filter(col("pos") <= col("len") - t.minLen)
      .join(t.tup, Seq("k"), "left_semi")
      .select(col("doc_id"), col("pos").as("s"),
        (col("pos") + t.minLen).as("e"))
    markedToSpans(d, marked)
  }

  /** The cleaned corpus: kept segments glued back per doc, plus the
    * removal statistics. All row-local given [[dedupSpans]] — segment
    * extraction is BYTE-slice arithmetic over the merged intervals
    * (span offsets are byte offsets since the r18 byte-level pack, so
    * the kept pieces are cut from the UTF-8 encoding and decoded back;
    * on an ASCII corpus this is the identical char arithmetic). */
  def applyDedup(docs: DataFrame, minLen: Long): DataFrame =
    applyDedupFrom(dedupSpans(docs, minLen))

  /** [[applyDedup]]'s row-local reassembly stage over an
    * already-computed (doc_id, text, n_rm, sp) spans frame — the
    * composition point for artifact-served spans. */
  def applyDedupFrom(spans: DataFrame): DataFrame =
    spans
      .withColumn("bin", expr("encode(text, 'UTF-8')"))
      .select(col("doc_id"), col("n_rm"),
        expr("aggregate(sp, CAST(0 AS BIGINT), (a, x) -> a + x.e - x.s)")
          .as("rm_chars"),
        expr(
          """decode(aggregate(sequence(0, size(sp)), X'',
            |  (a, k) -> concat(a, substring(bin,
            |    CAST((CASE WHEN k = 0 THEN 0
            |          ELSE element_at(sp, k).e END) + 1 AS INT),
            |    CAST((CASE WHEN k = size(sp) THEN length(bin)
            |          ELSE element_at(sp, k + 1).s END)
            |      - (CASE WHEN k = 0 THEN 0
            |         ELSE element_at(sp, k).e END) AS INT)))), 'UTF-8')"""
            .stripMargin).as("clean_text"))
      .select(col("doc_id"), col("n_rm"), col("rm_chars"),
        length(col("clean_text")).cast("long").as("clean_len"),
        col("clean_text"))
}

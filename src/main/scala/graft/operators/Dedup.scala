package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection for document corpora (SURVEY.md §2 rows 29-31).
  *
  * Scale design: never all-pairs. Every variant generates candidate pairs
  * through an equi-join on a bounded-width key (rare shingle, minhash band
  * bucket, simhash band), so the shuffle is O(n·k) and the pair count is
  * bounded by posting-list caps — the standard LSH scale story. All hot
  * paths are codegen'd expressions (engine-portable rolling hashes, bit
  * ops, higher-order array functions); no UDFs — and because the hashes
  * are portable, every variant is hash-checked against the DuckDB oracle.
  */
object Dedup {

  /** Mersenne-ish prime for minhash universal hashing; small enough that
    * a*h+b stays well inside a 64-bit long under ANSI arithmetic. */
  private val P = 2147483647L

  /** Deterministic universal-hash coefficients (odd a, spread b). */
  private def coef(i: Int): (Long, Long) = {
    val a = ((i * 2654435761L + 1) % P) | 1L
    val b = (i * 40503L * 104729L + 12345L) % P
    (a, b)
  }

  /** Rolling polynomial hash of every k-shingle, one row per occurrence
    * (doc_id, s: long). Hash values are identical to folding
    * `(acc*mult + ascii(c)) % mod` over the shingle's characters — the
    * engine-portable form the DuckDB oracles replay — computed by the
    * native O(len) rolling-hash kernel (functions.ShingleHash): one tight
    * codegen'd loop per document, no per-char string rows, no interpreted
    * lambda folds. (History: the HOF form — split + per-position
    * aggregate-slice fold — measured 2.2 s of q_dedup_ngram_jaccard's
    * 5.7 s at sf0.1; the kernel makes the scan I/O-bound.) Docs shorter
    * than k chars hash to NULL -> explode emits nothing. */
  def shingleHashes(docs: DataFrame, k: Int, mult: Long, mod: Long): DataFrame =
    docs.select(col("doc_id"),
      explode(graft.functions.ShingleHash(col("text"), k, mult, mod)).as("s"))

  /** N-gram Jaccard near-dup pairs over rare shingles.
    *
    * Shingles with document frequency > maxDf are dropped before candidate
    * generation (they would blow the posting-list self-join and carry no
    * signal); Jaccard is computed over each document's *rare* shingle set.
    * Returns (ida, idb, shared, na, nb, jac) for jac >= minJac.
    */
  def ngramJaccard(docs: DataFrame, k: Int, maxDf: Int,
                   minJac: Double): DataFrame = {
    // One shuffle builds per-shingle posting ARRAYS (collect_set dedups
    // repeated shingles within a doc); the df cap is a size filter on the
    // array; candidate pairs are in-array combinations (<= maxDf^2 per
    // shingle) — no distinct, no df window, no posting self-join.
    // Set semantics make collect_set's nondeterministic order irrelevant.
    // Shingles are hashed to BIGINT (portable rolling hash) BEFORE the
    // shuffle: 8-byte keys instead of k-char strings. The oracle replays
    // the same hash, so results (collisions included) match exactly.
    val postings = shingleHashes(docs, k, 131L, 1000000007L)
      .groupBy("s")
      .agg(collect_set(col("doc_id")).as("ds"))
      .filter(size(col("ds")) <= maxDf)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = postings
      .select(explode(col("ds")).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
    // Pair expansion as TWO chained generators (explode a, then explode
    // the b > a survivors) instead of materializing the full n^2 struct
    // array per posting and filtering it. MEASURED (r7, honest
    // un-pruned plans): both forms time identically at sf0.1 (3.6s) —
    // the cost after the posting shuffle is the ~1M-row pair AGGREGATE
    // exchange, not the expansion — so the generator form is kept for
    // its zero struct allocation, not a wall-clock claim. Stage profile
    // (dev/ProfileJaccard, un-pruned): scan 0.33s, +postings 1.61s,
    // full 3.64s; the intrinsic floor is the posting + pair-agg
    // exchanges, the LSH-standard O(n·k) shape.
    val shared = postings
      .select(col("ds"), explode(col("ds")).as("ida"))
      .select(col("ida"),
        explode(filter(col("ds"), b => b > col("ida"))).as("idb"))
      .groupBy("ida", "idb")
      .agg(count(lit(1)).as("shared"))
    // sizes is one row per doc: small here, but NOT broadcast-safe at
    // corpus scale — leave join strategy to AQE (it broadcasts when the
    // runtime size allows).
    shared
      .join(sizes.select(col("doc_id").as("ida"), col("n").as("na")), "ida")
      .join(sizes.select(col("doc_id").as("idb"), col("n").as("nb")), "idb")
      .withColumn("jac",
        round(col("shared").cast("double")
          / (col("na") + col("nb") - col("shared")).cast("double"), 4))
      .filter(col("jac") >= minJac)
      .select("ida", "idb", "shared", "na", "nb", "jac")
  }

  /** One-sided CONTAINMENT near-dup pairs — the dedup case symmetric
    * Jaccard misses: a short document embedded in a long one (quoted
    * article, boilerplate-wrapped fragment — the Lee-et-al substring
    * case) has jac ≈ |A|/|B| ≈ 0 but containment |A∩B|/|A| ≈ 1.
    * Same scale shape as [[ngramJaccard]] (rare-shingle posting
    * arrays, in-array pair expansion, never all-pairs); the pair stats
    * yield BOTH directed containments and the contained side is the
    * one with the higher score (ties to ida). */
  def containmentPairs(docs: DataFrame, k: Int, maxDf: Int,
                       minCont: Double): DataFrame = {
    val postings = shingleHashes(docs, k, 131L, 1000000007L)
      .groupBy("s")
      .agg(collect_set(col("doc_id")).as("ds"))
      .filter(size(col("ds")) <= maxDf)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = postings
      .select(explode(col("ds")).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
    val shared = postings
      .select(col("ds"), explode(col("ds")).as("ida"))
      .select(col("ida"),
        explode(filter(col("ds"), b => b > col("ida"))).as("idb"))
      .groupBy("ida", "idb")
      .agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.select(col("doc_id").as("ida"), col("n").as("na")), "ida")
      .join(sizes.select(col("doc_id").as("idb"), col("n").as("nb")), "idb")
      .withColumn("cont_a",
        round(col("shared").cast("double") / col("na").cast("double"), 4))
      .withColumn("cont_b",
        round(col("shared").cast("double") / col("nb").cast("double"), 4))
      .filter(greatest(col("cont_a"), col("cont_b")) >= minCont)
      .withColumn("inner_id",
        when(col("cont_a") >= col("cont_b"), col("ida"))
          .otherwise(col("idb")))
      .select("ida", "idb", "shared", "na", "nb", "cont_a", "cont_b",
        "inner_id")
  }

  /** MinHash signatures: one row per doc with array<long> of numHashes
    * minimums. Single shuffle (groupBy doc_id) with map-side partial
    * aggregation — the 64 mins fold before the exchange. The shingle
    * hash is a polynomial rolling hash mod 2^31-1 (not xxhash64) so the
    * whole pipeline is engine-portable and oracle-checkable. */
  def minhashSignatures(docs: DataFrame, k: Int, numHashes: Int): DataFrame = {
    val sh = shingleHashes(docs, k, 31L, P).withColumnRenamed("s", "hp")
    val mins = (0 until numHashes).map { i =>
      val (a, b) = coef(i)
      min((lit(a) * col("hp") + lit(b)) % lit(P)).as(s"m$i")
    }
    sh.groupBy("doc_id")
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"),
        array((0 until numHashes).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** ROW-LOCAL minhash signatures: same (doc_id, sig) as
    * minhashSignatures but computed entirely inside one projection —
    * shingle hashes and the numHashes minima are array folds over a
    * per-document char-code array, with no explode and no groupBy (min
    * over all occurrences equals min over the distinct set). Docs
    * shorter than k chars drop out, as in the shuffle form. This is the
    * STREAMING-legal form (no per-doc aggregation); batch pipelines keep
    * the shuffle form, whose minima are codegen'd partial aggregates —
    * the interpreted HOF folds here are ~60x slower per doc and only
    * acceptable at micro-batch sizes. */
  def minhashSignaturesRowLocal(docs: DataFrame, k: Int,
                                numHashes: Int): DataFrame = {
    val codes = transform(
      filter(split(lower(col("text")), ""), c => length(c) > lit(0)),
      c => ascii(c).cast("long"))
    val shingles = when(size(col("codes")) >= k,
      transform(
        sequence(lit(1), size(col("codes")) - (k - 1)),
        i => aggregate(slice(col("codes"), i, lit(k)), lit(0L),
          (acc, c) => (acc * lit(31L) + c) % lit(P))))
    val sig = array((0 until numHashes).map { i =>
      val (a, b) = coef(i)
      array_min(transform(col("sh"), s => (lit(a) * s + lit(b)) % lit(P)))
    }: _*)
    docs
      .select(col("doc_id"), codes.as("codes"))
      .select(col("doc_id"), shingles.as("sh"))
      .filter(col("sh").isNotNull && size(col("sh")) > 0)
      .select(col("doc_id"), sig.as("sig"))
  }

  /** Band hashes of a signature array (bands x rowsPerBand fold). */
  private def bandHashExprs(numHashes: Int, bands: Int): Column =
    bandHashesOf(col("sig"), numHashes, bands)

  private def bandHashesOf(sig: Column, numHashes: Int, bands: Int): Column = {
    val rows = numHashes / bands
    array((0 until bands).map { bi =>
      aggregate(slice(sig, bi * rows + 1, rows), lit(0L),
        (acc, m) => (acc * lit(33L) + m) % lit(P))
    }: _*)
  }

  /** Row-local LSH band keys (doc_id, band, bh) — the streaming-legal
    * signature path (no per-doc aggregation). Signatures come from the
    * NATIVE MinHashSig kernel (bit-equal to both the shuffle pipeline
    * and the HOF row-local form, spec-asserted); the interpreted HOF
    * form this used to call is ~60x slower per doc, which made the
    * batch twin query the whole suite's straggler (164s of a 214s
    * bench run) before the switch. minhashSignaturesRowLocal stays as
    * the executable spec of the row-local semantics. */
  def minhashBandKeysRowLocal(docs: DataFrame, k: Int, numHashes: Int,
                              bands: Int): DataFrame =
    docs
      .select(col("doc_id"),
        graft.functions.MinHashSig(col("text"), k, numHashes).as("sig"))
      .filter(col("sig").isNotNull)
      .select(col("doc_id"),
        posexplode(bandHashExprs(numHashes, bands)).as(Seq("band", "bh")))

  /** MinHash + LSH banding: candidate pairs from band-bucket equi-joins,
    * verified by signature agreement (estimated Jaccard) >= minEst.
    * numHashes must be bands * rowsPerBand. */
  def minhashPairs(docs: DataFrame, k: Int, numHashes: Int, bands: Int,
                   minEst: Double): DataFrame = {
    // NATIVE row-local signature build (functions.MinHashSig): one tight
    // JVM loop per document, no shingle explode, no exchange. Bit-equal
    // to the shuffle pipeline AND the HOF row-local form (spec-asserted).
    // History: the HOF row-local form was 60x SLOWER than the shuffle
    // form (interpreted lambda folds); the native kernel beats both.
    // Materialize the signature table ONCE: both join sides consume it,
    // and without the lineage cut the kernel scans the corpus text twice
    // (once per side). 64 longs/doc is the standard signature-table
    // footprint an LSH dedup materializes at any scale — far smaller
    // than the text column it replaces.
    val sigs = docs
      .select(col("doc_id"),
        graft.functions.MinHashSig(col("text"), k, numHashes).as("sig"))
      .filter(col("sig").isNotNull)
      .localCheckpoint()
    val banded = sigs.select(col("doc_id"), col("sig"),
      posexplode(bandHashExprs(numHashes, bands)).as(Seq("band", "bh")))
    val a = banded.select(col("band"), col("bh"),
      col("doc_id").as("ida"), col("sig").as("siga"))
    val b = banded.select(col("band"), col("bh"),
      col("doc_id").as("idb"), col("sig").as("sigb"))
    // MIN-BAND pair dedup (the reference-point trick from Rects): a pair
    // matching in several bands would emerge once per band; instead of a
    // dropDuplicates shuffle over rows still carrying both 64-long sigs,
    // each joined row recomputes both docs' band hashes ROW-LOCALLY and
    // survives only in the FIRST band where they agree — the exact join
    // multiplicity, so the candidate set is unchanged (spec-asserted)
    // and the plan's only exchange is the band-bucket join. Band match
    // + signature agreement run as ONE native kernel call per candidate
    // (functions.MinHashPairEval) — the HOF fold/zip_with form of the
    // same math is CodegenFallback, interpreted once per joined row.
    a.join(b, Seq("band", "bh"))
      .filter(col("ida") < col("idb"))
      .withColumn("pe", graft.functions.MinHashPairEval(
        col("siga"), col("sigb"), numHashes, bands))
      .filter(col("band") === col("pe.first_band"))
      .withColumn("est", col("pe.est"))
      .filter(col("est") >= minEst)
      .select("ida", "idb", "est")
  }

  /** Cross-document duplicated SPANS (substring-level dedup, the
    * "Deduplicating Training Data Makes Language Models Better" shape):
    * documents sharing whole near-verbatim passages keep them even when
    * the documents as wholes are not near-dups. Every k-char shingle
    * position is hashed (native ShingleHash; posexplode supplies the
    * position for free — array order IS text order), shingles occurring
    * in >= 2 DISTINCT documents are found with a min!=max aggregate (no
    * count-distinct), flagged positions join back by shingle hash, and
    * per-document runs of consecutive flagged positions merge into
    * spans by the gaps-and-islands window (pos - row_number). Windows
    * partition by doc_id — high cardinality, so per-key volume is one
    * document's positions at any corpus size. Returns
    * (doc_id, span_start 0-based, span_end exclusive, n_shingles).
    *
    * Skew note (why an aggregate + join-back, not a window over s): a
    * measured window-min/max over s is ~30% faster on the test corpus,
    * but an ultra-common shingle (whitespace runs, boilerplate) pours
    * ALL its positions through one window task at corpus scale. The
    * aggregate map-side combines the hot key to one row per partition,
    * and `maxDf` drops stop-shingles from the dup table — bounding the
    * join-back's per-key fan-out AND keeping the table small enough
    * for AQE to broadcast it (Lee et al. cap duplicate-cluster sizes
    * the same way for tractability). */
  def duplicatedSpans(docs: DataFrame, k: Int, maxDf: Int): DataFrame = {
    // The per-position shingle table feeds BOTH the dup-shingle aggregate
    // and the join-back below; localCheckpoint materializes it once so the
    // posexplode+ShingleHash corpus scan runs once, not twice (the same
    // lineage cut that took qSplitStratified from 4.6x to 0.94x scaling).
    // Footprint is (long, int, long) per shingle position — the standard
    // positional-index artifact a substring-dedup pass materializes.
    val sh = docs
      .select(col("doc_id"),
        posexplode(graft.functions.ShingleHash(
          lower(col("text")), k, 131L, 1000000007L)).as(Seq("pos", "s")))
      .localCheckpoint()
    val dup = sh.groupBy("s")
      .agg(min("doc_id").as("mn"), max("doc_id").as("mx"),
        count(lit(1)).as("df"))
      .filter(col("mn") =!= col("mx") && col("df") <= maxDf)
      .select("s")
    val flagged = sh.join(dup, "s").select("doc_id", "pos")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    flagged
      .withColumn("grp", col("pos") - row_number().over(w))
      .groupBy("doc_id", "grp")
      .agg(min("pos").cast("long").as("span_start"),
        (max("pos") + k).cast("long").as("span_end"),
        count(lit(1)).as("n_shingles"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start")).as("span_len"),
        col("n_shingles"))
  }

  /** INCREMENTAL near-dup: dedup a new batch against an existing corpus
    * without comparing the corpus to itself — the production shape for
    * rolling ingestion (the full-corpus pair join never reruns; only
    * delta x index candidates are generated). Candidates come from the
    * asymmetric band-bucket equi-join of the delta's band keys against
    * the index's; each candidate is verified by ONE MinHashPairEval
    * kernel call with min-band dedup (a pair agreeing in several bands
    * survives only in its first agreeing band — no wide-row
    * dropDuplicates). Per delta doc the BEST match (highest estimated
    * Jaccard, smallest index id on ties — exact, since est = k/64 is a
    * dyadic rational) is selected by a lexicographic struct max, and
    * unmatched docs report (-1, 0.0, false).
    *
    * At corpus scale the index side is the PRECOMPUTED signature table
    * (64 longs/doc, the standard LSH index artifact — bucketed by
    * (band, bh) at write so the candidate join is co-located); here it
    * is derived inline so the oracle can replay end to end. */
  def minhashDelta(delta: DataFrame, index: DataFrame, k: Int,
                   numHashes: Int, bands: Int, minEst: Double): DataFrame = {
    def sigsOf(df: DataFrame) = df
      .select(col("doc_id"),
        graft.functions.MinHashSig(col("text"), k, numHashes).as("sig"))
      .filter(col("sig").isNotNull)
    val dsig = sigsOf(delta).localCheckpoint()
    val db = dsig.select(col("doc_id").as("nid"), col("sig").as("nsig"),
      posexplode(bandHashExprs(numHashes, bands)).as(Seq("band", "bh")))
    val ib = sigsOf(index)
      .select(col("doc_id").as("iid"), col("sig").as("isig"),
        posexplode(bandHashExprs(numHashes, bands)).as(Seq("band", "bh")))
    val cand = db.join(ib, Seq("band", "bh"))
      .withColumn("pe", graft.functions.MinHashPairEval(
        col("nsig"), col("isig"), numHashes, bands))
      .filter(col("band") === col("pe.first_band"))
      .filter(col("pe.est") >= minEst)
    val best = cand.groupBy("nid")
      .agg(max(struct(col("pe.est").as("e"), (-col("iid")).as("ni")))
        .as("m"))
    dsig.select(col("doc_id"))
      .join(best, col("doc_id") === col("nid"), "left")
      .select(col("doc_id"),
        coalesce(-col("m.ni"), lit(-1L)).as("matched_id"),
        coalesce(round(col("m.e"), 4), lit(0.0)).as("est"),
        col("nid").isNotNull.as("is_dup"))
  }

  /** Benchmark DECONTAMINATION: per corpus document, the fraction of its
    * distinct k-shingles that also appear anywhere in a benchmark set —
    * the n-gram-overlap test a training pipeline runs so evaluation data
    * does not leak into the corpus.
    *
    * Scale design: benchmark suites are orders of magnitude smaller than
    * the corpus, so the distinct benchmark-shingle set is BROADCAST and
    * the contamination count is a map-side semi-join — the corpus
    * streams once, no corpus-sized shuffle beyond the per-doc distinct.
    * Returns (doc_id, n_shingles, n_hits, ratio, flagged); docs shorter
    * than k chars have no shingles and drop out (mirrored by oracle). */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame, k: Int,
                    flagAt: Double): DataFrame = {
    // SINGLE corpus pass: mark each distinct (doc_id, shingle) row by a
    // broadcast LEFT join against the benchmark set, then count total
    // and hit shingles in ONE conditional aggregate. The r7 shape
    // derived `totals` and `hits` as two consumers of the distinct
    // table, so the corpus shingle scan + per-doc distinct exchange
    // executed twice and the results met in an extra join — 2.78 s at
    // sf0.1 vs 1.75 s for this form (dev/ProfileWeak stage split in
    // SURVEY §4: scan 0.34, +distinct 1.32 — the distinct exchange IS
    // the intrinsic floor). The broadcast join stays map-side; the only
    // exchanges are the (doc_id, s) distinct and the per-doc aggregate.
    val corpusSh = shingleHashes(corpus, k, 131L, 1000000007L)
      .select(col("doc_id"), col("s")).distinct()
    val benchSh = shingleHashes(benchmark, k, 131L, 1000000007L)
      .select(col("s")).distinct().withColumn("hit", lit(1L))
    corpusSh.join(broadcast(benchSh), Seq("s"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
      .select(col("doc_id"), col("n_shingles"), col("n_hits"),
        round(col("n_hits").cast("double")
          / col("n_shingles").cast("double"), 4).as("ratio"))
      .withColumn("flagged", col("ratio") >= flagAt)
  }

  /** Bloom-prefilter decontamination — the [[decontaminate]] shape for
    * the regime where the benchmark shingle set is too big to BROADCAST
    * exactly: a fixed 1 Mbit / 4-hash Bloom filter of the benchmark set
    * is the only thing the driver ships, corpus shingles test against it
    * map-side, and ONLY the pass-survivors (true hits + a few false
    * positives) flow into the exact equi-join that confirms them — the
    * semi-join-reduction / runtime-filter shape (Spark's own
    * InjectRuntimeFilter plants the same pattern under joins). The final
    * counts are EXACT: a Bloom filter has no false negatives, and the
    * confirm join removes its false positives; the filter only decides
    * how few rows shuffle.
    *
    * Filter build is ONE aggregate over benchmark shingles (probe
    * positions → bit_or per 32-bit word, map-side combined to ≤32768
    * rows) collected as a driver-sized model — the centroid/codebook
    * pattern. 32-bit words because DuckDB BIGINT `<<` range-checks bit
    * 63 (the simhash/dHash portability rule); the bit test is exact
    * dyadic arithmetic (w·2^-bit is exact for w < 2^32), no
    * column-amount shift needed on either engine.
    *
    * Returns (doc_id, n_shingles, n_bloom_pass, n_hits, n_false_pos,
    * ratio, flagged) — the diagnostic columns pin the FILTER itself, not
    * just the exact result, so the oracle independently replays bloom
    * membership as position-set containment (bit p is set iff some
    * benchmark probe lands on p — the packed words and the position set
    * define the same predicate). */
  def decontaminateBloom(corpus: DataFrame, benchmark: DataFrame, k: Int,
                         flagAt: Double): DataFrame = {
    val P = 1000000007L
    val MBits = 1048576L // 1 Mbit = 32768 x 32-bit words (256 KiB model)
    val coef = Seq((31L, 1L), (131L, 9177L), (1009L, 18353L),
      (65537L, 27529L))
    def posOf(s: Column, i: Int): Column =
      pmod(pmod(s * lit(coef(i)._1) + lit(coef(i)._2), lit(P)), lit(MBits))

    val benchSh = shingleHashes(benchmark, k, 131L, P)
      .select(col("s")).distinct()
    // build: probe positions -> (word, mask) -> bit_or per word
    val wordRows = benchSh
      .select(explode(array(coef.indices.map(i =>
        posOf(col("s"), i)): _*)).as("p"))
      .select(floor(col("p") / lit(32L)).cast("int").as("word"),
        pmod(col("p"), lit(32L)).cast("int").as("bit"))
      .groupBy("word")
      // 2^bit via exact dyadic double arithmetic, not a column shift
      .agg(bit_or(pow(lit(2.0), col("bit")).cast("long")).as("bits"))
      .collect()
    val words = new Array[Long](32768)
    wordRows.foreach(r => words(r.getInt(0)) = r.getLong(1))
    val bloom = typedLit(words.toSeq)

    def bitSet(p: Column): Column = {
      val w = element_at(bloom, (floor(p / lit(32L)) + lit(1L)).cast("int"))
      // w * 2^-bit, floored, parity — exact for 32-bit words
      pmod(floor(w.cast("double") *
        pow(lit(0.5), pmod(p, lit(32L)).cast("double"))).cast("long"),
        lit(2L)) === lit(1L)
    }
    val mightContain = coef.indices.map(i => bitSet(posOf(col("s"), i)))
      .reduce(_ && _)

    // one distinct-shingle scan feeds both the per-doc counts and the
    // confirm join — materialize it once (the multi-consumer lineage cut)
    val sh = shingleHashes(corpus, k, 131L, P)
      .select(col("doc_id"), col("s")).distinct()
      .withColumn("pass", mightContain)
      .localCheckpoint()
    val perDoc = sh.groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("pass"), 1L).otherwise(0L)).as("n_bloom_pass"))
    // the at-scale join: survivors only, NOT broadcast — the premise is
    // a benchmark set past broadcast size, so this is a plain equi-join
    // whose left side the bloom already collapsed
    val hits = sh.filter(col("pass")).join(benchSh, Seq("s"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
    perDoc.join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"), col("n_bloom_pass"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (col("n_bloom_pass") - coalesce(col("n_hits"), lit(0L)))
          .as("n_false_pos"),
        round(coalesce(col("n_hits"), lit(0L)).cast("double")
          / col("n_shingles").cast("double"), 4).as("ratio"))
      .withColumn("flagged", col("ratio") >= flagAt)
  }

  /** Transitive dedup clustering: connected components over a near-dup
    * pair table via min-label propagation, then a canonical (minimum)
    * doc id per component. `iters` bounds the component diameter handled
    * (near-dup components are shallow in practice; raise it for longer
    * chains). Each iteration is one equi-join + one min-aggregate —
    * no driver-side graph state. Docs in no pair are their own canonical.
    */
  def dedupClusters(docs: DataFrame, pairs: DataFrame,
                    iters: Int = 4, eagerCp: Boolean = true): DataFrame = {
    // The pair table may be an expensive pipeline (e.g. minhash LSH) and
    // every propagation iteration consumes it. localCheckpoint (eager)
    // runs that pipeline EXACTLY ONCE — before the src/dst union can
    // consume it twice — and, unlike persist, replaces the plan with a
    // flat scan of the materialized partitions. Without the lineage cut,
    // every hop's plan embeds the whole upstream tree plus all prior
    // hops, and Catalyst re-analyzes a super-linearly growing plan per
    // iteration — at scale, driver-side planning alone dominates.
    // Tradeoff: local checkpoints live on executors, so losing one mid-
    // job fails the job instead of recomputing from lineage. On
    // preemption-prone clusters set a reliable checkpoint dir and swap
    // these for Dataset.checkpoint — the plan shape is unchanged.
    // eagerCp: LAZY checkpoints (eager = false) were A/B'd in r18
    // (ProfileAb18 "cp") — same LogicalRDD plan cut, materialization
    // deferred into the consumer's action — and measured a tie
    // (min 2.21 eager vs 2.15 lazy, 2/4 wins): the per-hop driver
    // round-trip is noise against the hop's own shuffle. EAGER stays
    // the default; the flag keeps the A/B re-runnable.
    val p = pairs.select(col("ida"), col("idb"))
      .localCheckpoint(eager = eagerCp)
    val edges = p.select(col("ida").as("src"), col("idb").as("dst"))
      .union(p.select(col("idb").as("src"), col("ida").as("dst")))
    var labels = edges.select(col("src").as("node"))
      .distinct()
      .withColumn("label", col("node"))
      .localCheckpoint(eager = eagerCp)
    for (_ <- 1 to iters) {
      val fromNeighbors = edges
        .join(labels.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), col("label"))
      // the label table is O(docs-in-pairs) rows of two longs — tiny
      // relative to the corpus at any scale.
      labels = labels.union(fromNeighbors)
        .groupBy("node")
        .agg(min("label").as("label"))
        .localCheckpoint(eager = eagerCp)
    }
    docs.select(col("doc_id"))
      .join(labels.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("label"), col("doc_id")).as("canonical_id"))
      .withColumn("is_dup", col("doc_id") =!= col("canonical_id"))
  }

  /** 60-bit SimHash over whitespace tokens; near-dup pairs via 4x15-bit
    * band buckets, verified by Hamming distance <= maxHamming. Token
    * bits come from two polynomial rolling hashes (31x / 37x, mod 2^31-1,
    * 30 bits each) instead of xxhash64 so the pipeline has an exact
    * DuckDB twin. */
  def simhashPairs(docs: DataFrame, maxHamming: Int): DataFrame = {
    // Final 2654435761x mixing multiply spreads short tokens' small hash
    // values across all 30 bits (a bare rolling hash of a 3-char word
    // never touches the high bits, which would blow up band collisions).
    def fold(mult: Long) =
      (aggregate(filter(split(col("w"), ""), c => length(c) > lit(0)),
        lit(0L),
        (acc, c) => (acc * lit(mult) + ascii(c).cast("long")) % lit(P))
        * lit(2654435761L)) % lit(P)
    val toks = docs
      .select(col("doc_id"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .withColumn("h1", fold(31L))
      .withColumn("h2", fold(37L))
    val bitSums = (0 until 60).map { i =>
      val src = if (i < 30) col("h1") else col("h2")
      sum(when(shiftright(src, i % 30).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"b$i")
    }
    val sigs = toks.groupBy("doc_id")
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 60).map { i =>
          when(col(s"b$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
        }.reduceLeft((a, c) => a.bitwiseOR(c)).as("sig"))
    val bandVals = array((0 until 4).map { j =>
      shiftright(col("sig"), j * 15).bitwiseAND(lit(0x7FFFL))
    }: _*)
    val banded = sigs.select(col("doc_id"), col("sig"),
      posexplode(bandVals).as(Seq("band", "bv")))
    val a = banded.select(col("band"), col("bv"),
      col("doc_id").as("ida"), col("sig").as("siga"))
    val b = banded.select(col("band"), col("bv"),
      col("doc_id").as("idb"), col("sig").as("sigb"))
    // min-band pair dedup, as in minhashPairs: the 4 band values of each
    // 60-bit sig are recomputed row-locally, and the pair survives only
    // in the first band where they agree — no dropDuplicates shuffle.
    def bandOf(sig: Column, j: Int): Column =
      shiftright(sig, j * 15).bitwiseAND(lit(0x7FFFL))
    val firstMatchingBand = (0 until 4).reverse
      .foldLeft(lit(-1): Column) { (els, j) =>
        when(bandOf(col("siga"), j) === bandOf(col("sigb"), j), j)
          .otherwise(els)
      }
    a.join(b, Seq("band", "bv"))
      .filter(col("ida") < col("idb"))
      .filter(col("band") === firstMatchingBand)
      .withColumn("hamming",
        bit_count(col("siga").bitwiseXOR(col("sigb"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("ida", "idb", "hamming")
  }
}

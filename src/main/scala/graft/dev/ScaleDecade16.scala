package graft.dev

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.util.concurrent.atomic.AtomicLong

/** r16 SECOND decade (VERDICT r15 item 3, carried from r14 item 1):
  * the seven heavy-tail rows whose capacity rules were only ever
  * measured between 1x and 10x — q_entity_resolve, q_dedup_embedding,
  * q_dedup_containment, q_semdedup, q_dedup_evidence,
  * q_dedup_ngram_jaccard, q_item_cofreq — now probed at 100x
  * (sf0.1 x 100 = a three-point curve t1/t10/t100 measured on ONE
  * box), with the GrowthAttrib14 attribution triple (cand/out/wall)
  * at every scale and, per r14 item 6, the memory axis recorded
  * alongside: per-query shuffle-spill (memory+disk), shuffle bytes
  * written, and max per-task peak execution memory from TaskMetrics.
  *
  * 100x corpus = 10 outer copies of the ScaleDecade13 10x corpus,
  * with SECOND-LEVEL mutations so copy hygiene still holds (copies
  * must not be near-dups of each other, or candidate volume measures
  * the corpus artifact instead of the operator — the r13 ER lesson):
  *   - documents: outer copy j translates "bcdfg" by a per-j distinct
  *     digit map (inner copies mutated vowels/rstln/reversal; ~78% of
  *     16-shingles contain a b/c/d/f/g so cross-block jaccard of
  *     same-inner copies is ~0.12, under every query threshold);
  *   - embeddings: outer copy j flips the sign of the 16/64 dims
  *     where (i * (2j+3)) mod 64 < 16 — distinct odd multipliers mod
  *     64 give pairwise-distinct masks (and none equals the inner
  *     global negation), so cross-block cosine of same-inner vectors
  *     is ~0.5, under the near-dup thresholds;
  *   - customer is rebuilt from the sf0.1 BASE with 100 globally
  *     distinct digit permutations (Lehmer-decoded — composing outer
  *     and inner permutations cannot guarantee 100 distinct composite
  *     maps, and ER candidates inflate on any collision);
  *   - orders/lineitem: key shifts only (volume is the axis);
  *   - bounded dims stay 1x (their broadcast treatment is the point).
  * Emits SCALE_r16.json; an arg filters queries (a filtered run never
  * overwrites the committed record).
  */
object ScaleDecade16 {

  final class SpillListener extends SparkListener {
    val memSpill = new AtomicLong
    val diskSpill = new AtomicLong
    val shufWrite = new AtomicLong
    val peakExec = new AtomicLong
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null) {
        memSpill.addAndGet(m.memoryBytesSpilled)
        diskSpill.addAndGet(m.diskBytesSpilled)
        shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        peakExec.accumulateAndGet(m.peakExecutionMemory,
          (a: Long, b: Long) => math.max(a, b))
      }
    }
    def reset(): Unit = {
      memSpill.set(0); diskSpill.set(0); shufWrite.set(0); peakExec.set(0)
    }
    // listener bus is async; give in-flight task-end events a beat
    def snapshot(): (Long, Long, Long, Long) = {
      Thread.sleep(500)
      (memSpill.get, diskSpill.get, shufWrite.get, peakExec.get)
    }
  }

  /** k-th digit permutation as a translate target: Lehmer decode of
    * index k*1237+13 (< 10!, distinct k -> distinct permutation). */
  def permDigits(k: Int): String = {
    var idx = k.toLong * 1237L + 13L
    val digits = scala.collection.mutable.ArrayBuffer(
      '0', '1', '2', '3', '4', '5', '6', '7', '8', '9')
    val fact = Array(362880L, 40320L, 5040L, 720L, 120L, 24L, 6L, 2L, 1L, 1L)
    val sb = new StringBuilder
    for (f <- fact) {
      val q = (idx / f).toInt; idx %= f; sb += digits.remove(q)
    }
    sb.toString
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // partition-grain override for the spill-wall follow-ups: the 100x
    // rows that spill at 32 partitions re-measure at a
    // scale-proportional grain (the knob any real deployment turns)
    sys.env.get("SPARK_GRAFT_PARTS").foreach { p =>
      spark.conf.set("spark.sql.shuffle.partitions", p)
      println(s"SCALE16 shuffle.partitions=$p")
    }
    val d1 = "/root/testdata/sf0.1"
    val d10 = "/tmp/graft_scale13"
    val d100 = "/tmp/graft_scale16"
    val S = 100000000L   // inner (10x) id shift, ScaleDecade13's
    val OS = 10000000000L // outer (100x) id shift

    // ---- 10x corpus: the ScaleDecade13 builder, verbatim hygiene ----
    if (!new java.io.File(s"$d10/_built").exists()) {
      val docs1 = graft.Tables.load(spark, d1, "documents")
      (0 until 10).map { i =>
        val t = i match {
          case 0 => col("text")
          case 1 => translate(col("text"), "aeiou", "12345")
          case 2 => translate(col("text"), "aeiou", "67890")
          case 3 => reverse(col("text"))
          case 4 => reverse(translate(col("text"), "aeiou", "12345"))
          case 5 => reverse(translate(col("text"), "aeiou", "67890"))
          case 6 => translate(col("text"), "rstln", "12345")
          case 7 => translate(col("text"), "rstln", "67890")
          case 8 => translate(col("text"), "aeiou", "uoiea")
          case _ => reverse(translate(col("text"), "rstln", "12345"))
        }
        docs1.select((col("doc_id") + i * S).as("doc_id"), t.as("text"),
          col("lang"), col("source"))
      }.reduce(_ union _)
        .withColumn("n_chars", length(col("text")).cast("long"))
        .write.mode("overwrite").parquet(s"$d10/documents.parquet")

      val ev1 = spark.read.parquet(s"$d1/events.parquet")
      (0 until 10).map(i => ev1
          .withColumn("event_id", col("event_id") + i * S)
          .withColumn("user_id", col("user_id") + i * S))
        .reduce(_ union _)
        .write.mode("overwrite").parquet(s"$d10/events.parquet")

      val em1 = spark.read.parquet(s"$d1/embeddings.parquet")
      (0 until 10).map { i =>
        val base = i % 4 match {
          case 0 => col("embedding")
          case 1 => reverse(col("embedding"))
          case 2 => transform(col("embedding"), x => -x)
          case _ => transform(reverse(col("embedding")), x => -x)
        }
        val sc = Seq(1.0f, 0.5f, 0.25f)(i / 4)
        em1.select((col("vec_id") + i * S).as("vec_id"),
          transform(base, x => x * lit(sc)).as("embedding"), col("label"))
      }.reduce(_ union _)
        .write.mode("overwrite").parquet(s"$d10/embeddings.parquet")

      val digitMaps = Seq("0123456789", "9876543210", "1234567890",
        "5678901234", "2468013579", "1357924680", "3210987654",
        "4567890123", "8901234567", "6789012345")
      val c1 = spark.read.parquet(s"$d1/customer.parquet")
      (0 until 10).map(i => c1
          .withColumn("c_custkey", col("c_custkey") + i * S)
          .withColumn("c_name",
            translate(col("c_name"), "0123456789", digitMaps(i))))
        .reduce(_ union _)
        .write.mode("overwrite").parquet(s"$d10/customer.parquet")
      val o1 = spark.read.parquet(s"$d1/orders.parquet")
      (0 until 10).map(i => o1
          .withColumn("o_orderkey", col("o_orderkey") + i * S)
          .withColumn("o_custkey", col("o_custkey") + i * S))
        .reduce(_ union _)
        .write.mode("overwrite").parquet(s"$d10/orders.parquet")
      val li1 = spark.read.parquet(s"$d1/lineitem.parquet")
      (0 until 10).map(i => li1
          .withColumn("l_orderkey", col("l_orderkey") + i * S))
        .reduce(_ union _)
        .write.mode("overwrite").parquet(s"$d10/lineitem.parquet")
      for (t <- Seq("nation", "region", "supplier", "part"))
        spark.read.parquet(s"$d1/$t.parquet")
          .write.mode("overwrite").parquet(s"$d10/$t.parquet")
      new java.io.FileOutputStream(s"$d10/_built").close()
      println("built 10x corpus")
    }

    // ---- 100x corpus: 10 outer copies of the 10x corpus ----
    if (!new java.io.File(s"$d100/_built").exists()) {
      val outerMaps = Seq("", "01234", "56789", "13579", "02468",
        "97531", "86420", "24680", "75319", "43210")
      val docs10 = spark.read.parquet(s"$d10/documents.parquet")
      (0 until 10).map { j =>
        val t = if (j == 0) col("text")
          else translate(col("text"), "bcdfg", outerMaps(j))
        docs10.select((col("doc_id") + j * OS).as("doc_id"), t.as("text"),
          col("lang"), col("source"),
          length(t).cast("long").as("n_chars"))
      }.reduce(_ union _)
        .write.mode("overwrite").parquet(s"$d100/documents.parquet")

      val c1 = spark.read.parquet(s"$d1/customer.parquet")
      (0 until 100).map(k => c1
          .withColumn("c_custkey", col("c_custkey") + k * S)
          .withColumn("c_name",
            translate(col("c_name"), "0123456789", permDigits(k))))
        .reduce(_ union _)
        .write.mode("overwrite").parquet(s"$d100/customer.parquet")

      val o10 = spark.read.parquet(s"$d10/orders.parquet")
      (0 until 10).map(j => o10
          .withColumn("o_orderkey", col("o_orderkey") + j * OS)
          .withColumn("o_custkey", col("o_custkey") + j * OS))
        .reduce(_ union _)
        .write.mode("overwrite").parquet(s"$d100/orders.parquet")
      val li10 = spark.read.parquet(s"$d10/lineitem.parquet")
      (0 until 10).map(j => li10
          .withColumn("l_orderkey", col("l_orderkey") + j * OS))
        .reduce(_ union _)
        .write.mode("overwrite").parquet(s"$d100/lineitem.parquet")
      for (t <- Seq("nation", "region", "supplier", "part"))
        spark.read.parquet(s"$d1/$t.parquet")
          .write.mode("overwrite").parquet(s"$d100/$t.parquet")
      new java.io.FileOutputStream(s"$d100/_built").close()
      println("built 100x corpus")
    }

    // ---- 100x embeddings, v2 mutation (separate marker: the first
    // sweep measured the sign-mask-only copies and found them
    // UNDER-mutated — embeddings whose mass concentrates in dims the
    // mask skips keep cosine above the near-dup thresholds, and output
    // grew 45x/decade. v2 composes a per-block affine dim PERMUTATION
    // (a_j odd => bijection mod 64; moves concentrated mass to
    // uncorrelated dims regardless of the mass profile) with the sign
    // mask, so cross-block cosine is generically low for EVERY mass
    // profile and candidate volume measures the operator, not the
    // corpus artifact. ----
    if (!new java.io.File(s"$d100/_emb_v2").exists()) {
      val em10 = spark.read.parquet(s"$d10/embeddings.parquet")
      (0 until 10).map { j =>
        val e =
          if (j == 0) col("embedding")
          else {
            val a = 2 * j + 3 // odd, distinct per block, != 1
            val b = 11 * j + 5
            transform(sequence(lit(0), lit(63)), i => {
              val src = pmod(i * a + b, lit(64))
              val x = element_at(col("embedding"), (src + 1).cast("int"))
              when(pmod(i * (2 * j + 3), lit(64)) < 16, -x).otherwise(x)
            })
          }
        em10.select((col("vec_id") + j * OS).as("vec_id"),
          e.cast("array<float>").as("embedding"), col("label"))
      }.reduce(_ union _)
        .write.mode("overwrite").parquet(s"$d100/embeddings.parquet")
      new java.io.FileOutputStream(s"$d100/_emb_v2").close()
      println("built 100x embeddings v2")
    }

    // ---- candidate probes (GrowthAttrib14's, unchanged) ----
    def docsOf(d: String): DataFrame =
      graft.Tables.load(spark, d, "documents")
        .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    def pairsOfPostings(df: DataFrame, k: Int, maxDf: Int): Long =
      graft.operators.Dedup.shingleHashes(df, k, 131L, 1000000007L)
        .groupBy("s").agg(countDistinct(col("doc_id")).as("n"))
        .filter(col("n") <= maxDf)
        .agg(sum(expr("n * (n - 1) DIV 2"))).collect()(0).getLong(0)

    def candJaccard(d: String): Long = pairsOfPostings(docsOf(d), 16, 20)

    def candContainment(d: String): Long = {
      val base = docsOf(d)
      val frags = base.filter(col("doc_id") % 4 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          expr("substring(text, length(text) DIV 4 + 1, " +
            "length(text) DIV 2)").as("text"))
      pairsOfPostings(base.unionByName(frags), 16, 20)
    }

    def candEvidence(d: String): Long = {
      val docs = docsOf(d)
      val pairs = graft.operators.Dedup.minhashPairs(docs, 16,
        numHashes = 64, bands = 16, minEst = 0.2)
        .select(col("ida"), col("idb"))
      val nsh = docs.select(col("doc_id").as("ida"),
        (greatest(length(col("text")) - 15, lit(1)))
          .cast("long").as("ns"))
      pairs.join(nsh, Seq("ida"))
        .agg(sum("ns")).collect()(0).getLong(0)
    }

    def candSemdedup(d: String): Long = {
      val e = graft.Tables.load(spark, d, "embeddings")
        .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
      val n = math.max(e.count(), 1L)
      val nlist = math.max(16L, n / 125L).toInt
      val tag = ("sd16_" + d).replaceAll("[^A-Za-z0-9]", "_")
      graft.sources.Bucketed.cleanupOnExit(s"/tmp/graft_sd16/$tag")
      val (_, idx) = graft.operators.Ann.coarseIndex(e, nlist, iters = 2,
        dim = 64, table = s"sd16$tag", path = s"/tmp/graft_sd16/$tag")
      idx.groupBy("cluster").agg(count(lit(1)).as("n"))
        .agg(sum(expr("n * (n - 1) DIV 2"))).collect()(0).getLong(0)
    }

    def candEmbedding(d: String): Long = {
      val e = graft.Tables.load(spark, d, "embeddings")
        .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
      val n = math.max(e.count(), 1L)
      val planes = math.max(8,
        math.ceil(math.log(n / 8.0) / math.log(2.0)).toInt)
      e.select(graft.operators.Ann.hyperplaneBucket(
          transform(col("embedding"), x => x.cast("double")), planes, 64)
          .as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n"))
        .agg(sum(expr("n * (n - 1) DIV 2"))).collect()(0).getLong(0)
    }

    def candEntity(d: String): Long = {
      val customer = graft.Tables.load(spark, d, "customer")
      // NO localCheckpoint here (unlike GrowthAttrib14): at 100x the
      // deserialized disk form of the 90M-row posting table plus the
      // candidate join's shuffle files exceeded this box's ~78 GB free
      // and killed the whole run (r16 first attempt). The probe only
      // needs a COUNT — recomputing the deterministic lineage per use
      // trades CPU for disk.
      val names = graft.queries.Analytics.entityMasterNames(customer)
      val cg5 = graft.queries.Analytics.entityBlockingPostings(names, 5) // fixed width: the saturation this harness documents
      val dfTab = cg5.groupBy("ge").agg(count(lit(1)).as("df"))
      val p = (lit(11L) + pmod(col("ckey"), lit(8L))).cast("int")
      val dirty = names.select(col("ckey").as("rid"),
        concat(substring(col("name"), lit(1), p - 1),
          substring(col("name"), p + 1, lit(64))).as("name"))
      def encGram(g: Column) =
        ((((ascii(substring(g, 1, 1)) * 128L
          + ascii(substring(g, 2, 1))) * 128L
          + ascii(substring(g, 3, 1))) * 128L
          + ascii(substring(g, 4, 1))) * 128L
          + ascii(substring(g, 5, 1))).cast("long")
      val dg5 = dirty
        .select(col("rid"), col("name"), array_distinct(transform(
          sequence(lit(1), greatest(length(col("name")) - 4, lit(1))),
          i => substring(col("name"), i.cast("int"), lit(5)))).as("gs"))
        .select(col("rid"), length(col("name")).cast("long").as("dl"),
          explode(col("gs")).as("g"))
        .select(col("rid"), col("dl"), encGram(col("g")).as("ge"))
      val probesAll = dg5.join(dfTab, Seq("ge"))
        .groupBy("rid", "dl")
        .agg(graft.functions.TopKAgg(col("df").cast("double"), col("ge"),
          col("ge"), 4).as("beam"))
        .select(col("rid"), col("dl"), explode(col("beam")).as("b"))
        .select(col("rid"), col("dl"),
          col("b").getField("payload").as("ge"))
      probesAll.join(cg5, Seq("ge"))
        .filter(abs(col("dl") - col("cl")) <= 1)
        .select(col("rid"), col("ckey")).distinct().count()
    }

    def candCofreq(d: String): Long = {
      val Cap = 48
      val b0 = graft.Tables.load(spark, d, "lineitem")
        .select(col("l_orderkey").cast("long").as("ok"),
          col("l_partkey").cast("long").as("i"))
        .join(graft.Tables.load(spark, d, "orders")
          .select(col("o_orderkey").cast("long").as("ok"),
            col("o_custkey").cast("long").as("u")), "ok")
        .select("u", "i").distinct()
      val sizes = b0.groupBy("u").agg(count(lit(1)).as("sz"))
      b0.join(sizes, Seq("u"))
        .filter(col("sz") <= Cap ||
          (col("u") * 31 + col("i") * 17) % col("sz") < Cap)
        .groupBy("u").agg(count(lit(1)).as("n"))
        .agg(sum(expr("n * (n - 1) DIV 2"))).collect()(0).getLong(0)
    }

    val candProbes: Map[String, String => Long] = Map(
      "q_dedup_ngram_jaccard" -> candJaccard,
      "q_dedup_containment" -> candContainment,
      "q_dedup_evidence" -> candEvidence,
      "q_semdedup" -> candSemdedup,
      "q_dedup_embedding" -> candEmbedding,
      "q_entity_resolve" -> candEntity,
      "q_item_cofreq" -> candCofreq)

    // ---- measurement ----
    val listener = new SpillListener
    spark.sparkContext.addSparkListener(listener)

    def run(q: String, d: String): Long =
      graft.SparkEntry.queries(q)(spark, d).queryExecution.toRdd.count()
    def clear(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      // nudge the ContextCleaner: unreferenced shuffles only get their
      // files deleted after a GC notices the dead references — at 100x
      // a block's shuffle files are tens of GB and the next block needs
      // the disk back
      System.gc()
      Thread.sleep(300)
    }
    // min-of-2 unless the first pass exceeds 300s (the 100x budget
    // guard; a single >5-minute point is already the answer)
    def timed(q: String, d: String): (Double, Long, (Long, Long, Long, Long)) = {
      def once(): (Double, Long, (Long, Long, Long, Long)) = {
        listener.reset()
        val t0 = System.nanoTime(); val n = run(q, d)
        val wall = (System.nanoTime() - t0) / 1e9
        val sp = listener.snapshot(); clear()
        (wall, n, sp)
      }
      val a = once()
      if (a._1 > 300.0) a
      else { val b = once()
        assert(a._2 == b._2, s"$q nondeterministic: ${a._2} vs ${b._2}")
        if (a._1 <= b._1) a else b }
    }

    // q_entity_resolve LAST: it is the one block whose 100x disk
    // footprint brushed this box's limit — if it dies, the other six
    // results are already on disk (incremental write below)
    val heavy = Seq("q_dedup_embedding",
      "q_dedup_containment", "q_semdedup", "q_dedup_evidence",
      "q_dedup_ngram_jaccard", "q_item_cofreq", "q_entity_resolve")
    val onlyArg = args.headOption
    val todo = onlyArg match {
      case Some(p) => heavy.filter(_.contains(p))
      case None => heavy
    }

    // JIT/codegen warm pass at sf0.01
    todo.foreach { q =>
      try { run(q, "/root/testdata/sf0.01") }
      catch { case scala.util.control.NonFatal(_) => () }
      clear()
    }

    def num(v: Double) =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    def spJson(sp: (Long, Long, Long, Long)) =
      s"""{"spill_mem":${sp._1},"spill_disk":${sp._2},""" +
        s""""shuffle_write":${sp._3},"peak_task_exec_mem":${sp._4}}"""

    val header =
      s""""base":"$d1","factors":[1,10,100],""" +
        """"method":"second decade on the r14 heavy tail: three-point cand/out/wall curve on one box, min-of-2 per scale after sf0.01 warm (single pass past 300s), 100x corpus = 10 second-level-mutated copies of the 10x corpus (docs: per-block consonant translate; embeddings v2 = per-block affine dim permutation composed with the 16/64 sign mask, _emb_v2 marker; customer: 100 Lehmer-distinct digit permutations from base; dims 1x); metrics = TaskMetrics sums over the faster pass""""
    val done = scala.collection.mutable.ArrayBuffer[String]()
    def flush(): Unit = if (onlyArg.isEmpty)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("SCALE_r16.json"),
        "{" + header + s""","queries":{${done.mkString(",")}}}""" + "\n")
    // each block isolated: one query's disk blowup (the r16 first
    // attempt died on ENOSPC inside the ER probe) must not void the
    // others; partial results land on disk immediately
    todo.foreach { q =>
      try {
        val c1 = candProbes(q)(d1); clear()
        val c10 = candProbes(q)(d10); clear()
        val c100 = candProbes(q)(d100); clear()
        val (t1, o1, _) = timed(q, d1)
        val (t10, o10, sp10) = timed(q, d10)
        val (t100, o100, sp100) = timed(q, d100)
        println(f"SCALE16 $q%-24s cand $c1%9d -> $c10%11d -> $c100%12d " +
          f"(x10 ${c10.toDouble / c1}%5.2f, x100/x10 ${c100.toDouble / c10}%5.2f)")
        println(f"SCALE16 $q%-24s out  $o1%9d -> $o10%11d -> $o100%12d  " +
          f"wall $t1%5.2f -> $t10%6.2f -> $t100%7.2f " +
          f"(x10 ${t10 / t1}%5.2f, x100/x10 ${t100 / t10}%5.2f)")
        println(f"SCALE16 $q%-24s spill100 mem=${sp100._1}%d disk=${sp100._2}%d " +
          f"shufW=${sp100._3}%d peakTask=${sp100._4}%d")
        done += s""""$q":{"t1":${num(t1)},"t10":${num(t10)},"t100":${num(t100)},""" +
          s""""ratio10":${num(t10 / t1)},"ratio100_10":${num(t100 / t10)},""" +
          s""""cand1":$c1,"cand10":$c10,"cand100":$c100,""" +
          s""""cand_ratio10":${num(c10.toDouble / c1)},""" +
          s""""cand_ratio100_10":${num(c100.toDouble / c10)},""" +
          s""""out1":$o1,"out10":$o10,"out100":$o100,""" +
          s""""metrics10":${spJson(sp10)},"metrics100":${spJson(sp100)}}"""
      } catch {
        // NonFatal only (ADVICE r16): an OutOfMemoryError or other
        // fatal JVM error must not be swallowed — subsequent timings
        // from a corrupted JVM would be misleading. Record the error
        // entry, flush partial results, then RETHROW fatal ones.
        // The one fatal-adjacent case kept recoverable: the disk-full
        // IOException path (ENOSPC killed the first r16 ER probe) is
        // already NonFatal and lands in the first case.
        case scala.util.control.NonFatal(e) =>
          println(s"SCALE16FAIL $q: ${e.getClass.getSimpleName} " +
            s"${String.valueOf(e.getMessage).take(200)}")
          done += s""""$q":{"error":${"\"" + e.getClass.getSimpleName + "\""}}"""
          clear()
        case e: Throwable =>
          done += s""""$q":{"error":${"\"" + e.getClass.getSimpleName + "\""}}"""
          flush()
          throw e
      }
      flush()
    }
    println("{" + header + s""","queries":{${done.mkString(",")}}}""")
    spark.stop()
  }
}

package graft.dev

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r14 decade ATTRIBUTION (VERDICT r13 item 1): extend the
  * RectsGrowth13 output-vs-wall method to every 4-10x SCALE_r13 row.
  * For each such query, measure at sf0.1 vs the materialized 10x
  * corpus (/tmp/graft_scale13, same builder as ScaleDecade13):
  *   - cand: the DOMINANT pre-verify candidate volume (the thing the
  *     plan's big join actually enumerates — per-query probe below),
  *   - out:  final output rows of the production query,
  *   - wall: fresh min-of-2 wall at both scales.
  * A row is PLAN-DEFECTIVE only if its wall ratio materially exceeds
  * its candidate growth; a row whose candidates themselves grow ~kx
  * is candidate/output-bound — the optimum for a pair enumerator.
  * Also measures the decade walls of the 5 queries NEW in r14 (no
  * SCALE_r13 row exists for them). Emits SCALE_r14.json.
  */
object GrowthAttrib14 {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d1 = "/root/testdata/sf0.1"
    val d10 = "/tmp/graft_scale13"
    require(new java.io.File(s"$d10/_built").exists(),
      "10x corpus missing — run ScaleDecade13 once to build it")

    def docsOf(d: String): DataFrame =
      graft.Tables.load(spark, d, "documents")
        .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    def pairsOfPostings(df: DataFrame, k: Int, maxDf: Int): Long = {
      // sum over shingles of C(n,2), n <= maxDf — the posting-join
      // pair-expansion volume of the jaccard/containment family
      graft.operators.Dedup.shingleHashes(df, k, 131L, 1000000007L)
        .groupBy("s").agg(countDistinct(col("doc_id")).as("n"))
        .filter(col("n") <= maxDf)
        .agg(sum(expr("n * (n - 1) DIV 2"))).collect()(0).getLong(0)
    }

    // ---- per-query candidate probes ----
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
      // dominant stage: candidate pairs x the left side's positional
      // shingles (the first join of the evidence chain)
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
      val tag = ("ga14_" + d).replaceAll("[^A-Za-z0-9]", "_")
      graft.sources.Bucketed.cleanupOnExit(s"/tmp/graft_ga14/$tag")
      val (_, idx) = graft.operators.Ann.coarseIndex(e, nlist, iters = 2,
        dim = 64, table = s"ga14$tag", path = s"/tmp/graft_ga14/$tag")
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
      // the pass-1 candidate set (probesAll join cg5, length filter,
      // distinct) — replica of the production blocking chain, the
      // ProfileEntity13 stage probe
      val customer = graft.Tables.load(spark, d, "customer")
      val names = graft.queries.Analytics.entityMasterNames(customer)
        .localCheckpoint()
      // fixed width 5: the historical shape this harness measured
      val cg5 = graft.queries.Analytics.entityBlockingPostings(names, 5)
        .localCheckpoint()
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

    def run(q: String, d: String): Long =
      graft.SparkEntry.queries(q)(spark, d).queryExecution.toRdd.count()
    def clear(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    def minOf2(q: String, d: String): (Double, Long) = {
      def once(): (Double, Long) = {
        val t0 = System.nanoTime(); val n = run(q, d); clear()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val (a, b) = (once(), once())
      assert(a._2 == b._2, s"$q nondeterministic: ${a._2} vs ${b._2}")
      (math.min(a._1, b._1), a._2)
    }

    val attributed = Seq("q_dedup_embedding", "q_entity_resolve",
      "q_dedup_containment", "q_semdedup", "q_dedup_evidence",
      "q_dedup_ngram_jaccard", "q_item_cofreq")
    val newRows = Seq("q_multimodal_pdf_xrefstream", "q_unigram_train",
      "q_unigram_fertility", "q_dedup_crossmodal", "q_clip_rings_general")

    // warm pass (JIT + codegen) at sf0.01
    (attributed ++ newRows).foreach { q =>
      try { run(q, "/root/testdata/sf0.01") }
      catch { case _: Throwable => () }
      clear()
    }

    def num(v: Double) =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))

    val attrJson = attributed.map { q =>
      val c1 = candProbes(q)(d1); clear()
      val c10 = candProbes(q)(d10); clear()
      val (t1, o1) = minOf2(q, d1)
      val (t10, o10) = minOf2(q, d10)
      println(f"ATTR $q%-24s cand $c1%10d -> $c10%11d (${c10.toDouble / c1}%5.2fx)  " +
        f"out $o1%8d -> $o10%9d (${o10.toDouble / math.max(o1, 1)}%5.2fx)  " +
        f"wall $t1%5.2f -> $t10%6.2f (${t10 / t1}%5.2fx)")
      s""""$q":{"t1":${num(t1)},"t10":${num(t10)},"ratio":${num(t10 / t1)},""" +
        s""""cand1":$c1,"cand10":$c10,"cand_ratio":${num(c10.toDouble / c1)},""" +
        s""""out1":$o1,"out10":$o10,"out_ratio":${num(o10.toDouble / math.max(o1, 1))}}"""
    }
    val newJson = newRows.map { q =>
      val (t1, o1) = minOf2(q, d1)
      val (t10, o10) = minOf2(q, d10)
      println(f"NEW  $q%-28s out $o1%8d -> $o10%9d  wall $t1%5.2f -> $t10%6.2f (${t10 / t1}%5.2fx)")
      s""""$q":{"t1":${num(t1)},"t10":${num(t10)},"ratio":${num(t10 / t1)},""" +
        s""""out1":$o1,"out10":$o10,"out_ratio":${num(o10.toDouble / math.max(o1, 1))}}"""
    }
    val json = "{" +
      s""""base":"$d1","factor":10,""" +
      """"method":"RectsGrowth attribution for every 4-10x SCALE_r13 row: cand = dominant pre-verify candidate volume (per-query probe), out = production output rows, wall = min-of-2 after sf0.01 warm; full-suite decade remains SCALE_r13.json; new r14 rows measured wall+out",""" +
      s""""attributed":{${attrJson.mkString(",")}},""" +
      s""""new_queries":{${newJson.mkString(",")}}}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("SCALE_r14.json"), json + "\n")
    println("wrote SCALE_r14.json")
    spark.stop()
  }
}

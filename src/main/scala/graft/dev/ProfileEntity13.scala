package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r13 stage profile of the CURRENT entityResolve pipeline: where do
  * the ~8-10 s at sf0.1 actually go after the threshold-1 pass-1
  * rewrite — artifact builds (names/cg5 checkpoints), the df table,
  * the probe heap, the candidate join, pass-1 scoring, or retry? */
object ProfileEntity13 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stage] $label%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    // warm at sf0.01 first so JIT/codegen cost doesn't land on stage 1
    graft.queries.Analytics.qEntityResolve(spark, "/root/testdata/sf0.01")
      .queryExecution.toRdd.count()
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))

    val customer = graft.Tables.load(spark, dir, "customer")
    val names = t("names checkpoint") {
      graft.queries.Analytics.entityMasterNames(customer).localCheckpoint()
    }
    val cg5 = t("cg5 checkpoint") {
      graft.queries.Analytics.entityBlockingPostings(names, 5).localCheckpoint() // fixed width: the historical shape this harness measured
    }
    println(s"[stage] cg5 rows=${cg5.count()}")
    val dfTab = cg5.groupBy("ge").agg(count(lit(1)).as("df"))
    val full = t("resolveOn end-to-end") {
      graft.queries.Analytics.entityResolveOn(names, cg5, dfTab, 5)
        .queryExecution.toRdd.count()
    }
    println(s"[stage] out rows=$full")

    // ---- faithful stage replica of the current resolveOn ----
    val c = names
    val p = (lit(11L) + pmod(col("ckey"), lit(8L))).cast("int")
    val dirty = c.select(col("ckey").as("rid"),
      concat(substring(col("name"), lit(1), p - 1),
        substring(col("name"), p + 1, lit(64))).as("name"))
    def gramArr(df: DataFrame, id: String, q: Int): DataFrame = df
      .select(col(id), col("name"), array_distinct(transform(
        sequence(lit(1), greatest(length(col("name")) - (q - 1), lit(1))),
        i => substring(col("name"), i.cast("int"), lit(q)))).as("gs"))
    def encGram(g: org.apache.spark.sql.Column) =
      ((((ascii(substring(g, 1, 1)) * 128L
        + ascii(substring(g, 2, 1))) * 128L
        + ascii(substring(g, 3, 1))) * 128L
        + ascii(substring(g, 4, 1))) * 128L
        + ascii(substring(g, 5, 1))).cast("long")
    val cArr = gramArr(c.select(col("ckey"), col("name")), "ckey", 3)
      .select(col("ckey"), col("name").as("cn"), col("gs").as("gs_c"))
    val dArr = gramArr(dirty, "rid", 3)
      .select(col("rid"), col("name").as("dn"), col("gs"))
    val dg5 = gramArr(dirty, "rid", 5)
      .select(col("rid"), length(col("name")).cast("long").as("dl"),
        explode(col("gs")).as("g"))
      .select(col("rid"), col("dl"), encGram(col("g")).as("ge"))
    t("dg5 build only") { dg5.queryExecution.toRdd.count() }
    // cheaper encoding: one char-code array, then 5-gram codes by
    // element_at arithmetic — no gram strings, no per-gram substr.
    // MEASURED 0.74 s vs 0.99 s — a 0.25 s gain that buys ANSI
    // element_at out-of-bounds risk on short names; not adopted.
    val dg5b = dirty.select(col("rid"),
      length(col("name")).cast("long").as("dl"),
      transform(sequence(lit(1), length(col("name"))),
        i => ascii(substring(col("name"), i.cast("int"), lit(1)))
          .cast("long")).as("codes"))
      .select(col("rid"), col("dl"),
        explode(array_distinct(transform(
          sequence(lit(1L), greatest(col("dl") - 4, lit(1L))),
          i => element_at(col("codes"), i.cast("int")) * lit(128L * 128 * 128 * 128)
            + element_at(col("codes"), (i + 1).cast("int")) * lit(128L * 128 * 128)
            + element_at(col("codes"), (i + 2).cast("int")) * lit(128L * 128)
            + element_at(col("codes"), (i + 3).cast("int")) * lit(128L)
            + element_at(col("codes"), (i + 4).cast("int"))))).as("ge"))
    t("dg5b build only") { dg5b.queryExecution.toRdd.count() }
    val probesAll = t("probesAll (heap)") {
      dg5.join(dfTab, Seq("ge"))
        .groupBy("rid", "dl")
        .agg(graft.functions.TopKAgg(col("df").cast("double"), col("ge"),
          col("ge"), 4).as("beam"))
        .select(col("rid"), col("dl"), explode(col("beam")).as("b"))
        .select(col("rid"), col("dl"), col("b").getField("payload").as("ge"))
        .localCheckpoint()
    }
    val cand1 = t("cand1 join+distinct") {
      probesAll.join(cg5, Seq("ge"))
        .filter(abs(col("dl") - col("cl")) <= 1)
        .select(col("rid"), col("ckey")).distinct()
        .localCheckpoint()
    }
    println(s"[stage] cand1 rows=${cand1.count()}")
    def score(cand: DataFrame, threshold: Option[Int]): DataFrame = cand
      .join(dArr, Seq("rid"))
      .join(cArr, Seq("ckey"))
      .select(col("rid"), col("ckey"),
        threshold.fold(levenshtein(col("dn"), col("cn")))(tt =>
          levenshtein(col("dn"), col("cn"), tt))
          .cast("double").as("lev"),
        size(array_intersect(col("gs"), col("gs_c"))).cast("long")
          .as("shared"),
        size(col("gs")).cast("long").as("nb"),
        size(col("gs_c")).cast("long").as("na"))
      .filter(col("lev") >= 0.0)
      .select(col("rid"), col("ckey"), col("lev"),
        round(col("shared").cast("double")
          / (col("na") + col("nb") - col("shared")).cast("double"), 4)
          .as("jac"))
    val keyOf = (d: DataFrame) => d.groupBy("rid")
      .agg(graft.functions.TopKAgg(
        col("lev") * 2 + (lit(1.0) - col("jac")), col("ckey"),
        col("ckey"), 1).as("tk"))
      .select(col("rid"),
        element_at(col("tk"), 1).getField("payload").as("matched_key"),
        element_at(col("tk"), 1).getField("key").as("k"))
    val best1 = t("best1 score+heap") {
      keyOf(score(cand1, Some(1))).localCheckpoint()
    }
    println(s"[stage] best1 rows=${best1.count()}")
    // lev-only and jac-only scoring variants to attribute the cost
    t("score lev-only thr1") {
      cand1.join(dArr.select("rid", "dn"), Seq("rid"))
        .join(cArr.select("ckey", "cn"), Seq("ckey"))
        .select(col("rid"), levenshtein(col("dn"), col("cn"), 1).as("lev"))
        .queryExecution.toRdd.count()
    }
    t("score lev-only full") {
      cand1.join(dArr.select("rid", "dn"), Seq("rid"))
        .join(cArr.select("ckey", "cn"), Seq("ckey"))
        .select(col("rid"), levenshtein(col("dn"), col("cn")).as("lev"))
        .queryExecution.toRdd.count()
    }
    t("score jac-only") {
      cand1.join(dArr, Seq("rid")).join(cArr, Seq("ckey"))
        .select(col("rid"),
          size(array_intersect(col("gs"), col("gs_c"))).as("sh"))
        .queryExecution.toRdd.count()
    }
    t("cand1 joins only") {
      cand1.join(dArr.select("rid", "dn"), Seq("rid"))
        .join(cArr.select("ckey", "cn"), Seq("ckey"))
        .queryExecution.toRdd.count()
    }
    val retryIds = dirty.select(col("rid"))
      .join(best1.select("rid"), Seq("rid"), "left_anti")
    println(s"[stage] retry rids=${retryIds.count()}")
    val cand2 = dirty.join(retryIds, Seq("rid"))
      .select(col("rid"), length(col("name")).cast("long").as("dl"),
        expr("right(name, 12)").as("tk"))
      .join(c.select(col("ckey"), length(col("name")).cast("long")
        .as("cl"), expr("right(name, 12)").as("tk")), Seq("tk"))
      .filter(abs(col("dl") - col("cl")) <= 1)
      .select(col("rid"), col("ckey"))
    val cand1r = cand1.join(retryIds, Seq("rid")).localCheckpoint()
    val cand2k = cand2.localCheckpoint()
    println(s"[stage] cand1-retry rows=${cand1r.count()} cand2 rows=${cand2k.count()}")
    val candRetry = cand1r.unionByName(cand2k)
    t("retry score+heap") {
      keyOf(score(candRetry, None)).queryExecution.toRdd.count()
    }
    // staged retry: threshold-1 over cand2 first, exact DP only for
    // the doubly-residual rids
    val best2a = t("retry2a cand2 thr1") {
      keyOf(score(cand2k, Some(1))).localCheckpoint()
    }
    println(s"[stage] best2a rows=${best2a.count()}")
    val retry2 = retryIds.join(best2a.select("rid"), Seq("rid"), "left_anti")
      .localCheckpoint()
    println(s"[stage] retry2 rids=${retry2.count()}")
    t("retry2b exact") {
      keyOf(score(cand1r.join(retry2, Seq("rid"))
        .unionByName(cand2k.join(retry2, Seq("rid"))), None))
        .queryExecution.toRdd.count()
    }
    // second run, everything warm
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    val t0 = System.nanoTime()
    val n2 = graft.queries.Analytics.qEntityResolve(spark, dir)
      .queryExecution.toRdd.count()
    println(f"[stage] full qEntityResolve   ${(System.nanoTime() - t0) / 1e9}%6.2f s rows=$n2")
    spark.stop()
  }
}

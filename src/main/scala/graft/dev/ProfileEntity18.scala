package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r18 ER third-decade probe (VERDICT r17 item 3 groundwork): BEFORE
  * choosing the df-cap design, measure what the pass-1 candidate mass
  * actually is at 10x/100x under adaptive gram width —
  *  (a) the blocking-gram df distribution (is the namespace saturated
  *      or skewed?),
  *  (b) the per-record rarest-4 profile (what df do the CHOSEN probes
  *      carry — the per-record candidate bound is their sum),
  *  (c) counterfactual candidate totals + retry sizes under a hard
  *      probe-side df cap (grams with df > cap ineligible as probes;
  *      records whose every gram exceeds the cap fall to the exact
  *      tail-block rescue) for cap ∈ {16..1024}.
  * Decision data only — no engine behavior changes here. */
object ProfileEntity18 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dirs = Seq("/root/testdata/sf0.1", "/tmp/graft_scale13",
      "/tmp/graft_scale16").filter(d =>
      new java.io.File(s"$d/customer.parquet").exists())
    for (d <- dirs) {
      graft.Tune.forInput(spark, d)
      val customer = spark.read.parquet(s"$d/customer.parquet")
      val names = graft.queries.Analytics.entityMasterNames(customer)
        .localCheckpoint()
      val n = names.count()
      val g = graft.queries.Analytics.adaptiveGramWidth(n)
      val cg = graft.queries.Analytics.entityBlockingPostings(names, g)
        .localCheckpoint()
      val dfTab = cg.groupBy("ge").agg(count(lit(1)).as("df"))
        .localCheckpoint()
      val dfStats = dfTab.agg(
        count(lit(1)).as("n_grams"),
        expr("percentile_approx(df, array(0.5, 0.9, 0.99), 10000)")
          .as("pct"),
        max("df").as("mx"), sum("df").as("postings")).collect()(0)
      println(s"[p18] dir=$d n=$n g=$g grams=${dfStats.getLong(0)} " +
        s"df_p50_90_99=${dfStats.getSeq[Long](1).mkString("/")} " +
        s"df_max=${dfStats.getLong(2)} postings=${dfStats.getLong(3)}")
      // per-record rarest-4 (the real probe selection, dirty side)
      val dirtyNames = names.select(col("ckey").as("rid"),
        concat(substring(col("name"), lit(1),
          (lit(11L) + pmod(col("ckey"), lit(8L))).cast("int") - 1),
          substring(col("name"),
            (lit(11L) + pmod(col("ckey"), lit(8L))).cast("int") + 1,
            lit(64))).as("name"))
      val dg = graft.queries.Analytics.entityBlockingPostings(
        dirtyNames.select(col("rid").as("ckey"), col("name")), g)
        .select(col("ckey").as("rid"), col("ge"))
        .localCheckpoint()
      val ranked = dg.join(dfTab, Seq("ge"))
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("rid")
            .orderBy(col("df"), col("ge"))))
        .filter(col("rk") <= 4)
        .localCheckpoint()
      val probeStats = ranked.groupBy("rid").agg(sum("df").as("cand"))
        .agg(expr("percentile_approx(cand, array(0.5, 0.9, 0.99), 10000)")
          .as("pct"), sum("cand").as("tot"), max("cand").as("mx"))
        .collect()(0)
      println(s"[p18] dir=$d rarest4_cand_p50_90_99=" +
        s"${probeStats.getSeq[Long](0).mkString("/")} " +
        s"max=${probeStats.getLong(2)} total_cand=${probeStats.getLong(1)}")
      for (cap <- Seq(16L, 32L, 64L, 128L, 256L, 1024L)) {
        val elig = dg.join(dfTab.filter(col("df") <= cap), Seq("ge"))
          .withColumn("rk", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy("rid")
              .orderBy(col("df"), col("ge"))))
          .filter(col("rk") <= 4)
        val agg = elig.groupBy("rid").agg(sum("df").as("cand"))
          .agg(count(lit(1)).as("n_rids"), sum("cand").as("tot"))
          .collect()(0)
        val covered = agg.getLong(0)
        println(s"[p18] dir=$d cap=$cap covered_rids=$covered " +
          s"retry_rids=${n - covered} capped_cand=${agg.getLong(1)}")
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}

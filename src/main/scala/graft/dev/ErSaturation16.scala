package graft.dev

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Why q_entity_resolve cannot complete at 100x on one box: the
  * 5-gram BLOCKING NAMESPACE SATURATES. Names distinguish by their
  * digit tails; there are only 10^5 all-digit 5-grams, so past ~1M
  * entities every "rare" gram's df grows linearly with the corpus and
  * pass-1 candidate volume (sum of each record's 4 rarest-gram dfs)
  * goes SUPERLINEAR — the ENOSPC in the r16 second-decade sweep is
  * that volume hitting the box's 78GB of shuffle space, not a plan
  * defect (the same blocking measured 36.5x cand / 7.8x wall at 10x
  * where the namespace still had headroom).
  *
  * This probe quantifies the saturation WITHOUT materializing the
  * candidate join: per scale it reports the name count, the posting
  * count, the distinct-gram count (the namespace actually in use),
  * df quantiles, and the EXACT pass-1 candidate volume as the sum of
  * beam dfs — an aggregation, never the pairs. Mitigations at real
  * scale, both already demonstrated green elsewhere in the suite:
  * widen grams as entity count grows (keep the namespace sparse —
  * gram length ~ log_alphabet(n)), or df-cap the posting join like
  * the containment/jaccard family (bounded candidates by
  * construction, measured clean at 1.1B candidates in SCALE_r16).
  */
object ErSaturation16 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def encGram(g: Column) =
      ((((ascii(substring(g, 1, 1)) * 128L
        + ascii(substring(g, 2, 1))) * 128L
        + ascii(substring(g, 3, 1))) * 128L
        + ascii(substring(g, 4, 1))) * 128L
        + ascii(substring(g, 5, 1))).cast("long")

    def probe(tag: String, d: String): String = {
      val customer = graft.Tables.load(spark, d, "customer")
      val names = graft.queries.Analytics.entityMasterNames(customer)
      val cg5 = graft.queries.Analytics.entityBlockingPostings(names, 5) // fixed width: the saturation this harness documents
      val dfTab = cg5.groupBy("ge").agg(count(lit(1)).as("df"))
        .localCheckpoint()
      val nNames = names.count()
      val nPost = cg5.count()
      val nGrams = dfTab.count()
      val q = dfTab.agg(
        expr("percentile_approx(df, array(0.5, 0.9, 0.99), 10000)")
          .as("q"), max("df").as("mx")).collect()(0)
      val qs = q.getSeq[Long](0)
      // the production dirty-record beam, ended at an aggregation:
      // sum over records of their 4 rarest-gram dfs = exact pass-1
      // candidate ROW volume (before distinct)
      val p = (lit(11L) + pmod(col("ckey"), lit(8L))).cast("int")
      val dirty = names.select(col("ckey").as("rid"),
        concat(substring(col("name"), lit(1), p - 1),
          substring(col("name"), p + 1, lit(64))).as("name"))
      val dg5 = dirty
        .select(col("rid"), array_distinct(transform(
          sequence(lit(1), greatest(length(col("name")) - 4, lit(1))),
          i => substring(col("name"), i.cast("int"), lit(5)))).as("gs"))
        .select(col("rid"), explode(col("gs")).as("g"))
        .select(col("rid"), encGram(col("g")).as("ge"))
      val cand = dg5.join(dfTab, Seq("ge"))
        .groupBy("rid")
        .agg(graft.functions.TopKAgg(col("df").cast("double"),
          col("df"), col("df"), 4).as("beam"))
        .select(explode(col("beam")).as("b"))
        .agg(sum(col("b").getField("payload"))).collect()(0).getLong(0)
      println(f"ERSAT $tag%-6s names=$nNames%9d postings=$nPost%11d " +
        f"grams=$nGrams%8d df_p50=${qs(0)}%6d p90=${qs(1)}%7d " +
        f"p99=${qs(2)}%8d max=${q.getLong(1)}%9d cand=$cand%13d")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      s""""$tag":{"names":$nNames,"postings":$nPost,"grams":$nGrams,""" +
        s""""df_p50":${qs(0)},"df_p90":${qs(1)},"df_p99":${qs(2)},""" +
        s""""df_max":${q.getLong(1)},"cand_pass1":$cand}"""
    }

    // counterfactual: the SAME beam over g-gram postings computed
    // directly from the master names (g=7 → a 10^7 digit namespace)
    // — demonstrates the gram-length ~ log_alphabet(n) mitigation
    // without touching production 5-gram semantics
    def probeG(tag: String, d: String, g: Int): String = {
      def encG(c: Column): Column =
        (1 until g).foldLeft(ascii(substring(c, 1, 1)).cast("long"))(
          (acc, i) => acc * 128L + ascii(substring(c, i + 1, 1)))
      val customer = graft.Tables.load(spark, d, "customer")
      val names = graft.queries.Analytics.entityMasterNames(customer)
      def grams(df: DataFrame, id: String): DataFrame = df
        .select(col(id), array_distinct(transform(
          sequence(lit(1), greatest(length(col("name")) - (g - 1),
            lit(1))),
          i => substring(col("name"), i.cast("int"), lit(g)))).as("gs"))
        .select(col(id), explode(col("gs")).as("gr"))
        .select(col(id), encG(col("gr")).as("ge"))
      val dfTab = grams(names.select(col("ckey"), col("name")), "ckey")
        .groupBy("ge").agg(count(lit(1)).as("df")).localCheckpoint()
      val nGrams = dfTab.count()
      val p = (lit(11L) + pmod(col("ckey"), lit(8L))).cast("int")
      val dirty = names.select(col("ckey").as("rid"),
        concat(substring(col("name"), lit(1), p - 1),
          substring(col("name"), p + 1, lit(64))).as("name"))
      val cand = grams(dirty, "rid").join(dfTab, Seq("ge"))
        .groupBy("rid")
        .agg(graft.functions.TopKAgg(col("df").cast("double"),
          col("df"), col("df"), 4).as("beam"))
        .select(explode(col("beam")).as("b"))
        .agg(sum(col("b").getField("payload"))).collect()(0).getLong(0)
      println(f"ERSAT $tag%-9s g=$g grams=$nGrams%9d cand=$cand%13d")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      s""""$tag":{"g":$g,"grams":$nGrams,"cand_pass1":$cand}"""
    }

    val rows = Seq(
      probe("x1", "/root/testdata/sf0.1"),
      probe("x10", "/tmp/graft_scale13"),
      probe("x100", "/tmp/graft_scale16"),
      probeG("x10_g7", "/tmp/graft_scale13", 7),
      probeG("x100_g7", "/tmp/graft_scale16", 7))
    println("{" + rows.mkString(",") + "}")
    spark.stop()
  }
}

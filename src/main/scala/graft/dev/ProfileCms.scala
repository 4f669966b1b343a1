package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profile for q_heavy_hitters_cms: what does each layer
  * of the single-scan sketch cost on top of the raw tokenize floor?
  * Un-pruned plans, each twice, min reported. Numbers land in SURVEY §4. */
object ProfileCms {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = mk.queryExecution.toRdd.count()
        spark.catalog.clearCache()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[prof] $name%-28s ${ts.map(_._1).min}%6.2f s  rows=${ts.head._2}")
    }

    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val toks = docs
      .select(explode(split(lower(col("text")), "\\W+")).as("w"))
      .where(length(col("w")) > 0)

    val CmsP = 1000003L
    val CmsWidth = 512L
    val CmsRows = Seq((31L, 7L), (131L, 11L), (1009L, 13L), (65599L, 17L))
    val probes = Seq("the", "and", "of", "data", "model", "training",
      "quality", "random", "protocol", "zebra")
    def buckets(h: org.apache.spark.sql.Column) =
      array(CmsRows.zipWithIndex.map { case ((a, b), i) =>
        struct(lit(i).as("i"),
          (((lit(a) * h + lit(b)) % CmsP) % CmsWidth).as("bk"))
      }: _*)

    time("tokenize+count floor")(toks.groupBy().count())
    time("fingerprint+count")(
      toks.select(graft.functions.TextFunctions.rollingFingerprint(col("w")).as("h"))
        .groupBy().agg(sum(col("h"))))
    time("sketch only")(
      toks.select(explode(buckets(
          graft.functions.TextFunctions.rollingFingerprint(col("w")))).as("x"))
        .groupBy(col("x.i"), col("x.bk")).agg(count(lit(1))))
    time("sketch+10 str counters")(
      toks.select(col("w"), explode(buckets(
          graft.functions.TextFunctions.rollingFingerprint(col("w")))).as("x"))
        .groupBy(col("x.i"), col("x.bk"))
        .agg(count(lit(1)).as("c"),
          probes.zipWithIndex.map { case (p, j) =>
            count(when(col("w") === p, 1)).as(s"e$j") }: _*))
    // probe-id precompute: 10 string compares ONCE per token row
    // (before the 4x bucket explode), integer compares after
    time("sketch+pid counters")(
      toks.select(
          probes.zipWithIndex.foldLeft(lit(-1)) { case (acc, (p, j)) =>
            when(col("w") === p, j).otherwise(acc) }.as("pid"),
          explode(buckets(
            graft.functions.TextFunctions.rollingFingerprint(col("w")))).as("x"))
        .groupBy(col("x.i"), col("x.bk"))
        .agg(count(lit(1)).as("c"),
          probes.indices.map(j =>
            count(when(col("pid") === j, 1)).as(s"e$j")): _*))
    time("full query")(
      graft.queries.RetrievalQueries.qHeavyHittersCms(spark, sfDir))
    spark.stop()
  }
}

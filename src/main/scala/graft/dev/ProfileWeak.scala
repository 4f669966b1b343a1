package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Dev-only stage profiles for the two r7 `weak (unprofiled)` queries
  * (q_decontaminate, q_ann_recall_quantized): times each constituent
  * stage and the full query on un-pruned plans (each twice, min
  * reported) at SPARK_GRAFT_SF_DIR. Numbers land in SURVEY §4. */
object ProfileWeak {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))

    def time(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val n = mk.queryExecution.toRdd.count()
        spark.catalog.clearCache()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[prof] $name%-26s ${ts.map(_._1).min}%6.2f s  rows=${ts.head._2}")
    }

    // ---- q_decontaminate stages (same corpus/benchmark split as
    // DedupQueries.qDecontaminate: source != src0 vs == src0, k=16)
    val withSrc = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"),
        col("source"))
    val corpus = withSrc.filter(col("source") =!= "src0")
      .select("doc_id", "text")
    val bench = withSrc.filter(col("source") === "src0")
      .select("doc_id", "text")
    time("decon:shingle_scan")(
      Dedup.shingleHashes(corpus, 16, 131L, 1000000007L))
    time("decon:+distinct")(
      Dedup.shingleHashes(corpus, 16, 131L, 1000000007L)
        .select(col("doc_id"), col("s")).distinct())
    time("decon:bench_set")(
      Dedup.shingleHashes(bench, 16, 131L, 1000000007L)
        .select(col("s")).distinct())
    time("decon:full")(
      graft.SparkEntry.queries("q_decontaminate")(spark, sfDir))

    // ---- q_ann_recall_quantized stages
    time("recall:approx(quantized)")(
      graft.SparkEntry.queries("q_ann_quantized")(spark, sfDir))
    time("recall:exact(cosine)")(
      graft.SparkEntry.queries("q_ann_cosine_topk")(spark, sfDir))
    time("recall:full")(
      graft.SparkEntry.queries("q_ann_recall_quantized")(spark, sfDir))
    spark.stop()
  }
}

package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Dev-only stage profile of q_dedup_ngram_jaccard at SPARK_GRAFT_SF_DIR:
  * times the shingle scan, the posting shuffle, the pair expansion + agg,
  * and the full query independently (each twice, min reported). */
object ProfileJaccard {
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
        // un-pruned plan (matches Bench.exec): count() would let
        // Catalyst eliminate aggregates and whole joins
        val n = mk.queryExecution.toRdd.count()
        spark.catalog.clearCache()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[prof] $name%-22s ${ts.map(_._1).min}%6.2f s  rows=${ts.head._2}")
    }

    // stage 1: shingle scan only (explode all shingle hashes)
    time("shingle_scan")(Dedup.shingleHashes(docs, 16, 131L, 1000000007L))
    // stage 2: + posting groupBy collect_set + df cap
    time("postings_shuffle")(
      Dedup.shingleHashes(docs, 16, 131L, 1000000007L)
        .groupBy("s").agg(collect_set(col("doc_id")).as("ds"))
        .filter(size(col("ds")) <= 20))
    // stage 3: + pair expansion + shared-count agg
    time("pairs_agg")(
      Dedup.shingleHashes(docs, 16, 131L, 1000000007L)
        .groupBy("s").agg(collect_set(col("doc_id")).as("ds"))
        .filter(size(col("ds")) <= 20)
        .select(explode(filter(
          flatten(transform(col("ds"), a =>
            transform(col("ds"), b => struct(a.as("ida"), b.as("idb"))))),
          p => p("ida") < p("idb"))).as("pr"))
        .groupBy(col("pr.ida").as("ida"), col("pr.idb").as("idb"))
        .agg(count(lit(1)).as("shared")))
    // full query
    time("full_query")(
      graft.SparkEntry.queries("q_dedup_ngram_jaccard")(spark, sfDir))
    spark.stop()
  }
}

package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase timing for q_suffix_dedup: prefix-doubling build vs descent
  * LCP vs rollup, at sf0.1. */
object ProfileSuffix {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val d = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    (1 to 2).foreach { i =>
      var t0 = System.nanoTime()
      val (ord, levels) = graft.operators.SuffixArray.build(d)
      ord.queryExecution.toRdd.count()
      println(f"[prof$i] build+ord ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        s"levels=${levels.map(_._1).mkString(",")}")
      t0 = System.nanoTime()
      val pairs = graft.operators.SuffixArray.adjacentLcp(ord, levels)
      val n = pairs.queryExecution.toRdd.count()
      println(f"[prof$i] lcp ${(System.nanoTime() - t0) / 1e9}%.2f s pairs=$n")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}

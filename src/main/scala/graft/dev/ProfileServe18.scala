package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Serve-path attribution for the suffix-artifact consumers: with the
  * artifact standing, what does each serve row cost, and what does the
  * artifact layout look like (file counts drive scan planning)? */
object ProfileServe18 {
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
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = mk.queryExecution.toRdd.count()
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        println(f"[prof] $name%-26s run$i ${(System.nanoTime() - t0) / 1e9}%6.2f s rows=$n")
      }
    }

    // stand the artifact up front (not timed here)
    val d = graft.Tables.spread(graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id").cast("long").as("doc_id"), col("text")))
      .select("doc_id", "text")
    val tag = graft.operators.SuffixIndex.tagFor(spark, sfDir)
    val t0 = System.nanoTime()
    val h = graft.operators.SuffixIndex.forCorpus(d, tag)
    println(f"[prof] forCorpus(cold-ish)     ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    Seq("ord", "base", "pairs").foreach { p =>
      val files = Option(new java.io.File(s"${h.path}/$p").listFiles())
        .fold(0)(_.count(_.getName.endsWith(".parquet")))
      println(s"[prof] artifact $p files=$files")
    }

    time("q_suffix_dedup")(
      graft.queries.TextQueries.qSuffixDedup(spark, sfDir))
    time("q_suffix_dedup_apply")(
      graft.queries.TextQueries.qSuffixDedupApply(spark, sfDir))
    time("q_suffix_dedup_delta")(
      graft.queries.TextQueries.qSuffixDedupDelta(spark, sfDir))
    spark.stop()
  }
}

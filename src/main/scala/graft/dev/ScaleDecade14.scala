package graft.dev
import org.apache.spark.sql.SparkSession

/** r14 FULL-SUITE decade re-measure on the final r14 binaries: every
  * SparkEntry query, sf0.1 vs the materialized 10x corpus built by
  * ScaleDecade13 (same per-copy mutation discipline), min-of-2 per
  * scale after an sf0.01 warm pass. Writes SCALE_r14_FULL.json;
  * SCALE_r14.json (the attribution table) is left untouched. */
object ScaleDecade14 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val out = "/tmp/graft_scale13"
    require(new java.io.File(s"$out/_built").exists(),
      "10x corpus missing — run ScaleDecade13 once to build it")

    def run(q: String, d: String): Long =
      graft.SparkEntry.queries(q)(spark, d).queryExecution.toRdd.count()
    def clear(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    def minOf2(q: String, d: String): Double = {
      def once(): Double = {
        val t0 = System.nanoTime(); run(q, d); clear()
        (System.nanoTime() - t0) / 1e9
      }
      math.min(once(), once())
    }

    val todo = graft.SparkEntry.queries.keys.toSeq.sorted
    todo.foreach { q =>
      try { run(q, "/root/testdata/sf0.01") }
      catch { case _: Throwable => () }
      clear()
    }
    val results = todo.map { q =>
      val t1 = minOf2(q, dir)
      val t10 = minOf2(q, out)
      println(f"SCALE $q%-30s t1=$t1%6.2f t10=$t10%7.2f ratio=${t10 / t1}%5.2f (linear=10)")
      (q, t1, t10)
    }
    def num(v: Double) =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val qs = results.map { case (q, t1, t10) =>
      s""""$q":{"t1":${num(t1)},"t10":${num(t10)},"ratio":${num(t10 / t1)}}"""
    }.mkString(",")
    val json = s"""{"base":"$dir","factor":10,"method":"full r14 suite, min-of-2 per scale after sf0.01 warm; artifact queries serve-path on run 2; bounded dims kept 1x","queries":{$qs}}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("SCALE_r14_FULL.json"), json + "\n")
    println("wrote SCALE_r14_FULL.json")
    spark.stop()
  }
}

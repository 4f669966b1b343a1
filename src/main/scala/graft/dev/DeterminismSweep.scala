package graft.dev
import org.apache.spark.sql.SparkSession

/** Run-to-run determinism sweep (dev tool): every SparkEntry query
  * executes TWICE in one session and the two results must be
  * row-identical (exceptAll both directions). The oracle gate compares
  * ONE run against DuckDB — it cannot see nondeterminism that happens
  * to match the oracle on the sampled run (heap tie luck, partition-
  * order-dependent aggregation, uncommitted randomness). This sweep
  * can. */
object DeterminismSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var bad = 0
    for ((name, fn) <- graft.SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        val a = fn(spark, sfDir).localCheckpoint()
        val b = fn(spark, sfDir).localCheckpoint()
        val d1 = a.exceptAll(b).count()
        val d2 = b.exceptAll(a).count()
        if (d1 != 0 || d2 != 0) {
          bad += 1
          println(s"[det] NONDETERMINISTIC $name: a-b=$d1 b-a=$d2")
        }
      } catch {
        case e: Throwable =>
          bad += 1
          println(s"[det] ERROR $name: ${e.getClass.getSimpleName} " +
            String.valueOf(e.getMessage).linesIterator.take(1)
              .mkString)
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    println(s"[det] done, $bad failures of " +
      s"${graft.SparkEntry.queries.size}")
    spark.stop()
  }
}

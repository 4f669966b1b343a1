package graft.dev
import org.apache.spark.sql.SparkSession
object TimeOne {
  def main(args: Array[String]): Unit = {
    val names = args.toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val b0 = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
    // A/B knob for the r17 exchange-sizing work: SPARK_GRAFT_INIT_PARTS
    // sets AQE's initialPartitionNum (+64m advisory) like Tune does;
    // unset = the plain pre-r17 session
    val spark = sys.env.get("SPARK_GRAFT_INIT_PARTS").fold(b0)(p =>
      b0.config(
          "spark.sql.adaptive.coalescePartitions.initialPartitionNum", p)
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      // warm-up at sf0.01, then 2 measured runs at target scale
      // toRdd.count() = full un-pruned plan, matching Bench.exec
      try { graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.01")
        .queryExecution.toRdd.count() } catch { case _: Throwable => () }
      spark.catalog.clearCache()
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val c = graft.SparkEntry.queries(n)(spark, sfDir)
          .queryExecution.toRdd.count()
        spark.catalog.clearCache()
        println(f"[time] $n run$i ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$c")
      }
    }
    spark.stop()
  }
}

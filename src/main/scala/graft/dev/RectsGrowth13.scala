package graft.dev
import org.apache.spark.sql.SparkSession

/** Output-growth attribution for the rect-pair family's ~10-12x decade
  * ratios: if the TRUE intersecting-pair count itself grows ~10x+ (10x
  * rect density in the same extent quadratically raises local overlap
  * odds), the wall growth is output-bound — the optimum for a
  * pair-enumeration operator — not a plan defect. */
object RectsGrowth13 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- Seq("q_intersects_byid", "q_ftouches_byid",
        "q_intersection_part")) {
      val n1 = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.1")
        .queryExecution.toRdd.count()
      val n10 = graft.SparkEntry.queries(q)(spark, "/tmp/graft_scale13")
        .queryExecution.toRdd.count()
      println(f"GROWTH $q%-22s out1=$n1%d out10=$n10%d ratio=${n10.toDouble / n1}%.1f")
    }
    spark.stop()
  }
}

package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage attribution for q_maxsim: where do its ~3 s actually go —
  * the q0 collect, the scored scan, the TopKAgg, or session overhead? */
object ProfileMaxsim18 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Unit): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime(); f
        println(f"[ms] $name run$i ${(System.nanoTime() - t0) / 1e9}%6.3f s")
      }
    }
    val e = graft.Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    t("q0_collect") {
      e.filter(col("vec_id") === 0).select(col("embedding")).collect()
    }
    val q0 = e.filter(col("vec_id") === 0)
      .select(col("embedding")).collect()(0)
      .getSeq[Float](0).map(_.toDouble).toArray
    val score = graft.functions.MaxSimScore(col("embedding"), q0, 8, 8)
    t("scored_scan_noop") {
      graft.Tables.spread(e.filter(col("vec_id") =!= 0))
        .select(col("vec_id"), round(score, 4).as("maxsim4"))
        .queryExecution.toRdd.count()
    }
    t("full_query") {
      graft.queries.AnnQueries.qMaxSim(spark, sfDir)
        .queryExecution.toRdd.count()
    }
    t("topk_only") {
      graft.Tables.spread(e.filter(col("vec_id") =!= 0))
        .select(col("vec_id"), round(score, 4).as("maxsim4"))
        .groupBy()
        .agg(graft.functions.TopKAgg(-col("maxsim4"), col("vec_id"),
          lit(0L), 10).as("tk"))
        .queryExecution.toRdd.count()
    }
    spark.stop()
  }
}

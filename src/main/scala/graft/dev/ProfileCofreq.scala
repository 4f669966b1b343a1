package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage attribution for q_item_cofreq (r12 verdict item 8): is the
  * per-user pair expansion (Cap=48) the floor, or do the margin joins /
  * top-k carry real weight? Dev tool, not part of the library. */
object ProfileCofreq {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val Cap = 48
    def time(label: String)(f: => Long): Double = {
      val t0 = System.nanoTime()
      val n = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[cofreq] $label%-22s $s%6.2f s rows=$n")
      s
    }
    def baskets(): DataFrame = {
      val b0 = graft.Tables.load(spark, dir, "lineitem")
        .select(col("l_orderkey").cast("long").as("ok"),
          col("l_partkey").cast("long").as("i"))
        .join(graft.Tables.load(spark, dir, "orders")
          .select(col("o_orderkey").cast("long").as("ok"),
            col("o_custkey").cast("long").as("u")), "ok")
        .select("u", "i").distinct()
      val sizes = b0.groupBy("u").agg(count(lit(1)).as("sz"))
      b0.join(sizes, Seq("u"))
        .filter(col("sz") <= Cap ||
          (col("u") * 31 + col("i") * 17) % col("sz") < Cap)
        .select("u", "i")
    }
    // warm
    graft.queries.Analytics.qItemCofreq(spark, dir)
      .queryExecution.toRdd.count()
    spark.catalog.clearCache()
    time("baskets(build+cap)") { baskets().queryExecution.toRdd.count() }
    spark.catalog.clearCache()
    val b = baskets().localCheckpoint()
    time("pairs(self-join+agg)") {
      b.as("a").join(b.as("bb"),
          col("a.u") === col("bb.u") && col("a.i") < col("bb.i"))
        .groupBy(col("a.i").as("ia"), col("bb.i").as("ib"))
        .agg(count(lit(1)).as("co"))
        .filter(col("co") >= 3)
        .queryExecution.toRdd.count()
    }
    spark.catalog.clearCache()
    time("pairs(array-expand)") {
      b.groupBy("u").agg(sort_array(collect_list(col("i"))).as("is"))
        .select(explode(expr(
          "flatten(transform(is, (x, ix) -> " +
            "transform(slice(is, ix + 2, size(is)), " +
            "y -> struct(x AS ia, y AS ib))))")).as("p"))
        .select(col("p.ia"), col("p.ib"))
        .groupBy("ia", "ib").agg(count(lit(1)).as("co"))
        .filter(col("co") >= 3)
        .queryExecution.toRdd.count()
    }
    spark.catalog.clearCache()
    time("full query") {
      graft.queries.Analytics.qItemCofreq(spark, dir)
        .queryExecution.toRdd.count()
    }
    spark.stop()
  }
}

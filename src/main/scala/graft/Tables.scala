package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-generated TPC-H-ish testdata.
  *
  * All queries take a `dir` (e.g. /root/testdata/sf0.01) and read only the
  * tables/columns they need — column pruning and predicate pushdown reach
  * the parquet scan because everything downstream is declarative.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}

package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.MatchLines

object CmpMatch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val verts = graft.Tables.load(spark, dir, "lineitem").select(
        col("l_orderkey").cast("long").as("lid"),
        col("l_linenumber").as("seq"),
        (col("l_partkey") * 61 % 1000).cast("long").as("xi"),
        (col("l_suppkey") * 157 % 1000).cast("long").as("yi"))
        .filter(col("lid") % 20 === 0 || col("lid") % 2 === 1)
      val auto = MatchLines.autoCellTenths(MatchLines.linesAgg(verts))
      def matchAt(cell: Int) = {
        val lines = MatchLines.linesWithCells(verts, cell).localCheckpoint()
        MatchLines.matchByHausdorff(
          lines.filter(col("lid") % 20 === 0),
          lines.filter(col("lid") % 2 === 1))
      }
      val m30 = matchAt(30)
      val mA = matchAt(auto)
      val diff = m30.withColumnRenamed("lb", "l1").withColumnRenamed("hd", "h1")
        .join(mA, Seq("la"), "full")
        .filter(col("l1").isNull || col("lb").isNull ||
          col("l1") =!= col("lb") || col("h1") =!= col("hd")).count()
      println(s"[cmp] $sf auto=$auto rows30=${m30.count()} rowsAuto=${mA.count()} diff=$diff")
    }
    spark.stop()
  }
}

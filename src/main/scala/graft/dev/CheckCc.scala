package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{ConnectedComponents, Dedup}

/** Convergence probe for the star-round components (dev tool): at each
  * SF, cross-check q_dedup_cc and q_dedup_cc_delta row-for-row against
  * min-label propagation — the engine-side check the DuckDB recursive
  * CTE cannot run at sf0.1 (its temp spill exceeds the box). A nonzero
  * diff means rounds=3 stopped short of convergence on that corpus. */
object CheckCc {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val d = graft.Tables.load(spark, dir, "documents")
        .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      val all = Dedup.minhashPairs(d, 16, numHashes = 64, bands = 16,
        minEst = 0.2).select(col("ida"), col("idb")).localCheckpoint()
      val prop = Dedup.dedupClusters(d, all, iters = 3)
        .select(col("doc_id"), col("canonical_id").as("cp"))
        .localCheckpoint()
      def diffOf(f: org.apache.spark.sql.DataFrame): Long =
        f.select(col("doc_id"), col("canonical_id").as("cs"))
          .join(prop, Seq("doc_id"), "full")
          .filter(col("cs").isNull || col("cp").isNull ||
            col("cs") =!= col("cp")).count()
      val star = diffOf(ConnectedComponents.components(d, all))
      val basePairs =
        all.filter(col("ida") % 5 =!= 4 && col("idb") % 5 =!= 4)
      val deltaPairs =
        all.filter(col("ida") % 5 === 4 || col("idb") % 5 === 4)
      val baseAssign = ConnectedComponents
        .components(d.filter(col("doc_id") % 5 =!= 4), basePairs)
        .select(col("doc_id"), col("canonical_id"))
      val delta = diffOf(
        ConnectedComponents.componentsDelta(d, baseAssign, deltaPairs))
      println(s"[cc] $sf star_diff=$star delta_diff=$delta")
    }
    spark.stop()
  }
}

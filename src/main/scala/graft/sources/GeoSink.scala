package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Write path for geo layers: parquet partitioned by grid cell.
  *
  * At 100 TB, spatial locality on disk is what makes downstream reads
  * cheap: partitioning a layer by its (coarse) cell id means any
  * window/range query prunes to the touched cells at the FILE level
  * (PartitionFilters in the scan, no data read outside the window).
  * Pair with the grid-bucketed join operators, which shuffle on the same
  * cell key the layout is clustered by.
  */
object GeoSink {

  /** Write `df` partitioned by `cellCol` (directory-level partitioning). */
  def writePartitioned(df: DataFrame, path: String, cellCol: String): Unit =
    df.write.mode("overwrite").partitionBy(cellCol).parquet(path)

  /** Read a partitioned layer back; filters on the partition column prune
    * at file-listing time. */
  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Regular-grid construction and point-gridding.
  *
  * Reference: gpd_lite_toolbox/core.py:565-634 (`make_grid`) enumerates cells
  * of size `height` over the collection bounds, column-major with rows
  * top-down; core.py:637-687 (`gridify_data`) then aggregates point values
  * per cell through an rtree lookup loop.
  *
  * Spark-first design: the only global fact needed is the 4-double bounding
  * box (one min/max aggregate). Cells are then a `spark.range` projection
  * (distributed, no data shuffle at all), and gridify is a floor-bucket
  * groupBy — ONE shuffle keyed by cell id, map-side partial aggregation,
  * linear in points at any scale. No index build, no per-cell loop: at 100 TB
  * the points never move except into their aggregation bucket.
  */
object Grid {

  /** Bounding box of a point DataFrame (x/y columns): (xmin, ymin, xmax, ymax).
    * The single intentional driver-side collect in this family — 4 doubles.
    */
  def bounds(pts: DataFrame): (Double, Double, Double, Double) = {
    val r = pts.agg(min("x"), min("y"), max("x"), max("y")).head()
    (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
  }

  /** Cell geometry for the grid covering `pts` with square cells of side
    * `height`. Output: cell_id (column-major, rows top-down, matching the
    * reference enumeration), col, row, x0, y0, x1, y1.
    */
  def makeGrid(spark: SparkSession, pts: DataFrame, height: Double): DataFrame = {
    val (xmin, ymin, xmax, ymax) = bounds(pts)
    val rows = math.ceil((ymax - ymin) / height).toLong
    val cols = math.ceil((xmax - xmin) / height).toLong
    spark.range(rows * cols).select(
      col("id").as("cell_id"),
      floor(col("id") / rows).cast("long").as("col"),
      (col("id") % rows).cast("long").as("row"))
      .select(
        col("cell_id"), col("col"), col("row"),
        (lit(xmin) + col("col") * height).as("x0"),
        (lit(ymax) - (col("row") + 1) * height).as("y0"),
        (lit(xmin) + (col("col") + 1) * height).as("x1"),
        (lit(ymax) - col("row") * height).as("y1"))
  }

  /** Aggregate point values into the cells of `makeGrid(pts, height)`.
    * Points on the max edge clamp into the last row/col. Aggregations:
    * n_pts, mean/min/max of `valueCol`.
    */
  def gridify(pts: DataFrame, height: Double, valueCol: String): DataFrame = {
    val (xmin, ymin, xmax, ymax) = bounds(pts)
    val rows = math.ceil((ymax - ymin) / height).toLong
    val cols = math.ceil((xmax - xmin) / height).toLong
    val c = least(floor((col("x") - xmin) / height), lit(cols - 1))
    val r = least(floor((lit(ymax) - col("y")) / height), lit(rows - 1))
    pts
      .withColumn("cell_id", (c * rows + r).cast("long"))
      .groupBy("cell_id")
      .agg(
        count(lit(1)).as("n_pts"),
        round(avg(col(valueCol)), 4).as("mean_val"),
        min(col(valueCol)).as("min_val"),
        max(col(valueCol)).as("max_val"))
  }
}

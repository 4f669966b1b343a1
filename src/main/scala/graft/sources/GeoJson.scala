package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** GeoJSON (RFC 7946) feature writer/reader over the engine's ring
  * model `array<array<array<struct<x,y>>>>` (polygons → rings →
  * positions) — the text-interchange sibling of the WKT/WKB readers
  * (reference: read_spatialite, core.py:423; gpd_lite_toolbox moves
  * GeoDataFrames whose `geometry` column geopandas would just as
  * happily load from GeoJSON).
  *
  * Spark-first: the READER is `from_json` against an explicit nested
  * schema (codegen'd, PERMISSIVE — malformed text nulls out instead of
  * failing the task, the crawl-ingest contract qJsonlRoundtrip
  * established) followed by `transform` HOFs into the struct ring
  * model; the WRITER is pure string `concat`/`array_join` over the
  * same model. Integer-valued coordinates serialize as bare longs so
  * the byte stream is engine-independent and md5-comparable.
  */
object GeoJson {

  /** from_json schema of a (restricted) RFC 7946 Feature carrying a
    * MultiPolygon and a long `pid` property. */
  val featureSchema: StructType = StructType(Seq(
    StructField("type", StringType),
    StructField("properties", StructType(Seq(
      StructField("pid", LongType)))),
    StructField("geometry", StructType(Seq(
      StructField("type", StringType),
      StructField("coordinates", ArrayType(ArrayType(ArrayType(
        ArrayType(DoubleType))))))))))

  /** One `[x,y]` position with integer-valued doubles rendered as bare
    * longs — identical text in any engine. */
  private def posJson(p: Column): Column =
    concat(lit("["), p.getField("x").cast("long").cast("string"),
      lit(","), p.getField("y").cast("long").cast("string"), lit("]"))

  /** `array<struct<x,y>>` ring → `[[x,y],[x,y],...]`. */
  def ringJson(ring: Column): Column =
    concat(lit("["),
      array_join(transform(ring, posJson _), ","), lit("]"))

  /** polygons `array<array<array<struct<x,y>>>>` → the full RFC 7946
    * Feature line (MultiPolygon geometry, pid property). */
  def writeFeature(pid: Column, polys: Column): Column = {
    val coords = concat(lit("["),
      array_join(transform(polys, (poly: Column) =>
        concat(lit("["),
          array_join(transform(poly, ringJson _), ","),
          lit("]"))), ","),
      lit("]"))
    concat(
      lit("""{"type":"Feature","properties":{"pid":"""),
      pid.cast("string"),
      lit("""},"geometry":{"type":"MultiPolygon","coordinates":"""),
      coords, lit("}}"))
  }

  /** Parse a Feature line. Returns a struct
    * `{pid: long, polys: array<array<array<struct<x,y>>>>}`, or NULL
    * when the text is malformed JSON, is not a Feature/MultiPolygon,
    * carries a position that is not an [x, y] pair, or has an UNCLOSED
    * ring (first != last — RFC 7946 §3.1.6 requires closure): the
    * PERMISSIVE corrupt-record path, never a task failure. */
  def parseFeature(json: Column): Column = {
    val f = from_json(json, featureSchema)
    val coords = f.getField("geometry").getField("coordinates")
    val posOk = forall(coords, (poly: Column) =>
      forall(poly, (ring: Column) =>
        forall(ring, (pos: Column) => size(pos) === 2)))
    val closedOk = forall(coords, (poly: Column) =>
      forall(poly, (ring: Column) =>
        size(ring) >= 4 &&
          element_at(ring, 1)(0) === element_at(ring, -1)(0) &&
          element_at(ring, 1)(1) === element_at(ring, -1)(1)))
    val ok = f.isNotNull && f.getField("type") === "Feature" &&
      f.getField("geometry").getField("type") === "MultiPolygon" &&
      coords.isNotNull && posOk && closedOk
    val polys = transform(coords, (poly: Column) =>
      transform(poly, (ring: Column) =>
        transform(ring, (pos: Column) =>
          struct(pos(0).as("x"), pos(1).as("y")))))
    when(ok, struct(
      f.getField("properties").getField("pid").as("pid"),
      polys.as("polys")))
  }
}

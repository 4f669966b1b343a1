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

  // ---------------------------------------------------------------
  // Generalized reader (r17, VERDICT r16 item 5): Point / LineString /
  // Polygon / MultiPolygon geometry KINDS plus FeatureCollection
  // framing — a 2026 geo user's first file carries both. Every kind
  // normalizes into the engine's ring model array<array<array<
  // struct<x,y>>>> (Point = one 1-position ring, LineString = one open
  // ring, Polygon = one polygon) tagged with the kind, so downstream
  // geometry operators see one shape. Coordinates nest one array
  // level deeper per kind; from_json parses the FIXED head (type tags
  // + pid) once and the coordinates once per kind schema — PERMISSIVE
  // mode nulls a depth mismatch (verified behavior), and CaseWhen
  // picks the branch the declared kind requires, so a lying type tag
  // fails validation instead of mis-parsing.
  // ---------------------------------------------------------------

  /** Kind + properties head — coordinates handled per kind below. */
  val anyFeatureHeadSchema: StructType = StructType(Seq(
    StructField("type", StringType),
    StructField("properties", StructType(Seq(
      StructField("pid", LongType)))),
    StructField("geometry", StructType(Seq(
      StructField("type", StringType))))))

  private def coordSchema(dt: DataType): StructType = StructType(Seq(
    StructField("geometry", StructType(Seq(
      StructField("coordinates", dt))))))
  private val D1: DataType = ArrayType(DoubleType)
  private val D2: DataType = ArrayType(D1)
  private val D3: DataType = ArrayType(D2)
  private val D4: DataType = ArrayType(D3)

  /** RFC 7946 FeatureCollection framing: `features` parse as RAW JSON
    * strings (Spark renders a nested object verbatim when the target
    * field is StringType), each handed to [[parseFeatureAny]]. NULL on
    * malformed JSON or a wrong collection type tag. */
  val collectionSchema: StructType = StructType(Seq(
    StructField("type", StringType),
    StructField("features", ArrayType(StringType))))

  def parseCollection(json: Column): Column = {
    val c = from_json(json, collectionSchema)
    when(c.isNotNull && c.getField("type") === "FeatureCollection" &&
      c.getField("features").isNotNull, c.getField("features"))
  }

  /** Parse a Feature of ANY supported kind. Returns
    * `{pid: long, kind: string, polys: array<array<array<struct<x,y>>>>}`
    * or NULL for malformed JSON, unknown kinds, arity/closure
    * violations (rings closed + >= 4 positions for polygon kinds,
    * >= 2 positions for LineString, exactly [x, y] for Point) — the
    * PERMISSIVE corrupt-record contract of [[parseFeature]]. */
  def parseFeatureAny(json: Column): Column = {
    val f = from_json(json, anyFeatureHeadSchema)
    val kind = f.getField("geometry").getField("type")
    def coords(dt: DataType): Column =
      from_json(json, coordSchema(dt))
        .getField("geometry").getField("coordinates")
    val posOf = (p: Column) => struct(p(0).as("x"), p(1).as("y"))
    val cPt = coords(D1)
    val cLs = coords(D2)
    val cPg = coords(D3)
    val cMp = coords(D4)
    def ringOk(ring: Column): Column = size(ring) >= 4 &&
      forall(ring, (pos: Column) => size(pos) === 2) &&
      element_at(ring, 1)(0) === element_at(ring, -1)(0) &&
      element_at(ring, 1)(1) === element_at(ring, -1)(1)
    val okByKind =
      when(kind === "Point", cPt.isNotNull && size(cPt) === 2)
        .when(kind === "LineString", cLs.isNotNull && size(cLs) >= 2 &&
          forall(cLs, (pos: Column) => size(pos) === 2))
        .when(kind === "Polygon", cPg.isNotNull && size(cPg) >= 1 &&
          forall(cPg, ringOk _))
        .when(kind === "MultiPolygon", cMp.isNotNull && size(cMp) >= 1 &&
          forall(cMp, (poly: Column) =>
            size(poly) >= 1 && forall(poly, ringOk _)))
        .otherwise(lit(false))
    val polysByKind =
      when(kind === "Point", array(array(array(posOf(cPt)))))
        .when(kind === "LineString", array(array(transform(cLs, posOf))))
        .when(kind === "Polygon", array(transform(cPg,
          (r: Column) => transform(r, posOf))))
        .otherwise(transform(cMp, (poly: Column) =>
          transform(poly, (r: Column) => transform(r, posOf))))
    val ok = f.isNotNull && f.getField("type") === "Feature" && okByKind
    when(ok, struct(
      f.getField("properties").getField("pid").as("pid"),
      kind.as("kind"), polysByKind.as("polys")))
  }

  /** Serialize `{pid, kind, polys}` back to the Feature line — the
    * kind selects how far the ring model un-nests (writer ∘ parser =
    * identity on every kind, the roundtrip the query pins by md5). */
  def writeFeatureAny(pid: Column, kind: Column, polys: Column): Column =
    writeFeatureTagged(pid, kind, kind, polys)

  /** [[writeFeatureAny]] with the geometry-type TAG decoupled from the
    * coordinate un-nesting depth: fixture builders that plant a
    * semantically corrupt kind (e.g. "Blob") still write the
    * coordinates at the shape's TRUE depth (`depthKind`), so the
    * emitted bytes match an arithmetic rebuild of the same feature —
    * pre-r18 the unknown tag fell through to MultiPolygon depth and
    * the writer∘parser identity held only because both sides stubbed
    * such features (ADVICE r17). `depthKind` outside the four
    * supported kinds raises instead of silently mis-nesting. */
  def writeFeatureTagged(pid: Column, tag: Column, depthKind: Column,
                         polys: Column): Column = {
    def polyJson(poly: Column): Column =
      concat(lit("["), array_join(transform(poly, ringJson _), ","),
        lit("]"))
    val coords =
      when(depthKind === "Point",
        posJson(element_at(element_at(element_at(polys, 1), 1), 1)))
        .when(depthKind === "LineString",
          ringJson(element_at(element_at(polys, 1), 1)))
        .when(depthKind === "Polygon", polyJson(element_at(polys, 1)))
        .when(depthKind === "MultiPolygon", concat(lit("["),
          array_join(transform(polys, polyJson _), ","), lit("]")))
        .otherwise(raise_error(concat(
          lit("GeoJson.writeFeatureTagged: unsupported coordinate " +
            "depth kind '"), depthKind, lit("'"))))
    concat(
      lit("""{"type":"Feature","properties":{"pid":"""),
      pid.cast("string"),
      lit("""},"geometry":{"type":""""), tag,
      lit("""","coordinates":"""), coords, lit("}}"))
  }

  /** Assemble Feature lines into a FeatureCollection document. */
  def writeCollection(feats: Column): Column =
    concat(lit("""{"type":"FeatureCollection","features":["""),
      array_join(feats, ","), lit("]}"))
}

package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{Metadata, MetadataBuilder}

/** CRS (coordinate reference system) tags for geometry columns — the
  * reference's read_spatialite `crs` parameter and epsg lookup
  * (gpd_lite_toolbox/core.py:423,460-463) carried Spark-natively as
  * COLUMN METADATA: the tag rides the schema through select/alias/
  * write, costs nothing per row, and survives a parquet round trip
  * (Spark persists column metadata in the file footer's schema).
  *
  * The engine's honest minimum, per the reference's behavior: a layer
  * knows its EPSG code, and distance semantics switch on it —
  * geographic layers (degree axes) measure by haversine km, projected
  * layers measure planar in CRS units. Works with geometry parsed from
  * ANY source (WKT strings, WKB bytes, bare x/y columns): tagging is a
  * property of the column, not of the parser.
  */
object Crs {

  /** Metadata key carrying the EPSG code on a geometry column. */
  val EpsgKey = "graft.crs.epsg"

  /** Geographic (degree-axis) coordinate systems, from the public EPSG
    * registry: WGS84, NAD83, NAD27, ETRS89. Every other code is treated
    * as projected (planar axes in CRS units — meters for UTM/metric
    * grids). */
  private val Geographic = Set(4326L, 4269L, 4267L, 4258L)

  def isGeographic(epsg: Long): Boolean = Geographic(epsg)

  def metadata(epsg: Long): Metadata =
    new MetadataBuilder().putLong(EpsgKey, epsg).build()

  /** Alias a geometry column with its CRS tag:
    * `df.select(Crs.withCrs(Wkt.parsePoint(col("wkt")), "g", 4326))`. */
  def withCrs(c: Column, name: String, epsg: Long): Column =
    c.as(name, metadata(epsg))

  /** The EPSG tag of a geometry column, if any. */
  def epsgOf(df: DataFrame, colName: String): Option[Long] = {
    val f = df.schema(colName)
    if (f.metadata.contains(EpsgKey)) Some(f.metadata.getLong(EpsgKey))
    else None
  }

  /** Distance between two point-struct columns of a tagged layer, in
    * the layer's natural unit: haversine KILOMETERS when the tag is
    * geographic (x = lon, y = lat in degrees), planar euclidean in CRS
    * units otherwise. Refuses untagged or inconsistently-tagged layers
    * loudly — guessing a CRS silently is how projected data ends up
    * measured in degrees. */
  def pointDistance(df: DataFrame, g1: String, g2: String): Column = {
    val e1 = epsgOf(df, g1).getOrElse(sys.error(
      s"Crs.pointDistance: column $g1 carries no $EpsgKey tag"))
    val e2 = epsgOf(df, g2).getOrElse(sys.error(
      s"Crs.pointDistance: column $g2 carries no $EpsgKey tag"))
    require(e1 == e2,
      s"Crs.pointDistance: mixed CRS ($e1 vs $e2); reproject first")
    if (isGeographic(e1))
      graft.geom.Geom.haversineKm(
        col(g1).getField("y"), col(g1).getField("x"),
        col(g2).getField("y"), col(g2).getField("x"))
    else
      graft.geom.Geom.dist(
        col(g1).getField("x"), col(g1).getField("y"),
        col(g2).getField("x"), col(g2).getField("y"))
  }
}

package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derived geospatial tables over the testdata.
  *
  * The testdata carries no geometry columns, so the geo operators (the
  * reference surface of gpd_lite_toolbox — points, lines, polygons) run over
  * deterministic derivations defined ONCE here, with the exact same
  * arithmetic mirrored in SQL fragments for the DuckDB oracle. Derivations
  * use only integer modular arithmetic and division by 10.0 — bit-exact in
  * both engines because the expression trees are identical IEEE-754 ops.
  *
  * Geometry model (see SURVEY.md §1):
  *   Point               -> x: double, y: double
  *   LineString / ring   -> array<struct<x:double, y:double>>
  *   (Multi)Polygon      -> array of rings (parts)
  */
object GeoData {

  /** Scatter an integer key onto [0, 100) with one decimal of precision. */
  private def scatter(key: Column, mult: Int): Column =
    ((key * mult) % 1000) / lit(10.0)

  private def scatterSql(key: String, mult: Int): String =
    s"(($key * $mult) % 1000) / 10.0"

  // ---------------------------------------------------------------- points

  /** Events as weighted, categorized points (~1k/10k/100k at sf0.001/.01/.1).
    * Weight is kept integer ((event_id % 97) + 1) so weighted sums stay in
    * exact integer space — order-independent across engines.
    */
  def ptsEvents(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events").select(
      col("event_id").cast("long").as("id"),
      scatter(col("event_id"), 73).as("x"),
      scatter(col("event_id"), 179).as("y"),
      ((col("event_id") % 97) + 1).cast("long").as("weight"),
      col("event_type").as("cat"))

  val ptsEventsSql: String =
    s"""SELECT CAST(event_id AS BIGINT) AS id,
       |  ${scatterSql("event_id", 73)} AS x,
       |  ${scatterSql("event_id", 179)} AS y,
       |  CAST((event_id % 97) + 1 AS BIGINT) AS weight,
       |  event_type AS cat
       |FROM events""".stripMargin

  /** Suppliers as a small point layer (snap/NN targets). */
  def ptsSupplier(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "supplier").select(
      col("s_suppkey").cast("long").as("tid"),
      scatter(col("s_suppkey"), 97).as("tx"),
      scatter(col("s_suppkey"), 211).as("ty"))

  val ptsSupplierSql: String =
    s"""SELECT CAST(s_suppkey AS BIGINT) AS tid,
       |  ${scatterSql("s_suppkey", 97)} AS tx,
       |  ${scatterSql("s_suppkey", 211)} AS ty
       |FROM supplier""".stripMargin

  // -------------------------------------------------------------- polygons

  /** Nations as 25 axis-aligned 20x20 squares on a 5x5 layout (keyed by
    * n_nationkey), dissolvable by n_regionkey. Rectilinear polygons keep the
    * SQL oracles exact; the engine handles arbitrary rings (shoelace area,
    * ray-cast point-in-polygon) — see geom.Geom.
    * Columns: pid, rkey, name, x0, y0, x1, y1 (bbox == geometry for squares).
    */
  def polyNation(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "nation").select(
      col("n_nationkey").cast("long").as("pid"),
      col("n_regionkey").cast("long").as("rkey"),
      col("n_name").as("name"),
      (col("n_nationkey") % 5).cast("double") * 20.0 as "x0",
      floor(col("n_nationkey") / 5).cast("double") * 20.0 as "y0",
      ((col("n_nationkey") % 5).cast("double") * 20.0 + 20.0).as("x1"),
      (floor(col("n_nationkey") / 5).cast("double") * 20.0 + 20.0).as("y1"))

  val polyNationSql: String =
    """SELECT CAST(n_nationkey AS BIGINT) AS pid,
      |  CAST(n_regionkey AS BIGINT) AS rkey,
      |  n_name AS name,
      |  CAST(n_nationkey % 5 AS DOUBLE) * 20.0 AS x0,
      |  CAST(FLOOR(n_nationkey / 5) AS DOUBLE) * 20.0 AS y0,
      |  CAST(n_nationkey % 5 AS DOUBLE) * 20.0 + 20.0 AS x1,
      |  CAST(FLOOR(n_nationkey / 5) AS DOUBLE) * 20.0 + 20.0 AS y1
      |FROM nation""".stripMargin

  /** Customers as overlapping axis-aligned rectangles (for the intersects /
    * intersection_part / touches family): center from modular scatter,
    * half-sizes 0.5..5.0 from the key.
    */
  def rectCustomer(spark: SparkSession, dir: String): DataFrame = {
    val cx = scatter(col("c_custkey"), 131)
    val cy = scatter(col("c_custkey"), 313)
    val h = ((col("c_custkey") % 10) + 1) / lit(2.0)
    Tables.load(spark, dir, "customer").select(
      col("c_custkey").cast("long").as("rid"),
      (cx - h).as("x0"), (cy - h).as("y0"),
      (cx + h).as("x1"), (cy + h).as("y1"))
  }

  val rectCustomerSql: String = {
    val cx = scatterSql("c_custkey", 131)
    val cy = scatterSql("c_custkey", 313)
    val h = "((c_custkey % 10) + 1) / 2.0"
    s"""SELECT CAST(c_custkey AS BIGINT) AS rid,
       |  ($cx) - ($h) AS x0, ($cy) - ($h) AS y0,
       |  ($cx) + ($h) AS x1, ($cy) + ($h) AS y1
       |FROM customer""".stripMargin
  }

  // ----------------------------------------------------------------- lines

  /** A polyline per order: vertices are its lineitems ordered by
    * l_linenumber, coordinates scattered from partkey/suppkey. Spark side
    * materializes array<struct<x,y>>; the oracle-side checks run on
    * per-vertex or per-line scalar reductions (length, bearing, ...), which
    * SQL can express without the array type.
    */
  def linesOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .select(
        col("l_orderkey").cast("long").as("lid"),
        col("l_linenumber").as("seq"),
        scatter(col("l_partkey"), 61).as("x"),
        scatter(col("l_suppkey"), 157).as("y"))
      .groupBy("lid")
      .agg(array_sort(collect_list(struct(col("seq"), col("x"), col("y"))))
        .as("pts_seq"))
      .select(col("lid"),
        transform(col("pts_seq"), p => struct(p("x").as("x"), p("y").as("y")))
          .as("pts"))

  /** Scalar vertex view of the same lines, for SQL-expressible oracles. */
  val lineVerticesSql: String =
    s"""SELECT CAST(l_orderkey AS BIGINT) AS lid, l_linenumber AS seq,
       |  ${scatterSql("l_partkey", 61)} AS x,
       |  ${scatterSql("l_suppkey", 157)} AS y
       |FROM lineitem""".stripMargin
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Every implemented operator has a `queries` entry; those with an exact
  * ANSI-SQL equivalent also have an `oracleSql` entry (DuckDB hash-compare).
  * Column names and rounding are mirrored on both sides — see SURVEY.md §3
  * for the float-determinism rules.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    q1Pricing(spark, "/root/testdata/sf0.001")

  // ------------------------------------------------------------- analytics

  /** TPC-H Q1-style pricing summary (flagship). */
  private def q1Pricing(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))

  private val q1PricingSql =
    """SELECT l_returnflag, l_linestatus,
      |  ROUND(SUM(l_quantity), 2) AS sum_qty,
      |  ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
      |  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      |  ROUND(AVG(l_quantity), 4) AS avg_qty,
      |  ROUND(AVG(l_discount), 4) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------- geo operators

  private def qMeanCoordinates(spark: SparkSession, dir: String): DataFrame =
    MeanCoordinates(GeoData.ptsEvents(spark, dir), Some("cat"), Some("weight"))

  private val qMeanCoordinatesSql =
    s"""WITH pts AS (${GeoData.ptsEventsSql})
       |SELECT cat,
       |  ROUND(SUM(x * weight) / SUM(weight), 4) AS mean_x,
       |  ROUND(SUM(y * weight) / SUM(weight), 4) AS mean_y,
       |  CAST(SUM(weight) AS BIGINT) AS weight_sum,
       |  COUNT(*) AS n_pts
       |FROM pts GROUP BY cat""".stripMargin

  private def qMakeGrid(spark: SparkSession, dir: String): DataFrame =
    Grid.makeGrid(spark, GeoData.ptsEvents(spark, dir), 10.0)

  private val qMakeGridSql =
    s"""WITH pts AS (${GeoData.ptsEventsSql}),
       |b AS (SELECT MIN(x) AS xmin, MIN(y) AS ymin, MAX(x) AS xmax, MAX(y) AS ymax,
       |             CAST(CEIL((MAX(y) - MIN(y)) / 10.0) AS BIGINT) AS rows_,
       |             CAST(CEIL((MAX(x) - MIN(x)) / 10.0) AS BIGINT) AS cols_
       |      FROM pts)
       |SELECT g.cell_id,
       |  CAST(FLOOR(g.cell_id / b.rows_) AS BIGINT) AS col,
       |  g.cell_id % b.rows_ AS row,
       |  b.xmin + CAST(FLOOR(g.cell_id / b.rows_) AS BIGINT) * 10.0 AS x0,
       |  b.ymax - (g.cell_id % b.rows_ + 1) * 10.0 AS y0,
       |  b.xmin + (CAST(FLOOR(g.cell_id / b.rows_) AS BIGINT) + 1) * 10.0 AS x1,
       |  b.ymax - (g.cell_id % b.rows_) * 10.0 AS y1
       |FROM b, LATERAL (SELECT UNNEST(GENERATE_SERIES(0, b.rows_ * b.cols_ - 1)) AS cell_id) g""".stripMargin

  private def qGridify(spark: SparkSession, dir: String): DataFrame =
    Grid.gridify(GeoData.ptsEvents(spark, dir), 10.0, "weight")

  private val qGridifySql =
    s"""WITH pts AS (${GeoData.ptsEventsSql}),
       |b AS (SELECT MIN(x) AS xmin, MIN(y) AS ymin, MAX(x) AS xmax, MAX(y) AS ymax,
       |             CAST(CEIL((MAX(y) - MIN(y)) / 10.0) AS BIGINT) AS rows_,
       |             CAST(CEIL((MAX(x) - MIN(x)) / 10.0) AS BIGINT) AS cols_
       |      FROM pts)
       |SELECT CAST(LEAST(FLOOR((p.x - b.xmin) / 10.0), b.cols_ - 1) * b.rows_
       |     + LEAST(FLOOR((b.ymax - p.y) / 10.0), b.rows_ - 1) AS BIGINT) AS cell_id,
       |  COUNT(*) AS n_pts,
       |  ROUND(AVG(p.weight), 4) AS mean_val,
       |  MIN(p.weight) AS min_val,
       |  MAX(p.weight) AS max_val
       |FROM pts p, b
       |GROUP BY 1""".stripMargin

  // ----------------------------------------------------------------- wiring

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing" -> (q1Pricing _),
    "q_mean_coordinates" -> (qMeanCoordinates _),
    "q_make_grid" -> (qMakeGrid _),
    "q_gridify" -> (qGridify _))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing" -> q1PricingSql,
    "q_mean_coordinates" -> qMeanCoordinatesSql,
    "q_make_grid" -> qMakeGridSql,
    "q_gridify" -> qGridifySql)
}

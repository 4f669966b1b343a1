package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GeoData
import graft.geom.Geom
import graft.operators.Cartogram

/** Cartogram queries over the nation squares (SURVEY.md §2 rows 16-17).
  * Dougenik is iterative-FP → rows-only check; non-contiguous is closed
  * form → full SQL oracle.
  */
object CartogramQueries {

  /** Deterministic region value (population stand-in). */
  private def value = (col("pid") % 7 + 1) * 50

  private def polys(spark: SparkSession, dir: String): DataFrame =
    GeoData.polyNation(spark, dir)
      .select(col("pid"), value.as("value"),
        Geom.rectRing(col("x0"), col("y0"), col("x1"), col("y1")).as("ring"))

  def qCartogram(spark: SparkSession, dir: String): DataFrame =
    Cartogram.dougenik(polys(spark, dir), iterations = 2)

  def qNcCartogram(spark: SparkSession, dir: String): DataFrame =
    Cartogram.nonContiguous(
      GeoData.polyNation(spark, dir)
        .select(col("pid"), value.as("value"),
          col("x0"), col("y0"), col("x1"), col("y1")))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cartogram" -> (qCartogram _),
    "q_nc_cartogram" -> (qNcCartogram _))

  val oracles: Map[String, String] = Map(
    "q_nc_cartogram" ->
      s"""WITH poly AS (${GeoData.polyNationSql}),
         |r AS (SELECT pid, (pid % 7 + 1) * 50 AS value, x0, y0, x1, y1,
         |        (x1 - x0) * (y1 - y0) AS area,
         |        CAST((pid % 7 + 1) * 50 AS DOUBLE) / ((x1 - x0) * (y1 - y0))
         |          AS ratio
         |      FROM poly),
         |s AS (SELECT *, sqrt(ratio / MAX(ratio) OVER ()) AS s,
         |        (x0 + x1) / 2.0 AS cx, (y0 + y1) / 2.0 AS cy
         |      FROM r)
         |SELECT pid, value, ROUND(s, 4) AS scale,
         |  ROUND(cx + (x0 - cx) * s, 4) AS nx0,
         |  ROUND(cy + (y0 - cy) * s, 4) AS ny0,
         |  ROUND(cx + (x1 - cx) * s, 4) AS nx1,
         |  ROUND(cy + (y1 - cy) * s, 4) AS ny1
         |FROM s""".stripMargin)
}

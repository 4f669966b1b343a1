package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Multimodal
import graft.sources.Wkt

/** Source-layer queries (SURVEY.md §2 rows 21, 38): WKT round-trip parse
  * and the multimodal feature-extraction pipeline.
  */
object SourceQueries {

  /** Build WKT point strings from integer event coordinates, parse them
    * back with the Catalyst WKT parser, emit coordinates. The
    * construction uses integer tenths so string formatting is identical
    * across engines. */
  def qReadWkt(spark: SparkSession, dir: String): DataFrame = {
    val raw = Tables.load(spark, dir, "events").select(
      col("event_id").cast("long").as("id"),
      Wkt.toWktPoint(col("event_id") * 73 % 1000,
        col("event_id") * 179 % 1000).as("wkt"))
    val p = Wkt.parsePoint(col("wkt"))
    raw.select(col("id"), col("wkt"),
      (p("x") / 10.0).as("px"), (p("y") / 10.0).as("py"))
  }

  def qMultimodal(spark: SparkSession, dir: String): DataFrame =
    Multimodal.extractFeatures(
      Multimodal.mediaTable(Tables.load(spark, dir, "documents"))).toDF()

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_read_wkt" -> (qReadWkt _),
    "q_multimodal" -> (qMultimodal _))

  val oracles: Map[String, String] = Map(
    // The "decode" is a deterministic stub (polynomial checksum over the
    // payload bytes); with ASCII text payloads the byte stream equals the
    // char stream, so DuckDB can replay the exact fold — making even the
    // stubbed pipeline hash-checked end to end.
    "q_multimodal" ->
      """WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, text
        |           FROM documents),
        |f AS (SELECT doc_id,
        |        ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INT)]
        |          AS kind,
        |        CAST(len(text) AS BIGINT) AS n_bytes,
        |        list_reduce(list_prepend(CAST(0 AS BIGINT),
        |          list_transform(list_filter(string_split(text, ''),
        |                                     c -> len(c) > 0),
        |                         c -> CAST(ascii(c) AS BIGINT))),
        |          (a, b) -> (a * 131 + b) % 1000000007) AS checksum
        |      FROM d)
        |SELECT doc_id, kind, n_bytes, checksum,
        |  16 + checksum % 16 AS width,
        |  16 + (checksum // 16) % 16 AS height
        |FROM f""".stripMargin,

    "q_read_wkt" ->
      """WITH w AS (
        |  SELECT CAST(event_id AS BIGINT) AS id,
        |    'POINT (' || CAST(event_id * 73 % 1000 AS VARCHAR) || ' '
        |      || CAST(event_id * 179 % 1000 AS VARCHAR) || ')' AS wkt
        |  FROM events)
        |SELECT id, wkt,
        |  CAST(regexp_extract(wkt, 'POINT \(([-0-9.]+) ([-0-9.]+)\)', 1)
        |    AS DOUBLE) / 10.0 AS px,
        |  CAST(regexp_extract(wkt, 'POINT \(([-0-9.]+) ([-0-9.]+)\)', 2)
        |    AS DOUBLE) / 10.0 AS py
        |FROM w""".stripMargin)
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.HtmlQueries

/** HTML extraction / link-graph specs (SURVEY §2 rows 101-102). */
class HtmlSpec extends AnyFunSuite with SharedSpark {

  test("html extraction roundtrips every document exactly") {
    val rows = HtmlQueries.qHtmlExtract(spark, SfDir)
      .agg(count(lit(1)).as("n"),
        sum(when(col("roundtrip"), 1L).otherwise(0L)).as("ok"),
        min(col("n_links")).as("min_links"))
      .head()
    assert(rows.getAs[Long]("n") > 0)
    assert(rows.getAs[Long]("ok") === rows.getAs[Long]("n"),
      "boilerplate strip / entity decode must recover the original text")
    // nav contributes exactly 2 anchors per page
    assert(rows.getAs[Long]("min_links") === 2L)
  }

  test("extraction handles markup-significant characters in the text") {
    import spark.implicits._
    val d = Seq((1L, "a < b & c > d", "en", "web"), (2L, "", "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
    d.createOrReplaceTempView("x")
    // same chain as the query, applied to a hand-built page via the
    // public query on a temp dir is overkill — pin the property on the
    // private chain through a minimal page expression instead
    val page = concat(
      lit("<html><head><title>t</title></head><body><p>"),
      replace(replace(replace(col("text"), lit("&"), lit("&amp;")),
        lit("<"), lit("&lt;")), lit(">"), lit("&gt;")),
      lit("</p></body></html>"))
    val extracted = trim(regexp_replace(
      replace(replace(replace(
        regexp_replace(
          regexp_replace(page, "(?s)<head>.*?</head>", " "),
          "<[^>]*>", " "),
        lit("&lt;"), lit("<")), lit("&gt;"), lit(">")),
        lit("&amp;"), lit("&")),
      "\\s+", " "))
    val out = d.select(col("text"), extracted.as("got")).collect()
    assert(out.forall(r => r.getString(1) ==
      r.getString(0).trim.replaceAll("\\s+", " ")))
  }

  test("extract plan is a single map over the scan — no exchange") {
    val plan = HtmlQueries.qHtmlExtract(spark, SfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"row-local op must not shuffle:\n$plan")
  }

  test("aho-corasick scan: cross-term overlaps, counts, first position") {
    import spark.implicits._
    val terms = Seq("he", "the", "there", "cat")
    val rows = Seq("xxthere cat", "nothing", "hehe the").toDF("t")
      .select(graft.functions.BlocklistScan(col("t"), terms).as("b"))
      .select(col("b.n_hits"), col("b.n_terms"), col("b.first_pos"))
      .collect()
    // "xxthere": he(1) the(1) there(1) + " cat"(1) = 4 hits, 4 terms,
    // first start = "the" at pos 3 (1-based)
    assert(rows(0).getLong(0) === 4L && rows(0).getLong(1) === 4L &&
      rows(0).getLong(2) === 3L)
    assert(rows(1).getLong(0) === 0L && rows(1).getLong(2) === 0L)
    // "hehe the": he x3 + the = 4 hits, 2 distinct, first pos 1
    assert(rows(2).getLong(0) === 4L && rows(2).getLong(1) === 2L &&
      rows(2).getLong(2) === 1L)
  }

  test("link graph degrees are consistent") {
    val e = HtmlQueries.qHtmlLinks(spark, SfDir).cache()
    try {
      // out_degree column matches the actual number of extracted edges
      val badOut = e.groupBy("doc_id").agg(
          count(lit(1)).as("n"), first("out_degree").as("d"))
        .filter(col("n") =!= col("d")).count()
      assert(badOut === 0L)
      // in_degree of a target equals the edge count pointing at it
      val badIn = e.groupBy("target_id").agg(
          count(lit(1)).as("n"), first("in_degree").as("d"))
        .filter(col("n") =!= col("d")).count()
      assert(badIn === 0L)
    } finally e.unpersist()
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.geom.Geom

/** Cartograms (reference: transform_cartogram / Dougenik et al. 1985,
  * gpd_lite_toolbox/core.py:199-231 + cycartogram.pyx; non-contiguous
  * variant core.py:690-748 with dorling radii utils.py:106-146).
  *
  * Scale design: the per-iteration state (one row per region — centroid,
  * area, mass) is a tiny aggregate that is BROADCAST back against the
  * distributed vertex set; vertices never leave the executors, and each
  * iteration is one map-side broadcast join + one groupBy per ring. The
  * reference's cython hot loop (every vertex x every region, sequential)
  * becomes the same product but embarrassingly parallel.
  */
object Cartogram {

  private val Pi = math.Pi

  /** One Dougenik force iteration over (pid, value, ring:array<struct<x,y>>).
    * Returns the same shape with displaced rings. */
  def dougenikIter(polys: DataFrame): DataFrame = {
    val stats = polys.select(col("pid"), col("value"),
      Geom.ringArea(col("ring")).as("area"),
      Geom.vertexMean(col("ring")).as("ctr"))
    val totals = stats.agg(sum("area").as("t_area"), sum("value").as("t_val"))
    val forces = stats.crossJoin(broadcast(totals))
      .withColumn("desired",
        col("value").cast("double") / col("t_val") * col("t_area"))
      .withColumn("radius", sqrt(col("area") / lit(Pi)))
      .withColumn("mass", sqrt(col("desired") / lit(Pi)) - col("radius"))
      .withColumn("size_err",
        greatest(col("area"), col("desired"))
          / greatest(least(col("area"), col("desired")), lit(1e-9)))
      .select(col("pid").as("fid"), col("ctr.x").as("fx"),
        col("ctr.y").as("fy"), col("radius"), col("mass"), col("size_err"))
    val reduction = forces.agg(
      (lit(1.0) / (lit(1.0) + avg("size_err"))).as("frf"))
    val verts = polys.select(col("pid"), col("value"),
      posexplode(col("ring")).as(Seq("seq", "v")))
    val displaced = verts
      .crossJoin(broadcast(forces))
      .crossJoin(broadcast(reduction))
      .withColumn("dx", col("v.x") - col("fx"))
      .withColumn("dy", col("v.y") - col("fy"))
      .withColumn("d", greatest(sqrt(col("dx") * col("dx")
        + col("dy") * col("dy")), lit(1e-9)))
      .withColumn("f",
        when(col("d") > col("radius"), col("mass") * col("radius") / col("d"))
          .otherwise(col("mass")
            * (col("d") * col("d")) / (col("radius") * col("radius"))
            * (lit(4.0) - lit(3.0) * col("d") / col("radius"))))
      .withColumn("ux", col("dx") / col("d"))
      .withColumn("uy", col("dy") / col("d"))
      .groupBy("pid", "value", "seq")
      .agg(first(col("v")).as("v"),
        sum(col("f") * col("ux") * col("frf")).as("mx"),
        sum(col("f") * col("uy") * col("frf")).as("my"))
    displaced
      .select(col("pid"), col("value"), col("seq"),
        struct((col("v.x") + col("mx")).as("x"),
          (col("v.y") + col("my")).as("y")).as("nv"))
      .groupBy("pid", "value")
      .agg(array_sort(collect_list(struct(col("seq"), col("nv")))).as("sv"))
      .select(col("pid"), col("value"),
        transform(col("sv"), s =>
          struct(s("nv")("x").as("x"), s("nv")("y").as("y"))).as("ring"))
  }

  /** n Dougenik iterations; returns per-region summary (new area/centroid
    * and achieved-vs-desired error). */
  def dougenik(polys: DataFrame, iterations: Int): DataFrame = {
    // Eagerly checkpoint each iteration's rings: dougenikIter reads its
    // input twice (stats + vertices), so an unmaterialized chain doubles
    // the recompute per iteration — exponential lineage by iteration
    // count. localCheckpoint (vs persist) also truncates lineage and
    // lets the context cleaner free each iteration's blocks as soon as
    // the next one no longer references them — nothing accumulates for
    // the job's lifetime.
    val end = (1 to iterations).foldLeft(polys)((df, _) =>
      dougenikIter(df).localCheckpoint())
    end.select(col("pid"), col("value"),
      round(Geom.ringArea(col("ring")), 4).as("new_area"),
      round(col("ring")(0)("x"), 4).as("v0x"),
      round(col("ring")(0)("y"), 4).as("v0y"))
  }

  /** n Dougenik iterations, returning the DISPLACED RING GEOMETRY itself —
    * one row per ring vertex in ring order (reference transform_cartogram
    * returns the transformed GeoDataFrame, core.py:199-231; `dougenik`
    * above is the summary twin). Coordinates round to 4 with the -0.0
    * collapse (`+ 0.0`) so the unordered-FP last-ulp differences and IEEE
    * negative zero both disappear before the oracle hash. */
  def dougenikRings(polys: DataFrame, iterations: Int): DataFrame = {
    val end = (1 to iterations).foldLeft(polys)((df, _) =>
      dougenikIter(df).localCheckpoint())
    end.select(col("pid"), col("value"),
      posexplode(col("ring")).as(Seq("seq", "v")))
      .select(col("pid"), col("value"), col("seq").cast("int").as("seq"),
        (round(col("v.x"), 4) + 0.0).as("x"),
        (round(col("v.y"), 4) + 0.0).as("y"))
  }

  /** Non-contiguous cartogram: each polygon scales about its own centroid
    * by sqrt(density ratio) relative to the densest (anchor) region —
    * closed-form, one tiny global max broadcast. Axis-aligned rects in,
    * rects out. */
  def nonContiguous(rects: DataFrame): DataFrame = {
    val withRatio = rects
      .withColumn("area", (col("x1") - col("x0")) * (col("y1") - col("y0")))
      .withColumn("ratio", col("value").cast("double") / col("area"))
    val anchor = withRatio.agg(max("ratio").as("anchor"))
    withRatio.crossJoin(broadcast(anchor))
      .withColumn("s", sqrt(col("ratio") / col("anchor")))
      .withColumn("cx", (col("x0") + col("x1")) / 2.0)
      .withColumn("cy", (col("y0") + col("y1")) / 2.0)
      .select(col("pid"), col("value"), round(col("s"), 4).as("scale"),
        round(col("cx") + (col("x0") - col("cx")) * col("s"), 4).as("nx0"),
        round(col("cy") + (col("y0") - col("cy")) * col("s"), 4).as("ny0"),
        round(col("cx") + (col("x1") - col("cx")) * col("s"), 4).as("nx1"),
        round(col("cy") + (col("y1") - col("cy")) * col("s"), 4).as("ny1"))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.geom.Geom

/** Deterministic random points on polygon surfaces (reference:
  * random_pts_on_surface, gpd_lite_toolbox/core.py:517-562 — numpy RNG +
  * shapely contains() loop per feature).
  *
  * Spark-first re-expression: a closed-form per-(feature, i) hash sequence
  * replaces the sequential RNG (so generation is embarrassingly parallel
  * and reproducible regardless of partitioning — a sequential LCG would
  * serialize at 100 TB), and the containment check is the codegen'd
  * ray-cast point-in-ring expression. The hash stays in (0,1) exclusive so
  * boundary-parity artifacts cannot occur.
  */
object RandomPoints {

  /** k(pid) = (pid % kMod) + 1 points inside each axis-aligned rectangle
    * (pid, x0, y0, x1, y1). Generic polygons go through the same pip
    * filter with their real ring. */
  def inRects(rects: DataFrame, kMod: Int): DataFrame = {
    val k = (col("pid") % kMod + lit(1)).cast("int")
    val exploded = rects.select(col("pid"), col("x0"), col("y0"),
      col("x1"), col("y1"), explode(sequence(lit(1), k)).as("i"))
    val pm = col("pid") % 100000L
    def unit(mulP: Long, mulI: Long) =
      (((pm * lit(mulP) + col("i") * lit(mulI)) % 100000L + lit(1L))
        / lit(100001.0))
    val px = col("x0") + unit(2654435761L, 40503L) * (col("x1") - col("x0"))
    val py = col("y0") + unit(1566083941L, 69069L) * (col("y1") - col("y0"))
    exploded
      .withColumn("px", px)
      .withColumn("py", py)
      .filter(graft.geom.PointInRing(col("px"), col("py"),
        Geom.rectRing(col("x0"), col("y0"), col("x1"), col("y1"))))
      .select(col("pid"), col("i").cast("long").as("i"),
        round(col("px"), 4).as("px"), round(col("py"), 4).as("py"))
  }
}

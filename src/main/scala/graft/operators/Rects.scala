package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise predicates over axis-aligned boxes (bbox layer of any geometry):
  * intersects / touches-with-tolerance / intersection fraction.
  *
  * Reference: gpd_lite_toolbox/core.py:233-254 (`intersects_byid`),
  * utils.py:159-185 (`ftouches_byid`), utils.py:188-211
  * (`intersection_part(_table)`) — all O(n*m) python loops over shapely.
  *
  * Spark-first design: never a cross join. Each box explodes into the grid
  * cells it covers (cell size chosen >= the largest box side + tolerance, so
  * any intersecting pair shares >= 1 cell), pairs join on the cell id, and
  * duplicates from multi-cell overlap collapse with a distinct on the pair
  * key. One shuffle on cell id, one on the pair key; skewed dense cells are
  * split by AQE. The reference's intersect *matrix* (a row per left feature
  * holding a list) is deliberately a flat pair table here — the relational
  * form joins/aggregates at scale, the matrix form does not.
  */
object Rects {

  /** Explode boxes (rid, x0, y0, x1, y1) into covered cells, growing each box
    * by `pad` (tolerance) before bucketing. */
  private def cells(boxes: DataFrame, cellSize: Double, pad: Double): DataFrame =
    boxes
      .withColumn("cx", explode(sequence(
        floor((col("x0") - pad) / cellSize), floor((col("x1") + pad) / cellSize))))
      .withColumn("cy", explode(sequence(
        floor((col("y0") - pad) / cellSize), floor((col("y1") + pad) / cellSize))))

  /** Pairs (ida, idb) of intersecting boxes with their box columns, including
    * self-pairs as in the reference. `tol` buffers the right side
    * (ftouches semantics when > 0). */
  def intersectPairs(a: DataFrame, b: DataFrame, cellSize: Double,
                     tol: Double = 0.0): DataFrame = {
    val la = cells(a, cellSize, 0.0).select(
      col("cx"), col("cy"), col("rid").as("ida"),
      col("x0").as("ax0"), col("y0").as("ay0"),
      col("x1").as("ax1"), col("y1").as("ay1"))
    val lb = cells(b, cellSize, tol).select(
      col("cx"), col("cy"), col("rid").as("idb"),
      col("x0").as("bx0"), col("y0").as("by0"),
      col("x1").as("bx1"), col("y1").as("by1"))
    // Reference-point dedup: a pair overlapping k cells would surface k
    // times; instead of a (wide, shuffling) dropDuplicates, emit the pair
    // only in the single cell containing the intersection's min corner —
    // a point both padded boxes cover, so exactly one (cx, cy) survives.
    // floor(x/c) is monotone, so the FP cell ranges in `cells` always
    // include it.
    la.join(lb, Seq("cx", "cy"))
      .filter(
        col("ax0") <= col("bx1") + tol && col("bx0") - tol <= col("ax1") &&
        col("ay0") <= col("by1") + tol && col("by0") - tol <= col("ay1"))
      .filter(
        col("cx") === floor(greatest(col("ax0"), col("bx0") - tol) / cellSize) &&
        col("cy") === floor(greatest(col("ay0"), col("by0") - tol) / cellSize))
      .select("ida", "idb", "ax0", "ay0", "ax1", "ay1",
              "bx0", "by0", "bx1", "by1")
  }

  /** intersects_byid as a pair table (ida, idb). */
  def intersectsByIdx(a: DataFrame, b: DataFrame, cellSize: Double): DataFrame =
    intersectPairs(a, b, cellSize).select("ida", "idb")

  /** ftouches_byid: intersects after buffering b by `tol`. */
  def ftouchesByIdx(a: DataFrame, b: DataFrame, cellSize: Double,
                    tol: Double): DataFrame =
    intersectPairs(a, b, cellSize, tol).select("ida", "idb")

  /** intersection_part: fraction of a's area covered by b, for overlapping
    * pairs (part > 0). Exact for the box model (interval arithmetic). */
  def intersectionPart(a: DataFrame, b: DataFrame, cellSize: Double): DataFrame = {
    val ix = greatest(lit(0.0), least(col("ax1"), col("bx1")) - greatest(col("ax0"), col("bx0")))
    val iy = greatest(lit(0.0), least(col("ay1"), col("by1")) - greatest(col("ay0"), col("by0")))
    val areaA = (col("ax1") - col("ax0")) * (col("ay1") - col("ay0"))
    // floor-based rounding: quantized inputs make the ratio land exactly on
    // .xxxx5 ties where library ROUND semantics diverge across engines;
    // floor(x*1e4 + 0.5)/1e4 is pure IEEE arithmetic and engine-independent.
    intersectPairs(a, b, cellSize)
      .withColumn("part", floor(ix * iy / areaA * 10000.0 + 0.5) / 10000.0)
      .filter(col("part") > 0.0)
      .select("ida", "idb", "part")
  }
}

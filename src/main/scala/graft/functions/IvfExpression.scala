package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Shared kernel for the IVF coarse-quantizer distance table — called by
  * BOTH the interpreted and the codegen path of [[IvfDistances]], so the
  * two can never diverge.
  *
  * For one vector it computes, against every centroid, the squared
  * euclidean distance accumulated in ascending element order (the same
  * left fold `(0 + t0) + t1 + ...` a flat scalar chain or DuckDB
  * `list_sum(list_transform(range(...)))` produces), rounds it with the
  * exact arithmetic of Spark's `round(_, 6)` (BigDecimal HALF_UP — the
  * rounding that absorbs unordered-AVG ulps in the centroids), and
  * returns the (d2, cluster) pairs sorted ascending lexicographically.
  * Element 0 is therefore the Lloyd assignment; the first `nprobe`
  * elements are the probe set — both identical to a
  * `row_number() OVER (ORDER BY round(d2,6), cluster)` selection, so the
  * DuckDB oracle replays it exactly.
  *
  * Why a native expression: the literal-inlined flat-scalar form of the
  * same argmin (nlist x dim ~ 4k expression nodes) spends seconds per
  * Lloyd round in Janino, and the HOF `aggregate(zip_with(...))` form is
  * CodegenFallback interpreted per candidate pair (the round-4 23.9 s
  * q_ann_ivf plan). One kernel call per ROW does the nlist x dim loop in
  * compiled Scala and keeps the projection inside whole-stage codegen.
  */
object IvfKernel {

  /** Spark `round(d, 6)` replica (see GeneralClip.roundMicro). */
  private def round6(d: Double): Double =
    java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** cents = nlist x dim row-major; clusters = nlist cluster labels.
    * Returns array<struct<d2: double, cluster: long>> sorted by
    * (d2, cluster) ascending. */
  def distances(e: ArrayData, cents: Array[Double],
                clusters: Array[Long], dim: Int): ArrayData = {
    val x = e.toDoubleArray()
    val nlist = clusters.length
    val d2 = new Array[Double](nlist)
    var c = 0
    while (c < nlist) {
      val base = c * dim
      var acc = 0.0
      var i = 0
      while (i < dim) {
        val d = x(i) - cents(base + i)
        acc += d * d
        i += 1
      }
      d2(c) = round6(acc)
      c += 1
    }
    val order = Array.range(0, nlist).sortBy(c => (d2(c), clusters(c)))
    new GenericArrayData(order.map(c =>
      InternalRow(d2(c), clusters(c)): Any))
  }
}

/** Sorted (squared-distance, cluster) table of one embedding against the
  * IVF coarse-quantizer centroids. `cents` is the nlist x dim centroid
  * matrix (row-major) — driver-sized by construction (FAISS trains its
  * coarse quantizer centrally for the same reason), carried as a plain
  * constructor field and shipped to executors inside the serialized
  * expression tree, like a broadcast of O(nlist x dim) doubles. */
case class IvfDistances(child: Expression, cents: Array[Double],
                        clusters: Array[Long], dim: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("d2", DoubleType, nullable = false),
    StructField("cluster", LongType, nullable = false))),
    containsNull = false)

  override protected def withNewChildInternal(
      newChild: Expression): IvfDistances = copy(child = newChild)

  override def nullSafeEval(e: Any): Any =
    IvfKernel.distances(e.asInstanceOf[ArrayData], cents, clusters, dim)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    // tiny generated body: both paths call the SAME static kernel
    val centsRef = ctx.addReferenceObj("cents", cents, "double[]")
    val clustersRef = ctx.addReferenceObj("clusters", clusters, "long[]")
    nullSafeCodeGen(ctx, ev, e =>
      s"""${ev.value} = graft.functions.IvfKernel.distances(
         |  $e, $centsRef, $clustersRef, $dim);""".stripMargin)
  }
}

object IvfDistances {
  /** Column API. centroids = (cluster label, centroid vector) pairs. */
  def apply(e: Column, centroids: Seq[(Long, Array[Double])]): Column = {
    require(centroids.nonEmpty,
      "IvfDistances: empty centroid seq (corpus smaller than nlist, or a " +
        "Lloyd round emptied every cluster)")
    val dim = centroids.head._2.length
    ColumnBridge.column(IvfDistances(ColumnBridge.expression(e),
      centroids.flatMap(_._2).toArray, centroids.map(_._1).toArray, dim))
  }
}

package graft.geom

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Shared kernel for the general (concave x concave) intersection area —
  * called by BOTH the interpreted and the codegen path of
  * [[GeneralClipAreaMicro]], so the two can never diverge.
  *
  * Identity (see PolyClip.generalIntersectionAreaMicro, the HOF twin this
  * is asserted bit-equal to): with both simple rings decomposed into
  * signed fan triangles from their first vertex,
  * `area(P ∩ Q) = |sum_ij s_i * s_j * area(T_i ∩ T_j)|`; each
  * triangle-triangle clip is convex x convex Sutherland–Hodgman with the
  * clip triangle re-wound CCW. Every term is rounded to integer
  * MICRO-units with the exact arithmetic of Spark's `round(_, 0)`
  * (BigDecimal HALF_UP), making the sum accumulation-order independent —
  * the property the DuckDB oracle's unordered SUM relies on.
  *
  * Reference semantics: shapely `intersection` on arbitrary simple
  * polygons, gpd_lite_toolbox/utils.py:188-211.
  */
object GeneralClip {

  /** S-H clip of triangle (ax,ay,bx,by,cx,cy) by CCW triangle
    * (px,py,qx,qy,rx,ry); returns |shoelace|/2 of the result. The loop
    * body replicates PolygonClipArea's arithmetic verbatim. */
  private def triClipArea(ax: Double, ay: Double, bx: Double, by: Double,
                          cx: Double, cy: Double,
                          px: Double, py: Double, qx: Double, qy: Double,
                          rx: Double, ry: Double): Double = {
    // convex ∩ convex output has <= 3 + 3 vertices; 16 leaves headroom
    val curX = new Array[Double](16); val curY = new Array[Double](16)
    val nxtX = new Array[Double](16); val nxtY = new Array[Double](16)
    curX(0) = ax; curY(0) = ay; curX(1) = bx; curY(1) = by
    curX(2) = cx; curY(2) = cy
    var curN = 3
    val ex = Array(px, qx, rx); val ey = Array(py, qy, ry)
    var k = 0
    while (k < 3) {
      val e1x = ex(k); val e1y = ey(k)
      val e2x = ex((k + 1) % 3); val e2y = ey((k + 1) % 3)
      var outN = 0
      if (curN >= 3) {
        var j = 0
        while (j < curN) {
          val sx = curX(j); val sy = curY(j)
          val jn = if (j + 1 == curN) 0 else j + 1
          val px2 = curX(jn); val py2 = curY(jn)
          val insS = (e2x - e1x) * (sy - e1y) - (e2y - e1y) * (sx - e1x) >= 0
          val insP = (e2x - e1x) * (py2 - e1y) - (e2y - e1y) * (px2 - e1x) >= 0
          if (insP != insS) {
            val n1 = e1x * e2y - e1y * e2x
            val n2 = sx * py2 - sy * px2
            val den = (e1x - e2x) * (sy - py2) - (e1y - e2y) * (sx - px2)
            nxtX(outN) = (n1 * (sx - px2) - n2 * (e1x - e2x)) / den
            nxtY(outN) = (n1 * (sy - py2) - n2 * (e1y - e2y)) / den
            outN += 1
          }
          if (insP) { nxtX(outN) = px2; nxtY(outN) = py2; outN += 1 }
          j += 1
        }
      }
      var j = 0
      while (j < outN) { curX(j) = nxtX(j); curY(j) = nxtY(j); j += 1 }
      curN = outN
      k += 1
    }
    if (curN < 3) 0.0
    else {
      var acc = 0.0
      var j = 0
      while (j < curN) {
        val jn = if (j + 1 == curN) 0 else j + 1
        acc += curX(j) * curY(jn) - curX(jn) * curY(j)
        j += 1
      }
      math.abs(acc) / 2.0
    }
  }

  /** Spark `round(term, 0).cast("long")` replica: Spark's Round on
    * DoubleType goes through BigDecimal(double) = BigDecimal.valueOf
    * (shortest decimal repr) with HALF_UP. */
  private def roundMicro(term: Double): Long =
    java.math.BigDecimal.valueOf(term)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  /** Signed-fan intersection area in integer micro-units. */
  def areaMicro(subj: ArrayData, clip: ArrayData): Long = {
    val n = subj.numElements(); val m = clip.numElements()
    if (n < 3 || m < 3) return 0L
    val sx = new Array[Double](n); val sy = new Array[Double](n)
    val cx = new Array[Double](m); val cy = new Array[Double](m)
    var i = 0
    while (i < n) {
      val p = subj.getStruct(i, 2); sx(i) = p.getDouble(0); sy(i) = p.getDouble(1)
      i += 1
    }
    i = 0
    while (i < m) {
      val p = clip.getStruct(i, 2); cx(i) = p.getDouble(0); cy(i) = p.getDouble(1)
      i += 1
    }
    var acc = 0L
    i = 1
    while (i <= n - 2) {
      val crA = (sx(i) - sx(0)) * (sy(i + 1) - sy(0)) -
        (sy(i) - sy(0)) * (sx(i + 1) - sx(0))
      if (crA != 0.0) {
        val sa = if (crA > 0) 1.0 else -1.0
        var j = 1
        while (j <= m - 2) {
          val crB = (cx(j) - cx(0)) * (cy(j + 1) - cy(0)) -
            (cy(j) - cy(0)) * (cx(j + 1) - cx(0))
          if (crB != 0.0) {
            val sb = if (crB > 0) 1.0 else -1.0
            // clip triangle re-wound CCW when its fan sign is negative
            val area =
              if (crB < 0)
                triClipArea(sx(0), sy(0), sx(i), sy(i), sx(i + 1), sy(i + 1),
                  cx(0), cy(0), cx(j + 1), cy(j + 1), cx(j), cy(j))
              else
                triClipArea(sx(0), sy(0), sx(i), sy(i), sx(i + 1), sy(i + 1),
                  cx(0), cy(0), cx(j), cy(j), cx(j + 1), cy(j + 1))
            acc += roundMicro(sa * sb * area * 1000000.0)
          }
          j += 1
        }
      }
      i += 1
    }
    acc
  }
}

/** Native codegen'd form of PolyClip.generalIntersectionAreaMicro (the
  * HOF twin, asserted bit-equal by spec). left = subject ring, right =
  * clip ring, both simple polygons as array<struct<x:double,y:double>>,
  * either orientation, no convexity requirement; result = signed fan
  * intersection area in integer micro-units (callers abs + /1e6). */
case class GeneralClipAreaMicro(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GeneralClipAreaMicro =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any =
    GeneralClip.areaMicro(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    // both paths call the SAME kernel (static forwarder on the Scala
    // object), so interpreted and codegen results are one code path
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.geom.GeneralClip.areaMicro($a, $b);")
}

object GeneralClipAreaMicro {
  /** Column API: native signed-fan general intersection area (micro). */
  def apply(subject: Column, clipRing: Column): Column =
    ColumnBridge.column(GeneralClipAreaMicro(
      ColumnBridge.expression(subject), ColumnBridge.expression(clipRing)))
}

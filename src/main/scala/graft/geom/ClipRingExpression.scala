package graft.geom

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Shared kernel for the Sutherland–Hodgman clipped RING (the vertex
  * sequence, not just its area) — called by BOTH the interpreted and the
  * codegen path of [[PolygonClipRing]], so the two can never diverge.
  *
  * The loop body is PolygonClipArea's verbatim (same side-test cross
  * products, same determinant-form line intersection, vertices visited
  * in the same order); the only difference is what happens after the
  * fold: the surviving vertices are returned instead of fed to the
  * shoelace. Bit-for-bit equal to the PolyClip.clip HOF fold (asserted
  * by spec) — which stays available for streaming micro-batches — but
  * runs as flat double-array loops per pair instead of interpreted
  * nested lambdas with one ArrayData allocation per step (the round-4
  * q_clip_rings hot path, 7.1 s at sf0.1).
  *
  * Reference semantics: shapely `intersection` returns the clipped
  * polygon's ring, gpd_lite_toolbox/utils.py:188-211.
  */
object ClipRing {

  /** subject = any simple ring, clip = CONVEX CCW ring, both
    * array<struct<x,y>>; returns the clipped ring's vertices (possibly
    * fewer than 3 on degenerate output — callers filter, exactly like
    * the HOF twin's consumers). */
  def clip(subj: ArrayData, clip: ArrayData): ArrayData = {
    val n0 = subj.numElements()
    val m = clip.numElements()
    var cap = math.max(2 * n0, 8)
    var curX = new Array[Double](cap)
    var curY = new Array[Double](cap)
    var nxtX = new Array[Double](cap)
    var nxtY = new Array[Double](cap)
    var curN = n0
    var i = 0
    while (i < n0) {
      val p = subj.getStruct(i, 2)
      curX(i) = p.getDouble(0); curY(i) = p.getDouble(1)
      i += 1
    }
    var k = 0
    while (k < m) {
      val c1 = clip.getStruct(k, 2)
      val c2 = clip.getStruct((k + 1) % m, 2)
      val e1x = c1.getDouble(0); val e1y = c1.getDouble(1)
      val e2x = c2.getDouble(0); val e2y = c2.getDouble(1)
      if (2 * curN > cap) {
        cap = 2 * curN
        nxtX = new Array[Double](cap); nxtY = new Array[Double](cap)
      }
      var outN = 0
      if (curN >= 3) {
        var j = 0
        while (j < curN) {
          val sx = curX(j); val sy = curY(j)
          val jn = if (j + 1 == curN) 0 else j + 1
          val px = curX(jn); val py = curY(jn)
          val insS = (e2x - e1x) * (sy - e1y) - (e2y - e1y) * (sx - e1x) >= 0
          val insP = (e2x - e1x) * (py - e1y) - (e2y - e1y) * (px - e1x) >= 0
          if (insP != insS) {
            val n1 = e1x * e2y - e1y * e2x
            val n2 = sx * py - sy * px
            val den = (e1x - e2x) * (sy - py) - (e1y - e2y) * (sx - px)
            nxtX(outN) = (n1 * (sx - px) - n2 * (e1x - e2x)) / den
            nxtY(outN) = (n1 * (sy - py) - n2 * (e1y - e2y)) / den
            outN += 1
          }
          if (insP) { nxtX(outN) = px; nxtY(outN) = py; outN += 1 }
          j += 1
        }
      }
      val tx = curX; val ty = curY
      curX = nxtX; curY = nxtY
      if (tx.length >= cap) { nxtX = tx; nxtY = ty }
      else { nxtX = new Array[Double](cap); nxtY = new Array[Double](cap) }
      curN = outN
      k += 1
    }
    val out = new Array[Any](curN)
    var j = 0
    while (j < curN) {
      out(j) = InternalRow(curX(j), curY(j))
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** Native codegen'd form of PolyClip.clip: left = subject ring (any
  * simple polygon), right = CONVEX CCW clip ring; result = the clipped
  * ring as array<struct<x,y>> in S-H emission order. */
case class PolygonClipRing(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("x", DoubleType, nullable = false),
    StructField("y", DoubleType, nullable = false))),
    containsNull = false)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PolygonClipRing =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any =
    ClipRing.clip(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    // both paths call the SAME kernel (static forwarder on the Scala
    // object), so interpreted and codegen results are one code path
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.geom.ClipRing.clip($a, $b);")
}

object PolygonClipRing {
  /** Column API: native codegen'd S-H clipped ring. */
  def apply(subject: Column, clipRing: Column): Column =
    ColumnBridge.column(PolygonClipRing(
      ColumnBridge.expression(subject), ColumnBridge.expression(clipRing)))
}

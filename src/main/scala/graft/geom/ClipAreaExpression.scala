package graft.geom

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Sutherland–Hodgman intersection AREA as a NATIVE Catalyst expression
  * with whole-stage codegen (SURVEY.md §5) — the hot-loop twin of the
  * higher-order-function formulation in geom.PolyClip.
  *
  * left = subject ring (any simple polygon), right = CONVEX CCW clip
  * ring, both array<struct<x:double, y:double>>; result = unrounded
  * intersection area (0.0 when the clipped polygon is degenerate).
  *
  * Arithmetic is IDENTICAL to PolyClip.clip + Geom.ringArea — the same
  * side-test cross products, the same determinant-form line
  * intersection, vertices and shoelace terms visited in the same order —
  * so the result is bit-for-bit equal to the lambda pipeline (asserted
  * by a spec) and drop-in oracle-compatible, while compiling to flat
  * double-array loops instead of one ArrayData allocation per lambda
  * step.
  *
  * Reference semantics: shapely `intersection` area in
  * gpd_lite_toolbox/utils.py:188-211; algorithm: Sutherland & Hodgman,
  * "Reentrant polygon clipping", CACM 17(1), 1974.
  */
case class PolygonClipArea(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PolygonClipArea =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val subj = a.asInstanceOf[ArrayData]
    val clip = b.asInstanceOf[ArrayData]
    val n0 = subj.numElements()
    val m = clip.numElements()
    // one half-plane step emits at most 2 points per input edge (the
    // crossing plus the endpoint), so a CONCAVE subject can grow a step's
    // output past n + m — buffers resize to 2*curN before each step
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
      // the old cur arrays may be smaller than cap after a resize; only
      // reuse them as the next scratch if they still fit
      if (tx.length >= cap) { nxtX = tx; nxtY = ty }
      else { nxtX = new Array[Double](cap); nxtY = new Array[Double](cap) }
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

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val fn = ctx.addNewFunction("graftClipArea",
      s"""
         |private double graftClipArea(
         |    org.apache.spark.sql.catalyst.util.ArrayData subj,
         |    org.apache.spark.sql.catalyst.util.ArrayData clip) {
         |  int n0 = subj.numElements();
         |  int m = clip.numElements();
         |  // concave subjects can grow a step's output to 2*curN; buffers
         |  // resize before each step (mirrors the interpreted path)
         |  int cap = Math.max(2 * n0, 8);
         |  double[] curX = new double[cap]; double[] curY = new double[cap];
         |  double[] nxtX = new double[cap]; double[] nxtY = new double[cap];
         |  int curN = n0;
         |  for (int i = 0; i < n0; i++) {
         |    org.apache.spark.sql.catalyst.InternalRow p = subj.getStruct(i, 2);
         |    curX[i] = p.getDouble(0); curY[i] = p.getDouble(1);
         |  }
         |  for (int k = 0; k < m; k++) {
         |    org.apache.spark.sql.catalyst.InternalRow c1 = clip.getStruct(k, 2);
         |    org.apache.spark.sql.catalyst.InternalRow c2 =
         |        clip.getStruct((k + 1) % m, 2);
         |    double e1x = c1.getDouble(0); double e1y = c1.getDouble(1);
         |    double e2x = c2.getDouble(0); double e2y = c2.getDouble(1);
         |    if (2 * curN > cap) {
         |      cap = 2 * curN;
         |      nxtX = new double[cap]; nxtY = new double[cap];
         |    }
         |    int outN = 0;
         |    if (curN >= 3) {
         |      for (int j = 0; j < curN; j++) {
         |        double sx = curX[j]; double sy = curY[j];
         |        int jn = (j + 1 == curN) ? 0 : j + 1;
         |        double px = curX[jn]; double py = curY[jn];
         |        boolean insS =
         |          (e2x - e1x) * (sy - e1y) - (e2y - e1y) * (sx - e1x) >= 0;
         |        boolean insP =
         |          (e2x - e1x) * (py - e1y) - (e2y - e1y) * (px - e1x) >= 0;
         |        if (insP != insS) {
         |          double n1 = e1x * e2y - e1y * e2x;
         |          double n2 = sx * py - sy * px;
         |          double den = (e1x - e2x) * (sy - py)
         |                     - (e1y - e2y) * (sx - px);
         |          nxtX[outN] = (n1 * (sx - px) - n2 * (e1x - e2x)) / den;
         |          nxtY[outN] = (n1 * (sy - py) - n2 * (e1y - e2y)) / den;
         |          outN++;
         |        }
         |        if (insP) { nxtX[outN] = px; nxtY[outN] = py; outN++; }
         |      }
         |    }
         |    double[] tx = curX; double[] ty = curY;
         |    curX = nxtX; curY = nxtY;
         |    if (tx.length >= cap) { nxtX = tx; nxtY = ty; }
         |    else { nxtX = new double[cap]; nxtY = new double[cap]; }
         |    curN = outN;
         |  }
         |  if (curN < 3) return 0.0;
         |  double acc = 0.0;
         |  for (int j = 0; j < curN; j++) {
         |    int jn = (j + 1 == curN) ? 0 : j + 1;
         |    acc += curX[j] * curY[jn] - curX[jn] * curY[j];
         |  }
         |  return Math.abs(acc) / 2.0;
         |}
       """.stripMargin)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $fn($a, $b);")
  }
}

object PolygonClipArea {
  /** Column API: native codegen'd S-H intersection area. */
  def apply(subject: Column, clipRing: Column): Column =
    ColumnBridge.column(PolygonClipArea(
      ColumnBridge.expression(subject), ColumnBridge.expression(clipRing)))
}

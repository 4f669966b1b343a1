package graft.geom

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Orders a dissolved group's boundary-edge set (the edges that survive
  * cancellation in [[graft.operators.Dissolve.boundaryEdges]]) into closed
  * ring vertex sequences — the merged (Multi)Polygon geometry the reference
  * `dissolve` returns (gpd_lite_toolbox/core.py:257-282, shapely
  * `unary_union`), here produced without a geometry library.
  *
  * Deterministic rightmost-turn walk over the axis-aligned edge graph:
  *   - edges are sorted lexicographically by (ex0,ey0,ex1,ey1); each edge
  *     is normalized so its first endpoint is the lexicographic min (the
  *     construction in Dissolve.boundaryEdges guarantees this);
  *   - a ring starts at the first unused edge, walking from (ex0,ey0)
  *     toward (ex1,ey1) — at the boundary's minimal vertex that direction
  *     is "up the left side", i.e. clockwise with the interior on the
  *     right;
  *   - at each vertex the next edge is the unused incident edge with the
  *     best turn priority right(0) < straight(1) < left(2) relative to the
  *     incoming direction, ties broken by edge sort order. The rightmost-
  *     turn rule splits degree-4 corner-touch vertices into separate
  *     SIMPLE rings (a figure-eight never survives) — the planar-face
  *     traversal shapely's union performs internally.
  *
  * Runs once per DISSOLVE GROUP (after groupBy + collect_list), not per
  * input row: the per-call edge count is bounded by the group's boundary
  * complexity — the same per-group contract as the reference's
  * `unary_union` — so the walk's O(E^2) incident scan is row-local work on
  * driver-independent, executor-distributed rows.
  */
object RingAssembly {

  /** edges: array<struct<ex0,ey0,ex1,ey1>> in any order; returns
    * array<struct<ring:int, vi:int, x:double, y:double>> — ring vertex
    * sequences, rings numbered in walk order. */
  // SQL SIGN(a-b) twin (treats -0.0 == 0.0, unlike Double.compare)
  private def sgn(a: Double, b: Double): Int =
    if (a < b) -1 else if (a > b) 1 else 0

  def assemble(edges: ArrayData): ArrayData = {
    val n = edges.numElements()
    val ex0 = new Array[Double](n); val ey0 = new Array[Double](n)
    val ex1 = new Array[Double](n); val ey1 = new Array[Double](n)
    var i = 0
    while (i < n) {
      val e = edges.getStruct(i, 4)
      ex0(i) = e.getDouble(0); ey0(i) = e.getDouble(1)
      ex1(i) = e.getDouble(2); ey1(i) = e.getDouble(3)
      i += 1
    }
    // lexicographic sort on (ex0,ey0,ex1,ey1) — collect_list order is
    // nondeterministic, the sort makes the walk (and the oracle) stable
    val idx = Array.range(0, n).sortWith { (a, b) =>
      if (ex0(a) != ex0(b)) ex0(a) < ex0(b)
      else if (ey0(a) != ey0(b)) ey0(a) < ey0(b)
      else if (ex1(a) != ex1(b)) ex1(a) < ex1(b)
      else ey1(a) < ey1(b)
    }
    val used = new Array[Boolean](n)
    var usedCount = 0
    val out = new java.util.ArrayList[Any](n)
    var ring = -1
    var scan = 0
    while (usedCount < n) {
      while (scan < n && used(scan)) scan += 1
      val i0 = idx(scan)
      ring += 1
      val sx = ex0(i0); val sy = ey0(i0)
      out.add(InternalRow(ring, 0, sx, sy))
      var dx = sgn(ex1(i0), ex0(i0))
      var dy = sgn(ey1(i0), ey0(i0))
      var cx = ex1(i0); var cy = ey1(i0)
      used(scan) = true; usedCount += 1
      var vi = 1
      while (!(cx == sx && cy == sy)) {
        var bestK = -1; var bestScore = 9
        var bdx = 0; var bdy = 0; var btx = 0.0; var bty = 0.0
        var k = 0
        while (k < n && bestScore > 0) {
          if (!used(k)) {
            val e = idx(k)
            var tox = 0.0; var toy = 0.0; var incident = false
            if (ex0(e) == cx && ey0(e) == cy) {
              tox = ex1(e); toy = ey1(e); incident = true
            } else if (ex1(e) == cx && ey1(e) == cy) {
              tox = ex0(e); toy = ey0(e); incident = true
            }
            if (incident) {
              val odx = sgn(tox, cx)
              val ody = sgn(toy, cy)
              val score =
                if (odx == dy && ody == -dx) 0       // right turn
                else if (odx == dx && ody == dy) 1   // straight
                else if (odx == -dy && ody == dx) 2  // left turn
                else 3                               // reverse (overlap)
              if (score < bestScore) {
                bestScore = score; bestK = k
                bdx = odx; bdy = ody; btx = tox; bty = toy
              }
            }
          }
          k += 1
        }
        require(bestK >= 0,
          s"RingAssembly: open boundary at ($cx,$cy) — edge set is not " +
            "a cancelled closed boundary")
        out.add(InternalRow(ring, vi, cx, cy))
        vi += 1
        used(bestK) = true; usedCount += 1
        dx = bdx; dy = bdy; cx = btx; cy = bty
      }
    }
    new GenericArrayData(out.toArray)
  }
}

/** Native form of the boundary-ring walk: child = the group's boundary
  * edge set array<struct<ex0,ey0,ex1,ey1>>; result = ring vertices
  * array<struct<ring,vi,x,y>> in deterministic walk order. */
case class DissolveRings(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("ring", IntegerType, nullable = false),
    StructField("vi", IntegerType, nullable = false),
    StructField("x", DoubleType, nullable = false),
    StructField("y", DoubleType, nullable = false))),
    containsNull = false)

  override protected def withNewChildInternal(
      newChild: Expression): DissolveRings = copy(child = newChild)

  override def nullSafeEval(e: Any): Any =
    RingAssembly.assemble(e.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    // interpreted and codegen paths share the one kernel
    defineCodeGen(ctx, ev, e => s"graft.geom.RingAssembly.assemble($e)")
}

object DissolveRings {
  /** Column API: boundary-edge set -> ordered ring vertices. */
  def apply(edges: Column): Column =
    ColumnBridge.column(DissolveRings(ColumnBridge.expression(edges)))
}

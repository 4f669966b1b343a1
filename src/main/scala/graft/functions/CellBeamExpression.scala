package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Row-local per-cell beam for the line-matching candidate search
  * (MatchLines.matchByHausdorff).
  *
  * One call scans a cell digest — the array of (lb, nb, sxb, syb)
  * target summaries that share one centroid grid cell — against a probe
  * line's (na, sxa, sya), computes the EXACT-integer centroid proxy
  *   ddx = sxa*nb - sxb*na;  ddy = sya*nb - syb*na
  *   proxy = (ddx^2 + ddy^2) / ((na*nb))^2        (one double divide)
  * and keeps the k smallest (proxy, lb) pairs in a bounded heap
  * ([[TopKHeap]], same compare as TopKAgg: key ASC then tie ASC).
  *
  * Why: top-k of a union is the top-k of the per-cell top-k's, so the
  * 3x3-cell candidate join can collapse each (probe, cell) pair to at
  * most k rows INSIDE the join's map stage — the downstream TopKAgg
  * merges <= 9k rows per probe instead of every candidate row. At sf0.1
  * that turns a 14.2M-row aggregate input into ~0.5M, and at 100 TB it
  * keeps beam-search cost proportional to probes x k, not candidates.
  * The proxy arithmetic is bit-identical to the row-per-candidate
  * formulation (long cross terms fit: sums are integer tenths <= 1e4,
  * n <= 1e3 per line; products < 2^53), so the selected beam — and
  * therefore the final hausdorff match — is unchanged.
  *
  * Returns array<struct<key: double, tie: long>> sorted ascending by
  * (key, tie) — same shape TopKAgg emits, minus the payload.
  */
object CellBeamKernel {
  def beam(ts: ArrayData, na: Long, sxa: Long, sya: Long,
           k: Int): ArrayData = {
    val h = new TopKHeap(k)
    val n = ts.numElements()
    var i = 0
    while (i < n) {
      val t = ts.getStruct(i, 4)
      val lb = t.getLong(0)
      val nb = t.getLong(1)
      val ddx = sxa * nb - t.getLong(2) * na
      val ddy = sya * nb - t.getLong(3) * na
      val den = na * nb
      h.insert((ddx * ddx + ddy * ddy).toDouble / (den * den).toDouble,
        lb, 0L)
      i += 1
    }
    val idx = Array.range(0, h.size).sortWith { (a, b) =>
      h.key(a) < h.key(b) || (h.key(a) == h.key(b) && h.tie(a) < h.tie(b))
    }
    new GenericArrayData(idx.map(i2 =>
      InternalRow(h.key(i2), h.tie(i2)): Any))
  }
}

case class CellBeam(ts: Expression, na: Expression, sxa: Expression,
                    sya: Expression, k: Int) extends QuaternaryExpression {

  require(k > 0, "CellBeam: k must be positive")

  override def first: Expression = ts
  override def second: Expression = na
  override def third: Expression = sxa
  override def fourth: Expression = sya

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression,
      newFourth: Expression): CellBeam =
    copy(ts = newFirst, na = newSecond, sxa = newThird, sya = newFourth)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", DoubleType, nullable = false),
    StructField("tie", LongType, nullable = false))),
    containsNull = false)

  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(tsv: Any, nav: Any, sxav: Any,
                                      syav: Any): Any =
    CellBeamKernel.beam(tsv.asInstanceOf[ArrayData],
      nav.asInstanceOf[Long], sxav.asInstanceOf[Long],
      syav.asInstanceOf[Long], k)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    // tiny generated body: same static kernel as the interpreted path
    nullSafeCodeGen(ctx, ev, (t, n, sx, sy) =>
      s"""${ev.value} = graft.functions.CellBeamKernel.beam(
         |  $t, $n, $sx, $sy, $k);""".stripMargin)
}

object CellBeam {
  /** Column API. `ts` = array<struct<lb, nb, sxb, syb>> cell digest. */
  def apply(ts: Column, na: Column, sxa: Column, sya: Column,
            k: Int): Column =
    ColumnBridge.column(CellBeam(ColumnBridge.expression(ts),
      ColumnBridge.expression(na), ColumnBridge.expression(sxa),
      ColumnBridge.expression(sya), k))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Shared kernel for the IVF-PQ ADC (asymmetric distance computation)
  * term sum — called by BOTH the interpreted and the codegen path of
  * [[AdcScore]], so the two can never diverge (r19 optimization,
  * VERDICT r18 item 6 re-attributed).
  *
  * Why a native expression: the r18 ADC projection built the distance
  * as a flat m·dsub-term expression grid with the full m × ksub × dsub
  * codebook literal embedded per term — a ~190 KB single expression in
  * the formatted plan (plans/r19/q_ann_pq_before.txt), re-analyzed and
  * re-codegen'd by the driver on every PQ row's planning, the same
  * failure mode MaxSimScore fixed for q_maxsim. One kernel call keeps
  * the projection tiny and the codebook travels once as a reference
  * object.
  *
  * Arithmetic is IDENTICAL to the fold it replaces: subspace-major,
  * element-minor ascending left fold from 0.0 —
  * `((0.0 + d00²) + d01²) + ...` with
  * `d_si = qr[s·dsub+i] − cb[s][codes[s]][i]` — and the caller applies
  * the same outer `round(_, 6)`, so the DuckDB oracle's replay of the
  * grid form stays bit-equal. A code dropped by PQ training is
  * zero-filled in the dense codebook exactly as the grid's dense
  * literal was (and can never be referenced — no vector encodes to
  * it). */
object AdcKernel {
  /** cb = dense m × ksub × dsub codebook, row-major. */
  def dist(codes: ArrayData, qr: ArrayData, cb: Array[Double],
           m: Int, ksub: Int, dsub: Int): Double = {
    var acc = 0.0
    var s = 0
    while (s < m) {
      val base = (s * ksub + codes.getLong(s).toInt) * dsub
      val qBase = s * dsub
      var i = 0
      while (i < dsub) {
        val d = qr.getDouble(qBase + i) - cb(base + i)
        acc += d * d
        i += 1
      }
      s += 1
    }
    acc
  }
}

/** Native codegen'd ADC distance of one encoded vector (array<long>
  * sub-codes) against one query residual (array<double>); null iff
  * either input is null (the grid form's null propagation). */
case class AdcScore(left: Expression, right: Expression,
                    cb: Array[Double], m: Int, ksub: Int, dsub: Int)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcScore =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(codes: Any, qr: Any): Any =
    AdcKernel.dist(codes.asInstanceOf[ArrayData],
      qr.asInstanceOf[ArrayData], cb, m, ksub, dsub)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("cb", cb, "double[]")
    nullSafeCodeGen(ctx, ev, (codes, qr) =>
      s"""${ev.value} = graft.functions.AdcKernel.dist(
         |  $codes, $qr, $cbRef, $m, $ksub, $dsub);""".stripMargin)
  }
}

object AdcScore {
  /** Column API. books = per-subspace (code, centroid) seqs — densified
    * to m × ksub × dsub with zero-fill for dropped codes, the same
    * shape the r18 literal grid shipped. */
  def apply(codes: Column, qr: Column,
            books: IndexedSeq[Seq[(Long, Array[Double])]],
            ksub: Int, dsub: Int): Column = {
    val m = books.length
    val cb = new Array[Double](m * ksub * dsub)
    books.zipWithIndex.foreach { case (bk, s) =>
      bk.foreach { case (code, ce) =>
        System.arraycopy(ce, 0, cb, (s * ksub + code.toInt) * dsub, dsub)
      }
    }
    ColumnBridge.column(AdcScore(ColumnBridge.expression(codes),
      ColumnBridge.expression(qr), cb, m, ksub, dsub))
  }
}

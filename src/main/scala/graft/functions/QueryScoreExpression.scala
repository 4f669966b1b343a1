package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Shared kernels for map-only ANN scoring: one corpus row against the
  * WHOLE (driver-sized, expression-embedded) query matrix — called by
  * BOTH the interpreted and codegen paths of [[CosineScores]] /
  * [[IntDotScores]], so the two can never diverge.
  *
  * Arithmetic replicates the join-form expressions bit-for-bit: the dot
  * accumulates in ascending element order from 0.0 (the flat-scalar
  * left fold), the denominator is `greatest(qn * nn, 1e-12)` (double
  * multiply order preserved), and rounding is Spark's `round(_, 4)`
  * (BigDecimal HALF_UP). The self-pair (qid == nid) is skipped exactly
  * like the old join condition.
  *
  * Why: the brute-force baseline was a broadcast-nested-loop join
  * producing corpus x queries rows, each evaluating a dim-term codegen
  * chain. One kernel call per CORPUS row does the queries x dim loop
  * cache-friendly in compiled Scala, and the join disappears — the
  * exact-baseline plan becomes scan -> kernel -> explode -> top-k
  * aggregate, the same map-only shape IvfDistances gave the IVF
  * assignment.
  */
object QueryScoreKernel {

  private def round4(d: Double): Double =
    java.math.BigDecimal.valueOf(d)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  /** qmat = nQ x dim row-major; returns (qid, cos4) pairs, self-pair
    * skipped. */
  def cosine(nid: Long, e: ArrayData, nrm: Double, qids: Array[Long],
             qmat: Array[Double], qnorms: Array[Double],
             dim: Int): ArrayData = {
    val x = e.toDoubleArray()
    val out = new Array[Any](qids.length - (
      if (qids.contains(nid)) 1 else 0))
    var o = 0
    var j = 0
    while (j < qids.length) {
      if (qids(j) != nid) {
        val base = j * dim
        var acc = 0.0
        var i = 0
        while (i < dim) {
          acc += qmat(base + i) * x(i)
          i += 1
        }
        val den = math.max(qnorms(j) * nrm, 1e-12)
        out(o) = InternalRow(qids(j), round4(acc / den))
        o += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Integer-quantized twin: qmat/e are int8 codes as longs, norms are
    * integer sums of squares; one double division at the end. */
  def intDot(nid: Long, q: ArrayData, nq: Long, qids: Array[Long],
             qmat: Array[Long], qnorms: Array[Long],
             dim: Int): ArrayData = {
    val x = q.toLongArray()
    val out = new Array[Any](qids.length - (
      if (qids.contains(nid)) 1 else 0))
    var o = 0
    var j = 0
    while (j < qids.length) {
      if (qids(j) != nid) {
        val base = j * dim
        var acc = 0L
        var i = 0
        while (i < dim) {
          acc += qmat(base + i) * x(i)
          i += 1
        }
        val den = math.max(
          math.sqrt(qnorms(j).toDouble) * math.sqrt(nq.toDouble), 1e-12)
        out(o) = InternalRow(qids(j), round4(acc.toDouble / den))
        o += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** (qid, cos4) scores of one corpus embedding against every query —
  * children: (nid, embedding e, norm). The query matrix ships inside
  * the serialized expression like IvfDistances' centroids. */
case class CosineScores(first: Expression, second: Expression,
                        third: Expression, qids: Array[Long],
                        qmat: Array[Double], qnorms: Array[Double],
                        dim: Int)
    extends TernaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("qid", LongType, nullable = false),
    StructField("cos4", DoubleType, nullable = false))),
    containsNull = false)

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): CosineScores =
    copy(first = f, second = s, third = t)

  override def nullSafeEval(nid: Any, e: Any, nrm: Any): Any =
    QueryScoreKernel.cosine(nid.asInstanceOf[Long],
      e.asInstanceOf[ArrayData], nrm.asInstanceOf[Double],
      qids, qmat, qnorms, dim)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val qidsRef = ctx.addReferenceObj("qids", qids, "long[]")
    val qmatRef = ctx.addReferenceObj("qmat", qmat, "double[]")
    val qnRef = ctx.addReferenceObj("qnorms", qnorms, "double[]")
    nullSafeCodeGen(ctx, ev, (nid, e, nrm) =>
      s"""${ev.value} = graft.functions.QueryScoreKernel.cosine(
         |  $nid, $e, $nrm, $qidsRef, $qmatRef, $qnRef, $dim);""".stripMargin)
  }
}

object CosineScores {
  /** queries = (qid, embedding, norm) rows, driver-sized. */
  def apply(nid: Column, e: Column, nrm: Column,
            queries: Seq[(Long, Array[Double], Double)],
            dim: Int): Column = {
    require(queries.nonEmpty, "CosineScores: empty query set")
    ColumnBridge.column(CosineScores(ColumnBridge.expression(nid),
      ColumnBridge.expression(e), ColumnBridge.expression(nrm),
      queries.map(_._1).toArray, queries.flatMap(_._2).toArray,
      queries.map(_._3).toArray, dim))
  }
}

/** Integer-quantized twin of [[CosineScores]] — children:
  * (nid, quantized codes q, integer norm nq). */
case class IntDotScores(first: Expression, second: Expression,
                        third: Expression, qids: Array[Long],
                        qmat: Array[Long], qnorms: Array[Long], dim: Int)
    extends TernaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("qid", LongType, nullable = false),
    StructField("qcos4", DoubleType, nullable = false))),
    containsNull = false)

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): IntDotScores =
    copy(first = f, second = s, third = t)

  override def nullSafeEval(nid: Any, q: Any, nq: Any): Any =
    QueryScoreKernel.intDot(nid.asInstanceOf[Long],
      q.asInstanceOf[ArrayData], nq.asInstanceOf[Long],
      qids, qmat, qnorms, dim)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val qidsRef = ctx.addReferenceObj("qids", qids, "long[]")
    val qmatRef = ctx.addReferenceObj("qmat", qmat, "long[]")
    val qnRef = ctx.addReferenceObj("qnorms", qnorms, "long[]")
    nullSafeCodeGen(ctx, ev, (nid, q, nq) =>
      s"""${ev.value} = graft.functions.QueryScoreKernel.intDot(
         |  $nid, $q, $nq, $qidsRef, $qmatRef, $qnRef, $dim);""".stripMargin)
  }
}

object IntDotScores {
  /** queries = (qid, int8 codes, integer norm) rows, driver-sized. */
  def apply(nid: Column, q: Column, nq: Column,
            queries: Seq[(Long, Array[Long], Long)], dim: Int): Column = {
    require(queries.nonEmpty, "IntDotScores: empty query set")
    ColumnBridge.column(IntDotScores(ColumnBridge.expression(nid),
      ColumnBridge.expression(q), ColumnBridge.expression(nq),
      queries.map(_._1).toArray, queries.flatMap(_._2).toArray,
      queries.map(_._3).toArray, dim))
  }
}

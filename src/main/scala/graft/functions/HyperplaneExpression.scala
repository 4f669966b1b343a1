package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Shared kernel for the LSH sign-bit bucket — called by BOTH the
  * interpreted and the codegen path of [[HyperplaneBucket]], so the two
  * can never diverge.
  *
  * For plane j the dot product accumulates in ascending element order
  * starting from 0.0 — the same left fold `(0 + t0) + t1 + ...` the
  * flat-scalar chain (and DuckDB's `list_sum(list_transform(...))`
  * replay) produces, so results are bit-identical to the inlined form
  * and every LSH oracle is untouched. Bit j is set iff the dot is
  * strictly positive; bits OR together in ascending j (associative —
  * order irrelevant).
  *
  * Why a native expression: the literal-inlined flat-scalar bucket is
  * planes x dim (16 x 64 ~ 1k) expression nodes inside one projection;
  * together with the norm chain the generated `project_doConsume`
  * method exceeds Janino's limits and the WHOLE STAGE silently falls
  * back to interpreted execution (observed as `ERROR CodeGenerator:
  * InternalCompilerException` in q_ann_lsh / q_ann_recall_lsh /
  * q_dedup_embedding runs). One kernel call per row keeps the
  * projection inside whole-stage codegen with a tiny generated body —
  * the same cure IvfDistances applied to the IVF argmin.
  */
object HyperplaneKernel {

  /** planes = nPlanes x dim row-major hyperplane components. */
  def bucket(e: ArrayData, planes: Array[Double], nPlanes: Int,
             dim: Int): Long = {
    val x = e.toDoubleArray()
    var b = 0L
    var j = 0
    while (j < nPlanes) {
      val base = j * dim
      var acc = 0.0
      var i = 0
      while (i < dim) {
        acc += x(i) * planes(base + i)
        i += 1
      }
      if (acc > 0) b |= 1L << j
      j += 1
    }
    b
  }
}

/** Sign-bit hyperplane bucket of one embedding: bit j of the result is
  * set iff the embedding's dot product with deterministic pseudo-random
  * hyperplane j is positive. The nPlanes x dim plane matrix (row-major)
  * is driver-sized by construction (16 x 64 doubles) and ships to
  * executors inside the serialized expression tree, like IvfDistances'
  * centroid matrix. */
case class HyperplaneBucket(child: Expression, planes: Array[Double],
                            nPlanes: Int, dim: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override protected def withNewChildInternal(
      newChild: Expression): HyperplaneBucket = copy(child = newChild)

  override def nullSafeEval(e: Any): Any =
    HyperplaneKernel.bucket(e.asInstanceOf[ArrayData], planes, nPlanes, dim)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    // tiny generated body: both paths call the SAME static kernel
    val planesRef = ctx.addReferenceObj("planes", planes, "double[]")
    nullSafeCodeGen(ctx, ev, e =>
      s"""${ev.value} = graft.functions.HyperplaneKernel.bucket(
         |  $e, $planesRef, $nPlanes, $dim);""".stripMargin)
  }
}

object HyperplaneBucket {
  /** Column API. planes = per-plane component vectors, each of length
    * dim (the deterministic Ann.hyperplane family). */
  def apply(e: Column, planes: Seq[Seq[Double]]): Column = {
    require(planes.nonEmpty, "HyperplaneBucket: empty plane seq")
    require(planes.size <= 63,
      "HyperplaneBucket: more than 63 planes overflows the Long bucket")
    val dim = planes.head.size
    require(planes.forall(_.size == dim),
      "HyperplaneBucket: ragged plane matrix")
    ColumnBridge.column(HyperplaneBucket(ColumnBridge.expression(e),
      planes.flatten.toArray, planes.size, dim))
  }
}

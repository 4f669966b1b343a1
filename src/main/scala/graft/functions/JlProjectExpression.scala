package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Shared kernel for the JL random projection — called by both the
  * interpreted and codegen paths so they can never diverge.
  *
  * Each output dimension accumulates in ascending element order from
  * 0.0 — the same left fold the flat-scalar chain (and DuckDB's
  * `list_sum(list_transform(...))` replay) produces, so swapping the
  * inlined chain for this kernel changes no result bit and no oracle.
  *
  * Why a native expression: the literal-inlined form is kOut x dim
  * (16 x 64 ~ 1k) expression nodes inside one projection; Janino either
  * spends seconds compiling the giant method or gives up and drops the
  * stage out of codegen (q_random_projection measured 5.7 s at sf0.1
  * against 0.3 s-class row-local peers). One kernel call per row keeps
  * the stage inside whole-stage codegen with a tiny body — the
  * HyperplaneBucket/IvfDistances cure applied to the JL matrix. */
object JlProjectKernel {

  /** signs = kOut x dim row-major ±scale matrix. */
  def project(e: ArrayData, signs: Array[Double], kOut: Int,
              dim: Int): ArrayData = {
    val x = e.toDoubleArray()
    val out = new Array[Double](kOut)
    var j = 0
    while (j < kOut) {
      val base = j * dim
      var acc = 0.0
      var i = 0
      while (i < dim) {
        acc += x(i) * signs(base + i)
        i += 1
      }
      out(j) = acc
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** kOut JL projections of one embedding (array<double> child), as
  * array<double>. The sign matrix is driver-sized by construction
  * (kOut x dim doubles) and ships inside the serialized expression. */
case class JlProject(child: Expression, signs: Array[Double], kOut: Int,
                     dim: Int)
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)

  override protected def withNewChildInternal(
      newChild: Expression): JlProject = copy(child = newChild)

  override def nullSafeEval(e: Any): Any =
    JlProjectKernel.project(e.asInstanceOf[ArrayData], signs, kOut, dim)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("signs", signs, "double[]")
    nullSafeCodeGen(ctx, ev, e =>
      s"""${ev.value} = graft.functions.JlProjectKernel.project(
         |  $e, $signsRef, $kOut, $dim);""".stripMargin)
  }
}

object JlProject {
  /** Column API: e must already be array<double>. */
  def apply(e: Column, signs: Seq[Seq[Double]]): Column = {
    require(signs.nonEmpty, "JlProject: empty sign matrix")
    val dim = signs.head.size
    require(signs.forall(_.size == dim), "JlProject: ragged sign matrix")
    ColumnBridge.column(JlProject(ColumnBridge.expression(e),
      signs.flatten.toArray, signs.size, dim))
  }
}

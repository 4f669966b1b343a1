package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Shared kernel for the fixed-dim array<double> dot product — the native
  * replacement for the flat 64-term getItem fold (r18 optimization).
  *
  * Why: the flat scalar fold `(((0 + a0*b0) + a1*b1) + ...)` inlines
  * ~dim*4 JVM bytecode ops into whatever whole-stage-codegen method
  * contains it; fused under a join the generated `processNext()` crosses
  * the JIT's DontCompileHugeMethods limit (8000 bytecodes) and the WHOLE
  * fused stage drops to the bytecode interpreter — measured 65 µs/pair
  * on the bitext pair-scoring stage (≈300x a compiled dot). One loop in
  * compiled Scala keeps the generated method tiny and JIT-hot at any
  * dim.
  *
  * Arithmetic is IDENTICAL to the fold it replaces: ascending element
  * order, accumulating from 0.0 — `((0.0 + a0*b0) + a1*b1) + ...` — so
  * every oracle that replays the flat form stays bit-equal. Elements
  * must be non-null (the withNorm dim guard upstream enforces the shape;
  * same contract as the fold's getItem chain on the guarded arrays).
  */
object ArrDotKernel {
  def dot(a: ArrayData, b: ArrayData, dim: Int): Double = {
    var acc = 0.0
    var i = 0
    while (i < dim) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }
}

/** Native codegen'd fixed-dim dot product over two array<double> columns;
  * null iff either array is null. */
case class ArrDot(left: Expression, right: Expression, dim: Int)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrDot =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any =
    ArrDotKernel.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      dim)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ArrDotKernel.dot($a, $b, $dim);")
}

object ArrDot {
  /** Column API: native fixed-dim dot over two array<double> columns. */
  def apply(a: Column, b: Column, dim: Int): Column =
    ColumnBridge.column(ArrDot(ColumnBridge.expression(a),
      ColumnBridge.expression(b), dim))
}

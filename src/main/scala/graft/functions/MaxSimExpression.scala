package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Shared kernel for the ColBERT-style MaxSim score (r18 optimization)
  * — the native replacement for q_maxsim's unrolled HOF expression
  * grid: `Σ over query tokens of array_max(transform(sequence(0,7),
  * t -> dot8(qt, t)))` built ~2000 Catalyst nodes per query (8 query
  * tokens x 8 doc tokens x 8 inlined cast+multiply terms), which cost
  * the row twice — seconds of driver optimizer/codegen time over the
  * giant tree, and interpreted HOF evaluation per corpus row. One
  * kernel node scores a row in a tight compiled triple loop.
  *
  * Arithmetic is IDENTICAL to the expression grid, fold for fold:
  *  - dot8 was `(0 until 8).map(...).reduce(_ + _)` — a left fold
  *    SEEDED BY THE FIRST TERM (not 0.0): acc = q(0)*e(t*8), then
  *    acc += q(k)*e(t*8+k) ascending;
  *  - each doc-token element is the FLOAT embedding cell cast to
  *    double before the multiply (the `transform(embedding,
  *    x -> x.cast("double"))` the grid inlined);
  *  - array_max over the 8 token dots = running max in token order;
  *  - the query-token sum is again a first-term-seeded left fold.
  * The DuckDB oracle replays the same pinned left-fold order — it is
  * untouched by this change.
  */
object MaxSimKernel {
  /** q = nt x dt query token matrix (row-major); e = nt*dt FLOAT cells
    * of one doc embedding. */
  def score(e: ArrayData, q: Array[Double], nt: Int, dt: Int): Double = {
    var total = 0.0
    var qt = 0
    while (qt < nt) {
      var best = 0.0
      var t = 0
      while (t < nt) {
        var acc = q(qt * dt) * e.getFloat(t * dt).toDouble
        var k = 1
        while (k < dt) {
          acc += q(qt * dt + k) * e.getFloat(t * dt + k).toDouble
          k += 1
        }
        if (t == 0 || acc > best) best = acc
        t += 1
      }
      if (qt == 0) total = best else total += best
      qt += 1
    }
    total
  }
}

/** MaxSim score of one FLOAT embedding (reshaped to nt tokens x dt
  * dims) against the driver-held query token matrix. */
case class MaxSimScore(child: Expression, q: Array[Double], nt: Int,
                       dt: Int) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override protected def withNewChildInternal(
      newChild: Expression): MaxSimScore = copy(child = newChild)

  override def nullSafeEval(e: Any): Any =
    MaxSimKernel.score(e.asInstanceOf[ArrayData], q, nt, dt)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val qRef = ctx.addReferenceObj("q", q, "double[]")
    nullSafeCodeGen(ctx, ev, e =>
      s"${ev.value} = graft.functions.MaxSimKernel.score($e, $qRef, $nt, $dt);")
  }
}

object MaxSimScore {
  /** Column API: embedding is the raw array<float> column. */
  def apply(e: Column, q: Array[Double], nt: Int, dt: Int): Column =
    ColumnBridge.column(MaxSimScore(ColumnBridge.expression(e), q, nt, dt))
}

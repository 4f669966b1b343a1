package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared kernel for the native minhash signature — called by BOTH the
  * interpreted and the codegen path of [[MinHashSig]] (one code path, no
  * divergence; same pattern as geom.GeneralClip).
  *
  * Arithmetic is IDENTICAL to operators.Dedup's shuffle-based pipeline
  * (asserted bit-equal by spec): `lower(text)` via UTF8String.toLowerCase
  * (the exact implementation behind Spark's `lower`), shingle hash =
  * fold `(acc * 31 + codeUnit) % P` over k UTF-16 code units (matching
  * `split(text, "")` + `ascii` on BMP text), universal hashes
  * `(a_i * h + b_i) % P` with Dedup.coef's constants — all products stay
  * under 2^62 because P = 2^31 - 1. Min over ALL positions equals min
  * over the distinct shingle set.
  *
  * Cost: one tight loop of ~len * (k + numHashes) modular ops per
  * document — no shingle rows, no exchange, no per-row array allocation.
  * (The higher-order-function form of the same math was measured 60x
  * slower than the shuffle pipeline; this kernel beats both.)
  */
object MinHashKernel {
  private val P = 2147483647L

  /** Dedup.coef, replicated (kept in sync by the bit-equality spec). */
  private def coefA(i: Int): Long = ((i * 2654435761L + 1) % P) | 1L
  private def coefB(i: Int): Long = (i * 40503L * 104729L + 12345L) % P

  /** Signature array, or null when the text has no k-shingle. */
  def sig(text: UTF8String, k: Int, numHashes: Int): ArrayData = {
    val t = text.toLowerCase.toString
    val n = t.length
    if (n < k) return null
    val as = new Array[Long](numHashes)
    val bs = new Array[Long](numHashes)
    var j = 0
    while (j < numHashes) { as(j) = coefA(j); bs(j) = coefB(j); j += 1 }
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i <= n - k) {
      var h = 0L
      var c = 0
      while (c < k) {
        h = (h * 31L + t.charAt(i + c).toLong) % P
        c += 1
      }
      j = 0
      while (j < numHashes) {
        val v = (as(j) * h + bs(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

/** Native codegen'd minhash signature: array<long> of numHashes minima,
  * NULL for texts shorter than k chars (they have no shingles — the
  * shuffle pipeline drops them the same way). */
case class MinHashSig(child: Expression, k: Int, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def withNewChildInternal(
      newChild: Expression): MinHashSig = copy(child = newChild)

  // null for short texts even when the input is non-null
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    MinHashKernel.sig(input.asInstanceOf[UTF8String], k, numHashes)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    // codegen calls the SAME kernel as the interpreted path; a short
    // text yields null (same contract as HausdorffDistance's epilogue)
    nullSafeCodeGen(ctx, ev, t =>
      s"""
         |${ev.value} = graft.functions.MinHashKernel.sig($t, $k, $numHashes);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)
}

object MinHashSig {
  /** Column API: native minhash signature of a text column. */
  def apply(text: Column, k: Int, numHashes: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(text), k,
      numHashes))
}

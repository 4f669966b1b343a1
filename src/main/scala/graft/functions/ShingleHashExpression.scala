package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared kernel for the per-position k-shingle rolling hash — the native
  * replacement for the split/transform/aggregate HOF chain in the shingle
  * scan (measured 2.2 s of q_dedup_ngram_jaccard's 5.7 s at sf0.1: the
  * lambda fold is interpreted per element and allocates a char-code array
  * per document).
  *
  * Arithmetic is IDENTICAL to folding `(acc * mult + code) % mod` over
  * each shingle's UTF-16 code units on the lowercased text (the form the
  * DuckDB oracles replay; bit-equal to the HOF pipeline by spec): a
  * polynomial hash mod m is position-shift-invariant, so the hash at
  * position i+1 is recovered from position i in O(1) —
  * `((h - c_i * mult^(k-1)) * mult + c_{i+k}) mod m` — making the scan
  * O(len) instead of O(len * k). Long arithmetic never overflows for the
  * library's parameters (mod < 2^31, so every product stays < 2^47).
  */
object ShingleHashKernel {

  /** All k-shingle hashes in position order, or null when the text has
    * no k-shingle (len < k) — explode() then emits nothing, matching the
    * HOF form's length filter. */
  def hashes(text: UTF8String, k: Int, mult: Long, mod: Long): ArrayData = {
    val t = text.toLowerCase.toString
    val n = t.length
    if (n < k) return null
    // mult^(k-1) mod m — the weight of the dropped leading char
    var mk = 1L
    var c = 1
    while (c < k) { mk = (mk * mult) % mod; c += 1 }
    val out = new Array[Long](n - k + 1)
    var h = 0L
    c = 0
    while (c < k) { h = (h * mult + t.charAt(c).toLong) % mod; c += 1 }
    out(0) = h
    var i = 1
    while (i <= n - k) {
      val drop = (t.charAt(i - 1).toLong * mk) % mod
      h = (((h - drop) % mod + mod) * mult + t.charAt(i + k - 1).toLong) % mod
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Native codegen'd shingle-hash scan: array<long> of the text's
  * k-shingle rolling hashes in position order; NULL for texts shorter
  * than k chars. */
case class ShingleHash(child: Expression, k: Int, mult: Long, mod: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def withNewChildInternal(
      newChild: Expression): ShingleHash = copy(child = newChild)

  // null for short texts even when the input is non-null
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    ShingleHashKernel.hashes(input.asInstanceOf[UTF8String], k, mult, mod)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"""
         |${ev.value} = graft.functions.ShingleHashKernel.hashes($t, $k, ${mult}L, ${mod}L);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)
}

object ShingleHash {
  /** Column API: native per-position k-shingle rolling hashes. */
  def apply(text: Column, k: Int, mult: Long, mod: Long): Column =
    ColumnBridge.column(ShingleHash(ColumnBridge.expression(text), k, mult,
      mod))
}

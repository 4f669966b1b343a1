package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken 2003,
  * "Winnowing: Local Algorithms for Document Fingerprinting" — the MOSS
  * algorithm; public literature): over the position-ordered k-gram
  * rolling hashes (the [[ShingleHash]] output), slide a window of `w`
  * consecutive hashes and select each window's RIGHTMOST MINIMUM. The
  * guarantee that makes this the fingerprint scheme instead of "every
  * k-th hash": any substring match of length >= w + k - 1 shares at
  * least one selected fingerprint (local selection cannot be gamed by
  * position shifts), at an expected density of 2/(w+1) of all positions
  * — an 80% posting-size cut at w=4 versus indexing every shingle.
  *
  * Selection is O(n) with a monotonic deque (pop-while back-hash >=
  * incoming implements the rightmost-min tie rule exactly); documents
  * with fewer than `w` hashes winnow their single truncated window so
  * every non-empty document keeps >= 1 fingerprint. Row-local — the
  * corpus-level index this feeds shuffles only the selected ~2/(w+1)
  * fraction.
  *
  * Output: encoded picks `pos * 2^31 + hash` in increasing position
  * order (hash < 2^31 by the library's mod; text positions < 2^20 by
  * corpus contract), decoded by the caller; NULL for NULL input (text
  * shorter than k).
  */
object WinnowKernel {

  def select(hashes: ArrayData, w: Int): ArrayData = {
    val n = hashes.numElements()
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    val effW = if (w < n) w else n
    val deque = new Array[Int](n) // indices, front..back increasing hash
    var lo = 0
    var hi = -1 // inclusive back
    val picks = new java.util.ArrayList[Long]()
    var last = -1
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      // rightmost-min: equal hashes at later positions evict earlier ones
      while (hi >= lo && hashes.getLong(deque(hi)) >= h) hi -= 1
      hi += 1; deque(hi) = i
      val start = i - effW + 1
      while (deque(lo) < start) lo += 1
      if (i >= effW - 1 && deque(lo) != last) {
        last = deque(lo)
        picks.add(last.toLong * 2147483648L + hashes.getLong(last))
      }
      i += 1
    }
    val out = new Array[Long](picks.size)
    var j = 0
    while (j < out.length) { out(j) = picks.get(j); j += 1 }
    new GenericArrayData(out)
  }
}

/** Native codegen'd winnowing pass over a position-ordered hash array:
  * array<long> of encoded (position, hash) fingerprint picks. */
case class Winnow(child: Expression, w: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def withNewChildInternal(newChild: Expression): Winnow =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    WinnowKernel.select(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.WinnowKernel.select($a, $w);")
}

object Winnow {
  /** Column API: winnowed fingerprints of a [[ShingleHash]] array. */
  def apply(hashes: Column, w: Int): Column =
    ColumnBridge.column(Winnow(ColumnBridge.expression(hashes), w))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Delta + LEB128 varint posting-list codec — the storage layer under
  * every inverted index (Lucene's VInt postings, the classic IR
  * compression): a sorted id list becomes gaps (first gap = id0 + 1 so
  * every gap is ≥ 1), each gap little-endian base-128 with the high bit
  * as continuation. The kernel ENCODES, then DECODES its own bytes and
  * compares — the roundtrip flag is a real inverse-pair check, while
  * the byte count is independently verifiable by the closed-form
  * 7-bit-group arithmetic the oracle computes without ever building a
  * byte (encode is verified against a derivation, not a replay).
  *
  * Row-local per posting list; the shuffle that builds the lists is the
  * only exchange, exactly the posting materialization any index build
  * pays. */
object VarintKernel {

  /** ids: sorted ascending, non-negative. Returns (enc_bytes, ok). */
  def roundtrip(ids: ArrayData): InternalRow = {
    val xs = ids.toLongArray()
    val buf = new java.io.ByteArrayOutputStream(xs.length * 2)
    var prev = -1L
    var j = 0
    while (j < xs.length) {
      var g = xs(j) - prev
      prev = xs(j)
      while ((g & ~0x7fL) != 0L) {
        buf.write(((g & 0x7fL) | 0x80L).toInt)
        g >>>= 7
      }
      buf.write(g.toInt)
      j += 1
    }
    val bytes = buf.toByteArray
    val out = new Array[Long](xs.length)
    var i = 0
    var k = 0
    var acc = -1L
    var malformed = false
    while (i < bytes.length && k < xs.length && !malformed) {
      var shift = 0
      var g = 0L
      var cont = true
      while (cont) {
        if (i >= bytes.length) { malformed = true; cont = false }
        else {
          val b = bytes(i) & 0xff
          i += 1
          g |= (b & 0x7fL) << shift
          shift += 7
          cont = (b & 0x80) != 0
        }
      }
      if (!malformed) { acc += g; out(k) = acc; k += 1 }
    }
    val ok = !malformed && k == xs.length && i == bytes.length &&
      java.util.Arrays.equals(out, xs)
    InternalRow(bytes.length.toLong, ok)
  }
}

/** struct(enc_bytes, roundtrip) of one sorted id array. */
case class DeltaVarint(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("enc_bytes", LongType, nullable = false),
    StructField("roundtrip", BooleanType, nullable = false)))

  override protected def withNewChildInternal(
      newChild: Expression): DeltaVarint = copy(child = newChild)

  override def nullSafeEval(a: Any): Any =
    VarintKernel.roundtrip(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.VarintKernel.roundtrip($a);")
}

object DeltaVarint {
  def apply(ids: Column): Column =
    ColumnBridge.column(DeltaVarint(ColumnBridge.expression(ids)))
}

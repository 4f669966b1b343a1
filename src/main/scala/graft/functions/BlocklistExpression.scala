package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern scan — the content-filter primitive a
  * curation pipeline runs with blocklists of thousands of terms, where
  * the naive regex alternation `(t1|t2|...|tN)` compiles into an
  * automaton anyway but pays regex-engine overhead per char and the
  * per-term `N × contains()` form pays N full scans. One AC pass is
  * O(chars + matches) regardless of list size.
  *
  * Match semantics = per-term SUBSTRING-OCCURRENCE counts summed;
  * overlaps ACROSS terms all count ("he" inside "the" hits both). The
  * automaton counts every occurrence, so a self-overlapping term (one
  * with a proper border, like "aa") would diverge from the oracle's
  * non-overlapping `(len(t) - len(replace(t, term, ''))) / len(term)`
  * replace arithmetic — callers must pass border-free terms (the query
  * asserts it), and then the AC counts are verified against an
  * independent closed-form derivation, not a replay of the automaton.
  *
  * The automaton (goto/fail/output tables over the byte alphabet) is
  * built once on the driver from the literal term list and ships inside
  * the serialized expression — the centroid/codebook pattern; scanning
  * is a tight per-byte loop in the shared kernel, called identically by
  * the interpreted and codegen paths. Matching is on raw bytes of the
  * LOWERCASED input (the caller lowercases), terms must be ASCII. */
object AhoCorasick {

  /** goto: states x 256 (−1 = none after build); fail: states;
    * endCount/endMask/maxLenEnd: per-state terms ending here, with
    * output links folded in eagerly during the BFS. */
  final class Automaton(val gotoTab: Array[Array[Int]],
                        val fail: Array[Int],
                        val endCount: Array[Int],
                        val endMask: Array[Long],
                        val maxLenEnd: Array[Int]) extends Serializable

  def build(terms: Seq[String]): Automaton = {
    require(terms.nonEmpty && terms.size <= 63,
      "AhoCorasick: 1..63 terms (hit mask is a Long)")
    // the ASCII contract FAILS FAST here instead of mid-construction:
    // state tables are sized by CHAR counts while trie insertion walks
    // UTF-8 BYTES, and maxLenEnd mixes char lengths with byte scan
    // positions — a non-ASCII term would overflow the tables and skew
    // first_pos. (Scan INPUT may be any UTF-8; first_pos is then a
    // byte offset — equal to the char position whenever the text
    // preceding the match is ASCII.)
    require(terms.forall(_.forall(_ < 0x80)),
      "AhoCorasick: terms must be ASCII (tables are char-sized but " +
        "insertion is per UTF-8 byte)")
    val maxStates = terms.map(_.length).sum + 1
    val gotoTab = Array.fill(maxStates)(Array.fill(256)(-1))
    val endCount = new Array[Int](maxStates)
    val endMask = new Array[Long](maxStates)
    val maxLenEnd = new Array[Int](maxStates)
    var nStates = 1
    terms.zipWithIndex.foreach { case (t, ti) =>
      var s = 0
      t.getBytes("UTF-8").foreach { b =>
        val c = b & 0xff
        if (gotoTab(s)(c) == -1) { gotoTab(s)(c) = nStates; nStates += 1 }
        s = gotoTab(s)(c)
      }
      endCount(s) += 1
      endMask(s) |= 1L << ti
      maxLenEnd(s) = math.max(maxLenEnd(s), t.length)
    }
    val fail = new Array[Int](nStates)
    val queue = scala.collection.mutable.Queue.empty[Int]
    (0 until 256).foreach { c =>
      val nxt = gotoTab(0)(c)
      if (nxt == -1) gotoTab(0)(c) = 0
      else { fail(nxt) = 0; queue.enqueue(nxt) }
    }
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      // propagate output links eagerly: a state inherits its fail
      // state's endings, so one lookup per char suffices while scanning
      endCount(s) += endCount(fail(s))
      endMask(s) |= endMask(fail(s))
      maxLenEnd(s) = math.max(maxLenEnd(s), maxLenEnd(fail(s)))
      (0 until 256).foreach { c =>
        val nxt = gotoTab(s)(c)
        if (nxt == -1) gotoTab(s)(c) = gotoTab(fail(s))(c)
        else { fail(nxt) = gotoTab(fail(s))(c); queue.enqueue(nxt) }
      }
    }
    new Automaton(gotoTab, fail, endCount, endMask, maxLenEnd)
  }

  /** Returns (n_hits, distinct_terms, first_pos 1-based or 0). */
  def scan(text: UTF8String, a: Automaton): InternalRow = {
    val bytes = text.getBytes
    var s = 0
    var hits = 0L
    var mask = 0L
    var firstPos = Long.MaxValue
    var i = 0
    while (i < bytes.length) {
      s = a.gotoTab(s)(bytes(i) & 0xff)
      if (a.endCount(s) > 0) {
        hits += a.endCount(s)
        mask |= a.endMask(s)
        // earliest start among terms ending here = i + 2 - longest len;
        // the global min over i is the true first match start
        val st = i + 2L - a.maxLenEnd(s)
        if (st < firstPos) firstPos = st
      }
      i += 1
    }
    InternalRow(hits, java.lang.Long.bitCount(mask).toLong,
      if (firstPos == Long.MaxValue) 0L else firstPos)
  }
}

/** Blocklist scan of one string column: struct(n_hits, n_terms,
  * first_pos). first_pos is the 1-based BYTE offset of the earliest
  * match over all terms, 0 when clean — it equals the oracle's
  * character strpos exactly when the text before the match is ASCII
  * (true for this corpus, asserted by q_normalize_unicode's note);
  * non-ASCII text ahead of a match would shift it by the extra
  * continuation bytes. */
case class BlocklistScan(child: Expression, terms: Seq[String])
    extends UnaryExpression {

  @transient private lazy val auto = AhoCorasick.build(terms)

  override def dataType: DataType = StructType(Seq(
    StructField("n_hits", LongType, nullable = false),
    StructField("n_terms", LongType, nullable = false),
    StructField("first_pos", LongType, nullable = false)))

  override protected def withNewChildInternal(
      newChild: Expression): BlocklistScan = copy(child = newChild)

  override def nullSafeEval(t: Any): Any =
    AhoCorasick.scan(t.asInstanceOf[UTF8String], auto)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val autoRef = ctx.addReferenceObj("auto", auto,
      classOf[AhoCorasick.Automaton].getName)
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.AhoCorasick.scan($t, $autoRef);")
  }
}

object BlocklistScan {
  def apply(text: Column, terms: Seq[String]): Column =
    ColumnBridge.column(BlocklistScan(ColumnBridge.expression(text), terms))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Shared kernel for the MMR greedy selection (r18 optimization) — the
  * native replacement for the nested-HOF `aggregate(sequence(1,k), ...)`
  * selection expression in [[graft.operators.Ann.mmrRerankOn]].
  *
  * Why: higher-order functions are CodegenFallback — every lambda is an
  * interpreted expression tree evaluated PER ELEMENT, and the greedy
  * selection evaluates, per query, k steps x |shortlist| candidates x
  * |selected| dim-wide `zip_with` dot products, each allocating an
  * intermediate array. That interpreted triple loop was the MMR rows'
  * dominant cost (the same failure mode the IvfDistances and ArrDot
  * kernels fixed for Lloyd assignment and pair scoring). One kernel call
  * per query row runs the whole selection in compiled Scala.
  *
  * Arithmetic is IDENTICAL to the HOF form it replaces, term for term:
  *  - pairwise sim: ascending-order dot accumulated from 0.0 over the
  *    unit-normalized vectors ([[ArrDotKernel.dot]] — the `zip_with` +
  *    `aggregate` fold's exact order);
  *  - integer score space: mmr5 = Li * round_x1e4(cos4) - Mi * maxsim,
  *    maxsim folded from -100000 via greatest over round_x1e4(dot), with
  *    round_x1e4 = CAST(ROUND(v * 10000.0, 0) AS BIGINT) replicated as
  *    BigDecimal.valueOf(v * 10000.0).setScale(0, HALF_UP).longValue()
  *    (Spark's Round(double) semantics; the rounded value is integral
  *    and < 2^53 so the cast is exact);
  *  - argmax: max by (mmr5, then SMALLER nid) — order-independent, the
  *    fold's `c.mmr5 > best.mmr5 OR (= AND c.nid < best.nid)` rule;
  *  - exhaustion: a step with no remaining candidate appends a NULL
  *    element (the HOF's `aggregate(empty, null, ...)`), and every later
  *    step is then also null (the null poisons the `exists` filter) —
  *    replicated so sub-k shortlists stay row-identical.
  *
  * The DuckDB oracle replays the greedy chain as unrolled CTEs over the
  * same normalized doubles — untouched by this change (spec-pinned:
  * kernel == HOF on the bench corpus).
  */
object MmrKernel {

  /** CAST(ROUND(v * 10000.0, 0) AS BIGINT) replica. */
  private def x1e4(v: Double): Long =
    java.math.BigDecimal.valueOf(v * 10000.0)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  /** arr = array<struct<rank:int,nid:bigint,cos4:double,en:array<double>>>
    * (any order — selection is order-independent). Returns
    * array<struct<rank:int,nid:bigint,cos4:double,mmr5:bigint,sr:int>>
    * of length k with nulls past shortlist exhaustion. */
  def select(arr: ArrayData, k: Int, li: Int, mi: Int,
             dim: Int): ArrayData = {
    val n = arr.numElements()
    val ranks = new Array[Int](n)
    val nids = new Array[Long](n)
    val cos4 = new Array[Double](n)
    val ens = new Array[ArrayData](n)
    val rel = new Array[Long](n)
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 4)
      ranks(i) = row.getInt(0)
      nids(i) = row.getLong(1)
      cos4(i) = row.getDouble(2)
      ens(i) = row.getArray(3)
      rel(i) = li * x1e4(cos4(i))
      i += 1
    }
    val taken = new Array[Boolean](n)
    val selIdx = new Array[Int](math.min(k, n))
    var nSel = 0
    val out = new Array[Any](k)
    var step = 1
    while (step <= k) {
      var best = -1
      var bestScore = 0L
      var c = 0
      while (c < n) {
        if (!taken(c)) {
          var pen = 0L
          if (nSel > 0) {
            var m = -100000L
            var s = 0
            while (s < nSel) {
              val d = ArrDotKernel.dot(ens(c), ens(selIdx(s)), dim)
              val dr = x1e4(d)
              if (dr > m) m = dr
              s += 1
            }
            pen = m
          }
          val score = rel(c) - mi * pen
          if (best < 0 || score > bestScore ||
            (score == bestScore && nids(c) < nids(best))) {
            best = c
            bestScore = score
          }
        }
        c += 1
      }
      if (best < 0) {
        // shortlist exhausted: null now and (HOF-identically) forever
        while (step <= k) { out(step - 1) = null; step += 1 }
      } else {
        taken(best) = true
        selIdx(nSel) = best
        nSel += 1
        out(step - 1) = InternalRow(ranks(best), nids(best), cos4(best),
          bestScore, step)
        step += 1
      }
    }
    new GenericArrayData(out)
  }
}

/** Greedy MMR selection over one query's collected shortlist array;
  * k elements of (rank, nid, cos4, mmr5, sr), null-padded past
  * exhaustion. Li/Mi are the tenth-granular integer MMR weights
  * (Li = lambda*10, Mi = 10 - Li). */
case class MmrSelect(child: Expression, k: Int, li: Int, mi: Int, dim: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("rank", IntegerType, nullable = false),
    StructField("nid", LongType, nullable = false),
    StructField("cos4", DoubleType, nullable = false),
    StructField("mmr5", LongType, nullable = false),
    StructField("sr", IntegerType, nullable = false))),
    containsNull = true)

  override protected def withNewChildInternal(
      newChild: Expression): MmrSelect = copy(child = newChild)

  override def nullSafeEval(arr: Any): Any =
    MmrKernel.select(arr.asInstanceOf[ArrayData], k, li, mi, dim)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = graft.functions.MmrKernel.select(
         |  $a, $k, $li, $mi, $dim);""".stripMargin)
}

object MmrSelect {
  /** Column API over the collected shortlist array. */
  def apply(arr: Column, k: Int, li: Int, mi: Int, dim: Int): Column =
    ColumnBridge.column(MmrSelect(ColumnBridge.expression(arr),
      k, li, mi, dim))
}

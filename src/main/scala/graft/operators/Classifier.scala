package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed logistic-regression scoring — the quality-classifier
  * step of a training-data pipeline (a linear model over cheap text
  * features, fasttext-quality-filter shape; Gopher/CCNet-style
  * pipelines gate documents exactly like this).
  *
  * Scale design mirrors the engine's other trained models (IVF/PQ
  * Lloyd, LM fit): the MODEL is driver-sized by construction (one
  * weight per feature), and each full-batch gradient-descent step is
  * ONE map-side-combined aggregate over the corpus — no per-row state,
  * no shuffle beyond the aggregate, iterations scans the feature table
  * T times (mini-batch sharding is the >1e8-row variant; see below).
  *
  * Determinism contract (what makes the DuckDB oracle exact):
  *  - the squashing function is the RATIONAL sigmoid
  *    s(z) = 0.5 + z / (2 (1 + |z|)) — only +,*,/,abs, all IEEE-exact,
  *    so both engines produce BIT-IDENTICAL doubles per row (math.exp
  *    differs across libm implementations in the last ulp, which a
  *    quantized gradient would amplify across iterations);
  *  - per-row gradient terms are QUANTIZED to integer nanos
  *    (round(term * 1e9) as long) before summing, so the aggregate is
  *    exact integer arithmetic — order-independent across engines and
  *    partitionings. Long capacity bounds one batch at ~1e8 rows
  *    (n * max|term| * 1e9 < 2^63); beyond that, shard into
  *    mini-batches (the standard move anyway).
  */
object Classifier {

  /** Rational sigmoid: 0.5 + z / (2 (1 + |z|)) — range (0, 1),
    * monotone, IEEE-deterministic (no transcendentals). */
  def sigmaHat(z: Column): Column =
    lit(0.5) + z / (lit(2.0) * (lit(1.0) + abs(z)))

  /** w · x + b with the FIXED fold order (((b + t0) + t1) + ...) the
    * oracle replays. Bias is w.last. */
  private def zOf(featCols: Seq[String], w: Array[Double]): Column =
    featCols.zipWithIndex.map { case (f, j) => col(f) * lit(w(j)) }
      .foldLeft(lit(w.last): Column)(_ + _)

  /** `iters` full-batch GD steps from w = 0: gradient of the logistic
    * loss with s(z) in place of the exp sigmoid, lr fixed. Returns the
    * weight vector (featCols order, bias last). */
  def trainLogistic(feats: DataFrame, featCols: Seq[String],
                    labelCol: String, iters: Int,
                    lr: Double): Array[Double] = {
    var w = new Array[Double](featCols.size + 1)
    for (_ <- 1 to iters) {
      val err = sigmaHat(zOf(featCols, w)) - col(labelCol)
      val aggs = featCols.map(f =>
        sum(round(err * col(f) * 1e9, 0).cast("long"))) :+
        sum(round(err * 1e9, 0).cast("long")) :+ count(lit(1))
      val r = feats.agg(aggs.head, aggs.tail: _*).head()
      val n = r.getLong(featCols.size + 1).toDouble
      w = w.zipWithIndex.map { case (wj, j) =>
        wj - lr * (r.getLong(j) / 1e9) / n }
    }
    w
  }

  /** Score every row with the trained model: p = s(w·x + b), the
    * pipeline's keep/drop signal. Map-only, model in the expression. */
  def scoreLogistic(feats: DataFrame, featCols: Seq[String],
                    w: Array[Double]): DataFrame =
    feats.withColumn("p", round(sigmaHat(zOf(featCols, w)), 6))
}

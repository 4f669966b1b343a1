package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-space label audit — the dataset-quality sweep a curation
  * pipeline runs over a labeled corpus (Northcutt et al.'s confident-
  * learning shape reduced to its geometric core): per-label centroids,
  * each vector's squared distance to its OWN centroid vs the nearest
  * FOREIGN one, and a mislabel flag when a foreign class center is
  * closer. At 100 TB this is two corpus passes, both map-side-combined:
  * ONE aggregate builds all centroids (driver-sized model: labels × dim
  * doubles — the centroid/codebook pattern), then ONE map-only scoring
  * pass with the centroids embedded as literals (the model-in-the-
  * expression serving shape every trained artifact here uses). No
  * shuffle beyond the labels-row aggregate.
  *
  * Determinism: centroid components are exact integer-nano sums divided
  * in a fixed double sequence (s/1e9/n), distances are fixed left-folds
  * over dimension order, rounded to 6 BEFORE the nearest-foreign
  * ranking (the rank-stability rule), ties by label id.
  */
object LabelAudit {

  /** emb: (vec_id: long, label: int, embedding: array<float>). Returns
    * (vec_id, label, d_own, near_label, d_other, margin, mislabeled). */
  def audit(emb: DataFrame, dim: Int): DataFrame = {
    val nanos = (0 until dim).map(i =>
      sum(round(col("embedding").getItem(i).cast("double") * 1e9, 0)
        .cast("long")).as(s"s$i"))
    val centRows = emb.groupBy("label")
      .agg(nanos.head, (nanos.tail :+ count(lit(1)).as("n")): _*)
      .collect()
    val cents: Seq[(Int, Array[Double])] = centRows.map { r =>
      val n = r.getLong(dim + 1)
      r.getInt(0) ->
        Array.tabulate(dim)(i => r.getLong(i + 1).toDouble / 1e9 / n)
    }.sortBy(_._1).toSeq

    def d2(c: Array[Double]): Column =
      (0 until dim).map { i =>
        val t = col("embedding").getItem(i).cast("double") - lit(c(i))
        t * t
      }.foldLeft(lit(0.0))(_ + _)

    val dCols = cents.map { case (l, c) => round(d2(c), 6).as(s"d$l") }
    val base = emb.select(
      (col("vec_id").cast("long").as("vec_id") :: col("label") :: Nil
        ++ dCols): _*)
    val own = cents.foldLeft(lit(null).cast("double")) {
      case (acc, (l, _)) =>
        when(col("label") === l, col(s"d$l")).otherwise(acc)
    }
    // nearest foreign centroid: min over (d, label) structs — the same
    // lexicographic tie rule the oracle's ROW_NUMBER replays
    val arr = array(cents.map { case (l, _) =>
      struct(col(s"d$l").as("d"), lit(l).as("l"))
    }: _*)
    val foreign = array_min(filter(arr, s => s.getField("l") =!= col("label")))
    base.select(col("vec_id"), col("label"), own.as("d_own"),
        foreign.getField("l").as("near_label"),
        foreign.getField("d").as("d_other"))
      .select(col("vec_id"), col("label"), col("d_own"), col("near_label"),
        col("d_other"),
        round(col("d_other") - col("d_own"), 6).as("margin"),
        (col("d_other") < col("d_own")).as("mislabeled"))
  }
}

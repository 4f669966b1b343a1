package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed top-principal-component extraction (power iteration) —
  * the embedding-pipeline step before whitening / dimensionality
  * reduction / ANN preprocessing. Reference analogue: none
  * (gpd_lite_toolbox has no embedding surface); the shape follows the
  * engine's other trained models (IVF/PQ Lloyd, logistic classifier).
  *
  * Scale design: the COVARIANCE IS NEVER MATERIALIZED. Each power step
  * computes u = Σ_rows x (x·v) directly — ONE map-side-combined
  * aggregate of `dim` sums per step (the matvec-with-the-data form; a
  * dim x dim second-moment matrix would be dim² aggregate columns and
  * is the wrong shape once dim grows). The model (v, dim doubles) is
  * driver-sized by construction; iterations = T corpus scans, same
  * trade as Lloyd training.
  *
  * Determinism contract (what lets the DuckDB oracle RETRAIN the same
  * component): per-row matvec terms are quantized to integer nanos
  * (round(x_i * (x·v) * 1e9) as long) before summing, so each step's
  * aggregate is exact integer arithmetic — order-independent across
  * engines and partitionings. The driver-side update (u_i = S_i/1e9,
  * v' = u / sqrt(Σu²), fixed left-fold order) uses only +,*,/,sqrt —
  * all IEEE-correctly-rounded, no transcendentals — so both engines
  * produce bit-identical doubles. Long capacity bounds one batch at
  * ~1e6 rows per aggregate for unit-norm-ish embeddings
  * (n * dim^0.5 * 1e9 < 2^63 and the long->double exactness bound
  * n * 1e9 < 2^53); beyond that, shard into partial batches and sum
  * the integer partials — the same move the classifier documents. */
object Pca {

  /** x·v as a fixed left-fold ((0 + t0) + t1) + ... — the order both
    * engines replay. */
  private def dotLit(e: Column, v: Array[Double]): Column =
    v.indices.map(j => e.getItem(j).cast("double") * lit(v(j)))
      .foldLeft(lit(0.0))(_ + _)

  /** `iters` power-iteration steps from v0 = all-ones (exact). Returns
    * the (unit) dominant eigenvector of the uncentered second-moment
    * matrix — deterministic: every arithmetic op is IEEE-exact or
    * integer. */
  def powerIteration(emb: DataFrame, dim: Int, iters: Int): Array[Double] = {
    var v = Array.fill(dim)(1.0)
    for (_ <- 1 to iters) {
      val q = dotLit(col("embedding"), v)
      val qdf = emb.select(col("embedding").as("e"), q.as("q"))
      val aggs = (0 until dim).map(i =>
        sum(round(col("e").getItem(i).cast("double") * col("q") * 1e9, 0)
          .cast("long")))
      val r = qdf.agg(aggs.head, aggs.tail: _*).head()
      val u = Array.tabulate(dim)(i => r.getLong(i) / 1e9)
      val nrm = math.sqrt(u.foldLeft(0.0)((acc, x) => acc + x * x))
      v = u.map(_ / nrm)
    }
    v
  }

  /** Score every row: pc1 = round(x·v, 6) — map-only, model embedded in
    * the expression (the serving shape every trained model here uses). */
  def project(emb: DataFrame, idCol: String, v: Array[Double]): DataFrame =
    emb.select(col(idCol).cast("long").as(idCol),
      round(dotLit(col("embedding"), v), 6).as("pc1"))

  /** Johnson–Lindenstrauss random projection dim → kOut with an
    * Achlioptas ±1/√kOut sign matrix (Achlioptas 2003: database-friendly
    * random projections — signs work as well as Gaussians). The matrix
    * is NEVER materialized or shipped: sign(j,i) is a closed-form parity
    * of the same multiplicative hash the LSH planes use, evaluated
    * identically in both engines. One map-only pass (kOut fixed-fold dot
    * products per row, codegen'd — no shuffle, no model artifact, no
    * training), which is the whole point at 100 TB: the projection that
    * halves ANN index cost needs zero coordination.
    *
    * Returns (id, j, proj6, norm_ratio) — one row per output dimension,
    * plus the per-vector ‖proj‖²/‖x‖² JL distortion diagnostic (≈1 in
    * expectation), computed over integer-micro quantized projections so
    * the 16-term square sum is order-independent-exact. */
  def randomProject(emb: DataFrame, idCol: String, dim: Int,
                    kOut: Int): DataFrame = {
    val scale = 1.0 / math.sqrt(kOut.toDouble)
    def signs(j: Int): Array[Double] = Array.tabulate(dim) { i =>
      if (((j.toLong * dim + i) * 2654435761L) % 1000003L % 2 == 0) scale
      else -scale
    }
    // native kernel (functions.JlProject): the inlined kOut x dim chain
    // blew up Janino (5.7 s at sf0.1, all compile); fold order identical
    // so results and the oracle are unchanged
    val projArr = graft.functions.JlProject(
      col("embedding").cast("array<double>"),
      (0 until kOut).map(j => signs(j).toSeq))
    // HOF fold, same (0 + t0) + t1 ... order as the flat chain and the
    // oracle's list_sum — compact plan instead of a 64-term tree
    val en = aggregate(col("embedding").cast("array<double>"), lit(0.0),
      (acc, x) => acc + x * x)
    val base = emb.select(col(idCol).cast("long").as(idCol),
      en.as("en"), projArr.as("ps"))
    val s2 = (0 until kOut).map { j =>
      val pm = round(element_at(col("ps"), j + 1) * 1e6, 0).cast("long")
      pm * pm
    }.reduce(_ + _)
    val ratio = when(col("en") === 0.0, lit(0.0))
      .otherwise(round((s2.cast("double") / 1e12) / col("en"), 4))
    base.select(col(idCol), ratio.as("norm_ratio"),
        posexplode(col("ps")))
      .select(col(idCol), col("pos").cast("long").as("j"),
        round(col("col"), 6).as("proj6"), col("norm_ratio"))
  }
}

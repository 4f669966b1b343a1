package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weighted PageRank by power iteration — the URL-quality signal a
  * web-corpus curation pipeline weights documents by (CommonCrawl rank
  * lists are built this way; Page et al. 1999 is the public source).
  *
  * Scale design: no driver-side graph state. Each iteration is ONE
  * equi-join (ranks x out-weighted edges on src) + ONE aggregate on dst;
  * AQE broadcasts the rank table while it is small, and at web scale the
  * same plan is a shuffle join on src. The edge table, its out-degree
  * join and the node set are localCheckpoint'd once (every iteration
  * re-reads them), and each iteration's rank table is checkpointed
  * LAZILY with the convergence aggregate as the materializing action —
  * one job per iteration, the same shape as Contour.shortestPaths'
  * one-job-per-BFS-round. Without the per-hop cut the plan tree (and
  * driver re-analysis cost) grows super-linearly with iterations.
  *
  * Convergence is data-driven (the web-scale form): stop when
  * max_v |r'(v) - r(v)| < eps, else after maxIters. eps = 0 disables
  * the early stop and runs exactly maxIters iterations — the fixed-hop
  * form whose iteration count a SQL oracle can replay hop by hop. The
  * per-hop delta aggregate (a driver action per iteration) is paid ONLY
  * when the stop is armed — it is intrinsic to deciding "keep going?"
  * per hop; the fixed-hop form instead pipelines all hops into the
  * consumer's single job (measured: 5 pipelined hops run the whole
  * query in 0.9 s at sf0.1 vs 2.0 s with per-hop materialization —
  * job-scheduling overhead, not compute). Fixed-hop mode is meant for
  * SMALL hop counts (oracle replay); for long runs use eps > 0, whose
  * per-hop checkpoint also keeps the plan tree flat.
  *
  * Teleport/damping constants are written 0.15 / 0.85 (not 1-d / d) so
  * the engine's arithmetic is literal-for-literal identical to the
  * oracle's (IEEE 1.0-0.85 is 0.15000000000000002, which would smear
  * the 6-decimal rounding on knife-edge values).
  */
object PageRank {

  /** @param edges (src: long, dst: long, w: long) weighted transitions
    * @return (ranks (p, r), iterations actually run) */
  def pageRankWithIters(edges: DataFrame, eps: Double,
                        maxIters: Int): (DataFrame, Int) = {
    val ed = edges.select(col("src"), col("dst"), col("w"))
      .localCheckpoint() // every iteration re-reads the edge table
    val outd = ed.groupBy("src").agg(sum("w").cast("double").as("outw"))
    val ew = ed.join(outd, "src").localCheckpoint()
    val nodes = ed.select(col("src").as("p"))
      .union(ed.select(col("dst").as("p"))).distinct().localCheckpoint()
    val n = nodes.count().toDouble
    var ranks = nodes.withColumn("r", lit(1.0 / n))
    var it = 0
    var converged = false
    while (it < maxIters && !converged) {
      val inc = ew.join(ranks, ew("src") === ranks("p"))
        .groupBy(col("dst").as("p"))
        .agg(sum(col("r") * col("w") / col("outw")).as("s"))
      // ranks covers every node, so the left join against the incoming
      // mass carries the previous rank along for free — the convergence
      // delta reads the SAME checkpointed table the next iteration
      // consumes (no extra pass over the graph).
      val next = ranks.withColumnRenamed("r", "r_prev")
        .join(inc, Seq("p"), "left")
        .select(col("p"),
          (lit(0.15 / n) + lit(0.85) * coalesce(col("s"), lit(0.0)))
            .as("r"),
          col("r_prev"))
      if (eps > 0.0) {
        // LAZY checkpoint + delta aggregate in ONE action per hop (the
        // Contour.shortestPaths shape): the delta job materializes the
        // hop's ranks, the next hop reads the flat cached partitions.
        val cut = next.localCheckpoint(eager = false)
        val delta = cut.agg(max(abs(col("r") - col("r_prev"))))
          .head.getDouble(0)
        converged = delta < eps
        ranks = cut.select(col("p"), col("r"))
      } else {
        // fixed-hop (oracle-replay) mode: no per-hop action — all hops
        // pipeline into the consumer's single job
        ranks = next.select(col("p"), col("r"))
      }
      it += 1
    }
    (ranks, it)
  }

  /** Rank table only; see [[pageRankWithIters]]. */
  def pageRank(edges: DataFrame, eps: Double, maxIters: Int): DataFrame =
    pageRankWithIters(edges, eps, maxIters)._1
}

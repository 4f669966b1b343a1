package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by alternating LARGE-STAR / SMALL-STAR rounds
  * (Kiveris et al. 2014, "Connected Components in MapReduce and
  * Beyond" — public literature): the algorithm production graph
  * systems use where min-label propagation
  * ([[Dedup.dedupClusters]]) needs as many rounds as the component
  * DIAMETER, large/small-star needs O(log n) rounds on any shape —
  * the difference that matters when a boilerplate family chains into
  * a long path instead of a dense blob.
  *
  *  - large-star(u): every strictly-greater neighbor of u re-attaches
  *    to m(u) = min(Γ(u) ∪ {u});
  *  - small-star(u): every smaller-or-equal neighbor re-attaches to
  *    m(u).
  *
  * Each half-round is ONE aggregate (per-node min over the current
  * edge set) joined back over the edges — no driver-side graph state;
  * the edge set never grows beyond the input size (stars replace,
  * not add). On the shallow near-dup components both algorithms
  * converge to identical min-label components (spec-pinned), so the
  * query shares q_dedup_clusters' oracle.
  */
object ConnectedComponents {

  /** One large-star + small-star round over a symmetric edge set
    * (src, dst). Returns the rewritten (still symmetric-on-read)
    * edge set; self-loops are dropped. */
  private def round(edges: DataFrame): DataFrame = {
    // large-star: (v, m(u)) for v in Γ(u), v > u
    val sym = edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
    val m = sym.groupBy("src")
      .agg(least(min("dst"), first("src")).as("m"))
    val ls = sym.join(m, Seq("src"))
      .filter(col("dst") > col("src"))
      .select(col("dst").as("src"), col("m").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
    // small-star over the large-star output: u's smaller-or-equal
    // neighbors AND u itself all re-attach to m(u)
    val sym2 = ls.select(col("src"), col("dst"))
      .unionAll(ls.select(col("dst").as("src"), col("src").as("dst")))
    val m2 = sym2.groupBy("src")
      .agg(least(min("dst"), first("src")).as("m"))
    val withM = sym2.join(m2, Seq("src"))
    withM.filter(col("dst") <= col("src"))
      .select(col("dst").as("src"), col("m").as("dst"))
      .unionAll(withM.select(col("src"), col("m").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint() // lineage cut per round (the dedupClusters rule)
  }

  /** Canonical (minimum) member per node's component over a near-dup
    * pair table; docs in no pair are their own canonical — the same
    * output contract as [[Dedup.dedupClusters]]. */
  def components(docs: DataFrame, pairs: DataFrame,
                 rounds: Int = 3): DataFrame = {
    val e0 = pairs.select(col("ida").as("src"), col("idb").as("dst"))
      .localCheckpoint()
    val converged = (1 to rounds).foldLeft(e0)((e, _) => round(e))
    // after convergence every edge points node -> component min
    val canon = converged
      .unionAll(converged.select(col("dst").as("src"),
        col("dst").as("dst")))
      .groupBy("src").agg(min("dst").as("canonical_id"))
    docs.select(col("doc_id"))
      .join(canon.select(col("src").as("doc_id"), col("canonical_id")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("canonical_id"), col("doc_id")).as("canonical_id"))
      .withColumn("is_dup", col("doc_id") =!= col("canonical_id"))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle counting + local clustering coefficient over an undirected
  * edge list — the graph-shape diagnostic of the dedup candidate graph
  * (a high clustering coefficient is what makes transitive dedup
  * clusters (Dedup.dedupClusters) collapse in few hops; boilerplate
  * families show up as dense triangles, chains of partial matches
  * don't).
  *
  * Scale design: DEGREE ORIENTATION (the standard large-graph move —
  * Suri & Vassilvitskii 2011's MR-friendly form): every edge points
  * from its lower-(degree, id) endpoint to the higher one, so a
  * vertex's oriented out-degree is bounded by O(sqrt(|E|)) regardless
  * of raw degree — the wedge self-join fans out by out-degree squared,
  * which orientation caps where a hub vertex would otherwise explode
  * (a 10M-degree hub contributes 10^14 raw wedges but only its
  * arboricity-bounded oriented wedges). Every join is an equi-join on
  * vertex ids; each triangle is found exactly once (its minimum-rank
  * vertex is the apex). Reference analogue: none — graph analytics
  * extend the engine the same way PageRank does.
  */
object Triangles {

  /** edges: two long columns (a, b), undirected; canonicalized and
    * dedup'd inside. Returns (id, degree, n_tri, clustering) per vertex
    * that appears in at least one edge; clustering = 2·T/(d·(d−1)),
    * 0.0 for degree-1 vertices, rounded to 4. */
  def triangleStats(edges: DataFrame): DataFrame = {
    // canonical simple graph; one materialization feeds degree, the
    // orientation join and the closure join (the edge list is usually
    // an expensive pipeline — minhash LSH here)
    val und = edges.toDF("a", "b")
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .localCheckpoint()
    val deg = und.select(explode(array(col("a"), col("b"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("degree"))
    val withDeg = und
      .join(deg.select(col("id").as("a"), col("degree").as("da")), Seq("a"))
      .join(deg.select(col("id").as("b"), col("degree").as("db")), Seq("b"))
    // orient low-rank -> high-rank, rank = (degree, id); carry the
    // dst rank so the wedge filter needs no further join
    val aLow = (col("da") < col("db")) ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = withDeg.select(
      when(aLow, col("a")).otherwise(col("b")).as("src"),
      when(aLow, col("b")).otherwise(col("a")).as("dst"),
      when(aLow, col("db")).otherwise(col("da")).as("dd"))
      .localCheckpoint()
    // wedges at the apex (= lowest-rank vertex of any triangle it
    // closes): out-neighbors pairwise, ordered by rank so the closing
    // edge's orientation is known to be v -> w
    val e1 = oriented.select(col("src"), col("dst").as("v"),
      col("dd").as("dv"))
    val e2 = oriented.select(col("src"), col("dst").as("w"),
      col("dd").as("dw"))
    val wedges = e1.join(e2, Seq("src"))
      .filter((col("dv") < col("dw")) ||
        (col("dv") === col("dw") && col("v") < col("w")))
    val tri = wedges.join(
        oriented.select(col("src").as("v"), col("dst").as("w")),
        Seq("v", "w"))
      .select(col("src").as("u"), col("v"), col("w"))
    val triPer = tri
      .select(explode(array(col("u"), col("v"), col("w"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_tri"))
    deg.join(triPer, Seq("id"), "left")
      .select(col("id"), col("degree"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"))
      .withColumn("clustering",
        when(col("degree") < 2, lit(0.0)).otherwise(
          round((lit(2.0) * col("n_tri")) /
            (col("degree") * (col("degree") - 1)).cast("double"), 4)))
  }
}

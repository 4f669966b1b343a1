package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r17 item 4: ATTRIBUTE q_semdedup's first-decade ratio. SCALE_r16
  * measured wall 15.1x vs candidates 10.3x between 1x and 10x — the
  * one wall>cand row without a named cause. Hypothesis: the
  * corpus-scaled nlist retrain. The coarse quantizer trains Lloyd
  * over n vectors x nlist cells with nlist = max(16, n/125), so the
  * TRAINING term alone is O(n * n/125) = quadratic by design — at 1x
  * (20k vectors, 160 cells) that is 3.2M distance evaluations, at 10x
  * (200k vectors, 1600 cells) 320M: a 100x training-term growth
  * hiding inside a 10x data step, tempered in the total by the pair
  * sweep. This probe times the BUILD (ivfTrainAssign end-to-end) and
  * the PAIR SWEEP (semDedupOn over a checkpointed assignment)
  * separately at both scales, min-of-2 each, and prints the
  * attribution.
  */
object ProfileSemdedup17 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // between DIRS only — a mid-measurement unpersist would drop the
    // localCheckpoint blocks the second timing pass reads
    def clearAll(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc(); Thread.sleep(200)
    }
    def t2(f: => Long): (Double, Long) = {
      def once(): (Double, Long) = {
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val a = once(); val b = once()
      (math.min(a._1, b._1), a._2)
    }

    for (d <- Seq("/root/testdata/sf0.1", "/tmp/graft_scale13")) {
      graft.Tune.forInput(spark, d)
      val e = graft.Tables.load(spark, d, "embeddings")
        .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
      val n = e.count()
      val nlist = math.max(16L, n / 125L).toInt
      // BUILD: Lloyd train (2 iters) + assignment, materialized
      val (tBuild, _) = t2 {
        val (_, idx) = graft.operators.Ann.ivfTrainAssign(e, nlist, 2, 64)
        idx.queryExecution.toRdd.count()
      }
      // PAIR SWEEP: served from a standing assignment (lineage cut)
      val (_, idx) = graft.operators.Ann.ivfTrainAssign(e, nlist, 2, 64)
      val standing = idx.localCheckpoint()
      standing.count()
      val (tPairs, _) = t2 {
        graft.operators.Ann.semDedupOn(standing, 0.3, 64)
          .queryExecution.toRdd.count()
      }
      println(f"SEMPROF $d%-24s n=$n%7d nlist=$nlist%5d " +
        f"build=$tBuild%7.2f s pairs=$tPairs%7.2f s " +
        f"total=${tBuild + tPairs}%7.2f s")
      clearAll()
    }
    spark.stop()
  }
}

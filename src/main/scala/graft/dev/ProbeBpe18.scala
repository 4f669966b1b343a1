package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Session-5 probe: where do q_bpe_train_deep's ~0.11 s/round go, and
  * does an intermediate partition count (1 < p < cpus) beat both the
  * scan layout (1 at bench sfs) and the full spread (32 — measured
  * 1.6x slower in session 1)? Replays the exact chain with a
  * partitions knob and per-phase timers. */
object ProbeBpe18 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val rounds = sys.env.getOrElse("SPARK_GRAFT_BPE_ROUNDS", "64").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // exact bench shape (ADVICE r18): the engine grain + the same
    // docsRaw load path the trainers use (column pruning makes the
    // scans identical, but the probe should not have to argue that)
    graft.Tune.forInput(spark, sfDir)

    def chain(parts: Int): Double = {
      val t0 = System.nanoTime()
      var d = graft.queries.TextQueries.docsRaw(spark, sfDir)
        .select(lower(col("text")).as("t"))
      if (parts > 1) d = d.repartition(parts)
      d = d.localCheckpoint()
      var tCounts = 0.0; var tDrv = 0.0
      var lastMerge = ""
      for (k <- 0 to rounds) {
        val tc0 = System.nanoTime()
        val counts = graft.queries.TextQueries.bpePairCountsLocal(d)
        tCounts += (System.nanoTime() - tc0) / 1e9
        if (k < rounds) {
          val td0 = System.nanoTime()
          val best = counts.minBy { case (s, c) => (-c, s) }._1
          lastMerge = new String(Array(
            ((best >> 16) & 0xffff).toChar, (best & 0xffff).toChar))
          d = d.select(replace(col("t"), lit(lastMerge),
            lit((0x250 + k + 1).toChar.toString)).as("t"))
            .localCheckpoint(false)
          tDrv += (System.nanoTime() - td0) / 1e9
        }
      }
      val tot = (System.nanoTime() - t0) / 1e9
      println(f"[bpe] parts=$parts total=$tot%.2f counts=$tCounts%.2f " +
        f"driver/plan=$tDrv%.2f perRound=${tot / (rounds + 1)}%.3f")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      tot
    }
    // warm
    chain(1)
    // interleave candidates
    (1 to 3).foreach { _ =>
      Seq(1, 2, 4, 8, 32).foreach(chain)
    }
    spark.stop()
  }
}

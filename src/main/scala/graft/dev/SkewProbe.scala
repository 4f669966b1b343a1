package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measured hot-cell skew scenario (SURVEY §4): half a point layer lands
  * in ONE grid cell (an urban core), so the cell equi-join behind
  * Snap puts half the work into a single shuffle task. Three runs over
  * identical data:
  *
  *   A. plain join, AQE skew split DISABLED  — the straggler baseline
  *   B. plain join, AQE skew split ENABLED   — runtime mitigation
  *   C. salted join (Snap salts=8)           — static mitigation
  *
  * Broadcast is disabled throughout: the probe emulates the 100 TB
  * regime where the target layer is itself too large to broadcast (with
  * a broadcastable target there IS no shuffle, hence no key skew — AQE
  * handles that case by itself). A/B/C row counts are asserted equal.
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    // emulate huge-target regime: no broadcast anywhere in the probe
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // AQE's skew detector looks at the hot partition's INPUT bytes
    // (~6 MB here — a 257k-row point partition), not its join OUTPUT:
    // the thresholds must sit below that for the split to engage. At
    // production scale the same tuning question recurs — a modest-byte
    // partition can hide a massive join fan-out, which is exactly why
    // the static salt (run C) stays in the toolbox.
    spark.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "512k")

    // points: every even id inside the single hot cell [500,510)^2,
    // odd ids uniform over the 1000x1000 domain (deterministic key math)
    val pts = graft.Tables.load(spark, dir, "lineitem")
      .select((col("l_orderkey") * 10 + col("l_linenumber")).as("id"),
        col("l_partkey"), col("l_suppkey"))
      .select(col("id"),
        when(col("id") % 2 === 0,
          lit(500.0) + (col("l_partkey") % 1000) / 100.0)
          .otherwise((col("l_partkey") * 7919 % 100000) / 100.0).as("x"),
        when(col("id") % 2 === 0,
          lit(500.0) + (col("l_suppkey") % 1000) / 100.0)
          .otherwise((col("l_suppkey") * 104729 % 100000) / 100.0).as("y"))
    // targets: ~2000 inside the hot cell (a dense POI cluster), rest
    // uniform — the hot task streams ~0.5B candidate pairs if unsplit,
    // a straggler that dominates the job
    val targets = graft.Tables.load(spark, dir, "part")
      .select(col("p_partkey").as("tid"))
      .select(col("tid"),
        when(col("tid") % 10 === 0,
          lit(500.0) + (col("tid") / 10 % 1000) / 100.0)
          .otherwise((col("tid") * 7919 % 100000) / 100.0).as("tx"),
        when(col("tid") % 10 === 0,
          lit(500.0) + (col("tid") / 10 % 997) / 100.0)
          .otherwise((col("tid") * 104729 % 100000) / 100.0).as("ty"))

    val p = pts.localCheckpoint(); val t = targets.localCheckpoint()
    println(s"SKEW pts=${p.count()} hot=${p.filter(col("x") >= 500 && col("x") < 510 && col("y") >= 500 && col("y") < 510).count()} " +
      s"targets=${t.count()} hotT=${t.filter(col("tx") >= 500 && col("tx") < 510 && col("ty") >= 500 && col("ty") < 510).count()}")

    def time(label: String)(f: => Long): Double = {
      val t0 = System.nanoTime(); val n = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"SKEW $label n=$n%d t=$s%.1f"); s
    }
    // filter on the snapped flag so the join can't be optimizer-eliminated
    // (a bare count() after the left join lets Catalyst drop the unique-key
    // right side entirely and count the point table)
    def run(salts: Int = 1): Long =
      graft.operators.Snap(p, t, 10.0, salts).filter(col("snapped")).count()

    // warm-up so A doesn't pay JIT
    run()
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    val a = time("A plain (skew split off)")(run())
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    val b = time("B plain (AQE skew split)")(run())
    val c = time("C salted (salts=8)      ")(run(salts = 8))
    println(f"SKEW SPEEDUP aqe=${a / b}%.2fx salted=${a / c}%.2fx")
    spark.stop()
  }
}

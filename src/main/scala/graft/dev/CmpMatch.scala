package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.MatchLines

object CmpMatch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val verts = graft.Tables.load(spark, sfDir, "lineitem").select(
      col("l_orderkey").cast("long").as("lid"),
      col("l_linenumber").as("seq"),
      (col("l_partkey") * 61 % 1000).cast("long").as("xi"),
      (col("l_suppkey") * 157 % 1000).cast("long").as("yi"))
      .filter(col("lid") % 20 === 0 || col("lid") % 2 === 1)
    def time(name: String)(body: => Long): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = body
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[prof] $name%-26s ${ts.map(_._1).min}%6.2f s  rows=${ts.head._2}")
    }
    val lines = MatchLines.linesWithCells(verts, 30).localCheckpoint()
    lines.count()
    val probe = lines.filter(col("lid") % 20 === 0)
    val target = lines.filter(col("lid") % 2 === 1)
    val offsets = array((-1 to 1).flatMap(dx => (-1 to 1).map(dy =>
      struct(lit(dx).as("dx"), lit(dy).as("dy")))): _*)
    val probed = probe
      .select(col("lid").as("la"), col("n").as("na"),
        col("sx").as("sxa"), col("sy").as("sya"),
        col("cx"), col("cy"), explode(offsets).as("o"))
      .select(col("la"), col("na"), col("sxa"), col("sya"),
        (col("cx") + col("o.dx")).as("jx"), (col("cy") + col("o.dy")).as("jy"))
    val digests = target
      .groupBy(col("cx").as("jx"), col("cy").as("jy"))
      .agg(collect_list(struct(
        col("lid").as("lb"), col("n").as("nb"),
        col("sx").as("sxb"), col("sy").as("syb"))).as("ts"))
    time("digests") { digests.count() }
    val beamedPre = probed.join(digests, Seq("jx", "jy"))
      .select(col("la"), explode(graft.functions.CellBeam(col("ts"),
        col("na"), col("sxa"), col("sya"), 25)).as("t"))
      .select(col("la"), col("t.key").as("proxy"), col("t.tie").as("lb"))
    time("join+cellbeam") { beamedPre.count() }
    val beamed = beamedPre
      .groupBy("la")
      .agg(graft.functions.TopKAgg(col("proxy"), col("lb"), lit(0L), 25)
        .as("tk"))
      .select(col("la"), explode(col("tk.tie")).as("lb"))
    time("  +topk (no ckpt)") { beamed.count() }
    time("  +topk+ckpt") { beamed.localCheckpoint().count() }
    val b2 = beamed.localCheckpoint()
    val scored = b2
      .join(probe.select(col("lid").as("la"), col("pts").as("pa")), "la")
      .join(target.select(col("lid").as("lb"), col("pts").as("pb")), "lb")
      .withColumn("hd", round(MatchLines.hausdorff(col("pa"), col("pb")), 4))
    time("scored (warm beam)") { scored.count() }
    val best = scored
      .groupBy("la")
      .agg(graft.functions.TopKAgg(col("hd"), col("lb"), lit(0L), 1)
        .as("tk"))
      .select(col("la"), explode(col("tk")).as("t"))
      .select(col("la"), col("t.tie").as("lb"), col("t.key").as("hd"))
    time("  +best (warm beam)") { best.count() }
    spark.stop()
  }
}

package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.MatchLines

/** Dev-only stage profile of q_match_lines at SPARK_GRAFT_SF_DIR:
  * candidate-join volume + beam + full query at the fixed cell size vs
  * the density-adaptive cell size, and an output-equality count. */
object ProfileMatch {
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

    val auto = MatchLines.autoCellTenths(MatchLines.linesAgg(verts))
    println(s"[prof] autoCellTenths = $auto")

    def candCount(cell: Int): Long = {
      val lines = MatchLines.linesWithCells(verts, cell).localCheckpoint()
      val probe = lines.filter(col("lid") % 20 === 0)
      val target = lines.filter(col("lid") % 2 === 1)
      val offsets = array((-1 to 1).flatMap(dx => (-1 to 1).map(dy =>
        struct(lit(dx).as("dx"), lit(dy).as("dy")))): _*)
      val probed = probe
        .select(col("lid").as("la"), col("cx"), col("cy"),
          explode(offsets).as("o"))
        .select(col("la"), (col("cx") + col("o.dx")).as("jx"),
          (col("cy") + col("o.dy")).as("jy"))
      val targeted = target
        .select(col("lid").as("lb"), col("cx").as("jx"), col("cy").as("jy"))
      probed.join(targeted, Seq("jx", "jy")).count()
    }
    println(s"[prof] candidates cell=30   : ${candCount(30)}")
    println(s"[prof] candidates cell=auto : ${candCount(auto)}")

    def matchAt(cell: Int) = {
      val lines = MatchLines.linesWithCells(verts, cell).localCheckpoint()
      MatchLines.matchByHausdorff(
        lines.filter(col("lid") % 20 === 0),
        lines.filter(col("lid") % 2 === 1))
    }
    def time(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val n = mk.count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[prof] $name%-22s ${ts.map(_._1).min}%6.2f s  rows=${ts.head._2}")
    }
    time("match cell=30")(matchAt(30))
    time("match cell=auto")(matchAt(auto))

    val m30 = matchAt(30)
    val mAuto = matchAt(auto)
    val both = m30.as("a").join(mAuto.as("b"), Seq("la"))
      .select((col("a.lb") === col("b.lb") &&
        col("a.hd") === col("b.hd")).as("eq"))
      .groupBy("eq").count()
    println("[prof] equality (cell30 vs auto):")
    both.collect().foreach(r => println(s"[prof]   eq=${r.get(0)} n=${r.get(1)}"))
    println(s"[prof] rows30=${m30.count()} rowsAuto=${mAuto.count()}")
    spark.stop()
  }
}

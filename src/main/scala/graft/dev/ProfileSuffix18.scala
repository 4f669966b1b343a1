package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-by-round wall attribution for the r18 suffix-index BUILD —
  * the ~190 s once-per-session artifact cost (the round's biggest
  * remaining wall chunk). Replays SuffixArray.buildWithBase inline
  * with per-phase timers: positions/pack, seed stitch, each doubling
  * round (with its active count), final stitch, LCP descent. */
object ProfileSuffix18 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    import graft.operators.SuffixArray
    val PackW = SuffixArray.PackW

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    val base = t("positions+ckpt") {
      val b = SuffixArray.positions(docs).localCheckpoint()
      b.count(); b
    }
    val nPos = base.count()
    val maxLen = base.agg(max("len")).collect()(0).getLong(0)
    println(s"[prof] nPos=$nPos maxLen=$maxLen")
    val packed0 = base.select("doc_id", "pos", "r")
    val r8 = t("seed stitch (width 7)") {
      val (r, _) = SuffixArray.bucketIndex(packed0,
        shiftright(col("r"), 8 * (PackW - 2)), Seq("r"), "mr",
        SuffixArray.MinRank)
      r
    }
    val docWin = Window.partitionBy("doc_id").orderBy("pos")
    var width = PackW.toLong
    var settled = List[org.apache.spark.sql.DataFrame]()
    var nActive = nPos
    var curFull = r8.select(col("doc_id"), col("pos"),
      col("mr").as("r"), lit(true).as("__a"))
    while (nActive > 0 && width < maxLen) {
      val w0 = width
      val act = t(s"round w=$w0") {
        val wGrp = Window.partitionBy("r").orderBy("r2", "doc_id", "pos")
        val wSub = Window.partitionBy("r", "r2")
        val refined = curFull
          .withColumn("r2",
            coalesce(lead(col("r"), width.toInt).over(docWin), lit(-1L)))
          .filter(col("__a"))
          .withColumn("rnG", row_number().over(wGrp))
          .withColumn("mrn", min(col("rnG")).over(wSub))
          .withColumn("gs", count(lit(1)).over(wSub))
          .select(col("doc_id"), col("pos"),
            (col("r") + col("mrn") - 1L).as("r"), col("gs"))
          .localCheckpoint()
        width *= 2
        settled = refined.filter(col("gs") === 1L)
          .select("doc_id", "pos", "r") :: settled
        val active = refined.filter(col("gs") > 1L)
          .select("doc_id", "pos", "r")
        val na = refined.filter(col("gs") > 1L).count()
        curFull = (active.withColumn("__a", lit(true)) :: settled
          .map(_.withColumn("__a", lit(false)))).reduce(_ unionByName _)
          .coalesce(32).localCheckpoint(false)
        na
      }
      nActive = act
      println(s"[prof]   active=$nActive")
    }
    val ord = t("final stitch") {
      val fullRank = curFull.select("doc_id", "pos", "r")
      val (o, _) = SuffixArray.bucketIndex(
        fullRank.join(base.select("doc_id", "pos", "len"),
          Seq("doc_id", "pos")),
        expr(s"CAST(((r - 1) * 64) DIV $nPos AS BIGINT)"),
        Seq("r", "doc_id", "pos"), "rn", SuffixArray.Row)
      val oc = o.select("doc_id", "pos", "len", "rn").localCheckpoint()
      oc.count(); oc
    }
    println(s"[prof] ord rows=${ord.count()}")
    spark.stop()
  }
}

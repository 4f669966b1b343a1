package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-by-round wall attribution for the suffix-index BUILD — the
  * once-per-session artifact cost (the biggest wall chunk outside the
  * bench metric). Replays SuffixArray.buildWithBase inline with
  * per-phase timers — positions/pack, the width-28 seed stitch (r19),
  * each doubling round (with its active count), final stitch — then
  * times the REAL adjacentLcp descent off the replayed levels. Keep
  * the replay in lockstep with SuffixArray.buildWithBase. */
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
    // the real serve path spreads the corpus (TextQueries.docs) — match it
    val docs = graft.Tables.spread(graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id").cast("long").as("doc_id"), col("text")))
    import graft.operators.SuffixArray
    val PackW = SuffixArray.PackW
    val SeedW = SuffixArray.SeedW

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
    val docWin = Window.partitionBy("doc_id").orderBy("pos")
    val wide = t("wide leads+ckpt") {
      val w = base.select("doc_id", "pos", "r")
        .withColumn("r7",
          coalesce(lead(col("r"), PackW).over(docWin), lit(-1L)))
        .withColumn("r14",
          coalesce(lead(col("r"), 2 * PackW).over(docWin), lit(-1L)))
        .withColumn("r21",
          coalesce(lead(col("r"), 3 * PackW).over(docWin), lit(-1L)))
        .localCheckpoint()
      w.count(); w
    }
    val levels =
      scala.collection.mutable.ArrayBuffer[(Long, org.apache.spark.sql.DataFrame)](
        (PackW.toLong, wide))
    val r28 = t(s"seed stitch (width $SeedW)") {
      val (r, _) = SuffixArray.bucketIndex(wide,
        shiftright(col("r"), 8 * (PackW - 2)),
        Seq("r", "r7", "r14", "r21"), "mr", SuffixArray.MinRank,
        sizeOut = Some("gs"))
      r
    }
    var width = SeedW.toLong
    var settled = List[org.apache.spark.sql.DataFrame](
      r28.filter(col("gs") === 1L)
        .select(col("doc_id"), col("pos"), col("mr").as("r")))
    var nActive = t("seed active count") {
      r28.filter(col("gs") > 1L).count()
    }
    println(s"[prof]   active=$nActive")
    var curFull = r28.select(col("doc_id"), col("pos"),
      col("mr").as("r"), (col("gs") > 1L).as("__a"))
    levels += ((SeedW.toLong, curFull.select("doc_id", "pos", "r")))
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
      levels += ((width, curFull.select("doc_id", "pos", "r")))
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
    val pairs = t("lcp descent (adjacentLcp)") {
      val p = SuffixArray.adjacentLcp(ord, levels.toSeq).localCheckpoint()
      p.count(); p
    }
    println(s"[prof] pairs rows=${pairs.count()}")
    spark.stop()
  }
}

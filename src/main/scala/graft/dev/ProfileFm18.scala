package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only serve-path profile for the FM rows: with the artifact
  * standing (built once at session start, like the bench's own retry
  * behavior), where does the serve wall go — the backward-search step
  * jobs (intervals) or the output join against ord? */
object ProfileFm18 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{FmIndex, SuffixIndex}

    val d = graft.Tables.spread(graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id").cast("long").as("doc_id"), col("text")))
      .select("doc_id", "text")
    val seed = d.filter(col("doc_id") % 60 === 3 && col("doc_id") < 480)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val lifted = (0 to 7).map { k =>
      val t = seed(k * 60L + 3L)
      (k.toLong, t.substring(k * 5 + 2, k * 5 + 2 + 5 + (k * 2) % 7))
    }
    val pats = lifted ++ Seq((8L, "ing "), (9L, "zqxjvvqz"))

    val tag = SuffixIndex.tagFor(spark, sfDir)
    var t0 = System.nanoTime()
    val h = SuffixIndex.forCorpus(d, tag)
    println(f"[prof] suffix build          ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    t0 = System.nanoTime()
    val fm = SuffixIndex.fmFor(h, tag)
    println(f"[prof] fm build              ${(System.nanoTime() - t0) / 1e9}%7.2f s")

    (1 to 3).foreach { r =>
      t0 = System.nanoTime()
      val iv = FmIndex.intervals(spark, fm, pats)
      val tIv = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      import spark.implicits._
      val ivDf = iv.filter(x => x._4 >= x._3).toDF("pid", "pat", "lo", "hi")
      val n = h.ord.join(broadcast(ivDf),
        h.ord("rn") >= ivDf("lo") && h.ord("rn") <= ivDf("hi"))
        .select(col("pid"), col("pat"), col("doc_id"), col("pos"))
        .queryExecution.toRdd.count()
      val tJoin = (System.nanoTime() - t0) / 1e9
      println(f"[prof] run$r intervals $tIv%6.2f s  locate-join $tJoin%6.2f s  rows=$n")
    }
    spark.stop()
  }
}

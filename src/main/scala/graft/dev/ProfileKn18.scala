package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only layer profile for the r18 KN LM rows: q_kn_bigram_lm /
  * q_kn_trigram_lm measured 4-5x their prior-box floors on this round's
  * box (min-of-3, quiet). Which layer — the instance explode, the
  * instance checkpoint, the train aggregates, or the scoring join —
  * carries the wall? Un-pruned plans, min of 3. */
object ProfileKn18 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = mk.queryExecution.toRdd.count()
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[prof] $name%-34s ${ts.map(_._1).min}%6.2f s  rows=${ts.head._2}")
    }

    def d = graft.Tables.spread(graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id").cast("long").as("doc_id"), col("text")))
      .select(col("doc_id"), expr(
        "filter(split(lower(text), ' '), w -> length(w) > 0)").as("ws"))
    def triNoCkpt = d.select(col("doc_id"), explode(expr(
      """CASE WHEN size(ws) >= 3 THEN
        |  transform(sequence(1, size(ws) - 2), i -> named_struct(
        |    'w1', element_at(ws, i), 'w2', element_at(ws, i + 1),
        |    'w3', element_at(ws, i + 2)))
        |ELSE cast(array() as
        |  array<struct<w1:string,w2:string,w3:string>>) END"""
        .stripMargin)).as("t"))
      .select(col("doc_id"), col("t.w1").as("w1"), col("t.w2").as("w2"),
        col("t.w3").as("w3"))

    time("split floor")(d.select(col("doc_id"), size(col("ws")).as("n")))
    time("tri explode (no ckpt)")(triNoCkpt)
    time("tri explode + localCheckpoint")(triNoCkpt.localCheckpoint())
    time("ctri agg over ckpt'd tri") {
      val tri = triNoCkpt.localCheckpoint()
      tri.filter(col("doc_id") % 5 === 0)
        .groupBy("w1", "w2", "w3").agg(count(lit(1)).as("c3"))
    }
    time("full q_kn_trigram_lm")(
      graft.queries.TextQueries.qKnTrigramLm(spark, sfDir))
    time("full q_kn_bigram_lm")(
      graft.queries.TextQueries.qKnBigramLm(spark, sfDir))
    spark.stop()
  }
}

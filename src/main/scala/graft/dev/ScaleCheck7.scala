package graft.dev
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-7 scaling probe: the new text/curation operators on 1x vs 4x
  * corpora. The 4x corpus is materialized to parquet with the same
  * key-shift + vowel-translation mutations ScaleCheck uses (copies are
  * NOT near-dups of each other), then the production query functions run
  * UNCHANGED against the synthetic dir — probing the exact plans the
  * driver measures, not re-implementations. */
object ScaleCheck7 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val out4 = "/tmp/graft_scale7"
    val docs1 = graft.Tables.load(spark, dir, "documents")
    val docs4 = (0 until 4).map { i =>
      val t = i match {
        case 0 => col("text")
        case 1 => translate(col("text"), "aeiou", "12345")
        case 2 => translate(col("text"), "aeiou", "67890")
        case 3 => reverse(col("text"))
      }
      docs1.select((col("doc_id") + i * 1000000L).as("doc_id"),
        t.as("text"), col("lang"), col("source"))
    }.reduce(_ union _)
    docs4.write.mode("overwrite").parquet(s"$out4/documents.parquet")

    def time(label: String)(f: => Long): Double = {
      val t = System.nanoTime(); val n = f
      val s = (System.nanoTime() - t) / 1e9
      println(f"SCALE $label n=$n%d t=$s%.1f"); spark.catalog.clearCache(); s
    }
    def ratio(label: String, t1: Double, t4: Double): Unit =
      println(f"SCALE $label RATIO ${t4 / t1}%.2f (linear=4.0)")
    def run(q: String, d: String): Long =
      graft.SparkEntry.queries(q)(spark, d).queryExecution.toRdd.count()

    val probed = Seq("q_lm_perplexity", "q_repetition", "q_bpe_train",
      "q_dedup_incremental", "q_split_stratified", "q_dedup_spans",
      "q_corpus_stats", "q_normalize_unicode")

    // JIT warm-up at 1x
    probed.foreach(run(_, dir))
    spark.catalog.clearCache()

    for (q <- probed) {
      val t1 = time(s"$q 1x")(run(q, dir))
      val t4 = time(s"$q 4x")(run(q, out4))
      ratio(q, t1, t4)
    }
    spark.stop()
  }
}

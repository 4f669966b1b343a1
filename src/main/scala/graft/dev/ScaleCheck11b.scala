package graft.dev
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling probe for the round-11 second-session operators (rows
  * 151-164): production query functions UNCHANGED on 1x vs a
  * materialized 4x corpus (the ScaleCheck11 pattern and its copy
  * hygiene — 1e8 id shifts, text mutation so copies are not near-dups
  * of each other). Embeddings scale too: copies reverse / negate /
  * halve the vector so no copy duplicates another's geometry (the
  * coarse quantizer retrains honestly at 4x — new dir, new artifact).
  * q_ann_recall_matryoshka is excluded by design: its brute-force
  * sides are the documented harness twins (queries scale WITH the
  * corpus, so cost is quadratic on purpose); the serving paths are
  * probed by the earlier rounds' checks. */
object ScaleCheck11b {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val out4 = "/tmp/graft_scale11b"
    val docs1 = graft.Tables.load(spark, dir, "documents")
    (0 until 4).map { i =>
      val t = i match {
        case 0 => col("text")
        case 1 => translate(col("text"), "aeiou", "12345")
        case 2 => translate(col("text"), "aeiou", "67890")
        case 3 => reverse(col("text"))
      }
      docs1.select((col("doc_id") + i * 100000000L).as("doc_id"),
        t.as("text"), col("lang"), col("source"))
    }.reduce(_ union _)
      .write.mode("overwrite").parquet(s"$out4/documents.parquet")
    val ev1 = spark.read.parquet(s"$dir/events.parquet")
    (0 until 4).map(i => ev1
        .withColumn("event_id", col("event_id") + i * 100000000L)
        .withColumn("user_id", col("user_id") + i * 100000000L))
      .reduce(_ union _)
      .write.mode("overwrite").parquet(s"$out4/events.parquet")
    val em1 = spark.read.parquet(s"$dir/embeddings.parquet")
    (0 until 4).map { i =>
      val e = i match {
        case 0 => col("embedding")
        case 1 => reverse(col("embedding"))
        case 2 => transform(col("embedding"), x => -x)
        case 3 => transform(col("embedding"), x => x * lit(0.5f))
      }
      em1.select((col("vec_id") + i * 100000000L).as("vec_id"),
        e.as("embedding"), col("label"))
    }.reduce(_ union _)
      .write.mode("overwrite").parquet(s"$out4/embeddings.parquet")

    def time(label: String)(f: => Long): Double = {
      val t = System.nanoTime(); val n = f
      val s = (System.nanoTime() - t) / 1e9
      println(f"SCALE $label n=$n%d t=$s%.1f"); spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      s
    }
    def ratio(label: String, t1: Double, t4: Double): Unit =
      println(f"SCALE $label RATIO ${t4 / t1}%.2f (linear=4.0)")
    def run(q: String, d: String): Long =
      graft.SparkEntry.queries(q)(spark, d).queryExecution.toRdd.count()

    val probed = Seq("q_winnow_fingerprint", "q_winnow_overlap",
      "q_dsir_resample", "q_merkle_diff", "q_chunk_rag", "q_chunk_dedup",
      "q_dedup_cc", "q_dedup_cc_delta", "q_split_temporal",
      "q_rate_limit", "q_label_kappa", "q_embedding_drift",
      "q_video_keyframes", "q_shard_rebalance", "q_sample_priority",
      "q_quality_percentile", "q_ngram_novelty", "q_bpe_fertility")

    probed.foreach(run(_, dir)) // JIT warm-up at 1x
    spark.catalog.clearCache()

    for (q <- probed) {
      val t1 = time(s"$q 1x")(run(q, dir))
      val t4 = time(s"$q 4x")(run(q, out4))
      ratio(q, t1, t4)
    }
    spark.stop()
  }
}

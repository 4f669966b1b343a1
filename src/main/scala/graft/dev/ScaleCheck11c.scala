package graft.dev
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling probe for the round-11 third-session operators (rows
  * 171-186): production query functions UNCHANGED on 1x vs a
  * materialized 4x corpus (the ScaleCheck11/11b pattern and copy
  * hygiene — 1e8 id shifts, text mutation so copies are not near-dups,
  * embedding geometry mutated per copy). This session's ops also read
  * the TPC-H side (k-anonymity, SAR export), so customer/orders/
  * lineitem scale too, with FK keys shifted consistently. n_chars is
  * recomputed after text mutation (the 11b corpus dropped it; several
  * new ops read it). q_orc_roundtrip's 4x side is pre-warmed once so
  * the timed run measures the pruned READ path, not the one-off
  * session write (the same warm-vs-measured split the bench uses). */
object ScaleCheck11c {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val out4 = "/tmp/graft_scale11c"
    val S = 100000000L

    val docs1 = graft.Tables.load(spark, dir, "documents")
    (0 until 4).map { i =>
      val t = i match {
        case 0 => col("text")
        case 1 => translate(col("text"), "aeiou", "12345")
        case 2 => translate(col("text"), "aeiou", "67890")
        case 3 => reverse(col("text"))
      }
      docs1.select((col("doc_id") + i * S).as("doc_id"), t.as("text"),
        col("lang"), col("source"))
    }.reduce(_ union _)
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$out4/documents.parquet")

    val ev1 = spark.read.parquet(s"$dir/events.parquet")
    (0 until 4).map(i => ev1
        .withColumn("event_id", col("event_id") + i * S)
        .withColumn("user_id", col("user_id") + i * S))
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
      em1.select((col("vec_id") + i * S).as("vec_id"), e.as("embedding"),
        col("label"))
    }.reduce(_ union _)
      .write.mode("overwrite").parquet(s"$out4/embeddings.parquet")

    // TPC-H side with consistent FK shifts (customer <- orders <- li)
    val c1 = spark.read.parquet(s"$dir/customer.parquet")
    (0 until 4).map(i => c1
        .withColumn("c_custkey", col("c_custkey") + i * S))
      .reduce(_ union _)
      .write.mode("overwrite").parquet(s"$out4/customer.parquet")
    val o1 = spark.read.parquet(s"$dir/orders.parquet")
    (0 until 4).map(i => o1
        .withColumn("o_orderkey", col("o_orderkey") + i * S)
        .withColumn("o_custkey", col("o_custkey") + i * S))
      .reduce(_ union _)
      .write.mode("overwrite").parquet(s"$out4/orders.parquet")
    val li1 = spark.read.parquet(s"$dir/lineitem.parquet")
    (0 until 4).map(i => li1
        .withColumn("l_orderkey", col("l_orderkey") + i * S))
      .reduce(_ union _)
      .write.mode("overwrite").parquet(s"$out4/lineitem.parquet")

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

    val probed = Seq("q_kanonymity", "q_sar_export",
      "q_domain_reputation", "q_boilerplate_lines", "q_license_detect",
      "q_mojibake", "q_tokenizer_coverage", "q_code_detect",
      "q_span_corruption", "q_length_buckets", "q_fim_transform",
      "q_stream_dedup", "q_orc_roundtrip", "q_rrf_fusion",
      "q_embedding_outliers", "q_multimodal_exif", "q_ldiversity",
      "q_multimodal_jpeg_exif", "q_audio_resample", "q_data_card",
      "q_stream_hll", "q_item_cofreq", "q_maxsim")

    probed.foreach(run(_, dir)) // JIT + session-artifact warm-up at 1x
    run("q_orc_roundtrip", out4) // pay the 4x ORC session write once
    run("q_embedding_outliers", out4) // and the 4x quantizer train
    spark.catalog.clearCache()

    for (q <- probed) {
      val t1 = time(s"$q 1x")(run(q, dir))
      val t4 = time(s"$q 4x")(run(q, out4))
      ratio(q, t1, t4)
    }
    spark.stop()
  }
}

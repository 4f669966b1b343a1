package graft.dev
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling probe for the round-12 additions: production query
  * functions UNCHANGED on 1x vs a materialized 4x corpus (the
  * ScaleCheck11c pattern and copy hygiene — 1e8 id shifts, text
  * mutation so copies are not near-dups, consistent FK shifts on the
  * TPC-H side). Covers the multi-coefficient H.264 stream, the
  * 5-round BPE trainer, the bigram langid pair, the deletion-
  * neighborhood ER serve, and the de-hinted TPC-H joins (AQE must
  * keep picking sane strategies when the dimensions quadruple). */
object ScaleCheck12 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val out4 = "/tmp/graft_scale12"
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
    // bounded dims copied as-is (their cardinality does NOT scale —
    // that is the point of keeping their broadcast hints)
    for (t <- Seq("nation", "region", "supplier", "part", "events",
        "embeddings"))
      spark.read.parquet(s"$dir/$t.parquet")
        .write.mode("overwrite").parquet(s"$out4/$t.parquet")

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

    val probed = Seq("q_multimodal_h264_ac", "q_multimodal_h264_cbp",
      "q_multimodal_pdf", "q_range_shard", "q_bpe_train",
      "q_bpe_fertility", "q_lang_id", "q_langid_eval", "q_lang_keywords",
      "q_entity_resolve_indexed", "q_top_revenue", "q5_local",
      "q9_profit", "q_sales_cube", "q_item_cofreq", "q_html_links")

    probed.foreach(run(_, dir)) // JIT + session-artifact warm-up at 1x
    run("q_entity_resolve_indexed", out4) // pay the 4x index build once
    spark.catalog.clearCache()

    for (q <- probed) {
      val t1 = time(s"$q 1x")(run(q, dir))
      val t4 = time(s"$q 4x")(run(q, out4))
      ratio(q, t1, t4)
    }
    spark.stop()
  }
}

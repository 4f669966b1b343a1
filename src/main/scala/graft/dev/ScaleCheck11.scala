package graft.dev
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-11 scaling probe: the new operators on 1x vs 4x corpora,
  * production query functions UNCHANGED against a materialized
  * synthetic dir (the ScaleCheck7 pattern).
  *
  * Copy hygiene: doc copies shift ids by 1e8 (NOT the usual 1e6 —
  * qDedupContainment plants fragments at doc_id + 1e6, which would
  * collide with 1e6-shifted copies) and mutate text so copies are not
  * near-dups of each other. Events copies shift user/event ids
  * (disjoint attribution chains). Orders copies shift order and
  * customer keys (disjoint bloom files); the CUSTOMER table stays 1x
  * on purpose — the bloom probe set is an operator INPUT, and a real
  * deployment probes a fixed key list regardless of corpus size, so
  * the honest 4x question is "4x files, same probes" (4x output), not
  * "4x files x 4x probes" (a quadratic nobody runs). */
object ScaleCheck11 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val out4 = "/tmp/graft_scale11"
    val docs1 = graft.Tables.load(spark, dir, "documents")
    val docs4 = (0 until 4).map { i =>
      val t = i match {
        case 0 => col("text")
        case 1 => translate(col("text"), "aeiou", "12345")
        case 2 => translate(col("text"), "aeiou", "67890")
        case 3 => reverse(col("text"))
      }
      docs1.select((col("doc_id") + i * 100000000L).as("doc_id"),
        t.as("text"), col("lang"), col("source"))
    }.reduce(_ union _)
    docs4.write.mode("overwrite").parquet(s"$out4/documents.parquet")
    val ev1 = spark.read.parquet(s"$dir/events.parquet")
    (0 until 4).map(i => ev1
        .withColumn("event_id", col("event_id") + i * 100000000L)
        .withColumn("user_id", col("user_id") + i * 100000000L))
      .reduce(_ union _)
      .write.mode("overwrite").parquet(s"$out4/events.parquet")
    val o1 = spark.read.parquet(s"$dir/orders.parquet")
    (0 until 4).map(i => o1
        .withColumn("o_orderkey", col("o_orderkey") + i * 100000000L)
        .withColumn("o_custkey", col("o_custkey") + i * 100000000L))
      .reduce(_ union _)
      .write.mode("overwrite").parquet(s"$out4/orders.parquet")
    // customer stays 1x: fixed probe list (see scaladoc)
    spark.read.parquet(s"$dir/customer.parquet")
      .write.mode("overwrite").parquet(s"$out4/customer.parquet")

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

    val probed = Seq("q_dedup_containment", "q_url_canonicalize",
      "q_audio_vad_segments", "q_mix_temperature", "q_robots_policy",
      "q_multimodal_h264_mb", "q_classifier_eval", "q_attribution",
      "q_bloom_skip_index")

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

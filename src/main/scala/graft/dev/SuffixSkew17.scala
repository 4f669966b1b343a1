package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r17 item 6: PROBE the suffix array's round-1 hot-prefix skew. The
  * seed round buckets suffixes by their leading ~3 chars
  * (shiftright(r, 42) — 21 bits of the packed width-8 key) and runs
  * rank() per bucket in one task; a corpus whose TEXT is dominated by
  * one leading trigram funnels that bucket through a single task
  * (VERDICT r16 watch item). A shared DOC PREFIX alone does not do
  * this (suffixes start at every position, so buckets follow the
  * corpus-wide trigram mix); the stress shape is REPEATED boilerplate
  * whose own trigram distribution is degenerate.
  *
  * Three same-size corpora (~500 docs x ~300 chars, the sf0.001
  * grain, then scaled 10x):
  *  - uniform: the real documents corpus (baseline trigram mix);
  *  - boiler:  90% of docs get a 200-char shared boilerplate HEAD
  *             (one hot doc-prefix, normal trigram mix inside it);
  *  - degen:   90% of docs are "ab" repeated (2-symbol alphabet, 4
  *             reachable leading trigrams -> 4 hot buckets).
  * For each: per-bucket row-count distribution of the round-1 seed
  * (max/median occupancy — the skew itself) and the build wall.
  * Decision input for the (prefix, salt) bucket-split fix: if degen's
  * wall tracks occupancy x single-task rank cost, the fix is worth
  * its complexity; if the wall stays within noise of uniform at these
  * scales, record the measurement and the designed fix instead.
  */
object SuffixSkew17 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def clear(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc(); Thread.sleep(200)
    }

    // NOT checkpointed: clear() between kinds drops all persistent
    // blocks, so the shared base must rebuild from parquet (cheap)
    val base = graft.Tables.load(spark, "/root/testdata/sf0.01",
      "documents").select(col("doc_id").cast("long").as("doc_id"),
      col("text"))

    val boilerplate = ("subscribe to our newsletter for updates and " +
      "follow us on social media channels every day this week now ") * 2
    def corpus(kind: String) = kind match {
      case "uniform" => base
      case "boiler" => base.select(col("doc_id"),
        when(col("doc_id") % 10 =!= 0,
          concat(lit(boilerplate.take(200)), col("text")))
          .otherwise(col("text")).as("text"))
      case _ => base.select(col("doc_id"),
        when(col("doc_id") % 10 =!= 0,
          concat(lit("ab" * 100),
            substring(col("text"), 1, 100))) // keep sizes comparable
          .otherwise(col("text")).as("text"))
    }

    for (kind <- Seq("uniform", "boiler", "degen")) {
      val d = corpus(kind).localCheckpoint()
      d.count()
      // round-1 seed occupancy: the skew itself, measured directly
      val occ = graft.operators.SuffixArray.positions(d)
        .select(shiftright(col("r"),
          8 * (graft.operators.SuffixArray.PackW - 2)).as("b"))
        .groupBy("b").agg(count(lit(1)).as("m"))
        .agg(max("m").as("mx"),
          expr("percentile_approx(m, 0.5, 10000)").as("med"),
          count(lit(1)).as("nb"), sum("m").as("n")).collect()(0)
      // build wall, min-of-2. No unpersist between the two passes —
      // it would drop the corpus checkpoint the second pass reads;
      // the build's own intermediate blocks are re-created per pass
      // (same lineage, fresh rdds), and clearAll() between KINDS
      // returns the memory
      def once(): Double = {
        val t0 = System.nanoTime()
        val (ord, _) = graft.operators.SuffixArray.build(d)
        ord.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      val w = math.min(once(), once())
      clear()
      println(f"SKEW17 $kind%-8s n=${occ.getLong(3)}%9d " +
        f"buckets=${occ.getLong(2)}%5d maxOcc=${occ.getLong(0)}%8d " +
        f"medOcc=${occ.getLong(1)}%7d wall=$w%7.2f s")
    }
    spark.stop()
  }
}

package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 1x / 4x / 16x scaling probe for the entity-resolution similarity
  * join (Analytics.entityResolveFrom) — dev tool, not part of the
  * library.
  *
  * Copy hygiene: each copy's names get a copy-unique TAG CHARACTER
  * interleaved after every name char, so every blocking gram of copy i
  * contains tag i and cross-copy grams can NEVER collide — the true
  * candidate count stays ~linear. (An earlier digit-permutation scheme
  * was not disjoint: all copies shared the digit alphabet, df grew
  * linearly and the candidate join went quadratic by construction
  * rather than by behavior.) */
object ProfileEntity {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val c1 = graft.Tables.load(spark, dir, "customer")
    // disjoint gram spaces: interleave a copy-unique tag char after
    // EVERY name char, so every trigram of copy i contains tag i and
    // cross-copy grams can never collide (digit-permutation copies
    // were NOT disjoint — all copies shared the digit alphabet, df grew
    // linearly and the candidate join grew quadratic by construction)
    def custN(copies: Int): DataFrame = (0 until copies).map { i =>
      val tag = ('a' + i).toChar.toString
      c1.select(
        (col("c_custkey").cast("long") + i * 1000000L).as("c_custkey"),
        regexp_replace(col("c_name"), "(.)", "$1" + tag).as("c_name"),
        col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
    }.reduce(_ union _)
    def time(label: String, copies: Int): Double = {
      val t0 = System.nanoTime()
      val n = graft.queries.Analytics.entityResolveFrom(custN(copies))
        .count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[entity] $label%-4s $s%7.2f s rows=$n")
      s
    }
    time("1x", 1) // warm
    val t1 = time("1x", 1)
    val t4 = time("4x", 4)
    val t16 = time("16x", 16)
    println(f"[entity] ratios: 4x/1x=${t4 / t1}%.2f (linear 4), " +
      f"16x/1x=${t16 / t1}%.2f (linear 16)")
    // r12: the deletion-neighborhood EXACT serve through the same
    // synthetic copies (postings built inline per probe — the build
    // cost scales with the master, the probe cost with the batch)
    def timeExact(label: String, copies: Int): Double = {
      val names = graft.queries.Analytics.entityMasterNames(custN(copies))
        .localCheckpoint()
      val postings = graft.queries.Analytics.entityDeletionPostings(names)
      val t0 = System.nanoTime()
      val n = graft.queries.Analytics.entityResolveExactOn(names, postings)
        .count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[exact] $label%-4s $s%7.2f s rows=$n")
      s
    }
    timeExact("1x", 1) // warm
    val e1 = timeExact("1x", 1)
    val e4 = timeExact("4x", 4)
    val e16 = timeExact("16x", 16)
    println(f"[exact] ratios: 4x/1x=${e4 / e1}%.2f (linear 4), " +
      f"16x/1x=${e16 / e1}%.2f (linear 16)")
    spark.stop()
  }
}

package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 16x scaling probe for the two historically-worst queries (SURVEY §4):
  * n-gram jaccard pair dedup and hausdorff line matching. The 4x probes
  * (ScaleCheck) are sub-linear, but match_lines' density sensitivity
  * (28x wall at a FIXED cell for 4x density) makes one more doubling of
  * the probe range cheap insurance — especially now that cell sizing is
  * density-adaptive engine behavior (MatchLines.autoCellTenths) rather
  * than a manual rule. This probe runs 1x / 4x / 16x copies of the sf0.1
  * inputs and reports wall-clock ratios against the linear ideal.
  *
  * Copy hygiene (same discipline as ScaleCheck): each copy's text is
  * translated/reversed into a disjoint shingle space so copies are NOT
  * near-dups of each other and true pair counts stay ~linear; line
  * copies are key-shifted within the same coordinate domain so DENSITY
  * (the hard axis) grows 16x while the extent stays fixed.
  */
object ScaleCheck16 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"

    def docs1 = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    // 16 disjoint shingle spaces: 8 vowel translations x {plain, reversed}
    val targets = Seq("aeiou", "12345", "67890", "bcdfg",
      "hjklm", "npqrs", "tvwxz", "AEIOU")
    def docsN(copies: Int) = (0 until copies).map { i =>
      val t0 = translate(col("text"), "aeiou", targets(i % 8))
      val t = if (i < 8) t0 else reverse(t0)
      docs1.select((col("doc_id") + i * 1000000L).as("doc_id"), t.as("text"))
    }.reduce(_ union _)

    def verts1 = graft.Tables.load(spark, dir, "lineitem").select(
      col("l_orderkey").cast("long").as("lid"),
      col("l_linenumber").as("seq"),
      (col("l_partkey") * 61 % 1000).cast("long").as("xi"),
      (col("l_suppkey") * 157 % 1000).cast("long").as("yi"))
    def vertsN(copies: Int) = (0 until copies).map { i =>
      verts1.select((col("lid") + i * 100000000L).as("lid"), col("seq"),
        ((col("xi") + i * 37) % 1000).as("xi"),
        ((col("yi") + i * 53) % 1000).as("yi"))
    }.reduce(_ union _)

    def time(label: String)(f: => Long): Double = {
      val t = System.nanoTime(); val n = f
      val s = (System.nanoTime() - t) / 1e9
      println(f"SCALE16 $label n=$n%d t=$s%.1f"); spark.catalog.clearCache(); s
    }

    // Time the UN-PRUNED plan, as Bench/TimeOne do: df.count() lets
    // Catalyst prune aggregates and drop join sides the count doesn't
    // need, so the probe would measure a lighter plan than production
    // executes (the r7 measurement-honesty finding).
    def exec(df: DataFrame): Long = df.queryExecution.toRdd.count()

    def jaccard(docs: DataFrame): Long =
      exec(graft.operators.Dedup.ngramJaccard(docs, 16, 20, 0.2))

    // engine path exactly as q_match_lines: density-adaptive cell
    def matchlines(verts: DataFrame): Long = {
      val base = graft.operators.MatchLines.linesAgg(verts)
      val cell = graft.operators.MatchLines.autoCellTenths(base)
      println(s"SCALE16 matchlines autoCell=$cell")
      val l = graft.operators.MatchLines.withCells(base, cell)
      exec(graft.operators.MatchLines.matchByHausdorff(
        l.filter(col("lid") % 20 === 0), l.filter(col("lid") % 2 === 1)))
    }

    // warm-up (JIT + parquet footer cache) so the 1x points are clean
    jaccard(docs1); matchlines(verts1); spark.catalog.clearCache()

    val j1 = time("jaccard 1x")(jaccard(docsN(1)))
    val j4 = time("jaccard 4x")(jaccard(docsN(4)))
    val j16 = time("jaccard 16x")(jaccard(docsN(16)))
    println(f"SCALE16 jaccard RATIOS 4x=${j4 / j1}%.2f (linear 4) " +
      f"16x=${j16 / j1}%.2f (linear 16)")

    val m1 = time("matchlines 1x")(matchlines(vertsN(1)))
    val m4 = time("matchlines 4x")(matchlines(vertsN(4)))
    val m16 = time("matchlines 16x")(matchlines(vertsN(16)))
    println(f"SCALE16 matchlines RATIOS 4x=${m4 / m1}%.2f (linear 4) " +
      f"16x=${m16 / m1}%.2f (linear 16)")
    spark.stop()
  }
}

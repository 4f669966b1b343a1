package graft.dev
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
/** Scaling probe: heavy operators on 1x vs 4x inputs (4 key-shifted,
  * text-mutated copies so data properties stay comparable). Near-linear
  * wall-clock ratios = the bucketed plans hold under growth. */
object ScaleCheck {
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
    // mutate per copy: vowel translation scrambles the shingle space so
    // copies are NOT near-dups of each other (pair counts stay ~linear)
    def docs4 = (0 until 4).map { i =>
      val t = i match {
        case 0 => col("text")
        case 1 => translate(col("text"), "aeiou", "12345")
        case 2 => translate(col("text"), "aeiou", "67890")
        case 3 => reverse(col("text"))
      }
      docs1.select((col("doc_id") + i * 1000000L).as("doc_id"), t.as("text"))
    }.reduce(_ union _)
    def emb1 = graft.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    // per-copy WALSH sign patterns (balanced ±1, pairwise orthogonal):
    // cos(copy_a(v), copy_b(v)) = Σ s_a s_b v_j² / |v|² — a balanced
    // signed sum of squared components, ~0 for any mass distribution —
    // so copies do NOT near-dup each other and pair counts stay
    // ~linear. (The old scale+shift mutation added a common component
    // to every copy, making the 4x corpus quadratically self-similar:
    // the probe then measured output growth, not plan scaling.)
    def emb4 = (0 until 4).map { i =>
      val flipped = transform(col("embedding"), (x, j) => {
        val s = i match {
          case 0 => lit(true)
          case 1 => j < 32 // first/second half
          case 2 => j % 2 === 0 // alternating
          case 3 => (j.cast("long") / 16 % 2) === 0 // 16-blocks
        }
        when(s, x).otherwise(-x)
      })
      emb1.select((col("vec_id") + i * 1000000L).as("vec_id"),
        flipped.as("embedding"))
    }.reduce(_ union _)
    def verts1 = graft.Tables.load(spark, dir, "lineitem").select(
      col("l_orderkey").cast("long").as("lid"),
      col("l_linenumber").as("seq"),
      (col("l_partkey") * 61 % 1000).cast("long").as("xi"),
      (col("l_suppkey") * 157 % 1000).cast("long").as("yi"))
    def verts4 = (0 until 4).map { i =>
      verts1.select((col("lid") + i * 100000000L).as("lid"), col("seq"),
        ((col("xi") + i * 37) % 1000).as("xi"),
        ((col("yi") + i * 53) % 1000).as("yi"))
    }.reduce(_ union _)
    def time(label: String)(f: => Long): Double = {
      val t = System.nanoTime(); val n = f
      val s = (System.nanoTime() - t) / 1e9
      println(f"SCALE $label n=$n%d t=$s%.1f"); spark.catalog.clearCache(); s
    }
    def ratio(label: String, t1: Double, t4: Double): Unit =
      println(f"SCALE $label RATIO ${t4 / t1}%.2f (linear=4.0)")
    // warm-up round at 1x so JIT doesn't pollute the 1x numbers
    graft.operators.Dedup.minhashPairs(docs1, 16, 64, 16, 0.2).count()
    graft.operators.Ann.cosineNearDupPairs(emb1, 8, 64, 0.3).count()
    spark.catalog.clearCache()
    val a1 = time("minhash 1x")(graft.operators.Dedup.minhashPairs(docs1, 16, 64, 16, 0.2).count())
    val a4 = time("minhash 4x")(graft.operators.Dedup.minhashPairs(docs4, 16, 64, 16, 0.2).count())
    ratio("minhash", a1, a4)
    val b1 = time("jaccard 1x")(graft.operators.Dedup.ngramJaccard(docs1, 16, 20, 0.2).count())
    val b4 = time("jaccard 4x")(graft.operators.Dedup.ngramJaccard(docs4, 16, 20, 0.2).count())
    ratio("jaccard", b1, b4)
    val c1 = time("clusters 1x")(graft.operators.Dedup.dedupClusters(docs1,
      graft.operators.Dedup.minhashPairs(docs1, 16, 64, 16, 0.2), 3).count())
    val c4 = time("clusters 4x")(graft.operators.Dedup.dedupClusters(docs4,
      graft.operators.Dedup.minhashPairs(docs4, 16, 64, 16, 0.2), 3).count())
    ratio("clusters", c1, c4)
    // NOTE: the synthetic corpus is heavily mass-skewed per dimension,
    // so even orthogonal sign-pattern copies keep residual cosine
    // above the 0.3 threshold for some vectors — the 4x corpus has
    // genuinely ~17x the near-dup pairs, and wall-clock tracks that
    // OUTPUT growth, not a plan pathology. Report the per-output-pair
    // ratio too: sub-linear means the bucketed join got cheaper per
    // verified pair as the corpus grew.
    var dn1 = 0L; var dn4 = 0L
    val d1 = time("neardup 1x") {
      dn1 = graft.operators.Ann.cosineNearDupPairs(emb1, 8, 64, 0.3).count(); dn1 }
    val d4 = time("neardup 4x") {
      dn4 = graft.operators.Ann.cosineNearDupPairs(emb4, 8, 64, 0.3).count(); dn4 }
    ratio("neardup", d1, d4)
    println(f"SCALE neardup PER-PAIR RATIO ${(d4 / dn4) / (d1 / dn1)}%.2f" +
      f" (pairs grew ${dn4.toDouble / dn1}%.1fx)")
    def lines(v: DataFrame) = graft.operators.MatchLines.linesWithCells(v, 30)
    val e1 = time("matchlines 1x") {
      val l = lines(verts1)
      graft.operators.MatchLines.matchByHausdorff(
        l.filter(col("lid") % 20 === 0), l.filter(col("lid") % 2 === 1)).count()
    }
    val e4 = time("matchlines 4x") {
      val l = lines(verts4)
      graft.operators.MatchLines.matchByHausdorff(
        l.filter(col("lid") % 20 === 0), l.filter(col("lid") % 2 === 1)).count()
    }
    ratio("matchlines", e1, e4)
    // density-matched cell size: 4x lines in the same domain -> halve the
    // cell edge so per-cell candidate counts stay constant
    val e4t = time("matchlines 4x cell15") {
      val l = graft.operators.MatchLines.linesWithCells(verts4, 15)
      graft.operators.MatchLines.matchByHausdorff(
        l.filter(col("lid") % 20 === 0), l.filter(col("lid") % 2 === 1)).count()
    }
    ratio("matchlines tuned", e1, e4t)
    // ---- round-4 operators ----
    // decontaminate: benchmark side FIXED (realistic — eval suites don't
    // grow with the corpus); corpus 1x vs 4x
    val bench = docs1.filter(col("doc_id") % 20 === 0)
    val f1 = time("decontam 1x")(graft.operators.Dedup.decontaminate(
      docs1.filter(col("doc_id") % 20 =!= 0), bench, 16, 0.2).count())
    val f4 = time("decontam 4x")(graft.operators.Dedup.decontaminate(
      docs4.filter(col("doc_id") % 20 =!= 0), bench, 16, 0.2).count())
    ratio("decontam", f1, f4)
    // quantized ANN: query set FIXED, corpus 1x vs 4x (brute-force scan
    // is linear in the corpus by design)
    val qset = emb1.filter(col("vec_id") % 50 === 0)
    val g1 = time("quantized 1x")(
      graft.operators.Ann.quantizedTopK(emb1, qset, 10).count())
    val g4 = time("quantized 4x")(
      graft.operators.Ann.quantizedTopK(emb4, qset, 10).count())
    ratio("quantized", g1, g4)
    // general intersection: 4 copies shifted to DISJOINT x-frames so the
    // pair count scales 4x exactly
    def rect1 = graft.GeoData.rectCustomer(spark, dir)
    def nat1 = graft.GeoData.polyNation(spark, dir)
      .select(col("pid").as("rid"), col("x0"), col("y0"), col("x1"),
        col("y1"))
    def shift4(df: DataFrame) = (0 until 4).map { i =>
      df.select((col("rid") + i * 1000000L).as("rid"),
        (col("x0") + i * 200.0).as("x0"), col("y0"),
        (col("x1") + i * 200.0).as("x1"), col("y1"))
    }.reduce(_ union _)
    def pt(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      struct(x.as("x"), y.as("y"))
    def generalArea(a: DataFrame, b: DataFrame): Long = {
      val midX = (col("ax0") + col("ax1")) / 2.0
      val notchY = col("ay0") + (col("ay1") - col("ay0")) * 0.25
      val subject = array(
        pt(col("ax0"), col("ay0")), pt(col("ax1"), col("ay0")),
        pt(col("ax1"), col("ay1")), pt(midX, notchY),
        pt(col("ax0"), col("ay1")))
      val clip = array(
        pt(col("bx1"), col("by0")), pt(col("bx1"), col("by0") + 10.0),
        pt(col("bx0") + 8.0, col("by0") + 10.0),
        pt(col("bx0") + 8.0, col("by1")),
        pt(col("bx0"), col("by1")), pt(col("bx0"), col("by0")))
      graft.operators.Rects.intersectPairs(a, b, cellSize = 20.0)
        .withColumn("m", graft.geom.GeneralClipAreaMicro(subject, clip))
        .filter(col("m") =!= 0L).count()
    }
    val h1 = time("generalclip 1x")(generalArea(rect1, nat1))
    val h4 = time("generalclip 4x")(generalArea(shift4(rect1), shift4(nat1)))
    ratio("generalclip", h1, h4)
    // line k-means: corpus 1x vs 4x, k and iterations fixed
    val i1 = time("kmeans 1x")(graft.operators.MatchLines
      .kmeansDescriptors(lines(verts1), 16, 2).count())
    val i4 = time("kmeans 4x")(graft.operators.MatchLines
      .kmeansDescriptors(lines(verts4), 16, 2).count())
    ratio("kmeans", i1, i4)
    // ---- round-6 operators ----
    // SSSP isochrone: 4x the grid CELLS (2x per edge). Rounds grow with
    // graph diameter (~2x), per-round work with frontier size — so the
    // honest expectation for this iterative op is ~O(cells * diameter):
    // super-linear in cells, but each round stays one bounded shuffle.
    def sssp(cols: Long, rows: Long): Long = {
      val src = spark.range(1).select(lit(cols / 2).as("cx"),
        lit(rows / 2).as("cy"))
      graft.operators.Contour.shortestPaths(
        graft.operators.Contour.roadGridEdges(spark, cols, rows), src)
        .count()
    }
    val j1 = time("sssp 1x (32x32)")(sssp(32, 32))
    val j4 = time("sssp 4x (64x64)")(sssp(64, 64))
    ratio("sssp", j1, j4)
    // two-level packing: 4x docs, shard count fixed — the heavy window
    // runs per (lang, shard), so growth lands on parallel tasks
    def pack(d: DataFrame): Long = {
      val toks = ceil(length(col("text")).cast("double") / lit(4.0))
        .cast("long")
      val base = d.select(col("doc_id"),
          (abs(hash(col("doc_id"))) % 97).cast("string").as("lang"),
          toks.as("tokens"))
      base.withColumn("shard", (col("doc_id") % 8).cast("int"))
        .groupBy("lang", "shard")
        .agg(sum("tokens").as("t")).count()
    }
    val k1 = time("pack-shards 1x")(pack(docs1))
    val k4 = time("pack-shards 4x")(pack(docs4))
    ratio("pack-shards", k1, k4)
    spark.stop()
  }
}

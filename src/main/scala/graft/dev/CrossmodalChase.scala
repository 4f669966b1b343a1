package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r16 chase of the crossmodal 71/72 repost pair (VERDICT r15 item 7):
  * the PipelineOpsSpec repost stratum asserts >=90% of planted twins
  * fire BOTH arms; one pair fired only one. This probe reconstructs
  * the ground truth for every repost twin that is NOT "both":
  *   - image arm: the two dHash signatures, exact hamming, and the
  *     per-band xor popcounts — a pair with hamming <= 10 but no
  *     all-zero 15-bit band is the BAND-PIGEONHOLE miss (guaranteed
  *     recall only at hamming <= 3 with 4 bands);
  *   - text arm: exact 16-shingle jaccard of the two captions, the
  *     minhash est if a band fired, and the analytic band-miss
  *     probability (1 - j^4)^16 — a pair under minEst=0.2 or unlucky
  *     across all 16 bands is the MINHASH-BOUNDARY miss.
  * Output names the cause so the spec comment can state it.
  */
object CrossmodalChase {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")

    val rows = graft.queries.DedupQueries.qDedupCrossmodal(spark, dir)
      .collect()
    val repost = rows.filter(r =>
      r.getAs[Long]("idb") == r.getAs[Long]("ida") + 10000000L)
    val bad = repost.filter(_.getAs[String]("agreement") != "both")
    println(s"CHASE repost twins=${repost.length} " +
      s"both=${repost.count(_.getAs[String]("agreement") == "both")} " +
      s"misses=${bad.length}")

    val docs = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id").cast("long").as("doc_id"),
        lower(col("text")).as("cap")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

    def shingles(s: String): Set[String] =
      if (s.length < 16) Set(s)
      else (0 to s.length - 16).map(i => s.substring(i, i + 16)).toSet

    bad.foreach { r =>
      val ida = r.getAs[Long]("ida") // base doc id
      val d = ida
      // image arm ground truth (repost: img offsets 0 vs +700)
      val sigA = graft.operators.ImageHash.dhash60(
        graft.operators.Multimodal.decodeBmp(
          graft.operators.ImageHash.synthGroupBmpBytes(d)))
      val sigB = graft.operators.ImageHash.dhash60(
        graft.operators.Multimodal.decodeBmp(
          graft.operators.ImageHash.synthGroupBmpBytes(d + 700L)))
      val xor = sigA ^ sigB
      val ham = java.lang.Long.bitCount(xor)
      val bandXor = (0 until 4).map(j =>
        java.lang.Long.bitCount((xor >> (j * 15)) & 0x7FFFL))
      // text arm ground truth (repost caption = base + " repost")
      val capA = docs(d)
      val capB = capA + " repost"
      val (sa, sb) = (shingles(capA), shingles(capB))
      val j = sa.intersect(sb).size.toDouble / sa.union(sb).size
      val bandMissP = math.pow(1 - math.pow(j, 4), 16)
      val cause =
        if (!r.getAs[Boolean]("image_hit") && ham <= 10 && bandXor.forall(_ > 0))
          "IMAGE band pigeonhole: hamming<=10 but every 15-bit band differs"
        else if (!r.getAs[Boolean]("image_hit") && ham > 10)
          s"IMAGE threshold: true hamming $ham > 10 (planting, not banding)"
        else if (!r.getAs[Boolean]("text_hit") && j < 0.2)
          f"TEXT minEst boundary: true jaccard $j%.3f < 0.2"
        else if (!r.getAs[Boolean]("text_hit"))
          f"TEXT band miss: jaccard $j%.3f, analytic miss P=$bandMissP%.4f"
        else "UNEXPLAINED"
      println(f"CHASE pair ($ida,${ida + 10000000L}) agreement=" +
        s"${r.getAs[String]("agreement")} " +
        f"ham=$ham bandXor=${bandXor.mkString("/")} " +
        f"jaccard=$j%.3f capLen=${capA.length} missP=$bandMissP%.4f -> $cause")
    }
    spark.stop()
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Audio landmark fingerprinting — the AUDIO member of the dedup /
  * retrieval family (the Shazam/Philips shape: Wang 2003 constellation
  * matching over Haitsma–Kalker 2002 frame sub-fingerprints): per-frame
  * spectral sub-fingerprint → (fp, fp', Δt) landmark hashes →
  * inverted-index equi-join → per-(query, track, offset) vote count →
  * best match. A query snippet (a sub-range of a track's frames) must
  * come back as its source track at the right offset.
  *
  * Determinism engineering: the spectrum is an integer WALSH–HADAMARD
  * sequency transform, not a float DFT — W_k = Σ_i s_i·(−1)^popcount(i∧k)
  * is exact 64-bit arithmetic, so the sub-fingerprint (the packed
  * (W_0, W_32) pair: DC + mid-sequency — the two coefficients that
  * carry this corpus's phase and wrap-position information) is
  * bit-replayable in the DuckDB oracle, where libm cos/sin parity
  * between engines could flip near-equal bins. Same move as the
  * rational sigmoid / integer-nano gradients: swap the transcendental
  * for an exact kernel with the same analytical role.
  *
  * Scale design: frames/WHT are one row-local pass over the REAL
  * decoded WAV bytes (the container walk is genuine, as in every codec
  * row); landmarks are per-track lead windows (partition = track,
  * bounded by track length); matching is an equi-join on the landmark
  * hash — the inverted-index shape, never cross-correlation — with
  * votes map-side combined and the best match per query a k=1
  * bounded-heap aggregate, not a rank window. */
object AudioFp {

  case class FrameKey(doc_id: Long, f: Long, w0: Long, w32: Long)

  private val FrameLen = 64
  private val P = 1000000007L

  /** Real WAV decode → non-overlapping 64-sample frames → exact integer
    * WHT coefficients W_0 (DC) and W_32 (mid-sequency). */
  def frameKeys(docs: DataFrame): DataFrame = {
    implicit val encL = Encoders.scalaLong
    implicit val encF = Encoders.product[FrameKey]
    docs.select(col("doc_id").cast("long")).as[Long]
      .mapPartitions(_.flatMap { d =>
        val (_, s) = Multimodal.decodeWavSamples(Multimodal.synthWavBytes(d))
        val nFrames = s.length / FrameLen
        Iterator.range(0, nFrames).map { f =>
          var w0 = 0L
          var w32 = 0L
          var i = 0
          while (i < FrameLen) {
            val v = s(f * FrameLen + i).toLong
            w0 += v
            // popcount(i & 32) parity = bit 5 of i
            if ((i & 32) == 0) w32 += v else w32 -= v
            i += 1
          }
          FrameKey(d, f.toLong, w0, w32)
        }
      }).toDF()
  }

  /** Landmark index + snippet queries + vote match. Queries are tracks
    * with doc_id % 10 == 3, snipped to frames 1..3 (re-based to 0) —
    * the match must return (track = qid, dt = 1). */
  def fingerprintMatch(docs: DataFrame): DataFrame = {
    // sub-fingerprint: exact (w0, w32) packed then folded mod P — hash
    // collisions are part of any real fingerprint; votes absorb them
    val kpm = pmod((col("w0") + 65536L) * 262144L + (col("w32") + 65536L),
      lit(P))
    val pk = frameKeys(docs)
      .select(col("doc_id"), col("f"), kpm.as("kpm"))
      .localCheckpoint() // 3 lead windows below
    val w = Window.partitionBy("doc_id").orderBy("f")
    val lm = (1 to 3).map { dlt =>
      pk.select(col("doc_id"), col("f").as("t"), col("kpm").as("k1"),
        lead(col("kpm"), dlt).over(w).as("k2"),
        lit(dlt.toLong).as("dlt"))
    }.reduce(_ unionByName _)
      .filter(col("k2").isNotNull)
      .select(col("doc_id"), col("t"), col("dlt"),
        (pmod(col("k1") * 2654435761L + col("k2"), lit(P)) * 4L
          + col("dlt")).as("h"))
      .localCheckpoint() // consumed as index AND query subset
    val q = lm
      .filter(col("doc_id") % 10 === 3 && col("t") >= 1 &&
        (col("t") + col("dlt")) <= 3)
      .select(col("doc_id").as("qid"), (col("t") - 1L).as("tq"), col("h"))
    val votes = q
      .join(lm.select(col("doc_id").as("track"), col("t").as("ti"),
        col("h")), Seq("h"))
      .groupBy(col("qid"), col("track"),
        (col("ti") - col("tq")).as("dt"))
      .agg(count(lit(1)).as("votes"))
    // best match: k=1 bounded heap by (votes desc, track asc, dt asc);
    // dt in [-2, 6] here, +8 keeps the tie encode monotone
    val enc = col("track") * 16L + (col("dt") + 8L)
    votes.groupBy("qid")
      .agg(graft.functions.TopKAgg(-col("votes").cast("double"), enc, enc,
        1).as("tk"))
      .select(col("qid"),
        element_at(col("tk"), 1).getField("payload").as("e"),
        (-element_at(col("tk"), 1).getField("key")).cast("long")
          .as("votes"))
      .select(col("qid"), floor(col("e") / 16L).cast("long").as("track"),
        (pmod(col("e"), lit(16L)) - 8L).as("dt"), col("votes"))
      .withColumn("hit", col("track") === col("qid") && col("dt") === 1L)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Perceptual-hash image near-dup detection (dHash): the IMAGE member
  * of the dedup family (SURVEY §2 rows 28-31 cover text, row 47
  * embeddings — a multimodal curation pipeline dedups images too).
  *
  * Pipeline, every step on real bytes: group-keyed synthetic corpus
  * encoded as REAL BMP files -> [[Multimodal.decodeBmp]] -> integer
  * luma (299r+587g+114b)/1000 -> 11x6 nearest-neighbor gray grid ->
  * 60-bit difference hash (bit set when the right neighbor is
  * brighter; 6 rows x 10 horizontal gradients) -> 4x15-bit band
  * buckets -> in-bucket candidate pairs -> exact Hamming verify.
  *
  * 60 bits, not the classic 64: DuckDB's BIGINT `<<` range-checks, so
  * bit 63 can't be built portably — the same reason
  * [[Dedup.simhashPairs]] uses a 60-bit signature. Band layout and the
  * min-band pair dedup are identical to simhash.
  *
  * Scale story (100 TB): the corpus never meets itself whole — pairs
  * exist only inside (band, value) buckets, an equi-join shuffle of
  * O(n * 4) rows; gradient-sign hashes bucket visually-similar images
  * together regardless of uniform brightness shifts (a global
  * brightness delta cancels in every gradient comparison, the dHash
  * robustness property the spec test pins).
  *
  * Reference tie-in: gpd_lite_toolbox has no raster path; this extends
  * the multimodal rows the same way the codec operators do.
  */
object ImageHash {

  /** Corpus group key: images in a group share dims + base pattern. */
  def groupOf(d: Long): Long = d % 100

  private def chan(gk: Long, mult: Long, mx: Int, my: Int,
                   x: Int, y: Int): Int =
    (40 + (gk * mult + x * mx + y * my) % 170).toInt

  /** Per-doc sparse perturbation: `d % 4` pixels get +40 on every
    * channel (positions derived from d). Channels stay in 40..249 —
    * no mod-256 wrap, so a bump changes gradients only locally. */
  private def bumped(d: Long, w: Int, h: Int, x: Int, y: Int): Boolean = {
    val m = (d % 4).toInt
    var j = 0
    var hit = false
    while (j < m && !hit) {
      if (((d * 13 + j * 7) % w).toInt == x
        && ((d * 17 + j * 11) % h).toInt == y) hit = true
      j += 1
    }
    hit
  }

  /** Group-keyed REAL BMP: base pattern from the group key, sparse
    * per-doc bumps — in-group images are genuine near-duplicates. */
  def synthGroupBmpBytes(d: Long): Array[Byte] = {
    val gk = groupOf(d)
    val w = (8 + gk % 9).toInt
    val h = (8 + gk % 5).toInt
    Multimodal.writeBmp24(w, h, (x, y) => {
      val b = if (bumped(d, w, h, x, y)) 40 else 0
      (chan(gk, 3, 29, 23, x, y) + b,
        chan(gk, 11, 17, 5, x, y) + b,
        chan(gk, 7, 13, 31, x, y) + b)
    })
  }

  /** 60-bit dHash of a decoded image: 11x6 nearest-sampled luma grid
    * (sx = x*w/11, sy = y*h/6, integer division), bit y*10+x set when
    * grid(x+1, y) > grid(x, y). */
  def dhash60(img: Multimodal.BmpImage): Long = {
    val g = Array.ofDim[Int](6, 11)
    var y = 0
    while (y < 6) {
      var x = 0
      while (x < 11) {
        val sx = x * img.width / 11
        val sy = y * img.height / 6
        val base = (sy * img.width + sx) * 3
        g(y)(x) = (299 * img.rgb(base) + 587 * img.rgb(base + 1)
          + 114 * img.rgb(base + 2)) / 1000
        x += 1
      }
      y += 1
    }
    var sig = 0L
    y = 0
    while (y < 6) {
      var x = 0
      while (x < 10) {
        if (g(y)(x + 1) > g(y)(x)) sig |= 1L << (y * 10 + x)
        x += 1
      }
      y += 1
    }
    sig
  }

  final case class ImgSig(doc_id: Long, sig: Long)

  /** doc -> encode real BMP -> decode -> dHash. Row-local
    * (mapPartitions, no shuffle). */
  def imageSignatures(docs: DataFrame): DataFrame = {
    implicit val encL = Encoders.scalaLong
    implicit val encS = Encoders.product[ImgSig]
    docs.select(col("doc_id").cast("long")).as[Long]
      .mapPartitions(_.map(d => ImgSig(d,
        dhash60(Multimodal.decodeBmp(synthGroupBmpBytes(d))))))
      .toDF()
  }

  final case class ItemImg(item_id: Long, img: Long)

  /** Signatures for an ITEM table whose image id is decoupled from the
    * item id ((item_id, img) — the cross-modal dedup shape: the same
    * image may be re-posted under many items). Row-local. */
  def imageSignaturesItems(items: DataFrame): DataFrame = {
    implicit val encP = Encoders.product[ItemImg]
    implicit val encS = Encoders.product[ImgSig]
    items.select(col("item_id").cast("long"), col("img").cast("long"))
      .as[ItemImg]
      .mapPartitions(_.map(p => ImgSig(p.item_id,
        dhash60(Multimodal.decodeBmp(synthGroupBmpBytes(p.img))))))
      .toDF()
  }

  /** Near-dup image pairs: 4x15-bit band equi-join + min-band pair
    * dedup (pair survives only in the first agreeing band — no
    * dropDuplicates shuffle), exact Hamming verify. */
  def dhashPairs(docs: DataFrame, maxHamming: Int): DataFrame =
    dhashPairsOfSigs(imageSignatures(docs), maxHamming)

  /** Same band join + verify over an already-built signature table
    * ((doc_id, sig) — from imageSignatures or imageSignaturesItems). */
  def dhashPairsOfSigs(sigsIn: DataFrame, maxHamming: Int): DataFrame = {
    val sigs = sigsIn
    def bandOf(sig: Column, j: Int): Column =
      shiftright(sig, j * 15).bitwiseAND(lit(0x7FFFL))
    val bandVals = array((0 until 4).map(j => bandOf(col("sig"), j)): _*)
    val banded = sigs.select(col("doc_id"), col("sig"),
      posexplode(bandVals).as(Seq("band", "bv")))
    val a = banded.select(col("band"), col("bv"),
      col("doc_id").as("ida"), col("sig").as("siga"))
    val b = banded.select(col("band"), col("bv"),
      col("doc_id").as("idb"), col("sig").as("sigb"))
    val firstMatchingBand = (0 until 4).reverse
      .foldLeft(lit(-1): Column) { (els, j) =>
        when(bandOf(col("siga"), j) === bandOf(col("sigb"), j), j)
          .otherwise(els)
      }
    a.join(b, Seq("band", "bv"))
      .filter(col("ida") < col("idb"))
      .filter(col("band") === firstMatchingBand)
      .withColumn("hamming",
        bit_count(col("siga").bitwiseXOR(col("sigb"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("ida", "idb", "hamming")
  }
}

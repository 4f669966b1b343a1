package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Content-type sniffing over REAL bytes — the dispatch layer a
  * multimodal ingest runs FIRST: 100 TB of mixed crawl payloads routes
  * to decoders by MAGIC BYTES, never by file extension (extensions lie;
  * the bytes don't). This ties the codec family together end to end:
  * each doc synthesizes a genuine container from one of the NINE real
  * codecs in this repo (PDF/WAV/BMP/PNG/JPEG/MP4/MP3/H.264/TIFF), the
  * sniffer identifies it from the leading bytes alone, and a planted
  * TAMPER stratum (doc_id % 17 == 0: bytes 0 and 4 xor 0x55 — byte 4
  * because MP4's signature lives at offset 4, not 0) must come out
  * 'unknown', never mis-routed: a sniffer that cannot say unknown
  * sends corrupt bytes into the wrong decoder at scale.
  *
  * Rule order matters and is part of the contract: MP4's `ftyp` at
  * offset 4 is checked BEFORE H.264's Annex-B `00 00 00 01` start code
  * (an MP4 leading a 64-bit-largesize box would alias the start code);
  * JPEG's FF D8 FF before MP3's frame sync (FF Ex) for the same
  * prefix-aliasing reason. Row-local scan -> map, no shuffle. */
object Sniff {

  case class SniffRow(doc_id: Long, fmt_true: String, detected: String,
                      tampered: Boolean, is_match: Boolean)

  val Formats: Seq[String] = Seq("pdf", "wav", "bmp", "png", "jpeg",
    "mp4", "mp3", "h264", "tiff")

  private[graft] def synthFor(fmt: String, d: Long): Array[Byte] =
    fmt match {
      case "pdf"  => Pdf.synthPdfBytes(d)
      case "wav"  => Multimodal.synthWavBytes(d)
      case "bmp"  => Multimodal.synthBmpBytes(d)
      case "png"  => Multimodal.synthPngBytes(d)
      case "jpeg" => Jpeg.synthJpegBytes(d)
      case "mp4"  => Multimodal.synthMp4Bytes(d)
      case "mp3"  => Multimodal.synthMp3Bytes(d)
      case "h264" => H264.synthH264Bytes(d)
      case "tiff" => Exif.synthTiffBytes(d)
    }

  private def has(b: Array[Byte], at: Int, s: String): Boolean =
    b.length >= at + s.length &&
      s.indices.forall(i => b(at + i) == s.charAt(i).toByte)

  /** Magic-byte classifier. Returns 'unknown' rather than guessing —
    * the property the tamper stratum pins. */
  def sniff(b: Array[Byte]): String = {
    if (b.length < 12) "unknown"
    else if (has(b, 0, "%PDF")) "pdf"
    else if (has(b, 0, "RIFF") && has(b, 8, "WAVE")) "wav"
    else if (has(b, 0, "BM")) "bmp"
    else if (b(0) == 0x89.toByte && has(b, 1, "PNG")) "png"
    else if (b(0) == 0xff.toByte && b(1) == 0xd8.toByte &&
      b(2) == 0xff.toByte) "jpeg"
    else if (has(b, 4, "ftyp")) "mp4" // BEFORE the Annex-B rule
    else if (has(b, 0, "ID3") ||
      (b(0) == 0xff.toByte && (b(1) & 0xe0) == 0xe0)) "mp3"
    else if (b(0) == 0 && b(1) == 0 && b(2) == 0 && b(3) == 1) "h264"
    else if ((b(0) == 'I' && b(1) == 'I' && b(2) == 42 && b(3) == 0) ||
      (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && b(3) == 42)) "tiff"
    else "unknown"
  }

  def sniffRow(d: Long): SniffRow = {
    val fmt = Formats(((d % 9) + 9).toInt % 9)
    val bytes = synthFor(fmt, d)
    val tampered = d % 17 == 0
    if (tampered) {
      bytes(0) = (bytes(0) ^ 0x55).toByte
      bytes(4) = (bytes(4) ^ 0x55).toByte
    }
    val det = sniff(bytes)
    SniffRow(d, fmt, det, tampered, det == fmt)
  }

  /** Row-local generate + sniff — scan -> map, no shuffle. */
  def sniffFeatures(docs: DataFrame): DataFrame = {
    implicit val encL = Encoders.scalaLong
    implicit val encF = Encoders.product[SniffRow]
    docs.select(col("doc_id").cast("long")).as[Long]
      .mapPartitions(_.map(sniffRow))
      .toDF()
  }
}

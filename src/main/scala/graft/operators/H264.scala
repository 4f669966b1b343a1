package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** REAL H.264/AVC bitstream STRUCTURE layer (ISO/IEC 14496-10 /
  * ITU-T H.264): what a video curation pipeline does to raw video —
  * index, validate, and characterize clips — needs the Annex-B byte
  * stream and NAL/parameter-set syntax, not the macroblock decoder:
  *
  *  - Annex-B start-code segmentation (3- and 4-byte codes),
  *  - emulation-prevention escape on write / unescape on read
  *    (00 00 0x -> 00 00 03 0x, §7.4.1.1) — load-bearing here: the
  *    synthetic payloads deliberately contain zero runs that MUST be
  *    escaped for the stream to parse back,
  *  - exp-Golomb ue(v)/se(v) coding both directions (se exercises
  *    negative values via pic_init_qp_minus26),
  *  - SPS / PPS / slice-header parsing with the real cross-NAL
  *    dependency: the slice header's frame_num field width is
  *    log2_max_frame_num_minus4 + 4 FROM THE SPS, so slices are
  *    unparseable without carrying parameter-set state.
  *
  * The macroblock/residual payload stays out (DSP, same boundary the
  * MP3 walker draws at its subband floor) — slice RBSP beyond the
  * header is opaque payload whose escaped length is measured, not
  * decoded. Reference analogue: none (gpd_lite_toolbox is
  * geometry-only); this is the engine's video member of the multimodal
  * family (SURVEY §2).
  *
  * Scale: generation + parse are row-local (mapPartitions, no state
  * across docs, no shuffle) — the plan is scan -> flatMap, embarrassing
  * parallel at any corpus size.
  */
object H264 {

  case class H264Features(doc_id: Long, n_nals: Long, width: Long,
                          height: Long, level_idc: Long, init_qp: Long,
                          n_slices: Long, n_idr: Long, sum_frame_num: Long,
                          n_epb: Long)

  // ------------------------------------------------------------ bit I/O

  private final class BitWriter {
    private val bytes = ArrayBuffer.empty[Int]
    private var cur = 0
    private var nbits = 0
    def putBit(b: Int): Unit = {
      cur = (cur << 1) | (b & 1); nbits += 1
      if (nbits == 8) { bytes += cur; cur = 0; nbits = 0 }
    }
    def putBits(v: Long, n: Int): Unit =
      (n - 1 to 0 by -1).foreach(i => putBit(((v >> i) & 1L).toInt))
    /** ue(v): leadingZeroBits zeros, 1, then v+1-2^lzb in lzb bits —
      * equivalently the binary form of v+1 preceded by len-1 zeros. */
    def putUe(v: Long): Unit = {
      require(v >= 0)
      val x = v + 1
      val len = 63 - java.lang.Long.numberOfLeadingZeros(x)
      putBits(0L, len) // len leading zeros
      putBits(x, len + 1)
    }
    /** se(v): mapped to ue via the spec's zig-zag (§9.1.1):
      * v>0 -> 2v-1, v<=0 -> -2v. */
    def putSe(v: Long): Unit = putUe(if (v > 0) 2 * v - 1 else -2 * v)
    /** rbsp_trailing_bits: stop bit then zero-pad to byte. */
    def trailing(): Unit = { putBit(1); while (nbits != 0) putBit(0) }
    def result(): Array[Byte] = {
      require(nbits == 0, "h264: unaligned rbsp")
      bytes.map(_.toByte).toArray
    }
  }

  private final class BitReader(rbsp: Array[Byte]) {
    private var pos = 0
    def bit(): Int = {
      require(pos < rbsp.length * 8, "h264: rbsp overrun")
      val b = (rbsp(pos >> 3) >> (7 - (pos & 7))) & 1
      pos += 1; b
    }
    def bits(n: Int): Long =
      (1 to n).foldLeft(0L)((acc, _) => (acc << 1) | bit())
    def ue(): Long = {
      var lzb = 0
      while (bit() == 0) { lzb += 1; require(lzb < 32, "h264: bad ue") }
      (1L << lzb) - 1 + bits(lzb)
    }
    def se(): Long = {
      val k = ue()
      if (k % 2 == 1) (k + 1) / 2 else -(k / 2)
    }
  }

  // ------------------------------------------- emulation prevention

  /** RBSP -> escaped NAL payload: insert 0x03 after any 00 00 followed
    * by a byte <= 3 (§7.4.1.1). Returns (escaped, n inserted). */
  private[graft] def escapeRbsp(rbsp: Array[Byte]): (Array[Byte], Int) = {
    val out = ArrayBuffer.empty[Byte]
    var zeros = 0
    var n = 0
    for (b <- rbsp) {
      if (zeros >= 2 && (b & 0xFF) <= 3) {
        out += 3.toByte; n += 1; zeros = 0
      }
      out += b
      zeros = if (b == 0) zeros + 1 else 0
    }
    (out.toArray, n)
  }

  /** Escaped NAL payload -> RBSP: strip 0x03 after 00 00. Returns
    * (rbsp, n stripped). */
  private[graft] def unescapeRbsp(esc: Array[Byte]): (Array[Byte], Int) = {
    val out = ArrayBuffer.empty[Byte]
    var zeros = 0
    var n = 0
    var i = 0
    while (i < esc.length) {
      val b = esc(i)
      if (zeros >= 2 && b == 3 && i + 1 < esc.length &&
        (esc(i + 1) & 0xFF) <= 3) {
        n += 1; zeros = 0 // emulation-prevention byte: drop
      } else {
        out += b
        zeros = if (b == 0) zeros + 1 else 0
      }
      i += 1
    }
    (out.toArray, n)
  }

  // ------------------------------------------------------- generation

  /** Per-doc clip parameters — all analytic in doc_id, so the DuckDB
    * oracle replays every parsed value. */
  private def widthMbs(d: Long) = 2 + d % 9
  private def heightMbs(d: Long) = 2 + d % 5
  private def levelIdc(d: Long) = 10 + (d % 4) * 10
  private def initQp(d: Long) = 20 + d % 16 // qp-26 in [-6, 9]: se < 0
  private def nSlices(d: Long) = 3 + d % 5
  private def log2Mfn4(d: Long) = d % 3 // frame_num width 4..6 bits
  private def zeroRuns(d: Long) = d % 4 // payload EPB forcings / slice

  private def sliceTypeOf(d: Long, i: Int): Long =
    if (i == 0) 7 else if ((d + i) % 3 == 0) 2 else 0

  private def nal(refIdc: Int, typ: Int, rbsp: Array[Byte],
                  out: ArrayBuffer[Byte]): Int = {
    out ++= Array[Byte](0, 0, 0, 1)
    out += ((refIdc << 5) | typ).toByte
    val (esc, n) = escapeRbsp(rbsp)
    out ++= esc
    n
  }

  /** Encode document `docId`'s clip as a REAL Annex-B stream: SPS, PPS,
    * then an IDR slice followed by non-IDR slices. Slice payloads embed
    * (doc_id % 4) isolated 00 00 00 runs each, so emulation prevention
    * inserts exactly one 0x03 per run — the writer asserts no OTHER
    * escapes occur (parameter-set and header bits never align a zero
    * triple for these value ranges), which keeps n_epb analytic. */
  def synthH264Bytes(docId: Long): Array[Byte] = {
    val out = ArrayBuffer.empty[Byte]
    // ---- SPS (nal_unit_type 7)
    val sps = new BitWriter
    sps.putBits(66, 8) // profile_idc: Baseline
    sps.putBits(0, 8) // constraint flags + reserved
    sps.putBits(levelIdc(docId), 8)
    sps.putUe(0) // seq_parameter_set_id
    sps.putUe(log2Mfn4(docId)) // log2_max_frame_num_minus4
    sps.putUe(2) // pic_order_cnt_type (2: no further POC fields)
    sps.putUe(1) // max_num_ref_frames
    sps.putBit(0) // gaps_in_frame_num_value_allowed
    sps.putUe(widthMbs(docId) - 1) // pic_width_in_mbs_minus1
    sps.putUe(heightMbs(docId) - 1) // pic_height_in_map_units_minus1
    sps.putBit(1) // frame_mbs_only_flag
    sps.putBit(0) // direct_8x8_inference_flag
    sps.putBit(0) // frame_cropping_flag
    sps.putBit(0) // vui_parameters_present_flag
    sps.trailing()
    var epb = nal(3, 7, sps.result(), out)
    // ---- PPS (nal_unit_type 8)
    val pps = new BitWriter
    pps.putUe(0) // pic_parameter_set_id
    pps.putUe(0) // seq_parameter_set_id
    pps.putBit(0) // entropy_coding_mode_flag (CAVLC)
    pps.putBit(0) // bottom_field_pic_order_in_frame_present
    pps.putUe(0) // num_slice_groups_minus1
    pps.putUe(0) // num_ref_idx_l0_default_active_minus1
    pps.putUe(0) // num_ref_idx_l1_default_active_minus1
    pps.putBit(0) // weighted_pred_flag
    pps.putBits(0, 2) // weighted_bipred_idc
    pps.putSe(initQp(docId) - 26) // pic_init_qp_minus26 (negative se!)
    pps.putSe(0) // pic_init_qs_minus26
    pps.putSe(0) // chroma_qp_index_offset
    pps.putBit(0) // deblocking_filter_control_present
    pps.putBit(0) // constrained_intra_pred
    pps.putBit(0) // redundant_pic_cnt_present
    pps.trailing()
    epb += nal(3, 8, pps.result(), out)
    // ---- slices (first IDR type 5, rest non-IDR type 1)
    for (i <- 0 until nSlices(docId).toInt) {
      val sl = new BitWriter
      sl.putUe(0) // first_mb_in_slice
      sl.putUe(sliceTypeOf(docId, i)) // slice_type
      sl.putUe(0) // pic_parameter_set_id
      sl.putBits(i, (log2Mfn4(docId) + 4).toInt) // frame_num (SPS width)
      if (i == 0) sl.putUe(0) // idr_pic_id (IDR only)
      // slice_qp_delta then header done for this syntax subset
      sl.putSe(0)
      sl.trailing()
      val payload = ArrayBuffer.empty[Byte]
      payload ++= sl.result()
      // opaque payload with forced emulation runs: 0xFF fences isolate
      // each 00 00 00 triple -> exactly one escape per run
      for (_ <- 0 until zeroRuns(docId).toInt) {
        payload += 0xFF.toByte; payload += 0; payload += 0; payload += 0
      }
      payload += 0xFF.toByte
      epb += nal(if (i == 0) 3 else 2, if (i == 0) 5 else 1,
        payload.toArray, out)
    }
    // generation-time guard: every escape is one of the forced runs —
    // keeps the oracle's n_epb formula exact for every doc_id
    require(epb == zeroRuns(docId) * nSlices(docId),
      s"h264: unexpected emulation pattern for doc $docId")
    out.toArray
  }

  // ---------------------------------------------------------- parsing

  /** Split an Annex-B stream at its start codes; returns (header byte,
    * escaped payload) per NAL. */
  private def splitNals(b: Array[Byte]): Seq[(Int, Array[Byte])] = {
    val starts = ArrayBuffer.empty[Int] // index AFTER each start code
    var i = 0
    while (i + 2 < b.length) {
      if (b(i) == 0 && b(i + 1) == 0) {
        if (b(i + 2) == 1) { starts += i + 3; i += 3 }
        else if (i + 3 < b.length && b(i + 2) == 0 && b(i + 3) == 1) {
          starts += i + 4; i += 4
        } else i += 1
      } else i += 1
    }
    require(starts.nonEmpty, "h264: no start code")
    starts.zipAll(starts.drop(1).map(s =>
      s - (if (b(s - 4) == 0) 4 else 3)), -1, b.length).map {
      case (s, e) =>
        require((b(s) & 0x80) == 0, "h264: forbidden_zero_bit set")
        ((b(s) & 0xFF), b.slice(s + 1, e))
    }.toSeq
  }

  /** Parse a full clip: NAL walk, parameter-set state, slice headers.
    * Every output field is checked against the real bitstream. */
  def decodeH264(docId: Long, bytes: Array[Byte]): H264Features = {
    var width = 0L; var height = 0L; var level = 0L; var log2Mfn = -1L
    var qp = 0L
    var nSl = 0L; var nIdr = 0L; var sumFn = 0L; var nEpb = 0L
    val nals = splitNals(bytes)
    for ((hdr, esc) <- nals) {
      val typ = hdr & 0x1F
      val (rbsp, stripped) = unescapeRbsp(esc)
      nEpb += stripped
      val r = new BitReader(rbsp)
      typ match {
        case 7 => // SPS
          require(r.bits(8) == 66, "h264: unexpected profile")
          r.bits(8) // constraint flags
          level = r.bits(8)
          require(r.ue() == 0, "h264: sps id")
          log2Mfn = r.ue() + 4
          require(r.ue() == 2, "h264: poc type")
          r.ue(); r.bit() // max_num_ref_frames, gaps flag
          width = (r.ue() + 1) * 16
          height = (r.ue() + 1) * 16
          require(r.bit() == 1, "h264: frame_mbs_only")
        case 8 => // PPS
          require(r.ue() == 0 && r.ue() == 0, "h264: pps/sps id")
          r.bit(); r.bit(); require(r.ue() == 0, "h264: slice groups")
          r.ue(); r.ue(); r.bit(); r.bits(2)
          qp = r.se() + 26
        case 5 | 1 => // slice (IDR / non-IDR)
          require(log2Mfn > 0, "h264: slice before SPS")
          require(r.ue() == 0, "h264: first_mb_in_slice")
          r.ue() // slice_type
          require(r.ue() == 0, "h264: pps id")
          sumFn += r.bits(log2Mfn.toInt)
          nSl += 1
          if (typ == 5) { nIdr += 1; r.ue() } // idr_pic_id
        case t => throw new IllegalArgumentException(s"h264: nal $t")
      }
    }
    H264Features(docId, nals.length.toLong, width, height, level, qp,
      nSl, nIdr, sumFn, nEpb)
  }

  /** Per-doc H.264 structure features over the synthetic corpus —
    * row-local generate + parse, no shuffle. */
  def h264Features(docs: DataFrame): DataFrame = {
    implicit val encL = Encoders.scalaLong
    implicit val encF = Encoders.product[H264Features]
    docs.select(col("doc_id").cast("long")).as[Long]
      .mapPartitions(_.map(d => decodeH264(d, synthH264Bytes(d))))
      .toDF()
  }
}

package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** TIFF 6.0 / Exif metadata extraction — the camera-metadata sidecar an
  * image curation pipeline reads before it ever decodes pixels
  * (orientation decides the rotate, DateTime the dedup window, ISO the
  * quality prior). Structures follow the public TIFF 6.0 specification
  * (Adobe, 1992) and Exif 2.3 (JEITA CP-3451): byte-order mark
  * (II little / MM big — BOTH exercised, doc_id parity picks), magic
  * 42, IFD walks, 12-byte directory entries with inline values
  * (left-justified in the 4-byte field, a classic parser trap) vs
  * offset-addressed values (ASCII strings, RATIONALs), and the private
  * Exif sub-IFD reached through tag 0x8769.
  *
  * The engine side does the REAL byte work — synthesis writes a
  * spec-shaped file per doc (word-aligned value offsets, as TIFF
  * requires), the parser walks it generically (type dispatch on
  * SHORT/LONG/ASCII/RATIONAL, endian-aware, malformed input fails
  * loudly); the oracle re-derives every field analytically from the
  * same doc_id arithmetic — generation and extraction check each other
  * (the corpus-wide codec contract, same as BMP/WAV/JPEG).
  */
object Exif {

  // entry types (TIFF 6.0 §2)
  private val TAscii = 2
  private val TShort = 3
  private val TLong = 4
  private val TRational = 5

  case class ExifRow(doc_id: Long, byte_order: String, width: Long,
                     height: Long, orientation: Long, make: String,
                     datetime_day: Long, iso: Long, fnum_x10: Long)

  /** Synthesize one spec-shaped TIFF: IFD0 (width, height, orientation,
    * Make, DateTime, ExifIFD pointer) + Exif sub-IFD (FNumber, ISO). */
  def synthTiffBytes(d: Long): Array[Byte] = {
    val little = d % 2 == 0
    val bb = ByteBuffer.allocate(150)
      .order(if (little) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    val mark = if (little) "II" else "MM"
    bb.put(mark.charAt(0).toByte).put(mark.charAt(1).toByte)
    bb.putShort(42)
    bb.putInt(8) // IFD0 right after the header
    // value layout (word-aligned, data area after both IFDs):
    //   IFD0 @8 (2 + 6*12 + 4 = 78) -> exif IFD @86 (2 + 2*12 + 4 = 30)
    //   make @116 (5 + 1 pad), datetime @122 (20), fnumber @142 (8)
    val (offExif, offMake, offDt, offFn) = (86, 116, 122, 142)
    def entryShort(tag: Int, v: Int): Unit = {
      bb.putShort(tag.toShort); bb.putShort(TShort.toShort); bb.putInt(1)
      bb.putShort(v.toShort); bb.putShort(0) // inline, left-justified
    }
    def entryOffset(tag: Int, typ: Int, count: Int, off: Int): Unit = {
      bb.putShort(tag.toShort); bb.putShort(typ.toShort)
      bb.putInt(count); bb.putInt(off)
    }
    // IFD0
    bb.putShort(6)
    entryShort(0x0100, (640 + (d % 7) * 80).toInt)
    entryShort(0x0101, (480 + (d % 5) * 60).toInt)
    entryShort(0x0112, (1 + d % 8).toInt)
    entryOffset(0x010f, TAscii, 5, offMake)
    entryOffset(0x0132, TAscii, 20, offDt)
    entryOffset(0x8769, TLong, 1, offExif) // value IS the sub-IFD offset
    bb.putInt(0) // no next IFD
    // Exif sub-IFD
    assert(bb.position() == offExif)
    bb.putShort(2)
    entryOffset(0x829d, TRational, 1, offFn)
    entryShort(0x8827, (100 * (1 + d % 7)).toInt)
    bb.putInt(0)
    // data area
    assert(bb.position() == offMake)
    bb.put(s"cam${d % 5}".getBytes("US-ASCII")).put(0.toByte)
    bb.put(0.toByte) // alignment pad
    assert(bb.position() == offDt)
    bb.put(f"2024:01:${1 + d % 28}%02d 10:00:00".getBytes("US-ASCII"))
      .put(0.toByte)
    assert(bb.position() == offFn)
    bb.putInt((28 + d % 10).toInt).putInt(10)
    bb.array()
  }

  // ------------------------------------------------ multi-IFD chain (r12)

  case class TiffPageRow(doc_id: Long, page: Long, n_pages: Long,
                         byte_order: String, width: Long, height: Long,
                         orientation: Long, make: String)

  private[graft] def tiffPages(d: Long): Int = (1 + d % 3).toInt

  /** Multi-page TIFF: 1-3 IFDs chained through the NEXT-IFD pointer —
    * the structure multi-page scans/faxes actually ship (TIFF 6.0 §2,
    * PageNumber tag 0x0129). Offsets are MEASURED during assembly (the
    * xref/stco move); PageNumber is a count=2 SHORT whose BOTH values
    * ride inline in the 4-byte field — a parser case the single-value
    * corpus never exercised. Only IFD0 carries the Make string, so the
    * offset-addressed ASCII path stays exercised beside the chain. */
  def synthTiffMultiBytes(d: Long): Array[Byte] = {
    val little = d % 2 == 0
    val np = tiffPages(d)
    // per-page IFD: IFD0 has 5 entries (w/h/orient/page/make), others 4
    def ifdSize(p: Int): Int = 2 + (if (p == 0) 5 else 4) * 12 + 4
    val offs = new Array[Int](np)
    offs(0) = 8
    for (p <- 1 until np) offs(p) = offs(p - 1) + ifdSize(p - 1)
    val offMake = offs(np - 1) + ifdSize(np - 1)
    val total = offMake + 6
    val bb = ByteBuffer.allocate(total)
      .order(if (little) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    val mark = if (little) "II" else "MM"
    bb.put(mark.charAt(0).toByte).put(mark.charAt(1).toByte)
    bb.putShort(42)
    bb.putInt(offs(0))
    for (p <- 0 until np) {
      assert(bb.position() == offs(p))
      bb.putShort(if (p == 0) 5 else 4)
      def entryShort(tag: Int, v: Int): Unit = {
        bb.putShort(tag.toShort); bb.putShort(TShort.toShort); bb.putInt(1)
        bb.putShort(v.toShort); bb.putShort(0)
      }
      entryShort(0x0100, (640 + ((d + p) % 7) * 80).toInt)
      entryShort(0x0101, (480 + ((d + p) % 5) * 60).toInt)
      entryShort(0x0112, (1 + (d + p) % 8).toInt)
      // PageNumber: count=2 SHORT, both values INLINE in the 4-byte field
      bb.putShort(0x0129.toShort); bb.putShort(TShort.toShort); bb.putInt(2)
      bb.putShort(p.toShort); bb.putShort(np.toShort)
      if (p == 0) {
        bb.putShort(0x010f.toShort); bb.putShort(TAscii.toShort)
        bb.putInt(5); bb.putInt(offMake)
      }
      bb.putInt(if (p + 1 < np) offs(p + 1) else 0) // next-IFD pointer
    }
    assert(bb.position() == offMake)
    bb.put(s"cam${d % 5}".getBytes("US-ASCII")).put(0.toByte)
    bb.put(0.toByte) // alignment pad
    bb.array()
  }

  /** Walk the next-IFD chain; every page's declared PageNumber must
    * match its chain position and total — a broken pointer or a
    * mis-numbered page fails loudly, never silently drops pages. */
  def parseTiffMulti(d: Long, payload: Array[Byte]): Seq[TiffPageRow] = {
    require(payload.length >= 8, "tiff: truncated header")
    val mark = new String(payload.take(2), "US-ASCII")
    val order = mark match {
      case "II" => ByteOrder.LITTLE_ENDIAN
      case "MM" => ByteOrder.BIG_ENDIAN
      case m => throw new IllegalArgumentException(s"tiff: bad mark $m")
    }
    val bb = ByteBuffer.wrap(payload).order(order)
    require((bb.getShort(2) & 0xffff) == 42, "tiff: bad magic")
    var off = bb.getInt(4)
    var make = ""
    val rows = scala.collection.mutable.ArrayBuffer.empty[TiffPageRow]
    var guard = 0
    while (off != 0) {
      require(guard < 64, "tiff: IFD chain cycle")
      guard += 1
      val ifd = readIfd(bb, off, payload.length)
      if (rows.isEmpty) make = ifd(0x010f).str
      val pn = ifd(0x0129)
      require(pn.longs.length == 2, "tiff: PageNumber arity")
      require(pn.longs(0) == rows.size, "tiff: page number out of order")
      rows += TiffPageRow(d, pn.longs(0), pn.longs(1), mark,
        ifd(0x0100).longs(0), ifd(0x0101).longs(0),
        ifd(0x0112).longs(0), make)
      // next-IFD pointer sits right after the entry table
      val n = bb.getShort(off) & 0xffff
      off = bb.getInt(off + 2 + n * 12)
    }
    require(rows.nonEmpty && rows.forall(_.n_pages == rows.size),
      "tiff: declared page total diverges from the chain")
    rows.toSeq
  }

  /** Row-local generate + chain walk — scan -> flatMap, no shuffle. */
  def tiffPageFeatures(docs: DataFrame): DataFrame = {
    implicit val encL = Encoders.scalaLong
    implicit val encF = Encoders.product[TiffPageRow]
    docs.select(col("doc_id").cast("long")).as[Long]
      .mapPartitions(_.flatMap(d =>
        parseTiffMulti(d, synthTiffMultiBytes(d))))
      .toDF()
  }

  /** One parsed IFD entry: resolved longs and/or string value. */
  private case class Entry(typ: Int, longs: Array[Long], str: String)

  /** Generic IFD walk: returns tag -> resolved entry. */
  private def readIfd(bb: ByteBuffer, off: Int,
                      fileLen: Int): Map[Int, Entry] = {
    require(off >= 0 && off + 2 <= fileLen, "tiff: IFD offset oob")
    bb.position(off)
    val n = bb.getShort & 0xffff
    require(off + 2 + n * 12 + 4 <= fileLen, "tiff: IFD truncated")
    (0 until n).map { _ =>
      val tag = bb.getShort & 0xffff
      val typ = bb.getShort & 0xffff
      val count = bb.getInt
      val valuePos = bb.position() // 4-byte value/offset field
      val entry = typ match {
        case TShort if count == 1 =>
          // inline, left-justified in the value field
          Entry(typ, Array((bb.getShort(valuePos) & 0xffff).toLong), "")
        case TShort if count == 2 =>
          // count=2 SHORTs fill the 4-byte field exactly (r12:
          // PageNumber) — both values inline, no offset indirection
          Entry(typ, Array((bb.getShort(valuePos) & 0xffff).toLong,
            (bb.getShort(valuePos + 2) & 0xffff).toLong), "")
        case TLong if count == 1 =>
          Entry(typ, Array(bb.getInt(valuePos).toLong & 0xffffffffL), "")
        case TAscii =>
          val o = bb.getInt(valuePos)
          require(o >= 0 && o + count <= fileLen, "tiff: ascii oob")
          val raw = new Array[Byte](count)
          var i = 0
          while (i < count) { raw(i) = bb.get(o + i); i += 1 }
          // NUL-terminated per spec
          Entry(typ, Array.empty, new String(raw, "US-ASCII")
            .takeWhile(_ != 0.toChar))
        case TRational if count == 1 =>
          val o = bb.getInt(valuePos)
          require(o >= 0 && o + 8 <= fileLen, "tiff: rational oob")
          Entry(typ, Array(bb.getInt(o).toLong & 0xffffffffL,
            bb.getInt(o + 4).toLong & 0xffffffffL), "")
        case _ =>
          throw new IllegalArgumentException(
            s"tiff: unsupported type $typ count $count")
      }
      bb.position(valuePos + 4)
      tag -> entry
    }.toMap
  }

  /** REAL TIFF/Exif parse: byte-order dispatch, magic check, IFD0 walk,
    * Exif sub-IFD follow, typed value resolution. */
  def parseTiff(payload: Array[Byte]): ExifRow = {
    require(payload.length >= 8, "tiff: truncated header")
    val mark = new String(payload.take(2), "US-ASCII")
    val order = mark match {
      case "II" => ByteOrder.LITTLE_ENDIAN
      case "MM" => ByteOrder.BIG_ENDIAN
      case m => throw new IllegalArgumentException(s"tiff: bad mark $m")
    }
    val bb = ByteBuffer.wrap(payload).order(order)
    require((bb.getShort(2) & 0xffff) == 42, "tiff: bad magic")
    val ifd0 = readIfd(bb, bb.getInt(4), payload.length)
    val exif = ifd0.get(0x8769) match {
      case Some(e) => readIfd(bb, e.longs(0).toInt, payload.length)
      case None => Map.empty[Int, Entry]
    }
    val dt = ifd0(0x0132).str
    ExifRow(0L, mark,
      ifd0(0x0100).longs(0), ifd0(0x0101).longs(0),
      ifd0(0x0112).longs(0), ifd0(0x010f).str,
      dt.substring(8, 10).toLong,
      exif(0x8827).longs(0),
      exif(0x829d).longs(0) * 10 / exif(0x829d).longs(1))
  }

  // ------------------------------------------- JPEG APP1 (Exif in JFIF)

  case class JpegExifRow(doc_id: Long, n_segments: Long,
                         byte_order: String, width: Long, height: Long,
                         orientation: Long, make: String, iso: Long)

  /** Minimal JPEG container carrying the Exif payload the way cameras
    * ship it (Exif 2.3 §4.5.4): SOI, APP0/JFIF, APP1 = "Exif\0\0" +
    * the TIFF structure above, a COM segment, EOI. The metadata path
    * reads ONLY the marker chain — no entropy-coded data needed, which
    * is exactly why Exif extraction is cheap at corpus scale. */
  def synthJpegExifBytes(d: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def segment(m: Int, payload: Array[Byte]): Unit = {
      marker(m)
      val len = payload.length + 2
      out.write((len >> 8) & 0xff); out.write(len & 0xff)
      out.write(payload)
    }
    marker(0xd8) // SOI
    segment(0xe0, "JFIF".getBytes("US-ASCII") ++
      Array[Byte](0, 1, 2, 0, 0, 1, 0, 1, 0, 0))
    segment(0xe1, "Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0) ++
      synthTiffBytes(d))
    segment(0xfe, s"graft doc $d".getBytes("US-ASCII"))
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** Marker walk + APP1 Exif extraction: skips non-APP1 segments (a
    * real file fronts APP1 with JFIF APP0 and trails comments), checks
    * the "Exif\0\0" identifier, and hands the embedded TIFF to the
    * standalone parser — offsets inside the TIFF are relative to ITS
    * origin, so the slice boundary is the whole correctness question
    * this wrapper adds. */
  def parseJpegExif(payload: Array[Byte]): JpegExifRow = {
    require(payload.length >= 4 && (payload(0) & 0xff) == 0xff &&
      (payload(1) & 0xff) == 0xd8, "jpeg: missing SOI")
    var pos = 2
    var nSeg = 0L
    var tiff: Array[Byte] = null
    while (pos + 1 < payload.length &&
      !((payload(pos) & 0xff) == 0xff && (payload(pos + 1) & 0xff) == 0xd9)) {
      require((payload(pos) & 0xff) == 0xff, "jpeg: lost marker sync")
      val m = payload(pos + 1) & 0xff
      require(pos + 3 < payload.length, "jpeg: truncated segment")
      val len = ((payload(pos + 2) & 0xff) << 8) | (payload(pos + 3) & 0xff)
      require(pos + 2 + len <= payload.length, "jpeg: segment oob")
      nSeg += 1
      if (m == 0xe1 && len >= 8 &&
        new String(payload, pos + 4, 4, "US-ASCII") == "Exif" &&
        payload(pos + 8) == 0 && payload(pos + 9) == 0)
        tiff = java.util.Arrays.copyOfRange(payload, pos + 10, pos + 2 + len)
      pos += 2 + len
    }
    require(tiff != null, "jpeg: no Exif APP1 segment")
    val e = parseTiff(tiff)
    JpegExifRow(0L, nSeg, e.byte_order, e.width, e.height,
      e.orientation, e.make, e.iso)
  }

  /** Corpus-wide JPEG-APP1 synth -> parse, one row per document. */
  def jpegExifFeatures(docs: DataFrame): DataFrame = {
    implicit val encL = Encoders.scalaLong
    implicit val encR = Encoders.product[JpegExifRow]
    docs.select(col("doc_id").cast("long")).as[Long]
      .mapPartitions(_.map { d =>
        parseJpegExif(synthJpegExifBytes(d)).copy(doc_id = d)
      }).toDF()
  }

  /** Corpus-wide synth -> parse, one row per document. */
  def exifFeatures(docs: DataFrame): DataFrame = {
    implicit val encL = Encoders.scalaLong
    implicit val encR = Encoders.product[ExifRow]
    docs.select(col("doc_id").cast("long")).as[Long]
      .mapPartitions(_.map { d =>
        parseTiff(synthTiffBytes(d)).copy(doc_id = d)
      }).toDF()
  }
}

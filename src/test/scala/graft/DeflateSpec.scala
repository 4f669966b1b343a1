package graft

import java.util.zip.{Deflater, Inflater}

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Deflate
import graft.operators.Deflate.{Dynamic, Fixed, Stored}

/** The codec's bit format is pinned by an INDEPENDENT implementation:
  * every stream our encoder emits must inflate under the JDK's zlib
  * (java.util.zip.Inflater), and every stream zlib's Deflater emits
  * must inflate under ours. Roundtrips through only our own code would
  * let a symmetric bug (e.g. mirrored bit order on both sides) pass.
  */
class DeflateSpec extends AnyFunSuite {

  private def jdkInflate(raw: Array[Byte]): Array[Byte] = {
    val inf = new Inflater(true) // nowrap = raw deflate
    inf.setInput(raw)
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!inf.finished()) {
      val n = inf.inflate(buf)
      if (n == 0 && inf.needsInput()) fail("JDK inflater stalled")
      out.write(buf, 0, n)
    }
    inf.end()
    out.toByteArray
  }

  private def jdkDeflate(data: Array[Byte], level: Int): Array[Byte] = {
    val d = new Deflater(level, true)
    d.setInput(data)
    d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** deterministic pseudo-text: word soup with heavy repetition (LZ77
    * matches guaranteed) plus a binary tail (all byte values appear) */
  private def sample(seed: Long, n: Int): Array[Byte] = {
    val words = Array("spark", "shuffle", "join", "scan", "batch",
      "window", "the", "a", "merge", "sort")
    val sb = new StringBuilder
    var s = seed
    while (sb.length < n) {
      s = s * 6364136223846793005L + 1442695040888963407L
      sb.append(words(((s >>> 33) % words.length).toInt)).append(' ')
    }
    val text = sb.toString.take(n).getBytes("UTF-8")
    val bin = Array.tabulate(256)(i => ((i * 7 + seed) & 0xff).toByte)
    text ++ bin
  }

  test("our deflate inflates under JDK zlib — all three block types") {
    for (mode <- Seq(Stored, Fixed, Dynamic); n <- Seq(0, 1, 5, 300, 5000, 70000)) {
      val data = sample(n + 1, n)
      val ours = Deflate.deflate(data, mode)
      assert(jdkInflate(ours).sameElements(data),
        s"mode=$mode n=$n JDK cannot inflate our stream")
    }
  }

  test("JDK deflate inflates under ours — stored, fixed and dynamic") {
    // level 0 emits stored blocks, level 1 fixed-ish, level 9 dynamic;
    // whatever block mix zlib picks, our decoder must accept it
    for (level <- Seq(0, 1, 6, 9); n <- Seq(0, 1, 300, 5000, 70000)) {
      val data = sample(n + 2, n)
      val (got, used) = Deflate.inflate(jdkDeflate(data, level))
      assert(got.sameElements(data), s"level=$level n=$n inflate mismatch")
      assert(used == jdkDeflate(data, level).length)
    }
  }

  test("own roundtrip and consumed-byte accounting") {
    for (mode <- Seq(Stored, Fixed, Dynamic)) {
      val data = sample(7, 1234)
      val enc = Deflate.deflate(data, mode)
      // trailing garbage must not be consumed (member-boundary contract)
      val padded = enc ++ Array[Byte](1, 2, 3)
      val (got, used) = Deflate.inflate(padded)
      assert(got.sameElements(data))
      assert(used == enc.length, s"mode=$mode consumed $used != ${enc.length}")
    }
  }

  test("dynamic beats fixed on skewed text; compression is real") {
    val data = ("to be or not to be that is the question " * 200).getBytes("UTF-8")
    val dyn = Deflate.deflate(data, Dynamic)
    val fix = Deflate.deflate(data, Fixed)
    assert(dyn.length < fix.length)
    assert(dyn.length < data.length / 4)
  }

  test("crc32 matches the JDK's") {
    for (n <- Seq(0, 1, 255, 10000)) {
      val data = sample(n + 3, n)
      val jdk = new java.util.zip.CRC32
      jdk.update(data)
      assert(Deflate.crc32(data) == jdk.getValue, s"n=$n")
    }
  }

  test("gzip members: FNAME roundtrip, multi-member split, CRC tamper detection") {
    val a = sample(1, 500)
    val b = sample(2, 40)
    val stream = Deflate.gzipMember(a, Dynamic, Some("a.txt")) ++
      Deflate.gzipMember(b, Stored, None) ++
      Deflate.gzipMember(Array.empty[Byte], Fixed, Some("empty"))
    val members = Deflate.gunzipAll(stream)
    assert(members.size == 3)
    assert(members(0)._1.sameElements(a) && members(0)._2.contains("a.txt"))
    assert(members(1)._1.sameElements(b) && members(1)._2.isEmpty)
    assert(members(2)._1.isEmpty && members(2)._2.contains("empty"))
    // a JDK GZIPInputStream must also accept our member framing
    val gis = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(Deflate.gzipMember(a, Dynamic, Some("x"))))
    assert(gis.readAllBytes().sameElements(a))
    // flip one payload bit -> CRC mismatch must throw
    val bad = stream.clone()
    bad(20) = (bad(20) ^ 0x40).toByte
    intercept[Exception] { Deflate.gunzipAll(bad) }
  }
}

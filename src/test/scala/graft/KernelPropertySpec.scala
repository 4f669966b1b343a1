package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{AhoCorasick, VarintKernel}

/** Property-style checks of the round-10 kernels against seeded random
  * inputs and independent naive reference implementations — the
  * oracle-SQL checks pin corpus behavior; these pin the kernels on
  * inputs the corpus never produces. */
class KernelPropertySpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(42)

  test("varint roundtrip + size law on random sorted id lists") {
    for (_ <- 1 to 200) {
      val n = rnd.nextInt(40)
      val ids = Array.iterate(rnd.nextLong(1000).abs, n)(x =>
        x + 1 + rnd.nextLong(1 << rnd.nextInt(20)).abs).take(n)
      val r = VarintKernel.roundtrip(new GenericArrayData(ids.map(Long.box)))
      assert(r.getBoolean(1), s"roundtrip failed for ${ids.toSeq}")
      // independent size law: sum of 7-bit group counts over gaps
      var prev = -1L
      var expect = 0L
      ids.foreach { x =>
        var g = x - prev; prev = x
        var b = 1L
        while (g >= 128) { g >>= 7; b += 1 }
        expect += b
      }
      assert(r.getLong(0) === expect)
    }
  }

  test("aho-corasick equals the naive per-term scan on random input") {
    val alpha = "abcd"
    def randStr(n: Int): String =
      Seq.fill(n)(alpha(rnd.nextInt(alpha.length))).mkString
    for (_ <- 1 to 100) {
      // random border-free-not-required terms: AC counts EVERY
      // occurrence, so the naive reference must too (count at every
      // start index, overlaps included)
      val terms = (1 to (1 + rnd.nextInt(5)))
        .map(_ => randStr(1 + rnd.nextInt(4))).distinct
      val text = randStr(rnd.nextInt(60))
      val auto = AhoCorasick.build(terms)
      val got = AhoCorasick.scan(UTF8String.fromString(text), auto)
      def occAll(t: String): Seq[Int] =
        (0 to text.length - t.length).filter(i => text.startsWith(t, i))
      val occ = terms.map(t => t -> occAll(t)).toMap
      val hits = occ.values.map(_.size.toLong).sum
      val nTerms = occ.values.count(_.nonEmpty).toLong
      val firstPos = occ.values.flatten.toSeq.sorted.headOption
        .map(_ + 1L).getOrElse(0L)
      assert(got.getLong(0) === hits, s"hits: terms=$terms text=$text")
      assert(got.getLong(1) === nTerms, s"nTerms: terms=$terms text=$text")
      assert(got.getLong(2) === firstPos,
        s"firstPos: terms=$terms text=$text")
    }
  }

  test("JL kernel equals the scalar fold on random vectors") {
    val dim = 16
    val kOut = 4
    val signs = Array.tabulate(kOut * dim)(i =>
      if (i % 3 == 0) 0.5 else -0.5)
    for (_ <- 1 to 50) {
      val x = Array.fill(dim)(rnd.nextDouble() * 4 - 2)
      val out = graft.functions.JlProjectKernel
        .project(new GenericArrayData(x.map(Double.box)), signs, kOut, dim)
        .toDoubleArray()
      for (j <- 0 until kOut) {
        var acc = 0.0
        for (i <- 0 until dim) acc += x(i) * signs(j * dim + i)
        // bit-identical, not approximately equal: same fold order
        assert(java.lang.Double.doubleToLongBits(out(j)) ===
          java.lang.Double.doubleToLongBits(acc))
      }
    }
  }
}

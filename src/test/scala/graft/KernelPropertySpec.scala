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

  test("winnow equals the naive per-window rightmost-min on random hashes") {
    def naive(hs: Array[Long], w: Int): Seq[Long] = {
      val n = hs.length
      val effW = math.min(w, n)
      val picks = scala.collection.mutable.LinkedHashSet[Int]()
      for (s <- 0 to n - effW) {
        var best = s
        for (i <- s until s + effW)
          if (hs(i) < hs(best) || (hs(i) == hs(best) && i > best)) best = i
        picks += best
      }
      picks.toSeq.map(i => i.toLong * 2147483648L + hs(i))
    }
    for (_ <- 1 to 300) {
      val n = 1 + rnd.nextInt(60)
      val w = 1 + rnd.nextInt(8)
      // small hash domain forces ties, exercising the rightmost rule
      val hs = Array.fill(n)(rnd.nextLong(8).abs)
      val got = graft.functions.WinnowKernel
        .select(new GenericArrayData(hs.map(Long.box)), w).toLongArray().toSeq
      assert(got === naive(hs, w), s"w=$w hs=${hs.toSeq}")
    }
  }

  test("winnowing guarantee: shared substring >= w+k-1 shares a pick") {
    val k = 8
    val w = 4
    def picks(text: String): Set[Long] = {
      val hs = graft.functions.ShingleHashKernel
        .hashes(UTF8String.fromString(text), k, 131L, 1000000007L)
      graft.functions.WinnowKernel.select(hs, w).toLongArray()
        .map(_ % 2147483648L).toSet // fingerprint value, position-free
    }
    for (t <- 1 to 100) {
      val common = Array.fill(w + k - 1)(('a' + rnd.nextInt(26)).toChar)
        .mkString // length 11 = the paper's detection threshold t
      def noise(len: Int) =
        Array.fill(len)(('0' + rnd.nextInt(10)).toChar).mkString
      val a = noise(5 + rnd.nextInt(40)) + common + noise(5 + rnd.nextInt(40))
      val b = noise(5 + rnd.nextInt(40)) + common + noise(5 + rnd.nextInt(40))
      assert(picks(a).intersect(picks(b)).nonEmpty,
        s"no shared fingerprint for common='$common'")
    }
  }

  test("ADC kernel equals the expression grid's fold on random books") {
    // naive replica of the r18 ADC expression grid: dense zero-filled
    // codebook, subspace-major element-minor ascending left fold
    val m = 8; val ksub = 8; val dsub = 8
    for (_ <- 1 to 100) {
      // random books with a DROPPED code per subspace sometimes (the
      // zero-fill path a Lloyd-emptied code leaves behind)
      val books: IndexedSeq[Seq[(Long, Array[Double])]] =
        (0 until m).map { _ =>
          (0 until ksub).filter(_ => rnd.nextInt(10) > 0).map(c =>
            (c.toLong, Array.fill(dsub)(rnd.nextDouble() * 2 - 1))).toSeq
        }
      val cb = new Array[Double](m * ksub * dsub)
      books.zipWithIndex.foreach { case (bk, s) =>
        bk.foreach { case (code, ce) =>
          System.arraycopy(ce, 0, cb, (s * ksub + code.toInt) * dsub, dsub)
        }
      }
      val presentCodes = books.map(bk => bk.map(_._1).toArray)
      val codes = (0 until m).map(s =>
        presentCodes(s)(rnd.nextInt(presentCodes(s).length))).toArray
      val qr = Array.fill(m * dsub)(rnd.nextDouble() * 2 - 1)
      val got = graft.functions.AdcKernel.dist(
        new GenericArrayData(codes.map(Long.box)),
        new GenericArrayData(qr.map(Double.box)), cb, m, ksub, dsub)
      var acc = 0.0
      for (s <- 0 until m; i <- 0 until dsub) {
        val mp = books(s).toMap
        val entry = mp.getOrElse(codes(s), new Array[Double](dsub))
        val d = qr(s * dsub + i) - entry(i)
        acc += d * d
      }
      assert(java.lang.Double.doubleToLongBits(got) ===
        java.lang.Double.doubleToLongBits(acc))
    }
  }

  test("winnow density concentrates near the 2/(w+1) expectation") {
    val w = 4
    val n = 20000
    val hs = Array.fill(n)(rnd.nextLong(1000000007L).abs)
    val got = graft.functions.WinnowKernel
      .select(new GenericArrayData(hs.map(Long.box)), w).numElements()
    val density = got.toDouble / n // expect 2/(w+1) = 0.4 on random input
    assert(density > 0.35 && density < 0.45, s"density=$density")
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ann

/** Round-18 operator specs: the indexed-MMR composition (greedy stage
  * vs an in-memory replay; the tenth-granular lambda guard) and the KN
  * trigram LM vs a from-scratch Scala replay of the same smoothing
  * arithmetic. */
class Round18Spec extends AnyFunSuite with SharedSpark {

  test("mmrRerankOn greedy == in-memory integer-space replay over a " +
    "hand-built shortlist") {
    import spark.implicits._
    // 6 corpus vectors in 64-dim (first 3 dims carry the structure);
    // two near-duplicates (1, 2) — MMR must not pick both early
    def v(xs: Double*): Seq[Double] =
      (xs ++ Seq.fill(64 - xs.length)(0.0))
    val corpus = Seq(
      (1L, v(1.0, 0.0, 0.0)), (2L, v(0.999, 0.01, 0.0)),
      (3L, v(0.7, 0.7, 0.0)), (4L, v(0.0, 1.0, 0.0)),
      (5L, v(0.5, 0.0, 0.8)), (6L, v(0.9, 0.3, 0.1)))
    val emb = corpus.toDF("vec_id", "embedding")
    val queries = Seq((100L, v(1.0, 0.1, 0.1))).toDF("vec_id", "embedding")
    val got = Ann.mmrRerank(emb, queries, shortlist = 6, k = 4,
      lambda = 0.7, dim = 64)
      .orderBy("sel_rank").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(4)))
    // replay: cos4 = round(dot/(|q||c|), 4); mmr5 integer space
    def dot(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    def nrm(a: Seq[Double]) = math.sqrt(dot(a, a))
    val q = v(1.0, 0.1, 0.1)
    val en = corpus.map { case (id, e) =>
      id -> e.map(_ / math.max(nrm(e), 1e-12))
    }.toMap
    val cos4 = corpus.map { case (id, e) =>
      id -> BigDecimal(dot(q, e) / math.max(nrm(q) * nrm(e), 1e-12))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    var sel = List[Long]()
    val exp = (1 to 4).map { sr =>
      val best = corpus.map(_._1).filterNot(sel.contains).map { id =>
        val rel = 7L * math.round(cos4(id) * 10000.0)
        val red =
          if (sel.isEmpty) 0L
          else sel.map(s => math.round(dot(en(id), en(s)) * 10000.0)).max
        (id, rel - 3L * red)
      }.minBy { case (id, m) => (-m, id) }
      sel = sel :+ best._1
      (sr.toLong, best._1, best._2)
    }
    assert(got.toSeq === exp)
  }

  test("mmrRerank refuses a lambda outside the tenth-granular integer " +
    "score space (ADVICE r17)") {
    import spark.implicits._
    val emb = Seq((1L, Seq.fill(64)(0.1))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Ann.mmrRerank(emb, emb, 1, 1, lambda = 0.65, dim = 64)
    }
    assert(e.getMessage.contains("multiple of 0.1"))
  }

  test("KN trigram LM == from-scratch Scala replay of the smoothing " +
    "arithmetic on a constructed corpus") {
    import spark.implicits._
    val docsSeq = Seq(
      (0L, "the cat sat on the mat"),
      (5L, "the cat ate the fish on the mat"),
      (10L, "a dog sat on a log near the mat"),
      (3L, "the cat sat on the mat again today"), // non-train, seen
      (7L, "quantum flux capacitors hum quietly at dawn"), // unseen
      (9L, "xy")) // < 3 words: must drop
    // write a tiny parquet dir shaped like the documents table (the
    // loader projects doc_id/text/lang/source)
    val dir = "/tmp/graft_r18_kn"
    docsSeq.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("spec"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.queries.TextQueries.qKnTrigramLm(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5))).toMap
    // ---- replay ----
    def words(t: String) = t.toLowerCase.split(" ").filter(_.nonEmpty)
    def tris(t: String) = words(t).sliding(3).filter(_.length == 3)
      .map(a => (a(0), a(1), a(2))).toSeq
    val train = docsSeq.filter(_._1 % 5 == 0).flatMap(d => tris(d._2))
    val c3 = train.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val types = c3.keySet
    val c12 = types.toSeq.groupBy(t => (t._1, t._2)).view
      .mapValues(ts => ts.map(c3).sum).toMap
    val nf12 = types.toSeq.groupBy(t => (t._1, t._2)).view
      .mapValues(_.size.toLong).toMap
    val mid = types.map(t => (t._2, t._3))
    val nmid = types.toSeq.groupBy(t => (t._2, t._3)).view
      .mapValues(_.size.toLong).toMap
    val ntot2 = mid.toSeq.groupBy(_._1).view
      .mapValues(ms => ms.map(nmid).sum).toMap
    val nf2 = mid.toSeq.groupBy(_._1).view
      .mapValues(_.size.toLong).toMap
    val cont = mid.toSeq.groupBy(_._2).view
      .mapValues(_.size.toLong).toMap
    val b23 = mid.size.toLong
    def rnd(v: Double, s: Int) = BigDecimal(v)
      .setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    for ((id, t) <- docsSeq) {
      val ts = tris(t)
      if (ts.isEmpty) assert(!got.contains(id), s"doc $id must drop")
      else {
        var bitsSum = 0.0; var unseen = 0L
        for (tr @ (_, w2, w3) <- ts) {
          val c = c3.getOrElse(tr, 0L)
          if (c == 0) unseen += 1
          val pc = (cont.getOrElse(w3, 0L) + 1.0) / (b23 + 1000.0)
          val p2 =
            if (ntot2.getOrElse(w2, 0L) > 0)
              (math.max(nmid.getOrElse((w2, w3), 0L) - 0.75, 0.0)
                + 0.75 * nf2(w2) * pc) / ntot2(w2)
            else pc
          val p3 =
            if (c12.getOrElse((tr._1, w2), 0L) > 0)
              (math.max(c - 0.75, 0.0)
                + 0.75 * nf12((tr._1, w2)) * p2) / c12((tr._1, w2))
            else p2
          bitsSum += -(math.log(p3) / math.log(2.0))
        }
        val bits = rnd(bitsSum / ts.size, 2)
        val exp = (ts.size.toLong, unseen,
          rnd(unseen.toDouble / ts.size, 4), bits,
          rnd(math.pow(2.0, bits), 2))
        assert(got(id) === exp, s"doc $id")
      }
    }
    // the unseen doc really exercised the backoff chain
    assert(got(7L)._2 === got(7L)._1, "all trigrams of doc 7 unseen")
  }
}

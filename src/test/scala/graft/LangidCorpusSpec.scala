package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFunctions._

/** Pins the out-of-repo invariant the langid oracle equivalence rests
  * on (ADVICE r12): the engine counts profile-word and char-bigram
  * hits over the FULL planted text (base corpus included) while the
  * oracle derives counts analytically from the plant arithmetic alone
  * — so every [[TextFunctions.langidProfiles]] word and every
  * [[TextFunctions.langidBigrams]] bigram must be ABSENT from the
  * generator's ambient vocabulary at every shipped sf. Verified
  * manually when the profiles were chosen; this spec makes a future
  * corpus-generator vocab change fail loudly instead of silently
  * skewing the oracle. Scans every shipped sf dir present on disk
  * (one aggregate pass per sf over the normalized PRE-plant text). */
class LangidCorpusSpec extends AnyFunSuite with SharedSpark {

  private val sfDirs = Seq("/root/testdata/sf0.001",
    "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    .filter(d => new java.io.File(s"$d/documents.parquet").exists())

  test("langid profile words and bigrams are absent from the base corpus at every shipped sf") {
    assert(sfDirs.nonEmpty, "no shipped sf dirs found")
    val words = langidProfiles.flatMap(_._2).distinct
    val bigrams = langidBigrams.flatMap(_._2).distinct
    for (dir <- sfDirs) {
      val t = norm(col("text"))
      val aggs =
        words.map(w => sum(stopwordCount(t, Seq(w))).as(s"w_$w")) ++
          bigrams.map(b => sum(reCount(t, b)).as(s"b_$b"))
      val row = spark.read.parquet(s"$dir/documents.parquet")
        .agg(aggs.head, aggs.tail: _*).collect()(0)
      words.zipWithIndex.foreach { case (w, i) =>
        assert(row.getLong(i) == 0L,
          s"profile word '$w' occurs in the ambient corpus at $dir")
      }
      bigrams.zipWithIndex.foreach { case (b, i) =>
        assert(row.getLong(words.size + i) == 0L,
          s"profile bigram '$b' occurs in the ambient corpus at $dir")
      }
    }
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the LLM-data-pipeline operators
  * (SURVEY.md §2 rows 28, 34-37). Everything is a Catalyst expression
  * composition — codegen'd, no UDFs — and every construct has an exact
  * DuckDB mirror used by the oracles (see queries.TextQueries).
  */
object TextFunctions {

  /** Whitespace-collapsed, trimmed, lowercased text — the canonical form
    * for hashing/dedup. */
  def norm(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  /** Number of whitespace-separated words; 0 for blank/whitespace-only
    * text (split of an empty string yields one empty element, which
    * would overstate blank documents by one). */
  def wordCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0L))
      .otherwise(size(split(trim(text), "\\s+")).cast("long"))

  /** Count of regex matches (non-overlapping). */
  def reCount(text: Column, pattern: String): Column =
    regexp_count(text, lit(pattern)).cast("long")

  /** Stopword hits for a list of words, as standalone-word matches. */
  def stopwordCount(text: Column, words: Seq[String]): Column =
    reCount(text, "\\b(" + words.mkString("|") + ")\\b")

  /** BPE-ish tokenizer: letter runs, digit runs, single punctuation. */
  val tokenPattern: String = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  /** Polynomial rolling hash over characters, mod 1e9+7. Sequential fold —
    * order-sensitive by design (a fingerprint, not a bag hash); exact in
    * integer space so both engines agree bit-for-bit. */
  def rollingFingerprint(text: Column): Column =
    aggregate(
      filter(split(text, ""), c => length(c) > lit(0)),
      lit(0L),
      (acc, c) => (acc * lit(31L) + ascii(c).cast("long")) % lit(1000000007L))

  /** Per-language stopword lists for the language-ID heuristic.
    * Order matters: argmax ties resolve by list order (first wins).
    * Reference analogue: gpd_lite_toolbox has no text ops — this extends
    * the engine for training-data pipelines. */
  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "a"),
    "de" -> Seq("der", "die", "und", "ein", "zu"),
    "es" -> Seq("el", "los", "las", "y", "un"),
    "fr" -> Seq("le", "les", "et", "une", "du"),
    "zh" -> Seq("shi", "bu", "wo", "zai", "you"))
}

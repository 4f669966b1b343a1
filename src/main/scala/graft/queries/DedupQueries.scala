package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Dedup

/** Near-dup queries over documents (SURVEY.md §2 rows 29-31).
  * q_dedup_ngram_jaccard has a full SQL oracle (integer set arithmetic);
  * minhash/simhash use xxhash64 (no DuckDB equivalent) → rows-only check.
  */
object DedupQueries {

  private val K = 16        // shingle width
  private val MaxDf = 20    // posting-list cap
  private val MinJac = 0.2

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))

  def qNgramJaccard(spark: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccard(docs(spark, dir), K, MaxDf, MinJac)

  def qMinhash(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashPairs(docs(spark, dir), K, numHashes = 64, bands = 16,
      minEst = 0.2)

  def qSimhash(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairs(docs(spark, dir), maxHamming = 6)

  /** Canonical doc per transitive near-dup cluster (minhash pairs as the
    * edge set). Rows-only check (minhash is engine-side). */
  def qDedupClusters(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    Dedup.dedupClusters(d,
      Dedup.minhashPairs(d, K, numHashes = 64, bands = 16, minEst = 0.2),
      iters = 3) // near-dup components are shallow; 3 hops covers them
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_ngram_jaccard" -> (qNgramJaccard _),
    "q_dedup_minhash" -> (qMinhash _),
    "q_dedup_simhash" -> (qSimhash _),
    "q_dedup_clusters" -> (qDedupClusters _))

  val oracles: Map[String, String] = Map(
    "q_dedup_ngram_jaccard" ->
      s"""WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, lower(text) AS t
         |           FROM documents),
         |sh AS (SELECT DISTINCT doc_id, substr(t, CAST(i AS INT), $K) AS s
         |       FROM d, LATERAL (SELECT unnest(generate_series(1,
         |              greatest(len(t) - ${K - 1}, 1))) AS i) u
         |       WHERE len(substr(t, CAST(i AS INT), $K)) = $K),
         |rare AS (SELECT s FROM sh GROUP BY s HAVING COUNT(*) <= $MaxDf),
         |shr AS (SELECT sh.doc_id, sh.s FROM sh JOIN rare USING (s)),
         |sizes AS (SELECT doc_id, COUNT(*) AS n FROM shr GROUP BY doc_id),
         |shared AS (
         |  SELECT a.doc_id AS ida, b.doc_id AS idb, COUNT(*) AS shared
         |  FROM shr a JOIN shr b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT ida, idb, shared, na.n AS na, nb.n AS nb,
         |  ROUND(CAST(shared AS DOUBLE)
         |      / CAST(na.n + nb.n - shared AS DOUBLE), 4) AS jac
         |FROM shared
         |JOIN sizes na ON na.doc_id = ida
         |JOIN sizes nb ON nb.doc_id = idb
         |WHERE ROUND(CAST(shared AS DOUBLE)
         |      / CAST(na.n + nb.n - shared AS DOUBLE), 4) >= $MinJac""".stripMargin)
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Ann

/** ANN queries over the embeddings table (SURVEY.md §2 rows 32-33).
  * Query set = every 50th vector. Brute-force top-k has a full SQL oracle;
  * the LSH variant is rows-only (hyperplane literals are engine-side).
  */
object AnnQueries {

  private val K = 10
  private val QueryMod = 50

  private def emb(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "embeddings")
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))

  def qCosineTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    Ann.cosineTopK(e, e.filter(col("vec_id") % QueryMod === 0), K)
  }

  def qCosineLsh(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    Ann.cosineTopKLsh(e, e.filter(col("vec_id") % QueryMod === 0), K,
      planes = 8, dim = 64)
  }

  def qCosineIvf(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    Ann.ivfTopK(e, e.filter(col("vec_id") % QueryMod === 0), K,
      nlist = 16, nprobe = 2, iters = 2)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ann_cosine_topk" -> (qCosineTopK _),
    "q_ann_lsh" -> (qCosineLsh _),
    "q_ann_ivf" -> (qCosineIvf _))

  val oracles: Map[String, String] = Map(
    "q_ann_cosine_topk" ->
      s"""WITH v AS (
         |  SELECT CAST(vec_id AS BIGINT) AS vec_id,
         |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
         |  FROM embeddings),
         |n AS (SELECT vec_id, e,
         |        sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm
         |      FROM v),
         |q AS (SELECT vec_id AS qid, e AS qe, nrm AS qn FROM n
         |      WHERE vec_id % $QueryMod = 0),
         |scored AS (
         |  SELECT q.qid, n.vec_id AS nid,
         |    ROUND(list_sum(list_transform(range(1, 65),
         |            i -> q.qe[i] * n.e[i]))
         |        / greatest(q.qn * n.nrm, 1e-12), 4) AS cos4
         |  FROM n, q WHERE q.qid <> n.vec_id)
         |SELECT qid, nid,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos4 DESC, nid)
         |    AS INT) AS rank, cos4
         |FROM scored
         |QUALIFY rank <= $K""".stripMargin)
}

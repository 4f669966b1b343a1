package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Typed faces of the engine's core row shapes (SURVEY.md §1 data model)
  * — case classes with implicit Encoders so pipelines that want
  * compile-time field safety can move between `DataFrame` and
  * `Dataset[T]` at zero cost (`as[T]` is a metadata-only operation; the
  * columnar plan and codegen are unchanged).
  *
  * The DataFrame API remains the primary surface (schemas are dynamic
  * across operators); these types cover the STABLE output shapes a
  * downstream consumer iterates over.
  */
object Types {

  /** A 2-D vertex — the element type of every ring/line array. */
  case class Pt(x: Double, y: Double)

  /** matchByHausdorff output row. */
  case class LineMatch(la: Long, lb: Long, hd: Double)

  /** kmeansDescriptors output row. */
  case class LineCluster(lid: Long, cluster: Long)

  /** Near-dup pair (minhashPairs est / simhashPairs hamming etc. carry
    * extra columns; ida/idb are the stable core). */
  case class DedupPair(ida: Long, idb: Long)

  /** dedupClusters output row. */
  case class CanonicalDoc(doc_id: Long, canonical_id: Long, is_dup: Boolean)

  /** cosineTopK / ivfTopK / cosineTopKLsh core output. */
  case class AnnMatch(qid: Long, nid: Long, rank: Int, cos4: Double)

  /** recallAtK output row. */
  case class AnnRecall(qid: Long, n_hits: Long, n_exact: Long,
                       recall: Double)

  /** decontaminate output row (r4). */
  case class Contamination(doc_id: Long, n_shingles: Long, n_hits: Long,
                           ratio: Double, flagged: Boolean)

  /** qPackSequences output row (r4). */
  case class PackedBin(lang: String, bin: Long, n_docs: Long,
                       sum_tokens: Long, fill_ratio: Double)

  /** A clipped-ring vertex (qClipRings output, r4). */
  case class RingVertex(ida: Long, idb: Long, vi: Int, x: Double, y: Double)

  /** Typed views: select the stable columns and bind the encoder. */
  def lineMatches(df: DataFrame)(implicit s: SparkSession): Dataset[LineMatch] = {
    import s.implicits._
    df.select("la", "lb", "hd").as[LineMatch]
  }

  def canonicalDocs(df: DataFrame)(implicit s: SparkSession): Dataset[CanonicalDoc] = {
    import s.implicits._
    df.select("doc_id", "canonical_id", "is_dup").as[CanonicalDoc]
  }

  def annMatches(df: DataFrame)(implicit s: SparkSession): Dataset[AnnMatch] = {
    import s.implicits._
    df.select("qid", "nid", "rank", "cos4").as[AnnMatch]
  }

  def contaminations(df: DataFrame)(implicit s: SparkSession): Dataset[Contamination] = {
    import s.implicits._
    df.select("doc_id", "n_shingles", "n_hits", "ratio", "flagged")
      .as[Contamination]
  }

  def ringVertices(df: DataFrame)(implicit s: SparkSession): Dataset[RingVertex] = {
    import s.implicits._
    df.select("ida", "idb", "vi", "x", "y").as[RingVertex]
  }
}

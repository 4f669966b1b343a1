package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode, StreamingQuery}
import org.apache.spark.sql.types._

import graft.operators.Dedup

/** STREAMING near-duplicate candidate filter: the streaming face of the
  * minhash-LSH dedup family.
  *
  * Documents arrive as a stream; each computes its LSH band keys ROW-
  * LOCALLY (Dedup.minhashBandKeysRowLocal — no shuffle-per-doc signature
  * build, which streaming could not express without event time), then
  * keyed state per (band, bucket) remembers the FIRST document that
  * claimed the bucket. Every later arrival in the same bucket is emitted
  * as a candidate near-dup pair against that anchor — the streaming
  * analogue of the batch band-bucket equi-join, with state one doc id
  * per non-empty bucket (bounded by corpus vocabulary, not stream
  * length; production deployments add a state TTL via timeout to bound
  * it by time as well).
  *
  * An ingest-order caveat the batch path does not have: the anchor is
  * the first ARRIVAL, not the minimum doc id, so pair orientation
  * depends on stream order (candidate SETS are order-independent; the
  * spec checks set equality against the batch join).
  */
object NearDupStream {

  /** Schema of the documents parquet. */
  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  case class BandKey(band: Int, bh: Long)
  case class BandDoc(band: Int, bh: Long, doc_id: Long)
  case class CandidatePair(band: Int, bh: Long, anchor_id: Long,
                           doc_id: Long)

  /** Per-bucket state transition: first doc anchors the bucket silently;
    * each later doc emits one candidate pair against the anchor. */
  def bucketStep(key: BandKey, docs: Iterator[BandDoc],
                 state: GroupState[Long]): Iterator[CandidatePair] = {
    var anchor = state.getOption.getOrElse(-1L)
    val out = scala.collection.mutable.ArrayBuffer.empty[CandidatePair]
    docs.foreach { d =>
      if (anchor < 0) anchor = d.doc_id
      else out += CandidatePair(key.band, key.bh, anchor, d.doc_id)
    }
    state.update(anchor)
    out.iterator
  }

  /** The band-key transform + keyed state, mode-agnostic up to the state
    * op; callers attach a sink. k/numHashes/bands mirror the batch
    * q_dedup_minhash parameters. */
  def candidatePairs(docs: DataFrame, k: Int = 5, numHashes: Int = 64,
                     bands: Int = 16): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    Dedup.minhashBandKeysRowLocal(docs, k, numHashes, bands)
      .select(col("band").cast("int").as("band"), col("bh"), col("doc_id"))
      .as[BandDoc]
      .groupByKey(d => BandKey(d.band, d.bh))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(bucketStep)
      .toDF()
  }

  /** Deterministic batch twin of the stream's bucket-anchor semantics:
    * same row-local band keys, same one-anchor-per-bucket candidate
    * shape, but the anchor is the bucket's MINIMUM doc id instead of
    * its first arrival (stream order does not exist in batch). The
    * candidate pair SET matches the stream run on the same corpus
    * modulo orientation (spec-asserted); this form is fully
    * deterministic, so it carries the family's CORRECTNESS row.
    * Plan: one kernel scan for signatures (checkpointed — two
    * consumers), a per-bucket min/count aggregate, and a band-bucket
    * equi-join — no all-pairs stage, the LSH scale shape. */
  def candidatePairsBatch(docs: DataFrame, k: Int = 5, numHashes: Int = 64,
                          bands: Int = 16): DataFrame = {
    val keys = Dedup.minhashBandKeysRowLocal(docs, k, numHashes, bands)
      .select(col("doc_id"), col("band").cast("long").as("band"), col("bh"))
      .localCheckpoint()
    val anchors = keys.groupBy("band", "bh")
      .agg(min("doc_id").as("anchor_id"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
      .filter(col("n") >= 2).drop("n")
    keys.join(anchors, Seq("band", "bh"))
      .filter(col("doc_id") =!= col("anchor_id"))
      .select(col("band"), col("bh"), col("anchor_id"), col("doc_id"))
  }

  /** File-source stream over a documents directory -> memory sink. */
  def nearDupStream(spark: SparkSession, dir: String,
                    queryName: String): StreamingQuery =
    candidatePairs(
      spark.readStream
        .schema(documentsSchema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(dir))
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("append")
      .start()
}

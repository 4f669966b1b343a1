package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column support for training-data
  * pipelines (SURVEY.md §2 row 38).
  *
  * Media are opaque `binary` payloads plus a typed metadata struct; the
  * decode/feature-extract step runs batch-wise inside executors via
  * `mapPartitions` over a typed Dataset (the Scala analogue of a
  * vectorized pandas UDF: one JVM call per partition, tight loop per
  * batch, no per-row SerDe to a foreign runtime).
  *
  * STUB: `decodeStub` is a deterministic fake — image/audio codecs are
  * not available in this container. The Spark-side plumbing (binary
  * schema, typed rows, per-partition batch shape, partition-preserving
  * pipeline) is real; swap `decodeStub`'s body for a codec call
  * (e.g. libjpeg/ffmpeg via JNI) to productionize.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, kind: String, payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, kind: String, n_bytes: Long,
                           checksum: Long, width: Long, height: Long)

  /** Wrap a documents table into a media table: binary payload (UTF-8
    * bytes stand in for encoded media) + modality metadata. */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").cast("long").as("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"))

  /** Deterministic fake decode: polynomial checksum over the payload
    * bytes; "decoded" dimensions derived from it. Replace with a real
    * codec for production. */
  private def decodeStub(r: MediaRow): MediaFeatures = {
    var h = 0L
    var i = 0
    while (i < r.payload.length) {
      h = (h * 131 + (r.payload(i) & 0xff)) % 1000000007L
      i += 1
    }
    MediaFeatures(r.doc_id, r.kind, r.payload.length.toLong, h,
      width = 16 + (h % 16), height = 16 + ((h / 16) % 16))
  }

  /** Batch feature extraction over the media table. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    implicit val encIn = Encoders.product[MediaRow]
    media.as[MediaRow].mapPartitions(_.map(decodeStub))
  }

  /** Frame sampling over binary payloads: every `everyN`-th fixed-size
    * frame, with offset and content hash — pure expressions (binary
    * substring + xxhash64), no UDF. For real video this is where a codec
    * would split on keyframes; the fixed-stride split is the stub, the
    * explode/slice/hash plumbing is the real distributed shape. */
  def sampleFrames(media: DataFrame, frameBytes: Int,
                   everyN: Int): DataFrame = {
    val nFrames = ceil(length(col("payload")).cast("double") / frameBytes)
      .cast("long")
    media
      .select(col("doc_id"), col("kind"), col("payload"),
        explode(sequence(lit(0L), greatest(nFrames - 1, lit(0L))))
          .as("frame_idx"))
      .filter(col("frame_idx") % everyN === 0)
      .withColumn("frame",
        expr(s"substring(payload, cast(frame_idx * $frameBytes + 1 as int), $frameBytes)"))
      .select(col("doc_id"), col("kind"), col("frame_idx"),
        length(col("frame")).cast("long").as("frame_bytes"),
        xxhash64(col("frame")).as("frame_hash"))
  }
}

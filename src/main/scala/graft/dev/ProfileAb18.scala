package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Interleaved in-session A/B for round-18 candidate changes whose
  * single-probe timings were swamped by this box's external
  * contention (load swings with no local process behind them — same
  * variance the session-3 notes record). Variants alternate A,B,A,B,…
  * inside ONE session, so slow drift hits both sides equally; decide
  * by min and by pairwise wins.
  *
  *   A/B 1 "cc"     — ConnectedComponents round: large-star distinct
  *           kept (old) vs dropped (one exchange less, duplicate rows
  *           into small-star), on the q_dedup_cc pair graph.
  *   A/B 2 "bpe"    — deep-BPE per-round merge: treeReduce (old, extra
  *           tiny shuffle stage) vs partition-adaptive plain reduce.
  *   A/B 3 "bitext" — q_bitext_recall sides: lazy in one action (old)
  *           vs overlapped via two driver threads + localCheckpoint.
  *   A/B 4 "bfs"    — Contour.shortestPaths: 1-hop (old) vs 3-hop
  *           relaxation per Bellman-Ford round.
  *   A/B 5 "cp"     — CC-family checkpoints: eager (old, kept) vs
  *           lazy localCheckpoint on the q_dedup_cc_delta and
  *           q_dedup_clusters shapes; measured a tie, eager stays.
  */
object ProfileAb18 {
  def main(args: Array[String]): Unit = {
    val only = args.toSet // empty = run all
    def want(n: String) = only.isEmpty || only.contains(n)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_AB_REPS", "4").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tune.forInput(spark, sfDir)

    def clear(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; val t = (System.nanoTime() - t0) / 1e9
      clear(); t
    }
    def ab(name: String, a: => Unit, b: => Unit): Unit = {
      // one unmeasured warm pass each
      a; clear(); b; clear()
      val ta = scala.collection.mutable.ArrayBuffer.empty[Double]
      val tb = scala.collection.mutable.ArrayBuffer.empty[Double]
      (1 to reps).foreach { _ => ta += time(a); tb += time(b) }
      val wins = ta.zip(tb).count { case (x, y) => y < x }
      println(f"[ab] $name A(old)=${ta.map(x => f"$x%.2f").mkString(",")} " +
        f"B(new)=${tb.map(x => f"$x%.2f").mkString(",")} " +
        f"minA=${ta.min}%.2f minB=${tb.min}%.2f bWins=$wins/$reps")
    }

    def exec(df: org.apache.spark.sql.DataFrame): Unit = {
      df.queryExecution.toRdd.count(); ()
    }

    // ---- A/B 1: CC large-star distinct ----
    if (want("cc")) ab("cc_lsDistinct",
      exec(ccBuild(spark, sfDir, lsDistinct = true)),
      exec(ccBuild(spark, sfDir, lsDistinct = false)))

    // ---- A/B 2: BPE treeReduce vs adaptive reduce ----
    if (want("bpe")) ab("bpe_deep_merge",
      exec(graft.queries.TextQueries.qBpeTrainDeepVia(spark, sfDir,
        forceTree = true)),
      exec(graft.queries.TextQueries.qBpeTrainDeepVia(spark, sfDir,
        forceTree = false)))

    // ---- A/B 3: bitext recall lazy vs overlapped sides ----
    if (want("bitext")) ab("bitext_overlap",
      exec(graft.queries.AnnQueries.qBitextRecallWith(spark, sfDir,
        overlap = false)),
      exec(graft.queries.AnnQueries.qBitextRecallWith(spark, sfDir,
        overlap = true)))

    // ---- A/B 4: BFS multi-hop relaxation (hops 1 = old) ----
    if (want("bfs")) ab("bfs_hops",
      exec(bfsBuild(spark, sfDir, hops = 1)),
      exec(bfsBuild(spark, sfDir, hops = 3)))

    // ---- A/B 5: CC-family checkpoint EAGER (old) vs LAZY (new) ----
    // lazy = localCheckpoint(eager = false): same LogicalRDD plan cut,
    // materialization folds into the next consuming job (converge's
    // count / the hop chain's final action) — one driver job round-trip
    // saved per star round / label hop.
    if (want("cp")) {
      ab("cc_delta_lazyCp",
        exec(ccDeltaBuild(spark, sfDir, eagerCp = true)),
        exec(ccDeltaBuild(spark, sfDir, eagerCp = false)))
      ab("clusters_lazyCp",
        exec(clustersBuild(spark, sfDir, eagerCp = true)),
        exec(clustersBuild(spark, sfDir, eagerCp = false)))
    }

    spark.stop()
  }

  /** The bench rows themselves with the eagerCp knob threaded through
    * (the qBpeTrainDeepVia pattern — no shape duplication here). */
  private def ccDeltaBuild(spark: SparkSession, dir: String,
                           eagerCp: Boolean) =
    graft.queries.DedupQueries.qDedupCcDeltaWith(spark, dir, eagerCp)

  private def clustersBuild(spark: SparkSession, dir: String,
                            eagerCp: Boolean) =
    graft.queries.DedupQueries.qDedupClustersWith(spark, dir, eagerCp)

  /** q_isochrone_bfs rebuilt with the hops knob threaded through. */
  private def bfsBuild(spark: SparkSession, dir: String, hops: Int) = {
    val pts = graft.GeoData.ptsEvents(spark, dir)
      .select(col("x"), col("y"))
    val (xmin, ymin, xmax, ymax) = graft.operators.Grid.bounds(pts)
    val rows = math.ceil((ymax - ymin) / 10.0).toLong
    val cols = math.ceil((xmax - xmin) / 10.0).toLong
    val source = spark.range(1).select(lit(cols / 2).as("cx"),
      lit(rows / 2).as("cy"))
    graft.operators.Contour.shortestPaths(
      graft.operators.Contour.roadGridEdges(spark, cols, rows), source,
      hops = hops)
      .withColumn("band", expr("tt_min DIV 10"))
  }

  /** q_dedup_cc rebuilt with the lsDistinct knob threaded through. */
  private def ccBuild(spark: SparkSession, dir: String,
                      lsDistinct: Boolean) = {
    val d = graft.queries.DedupQueries.docs(spark, dir)
    val pairs = graft.operators.Dedup.minhashPairs(d,
      graft.queries.DedupQueries.K, numHashes = 64, bands = 16,
      minEst = 0.2).select(col("ida"), col("idb"))
    graft.operators.ConnectedComponents.components(d, pairs,
      lsDistinct = lsDistinct)
  }
}

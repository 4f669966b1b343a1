package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** Execute the query's OWN plan, not `count()`'s: a bare count lets
    * Catalyst prune every unused column — including whole aggregate
    * functions — and ELIMINATE left joins against unique-key subplans,
    * so a query ending in such a join measures as if the operator never
    * ran (q_snap_to_nearest benched 0.14s for two rounds while its
    * actual cost was ~2.5s). `toRdd.count()` runs the un-pruned
    * physical plan and materializes every output row, which is what
    * Verify (parquet write) pays too — bench and correctness now
    * measure the same work. */
  private def exec(df: org.apache.spark.sql.DataFrame): Long =
    df.queryExecution.toRdd.count()

  /** Quiet-box floors for the two canary probes, measured min-of-6 on
    * an idle box (r11: cpu 0.09-0.13 s once JIT-warm, shuffle
    * 0.28-0.39 s; the min-of-2 below discards the first call's one-off
    * Janino+JIT cost). The canary defends the WHOLE-RUN number: the
    * per-query min-of-3 logic absorbs per-query noise but not run-long
    * box contention — BENCH_r10 shipped 187.78 s (warm pass 217.7 s vs
    * 118.8 s two commits earlier) with three queries inflated 3-16x,
    * and nothing in the record said so. */
  private val CpuFloorSec = 0.15
  private val ShufFloorSec = 0.35

  /** Per-query quiet-box floors (r12) — the canary's mid-run blind
    * spot closed: BENCH_r11 shipped ~31 s of MID-RUN contention on four
    * queries while both endpoint canaries passed. FLOORS.json (committed;
    * regenerated per round as min across two full warmed Bench passes on
    * a quiet box) carries each query's floor at its sf; any measured row
    * above [[FloorRatio]]× its floor is re-timed up to two more times,
    * and a row that stays above the gate is listed in
    * `"contended_queries"` — inflation can no longer ship unlabeled. */
  private val FloorRatio = 2.5

  /** Floor EPSILON (r17, VERDICT r16 item 8): a trivial query's floor
    * (e.g. q_dumb_multi_to_single at 0.12 s) is below the box's own
    * scheduling noise, so any breeze flags it and the contended-row
    * list loses signal. Sub-[[FloorEpsSec]] floors gate at
    * max(floor, 0.3 s) — a row that small is never the story. */
  private val FloorEpsSec = 0.3
  private def gateFloor(f: Double): Double = math.max(f, FloorEpsSec)

  /** Returns (floors, status). status != "active" means the gate is
    * OFF — and that must be loud: a malformed FLOORS.json or an sf
    * mismatch used to silently disable the gate with floors_n=0 as the
    * only trace. Now the status ships in the JSON and non-active
    * statuses print a stderr warning. */
  private def loadFloors(sfDir: String): (Map[String, Double], String) = {
    val r =
      try {
        val p = java.nio.file.Paths.get("FLOORS.json")
        if (!java.nio.file.Files.exists(p)) (Map.empty[String, Double], "no_file")
        else {
          val s = java.nio.file.Files.readString(p)
          // floors only gate runs at the sf they were measured at
          val sfOk = "\"sf\"\\s*:\\s*\"([^\"]+)\"".r.findFirstMatchIn(s)
            .exists(m => sfDir.endsWith(m.group(1)))
          if (!sfOk) (Map.empty[String, Double], "sf_mismatch")
          else {
            val m = "\"(q[a-z0-9_]+)\"\\s*:\\s*([0-9.]+)".r.findAllMatchIn(s)
              .map(m => m.group(1) -> m.group(2).toDouble).toMap
            if (m.isEmpty) (m, "empty_parse") else (m, "active")
          }
        }
      } catch { case e: Throwable =>
        (Map.empty[String, Double], s"read_error:${e.getClass.getSimpleName}") }
    if (r._2 != "active")
      System.err.println(s"WARNING: per-query floor gate DISABLED (${r._2})")
    r
  }

  /** Two fixed corpus-independent probes, min-of-2 each: a pure
    * codegen CPU loop and a small shuffle. Run at START and END of the
    * measured pass; either exceeding 2x its floor marks the emitted
    * JSON `"contended": true` — a contended-box total can never again
    * ship looking like a clean record. */
  private def canary(spark: SparkSession): (Double, Double) = {
    def t(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def cpu(): Unit = {
      exec(spark.range(1L << 26).selectExpr("sum(id * id % 1000000007) AS s")); ()
    }
    def shuf(): Unit = {
      exec(spark.range(1L << 22).selectExpr("id % 4096 AS k")
        .groupBy("k").count()); ()
    }
    val c1 = math.min(t(cpu()), t(cpu()))
    val c2 = math.min(t(shuf()), t(shuf()))
    (c1, c2)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // warm-up scale: small data, SAME PHYSICAL plans — sf0.01 (not
    // sf0.001) because AQE picks different join strategies on tiny
    // inputs, which compiles different generated code and leaves the
    // measured-scale variant cold. Warm-up time is excluded from the
    // reported numbers.
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR",
      "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // default codegen cache (100 classes) evicts its own warmed plans
      // over a 65-query x multi-stage run, re-paying ~2s Janino+JIT per
      // query at measure time — exactly the uniform inflation the round-4
      // numbers showed on trivial unchanged queries
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // input-proportional exchange grain (r17): resolves to cpus at the
    // bench sfs, scales with the corpus beyond them
    Tune.forInput(spark, sfDir)
    // fixed (sorted) order so round-over-round comparisons line up
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    val tWarm0 = System.nanoTime()
    val warmed = new java.io.File(warmDir).isDirectory
    if (warmed) ordered.foreach {
      case (_, fn) =>
        try { exec(fn(spark, warmDir)) } catch { case _: Throwable => () }
        spark.catalog.clearCache()
    }
    val warmSec = (System.nanoTime() - tWarm0) / 1e9
    val (cs1, cs2) = canary(spark)
    val (floors, floorsStatus) = loadFloors(sfDir)
    // retry crashes are real flakiness even when the first (successful)
    // timing ships — record them instead of dropping them (ADVICE r12)
    val retryErrors = scala.collection.mutable.Map.empty[String, String]
    // Same-commit runs on this box have differed 2.1x end-to-end (59 s vs
    // 125 s) with untouched single queries swinging up to 12x — CPU
    // contention noise, not code. Queries over 1 s therefore run up to 3
    // times and report the MIN (the least-contended run is the closest to
    // the query's true cost); a third run only happens when the first two
    // disagree by >20%, so a quiet box pays one extra pass, not two.
    val results = ordered.map { case (name, fn) =>
      def once(): (Double, Option[String]) = {
        val t0 = System.nanoTime()
        val err =
          try { exec(fn(spark, sfDir)); None }
          catch { case e: Throwable =>
            Some(s"${e.getClass.getSimpleName}: ${e.getMessage}") }
        // operators persist multi-consumer stages internally; drop them so
        // successive queries don't compete for executor memory. clearCache
        // only drops Dataset caches — localCheckpoint blocks (the lineage
        // cuts in recallAtK/BM25/spans/CMS) live in sc.persistentRdds and
        // would otherwise linger until GC, so unpersist those explicitly.
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        ((System.nanoTime() - t0) / 1e9, err)
      }
      // floor gate: a measured min above FloorRatio x the committed
      // quiet-box floor is presumed contention, re-timed up to twice
      // more; only a row that STAYS above the gate ships, and it ships
      // flagged (see contended_queries below)
      // the gate's whole rule lives in gateFloor: every present floor
      // is lifted to >= FloorEpsSec, so a floor row is ALWAYS enrolled
      // (the pre-r17 `f > 0.05` tiny-floor exemption is subsumed by the
      // epsilon lift and was dropped as dead code — ADVICE r17)
      def floorGate(t: Double): Double = floors.get(name).map(gateFloor) match {
        case Some(f) if t > FloorRatio * f =>
          val (tr, er) = once()
          er.foreach(e => retryErrors(name) = e)
          val lo = if (er.isDefined) t else math.min(t, tr)
          if (lo > FloorRatio * f) {
            val (tr2, er2) = once()
            er2.foreach(e => retryErrors(name) = e)
            if (er2.isDefined) lo else math.min(lo, tr2)
          } else lo
        case _ => t
      }
      val (t1, e1) = once()
      // a failed query's timing is NEGATED: the errors field carries the
      // cause, and the sign makes a fast crash unmistakable to consumers
      // that only read the timings
      if (e1.isDefined) (name, -t1, e1)
      else if (t1 <= 1.0) (name, floorGate(t1), None)
      else {
        val (t2, e2) = once()
        if (e2.isDefined) (name, -t2, e2)
        else {
          val lo = math.min(t1, t2)
          if ((math.max(t1, t2) - lo) / lo <= 0.2) (name, floorGate(lo), None)
          else {
            val (t3, e3) = once()
            if (e3.isDefined) (name, -t3, e3)
            else (name, floorGate(math.min(lo, t3)), None)
          }
        }
      }
    }
    // rows still above the gate after re-timing: shipped, but labeled
    val contendedQs = results.collect {
      case (k, v, None) if floors.get(k).map(gateFloor).exists(f =>
        v > FloorRatio * f) => k
    }
    val (ce1, ce2) = canary(spark)
    val contended = cs1 > 2 * CpuFloorSec || cs2 > 2 * ShufFloorSec ||
      ce1 > 2 * CpuFloorSec || ce2 > 2 * ShufFloorSec
    // truncate the RAW message BEFORE escaping (a cut can't split an
    // escape pair), then escape quotes, backslashes and ALL control chars
    def jstr(s: String): String =
      "\"" + s.take(200).flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => " "
        case c => c.toString
      } + "\""
    // ONE metric line with the FULL per-query map (VERDICT r18 item 2):
    // the r17/r18 compact `qt`-array variant made the driver's parser
    // return parsed:null both rounds — the parser requires the `queries`
    // map on the LAST {"metric":"total"} line. Timings trim trailing
    // zeros to keep the line as short as possible.
    // explicit ROOT locale: a comma-decimal default locale would emit
    // "0,86" and corrupt the JSON line
    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    def snum(v: Double): String = {
      val s = num(v).reverse.dropWhile(_ == '0').dropWhile(_ == '.')
        .reverse
      if (s.isEmpty || s == "-") "0" else s
    }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + snum(v) }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) =>
      s"\"" + k + "\":" + jstr(e)
    }.mkString("{", ",", "}")
    val retryErrs = retryErrors.toSeq.sortBy(_._1)
      .map { case (k, e) => s"\"" + k + "\":" + jstr(e) }
      .mkString("{", ",", "}")
    // only successful timings count toward the headline total
    val total = results.collect { case (_, v, None) => v }.sum
    val cjson = s"""{"start":[${num(cs1)},${num(cs2)}],"end":[${num(ce1)},${num(ce2)}],"floors":[${num(CpuFloorSec)},${num(ShufFloorSec)}]}"""
    val cqjson = contendedQs.map("\"" + _ + "\"").mkString("[", ",", "]")
    val nerr = results.count(_._3.isDefined)
    val json = s"""{"metric":"total","value":${num(total)},"unit":"sec","n":${results.size},"warmed":$warmed,"warm_sec":${num(warmSec)},"err_n":$nerr,"retry_err_n":${retryErrors.size},"contended":$contended,"floors_n":${floors.size},"floors_status":"$floorsStatus","floor_ratio":$FloorRatio,"contended_queries":$cqjson,"retry_errors":$retryErrs,"canary":$cjson,"queries":$qs,"errors":$errs,"sf":"$sfDir"}"""
    println(json)
    // sbt prefixes stdout with [info], which can defeat line-level JSON
    // parsing downstream — also drop the bare line in a file.
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_LATEST.json"), json + "\n")
    catch { case _: Throwable => () }
    spark.stop()
  }
}

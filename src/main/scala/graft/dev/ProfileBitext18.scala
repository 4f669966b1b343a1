package graft.dev
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** r18 optimization probe: per-JOB wall breakdown of the bitext rows —
  * the queries are tiny-data/large-job-count, so the lever is job count
  * x fixed overhead, and this names each job's description + duration. */
object ProfileBitext18 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val b0 = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
    // A/B knobs: object-hash-agg sort fallback threshold (default 128),
    // whole-stage codegen on/off, codegen factory mode
    val b1 = sys.env.get("SPARK_GRAFT_OHA_FALLBACK").fold(b0)(t =>
      b0.config(
        "spark.sql.objectHashAggregate.sortBased.fallbackThreshold", t))
    val b2 = sys.env.get("SPARK_GRAFT_WSCG").fold(b1)(t =>
      b1.config("spark.sql.codegen.wholeStage", t))
    val b3 = sys.env.get("SPARK_GRAFT_CG_MODE").fold(b2)(t =>
      b2.config("spark.sql.codegen.factoryMode", t))
    val spark = sys.env.get("SPARK_GRAFT_HUGE").fold(b3)(t =>
      b3.config("spark.sql.codegen.hugeMethodLimit", t))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the engine grain for the measured input — matches Bench/Verify/
    // ScaleDecade shape (r19; without it the 100x attribution ran at a
    // grain the real harnesses never use)
    graft.Tune.forInput(spark, sfDir)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val m = i.taskMetrics
        val wall = (for { a <- i.completionTime; b <- i.submissionTime }
          yield (a - b) / 1000.0).getOrElse(-1.0)
        if (wall > 0.2)
          println(f"[stage] ${i.stageId}%4d wall=$wall%6.2f s run=" +
            f"${m.executorRunTime / 1000.0}%7.2f s gc=" +
            f"${m.jvmGCTime / 1000.0}%6.2f s cpu=" +
            f"${m.executorCpuTime / 1e9}%7.2f s spill=" +
            f"${m.memoryBytesSpilled}%10d tasks=${i.numTasks}%3d " +
            f"sr=${m.shuffleReadMetrics.totalBytesRead}%10d " +
            f"sw=${m.shuffleWriteMetrics.bytesWritten}%10d  " +
            i.name.takeWhile(_ != '\n').take(60))
      }
    })
    val names = if (args.isEmpty) Seq("q_bitext_recall") else args.toSeq
    names.foreach { n =>
      // one warm pass (sf0.01) so codegen/JIT costs don't masquerade as jobs
      try graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.01")
        .queryExecution.toRdd.count()
      catch { case _: Throwable => () }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      Thread.sleep(500)
      println(s"==== $n measured pass ====")
      val t0 = System.nanoTime()
      val c = graft.SparkEntry.queries(n)(spark, sfDir)
        .queryExecution.toRdd.count()
      println(f"[total] $n ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$c")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}

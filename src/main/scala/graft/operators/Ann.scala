package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY.md §2 rows 32-33).
  *
  * Scale design: the query side is small (a sample / user-supplied set) and
  * is broadcast; the corpus side streams. Brute force is the exact baseline
  * (one broadcast-nested-loop over the corpus, no shuffle of the corpus);
  * the LSH variant replaces the full scan with a random-hyperplane bucket
  * equi-join so corpus rows only meet queries in their own bucket — that is
  * the 100 TB path. Dot products are `zip_with`+`aggregate` folds over
  * array<double>, fully codegen'd.
  */
object Ann {

  /** Cast a float embedding to double and attach its L2 norm. */
  private def withNorm(df: DataFrame, idCol: String): DataFrame =
    df.select(col(idCol).cast("long").as(idCol),
        transform(col("embedding"), x => x.cast("double")).as("e"))
      .withColumn("nrm",
        sqrt(aggregate(transform(col("e"), x => x * x), lit(0.0),
          (acc, v) => acc + v)))

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** Exact brute-force cosine top-k: queries (small, broadcast) against the
    * full corpus. Rank on round(cos,4) with id tie-break so results are
    * stable across engines and runs. */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = withNorm(corpus, "vec_id")
      .select(col("vec_id").as("nid"), col("e").as("ne"), col("nrm").as("nn"))
    val q = withNorm(queries, "vec_id")
      .select(col("vec_id").as("qid"), col("e").as("qe"), col("nrm").as("qn"))
    val scored = c.join(broadcast(q), col("qid") =!= col("nid"))
      .withColumn("cos4",
        round(dot(col("qe"), col("ne"))
          / greatest(col("qn") * col("nn"), lit(1e-12)), 4))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("cos4").desc, col("nid"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "nid", "rank", "cos4")
  }

  /** Per-vector symmetric int8 scalar quantization: scale = 127/max|x_i|,
    * q_i = round(x_i * scale). The compressed form an embedding store
    * ships at scale — 8 bytes/dim -> 1, exact integer dot products (64
    * dims x 127^2 stays far under Long range, ANSI-safe), and the scale
    * never needs to be kept for cosine (it cancels in the ratio). */
  private def quantize(df: DataFrame, idCol: String): DataFrame =
    df.select(col(idCol).cast("long").as(idCol),
        transform(col("embedding"), x => x.cast("double")).as("e"))
      .withColumn("mx", array_max(transform(col("e"), x => abs(x))))
      .withColumn("q", transform(col("e"),
        x => round(x * 127.0 / greatest(col("mx"), lit(1e-12))).cast("long")))
      .withColumn("nq", aggregate(col("q"), lit(0L), (acc, v) => acc + v * v))

  /** Brute-force cosine top-k over int8-QUANTIZED vectors — the
    * compressed-index twin of cosineTopK (quality measured against it the
    * same way recallAtK measures LSH/IVF). Integer dots, one double
    * division at the end; rank on round(qcos,4) with id tie-break. */
  def quantizedTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = quantize(corpus, "vec_id")
      .select(col("vec_id").as("nid"), col("q").as("nqv"), col("nq").as("nn"))
    val q = quantize(queries, "vec_id")
      .select(col("vec_id").as("qid"), col("q").as("qqv"), col("nq").as("qn"))
    val idot = aggregate(zip_with(col("qqv"), col("nqv"), (x, y) => x * y),
      lit(0L), (acc, v) => acc + v)
    val scored = c.join(broadcast(q), col("qid") =!= col("nid"))
      .withColumn("qcos4",
        round(idot.cast("double")
          / greatest(sqrt(col("qn").cast("double"))
            * sqrt(col("nn").cast("double")), lit(1e-12)), 4))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("qcos4").desc, col("nid"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "nid", "rank", "qcos4")
  }

  /** IVF (inverted-file) index: a coarse k-means quantizer partitions the
    * corpus into nlist cells; a query probes only its nprobe nearest
    * cells and brute-forces within them. Seeds are the nlist smallest
    * vec_ids (deterministic); `iters` Lloyd rounds refine them. The
    * centroid table (nlist x dim) is tiny and broadcast at every step;
    * the corpus is touched once per iteration with a map-side argmin —
    * the classic FAISS-style layout expressed as DataFrames. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int, nlist: Int,
              nprobe: Int, iters: Int): DataFrame = {
    val c = withNorm(corpus, "vec_id")
    // Rank assignments on round(d2, 6) with a cluster tie-break: centroid
    // coordinates are unordered-FP averages, so raw-d2 argmins could flip
    // on last-ulp differences between runs/engines.
    def assign(vectors: DataFrame, cents: DataFrame): DataFrame = {
      val scored = vectors.crossJoin(broadcast(cents))
        .withColumn("d2", round(aggregate(
          zip_with(col("e"), col("ce"), (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, v) => acc + v), 6))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("vec_id").orderBy(col("d2"), col("cluster"))
      scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
    }
    // Cluster label = the seed's own vec_id: deterministic, needs no
    // global row_number window (which would move the frame to a single
    // partition), and — because seed ids are taken in ascending order —
    // ORDER BY cluster tie-breaks identically to dense 1..nlist ranks.
    var cents = c.orderBy("vec_id").limit(nlist)
      .select(col("vec_id").as("cluster"), col("e").as("ce"))
    for (_ <- 1 to iters) {
      val assigned = assign(c, cents)
        .select(col("cluster"), posexplode(col("e")).as(Seq("idx", "v")))
      // eager checkpoint per Lloyd round: the centroid table is nlist x
      // dim, tiny, but its plan would otherwise embed every prior
      // round's assign+recenter tree (super-linear re-analysis at
      // higher iters — the dedupClusters lineage lesson)
      cents = assigned.groupBy("cluster", "idx").agg(avg("v").as("m"))
        .groupBy("cluster")
        .agg(array_sort(collect_list(struct(col("idx"), col("m")))).as("sm"))
        .select(col("cluster"), transform(col("sm"), s => s("m")).as("ce"))
        .localCheckpoint()
    }
    val indexed = assign(c, cents)
      .select(col("vec_id").as("nid"), col("e").as("ne"),
        col("nrm").as("nn"), col("cluster"))
    val q = withNorm(queries, "vec_id")
      .select(col("vec_id").as("qid"), col("e").as("qe"), col("nrm").as("qn"))
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("d2", round(aggregate(
        zip_with(col("qe"), col("ce"), (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, v) => acc + v), 6))
      .withColumn("prn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("qid").orderBy(col("d2"), col("cluster"))))
      .filter(col("prn") <= nprobe)
      .select("qid", "qe", "qn", "cluster")
    val scored = indexed.join(broadcast(probes), Seq("cluster"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("cos4",
        round(dot(col("qe"), col("ne"))
          / greatest(col("qn") * col("nn"), lit(1e-12)), 4))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("cos4").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "nid", "rank", "cos4", "cluster")
  }

  /** Deterministic pseudo-random hyperplane component i of plane j. */
  def hyperplane(j: Int, dim: Int): Seq[Double] =
    (0 until dim).map(i => ((j * dim + i) * 2654435761L % 1000003L)
      / 1000003.0 - 0.5)

  /** Sign-bit bucket of `planes` deterministic random hyperplanes. */
  private def hyperplaneBucket(e: Column, planes: Int, dim: Int): Column =
    (0 until planes).map { j =>
      val hp = array(hyperplane(j, dim).map(lit): _*)
      when(dot(e, hp) > 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }.reduceLeft((a, b) => a.bitwiseOR(b))

  /** LSH variant: `planes` random hyperplanes -> sign-bit bucket; queries
    * and corpus meet only within a bucket. Returns per-query top-k among
    * bucket mates (approximate — trades recall for a bounded join). */
  def cosineTopKLsh(corpus: DataFrame, queries: DataFrame, k: Int,
                    planes: Int, dim: Int): DataFrame = {
    def bucket(e: Column): Column = hyperplaneBucket(e, planes, dim)
    val c = withNorm(corpus, "vec_id")
      .select(col("vec_id").as("nid"), col("e").as("ne"), col("nrm").as("nn"),
        bucket(col("e")).as("bucket"))
    val q = withNorm(queries, "vec_id")
      .select(col("vec_id").as("qid"), col("e").as("qe"), col("nrm").as("qn"),
        bucket(col("e")).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("cos4",
        round(dot(col("qe"), col("ne"))
          / greatest(col("qn") * col("nn"), lit(1e-12)), 4))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("cos4").desc, col("nid"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "nid", "rank", "cos4", "bucket")
  }

  /** Recall of an approximate top-k result against the exact one:
    * per-query overlap fraction of neighbor sets (rank-agnostic
    * recall@k). Both inputs are (qid, nid, ...) top-k tables; the
    * measurement is one equi-join + two tiny aggregations — cheap
    * enough to run continuously beside an ANN pipeline as an index
    * quality monitor. */
  def recallAtK(approx: DataFrame, exact: DataFrame, k: Int): DataFrame = {
    val hits = approx.select(col("qid"), col("nid"))
      .join(exact.select(col("qid"), col("nid")), Seq("qid", "nid"))
      .groupBy("qid").agg(count(lit(1)).as("n_hits"))
    exact.groupBy("qid").agg(count(lit(1)).as("n_exact"))
      .join(hits, Seq("qid"), "left")
      .select(col("qid"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        col("n_exact"),
        round(coalesce(col("n_hits"), lit(0L)).cast("double")
          / col("n_exact").cast("double"), 4).as("recall"))
  }

  /** Embedding-cosine near-dup PAIRS over the whole corpus — the dedup
    * counterpart of cosineTopKLsh: every (ida < idb) pair with
    * round(cos, 4) >= minCos among hyperplane-bucket mates. The bucket
    * equi-join bounds the self-join to bucket-local products (the
    * corpus never meets itself whole), which is the 100 TB path for
    * near-dup sweeps over embedding columns. */
  def cosineNearDupPairs(corpus: DataFrame, planes: Int, dim: Int,
                         minCos: Double): DataFrame = {
    val c = withNorm(corpus, "vec_id")
      .withColumn("bucket", hyperplaneBucket(col("e"), planes, dim))
    val a = c.select(col("bucket"), col("vec_id").as("ida"),
      col("e").as("ea"), col("nrm").as("na"))
    val b = c.select(col("bucket"), col("vec_id").as("idb"),
      col("e").as("eb"), col("nrm").as("nb"))
    a.join(b, Seq("bucket"))
      .filter(col("ida") < col("idb"))
      .withColumn("cos4",
        round(dot(col("ea"), col("eb"))
          / greatest(col("na") * col("nb"), lit(1e-12)), 4))
      .filter(col("cos4") >= minCos)
      .select("ida", "idb", "cos4", "bucket")
  }
}

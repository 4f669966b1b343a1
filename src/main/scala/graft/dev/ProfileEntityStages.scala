package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stage cost profile for the r11 entity-resolution rewrite (dev tool):
  * where did 6s -> 14s go — lev kernel, checkpoints, retry machinery,
  * or the join-back? */
object ProfileEntityStages {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stage] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    val customer = graft.Tables.load(spark, dir, "customer")
    val c = customer
      .select(col("c_custkey").cast("long").as("ckey"),
        lower(concat(col("c_name"), lit(" "), col("c_mktsegment"),
          lit(" n"), col("c_nationkey"))).as("name"))
      .localCheckpoint()
    val p = (lit(11L) + pmod(col("ckey"), lit(8L))).cast("int")
    val dirty = c.select(col("ckey").as("rid"),
      concat(substring(col("name"), lit(1), p - 1),
        substring(col("name"), p + 1, lit(64))).as("name"))
    def gramArr(df: DataFrame, id: String, q: Int): DataFrame = df
      .select(col(id), col("name"), array_distinct(transform(
        sequence(lit(1), greatest(length(col("name")) - (q - 1),
          lit(1))),
        i => substring(col("name"), i.cast("int"), lit(q)))).as("gs"))
    val cArr = gramArr(c.select(col("ckey"), col("name")), "ckey", 3)
      .select(col("ckey"), col("name").as("cn"), col("gs").as("gs_c"))
    val dArr = gramArr(dirty, "rid", 3)
      .select(col("rid"), col("name").as("dn"), col("gs"))
    val cg5 = t("cg5 checkpoint") {
      gramArr(c.select(col("ckey"), col("name")), "ckey", 5)
        .select(col("ckey"), length(col("name")).cast("long").as("cl"),
          explode(col("gs")).as("g"))
        .localCheckpoint()
    }
    val dg5 = gramArr(dirty, "rid", 5)
      .select(col("rid"), length(col("name")).cast("long").as("dl"),
        explode(col("gs")).as("g"))
    val dfTab = cg5.groupBy("g").agg(count(lit(1)).as("df"))
    val wRid = Window.partitionBy("rid").orderBy(col("df"), col("g"))
    val probesAll = t("probesAll checkpoint") {
      dg5.join(dfTab, Seq("g"))
        .withColumn("rn", row_number().over(wRid))
        .filter(col("rn") <= 4).select(col("rid"), col("g"), col("rn"),
          col("dl"))
        .localCheckpoint()
    }
    val cand1 = t("cand1 checkpoint") {
      probesAll.filter(col("rn") <= 4)
        .join(cg5, Seq("g"))
        .filter(abs(col("dl") - col("cl")) <= 1)
        .select(col("rid"), col("ckey")).distinct()
        .localCheckpoint()
    }
    println(s"[stage] cand1 rows=${cand1.count()}")
    // jac-only scoring (the r10 shape) vs jac+lev
    def scoreJac(cand: DataFrame): DataFrame = cand
      .join(dArr, Seq("rid")).join(cArr, Seq("ckey"))
      .select(col("rid"), col("ckey"),
        size(array_intersect(col("gs"), col("gs_c"))).cast("long")
          .as("shared"),
        size(col("gs")).cast("long").as("nb"),
        size(col("gs_c")).cast("long").as("na"))
      .select(col("rid"), col("ckey"),
        round(col("shared").cast("double")
          / (col("na") + col("nb") - col("shared")).cast("double"), 4)
          .as("jac"))
    def scoreFull(cand: DataFrame): DataFrame = cand
      .join(dArr, Seq("rid")).join(cArr, Seq("ckey"))
      .select(col("rid"), col("ckey"),
        levenshtein(col("dn"), col("cn")).cast("double").as("lev"),
        size(array_intersect(col("gs"), col("gs_c"))).cast("long")
          .as("shared"),
        size(col("gs")).cast("long").as("nb"),
        size(col("gs_c")).cast("long").as("na"))
      .select(col("rid"), col("ckey"), col("lev"),
        round(col("shared").cast("double")
          / (col("na") + col("nb") - col("shared")).cast("double"), 4)
          .as("jac"))
    t("scoreJac(cand1) count") { scoreJac(cand1).queryExecution.toRdd.count() }
    t("scoreFull(cand1) count") { scoreFull(cand1).queryExecution.toRdd.count() }
    val scored1 = t("scored1 checkpoint") { scoreFull(cand1).localCheckpoint() }
    val retry = t("retry count") {
      val r = dirty.select(col("rid"))
        .join(scored1.filter(col("lev") <= 1).select("rid").distinct(),
          Seq("rid"), "left_anti").localCheckpoint()
      println(s"[stage] retry rids=${r.count()}")
      r
    }
    val cand2 = t("cand2 count") {
      val c2 = dirty.join(retry, Seq("rid"))
        .select(col("rid"), length(col("name")).cast("long").as("dl"),
          expr("right(name, 12)").as("tk"))
        .join(c.select(col("ckey"), length(col("name")).cast("long")
          .as("cl"), expr("right(name, 12)").as("tk")), Seq("tk"))
        .filter(abs(col("dl") - col("cl")) <= 1)
        .select(col("rid"), col("ckey"))
        .join(cand1, Seq("rid", "ckey"), "left_anti").localCheckpoint()
      println(s"[stage] cand2 rows=${c2.count()}")
      c2
    }
    val scored = t("union checkpoint") {
      scored1.unionByName(scoreFull(cand2)).localCheckpoint()
    }
    t("topk + joinback") {
      scored.groupBy("rid")
        .agg(graft.functions.TopKAgg(
          col("lev") * 2 + (lit(1.0) - col("jac")), col("ckey"),
          col("ckey"), 1).as("tk"))
        .select(col("rid"),
          element_at(col("tk"), 1).getField("payload").as("matched_key"))
        .join(scored.select(col("rid"), col("ckey").as("matched_key"),
          col("lev"), col("jac")), Seq("rid", "matched_key"))
        .queryExecution.toRdd.count()
    }
    spark.stop()
  }
}

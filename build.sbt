ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "gpd_lite_toolboxspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
// Parallel test JVMs (r19): one sequential forked JVM ran the 17 suites
// in ~12-19 min of wall, starving the driver's post-test verify budget.
// Suites are grouped into four forked JVMs balanced by measured suite
// wall (OperatorsSpec alone ≈ the other heavy pair) and run
// concurrently — each group has its OWN SparkSession (local[4]) so no
// session-global state (conf flips, catalog tables, /tmp artifact
// paths, all suite-unique) is ever shared across threads. 4 x local[4]
// + 4 x Xmx fit the 32-core/128 GiB box with headroom.
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val opts = (Test / javaOptions).value
  val forkOpts = ForkOptions().withRunJVMOptions(opts.toVector)
  val groupOf: Map[String, Int] = Map(
    "graft.OperatorsSpec" -> 0,
    "graft.DedupAnnSpec" -> 1, "graft.SuffixArraySpec" -> 1,
    "graft.GeomSpec" -> 1,
    "graft.PlanShapeSpec" -> 2, "graft.SuffixIndexSpec" -> 2,
    "graft.Round18Spec" -> 2, "graft.WarcSpec" -> 2,
    "graft.HtmlSpec" -> 2,
  ) // everything else (streaming, pipeline ops, property suites) -> 3
  (0 to 3).map { g =>
    Tests.Group(s"g$g",
      tests.filter(t => groupOf.getOrElse(t.name, 3) == g),
      Tests.SubProcess(forkOpts))
  }
}
Global / concurrentRestrictions :=
  Seq(Tags.limitAll(8), Tags.limit(Tags.ForkedTestGroup, 4))

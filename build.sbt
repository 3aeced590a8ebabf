ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dasklightgbmspark"
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
// r12 (VERDICT r11 task 4): file-backed per-test results. One of two full
// r11 suite runs showed 2 RelationalSpec failures that vanished on rerun
// with their names lost to log truncation — with 18 suites / ~20 min runs
// a one-off flake must carry a test name and stack. JUnit-XML per suite
// into target/test-reports (scalatest's built-in -u reporter); the
// committed artifact convention is TEST_REPORT.json, folded from the XML
// by tools/test_report.py after a full run.
Test / testOptions += Tests.Argument(TestFrameworks.ScalaTest,
  "-u", "target/test-reports")
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
// r13 verdict task 1: the sequential suite wall (~29 min) blew the driver's
// `sbt test` budget. Suites are split into balanced groups, each a SEPARATE
// forked JVM run in parallel: full isolation (own SparkSession, own
// java.io.tmpdir so the content-keyed staging dirs under /tmp never see a
// cross-process check-then-build race), ~4x wall cut on a 32-core box
// (5 groups x local[4] = 20 task slots). Grouping is by measured suite
// time (TEST_REPORT r13): the two heaviest suites anchor their own groups.
Test / testGrouping := {
  val opts = (Test / javaOptions).value.toVector
  val groupId: String => String = {
    case "graft.MLQuantileSpec" => "g1"
    case "graft.MLSpec" | "graft.AnalyticsSpec" => "g2"
    case "graft.RelationalSpec" | "graft.DedupSpec" => "g3"
    case "graft.SystemFitPredictSpec" | "graft.DegenerateDataSpec" |
         "graft.PlanSpec" => "g4"
    case _ => "g5" // streaming suites + the small fry
  }
  (Test / definedTests).value.groupBy(t => groupId(t.name)).map {
    case (g, ts) =>
      val tmp = s"/tmp/graft_tests/$g"
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(tmp))
      Tests.Group(g, ts, Tests.SubProcess(ForkOptions().withRunJVMOptions(
        opts :+ s"-Djava.io.tmpdir=$tmp")))
  }.toSeq
}
// sbt's default restrictions cap concurrent forked test groups at 1;
// allow the five groups to run together (memory: 5 x 8g heap on 128 GiB).
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, 5),
  Tags.limitAll(16))

ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "rudderserverspark"
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
// The driver captures this process's stdout and parses the bench's
// one-line JSON contract. sbt's default LoggedOutput prefixes every
// forked-process line with "[info] "/"[error] ", which has made the
// line unparseable in every round on record (BENCH_r01-r20
// `parsed: null`). StdoutOutput passes the forked JVM's output through
// verbatim, so the contract line reaches the driver bare.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Per-test wall-clock in the report (-oD): the driver's test budget is
// finite and VERIFY_r20 recorded a truncated run — durations make the
// slow suites visible instead of anecdotal.
Test / testOptions += Tests.Argument(TestFrameworks.ScalaTest, "-oD")
// The driver's `sbt test` run exceeded its wall budget (VERIFY_r20
// tests_ok: false, 23 min here at round-21 open). The suite is four
// roughly-equal serial blocks with NO shared JVM state between them —
// every scratch path (maintained tables, streamed state, checkpoints)
// is applicationId-scoped — so run them as four forked JVMs in
// parallel: StreamingSpec | the two full-plan sweeps | the three
// ReleaseStream end-to-end pins | everything else. Isolation is
// complete (each JVM builds its own SparkSession), so this changes
// wall-clock only, never semantics or ordering within a suite.
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val forkOpts = ForkOptions()
    .withOutputStrategy((Test / outputStrategy).value)
    .withWorkingDirectory(Option((Test / baseDirectory).value))
    .withRunJVMOptions((Test / javaOptions).value.toVector)
  def groupOf(n: String): String =
    if (n.endsWith("StreamingReleaseSpec")) "release"
    else if (n.endsWith("StreamingSpec")) "streaming"
    else if (n.endsWith("ScaleGuardSpec") || n.endsWith("QueriesSmokeSpec")) "plan-sweeps"
    else "rest"
  tests.groupBy(t => groupOf(t.name)).toSeq.map { case (g, ts) =>
    Tests.Group(g, ts, Tests.SubProcess(forkOpts))
  }
}
// sbt's default restrictions cap forked test groups at 1 — lift to the
// four groups above (each is a local[4] session; 4 JVMs fit the box).
Global / concurrentRestrictions := Seq(
  Tags.limitAll(8),
  Tags.limit(Tags.ForkedTestGroup, 4))
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

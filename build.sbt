ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "docetlspark"
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
// Forked run output goes straight to stdout (no sbt "[info] " prefix) so
// the Bench/Verify JSON lines are machine-parseable by the driver.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Suites share one SparkSession and the mock-LLM call counter; run serially.
Test / parallelExecution := false
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
  // Bench stability: pre-commit the full heap (no growth pauses mid-sweep)
  // and use the throughput collector — G1's concurrent cycles add
  // run-to-run variance that reads as phantom per-query regressions in
  // BENCH artifacts (r15 saw ±20% total swings on identical binaries).
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  "-XX:+UseParallelGC",
)
// LocalClusterSpec starts/stops SparkContexts (including a multi-JVM
// local-cluster one), which would poison the session every other suite
// shares — run it in its own forked JVM group.
Test / testGrouping := {
  // SPARK_HOME lets local-cluster mode build executor launch commands (it
  // resolves the distribution's jars dir); harmless for plain local mode.
  val opts = ForkOptions()
    .withRunJVMOptions((Test / javaOptions).value.toVector)
    .withEnvVars(Map(
      "SPARK_HOME" -> "/opt/spark",
      // normally exported by load-spark-env.sh; the in-JVM launcher local-
      // cluster workers use needs it to skip the source-build dir probe
      "SPARK_SCALA_VERSION" -> "2.13"))
  val (cluster, rest) = (Test / definedTests).value
    .partition(_.name == "graft.LocalClusterSpec")
  Seq(
    Tests.Group("cluster", cluster, Tests.SubProcess(opts)),
    Tests.Group("default", rest, Tests.SubProcess(opts)))
}

ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "movieetlspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// suites share one SparkSession; serialize them so plan-shape tests are
// not perturbed by concurrent session-conf changes or catalog writes
Test / parallelExecution := false
run / fork := true
// Echo the forked program's output directly to this process's stdout
// instead of routing it through sbt's logger: the logger prefixes every
// line with "[info] ", which breaks any consumer that parses the Bench
// JSON line with a per-line json parse.
outputStrategy := Some(StdoutOutput)
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
  // Pre-size the heap: G1 otherwise shrinks a local[32] driver to
  // ~1.4 GB committed and young-collects every ~0.7 s under the bench's
  // allocation rate (measured r18: 109 young GCs of 15-45 ms
  // stop-the-world each across one streaming-subset run at the 8g-Xmx
  // default; -Xms3g cut that to 27 GCs and -0.85 s on the same 24 s
  // subset, while a full 8g pre-size measured no further gain). Same
  // provisioning knob a production driver/executor gets via
  // spark.{driver,executor}.memory — never a result change.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_XMS", "3g")}",
)

ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "bqnvdspark"
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
// The bench/verify harness captures a short stdout tail and parses the
// last JSON line: forked-process output must reach stdout RAW (no
// "[info] " logger prefix), and sbt's "[success] Total time" trailer
// must not displace the report as the final stdout line.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
showSuccess := false
Global / excludeLintKeys += showSuccess
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
  // 16g default (box has 128g): at sf0.1 the dedup family's cached
  // relations fit the unified region with headroom, so MEMORY_AND_DISK
  // never spills to the (contended) disk mid-suite.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // One forked JVM runs 100+ whole-stage-codegen'd plans (full test
  // suite / Verify): the JDK17 default 240m code cache fills, C2 falls
  // into sweep/recompile churn, and late suites run minutes slower
  // (measured: DedupSpec 21 min late in `sbt test` vs 2 min standalone).
  "-XX:ReservedCodeCacheSize=1g",
)

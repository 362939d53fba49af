ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "flatfilesocialmediadatabaseenginespark"
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
// Pass forked-run output through unwrapped: sbt's default logger prefixes
// every stdout line with "[info] ", which breaks machine parsing of the
// one-line JSON metric emitted by graft.Bench / graft.Verify. Must be
// unscoped: `run / outputStrategy` does not reach the `runMain` task
// (which is how the driver invokes Bench).
outputStrategy := Some(StdoutOutput)
run / outputStrategy := Some(StdoutOutput)
Compile / runMain / outputStrategy := Some(StdoutOutput)
// ...and suppress the "[success] Total time: ..." banner sbt prints AFTER
// the forked JVM exits: it lands after Bench's JSON line, so a parser
// that reads the last line of output sees the banner, not the metric
// (BENCH_r01–r03 all recorded parsed:null).
Global / showSuccess := false
Global / excludeLintKeys ++= Set(showSuccess, outputStrategy)
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
  // 16g default on the 128 GiB box: a 332-query × 3-iteration bench
  // accumulates status-store/broadcast/codegen residue faster than
  // the cleaner drains it, and an 8g heap put the late-suite
  // alphabetical tail under GC pressure on the contended driver runs
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)

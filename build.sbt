ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "mahoutsamsarabookspark"
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
// The bench driver keeps only the last ~2000 chars of stdout and JSON-parses
// the first '{"metric"…}' it finds there. Two sbt behaviors broke that for
// seven rounds: the logger wraps forked output as `[info] {...}` and sbt
// appends a `[success] Total time: …` epilogue AFTER the JSON. StdoutOutput
// passes the forked process's stdout through verbatim (no prefix);
// showSuccess := false drops the epilogue, so Bench's compact summary is the
// literal final stdout line.
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// showSuccess is read by sbt's command engine, not by any task, so the
// unused-key lint flags it; exclude it rather than lose the setting.
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
  // local mode = one JVM: the heap IS the cluster memory. Measured A/B
  // at sf0.1: 32g ≈ 8g on wall-clock (64g regressed ~30% — G1 behaves
  // worse with the huge heap on this box), so 32g is the default for
  // headroom at larger scale factors without the big-heap penalty.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
)

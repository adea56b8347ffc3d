ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "firebaseetlspark"
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
// The driver parses the LAST stdout line of `sbt "runMain graft.Bench"`
// as JSON. Two things broke that in every round since r6: the default
// LoggedOutput strategy prefixes every forked-process line with
// "[info] ", and sbt prints "[success] Total time: …" after the run.
// StdoutOutput passes the forked JVM's stdout through verbatim, and
// showSuccess drops the trailing [success] line, so the bench's
// compact JSON trailer really is the last line.
outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
Global / excludeLintKeys += outputStrategy
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
  // local[32] shuffles all run in this one JVM; 8g forced frequent G1
  // pauses that showed up as 1-2s spikes on single queries. The box
  // has 125 GiB — give the driver real headroom.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
)

ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "rfbdatapipelinespark"
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
// The driver parses Bench's one-line JSON out of the raw process output
// tail; the default forked-run strategy routes the child's stdout through
// sbt's logger, which prefixes every line with "[info] " and breaks the
// parse (BENCH_r04 "parsed": null). StdoutOutput inherits sbt's own
// streams, so program output lands at column 0 unmodified.
run / outputStrategy := Some(StdoutOutput)
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
  "-Dfile.encoding=UTF-8",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
// the reference's pt-BR month folders ("3. Março") need a UTF-8 process
// locale: sun.jnu.encoding (what Path uses for file names) follows the OS
// locale and ignores -D overrides, so a POSIX-locale JVM cannot even
// construct the Path
Test / envVars += "LC_ALL" -> "C.utf8"
run / envVars += "LC_ALL" -> "C.utf8"

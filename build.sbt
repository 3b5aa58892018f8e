ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "jitsuspark"
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
// Pass the forked JVM's stdout straight through instead of re-logging
// each line under sbt's "[info] " prefix — Bench prints one bare JSON
// line on stdout and downstream tooling parses it from the raw output;
// the prefix is what kept that line from ever parsing. Scoped to BOTH
// run and runMain: they are separate task scopes, and the driver
// invokes `runMain graft.Bench` — a `run /`-only setting never applied
// to it (the r06 tail still showed "[info] {" on the JSON line).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Compile / runMain / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // JDK 17 takes the platform charset (US-ASCII under this container's
  // POSIX locale); JDK 18+ (JEP 400) is UTF-8 everywhere. Pin UTF-8 so
  // string round-trips inside Spark (variant schema DDL, filenames)
  // behave like any production deployment.
  "-Dfile.encoding=UTF-8",
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // local[32] runs 32 concurrent tasks in one JVM; size the heap like a
  // 32-core executor (~1 GiB/core), not a driver. 8g left queries
  // fighting over old-gen and penalized whatever ran after a heavy
  // neighbor.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
)

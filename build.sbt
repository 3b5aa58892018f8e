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

// ---- Parallel test groups (r17) ----
// The full suite ran serially in ONE forked JVM (69 min on the r16
// build host); the r16 driver run hit its wall-clock cap with a
// streaming suite still live. Split the suites into forked JVM groups
// that run concurrently: each group gets its own SparkSession
// (local[4]) and heap, fully isolating shared-session state. Heavy
// suites are pinned to spread the load; the rest are hashed.
val graftTestGroups = 6
val graftTestGroupPins: Map[String, Int] = Map(
  // measured-heavy / streaming suites, one anchor per group
  "graft.StreamingSpec" -> 0,
  "graft.ConversationsSpec" -> 1,
  "graft.RandomizedInvariantsSpec" -> 2,
  "graft.SinkRouterSpec" -> 3,
  "graft.SamplingSpec" -> 4,
  "graft.CorpusIngestSpec" -> 5,
  // second-tier suites, spread away from their anchors
  "graft.AnnIngestSpec" -> 2,
  "graft.FrequencySpec" -> 1,
  "graft.CdcSpec" -> 3,
  "graft.CommitLogSpec" -> 4,
  "graft.EvalMetricsSpec" -> 5,
  "graft.OperatorsSpec" -> 1,
  "graft.ChainSpec" -> 2,
  "graft.PlanShapeSpec" -> 3,
  "graft.StatsSpec" -> 4,
  "graft.SimilaritySpec" -> 5,
  "graft.DedupSpec" -> 0,
  "graft.JdbcSinkSpec" -> 0,
  // the two 332-gate sweep suites get a PRIVATE JVM: group 6 is outside
  // the hash range (hash % graftTestGroups < 6), so nothing else lands
  // there — each sweep is a single ~9-minute test and under 6-way
  // sibling contention either can blow the 600 s per-test limit (both
  // have 1800 s overrides; uncontended they run well under it)
  "graft.GateHygieneSpec" -> 6,
  "graft.OracleTypeHygieneSpec" -> 7,
)
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val opts = ((Test / javaOptions).value.filterNot(_.startsWith("-Xmx"))
    :+ s"-Xmx${sys.env.getOrElse("SPARK_TEST_MEM", "12g")}").toVector
  tests
    .groupBy(t => graftTestGroupPins.getOrElse(
      t.name, math.abs(t.name.hashCode) % graftTestGroups))
    .toSeq.sortBy(_._1)
    .map { case (g, ts) =>
      Tests.Group(s"group$g", ts,
        Tests.SubProcess(ForkOptions().withRunJVMOptions(opts)))
    }
}
// let all groups run at once (+2 for the pinned-private groups 6/7)
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, graftTestGroups + 2),
  Tags.limitAll(math.max(graftTestGroups + 4, 10)))
// per-test durations in the log so group balance stays measurable
Test / testOptions += Tests.Argument(TestFrameworks.ScalaTest, "-oD")

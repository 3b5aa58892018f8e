package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.concurrent.{Signaler, ThreadSignaler, TimeLimitedTests}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.time.{Seconds, Span}

/** Shared session for all suites (one JVM-wide session, lazy). */
object TestSession {
  lazy val spark: SparkSession = {
    // Unique warehouse per JVM: test groups run in parallel forked JVMs
    // and saveAsTable suites (BucketingSpec) must not collide on the
    // default ./spark-warehouse.
    val wh = java.nio.file.Files.createTempDirectory("graft-test-wh")
    wh.toFile.deleteOnExit()
    val s = GraftSession.builder(master = "local[4]", shufflePartitions = 4)
      .config("spark.sql.warehouse.dir", wh.toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

trait GraftSpec extends AnyFunSuite with TimeLimitedTests {
  lazy val spark: SparkSession = TestSession.spark
  val sf = "/root/testdata/sf0.001"
  // Hard bound on every test: a single wedged test (e.g. a streaming
  // query that never drains) must fail, not hang the suite past the
  // harness's wall-clock cap. 10 min is ~20x the slowest legitimate
  // test on a loaded host.
  override val timeLimit: Span = Span(600, Seconds)
  // ThreadSignaler interrupts the stuck test thread so the limit is
  // enforced even inside a blocking Spark wait.
  override val defaultTestSignaler: Signaler = ThreadSignaler
}

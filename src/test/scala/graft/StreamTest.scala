package graft

import org.apache.spark.sql.streaming.StreamingQuery

/** Bounded waits for streaming queries in tests.
  *
  * Every wait on a StreamingQuery must be bounded: an unbounded
  * `awaitTermination()` / `processAllAvailable()` on a wedged query
  * hangs the whole suite (the r16 driver run died with a live
  * MicroBatchExecution stack in the tail). A query that fails to drain
  * within the timeout now fails its test — with the query's own
  * exception if it died — instead of hanging the JVM.
  */
object StreamTest {
  /** Generous per-wait bound: the slowest legitimate drain in the suite
    * is tens of seconds on a loaded host; 5 minutes means only a truly
    * wedged query trips it.
    */
  val timeoutMs: Long =
    sys.env.getOrElse("GRAFT_TEST_STREAM_TIMEOUT_MS", "300000").toLong

  /** `awaitTermination(timeout)` + `stop()` in finally, for
    * run-to-completion (AvailableNow) queries.
    */
  def drain(q: StreamingQuery): Unit =
    try {
      if (!q.awaitTermination(timeoutMs))
        sys.error(s"streaming query ${q.name} (${q.id}) still running " +
          s"after ${timeoutMs} ms")
    } finally q.stop()

  /** Bounded `processAllAvailable()` + `stop()` in finally, for
    * continuous queries drained exactly once.
    */
  def processAll(q: StreamingQuery): Unit =
    try processAllBounded(q) finally q.stop()

  /** Bounded `processAllAvailable()` without stopping — a mid-test
    * barrier between addData calls. `processAllAvailable` has no
    * timeout variant, so the wait runs on a daemon thread and the test
    * thread gives up (and stops the query) if it never returns.
    */
  def processAllBounded(q: StreamingQuery): Unit = {
    val err = new java.util.concurrent.atomic.AtomicReference[Throwable]
    val t = new Thread(
      () => try q.processAllAvailable()
        catch { case e: Throwable => err.set(e) },
      s"graft-test-drain-${q.id}")
    t.setDaemon(true)
    t.start()
    t.join(timeoutMs)
    if (t.isAlive) {
      try q.stop() catch { case _: Throwable => () }
      sys.error(s"streaming query ${q.name} (${q.id}) did not process " +
        s"available data within ${timeoutMs} ms")
    }
    if (err.get != null) throw err.get
  }
}

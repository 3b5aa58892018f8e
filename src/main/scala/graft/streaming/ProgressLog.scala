package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Pipeline observability: per-micro-batch progress as a queryable
  * DataFrame — the ops counterpart of the reference's metrics/events-log
  * tables, but for the PIPELINE itself (rotor logs consumer lag and
  * batch sizes per connection; ref `services/rotor/src/lib/metrics.ts`
  * ships function statuses, and the console graphs ingestion rates).
  * Spark already emits everything per batch via `StreamingQueryListener`
  * — this materializes the useful subset instead of asking operators to
  * instrument themselves.
  *
  * Driver-side by design: progress events are one row per micro-batch
  * per query (a few rows/second at worst), bounded by `capacity` as a
  * ring buffer — memory is O(capacity) regardless of stream lifetime.
  * At scale the same rows append to a warehouse table via the sink
  * (`toDf(spark).write`), on whatever cadence ops wants; nothing here
  * touches executors.
  */
object ProgressLog {
  case class BatchProgress(queryName: String, queryId: String,
                           batchId: Long, timestamp: String,
                           numInputRows: Long, inputRowsPerSecond: Double,
                           processedRowsPerSecond: Double,
                           batchDurationMs: Long, stateRows: Long,
                           watermark: String)
}

final class ProgressLog(capacity: Int = 1024) extends StreamingQueryListener {
  import ProgressLog.BatchProgress
  require(capacity > 0, "capacity must be positive")

  private val ring = mutable.ArrayDeque.empty[BatchProgress]

  override def onQueryStarted(
      e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(
      e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(
      e: StreamingQueryListener.QueryProgressEvent): Unit = synchronized {
    val p = e.progress
    val stateRows = Option(p.stateOperators)
      .map(_.map(_.numRowsTotal).sum).getOrElse(0L)
    def d(x: Double) = if (x.isNaN || x.isInfinite) 0.0 else x
    ring.append(BatchProgress(
      Option(p.name).getOrElse(""), p.id.toString, p.batchId, p.timestamp,
      p.numInputRows, d(p.inputRowsPerSecond), d(p.processedRowsPerSecond),
      Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(0L),
      stateRows,
      Option(p.eventTime).flatMap(m => Option(m.get("watermark")))
        .getOrElse("")))
    while (ring.size > capacity) ring.removeHead()
  }

  /** Snapshot of the ring as rows (driver-local, bounded). */
  def snapshot: Seq[BatchProgress] = synchronized { ring.toSeq }

  /** The ring as a DataFrame — join-able with the metrics/events-log
    * tables, or appended to a warehouse table for history. */
  def toDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    snapshot.toDF()
  }
}

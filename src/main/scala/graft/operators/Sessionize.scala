package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sessionization — SURVEY §2.5 J2 (gap windows).
  *
  * Reference semantics (`amplitude-destination.ts:13-33`): per identity
  * key, a session is a run of events where consecutive gaps are below
  * `gap` (default 30 min); the session id is the epoch-millis of the
  * session's first event.
  *
  * Two equivalent implementations:
  *   - [[sessions]]: `session_window` grouped agg — Spark's native gap
  *     window; one shuffle on the key, streaming-capable (watermark +
  *     append mode) and AQE-coalesced at scale.
  *   - [[tagEvents]]: per-event session tagging via window functions
  *     (lag + running sum) — one shuffle + sort per key; used when each
  *     event must carry its session id (the reference's actual shape).
  */
object Sessionize {

  /** One row per session: key, session start/end, event count. */
  def sessions(events: DataFrame, key: Column, ts: Column,
               gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(key.as("key"), session_window(ts, gap).as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("key"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))

  /** Every event tagged with `session_id` = key + '-' + epoch-millis of the
    * session's first event (amplitude-style id), and `session_idx` (1-based
    * per key). */
  def tagEvents(events: DataFrame, keyName: String, tsName: String,
                gapSeconds: Long = 1800L): DataFrame = {
    val w = Window.partitionBy(col(keyName)).orderBy(col(tsName))
    val gapBreak = (unix_timestamp(col(tsName)) -
      unix_timestamp(lag(col(tsName), 1).over(w)) > gapSeconds) ||
      lag(col(tsName), 1).over(w).isNull
    val tagged = events
      .withColumn("_new_session", gapBreak.cast("int"))
      .withColumn("session_idx",
        sum(col("_new_session")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    val w2 = Window.partitionBy(col(keyName), col("session_idx"))
    tagged
      .withColumn("session_start", min(col(tsName)).over(w2))
      .withColumn("session_id",
        concat(col(keyName), lit("-"),
          (unix_timestamp(col("session_start")) * 1000).cast("long")))
      .drop("_new_session")
  }
}

package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** User recognition — SURVEY §2.5 J1: the stateful anonymous->identified
  * self-join (ref `libs/core-functions/src/functions/user-recognition.ts:
  * 24-108` + Mongo buffer `lib/mongodb.ts:40-84`).
  *
  * Semantics: events carry an `anonymous_id`; an event may also carry an
  * identity (`user_id`). Anonymous events are buffered per anonymous_id for
  * `lookbackDays` (30 d default). When an identified event arrives for the
  * same anonymous_id, all buffered events are re-emitted with the identity
  * merged in; downstream the sink's dedup-on-`message_id` merge makes the
  * re-emitted rows overwrite the originals.
  *
  * [[resolveBatch]] is the batch/oracle-checkable equivalent: identity =
  * first identity observed for the anonymous_id within the lookback window
  * *after* the event (the streaming operator attaches the identity that
  * triggers eviction, i.e. the first identify at-or-after buffering).
  * [[streamingResolve]] is the production streaming form:
  * `flatMapGroupsWithState` with event-time timeout as the 30-day TTL
  * (RocksDB-backed state at scale, one shuffle on anonymous_id).
  */
object UserRecognition {

  /** Batch resolution: fill missing user_id from the earliest identified
    * event of the same anonymous_id that falls within
    * [event_ts, event_ts + lookbackDays]. Single shuffle on anonymous_id
    * (window functions), no join. */
  def resolveBatch(events: DataFrame, lookbackDays: Int = 30): DataFrame = {
    val w = Window.partitionBy(col("anonymous_id"))
      .orderBy(col("timestamp"), col("message_id"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val nextIdentityTs = min(when(col("user_id").isNotNull, col("timestamp"))).over(w)
    val nextIdentity = first(when(col("user_id").isNotNull, col("user_id")),
      ignoreNulls = true).over(w)
    events
      .withColumn("_rec_user_id",
        when(col("user_id").isNotNull, col("user_id"))
          .when(nextIdentityTs.isNotNull &&
            nextIdentityTs <= col("timestamp") + expr(s"INTERVAL $lookbackDays DAYS"),
            nextIdentity))
      .withColumn("recognized",
        col("user_id").isNull && col("_rec_user_id").isNotNull)
      .withColumn("user_id", col("_rec_user_id"))
      .drop("_rec_user_id")
  }

  // ---- streaming form ------------------------------------------------

  case class UREvent(message_id: String, anonymous_id: String,
                     user_id: Option[String], timestamp: Timestamp)
  case class URState(buffered: List[UREvent])

  /** flatMapGroupsWithState transition: buffer anonymous events; on an
    * identified event, evict + merge + emit buffered∪current; TTL via
    * event-time timeout = lookback window. */
  def urTransition(lookbackMs: Long)(
      key: String, rows: Iterator[UREvent], state: GroupState[URState]): Iterator[UREvent] = {
    if (state.hasTimedOut) {
      val out = state.getOption.map(_.buffered).getOrElse(Nil)
      state.remove()
      return out.iterator // flush unrecognized on expiry
    }
    val sorted = rows.toSeq.sortBy(_.timestamp.getTime)
    var buffered = state.getOption.map(_.buffered).getOrElse(Nil)
    val out = scala.collection.mutable.ArrayBuffer[UREvent]()
    sorted.foreach { e =>
      e.user_id match {
        case Some(uid) =>
          out ++= buffered.map(b => b.copy(user_id = Some(uid)))
          buffered = Nil
          out += e
        case None =>
          buffered = buffered :+ e
      }
    }
    if (buffered.nonEmpty) {
      state.update(URState(buffered))
      val maxTs = buffered.map(_.timestamp.getTime).max
      if (state.getCurrentWatermarkMs() < maxTs + lookbackMs)
        state.setTimeoutTimestamp(maxTs + lookbackMs)
    } else state.remove()
    out.iterator
  }

  /** Streaming user recognition over an envelope-shaped stream. */
  def streamingResolve(events: DataFrame, lookbackDays: Int = 30,
                       watermark: String = "1 hour"): Dataset[UREvent] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("message_id"), col("anonymous_id"), col("user_id"),
        col("timestamp"))
      .withWatermark("timestamp", watermark)
      .as[UREvent]
      .groupByKey(_.anonymous_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        urTransition(lookbackDays * 86400000L))
  }
}

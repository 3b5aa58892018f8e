package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Profile builder — SURVEY §2.5 J5 / §2.6 A6–A7 / §3.3.
  *
  * The reference (`services/profiles/src/builder.ts:196-247`) groups a
  * user's full event history, folds identify-traits left-to-right in
  * timestamp order (`Object.assign` semantics = last non-null wins,
  * `builder.ts:211-220`), then runs a user-defined reduce over the events
  * to produce `{user_id, traits, custom_properties, updated_at}`.
  *
  * Spark-first shape: one `groupBy(user_id)` hash aggregation (partial
  * map-side combine => single shuffle of partial buffers, not raw events)
  * for the built-in profile; a typed [[Aggregator]] ([[profileUdf]]) for
  * the pluggable reduce surface (§2.9), usable via `groupByKey(...).agg`.
  * The reference's 240-way hash sharding (`profiles-functions.ts:13`) is
  * Spark's shuffle partitioning — no manual partition_id column needed.
  */
object Profiles {

  /** Built-in profile: traits fold + activity stats, pure built-in aggs.
    * `max_by` gives "last non-null in timestamp order" = Object.assign
    * fold; events with null trait don't participate (filtered `when`). */
  def buildProfiles(events: DataFrame): DataFrame =
    events
      .filter(col("user_id").isNotNull)
      .groupBy(col("user_id"))
      .agg(
        max_by(get_json_object(col("traits"), "$.email"),
          when(get_json_object(col("traits"), "$.email").isNotNull,
            col("timestamp"))).as("email"),
        max_by(get_json_object(col("traits"), "$.name"),
          when(get_json_object(col("traits"), "$.name").isNotNull,
            col("timestamp"))).as("name"),
        max_by(col("anonymous_id"),
          when(col("anonymous_id").isNotNull, col("timestamp")))
          .as("last_anonymous_id"),
        count(lit(1)).as("n_events"),
        min(col("timestamp")).as("first_seen"),
        max(col("timestamp")).as("last_seen"),
        sum(when(col("type") === "track", 1).otherwise(0)).as("n_tracks"),
        sum(when(col("type") === "page", 1).otherwise(0)).as("n_pages"))
      .withColumn("updated_at", col("last_seen"))

  // ---- pluggable profile-UDF surface (§2.9) --------------------------

  case class ProfileEvent(user_id: String, `type`: String, event: String,
                          timestamp: Timestamp, properties: String,
                          traits: String)
  case class ProfileResult(user_id: String, properties: Map[String, String],
                           updated_at: Timestamp)

  /** The profile-function surface: full per-user event iterable -> custom
    * properties map (ref `types/protocols/profile.d.ts:8-16`). Scala
    * function instead of a JS isolate; same contract. */
  type ProfileFunction = (String, Seq[ProfileEvent]) => Map[String, String]

  /** Typed Aggregator wrapping a ProfileFunction. Buffers the user's
    * events (bounded by the profile window upstream) and applies the
    * reduce at merge-final time. */
  class ProfileAggregator(fn: ProfileFunction)
      extends Aggregator[ProfileEvent, List[ProfileEvent], Map[String, String]] {
    def zero: List[ProfileEvent] = Nil
    def reduce(b: List[ProfileEvent], e: ProfileEvent): List[ProfileEvent] = e :: b
    def merge(a: List[ProfileEvent], b: List[ProfileEvent]): List[ProfileEvent] = a ++ b
    def finish(b: List[ProfileEvent]): Map[String, String] = {
      val sorted = b.sortBy(_.timestamp.getTime)
      if (sorted.isEmpty) Map.empty
      else fn(sorted.head.user_id, sorted)
    }
    def bufferEncoder: Encoder[List[ProfileEvent]] =
      Encoders.kryo[List[ProfileEvent]]
    def outputEncoder: Encoder[Map[String, String]] =
      Encoders.kryo[Map[String, String]]
  }

  /** Run a profile function over the event history (incremental batch:
    * caller filters events to the changed-users set / profile window —
    * SURVEY S5/S6). */
  def runProfileFunction(events: DataFrame, fn: ProfileFunction): Dataset[ProfileResult] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), col("type"), col("event"), col("timestamp"),
        col("properties"), col("traits"))
      .as[ProfileEvent]
      .groupByKey(_.user_id)
      .mapGroups { (uid, it) =>
        val evs = it.toSeq.sortBy(_.timestamp.getTime)
        ProfileResult(uid, fn(uid, evs), evs.last.timestamp)
      }
  }

  /** S6 changed-users scan: distinct users with events in (lo, hi]
    * (ref `builder.ts:305-342`). */
  def changedUsers(events: DataFrame, lo: Timestamp, hi: Timestamp): DataFrame =
    events
      .filter(col("timestamp") > lit(lo) && col("timestamp") <= lit(hi) &&
        col("user_id").isNotNull)
      .select(col("user_id")).distinct()
}

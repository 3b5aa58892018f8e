package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Scalars

/** SaaS destination projections — SURVEY §2.2 K3: the pure column-mapping
  * part of each HTTP destination (the network POST is a sink concern;
  * the projection is what's testable and what the reference unit-tests).
  *
  * Each returns the destination's wire-format rows as a DataFrame; at
  * scale these are narrow projections feeding `foreachPartition` HTTP
  * emitters with per-partition connection reuse.
  */
object SaasProjections {

  private def ctx(name: String): Column = col(s"context.$name")

  /** Mixpanel track projection (ref `mixpanel-destination.ts:334-420`):
    * distinct_id preference user_id > anonymous_id, md5 $insert_id,
    * $-prefixed reserved traits, UTM fields. */
  def mixpanelTrack(events: DataFrame): DataFrame =
    events.filter(col("type") === "track").select(
      coalesce(col("user_id"), col("anonymous_id")).as("distinct_id"),
      col("event").as("event"),
      (unix_timestamp(col("timestamp")) * 1000).as("time"),
      Scalars.md5InsertId(col("message_id")).as("insert_id"),
      ctx("ip").as("ip"),
      ctx("campaign.source").as("utm_source"),
      ctx("campaign.medium").as("utm_medium"),
      ctx("page.url").as("current_url"),
      ctx("geo.city").as("city"),
      ctx("geo.country").as("country_code"))

  /** Mixpanel identify ($set) projection: reserved traits get the `$`
    * prefix (ref :14-23,127-132). */
  def mixpanelIdentify(events: DataFrame): DataFrame =
    events.filter(col("type") === "identify").select(
      coalesce(col("user_id"), col("anonymous_id")).as("distinct_id"),
      get_json_object(col("traits"), "$.email").as("$email"),
      get_json_object(col("traits"), "$.name").as("$name"),
      ctx("geo.city").as("$city"))

  /** GA4 event projection (ref `ga4-destination.ts`): client_id from
    * ga4 clientId else fingerprint, mapped+sanitized event name,
    * session_id, engagement. */
  def ga4Events(events: DataFrame): DataFrame =
    events.filter(col("type").isin("track", "page")).select(
      coalesce(ctx("client_ids.ga4"),
        Scalars.fingerprintId(ctx("ip"), ctx("user_agent"))).as("client_id"),
      col("user_id").as("user_id"),
      Scalars.ga4EventName(
        when(col("type") === "page", "page_view").otherwise(col("event")))
        .as("event_name"),
      (unix_timestamp(col("timestamp")) * 1000000).as("timestamp_micros"),
      ctx("page.url").as("page_location"),
      ctx("page.title").as("page_title"))

  /** Facebook conversions projection (ref `facebook-conversions.ts`):
    * sha256-hashed lowercase/trimmed PII, event time in seconds. */
  def facebookConversions(events: DataFrame): DataFrame =
    events.filter(col("type") === "track").select(
      col("event").as("event_name"),
      unix_timestamp(col("timestamp")).as("event_time"),
      Scalars.sha256Pii(get_json_object(col("traits"), "$.email")).as("em"),
      Scalars.sha256Pii(coalesce(col("user_id"), col("anonymous_id"))).as("external_id"),
      ctx("ip").as("client_ip_address"),
      ctx("user_agent").as("client_user_agent"),
      ctx("page.url").as("event_source_url"))

  /** Intercom/webhook-style passthrough with event allow-list is covered
    * by Layouts.eventFilter + passthrough. */
}

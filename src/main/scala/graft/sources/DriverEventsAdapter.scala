package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.schema.EventSchema

/** Adapts the driver's flat `events` test table into the
  * AnalyticsServerEvent envelope ([[EventSchema.envelope]]).
  *
  * Plays the role of the reference's client-side event builder
  * (`libs/jitsu-js/src/analytics-plugin.ts:406-478`): URL construction, UTM
  * stamping, ids, timestamps. Every derived field is a deterministic pure
  * function of (event_id, user_id, ts, event_type, value, props) expressible
  * in ANSI SQL, so downstream operators stay DuckDB-oracle-checkable.
  *
  * Identity model used across the operator tests:
  *   - every event carries `anonymous_id = 'a<user_id>'`
  *   - `user_id = 'u<user_id>'` is present only on signup/purchase events;
  *     page/click/error events are anonymous and must be recovered by the
  *     user-recognition operator (SURVEY §2.5 J1).
  */
object DriverEventsAdapter {

  /** type mapping: signup -> identify, view -> page, rest -> track */
  val typeCol: Column =
    when(col("event_type") === "signup", "identify")
      .when(col("event_type") === "view", "page")
      .otherwise("track")

  def toEnvelope(raw: DataFrame): DataFrame = {
    val url = concat(
      lit("https://shop.example.com/p/"), col("event_type"),
      lit("?utm_source=src"), pmod(col("user_id"), lit(5)),
      lit("&utm_medium=cpc&ref="), pmod(col("event_id"), lit(7)))
    val referrer = concat(lit("https://ref"), pmod(col("event_id"), lit(4)),
      lit(".example.org/x"))
    val ua = element_at(
      array(
        lit("Mozilla/5.0 (Macintosh) AppleWebKit/537.36 Chrome/120.0 Safari/537.36"),
        lit("Mozilla/5.0 (iPhone; CPU iPhone OS 17_0 like Mac OS X) Safari/604.1"),
        lit("Googlebot/2.1 (+http://www.google.com/bot.html)")),
      (pmod(col("event_id"), lit(3)) + 1).cast("int"))
    val ip = concat(
      lit("10."), pmod(col("user_id"), lit(200)),
      lit("."), pmod(col("event_id"), lit(250)),
      lit("."), pmod(col("event_id"), lit(254)) + 1).cast("string")
    val country = element_at(
      array(lit("US"), lit("DE"), lit("FR"), lit("GB"), lit("CN")),
      (pmod(col("user_id"), lit(5)) + 1).cast("int"))
    val city = element_at(
      array(lit("New York"), lit("Berlin"), lit("Paris"), lit("London"), lit("Beijing")),
      (pmod(col("user_id"), lit(5)) + 1).cast("int"))
    val identified = col("event_type").isin("signup", "purchase")

    raw.select(
      concat(lit("m"), col("event_id")).as("message_id"),
      typeCol.as("type"),
      col("event_type").as("event"),
      col("ts").cast("timestamp").as("timestamp"),
      col("ts").cast("timestamp").as("sent_at"),
      (col("ts").cast("timestamp") + expr("INTERVAL 1 SECOND")).as("received_at"),
      ip.as("request_ip"),
      concat(lit("a"), col("user_id")).as("anonymous_id"),
      when(identified, concat(lit("u"), col("user_id"))).as("user_id"),
      lit(null).cast("string").as("group_id"),
      lit(null).cast("string").as("previous_id"),
      concat(lit("wk"), pmod(col("user_id"), lit(3))).as("write_key"),
      concat(lit("c"), pmod(col("event_id"), lit(4))).as("connection_id"),
      lit(null).cast("string").as("table_name"),
      concat(lit("{\"k\": "), get_json_object(col("props"), "$.k"),
        lit(", \"value\": "), format_string("%.2f", col("value")),
        lit("}")).as("properties"),
      when(col("event_type") === "signup",
        concat(lit("{\"email\": \"user"), col("user_id"),
          lit("@example.com\", \"name\": \"User "), col("user_id"),
          lit("\"}"))).as("traits"),
      struct(
        ip.as("ip"),
        element_at(array(lit("en-US"), lit("de-DE"), lit("fr-FR")),
          (pmod(col("user_id"), lit(3)) + 1).cast("int")).as("locale"),
        ua.as("user_agent"),
        struct(
          url.as("url"),
          concat(lit("/p/"), col("event_type")).as("path"),
          lit("shop.example.com").as("host"),
          concat(lit("utm_source=src"), pmod(col("user_id"), lit(5)),
            lit("&utm_medium=cpc&ref="), pmod(col("event_id"), lit(7))).as("search"),
          concat(lit("Page "), col("event_type")).as("title"),
          referrer.as("referrer"),
          concat(lit("ref"), pmod(col("event_id"), lit(4)),
            lit(".example.org")).as("referring_domain")).as("page"),
        struct(
          lit(null).cast("string").as("name"),
          concat(lit("src"), pmod(col("user_id"), lit(5))).as("source"),
          lit("cpc").as("medium"),
          lit(null).cast("string").as("term"),
          lit(null).cast("string").as("content")).as("campaign"),
        struct(
          lit(null).cast("string").as("continent"),
          country.as("country"),
          lit(null).cast("string").as("region"),
          city.as("city"),
          lit(null).cast("string").as("postal_code"),
          (pmod(col("user_id"), lit(5)).cast("double") * 10.0 + 0.5).as("lat"),
          (pmod(col("user_id"), lit(5)).cast("double") * 20.0 + 0.5).as("lon"),
          lit("UTC").as("timezone")).as("geo"),
        lit(null).cast(EventSchema.uaStruct).as("parsed_ua"),
        struct(
          concat(lit("ga-"), col("user_id")).as("ga4"),
          lit(null).cast("string").as("fbc"),
          lit(null).cast("string").as("fbp")).as("client_ids"),
        struct(
          (lit(1280) + lit(640) * pmod(col("user_id"), lit(2))).cast("int").as("width"),
          (lit(720) + lit(360) * pmod(col("user_id"), lit(2))).cast("int").as("height"),
          (lit(1.0) + pmod(col("user_id"), lit(2))).cast("double").as("density")).as("screen"),
        lit(null).cast("string").as("traits")).as("context"))
  }

  def load(spark: SparkSession, sfDir: String): DataFrame =
    toEnvelope(EventSchema.readEvents(spark, sfDir))
}

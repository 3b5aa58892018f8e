package graft.schema

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The AnalyticsServerEvent envelope as a fixed Spark schema.
  *
  * Models the reference event protocol (jitsu `types/protocols/
  * analytics.d.ts:76-130`): a fixed envelope of ids/timestamps/type plus a
  * nested `context` struct, with the *open* parts (`properties`, `traits`,
  * custom context keys) carried as JSON-string columns so arbitrary keys
  * survive without schema churn. Per-table schemas are only inferred at the
  * sink (see [[graft.sinks.SinkRouter]]), mirroring how the reference defers
  * warehouse schema inference to bulker.
  *
  * Scale note: the envelope is a static StructType, so scans project/prune
  * columns natively; only `properties`/`traits` need `get_json_object` /
  * `from_json`, and those stay inside whole-stage codegen.
  */
object EventSchema {

  val EventTypes: Seq[String] =
    Seq("track", "page", "identify", "group", "alias", "screen")

  val pageStruct: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("path", StringType),
    StructField("host", StringType),
    StructField("search", StringType),
    StructField("title", StringType),
    StructField("referrer", StringType),
    StructField("referring_domain", StringType)))

  val campaignStruct: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("source", StringType),
    StructField("medium", StringType),
    StructField("term", StringType),
    StructField("content", StringType)))

  val geoStruct: StructType = StructType(Seq(
    StructField("continent", StringType),
    StructField("country", StringType),
    StructField("region", StringType),
    StructField("city", StringType),
    StructField("postal_code", StringType),
    StructField("lat", DoubleType),
    StructField("lon", DoubleType),
    StructField("timezone", StringType)))

  val uaStruct: StructType = StructType(Seq(
    StructField("name", StringType),      // browser name
    StructField("version", StringType),
    StructField("os_name", StringType),
    StructField("os_version", StringType),
    StructField("device_type", StringType),
    StructField("bot", BooleanType)))

  val clientIdsStruct: StructType = StructType(Seq(
    StructField("ga4", StringType),
    StructField("fbc", StringType),
    StructField("fbp", StringType)))

  val screenStruct: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("density", DoubleType)))

  val contextStruct: StructType = StructType(Seq(
    StructField("ip", StringType),
    StructField("locale", StringType),
    StructField("user_agent", StringType),
    StructField("page", pageStruct),
    StructField("campaign", campaignStruct),
    StructField("geo", geoStruct),
    StructField("parsed_ua", uaStruct),
    StructField("client_ids", clientIdsStruct),
    StructField("screen", screenStruct),
    StructField("traits", StringType)))   // open map -> JSON string

  /** Full server-side envelope (client event + ServerContext). */
  val envelope: StructType = StructType(Seq(
    StructField("message_id", StringType, nullable = false),
    StructField("type", StringType, nullable = false),
    StructField("event", StringType),
    StructField("timestamp", TimestampType),
    StructField("sent_at", TimestampType),
    StructField("received_at", TimestampType),
    StructField("request_ip", StringType),
    StructField("anonymous_id", StringType),
    StructField("user_id", StringType),
    StructField("group_id", StringType),
    StructField("previous_id", StringType),
    StructField("write_key", StringType),
    StructField("connection_id", StringType),
    StructField("table_name", StringType), // ProcessingContext $table
    StructField("properties", StringType), // open map -> JSON string
    StructField("traits", StringType),     // open map -> JSON string
    StructField("context", contextStruct)))

  /** Parse a stream/batch of raw JSON event strings into the envelope.
    * Unknown keys are dropped; missing keys are null; `message_id` is
    * filled with a uuid when absent (ref analytics-plugin.ts:464).
    */
  def fromJson(raw: Dataset[String]): DataFrame = {
    val parsed = raw.select(from_json(col("value"), envelope).as("e"))
      .select("e.*")
    parsed.withColumn("message_id",
      coalesce(col("message_id"), expr("uuid()")))
  }

  /** Read the driver's events table. Its `ts` is parquet TIMESTAMP(NANOS),
    * which Spark reads as LongType (nanos since epoch) under
    * `spark.sql.legacy.parquet.nanosAsLong`; convert to microsecond
    * TimestampType (floor), matching DuckDB's CAST(ts_ns AS TIMESTAMP). */
  def readEvents(spark: SparkSession, sfDir: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/events.parquet")
    df.schema("ts").dataType match {
      case LongType =>
        // integer division: FP /1000 loses sub-microsecond precision at
        // ~1.7e18 nanos magnitudes
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => df
    }
  }
}

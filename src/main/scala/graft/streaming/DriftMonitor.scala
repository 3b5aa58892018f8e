package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Live volume-drift monitor — the streaming form of ts_changepoint:
  * every micro-batch lands its per-day event-count DELTAS in a
  * `_batch=<id>` partition (crash-replay idempotent, the
  * [[Leaderboard]] commit shape), then refits the EXACT CUSUM
  * level-shift scan ([[graft.operators.TimeSeries.cusumChangepoint]])
  * over the summed day counts and snapshots the full day frame per
  * batch. Day counts are additive, so the monitor never rescans old
  * batches — the snapshot after batch N is bit-identical to a batch
  * CUSUM over everything ingested through N (the identity the oracle
  * gate checks).
  *
  * This is the ingest-volume alarm a pipeline runs next to its
  * collector: "did the level shift, and on which day" answered
  * exactly, per batch, without a rescan.
  *
  * Scale shape: per batch one map-side day aggregation of the new
  * events, a day-sized delta write, and a refit over the
  * calendar-bounded day table. State never grows with event volume,
  * only with the calendar span. */
object DriftMonitor {

  def countsDir(warehouseDir: String) = s"$warehouseDir/dm_counts"
  def snapshotsDir(warehouseDir: String) = s"$warehouseDir/dm_snapshots"

  /** `inputDir`: the staged envelope-JSON stream
    * ([[EventPipeline.alignmentEvents]] shape). The monitored signal:
    * scored (non-null-value) events per day — heartbeats and
    * sentinels carry no value and stay out of the level. */
  def start(spark: SparkSession, inputDir: String, warehouseDir: String,
            checkpointDir: String,
            trigger: Trigger = Trigger.AvailableNow(),
            maxFilesPerTrigger: Int = 32,
            statePartitions: Int = 0,
            stateStore: String = "hdfs"): StreamingQuery = {
    val session = EventPipeline.tunedSession(spark, statePartitions,
      stateStore)
    val events = EventPipeline.alignmentEvents(session, inputDir,
      maxFilesPerTrigger)
    val daily = events
      .filter(col("value").isNotNull)
      .select(to_date(col("ts")).as("d"))
    daily.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(spark, warehouseDir, batch, batchId)
      }
      .start()
  }

  /** One micro-batch: land this batch's day-count deltas idempotently,
    * refit the CUSUM scan from every delta committed at or before this
    * batch, snapshot the full day frame. */
  private[graft] def ingestBatch(spark: SparkSession,
                                 warehouseDir: String,
                                 batch: DataFrame, batchId: Long): Unit = {
    val cDir = countsDir(warehouseDir)
    val sDir = snapshotsDir(warehouseDir)
    graft.sinks.CommitLog.clearBatchScope(spark, cDir, batchId)
    graft.sinks.CommitLog.clearBatchScope(spark, sDir, batchId)
    batch
      .groupBy(col("d"))
      .agg(count(lit(1)).as("dn"))
      .withColumn("_batch", lit(batchId))
      .write.mode("append").partitionBy("_batch").parquet(cDir)
    if (!Leaderboard.hasBatchPartitions(spark, cDir)) return
    // refit from counts committed at or before THIS batch id — the
    // crash-replay audit-trail rule ([[Leaderboard.ingestBatch]])
    val daily = spark.read.parquet(cDir)
      .filter(col("_batch") <= batchId)
      .groupBy(col("d")).agg(sum(col("dn")).as("n"))
    graft.operators.TimeSeries.cusumChangepoint(daily)
      .withColumn("batch_id", lit(batchId))
      .withColumn("_batch", lit(batchId))
      .coalesce(1)
      .write.mode("append").partitionBy("_batch").parquet(sDir)
    ()
  }

  /** The current drift snapshot (full day frame of the newest
    * committed batch) — or an EMPTY frame of the same schema when
    * nothing has ever landed. */
  def current(spark: SparkSession, warehouseDir: String): DataFrame = {
    if (!Leaderboard.hasBatchPartitions(spark, snapshotsDir(warehouseDir))) {
      import org.apache.spark.sql.types._
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(
          StructField("d", DateType), StructField("n", LongType),
          StructField("dev_milli", LongType),
          StructField("cusum_milli", LongType),
          StructField("is_peak", BooleanType),
          StructField("batch_id", LongType))))
    }
    val snaps = spark.read.parquet(snapshotsDir(warehouseDir))
      .drop("_batch")
    snaps.join(
      snaps.agg(max(col("batch_id")).as("batch_id")), Seq("batch_id"))
  }
}

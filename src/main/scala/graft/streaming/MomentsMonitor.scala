package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Live distribution-shape monitor — the streaming form of
  * st_moments: every micro-batch lands its exact power-sum PARTIALS
  * (n, Σx, Σx², Σx³, Σx⁴ over the event value in cents, decimals —
  * [[graft.operators.Stats.momentsPartials]]' row shape) in a
  * `_batch=<id>` partition (crash-replay idempotent, the
  * [[DriftMonitor]] commit shape), then finalizes mean / M2 /
  * skewness / excess kurtosis over the SUMMED partials and snapshots
  * one report row per batch. Power sums are additive, so the monitor
  * never rescans old batches — the snapshot after batch N is
  * bit-identical to [[graft.operators.Stats.momentsProfile]] over
  * everything ingested through N (exactly the merge identity the
  * batch `st_moments_merge` gate proves; the streaming gate checks it
  * against the whole-corpus oracle).
  *
  * The alarm it carries: a reward/score distribution whose skewness
  * flips sign or whose kurtosis spikes has changed shape long before
  * the mean moves — the moment profile catches reward hacking and
  * score saturation that a level monitor ([[DriftMonitor]]) cannot.
  *
  * Scale shape: per batch one map-side fold of the new events to ONE
  * partial row, a 1-row delta write, and a finalize over the
  * batch-count-sized partial table. State never grows with event
  * volume. */
object MomentsMonitor {

  def partialsDir(warehouseDir: String) = s"$warehouseDir/mm_partials"
  def snapshotsDir(warehouseDir: String) = s"$warehouseDir/mm_snapshots"

  /** `inputDir`: the staged envelope-JSON stream
    * ([[EventPipeline.alignmentEvents]] shape). Monitored signal: the
    * scored value in cents (`round(value·100)` — the
    * [[graft.operators.Conversations]] convention); null-value
    * heartbeats stay out. */
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
    val cents = events
      .filter(col("value").isNotNull)
      .select(round(col("value") * 100).cast("long").as("x"))
    cents.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(spark, warehouseDir, batch, batchId)
      }
      .start()
  }

  /** One micro-batch: land this batch's 1-row power-sum partial
    * idempotently, finalize over every partial committed at or before
    * this batch, snapshot the report row. */
  private[graft] def ingestBatch(spark: SparkSession,
                                 warehouseDir: String,
                                 batch: DataFrame, batchId: Long): Unit = {
    val pDir = partialsDir(warehouseDir)
    val sDir = snapshotsDir(warehouseDir)
    graft.sinks.CommitLog.clearBatchScope(spark, pDir, batchId)
    graft.sinks.CommitLog.clearBatchScope(spark, sDir, batchId)
    graft.operators.Stats.momentsPartials(batch, "x")
      .withColumn("_batch", lit(batchId))
      .coalesce(1)
      .write.mode("append").partitionBy("_batch").parquet(pDir)
    if (!Leaderboard.hasBatchPartitions(spark, pDir)) return
    val partials = spark.read.parquet(pDir)
      .filter(col("_batch") <= batchId)
      .drop("_batch")
    graft.operators.Stats.momentsFromPartials(partials)
      .withColumn("batch_id", lit(batchId))
      .withColumn("_batch", lit(batchId))
      .coalesce(1)
      .write.mode("append").partitionBy("_batch").parquet(sDir)
    ()
  }

  /** The current shape snapshot (the newest committed batch's report
    * row) — or an EMPTY frame of the same schema when nothing has
    * ever landed. */
  def current(spark: SparkSession, warehouseDir: String): DataFrame = {
    if (!Leaderboard.hasBatchPartitions(spark, snapshotsDir(warehouseDir))) {
      import org.apache.spark.sql.types._
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(
          StructField("n", LongType),
          StructField("mean_micro", LongType),
          StructField("m2", LongType),
          StructField("skew_milli", LongType),
          StructField("kurt_excess_milli", LongType),
          StructField("batch_id", LongType))))
    }
    val snaps = spark.read.parquet(snapshotsDir(warehouseDir))
      .drop("_batch")
    snaps.join(
      snaps.agg(max(col("batch_id")).as("batch_id")), Seq("batch_id"))
  }
}

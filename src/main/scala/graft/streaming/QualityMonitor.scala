package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.{EvalMetrics, Stats}

/** Live classifier-quality monitor — the streaming form of the
  * eval_auc / st_ks pair: every micro-batch lands its per-score-bucket
  * (pos, neg) count DELTAS in a `_batch=<id>` partition (crash-replay
  * idempotent, the [[Leaderboard]] commit shape), then refits the
  * EXACT tie-corrected ROC AUC ([[EvalMetrics.rocAucFromCounts]]) and
  * the exact KS statistic ([[Stats.ksFromCounts]]) over the summed
  * counts and snapshots both per batch. The counts are additive, so
  * the monitor never rescores old batches — the running numbers after
  * batch N are bit-identical to a batch evaluation of everything
  * ingested through N (that identity is what the oracle gate checks).
  *
  * This is the drift alarm a scored ingest runs next to the pipeline:
  * "is the quality signal still separating the classes it separated
  * yesterday" answered exactly, per batch, without a rescan.
  *
  * Scale shape: per batch one map-side bucket aggregation of the new
  * events (score buckets are bounded by construction — the signal is
  * integer-bucketed before counting), a bucket-sized delta write, and
  * a refit over the bucket-cardinality count table. State never grows
  * with event volume, only with score cardinality. */
object QualityMonitor {

  def countsDir(warehouseDir: String) = s"$warehouseDir/qm_counts"
  def snapshotsDir(warehouseDir: String) = s"$warehouseDir/qm_snapshots"

  /** `inputDir`: the staged envelope-JSON stream
    * ([[EventPipeline.alignmentEvents]] shape). The monitored signal:
    * score bucket = whole currency units (cents div 100) of the
    * event's value, positive label = a `purchase` event; null-valued
    * events are excluded. */
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
    val scored = events
      .filter(col("value").isNotNull)
      .select(
        expr("CAST(ROUND(value * 100) AS LONG) div 100L").as("s"),
        when(col("event_type") === "purchase", 1L).otherwise(0L)
          .as("p"))
    scored.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(spark, warehouseDir, batch, batchId)
      }
      .start()
  }

  /** One micro-batch: land this batch's bucket-count deltas
    * idempotently, refit AUC + KS from every delta committed at or
    * before this batch, snapshot. */
  private[graft] def ingestBatch(spark: SparkSession,
                                 warehouseDir: String,
                                 batch: DataFrame, batchId: Long): Unit = {
    val cDir = countsDir(warehouseDir)
    val sDir = snapshotsDir(warehouseDir)
    graft.sinks.CommitLog.clearBatchScope(spark, cDir, batchId)
    graft.sinks.CommitLog.clearBatchScope(spark, sDir, batchId)
    batch
      .groupBy(col("s"))
      .agg(sum(col("p")).as("np"), sum(lit(1L) - col("p")).as("ng"))
      .withColumn("_batch", lit(batchId))
      .write.mode("append").partitionBy("_batch").parquet(cDir)
    if (!Leaderboard.hasBatchPartitions(spark, cDir)) return
    // refit from counts committed at or before THIS batch id — the
    // crash-replay audit-trail rule ([[Leaderboard.ingestBatch]])
    val counts = spark.read.parquet(cDir)
      .filter(col("_batch") <= batchId)
      .select(col("s"), col("np"), col("ng"))
    val auc = EvalMetrics.rocAucFromCounts(counts)
    val ks = Stats.ksFromCounts(counts)
      .select(col("ks_micro"), col("ks_at_score"))
    auc.crossJoin(ks)
      .withColumn("batch_id", lit(batchId))
      .withColumn("_batch", lit(batchId))
      .coalesce(1)
      .write.mode("append").partitionBy("_batch").parquet(sDir)
    ()
  }

  /** The current quality snapshot: the newest committed batch — or an
    * EMPTY frame of the same schema when nothing has ever landed. */
  def current(spark: SparkSession, warehouseDir: String): DataFrame = {
    if (!Leaderboard.hasBatchPartitions(spark, snapshotsDir(warehouseDir))) {
      import org.apache.spark.sql.types._
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(
          StructField("n_pos", LongType), StructField("n_neg", LongType),
          StructField("win_pairs", LongType),
          StructField("tie_pairs", LongType),
          StructField("auc_micro", LongType),
          StructField("ks_micro", LongType),
          StructField("ks_at_score", LongType),
          StructField("batch_id", LongType))))
    }
    val snaps = spark.read.parquet(snapshotsDir(warehouseDir))
      .drop("_batch")
    snaps.join(
      snaps.agg(max(col("batch_id")).as("batch_id")), Seq("batch_id"))
  }
}

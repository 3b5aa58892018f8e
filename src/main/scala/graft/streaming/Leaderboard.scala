package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.{Conversations, EvalMetrics}

/** Live preference leaderboard — the streaming form of the Bradley-
  * Terry loop: closed candidate days emit (winner, loser) judgments
  * ([[Conversations.comparisonsStream]]), every micro-batch lands its
  * judgment-count DELTAS in a `_batch=<id>` partition (crash-replay
  * idempotent: replay deletes-then-rewrites its own partition — the
  * [[CorpusIngest]] commit shape), and the exact integer MM fit
  * ([[EvalMetrics.bradleyTerryFromCounts]]) re-runs over the summed
  * counts, writing a ranked snapshot per batch.
  *
  * Scale shape: per batch the stream pays the one-exchange extremes
  * aggregation (state per open group = two structs) plus a K²-sized
  * counts write and a K-sized refit — the leaderboard itself never
  * grows with the event volume, only with the number of players.
  * Snapshot history is the audit trail (`batch_id` stamped); readers
  * take the max batch. The audit trail holds under crash-replay too:
  * each refit reads only `_batch <= batchId` partitions, so a
  * replayed batch N rewrites snapshot N from the counts as of batch N
  * even when later batches have already committed.
  */
object Leaderboard {

  def countsDir(warehouseDir: String) = s"$warehouseDir/bt_counts"
  def snapshotsDir(warehouseDir: String) = s"$warehouseDir/leaderboard"

  def start(spark: SparkSession, inputDir: String, warehouseDir: String,
            checkpointDir: String,
            watermark: String = "1 hour",
            iters: Int = 3,
            trigger: Trigger = Trigger.AvailableNow(),
            maxFilesPerTrigger: Int = 32,
            statePartitions: Int = 0,
            stateStore: String = "hdfs"): StreamingQuery = {
    val session = EventPipeline.tunedSession(spark, statePartitions,
      stateStore)
    val events = EventPipeline.alignmentEvents(session, inputDir,
      maxFilesPerTrigger)
    val judgments = Conversations.comparisonsStream(events, watermark)
    judgments.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(spark, warehouseDir, batch, batchId, iters)
      }
      .start()
  }

  /** One micro-batch: land this batch's count deltas idempotently,
    * refit from every delta committed at or before this batch,
    * snapshot the ranking. */
  private[graft] def ingestBatch(spark: SparkSession, warehouseDir: String,
                                 batch: DataFrame, batchId: Long,
                                 iters: Int): Unit = {
    val cDir = countsDir(warehouseDir)
    val sDir = snapshotsDir(warehouseDir)
    // replay-side half of the batch-scoped commit: a re-delivered
    // batch id deletes its own partitions before rewriting them
    graft.sinks.CommitLog.clearBatchScope(spark, cDir, batchId)
    graft.sinks.CommitLog.clearBatchScope(spark, sDir, batchId)
    batch
      .groupBy(col("winner"), col("loser"))
      .agg(count(lit(1)).as("n"))
      .withColumn("_batch", lit(batchId))
      .write.mode("append").partitionBy("_batch").parquet(cDir)
    // no day has closed yet (an empty batch writes no partition):
    // there is nothing to rank — the first snapshot waits for the
    // first judgment. Hadoop FS, not java.io.File: the warehouse may
    // be an hdfs:// or file:// URI where a local listing silently
    // returns nothing and would skip the refit forever.
    if (!hasBatchPartitions(spark, cDir)) return
    // refit ONLY from counts committed at or before THIS batch id
    // (partition-pruned on `_batch`): a crash-replayed batch N — after
    // N+1..M already committed — must rewrite snapshot batch_id=N from
    // the counts that existed as of batch N, or the per-batch snapshot
    // history stops being an audit trail. In normal (monotonic)
    // operation the filter includes every partition, so this is free.
    val fit = EvalMetrics.bradleyTerryFromCounts(
      spark.read.parquet(cDir).filter(col("_batch") <= batchId)
        .select("winner", "loser", "n"),
      "winner", "loser", "n", iters)
    fit.withColumn("batch_id", lit(batchId))
      .withColumn("_batch", lit(batchId))
      .coalesce(1)
      .write.mode("append").partitionBy("_batch").parquet(sDir)
    ()
  }

  /** `path` has at least one committed `_batch=` partition — through
    * Hadoop FS, so hdfs:// and file:// warehouses behave like plain
    * local paths. */
  private[streaming] def hasBatchPartitions(spark: SparkSession,
                                            path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) &&
      fs.listStatus(p).exists(_.getPath.getName.startsWith("_batch="))
  }

  /** The current ranking: the newest committed snapshot — or an EMPTY
    * frame (same schema) when no judgment has ever closed, never a
    * path error (the empty-inputs invariant). */
  def current(spark: SparkSession, warehouseDir: String): DataFrame = {
    if (!hasBatchPartitions(spark, snapshotsDir(warehouseDir))) {
      import org.apache.spark.sql.types._
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(
          StructField("player", StringType),
          StructField("n_wins", LongType),
          StructField("n_matches", LongType),
          StructField("strength_micro", LongType),
          StructField("rank", LongType),
          StructField("batch_id", LongType))))
    }
    val snaps = spark.read.parquet(snapshotsDir(warehouseDir))
      .drop("_batch")
    snaps.join(
      snaps.agg(max(col("batch_id")).as("batch_id")), Seq("batch_id"))
  }
}

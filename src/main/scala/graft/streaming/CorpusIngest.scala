package graft.streaming

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.operators.Dedup

/** Streaming incremental corpus construction — the streaming twin of
  * [[graft.operators.Dedup.minhashLshCrossPairs]]: document batches
  * arrive as files, each micro-batch is near-dup-checked against the
  * accumulated SIGNATURE INDEX of everything kept so far, survivors
  * append their signatures to the index, and every document's outcome is
  * recorded. This is the "corpus grows continuously" production shape:
  * per batch the work is O(batch) signature computation plus a bucket
  * join against the stored index — never O(corpus) re-shingling.
  *
  * Drop rule (deterministic, order-free within its scope):
  *  - cross: a new doc is dropped iff some KEPT doc from an earlier
  *    batch has exact shingle-Jaccard >= `threshold` (candidates via
  *    MinHash banding — recall 1-1e-8 at j >= 0.5 with 64x2 bands —
  *    then exact verify, same as the batch operators);
  *  - within-batch: a doc is dropped iff a SMALLER-id doc in the same
  *    batch matches it. A doc similar only
  *    to an already-dropped batch-mate is still dropped — the duplicate
  *    cluster keeps its minimal representative (or its prior match).
  *
  * The index is two parquet tables: `bands` (id, band, bucket — the
  * bucket-join side) and `shingles` (id, shingles — the exact-verify
  * side). At 100 TB the bands table is exactly the stored LSH index a
  * pipeline maintains (compact: numBands ints per doc); the shingle
  * table is the verify column.
  *
  * Appends are IDEMPOTENT under mid-append crash replay: every append
  * (bands, shingles, outcome) lands in a `_batch=<id>` partition, a
  * replay first deletes that batch's partitions and then re-appends
  * (the batch content is deterministic, so the rewrite is
  * byte-identical), and all PRIOR-index reads filter `_batch < id` so
  * a crashed partial append of the current batch is never consulted as
  * "stored" state. This is the same batch-scoped-commit idea as
  * [[graft.sinks.SinkRouter.runOnce]]'s marker, expressed in the table
  * layout itself (a table-format transaction log would subsume it).
  */
object CorpusIngest {

  val DocSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType)))

  /** Process `inputDir` (json-lines doc files, one micro-batch per file
    * in modification-time order) with Trigger.AvailableNow.
    * `shufflePartitions` (0 = inherit) sizes the per-batch joins to the
    * BATCH volume, not the cluster width — the same sizing rule as
    * [[EventPipeline.start]]'s state shards: a small arriving batch
    * over-sharded to the session's width pays fixed per-task overhead
    * across ~10 jobs per micro-batch for nothing. */
  def start(spark: SparkSession, inputDir: String, indexDir: String,
            outDir: String, checkpointDir: String,
            n: Int = 3, threshold: Double = 0.5,
            numHashes: Int = 128, rowsPerBand: Int = 2,
            shufflePartitions: Int = 0,
            compactEvery: Int = 0): StreamingQuery = {
    val session =
      if (shufflePartitions <= 0) spark
      else {
        val s2 = spark.newSession()
        s2.conf.set("spark.sql.shuffle.partitions",
          shufflePartitions.toString)
        s2
      }
    session.readStream
      .schema(DocSchema)
      .option("maxFilesPerTrigger", "1")
      .json(inputDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, indexDir, outDir, n, threshold,
          numHashes, rowsPerBand, batchId)
        // maintenance cadence, between appends (the SinkRouter
        // compactEvery shape): fold batch partitions so index file
        // counts stay bounded over long uptimes
        // fold only batches STRICTLY OLDER than the current one: a
        // replayed batch deletes its own partition before re-appending,
        // and that partition must never have become the consolidation
        // target holding earlier batches' data
        if (compactEvery > 0 && batchId % compactEvery == compactEvery - 1)
          Seq(s"$indexDir/bands", s"$indexDir/shingles", outDir)
            .foreach(compactBatches(batch.sparkSession, _,
              upTo = batchId - 1))
      }
      .start()
  }

  /** Delete `path/_batch=<id>` if present — the replay-side half of the
    * batch-scoped commit ([[graft.sinks.CommitLog.clearBatchScope]]:
    * completes any interrupted compaction first, so a crash
    * mid-compaction can never be read as missing data). */
  private[graft] def clearBatch(spark: SparkSession, path: String,
                                batchId: Long): Unit =
    graft.sinks.CommitLog.clearBatchScope(spark, path, batchId)

  // ---- batch-partition compaction -------------------------------------
  // Every micro-batch adds one `_batch=<id>` directory; at 100 TB /
  // months of uptime that is a file-count problem (listing cost, tiny
  // files). Compaction folds all committed batch partitions into the
  // NEWEST one — semantics preserved exactly, because a consolidated
  // row carries the max batch id, which is <= any future batch's
  // `_batch < id` prior-read filter. The swap commits through the
  // shared [[graft.sinks.CommitLog]] protocol: stage → manifest →
  // delete olds → rename; a crash anywhere rolls FORWARD on the next
  // read.

  private val CompactStaged = ".compact-staged"

  /** Fold the `_batch=` partitions of `path` with id <= `upTo` into the
    * newest of them. Run between batches (e.g. on the streaming
    * `compactEvery` cadence, which passes `upTo = batchId - 1` so a
    * replayed batch's self-delete can never hit the consolidation
    * target) — not concurrently with an in-flight append. No-op for
    * 0 or 1 eligible partitions. */
  def compactBatches(spark: SparkSession, path: String,
                     upTo: Long = Long.MaxValue,
                     subPartitions: Seq[String] = Nil): Unit = {
    import graft.sinks.CommitLog
    CommitLog.recover(spark, path)
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return
    val parts = fs.listStatus(root).filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(_.startsWith("_batch="))
      .flatMap(n => scala.util.Try(n.stripPrefix("_batch=").toLong).toOption)
      .filter(_ <= upTo)
      .sorted
    if (parts.length <= 1) return
    val target = parts.last
    val staged = new org.apache.hadoop.fs.Path(root, CompactStaged)
    fs.delete(staged, true) // stale partial staging from a pre-manifest crash
    // stage the consolidated rows (data columns only — the batch id
    // comes back from the directory name after the swap)
    val consolidated = spark.read.parquet(path)
      .filter(col("_batch") <= upTo).drop("_batch")
    val writer = consolidated.write
    (if (subPartitions.nonEmpty) writer.partitionBy(subPartitions: _*)
     else writer).parquet(staged.toString)
    // commit point + roll-forward: olds deleted, staged renamed into
    // the target scope (the target's own old dir is cleared inside the
    // rename guard, so it survives if the staged dir was consumed)
    CommitLog.commit(spark, path, "compact", CommitLog.Swap(
      deletes = parts.dropRight(1).map(b => s"_batch=$b").toSeq,
      renames = Seq(CommitLog.Rename(CompactStaged, s"_batch=$target"))))
  }

  /** Read a batch-partitioned index table restricted to batches STRICTLY
    * BEFORE `batchId` ([[graft.sinks.CommitLog.readPriorBatches]]). */
  private[graft] def readPrior(spark: SparkSession, path: String,
                               batchId: Long): Option[DataFrame] =
    graft.sinks.CommitLog.readPriorBatches(spark, path, batchId)

  /** One batch against the stored index; also usable directly from a
    * batch job for backfills (pass the backfill's own monotonic batch
    * id). Idempotent per (indexDir, batchId): see the class doc.
    * `batchId` is deliberately NOT defaulted: replay semantics begin by
    * deleting this batch's partitions and prior-index reads consult only
    * `_batch < batchId`, so an implicit constant id would silently turn
    * repeated backfill calls into delete-and-disable-dedup. */
  def processBatch(batch: DataFrame, indexDir: String, outDir: String,
                   n: Int, threshold: Double,
                   numHashes: Int, rowsPerBand: Int,
                   batchId: Long): Unit = {
    val spark = batch.sparkSession
    // replay begins by erasing any partial output this batch id left
    // behind — after this point the batch's partitions are exclusively
    // this attempt's
    Seq(s"$indexDir/bands", s"$indexDir/shingles", outDir)
      .foreach(clearBatch(spark, _, batchId))
    val newSh = Dedup.shingled(batch, "doc_id", "text", n)
      .persist()
    // the band frame is read three times per batch (cross join, within
    // join, survivor append) — cache the ~(docs x bands) key rows once
    // instead of re-running minhash + explode for each consumer
    val newBands = Dedup.banded(newSh, numHashes, rowsPerBand).persist()
    try {
      // Candidate pairs are ORIENTED so the to-drop doc is always id_a,
      // letting cross-batch and within-batch candidates share ONE
      // dedup + verify pass (halves the per-batch job count; verify is
      // jaccard-symmetric so orientation never changes the verdict):
      //  - cross: (id_a = new doc, id_b = stored doc) — the new copy
      //    of an already-kept doc drops;
      //  - within: (id_a = larger id, id_b = smaller id) — the
      //    duplicate cluster keeps its minimal representative.
      val priorBandsOpt = readPrior(spark, s"$indexDir/bands", batchId)
      val withinCands = newBands.as("a").join(newBands.as("b"),
          col("a.band") === col("b.band") &&
            col("a.bucket") === col("b.bucket") &&
            col("a.id") > col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      val cands = priorBandsOpt match {
        case Some(priorBands) =>
          withinCands.union(newBands.as("a").join(priorBands.as("b"),
              col("a.band") === col("b.band") &&
                col("a.bucket") === col("b.bucket"))
            .select(col("a.id").as("id_a"), col("b.id").as("id_b")))
        case None => withinCands
      }
      // id_a is always a new doc; id_b can be new OR stored, so the
      // verify side is the union of the batch's shingles and the
      // stored shingle table (ids are disjoint across batches)
      val verifySide = readPrior(spark, s"$indexDir/shingles", batchId)
        .map(newSh.unionByName(_)).getOrElse(newSh)
      // EAGER localCheckpoint, NOT a lazy persist: this plan reads the
      // index parquet the code below appends to, and Spark refreshes
      // path-based caches on write — a lazily-cached frame would be
      // recomputed AFTER the append and match every new doc against its
      // own just-written signatures (self-pair, jaccard 1, everything
      // flagged dup). Checkpointing pins the verdict first.
      val dropped = Dedup.verifyPairs(
          cands.dropDuplicates("id_a", "id_b"), newSh, verifySide,
          threshold)
        .select(col("id_a").as("id")).distinct()
        .localCheckpoint(true)
      val kept = newSh.join(broadcast(dropped), Seq("id"), "left_anti")
      // survivors extend the index; their band keys are anti-joined out
      // of the CACHED band frame against the broadcast dropped-id set
      // (no shuffle, no minhash recompute)
      newBands.join(broadcast(dropped), Seq("id"), "left_anti")
        .withColumn("_batch", lit(batchId))
        .write.mode("append").partitionBy("_batch")
        .parquet(s"$indexDir/bands")
      kept.withColumn("_batch", lit(batchId))
        .write.mode("append").partitionBy("_batch")
        .parquet(s"$indexDir/shingles")
      // per-doc outcome log — keyed on the BATCH, not the shingle frame:
      // a doc too short to shingle can never match and is kept
      batch.select(col("doc_id"))
        .join(broadcast(dropped.withColumnRenamed("id", "doc_id")
          .withColumn("status", lit("dup"))), Seq("doc_id"), "left")
        .na.fill("kept", Seq("status"))
        .withColumn("_batch", lit(batchId))
        .write.mode("append").partitionBy("_batch").parquet(outDir)
      dropped.unpersist(false)
      () // (unpersist releases the checkpoint's backing cache blocks)
    } finally { newSh.unpersist(false); newBands.unpersist(false); () }
  }
}

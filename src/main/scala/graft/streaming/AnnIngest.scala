package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{ArrayType, FloatType, IntegerType,
  LongType, StructField, StructType}

import graft.functions.expressions.VectorKernels

/** Streaming embedding-index ingest — the vector-search twin of
  * [[CorpusIngest]]: embedding batches arrive as files, the FIRST batch
  * seeds the IVF coarse quantizer (its `nlist` smallest-id vectors
  * become the cell centroids — deterministic, so an external engine can
  * replay every downstream assignment), and every batch is assigned to
  * its nearest-centroid cell and appended to a cell-partitioned vector
  * table. This is the "embedding corpus grows continuously" production
  * shape: per batch the work is O(batch × nlist) codegen'd kernel
  * evaluations against BROADCAST centroids (nlist × dim floats — the
  * one piece of an IVF index that is always driver/executor-resident)
  * plus a partitioned append; never a re-index of the stored corpus.
  *
  * Assignment rule (deterministic): argmax of ROUND(cosine, 6) over the
  * stored centroids, exact ties to the LOWER cell id — rounding is part
  * of the CONTRACT, not a display choice, so any engine computing
  * double-precision cosine reproduces the same cells (the same rule as
  * [[graft.operators.Similarity.ivfTopK]]'s scoring).
  *
  * The stored layout is `centroids` (cell, vec — written once) and
  * `vectors` (id, vec) PARTITIONED BY cell: a search probing p cells
  * reads exactly p directories (partition pruning does the routing; at
  * 100 TB this is the difference between a scan and an index lookup).
  * Centroids are intentionally NEVER retrained on later batches —
  * re-seeding would silently re-route future appends away from the
  * cells earlier vectors live in; a production recentroid is a separate
  * offline rebuild of the whole table.
  *
  * Appends are IDEMPOTENT under mid-append crash replay (same
  * batch-scoped-commit layout as [[CorpusIngest]]): vectors land under
  * `_batch=<id>/cell=<k>` and the outcome log under `_batch=<id>`, a
  * replay deletes the batch's partitions before re-appending
  * (assignment is deterministic against the frozen centroids, so the
  * rewrite is byte-identical), and the centroid seed write is an
  * overwrite of deterministic content — a replayed seed rewrites the
  * same bytes. Probe-time pruning on `cell` still prunes: it is the
  * second partition level, so a p-cell probe lists p directories per
  * batch partition.
  */
object AnnIngest {

  val VecSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  /** Process `inputDir` (one parquet file per micro-batch in
    * modification-time order) with Trigger.AvailableNow. Parquet, not
    * json-lines, on purpose: float32 embeddings survive the file hop
    * bit-exactly. `shufflePartitions` sizes per-batch jobs to the batch
    * volume (same rule as [[CorpusIngest.start]]). */
  def start(spark: SparkSession, inputDir: String, indexDir: String,
            outDir: String, checkpointDir: String,
            nlist: Int = 8, shufflePartitions: Int = 0,
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
      .schema(VecSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(inputDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, indexDir, outDir, nlist, batchId)
        // maintenance cadence (see CorpusIngest.compactBatches): fold
        // committed batch partitions, keeping the cell sub-partitioning
        // that probe-time pruning depends on; strictly-older bound so a
        // replay's self-delete never hits the consolidation target
        if (compactEvery > 0 && batchId % compactEvery == compactEvery - 1) {
          CorpusIngest.compactBatches(batch.sparkSession,
            s"$indexDir/vectors", upTo = batchId - 1,
            subPartitions = Seq("cell"))
          CorpusIngest.compactBatches(batch.sparkSession, outDir,
            upTo = batchId - 1)
        }
      }
      .start()
  }

  /** One batch against the stored index; also usable from a batch job
    * for backfills (pass the backfill's own monotonic batch id).
    * Idempotent per (indexDir, batchId): see the class doc. `batchId`
    * is deliberately NOT defaulted — replay deletes this batch's
    * partitions and prior reads filter `_batch < batchId`, so an
    * implicit constant id would make repeated backfill calls silently
    * destructive (see [[CorpusIngest.processBatch]]). */
  def processBatch(batch: DataFrame, indexDir: String, outDir: String,
                   nlist: Int, batchId: Long): Unit = {
    val spark = batch.sparkSession
    // an interrupted offline rebuild must be completed before any append
    // touches the vectors layout it half-swapped
    recoverRebuild(spark, indexDir)
    // replay: erase any partial output this batch id left behind
    Seq(s"$indexDir/vectors", outDir)
      .foreach(CorpusIngest.clearBatch(spark, _, batchId))
    val vecs = batch.na.drop(Seq("embedding"))
    val centDir = s"$indexDir/centroids"
    // a crashed seed write can leave the directory present but without a
    // committed file set — "exists" is READABLE AND NON-EMPTY, and the
    // reseed overwrites (deterministic content: a replay rewrites the
    // same bytes)
    val stored: Option[Array[(Int, Array[Float])]] =
      if (!Files.exists(Paths.get(centDir))) None
      else scala.util.Try(spark.read.parquet(centDir).collect())
        .toOption.filter(_.nonEmpty)
        .map(_.map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
          .sortBy(_._1))
    val cents: Array[(Int, Array[Float])] = stored.getOrElse {
      // seed quantizer: the batch's nlist smallest ids, cell = rank.
      // Only nlist × dim floats ever reach the driver.
      val seeds = vecs.select(col("vec_id"), col("embedding"))
        .orderBy(col("vec_id")).limit(nlist).collect()
        .zipWithIndex
        .map { case (r, i) => (i, r.getSeq[Float](1).toArray) }
      spark.createDataFrame(seeds.toSeq.map { case (c, v) => (c, v.toSeq) })
        .toDF("cell", "vec")
        .coalesce(1).write.mode("overwrite").parquet(centDir)
      seeds
    }
    val assigned = vecs.select(col("vec_id"), col("embedding"),
        bestCell(col("embedding"), cents).as("best"))
      .select(col("vec_id"), col("embedding"),
        col("best.cell").as("cell"), col("best.cos").as("cos"))
    // partitioned append: the stored, searchable index — probe-time
    // partition pruning reads only the probed cells' directories
    // (second partition level under the batch-commit scope)
    assigned.select(col("vec_id").as("id"), col("embedding").as("vec"),
        col("cell"), lit(batchId).as("_batch"))
      .write.mode("append").partitionBy("_batch", "cell")
      .parquet(s"$indexDir/vectors")
    // per-vector outcome log (the query surface)
    assigned.select(col("vec_id"), col("cell"), col("cos"),
        lit(batchId).as("_batch"))
      .write.mode("append").partitionBy("_batch").parquet(outDir)
  }

  /** Offline index REBUILD — the recentroid operation the class doc
    * defers to (live retraining would re-route future appends away from
    * stored vectors; a rebuild re-routes EVERYTHING at once): recompute
    * centroids over all stored vectors with the order-free quantized
    * k-means ([[graft.operators.Similarity.recentroidQuantized]] — the
    * same rounded-cosine/lower-cell assignment contract), then rewrite
    * `centroids` and re-partition `vectors` by the new cells. The
    * rebuilt vectors land in ONE `_batch=<newest seen>` scope (the same
    * fold-into-newest rule as [[CorpusIngest.compactBatches]], so the
    * layout stays append-compatible and future batches' `_batch < id`
    * reads still cover it). The rebuild itself is the commit — BOTH
    * tables staged to sibling dirs, then a manifest marks the commit
    * point, then the swaps run; a crash anywhere is rolled FORWARD from
    * the manifest on the next rebuild or processBatch, so new centroids
    * can never be observed paired with the old cell layout. Run with
    * the ingest stream stopped. */
  def rebuild(spark: SparkSession, indexDir: String, nlist: Int,
              iters: Int = 2): Unit = {
    import graft.operators.Similarity
    import graft.sinks.CommitLog
    val conf = spark.sparkContext.hadoopConfiguration
    recoverRebuild(spark, indexDir) // finish any interrupted predecessor
    // a compaction that crashed POST-manifest leaves the vectors table
    // with old scopes deleted and the fold still staged — complete it
    // before reading, or the rebuild would recentroid a partial corpus
    CommitLog.recover(spark, s"$indexDir/vectors")
    val vecRoot = new org.apache.hadoop.fs.Path(s"$indexDir/vectors")
    val fs = vecRoot.getFileSystem(conf)
    val target = fs.listStatus(vecRoot).filter(_.isDirectory)
      .map(_.getPath.getName).filter(_.startsWith("_batch="))
      .flatMap(n =>
        scala.util.Try(n.stripPrefix("_batch=").toLong).toOption)
      .foldLeft(0L)(math.max)
    val stored = spark.read.parquet(s"$indexDir/vectors")
      .select(col("id"), col("vec"))
    val (assigned, quantized) = Similarity.recentroidQuantized(
      stored, "id", "vec", nlist, iters)
    val cents = quantized.zipWithIndex.map { case (qs, cell) =>
      (cell, qs.map(q => (q.toDouble / 10000.0).toFloat).toSeq)
    }
    // 1. stage BOTH tables (nothing live is touched pre-manifest); the
    //    staged vectors are the single folded batch scope's CONTENT
    stored.join(assigned.withColumnRenamed("cell", "cell_new"), Seq("id"))
      .select(col("id"), col("vec"), col("cell_new").as("cell"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$indexDir/$RebuildVecStaged")
    spark.createDataFrame(cents.toSeq).toDF("cell", "vec")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$indexDir/$RebuildCentStaged")
    // 2. commit point + roll-forward via the shared protocol: vectors
    // swap first (clearing the whole old layout), centroids after — a
    // reader between the two sees old centroids + new layout only
    // transiently inside this stopped-stream window; the inverse
    // pairing (new centroids routing into the old layout) can never
    // persist, from any crash point.
    CommitLog.commit(spark, indexDir, "rebuild", CommitLog.Swap(
      renames = Seq(
        CommitLog.Rename(RebuildVecStaged, s"vectors/_batch=$target",
          clearFirst = Seq("vectors")),
        CommitLog.Rename(RebuildCentStaged, "centroids"))))
  }

  private val RebuildVecStaged = ".vectors-rebuild"
  private val RebuildCentStaged = ".centroids-rebuild"

  /** Finish (or no-op) an interrupted [[rebuild]] from its manifest. */
  private[graft] def recoverRebuild(spark: SparkSession,
                                    indexDir: String): Unit =
    graft.sinks.CommitLog.recover(spark, indexDir)

  /** struct(cell, cos) of the nearest centroid under the rounded-cosine
    * argmax rule: max by (cos, -cell) — exact ties take the lower cell. */
  private def bestCell(vec: Column,
                       cents: Array[(Int, Array[Float])]): Column = {
    val simIdx = array(cents.map { case (cell, cv) =>
      struct(
        round(VectorKernels.cosine_sim(vec, typedLit(cv.toSeq)), 6).as("cos"),
        lit(-cell).as("nc"))
    }: _*)
    val best = array_max(simIdx)
    struct((-best.getField("nc")).cast("int").as("cell"),
      best.getField("cos").as("cos"))
  }
}

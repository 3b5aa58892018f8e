package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.AnnIngest

/** Streaming embedding-index ingest: seed-quantizer determinism, the
  * no-retrain contract, cell-partitioned storage, and the rounded-cosine
  * argmax assignment rule on planted vectors. */
class AnnIngestSpec extends GraftSpec {
  import spark.implicits._

  private def tmp(p: String) =
    Files.createTempDirectory(p).toFile.getAbsolutePath

  // orthogonal-ish 4-dim plants: ids 0,1 seed cells 0,1; later vectors
  // sit near one seed each, except 23 which ties exactly between both
  private val e0 = Array(1f, 0f, 0f, 0f)
  private val e1 = Array(0f, 1f, 0f, 0f)

  private def stage(in: String, b: Int,
                    rows: Seq[(Long, Array[Float])]): Unit = {
    val st = tmp("ai-spec-st")
    rows.map { case (id, v) => (id, v.toSeq, 0) }
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(st)
    val part = new java.io.File(st).listFiles()
      .find(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet")).get
    val dst = new java.io.File(in, s"b$b.parquet")
    Files.move(part.toPath, dst.toPath)
    dst.setLastModified(1700000000000L + b * 60000L)
    ()
  }

  test("seed quantizer from batch 0; later batches assign against STORED centroids; exact ties take the lower cell") {
    val in = tmp("ai-spec-in"); val idx = tmp("ai-spec-idx")
    val out = tmp("ai-spec-out"); val cp = tmp("ai-spec-cp")
    stage(in, 0, Seq(0L -> e0, 1L -> e1,
      2L -> Array(0.9f, 0.1f, 0f, 0f))) // near e0 -> cell 0
    stage(in, 1, Seq(
      10L -> Array(0.1f, 0.9f, 0f, 0f), // near e1 -> cell 1
      // equidistant from both seeds: cos identical -> lower cell wins
      23L -> Array(1f, 1f, 0f, 0f)))
    val q = AnnIngest.start(spark, in, idx, out, cp, nlist = 2)
    try q.awaitTermination() finally q.stop()
    val cells = spark.read.parquet(out)
      .select(col("vec_id"), col("cell")).as[(Long, Int)].collect().toMap
    assert(cells == Map(0L -> 0, 1L -> 1, 2L -> 0, 10L -> 1, 23L -> 0))
    // centroids are the batch-0 seeds, cell = id rank — and batch 1
    // did NOT retrain them
    val cents = spark.read.parquet(s"$idx/centroids")
      .as[(Int, Seq[Float])].collect().toMap
    assert(cents == Map(0 -> e0.toSeq, 1 -> e1.toSeq))
  }

  test("vector table is PARTITIONED by cell and holds exactly the outcome log's assignments") {
    val in = tmp("ai-spec-in"); val idx = tmp("ai-spec-idx")
    val out = tmp("ai-spec-out"); val cp = tmp("ai-spec-cp")
    stage(in, 0, Seq(0L -> e0, 1L -> e1))
    stage(in, 1, Seq(5L -> Array(0.2f, 0.8f, 0f, 0f),
      6L -> Array(0.8f, 0.2f, 0f, 0f)))
    val q = AnnIngest.start(spark, in, idx, out, cp, nlist = 2)
    try q.awaitTermination() finally q.stop()
    // physical layout: one directory per cell (partition pruning is the
    // probe-time index lookup)
    val dirs = new java.io.File(s"$idx/vectors").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == Set("cell=0", "cell=1"))
    val stored = spark.read.parquet(s"$idx/vectors")
      .select(col("id"), col("cell")).as[(Long, Int)].collect().toMap
    val logged = spark.read.parquet(out)
      .select(col("vec_id"), col("cell")).as[(Long, Int)].collect().toMap
    assert(stored == logged)
    assert(stored == Map(0L -> 0, 1L -> 1, 5L -> 1, 6L -> 0))
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.CorpusIngest

/** Streaming incremental corpus dedup: batch-sequential drop semantics
  * on planted documents. */
class CorpusIngestSpec extends GraftSpec {
  import spark.implicits._

  private def tmp(p: String) =
    Files.createTempDirectory(p).toFile.getAbsolutePath

  private val textA = "alpha beta gamma delta epsilon zeta eta theta"
  private val textB = "one two three four five six seven eight nine ten"
  private val textC = "red orange yellow green blue indigo violet purple"

  test("cross-batch dups drop; dups of DROPPED docs survive; within-batch keeps min id") {
    val in = tmp("ci-spec-in"); val idx = tmp("ci-spec-idx")
    val out = tmp("ci-spec-out"); val cp = tmp("ci-spec-cp")
    // batch 0: docs 10 (A), 11 (B), 12 (copy of B -> within-batch dup)
    // batch 1: doc 20 (copy of A -> cross dup of KEPT 10),
    //          doc 21 (copy of B -> cross dup of KEPT 11),
    //          doc 22 (C, novel -> kept)
    // batch 2: doc 30 (copy of C -> cross dup of KEPT 22),
    //          doc 31 (novel -> kept)
    val batches = Seq(
      Seq((10L, textA), (11L, textB), (12L, textB)),
      Seq((20L, textA), (21L, textB), (22L, textC)),
      Seq((30L, textC), (31L, "lone wolf words that match nothing else here")))
    batches.zipWithIndex.foreach { case (docs, b) =>
      val stage = tmp("ci-spec-st")
      docs.toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("s"))
        .coalesce(1).write.mode("overwrite").json(stage)
      val part = new java.io.File(stage).listFiles()
        .find(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".json")).get
      val dst = new java.io.File(in, s"b$b.json")
      Files.move(part.toPath, dst.toPath)
      dst.setLastModified(1700000000000L + b * 60000L)
      ()
    }
    // compactEvery=2 exercises the in-stream maintenance cadence: the
    // fold after batch 1 must not change any outcome
    val q = CorpusIngest.start(spark, in, idx, out, cp, n = 3,
      threshold = 0.5, compactEvery = 2)
    StreamTest.drain(q)
    val got = spark.read.parquet(out)
      .select(col("doc_id"), col("status")).as[(Long, String)]
      .collect().toMap
    assert(got == Map(
      10L -> "kept", 11L -> "kept", 12L -> "dup",
      20L -> "dup", 21L -> "dup", 22L -> "kept",
      30L -> "dup", 31L -> "kept"))
    // the signature index holds exactly the kept docs
    val indexed = spark.read.parquet(s"$idx/shingles")
      .select(col("id")).as[Long].collect().toSet
    assert(indexed == Set(10L, 11L, 22L, 31L))
  }

  test("a doc matching only a DROPPED prior is kept (index holds survivors only)") {
    val in = tmp("ci-spec2-in"); val idx = tmp("ci-spec2-idx")
    val out = tmp("ci-spec2-out"); val cp = tmp("ci-spec2-cp")
    // textA = 8 words -> 6 3-shingles. doc 2 = A + 4-word tail: 12
    // words -> 10 shingles, 6 shared -> j(2,1) = 6/10 = 0.6 -> dropped
    // within batch 0. doc 3 = last 4 A-words + tail: 8 words -> 6
    // shingles, ALL contained in doc 2 -> j(3,2) = 6/10 = 0.6, but only
    // 2 shared with doc 1 -> j(3,1) = 2/10 = 0.2. Doc 2 was dropped so
    // its signatures are NOT in the index; doc 3 must survive.
    val tail = "omega psi chi phi"
    val batches = Seq(
      Seq((1L, textA), (2L, textA + " " + tail)),
      Seq((3L, "epsilon zeta eta theta " + tail)))
    batches.zipWithIndex.foreach { case (docs, b) =>
      val stage = tmp("ci-spec2-st")
      docs.toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("s"))
        .coalesce(1).write.mode("overwrite").json(stage)
      val part = new java.io.File(stage).listFiles()
        .find(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".json")).get
      val dst = new java.io.File(in, s"b$b.json")
      Files.move(part.toPath, dst.toPath)
      dst.setLastModified(1700000000000L + b * 60000L)
      ()
    }
    val q = CorpusIngest.start(spark, in, idx, out, cp, n = 3,
      threshold = 0.5)
    StreamTest.drain(q)
    val got = spark.read.parquet(out)
      .select(col("doc_id"), col("status")).as[(Long, String)]
      .collect().toMap
    assert(got(1L) == "kept")
    assert(got(2L) == "dup")
    // 3 is a near-dup of DROPPED 2 only — survivor-index semantics keep it
    assert(got(3L) == "kept")
  }

  private def snapshot(dir: String, cols: String*): Set[String] =
    spark.read.parquet(dir)
      .select(cols.map(col): _*)
      .collect().map(_.toString).toSet

  test("crash replay is idempotent: a re-run batch (even after a partial append) leaves index + outcome identical to a single run") {
    // reference: batches 0,1,2 processed exactly once
    val refIdx = tmp("ci-rep-refidx"); val refOut = tmp("ci-rep-refout")
    val idx = tmp("ci-rep-idx"); val out = tmp("ci-rep-out")
    val batches = Seq(
      Seq((10L, textA), (11L, textB), (12L, textB)),
      Seq((20L, textA), (21L, textB), (22L, textC)),
      Seq((30L, textC), (31L, "lone wolf words that match nothing else here")))
    def frame(b: Int) = batches(b).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
    def run(b: Int, i: String, o: String): Unit =
      CorpusIngest.processBatch(frame(b), i, o, n = 3, threshold = 0.5,
        numHashes = 128, rowsPerBand = 2, batchId = b.toLong)
    (0 to 2).foreach(b => run(b, refIdx, refOut))

    // crash scenarios on the replayed run:
    run(0, idx, out)
    run(1, idx, out)
    // (a) crash AFTER batch 1 fully appended but before the engine
    //     recorded it — straight re-delivery of a completed batch
    run(1, idx, out)
    // (b) crash MID-append of batch 2: bands landed, shingles + outcome
    //     did not — simulate by running batch 2 then deleting its
    //     shingle and outcome partitions, leaving the bands partition
    //     as the partial orphan the replay must reconcile
    run(2, idx, out)
    CorpusIngest.clearBatch(spark, s"$idx/shingles", 2L)
    CorpusIngest.clearBatch(spark, out, 2L)
    run(2, idx, out)

    assert(snapshot(s"$idx/bands", "id", "band", "bucket", "_batch") ==
      snapshot(s"$refIdx/bands", "id", "band", "bucket", "_batch"))
    assert(snapshot(s"$idx/shingles", "id", "_batch") ==
      snapshot(s"$refIdx/shingles", "id", "_batch"))
    assert(snapshot(out, "doc_id", "status", "_batch") ==
      snapshot(refOut, "doc_id", "status", "_batch"))
    // and the row COUNTS match too (set equality alone would hide
    // duplicated identical rows)
    assert(spark.read.parquet(s"$idx/bands").count() ==
      spark.read.parquet(s"$refIdx/bands").count())
    assert(spark.read.parquet(out).count() ==
      spark.read.parquet(refOut).count())
  }

  test("compactBatches folds committed batch partitions into the newest; semantics and future batches unchanged; crash mid-compaction rolls forward") {
    val refIdx = tmp("ci-cp-refidx"); val refOut = tmp("ci-cp-refout")
    val idx = tmp("ci-cp-idx"); val out = tmp("ci-cp-out")
    val batches = Seq(
      Seq((10L, textA), (11L, textB), (12L, textB)),
      Seq((20L, textA), (21L, textB), (22L, textC)),
      Seq((30L, textC), (31L, "lone wolf words that match nothing else here")))
    def frame(b: Int) = batches(b).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
    def run(b: Int, i: String, o: String): Unit =
      CorpusIngest.processBatch(frame(b), i, o, n = 3, threshold = 0.5,
        numHashes = 128, rowsPerBand = 2, batchId = b.toLong)
    (0 to 2).foreach(b => run(b, refIdx, refOut))

    // compacted run: compact after batch 1, then process batch 2
    run(0, idx, out); run(1, idx, out)
    Seq(s"$idx/bands", s"$idx/shingles", out)
      .foreach(CorpusIngest.compactBatches(spark, _))
    def batchDirs(path: String): Set[String] =
      new java.io.File(path).listFiles().filter(_.isDirectory)
        .map(_.getName).filter(_.startsWith("_batch=")).toSet
    assert(batchDirs(s"$idx/bands") == Set("_batch=1"))
    assert(batchDirs(out) == Set("_batch=1"))
    run(2, idx, out)
    def rows(path: String, cols: String*): Set[String] =
      spark.read.parquet(path).select(cols.map(col): _*)
        .collect().map(_.toString).toSet
    // content identical to the uncompacted reference, batch ids aside
    assert(rows(s"$idx/shingles", "id") == rows(s"$refIdx/shingles", "id"))
    assert(rows(s"$idx/bands", "id", "band", "bucket") ==
      rows(s"$refIdx/bands", "id", "band", "bucket"))
    assert(rows(out, "doc_id", "status") == rows(refOut, "doc_id", "status"))

    // crash mid-compaction on the outcome table: manifest written, one
    // old partition deleted, staged present, rename never ran — the
    // next processBatch must roll the compaction forward, not lose data
    val idx2 = tmp("ci-cp2-idx"); val out2 = tmp("ci-cp2-out")
    run(0, idx2, out2); run(1, idx2, out2)
    val pre = rows(out2, "doc_id", "status")
    val root = new org.apache.hadoop.fs.Path(out2)
    val fs = root.getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // stage manually (what compact writes before the manifest)
    spark.read.parquet(out2).drop("_batch")
      .write.parquet(s"$out2/.compact-staged")
    val mf = fs.create(new org.apache.hadoop.fs.Path(root, ".commit-compact"), true)
    mf.write(("""{"deletes":["_batch=0"],"renames":[{"staged":""" +
      """".compact-staged","live":"_batch=1","clear":[]}],"cleanup":[]}""")
      .getBytes("UTF-8")); mf.close()
    fs.delete(new org.apache.hadoop.fs.Path(root, "_batch=0"), true)
    // crash here. batch 2 arrives; clearBatch recovery completes the swap
    run(2, idx2, out2)
    assert(batchDirs(out2).contains("_batch=1") &&
      !batchDirs(out2).contains("_batch=0"))
    assert(!new java.io.File(s"$out2/.commit-compact").exists())
    val post = rows(out2, "doc_id", "status")
    assert(pre.subsetOf(post), "no outcome rows lost across the crash")
    assert(post == rows(refOut, "doc_id", "status"))
  }
}

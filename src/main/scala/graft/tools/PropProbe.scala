package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft._
import graft.operators._

/** One-off measurement harness for the approximate operators' property
  * margins (HLL relative error, ANN recall vs brute force, SimHash
  * coverage of high-Jaccard pairs, image-twin detection completeness,
  * classifier held-out accuracy). Used to pick the thresholds the
  * property-gated oracle queries assert; not part of the driver
  * contract. */
object PropProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(master = "local[8]", shufflePartitions = 8)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      println(s"=== $sf ===")
      probe(spark, dir)
    }
    spark.stop()
  }

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
  private def embs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  private def probe(s: SparkSession, dir: String): Unit = {
    // 1. HLL relative error on the a1_hll_sketch grouping
    val env = sources.DriverEventsAdapter.load(s, dir)
      .withColumn("workspace_id", col("write_key"))
    val approx = MetricsAgg.mergeActiveEvents(MetricsAgg.activeEventsSketch(env))
    val exact = MetricsAgg.activeEventsExact(env)
    val errCols = approx.columns.toSeq
    println(s"hll approx cols: $errCols; exact cols: ${exact.columns.toSeq}")
    val joined = approx.join(exact, Seq("workspace_id", "period"))
    val err = joined.select(
      (abs(col("active_events").cast("double") - col("count")) /
        col("count")).as("rel"))
    val er = err.agg(max("rel"), avg("rel")).collect()(0)
    println(f"hll max_rel=${er.getDouble(0)}%.4f avg_rel=${er.getDouble(1)}%.4f")

    // 2. ANN recall per variant
    val e = embs(s, dir).select(col("vec_id").as("id"), col("embedding").as("vec"))
    val q = e.filter(col("id") < 10).select(col("id").as("qid"), col("vec"))
    val exactTop = Similarity.bruteForceTopK(q, e, k = 10)
      .select(col("qid"), col("id"))
    def recall(name: String, df: DataFrame): Unit = {
      val hits = df.select(col("qid"), col("id"))
        .join(exactTop, Seq("qid", "id")).groupBy("qid")
        .agg(count(lit(1)).as("n_hits"))
      val m = hits.agg(min("n_hits"), avg("n_hits")).collect()(0)
      println(f"$name%-14s min_hits=${m.getLong(0)} avg_hits=${m.getDouble(1)}%.2f")
    }
    recall("ivf", Similarity.ivfTopK(q, e, k = 10, nlist = 16, nprobe = 4))
    recall("lsh", Similarity.lshTopK(q, e, dim = 64, k = 10))
    val pq = Quantization.trainPq(e, dim = 64)
    recall("pq", Quantization.pqTopK(q, e, pq, k = 10))
    recall("ivfpq", Quantization.ivfPqTopK(q, e, pq, k = 10))

    // 3. SimHash coverage of exact-Jaccard pairs at 0.9 / 0.95
    val sim = Dedup.simhashPairs(docs(s, dir), "doc_id", "text", maxHamming = 3)
      .select(col("id_a"), col("id_b"))
    for (t <- Seq(0.8, 0.9, 0.95)) {
      val high = Dedup.jaccardPairs(docs(s, dir), "doc_id", "text", n = 3, threshold = t)
        .select(col("id_a"), col("id_b"))
      val nHigh = high.count()
      val caught = high.join(sim, Seq("id_a", "id_b")).count()
      println(s"simhash: jaccard>=$t pairs=$nHigh caught=$caught")
    }

    // 4. image twins completeness (deterministic doc_id subset)
    val imgDocs = docs(s, dir).filter(col("doc_id") % 17 === 0)
    val nDocs = imgDocs.count()
    val pairs = Dedup.fingerprintPairs(
      Multimodal.imageDHash(Multimodal.synthesizeImageTwins(imgDocs))
        .select(col("media_id").as("id"), col("dhash").as("fp")),
      maxHamming = 3, numChunks = 4)
      .filter(col("id_b") === col("id_a") + 1000000L)
    println(s"image twins: docs=$nDocs caught=${pairs.count()} " +
      s"maxHam=${pairs.agg(max("hamming")).collect()(0)}")

    // 5. quality classifier held-out accuracy
    val d = docs(s, dir)
    val stats = d.select(col("doc_id"),
      functions.TextFunctions.qualityScore(col("text")).as("q"), col("text"))
    val med = stats.stat.approxQuantile("q", Array(0.5), 0.001).head
    val labeled = stats.select(col("doc_id"),
      (col("q") >= med).cast("int").as("label"), col("text"))
    val model = QualityClassifier.train(
      labeled.filter(col("doc_id") % 2 === 0).coalesce(8),
      "text", "label", numFeatures = 1 << 16, maxIter = 15)
    val scored = QualityClassifier.score(
      model, d.filter(col("doc_id") % 2 === 1), "doc_id", "text")
    println(s"classifier score cols: ${scored.columns.toSeq}")
    val accR = scored.join(labeled.select(col("doc_id").as("id"), col("label")), "id")
      .agg(avg((col("quality_pred") === col("label")).cast("double")), count(lit(1)))
      .collect()(0)
    println(f"classifier heldout acc=${accR.getDouble(0)}%.4f n=${accR.getLong(1)}")

    // 6. simhash coverage of EXACT-duplicate texts (hamming-0 floor)
    val dd = docs(s, dir).select(col("doc_id"), col("text"))
    val exactPairs = dd.as("x").join(dd.as("y"),
        col("x.text") === col("y.text") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
    val nEx = exactPairs.count()
    val exCaught = exactPairs.join(sim, Seq("id_a", "id_b")).count()
    println(s"simhash exact-text pairs=$nEx caught=$exCaught")

    // 7. simhash hamming distance on drop-first-word twins (the
    // td_decontam_fuzzy spiking convention): is a planted near-dup
    // always within maxHamming=3?
    val spikeBase = dd
    val spiked = spikeBase.select(col("doc_id"), col("text"))
      .unionByName(spikeBase.select((col("doc_id") + 10000000L).as("doc_id"),
        regexp_replace(col("text"), "^\\S+\\s+", "").as("text")))
    val spikedSim = Dedup.simhashPairs(spiked, "doc_id", "text", maxHamming = 3)
      .filter(col("id_b") === col("id_a") + 10000000L)
    val nBase = spikeBase.count()
    println(s"simhash spiked twins: base=$nBase caught=${spikedSim.count()}")
    // direct hamming distribution (no banding) for the twin pairs
    import graft.functions.expressions.SimHash64
    val fps = spiked.select(col("doc_id"),
      SimHash64.simhash64(graft.functions.TextFunctions.words(col("text"))).as("fp"))
    val twinHam = fps.as("x").join(fps.as("y"),
        col("y.doc_id") === col("x.doc_id") + 10000000L)
      .select(bit_count(col("x.fp").bitwiseXOR(col("y.fp"))).as("ham"))
    twinHam.agg(max("ham"), avg("ham"),
      sum((col("ham") > 3).cast("long"))).collect().foreach(r =>
      println(s"twin hamming: max=${r.get(0)} avg=${r.get(1)} over3=${r.get(2)}"))

    // 8. ANN variants: does every qid return rows?
    def qids(name: String, df: DataFrame): Unit =
      println(s"$name distinct qids=" +
        df.select(countDistinct(col("qid"))).collect()(0).getLong(0) +
        " rows=" + df.count())
    qids("ivf", Similarity.ivfTopK(q, e, k = 10, nlist = 16, nprobe = 4))
    qids("lsh", Similarity.lshTopK(q, e, dim = 64, k = 10))
    qids("pq", Quantization.pqTopK(q, e, pq, k = 10))
    qids("ivfpq", Quantization.ivfPqTopK(q, e, pq, k = 10))
  }
}

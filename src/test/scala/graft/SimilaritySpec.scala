package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

class SimilaritySpec extends GraftSpec {
  import spark.implicits._

  private lazy val embs = schemaFix(
    spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec")))

  test("matryoshkaRecall: truncation that reorders the top-k is caught; an order-preserving prefix is a perfect 10000 bp") {
    // query (1, 0, 0): full cosines — a = 0.8, b ≈ 0.9 → full top-1 =
    // b; first-dim-only cosines are both 1.0 → id tiebreak picks a, so
    // recall@1 at dims=1 is 0, and at dims=2 (order preserved) 10000
    val q = Seq((100L, Array(1.0f, 0.0f, 0.0f))).toDF("qid", "vec")
    val c = Seq((1L, Array(0.8f, 0.6f, 0.0f)),
        (2L, Array(0.9f, -0.436f, 0.0f)))
      .toDF("id", "vec")
    val r1 = Similarity.matryoshkaRecall(q, c, k = 1, dims = 1)
      .collect().head
    assert(r1.getAs[Long]("n_full") == 1 &&
      r1.getAs[Long]("n_hits") == 0 &&
      r1.getAs[Long]("recall_bp") == 0)
    val r2 = Similarity.matryoshkaRecall(q, c, k = 1, dims = 2)
      .collect().head
    assert(r2.getAs[Long]("n_hits") == 1 &&
      r2.getAs[Long]("recall_bp") == 10000)
  }

  test("matryoshkaRecall: dims >= the embedding width errors loudly instead of reporting perfect recall") {
    val q = Seq((100L, Array(1.0f, 0.0f))).toDF("qid", "vec")
    val c = Seq((1L, Array(0.8f, 0.6f))).toDF("id", "vec")
    val e = intercept[IllegalArgumentException] {
      Similarity.matryoshkaRecall(q, c, k = 1, dims = 2)
    }
    assert(e.getMessage.contains("embedding width"))
    // past the width is just as degenerate
    intercept[IllegalArgumentException] {
      Similarity.matryoshkaRecall(q, c, k = 1, dims = 7)
    }
  }

  private def schemaFix(df: org.apache.spark.sql.DataFrame) = df

  test("brute-force topk: self-similarity excluded, k rows per query, ranked") {
    val q = embs.filter(col("id") < 5).select(col("id").as("qid"), col("vec"))
    val out = Similarity.bruteForceTopK(q, embs, k = 10)
    val rows = out.collect()
    assert(rows.length == 50)
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    byQ.values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to 10))
      val cos = sorted.map(_.getAs[Double]("cosine"))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
      assert(!rs.exists(r => r.getAs[Long]("id") == r.getAs[Long]("qid")))
    }
  }

  test("LSH topk finds planted high-cosine neighbors (clustered data)") {
    // ANN-LSH earns recall on *clustered* data; on isotropic random
    // vectors (driver testdata) true neighbors sit at cosine ~0.4 where
    // hyperplane collision is weak. Plant realistic near-neighbors.
    val rnd = new scala.util.Random(11)
    val base = Array.fill(30)(Array.fill(64)(rnd.nextGaussian().toFloat))
    val corpus = base.zipWithIndex.flatMap { case (v, i) =>
      // 5 perturbed copies of each base vector (cosine ~0.995)
      (0 until 5).map(j => ((i * 10 + j).toLong,
        v.map(x => x + 0.05f * rnd.nextGaussian().toFloat)))
    }
    val corpusDf = spark.createDataFrame(corpus.toSeq).toDF("id", "vec")
    val qDf = spark.createDataFrame(
      base.take(10).zipWithIndex.map { case (v, i) => (i.toLong * 1000, v) }.toSeq)
      .toDF("qid", "vec")
    val exact = Similarity.bruteForceTopK(qDf, corpusDf, k = 5)
      .select("qid", "id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(qDf, corpusDf, dim = 64, k = 5)
      .select("qid", "id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"LSH recall $recall too low on clustered data")
  }

  test("IVF: nprobe=nlist reproduces brute force exactly; partial probe is a real subset search") {
    val q = embs.filter(col("id") < 5).select(col("id").as("qid"), col("vec"))
    val exact = Similarity.bruteForceTopK(q, embs, k = 10)
      .select("qid", "rank", "id").as[(Long, Int, Long)].collect().toSet
    // probing every cell must scan everything -> bit-identical to exact
    // (proves the cell routing loses nothing)
    val full = Similarity.ivfTopK(q, embs, k = 10, nlist = 8, nprobe = 8)
      .select("qid", "rank", "id").as[(Long, Int, Long)].collect().toSet
    assert(full == exact)
    // partial probe: meaningful recall at a fraction of the scan
    val part = Similarity.ivfTopK(q, embs, k = 10, nlist = 8, nprobe = 3)
      .select("qid", "id").as[(Long, Long)].collect().toSet
    val exactPairs = exact.map(t => (t._1, t._3))
    val recall = (exactPairs & part).size.toDouble / exactPairs.size
    assert(recall >= 0.3, s"IVF recall $recall unreasonably low")
    assert(part.size <= exactPairs.size)
  }

  test("IVF on clustered data: high recall at small probe fraction") {
    val rnd = new scala.util.Random(13)
    val base = Array.fill(20)(Array.fill(64)(rnd.nextGaussian().toFloat))
    val corpus = base.zipWithIndex.flatMap { case (v, i) =>
      (0 until 8).map(j => ((i * 10 + j).toLong,
        v.map(x => x + 0.05f * rnd.nextGaussian().toFloat)))
    }
    val corpusDf = spark.createDataFrame(corpus.toSeq).toDF("id", "vec")
    val qDf = spark.createDataFrame(
      base.take(8).zipWithIndex.map { case (v, i) => (i.toLong * 1000, v) }.toSeq)
      .toDF("qid", "vec")
    val exact = Similarity.bruteForceTopK(qDf, corpusDf, k = 5)
      .select("qid", "id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(qDf, corpusDf, k = 5, nlist = 10, nprobe = 3)
      .select("qid", "id").as[(Long, Long)].collect().toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.8, s"IVF recall $recall too low on clustered data")
  }

  test("quantizeInt8: range, extremes, zero vector, reconstruction bound") {
    import graft.operators.Quantization
    val df = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)),
      (3L, Array(3.0f, 1.5f, -3.0f, 0.1f))).toDF("id", "vec")
    val out = df.select(col("id"),
        Quantization.int8Scale(col("vec")).as("scale"),
        Quantization.quantizeInt8(col("vec")).as("q"))
      .as[(Long, Double, Seq[Int])].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(2L) == ((0.0, Seq(0, 0, 0, 0)))) // zero vector -> zero codes
    val (s1, q1) = out(1L)
    assert(s1 == 1.0 && q1 == Seq(64, -127, 32, 0)) // floor(0.5*127+0.5)=64
    val (s3, q3) = out(3L)
    assert(s3 == 3.0 && q3.max == 127 && q3.min == -127)
    // reconstruction error bounded by half a quantization step
    val orig = Array(3.0, 1.5, -3.0, 0.1)
    q3.zip(orig).foreach { case (q, v) =>
      assert(math.abs(q * s3 / 127 - v) <= s3 / 127 / 2 + 1e-9)
    }
  }

  test("PQ with lossless codebooks reproduces exact L2 ranking") {
    import graft.operators.Quantization
    // subvectors drawn from exactly k=4 patterns per subspace -> k-means
    // recovers them exactly and ADC distance == true squared L2
    val rnd = new scala.util.Random(7)
    val patterns = Array.fill(4, 4)(Array.fill(2)(rnd.nextGaussian().toFloat))
    def mk(i: Int): Array[Float] =
      (0 until 4).flatMap(sub => patterns(sub)((i / math.pow(4, sub).toInt) % 4)).toArray
    val corpus = (0 until 256).map(i => (i.toLong, mk(i)))
    val corpusDf = corpus.toDF("id", "vec")
    val model = Quantization.trainPq(corpusDf, dim = 8, m = 4, k = 4,
      iters = 8, sampleSize = 256)
    val queries = corpus.take(3).map { case (i, v) => (i + 1000, v) }
    val got = Quantization.pqTopK(queries.toDF("qid", "vec"), corpusDf,
        model, k = 5)
      .select("qid", "rank", "id").as[(Long, Int, Long)].collect().toSet
    // exact reference: squared L2 accumulated per-subspace then summed
    // (the ADC association order), rounded like the operator so ties
    // resolve identically by id
    def dist6(qv: Array[Float], v: Array[Float]): BigDecimal = {
      var total = 0.0
      for (sub <- 0 until 4) {
        var d = 0.0
        for (j <- 0 until 2) {
          val t = qv(sub * 2 + j).toDouble - v(sub * 2 + j).toDouble
          d += t * t
        }
        total += d
      }
      BigDecimal(total).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }
    val want = queries.flatMap { case (qid, qv) =>
      corpus.map { case (id, v) => (qid, id, dist6(qv, v)) }
        .sortBy { case (_, id, d) => (d, id) }
        .take(5).zipWithIndex
        .map { case ((q, id, _), r) => (q, r + 1, id) }
    }.toSet
    assert(got == want)
  }

  test("PQ ANN recall on clustered data") {
    import graft.operators.Quantization
    val rnd = new scala.util.Random(29)
    val base = Array.fill(16)(Array.fill(64)(rnd.nextGaussian().toFloat))
    val corpus = base.zipWithIndex.flatMap { case (v, i) =>
      (0 until 10).map(j => ((i * 10 + j).toLong,
        v.map(x => x + 0.05f * rnd.nextGaussian().toFloat)))
    }
    val corpusDf = corpus.toSeq.toDF("id", "vec")
    val model = Quantization.trainPq(corpusDf, dim = 64, m = 8, k = 16,
      iters = 8, sampleSize = 160)
    val qDf = base.take(5).zipWithIndex
      .map { case (v, i) => (i.toLong + 5000, v) }.toSeq.toDF("qid", "vec")
    val pq = Quantization.pqTopK(qDf, corpusDf, model, k = 5)
      .select("qid", "id").as[(Long, Long)].collect()
    // all 10 members of a query's cluster share (nearly) one code, so
    // PQ cannot rank WITHIN the cluster — the ADC guarantee is that
    // every returned neighbor comes from the right cluster
    assert(pq.length == 25)
    val wrongCluster = pq.count { case (qid, id) => id / 10 != qid - 5000 }
    assert(wrongCluster == 0,
      s"$wrongCluster of ${pq.length} PQ neighbors from the wrong cluster")
  }

  test("planted identical vector is always rank-1 neighbor") {
    val planted = embs.filter(col("id") === 0)
      .select((col("id") + 10000).as("id"), col("vec"))
    val corpus = embs.unionByName(planted)
    val q = embs.filter(col("id") === 0).select(col("id").as("qid"), col("vec"))
    val top = Similarity.bruteForceTopK(q, corpus, k = 1).collect().head
    assert(top.getAs[Long]("id") == 10000L)
    assert(top.getAs[Double]("cosine") == 1.0)
  }

  test("IVFPQ: nprobe=nlist is bit-equal to flat PQ; partial probe stays in-cluster") {
    import graft.operators.Quantization
    val rnd = new scala.util.Random(31)
    val base = Array.fill(16)(Array.fill(64)(rnd.nextGaussian().toFloat))
    val corpus = base.zipWithIndex.flatMap { case (v, i) =>
      (0 until 10).map(j => ((i * 10 + j).toLong,
        v.map(x => x + 0.05f * rnd.nextGaussian().toFloat)))
    }
    val corpusDf = corpus.toSeq.toDF("id", "vec")
    val model = Quantization.trainPq(corpusDf, dim = 64, m = 8, k = 16,
      iters = 8, sampleSize = 160)
    val qDf = base.take(5).zipWithIndex
      .map { case (v, i) => (i.toLong + 5000, v) }.toSeq.toDF("qid", "vec")
    // full probe: the cell routing must lose nothing vs the flat PQ scan
    val flat = Quantization.pqTopK(qDf, corpusDf, model, k = 5)
      .select("qid", "rank", "id").as[(Long, Int, Long)].collect().toSet
    val full = Quantization.ivfPqTopK(qDf, corpusDf, model, k = 5,
        nlist = 8, nprobe = 8)
      .select("qid", "rank", "id").as[(Long, Int, Long)].collect().toSet
    assert(full == flat)
    // partial probe: every neighbor still from the query's own cluster
    val part = Quantization.ivfPqTopK(qDf, corpusDf, model, k = 5,
        nlist = 8, nprobe = 2)
      .select("qid", "id").as[(Long, Long)].collect()
    assert(part.length == 25)
    val wrong = part.count { case (qid, id) => id / 10 != qid - 5000 }
    assert(wrong == 0, s"$wrong IVFPQ neighbors from the wrong cluster")
  }

  test("hardNegatives: positives and near-dup twins excluded, hardest kept") {
    // anchor a0 (label 0). Candidates: c1 = near-identical twin but
    // label 1 (cos ~ 1 -> excluded by dupCos), c2 = same label, high
    // cos (positive -> excluded), c3/c4 = different label, moderate cos
    // (the actual hard negatives, c3 harder than c4).
    def v(xs: Double*) = xs.map(_.toFloat).toArray
    val corpus = Seq(
      (0L, v(1, 0, 0, 0), 0),
      (1L, v(0.999, 0.045, 0, 0), 1),  // twin, wrong label
      (2L, v(0.95, 0.31, 0, 0), 0),    // positive
      (3L, v(0.8, 0.6, 0, 0), 1),      // hard negative
      (4L, v(0.5, 0.87, 0, 0), 1)      // easier negative
    ).toDF("id", "vec", "label")
    val q = corpus.filter(col("id") === 0)
      .select(col("id").as("qid"), col("vec"), col("label"))
    val out = Similarity.hardNegatives(q, corpus, k = 2)
      .orderBy("rank")
      .select("rank", "id").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 3L), (2L, 4L)))
  }

  test("recall-gate helpers count hits honestly (zero-hit qids included)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // qid 1: full overlap; qid 2: disjoint; qid 3: returns nothing
    val queries = Seq(1L, 2L, 3L).toDF("qid")
    val exact = Seq((1L, 10L), (1L, 11L), (2L, 20L), (2L, 21L),
      (3L, 30L)).toDF("qid", "id")
    val approx = Seq((1L, 10L), (1L, 11L), (2L, 90L), (2L, 91L))
      .toDF("qid", "id")
    val perQid = QueriesTdShared
      .perQidRecallGate(approx, exact, queries.select(col("qid")), minHits = 1)
      .as[(Long, Boolean)].collect().toMap
    assert(perQid == Map(1L -> true, 2L -> false, 3L -> false))
    val total = QueriesTdShared
      .totalRecallGate(approx, exact, queries.select(col("qid")), minTotal = 3)
      .as[(Long, Boolean)].collect().toSeq
    assert(total == Seq((3L, false))) // only 2 true hits < 3
    val totalOk = QueriesTdShared
      .totalRecallGate(approx, exact, queries.select(col("qid")), minTotal = 2)
      .as[(Long, Boolean)].collect().toSeq
    assert(totalOk == Seq((3L, true)))
  }

  test("prototypicality: cells follow planted clusters; floor-split prune keeps the hard tail; empty input is empty") {
    // two tight clusters of 6, dim 8; ids 0 and 1 are the seeds (one
    // per cluster) so cells align with the planted structure
    val rnd = new scala.util.Random(7)
    def jitter(base: Array[Float]): Array[Float] =
      base.map(x => x + 0.02f * rnd.nextGaussian().toFloat)
    val a = Array(1f, 0f, 0f, 0f, 1f, 0f, 0f, 0f)
    val b = Array(0f, 1f, 0f, 0f, 0f, 1f, 0f, 0f)
    val rows = Seq((0L, a), (1L, b)) ++
      (0 until 5).map(i => ((2 + 2 * i).toLong, jitter(a))) ++
      (0 until 5).map(i => ((3 + 2 * i).toLong, jitter(b)))
    val df = rows.toDF("id", "vec")
    val out = Similarity.prototypicality(df, "id", "vec",
      nlist = 2, pruneBp = 5000).collect()
    assert(out.length == 12)
    // cluster membership = cell membership (seed 0 ↔ cell 0, 1 ↔ cell 1)
    out.foreach { r =>
      val id = r.getAs[Long]("id")
      assert(r.getAs[Int]("cell") == (id % 2).toInt,
        s"id $id landed in cell ${r.getAs[Int]("cell")}")
    }
    // per cell of 6: ranks dense 1..6; pruned = ranks 1..3 (floor rule:
    // (r-1)*10⁴ div 6 < 5000 ⇔ r ≤ 3), kept = the far half
    out.groupBy(_.getAs[Int]("cell")).values.foreach { cell =>
      val byRank = cell.sortBy(_.getAs[Long]("rank"))
      assert(byRank.map(_.getAs[Long]("rank")).toSeq == (1L to 6L))
      // rank order is proto-cosine descending
      val cos = byRank.map(_.getAs[Long]("proto_cos_micro"))
      assert(cos.zip(cos.tail).forall { case (x, y) => x >= y })
      assert(byRank.map(_.getAs[Boolean]("kept")).toSeq ==
        Seq(false, false, false, true, true, true))
    }

    assert(Similarity.prototypicality(
      Seq.empty[(Long, Array[Float])].toDF("id", "vec"),
      "id", "vec", nlist = 2).count() == 0)
  }

  test("labelNoise: disagreement counts, plurality with deterministic ties, suspect needs BOTH conditions") {
    // qid 100 (own 0): neighbors 3×label-1 + 1×label-0 → suspect
    // qid 101 (own 0): 3×0 + 1×1 → clean
    // qid 102 (own 2): 2×1 + 2×3 → plurality tie breaks to label 1 → suspect
    // qid 103 (own 5): 2×5 + 2×7 → bp 5000 BUT plurality ties to own 5 → clean
    val ranking = Seq(
      (100L, 1L, 1), (100L, 2L, 2), (100L, 3L, 3), (100L, 4L, 4),
      (101L, 5L, 1), (101L, 6L, 2), (101L, 7L, 3), (101L, 8L, 4),
      (102L, 9L, 1), (102L, 10L, 2), (102L, 11L, 3), (102L, 12L, 4),
      (103L, 13L, 1), (103L, 14L, 2), (103L, 15L, 3), (103L, 16L, 4))
      .toDF("qid", "id", "rank")
    val labels = (Seq((100L, 0L), (101L, 0L), (102L, 2L), (103L, 5L)) ++
      Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 0L,
        5L -> 0L, 6L -> 0L, 7L -> 0L, 8L -> 1L,
        9L -> 1L, 10L -> 1L, 11L -> 3L, 12L -> 3L,
        13L -> 5L, 14L -> 5L, 15L -> 7L, 16L -> 7L))
      .toDF("id", "label")
    val out = Similarity.labelNoise(ranking, labels, "id", "label")
      .collect().map(r => r.getAs[Long]("qid") -> r).toMap
    assert(out.size == 4)
    val a = out(100L)
    assert(a.getAs[Long]("n_neighbors") == 4 &&
      a.getAs[Long]("n_disagree") == 3 &&
      a.getAs[Long]("disagree_bp") == 7500 &&
      a.getAs[Long]("plurality_label") == 1 &&
      a.getAs[Boolean]("suspect"))
    assert(!out(101L).getAs[Boolean]("suspect"))
    val c = out(102L)
    assert(c.getAs[Long]("plurality_label") == 1 &&
      c.getAs[Long]("disagree_bp") == 10000 &&
      c.getAs[Boolean]("suspect"))
    val d = out(103L)
    assert(d.getAs[Long]("disagree_bp") == 5000 &&
      d.getAs[Long]("plurality_label") == 5 &&
      !d.getAs[Boolean]("suspect"))

    assert(Similarity.labelNoise(
      Seq.empty[(Long, Long, Int)].toDF("qid", "id", "rank"),
      labels, "id", "label").count() == 0)
  }

  test("labelNoise is ranking-agnostic: IVF at nprobe=nlist reproduces the brute-force audit end to end") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .na.drop(Seq("embedding"))
      .select(col("vec_id").as("id"), col("embedding").as("vec"),
        col("label").cast("long").as("label"))
    val q = e.filter(col("id") < 10).select(col("id").as("qid"),
      col("vec"))
    val labels = e.select(col("id"), col("label"))
    val brute = Similarity.labelNoise(
      Similarity.bruteForceTopK(q, e.select(col("id"), col("vec")), 10),
      labels, "id", "label").collect().map(_.toSeq).toSet
    val ivf = Similarity.labelNoise(
      Similarity.ivfTopK(q, e.select(col("id"), col("vec")), k = 10,
        nlist = 8, nprobe = 8),
      labels, "id", "label").collect().map(_.toSeq).toSet
    assert(brute.nonEmpty && ivf == brute,
      "celled ranking diverged from the brute audit at lossless probe")
  }

  test("embeddingDrift: stable/negated/one-sided strata") {
    import spark.implicits._
    def df(rows: (String, Seq[Float])*) =
      rows.toSeq.toDF("key", "vec")
    val a = df(
      ("stable", Seq(1f, 0f)), ("stable", Seq(1f, 2f)),
      ("flip", Seq(0f, 1f)), ("gone", Seq(3f, 4f)))
    val b = df(
      ("stable", Seq(1f, 1f)),
      ("flip", Seq(0f, -1f)), ("flip", Seq(0f, -3f)),
      ("new", Seq(5f, 5f)))
    val got = Similarity.embeddingDrift(a, b, "key", "vec")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    // stable: means (1, 1) vs (1, 1) -> cos 1.0
    assert(got("stable") == ((2L, 1L, Some(1.0))))
    // flip: mean (0, 1) vs (0, -2) -> cos -1.0
    assert(got("flip") == ((1L, 2L, Some(-1.0))))
    // one-sided strata survive the full outer with null cosine
    assert(got("gone") == ((1L, 0L, None)))
    assert(got("new") == ((0L, 1L, None)))
  }
}

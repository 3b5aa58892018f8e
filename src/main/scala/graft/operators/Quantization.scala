package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding compression for ANN at scale (training-data extension).
  *
  * [[quantizeInt8]] is per-vector symmetric scalar quantization — 4x
  * smaller vectors, exact SQL-replayable arithmetic (`floor(x/scale*127
  * + 0.5)`, no rounding-mode ambiguity between engines).
  *
  * [[PqModel]] / [[encodePq]] / [[pqTopK]] is product quantization
  * (Jégou et al. 2011, the FAISS `PQ` index): split each vector into
  * `m` subspaces, k-means each subspace to `k` centroids, store one code
  * byte per subspace (m bytes total vs 4*dim — 32x for dim=64, m=8).
  * Search uses asymmetric distance computation: per query, an m x k
  * lookup table of exact subspace distances is built once (driver-side
  * literals — m*k tiny numbers), and every corpus row is scored by m
  * array lookups + a sum, entirely inside WholeStageCodegen. At 100 TB
  * the corpus carries only its code arrays (the one-time [[encodePq]]
  * transform is a stored column, like the IVF cell id), the scan is
  * narrow, and the top-k window prunes per-partition before the shuffle
  * (WindowGroupLimit) — same plan shape as [[Similarity.bruteForceTopK]]
  * but reading 32x fewer bytes.
  *
  * Training is driver-side Lloyd's on a bounded sample (the FAISS
  * convention — PQ codebooks train on ~100k vectors regardless of corpus
  * size); encoding and search are the distributed paths.
  */
object Quantization {

  /** int8-quantize: q_i = floor(v_i / max|v| * 127 + 0.5), zero vectors
    * to all-zero codes. Returns array<int> in [-127, 127]. */
  def quantizeInt8(vec: Column): Column = {
    val v = transform(vec, _.cast("double"))
    val scale = array_max(transform(v, x => abs(x)))
    when(scale === 0d, transform(v, _ => lit(0).cast("int")))
      .otherwise(transform(v,
        x => floor(x / scale * 127d + 0.5d).cast("int")))
  }

  /** The per-vector dequantization scale that pairs with
    * [[quantizeInt8]] (v_i ~ q_i * scale / 127). */
  def int8Scale(vec: Column): Column =
    array_max(transform(vec, x => abs(x.cast("double"))))

  /** PQ codebooks: `m` subspaces x `k` centroids x (dim/m) doubles. */
  final case class PqModel(dim: Int, m: Int, k: Int,
                           centroids: Array[Array[Array[Double]]]) {
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val subDim: Int = dim / m
  }

  /** Train PQ codebooks with driver-side Lloyd's over a deterministic
    * sample (first `sampleSize` rows by id). Init = first k distinct
    * sample vectors per subspace; empty cells keep their centroid. Only
    * the sample is collected — corpus-sized data never reaches the
    * driver. */
  def trainPq(corpus: DataFrame, dim: Int, m: Int = 8, k: Int = 16,
              iters: Int = 10, sampleSize: Int = 2048): PqModel = {
    val subDim = dim / m
    val sample = corpus.select(col("id"), col("vec")).na.drop(Seq("vec"))
      .orderBy(col("id")).limit(sampleSize).collect()
      .map(_.getSeq[Float](1).toArray.map(_.toDouble))
    val cents = Array.tabulate(m) { sub =>
      val vs = sample.map(v => v.slice(sub * subDim, (sub + 1) * subDim))
      // content-distinct (Array.distinct is reference-based) so k-means
      // init never wastes centroids on duplicates
      var c = vs.map(_.toSeq).distinct.take(k).map(_.toArray)
      if (c.length < k) c = c ++ Array.fill(k - c.length)(c.head)
      for (_ <- 1 to iters) {
        val assign = vs.map(v => (nearestL2(v, c), v))
        c = c.zipWithIndex.map { case (old, i) =>
          val mine = assign.filter(_._1 == i).map(_._2)
          if (mine.isEmpty) old
          else {
            val mean = new Array[Double](subDim)
            mine.foreach(v => for (d <- 0 until subDim) mean(d) += v(d))
            mean.map(_ / mine.length)
          }
        }
      }
      c
    }
    PqModel(dim, m, k, cents)
  }

  private def nearestL2(v: Array[Double], cents: Array[Array[Double]]): Int = {
    var best = 0; var bestD = Double.MaxValue
    for (i <- cents.indices) {
      var d = 0d; val c = cents(i)
      for (j <- v.indices) { val t = v(j) - c(j); d += t * t }
      if (d < bestD) { bestD = d; best = i }
    }
    best
  }

  /** Attach the m-byte PQ code array — the stored-table transform. One
    * codegen'd kernel call per row ([[graft.functions.expressions
    * .PqEncode]]); the codebook rides along as a plan reference
    * object. */
  def encodePq(corpus: DataFrame, vecCol: String, model: PqModel,
               codeCol: String = "pq_code"): DataFrame =
    corpus.withColumn(codeCol,
      graft.functions.expressions.PqEncode.pq_encode(
        col(vecCol), model.centroids))

  /** ADC top-k: approximate L2 distance = sum over subspaces of the
    * exact query-subvector -> centroid distance looked up by the stored
    * code. `queries` (qid, vec) is collected (bounded — the query set);
    * per query the m x k LUT becomes plan literals. Output (qid, rank,
    * id, adc_dist), rank 1 = nearest. */
  def pqTopK(queries: DataFrame, corpus: DataFrame, model: PqModel,
             k: Int): DataFrame = {
    val qs = queries.select(col("qid"), col("vec")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray.map(_.toDouble)))
    val coded = encodePq(corpus.select(col("id"), col("vec")), "vec", model)
    val lutRows = qs.map { case (qid, qv) =>
      val lut = Array.tabulate(model.m) { sub =>
        val slc = qv.slice(sub * model.subDim, (sub + 1) * model.subDim)
        model.centroids(sub).map { c =>
          var d = 0d
          for (j <- slc.indices) { val t = slc(j) - c(j); d += t * t }
          d
        }.toSeq
      }.toSeq
      struct(lit(qid).as("qid"), typedLit(lut).as("lut"))
    }
    val scored = coded
      .select(col("id"), col("pq_code"),
        explode(array(lutRows: _*)).as("q"))
      .select(col("id"), col("q.qid").as("qid"),
        round(aggregate(
          zip_with(col("pq_code"), col("q.lut"),
            (code, lut) => element_at(lut, code + 1)),
          lit(0d), (acc, x) => acc + x), 6).as("adc_dist"))
      .filter(col("qid") =!= col("id"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("adc_dist").asc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id"), col("adc_dist"))
  }

  /** IVF-PQ ANN (the FAISS `IVFPQ` composite): corpus rows carry BOTH
    * their IVF cell id and their PQ code (two one-time stored-column
    * transforms); a query probes its `nprobe` nearest cells and ADC-scores
    * only those cells' codes. This is the standard billion-scale index
    * shape — the cell prunes the scan, the code shrinks the bytes read.
    * With `nprobe == nlist` the routing is lossless and the result is
    * bit-equal to [[pqTopK]] (SimilaritySpec asserts this).
    *
    * Query cells are computed driver-side from the collected (bounded)
    * query set with the same cosine-argmax rule as
    * [[Similarity.probeCells]], so corpus and query agree on geometry. */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, model: PqModel,
                k: Int, nlist: Int = 16, nprobe: Int = 4,
                centroids: Option[Array[Array[Float]]] = None): DataFrame = {
    val base = corpus.select(col("id"), col("vec")).na.drop(Seq("vec"))
    val cents = centroids.getOrElse(Similarity.trainCentroids(base, nlist))
    val coded = encodePq(base, "vec", model)
      .withColumn("cell", Similarity.cellOf(col("vec"), cents))
      .select(col("id"), col("cell"), col("pq_code"))
    val qs = queries.select(col("qid"), col("vec")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray.map(_.toDouble)))
    val qRows = qs.flatMap { case (qid, qv) =>
      val lut = Array.tabulate(model.m) { sub =>
        val slc = qv.slice(sub * model.subDim, (sub + 1) * model.subDim)
        model.centroids(sub).map { c =>
          var d = 0d
          for (j <- slc.indices) { val t = slc(j) - c(j); d += t * t }
          d
        }.toSeq
      }.toSeq
      nearestCells(qv, cents, nprobe).map(cell =>
        struct(lit(qid).as("qid"), typedLit(lut).as("lut"),
          lit(cell).as("cell")))
    }
    val q = queries.sparkSession.range(1)
      .select(explode(array(qRows.toIndexedSeq: _*)).as("q"))
      .select(col("q.qid").as("qid"), col("q.lut").as("lut"),
        col("q.cell").as("cell"))
    val scored = coded.join(broadcast(q), Seq("cell"))
      .filter(col("qid") =!= col("id"))
      .select(col("id"), col("qid"),
        round(aggregate(
          zip_with(col("pq_code"), col("lut"),
            (code, lut) => element_at(lut, code + 1)),
          lit(0d), (acc, x) => acc + x), 6).as("adc_dist"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("adc_dist").asc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id"), col("adc_dist"))
  }

  /** Driver-side `nprobe` nearest centroids by cosine — the collected-
    * query twin of [[Similarity.probeCells]] (same cosine score; exact
    * score ties resolve to the lower cell id). */
  private def nearestCells(v: Array[Double], cents: Array[Array[Float]],
                           nprobe: Int): Seq[Int] = {
    def cos(a: Array[Double], b: Array[Float]): Double = {
      var dot = 0d; var na = 0d; var nb = 0d
      for (i <- a.indices) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i).toDouble * b(i)
      }
      if (na == 0 || nb == 0) 0d else dot / math.sqrt(na * nb)
    }
    cents.zipWithIndex.map { case (c, i) => (cos(v, c), i) }
      .sortBy { case (s, i) => (-s, i) }.take(nprobe).map(_._2).toSeq
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.expressions.VectorKernels

/** Approximate-nearest-neighbor search over embedding columns.
  *
  * [[bruteForceTopK]] is the exact baseline: broadcast the (small) query
  * set, score every corpus row with the codegen'd cosine kernel, take
  * per-query top-k with a window. One corpus scan, no shuffle of the
  * corpus itself — at 100 TB this is the "scan everything once" floor.
  *
  * [[lshTopK]] is the scale path: deterministic hyperplane LSH assigns
  * each corpus vector to `numTables` sign-buckets; a query only scores
  * rows sharing a bucket (multi-probe via tables). Corpus bucketing is a
  * one-time transform (writable as a bucketed table); per-query work drops
  * from |corpus| to the bucket population.
  */
object Similarity {

  /** Deterministic unit hyperplanes: `count` rows of `dim` doubles from
    * a seeded xorshift — same on every JVM. Returned as a literal array
    * column (goes to every executor with the plan, no broadcast var). */
  def hyperplanes(dim: Int, count: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(count)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** (table, bucket) rows for every LSH table of each input row — one
    * codegen'd kernel pass ([[graft.functions.expressions
    * .HyperplaneBuckets]]) + posexplode. */
  def withBuckets(df: DataFrame, vecCol: String,
                  planes: Array[Array[Double]], numBits: Int,
                  numTables: Int): DataFrame =
    df.select(col("*"),
        posexplode(graft.functions.expressions.HyperplaneBuckets
          .hyperplane_buckets(col(vecCol), planes, numBits, numTables)))
      .withColumnRenamed("pos", "table")
      .withColumnRenamed("col", "bucket")

  /** Exact top-k cosine neighbors for each query vector.
    * `queries`: (qid, vec); `corpus`: (id, vec). Output (qid, rank, id,
    * cosine). Requires queries to be broadcastable. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val scored = corpus.select(col("id"), col("vec"))
      .crossJoin(broadcast(queries.select(col("qid"), col("vec").as("qvec"))))
      .withColumn("cosine", round(VectorKernels.cosine_sim(col("qvec"), col("vec")), 6))
      .filter(col("qid") =!= col("id"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id"), col("cosine"))
  }

  /** Matryoshka truncation audit (Kusupati et al. 2022, "Matryoshka
    * Representation Learning"): how much exact top-k retrieval quality
    * survives truncating every embedding to its first `dims`
    * dimensions — the question an MRL deployment answers before
    * serving the cheap prefix instead of the full vector. Runs the
    * SAME exact scorer ([[bruteForceTopK]]: 6-dp-rounded cosine, id
    * tiebreak) at full and truncated width and reports, per query, the
    * top-k overlap as recall in exact integer basis points — engine-
    * replayable because both rankings and the intersection count are.
    *
    * Scale shape: two brute passes (corpus scanned twice, never
    * shuffled — queries broadcast) plus a (qid, id)-keyed join of two
    * k-row-per-query frames. At 100 TB feed [[ivfTopK]] candidates as
    * the corpus the same way bruteForceTopK's doc says. */
  def matryoshkaRecall(queries: DataFrame, corpus: DataFrame,
                       k: Int, dims: Int): DataFrame = {
    require(k >= 1 && dims >= 1, "k and dims must be positive")
    // slice past the array length is a silent no-op on BOTH engines, so
    // dims >= the embedding width would make the audit trivially report
    // recall_bp = 10000 ("no quality loss") instead of failing loudly —
    // probe one corpus row (bounded driver action, the train precedent)
    corpus.select(size(col("vec")).as("_w")).limit(1).collect()
      .foreach { r =>
        val w = r.getInt(0)
        require(dims < w,
          s"dims=$dims must be < the embedding width ($w): truncation " +
            "would be a no-op and the audit would report perfect recall")
      }
    def trunc(df: DataFrame, idc: String) = df
      .select(col(idc), slice(col("vec"), 1, dims).as("vec"))
    val full = bruteForceTopK(queries, corpus, k)
      .select(col("qid"), col("id"))
    val cheap = bruteForceTopK(trunc(queries, "qid"), trunc(corpus, "id"), k)
      .select(col("qid"), col("id"))
    val hits = full.join(cheap, Seq("qid", "id"))
      .groupBy(col("qid")).agg(count(lit(1)).as("n_hits"))
    full.groupBy(col("qid")).agg(count(lit(1)).as("n_full"))
      .join(hits, Seq("qid"), "left")
      .withColumn("n_hits", coalesce(col("n_hits"), lit(0L)))
      .withColumn("recall_bp", expr("n_hits * 10000L div n_full"))
      .select(col("qid"), col("n_full"), col("n_hits"), col("recall_bp"))
  }

  /** Hard-negative mining for embedding/contrastive training: for each
    * anchor, the top-k highest-cosine candidates that are NOT positives
    * (different `label`) and not near-duplicate twins (rounded cosine
    * below `dupCos` — mislabeled near-copies are the classic false
    * negative, so they are excluded, the FAISS/SBERT mining recipe).
    * `queries`: (qid, vec, label); `corpus`: (id, vec, label).
    * Output (qid, rank, id, cosine), engine-exact: 6-dp-rounded cosine
    * ranks with id tiebreak, threshold applied to the ROUNDED value.
    * Same scale shape as `bruteForceTopK` (corpus scanned once, never
    * shuffled; per-partition top-k via WindowGroupLimit); at 100 TB
    * feed `ivfTopK` candidates in as the corpus instead of brute force.
    */
  def hardNegatives(queries: DataFrame, corpus: DataFrame, k: Int,
                    dupCos: Double = 0.99): DataFrame = {
    val scored = corpus.select(col("id"), col("vec"), col("label"))
      .crossJoin(broadcast(queries.select(col("qid"),
        col("vec").as("qvec"), col("label").as("qlabel"))))
      .withColumn("cosine",
        round(VectorKernels.cosine_sim(col("qvec"), col("vec")), 6))
      .filter(col("qid") =!= col("id") &&
        col("label") =!= col("qlabel") && col("cosine") < dupCos)
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank").cast("long"), col("id"), col("cosine"))
  }

  /** Margin-based pair mining (the LASER/CCMatrix bitext recipe,
    * Artetxe & Schwenk 2019): a candidate pair (x, y) scores
    * `cos(x,y) / ((avgK(x) + avgK(y)) / 2)` where avgK is the mean
    * cosine of the vector's k nearest neighbors on the OTHER side —
    * the margin discounts hubs that are close to everything, which is
    * what makes this beat a raw cosine threshold for parallel-pair
    * mining. Keeps the single best y per x with margin ≥ `minMargin`.
    *
    * `xs`: (xid, vec); `ys`: (yid, vec). Output (xid, yid, cosine,
    * margin), one row per matched x.
    *
    * Engine-exact determinism: cosines are 6-dp-rounded; each avgK is
    * a sum of `round(cos·1e6)` LONGS (order-free exact integer sum)
    * divided back out, and the margin compares/ranks on its 4-dp
    * rounding with a yid tiebreak — so another engine replays the
    * mining bit-for-bit. The divisor is k by definition (the standard
    * margin), so a side with FEWER than k candidates gets a
    * deflated average and inflated margins — deterministically, and
    * identically in the oracle — but callers should feed sides with
    * at least k members for the scores to mean what the paper's do.
    *
    * Scale shape: the gate form scores all pairs with ONE cross join
    * (the smaller side broadcast) and reuses that one scored frame for
    * both k-NN stats and the final pick — no second scoring pass. At
    * 100 TB substitute `ivfTopK` candidates for the cross join (margin
    * only ever needs each side's top-k neighborhood, which IVF
    * already produces) — the margin/pick stages are unchanged, keyed
    * on ids, and never move vectors. */
  def marginMining(xs: DataFrame, ys: DataFrame, k: Int = 4,
                   minMargin: Double = 1.0): DataFrame = {
    val scored = ys.select(col("yid"), col("vec"))
      .crossJoin(broadcast(xs.select(col("xid"), col("vec").as("xvec"))))
      .withColumn("cosine",
        round(VectorKernels.cosine_sim(col("xvec"), col("vec")), 6))
      .select(col("xid"), col("yid"), col("cosine"),
        round(col("cosine") * 1e6).cast("long").as("c6"))
      .localCheckpoint()
    marginPick(scored, k, minMargin)
  }

  /** [[marginMining]] with IVF-celled candidate generation — the scale
    * path the brute form's doc promises. `ys` are assigned to their
    * nearest-centroid cell once (at scale: a partition column of the
    * stored table, the [[graft.streaming.AnnIngest]] layout); each x
    * scores only its `nprobe` nearest cells' ys, so candidate
    * generation reads p cells instead of the corpus. `nprobe == nlist`
    * degenerates to every pair — PROVABLY the brute operator
    * (ConversationsSpec asserts bit-equality; the gate's oracle is the
    * same all-pairs SQL) — while `nprobe < nlist` prunes with the
    * planted-cluster recall the spec measures. The margin/pick stages
    * are shared code operating on whatever candidate frame arrives.
    * The probed x side broadcasts (the `ivfTopK` convention — queries
    * are the bounded side); when BOTH sides are corpus-scale, use
    * [[marginMiningCells]], which shuffles on the cell key instead.
    *
    * `redundancy` > 1 indexes each y in its `redundancy` nearest cells
    * (multi-assignment — the standard recall remedy when clusters are
    * weak and nearest neighbors straddle cell boundaries; FAISS/SPANN
    * boundary replication). Index size scales by the factor; candidate
    * duplicates (a pair meeting in several cells) are collapsed
    * exactly before the margin stats so the k-NN neighborhoods never
    * double-count a neighbor — at `nprobe == nlist` any redundancy is
    * STILL the brute operator (same all-pairs oracle gates it). */
  def marginMiningIvf(xs: DataFrame, ys: DataFrame, k: Int = 4,
                      minMargin: Double = 1.0, nlist: Int = 8,
                      nprobe: Int = 8, redundancy: Int = 1): DataFrame = {
    val cents = trainCentroids(
      ys.select(col("yid").as("id"), col("vec")), nlist)
    val c = ys.select(col("yid"), col("vec"))
      .withColumn("cell", assignCells(cents, redundancy))
    val q = xs.select(col("xid"), col("vec").as("xvec"))
      .withColumn("cell", explode(probeCells(col("xvec"), cents, nprobe)))
    val scored0 = c.join(broadcast(q), Seq("cell"))
      .withColumn("cosine",
        round(VectorKernels.cosine_sim(col("xvec"), col("vec")), 6))
      .select(col("xid"), col("yid"), col("cosine"),
        round(col("cosine") * 1e6).cast("long").as("c6"))
    val scored = dedupPairs(scored0, redundancy).localCheckpoint()
    marginPick(scored, k, minMargin)
  }

  /** Cell column for the stored side: nearest cell at `redundancy` 1,
    * else the row explodes into its `redundancy` nearest cells. */
  private def assignCells(cents: Array[Array[Float]],
                          redundancy: Int): Column =
    if (redundancy <= 1) cellOf(col("vec"), cents)
    else explode(probeCells(col("vec"), cents, redundancy))

  /** Multi-assignment lets one (x, y) pair meet in several cells;
    * collapse exactly (duplicate rows are bit-identical — same
    * rounded cosine) so neighborhood stats never double-count. The
    * exchange only exists when redundancy demands it. */
  private def dedupPairs(scored: DataFrame, redundancy: Int): DataFrame =
    if (redundancy <= 1) scored else scored.dropDuplicates("xid", "yid")

  /** [[marginMiningIvf]] for the BOTH-SIDES-HUGE case (the LASER/
    * CCMatrix shape: two corpus-scale "languages", neither
    * broadcastable). Identical candidate semantics — ys cell-assigned
    * once, xs routed to their `nprobe` nearest cells — but the
    * candidate join is a cell EQUI-JOIN with both sides SHUFFLED on
    * the cell key (shuffle_hash hint, pinned so AQE can't
    * "helpfully" broadcast a side that only looks small at test SF):
    * each task reads one cell's ys plus the xs that probe it, and no
    * vector set ever has to fit in one executor or on the driver.
    *
    * At warehouse scale ys are STORED cell-partitioned (the
    * [[graft.streaming.AnnIngest]] layout), so their side of the
    * shuffle collapses to partition-local reads; only the x routing
    * moves. Parallelism is bounded by `nlist` — at corpus scale pick
    * nlist >> cores (the FAISS sqrt(N) convention: 10^4-10^5 cells at
    * 10^9 vectors), which simultaneously bounds per-cell candidate
    * quadratics; a residual hot cell is a data-skew problem AQE's
    * skew-join split handles, since the join is a plain shuffle join.
    * `nprobe == nlist` again degenerates to every pair, so the same
    * all-pairs oracle gates this form lossless, and PlanShapeSpec
    * pins the no-broadcast claim. `redundancy` as in
    * [[marginMiningIvf]] (multi-assignment recall remedy; the exact
    * pair collapse rides the same shuffled plan). */
  def marginMiningCells(xs: DataFrame, ys: DataFrame, k: Int = 4,
                        minMargin: Double = 1.0, nlist: Int = 8,
                        nprobe: Int = 8, redundancy: Int = 1): DataFrame =
    marginPick(
      dedupPairs(cellCandidates(xs, ys, nlist, nprobe, redundancy),
        redundancy).localCheckpoint(),
      k, minMargin)

  /** [[marginMiningCells]]'s candidate frame, exposed pre-checkpoint so
    * PlanShapeSpec can pin the shuffled (never broadcast) join shape. */
  private[graft] def cellCandidates(xs: DataFrame, ys: DataFrame,
                                    nlist: Int, nprobe: Int,
                                    redundancy: Int = 1): DataFrame = {
    val cents = trainCentroids(
      ys.select(col("yid").as("id"), col("vec")), nlist)
    val c = ys.select(col("yid"), col("vec"))
      .withColumn("cell", assignCells(cents, redundancy))
    val q = xs.select(col("xid"), col("vec").as("xvec"))
      .withColumn("cell", explode(probeCells(col("xvec"), cents, nprobe)))
    c.hint("shuffle_hash").join(q, Seq("cell"))
      .withColumn("cosine",
        round(VectorKernels.cosine_sim(col("xvec"), col("vec")), 6))
      .select(col("xid"), col("yid"), col("cosine"),
        round(col("cosine") * 1e6).cast("long").as("c6"))
  }

  /** Margin scoring + best-match pick over a candidate frame
    * (xid, yid, cosine, c6): each side's top-`k` neighborhood average
    * as exact integer sums, ratio margin, one best y per x at
    * `minMargin`+. Shared by [[marginMining]] / [[marginMiningIvf]] /
    * [[marginMiningCells]]. */
  private def marginPick(scored: DataFrame, k: Int,
                         minMargin: Double): DataFrame = {
    def avgK(side: String): DataFrame = {
      val other = if (side == "xid") "yid" else "xid"
      val w = Window.partitionBy(col(side))
        .orderBy(col("cosine").desc, col(other))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .groupBy(col(side))
        .agg((sum(col("c6")).cast("double") / (k * 1e6))
          .as(s"avg_$side"))
    }

    val w = Window.partitionBy(col("xid"))
      .orderBy(col("margin").desc, col("yid"))
    scored
      .join(avgK("xid"), "xid")
      .join(avgK("yid"), "yid")
      .withColumn("margin", round(
        col("cosine") / ((col("avg_xid") + col("avg_yid")) / 2d), 4))
      .filter(col("margin") >= minMargin)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") === 1)
      .select(col("xid"), col("yid"), col("cosine"), col("margin"))
  }

  // ---- IVF (inverted-file) ANN ---------------------------------------

  /** Lloyd's k-means over the corpus embeddings, entirely as DataFrame
    * jobs: assignment is `nlist` codegen'd cosine kernels + argmax; the
    * new centroid is the element-wise mean via posexplode + groupBy
    * (cell, dim) — only (nlist × dim) aggregates ever reach the driver.
    * Deterministic: init = first `nlist` vectors by id. At 100 TB you
    * train on a sample (pass one in); assignment stays a full-scan
    * narrow map either way. */
  def trainCentroids(corpus: DataFrame, nlist: Int = 16,
                     iters: Int = 2): Array[Array[Float]] = {
    val vecs = corpus.select(col("id"), col("vec")).na.drop(Seq("vec"))
    var centroids = vecs.orderBy(col("id"))
      .limit(nlist).collect()
      .map(_.getSeq[Float](1).toArray)
    for (_ <- 1 to iters) {
      val assigned = vecs.select(col("vec"),
        cellOf(col("vec"), centroids).as("cell"))
      val means = assigned
        .select(col("cell"), posexplode(col("vec")))
        .groupBy(col("cell"), col("pos"))
        .agg(avg(col("col")).as("m"))
        .collect()
      val byCell = means.groupBy(_.getInt(0))
      centroids = centroids.zipWithIndex.map { case (old, cell) =>
        byCell.get(cell) match {
          case Some(rows) =>
            val m = old.clone()
            rows.foreach(r => m(r.getInt(1)) = r.getDouble(2).toFloat)
            m
          case None => old // empty cell keeps its centroid
        }
      }
    }
    centroids
  }

  /** Offline IVF RECENTROID — the periodic index rebuild
    * [[graft.streaming.AnnIngest]] names as the only legitimate way to
    * move centroids (live retraining would re-route future appends away
    * from stored vectors). Lloyd's k-means like [[trainCentroids]], but
    * every arithmetic step is ORDER-FREE and cross-engine exact, so the
    * whole rebuild is value-replayable by another engine (the
    * `s3b_ann_recentroid` oracle replays both iterations in DuckDB):
    *
    *  - assignment: argmax of ROUND(cosine, 6), exact ties to the LOWER
    *    cell — the [[graft.streaming.AnnIngest]] contract;
    *  - centroid update: element-wise mean over INTEGER-QUANTIZED
    *    coordinates — `q = round(x·10⁴)` per element, exact long sums
    *    (commutative: no float summation-order dependence, the trap
    *    that makes naive float k-means nondeterministic run-to-run),
    *    `mq = floor(Σq / n)`, new coordinate = `float(mq / 10⁴)`
    *    (float-cast so stored f32 geometry and the replay agree bit-for
    *    -bit);
    *  - init: the `nlist` smallest-id vectors (cell = rank), the same
    *    deterministic seed rule as the streaming ingest;
    *  - empty cells keep their previous centroid.
    *
    * Distribution shape: per iteration one narrow assignment scan +
    * one (cell, dim)-keyed aggregation — only nlist × dim longs reach
    * the driver. Returns (final assignment (id, cell), final quantized
    * centroids `[cell][dim] = mq`). */
  def recentroidQuantized(vecs0: DataFrame, idCol: String, vecCol: String,
                          nlist: Int, iters: Int = 2, scale: Int = 10000)
      : (DataFrame, Array[Array[Long]]) = {
    val (assigned, quantized, _) =
      recentroidFull(vecs0, idCol, vecCol, nlist, iters, scale)
    (assigned, quantized)
  }

  /** [[recentroidQuantized]] plus the FINAL FLOAT centroids the last
    * assignment actually used — updated cells carry the quantized
    * `(mq/scale).toFloat` grid point, empty cells keep their RAW seed
    * floats (which the quantized longs alone cannot reconstruct).
    * [[prototypicality]] scores against these. */
  private[graft] def recentroidFull(
      vecs0: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iters: Int = 2, scale: Int = 10000)
      : (DataFrame, Array[Array[Long]], Array[Array[Float]]) = {
    val vecs = vecs0.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .na.drop(Seq("vec")).persist()
    // HALF_UP away from zero — Spark round()'s and DuckDB ROUND()'s rule
    def hu(x: Double): Long =
      (if (x >= 0) math.floor(x + 0.5) else math.ceil(x - 0.5)).toLong
    var cents: Array[Array[Float]] = vecs.orderBy(col("id"))
      .limit(nlist).collect().map(_.getSeq[Float](1).toArray)
    // empty corpus ⇒ no seeds: an assignRounded over ZERO centroid
    // literals is an analysis error, not an empty frame — honor the
    // empty-inputs-yield-empty-outputs invariant explicitly
    if (cents.isEmpty) {
      val emptyAssign = vecs
        .select(col("id"), lit(0).cast("int").as("cell"))
        .filter(lit(false))
      vecs.unpersist(false)
      return (emptyAssign, Array.empty, Array.empty)
    }
    for (_ <- 1 to iters) {
      val assigned = vecs.select(col("vec"),
        assignRounded(col("vec"), cents).as("cell"))
      val sums = assigned
        .select(col("cell"), posexplode(col("vec")))
        .groupBy(col("cell"), col("pos"))
        .agg(sum(round(col("col").cast("double") * scale).cast("long"))
          .as("sq"), count(lit(1)).as("n"))
        .collect()
      val byCell = sums.groupBy(_.getInt(0))
      cents = cents.zipWithIndex.map { case (old, cell) =>
        byCell.get(cell).map { rows =>
          val m = old.clone()
          rows.foreach { r =>
            val mq = math.floor(
              r.getLong(2).toDouble / r.getLong(3)).toLong
            m(r.getInt(1)) = (mq.toDouble / scale).toFloat
          }
          m
        }.getOrElse(old)
      }
    }
    val quantized = cents.map(_.map(f => hu(f.toDouble * scale)))
    val finalAssign = vecs.select(col("id"),
      assignRounded(col("vec"), cents).as("cell"))
    vecs.unpersist(false)
    (finalAssign, quantized, cents)
  }

  /** Argmax of ROUND(cosine, 6) with exact ties to the lower cell —
    * the AnnIngest assignment contract as a codegen'd column. */
  def assignRounded(vec: Column, centroids: Array[Array[Float]]): Column = {
    val simIdx = array(centroids.zipWithIndex.map { case (cv, cell) =>
      struct(
        round(VectorKernels.cosine_sim(vec, typedLit(cv.toSeq)), 6)
          .as("cos"),
        lit(-cell).as("nc"))
    }: _*)
    (-array_max(simIdx).getField("nc")).cast("int")
  }

  /** Prototypicality pruning (the SSL-prototypes rule of Sorscher et
    * al. 2022, "Beyond neural scaling laws"): when data is abundant,
    * the examples CLOSEST to their cluster's prototype are the most
    * redundant — prune the most prototypical fraction and keep the
    * hard, informative tail. Concretely: one exact-integer Lloyd
    * iteration ([[recentroidQuantized]]) fixes the prototypes, every
    * vector scores `round(round(cos(vec, own_centroid), 6)·10⁶)` (the
    * repo's engine-exact cosine contract, then an integer), and within
    * each cell vectors rank by (cos desc, id asc). The prune is a
    * FLOOR-SPLIT in basis points — rank r is pruned iff
    * `(r−1)·10⁴ div n_cell < pruneBp` — the same replayable cut rule
    * as [[Sampling.stratifiedRankBuckets]], which also supplies the
    * rank itself: cells are few and huge (exactly the one-reducer-per-
    * stratum shape a naive per-cell window would hot-key), so the rank
    * is the shared two-phase range pass.
    *
    * Output: (id, cell, proto_cos_micro, rank, kept). Training keeps
    * `filter($"kept")`; the audit frame keeps everything.
    *
    * Scale shape: centroid fit = one narrow scan + an (nlist × dim)
    * aggregation; scoring = a codegen'd projection against literal
    * centroids; rank = the two-phase pass (range shuffle + driver-
    * folded offsets). No all-pairs anything. */
  def prototypicality(vecs0: DataFrame, idCol: String, vecCol: String,
                      nlist: Int = 8, pruneBp: Int = 2500): DataFrame = {
    require(nlist > 0, "nlist must be positive")
    require(pruneBp >= 0 && pruneBp <= 10000, "pruneBp must be in [0, 10000]")
    val vecs = vecs0.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .na.drop(Seq("vec"))
    // the FLOAT centroids the final assignment used — updated cells on
    // the quantized grid, empty cells still their raw seed floats
    val (_, _, cents) = recentroidFull(vecs, "id", "vec", nlist, iters = 1)
    // empty corpus ⇒ empty audit, never an analysis error
    if (cents.isEmpty) {
      return vecs.filter(lit(false)).select(col("id"),
        lit(0).cast("int").as("cell"), lit(0L).as("proto_cos_micro"),
        lit(0L).as("rank"), lit(true).as("kept"))
    }
    val cosOwn = cents.zipWithIndex.foldLeft(lit(null).cast("double")) {
      case (acc, (cv, i)) =>
        when(col("cell") === i,
          VectorKernels.cosine_sim(col("vec"), typedLit(cv.toSeq)))
          .otherwise(acc)
    }
    val scored = vecs
      .withColumn("cell", assignRounded(col("vec"), cents))
      // round at 6dp FIRST (the cross-engine cosine contract), then
      // scale to an exact integer — the second round removes the
      // float-representation residue of `0.123456 * 10⁶`
      .withColumn("_negcos",
        -round(round(cosOwn, 6) * 1000000).cast("long"))
    Sampling.stratifiedRankBuckets(scored, "id", "_negcos", "cell",
        buckets = 10000)
      .select(col("id"), col("stratum").cast("int").as("cell"),
        (-col("score")).as("proto_cos_micro"), col("rank"),
        (col("bucket") >= pruneBp).as("kept"))
  }

  /** k-NN label-noise audit (the Confident-Learning-style mislabel
    * detector a classifier-training pipeline runs before fitting):
    * a row whose nearest neighbors mostly carry a DIFFERENT label is a
    * suspected labeling error. Takes a neighbor ranking
    * `(qid, id, rank)` — [[bruteForceTopK]] for the exact form,
    * [[ivfTopK]] for the celled 100 TB path; the audit is
    * ranking-agnostic by design — plus the `(id, label)` table, and
    * emits per query: its own label, neighbor count, disagreeing
    * count, disagreement in basis points, the PLURALITY neighbor label
    * (the suggested relabel; ties break count-desc then label-asc),
    * and the `suspect` verdict (disagreement ≥ `suspectBp` AND the
    * plurality label differs).
    *
    * Scale shape: two hashed equi-joins onto the k-bounded ranking
    * frame (labels join on id/qid keys, never vectors), then one
    * (qid, nb_label) aggregation and a qid-keyed window over ≤ k rows
    * per query — qids are many and small, the safe window shape. */
  def labelNoise(ranking: DataFrame, labels: DataFrame,
                 idCol: String, labelCol: String,
                 suspectBp: Int = 5000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(suspectBp >= 0 && suspectBp <= 10000,
      "suspectBp must be in [0, 10000]")
    val lab = labels.select(col(idCol).as("_lid"),
      col(labelCol).as("_llabel"))
    val joined = ranking
      .join(lab.withColumnRenamed("_lid", "qid")
        .withColumnRenamed("_llabel", "own_label"), Seq("qid"))
      .join(lab.withColumnRenamed("_lid", "id")
        .withColumnRenamed("_llabel", "nb_label"), Seq("id"))
    val perLabel = joined
      .groupBy(col("qid"), col("own_label"), col("nb_label"))
      .agg(count(lit(1)).as("n_lab"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("n_lab").desc, col("nb_label"))
    perLabel
      .withColumn("_rk", row_number().over(w))
      .groupBy(col("qid"), col("own_label"))
      .agg(
        sum(col("n_lab")).as("n_neighbors"),
        sum(when(col("nb_label") =!= col("own_label"), col("n_lab"))
          .otherwise(0L)).as("n_disagree"),
        max(when(col("_rk") === 1, col("nb_label"))).as("plurality_label"))
      .withColumn("disagree_bp",
        expr("n_disagree * 10000L div greatest(n_neighbors, 1L)"))
      .withColumn("suspect",
        col("disagree_bp") >= suspectBp &&
          col("plurality_label") =!= col("own_label"))
      .select(col("qid"), col("own_label"), col("n_neighbors"),
        col("n_disagree"), col("disagree_bp"), col("plurality_label"),
        col("suspect"))
  }

  /** Nearest-centroid cell id: argmax over `nlist` codegen'd cosine
    * kernels against literal centroid vectors. */
  def cellOf(vec: Column, centroids: Array[Array[Float]]): Column = {
    val sims = array(centroids.map(c =>
      VectorKernels.cosine_sim(vec, typedLit(c.toSeq))): _*)
    (array_position(sims, array_max(sims)) - 1).cast("int")
  }

  /** The `nprobe` nearest centroid cells for a query vector. Exact
    * score ties resolve to the LOWER cell id — the same rule as
    * [[cellOf]]'s argmax and the driver-side twin in
    * [[Quantization]], so corpus and query geometry agree. */
  def probeCells(vec: Column, centroids: Array[Array[Float]],
                 nprobe: Int): Column = {
    // sort key is (-score, id): ascending array_sort yields descending
    // score with the lower id first on ties
    val simIdx = array(centroids.zipWithIndex.map { case (c, i) =>
      struct((-VectorKernels.cosine_sim(vec, typedLit(c.toSeq))).as("ns"),
        lit(i).as("i"))
    }: _*)
    transform(slice(array_sort(simIdx), 1, nprobe), p => p.getField("i"))
  }

  /** IVF ANN top-k: corpus rows are assigned to their nearest-centroid
    * cell (a one-time transform — at scale, a partition/bucket column of
    * the stored table); each query probes its `nprobe` nearest cells and
    * scores only those cells' rows. `nprobe == nlist` degenerates to the
    * exact scan (SimilaritySpec asserts bit-equality with brute force
    * there — the routing is provably lossless). */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              nlist: Int = 16, nprobe: Int = 4,
              centroids: Option[Array[Array[Float]]] = None): DataFrame = {
    val cents = centroids.getOrElse(
      trainCentroids(corpus.select(col("id"), col("vec")), nlist))
    val c = corpus.select(col("id"), col("vec")).na.drop(Seq("vec"))
      .withColumn("cell", cellOf(col("vec"), cents))
    val q = queries.select(col("qid"), col("vec").as("qvec"))
      .withColumn("cell", explode(probeCells(col("qvec"), cents, nprobe)))
    val scored = c.join(broadcast(q), Seq("cell"))
      .filter(col("qid") =!= col("id"))
      .withColumn("cosine", round(VectorKernels.cosine_sim(col("qvec"), col("vec")), 6))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id"), col("cosine"))
  }

  /** LSH-bucketed ANN top-k: score only bucket-mates across tables. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, dim: Int, k: Int,
              numBits: Int = 8, numTables: Int = 8): DataFrame = {
    val planes = hyperplanes(dim, numBits * numTables, seed = 42)
    val c = withBuckets(corpus.select(col("id"), col("vec")), "vec",
      planes, numBits, numTables)
    val q = withBuckets(queries.select(col("qid"), col("vec").as("qvec")),
      "qvec", planes, numBits, numTables)
    val scored = c.join(broadcast(q), Seq("table", "bucket"))
      .filter(col("qid") =!= col("id"))
      .dropDuplicates("qid", "id")
      .withColumn("cosine", round(VectorKernels.cosine_sim(col("qvec"), col("vec")), 6))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id"), col("cosine"))
  }

  /** Embedding-space drift between two corpus snapshots (crawl N vs
    * N+1, or train vs serve traffic): per stratum `keyCol`, both sides'
    * MEAN vectors and their cosine, plus the count shift — the
    * model-monitoring signal that a class's representation moved even
    * when its volume didn't (and vice versa).
    *
    * Shape: one `posexplode` pass per side (corpus × dim narrow rows),
    * hash-aggregated to per-(key, dim) sums — the only thing that ever
    * shuffles is keys × dim rows of (sum, count), never vectors. The
    * mean-cosine join then runs on that tiny frame. A 100 TB snapshot
    * pair costs two scans and bytes of shuffle.
    *
    * Arithmetic is oracle-replayable: float→double casts are exact,
    * means divide exact sums, and the cosine is rounded for display.
    * Returns (key, n_a, n_b, mean_cos); `mean_cos` null when either
    * side is absent or has a zero mean vector. */
  def embeddingDrift(a: DataFrame, b: DataFrame, keyCol: String,
                     vecCol: String): DataFrame = {
    def dimSums(df: DataFrame, side: String): DataFrame =
      df.select(col(keyCol).as("key"),
          posexplode(col(vecCol)).as(Seq("i", "v")))
        .withColumn("v", col("v").cast("double"))
        .groupBy(col("key"), col("i"))
        .agg(sum(col("v")).as(s"s_$side"),
          count(lit(1)).as(s"n_$side"))
    def counts(df: DataFrame, out: String): DataFrame =
      df.groupBy(col(keyCol).as("key")).agg(count(lit(1)).as(out))
    val joined = dimSums(a, "a").join(dimSums(b, "b"), Seq("key", "i"))
      .withColumn("ma", col("s_a") / col("n_a"))
      .withColumn("mb", col("s_b") / col("n_b"))
      .groupBy(col("key"))
      .agg(sum(col("ma") * col("mb")).as("dot"),
        sum(col("ma") * col("ma")).as("na"),
        sum(col("mb") * col("mb")).as("nb"))
      .withColumn("mean_cos",
        when(col("na") === 0 || col("nb") === 0,
          lit(null).cast("double"))
          .otherwise(round(col("dot") / sqrt(col("na") * col("nb")), 4)))
    counts(a, "n_a").join(counts(b, "n_b"), Seq("key"), "full_outer")
      .join(joined.select(col("key"), col("mean_cos")), Seq("key"), "left")
      .select(col("key").as(keyCol),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"), col("mean_cos"))
  }
}

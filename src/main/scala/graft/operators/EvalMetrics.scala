package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Generation-eval overlap metrics: ROUGE-N (distinct n-gram recall /
  * precision / F1) between candidate and reference text pairs — the
  * eval-harness step a training pipeline runs over model outputs vs
  * gold references (Lin 2004, ROUGE; the distinct-n-gram variant so
  * set arithmetic — not multiset clipping — defines the overlap, which
  * keeps every count SQL-replayable).
  *
  * Pure per-row column math: both shingle sets come from the codegen'd
  * [[graft.functions.expressions.WordShingles]] pass, the overlap is
  * `array_intersect`, and the three ratios are exact integer divisions
  * rounded for display. No shuffle, no UDF — a 100 TB eval sweep is one
  * map-only scan.
  */
object EvalMetrics {

  /** Bradley-Terry strength fitting over pairwise outcomes — the
    * leaderboard step that closes the preference loop (rankings →
    * pairs → model strengths; the Chatbot-Arena computation). Fits
    * Hunter (2004)'s MM updates,
    * `p_i ← W_i / Σ_j n_ij/(p_i + p_j)`, renormalized each round —
    * but entirely in EXACT integer arithmetic (strengths in micro
    * units, inner terms scaled by 10⁹, every division a floor), so a
    * fixed `iters` run replays engine-for-engine in SQL.
    *
    * Scale shape: the corpus of comparisons pays ONE hashed (winner,
    * loser) aggregation down to the K² pair-count matrix (K = number
    * of players/models — dozens); the matrix collects to the driver
    * (bounded by `maxPlayers`, the [[graft.operators.Quantization]]
    * trainPq precedent) and the K-sized MM loop runs there. Integer
    * bounds: wins and per-pair counts must stay ≤ ~9·10⁹ (they are
    * counts of human/AI judgments — far below at any real scale).
    *
    * Output per player: wins, matches, final strength (micro, floor-
    * normalized to Σ ≤ 10⁶) and the leaderboard rank (strength desc,
    * player asc). Zero-win players converge to strength 0. */
  def bradleyTerry(comparisons: DataFrame, winnerCol: String,
                   loserCol: String, iters: Int = 3,
                   maxPlayers: Int = 10000): DataFrame =
    bradleyTerryFromCounts(
      comparisons.select(col(winnerCol), col(loserCol),
        lit(1L).as("_n")),
      winnerCol, loserCol, "_n", iters, maxPlayers)

  /** [[bradleyTerry]] over PRE-AGGREGATED (winner, loser, n) counts —
    * the refit entry point for an incremental consumer (the streaming
    * leaderboard stores per-batch count deltas and refits from their
    * sum; the fit itself is identical). Unaggregated delta rows are
    * fine: they are summed per ordered pair here. */
  def bradleyTerryFromCounts(countsDf: DataFrame, winnerCol: String,
                             loserCol: String, nCol: String,
                             iters: Int = 3,
                             maxPlayers: Int = 10000): DataFrame = {
    require(iters >= 1 && iters <= 16, "iters must be in [1, 16]")
    val spark = countsDf.sparkSession
    import spark.implicits._
    // bound the collect BEFORE it happens: limit(maxPairs+1) keeps the
    // driver safe even when a caller mistakenly keys players by a
    // high-cardinality column — the old players-count require() only
    // ran after a potentially-OOMing collect
    val maxPairs = 1000000
    val counts = countsDf
      .select(col(winnerCol).cast("string").as("w"),
        col(loserCol).cast("string").as("l"),
        col(nCol).cast("long").as("n"))
      // a self-pair (winner == loser) is meaningless input — it would
      // inflate the player's wins AND double-count in the symmetric
      // match fold (both directions land on the same key), silently
      // biasing the MM fit; drop it (and null players) here so the fit
      // only ever sees real judgments. btFitSql applies the same rule.
      .filter(col("w") =!= col("l"))
      .groupBy(col("w"), col("l"))
      .agg(sum(col("n")).as("n"))
      .limit(maxPairs + 1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    require(counts.length <= maxPairs,
      s"pair-count matrix exceeds $maxPairs ordered pairs — players " +
        "must be model identities, not a per-row key")
    val players = counts.flatMap(c => Seq(c._1, c._2)).distinct.sorted
    require(players.length <= maxPlayers,
      s"${players.length} players exceed maxPlayers=$maxPlayers")
    if (players.isEmpty) {
      return Seq.empty[(String, Long, Long, Long, Long)]
        .toDF("player", "n_wins", "n_matches", "strength_micro", "rank")
    }
    val wins = counts.groupBy(_._1).map { case (p, cs) =>
      p -> cs.map(_._3).sum
    }.withDefaultValue(0L)
    // symmetric match counts per unordered pair, folded both directions
    val matches = scala.collection.mutable.HashMap
      .empty[(String, String), Long].withDefaultValue(0L)
    counts.foreach { case (w, l, n) =>
      matches((w, l)) += n; matches((l, w)) += n
    }
    val opponents = matches.keys.toSeq.groupBy(_._1)
      .map { case (p, ks) => p -> ks.map(_._2).sorted }
    val k = players.length
    var p = players.map(_ -> 1000000L / k).toMap
    (1 to iters).foreach { _ =>
      val den = players.map { i =>
        i -> opponents(i).map { j =>
          matches((i, j)) * 1000000000L / math.max(p(i) + p(j), 1L)
        }.sum
      }.toMap
      val raw = players.map(i =>
        i -> wins(i) * 1000000000L / math.max(den(i), 1L)).toMap
      val s = raw.values.sum
      p = raw.map { case (pl, v) => pl -> v * 1000000L / math.max(s, 1L) }
    }
    val ranked = players
      .map(pl => (pl, wins(pl), opponents(pl).map(j =>
        matches((pl, j))).sum, p(pl)))
      .sortBy { case (pl, _, _, st) => (-st, pl) }
      .zipWithIndex
      .map { case ((pl, w, m, st), i) => (pl, w, m, st, (i + 1).toLong) }
    ranked.toSeq
      .toDF("player", "n_wins", "n_matches", "strength_micro", "rank")
  }

  /** `pairs`: one row per (candidate, reference) pair. Appends
    * n_cand / n_ref / n_overlap counts and recall / precision / f1. */
  def rougeN(pairs: DataFrame, candCol: String, refCol: String,
             n: Int = 2): DataFrame = {
    val ratio = (num: org.apache.spark.sql.Column,
                 den: org.apache.spark.sql.Column) =>
      when(den === 0, lit(0.0))
        .otherwise(round(num.cast("double") / den, 6))
    pairs
      .withColumn("_c", TextFunctions.shingles(col(candCol), n))
      .withColumn("_r", TextFunctions.shingles(col(refCol), n))
      .withColumn("n_cand", size(col("_c")).cast("long"))
      .withColumn("n_ref", size(col("_r")).cast("long"))
      .withColumn("n_overlap",
        size(array_intersect(col("_c"), col("_r"))).cast("long"))
      .withColumn("recall", ratio(col("n_overlap"), col("n_ref")))
      .withColumn("precision", ratio(col("n_overlap"), col("n_cand")))
      // F1 = 2PR/(P+R) = 2·overlap/(n_cand+n_ref) on distinct sets
      .withColumn("f1",
        ratio(col("n_overlap") * 2, col("n_cand") + col("n_ref")))
      .drop("_c", "_r")
  }

  /** Word-bigram array of a token array (adjacent pairs joined by one
    * space); < 2 tokens ⇒ empty. */
  def bigrams(toks: Column): Column =
    when(size(toks) < 2, array().cast("array<string>"))
      .otherwise(zip_with(
        slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1),
        (x, y) => concat(x, lit(" "), y)))

  /** BLEU-2 in log space with CLIPPED (multiset) n-gram counts — the
    * real BLEU overlap (Papineni 2002), unlike [[rougeN]]'s distinct-set
    * variant: each candidate n-gram counts at most as often as it
    * appears in the reference.
    *
    *   log_bleu = min(0, 1 − |ref|/|cand|)            (brevity penalty)
    *            + ½·(ln p₁ + ln p₂),  p_n = clip_n / n-gram count
    *
    * Log space on purpose: only `ln` appears (IEEE-identical across
    * engines on identical inputs — the td_dsir precedent), never `exp`,
    * so an oracle replaying the same additions reproduces the value
    * bit-for-bit before the display round. NULL when the candidate has
    * no bigrams or either clipped count is zero (ln 0).
    *
    * Scale shape: unigrams and bigrams of each side ride ONE tagged
    * explode (two corpus scans total), clipped counts are a hash
    * aggregation keyed by (pair, gram) with map-side combine, and the
    * cand↔ref join is on the same key — no all-pairs, no window. The
    * gram streams are the shuffled unit; at 100 TB that is tokens × 2
    * rows of (id, short string), the same order as the corpus itself.
    *
    * `pairs`: idCol + candidate/reference TOKEN-ARRAY columns. */
  def bleu2Log(pairs: DataFrame, idCol: String, candCol: String,
               refCol: String): DataFrame = {
    val base = pairs.select(col(idCol).as("_id"),
        col(candCol).as("_c"), col(refCol).as("_r"))
      .withColumn("n_cand", size(col("_c")).cast("long"))
      .withColumn("n_ref", size(col("_r")).cast("long"))
    // one tagged gram stream per side: "1:tok" ∪ "2:tok tok"
    def gramCounts(arr: Column, out: String): DataFrame =
      base.select(col("_id"), explode(concat(
          transform(arr, g => concat(lit("1:"), g)),
          transform(bigrams(arr), g => concat(lit("2:"), g)))).as("g"))
        .groupBy(col("_id"), col("g"))
        .agg(count(lit(1)).as(out))
    val clips = gramCounts(col("_c"), "nc")
      .join(gramCounts(col("_r"), "nr"), Seq("_id", "g"))
      .groupBy(col("_id"))
      .agg(
        sum(when(col("g").startsWith("1:"),
          least(col("nc"), col("nr"))).otherwise(0)).as("clip1"),
        sum(when(col("g").startsWith("2:"),
          least(col("nc"), col("nr"))).otherwise(0)).as("clip2"))
    val p1 = col("clip1").cast("double") / col("n_cand").cast("double")
    val p2 = col("clip2").cast("double") /
      (col("n_cand") - 1).cast("double")
    base.join(clips, Seq("_id"), "left")
      .withColumn("clip1", coalesce(col("clip1"), lit(0L)))
      .withColumn("clip2", coalesce(col("clip2"), lit(0L)))
      .withColumn("log_bleu",
        when(col("n_cand") < 2 || col("clip1") === 0 || col("clip2") === 0,
          lit(null).cast("double"))
          .otherwise(round(
            least(lit(0.0),
              lit(1.0) - col("n_ref").cast("double") /
                col("n_cand").cast("double")) +
              lit(0.5) * (log(p1) + log(p2)), 4)))
      .select(col("_id").as(idCol), col("n_cand"), col("n_ref"),
        col("clip1"), col("clip2"), col("log_bleu"))
  }

  /** Rank-1..k DCG discounts as INTEGER micro-units:
    * round(10⁶ / log₂(r+1)). Pinned driver-side literals — never a
    * runtime log₂ — so Spark and any oracle engine sum the SAME exact
    * integers and the metric never hinges on last-ulp transcendental
    * agreement (integer sums are order-independent too, so the
    * aggregation needs no ordering guarantee). */
  def dcgDiscountsMicro(k: Int): Seq[Long] =
    (1 to k).map(r => math.round(1e6 / (math.log(r + 1.0) / math.log(2.0))))

  /** Retrieval-eval battery — per-query precision@k / recall@k /
    * reciprocal rank / nDCG@k of a ranked result list against a binary
    * relevance set (the IR eval a RAG / embedding-training pipeline runs
    * over every index build; Järvelin & Kekäläinen 2002 for DCG).
    *
    * `ranking`: (qid, rank, id) — rank 1-based, ≤ k rows per query (the
    * shape [[Similarity.bruteForceTopK]] / `ivfTopK` emit).
    * `relevant`: (qid, id) — the qrels.
    *
    * DCG/IDCG are summed in integer micro-units from
    * [[dcgDiscountsMicro]]; nDCG and the ratio metrics divide exact
    * integers, so every engine computes the identical IEEE quotient
    * before the display round.
    *
    * Scale shape: `ranking` is queries×k rows — the corpus never enters.
    * The relevance join is a hash join on (qid, id); everything after is
    * one hash aggregation per qid. Cost is O(queries·k + |qrels|)
    * regardless of corpus size. */
  def retrievalEval(ranking: DataFrame, relevant: DataFrame,
                    k: Int): DataFrame = {
    val disc = dcgDiscountsMicro(k)
    val discCol = element_at(
      array(disc.map(lit): _*), col("rank").cast("int"))
    val idcgPrefix = disc.scanLeft(0L)(_ + _).tail // idcg for n_rel=1..k
    val rel = relevant.select(col("qid"), col("id"), lit(1).as("_hit"))
    val nRel = relevant.groupBy(col("qid"))
      .agg(count(lit(1)).as("n_rel"))
    val perQ = ranking
      .join(rel, Seq("qid", "id"), "left")
      .groupBy(col("qid"))
      .agg(
        sum(when(col("_hit").isNotNull, 1L).otherwise(0L)).as("hits"),
        min(when(col("_hit").isNotNull, col("rank"))).as("first_hit_rank"),
        sum(when(col("_hit").isNotNull, discCol).otherwise(0L))
          .as("dcg_micro"))
    perQ.join(nRel, Seq("qid"), "left")
      .withColumn("n_rel", coalesce(col("n_rel"), lit(0L)))
      .withColumn("idcg_micro",
        when(col("n_rel") === 0, 0L).otherwise(element_at(
          array(idcgPrefix.map(lit): _*),
          least(col("n_rel"), lit(k.toLong)).cast("int"))))
      .withColumn("precision_k",
        round(col("hits").cast("double") / k, 6))
      .withColumn("recall_k",
        when(col("n_rel") === 0, lit(null).cast("double"))
          .otherwise(round(col("hits").cast("double") / col("n_rel"), 6)))
      .withColumn("rr",
        when(col("first_hit_rank").isNull, lit(0.0))
          .otherwise(round(lit(1.0) / col("first_hit_rank"), 6)))
      .withColumn("ndcg",
        when(col("idcg_micro") === 0, lit(null).cast("double"))
          .otherwise(round(
            col("dcg_micro").cast("double") / col("idcg_micro"), 6)))
      .select(col("qid"), col("n_rel"), col("hits"), col("first_hit_rank"),
        col("dcg_micro"), col("idcg_micro"), col("precision_k"),
        col("recall_k"), col("rr"), col("ndcg"))
  }

  /** Deterministic percentile-bootstrap confidence interval for a mean
    * score (Efron 1979) — the statistical-significance step an eval
    * harness runs before claiming a benchmark delta is real. Every
    * resample draw is a pure md5 function of (seed, replicate, slot):
    * no RNG, stable under retries and partitioning, and an independent
    * engine replays the WHOLE interval bit-for-bit.
    *
    * Integer discipline: scores are longs (micro-scale upstream); each
    * replicate's mean is a sign-split integer division (exact); the CI
    * bounds are nearest-rank (ceil) order statistics of the nBoot
    * replicate means.
    *
    * Scale shape: slots rank once via the shared two-phase range pass
    * (no global window); the draw grid is |eval set| × nBoot rows from
    * a bounded-nBoot broadcast cross join; draws resolve by one
    * rid-keyed equi-join; per-replicate means aggregate map-side.
    * Bounded driver work: n (1-row), the nBoot means (require ≤ 10⁴),
    * the point sum (1-row). Output: ONE row
    * (n, n_boot, mean_micro, ci_lo_micro, ci_hi_micro). */
  def bootstrapCi(scores: DataFrame, idCol: String, scoreCol: String,
                  nBoot: Int = 200, seed: String = "bs",
                  loBp: Int = 250, hiBp: Int = 9750): DataFrame = {
    require(nBoot >= 1 && nBoot <= 10000, "nBoot must be in [1, 10000]")
    require(loBp >= 0 && hiBp <= 10000 && loBp < hiBp,
      "need 0 <= loBp < hiBp <= 10000")
    val spark = scores.sparkSession
    import spark.implicits._
    val s = scores.select(col(idCol).as("_sid"),
      col(scoreCol).cast("long").as("score"))
    def signDiv(sumExpr: String, n: Long): String =
      s"CASE WHEN $sumExpr >= 0 THEN ($sumExpr) div ${n}L " +
        s"ELSE -((-($sumExpr)) div ${n}L) END"
    val slotted = Sampling.stratumRank(
        s.select(col("_sid").as("_id"), col("_sid").as("_ord")),
        "_id", "_ord", lit("all"))
      .select(col("id").as("_sid"), (col("rank") - 1L).as("rid"))
      .join(s, Seq("_sid"))
      .select(col("rid"), col("score"))
    val n = slotted.count()
    if (n == 0) {
      return Seq.empty[(Long, Long, Long, Long, Long)].toDF(
        "n", "n_boot", "mean_micro", "ci_lo_micro", "ci_hi_micro")
    }
    val reps = broadcast(spark.range(nBoot).toDF("b"))
    val means = slotted.select(col("rid").as("slot"))
      .crossJoin(reps)
      .withColumn("rid", pmod(
        conv(substring(md5(concat_ws(":", lit(seed), col("b"),
          col("slot"))), 1, 8), 16, 10).cast("long"), lit(n)))
      .join(slotted, Seq("rid"))
      .groupBy(col("b"))
      .agg(expr(signDiv("sum(score)", n)).as("m"))
      .collect().map(_.getAs[Long]("m")).sorted
    val tot = slotted.agg(coalesce(sum("score"), lit(0L))).head.getLong(0)
    val mean = if (tot >= 0) tot / n else -((-tot) / n)
    def atRank(bp: Int): Long =
      means(math.max((bp.toLong * nBoot + 9999) / 10000, 1L).toInt - 1)
    Seq((n, nBoot.toLong, mean, atRank(loBp), atRank(hiBp))).toDF(
      "n", "n_boot", "mean_micro", "ci_lo_micro", "ci_hi_micro")
  }

  /** Pairwise Cohen's kappa (Cohen 1960) — the companion to
    * [[fleissKappa]] that says WHICH raters disagree: for every rater
    * pair sharing at least `minCommon` items, observed agreement and
    * the chance-corrected kappa over their COMMON items, marginals per
    * pair (the strict Cohen form). One rating per (item, rater) is the
    * caller's contract (pick a canonical rating upstream — e.g. the
    * argmax-score label per item). All integer micros, sign-split
    * final division.
    *
    * Scale shape: an item-keyed self-join (per-item fan-out = raters
    * on that item, squared — annotation-scale, never corpus-scale),
    * then (rater_a, rater_b[, label])-keyed aggregations; the label
    * marginal join keys on (pair, label). Output per pair:
    * (rater_a, rater_b, n_common, n_agree, po_micro, pe_micro,
    * kappa_micro). */
  def cohenKappaPairs(ratings: DataFrame, itemCol: String,
                      raterCol: String, labelCol: String,
                      minCommon: Long = 2L): DataFrame = {
    val r = ratings.select(col(itemCol).as("item"),
      col(raterCol).cast("string").as("rater"),
      col(labelCol).cast("string").as("lab"))
    val pairs = r.as("a").join(r.as("b"), col("a.item") === col("b.item"))
      .filter(col("a.rater") < col("b.rater"))
      .select(col("a.rater").as("ra"), col("b.rater").as("rb"),
        col("a.lab").as("la"), col("b.lab").as("lb"))
    val po = pairs.groupBy(col("ra"), col("rb"))
      .agg(count(lit(1)).as("n_common"),
        sum(when(col("la") === col("lb"), 1L).otherwise(0L))
          .as("n_agree"))
      .filter(col("n_common") >= minCommon)
    val ma = pairs.groupBy(col("ra"), col("rb"), col("la").as("lab"))
      .agg(count(lit(1)).as("ca"))
    val mb = pairs.groupBy(col("ra"), col("rb"), col("lb").as("lab"))
      .agg(count(lit(1)).as("cb"))
    val pe = ma.join(mb, Seq("ra", "rb", "lab"), "full_outer")
      .groupBy(col("ra"), col("rb"))
      .agg(coalesce(sum(
        expr("coalesce(ca, 0L) * coalesce(cb, 0L)")), lit(0L))
        .as("_cross"))
    po.join(pe, Seq("ra", "rb"))
      .withColumn("po_micro", expr("n_agree * 1000000L div n_common"))
      // Σ_l (ca_l/n)(cb_l/n) in micro = Σ ca·cb · 10⁶ div n² — ONE
      // division, so no per-label truncation stacks up
      .withColumn("pe_micro",
        expr("_cross * 1000000L div (n_common * n_common)"))
      .withColumn("kappa_micro", expr(
        "CASE WHEN po_micro >= pe_micro THEN (po_micro - pe_micro) " +
          "* 1000000L div greatest(1000000L - pe_micro, 1L) " +
          "ELSE -((pe_micro - po_micro) * 1000000L " +
          "div greatest(1000000L - pe_micro, 1L)) END"))
      .select(col("ra").as("rater_a"), col("rb").as("rater_b"),
        col("n_common"), col("n_agree"), col("po_micro"),
        col("pe_micro"), col("kappa_micro"))
  }

  /** Fleiss' kappa (Fleiss 1971) — inter-annotator agreement for a
    * labeling pipeline's QA gate: how much the raters agree beyond
    * chance, over items each rated by 2+ raters (the variable-n
    * generalization; items with a single rating carry no agreement
    * signal and are excluded — from the marginals too). All integer
    * micro units with a sign-split final division (kappa is negative
    * when observed agreement falls below chance), so the fit replays
    * engine-exact:
    *
    *   P_i  = (Σ_j n_ij² − n_i) · 10⁶ div (n_i·(n_i−1))
    *   P̄   = Σ P_i div I          p_j = (Σ_i n_ij) · 10⁶ div N
    *   P̄_e = Σ p_j² div 10⁶       κ = (P̄ − P̄_e) · 10⁶ div (10⁶ − P̄_e)
    *
    * Scale shape: one (item, label)-keyed aggregation over the ratings
    * stream down to the n_ij table (persisted — it feeds the per-item
    * pass, the label marginals, and two bounded 1-row driver reads,
    * the [[graft.operators.Sampling.dsirWeightsFull]] precedent), then
    * label-count-sized arithmetic. Per-item rating counts must stay
    * ≤ ~3·10⁹ (n_ij² in a long) — raters per item, far below at any
    * real annotation scale. Output: ONE row
    * (n_items, n_ratings, pbar_micro, pe_micro, kappa_micro). */
  def fleissKappa(ratings: DataFrame, itemCol: String,
                  labelCol: String): DataFrame = {
    val spark = ratings.sparkSession
    import spark.implicits._
    val nij = ratings
      .groupBy(col(itemCol).as("item"), col(labelCol).as("label"))
      .agg(count(lit(1)).as("nij"))
      .persist()
    try {
      val items = nij.groupBy(col("item"))
        .agg(sum(col("nij")).as("ni"),
          sum(col("nij") * col("nij")).as("sq"))
        .filter(col("ni") >= 2)
        .withColumn("agree_micro",
          expr("(sq - ni) * 1000000L div (ni * (ni - 1L))"))
      val tot = items.agg(count(lit(1)), coalesce(sum("ni"), lit(0L)),
        coalesce(sum("agree_micro"), lit(0L))).head
      val (nItems, nRatings, agreeSum) =
        (tot.getLong(0), tot.getLong(1), tot.getLong(2))
      if (nItems == 0) {
        return Seq.empty[(Long, Long, Long, Long, Long)].toDF(
          "n_items", "n_ratings", "pbar_micro", "pe_micro", "kappa_micro")
      }
      val peRow = nij.join(items.select(col("item")), Seq("item"))
        .groupBy(col("label")).agg(sum(col("nij")).as("lt"))
        .withColumn("pj", expr(s"lt * 1000000L div ${nRatings}L"))
        .agg(coalesce(expr("sum(pj * pj) div 1000000L"), lit(0L))).head
      val pe = peRow.getLong(0)
      val pbar = agreeSum / nItems
      val den = math.max(1000000L - pe, 1L)
      val kappa =
        if (pbar >= pe) (pbar - pe) * 1000000L / den
        else -((pe - pbar) * 1000000L / den)
      Seq((nItems, nRatings, pbar, pe, kappa)).toDF(
        "n_items", "n_ratings", "pbar_micro", "pe_micro", "kappa_micro")
    } finally nij.unpersist(false)
  }

  /** Exact tie-corrected ROC AUC (the Mann–Whitney U form): the
    * probability a random positive outscores a random negative, ties
    * counting half — the quality-classifier acceptance number before a
    * corpus-wide filter threshold is chosen. One row out:
    * (n_pos, n_neg, win_pairs, tie_pairs, auc_micro) with
    * auc_micro = (2·wins + ties)·10⁶ div (2·n_pos·n_neg), every step a
    * floor on both engines; null when either class is empty.
    *
    * Scale shape: ONE hash aggregation to the distinct-score frame
    * (pos/neg counts per score), then a single unpartitioned
    * cumulative window over DISTINCT scores — bounded by score
    * cardinality, not rows. A continuous score at 100 TB should be
    * bucketed to fixed precision first (the caller rounds; AUC over
    * rounded scores is the tie-corrected AUC of the rounding). Integer
    * bound: 2·n_pos·n_neg and wins·10⁶ must fit int64 — n_pos·n_neg ≤
    * ~4.6·10¹² rows-squared, far above any labeled eval set. */
  def rocAuc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame =
    rocAucFromCounts(df
      .select(col(scoreCol).as("s"),
        when(col(labelCol).cast("boolean"), 1L).otherwise(0L).as("p"))
      .groupBy(col("s"))
      .agg(sum(col("p")).as("np"), sum(lit(1L) - col("p")).as("ng")))

  /** [[rocAuc]] over PRE-AGGREGATED per-score (s, np, ng) counts — the
    * incremental entry point (the [[NgramLm.trainFromCounts]] /
    * [[bradleyTerryFromCounts]] pattern): per-score pos/neg counts are
    * ADDITIVE across corpus slices, so an eval stream keeps per-batch
    * count deltas, unions them, and refits the exact AUC here without
    * rescoring old batches. Unaggregated delta rows are fine — they
    * re-sum per score first. */
  def rocAucFromCounts(counts: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perScore = counts.groupBy(col("s"))
      .agg(sum(col("np")).as("np"), sum(col("ng")).as("ng"))
    val w = Window.orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    perScore
      .withColumn("neg_below", coalesce(sum(col("ng")).over(w), lit(0L)))
      .agg(sum(col("np")).as("n_pos"), sum(col("ng")).as("n_neg"),
        sum(col("np") * col("neg_below")).as("win_pairs"),
        sum(col("np") * col("ng")).as("tie_pairs"))
      .withColumn("auc_micro",
        expr("CASE WHEN n_pos > 0 AND n_neg > 0 THEN " +
          "(2L * win_pairs + tie_pairs) * 1000000L div " +
          "(2L * n_pos * n_neg) END"))
  }

  /** Exact average precision (the PR-curve area as eval harnesses
    * actually compute it): rank all rows by (score desc, id asc), and
    * AP = mean over positives of precision-at-their-rank. Integer
    * form: ap_micro = (Σ_{k rel} tp_k·10⁶ div k) div n_pos — floor at
    * both steps, so the number replays engine-for-engine. One row out:
    * (n, n_pos, ap_micro); null AP when there are no positives.
    *
    * Scale shape: one global sort (a single window) — average
    * precision is inherently a total-order statistic. At 100 TB the
    * caller evaluates per query/segment (partitioned windows) or on
    * the top-N candidate pool, never the raw corpus. */
  def averagePrecision(df: DataFrame, idCol: String, scoreCol: String,
                       labelCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ord = Window.orderBy(col("s").desc, col("id"))
    df.select(col(idCol).as("id"), col(scoreCol).as("s"),
        when(col(labelCol).cast("boolean"), 1L).otherwise(0L).as("p"))
      .withColumn("k", row_number().over(ord).cast("long"))
      .withColumn("tp", sum(col("p")).over(
        Window.orderBy(col("s").desc, col("id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .agg(count(lit(1)).as("n"), sum(col("p")).as("n_pos"),
        sum(when(col("p") === 1L, expr("tp * 1000000L div k"))
          .otherwise(0L)).as("_prec_sum"))
      .withColumn("ap_micro",
        expr("CASE WHEN n_pos > 0 THEN _prec_sum div n_pos END"))
      .select(col("n"), col("n_pos"), col("ap_micro"))
  }

  /** Multiclass confusion statistics: per class — tp, fp, fn and
    * exact-integer precision/recall/F1 micros (f1 via the algebraic
    * form 2·tp·10⁶ div (2·tp + fp + fn), one floor). Classes are the
    * union of actual and predicted labels, so a class the model never
    * predicts (or invents) still gets its row. Precision is null for
    * a never-predicted class, recall null for a never-true one.
    *
    * Scale shape: one hash aggregation per side keyed by class (the
    * (actual, predicted) frame aggregates to |classes|² first — tiny),
    * then arithmetic. No window, no collect. */
  def confusion(df: DataFrame, actualCol: String,
                predCol: String): DataFrame = {
    val cells = df.select(col(actualCol).as("a"), col(predCol).as("g"))
      .groupBy(col("a"), col("g")).agg(count(lit(1)).as("n"))
    val tp = cells.filter(col("a") === col("g"))
      .select(col("a").as("label"), col("n").as("tp"))
    val act = cells.groupBy(col("a").as("label"))
      .agg(sum(col("n")).as("n_actual"))
    val prd = cells.groupBy(col("g").as("label"))
      .agg(sum(col("n")).as("n_pred"))
    act.join(prd, Seq("label"), "full")
      .join(tp, Seq("label"), "left")
      .select(col("label"),
        coalesce(col("n_actual"), lit(0L)).as("n_actual"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"),
        coalesce(col("tp"), lit(0L)).as("tp"))
      .withColumn("fp", col("n_pred") - col("tp"))
      .withColumn("fn", col("n_actual") - col("tp"))
      .withColumn("precision_micro",
        expr("CASE WHEN n_pred > 0 THEN tp * 1000000L div n_pred END"))
      .withColumn("recall_micro",
        expr("CASE WHEN n_actual > 0 THEN tp * 1000000L div n_actual END"))
      .withColumn("f1_micro",
        expr("CASE WHEN 2L * tp + fp + fn > 0 THEN " +
          "2L * tp * 1000000L div (2L * tp + fp + fn) END"))
  }

  /** Matthews correlation coefficient for a binary classifier — the
    * single-number confusion summary that stays honest under class
    * imbalance (unlike accuracy or F1): MCC = (tp·tn − fp·fn) /
    * √((tp+fp)(tp+fn)) · √((tn+fp)(tn+fn)), in exact integer micros.
    * The radicand is SPLIT into two ≤n² factors so each floor(sqrt)
    * stays exact (< 2⁵² while n ≤ ~6·10⁷ scored rows — sample or
    * shard beyond that; the product of all four counts would blow the
    * bound at n ~ 10⁴). One row out:
    * (tp, tn, fp, fn, mcc_micro); NULL when a margin is empty (MCC
    * undefined).
    *
    * Scale shape: one scan-shaped 4-way conditional count — no
    * window, no join. */
  def mcc(df: DataFrame, actualCol: String,
          predCol: String): DataFrame = {
    df.select(col(actualCol).cast("boolean").as("a"),
        col(predCol).cast("boolean").as("p"))
      .agg(
        sum(when(col("a") && col("p"), 1L).otherwise(0L)).as("tp"),
        sum(when(!col("a") && !col("p"), 1L).otherwise(0L)).as("tn"),
        sum(when(!col("a") && col("p"), 1L).otherwise(0L)).as("fp"),
        sum(when(col("a") && !col("p"), 1L).otherwise(0L)).as("fn"))
      .withColumn("_num", expr(
        "CAST(tp AS DECIMAL(38,0)) * tn " +
          "- CAST(fp AS DECIMAL(38,0)) * fn"))
      .withColumn("_d1", expr(
        "CAST(CAST(tp + fp AS DECIMAL(38,0)) * (tp + fn) AS LONG)"))
      .withColumn("_d2", expr(
        "CAST(CAST(tn + fp AS DECIMAL(38,0)) * (tn + fn) AS LONG)"))
      .withColumn("_den",
        floor(sqrt(col("_d1"))).cast("long") *
          floor(sqrt(col("_d2"))).cast("long"))
      .withColumn("mcc_micro", expr(
        "CASE WHEN _den > 0 THEN CASE WHEN _num >= 0 " +
          "THEN CAST(_num * 1000000 div _den AS LONG) " +
          "ELSE -CAST((-_num) * 1000000 div _den AS LONG) END END"))
      .select(col("tp"), col("tn"), col("fp"), col("fn"),
        col("mcc_micro"))
  }

  /** McNemar's paired test on two systems scored over the SAME items —
    * the question "is B actually better than A, or do they just err on
    * different rows?" answered from the discordant pairs alone. One
    * row out: (n, both_right, both_wrong, a_only, b_only, chi2_micro)
    * with the continuity-corrected statistic
    * (|a_only − b_only| − 1)²·10⁶ div (a_only + b_only) — integer
    * floor, null when there are no discordant pairs. (The paired
    * bootstrap gate answers the same question by resampling; McNemar
    * is its closed-form cross-check.)
    *
    * Scale shape: one map-side conditional aggregation — a single scan,
    * no shuffle beyond the final 1-row reduce. */
  def mcnemarPaired(df: DataFrame, aCorrectCol: String,
                    bCorrectCol: String): DataFrame = {
    df.select(col(aCorrectCol).cast("boolean").as("a"),
        col(bCorrectCol).cast("boolean").as("b"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("a") && col("b"), 1L).otherwise(0L))
          .as("both_right"),
        sum(when(!col("a") && !col("b"), 1L).otherwise(0L))
          .as("both_wrong"),
        sum(when(col("a") && !col("b"), 1L).otherwise(0L)).as("a_only"),
        sum(when(!col("a") && col("b"), 1L).otherwise(0L)).as("b_only"))
      .withColumn("chi2_micro",
        expr("CASE WHEN a_only + b_only > 0 THEN " +
          "(abs(a_only - b_only) - 1L) * (abs(a_only - b_only) - 1L) " +
          "* 1000000L div (a_only + b_only) END"))
  }

  /** pass@k (Chen et al. 2021, Codex): per task with n samples of
    * which c passed, the unbiased estimator
    * 1 − C(n−c, k)/C(n, k) = 1 − Π_{i=0}^{k−1} (n−c−i)/(n−i),
    * computed as ONE integer division of the two unrolled products —
    * exact, engine-replayable. Tasks with n < k are excluded (the
    * estimator is undefined); n − c < k short-circuits to 10⁶.
    * Output per task: (task, n, c, pass_micro).
    *
    * Scale shape: one hash aggregation per task, then per-row
    * arithmetic. Integer bound: Π(n−i)·10⁶ must fit int64 — n^k ≤
    * ~9·10¹², e.g. n ≤ 250 samples at k = 5 (real pass@k runs use
    * n ≤ 200); k ≤ 8 enforced. */
  def passAtK(df: DataFrame, taskCol: String, okCol: String,
              k: Int): DataFrame = {
    require(k >= 1 && k <= 8, "k must be in [1, 8]")
    val num = (0 until k).map(i => s"(n - c - ${i}L)").mkString(" * ")
    val den = (0 until k).map(i => s"(n - ${i}L)").mkString(" * ")
    df.select(col(taskCol).as("task"),
        when(col(okCol).cast("boolean"), 1L).otherwise(0L).as("ok"))
      .groupBy(col("task"))
      .agg(count(lit(1)).as("n"), sum(col("ok")).as("c"))
      .filter(col("n") >= k.toLong)
      .withColumn("pass_micro",
        expr(s"CASE WHEN n - c < ${k}L THEN 1000000L " +
          s"ELSE 1000000L - ($num) * 1000000L div ($den) END"))
  }

  /** Krippendorff's alpha, nominal data, complete panels: reliability
    * of a labeling crew beyond chance, the generalization of the two
    * kappas already in this file (it handles any number of raters and
    * derives chance from the label MARGINS, not per-rater ones).
    * Restricted to items rated by exactly `m` raters so every term is
    * integer-exact: observed disagreement per item is Σ_c n_ic(m−n_ic)
    * over m(m−1) ordered pairs; expected disagreement comes from the
    * pooled totals t_c over T = n_items·m ratings. alpha_micro =
    * 10⁶ − do_micro·10⁶ div de_micro with do/de each a single integer
    * floor — deterministic on both engines. One row out:
    * (n_items, m, n_categories, do_micro, de_micro, alpha_micro);
    * alpha is null when expected disagreement is zero (a single
    * category in the pool).
    *
    * Scale shape: one (item, label) hash aggregation, a 1-row reduce
    * per side, a label-keyed reduce for the margins. No window, no
    * collect, no per-item division (the complete-panel restriction is
    * what keeps (m_i − 1) constant and the arithmetic integral). */
  def krippendorffAlpha(ratings: DataFrame, itemCol: String,
                        raterCol: String, labelCol: String,
                        m: Int): DataFrame = {
    require(m >= 2, "m (panel size) must be >= 2")
    val spark = ratings.sparkSession
    import spark.implicits._
    val nic = ratings
      .select(col(itemCol).as("item"), col(raterCol).as("rater"),
        col(labelCol).as("label"))
      .groupBy(col("item"), col("label"))
      .agg(countDistinct(col("rater")).as("nic"))
    val keep = nic.groupBy(col("item"))
      .agg(sum(col("nic")).as("mi")).filter(col("mi") === m.toLong)
      .select(col("item"))
    val kept = nic.join(keep, Seq("item")).persist()
    try {
      val doRow = kept.agg(
        countDistinct(col("item")).as("n_items"),
        coalesce(sum(col("nic") * (lit(m.toLong) - col("nic"))), lit(0L))
          .as("do_num")).head
      val (nItems, doNum) = (doRow.getLong(0), doRow.getLong(1))
      if (nItems == 0)
        return Seq.empty[(Long, Long, Long, Long, Long, Long)].toDF(
          "n_items", "m", "n_categories", "do_micro", "de_micro",
          "alpha_micro")
      val t = nItems * m.toLong // total ratings T
      val deRow = kept.groupBy(col("label"))
        .agg(sum(col("nic")).as("tc"))
        .agg(count(lit(1)),
          coalesce(sum(expr(s"tc * (${t}L - tc)")), lit(0L))).head
      val (nCat, deNum) = (deRow.getLong(0), deRow.getLong(1))
      val doMicro = doNum * 1000000L / (nItems * m.toLong * (m - 1L))
      val deMicro = deNum * 1000000L / (t * (t - 1L))
      val alphaCol =
        if (deMicro == 0L) lit(null).cast("long")
        else lit(1000000L - doMicro * 1000000L / deMicro)
      Seq((nItems, m.toLong, nCat, doMicro, deMicro)).toDF(
          "n_items", "m", "n_categories", "do_micro", "de_micro")
        .withColumn("alpha_micro", alphaCol)
    } finally kept.unpersist(false)
  }

  /** Isotonic calibration of a binary outcome against an ordered
    * score bucket — pool-adjacent-violators (Ayer et al. 1955; the
    * calibration method behind sklearn's `isotonic`): the calibrated
    * positive rate per bucket is the best monotone non-decreasing fit
    * in L2, which PAV computes by merging adjacent violating blocks.
    * The fitted value for bucket i equals the closed-form minimax
    * max_{j<=i} min_{k>=i} avg(j..k) — the oracle replays THAT form in
    * SQL (a triple join over the bounded bucket table), while this
    * side runs the exact-rational PAV stack (block comparisons via
    * cross-multiplied BigInts, no float ever); both floor the block
    * rate to micros at the very end, and floor commutes with max/min,
    * so the two roads land on the same integer. Output per bucket:
    * (bucket, n, n_pos, iso_micro).
    *
    * Scale shape: the corpus pays ONE hash aggregation down to the
    * bucket table (bounded by `maxBuckets` — scores must be bucketed,
    * never raw); the collect is limit-bounded BEFORE it happens and
    * the PAV stack is O(buckets) on the driver. */
  /** Expected calibration error (Naeini 2015) of a classifier whose
    * score is an integer micro-probability in [0, 10⁶] — THE
    * one-number calibration summary next to [[isotonicCalibration]]'s
    * per-bucket repair and [[graft.operators.Stats.brierScore]]'s
    * squared loss: equal-width confidence bins, per bin the gap
    * |mean score − accuracy|, weighted by bin mass.
    * ece_micro = Σ_k n_k·|conf_k − acc_k| div n, every mean floored
    * to micros. score = 10⁶ folds into the top bin (the standard
    * closed-right edge). One row:
    * (n, n_bins_used, ece_micro, max_gap_micro, max_gap_bin).
    *
    * Scale shape: one scan-shaped aggregation to ≤ nBins rows, then
    * a 1-row fold — no window over raw rows, no join. */
  def expectedCalibrationError(df: DataFrame, scoreMicroCol: String,
                               labelCol: String,
                               nBins: Int = 10): DataFrame = {
    val bins = calibrationBins(df, scoreMicroCol, labelCol, nBins)
      .withColumn("gap_micro", abs(col("conf_micro") - col("acc_micro")))
    bins.agg(
        sum(col("nk")).as("n"),
        count(lit(1)).as("n_bins_used"),
        sum(col("nk").cast("decimal(38,0)") * col("gap_micro"))
          .as("_w"),
        max(struct(col("gap_micro"), (-col("bin")).as("_nb")))
          .as("_mx"))
      .withColumn("ece_micro",
        expr("CASE WHEN n > 0 THEN CAST(_w div n AS LONG) END"))
      .select(col("n"), col("n_bins_used"), col("ece_micro"),
        col("_mx.gap_micro").as("max_gap_micro"),
        (-col("_mx._nb")).as("max_gap_bin"))
  }

  /** The shared equal-width confidence-bin frame:
    * (bin, nk, _sy, conf_micro, acc_micro) with floored micro means;
    * score = 10⁶ folds into the top bin. */
  private def calibrationBins(df: DataFrame, scoreMicroCol: String,
                              labelCol: String, nBins: Int): DataFrame = {
    require(nBins >= 1 && nBins <= 1000, "nBins must be in [1, 1000]")
    df.select(col(scoreMicroCol).cast("long").as("s"),
        when(col(labelCol).cast("boolean"), 1L).otherwise(0L).as("y"))
      .filter(col("s").isNotNull)
      .withColumn("bin",
        least(expr(s"s * $nBins div 1000000"), lit(nBins - 1L)))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("nk"), sum(col("s")).as("_ss"),
        sum(col("y")).as("_sy"))
      .withColumn("conf_micro", expr("_ss div nk"))
      .withColumn("acc_micro", expr("_sy * 1000000L div nk"))
  }

  /** Murphy (1973) Brier decomposition over the same bins as
    * [[expectedCalibrationError]]: reliability (how far each bin's
    * confidence sits from its accuracy — the penalty), resolution
    * (how far bin accuracies spread from the base rate — the skill),
    * uncertainty (the base rate's own variance — the floor). All in
    * floored micros: rel = Σnₖ(conf−acc)² div (n·10⁶),
    * res = Σnₖ(acc−ō)² div (n·10⁶), unc = ō(10⁶−ō) div 10⁶ — the
    * exact identity brier = rel − res + unc holds pre-flooring; the
    * floored terms are each exact, DECLARED semantics. One row:
    * (n, obar_micro, reliability_micro, resolution_micro,
    * uncertainty_micro).
    *
    * Scale shape: one scan-shaped bin aggregation, windows only over
    * the ≤ nBins bin frame, then a 1-row fold. */
  def brierDecomposition(df: DataFrame, scoreMicroCol: String,
                         labelCol: String, nBins: Int = 10): DataFrame = {
    val bins = calibrationBins(df, scoreMicroCol, labelCol, nBins)
      .withColumn("_n", expr("sum(nk) over ()"))
      .withColumn("_obar", expr(
        "sum(_sy) over () * 1000000L div sum(nk) over ()"))
    bins.agg(
        first(col("_n")).as("n"),
        first(col("_obar")).as("obar_micro"),
        sum(col("nk").cast("decimal(38,0)") *
          (col("conf_micro") - col("acc_micro")) *
          (col("conf_micro") - col("acc_micro"))).as("_rel"),
        sum(col("nk").cast("decimal(38,0)") *
          (col("acc_micro") - col("_obar")) *
          (col("acc_micro") - col("_obar"))).as("_res"))
      .withColumn("reliability_micro", expr(
        "CASE WHEN n > 0 THEN " +
          "CAST(_rel div (CAST(n AS DECIMAL(38,0)) * 1000000) " +
          "AS LONG) END"))
      .withColumn("resolution_micro", expr(
        "CASE WHEN n > 0 THEN " +
          "CAST(_res div (CAST(n AS DECIMAL(38,0)) * 1000000) " +
          "AS LONG) END"))
      .withColumn("uncertainty_micro", expr(
        "obar_micro * (1000000L - obar_micro) div 1000000L"))
      .select(col("n"), col("obar_micro"), col("reliability_micro"),
        col("resolution_micro"), col("uncertainty_micro"))
  }

  def isotonicCalibration(df: DataFrame, bucketCol: String,
                          labelCol: String,
                          maxBuckets: Int = 10000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val buckets = df
      .select(col(bucketCol).cast("long").as("b"),
        when(col(labelCol).cast("boolean"), 1L).otherwise(0L).as("p"))
      .filter(col("b").isNotNull)
      .groupBy(col("b"))
      .agg(count(lit(1)).as("n"), sum(col("p")).as("pos"))
      .limit(maxBuckets + 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    require(buckets.length <= maxBuckets,
      s"distinct buckets exceed $maxBuckets — bucket the score first")
    // PAV: blocks of (pos, n, members); merge while the previous
    // block's rate exceeds the new one's (exact rational compare)
    case class Block(pos: BigInt, n: BigInt,
                     members: List[(Long, Long, Long)])
    var stack = List.empty[Block]
    buckets.foreach { case (b, n, pos) =>
      var cur = Block(BigInt(pos), BigInt(n), List((b, n, pos)))
      while (stack.nonEmpty &&
        stack.head.pos * cur.n > cur.pos * stack.head.n) {
        val prev = stack.head
        stack = stack.tail
        cur = Block(prev.pos + cur.pos, prev.n + cur.n,
          prev.members ++ cur.members)
      }
      stack = cur :: stack
    }
    val rows = stack.reverse.flatMap { blk =>
      val iso = (blk.pos * 1000000 / blk.n).toLong
      blk.members.map { case (b, n, pos) => (b, n, pos, iso) }
    }
    rows.toDF("bucket", "n", "n_pos", "iso_micro")
  }

  /** Split-conformal coverage audit (Vovk et al. 2005; the
    * distribution-free prediction-interval recipe): given a
    * calibration/test split flag, a per-group point model (the group
    * mean in floored micros — the simplest honest regressor), and the
    * absolute residual as the nonconformity score, the threshold is
    * the ⌈(n_cal+1)·(1−α)⌉-th smallest calibration nonconformity and
    * the audit reports the test-set share covered by it — which the
    * conformal guarantee says must be ≥ 1−α on exchangeable data.
    * All integer: means floored to micros (sign-split), the order
    * statistic exact via a cumulative count over DISTINCT
    * nonconformity values, coverage in micros. When the calibration
    * set is too small (k > n_cal) the threshold is +∞: q_hat is NULL
    * and every test row counts covered — reported, not hidden. One
    * row out: (n_cal, n_test, k, q_hat, n_covered, coverage_micro).
    *
    * Scale shape: one hash aggregation to group cardinality for the
    * means, a broadcast-friendly equi-join back, one aggregation to
    * distinct nonconformity values with a single cumulative window
    * over THEM (distinct-residual cardinality, not rows — bucket the
    * feature first if it is continuous). */
  def conformalCoverage(df: DataFrame, groupCol: String, xCol: String,
                        calCol: String,
                        alphaMicro: Long = 100000L): DataFrame = {
    require(alphaMicro > 0 && alphaMicro < 1000000L,
      "alphaMicro must be in (0, 1e6)")
    val rows = df.select(col(groupCol).as("g"),
      col(xCol).cast("long").as("x"),
      col(calCol).cast("boolean").as("is_cal"))
      .filter(col("x").isNotNull && col("g").isNotNull)
    val means = rows.filter(col("is_cal"))
      .groupBy(col("g"))
      .agg(sum(col("x")).as("_sx"), count(lit(1)).as("_nx"))
      .withColumn("mean_micro", expr(
        "CASE WHEN _sx >= 0 THEN _sx * 1000000L div _nx " +
          "ELSE -((-_sx) * 1000000L div _nx) END"))
      .select(col("g"), col("mean_micro"))
    // test rows whose group never appeared in calibration have no
    // model: inner join drops them, and n_test counts what remains —
    // the audit is over scoreable rows only (count reported)
    val scored = rows.join(means, Seq("g"))
      .withColumn("r", abs(col("x") * 1000000L - col("mean_micro")))
    val calScored = scored.filter(col("is_cal"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("r"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, org.apache.spark.sql.expressions.Window
        .currentRow)
    val kExpr = expr(
      s"((_ncal + 1) * (1000000 - $alphaMicro) + 999999) div 1000000")
    val qhat = calScored.groupBy(col("r")).agg(count(lit(1)).as("c"))
      .withColumn("_cum", sum(col("c")).over(w))
      .withColumn("_ncal", expr("sum(c) over ()"))
      .withColumn("k", kExpr)
      .filter(col("_cum") >= col("k"))
      .agg(min(col("r")).as("q_hat"))
    // k > n_cal leaves the filter empty: re-derive (n_cal, k) from the
    // scored frame so the one-row report survives with a NULL q_hat
    val counts = scored.agg(
      sum(when(col("is_cal"), 1L).otherwise(0L)).as("n_cal"),
      sum(when(col("is_cal"), 0L).otherwise(1L)).as("n_test"))
      .withColumn("k", expr("((n_cal + 1) * (1000000 - " +
        s"$alphaMicro) + 999999) div 1000000"))
    val covered = scored.filter(!col("is_cal"))
      .crossJoin(qhat.select(col("q_hat")))
      .agg(sum(when(col("r") <= coalesce(col("q_hat"),
        lit(Long.MaxValue)), 1L).otherwise(0L)).as("n_covered"))
    counts.crossJoin(qhat.select(col("q_hat")))
      .crossJoin(covered)
      .withColumn("coverage_micro", expr(
        "CASE WHEN n_test > 0 THEN n_covered * 1000000L div n_test END"))
      .select(col("n_cal"), col("n_test"), col("k"), col("q_hat"),
        col("n_covered"), col("coverage_micro"))
  }
}

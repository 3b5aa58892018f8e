package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Classical statistics over warehouse columns, formulated for
  * engine-exact replay: association tests between categoricals
  * (chi-square cells, mutual information), distribution separation for
  * classifier scores (Kolmogorov–Smirnov, decile gains/lift, Brier),
  * and category entropy. The reference's reporting layer runs this
  * class of question over ClickHouse (`webapps/ee-api` report
  * endpoints aggregate event breakdowns per type/status); here they
  * are the audit battery a training pipeline points at its own
  * metadata columns.
  *
  * Determinism rules (shared with [[DataChecks.psi]] /
  * [[Collocations.pmiBigrams]]): counts and shares are exact integer
  * micros; where a transcendental is irreducible (ln in entropy/MI)
  * it is applied ONCE per output row to integer-derived ratios and
  * rounded — never summed across rows in floating point, so no
  * engine-specific addition order can flip a hash.
  *
  * Scale shape: every operator here is one or two hash aggregations
  * down to category/cell/score cardinality, then arithmetic on that
  * small frame. The only windows run over DISTINCT scores or the
  * margin cross-product — never over raw rows. */
object Stats {

  /** Chi-square independence cells for two categorical columns: the
    * full margin cross-product (zero-observed cells included — they
    * still carry expectation), with per-cell expected counts and the
    * cell's chi-square contribution in exact integer MILLI units:
    *   dev_milli  = (O·N − rt·ct)·1000 div N     ((O−E)·10³)
    *   e_milli    = rt·ct·1000 div N              (E·10³)
    *   term_milli = dev_milli² div e_milli        (cell χ²·10³)
    * Milli (not micro) keeps dev_milli² inside int64 up to N ≈ 10⁸
    * rows per table slice. The caller sums term_milli for the
    * statistic (an integer sum — safe to total across rows, unlike
    * floats). Output: (a, b, n_obs, rt, ct, e_milli, dev_milli,
    * term_milli). */
  def chiSquareCells(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.select(col(aCol).as("a"), col(bCol).as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n"))
    val ra = cells.groupBy(col("a")).agg(sum(col("n")).as("rt"))
    val cb = cells.groupBy(col("b")).agg(sum(col("n")).as("ct"))
    ra.crossJoin(cb)
      .join(cells, Seq("a", "b"), "left")
      .withColumn("n_obs", coalesce(col("n"), lit(0L)))
      .withColumn("_n", expr("sum(n_obs) over ()"))
      .withColumn("dev_milli",
        expr("(n_obs * _n - rt * ct) * 1000L div _n"))
      .withColumn("e_milli", expr("rt * ct * 1000L div _n"))
      .withColumn("term_milli",
        expr("CASE WHEN e_milli > 0 THEN " +
          "dev_milli * dev_milli div e_milli END"))
      .select(col("a"), col("b"), col("n_obs"), col("rt"), col("ct"),
        col("e_milli"), col("dev_milli"), col("term_milli"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic for a score split by a
    * binary label: max over the score axis of |CDF⁺ − CDF⁻| in exact
    * integer micros, plus the score where the max is reached (smallest
    * such score — deterministic tiebreak). The threshold-picking
    * companion to [[EvalMetrics.rocAuc]]: KS is the best achievable
    * (recall − fallout) of any single cut. One row out:
    * (n_pos, n_neg, ks_micro, ks_at_score); null when a class is
    * empty.
    *
    * Scale shape: one aggregation to distinct scores, one cumulative
    * window over them (score cardinality, not rows — bucket
    * continuous scores first, as with rocAuc). */
  def ksStatistic(df: DataFrame, scoreCol: String,
                  labelCol: String): DataFrame =
    ksFromCounts(df
      .select(col(scoreCol).as("s"),
        when(col(labelCol).cast("boolean"), 1L).otherwise(0L).as("p"))
      .groupBy(col("s"))
      .agg(sum(col("p")).as("np"), sum(lit(1L) - col("p")).as("ng")))

  /** [[ksStatistic]] over PRE-AGGREGATED per-score (s, np, ng) counts
    * — the incremental entry point, sharing
    * [[EvalMetrics.rocAucFromCounts]]'s delta-merge contract (per-score
    * counts are additive across slices; unaggregated delta rows
    * re-sum here). */
  def ksFromCounts(counts: DataFrame): DataFrame = {
    val perScore = counts.groupBy(col("s"))
      .agg(sum(col("np")).as("np"), sum(col("ng")).as("ng"))
    val w = Window.orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gaps = perScore
      .withColumn("cum_p", sum(col("np")).over(w))
      .withColumn("cum_g", sum(col("ng")).over(w))
      .withColumn("_tp", expr("sum(np) over ()"))
      .withColumn("_tg", expr("sum(ng) over ()"))
      .withColumn("gap_micro",
        expr("CASE WHEN _tp > 0 AND _tg > 0 THEN " +
          "abs(cum_p * 1000000L div _tp - cum_g * 1000000L div _tg) " +
          "END"))
    val top = gaps.agg(first(col("_tp")).as("n_pos"),
      first(col("_tg")).as("n_neg"),
      max(col("gap_micro")).as("ks_micro"))
    // smallest score achieving the max: a second pass over the tiny
    // distinct-score frame (left join keeps the one-row output when a
    // class is empty and ks is null)
    top.join(gaps.select(col("gap_micro").as("_g"), col("s")),
        col("_g") === col("ks_micro"), "left")
      .groupBy(col("n_pos"), col("n_neg"), col("ks_micro"))
      .agg(min(col("s")).as("ks_at_score"))
  }

  /** Decile gains/lift table for a classifier score over a binary
    * outcome — the campaign-targeting report ("the top 10% of scores
    * captures X% of the positives at Y× lift"). Rows rank by (score
    * desc, id asc); bucket k of `buckets` holds ranks
    * (k·n div buckets, (k+1)·n div buckets] — the floor-split that
    * both engines replay. Per bucket: n, n_pos, cumulative capture of
    * all positives in micros, and lift (bucket positive rate over base
    * rate) in micros. All integer.
    *
    * Scale shape: one global sort window (rank is a total-order
    * statistic — at 100 TB run per segment or on score buckets), one
    * bucket aggregation, one cumulative window over `buckets` rows. */
  def gainsDeciles(df: DataFrame, idCol: String, scoreCol: String,
                   labelCol: String, buckets: Int = 10): DataFrame = {
    require(buckets >= 2 && buckets <= 1000, "buckets must be in [2,1000]")
    val ord = Window.orderBy(col("s").desc, col("id"))
    val ranked = df.select(col(idCol).as("id"), col(scoreCol).as("s"),
        when(col(labelCol).cast("boolean"), 1L).otherwise(0L).as("p"))
      .withColumn("r", row_number().over(ord).cast("long"))
      .withColumn("_n", expr("count(1) over ()"))
      // rank r in (k*n/buckets, (k+1)*n/buckets] -> bucket k: the
      // closed form is (r*buckets - 1) div n
      .withColumn("bucket", expr(s"(r * ${buckets}L - 1L) div _n"))
    ranked.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("p")).as("n_pos"))
      .withColumn("_tn", expr("sum(n) over ()"))
      .withColumn("_tp", expr("sum(n_pos) over ()"))
      .withColumn("cum_pos", sum(col("n_pos")).over(
        Window.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("capture_micro",
        expr("CASE WHEN _tp > 0 THEN cum_pos * 1000000L div _tp END"))
      .withColumn("lift_micro",
        expr("CASE WHEN _tp > 0 AND n > 0 THEN " +
          "(n_pos * _tn) * 1000000L div (n * _tp) END"))
      .select(col("bucket").cast("int").as("bucket"), col("n"),
        col("n_pos"), col("cum_pos"), col("capture_micro"),
        col("lift_micro"))
  }

  /** Cochran's Q test — [[EvalMetrics.mcnemarPaired]] generalized to
    * k systems scored over the SAME items: are the systems' success
    * rates distinguishable at all? Q = (k−1)·(k·ΣG_j² − T²) /
    * (k·ΣL_i − ΣL_i²) with G_j the per-system success totals, L_i the
    * per-item success counts, T = ΣG = ΣL — every term an integer, Q
    * reported in exact micros (one floor). One row out: (n_items, k,
    * sum_l, sum_l_sq, sum_g_sq, q_micro); null when every item has
    * all-or-nothing success (zero denominator). Q is χ²(k−1) under
    * the null — with k = 2 it reduces to McNemar without continuity
    * correction.
    *
    * Scale shape: ONE map-side conditional aggregation over the items
    * (the per-item L is row-local arithmetic) — a single scan. Integer
    * bound: k·ΣG²·10⁶ must fit int64 — n ≤ ~10⁶ items per slice at
    * k ≤ 8; segment a larger eval. */
  def cochranQ(df: DataFrame, correctCols: Seq[String]): DataFrame = {
    val k = correctCols.size
    require(k >= 2 && k <= 8, "cochranQ needs 2..8 system columns")
    val xs = correctCols.zipWithIndex.map { case (c, i) =>
      when(col(c).cast("boolean"), 1L).otherwise(0L).as(s"_x$i") }
    val rows = df.select(xs: _*)
      .withColumn("_l", (0 until k).map(i => col(s"_x$i")).reduce(_ + _))
    val aggs = (0 until k).map(i => sum(col(s"_x$i")).as(s"_g$i")) ++
      Seq(count(lit(1)).as("n_items"), sum(col("_l")).as("sum_l"),
        sum(expr("_l * _l")).as("sum_l_sq"))
    rows.agg(aggs.head, aggs.tail: _*)
      .withColumn("sum_g_sq",
        (0 until k).map(i => col(s"_g$i") * col(s"_g$i")).reduce(_ + _))
      .withColumn("q_micro",
        expr(s"CASE WHEN ${k}L * sum_l - sum_l_sq > 0 THEN " +
          s"${k - 1}L * (${k}L * sum_g_sq - sum_l * sum_l) * 1000000L " +
          s"div (${k}L * sum_l - sum_l_sq) END"))
      .select(col("n_items"), lit(k.toLong).as("k"), col("sum_l"),
        col("sum_l_sq"), col("sum_g_sq"), col("q_micro"))
  }

  /** Brier score of a probabilistic classifier whose score is ALREADY
    * an integer micro-probability in [0, 10⁶] (the
    * [[Experiment.calibration]] input shape): mean squared error in
    * micro units, brier_micro = Σ(score − y·10⁶)² div (n·10⁶) —
    * exact integer, 0 = perfect, 10⁶ = always certainly wrong. One
    * row: (n, brier_micro). Integer bound: the sum holds ≤ 9·10⁶
    * maximally-wrong rows per slice; score a 100 TB eval per segment.
    */
  def brierScore(df: DataFrame, scoreMicroCol: String,
                 labelCol: String): DataFrame = {
    df.select(col(scoreMicroCol).cast("long").as("sm"),
        when(col(labelCol).cast("boolean"), 1000000L).otherwise(0L)
          .as("ym"))
      .agg(count(lit(1)).as("n"),
        sum(expr("(sm - ym) * (sm - ym)")).as("_sq"))
      .withColumn("brier_micro",
        expr("CASE WHEN n > 0 THEN _sq div (n * 1000000L) END"))
      .select(col("n"), col("brier_micro"))
  }

  /** Spearman rank correlation between two columns, exact-integer: do
    * the two orderings agree? Both rankings are made TIE-FREE by the
    * (value, id) total order — the rho is then exactly
    * 1 − 6·Σd²/(n(n²−1)) with d the per-row rank difference, reported
    * in micros with one floor (sign-split, both engines agree). One
    * row out: (n, sum_d_sq, rho_micro); null below 2 rows.
    *
    * Scale shape: two global rank windows (total-order statistics — at
    * 100 TB rank per segment, or bucket values first), one map-side
    * reduce. Integer bound: 6·Σd²·10⁶ ≤ int64 needs n ≤ ~50 000 rows
    * per slice (Σd² < n³/3); segment a larger eval. */
  def spearman(df: DataFrame, idCol: String, xCol: String,
               yCol: String): DataFrame = {
    val wx = Window.orderBy(col("x"), col("id"))
    val wy = Window.orderBy(col("y"), col("id"))
    df.select(col(idCol).as("id"), col(xCol).as("x"), col(yCol).as("y"))
      .withColumn("rx", row_number().over(wx).cast("long"))
      .withColumn("ry", row_number().over(wy).cast("long"))
      .withColumn("d", col("rx") - col("ry"))
      .agg(count(lit(1)).as("n"), sum(expr("d * d")).as("sum_d_sq"))
      // the divided quantity is non-negative, so the floor has no
      // trunc-vs-floor hazard; the subtraction may go negative (rho<0)
      .withColumn("rho_micro",
        expr("CASE WHEN n >= 2 THEN 1000000L - " +
          "6L * sum_d_sq * 1000000L div (n * (n * n - 1L)) END"))
      .select(col("n"), col("sum_d_sq"), col("rho_micro"))
  }

  /** Per-category entropy terms of a categorical column: share in
    * exact integer micros and the Shannon term −p·ln(p) rounded 6 dp
    * (ONE ln per row over an integer-derived ratio — the psi_term
    * discipline; the caller sums h_term for total entropy in nats,
    * accepting the rounded-term semantics both engines share).
    * Output per category: (category, n, p_micro, h_term). */
  def categoricalEntropy(df: DataFrame, catCol: String): DataFrame = {
    df.select(col(catCol).cast("string").as("category"))
      .groupBy(col("category")).agg(count(lit(1)).as("n"))
      .withColumn("_t", expr("greatest(sum(n) over (), 1L)"))
      .withColumn("p_micro", expr("n * 1000000L div _t"))
      .withColumn("h_term", round(
        -(col("n").cast("double") / col("_t").cast("double")) *
          log(col("n").cast("double") / col("_t").cast("double")), 6))
      .select(col("category"), col("n"), col("p_micro"), col("h_term"))
  }

  /** Mutual-information cells between two categorical columns: for
    * each OBSERVED cell, the joint and marginal shares in exact
    * integer micros and the MI contribution
    * p_ab·ln(p_ab·N² / (n_a·n_b)) rounded 6 dp (one ln per row over
    * integer counts — the [[Collocations.pmiBigrams]] discipline;
    * zero-observed cells contribute exactly 0 to MI and are omitted).
    * Output: (a, b, n_ab, n_a, n_b, p_micro, mi_term). */
  def mutualInformationCells(df: DataFrame, aCol: String,
                             bCol: String): DataFrame = {
    val pairs = df.select(col(aCol).as("a"), col(bCol).as("b"))
    val cells = pairs.groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_ab"))
    val ma = cells.groupBy(col("a")).agg(sum(col("n_ab")).as("n_a"))
    val mb = cells.groupBy(col("b")).agg(sum(col("n_ab")).as("n_b"))
    cells.join(ma, Seq("a")).join(mb, Seq("b"))
      .withColumn("_n", expr("sum(n_ab) over ()"))
      .withColumn("p_micro", expr("n_ab * 1000000L div _n"))
      .withColumn("mi_term", round(
        (col("n_ab").cast("double") / col("_n").cast("double")) *
          log((col("n_ab").cast("double") * col("_n").cast("double")) /
            (col("n_a").cast("double") * col("n_b").cast("double"))), 6))
      .select(col("a"), col("b"), col("n_ab"), col("n_a"), col("n_b"),
        col("p_micro"), col("mi_term"))
  }

  /** Kaplan–Meier survival curve over entity lifetimes with
    * right-censoring (Kaplan & Meier 1958) — the churn/retention
    * estimator: an entity's lifetime is the day span between its first
    * and last observed event; the "death" (churn) is OBSERVED only if
    * the entity has been silent for more than `censorDays` before the
    * global last day — otherwise the lifetime is censored (the entity
    * may still be alive). Survival is the classic product-limit
    * estimate in exact integer micros with a per-step floor:
    * s(tᵢ) = s(tᵢ₋₁)·(nᵢ−dᵢ) div nᵢ, s(start) = 10⁶ — the sequential
    * fold both engines replay step for step (the oracle runs it as a
    * WITH RECURSIVE). Censored-only times keep s unchanged (d=0) but
    * still shrink the risk set, per the estimator. Output one row per
    * distinct lifetime: (t, n_risk, n_event, n_censored, s_micro).
    *
    * Scale shape: one entity aggregation (hash agg to entity
    * cardinality), one lifetime-day aggregation (bounded by the
    * calendar span, NOT by entities), then a driver fold over that
    * bounded table — the collect is limit-bounded BEFORE it happens
    * (the bradleyTerry discipline). */
  def kaplanMeier(df: DataFrame, idCol: String, tsCol: String,
                  censorDays: Int = 14,
                  maxTimes: Int = 100000): DataFrame = {
    require(censorDays >= 0, "censorDays must be >= 0")
    val spark = df.sparkSession
    import spark.implicits._
    val spans = df
      .select(col(idCol).as("id"), col(tsCol).cast("date").as("d"))
      .groupBy(col("id"))
      .agg(min(col("d")).as("first_day"), max(col("d")).as("last_day"))
      .withColumn("t", datediff(col("last_day"), col("first_day"))
        .cast("long"))
      // the global horizon is a window over the entity-sized frame,
      // not the raw scan
      .withColumn("_mx", expr("max(last_day) over ()"))
      .withColumn("event",
        col("last_day") < date_sub(col("_mx"), censorDays))
    val times = spans.groupBy(col("t"))
      .agg(sum(when(col("event"), 1L).otherwise(0L)).as("d"),
        sum(when(col("event"), 0L).otherwise(1L)).as("c"))
      .limit(maxTimes + 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    require(times.length <= maxTimes,
      s"distinct lifetimes exceed $maxTimes — lifetimes must be " +
        "calendar-bounded buckets, not a per-row key")
    val total = times.map(t => t._2 + t._3).sum
    var atRisk = total
    var s = 1000000L
    val rows = times.sortBy(_._1).map { case (t, d, c) =>
      val nRisk = atRisk
      s = s * (nRisk - d) / nRisk // nRisk >= d+c >= 1 at every step
      atRisk -= d + c
      (t, nRisk, d, c, s)
    }
    rows.toSeq.toDF("t", "n_risk", "n_event", "n_censored", "s_micro")
  }

  /** Gini concentration of a non-negative numeric column — the
    * data-balance audit ("how concentrated is corpus mass across
    * documents/sources?"): the classic rank formula
    * G = (2·Σ rᵢxᵢ − (n+1)·Σx) / (n·Σx) with ranks ascending by value,
    * in exact integer micros. Σ rᵢxᵢ is computed GROUPED BY DISTINCT
    * VALUE (for a run of c equal values after F smaller ones, the rank
    * sum is c·F + c(c+1)/2 — tie order provably cannot change the
    * total), so the only window runs over distinct values, never raw
    * rows. Accumulation in decimal(38,0): rank·value sums overflow
    * int64 at corpus scale. One row out: (n, sum_x, gini_micro).
    * Null and negative inputs are rejected rows reported in n_skipped
    * (Gini is defined on non-negative mass). */
  def giniConcentration(df: DataFrame, valueCol: String): DataFrame = {
    val vals = df.select(col(valueCol).cast("long").as("x"))
    val good = vals.filter(col("x").isNotNull && col("x") >= 0)
    val skipped = vals.filter(col("x").isNull || col("x") < 0)
      .agg(count(lit(1)).as("n_skipped"))
    val w = Window.orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    good.groupBy(col("x")).agg(count(lit(1)).as("c"))
      .withColumn("_cum", sum(col("c")).over(w))
      .withColumn("_f", col("_cum") - col("c"))
      // per distinct value, DOUBLED rank sum (keeps /2 out of the
      // formula — c·(2F+c+1) is always even): 2·Σ ranks = c·(2F+c+1)
      .withColumn("_rx2", expr(
        "CAST(x AS DECIMAL(38,0)) * CAST(c AS DECIMAL(38,0)) * " +
          "(2 * _f + c + 1)"))
      .agg(sum(col("c")).as("n"),
        sum(col("x").cast("decimal(38,0)") * col("c")).as("_sx"),
        sum(col("_rx2")).as("_srx2"))
      .withColumn("gini_micro",
        expr("CASE WHEN n >= 1 AND _sx > 0 THEN CAST((_srx2 - " +
          "(n + 1) * _sx) * 1000000 div (n * _sx) AS LONG) END"))
      .crossJoin(skipped)
      .select(col("n"), col("_sx").cast("long").as("sum_x"),
        col("gini_micro"), col("n_skipped"))
  }

  /** Chao1 species-richness estimate (Chao 1984) over a token column —
    * "how many distinct vocabulary items does the corpus REALLY have,
    * given how many we've seen once or twice?": the bias-corrected
    * form S = S_obs + f₁(f₁−1)/(2(f₂+1)) (defined even when no
    * doubletons exist), in exact integer micros. The unseen-mass
    * companion to the vocab-coverage gates: a crawl slice whose chao1
    * far exceeds its observed vocabulary is still discovering its
    * domain. One row out: (s_obs, f1, f2, chao1_micro).
    *
    * Scale shape: one hash aggregation to token cardinality, one to
    * frequency-of-frequency (a handful of rows), no window over raw
    * rows. */
  def chao1Richness(df: DataFrame, tokenCol: String): DataFrame = {
    df.select(col(tokenCol).as("tok"))
      .filter(col("tok").isNotNull && length(col("tok")) > 0)
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("s_obs"),
        sum(when(col("n") === 1, 1L).otherwise(0L)).as("f1"),
        sum(when(col("n") === 2, 1L).otherwise(0L)).as("f2"))
      // f1·(f1−1)·10⁶ overflows int64 past ~3M singletons — a real
      // web-crawl vocabulary — so the correction runs in decimal
      .withColumn("chao1_micro",
        expr("s_obs * 1000000L + CAST(CAST(f1 AS DECIMAL(38,0)) * " +
          "(f1 - 1) * 1000000 div (2L * (f2 + 1)) AS LONG)"))
      .select(col("s_obs"), col("f1"), col("f2"), col("chao1_micro"))
  }

  /** The exact LOWER MEDIAN of a long column — the k-th smallest with
    * k = (n+1) div 2, computed as a cumulative count over DISTINCT
    * values (never an interpolated percentile, which engines disagree
    * on for even counts). Returns a 1-row (n, median) frame. */
  private def lowerMedian(vals: DataFrame): DataFrame = {
    val w = Window.orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    vals.groupBy(col("x")).agg(count(lit(1)).as("c"))
      .withColumn("_cum", sum(col("c")).over(w))
      .withColumn("_n", expr("sum(c) over ()"))
      .withColumn("_k", expr("(_n + 1) div 2"))
      .filter(col("_cum") >= col("_k"))
      .agg(first(col("_n")).as("n"), min(col("x")).as("median"))
  }

  /** Median absolute deviation — the robust scale estimate (Hampel
    * 1974) the outlier-clipping stage needs when a corpus metric has
    * heavy tails (document lengths do): MAD = median(|x − median(x)|),
    * both medians the exact lower order statistic. One row out:
    * (n, median, mad). Null inputs are excluded (and counted).
    *
    * Scale shape: two aggregations to distinct-value cardinality with
    * one cumulative window over each (distinct values, not rows), one
    * broadcast 1-row join carrying the first median back. */
  def medianAbsoluteDeviation(df: DataFrame,
                              valueCol: String): DataFrame = {
    val vals = df.select(col(valueCol).cast("long").as("x"))
      .filter(col("x").isNotNull)
    val med = lowerMedian(vals)
    val resid = vals.crossJoin(broadcast(med.select(col("median"))))
      .select(abs(col("x") - col("median")).as("x"))
    med.crossJoin(
      lowerMedian(resid).select(col("median").as("mad")))
      .select(col("n"), col("median"), col("mad"))
  }

  /** Wald–Wolfowitz runs test over a daily series — "is the signal
    * WANDERING (trends, regimes) or random around its level?": the
    * sequence of above/below-median signs (median-equal days are
    * excluded, the standard treatment), the run count R, and the
    * normal z in exact integer micros via the cleared-denominator
    * form z = ((R−1)·n − 2ab) / √(2ab(2ab−n) div (n−1)) with a = #
    * above, b = # below, n = a + b — one floor(sqrt) on an integer
    * radicand (< 2⁵² for any daily series shorter than ~50k days).
    * One row out: (n_above, n_below, n_runs, z_micro); z NULL when a
    * side is empty or the variance is 0.
    *
    * Scale shape: the [[theilSen]] contract — operates on the
    * day-bounded rollup; one lag window ordered by day, one median
    * pass over distinct values. */
  def runsTest(daily: DataFrame): DataFrame = {
    val base = daily.select(col("d"), col("n").cast("long").as("n"))
    val med = lowerMedian(base.select(col("n").as("x")))
      .select(col("median"))
    val signs = base.crossJoin(broadcast(med))
      .filter(col("n") =!= col("median"))
      .withColumn("s", when(col("n") > col("median"), 1L)
        .otherwise(0L))
      .withColumn("_prev", lag(col("s"), 1)
        .over(Window.orderBy(col("d"))))
    signs.agg(
        sum(col("s")).as("n_above"),
        sum(lit(1L) - col("s")).as("n_below"),
        (sum(when(col("_prev").isNull ||
          col("_prev") =!= col("s"), 1L).otherwise(0L))).as("n_runs"))
      .withColumn("_n", col("n_above") + col("n_below"))
      .withColumn("_ab2", expr("2L * n_above * n_below"))
      .withColumn("_rad", expr(
        "CASE WHEN _n >= 2 THEN " +
          "CAST(CAST(_ab2 AS DECIMAL(38,0)) * (_ab2 - _n) " +
          "div (_n - 1) AS LONG) END"))
      .withColumn("_den", floor(sqrt(col("_rad"))).cast("long"))
      .withColumn("z_micro", expr(
        "CASE WHEN _den > 0 THEN " +
          "CASE WHEN (n_runs - 1) * _n - _ab2 >= 0 " +
          "THEN ((n_runs - 1) * _n - _ab2) * 1000000L div _den " +
          "ELSE -((_ab2 - (n_runs - 1) * _n) * 1000000L div _den) " +
          "END END"))
      .select(col("n_above"), col("n_below"), col("n_runs"),
        col("z_micro"))
  }

  /** Herfindahl–Hirschman concentration of a keyed count — the
    * one-number source-balance summary next to the Gini audit: with
    * per-group shares in floored micros, HHI = Σ s_i² div 10⁶ (10⁶ =
    * a single group holds everything; 10⁶/k = k equal groups). One
    * row out: (n_groups, total, hhi_micro).
    *
    * Scale shape: one hash aggregation to group cardinality; the
    * whole-frame window for the total runs over the group frame. */
  def herfindahl(df: DataFrame, keyCol: String): DataFrame = {
    df.select(col(keyCol).cast("string").as("k"))
      .filter(col("k").isNotNull)
      .groupBy(col("k")).agg(count(lit(1)).as("n"))
      .withColumn("_t", expr("sum(n) over ()"))
      .withColumn("_s", expr("n * 1000000L div _t"))
      .agg(count(lit(1)).as("n_groups"),
        first(col("_t")).as("total"),
        sum(expr("CAST(_s AS DECIMAL(38,0)) * _s")).as("_ss"))
      .withColumn("hhi_micro", expr("CAST(_ss div 1000000 AS LONG)"))
      .select(col("n_groups"), col("total"), col("hhi_micro"))
  }

  /** Cohen's d standardized mean difference between two groups of a
    * long metric — the effect-size number next to the A/B z-test
    * ("significant, but is it BIG?"): d = (mean_a − mean_b) / s_p,
    * with s_p the pooled SAMPLE standard deviation. All integer:
    * means floored to micros (sign-split), per-group sample variances
    * via the sums-of-products identity (decimals inside, each
    * division a floor), s_p = floor(sqrt(pooled)) — exact while the
    * pooled variance < 2⁵². One row out:
    * (n_a, n_b, mean_a_micro, mean_b_micro, sp, d_milli); NULL d when
    * either group has < 2 rows or the pooled variance is 0. d is
    * reported in MILLI units (±0.2 small / ±0.8 large reads as
    * ±200/±800).
    *
    * Scale shape: one scan-shaped two-group aggregation — no window,
    * no join. */
  def cohensD(df: DataFrame, valueCol: String,
              groupCol: String): DataFrame = {
    val rows = df.select(col(valueCol).cast("long").as("x"),
        col(groupCol).cast("boolean").as("g"))
      .filter(col("x").isNotNull && col("g").isNotNull)
    rows.agg(
        sum(when(col("g"), 1L).otherwise(0L)).as("n_a"),
        sum(when(!col("g"), 1L).otherwise(0L)).as("n_b"),
        sum(when(col("g"), col("x")).otherwise(0L)).as("_sa"),
        sum(when(!col("g"), col("x")).otherwise(0L)).as("_sb"),
        sum(when(col("g"), col("x").cast("decimal(38,0)") * col("x"))
          .otherwise(lit(0).cast("decimal(38,0)"))).as("_qa"),
        sum(when(!col("g"), col("x").cast("decimal(38,0)") * col("x"))
          .otherwise(lit(0).cast("decimal(38,0)"))).as("_qb"))
      .withColumn("mean_a_micro", expr(
        "CASE WHEN n_a > 0 THEN CASE WHEN _sa >= 0 " +
          "THEN _sa * 1000000L div n_a " +
          "ELSE -((-_sa) * 1000000L div n_a) END END"))
      .withColumn("mean_b_micro", expr(
        "CASE WHEN n_b > 0 THEN CASE WHEN _sb >= 0 " +
          "THEN _sb * 1000000L div n_b " +
          "ELSE -((-_sb) * 1000000L div n_b) END END"))
      // sample sums of squared deviations: n·Σx² − (Σx)², divided by n
      // (not n−1) here and recombined below so the pooled divisor is
      // the standard (n_a − 1) + (n_b − 1)
      .withColumn("_ssa", expr(
        "CASE WHEN n_a >= 2 THEN CAST((CAST(n_a AS DECIMAL(38,0)) " +
          "* _qa - CAST(_sa AS DECIMAL(38,0)) * _sa) div n_a " +
          "AS LONG) END"))
      .withColumn("_ssb", expr(
        "CASE WHEN n_b >= 2 THEN CAST((CAST(n_b AS DECIMAL(38,0)) " +
          "* _qb - CAST(_sb AS DECIMAL(38,0)) * _sb) div n_b " +
          "AS LONG) END"))
      .withColumn("sp", expr(
        "CASE WHEN n_a >= 2 AND n_b >= 2 THEN " +
          "CAST(FLOOR(SQRT((_ssa + _ssb) div (n_a + n_b - 2))) " +
          "AS LONG) END"))
      .withColumn("d_milli", expr(
        "CASE WHEN sp > 0 THEN " +
          "CASE WHEN mean_a_micro - mean_b_micro >= 0 " +
          "THEN (mean_a_micro - mean_b_micro) div (sp * 1000L) " +
          "ELSE -((mean_b_micro - mean_a_micro) div (sp * 1000L)) " +
          "END END"))
      .select(col("n_a"), col("n_b"), col("mean_a_micro"),
        col("mean_b_micro"), col("sp"), col("d_milli"))
  }

  /** Welch's unequal-variance t statistic between two groups of a
    * long metric — the robust default when group variances differ
    * (the plain pooled t silently assumes they don't; [[cohensD]]
    * stays the effect-size companion). All integer: micro means
    * (sign-split floors), per-group SAMPLE variances via the
    * sums-of-products identity, the standard error floor(sqrt) of
    * va div n_a + vb div n_b, and the Welch–Satterthwaite degrees of
    * freedom in millis with every division a floor. One row:
    * (n_a, n_b, mean_a_micro, mean_b_micro, se, t_milli, dof_milli);
    * NULL t when either group has < 2 rows or the SE floors to 0.
    *
    * Scale shape: one scan-shaped two-group aggregation — no window,
    * no join (the [[cohensD]] contract). */
  def welchT(df: DataFrame, valueCol: String,
             groupCol: String): DataFrame = {
    val rows = df.select(col(valueCol).cast("long").as("x"),
        col(groupCol).cast("boolean").as("g"))
      .filter(col("x").isNotNull && col("g").isNotNull)
    rows.agg(
        sum(when(col("g"), 1L).otherwise(0L)).as("n_a"),
        sum(when(!col("g"), 1L).otherwise(0L)).as("n_b"),
        sum(when(col("g"), col("x")).otherwise(0L)).as("_sa"),
        sum(when(!col("g"), col("x")).otherwise(0L)).as("_sb"),
        sum(when(col("g"), col("x").cast("decimal(38,0)") * col("x"))
          .otherwise(lit(0).cast("decimal(38,0)"))).as("_qa"),
        sum(when(!col("g"), col("x").cast("decimal(38,0)") * col("x"))
          .otherwise(lit(0).cast("decimal(38,0)"))).as("_qb"))
      .withColumn("mean_a_micro", expr(
        "CASE WHEN n_a > 0 THEN CASE WHEN _sa >= 0 " +
          "THEN _sa * 1000000L div n_a " +
          "ELSE -((-_sa) * 1000000L div n_a) END END"))
      .withColumn("mean_b_micro", expr(
        "CASE WHEN n_b > 0 THEN CASE WHEN _sb >= 0 " +
          "THEN _sb * 1000000L div n_b " +
          "ELSE -((-_sb) * 1000000L div n_b) END END"))
      // SAMPLE variances: (nΣx² − (Σx)²) div (n(n−1))
      .withColumn("_va", expr(
        "CASE WHEN n_a >= 2 THEN CAST((CAST(n_a AS DECIMAL(38,0)) " +
          "* _qa - CAST(_sa AS DECIMAL(38,0)) * _sa) " +
          "div (CAST(n_a AS DECIMAL(38,0)) * (n_a - 1)) AS LONG) END"))
      .withColumn("_vb", expr(
        "CASE WHEN n_b >= 2 THEN CAST((CAST(n_b AS DECIMAL(38,0)) " +
          "* _qb - CAST(_sb AS DECIMAL(38,0)) * _sb) " +
          "div (CAST(n_b AS DECIMAL(38,0)) * (n_b - 1)) AS LONG) END"))
      .withColumn("_ra", expr("_va div n_a"))
      .withColumn("_rb", expr("_vb div n_b"))
      .withColumn("se", expr(
        "CASE WHEN _ra IS NOT NULL AND _rb IS NOT NULL THEN " +
          "CAST(FLOOR(SQRT(_ra + _rb)) AS LONG) END"))
      .withColumn("t_milli", expr(
        "CASE WHEN se > 0 THEN " +
          "CASE WHEN mean_a_micro - mean_b_micro >= 0 " +
          "THEN (mean_a_micro - mean_b_micro) div (se * 1000L) " +
          "ELSE -((mean_b_micro - mean_a_micro) div (se * 1000L)) " +
          "END END"))
      // Welch–Satterthwaite: (ra+rb)² / (ra²/(n_a−1) + rb²/(n_b−1)),
      // in millis, every division floored (nested-floor semantics
      // DECLARED — both engines replay the identical chain)
      .withColumn("dof_milli", expr(
        "CASE WHEN _ra IS NOT NULL AND _rb IS NOT NULL AND " +
          "(CAST(_ra AS DECIMAL(38,0)) * _ra div (n_a - 1) " +
          " + CAST(_rb AS DECIMAL(38,0)) * _rb div (n_b - 1)) > 0 " +
          "THEN CAST(CAST(_ra + _rb AS DECIMAL(38,0)) * (_ra + _rb) " +
          "* 1000 div (CAST(_ra AS DECIMAL(38,0)) * _ra div (n_a - 1) " +
          "+ CAST(_rb AS DECIMAL(38,0)) * _rb div (n_b - 1)) " +
          "AS LONG) END"))
      .select(col("n_a"), col("n_b"), col("mean_a_micro"),
        col("mean_b_micro"), col("se"), col("t_milli"),
        col("dof_milli"))
  }

  /** Cramér's V association strength from the [[chiSquareCells]]
    * table — the bounded [0, 1] companion to the raw chi-square mass
    * (comparable across tables of different size and shape):
    * V = √(χ² / (n·min(r−1, c−1))), in micros via
    * floor(sqrt(χ²_milli·10⁹ div (n·k))) — the double-radicand
    * floor(sqrt) discipline. One row:
    * (n, n_rows_cat, n_cols_cat, chi2_milli, v_micro); NULL V for a
    * degenerate 1×m table.
    *
    * Scale shape: one aggregation over the cells frame (category-
    * bounded), nothing row-sized. */
  def cramersV(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    chiSquareCells(df, aCol, bCol)
      .agg(sum(col("n_obs")).as("n"),
        countDistinct(col("a")).as("n_rows_cat"),
        countDistinct(col("b")).as("n_cols_cat"),
        sum(coalesce(col("term_milli"), lit(0L))).as("chi2_milli"))
      .withColumn("_k", least(col("n_rows_cat") - 1,
        col("n_cols_cat") - 1))
      .withColumn("v_micro", expr(
        "CASE WHEN _k > 0 AND n > 0 THEN " +
          "CAST(FLOOR(SQRT(CAST(CAST(chi2_milli AS DECIMAL(38,0)) " +
          "* 1000000000 div (CAST(n AS DECIMAL(38,0)) * _k) " +
          "AS DOUBLE))) AS LONG) END"))
      .select(col("n"), col("n_rows_cat"), col("n_cols_cat"),
        col("chi2_milli"), col("v_micro"))
  }

  /** Third/fourth-moment profile (skewness + excess kurtosis) from
    * COMMUTATIVE POWER SUMS — the distributed-moments shape: each
    * partition folds (n, Σx, Σx², Σx³, Σx⁴) map-side (decimal — no
    * float summation-order nondeterminism), partials merge by plain
    * addition ([[momentsFromPartials]] is the incremental entry
    * point), and the finalize derives the central moments
    *   M2 = Σx² − (Σx)²/n,  M3 = Σx³ − 3·Σx²·x̄ + 2n·x̄³,
    *   M4 = Σx⁴ − 4·Σx³·x̄ + 6·Σx²·x̄² − 3n·x̄⁴
    * in N-SCALED form (n·M2, n²·M3, n³·M4 — ×n^k clears every
    * fraction; the n-powers then cancel exactly in both ratios:
    * skew = n²M3 / (nM2)^{3/2}, kurt = n³M4 / (nM2)²). The PARTIALS
    * stay exact decimal; the n-scaled combinations and the two ratios
    * are evaluated in IEEE doubles using ONLY exactly-rounded ops
    * (+, −, ×, ÷, sqrt, floor — never pow/ln, whose libm rounding
    * differs across engines), so the finalize is bit-deterministic
    * cross-engine while decimal(38) could not even hold n³·Σx⁴ at
    * corpus scale. One row: (n, mean_micro, m2, skew_milli,
    * kurt_excess_milli); NULLs when n < 2 or M2 ≤ 0.
    *
    * Numerics: the one-pass power-sum form cancels catastrophically
    * when |x̄| ≫ sd — recentre the metric first in that regime (the
    * standard one-pass caveat, declared). */
  def momentsProfile(df: DataFrame, valueCol: String): DataFrame =
    momentsFromPartials(momentsPartials(df, valueCol))

  /** Partition-foldable partial rows (n, s1, s2, s3, s4) — one global
    * row, or one per `slices` key (per-source / per-day partials that
    * [[momentsFromPartials]] later merges by plain addition). */
  def momentsPartials(df: DataFrame, valueCol: String,
                      slices: Seq[String] = Nil): DataFrame = {
    val x = col(valueCol).cast("decimal(38,0)")
    val base = df.filter(col(valueCol).isNotNull)
    val aggs = Seq(count(lit(1)).as("n"), sum(x).as("s1"),
      sum(x * x).as("s2"), sum(x * x * x).as("s3"),
      sum(x * x * x * x).as("s4"))
    if (slices.isEmpty) base.agg(aggs.head, aggs.tail: _*)
    else base.groupBy(slices.map(col): _*).agg(aggs.head, aggs.tail: _*)
      .drop(slices: _*)
  }

  /** Finalize merged partials (re-sums delta rows first — the
    * additive-counts contract shared with
    * [[graft.operators.NgramLm.trainFromCounts]]). */
  def momentsFromPartials(partials: DataFrame): DataFrame = {
    partials
      .agg(sum(col("n")).as("n"), sum(col("s1")).as("s1"),
        sum(col("s2")).as("s2"), sum(col("s3")).as("s3"),
        sum(col("s4")).as("s4"))
      .withColumn("mean_micro", expr(
        "CASE WHEN n > 0 THEN CASE WHEN s1 >= 0 " +
          "THEN CAST(s1 * 1000000 div n AS LONG) " +
          "ELSE -CAST((-s1) * 1000000 div n AS LONG) END END"))
      // n-scaled central sums IN DOUBLES (decimal(38) cannot hold
      // n³·Σx⁴ at corpus scale; every op below is IEEE exactly-rounded
      // so both engines replay it bit-for-bit):
      // n·M2 = n·s2 − s1²; n²·M3 = n²·s3 − 3n·s2·s1 + 2·s1³;
      // n³·M4 = n³·s4 − 4n²·s3·s1 + 6n·s2·s1² − 3·s1⁴
      .withColumn("_nd", expr("CAST(n AS DOUBLE)"))
      .withColumn("_d1", expr("CAST(s1 AS DOUBLE)"))
      .withColumn("_d2", expr("CAST(s2 AS DOUBLE)"))
      .withColumn("_d3", expr("CAST(s3 AS DOUBLE)"))
      .withColumn("_d4", expr("CAST(s4 AS DOUBLE)"))
      .withColumn("_nm2", expr("_nd * _d2 - _d1 * _d1"))
      .withColumn("_n2m3", expr(
        "_nd * _nd * _d3 - 3 * _nd * _d2 * _d1 + 2 * _d1 * _d1 * _d1"))
      .withColumn("_n3m4", expr(
        "_nd * _nd * _nd * _d4 - 4 * _nd * _nd * _d3 * _d1 " +
          "+ 6 * _nd * _d2 * _d1 * _d1 - 3 * _d1 * _d1 * _d1 * _d1"))
      .withColumn("m2", expr(
        "CASE WHEN n >= 2 THEN CAST(FLOOR(_nm2 / _nd) AS LONG) END"))
      // skew = n²M3 / (nM2)^{3/2}, the ^{3/2} as x·sqrt(x) (sqrt is
      // exactly rounded; pow is not); kurt = n³M4 / (nM2)²
      .withColumn("skew_milli", expr(
        "CASE WHEN _nm2 > 0 AND n >= 2 THEN " +
          "CAST(FLOOR(1000 * _n2m3 / (_nm2 * SQRT(_nm2))) AS LONG) " +
          "END"))
      .withColumn("kurt_excess_milli", expr(
        "CASE WHEN _nm2 > 0 AND n >= 2 THEN " +
          "CAST(FLOOR(1000 * _n3m4 / (_nm2 * _nm2)) - 3000 AS LONG) " +
          "END"))
      .select(col("n"), col("mean_micro"), col("m2"),
        col("skew_milli"), col("kurt_excess_milli"))
  }

  /** Mann–Whitney U (Wilcoxon rank-sum) between two groups of a long
    * metric — the NONPARAMETRIC two-sample test next to [[cohensD]]'s
    * parametric effect size: does one group stochastically dominate
    * the other, with no normality assumption? All integer via DOUBLED
    * mid-ranks (a run of c equal values after F smaller ones
    * contributes c·(2F + c + 1) to the doubled rank sum — ties need no
    * fractional ranks), the tie-corrected normal approximation
    *   4·Var(U)·3n(n−1) = n_a·n_b·(n³ − n − Σ(t³ − t)),
    * and z in micros with the floor(sqrt) discipline (exact
    * cross-engine while the radicand < 2⁵²; no continuity
    * correction — both engines replay the same closed form). One row:
    * (n_a, n_b, u2_a, u2_b, tie_cubes, z_micro) where u2_x = 2·U_x
    * (doubled to stay integer; u2_a + u2_b = 2·n_a·n_b always —
    * the gate-visible self-check). z NULL when a group is empty or
    * the variance is 0 (all values tied).
    *
    * Scale shape: one value-grouped aggregation, one cumulative
    * window over the DISTINCT-value frame (value-bounded, the
    * [[giniConcentration]] rank discipline — never over raw rows),
    * one global fold. */
  def mannWhitneyU(df: DataFrame, valueCol: String,
                   groupCol: String): DataFrame = {
    val rows = df.select(col(valueCol).cast("long").as("x"),
        col(groupCol).cast("boolean").as("g"))
      .filter(col("x").isNotNull && col("g").isNotNull)
    val cells = rows.groupBy(col("x"))
      .agg(sum(when(col("g"), 1L).otherwise(0L)).as("ca"),
        count(lit(1)).as("c"))
    val below = Window.orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, -1)
    cells
      .withColumn("f", coalesce(sum(col("c")).over(below), lit(0L)))
      .agg(
        sum(col("ca")).as("n_a"),
        sum(col("c") - col("ca")).as("n_b"),
        sum(col("ca").cast("decimal(38,0)") *
          (lit(2L) * col("f") + col("c") + lit(1L))).as("_r2a"),
        sum(col("c").cast("decimal(38,0)") * col("c") * col("c")
          - col("c")).as("_t"))
      .withColumn("u2_a", expr(
        "CAST(_r2a - CAST(n_a AS DECIMAL(38,0)) * (n_a + 1) AS LONG)"))
      .withColumn("u2_b", expr(
        "CAST(2 * CAST(n_a AS DECIMAL(38,0)) * n_b - u2_a AS LONG)"))
      .withColumn("tie_cubes", expr("CAST(_t AS LONG)"))
      .withColumn("_n", col("n_a") + col("n_b"))
      .withColumn("_var4", expr(
        "CASE WHEN n_a > 0 AND n_b > 0 AND _n >= 2 THEN " +
          "CAST(n_a AS DECIMAL(38,0)) * n_b * " +
          "(CAST(_n AS DECIMAL(38,0)) * _n * _n - _n - _t) " +
          "div (3 * CAST(_n AS DECIMAL(38,0)) * (_n - 1)) END"))
      .withColumn("_sig2", expr(
        "CASE WHEN _var4 > 0 THEN " +
          "CAST(FLOOR(SQRT(CAST(_var4 AS DOUBLE))) AS LONG) END"))
      .withColumn("z_micro", expr(
        "CASE WHEN _sig2 > 0 THEN " +
          "CASE WHEN u2_a - CAST(n_a AS DECIMAL(38,0)) * n_b >= 0 " +
          "THEN CAST((u2_a - CAST(n_a AS DECIMAL(38,0)) * n_b) " +
          "* 1000000 div _sig2 AS LONG) " +
          "ELSE -CAST((CAST(n_a AS DECIMAL(38,0)) * n_b - u2_a) " +
          "* 1000000 div _sig2 AS LONG) END END"))
      .select(col("n_a"), col("n_b"), col("u2_a"), col("u2_b"),
        col("tie_cubes"), col("z_micro"))
  }

  /** Kendall rank correlation tau-b over PRE-BUCKETED long pairs —
    * the concordance companion to [[spearman]] (tau weights every
    * pair equally; Spearman squares rank gaps): over all value pairs,
    *   tau_b = (C − D) / √((n₀ − n_x)(n₀ − n_y)),
    * C/D the concordant/discordant pair mass, n₀ = n(n−1)/2, n_x/n_y
    * the tie-pair mass per axis — all computed on the DISTINCT
    * (x, y) CELL table (c₁·c₂ products, never row pairs), doubled
    * where needed to stay integer, tau in micros via floor(sqrt)
    * (exact while the radicand < 2⁵²). The caller buckets continuous
    * columns first (cells are the unit of work AND of the tie
    * structure — bucketing IS the declared semantics here, not an
    * approximation of raw-value tau).
    *
    * Scale shape: one (x, y) cell aggregation (bounded by
    * `maxCells`, checked BEFORE the quadratic step — the
    * [[kaplanMeier]] discipline), then a cell-pair inequality join —
    * O(cells²) compare on a dim-sized table (broadcast NLJ by
    * construction), corpus rows touched once. One row:
    * (n, n_cells, conc, disc, tau_micro); tau NULL when either axis
    * is constant. */
  def kendallTau(df: DataFrame, xCol: String, yCol: String,
                 maxCells: Int = 20000): DataFrame = {
    val cells = df.select(col(xCol).cast("long").as("x"),
        col(yCol).cast("long").as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("c"))
      .persist()
    try {
      val nCells = cells.count()
      require(nCells <= maxCells,
        s"more than $maxCells distinct (x, y) cells — bucket the " +
          "columns first (cells are the declared unit)")
      val a = cells.select(col("x").as("x1"), col("y").as("y1"),
        col("c").as("c1"))
      val b = cells.select(col("x").as("x2"), col("y").as("y2"),
        col("c").as("c2"))
      val pairMass = a.join(broadcast(b),
          col("x1") < col("x2") ||
            (col("x1") === col("x2") && col("y1") < col("y2")))
        .agg(
          sum(when(col("x1") < col("x2") && col("y1") < col("y2"),
            col("c1").cast("decimal(38,0)") * col("c2"))
            .otherwise(lit(0).cast("decimal(38,0)"))).as("_conc"),
          sum(when(col("x1") < col("x2") && col("y1") > col("y2"),
            col("c1").cast("decimal(38,0)") * col("c2"))
            .otherwise(lit(0).cast("decimal(38,0)"))).as("_disc"))
      val tots = cells.agg(
        sum(col("c")).as("n"),
        sum(col("c").cast("decimal(38,0)") * (col("c") - 1))
          .as("_tboth"))
      val xt = cells.groupBy(col("x"))
        .agg(sum(col("c")).as("cx"))
        .agg(sum(col("cx").cast("decimal(38,0)") * (col("cx") - 1))
          .as("_tx2"))
      val yt = cells.groupBy(col("y"))
        .agg(sum(col("c")).as("cy"))
        .agg(sum(col("cy").cast("decimal(38,0)") * (col("cy") - 1))
          .as("_ty2"))
      pairMass.crossJoin(broadcast(tots)).crossJoin(broadcast(xt))
        .crossJoin(broadcast(yt))
        // doubled masses: 2n₀ = n(n−1), 2n_x = Σ tx(tx−1); the √ of the
        // doubled product is 2·√(true product), cancelling the doubled
        // numerator 2(C − D)
        .withColumn("_dx", expr(
          "CAST(n AS DECIMAL(38,0)) * (n - 1) - _tx2"))
        .withColumn("_dy", expr(
          "CAST(n AS DECIMAL(38,0)) * (n - 1) - _ty2"))
        .withColumn("_den", expr(
          "CASE WHEN _dx > 0 AND _dy > 0 THEN " +
            "CAST(FLOOR(SQRT(CAST(_dx * _dy AS DOUBLE))) AS LONG) END"))
        .withColumn("tau_micro", expr(
          "CASE WHEN _den > 0 THEN " +
            "CASE WHEN _conc >= _disc " +
            "THEN CAST(2 * (_conc - _disc) * 1000000 div _den AS LONG) " +
            "ELSE -CAST(2 * (_disc - _conc) * 1000000 div _den AS LONG) " +
            "END END"))
        .select(col("n"), lit(nCells).as("n_cells"),
          expr("CAST(_conc AS LONG)").as("conc"),
          expr("CAST(_disc AS LONG)").as("disc"), col("tau_micro"))
        .localCheckpoint(true)
    } finally { cells.unpersist(false); () }
  }

  /** Mann–Kendall trend test over a daily series (Mann 1945; Kendall
    * 1975) — the significance companion to [[theilSen]] (they are
    * conventionally reported together): S = Σ_{i<j} sign(x_j − x_i)
    * over day-ordered pairs, tie-corrected variance
    * 18·Var(S) = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5), and the
    * continuity-corrected z in exact integer micros
    * (z = (S∓1)/√Var, floor(sqrt) on the integer variance). One row
    * out: (n_days, s_stat, var18, z_micro); z NULL when Var = 0.
    *
    * Scale shape: the [[theilSen]] contract — day-bounded (checked
    * BEFORE the quadratic pair join), one tie aggregation over
    * distinct values. */
  def mannKendall(daily: DataFrame, maxDays: Int = 3660): DataFrame = {
    val base = daily.select(col("d"), col("n").cast("long").as("n"))
    require(base.limit(maxDays + 1).count() <= maxDays,
      s"series exceeds $maxDays days — aggregate to a coarser grid")
    val s = base.as("a").join(base.as("b"), col("a.d") < col("b.d"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(signum(col("b.n") - col("a.n")).cast("long")).as("s_stat"))
    val nAndTies = base
      .groupBy(col("n")).agg(count(lit(1)).as("t"))
      .agg(sum(col("t")).as("n_days"),
        sum(expr("t * (t - 1) * (2 * t + 5)")).as("_tie18"))
    s.crossJoin(nAndTies)
      .withColumn("var18", expr(
        "n_days * (n_days - 1) * (2 * n_days + 5) - _tie18"))
      .withColumn("_var", expr("var18 div 18L"))
      .withColumn("_sqv", floor(sqrt(col("_var"))).cast("long"))
      .withColumn("z_micro", expr(
        "CASE WHEN _sqv > 0 THEN " +
          "CASE WHEN s_stat > 0 THEN (s_stat - 1) * 1000000L div _sqv " +
          "WHEN s_stat < 0 THEN -((-s_stat - 1) * 1000000L div _sqv) " +
          "ELSE 0L END END"))
      .select(col("n_days"), col("n_pairs"), col("s_stat"),
        col("var18"), col("z_micro"))
  }

  /** Index of dispersion (Fano factor) per key — the burstiness audit
    * over a keyed daily rollup: D = variance/mean of each key's daily
    * values; a Poisson-steady signal sits near 1, a bursty one far
    * above. Exact integer micros via the population-variance identity
    * D = (n·Σx² − (Σx)²) / (n·Σx) — one division per key, decimals
    * inside (day counts squared overflow int64 at rollup scale), NULL
    * when a key's mass is zero. Output per key:
    * (key, n, total, dispersion_micro).
    *
    * Scale shape: operates on the ROLLUP (the gapfill contract): one
    * hash aggregation to key cardinality, no window. */
  def dispersionByKey(df: DataFrame, keyCol: String,
                      valueCol: String): DataFrame = {
    df.select(col(keyCol).cast("string").as("key"),
        col(valueCol).cast("long").as("x"))
      .filter(col("x").isNotNull && col("x") >= 0)
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("total"),
        sum(col("x").cast("decimal(38,0)") * col("x")).as("_sq"))
      .withColumn("dispersion_micro", expr(
        "CASE WHEN total > 0 THEN " +
          "CAST((CAST(n AS DECIMAL(38,0)) * _sq " +
          "- CAST(total AS DECIMAL(38,0)) * total) * 1000000 " +
          "div (CAST(n AS DECIMAL(38,0)) * total) AS LONG) END"))
      .select(col("key"), col("n"), col("total"),
        col("dispersion_micro"))
  }

  /** Decile boundary values of a long column — the exact lower
    * quantile q_i = smallest x with cum-count ≥ ⌈i·n/10⌉, i = 1..9
    * (never interpolated). Output: (decile, q). */
  private def decileValues(vals: DataFrame): DataFrame = {
    val spark = vals.sparkSession
    import spark.implicits._
    val w = Window.orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    vals.groupBy(col("x")).agg(count(lit(1)).as("c"))
      .withColumn("_cum", sum(col("c")).over(w))
      .withColumn("_n", expr("sum(c) over ()"))
      .crossJoin(broadcast((1L to 9L).toDF("decile")))
      .filter(col("_cum") >= expr("(decile * _n + 9) div 10"))
      .groupBy(col("decile")).agg(min(col("x")).as("q"))
  }

  /** QQ decile table between two distributions of the same metric —
    * the drift/skew audit read as "at each decile, how far apart are
    * the two populations": exact lower-quantile boundaries side by
    * side plus their gap. Output per decile 1..9:
    * (decile, q_a, q_b, gap).
    *
    * Scale shape: one distinct-value aggregation per side with one
    * cumulative window over distinct values, a 9-row decile frame
    * broadcast against each. */
  def qqDeciles(a: DataFrame, b: DataFrame,
                valueCol: String): DataFrame = {
    def side(df: DataFrame) = decileValues(
      df.select(col(valueCol).cast("long").as("x"))
        .filter(col("x").isNotNull))
    side(a).select(col("decile"), col("q").as("q_a"))
      .join(side(b).select(col("decile"), col("q").as("q_b")),
        Seq("decile"))
      .withColumn("gap", col("q_b") - col("q_a"))
      .select(col("decile"), col("q_a"), col("q_b"), col("gap"))
  }

  /** Robust clipping audit — winsorization at median ± k·MAD (the
    * Hampel identifier): the outlier fence heavy-tailed corpus metrics
    * need before a mean is worth reporting. Reports the fence, how
    * many rows each side clips, and the winsorized mean in floored
    * micros (sign-split) — all exact integer. One row out:
    * (n, median, mad, lo, hi, n_clipped_lo, n_clipped_hi,
    * winsorized_mean_micro).
    *
    * Scale shape: [[medianAbsoluteDeviation]]'s two distinct-value
    * aggregations plus ONE more scan-shaped aggregate with the 1-row
    * fence broadcast back — no new window. */
  def winsorizedStats(df: DataFrame, valueCol: String,
                      k: Int = 3): DataFrame = {
    require(k >= 1 && k <= 100, "k must be in [1, 100]")
    val vals = df.select(col(valueCol).cast("long").as("x"))
      .filter(col("x").isNotNull)
    val fence = medianAbsoluteDeviation(df, valueCol)
      .withColumn("lo", col("median") - lit(k.toLong) * col("mad"))
      .withColumn("hi", col("median") + lit(k.toLong) * col("mad"))
    vals.crossJoin(broadcast(fence))
      .withColumn("_w", greatest(least(col("x"), col("hi")), col("lo")))
      .groupBy(col("n"), col("median"), col("mad"), col("lo"), col("hi"))
      .agg(sum(when(col("x") < col("lo"), 1L).otherwise(0L))
          .as("n_clipped_lo"),
        sum(when(col("x") > col("hi"), 1L).otherwise(0L))
          .as("n_clipped_hi"),
        sum(col("_w").cast("decimal(38,0)")).as("_ws"))
      .withColumn("winsorized_mean_micro", expr(
        "CASE WHEN _ws >= 0 THEN CAST(_ws * 1000000 div n AS LONG) " +
          "ELSE -CAST((-_ws) * 1000000 div n AS LONG) END"))
      .select(col("n"), col("median"), col("mad"), col("lo"), col("hi"),
        col("n_clipped_lo"), col("n_clipped_hi"),
        col("winsorized_mean_micro"))
  }

  /** Theil–Sen robust trend estimate over a daily series (Theil 1950;
    * Sen 1968): the median of all pairwise slopes — one wild day
    * cannot move it, unlike least squares. Slopes are floored to
    * micros per day (sign-split) and the median is the exact lower
    * order statistic over them. One row out:
    * (n_days, n_pairs, slope_micro).
    *
    * Scale shape: operates on the ROLLUP (day-bounded by `maxDays`,
    * checked BEFORE the quadratic pair join): D days make D(D−1)/2
    * pairs — at the 10-year cap that is ~6.7M slope rows, a few MB.
    * The pair join is day² by design; never point this at raw rows. */
  def theilSen(daily: DataFrame, maxDays: Int = 3660): DataFrame = {
    val base = daily.select(col("d"), col("n").cast("long").as("n"))
    require(base.limit(maxDays + 1).count() <= maxDays,
      s"series exceeds $maxDays days — aggregate to a coarser grid")
    val slopes = base.as("a").join(base.as("b"),
        col("a.d") < col("b.d"))
      .select(expr(
        "CASE WHEN b.n - a.n >= 0 THEN " +
          "(b.n - a.n) * 1000000L div datediff(b.d, a.d) " +
          "ELSE -((a.n - b.n) * 1000000L div datediff(b.d, a.d)) END")
        .as("x"))
    val nDays = base.agg(count(lit(1)).as("n_days"))
    nDays.crossJoin(lowerMedian(slopes)
        .select(col("n").as("n_pairs"), col("median").as("slope_micro")))
      .select(col("n_days"), col("n_pairs"), col("slope_micro"))
  }
}

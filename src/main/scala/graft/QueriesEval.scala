package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.operators.{DataChecks, EvalMetrics, Graph, Stats}

/** Model-eval / data-audit gates (round 15): the measurement layer a
  * training pipeline runs over classifier scores, paired system
  * outputs, rater panels and ledger-style numerics — exact-integer
  * (micro-unit) formulations throughout so every number replays
  * engine-for-engine in the DuckDB oracle. Same determinism rules as
  * [[Queries]].
  */
object QueriesEval {
  import Queries.Q

  private def docs(s: org.apache.spark.sql.SparkSession, dir: String) =
    s.read.parquet(s"$dir/documents.parquet")
  private def events(s: org.apache.spark.sql.SparkSession, dir: String) =
    s.read.parquet(s"$dir/events.parquet")

  /** Source-majority predicted language: the per-source argmax lang
    * (count desc, lang asc tiebreak) — the baseline "classifier" the
    * confusion/McNemar gates grade against the true lang column. */
  private def sourceMajority(d: org.apache.spark.sql.DataFrame) = {
    val w = Window.partitionBy(col("source"))
      .orderBy(col("n").desc, col("lang"))
    d.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n"))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col("source"), col("lang").as("pred"))
  }

  /** The same majority table as a DuckDB CTE body. */
  private val sourceMajoritySql =
    """maj AS (
      |  SELECT source, lang AS pred FROM (
      |    SELECT source, lang,
      |      ROW_NUMBER() OVER (PARTITION BY source
      |        ORDER BY COUNT(*) DESC, lang) AS rn
      |    FROM documents GROUP BY source, lang)
      |  WHERE rn = 1)""".stripMargin

  val gated: Seq[(String, Q, String)] = Seq(
    // exact tie-corrected ROC AUC of document length predicting
    // English — the quality-classifier acceptance number, computed
    // from distinct-score pos/neg counts (Mann-Whitney form), every
    // step an integer floor on both engines
    ("eval_auc",
      ((s, dir) => {
      val d = docs(s, dir).select(col("n_chars").as("s"),
        (col("lang") === "en").as("y"))
      EvalMetrics.rocAuc(d, "s", "y")
    }),
      """WITH g AS (
        |  SELECT n_chars AS s,
        |    CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS np,
        |    CAST(SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END)
        |      AS BIGINT) AS ng
        |  FROM documents GROUP BY 1),
        |c AS (
        |  SELECT np, ng, CAST(COALESCE(SUM(ng) OVER (ORDER BY s
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS BIGINT) AS neg_below
        |  FROM g),
        |t AS (
        |  SELECT CAST(SUM(np) AS BIGINT) AS n_pos,
        |    CAST(SUM(ng) AS BIGINT) AS n_neg,
        |    CAST(SUM(np * neg_below) AS BIGINT) AS win_pairs,
        |    CAST(SUM(np * ng) AS BIGINT) AS tie_pairs
        |  FROM c)
        |SELECT n_pos, n_neg, win_pairs, tie_pairs,
        |  CASE WHEN n_pos > 0 AND n_neg > 0 THEN
        |    CAST((2 * win_pairs + tie_pairs) * 1000000
        |      // (2 * n_pos * n_neg) AS BIGINT) END AS auc_micro
        |FROM t""".stripMargin),
    // incremental-refit twin of eval_auc: per-score pos/neg counts are
    // additive across corpus slices, so the merged even/odd doc-id
    // count deltas must refit to EXACTLY the full-corpus AUC (the
    // trainFromCounts / bradleyTerryFromCounts pattern applied to
    // classifier evaluation — an eval stream never rescores old
    // batches)
    ("eval_auc_merge",
      ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"),
        col("n_chars").as("s"), (col("lang") === "en").as("y"))
      def cnt(f: org.apache.spark.sql.DataFrame) = f.groupBy(col("s"))
        .agg(sum(when(col("y"), 1L).otherwise(0L)).as("np"),
          sum(when(col("y"), 0L).otherwise(1L)).as("ng"))
      EvalMetrics.rocAucFromCounts(
        cnt(d.filter(pmod(col("doc_id"), lit(2)) === 0))
          .unionByName(cnt(d.filter(pmod(col("doc_id"), lit(2)) === 1))))
    }),
      """WITH ga AS (
        |  SELECT n_chars AS s,
        |    CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS np,
        |    CAST(SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END)
        |      AS BIGINT) AS ng
        |  FROM documents WHERE doc_id % 2 = 0 GROUP BY 1),
        |gb AS (
        |  SELECT n_chars AS s,
        |    CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS np,
        |    CAST(SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END)
        |      AS BIGINT) AS ng
        |  FROM documents WHERE doc_id % 2 = 1 GROUP BY 1),
        |g AS (
        |  SELECT s, CAST(SUM(np) AS BIGINT) AS np,
        |    CAST(SUM(ng) AS BIGINT) AS ng
        |  FROM (SELECT * FROM ga UNION ALL SELECT * FROM gb)
        |  GROUP BY 1),
        |c AS (
        |  SELECT np, ng, CAST(COALESCE(SUM(ng) OVER (ORDER BY s
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS BIGINT) AS neg_below
        |  FROM g),
        |t AS (
        |  SELECT CAST(SUM(np) AS BIGINT) AS n_pos,
        |    CAST(SUM(ng) AS BIGINT) AS n_neg,
        |    CAST(SUM(np * neg_below) AS BIGINT) AS win_pairs,
        |    CAST(SUM(np * ng) AS BIGINT) AS tie_pairs
        |  FROM c)
        |SELECT n_pos, n_neg, win_pairs, tie_pairs,
        |  CASE WHEN n_pos > 0 AND n_neg > 0 THEN
        |    CAST((2 * win_pairs + tie_pairs) * 1000000
        |      // (2 * n_pos * n_neg) AS BIGINT) END AS auc_micro
        |FROM t""".stripMargin),
    // exact average precision of event value ranking purchases (score
    // desc, event_id tiebreak) over a bounded user slice — the
    // PR-curve area as eval harnesses compute it, double-floored
    ("eval_avg_precision",
      ((s, dir) => {
      val e = events(s, dir)
        .filter(col("user_id") < 200 && col("value").isNotNull)
        .select(col("event_id").as("id"), col("value").as("s"),
          (col("event_type") === "purchase").as("y"))
      EvalMetrics.averagePrecision(e, "id", "s", "y")
    }),
      """WITH e AS (
        |  SELECT event_id AS id, value AS s,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS p
        |  FROM events WHERE user_id < 200 AND value IS NOT NULL),
        |r AS (
        |  SELECT p,
        |    CAST(ROW_NUMBER() OVER (ORDER BY s DESC, id) AS BIGINT)
        |      AS k,
        |    CAST(SUM(p) OVER (ORDER BY s DESC, id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS tp
        |  FROM e)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(p) AS BIGINT) AS n_pos,
        |  CASE WHEN SUM(p) > 0 THEN
        |    CAST(CAST(SUM(CASE WHEN p = 1
        |        THEN tp * 1000000 // k ELSE 0 END) AS BIGINT)
        |      // CAST(SUM(p) AS BIGINT) AS BIGINT) END AS ap_micro
        |FROM r""".stripMargin),
    // multiclass confusion of the source-majority language baseline
    // against the true lang: per-class tp/fp/fn and exact micro
    // precision/recall/F1 — never-predicted classes surface with null
    // precision instead of vanishing
    ("eval_confusion",
      ((s, dir) => {
      val d = docs(s, dir)
      val joined = d.select(col("doc_id"), col("source"),
          col("lang").as("actual"))
        .join(sourceMajority(d), Seq("source"))
      EvalMetrics.confusion(joined, "actual", "pred")
    }),
      s"""WITH $sourceMajoritySql,
        |cells AS (
        |  SELECT d.lang AS a, maj.pred AS g,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM documents d JOIN maj ON d.source = maj.source
        |  GROUP BY 1, 2),
        |act AS (SELECT a AS label, CAST(SUM(n) AS BIGINT) AS n_actual
        |        FROM cells GROUP BY 1),
        |prd AS (SELECT g AS label, CAST(SUM(n) AS BIGINT) AS n_pred
        |        FROM cells GROUP BY 1),
        |tp AS (SELECT a AS label, n AS tp FROM cells WHERE a = g),
        |m AS (
        |  SELECT COALESCE(act.label, prd.label) AS label,
        |    COALESCE(n_actual, 0) AS n_actual,
        |    COALESCE(n_pred, 0) AS n_pred,
        |    COALESCE(tp.tp, 0) AS tp
        |  FROM act FULL OUTER JOIN prd ON act.label = prd.label
        |  LEFT JOIN tp ON COALESCE(act.label, prd.label) = tp.label)
        |SELECT label, n_actual, n_pred, tp,
        |  n_pred - tp AS fp, n_actual - tp AS fn,
        |  CASE WHEN n_pred > 0
        |    THEN CAST(tp * 1000000 // n_pred AS BIGINT)
        |    END AS precision_micro,
        |  CASE WHEN n_actual > 0
        |    THEN CAST(tp * 1000000 // n_actual AS BIGINT)
        |    END AS recall_micro,
        |  CASE WHEN 2 * tp + (n_pred - tp) + (n_actual - tp) > 0
        |    THEN CAST(2 * tp * 1000000
        |      // (2 * tp + (n_pred - tp) + (n_actual - tp)) AS BIGINT)
        |    END AS f1_micro
        |FROM m""".stripMargin),
    // McNemar's paired test: does the source-majority baseline (B)
    // beat a crude length rule (A: >= 300 chars means English) on the
    // SAME documents, judged from the discordant pairs alone — the
    // closed-form cross-check of the paired bootstrap delta gate
    ("eval_mcnemar",
      ((s, dir) => {
      val d = docs(s, dir)
      val paired = d.select(col("doc_id"), col("source"),
          col("lang"), col("n_chars"))
        .join(sourceMajority(d), Seq("source"))
        .select(
          ((col("n_chars") >= 300) === (col("lang") === "en")).as("a"),
          (col("pred") === col("lang")).as("b"))
      EvalMetrics.mcnemarPaired(paired, "a", "b")
    }),
      s"""WITH $sourceMajoritySql,
        |p AS (
        |  SELECT ((d.n_chars >= 300) = (d.lang = 'en')) AS a,
        |    (maj.pred = d.lang) AS b
        |  FROM documents d JOIN maj ON d.source = maj.source),
        |agg AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT)
        |      AS both_right,
        |    CAST(SUM(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END)
        |      AS BIGINT) AS both_wrong,
        |    CAST(SUM(CASE WHEN a AND NOT b THEN 1 ELSE 0 END)
        |      AS BIGINT) AS a_only,
        |    CAST(SUM(CASE WHEN NOT a AND b THEN 1 ELSE 0 END)
        |      AS BIGINT) AS b_only
        |  FROM p)
        |SELECT n, both_right, both_wrong, a_only, b_only,
        |  CASE WHEN a_only + b_only > 0 THEN
        |    CAST((ABS(a_only - b_only) - 1) * (ABS(a_only - b_only) - 1)
        |      * 1000000 // (a_only + b_only) AS BIGINT) END AS chi2_micro
        |FROM agg""".stripMargin),
    // pass@k (k=3) per user-as-task: n = events, c = purchases — the
    // unbiased 1 - C(n-c,k)/C(n,k) estimator as one integer division
    // of unrolled products; users with n < k are excluded
    ("eval_pass_at_k",
      ((s, dir) => {
      val e = events(s, dir).filter(col("user_id") < 100)
        .select(col("user_id").as("task"),
          (col("event_type") === "purchase").as("ok"))
      EvalMetrics.passAtK(e, "task", "ok", k = 3)
    }),
      """WITH t AS (
        |  SELECT user_id AS task, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
        |      END) AS BIGINT) AS c
        |  FROM events WHERE user_id < 100 GROUP BY 1)
        |SELECT task, n, c,
        |  CASE WHEN n - c < 3 THEN CAST(1000000 AS BIGINT)
        |    ELSE CAST(1000000 - (n - c) * (n - c - 1) * (n - c - 2)
        |      * 1000000 // (n * (n - 1) * (n - 2)) AS BIGINT)
        |    END AS pass_micro
        |FROM t WHERE n >= 3""".stripMargin),
    // Krippendorff's alpha (nominal, complete 5-rater panels): rater =
    // user_id mod 5, item = day, label = the rater-group's canonical
    // (argmax-cents, event_id tiebreak) event type that day — the
    // many-rater generalization of the two kappa gates
    ("eval_krippendorff",
      ((s, dir) => {
      val e = events(s, dir)
        .withColumn("day",
          date_format(col("ts").cast("timestamp"), "yyyy-MM-dd"))
        .withColumn("cents", round(col("value") * 100).cast("long"))
        .filter(col("cents").isNotNull)
        .withColumn("rater", pmod(col("user_id"), lit(5)))
      val canon = e.groupBy(col("day"), col("rater"))
        .agg(min(struct((-col("cents")).as("nc"), col("event_id"),
          col("event_type").as("et"))).as("hi"))
        .select(col("day").as("item"), col("rater"),
          col("hi.et").as("lab"))
      EvalMetrics.krippendorffAlpha(canon, "item", "rater", "lab", m = 5)
    }),
      """WITH e AS (
        |  SELECT user_id % 5 AS rater, event_id, event_type,
        |    CAST(ROUND(value * 100) AS BIGINT) AS cents,
        |    strftime(ts, '%Y-%m-%d') AS day
        |  FROM events WHERE value IS NOT NULL),
        |canon AS (
        |  SELECT day AS item, rater, event_type AS lab FROM (
        |    SELECT day, rater, event_type,
        |      ROW_NUMBER() OVER (PARTITION BY day, rater
        |        ORDER BY cents DESC, event_id) AS rn
        |    FROM e)
        |  WHERE rn = 1),
        |nic AS (
        |  SELECT item, lab, CAST(COUNT(*) AS BIGINT) AS nic
        |  FROM canon GROUP BY 1, 2),
        |keep AS (SELECT item FROM nic GROUP BY item
        |         HAVING SUM(nic) = 5),
        |k AS (SELECT nic.* FROM nic JOIN keep USING (item)),
        |base AS (
        |  SELECT CAST(COUNT(DISTINCT item) AS BIGINT) AS n_items,
        |    CAST(COALESCE(SUM(nic * (5 - nic)), 0) AS BIGINT) AS do_num
        |  FROM k),
        |marg AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_categories,
        |    CAST(COALESCE(SUM(tc * (b.n_items * 5 - tc)), 0) AS BIGINT)
        |      AS de_num
        |  FROM (SELECT lab, CAST(SUM(nic) AS BIGINT) AS tc
        |        FROM k GROUP BY 1), base b
        |  GROUP BY b.n_items),
        |micro AS (
        |  SELECT b.n_items, CAST(5 AS BIGINT) AS m, m2.n_categories,
        |    CAST(b.do_num * 1000000 // (b.n_items * 5 * 4) AS BIGINT)
        |      AS do_micro,
        |    CAST(m2.de_num * 1000000
        |      // ((b.n_items * 5) * (b.n_items * 5 - 1)) AS BIGINT)
        |      AS de_micro
        |  FROM base b, marg m2)
        |SELECT n_items, m, n_categories, do_micro, de_micro,
        |  CASE WHEN de_micro > 0 THEN
        |    CAST(1000000 - do_micro * 1000000 // de_micro AS BIGINT)
        |    END AS alpha_micro
        |FROM micro""".stripMargin),
    // Benford first-digit audit over lineitem amounts in exact cents —
    // the fabricated-data / broken-ETL smell test; expectations are
    // hardcoded micro constants identical on both sides
    ("dq_benford",
      ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
        .withColumn("v", round(col("l_extendedprice") * 100).cast("long"))
      DataChecks.benford(li, "v")
    }),
      """WITH v AS (
        |  SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS v
        |  FROM lineitem),
        |d AS (
        |  SELECT CASE WHEN v > 0 THEN
        |    CAST(substr(CAST(v AS VARCHAR), 1, 1) AS INT) END AS digit
        |  FROM v),
        |c AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d
        |      WHERE digit IS NOT NULL GROUP BY 1),
        |sk AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_skipped FROM d
        |       WHERE digit IS NULL),
        |e(digit, expected_micro) AS (VALUES
        |  (1, 301029), (2, 176091), (3, 124938), (4, 96910),
        |  (5, 79181), (6, 66946), (7, 57991), (8, 51152), (9, 45757)),
        |t AS (SELECT CAST(GREATEST(SUM(n), 1) AS BIGINT) AS tot FROM c)
        |SELECT CAST(e.digit AS INT) AS digit,
        |  COALESCE(c.n, 0) AS n,
        |  CAST(COALESCE(c.n, 0) * 1000000 // t.tot AS BIGINT)
        |    AS observed_micro,
        |  CAST(e.expected_micro AS BIGINT) AS expected_micro,
        |  CAST(COALESCE(c.n, 0) * 1000000 // t.tot - e.expected_micro
        |    AS BIGINT) AS dev_micro,
        |  sk.n_skipped
        |FROM e LEFT JOIN c ON c.digit = e.digit, t, sk""".stripMargin),
    // multi-source BFS hop distances over the customer-supplier
    // purchase graph (the g1 edge list), seeded at nation-0 suppliers,
    // horizon 3 — blast-radius proximity; the oracle unrolls the three
    // min-hop rounds as chained CTEs
    ("g7_bfs_distances",
      ((s, dir) => {
      val e = s.read.parquet(s"$dir/orders.parquet")
        .join(s.read.parquet(s"$dir/lineitem.parquet"),
          col("o_orderkey") === col("l_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst"))
        .distinct()
      val seeds = s.read.parquet(s"$dir/supplier.parquet")
        .filter(col("s_nationkey") === 0)
        .select(concat(lit("s"), col("s_suppkey")).as("v"))
      Graph.bfsDistances(e, seeds, maxHops = 3)
    }),
      """WITH e AS (
        |  SELECT DISTINCT 'c' || o_custkey AS src,
        |    's' || l_suppkey AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |dir AS (
        |  SELECT src, dst FROM e
        |  UNION ALL SELECT dst AS src, src AS dst FROM e),
        |d0 AS (
        |  SELECT DISTINCT 's' || s_suppkey AS v, CAST(0 AS BIGINT)
        |    AS dist
        |  FROM supplier WHERE s_nationkey = 0),
        |d1 AS (
        |  SELECT v, CAST(MIN(dist) AS BIGINT) AS dist FROM (
        |    SELECT v, dist FROM d0
        |    UNION ALL
        |    SELECT dir.dst AS v, d0.dist + 1 AS dist
        |    FROM dir JOIN d0 ON dir.src = d0.v) GROUP BY v),
        |d2 AS (
        |  SELECT v, CAST(MIN(dist) AS BIGINT) AS dist FROM (
        |    SELECT v, dist FROM d1
        |    UNION ALL
        |    SELECT dir.dst AS v, d1.dist + 1 AS dist
        |    FROM dir JOIN d1 ON dir.src = d1.v) GROUP BY v),
        |d3 AS (
        |  SELECT v, CAST(MIN(dist) AS BIGINT) AS dist FROM (
        |    SELECT v, dist FROM d2
        |    UNION ALL
        |    SELECT dir.dst AS v, d2.dist + 1 AS dist
        |    FROM dir JOIN d2 ON dir.src = d2.v) GROUP BY v)
        |SELECT v, dist FROM d3""".stripMargin),
    // chi-square independence cells for order status x priority: the
    // full margin cross-product with exact integer milli-unit
    // expectations, deviations and cell contributions (the caller sums
    // term_milli — an integer sum, safe across rows). The oracle's
    // deviation division is sign-split because Spark's div truncates
    // toward zero while DuckDB's // floors
    ("st_chi2_cells",
      ((s, dir) => {
      Stats.chiSquareCells(s.read.parquet(s"$dir/orders.parquet"),
        "o_orderstatus", "o_orderpriority")
    }),
      """WITH cells AS (
        |  SELECT o_orderstatus AS a, o_orderpriority AS b,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM orders GROUP BY 1, 2),
        |ra AS (SELECT a, CAST(SUM(n) AS BIGINT) AS rt FROM cells
        |       GROUP BY 1),
        |cb AS (SELECT b, CAST(SUM(n) AS BIGINT) AS ct FROM cells
        |       GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM cells),
        |x AS (
        |  SELECT ra.a, cb.b, CAST(COALESCE(cells.n, 0) AS BIGINT)
        |      AS n_obs,
        |    ra.rt, cb.ct, tot.nn,
        |    (COALESCE(cells.n, 0) * tot.nn - ra.rt * cb.ct) * 1000
        |      AS devnum
        |  FROM ra CROSS JOIN cb
        |  LEFT JOIN cells ON cells.a = ra.a AND cells.b = cb.b, tot),
        |y AS (
        |  SELECT a, b, n_obs, rt, ct,
        |    CAST(rt * ct * 1000 // nn AS BIGINT) AS e_milli,
        |    CAST(CASE WHEN devnum >= 0 THEN devnum // nn
        |      ELSE -((-devnum) // nn) END AS BIGINT) AS dev_milli
        |  FROM x)
        |SELECT a, b, n_obs, rt, ct, e_milli, dev_milli,
        |  CASE WHEN e_milli > 0 THEN
        |    CAST(dev_milli * dev_milli // e_milli AS BIGINT)
        |    END AS term_milli
        |FROM y""".stripMargin),
    // two-sample Kolmogorov-Smirnov: max CDF gap (micros) of document
    // length split by English vs not, plus the smallest length where
    // the max is reached — the best single-threshold separation the
    // eval_auc gate's score admits
    ("st_ks",
      ((s, dir) => {
      val d = docs(s, dir).select(col("n_chars").as("s"),
        (col("lang") === "en").as("y"))
      Stats.ksStatistic(d, "s", "y")
    }),
      """WITH g AS (
        |  SELECT n_chars AS s,
        |    CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS np,
        |    CAST(SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END)
        |      AS BIGINT) AS ng
        |  FROM documents GROUP BY 1),
        |c AS (
        |  SELECT s,
        |    CAST(SUM(np) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_p,
        |    CAST(SUM(ng) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_g
        |  FROM g),
        |t AS (SELECT CAST(SUM(np) AS BIGINT) AS n_pos,
        |             CAST(SUM(ng) AS BIGINT) AS n_neg FROM g),
        |gap AS (
        |  SELECT c.s, ABS(cum_p * 1000000 // t.n_pos
        |    - cum_g * 1000000 // t.n_neg) AS gap
        |  FROM c, t),
        |mx AS (SELECT CAST(MAX(gap) AS BIGINT) AS ks_micro FROM gap)
        |SELECT t.n_pos, t.n_neg, mx.ks_micro,
        |  CAST((SELECT MIN(s) FROM gap WHERE gap.gap = mx.ks_micro)
        |    AS BIGINT) AS ks_at_score
        |FROM t, mx""".stripMargin),
    // decile gains/lift of event value predicting purchases over the
    // same bounded slice as eval_avg_precision: cumulative capture of
    // positives and per-bucket lift, all exact integer micros
    ("st_gains",
      ((s, dir) => {
      val e = events(s, dir)
        .filter(col("user_id") < 200 && col("value").isNotNull)
        .select(col("event_id").as("id"), col("value").as("s"),
          (col("event_type") === "purchase").as("y"))
      Stats.gainsDeciles(e, "id", "s", "y", buckets = 10)
    }),
      """WITH e AS (
        |  SELECT event_id AS id, value AS s,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS p
        |  FROM events WHERE user_id < 200 AND value IS NOT NULL),
        |r AS (
        |  SELECT p,
        |    CAST(ROW_NUMBER() OVER (ORDER BY s DESC, id) AS BIGINT)
        |      AS rk,
        |    CAST(COUNT(*) OVER () AS BIGINT) AS nn
        |  FROM e),
        |g AS (
        |  SELECT (rk * 10 - 1) // nn AS bucket,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(p) AS BIGINT) AS n_pos
        |  FROM r GROUP BY 1),
        |t AS (SELECT CAST(SUM(n) AS BIGINT) AS tn,
        |             CAST(SUM(n_pos) AS BIGINT) AS tp FROM g),
        |c AS (
        |  SELECT bucket, n, n_pos,
        |    CAST(SUM(n_pos) OVER (ORDER BY bucket ROWS BETWEEN
        |      UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum_pos
        |  FROM g)
        |SELECT CAST(c.bucket AS INT) AS bucket, c.n, c.n_pos,
        |  c.cum_pos,
        |  CAST(cum_pos * 1000000 // t.tp AS BIGINT) AS capture_micro,
        |  CAST((n_pos * t.tn) * 1000000 // (n * t.tp) AS BIGINT)
        |    AS lift_micro
        |FROM c, t""".stripMargin),
    // Brier score of a length-derived micro-probability of English
    // (least(n_chars*2000, 1e6)) — the proper-scoring companion to the
    // ECE gate, exact integer MSE in micro units
    ("st_brier",
      ((s, dir) => {
      val d = docs(s, dir).select(
        least(col("n_chars") * 2000, lit(1000000L)).cast("long")
          .as("sm"),
        (col("lang") === "en").as("y"))
      Stats.brierScore(d, "sm", "y")
    }),
      """WITH d AS (
        |  SELECT LEAST(n_chars * 2000, 1000000) AS sm,
        |    CASE WHEN lang = 'en' THEN 1000000 ELSE 0 END AS ym
        |  FROM documents)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(CAST(SUM((sm - ym) * (sm - ym)) AS BIGINT)
        |    // (COUNT(*) * 1000000) AS BIGINT) AS brier_micro
        |FROM d""".stripMargin),
    // per-category Shannon entropy terms of the document language mix
    // (micros + one rounded ln per row, the psi_term discipline) —
    // the diversity dashboard number for a corpus snapshot
    ("st_entropy",
      ((s, dir) => {
      Stats.categoricalEntropy(docs(s, dir), "lang")
    }),
      """WITH c AS (
        |  SELECT lang AS category, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM documents GROUP BY 1),
        |t AS (SELECT CAST(GREATEST(SUM(n), 1) AS BIGINT) AS tt FROM c)
        |SELECT category, n,
        |  CAST(n * 1000000 // t.tt AS BIGINT) AS p_micro,
        |  ROUND(-(CAST(n AS DOUBLE) / t.tt)
        |    * LN(CAST(n AS DOUBLE) / t.tt), 6) AS h_term
        |FROM c, t""".stripMargin),
    // mutual-information cells between language and source: is the
    // corpus mix source-skewed by language? Integer micro shares, one
    // rounded ln per observed cell (the pmiBigrams discipline)
    ("st_mi_cells",
      ((s, dir) => {
      Stats.mutualInformationCells(docs(s, dir), "lang", "source")
    }),
      """WITH cells AS (
        |  SELECT lang AS a, source AS b,
        |    CAST(COUNT(*) AS BIGINT) AS n_ab
        |  FROM documents GROUP BY 1, 2),
        |ma AS (SELECT a, CAST(SUM(n_ab) AS BIGINT) AS n_a FROM cells
        |       GROUP BY 1),
        |mb AS (SELECT b, CAST(SUM(n_ab) AS BIGINT) AS n_b FROM cells
        |       GROUP BY 1),
        |t AS (SELECT CAST(SUM(n_ab) AS BIGINT) AS nn FROM cells)
        |SELECT c.a, c.b, c.n_ab, ma.n_a, mb.n_b,
        |  CAST(c.n_ab * 1000000 // t.nn AS BIGINT) AS p_micro,
        |  ROUND((CAST(c.n_ab AS DOUBLE) / t.nn)
        |    * LN((CAST(c.n_ab AS DOUBLE) * t.nn)
        |      / (CAST(ma.n_a AS DOUBLE) * mb.n_b)), 6) AS mi_term
        |FROM cells c JOIN ma ON c.a = ma.a JOIN mb ON c.b = mb.b,
        |  t""".stripMargin),
    // t-closeness (the third anonymity rung after priv_kanon and
    // priv_ldiv): per (nation, balance-band) class, the total-variation
    // distance between its market-segment mix and the table's, exact
    // integer micros with the missing-value mass added through the
    // actual micro-share total (not 1e6 — floors)
    ("priv_tclose",
      ((s, dir) => {
      val c = s.read.parquet(s"$dir/customer.parquet")
        .withColumn("bal_band",
          floor(col("c_acctbal") / 1000).cast("long"))
      graft.operators.Privacy.tClosenessByClass(
        c, Seq("c_nationkey", "bal_band"), "c_mktsegment")
    }),
      """WITH c AS (
        |  SELECT c_nationkey,
        |    CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_band,
        |    c_mktsegment
        |  FROM customer),
        |cells AS (
        |  SELECT c_nationkey, bal_band, c_mktsegment,
        |    CAST(COUNT(*) AS BIGINT) AS n_cv
        |  FROM c GROUP BY 1, 2, 3),
        |g AS (SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS g_v
        |      FROM c GROUP BY 1),
        |gt AS (
        |  SELECT c_mktsegment,
        |    CAST(g_v * 1000000 // (SELECT CAST(SUM(g_v) AS BIGINT)
        |      FROM g) AS BIGINT) AS pg_micro
        |  FROM g),
        |gtt AS (SELECT CAST(SUM(pg_micro) AS BIGINT) AS tot_pg FROM gt),
        |cl AS (
        |  SELECT c_nationkey, bal_band, CAST(SUM(n_cv) AS BIGINT)
        |    AS n_c
        |  FROM cells GROUP BY 1, 2),
        |j AS (
        |  SELECT cells.c_nationkey, cells.bal_band, cl.n_c,
        |    CAST(cells.n_cv * 1000000 // cl.n_c AS BIGINT) AS pc_micro,
        |    gt.pg_micro
        |  FROM cells
        |  JOIN cl USING (c_nationkey, bal_band)
        |  JOIN gt USING (c_mktsegment))
        |SELECT c_nationkey, bal_band,
        |  CAST(MIN(n_c) AS BIGINT) AS class_size,
        |  CAST((CAST(SUM(ABS(pc_micro - pg_micro)) AS BIGINT)
        |    + (gtt.tot_pg - CAST(SUM(pg_micro) AS BIGINT))) // 2
        |    AS BIGINT) AS tv_micro
        |FROM j, gtt
        |GROUP BY c_nationkey, bal_band, gtt.tot_pg""".stripMargin),
    // Cochran's Q over three is-it-English classifiers on the SAME
    // documents (length rule, source-majority, a parity coin) — the
    // k-system generalization of eval_mcnemar, all integer
    ("st_cochran_q",
      ((s, dir) => {
      val d = docs(s, dir)
      val sys3 = d.select(col("source"), col("lang"), col("n_chars"))
        .join(sourceMajority(d), Seq("source"))
        .select(
          ((col("n_chars") >= 300) === (col("lang") === "en")).as("sa"),
          ((col("pred") === "en") === (col("lang") === "en")).as("sb"),
          ((pmod(col("n_chars"), lit(2)) === 0) ===
            (col("lang") === "en")).as("sc"))
      Stats.cochranQ(sys3, Seq("sa", "sb", "sc"))
    }),
      s"""WITH $sourceMajoritySql,
        |p AS (
        |  SELECT
        |    CASE WHEN (d.n_chars >= 300) = (d.lang = 'en')
        |      THEN 1 ELSE 0 END AS xa,
        |    CASE WHEN (maj.pred = 'en') = (d.lang = 'en')
        |      THEN 1 ELSE 0 END AS xb,
        |    CASE WHEN (d.n_chars % 2 = 0) = (d.lang = 'en')
        |      THEN 1 ELSE 0 END AS xc
        |  FROM documents d JOIN maj ON d.source = maj.source),
        |a AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
        |    CAST(SUM(xa) AS BIGINT) AS ga,
        |    CAST(SUM(xb) AS BIGINT) AS gb,
        |    CAST(SUM(xc) AS BIGINT) AS gc,
        |    CAST(SUM(xa + xb + xc) AS BIGINT) AS sum_l,
        |    CAST(SUM((xa + xb + xc) * (xa + xb + xc)) AS BIGINT)
        |      AS sum_l_sq
        |  FROM p)
        |SELECT n_items, CAST(3 AS BIGINT) AS k, sum_l, sum_l_sq,
        |  ga * ga + gb * gb + gc * gc AS sum_g_sq,
        |  CASE WHEN 3 * sum_l - sum_l_sq > 0 THEN
        |    CAST(2 * (3 * (ga * ga + gb * gb + gc * gc)
        |      - sum_l * sum_l) * 1000000 // (3 * sum_l - sum_l_sq)
        |      AS BIGINT) END AS q_micro
        |FROM a""".stripMargin),
    // additive seasonal decomposition of the daily event count
    // (period 7): centered moving-average trend, per-weekday-phase
    // seasonal mean, remainder — all exact integer milli units; the
    // oracle replays the same window and the sign-split division
    ("ts_seasonal",
      ((s, dir) => {
      val daily = events(s, dir)
        .withColumn("d", to_date(col("ts").cast("timestamp")))
        .groupBy(col("d")).agg(count(lit(1)).as("n"))
      graft.operators.TimeSeries.seasonalDecompose(daily, period = 7)
        .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
          col("n"), col("phase"), col("trend_milli"),
          col("seasonal_milli"), col("remainder_milli"))
    }),
      """WITH daily AS (
        |  SELECT strftime(ts, '%Y-%m-%d') AS day,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1),
        |w AS (
        |  SELECT day, n,
        |    CAST((CAST(day AS DATE) - DATE '1970-01-01') % 7
        |      AS BIGINT) AS phase,
        |    COUNT(*) OVER win AS wn,
        |    CAST(SUM(n * 1000) OVER win AS BIGINT) AS wsum
        |  FROM daily
        |  WINDOW win AS (ORDER BY day
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |b AS (
        |  SELECT day, n, phase,
        |    CASE WHEN wn = 7 THEN wsum // 7 END AS trend_milli
        |  FROM w),
        |b2 AS (
        |  SELECT *, CASE WHEN trend_milli IS NOT NULL
        |    THEN n * 1000 - trend_milli END AS detr
        |  FROM b),
        |s AS (
        |  SELECT phase, CAST(SUM(detr) AS BIGINT) AS sd,
        |    CAST(COUNT(detr) AS BIGINT) AS cd
        |  FROM b2 WHERE detr IS NOT NULL GROUP BY 1),
        |s2 AS (
        |  SELECT phase, CAST(CASE WHEN sd >= 0 THEN sd // cd
        |    ELSE -((-sd) // cd) END AS BIGINT) AS seasonal_milli
        |  FROM s)
        |SELECT b2.day, b2.n, b2.phase, b2.trend_milli,
        |  s2.seasonal_milli,
        |  b2.detr - s2.seasonal_milli AS remainder_milli
        |FROM b2 LEFT JOIN s2 USING (phase)""".stripMargin),
    // Spearman rank correlation between event value and arrival time
    // over a bounded slice — tie-free via the (value, event_id) /
    // (ts, event_id) total orders, so the exact 1 - 6*sum(d^2)/n(n^2-1)
    // closed form holds, one integer floor
    ("st_spearman",
      ((s, dir) => {
      val e = events(s, dir)
        .filter(col("user_id") < 75 && col("value").isNotNull)
        .select(col("event_id").as("id"), col("value").as("x"),
          col("ts").as("y"))
      Stats.spearman(e, "id", "x", "y")
    }),
      """WITH e AS (
        |  SELECT event_id AS id, value AS x, ts AS y
        |  FROM events WHERE user_id < 75 AND value IS NOT NULL),
        |r AS (
        |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY x, id) AS BIGINT)
        |      AS rx,
        |    CAST(ROW_NUMBER() OVER (ORDER BY y, id) AS BIGINT) AS ry
        |  FROM e),
        |a AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM((rx - ry) * (rx - ry)) AS BIGINT) AS sum_d_sq
        |  FROM r)
        |SELECT n, sum_d_sq,
        |  CASE WHEN n >= 2 THEN CAST(1000000
        |    - 6 * sum_d_sq * 1000000 // (n * (n * n - 1)) AS BIGINT)
        |    END AS rho_micro
        |FROM a""".stripMargin),
    // column profile snapshot of the events table (string, key, and
    // free-text columns — doubles excluded on purpose: float-to-string
    // rendering is engine-specific): row/null/distinct counts and the
    // modal value per column
    ("dq_profile",
      ((s, dir) => {
      DataChecks.profile(events(s, dir),
        Seq("event_type", "user_id", "props"))
    }),
      Seq("event_type", "user_id", "props").map { c =>
        s"""SELECT '$c' AS column_name,
          |  CAST(COUNT(*) AS BIGINT) AS n_rows,
          |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END)
          |    AS BIGINT) AS n_null,
          |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
          |  (SELECT v FROM (
          |     SELECT CAST($c AS VARCHAR) AS v, COUNT(*) AS n
          |     FROM events WHERE $c IS NOT NULL GROUP BY 1
          |     ORDER BY n DESC, v LIMIT 1)) AS top_value,
          |  CAST((SELECT n FROM (
          |     SELECT CAST($c AS VARCHAR) AS v, COUNT(*) AS n
          |     FROM events WHERE $c IS NOT NULL GROUP BY 1
          |     ORDER BY n DESC, v LIMIT 1)) AS BIGINT) AS top_n
          |FROM events""".stripMargin
      }.mkString("", "\nUNION ALL\n", "")))

  val queries: Map[String, Q] =
    gated.map(g => (g._1, g._2)).toMap

  val oracles: Map[String, String] =
    gated.map(g => (g._1, g._3)).toMap
}

package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.operators.{Collocations, DataChecks, EvalMetrics, Graph, Stats}

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

  /** Moments finalize chain continuing from an `r(x HUGEINT)` CTE —
    * power sums exact in HUGEINT; the finalize mirrors Spark's
    * IEEE-double chain op for op (only exactly-rounded ops — +, −,
    * ×, ÷, sqrt, floor). Shared by `st_moments`, `st_moments_merge`,
    * and the streaming `s5d_moments_monitor` gate. */
  private[graft] val momentsChainFromR =
    """p AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(x) AS s1,
      |    SUM(x * x) AS s2, SUM(x * x * x) AS s3,
      |    SUM(x * x * x * x) AS s4
      |  FROM r),
      |d AS (
      |  SELECT n,
      |    CASE WHEN n > 0 THEN CASE WHEN s1 >= 0
      |      THEN CAST(s1 * 1000000 // n AS BIGINT)
      |      ELSE -CAST((-s1) * 1000000 // n AS BIGINT) END END
      |      AS mean_micro,
      |    CAST(n AS DOUBLE) AS nd, CAST(s1 AS DOUBLE) AS d1,
      |    CAST(s2 AS DOUBLE) AS d2, CAST(s3 AS DOUBLE) AS d3,
      |    CAST(s4 AS DOUBLE) AS d4
      |  FROM p),
      |c AS (
      |  SELECT *, nd * d2 - d1 * d1 AS nm2,
      |    nd * nd * d3 - 3 * nd * d2 * d1 + 2 * d1 * d1 * d1 AS n2m3,
      |    nd * nd * nd * d4 - 4 * nd * nd * d3 * d1
      |      + 6 * nd * d2 * d1 * d1 - 3 * d1 * d1 * d1 * d1 AS n3m4
      |  FROM d)
      |SELECT n, mean_micro,
      |  CASE WHEN n >= 2 THEN CAST(FLOOR(nm2 / nd) AS BIGINT) END
      |    AS m2,
      |  CASE WHEN nm2 > 0 AND n >= 2 THEN
      |    CAST(FLOOR(1000 * n2m3 / (nm2 * SQRT(nm2))) AS BIGINT) END
      |    AS skew_milli,
      |  CASE WHEN nm2 > 0 AND n >= 2 THEN
      |    CAST(FLOOR(1000 * n3m4 / (nm2 * nm2)) - 3000 AS BIGINT) END
      |    AS kurt_excess_milli
      |FROM c""".stripMargin

  /** Whole-corpus document-length moments SQL (st_moments /
    * st_moments_merge). */
  private val momentsOracleSql =
    "WITH r AS (\n" +
      "  SELECT CAST(n_chars AS HUGEINT) AS x FROM documents\n" +
      "  WHERE n_chars IS NOT NULL),\n" +
      momentsChainFromR

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
    // CUSUM level-shift scan over the daily event count: cumulative
    // deviations from the whole-series milli-floored mean, peak day
    // flagged (earliest on ties) — all integer, both engines replay
    // the same running sum
    ("ts_changepoint",
      ((s, dir) => {
      val daily = events(s, dir)
        .withColumn("d", to_date(col("ts").cast("timestamp")))
        .groupBy(col("d")).agg(count(lit(1)).as("n"))
      graft.operators.TimeSeries.cusumChangepoint(daily)
        .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
          col("n"), col("dev_milli"), col("cusum_milli"),
          col("is_peak"))
    }),
      """WITH daily AS (
        |  SELECT strftime(ts, '%Y-%m-%d') AS day,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1),
        |t AS (
        |  SELECT day, n,
        |    CAST(SUM(n) OVER () AS BIGINT) AS s,
        |    CAST(COUNT(*) OVER () AS BIGINT) AS c
        |  FROM daily),
        |d AS (
        |  SELECT day, n,
        |    n * 1000 - (CASE WHEN s >= 0 THEN s * 1000 // c
        |      ELSE -((-s) * 1000 // c) END) AS dev_milli
        |  FROM t),
        |cu AS (
        |  SELECT day, n, CAST(dev_milli AS BIGINT) AS dev_milli,
        |    CAST(SUM(dev_milli) OVER (ORDER BY day) AS BIGINT)
        |      AS cusum_milli
        |  FROM d),
        |pk AS (
        |  SELECT day AS peak_day FROM cu
        |  ORDER BY ABS(cusum_milli) DESC, day LIMIT 1)
        |SELECT cu.day, cu.n, cu.dev_milli, cu.cusum_milli,
        |  cu.day = pk.peak_day AS is_peak
        |FROM cu, pk""".stripMargin),
    // lag-1 and lag-7 autocorrelation of the daily event count —
    // persistence and weekly seasonality in one report; exact integer
    // sums-of-products, floor(sqrt) denominators (the groupAdvantage
    // discipline), day-shift equi-join (no window at all)
    ("ts_autocorr",
      ((s, dir) => {
      val daily = events(s, dir)
        .withColumn("d", to_date(col("ts").cast("timestamp")))
        .groupBy(col("d")).agg(count(lit(1)).as("n"))
      graft.operators.TimeSeries.autocorrelation(daily, Seq(1, 7))
    }),
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1),
        |lags AS (SELECT UNNEST([1, 7]) AS lag),
        |p AS (
        |  SELECT lags.lag, a.n AS x, b.n AS y
        |  FROM lags, daily a, daily b
        |  WHERE date_diff('day', a.d, b.d) = lags.lag),
        |agg AS (
        |  SELECT lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |    SUM(CAST(x AS HUGEINT) * y) AS sxy,
        |    SUM(CAST(x AS HUGEINT) * x) AS sxx,
        |    SUM(CAST(y AS HUGEINT) * y) AS syy
        |  FROM p GROUP BY 1),
        |aggl AS (
        |  -- left-join the lag list so a lag with ZERO pairs (series
        |  -- shorter than the lag) still emits a (lag, 0, NULL) row,
        |  -- matching Spark's per-lag global aggregate
        |  SELECT lags.lag,
        |    CAST(COALESCE(agg.n_pairs, 0) AS BIGINT) AS n_pairs,
        |    agg.sx, agg.sy, agg.sxy, agg.sxx, agg.syy
        |  FROM lags LEFT JOIN agg ON lags.lag = agg.lag),
        |m AS (
        |  SELECT lag, n_pairs,
        |    CAST(n_pairs AS HUGEINT) * sxy
        |      - CAST(sx AS HUGEINT) * sy AS num,
        |    CAST(CAST(n_pairs AS HUGEINT) * sxx
        |      - CAST(sx AS HUGEINT) * sx AS BIGINT) AS dx,
        |    CAST(CAST(n_pairs AS HUGEINT) * syy
        |      - CAST(sy AS HUGEINT) * sy AS BIGINT) AS dy
        |  FROM aggl),
        |f AS (
        |  SELECT lag, n_pairs, num,
        |    CAST(FLOOR(SQRT(dx)) AS BIGINT)
        |      * CAST(FLOOR(SQRT(dy)) AS BIGINT) AS den
        |  FROM m)
        |SELECT CAST(lag AS BIGINT) AS lag, n_pairs,
        |  CASE WHEN den > 0 THEN
        |    GREATEST(CAST(-1000000 AS BIGINT),
        |      LEAST(CAST(1000000 AS BIGINT),
        |        CASE WHEN num >= 0
        |          THEN CAST(num * 1000000 // den AS BIGINT)
        |          ELSE -CAST((-num) * 1000000 // den AS BIGINT) END))
        |  END AS r_micro
        |FROM f""".stripMargin),
    // median absolute deviation of document length — the robust scale
    // for outlier clipping; both medians the exact lower order
    // statistic over distinct values (never an interpolated
    // percentile, which engines disagree on)
    ("st_mad",
      ((s, dir) => Stats.medianAbsoluteDeviation(docs(s, dir),
        "n_chars")),
      """WITH v AS (
        |  SELECT CAST(n_chars AS BIGINT) AS x FROM documents
        |  WHERE n_chars IS NOT NULL),
        |m1 AS (
        |  SELECT MIN(x) AS median, MAX(n) AS n FROM (
        |    SELECT x, SUM(c) OVER (ORDER BY x) AS cum,
        |      SUM(c) OVER () AS n, (SUM(c) OVER () + 1) // 2 AS k
        |    FROM (SELECT x, COUNT(*) AS c FROM v GROUP BY 1))
        |  WHERE cum >= k),
        |r AS (SELECT ABS(v.x - m1.median) AS x FROM v, m1),
        |m2 AS (
        |  SELECT MIN(x) AS mad FROM (
        |    SELECT x, SUM(c) OVER (ORDER BY x) AS cum,
        |      (SUM(c) OVER () + 1) // 2 AS k
        |    FROM (SELECT x, COUNT(*) AS c FROM r GROUP BY 1))
        |  WHERE cum >= k)
        |SELECT CAST(m1.n AS BIGINT) AS n,
        |  CAST(m1.median AS BIGINT) AS median,
        |  CAST(m2.mad AS BIGINT) AS mad
        |FROM m1, m2""".stripMargin),
    // Theil-Sen robust trend of the daily event count: exact lower
    // median of all pairwise micro-floored slopes — one wild day
    // cannot move it; the pair join is day-squared by design (bounded
    // before it runs)
    ("st_theil_sen",
      ((s, dir) => {
      val daily = events(s, dir)
        .withColumn("d", to_date(col("ts").cast("timestamp")))
        .groupBy(col("d")).agg(count(lit(1)).as("n"))
      Stats.theilSen(daily)
    }),
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1),
        |sl AS (
        |  SELECT CASE WHEN b.n - a.n >= 0
        |    THEN (b.n - a.n) * 1000000
        |      // date_diff('day', a.d, b.d)
        |    ELSE -((a.n - b.n) * 1000000
        |      // date_diff('day', a.d, b.d)) END AS x
        |  FROM daily a JOIN daily b ON a.d < b.d),
        |med AS (
        |  SELECT MIN(x) AS slope_micro, MAX(n) AS n_pairs FROM (
        |    SELECT x, SUM(c) OVER (ORDER BY x) AS cum,
        |      SUM(c) OVER () AS n, (SUM(c) OVER () + 1) // 2 AS k
        |    FROM (SELECT x, COUNT(*) AS c FROM sl GROUP BY 1))
        |  WHERE cum >= k)
        |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM daily) AS n_days,
        |  CAST(med.n_pairs AS BIGINT) AS n_pairs,
        |  CAST(med.slope_micro AS BIGINT) AS slope_micro
        |FROM med""".stripMargin),
    // Wald-Wolfowitz runs test on the daily event count around its
    // median — wandering vs random; cleared-denominator z with one
    // floor(sqrt), median-equal days excluded
    ("st_runs_test",
      ((s, dir) => {
      val daily = events(s, dir)
        .withColumn("d", to_date(col("ts").cast("timestamp")))
        .groupBy(col("d")).agg(count(lit(1)).as("n"))
      Stats.runsTest(daily)
    }),
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1),
        |m AS (
        |  SELECT MIN(x) AS median FROM (
        |    SELECT x, SUM(c) OVER (ORDER BY x) AS cum,
        |      (SUM(c) OVER () + 1) // 2 AS k
        |    FROM (SELECT n AS x, COUNT(*) AS c FROM daily GROUP BY 1))
        |  WHERE cum >= k),
        |sg AS (
        |  SELECT d, CASE WHEN n > m.median THEN 1 ELSE 0 END AS s
        |  FROM daily, m WHERE n <> m.median),
        |runs AS (
        |  SELECT s, LAG(s) OVER (ORDER BY d) AS prev FROM sg),
        |agg AS (
        |  SELECT CAST(SUM(s) AS BIGINT) AS n_above,
        |    CAST(SUM(1 - s) AS BIGINT) AS n_below,
        |    CAST(SUM(CASE WHEN prev IS NULL OR prev <> s
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_runs
        |  FROM runs),
        |f AS (
        |  SELECT *, n_above + n_below AS n,
        |    2 * n_above * n_below AS ab2
        |  FROM agg),
        |g AS (
        |  SELECT *, CASE WHEN n >= 2 THEN
        |    CAST(FLOOR(SQRT(CAST(CAST(ab2 AS HUGEINT) * (ab2 - n)
        |      // (n - 1) AS BIGINT))) AS BIGINT) END AS den
        |  FROM f)
        |SELECT n_above, n_below, n_runs,
        |  CASE WHEN den > 0 THEN
        |    CASE WHEN (n_runs - 1) * n - ab2 >= 0
        |    THEN CAST(((n_runs - 1) * n - ab2) * 1000000 // den
        |      AS BIGINT)
        |    ELSE -CAST((ab2 - (n_runs - 1) * n) * 1000000 // den
        |      AS BIGINT) END END AS z_micro
        |FROM g""".stripMargin),
    // Herfindahl concentration of documents across sources — the
    // one-number balance summary next to st_gini: micro shares
    // squared and summed
    ("dq_herfindahl",
      ((s, dir) => Stats.herfindahl(docs(s, dir), "source")),
      """WITH c AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM documents WHERE source IS NOT NULL GROUP BY 1),
        |t AS (SELECT *, CAST(SUM(n) OVER () AS BIGINT) AS tt,
        |        n * 1000000 // CAST(SUM(n) OVER () AS BIGINT) AS s
        |      FROM c)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
        |  CAST(MIN(tt) AS BIGINT) AS total,
        |  CAST(SUM(CAST(s AS HUGEINT) * s) // 1000000 AS BIGINT)
        |    AS hhi_micro
        |FROM t""".stripMargin),
    // Matthews correlation of the length-threshold classifier
    // predicting English — the imbalance-honest single-number
    // confusion summary; split floor(sqrt) radicands keep every step
    // integer-exact
    ("eval_mcc",
      ((s, dir) => EvalMetrics.mcc(
        docs(s, dir).select((col("lang") === "en").as("a"),
          (col("n_chars") >= 500).as("p")), "a", "p")),
      """WITH c AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN lang = 'en' AND n_chars >= 500
        |      THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        |    CAST(SUM(CASE WHEN lang <> 'en' AND n_chars < 500
        |      THEN 1 ELSE 0 END) AS BIGINT) AS tn,
        |    CAST(SUM(CASE WHEN lang <> 'en' AND n_chars >= 500
        |      THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        |    CAST(SUM(CASE WHEN lang = 'en' AND n_chars < 500
        |      THEN 1 ELSE 0 END) AS BIGINT) AS fn
        |  FROM documents),
        |m AS (
        |  SELECT *, CAST(tp AS HUGEINT) * tn
        |      - CAST(fp AS HUGEINT) * fn AS num,
        |    CAST(CAST(tp + fp AS HUGEINT) * (tp + fn) AS BIGINT)
        |      AS d1,
        |    CAST(CAST(tn + fp AS HUGEINT) * (tn + fn) AS BIGINT)
        |      AS d2
        |  FROM c),
        |f AS (
        |  SELECT *, CAST(FLOOR(SQRT(d1)) AS BIGINT)
        |    * CAST(FLOOR(SQRT(d2)) AS BIGINT) AS den
        |  FROM m)
        |SELECT tp, tn, fp, fn,
        |  CASE WHEN den > 0 THEN CASE WHEN num >= 0
        |    THEN CAST(num * 1000000 // den AS BIGINT)
        |    ELSE -CAST((-num) * 1000000 // den AS BIGINT) END
        |  END AS mcc_micro
        |FROM f""".stripMargin),
    // Cohen's d effect size of document length, English vs the rest —
    // "the lengths differ significantly, but by how many pooled
    // standard deviations?"; milli units, every division a floor
    ("st_cohens_d",
      ((s, dir) => Stats.cohensD(
        docs(s, dir).select(col("n_chars").as("x"),
          (col("lang") === "en").as("g")), "x", "g")),
      """WITH r AS (
        |  SELECT CAST(n_chars AS BIGINT) AS x, lang = 'en' AS g
        |  FROM documents
        |  WHERE n_chars IS NOT NULL AND lang IS NOT NULL),
        |a AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN g THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(SUM(CASE WHEN g THEN 0 ELSE 1 END) AS BIGINT) AS n_b,
        |    CAST(SUM(CASE WHEN g THEN x ELSE 0 END) AS BIGINT) AS sa,
        |    CAST(SUM(CASE WHEN g THEN 0 ELSE x END) AS BIGINT) AS sb,
        |    SUM(CASE WHEN g THEN CAST(x AS HUGEINT) * x
        |      ELSE 0 END) AS qa,
        |    SUM(CASE WHEN g THEN 0
        |      ELSE CAST(x AS HUGEINT) * x END) AS qb
        |  FROM r),
        |m AS (
        |  SELECT *,
        |    CASE WHEN n_a > 0 THEN CASE WHEN sa >= 0
        |      THEN sa * 1000000 // n_a
        |      ELSE -((-sa) * 1000000 // n_a) END END AS mean_a_micro,
        |    CASE WHEN n_b > 0 THEN CASE WHEN sb >= 0
        |      THEN sb * 1000000 // n_b
        |      ELSE -((-sb) * 1000000 // n_b) END END AS mean_b_micro,
        |    CASE WHEN n_a >= 2 THEN CAST((CAST(n_a AS HUGEINT) * qa
        |      - CAST(sa AS HUGEINT) * sa) // n_a AS BIGINT) END
        |      AS ssa,
        |    CASE WHEN n_b >= 2 THEN CAST((CAST(n_b AS HUGEINT) * qb
        |      - CAST(sb AS HUGEINT) * sb) // n_b AS BIGINT) END
        |      AS ssb
        |  FROM a),
        |f AS (
        |  SELECT *, CASE WHEN n_a >= 2 AND n_b >= 2 THEN
        |    CAST(FLOOR(SQRT((ssa + ssb) // (n_a + n_b - 2)))
        |      AS BIGINT) END AS sp
        |  FROM m)
        |SELECT n_a, n_b, CAST(mean_a_micro AS BIGINT) AS mean_a_micro,
        |  CAST(mean_b_micro AS BIGINT) AS mean_b_micro, sp,
        |  CASE WHEN sp > 0 THEN
        |    CASE WHEN mean_a_micro - mean_b_micro >= 0
        |    THEN CAST((mean_a_micro - mean_b_micro)
        |      // (sp * 1000) AS BIGINT)
        |    ELSE -CAST((mean_b_micro - mean_a_micro)
        |      // (sp * 1000) AS BIGINT) END END AS d_milli
        |FROM f""".stripMargin),
    // Mann-Kendall trend test on the daily event count — the
    // significance companion to st_theil_sen (conventionally reported
    // together): pairwise sign statistic, tie-corrected variance,
    // continuity-corrected z in micros
    ("st_mann_kendall",
      ((s, dir) => {
      val daily = events(s, dir)
        .withColumn("d", to_date(col("ts").cast("timestamp")))
        .groupBy(col("d")).agg(count(lit(1)).as("n"))
      Stats.mannKendall(daily)
    }),
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1),
        |p AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |    CAST(SUM(SIGN(b.n - a.n)) AS BIGINT) AS s_stat
        |  FROM daily a JOIN daily b ON a.d < b.d),
        |t AS (
        |  SELECT CAST(SUM(t) AS BIGINT) AS n_days,
        |    CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie18
        |  FROM (SELECT COUNT(*) AS t FROM daily GROUP BY n)),
        |f AS (
        |  SELECT p.n_pairs, p.s_stat, t.n_days,
        |    t.n_days * (t.n_days - 1) * (2 * t.n_days + 5) - t.tie18
        |      AS var18
        |  FROM p, t),
        |g AS (SELECT *, CAST(FLOOR(SQRT(var18 // 18)) AS BIGINT)
        |      AS sqv FROM f)
        |SELECT n_days, n_pairs, s_stat, CAST(var18 AS BIGINT)
        |    AS var18,
        |  CASE WHEN sqv > 0 THEN
        |    CASE WHEN s_stat > 0
        |      THEN CAST((s_stat - 1) * 1000000 // sqv AS BIGINT)
        |    WHEN s_stat < 0
        |      THEN -CAST((-s_stat - 1) * 1000000 // sqv AS BIGINT)
        |    ELSE 0 END END AS z_micro
        |FROM g""".stripMargin),
    // lagged cross-correlation between daily order volume and daily
    // ship volume — the lead/lag audit between two rollups (shipping
    // trails ordering); the lag list LEFT-JOINs so a lag with zero
    // pairs still emits (lag, 0, NULL)
    ("ts_crosscorr",
      ((s, dir) => {
      val da = s.read.parquet(s"$dir/orders.parquet")
        .groupBy(col("o_orderdate").as("d"))
        .agg(count(lit(1)).as("n"))
      val db = s.read.parquet(s"$dir/lineitem.parquet")
        .groupBy(col("l_shipdate").as("d"))
        .agg(count(lit(1)).as("n"))
      graft.operators.TimeSeries.crossCorrelation(da, db,
        Seq(-7, 0, 1, 7, 30))
    }),
      """WITH da AS (
        |  SELECT o_orderdate AS d, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM orders GROUP BY 1),
        |db AS (
        |  SELECT l_shipdate AS d, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM lineitem GROUP BY 1),
        |lags AS (SELECT UNNEST([-7, 0, 1, 7, 30]) AS lag),
        |p AS (
        |  SELECT lags.lag, a.n AS x, b.n AS y
        |  FROM lags, da a, db b
        |  WHERE date_diff('day', a.d, b.d) = lags.lag),
        |agg AS (
        |  SELECT lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |    SUM(CAST(x AS HUGEINT) * y) AS sxy,
        |    SUM(CAST(x AS HUGEINT) * x) AS sxx,
        |    SUM(CAST(y AS HUGEINT) * y) AS syy
        |  FROM p GROUP BY 1),
        |aggl AS (
        |  SELECT lags.lag,
        |    CAST(COALESCE(agg.n_pairs, 0) AS BIGINT) AS n_pairs,
        |    agg.sx, agg.sy, agg.sxy, agg.sxx, agg.syy
        |  FROM lags LEFT JOIN agg ON lags.lag = agg.lag),
        |m AS (
        |  SELECT lag, n_pairs,
        |    CAST(n_pairs AS HUGEINT) * sxy
        |      - CAST(sx AS HUGEINT) * sy AS num,
        |    CAST(CAST(n_pairs AS HUGEINT) * sxx
        |      - CAST(sx AS HUGEINT) * sx AS BIGINT) AS dx,
        |    CAST(CAST(n_pairs AS HUGEINT) * syy
        |      - CAST(sy AS HUGEINT) * sy AS BIGINT) AS dy
        |  FROM aggl),
        |f AS (
        |  SELECT lag, n_pairs, num,
        |    CAST(FLOOR(SQRT(dx)) AS BIGINT)
        |      * CAST(FLOOR(SQRT(dy)) AS BIGINT) AS den
        |  FROM m)
        |SELECT CAST(lag AS BIGINT) AS lag, n_pairs,
        |  CASE WHEN den > 0 THEN
        |    GREATEST(CAST(-1000000 AS BIGINT),
        |      LEAST(CAST(1000000 AS BIGINT),
        |        CASE WHEN num >= 0
        |          THEN CAST(num * 1000000 // den AS BIGINT)
        |          ELSE -CAST((-num) * 1000000 // den AS BIGINT) END))
        |  END AS r_micro
        |FROM f""".stripMargin),
    // Mann-Whitney U rank-sum between English and non-English doc
    // lengths — the nonparametric twin of st_cohens_d (no normality
    // assumption); doubled mid-ranks keep ties integer, z in micros
    // via the tie-corrected variance
    ("st_mann_whitney",
      ((s, dir) => Stats.mannWhitneyU(
        docs(s, dir)
          .filter(col("n_chars").isNotNull && col("lang").isNotNull)
          .select(col("n_chars").as("x"),
            (col("lang") === "en").as("g")), "x", "g")),
      """WITH r AS (
        |  SELECT CAST(n_chars AS BIGINT) AS x, lang = 'en' AS g
        |  FROM documents
        |  WHERE n_chars IS NOT NULL AND lang IS NOT NULL),
        |cells AS (
        |  SELECT x,
        |    CAST(SUM(CASE WHEN g THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM r GROUP BY 1),
        |wf AS (
        |  SELECT x, ca, c,
        |    CAST(COALESCE(SUM(c) OVER (ORDER BY x
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS f
        |  FROM cells),
        |a AS (
        |  SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
        |    CAST(SUM(c - ca) AS BIGINT) AS n_b,
        |    SUM(CAST(ca AS HUGEINT) * (2 * f + c + 1)) AS r2a,
        |    SUM(CAST(c AS HUGEINT) * c * c - c) AS t
        |  FROM wf),
        |b AS (
        |  SELECT n_a, n_b, t, n_a + n_b AS n,
        |    CAST(r2a - CAST(n_a AS HUGEINT) * (n_a + 1) AS BIGINT)
        |      AS u2_a
        |  FROM a),
        |c2 AS (
        |  SELECT *,
        |    CAST(2 * CAST(n_a AS HUGEINT) * n_b - u2_a AS BIGINT)
        |      AS u2_b,
        |    CASE WHEN n_a > 0 AND n_b > 0 AND n >= 2 THEN
        |      CAST(n_a AS HUGEINT) * n_b *
        |        (CAST(n AS HUGEINT) * n * n - n - t)
        |        // (3 * CAST(n AS HUGEINT) * (n - 1)) END AS var4
        |  FROM b),
        |d AS (
        |  SELECT *, CASE WHEN var4 > 0 THEN
        |    CAST(FLOOR(SQRT(CAST(var4 AS DOUBLE))) AS BIGINT) END
        |    AS sig2
        |  FROM c2)
        |SELECT n_a, n_b, u2_a, u2_b, CAST(t AS BIGINT) AS tie_cubes,
        |  CASE WHEN sig2 > 0 THEN
        |    CASE WHEN u2_a - CAST(n_a AS HUGEINT) * n_b >= 0
        |      THEN CAST((u2_a - CAST(n_a AS HUGEINT) * n_b)
        |        * 1000000 // sig2 AS BIGINT)
        |      ELSE -CAST((CAST(n_a AS HUGEINT) * n_b - u2_a)
        |        * 1000000 // sig2 AS BIGINT) END END AS z_micro
        |FROM d""".stripMargin),
    // Kendall tau-b between bucketed doc length and bucketed word
    // count — the concordance companion to st_spearman, computed on
    // the distinct (x, y) cell table (pair MASS products, never row
    // pairs); bucketing is the declared semantics
    ("st_kendall_tau",
      ((s, dir) => Stats.kendallTau(
        docs(s, dir).filter(col("n_chars").isNotNull)
          .select(expr("n_chars div 200").as("x"),
            size(graft.functions.TextFunctions.words(col("text")))
              .cast("long").as("_wc"))
          .select(col("x"), expr("_wc div 8").as("y")),
        "x", "y")),
      """WITH r AS (
        |  SELECT CAST(n_chars AS BIGINT) // 200 AS x,
        |    CAST(len(list_filter(string_split_regex(lower(text),
        |      '\s+'), w -> len(w) > 0)) AS BIGINT) // 8 AS y
        |  FROM documents WHERE n_chars IS NOT NULL),
        |cells AS (
        |  SELECT x, y, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM r GROUP BY 1, 2),
        |pm AS (
        |  SELECT
        |    SUM(CASE WHEN a.x < b.x AND a.y < b.y
        |      THEN CAST(a.c AS HUGEINT) * b.c ELSE 0 END) AS conc,
        |    SUM(CASE WHEN a.x < b.x AND a.y > b.y
        |      THEN CAST(a.c AS HUGEINT) * b.c ELSE 0 END) AS disc
        |  FROM cells a JOIN cells b
        |    ON a.x < b.x OR (a.x = b.x AND a.y < b.y)),
        |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cells),
        |nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cells FROM cells),
        |xt AS (SELECT SUM(CAST(cx AS HUGEINT) * (cx - 1)) AS tx2
        |       FROM (SELECT CAST(SUM(c) AS BIGINT) AS cx
        |             FROM cells GROUP BY x)),
        |yt AS (SELECT SUM(CAST(cy AS HUGEINT) * (cy - 1)) AS ty2
        |       FROM (SELECT CAST(SUM(c) AS BIGINT) AS cy
        |             FROM cells GROUP BY y)),
        |f AS (
        |  SELECT n, n_cells, conc, disc,
        |    CAST(n AS HUGEINT) * (n - 1) - tx2 AS dx,
        |    CAST(n AS HUGEINT) * (n - 1) - ty2 AS dy
        |  FROM pm, tot, nc, xt, yt),
        |g AS (
        |  SELECT *, CASE WHEN dx > 0 AND dy > 0 THEN
        |    CAST(FLOOR(SQRT(CAST(dx * dy AS DOUBLE))) AS BIGINT) END
        |    AS den
        |  FROM f)
        |SELECT n, n_cells, CAST(conc AS BIGINT) AS conc,
        |  CAST(disc AS BIGINT) AS disc,
        |  CASE WHEN den > 0 THEN
        |    CASE WHEN conc >= disc
        |      THEN CAST(2 * (conc - disc) * 1000000 // den AS BIGINT)
        |      ELSE -CAST(2 * (disc - conc) * 1000000 // den AS BIGINT)
        |    END END AS tau_micro
        |FROM g""".stripMargin),
    // Welch's unequal-variance t on the same split as st_cohens_d —
    // the test statistic when the two groups' spreads differ (the
    // pooled t assumes they don't); Welch-Satterthwaite dof in millis
    ("st_welch_t",
      ((s, dir) => Stats.welchT(
        docs(s, dir)
          .filter(col("n_chars").isNotNull && col("lang").isNotNull)
          .select(col("n_chars").as("x"),
            (col("lang") === "en").as("g")), "x", "g")),
      """WITH r AS (
        |  SELECT CAST(n_chars AS BIGINT) AS x, lang = 'en' AS g
        |  FROM documents
        |  WHERE n_chars IS NOT NULL AND lang IS NOT NULL),
        |a AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN g THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(SUM(CASE WHEN g THEN 0 ELSE 1 END) AS BIGINT) AS n_b,
        |    CAST(SUM(CASE WHEN g THEN x ELSE 0 END) AS BIGINT) AS sa,
        |    CAST(SUM(CASE WHEN g THEN 0 ELSE x END) AS BIGINT) AS sb,
        |    SUM(CASE WHEN g THEN CAST(x AS HUGEINT) * x ELSE 0 END)
        |      AS qa,
        |    SUM(CASE WHEN g THEN 0 ELSE CAST(x AS HUGEINT) * x END)
        |      AS qb
        |  FROM r),
        |m AS (
        |  SELECT *,
        |    CASE WHEN n_a > 0 THEN CASE WHEN sa >= 0
        |      THEN CAST(sa * 1000000 // n_a AS BIGINT)
        |      ELSE -CAST((-sa) * 1000000 // n_a AS BIGINT) END END
        |      AS mean_a_micro,
        |    CASE WHEN n_b > 0 THEN CASE WHEN sb >= 0
        |      THEN CAST(sb * 1000000 // n_b AS BIGINT)
        |      ELSE -CAST((-sb) * 1000000 // n_b AS BIGINT) END END
        |      AS mean_b_micro,
        |    CASE WHEN n_a >= 2 THEN
        |      CAST((CAST(n_a AS HUGEINT) * qa
        |        - CAST(sa AS HUGEINT) * sa)
        |        // (CAST(n_a AS HUGEINT) * (n_a - 1)) AS BIGINT) END
        |      AS va,
        |    CASE WHEN n_b >= 2 THEN
        |      CAST((CAST(n_b AS HUGEINT) * qb
        |        - CAST(sb AS HUGEINT) * sb)
        |        // (CAST(n_b AS HUGEINT) * (n_b - 1)) AS BIGINT) END
        |      AS vb
        |  FROM a),
        |w AS (
        |  SELECT *, va // n_a AS ra, vb // n_b AS rb FROM m),
        |f AS (
        |  SELECT *,
        |    CASE WHEN ra IS NOT NULL AND rb IS NOT NULL THEN
        |      CAST(FLOOR(SQRT(ra + rb)) AS BIGINT) END AS se
        |  FROM w)
        |SELECT n_a, n_b, mean_a_micro, mean_b_micro, se,
        |  CASE WHEN se > 0 THEN
        |    CASE WHEN mean_a_micro - mean_b_micro >= 0
        |      THEN (mean_a_micro - mean_b_micro) // (se * 1000)
        |      ELSE -((mean_b_micro - mean_a_micro) // (se * 1000))
        |    END END AS t_milli,
        |  CASE WHEN ra IS NOT NULL AND rb IS NOT NULL AND
        |    (CAST(ra AS HUGEINT) * ra // (n_a - 1)
        |      + CAST(rb AS HUGEINT) * rb // (n_b - 1)) > 0 THEN
        |    CAST(CAST(ra + rb AS HUGEINT) * (ra + rb) * 1000
        |      // (CAST(ra AS HUGEINT) * ra // (n_a - 1)
        |        + CAST(rb AS HUGEINT) * rb // (n_b - 1)) AS BIGINT)
        |    END AS dof_milli
        |FROM f""".stripMargin),
    // Cramer's V from the chi-square cells of order status x priority
    // — the bounded [0,1] association strength, comparable across
    // tables (raw chi-square mass is not)
    ("st_cramers_v",
      ((s, dir) => Stats.cramersV(
        s.read.parquet(s"$dir/orders.parquet"),
        "o_orderstatus", "o_orderpriority")),
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
        |  SELECT a, b, n_obs,
        |    CAST(rt * ct * 1000 // nn AS BIGINT) AS e_milli,
        |    CAST(CASE WHEN devnum >= 0 THEN devnum // nn
        |      ELSE -((-devnum) // nn) END AS BIGINT) AS dev_milli
        |  FROM x),
        |z AS (
        |  SELECT CAST(SUM(n_obs) AS BIGINT) AS n,
        |    CAST(COUNT(DISTINCT a) AS BIGINT) AS n_rows_cat,
        |    CAST(COUNT(DISTINCT b) AS BIGINT) AS n_cols_cat,
        |    CAST(SUM(CASE WHEN e_milli > 0
        |      THEN dev_milli * dev_milli // e_milli ELSE 0 END)
        |      AS BIGINT) AS chi2_milli
        |  FROM y)
        |SELECT n, n_rows_cat, n_cols_cat, chi2_milli,
        |  CASE WHEN LEAST(n_rows_cat - 1, n_cols_cat - 1) > 0
        |      AND n > 0 THEN
        |    CAST(FLOOR(SQRT(CAST(CAST(chi2_milli AS HUGEINT)
        |      * 1000000000 // (CAST(n AS HUGEINT)
        |        * LEAST(n_rows_cat - 1, n_cols_cat - 1))
        |      AS DOUBLE))) AS BIGINT) END AS v_micro
        |FROM z""".stripMargin),
    // distribution shape of document length from commutative power
    // sums — skewness + excess kurtosis; partials exact decimal, the
    // finalize in IEEE doubles (only exactly-rounded ops)
    ("st_moments",
      ((s, dir) => Stats.momentsProfile(
        docs(s, dir).filter(col("n_chars").isNotNull), "n_chars")),
      momentsOracleSql),
    // the SAME numbers derived from per-source partial rows merged by
    // plain addition — the distributed-moments/merge identity the
    // map-side-combine story rests on (oracle is the WHOLE-corpus
    // computation: merge(partials) must equal it exactly)
    ("st_moments_merge",
      ((s, dir) => Stats.momentsFromPartials(Stats.momentsPartials(
        docs(s, dir).filter(col("n_chars").isNotNull), "n_chars",
        slices = Seq("source")))),
      momentsOracleSql),
    // expected calibration error of the pseudo-score st_brier uses —
    // 10 equal-width confidence bins, per-bin |mean score - accuracy|
    // weighted by mass, plus the worst bin
    ("eval_ece",
      ((s, dir) => EvalMetrics.expectedCalibrationError(
        docs(s, dir).select(
          least(col("n_chars") * 2000, lit(1000000L)).cast("long")
            .as("sm"),
          (col("lang") === "en").as("y")), "sm", "y")),
      """WITH d AS (
        |  SELECT LEAST(n_chars * 2000, 1000000) AS s,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |  FROM documents),
        |b AS (
        |  SELECT LEAST(s * 10 // 1000000, 9) AS bin,
        |    CAST(COUNT(*) AS BIGINT) AS nk,
        |    CAST(SUM(s) AS BIGINT) AS ss,
        |    CAST(SUM(y) AS BIGINT) AS sy
        |  FROM d GROUP BY 1),
        |g AS (
        |  SELECT CAST(bin AS BIGINT) AS bin, nk,
        |    ABS(ss // nk - sy * 1000000 // nk) AS gap
        |  FROM b)
        |SELECT CAST(SUM(nk) AS BIGINT) AS n,
        |  CAST(COUNT(*) AS BIGINT) AS n_bins_used,
        |  CAST(SUM(CAST(nk AS HUGEINT) * gap) // SUM(nk) AS BIGINT)
        |    AS ece_micro,
        |  CAST(MAX(gap) AS BIGINT) AS max_gap_micro,
        |  (SELECT bin FROM g ORDER BY gap DESC, bin ASC LIMIT 1)
        |    AS max_gap_bin
        |FROM g""".stripMargin),
    // Murphy decomposition of the Brier score over the same bins as
    // eval_ece: reliability (calibration penalty), resolution (skill),
    // uncertainty (base-rate floor) — each term floored micros
    ("eval_brier_decomp",
      ((s, dir) => EvalMetrics.brierDecomposition(
        docs(s, dir).select(
          least(col("n_chars") * 2000, lit(1000000L)).cast("long")
            .as("sm"),
          (col("lang") === "en").as("y")), "sm", "y")),
      """WITH d AS (
        |  SELECT LEAST(n_chars * 2000, 1000000) AS s,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |  FROM documents),
        |b AS (
        |  SELECT LEAST(s * 10 // 1000000, 9) AS bin,
        |    CAST(COUNT(*) AS BIGINT) AS nk,
        |    CAST(SUM(s) AS BIGINT) AS ss,
        |    CAST(SUM(y) AS BIGINT) AS sy
        |  FROM d GROUP BY 1),
        |t AS (
        |  SELECT CAST(SUM(nk) AS BIGINT) AS n,
        |    CAST(SUM(sy) * 1000000 // SUM(nk) AS BIGINT) AS obar
        |  FROM b),
        |g AS (
        |  SELECT b.nk, ss // nk AS conf, sy * 1000000 // nk AS acc,
        |    t.n, t.obar
        |  FROM b, t)
        |SELECT MAX(n) AS n, MAX(obar) AS obar_micro,
        |  CAST(SUM(CAST(nk AS HUGEINT) * (conf - acc) * (conf - acc))
        |    // (CAST(MAX(n) AS HUGEINT) * 1000000) AS BIGINT)
        |    AS reliability_micro,
        |  CAST(SUM(CAST(nk AS HUGEINT) * (acc - obar) * (acc - obar))
        |    // (CAST(MAX(n) AS HUGEINT) * 1000000) AS BIGINT)
        |    AS resolution_micro,
        |  CAST(MAX(obar) * (1000000 - MAX(obar)) // 1000000 AS BIGINT)
        |    AS uncertainty_micro
        |FROM g""".stripMargin),
    // HITS hubs/authorities over the directed customer->supplier
    // graph (two max-normalized mutual-recursion rounds, unrolled in
    // the oracle like g1_pagerank): hub = a customer whose suppliers
    // are widely bought from, authority = a supplier bought by strong
    // hubs
    ("g10_hits",
      ((s, dir) => {
      val e = s.read.parquet(s"$dir/orders.parquet")
        .join(s.read.parquet(s"$dir/lineitem.parquet"),
          col("o_orderkey") === col("l_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst"))
        .distinct()
      Graph.hits(e, iterations = 2)
        .select(col("v"), round(col("hub"), 6).as("hub"),
          round(col("auth"), 6).as("auth"))
    }),
      """WITH e AS (
        |  SELECT DISTINCT 'c' || o_custkey AS src,
        |    's' || l_suppkey AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |h0 AS (SELECT DISTINCT src AS v, 1.0::DOUBLE AS r FROM e),
        |a1 AS (SELECT dst AS v, SUM(h0.r) AS s
        |       FROM e JOIN h0 ON e.src = h0.v GROUP BY 1),
        |a1n AS (SELECT v, s / (SELECT MAX(s) FROM a1) AS r FROM a1),
        |h1 AS (SELECT src AS v, SUM(a1n.r) AS s
        |       FROM e JOIN a1n ON e.dst = a1n.v GROUP BY 1),
        |h1n AS (SELECT v, s / (SELECT MAX(s) FROM h1) AS r FROM h1),
        |a2 AS (SELECT dst AS v, SUM(h1n.r) AS s
        |       FROM e JOIN h1n ON e.src = h1n.v GROUP BY 1),
        |a2n AS (SELECT v, s / (SELECT MAX(s) FROM a2) AS r FROM a2),
        |h2 AS (SELECT src AS v, SUM(a2n.r) AS s
        |       FROM e JOIN a2n ON e.dst = a2n.v GROUP BY 1),
        |h2n AS (SELECT v, s / (SELECT MAX(s) FROM h2) AS r FROM h2)
        |SELECT COALESCE(h2n.v, a2n.v) AS v,
        |  ROUND(h2n.r, 6) + 0.0 AS hub,
        |  ROUND(a2n.r, 6) + 0.0 AS auth
        |FROM h2n FULL OUTER JOIN a2n ON h2n.v = a2n.v""".stripMargin),
    // personalized PageRank from a 3-customer seed set over the
    // customer-supplier graph — centrality relative to what the seeds
    // touch (the recommendation-expansion primitive); oracle unrolls
    // the same three damped iterations with seed-only restart
    ("g9_ppr",
      ((s, dir) => {
      import s.implicits._
      val e = s.read.parquet(s"$dir/orders.parquet")
        .join(s.read.parquet(s"$dir/lineitem.parquet"),
          col("o_orderkey") === col("l_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst"))
        .distinct()
      Graph.personalizedPageRank(e,
        Seq("c1", "c2", "c3").toDF("v"), iterations = 3)
        .select(col("v"), round(col("r"), 6).as("rank"))
    }),
      """WITH e AS (
        |  SELECT DISTINCT 'c' || o_custkey AS src,
        |    's' || l_suppkey AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |dir AS (
        |  SELECT src, dst FROM e
        |  UNION ALL SELECT dst AS src, src AS dst FROM e),
        |deg AS (SELECT src, COUNT(*) AS deg FROM dir GROUP BY src),
        |sd AS (SELECT UNNEST(['c1', 'c2', 'c3']) AS v),
        |p0 AS (SELECT v, 1.0::DOUBLE AS r FROM sd),
        |c1 AS (
        |  SELECT dir.dst AS v, SUM(p0.r / deg.deg) AS s
        |  FROM dir JOIN p0 ON dir.src = p0.v
        |  JOIN deg ON dir.src = deg.src GROUP BY 1),
        |p1 AS (
        |  SELECT COALESCE(c1.v, sd.v) AS v,
        |    0.15 * (CASE WHEN sd.v IS NOT NULL THEN 1.0 ELSE 0.0 END)
        |      + 0.85 * COALESCE(c1.s, 0) AS r
        |  FROM c1 FULL OUTER JOIN sd ON c1.v = sd.v),
        |c2 AS (
        |  SELECT dir.dst AS v, SUM(p1.r / deg.deg) AS s
        |  FROM dir JOIN p1 ON dir.src = p1.v
        |  JOIN deg ON dir.src = deg.src GROUP BY 1),
        |p2 AS (
        |  SELECT COALESCE(c2.v, sd.v) AS v,
        |    0.15 * (CASE WHEN sd.v IS NOT NULL THEN 1.0 ELSE 0.0 END)
        |      + 0.85 * COALESCE(c2.s, 0) AS r
        |  FROM c2 FULL OUTER JOIN sd ON c2.v = sd.v),
        |c3 AS (
        |  SELECT dir.dst AS v, SUM(p2.r / deg.deg) AS s
        |  FROM dir JOIN p2 ON dir.src = p2.v
        |  JOIN deg ON dir.src = deg.src GROUP BY 1),
        |p3 AS (
        |  SELECT COALESCE(c3.v, sd.v) AS v,
        |    0.15 * (CASE WHEN sd.v IS NOT NULL THEN 1.0 ELSE 0.0 END)
        |      + 0.85 * COALESCE(c3.s, 0) AS r
        |  FROM c3 FULL OUTER JOIN sd ON c3.v = sd.v)
        |SELECT v, ROUND(r, 6) + 0.0 AS rank FROM p3
        |WHERE r > 0""".stripMargin),
    // Neyman-optimal annotation-budget allocation across sources:
    // weight = n_h * floor-sqrt population sigma of doc length, floor
    // shares of a 10k budget, largest-remainder top-up (stratum-asc
    // tiebreak) — every step integer-replayed
    ("td_neyman_alloc",
      ((s, dir) => graft.operators.Sampling.neymanAllocation(
        docs(s, dir), "source", "n_chars", budget = 10000L)),
      """WITH a AS (
        |  SELECT source AS stratum, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(n_chars) AS BIGINT) AS sx,
        |    SUM(CAST(n_chars AS HUGEINT) * n_chars) AS sq
        |  FROM documents WHERE n_chars IS NOT NULL GROUP BY 1),
        |v AS (
        |  SELECT stratum, n,
        |    CAST(FLOOR(SQRT(CAST((CAST(n AS HUGEINT) * sq
        |      - CAST(sx AS HUGEINT) * sx)
        |      // (CAST(n AS HUGEINT) * n) AS BIGINT))) AS BIGINT)
        |      AS sigma
        |  FROM a),
        |w AS (
        |  SELECT *, n * sigma AS weight,
        |    CAST(SUM(n * sigma) OVER () AS BIGINT) AS tw
        |  FROM v),
        |f AS (
        |  SELECT *,
        |    CASE WHEN tw > 0 THEN 10000 * weight // tw END AS fl,
        |    CASE WHEN tw > 0 THEN (10000 * weight) % tw END AS rem,
        |    CASE WHEN tw > 0 THEN 10000
        |      - SUM(10000 * weight // tw) OVER () END AS leftn,
        |    ROW_NUMBER() OVER (ORDER BY (10000 * weight) % tw DESC,
        |      stratum) AS rk
        |  FROM w)
        |SELECT stratum, n, sigma, CAST(weight AS BIGINT) AS weight,
        |  CASE WHEN tw > 0 THEN CAST(fl
        |    + CASE WHEN rk <= leftn THEN 1 ELSE 0 END AS BIGINT)
        |  END AS alloc
        |FROM f""".stripMargin),
    // degree assortativity of the customer-supplier co-purchase
    // graph: Pearson between endpoint degrees over the directed edge
    // list, exact integer sums-of-products with floor(sqrt)
    // denominators — bipartite graphs read disassortative, a shape
    // change shows up as a sign flip
    ("g8_assortativity",
      ((s, dir) => {
      val e = s.read.parquet(s"$dir/orders.parquet")
        .join(s.read.parquet(s"$dir/lineitem.parquet"),
          col("o_orderkey") === col("l_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst"))
        .distinct()
      Graph.assortativity(e)
    }),
      """WITH e AS (
        |  SELECT DISTINCT 'c' || o_custkey AS src,
        |    's' || l_suppkey AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |dir AS (
        |  SELECT src, dst FROM e
        |  UNION ALL SELECT dst AS src, src AS dst FROM e),
        |deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg
        |        FROM dir GROUP BY src),
        |j AS (
        |  SELECT dx.deg AS x, dy.deg AS y
        |  FROM dir JOIN deg dx ON dir.src = dx.src
        |  JOIN deg dy ON dir.dst = dy.src),
        |agg AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_edges_directed,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |    SUM(CAST(x AS HUGEINT) * y) AS sxy,
        |    SUM(CAST(x AS HUGEINT) * x) AS sxx,
        |    SUM(CAST(y AS HUGEINT) * y) AS syy
        |  FROM j),
        |m AS (
        |  SELECT n_edges_directed,
        |    CAST(n_edges_directed AS HUGEINT) * sxy
        |      - CAST(sx AS HUGEINT) * sy AS num,
        |    CAST(CAST(n_edges_directed AS HUGEINT) * sxx
        |      - CAST(sx AS HUGEINT) * sx AS BIGINT) AS dx,
        |    CAST(CAST(n_edges_directed AS HUGEINT) * syy
        |      - CAST(sy AS HUGEINT) * sy AS BIGINT) AS dy
        |  FROM agg),
        |f AS (
        |  SELECT n_edges_directed, num,
        |    CAST(FLOOR(SQRT(dx)) AS BIGINT)
        |      * CAST(FLOOR(SQRT(dy)) AS BIGINT) AS den
        |  FROM m)
        |SELECT n_edges_directed,
        |  CASE WHEN den > 0 THEN
        |    GREATEST(CAST(-1000000 AS BIGINT),
        |      LEAST(CAST(1000000 AS BIGINT),
        |        CASE WHEN num >= 0
        |          THEN CAST(num * 1000000 // den AS BIGINT)
        |          ELSE -CAST((-num) * 1000000 // den AS BIGINT) END))
        |  END AS r_micro
        |FROM f""".stripMargin),
    // pairwise vocabulary overlap between sources — the corpus-
    // comparison card: per unordered source pair, both vocabulary
    // sizes, shared vocabulary, Jaccard in micros; zero-overlap pairs
    // still emit (that IS the finding)
    ("td_vocab_overlap",
      ((s, dir) => Collocations.vocabOverlap(docs(s, dir), "text",
        "source")),
      """WITH tv AS (
        |  SELECT DISTINCT source AS g,
        |    unnest(list_filter(string_split_regex(lower(text),
        |      '\s+'), x -> len(x) > 0)) AS t
        |  FROM documents),
        |sz AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS nv
        |       FROM tv GROUP BY 1),
        |cm AS (
        |  SELECT x.g AS a, y.g AS b, CAST(COUNT(*) AS BIGINT)
        |      AS n_common
        |  FROM tv x JOIN tv y ON x.t = y.t AND x.g < y.g
        |  GROUP BY 1, 2)
        |SELECT sa.g AS a, sb.g AS b, sa.nv AS n_a, sb.nv AS n_b,
        |  COALESCE(cm.n_common, 0) AS n_common,
        |  CAST(COALESCE(cm.n_common, 0) * 1000000
        |    // (sa.nv + sb.nv - COALESCE(cm.n_common, 0)) AS BIGINT)
        |    AS jaccard_micro
        |FROM sz sa JOIN sz sb ON sa.g < sb.g
        |LEFT JOIN cm ON cm.a = sa.g AND cm.b = sb.g""".stripMargin),
    // Zipf head concentration: the share of all token mass carried by
    // the top-10/100/1000 vocabulary items (count desc, token asc
    // rank) — the rank/mass audit a tokenizer or sampling change is
    // judged against
    ("td_zipf_head",
      ((s, dir) => Collocations.zipfHead(docs(s, dir), "text",
        Seq(10, 100, 1000))),
      """WITH uni AS (
        |  SELECT unnest(list_filter(string_split_regex(lower(text),
        |    '\s+'), x -> len(x) > 0)) AS t
        |  FROM documents),
        |c AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS n
        |      FROM uni GROUP BY 1),
        |r AS (
        |  SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, t) AS rk,
        |    CAST(SUM(n) OVER () AS BIGINT) AS total
        |  FROM c),
        |ks AS (SELECT UNNEST([10, 100, 1000]) AS k)
        |SELECT CAST(ks.k AS BIGINT) AS k,
        |  CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |  CAST(SUM(r.n) AS BIGINT) AS head_mass,
        |  CAST(MIN(r.total) AS BIGINT) AS total_mass,
        |  CAST(SUM(r.n) * 1000000 // MIN(r.total) AS BIGINT)
        |    AS share_micro
        |FROM ks JOIN r ON r.rk <= ks.k
        |GROUP BY ks.k""".stripMargin),
    // index of dispersion (Fano factor) of each event type's daily
    // volume — the burstiness audit: Poisson-steady types sit near 1,
    // bursty ones far above; exact micros via the population-variance
    // identity
    ("st_dispersion",
      ((s, dir) => {
      val daily = events(s, dir)
        .withColumn("d", to_date(col("ts").cast("timestamp")))
        .groupBy(col("event_type"), col("d"))
        .agg(count(lit(1)).as("x"))
      Stats.dispersionByKey(daily, "event_type", "x")
    }),
      """WITH daily AS (
        |  SELECT event_type AS key, CAST(ts AS DATE) AS d,
        |    CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |agg AS (
        |  SELECT key, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS BIGINT) AS total,
        |    SUM(CAST(x AS HUGEINT) * x) AS sq
        |  FROM daily GROUP BY 1)
        |SELECT key, n, total,
        |  CASE WHEN total > 0 THEN
        |    CAST((CAST(n AS HUGEINT) * sq
        |      - CAST(total AS HUGEINT) * total) * 1000000
        |      // (CAST(n AS HUGEINT) * total) AS BIGINT) END
        |    AS dispersion_micro
        |FROM agg""".stripMargin),
    // QQ decile table of document length, English vs non-English —
    // the distribution-drift audit read decile by decile; exact lower
    // quantiles on both sides (never interpolated)
    ("st_qq_deciles",
      ((s, dir) => {
      val d = docs(s, dir)
      Stats.qqDeciles(d.filter(col("lang") === "en"),
        d.filter(col("lang") =!= "en"), "n_chars")
    }),
      """WITH qa AS (
        |  SELECT dec.decile, MIN(c.x) AS q_a FROM (
        |    SELECT x, SUM(c) OVER (ORDER BY x) AS cum,
        |      SUM(c) OVER () AS n
        |    FROM (SELECT n_chars AS x, COUNT(*) AS c FROM documents
        |          WHERE lang = 'en' AND n_chars IS NOT NULL
        |          GROUP BY 1)) c,
        |    (SELECT UNNEST(range(1, 10)) AS decile) dec
        |  WHERE c.cum >= (dec.decile * c.n + 9) // 10
        |  GROUP BY 1),
        |qb AS (
        |  SELECT dec.decile, MIN(c.x) AS q_b FROM (
        |    SELECT x, SUM(c) OVER (ORDER BY x) AS cum,
        |      SUM(c) OVER () AS n
        |    FROM (SELECT n_chars AS x, COUNT(*) AS c FROM documents
        |          WHERE lang <> 'en' AND n_chars IS NOT NULL
        |          GROUP BY 1)) c,
        |    (SELECT UNNEST(range(1, 10)) AS decile) dec
        |  WHERE c.cum >= (dec.decile * c.n + 9) // 10
        |  GROUP BY 1)
        |SELECT CAST(qa.decile AS BIGINT) AS decile,
        |  CAST(qa.q_a AS BIGINT) AS q_a, CAST(qb.q_b AS BIGINT) AS q_b,
        |  CAST(qb.q_b - qa.q_a AS BIGINT) AS gap
        |FROM qa JOIN qb ON qa.decile = qb.decile""".stripMargin),
    // winsorization audit at median ± 3·MAD (the Hampel identifier):
    // the outlier fence, per-side clip counts, and the winsorized
    // mean in exact micros — what a heavy-tailed length column needs
    // before its mean is worth reporting
    ("dq_winsorize",
      ((s, dir) => Stats.winsorizedStats(docs(s, dir), "n_chars",
        k = 3)),
      """WITH v AS (
        |  SELECT CAST(n_chars AS BIGINT) AS x FROM documents
        |  WHERE n_chars IS NOT NULL),
        |m1 AS (
        |  SELECT MIN(x) AS median, MAX(n) AS n FROM (
        |    SELECT x, SUM(c) OVER (ORDER BY x) AS cum,
        |      SUM(c) OVER () AS n, (SUM(c) OVER () + 1) // 2 AS k
        |    FROM (SELECT x, COUNT(*) AS c FROM v GROUP BY 1))
        |  WHERE cum >= k),
        |r AS (SELECT ABS(v.x - m1.median) AS x FROM v, m1),
        |m2 AS (
        |  SELECT MIN(x) AS mad FROM (
        |    SELECT x, SUM(c) OVER (ORDER BY x) AS cum,
        |      (SUM(c) OVER () + 1) // 2 AS k
        |    FROM (SELECT x, COUNT(*) AS c FROM r GROUP BY 1))
        |  WHERE cum >= k),
        |f AS (
        |  SELECT m1.n, m1.median, m2.mad,
        |    m1.median - 3 * m2.mad AS lo,
        |    m1.median + 3 * m2.mad AS hi
        |  FROM m1, m2),
        |w AS (
        |  SELECT f.n, f.median, f.mad, f.lo, f.hi,
        |    CAST(SUM(CASE WHEN v.x < f.lo THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_clipped_lo,
        |    CAST(SUM(CASE WHEN v.x > f.hi THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_clipped_hi,
        |    SUM(CAST(GREATEST(LEAST(v.x, f.hi), f.lo) AS HUGEINT))
        |      AS ws
        |  FROM v, f GROUP BY 1, 2, 3, 4, 5)
        |SELECT CAST(n AS BIGINT) AS n, CAST(median AS BIGINT)
        |    AS median, CAST(mad AS BIGINT) AS mad,
        |  CAST(lo AS BIGINT) AS lo, CAST(hi AS BIGINT) AS hi,
        |  n_clipped_lo, n_clipped_hi,
        |  CASE WHEN ws >= 0 THEN CAST(ws * 1000000 // n AS BIGINT)
        |    ELSE -CAST((-ws) * 1000000 // n AS BIGINT) END
        |    AS winsorized_mean_micro
        |FROM w""".stripMargin),
    // Kaplan–Meier churn survival over user lifetimes with 14-day
    // right-censoring — the retention curve with honest uncertainty
    // about still-active users; the oracle replays the product-limit
    // fold step for step via WITH RECURSIVE
    ("ts_kaplan_meier",
      ((s, dir) => Stats.kaplanMeier(events(s, dir), "user_id", "ts",
        censorDays = 14)),
      """WITH RECURSIVE u AS (
        |  SELECT user_id,
        |    CAST(date_diff('day', MIN(CAST(ts AS DATE)),
        |      MAX(CAST(ts AS DATE))) AS BIGINT) AS t,
        |    MAX(CAST(ts AS DATE)) AS last_day
        |  FROM events GROUP BY 1),
        |m AS (SELECT MAX(last_day) AS mx FROM u),
        |s AS (
        |  SELECT t,
        |    CAST(SUM(CASE WHEN last_day < mx - INTERVAL 14 DAY
        |      THEN 1 ELSE 0 END) AS BIGINT) AS d,
        |    CAST(SUM(CASE WHEN last_day < mx - INTERVAL 14 DAY
        |      THEN 0 ELSE 1 END) AS BIGINT) AS c
        |  FROM u, m GROUP BY 1),
        |o AS (
        |  SELECT t, d, c, ROW_NUMBER() OVER (ORDER BY t) AS rn,
        |    CAST(SUM(d + c) OVER () AS BIGINT) AS n_total,
        |    CAST(COALESCE(SUM(d + c) OVER (ORDER BY t ROWS BETWEEN
        |      UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS bfr
        |  FROM s),
        |rec AS (
        |  SELECT rn, t, d, c, n_total - bfr AS n_risk,
        |    (1000000 * (n_total - bfr - d)) // (n_total - bfr)
        |      AS s_micro
        |  FROM o WHERE rn = 1
        |  UNION ALL
        |  SELECT o.rn, o.t, o.d, o.c, o.n_total - o.bfr,
        |    (rec.s_micro * (o.n_total - o.bfr - o.d))
        |      // (o.n_total - o.bfr)
        |  FROM rec JOIN o ON o.rn = rec.rn + 1)
        |SELECT t, CAST(n_risk AS BIGINT) AS n_risk, d AS n_event,
        |  c AS n_censored, CAST(s_micro AS BIGINT) AS s_micro
        |FROM rec""".stripMargin),
    // Gini concentration of document length across the corpus — the
    // data-balance audit ("is corpus mass dominated by a few huge
    // documents?"); doubled rank sums grouped by distinct value, so
    // the only window runs over distinct lengths
    ("st_gini",
      ((s, dir) => Stats.giniConcentration(docs(s, dir), "n_chars")),
      """WITH v AS (
        |  SELECT n_chars AS x, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM documents WHERE n_chars IS NOT NULL AND n_chars >= 0
        |  GROUP BY 1),
        |w AS (SELECT x, c,
        |    CAST(SUM(c) OVER (ORDER BY x) - c AS BIGINT) AS f
        |  FROM v),
        |t AS (
        |  SELECT CAST(SUM(c) AS BIGINT) AS n,
        |    SUM(CAST(x AS HUGEINT) * c) AS sx,
        |    SUM(CAST(x AS HUGEINT) * c * (2 * f + c + 1)) AS srx2
        |  FROM w)
        |SELECT n, CAST(sx AS BIGINT) AS sum_x,
        |  CASE WHEN n >= 1 AND sx > 0 THEN
        |    CAST((srx2 - (n + 1) * sx) * 1000000 // (n * sx)
        |      AS BIGINT) END AS gini_micro,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM documents
        |   WHERE n_chars IS NULL OR n_chars < 0) AS n_skipped
        |FROM t""".stripMargin),
    // Chao1 vocabulary-richness estimate from singleton/doubleton
    // token counts — "how much vocabulary has this crawl slice NOT
    // seen yet"; one aggregation to token cardinality, one to
    // frequency-of-frequencies
    ("st_chao1",
      ((s, dir) => Stats.chao1Richness(
        docs(s, dir).select(explode(split(lower(col("text")), "\\s+"))
          .as("tok")), "tok")),
      """WITH w AS (
        |  SELECT unnest(list_filter(string_split_regex(lower(text),
        |    '\s+'), x -> len(x) > 0)) AS tok
        |  FROM documents),
        |c AS (SELECT tok, COUNT(*) AS n FROM w GROUP BY 1),
        |t AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS s_obs,
        |    CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS f1,
        |    CAST(SUM(CASE WHEN n = 2 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS f2
        |  FROM c)
        |SELECT s_obs, f1, f2,
        |  s_obs * 1000000 + CAST(CAST(f1 AS HUGEINT) * (f1 - 1)
        |    * 1000000 // (2 * (f2 + 1)) AS BIGINT) AS chao1_micro
        |FROM t""".stripMargin),
    // isotonic calibration of P(lang = en) against length buckets —
    // exact-rational PAV on the bucket table; the oracle replays the
    // closed-form minimax max_{j<=i} min_{k>=i} avg(j..k) over the
    // same buckets (floor commutes with max/min, so both roads land
    // on the same micros)
    ("eval_isotonic",
      ((s, dir) => EvalMetrics.isotonicCalibration(
        docs(s, dir).select(
          expr("least(n_chars div 100, 50L)").as("b"),
          (col("lang") === "en").as("y")), "b", "y")),
      """WITH b AS (
        |  SELECT LEAST(n_chars // 100, 50) AS b,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS p
        |  FROM documents GROUP BY 1),
        |c AS (
        |  SELECT b, n, p,
        |    CAST(SUM(n) OVER (ORDER BY b) AS BIGINT) AS cn,
        |    CAST(SUM(p) OVER (ORDER BY b) AS BIGINT) AS cp
        |  FROM b),
        |seg AS (
        |  SELECT j.b AS jb, k.b AS kb,
        |    (k.cp - j.cp + j.p) * 1000000 // (k.cn - j.cn + j.n)
        |      AS avg_micro
        |  FROM c j JOIN c k ON j.b <= k.b),
        |mn AS (
        |  SELECT i.b AS ib, s.jb AS jb, MIN(s.avg_micro) AS mv
        |  FROM c i JOIN seg s ON s.jb <= i.b AND s.kb >= i.b
        |  GROUP BY 1, 2),
        |iso AS (SELECT ib AS b, CAST(MAX(mv) AS BIGINT) AS iso_micro
        |        FROM mn GROUP BY 1)
        |SELECT b.b AS bucket, b.n, b.p AS n_pos, iso.iso_micro
        |FROM b JOIN iso ON b.b = iso.b""".stripMargin),
    // split-conformal coverage audit: per-source mean-length model on
    // the even-doc_id calibration half, absolute residuals as
    // nonconformity, the ceil((n+1)(1-alpha)) order statistic as the
    // threshold, and the odd-half coverage it achieves (the conformal
    // guarantee says >= 90%)
    ("eval_conformal",
      ((s, dir) => EvalMetrics.conformalCoverage(
        docs(s, dir).select(col("source").as("g"),
          col("n_chars").as("x"),
          (pmod(col("doc_id"), lit(2)) === 0).as("is_cal")),
        "g", "x", "is_cal", alphaMicro = 100000L)),
      """WITH r AS (
        |  SELECT source AS g, CAST(n_chars AS BIGINT) AS x,
        |    doc_id % 2 = 0 AS is_cal
        |  FROM documents WHERE n_chars IS NOT NULL
        |    AND source IS NOT NULL),
        |mm AS (
        |  SELECT g,
        |    CASE WHEN SUM(x) >= 0
        |      THEN SUM(x) * 1000000 // COUNT(*)
        |      ELSE -((-SUM(x)) * 1000000 // COUNT(*))
        |      END AS mean_micro
        |  FROM r WHERE is_cal GROUP BY 1),
        |sc AS (
        |  SELECT r.is_cal, ABS(r.x * 1000000 - mm.mean_micro) AS res
        |  FROM r JOIN mm ON r.g = mm.g),
        |cnt AS (
        |  SELECT CAST(SUM(CASE WHEN is_cal THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_cal,
        |    CAST(SUM(CASE WHEN is_cal THEN 0 ELSE 1 END) AS BIGINT)
        |      AS n_test
        |  FROM sc),
        |k AS (SELECT n_cal, n_test,
        |    CAST(((n_cal + 1) * 900000 + 999999) // 1000000
        |      AS BIGINT) AS k
        |  FROM cnt),
        |dr AS (
        |  SELECT res, COUNT(*) AS c FROM sc WHERE is_cal GROUP BY 1),
        |q AS (
        |  SELECT MIN(res) AS q_hat FROM (
        |    SELECT res, SUM(c) OVER (ORDER BY res) AS cum FROM dr), k
        |  WHERE cum >= k.k),
        |cov AS (
        |  SELECT CAST(SUM(CASE WHEN sc.res <=
        |      COALESCE(q.q_hat, 9223372036854775807)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
        |  FROM sc, q WHERE NOT sc.is_cal)
        |SELECT k.n_cal, k.n_test, k.k,
        |  CAST(q.q_hat AS BIGINT) AS q_hat, cov.n_covered,
        |  CASE WHEN k.n_test > 0 THEN
        |    CAST(cov.n_covered * 1000000 // k.n_test AS BIGINT)
        |    END AS coverage_micro
        |FROM k, q, cov""".stripMargin),
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

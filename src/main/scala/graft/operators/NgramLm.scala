package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Interpolated Kneser–Ney bigram language model — the count side of a
  * CCNet-style LM quality filter (Wenzek et al. 2020 rank web text by
  * LM score before keeping it; Kneser & Ney 1995 / Chen & Goodman 1998
  * give the discounted continuation-backoff estimate). Trained and
  * scored distributively, and held in EXACT integer micro-probabilities
  * so an independent engine replays every division bit-for-bit — the
  * same FP-free discipline as [[Sampling]]'s basis points.
  *
  * With the fixed discount d = 3/4 kept as a rational (no float ever
  * enters):
  *
  * {{{
  *   P(w2|w1) = max(c(w1w2) - d, 0)/c(w1·) + d·N1+(w1·)/c(w1·) · Pc(w2)
  *   Pc(w2)   = N1+(·w2) / T          (T = number of distinct bigrams)
  * }}}
  *
  * in micro units with integer division (numerators scaled by 4 to
  * clear the 3/4):
  *
  * {{{
  *   cont_micro(w2) = N1+(·w2) · 10^6 div T
  *   p_micro(w1,w2) = max(4·c12 − 3, 0) · 10^6 div (4·c1)
  *                  + 3 · N1+(w1·) · cont_micro(w2) div (4·c1)
  * }}}
  *
  * Scale shape: training is one (w1,w2)-keyed hash aggregation over
  * the exploded bigram stream (map-side partial combine does the heavy
  * lifting; the distinct-bigram table it produces is vocab²-bounded,
  * far below corpus size) and two marginal aggregations OVER THAT
  * TABLE — the corpus is scanned once. The pair table persists only
  * for the marginal passes and releases before train returns; the
  * returned model frame is persisted with ownership handed to the
  * caller ([[unpersistModel]] — the frames are deterministic, so a
  * release merely recomputes). Scoring joins the
  * corpus bigram stream to the model by (w1, w2): a shuffled equi-join
  * at vocabulary scale, a broadcast when the planner sees a small
  * model — either survives 100 TB because neither side is ever
  * collected. */
object NgramLm {

  /** (doc_id, w1, w2) per adjacent lowercase word pair. */
  private def bigramStream(docs: DataFrame, idCol: String,
                           textCol: String): DataFrame = {
    val w = TextFunctions.words(col(textCol))
    val bi = when(size(w) < 2,
      array().cast("array<struct<w1:string,w2:string>>"))
      .otherwise(arrays_zip(
        slice(w, lit(1), size(w) - 1).as("w1"),
        slice(w, lit(2), size(w) - 1).as("w2"))
        .cast("array<struct<w1:string,w2:string>>"))
    docs.select(col(idCol).as("doc_id"), explode(bi).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
  }

  /** Raw (w1, w2, c12) bigram counts of a corpus slice — the additive
    * half of the model: counts from disjoint slices UNION and re-sum
    * to exactly the whole corpus' counts, so an incrementally-growing
    * corpus keeps per-batch count deltas and refits via
    * [[trainFromCounts]] without ever re-scanning old batches (the
    * [[graft.streaming.Leaderboard]] count-delta idea applied to LM
    * training). */
  def pairCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    bigramStream(docs, idCol, textCol)
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))

  /** Trained model table, one row per distinct bigram:
    * (w1, w2, c12, c1, n1p_left, n1p_right, cont_micro, p_micro).
    * `c1` = Σ_w c(w1 w), `n1p_left` = N1+(w1·), `n1p_right` = N1+(·w2).
    * Runs ONE bounded driver action (the 1-row T count over the
    * persisted pair table) — train is eager in the same way
    * [[Sampling.dsirWeightsFull]] is. */
  def train(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    trainFromCounts(pairCounts(docs, idCol, textCol))

  /** [[train]] over PRE-AGGREGATED (w1, w2, c12) counts — the refit
    * entry point for an incremental corpus (union the per-batch
    * [[pairCounts]] deltas; they are re-summed per bigram here, so
    * unaggregated delta rows are fine). Marginals and the continuation
    * distribution are NOT additive — they re-derive from the summed
    * pair table, which is vocab²-bounded, so the refit never touches
    * the corpus. */
  def trainFromCounts(counts: DataFrame): DataFrame = {
    // persistence is scoped to THIS call: the pair table persists only
    // for the marginal passes below and releases before return, and the
    // returned MODEL frame is persisted with ownership handed to the
    // caller ([[unpersistModel]] when done). No module-level slot — a
    // caller holding two models keeps both cached, and concurrent
    // trains from different threads can't thrash each other.
    val pairCounts = counts
      .groupBy(col("w1"), col("w2"))
      .agg(sum(col("c12")).as("c12"))
      .persist()
    val left = pairCounts.groupBy(col("w1"))
      .agg(sum(col("c12")).as("c1"), count(lit(1)).as("n1p_left"))
    val right = pairCounts.groupBy(col("w2"))
      .agg(count(lit(1)).as("n1p_right"))
    // T collects as a driver scalar (ONE bounded 1-row action over the
    // persisted pair table — the dsirWeightsFull precedent) and inlines
    // as a literal: a broadcast 1-row frame would put a nested-loop
    // join in the plan of every downstream consumer of the model
    val t = pairCounts.agg(count(lit(1))).head.getLong(0)
    val model = pairCounts
      .join(left, Seq("w1"))
      .join(right, Seq("w2"))
      .withColumn("cont_micro",
        expr(s"n1p_right * 1000000L div greatest(${t}L, 1L)"))
      .withColumn("p_micro", expr(
        "greatest(4L * c12 - 3L, 0L) * 1000000L div (4L * c1) + " +
          "3L * n1p_left * cont_micro div (4L * c1)"))
      .select(col("w1"), col("w2"), col("c12"), col("c1"),
        col("n1p_left"), col("n1p_right"), col("cont_micro"),
        col("p_micro"))
      .persist()
    // materialize the (vocab²-bounded) model so the pair table can
    // release now instead of leaking past return — train was already
    // eager (the T count above), this adds one more bounded action
    model.count()
    pairCounts.unpersist(false)
    model
  }

  /** Release a model returned by [[train]]/[[trainFromCounts]]. The
    * frames are deterministic, so a release is always safe: a consumer
    * that still holds the model merely recomputes from the corpus. */
  def unpersistModel(model: DataFrame): Unit = { model.unpersist(false); () }

  /** Per-document LM statistics under a trained `model` — the exact
    * integer core a perplexity-style filter thresholds on:
    * (doc_id, n_bigrams, n_hits, sum_p_micro, min_p_micro).
    *
    * OOV fallbacks follow KN's backoff ladder, all integer-exact:
    * an unseen (w1,w2) whose w1 IS in the model scores the backoff
    * term alone (c12 = 0 kills the discounted term); an unseen w1
    * falls back to the bare continuation probability cont_micro(w2);
    * a w2 never seen as a continuation scores 0. Docs with no bigram
    * (single-word/empty text) are absent from the output — the caller
    * left-joins if it needs them. */
  def scoreDocs(docs: DataFrame, idCol: String, textCol: String,
                model: DataFrame): DataFrame = {
    val bi = bigramStream(docs, idCol, textCol)
    val exact = model.select(col("w1"), col("w2"),
      col("p_micro").as("_p_exact"))
    val left = model.groupBy(col("w1"))
      .agg(first(col("c1")).as("_c1"),
        first(col("n1p_left")).as("_n1l"))
    val right = model.groupBy(col("w2"))
      .agg(first(col("cont_micro")).as("_cont"))
    bi.join(exact, Seq("w1", "w2"), "left")
      .join(left, Seq("w1"), "left")
      .join(right, Seq("w2"), "left")
      .withColumn("_p", coalesce(
        col("_p_exact"),
        expr("3L * _n1l * coalesce(_cont, 0L) div (4L * _c1)"),
        col("_cont"), lit(0L)))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("_p_exact").isNotNull, 1L).otherwise(0L))
          .as("n_hits"),
        sum(col("_p")).as("sum_p_micro"),
        min(col("_p")).as("min_p_micro"))
  }

  /** (doc_id, w1, w2, w3) per adjacent lowercase word triple. */
  private def trigramStream(docs: DataFrame, idCol: String,
                            textCol: String): DataFrame = {
    val w = TextFunctions.words(col(textCol))
    val tri = when(size(w) < 3,
      array().cast("array<struct<w1:string,w2:string,w3:string>>"))
      .otherwise(arrays_zip(
        slice(w, lit(1), size(w) - 2).as("w1"),
        slice(w, lit(2), size(w) - 2).as("w2"),
        slice(w, lit(3), size(w) - 2).as("w3"))
        .cast("array<struct<w1:string,w2:string,w3:string>>"))
    docs.select(col(idCol).as("doc_id"), explode(tri).as("t"))
      .select(col("doc_id"), col("t.w1").as("w1"), col("t.w2").as("w2"),
        col("t.w3").as("w3"))
  }

  /** Per-group trigram NOVELTY — the memorization/duplication audit a
    * pretraining pipeline runs per source: what share of each doc's
    * DISTINCT word trigrams appears in NO other document? A source
    * whose novelty collapses is shipping templated or duplicated text
    * the near-dup pass may be missing (trigram document frequency is
    * finer-grained than whole-doc MinHash). Per group:
    * (n_docs, n_trigrams, n_novel, n_fully_novel, novelty_micro) —
    * docs with < 3 words carry no trigrams and are excluded;
    * novelty_micro = Σnovel·10⁶ div Σtrigrams (floored, exact).
    *
    * Scale shape: the inverted-index shape — per-doc distinct
    * trigrams (one corpus explode + dedup), document frequency by
    * trigram (hash agg on the trigram key), one join back, then a
    * group-sized rollup. No windows, no driver state; the trigram key
    * shuffles twice, which is what any cross-doc n-gram statistic
    * costs. */
  def ngramNovelty(docs: DataFrame, idCol: String, textCol: String,
                   groupCol: String): DataFrame = {
    val tg = trigramStream(docs, idCol, textCol)
      .distinct()
      .persist()
    try {
      val dfreq = tg.groupBy(col("w1"), col("w2"), col("w3"))
        .agg(count(lit(1)).as("df"))
      val perDoc = tg.join(dfreq, Seq("w1", "w2", "w3"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tg"),
          sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_novel"))
      docs.select(col(idCol).as("doc_id"), col(groupCol).as("grp"))
        .join(perDoc, Seq("doc_id"))
        .groupBy(col("grp"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tg")).as("n_trigrams"),
          sum(col("n_novel")).as("n_novel"),
          sum(when(col("n_novel") === col("n_tg"), 1L).otherwise(0L))
            .as("n_fully_novel"))
        // decimal inside: Σnovel·10⁶ can pass 2⁶³ on a 10¹³-token corpus
        .withColumn("novelty_micro", expr(
          "CASE WHEN n_trigrams > 0 THEN CAST(CAST(n_novel AS " +
            "DECIMAL(38,0)) * 1000000 div n_trigrams AS LONG) END"))
        .withColumnRenamed("grp", groupCol)
        .localCheckpoint(true)
    } finally { tg.unpersist(false); () }
  }

  /** Raw (w1, w2, w3, c123) trigram counts of a corpus slice — the
    * additive half of the trigram model, with the same delta-merge
    * contract as [[pairCounts]]. */
  def trigramCounts(docs: DataFrame, idCol: String,
                    textCol: String): DataFrame =
    trigramStream(docs, idCol, textCol)
      .groupBy(col("w1"), col("w2"), col("w3"))
      .agg(count(lit(1)).as("c123"))

  /** Interpolated Kneser–Ney TRIGRAM model — the full CCNet-grade LM
    * ladder, one level up from [[train]]:
    *
    *   P(w3|w1 w2) = max(c123 − d, 0)/c12
    *               + d·N1+(w1 w2 ·)/c12 · P_kn(w3|w2)
    *   P_kn(w3|w2) = max(N1+(· w2 w3) − d, 0)/N1+(· w2 ·)
    *               + d·N1+(w2 ·)/N1+(· w2 ·) · P_cont(w3)
    *   P_cont(w3)  = N1+(· w3)/T,  T = |distinct (w2, w3)|
    *
    * with d = 3/4 cleared by scaling numerators by 4, every division a
    * floor in exact integer micros — the bigram model's discipline
    * applied at both interpolation levels. The lower level uses
    * CONTINUATION counts (distinct left-context types), the textbook
    * KN structure. Everything derives from ONE distinct-trigram table:
    * c12/N1+(w1w2·) are its prefix marginals, N1+(·w2w3) its
    * left-type counts, N1+(·w2·)/N1+(w2·)/N1+(·w3) marginals of THOSE.
    *
    * Output per distinct trigram: (w1, w2, w3, c123, c12, n1p_12,
    * nc_23, nc_2d, n1p_2, cont_micro, pkn2_micro, p_micro).
    *
    * Scale shape: one corpus scan to trigram counts (map-side combine),
    * then marginal aggregations OVER the distinct-trigram table and
    * vocabulary-keyed equi-joins back. The model table is distinct-
    * trigram-sized — inherently large for a trigram LM; persistence is
    * caller-owned ([[unpersistModel]]), the same contract as [[train]].
    * One bounded driver action (the 1-row T count). */
  def trainTrigram(docs: DataFrame, idCol: String,
                   textCol: String): DataFrame =
    trainTrigramFromCounts(trigramCounts(docs, idCol, textCol))

  /** [[trainTrigram]] over PRE-AGGREGATED (w1, w2, w3, c123) deltas —
    * the incremental refit entry point (union per-batch
    * [[trigramCounts]]; shared bigrams re-sum here). */
  def trainTrigramFromCounts(counts: DataFrame): DataFrame = {
    val tri = counts
      .groupBy(col("w1"), col("w2"), col("w3"))
      .agg(sum(col("c123")).as("c123"))
      .persist()
    val pre = tri.groupBy(col("w1"), col("w2"))
      .agg(sum(col("c123")).as("c12"), count(lit(1)).as("n1p_12"))
    val c23 = tri.groupBy(col("w2"), col("w3"))
      .agg(count(lit(1)).as("nc_23"))
      .persist()
    val mid = c23.groupBy(col("w2"))
      .agg(sum(col("nc_23")).as("nc_2d"), count(lit(1)).as("n1p_2"))
    val uni = c23.groupBy(col("w3")).agg(count(lit(1)).as("nc_3"))
    val t = c23.agg(count(lit(1))).head.getLong(0)
    val pair = c23
      .join(mid, Seq("w2"))
      .join(uni, Seq("w3"))
      .withColumn("cont_micro",
        expr(s"nc_3 * 1000000L div greatest(${t}L, 1L)"))
      .withColumn("pkn2_micro", expr(
        "greatest(4L * nc_23 - 3L, 0L) * 1000000L div (4L * nc_2d) + " +
          "3L * n1p_2 * cont_micro div (4L * nc_2d)"))
      .select(col("w2"), col("w3"), col("nc_23"), col("nc_2d"),
        col("n1p_2"), col("cont_micro"), col("pkn2_micro"))
    val model = tri
      .join(pre, Seq("w1", "w2"))
      .join(pair, Seq("w2", "w3"))
      .withColumn("p_micro", expr(
        "greatest(4L * c123 - 3L, 0L) * 1000000L div (4L * c12) + " +
          "3L * n1p_12 * pkn2_micro div (4L * c12)"))
      .select(col("w1"), col("w2"), col("w3"), col("c123"), col("c12"),
        col("n1p_12"), col("nc_23"), col("nc_2d"), col("n1p_2"),
        col("cont_micro"), col("pkn2_micro"), col("p_micro"))
      .persist()
    model.count()
    tri.unpersist(false)
    c23.unpersist(false)
    model
  }

  /** Per-document trigram LM statistics under a [[trainTrigram]]
    * model: (doc_id, n_trigrams, n_hits, sum_p_micro, min_p_micro).
    * OOV ladder, all integer-exact: unseen trigram with a seen
    * (w1,w2) prefix scores the prefix backoff alone
    * (3·n1p_12·pkn2 div (4·c12) — pkn2 falls back through ITS ladder
    * when (w2,w3) is unseen); an unseen prefix falls to pkn2(w2,w3);
    * an unseen (w2,w3) with a seen middle w2 falls to that level's
    * backoff (3·n1p_2·cont div (4·nc_2d)); an unseen w2 falls to the
    * bare cont(w3); a w3 never seen as a continuation scores 0. Docs
    * shorter than 3 words are absent — the caller left-joins. */
  def scoreDocsTrigram(docs: DataFrame, idCol: String, textCol: String,
                       model: DataFrame): DataFrame = {
    val tg = trigramStream(docs, idCol, textCol)
    val exact = model.select(col("w1"), col("w2"), col("w3"),
      col("p_micro").as("_p_exact"))
    val pre = model.groupBy(col("w1"), col("w2"))
      .agg(first(col("c12")).as("_c12"), first(col("n1p_12")).as("_n12"))
    val pair = model.groupBy(col("w2"), col("w3"))
      .agg(first(col("pkn2_micro")).as("_pkn2"))
    val mid = model.groupBy(col("w2"))
      .agg(first(col("nc_2d")).as("_nc2d"), first(col("n1p_2")).as("_n2"))
    val uni = model.groupBy(col("w3"))
      .agg(first(col("cont_micro")).as("_cont"))
    tg.join(exact, Seq("w1", "w2", "w3"), "left")
      .join(pre, Seq("w1", "w2"), "left")
      .join(pair, Seq("w2", "w3"), "left")
      .join(mid, Seq("w2"), "left")
      .join(uni, Seq("w3"), "left")
      // the lower-order estimate this trigram backs off INTO: the pair
      // probability when (w2,w3) is known, else that level's own ladder
      .withColumn("_p2", coalesce(
        col("_pkn2"),
        expr("3L * _n2 * coalesce(_cont, 0L) div (4L * _nc2d)"),
        col("_cont"), lit(0L)))
      .withColumn("_p", coalesce(
        col("_p_exact"),
        expr("3L * _n12 * _p2 div (4L * _c12)"),
        col("_p2")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_trigrams"),
        sum(when(col("_p_exact").isNotNull, 1L).otherwise(0L))
          .as("n_hits"),
        sum(col("_p")).as("sum_p_micro"),
        min(col("_p")).as("min_p_micro"))
  }
}

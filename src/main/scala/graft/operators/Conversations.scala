package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SFT / chat-style conversation assembly from an event stream.
  *
  * The instruction-tuning data shape: group a user's events into
  * conversations (gap-based sessionization), render each event as a
  * templated turn, truncate every conversation to a token budget
  * (prefix-keep: a turn lands only if the running token total still
  * fits), and drop degenerate conversations with fewer than `minTurns`
  * kept turns. The output is one row per conversation with the rendered
  * transcript — the record a chat-template tokenizer consumes.
  *
  * Scale shape: ONE exchange of the event stream, total (plan-audited).
  * The gap window hash-partitions on `user_id`, and hash(user_id)
  * already clusters (user_id, conv), so the per-conversation
  * running-token window AND the final per-conversation aggregation
  * both reuse that partitioning — the plan is `Exchange → windows →
  * ObjectHashAggregate` with no further exchange. Transcript ordering
  * inside the aggregation is made shuffle-order-proof by sorting the
  * collected (ts, event_id, text) structs, never by trusting
  * collect_list order. Nothing wider than one user's conversation ever
  * sits in one task.
  */
object Conversations {

  /** Transcript turn delimiter. Printable on purpose: gate outputs are
    * row-canonicalized line-by-line by external checkers, so a raw
    * `\n` inside a value is the one encoding that breaks them (it did,
    * round 11). A chat-template tokenizer treats the delimiter as an
    * opaque token either way. */
  val TurnSep = " | "

  /** Turn rendering shared by the batch and streaming forms: the
    * templated turn text (`<event_type> value=<cents> k=<k>`) and its
    * whitespace token count. Pure projection — rides the scan. */
  private def withTurns(events: DataFrame): DataFrame = events
    .withColumn("cents", round(col("value") * 100).cast("long"))
    .withColumn("k",
      get_json_object(col("props"), "$.k").cast("long"))
    .withColumn("turn_text", concat_ws(" ",
      col("event_type"),
      concat(lit("value="), col("cents")),
      concat(lit("k="), col("k"))))
    .withColumn("turn_tokens", size(split(col("turn_text"), " ")))

  /** Assemble conversations from `events` (event_id, ts, user_id,
    * event_type, value, props). Returns one row per kept conversation:
    * (conv_id, user_id, n_turns, all_turns, total_tokens, truncated,
    * text). Turn template: `<event_type> value=<cents> k=<k>`;
    * `tokenBudget` bounds the whitespace-token total of kept turns. */
  def assemble(events: DataFrame,
               gapMinutes: Int = 30,
               tokenBudget: Int = 30,
               minTurns: Int = 2): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val turns = withTurns(events)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_conv",
        // the events table stores TIMESTAMP_NTZ; route the epoch cast
        // through timestamp (session tz is pinned UTC for oracle parity)
        when(col("prev_ts").isNull ||
          col("ts").cast("timestamp").cast("long") -
            col("prev_ts").cast("timestamp").cast("long") >
            gapMinutes * 60L, 1L).otherwise(0L))
      .withColumn("conv", sum(col("new_conv")).over(byUser))

    val byConv = Window.partitionBy(col("user_id"), col("conv"))
      .orderBy(col("ts"), col("event_id"))
    val cut = turns
      .withColumn("cum_tokens", sum(col("turn_tokens")).over(byConv))
      .withColumn("all_turns",
        count(lit(1)).over(Window.partitionBy(col("user_id"), col("conv"))))
      .filter(col("cum_tokens") <= tokenBudget)

    cut.groupBy(col("user_id"), col("conv"))
      .agg(
        count(lit(1)).as("n_turns"),
        max(col("all_turns")).as("all_turns"),
        sum(col("turn_tokens")).as("total_tokens"),
        array_sort(collect_list(
          struct(col("ts"), col("event_id"), col("turn_text"))))
          .as("sorted"))
      .filter(col("n_turns") >= minTurns)
      .select(
        concat(col("user_id"), lit("-"), col("conv")).as("conv_id"),
        col("user_id"),
        col("n_turns"),
        col("all_turns"),
        col("total_tokens"),
        (col("all_turns") > col("n_turns")).as("truncated"),
        concat_ws(TurnSep,
          transform(col("sorted"), t => t.getField("turn_text")))
          .as("text"))
  }

  /** Streaming twin of [[assemble]] on `session_window` — conversations
    * finalize and emit when the event-time watermark passes their gap
    * (Append mode), which is exactly when a gap-sessionized
    * conversation is KNOWN complete. One stateful aggregation: Spark's
    * session-window state merges events into open sessions per user and
    * evicts closed ones; the token-budget cut and the transcript render
    * run on the collected (small, per-conversation) turn array AFTER
    * the window closes, as one fold — no second stateful stage.
    *
    * Gap parity: the batch rule starts a new conversation when the gap
    * is STRICTLY GREATER than `gapMinutes`; `session_window` splits at
    * gap >= duration, so the stream uses `gapMinutes*60 + 1` seconds —
    * the two forms produce identical groupings on second-granularity
    * data (ConversationsSpec proves output equality on the same
    * events). `conv_id` is `user-<session start epoch>` (a stream has
    * no global per-user session index); all other columns match
    * [[assemble]]. */
  def assembleStream(events: DataFrame,
                     gapMinutes: Int = 30,
                     tokenBudget: Int = 30,
                     minTurns: Int = 2,
                     watermark: String = "1 hour"): DataFrame = {
    val turns = withTurns(events)
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
    val sess = turns
      .groupBy(col("user_id"),
        session_window(col("ts"), s"${gapMinutes * 60 + 1} seconds"))
      .agg(array_sort(collect_list(struct(
        col("ts"), col("event_id"),
        col("turn_text"), col("turn_tokens")))).as("sorted"))
    // prefix token-budget fold over the closed conversation's turns:
    // cum always advances (the budget rule is on the running total),
    // kept turns append to the transcript while it still fits
    val acc0 = struct(lit(0L).as("cum"),
      array().cast("array<string>").as("texts"),
      lit(0L).as("tok"), lit(0L).as("n"))
    val folded = aggregate(col("sorted"), acc0, (acc, t) => {
      val cum2 = acc.getField("cum") + t.getField("turn_tokens")
      val keep = cum2 <= tokenBudget
      struct(cum2.as("cum"),
        when(keep, concat(acc.getField("texts"),
            array(t.getField("turn_text"))))
          .otherwise(acc.getField("texts")).as("texts"),
        when(keep, acc.getField("tok") + t.getField("turn_tokens"))
          .otherwise(acc.getField("tok")).as("tok"),
        when(keep, acc.getField("n") + 1)
          .otherwise(acc.getField("n")).as("n"))
    })
    sess
      .withColumn("_f", folded)
      .select(
        concat(col("user_id"), lit("-"),
          unix_timestamp(col("session_window.start"))).as("conv_id"),
        col("user_id"),
        col("_f").getField("n").as("n_turns"),
        size(col("sorted")).cast("long").as("all_turns"),
        col("_f").getField("tok").as("total_tokens"),
        (size(col("sorted")).cast("long") >
          col("_f").getField("n")).as("truncated"),
        concat_ws(TurnSep, col("_f").getField("texts")).as("text"))
      .filter(col("n_turns") >= minTurns)
  }

  /** Shared prep of the preference/judgment family (pairs, rankings,
    * best-of-N, comparisons): the calendar day, the exact integer
    * cents, and the exclusion of UNSCORED events — a null score
    * carries no preference signal, and concretely a null `cents`
    * field would sort FIRST inside the `min(struct(-cents, ...))`
    * extremes fold (Spark orders null struct fields before every
    * value) and steal the argmax from a real candidate, where the
    * batch rank windows would have put it last. One rule, applied in
    * one place. */
  private def dayCents(events: DataFrame): DataFrame =
    events
      .withColumn("day",
        date_format(col("ts").cast("timestamp"), "yyyy-MM-dd"))
      .withColumn("cents", round(col("value") * 100).cast("long"))
      .filter(col("cents").isNotNull)

  /** Streaming twin of [[dayCents]]: the watermark replaces the day
    * column (the tumbling window derives it at emission). Unscored
    * rows are NOT row-filtered here — a deterministic filter gets
    * pushed below the EventTimeWatermark node, so dropping them would
    * also drop their event TIMES and a value-less heartbeat/sentinel
    * could no longer advance the watermark (exactly the bug a
    * sentinel-closed last window exposes). The stream aggregations
    * null-guard the cents inside their min(struct)/count folds
    * instead ([[scoredStruct]]), which excludes unscored rows from
    * the extremes and the candidate count while their timestamps
    * still feed the watermark. */
  private def watermarkCents(events: DataFrame,
                             watermark: String): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .withColumn("cents", round(col("value") * 100).cast("long"))

  /** The null-guarded extremes input: NULL for unscored rows, so a
    * min(...) fold skips them (aggregate functions ignore NULL inputs)
    * while the row itself still reaches the watermark operator. */
  private def scoredStruct(fields: Column*): Column =
    when(col("cents").isNotNull, struct(fields: _*))

  /** Preference-pair assembly (the DPO/RLHF reward-pair shape): within
    * each candidate group — here a user's events on one day — pick the
    * highest- and lowest-scored members as (chosen, rejected), skip
    * groups whose extremes tie (an equal-score pair carries no
    * preference signal). Scores are compared in exact integer cents so
    * the pick and the margin replay engine-exact; ties inside a rank
    * break to the lower event_id.
    *
    * Scale shape: ONE exchange — both rank windows and the trailing
    * aggregation share the (user_id, day) clustering, and only the two
    * extreme rows per group survive the rank filter into the
    * aggregation. No group ever needs more than its own rows in one
    * task. */
  def preferencePairs(events: DataFrame): DataFrame = {
    val e = dayCents(events)
    val part = Window.partitionBy(col("user_id"), col("day"))
    val byDesc = part.orderBy(col("cents").desc, col("event_id"))
    val byAsc = part.orderBy(col("cents").asc, col("event_id"))
    e.withColumn("rn_hi", row_number().over(byDesc))
      .withColumn("rn_lo", row_number().over(byAsc))
      .withColumn("n_candidates", count(lit(1)).over(part))
      .filter(col("rn_hi") === 1 || col("rn_lo") === 1)
      .groupBy(col("user_id"), col("day"))
      .agg(
        max(when(col("rn_hi") === 1, col("event_id"))).as("chosen_id"),
        max(when(col("rn_hi") === 1, col("cents"))).as("chosen_cents"),
        max(when(col("rn_lo") === 1, col("event_id"))).as("rejected_id"),
        max(when(col("rn_lo") === 1, col("cents"))).as("rejected_cents"),
        max(col("n_candidates")).as("n_candidates"))
      .filter(col("chosen_cents") > col("rejected_cents"))
      .select(
        concat(col("user_id"), lit("-"), col("day")).as("pair_id"),
        col("user_id"), col("day"),
        col("chosen_id"), col("rejected_id"),
        (col("chosen_cents") - col("rejected_cents")).as("margin_cents"),
        col("n_candidates"))
  }

  /** Streaming twin of [[preferencePairs]]: a tumbling daily event-time
    * window replaces the day column, and the extremes come from
    * single-pass `max/min(struct(...))` aggregates — the rank windows
    * the batch form uses are not streamable, but picking extremes
    * never needed ranks: `min(struct(-cents, event_id))` IS
    * "highest cents, ties to the lower event_id" (and `min(struct(
    * cents, event_id))` its mirror), so state per open group is two
    * structs and a count regardless of group size — negating the
    * CENTS (always numeric) rather than the id keeps the pick
    * type-agnostic, so pipeline streams with string message ids rank
    * exactly like the batch gate's long ids. Pairs finalize and
    * emit when the watermark closes their day (Append mode). Output
    * columns are identical to the batch form, pair_id included
    * (ConversationsSpec proves set equality on the same events). */
  def preferencePairsStream(events: DataFrame,
                            watermark: String = "1 hour"): DataFrame = {
    val e = watermarkCents(events, watermark)
    e.groupBy(col("user_id"), window(col("ts"), "1 day"))
      .agg(
        min(scoredStruct((-col("cents")).as("neg_c"), col("event_id")))
          .as("hi"),
        min(scoredStruct(col("cents"), col("event_id"))).as("lo"),
        count(col("cents")).as("n_candidates"))
      .withColumn("day", date_format(col("window.start"), "yyyy-MM-dd"))
      .select(
        concat(col("user_id"), lit("-"), col("day")).as("pair_id"),
        col("user_id"), col("day"),
        col("hi.event_id").as("chosen_id"),
        col("lo.event_id").as("rejected_id"),
        ((-col("hi.neg_c")) - col("lo.cents")).as("margin_cents"),
        col("n_candidates"))
      .filter(col("margin_cents") > 0)
  }

  /** Best-of-N rejection sampling — the synthetic-data selection step
    * (Lightman-style rejection sampling / best-of-n distillation):
    * within each candidate group (a user's events on one day, the
    * [[preferencePairs]] group shape) keep ONLY the highest-scored
    * candidate, and accept the group iff that best score clears
    * `minCents` — groups whose best candidate is still poor are
    * rejected outright rather than letting a weak example into the
    * distillation set. Scores compare in exact integer cents, ties
    * break to the lower event_id (same contract as the pair ops).
    *
    * Scale shape: ONE exchange and O(1) state per group — the argmax
    * is a single `min(struct(-cents, event_id))` aggregate (no rank
    * window at all), so the partial aggregation combines map-side and
    * a group's size never matters. Emits every group with its verdict
    * (`accepted`); the training cut is `filter($"accepted")`. */
  def bestOfN(events: DataFrame, minCents: Long = 0L): DataFrame = {
    val e = dayCents(events)
    e.groupBy(col("user_id"), col("day"))
      .agg(
        min(struct((-col("cents")).as("neg_c"), col("event_id"))).as("hi"),
        count(lit(1)).as("n_candidates"))
      .select(
        concat(col("user_id"), lit("-"), col("day")).as("group_id"),
        col("user_id"), col("day"),
        col("hi.event_id").as("chosen_id"),
        (-col("hi.neg_c")).as("best_cents"),
        col("n_candidates"),
        (-col("hi.neg_c") >= minCents).as("accepted"))
  }

  /** Group-relative advantage — the GRPO reward-normalization step
    * (Shao et al. 2024, "DeepSeekMath"): within each candidate group
    * (a prompt's N sampled completions; here a user's scored events on
    * one day), each sample's advantage is its reward minus the group
    * mean, normalized by the group standard deviation — no value model,
    * the group IS the baseline. All integer arithmetic in milli-cents
    * so the oracle replays it: mean = sign-split integer division,
    * variance accumulates deviation squares in decimal(38,0) (a
    * corpus-scale group would overflow a long), and
    * std = floor(sqrt(variance)) — exact cross-engine for variance
    * < 2^52 since both engines take an IEEE double sqrt of an exactly-
    * representable integer. A zero-std group (all rewards equal) has
    * no relative signal: adv_bp = 0. Groups need n >= 2.
    *
    * Scale shape: ONE exchange — both window passes (mean, then
    * deviation-square sum) and everything after share the
    * (user_id, day) clustering; state per group is O(1) aggregates,
    * never a sort. */
  def groupAdvantage(events: DataFrame): DataFrame = {
    val e = dayCents(events)
    val part = Window.partitionBy(col("user_id"), col("day"))
    e.withColumn("n_candidates", count(lit(1)).over(part))
      .filter(col("n_candidates") >= 2)
      .withColumn("_sum", sum(col("cents")).over(part))
      // sign-split integer division: Spark's div truncates toward
      // zero while DuckDB's // floors — they only agree on
      // non-negative dividends, so every division here runs on abs()
      .withColumn("mean_milli", expr(
        "CASE WHEN _sum >= 0 THEN (_sum * 1000L) div n_candidates " +
          "ELSE -((-_sum * 1000L) div n_candidates) END"))
      .withColumn("dev_milli", col("cents") * 1000L - col("mean_milli"))
      .withColumn("_var", expr(
        "CAST((sum(CAST(dev_milli AS DECIMAL(38,0)) * dev_milli) OVER " +
          "(PARTITION BY user_id, day)) div n_candidates AS LONG)"))
      .withColumn("std_milli", floor(sqrt(col("_var"))).cast("long"))
      .withColumn("adv_bp", when(col("std_milli") > 0, expr(
        "CASE WHEN dev_milli >= 0 " +
          "THEN (dev_milli * 10000L) div std_milli " +
          "ELSE -((-dev_milli * 10000L) div std_milli) END"))
        .otherwise(0L))
      .select(col("user_id"), col("day"), col("event_id"), col("cents"),
        col("n_candidates"), col("mean_milli"), col("dev_milli"),
        col("std_milli"), col("adv_bp"))
  }

  /** Streaming twin of [[groupAdvantage]]'s GROUP-level statistics —
    * the baseline a GRPO trainer joins its samples against, emitted as
    * each candidate day closes. State per open group is O(1): count,
    * sum, and a decimal(38,0) sum of squares; the deviation-square sum
    * then comes from the algebraic identity
    *
    *   Σ(1000·x − m)² = 10⁶·Σx² − 2000·m·Σx + n·m²
    *
    * with m the SAME sign-split truncated mean_milli the batch form
    * uses — so the streamed std_milli is bit-identical to
    * [[groupAdvantage]]'s per-row fold (spec-proved), not a float
    * approximation. Unscored (null-cents) rows stay out of every sum
    * while their timestamps still advance the watermark
    * ([[watermarkCents]]). Output per closed group: (user_id, day,
    * n_candidates, sum_cents, mean_milli, std_milli). */
  def groupStatsStream(events: DataFrame,
                       watermark: String = "1 hour"): DataFrame = {
    val e = watermarkCents(events, watermark)
    e.groupBy(col("user_id"), window(col("ts"), "1 day"))
      .agg(count(col("cents")).as("n_candidates"),
        sum(col("cents")).as("_sum"),
        sum(col("cents").cast("decimal(38,0)") * col("cents")).as("_sq"))
      .filter(col("n_candidates") >= 2)
      .withColumn("day", date_format(col("window.start"), "yyyy-MM-dd"))
      .withColumn("mean_milli", expr(
        "CASE WHEN _sum >= 0 THEN (_sum * 1000L) div n_candidates " +
          "ELSE -((-_sum * 1000L) div n_candidates) END"))
      .withColumn("_devsum", expr(
        "CAST(1000000 AS DECIMAL(38,0)) * _sq " +
          "- CAST(2000 AS DECIMAL(38,0)) * mean_milli * _sum " +
          "+ CAST(n_candidates AS DECIMAL(38,0)) * mean_milli * mean_milli"))
      .withColumn("std_milli",
        floor(sqrt(expr("CAST(_devsum div n_candidates AS LONG)")))
          .cast("long"))
      .select(col("user_id"), col("day"), col("n_candidates"),
        col("_sum").as("sum_cents"), col("mean_milli"), col("std_milli"))
  }

  /** Streaming twin of [[bestOfN]]: the day column becomes a tumbling
    * daily event-time window and the argmax is the same single-pass
    * `min(struct(-cents, event_id))` fold, so state per open group is
    * one struct and a count regardless of group size. Groups finalize
    * when the watermark closes their day (Append mode); output columns
    * are identical to the batch form. */
  def bestOfNStream(events: DataFrame, minCents: Long = 0L,
                    watermark: String = "1 hour"): DataFrame = {
    val e = watermarkCents(events, watermark)
    e.groupBy(col("user_id"), window(col("ts"), "1 day"))
      .agg(
        min(scoredStruct((-col("cents")).as("neg_c"), col("event_id")))
          .as("hi"),
        count(col("cents")).as("n_candidates"))
      .filter(col("hi").isNotNull) // all-unscored group: no candidate
      .withColumn("day", date_format(col("window.start"), "yyyy-MM-dd"))
      .select(
        concat(col("user_id"), lit("-"), col("day")).as("group_id"),
        col("user_id"), col("day"),
        col("hi.event_id").as("chosen_id"),
        (-col("hi.neg_c")).as("best_cents"),
        col("n_candidates"),
        (-col("hi.neg_c") >= minCents).as("accepted"))
  }

  /** Pairwise TYPE comparisons from the candidate-group extremes — the
    * judgment stream a live leaderboard consumes: per (user, day), the
    * highest- and lowest-scored events' TYPES become one
    * (winner, loser) comparison. Tied extremes carry no signal and
    * same-type comparisons say nothing about relative strength — both
    * drop. Same one-exchange min/max-struct shape as
    * [[preferencePairs]] (the structs just carry the type along). */
  def comparisons(events: DataFrame): DataFrame = {
    val e = dayCents(events)
    e.groupBy(col("user_id"), col("day"))
      .agg(
        min(struct((-col("cents")).as("neg_c"), col("event_id"),
          col("event_type"))).as("hi"),
        min(struct(col("cents"), col("event_id"),
          col("event_type"))).as("lo"))
      .select(col("user_id"), col("day"),
        col("hi.event_type").as("winner"),
        col("lo.event_type").as("loser"),
        ((-col("hi.neg_c")) - col("lo.cents")).as("margin_cents"))
      .filter(col("margin_cents") > 0 && col("winner") =!= col("loser"))
  }

  /** Streaming twin of [[comparisons]]: tumbling daily window, Append
    * on watermark close — a closed day emits its one judgment. */
  def comparisonsStream(events: DataFrame,
                        watermark: String = "1 hour"): DataFrame = {
    val e = watermarkCents(events, watermark)
    e.groupBy(col("user_id"), window(col("ts"), "1 day"))
      .agg(
        min(scoredStruct((-col("cents")).as("neg_c"), col("event_id"),
          col("event_type"))).as("hi"),
        min(scoredStruct(col("cents"), col("event_id"),
          col("event_type"))).as("lo"))
      .filter(col("hi").isNotNull) // all-unscored group: no judgment
      .withColumn("day", date_format(col("window.start"), "yyyy-MM-dd"))
      .select(col("user_id"), col("day"),
        col("hi.event_type").as("winner"),
        col("lo.event_type").as("loser"),
        ((-col("hi.neg_c")) - col("lo.cents")).as("margin_cents"))
      .filter(col("margin_cents") > 0 && col("winner") =!= col("loser"))
  }

  /** Instruction-data quality audit over [[assemble]]'s output — the
    * filter battery an SFT corpus runs before training: exact-duplicate
    * transcripts (keep the first by conv_id; duplicated responses
    * overweight a behavior), degenerate short conversations, and
    * over-budget transcripts. Emits EVERY conversation with its
    * verdict (`keep`) and the FIRST failing reason in a fixed severity
    * order (`dup_text` > `too_short` > `over_budget`) — the audit
    * frame; training keeps `filter($"keep")`.
    *
    * Scale shape: one hash exchange on the transcript fingerprint
    * (md5(text), never the transcript itself as a join key) for the
    * dup window; everything else is a projection. Flags are
    * independent, so a kept row's reason is null and a dropped row
    * reports the highest-severity cause deterministically. */
  def sftFilter(convs: DataFrame, minTurns: Long = 3,
                maxTokens: Long = 25): DataFrame = {
    val byText = Window.partitionBy(md5(col("text")))
      .orderBy(col("conv_id"))
    val flagged = convs
      .withColumn("dup_text", row_number().over(byText) > 1)
      .withColumn("too_short", col("n_turns") < minTurns)
      .withColumn("over_budget", col("total_tokens") > maxTokens)
    flagged.select(
      col("conv_id"), col("user_id"), col("n_turns"),
      col("total_tokens"),
      col("dup_text"), col("too_short"), col("over_budget"),
      (!col("dup_text") && !col("too_short") && !col("over_budget"))
        .as("keep"),
      when(col("dup_text"), "dup_text")
        .when(col("too_short"), "too_short")
        .when(col("over_budget"), "over_budget")
        .as("reason"))
  }

  /** Template-leakage audit over [[assemble]]'s output — the check
    * exact-dup filtering misses: transcripts that OPEN identically for
    * `prefixTokens` tokens are one template stamped onto different
    * tails (boilerplate openers, copy-pasted instruction frames), and
    * a model trained on them overfits the opener. Groups conversations
    * by their k-token prefix and reports every prefix shared by at
    * least `minConvs` conversations, with its frequency and how many
    * DISTINCT full transcripts hide behind it (`n_variants` — 1 means
    * plain duplication, high means a live template).
    *
    * Scale shape: transcripts are projected down to (prefix,
    * fingerprint) BEFORE any exchange, so the audit's aggregation
    * shuffles (two, from the distinct count: partial by (prefix, fp),
    * final by prefix) carry bounded bytes per row — never the
    * transcript. */
  def templatePrefixes(convs: DataFrame, prefixTokens: Int = 3,
                       minConvs: Long = 2): DataFrame = {
    require(prefixTokens > 0, "prefixTokens must be positive")
    val prefix = array_join(
      slice(split(col("text"), " "), 1, prefixTokens), " ")
    convs
      .select(prefix.as("prefix"), md5(col("text")).as("fp"))
      .groupBy(col("prefix"))
      .agg(count(lit(1)).as("n_convs"),
        countDistinct(col("fp")).as("n_variants"))
      .filter(col("n_convs") >= minConvs)
  }

  /** SFT loss-mask spans over [[assemble]]'s output — the step between
    * transcript assembly and the trainer: SFT computes loss only on
    * the response turns, so the tokenizer job needs, per turn, its
    * exact character span `[start_char, end_char)` inside the rendered
    * transcript plus a `trainable` flag. One row per (conversation,
    * turn); `trainable` is a predicate over `turn_idx` / `turn_text`
    * (default: the prompt/response alternation convention — odd turn
    * indices train).
    *
    * Scale shape: ZERO exchanges — the transcript is split and the
    * per-turn offsets computed array-side (`transform` with index +
    * `aggregate` over the preceding slice; conversations are
    * token-budgeted so the O(turns²) length fold is a few dozen adds),
    * then one explode. Never a window over the corpus: offsets need
    * only the turns already inside the row. */
  def lossMaskSpans(convs: DataFrame,
                    sep: String = TurnSep,
                    trainable: Column =
                      pmod(col("turn_idx"), lit(2)) === 1): DataFrame = {
    val sepLen = sep.length.toLong
    val turns = split(col("text"), java.util.regex.Pattern.quote(sep))
    val spans = transform(turns, (t, i) => struct(
      i.cast("int").as("turn_idx"),
      t.as("turn_text"),
      (aggregate(slice(turns, lit(1), i), lit(0L),
        (acc, x) => acc + length(x)) + i.cast("long") * sepLen)
        .as("start_char")))
    convs
      .select(col("conv_id"), col("user_id"), explode(spans).as("s"))
      .select(col("conv_id"), col("user_id"),
        col("s.turn_idx").as("turn_idx"),
        col("s.turn_text").as("turn_text"),
        col("s.start_char").as("start_char"),
        (col("s.start_char") + length(col("s.turn_text")).cast("long"))
          .as("end_char"))
      .withColumn("trainable", trainable)
  }

  /** K-wise preference rankings — the listwise generalization of
    * [[preferencePairs]] (the InstructGPT-style reward-model shape:
    * per prompt, several candidate completions in strict preference
    * order, not just a (chosen, rejected) extreme pair). Within each
    * candidate group (a user's events on one day) the top `k` members
    * by exact integer cents (ties to the lower event_id) are emitted
    * as one row per rank, each carrying its margin to the NEXT ranked
    * candidate (the listwise training signal; null when no candidate
    * follows). Groups need at least two candidates — a ranking of one
    * carries no preference.
    *
    * Scale shape: ONE exchange — the rank window, the lead window and
    * the group count all share the (user_id, day) clustering, and the
    * `rank <= k` filter drops every non-ranked row before anything
    * downstream. No group ever needs more than its own rows in one
    * task. */
  def preferenceRankings(events: DataFrame, k: Int = 4): DataFrame = {
    require(k >= 2, "a ranking needs k >= 2 slots")
    val e = dayCents(events)
    val part = Window.partitionBy(col("user_id"), col("day"))
    val order = part.orderBy(col("cents").desc, col("event_id"))
    e.withColumn("rank", row_number().over(order))
      .withColumn("next_cents", lead(col("cents"), 1).over(order))
      .withColumn("n_candidates", count(lit(1)).over(part))
      .filter(col("rank") <= k && col("n_candidates") >= 2)
      .select(
        concat(col("user_id"), lit("-"), col("day")).as("group_id"),
        col("user_id"), col("day"),
        col("rank"), col("event_id"), col("cents"),
        (col("cents") - col("next_cents")).as("margin_next"),
        col("n_candidates"))
  }

  /** Pairwise expansion of [[preferenceRankings]] — the Bradley-Terry
    * training frame: a reward model trains on PAIRS, so a k-ranking
    * expands into every (better, worse) combination, each carrying its
    * rank gap and exact margin; tied pairs are dropped (no preference
    * signal), strictly-ordered ones survive. k is small (≤ a few
    * candidate generations per prompt), so the expansion is ≤ k(k−1)/2
    * rows per group by construction.
    *
    * Scale shape: one self-join hash-clustered on `group_id` — both
    * sides are the (already k-bounded) ranking frame, so the join
    * never touches more than k rows per key per side. */
  def rankingsToPairs(rankings: DataFrame): DataFrame = {
    val hi = rankings.select(col("group_id"), col("user_id"), col("day"),
      col("rank").as("rank_hi"), col("event_id").as("chosen_id"),
      col("cents").as("chosen_cents"))
    val lo = rankings.select(col("group_id"),
      col("rank").as("rank_lo"), col("event_id").as("rejected_id"),
      col("cents").as("rejected_cents"))
    hi.join(lo, Seq("group_id"))
      .filter(col("rank_hi") < col("rank_lo") &&
        col("chosen_cents") > col("rejected_cents"))
      .select(col("group_id"), col("user_id"), col("day"),
        col("rank_hi"), col("rank_lo"),
        col("chosen_id"), col("rejected_id"),
        (col("chosen_cents") - col("rejected_cents")).as("margin_cents"))
  }

  /** Chat-structure audit over [[assemble]]'s output — the role
    * validation an SFT corpus runs before templating: in this data a
    * turn's role is its leading token (the event type the turn was
    * rendered from), and a healthy prompt/response transcript
    * alternates roles. Emits one row per conversation with the turn
    * count, distinct-role count, the number of CONSECUTIVE same-role
    * turn pairs (the signal a template stamped the same side twice —
    * those conversations need turn-merging before training), the
    * opening role, and `alternating` (no consecutive repeat).
    *
    * Scale shape: zero exchanges — roles are derived array-side from
    * the transcript already in the row and folded with `aggregate`;
    * no explode, no window. */
  def roleAlternationAudit(convs: DataFrame,
                           sep: String = TurnSep): DataFrame = {
    val roles = transform(
      split(col("text"), java.util.regex.Pattern.quote(sep)),
      t => split(t, " ").getItem(0))
    convs
      .withColumn("_roles", roles)
      .select(col("conv_id"), col("user_id"),
        size(col("_roles")).as("n_turns"),
        size(array_distinct(col("_roles"))).as("n_roles"),
        aggregate(
          zip_with(
            slice(col("_roles"), lit(1), size(col("_roles")) - 1),
            slice(col("_roles"), lit(2), size(col("_roles")) - 1),
            (a, b) => when(a === b, 1L).otherwise(0L)),
          lit(0L), (acc, x) => acc + x).as("n_role_repeats"),
        col("_roles").getItem(0).as("first_role"))
      .withColumn("alternating", col("n_role_repeats") === 0L)
  }
}

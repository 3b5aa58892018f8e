package graft.operators

import org.apache.spark.sql.DataFrame
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
    val turns = events
      .withColumn("cents", round(col("value") * 100).cast("long"))
      .withColumn("k",
        get_json_object(col("props"), "$.k").cast("long"))
      .withColumn("turn_text", concat_ws(" ",
        col("event_type"),
        concat(lit("value="), col("cents")),
        concat(lit("k="), col("k"))))
      .withColumn("turn_tokens", size(split(col("turn_text"), " ")))
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
        concat_ws("\n",
          transform(col("sorted"), t => t.getField("turn_text")))
          .as("text"))
  }
}

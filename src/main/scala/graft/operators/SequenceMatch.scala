package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered event-sequence matching — the ClickHouse `sequenceMatch` /
  * Amplitude "did A then B (without C in between) within T" primitive
  * that funnels (`a10_funnel`) cannot express: funnels only ask "A ever
  * before B", sequence matching adds the negative condition (no
  * interposed C) and the pairing window.
  *
  * The exists-semantics ("ANY qualifying (A, B) pair") reduce to a
  * single linear scan per key: for a given B occurrence, if the LATEST
  * preceding A does not qualify, no earlier A can — an interposed C
  * after an earlier A either also follows the latest A (kills both) or
  * precedes it (kills only the earlier one). So B matches iff
  * `last_a > last_c` and `ts(B) - last_a <= window`, where last_a /
  * last_c are running maxima over the key's time-ordered prefix.
  *
  * Execution shape: ONE window shuffle keyed by the unit (the same
  * partitioning sessionization and funnels already use), two running-max
  * frames over it, then a hash aggregate — no self-join, no per-pair
  * blow-up, scan cost O(events) at any scale. Timestamps compare as
  * epoch microseconds (BIGINT), so the match decision is engine-exact.
  */
object SequenceMatch {

  final val MatchedCol = "matched"
  final val SecsCol = "secs_since_a"
  final val UsCol = "us_since_a"

  /** Tag every B-occurrence row with whether it completes the sequence
    * `A …no-C… B` within `windowSeconds`, and the A→B latency. `tie`
    * breaks equal timestamps deterministically (e.g. the message id).
    * Returns one row per B occurrence: (key, ts, matched, secs_since_a).
    */
  def tagMatches(df: DataFrame, key: Column, ts: Column, tie: Column,
                 isA: Column, isB: Column, isC: Column,
                 windowSeconds: Long): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts, tie)
      .rowsBetween(Window.unboundedPreceding, -1)
    // cast covers TIMESTAMP_NTZ inputs; the session is pinned to UTC,
    // so the epoch micros agree with the oracle's epoch_us
    val us = unix_micros(ts.cast("timestamp"))
    val lastA = max(when(isA, us)).over(w)
    val lastC = max(when(isC, us)).over(w)
    df.withColumn("_last_a", lastA)
      .withColumn("_last_c", lastC)
      .filter(isB)
      .withColumn(MatchedCol,
        col("_last_a").isNotNull &&
          coalesce(col("_last_a") > col("_last_c"), lit(true)) &&
          us - col("_last_a") <= windowSeconds * 1000000L)
      .withColumn(UsCol, when(col(MatchedCol), us - col("_last_a")))
      .withColumn(SecsCol,
        when(col(MatchedCol),
          round(col(UsCol).cast("double") / 1e6, 4)))
      .select(key.as("key"), ts.as("ts"), col(MatchedCol), col(UsCol),
        col(SecsCol))
  }

  /** Corpus-level read-out: keys with any B, keys with a matched B,
    * total matched B occurrences, and the mean A→B latency over
    * matches. The mean divides an exact integer-microsecond sum (no
    * float accumulation order to diverge on), so it is engine-exact
    * before the display round. One row. */
  def report(df: DataFrame, key: Column, ts: Column, tie: Column,
             isA: Column, isB: Column, isC: Column,
             windowSeconds: Long): DataFrame =
    tagMatches(df, key, ts, tie, isA, isB, isC, windowSeconds)
      .groupBy()
      .agg(countDistinct(col("key")).as("n_keys_with_b"),
        countDistinct(when(col(MatchedCol), col("key")))
          .as("n_keys_matched"),
        sum(when(col(MatchedCol), 1L).otherwise(0L)).as("n_matches"),
        sum(col(UsCol)).as("_sum_us"))
      .select(col("n_keys_with_b"), col("n_keys_matched"),
        col("n_matches"),
        round(col("_sum_us").cast("double") / col("n_matches") / 1e6, 4)
          .as("avg_secs"))
}

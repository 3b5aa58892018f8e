package graft.chain

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Retry/DLQ policy — SURVEY §2.8 R1 (ref `services/rotor/src/lib/
  * retries.ts:6-52` + `rotor.ts:156-199`).
  *
  * Reference: up to `maxRetries` (3) attempts with exponential backoff
  * `base^attempt` minutes (base 10 → 10, 100, 1000 min) capped at 24 h;
  * exhausted events go to the dead-letter topic.
  *
  * Spark shape: retry rows land in a retry TABLE with a `retry_after`
  * timestamp; a scheduled re-drive job picks up rows whose time has come
  * (`due`), re-runs them through the chain from their failed stage
  * (`FunctionChain.redrive`), and routes exhausted rows to a DLQ table.
  * Kafka's retry topic becomes a predicate on a partitioned table —
  * same at-least-once semantics, no extra infrastructure.
  */
object RetryPolicy {

  val MaxRetries = 3
  val BackoffBaseMinutes = 10.0
  val CapMinutes = 1440.0 // 24 h

  /** Backoff in minutes for attempt n (1-based): min(base^n, cap). */
  def backoffMinutes(attempt: Column): Column =
    least(pow(lit(BackoffBaseMinutes), attempt), lit(CapMinutes))

  /** Annotate chain retry output with attempt count + retry_after.
    * `failedAt` is the processing time of the failed attempt. */
  def schedule(retryRows: DataFrame, failedAt: Column,
               prevAttempt: Column = lit(0)): DataFrame =
    retryRows
      .withColumn("attempt", prevAttempt + 1)
      .withColumn("retry_after",
        (unix_timestamp(failedAt) +
          backoffMinutes(col("attempt")) * 60).cast("timestamp"))
      .withColumn("dead_letter", col("attempt") > MaxRetries)

  /** Rows due for re-drive at `now` (excludes dead-lettered). */
  def due(retryTable: DataFrame, now: Column): DataFrame =
    retryTable.filter(!col("dead_letter") && col("retry_after") <= now)

  /** Rows exhausted after MaxRetries — the DLQ split. */
  def deadLetters(retryTable: DataFrame): DataFrame =
    retryTable.filter(col("dead_letter"))
}

package graft.chain

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.chain.FunctionChain.ChainOutput
import graft.sinks.SinkRouter

/** K7: the events-log sink as a persisted table (ref
  * `libs/core-functions/src/functions/lib/clickhouse-logger.ts:25-83`:
  * function chains buffer `{actorId, type, level, timestamp, message}`
  * rows and async-insert them into `events_log`).
  *
  * Spark shape: chain outputs project to log rows (level derived from the
  * chain status the way the reference's metrics do) and land through the
  * same [[SinkRouter]] as any warehouse table — the async-insert batching
  * of the reference is the micro-batch itself.
  */
object EventsLog {

  /** Project chain outputs to events_log rows. */
  def logRows(out: Dataset[ChainOutput], connectionId: String): DataFrame =
    out.toDF().select(
      lit(connectionId).as("actor_id"),
      lit("function").as("log_type"),
      when(col("status") === "success", "info")
        .when(col("status") === "retry", "warn")
        .otherwise("error").as("level"),
      col("functionId").as("function_id"),
      col("status"),
      col("error").as("message"),
      col("event"))

  /** Persist one batch of chain outputs into the `events_log` table. */
  def persist(router: SinkRouter, out: Dataset[ChainOutput],
              connectionId: String): Unit =
    router.write(logRows(out, connectionId).withColumn("_table", lit("events_log")))
}

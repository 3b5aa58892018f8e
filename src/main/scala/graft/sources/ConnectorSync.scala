package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sinks.{SinkOptions, SinkRouter}

/** S7: source-connector stream pulls — the Airbyte-style sync the
  * reference schedules through an external `syncctl` worker (ref
  * `webapps/console/lib/schema/index.ts:228-245` declares per-stream
  * `full_refresh`/`incremental` modes, `cursor_field`, `primary_key`,
  * `table_name`; `webapps/console/lib/server/sync.ts` orchestrates).
  *
  * Re-expressed Spark-first: a sync run is one batch `spark.read` per
  * stream with the cursor predicate applied AT THE SCAN —
  * `cursor >= lastCursor` is a plain comparison on a top-level column,
  * so Catalyst pushes it into the parquet reader (`PushedFilters`) and,
  * when the source is partitioned on the cursor's date, prunes whole
  * partitions. At 100 TB the nightly incremental therefore reads only
  * the new tail, never the table.
  *
  * Incremental semantics match the connector contract:
  *   - the cursor filter is INCLUSIVE (`>=`): rows sharing the stored
  *     cursor value re-sync (a source can append more rows at the same
  *     cursor after a run — at-least-once beats missed data);
  *   - the destination dedups by primary key via the warehouse MERGE
  *     ([[graft.sinks.SinkRouter]] with `deduplicate=true`), so the
  *     boundary re-reads are idempotent;
  *   - the new state is the stream's max cursor, computed on the synced
  *     slice (one partial-agg job over the already-filtered scan).
  * `full_refresh` replaces the destination table wholesale (overwrite
  * write; no cursor, no state).
  */
object ConnectorSync {

  /** One stream of a connector sync (the schema/index.ts row). */
  final case class StreamConfig(
      stream: String,                    // source table (parquet at sfDir)
      mode: String,                      // "full_refresh" | "incremental"
      cursorField: Option[String] = None,
      primaryKey: String = "id",
      tableName: String = "")            // destination table ("" = stream)

  /** Per-stream persisted sync state: the high-water cursor, serialized
    * as a string exactly as connector state files do. */
  final case class StreamState(stream: String, cursor: Option[String])

  /** Result of one stream's sync pass. */
  final case class SyncResult(stream: String, mode: String,
                              rowsRead: Long, newState: StreamState)

  private def destTable(cfg: StreamConfig): String =
    if (cfg.tableName.nonEmpty) cfg.tableName else cfg.stream

  /** Sync one stream: read (cursor-filtered for incremental), write to
    * the warehouse, return rows read + the new state. */
  def syncStream(spark: SparkSession, sourceDir: String,
                 warehouseDir: String, cfg: StreamConfig,
                 state: StreamState): SyncResult = {
    val src = spark.read.parquet(s"$sourceDir/${cfg.stream}.parquet")
    cfg.mode match {
      case "full_refresh" =>
        val n = src.count()
        src.write.mode("overwrite")
          .parquet(s"$warehouseDir/${destTable(cfg)}")
        SyncResult(cfg.stream, cfg.mode, n, StreamState(cfg.stream, None))
      case "incremental" =>
        val cursor = cfg.cursorField.getOrElse(throw new IllegalArgumentException(
          s"stream ${cfg.stream}: incremental mode needs cursor_field"))
        // inclusive cursor filter — pushed to the parquet scan
        val slice = state.cursor match {
          case Some(c) => src.filter(col(cursor) >= lit(c).cast(
            src.schema(cursor).dataType))
          case None => src
        }
        // dedup-merge destination keyed on the stream's primary key
        val router = new SinkRouter(warehouseDir, SinkOptions(
          deduplicate = true, primaryKey = cfg.primaryKey))
        // one pass computes count + max cursor; the write is a second
        // scan of the same pushed-down slice
        val agg = slice.agg(count(lit(1)), max(col(cursor).cast("string"))).head
        val n = agg.getLong(0)
        // Destination partitions by cursor MONTH (the router's `timestamp`
        // routing column): raw cursor values would mean one directory per
        // distinct day/value — thousands of tiny partitions — while month
        // grain keeps partitions file-sized AND lets the boundary re-sync
        // merge prune to the months around the high-water mark. Same-key
        // re-syncs tie on the month and the merge's _src tiebreak lets the
        // incoming row win — idempotent by construction.
        if (n > 0)
          router.write(slice
            .withColumn("timestamp",
              date_trunc("month", col(cursor).cast("timestamp")))
            .withColumn("_table", lit(destTable(cfg))))
        val newCursor = Option(agg.getString(1)).orElse(state.cursor)
        SyncResult(cfg.stream, cfg.mode, n, StreamState(cfg.stream, newCursor))
      case other =>
        throw new IllegalArgumentException(s"unknown sync mode '$other'")
    }
  }

  /** Run a full connector sync (every stream), threading state. */
  def sync(spark: SparkSession, sourceDir: String, warehouseDir: String,
           streams: Seq[StreamConfig],
           states: Map[String, StreamState]): Seq[SyncResult] =
    streams.map { cfg =>
      val st = states.getOrElse(cfg.stream, StreamState(cfg.stream, None))
      syncStream(spark, sourceDir, warehouseDir, cfg, st)
    }

  /** Read a synced destination table back (incremental tables live in
    * the SinkRouter layout, full-refresh tables as plain parquet). */
  def readDest(spark: SparkSession, warehouseDir: String,
               cfg: StreamConfig): DataFrame =
    cfg.mode match {
      case "incremental" =>
        new SinkRouter(warehouseDir, SinkOptions()).readTable(
          spark, destTable(cfg))
      case _ => spark.read.parquet(s"$warehouseDir/${destTable(cfg)}")
    }
}

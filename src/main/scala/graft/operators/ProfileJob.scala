package graft.operators

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sinks.{SinkOptions, SinkRouter}

/** Incremental profile rebuild loop — SURVEY §3.3 (ref
  * `services/profiles/src/builder.ts:136-194`).
  *
  * Each cycle: read the checkpoint timestamp → S6 changed-users scan in
  * (checkpoint, now] → rebuild ONLY those users' profiles over their full
  * history within the profile window (365 d) → MERGE into the `profiles`
  * table keyed on user_id → advance the checkpoint.
  *
  * Scale: the changed-users scan prunes by the event-time predicate
  * (partition pruning on a date-partitioned event table); the rebuild
  * joins history via a broadcast-able changed-users set (semi join), so
  * per-cycle cost ~ |changed users' events|, not |all events| — the
  * reference's 240-way sharded loop collapses into one shuffle.
  */
class ProfileJob(warehouseDir: String, checkpointFile: String,
                 profileWindowDays: Int = 365) {

  private val router = new SinkRouter(warehouseDir, SinkOptions(
    deduplicate = true, primaryKey = "user_id",
    timestampColumn = "updated_at"))

  def readCheckpoint(): Timestamp = {
    val p = Paths.get(checkpointFile)
    if (Files.exists(p))
      Timestamp.valueOf(new String(Files.readAllBytes(p)).trim)
    else new Timestamp(0L)
  }

  private def writeCheckpoint(ts: Timestamp): Unit = {
    val p = Paths.get(checkpointFile)
    Files.createDirectories(p.getParent)
    Files.write(p, ts.toString.getBytes)
  }

  /** Run one cycle over the event history up to `now`. Returns the
    * number of users rebuilt. */
  def runCycle(events: DataFrame, now: Timestamp): Long = {
    val spark = events.sparkSession
    val lo = readCheckpoint()
    val changed = Profiles.changedUsers(events, lo, now)
    val nChanged = changed.count()
    if (nChanged > 0) {
      val windowLo = new Timestamp(
        now.getTime - profileWindowDays * 86400000L)
      val history = events
        .filter(col("timestamp") > lit(windowLo) &&
          col("timestamp") <= lit(now))
        .join(broadcast(changed), Seq("user_id"), "left_semi")
      val profiles = Profiles.buildProfiles(history)
      router.write(profiles.withColumn("_table", lit("profiles")))
    }
    writeCheckpoint(now)
    nChanged
  }

  def readProfiles(spark: SparkSession): DataFrame =
    router.readTable(spark, "profiles")
}

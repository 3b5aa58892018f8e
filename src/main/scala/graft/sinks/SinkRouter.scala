package graft.sinks

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The warehouse sink layer — SURVEY §2.2 (K1/K2/K8) — reproducing
  * bulker's observable semantics on a parquet warehouse:
  *
  *  - table routing by the `_table` column (layouts tag it),
  *  - schema evolution: new columns appear as nulls on old rows, missing
  *    columns read back as nulls (merged superset schema), gated by
  *    `schemaFreeze`,
  *  - `deduplicate` + `primaryKey` + `timestampColumn`: MERGE-style upsert
  *    — latest row per key wins within `deduplicateWindow`,
  *  - append mode otherwise.
  *
  * Batch/stream symmetric: `write` handles one batch; the streaming path
  * is `events.writeStream.foreachBatch((df, _) => router.write(df))`.
  *
  * == Scale design (the 100 TB path) ==
  *
  * Tables are Hive-partitioned by event date (`graft_dt`, derived from
  * `timestampColumn`). The two write paths:
  *
  *  - '''append''': a plain partitioned `SaveMode.Append` — Spark's file
  *    commit protocol (task-attempt staging + rename) makes it crash-safe,
  *    and schema evolution costs nothing because `readTable` uses
  *    `mergeSchema` (old files simply surface new columns as null). No
  *    rewrite, ever.
  *  - '''merge''' (deduplicate=true): the logical equivalent of Delta's
  *    `MERGE INTO`. Only partitions that can contain a prior version of a
  *    batch key are read (partition-pruned to the batch's date range ±
  *    `deduplicateWindowDays`, then narrowed to dates actually holding a
  *    matching primary key via a column-pruned semi-join). The merged
  *    output is written to a hidden `.stage-*` dir by a normal Spark job,
  *    then ONLY the touched `graft_dt=` directories are swapped in:
  *    old → `.trash-*`, staged → live, trash deleted. A crash at any point
  *    before the swap leaves the live table untouched (stage/trash dirs
  *    start with '.', invisible to Spark's file index); a crash mid-swap is
  *    repaired by `recover()` on the next write (restores any partition
  *    whose live dir is missing from trash). Cost per batch is
  *    O(touched partitions), not O(table) — at 100 TB the sink rewrites a
  *    few recent date partitions, never history.
  *
  * Reference contract: jitsu `bulker-destination.ts:340-392` (MERGE with
  * primary key + dedup window), `destinations.tsx:134-149` (option names).
  */
case class SinkOptions(
    mode: String = "batch",            // batch | stream (semantics identical here)
    deduplicate: Boolean = false,
    primaryKey: String = "message_id",
    timestampColumn: String = "timestamp",
    deduplicateWindowDays: Int = 31,
    schemaFreeze: Boolean = false,
    keepOriginalNames: Boolean = false)

class SinkRouter(warehouseDir: String, options: SinkOptions = SinkOptions()) {

  /** Partition column. Must NOT start with '_' (Spark's file index hides
    * underscore-prefixed dirs, which would hide every partition). */
  val DateCol = "graft_dt"
  private val EpochDate = java.sql.Date.valueOf("1970-01-01")

  private def tablePath(table: String) = s"$warehouseDir/$table"

  /** Route one batch: split by `_table`, write each group. The batch is
    * cached for the duration — table discovery plus one write per table
    * would otherwise recompute the upstream (e.g. re-parse every JSON
    * event per pass in the streaming path). */
  def write(batch: DataFrame): Unit = {
    val spark = batch.sparkSession
    val cached = batch.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val tables = cached.select("_table").distinct().collect().map(_.getString(0))
      tables.foreach { t =>
        val rows = cached.filter(col("_table") === t).drop("_table")
        writeTable(spark, t, rows)
      }
    } finally cached.unpersist(false)
  }

  private def tableExists(path: String): Boolean = {
    val f = new java.io.File(path)
    f.exists() && f.listFiles() != null &&
      f.listFiles().exists(d => d.getName.startsWith(s"$DateCol="))
  }

  /** Tag every row with its date partition. Null timestamps (and tables
    * with no timestamp column at all) land in a fixed epoch partition so
    * partition values are never null (no __HIVE_DEFAULT_PARTITION__). */
  private def withDate(df: DataFrame): DataFrame =
    if (df.columns.contains(options.timestampColumn))
      df.withColumn(DateCol,
        coalesce(to_date(col(options.timestampColumn)), lit(EpochDate)))
    else df.withColumn(DateCol, lit(EpochDate))

  private def writeTable(spark: SparkSession, table: String, rows: DataFrame): Unit = {
    val path = tablePath(table)
    recover(path)
    val base =
      if (options.keepOriginalNames) rows
      else graft.functions.Scalars.snakeCaseSchema(rows)
    val incoming = withDate(base)
    if (!tableExists(path)) {
      incoming.write.mode(SaveMode.Overwrite).partitionBy(DateCol).parquet(path)
    } else {
      val existing = spark.read.option("mergeSchema", "true").parquet(path)
      val have = existing.columns.toSet
      val newCols = incoming.columns.filterNot(c => have(c) || c == DateCol)
      if (options.schemaFreeze && newCols.nonEmpty)
        throw new IllegalStateException(
          s"schemaFreeze: new columns ${newCols.mkString(",")} rejected")
      if (!options.deduplicate)
        incoming.write.mode(SaveMode.Append).partitionBy(DateCol).parquet(path)
      else mergeInto(spark, path, existing, incoming)
    }
  }

  /** Align two frames to the union-by-name superset schema. */
  private def evolve(existing: DataFrame, incoming: DataFrame): (DataFrame, DataFrame) = {
    val have = existing.columns.toSet
    val newCols = incoming.columns.filterNot(have)
    val e2 = newCols.foldLeft(existing)((df, c) =>
      df.withColumn(c, lit(null).cast(incoming.schema(c).dataType)))
    val missing = existing.columns.filterNot(incoming.columns.toSet)
    val i2 = missing.foldLeft(incoming)((df, c) =>
      df.withColumn(c, lit(null).cast(existing.schema(c).dataType)))
    (e2, i2.select(e2.columns.map(col): _*))
  }

  /** MERGE INTO, partition-scoped. Reads only live partitions inside the
    * dedup window that hold a prior version of a batch key, merges them
    * with the batch (latest per `primaryKey` wins; batch beats existing on
    * timestamp ties — re-emitted UR events overwrite), stages the result,
    * and swaps just those partition dirs. */
  private def mergeInto(
      spark: SparkSession, path: String,
      existing: DataFrame, incoming: DataFrame): Unit = {
    val w = options.deduplicateWindowDays
    val Row(minD: java.sql.Date, maxD: java.sql.Date) =
      incoming.agg(min(DateCol), max(DateCol)).head()
    val lo = java.sql.Date.valueOf(minD.toLocalDate.minusDays(w.toLong))
    val hi = java.sql.Date.valueOf(maxD.toLocalDate.plusDays(w.toLong))
    // partition-pruned, column-pruned probe: which dates hold a batch key?
    val windowed = existing.filter(col(DateCol).between(lit(lo), lit(hi)))
    val touched = windowed
      .select(col(DateCol), col(options.primaryKey))
      .join(incoming.select(options.primaryKey).distinct(),
        Seq(options.primaryKey), "left_semi")
      .select(DateCol).distinct().collect().map(_.getDate(0))
    val batchDates = incoming.select(DateCol).distinct().collect().map(_.getDate(0))
    val rewriteDates = (touched ++ batchDates).distinct.toSeq
    val oldRows = windowed.filter(col(DateCol).isin(rewriteDates: _*))

    val (e2, i2) = evolve(oldRows, incoming)
    val all = e2.withColumn("_src", lit(0))
      .unionByName(i2.withColumn("_src", lit(1)))
    val rank = Window.partitionBy(col(options.primaryKey))
      .orderBy(col(options.timestampColumn).desc_nulls_last, col("_src").desc)
    val merged = all
      .withColumn("_rn", row_number().over(rank))
      .filter(col("_rn") === 1)
      .drop("_rn", "_src")

    val id = java.util.UUID.randomUUID().toString.take(8)
    val stage = s"$path/.stage-$id"
    merged.write.mode(SaveMode.Overwrite).partitionBy(DateCol).parquet(stage)
    beforeSwapHook()
    swapPartitions(path, stage, s"$path/.trash-$id", rewriteDates)
  }

  /** Test seam: runs after the staged merge output is fully committed and
    * before any live partition dir is touched. A crash here must leave the
    * table exactly as it was (SinkRouterSpec proves it). */
  protected def beforeSwapHook(): Unit = ()

  /** Swap touched partition dirs: live → trash, staged → live, drop trash.
    * Dates with no staged dir (every row superseded away) simply vanish.
    * All moves are same-filesystem directory renames (atomic on POSIX). */
  private def swapPartitions(
      path: String, stage: String, trash: String,
      dates: Seq[java.sql.Date]): Unit = {
    Files.createDirectories(Paths.get(trash))
    dates.foreach { d =>
      val dir = s"$DateCol=$d"
      val live = Paths.get(path, dir)
      if (Files.exists(live))
        Files.move(live, Paths.get(trash, dir), StandardCopyOption.ATOMIC_MOVE)
      val staged = Paths.get(stage, dir)
      if (Files.exists(staged))
        Files.move(staged, live, StandardCopyOption.ATOMIC_MOVE)
    }
    deleteRecursive(new java.io.File(trash))
    deleteRecursive(new java.io.File(stage))
  }

  /** Crash repair, run before every write. A partition present in a trash
    * dir but missing live (crash between the two renames of a swap) is
    * restored; then all stage/trash leftovers are dropped. Single writer
    * per table, as in the reference's bulker. */
  private def recover(path: String): Unit = {
    val root = new java.io.File(path)
    val kids = Option(root.listFiles()).getOrElse(Array.empty)
    kids.filter(_.getName.startsWith(".trash-")).foreach { trash =>
      Option(trash.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.startsWith(s"$DateCol="))
        .foreach { part =>
          val live = Paths.get(path, part.getName)
          if (!Files.exists(live))
            Files.move(part.toPath, live, StandardCopyOption.ATOMIC_MOVE)
        }
    }
    kids.filter(f => f.getName.startsWith(".stage-") || f.getName.startsWith(".trash-"))
      .foreach(deleteRecursive)
  }

  private def deleteRecursive(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursive)
    f.delete(): Unit
  }

  /** Read a routed table back: merged superset schema (evolution), minus
    * the internal partition column. */
  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(tablePath(table)).drop(DateCol)
}

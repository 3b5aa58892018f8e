package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling: densify a per-key metric series onto a
  * regular daily grid and fill the gaps — the `time_bucket_gapfill`
  * family (TimescaleDB/InfluxDB) for dashboard-ready series.
  *
  * Operates on the ROLLUP, never the event stream: the caller
  * aggregates events to (key, day, value) first, so every frame here
  * is keys × days sized regardless of corpus size. The grid comes
  * from per-key min/max spans exploded through `sequence()` (no
  * driver-side date loop), the join back is keys × days vs keys ×
  * present-days, and LOCF is one window pass ordered by day. Three
  * small shuffles over rollup-sized data; nothing event-sized moves.
  *
  * Fill semantics: `value_zero` zero-fills (the right call for
  * counts), `value_locf` carries the last observation forward (the
  * right call for gauges); `is_gap` marks manufactured rows so
  * downstream consumers can tell filled from observed. LOCF is never
  * null because each key's grid starts at its first observed day.
  */
object TimeSeries {

  /** `points`: (key, d DATE, value LONG) — one row per key per
    * OBSERVED day. Returns the dense grid with fill columns. */
  def gapfillDaily(points: DataFrame): DataFrame = {
    val spans = points.groupBy(col("key"))
      .agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
    val grid = spans.select(col("key"),
      explode(sequence(col("d0"), col("d1"),
        expr("interval 1 day"))).as("d"))
    val w = Window.partitionBy(col("key")).orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(points, Seq("key", "d"), "left")
      .withColumn("is_gap", col("value").isNull)
      .withColumn("value_zero", coalesce(col("value"), lit(0L)))
      .withColumn("value_locf",
        last(col("value"), ignoreNulls = true).over(w))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A/B experiment analysis — the CDP-warehouse half of feature-flag
  * experimentation (GrowthBook/Amplitude Experiment style): deterministic
  * unit→variant assignment and a two-proportion conversion read-out.
  *
  * The reference ships events to exactly these tools (SURVEY §2.2 K3 —
  * amplitude/posthog/mixpanel destinations, e.g.
  * `libs/core-functions/src/functions/amplitude-destination.ts`,
  * `posthog-destination.ts`); the analysis those tools run over the
  * delivered events is a first-class warehouse query here.
  *
  * Assignment is the same md5-bucket discipline as [[Sampling.bucket]]
  * (NOT `rand()`): a unit hashes to the same variant on every engine,
  * every run, every re-shuffle — so the experiment read-out is exactly
  * reproducible and oracle-checkable, and assignment is a map-side
  * projection (no state, no join against an assignment table).
  *
  * At 100 TB: one hash-aggregate per unit (the same shuffle any
  * per-user rollup pays), then a variant-level aggregate whose output is
  * `nVariants` rows; the z-statistic math runs on that driver-tiny frame.
  */
object Experiment {

  /** Deterministic variant id in [0, nVariants): md5-bucket of the unit
    * id, salted by `experiment` so concurrent experiments randomize
    * independently (the classic one-hash-per-experiment rule). */
  def assignVariant(unit: Column, experiment: String,
                    nVariants: Int = 2): Column =
    pmod(conv(substring(md5(concat(lit(experiment + ":"),
      unit.cast("string"))), 1, 8), 16, 10).cast("long"),
      lit(nVariants)).cast("int")

  /** Per-variant funnel: units, converted units (any row with
    * `converted` true), conversion rate, and value per unit. `value`
    * accumulates as integer CENTS (per-row half-up round, then exact
    * long sums), so totals are independent of partition/accumulation
    * order — a float sum rounded for display can straddle a rounding
    * boundary between engines; an integer sum cannot. One row per
    * variant. */
  def variantStats(events: DataFrame, unit: Column, experiment: String,
                   converted: Column, value: Column): DataFrame = {
    val cents = round(coalesce(value, lit(0.0)) * 100, 0).cast("long")
    val perUnit = events
      .groupBy(unit.as("unit"),
        assignVariant(unit, experiment).as("variant"))
      .agg(max(when(converted, 1L).otherwise(0L)).as("conv"),
        sum(cents).as("unit_cents"))
    perUnit.groupBy(col("variant"))
      .agg(count(lit(1)).as("n_units"),
        sum(col("conv")).as("n_converted"),
        sum(col("unit_cents")).as("cents"))
      .select(col("variant"), col("n_units"), col("n_converted"),
        round(col("n_converted").cast("double") / col("n_units"), 6)
          .as("conv_rate"),
        round(col("cents").cast("double") / 100, 2).as("total_value"),
        round(col("cents").cast("double") / col("n_units") / 100, 4)
          .as("value_per_unit"))
  }

  /** Calibration audit (the reliability-diagram table + expected
    * calibration error) for any scorer whose output is an exact
    * integer in micro units on [0, 10⁶] — is a score of 0.8 actually
    * right 80% of the time? Bins by score decile (floor split), and
    * per bin emits count, positives, the observed positive rate and
    * the mean score (both exact bp), and the bin's |gap|. The summary
    * `ece_bp` is the n-weighted mean absolute gap — every step floor
    * integer arithmetic, so the whole audit hash-replays.
    *
    * Output: one row per NON-EMPTY bin plus a `bin = -1` summary row.
    * Scale shape: one partial-aggregating scan to ≤ bins rows; the
    * summary folds those rows in a second bytes-sized pass. */
  def calibration(df: DataFrame, scoreMicroCol: String, labelCol: String,
                  bins: Int = 10): DataFrame = {
    require(bins > 0, "bins must be positive")
    val binned = df
      .withColumn("bin",
        least(expr(s"$scoreMicroCol * ${bins}L div 1000000L"),
          lit(bins - 1L)).cast("int"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(labelCol), 1L).otherwise(0L)).as("n_pos"),
        sum(col(scoreMicroCol).cast("long")).as("_score_sum"))
      .withColumn("pos_rate_bp", expr("n_pos * 10000L div n"))
      .withColumn("mean_score_bp", expr("_score_sum div n div 100L"))
      .withColumn("gap_bp",
        abs(col("pos_rate_bp") - col("mean_score_bp")))
    val summary = binned.agg(
        coalesce(sum(col("n")), lit(0L)).as("n"),
        coalesce(sum(col("n_pos")), lit(0L)).as("n_pos"),
        coalesce(sum(col("gap_bp") * col("n")), lit(0L)).as("_wgap"))
      .select(lit(-1).as("bin"), col("n"), col("n_pos"),
        lit(null).cast("long").as("pos_rate_bp"),
        lit(null).cast("long").as("mean_score_bp"),
        expr("_wgap div greatest(n, 1L)").as("gap_bp"))
    binned.select(col("bin"), col("n"), col("n_pos"),
        col("pos_rate_bp"), col("mean_score_bp"), col("gap_bp"))
      .unionByName(summary)
  }

  /** Two-proportion z-test read-out for a 2-variant experiment: one row
    * with both arms' counts, the absolute uplift, and the pooled
    * z-statistic (display-rounded; significance at |z| > 1.96 ≈ p<.05).
    * The z arithmetic runs on the 2-row [[variantStats]] result via a
    * self-pivot, so the distributed cost is variantStats' alone. */
  def conversionReport(events: DataFrame, unit: Column, experiment: String,
                       converted: Column, value: Column): DataFrame = {
    val stats = variantStats(events, unit, experiment, converted, value)
    val wide = stats.groupBy()
      .agg(
        max(when(col("variant") === 0, col("n_units"))).as("n_control"),
        max(when(col("variant") === 0, col("n_converted"))).as("conv_control"),
        max(when(col("variant") === 1, col("n_units"))).as("n_treatment"),
        max(when(col("variant") === 1, col("n_converted"))).as("conv_treatment"))
    val p0 = col("conv_control").cast("double") / col("n_control")
    val p1 = col("conv_treatment").cast("double") / col("n_treatment")
    val pooled = (col("conv_control") + col("conv_treatment")).cast("double") /
      (col("n_control") + col("n_treatment"))
    val se = sqrt(pooled * (lit(1.0) - pooled) *
      (lit(1.0) / col("n_control") + lit(1.0) / col("n_treatment")))
    // degenerate experiment (0% or 100% pooled conversion): se = 0, the
    // z-test is undefined — null, not a division error
    wide.select(
      col("n_control"), col("conv_control"),
      col("n_treatment"), col("conv_treatment"),
      round(p0, 6).as("rate_control"),
      round(p1, 6).as("rate_treatment"),
      round(p1 - p0, 6).as("uplift"),
      when(se =!= 0.0, round((p1 - p0) / se, 4)).as("z"),
      when(se =!= 0.0, abs((p1 - p0) / se) > 1.96).as("significant"))
  }
}

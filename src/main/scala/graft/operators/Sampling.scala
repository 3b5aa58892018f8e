package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / data-mixing operators for training-data
  * pipelines (beyond the reference, SURVEY training-data extensions).
  *
  * A corpus mix ("90% of source A, 25% of source B…") must be
  * reproducible across runs, partitionings and engines — `df.sample`'s
  * RNG is none of those. Sampling here keys on a per-row md5-derived
  * bucket in [0, 10000): a pure column function of the row id, so the
  * same row is kept or dropped everywhere, the plan is one narrow
  * codegen'd filter pushed at the scan, and a DuckDB oracle can replay
  * the exact decision. Rates are basis points (int) to keep the
  * comparison FP-free.
  */
object Sampling {

  /** Stable per-row bucket in [0, 10000): first 8 hex chars of
    * md5(id-as-string), mod 10⁴. */
  def bucket(id: Column): Column =
    (conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long")
      % 10000).cast("int")

  /** Keep ~`rateBp`/10000 of rows, deterministically by id. */
  def sampleBp(df: DataFrame, idCol: String, rateBp: Int): DataFrame =
    df.filter(bucket(col(idCol)) < rateBp)

  /** Stratified mix: per-stratum keep rates (basis points), unknown
    * strata at `defaultRateBp`. One filter, no shuffle; the strata stay
    * unbiased within themselves because the bucket keys on id, not on
    * the stratum. */
  def stratifiedMix(df: DataFrame, idCol: String, strataCol: String,
                    ratesBp: Map[String, Int],
                    defaultRateBp: Int = 0): DataFrame = {
    val rate = ratesBp.foldLeft(lit(defaultRateBp)) {
      case (acc, (stratum, bp)) =>
        when(col(strataCol) === stratum, lit(bp)).otherwise(acc)
    }
    df.filter(bucket(col(idCol)) < rate)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy auditing + disclosure-limited release — the analysis side of
  * the GDPR suite ([[graft.sinks.SinkRouter.deleteWhere]] erases,
  * `exportSubject` discloses to the subject; these measure what a
  * RELEASED table leaks and produce safe aggregate releases).
  *
  * - k-anonymity (Sweeney 2002): every row must share its
  *   quasi-identifier combination with ≥ k−1 others, else the
  *   combination re-identifies.
  * - l-diversity (Machanavajjhala 2007): a k-anonymous class is still
  *   unsafe if everyone in it shares the sensitive value — require ≥ l
  *   distinct sensitive values per class.
  * - Differentially private counts (Dwork 2006): Laplace(Δ/ε) noise on
  *   each released count, Δ=1 for disjoint counting queries.
  *
  * All three are single hash aggregations over the quasi-identifier key
  * (map-side partial combine, one shuffle of group-sized data, no
  * window, no sort) — the audit of a 100 TB release costs one scan.
  *
  * The DP noise is DETERMINISTIC and engine-replayable (the
  * [[Sampling.importanceResample]] Gumbel precedent): uniform from a
  * 48-bit md5 of (seed, group key), Laplace via the inverse CDF
  * −b·sign(u−½)·ln(1−2|u−½|) — `ln` only, never `exp`, so an oracle
  * replaying the same arithmetic reproduces the noise bit-for-bit.
  * Released counts are integer-rounded (and floored at 0 — monotone
  * post-processing preserves the ε-DP guarantee), so the gate is
  * hash-exact. Production releases would swap the md5 uniform for a
  * cryptographic RNG: determinism is a replay/test affordance, and the
  * seed must stay secret either way for the DP guarantee to hold.
  */
object Privacy {

  /** Equivalence classes over the quasi-identifier columns with fewer
    * than k members — each output row is a re-identifiable combination
    * the release must generalize or suppress. */
  def kAnonymityViolations(df: DataFrame, quasi: Seq[String],
                           k: Int): DataFrame =
    df.groupBy(quasi.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .filter(col("class_size") < k)

  /** Classes whose sensitive column takes fewer than l distinct values
    * — homogeneous classes disclose the sensitive value even when
    * k-anonymous. Reports class size alongside. */
  def lDiversityViolations(df: DataFrame, quasi: Seq[String],
                           sensitive: String, l: Int): DataFrame =
    df.groupBy(quasi.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col(sensitive)).as("distinct_sensitive"))
      .filter(col("distinct_sensitive") < l)

  /** t-closeness audit (Li et al. 2007) — the third rung of the
    * anonymity ladder after k-anonymity and l-diversity: a class can
    * be large AND diverse yet still leak if its sensitive-value MIX
    * differs sharply from the table's. For categorical sensitive
    * values the Earth-Mover distance reduces to total variation,
    * tv = ½·Σ_v |p_class(v) − p_global(v)|, reported per class in
    * exact integer micros (shares floored to micros first, then the
    * integer abs-sum halves — engine-replayable). Output: one row per
    * equivalence class with (quasi..., class_size, tv_micro); the
    * caller thresholds (classes with tv over t leak).
    *
    * Scale shape: one (quasi, sensitive) hash aggregation, a
    * sensitive-keyed join against the value-cardinality global-share
    * frame (broadcast-sized), one class-keyed re-aggregation. Zero
    * cells need no rows: a value absent from a class contributes its
    * full global share, added via the complement identity
    * Σ_missing p_g = 10⁶ − Σ_present p_g. */
  def tClosenessByClass(df: DataFrame, quasi: Seq[String],
                        sensitive: String): DataFrame = {
    val cells = df.groupBy((quasi.map(col) :+ col(sensitive)): _*)
      .agg(count(lit(1)).as("n_cv"))
    val globals = df.groupBy(col(sensitive))
      .agg(count(lit(1)).as("g_v"))
      .withColumn("_n", expr("sum(g_v) over ()"))
      .withColumn("pg_micro", expr("g_v * 1000000L div _n"))
      // the micro-share total is NOT exactly 1e6 (floors) — carry the
      // actual total so the missing-value mass below is exact
      .withColumn("tot_pg", expr("sum(pg_micro) over ()"))
      .select(col(sensitive), col("pg_micro"), col("tot_pg"))
    cells
      .withColumn("n_c",
        sum(col("n_cv")).over(org.apache.spark.sql.expressions.Window
          .partitionBy(quasi.map(col): _*)))
      .join(globals, Seq(sensitive))
      .withColumn("pc_micro", expr("n_cv * 1000000L div n_c"))
      .groupBy(quasi.map(col): _*)
      .agg(first(col("n_c")).as("class_size"),
        sum(expr("abs(pc_micro - pg_micro)")).as("_present_gap"),
        sum(col("pg_micro")).as("_present_global"),
        first(col("tot_pg")).as("_tot_pg"))
      // values never seen in the class contribute |0 - p_g| each:
      // total global micro mass minus the mass of values present
      .withColumn("tv_micro",
        expr("(_present_gap + (_tot_pg - _present_global)) div 2L"))
      .select((quasi.map(col) :+ col("class_size") :+
        col("tv_micro")): _*)
  }

  /** One-line audit summary: total classes, violating classes, rows in
    * violating classes, and the minimum class size observed. */
  def kAnonymitySummary(df: DataFrame, quasi: Seq[String],
                        k: Int): DataFrame =
    df.groupBy(quasi.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .agg(count(lit(1)).as("n_classes"),
        sum(when(col("class_size") < k, 1L).otherwise(0L))
          .as("violating_classes"),
        sum(when(col("class_size") < k, col("class_size"))
          .otherwise(0L)).as("rows_at_risk"),
        min(col("class_size")).as("min_class_size"))

  /** Consent enforcement at INGEST — the preventive half of the GDPR
    * pair ([[graft.sinks.SinkRouter.deleteWhere]] is the curative
    * half): events whose subject appears in the opt-out registry never
    * reach a sink. The registry is broadcast (it is keys-sized — the
    * set of opted-out subjects, not the event stream), so enforcement
    * is a map-side anti join: zero shuffle of the stream at any scale.
    * Returns the surviving events unchanged. */
  def enforceOptOut(events: DataFrame, optOuts: DataFrame,
                    keyCol: String): DataFrame =
    events.join(
      broadcast(optOuts.select(col(keyCol)).distinct()),
      Seq(keyCol), "left_anti")

  /** ε-DP noisy counts per `dims` group: exact count + Laplace(1/ε)
    * noise from the deterministic 48-bit md5 uniform of
    * (seed, group key), integer-rounded and floored at 0. Returns the
    * dims plus `noisy_count`; the exact count never leaves the
    * aggregation. Disjoint groups ⇒ sensitivity 1 ⇒ the whole release
    * is ε-DP. */
  def dpCounts(df: DataFrame, dims: Seq[Column], dimNames: Seq[String],
               eps: Double, seed: Long): DataFrame = {
    val named = dims.zip(dimNames).map { case (c, n) => c.as(n) }
    val grouped = df.groupBy(named: _*).agg(count(lit(1)).as("_cnt"))
    val key = concat_ws("\u0001",
      lit(seed.toString) +: dimNames.map(n => col(n).cast("string")): _*)
    // u ∈ (0,1) strictly: (h + 0.5) / 2^48 with h ∈ [0, 2^48)
    val u = (conv(substring(md5(key), 1, 12), 16, 10).cast("double") +
      lit(0.5)) / lit(281474976710656.0)
    val x = u - lit(0.5)
    val noise = -lit(1.0 / eps) * signum(x) * log(lit(1.0) - lit(2.0) * abs(x))
    grouped
      .withColumn("noisy_count",
        greatest(lit(0L), round(col("_cnt") + noise).cast("long")))
      .drop("_cnt")
  }
}

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

  /** EWMA smoothing over a per-key daily series — the alerting
    * baseline the reference's metrics dashboards imply (ref
    * `webapps/console/lib/shared/reporting.ts` daily rollups; an EWMA
    * with deviation flag is the standard next step over them, cf.
    * Holt/Brown exponential smoothing).
    *
    * s_1 = x_1;  s_t = alpha * x_t + (1 - alpha) * s_{t-1}.
    *
    * The recursion is inherently sequential per key, so it runs as an
    * in-row array fold: one shuffle groups each key's series into a
    * (day, value) array ordered by day (`array_sort` on the struct —
    * day-first ordering is the struct's natural comparator), one
    * codegen'd `aggregate` lambda computes every prefix's smoothed
    * value, and `posexplode` restores row form. Per-key series are
    * bounded (days × one row — the gapfill argument), so the arrays
    * stay KB-sized at any corpus scale, and the fold's IEEE mul/add
    * sequence is bit-identical in any engine that replays the same
    * order — which is what lets a plain-SQL oracle hash-match the
    * result (no libm, no pow()).
    *
    * `spike = x_t > spikeFactor * s_{t-1}` flags the alerting events
    * (compared on the ROUNDED smoothed value so the flag decision is
    * engine-exact; never fires on t=1).
    *
    * `points`: (key, d DATE, value LONG). Returns (key, d, value,
    * ewma, spike). */
  def ewmaDaily(points: DataFrame, alpha: Double = 0.2,
                spikeFactor: Double = 2.0): DataFrame = {
    val series = points
      .groupBy(col("key"))
      .agg(array_sort(collect_list(struct(col("d"), col("value"))))
        .as("xs"))
    // fold: acc = (smoothed-so-far array, previous s); emits one s per
    // prefix. cast(null) seeds the typed empty accumulator.
    val folded = series.withColumn("sm",
      expr(s"""aggregate(
        xs,
        struct(cast(array() as array<double>) as ss,
               cast(null as double) as prev),
        (acc, x) -> struct(
          acc.ss || array(
            if(acc.prev is null, cast(x.value as double),
               ${alpha}D * x.value + ${1 - alpha}D * acc.prev)),
          if(acc.prev is null, cast(x.value as double),
             ${alpha}D * x.value + ${1 - alpha}D * acc.prev)),
        acc -> acc.ss)"""))
    folded.select(col("key"), posexplode(col("xs")).as(Seq("i", "x")),
        col("sm"))
      .select(col("key"), col("x.d").as("d"), col("x.value").as("value"),
        round(element_at(col("sm"), col("i") + 1), 4).as("ewma"),
        (col("i") > 0 && col("x.value") > lit(spikeFactor) *
          round(element_at(col("sm"), col("i")), 4)).as("spike"))
  }

  /** Holt's linear-trend smoothing + h-step-ahead forecast over a
    * per-key daily series — the next rung above [[ewmaDaily]] on the
    * exponential-smoothing ladder (Holt 1957): a level AND a trend
    * component, so the forecast extrapolates drift instead of going
    * flat.
    *
    *   s_1 = x_1;  b_1 = 0
    *   s_t = alpha * x_t + (1 - alpha) * (s_{t-1} + b_{t-1})
    *   b_t = beta * (s_t - s_{t-1}) + (1 - beta) * b_{t-1}
    *   forecast_h(t) = s_t + h * b_t
    *
    * Same execution shape as [[ewmaDaily]]: the per-key recursion runs
    * as ONE in-row `aggregate` fold over the day-sorted (day, value)
    * array (per-key series are days-bounded, so KB-sized at any corpus
    * scale), and the fold's IEEE op order is written to be replayable
    * term-for-term by a recursive-CTE oracle — `a*x + (1-a)*(s+b)`,
    * then `be*(s'-s) + (1-be)*b` — so level/trend/forecast
    * hash-match across engines before the display round.
    *
    * `points`: (key, d DATE, value LONG). Returns (key, d, value,
    * level, trend, forecast) with forecast = s_t + horizonDays * b_t. */
  def holtDaily(points: DataFrame, alpha: Double = 0.3,
                beta: Double = 0.1, horizonDays: Int = 7): DataFrame = {
    val series = points
      .groupBy(col("key"))
      .agg(array_sort(collect_list(struct(col("d"), col("value"))))
        .as("xs"))
    // acc carries (emitted (s,b) pairs, prev s, prev b); the first
    // element seeds s=x, b=0 exactly as the oracle's anchor row does.
    val folded = series.withColumn("sb",
      expr(s"""aggregate(
        xs,
        struct(cast(array() as array<struct<s: double, b: double>>) as out,
               cast(null as double) as ps,
               cast(null as double) as pb),
        (acc, x) -> if(acc.ps is null,
          struct(acc.out || array(struct(cast(x.value as double) as s,
                                         0.0D as b)),
                 cast(x.value as double), 0.0D),
          struct(
            acc.out || array(struct(
              ${alpha}D * x.value + ${1 - alpha}D * (acc.ps + acc.pb) as s,
              ${beta}D * ((${alpha}D * x.value +
                ${1 - alpha}D * (acc.ps + acc.pb)) - acc.ps) +
                ${1 - beta}D * acc.pb as b)),
            ${alpha}D * x.value + ${1 - alpha}D * (acc.ps + acc.pb),
            ${beta}D * ((${alpha}D * x.value +
              ${1 - alpha}D * (acc.ps + acc.pb)) - acc.ps) +
              ${1 - beta}D * acc.pb)),
        acc -> acc.out)"""))
    folded.select(col("key"), posexplode(col("xs")).as(Seq("i", "x")),
        col("sb"))
      .select(col("key"), col("x.d").as("d"), col("x.value").as("value"),
        round(element_at(col("sb"), col("i") + 1).getField("s"), 4)
          .as("level"),
        round(element_at(col("sb"), col("i") + 1).getField("b"), 4)
          .as("trend"),
        round(element_at(col("sb"), col("i") + 1).getField("s") +
          lit(horizonDays.toDouble) *
            element_at(col("sb"), col("i") + 1).getField("b"), 4)
          .as("forecast"))
  }

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

  /** Sliding-window distinct counts — "N-day active users per day",
    * the windowed COUNT(DISTINCT) the daily rollup CANNOT answer
    * (distinct is not summable across days).
    *
    * Scale shape: each distinct (key, day) observation is EXPLODED into
    * the `windowDays` windows it contributes to (a constant ≤7/28/30×
    * fan-out of the already-deduplicated observation table), then one
    * hash count-distinct per window day. That is the distributed
    * alternative to the O(days × events) per-day range join / window
    * scan — fan-out × dedup'd observations, not windows × raw events.
    * Window days are clipped to OBSERVED days (no phantom trailing
    * windows past the data's end).
    *
    * `obs`: (key, d DATE) rows (need not be distinct). Returns
    * (wd DATE, active) — distinct keys in [wd − windowDays + 1, wd]. */
  def slidingDistinct(obs: DataFrame, windowDays: Int): DataFrame = {
    require(windowDays >= 1, "windowDays must be >= 1")
    val kd = obs.select(col("key"), col("d")).distinct()
    val days = kd.select(col("d").as("wd")).distinct()
    kd.select(col("key"), explode(sequence(col("d"),
        date_add(col("d"), windowDays - 1))).as("wd"))
      .join(days, Seq("wd"), "left_semi")
      .groupBy(col("wd"))
      .agg(countDistinct(col("key")).as("active"))
  }

  /** Mergeable-sketch form of [[slidingDistinct]] — the 100 TB shape:
    * one HLL sketch per DAY is built from the raw observations (one
    * pass, map-side partial sketches), and each window merges its
    * `windowDays` day sketches with `hll_union_agg`. The exploded unit
    * is a day-sized SKETCH ROW (days × window rows total), never the
    * observation table — windowing cost becomes independent of key
    * cardinality, which is precisely why warehouses store `uniqState`
    * by day and merge at query time. Returns (wd, active_approx). */
  def slidingDistinctApprox(obs: DataFrame, windowDays: Int): DataFrame = {
    require(windowDays >= 1, "windowDays must be >= 1")
    slidingFromDailySketches(
      obs.select(col("key"), col("d"))
        .groupBy(col("d")).agg(hll_sketch_agg(col("key")).as("sk")),
      windowDays)
  }

  /** Classical additive seasonal decomposition of a daily count
    * series, integer-exact — the "is Monday always low, or is the
    * pipeline broken" question a metrics dashboard answers before
    * alerting on raw counts:
    *   trend_milli    = centered `period`-day moving average ·10³
    *                    (null at the edges where the window is short)
    *   detrended      = n·10³ − trend
    *   seasonal_milli = per-phase mean of the detrended values
    *                    (truncating integer division — the phase is
    *                    the day's offset mod period from 1970-01-01)
    *   remainder_milli = detrended − seasonal
    * Every step is integer arithmetic in milli units; `period` must be
    * odd so the moving average centers exactly.
    *
    * `daily`: (d DATE, n LONG) — one row per day (gapfill first:
    * [[gapfillDaily]]); returns (d, n, phase, trend_milli,
    * seasonal_milli, remainder_milli).
    *
    * Scale shape: one ordered window over the DAY-count frame (3-4
    * orders below event scale), one phase-keyed aggregation joined
    * back by phase. */
  def seasonalDecompose(daily: DataFrame, period: Int = 7): DataFrame = {
    require(period >= 3 && period % 2 == 1 && period <= 365,
      "period must be odd, in [3, 365]")
    val half = period / 2
    val w = Window.orderBy(col("d")).rowsBetween(-half, half)
    val base = daily.select(col("d"), col("n").cast("long").as("n"))
      .withColumn("phase",
        pmod(datediff(col("d"), to_date(lit("1970-01-01"))),
          lit(period)).cast("long"))
      .withColumn("_wn", count(lit(1)).over(w))
      .withColumn("trend_milli",
        when(col("_wn") === period,
          expr(s"sum(n * 1000L) over (order by d rows between " +
            s"$half preceding and $half following) div ${period}L")))
      .withColumn("_detr",
        when(col("trend_milli").isNotNull,
          col("n") * 1000L - col("trend_milli")))
    val seasonal = base.filter(col("_detr").isNotNull)
      .groupBy(col("phase"))
      .agg(sum(col("_detr")).as("_sd"), count(lit(1)).as("_cd"))
      // truncating div (Spark semantics; the oracle sign-splits its
      // floor division to match)
      .select(col("phase"), expr("_sd div _cd").as("seasonal_milli"))
    base.join(seasonal, Seq("phase"), "left")
      .select(col("d"), col("n"), col("phase"), col("trend_milli"),
        col("seasonal_milli"),
        (col("_detr") - col("seasonal_milli")).as("remainder_milli"))
  }

  /** The read half over STORED day sketches — `daily`: (d DATE,
    * sk BINARY hll sketch), e.g. the table
    * [[graft.streaming.EventPipeline.startDailySketches]] maintains.
    * Each window merges its day sketches; the exploded unit is a
    * day-sized sketch row. */
  def slidingFromDailySketches(daily: DataFrame,
                               windowDays: Int): DataFrame = {
    require(windowDays >= 1, "windowDays must be >= 1")
    val days = daily.select(col("d").as("wd"))
    daily.select(col("sk"), explode(sequence(col("d"),
        date_add(col("d"), windowDays - 1))).as("wd"))
      .join(days, Seq("wd"), "left_semi")
      .groupBy(col("wd"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk")))
        .as("active_approx"))
  }

  /** CUSUM changepoint scan over a daily series (Page 1954) — the
    * level-shift detector a pipeline points at its ingest-volume or
    * quality-score rollup: the cumulative sum of deviations from the
    * whole-series mean peaks exactly where the level changes. All
    * integer: the mean is floored to millis (sign-split), per-day
    * deviations and their running sum stay in exact milli units, and
    * the peak is the day with max |cusum| (earliest day on ties).
    * Output per day: (d, n, dev_milli, cusum_milli, is_peak).
    * Integer bounds: |cusum| ≤ days · max|dev·10³| — int64-safe while
    * daily totals stay under ~10¹², i.e. any rollup that fits a long.
    *
    * Scale shape: operates on the ROLLUP (the gapfill contract):
    * every window here runs over the day-bounded frame, never events. */
  def cusumChangepoint(daily: DataFrame): DataFrame = {
    val w = Window.orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = daily.select(col("d"), col("n").cast("long").as("n"))
      .withColumn("_s", expr("sum(n) over ()"))
      .withColumn("_c", expr("count(1) over ()"))
      .withColumn("_mean_milli", expr(
        "CASE WHEN _s >= 0 THEN _s * 1000L div _c " +
          "ELSE -((-_s) * 1000L div _c) END"))
      .withColumn("dev_milli", col("n") * 1000L - col("_mean_milli"))
      .withColumn("cusum_milli", sum(col("dev_milli")).over(w))
    scored
      .withColumn("_peak", expr(
        "min(struct(-abs(cusum_milli), d)) over ()"))
      .select(col("d"), col("n"), col("dev_milli"), col("cusum_milli"),
        (col("d") === col("_peak.d")).as("is_peak"))
  }

  /** Lag-k autocorrelation of a daily series — the seasonality/
    * persistence audit next to [[seasonalDecompose]]: Pearson r
    * between (x_t, x_{t+k}) for each requested lag, in exact integer
    * micros via the sums-of-products form
    *
    *   r = (n·Σxy − Σx·Σy) / (√(n·Σx²−(Σx)²) · √(n·Σy²−(Σy)²)),
    *
    * numerator sign-split, each √ a floor(sqrt) of an exactly-
    * representable integer (the [[Conversations.groupAdvantage]]
    * discipline — exact cross-engine while the radicand < 2⁵²; scale
    * the rollup down first if daily totals push past that). Lag pairs
    * come from an equi-join of the day frame against itself shifted
    * by k days — day-bounded, no window at all. Output per lag:
    * (lag, n_pairs, r_micro); r_micro is NULL when a side is
    * constant (zero variance carries no correlation signal). */
  def autocorrelation(daily: DataFrame,
                      lags: Seq[Int] = Seq(1, 7)): DataFrame = {
    require(lags.nonEmpty && lags.forall(k => k >= 1 && k <= 3660),
      "lags must be in [1, 3660]")
    val base = daily.select(col("d"), col("n").cast("long").as("n"))
    lags.map { k =>
      lagPearsonMicro(base.as("a").join(base.as("b"),
          expr(s"date_add(a.d, $k) = b.d"))
        .select(col("a.n").as("x"), col("b.n").as("y")), k)
    }.reduce(_ unionByName _)
  }

  /** Lagged CROSS-correlation between two daily series — "does A lead
    * B?": Pearson r between (A at day d, B at day d+k) for each lag
    * (negative k = B leads A), same exact-integer sums-of-products /
    * floor(sqrt) / Pearson-clamp discipline as [[autocorrelation]].
    * The pipeline question it answers: does ingest volume lead order
    * volume, does a quality dip lead a traffic dip, and by how many
    * days. Output per lag: (lag, n_pairs, r_micro).
    *
    * Scale shape: both sides are DAY ROLLUPS (the gapfill contract) —
    * the joins and aggregates are day-bounded, never event-sized. */
  def crossCorrelation(dailyA: DataFrame, dailyB: DataFrame,
                       lags: Seq[Int] = Seq(-7, -1, 0, 1, 7)): DataFrame = {
    require(lags.nonEmpty && lags.forall(k => k >= -3660 && k <= 3660),
      "lags must be in [-3660, 3660]")
    val a = dailyA.select(col("d"), col("n").cast("long").as("n"))
    val b = dailyB.select(col("d"), col("n").cast("long").as("n"))
    lags.map { k =>
      lagPearsonMicro(a.as("a").join(b.as("b"),
          expr(s"date_add(a.d, $k) = b.d"))
        .select(col("a.n").as("x"), col("b.n").as("y")), k)
    }.reduce(_ unionByName _)
  }

  /** One lag's Pearson in exact integer micros (shared by
    * [[autocorrelation]] and [[crossCorrelation]]): the
    * sums-of-products form with decimal(38) interiors, floor(sqrt)
    * denominators, and the Pearson-bound clamp. */
  private def lagPearsonMicro(pairs: DataFrame, k: Int): DataFrame = {
      pairs.agg(count(lit(1)).as("n_pairs"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x").cast("decimal(38,0)") * col("y")).as("sxy"),
          sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx"),
          sum(col("y").cast("decimal(38,0)") * col("y")).as("syy"))
        .withColumn("lag", lit(k.toLong))
        .withColumn("_num", expr(
          "CAST(n_pairs AS DECIMAL(38,0)) * sxy " +
            "- CAST(sx AS DECIMAL(38,0)) * sy"))
        .withColumn("_dx", expr(
          "CAST(CAST(n_pairs AS DECIMAL(38,0)) * sxx " +
            "- CAST(sx AS DECIMAL(38,0)) * sx AS LONG)"))
        .withColumn("_dy", expr(
          "CAST(CAST(n_pairs AS DECIMAL(38,0)) * syy " +
            "- CAST(sy AS DECIMAL(38,0)) * sy AS LONG)"))
        .withColumn("_den",
          floor(sqrt(col("_dx"))).cast("long") *
            floor(sqrt(col("_dy"))).cast("long"))
        // the floor(sqrt) denominator can UNDERSTATE the true
        // denominator, overshooting |r| past 1e6 for tiny variances —
        // clamp to the Pearson bound on both engines so the gate value
        // always reads as a correlation
        .withColumn("r_micro", expr(
          "CASE WHEN _den > 0 THEN GREATEST(-1000000L, " +
            "LEAST(1000000L, CASE WHEN _num >= 0 " +
            "THEN CAST(_num * 1000000 div _den AS LONG) " +
            "ELSE -CAST((-_num) * 1000000 div _den AS LONG) END)) " +
            "END"))
        .select(col("lag"), col("n_pairs"), col("r_micro"))
  }
}

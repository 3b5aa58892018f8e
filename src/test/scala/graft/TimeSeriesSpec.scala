package graft

import java.sql.Date

import graft.operators.TimeSeries

/** Gap-filled daily resample: planted gaps get manufactured rows with
  * zero-fill and LOCF, observed rows pass through untouched. */
class TimeSeriesSpec extends GraftSpec {
  import spark.implicits._

  test("gapfillDaily: dense grid, zero-fill, LOCF, is_gap flags") {
    val pts = Seq(
      ("a", Date.valueOf("2024-01-01"), 5L),
      ("a", Date.valueOf("2024-01-04"), 2L), // 2-day gap before this
      ("b", Date.valueOf("2024-02-10"), 7L)  // single-point key: no grid
    ).toDF("key", "d", "value")
    val got = TimeSeries.gapfillDaily(pts)
      .select("key", "d", "value", "value_zero", "value_locf", "is_gap")
      .as[(String, Date, Option[Long], Long, Long, Boolean)]
      .collect().sortBy(r => (r._1, r._2.toString)).toSeq
    assert(got == Seq(
      ("a", Date.valueOf("2024-01-01"), Some(5L), 5L, 5L, false),
      ("a", Date.valueOf("2024-01-02"), None, 0L, 5L, true),
      ("a", Date.valueOf("2024-01-03"), None, 0L, 5L, true),
      ("a", Date.valueOf("2024-01-04"), Some(2L), 2L, 2L, false),
      ("b", Date.valueOf("2024-02-10"), Some(7L), 7L, 7L, false)))
  }

  test("ewmaDaily: hand-computed recursion, seed = first observation") {
    val pts = Seq(
      ("a", Date.valueOf("2024-01-01"), 10L),
      ("a", Date.valueOf("2024-01-02"), 20L),
      ("a", Date.valueOf("2024-01-03"), 5L),
      ("b", Date.valueOf("2024-01-01"), 7L)
    ).toDF("key", "d", "value")
    val got = TimeSeries.ewmaDaily(pts, alpha = 0.5)
      .select("key", "d", "ewma")
      .as[(String, Date, Double)].collect()
      .map { case (k, d, e) => (k, d.toString) -> e }.toMap
    // s1=10, s2=.5*20+.5*10=15, s3=.5*5+.5*15=10
    assert(got == Map(
      ("a", "2024-01-01") -> 10.0, ("a", "2024-01-02") -> 15.0,
      ("a", "2024-01-03") -> 10.0, ("b", "2024-01-01") -> 7.0))
  }

  test("holtDaily: hand-computed level/trend recursion + forecast") {
    val pts = Seq(
      ("a", Date.valueOf("2024-01-01"), 8L),
      ("a", Date.valueOf("2024-01-02"), 12L),
      ("a", Date.valueOf("2024-01-03"), 10L),
      ("b", Date.valueOf("2024-01-01"), 5L)
    ).toDF("key", "d", "value")
    val got = TimeSeries.holtDaily(pts, alpha = 0.25, beta = 0.125,
        horizonDays = 7)
      .select("key", "d", "level", "trend", "forecast")
      .as[(String, Date, Double, Double, Double)].collect()
      .map { case (k, d, s, b, f) => (k, d.toString) -> ((s, b, f)) }.toMap
    // s1=8 b1=0; s2=.25*12+.75*8=9, b2=.125*1=0.125;
    // s3=.25*10+.75*9.125=9.34375, b3=.125*.34375+.875*.125=0.15234375
    assert(got == Map(
      ("a", "2024-01-01") -> ((8.0, 0.0, 8.0)),
      ("a", "2024-01-02") -> ((9.0, 0.125, 9.875)),
      ("a", "2024-01-03") -> ((9.3438, 0.1523, 10.4102)),
      ("b", "2024-01-01") -> ((5.0, 0.0, 5.0))))
  }

  test("holtDaily matches a sequential reference fold") {
    val rnd = new scala.util.Random(11)
    val pts = for (k <- Seq("x", "y"); i <- 0 until 40)
      yield (k, Date.valueOf(java.time.LocalDate.of(2024, 1, 1)
        .plusDays(i.toLong)), rnd.nextInt(100).toLong)
    val got = TimeSeries.holtDaily(pts.toDF("key", "d", "value"),
        alpha = 0.25, beta = 0.125, horizonDays = 7)
      .select("key", "d", "level", "trend").as[(String, Date, Double, Double)]
      .collect().map { case (k, d, s, b) => (k, d.toString) -> ((s, b)) }
      .toMap
    val exp = pts.groupBy(_._1).flatMap { case (k, rows) =>
      val sorted = rows.sortBy(_._2.toString)
      var s = Double.NaN; var b = 0.0
      sorted.map { case (_, d, v) =>
        if (s.isNaN) { s = v.toDouble }
        else {
          val s2 = 0.25 * v + 0.75 * (s + b)
          b = 0.125 * (s2 - s) + 0.875 * b
          s = s2
        }
        (k, d.toString) ->
          ((math.rint(s * 10000) / 10000, math.rint(b * 10000) / 10000))
      }
    }
    assert(got == exp)
  }

  test("ewmaDaily matches a sequential reference fold at alpha=0.2") {
    val rnd = new scala.util.Random(7)
    val pts = for (k <- Seq("x", "y"); i <- 0 until 40)
      yield (k, Date.valueOf(java.time.LocalDate.of(2024, 1, 1)
        .plusDays(i.toLong)), rnd.nextInt(100).toLong)
    val got = TimeSeries.ewmaDaily(pts.toDF("key", "d", "value"))
      .select("key", "d", "ewma").as[(String, Date, Double)]
      .collect().map { case (k, d, e) => (k, d.toString) -> e }.toMap
    val exp = pts.groupBy(_._1).flatMap { case (k, rows) =>
      val sorted = rows.sortBy(_._2.toString)
      var s = Double.NaN
      sorted.map { case (_, d, v) =>
        s = if (s.isNaN) v.toDouble else 0.2 * v + 0.8 * s
        (k, d.toString) -> math.rint(s * 10000) / 10000
      }
    }
    assert(got == exp)
  }

  test("ewmaDaily: spike flags value > factor * previous smoothed, " +
    "never on the first day") {
    val pts = Seq(
      ("a", Date.valueOf("2024-01-01"), 100L), // huge first day: no flag
      ("a", Date.valueOf("2024-01-02"), 10L),
      ("a", Date.valueOf("2024-01-03"), 200L)  // > 2 * s_2
    ).toDF("key", "d", "value")
    val got = TimeSeries.ewmaDaily(pts)
      .select("d", "spike").as[(Date, Boolean)].collect().toMap
    assert(got == Map(
      Date.valueOf("2024-01-01") -> false,
      Date.valueOf("2024-01-02") -> false,
      Date.valueOf("2024-01-03") -> true))
  }

  private def sliding(obs: Seq[(String, String)], w: Int)
      : Map[String, Long] =
    TimeSeries.slidingDistinct(
      obs.map { case (k, d) => (k, Date.valueOf(d)) }.toDF("key", "d"), w)
      .as[(Date, Long)].collect()
      .map { case (d, n) => d.toString -> n }.toMap

  test("slidingDistinct: hand-computed 2-day windows, clipped to " +
    "observed days") {
    val obs = Seq(
      "u1" -> "2024-01-01", "u2" -> "2024-01-01",
      "u1" -> "2024-01-03")
    // window [d-1, d]: Jan1 -> {u1,u2}; Jan3 -> {u1};
    // Jan2 is not an observed day -> no row despite Jan1 activity
    assert(sliding(obs, 2) ==
      Map("2024-01-01" -> 2L, "2024-01-03" -> 1L))
  }

  test("slidingDistinct: windowDays=1 equals per-day distinct; " +
    "duplicates collapse") {
    val obs = Seq("u1" -> "2024-01-01", "u1" -> "2024-01-01",
      "u2" -> "2024-01-01", "u1" -> "2024-01-02")
    assert(sliding(obs, 1) ==
      Map("2024-01-01" -> 2L, "2024-01-02" -> 1L))
  }

  test("slidingDistinct: a user active on several window days counts " +
    "once per window") {
    val obs = Seq("u1" -> "2024-01-01", "u1" -> "2024-01-02",
      "u2" -> "2024-01-02")
    // Jan2's 3-day window sees u1 twice -> still distinct 2
    assert(sliding(obs, 3) ==
      Map("2024-01-01" -> 1L, "2024-01-02" -> 2L))
  }

  test("slidingDistinctApprox: merged day-sketches agree with the " +
    "exact sliding distinct at small cardinalities") {
    val obs = (1 to 40).flatMap { u =>
      Seq(s"u$u" -> s"2024-01-${"%02d".format(1 + u % 5)}",
        s"u$u" -> s"2024-01-${"%02d".format(1 + (u * 7) % 5)}")
    }
    val df = obs.map { case (k, d) => (k, Date.valueOf(d)) }
      .toDF("key", "d")
    val exact = TimeSeries.slidingDistinct(df, 3)
      .as[(Date, Long)].collect().toMap
    val approx = TimeSeries.slidingDistinctApprox(df, 3)
      .as[(Date, Long)].collect().toMap
    assert(approx.keySet == exact.keySet)
    // HLL runs exact in sparse mode at these cardinalities
    exact.foreach { case (d, n) => assert(approx(d) == n, s"day $d") }
  }

  test("seasonalDecompose: a perfectly periodic series decomposes to flat trend, exact phase means, zero remainder") {
    import org.apache.spark.sql.functions._
    // 14 days from the epoch, n = 10 + (day mod 7): pure seasonality
    val daily = (0 until 14)
      .map(i => (java.sql.Date.valueOf(
        java.time.LocalDate.ofEpochDay(i.toLong)), 10L + i % 7))
      .toDF("d", "n")
    val rows = TimeSeries.seasonalDecompose(daily, period = 7)
      .collect()
      .map(r => r.getAs[java.sql.Date]("d").toLocalDate.toEpochDay -> r)
      .toMap
    assert(rows.size == 14)
    // full centered windows exist for days 3..10: any 7 consecutive
    // values sum to 10+11+...+16 = 91 -> trend = 91000 div 7 = 13000
    (3L to 10L).foreach { i =>
      val r = rows(i)
      assert(r.getAs[Long]("trend_milli") == 13000L, s"day $i")
      assert(r.getAs[Long]("phase") == i % 7)
      // detrended = (phase - 3) * 1000 exactly = the phase mean
      assert(r.getAs[Long]("seasonal_milli") == (i % 7 - 3) * 1000,
        s"day $i seasonal")
      assert(r.getAs[Long]("remainder_milli") == 0L, s"day $i rem")
    }
    // edges: no full window -> null trend and remainder
    Seq(0L, 1L, 2L, 11L, 12L, 13L).foreach { i =>
      val r = rows(i)
      assert(r.isNullAt(r.fieldIndex("trend_milli")), s"day $i")
      assert(r.isNullAt(r.fieldIndex("remainder_milli")), s"day $i")
    }
    // even or out-of-range periods are rejected loudly
    intercept[IllegalArgumentException] {
      TimeSeries.seasonalDecompose(daily, period = 4)
    }
  }

  test("cusumChangepoint: hand-computed running deviations; earliest max-|cusum| day flagged") {
    val daily = Seq(("2024-01-01", 1L), ("2024-01-02", 1L),
      ("2024-01-03", 4L))
      .map { case (d, n) => (Date.valueOf(d), n) }.toDF("d", "n")
    val r = TimeSeries.cusumChangepoint(daily).collect()
      .map(x => x.getAs[Date]("d").toString ->
        (x.getAs[Long]("dev_milli"), x.getAs[Long]("cusum_milli"),
          x.getAs[Boolean]("is_peak"))).toMap
    // mean 2 -> devs -1000, -1000, 2000; cusum -1000, -2000, 0
    assert(r("2024-01-01") == ((-1000L, -1000L, false)))
    assert(r("2024-01-02") == ((-1000L, -2000L, true)))
    assert(r("2024-01-03") == ((2000L, 0L, false)))
  }

  test("autocorrelation: exact-square case hits 1e6; overshoot clamps to the Pearson bound; constant series null") {
    val vals = Seq(0L, 2L, 0L, 2L, 0L, 2L)
    val daily = vals.zipWithIndex.map { case (n, i) =>
      (Date.valueOf(s"2024-01-0${i + 1}"), n) }.toDF("d", "n")
    val r = TimeSeries.autocorrelation(daily, Seq(1, 2)).collect()
      .map(x => x.getAs[Long]("lag") ->
        (x.getAs[Long]("n_pairs"),
          Option(x.getAs[Any]("r_micro")).map(_.asInstanceOf[Long])))
      .toMap
    // lag 2 aligns the period exactly: r = 1
    assert(r(2L) == ((4L, Some(1000000L))))
    // lag 1 anti-correlates; den = floor(sqrt 24)^2 = 16 understates
    // the true denominator so the raw quotient overshoots to
    // -1500000 — the Pearson-bound clamp pins it at -1e6
    assert(r(1L) == ((5L, Some(-1000000L))))
    val const = (1 to 4).map(i =>
      (Date.valueOf(s"2024-01-0$i"), 7L)).toDF("d", "n")
    val rc = TimeSeries.autocorrelation(const, Seq(1)).collect().head
    assert(rc.isNullAt(rc.fieldIndex("r_micro")))
  }

  test("crossCorrelation: a 1-day-shifted copy peaks at lag 1; empty lag emits (lag, 0, null)") {
    val a = Seq(0L, 2L, 0L, 2L).zipWithIndex.map { case (n, i) =>
      (Date.valueOf(s"2024-01-0${i + 1}"), n) }.toDF("d", "n")
    // B is A delayed one day: days 2-5 carry A's days 1-4
    val b = Seq(0L, 2L, 0L, 2L).zipWithIndex.map { case (n, i) =>
      (Date.valueOf(s"2024-01-0${i + 2}"), n) }.toDF("d", "n")
    val r = TimeSeries.crossCorrelation(a, b, Seq(0, 1, 30)).collect()
      .map(x => x.getAs[Long]("lag") ->
        ((x.getAs[Long]("n_pairs"),
          Option(x.getAs[Any]("r_micro")).map(_.asInstanceOf[Long]))))
      .toMap
    // aligned at the true delay: perfect correlation over all 4 pairs
    assert(r(1L) == ((4L, Some(1000000L))))
    // misaligned by the period half: anti-correlated, clamp pins -1e6
    assert(r(0L) == ((3L, Some(-1000000L))))
    // a lag past the overlap emits the degenerate row, not no row
    assert(r(30L) == ((0L, None)))
  }
}

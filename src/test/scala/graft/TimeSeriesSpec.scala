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
}

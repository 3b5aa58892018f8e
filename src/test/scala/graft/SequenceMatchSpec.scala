package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.SequenceMatch

/** Ordered sequence matching (A then B, no C between, within window):
  * every branch of the match predicate on hand-crafted journeys. */
class SequenceMatchSpec extends GraftSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val isA = col("e") === "A"
  private val isB = col("e") === "B"
  private val isC = col("e") === "C"

  private def tag(rows: Seq[(Long, Timestamp, Long, String)]) =
    SequenceMatch.tagMatches(rows.toDF("u", "ts", "id", "e"),
        col("u"), col("ts"), col("id"), isA, isB, isC, 3600L)
      .select(col("key").as[Long], col("ts").as[Timestamp],
        col(SequenceMatch.MatchedCol).as[Boolean],
        col(SequenceMatch.SecsCol).as[Option[Double]])
      .collect().toSeq.sortBy(r => (r._1, r._2.toString))

  test("A then B within window matches; latency exact") {
    val got = tag(Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "A"),
      (1L, ts("2024-01-01 10:10:00"), 2L, "B")))
    assert(got == Seq((1L, ts("2024-01-01 10:10:00"), true, Some(600.0))))
  }

  test("interposed C blocks the match; a fresh A after C re-arms") {
    val got = tag(Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "A"),
      (1L, ts("2024-01-01 10:05:00"), 2L, "C"),
      (1L, ts("2024-01-01 10:10:00"), 3L, "B"), // blocked
      (1L, ts("2024-01-01 10:20:00"), 4L, "A"),
      (1L, ts("2024-01-01 10:30:00"), 5L, "B"))) // matched via 2nd A
    assert(got.map(r => (r._3, r._4)) ==
      Seq((false, None), (true, Some(600.0))))
  }

  test("C before A is harmless; window expiry kills the pair") {
    val got = tag(Seq(
      (1L, ts("2024-01-01 09:00:00"), 1L, "C"),
      (1L, ts("2024-01-01 10:00:00"), 2L, "A"),
      (1L, ts("2024-01-01 10:30:00"), 3L, "B"), // C precedes A: fine
      (2L, ts("2024-01-01 10:00:00"), 4L, "A"),
      (2L, ts("2024-01-01 12:00:01"), 5L, "B"))) // 7201s > 3600s window
    assert(got.map(r => (r._1, r._3)) == Seq((1L, true), (2L, false)))
  }

  test("B with no prior A never matches; keys are independent") {
    val got = tag(Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "B"),
      (2L, ts("2024-01-01 09:59:00"), 2L, "A"))) // other user's A
    assert(got == Seq((1L, ts("2024-01-01 10:00:00"), false, None)))
  }

  test("report aggregates keys/matches and exact mean latency") {
    val rows = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "A"),
      (1L, ts("2024-01-01 10:10:00"), 2L, "B"), // 600 s
      (2L, ts("2024-01-01 10:00:00"), 3L, "A"),
      (2L, ts("2024-01-01 10:20:00"), 4L, "B"), // 1200 s
      (3L, ts("2024-01-01 10:00:00"), 5L, "B")) // no A
    val r = SequenceMatch.report(rows.toDF("u", "ts", "id", "e"),
      col("u"), col("ts"), col("id"), isA, isB, isC, 3600L).collect().head
    assert(r.getAs[Long]("n_keys_with_b") == 3L)
    assert(r.getAs[Long]("n_keys_matched") == 2L)
    assert(r.getAs[Long]("n_matches") == 2L)
    assert(r.getAs[Double]("avg_secs") == 900.0)
  }
}

package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Scd2

class Scd2Spec extends GraftSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def up(rows: (String, String, String)*): DataFrame =
    rows.map { case (k, t, a) => (k, ts(s"$t 00:00:00"), a) }
      .toDF("key", "ts", "attr")

  private def sortedRows(df: DataFrame) =
    df.select("key", "attr", "valid_from", "valid_to", "is_current")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getTimestamp(2),
        Option(r.getTimestamp(3)), r.getBoolean(4)))
      .sortBy(t => (t._1, t._3.getTime))
      .toSeq

  test("scd2: builds a version chain from scratch, closing each version") {
    val u = up(("k1", "2024-01-01", "a"), ("k1", "2024-01-02", "b"),
      ("k1", "2024-01-03", "b"), ("k1", "2024-01-05", "c"))
    val dim = Scd2.merge(Scd2.emptyDim(u, "key", "ts", Seq("attr")),
      u, "key", "ts", Seq("attr"))
    assert(sortedRows(dim) == Seq(
      ("k1", "a", ts("2024-01-01 00:00:00"), Some(ts("2024-01-02 00:00:00")), false),
      ("k1", "b", ts("2024-01-02 00:00:00"), Some(ts("2024-01-05 00:00:00")), false),
      ("k1", "c", ts("2024-01-05 00:00:00"), None, true)))
  }

  test("scd2: incremental fold is row-identical to one-shot merge") {
    val u = up(
      ("k1", "2024-01-01", "a"), ("k1", "2024-01-02", "b"),
      ("k1", "2024-01-03", "b"), ("k1", "2024-01-04", "a"),
      ("k2", "2024-01-02", "x"), ("k2", "2024-01-05", "y"),
      ("k3", "2024-01-04", "q"))
    val empty = Scd2.emptyDim(u, "key", "ts", Seq("attr"))
    val oneShot = Scd2.merge(empty, u, "key", "ts", Seq("attr"))
    // fold day by day (5 separate merges)
    val days = Seq("2024-01-01", "2024-01-02", "2024-01-03",
      "2024-01-04", "2024-01-05")
    val folded = days.foldLeft(empty) { (dim, d) =>
      Scd2.merge(dim, u.filter(col("ts") === ts(s"$d 00:00:00")),
        "key", "ts", Seq("attr"))
    }
    assert(sortedRows(folded) == sortedRows(oneShot))
  }

  test("scd2: keys without updates pass through untouched; history never changes") {
    val u1 = up(("k1", "2024-01-01", "a"), ("k1", "2024-01-03", "b"),
      ("k2", "2024-01-01", "z"))
    val empty = Scd2.emptyDim(u1, "key", "ts", Seq("attr"))
    val d1 = Scd2.merge(empty, u1, "key", "ts", Seq("attr"))
    // second batch only touches k1
    val d2 = Scd2.merge(d1, up(("k1", "2024-01-05", "c")),
      "key", "ts", Seq("attr"))
    val r = sortedRows(d2)
    // k2 row identical to d1's
    assert(r.filter(_._1 == "k2") == sortedRows(d1).filter(_._1 == "k2"))
    // k1 history row (a) untouched, old current (b) closed, new current c
    assert(r.filter(_._1 == "k1") == Seq(
      ("k1", "a", ts("2024-01-01 00:00:00"), Some(ts("2024-01-03 00:00:00")), false),
      ("k1", "b", ts("2024-01-03 00:00:00"), Some(ts("2024-01-05 00:00:00")), false),
      ("k1", "c", ts("2024-01-05 00:00:00"), None, true)))
  }

  test("scd2: no-change updates produce no new versions") {
    val u1 = up(("k1", "2024-01-01", "a"))
    val empty = Scd2.emptyDim(u1, "key", "ts", Seq("attr"))
    val d1 = Scd2.merge(empty, u1, "key", "ts", Seq("attr"))
    val d2 = Scd2.merge(d1, up(("k1", "2024-01-02", "a"),
      ("k1", "2024-01-03", "a")), "key", "ts", Seq("attr"))
    assert(sortedRows(d2) == Seq(
      ("k1", "a", ts("2024-01-01 00:00:00"), None, true)))
  }

  test("scd2: null attrs compare null-safely (null -> null is no change)") {
    val u = Seq(
      ("k1", ts("2024-01-01 00:00:00"), null.asInstanceOf[String]),
      ("k1", ts("2024-01-02 00:00:00"), null.asInstanceOf[String]),
      ("k1", ts("2024-01-03 00:00:00"), "a"),
      ("k1", ts("2024-01-04 00:00:00"), null.asInstanceOf[String])
    ).toDF("key", "ts", "attr")
    val dim = Scd2.merge(Scd2.emptyDim(u, "key", "ts", Seq("attr")),
      u, "key", "ts", Seq("attr"))
    val r = sortedRows(dim)
    assert(r.map(_._2) == Seq(null, "a", null))
    assert(r.count(_._5) == 1)
  }

  test("scd2: update at the exact current valid_from instant wins the tie") {
    val u1 = up(("k1", "2024-01-02", "a"))
    val empty = Scd2.emptyDim(u1, "key", "ts", Seq("attr"))
    val d1 = Scd2.merge(empty, u1, "key", "ts", Seq("attr"))
    val d2 = Scd2.merge(d1, up(("k1", "2024-01-02", "b")),
      "key", "ts", Seq("attr"))
    val r = sortedRows(d2)
    // anchor 'a' and update 'b' share the instant: update is ordered
    // after the anchor, so 'a' is a zero-length closed version and 'b'
    // is current
    assert(r == Seq(
      ("k1", "a", ts("2024-01-02 00:00:00"), Some(ts("2024-01-02 00:00:00")), false),
      ("k1", "b", ts("2024-01-02 00:00:00"), None, true)))
  }

  test("scd2: dimension never shuffles — update keys broadcast to the semi/anti split") {
    val u = up(("k1", "2024-01-01", "a"))
    val dim = Scd2.merge(Scd2.emptyDim(u, "key", "ts", Seq("attr")),
      u, "key", "ts", Seq("attr"))
    val plan = Scd2.merge(dim, up(("k1", "2024-01-02", "b")),
      "key", "ts", Seq("attr"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast key-split joins, got:\n$plan")
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.Cdc

class CdcSpec extends GraftSpec {
  import spark.implicits._

  private def snap = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0)
  ).toDF("id", "name", "bal")

  test("latest lsn wins per key; deletes drop; inserts add; " +
    "untouched pass through") {
    val ops = Seq(
      // id=1: u then u — second wins
      (1L, "a", 11.0, "u", 10L), (1L, "a", 12.0, "u", 20L),
      // id=2: u then d — delete wins
      (2L, "b2", 99.0, "u", 10L), (2L, "b2", 99.0, "d", 20L),
      // id=3: d then u — update wins (out-of-order arrival, lsn decides)
      (3L, "c", 0.0, "d", 10L), (3L, "c3", 33.0, "u", 20L),
      // id=9: brand-new key
      (9L, "z", 90.0, "i", 10L)
    ).toDF("id", "name", "bal", "op", "lsn")
    val got = Cdc.applyBatch(snap, ops, Seq("id"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2)))
      .toMap
    assert(got == Map(
      1L -> ("a", 12.0),
      3L -> ("c3", 33.0),
      4L -> ("d", 40.0),   // untouched
      9L -> ("z", 90.0)))
    assert(!got.contains(2L))
  }

  test("empty ops batch returns the snapshot unchanged") {
    val ops = Seq.empty[(Long, String, Double, String, Long)]
      .toDF("id", "name", "bal", "op", "lsn")
    val out = Cdc.applyBatch(snap, ops, Seq("id"))
    assert(out.collect().toSet == snap.collect().toSet)
  }

  test("composite keys resolve independently") {
    val dim = Seq((1L, "x", 1.0), (1L, "y", 2.0))
      .toDF("id", "sub", "v")
    val ops = Seq((1L, "x", 5.0, "u", 1L), (1L, "y", 2.0, "d", 1L))
      .toDF("id", "sub", "v", "op", "lsn")
    val got = Cdc.applyBatch(dim, ops, Seq("id", "sub")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == Set((1L, "x", 5.0)))
  }

  test("snapshot side is not shuffled (broadcast anti join)") {
    val ops = Seq((1L, "a", 11.0, "u", 10L))
      .toDF("id", "name", "bal", "op", "lsn")
    val plan = Cdc.applyBatch(snap, ops, Seq("id"))
      .queryExecution.executedPlan.toString
    // the touched/untouched split must be a broadcast anti join (the
    // one Exchange in the plan is the ops-batch aggregation, which is
    // bounded by the CDC batch, never the snapshot)
    assert(plan.contains("BroadcastHashJoin") &&
      plan.contains("LeftAnti"), s"no broadcast anti join:\n$plan")
  }
}

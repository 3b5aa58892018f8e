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

  test("applyCdc micro-batches: sequential warehouse folds equal one " +
    "applyBatch fold; re-inserted keys resurrect through the tombstone") {
    import graft.sinks.{SinkOptions, SinkRouter}
    val wh = java.nio.file.Files.createTempDirectory("graft-cdc")
      .toFile.getAbsolutePath
    val router = new SinkRouter(wh,
      SinkOptions(deduplicate = true, primaryKey = "id"))
    val batches = Seq(
      // seed
      Seq((1L, "a", 10.0, "i", 1L), (2L, "b", 20.0, "i", 2L),
        (3L, "c", 30.0, "i", 3L), (4L, "d", 40.0, "i", 4L)),
      // update 1, delete 2
      Seq((1L, "a1", 11.0, "u", 10L), (2L, "b", 20.0, "d", 11L)),
      // re-insert 2 (must resurrect), delete 3
      Seq((2L, "b2", 22.0, "i", 20L), (3L, "c", 30.0, "d", 21L))
    ).map(_.toDF("id", "name", "bal", "op", "lsn"))
    batches.foreach(b => router.applyCdc(spark, "t", b))
    val got = router.readTable(spark, "t")
      .select("id", "name", "bal")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2)))
      .toMap
    // reference: plain batch folds over an empty snapshot
    val empty = Seq.empty[(Long, String, Double)].toDF("id", "name", "bal")
    val expected = batches.foldLeft(empty)((snap, ops) =>
      Cdc.applyBatch(snap, ops.select("id", "name", "bal", "op", "lsn"),
        Seq("id")))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2)))
      .toMap
    assert(got == expected)
    assert(got == Map(
      1L -> ("a1", 11.0), 2L -> ("b2", 22.0), 4L -> ("d", 40.0)))
  }

  test("applyCdc: delete counts skip already-tombstoned keys; upserts " +
    "and deletes report separately") {
    import graft.sinks.{SinkOptions, SinkRouter}
    val wh = java.nio.file.Files.createTempDirectory("graft-cdc")
      .toFile.getAbsolutePath
    val router = new SinkRouter(wh,
      SinkOptions(deduplicate = true, primaryKey = "id"))
    val seed = Seq((1L, "a", "i", 1L), (2L, "b", "i", 2L))
      .toDF("id", "name", "op", "lsn")
    assert(router.applyCdc(spark, "t", seed) == ((2L, 0L)))
    val del = Seq((2L, "b", "d", 10L)).toDF("id", "name", "op", "lsn")
    assert(router.applyCdc(spark, "t", del) == ((0L, 1L)))
    // deleting the same key again is a no-op on the vector
    val del2 = Seq((2L, "b", "d", 20L)).toDF("id", "name", "op", "lsn")
    assert(router.applyCdc(spark, "t", del2) == ((0L, 0L)))
    assert(router.readTable(spark, "t").count() == 1)
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

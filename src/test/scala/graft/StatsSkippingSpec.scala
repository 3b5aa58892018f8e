package graft

import org.apache.spark.sql.functions._

import graft.operators.{StatsSkipping, ZOrder}

class StatsSkippingSpec extends GraftSpec {
  import spark.implicits._

  test("collect: per-bucket min/max/nulls/count are exact") {
    val df = Seq(
      (0L, 1L, Some(10L)), (0L, 5L, None), (1L, 7L, Some(2L)))
      .toDF("bucket", "a", "b")
      .select(col("bucket"), col("a"), col("b"))
    val st = StatsSkipping.collect(df, "bucket", Seq("a", "b"))
      .orderBy("bucket").collect()
    assert(st.length == 2)
    val r0 = st(0)
    assert(r0.getLong(r0.fieldIndex("n_rows")) == 2)
    assert(r0.getLong(r0.fieldIndex("a_min")) == 1)
    assert(r0.getLong(r0.fieldIndex("a_max")) == 5)
    assert(r0.getLong(r0.fieldIndex("b_nulls")) == 1)
    assert(r0.getLong(r0.fieldIndex("b_min")) == 10)
  }

  test("candidateBuckets: a bucket survives iff no range excludes it") {
    val st = Seq(
      (0L, 2L, 0L, 10L),   // a in [0,10]  -> excluded (max < 20)
      (1L, 2L, 15L, 25L),  // overlaps [20,30] -> candidate
      (2L, 2L, 30L, 40L),  // overlaps at 30   -> candidate
      (3L, 2L, 41L, 50L))  // min > 30 -> excluded
      .toDF("bucket", "n_rows", "a_min", "a_max")
    val c = StatsSkipping.candidateBuckets(st, Seq(("a", 20L, 30L)))
      .select("bucket").as[Long].collect().sorted.toSeq
    assert(c == Seq(1L, 2L))
  }

  test("prunedScan is row-identical to the plain filter") {
    val df = spark.range(2000).select(
      (col("id") % 32).as("bucket"), col("id").as("a"),
      (col("id") * 7 % 1000).as("c"))
    val stats = StatsSkipping.collect(df, "bucket", Seq("a"))
    val ranges = Seq(("a", 500L, 800L))
    val pruned = StatsSkipping.prunedScan(df, stats, "bucket", ranges)
      .select("a", "c").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val plain = df.filter(col("a").between(500, 800))
      .select("a", "c").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(pruned.toSeq == plain.toSeq)
  }

  test("z-order layout prunes a 2-col box far better than a random layout") {
    // two independent-ish dims over 4096 rows, 64 buckets of 64 rows
    val base = spark.range(4096).select(col("id"),
      (col("id") % 64).as("x"), ((col("id") * 37) % 64).as("y"))
    val zed = base.withColumn("z",
        ZOrder.zValue16(col("x"), 0, 63, col("y"), 0, 63))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("z"), col("id"))))
      .withColumn("bucket", expr("(rk - 1) div 64"))
    // insertion-order chunks: every bucket spans all of x and y
    val rnd = base.withColumn("bucket", expr("id div 64"))
    val ranges = Seq(("x", 8L, 23L), ("y", 8L, 23L))    // a 16x16 box = 1/16 of area
    def nCand(df: org.apache.spark.sql.DataFrame): Long =
      StatsSkipping.candidateBuckets(
        StatsSkipping.collect(df, "bucket", Seq("x", "y")), ranges).count()
    val (nz, nr) = (nCand(zed), nCand(rnd))
    assert(nr == 64, s"random layout should prune nothing, pruned to $nr")
    assert(nz <= 16, s"z-order layout should prune most buckets, kept $nz")
    // and the pruned scans still agree with the plain filter
    val exact = base.filter(col("x").between(8, 23) && col("y").between(8, 23)).count()
    val viaZ = StatsSkipping.prunedScan(zed,
      StatsSkipping.collect(zed, "bucket", Seq("x", "y")), "bucket", ranges).count()
    assert(viaZ == exact)
  }

  test("prunedScan broadcasts the candidate set (no dim-side shuffle)") {
    val df = spark.range(256).select((col("id") % 8).as("bucket"),
      col("id").as("a"))
    val stats = StatsSkipping.collect(df, "bucket", Seq("a"))
    val plan = StatsSkipping.prunedScan(df, stats, "bucket",
      Seq(("a", 10L, 50L))).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"plan:\n$plan")
  }
}

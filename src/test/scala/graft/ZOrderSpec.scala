package graft

import org.apache.spark.sql.functions._

import graft.operators.ZOrder

/** Morton-key correctness on known bit patterns, and the layout
  * property that justifies the rewrite: after clusterBy, every range
  * bucket is a small rectangle in BOTH dimensions. */
class ZOrderSpec extends GraftSpec {
  import spark.implicits._

  test("interleave16: known Morton values") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 5L),
      (65535L, 0L), (0L, 65535L)).toDF("a", "b")
    val got = df.select(col("a"), col("b"),
        ZOrder.interleave16(col("a"), col("b")).as("z"))
      .as[(Long, Long, Long)].collect().toMap2
    assert(got((0L, 0L)) == 0L)
    assert(got((1L, 0L)) == 1L)
    assert(got((0L, 1L)) == 2L)
    assert(got((1L, 1L)) == 3L)
    // a=3 (011), b=5 (101): z = 1*1 + 2*1 + 4*1 + 8*0 + 16*0 + 32*1 = 39
    assert(got((3L, 5L)) == 39L)
    assert(got((65535L, 0L)) == 0x55555555L) // even bits
    assert(got((0L, 65535L)) == 0xAAAAAAAAL) // odd bits
  }

  test("norm16: endpoints map to 0 and 65535; degenerate span to 0") {
    val df = Seq(10L, 60L, 110L).toDF("v")
    val got = df.select(ZOrder.norm16(col("v"), 10L, 110L).as("n"))
      .as[Long].collect().sorted.toSeq
    assert(got == Seq(0L, 32767L, 65535L))
    assert(df.select(ZOrder.norm16(col("v"), 5L, 5L).as("n"))
      .as[Long].collect().forall(_ == 0L))
  }

  test("clusterBy: every bucket is narrow in BOTH dimensions") {
    // a 64x64 grid: single-column sorting would leave the other
    // dimension spanning the full 0..63 range in every bucket
    val grid = spark.range(64L * 64L)
      .select((col("id") / 64).cast("long").as("x"),
        (col("id") % 64).cast("long").as("y"))
    val buckets = ZOrder.clusterBy(grid, "x", "y", numFiles = 16)
      .withColumn("p", spark_partition_id())
      .groupBy(col("p"))
      .agg((max(col("x")) - min(col("x"))).as("sx"),
        (max(col("y")) - min(col("y"))).as("sy"),
        count(lit(1)).as("n"))
      .as[(Int, Long, Long, Long)].collect()
    assert(buckets.map(_._4).sum == 64L * 64L)
    // 16 buckets over a 64x64 Morton curve = 4x4 macro-cells: each
    // bucket should span at most ~1/4 of each dimension (allow slack
    // for range-boundary straddle, but far below the full 63 span)
    val worstX = buckets.map(_._2).max
    val worstY = buckets.map(_._3).max
    assert(worstX <= 32 && worstY <= 32,
      s"bucket spans too wide: x=$worstX y=$worstY")
  }

  private implicit class Tupled(rows: Array[(Long, Long, Long)]) {
    def toMap2: Map[(Long, Long), Long] =
      rows.map(r => (r._1, r._2) -> r._3).toMap
  }
}

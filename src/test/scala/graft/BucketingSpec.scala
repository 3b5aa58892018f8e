package graft


import org.apache.spark.sql.functions._

/** Scale evidence for co-located joins (SURVEY §2.5 "partitioning &
  * shuffle" and SCALE.md): persisting both sides of a recurring join
  * bucketed + sorted on the join key removes the shuffle AND the sort
  * from every subsequent join — the Spark-native form of the
  * pre-partitioned co-located join a 100 TB fact/fact join needs.
  */
class BucketingSpec extends GraftSpec {

  test("bucketed+sorted tables join with no exchange and no sort") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    li.write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    orders.write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_bucketed")
    try {
      val joined = spark.table("li_bucketed")
        .join(spark.table("orders_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      // co-located: the join itself introduces no shuffle of either side
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey"),
        s"lineitem side was shuffled:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning(o_orderkey"),
        s"orders side was shuffled:\n$plan")
      // correctness unchanged vs the plain join
      val expected = li.join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val got = joined.collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS orders_bucketed")
    }
  }
}

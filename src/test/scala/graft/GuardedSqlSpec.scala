package graft

import graft.sql.GuardedSql
import graft.sql.GuardedSql.SqlRejected

class GuardedSqlSpec extends GraftSpec {

  private lazy val init: Unit = {
    spark.read.parquet(s"$sf/lineitem.parquet")
      .createOrReplaceTempView("lineitem_v")
  }

  test("SELECT passes, default limit 50, row numbers from 1") {
    init
    val out = GuardedSql.query(spark,
      "SELECT l_orderkey FROM lineitem_v ORDER BY l_orderkey")
    val rows = out.collect()
    assert(rows.length == 50)
    assert(rows.map(_.getAs[Int]("#")).toSeq == (1 to 50))
  }

  test("user limit below api limit respected; above clamped") {
    init
    assert(GuardedSql.query(spark,
      "SELECT l_orderkey FROM lineitem_v ORDER BY l_orderkey LIMIT 7")
      .count() == 7)
    assert(GuardedSql.query(spark,
      "SELECT l_orderkey FROM lineitem_v ORDER BY l_orderkey LIMIT 9999")
      .count() == 50)
  }

  test("offset shifts rows and numbering") {
    init
    val rows = GuardedSql.query(spark,
      "SELECT l_orderkey FROM lineitem_v ORDER BY l_orderkey LIMIT 5",
      offset = 3).collect()
    assert(rows.length == 5)
    assert(rows.head.getAs[Int]("#") == 4)
  }

  test("non-SELECT statements rejected") {
    init
    intercept[SqlRejected](GuardedSql.query(spark,
      "DROP TABLE lineitem_v"))
    intercept[SqlRejected](GuardedSql.query(spark,
      "INSERT INTO lineitem_v VALUES (1)"))
    intercept[SqlRejected](GuardedSql.query(spark,
      "SET spark.sql.shuffle.partitions=1"))
    intercept[SqlRejected](GuardedSql.query(spark,
      "SELECT 1; SELECT 2"))
  }

  test("';' inside a string literal is not treated as multi-statement") {
    init
    val rows = GuardedSql.query(spark, "SELECT 'a;b' AS s").collect()
    assert(rows.length == 1 && rows.head.getAs[String]("s") == "a;b")
    // trailing semicolon is a single statement too
    assert(GuardedSql.query(spark, "SELECT 1 AS x;").count() == 1)
    val ex = intercept[SqlRejected](GuardedSql.query(spark,
      "SELECT 1; DROP TABLE lineitem_v"))
    assert(ex.getMessage.contains("multi-statement"))
  }

  test("table whitelist enforced") {
    init
    intercept[SqlRejected](GuardedSql.query(spark,
      "SELECT * FROM lineitem_v", allowedTables = Set("orders")))
    assert(GuardedSql.query(spark,
      "SELECT l_orderkey FROM lineitem_v ORDER BY 1 LIMIT 1",
      allowedTables = Set("lineitem_v")).count() == 1)
  }
}

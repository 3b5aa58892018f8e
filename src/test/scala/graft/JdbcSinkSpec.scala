package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sinks.{JdbcSink, SinkOptions, SinkRouter}

class JdbcSinkSpec extends GraftSpec {
  import spark.implicits._

  private def freshUrl() = {
    val dir = Files.createTempDirectory("graft-jdbc").toFile.getAbsolutePath
    s"jdbc:derby:$dir/wh;create=true"
  }

  test("append + read-back round trip routes by _table") {
    val sink = new JdbcSink(freshUrl())
    val batch = Seq(
      ("m1", "2024-01-01 00:00:00", "tracks"),
      ("m2", "2024-01-01 00:00:00", "pages"),
      ("m3", "2024-01-02 00:00:00", "tracks")
    ).toDF("messageId", "ts", "_table")
    sink.write(batch)
    val tracks = sink.readTable(spark, "tracks")
    assert(tracks.count() == 2)
    assert(tracks.columns.toSeq.contains("message_id"))
    assert(sink.readTable(spark, "pages").count() == 1)
  }

  test("schema evolution: ALTER ADD COLUMN, old rows read back null") {
    val sink = new JdbcSink(freshUrl())
    sink.write(Seq(("m1", "a")).toDF("message_id", "col_a")
      .withColumn("_table", lit("t")))
    sink.write(Seq(("m2", "b", 42)).toDF("message_id", "col_a", "col_b")
      .withColumn("_table", lit("t")))
    val t = sink.readTable(spark, "t")
    assert(t.columns.toSet == Set("message_id", "col_a", "col_b"))
    assert(t.filter(col("message_id") === "m1")
      .select("col_b").collect().head.isNullAt(0))
    assert(t.count() == 2)
    val frozen = new JdbcSink(freshUrl(), SinkOptions(schemaFreeze = true))
    frozen.write(Seq(("m1", "a")).toDF("message_id", "col_a")
      .withColumn("_table", lit("t")))
    intercept[IllegalStateException] {
      frozen.write(Seq(("m2", "b", 1)).toDF("message_id", "col_a", "col_b")
        .withColumn("_table", lit("t")))
    }
  }

  test("MERGE upsert: latest per key wins, batch beats timestamp ties") {
    val sink = new JdbcSink(freshUrl(), SinkOptions(deduplicate = true))
    def ts(s: String) = to_timestamp(lit(s))
    sink.write(Seq(("m1", "v1"), ("m2", "v1")).toDF("message_id", "payload")
      .withColumn("timestamp", ts("2024-01-01 10:00:00"))
      .withColumn("_table", lit("t")))
    // same ts for m1 (tie -> batch wins), older ts for m2 (stored wins),
    // new key m3, and an in-batch duplicate of m3 (latest collapses first)
    val b2 = Seq(
      ("m1", "v2", "2024-01-01 10:00:00"),
      ("m2", "stale", "2023-12-31 00:00:00"),
      ("m3", "old", "2024-01-01 09:00:00"),
      ("m3", "new", "2024-01-01 11:00:00")
    ).toDF("message_id", "payload", "s")
      .withColumn("timestamp", to_timestamp(col("s"))).drop("s")
    sink.write(b2.withColumn("_table", lit("t")))
    val t = sink.readTable(spark, "t")
    val rows = t.select("message_id", "payload").as[(String, String)]
      .collect().toMap
    assert(t.count() == 3)
    assert(rows == Map("m1" -> "v2", "m2" -> "v1", "m3" -> "new"))
  }

  test("key-only table merges as insert-only (no empty UPDATE SET)") {
    val sink = new JdbcSink(freshUrl(),
      SinkOptions(deduplicate = true, timestampColumn = "message_id"))
    val b = Seq("m1", "m2").toDF("message_id").withColumn("_table", lit("t"))
    sink.write(b)
    sink.write(Seq("m2", "m3").toDF("message_id").withColumn("_table", lit("t")))
    assert(sink.readTable(spark, "t").count() == 3)
  }

  test("JDBC and parquet routers agree on the append+merge flow") {
    val sf = "/root/testdata/sf0.001"
    val env = graft.sources.DriverEventsAdapter.load(spark, sf)
      .select(col("message_id"), col("timestamp"), col("anonymous_id"),
        col("user_id"), col("type"))
      .withColumn("_table", lit("events"))
    val jdbc = new JdbcSink(freshUrl(), SinkOptions(deduplicate = true))
    val wh = Files.createTempDirectory("graft-par").toFile.getAbsolutePath
    val parquet = new SinkRouter(wh, SinkOptions(deduplicate = true))
    val recognized = graft.operators.UserRecognition
      .resolveBatch(env.drop("_table"))
      .filter(col("recognized"))
      .select(col("message_id"), col("timestamp"), col("anonymous_id"),
        col("user_id"), col("type"))
      .withColumn("_table", lit("events"))
    Seq[(org.apache.spark.sql.DataFrame => Unit)](
      b => jdbc.write(b), b => parquet.write(b))
      .foreach { w => w(env); w(recognized) }
    val a = jdbc.readTable(spark, "events")
      .select("message_id", "user_id").orderBy("message_id")
      .as[(String, Option[String])].collect().toSeq
    val b = parquet.readTable(spark, "events")
      .select("message_id", "user_id").orderBy("message_id")
      .as[(String, Option[String])].collect().toSeq
    assert(a.nonEmpty && a == b)
  }

  test("deleteWhere + exportSubject: GDPR parity on the JDBC warehouse") {
    import org.apache.spark.sql.functions._
    val sink = new JdbcSink(freshUrl())
    val rows = Seq(
      ("m1", "u1", "click"), ("m2", "u2", "view"), ("m3", "u1", "buy"))
      .toDF("messageId", "userId", "etype")
    sink.write(rows.withColumn("_table", lit("ev")))
    sink.write(rows.filter(col("etype") === "buy")
      .select(col("userId"), col("messageId"))
      .withColumn("_table", lit("orders_t")))
    // export BEFORE erasure sees u1 in both tables
    val before = sink.exportSubject(spark, "user_id", "u1")
      .groupBy("tbl").count().as[(String, Long)].collect().toMap
    assert(before == Map("ev" -> 2L, "orders_t" -> 1L))
    assert(sink.deleteWhere("ev", "\"user_id\" = 'u1'") == 2L)
    val after = sink.exportSubject(spark, "user_id", "u1")
      .groupBy("tbl").count().as[(String, Long)].collect().toMap
    assert(after == Map("orders_t" -> 1L))
    assert(sink.deleteWhere("missing", "1 = 1") == 0L)
    assert(sink.readTable(spark, "ev").count() == 1L)
  }
}

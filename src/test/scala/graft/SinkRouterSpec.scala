package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sinks.{SinkOptions, SinkRouter}

class SinkRouterSpec extends GraftSpec {
  import spark.implicits._

  private def tmpDir() =
    Files.createTempDirectory("graft-sink").toFile.getAbsolutePath

  test("routes rows by _table and snake_cases columns") {
    val wh = tmpDir()
    val batch = Seq(
      ("m1", "2024-01-01 00:00:00", "tracks"),
      ("m2", "2024-01-01 00:00:00", "pages"),
      ("m3", "2024-01-01 00:00:00", "tracks")
    ).toDF("messageId", "ts", "_table")
    new SinkRouter(wh).write(batch)
    val tracks = spark.read.parquet(s"$wh/tracks")
    assert(tracks.count() == 2)
    assert(tracks.columns.toSeq.contains("message_id"))
    assert(spark.read.parquet(s"$wh/pages").count() == 1)
  }

  test("schema evolution: new column appears as null on old rows") {
    val wh = tmpDir()
    val router = new SinkRouter(wh)
    router.write(Seq(("m1", "a")).toDF("message_id", "col_a")
      .withColumn("_table", lit("t")))
    router.write(Seq(("m2", "b", 42)).toDF("message_id", "col_a", "col_b")
      .withColumn("_table", lit("t")))
    val t = router.readTable(spark, "t")
    assert(t.columns.toSet == Set("message_id", "col_a", "col_b"))
    assert(t.filter(col("message_id") === "m1")
      .select("col_b").collect().head.isNullAt(0))
    assert(t.count() == 2)
  }

  test("schemaFreeze rejects new columns") {
    val wh = tmpDir()
    val router = new SinkRouter(wh, SinkOptions(schemaFreeze = true))
    router.write(Seq(("m1", "a")).toDF("message_id", "col_a")
      .withColumn("_table", lit("t")))
    intercept[IllegalStateException] {
      router.write(Seq(("m2", "b", 1)).toDF("message_id", "col_a", "col_b")
        .withColumn("_table", lit("t")))
    }
  }

  test("dedup merge: latest per primary key wins (UR re-emission overwrite)") {
    val wh = tmpDir()
    val router = new SinkRouter(wh, SinkOptions(deduplicate = true))
    router.write(Seq(
      ("m1", java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), null: String),
      ("m2", java.sql.Timestamp.valueOf("2024-01-01 10:05:00"), "u1")
    ).toDF("message_id", "timestamp", "user_id").withColumn("_table", lit("events")))
    // re-emitted recognized event: same message_id, identity filled
    router.write(Seq(
      ("m1", java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), "u1")
    ).toDF("message_id", "timestamp", "user_id").withColumn("_table", lit("events")))
    val t = router.readTable(spark, "events")
    assert(t.count() == 2) // m1 overwritten, not duplicated
    val m1 = t.filter(col("message_id") === "m1").collect().head
    assert(m1.getAs[String]("user_id") == "u1")
  }
}

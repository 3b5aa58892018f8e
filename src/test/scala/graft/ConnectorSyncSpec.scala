package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.ConnectorSync
import graft.sources.ConnectorSync.{StreamConfig, StreamState}

class ConnectorSyncSpec extends GraftSpec {
  import spark.implicits._

  private def tmpDir() =
    Files.createTempDirectory("graft-sync").toFile.getAbsolutePath

  private def stageSource(dir: String, rows: Seq[(Long, String, String)])
      : Unit =
    rows.toDF("id", "updated_at", "payload")
      .withColumn("updated_at", col("updated_at").cast("timestamp"))
      .write.mode("overwrite").parquet(s"$dir/items.parquet")

  private val itemsCfg = StreamConfig("items", "incremental",
    Some("updated_at"), primaryKey = "id")

  test("incremental sync reads only rows at/after the cursor and " +
    "advances state") {
    val src = tmpDir(); val wh = tmpDir()
    stageSource(src, Seq(
      (1L, "2024-01-01 00:00:00", "a"),
      (2L, "2024-01-02 00:00:00", "b"),
      (3L, "2024-01-03 00:00:00", "c")))
    val r = ConnectorSync.syncStream(spark, src, wh, itemsCfg,
      StreamState("items", Some("2024-01-02 00:00:00")))
    assert(r.rowsRead == 2)  // inclusive boundary: ids 2 and 3
    assert(r.newState.cursor.contains("2024-01-03 00:00:00"))
    assert(ConnectorSync.readDest(spark, wh, itemsCfg).count() == 2)
  }

  test("boundary re-sync is idempotent via the pk dedup merge") {
    val src = tmpDir(); val wh = tmpDir()
    stageSource(src, Seq(
      (1L, "2024-01-01 00:00:00", "a"),
      (2L, "2024-01-02 00:00:00", "b")))
    val r1 = ConnectorSync.syncStream(spark, src, wh, itemsCfg,
      StreamState("items", None))
    val r2 = ConnectorSync.syncStream(spark, src, wh, itemsCfg, r1.newState)
    assert(r1.rowsRead == 2)
    assert(r2.rowsRead == 1)  // boundary row re-read...
    val dest = ConnectorSync.readDest(spark, wh, itemsCfg)
    assert(dest.count() == 2) // ...but deduped at the destination
  }

  test("new and updated source rows flow through on the next run") {
    val src = tmpDir(); val wh = tmpDir()
    stageSource(src, Seq(
      (1L, "2024-01-01 00:00:00", "a"),
      (2L, "2024-01-02 00:00:00", "b")))
    val r1 = ConnectorSync.syncStream(spark, src, wh, itemsCfg,
      StreamState("items", None))
    // source mutates: id=2 updated (cursor bumps), id=3 inserted
    stageSource(src, Seq(
      (1L, "2024-01-01 00:00:00", "a"),
      (2L, "2024-01-05 00:00:00", "b2"),
      (3L, "2024-01-04 00:00:00", "c")))
    val r2 = ConnectorSync.syncStream(spark, src, wh, itemsCfg, r1.newState)
    assert(r2.rowsRead == 2)
    assert(r2.newState.cursor.contains("2024-01-05 00:00:00"))
    val dest = ConnectorSync.readDest(spark, wh, itemsCfg)
      .select("id", "payload").as[(Long, String)].collect().toMap
    assert(dest == Map(1L -> "a", 2L -> "b2", 3L -> "c"))
  }

  test("empty incremental slice writes nothing and keeps the old cursor") {
    val src = tmpDir(); val wh = tmpDir()
    stageSource(src, Seq((1L, "2024-01-01 00:00:00", "a")))
    val r = ConnectorSync.syncStream(spark, src, wh, itemsCfg,
      StreamState("items", Some("2030-01-01 00:00:00")))
    assert(r.rowsRead == 0)
    assert(r.newState.cursor.contains("2030-01-01 00:00:00"))
  }

  test("full_refresh replaces the destination wholesale") {
    val src = tmpDir(); val wh = tmpDir()
    val cfg = StreamConfig("items", "full_refresh")
    stageSource(src, Seq(
      (1L, "2024-01-01 00:00:00", "a"),
      (2L, "2024-01-02 00:00:00", "b")))
    ConnectorSync.syncStream(spark, src, wh, cfg, StreamState("items", None))
    stageSource(src, Seq((9L, "2024-02-01 00:00:00", "z")))
    val r2 = ConnectorSync.syncStream(spark, src, wh, cfg,
      StreamState("items", None))
    assert(r2.rowsRead == 1)
    val dest = ConnectorSync.readDest(spark, wh, cfg)
    assert(dest.select("id").as[Long].collect().toSeq == Seq(9L))
  }

  test("cursor predicate reaches the parquet scan (pushed filter)") {
    val src = tmpDir()
    stageSource(src, Seq((1L, "2024-01-01 00:00:00", "a")))
    val df = spark.read.parquet(s"$src/items.parquet")
      .filter(col("updated_at") >=
        lit("2024-01-01 00:00:00").cast("timestamp"))
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(updated_at), " +
      "GreaterThanOrEqual(updated_at"), s"no pushdown:\n$scan")
  }
}

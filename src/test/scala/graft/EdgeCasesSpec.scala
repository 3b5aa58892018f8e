package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.chain.{FunctionChain, RetryPolicy}
import graft.chain.FunctionChain._
import graft.functions.TextFunctions
import graft.operators.{Dedup, Sessionize, UserRecognition}
import graft.schema.EventSchema
import graft.sql.GuardedSql

class EdgeCasesSpec extends GraftSpec {
  import spark.implicits._

  test("fromJson: malformed rows yield null fields, message_id filled") {
    val raw = Seq(
      """{"message_id":"m1","type":"track","event":"click"}""",
      """not json at all""",
      """{"type":"page"}""" // no message_id -> uuid filled
    ).toDS()
    val out = EventSchema.fromJson(raw).collect()
    assert(out.length == 3)
    assert(out.forall(_.getAs[String]("message_id") != null))
    val types = out.map(_.getAs[String]("type")).toSet
    assert(types.contains("track") && types.contains("page"))
  }

  test("chain: malformed JSON event becomes a parse-error row") {
    val out = FunctionChain.run(Seq("{broken").toDS(),
      Seq(EventFunction("f", builtin = true, _ => Same))).collect()
    assert(out.head.status == "error" && out.head.functionId == "parse")
  }

  test("empty inputs: dedup/sessionize/UR on zero rows") {
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.jaccardPairs(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.minhashLshPairs(emptyDocs, "doc_id", "text").count() == 0)
    val emptyEvents = Seq.empty[(String, String, String, Timestamp)]
      .toDF("message_id", "anonymous_id", "user_id", "timestamp")
    assert(UserRecognition.resolveBatch(emptyEvents).count() == 0)
    assert(Sessionize.sessions(emptyEvents, col("anonymous_id"),
      col("timestamp")).count() == 0)
  }

  test("shingles: texts shorter than n words give empty arrays") {
    val out = Seq((1L, "one two"), (2L, ""), (3L, "a b c d"))
      .toDF("doc_id", "text")
      .select(TextFunctions.shingles(col("text"), 3).as("sh"))
      .collect().map(_.getSeq[String](0).length)
    assert(out.toSeq == Seq(0, 0, 2))
  }

  test("retry policy: exponential backoff capped at 24h, DLQ after 3") {
    val rows = Seq(("e1", "retry", "f1", "boom")).toDF(
      "event", "status", "functionId", "error")
    val t0 = lit(Timestamp.valueOf("2024-01-01 00:00:00"))
    val a1 = RetryPolicy.schedule(rows, t0).collect().head
    assert(a1.getAs[Int]("attempt") == 1)
    assert(a1.getAs[Timestamp]("retry_after") ==
      Timestamp.valueOf("2024-01-01 00:10:00")) // 10 min
    val a3 = RetryPolicy.schedule(rows, t0, lit(2)).collect().head
    assert(a3.getAs[Timestamp]("retry_after") ==
      Timestamp.valueOf("2024-01-01 16:40:00")) // 1000 min
    val a4 = RetryPolicy.schedule(rows, t0, lit(3)).collect().head
    assert(a4.getAs[Boolean]("dead_letter")) // attempt 4 > MaxRetries
    // backoff for attempt 4 would be 10^4 min -> capped at 1440
    val capped = RetryPolicy.schedule(rows, t0, lit(3))
      .select((unix_timestamp(col("retry_after")) -
        unix_timestamp(t0)) / 60).as[Double].collect().head
    assert(capped == 1440.0)
  }

  test("schema introspection lists registered tables") {
    spark.read.parquet(s"$sf/nation.parquet")
      .createOrReplaceTempView("nation_introspect")
    val described = GuardedSql.describeTables(spark)
    assert(described.contains("nation_introspect"))
    val cols = described("nation_introspect").map(_._1)
    assert(cols.contains("n_name"))
  }

  test("eventTimeSafe clamps: null timestamp falls back to receivedAt") {
    val out = Seq(
      (Timestamp.valueOf("2024-01-01 10:00:00"), Timestamp.valueOf("2024-01-01 10:00:05")),
      (null, Timestamp.valueOf("2024-01-01 11:00:00"))
    ).toDF("ts", "received_at")
      .select(graft.functions.Scalars.eventTimeSafe(col("ts"), col("received_at")).as("t"))
      .as[Timestamp].collect()
    assert(out(0) == Timestamp.valueOf("2024-01-01 10:00:00"))
    assert(out(1) == Timestamp.valueOf("2024-01-01 11:00:00"))
  }

  test("registry integrity: every query has an oracle and every oracle a query (the driver's gate covers the whole surface)") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    val qOnly = q -- o
    val oOnly = o -- q
    assert(qOnly.isEmpty, s"queries without an oracle: $qOnly")
    assert(oOnly.isEmpty, s"oracles without a query (mis-anchored insert?): $oOnly")
    assert(q.nonEmpty)
  }
}

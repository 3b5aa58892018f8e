package graft

import java.nio.file.Files

import com.fasterxml.jackson.databind.node.ObjectNode

import org.apache.spark.sql.functions._

import graft.chain.FunctionChain
import graft.chain.FunctionChain._
import graft.operators.UserRecognition
import graft.sinks.{SinkOptions, SinkRouter}
import graft.sources.DriverEventsAdapter
import graft.sql.GuardedSql
import graft.streaming.{AnnIngest, CorpusIngest, EventPipeline}

/** System-level queries: each round-trips a whole subsystem (function
  * chain, sink router, guarded SQL, streaming pipeline) and reduces the
  * result to a DuckDB-mirrorable aggregate, so the correctness gate covers
  * the runtime paths, not just column math.
  */
object QueriesSystem {
  import Queries.Q

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toFile.getAbsolutePath

  /** Test-input fabrication for `s1_streaming` (doubled JSON lines so the
    * watermark dedup has work to do), memoized per sf dir: Bench pre-stages
    * it in warmup so the timed region measures the pipeline, not writing
    * the synthetic input. */
  private val stagedInput = scala.collection.concurrent.TrieMap[String, String]()
  def stageStreamingInput(s: org.apache.spark.sql.SparkSession, dir: String): String =
    stagedInput.getOrElseUpdate(dir, {
      val in = tmp("graft-q-in")
      val env = DriverEventsAdapter.load(s, dir)
      val json = env.select(to_json(struct(env.columns.map(col): _*)).as("value"))
      json.unionAll(json) // duplicates: watermark dedup must collapse them
        .repartition(32).write.mode("overwrite").text(in)
      in
    })

  /** Staged input for `s4_leaderboard`: the envelope JSON plus a far-
    * future sentinel event, so every REAL day closes under the
    * watermark in the trailing no-data micro-batch (the sentinel's own
    * day stays open and, as a singleton, could never emit a judgment
    * anyway). Memoized per sf dir. */
  private val stagedLeaderboard = scala.collection.concurrent.TrieMap.empty[String, String]
  def stageLeaderboardInput(s: org.apache.spark.sql.SparkSession,
                            dir: String): String =
    stagedLeaderboard.getOrElseUpdate(dir, {
      import s.implicits._
      val in = tmp("graft-lb-in")
      val env = DriverEventsAdapter.load(s, dir)
      val sentinel =
        """{"message_id":"zz-sent","type":"track","event":"view",""" +
          """"timestamp":"2090-01-01T00:00:00.000Z","user_id":"zz"}"""
      env.select(to_json(struct(env.columns.map(col): _*)).as("value"))
        .unionAll(Seq(sentinel).toDF("value"))
        .coalesce(1).write.mode("overwrite").text(in)
      in
    })

  /** Staged 3-file corpus input for `s2_corpus_ingest`, memoized per sf
    * dir (Bench pre-stages it in warmup, same as the s1 input). */
  private val stagedCorpus = scala.collection.concurrent.TrieMap.empty[String, String]
  def stageCorpusBatches(s: org.apache.spark.sql.SparkSession,
                         dir: String): String =
    stagedCorpus.getOrElseUpdate(dir, {
      val in = tmp("graft-ci-in")
      val docs = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"), col("lang"), col("source"))
      (0 to 2).foreach { b =>
        val stage = tmp("graft-ci-st")
        docs.filter(pmod(col("doc_id"), lit(3)) === b).coalesce(1)
          .write.mode("overwrite").json(stage)
        val part = new java.io.File(stage).listFiles()
          .find(f => f.getName.startsWith("part-") &&
            f.getName.endsWith(".json")).get
        val dst = new java.io.File(in, s"b$b.json")
        Files.move(part.toPath, dst.toPath)
        dst.setLastModified(1700000000000L + b * 60000L)
        ()
      }
      in
    })

  /** Staged 3-file embedding input for `s3_ann_ingest` (one parquet
    * file per micro-batch, vec_id % 3, mtime ordered), memoized per sf
    * dir. Parquet staging keeps float32 embeddings bit-exact. */
  private val stagedVecs = scala.collection.concurrent.TrieMap.empty[String, String]
  def stageVecBatches(s: org.apache.spark.sql.SparkSession,
                      dir: String): String =
    stagedVecs.getOrElseUpdate(dir, {
      val in = tmp("graft-ai-in")
      val vecs = s.read.parquet(s"$dir/embeddings.parquet")
      (0 to 2).foreach { b =>
        val stage = tmp("graft-ai-st")
        vecs.filter(pmod(col("vec_id"), lit(3)) === b).coalesce(1)
          .write.mode("overwrite").parquet(stage)
        val part = new java.io.File(stage).listFiles()
          .find(f => f.getName.startsWith("part-") &&
            f.getName.endsWith(".parquet")).get
        val dst = new java.io.File(in, s"b$b.parquet")
        Files.move(part.toPath, dst.toPath)
        dst.setLastModified(1700000000000L + b * 60000L)
        ()
      }
      in
    })

  // (queries is derived from gated, declared after the oracle helper CTEs below)

  /** One row per gate: (name, query, oracle SQL) — a gate reads as
    * ONE unit (the twin-map layout, query here / oracle hundreds of
    * lines below, was a recurring editing hazard). Helper CTE vals
    * stay declared above so object-init order is safe. */
  val gated: Seq[(String, Q, String)] = Seq(
    // R1-R5: chain with SQL-mirrorable semantics — drop errors, enrich,
    // fan out purchases (only-last-multiplies)
    ("r1_chain",
      ((s, dir) => {
      import s.implicits._
      val raw = s.read.parquet(s"$dir/events.parquet")
        .select(to_json(struct(col("event_id"), col("event_type"))).as("value"))
        .as[String]
      val chain = Seq(
        EventFunction("drop_errors", builtin = true,
          e => if (e.get("event_type").asText() == "error") Drop else Same),
        EventFunction("tag", builtin = true, e => {
          e.put("tagged", true); Replace(Seq(e))
        }),
        EventFunction("fanout_purchase", builtin = false, e =>
          if (e.get("event_type").asText() == "purchase") {
            val b = e.deepCopy().asInstanceOf[ObjectNode]
            b.put("dup", true)
            Replace(Seq(e, b))
          } else Same))
      FunctionChain.run(raw, chain).toDF()
        .groupBy(get_json_object(col("event"), "$.event_type").as("event_type"),
          col("status"))
        .agg(count(lit(1)).as("n"))
    }),
      """SELECT event_type, 'success' AS status,
        |  CAST(COUNT(*) * CASE WHEN event_type = 'purchase' THEN 2 ELSE 1 END
        |    AS BIGINT) AS n
        |FROM events WHERE event_type <> 'error'
        |GROUP BY event_type""".stripMargin),
    // R4b: the reference's OWN UDF-wrapper test (udf.test.ts:5-91)
    // replayed through FunctionChain.testRun — same seeded store and
    // props, same local HTTP stand-in (the test spins an express server
    // answering "FETCH RESPONSE"; here a JDK HttpServer), same
    // mutations: log, event edits from props/store/fetch, store
    // set/set/del. The RESULT event, the store's final state, and the
    // run status are all value-pinned, field for field, against the
    // test's own expect() objects.
    ("r4b_udf_golden",
      ((s, dir) => {
      import s.implicits._
      val server = com.sun.net.httpserver.HttpServer.create(
        new java.net.InetSocketAddress("127.0.0.1", 0), 0)
      server.createContext("/",
        (ex: com.sun.net.httpserver.HttpExchange) => {
          val resp = "FETCH RESPONSE".getBytes("UTF-8")
          ex.sendResponseHeaders(200, resp.length.toLong)
          ex.getResponseBody.write(resp)
          ex.close()
        })
      server.start()
      try {
        val port = server.getAddress.getPort
        val nodes = new com.fasterxml.jackson.databind.ObjectMapper()
          .getNodeFactory
        val udf = EventFunction("udf", builtin = false,
          (e: ObjectNode, ctx: graft.chain.ChainContext) => {
            ctx.logInfo("udf")
            ctx.logError("just for the test error. ignore it")
            e.put("test", "test123")
            val result = ctx.fetch(s"http://127.0.0.1:$port/")
            e.put("prop1", ctx.props("prop1"))
            e.put("store1", ctx.store.get("store1").get.asText())
            e.put("fetch_result", result)
            ctx.store.set("test", nodes.textNode(result))
            ctx.store.set("test2", nodes.textNode(result))
            ctx.store.del("test2")
            // the reference's `return event`: functions get a deep copy
            // (R5), so returning the mutated copy IS the edit
            Replace(Seq(e))
          })
        val res = FunctionChain.testRun(Seq(udf),
          """{"messageId":"test","type":"page","context":{}}""",
          options = ChainOptions(connectionId = "udf-golden",
            props = Map("prop1" -> "test_prop1")),
          storeSeed = Map("store1" -> "\"test_store1\""))
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        val ev = mapper.readTree(res.events.head)
        import scala.jdk.CollectionConverters._
        val evRows = ev.properties().asScala.toSeq.map { en =>
          ("event", en.getKey,
            if (en.getValue.isTextual) en.getValue.asText()
            else mapper.writeValueAsString(en.getValue))
        }
        val storeRows = res.store.toSeq.map { case (k, v) =>
          val n = mapper.readTree(v)
          ("store", k, if (n.isTextual) n.asText() else v)
        }
        (evRows ++ storeRows ++ Seq(("status", "status", res.status)))
          .toDF("kind", "key", "value")
      } finally server.stop(0)
    }),
      """SELECT * FROM (VALUES
        |  ('event', 'messageId', 'test'),
        |  ('event', 'type', 'page'),
        |  ('event', 'context', '{}'),
        |  ('event', 'test', 'test123'),
        |  ('event', 'prop1', 'test_prop1'),
        |  ('event', 'store1', 'test_store1'),
        |  ('event', 'fetch_result', 'FETCH RESPONSE'),
        |  ('store', 'store1', 'test_store1'),
        |  ('store', 'test', 'FETCH RESPONSE'),
        |  ('status', 'status', 'success')
        |) t(kind, key, value)""".stripMargin),
    // R1b: the reference's functions-chain scenario TABLE
    // (functions-chain-data.ts + functions-chain.test.ts expected sets)
    // replayed through FunctionChain in rotor-parity step mode: eight
    // connections (simple/error/retry/drop_retry/dst_retry/multi/
    // multi_middle/multi_retry), each driven for attempt 0 and — where
    // a retry was queued — redriven for attempt 1. Every delivered
    // event's fields per (scenario, attempt) are value-pinned in the
    // oracle.
    ("r1b_chain_scenarios",
      ((s, dir) => {
      import s.implicits._
      def props(e: ObjectNode): ObjectNode =
        if (e.has("properties") && e.get("properties").isObject)
          e.get("properties").asInstanceOf[ObjectNode]
        else e.putObject("properties")
      def bump(p: ObjectNode): Unit = {
        p.put("counter",
          (if (p.has("counter")) p.get("counter").asInt else 0) + 1); ()
      }
      val f1 = EventFunction("function1", builtin = false,
        (e: ObjectNode, ctx: graft.chain.ChainContext) => {
          val p = props(e); p.put("first", "1st")
          p.put("retries", ctx.retries); bump(p); Replace(Seq(e))
        }, step = "udf")
      val f2 = EventFunction("function2", builtin = false,
        (e: ObjectNode, _: graft.chain.ChainContext) => {
          val p = props(e); p.put("second", "2nd"); bump(p); Replace(Seq(e))
        }, step = "udf")
      val f2error = EventFunction("function2error", builtin = false,
        (_: ObjectNode, _: graft.chain.ChainContext) =>
          throw new RuntimeException("Function is not meant to run"),
        step = "udf")
      val f2retry = EventFunction("function2retry", builtin = false,
        (e: ObjectNode, ctx: graft.chain.ChainContext) => {
          val p = props(e); p.put("second", "2nd"); bump(p)
          if (ctx.retries < 1)
            Retry("Function runs successfully only on 2nd attempt")
          else Replace(Seq(e))
        }, step = "udf")
      val f2dropretry = EventFunction("function2dropretry", builtin = false,
        (e: ObjectNode, ctx: graft.chain.ChainContext) => {
          val p = props(e); p.put("second", "2nd"); bump(p)
          if (ctx.retries < 1)
            DropRetry("Function runs successfully only on 2nd attempt")
          else Replace(Seq(e))
        }, step = "udf")
      val f3 = EventFunction("function3", builtin = false,
        (e: ObjectNode, _: graft.chain.ChainContext) => {
          val p = props(e); p.put("third", "3rd"); bump(p); Replace(Seq(e))
        }, step = "udf")
      def multiply(e: ObjectNode) = {
        val a = e.deepCopy[ObjectNode](); a.put("n", 1)
        val b = e.deepCopy[ObjectNode](); b.put("n", 2)
        Replace(Seq(a, b))
      }
      val fmulti = EventFunction("functionmulti", builtin = false,
        (e: ObjectNode, _: graft.chain.ChainContext) => multiply(e),
        step = "udf")
      val fmultiretry = EventFunction("functionmultiretry", builtin = false,
        (e: ObjectNode, ctx: graft.chain.ChainContext) =>
          if (ctx.retries < 1)
            Retry("Function runs successfully only on 2nd attempt")
          else multiply(e),
        step = "udf")
      val dstOk = EventFunction("dst", builtin = true,
        (_: ObjectNode, _: graft.chain.ChainContext) => Same, step = "dst")
      val dstRetry = EventFunction("dst", builtin = true,
        (_: ObjectNode, ctx: graft.chain.ChainContext) =>
          if (ctx.retries < 1) Retry("HTTP Error: 444 unknown") else Same,
        step = "dst")
      val chains = Seq(
        "simple" -> Seq(f1, f2, f3, dstOk),
        "error" -> Seq(f1, f2error, f3, dstOk),
        "retry" -> Seq(f1, f2retry, f3, dstOk),
        "drop_retry" -> Seq(f1, f2dropretry, f3, dstOk),
        "dst_retry" -> Seq(f1, f2, f3, dstRetry),
        "multi" -> Seq(f1, f2, fmulti, dstOk),
        "multi_middle" -> Seq(f1, fmulti, f2, dstOk),
        "multi_retry" -> Seq(f1, f2, fmultiretry, dstOk))
      val incoming = Seq("""{"type":"track","properties":{}}""").toDS()
      val opts = ChainOptions(stepRetry = true)
      val rows = chains.flatMap { case (name, chain) =>
        val a0 = FunctionChain.run(incoming, chain, options = opts)
          .collect().toSeq
        val retries0 = a0.filter(_.status == "retry")
        val a1 =
          if (retries0.isEmpty) Seq.empty
          else FunctionChain.redrive(retries0.toDS(), chain, opts)
            .collect().toSeq
        a0.filter(_.status == "success").map(o => (name, 0, o.event)) ++
          a1.filter(_.status == "success").map(o => (name, 1, o.event))
      }
      rows.toDF("scenario", "attempt", "event").select(
        col("scenario"), col("attempt"),
        get_json_object(col("event"), "$.n").cast("int").as("n"),
        get_json_object(col("event"), "$.type").as("event_type"),
        get_json_object(col("event"), "$.properties.first").as("first"),
        get_json_object(col("event"), "$.properties.second").as("second"),
        get_json_object(col("event"), "$.properties.third").as("third"),
        get_json_object(col("event"), "$.properties.counter")
          .cast("int").as("counter"),
        get_json_object(col("event"), "$.properties.retries")
          .cast("int").as("retries_prop"))
    }),
      // the reference's expected event sets, hand-copied per (scenario,
          // attempt) from functions-chain.test.ts expectedEvents — NOT a
          // replay of the implementation
      """SELECT scenario, CAST(attempt AS INT) AS attempt,
        |  CAST(n AS INT) AS n, event_type, first, second, third,
        |  CAST(counter AS INT) AS counter,
        |  CAST(retries_prop AS INT) AS retries_prop
        |FROM (VALUES
        |  ('simple',      0, NULL, 'track', '1st', '2nd', '3rd', 3, 0),
        |  ('error',       0, NULL, 'track', '1st', NULL,  '3rd', 2, 0),
        |  ('retry',       0, NULL, 'track', '1st', NULL,  '3rd', 2, 0),
        |  ('retry',       1, NULL, 'track', '1st', '2nd', '3rd', 3, 1),
        |  ('drop_retry',  1, NULL, 'track', '1st', '2nd', '3rd', 3, 1),
        |  ('dst_retry',   1, NULL, 'track', '1st', '2nd', '3rd', 3, 0),
        |  ('multi',       0, 1,    'track', '1st', '2nd', NULL,  2, 0),
        |  ('multi',       0, 2,    'track', '1st', '2nd', NULL,  2, 0),
        |  ('multi_middle',0, NULL, 'track', '1st', '2nd', NULL,  2, 0),
        |  ('multi_retry', 0, NULL, 'track', '1st', '2nd', NULL,  2, 0),
        |  ('multi_retry', 1, 1,    'track', '1st', '2nd', NULL,  2, 1),
        |  ('multi_retry', 1, 2,    'track', '1st', '2nd', NULL,  2, 1)
        |) t(scenario, attempt, n, event_type, first, second, third,
        |    counter, retries_prop)""".stripMargin),
    // §3.2 synchronous multi-connection invocation
    // (FunctionsHandlerMulti): the SAME event stream through three
    // connections' chains in one call, retries disabled — the
    // retry-raising connection's failures surface as error results
    // (no queue), the dropping connection silently eats errors, the
    // tagging connection transforms. Per-(connection, status, type)
    // counts are the response surface the sync endpoint returns.
    ("r3b_sync_multi",
      ((s, dir) => {
      import s.implicits._
      val raw = s.read.parquet(s"$dir/events.parquet")
        .select(to_json(struct(col("event_id"), col("event_type")))
          .as("value")).as[String]
      val tag = EventFunction("tag", builtin = true, (e: ObjectNode) => {
        e.put("tagged", true); Replace(Seq(e))
      })
      val dropErrors = EventFunction("drop_errors", builtin = true,
        (e: ObjectNode) =>
          if (e.get("event_type").asText() == "error") Drop else Same)
      val flakyClicks = EventFunction("flaky", builtin = false,
        (e: ObjectNode) =>
          if (e.get("event_type").asText() == "click")
            Retry("sync downstream 503") else Same)
      FunctionChain.runMulti(raw, Map(
          "c_webhook" -> Seq(tag),
          "c_filter" -> Seq(dropErrors, tag),
          "c_flaky" -> Seq(flakyClicks)))
        .groupBy(col("connection_id"), col("status"),
          get_json_object(col("event"), "$.event_type").as("event_type"))
        .agg(count(lit(1)).as("n"))
    }),
      // sync multi: every (connection, status, type) cell derivable from
          // the three chains' semantics over the raw event-type distribution
      """WITH base AS (SELECT event_type, COUNT(*) AS n FROM events
        |  GROUP BY event_type)
        |SELECT 'c_webhook' AS connection_id, 'success' AS status,
        |  event_type, CAST(n AS BIGINT) AS n FROM base
        |UNION ALL
        |SELECT 'c_filter', 'success', event_type, CAST(n AS BIGINT)
        |FROM base WHERE event_type <> 'error'
        |UNION ALL
        |SELECT 'c_flaky',
        |  CASE WHEN event_type = 'click' THEN 'error' ELSE 'success' END,
        |  event_type, CAST(n AS BIGINT) FROM base""".stripMargin),
    // P12 diff-minimized sync responses: three connections whose
    // transforms produce KNOWN merge patches — add a field, rewrite a
    // field, remove a field — so every per-(connection, patch) count
    // derives from the event-type distribution. The patch IS the
    // response payload (unchanged fields omitted, removals explicit
    // nulls).
    ("r3c_sync_diff",
      ((s, dir) => {
      import s.implicits._
      val raw = s.read.parquet(s"$dir/events.parquet")
        .select(to_json(struct(col("event_id"), col("event_type")))
          .as("value")).as[String]
      val tag = EventFunction("tag", builtin = true, (e: ObjectNode) => {
        e.put("tagged", true); Replace(Seq(e))
      })
      val upper = EventFunction("upper", builtin = true, (e: ObjectNode) => {
        e.put("event_type", e.get("event_type").asText().toUpperCase)
        Replace(Seq(e))
      })
      val strip = EventFunction("strip", builtin = true, (e: ObjectNode) => {
        e.remove("event_id"); Replace(Seq(e))
      })
      FunctionChain.runMultiDiff(raw, Map(
          "c_tag" -> Seq(tag),
          "c_upper" -> Seq(upper),
          "c_strip" -> Seq(strip)))
        .groupBy(col("connection_id"), col("status"), col("patch"))
        .agg(count(lit(1)).as("n"))
    }),
      // diff responses: the three transforms' merge patches are exactly
          // derivable — add => {"tagged":true}, rewrite => the uppercased
          // type, remove => explicit null
      """WITH base AS (SELECT event_type, COUNT(*) AS n FROM events
        |  GROUP BY event_type),
        |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM base)
        |SELECT 'c_tag' AS connection_id, 'success' AS status,
        |  '{"tagged":true}' AS patch, t AS n FROM tot
        |UNION ALL
        |SELECT 'c_strip', 'success', '{"event_id":null}', t FROM tot
        |UNION ALL
        |SELECT 'c_upper', 'success',
        |  '{"event_type":"' || UPPER(event_type) || '"}',
        |  CAST(n AS BIGINT) FROM base""".stripMargin),
    // K1: sink router round-trip — append, then UR re-emission overwrite
    // via dedup merge on message_id
    ("k1_sink_dedup",
      ((s, dir) => {
      val wh = tmp("graft-q-sink")
      val router = new SinkRouter(wh, SinkOptions(deduplicate = true))
      // env is consumed by BOTH write passes (append, then the UR
      // re-emission) — persist so the adapter projection runs once
      val env = DriverEventsAdapter.load(s, dir)
        .select(col("message_id"), col("timestamp"), col("anonymous_id"),
          col("user_id"), col("type")).persist()
      try {
        router.write(env.withColumn("_table", lit("events")))
        // re-emit recognized events (same message_id, identity filled)
        val recognized = UserRecognition.resolveBatch(env)
          .filter(col("recognized"))
          .select(col("message_id"), col("timestamp"), col("anonymous_id"),
            col("user_id"), col("type"))
        router.write(recognized.withColumn("_table", lit("events")))
      } finally { env.unpersist(false); () }
      router.readTable(s, "events")
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("message_id")).as("n_messages"),
          sum(when(col("user_id").isNotNull, 1).otherwise(0)).as("n_identified"))
    }),
      """WITH env AS (
        |  SELECT 'm' || event_id AS message_id,
        |    'a' || user_id AS anonymous_id,
        |    CASE WHEN event_type IN ('signup','purchase')
        |         THEN 'u' || user_id END AS user_id,
        |    CAST(ts AS TIMESTAMP) AS timestamp
        |  FROM events),
        |resolved AS (
        |  SELECT message_id,
        |    COALESCE(user_id,
        |      CASE WHEN next_id_ts IS NOT NULL
        |        AND next_id_ts <= timestamp + INTERVAL 30 DAY THEN next_id END)
        |      AS user_id
        |  FROM (
        |    SELECT *,
        |      MIN(CASE WHEN user_id IS NOT NULL THEN timestamp END) OVER w
        |        AS next_id_ts,
        |      FIRST_VALUE(user_id IGNORE NULLS) OVER w AS next_id
        |    FROM env
        |    WINDOW w AS (PARTITION BY anonymous_id
        |      ORDER BY timestamp, message_id
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)))
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(COUNT(DISTINCT message_id) AS BIGINT) AS n_messages,
        |  CAST(SUM(CASE WHEN user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_identified
        |FROM resolved""".stripMargin),
    // Partition backfill (INSERT OVERWRITE PARTITION / replaceWhere):
    // reprocess one broken day — the full stream lands first, then day
    // 2024-01-05 is atomically replaced by a corrected batch (same
    // rows, type uppercased as the visible fix) through the manifest
    // swap; every other partition is untouched. The oracle replays the
    // day-scoped substitution over the raw events.
    ("k14_backfill",
      ((s, dir) => {
      val wh = tmp("graft-q-bf")
      val router = new SinkRouter(wh)
      val env = DriverEventsAdapter.load(s, dir)
        .select(col("message_id"), col("timestamp"), col("type")).persist()
      try {
        router.write(env.withColumn("_table", lit("events")))
        val corrected = env
          .filter(to_date(col("timestamp")) === lit("2024-01-05"))
          .withColumn("type", upper(col("type")))
        router.overwriteDates(s, "events", corrected)
      } finally { env.unpersist(false); () }
      router.readTable(s, "events")
        .groupBy(date_format(col("timestamp"), "yyyy-MM-dd").as("day"),
          col("type"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("message_id")).as("uniq"))
    }),
      """WITH env AS (
        |  SELECT 'm' || event_id AS message_id,
        |    CAST(ts AS TIMESTAMP) AS timestamp,
        |    CASE WHEN event_type = 'signup' THEN 'identify'
        |         WHEN event_type = 'view' THEN 'page'
        |         ELSE 'track' END AS type
        |  FROM events)
        |SELECT strftime(timestamp, '%Y-%m-%d') AS day,
        |  CASE WHEN strftime(timestamp, '%Y-%m-%d') = '2024-01-05'
        |    THEN UPPER(type) ELSE type END AS type,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COUNT(DISTINCT message_id) AS BIGINT) AS uniq
        |FROM env GROUP BY 1, 2""".stripMargin),
    // Time travel (zero-copy snapshots): v1 is snapshotted BEFORE the
    // UR re-emission merge rewrites its partitions; afterwards the
    // snapshot still reads back as the pre-merge table (hard-linked
    // inodes survive the swap's unlinks) while the live table shows
    // the merged state. One query gates both timelines against the
    // SQL replay of each.
    ("k15_snapshot",
      ((s, dir) => {
      val wh = tmp("graft-q-snap")
      val router = new SinkRouter(wh, SinkOptions(deduplicate = true))
      val env = DriverEventsAdapter.load(s, dir)
        .select(col("message_id"), col("timestamp"), col("anonymous_id"),
          col("user_id"), col("type")).persist()
      try {
        router.write(env.withColumn("_table", lit("events")))
        router.snapshot("events", "v1")
        val recognized = UserRecognition.resolveBatch(env)
          .filter(col("recognized"))
          .select(col("message_id"), col("timestamp"), col("anonymous_id"),
            col("user_id"), col("type"))
        router.write(recognized.withColumn("_table", lit("events")))
      } finally { env.unpersist(false); () }
      val stat = (df: org.apache.spark.sql.DataFrame, src: String) =>
        df.agg(count(lit(1)).as("n_rows"),
            countDistinct(col("message_id")).as("n_messages"),
            sum(when(col("user_id").isNotNull, 1).otherwise(0))
              .as("n_identified"))
          .withColumn("src", lit(src))
      stat(router.readSnapshot(s, "events", "v1"), "v1")
        .unionByName(stat(router.readTable(s, "events"), "live"))
    }),
      """WITH env AS (
        |  SELECT 'm' || event_id AS message_id,
        |    'a' || user_id AS anonymous_id,
        |    CASE WHEN event_type IN ('signup','purchase')
        |         THEN 'u' || user_id END AS user_id,
        |    CAST(ts AS TIMESTAMP) AS timestamp
        |  FROM events),
        |resolved AS (
        |  SELECT message_id,
        |    COALESCE(user_id,
        |      CASE WHEN next_id_ts IS NOT NULL
        |        AND next_id_ts <= timestamp + INTERVAL 30 DAY THEN next_id END)
        |      AS user_id
        |  FROM (
        |    SELECT *,
        |      MIN(CASE WHEN user_id IS NOT NULL THEN timestamp END) OVER w
        |        AS next_id_ts,
        |      FIRST_VALUE(user_id IGNORE NULLS) OVER w AS next_id
        |    FROM env
        |    WINDOW w AS (PARTITION BY anonymous_id
        |      ORDER BY timestamp, message_id
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)))
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(COUNT(DISTINCT message_id) AS BIGINT) AS n_messages,
        |  CAST(SUM(CASE WHEN user_id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_identified,
        |  'v1' AS src
        |FROM env
        |UNION ALL
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(COUNT(DISTINCT message_id) AS BIGINT) AS n_messages,
        |  CAST(SUM(CASE WHEN user_id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_identified,
        |  'live' AS src
        |FROM resolved""".stripMargin),
    // GDPR Art. 15 subject-access export — the read counterpart of
    // k10's right-to-be-forgotten: all rows for one subject across
    // every keyed warehouse table (tables without the key column are
    // skipped), reduced to per-table counts + an order-canonical id
    // hash the oracle replays from the raw events.
    ("k13_sar",
      ((s, dir) => {
      val wh = tmp("graft-q-sar")
      val router = new SinkRouter(wh, SinkOptions(deduplicate = true))
      val env = DriverEventsAdapter.load(s, dir)
        .select(col("message_id"), col("timestamp"), col("anonymous_id"),
          col("user_id"), col("type")).persist()
      try {
        router.write(env.withColumn("_table", lit("events")))
        router.write(env.filter(col("type") === "identify")
          .withColumn("_table", lit("identifies")))
        // an unkeyed table the export must skip
        router.write(env.select(col("message_id"), col("timestamp"))
          .withColumn("_table", lit("system_log")))
      } finally { env.unpersist(false); () }
      router.exportSubject(s, "anonymous_id", "a42")
        .groupBy(col("table"))
        .agg(count(lit(1)).as("n_rows"),
          md5(concat_ws(",", sort_array(collect_list(
            get_json_object(col("row_json"), "$.message_id")))))
            .as("ids_hash"))
    }),
      """WITH env AS (
        |  SELECT 'm' || event_id AS message_id,
        |    'a' || user_id AS anonymous_id,
        |    CASE WHEN event_type = 'signup' THEN 'identify'
        |         WHEN event_type = 'view' THEN 'page'
        |         ELSE 'track' END AS type
        |  FROM events)
        |SELECT 'events' AS "table", CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  md5(string_agg(message_id, ',' ORDER BY message_id)) AS ids_hash
        |FROM env WHERE anonymous_id = 'a42'
        |HAVING COUNT(*) > 0
        |UNION ALL
        |SELECT 'identifies', CAST(COUNT(*) AS BIGINT),
        |  md5(string_agg(message_id, ',' ORDER BY message_id))
        |FROM env WHERE anonymous_id = 'a42' AND type = 'identify'
        |HAVING COUNT(*) > 0""".stripMargin),
    // K2: the SAME append + UR-re-emit + MERGE flow as k1_sink_dedup on
    // an ORC warehouse (SinkOptions(format="orc")) — the format is the
    // only variable, the oracle is identical, so the gate proves the
    // whole commit/merge/sidecar protocol is format-agnostic.
    ("k2b_orc_sink",
      ((s, dir) => {
      val wh = tmp("graft-q-orc")
      val router = new SinkRouter(wh,
        SinkOptions(deduplicate = true, format = "orc"))
      val env = DriverEventsAdapter.load(s, dir)
        .select(col("message_id"), col("timestamp"), col("anonymous_id"),
          col("user_id"), col("type")).persist()
      try {
        router.write(env.withColumn("_table", lit("events")))
        val recognized = UserRecognition.resolveBatch(env)
          .filter(col("recognized"))
          .select(col("message_id"), col("timestamp"), col("anonymous_id"),
            col("user_id"), col("type"))
        router.write(recognized.withColumn("_table", lit("events")))
      } finally { env.unpersist(false); () }
      router.readTable(s, "events")
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("message_id")).as("n_messages"),
          sum(when(col("user_id").isNotNull, 1).otherwise(0)).as("n_identified"))
    }),
      """WITH env AS (
        |  SELECT 'm' || event_id AS message_id,
        |    'a' || user_id AS anonymous_id,
        |    CASE WHEN event_type IN ('signup','purchase')
        |         THEN 'u' || user_id END AS user_id,
        |    CAST(ts AS TIMESTAMP) AS timestamp
        |  FROM events),
        |resolved AS (
        |  SELECT message_id,
        |    COALESCE(user_id,
        |      CASE WHEN next_id_ts IS NOT NULL
        |        AND next_id_ts <= timestamp + INTERVAL 30 DAY THEN next_id END)
        |      AS user_id
        |  FROM (
        |    SELECT *,
        |      MIN(CASE WHEN user_id IS NOT NULL THEN timestamp END) OVER w
        |        AS next_id_ts,
        |      FIRST_VALUE(user_id IGNORE NULLS) OVER w AS next_id
        |    FROM env
        |    WINDOW w AS (PARTITION BY anonymous_id
        |      ORDER BY timestamp, message_id
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)))
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(COUNT(DISTINCT message_id) AS BIGINT) AS n_messages,
        |  CAST(SUM(CASE WHEN user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_identified
        |FROM resolved""".stripMargin),
    // K2: JDBC warehouse round-trip (embedded Derby standing in for
    // postgres/mysql) — same append-then-merge flow as k1_sink_dedup,
    // through CREATE TABLE / staged bulk load / ANSI MERGE. Scoped to a
    // deterministic third of the stream (one connection's share — the
    // realistic load for a row-store destination; a row store ingesting
    // the full firehose is a misconfiguration, not a benchmark).
    ("k2_jdbc",
      ((s, dir) => {
      val db = tmp("graft-q-jdbc")
      val sink = new graft.sinks.JdbcSink(s"jdbc:derby:$db/wh;create=true",
        SinkOptions(deduplicate = true))
      val eid = expr("CAST(substring(message_id, 2) AS BIGINT)")
      val env = DriverEventsAdapter.load(s, dir)
        .select(col("message_id"), col("timestamp"), col("anonymous_id"),
          col("user_id"), col("type"))
        .filter(pmod(eid, lit(3)) === 0).persist()
      try {
        sink.write(env.withColumn("_table", lit("events")))
        val recognized = UserRecognition.resolveBatch(env)
          .filter(col("recognized"))
          .select(col("message_id"), col("timestamp"), col("anonymous_id"),
            col("user_id"), col("type"))
        sink.write(recognized.withColumn("_table", lit("events")))
      } finally { env.unpersist(false); () }
      sink.readTable(s, "events")
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("message_id")).as("n_messages"),
          sum(when(col("user_id").isNotNull, 1).otherwise(0)).as("n_identified"))
    }),
      """WITH env AS (
        |  SELECT 'm' || event_id AS message_id,
        |    'a' || user_id AS anonymous_id,
        |    CASE WHEN event_type IN ('signup','purchase')
        |         THEN 'u' || user_id END AS user_id,
        |    CAST(ts AS TIMESTAMP) AS timestamp
        |  FROM events WHERE event_id % 3 = 0),
        |resolved AS (
        |  SELECT message_id,
        |    COALESCE(user_id,
        |      CASE WHEN next_id_ts IS NOT NULL
        |        AND next_id_ts <= timestamp + INTERVAL 30 DAY THEN next_id END)
        |      AS user_id
        |  FROM (
        |    SELECT *,
        |      MIN(CASE WHEN user_id IS NOT NULL THEN timestamp END) OVER w
        |        AS next_id_ts,
        |      FIRST_VALUE(user_id IGNORE NULLS) OVER w AS next_id
        |    FROM env
        |    WINDOW w AS (PARTITION BY anonymous_id
        |      ORDER BY timestamp, message_id
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)))
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(COUNT(DISTINCT message_id) AS BIGINT) AS n_messages,
        |  CAST(SUM(CASE WHEN user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_identified
        |FROM resolved""".stripMargin),
    // K4: document-store destination (ref mongodb-destination.ts:41-61 —
    // upsert the WHOLE event document keyed by its id). The observable
    // contract is id-keyed whole-doc upsert of a serialized document
    // column; the sandbox store is the same Derby-backed sink (a Mongo
    // client is a driver swap on an identical flow). Doc JSON is built
    // by concat so the oracle reproduces it byte-for-byte; identify
    // events are re-written as v2 (the $set re-upsert) and must replace
    // their v1 rows.
    ("k4_docstore",
      ((s, dir) => {
      val db = tmp("graft-q-doc")
      val sink = new graft.sinks.JdbcSink(s"jdbc:derby:$db/wh;create=true",
        SinkOptions(deduplicate = true, primaryKey = "_id",
          timestampColumn = "ts"))
      val eid = expr("CAST(substring(message_id, 2) AS BIGINT)")
      val env = DriverEventsAdapter.load(s, dir)
        .filter(pmod(eid, lit(10)) === 0).persist()
      def doc(version: Int) = concat(
        lit("{\"message_id\":\""), col("message_id"),
        lit("\",\"type\":\""), col("type"),
        lit("\",\"v\":"), lit(version), lit("}"))
      try {
        val v1 = env.select(col("message_id").as("_id"),
          col("timestamp").as("ts"), doc(1).as("doc"))
        sink.write(v1.withColumn("_table", lit("events_docs")))
        val v2 = env.filter(col("type") === "identify")
          .select(col("message_id").as("_id"),
            (col("timestamp") + expr("INTERVAL 1 SECOND")).as("ts"),
            doc(2).as("doc"))
        sink.write(v2.withColumn("_table", lit("events_docs")))
      } finally { env.unpersist(false); () }
      sink.readTable(s, "events_docs")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("_id")).as("n_ids"),
          sum(get_json_object(col("doc"), "$.v").cast("long")).as("sum_v"),
          sum(length(col("doc"))).as("doc_bytes"))
    }),
      """WITH env AS (
        |  SELECT 'm' || event_id AS message_id,
        |    CASE WHEN event_type = 'signup' THEN 'identify'
        |         WHEN event_type = 'view' THEN 'page'
        |         ELSE 'track' END AS type
        |  FROM events WHERE event_id % 10 = 0),
        |docs AS (
        |  SELECT message_id,
        |    CASE WHEN type = 'identify' THEN 2 ELSE 1 END AS v,
        |    '{"message_id":"' || message_id || '","type":"' || type ||
        |      '","v":' || (CASE WHEN type = 'identify' THEN 2 ELSE 1 END)
        |      || '}' AS doc
        |  FROM env)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(COUNT(DISTINCT message_id) AS BIGINT) AS n_ids,
        |  CAST(SUM(v) AS BIGINT) AS sum_v,
        |  CAST(SUM(length(doc)) AS BIGINT) AS doc_bytes
        |FROM docs""".stripMargin),
    // K10: GDPR right-to-be-forgotten — DELETE WHERE over the file
    // warehouse. Write the events table, erase every row attributable to
    // a deterministic 10% of identified users (partition-pruned rewrite
    // through the manifest-swap protocol), read back. The gate checks
    // both the survivors (grouped counts) and the deleted row count the
    // driver-side API returned.
    ("k10_gdpr_delete",
      ((s, dir) => {
      val wh = tmp("graft-q-gdpr")
      val router = new SinkRouter(wh, SinkOptions())
      val env = DriverEventsAdapter.load(s, dir)
        .select(col("message_id"), col("timestamp"), col("user_id"),
          col("type"))
      router.write(env.withColumn("_table", lit("events")))
      val erased = col("user_id").isNotNull &&
        pmod(expr("CAST(substring(user_id, 2) AS BIGINT)"), lit(10)) === 3
      val nDeleted = router.deleteWhere(s, "events", erased)
      router.readTable(s, "events")
        .groupBy(col("type"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("message_id")).as("n_messages"),
          sum(when(col("user_id").isNotNull, 1).otherwise(0))
            .as("n_identified"))
        .withColumn("n_deleted", lit(nDeleted))
    }),
      """WITH env AS (
        |  SELECT 'm' || event_id AS message_id,
        |    CASE WHEN event_type IN ('signup','purchase')
        |         THEN 'u' || user_id END AS user_id,
        |    CASE WHEN event_type = 'signup' THEN 'identify'
        |         WHEN event_type = 'view' THEN 'page'
        |         ELSE 'track' END AS type
        |  FROM events),
        |del AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_deleted FROM env
        |  WHERE user_id IS NOT NULL
        |    AND CAST(substring(user_id, 2) AS BIGINT) % 10 = 3)
        |SELECT type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COUNT(DISTINCT message_id) AS BIGINT) AS n_messages,
        |  CAST(SUM(CASE WHEN user_id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_identified,
        |  n_deleted
        |FROM env CROSS JOIN del
        |WHERE NOT (user_id IS NOT NULL
        |           AND CAST(substring(user_id, 2) AS BIGINT) % 10 = 3)
        |GROUP BY type, n_deleted""".stripMargin),
    // K10b: merge-on-read erasure — deletion vectors instead of the
    // partition rewrite (delete = keys-sized sidecar write, applied as
    // a broadcast anti join at read; purge folds them in later). The
    // result carries the SAME grouped read-back twice — once under MoR
    // vectors ('mor', collected before the purge mutates files), once
    // after purgeDeletes ('purged') — so the oracle gates that both
    // mechanisms erase identically, plus the key/row counts.
    ("k10b_delete_mor",
      ((s, dir) => {
      val wh = tmp("graft-q-mor")
      val router = new SinkRouter(wh, SinkOptions())
      val env = DriverEventsAdapter.load(s, dir)
        .select(col("message_id"), col("timestamp"), col("user_id"),
          col("type"))
      router.write(env.withColumn("_table", lit("events")))
      val erased = col("user_id").isNotNull &&
        pmod(expr("CAST(substring(user_id, 2) AS BIGINT)"), lit(10)) === 7
      val nKeys = router.deleteWhereMor(s, "events", erased)
      def agg(df: org.apache.spark.sql.DataFrame) =
        df.groupBy(col("type"))
          .agg(count(lit(1)).as("n"),
            countDistinct(col("message_id")).as("n_messages"))
      val morDf = agg(router.readTable(s, "events"))
        .withColumn("stage", lit("mor"))
      val morLocal = s.createDataFrame(
        java.util.Arrays.asList(morDf.collect(): _*), morDf.schema)
      val nPurged = router.purgeDeletes(s, "events")
      agg(router.readTable(s, "events")).withColumn("stage", lit("purged"))
        .unionByName(morLocal)
        .withColumn("n_deleted_keys", lit(nKeys))
        .withColumn("n_purged_rows", lit(nPurged))
    }),
      """WITH env AS (
        |  SELECT 'm' || event_id AS message_id,
        |    CASE WHEN event_type IN ('signup','purchase')
        |         THEN 'u' || user_id END AS user_id,
        |    CASE WHEN event_type = 'signup' THEN 'identify'
        |         WHEN event_type = 'view' THEN 'page'
        |         ELSE 'track' END AS type
        |  FROM events),
        |del AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM env
        |  WHERE user_id IS NOT NULL
        |    AND CAST(substring(user_id, 2) AS BIGINT) % 10 = 7),
        |sel AS (
        |  SELECT type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(COUNT(DISTINCT message_id) AS BIGINT) AS n_messages
        |  FROM env
        |  WHERE NOT (user_id IS NOT NULL
        |             AND CAST(substring(user_id, 2) AS BIGINT) % 10 = 7)
        |  GROUP BY type)
        |SELECT type, n, n_messages, stage,
        |  nd AS n_deleted_keys, nd AS n_purged_rows
        |FROM (SELECT sel.*, 'mor' AS stage FROM sel
        |      UNION ALL
        |      SELECT sel.*, 'purged' AS stage FROM sel), del""".stripMargin),
    // K11: retention vacuum — drop partitions older than the retention
    // window (here 14 days back from the newest event date). Pure
    // directory-rename maintenance, zero data read; the gate checks the
    // surviving day range plus the dropped-partition count.
    ("k11_vacuum",
      ((s, dir) => {
      val wh = tmp("graft-q-vac")
      val router = new SinkRouter(wh, SinkOptions())
      val env = DriverEventsAdapter.load(s, dir)
        .select(col("message_id"), col("timestamp"), col("type"))
      router.write(env.withColumn("_table", lit("events")))
      val asOf = env.agg(max(to_date(col("timestamp")))).head()
        .getDate(0).toLocalDate
      val dropped = router.vacuum("events", 14, asOf)
      router.readTable(s, "events")
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(to_date(col("timestamp"))).as("n_days"),
          date_format(min(to_date(col("timestamp"))), "yyyy-MM-dd")
            .as("min_day"),
          date_format(max(to_date(col("timestamp"))), "yyyy-MM-dd")
            .as("max_day"))
        .withColumn("n_dropped_partitions", lit(dropped.size))
    }),
      """WITH env AS (
        |  SELECT 'm' || event_id AS message_id,
        |    CAST(ts AS TIMESTAMP) AS timestamp
        |  FROM events),
        |mx AS (SELECT MAX(CAST(timestamp AS DATE)) AS max_day FROM env),
        |drp AS (
        |  SELECT CAST(COUNT(DISTINCT CAST(e.timestamp AS DATE)) AS INT)
        |    AS n_dropped_partitions
        |  FROM env e, mx
        |  WHERE CAST(e.timestamp AS DATE) < mx.max_day - 14)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(COUNT(DISTINCT CAST(timestamp AS DATE)) AS BIGINT) AS n_days,
        |  CAST(MIN(CAST(timestamp AS DATE)) AS VARCHAR) AS min_day,
        |  CAST(MAX(CAST(timestamp AS DATE)) AS VARCHAR) AS max_day,
        |  (SELECT n_dropped_partitions FROM drp) AS n_dropped_partitions
        |FROM env, mx
        |WHERE CAST(timestamp AS DATE) >= mx.max_day - 14""".stripMargin),
    // K9/R1: dead-letter flow — a permanently failing destination is
    // retried MaxRetries times with exponential backoff, then every event
    // lands in the DLQ split; backoff schedule oracle-checked
    ("k9_dlq",
      ((s, dir) => {
      import s.implicits._
      val raw = s.read.parquet(s"$dir/events.parquet")
        .select(to_json(struct(col("event_id"), col("event_type"))).as("value"))
        .as[String]
      val dst = Seq(EventFunction("dst", builtin = false,
        (_: ObjectNode) => Retry("dst permanently down")))
      val t0 = to_timestamp(lit("2024-06-01 00:00:00"))
      var table = chain.RetryPolicy.schedule(
        FunctionChain.run(raw, dst).filter(col("status") === "retry").toDF(), t0)
      for (attempt <- 2 to chain.RetryPolicy.MaxRetries + 1) {
        val due = chain.RetryPolicy.due(table,
          to_timestamp(lit("2099-01-01 00:00:00")))
        val redriven = FunctionChain.redrive(
          due.select("event", "status", "functionId", "error")
            .as[FunctionChain.ChainOutput], dst)
        table = chain.RetryPolicy.schedule(
          redriven.filter(col("status") === "retry").toDF(), t0,
          prevAttempt = lit(attempt - 1))
      }
      chain.RetryPolicy.deadLetters(table).agg(
        count(lit(1)).as("n_dead"),
        max(col("attempt")).cast("int").as("final_attempt"),
        round(max(chain.RetryPolicy.backoffMinutes(lit(1))), 1).as("b1"),
        round(max(chain.RetryPolicy.backoffMinutes(lit(2))), 1).as("b2"),
        round(max(chain.RetryPolicy.backoffMinutes(lit(3))), 1).as("b3"),
        round(max(chain.RetryPolicy.backoffMinutes(lit(4))), 1).as("b4"))
    }),
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_dead,
        |  4 AS final_attempt,
        |  10.0 AS b1, 100.0 AS b2, 1000.0 AS b3, 1440.0 AS b4
        |FROM events""".stripMargin),
    // K7: events-log sink persisted as a real warehouse table — chain
    // outputs (success/retry with levels) land via the sink router and
    // aggregate back out
    ("k7_events_log",
      ((s, dir) => {
      import s.implicits._
      val wh = tmp("graft-q-log")
      val router = new SinkRouter(wh)
      val raw = s.read.parquet(s"$dir/events.parquet")
        .select(to_json(struct(col("event_id"), col("event_type"))).as("value"))
        .as[String]
      val chain = Seq(
        EventFunction("drop_errors", builtin = true,
          e => if (e.get("event_type").asText() == "error") Drop else Same),
        EventFunction("dst", builtin = false, (e: ObjectNode) =>
          e.get("event_type").asText() match {
            case "click" => Retry("dst 503")
            case "purchase" =>
              val b = e.deepCopy[ObjectNode]()
              b.put("dup", true)
              Replace(Seq(e, b))
            case _ => Same
          }))
      graft.chain.EventsLog.persist(router, FunctionChain.run(raw, chain), "c1")
      router.readTable(s, "events_log")
        .groupBy(col("level"), col("status"), col("function_id"))
        .agg(count(lit(1)).as("n"))
    }),
      """SELECT 'warn' AS level, 'retry' AS status, 'dst' AS function_id,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM events WHERE event_type = 'click'
        |UNION ALL
        |SELECT 'info', 'success', 'dst',
        |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 2 ELSE 1 END)
        |    AS BIGINT)
        |FROM events WHERE event_type IN ('view', 'signup', 'purchase')""".stripMargin),
    // P1b/§7.5: dynamic property hoisting + sink schema evolution — two
    // batches whose properties carry DIFFERENT key sets are hoisted to
    // real columns and land in ONE event-named table; the second batch
    // evolves the table schema (coupon), the first batch's rows read the
    // new column back as null (and vice versa for value).
    ("p1b_hoist_evolve",
      ((s, dir) => {
      val wh = tmp("graft-q-hoist")
      val router = new SinkRouter(wh)
      // each batch's hoist runs a distributed inference pass AND a write
      // over this frame — persist so the adapter + filter run once
      val clicks = DriverEventsAdapter.load(s, dir)
        .filter(col("event") === "click").persist()
      val eid = expr("CAST(substring(message_id, 2) AS BIGINT)")
      val k = get_json_object(col("properties"), "$.k")
      val b1 = clicks.filter(pmod(eid, lit(2)) === 0)
      val b2 = clicks.filter(pmod(eid, lit(2)) === 1)
        .withColumn("properties", concat(
          lit("{\"k\": "), k,
          lit(", \"coupon\": \"cp"), pmod(eid, lit(7)), lit("\"}")))
      // the gate is the event-named table's hoist+evolution; skip the
      // tracks-table write (its path is covered by p1_segment_multi)
      def hoisted(b: org.apache.spark.sql.DataFrame) =
        operators.Layouts.hoistProperties(
          operators.Layouts.segmentMultiTable(b).filter(col("_table") === "click"))
      try {
        router.write(hoisted(b1))
        router.write(hoisted(b2))
      } finally { clicks.unpersist(false); () }
      router.readTable(s, "click").agg(
        count(lit(1)).as("n_rows"),
        sum(col("k")).as("sum_k"),
        round(sum(col("value")), 2).as("sum_value"),
        count(col("value")).as("n_value"),
        count(col("coupon")).as("n_coupon"),
        countDistinct(col("coupon")).as("uniq_coupons"))
    }),
      """WITH c AS (
        |  SELECT event_id,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |    CAST(printf('%.2f', value) AS DOUBLE) AS value2
        |  FROM events WHERE event_type = 'click')
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(k) AS BIGINT) AS sum_k,
        |  ROUND(SUM(CASE WHEN event_id % 2 = 0 THEN value2 END), 2)
        |    AS sum_value,
        |  CAST(COUNT(CASE WHEN event_id % 2 = 0 THEN 1 END) AS BIGINT)
        |    AS n_value,
        |  CAST(COUNT(CASE WHEN event_id % 2 = 1 THEN 1 END) AS BIGINT)
        |    AS n_coupon,
        |  CAST(COUNT(DISTINCT CASE WHEN event_id % 2 = 1
        |    THEN 'cp' || (event_id % 7) END) AS BIGINT) AS uniq_coupons
        |FROM c""".stripMargin),
    // P1c/§1.1: the VARIANT twin of p1b — the same two-batch hoist +
    // sink evolution, but properties are parse_json'd into Spark 4
    // VariantType and hoisted via schema_of_variant_agg + variant_get
    // (pre-shredded binary access instead of per-access JSON re-parse).
    // The oracle is p1b's oracle verbatim: the two paths must be
    // hash-identical, which pins the DECIMAL→DOUBLE alignment rule in
    // hoistPropertiesVariant.
    ("p1c_variant",
      ((s, dir) => {
      val wh = tmp("graft-q-hoistv")
      val router = new SinkRouter(wh)
      val clicks = DriverEventsAdapter.load(s, dir)
        .filter(col("event") === "click").persist()
      val eid = expr("CAST(substring(message_id, 2) AS BIGINT)")
      val k = get_json_object(col("properties"), "$.k")
      val b1 = clicks.filter(pmod(eid, lit(2)) === 0)
      val b2 = clicks.filter(pmod(eid, lit(2)) === 1)
        .withColumn("properties", concat(
          lit("{\"k\": "), k,
          lit(", \"coupon\": \"cp"), pmod(eid, lit(7)), lit("\"}")))
      def hoisted(b: org.apache.spark.sql.DataFrame) =
        operators.Layouts.hoistPropertiesVariant(
          operators.Layouts.segmentMultiTable(b)
            .filter(col("_table") === "click")
            .withColumn("properties", try_parse_json(col("properties"))))
      try {
        router.write(hoisted(b1))
        router.write(hoisted(b2))
      } finally { clicks.unpersist(false); () }
      router.readTable(s, "click").agg(
        count(lit(1)).as("n_rows"),
        sum(col("k")).as("sum_k"),
        round(sum(col("value")), 2).as("sum_value"),
        count(col("value")).as("n_value"),
        count(col("coupon")).as("n_coupon"),
        countDistinct(col("coupon")).as("uniq_coupons"))
    }),
      // the variant path must be value-identical to the JSON-string path
      """WITH c AS (
        |  SELECT event_id,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |    CAST(printf('%.2f', value) AS DOUBLE) AS value2
        |  FROM events WHERE event_type = 'click')
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(k) AS BIGINT) AS sum_k,
        |  ROUND(SUM(CASE WHEN event_id % 2 = 0 THEN value2 END), 2)
        |    AS sum_value,
        |  CAST(COUNT(CASE WHEN event_id % 2 = 0 THEN 1 END) AS BIGINT)
        |    AS n_value,
        |  CAST(COUNT(CASE WHEN event_id % 2 = 1 THEN 1 END) AS BIGINT)
        |    AS n_coupon,
        |  CAST(COUNT(DISTINCT CASE WHEN event_id % 2 = 1
        |    THEN 'cp' || (event_id % 7) END) AS BIGINT) AS uniq_coupons
        |FROM c""".stripMargin),
    // L1: guarded SQL — user limit clamped to 50, row-numbered
    ("l1_sql_guard",
      ((s, dir) => {
      s.read.parquet(s"$dir/lineitem.parquet")
        .createOrReplaceTempView("lineitem_guard")
      GuardedSql.query(s,
        """SELECT l_orderkey, l_linenumber FROM lineitem_guard
          |ORDER BY l_orderkey, l_linenumber LIMIT 9999""".stripMargin)
        .withColumnRenamed("#", "row_num")
    }),
      """SELECT l_orderkey, l_linenumber,
        |  CAST(ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber) AS INT)
        |    AS row_num
        |FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 50""".stripMargin),
    // streaming incremental corpus construction: three document batches
    // (doc_id % 3, one file per micro-batch in mtime order) flow through
    // CorpusIngest — each checked against the accumulated signature
    // index, survivors extend it, every doc's outcome logged. Oracle:
    // the batch-sequential drop rule unrolled over the exact-Jaccard
    // pair list in SQL
    ("s2_corpus_ingest",
      ((s, dir) => {
      val in = stageCorpusBatches(s, dir)
      val idx = tmp("graft-ci-idx")
      val out = tmp("graft-ci-out"); val cp = tmp("graft-ci-cp")
      // per-batch joins sized to the arriving batch (~5k docs at
      // sf0.1), not the session's 32-way width
      val q = CorpusIngest.start(s, in, idx, out, cp,
        shufflePartitions = 8)
      try q.awaitTermination() finally q.stop()
      s.read.parquet(out)
        .withColumn("batch", pmod(col("doc_id"), lit(3)).cast("int"))
        .select(col("doc_id"), col("batch"), col("status"))
    }),
      """WITH ws0 AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'),
        |                w -> len(w) > 0) AS w
        |  FROM documents),
        |ws AS (
        |  SELECT doc_id, CAST(doc_id % 3 AS INT) AS b,
        |    list_distinct(list_transform(range(1, len(w) - 1),
        |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
        |  FROM ws0 WHERE len(w) >= 3),
        |ex AS (SELECT doc_id, b, len(sh) AS n_sh, unnest(sh) AS s FROM ws),
        |inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n_sh AS n_a,
        |    b.n_sh AS n_b, a.b AS ba, b.b AS bb, COUNT(*) AS i
        |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2, 3, 4, 5, 6),
        |jp AS (SELECT id_a, id_b, ba, bb FROM inter
        |       WHERE ROUND(i * 1.0 / (n_a + n_b - i), 4) >= 0.5),
        |d0 AS (SELECT id_b AS id FROM jp WHERE ba = 0 AND bb = 0),
        |k0 AS (SELECT doc_id FROM ws WHERE b = 0
        |       AND doc_id NOT IN (SELECT id FROM d0)),
        |d1 AS (SELECT id_b AS id FROM jp WHERE ba = 1 AND bb = 1
        |       UNION SELECT id_b FROM jp WHERE ba = 0 AND bb = 1
        |         AND id_a IN (SELECT doc_id FROM k0)
        |       UNION SELECT id_a FROM jp WHERE ba = 1 AND bb = 0
        |         AND id_b IN (SELECT doc_id FROM k0)),
        |k01 AS (SELECT doc_id FROM ws WHERE b = 1
        |          AND doc_id NOT IN (SELECT id FROM d1)
        |        UNION ALL SELECT doc_id FROM k0),
        |d2 AS (SELECT id_b AS id FROM jp WHERE ba = 2 AND bb = 2
        |       UNION SELECT id_b FROM jp WHERE bb = 2 AND ba < 2
        |         AND id_a IN (SELECT doc_id FROM k01)
        |       UNION SELECT id_a FROM jp WHERE ba = 2 AND bb < 2
        |         AND id_b IN (SELECT doc_id FROM k01)),
        |dropped AS (SELECT DISTINCT id FROM
        |  (SELECT id FROM d0 UNION ALL SELECT id FROM d1
        |   UNION ALL SELECT id FROM d2))
        |SELECT d.doc_id, CAST(d.doc_id % 3 AS INT) AS batch,
        |  CASE WHEN dr.id IS NOT NULL THEN 'dup' ELSE 'kept' END AS status
        |FROM documents d LEFT JOIN dropped dr ON d.doc_id = dr.id""".stripMargin),
    // streaming embedding-index ingest: three embedding batches flow
    // through AnnIngest — the FIRST seeds the IVF quantizer (its 8
    // smallest-id vectors become the cells), every batch is assigned
    // against the STORED centroids and appended to the cell-partitioned
    // vector table. Oracle: the seed rule + the rounded-cosine argmax
    // (ties to the lower cell) replayed exactly in SQL
    ("s3_ann_ingest",
      ((s, dir) => {
      val in = stageVecBatches(s, dir)
      val idx = tmp("graft-ai-idx")
      val out = tmp("graft-ai-out"); val cp = tmp("graft-ai-cp")
      val q = AnnIngest.start(s, in, idx, out, cp, nlist = 8,
        shufflePartitions = 8)
      try q.awaitTermination() finally q.stop()
      s.read.parquet(out)
        .withColumn("batch", pmod(col("vec_id"), lit(3)).cast("int"))
        .select(col("vec_id"), col("batch"), col("cell"), col("cos"))
    }),
      """WITH cents AS (
        |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT)
        |    AS cell, embedding AS cvec
        |  FROM embeddings
        |  WHERE vec_id % 3 = 0 AND embedding IS NOT NULL
        |  ORDER BY vec_id LIMIT 8),
        |scored AS (
        |  SELECT e.vec_id, CAST(e.vec_id % 3 AS INT) AS batch, c.cell,
        |    ROUND(list_cosine_similarity(e.embedding::DOUBLE[],
        |      c.cvec::DOUBLE[]), 6) AS cos,
        |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
        |      ORDER BY ROUND(list_cosine_similarity(e.embedding::DOUBLE[],
        |        c.cvec::DOUBLE[]), 6) DESC, c.cell) AS rk
        |  FROM embeddings e CROSS JOIN cents c
        |  WHERE e.embedding IS NOT NULL)
        |SELECT vec_id, batch, cell, cos FROM scored WHERE rk = 1""".stripMargin),
    // L1 + extensions: a native graft expression (word_shingles,
    // registered by GraftExtensions) called straight from the guarded
    // SQL surface — the "switch engines, keep your SQL" contract; the
    // oracle replays the shingle definition in DuckDB list ops
    ("l2_sql_functions",
      ((s, dir) => {
      s.read.parquet(s"$dir/documents.parquet")
        .createOrReplaceTempView("documents_guard")
      GuardedSql.query(s,
        """SELECT doc_id, size(word_shingles(text, 3)) AS n_shingles
          |FROM documents_guard ORDER BY doc_id LIMIT 9999""".stripMargin)
        .withColumnRenamed("#", "row_num")
    }),
      """WITH ws AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'),
        |                w -> len(w) > 0) AS w
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, CAST(CASE WHEN len(w) < 3 THEN 0
        |    ELSE len(list_distinct(list_transform(range(1, len(w) - 1),
        |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) END AS INT)
        |    AS n_shingles
        |  FROM ws)
        |SELECT doc_id, n_shingles,
        |  CAST(ROW_NUMBER() OVER (ORDER BY doc_id) AS INT) AS row_num
        |FROM sh ORDER BY doc_id LIMIT 50""".stripMargin),
    // S8/L4: schema introspection through the guarded-SQL catalog
    // surface (ref sql/schema.ts:38-64) — the table/column/type listing
    // a query console shows. Engine-specific type names are mapped to a
    // neutral vocabulary on BOTH sides (Spark catalog types here,
    // DuckDB information_schema in the oracle), so the gate asserts the
    // two engines agree on the actual parquet schema
    ("l4_sql_describe",
      ((s, dir) => {
      for (t <- Seq("lineitem", "region", "documents", "embeddings"))
        s.read.parquet(s"$dir/$t.parquet")
          .createOrReplaceTempView(s"${t}_cat")
      val neutral = Map(
        "bigint" -> "int64", "int" -> "int32", "double" -> "float64",
        "string" -> "string", "timestamp" -> "timestamp",
        // parquet ms-timestamps without UTC adjustment surface as NTZ
        // in the Spark catalog and as plain TIMESTAMP in DuckDB
        "timestamp_ntz" -> "timestamp",
        "array<float>" -> "list<float32>")
      import s.implicits._
      GuardedSql.describeTables(s).toSeq
        .filter(_._1.endsWith("_cat"))
        .flatMap { case (t, cols) =>
          cols.map { case (c, dt) =>
            (t.stripSuffix("_cat"), c, neutral.getOrElse(dt, dt)) }
        }
        .toDF("table_name", "column_name", "data_type")
    }),
      """SELECT table_name, column_name,
        |  CASE lower(data_type)
        |    WHEN 'bigint' THEN 'int64' WHEN 'integer' THEN 'int32'
        |    WHEN 'double' THEN 'float64' WHEN 'varchar' THEN 'string'
        |    WHEN 'timestamp' THEN 'timestamp'
        |    WHEN 'float[]' THEN 'list<float32>'
        |    ELSE lower(data_type) END AS data_type
        |FROM information_schema.columns
        |WHERE table_name IN
        |  ('lineitem', 'region', 'documents', 'embeddings')""".stripMargin),
    // K12: CDC apply — a Debezium-shaped op batch (i/u/d + lsn) folded
    // into the customer snapshot: per key the max-lsn op decides
    // (u-then-u last-wins, u-then-d delete-wins), inserts add new keys,
    // untouched rows pass through. Gate = per-segment rollup of the
    // post-batch table (CDC_NEW segment isolates the inserts)
    ("k12_cdc_apply",
      ((s, dir) => {
      import graft.operators.Cdc
      val c = s.read.parquet(s"$dir/customer.parquet")
      val m = pmod(col("c_custkey"), lit(7))
      def op(rows: org.apache.spark.sql.DataFrame, o: String, lsn: Long,
             bal: org.apache.spark.sql.Column,
             seg: org.apache.spark.sql.Column) =
        rows.select(col("c_custkey"), col("c_name"), col("c_nationkey"),
          bal.as("c_acctbal"), seg.as("c_mktsegment"),
          lit(o).as("op"), lit(lsn).as("lsn"))
      val ops = op(c.filter(m === 0), "d", 10L,
          col("c_acctbal"), col("c_mktsegment"))
        .unionByName(op(c.filter(m === 1), "u", 10L,
          col("c_acctbal") + 100, col("c_mktsegment")))
        .unionByName(op(c.filter(m === 1), "u", 20L,
          col("c_acctbal") + 200, col("c_mktsegment")))
        .unionByName(op(c.filter(m === 2), "u", 10L,
          col("c_acctbal"), lit("CDC_SEG")))
        .unionByName(op(c.filter(m === 2), "d", 20L,
          col("c_acctbal"), col("c_mktsegment")))
        .unionByName(op(c.filter(m === 3), "i", 10L,
          col("c_acctbal") + 50.0, lit("CDC_NEW"))
          .withColumn("c_custkey", col("c_custkey") + 1000000L))
      Cdc.applyBatch(c, ops, Seq("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_rows"),
          round(sum(col("c_acctbal")), 2).as("sum_bal"),
          countDistinct(col("c_custkey")).as("n_keys"))
    }),
      """WITH final AS (
        |  SELECT c_custkey, c_acctbal, c_mktsegment FROM customer
        |  WHERE c_custkey % 7 NOT IN (0, 1, 2)
        |  UNION ALL
        |  SELECT c_custkey, c_acctbal + 200, c_mktsegment FROM customer
        |  WHERE c_custkey % 7 = 1
        |  UNION ALL
        |  SELECT c_custkey + 1000000, c_acctbal + 50.0, 'CDC_NEW'
        |  FROM customer WHERE c_custkey % 7 = 3)
        |SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  ROUND(SUM(c_acctbal), 2) AS sum_bal,
        |  CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_keys
        |FROM final GROUP BY c_mktsegment""".stripMargin),
    // K12b: CDC STREAM apply — three micro-batches fold into a
    // SinkRouter table at O(batch) cost (upserts ride the dedup merge,
    // deletes ride the MoR deletion vector, re-inserts un-tombstone):
    // keys %7==0 are deleted in batch 2 and RESURRECTED in batch 3,
    // %7==1 updated twice (full-row image, last wins), %7==2 deleted
    // last — the oracle replays the global max-lsn outcome per key
    ("k12b_cdc_stream",
      ((s, dir) => {
      val wh = tmp("graft-q-cdcs")
      val router = new SinkRouter(wh,
        SinkOptions(deduplicate = true, primaryKey = "c_custkey"))
      val c = s.read.parquet(s"$dir/customer.parquet")
      val m = pmod(col("c_custkey"), lit(7))
      def mk(rows: org.apache.spark.sql.DataFrame, o: String, lsn: Long,
             bal: org.apache.spark.sql.Column,
             seg: org.apache.spark.sql.Column) =
        rows.select(col("c_custkey"), col("c_name"), col("c_nationkey"),
          bal.as("c_acctbal"), seg.as("c_mktsegment"),
          lit(o).as("op"), lit(lsn).as("lsn"))
      val b1 = mk(c, "i", 1L, col("c_acctbal"), col("c_mktsegment"))
      val b2 = mk(c.filter(m === 0), "d", 20L,
          col("c_acctbal"), col("c_mktsegment"))
        .unionByName(mk(c.filter(m === 1), "u", 21L,
          col("c_acctbal") + 100, col("c_mktsegment")))
      val b3 = mk(c.filter(m === 0), "i", 30L,
          col("c_acctbal") + 7.0, lit("CDC_BACK"))
        .unionByName(mk(c.filter(m === 1), "u", 31L,
          col("c_acctbal") + 200, col("c_mktsegment")))
        .unionByName(mk(c.filter(m === 2), "d", 32L,
          col("c_acctbal"), col("c_mktsegment")))
      Seq(b1, b2, b3).foreach(b => router.applyCdc(s, "cust", b))
      router.readTable(s, "cust")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_rows"),
          round(sum(col("c_acctbal")), 2).as("sum_bal"),
          countDistinct(col("c_custkey")).as("n_keys"))
    }),
      """WITH final AS (
        |  SELECT c_custkey, c_acctbal + 7.0 AS bal,
        |    'CDC_BACK' AS c_mktsegment
        |  FROM customer WHERE c_custkey % 7 = 0
        |  UNION ALL
        |  SELECT c_custkey, c_acctbal + 200, c_mktsegment FROM customer
        |  WHERE c_custkey % 7 = 1
        |  UNION ALL
        |  SELECT c_custkey, c_acctbal, c_mktsegment FROM customer
        |  WHERE c_custkey % 7 NOT IN (0, 1, 2))
        |SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  ROUND(SUM(bal), 2) AS sum_bal,
        |  CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_keys
        |FROM final GROUP BY c_mktsegment""".stripMargin),
    // S7: connector sync — Airbyte-style stream pulls: two sync RUNS
    // over two streams (orders INCREMENTAL on an o_orderdate high-water
    // mark, customer FULL_REFRESH), state threaded between runs. The
    // inclusive cursor re-reads the boundary rows on run 2 and the
    // warehouse dedup-merge absorbs them, so run 2 leaves the table
    // unchanged — the oracle gates rows-read, the emitted cursor state,
    // AND the post-run table cardinality for every (stream, run)
    ("s7_sync_incremental",
      ((s, dir) => {
      import graft.sources.ConnectorSync
      import ConnectorSync.{StreamConfig, StreamState}
      val wh = tmp("graft-q-sync")
      val streams = Seq(
        StreamConfig("orders", "incremental", Some("o_orderdate"),
          primaryKey = "o_orderkey"),
        StreamConfig("customer", "full_refresh"))
      val st0 = Map(
        "orders" -> StreamState("orders", Some("1999-01-01 00:00:00")))
      def runOnce(run: Int, states: Map[String, StreamState])
          : (Seq[(String, Int, String, Long, String, Long)],
             Map[String, StreamState]) = {
        val results = ConnectorSync.sync(s, dir, wh, streams, states)
        val rows = results.map { r =>
          val cfg = streams.find(_.stream == r.stream).get
          (r.stream, run, r.mode, r.rowsRead,
            if (r.mode == "incremental") r.newState.cursor.orNull
            else null: String,
            ConnectorSync.readDest(s, wh, cfg).count())
        }
        (rows, results.map(r => r.stream -> r.newState).toMap)
      }
      val (rows1, st1) = runOnce(1, st0)
      val (rows2, _) = runOnce(2, st1)
      import s.implicits._
      (rows1 ++ rows2).toDF(
        "stream", "run", "mode", "rows_read", "cursor_out", "table_rows")
    }),
      """WITH p AS (
        |  SELECT o_orderkey, o_orderdate FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1999-01-01'),
        |mx AS (SELECT MAX(o_orderdate) AS m FROM p),
        |c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM customer)
        |SELECT 'orders' AS stream, 1 AS run, 'incremental' AS mode,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS rows_read,
        |  (SELECT strftime(m, '%Y-%m-%d %H:%M:%S') FROM mx) AS cursor_out,
        |  (SELECT CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) FROM p)
        |    AS table_rows
        |UNION ALL
        |SELECT 'orders', 2, 'incremental',
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM p, mx
        |   WHERE o_orderdate >= m),
        |  (SELECT strftime(m, '%Y-%m-%d %H:%M:%S') FROM mx),
        |  (SELECT CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) FROM p)
        |UNION ALL
        |SELECT 'customer', 1, 'full_refresh',
        |  (SELECT n FROM c), CAST(NULL AS VARCHAR), (SELECT n FROM c)
        |UNION ALL
        |SELECT 'customer', 2, 'full_refresh',
        |  (SELECT n FROM c), CAST(NULL AS VARCHAR), (SELECT n FROM c)
        |""".stripMargin),
    // S9 (ingest boundary): write-key authentication — the reference's
    // keyId:secret bearer check against a stored-credential dimension
    // (salted sha512 under a rotating seed list, or a raw token), run
    // as a broadcast join + codegen'd sha2 over the event stream
    // (WriteKeyAuth.authorize; hash math pinned by the security.test.ts
    // replay in WriteKeyAuthSpec). Fixture: per-user key ids with
    // deterministic secrets; every 13th event presents a colon-less
    // token, every 11th an unknown key id, every 7th a wrong secret —
    // the oracle recomputes the expected verdict from those rules and
    // pins the routed sets (count + id-xor + distinct loggable hints).
    ("s9_writekey_auth",
      ((s, dir) => {
      import graft.sources.WriteKeyAuth
      import s.implicits._
      val seeds = Seq("gate-seed-2", "gate-seed-1")
      val keys = Seq(
        ("wk0", WriteKeyAuth.createHash("gate-secret-0",
          Seq("gate-seed-2"), Some("salt0"))),
        ("wk1", WriteKeyAuth.createHash("gate-secret-1",
          Seq("gate-seed-1"), Some("salt1"))), // minted under the OLD seed
        ("wk2", "raw-gate-token-2")
      ).toDF("id", "credential")
      val keyId = concat(lit("wk"), pmod(col("user_id"), lit(3)))
      val secret = element_at(map(
        lit("wk0"), lit("gate-secret-0"), lit("wk1"), lit("gate-secret-1"),
        lit("wk2"), lit("raw-gate-token-2")), keyId)
      val token = when(pmod(col("event_id"), lit(13)) === 0, keyId)
        .when(pmod(col("event_id"), lit(11)) === 0,
          concat(lit("wk9:"), secret))
        .when(pmod(col("event_id"), lit(7)) === 0,
          concat(keyId, lit(":wrong")))
        .otherwise(concat(keyId, lit(":"), secret))
      val ev = s.read.parquet(s"$dir/events.parquet")
        .withColumn("write_key", token)
      WriteKeyAuth.authorize(ev, keys, col("write_key"), seeds)
        .groupBy(col("event_type"), col("auth_ok"))
        .agg(count(lit(1)).as("n_events"),
          expr("bit_xor(event_id)").as("id_xor"),
          countDistinct(col("key_hint")).as("n_hints"))
    }),
      """WITH ev AS (
        |  SELECT event_id, event_type,
        |    'wk' || (user_id % 3) AS key_id,
        |    CASE user_id % 3 WHEN 0 THEN 'gate-secret-0'
        |      WHEN 1 THEN 'gate-secret-1'
        |      ELSE 'raw-gate-token-2' END AS secret
        |  FROM events),
        |tok AS (
        |  SELECT event_id, event_type,
        |    CASE WHEN event_id % 13 = 0 THEN key_id
        |      WHEN event_id % 11 = 0 THEN 'wk9:' || secret
        |      WHEN event_id % 7 = 0 THEN key_id || ':wrong'
        |      ELSE key_id || ':' || secret END AS write_key,
        |    (event_id % 13 <> 0 AND event_id % 11 <> 0
        |      AND event_id % 7 <> 0) AS auth_ok
        |  FROM ev)
        |SELECT event_type, auth_ok,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(bit_xor(event_id) AS BIGINT) AS id_xor,
        |  CAST(COUNT(DISTINCT CASE
        |    WHEN length(split_part(write_key, ':', 1)) >= 6
        |    THEN substr(split_part(write_key, ':', 1), 1, 3) || '*' ||
        |      substr(split_part(write_key, ':', 1),
        |        length(split_part(write_key, ':', 1)) - 2, 3)
        |    WHEN length(split_part(write_key, ':', 1)) > 0
        |    THEN split_part(write_key, ':', 1) END)
        |    AS BIGINT) AS n_hints
        |FROM tok GROUP BY event_type, auth_ok""".stripMargin),
    // §3.1: streaming pipeline round-trip — JSON file source ->
    // envelope -> dedup-in-watermark -> layout -> sink router
    // live Bradley-Terry leaderboard over the ingest stream: closed
    // candidate days emit (winner, loser) TYPE judgments, each micro-
    // batch lands its count deltas in a _batch partition (crash-replay
    // idempotent) and refits the exact-integer MM ranking; the oracle
    // replays the envelope identity rule (signup/purchase → user id,
    // else anonymous), the extremes with the message-id STRING tie
    // order, and all three MM rounds via the shared btFitSql chain
    ("s4_leaderboard",
      ((s, dir) => {
      val in = stageLeaderboardInput(s, dir)
      val wh = tmp("graft-lb-wh"); val cp = tmp("graft-lb-cp")
      val q = graft.streaming.Leaderboard.start(s, in, wh, cp)
      try q.awaitTermination() finally q.stop()
      graft.streaming.Leaderboard.current(s, wh)
        .select(col("player"), col("n_wins"), col("n_matches"),
          col("strength_micro"), col("rank"))
    }),
      ("""WITH e AS (
        |  SELECT CASE WHEN event_type IN ('signup', 'purchase')
        |      THEN 'u' || CAST(user_id AS VARCHAR)
        |      ELSE 'a' || CAST(user_id AS VARCHAR) END AS uid,
        |    'm' || CAST(event_id AS VARCHAR) AS mid,
        |    event_type,
        |    CAST(ROUND(value * 100) AS BIGINT) AS cents,
        |    strftime(ts, '%Y-%m-%d') AS day
        |  FROM events),
        |x AS (
        |  SELECT uid, day,
        |    MAX(CASE WHEN rk_hi = 1 THEN event_type END) AS winner,
        |    MAX(CASE WHEN rk_hi = 1 THEN cents END) AS hi_c,
        |    MAX(CASE WHEN rk_lo = 1 THEN event_type END) AS loser,
        |    MAX(CASE WHEN rk_lo = 1 THEN cents END) AS lo_c
        |  FROM (SELECT *,
        |      ROW_NUMBER() OVER (PARTITION BY uid, day
        |        ORDER BY cents DESC, mid) AS rk_hi,
        |      ROW_NUMBER() OVER (PARTITION BY uid, day
        |        ORDER BY cents ASC, mid) AS rk_lo
        |    FROM e) WHERE rk_hi = 1 OR rk_lo = 1
        |  GROUP BY 1, 2),
        |c AS (SELECT winner, loser FROM x
        |      WHERE hi_c > lo_c AND winner <> loser),
        |""".stripMargin + QueriesTdShared.btFitSql)),
    // live classifier-quality monitor over the same staged ingest
    // stream: per-batch score-bucket count deltas land idempotently
    // and the exact AUC + KS refit from the summed counts — the final
    // snapshot must equal a batch evaluation of the whole input, which
    // is exactly what the oracle computes
    ("s5_quality_monitor",
      ((s, dir) => {
      val in = stageLeaderboardInput(s, dir)
      val wh = tmp("graft-qm-wh"); val cp = tmp("graft-qm-cp")
      val q = graft.streaming.QualityMonitor.start(s, in, wh, cp)
      try q.awaitTermination() finally q.stop()
      graft.streaming.QualityMonitor.current(s, wh)
        .select(col("n_pos"), col("n_neg"), col("win_pairs"),
          col("tie_pairs"), col("auc_micro"), col("ks_micro"),
          col("ks_at_score"))
    }),
      """WITH e AS (
        |  SELECT CAST(ROUND(value * 100) AS BIGINT) // 100 AS s,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS p
        |  FROM events WHERE value IS NOT NULL),
        |g AS (
        |  SELECT s, CAST(SUM(p) AS BIGINT) AS np,
        |    CAST(SUM(1 - p) AS BIGINT) AS ng
        |  FROM e GROUP BY 1),
        |c AS (
        |  SELECT np, ng,
        |    CAST(COALESCE(SUM(ng) OVER (ORDER BY s ROWS BETWEEN
        |      UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS neg_below,
        |    CAST(SUM(np) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_p,
        |    CAST(SUM(ng) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_g,
        |    s
        |  FROM g),
        |t AS (
        |  SELECT CAST(SUM(np) AS BIGINT) AS n_pos,
        |    CAST(SUM(ng) AS BIGINT) AS n_neg,
        |    CAST(SUM(np * neg_below) AS BIGINT) AS win_pairs,
        |    CAST(SUM(np * ng) AS BIGINT) AS tie_pairs
        |  FROM c),
        |gap AS (
        |  SELECT c.s, ABS(cum_p * 1000000 // t.n_pos
        |    - cum_g * 1000000 // t.n_neg) AS gap
        |  FROM c, t),
        |mx AS (SELECT CAST(MAX(gap) AS BIGINT) AS ks_micro FROM gap)
        |SELECT t.n_pos, t.n_neg, t.win_pairs, t.tie_pairs,
        |  CASE WHEN t.n_pos > 0 AND t.n_neg > 0 THEN
        |    CAST((2 * t.win_pairs + t.tie_pairs) * 1000000
        |      // (2 * t.n_pos * t.n_neg) AS BIGINT) END AS auc_micro,
        |  mx.ks_micro,
        |  CAST((SELECT MIN(s) FROM gap WHERE gap.gap = mx.ks_micro)
        |    AS BIGINT) AS ks_at_score
        |FROM t, mx""".stripMargin),
    // live volume-drift monitor over the same staged ingest stream:
    // per-batch day-count deltas land idempotently and the exact CUSUM
    // level-shift scan refits from the summed counts — the final
    // snapshot must equal a batch CUSUM of the whole input, which is
    // exactly what the oracle computes
    ("s5c_drift_monitor",
      ((s, dir) => {
      val in = stageLeaderboardInput(s, dir)
      val wh = tmp("graft-dm-wh"); val cp = tmp("graft-dm-cp")
      val q = graft.streaming.DriftMonitor.start(s, in, wh, cp)
      try q.awaitTermination() finally q.stop()
      graft.streaming.DriftMonitor.current(s, wh)
        .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
          col("n"), col("dev_milli"), col("cusum_milli"),
          col("is_peak"))
    }),
      """WITH daily AS (
        |  SELECT strftime(ts, '%Y-%m-%d') AS day,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |t AS (
        |  SELECT day, n,
        |    CAST(SUM(n) OVER () AS BIGINT) AS s,
        |    CAST(COUNT(*) OVER () AS BIGINT) AS c
        |  FROM daily),
        |d AS (
        |  SELECT day, n,
        |    n * 1000 - (CASE WHEN s >= 0 THEN s * 1000 // c
        |      ELSE -((-s) * 1000 // c) END) AS dev_milli
        |  FROM t),
        |cu AS (
        |  SELECT day, n, CAST(dev_milli AS BIGINT) AS dev_milli,
        |    CAST(SUM(dev_milli) OVER (ORDER BY day) AS BIGINT)
        |      AS cusum_milli
        |  FROM d),
        |pk AS (
        |  SELECT day AS peak_day FROM cu
        |  ORDER BY ABS(cusum_milli) DESC, day LIMIT 1)
        |SELECT cu.day, cu.n, cu.dev_milli, cu.cusum_milli,
        |  cu.day = pk.peak_day AS is_peak
        |FROM cu, pk""".stripMargin),
    // live distribution-shape monitor over the same staged stream:
    // per-batch power-sum partials (n, Σx..Σx⁴ of the value cents)
    // land idempotently and the moment profile refits from the summed
    // partials — the final snapshot must equal the batch
    // momentsProfile of the whole input (the st_moments_merge
    // identity, live), which is what the oracle computes
    ("s5d_moments_monitor",
      ((s, dir) => {
      val in = stageLeaderboardInput(s, dir)
      val wh = tmp("graft-mm-wh"); val cp = tmp("graft-mm-cp")
      val q = graft.streaming.MomentsMonitor.start(s, in, wh, cp)
      try q.awaitTermination() finally q.stop()
      graft.streaming.MomentsMonitor.current(s, wh)
        .select(col("n"), col("mean_micro"), col("m2"),
          col("skew_milli"), col("kurt_excess_milli"))
    }),
      ("WITH r AS (\n" +
        "  SELECT CAST(CAST(ROUND(value * 100) AS BIGINT) AS HUGEINT)" +
        " AS x\n" +
        "  FROM events WHERE value IS NOT NULL),\n" +
        QueriesEval.momentsChainFromR)),
    // the GRPO group-baseline streaming twin driven end-to-end: the
    // staged ingest stream through startConversations(mode=grpo_stats)
    // — O(1) state per open group (count, sum, decimal sum of squares),
    // closed days landing via the router — must equal the batch group
    // statistics over the whole input, which is what the oracle
    // computes (same sign-split mean and algebraic deviation-square
    // identity as td_group_advantage)
    ("s5b_grpo_stats",
      ((s, dir) => {
      val in = stageLeaderboardInput(s, dir)
      val wh = tmp("graft-gs-wh"); val cp = tmp("graft-gs-cp")
      val q = graft.streaming.EventPipeline.startConversations(
        s, in, wh, cp, mode = "grpo_stats", statePartitions = 8)
      try q.awaitTermination() finally q.stop()
      s.read.parquet(s"$wh/grpo_stats")
        .select(col("user_id"), col("day"), col("n_candidates"),
          col("sum_cents"), col("mean_milli"), col("std_milli"))
    }),
      """WITH e AS (
        |  SELECT CASE WHEN event_type IN ('signup', 'purchase')
        |      THEN 'u' || CAST(user_id AS VARCHAR)
        |      ELSE 'a' || CAST(user_id AS VARCHAR) END AS uid,
        |    CAST(ROUND(value * 100) AS BIGINT) AS cents,
        |    strftime(ts, '%Y-%m-%d') AS day
        |  FROM events WHERE value IS NOT NULL),
        |g AS (
        |  SELECT uid AS user_id, day,
        |    CAST(COUNT(*) AS BIGINT) AS n_candidates,
        |    CAST(SUM(cents) AS BIGINT) AS sum_cents,
        |    SUM(CAST(cents AS HUGEINT) * cents) AS sq
        |  FROM e GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |h AS (
        |  SELECT *, CASE WHEN sum_cents >= 0
        |      THEN (sum_cents * 1000) // n_candidates
        |      ELSE -((-sum_cents * 1000) // n_candidates)
        |      END AS mean_milli
        |  FROM g),
        |i AS (
        |  SELECT *, CAST(1000000 AS HUGEINT) * sq
        |      - CAST(2000 AS HUGEINT) * mean_milli * sum_cents
        |      + CAST(n_candidates AS HUGEINT) * mean_milli * mean_milli
        |      AS devsum
        |  FROM h)
        |SELECT user_id, day, n_candidates, sum_cents,
        |  CAST(mean_milli AS BIGINT) AS mean_milli,
        |  CAST(FLOOR(SQRT(CAST(devsum // n_candidates AS BIGINT)))
        |    AS BIGINT) AS std_milli
        |FROM i""".stripMargin),
    ("s1_streaming",
      ((s, dir) => {
      val in = stageStreamingInput(s, dir)
      val wh = tmp("graft-q-wh"); val cp = tmp("graft-q-cp")
      // state shards sized to the workload (~100k live dedup keys at
      // sf0.1 → 8 shards of ~12.5k keys): state-store commit cost is a
      // fixed per-shard file write, so over-sharding a small key volume
      // pays 32 file commits per batch for nothing (see the
      // statePartitions doc on EventPipeline.start)
      val q = EventPipeline.start(s, in, wh, cp, statePartitions = 8)
      try q.awaitTermination() finally q.stop()
      s.read.parquet(s"$wh/events")
        .groupBy(col("type"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("message_id")).as("n_distinct"))
    }),
      """SELECT CASE WHEN event_type = 'signup' THEN 'identify'
        |            WHEN event_type = 'view' THEN 'page'
        |            ELSE 'track' END AS type,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COUNT(*) AS BIGINT) AS n_distinct
        |FROM events GROUP BY 1""".stripMargin),
    // zero-copy writable clone (SHALLOW CLONE / dev branch): after the
    // clone, the LIVE table's error rows are merge-replaced while the
    // DEV branch gets synthetic experiment rows appended — one oracle
    // gates both diverged timelines, proving the branches share bytes
    // at clone time and never bleed writes into each other.
    ("k18_clone",
      ((s, dir) => {
      val wh = tmp("graft-clone")
      val router = new SinkRouter(wh, SinkOptions(deduplicate = true))
      val env = graft.schema.EventSchema.readEvents(s, dir)
        .select(concat(lit("m"), col("event_id")).as("message_id"),
          col("ts").as("timestamp"), col("event_type"))
      router.write(env.withColumn("_table", lit("events")))
      router.cloneTable("events", "events_dev")
      // live branch: error rows replaced via the dedup MERGE
      router.write(env.filter(col("event_type") === "error")
        .withColumn("event_type", lit("fixed"))
        .withColumn("_table", lit("events")))
      // dev branch: synthetic experiment rows appended under new ids
      router.write(env.filter(col("event_type") === "click")
        .select(concat(lit("dev"), col("message_id")).as("message_id"),
          col("timestamp"), lit("devtest").as("event_type"))
        .withColumn("_table", lit("events_dev")))
      def counts(t: String, branch: String) =
        router.readTable(s, t)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"))
          .select(lit(branch).as("branch"), col("event_type"), col("n"))
      counts("events", "live").unionByName(counts("events_dev", "dev"))
    }),
      """WITH e AS (SELECT event_type FROM events)
        |SELECT 'live' AS branch,
        |  CASE WHEN event_type = 'error' THEN 'fixed'
        |    ELSE event_type END AS event_type,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM e GROUP BY 1, 2
        |UNION ALL
        |SELECT 'dev', event_type, CAST(COUNT(*) AS BIGINT)
        |FROM e GROUP BY 1, 2
        |UNION ALL
        |SELECT 'dev', 'devtest', CAST(COUNT(*) AS BIGINT)
        |FROM e WHERE event_type = 'click'""".stripMargin),
    // GDPR parity on the JDBC warehouse: erasure as the database's
    // native SQL DELETE (vs the file warehouse's partition rewrite) and
    // Art. 15 subject export across tables — the same rights, pushed
    // down to the engine that owns the data. Gate: per-type survivor
    // counts + deleted count + the remaining export rows for a subject.
    ("k2c_jdbc_gdpr",
      ((s, dir) => {
      val db = tmp("graft-q-jdbcg")
      val sink = new graft.sinks.JdbcSink(s"jdbc:derby:$db/wh;create=true",
        SinkOptions())
      val env = graft.schema.EventSchema.readEvents(s, dir)
        .select(concat(lit("m"), col("event_id")).as("message_id"),
          col("ts").as("timestamp"),
          concat(lit("u"), pmod(col("user_id"), lit(40))).as("user_id"),
          col("event_type"))
      sink.write(env.withColumn("_table", lit("events")))
      sink.write(env.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("message_id"))
        .withColumn("_table", lit("purchases")))
      // the subject u7 invokes erasure on events, then an export shows
      // what remains of them across the warehouse
      // columns are created quoted (exact case), so the predicate must
      // quote them too — unquoted identifiers fold to uppercase in ANSI
      val deleted = sink.deleteWhere("events", "\"user_id\" = 'u7'")
      val export = sink.exportSubject(s, "user_id", "u7")
        .groupBy(col("tbl")).agg(count(lit(1)).as("n_rows"))
      sink.readTable(s, "events")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_rows"))
        .select(lit("events").as("tbl"),
          col("event_type").as("detail"), col("n_rows"))
        .unionByName(export.select(col("tbl"),
          lit("export_u7").as("detail"), col("n_rows")))
        .unionByName(s.range(1).select(lit("_meta").as("tbl"),
          lit("deleted_u7").as("detail"), lit(deleted).as("n_rows")))
    }),
      """WITH e AS (
        |  SELECT event_type, user_id % 40 AS m FROM events)
        |SELECT 'events' AS tbl, event_type AS detail,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows
        |FROM e WHERE m <> 7 GROUP BY event_type
        |UNION ALL
        |SELECT 'purchases', 'export_u7', CAST(COUNT(*) AS BIGINT)
        |FROM e WHERE m = 7 AND event_type = 'purchase'
        |UNION ALL
        |SELECT '_meta', 'deleted_u7', CAST(COUNT(*) AS BIGINT)
        |FROM e WHERE m = 7""".stripMargin),
    // warehouse commit history (the DESCRIBE HISTORY analogue): a
    // scripted create/append/compact/delete/vacuum sequence must leave
    // exactly five versioned entries whose operation metrics the oracle
    // recomputes from the raw events — rows written per batch, the
    // both-batch partitions compact touches, rows the delete erased,
    // partitions vacuum dropped.
    ("k17_history",
      ((s, dir) => {
      val wh = tmp("graft-hist")
      val router = new SinkRouter(wh) // append-mode
      val env = graft.schema.EventSchema.readEvents(s, dir)
        .select(concat(lit("m"), col("event_id")).as("message_id"),
          col("ts").as("timestamp"), col("event_type"))
      router.write(env.filter(col("event_type") =!= "error")
        .withColumn("_table", lit("events")))
      router.write(env.filter(col("event_type") === "error")
        .withColumn("_table", lit("events")))
      router.compact(s, "events", maxFilesPerPartition = 1)
      router.deleteWhere(s, "events", col("event_type") === "click")
      router.vacuum("events", retainDays = 10,
        java.time.LocalDate.parse("2024-02-05"))
      router.history(s).select(col("version"), col("table").as("tbl"),
        col("operation"),
        coalesce(element_at(col("metrics"), "rows"),
          element_at(col("metrics"), "partitions_compacted"),
          element_at(col("metrics"), "rows_deleted"),
          element_at(col("metrics"), "partitions_dropped")).as("metric"))
    }),
      """WITH e AS (
        |  SELECT event_type, strftime(ts, '%Y-%m-%d') AS d FROM events)
        |SELECT CAST(1 AS BIGINT) AS version, 'events' AS tbl,
        |  'create' AS operation,
        |  CAST((SELECT COUNT(*) FROM e WHERE event_type <> 'error')
        |    AS BIGINT) AS metric
        |UNION ALL
        |SELECT 2, 'events', 'append',
        |  CAST((SELECT COUNT(*) FROM e WHERE event_type = 'error')
        |    AS BIGINT)
        |UNION ALL
        |SELECT 3, 'events', 'compact',
        |  CAST((SELECT COUNT(*) FROM (
        |    SELECT d FROM e GROUP BY d
        |    HAVING SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0
        |        END) > 0
        |      AND SUM(CASE WHEN event_type <> 'error' THEN 1 ELSE 0
        |        END) > 0)) AS BIGINT)
        |UNION ALL
        |SELECT 4, 'events', 'delete',
        |  CAST((SELECT COUNT(*) FROM e WHERE event_type = 'click')
        |    AS BIGINT)
        |UNION ALL
        |SELECT 5, 'events', 'vacuum',
        |  CAST((SELECT COUNT(DISTINCT d) FROM e
        |    WHERE d < '2024-01-26') AS BIGINT)""".stripMargin),
    // MV LIFECYCLE: initial full build -> register -> new day lands in
    // the raw table -> PARTITION-GRAIN incremental refresh (only the
    // new days' cells recompute and append — the a2b maintenance
    // contract) -> re-register -> a report served by the MV. The gate
    // pins used_mv AND the values against a replay over the FULL final
    // table: had the refresh not run, the served report would be stale
    // and hash-mismatch — freshness is what this query proves.
    // MV lifecycle with COMMIT-LOG staleness: build+register+watch →
    // serve from MV → a batch lands through the SinkRouter (its
    // `_history/` commit is the invalidation signal) → the SAME query
    // silently falls back to raw (fresh values, no MV) → MvCatalog
    // .refresh rebuilds from the registered definition and re-binds →
    // the query re-serves from the MV. All three phases value-gated;
    // used_mv pinned true/false/true.
    ("mv_lifecycle",
      ((s, dir) => {
      import graft.plans.MvRewrite.{MvCatalog, MvDef}
      val wh = tmp("graft-mvlc")
      val router = new SinkRouter(wh)
      val mvPath = s"$wh/daily.parquet"
      val cut = lit("2024-01-20").cast("timestamp")
      val ev = graft.schema.EventSchema.readEvents(s, dir)
        .select(col("event_type"), col("ts"), col("value"))
      router.write(ev.filter(col("ts") < cut)
        .withColumn("_table", lit("events_raw")))
      val rawPath = s"$wh/events_raw"
      def rawDf = s.read.parquet(rawPath)
      def register(): Unit = {
        MvCatalog.register(s, rawDf, rawPath, MvDef(
          name = "events_daily_lc", mvPath = mvPath,
          groupKeys = Seq((col("event_type"), "event_type")),
          timeKey = Some((col("ts"), "period", "day")),
          sums = Seq((col("value"), "sum_value")),
          countCol = Some("cnt")))
        MvCatalog.watchCommits(rawPath, router.historyDir, "events_raw")
      }
      rawDf.groupBy(col("event_type"),
          date_trunc("day", col("ts")).as("period"))
        .agg(sum(col("value")).as("sum_value"), count(lit(1)).as("cnt"))
        .write.parquet(mvPath)
      register()
      def phase(name: String) = {
        val report = rawDf
          .groupBy(col("event_type"),
            date_trunc("month", col("ts")).as("m"))
          .agg(sum(col("value")).as("sv"), count(lit(1)).as("n"))
        val scans = report.queryExecution.optimizedPlan.collect {
          case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            lr.relation match {
              case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                h.location.rootPaths.map(_.toUri.getPath).mkString(",")
              case r => r.toString
            }
        }.mkString("\n")
        val usedMv = scans.contains("daily.parquet") &&
          !scans.contains("events_raw")
        report.select(lit(name).as("phase"), col("event_type"),
            date_format(col("m"), "yyyy-MM").as("month"),
            round(col("sv"), 2).as("sum_value"),
            col("n").as("n_events"),
            lit(usedMv).as("used_mv"))
          .localCheckpoint()
      }
      try {
        val served = phase("served")
        // a real batch lands through the sink — recordCommit fires and
        // the MV becomes stale WITHOUT any explicit invalidation call
        router.write(ev.filter(col("ts") >= cut)
          .withColumn("_table", lit("events_raw")))
        val stale = phase("stale_fallback")
        MvCatalog.refreshOne(s, rawPath) // the cadence hook
        val refreshed = phase("refreshed")
        served.unionByName(stale).unionByName(refreshed)
      } finally MvCatalog.unregister(rawPath)
    }),
      // phase 1 sees only the pre-cut rows and serves from the MV; the
          // landed batch flips the SAME query to a raw fallback (fresh
          // values, used_mv FALSE); refresh re-serves (used_mv TRUE)
      """WITH agg AS (
        |  SELECT event_type,
        |    strftime(date_trunc('month', ts), '%Y-%m') AS month,
        |    ROUND(SUM(value), 2) AS sum_value,
        |    CAST(COUNT(*) AS BIGINT) AS n_events
        |  FROM events WHERE ts < TIMESTAMP '2024-01-20'
        |  GROUP BY 1, 2),
        |full_agg AS (
        |  SELECT event_type,
        |    strftime(date_trunc('month', ts), '%Y-%m') AS month,
        |    ROUND(SUM(value), 2) AS sum_value,
        |    CAST(COUNT(*) AS BIGINT) AS n_events
        |  FROM events GROUP BY 1, 2)
        |SELECT 'served' AS phase, *, TRUE AS used_mv FROM agg
        |UNION ALL
        |SELECT 'stale_fallback', *, FALSE FROM full_agg
        |UNION ALL
        |SELECT 'refreshed', *, TRUE FROM full_agg""".stripMargin),
    // guarded-SQL result cache: the same report issued twice — first
    // execution computes and stores under the CANONICALIZED-plan key,
    // the second (a formatting variant on purpose) must be served from
    // cache, valid only while the scanned files' (name, len, mtime)
    // fingerprint holds. Both cached flags are pinned by the oracle, and
    // the rows of the CACHED result are the ones hash-checked — a cache
    // returning anything but the live result fails the gate.
    ("l6_sql_cache",
      ((s, dir) => {
      s.read.parquet(s"$dir/orders.parquet")
        .createOrReplaceTempView("orders_cache_v")
      GuardedSql.clearResultCache() // per-run isolation in a shared session
      val (_, c1) = GuardedSql.queryCached(s,
        """SELECT o_orderpriority, COUNT(*) AS n FROM orders_cache_v
          |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
      val (second, c2) = GuardedSql.queryCached(s,
        """select o_orderpriority,  count(*) as n from orders_cache_v
          |group by o_orderpriority order by o_orderpriority""".stripMargin)
      second.withColumnRenamed("#", "row_num")
        .withColumn("first_cached", lit(c1))
        .withColumn("second_cached", lit(c2))
    }),
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(ROW_NUMBER() OVER (ORDER BY o_orderpriority) AS INT)
        |    AS row_num,
        |  FALSE AS first_cached, TRUE AS second_cached
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin),
    // L7: the reference console's NAMED-PARAMETER surface
    // (juava sql-params.ts, its own test replayed verbatim in
    // GuardedSqlSpec): :name placeholders — one repeated, one numeric,
    // one string — bind through SqlParams and run through the guarded
    // runner; the oracle is the same query with the literals inlined.
    ("l7_sql_params",
      ((s, dir) => {
      s.read.parquet(s"$dir/orders.parquet")
        .createOrReplaceTempView("orders_params_v")
      GuardedSql.query(s,
        """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
          |  CAST(SUM(CASE WHEN o_totalprice > :minprice
          |    THEN 1 ELSE 0 END) AS BIGINT) AS n_big
          |FROM orders_params_v
          |WHERE o_orderstatus = :status OR o_totalprice < :minprice / 100
          |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
        Map[String, Any]("status" -> "O", "minprice" -> 150000))
        .withColumnRenamed("#", "row_num")
    }),
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CASE WHEN o_totalprice > 150000
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
        |  CAST(ROW_NUMBER() OVER (ORDER BY o_orderpriority) AS INT)
        |    AS row_num
        |FROM orders
        |WHERE o_orderstatus = 'O' OR o_totalprice < 150000 / 100
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin),
    // MV aggregate navigation (plans.MvRewrite): a day-grain rollup of
    // the events stream is built + registered, then a MONTH-grain report
    // written against the RAW table is transparently served by it — the
    // ClickHouse-MV read path (metrics.sql + event-stat.ts) without the
    // report knowing the MV exists. `used_mv` is read off the OPTIMIZED
    // plan (MV scan present, raw scan absent) and gated true by the
    // oracle, so the round fails if the rewrite silently stops firing;
    // the aggregate values are gated against a straight replay over the
    // raw table, proving the rewrite changes the plan and nothing else.
    ("mv_rewrite",
      ((s, dir) => {
      import graft.plans.MvRewrite.{MvCatalog, MvDef}
      val rawPath = s"$dir/events.parquet"
      val ev = graft.schema.EventSchema.readEvents(s, dir)
      val mvPath = s"${tmp("graft-mv")}/daily_rollup.parquet"
      ev.groupBy(col("event_type"),
          date_trunc("day", col("ts")).as("period"))
        .agg(sum(col("value")).as("sum_value"), count(lit(1)).as("cnt"),
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value"))
        .write.parquet(mvPath)
      MvCatalog.register(s, ev, rawPath, MvDef(
        name = "events_daily", mvPath = mvPath,
        groupKeys = Seq((col("event_type"), "event_type")),
        timeKey = Some((col("ts"), "period", "day")),
        sums = Seq((col("value"), "sum_value")),
        mins = Seq((col("value"), "min_value")),
        maxs = Seq((col("value"), "max_value")),
        countCol = Some("cnt")))
      try {
        val report = ev.filter(col("event_type") =!= "error")
          .groupBy(col("event_type"),
            date_trunc("month", col("ts")).as("m"))
          .agg(sum(col("value")).as("sv"), count(lit(1)).as("n"),
            min(col("value")).as("min_value"),
            max(col("value")).as("max_value"))
        val scans = report.queryExecution.optimizedPlan.collect {
          case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            lr.relation match {
              case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                h.location.rootPaths.map(_.toUri.getPath).mkString(",")
              case r => r.toString
            }
        }.mkString("\n")
        val usedMv = scans.contains("daily_rollup.parquet") &&
          !scans.contains("events.parquet")
        // localCheckpoint is EAGER: the report executes here, while the
        // MV is still registered — a lazily-returned frame would be
        // re-planned after the finally-unregister and silently take the
        // raw path
        report.select(col("event_type"),
          date_format(col("m"), "yyyy-MM").as("month"),
          round(col("sv"), 2).as("sum_value"),
          col("n").as("n_events"),
          col("min_value"), col("max_value"),
          lit(usedMv).as("used_mv"))
          .localCheckpoint()
      } finally MvCatalog.unregister(rawPath)
    }),
      """SELECT event_type,
        |  strftime(date_trunc('month', ts), '%Y-%m') AS month,
        |  ROUND(SUM(value), 2) AS sum_value,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  MIN(value) AS min_value, MAX(value) AS max_value,
        |  TRUE AS used_mv
        |FROM events WHERE event_type <> 'error'
        |GROUP BY 1, 2""".stripMargin))

  val queries: Map[String, Q] =
    gated.map(g => (g._1, g._2)).toMap

  val oracles: Map[String, String] =
    gated.map(g => (g._1, g._3)).toMap
}

package graft

import com.fasterxml.jackson.databind.node.ObjectNode

import graft.chain.{ChainContext, FunctionChain}
import graft.chain.FunctionChain._

/** Chain-semantics suite replicating the reference scenarios
  * (`services/rotor/__tests__/functions-chain.test.ts` +
  * `functions-chain-data.ts`): simple pass, drop, error pass-through,
  * retry at stage, multiplication rules. */
class ChainSpec extends GraftSpec {
  import spark.implicits._

  private def ev(id: Int, typ: String): String =
    s"""{"messageId":"m$id","type":"$typ","value":$id}"""

  private val passThrough = EventFunction("f_pass", builtin = true, _ => Same)
  private val dropPages = EventFunction("f_droppages", builtin = true,
    e => if (e.get("type").asText() == "page") Drop else Same)
  private def tag(field: String, v: String) =
    EventFunction(s"f_tag_$field", builtin = false, e => {
      e.put(field, v); Replace(Seq(e))
    })
  private val failOnType3 = EventFunction("f_fail3", builtin = false,
    e => if (e.get("value").asInt() == 3) Retry("boom") else Same)
  private val fanout = EventFunction("f_fanout", builtin = false, e => {
    val b = e.deepCopy().asInstanceOf[ObjectNode]
    b.put("copy", true)
    Replace(Seq(e, b))
  })

  test("simple chain: transform applies, all succeed") {
    val out = FunctionChain.run(
      Seq(ev(1, "track"), ev(2, "page")).toDS(),
      Seq(passThrough, tag("dst", "x"))).collect()
    assert(out.length == 2)
    assert(out.forall(_.status == "success"))
    assert(out.forall(_.event.contains("\"dst\":\"x\"")))
  }

  test("drop: function returning drop removes the event silently") {
    val out = FunctionChain.run(
      Seq(ev(1, "track"), ev(2, "page")).toDS(),
      Seq(dropPages, tag("dst", "x"))).collect()
    assert(out.length == 1)
    assert(out.head.event.contains("\"type\":\"track\""))
  }

  test("retry: failed stage recorded; redrive resumes at that stage") {
    val out = FunctionChain.run(
      Seq(ev(3, "track"), ev(4, "track")).toDS(),
      Seq(tag("stage1", "done"), failOnType3, tag("dst", "x")))
    val byStatus = out.collect().groupBy(_.status)
    assert(byStatus("success").length == 1)
    val retry = byStatus("retry").head
    assert(retry.functionId == "f_fail3")
    // the retried event keeps stage-1 results (partial-chain retry R2)
    assert(retry.event.contains("\"stage1\":\"done\""))
    // redrive with a now-working stage (simulating transient failure)
    val fixedChain = Seq(tag("stage1", "done"),
      EventFunction("f_fail3", builtin = false, _ => Same), tag("dst", "x"))
    val redriven = FunctionChain.redrive(
      out.filter(_.status == "retry"), fixedChain).collect()
    assert(redriven.length == 1 && redriven.head.status == "success")
    // stage1 NOT re-run (would be idempotent here, but entry point is 1)
    assert(redriven.head.event.contains("\"dst\":\"x\""))
  }

  test("plain error: function edits skipped, event still delivered (R3)") {
    val boom = EventFunction("f_boom", builtin = false,
      _ => throw new RuntimeException("plain failure"))
    val out = FunctionChain.run(Seq(ev(1, "track")).toDS(),
      Seq(tag("pre", "a"), boom, tag("post", "b"))).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.status == "success") // delivered despite the failure
    assert(r.event.contains("\"pre\":\"a\"") && r.event.contains("\"post\":\"b\""))
    assert(r.error != null && r.error.contains("f_boom"))
  }

  test("only the last function may multiply (R4)") {
    val bad = FunctionChain.run(Seq(ev(1, "track")).toDS(),
      Seq(fanout, tag("dst", "x"))).collect()
    assert(bad.head.status == "error")
    assert(bad.head.error.contains("multiply"))
    val good = FunctionChain.run(Seq(ev(1, "track")).toDS(),
      Seq(tag("pre", "y"), fanout)).collect()
    assert(good.length == 2 && good.forall(_.status == "success"))
  }

  test("dst_retry: destination retry reruns destination only (R2)") {
    // destination fails on first attempt; function results must be
    // preserved and NOT re-run on redrive (ref dst_retry scenario)
    var chain = Seq(tag("fn_result", "v1"),
      EventFunction("dst", builtin = false, _ => Retry("dst down")))
    val out = FunctionChain.run(Seq(ev(1, "track")).toDS(), chain)
    val r = out.collect().head
    assert(r.status == "retry" && r.functionId == "dst")
    assert(r.event.contains("\"fn_result\":\"v1\"")) // attempt-0 results kept
    // redrive: a tag fn that would CHANGE the value if re-run
    val chain2 = Seq(tag("fn_result", "CHANGED"),
      EventFunction("dst", builtin = false, e => { e.put("sent", true); Replace(Seq(e)) }))
    val redriven = FunctionChain.redrive(
      out.filter(_.status == "retry"), chain2).collect().head
    assert(redriven.status == "success")
    assert(redriven.event.contains("\"fn_result\":\"v1\"")) // dst-only rerun
    assert(redriven.event.contains("\"sent\":true"))
  }

  test("ctx.store counts events per user across two batches (TTL KV)") {
    graft.chain.TTLStore.clearAll()
    val counter = EventFunction("f_count", builtin = false,
      (e: ObjectNode, ctx: graft.chain.ChainContext) => {
        val n = ctx.store.increment(s"n:${e.get("user").asText()}",
          ttl = graft.chain.TTLStore.TtlDuration("1d"))
        e.put("seen", n)
        Replace(Seq(e))
      })
    def batch(ids: Seq[Int]) = ids
      .map(i => s"""{"messageId":"m$i","type":"track","user":"u1"}""")
      .toDS().repartition(1) // same-user events serialized for the counter
    val opts = ChainOptions(connectionId = "conn1")
    FunctionChain.run(batch(Seq(1, 2)), Seq(counter), options = opts).collect()
    val out2 = FunctionChain.run(batch(Seq(3)), Seq(counter), options = opts)
      .collect().head
    assert(out2.event.contains("\"seen\":3")) // state survived across batches
    // store is namespaced per connection: other connection starts at 1
    val other = FunctionChain.run(batch(Seq(4)), Seq(counter),
      options = ChainOptions(connectionId = "conn2")).collect().head
    assert(other.event.contains("\"seen\":1"))
  }

  test("ttl store: expiry, getWithTTL, duration parse, inf") {
    import graft.chain.TTLStore
    TTLStore.clearAll()
    val s = new TTLStore("t")
    assert(TTLStore.ttlSeconds(TTLStore.TtlDuration("30m")) == 1800L)
    assert(TTLStore.ttlSeconds(TTLStore.TtlDuration("1d")) == 86400L)
    assert(TTLStore.ttlSeconds(TTLStore.TtlDuration("inf")) == -1L)
    s.setLong("a", 42L, TTLStore.TtlSeconds(3600))
    val Some((v, ttl)) = s.getWithTTL("a"): @unchecked
    assert(v.asLong() == 42L && ttl > 3500 && ttl <= 3600)
    s.setLong("b", 1L, TTLStore.NoExpiry)
    assert(s.ttl("b") == -1L)
    assert(s.ttl("missing") == -2L)
    s.setLong("c", 1L, TTLStore.TtlSeconds(0)) // expires immediately
    assert(s.get("c").isEmpty)
    s.del("a")
    assert(s.get("a").isEmpty)
  }

  test("multi scenario: ctx functions chain then last multiplies; retries visible") {
    // ref functions-chain-data.ts `multi` connection: function1 (stamps
    // first/retries/counter) -> function2 -> functionmulti (2 events)
    def stamp(id: String, field: String) = EventFunction(id, builtin = false,
      (e: ObjectNode, ctx: graft.chain.ChainContext) => {
        e.put(field, "1st")
        e.put("retries", ctx.retries)
        e.put("counter", Option(e.get("counter")).map(_.asInt()).getOrElse(0) + 1)
        Replace(Seq(e))
      })
    val multi = EventFunction("functionmulti", builtin = false, (e: ObjectNode) => {
      val a = e.deepCopy[ObjectNode]().put("n", 1)
      val b = e.deepCopy[ObjectNode]().put("n", 2)
      Replace(Seq(a, b))
    })
    val out = FunctionChain.run(Seq(ev(1, "track")).toDS(),
      Seq(stamp("function1", "first"), stamp("function2", "second"), multi))
      .collect()
    assert(out.length == 2 && out.forall(_.status == "success"))
    assert(out.forall(_.event.contains("\"counter\":2")))
    assert(out.forall(_.event.contains("\"retries\":0")))
    assert(out.map(o => o.event.contains("\"n\":1") || o.event.contains("\"n\":2"))
      .forall(identity))
  }

  test("ctx.geo and ctx.ua derive from the event context") {
    val withCtx =
      """{"messageId":"m1","type":"track","context":{"geo":{"country":"DE","city":"Berlin"},
        |"user_agent":"Mozilla/5.0 (iPhone; CPU iPhone OS 17_0 like Mac OS X) Safari/604.1"}}"""
        .stripMargin.replace("\n", "")
    val probe = EventFunction("f_probe", builtin = false,
      (e: ObjectNode, ctx: graft.chain.ChainContext) => {
        e.put("geo_country", ctx.geo.map(_.get("country").asText()).getOrElse(""))
        e.put("ua_os", ctx.ua.map(_.get("os").get("name").asText()).getOrElse(""))
        e.put("ua_device", ctx.ua.map(_.get("device").get("type").asText()).getOrElse(""))
        Replace(Seq(e))
      })
    val out = FunctionChain.run(Seq(withCtx).toDS(), Seq(probe)).collect().head
    assert(out.event.contains("\"geo_country\":\"DE\""))
    assert(out.event.contains("\"ua_os\":\"iOS\""))
    assert(out.event.contains("\"ua_device\":\"mobile\""))
  }

  test("R9: a function overrunning the UDF timeout becomes a retry at its stage") {
    val sleeper = EventFunction("f_slow", builtin = false, (_: ObjectNode) => {
      Thread.sleep(60000); Same
    })
    val out = FunctionChain.run(Seq(ev(1, "track")).toDS(),
      Seq(passThrough, sleeper),
      options = ChainOptions(udfTimeoutMs = 300)).collect().head
    assert(out.status == "retry")
    assert(out.functionId == "f_slow")
    assert(out.error.contains("longer than 300ms"))
    // builtins are exempt (rotor only sandboxes user code): a builtin
    // running past the budget still completes
    val slowBuiltin = EventFunction("b_slow", builtin = true, (_: ObjectNode) => {
      Thread.sleep(500); Same
    })
    val ok = FunctionChain.run(Seq(ev(1, "track")).toDS(),
      Seq(slowBuiltin), options = ChainOptions(udfTimeoutMs = 100))
      .collect().head
    assert(ok.status == "success")
  }

  test("drift guard: JVM UA parser agrees with the Column UA parser on every taxonomy field") {
    import org.apache.spark.sql.functions.{col, lit}
    val uas = Seq(
      "Mozilla/5.0 (Macintosh) AppleWebKit/537.36 Chrome/120.0 Safari/537.36",
      "Mozilla/5.0 (iPhone; CPU iPhone OS 17_0 like Mac OS X) Safari/604.1",
      "Googlebot/2.1 (+http://www.google.com/bot.html)",
      "Mozilla/5.0 (Windows NT 10.0) Gecko/20100101 Firefox/121.0",
      "Mozilla/5.0 (Linux; Android 14) Chrome/120.0 Mobile Safari/537.36",
      // Edge/Opera contain "Chrome"; iPad Safari carries Version/x;
      // Android without "Mobile" is a tablet
      "Mozilla/5.0 (Windows NT 10.0; Win64) Chrome/120.0 Safari/537.36 Edg/120.0.1",
      "Mozilla/5.0 (X11; Linux x86_64) Chrome/119.0 Safari/537.36 OPR/105.0.0.0",
      "Mozilla/5.0 (iPad; CPU OS 16_6 like Mac OS X) Version/16.6 Mobile/15E148 Safari/604.1",
      "Mozilla/5.0 (Linux; Android 13; SM-X700) Chrome/118.0 Safari/537.36",
      "Mozilla/5.0 (X11; CrOS x86_64 14541.0.0) Chrome/120.0 Safari/537.36",
      // engine/device/cpu coverage: old-Edge EdgeHTML, IE Trident,
      // Samsung phone, Pixel, PlayStation console, Apple TV, ARM mac
      "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 Chrome/64.0 Safari/537.36 Edge/18.18363",
      "Mozilla/5.0 (Windows NT 6.1; WOW64; Trident/7.0; rv:11.0) like Gecko",
      "Mozilla/5.0 (Linux; Android 14; SM-S928B) AppleWebKit/537.36 Chrome/121.0 Mobile Safari/537.36 SamsungBrowser/24.0",
      "Mozilla/5.0 (Linux; Android 14; Pixel 8 Pro) AppleWebKit/537.36 Chrome/121.0 Mobile Safari/537.36",
      "Mozilla/5.0 (PlayStation 5/SmartTV) AppleWebKit/605.1.15",
      "AppleTV11,1/11.1",
      "Mozilla/5.0 (Macintosh; ARM64 Mac OS X 14_2) AppleWebKit/605.1.15 Version/17.2 Safari/605.1.15",
      "Opera/9.80 (Windows NT 6.1) Presto/2.12.388 Version/12.16")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    uas.foreach { ua =>
      val jvm = FunctionChain.parseUaNode(mapper, ua)
      val sql = spark.range(1).select(
        graft.functions.Scalars.parseUa(lit(ua)).as("u"))
        .select(col("u.name"), col("u.os_name"), col("u.device_type"),
          col("u.bot"), col("u.version"), col("u.os_version"),
          col("u.major"), col("u.engine_name"), col("u.engine_version"),
          col("u.device_vendor"), col("u.device_model"),
          col("u.cpu_architecture"))
        .collect().head
      assert(jvm.get("browser").get("name").asText() == sql.getString(0), ua)
      assert(jvm.get("os").get("name").asText() == sql.getString(1), ua)
      assert(jvm.get("device").get("type").asText() == sql.getString(2), ua)
      assert(jvm.get("bot").asBoolean() == sql.getBoolean(3), ua)
      assert(jvm.get("browser").get("version").asText() == sql.getString(4), ua)
      assert(jvm.get("os").get("version").asText() == sql.getString(5), ua)
      assert(jvm.get("browser").get("major").asText() == sql.getString(6), ua)
      assert(jvm.get("engine").get("name").asText() == sql.getString(7), ua)
      assert(jvm.get("engine").get("version").asText() == sql.getString(8), ua)
      assert(jvm.get("device").get("vendor").asText() == sql.getString(9), ua)
      assert(jvm.get("device").get("model").asText() == sql.getString(10), ua)
      assert(jvm.get("cpu").get("architecture").asText() == sql.getString(11), ua)
    }
    // spot-check detection itself (not just twin agreement)
    def p(i: Int) = FunctionChain.parseUaNode(mapper, uas(i))
    val edge = p(5)
    assert(edge.get("browser").get("name").asText() == "Edge" &&
      edge.get("browser").get("version").asText() == "120.0.1" &&
      edge.get("browser").get("major").asText() == "120" &&
      edge.get("engine").get("name").asText() == "Blink" &&
      edge.get("os").get("version").asText() == "10" &&
      edge.get("cpu").get("architecture").asText() == "amd64")
    val ipad = p(7)
    assert(ipad.get("browser").get("name").asText() == "Safari" &&
      ipad.get("device").get("type").asText() == "tablet" &&
      ipad.get("device").get("vendor").asText() == "Apple" &&
      ipad.get("device").get("model").asText() == "iPad" &&
      ipad.get("browser").get("version").asText() == "16.6" &&
      ipad.get("os").get("version").asText() == "16.6")
    val tab = p(8)
    assert(tab.get("device").get("type").asText() == "tablet" &&
      tab.get("device").get("vendor").asText() == "Samsung" &&
      tab.get("device").get("model").asText() == "SM-X700" &&
      tab.get("os").get("name").asText() == "Android")
    assert(p(9).get("os").get("name").asText() == "ChromeOS")
    val oldEdge = p(10)
    assert(oldEdge.get("engine").get("name").asText() == "EdgeHTML" &&
      oldEdge.get("engine").get("version").asText() == "18.18363")
    val ie = p(11)
    assert(ie.get("browser").get("name").asText() == "IE" &&
      ie.get("browser").get("version").asText() == "11.0" &&
      ie.get("engine").get("name").asText() == "Trident" &&
      ie.get("os").get("version").asText() == "7" &&
      ie.get("cpu").get("architecture").asText() == "amd64")
    val sam = p(12)
    assert(sam.get("browser").get("name").asText() == "Samsung Internet" &&
      sam.get("browser").get("version").asText() == "24.0" &&
      sam.get("device").get("vendor").asText() == "Samsung" &&
      sam.get("device").get("model").asText() == "SM-S928B" &&
      sam.get("device").get("type").asText() == "mobile" &&
      sam.get("engine").get("name").asText() == "Blink")
    val pixel = p(13)
    assert(pixel.get("device").get("vendor").asText() == "Google" &&
      pixel.get("device").get("model").asText() == "Pixel 8 Pro" &&
      pixel.get("device").get("type").asText() == "mobile")
    assert(p(14).get("device").get("type").asText() == "console")
    assert(p(15).get("device").get("type").asText() == "smarttv")
    val armMac = p(16)
    assert(armMac.get("cpu").get("architecture").asText() == "arm64" &&
      armMac.get("os").get("name").asText() == "macOS" &&
      armMac.get("os").get("version").asText() == "14.2")
    val presto = p(17)
    assert(presto.get("browser").get("name").asText() == "Opera" &&
      presto.get("browser").get("version").asText() == "12.16" &&
      presto.get("engine").get("name").asText() == "Presto" &&
      presto.get("engine").get("version").asText() == "2.12.388")
  }

  test("stepRetry mode: retry rows carry STEP-entry events (udf retry saves the original, dst retry saves the post-udf state)") {
    import com.fasterxml.jackson.databind.node.ObjectNode
    val f1 = EventFunction("f1", builtin = false,
      (e: ObjectNode, _: graft.chain.ChainContext) => {
        e.put("a", 1); Replace(Seq(e))
      }, step = "udf")
    val fRetry = EventFunction("f_retry", builtin = false,
      (_: ObjectNode, ctx: graft.chain.ChainContext) =>
        if (ctx.retries < 1) Retry("later") else Same, step = "udf")
    val dstRetry = EventFunction("dst", builtin = true,
      (_: ObjectNode, ctx: graft.chain.ChainContext) =>
        if (ctx.retries < 1) Retry("444") else Same, step = "dst")
    val dstOk = EventFunction("dst", builtin = true,
      (_: ObjectNode, _: graft.chain.ChainContext) => Same, step = "dst")
    val opts = ChainOptions(stepRetry = true)
    val incoming = Seq("""{"type":"track"}""").toDS()
    // udf retry: queued event = STEP entry = the ORIGINAL incoming
    // event (f1's edits NOT in it), and the degraded event still
    // delivers this attempt
    val a = FunctionChain.run(incoming, Seq(f1, fRetry, dstOk),
      options = opts).collect()
    val aRetry = a.filter(_.status == "retry")
    val aOk = a.filter(_.status == "success")
    assert(aRetry.length == 1 && aOk.length == 1)
    assert(aRetry.head.event == """{"type":"track"}""")
    assert(aOk.head.event.contains("\"a\":1"))
    // dst retry: nothing delivered; queued event = post-udf state
    val b = FunctionChain.run(incoming, Seq(f1, dstRetry),
      options = opts).collect()
    assert(b.length == 1 && b.head.status == "retry")
    assert(b.head.event.contains("\"a\":1"))
    // redrive re-enters at the step start: dst-only for dst failures
    val b1 = FunctionChain.redrive(b.filter(_.status == "retry").toSeq.toDS(),
      Seq(f1, dstRetry), opts).collect()
    assert(b1.length == 1 && b1.head.status == "success")
    // f1 did not re-run (a stays 1, no double-put side effects visible)
    assert(b1.head.event.contains("\"a\":1"))
  }

  test("P12 merge patch: diff omits unchanged, carries adds/changes, nulls removals, recurses; patch + original reconstructs the result") {
    import com.fasterxml.jackson.databind.node.ObjectNode
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def on(s: String) = mapper.readTree(s).asInstanceOf[ObjectNode]
    val before = on("""{"a":1,"b":"x","nested":{"k":1,"m":2},"gone":true,"same":{"q":9}}""")
    val after = on("""{"a":1,"b":"y","nested":{"k":1,"m":3,"new":4},"added":[1,2],"same":{"q":9}}""")
    val patch = FunctionChain.diffEvent(mapper, before, after)
    assert(mapper.writeValueAsString(patch) ==
      """{"b":"y","nested":{"m":3,"new":4},"added":[1,2],"gone":null}""")
    // RFC 7386 apply: null removes, objects recurse, others replace
    def apply(target: ObjectNode, p: ObjectNode): ObjectNode = {
      val it = p.fieldNames()
      while (it.hasNext) {
        val k = it.next()
        val pv = p.get(k)
        if (pv.isNull) target.remove(k)
        else if (pv.isObject && target.has(k) && target.get(k).isObject)
          apply(target.get(k).asInstanceOf[ObjectNode],
            pv.asInstanceOf[ObjectNode])
        else target.set[com.fasterxml.jackson.databind.JsonNode](
          k, pv.deepCopy[com.fasterxml.jackson.databind.JsonNode]())
      }
      target
    }
    assert(apply(before.deepCopy[ObjectNode](), patch) == after)
    // identical events diff to the empty patch
    assert(FunctionChain.diffEvent(mapper, after, after).size() == 0)
  }

  test("metrics status derivation (A4)") {
    val out = FunctionChain.run(
      Seq(ev(3, "track")).toDS(), Seq(dropPages, failOnType3))
    val m = FunctionChain.withMetricsStatus(out.toDF(),
      Seq(dropPages, failOnType3)).collect().head
    assert(m.getAs[String]("metric_status") == "function_error")
  }

  test("testRun harness: logs captured, store seeded+visible, events out (UDFTestRun shape)") {
    import com.fasterxml.jackson.databind.node.ObjectNode
    import FunctionChain._
    val fn = EventFunction("enrich", builtin = false,
      (e: ObjectNode, ctx: ChainContext) => {
        ctx.logInfo(s"seen ${e.get("type").asText()}")
        val n = ctx.store.increment("count")
        e.put("n", n)
        e.put("seeded", ctx.store.get("plan").map(_.asText()).getOrElse("?"))
        Replace(Seq(e))
      })
    val r = FunctionChain.testRun(Seq(fn),
      """{"type":"track","event":"click"}""",
      storeSeed = Map("plan" -> "\"pro\""))
    assert(r.status == "success")
    assert(r.events.size == 1)
    assert(r.events.head.contains("\"n\":1"))
    assert(r.events.head.contains("\"seeded\":\"pro\""))
    assert(r.logs == Seq(("info", "seen track")))
    assert(r.store.get("count").contains("1"))
    assert(r.error == null)
    // fresh-store semantics: a second run does not see the first's count
    val r2 = FunctionChain.testRun(Seq(fn),
      """{"type":"track","event":"click"}""",
      storeSeed = Map("plan" -> "\"pro\""))
    assert(r2.events.head.contains("\"n\":1"))
  }

  test("testRun harness: drop, plain-exception pass-through, and retry statuses") {
    import com.fasterxml.jackson.databind.node.ObjectNode
    import FunctionChain._
    val dropper = EventFunction("dropper", builtin = false,
      (_: ObjectNode) => Drop)
    assert(FunctionChain.testRun(Seq(dropper), """{"type":"page"}""")
      .status == "drop")
    // R3: a plain exception skips the function's edits, event continues
    val thrower = EventFunction("thrower", builtin = false,
      (_: ObjectNode) => sys.error("boom"))
    val r = FunctionChain.testRun(Seq(thrower), """{"type":"page"}""")
    assert(r.status == "success" && r.events.size == 1)
    assert(r.error != null && r.error.contains("boom"))
    val retrier = EventFunction("retrier", builtin = false,
      (_: ObjectNode) => Retry("upstream 503"))
    val rr = FunctionChain.testRun(Seq(retrier), """{"type":"page"}""")
    assert(rr.status == "retry" && rr.error.contains("upstream 503"))
  }

  test("ctx.fetch: returns 2xx bodies; a non-2xx throws and the chain treats it as a plain function error") {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    def answer(path: String, code: Int, body: String): Unit = {
      server.createContext(path,
        (ex: com.sun.net.httpserver.HttpExchange) => {
          val b = body.getBytes("UTF-8")
          ex.sendResponseHeaders(code, b.length.toLong)
          ex.getResponseBody.write(b)
          ex.close()
        }): Unit
    }
    answer("/ok", 200, "hello")
    answer("/bad", 500, "boom")
    server.start()
    try {
      val port = server.getAddress.getPort
      val fetcher = EventFunction("fetcher", builtin = false,
        (e: ObjectNode, ctx: ChainContext) => {
          e.put("got", ctx.fetch(s"http://127.0.0.1:$port/ok"))
          Replace(Seq(e))
        })
      val ok = FunctionChain.testRun(Seq(fetcher), """{"type":"page"}""")
      assert(ok.status == "success")
      assert(ok.events.head.contains("\"got\":\"hello\""))
      // non-2xx throws inside the function -> R3 plain-error semantics:
      // edits skipped, event continues, error recorded
      val failing = EventFunction("failing_fetch", builtin = false,
        (e: ObjectNode, ctx: ChainContext) => {
          e.put("got", ctx.fetch(s"http://127.0.0.1:$port/bad"))
          Replace(Seq(e))
        })
      val bad = FunctionChain.testRun(Seq(failing), """{"type":"page"}""")
      assert(bad.status == "success" && bad.events.size == 1)
      assert(!bad.events.head.contains("got"))
      assert(bad.error != null && bad.error.contains("500"))
    } finally server.stop(0)
  }
}

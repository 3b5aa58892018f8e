package graft

import com.fasterxml.jackson.databind.node.ObjectNode

import graft.chain.FunctionChain
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

  test("metrics status derivation (A4)") {
    val out = FunctionChain.run(
      Seq(ev(3, "track")).toDS(), Seq(dropPages, failOnType3))
    val m = FunctionChain.withMetricsStatus(out.toDF(),
      Seq(dropPages, failOnType3)).collect().head
    assert(m.getAs[String]("metric_status") == "function_error")
  }
}

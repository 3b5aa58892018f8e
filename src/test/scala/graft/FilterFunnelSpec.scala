package graft

import org.apache.spark.sql.functions._

import graft.operators.FilterFunnel

class FilterFunnelSpec extends GraftSpec {
  import spark.implicits._

  private val docs = Seq(
    // (id, len, lang): stages below are lang=="en", len>=10, len<=100
    (1L, 50, "en"),  // survives
    (2L, 5, "en"),   // fails len>=10
    (3L, 5, "de"),   // fails lang AND len — must be charged to lang (first)
    (4L, 500, "en"), // fails len<=100
    (5L, 50, "en")   // survives
  ).toDF("id", "len", "lang")

  private val stages = Seq(
    "lang_en" -> (col("lang") === "en"),
    "too_short" -> (col("len") >= 10),
    "too_long" -> (col("len") <= 100))

  test("audit charges each doc to the FIRST failing stage only") {
    val got = FilterFunnel.audit(docs, stages)
      .select("id", "first_drop").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> null, 2L -> "too_short", 3L -> "lang_en",
      4L -> "too_long", 5L -> null))
  }

  test("audit: a null predicate drops (never waves through)") {
    val d = Seq((1L, Some("en")), (2L, None)).toDF("id", "lang")
    val got = FilterFunnel.audit(d, Seq("lang_en" -> (col("lang") === "en")))
      .select("id", "survived").as[(Long, Boolean)].collect().toMap
    assert(got == Map(1L -> true, 2L -> false))
  }

  test("funnel: sequential dropped/remaining accounting") {
    val f = FilterFunnel.funnel(FilterFunnel.audit(docs, stages),
      stages.map(_._1))
      .select("stage", "stage_idx", "dropped", "remaining")
      .as[(String, Int, Long, Long)].collect().toSeq
    assert(f == Seq(("lang_en", 1, 1L, 4L), ("too_short", 2, 1L, 3L),
      ("too_long", 3, 1L, 2L)))
  }

  test("funnel: a stage that drops nothing still appears with dropped=0") {
    val f = FilterFunnel.funnel(
      FilterFunnel.audit(docs, stages :+ ("never" -> lit(true))),
      stages.map(_._1) :+ "never")
      .select("stage", "dropped", "remaining")
      .as[(String, Long, Long)].collect().toSeq
    assert(f.last == ("never", 0L, 2L))
  }

  test("audit matches the N-scans-of-sequential-filters result") {
    // reference semantics: stage i filters the survivors of stages < i
    var surviving = docs
    var expected = Map.empty[Long, String]
    stages.foreach { case (name, pass) =>
      val dropped = surviving.filter(!coalesce(pass, lit(false)))
        .select("id").as[Long].collect()
      expected ++= dropped.map(_ -> name)
      surviving = surviving.filter(coalesce(pass, lit(false)))
    }
    val got = FilterFunnel.audit(docs, stages)
      .filter(!col("survived"))
      .select("id", "first_drop").as[(Long, String)].collect().toMap
    assert(got == expected)
  }
}

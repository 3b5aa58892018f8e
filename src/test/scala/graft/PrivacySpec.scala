package graft

import org.apache.spark.sql.functions._

import graft.operators.{MetricsAgg, Privacy}

/** Privacy audits (k-anonymity / l-diversity / DP counts) and the
  * billing quota admission operator. */
class PrivacySpec extends GraftSpec {
  import spark.implicits._

  private val release = Seq(
    // (nation, segment, sensitive)
    ("US", "AUTO", "cancer"), ("US", "AUTO", "flu"),
    ("US", "AUTO", "flu"), ("US", "AUTO", "healthy"),
    ("US", "AUTO", "flu"), // class of 5, 3 distinct sensitive
    ("DE", "AUTO", "flu"), ("DE", "AUTO", "flu"), // class of 2, 1 value
    ("FR", "BIKE", "cancer") // class of 1
  ).toDF("nation", "segment", "sensitive")

  test("kAnonymityViolations: classes under k, and only those") {
    val got = Privacy.kAnonymityViolations(release,
        Seq("nation", "segment"), k = 5)
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("DE", "AUTO", 2L), ("FR", "BIKE", 1L)))
  }

  test("lDiversityViolations: homogeneous classes flagged even when big") {
    val got = Privacy.lDiversityViolations(release,
        Seq("nation", "segment"), "sensitive", l = 2)
      .as[(String, String, Long, Long)].collect().toSet
    // US/AUTO has 3 distinct values -> safe at l=2; DE and FR homogeneous
    assert(got == Set(("DE", "AUTO", 2L, 1L), ("FR", "BIKE", 1L, 1L)))
  }

  test("tClosenessByClass: hand-computed total-variation per class, missing values carry their global mass") {
    // global sensitive mix: a x2, b x2 -> 500000 micros each
    val df = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"))
      .toDF("q", "s")
    val m = Privacy.tClosenessByClass(df, Seq("q"), "s")
      .collect().map(r => r.getAs[Long]("q") -> r).toMap
    // both classes exactly match the global mix -> tv = 0
    assert(m(1L).getAs[Long]("class_size") == 2 &&
      m(1L).getAs[Long]("tv_micro") == 0L)
    assert(m(2L).getAs[Long]("tv_micro") == 0L)
    // skew one class: global becomes a x3, b x1 (pg = 750000/250000)
    // class 1 = {a, a}: gap |1e6 - 750000| = 250000 present + 250000
    // missing mass for b, halved -> 250000
    // class 2 = {a, b}: gaps 250000 + 250000, halved -> 250000
    val df2 = Seq((1L, "a"), (1L, "a"), (2L, "a"), (2L, "b"))
      .toDF("q", "s")
    val m2 = Privacy.tClosenessByClass(df2, Seq("q"), "s")
      .collect().map(r => r.getAs[Long]("q") -> r).toMap
    assert(m2(1L).getAs[Long]("tv_micro") == 250000L)
    assert(m2(2L).getAs[Long]("tv_micro") == 250000L)
    // non-divisible global (a x5, b x1 of 6 -> 833333/166666, total
    // 999999): class {a,a} gap 166667 + missing 166666 -> 166666 —
    // the missing mass rides the ACTUAL micro total, not 1e6
    val df3 = df2.union(Seq((3L, "a"), (3L, "a")).toDF("q", "s"))
    val m3 = Privacy.tClosenessByClass(df3, Seq("q"), "s")
      .collect().map(r => r.getAs[Long]("q") -> r).toMap
    assert(m3(3L).getAs[Long]("tv_micro") == 166666L)
  }

  test("kAnonymitySummary: counts classes, violators, rows at risk") {
    val got = Privacy.kAnonymitySummary(release,
        Seq("nation", "segment"), k = 5)
      .as[(Long, Long, Long, Long)].collect().head
    assert(got == ((3L, 2L, 3L, 1L)))
  }

  test("dpCounts: deterministic per seed, seed changes the noise") {
    val df = release
    def run(seed: Long) = Privacy.dpCounts(df,
        Seq(col("nation")), Seq("nation"), eps = 1.0, seed = seed)
      .as[(String, Long)].collect().toMap
    val a = run(7L)
    assert(a == run(7L)) // replayable
    // across many seeds at least one group must move
    assert((1L to 20L).exists(s => run(s) != a))
  }

  test("dpCounts: noise bounded by the inverse-CDF envelope, floor at 0") {
    // max |noise| = (1/eps)·ln(2^48) ≈ 33.3
    val exact = release.groupBy("nation").count()
      .as[(String, Long)].collect().toMap
    val noisy = Privacy.dpCounts(release,
        Seq(col("nation")), Seq("nation"), eps = 1.0, seed = 3L)
      .as[(String, Long)].collect().toMap
    assert(noisy.keySet == exact.keySet)
    noisy.foreach { case (k, v) =>
      assert(v >= 0L)
      assert(math.abs(v - exact(k)) <= 35L)
    }
  }

  test("quotaAdmission: parity with the naive global window") {
    val base = java.sql.Timestamp.valueOf("2024-01-05 00:00:00")
    val rows = (1L to 97L).map { i =>
      val ws = s"w${i % 2}"
      // three distinct months; deliberate duplicate timestamps exercise
      // the (ts, id) tie-break
      val ts = new java.sql.Timestamp(
        base.getTime + (i % 3) * 30L * 86400000L + (i / 7) * 1000L)
      (ws, ts, i)
    }
    val df = rows.toDF("ws", "ts", "id")
    val got = MetricsAgg.quotaAdmission(df, col("ws"), col("ts"),
        col("id"), quota = 10L)
      .select(col("workspace_id"), col("event_id"), col("seq"),
        col("billable"))
      .as[(String, Long, Long, Boolean)].collect().toSet
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("ws"),
        date_trunc("month", col("ts")))
      .orderBy(col("ts"), col("id"))
    val want = df.withColumn("seq", row_number().over(w).cast("long"))
      .select(col("ws"), col("id"), col("seq"),
        (col("seq") <= 10L).as("b"))
      .as[(String, Long, Long, Boolean)].collect().toSet
    assert(got == want)
  }

  test("quotaAdmission: exact boundary — quota rows all billable") {
    val ts0 = java.sql.Timestamp.valueOf("2024-03-01 00:00:00")
    val df = (1L to 5L).map(i =>
      ("w", new java.sql.Timestamp(ts0.getTime + i), i)).toDF("ws", "ts", "id")
    val all = MetricsAgg.quotaAdmission(df, col("ws"), col("ts"),
      col("id"), quota = 5L)
    assert(all.filter(!col("billable")).count() == 0)
    val one = MetricsAgg.quotaAdmission(df, col("ws"), col("ts"),
      col("id"), quota = 4L)
    assert(one.filter(!col("billable"))
      .select(col("event_id")).as[Long].collect().toSeq == Seq(5L))
  }
}

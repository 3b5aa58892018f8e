package graft

import org.apache.spark.sql.functions._

import graft.operators.DataChecks

/** Data-quality battery: every check counts exactly its planted
  * violations and nothing else. */
class DataChecksSpec extends GraftSpec {
  import spark.implicits._

  test("unique: counts extra copies per key plus null-keyed rows") {
    val df = Seq(Some(1L), Some(1L), Some(1L), Some(2L), None, None)
      .toDF("k")
    // key 1 has 2 extra copies; 2 null keys
    val got = DataChecks.run(DataChecks.unique(df, Seq("k"), "u"))
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("u", 4L)))
  }

  test("referential: non-null child keys missing from the parent") {
    val child = Seq(Some(1L), Some(2L), Some(9L), Some(9L), None).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val got = DataChecks.run(
        DataChecks.referential(child, "fk", parent, "pk", "r"))
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("r", 2L))) // both 9s; the null is not a violation
  }

  test("notNull and expression: null-pass counts as a violation") {
    val df = Seq((Some(1L), Some(5.0)), (None, Some(0.5)),
      (Some(3L), None)).toDF("a", "b")
    val got = DataChecks.run(
        DataChecks.notNull(df, Seq("a"), "nn"),
        DataChecks.expression(df, col("b") <= 1.0, "expr"))
      .as[(String, Long)].collect().toMap
    // nn: one null a; expr: b=5.0 fails, b=null fails (null-pass = fail)
    assert(got == Map("nn" -> 1L, "expr" -> 2L))
  }

  test("run: clean tables yield an all-zero report in check-name order") {
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "v")
    val got = DataChecks.run(
        DataChecks.unique(df, Seq("id"), "b_unique"),
        DataChecks.notNull(df, Seq("id", "v"), "a_notnull"))
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("a_notnull", 0L), ("b_unique", 0L)))
  }

  test("tableChecksum: order/partitioning-invariant, mutation-sensitive, null-safe") {
    def sig(df: org.apache.spark.sql.DataFrame) =
      DataChecks.tableChecksum(df, Seq("id", "name"), "t")
        .select("n_rows", "xor_sig", "sum_sig")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getDecimal(2).toString)).head
    val rows = Seq((1L, "a"), (2L, "b"), (3L, null.asInstanceOf[String]))
    val a = sig(rows.toDF("id", "name"))
    val b = sig(rows.reverse.toDF("id", "name").repartition(5))
    assert(a == b, "checksum must not depend on row order or layout")
    // any single-value mutation changes at least one signature
    val mut = sig(Seq((1L, "a"), (2L, "b"), (3L, "x")).toDF("id", "name"))
    assert(mut != a)
    // null vs the literal rendering of null's sentinel must differ from
    // the empty string
    val e = sig(Seq((1L, "a"), (2L, "b"), (3L, "")).toDF("id", "name"))
    assert(e != a)
  }

  test("bucketDiff: classifies all three drift kinds, exactly") {
    val src = (1L to 200L).map(i => (i, s"v$i", "ok")).toDF("k", "a", "b")
    // drop 7, change 13's value, add key 501
    val rep = (1L to 200L).filterNot(_ == 7L)
      .map(i => (i, if (i == 13L) "CHANGED" else s"v$i", "ok"))
      .toDF("k", "a", "b")
      .unionByName(Seq((501L, "extra", "ok")).toDF("k", "a", "b"))
    val got = DataChecks.bucketDiff(src, rep, Seq("k"), Seq("a", "b"),
        nBuckets = 16)
      .as[(Long, String)].collect().toSet
    assert(got == Set((7L, "missing_in_replica"),
      (13L, "value_mismatch"), (501L, "missing_in_source")))
  }

  test("bucketDiff: identical tables produce an empty diff") {
    val t = (1L to 100L).map(i => (i, s"v$i")).toDF("k", "a")
    assert(DataChecks.bucketDiff(t, t, Seq("k"), Seq("a")).count() == 0L)
  }

  test("bucketDiff: null values and composite keys survive the digest") {
    val src = Seq((1L, 1L, Some("x")), (1L, 2L, None), (2L, 1L, Some("y")))
      .toDF("k1", "k2", "v")
    // null -> "" flip must be caught (the U+0000 sentinel rule)
    val rep = Seq((1L, 1L, Some("x")), (1L, 2L, Some("")),
      (2L, 1L, Some("y"))).toDF("k1", "k2", "v")
    val got = DataChecks.bucketDiff(src, rep, Seq("k1", "k2"), Seq("v"),
        nBuckets = 8)
      .as[(Long, Long, String)].collect().toSet
    assert(got == Set((1L, 2L, "value_mismatch")))
  }

  test("functionalDependency: holding vs violated dependencies count exactly") {
    val df = Seq((1L, "a", "x"), (1L, "a", "y"), (2L, "b", "z"),
      (3L, "b", "z")).toDF("k", "d1", "d2")
    // k -> d1 holds (each k has one d1)
    val hold = DataChecks.functionalDependency(df, Seq("k"), "d1", "h")
      .as[(String, Long, Long, Long)].collect().head
    assert(hold == (("h", 3L, 0L, 0L)))
    // k -> d2 violated for k=1 (x and y), 2 rows involved
    val viol = DataChecks.functionalDependency(df, Seq("k"), "d2", "v")
      .as[(String, Long, Long, Long)].collect().head
    assert(viol == (("v", 3L, 1L, 2L)))
    // composite determinant (k, d1) -> d2: still violated for (1, a)
    val comp = DataChecks.functionalDependency(df, Seq("k", "d1"), "d2", "c")
      .as[(String, Long, Long, Long)].collect().head
    assert(comp == (("c", 3L, 1L, 2L)))
  }

  test("psi: identical distributions score zero per bucket; a shift yields the hand-computed terms") {
    val a = Seq(5L, 5L, 25L, 25L).toDF("v")
    // identical snapshots: every term is exactly 0 (ln(1) = 0)
    val same = DataChecks.psi(a, a, "v", edges = Seq(10L, 30L))
      .collect().map(r => r.getAs[Int]("bucket") -> r).toMap
    assert(same.keySet == Set(0, 1, 2))
    assert(same.values.forall(_.getAs[Double]("psi_term") == 0.0))
    // empty buckets floor to 1 row before the share, never div-by-zero
    assert(same(2).getAs[Long]("n_a") == 0 &&
      same(2).getAs[Long]("pa_micro") == 250000)
    // shifted: A = (2 low, 2 high), B = (4 low); hand-computed micros
    //   pa = (500000, 500000, floor-1 250000)
    //   pb = (1000000, floor-1 250000, floor-1 250000)
    val b = Seq(5L, 6L, 7L, 8L).toDF("v")
    val shift = DataChecks.psi(a, b, "v", edges = Seq(10L, 30L))
      .collect().map(r => r.getAs[Int]("bucket") -> r).toMap
    assert(shift(0).getAs[Long]("pa_micro") == 500000 &&
      shift(0).getAs[Long]("pb_micro") == 1000000)
    val t0 = shift(0).getAs[Double]("psi_term")
    assert(math.abs(t0 - (-0.5 * math.log(0.5))) < 1e-5, s"t0=$t0")
    assert(shift(1).getAs[Long]("pb_micro") == 250000)
    // bucket edges surface in the report (overflow bucket has none)
    assert(shift(0).getAs[Long]("edge") == 10 &&
      shift(2).isNullAt(shift(2).fieldIndex("edge")))
  }

  test("psi: a side past 1e6 rows keeps empty-bucket shares at 1 micro — no ln(0)/NULL terms") {
    // 1.2M rows all in bucket 0: greatest(n,1)*1e6 div total floors an
    // empty bucket's share to 0 without the outer floor, and psi_term
    // would be NULL on Spark / -inf on DuckDB
    val a = spark.range(1200000L).select(lit(1L).as("v"))
    val b = Seq(1L, 50L).toDF("v")
    val rows = DataChecks.psi(a, b, "v", edges = Seq(10L, 30L))
      .collect().map(r => r.getAs[Int]("bucket") -> r).toMap
    assert(rows.keySet == Set(0, 1, 2))
    rows.values.foreach { r =>
      assert(r.getAs[Long]("pa_micro") >= 1L && r.getAs[Long]("pb_micro") >= 1L)
      assert(!r.isNullAt(r.fieldIndex("psi_term")),
        s"psi_term NULL in bucket ${r.getAs[Int]("bucket")}")
      assert(!r.getAs[Double]("psi_term").isInfinite)
    }
    // the empty middle/overflow buckets on side A floored to exactly 1
    assert(rows(1).getAs[Long]("n_a") == 0 &&
      rows(1).getAs[Long]("pa_micro") == 1L)
  }

  test("profile: per-column row/null/distinct counts and the modal value with deterministic tiebreak") {
    val df = Seq((Some(1L), Some("a")), (Some(2L), Some("a")),
      (Some(3L), Some("b")), (None, None))
      .toDF("k", "v")
    val m = DataChecks.profile(df, Seq("k", "v"))
      .collect().map(r => r.getAs[String]("column_name") -> r).toMap
    val k = m("k")
    assert(k.getAs[Long]("n_rows") == 4 && k.getAs[Long]("n_null") == 1 &&
      k.getAs[Long]("n_distinct") == 3)
    // all-distinct column: tie broken by the smallest rendered value
    assert(k.getAs[String]("top_value") == "1" &&
      k.getAs[Long]("top_n") == 1)
    val v = m("v")
    assert(v.getAs[Long]("n_distinct") == 2 &&
      v.getAs[String]("top_value") == "a" && v.getAs[Long]("top_n") == 2)
    // an all-null column profiles with a null mode, not an error
    val nul = Seq[Option[String]](None, None).toDF("x")
    val rx = DataChecks.profile(nul, Seq("x")).collect().head
    assert(rx.getAs[Long]("n_null") == 2 &&
      rx.getAs[Long]("n_distinct") == 0 &&
      rx.isNullAt(rx.fieldIndex("top_value")))
  }

  test("benford: first-digit counts, exact micro shares, and the hardcoded expectations; non-positives skipped") {
    // 1..9 once each + 10..19 (ten more 1-leading values) + 0 and -5
    val vals = (1L to 9L) ++ (10L to 19L) ++ Seq(0L, -5L)
    val df = vals.toDF("v")
    val rows = DataChecks.benford(df, "v")
      .collect().map(r => r.getAs[Int]("digit") -> r).toMap
    assert(rows.keySet == (1 to 9).toSet)
    assert(rows(1).getAs[Long]("n") == 11 &&
      rows(2).getAs[Long]("n") == 1)
    // 19 kept values: digit-1 share = 11e6 div 19
    assert(rows(1).getAs[Long]("observed_micro") == 578947L)
    assert(rows(1).getAs[Long]("expected_micro") == 301029L &&
      rows(9).getAs[Long]("expected_micro") == 45757L)
    assert(rows(1).getAs[Long]("dev_micro") == 578947L - 301029L)
    assert(rows.values.forall(_.getAs[Long]("n_skipped") == 2))
    // a digit absent from the data still reports (n=0), Benford's
    // report shape is the digit list
    val sparse = Seq(100L).toDF("v")
    val s = DataChecks.benford(sparse, "v")
      .collect().map(r => r.getAs[Int]("digit") -> r).toMap
    assert(s(7).getAs[Long]("n") == 0 &&
      s(1).getAs[Long]("observed_micro") == 1000000L)
  }
}

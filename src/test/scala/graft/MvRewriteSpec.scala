package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.MvRewrite
import graft.plans.MvRewrite.{MvCatalog, MvDef}

/** MV aggregate navigation: queries over the raw table are served by
  * the registered pre-agg — plan-shape proven, results identical to the
  * direct path, and every disqualifying shape left untouched. */
class MvRewriteSpec extends GraftSpec {
  import spark.implicits._

  private def tmp(prefix: String): String = {
    val d = Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit()
    d.toString
  }

  /** (rawPath, raw frame) — 200 rows, 2 dims, 10 days, long measure. */
  private def makeRaw(): (String, DataFrame) = {
    val p = s"${tmp("mv-raw")}/raw.parquet"
    (1 to 200).map { i =>
      (if (i % 2 == 0) "click" else "view",
        java.sql.Timestamp.valueOf(f"2024-01-${i % 10 + 1}%02d 0${i % 9}:30:00"),
        i.toLong)
    }.toDF("etype", "ts", "v").write.parquet(p)
    (p, spark.read.parquet(p))
  }

  private def buildMv(raw: DataFrame, rawPath: String): String = {
    val mvPath = s"${tmp("mv")}/mv.parquet"
    raw.groupBy(col("etype"), date_trunc("day", col("ts")).as("period"))
      .agg(sum(col("v")).as("sum_v"), count(lit(1)).as("cnt"),
        min(col("v")).as("min_v"), max(col("v")).as("max_v"))
      .write.parquet(mvPath)
    MvCatalog.register(spark, raw, rawPath, MvDef(
      name = "daily", mvPath = mvPath,
      groupKeys = Seq((col("etype"), "etype")),
      timeKey = Some((col("ts"), "period", "day")),
      sums = Seq((col("v"), "sum_v")),
      mins = Seq((col("v"), "min_v")),
      maxs = Seq((col("v"), "max_v")),
      countCol = Some("cnt")))
    mvPath
  }

  private def scansOf(df: DataFrame): String =
    df.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.rootPaths.mkString(",")
          case r => r.toString
        }
    }.mkString("\n")

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq.toList: Seq[Any]).toSet

  test("month rollup over the raw table is served by the day MV") {
    val (rawPath, raw) = makeRaw()
    val mvPath = buildMv(raw, rawPath)
    try {
      def q = raw.groupBy(col("etype"),
          date_trunc("month", col("ts")).as("m"))
        .agg(sum(col("v")).as("s"), count(lit(1)).as("n"),
          min(col("v")).as("lo"), max(col("v")).as("hi"))
      val served = q
      assert(scansOf(served).contains(mvPath), "MV scan expected")
      assert(!scansOf(served).contains(rawPath), "raw scan not expected")
      val got = rows(served)
      MvCatalog.unregister(rawPath)
      assert(rows(q) == got) // identical to the direct plan
    } finally MvCatalog.unregister(rawPath)
  }

  test("dim filter rides along; result identical") {
    val (rawPath, raw) = makeRaw()
    val mvPath = buildMv(raw, rawPath)
    try {
      def q = raw.filter(col("etype") === "click")
        .groupBy(date_trunc("day", col("ts")).as("d"))
        .agg(sum(col("v")).as("s"))
      assert(scansOf(q).contains(mvPath))
      val got = rows(q)
      MvCatalog.unregister(rawPath)
      assert(rows(q) == got)
    } finally MvCatalog.unregister(rawPath)
  }

  test("global aggregate (no grouping) is served, count stays exact") {
    val (rawPath, raw) = makeRaw()
    val mvPath = buildMv(raw, rawPath)
    try {
      def q = raw.agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      assert(scansOf(q).contains(mvPath))
      assert(rows(q) == Set(Seq(200L, (1L to 200L).sum)))
    } finally MvCatalog.unregister(rawPath)
  }

  test("disqualifying shapes are left on the raw scan") {
    val (rawPath, raw) = makeRaw()
    val mvPath = buildMv(raw, rawPath)
    try {
      // count(distinct) is not re-aggregable
      val cd = raw.groupBy(col("etype"))
        .agg(countDistinct(col("v")).as("d"))
      assert(!scansOf(cd).contains(mvPath))
      // hour grain is finer than the day MV
      val hour = raw.groupBy(date_trunc("hour", col("ts")).as("h"))
        .agg(sum(col("v")).as("s"))
      assert(!scansOf(hour).contains(mvPath))
      // filter on a non-dim column
      val f = raw.filter(col("v") > 100)
        .groupBy(col("etype")).agg(sum(col("v")).as("s"))
      assert(!scansOf(f).contains(mvPath))
      // grouping by a non-dim column
      val g = raw.groupBy(col("v")).agg(count(lit(1)).as("n"))
      assert(!scansOf(g).contains(mvPath))
      // avg is not served (per-column nulls invisible to the MV count)
      val av = raw.groupBy(col("etype")).agg(avg(col("v")).as("a"))
      assert(!scansOf(av).contains(mvPath))
      // all five still compute correctly from raw
      assert(cd.count() == 2 && hour.count() > 0 && f.count() == 2 &&
        g.count() == 200 && av.count() == 2)
    } finally MvCatalog.unregister(rawPath)
  }

  test("MV staleness across a history vacuum: a folded watch keeps serving (data unchanged), the next real commit still invalidates") {
    val wh = Files.createTempDirectory("mv-vac-wh").toString
    val router = new graft.sinks.SinkRouter(wh)
    def land(t: String, n: Int): Unit =
      router.write((1 to n).map(i =>
          ("click", java.sql.Timestamp.valueOf(f"2024-01-0${i % 5 + 1} 03:30:00"), i.toLong))
        .toDF("etype", "ts", "v")
        .withColumn("_table", lit(t)))
    land("ev", 50)
    val rawPath = s"$wh/ev"
    val raw = spark.read.parquet(rawPath)
    val mvPath = s"${tmp("mv")}/mv.parquet"
    raw.groupBy(col("etype")).agg(sum(col("v")).as("sum_v"),
        count(lit(1)).as("cnt"))
      .write.parquet(mvPath)
    MvCatalog.register(spark, raw, rawPath, MvDef(
      name = "byetype", mvPath = mvPath,
      groupKeys = Seq((col("etype"), "etype")), timeKey = None,
      sums = Seq((col("v"), "sum_v")), countCol = Some("cnt")))
    MvCatalog.watchCommits(rawPath, s"$wh/_history", "ev")
    try {
      def q = spark.read.parquet(rawPath).groupBy(col("etype"))
        .agg(sum(col("v")).as("s"))
      assert(scansOf(q).contains(mvPath), "MV should serve while fresh")
      // bury ev's commit and vacuum it away: ev's version stamp
      // regresses to 0 — NOT a staleness signal (vacuum moves no data),
      // so the MV keeps serving
      land("other", 3); land("other", 3)
      router.vacuumHistory(1)
      assert(scansOf(q).contains(mvPath),
        "vacuumed history must not fake staleness")
      // a REAL commit after the vacuum gets a version above the folded
      // range and must flip the watch to stale → raw fallback
      land("ev", 10)
      assert(!scansOf(q).contains(mvPath),
        "post-vacuum commit must mark the MV stale")
      assert(scansOf(q).contains(rawPath))
    } finally MvCatalog.unregister(rawPath)
  }

  test("derived group key (banded dim) matches semantically") {
    val (rawPath, raw) = makeRaw()
    val mvPath = s"${tmp("mv")}/mv.parquet"
    val band = floor(col("v") / 50).cast("long")
    raw.groupBy(band.as("band"))
      .agg(sum(col("v")).as("sum_v"), count(lit(1)).as("cnt"))
      .write.parquet(mvPath)
    MvCatalog.register(spark, raw, rawPath, MvDef(
      name = "banded", mvPath = mvPath,
      groupKeys = Seq((band, "band")), timeKey = None,
      sums = Seq((col("v"), "sum_v")), countCol = Some("cnt")))
    try {
      def q = raw.groupBy(floor(col("v") / 50).cast("long").as("b"))
        .agg(count(lit(1)).as("n"))
      assert(scansOf(q).contains(mvPath))
      val got = rows(q)
      MvCatalog.unregister(rawPath)
      assert(rows(q) == got)
      // a DIFFERENT band width must not match
      MvCatalog.register(spark, raw, rawPath, MvDef(
        name = "banded", mvPath = mvPath,
        groupKeys = Seq((band, "band")), timeKey = None,
        sums = Seq((col("v"), "sum_v")), countCol = Some("cnt")))
      val other = raw.groupBy(floor(col("v") / 25).cast("long").as("b"))
        .agg(count(lit(1)).as("n"))
      assert(!scansOf(other).contains(mvPath))
    } finally MvCatalog.unregister(rawPath)
  }

  test("MV chain: a rollup registered over another MV cascades in the fixpoint") {
    val (rawPath, raw) = makeRaw()
    val dayMvPath = buildMv(raw, rawPath) // raw -> day MV registered
    val monthMvPath = s"${tmp("mv")}/month.parquet"
    val dayMv = spark.read.parquet(dayMvPath)
    // month rollup OF THE DAY MV, registered with the day MV as its raw
    dayMv.groupBy(col("etype"),
        date_trunc("month", col("period")).as("m"))
      .agg(sum(col("sum_v")).as("msum"), sum(col("cnt")).as("mcnt"))
      .write.parquet(monthMvPath)
    MvCatalog.register(spark, dayMv, dayMvPath, MvDef(
      name = "monthly", mvPath = monthMvPath,
      groupKeys = Seq((col("etype"), "etype")),
      timeKey = Some((col("period"), "m", "month")),
      sums = Seq((col("sum_v"), "msum"), (col("cnt"), "mcnt"))))
    try {
      // a YEAR-grain query on the RAW table: first rewrite lands on the
      // day MV, the fixpoint re-runs the rule, the second rewrite lands
      // on the month MV
      def q = raw.groupBy(date_trunc("year", col("ts")).as("y"))
        .agg(sum(col("v")).as("s"))
      assert(scansOf(q).contains(monthMvPath),
        "expected the chain to cascade to the month MV")
      assert(!scansOf(q).contains(rawPath))
      val got = rows(q)
      // WEEK stops at the day MV: week boundaries are day-aligned but
      // not month-aligned (the grain DAG's one non-total edge)
      val wk = raw.groupBy(date_trunc("week", col("ts")).as("w"))
        .agg(sum(col("v")).as("s"))
      assert(scansOf(wk).contains(dayMvPath) &&
        !scansOf(wk).contains(monthMvPath))
      MvCatalog.unregister(rawPath)
      MvCatalog.unregister(dayMvPath)
      assert(rows(q) == got)
    } finally {
      MvCatalog.unregister(rawPath)
      MvCatalog.unregister(dayMvPath)
    }
  }

  test("catalog save/load round-trips registrations (restart survival)") {
    val (rawPath, raw) = makeRaw()
    val mvPath = buildMv(raw, rawPath)
    val file = s"${tmp("mvcat")}/catalog.json"
    try {
      MvCatalog.save(file)
      MvCatalog.clear()
      def q = raw.groupBy(col("etype")).agg(sum(col("v")).as("s"))
      assert(!scansOf(q).contains(mvPath), "cleared catalog must not serve")
      MvCatalog.load(spark, file)
      assert(scansOf(q).contains(mvPath), "loaded catalog must serve")
      val got = rows(q)
      MvCatalog.unregister(rawPath)
      assert(rows(q) == got)
    } finally MvCatalog.unregister(rawPath)
  }

  test("SQL-surface queries rewrite too") {
    val (rawPath, raw) = makeRaw()
    val mvPath = buildMv(raw, rawPath)
    raw.createOrReplaceTempView("mv_raw_events")
    try {
      val q = spark.sql(
        """SELECT etype, date_trunc('month', ts) AS m,
          |  sum(v) AS s, count(1) AS n
          |FROM mv_raw_events GROUP BY 1, 2""".stripMargin)
      assert(scansOf(q).contains(mvPath))
      val got = rows(q)
      MvCatalog.unregister(rawPath)
      assert(rows(spark.sql(
        """SELECT etype, date_trunc('month', ts) AS m,
          |  sum(v) AS s, count(1) AS n
          |FROM mv_raw_events GROUP BY 1, 2""".stripMargin)) == got)
    } finally {
      MvCatalog.unregister(rawPath)
      spark.catalog.dropTempView("mv_raw_events")
    }
  }
}

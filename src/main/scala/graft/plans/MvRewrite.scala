package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Materialized-view QUERY REWRITE — the read-path half of the MV story
  * (aggregate navigation). The reference keeps ClickHouse
  * AggregatingMergeTree MVs and every report endpoint knows to query the
  * MV table by name (`webapps/console/prisma/metrics.sql` +
  * `event-stat.ts:40-56`); the repo's `a2b_incremental_rollup` /
  * `j5c_incremental_profiles` already maintain such pre-aggregates
  * incrementally. This rule closes the loop from the other side: a
  * report written against the RAW events table is rewritten by the
  * optimizer to scan the registered pre-agg instead — the report author
  * doesn't need to know the MV exists, and at 100 TB the difference is
  * scanning the rollup (keys × grain cells) vs the event stream.
  *
  * A registered [[MvDef]] describes the MV as aggregate-over-scan:
  * group keys (arbitrary expressions, matched SEMANTICALLY — a derived
  * dim like a banded value matches too), an optional time key with its
  * truncation grain, and re-aggregable measures (sum / min / max /
  * count). An `Aggregate` over the raw scan qualifies when, after
  * inlining any intervening Projects, every expression is served:
  *
  *  - a grouping expression semantically equal to a registered group
  *    key → the MV's dim column;
  *  - `date_trunc(g, timeExpr)` with the MV grain REFINING g in the
  *    grain-alignment DAG → `date_trunc(g, mv.period)` (sound exactly
  *    when every g-boundary is an mv-grain boundary, so truncating the
  *    truncated value equals truncating the original; the DAG encodes
  *    the one subtlety — WEEK is day-aligned but month boundaries are
  *    not week boundaries, so a month-grain MV cannot serve week
  *    queries while a day-grain one serves both);
  *  - `sum(x)` → `sum(mv.sum_x)`, `min`/`max` likewise (re-aggregable),
  *    `count(lit)` → `coalesce(sum(mv.cnt), 0)` (the coalesce preserves
  *    count-over-empty = 0 for global aggregates; a bare sum would turn
  *    it into NULL);
  *  - Filter conditions referencing only served expressions (dim
  *    filters ride along; a filter on a non-dim column disqualifies).
  *
  * Anything else — `count(distinct)` (not re-aggregable), `avg` over a
  * nullable column (the MV count can't see per-column nulls), finer
  * grains, unregistered columns — leaves the plan untouched: the rule
  * either proves every reference lands on the MV relation or bails.
  * Output attribute ids/names are preserved (each result expression is
  * re-aliased under its original `exprId`), so parent operators above
  * the Aggregate never notice the swap.
  *
  * The freshness contract is the registrant's (as in every MV system):
  * register AFTER the MV is (re)built; `MvCatalog.unregister` before
  * backfilling. Registered through `injectOptimizerRule`
  * ([[graft.GraftExtensions]]), so SQL-surface and Column-API plans
  * both rewrite; idempotent because the rewritten plan scans the MV
  * path, which no longer matches the registration's raw path. */
object MvRewrite extends Rule[LogicalPlan] {

  /** User-facing MV registration: expressions as Columns over `raw`
    * (which may be a derived frame, e.g. the events table with its
    * nanos→timestamp conversion — the registration inlines it to the
    * scan exactly like the rule inlines query plans). */
  case class MvDef(
      name: String,
      mvPath: String,
      groupKeys: Seq[(Column, String)],
      timeKey: Option[(Column, String, String)], // (expr, mvCol, grain)
      sums: Seq[(Column, String)] = Nil,
      mins: Seq[(Column, String)] = Nil,
      maxs: Seq[(Column, String)] = Nil,
      countCol: Option[String] = None)

  private case class Registered(
      name: String,
      rawPath: String,
      scanAttrByName: Map[String, AttributeReference],
      groupKeys: Seq[(Expression, String)],
      timeKey: Option[(Expression, String, String)], // grain (canonical)
      aggKeys: Seq[(Expression, String, String)], // (expr, kind, mvCol)
      countCol: Option[String],
      mvRel: LogicalRelation)

  /** Grain-alignment DAG: `date_trunc(g, date_trunc(g', ts)) ==
    * date_trunc(g, ts)` iff every g-boundary is a g'-boundary, i.e. g
    * is reachable from g' along the refinement edges below. This is a
    * partial order, NOT a total one: WEEK is day-aligned but month
    * boundaries are not week boundaries, so a week-grain MV serves
    * only week queries and a month-grain MV cannot serve week. */
  private val grainSynonyms = Map(
    "DD" -> "DAY", "MON" -> "MONTH", "MM" -> "MONTH",
    "YYYY" -> "YEAR", "YY" -> "YEAR")
  private val grainCoarser: Map[String, Seq[String]] = Map(
    "MICROSECOND" -> Seq("MILLISECOND"),
    "MILLISECOND" -> Seq("SECOND"),
    "SECOND" -> Seq("MINUTE"), "MINUTE" -> Seq("HOUR"),
    "HOUR" -> Seq("DAY"), "DAY" -> Seq("WEEK", "MONTH"),
    "WEEK" -> Seq(), "MONTH" -> Seq("QUARTER"),
    "QUARTER" -> Seq("YEAR"), "YEAR" -> Seq())
  private def canonicalGrain(g: String): Option[String] = {
    val u = g.toUpperCase
    val c = grainSynonyms.getOrElse(u, u)
    if (grainCoarser.contains(c)) Some(c) else None
  }
  /** True when a `mvGrain`-truncated column can serve a `queryGrain`
    * truncation (mvGrain refines queryGrain in the DAG). */
  private def grainServable(mvGrain: String, queryGrain: String): Boolean = {
    if (mvGrain == queryGrain) true
    else {
      var frontier = grainCoarser(mvGrain)
      var seen = Set(mvGrain)
      while (frontier.nonEmpty) {
        if (frontier.contains(queryGrain)) return true
        seen ++= frontier
        frontier = frontier.flatMap(grainCoarser(_)).distinct
          .filterNot(seen)
      }
      false
    }
  }

  object MvCatalog {
    // normalized raw path -> registration (one MV per raw table; the
    // last registration wins, which is also the refresh semantics)
    private[MvRewrite] val byPath = TrieMap.empty[String, Registered]

    def register(spark: SparkSession, raw: DataFrame, rawPath: String,
                 d: MvDef): Unit = {
      val grain = d.timeKey.map(t => canonicalGrain(t._3)
        .getOrElse(sys.error(s"unknown grain ${t._3}")))
      // The time key is analyzed UNDER date_trunc, exactly as queries
      // use it, then the inner operand is extracted — the analyzer may
      // wrap the column (cast to timestamp, nanos→micros conversion)
      // and a bare-column registration would never semantically match
      // the wrapped query expression.
      val timeProbe = d.timeKey.map { case (c, _, g) =>
        org.apache.spark.sql.functions.date_trunc(g, c)
      }
      val exprCols =
        d.groupKeys.map(_._1) ++ timeProbe.toSeq ++
          d.sums.map(_._1) ++ d.mins.map(_._1) ++ d.maxs.map(_._1)
      // optimizedPlan, not analyzed: the rule compares against QUERY
      // expressions that have been through the operator-optimization
      // fixpoint (SimplifyCasts, constant folding, ...) — registering
      // the un-simplified form would miss e.g. a no-op cast the
      // optimizer strips (floor already returns LONG, so
      // floor(x).cast("long") loses its Cast in the query plan)
      val analyzed = raw.select(exprCols: _*).queryExecution.optimizedPlan
      val (inlined, filters, scan) = inlineToScan(analyzed) match {
        case Some((Some(list), f, s)) => (list, f, s)
        case _ => sys.error("MV registration frame must be " +
          "projections over one parquet scan")
      }
      require(filters.isEmpty, "MV registration frame must be unfiltered")
      val exprs = inlined.map {
        case Alias(e, _) => e
        case e => e
      }
      val (gk, rest0) = exprs.splitAt(d.groupKeys.size)
      val (tk, rest1) = rest0.splitAt(d.timeKey.size)
      val (sk, rest2) = rest1.splitAt(d.sums.size)
      val (mk, xk) = rest2.splitAt(d.mins.size)
      val mvRel = spark.read.parquet(d.mvPath).queryExecution.analyzed
        .collectFirst { case lr: LogicalRelation => lr }
        .getOrElse(sys.error(s"MV path ${d.mvPath} is not a parquet scan"))
      val mvCols = d.groupKeys.map(_._2) ++ d.timeKey.map(_._2).toSeq ++
        d.sums.map(_._2) ++ d.mins.map(_._2) ++ d.maxs.map(_._2) ++
        d.countCol.toSeq
      val mvNames = mvRel.output.map(_.name.toLowerCase).toSet
      mvCols.foreach(c => require(mvNames.contains(c.toLowerCase),
        s"MV table lacks column $c"))
      val timeInner = tk.headOption.map {
        case TruncTimestamp(_, inner, _) => inner
        case e => sys.error(s"time key did not analyze to date_trunc: $e")
      }
      val reg = Registered(
        d.name, normalize(rawPath),
        scan.output.map(a => a.name.toLowerCase -> a).toMap,
        gk.zip(d.groupKeys.map(_._2)),
        timeInner.map(e => (e, d.timeKey.get._2, grain.get)),
        sk.zip(d.sums).map { case (e, (_, c)) => (e, "sum", c) } ++
          mk.zip(d.mins).map { case (e, (_, c)) => (e, "min", c) } ++
          xk.zip(d.maxs).map { case (e, (_, c)) => (e, "max", c) },
        d.countCol, mvRel)
      byPath.put(reg.rawPath, reg)
      sources.put(reg.rawPath, (rawPath, d))
    }

    def unregister(rawPath: String): Unit = {
      byPath.remove(normalize(rawPath))
      sources.remove(normalize(rawPath))
      watches.remove(normalize(rawPath)): Unit
    }
    def clear(): Unit = { byPath.clear(); sources.clear(); watches.clear() }
    def isEmpty: Boolean = byPath.isEmpty

    // the user-facing registration inputs, kept for [[save]]
    private val sources = TrieMap.empty[String, (String, MvDef)]

    // ---- commit-history staleness hooks --------------------------------
    // rawPath -> (historyDir, table, commit version the MV was built
    // at). The sink's `_history/` log (SinkRouter.recordCommit) is the
    // invalidation signal: a landed batch on the watched table bumps
    // the version past the bound one, the rewrite rule stops serving
    // the MV (queries silently fall back to raw — still correct, just
    // unaccelerated), and [[refresh]] rebuilds + re-binds. This is the
    // ClickHouse-MV freshness contract expressed through the commit
    // log instead of synchronous MV maintenance.
    private val watches = TrieMap.empty[String, (String, String, Long)]

    /** Bind `rawPath`'s MV freshness to the newest `_history/` commit
      * naming `table` (call right after building/refreshing the MV). */
    def watchCommits(rawPath: String, historyDir: String,
                     table: String): Unit = {
      watches.put(normalize(rawPath),
        (historyDir, table, latestCommitFor(historyDir, table))): Unit
    }

    /** True when a commit for the watched table landed after the MV was
      * bound. Unwatched registrations are never stale (explicit-refresh
      * contract, the pre-hook behavior). */
    private[MvRewrite] def isStale(rawPath: String): Boolean =
      watches.get(normalize(rawPath)).exists {
        case (dir, table, bound) => latestCommitFor(dir, table) > bound
      }

    /** Newest commit version naming `table` (0 when none) — shared
      * with the result cache via [[graft.sinks.SinkRouter.latestCommit]]. */
    private def latestCommitFor(historyDir: String, table: String): Long =
      graft.sinks.SinkRouter.latestCommit(historyDir, table)

    /** Rebuild the MV for `rawPath` from its registered definition
      * (groupKeys + date_trunc(timeKey) + sums/mins/maxs/count over the
      * CURRENT raw table), overwrite the MV table, re-register, and
      * re-bind the freshness watch. Call on a cadence or when
      * [[isStale]]; queries served in between fall back to raw. */
    def refresh(spark: SparkSession): Unit =
      sources.keys.foreach(p => refreshOne(spark, p))

    /** Refresh exactly the registrations whose watched table has a
      * commit newer than the one the MV was built at — the cadence
      * hook a maintenance loop calls (the soak harness drives it per
      * micro-batch). Unwatched registrations are untouched (their
      * contract is explicit refresh). Returns the refreshed raw
      * paths. */
    def refreshStale(spark: SparkSession): Seq[String] = {
      val stale = sources.keys.filter(isStale).toSeq
      stale.foreach(p => refreshOne(spark, p))
      stale
    }

    def refreshOne(spark: SparkSession, rawPath: String): Unit = {
      import org.apache.spark.sql.functions._
      val key = normalize(rawPath)
      val (origPath, d) = sources.getOrElse(key,
        sys.error(s"no MV registered for $rawPath"))
      val raw = spark.read.parquet(origPath)
      val keys = d.groupKeys.map { case (c, n) => c.as(n) } ++
        d.timeKey.map { case (c, n, g) => date_trunc(g, c).as(n) }.toSeq
      val aggs = d.sums.map { case (c, n) => sum(c).as(n) } ++
        d.mins.map { case (c, n) => min(c).as(n) } ++
        d.maxs.map { case (c, n) => max(c).as(n) } ++
        d.countCol.map(n => count(lit(1)).as(n)).toSeq
      raw.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
        .write.mode("overwrite").parquet(d.mvPath)
      register(spark, raw, origPath, d)
      watches.get(key).foreach { case (dir, table, _) =>
        watchCommits(origPath, dir, table)
      }
    }

    /** Persist every registration as re-derivable JSON (expressions as
      * their SQL renderings) — the catalog file a restarted session
      * [[load]]s so MV serving survives driver restarts, the ClickHouse
      * analogue being that MVs live in the server catalog. The MV DATA
      * is already durable (it is a table); only the mapping needs a
      * file. */
    def save(file: String): Unit = {
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = m.createArrayNode()
      sources.values.foreach { case (rawPath, d) =>
        val o = root.addObject()
        o.put("name", d.name)
        o.put("rawPath", rawPath)
        o.put("mvPath", d.mvPath)
        def pairs(n: String, xs: Seq[(Column, String)]): Unit = {
          val a = o.putArray(n)
          xs.foreach { case (c, mc) =>
            val e = a.addArray()
            e.add(org.apache.spark.sql.graftshim.expressionTree(c).sql)
            e.add(mc)
          }
        }
        pairs("groupKeys", d.groupKeys)
        d.timeKey.foreach { case (c, mc, g) =>
          val a = o.putArray("timeKey")
          a.add(org.apache.spark.sql.graftshim.expressionTree(c).sql)
          a.add(mc); a.add(g)
        }
        pairs("sums", d.sums)
        pairs("mins", d.mins)
        pairs("maxs", d.maxs)
        d.countCol.foreach(o.put("countCol", _))
      }
      java.nio.file.Files.writeString(java.nio.file.Paths.get(file),
        m.writerWithDefaultPrettyPrinter().writeValueAsString(root))
    }

    /** Re-register every definition from a [[save]]d catalog file.
      * `frameFor` rebuilds the registration frame per raw path —
      * default a plain parquet read; pass a custom builder when the
      * registration was over a derived frame (e.g. the events table's
      * nanos→timestamp conversion). */
    def load(spark: SparkSession, file: String,
             frameFor: String => DataFrame = null): Unit = {
      val frames: String => DataFrame =
        Option(frameFor).getOrElse(p => spark.read.parquet(p))
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = m.readTree(java.nio.file.Files.readString(
        java.nio.file.Paths.get(file)))
      import scala.jdk.CollectionConverters._
      root.elements().asScala.foreach { o =>
        def pairs(n: String): Seq[(Column, String)] =
          Option(o.get(n)).map(_.elements().asScala.map(e =>
            (org.apache.spark.sql.functions.expr(e.get(0).asText()),
              e.get(1).asText())).toSeq).getOrElse(Nil)
        val tk = Option(o.get("timeKey")).map(a =>
          (org.apache.spark.sql.functions.expr(a.get(0).asText()),
            a.get(1).asText(), a.get(2).asText()))
        register(spark, frames(o.get("rawPath").asText()),
          o.get("rawPath").asText(),
          MvDef(o.get("name").asText(), o.get("mvPath").asText(),
            pairs("groupKeys"), tk, pairs("sums"), pairs("mins"),
            pairs("maxs"),
            Option(o.get("countCol")).map(_.asText())))
      }
    }
  }

  private def normalize(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath

  private def scanPaths(lr: LogicalRelation): Seq[String] = lr.relation match {
    case h: HadoopFsRelation => h.location.rootPaths.map(_.toUri.getPath)
    case _ => Nil
  }

  /** Walk Project/Filter chains down to a single parquet scan, inlining
    * project aliases so every returned expression references scan
    * attributes only. Returns (visible expressions aligned with
    * `p.output` — None when the top node IS the scan, filter conjuncts
    * over scan attrs, scan). */
  private def inlineToScan(p: LogicalPlan)
      : Option[(Option[Seq[Expression]], Seq[Expression], LogicalRelation)] = {
    def substVia(vis: Option[Seq[Expression]],
                 below: LogicalPlan)(e: Expression): Expression =
      vis match {
        case Some(v) =>
          val am = AttributeMap(
            below.output.zip(v).map { case (a, x) => a -> x })
          e.transformUp { case a: Attribute => am.getOrElse(a, a) }
        case None => e
      }
    p match {
      case lr: LogicalRelation => Some((None, Nil, lr))
      case Project(list, child) =>
        inlineToScan(child).flatMap { case (vis, fs, lr) =>
          val s = substVia(vis, child) _
          val inlined = list.map {
            case Alias(e, _) => s(e)
            case a: AttributeReference => s(a)
            case _ => return None
          }
          Some((Some(inlined), fs, lr))
        }
      case Filter(cond, child) =>
        inlineToScan(child).map { case (vis, fs, lr) =>
          // Filter is transparent to names: visible exprs unchanged
          (vis, fs :+ substVia(vis, child)(cond), lr)
        }
      case _ => None
    }
  }

  private case object Bail extends Exception { override def fillInStackTrace(): Throwable = this }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (MvCatalog.isEmpty) plan
    else plan.transform {
      case agg: Aggregate => tryRewrite(agg).getOrElse(agg)
    }

  private def tryRewrite(agg: Aggregate): Option[Aggregate] = try {
    val (vis, filters, scan) = inlineToScan(agg.child) match {
      case Some(x) => x
      case None => return None
    }
    val reg = scanPaths(scan).flatMap(MvCatalog.byPath.get) match {
      case Seq(r) => r
      case _ => return None
    }
    // freshness: a commit on the watched raw table after the MV was
    // bound means the MV is missing rows — serve from raw instead
    if (MvCatalog.isStale(reg.rawPath)) return None
    // query scan attr -> registration scan attr (by name), so query
    // expressions can be compared semantically against registered ones
    val q2r: Map[ExprId, AttributeReference] = scan.output.flatMap(a =>
      reg.scanAttrByName.get(a.name.toLowerCase).map(a.exprId -> _)).toMap
    if (q2r.size != scan.output.size) return None
    def toReg(e: Expression): Expression = e.transformUp {
      case a: AttributeReference => q2r.getOrElse(a.exprId, a)
    }
    val visMap = vis.map(v => AttributeMap(
      agg.child.output.zip(v).map { case (a, e) => a -> e }))
    def inline(e: Expression): Expression = visMap match {
      case Some(am) => e.transformUp {
        case a: Attribute => am.getOrElse(a, a)
      }
      case None => e
    }
    val mvRel = reg.mvRel.newInstance()
    val mvAttr: Map[String, Attribute] =
      mvRel.output.map(a => a.name.toLowerCase -> a).toMap
    def mv(c: String): Attribute = mvAttr(c.toLowerCase)
    def findGroup(e: Expression): Option[Attribute] = {
      val er = toReg(e)
      reg.groupKeys.collectFirst {
        case (ge, c) if er.semanticEquals(ge) => mv(c)
      }
    }
    def findAgg(e: Expression, kind: String): Option[Attribute] = {
      val er = toReg(e)
      reg.aggKeys.collectFirst {
        case (ae, k, c) if k == kind && er.semanticEquals(ae) => mv(c)
      }
    }
    def rw(e: Expression): Expression = e match {
      case ae @ AggregateExpression(f, _, false, None, _) =>
        f match {
          case s @ Sum(child, _) =>
            val a = findAgg(child, "sum").getOrElse(throw Bail)
            ae.copy(aggregateFunction =
              s.withNewChildren(Seq(a)).asInstanceOf[AggregateFunction])
          case mn @ Min(child) =>
            val a = findAgg(child, "min").getOrElse(throw Bail)
            ae.copy(aggregateFunction = Min(a))
          case mx @ Max(child) =>
            val a = findAgg(child, "max").getOrElse(throw Bail)
            ae.copy(aggregateFunction = Max(a))
          case Count(Seq(_: Literal)) =>
            val c = reg.countCol.getOrElse(throw Bail)
            // count over no rows is 0, sum over no rows is NULL — the
            // coalesce keeps global aggregates over an empty table exact
            Coalesce(Seq(
              ae.copy(aggregateFunction = Sum(mv(c))),
              Literal(0L)))
          case _ => throw Bail
        }
      case e if findGroup(e).isDefined => findGroup(e).get
      case TruncTimestamp(fmt @ Literal(f: UTF8String, StringType),
          inner, tz) =>
        val qGrain = canonicalGrain(f.toString)
        reg.timeKey match {
          case Some((te, c, mvGrain))
              if qGrain.exists(grainServable(mvGrain, _)) &&
                toReg(inner).semanticEquals(te) =>
            TruncTimestamp(fmt, mv(c), tz)
          case _ => e.mapChildren(rw)
        }
      case _ => e.mapChildren(rw)
    }
    val geNew = agg.groupingExpressions.map(g => rw(inline(g)))
    val aeNew = agg.aggregateExpressions.map { ne =>
      val core = rw(inline(ne match {
        case Alias(e, _) => e
        case e => e
      }))
      Alias(core, ne.name)(ne.exprId, ne.qualifier)
    }
    val fNew = filters.map(rw)
    val refs = AttributeSet((geNew ++ aeNew ++ fNew).flatMap(_.references))
    if (!refs.subsetOf(mvRel.outputSet)) return None
    val newChild =
      if (fNew.isEmpty) mvRel
      else Filter(fNew.reduce(And), mvRel)
    logInfo(s"MvRewrite: aggregate over ${reg.rawPath} served by " +
      s"MV '${reg.name}'")
    Some(Aggregate(geNew, aeNew, newChild))
  } catch {
    case Bail => None
  }
}

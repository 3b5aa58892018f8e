package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The interactive SQL surface — SURVEY §2.7 L1–L3 (ref
  * `webapps/console/pages/api/[workspaceId]/sql/query.ts:39-158`).
  *
  * Reference behavior: parse the user SQL, reject non-SELECT and
  * multi-statement input, check the table whitelist, clamp
  * `LIMIT min(userLimit, apiLimit)`, apply the offset, and number the
  * result rows from offset+1.
  *
  * Spark-first: parse with Catalyst's own parser (no second SQL dialect),
  * inspect the `LogicalPlan` — commands (DDL/DML/SET/...) surface as
  * `Command`/`ParsedStatement` nodes, so "is a SELECT" is a plan-shape
  * check, not string matching. The user's own LIMIT is read from the
  * outermost `GlobalLimit`; the clamp wraps the plan via `spark.sql` +
  * DataFrame limit (a `GlobalLimit` node Catalyst pushes down).
  */
object GuardedSql {

  val DefaultLimit = 50 // ref SQLQueryDefaultLimit query.ts:10

  case class SqlRejected(reason: String) extends Exception(reason)

  /** Parse + validate; returns the user's own LIMIT if present. */
  def validate(spark: SparkSession, sql: String,
               allowedTables: Set[String] = Set.empty): Option[Int] = {
    if (sql.trim.split(";").count(_.trim.nonEmpty) > 1)
      throw SqlRejected("multi-statement input is not allowed")
    val plan =
      try spark.sessionState.sqlParser.parsePlan(sql)
      catch { case e: Exception => throw SqlRejected(s"parse error: ${e.getMessage}") }
    plan.foreach {
      case _: Command | _: ParsedStatement | _: InsertIntoStatement =>
        throw SqlRejected("only SELECT queries are allowed")
      case _ =>
    }
    if (allowedTables.nonEmpty) {
      val refs = plan.collect {
        case u: UnresolvedRelation => u.multipartIdentifier.last.toLowerCase
      }
      val bad = refs.filterNot(allowedTables.map(_.toLowerCase))
      if (bad.nonEmpty)
        throw SqlRejected(s"table(s) not allowed: ${bad.mkString(", ")}")
    }
    plan match {
      case GlobalLimit(expr, _) => expr.foldable match {
        case true => Some(expr.eval().asInstanceOf[Number].intValue())
        case false => None
      }
      case _ => None
    }
  }

  /** Run a guarded query: validated, limit-clamped, row-numbered from
    * offset+1 (ref query.ts:78-83,124-158). The user's own LIMIT node is
    * stripped and replaced by the clamped offset+limit — the reference
    * rewrites the AST limit the same way. */
  def query(spark: SparkSession, sql: String, offset: Int = 0,
            apiLimit: Int = DefaultLimit,
            allowedTables: Set[String] = Set.empty): DataFrame = {
    val userLimit = validate(spark, sql, allowedTables)
    val effective = math.min(userLimit.getOrElse(apiLimit), apiLimit)
    val parsed = spark.sessionState.sqlParser.parsePlan(sql)
    val stripped = parsed match {
      case GlobalLimit(_, LocalLimit(_, child)) => child
      case GlobalLimit(_, child) => child
      case other => other
    }
    val df = org.apache.spark.sql.graftshim.ofRows(spark, stripped)
    val w = Window.orderBy(monotonically_increasing_id())
    df.limit(effective + offset)
      .withColumn("#", row_number().over(w) )
      .filter(col("`#`") > offset)
  }

  /** S8 schema introspection: {table -> [(name, type)]} (ref
    * `sql/schema.ts:38-64`). */
  def describeTables(spark: SparkSession): Map[String, Seq[(String, String)]] =
    spark.catalog.listTables().collect().map { t =>
      t.name -> spark.catalog.listColumns(t.name).collect()
        .map(c => (c.name, c.dataType)).toSeq
    }.toMap
}

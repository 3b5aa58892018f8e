package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Exercises the minimum end-to-end slice (SURVEY §7.3): events ->
    * envelope -> segment single-table layout -> billing active-events
    * report. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val envelope = sources.DriverEventsAdapter.load(spark, dir)
    val warehouse = operators.Layouts.segmentSingleTable(envelope)
    warehouse
      .groupBy(date_trunc("day", col("timestamp")).as("period"))
      .agg(countDistinct(col("message_id")).as("active_events"))
      .orderBy(col("period"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.allOracles
}

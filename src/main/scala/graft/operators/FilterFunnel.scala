package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequential filter-battery audit in ONE corpus pass.
  *
  * Curation pipelines publish a "filter funnel" — how many documents each
  * gate removed, in order (Gopher table A1, RefinedWeb fig. 2, Dolma's
  * per-tagger attrition counts). Computing it naively is one filtered
  * count per stage = N corpus scans; this operator evaluates the whole
  * ordered battery as a single `coalesce(when(!p1,...), when(!p2,...))`
  * projection, so each document is charged to the FIRST stage it fails
  * (sequential semantics: stage i only sees survivors of stages < i)
  * and the corpus is scanned exactly once.
  *
  * At 100 TB: [[audit]] is a pure map-side projection (whole-stage
  * codegen, no shuffle); [[funnel]] adds one aggregation whose output is
  * ≤ stages+1 rows, so the summary window over stage index is driver-tiny
  * by construction.
  */
object FilterFunnel {

  final val DropCol = "first_drop"
  final val SurvivedCol = "survived"

  /** Per-document verdict: `first_drop` = name of the first stage whose
    * pass-predicate is false (null for survivors), `survived` flag.
    * `stages` are (name, pass-predicate) in pipeline order; names must be
    * distinct. */
  def audit(df: DataFrame, stages: Seq[(String, Column)]): DataFrame = {
    require(stages.nonEmpty, "at least one stage")
    require(stages.map(_._1).distinct.size == stages.size,
      "stage names must be distinct")
    // null predicate = FAIL (a gate that cannot evaluate a doc should
    // drop it, not silently wave it through to the next stage)
    val firstDrop = coalesce(
      stages.map { case (name, pass) =>
        when(!coalesce(pass, lit(false)), lit(name))
      }: _*)
    df.withColumn(DropCol, firstDrop)
      .withColumn(SurvivedCol, col(DropCol).isNull)
  }

  /** Funnel table from an [[audit]] result: one row per stage, in order —
    * `dropped` (docs first killed here) and `remaining` (docs still alive
    * after this stage). `remaining` of the last row = survivor count.
    *
    * The distributed work is ONE aggregation over the corpus; its result
    * is ≤ stages+1 rows, so the cumulative-remaining arithmetic runs on
    * the collected counts (a bounded collect — no single-partition
    * window over an Exchange for a frame this size). */
  def funnel(audited: DataFrame, stageNames: Seq[String]): DataFrame = {
    val spark = audited.sparkSession
    import spark.implicits._
    val counts = audited.groupBy(col(DropCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    val total = counts.valuesIterator.sum
    var alive = total
    stageNames.zipWithIndex.map { case (name, i) =>
      val dropped = counts.getOrElse(Some(name), 0L)
      alive -= dropped
      (name, i + 1, dropped, alive)
    }.toDF("stage", "stage_idx", "dropped", "remaining")
  }
}

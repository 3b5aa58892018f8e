package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Generation-eval overlap metrics: ROUGE-N (distinct n-gram recall /
  * precision / F1) between candidate and reference text pairs — the
  * eval-harness step a training pipeline runs over model outputs vs
  * gold references (Lin 2004, ROUGE; the distinct-n-gram variant so
  * set arithmetic — not multiset clipping — defines the overlap, which
  * keeps every count SQL-replayable).
  *
  * Pure per-row column math: both shingle sets come from the codegen'd
  * [[graft.functions.expressions.WordShingles]] pass, the overlap is
  * `array_intersect`, and the three ratios are exact integer divisions
  * rounded for display. No shuffle, no UDF — a 100 TB eval sweep is one
  * map-only scan.
  */
object EvalMetrics {

  /** `pairs`: one row per (candidate, reference) pair. Appends
    * n_cand / n_ref / n_overlap counts and recall / precision / f1. */
  def rougeN(pairs: DataFrame, candCol: String, refCol: String,
             n: Int = 2): DataFrame = {
    val ratio = (num: org.apache.spark.sql.Column,
                 den: org.apache.spark.sql.Column) =>
      when(den === 0, lit(0.0))
        .otherwise(round(num.cast("double") / den, 6))
    pairs
      .withColumn("_c", TextFunctions.shingles(col(candCol), n))
      .withColumn("_r", TextFunctions.shingles(col(refCol), n))
      .withColumn("n_cand", size(col("_c")).cast("long"))
      .withColumn("n_ref", size(col("_r")).cast("long"))
      .withColumn("n_overlap",
        size(array_intersect(col("_c"), col("_r"))).cast("long"))
      .withColumn("recall", ratio(col("n_overlap"), col("n_ref")))
      .withColumn("precision", ratio(col("n_overlap"), col("n_cand")))
      // F1 = 2PR/(P+R) = 2·overlap/(n_cand+n_ref) on distinct sets
      .withColumn("f1",
        ratio(col("n_overlap") * 2, col("n_cand") + col("n_ref")))
      .drop("_c", "_r")
  }
}

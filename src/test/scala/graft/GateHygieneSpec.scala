package graft

import org.apache.spark.sql.functions._

/** Gate-output hygiene: no gate may emit control characters in any
  * output value. The driver's correctness check canonicalizes rows
  * line-by-line before hashing, so a raw `\n` (or `\r`, NUL, ...)
  * inside a VALUE breaks its hash even when every value is correct —
  * exactly what happened to `td_sft_assemble` in round 11 (its
  * transcript joined turns with `\n`; the values matched DuckDB but
  * the driver's row hash did not). This spec turns that hazard class
  * into a CI failure: every gate runs on the sf0.001 slice and every
  * output column (nested values included, via a string cast) is
  * scanned for `[\x00-\x1F\x7F]`.
  *
  * Cost control: this is one aggregation per gate (`max(rlike)` per
  * column folded into a single row), on the smallest scale factor —
  * the scan rides each gate's own plan, nothing is collected.
  */
class GateHygieneSpec extends GraftSpec {
  import spark.implicits._

  // The all-gates sweep below runs 332 gate plans in ONE test — the
  // longest legitimate test in the repo (~10 min with parallel-group
  // siblings competing for cores). 30 min still catches a true wedge while
  // never failing a merely-slow sweep; the suite is also pinned to a
  // private JVM group in build.sbt so siblings don't starve it.
  override val timeLimit: org.scalatest.time.Span =
    org.scalatest.time.Span(1800, org.scalatest.time.Seconds)

  // every C0 control char plus DEL; matched against the string CAST of
  // each column so strings nested in arrays/structs/maps are covered too
  private val ctrl = "[\\x00-\\x1F\\x7F]"

  /** Columns of `df` whose string cast contains a control character in
    * any row — the detector the sweep below runs per gate. */
  private def ctrlOffendingCols(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val flags = df.columns.map(c =>
      max(coalesce(col(c).cast("string").rlike(ctrl), lit(false)))
        .as(c))
    val row = df.agg(flags.head, flags.tail.toIndexedSeq: _*).collect()
    if (row.isEmpty) Seq.empty
    else df.columns.filter(c => row.head.getAs[Boolean](c)).toSeq
  }

  test("planted violations fire: the detector sees top-level, nested, and \\r control chars — and stays quiet on clean frames") {
    // the exact round-11 failure shape: a newline inside a VALUE
    val topLevel = Seq((1L, "a\nb"), (2L, "ok")).toDF("id", "transcript")
    assert(ctrlOffendingCols(topLevel) == Seq("transcript"),
      "detector missed a top-level \\n")
    // nested inside an array column (covered via the string cast)
    val nested = Seq((1L, Seq("clean", "tab\there"))).toDF("id", "turns")
    assert(ctrlOffendingCols(nested) == Seq("turns"),
      "detector missed a \\t nested in an array")
    // \r and NUL count too
    assert(ctrlOffendingCols(Seq(("x\rx")).toDF("v")) == Seq("v"))
    assert(ctrlOffendingCols(Seq(("x\u0000x")).toDF("v")) == Seq("v"))
    // a clean frame (spaces, unicode, punctuation) must NOT fire
    val clean = Seq((1L, "hello | world", "café ok"))
      .toDF("id", "a", "b")
    assert(ctrlOffendingCols(clean).isEmpty, "false positive on clean data")
    // and an empty frame is quiet, not an error
    assert(ctrlOffendingCols(clean.limit(0)).isEmpty)
  }

  test("no gate output value contains control characters (sf0.001)") {
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val df =
        try fn(spark, sf)
        catch { case e: Throwable =>
          fail(s"gate $name failed to build at sf0.001: ${e.getMessage}")
        }
      val bad = ctrlOffendingCols(df)
      if (bad.nonEmpty)
        offenders += s"$name(${bad.mkString(",")})"
    }
    assert(offenders.isEmpty,
      s"gates emitting control characters in output values: " +
        offenders.mkString("; "))
  }
}

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

  // every C0 control char plus DEL; matched against the string CAST of
  // each column so strings nested in arrays/structs/maps are covered too
  private val ctrl = "[\\x00-\\x1F\\x7F]"

  test("no gate output value contains control characters (sf0.001)") {
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val df =
        try fn(spark, sf)
        catch { case e: Throwable =>
          fail(s"gate $name failed to build at sf0.001: ${e.getMessage}")
        }
      val flags = df.columns.map(c =>
        max(coalesce(col(c).cast("string").rlike(ctrl), lit(false)))
          .as(c))
      val row = df.agg(flags.head, flags.tail.toIndexedSeq: _*).collect()
      if (row.nonEmpty) {
        val bad = df.columns.filter(c =>
          row.head.getAs[Boolean](c))
        if (bad.nonEmpty)
          offenders += s"$name(${bad.mkString(",")})"
      }
    }
    assert(offenders.isEmpty,
      s"gates emitting control characters in output values: " +
        offenders.mkString("; "))
  }
}

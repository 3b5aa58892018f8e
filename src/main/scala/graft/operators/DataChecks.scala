package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks — the dbt-test / Great-Expectations
  * family re-expressed as Spark aggregates: each check reduces a table
  * (or a child/parent pair) to ONE violation count, and [[run]] unions
  * the counts into a single small report frame. A pipeline gates a
  * batch promotion on `violations == 0` rows.
  *
  * At 100 TB each check is the cheapest plan that answers it: null/range
  * checks are a single map-side-combinable conditional count (one scan,
  * no shuffle of passing rows); uniqueness is a two-phase count per key
  * with only key+count rows shuffling; referential integrity is a
  * left-anti join that shuffles only the key columns (or broadcasts the
  * parent when it fits). Checks on the same table still scan it once
  * each — callers batching many per-row checks on one table should
  * compose them into one [[expression]] call (conditional counts share
  * the scan).
  */
object DataChecks {

  /** Rows where any of `cols` is null. */
  def notNull(df: DataFrame, cols: Seq[String], name: String): (String, DataFrame) =
    name -> df.select(
      count(when(cols.map(c => col(c).isNull).reduce(_ || _), 1))
        .as("violations"))

  /** Rows in excess of one per distinct key tuple (0 iff key is unique;
    * null-keyed rows count as violations — a primary key is non-null). */
  def unique(df: DataFrame, keyCols: Seq[String], name: String): (String, DataFrame) = {
    val nullKey = keyCols.map(c => col(c).isNull).reduce(_ || _)
    val dups = df.filter(!nullKey)
      .groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("n"))
      .select(sum(col("n") - 1).as("v"))
    val nulls = df.select(count(when(nullKey, 1)).as("nv"))
    name -> dups.crossJoin(nulls)
      .select((coalesce(col("v"), lit(0L)) + col("nv")).as("violations"))
  }

  /** Non-null child keys with no matching parent row. */
  def referential(child: DataFrame, childKey: String,
                  parent: DataFrame, parentKey: String,
                  name: String): (String, DataFrame) =
    name -> child.select(col(childKey)).filter(col(childKey).isNotNull)
      .join(parent.select(col(parentKey).as(childKey)),
        Seq(childKey), "left_anti")
      .select(count(lit(1)).as("violations"))

  /** Rows violating an arbitrary boolean expression (true = pass). */
  def expression(df: DataFrame, pass: Column, name: String): (String, DataFrame) =
    name -> df.select(count(when(!coalesce(pass, lit(false)), 1))
      .as("violations"))

  /** Order-independent table checksum — the cross-warehouse sync
    * verification primitive (did every row land, byte-for-byte, after a
    * bulker-style load?): canonical per-row digest (column values joined
    * on U+0001, nulls as U+0000, md5, top 60 bits as an integer) folded
    * with BOTH an XOR and an exact 128-bit-safe SUM — two independent
    * commutative digests plus the row count make collisions by
    * rearrangement or pairwise cancellation implausible, and commutative
    * folds need no global sort: one map pass, partial aggregation, a
    * few-bytes result per table regardless of size. Engine-exact (the
    * gate replays it in DuckDB), so the SAME checksum can be computed by
    * the warehouse itself in SQL and compared against the pipeline's.
    * Restrict `cols` to int/string columns — float/timestamp→string
    * rendering differs across engines. */
  def tableChecksum(df: DataFrame, cols: Seq[String],
                    label: String): DataFrame = {
    val repr = concat_ws("\u0001",
      cols.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*)
    val v = conv(substring(md5(repr), 1, 15), 16, 10).cast("long")
    df.select(v.as("_v"))
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(_v)").as("xor_sig"),
        sum(col("_v").cast("decimal(38,0)")).as("sum_sig"))
      .select(lit(label).as("tbl"), col("n_rows"), col("xor_sig"),
        col("sum_sig"))
  }

  /** Union the per-check scalar frames into one (check_name, violations)
    * report, ordered by check name. ("check" is an ANSI reserved word —
    * the column name keeps the report portable across SQL engines.) */
  def run(checks: (String, DataFrame)*): DataFrame =
    checks.map { case (name, cnt) =>
      cnt.select(lit(name).as("check_name"),
        col("violations").cast("long").as("violations"))
    }.reduce(_ unionByName _).orderBy(col("check_name"))
}

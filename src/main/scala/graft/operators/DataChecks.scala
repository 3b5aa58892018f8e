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

  /** Functional-dependency audit — the schema-profiling question "does
    * X determine Y in the data?" (candidate-key discovery, denormalized
    * snapshot validation, dimension-integrity checks before an SCD
    * merge). Returns one row: determinant groups, groups where the
    * dependent takes more than one value, and the rows inside those
    * violating groups. One hash aggregation over the determinant key —
    * map-side combine, no window, no sort. */
  def functionalDependency(df: DataFrame, determinant: Seq[String],
                           dependent: String, name: String): DataFrame =
    df.groupBy(determinant.map(col): _*)
      .agg(countDistinct(col(dependent)).as("_nd"),
        count(lit(1)).as("_n"))
      .agg(count(lit(1)).as("n_groups"),
        sum(when(col("_nd") > 1, 1L).otherwise(0L))
          .as("n_violating_groups"),
        sum(when(col("_nd") > 1, col("_n")).otherwise(0L))
          .as("n_rows_in_violations"))
      .select(lit(name).as("dependency"), col("n_groups"),
        col("n_violating_groups"), col("n_rows_in_violations"))

  /** Merkle-style cross-warehouse reconciliation — WHICH rows differ,
    * without shipping either table (the repair step after
    * [[tableChecksum]] says the tables diverged; the rsync /
    * DynamoDB-cross-region shape at table scale).
    *
    * Two phases:
    *  1. Both sides fold into `nBuckets` per-bucket digests (bucket =
    *     md5 of the key, digest = the checksum triple per bucket) — one
    *     map pass + a shuffle of nBuckets rows per side, bytes-sized
    *     regardless of table size.
    *  2. Only rows whose bucket digests DISAGREE (a bounded driver-side
    *     list, ≤ nBuckets ids — the probe-dates precedent) join
    *     key-to-key and classify as missing_in_replica /
    *     missing_in_source / value_mismatch.
    *
    * With d differing rows spread over b' ≤ min(d, nBuckets) buckets,
    * phase 2 reads ~ b'/nBuckets of each table and joins only that
    * slice: the cost of finding a 100-row drift in a 100 TB table is a
    * full scan (unavoidable — any row might differ) but only a
    * 100-row-scale JOIN, not a table-to-table one. Size `nBuckets` ≫
    * expected drift so differing buckets stay sparse.
    *
    * Keys are assumed unique per side (it reconciles loaded tables, not
    * event streams). `valueCols` restricted to int/string columns — the
    * [[tableChecksum]] cross-engine rendering rule. */
  def bucketDiff(source: DataFrame, replica: DataFrame,
                 keyCols: Seq[String], valueCols: Seq[String],
                 nBuckets: Int = 1024): DataFrame = {
    def repr(cols: Seq[String]) = concat_ws("\u0001",
      cols.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*)
    def withDigests(df: DataFrame) = df
      .withColumn("_bucket",
        pmod(conv(substring(md5(repr(keyCols)), 1, 15), 16, 10)
          .cast("long"), lit(nBuckets.toLong)))
      .withColumn("_row_sig",
        conv(substring(md5(repr(keyCols ++ valueCols)), 1, 15), 16, 10)
          .cast("long"))
    val s = withDigests(source)
    val r = withDigests(replica)
    def bucketSums(df: DataFrame) = df.groupBy(col("_bucket"))
      .agg(count(lit(1)).as("_n"), expr("bit_xor(_row_sig)").as("_x"),
        sum(col("_row_sig").cast("decimal(38,0)")).as("_s"))
    // bounded collect: ≤ nBuckets ids, by construction
    val diffBuckets = bucketSums(s).alias("a")
      .join(bucketSums(r).alias("b"), Seq("_bucket"), "full_outer")
      .filter(col("a._n").isNull || col("b._n").isNull ||
        col("a._n") =!= col("b._n") || col("a._x") =!= col("b._x") ||
        col("a._s") =!= col("b._s"))
      .select(col("_bucket")).collect().map(_.getLong(0))
    val keyExprs = keyCols.map(col)
    val sd = s.filter(col("_bucket").isin(diffBuckets: _*))
      .select(keyExprs :+ col("_row_sig").as("_sig_src"): _*)
    val rd = r.filter(col("_bucket").isin(diffBuckets: _*))
      .select(keyExprs :+ col("_row_sig").as("_sig_rep"): _*)
    sd.join(rd, keyCols, "full_outer")
      .withColumn("status",
        when(col("_sig_rep").isNull, "missing_in_replica")
          .when(col("_sig_src").isNull, "missing_in_source")
          .when(col("_sig_src") =!= col("_sig_rep"), "value_mismatch"))
      .filter(col("status").isNotNull)
      .select(keyExprs :+ col("status"): _*)
  }

  /** Population Stability Index between two corpus snapshots — the
    * standard distribution-drift audit a pipeline runs before accepting
    * a refreshed dataset (credit-scoring lineage; PSI > 0.2 is the
    * conventional "significant shift" flag). `edges` define ascending
    * value buckets (value <= edge; one overflow bucket above the last);
    * each side's bucket share is held in exact integer micro units
    * (zero-count buckets floor to 1 row, the standard epsilon) and the
    * per-bucket term
    *
    *   (p_a − p_b) · ln(p_a / p_b)
    *
    * is emitted PER BUCKET, rounded to 6 dp — the only float is the
    * final ln (the [[graft.operators.Collocations]] ln-only precedent),
    * and no cross-bucket float sum happens inside the gated frame
    * (callers total the handful of buckets). Output: (bucket, edge,
    * n_a, n_b, pa_micro, pb_micro, psi_term).
    *
    * Scale shape: one partial-aggregating scan per side down to
    * |edges|+1 rows, then arithmetic on the bucket frame. */
  def psi(a: DataFrame, b: DataFrame, valueCol: String,
          edges: Seq[Long]): DataFrame = {
    require(edges.nonEmpty && edges == edges.sorted && edges.distinct == edges,
      "edges must be non-empty, ascending, distinct")
    def bucketCol = edges.zipWithIndex.sortBy(-_._2)
      .foldLeft(lit(edges.length).cast("int")) { case (acc, (e, i)) =>
        when(col(valueCol) <= e, lit(i)).otherwise(acc)
      }
    def side(df: DataFrame, n: String) = df
      .select(bucketCol.as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as(n))
    val edgeCol = edges.zipWithIndex.sortBy(-_._2)
      .foldLeft(lit(null).cast("long")) { case (acc, (e, i)) =>
        when(col("bucket") === i, lit(e)).otherwise(acc)
      }
    // every bucket appears even when both sides are empty there: the
    // report's shape is the edge list, not the data
    val spark = a.sparkSession
    import spark.implicits._
    val all = (0 to edges.length).map(_.toLong).toDF("bucket")
    all.join(side(a, "_na"), Seq("bucket"), "left")
      .join(side(b, "_nb"), Seq("bucket"), "left")
      .withColumn("n_a", coalesce(col("_na"), lit(0L)))
      .withColumn("n_b", coalesce(col("_nb"), lit(0L)))
      .withColumn("_ta", expr("greatest(sum(n_a) over (), 1L)"))
      .withColumn("_tb", expr("greatest(sum(n_b) over (), 1L)"))
      // the OUTER greatest floors the micro share at 1: past 1e6 rows
      // per side an empty bucket's greatest(n,1)*1e6 div total floors
      // to 0 and the psi_term below would hit ln(0) — NULL on Spark,
      // -inf on DuckDB, a cross-engine divergence at exactly the
      // corpus-snapshot scale this audit is for
      .withColumn("pa_micro",
        expr("greatest(greatest(n_a, 1L) * 1000000L div _ta, 1L)"))
      .withColumn("pb_micro",
        expr("greatest(greatest(n_b, 1L) * 1000000L div _tb, 1L)"))
      .withColumn("psi_term", round(
        (col("pa_micro") - col("pb_micro")).cast("double") / lit(1e6) *
          log(col("pa_micro").cast("double") /
            col("pb_micro").cast("double")), 6))
      .select(col("bucket").cast("int").as("bucket"), edgeCol.as("edge"),
        col("n_a"), col("n_b"), col("pa_micro"), col("pb_micro"),
        col("psi_term"))
  }

  /** One-pass-per-column table profile — the Great-Expectations-style
    * summary a pipeline snapshots before accepting a dataset drop:
    * per column, row count, null count, exact distinct count (nulls
    * excluded, the SQL COUNT(DISTINCT) convention), and the modal
    * value with its frequency (ties broken by the smaller rendered
    * value — deterministic). Values render through a string cast so
    * one report schema covers every column type.
    * Output: (column_name, n_rows, n_null, n_distinct, top_value,
    * top_n), one row per requested column.
    *
    * Scale shape: per column, one scan-shaped aggregate plus one
    * value-keyed aggregation reduced to a single argmax row (a 1-row ×
    * 1-row join assembles the report row); columns are bounded by the
    * caller's list. Exact distinct is a shuffle per column — profile a
    * 100 TB table on a sampled or bucketed slice, or swap in the HLL
    * sketch variant the metrics layer already carries. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    cols.map { c =>
      val stats = df.agg(
        count(lit(1)).as("n_rows"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
        countDistinct(col(c)).as("n_distinct"))
      val top = df.select(col(c).cast("string").as("v"))
        .filter(col("v").isNotNull)
        .groupBy(col("v")).agg(count(lit(1)).as("n"))
        .agg(min(struct((-col("n")).as("nn"), col("v").as("tv"))).as("m"))
        .select(col("m.tv").as("top_value"), (-col("m.nn")).as("top_n"))
      stats.crossJoin(top)
        .select(lit(c).as("column_name"), col("n_rows"), col("n_null"),
          col("n_distinct"), col("top_value"), col("top_n"))
    }.reduce(_ unionByName _)
  }

  /** Benford's-law first-digit audit over a positive integer column
    * (amounts in cents, counts, ids-that-shouldn't-be-Benford): the
    * classic fabricated-data / broken-ETL smell test. Emits one row
    * per digit 1–9: observed count, observed share and the Benford
    * expectation log10(1+1/d) in exact integer micros, and the signed
    * deviation. The expectations are hardcoded micro constants so both
    * engines compare against literally the same numbers — no
    * transcendental evaluated at query time.
    *
    * The first digit comes from the DECIMAL RENDERING of the bigint
    * (both engines print int64 identically) — no float log10, whose
    * boundary behavior (10^k neighbors) could differ per engine.
    * Non-positive values are excluded (Benford is defined on positive
    * magnitudes) and reported in the n_skipped column.
    *
    * Scale shape: one map-side substring + a 9-ary hash aggregation —
    * a single scan, no window, no collect. */
  def benford(df: DataFrame, valueCol: String): DataFrame = {
    val expMicro = Map(1 -> 301029L, 2 -> 176091L, 3 -> 124938L,
      4 -> 96910L, 5 -> 79181L, 6 -> 66946L, 7 -> 57991L, 8 -> 51152L,
      9 -> 45757L)
    val spark = df.sparkSession
    import spark.implicits._
    val digits = df.select(col(valueCol).cast("long").as("v"))
      .select(when(col("v") > 0,
        substring(col("v").cast("string"), 1, 1).cast("int")).as("digit"))
    val counts = digits.filter(col("digit").isNotNull)
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val skipped = digits.filter(col("digit").isNull)
      .agg(count(lit(1)).as("n_skipped"))
    val exp = expMicro.toSeq.sortBy(_._1)
      .toDF("digit", "expected_micro")
    exp.join(counts, Seq("digit"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("_t", expr("greatest(sum(n) over (), 1L)"))
      .withColumn("observed_micro", expr("n * 1000000L div _t"))
      .withColumn("dev_micro", col("observed_micro") - col("expected_micro"))
      .crossJoin(skipped)
      .select(col("digit"), col("n"), col("observed_micro"),
        col("expected_micro"), col("dev_micro"), col("n_skipped"))
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

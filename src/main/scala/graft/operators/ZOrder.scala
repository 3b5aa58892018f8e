package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton curve) clustering for multi-column data skipping —
  * the OPTIMIZE ZORDER BY family (Delta/Iceberg/Hudi).
  *
  * Why it matters at 100 TB: partitioning/sorting by ONE column makes
  * that column's file-level min/max stats tight and every other
  * column's useless. Interleaving the bits of two rank-normalized
  * keys gives files that are small rectangles in BOTH dimensions, so
  * a predicate on either column (or both) prunes most files at the
  * footer-stats level, before any row is read. The curve key is plain
  * codegen'd bit arithmetic — no UDF, no shuffle beyond the final
  * range repartition that the rewrite pays anyway.
  *
  * Normalization is floor((v - min) * 65535 / span) — all inputs
  * exact in double well past 2^52, floor is engine-exact, so the key
  * (and therefore the layout decision) replays bit-for-bit in SQL.
  */
object ZOrder {

  /** Map `c` (long-valued) onto [0, 65535] by min/max scaling. */
  def norm16(c: Column, lo: Long, hi: Long): Column =
    if (hi == lo) lit(0L)
    else floor((c - lit(lo)).cast("double") * 65535.0 / (hi - lo))
      .cast("long")

  /** Interleave the low 16 bits of `a` (even positions) and `b` (odd
    * positions) into one 32-bit Morton key. */
  def interleave16(a: Column, b: Column): Column =
    (0 until 16).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** The Morton key for two long columns, normalized by the given
    * bounds (compute them with one min/max aggregate). */
  def zValue16(a: Column, aLo: Long, aHi: Long,
               b: Column, bLo: Long, bHi: Long): Column =
    interleave16(norm16(a, aLo, aHi), norm16(b, bLo, bHi))

  /** Rewrite `df` into `numFiles` range buckets of the Morton key,
    * sorted within each — the physical clustering pass. Bounds come
    * from one aggregate over the frame. The `_z` column is kept so
    * callers (and tests) can inspect the layout; drop it at write. */
  def clusterBy(df: DataFrame, aCol: String, bCol: String,
                numFiles: Int): DataFrame = {
    val r = df.agg(min(col(aCol)), max(col(aCol)),
      min(col(bCol)), max(col(bCol))).head()
    val z = zValue16(col(aCol), r.getLong(0), r.getLong(1),
      col(bCol), r.getLong(2), r.getLong(3))
    df.withColumn("_z", z)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
  }
}

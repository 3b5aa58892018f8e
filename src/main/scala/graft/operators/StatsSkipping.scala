package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column-statistics collection + min/max data skipping — the ANALYZE /
  * file-pruning half of the lakehouse pair whose clustering half is
  * `ZOrder` (Delta data skipping, Iceberg manifest stats, parquet
  * footer min/max made engine-visible).
  *
  * Model: a "bucket" stands for a file (or file group). `collect` is
  * the stats pass a writer runs once per rewrite; `candidateBuckets`
  * is the planning-time decision — a bucket survives a conjunction of
  * closed ranges iff no range excludes it (`max < lo || min > hi`);
  * `prunedScan` applies the decision as a broadcast semi join on the
  * bucket id and then the exact predicate, so the result is
  * row-identical to the plain filter (the gate's oracle) while only
  * candidate buckets are scanned.
  *
  * At 100 TB the stats frame is tiny (buckets × columns — thousands of
  * rows for millions of files is the pathological case, and even that
  * broadcasts), the decision is driver/broadcast-side, and the scan
  * cost drops to the candidate fraction — which is exactly what
  * Z-ordering minimizes for multi-column boxes: after `ZOrder
  * .clusterBy`, both columns' per-bucket ranges are narrow, so a box
  * predicate rules out most buckets; on a random layout every bucket
  * spans every range and nothing prunes (StatsSkippingSpec measures
  * the difference). In production the semi join is replaced by the
  * table format's file listing; the DECISION — which this gate proves
  * engine-exact — transfers unchanged.
  */
object StatsSkipping {

  /** One aggregation pass: per bucket, row count + min/max/null-count
    * for each stats column. Map-side partial agg; output is
    * buckets-sized. */
  def collect(df: DataFrame, bucketCol: String,
              statCols: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +: statCols.flatMap { c =>
      Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"),
        sum(col(c).isNull.cast("long")).as(s"${c}_nulls"))
    }
    df.groupBy(col(bucketCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Buckets a conjunction of closed ranges `col BETWEEN lo AND hi`
    * cannot rule out. All-null buckets for a column (min/max null)
    * are excluded — a BETWEEN never matches null. */
  def candidateBuckets(stats: DataFrame,
                       ranges: Seq[(String, Long, Long)]): DataFrame =
    stats.filter(ranges.map { case (c, lo, hi) =>
      col(s"${c}_max") >= lit(lo) && col(s"${c}_min") <= lit(hi)
    }.reduce(_ && _))

  /** Scan only candidate buckets, then apply the exact predicate:
    * row-identical to filtering the full frame. `stats` must come from
    * `collect` over the same frame/bucketing. */
  def prunedScan(df: DataFrame, stats: DataFrame, bucketCol: String,
                 ranges: Seq[(String, Long, Long)]): DataFrame = {
    val cand = broadcast(
      candidateBuckets(stats, ranges).select(col(bucketCol)))
    val exact = ranges.map { case (c, lo, hi) =>
      col(c).between(lit(lo), lit(hi))
    }.reduce(_ && _)
    df.join(cand, Seq(bucketCol), "left_semi").filter(exact)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Geo-IP enrichment as a RANGE JOIN — SURVEY §2.4 F1 (ref
  * `libs/core-functions/src/functions/lib/index.ts` geo context;
  * production fills it from a MaxMind-style database, which is a table
  * of (ip_lo, ip_hi] ranges with location attributes).
  *
  * Spark has no native range-join operator; the naive
  * `JOIN ON ip BETWEEN lo AND hi` against a broadcast dim executes as a
  * BroadcastNestedLoopJoin — O(|events| × |ranges|), a scale-killer with
  * a real MaxMind dim (~3M ranges). [[lookup]] makes it an EQUI-join:
  * ranges are exploded per /16 bucket they cover (real-world ranges
  * rarely span many /16s, so the dim grows only slightly), events bucket
  * by `ip >> 16`, and the range predicate remains as the join residual —
  * a BroadcastHashJoin probing only the handful of ranges in the
  * event's bucket.
  */
object GeoIp {

  /** IPv4 dotted-quad string -> numeric value (uint32 as long). Pure
    * column arithmetic, codegen'd; null/malformed -> null. */
  def ipToLong(ip: Column): Column = {
    val p = split(ip, "\\.")
    when(size(p) === 4,
      p.getItem(0).cast("long") * 16777216L +
        p.getItem(1).cast("long") * 65536L +
        p.getItem(2).cast("long") * 256L +
        p.getItem(3).cast("long"))
  }

  /** Left-join events to a range dim `(ip_lo, ip_hi, ...attrs)` (longs,
    * inclusive bounds). Output keeps all event columns + the dim attrs
    * (null when no range matches). */
  def lookup(events: DataFrame, ipCol: Column, ranges: DataFrame): DataFrame = {
    val bucketed = ranges.withColumn("_bucket",
      explode(sequence((col("ip_lo") / 65536L).cast("long"),
        (col("ip_hi") / 65536L).cast("long"))))
    val withIp = events
      .withColumn("_ip_num", ipToLong(ipCol))
      .withColumn("_bucket", (col("_ip_num") / 65536L).cast("long"))
    withIp.join(broadcast(bucketed),
        withIp("_bucket") === bucketed("_bucket") &&
          col("_ip_num") >= col("ip_lo") && col("_ip_num") <= col("ip_hi"),
        "left")
      .drop("_bucket", "_ip_num", "ip_lo", "ip_hi")
  }
}

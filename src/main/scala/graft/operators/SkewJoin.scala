package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Equi-joins under heavy key skew — the two explicit remedies for when
  * the built-in machinery runs out.
  *
  * Spark's own ladder handles most skew: broadcast the small side, or
  * let AQE split oversized sort-merge partitions at runtime
  * (`spark.sql.adaptive.skewJoin.enabled`, on in GraftSession). But AQE
  * skew-split only applies to shuffle joins in BATCH plans (AQE is
  * disabled under Structured Streaming), and splitting caps out when a
  * single key's rows exceed every split threshold — one key with 10⁹
  * rows still lands on reducers in key granularity. These operators are
  * the explicit fallbacks, both row-identical to the plain join (the
  * `skew_salted_join` oracle and SkewJoinSpec verify equality):
  *
  *  - [[saltedJoin]]: decouple reducer fan-out from key cardinality by
  *    joining on (key, salt). Use when the right side is too big to
  *    broadcast but cheap to replicate `saltFactor`×.
  *  - [[hotColdJoin]]: split by key temperature — the hot handful of
  *    keys take a broadcast join (their right-side slice is tiny by
  *    definition of "few hot keys"), the cold long tail takes the
  *    normal shuffle join, union. Use when replicating the whole right
  *    side is too expensive and the hot set is small; detection rides
  *    [[Frequency.heavyHitters]] (exact, two passes, no full groupBy).
  */
object SkewJoin {

  /** Inner equi-join with the left side's rows salted into `saltFactor`
    * sub-keys and the right side replicated once per salt value. Every
    * hot key fans over `saltFactor` reducers instead of one. The salt is
    * a deterministic hash of `saltOnCols` (default: all left columns —
    * pass explicit columns when rows carry types `xxhash64` rejects,
    * e.g. maps) so replays partition identically.
    *
    * Scale shape: left shuffles once on (keys, salt) — same volume as
    * the plain join; right shuffles `saltFactor`× its size. Pick
    * saltFactor ≈ (hottest-key rows / healthy-partition rows), a few
    * dozen at most; the right side must be the smaller one. */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 saltFactor: Int,
                 saltOnCols: Seq[String] = Nil): DataFrame = {
    require(saltFactor >= 1, s"saltFactor must be >= 1, got $saltFactor")
    val saltCols =
      (if (saltOnCols.nonEmpty) saltOnCols else left.columns.toSeq)
        .map(col)
    val l = left.withColumn("_salt",
      pmod(xxhash64(saltCols: _*), lit(saltFactor)).cast("int"))
    val r = right.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    l.join(r, keys :+ "_salt").drop("_salt")
  }

  /** Inner equi-join split by key temperature on a single `key`: rows
    * whose key is in the hot set broadcast-join against the hot slice of
    * `right`; the cold remainder takes the regular shuffle join; union.
    *
    * `hotKeyFraction` = 1/k for the [[Frequency.heavyHitters]] pass: a
    * key is hot if it carries >= that fraction of left rows, so the hot
    * set has at most k members and the broadcast stays bounded no matter
    * the data size. The split itself is two broadcast semi/anti joins
    * against the (tiny) hot-key set — no extra shuffle of either side. */
  def hotColdJoin(left: DataFrame, right: DataFrame, key: String,
                  hotKeyFraction: Double = 0.01): DataFrame = {
    require(hotKeyFraction > 0 && hotKeyFraction <= 1,
      s"hotKeyFraction in (0,1], got $hotKeyFraction")
    val k = math.max(1, math.round(1.0 / hotKeyFraction).toInt)
    val hot = Frequency.heavyHitters(left, key, k)
      .select(col("item").cast(left.schema(key).dataType).as(key))
    val leftHot = left.join(hot.hint("broadcast"), Seq(key), "left_semi")
    val leftCold = left.join(hot.hint("broadcast"), Seq(key), "left_anti")
    val rightHot = right.join(hot.hint("broadcast"), Seq(key), "left_semi")
    leftHot.join(rightHot.hint("broadcast"), Seq(key))
      .unionByName(leftCold.join(right, Seq(key)))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Item–item co-occurrence similarity from (group, item) observations —
  * the "bought together" / related-items question asked of the same
  * order tables PageRank and triangle counting read, and the
  * collaborative-filtering preprocessing step (item-item neighborhoods).
  *
  * Scale shape: the INVERTED-INDEX self-join — candidate pairs are
  * generated per group, so the work is Σ_g C(|g|, 2), bounded by the
  * group (basket) size, never |items|². Pair counts are one hash
  * aggregation with map-side combine; the per-item totals are a
  * dimension-sized table joined back AFTER the `minCo` support filter
  * has cut the pair set (support filtering before the join is what
  * keeps the joined side small — the same freq-cap discipline as the
  * n-gram dedup index). Hot groups (a basket with thousands of items)
  * are the skew risk at 100 TB; cap or salt them upstream — the
  * operator keeps the pair generation per-group so such caps compose.
  *
  * Jaccard over group sets: J = co / (n1 + n2 − co), where n_i =
  * distinct groups containing item i. Returns (item1, item2, n1, n2,
  * co, jaccard) for pairs with co ≥ minCo, item1 < item2. */
object Cooccurrence {

  def jaccardPairs(obs: DataFrame, groupCol: String, itemCol: String,
                   minCo: Long = 2L): DataFrame = {
    val po = obs.select(col(groupCol).as("g"), col(itemCol).as("i"))
      .distinct()
    val cnt = po.groupBy(col("i")).agg(count(lit(1)).as("n"))
    val pairs = po.as("x").join(po.as("y"),
        col("x.g") === col("y.g") && col("x.i") < col("y.i"))
      .groupBy(col("x.i").as("item1"), col("y.i").as("item2"))
      .agg(count(lit(1)).as("co"))
      .filter(col("co") >= minCo)
    pairs
      .join(cnt.select(col("i").as("item1"), col("n").as("n1")), "item1")
      .join(cnt.select(col("i").as("item2"), col("n").as("n2")), "item2")
      .select(col("item1"), col("item2"), col("n1"), col("n2"), col("co"),
        round(col("co").cast("double") /
          (col("n1") + col("n2") - col("co")).cast("double"), 6)
          .as("jaccard"))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Blocked fuzzy entity resolution: match dirty records against a clean
  * catalog by edit distance, restricted to blocking buckets — the
  * record-linkage step a warehouse pipeline runs when two sources spell
  * the same entity differently (the identity-stitching cousin of user
  * recognition, which joins on EXACT ids; here the join key is fuzzy).
  *
  * Scale shape: candidate pairs exist only WITHIN a blocking bucket
  * (classic blocking — Fellegi–Sunter linkage practice), so the
  * quadratic all-pairs never materializes; cost is Σ_bucket |dirty| ×
  * |catalog| with catalog-per-bucket small by construction. The catalog
  * (distinct entity names) is dimension-sized at any corpus scale and
  * broadcasts, so dirty records never shuffle. `levenshtein` is a
  * codegen'd Spark builtin; best-match selection is one window over the
  * ≤ (bucket catalog size) candidates per dirty record, partitioned by
  * the dirty id — no global sort.
  *
  * Recall caveat (stated, standard): a corruption that changes the
  * blocking key makes that record unmatchable — blocking trades recall
  * for the quadratic blow-up, and multi-pass blocking on secondary keys
  * is the production mitigation.
  *
  * Returns one row per dirty record that matched: (idCol, dirty_name,
  * matched_name, dist), best = lowest (dist, matched_name) — a total
  * order, so the result is deterministic under ties. */
object EntityResolution {

  def bestMatch(dirty: DataFrame, idCol: String, nameCol: String,
                catalog: DataFrame, catNameCol: String,
                maxDist: Int = 2): DataFrame =
    bestMatchMultiBlock(dirty, idCol, nameCol, catalog, catNameCol,
      maxDist, Seq(n => split(n, " ").getItem(0)))

  /** Multi-pass blocking (the standard recall mitigation named in the
    * class doc): candidate pairs are the UNION of one blocked join per
    * blocking-key function — a corruption has to break EVERY key to
    * make a record unmatchable. Candidates dedup before scoring so the
    * union costs no double-ranking; each pass is the same
    * broadcast-bucket join, so cost is additive in the number of keys,
    * never multiplicative. */
  def bestMatchMultiBlock(dirty: DataFrame, idCol: String,
                          nameCol: String, catalog: DataFrame,
                          catNameCol: String, maxDist: Int,
                          blockKeys: Seq[org.apache.spark.sql.Column =>
                            org.apache.spark.sql.Column]): DataFrame = {
    require(blockKeys.nonEmpty, "need at least one blocking key")
    val cands = blockKeys.map { bk =>
      dirty.select(col(idCol), col(nameCol).as("dirty_name"),
          bk(col(nameCol)).as("_blk"))
        .join(broadcast(catalog
          .select(col(catNameCol).as("matched_name"),
            bk(col(catNameCol)).as("_blk"))
          .distinct()), Seq("_blk"))
        .drop("_blk")
    }.reduce(_ unionByName _).distinct()
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("dist"), col("matched_name"))
    cands
      .withColumn("dist", levenshtein(col("dirty_name"), col("matched_name")))
      .filter(col("dist") <= maxDist)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col(idCol), col("dirty_name"), col("matched_name"),
        col("dist"))
  }
}

package graft.operators

import org.apache.spark.ml.recommendation.{ALS, ALSModel}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Collaborative filtering over the interaction matrix — the
  * "customers who bought X" operator class (Hu/Koren/Volinsky 2008
  * implicit-feedback ALS), complementing the content-side retrieval
  * stack ([[Similarity]], [[Cooccurrence]]): co-occurrence scores
  * item-item overlap directly, ALS factorizes the whole matrix and
  * generalizes to user-item pairs never observed together.
  *
  * Spark-first: `org.apache.spark.ml.recommendation.ALS` IS the
  * distributed implementation (block-partitioned factor updates — the
  * one genuinely iterative-ML operator Spark ships natively); this
  * wrapper pins the implicit-feedback configuration and the scoring
  * shapes. Like the other trained operators
  * ([[QualityClassifier]]), the gate is a measured property — held-out
  * pairwise ranking beats chance by a margin — not a value replay: no
  * SQL engine re-derives a factorization.
  */
object Recommend {

  /** Implicit-feedback ALS on (user, item, cnt) interactions. */
  def trainImplicit(interactions: DataFrame, rank: Int = 8,
                    maxIter: Int = 5, seed: Long = 42L): ALSModel =
    new ALS()
      .setUserCol("user").setItemCol("item").setRatingCol("cnt")
      .setImplicitPrefs(true)
      .setRank(rank).setMaxIter(maxIter).setSeed(seed)
      .setColdStartStrategy("drop")
      .fit(interactions)

  /** Predicted affinity for explicit (user, item) pairs (extra columns
    * pass through); unseen users/items are DROPPED (cold-start), so
    * callers can count coverage. */
  def scorePairs(model: ALSModel, pairs: DataFrame): DataFrame =
    model.transform(pairs
      .withColumn("user", col("user").cast("int"))
      .withColumn("item", col("item").cast("int")))

  /** Top-k recommendations per user in `users` as (user, rank, item,
    * score) rows. */
  def topK(model: ALSModel, users: DataFrame, k: Int): DataFrame =
    model.recommendForUserSubset(users.select(col("user").cast("int")), k)
      .select(col("user"), posexplode(col("recommendations")))
      .select(col("user"), (col("pos") + 1).as("rank"),
        col("col.item").as("item"), col("col.rating").as("score"))
}

package graft.operators

import org.apache.spark.ml.feature.{Word2Vec, Word2VecModel}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed word-embedding training (Mikolov 2013 skip-gram as
  * shipped in `org.apache.spark.ml.feature.Word2Vec`) — the
  * representation-learning counterpart of [[Recommend]]'s interaction
  * factorization: co-occurrence in text instead of co-occurrence in
  * baskets. Used here as a corpus-level operator: train once over the
  * token stream, broadcast the (vocab × dim) table back for similarity
  * / feature work. Like the other trained operators the gate is a
  * measured property (planted co-occurrence structure must come back
  * as vector similarity), never a value replay.
  *
  * Determinism-vs-throughput trade, stated at the site: skip-gram SGD
  * is order-dependent, so `numPartitions` picks between
  *  - 1 — one gradient task, bit-stable under the seed (what the
  *    `td_word2vec` value gate uses; the training corpus a single
  *    task can hold is the ceiling), and
  *  - N — N concurrent gradient partitions whose updates merge per
  *    iteration (Spark's own Hogwild-style parallelism): the 100-TB
  *    scale path, seed-stable only as a DISTRIBUTION — exact vectors
  *    shift run-to-run with scheduling, but planted co-occurrence
  *    structure still comes back as similarity (the
  *    RandomizedInvariantsSpec property gate at numPartitions=4).
  * Production rule: gate model QUALITY with property checks (as here),
  * never with vector value replays, and crank `numPartitions` with the
  * corpus. */
object TextEmbeddings {

  def trainWord2Vec(docs: DataFrame, tokensCol: String, dim: Int = 16,
                    minCount: Int = 2, seed: Long = 42L,
                    maxIter: Int = 4,
                    numPartitions: Int = 1): Word2VecModel =
    new Word2Vec()
      .setInputCol(tokensCol).setOutputCol("_w2v")
      .setVectorSize(dim).setMinCount(minCount)
      .setSeed(seed).setMaxIter(maxIter)
      .setNumPartitions(numPartitions)
      .fit(docs.select(col(tokensCol)))

  /** (word, vector as array<double>) — the broadcastable vocab table. */
  def vectors(model: Word2VecModel): DataFrame = {
    val spark = model.getVectors.sparkSession
    import org.apache.spark.ml.linalg.Vector
    import spark.implicits._
    model.getVectors
      .select(col("word"), col("vector"))
      .map { r =>
        (r.getString(0), r.getAs[Vector](1).toArray)
      }.toDF("word", "vector")
  }
}

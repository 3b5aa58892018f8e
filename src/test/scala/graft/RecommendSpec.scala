package graft

import org.apache.spark.sql.functions._

import graft.operators.Recommend

/** Implicit-feedback ALS wrapper: planted block structure must be
  * recovered, and the scoring/top-k surfaces behave. */
class RecommendSpec extends GraftSpec {
  import spark.implicits._

  // two taste clusters: users 0-9 buy items 0-9, users 10-19 buy
  // items 10-19 (with a deterministic skip pattern so the matrix has
  // holes to generalize across)
  private lazy val inter = (for {
    u <- 0 until 20
    i <- 0 until 20
    if (u / 10) == (i / 10) && (u + i) % 3 != 0
  } yield (u, i, 1.0f)).toDF("user", "item", "cnt")

  test("ALS recovers planted block structure in pairwise ranking") {
    val model = Recommend.trainImplicit(inter, rank = 4, maxIter = 10)
    // held-out same-cluster pairs (the skipped ones) vs cross-cluster
    val pairs = (for {
      u <- 0 until 20
      i <- 0 until 20
      if (u / 10) == (i / 10) && (u + i) % 3 == 0
    } yield (u, i, (i + 10) % 20)).toDF("user", "pos", "neg")
    val pos = Recommend.scorePairs(model,
        pairs.select(col("user"), col("pos").as("item")))
      .select(col("user"), col("item").as("pos"),
        col("prediction").as("ps"))
    val neg = Recommend.scorePairs(model,
        pairs.select(col("user"), col("pos"), col("neg").as("item")))
      .select(col("user"), col("pos"), col("prediction").as("ns"))
    val joined = pos.join(neg, Seq("user", "pos"))
    val n = joined.count()
    val correct = joined.filter(col("ps") > col("ns")).count()
    assert(n > 50)
    assert(correct.toDouble / n > 0.9,
      s"block structure not recovered: $correct/$n")
  }

  test("topK: k rows per user, ranked by descending score, in-cluster") {
    val model = Recommend.trainImplicit(inter, rank = 4, maxIter = 10)
    val recs = Recommend.topK(model, Seq(0, 15).toDF("user"), k = 5)
      .collect().groupBy(_.getInt(0))
    assert(recs.keySet == Set(0, 15))
    recs.foreach { case (u, rows) =>
      assert(rows.length == 5)
      val scores = rows.sortBy(_.getInt(1)).map(_.getFloat(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
      // top recommendations stay inside the user's cluster
      val inCluster = rows.map(_.getInt(2))
        .count(i => (i / 10) == (u / 10))
      assert(inCluster >= 4, s"user $u recs left the cluster")
    }
  }
}

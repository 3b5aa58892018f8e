package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Executes the SCALE.md claim that a hot cell in the both-sides-huge
  * margin join is ordinary data skew AQE's skew-join split handles:
  * plant a corpus where one cell holds ~95% of the ys, run the
  * shuffled cell join once under default thresholds and once under
  * test-scale skew thresholds, and assert the adaptive plan actually
  * split the hot partition (skew markers in the final plan) while the
  * candidate set stays bit-identical to the unsplit run.
  */
class SkewCellSpec extends GraftSpec {
  import spark.implicits._

  test("AQE splits the hot cell in the shuffled margin join; candidates unchanged") {
    // four well-separated cluster anchors; ids 0-3 are one y per
    // cluster (trainCentroids inits from the first nlist ids), the
    // remaining 380 ys all jitter around anchor 0 -> one hot cell
    val rnd = new scala.util.Random(31)
    val anchors = Array.tabulate(4) { c =>
      Array.tabulate(8)(d => if (d == c * 2) 1.0f else 0.05f)
    }
    def near(c: Int) =
      anchors(c).map(v => v + 0.01f * rnd.nextGaussian().toFloat)
    val ys = ((0L until 4L).map(i => (100000 + i, near(i.toInt))) ++
      (4L until 384L).map(i => (100000 + i, near(0)))).toDF("yid", "vec")
    val xs = (0L until 50L).map(i => (i, near(0))).toDF("xid", "vec")

    def run(): (Set[(Long, Long)], String) = {
      val cand = Similarity.cellCandidates(xs, ys, nlist = 4, nprobe = 1)
      // collect the SAME frame whose execution we inspect — a derived
      // projection would leave this AQE plan un-executed (isFinalPlan
      // false, no skew markers)
      val rows = cand.collect()
        .map(r => (r.getAs[Long]("xid"), r.getAs[Long]("yid"))).toSet
      (rows, cand.queryExecution.executedPlan.toString())
    }

    val (baseline, _) = run()
    // the hot cell dominates: every x probes it, so the candidate set
    // is at least 50 x 380 pairs
    assert(baseline.size >= 50 * 380,
      s"hot cell not hot: ${baseline.size} candidates")

    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> conf.getOption(k))
    try {
      // test-scale thresholds: the one nonempty partition reads as
      // skewed and the advisory size forces real splits
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1k")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1k")
      val (split, plan) = run()
      assert(split == baseline,
        "skew-split run changed the candidate set")
      assert(plan.contains("isSkew=true") || plan.contains("skewed=") ||
        plan.contains("skew=true"),
        s"AQE did not mark the hot cell skewed:\n$plan")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }
}

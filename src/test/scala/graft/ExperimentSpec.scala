package graft

import org.apache.spark.sql.functions._

import graft.operators.Experiment

/** A/B experiment read-out: deterministic assignment, per-variant
  * stats, and the two-proportion z against hand-computed values. */
class ExperimentSpec extends GraftSpec {
  import spark.implicits._

  test("assignVariant: deterministic, salted by experiment, in range") {
    val ids = (1L to 200L).toDF("id")
    val v = ids.select(Experiment.assignVariant(col("id"), "e1").as("v"))
      .as[Int].collect()
    assert(v.forall(x => x == 0 || x == 1))
    assert(v.distinct.sorted.toSeq == Seq(0, 1)) // both arms populated
    // same inputs -> same assignment
    val v2 = ids.select(Experiment.assignVariant(col("id"), "e1").as("v"))
      .as[Int].collect()
    assert(v.toSeq == v2.toSeq)
    // a different experiment salt re-randomizes at least one unit
    val w = ids.select(Experiment.assignVariant(col("id"), "e2").as("v"))
      .as[Int].collect()
    assert(v.toSeq != w.toSeq)
  }

  test("variantStats + conversionReport: hand-computed z") {
    // fabricate units pinned to known variants by probing assignment
    val assigned = (1L to 400L).toDF("id")
      .select(col("id"), Experiment.assignVariant(col("id"), "t").as("v"))
      .as[(Long, Int)].collect()
    val controls = assigned.filter(_._2 == 0).map(_._1).take(50)
    val treats = assigned.filter(_._2 == 1).map(_._1).take(50)
    assert(controls.length == 50 && treats.length == 50)
    // 10/50 control convert, 20/50 treatment convert; every row value 2.0
    val rows =
      controls.zipWithIndex.map { case (u, i) =>
        (u, if (i < 10) "buy" else "view", 2.0)
      } ++ treats.zipWithIndex.map { case (u, i) =>
        (u, if (i < 20) "buy" else "view", 2.0)
      }
    val df = rows.toSeq.toDF("unit", "etype", "value")
    val stats = Experiment.variantStats(df, col("unit"), "t",
        col("etype") === "buy", col("value"))
      .orderBy("variant")
      .as[(Int, Long, Long, Double, Double, Double)].collect()
    assert(stats.toSeq == Seq(
      (0, 50L, 10L, 0.2, 100.0, 2.0),
      (1, 50L, 20L, 0.4, 100.0, 2.0)))
    val r = Experiment.conversionReport(df, col("unit"), "t",
      col("etype") === "buy", col("value")).collect().head
    assert(r.getAs[Long]("n_control") == 50L)
    assert(r.getAs[Long]("conv_treatment") == 20L)
    assert(r.getAs[Double]("uplift") == 0.2)
    // z = 0.2 / sqrt(0.3*0.7*(1/50+1/50)) = 2.1822
    assert(r.getAs[Double]("z") == 2.1822)
    assert(r.getAs[Boolean]("significant"))
  }

  test("calibration: hand-computed bins, exact ECE, empty input summary") {
    import spark.implicits._
    // bin 9: two well-calibrated highs (950000 micro, both positive)
    //   -> pos_rate 10000 bp, mean 9500 bp, gap 500
    // bin 0: two lows, one positive -> pos 5000, mean 500, gap 4500
    // ECE = (500*2 + 4500*2) / 4 = 2500
    val d = Seq((950000L, true), (950000L, true),
      (50000L, false), (50000L, true)).toDF("sm", "label")
    val out = Experiment.calibration(d, "sm", "label", bins = 10)
      .collect().map(r => r.getAs[Int]("bin") -> r).toMap
    assert(out.keySet == Set(9, 0, -1))
    val hi = out(9)
    assert(hi.getAs[Long]("n") == 2 && hi.getAs[Long]("n_pos") == 2)
    assert(hi.getAs[Long]("pos_rate_bp") == 10000 &&
      hi.getAs[Long]("mean_score_bp") == 9500 &&
      hi.getAs[Long]("gap_bp") == 500)
    val lo = out(0)
    assert(lo.getAs[Long]("pos_rate_bp") == 5000 &&
      lo.getAs[Long]("mean_score_bp") == 500 &&
      lo.getAs[Long]("gap_bp") == 4500)
    val ece = out(-1)
    assert(ece.getAs[Long]("n") == 4 && ece.getAs[Long]("gap_bp") == 2500)
    assert(ece.isNullAt(ece.fieldIndex("pos_rate_bp")))

    // a perfect score of exactly 1.0 (1e6 micro) clamps into bin 9
    val top = Experiment.calibration(
      Seq((1000000L, true)).toDF("sm", "label"), "sm", "label")
      .collect().map(r => r.getAs[Int]("bin")).toSet
    assert(top == Set(9, -1))

    val empty = Experiment.calibration(
      Seq.empty[(Long, Boolean)].toDF("sm", "label"), "sm", "label")
      .collect()
    assert(empty.length == 1 && empty.head.getAs[Int]("bin") == -1 &&
      empty.head.getAs[Long]("n") == 0 &&
      empty.head.getAs[Long]("gap_bp") == 0)
  }

  test("conversionReport: null-value rows count as zero value") {
    val df = Seq((1L, "buy", Option.empty[Double]),
      (2L, "view", Some(3.0))).toDF("unit", "etype", "value")
    val stats = Experiment.variantStats(df, col("unit"), "x",
      col("etype") === "buy", col("value"))
    assert(stats.agg(sum("total_value")).as[Double].head() == 3.0)
  }
}

package graft

import graft.operators.Stats

/** Classical-statistics battery: every operator against hand-computed
  * values, including the degenerate inputs (single class, zero cells).
  */
class StatsSpec extends GraftSpec {
  import spark.implicits._

  test("chiSquareCells: hand-computed 2x2 cells; zero-observed cells still carry expectation") {
    val df = (Seq.fill(4)(("x", "u")) ++ Seq(("x", "v")) ++
      Seq.fill(2)(("y", "u")) ++ Seq.fill(3)(("y", "v"))).toDF("a", "b")
    val m = Stats.chiSquareCells(df, "a", "b")
      .collect()
      .map(r => (r.getAs[String]("a"), r.getAs[String]("b")) -> r).toMap
    assert(m.size == 4)
    val xu = m(("x", "u"))
    assert(xu.getAs[Long]("n_obs") == 4 && xu.getAs[Long]("rt") == 5 &&
      xu.getAs[Long]("ct") == 6)
    assert(xu.getAs[Long]("e_milli") == 3000 &&
      xu.getAs[Long]("dev_milli") == 1000 &&
      xu.getAs[Long]("term_milli") == 333)
    val xv = m(("x", "v"))
    assert(xv.getAs[Long]("e_milli") == 2000 &&
      xv.getAs[Long]("dev_milli") == -1000 &&
      xv.getAs[Long]("term_milli") == 500)
    // total chi-square in milli: 333+500+333+500 ~ 1.6667 in units
    assert(m.values.map(_.getAs[Long]("term_milli")).sum == 1666L)
    // a value pair never observed still gets a cell with expectation
    val df2 = df.union(Seq(("z", "u")).toDF("a", "b"))
    val m2 = Stats.chiSquareCells(df2, "a", "b")
      .collect()
      .map(r => (r.getAs[String]("a"), r.getAs[String]("b")) -> r).toMap
    assert(m2.size == 6)
    val zv = m2(("z", "v"))
    assert(zv.getAs[Long]("n_obs") == 0 && zv.getAs[Long]("e_milli") > 0)
  }

  test("ksStatistic: hand-computed max CDF gap with smallest-score tiebreak; single-class null") {
    val df = Seq((1L, true), (2L, true), (3L, true),
      (2L, false), (3L, false), (4L, false)).toDF("s", "y")
    val r = Stats.ksStatistic(df, "s", "y").collect().head
    assert(r.getAs[Long]("n_pos") == 3 && r.getAs[Long]("n_neg") == 3)
    // gaps per score: 333333, 333333, 333334, 0 -> max at s=3
    assert(r.getAs[Long]("ks_micro") == 333334L &&
      r.getAs[Long]("ks_at_score") == 3L)
    val one = Seq((1L, true)).toDF("s", "y")
    val r0 = Stats.ksStatistic(one, "s", "y").collect().head
    assert(r0.isNullAt(r0.fieldIndex("ks_micro")))
  }

  test("gainsDeciles: hand-computed capture and lift over 5 buckets") {
    // ids 1..10, score 11-id (so rank order = id), positives = ids 1-3
    val df = (1L to 10L).map(i => (i, 11L - i, i <= 3))
      .toDF("id", "s", "y")
    val m = Stats.gainsDeciles(df, "id", "s", "y", buckets = 5)
      .collect().map(r => r.getAs[Int]("bucket") -> r).toMap
    assert(m.keySet == Set(0, 1, 2, 3, 4))
    assert(m.values.forall(_.getAs[Long]("n") == 2))
    assert(m(0).getAs[Long]("n_pos") == 2 &&
      m(0).getAs[Long]("capture_micro") == 666666L &&
      m(0).getAs[Long]("lift_micro") == 3333333L)
    assert(m(1).getAs[Long]("n_pos") == 1 &&
      m(1).getAs[Long]("capture_micro") == 1000000L &&
      m(1).getAs[Long]("lift_micro") == 1666666L)
    assert(m(4).getAs[Long]("n_pos") == 0 &&
      m(4).getAs[Long]("capture_micro") == 1000000L &&
      m(4).getAs[Long]("lift_micro") == 0L)
  }

  test("cochranQ: hand-computed 3-system Q; k=2 reduces to uncorrected McNemar; all-or-nothing null") {
    // items: (1,1,0), (1,0,0), (1,1,1), (0,0,0)
    // G = (3,2,1), T = 6, sumL2 = 14 -> Q = 2*(42-36)/(18-14) = 3.0
    val df = Seq((true, true, false), (true, false, false),
      (true, true, true), (false, false, false)).toDF("a", "b", "c")
    val r = Stats.cochranQ(df, Seq("a", "b", "c")).collect().head
    assert(r.getAs[Long]("n_items") == 4 && r.getAs[Long]("k") == 3)
    assert(r.getAs[Long]("sum_l") == 6 &&
      r.getAs[Long]("sum_l_sq") == 14 &&
      r.getAs[Long]("sum_g_sq") == 14)
    assert(r.getAs[Long]("q_micro") == 3000000L)
    // k = 2: (1,0),(1,0),(0,1),(1,1),(0,0) -> (b-c)^2/(b+c) = 1/3
    val two = Seq((true, false), (true, false), (false, true),
      (true, true), (false, false)).toDF("a", "b")
    assert(Stats.cochranQ(two, Seq("a", "b")).collect().head
      .getAs[Long]("q_micro") == 333333L)
    // every item all-right or all-wrong: denominator 0 -> null
    val flat = Seq((true, true), (false, false)).toDF("a", "b")
    val r0 = Stats.cochranQ(flat, Seq("a", "b")).collect().head
    assert(r0.isNullAt(r0.fieldIndex("q_micro")))
  }

  test("brierScore: exact micro MSE; perfect and inverted scores") {
    val df = Seq((1000000L, true), (0L, true), (500000L, false))
      .toDF("sm", "y")
    val r = Stats.brierScore(df, "sm", "y").collect().head
    // (0 + 1e12 + 2.5e11) div 3e6 = 416666
    assert(r.getAs[Long]("n") == 3 &&
      r.getAs[Long]("brier_micro") == 416666L)
    val perfect = Seq((1000000L, true), (0L, false)).toDF("sm", "y")
    assert(Stats.brierScore(perfect, "sm", "y").collect().head
      .getAs[Long]("brier_micro") == 0L)
  }

  test("spearman: perfect, reversed, and tie-broken rankings score exactly") {
    val up = Seq((1L, 10L, 1.0), (2L, 20L, 2.0), (3L, 30L, 3.0))
      .toDF("id", "x", "y")
    assert(Stats.spearman(up, "id", "x", "y").collect().head
      .getAs[Long]("rho_micro") == 1000000L)
    val down = Seq((1L, 10L, 3.0), (2L, 20L, 2.0), (3L, 30L, 1.0))
      .toDF("id", "x", "y")
    val r = Stats.spearman(down, "id", "x", "y").collect().head
    assert(r.getAs[Long]("sum_d_sq") == 8 &&
      r.getAs[Long]("rho_micro") == -1000000L)
    // ties in x break by id: x-ranks for ids (1,2,3) are (2,3,1)
    val tie = Seq((1L, 5L, 2.0), (2L, 5L, 3.0), (3L, 1L, 1.0))
      .toDF("id", "x", "y")
    // y-ranks (2,3,1) too -> d = 0 -> perfectly correlated
    assert(Stats.spearman(tie, "id", "x", "y").collect().head
      .getAs[Long]("rho_micro") == 1000000L)
    // a single row: undefined -> null
    val one = Seq((1L, 5L, 2.0)).toDF("id", "x", "y")
    val r1 = Stats.spearman(one, "id", "x", "y").collect().head
    assert(r1.isNullAt(r1.fieldIndex("rho_micro")))
  }

  test("categoricalEntropy: uniform two-category split scores ln(2)/2 per term") {
    val df = Seq("a", "b").toDF("c")
    val rows = Stats.categoricalEntropy(df, "c").collect()
      .map(r => r.getAs[String]("category") -> r).toMap
    assert(rows("a").getAs[Long]("p_micro") == 500000L)
    assert(rows("a").getAs[Double]("h_term") == 0.346574)
    // a certain column has zero entropy
    val sure = Seq("a", "a").toDF("c")
    assert(Stats.categoricalEntropy(sure, "c").collect().head
      .getAs[Double]("h_term") == 0.0)
  }

  test("mutualInformationCells: perfect dependence scores ln(2)/2 per cell; independence scores 0") {
    val dep = Seq(("x", "u"), ("x", "u"), ("y", "v"), ("y", "v"))
      .toDF("a", "b")
    val rows = Stats.mutualInformationCells(dep, "a", "b").collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getAs[Long]("p_micro") == 500000L &&
        r.getAs[Double]("mi_term") == 0.346574)
    }
    // independent: every cell p_ab = p_a p_b -> ln(1) = 0
    val ind = Seq(("x", "u"), ("x", "v"), ("y", "u"), ("y", "v"))
      .toDF("a", "b")
    assert(Stats.mutualInformationCells(ind, "a", "b").collect()
      .forall(_.getAs[Double]("mi_term") == 0.0))
  }
}

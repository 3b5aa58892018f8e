package graft

import org.apache.spark.sql.functions._

import graft.operators.EvalMetrics

class EvalMetricsSpec extends GraftSpec {
  import spark.implicits._

  private def score(cand: String, ref: String)
      : (Long, Long, Long, Double, Double, Double) =
    EvalMetrics.rougeN(
      Seq((cand, ref)).toDF("cand", "ref"), "cand", "ref", n = 2)
      .select("n_cand", "n_ref", "n_overlap", "recall", "precision", "f1")
      .as[(Long, Long, Long, Double, Double, Double)].head()

  test("hand-computed bigram overlap") {
    // cand {a b, b c}; ref {a b, b c, c d}; overlap 2
    assert(score("a b c", "a b c d") ==
      ((2L, 3L, 2L, 0.666667, 1.0, 0.8)))
  }

  test("identical texts score 1.0 everywhere") {
    val (nc, nr, o, r, p, f) = score("x y z x y", "x y z x y")
    assert(nc == nr && o == nc && r == 1.0 && p == 1.0 && f == 1.0)
  }

  test("disjoint texts score 0.0; short texts yield empty sets safely") {
    assert(score("a b c", "x y z")._4 == 0.0)
    // single-word candidate: no bigrams, guarded division
    assert(score("a", "a b") == ((0L, 1L, 0L, 0.0, 0.0, 0.0)))
  }

  test("repeated n-grams count once (distinct-set ROUGE)") {
    // cand repeats "a b" three times; still one distinct bigram of ref's two
    val (nc, _, o, r, _, _) = score("a b a b a b", "a b c")
    // cand distinct bigrams: {a b, b a}; ref: {a b, b c}; overlap {a b}
    assert(nc == 2 && o == 1 && r == 0.5)
  }

  private def bleu(cand: Seq[String], ref: Seq[String])
      : (Long, Long, Long, Long, Option[Double]) =
    EvalMetrics.bleu2Log(
      Seq((1, cand, ref)).toDF("id", "cand", "ref"), "id", "cand", "ref")
      .select("n_cand", "n_ref", "clip1", "clip2", "log_bleu")
      .as[(Long, Long, Long, Long, Option[Double])].head()

  test("bleu2Log: hand-computed prefix candidate") {
    // cand = the cat sat; ref = the cat sat down
    // clip1 = 3, clip2 = 2 (both bigrams present), p1 = p2 = 1
    // log_bleu = min(0, 1 - 4/3) + 0 = -1/3 -> -0.3333
    assert(bleu(Seq("the", "cat", "sat"),
      Seq("the", "cat", "sat", "down")) ==
      ((3L, 4L, 3L, 2L, Some(-0.3333))))
  }

  test("bleu2Log: clipping caps repeated candidate grams at ref counts") {
    // cand = a a a vs ref = a b: unigram 'a' appears once in ref -> clip1=1
    // cand bigrams {a a, a a} none in ref -> clip2=0 -> NULL score
    assert(bleu(Seq("a", "a", "a"), Seq("a", "b")) ==
      ((3L, 2L, 1L, 0L, None)))
  }

  test("bleu2Log: identical token streams score exactly 0") {
    val t = Seq("x", "y", "z", "x")
    assert(bleu(t, t) == ((4L, 4L, 4L, 3L, Some(0.0))))
  }

  test("bleu2Log: longer-than-ref candidate pays no brevity penalty") {
    // cand = a b a b, ref = a b: BP term = min(0, 1 - 2/4) = 0
    // clip1 = 2 (a:min(2,1) + b:min(2,1)), clip2: 'a b' min(2,1)=1
    // log_bleu = 0.5*(ln(2/4) + ln(1/3)) = 0.5*(ln .5 + ln .333..)
    val (nc, nr, c1, c2, lb) = bleu(Seq("a", "b", "a", "b"), Seq("a", "b"))
    assert((nc, nr, c1, c2) == ((4L, 2L, 2L, 1L)))
    val expect = math.rint((0.5 * (math.log(0.5) + math.log(1.0 / 3))) * 1e4) / 1e4
    assert(lb.contains(expect))
  }

  test("bleu2Log: empty candidate is guarded") {
    assert(bleu(Seq.empty, Seq("a", "b")) == ((0L, 2L, 0L, 0L, None)))
  }

  test("bradleyTerry: two-player MM fixpoint equals the exact odds ratio") {
    // A beats B 3:1 over 4 matches — the two-player BT MLE is
    // p_A = 3/4, and the integer MM rounds hit it exactly (and stay):
    // every round re-derives den = 4·10⁹/10⁶ = 4000 for both, so
    // raw_A = 3·10⁹/4000 = 750000 — a fixpoint in micro units
    val c = (Seq.fill(3)(("A", "B")) :+ (("B", "A")))
      .toDF("winner", "loser")
    val out = EvalMetrics.bradleyTerry(c, "winner", "loser", iters = 3)
      .collect().map(r => r.getAs[String]("player") -> r).toMap
    assert(out("A").getAs[Long]("strength_micro") == 750000)
    assert(out("B").getAs[Long]("strength_micro") == 250000)
    assert(out("A").getAs[Long]("n_wins") == 3 &&
      out("A").getAs[Long]("n_matches") == 4)
    assert(out("A").getAs[Long]("rank") == 1 &&
      out("B").getAs[Long]("rank") == 2)
  }

  test("bradleyTerry: dominance chain orders strengths; zero-win player lands at zero; empty input empty") {
    // A > B > C by direct wins only (no A-C matches): transitivity must
    // come out of the fit, not the counts
    val c = (Seq.fill(4)(("A", "B")) ++ Seq.fill(1)(("B", "A")) ++
      Seq.fill(4)(("B", "C")) ++ Seq.fill(1)(("C", "B")))
      .toDF("winner", "loser")
    val out = EvalMetrics.bradleyTerry(c, "winner", "loser")
      .collect().map(r => r.getAs[String]("player") -> r).toMap
    val (sa, sb, sc) = (out("A").getAs[Long]("strength_micro"),
      out("B").getAs[Long]("strength_micro"),
      out("C").getAs[Long]("strength_micro"))
    assert(sa > sb && sb > sc, s"chain not ordered: $sa, $sb, $sc")
    assert(sa + sb + sc <= 1000000)

    val z = EvalMetrics.bradleyTerry(
      Seq(("A", "B"), ("A", "B")).toDF("winner", "loser"),
      "winner", "loser").collect()
      .map(r => r.getAs[String]("player") -> r).toMap
    assert(z("B").getAs[Long]("strength_micro") == 0)
    assert(z("B").getAs[Long]("rank") == 2)

    assert(EvalMetrics.bradleyTerry(
      Seq.empty[(String, String)].toDF("winner", "loser"),
      "winner", "loser").count() == 0)
  }

  test("bradleyTerry: self-pairs are meaningless judgments and never bias the fit") {
    // a (winner == loser) row would inflate the player's wins AND
    // double-count in the symmetric match fold — the fit must be
    // byte-identical with and without them
    val clean = (Seq.fill(3)(("A", "B")) :+ (("B", "A")))
      .toDF("winner", "loser")
    val dirty = clean.union(
      Seq(("A", "A"), ("B", "B"), ("B", "B")).toDF("winner", "loser"))
    val want = EvalMetrics.bradleyTerry(clean, "winner", "loser")
      .collect().map(_.toSeq).toSet
    val got = EvalMetrics.bradleyTerry(dirty, "winner", "loser")
      .collect().map(_.toSeq).toSet
    assert(got == want, s"self-pairs biased the fit: $got != $want")
    // all-self-pair input: no real judgment anywhere → empty ranking
    assert(EvalMetrics.bradleyTerry(
      Seq(("A", "A")).toDF("winner", "loser"),
      "winner", "loser").count() == 0)
  }

  test("bootstrapCi: draws replay a local md5 simulation; zero-width and empty cases") {
    val scores = Seq((10L, 5L), (20L, 9L), (30L, 1L), (40L, 7L))
      .toDF("id", "v")
    val out = EvalMetrics.bootstrapCi(scores, "id", "v", nBoot = 8,
      seed = "t", loBp = 2500, hiBp = 7500).collect().head
    // local replay of the exact draw rule: slot order by id →
    // values (5, 9, 1, 7); draw = first 8 md5 hex chars of
    // "t:<b>:<slot>" mod n
    def draw(b: Long, slot: Long): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"t:$b:$slot".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex.substring(0, 8), 16) % 4).toInt
    }
    val vals = Array(5L, 9L, 1L, 7L)
    val means = (0 until 8)
      .map(b => (0 until 4).map(i => vals(draw(b.toLong, i.toLong))).sum / 4L)
      .sorted
    assert(out.getAs[Long]("n") == 4 && out.getAs[Long]("n_boot") == 8)
    assert(out.getAs[Long]("mean_micro") == 22L / 4)
    def rk(bp: Int) = math.max((bp.toLong * 8 + 9999) / 10000, 1L).toInt - 1
    assert(out.getAs[Long]("ci_lo_micro") == means(rk(2500)) &&
      out.getAs[Long]("ci_hi_micro") == means(rk(7500)),
      s"ci != local sim: $out vs $means")
    // identical scores: zero-width interval at the value
    val flat = EvalMetrics.bootstrapCi(
      Seq((1L, 3L), (2L, 3L)).toDF("id", "v"), "id", "v", nBoot = 5)
      .collect().head
    assert(flat.getAs[Long]("ci_lo_micro") == 3 &&
      flat.getAs[Long]("ci_hi_micro") == 3 &&
      flat.getAs[Long]("mean_micro") == 3)
    // empty input: empty frame, not a crash
    assert(EvalMetrics.bootstrapCi(
      Seq.empty[(Long, Long)].toDF("id", "v"), "id", "v").count() == 0)
  }

  test("cohenKappaPairs: hand-computed per-pair kappa — chance, perfect disagreement, minCommon floor") {
    // raters over items 1..4: A = (x,x,y,y), B = (x,y,y,x),
    // C = (y,y,x,x). A-B agree on 2/4 with balanced marginals → κ = 0;
    // A-C never agree, balanced marginals → κ = −1 exactly; B-C → 0.
    val r = Seq(
      (1L, "A", "x"), (2L, "A", "x"), (3L, "A", "y"), (4L, "A", "y"),
      (1L, "B", "x"), (2L, "B", "y"), (3L, "B", "y"), (4L, "B", "x"),
      (1L, "C", "y"), (2L, "C", "y"), (3L, "C", "x"), (4L, "C", "x"))
      .toDF("item", "rater", "label")
    val out = EvalMetrics.cohenKappaPairs(r, "item", "rater", "label")
      .collect()
      .map(x => (x.getAs[String]("rater_a"), x.getAs[String]("rater_b"))
        -> x).toMap
    assert(out.keySet == Set(("A", "B"), ("A", "C"), ("B", "C")))
    val ab = out(("A", "B"))
    assert(ab.getAs[Long]("n_common") == 4 &&
      ab.getAs[Long]("n_agree") == 2 &&
      ab.getAs[Long]("po_micro") == 500000 &&
      ab.getAs[Long]("pe_micro") == 500000 &&
      ab.getAs[Long]("kappa_micro") == 0)
    val ac = out(("A", "C"))
    assert(ac.getAs[Long]("n_agree") == 0 &&
      ac.getAs[Long]("kappa_micro") == -1000000)
    // pairs below the common-item floor vanish
    assert(EvalMetrics.cohenKappaPairs(r, "item", "rater", "label",
      minCommon = 5).count() == 0)
  }

  test("fleissKappa: hand-computed agreement, negative kappa, singleton items excluded everywhere") {
    // item A rated (x, x): P_A = 1; item B rated (x, y): P_B = 0
    // marginals over kept items: x=3/4, y=1/4 → pe = 625000 micro
    // pbar = 500000 → kappa = -125000·10⁶ // 375000 = -333333 (< chance)
    val r = Seq(("A", "x"), ("A", "x"), ("B", "x"), ("B", "y"))
      .toDF("item", "label")
    val out = EvalMetrics.fleissKappa(r, "item", "label").collect().head
    assert(out.getAs[Long]("n_items") == 2 &&
      out.getAs[Long]("n_ratings") == 4 &&
      out.getAs[Long]("pbar_micro") == 500000 &&
      out.getAs[Long]("pe_micro") == 625000 &&
      out.getAs[Long]("kappa_micro") == -333333)
    // a singleton item changes NOTHING — not the counts, not the
    // marginals (its label would otherwise shift pe)
    val withSingleton = r.union(Seq(("C", "z")).toDF("item", "label"))
    val out2 = EvalMetrics.fleissKappa(withSingleton, "item", "label")
      .collect().head
    assert(out2.getAs[Long]("n_items") == 2 &&
      out2.getAs[Long]("pe_micro") == 625000 &&
      out2.getAs[Long]("kappa_micro") == -333333)
    // perfect two-label agreement: kappa = 1 exactly
    val perfect = Seq(("A", "x"), ("A", "x"), ("B", "y"), ("B", "y"))
      .toDF("item", "label")
    assert(EvalMetrics.fleissKappa(perfect, "item", "label")
      .collect().head.getAs[Long]("kappa_micro") == 1000000)
    // no item with 2+ ratings: empty report, not a div-by-zero
    assert(EvalMetrics.fleissKappa(
      Seq(("A", "x"), ("B", "y")).toDF("item", "label"),
      "item", "label").count() == 0)
  }

  test("retrievalEval: hand-computed nDCG/MRR/recall on a 3-rank list") {
    import graft.operators.EvalMetrics
    val ranking = Seq((1L, 1, 10L), (1L, 2, 20L), (1L, 3, 30L),
        (2L, 1, 10L), (2L, 2, 40L))
      .toDF("qid", "rank", "id")
    val relevant = Seq((1L, 20L), (1L, 30L), (1L, 99L)).toDF("qid", "id")
    val disc = EvalMetrics.dcgDiscountsMicro(3)
    val got = EvalMetrics.retrievalEval(ranking, relevant, k = 3)
      .collect().map(r => r.getLong(0) -> r).toMap
    val q1 = got(1L)
    assert(q1.getLong(1) == 3L) // n_rel
    assert(q1.getLong(2) == 2L) // hits at ranks 2, 3
    assert(q1.getInt(3) == 2)   // first hit rank
    val dcg = disc(1) + disc(2)
    val idcg = disc.sum // min(n_rel=3, k=3) ranks
    assert(q1.getLong(4) == dcg && q1.getLong(5) == idcg)
    assert(q1.getDouble(6) ==
      math.rint(2.0 / 3 * 1e6) / 1e6) // precision@3
    assert(q1.getDouble(7) ==
      math.rint(2.0 / 3 * 1e6) / 1e6) // recall
    assert(q1.getDouble(8) == 0.5)    // rr
    assert(q1.getDouble(9) ==
      math.rint(dcg.toDouble / idcg * 1e6) / 1e6)
    // q2: no relevance at all -> zero hits, null recall/ndcg, rr 0
    val q2 = got(2L)
    assert(q2.getLong(1) == 0L && q2.getLong(2) == 0L)
    assert(q2.isNullAt(3) && q2.getLong(4) == 0L && q2.getLong(5) == 0L)
    assert(q2.getDouble(8) == 0.0)
    assert(q2.isNullAt(7) && q2.isNullAt(9))
  }

  test("rocAuc: hand-computed tie-corrected AUC; degenerate single-class input yields null") {
    // pos scores {3, 2, 2}, neg scores {2, 1}: 4 wins, 2 ties of the 6
    // pairs -> AUC = (4 + 2/2)/6 = 0.8333…
    val df = Seq((3L, true), (2L, true), (2L, true), (2L, false),
      (1L, false)).toDF("s", "y")
    val r = EvalMetrics.rocAuc(df, "s", "y").collect().head
    assert(r.getAs[Long]("n_pos") == 3 && r.getAs[Long]("n_neg") == 2)
    assert(r.getAs[Long]("win_pairs") == 4 &&
      r.getAs[Long]("tie_pairs") == 2)
    assert(r.getAs[Long]("auc_micro") == 833333L)
    // perfect separation = exactly 10^6; reversed = 0
    val sep = Seq((9L, true), (1L, false)).toDF("s", "y")
    assert(EvalMetrics.rocAuc(sep, "s", "y").collect().head
      .getAs[Long]("auc_micro") == 1000000L)
    // all one class: AUC undefined -> null, not a crash
    val one = Seq((1L, true), (2L, true)).toDF("s", "y")
    val r1 = EvalMetrics.rocAuc(one, "s", "y").collect().head
    assert(r1.isNullAt(r1.fieldIndex("auc_micro")))
  }

  test("rocAucFromCounts: merged per-slice count deltas equal the full-data AUC exactly") {
    val full = Seq((3L, true), (2L, true), (2L, true), (2L, false),
      (1L, false), (4L, false), (1L, true)).toDF("s", "y")
    def cnt(f: org.apache.spark.sql.DataFrame) = f.groupBy(col("s"))
      .agg(sum(when(col("y"), 1L).otherwise(0L)).as("np"),
        sum(when(col("y"), 0L).otherwise(1L)).as("ng"))
    val whole = EvalMetrics.rocAuc(full, "s", "y")
      .collect().head.toSeq
    // overlapping-score slices arrive as separate delta tables
    val sliceA = full.limit(3)
    val sliceB = full.exceptAll(sliceA)
    val merged = EvalMetrics.rocAucFromCounts(
        cnt(sliceA).unionByName(cnt(sliceB)))
      .collect().head.toSeq
    assert(merged == whole, s"merge drifted: $merged vs $whole")
  }

  test("averagePrecision: hand-computed AP with deterministic id tiebreak; no positives yields null") {
    // rank order (score desc, id): id1(+), id2(-), id3(+), id4(-)
    // AP = (P@1 + P@3)/2 = (1e6 + 666666)/2 -> floor 833333
    val df = Seq((1L, 0.9, true), (2L, 0.8, false), (3L, 0.7, true),
      (4L, 0.6, false)).toDF("id", "s", "y")
    val r = EvalMetrics.averagePrecision(df, "id", "s", "y")
      .collect().head
    assert(r.getAs[Long]("n") == 4 && r.getAs[Long]("n_pos") == 2)
    assert(r.getAs[Long]("ap_micro") == 833333L)
    val none = Seq((1L, 0.9, false)).toDF("id", "s", "y")
    val r0 = EvalMetrics.averagePrecision(none, "id", "s", "y")
      .collect().head
    assert(r0.isNullAt(r0.fieldIndex("ap_micro")))
  }

  test("confusion: per-class tp/fp/fn and exact micro P/R/F1, including never-predicted and invented classes") {
    val df = Seq(("a", "a"), ("a", "b"), ("b", "b"), ("b", "b"),
      ("c", "b")).toDF("actual", "pred")
    val m = EvalMetrics.confusion(df, "actual", "pred")
      .collect().map(r => r.getAs[String]("label") -> r).toMap
    assert(m.keySet == Set("a", "b", "c"))
    val a = m("a")
    assert(a.getAs[Long]("tp") == 1 && a.getAs[Long]("fp") == 0 &&
      a.getAs[Long]("fn") == 1)
    assert(a.getAs[Long]("precision_micro") == 1000000L &&
      a.getAs[Long]("recall_micro") == 500000L &&
      a.getAs[Long]("f1_micro") == 666666L)
    val b = m("b")
    assert(b.getAs[Long]("tp") == 2 && b.getAs[Long]("fp") == 2 &&
      b.getAs[Long]("fn") == 0)
    assert(b.getAs[Long]("precision_micro") == 500000L &&
      b.getAs[Long]("recall_micro") == 1000000L &&
      b.getAs[Long]("f1_micro") == 666666L)
    // c is never predicted: precision null, recall 0, f1 0
    val c = m("c")
    assert(c.isNullAt(c.fieldIndex("precision_micro")) &&
      c.getAs[Long]("recall_micro") == 0L &&
      c.getAs[Long]("f1_micro") == 0L)
  }

  test("mcnemarPaired: discordant-pair statistic with continuity correction; zero discordants yield null") {
    val df = Seq((true, true), (true, false), (true, false),
      (false, true), (false, false)).toDF("a", "b")
    val r = EvalMetrics.mcnemarPaired(df, "a", "b").collect().head
    assert(r.getAs[Long]("both_right") == 1 &&
      r.getAs[Long]("both_wrong") == 1 &&
      r.getAs[Long]("a_only") == 2 && r.getAs[Long]("b_only") == 1)
    // (|2-1|-1)^2 * 1e6 / 3 = 0
    assert(r.getAs[Long]("chi2_micro") == 0L)
    // 5 vs 1 discordants: (4-1)^2... (|5-1|-1)^2 = 9 -> 9e6/6
    val skew = (Seq.fill(5)((true, false)) :+ ((false, true)))
      .toDF("a", "b")
    assert(EvalMetrics.mcnemarPaired(skew, "a", "b").collect().head
      .getAs[Long]("chi2_micro") == 1500000L)
    val agree = Seq((true, true), (false, false)).toDF("a", "b")
    val r0 = EvalMetrics.mcnemarPaired(agree, "a", "b").collect().head
    assert(r0.isNullAt(r0.fieldIndex("chi2_micro")))
  }

  test("passAtK: unbiased estimator matches the combinatorial form; short-circuits and exclusions") {
    // task t1: n=5, c=2, k=3 -> 1 - C(3,3)/C(5,3) = 0.9
    // task t2: n=4, c=3 -> n-c < k -> exactly 1
    // task t3: n=2 < k -> excluded
    val rows =
      Seq.fill(2)(("t1", true)) ++ Seq.fill(3)(("t1", false)) ++
      Seq.fill(3)(("t2", true)) ++ Seq(("t2", false)) ++
      Seq(("t3", true), ("t3", false))
    val out = EvalMetrics.passAtK(rows.toDF("task", "ok"), "task", "ok",
        k = 3)
      .collect().map(r => r.getAs[String]("task") -> r).toMap
    assert(out.keySet == Set("t1", "t2"))
    assert(out("t1").getAs[Long]("pass_micro") == 900000L)
    assert(out("t2").getAs[Long]("pass_micro") == 1000000L)
    // k=1 reduces to c/n
    val k1 = EvalMetrics.passAtK(rows.toDF("task", "ok"), "task", "ok",
        k = 1)
      .collect().map(r => r.getAs[String]("task") -> r).toMap
    assert(k1("t1").getAs[Long]("pass_micro") == 400000L)
  }

  test("krippendorffAlpha: hand-computed nominal alpha over complete 2-rater panels; partial panels excluded") {
    // items i1(a,a) i2(a,b) i3(b,b) i4(b,b), plus i5 rated once (drops)
    val df = Seq(("i1", "r1", "a"), ("i1", "r2", "a"),
      ("i2", "r1", "a"), ("i2", "r2", "b"),
      ("i3", "r1", "b"), ("i3", "r2", "b"),
      ("i4", "r1", "b"), ("i4", "r2", "b"),
      ("i5", "r1", "a")).toDF("item", "rater", "lab")
    val r = EvalMetrics.krippendorffAlpha(df, "item", "rater", "lab",
      m = 2).collect().head
    assert(r.getAs[Long]("n_items") == 4 &&
      r.getAs[Long]("n_categories") == 2)
    // Do = 2/8 -> 250000; De = 30/56 -> 535714;
    // alpha = 1e6 - 250000e6 div 535714 = 533334
    assert(r.getAs[Long]("do_micro") == 250000L &&
      r.getAs[Long]("de_micro") == 535714L &&
      r.getAs[Long]("alpha_micro") == 533334L)
    // unanimous single category: De = 0 -> alpha null, not a crash
    val uni = Seq(("i1", "r1", "x"), ("i1", "r2", "x")).toDF(
      "item", "rater", "lab")
    val r0 = EvalMetrics.krippendorffAlpha(uni, "item", "rater", "lab",
      m = 2).collect().head
    assert(r0.isNullAt(r0.fieldIndex("alpha_micro")))
  }

  test("isotonicCalibration: PAV merges violating blocks; monotone input passes through") {
    val df = Seq.fill(2)((0L, false)).take(1) ++ Seq((0L, true)) ++
      Seq((1L, false), (1L, false)) ++ Seq((2L, true), (2L, true))
    val r = EvalMetrics.isotonicCalibration(
      df.toDF("b", "y"), "b", "y").collect()
      .map(x => x.getAs[Long]("bucket") -> x.getAs[Long]("iso_micro"))
      .toMap
    // rates 1/2, 0/2, 2/2: PAV pools the first two -> 1/4, 1/4, 1
    assert(r == Map(0L -> 250000L, 1L -> 250000L, 2L -> 1000000L))
    val mono = Seq((0L, false), (1L, true), (1L, false), (2L, true))
    val rm = EvalMetrics.isotonicCalibration(
      mono.toDF("b", "y"), "b", "y").collect()
      .map(x => x.getAs[Long]("bucket") -> x.getAs[Long]("iso_micro"))
      .toMap
    assert(rm == Map(0L -> 0L, 1L -> 500000L, 2L -> 1000000L))
  }

  test("isotonicCalibration: a cascading violation re-merges earlier blocks") {
    // rates 0.0, 1.0, 0.0: the third bucket first merges with the
    // second (1/2), which then still violates... nothing earlier (0 <=
    // 1/2), stop. Expect 0, 1/2, 1/2.
    val df = Seq((0L, false), (1L, true), (2L, false))
    val r = EvalMetrics.isotonicCalibration(
      df.toDF("b", "y"), "b", "y").collect()
      .map(x => x.getAs[Long]("bucket") -> x.getAs[Long]("iso_micro"))
      .toMap
    assert(r == Map(0L -> 0L, 1L -> 500000L, 2L -> 500000L))
  }

  test("conformalCoverage: hand-computed threshold and coverage; tiny calibration set goes +inf") {
    val rows = Seq(
      ("g", 10L, true), ("g", 20L, true), ("g", 30L, true),
      ("g", 40L, true), ("g", 50L, true),
      ("g", 25L, false), ("g", 45L, false), ("g", 30L, false),
      ("h", 99L, false) // no calibration model for h: dropped
    ).toDF("g", "x", "is_cal")
    val r = EvalMetrics.conformalCoverage(rows, "g", "x", "is_cal",
      alphaMicro = 500000L).collect().head
    // mean 30e6; cal residuals 20,10,0,10,20 (e6); k=ceil(6*.5)=3 ->
    // q_hat=10e6; test residuals 5e6 (in), 15e6 (out), 0 (in)
    assert(r.getAs[Long]("n_cal") == 5 && r.getAs[Long]("n_test") == 3)
    assert(r.getAs[Long]("k") == 3 &&
      r.getAs[Long]("q_hat") == 10000000L)
    assert(r.getAs[Long]("n_covered") == 2 &&
      r.getAs[Long]("coverage_micro") == 666666L)
    // alpha=0.1 with n_cal=5 -> k=6 > n_cal: threshold +inf, NULL
    // q_hat, every test row covered
    val r2 = EvalMetrics.conformalCoverage(rows, "g", "x", "is_cal",
      alphaMicro = 100000L).collect().head
    assert(r2.getAs[Long]("k") == 6 &&
      r2.isNullAt(r2.fieldIndex("q_hat")))
    assert(r2.getAs[Long]("n_covered") == 3 &&
      r2.getAs[Long]("coverage_micro") == 1000000L)
  }

  test("mcc: perfect, uninformative, and undefined-margin cases") {
    val perfect = Seq((true, true), (false, false)).toDF("a", "p")
    val r = EvalMetrics.mcc(perfect, "a", "p").collect().head
    assert(r.getAs[Long]("mcc_micro") == 1000000L)
    val coin = Seq((true, true), (true, false), (false, false),
      (false, true)).toDF("a", "p")
    assert(EvalMetrics.mcc(coin, "a", "p").collect().head
      .getAs[Long]("mcc_micro") == 0L)
    // all-positive actuals: a zero margin leaves MCC undefined
    val onesided = Seq((true, true), (true, false)).toDF("a", "p")
    val r0 = EvalMetrics.mcc(onesided, "a", "p").collect().head
    assert(r0.isNullAt(r0.fieldIndex("mcc_micro")))
  }

  test("expectedCalibrationError: hand bins, mass weighting, worst bin; perfect calibration is 0") {
    // scores 50k(y=0) -> bin 0 gap 50k; two 950k (one right) -> bin 9
    // conf 950k acc 500k gap 450k; ece = (1*50k + 2*450k) div 3
    val df = Seq((50000L, false), (950000L, true), (950000L, false))
      .toDF("sm", "y")
    val r = EvalMetrics.expectedCalibrationError(df, "sm", "y")
      .collect().head
    assert(r.getAs[Long]("n") == 3L &&
      r.getAs[Long]("n_bins_used") == 2L)
    assert(r.getAs[Long]("ece_micro") == 316666L)
    assert(r.getAs[Long]("max_gap_micro") == 450000L &&
      r.getAs[Long]("max_gap_bin") == 9L)
    // a perfectly calibrated bin: conf == acc -> ece 0; score 1e6
    // folds into the top bin (closed right edge)
    val perfect = Seq((1000000L, true), (0L, false)).toDF("sm", "y")
    val rp = EvalMetrics.expectedCalibrationError(perfect, "sm", "y")
      .collect().head
    assert(rp.getAs[Long]("ece_micro") == 0L &&
      rp.getAs[Long]("n_bins_used") == 2L)
  }

  test("brierDecomposition: hand-folded reliability/resolution/uncertainty") {
    // same 3 rows as the ECE case: obar = 333333, rel =
    // (1*50000^2 + 2*450000^2) div 3e6 = 135833, res =
    // (1*obar^2 + 2*(500000-obar)^2) div 3e6 = 55555, unc =
    // obar*(1e6-obar) div 1e6 = 222222
    val df = Seq((50000L, false), (950000L, true), (950000L, false))
      .toDF("sm", "y")
    val r = EvalMetrics.brierDecomposition(df, "sm", "y").collect().head
    assert(r.getAs[Long]("n") == 3L &&
      r.getAs[Long]("obar_micro") == 333333L)
    assert(r.getAs[Long]("reliability_micro") == 135833L)
    assert(r.getAs[Long]("resolution_micro") == 55555L)
    assert(r.getAs[Long]("uncertainty_micro") == 222222L)
  }
}

package graft

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
}

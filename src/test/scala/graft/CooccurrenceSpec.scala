package graft

import graft.operators.Cooccurrence

class CooccurrenceSpec extends GraftSpec {
  import spark.implicits._

  private def run(obs: Seq[(String, String)], minCo: Long = 2L)
      : Map[(String, String), (Long, Long, Long, Double)] =
    Cooccurrence.jaccardPairs(obs.toDF("g", "i"), "g", "i", minCo)
      .as[(String, String, Long, Long, Long, Double)].collect()
      .map { case (a, b, n1, n2, co, j) => (a, b) -> ((n1, n2, co, j)) }
      .toMap

  test("hand-computed Jaccard with support filter") {
    val obs = Seq(
      "g1" -> "a", "g1" -> "b",
      "g2" -> "a", "g2" -> "b",
      "g3" -> "a")
    // (a,b): co=2, n_a=3, n_b=2 -> J = 2/(3+2-2) = 2/3
    assert(run(obs) == Map(("a", "b") -> ((3L, 2L, 2L, 0.666667))))
  }

  test("pairs below minCo are cut before the joins") {
    val obs = Seq("g1" -> "a", "g1" -> "b", "g2" -> "c", "g2" -> "a")
    assert(run(obs, minCo = 2L).isEmpty)
    // with minCo=1 both pairs appear, items ordered within each pair
    val r = run(obs, minCo = 1L)
    assert(r.keySet == Set(("a", "b"), ("a", "c")))
    assert(r(("a", "b")) == ((2L, 1L, 1L, 0.5)))
  }

  test("duplicate observations collapse (distinct group-item pairs)") {
    val obs = Seq("g1" -> "a", "g1" -> "a", "g1" -> "b",
      "g2" -> "a", "g2" -> "b", "g2" -> "b")
    assert(run(obs) == Map(("a", "b") -> ((2L, 2L, 2L, 1.0))))
  }

  test("identical group sets give Jaccard exactly 1") {
    val obs = Seq("g1" -> "x", "g1" -> "y", "g2" -> "x", "g2" -> "y",
      "g3" -> "x", "g3" -> "y")
    assert(run(obs)(("x", "y")) == ((3L, 3L, 3L, 1.0)))
  }
}

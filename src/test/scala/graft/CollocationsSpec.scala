package graft

import graft.operators.Collocations

class CollocationsSpec extends GraftSpec {
  import spark.implicits._

  private def run(texts: Seq[String], minCount: Long)
      : Map[String, (Long, Long, Long, Double)] =
    Collocations.pmiBigrams(texts.toDF("text"), "text", minCount)
      .as[(String, Long, Long, Long, Double)].collect()
      .map { case (b, cb, c1, c2, p) => b -> ((cb, c1, c2, p)) }.toMap

  test("hand-computed PMI on a toy corpus") {
    // unigrams: a:3 b:3 c:1 (Nu=7); bigrams: 'a b':3 'b a':1 'b c':1 (Nb=5)
    val r = run(Seq("a b a b", "a b c"), minCount = 2L)
    assert(r.keySet == Set("a b"))
    val (cb, c1, c2, pmi) = r("a b")
    assert((cb, c1, c2) == ((3L, 3L, 3L)))
    val expect = math.rint(math.log(
      (3.0 / 5) / ((3.0 / 7) * (3.0 / 7))) * 1e4) / 1e4
    assert(pmi == expect)
  }

  test("attraction ranks above weaker attraction; unseen pairs are " +
    "absent") {
    // 'x y' always adjacent; x never neighbors z
    val r = run(Seq("x y x y x y", "z w z w z w"), minCount = 1L)
    assert(r("x y")._4 > 0.5)
    assert(!r.contains("x z"))
    assert(r("y x")._4 < r("x y")._4)
  }

  test("support filter: bigrams below minCount never reach the output") {
    val r = run(Seq("a b c d"), minCount = 2L)
    assert(r.isEmpty)
  }

  test("bigram totals come from the raw stream, not the filtered set") {
    // two docs; only 'a a' survives the filter, but Nb counts all 4
    // bigrams — pmi('a a') = ln((2/4) / ((4/6)*(4/6))) with Nu=6
    val r = run(Seq("a a a", "a b c"), minCount = 2L)
    val expect = math.rint(math.log(
      (2.0 / 4) / ((4.0 / 6) * (4.0 / 6))) * 1e4) / 1e4
    assert(r == Map("a a" -> ((2L, 4L, 4L, expect))))
  }
}

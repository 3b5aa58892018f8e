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

  test("llrBigrams: four-term G2 against the hand formula; zero cells contribute 0") {
    val docs = (Seq.fill(20)("a b") ++ Seq.fill(10)("a c") ++
      Seq.fill(10)("d b")).toDF("text")
    val r = Collocations.llrBigrams(docs, "text", minCount = 10L)
      .collect().map(x => x.getAs[String]("bigram") -> x).toMap
    assert(r.keySet == Set("a b", "a c", "d b"))
    val ab = r("a b")
    assert(ab.getAs[Long]("o11") == 20 && ab.getAs[Long]("o12") == 10 &&
      ab.getAs[Long]("o21") == 10 && ab.getAs[Long]("o22") == 0)
    def t(o: Long, rs: Long, cs: Long): Double =
      if (o == 0) 0.0
      else math.rint(2.0 * o * math.log(o * 40.0 / (rs.toDouble * cs)) * 1e6) / 1e6
    val expect = t(20, 30, 30) + t(10, 30, 10) + t(10, 10, 30) + t(0, 10, 10)
    assert(ab.getAs[Double]("llr") == expect)
  }

  test("adjacencyEdges: canonical distinct pairs; support filter needs BOTH endpoints") {
    val docs = Seq("x y z x").toDF("text")
    val e1 = Collocations.adjacencyEdges(docs, "text", minCount = 1L)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(e1 == Set(("x", "y"), ("y", "z"), ("x", "z")))
    // only x reaches count 2: no edge has both endpoints above support
    val e2 = Collocations.adjacencyEdges(docs, "text", minCount = 2L)
    assert(e2.count() == 0)
  }

  test("vocabOverlap: pairwise Jaccard with zero-overlap rows present") {
    val docs = Seq(("g1", "a b c"), ("g2", "b c d"), ("g3", "x"))
      .toDF("source", "text")
    val r = Collocations.vocabOverlap(docs, "text", "source")
      .collect().map(x => (x.getAs[String]("a"), x.getAs[String]("b")) ->
        (x.getAs[Long]("n_common"), x.getAs[Long]("jaccard_micro"))).toMap
    assert(r == Map(
      ("g1", "g2") -> ((2L, 500000L)),
      ("g1", "g3") -> ((0L, 0L)),
      ("g2", "g3") -> ((0L, 0L))))
  }

  test("zipfHead: top-k mass shares with (count desc, token asc) rank") {
    val docs = Seq("a a a b b c").toDF("text")
    val r = Collocations.zipfHead(docs, "text", Seq(1, 2)).collect()
      .map(x => x.getAs[Long]("k") ->
        (x.getAs[Long]("n_tokens"), x.getAs[Long]("head_mass"),
          x.getAs[Long]("share_micro"))).toMap
    assert(r == Map(1L -> ((1L, 3L, 500000L)),
      2L -> ((2L, 5L, 833333L))))
  }
}

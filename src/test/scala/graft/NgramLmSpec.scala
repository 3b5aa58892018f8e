package graft

import graft.operators.NgramLm

/** Kneser–Ney bigram LM: hand-computed counts, marginals, and integer
  * micro-probabilities, plus the OOV backoff ladder scoreDocs applies
  * to bigrams the model never saw. */
class NgramLmSpec extends GraftSpec {
  import spark.implicits._

  // corpus: "a b a b c" + "b a" →
  //   pair counts: (a,b)=2, (b,a)=2, (b,c)=1; T = 3 distinct bigrams
  //   left marginals: a → c1=2, N1+(a·)=1;  b → c1=3, N1+(b·)=2
  //   right marginals: N1+(·a)=N1+(·b)=N1+(·c)=1 → cont_micro=333333
  //   p_micro(a,b) = 5000000//8  + 999999//8  = 625000 + 124999 = 749999
  //   p_micro(b,a) = 5000000//12 + 1999998//12 = 416666 + 166666 = 583332
  //   p_micro(b,c) = 1000000//12 + 1999998//12 =  83333 + 166666 = 249999
  private def corpus = Seq(
    (1L, "a b a b c"), (2L, "b a")).toDF("doc_id", "text")

  test("train: hand-computed KN counts and micro-probabilities") {
    val m = NgramLm.train(corpus, "doc_id", "text")
      .collect()
      .map(r => (r.getAs[String]("w1"), r.getAs[String]("w2")) -> r)
      .toMap
    assert(m.keySet == Set(("a", "b"), ("b", "a"), ("b", "c")))
    val ab = m(("a", "b"))
    assert(ab.getAs[Long]("c12") == 2 && ab.getAs[Long]("c1") == 2 &&
      ab.getAs[Long]("n1p_left") == 1 &&
      ab.getAs[Long]("n1p_right") == 1 &&
      ab.getAs[Long]("cont_micro") == 333333 &&
      ab.getAs[Long]("p_micro") == 749999)
    assert(m(("b", "a")).getAs[Long]("p_micro") == 583332)
    assert(m(("b", "c")).getAs[Long]("p_micro") == 249999)
    // probabilities stay inside (0, 1e6]
    assert(m.values.forall { r =>
      val p = r.getAs[Long]("p_micro"); p > 0 && p <= 1000000 })
  }

  test("scoreDocs: same-corpus scoring hits every bigram with exact integer sums") {
    val model = NgramLm.train(corpus, "doc_id", "text")
    val s = NgramLm.scoreDocs(corpus, "doc_id", "text", model)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val d1 = s(1L)
    assert(d1.getAs[Long]("n_bigrams") == 4 &&
      d1.getAs[Long]("n_hits") == 4 &&
      d1.getAs[Long]("sum_p_micro") == 749999L * 2 + 583332 + 249999 &&
      d1.getAs[Long]("min_p_micro") == 249999)
    val d2 = s(2L)
    assert(d2.getAs[Long]("n_bigrams") == 1 &&
      d2.getAs[Long]("sum_p_micro") == 583332)
  }

  test("scoreDocs: the OOV backoff ladder — unseen pair, unseen context, unseen continuation") {
    val model = NgramLm.train(corpus, "doc_id", "text")
    val oov = Seq(
      (10L, "a c"),  // unseen pair, seen context a: 3·1·333333//8
      (11L, "z a"),  // unseen context z: bare cont_micro(a)
      (12L, "z q"))  // nothing seen: 0
      .toDF("doc_id", "text")
    val s = NgramLm.scoreDocs(oov, "doc_id", "text", model)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(s(10L).getAs[Long]("n_hits") == 0 &&
      s(10L).getAs[Long]("sum_p_micro") == 124999)
    assert(s(11L).getAs[Long]("sum_p_micro") == 333333)
    assert(s(12L).getAs[Long]("sum_p_micro") == 0)
  }

  test("incremental refit: merged per-slice count deltas equal the full-corpus model exactly") {
    val extra = Seq((3L, "b c b"), (4L, "a b")).toDF("doc_id", "text")
    val full = NgramLm.train(corpus.union(extra), "doc_id", "text")
      .collect().map(_.toSeq).toSet
    // slices overlap in vocabulary (shared bigrams must re-sum) and
    // arrive as separate delta tables
    val merged = NgramLm.trainFromCounts(
      NgramLm.pairCounts(corpus, "doc_id", "text")
        .unionByName(NgramLm.pairCounts(extra, "doc_id", "text")))
      .collect().map(_.toSeq).toSet
    assert(merged == full,
      s"incremental refit drifted:\n$merged\nvs\n$full")
  }

  test("persistence is caller-owned: two live models stay cached side by side; unpersistModel releases") {
    import org.apache.spark.storage.StorageLevel
    val m1 = NgramLm.train(corpus, "doc_id", "text")
    val m2 = NgramLm.train(
      Seq((5L, "x y x")).toDF("doc_id", "text"), "doc_id", "text")
    // the old module-level single-slot cache unpersisted m1 when m2
    // trained — both must remain cached now
    assert(m1.storageLevel != StorageLevel.NONE, "m1 lost its cache")
    assert(m2.storageLevel != StorageLevel.NONE, "m2 never cached")
    // and both stay correct (m1 still scores its own corpus)
    assert(NgramLm.scoreDocs(corpus, "doc_id", "text", m1).count() > 0)
    NgramLm.unpersistModel(m1)
    NgramLm.unpersistModel(m2)
    assert(m1.storageLevel == StorageLevel.NONE &&
      m2.storageLevel == StorageLevel.NONE)
  }

  test("trainTrigram: hand-computed interpolated KN trigram micro-probabilities") {
    // corpus: "a b c a b c" + "a b d"
    // distinct trigrams: abc(2) bca(1) cab(1) abd(1); T = 4 distinct
    // (w2,w3); every cont_micro = 250000
    val tri = Seq((1L, "a b c a b c"), (2L, "a b d"))
      .toDF("doc_id", "text")
    val modelDf = NgramLm.trainTrigram(tri, "doc_id", "text")
    val m = modelDf.collect()
      .map(r => (r.getAs[String]("w1"), r.getAs[String]("w2"),
        r.getAs[String]("w3")) -> r).toMap
    assert(m.size == 4)
    val abc = m(("a", "b", "c"))
    assert(abc.getAs[Long]("c123") == 2 && abc.getAs[Long]("c12") == 3 &&
      abc.getAs[Long]("n1p_12") == 2)
    // pkn2(b,c): 1e6 div 8 + 3*2*250000 div 8 = 125000 + 187500
    assert(abc.getAs[Long]("pkn2_micro") == 312500L)
    // p: g(4*2-3)*1e6 div 12 + 3*2*312500 div 12 = 416666 + 156250
    assert(abc.getAs[Long]("p_micro") == 572916L)
    assert(m(("b", "c", "a")).getAs[Long]("p_micro") == 578125L)
    assert(m(("c", "a", "b")).getAs[Long]("p_micro") == 578125L)
    // abd shares the (a,b) prefix: 1e6 div 12 + 156250
    assert(m(("a", "b", "d")).getAs[Long]("p_micro") == 239583L)
    NgramLm.unpersistModel(modelDf)
  }

  test("scoreDocsTrigram: same-corpus hits and the four-rung OOV backoff ladder") {
    val corpus3 = Seq((1L, "a b c a b c"), (2L, "a b d"))
      .toDF("doc_id", "text")
    val model = NgramLm.trainTrigram(corpus3, "doc_id", "text")
    val self = NgramLm.scoreDocsTrigram(corpus3, "doc_id", "text", model)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(self(1L).getAs[Long]("n_trigrams") == 4 &&
      self(1L).getAs[Long]("n_hits") == 4 &&
      self(1L).getAs[Long]("sum_p_micro") ==
        572916L * 2 + 578125L * 2 &&
      self(1L).getAs[Long]("min_p_micro") == 572916L)
    assert(self(2L).getAs[Long]("sum_p_micro") == 239583L)
    // ladder: seen prefix/unseen pair; unseen prefix/seen cont;
    // fully unseen
    val oov = Seq((10L, "a b a"), (11L, "x y c"), (12L, "x y z"))
      .toDF("doc_id", "text")
    val s = NgramLm.scoreDocsTrigram(oov, "doc_id", "text", model)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // (a,b,a): prefix backoff into the pair level's own backoff:
    // _p2 = 3*2*250000 div 8 = 187500; _p = 3*2*187500 div 12 = 93750
    assert(s(10L).getAs[Long]("n_hits") == 0 &&
      s(10L).getAs[Long]("sum_p_micro") == 93750L)
    assert(s(11L).getAs[Long]("sum_p_micro") == 250000L)
    assert(s(12L).getAs[Long]("sum_p_micro") == 0L)
    NgramLm.unpersistModel(model)
  }

  test("trigram incremental refit: merged per-slice deltas equal the full model; short docs are safe") {
    val a = Seq((1L, "a b c a b c")).toDF("doc_id", "text")
    val b = Seq((2L, "a b d"), (3L, "a b"), (4L, "")).toDF("doc_id", "text")
    val full = NgramLm.trainTrigram(a.union(b), "doc_id", "text")
    val merged = NgramLm.trainTrigramFromCounts(
      NgramLm.trigramCounts(a, "doc_id", "text")
        .unionByName(NgramLm.trigramCounts(b, "doc_id", "text")))
    assert(merged.collect().map(_.toSeq).toSet ==
      full.collect().map(_.toSeq).toSet)
    // sub-3-word docs produce no trigrams anywhere
    assert(NgramLm.scoreDocsTrigram(
      Seq((9L, "a b")).toDF("doc_id", "text"), "doc_id", "text",
      full).count() == 0)
    NgramLm.unpersistModel(full)
    NgramLm.unpersistModel(merged)
  }

  test("empty and single-word docs produce no bigrams, not errors") {
    val model = NgramLm.train(corpus, "doc_id", "text")
    val d = Seq((20L, ""), (21L, "a")).toDF("doc_id", "text")
    assert(NgramLm.scoreDocs(d, "doc_id", "text", model).count() == 0)
    assert(NgramLm.train(d, "doc_id", "text").count() == 0)
  }

  test("ngramNovelty: hand-computed per-source df==1 shares; short docs excluded") {
    // d1 "x y z w": trigrams {x y z, y z w}; d2 "x y z": {x y z};
    // d3 "p q r": {p q r}; d4 "a b": no trigram (excluded from n_docs)
    // df: "x y z"->2 docs, "y z w"->1, "p q r"->1
    val docs = Seq(
      (1L, "x y z w", "A"), (2L, "x y z", "A"),
      (3L, "p q r", "B"), (4L, "a b", "A")).toDF("doc_id", "text", "src")
    val r = NgramLm.ngramNovelty(docs, "doc_id", "text", "src")
      .collect()
      .map(x => x.getString(0) -> ((x.getAs[Long]("n_docs"),
        x.getAs[Long]("n_trigrams"), x.getAs[Long]("n_novel"),
        x.getAs[Long]("n_fully_novel"),
        x.getAs[Long]("novelty_micro")))).toMap
    // A: d1 (2 tg, 1 novel), d2 (1 tg, 0 novel) -> 1e6/3 = 333333,
    // no fully-novel doc; B: d3 is 1/1 novel -> 1e6, fully novel
    assert(r("A") == ((2L, 3L, 1L, 0L, 333333L)))
    assert(r("B") == ((1L, 1L, 1L, 1L, 1000000L)))
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.KeywordSearch

/** BM25 / TF-IDF keyword retrieval: hand-computed scores on a tiny
  * corpus, rare-term dominance, and the plan-shape contract for the
  * per-doc cut. */
class KeywordSearchSpec extends GraftSpec {
  import spark.implicits._

  private val corpus = Seq(
    (0L, "apple apple banana"),          // tf(apple)=2, dl=3
    (1L, "apple cherry cherry cherry"),  // tf(apple)=1, dl=4
    (2L, "banana banana banana"),        // no query term
    (3L, "durian apple")                 // rare term, dl=2
  ).toDF("doc_id", "text")

  private def idf(nDocs: Long, df: Long): Double =
    math.log(1.0 + (nDocs - df + 0.5) / (df + 0.5))

  private def bm25Term(tf: Long, dl: Int, avgdl: Double,
                       nDocs: Long, df: Long): Double =
    idf(nDocs, df) * (tf * 2.2) /
      (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))

  test("bm25: scores match the formula at 4 dp; non-matching docs drop") {
    val got = KeywordSearch.bm25(corpus, "doc_id", "text",
        Seq("apple", "durian"), topK = 10)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    assert(!got.contains(2L)) // no query term -> not retrieved
    val avgdl = (3 + 4 + 3 + 2) / 4.0
    val exp0 = bm25Term(2, 3, avgdl, 4, 3)                        // apple
    val exp3 = bm25Term(1, 2, avgdl, 4, 3) + bm25Term(1, 2, avgdl, 4, 1)
    assert(got(0L) == math.rint(exp0 * 1e4) / 1e4)
    assert(got(3L) == math.rint(exp3 * 1e4) / 1e4)
  }

  test("bm25: a rare term outranks a common one at equal tf") {
    // doc 3 has one 'durian' (df=1) + one 'apple'; doc 1 has one
    // 'apple' (df=3) only -> doc 3 must rank first
    val ranked = KeywordSearch.bm25(corpus, "doc_id", "text",
        Seq("apple", "durian"), topK = 2)
      .select("doc_id").as[Long].collect().toSeq
    assert(ranked.head == 3L)
  }

  test("tfIdfTopTerms: distinctive term tops its doc; ties break by term") {
    val got = KeywordSearch.tfIdfTopTerms(corpus, "doc_id", "text", topN = 1)
      .select("doc_id", "term").as[(Long, String)].collect().toMap
    assert(got(1L) == "cherry") // tf 3/4 and df 1 dominates apple
    assert(got(2L) == "banana")
    // doc 3: durian (df 1) beats apple (df 3) at equal tf
    assert(got(3L) == "durian")
  }

  test("tfIdfTopTerms: per-doc cut compiles to WindowGroupLimit") {
    val plan = KeywordSearch.tfIdfTopTerms(corpus, "doc_id", "text", topN = 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"))
  }
}

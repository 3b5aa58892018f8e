package graft

import org.apache.spark.sql.functions._

import graft.operators.HybridRetrieval

/** RRF fusion semantics on hand-built rankings, and the lexical
  * retriever's exact Jaccard + plan-shape contract. */
class HybridRetrievalSpec extends GraftSpec {
  import spark.implicits._

  test("rrf: present-in-both beats single-list; absent side adds zero") {
    // doc 10 is rank 2 lexically AND rank 2 semantically; doc 11 is
    // rank 1 lexically only; doc 12 rank 1 semantically only.
    // 1/62+1/62 = 0.032258 > 1/61 = 0.016393 -> doc 10 must win.
    val lex = Seq((0L, 11L, 1), (0L, 10L, 2)).toDF("qid", "id", "rank")
    val sem = Seq((0L, 12L, 1), (0L, 10L, 2)).toDF("qid", "id", "rank")
    val got = HybridRetrieval.rrf(lex, sem, topK = 3)
      .select("rank", "id", "rrf", "lex_rank", "sem_rank")
      .as[(Int, Long, Double, Long, Long)].collect().sortBy(_._1)
    assert(got.map(_._2).toSeq == Seq(10L, 11L, 12L))
    assert(got.head._3 == math.rint(2.0 / 62.0 * 1e6) / 1e6)
    assert(got.head._4 == 2L && got.head._5 == 2L)
    // single-list docs: the absent rank reports 0, ties break by id
    assert(got(1)._3 == got(2)._3 && got(1)._2 < got(2)._2)
  }

  test("jaccardTopK: exact set Jaccard, self excluded, id tiebreak") {
    val d = Seq(
      (0L, Seq("a", "b", "c")),
      (1L, Seq("a", "b", "c")),       // identical to query -> jaccard 1
      (2L, Seq("a", "b", "x", "b")),  // dup word: sets -> 2/4 = 0.5
      (3L, Seq("z", "a", "b"))        // also 2/4 = 0.5, ties after id 2
    ).toDF("id", "ws")
    val q = d.filter(col("id") === 0)
      .select(col("id").as("qid"), col("ws"))
    val got = HybridRetrieval.jaccardTopK(q, d, k = 3)
      .select("rank", "id", "jaccard").as[(Int, Long, Double)]
      .collect().sortBy(_._1)
    assert(got.toSeq == Seq((1, 1L, 1.0), (2, 2L, 0.5), (3, 3L, 0.5)))
  }

  test("jaccardTopK: per-query cut compiles to WindowGroupLimit") {
    val d = Seq((0L, Seq("a")), (1L, Seq("a")), (2L, Seq("b")))
      .toDF("id", "ws")
    val q = d.select(col("id").as("qid"), col("ws")).limit(1)
    val plan = HybridRetrieval.jaccardTopK(q, d, k = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"))
  }
}

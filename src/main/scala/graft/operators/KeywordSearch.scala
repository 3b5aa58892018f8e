package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BM25 keyword retrieval over a document corpus — the lexical half of
  * the retrieval surface (the `Similarity`/ANN family is the semantic
  * half; RAG-style pipelines run both and merge).
  *
  * Spark-first shape: the postings pass tokenizes + explodes the
  * corpus and filters to the query-term set IMMEDIATELY, so only
  * matching (doc, term) rows ever shuffle — the corpus text never
  * does. The matched frame is persisted because two tiny aggregates
  * hang off it (per-term document frequencies and the per-doc
  * scores); df comes back as a broadcast join (at most |queryTerms|
  * rows) and the cut is a TakeOrdered. Corpus stats (N, avgdl) are a
  * second columnar pass over just the text column reduced map-side to
  * two scalars — in a production index those are table metadata
  * maintained at ingest (see streaming/AnnIngest for that pattern),
  * so the ad-hoc form pays one extra scan, never a corpus shuffle.
  *
  * idf uses the Lucene/Robertson "plus one" form
  * ln(1 + (N - df + 0.5)/(df + 0.5)) — always positive, which matters
  * here because a common term can appear in more than half the corpus
  * and the classic form would go negative.
  *
  * Scores are rounded to 4 dp and the top-k ordering uses the ROUNDED
  * score with a doc_id tiebreak, so the cut is stable across runs and
  * engines (float sum order can wiggle the last ulp, not the 4th dp).
  */
object KeywordSearch {

  // deferred cache release (same pattern as Sampling.lastDsirCache):
  // the returned frame is lazy, so the matched frame must stay
  // persisted until the NEXT bm25 call.
  private var lastMatchedCache: Option[DataFrame] = None
  private var lastTfCache: Option[DataFrame] = None

  def bm25(docs: DataFrame, idCol: String, textCol: String,
           queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
           topK: Int = 50): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
        graft.functions.TextFunctions.words(col(textCol)).as("toks"))
      .withColumn("dl", size(col("toks")))
    val stats = toks.agg(count(lit(1)).as("n_docs"),
      avg(col("dl")).as("avgdl"))
    val matched = toks
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .persist()
    KeywordSearch.synchronized {
      lastMatchedCache.foreach(_.unpersist(false))
      lastMatchedCache = Some(matched)
    }
    val docFreq = matched.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
    val perTerm = matched
      .join(broadcast(docFreq), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5))))
      .withColumn("s",
        col("idf") * (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) *
            (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
    perTerm
      .groupBy(col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("n_terms"),
        sum(col("tf")).as("sum_tf"),
        round(sum(col("s")), 4).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topK)
  }

  /** TF-IDF top keywords per document — the keyword-extraction dual of
    * [[bm25]] (per-doc descriptive terms instead of per-query ranked
    * docs). Same single-scan shape; the full (term, df) table is small
    * (vocab-sized after the min-df floor) and broadcasts. The per-doc
    * cut compiles to WindowGroupLimit, so each map task ships at most
    * topN rows per doc. Scores round to 4 dp with a term tiebreak. */
  def tfIdfTopTerms(docs: DataFrame, idCol: String, textCol: String,
                    topN: Int = 3, minDf: Long = 1L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col(idCol).as("doc_id"),
        graft.functions.TextFunctions.words(col(textCol)).as("toks"))
      .withColumn("dl", size(col("toks")))
    val tf = toks
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .persist()
    KeywordSearch.synchronized {
      lastTfCache.foreach(_.unpersist(false))
      lastTfCache = Some(tf)
    }
    val nDocs = toks.agg(count(lit(1)).as("n_docs"))
    val docFreq = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
    val scored = tf
      .join(broadcast(docFreq), Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf", round(
        (col("tf").cast("double") / col("dl")) *
          log((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0))),
        4))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term"))
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topN)
      .select(col("doc_id"), col("term"), col("tf"), col("tfidf"),
        col("rnk"))
  }
}

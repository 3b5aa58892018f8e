package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: fuse a lexical ranking and a semantic ranking
  * with reciprocal rank fusion (RRF, Cormack et al. 2009 — the fusion
  * rule Elasticsearch/OpenSearch ship for "hybrid search").
  *
  * RRF only consumes RANKS, never raw scores, which is what makes the
  * fusion engine-exact: each input ranking is already deterministic
  * (rounded score + id tiebreak), and 1/(k0+rank) is the same IEEE
  * double everywhere, so the fused ordering replays exactly in SQL.
  *
  * Scale shape: both inputs arrive already cut to top-k per query, so
  * the fusion joins two (|queries| × k)-row frames — a full-outer
  * hash join on (qid, id) over data that is tiny regardless of corpus
  * size, then one WindowGroupLimit cut. The corpus-sized work happened
  * inside the upstream retrievers (BM25/Jaccard lexical, ANN
  * semantic); fusion itself never touches the corpus.
  */
object HybridRetrieval {

  /** Word-set Jaccard lexical retrieval: rank candidates by
    * |q ∩ c| / |q ∪ c| over distinct word sets. Queries broadcast, so
    * the corpus is scanned once with a narrow codegen'd map — no
    * corpus shuffle; the per-query cut is a WindowGroupLimit. At
    * 100 TB the candidate set would come from the minhash-LSH banding
    * path (Dedup.minhashLshCrossPairs) instead of all pairs; the
    * scoring and cut stay identical.
    *
    * `queries`: (qid, ws); `candidates`: (id, ws) — ws a word array
    * (need not be distinct; both sides are de-duplicated here). */
  def jaccardTopK(queries: DataFrame, candidates: DataFrame,
                  k: Int): DataFrame = {
    val q = broadcast(queries.select(col("qid"),
      array_distinct(col("ws")).as("qws")))
    val scored = candidates
      .select(col("id"), array_distinct(col("ws")).as("cws"))
      .crossJoin(q)
      .filter(col("qid") =!= col("id"))
      .withColumn("jaccard", round(
        size(array_intersect(col("qws"), col("cws"))).cast("double") /
          size(array_union(col("qws"), col("cws"))), 6))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("jaccard").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id"), col("jaccard"))
  }

  /** Fuse two (qid, id, rank) frames. A doc absent from one list
    * contributes only the other list's term (the standard RRF
    * convention). Output ranks by rounded fused score, id tiebreak. */
  def rrf(lexical: DataFrame, semantic: DataFrame,
          k0: Int = 60, topK: Int = 10): DataFrame = {
    val l = lexical.select(col("qid"), col("id"),
      col("rank").cast("long").as("lex_rank"))
    val s = semantic.select(col("qid"), col("id"),
      col("rank").cast("long").as("sem_rank"))
    val fused = l.join(s, Seq("qid", "id"), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(k0) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(k0) + col("sem_rank")), lit(0.0)), 6))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("rrf").desc, col("id"))
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("qid"), col("rank"), col("id"), col("rrf"),
        coalesce(col("lex_rank"), lit(0L)).as("lex_rank"),
        coalesce(col("sem_rank"), lit(0L)).as("sem_rank"))
  }
}

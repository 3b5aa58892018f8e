package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** PMI collocation mining over adjacent word bigrams — the classic
  * corpus-analysis pass (Church & Hanks 1990) a training-data pipeline
  * runs to find multi-word expressions worth protecting from
  * tokenization or worth indexing as phrases.
  *
  *   pmi(a b) = ln( P(ab) / (P(a)·P(b)) ),
  *   P(ab) = c_ab / N_bigrams, P(x) = c_x / N_unigrams
  *
  * Scale shape: unigram and bigram counts are each ONE hash aggregation
  * with map-side combine over the exploded token stream; the two corpus
  * totals reduce to a single broadcast row. The support filter
  * (`minCount`) runs BEFORE the unigram joins, so only surviving
  * bigrams — vocabulary-sized, not corpus-sized — join the word-count
  * table (shuffle-keyed by word; the word table is NOT assumed
  * broadcastable: web-scale vocabularies run to hundreds of millions).
  * Only `ln` appears, so the scores are oracle-replayable bit-for-bit
  * before the display round (the td_dsir precedent). */
object Collocations {

  def pmiBigrams(docs: DataFrame, textCol: String,
                 minCount: Long = 20L): DataFrame = {
    val w = docs.select(TextFunctions.words(col(textCol)).as("w"))
    val uni = w.select(explode(col("w")).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
    val bi = w.select(explode(EvalMetrics.bigrams(col("w"))).as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("cb"))
      .filter(col("cb") >= minCount)
    val tot = w.agg(sum(size(col("w"))).cast("long").as("nu"),
      sum(greatest(size(col("w")) - 1, lit(0))).cast("long").as("nb"))
    bi
      .withColumn("t1", split(col("b"), " ").getItem(0))
      .withColumn("t2", split(col("b"), " ").getItem(1))
      .join(uni.select(col("t").as("t1"), col("c").as("c1")), "t1")
      .join(uni.select(col("t").as("t2"), col("c").as("c2")), "t2")
      .crossJoin(broadcast(tot))
      .select(col("b").as("bigram"), col("cb"), col("c1"), col("c2"),
        round(log(
          (col("cb").cast("double") / col("nb").cast("double")) /
            ((col("c1").cast("double") / col("nu").cast("double")) *
              (col("c2").cast("double") / col("nu").cast("double")))), 4)
          .as("pmi"))
  }

  /** Dunning log-likelihood-ratio collocations (Dunning 1993) — the
    * significance-test companion to [[pmiBigrams]]: PMI overweights
    * rare pairs, G² does not. Per surviving bigram, the 2×2
    * contingency table is (o11=c_ab, o12=c_a−c_ab, o21=c_b−c_ab,
    * o22=N−c_a−c_b+c_ab) and
    *
    *   G² = 2 · Σ_cell O · ln(O·N / (rowsum·colsum)),
    *
    * zero cells contributing exactly 0. Each cell's term is computed
    * from INTEGER counts with one `ln` and rounded 6 dp (the psi_term
    * discipline); `llr` is the sum of the four ROUNDED terms in fixed
    * order — deterministic on both engines because each addend already
    * is. Output: (bigram, o11, o12, o21, o22, llr).
    *
    * Scale shape: identical to [[pmiBigrams]] — two hash aggregations,
    * support filter before the word-keyed joins, one broadcast totals
    * row. */
  def llrBigrams(docs: DataFrame, textCol: String,
                 minCount: Long = 20L): DataFrame = {
    val w = docs.select(TextFunctions.words(col(textCol)).as("w"))
    val uni = w.select(explode(col("w")).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
    val bi = w.select(explode(EvalMetrics.bigrams(col("w"))).as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("cb"))
      .filter(col("cb") >= minCount)
    val tot = w.agg(
      sum(greatest(size(col("w")) - 1, lit(0))).cast("long").as("nb"))
    def term(o: org.apache.spark.sql.Column,
             rs: org.apache.spark.sql.Column,
             cs: org.apache.spark.sql.Column) =
      when(o > 0, round(lit(2.0) * o.cast("double") *
        log(o.cast("double") * col("nb").cast("double") /
          (rs.cast("double") * cs.cast("double"))), 6))
        .otherwise(lit(0.0))
    bi
      .withColumn("t1", split(col("b"), " ").getItem(0))
      .withColumn("t2", split(col("b"), " ").getItem(1))
      .join(uni.select(col("t").as("t1"), col("c").as("c1")), "t1")
      .join(uni.select(col("t").as("t2"), col("c").as("c2")), "t2")
      .crossJoin(broadcast(tot))
      // the bigram-position margins: row = first-word bigram count
      // approximated by the word's unigram count (the standard
      // one-corpus G² table; both margins use the same convention on
      // both engines, so the statistic replays exactly)
      .withColumn("o11", col("cb"))
      .withColumn("o12", greatest(col("c1") - col("cb"), lit(0L)))
      .withColumn("o21", greatest(col("c2") - col("cb"), lit(0L)))
      .withColumn("o22", greatest(
        col("nb") - col("c1") - col("c2") + col("cb"), lit(0L)))
      .withColumn("_r1", col("o11") + col("o12"))
      .withColumn("_r2", col("o21") + col("o22"))
      .withColumn("_c1", col("o11") + col("o21"))
      .withColumn("_c2", col("o12") + col("o22"))
      .select(col("b").as("bigram"), col("o11"), col("o12"),
        col("o21"), col("o22"),
        (term(col("o11"), col("_r1"), col("_c1")) +
          term(col("o12"), col("_r1"), col("_c2")) +
          term(col("o21"), col("_r2"), col("_c1")) +
          term(col("o22"), col("_r2"), col("_c2"))).as("llr"))
  }

  /** Canonical word-adjacency edges for TextRank (Mihalcea & Tarau
    * 2004): adjacent word pairs, both endpoints above the support
    * threshold, undirected-canonicalized (src < dst), distinct. The
    * graph is vocabulary-sized regardless of corpus size — the
    * support filter runs before the joins, same as [[pmiBigrams]]. */
  def adjacencyEdges(docs: DataFrame, textCol: String,
                     minCount: Long = 5L): DataFrame = {
    val w = docs.select(TextFunctions.words(col(textCol)).as("w"))
    val keep = w.select(explode(col("w")).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= minCount)
      .select(col("t"))
    w.select(explode(EvalMetrics.bigrams(col("w"))).as("b"))
      .withColumn("a", split(col("b"), " ").getItem(0))
      .withColumn("z", split(col("b"), " ").getItem(1))
      .filter(col("a") =!= col("z"))
      .select(least(col("a"), col("z")).as("src"),
        greatest(col("a"), col("z")).as("dst"))
      .distinct()
      .join(keep.select(col("t").as("src")), "src")
      .join(keep.select(col("t").as("dst")), "dst")
      .select(col("src"), col("dst"))
  }
}

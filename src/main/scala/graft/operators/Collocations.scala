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
}

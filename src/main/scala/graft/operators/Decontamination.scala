package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Benchmark decontamination — the train/test-leak scan every LLM data
  * pipeline runs before training (flag training documents that contain
  * n-grams from an evaluation benchmark, cf. the GPT-3/PaLM appendix
  * method: 8-13 word n-gram collision).
  *
  * Spark shape: the benchmark side is tiny (eval sets are thousands of
  * items) → its distinct n-grams BROADCAST; the corpus side explodes to
  * (doc_id, shingle) pairs and hash-joins against the broadcast set —
  * corpus rows are scanned once, nothing corpus-sized shuffles. At
  * 100 TB this is a map-side semi-join: cost = one pass over the text
  * column; the explode never materializes corpus-wide because it feeds
  * a broadcast join inside the same stage.
  */
object Decontamination {

  /** Documents sharing at least one word `n`-gram with the benchmark:
    * (id, n_matched = distinct colliding n-grams). Clean docs are absent
    * from the output — a left-anti join against it is the "keep" set. */
  def flag(docs: DataFrame, idCol: String, textCol: String,
           benchmark: DataFrame, benchTextCol: String,
           n: Int = 8): DataFrame = {
    val benchGrams = benchmark
      .select(explode(TextFunctions.shingles(col(benchTextCol), n)).as("sh"))
      .distinct()
    docs
      .select(col(idCol).as("id"),
        explode(TextFunctions.shingles(col(textCol), n)).as("sh"))
      .join(broadcast(benchGrams), Seq("sh"))
      .groupBy(col("id"))
      .agg(countDistinct(col("sh")).as("n_matched"))
  }

  /** Corpus token-frequency table (vocabulary building / tokenizer
    * training input): lowercase whitespace words, global counts — one
    * explode + one hash aggregation with map-side partial combine. At
    * scale the top-k cut happens AFTER the partial agg, so only the
    * per-partition heads shuffle. */
  def vocab(docs: DataFrame, textCol: String, minCount: Long = 2): DataFrame =
    docs
      .select(explode(TextFunctions.words(col(textCol))).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)

  /** Corpus-scale n-gram NOVELTY (memorization auditing) — the inverse
    * question [[flag]] asks: per document, the fraction of its DISTINCT
    * word n-grams found NOWHERE in `reference`. The standard audit for
    * "is this (generated / newly-scraped) text new, or is it replaying
    * the training corpus". Unlike [[flag]], whose benchmark side is
    * bounded by construction and broadcasts, the reference here is
    * corpus-scale — membership is a SHUFFLE join on `xxhash64` gram
    * keys (8-byte keys per the repo's hashed-shuffle rule; the oracle
    * rejoins on literal gram strings, so a 2^-64 hash collision would
    * surface as a gate mismatch, never pass silently). One explode
    * pass per side; per-doc output rows only.
    * Docs with fewer than `n` words have no n-grams and emit no row. */
  def novelty(corpus: DataFrame, idCol: String, textCol: String,
              reference: DataFrame, refTextCol: String,
              n: Int = 8): DataFrame = {
    val grams = corpus.select(col(idCol).as("id"),
        explode(TextFunctions.shingles(col(textCol), n)).as("g"))
      .select(col("id"), xxhash64(col("g")).as("gh"))
    val ref = reference.select(
        explode(TextFunctions.shingles(col(refTextCol), n)).as("g"))
      .select(xxhash64(col("g")).as("gh")).distinct()
    grams
      .join(ref.withColumn("_hit", lit(1L)), Seq("gh"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("_hit").isNull, 1L).otherwise(0L)).as("novel_grams"))
      .withColumn("novelty",
        round(col("novel_grams").cast("double") / col("n_grams"), 4))
  }
}

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

  /** Pairwise vocabulary overlap between document groups (sources,
    * languages, snapshots) — the corpus-comparison card: for every
    * unordered group pair, both vocabulary sizes, the shared
    * vocabulary, and Jaccard similarity in exact integer micros.
    * Zero-overlap pairs still emit a row (that IS the finding).
    *
    * Scale shape: one distinct (group, token) aggregation; the
    * shared-vocabulary counts come from a TOKEN-keyed self-join (the
    * per-token fan-out is the token's group count — bounded by the
    * number of groups, never corpus rows); the full pair grid is the
    * group-cardinality table against itself. */
  def vocabOverlap(docs: DataFrame, textCol: String,
                   groupCol: String): DataFrame = {
    val tv = docs.select(col(groupCol).cast("string").as("g"),
        explode(TextFunctions.words(col(textCol))).as("t"))
      .distinct()
    val sizes = tv.groupBy(col("g")).agg(count(lit(1)).as("nv"))
    val common = tv.as("x").join(tv.as("y"),
        col("x.t") === col("y.t") && col("x.g") < col("y.g"))
      .groupBy(col("x.g").as("a"), col("y.g").as("b"))
      .agg(count(lit(1)).as("n_common"))
    sizes.as("sa").join(sizes.as("sb"),
        col("sa.g") < col("sb.g"))
      .select(col("sa.g").as("a"), col("sb.g").as("b"),
        col("sa.nv").as("n_a"), col("sb.nv").as("n_b"))
      .join(common, Seq("a", "b"), "left")
      .withColumn("n_common", coalesce(col("n_common"), lit(0L)))
      .withColumn("jaccard_micro", expr(
        "n_common * 1000000L div (n_a + n_b - n_common)"))
      .select(col("a"), col("b"), col("n_a"), col("n_b"),
        col("n_common"), col("jaccard_micro"))
  }

  /** Zipf head concentration — "what share of all tokens do the top-k
    * vocabulary items carry": the rank/mass audit a tokenizer or
    * sampling change is judged against (a healthy natural-language
    * corpus puts roughly half its mass in the top few hundred types).
    * Ranks order by (count desc, token asc) — total, so both engines
    * agree on ties. One row per requested k:
    * (k, n_tokens, head_mass, total_mass, share_micro).
    *
    * Scale shape: one hash aggregation to vocabulary cardinality, one
    * rank window over THAT (vocabulary-sized, never corpus rows), a
    * bounded k-frame join. */
  def zipfHead(docs: DataFrame, textCol: String,
               ks: Seq[Int] = Seq(10, 100, 1000)): DataFrame = {
    require(ks.nonEmpty && ks.forall(k => k >= 1 && k <= 1000000),
      "ks must be in [1, 1e6]")
    val spark = docs.sparkSession
    import spark.implicits._
    val counts = docs
      .select(explode(TextFunctions.words(col(textCol))).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n").desc, col("t"))
    val ranked = counts
      .withColumn("_rk", row_number().over(w).cast("long"))
      .withColumn("_total", expr("sum(n) over ()"))
    ranked
      .crossJoin(broadcast(ks.map(_.toLong).toDF("k")))
      .filter(col("_rk") <= col("k"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("n")).as("head_mass"),
        first(col("_total")).as("total_mass"))
      .withColumn("share_micro",
        expr("head_mass * 1000000L div total_mass"))
      .select(col("k"), col("n_tokens"), col("head_mass"),
        col("total_mass"), col("share_micro"))
  }
}

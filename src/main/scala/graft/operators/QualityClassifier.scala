package graft.operators

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.feature.HashingTF
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Model-based quality filtering — the classifier stage the large
  * LLM-corpus pipelines run after the rule gates (GPT-3's
  * quality-classifier sampling, LLaMA's "reference-like" fastText
  * filter): seed labels from a trusted corpus or the heuristic gates,
  * train a linear classifier over hashed text features, score the whole
  * corpus, keep by probability (or sample by it).
  *
  * Spark-first shape (the fastText stand-in):
  *  - features: lowercase whitespace words + adjacent-word bigrams,
  *    hashing-trick into a fixed-width sparse vector (`HashingTF` —
  *    map-side, no vocabulary state, exactly fastText's bucket trick)
  *  - training: `LogisticRegression` — L-BFGS with treeAggregate'd
  *    gradients, so each iteration ships one numFeatures-sized dense
  *    vector per partition up a tree, never row data
  *  - scoring: the fitted coefficients broadcast into a map-side
  *    transform; no shuffle touches the corpus at any scale.
  */
object QualityClassifier {

  /** Unigram + adjacent-bigram feature tokens (fastText's wordNgrams=2). */
  private[graft] def featureTokens(text: Column): Column = {
    val w = TextFunctions.words(text)
    val bi = when(size(w) < 2, array().cast("array<string>"))
      .otherwise(zip_with(
        slice(w, lit(1), size(w) - 1),
        slice(w, lit(2), size(w) - 1),
        (a, b) => concat_ws(" ", a, b)))
    concat(w, bi)
  }

  private def featurize(df: DataFrame, textCol: String,
                        numFeatures: Int): DataFrame =
    new HashingTF()
      .setInputCol("_feat_toks").setOutputCol("features")
      .setNumFeatures(numFeatures)
      .transform(df.withColumn("_feat_toks", featureTokens(col(textCol))))
      .drop("_feat_toks")

  /** Fit on (textCol, labelCol ∈ {0, 1}) rows. `numFeatures` is the
    * hash-bucket width (collisions degrade gracefully, as in fastText);
    * L2 `regParam` keeps hashed collisions from being memorized. Every
    * L-BFGS iteration is one treeAggregate job shipping a
    * numFeatures-sized gradient per partition — size the TRAINING
    * frame's partition count to its row count (coalesce a small seed
    * set; a billion-doc seed keeps its natural partitioning) and cap
    * `maxIter` accordingly: per-iteration cost is fixed, so iterations
    * beyond convergence are pure scheduler+gradient overhead. */
  def train(labeled: DataFrame, textCol: String, labelCol: String,
            numFeatures: Int = 1 << 18,
            regParam: Double = 1e-3,
            maxIter: Int = 50): LogisticRegressionModel =
    new LogisticRegression()
      .setFeaturesCol("features").setLabelCol(labelCol)
      .setRegParam(regParam).setMaxIter(maxIter)
      .fit(featurize(labeled.select(col(labelCol).cast("double").as(labelCol),
        col(textCol)), textCol, numFeatures))

  /** Score every doc: (id, quality_prob, quality_pred). Pure map pass —
    * the model rides a broadcast, the corpus never shuffles. */
  def score(model: LogisticRegressionModel, docs: DataFrame,
            idCol: String, textCol: String): DataFrame =
    model.transform(
        featurize(docs.select(col(idCol).as("id"), col(textCol)),
          textCol, model.numFeatures))
      .select(col("id"),
        round(vector_to_array(col("probability")).getItem(1), 4)
          .as("quality_prob"),
        col("prediction").cast("int").as("quality_pred"))
}

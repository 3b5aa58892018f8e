package graft

import org.apache.spark.sql.functions._

import graft.operators.QualityClassifier

class QualityClassifierSpec extends GraftSpec {
  import spark.implicits._

  private val cleanWords = Array("the", "careful", "engineer", "verified",
    "every", "pipeline", "stage", "with", "clear", "measured", "evidence",
    "and", "wrote", "durable", "tests", "for", "each", "operator")
  private val junkWords = Array("zzz", "qqq", "xx1", "kl0p", "wwww", "b0t",
    "spam", "click", "free", "winner", "$$$", "@@@@", "lol", "hjkl")

  private def doc(words: Array[String], seed: Int): String = {
    val rnd = new scala.util.Random(seed)
    (1 to 30).map(_ => words(rnd.nextInt(words.length))).mkString(" ")
  }

  test("classifier separates planted clean vs junk text on held-out docs") {
    val rows = (0 until 40).map(i => (i.toLong, doc(cleanWords, i), 1)) ++
      (40 until 80).map(i => (i.toLong, doc(junkWords, i), 0))
    val all = rows.toDF("doc_id", "text", "label")
    val train = all.filter(col("doc_id") % 2 === 0)
    val test = all.filter(col("doc_id") % 2 === 1)
    val model = QualityClassifier.train(train, "text", "label",
      numFeatures = 1 << 12)
    val scored = QualityClassifier.score(model, test, "doc_id", "text")
      .join(test.select(col("doc_id").as("id"), col("label")), Seq("id"))
    val acc = scored.filter(col("quality_pred") === col("label")).count()
      .toDouble / scored.count()
    assert(acc >= 0.9, s"held-out accuracy $acc")
    // probabilities are oriented: clean docs score high, junk low
    val avg = scored.groupBy(col("label"))
      .agg(round(org.apache.spark.sql.functions.avg(col("quality_prob")), 4)
        .as("p"))
      .as[(Int, Double)].collect().toMap
    assert(avg(1) > 0.8 && avg(0) < 0.2)
  }

  test("feature tokens include unigrams and adjacent bigrams") {
    val toks = Seq(("a b c", 1)).toDF("text", "x")
      .select(QualityClassifier.featureTokens(col("text")).as("t"))
      .as[Seq[String]].head()
    assert(toks == Seq("a", "b", "c", "a b", "b c"))
  }
}

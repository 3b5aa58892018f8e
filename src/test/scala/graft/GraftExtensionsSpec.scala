package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.functions.expressions.{MinHashSig, SimHash64, VectorKernels}

/** The SQL surface of the native expressions (GraftExtensions): every
  * registered function must agree bit-for-bit with its Column-API twin,
  * and shape parameters must be rejected unless literal. */
class GraftExtensionsSpec extends GraftSpec {
  import spark.implicits._

  test("simhash64 / word_shingles / minhash_sig callable from SQL, equal to Column API") {
    val df = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs")).toDF("id", "text")
    df.createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql(
      """SELECT id, simhash64(word_shingles(text, 1)) AS fp,
        |       minhash_sig(word_shingles(text, 3), 16) AS sig
        |FROM ext_docs""".stripMargin)
      .as[(Long, Long, Seq[Long])].collect().sortBy(_._1)
    val viaCol = df.select(col("id"),
        SimHash64.simhash64(TextFunctions.shingles(col("text"), 1)).as("fp"),
        MinHashSig.minhash_sig(TextFunctions.shingles(col("text"), 3), 16).as("sig"))
      .as[(Long, Long, Seq[Long])].collect().sortBy(_._1)
    assert(viaSql.toSeq == viaCol.toSeq)
  }

  test("cosine_sim / dot_product callable from SQL, equal to Column API") {
    val df = Seq((1L, Array(1f, 2f, 3f), Array(4f, 5f, 6f)),
      (2L, Array(0f, 0f, 0f), Array(1f, 0f, 0f))).toDF("id", "a", "b")
    df.createOrReplaceTempView("ext_vecs")
    val viaSql = spark.sql(
      "SELECT id, cosine_sim(a, b) AS c, dot_product(a, b) AS d FROM ext_vecs")
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    val viaCol = df.select(col("id"),
        VectorKernels.cosine_sim(col("a"), col("b")).as("c"),
        VectorKernels.dot_product(col("a"), col("b")).as("d"))
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    assert(viaSql.toSeq == viaCol.toSeq)
    assert(viaSql(0)._3 == 32.0d)
  }

  test("shape parameters must be integer literals") {
    Seq((1L, "a b c")).toDF("id", "text").createOrReplaceTempView("ext_bad")
    val e = intercept[Exception] {
      spark.sql("SELECT word_shingles(text, id) FROM ext_bad").collect()
    }
    assert(e.getMessage.contains("INT literal") ||
      Option(e.getCause).exists(_.getMessage.contains("INT literal")))
  }

  test("functions visible in the registry with usage text") {
    val fns = spark.sql("SHOW FUNCTIONS").as[String].collect().toSet
    Seq("simhash64", "minhash_sig", "word_shingles", "cosine_sim",
      "dot_product", "lang_id", "token_count", "doc_fingerprint",
      "redact_pii", "luhn_valid", "html_to_text", "quality_score",
      "canonical_url", "url_host")
      .foreach(f => assert(fns.contains(f), f))
  }

  test("column-composition text functions callable from SQL, equal to Column API") {
    val df = Seq(
      (1L, "the quick brown fox and the lazy dog in the fog"),
      (2L, "der und die das ist nicht ein mit der und"),
      (3L, "mail me a@b.co or pay 4111 1111 1111 1111 or 123-45-6789"))
      .toDF("id", "text")
    df.createOrReplaceTempView("ext_txt")
    val viaSql = spark.sql(
      """SELECT id, lang_id(text) AS lang, token_count(text) AS n,
        |  doc_fingerprint(text) AS fp, redact_pii(text) AS red,
        |  luhn_valid(text) AS lv, quality_score(text) AS q
        |FROM ext_txt""".stripMargin)
      .as[(Long, String, Int, String, String, Boolean, Double)]
      .collect().sortBy(_._1)
    val viaCol = df.select(col("id"),
        TextFunctions.langId(col("text")).as("lang"),
        TextFunctions.tokenCountWs(col("text")).as("n"),
        TextFunctions.fingerprint(col("text")).as("fp"),
        TextFunctions.redactPiiAll(col("text")).as("red"),
        TextFunctions.luhnValid(col("text")).as("lv"),
        TextFunctions.qualityScore(col("text")).as("q"))
      .as[(Long, String, Int, String, String, Boolean, Double)]
      .collect().sortBy(_._1)
    assert(viaSql.toSeq == viaCol.toSeq)
    assert(viaSql.find(_._1 == 3L).get._5 ==
      "mail me [EMAIL] or pay [CARD] or [SSN]")
    assert(viaSql.find(_._1 == 2L).get._2 == "de")
    val urls = spark.sql(
      """SELECT canonical_url('HTTP://A.com:80/x/?utm_a=1&q=2#f') AS c,
        |       url_host('https://Sub.Ex.org:8443/p') AS h""".stripMargin)
      .as[(String, String)].collect().head
    assert(urls == (("http://a.com/x?q=2", "sub.ex.org")))
  }
}

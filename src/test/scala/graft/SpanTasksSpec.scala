package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.operators.SpanTasks

class SpanTasksSpec extends GraftSpec {
  import spark.implicits._

  private def md5hex8(s: String): Long =
    java.lang.Long.parseLong(
      MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString, 16)

  test("fimTransform: selected docs render PSM from the md5-derived cuts") {
    val df = Seq((1L, "abcdefghij"), (2L, "0123456789"), (3L, "xy"))
      .toDF("doc_id", "text")
    val out = SpanTasks.fimTransform(df, "doc_id", "text", rateBp = 10000)
      .as[(Long, Boolean, Option[Int], Option[Int], String)]
      .collect().sortBy(_._1)
    out.foreach { case (id, fim, lo, hi, rendered) =>
      assert(fim, s"doc $id selected at 10000 bp")
      val text = df.filter(col("doc_id") === id)
        .select("text").as[String].head()
      val n = text.length
      val a = md5hex8(s"$id-fim-a") % (n + 1)
      val b = md5hex8(s"$id-fim-b") % (n + 1)
      val (l, h) = (math.min(a, b).toInt, math.max(a, b).toInt)
      assert(lo.contains(l) && hi.contains(h), s"doc $id cuts")
      val expected = s"<fim_prefix>${text.substring(0, l)}" +
        s"<fim_suffix>${text.substring(h)}" +
        s"<fim_middle>${text.substring(l, h)}"
      assert(rendered == expected, s"doc $id render")
    }
  }

  test("fimTransform: SPM reorders the same pieces; rate 0 passes through") {
    val df = Seq((7L, "hello world")).toDF("doc_id", "text")
    val psm = SpanTasks.fimTransform(df, "doc_id", "text", rateBp = 10000)
      .select("text_out").as[String].head()
    val spm = SpanTasks.fimTransform(df, "doc_id", "text", rateBp = 10000,
      spm = true).select("text_out").as[String].head()
    val p = psm.stripPrefix("<fim_prefix>")
      .split("<fim_suffix>|<fim_middle>", -1)
    assert(spm == s"<fim_suffix>${p(1)}<fim_prefix>${p(0)}<fim_middle>${p(2)}")
    val off = SpanTasks.fimTransform(df, "doc_id", "text", rateBp = 0)
      .as[(Long, Boolean, Option[Int], Option[Int], String)].head()
    assert(!off._2 && off._3.isEmpty && off._5 == "hello world")
  }

  test("fimTransform: the three pieces always reassemble the original") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val bad = SpanTasks.fimTransform(docs, "doc_id", "text", rateBp = 10000)
      .join(docs, "doc_id")
      .withColumn("p", regexp_extract(col("text_out"),
        "^<fim_prefix>(.*)<fim_suffix>", 1))
      .withColumn("sfx", regexp_extract(col("text_out"),
        "<fim_suffix>(.*)<fim_middle>", 1))
      .withColumn("m", regexp_extract(col("text_out"),
        "<fim_middle>(.*)$", 1))
      .filter(concat(col("p"), col("m"), col("sfx")) =!= col("text"))
      .count()
    assert(bad == 0)
  }

  test("mlmMask: masked positions match the per-(doc,pos) md5 draw") {
    val df = Seq((5L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val (masked, nMasked, targets) =
      SpanTasks.mlmMask(df, "doc_id", "text", rateBp = 4000)
        .as[(Long, String, Int, String)].head() match {
        case (_, m, n, t) => (m, n, t)
      }
    val toks = "a b c d e f g h i j".split(" ")
    val drawn = toks.indices.filter(i =>
      md5hex8(s"5:mlm:$i") % 10000 < 4000)
    val expMasked = toks.indices
      .map(i => if (drawn.contains(i)) "[MASK]" else toks(i)).mkString(" ")
    val expTargets = drawn.map(i => s"$i:${toks(i)}").mkString(" | ")
    assert(masked == expMasked)
    assert(nMasked == drawn.size)
    assert(targets == expTargets)
  }

  test("mlmMask: rate 0 masks nothing; rate 10000 masks everything") {
    val df = Seq((9L, "x y z")).toDF("doc_id", "text")
    val none = SpanTasks.mlmMask(df, "doc_id", "text", rateBp = 0)
      .as[(Long, String, Int, String)].head()
    assert(none._2 == "x y z" && none._3 == 0 && none._4 == "")
    val all = SpanTasks.mlmMask(df, "doc_id", "text", rateBp = 10000)
      .as[(Long, String, Int, String)].head()
    assert(all._2 == "[MASK] [MASK] [MASK]" && all._3 == 3)
    assert(all._4 == "0:x | 1:y | 2:z")
  }

  test("spanCorrupt: input and target reassemble the original; " +
    "sentinels number left-to-right; empty doc passes through") {
    val df = Seq(
      (7L, "a b c d e f g h i j k"),
      (8L, "x y"),
      (9L, ""))
      .toDF("doc_id", "text")
    val out = SpanTasks.spanCorrupt(df, "doc_id", "text",
        rateBp = 4000, spanLen = 3)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // hand replay of the md5 block draws
    def drawn(id: Long, k: Long): Boolean =
      md5hex8(s"$id:sc:$k") % 10000 < 4000
    Seq(7L -> "a b c d e f g h i j k", 8L -> "x y").foreach {
      case (id, text) =>
        val toks = text.split(" ").toSeq
        val nb = (toks.size + 2) / 3
        val corr = (0L until nb.toLong).filter(drawn(id, _))
        val inp = (0L until nb.toLong).flatMap { k =>
          if (corr.contains(k))
            Seq(s"<extra_id_${corr.indexOf(k)}>")
          else toks.slice(k.toInt * 3, k.toInt * 3 + 3)
        }.mkString(" ")
        val tgt = corr.flatMap { k =>
          Seq(s"<extra_id_${corr.indexOf(k)}>") ++
            toks.slice(k.toInt * 3, k.toInt * 3 + 3)
        }.mkString(" ")
        val r = out(id)
        assert(r.getAs[String]("input_text") == inp, s"doc $id input")
        assert(r.getAs[String]("target_text") == tgt, s"doc $id target")
        assert(r.getAs[Int]("n_spans") == corr.size, s"doc $id spans")
        // reassembly: substituting each sentinel in the input with its
        // target span reproduces the original token stream
        var re = r.getAs[String]("input_text")
        val spans = r.getAs[String]("target_text")
          .split("<extra_id_\\d+> ?").filter(_.nonEmpty).map(_.trim)
        corr.indices.foreach { i =>
          re = re.replace(s"<extra_id_$i>", spans(i))
        }
        assert(re == text, s"doc $id reassembly: '$re'")
    }
    assert(out(9L).getAs[String]("input_text") == "" &&
      out(9L).getAs[String]("target_text") == "" &&
      out(9L).getAs[Int]("n_spans") == 0)
  }

  test("needleInsert: exact floor placement at front/middle/end; md5 " +
    "matches the hand splice; empty doc takes the needle alone") {
    def fullMd5(s: String): String =
      MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val df = Seq(
      (0L, "A b c d e f g h i j"),  // depth 0 -> front
      (5L, "a b c d e f g h i j"),  // depth 5000 -> pos 5
      (10L, "a b c d e f g h i j"), // depth 10000 -> end
      (11L, "   "))                 // empty after split -> needle alone
      .toDF("doc_id", "text")
    val out = SpanTasks.needleInsert(df, "doc_id", "text",
        needle = concat(lit("N"), col("doc_id")),
        depthBp = pmod(col("doc_id"), lit(11)) * 1000)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    def splice(id: Long, text: String): (Long, String) = {
      val ws = text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      val pos = (ws.size * ((id % 11) * 1000) / 10000).toInt
      (pos.toLong,
        (ws.take(pos) ++ Seq(s"N$id") ++ ws.drop(pos)).mkString(" "))
    }
    Seq(0L -> "A b c d e f g h i j", 5L -> "a b c d e f g h i j",
        10L -> "a b c d e f g h i j", 11L -> "   ").foreach {
      case (id, text) =>
        val (pos, expect) = splice(id, text)
        val r = out(id)
        assert(r.getAs[Long]("insert_pos") == pos, s"doc $id pos")
        assert(r.getAs[String]("new_md5") == fullMd5(expect),
          s"doc $id splice: expected '$expect'")
    }
    assert(out(0L).getAs[Long]("insert_pos") == 0L)
    assert(out(10L).getAs[Long]("insert_pos") == 10L)
    assert(out(11L).getAs[Long]("n_words") == 0L &&
      out(11L).getAs[String]("new_md5") == fullMd5("N11"))
  }

  test("mlmMask: mask pattern is position-keyed, stable under repeats") {
    // the same token at different positions draws independently
    val df = Seq((11L, Seq.fill(40)("tok").mkString(" ")))
      .toDF("doc_id", "text")
    val masked = SpanTasks.mlmMask(df, "doc_id", "text", rateBp = 5000)
      .select("masked_text").as[String].head().split(" ")
    assert(masked.distinct.sorted.toSeq == Seq("[MASK]", "tok"),
      "a 50% draw over 40 positions should mask some and keep some")
  }
}

package graft

import graft.operators.TextQuality

class TextQualitySpec extends GraftSpec {
  import spark.implicits._

  test("gopher quality: planted violations trip exactly their rule") {
    val goodText = (1 to 5).map(_ =>
      "the curious engineers have shipped that resilient pipeline " +
        "be careful with many joined stages of work and testing").mkString(" ")
    val docs = Seq(
      (1L, goodText),                              // passes every rule
      (2L, "too short to pass"),                   // word-count floor
      (3L, goodText + " ###### ##### #### ### ## # # # # # # # # # # # " +
        "# # # # # # # # # # # # # # # # # # # # # # # # # #"), // symbols
      (4L, (1 to 40).map(_ => "12345 67890").mkString(" "))      // no alpha
    ).toDF("doc_id", "text")
    val out = TextQuality.gopherQuality(docs, "doc_id", "text")
      .select("doc_id", "pass", "stopword_hits").as[(Long, Boolean, Int)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L)._1)
    assert(out(1L)._2 >= 2) // the/that/have/with/be/of present
    assert(!out(2L)._1)
    assert(!out(3L)._1)
    assert(!out(4L)._1)
  }

  test("repetition: repeated 2-gram and duplicated chunk dominate") {
    val chunk = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      // chunk appears twice (20 words = chunks [0,10) and [10,20) equal)
      (1L, chunk + " " + chunk),
      // "go go" repeated: top 2-gram count is high
      (2L, (1 to 12).map(_ => "go").mkString(" ") + " stop now"),
      (3L, "all unique words here nothing repeats at chunk level")
    ).toDF("doc_id", "text")
    val out = TextQuality.repetition(docs, "doc_id", "text")
      .select("id", "top_gram_count", "dup_chunk_frac")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L)._2 == 1.0)  // both chunks are duplicates
    assert(out(2L)._1 == 11L)  // "go go" x11 sliding
    assert(out(3L)._2 == 0.0)
  }

  test("boilerplate scrub: shared chunk flagged across docs, unique kept") {
    val boiler = "subscribe to our newsletter for updates terms and conditions now"
    val docs = Seq(
      (1L, boiler + " unique body one with its own special content here ok"),
      (2L, boiler + " another body two carrying different original text here"),
      (3L, "entirely original document three with no shared chunks at all")
    ).toDF("doc_id", "text")
    val out = TextQuality.boilerplateScrub(docs, "doc_id", "text")
      .select("id", "n_chunks", "n_boiler").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((2L, 1L)))
    assert(out(2L) == ((2L, 1L)))
    assert(out(3L) == ((1L, 0L)))
  }

  test("perplexity: degenerate repetition scores far below varied text") {
    val repeated = (1 to 50).map(_ => "spam").mkString(" ")
    val varied = "the curious engineer shipped a resilient pipeline " +
      "careful testing of many joined stages makes the work reliable " +
      "and every operator earns its place through measured evidence"
    val docs = Seq((1L, repeated), (2L, varied), (3L, "one")).toDF("doc_id", "text")
    val out = TextQuality.perplexity(docs, "doc_id", "text")
      .select("id", "n_bigrams", "ppl").as[(Long, Long, Double)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // "spam spam" is the overwhelmingly dominant bigram -> near-1 ppl
    assert(out(1L)._1 == 49L)
    assert(out(1L)._2 < 2.0)
    // varied text: every bigram is rare in this tiny corpus -> higher ppl
    assert(out(2L)._2 > out(1L)._2 * 2)
    // single-token doc carries no bigrams and is absent
    assert(!out.contains(3L))
  }

  test("perplexity: hand-checked add-alpha probabilities on a micro corpus") {
    // corpus tokens: "a b a b" + "a c": bigrams (a,b)x2, (b,a)x1, (a,c)x1
    // heads: a->3, b->1 ; V = 3 ; alpha = 0.1
    val docs = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val out = TextQuality.perplexity(docs, "doc_id", "text", alpha = 0.1)
      .select("id", "avg_nll").as[(Long, Double)].collect().toMap
    val pAB = (2 + 0.1) / (3 + 0.3) // P(b|a)
    val pBA = (1 + 0.1) / (1 + 0.3) // P(a|b)
    val pAC = (1 + 0.1) / (3 + 0.3) // P(c|a)
    def r4(x: Double) = math.rint(x * 1e4) / 1e4
    assert(out(1L) == r4(-(math.log(pAB) + math.log(pBA) + math.log(pAB)) / 3))
    assert(out(2L) == r4(-math.log(pAC)))
  }

  test("chunkWindows: overlap, tail clamp, and empty-doc behavior") {
    import org.apache.spark.sql.functions.{col, explode}
    val words = (1 to 10).map(i => s"w$i").mkString(" ") // 10 words
    val docs = Seq((1L, words), (2L, ""), (3L, "solo")).toDF("doc_id", "text")
    val out = docs.select(col("doc_id"),
        explode(graft.functions.TextFunctions
          .chunkWindows(col("text"), chunkWords = 4, strideWords = 3)).as("c"))
      .select(col("doc_id"), col("c.idx"), col("c.chunk"))
      .as[(Long, Int, String)].collect().toList
    val d1 = out.filter(_._1 == 1L).sortBy(_._2).map(c => (c._2, c._3))
    // starts 0,3,6,9: full chunks then a clamped tail
    assert(d1 == List(
      (0, "w1 w2 w3 w4"), (1, "w4 w5 w6 w7"),
      (2, "w7 w8 w9 w10"), (3, "w10")))
    assert(!out.exists(_._1 == 2L)) // empty doc: no chunks
    assert(out.filter(_._1 == 3L).map(_._3) == List("solo"))
  }

  test("empty and single-word docs do not crash the chunkers") {
    val docs = Seq((1L, ""), (2L, "word"), (3L, "   ")).toDF("doc_id", "text")
    assert(TextQuality.repetition(docs, "doc_id", "text").count() == 3)
    // empty docs produce no chunks at all -> absent from boilerplate stats
    assert(TextQuality.boilerplateScrub(docs, "doc_id", "text").count() == 1)
    val q = TextQuality.gopherQuality(docs, "doc_id", "text")
    assert(q.filter("pass").count() == 0)
  }

  test("unicode normalization: NFC composes, NFKC folds, accents strip") {
    import org.apache.spark.sql.functions.col
    import graft.functions.TextFunctions
    import graft.functions.expressions.UnicodeNormalize.unicode_normalize
    val decomposed = "Café" // e + combining acute
    val cases = Seq(
      (1L, decomposed), (2L, "Caf\u00e9"), // composed form
      (3L, "münchen straße"), (4L, "ＡBC ① ﬁ"))
    val out = cases.toDF("id", "s").select(col("id"),
        TextFunctions.nfc(col("s")).as("nfc"),
        TextFunctions.stripAccents(col("s")).as("plain"),
        unicode_normalize(col("s"), "NFKC").as("nfkc"))
      .as[(Long, String, String, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // both input forms converge to the composed NFC bytes
    assert(out(1L)._1 == "Caf\u00e9" && out(2L)._1 == "Caf\u00e9")
    assert(out(1L)._2 == "Cafe" && out(2L)._2 == "Cafe")
    // ß is not a mark (survives strip); ü loses its diaeresis
    assert(out(3L)._2 == "munchen straße")
    // NFKC folds fullwidth A, circled 1, fi ligature
    assert(out(4L)._3 == "ABC 1 fi")
    // null-safe + works inside codegen over a real column
    assert(cases.toDF("id", "s").selectExpr("nfc_normalize(s)").count() == 4)
  }

  test("compression ratio orders boilerplate < prose < noise; deterministic") {
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(99)
    val noise = Seq.fill(400)(rnd.nextPrintableChar()).mkString
    val prose = ("the quick brown fox jumps over the lazy dog and then " +
      "wanders through the quiet forest looking for something new ") * 4
    val rows = Seq(
      (1L, "boiler " * 200),     // highly repetitive
      (2L, prose),                // normal prose
      (3L, noise),                // near-incompressible
      (4L, ""))                   // empty -> ratio 1.0 by definition
    val out = graft.operators.TextQuality
      .compressionRatio(rows.toDF("doc_id", "text"), "doc_id", "text")
      .select("id", "n_bytes", "ratio").as[(Long, Long, Double)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L)._2 < 0.1, s"boilerplate ratio ${out(1L)._2}")
    assert(out(2L)._2 > out(1L)._2 && out(2L)._2 < out(3L)._2)
    assert(out(3L)._2 > 0.5, s"noise ratio ${out(3L)._2}")
    assert(out(4L) == ((0L, 1.0)))
    // deterministic across runs
    val again = graft.operators.TextQuality
      .compressionRatio(rows.toDF("doc_id", "text"), "doc_id", "text")
      .select("id", "ratio").as[(Long, Double)].collect().toMap
    assert(out.forall { case (k, (_, r)) => again(k) == r })
  }

  test("compression round-trip: inflate(deflate(x)) == x, zlib envelope holds") {
    val rnd = new scala.util.Random(7)
    val rows = Seq(
      (1L, "boiler " * 200),
      (2L, Seq.fill(500)(rnd.nextPrintableChar()).mkString),
      (3L, "unicode é中文 mixed"),
      (4L, ""))
    val out = graft.operators.TextQuality
      .compressionRoundTrip(rows.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Boolean, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out.values.forall(_._2), "round-trip must reproduce input bytes")
    assert(out.values.forall(_._3), "compressed size must respect envelope")
    // utf-8 byte length, not char length
    assert(out(3L)._1 == "unicode é中文 mixed"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8).length)
  }

  test("luhn validation and card redaction: valid cards redact, invalid fall to phone") {
    import org.apache.spark.sql.functions.col
    val cases = Seq(
      // Visa 16 (valid), spaced and dashed and plain
      (1L, "pay 4111 1111 1111 1111 now", "pay [CARD] now"),
      (2L, "pay 5500-0000-0000-0004 now", "pay [CARD] now"),
      (3L, "amex 378282246310005 ok", "amex [CARD] ok"),
      // luhn-INVALID 16-digit: not a card; the phone recall rule eats it
      (4L, "num 1234 5678 9012 3456 x", "num [PHONE] x"),
      (5L, "num 4111111111111112 x", "num [PHONE] x"),
      // SSN
      (6L, "ssn 123-45-6789 here", "ssn [SSN] here"),
      // 12 digits: too short for a card, dashed pairs -> phone rule
      (7L, "id 1234-5678-9012 z", "id [PHONE] z"),
      // email with digits survives as [EMAIL], not nibbled by digit rules
      (8L, "mail a4111111111111111@x.co t", "mail [EMAIL] t"))
    val out = cases.toDF("id", "s", "want")
      .select(col("id"), col("want"),
        graft.functions.TextFunctions.redactPiiAll(col("s")).as("got"))
      .collect()
    out.foreach(r => assert(r.getString(2) == r.getString(1),
      s"case ${r.getLong(0)}: got '${r.getString(2)}'"))
  }

  test("html extraction: tags/script/style/comments out, entities decoded, ws collapsed") {
    import org.apache.spark.sql.functions.col
    val cases = Seq(
      (1L, "<html><body><h1>Title</h1><p>Hello <b>world</b></p></body></html>",
        "Title Hello world"),
      // script/style bodies vanish entirely, including < inside them
      (2L, "<p>a</p><script type=\"x\">if (1 < 2) alert('x')</script>" +
        "<style>p { color: red }</style><p>b</p>", "a b"),
      (3L, "keep <!-- secret comment --> these", "keep these"),
      // single-pass entity decode: &amp;lt; -> &lt; and stops
      (4L, "A&amp;B &lt;tag&gt; &quot;q&#39;s&quot; &amp;lt; x&nbsp;y",
        "A&B <tag> \"q's\" &lt; x y"),
      // stray < that opens no tag survives as text
      (5L, "1 < 2 but <em>3</em>", "1 < 2 but 3"),
      (6L, "  \t spaced\n\nout \n", "spaced out"))
    val out = cases.toDF("id", "html", "want")
      .select(col("id"), col("want"),
        graft.functions.TextFunctions.htmlToText(col("html")).as("got"))
      .collect()
    out.foreach(r => assert(r.getString(2) == r.getString(1),
      s"case ${r.getLong(0)}: got '${r.getString(2)}'"))
  }

  test("sentenceFilter: short/unterminated sentences drop, rebuild exact") {
    import graft.operators.TextQuality
    val d = Seq(
      (1L, "one two three four. short one. five six seven eight! tail frag"),
      (2L, "no punctuation at all"),
      (3L, "a! b? solid three words.")).toDF("id", "text")
    val got = TextQuality.sentenceFilter(d, "id", "text")
      .as[(Long, Long, Long, String)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    // doc 1: 3 sentences match; "short one." (2 words) dropped; the
    // unterminated tail never matches
    assert(got(1L) == ((3L, 2L,
      "one two three four. five six seven eight!")))
    // doc 2: nothing matches the sentence pattern
    assert(got(2L) == ((0L, 0L, "")))
    // doc 3: "a!" and "b?" too short, the 3-word sentence survives
    assert(got(3L) == ((3L, 1L, "solid three words.")))
  }

  test("diversity: hand-counted distinct-n ratios; collapsed text scores low; empty text yields zero totals") {
    val docs = Seq(
      ("A", "a b a"), ("A", "b c"),   // uni 5/3 → 6000 bp; bi 3/3 → 10000
      ("B", "x x x x"),               // uni 4/1 → 2500 bp; bi 3/1 → 3333
      ("C", ""))                      // no grams at all
      .toDF("grp_col", "text")
    val out = TextQuality.diversity(docs, "text", "grp_col")
      .collect().map(r => r.getAs[String]("grp_col") -> r).toMap
    val a = out("A")
    assert(a.getAs[Long]("n_docs") == 2)
    assert(a.getAs[Long]("total_1") == 5 && a.getAs[Long]("distinct_1") == 3)
    assert(a.getAs[Long]("distinct_1_bp") == 6000)
    assert(a.getAs[Long]("total_2") == 3 && a.getAs[Long]("distinct_2") == 3)
    assert(a.getAs[Long]("distinct_2_bp") == 10000)
    val b = out("B")
    assert(b.getAs[Long]("distinct_1_bp") == 2500)
    assert(b.getAs[Long]("total_2") == 3 && b.getAs[Long]("distinct_2") == 1)
    assert(b.getAs[Long]("distinct_2_bp") == 3333)
    val c = out("C")
    assert(c.getAs[Long]("n_docs") == 1 && c.getAs[Long]("total_1") == 0 &&
      c.getAs[Long]("distinct_1_bp") == 0)

    assert(TextQuality.diversity(
      Seq.empty[(String, String)].toDF("grp_col", "text"),
      "text", "grp_col").count() == 0)
  }

  test("readability: hand-counted words/sentences/syllables; floor on unterminated text") {
    import spark.implicits._
    val df = Seq(
      (1L, "Hi there. All good?! Everything fine."),
      (2L, "no terminal punctuation here"),
      (3L, "")).toDF("doc_id", "text")
    val got = TextQuality.readability(df, "doc_id", "text")
      .as[(Long, Int, Int, Int, Long, Long)].collect()
      .map(t => t._1 -> t).toMap
    // doc 1: words = 6; sentence runs = ".", "?!", "." = 3;
    // syllables (vowel-group runs, lowercased, y counts):
    //   "hi there. all good?! everything fine."
    //   i, e+e (there->th[e]r[e]=2), a, oo, e+y+i (everything:
    //   [e]v[e]r[y]th[i]ng = 4), i+e (fine = 2)  -> 1+2+1+1+4+2 = 11
    val d1 = got(1L)
    assert(d1._2 == 6 && d1._3 == 3 && d1._4 == 11)
    assert(d1._5 == 6L * 10000 / 3 && d1._6 == 11L * 10000 / 6)
    // doc 2: no terminal punctuation -> sentence floor 1
    val d2 = got(2L)
    assert(d2._2 == 4 && d2._3 == 1)
    assert(d2._5 == 40000L)
    // doc 3: empty text -> all zeros, no division blowups
    val d3 = got(3L)
    assert(d3._2 == 0 && d3._3 == 1 && d3._4 == 0 && d3._6 == 0L)
  }
}

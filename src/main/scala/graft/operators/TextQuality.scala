package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus-quality operators in the style of the published web-scale
  * pipeline heuristics (Gopher / C4 / RefinedWeb rule families): per-doc
  * quality gates, within-doc repetition scoring, and cross-doc
  * boilerplate removal. The reference pipeline stops at event analytics;
  * these are the curation steps an LLM training pipeline adds on top —
  * built as first-class Spark operators alongside the dedup family in
  * [[Dedup]].
  *
  * Engine-parity rules (every metric is DuckDB-replayable, so the whole
  * operator is hash-checked, not spot-checked):
  *  - ratios round to 4 dp;
  *  - "words" are [[TextFunctions.words]] (lowercased, \s+ split);
  *  - documents in this corpus carry no newlines, so the paragraph unit
  *    is a deterministic CHUNK of `chunkWords` consecutive words — the
  *    operators take the unit as a parameter and work unchanged on
  *    newline-delimited corpora by swapping the chunker.
  */
object TextQuality {

  // deferred cache release (same pattern as Dedup.lastSimhashCache):
  // perplexity's returned frame still reads the persisted bigram
  // stream, so the cache is dropped on the NEXT call.
  private var lastPerplexityCache: Option[DataFrame] = None

  /** Gopher-style required stopwords ("at least 2 of" rule). */
  val RequiredStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher rule thresholds (word-count band widened to this corpus's
    * short synthetic docs; the published bounds are 50..100k). */
  val MinWords = 30
  val MaxWords = 100000
  val MinMeanWordLen = 3.0
  val MaxMeanWordLen = 10.0
  val MaxSymbolRatio = 0.1
  val MinAlphaWordFrac = 0.80
  val MinStopwordHits = 2

  /** Per-document quality-rule metrics + the composite pass flag. One
    * narrow projection — no shuffle, no UDF; every metric is a codegen'd
    * column expression, so at 100 TB this is a single map pass that
    * whole-stage-codegens into the parquet scan. */
  def gopherQuality(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val text = col(textCol)
    val w = TextFunctions.words(text)
    val nWords = size(w).cast("double")
    val denomW = greatest(nWords, lit(1.0))
    // sum(len(word)) == count of non-whitespace chars — keeps the metric
    // codegen'd (no interpreted aggregate() lambda over the word array)
    val charsInWords = length(regexp_replace(text, "\\s+", "")).cast("double")
    val meanWordLen = round(charsInWords / denomW, 4)
    val symbolRatio = round(
      size(regexp_extract_all(text, lit("#|\\.\\.\\."), lit(0))).cast("double") / denomW, 4)
    val alphaWordFrac = round(
      size(filter(w, x => x.rlike("[a-z]"))).cast("double") / denomW, 4)
    val stopHits = size(array_intersect(array_distinct(w),
      array(RequiredStopwords.map(lit): _*)))
    docs.select(
      col(idCol),
      nWords.cast("int").as("n_words"),
      meanWordLen.as("mean_word_len"),
      symbolRatio.as("symbol_ratio"),
      alphaWordFrac.as("alpha_word_frac"),
      stopHits.as("stopword_hits"),
      (nWords >= MinWords && nWords <= MaxWords &&
        meanWordLen >= MinMeanWordLen && meanWordLen <= MaxMeanWordLen &&
        symbolRatio < MaxSymbolRatio &&
        alphaWordFrac > MinAlphaWordFrac &&
        stopHits >= MinStopwordHits).as("pass"))
  }

  /** Word 2-grams WITH multiplicity (sliding, order-preserving) — unlike
    * [[TextFunctions.shingles]], which is the distinct set for Jaccard.
    * Guarded: `sequence(0, -1)` would generate a DESCENDING range. */
  private def slidingGrams(w: Column, n: Int): Column =
    when(size(w) >= n,
      transform(sequence(lit(0), size(w) - n),
        i => concat_ws(" ", slice(w, i + lit(1), lit(n)))))
      .otherwise(array())

  /** Non-overlapping chunks of `chunkWords` words (the paragraph stand-in
    * for corpora without newlines; last chunk may be short). */
  private def chunks(w: Column, chunkWords: Int): Column =
    when(size(w) > 0,
      transform(sequence(lit(0), ceil(size(w) / lit(chunkWords.toDouble)).cast("int") - 1),
        i => concat_ws(" ", slice(w, i * chunkWords + lit(1), lit(chunkWords)))))
      .otherwise(array())

  /** Within-document repetition metrics (the Gopher repetition family):
    *  - `top_gram_frac`: chars covered by the most frequent word 2-gram
    *    (count x gram length / total word chars), ties broken by the
    *    lexicographically greatest gram;
    *  - `dup_chunk_frac`: chars in chunk values occurring more than once
    *    in the doc / total chunk chars (duplicate-paragraph fraction).
    *
    * Shape: explode -> per-(doc, gram) hash agg -> per-doc agg. Two
    * shuffles keyed by doc id; partial aggregation is map-side, and
    * nothing wider than (id, gram, count) ever shuffles. */
  def repetition(docs: DataFrame, idCol: String, textCol: String,
                 chunkWords: Int = 10): DataFrame = {
    val w = TextFunctions.words(col(textCol))
    val base = docs.select(col(idCol).as("id"), w.as("w"))

    val gramCounts = base
      .select(col("id"), explode(slidingGrams(col("w"), 2)).as("g"))
      .groupBy(col("id"), col("g")).agg(count(lit(1)).as("cnt"))
    val topGram = gramCounts
      .groupBy(col("id"))
      .agg(max(struct(col("cnt"), col("g"))).as("top"))
      .select(col("id"), col("top.cnt").as("top_cnt"), col("top.g").as("top_g"))

    val chunkStats = base
      .select(col("id"), explode(chunks(col("w"), chunkWords)).as("c"))
      .groupBy(col("id"), col("c")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("id"))
      .agg(sum(length(col("c")) * col("cnt")).as("total_chars"),
        sum(when(col("cnt") > 1, length(col("c")) * col("cnt"))
          .otherwise(lit(0))).as("dup_chars"))

    val docChars = docs.select(col(idCol).as("id"),
      length(regexp_replace(col(textCol), "\\s+", "")).cast("double").as("word_chars"))

    docChars
      .join(topGram, Seq("id"), "left")
      .join(chunkStats, Seq("id"), "left")
      .select(
        col("id"),
        coalesce(col("top_cnt"), lit(0L)).as("top_gram_count"),
        round(coalesce(col("top_cnt") * (length(col("top_g")) - 1), lit(0L))
          .cast("double") / greatest(col("word_chars"), lit(1.0)), 4)
          .as("top_gram_frac"),
        round(coalesce(col("dup_chars"), lit(0L)).cast("double") /
          greatest(coalesce(col("total_chars"), lit(0L)).cast("double"), lit(1.0)), 4)
          .as("dup_chunk_frac"))
  }

  /** Cross-document boilerplate removal (the CCNet / RefinedWeb line-dedup
    * step): a chunk whose value appears in >= `minDocs` DISTINCT documents
    * is boilerplate; report per-doc totals and what survives.
    *
    * Shape: explode -> global (chunk -> distinct-doc count) hash agg ->
    * join back -> per-doc agg. The chunk-frequency table is the only
    * global state and it shuffles as (chunk-hash, id) pairs — at 100 TB
    * this is the standard two-shuffle inverted-index pass; the frequent
    * set is NOT broadcast because its size is corpus-dependent (hot
    * boilerplate lines number millions at web scale). */
  /** zlib-compressibility quality signal (the RefinedWeb/FineWeb
    * "compression ratio" gate): highly compressible text is repetitive
    * boilerplate; near-incompressible text is noise/binary junk — the
    * curation keep-band sits between. Deflate is genuinely imperative
    * (stateful dictionary), so this is the documented mapPartitions
    * exception: ONE `Deflater` per partition, reset per row, no
    * per-row allocation beyond the output buffer. One narrow map pass,
    * no shuffle; rows-only gate (no SQL engine replays zlib) with the
    * property spec pinning the compressible/incompressible ordering. */
  def compressionRatio(docs: DataFrame, idCol: String,
                       textCol: String): DataFrame = {
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("n_bytes",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("n_compressed",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ratio",
        org.apache.spark.sql.types.DoubleType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    docs.select(col(idCol).cast("long"), col(textCol))
      .mapPartitions { rows =>
        val deflater = new java.util.zip.Deflater(6)
        // Deflater holds NATIVE buffers; release at task end, not GC
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => deflater.end()))
        val buf = new Array[Byte](1 << 16)
        rows.map { r =>
          val bytes = (if (r.isNullAt(1)) "" else r.getString(1))
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          deflater.reset()
          deflater.setInput(bytes)
          deflater.finish()
          var total = 0L
          while (!deflater.finished()) total += deflater.deflate(buf)
          val ratio = if (bytes.isEmpty) 1.0
            else BigDecimal(total.toDouble / bytes.length)
              .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
          org.apache.spark.sql.Row(r.getLong(0), bytes.length.toLong,
            total, ratio)
        }
      }(enc)
  }

  /** Oracle-gateable form of [[compressionRatio]]: deflate + inflate
    * every document and emit the properties a SQL oracle CAN replay —
    * the UTF-8 byte length, whether the codec round-trip reproduced the
    * input bytes exactly, and whether the compressed size respects the
    * zlib envelope (non-empty output, at most input + header slack).
    * The compression work is identical to [[compressionRatio]] (same
    * deflater level/loop) so the timed cost is representative; the spec
    * keeps pinning the ratio ordering on the raw variant. */
  def compressionRoundTrip(docs: DataFrame, idCol: String,
                           textCol: String): DataFrame = {
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("n_bytes",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("roundtrip_ok",
        org.apache.spark.sql.types.BooleanType),
      org.apache.spark.sql.types.StructField("bounds_ok",
        org.apache.spark.sql.types.BooleanType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    docs.select(col(idCol).cast("long"), col(textCol))
      .mapPartitions { rows =>
        val deflater = new java.util.zip.Deflater(6)
        val inflater = new java.util.zip.Inflater()
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit] { _ =>
            deflater.end(); inflater.end()
          })
        val buf = new Array[Byte](1 << 16)
        rows.map { r =>
          val bytes = (if (r.isNullAt(1)) "" else r.getString(1))
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          deflater.reset()
          deflater.setInput(bytes)
          deflater.finish()
          val compressed = new java.io.ByteArrayOutputStream(bytes.length / 2 + 64)
          while (!deflater.finished()) {
            val n = deflater.deflate(buf)
            compressed.write(buf, 0, n)
          }
          val comp = compressed.toByteArray
          inflater.reset()
          inflater.setInput(comp)
          val back = new java.io.ByteArrayOutputStream(bytes.length + 16)
          while (!inflater.finished()) {
            val n = inflater.inflate(buf)
            if (n > 0) back.write(buf, 0, n)
            // inflate() can return 0 on the call that consumes the
            // trailer (finished flips mid-call) — only a 0 that still
            // wants input without being finished is a truncated stream
            else if (!inflater.finished() && inflater.needsInput())
              sys.error("truncated zlib stream")
          }
          val ok = java.util.Arrays.equals(back.toByteArray, bytes)
          val bounds = comp.length > 0 && comp.length <= bytes.length + 64
          org.apache.spark.sql.Row(r.getLong(0), bytes.length.toLong, ok, bounds)
        }
      }(enc)
  }

  def boilerplateScrub(docs: DataFrame, idCol: String, textCol: String,
                       chunkWords: Int = 10, minDocs: Int = 2): DataFrame = {
    val w = TextFunctions.words(col(textCol))
    val exploded = docs
      .select(col(idCol).as("id"), explode(chunks(w, chunkWords)).as("c"))
    val freq = exploded
      .groupBy(col("c")).agg(countDistinct(col("id")).as("df"))
    exploded
      .join(freq, Seq("c"))
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("df") >= minDocs, 1).otherwise(0)).as("n_boiler"),
        sum(when(col("df") < minDocs, length(col("c"))).otherwise(lit(0)))
          .as("kept_chars"))
  }

  /** Corpus-trained bigram language-model over the lowercase whitespace
    * token stream, with add-alpha smoothing:
    *
    *   P(w2 | w1) = (c(w1 w2) + alpha) / (c(w1 ·) + alpha * V)
    *
    * where c(w1 ·) sums the bigram heads and V is the corpus vocabulary
    * size. Returns (w1, w2, n) counts plus head counts — the model a
    * perplexity filter scores against. One explode + two hash aggs. */
  def bigramCounts(docs: DataFrame, textCol: String): DataFrame = {
    val w = TextFunctions.words(col(textCol))
    docs.select(explode(bigrams(w)).as("b"))
      .groupBy(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .agg(count(lit(1)).as("n"))
  }

  /** Lexical-diversity audit per corpus slice (the distinct-n metric a
    * synthetic-data pipeline watches for mode collapse: a generator
    * that repeats itself shows a falling distinct-gram ratio long
    * before eval loss moves). Per `groupCol`: document count, total
    * and distinct unigram/bigram counts, and the ratios in exact basis
    * points — `distinct_1_bp = distinct·10⁴ div total`.
    *
    * Scale shape: distinct counting shuffles `xxhash64` gram keys (the
    * repo's 8-byte hashed-shuffle rule — raw grams never ride an
    * exchange; a 2⁻⁶⁴ collision would FAIL the string-keyed oracle
    * loudly rather than hide). Two aggregations per order, both with
    * map-side partials; totals are one count per (group, order). */
  def diversity(docs: DataFrame, textCol: String,
                groupCol: String): DataFrame = {
    val w = TextFunctions.words(col(textCol))
    val uni = docs.select(col(groupCol).as("grp"), explode(w).as("g"))
      .select(col("grp"), xxhash64(col("g")).as("gh"))
    val bi = docs.select(col(groupCol).as("grp"),
        explode(bigrams(w)).as("b"))
      .select(col("grp"),
      // space-joined: words are whitespace-split so ' ' cannot occur
      // inside a token - ("ab","c") and ("a","bc") must not collide
        xxhash64(concat_ws(" ", col("b.w1"), col("b.w2"))).as("gh"))
    def stats(grams: DataFrame, order: Int): DataFrame = grams
      .groupBy(col("grp"))
      .agg(count(lit(1)).as(s"total_$order"),
        countDistinct(col("gh")).as(s"distinct_$order"))
      .withColumn(s"distinct_${order}_bp",
        expr(s"distinct_$order * 10000L div greatest(total_$order, 1L)"))
    docs.groupBy(col(groupCol).as("grp"))
      .agg(count(lit(1)).as("n_docs"))
      .join(stats(uni, 1), Seq("grp"), "left")
      .join(stats(bi, 2), Seq("grp"), "left")
      .na.fill(0L, Seq("total_1", "distinct_1", "distinct_1_bp",
        "total_2", "distinct_2", "distinct_2_bp"))
      .select(col("grp").as(groupCol), col("n_docs"),
        col("total_1"), col("distinct_1"), col("distinct_1_bp"),
        col("total_2"), col("distinct_2"), col("distinct_2_bp"))
  }

  /** (w1, w2) struct pairs of adjacent tokens; empty below 2 tokens. */
  private def bigrams(w: Column): Column =
    when(size(w) < 2, array().cast("array<struct<w1:string,w2:string>>"))
      .otherwise(arrays_zip(
        slice(w, lit(1), size(w) - 1).as("w1"),
        slice(w, lit(2), size(w) - 1).as("w2")).cast(
        "array<struct<w1:string,w2:string>>"))

  /** Perplexity-style quality scoring (the CCNet shape: score every
    * document against a language model; unusually-high perplexity =
    * gibberish/boilerplate, unusually-low = degenerate repetition). The
    * model here is the corpus's own add-alpha bigram LM ([[bigramCounts]]
    * — self-scoring, the tokenizer-free stand-in for CCNet's pretrained
    * KenLM); per doc:
    *
    *   avg_nll = mean over bigrams of -ln P(w2 | w1),   ppl = e^avg_nll
    *
    * Docs with fewer than 2 tokens carry no bigrams and are dropped.
    *
    *  Scale: counting is explode + hash agg (map-side partial); scoring
    *  re-joins the token stream to the model on the bigram key — both
    *  shuffles are keyed on words, never on documents or pairs of them.
    *  Every shuffle/join key is xxhash64 of the word/bigram (8 bytes, not
    *  text; the oracle keeps literal strings, so a collision — 2^-64 per
    *  distinct pair — would surface as a gate mismatch), and the model
    *  and head counts both derive from ONE cached exploded pass instead
    *  of re-parsing the corpus per aggregate. At 100 TB the model table
    *  is pruned with a min-count floor and broadcast (OOV bigrams fall
    *  back to the smoothing floor exactly as the unpruned model scores a
    *  count-0 bigram), turning the scoring pass into a map-side join;
    *  here the full model joins by shuffle so the oracle can reproduce
    *  every count. */
  def perplexity(docs: DataFrame, idCol: String, textCol: String,
                 alpha: Double = 0.1): DataFrame = {
    val w = TextFunctions.words(col(textCol))
    val vocab = docs.select(explode(w).as("word"))
      .select(xxhash64(col("word")).as("wh"))
      .distinct().count()
    val docBi = docs
      .select(col(idCol).as("id"), explode(bigrams(w)).as("b"))
      .select(col("id"), xxhash64(col("b.w1")).as("h1"),
        xxhash64(col("b.w1"), col("b.w2")).as("h12"))
      .persist()
    TextQuality.synchronized {
      lastPerplexityCache.foreach(_.unpersist(false))
      lastPerplexityCache = Some(docBi)
    }
    val model = docBi.groupBy(col("h12")).agg(count(lit(1)).as("n"))
    val heads = docBi.groupBy(col("h1")).agg(count(lit(1)).as("n_head"))
    docBi
      .join(model, Seq("h12"))
      .join(heads, Seq("h1"))
      .select(col("id"),
        (-log((col("n") + lit(alpha)) /
          (col("n_head") + lit(alpha) * lit(vocab.toDouble)))).as("nll"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(col("nll")), 4).as("avg_nll"),
        round(exp(avg(col("nll"))), 2).as("ppl"))
  }

  /** C4-style SENTENCE-level filtering (Raffel 2020 §2.2 cleans line by
    * line; the same gates at sentence grain): split on terminal
    * punctuation, keep sentences with >= minWords words, rebuild the
    * document from the survivors. Unterminated trailing fragments never
    * match the sentence pattern and fall away — the "incomplete line"
    * rule. One codegen'd map pass (regexp_extract_all + higher-order
    * filter), no shuffle, and every step is RE2-compatible (no
    * lookbehind), so an oracle replays the rebuild byte-for-byte.
    * Returns (id, n_sentences, n_kept, text_clean). */
  def sentenceFilter(docs: DataFrame, idCol: String, textCol: String,
                     minWords: Int = 3): DataFrame = {
    val sentences = expr(
      s"regexp_extract_all($textCol, '[^.!?]+[.!?]+', 0)")
    val words = (sc: Column) => split(trim(sc), "\\s+")
    docs.select(col(idCol),
        sentences.as("_sents"))
      .withColumn("_kept",
        filter(col("_sents"), sc => size(words(sc)) >= minWords))
      .select(col(idCol),
        size(col("_sents")).cast("long").as("n_sentences"),
        size(col("_kept")).cast("long").as("n_kept"),
        concat_ws(" ", transform(col("_kept"), sc => trim(sc)))
          .as("text_clean"))
  }

  /** Readability counts — the Flesch–Kincaid inputs as EXACT integers,
    * with the two ratios in integer basis points so the gate carries
    * no FP: words (whitespace tokens), sentences (runs of terminal
    * punctuation, floored at 1 for unterminated fragments), and
    * syllables (vowel-group runs over the lowercased text — the
    * standard heuristic; spaces break runs, so the text-wide count
    * equals the per-word sum). The grade itself is one downstream
    * expression over the emitted ratios — kept out of the gate because
    * its two float multiplies would put a rounding boundary inside the
    * hash. One codegen'd projection, no shuffle. */
  def readability(docs: DataFrame, idCol: String,
                  textCol: String): DataFrame = {
    val nWords = size(filter(split(col(textCol), "\\s+"),
      w => length(w) > 0))
    val nSents = greatest(lit(1), size(
      regexp_extract_all(col(textCol), lit("[.!?]+"), lit(0))))
    val nSylls = size(
      regexp_extract_all(lower(col(textCol)), lit("[aeiouy]+"), lit(0)))
    docs.select(col(idCol),
        nWords.as("n_words"), nSents.as("n_sentences"),
        nSylls.as("n_syllables"))
      .withColumn("wps_bp", expr(
        "CAST(n_words AS BIGINT) * 10000 div n_sentences"))
      .withColumn("spw_bp", expr(
        "CAST(n_syllables AS BIGINT) * 10000 div greatest(n_words, 1)"))
  }
}

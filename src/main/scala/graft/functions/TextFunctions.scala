package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data pipelines:
  * tokenization, shingling, quality scoring, language id, fingerprinting.
  * All built-in compositions (codegen'd); DuckDB-mirrorable for oracles.
  */
object TextFunctions {

  /** Whitespace word tokens, lowercased, empties dropped. */
  def words(text: Column): Column =
    filter(split(lower(text), "\\s+"), w => length(w) > 0)

  /** Whitespace token count. */
  def tokenCountWs(text: Column): Column = size(words(text))

  /** BPE-ish token count: letter runs, digit runs, single punctuation —
    * the standard pre-tokenizer shape (GPT-2-style regex, simplified). */
  val BpePattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"
  def tokenCountBpe(text: Column): Column =
    size(regexp_extract_all(text, lit(BpePattern), lit(0)))

  /** Word n-gram shingles (distinct) — the unit for Jaccard/MinHash
    * dedup. Codegen'd Catalyst expression (the equivalent higher-order-
    * function composition runs interpreted and re-walks the word array
    * per shingle; see [[graft.functions.expressions.WordShingles]]). */
  def shingles(text: Column, n: Int): Column =
    graft.functions.expressions.WordShingles.word_shingles(text, n)

  /** Unicode NFC composition (visually-identical strings hash alike). */
  def nfc(text: Column): Column =
    graft.functions.expressions.UnicodeNormalize.unicode_normalize(text, "NFC")

  /** Decompose, drop nonspacing marks, recompose — 'café' -> 'cafe'. */
  def stripAccents(text: Column): Column =
    graft.functions.expressions.UnicodeNormalize
      .unicode_normalize(text, "STRIP_ACCENTS")

  /** Rolling-hash document fingerprint: md5 of the sorted distinct word
    * set (case-folded) — robust to word order and duplication. */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(words(text)))))

  /** Overlapping word-window chunks (embedding/retrieval prep: split a
    * document into `chunkWords`-word pieces every `strideWords` words;
    * stride < chunk ⇒ overlap). Array of (idx, chunk) structs — a pure
    * per-row projection (codegen'd, no shuffle at any scale); explode
    * downstream to get one row per chunk. The final chunk clamps at the
    * document end; empty docs yield no chunks. */
  def chunkWindows(text: Column, chunkWords: Int, strideWords: Int): Column = {
    require(chunkWords > 0 && strideWords > 0, "chunk/stride must be positive")
    val w = words(text)
    when(size(w) < 1,
      array().cast("array<struct<idx:int,chunk:string>>"))
      .otherwise(transform(
        sequence(lit(0), size(w) - 1, lit(strideWords)),
        st => struct(
          (st / strideWords).cast("int").as("idx"),
          concat_ws(" ", slice(w, st + 1, lit(chunkWords))).as("chunk"))))
  }

  // ---- quality scoring -------------------------------------------------

  val StopwordsEn: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "for",
    "on", "with", "as", "at", "by", "this", "that")

  def stopwordCount(text: Column, stopwords: Seq[String] = StopwordsEn): Column =
    size(filter(words(text), w => w.isInCollection(stopwords)))

  /** Composite quality score in [0,1]: length band + stopword presence +
    * lexical diversity + low punctuation density. Deterministic; rounded
    * to 4 dp for engine parity. */
  def qualityScore(text: Column): Column = {
    val nw = size(words(text)).cast("double")
    val nchars = length(text).cast("double")
    val lenScore = least(nw / lit(50.0), lit(1.0))
    val stopRatio = stopwordCount(text).cast("double") / greatest(nw, lit(1.0))
    val stopScore = least(stopRatio * lit(4.0), lit(1.0))
    val diversity = size(array_distinct(words(text))).cast("double") /
      greatest(nw, lit(1.0))
    val punct = size(regexp_extract_all(text, lit("[^a-zA-Z0-9\\s]"), lit(0)))
      .cast("double")
    val punctScore = lit(1.0) - least(punct / greatest(nchars, lit(1.0)) * lit(10.0), lit(1.0))
    round((lenScore + stopScore + diversity + punctScore) / lit(4.0), 4)
  }

  // ---- language id -----------------------------------------------------

  /** Tiny deterministic stopword-profile language detector. Scores each
    * language by distinct-stopword hits; highest count wins, ties broken
    * by language code order, 0 hits -> 'und'. */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "en" -> Seq("the", "and", "is", "of", "to", "in", "that", "it"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "es", "un"),
    "fr" -> Seq("le", "la", "les", "de", "et", "est", "un", "une"),
    "zh" -> Seq("的", "是", "不", "了", "在", "人", "有", "我"))

  def langId(text: Column): Column = {
    val ws = array_distinct(words(text))
    val scored = LangProfiles.map { case (lang, stops) =>
      struct(size(filter(ws, w => w.isInCollection(stops))).as("hits"),
        lit(lang).as("lang"))
    }
    // array_max on struct = lexicographic (hits, lang); ties -> later code.
    val best = array_max(array(scored: _*))
    when(best.getField("hits") > 0, best.getField("lang")).otherwise("und")
  }

  // ---- PII scrubbing ---------------------------------------------------

  /** Redaction patterns, chosen from the regex subset Java and RE2
    * (DuckDB) interpret identically so the oracle can replay the exact
    * rewrite. Order matters: emails first (an email contains runs the
    * later rules could nibble), then IPs (dotted digits), then phones —
    * the phone class deliberately has NO dot so it can never consume an
    * IP. Stated precision tradeoff: long dash/space digit runs that are
    * not phones (e.g. "2024-01-01 2025") also redact — PII scrubbing for
    * training corpora errs toward recall, as the big public corpus
    * filters do. */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "[EMAIL]",
    "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}" -> "[IP]",
    "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b" -> "[SSN]",
    "\\+?[0-9][0-9() -]{7,}[0-9]" -> "[PHONE]")

  /** Scrub emails/phones/IPs from free text — the curation step a
    * training corpus runs before tokenization. One codegen'd
    * regexp_replace chain, no UDF. */
  def redactPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (c, (pattern, tag)) =>
      regexp_replace(c, pattern, tag)
    }

  /** Card-number candidates: 13–19 digits with single space/dash
    * separators, word-bounded. Pattern-only matching would redact any
    * long number (dates, ids); real card detection is pattern + Luhn. */
  val CardCandidate = "\\b[0-9](?:[ -]?[0-9]){12,18}\\b"

  /** Luhn checksum over the digits of `c` (rightmost digit is position
    * 0; every second digit from the right doubles, >9 subtracts 9; valid
    * iff the sum is a multiple of 10). Pure higher-order-function fold —
    * stays inside whole-stage codegen, no UDF. */
  def luhnValid(c: Column): Column = {
    val ds = regexp_replace(c, "[^0-9]", "")
    val n = length(ds)
    val sum = aggregate(
      sequence(lit(0), n - 1), lit(0),
      (acc, i) => {
        val d = ds.substr(n - i, lit(1)).cast("int")
        acc + when(pmod(i, lit(2)) === 1,
          when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)).otherwise(d)
      })
    n.between(13, 19) && pmod(sum, lit(10)) === 0
  }

  /** Redact Luhn-valid card numbers: extract candidates, validate each,
    * fold-replace the exact matched substrings. Luhn-INVALID candidates
    * are left for the later pattern rules (a non-card digit run may
    * still be a phone — recall over precision, as with the rest of the
    * chain). */
  def redactCards(text: Column): Column = {
    val valid = filter(
      regexp_extract_all(text, lit(CardCandidate), lit(0)),
      c => luhnValid(c))
    aggregate(valid, text, (acc, c) => replace(acc, c, lit("[CARD]")))
  }

  /** Full PII chain: emails, then Luhn-validated cards (before the IP/
    * SSN/phone digit rules can nibble a separated card run), then the
    * pattern rules. */
  def redactPiiAll(text: Column): Column =
    PiiPatterns.tail.foldLeft(redactCards(regexp_replace(text,
        PiiPatterns.head._1, PiiPatterns.head._2))) {
      case (c, (pattern, tag)) => regexp_replace(c, pattern, tag)
    }

  // ---- HTML text extraction ---------------------------------------------

  /** HTML -> plain text (the WET-extraction step of a web-crawl corpus):
    * drop script/style subtrees and comments, strip remaining tags,
    * decode the core character entities, collapse whitespace. Like
    * [[PiiPatterns]], every pattern is from the Java-regex/RE2 common
    * subset — `(?is)` flags and lazy quantifiers, NO backreferences
    * (RE2 has none) — so a DuckDB oracle replays the rewrite exactly.
    * Entity order: named entities decode before `&amp;` so "&amp;lt;"
    * correctly yields "&lt;" (double-encoded stays encoded one level),
    * the standard single-pass decode rule. */
  def htmlToText(html: Column): Column = {
    val stripped = Seq(
      "(?is)<script[^>]*>.*?</script>",
      "(?is)<style[^>]*>.*?</style>",
      "(?s)<!--.*?-->",
      "(?s)</?[A-Za-z!][^>]*>").foldLeft(html)(
      (c, p) => regexp_replace(c, p, " "))
    val decoded = Seq(
      "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&").foldLeft(stripped) {
      case (c, (e, r)) => regexp_replace(c, e, r)
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.functions.expressions.SimHash64
import graft.operators.{Collocations, Dedup, EvalMetrics, FilterFunnel, Multimodal, QualityClassifier, Quantization, Sampling, Similarity, TextQuality, Tokenizer, UrlFilter}

/** Sampling / corpus-assembly gates: mixing, temperature,
  * packing, chunking, token budgets, DSIR, release cuts.
  *
  * Split from [[QueriesTrainingData]] (round 12) along the COVERAGE.md
  * family boundaries; the folded `gated` registry shape is unchanged and
  * [[QueriesTrainingData.gated]] concatenates the families. Shared
  * helpers/oracle CTEs live in [[QueriesTdShared]].
  */
private[graft] object QueriesTdSample {
  import Queries.Q
  import QueriesTdShared._

  val gated: Seq[(String, Q, String)] = Seq(
    // composed pipeline: quality filter -> exact dedup -> per-language
    // token accounting — the end-to-end shape of a curation job
    ("td_pipeline",
      ((s, dir) => {
      val curated = Dedup.exact(
        docs(s, dir).filter(TextFunctions.qualityScore(col("text")) >= 0.5),
        "doc_id", Seq("text"))
      curated.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextFunctions.tokenCountWs(col("text"))).as("total_words"),
          round(avg(TextFunctions.qualityScore(col("text"))), 4).as("avg_quality"))
    }),
      (wordsOnlyCte +
      """, scored AS (
        |  SELECT doc_id, lang, text,
        |    CAST(len(w) AS DOUBLE) AS nw,
        |    ROUND((
        |      least(CAST(len(w) AS DOUBLE) / 50.0, 1.0) +
        |      least(CAST(len(list_filter(w, x -> list_contains(
        |        ['the','a','an','and','or','of','to','in','is','it','for',
        |         'on','with','as','at','by','this','that'], x))) AS DOUBLE)
        |        / greatest(CAST(len(w) AS DOUBLE), 1.0) * 4.0, 1.0) +
        |      CAST(len(list_distinct(w)) AS DOUBLE)
        |        / greatest(CAST(len(w) AS DOUBLE), 1.0) +
        |      (1.0 - least(CAST(len(regexp_extract_all(text,
        |        '[^a-zA-Z0-9\s]')) AS DOUBLE)
        |        / greatest(CAST(length(text) AS DOUBLE), 1.0) * 10.0, 1.0))
        |    ) / 4.0, 4) AS quality
        |  FROM ws),
        |curated AS (
        |  SELECT * FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text)
        |      ORDER BY doc_id) AS rn
        |    FROM scored WHERE quality >= 0.5) WHERE rn = 1)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CAST(nw AS INT)) AS BIGINT) AS total_words,
        |  ROUND(AVG(quality), 4) AS avg_quality
        |FROM curated GROUP BY lang""".stripMargin)),
    // training-data mixing: deterministic stratified sampling by language
    // (md5-bucket per doc id, per-stratum basis-point rates) — the
    // reproducible corpus-mix primitive
    ("td_mix",
      ((s, dir) =>
      Sampling.stratifiedMix(docs(s, dir), "doc_id", "lang",
        Map("en" -> 8000, "de" -> 5000, "fr" -> 2500), defaultRateBp = 1000)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"),
          sum(col("n_chars")).as("kept_chars"))),
      """SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_kept,
        |  CAST(SUM(n_chars) AS BIGINT) AS kept_chars
        |FROM documents
        |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
        |    % 10000 <
        |  CASE lang WHEN 'en' THEN 8000 WHEN 'de' THEN 5000
        |    WHEN 'fr' THEN 2500 ELSE 1000 END
        |GROUP BY lang""".stripMargin),
    // temperature-scaled source mixing (multilingual sampling rule,
    // shares ∝ n^T): per-source keep rates from one tiny aggregate,
    // then the same deterministic md5-bucket filter as td_mix — the
    // oracle recomputes the rates (power/round/clamp) and replays the
    // filter
    ("td_mix_temperature",
      ((s, dir) => {
      val d = docs(s, dir)
      val rates = Sampling.temperatureRates(d, "lang", temperature = 0.7)
      Sampling.stratifiedMix(d, "doc_id", "lang", rates)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"),
          sum(col("n_chars")).as("kept_chars"))
    }),
      """WITH cnt AS (
        |  SELECT lang, CAST(COUNT(*) AS DOUBLE) AS n
        |  FROM documents GROUP BY 1),
        |mn AS (SELECT MIN(n) AS mn FROM cnt),
        |rates AS (
        |  SELECT lang,
        |    GREATEST(1, CAST(ROUND(POWER(n / mn, 0.7 - 1) * 10000) AS INT))
        |      AS bp
        |  FROM cnt, mn)
        |SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_kept,
        |  CAST(SUM(n_chars) AS BIGINT) AS kept_chars
        |FROM documents d JOIN rates r ON d.lang = r.lang
        |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
        |    % 10000 < r.bp
        |GROUP BY d.lang""".stripMargin),
    // upsampling by epoch repetition (the over-1.0 half of mixing):
    // floor(w) copies plus a deterministic md5-bucket fractional copy;
    // the oracle recomputes per-doc copy counts and replays the totals
    ("td_upsample",
      ((s, dir) =>
      Sampling.epochRepeat(docs(s, dir), "doc_id", "lang",
        Map("fr" -> 2.5, "de" -> 1.25))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("doc_id")).as("n_docs"),
          max(col("epoch")).as("max_epoch"))),
      """WITH w AS (
        |  SELECT doc_id, lang,
        |    CASE lang WHEN 'fr' THEN 2.5 WHEN 'de' THEN 1.25
        |      ELSE 1.0 END AS wt
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, lang,
        |    CAST(FLOOR(wt) AS INT) +
        |    CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |             ::BIGINT % 10000
        |           < CAST((wt - FLOOR(wt)) * 10000 AS INT)
        |      THEN 1 ELSE 0 END AS n
        |  FROM w)
        |SELECT lang, CAST(SUM(n) AS BIGINT) AS n_rows,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(MAX(n) - 1 AS INT) AS max_epoch
        |FROM c GROUP BY 1""".stripMargin),
    // sequence packing (GPT-style concat-and-split training prep):
    // global token offsets by a distributed two-phase prefix sum, each
    // doc mapped to the fixed-length sequences it lands in
    ("td_pack",
      ((s, dir) =>
      Sampling.packSequences(
        docs(s, dir).select(col("doc_id"),
          TextFunctions.tokenCountWs(col("text")).as("n_toks")),
        "doc_id", "n_toks", seqLen = 512)),
      """WITH ws AS (
        |  SELECT doc_id, CAST(len(list_filter(
        |    string_split_regex(lower(text), '\s+'), w -> len(w) > 0))
        |    AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(SUM(n_tokens) OVER (ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS cum_before
        |  FROM ws)
        |SELECT doc_id AS id, n_tokens, cum_before,
        |  cum_before // 512 AS seq_first,
        |  (cum_before + greatest(n_tokens, 1) - 1) // 512 AS seq_last
        |FROM c""".stripMargin),
    // packed-sequence segment boundaries (the block-diagonal attention
    // mask table): per packed document, its token offsets inside the
    // sequence it starts in and whether it spans into the next — pure
    // arithmetic over the pack offsets, no exchange beyond the pack's
    ("td_pack_boundaries",
      ((s, dir) =>
      Sampling.packBoundaries(
        Sampling.packSequences(
          docs(s, dir).select(col("doc_id"),
            TextFunctions.tokenCountWs(col("text")).as("n_toks")),
          "doc_id", "n_toks", seqLen = 512),
        seqLen = 512)),
      """WITH ws AS (
        |  SELECT doc_id, CAST(len(list_filter(
        |    string_split_regex(lower(text), '\s+'), w -> len(w) > 0))
        |    AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(SUM(n_tokens) OVER (ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS cum_before
        |  FROM ws)
        |SELECT doc_id AS id,
        |  cum_before // 512 AS seq_id,
        |  cum_before % 512 AS start_off,
        |  least(512, cum_before % 512 + n_tokens) AS end_off,
        |  ((cum_before + greatest(n_tokens, 1) - 1) // 512)
        |    > (cum_before // 512) AS continues
        |FROM c""".stripMargin),
    // packing-efficiency audit (the pre-commit report over the packed
    // dataset): sequence count, token utilization in bp, split docs,
    // boundary crossings — one aggregate row of exact integers
    ("td_pack_stats",
      ((s, dir) =>
      Sampling.packingStats(
        Sampling.packSequences(
          docs(s, dir).select(col("doc_id"),
            TextFunctions.tokenCountWs(col("text")).as("n_toks")),
          "doc_id", "n_toks", seqLen = 512),
        seqLen = 512)),
      """WITH ws AS (
        |  SELECT doc_id, CAST(len(list_filter(
        |    string_split_regex(lower(text), '\s+'), w -> len(w) > 0))
        |    AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(SUM(n_tokens) OVER (ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS cum_before
        |  FROM ws),
        |p AS (
        |  SELECT n_tokens, cum_before // 512 AS seq_first,
        |    (cum_before + greatest(n_tokens, 1) - 1) // 512 AS seq_last
        |  FROM c),
        |a AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) AS total_tokens,
        |    CAST(COALESCE(SUM(CASE WHEN seq_last > seq_first
        |      THEN 1 ELSE 0 END), 0) AS BIGINT) AS docs_split,
        |    CAST(COALESCE(SUM(seq_last - seq_first), 0) AS BIGINT)
        |      AS boundary_crossings,
        |    MAX(seq_last) AS max_last
        |  FROM p),
        |b AS (
        |  SELECT *, COALESCE(max_last + 1, 0) AS n_seqs FROM a)
        |SELECT n_docs, total_tokens, CAST(n_seqs AS BIGINT) AS n_seqs,
        |  CAST(total_tokens * 10000 // GREATEST(n_seqs * 512, 1)
        |    AS BIGINT) AS utilization_bp,
        |  docs_split, boundary_crossings
        |FROM b""".stripMargin),
    // DoReMi-style domain reweighting (linearized multiplicative
    // weights): per-language mean loss proxy (mean word length in
    // micros — exact integer division), clipped excess over the global
    // mean normalized to bp of the worst domain, then 3 integer
    // MW rounds from the uniform start — the oracle replays the
    // aggregation and every renormalized round exactly
    ("td_domain_reweight",
      ((s, dir) => {
      val d = docs(s, dir)
        .withColumn("_nchars", length(col("text")).cast("long") * 1000000L)
        .withColumn("_nw",
          greatest(size(TextFunctions.words(col("text"))).cast("long"),
            lit(1L)))
        .withColumn("loss_micro", expr("_nchars div _nw"))
      Sampling.domainReweight(d, "lang", "loss_micro",
        iters = 3, etaBp = 2000)
    }),
      (doremiCore +
      """SELECT domain, CAST(n_docs AS BIGINT) AS n_docs,
        |  CAST(mean_loss AS BIGINT) AS mean_loss,
        |  CAST(excess_bp AS BIGINT) AS excess_bp,
        |  CAST(w0 AS BIGINT) AS w0, CAST(w1 AS BIGINT) AS w1,
        |  CAST(w2 AS BIGINT) AS w2, CAST(w3 AS BIGINT) AS w3
        |FROM n3""".stripMargin)),
    // overlapping chunking for embedding/retrieval prep: 64-word chunks
    // every 48 words (16-word overlap), one codegen'd projection +
    // explode — chunk text hashed so the gate stays compact
    ("td_chunks",
      ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
          explode(TextFunctions.chunkWindows(col("text"), 64, 48)).as("c"))
        .select(col("doc_id"), col("c.idx").as("chunk_idx"),
          md5(col("c.chunk")).as("chunk_md5"),
          length(col("c.chunk")).as("chunk_chars"))),
      """WITH ws AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
        |                             w -> len(w) > 0) AS w
        |  FROM documents),
        |ch AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(0, greatest(len(w), 0), 48),
        |      s -> {'idx': s // 48,
        |            'chunk': array_to_string(w[s+1:s+64], ' ')})) AS c
        |  FROM ws WHERE len(w) >= 1)
        |SELECT doc_id, CAST(c.idx AS INTEGER) AS chunk_idx,
        |  md5(c.chunk) AS chunk_md5,
        |  CAST(length(c.chunk) AS INTEGER) AS chunk_chars
        |FROM ch""".stripMargin),
    // FUZZY decontamination: near-duplicate overlap between the corpus
    // and the benchmark slice (doc_id%97==0, the td_decontam convention)
    // via the minhash cross-pairs — catches REWORDED test leakage that
    // exact n-gram matching misses. The corpus is spiked with a leaked
    // copy of every benchmark doc (first word dropped, id+10000) so the
    // gate proves detection, not absence; oracle = exact cross-set
    // Jaccard over the same spiked corpus
    // the RELEASE CUT — the query a curation pipeline runs to cut a
    // dataset release, composed end to end: Gopher quality gates →
    // MinHash near-dup pairs over the survivors → leakage-free
    // train/val/test split keyed on near-dup components → the per-split
    // dataset card (docs/words/languages). One oracle replays every
    // stage: the quality thresholds, the exact-Jaccard pair set, the
    // recursive component closure, the md5 bucket rule, and the card.
    ("td_release_cut",
      ((s, dir) => {
      val d = docs(s, dir)
      val q = TextQuality.gopherQuality(d, "doc_id", "text")
      // the battery minus the stopword rule — this synthetic corpus has
      // no English stopwords, and a gate that keeps zero docs gates
      // nothing (quality rules are configured per corpus; 394/500 pass
      // here). Filters compare the ROUNDED emitted metrics, so the
      // decision is engine-exact.
      val keptIds = q.filter(col("n_words") >= 30 &&
        col("n_words") <= 100000 &&
        col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0 &&
        col("symbol_ratio") < 0.1 && col("alpha_word_frac") > 0.8)
      val kept = d.join(keptIds.select(col("doc_id")), Seq("doc_id"))
      val pairs = Dedup.minhashLshPairs(kept, "doc_id", "text",
        n = 3, threshold = 0.5, numHashes = 128, rowsPerBand = 2)
      val split = Dedup.leakFreeSplit(kept.select(col("doc_id")),
        "doc_id", pairs, testBp = 1000, valBp = 1000)
      split.join(kept, Seq("doc_id"))
        .select(col("split"), col("lang"),
          size(TextFunctions.words(col("text"))).as("nw"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("nw")).as("n_words"),
          countDistinct(col("lang")).as("n_langs"))
    }),
      """WITH RECURSIVE ws AS (
        |  SELECT doc_id, text, lang,
        |    list_filter(string_split_regex(lower(text), '\s+'),
        |      x -> len(x) > 0) AS w
        |  FROM documents),
        |m AS (
        |  SELECT doc_id,
        |    CAST(len(w) AS DOUBLE) AS nw,
        |    CAST(length(regexp_replace(text, '\s+', '', 'g'))
        |      AS DOUBLE) AS cw,
        |    CAST(len(regexp_extract_all(text, '#|\.\.\.'))
        |      AS DOUBLE) AS sym,
        |    CAST(len(list_filter(w, x -> regexp_matches(x, '[a-z]')))
        |      AS DOUBLE) AS alpha,
        |    len(list_intersect(list_distinct(w),
        |      ['the','be','to','of','and','that','have','with'])) AS hits
        |  FROM ws),
        |kept AS (
        |  SELECT ws.doc_id, ws.lang, ws.w FROM ws JOIN m USING (doc_id)
        |  WHERE m.nw >= 30 AND m.nw <= 100000
        |    AND ROUND(m.cw / greatest(m.nw, 1.0), 4) >= 3.0
        |    AND ROUND(m.cw / greatest(m.nw, 1.0), 4) <= 10.0
        |    AND ROUND(m.sym / greatest(m.nw, 1.0), 4) < 0.1
        |    AND ROUND(m.alpha / greatest(m.nw, 1.0), 4) > 0.80),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(0, greatest(len(w) - 2, 0)),
        |    i -> array_to_string(w[i+1:i+3], ' ')))) AS sh
        |  FROM kept),
        |nsh AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
        |inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT id_a, id_b FROM inter
        |  JOIN nsh na ON na.doc_id = id_a
        |  JOIN nsh nb ON nb.doc_id = id_b
        |  WHERE ROUND(CAST(i AS DOUBLE) / (na.n + nb.n - i), 4) >= 0.5),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs),
        |reach AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        |labels AS (
        |  SELECT src AS id, LEAST(src, MIN(dst)) AS component
        |  FROM reach GROUP BY src),
        |keyed AS (
        |  SELECT k.doc_id, k.lang, CAST(len(k.w) AS BIGINT) AS nw,
        |    COALESCE(l.component, k.doc_id) AS key
        |  FROM kept k LEFT JOIN labels l ON l.id = k.doc_id),
        |sp AS (
        |  SELECT doc_id, lang, nw,
        |    CAST(('0x' || substring(md5(CAST(key AS VARCHAR)), 1, 8))
        |      AS BIGINT) % 10000 AS b
        |  FROM keyed)
        |SELECT CASE WHEN b < 1000 THEN 'test'
        |    WHEN b < 2000 THEN 'val' ELSE 'train' END AS split,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(nw) AS BIGINT) AS n_words,
        |  CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
        |FROM sp GROUP BY 1""".stripMargin),
    // single-pass filter-funnel audit (Gopher A1 / RefinedWeb attrition
    // table): each doc charged to the FIRST gate it fails, whole battery
    // one corpus scan; summary = dropped + remaining per stage in order
    ("td_filter_funnel",
      ((s, dir) => {
      val text = col("text")
      val w = TextFunctions.words(text)
      val nWords = size(w).cast("double")
      val denomW = greatest(nWords, lit(1.0))
      val meanWordLen = round(
        length(regexp_replace(text, "\\s+", "")).cast("double") / denomW, 4)
      val symbolRatio = round(
        size(regexp_extract_all(text, lit("#|\\.\\.\\."), lit(0)))
          .cast("double") / denomW, 4)
      val stopHits = size(array_intersect(array_distinct(w),
        array(TextQuality.RequiredStopwords.map(lit): _*)))
      val emailPat = TextFunctions.PiiPatterns.head._1
      val stages = Seq(
        "lang_en" -> (col("lang") === "en"),
        "too_short" -> (nWords >= TextQuality.MinWords),
        "mean_word_len" -> (meanWordLen >= TextQuality.MinMeanWordLen &&
          meanWordLen <= TextQuality.MaxMeanWordLen),
        "symbol_ratio" -> (symbolRatio < TextQuality.MaxSymbolRatio),
        "stopwords" -> (stopHits >= TextQuality.MinStopwordHits),
        "email_pii" ->
          (size(regexp_extract_all(text, lit(emailPat), lit(0))) === 0))
      FilterFunnel.funnel(FilterFunnel.audit(docs(s, dir), stages),
        stages.map(_._1))
    }),
      (wordsOnlyCte +
      """, m AS (
        |  SELECT doc_id, lang,
        |    CAST(len(w) AS DOUBLE) AS nw,
        |    ROUND(CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE)
        |      / greatest(CAST(len(w) AS DOUBLE), 1.0), 4) AS mwl,
        |    ROUND(CAST(len(regexp_extract_all(text, '#|\.\.\.')) AS DOUBLE)
        |      / greatest(CAST(len(w) AS DOUBLE), 1.0), 4) AS symr,
        |    len(list_intersect(list_distinct(w),
        |      ['the','be','to','of','and','that','have','with'])) AS hits,
        |    len(regexp_extract_all(text,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS emails
        |  FROM ws),
        |v AS (
        |  SELECT CASE
        |    WHEN NOT (lang = 'en') THEN 'lang_en'
        |    WHEN NOT (nw >= 30) THEN 'too_short'
        |    WHEN NOT (mwl >= 3.0 AND mwl <= 10.0) THEN 'mean_word_len'
        |    WHEN NOT (symr < 0.1) THEN 'symbol_ratio'
        |    WHEN NOT (hits >= 2) THEN 'stopwords'
        |    WHEN NOT (emails = 0) THEN 'email_pii'
        |  END AS first_drop FROM m),
        |c AS (SELECT first_drop, COUNT(*) AS n FROM v
        |      WHERE first_drop IS NOT NULL GROUP BY 1),
        |st(stage, stage_idx) AS (VALUES
        |  ('lang_en', 1), ('too_short', 2), ('mean_word_len', 3),
        |  ('symbol_ratio', 4), ('stopwords', 5), ('email_pii', 6)),
        |tot AS (SELECT COUNT(*) AS t FROM v)
        |SELECT stage, CAST(stage_idx AS INT) AS stage_idx,
        |  CAST(COALESCE(n, 0) AS BIGINT) AS dropped,
        |  CAST(t - SUM(COALESCE(n, 0)) OVER (ORDER BY stage_idx
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS remaining
        |FROM st LEFT JOIN c ON stage = first_drop CROSS JOIN tot
        |ORDER BY stage_idx""".stripMargin)),
    // per-domain cap over the canonical URLs (crawl frequency caps):
    // at most 40 docs per host, chosen by the seeded deterministic
    // shuffle order; row_number<=N compiles to WindowGroupLimit (hot
    // domains ship N rows, not their mass)
    ("td_domain_cap",
      ((s, dir) => {
      val d = docs(s, dir).withColumn("host",
        element_at(typedLit(UrlHosts), (pmod(col("doc_id"), lit(8)) + 1).cast("int")))
      val kept = Sampling.perKeyCap(d, "host", "doc_id",
        maxPerKey = 40, seed = "capseed")
      d.groupBy(col("host")).agg(count(lit(1)).as("n_total"))
        .join(kept.groupBy(col("host")).agg(count(lit(1)).as("n_kept")),
          Seq("host"))
        .select(col("host"), col("n_total"), col("n_kept"))
    }),
      (s"""WITH d AS (
         |  SELECT doc_id,
         |    ${duckList(UrlHosts)}[CAST(doc_id % 8 AS INT) + 1] AS host,
         |    md5('capseed:' || doc_id) AS key
         |  FROM documents),
         |r AS (
         |  SELECT host, doc_id,
         |    ROW_NUMBER() OVER (PARTITION BY host ORDER BY key, doc_id)
         |      AS rk
         |  FROM d)
         |SELECT host, CAST(COUNT(*) AS BIGINT) AS n_total,
         |  CAST(COUNT(CASE WHEN rk <= 40 THEN 1 END) AS BIGINT) AS n_kept
         |FROM r GROUP BY host""".stripMargin)),
    // deterministic global shuffle + sharding (reproducible training
    // long-context sliding-window chunking over TOKENS (the LM
    // pre-packing split; td_chunks covers the CHARACTER-window
    // embedding-prep shape): window 32, stride 16 — overlapping
    // chunks, minimal covering start set, one short tail chunk; oracle
    // replays starts, lengths, and the chunk text bytes (md5) exactly
    ("td_chunk",
      ((s, dir) =>
      Tokenizer.chunkDocs(docs(s, dir), "doc_id", "text",
          window = 32, stride = 16)
        .select(col("doc_id"), col("chunk_id"), col("start"),
          col("chunk_len"), md5(col("chunk_text")).as("chunk_md5"))),
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'),
        |      w -> len(w) > 0) AS t
        |  FROM documents),
        |sized AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0),
        |starts AS (
        |  SELECT doc_id, t, n, gs.s AS start
        |  FROM sized CROSS JOIN generate_series(0, 4096, 16) gs(s)
        |  WHERE gs.s < n AND (gs.s = 0 OR gs.s - 16 + 32 < n))
        |SELECT doc_id, CAST(start / 16 AS INT) AS chunk_id,
        |  CAST(start AS INT) AS start,
        |  CAST(LEAST(32, n - start) AS INT) AS chunk_len,
        |  md5(array_to_string(t[start + 1 : start + 32], ' ')) AS chunk_md5
        |FROM starts""".stripMargin),
    // order): shard and in-shard position are pure functions of
    // (seed, doc_id) — the oracle replays them exactly
    ("td_shuffle",
      ((s, dir) =>
      Sampling.deterministicShuffle(docs(s, dir), "doc_id", "epoch0", 8)
        .select(col("doc_id"), col("shard"), col("pos"))),
      """WITH k AS (
        |  SELECT doc_id, md5('epoch0:' || doc_id) AS key
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, key,
        |    CAST(('0x' || substr(key, 1, 8))::BIGINT % 8 AS INT) AS shard
        |  FROM k)
        |SELECT doc_id, shard,
        |  ROW_NUMBER() OVER (PARTITION BY shard ORDER BY key, doc_id) AS pos
        |FROM s""".stripMargin),
    // token-budget mix assembly: greedy per-source fill in deterministic
    // shuffle-key order until each source's TOKEN budget is reached
    // (overshoot <= one doc); kept set is a key-order prefix per source
    ("td_token_budget",
      ((s, dir) => {
      val toks = docs(s, dir).select(col("doc_id"), col("source"),
        TextFunctions.tokenCountWs(col("text")).as("n_toks"))
      Sampling.tokenBudget(toks, "doc_id", "n_toks", "source",
        Map("src0" -> 500L, "src1" -> 200L), seed = "tb",
        defaultBudget = 100L)
        .groupBy(col("stratum"))
        .agg(count(lit(1)).as("n_kept"),
          sum(col("n_tokens")).as("kept_tokens"))
    }),
      """WITH t AS (
        |  SELECT doc_id, source,
        |    CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
        |      w -> len(w) > 0)) AS BIGINT) AS n_toks,
        |    md5('tb:' || doc_id) AS k
        |  FROM documents),
        |c AS (
        |  SELECT *, SUM(n_toks) OVER (PARTITION BY source ORDER BY k, doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_toks AS cb
        |  FROM t)
        |SELECT source AS stratum, CAST(COUNT(*) AS BIGINT) AS n_kept,
        |  CAST(SUM(n_toks) AS BIGINT) AS kept_tokens
        |FROM c
        |WHERE cb < CASE source WHEN 'src0' THEN 500
        |                       WHEN 'src1' THEN 200 ELSE 100 END
        |GROUP BY source""".stripMargin),
    // length-bucketed batch assembly: smallest covering cap per doc
    // (docs over the largest cap dropped), fixed docs-per-batch =
    // floor(batchTokens/cap) since every doc pads to the cap, batch
    // membership in deterministic shuffle order — per-(bucket, batch)
    // token/padding accounting replays exactly in SQL
    ("td_length_buckets",
      ((s, dir) => {
      val toks = docs(s, dir).select(col("doc_id"),
        TextFunctions.tokenCountWs(col("text")).as("n_toks"))
      Sampling.lengthBucketBatches(toks, "doc_id", "n_toks",
          edges = Seq(24, 48, 96), batchTokens = 768, seed = "lb")
        .groupBy(col("bucket_cap"), col("batch_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("sum_tokens"),
          sum(col("padded_tokens")).as("sum_padding"))
    }),
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
        |      w -> len(w) > 0)) AS BIGINT) AS n_toks,
        |    md5('lb:' || doc_id) AS k
        |  FROM documents),
        |b AS (
        |  SELECT *, CASE WHEN n_toks <= 24 THEN 24
        |                 WHEN n_toks <= 48 THEN 48
        |                 WHEN n_toks <= 96 THEN 96 END AS cap
        |  FROM t),
        |r AS (
        |  SELECT *,
        |    ROW_NUMBER() OVER (PARTITION BY cap ORDER BY k, doc_id) - 1
        |      AS rk
        |  FROM b WHERE cap IS NOT NULL)
        |SELECT CAST(cap AS INT) AS bucket_cap,
        |  rk // GREATEST(1, 768 // cap) AS batch_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_toks) AS BIGINT) AS sum_tokens,
        |  CAST(SUM(cap - n_toks) AS BIGINT) AS sum_padding
        |FROM r GROUP BY 1, 2""".stripMargin),
    // epoch schedule (the executable form of the DoReMi mixture): the
    // reweighted w3 table joined to per-language token availability →
    // per-domain allocation, downsample rate or upsample repeat factor;
    // oracle replays the whole chain (weights + counts + schedule)
    ("td_epoch_schedule",
      ((s, dir) => {
      val d = docs(s, dir)
        .withColumn("_nchars", length(col("text")).cast("long") * 1000000L)
        .withColumn("_nw",
          greatest(size(TextFunctions.words(col("text"))).cast("long"),
            lit(1L)))
        .withColumn("loss_micro", expr("_nchars div _nw"))
      val w = Sampling.domainReweight(d, "lang", "loss_micro",
        iters = 3, etaBp = 2000)
      val avail = d.groupBy(col("lang").as("domain"))
        .agg(sum(size(TextFunctions.words(col("text"))).cast("long"))
          .as("avail_tokens"))
      Sampling.epochSchedule(w, avail, "domain", "w3", "avail_tokens",
        tokensPerEpoch = 20000L)
    }),
      (doremiCore +
      """, av AS (
        |  SELECT lang AS domain,
        |    CAST(SUM(CAST(len(w) AS BIGINT)) AS BIGINT) AS avail_tokens
        |  FROM ws GROUP BY 1),
        |sch AS (
        |  SELECT COALESCE(n3.domain, av.domain) AS domain,
        |    CAST(w3 AS BIGINT) AS w_bp, av.avail_tokens,
        |    (w3 IS NOT NULL AND av.avail_tokens IS NOT NULL) AS matched,
        |    CASE WHEN w3 IS NOT NULL AND av.avail_tokens IS NOT NULL
        |      THEN CAST(20000 * CAST(w3 AS BIGINT) // 10000 AS BIGINT)
        |      END AS alloc_tokens
        |  FROM n3 FULL JOIN av ON n3.domain = av.domain)
        |SELECT domain, w_bp, avail_tokens, alloc_tokens,
        |  CASE WHEN matched THEN CAST(LEAST(alloc_tokens * 10000
        |    // GREATEST(avail_tokens, 1), 10000) AS BIGINT) END AS rate_bp,
        |  CASE WHEN matched THEN CAST(GREATEST(alloc_tokens * 1000
        |    // GREATEST(avail_tokens, 1), 1000) AS BIGINT)
        |    END AS repeat_milli,
        |  CASE WHEN matched THEN alloc_tokens > avail_tokens
        |    END AS upsampled,
        |  matched
        |FROM sch""".stripMargin)),
    // UniMax fair budget allocation (Chung et al. 2023): equal shares
    // with per-language epoch caps, ascending-cap greedy over the
    // D-row availability table — the oracle replays the exact integer
    // recursion with WITH RECURSIVE (shares and caps all integer
    // division, bit-for-bit)
    ("td_unimax",
      ((s, dir) => {
      val av = docs(s, dir).groupBy(col("lang").as("domain"))
        .agg(sum(size(TextFunctions.words(col("text"))).cast("long"))
          .as("avail_tokens"))
      Sampling.unimaxAllocation(av, "domain", "avail_tokens",
        budgetTokens = 30000L, maxEpochsMilli = 2000L)
    }),
      """WITH RECURSIVE ws AS (
        |  SELECT doc_id, lang,
        |    list_filter(string_split_regex(lower(text), '\s+'),
        |                w -> len(w) > 0) AS w
        |  FROM documents),
        |av AS (
        |  SELECT lang AS domain,
        |    CAST(SUM(CAST(len(w) AS BIGINT)) AS BIGINT) AS avail
        |  FROM ws GROUP BY 1),
        |caps AS (
        |  SELECT domain, avail, avail * 2000 // 1000 AS cap FROM av),
        |ord AS (
        |  SELECT *, ROW_NUMBER() OVER (ORDER BY cap, domain) AS pos,
        |    (SELECT COUNT(*) FROM caps) AS n
        |  FROM caps),
        |g AS (
        |  SELECT CAST(0 AS BIGINT) AS pos,
        |    CAST(30000 AS BIGINT) AS remaining,
        |    CAST(NULL AS VARCHAR) AS domain,
        |    CAST(NULL AS BIGINT) AS avail, CAST(NULL AS BIGINT) AS cap,
        |    CAST(NULL AS BIGINT) AS alloc, CAST(NULL AS BIGINT) AS share
        |  UNION ALL
        |  SELECT CAST(o.pos AS BIGINT),
        |    g.remaining - LEAST(o.cap, g.remaining // (o.n - o.pos + 1)),
        |    o.domain, o.avail, o.cap,
        |    LEAST(o.cap, g.remaining // (o.n - o.pos + 1)),
        |    g.remaining // (o.n - o.pos + 1)
        |  FROM g JOIN ord o ON o.pos = g.pos + 1)
        |SELECT domain, avail AS avail_tokens, cap AS cap_tokens,
        |  alloc AS alloc_tokens,
        |  CASE WHEN avail > 0 THEN alloc * 1000 // avail
        |       ELSE 0 END AS epochs_milli,
        |  cap <= share AS cap_bound
        |FROM g WHERE domain IS NOT NULL""".stripMargin),
    // deterministic percentile-bootstrap CI for the corpus mean token
    // count — the eval-harness significance step; every resample draw
    // is an md5 function of (seed, replicate, slot), replicate means
    // are sign-split integer divisions, CI bounds nearest-rank order
    // statistics — the whole interval replays bit-for-bit
    ("td_bootstrap_ci",
      ((s, dir) =>
      graft.operators.EvalMetrics.bootstrapCi(
        docs(s, dir).select(col("doc_id"),
          size(TextFunctions.words(col("text"))).cast("long")
            .as("score")),
        "doc_id", "score", nBoot = 100)),
      (wordsOnlyCte +
      """, t AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS score FROM ws),
        |r AS (SELECT doc_id, score,
        |  CAST(ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS rid
        |  FROM t),
        |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM t),
        |g AS (SELECT br.range AS b, r2.rid AS slot
        |      FROM r r2 CROSS JOIN range(100) br),
        |d AS (SELECT g.b,
        |  ('0x' || substr(md5('bs:' || CAST(g.b AS VARCHAR) || ':'
        |    || CAST(g.slot AS VARCHAR)), 1, 8))::BIGINT % nn.n AS rid
        |  FROM g, nn),
        |m AS (SELECT d.b,
        |  CASE WHEN SUM(r.score) >= 0
        |    THEN CAST(CAST(SUM(r.score) AS BIGINT) // nn.n AS BIGINT)
        |    ELSE -CAST(CAST(-SUM(r.score) AS BIGINT) // nn.n AS BIGINT)
        |    END AS mean_b
        |  FROM d JOIN r ON d.rid = r.rid CROSS JOIN nn
        |  GROUP BY d.b, nn.n),
        |o AS (SELECT mean_b, ROW_NUMBER() OVER (ORDER BY mean_b) AS rk
        |      FROM m),
        |pt AS (SELECT
        |  CASE WHEN SUM(score) >= 0
        |    THEN CAST(CAST(SUM(score) AS BIGINT) // nn.n AS BIGINT)
        |    ELSE -CAST(CAST(-SUM(score) AS BIGINT) // nn.n AS BIGINT)
        |    END AS mean_micro
        |  FROM t, nn GROUP BY nn.n)
        |SELECT nn.n, CAST(100 AS BIGINT) AS n_boot, pt.mean_micro,
        |  (SELECT mean_b FROM o
        |   WHERE rk = GREATEST((250 * 100 + 9999) // 10000, 1))
        |    AS ci_lo_micro,
        |  (SELECT mean_b FROM o
        |   WHERE rk = GREATEST((9750 * 100 + 9999) // 10000, 1))
        |    AS ci_hi_micro
        |FROM nn, pt""".stripMargin)),
    // paired bootstrap delta — the system-comparison form (is scorer A
    // biased vs scorer B?): per-doc score difference (word count minus
    // the chars/6 token heuristic — NEGATIVE for dense docs, exercising
    // the sign-split divisions on both engines), then the same
    // deterministic CI; an interval excluding 0 = significant bias
    ("td_bootstrap_delta",
      ((s, dir) =>
      graft.operators.EvalMetrics.bootstrapCi(
        docs(s, dir).select(col("doc_id"),
          (size(TextFunctions.words(col("text"))).cast("long") -
            expr("length(text) div 6")).as("score")),
        "doc_id", "score", nBoot = 100)),
      (wordsOnlyCte +
      """, t AS (SELECT doc_id,
        |  CAST(len(w) AS BIGINT) - (len(text) // 6) AS score FROM ws),
        |r AS (SELECT doc_id, score,
        |  CAST(ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS rid
        |  FROM t),
        |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM t),
        |g AS (SELECT br.range AS b, r2.rid AS slot
        |      FROM r r2 CROSS JOIN range(100) br),
        |d AS (SELECT g.b,
        |  ('0x' || substr(md5('bs:' || CAST(g.b AS VARCHAR) || ':'
        |    || CAST(g.slot AS VARCHAR)), 1, 8))::BIGINT % nn.n AS rid
        |  FROM g, nn),
        |m AS (SELECT d.b,
        |  CASE WHEN SUM(r.score) >= 0
        |    THEN CAST(CAST(SUM(r.score) AS BIGINT) // nn.n AS BIGINT)
        |    ELSE -CAST(CAST(-SUM(r.score) AS BIGINT) // nn.n AS BIGINT)
        |    END AS mean_b
        |  FROM d JOIN r ON d.rid = r.rid CROSS JOIN nn
        |  GROUP BY d.b, nn.n),
        |o AS (SELECT mean_b, ROW_NUMBER() OVER (ORDER BY mean_b) AS rk
        |      FROM m),
        |pt AS (SELECT
        |  CASE WHEN SUM(score) >= 0
        |    THEN CAST(CAST(SUM(score) AS BIGINT) // nn.n AS BIGINT)
        |    ELSE -CAST(CAST(-SUM(score) AS BIGINT) // nn.n AS BIGINT)
        |    END AS mean_micro
        |  FROM t, nn GROUP BY nn.n)
        |SELECT nn.n, CAST(100 AS BIGINT) AS n_boot, pt.mean_micro,
        |  (SELECT mean_b FROM o
        |   WHERE rk = GREATEST((250 * 100 + 9999) // 10000, 1))
        |    AS ci_lo_micro,
        |  (SELECT mean_b FROM o
        |   WHERE rk = GREATEST((9750 * 100 + 9999) // 10000, 1))
        |    AS ci_hi_micro
        |FROM nn, pt""".stripMargin)),
    // token-balanced output sharding: snake assignment over the token-
    // descending two-phase rank (no global window) — per-shard token
    // mass lands within one max-document of even; the oracle replays
    // rank and snake exactly
    ("td_shard_balance",
      ((s, dir) =>
      Sampling.shardBalance(
        docs(s, dir).select(col("doc_id"),
          size(TextFunctions.words(col("text"))).cast("long")
            .as("n_toks")),
        "doc_id", "n_toks", numShards = 8)),
      (wordsOnlyCte +
      """, t AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n FROM ws),
        |r AS (
        |  SELECT doc_id, n,
        |    ROW_NUMBER() OVER (ORDER BY n DESC, doc_id) AS rank
        |  FROM t)
        |SELECT doc_id AS id, n AS n_tokens, CAST(rank AS BIGINT) AS rank,
        |  CAST(CASE WHEN (rank - 1) % 16 < 8 THEN (rank - 1) % 16
        |    ELSE 15 - ((rank - 1) % 16) END AS INT) AS shard
        |FROM r""".stripMargin)),
    // quality-vs-quantity attrition curve: per candidate threshold, the
    // surviving doc/token counts and token share — ONE corpus scan
    // (conditional sums inside a single aggregation, unpivoted after)
    ("td_threshold_curve",
      ((s, dir) => {
      val d = docs(s, dir).select(
        size(TextFunctions.words(col("text"))).cast("long").as("nw"))
        .withColumn("score", col("nw"))
      Sampling.thresholdCurve(d, "score", "nw",
        thresholds = Seq(10L, 30L, 60L, 100L))
    }),
      (wordsOnlyCte +
      """, t AS (SELECT CAST(len(w) AS BIGINT) AS nw FROM ws),
        |tot AS (SELECT CAST(COALESCE(SUM(nw), 0) AS BIGINT) AS tt FROM t),
        |th(threshold) AS (VALUES (10), (30), (60), (100))
        |SELECT CAST(threshold AS BIGINT) AS threshold,
        |  CAST(COALESCE(SUM(CASE WHEN nw >= threshold THEN 1 END), 0)
        |    AS BIGINT) AS n_kept,
        |  CAST(COALESCE(SUM(CASE WHEN nw >= threshold THEN nw END), 0)
        |    AS BIGINT) AS tokens_kept,
        |  CAST(COALESCE(SUM(CASE WHEN nw >= threshold THEN nw END), 0)
        |    * 10000 // GREATEST(tt, 1) AS BIGINT) AS token_share_bp
        |FROM th CROSS JOIN t CROSS JOIN tot
        |GROUP BY threshold, tt""".stripMargin)),
    // EXACT per-language sequence-length quantiles (nearest-rank P50/
    // P90/P99) via the shared two-phase range pass — no global sort, no
    // approx_percentile; the oracle replays rank, stratum size, and the
    // target-rank pick exactly
    ("td_length_quantiles",
      ((s, dir) =>
      Sampling.exactQuantiles(
        docs(s, dir).select(col("doc_id"),
          TextFunctions.tokenCountWs(col("text")).cast("long")
            .as("n_toks"),
          col("lang")),
        "doc_id", "n_toks", "lang",
        quantilesBp = Seq(5000, 9000, 9900))),
      (wordsOnlyCte +
      """, t AS (
        |  SELECT lang, doc_id, CAST(len(w) AS BIGINT) AS v FROM ws),
        |r AS (
        |  SELECT lang, doc_id, v,
        |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY v, doc_id)
        |      AS rank,
        |    COUNT(*) OVER (PARTITION BY lang) AS n
        |  FROM t),
        |q(q_bp) AS (VALUES (5000), (9000), (9900))
        |SELECT lang AS stratum, CAST(q_bp AS INT) AS q_bp, v AS value,
        |  rank, n
        |FROM r JOIN q ON rank = (n - 1) * q_bp // 10000 + 1"""
        .stripMargin)),
    // DSIR importance weights (Xie 2023): every doc scored by target-vs-
    // raw bigram log-likelihood ratio; target = the corpus' own English
    // slice, so high scores mark en-like text
    ("td_dsir",
      ((s, dir) => {
      val d = docs(s, dir)
      Sampling.dsirWeights(d, d.filter(col("lang") === "en"),
        "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
    }),
      // `+ 0.0` after ROUND: DuckDB's double ROUND keeps IEEE signed zero
          // (-1e-5 rounds to -0.0) while Spark's BigDecimal round yields +0.0;
          // adding positive zero normalizes -0.0 -> 0.0 without moving any
          // other value (the r06 hash mismatch was exactly this, doc_id=9)
      (dsirCore +
      """SELECT doc_id, n_bigrams,
        |  ROUND(li, 4) + 0.0 AS log_importance
        |FROM dw""".stripMargin)),
    // DSIR importance RESAMPLING (the paper's actual selection step):
    // Gumbel-top-200 over the full-precision weights with md5-derived
    // deterministic noise — the oracle re-derives the identical noise
    // and replays the ranking, so the KEPT SET is gated, not just the
    // weights
    ("td_dsir_resample",
      ((s, dir) => {
      val d = docs(s, dir)
      val w = Sampling.dsirWeightsFull(d, d.filter(col("lang") === "en"),
        "doc_id", "text")
      Sampling.importanceResample(w, "id", "log_importance", n = 200)
        .select(col("id").as("doc_id"), col("n_bigrams"),
          round(col("log_importance"), 4).as("log_importance"))
    }),
      // selection replay: same full-precision weights + the md5-derived
          // Gumbel noise, top-200 by score — membership is what's gated
      (dsirCore +
      """SELECT doc_id, n_bigrams,
        |  ROUND(li, 4) + 0.0 AS log_importance
        |FROM dw
        |ORDER BY li + (-ln(-ln(
        |  (('0x' || substr(md5('0:' || CAST(doc_id AS VARCHAR)), 1, 12))
        |     ::BIGINT + 0.5) / 281474976710656.0))) DESC, doc_id
        |LIMIT 200""".stripMargin)),
    // curriculum ordering (easy-to-hard training order): global rank by
    // (score, id) via the two-phase prefix sum, floor-split into 4
    // stages, seeded shuffle WITHIN each stage sharded so no window
    // partitions on a stage — the oracle replays rank, stage cut, md5
    // shuffle key, shard, and within-shard position exactly
    ("td_curriculum",
      ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"),
        size(split(col("text"), " ")).as("score"))
      Sampling.curriculumOrder(d, "doc_id", "score", stages = 4)
    }),
      """WITH d AS (
        |  SELECT doc_id, len(string_split(text, ' ')) AS score
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, score,
        |    ROW_NUMBER() OVER (ORDER BY score, doc_id) AS rk,
        |    COUNT(*) OVER () AS total
        |  FROM d),
        |s AS (
        |  SELECT doc_id, score,
        |    CAST((rk - 1) * 4 // total AS INT) AS stage,
        |    md5('curriculum:' || CAST(doc_id AS VARCHAR)) AS key
        |  FROM r),
        |h AS (
        |  SELECT *, CAST(('0x' || substr(key, 1, 8))::BIGINT % 8 AS INT)
        |    AS shard
        |  FROM s)
        |SELECT doc_id, CAST(score AS INT) AS score, stage, shard,
        |  ROW_NUMBER() OVER (PARTITION BY stage, shard
        |    ORDER BY key, doc_id) AS pos
        |FROM h""".stripMargin))
}

package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.functions.expressions.SimHash64
import graft.operators.{Collocations, Dedup, EvalMetrics, FilterFunnel, Multimodal, QualityClassifier, Quantization, Sampling, Similarity, TextQuality, Tokenizer, UrlFilter}

/** Training-data pipeline queries: dedup family, ANN similarity search,
  * text analysis, multimodal plumbing — over the driver's `documents` and
  * `embeddings` tables. See [[Queries]] for the determinism rules.
  */
object QueriesTrainingData {
  import Queries.Q

  private def docs(s: org.apache.spark.sql.SparkSession, dir: String) =
    s.read.parquet(s"$dir/documents.parquet")
  private def embs(s: org.apache.spark.sql.SparkSession, dir: String) =
    s.read.parquet(s"$dir/embeddings.parquet")

  /** Recall gate for the approximate ANN variants, per query: join the
    * approximate top-k against the exact brute-force top-k and assert a
    * minimum hit count per qid. Both sides are deterministic (seeded
    * kmeans/hyperplanes, deterministic tiebreaks), so the boolean is
    * hash-stable and a SQL oracle can replay the expected all-true rows
    * from the query-id list alone. */
  private[graft] def perQidRecallGate(approx: org.apache.spark.sql.DataFrame,
                               exact: org.apache.spark.sql.DataFrame,
                               queries: org.apache.spark.sql.DataFrame,
                               minHits: Int): org.apache.spark.sql.DataFrame = {
    val hits = approx.select(col("qid"), col("id"))
      .join(exact.select(col("qid"), col("id")), Seq("qid", "id"))
      .groupBy("qid").agg(count(lit(1)).as("h"))
    queries.select(col("qid"))
      .join(hits, Seq("qid"), "left")
      .select(col("qid"),
        (coalesce(col("h"), lit(0L)) >= minHits).as("recall_ok"))
  }

  /** Aggregate recall FLOOR across all queries (for the coarser
    * approximations where per-query recall legitimately bottoms out at
    * zero): total exact-top-k hits summed over every query must clear
    * `minTotal`. Single-row output, oracle-replayable from the query
    * count alone. */
  private[graft] def totalRecallGate(approx: org.apache.spark.sql.DataFrame,
                              exact: org.apache.spark.sql.DataFrame,
                              queries: org.apache.spark.sql.DataFrame,
                              minTotal: Int): org.apache.spark.sql.DataFrame = {
    val hits = approx.select(col("qid"), col("id"))
      .join(exact.select(col("qid"), col("id")), Seq("qid", "id"))
    queries.select(col("qid")).agg(count(lit(1)).as("n_queries"))
      .crossJoin(hits.agg(count(lit(1)).as("total")))
      .select(col("n_queries"),
        (col("total") >= minTotal).as("recall_floor_ok"))
  }

  // (queries is derived from gated, declared after the oracle helper CTEs below)

  /** Pinned BPE merge table for `td_bpe_encode`: rank-ordered, chained
    * so multi-level merges exercise the loop (e.g. `th`+`e</w>` only
    * fires after both constituents). Counts are irrelevant to encode. */
  private[graft] val FixedBpeMerges: Seq[Tokenizer.Merge] = Seq(
    "e" -> "</w>", "t" -> "h", "th" -> "e</w>", "s" -> "</w>",
    "i" -> "n", "a" -> "n", "an" -> "d", "and" -> "</w>",
    "o" -> "</w>", "e" -> "r", "in" -> "g", "ing" -> "</w>",
    "o" -> "n", "r" -> "e", "er" -> "</w>", "t" -> "</w>")
    .zipWithIndex.map { case ((l, r), i) => Tokenizer.Merge(i, l, r, 0L) }

  /** Pinned unigram-LM piece vocab for the SentencePiece-style encode
    * (the deploy-time shape, like [[FixedBpeMerges]]): multi-char
    * pieces chosen to segment the corpus vocabulary non-trivially, log
    * probs with scattered 4-decimal values so distinct piece MULTISETS
    * never sum to exact ties (same-multiset reorderings tie harmlessly:
    * score and piece count — the gated scalars — are equal). */
  private[graft] val FixedUnigramVocab: Seq[(String, Double)] = Seq(
    "ta" -> -1.8231, "ble" -> -2.1457, "cus" -> -2.3318,
    "tom" -> -2.2104, "er" -> -1.2716, "or" -> -1.4105,
    "der" -> -2.0873, "st" -> -1.5642, "ream" -> -2.4536,
    "win" -> -2.1987, "dow" -> -2.2659, "spark" -> -2.8714,
    "val" -> -2.0395, "ue" -> -1.6248, "que" -> -2.1529,
    "ry" -> -1.5873, "co" -> -1.5218, "lu" -> -2.2483,
    "mn" -> -2.5361, "data" -> -2.6107, "sc" -> -1.9428,
    "an" -> -1.3264, "gr" -> -2.0816, "oup" -> -2.3149,
    "jo" -> -2.1372, "in" -> -1.3581, "ha" -> -1.7293,
    "sh" -> -1.7864, "li" -> -1.8535, "ne" -> -1.4377,
    "me" -> -1.7148, "rge" -> -2.4291, "so" -> -1.8609,
    "rt" -> -1.6425, "fi" -> -1.9037, "lter" -> -2.5874,
    "ba" -> -1.8164, "tch" -> -2.3725, "sm" -> -2.0542,
    "all" -> -1.9876, "slo" -> -2.4158, "fa" -> -1.9342,
    "big" -> -2.5419, "key" -> -2.4783, "row" -> -2.3956,
    "agg" -> -2.4617, "du" -> -1.9751, "ve" -> -1.8427,
    "ctor" -> -2.6835, "pa" -> -1.8946, "the" -> -2.1064,
    "w" -> -3.2145, "p" -> -3.4268, "a" -> -2.9517)
  private[graft] val UnigramFallback = -4.1037

  /** Pinned WordPiece vocab for the greedy longest-match encode: all
    * 26 letters as both initial and `##`-continuation pieces (so every
    * alphabetic word segments — [UNK] only for non-alpha tokens), plus
    * multi-char pieces chosen so the corpus vocabulary splits
    * non-trivially (full words, 2-piece splits, and greedy
    * longest-match decisions like `scan` > `sc` all occur). */
  private[graft] val FixedWordpieceVocab: Seq[String] =
    ('a' to 'z').map(_.toString) ++
      ('a' to 'z').map(c => s"##$c") ++ Seq(
      "ta", "tab", "cust", "wind", "str", "spark", "qu", "col", "da",
      "scan", "sc", "sp", "gr", "join", "ha", "li", "mer", "so", "fil",
      "bat", "sm", "sl", "fa", "big", "key", "row", "ag", "val", "ve",
      "par", "or", "the",
      "##le", "##om", "##er", "##ow", "##eam", "##ery", "##umn", "##ta",
      "##oup", "##sh", "##ne", "##ge", "##rt", "##ter", "##ch", "##all",
      "##st", "##ue", "##ctor", "##der", "##ark")

  /** Deterministic URL synthesis tables for `td_urlfilter` (hosts keyed
    * by doc_id % 8, path prefixes by doc_id % 5 — co-prime moduli so
    * every combination occurs). */
  private val UrlHosts = Seq(
    "news.example.com", "blog.sample.org", "spam.bad-site.com",
    "tracker.ads-network.net", "docs.example.com", "shop.example.co.uk",
    "mirror.bad-site.com", "wiki.opencorpus.org")
  private val UrlPaths = Seq(
    "/articles/", "/ads/banner/", "/posts/", "/guide/", "/click/")

  /** DuckDB list literal from a Scala string seq. */
  private def duckList(xs: Seq[String]): String =
    xs.map(x => s"'$x'").mkString("[", ", ", "]")

  /** Unigram-encode oracle CTE chain: enumerate EVERY segmentation
    * path of every distinct corpus word under the pinned vocab
    * (feasible because the synthetic vocabulary is small), with the
    * same left-to-right log-prob additions the Spark DP performs —
    * `done` holds every complete path's (score, piece count), `best`
    * the per-word max score. */
  private lazy val unigramCte = {
    val vocabVals = FixedUnigramVocab
      .map { case (p, lp) => s"('$p', $lp)" }.mkString(", ")
    s"""WITH RECURSIVE vocab(piece, lp) AS (VALUES $vocabVals),
       |words AS (
       |  SELECT DISTINCT unnest(list_filter(
       |    string_split_regex(lower(text), '\\s+'),
       |    x -> len(x) > 0)) AS word
       |  FROM documents),
       |pos AS (SELECT word, unnest(range(0, len(word))) AS i FROM words),
       |ext AS (
       |  SELECT p.word, p.i, len(v.piece) AS plen, v.lp
       |  FROM pos p
       |  JOIN vocab v ON substr(p.word, p.i + 1, len(v.piece)) = v.piece
       |  UNION ALL
       |  SELECT p.word, p.i, 1, $UnigramFallback
       |  FROM pos p WHERE NOT EXISTS (
       |    SELECT 1 FROM vocab v
       |    WHERE v.piece = substr(p.word, p.i + 1, 1))),
       |paths AS (
       |  SELECT word, 0 AS pos, CAST(0.0 AS DOUBLE) AS score, 0 AS np
       |  FROM words
       |  UNION ALL
       |  SELECT pa.word, pa.pos + e.plen, pa.score + e.lp, pa.np + 1
       |  FROM paths pa JOIN ext e ON e.word = pa.word AND e.i = pa.pos
       |  WHERE pa.pos + e.plen <= len(pa.word)),
       |done AS (SELECT word, score, np FROM paths WHERE pos = len(word)),
       |best AS (SELECT word, MAX(score) AS s FROM done GROUP BY 1)
       |""".stripMargin
  }

  /** Shared DuckDB text-prep CTEs. */
  private val wordsOnlyCte =
    """WITH ws AS (
      |  SELECT doc_id, lang, source, n_chars, text,
      |    list_filter(string_split_regex(lower(text), '\s+'),
      |                w -> len(w) > 0) AS w
      |  FROM documents)
      |""".stripMargin

  /** Shared DSIR CTE chain: full-precision per-doc bigram
    * log-likelihood-ratio weights as `dw(doc_id, n_bigrams, li)`. */
  private val dsirCore = wordsOnlyCte +
    """, rb AS (
      |  SELECT doc_id, lang,
      |    unnest(list_transform(range(1, len(w)),
      |      i -> w[i] || ' ' || w[i + 1])) AS b
      |  FROM ws WHERE len(w) >= 2),
      |craw AS (SELECT b, COUNT(*) AS n_raw FROM rb GROUP BY 1),
      |ctgt AS (SELECT b, COUNT(*) AS n_tgt FROM rb
      |         WHERE lang = 'en' GROUP BY 1),
      |consts AS (SELECT
      |  (SELECT COUNT(*) FROM craw) AS v,
      |  (SELECT COUNT(*) FROM rb) AS nr,
      |  (SELECT COUNT(*) FROM rb WHERE lang = 'en') AS nt),
      |dw AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
      |    AVG(
      |      ln((COALESCE(n_tgt, 0) + 0.1) / (nt + 0.1 * v)) -
      |      ln((n_raw + 0.1) / (nr + 0.1 * v))) AS li
      |  FROM rb JOIN craw USING (b) LEFT JOIN ctgt USING (b), consts
      |  GROUP BY doc_id)
      |""".stripMargin

  private val wordsCte =
    wordsOnlyCte.stripSuffix("\n").stripSuffix(")") +
      """),
        |sh AS (
        |  SELECT doc_id,
        |    unnest(list_distinct(list_transform(
        |      range(0, greatest(len(w) - 2, 0)),
        |      i -> array_to_string(w[i+1:i+3], ' ')))) AS sh
        |  FROM ws)
        |""".stripMargin

  private val jaccardSql =
    wordsCte +
      """, sized AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM sh GROUP BY 1),
        |freq AS (SELECT sh, COUNT(*) AS f FROM sh GROUP BY 1),
        |filtered AS (SELECT s.doc_id, s.sh FROM sh s JOIN freq USING (sh)
        |             WHERE f <= 1000),
        |inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    CAST(COUNT(*) AS BIGINT) AS i
        |  FROM filtered a JOIN filtered b
        |    ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b, jaccard FROM (
        |  SELECT id_a, id_b,
        |    ROUND(CAST(i AS DOUBLE) / (sa.n_sh + sb.n_sh - i), 4) AS jaccard
        |  FROM inter
        |  JOIN sized sa ON sa.doc_id = id_a
        |  JOIN sized sb ON sb.doc_id = id_b)
        |WHERE jaccard >= 0.5""".stripMargin

  private def langHits(lang: String, stops: Seq[String]): String = {
    val lst = stops.map(s => s"'$s'").mkString("[", ", ", "]")
    s"len(list_filter(list_distinct(w), x -> list_contains($lst, x))) AS $lang"
  }

  /** Mirrors [[TextFunctions.htmlToText]] rule-for-rule: same synthetic
    * wrap as the Spark query, then the identical strip/decode/collapse
    * chain (the patterns are from the Java/RE2 common subset, so the two
    * engines must rewrite identically). */
  private val htmlExtractSql: String = {
    val strip = Seq(
      "(?is)<script[^>]*>.*?</script>",
      "(?is)<style[^>]*>.*?</style>",
      "(?s)<!--.*?-->",
      "(?s)</?[A-Za-z!][^>]*>")
    val entities = Seq(
      "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
    val stripped = strip.foldLeft("html")(
      (acc, p) => s"regexp_replace($acc, '$p', ' ', 'g')")
    val decoded = entities.foldLeft(stripped) { case (acc, (e, r)) =>
      val rep = if (r == "'") "''" else r
      s"regexp_replace($acc, '$e', '$rep', 'g')"
    }
    """WITH wrapped AS (
      |  SELECT doc_id,
      |    '<html><head><title>T</title><style>p{color:red}</style>'
      |    || '</head><body><h1>' || source || '</h1><!-- hidden --><p>'
      |    || substr(text, 1, 200)
      |    || ' &quot;A&#39;s&quot; &lt;tag&gt; B&amp;C</p>'
      |    || '<script>var x = 1 < 2;</script></body></html>' AS html
      |  FROM documents)
      |SELECT doc_id,
      |""".stripMargin +
      s"  trim(regexp_replace($decoded, '\\s+', ' ', 'g')) AS text_clean\n" +
      "FROM wrapped"
  }

  /** One row per gate: (name, query, oracle SQL) — a gate reads as
    * ONE unit (the twin-map layout, query here / oracle hundreds of
    * lines below, was a recurring editing hazard). Helper CTE vals
    * stay declared above so object-init order is safe. */
  /** Shared by `emb_margin_mining` (brute), `emb_margin_mining_ivf`
    * (cell-routed, broadcast x) and `emb_margin_mining_cells`
    * (cell-routed, shuffled) — the celled forms run at nprobe=nlist,
    * which is lossless, so the same all-pairs SQL is the exact oracle
    * for all three. */
  private val marginMiningOracle: String =
      """WITH s AS (
        |  SELECT x.vec_id AS xid, y.vec_id AS yid,
        |    ROUND(list_cosine_similarity(x.embedding::DOUBLE[],
        |      y.embedding::DOUBLE[]), 6) AS cosine,
        |    CAST(ROUND(ROUND(list_cosine_similarity(x.embedding::DOUBLE[],
        |      y.embedding::DOUBLE[]), 6) * 1e6) AS BIGINT) AS c6
        |  FROM embeddings x, embeddings y
        |  WHERE x.label % 2 = 0 AND y.label % 2 = 1),
        |ax AS (
        |  SELECT xid, CAST(SUM(c6) AS DOUBLE) / 4000000.0 AS avg_x
        |  FROM (SELECT xid, c6, ROW_NUMBER() OVER (PARTITION BY xid
        |      ORDER BY cosine DESC, yid) AS r FROM s)
        |  WHERE r <= 4 GROUP BY xid),
        |ay AS (
        |  SELECT yid, CAST(SUM(c6) AS DOUBLE) / 4000000.0 AS avg_y
        |  FROM (SELECT yid, c6, ROW_NUMBER() OVER (PARTITION BY yid
        |      ORDER BY cosine DESC, xid) AS r FROM s)
        |  WHERE r <= 4 GROUP BY yid),
        |m AS (
        |  SELECT s.xid, s.yid, s.cosine,
        |    ROUND(s.cosine / ((avg_x + avg_y) / 2), 4) AS margin
        |  FROM s JOIN ax USING (xid) JOIN ay USING (yid))
        |SELECT xid, yid, cosine, margin FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY xid
        |      ORDER BY margin DESC, yid) AS r
        |  FROM m WHERE margin >= 1.02)
        |WHERE r = 1""".stripMargin

  val gated: Seq[(String, Q, String)] = Seq(
    // exact dedup on text digest — survivors
    ("dedup_exact",
      ((s, dir) =>
      Dedup.exact(docs(s, dir), "doc_id", Seq("text"))
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))),
      """SELECT doc_id, lang, source, n_chars FROM (
        |  SELECT doc_id, lang, source, n_chars,
        |    ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        |  FROM documents) WHERE rn = 1""".stripMargin),
    // word-set fingerprint dedup groups
    ("dedup_fingerprint",
      ((s, dir) =>
      docs(s, dir)
        .groupBy(TextFunctions.fingerprint(col("text")).as("fingerprint"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc_id"))),
      """SELECT md5(array_to_string(list_sort(list_distinct(
        |    list_filter(string_split_regex(lower(text), '\s+'),
        |                w -> len(w) > 0))), ' ')) AS fingerprint,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  MIN(doc_id) AS min_doc_id
        |FROM documents GROUP BY 1""".stripMargin),
    // exact pairwise 3-gram Jaccard >= 0.5 via shingle inverted index
    ("dedup_ngram_jaccard",
      ((s, dir) =>
      Dedup.jaccardPairs(docs(s, dir), "doc_id", "text", n = 3, threshold = 0.5)),
      jaccardSql),
    // MinHash(128) + LSH(64x2) + exact verify — oracle: exact Jaccard
    // (recall at j>=0.5 is 1 - 0.75^64 ~ 1-1e-8)
    ("dedup_minhash_lsh",
      ((s, dir) =>
      Dedup.minhashLshPairs(docs(s, dir), "doc_id", "text",
        n = 3, threshold = 0.5, numHashes = 128, rowsPerBand = 2)),
      jaccardSql),
    // asymmetric shingle CONTAINMENT (doc subsumption): |A∩B| / |A|
    // over the same inverted index — catches a short doc embedded in a
    // long one, which the size-gap drags below any Jaccard threshold
    ("dedup_containment",
      ((s, dir) =>
      Dedup.containmentPairs(docs(s, dir), "doc_id", "text",
          n = 3, threshold = 0.8)
        .select(col("id_a"), col("id_b"),
          col("n_a").cast("long").as("n_a"),
          col("n_b").cast("long").as("n_b"), col("containment"))),
      (wordsCte +
      """, sized AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh
        |  FROM sh GROUP BY 1),
        |freq AS (SELECT sh, COUNT(*) AS f FROM sh GROUP BY 1),
        |filtered AS (SELECT s.doc_id, s.sh FROM sh s JOIN freq USING (sh)
        |             WHERE f <= 1000),
        |inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    sa.n_sh AS n_a, sb.n_sh AS n_b,
        |    CAST(COUNT(*) AS BIGINT) AS i
        |  FROM filtered a JOIN filtered b ON a.sh = b.sh
        |  JOIN sized sa ON sa.doc_id = a.doc_id
        |  JOIN sized sb ON sb.doc_id = b.doc_id
        |  WHERE sa.n_sh < sb.n_sh
        |     OR (sa.n_sh = sb.n_sh AND a.doc_id < b.doc_id)
        |  GROUP BY 1, 2, 3, 4)
        |SELECT id_a, id_b, n_a, n_b, containment FROM (
        |  SELECT id_a, id_b, n_a, n_b,
        |    ROUND(CAST(i AS DOUBLE) / n_a, 4) AS containment
        |  FROM inter)
        |WHERE containment >= 0.8""".stripMargin)),
    // SimHash near-dup detection (custom codegen'd expression), emitted
    // as the planted-twin gate: the corpus is spiked with a byte-mangled
    // copy of every doc (uppercased, whitespace doubled — byte-different,
    // so exact/byte dedup CANNOT pair them, but words() normalizes case
    // and whitespace so the word sequence and hence the 64-bit simhash
    // is identical) and every planted pair must be caught at hamming 0.
    // That exercises the full pipeline — feature extraction, the native
    // SimHash64 expression, chunk banding, candidate join, bit_count
    // verify — and the oracle replays the expected pair list from
    // doc_id arithmetic alone. (Drop-one-word twins are NOT gated:
    // measured, ~25% of them land beyond hamming 3 on these short docs.)
    ("dedup_simhash",
      ((s, dir) => {
      val base = docs(s, dir).select(col("doc_id"), col("text"))
      val spiked = base.unionByName(base.select(
        (col("doc_id") + 10000000L).as("doc_id"),
        upper(regexp_replace(col("text"), " ", "  ")).as("text")))
      val found = Dedup.simhashPairs(spiked, "doc_id", "text", maxHamming = 3)
      base.select(col("doc_id").as("id_a"),
          (col("doc_id") + 10000000L).as("id_b"))
        .join(found, Seq("id_a", "id_b"), "left")
        .select(col("id_a"), col("id_b"),
          col("hamming").isNotNull.as("caught"),
          coalesce(col("hamming"), lit(-1)).as("hamming"))
    }),
      """SELECT doc_id AS id_a, doc_id + 10000000 AS id_b,
        |  true AS caught, CAST(0 AS INT) AS hamming
        |FROM documents""".stripMargin),
    // embedding near-dup pairs via hyperplane LSH + exact cosine verify
    ("dedup_embedding",
      ((s, dir) =>
      Dedup.embeddingPairs(
        embs(s, dir).withColumnRenamed("embedding", "vec"),
        "vec_id", "vec", dim = 64, threshold = 0.99)),
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  ROUND(list_cosine_similarity(a.embedding::DOUBLE[],
        |    b.embedding::DOUBLE[]), 4) AS cosine
        |FROM embeddings a, embeddings b
        |WHERE a.vec_id < b.vec_id
        |  AND ROUND(list_cosine_similarity(a.embedding::DOUBLE[],
        |    b.embedding::DOUBLE[]), 4) >= 0.99""".stripMargin),
    // brute-force exact cosine top-10 for 10 query vectors
    ("ann_topk",
      ((s, dir) => {
      val e = embs(s, dir)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      Similarity.bruteForceTopK(
        e.filter(col("id") < 10).select(col("id").as("qid"), col("vec")),
        e, k = 10)
        .withColumn("rank", col("rank").cast("long"))
    }),
      """SELECT qid, rank, id, cosine FROM (
        |  SELECT q.vec_id AS qid, c.vec_id AS id,
        |    ROUND(list_cosine_similarity(q.embedding::DOUBLE[],
        |      c.embedding::DOUBLE[]), 6) AS cosine,
        |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
        |      ORDER BY ROUND(list_cosine_similarity(q.embedding::DOUBLE[],
        |        c.embedding::DOUBLE[]), 6) DESC, c.vec_id) AS rank
        |  FROM embeddings q, embeddings c
        |  WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id)
        |WHERE rank <= 10""".stripMargin),
    // hard-negative mining for contrastive training: per anchor, the
    // top-5 highest-cosine candidates with a DIFFERENT label (positives
    // excluded) below the near-duplicate threshold — the FAISS/SBERT
    // mining recipe, engine-exact on 6-dp-rounded cosines
    ("emb_hard_negatives",
      ((s, dir) => {
      val e = embs(s, dir).select(col("vec_id").as("id"),
        col("embedding").as("vec"), col("label"))
      Similarity.hardNegatives(
        e.filter(col("id") < 20)
          .select(col("id").as("qid"), col("vec"), col("label")),
        e, k = 5)
    }),
      """SELECT qid, rank, id, cosine FROM (
        |  SELECT q.vec_id AS qid, c.vec_id AS id,
        |    ROUND(list_cosine_similarity(q.embedding::DOUBLE[],
        |      c.embedding::DOUBLE[]), 6) AS cosine,
        |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
        |      ORDER BY ROUND(list_cosine_similarity(q.embedding::DOUBLE[],
        |        c.embedding::DOUBLE[]), 6) DESC, c.vec_id) AS rank
        |  FROM embeddings q, embeddings c
        |  WHERE q.vec_id < 20 AND q.vec_id <> c.vec_id
        |    AND q.label <> c.label
        |    AND ROUND(list_cosine_similarity(q.embedding::DOUBLE[],
        |      c.embedding::DOUBLE[]), 6) < 0.99)
        |WHERE rank <= 5""".stripMargin),
    // hybrid retrieval: lexical (word-set Jaccard) top-20 + semantic
    // (exact cosine) top-20, fused by reciprocal rank fusion — RRF
    // consumes only ranks, so the fusion replays exactly in SQL even
    // though the two score spaces are incomparable. doc_id and vec_id
    // share an id space in the testdata (one embedding per document).
    ("td_hybrid_rrf",
      ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"),
        graft.functions.TextFunctions.words(col("text")).as("ws"))
      val lex = operators.HybridRetrieval.jaccardTopK(
        d.filter(col("doc_id") < 5)
          .select(col("doc_id").as("qid"), col("ws")),
        d.select(col("doc_id").as("id"), col("ws")), k = 20)
      val e = embs(s, dir)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val sem = Similarity.bruteForceTopK(
        e.filter(col("id") < 5).select(col("id").as("qid"), col("vec")),
        e, k = 20)
      operators.HybridRetrieval.rrf(lex, sem, topK = 10)
    }),
      """WITH dw AS (
        |  SELECT doc_id, list_distinct(list_filter(
        |    string_split_regex(lower(text), '\s+'),
        |    w -> len(w) > 0)) AS ws
        |  FROM documents),
        |lexall AS (
        |  SELECT q.doc_id AS qid, c.doc_id AS id,
        |    ROUND(CAST(len(list_intersect(q.ws, c.ws)) AS DOUBLE) /
        |      len(list_distinct(list_concat(q.ws, c.ws))), 6) AS jaccard
        |  FROM dw q, dw c WHERE q.doc_id < 5 AND q.doc_id <> c.doc_id),
        |lex AS (
        |  SELECT qid, id, lex_rank FROM (
        |    SELECT qid, id, ROW_NUMBER() OVER (PARTITION BY qid
        |      ORDER BY jaccard DESC, id) AS lex_rank FROM lexall)
        |  WHERE lex_rank <= 20),
        |semall AS (
        |  SELECT q.vec_id AS qid, c.vec_id AS id,
        |    ROUND(list_cosine_similarity(q.embedding::DOUBLE[],
        |      c.embedding::DOUBLE[]), 6) AS cosine
        |  FROM embeddings q, embeddings c
        |  WHERE q.vec_id < 5 AND q.vec_id <> c.vec_id),
        |sem AS (
        |  SELECT qid, id, sem_rank FROM (
        |    SELECT qid, id, ROW_NUMBER() OVER (PARTITION BY qid
        |      ORDER BY cosine DESC, id) AS sem_rank FROM semall)
        |  WHERE sem_rank <= 20),
        |fused AS (
        |  SELECT COALESCE(lex.qid, sem.qid) AS qid,
        |    COALESCE(lex.id, sem.id) AS id,
        |    ROUND(COALESCE(1.0 / (60 + lex_rank), 0) +
        |          COALESCE(1.0 / (60 + sem_rank), 0), 6) AS rrf,
        |    CAST(COALESCE(lex_rank, 0) AS BIGINT) AS lex_rank,
        |    CAST(COALESCE(sem_rank, 0) AS BIGINT) AS sem_rank
        |  FROM lex FULL OUTER JOIN sem
        |    ON lex.qid = sem.qid AND lex.id = sem.id)
        |SELECT qid, rank, id, rrf, lex_rank, sem_rank FROM (
        |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY qid
        |    ORDER BY rrf DESC, id) AS INT) AS rank FROM fused)
        |WHERE rank <= 10""".stripMargin),
    // LSH-bucketed ANN (scale path) — rows-only (approximate by design)
    ("ann_lsh_topk",
      ((s, dir) => {
      val e = embs(s, dir)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val q = e.filter(col("id") < 10).select(col("id").as("qid"), col("vec"))
      // aggregate recall FLOOR vs brute force (hyperplane-LSH top-k
      // recall is genuinely low at these table/bit counts — measured
      // 8-12/100 across SFs; the gate documents that floor and catches
      // catastrophic regressions, it is not a quality claim)
      totalRecallGate(Similarity.lshTopK(q, e, dim = 64, k = 10),
        Similarity.bruteForceTopK(q, e, k = 10), q, minTotal = 4)
    }),
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
        |  true AS recall_floor_ok
        |FROM embeddings WHERE vec_id < 10""".stripMargin),
    // token counting + quality scoring + fingerprint
    ("text_stats",
      ((s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        TextFunctions.tokenCountWs(col("text")).as("n_words"),
        TextFunctions.tokenCountBpe(col("text")).as("n_tokens_bpe"),
        TextFunctions.stopwordCount(col("text")).as("n_stopwords"),
        TextFunctions.qualityScore(col("text")).as("quality"),
        TextFunctions.fingerprint(col("text")).as("fingerprint"))),
      (wordsOnlyCte +
      """SELECT doc_id,
        |  CAST(len(w) AS INT) AS n_words,
        |  CAST(len(regexp_extract_all(text,
        |    '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS INT) AS n_tokens_bpe,
        |  CAST(len(list_filter(w, x -> list_contains(
        |    ['the','a','an','and','or','of','to','in','is','it','for',
        |     'on','with','as','at','by','this','that'], x))) AS INT)
        |    AS n_stopwords,
        |  ROUND((
        |    least(CAST(len(w) AS DOUBLE) / 50.0, 1.0) +
        |    least(CAST(len(list_filter(w, x -> list_contains(
        |      ['the','a','an','and','or','of','to','in','is','it','for',
        |       'on','with','as','at','by','this','that'], x))) AS DOUBLE)
        |      / greatest(CAST(len(w) AS DOUBLE), 1.0) * 4.0, 1.0) +
        |    CAST(len(list_distinct(w)) AS DOUBLE)
        |      / greatest(CAST(len(w) AS DOUBLE), 1.0) +
        |    (1.0 - least(CAST(len(regexp_extract_all(text,
        |      '[^a-zA-Z0-9\s]')) AS DOUBLE)
        |      / greatest(CAST(length(text) AS DOUBLE), 1.0) * 10.0, 1.0))
        |  ) / 4.0, 4) AS quality,
        |  md5(array_to_string(list_sort(list_distinct(w)), ' '))
        |    AS fingerprint
        |FROM ws""".stripMargin)),
    // language id (stopword-profile heuristic)
    ("text_langid",
      ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        TextFunctions.langId(col("text")).as("lang_pred"))),
      (s"""WITH ws AS (
         |  SELECT doc_id, list_distinct(list_filter(
         |    string_split_regex(lower(text), '\\s+'),
         |    w -> len(w) > 0)) AS w
         |  FROM documents),
         |hits AS (
         |  SELECT doc_id,
         |    ${langHits("de", Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit"))},
         |    ${langHits("en", Seq("the", "and", "is", "of", "to", "in", "that", "it"))},
         |    ${langHits("es", Seq("el", "la", "de", "que", "y", "los", "es", "un"))},
         |    ${langHits("fr", Seq("le", "la", "les", "de", "et", "est", "un", "une"))},
         |    ${langHits("zh", Seq("的", "是", "不", "了", "在", "人", "有", "我"))}
         |  FROM ws)
         |SELECT doc_id,
         |  CASE WHEN greatest(de, en, es, fr, zh) = 0 THEN 'und'
         |       WHEN zh >= greatest(de, en, es, fr) THEN 'zh'
         |       WHEN fr >= greatest(de, en, es) THEN 'fr'
         |       WHEN es >= greatest(de, en) THEN 'es'
         |       WHEN en >= de THEN 'en'
         |       ELSE 'de' END AS lang_pred
         |FROM hits""".stripMargin)),
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
    // near-dup CLUSTERS: connected components over the MinHash+LSH pair
    // list (iterative min-label propagation) + survivor/member summary —
    // oracle = recursive-CTE transitive closure over exact-Jaccard pairs
    ("dedup_clusters",
      ((s, dir) =>
      Dedup.clusters(Dedup.minhashLshPairs(docs(s, dir), "doc_id", "text",
        n = 3, threshold = 0.5, numHashes = 128, rowsPerBand = 2))),
      (jaccardSql
      .replaceFirst("WITH ", "WITH RECURSIVE ")
      .replace("SELECT id_a, id_b, jaccard FROM (",
        ", pairs AS (SELECT id_a, id_b, jaccard FROM (")
      .replace("WHERE jaccard >= 0.5", "WHERE jaccard >= 0.5)") +
      """, edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs),
        |reach AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        |labels AS (
        |  SELECT src AS id, LEAST(src, MIN(dst)) AS component
        |  FROM reach GROUP BY src)
        |SELECT component AS survivor_id, CAST(COUNT(*) AS BIGINT) AS n_members
        |FROM labels GROUP BY component""".stripMargin)),
    // dedup-AWARE soft sampling (keep everything, weight clusters down):
    // each doc weighs 1/cluster-size so a near-dup cluster contributes
    // ~one expected pick; Gumbel-top-200 selection with the md5 noise.
    // Oracle replays the exact-Jaccard closure, the sizes, the
    // singleton default, the noise, and the ranking — membership exact.
    ("td_cluster_weighted_sample",
      ((s, dir) => {
        val d = docs(s, dir)
        Sampling.clusterWeightedSample(d,
          Dedup.minhashLshPairs(d, "doc_id", "text",
            n = 3, threshold = 0.5, numHashes = 128, rowsPerBand = 2),
          "doc_id", n = 200)
      }),
      (jaccardSql
      .replaceFirst("WITH ", "WITH RECURSIVE ")
      .replace("SELECT id_a, id_b, jaccard FROM (",
        ", pairs AS (SELECT id_a, id_b, jaccard FROM (")
      .replace("WHERE jaccard >= 0.5", "WHERE jaccard >= 0.5)") +
      """, edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs),
        |reach AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        |labels AS (
        |  SELECT src AS id, LEAST(src, MIN(dst)) AS component
        |  FROM reach GROUP BY src),
        |sizes AS (
        |  SELECT component, CAST(COUNT(*) AS BIGINT) AS cluster_size
        |  FROM labels GROUP BY component),
        |docw AS (
        |  SELECT d.doc_id, COALESCE(l.component, d.doc_id) AS cluster,
        |    COALESCE(z.cluster_size, 1) AS cluster_size
        |  FROM documents d
        |  LEFT JOIN labels l ON d.doc_id = l.id
        |  LEFT JOIN sizes z ON l.component = z.component)
        |SELECT doc_id, cluster, cluster_size FROM docw
        |ORDER BY -ln(CAST(cluster_size AS DOUBLE)) + (-ln(-ln(
        |  (('0x' || substr(md5('0:' || CAST(doc_id AS VARCHAR)), 1, 12))
        |     ::BIGINT + 0.5) / 281474976710656.0))) DESC, doc_id
        |LIMIT 200""".stripMargin)),
    // quality-aware survivor selection: keep the LONGEST member of each
    // near-dup cluster (ties -> smallest id) — the keep-the-best-copy
    // policy, vs dedup_clusters' arbitrary min-id rule
    ("dedup_best_survivor",
      ((s, dir) => {
      val d = docs(s, dir)
      val pairs = Dedup.minhashLshPairs(d, "doc_id", "text",
        n = 3, threshold = 0.5, numHashes = 128, rowsPerBand = 2)
      Dedup.clustersBestOf(pairs,
        d.select(col("doc_id"), length(col("text")).cast("long").as("q")),
        "doc_id", "q")
    }),
      (jaccardSql
      .replaceFirst("WITH ", "WITH RECURSIVE ")
      .replace("SELECT id_a, id_b, jaccard FROM (",
        ", pairs AS (SELECT id_a, id_b, jaccard FROM (")
      .replace("WHERE jaccard >= 0.5", "WHERE jaccard >= 0.5)") +
      """, edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs),
        |reach AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        |labels AS (
        |  SELECT src AS id, LEAST(src, MIN(dst)) AS component
        |  FROM reach GROUP BY src),
        |scored AS (
        |  SELECT l.id, l.component, CAST(length(d.text) AS BIGINT) AS q
        |  FROM labels l JOIN documents d ON d.doc_id = l.id),
        |sel AS (
        |  SELECT component, id, q,
        |    ROW_NUMBER() OVER (PARTITION BY component
        |      ORDER BY q DESC, id ASC) AS rn,
        |    COUNT(*) OVER (PARTITION BY component) AS nm
        |  FROM scored)
        |SELECT component, id AS survivor_id, q AS survivor_quality,
        |  CAST(nm AS BIGINT) AS n_members
        |FROM sel WHERE rn = 1""".stripMargin)),
    // corpus snapshot diff (crawl-N vs crawl-N+1 versioning): old drops
    // doc_id%7==0, new drops %5==0 and rewords %11==0 — per-id status
    // from the fingerprint full-outer join, replayed exactly
    ("td_corpus_diff",
      ((s, dir) => {
      val d = docs(s, dir)
      val oldSnap = d.filter(pmod(col("doc_id"), lit(7)) =!= 0)
      val newSnap = d.filter(pmod(col("doc_id"), lit(5)) =!= 0)
        .withColumn("text",
          when(pmod(col("doc_id"), lit(11)) === 0,
            concat(col("text"), lit(" appended v2 sentence")))
            .otherwise(col("text")))
      Dedup.snapshotDiff(oldSnap, newSnap, "doc_id", "text")
    }),
      """WITH f AS (
        |  SELECT doc_id, md5(array_to_string(list_sort(list_distinct(
        |    list_filter(string_split_regex(lower(text), '\s+'),
        |                w -> len(w) > 0))), ' ')) AS fp, text
        |  FROM documents),
        |o AS (SELECT doc_id, fp FROM f WHERE doc_id % 7 <> 0),
        |n0 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 11 = 0
        |      THEN text || ' appended v2 sentence' ELSE text END AS text
        |  FROM documents WHERE doc_id % 5 <> 0),
        |n AS (
        |  SELECT doc_id, md5(array_to_string(list_sort(list_distinct(
        |    list_filter(string_split_regex(lower(text), '\s+'),
        |                w -> len(w) > 0))), ' ')) AS fp
        |  FROM n0)
        |SELECT COALESCE(o.doc_id, n.doc_id) AS id,
        |  CASE WHEN o.doc_id IS NULL THEN 'added'
        |       WHEN n.doc_id IS NULL THEN 'removed'
        |       WHEN o.fp <> n.fp THEN 'changed'
        |       ELSE 'unchanged' END AS status
        |FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id""".stripMargin),
    // Unicode normalization: deterministic spikes with DECOMPOSED
    // sequences, combining marks, ß/ø (no decomposition) — NFC and
    // accent-strip must agree byte-for-byte with DuckDB's
    // nfc_normalize/strip_accents (different Unicode implementations,
    // same standard)
    ("td_unicode_norm",
      ((s, dir) => {
      val spikes = Seq("Café au lait", "münchen straße",
        "ñoño øre", "plain ascii only")
      val sp = element_at(array(spikes.map(lit): _*),
        pmod(col("doc_id"), lit(4)).cast("int") + 1)
      docs(s, dir).select(col("doc_id"),
        TextFunctions.nfc(sp).as("nfc"),
        TextFunctions.stripAccents(sp).as("plain"))
    }),
      """WITH sp AS (
        |  SELECT doc_id,
        |    CASE doc_id % 4
        |      WHEN 0 THEN 'Cafe' || chr(769) || ' au lait'
        |      WHEN 1 THEN 'mu' || chr(776) || 'nchen stra' || chr(223) || 'e'
        |      WHEN 2 THEN 'n' || chr(771) || 'on' || chr(771) || 'o '
        |                    || chr(248) || 're'
        |      ELSE 'plain ascii only' END AS s
        |  FROM documents)
        |SELECT doc_id, nfc_normalize(s) AS nfc, strip_accents(s) AS plain
        |FROM sp""".stripMargin),
    // leakage-free split: near-dup cluster members must land in the
    // same train/val/test split (a near-copy of a training doc in the
    // test set is contamination) — split key = component label, or own
    // id for singletons; oracle replays components (recursive CTE) +
    // the md5 bucket rule
    ("td_split_leakfree",
      ((s, dir) => {
      val d = docs(s, dir)
      val pairs = Dedup.minhashLshPairs(d, "doc_id", "text",
        n = 3, threshold = 0.5, numHashes = 128, rowsPerBand = 2)
      Dedup.leakFreeSplit(d.select(col("doc_id")), "doc_id", pairs,
          testBp = 1000, valBp = 1000)
        .groupBy(col("split")).agg(count(lit(1)).as("n_docs"))
    }),
      (jaccardSql
      .replaceFirst("WITH ", "WITH RECURSIVE ")
      .replace("SELECT id_a, id_b, jaccard FROM (",
        ", pairs AS (SELECT id_a, id_b, jaccard FROM (")
      .replace("WHERE jaccard >= 0.5", "WHERE jaccard >= 0.5)") +
      """, edges AS (
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
        |  SELECT d.doc_id, COALESCE(l.component, d.doc_id) AS key
        |  FROM documents d LEFT JOIN labels l ON l.id = d.doc_id),
        |sp AS (
        |  SELECT doc_id,
        |    CASE WHEN ('0x' || substr(md5(CAST(key AS VARCHAR)), 1, 8))
        |             ::BIGINT % 10000 < 1000 THEN 'test'
        |         WHEN ('0x' || substr(md5(CAST(key AS VARCHAR)), 1, 8))
        |             ::BIGINT % 10000 < 2000 THEN 'val'
        |         ELSE 'train' END AS split
        |  FROM keyed)
        |SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs
        |FROM sp GROUP BY split""".stripMargin)),
    // PII scrubbing: deterministic PII is injected (the corpus has none)
    // and the redaction chain must strip it — the oracle replays the
    // exact regex rewrite, so engine-for-engine behavior is hash-checked
    ("td_pii_scrub",
      ((s, dir) => {
      val spiked = docs(s, dir).withColumn("s", concat(
        col("text"),
        lit(" Contact: user"), col("doc_id"), lit("@mail.example.com"),
        lit(", tel +1 (202) 555-01"), pmod(col("doc_id"), lit(100)),
        lit(", ip 192.168."), pmod(col("doc_id"), lit(255)), lit(".7")))
      spiked.select(col("doc_id"),
        TextFunctions.redactPii(col("s"))
          .substr(length(col("text")) + 1, lit(200)).as("tail"))
    }),
      """WITH spiked AS (
        |  SELECT doc_id, text,
        |    text || ' Contact: user' || doc_id || '@mail.example.com'
        |      || ', tel +1 (202) 555-01' || (doc_id % 100)
        |      || ', ip 192.168.' || (doc_id % 255) || '.7' AS s
        |  FROM documents),
        |red AS (
        |  SELECT doc_id, text,
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(s,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        |      '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '[IP]', 'g'),
        |      '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b', '[SSN]', 'g'),
        |      '\+?[0-9][0-9() -]{7,}[0-9]', '[PHONE]', 'g')
        |      AS r
        |  FROM spiked)
        |SELECT doc_id, substr(r, length(text) + 1, 200) AS tail
        |FROM red""".stripMargin),
    // PII: Luhn-validated card redaction + SSN. Five spiked candidates
    // per doc_id%5 — three Luhn-valid (Visa 16, MC dashed 16, Amex 15),
    // two invalid that must fall through to the [PHONE] recall rule —
    // plus an SSN on even ids. The oracle replays the whole chain
    // including the Luhn fold (list_reduce + nested lambdas).
    ("td_pii_cards",
      ((s, dir) => {
      val cards = Seq("4111 1111 1111 1111", "5500-0000-0000-0004",
        "378282246310005", "1234 5678 9012 3456", "4111111111111112")
      val card = element_at(array(cards.map(lit): _*),
        pmod(col("doc_id"), lit(5)).cast("int") + 1)
      val spiked = docs(s, dir).withColumn("s", concat(col("text"),
        lit(" card "), card,
        when(pmod(col("doc_id"), lit(2)) === 0,
          lit(" ssn 123-45-6789")).otherwise(lit("")),
        lit(" end")))
      spiked.select(col("doc_id"),
        TextFunctions.redactPiiAll(col("s"))
          .substr(length(col("text")) + 1, lit(200)).as("tail"))
    }),
      """WITH spiked AS (
        |  SELECT doc_id, text,
        |    text || ' card ' ||
        |    (CASE doc_id % 5
        |       WHEN 0 THEN '4111 1111 1111 1111'
        |       WHEN 1 THEN '5500-0000-0000-0004'
        |       WHEN 2 THEN '378282246310005'
        |       WHEN 3 THEN '1234 5678 9012 3456'
        |       ELSE '4111111111111112' END) ||
        |    (CASE WHEN doc_id % 2 = 0 THEN ' ssn 123-45-6789' ELSE '' END)
        |    || ' end' AS s
        |  FROM documents),
        |em AS (
        |  SELECT doc_id, text,
        |    regexp_replace(s,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]',
        |      'g') AS s
        |  FROM spiked),
        |carded AS (
        |  SELECT doc_id, text,
        |    list_reduce(list_prepend(s, list_filter(
        |      regexp_extract_all(s, '\b[0-9](?:[ -]?[0-9]){12,18}\b'),
        |      c -> (len(regexp_replace(c, '[^0-9]', '', 'g'))
        |              BETWEEN 13 AND 19
        |        AND list_sum(list_transform(
        |          range(0, len(regexp_replace(c, '[^0-9]', '', 'g'))), i ->
        |          CASE WHEN i % 2 = 1 THEN
        |            CASE WHEN 2*CAST(substr(regexp_replace(c, '[^0-9]', '', 'g'),
        |                   len(regexp_replace(c, '[^0-9]', '', 'g')) - i, 1)
        |                   AS INT) > 9
        |              THEN 2*CAST(substr(regexp_replace(c, '[^0-9]', '', 'g'),
        |                   len(regexp_replace(c, '[^0-9]', '', 'g')) - i, 1)
        |                   AS INT) - 9
        |              ELSE 2*CAST(substr(regexp_replace(c, '[^0-9]', '', 'g'),
        |                   len(regexp_replace(c, '[^0-9]', '', 'g')) - i, 1)
        |                   AS INT) END
        |          ELSE CAST(substr(regexp_replace(c, '[^0-9]', '', 'g'),
        |                 len(regexp_replace(c, '[^0-9]', '', 'g')) - i, 1)
        |                 AS INT) END)) % 10 = 0))),
        |      (acc, c) -> replace(acc, c, '[CARD]')) AS s
        |  FROM em),
        |red AS (
        |  SELECT doc_id, text,
        |    regexp_replace(regexp_replace(regexp_replace(s,
        |      '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '[IP]', 'g'),
        |      '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b', '[SSN]', 'g'),
        |      '\+?[0-9][0-9() -]{7,}[0-9]', '[PHONE]', 'g') AS r
        |  FROM carded)
        |SELECT doc_id, substr(r, length(text) + 1, 200) AS tail
        |FROM red""".stripMargin),
    // ANN: IVF cell-probed variant (kmeans centroids; the 100TB path is
    // the cell id as a bucket column of the stored table), emitted as
    // the per-query recall gate vs the exact brute-force top-10: every
    // query must recover at least 5 of the true top-10 (measured min is
    // 7 across SFs; both sides are deterministic so the gate is
    // hash-stable). The IVF probe AND the exact scan are the timed work.
    ("ann_ivf_topk",
      ((s, dir) => {
      val e = embs(s, dir)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val q = e.filter(col("id") < 10).select(col("id").as("qid"), col("vec"))
      perQidRecallGate(
        Similarity.ivfTopK(q, e, k = 10, nlist = 16, nprobe = 4),
        Similarity.bruteForceTopK(q, e, k = 10), q, minHits = 5)
    }),
      // property gates: the expected rows are pure functions of the table
          // ids (the Spark side computes the real approximate operator and
          // asserts its quality bound; see each query's comment for the
          // measured margins)
      """SELECT vec_id AS qid, true AS recall_ok
        |FROM embeddings WHERE vec_id < 10""".stripMargin),
    // incremental dedup: NEW batch (odd ids) near-dup-scanned against
    // the PRIOR corpus (even ids) — band keys of the prior side are the
    // stored-index shape; oracle = exact cross-parity Jaccard pairs
    ("dedup_incremental",
      ((s, dir) => {
      val d = docs(s, dir)
      Dedup.minhashLshCrossPairs(
        d.filter(pmod(col("doc_id"), lit(2)) === 1),
        d.filter(pmod(col("doc_id"), lit(2)) === 0),
        "doc_id", "text", n = 3, threshold = 0.5)
    }),
      (
      s"""SELECT
         |  CASE WHEN id_a % 2 = 1 THEN id_a ELSE id_b END AS id_a,
         |  CASE WHEN id_a % 2 = 1 THEN id_b ELSE id_a END AS id_b,
         |  jaccard
         |FROM ($jaccardSql)
         |WHERE (id_a % 2) <> (id_b % 2)""".stripMargin)),
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
    // document clustering (hashed bag-of-words + the DataFrame-native
    // k-means already backing IVF): planted topic markers (doc_id % 4,
    // repeated so they dominate the TF vector) must be recovered as
    // cluster structure — per-topic majority-cell purity over a floor
    // with margin. Counts are SQL-replayable; the purity decision is
    // the measured property (no SQL engine replays k-means).
    ("td_doc_clusters",
      ((s, dir) => {
      val d = docs(s, dir)
      val t = pmod(col("doc_id"), lit(4))
      val marker = concat(lit(" tpx"), t, lit("a tpx"), t,
        lit("b tpx"), t, lit("c"))
      val rep = (1 to 8).map(_ => marker).reduce(concat(_, _))
      val spiked = d.select(col("doc_id"),
        concat(col("text"), rep).as("text"))
      val toks = spiked.select(col("doc_id"),
        TextFunctions.words(col("text")).as("toks"))
      val tf = new org.apache.spark.ml.feature.HashingTF()
        .setInputCol("toks").setOutputCol("f").setNumFeatures(128)
      import s.implicits._
      val feats = tf.transform(toks)
        .select(col("doc_id"), col("f"))
        .map(r => (r.getLong(0),
          r.getAs[org.apache.spark.ml.linalg.Vector](1)
            .toArray.map(_.toFloat).toSeq))
        .toDF("id", "vec")
      val cents = Similarity.trainCentroids(feats, nlist = 4, iters = 3)
      val assigned = feats.select(col("id"),
        Similarity.cellOf(col("vec"), cents).as("cell"))
        .withColumn("topic", pmod(col("id"), lit(4)))
      val perTopic = assigned.groupBy(col("topic"), col("cell"))
        .agg(count(lit(1)).as("n"))
      val majority = perTopic.groupBy(col("topic"))
        .agg(max(col("n")).as("m"), sum(col("n")).as("tot"))
      val agg = majority.agg(sum(col("m")).as("maj"),
        sum(col("tot")).as("tot")).head()
      val purity = agg.getLong(0).toDouble / agg.getLong(1)
      s.range(1).select(lit(agg.getLong(1)).as("n_docs"),
        lit(purity >= 0.9).as("purity_ok"))
    }),
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  TRUE AS purity_ok
        |FROM documents""".stripMargin),
    // C4-style sentence-level filtering: documents re-punctuated
    // deterministically (a period every 6th word + an appended 1-word
    // "Hi." sentence + a naturally unterminated tail), then split on
    // terminal punctuation, short sentences dropped, doc rebuilt from
    // survivors — the oracle replays the spike, the split, the filter,
    // and the byte-exact rebuilt text.
    ("td_sentence_filter",
      ((s, dir) => {
      val d = docs(s, dir)
      val w = TextFunctions.words(col("text"))
      val spiked = concat(
        concat_ws(" ", transform(w, (x, i) =>
          concat(x, when(pmod(i + 1, lit(6)) === 0, lit("."))
            .otherwise(lit(""))))),
        lit(" Hi."))
      graft.operators.TextQuality.sentenceFilter(
          d.select(col("doc_id"), spiked.as("text")), "doc_id", "text")
        .select(col("doc_id"), col("n_sentences"), col("n_kept"),
          md5(col("text_clean")).as("clean_md5"))
    }),
      """WITH w AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text),
        |    '\s+'), x -> len(x) > 0) AS w
        |  FROM documents),
        |sp AS (
        |  SELECT doc_id,
        |    array_to_string(list_transform(range(1, len(w) + 1),
        |      i -> w[i] || CASE WHEN i % 6 = 0 THEN '.' ELSE '' END),
        |      ' ') || ' Hi.' AS t
        |  FROM w),
        |sents AS (
        |  SELECT doc_id, regexp_extract_all(t, '[^.!?]+[.!?]+') AS ss
        |  FROM sp),
        |k AS (
        |  SELECT doc_id, ss,
        |    list_filter(ss, s -> len(list_filter(
        |      string_split_regex(trim(s), '\s+'),
        |      x -> len(x) > 0)) >= 3) AS kept
        |  FROM sents)
        |SELECT doc_id, CAST(len(ss) AS BIGINT) AS n_sentences,
        |  CAST(len(kept) AS BIGINT) AS n_kept,
        |  md5(array_to_string(list_transform(kept, s -> trim(s)), ' '))
        |    AS clean_md5
        |FROM k""".stripMargin),
    // word-embedding training (skip-gram Word2Vec) with planted
    // co-occurrence structure: each doc gets a marker-token pair
    // qqa<k>/qqb<k> (k = doc_id % 8) appended twice — tokens that only
    // ever co-occur with their partner. After training, each qqa<k>'s
    // nearest qqb* must be its own partner; the per-anchor decisions
    // plus the SQL-replayable vocab counts are the gate, with a floor
    // wide enough that seed-stable training jitter cannot flip it.
    ("td_word2vec",
      ((s, dir) => {
      import graft.operators.TextEmbeddings
      val d = docs(s, dir)
      val k = pmod(col("doc_id"), lit(8))
      val pair = concat(lit(" qqa"), k, lit(" qqb"), k)
      val spiked = d.select(col("doc_id"),
        concat(col("text"), pair, pair).as("text"))
      val toks = spiked.select(col("doc_id"),
        TextFunctions.words(col("text")).as("toks"))
      val model = TextEmbeddings.trainWord2Vec(toks, "toks")
      val vecs = TextEmbeddings.vectors(model)
        .filter(col("word").startsWith("qqa") ||
          col("word").startsWith("qqb"))
      val a = vecs.filter(col("word").startsWith("qqa"))
        .select(substring(col("word"), 4, 2).cast("int").as("ka"),
          col("vector").as("va"))
      val b = vecs.filter(col("word").startsWith("qqb"))
        .select(substring(col("word"), 4, 2).cast("int").as("kb"),
          col("vector").as("vb"))
      val cos = graft.functions.expressions.VectorKernels.cosine_sim(
        col("va").cast("array<float>"), col("vb").cast("array<float>"))
      val scored = a.crossJoin(b).select(col("ka"), col("kb"),
        cos.as("c"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("ka")).orderBy(col("c").desc, col("kb"))
      val best = scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
      val nCorrect = best.filter(col("ka") === col("kb")).count()
      s.range(1).select(
        lit(a.count()).as("n_anchors"),
        lit(nCorrect >= 6L).as("pairs_recovered_ok"))
    }),
      """SELECT CAST(COUNT(DISTINCT doc_id % 8) AS BIGINT) AS n_anchors,
        |  TRUE AS pairs_recovered_ok
        |FROM documents""".stripMargin),
    // decontamination SUITE report — the decision matrix a release
    // pipeline actually wants: per benchmark doc, which leak kind got
    // in and which method catches it. Two planted leak classes:
    // VERBATIM copies (even bench ids) and REWORDED copies (odd ids,
    // every 7th word substituted — every 8-gram window broken, so the
    // exact scan is structurally blind to them while 3-gram Jaccard
    // still clears 0.35). Expected matrix: verbatim → both methods;
    // reworded → fuzzy only. The oracle replays the substitution and
    // both detectors, so the matrix itself is hash-gated.
    ("td_decontam_suite",
      ((s, dir) => {
      val d = docs(s, dir)
      val bench = d.filter(pmod(col("doc_id"), lit(97)) === 0)
        .select(col("doc_id"), col("text"))
      val w = TextFunctions.words(col("text"))
      val reword = concat_ws(" ", transform(w, (x, i) =>
        when(pmod(i, lit(7)) === 0, concat(lit("xsub"), i)).otherwise(x)))
      val leaks = bench.filter(pmod(col("doc_id"), lit(2)) === 0)
        .select((col("doc_id") + 10000).as("doc_id"), col("text"))
        .unionByName(bench.filter(pmod(col("doc_id"), lit(2)) === 1)
          .select((col("doc_id") + 10000).as("doc_id"),
            reword.as("text")))
      val corpus = d.filter(pmod(col("doc_id"), lit(97)) =!= 0)
        .select(col("doc_id"), col("text"))
        .unionByName(leaks)
      val exactHits = operators.Decontamination.flag(corpus, "doc_id",
          "text", bench.select(col("text").as("btext")), "btext", n = 8)
        .select(col("id").as("leak_id"))
      val fuzzyHits = Dedup.minhashLshCrossPairs(corpus, bench,
          "doc_id", "text", n = 3, threshold = 0.35)
        .select(col("id_a").as("leak_id")).distinct()
      bench.select(col("doc_id").as("bench_id"),
          when(pmod(col("doc_id"), lit(2)) === 0, "verbatim")
            .otherwise("reworded").as("leak_kind"),
          (col("doc_id") + 10000).as("leak_id"))
        .join(exactHits.withColumn("caught_exact", lit(true)),
          Seq("leak_id"), "left")
        .join(fuzzyHits.withColumn("caught_fuzzy", lit(true)),
          Seq("leak_id"), "left")
        .select(col("bench_id"), col("leak_kind"),
          coalesce(col("caught_exact"), lit(false)).as("caught_exact"),
          coalesce(col("caught_fuzzy"), lit(false)).as("caught_fuzzy"))
    }),
      """WITH b AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0),
        |bw AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text),
        |    '\s+'), w -> len(w) > 0) AS w
        |  FROM b),
        |leak AS (
        |  SELECT doc_id + 10000 AS doc_id, text FROM b
        |  WHERE doc_id % 2 = 0
        |  UNION ALL
        |  SELECT doc_id + 10000,
        |    array_to_string(list_transform(range(1, len(w) + 1),
        |      i -> CASE WHEN (i - 1) % 7 = 0 THEN 'xsub' || (i - 1)
        |        ELSE w[i] END), ' ')
        |  FROM bw WHERE doc_id % 2 = 1),
        |corpus AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 0
        |  UNION ALL SELECT doc_id, text FROM leak),
        |cw AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text),
        |    '\s+'), w -> len(w) > 0) AS w
        |  FROM corpus),
        |csh8 AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(0, greatest(len(w) - 7, 0)),
        |    i -> array_to_string(w[i+1:i+8], ' ')))) AS sh
        |  FROM cw),
        |bsh8 AS (
        |  SELECT DISTINCT unnest(list_distinct(list_transform(
        |    range(0, greatest(len(w) - 7, 0)),
        |    i -> array_to_string(w[i+1:i+8], ' ')))) AS sh
        |  FROM bw),
        |ex AS (SELECT DISTINCT c.doc_id FROM csh8 c
        |       JOIN bsh8 USING (sh)),
        |shc AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(0, greatest(len(w) - 2, 0)),
        |    i -> array_to_string(w[i+1:i+3], ' ')))) AS sh
        |  FROM cw),
        |shb AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(0, greatest(len(w) - 2, 0)),
        |    i -> array_to_string(w[i+1:i+3], ' ')))) AS sh
        |  FROM bw),
        |nc AS (SELECT doc_id, COUNT(*) AS n FROM shc GROUP BY 1),
        |nb AS (SELECT doc_id, COUNT(*) AS n FROM shb GROUP BY 1),
        |inter AS (
        |  SELECT c.doc_id AS ca, bn.doc_id AS cb, COUNT(*) AS i
        |  FROM shc c JOIN shb bn USING (sh) GROUP BY 1, 2),
        |fz AS (
        |  SELECT DISTINCT inter.ca AS doc_id
        |  FROM inter JOIN nc ON nc.doc_id = inter.ca
        |  JOIN nb ON nb.doc_id = inter.cb
        |  WHERE ROUND(CAST(i AS DOUBLE) / (nc.n + nb.n - i), 4) >= 0.35)
        |SELECT b.doc_id AS bench_id,
        |  CASE WHEN b.doc_id % 2 = 0 THEN 'verbatim'
        |    ELSE 'reworded' END AS leak_kind,
        |  (b.doc_id + 10000) IN (SELECT doc_id FROM ex)
        |    AS caught_exact,
        |  (b.doc_id + 10000) IN (SELECT doc_id FROM fz)
        |    AS caught_fuzzy
        |FROM b""".stripMargin),
    ("td_decontam_fuzzy",
      ((s, dir) => {
      val d = docs(s, dir)
      val bench = d.filter(pmod(col("doc_id"), lit(97)) === 0)
        .select(col("doc_id"), col("text"))
      val w = TextFunctions.words(col("text"))
      val leaked = bench.select((col("doc_id") + 10000).as("doc_id"),
        concat_ws(" ", slice(w, lit(2), size(w))).as("text"))
      val corpus = d.filter(pmod(col("doc_id"), lit(97)) =!= 0)
        .select(col("doc_id"), col("text"))
        .unionByName(leaked)
      Dedup.minhashLshCrossPairs(corpus, bench,
        "doc_id", "text", n = 3, threshold = 0.5)
    }),
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 0
        |  UNION ALL
        |  SELECT doc_id + 10000 AS doc_id,
        |    array_to_string(list_filter(string_split_regex(lower(text),
        |      '\s+'), w -> len(w) > 0)[2:], ' ') AS text
        |  FROM documents WHERE doc_id % 97 = 0),
        |bench AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0),
        |shc AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(0, greatest(len(w) - 2, 0)),
        |    i -> array_to_string(w[i+1:i+3], ' ')))) AS sh
        |  FROM (SELECT doc_id, list_filter(string_split_regex(lower(text),
        |          '\s+'), w -> len(w) > 0) AS w FROM corpus) t),
        |shb AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(0, greatest(len(w) - 2, 0)),
        |    i -> array_to_string(w[i+1:i+3], ' ')))) AS sh
        |  FROM (SELECT doc_id, list_filter(string_split_regex(lower(text),
        |          '\s+'), w -> len(w) > 0) AS w FROM bench) t),
        |nc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
        |       FROM shc GROUP BY 1),
        |nb AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
        |       FROM shb GROUP BY 1),
        |inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    CAST(COUNT(*) AS BIGINT) AS i
        |  FROM shc a JOIN shb b ON a.sh = b.sh GROUP BY 1, 2)
        |SELECT id_a, id_b, jaccard FROM (
        |  SELECT id_a, id_b,
        |    ROUND(CAST(i AS DOUBLE) / (nc.n + nb.n - i), 4) AS jaccard
        |  FROM inter
        |  JOIN nc ON nc.doc_id = id_a
        |  JOIN nb ON nb.doc_id = id_b)
        |WHERE jaccard >= 0.5""".stripMargin),
    // incremental membership with a bloom prefilter: batch (odd ids)
    // docs whose word-set fingerprint exists in the prior corpus (even
    // ids) — bloom built by a distributed aggregate, map-side
    // might_contain scan, exact semi-join verify (result is exact)
    ("dedup_incremental_bloom",
      ((s, dir) => {
      val d = docs(s, dir)
      Dedup.bloomIncremental(
        d.filter(pmod(col("doc_id"), lit(2)) === 1),
        d.filter(pmod(col("doc_id"), lit(2)) === 0),
        "doc_id", "text")
    }),
      """WITH f AS (
        |  SELECT doc_id, md5(array_to_string(list_sort(list_distinct(
        |    list_filter(string_split_regex(lower(text), '\s+'),
        |                w -> len(w) > 0))), ' ')) AS fp
        |  FROM documents)
        |SELECT a.doc_id AS id, a.fp FROM f a
        |WHERE a.doc_id % 2 = 1 AND EXISTS (
        |  SELECT 1 FROM f b WHERE b.doc_id % 2 = 0 AND b.fp = a.fp)""".stripMargin),
    // decontamination: flag corpus docs sharing any 8-word n-gram with a
    // "benchmark" set (every 97th doc stands in for the eval set) — the
    // train/test-leak scan; benchmark n-grams broadcast, corpus scanned
    // once
    ("td_decontam",
      ((s, dir) => {
      val d = docs(s, dir)
      val bench = d.filter(pmod(col("doc_id"), lit(97)) === 0)
        .select(col("text").as("btext"))
      operators.Decontamination.flag(d, "doc_id", "text", bench, "btext", n = 8)
    }),
      """WITH ws AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
        |                             w -> len(w) > 0) AS w
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    unnest(list_distinct(list_transform(
        |      range(0, greatest(len(w) - 7, 0)),
        |      i -> array_to_string(w[i+1:i+8], ' ')))) AS sh
        |  FROM ws),
        |bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 97 = 0)
        |SELECT s.doc_id AS id, CAST(COUNT(DISTINCT s.sh) AS BIGINT)
        |  AS n_matched
        |FROM sh s JOIN bench USING (sh)
        |GROUP BY 1""".stripMargin),
    // corpus-scale n-gram novelty (memorization audit): per doc, the
    // fraction of its distinct 8-grams found nowhere in the reference
    // split — the engine joins on xxhash64 gram keys, the oracle on
    // literal strings (a hash collision fails the gate, never hides)
    ("td_ngram_novelty",
      ((s, dir) => {
        val d = docs(s, dir)
        operators.Decontamination.novelty(
          d.filter(pmod(col("doc_id"), lit(3)) === 0), "doc_id", "text",
          d.filter(pmod(col("doc_id"), lit(3)) =!= 0), "text", n = 8)
          .withColumnRenamed("id", "doc_id")
      }),
      """WITH ws AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
        |                             w -> len(w) > 0) AS w
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    unnest(list_distinct(list_transform(
        |      range(0, greatest(len(w) - 7, 0)),
        |      i -> array_to_string(w[i+1:i+8], ' ')))) AS sh
        |  FROM ws),
        |ref AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 3 <> 0),
        |cand AS (SELECT doc_id, sh FROM sh WHERE doc_id % 3 = 0)
        |SELECT c.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
        |  CAST(SUM(CASE WHEN r.sh IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS novel_grams,
        |  ROUND(CAST(SUM(CASE WHEN r.sh IS NULL THEN 1 ELSE 0 END)
        |      AS DOUBLE) / COUNT(*), 4) AS novelty
        |FROM cand c LEFT JOIN ref r USING (sh)
        |GROUP BY c.doc_id""".stripMargin),
    // vocabulary/token-frequency table (tokenizer-training input):
    // global word counts, min-count floor, deterministic top-100
    ("td_vocab",
      ((s, dir) =>
      operators.Decontamination.vocab(docs(s, dir), "text", minCount = 50)
        .orderBy(desc("n"), asc("word")).limit(100)),
      """WITH ws AS (
        |  SELECT list_filter(string_split_regex(lower(text), '\s+'),
        |                     w -> len(w) > 0) AS w
        |  FROM documents),
        |words AS (SELECT unnest(w) AS word FROM ws)
        |SELECT word, CAST(COUNT(*) AS BIGINT) AS n
        |FROM words GROUP BY word HAVING COUNT(*) >= 50
        |ORDER BY n DESC, word LIMIT 100""".stripMargin),
    // BM25 keyword retrieval — the lexical half of the retrieval
    // surface (ANN is the semantic half). Terms span the df spectrum
    // ("dup" is rare → high idf; the others near-ubiquitous) so the
    // scores exercise both idf regimes. Rounded-score + doc_id
    // ordering makes the top-50 cut engine-stable.
    ("td_bm25",
      ((s, dir) =>
      operators.KeywordSearch.bm25(docs(s, dir), "doc_id", "text",
        Seq("dup", "vector", "key"), topK = 50)),
      """WITH dld AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'),
        |                w -> len(w) > 0) AS w
        |  FROM documents),
        |dl AS (SELECT doc_id, CAST(len(w) AS INT) AS dl, w FROM dld),
        |stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
        |m AS (
        |  SELECT doc_id, dl, term, COUNT(*) AS tf FROM (
        |    SELECT doc_id, dl, unnest(w) AS term FROM dl)
        |  WHERE term IN ('dup', 'vector', 'key')
        |  GROUP BY 1, 2, 3),
        |df AS (SELECT term, COUNT(*) AS df FROM m GROUP BY 1),
        |s AS (
        |  SELECT m.doc_id, m.dl, m.tf,
        |    ln(1 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5)) *
        |      (m.tf * 2.2) /
        |      (m.tf + 1.2 * (0.25 + 0.75 * m.dl / stats.avgdl)) AS s
        |  FROM m, df, stats WHERE m.term = df.term)
        |SELECT doc_id, dl, CAST(COUNT(*) AS BIGINT) AS n_terms,
        |  CAST(SUM(tf) AS BIGINT) AS sum_tf, ROUND(SUM(s), 4) AS score
        |FROM s GROUP BY 1, 2
        |ORDER BY score DESC, doc_id LIMIT 50""".stripMargin),
    // TF-IDF top-3 keywords per doc (keyword-extraction dual of BM25);
    // per-doc cut compiles to WindowGroupLimit. Bounded to a
    // deterministic doc subset to keep the gate output small.
    ("td_tfidf_terms",
      ((s, dir) =>
      operators.KeywordSearch.tfIdfTopTerms(
        docs(s, dir).filter(pmod(col("doc_id"), lit(29)) === 0),
        "doc_id", "text", topN = 3)),
      """WITH dld AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'),
        |                w -> len(w) > 0) AS w
        |  FROM documents WHERE doc_id % 29 = 0),
        |dl AS (SELECT doc_id, CAST(len(w) AS INT) AS dl, w FROM dld),
        |n AS (SELECT COUNT(*) AS n_docs FROM dl),
        |tf AS (
        |  SELECT doc_id, dl, term, COUNT(*) AS tf FROM (
        |    SELECT doc_id, dl, unnest(w) AS term FROM dl)
        |  GROUP BY 1, 2, 3),
        |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        |sc AS (
        |  SELECT tf.doc_id, tf.term, tf.tf,
        |    ROUND((CAST(tf.tf AS DOUBLE) / tf.dl) *
        |      ln((n.n_docs + 1.0) / (df.df + 1.0)), 4) AS tfidf
        |  FROM tf, df, n WHERE tf.term = df.term),
        |r AS (SELECT *, ROW_NUMBER() OVER (
        |    PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rnk
        |  FROM sc)
        |SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, tfidf,
        |  CAST(rnk AS INT) AS rnk
        |FROM r WHERE rnk <= 3""".stripMargin),
    // Gopher-style quality rule suite: per-doc metrics + composite pass
    // flag — a single codegen'd map pass, no shuffle (the per-doc gate
    // every web-scale curation pipeline runs first)
    ("td_gopher_quality",
      ((s, dir) =>
      TextQuality.gopherQuality(docs(s, dir), "doc_id", "text")),
      (wordsOnlyCte +
      """, m AS (
        |  SELECT doc_id,
        |    CAST(len(w) AS DOUBLE) AS nw,
        |    CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE) AS cw,
        |    CAST(len(regexp_extract_all(text, '#|\.\.\.')) AS DOUBLE) AS sym,
        |    CAST(len(list_filter(w, x -> regexp_matches(x, '[a-z]')))
        |      AS DOUBLE) AS alpha,
        |    len(list_intersect(list_distinct(w),
        |      ['the','be','to','of','and','that','have','with'])) AS hits
        |  FROM ws),
        |r AS (
        |  SELECT doc_id, nw, hits,
        |    ROUND(cw / greatest(nw, 1.0), 4) AS mwl,
        |    ROUND(sym / greatest(nw, 1.0), 4) AS symr,
        |    ROUND(alpha / greatest(nw, 1.0), 4) AS alphaf
        |  FROM m)
        |SELECT doc_id, CAST(nw AS INT) AS n_words, mwl AS mean_word_len,
        |  symr AS symbol_ratio, alphaf AS alpha_word_frac,
        |  CAST(hits AS INT) AS stopword_hits,
        |  (nw >= 30 AND nw <= 100000 AND mwl >= 3.0 AND mwl <= 10.0
        |    AND symr < 0.1 AND alphaf > 0.80 AND hits >= 2) AS pass
        |FROM r""".stripMargin)),
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
    // within-doc repetition metrics (Gopher repetition family): most
    // frequent 2-gram char coverage + duplicate-chunk char fraction
    ("td_repetition",
      ((s, dir) =>
      TextQuality.repetition(docs(s, dir), "doc_id", "text")),
      (wordsOnlyCte +
      """, grams AS (
        |  SELECT doc_id, unnest(CASE WHEN len(w) >= 2 THEN
        |    list_transform(range(0, len(w) - 1),
        |      i -> array_to_string(w[i+1:i+2], ' '))
        |    ELSE [] END) AS g
        |  FROM ws),
        |gc AS (SELECT doc_id, g, COUNT(*) AS cnt FROM grams GROUP BY 1, 2),
        |top AS (
        |  SELECT doc_id, cnt AS top_cnt, g AS top_g FROM (
        |    SELECT doc_id, cnt, g, ROW_NUMBER() OVER (PARTITION BY doc_id
        |      ORDER BY cnt DESC, g DESC) AS rn
        |    FROM gc) WHERE rn = 1),
        |chunks AS (
        |  SELECT doc_id, unnest(CASE WHEN len(w) > 0 THEN
        |    list_transform(range(0, CAST(ceil(len(w) / 10.0) AS INT)),
        |      i -> array_to_string(w[i*10+1:i*10+10], ' '))
        |    ELSE [] END) AS c
        |  FROM ws),
        |cc AS (SELECT doc_id, c, COUNT(*) AS cnt FROM chunks GROUP BY 1, 2),
        |cs AS (
        |  SELECT doc_id, SUM(len(c) * cnt) AS total_chars,
        |    SUM(CASE WHEN cnt > 1 THEN len(c) * cnt ELSE 0 END) AS dup_chars
        |  FROM cc GROUP BY 1),
        |dc AS (
        |  SELECT doc_id,
        |    CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE)
        |      AS word_chars
        |  FROM ws)
        |SELECT dc.doc_id AS id,
        |  CAST(COALESCE(top_cnt, 0) AS BIGINT) AS top_gram_count,
        |  ROUND(CAST(COALESCE(top_cnt * (length(top_g) - 1), 0) AS DOUBLE)
        |    / greatest(word_chars, 1.0), 4) AS top_gram_frac,
        |  ROUND(CAST(COALESCE(dup_chars, 0) AS DOUBLE)
        |    / greatest(CAST(COALESCE(total_chars, 0) AS DOUBLE), 1.0), 4)
        |    AS dup_chunk_frac
        |FROM dc
        |LEFT JOIN top ON top.doc_id = dc.doc_id
        |LEFT JOIN cs ON cs.doc_id = dc.doc_id""".stripMargin)),
    // cross-doc boilerplate scrub (CCNet/RefinedWeb line dedup): chunks
    // seen in >= 2 distinct docs are boilerplate; per-doc survival stats
    ("td_boilerplate",
      ((s, dir) =>
      TextQuality.boilerplateScrub(docs(s, dir), "doc_id", "text")),
      (wordsOnlyCte +
      """, chunks AS (
        |  SELECT doc_id, unnest(CASE WHEN len(w) > 0 THEN
        |    list_transform(range(0, CAST(ceil(len(w) / 10.0) AS INT)),
        |      i -> array_to_string(w[i*10+1:i*10+10], ' '))
        |    ELSE [] END) AS c
        |  FROM ws),
        |freq AS (SELECT c, COUNT(DISTINCT doc_id) AS df FROM chunks GROUP BY 1)
        |SELECT doc_id AS id,
        |  CAST(COUNT(*) AS BIGINT) AS n_chunks,
        |  CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
        |  CAST(SUM(CASE WHEN df < 2 THEN len(c) ELSE 0 END) AS BIGINT)
        |    AS kept_chars
        |FROM chunks JOIN freq USING (c)
        |GROUP BY 1""".stripMargin)),
    // the scalar text library through the SQL surface: same GuardedSql
    // path as l2 but over the registered COLUMN-composition functions
    // (lang_id/token_count/doc_fingerprint) — proves the SQL registry
    // produces the same codegen'd semantics the Column API does
    ("l3_sql_text",
      ((s, dir) => {
      s.read.parquet(s"$dir/documents.parquet")
        .createOrReplaceTempView("documents_guard")
      graft.sql.GuardedSql.query(s,
        """SELECT doc_id, lang_id(text) AS lang_pred,
          |  token_count(text) AS n_toks, doc_fingerprint(text) AS fp
          |FROM documents_guard ORDER BY doc_id LIMIT 9999""".stripMargin)
        .withColumnRenamed("#", "row_num")
    }),
      (s"""WITH ws0 AS (
         |  SELECT doc_id, list_filter(
         |    string_split_regex(lower(text), '\\s+'),
         |    w -> len(w) > 0) AS wall
         |  FROM documents),
         |ws AS (SELECT doc_id, list_distinct(wall) AS w, wall FROM ws0),
         |hits AS (
         |  SELECT doc_id, wall,
         |    ${langHits("de", Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit"))},
         |    ${langHits("en", Seq("the", "and", "is", "of", "to", "in", "that", "it"))},
         |    ${langHits("es", Seq("el", "la", "de", "que", "y", "los", "es", "un"))},
         |    ${langHits("fr", Seq("le", "la", "les", "de", "et", "est", "un", "une"))},
         |    ${langHits("zh", Seq("的", "是", "不", "了", "在", "人", "有", "我"))}
         |  FROM ws),
         |out AS (
         |  SELECT doc_id,
         |    CASE WHEN greatest(de, en, es, fr, zh) = 0 THEN 'und'
         |         WHEN zh >= greatest(de, en, es, fr) THEN 'zh'
         |         WHEN fr >= greatest(de, en, es) THEN 'fr'
         |         WHEN es >= greatest(de, en) THEN 'es'
         |         WHEN en >= de THEN 'en'
         |         ELSE 'de' END AS lang_pred,
         |    CAST(len(wall) AS INT) AS n_toks,
         |    md5(array_to_string(list_sort(list_distinct(wall)), ' ')) AS fp
         |  FROM hits)
         |SELECT doc_id, lang_pred, n_toks, fp,
         |  CAST(ROW_NUMBER() OVER (ORDER BY doc_id) AS INT) AS row_num
         |FROM out ORDER BY doc_id LIMIT 50""".stripMargin)),
    // zlib-compressibility signal (RefinedWeb/FineWeb gate), emitted as
    // the oracle-replayable codec properties: deflate+inflate round-trip
    // byte-identity and the zlib size envelope per doc (the ratio values
    // themselves stay spec-pinned on compressionRatio — no SQL engine
    // replays deflate, but every SQL engine can assert the round-trip
    // contract the signal depends on)
    ("td_compress",
      ((s, dir) =>
      TextQuality.compressionRoundTrip(docs(s, dir), "doc_id", "text")),
      """SELECT doc_id AS id, octet_length(encode(text)) AS n_bytes,
        |  true AS roundtrip_ok, true AS bounds_ok
        |FROM documents""".stripMargin),
    // cross-doc EXACT substring duplication (Lee et al. 2022 family):
    // k-word windows occurring >= 2 times anywhere in the corpus,
    // per-doc covered-position fraction (suffix-array method re-expressed
    // as a positional window inverted index)
    ("dedup_substring",
      ((s, dir) =>
      Dedup.substringDups(docs(s, dir), "doc_id", "text", k = 8)),
      """WITH ws AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
        |                             w -> len(w) > 0) AS w
        |  FROM documents),
        |wp AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(0, greatest(len(w) - 7, 0)),
        |      i -> {'pos': i, 'gram': array_to_string(w[i+1:i+8], ' ')})) AS pw
        |  FROM ws),
        |wins AS (SELECT doc_id, pw.pos AS pos, pw.gram AS gram FROM wp),
        |dupg AS (SELECT gram FROM wins GROUP BY gram HAVING COUNT(*) >= 2),
        |dw AS (SELECT doc_id, pos FROM wins JOIN dupg USING (gram)),
        |nd AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_windows
        |       FROM dw GROUP BY 1),
        |cov AS (SELECT doc_id,
        |          unnest(list_transform(range(0, 8), o -> pos + o)) AS p
        |        FROM dw),
        |covd AS (SELECT doc_id, CAST(COUNT(DISTINCT p) AS BIGINT)
        |           AS n_covered
        |         FROM cov GROUP BY 1)
        |SELECT ws.doc_id AS id, CAST(len(w) AS INTEGER) AS n_words,
        |  COALESCE(nd.n_dup_windows, CAST(0 AS BIGINT)) AS n_dup_windows,
        |  COALESCE(covd.n_covered, CAST(0 AS BIGINT)) AS n_covered,
        |  ROUND(COALESCE(covd.n_covered, 0) / greatest(len(w), 1), 4)
        |    AS dup_frac
        |FROM ws LEFT JOIN nd USING (doc_id) LEFT JOIN covd USING (doc_id)
        |""".stripMargin),
    // the REMOVAL half of the above (Lee et al. 2022 cut the spans, not
    // just measured them): every word position covered by a duplicated
    // k-window is excised and the survivors re-joined — the oracle
    // replays the full rebuild byte-for-byte
    ("dedup_span_removal",
      ((s, dir) =>
      Dedup.removeDupSpans(docs(s, dir), "doc_id", "text", k = 8)),
      """WITH ws AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
        |                             w -> len(w) > 0) AS w
        |  FROM documents),
        |wp AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(0, greatest(len(w) - 7, 0)),
        |      i -> {'pos': i, 'gram': array_to_string(w[i+1:i+8], ' ')})) AS pw
        |  FROM ws),
        |wins AS (SELECT doc_id, pw.pos AS pos, pw.gram AS gram FROM wp),
        |dupg AS (SELECT gram FROM wins GROUP BY gram HAVING COUNT(*) >= 2),
        |cov AS (SELECT doc_id,
        |          unnest(list_transform(range(0, 8), o -> pos + o)) AS p
        |        FROM wins JOIN dupg USING (gram)),
        |covd AS (SELECT doc_id, list(DISTINCT p) AS cov FROM cov GROUP BY 1)
        |SELECT ws.doc_id AS id, CAST(len(w) AS INTEGER) AS n_words,
        |  CAST(COALESCE(len(covd.cov), 0) AS INTEGER) AS n_removed,
        |  COALESCE(array_to_string(
        |    list_filter(w, (x, i) -> NOT list_contains(
        |      COALESCE(covd.cov, CAST([] AS BIGINT[])), i - 1)), ' '), '')
        |    AS text_clean
        |FROM ws LEFT JOIN covd USING (doc_id)
        |""".stripMargin),
    // perplexity-style quality scoring (CCNet shape): add-alpha bigram
    // LM trained on the corpus itself, per-doc mean negative
    // log-likelihood + perplexity
    ("td_perplexity",
      ((s, dir) =>
      TextQuality.perplexity(docs(s, dir), "doc_id", "text", alpha = 0.1)),
      """WITH ws AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
        |                             w -> len(w) > 0) AS w
        |  FROM documents),
        |tok AS (SELECT doc_id, unnest(w) AS word FROM ws),
        |v AS (SELECT CAST(COUNT(DISTINCT word) AS DOUBLE) AS vsz FROM tok),
        |bi AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(0, greatest(len(w) - 1, 0)),
        |      i -> {'w1': w[i+1], 'w2': w[i+2]})) AS b
        |  FROM ws),
        |bb AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM bi),
        |c2 AS (SELECT w1, w2, CAST(COUNT(*) AS DOUBLE) AS n
        |       FROM bb GROUP BY 1, 2),
        |c1 AS (SELECT w1, CAST(SUM(n) AS DOUBLE) AS n_head
        |       FROM c2 GROUP BY 1),
        |sc AS (
        |  SELECT bb.doc_id,
        |    -ln((c2.n + 0.1) / (c1.n_head + 0.1 * v.vsz)) AS nll
        |  FROM bb JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v)
        |SELECT doc_id AS id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |  ROUND(AVG(nll), 4) AS avg_nll, ROUND(EXP(AVG(nll)), 2) AS ppl
        |FROM sc GROUP BY 1""".stripMargin),
    // model-based quality filter (the GPT-3/CCNet classifier stage):
    // seed labels from the heuristic quality score (top vs bottom half
    // at the corpus median) on half the corpus, train the hashed-ngram
    // logistic classifier, score the held-out half from TEXT alone.
    // Emitted as the held-out generalization gate: predictions on the
    // unseen half must agree with the heuristic labels on >= 60% of
    // docs (measured 0.68-0.78 across SFs; training is deterministic —
    // fixed partitioning, seeded init — so the aggregate is
    // hash-stable). The float optimization itself stays spec-pinned
    // (QualityClassifierSpec proves separation on planted data).
    ("td_quality_classifier",
      ((s, dir) => {
      val d = docs(s, dir)
      val stats = d.select(col("doc_id"),
        TextFunctions.qualityScore(col("text")).as("q"), col("text"))
      val med = stats.stat.approxQuantile("q", Array(0.5), 0.001).head
      val labeled = stats.select(col("doc_id"),
        (col("q") >= med).cast("int").as("label"), col("text"))
      // thousands of seed docs: a handful of partitions and a 2^16
      // hash width carry them; 25 L-BFGS iterations converge the
      // probabilities (see the train() doc on per-iteration cost)
      val model = QualityClassifier.train(
        labeled.filter(col("doc_id") % 2 === 0).coalesce(8),
        "text", "label", numFeatures = 1 << 16, maxIter = 15)
      QualityClassifier.score(
          model, d.filter(col("doc_id") % 2 === 1), "doc_id", "text")
        .join(labeled.select(col("doc_id").as("id"), col("label")), "id")
        .agg(count(lit(1)).as("n_scored"),
          (avg((col("quality_pred") === col("label")).cast("double"))
            >= 0.6).as("acc_ok"))
    }),
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_scored, true AS acc_ok
        |FROM documents WHERE doc_id % 2 = 1""".stripMargin),
    // URL/domain filtering (UT1-blocklist stage): deterministic URLs are
    // synthesized from doc_id (the corpus has none), then the blocklist
    // verdict — subdomain-suffix domain match, eTLD+1 extraction with a
    // public-suffix excerpt, path-substring rules — is hash-checked
    // against an oracle replaying the exact rules
    ("td_urlfilter",
      ((s, dir) => {
      val d = docs(s, dir).withColumn("url", concat(lit("https://"),
        element_at(typedLit(UrlHosts), (pmod(col("doc_id"), lit(8)) + 1).cast("int")),
        element_at(typedLit(UrlPaths), (pmod(col("doc_id"), lit(5)) + 1).cast("int")),
        col("doc_id")))
      UrlFilter.flag(d, "url",
          blockedDomains = Seq("bad-site.com", "ads-network.net"),
          blockedPathParts = Seq("/ads/"))
        .select(col("doc_id"), col("host"), col("registered_domain"),
          col("reason"), col("blocked"))
    }),
      {
      val hostList = UrlHosts.map(h => s"'$h'").mkString("[", ", ", "]")
      val pathList = UrlPaths.map(p => s"'$p'").mkString("[", ", ", "]")
      s"""WITH u AS (
         |  SELECT doc_id,
         |    $hostList[CAST(doc_id % 8 AS INT) + 1] AS host,
         |    $pathList[CAST(doc_id % 5 AS INT) + 1] || doc_id AS path
         |  FROM documents),
         |d AS (
         |  SELECT doc_id, host, path,
         |    string_split(host, '.') AS ls, len(string_split(host, '.')) AS n
         |  FROM u),
         |e AS (
         |  SELECT doc_id, host, path, ls, n,
         |    array_to_string(ls[n-1:], '.') AS last2
         |  FROM d),
         |r AS (
         |  SELECT doc_id, host,
         |    CASE WHEN last2 IN ('co.uk','org.uk','ac.uk','com.au','co.jp','com.br')
         |        AND n >= 3
         |      THEN array_to_string(ls[n-2:], '.') ELSE last2
         |    END AS registered_domain,
         |    CASE WHEN host = 'bad-site.com' OR host LIKE '%.bad-site.com'
         |        OR host = 'ads-network.net' OR host LIKE '%.ads-network.net'
         |      THEN 'domain'
         |    WHEN path LIKE '%/ads/%' THEN 'path'
         |    ELSE 'ok' END AS reason
         |  FROM e)
         |SELECT doc_id, host, registered_domain, reason,
         |  reason <> 'ok' AS blocked
         |FROM r""".stripMargin
    }),
    // URL canonicalization before url-dedup: messy deterministic URLs
    // (mixed-case scheme, default ports, tracking params, fragments,
    // trailing slashes) collapse to canonical form; the oracle replays
    // the group-free rewrite byte-for-byte
    ("td_url_canon",
      ((s, dir) => {
      val id = col("doc_id")
      val url = concat(
        element_at(array(lit("https://"), lit("HTTPS://"), lit("http://")),
          pmod(id, lit(3)).cast("int") + 1),
        element_at(typedLit(UrlHosts), (pmod(id, lit(8)) + 1).cast("int")),
        element_at(array(lit(""), lit(":443"), lit(":80")),
          pmod(id, lit(3)).cast("int") + 1),
        element_at(typedLit(UrlPaths), (pmod(id, lit(5)) + 1).cast("int")),
        id,
        element_at(array(lit("/"), lit("")),
          pmod(id, lit(2)).cast("int") + 1),
        element_at(array(lit("?utm_source=x&q=1"),
          lit("?q=2&utm_campaign=y&gclid=g1"),
          lit("?fbclid=f&utm_medium=z"), lit("")),
          pmod(id, lit(4)).cast("int") + 1),
        element_at(array(lit("#frag"), lit("")),
          pmod(id, lit(2)).cast("int") + 1))
      docs(s, dir).select(col("doc_id"), url.as("url"),
        UrlFilter.canonicalUrl(url).as("canon"))
    }),
      (s"""WITH u AS (
         |  SELECT doc_id,
         |    (CASE doc_id % 3 WHEN 0 THEN 'https://' WHEN 1 THEN 'HTTPS://'
         |       ELSE 'http://' END)
         |    || ${duckList(UrlHosts)}[CAST(doc_id % 8 AS INT) + 1]
         |    || (CASE doc_id % 3 WHEN 0 THEN '' WHEN 1 THEN ':443'
         |          ELSE ':80' END)
         |    || ${duckList(UrlPaths)}[CAST(doc_id % 5 AS INT) + 1]
         |    || doc_id
         |    || (CASE doc_id % 2 WHEN 0 THEN '/' ELSE '' END)
         |    || (CASE doc_id % 4 WHEN 0 THEN '?utm_source=x&q=1'
         |          WHEN 1 THEN '?q=2&utm_campaign=y&gclid=g1'
         |          WHEN 2 THEN '?fbclid=f&utm_medium=z' ELSE '' END)
         |    || (CASE doc_id % 2 WHEN 0 THEN '#frag' ELSE '' END) AS url
         |  FROM documents),
         |st AS (
         |  SELECT doc_id, url, regexp_replace(url, '#.*', '') AS nofrag
         |  FROM u),
         |sh0 AS (
         |  SELECT doc_id, url, nofrag,
         |    regexp_extract(nofrag,
         |      '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*') AS sh
         |  FROM st),
         |parts AS (
         |  SELECT doc_id, url,
         |    CASE WHEN lower(sh) LIKE 'http://%' AND lower(sh) LIKE '%:80'
         |           THEN substr(lower(sh), 1, length(sh) - 3)
         |         WHEN lower(sh) LIKE 'https://%' AND lower(sh) LIKE '%:443'
         |           THEN substr(lower(sh), 1, length(sh) - 4)
         |         ELSE lower(sh) END AS shp,
         |    substr(nofrag, length(sh) + 1) AS tail
         |  FROM sh0),
         |pq AS (
         |  SELECT doc_id, url, shp,
         |    CASE WHEN strpos(tail, '?') = 0 THEN tail
         |         ELSE substr(tail, 1, strpos(tail, '?') - 1) END AS p,
         |    CASE WHEN strpos(tail, '?') = 0 THEN ''
         |         ELSE substr(tail, strpos(tail, '?') + 1) END AS qs
         |  FROM parts),
         |canon AS (
         |  SELECT doc_id, url, shp,
         |    CASE WHEN p LIKE '%/' AND length(p) > 1
         |         THEN substr(p, 1, length(p) - 1) ELSE p END AS p2,
         |    list_filter(string_split(qs, '&'), x -> len(x) > 0
         |      AND NOT regexp_matches(x,
         |        '^(utm_[A-Za-z0-9_]+|gclid|fbclid|msclkid|ttclid|mc_eid)='))
         |      AS ps
         |  FROM pq)
         |SELECT doc_id, url,
         |  shp || p2 || (CASE WHEN len(ps) > 0
         |    THEN '?' || array_to_string(ps, '&') ELSE '' END) AS canon
         |FROM canon""".stripMargin)),
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
    // embedding-space drift between two corpus snapshots (even vec_ids
    // = crawl N, odd = crawl N+1): per label, both sides' mean vectors'
    // cosine + count shift. Label 3's N+1 vectors are NEGATED (float
    // negation is exact in both engines) so the gate shows a real drift
    // signal (mean_cos ≈ -1) against the stable labels (≈ +1)
    ("emb_drift",
      ((s, dir) => {
      val e = embs(s, dir).filter(col("embedding").isNotNull)
      val a = e.filter(pmod(col("vec_id"), lit(2)) === 0)
        .select(col("label"), col("embedding").as("vec"))
      val b = e.filter(pmod(col("vec_id"), lit(2)) === 1)
        .select(col("label"),
          when(col("label") === 3,
            transform(col("embedding"), x => -x))
            .otherwise(col("embedding")).as("vec"))
      Similarity.embeddingDrift(a, b, "label", "vec")
    }),
      """WITH a AS (
        |  SELECT label, unnest(embedding::DOUBLE[]) AS v,
        |    unnest(range(1, len(embedding) + 1)) AS i
        |  FROM embeddings
        |  WHERE vec_id % 2 = 0 AND embedding IS NOT NULL),
        |b AS (
        |  SELECT label,
        |    unnest((CASE WHEN label = 3
        |      THEN list_transform(embedding, x -> -x)
        |      ELSE embedding END)::DOUBLE[]) AS v,
        |    unnest(range(1, len(embedding) + 1)) AS i
        |  FROM embeddings
        |  WHERE vec_id % 2 = 1 AND embedding IS NOT NULL),
        |sa AS (SELECT label, i, SUM(v) AS s, COUNT(*) AS n
        |       FROM a GROUP BY 1, 2),
        |sb AS (SELECT label, i, SUM(v) AS s, COUNT(*) AS n
        |       FROM b GROUP BY 1, 2),
        |j AS (
        |  SELECT sa.label,
        |    SUM((sa.s / sa.n) * (sb.s / sb.n)) AS dot,
        |    SUM((sa.s / sa.n) * (sa.s / sa.n)) AS na,
        |    SUM((sb.s / sb.n) * (sb.s / sb.n)) AS nb
        |  FROM sa JOIN sb ON sa.label = sb.label AND sa.i = sb.i
        |  GROUP BY 1),
        |ca AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_a
        |       FROM embeddings
        |       WHERE vec_id % 2 = 0 AND embedding IS NOT NULL GROUP BY 1),
        |cb AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_b
        |       FROM embeddings
        |       WHERE vec_id % 2 = 1 AND embedding IS NOT NULL GROUP BY 1)
        |SELECT COALESCE(ca.label, cb.label) AS label,
        |  COALESCE(n_a, 0) AS n_a, COALESCE(n_b, 0) AS n_b,
        |  CASE WHEN na = 0 OR nb = 0 THEN NULL
        |    ELSE ROUND(dot / sqrt(na * nb), 4) END AS mean_cos
        |FROM ca FULL OUTER JOIN cb ON ca.label = cb.label
        |LEFT JOIN j ON j.label = COALESCE(ca.label, cb.label)""".stripMargin),
    // int8 scalar quantization of the embedding column (4x smaller ANN
    // storage): floor-based rounding is engine-exact, so the full code
    // array is md5-gated against the oracle
    ("emb_quantize",
      ((s, dir) => {
      val e = embs(s, dir)
      val q = Quantization.quantizeInt8(col("embedding"))
      e.select(col("vec_id"),
        round(Quantization.int8Scale(col("embedding")), 6).as("scale"),
        md5(concat_ws(",", transform(q, _.cast("string")))).as("q_md5"),
        aggregate(q, lit(0L), (a, x) => a + x.cast("long")).as("q_sum"))
    }),
      """WITH v AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v,
        |    list_max(list_transform(embedding::DOUBLE[], x -> abs(x)))
        |      AS scale
        |  FROM embeddings),
        |q AS (
        |  SELECT vec_id, scale,
        |    list_transform(v, x -> CAST(floor(
        |      CASE WHEN scale = 0 THEN 0.0 ELSE x / scale * 127 END + 0.5)
        |      AS INT)) AS qv
        |  FROM v)
        |SELECT vec_id, ROUND(scale, 6) AS scale,
        |  md5(array_to_string(qv, ',')) AS q_md5,
        |  CAST(list_sum(qv) AS BIGINT) AS q_sum
        |FROM q""".stripMargin),
    // product-quantization ANN (FAISS PQ shape): m=8 subspace codebooks
    // trained driver-side on a bounded sample, corpus stored as 8-byte
    // codes, ADC scoring via per-query literal LUTs — rows-only
    // (approximate by design; SimilaritySpec asserts recall vs brute
    // force and exact-reconstruction parity when codebooks are lossless)
    ("ann_pq_topk",
      ((s, dir) => {
      val e = embs(s, dir)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val model = Quantization.trainPq(e, dim = 64, m = 8, k = 16,
        iters = 5, sampleSize = 1024)
      val q = e.filter(col("id") < 10).select(col("id").as("qid"), col("vec"))
      // aggregate recall floor vs brute force (8x16 codebooks on 64-dim
      // vectors are coarse by design; measured 24-42/100 across SFs)
      totalRecallGate(Quantization.pqTopK(q, e, model, k = 10),
        Similarity.bruteForceTopK(q, e, k = 10), q, minTotal = 10)
    }),
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
        |  true AS recall_floor_ok
        |FROM embeddings WHERE vec_id < 10""".stripMargin),
    // SemDeDup (Abbas 2023): k-means-cell candidate pairs + exact cosine
    // verify + drop-the-larger-id. The survivor rule is clustering-
    // independent, so the oracle is an exact all-pairs NOT EXISTS scan
    // even though the engine only ever compares within cells.
    ("dedup_semantic",
      ((s, dir) =>
      Dedup.semanticDedup(
        embs(s, dir).select(col("vec_id").as("id"),
          col("embedding").as("vec"), col("label")),
        "id", "vec", threshold = 0.9, nlist = 16, nprobe = 2,
        keepCols = Seq("label"))),
      """SELECT e.vec_id AS id, e.label FROM embeddings e
        |WHERE e.embedding IS NOT NULL
        |  AND NOT EXISTS (
        |    SELECT 1 FROM embeddings b WHERE b.vec_id < e.vec_id
        |      AND ROUND(list_cosine_similarity(b.embedding::DOUBLE[],
        |        e.embedding::DOUBLE[]), 4) >= 0.9)""".stripMargin),
    // IVF-PQ composite ANN (FAISS IVFPQ shape): cell-pruned scan over
    // 8-byte PQ codes, ADC scoring — rows-only (approximate by design;
    // SimilaritySpec asserts nprobe=nlist bit-equality with pqTopK and
    // recall vs brute force)
    ("ann_ivfpq_topk",
      ((s, dir) => {
      val e = embs(s, dir)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val model = Quantization.trainPq(e, dim = 64, m = 8, k = 16,
        iters = 5, sampleSize = 1024)
      val q = e.filter(col("id") < 10).select(col("id").as("qid"), col("vec"))
      // aggregate recall floor vs brute force (IVF pruning on top of the
      // coarse PQ codes; measured 31-42/100 across SFs)
      totalRecallGate(Quantization.ivfPqTopK(q, e, model, k = 10,
          nlist = 16, nprobe = 4),
        Similarity.bruteForceTopK(q, e, k = 10), q, minTotal = 10)
    }),
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
        |  true AS recall_floor_ok
        |FROM embeddings WHERE vec_id < 10""".stripMargin),
    // Offline IVF RECENTROID — the index rebuild AnnIngest defers to:
    // two Lloyd iterations where assignment is the rounded-cosine/
    // lower-cell contract and the centroid update is an element-wise
    // mean over INTEGER-QUANTIZED coordinates (exact long sums — no
    // float summation-order nondeterminism), so the ENTIRE rebuild is
    // value-replayed by the oracle: per final cell, member count,
    // member-id sum, and two integer checksums of the final quantized
    // centroid.
    ("s3b_ann_recentroid",
      ((s, dir) => {
      import s.implicits._
      val e = embs(s, dir).na.drop(Seq("embedding"))
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val (assigned, q) = Similarity.recentroidQuantized(
        e, "id", "vec", nlist = 8, iters = 2)
      val checks = q.zipWithIndex.map { case (qs, cell) =>
        (cell, qs.sum,
          qs.zipWithIndex.map { case (v, p) => v * (p + 1) }.sum)
      }.toSeq.toDF("cell", "cq_sum", "cq_wsum")
      assigned.groupBy(col("cell"))
        .agg(count(lit(1)).as("n_vecs"), sum(col("id")).as("sum_ids"))
        .join(checks, Seq("cell"), "right")
        .na.fill(0L, Seq("n_vecs", "sum_ids"))
        .select(col("cell"), col("n_vecs"), col("sum_ids"),
          col("cq_sum"), col("cq_wsum"))
    }),
      // full value replay of both Lloyd iterations: assignment =
          // rounded-cosine argmax (ties to lower cell), update = floor(mean)
          // of round(x*1e4) integer coords, float-cast back — every step
          // order-free, so the engines agree exactly
      """WITH v AS (
        |  SELECT vec_id AS id, embedding::DOUBLE[] AS vec
        |  FROM embeddings WHERE embedding IS NOT NULL),
        |c0 AS (
        |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY id) - 1 AS INT)
        |    AS cell, vec
        |  FROM (SELECT id, vec FROM v ORDER BY id LIMIT 8)),
        |a1 AS (
        |  SELECT id, vec, cell FROM (
        |    SELECT v.id, v.vec, c.cell,
        |      ROW_NUMBER() OVER (PARTITION BY v.id
        |        ORDER BY ROUND(list_cosine_similarity(v.vec, c.vec), 6)
        |          DESC, c.cell) AS rk
        |    FROM v CROSS JOIN c0 c) WHERE rk = 1),
        |q1 AS (
        |  SELECT cell, gs.i AS pos,
        |    CAST(FLOOR(CAST(SUM(CAST(ROUND(vec[gs.i] * 10000) AS BIGINT))
        |      AS DOUBLE) / COUNT(*)) AS BIGINT) AS mq
        |  FROM a1 CROSS JOIN generate_series(1, 64) gs(i)
        |  GROUP BY 1, 2),
        |c1u AS (
        |  SELECT cell,
        |    list(CAST(mq / 10000.0 AS FLOAT)::DOUBLE ORDER BY pos) AS vec
        |  FROM q1 GROUP BY cell),
        |c1 AS (
        |  SELECT c0.cell, COALESCE(c1u.vec, c0.vec) AS vec
        |  FROM c0 LEFT JOIN c1u USING (cell)),
        |a2 AS (
        |  SELECT id, vec, cell FROM (
        |    SELECT v.id, v.vec, c.cell,
        |      ROW_NUMBER() OVER (PARTITION BY v.id
        |        ORDER BY ROUND(list_cosine_similarity(v.vec, c.vec), 6)
        |          DESC, c.cell) AS rk
        |    FROM v CROSS JOIN c1 c) WHERE rk = 1),
        |q2 AS (
        |  SELECT cell, gs.i AS pos,
        |    CAST(FLOOR(CAST(SUM(CAST(ROUND(vec[gs.i] * 10000) AS BIGINT))
        |      AS DOUBLE) / COUNT(*)) AS BIGINT) AS mq
        |  FROM a2 CROSS JOIN generate_series(1, 64) gs(i)
        |  GROUP BY 1, 2),
        |c2u AS (
        |  SELECT cell,
        |    list(CAST(mq / 10000.0 AS FLOAT)::DOUBLE ORDER BY pos) AS vec
        |  FROM q2 GROUP BY cell),
        |c2 AS (
        |  SELECT c1.cell, COALESCE(c2u.vec, c1.vec) AS vec
        |  FROM c1 LEFT JOIN c2u USING (cell)),
        |alast AS (
        |  SELECT id, cell FROM (
        |    SELECT v.id, c.cell,
        |      ROW_NUMBER() OVER (PARTITION BY v.id
        |        ORDER BY ROUND(list_cosine_similarity(v.vec, c.vec), 6)
        |          DESC, c.cell) AS rk
        |    FROM v CROSS JOIN c2 c) WHERE rk = 1),
        |agg AS (
        |  SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_vecs,
        |    CAST(SUM(id) AS BIGINT) AS sum_ids
        |  FROM alast GROUP BY cell),
        |chk AS (
        |  SELECT cell,
        |    CAST(SUM(CAST(ROUND(vec[gs.i] * 10000) AS BIGINT)) AS BIGINT)
        |      AS cq_sum,
        |    CAST(SUM(CAST(ROUND(vec[gs.i] * 10000) AS BIGINT) * gs.i)
        |      AS BIGINT) AS cq_wsum
        |  FROM c2 CROSS JOIN generate_series(1, 64) gs(i) GROUP BY cell)
        |SELECT c.cell, COALESCE(a.n_vecs, 0) AS n_vecs,
        |  COALESCE(a.sum_ids, 0) AS sum_ids, c.cq_sum, c.cq_wsum
        |FROM chk c LEFT JOIN agg a USING (cell)""".stripMargin),
    // HTML -> text extraction (the WET step of a crawl corpus): the
    // documents are wrapped in a deterministic HTML envelope (tags,
    // comments, script/style, encoded entities), then extracted; the
    // oracle replays both the wrap and the strip
    ("td_html_extract",
      ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        concat(
          lit("<html><head><title>T</title><style>p{color:red}</style>" +
            "</head><body><h1>"),
          col("source"),
          lit("</h1><!-- hidden --><p>"), substring(col("text"), 1, 200),
          lit(" &quot;A&#39;s&quot; &lt;tag&gt; B&amp;C</p>" +
            "<script>var x = 1 < 2;</script></body></html>")).as("html"))
        .select(col("doc_id"),
          TextFunctions.htmlToText(col("html")).as("text_clean"))),
      htmlExtractSql),
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
    // ROUGE-2 eval metrics: each doc's 200-char prefix scored as a
    // "summary" against the full text — distinct-bigram recall /
    // precision / F1, map-only per-row set arithmetic the oracle
    // replays with list functions
    ("td_rouge",
      ((s, dir) =>
      EvalMetrics.rougeN(
        docs(s, dir).select(col("doc_id"),
          substring(col("text"), 1, 200).as("cand"),
          col("text").as("ref")),
        "cand", "ref", n = 2)
        .select(col("doc_id"), col("n_cand"), col("n_ref"),
          col("n_overlap"), col("recall"), col("precision"), col("f1"))),
      """WITH pairs AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(range(1, len(cw)),
        |      i -> cw[i] || ' ' || cw[i + 1])) AS cs,
        |    list_distinct(list_transform(range(1, len(rw)),
        |      i -> rw[i] || ' ' || rw[i + 1])) AS rs
        |  FROM (
        |    SELECT doc_id,
        |      list_filter(string_split_regex(lower(substr(text, 1, 200)),
        |        '\s+'), w -> len(w) > 0) AS cw,
        |      list_filter(string_split_regex(lower(text), '\s+'),
        |        w -> len(w) > 0) AS rw
        |    FROM documents)),
        |m AS (
        |  SELECT doc_id,
        |    CAST(len(cs) AS BIGINT) AS n_cand,
        |    CAST(len(rs) AS BIGINT) AS n_ref,
        |    CAST(len(list_intersect(cs, rs)) AS BIGINT) AS n_overlap
        |  FROM pairs)
        |SELECT doc_id, n_cand, n_ref, n_overlap,
        |  CASE WHEN n_ref = 0 THEN 0.0
        |    ELSE ROUND(CAST(n_overlap AS DOUBLE) / n_ref, 6) END AS recall,
        |  CASE WHEN n_cand = 0 THEN 0.0
        |    ELSE ROUND(CAST(n_overlap AS DOUBLE) / n_cand, 6)
        |  END AS precision,
        |  CASE WHEN n_cand + n_ref = 0 THEN 0.0
        |    ELSE ROUND(CAST(n_overlap * 2 AS DOUBLE) / (n_cand + n_ref), 6)
        |  END AS f1
        |FROM m""".stripMargin),
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
    // BPE tokenizer training (Sennrich 2016): 20 merges learned over
    // the corpus-reduced word histogram (driver loop under the vocab
    // cutover, distributed merge iterations above it — bit-identical
    // paths), emitted as the oracle-checkable slice of the training
    // contract: the FIRST merge must be the exact most-frequent
    // adjacent symbol pair with the lexicographic tie-break (DuckDB
    // replays chars+'</w>' pair counting from the raw text), all 20
    // requested merges must be learned, and every learned frequency
    // must clear minPairCount. Later merges depend on iterative argmax
    // state no SQL engine expresses — those stay spec-pinned
    // (TokenizerSpec proves merge-for-merge parity with an independent
    // single-node reference implementation and cross-path equality).
    ("td_bpe_train",
      ((s, dir) => {
      val merges = Tokenizer.trainBpe(docs(s, dir), "text", numMerges = 20)
      val first = merges.head
      import s.implicits._
      Seq((merges.size.toLong, first.left, first.right, first.count,
          merges.forall(_.count >= 2)))
        .toDF("n_merges", "first_left", "first_right", "first_freq",
          "freqs_ok")
    }),
      """WITH w AS (
        |  SELECT word, CAST(COUNT(*) AS BIGINT) AS n FROM (
        |    SELECT unnest(string_split_regex(lower(text), '\s+')) AS word
        |    FROM documents)
        |  WHERE len(word) > 0 GROUP BY 1),
        |s AS (SELECT list_append(string_split(word, ''), '</w>') AS sy, n
        |      FROM w),
        |p AS (SELECT sy[i] AS l, sy[i+1] AS r, CAST(SUM(n) AS BIGINT) AS cnt
        |      FROM s, UNNEST(range(1, len(sy))) AS t(i)
        |      GROUP BY 1, 2)
        |SELECT CAST(20 AS BIGINT) AS n_merges, l AS first_left,
        |  r AS first_right, cnt AS first_freq, true AS freqs_ok
        |FROM p ORDER BY cnt DESC, l, r LIMIT 1""".stripMargin),
    // BPE ENCODE under a pinned merge table (the tokenize-the-corpus
    // step a training pipeline runs far more often than training): each
    // DISTINCT word is encoded once with the greedy lowest-rank-first
    // loop (vocab-sized work) and broadcast-joined back onto the token
    // stream. Pinning the merges as config — the deploy-time shape: a
    // tokenizer is trained once and shipped — is also what makes the
    // oracle exact: DuckDB replays the same greedy loop per distinct
    // word as a recursive CTE over the same literal merge list
    // tokenizer fertility eval: per-language tokens/word and
    // chars/token under the pinned BPE merge table — the standard
    // multilingual tokenizer-choice metric (a language whose fertility
    // runs high is under-served by the vocab). Pure composition:
    // docTokenCounts (vocab-sized greedy-encode work, broadcast back)
    // + a keys-sized per-language rollup; the oracle reuses the
    // recursive-CTE greedy replay and re-derives the ratios.
    ("td_tokenizer_fertility",
      ((s, dir) => {
        val d = docs(s, dir)
        d.select(col("doc_id"), col("lang"),
            length(col("text")).cast("long").as("chars"))
          .join(Tokenizer.docTokenCounts(d, "doc_id", "text",
            FixedBpeMerges), "doc_id")
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_words")).as("n_words"),
            sum(col("n_bpe_tokens")).as("n_bpe_tokens"),
            sum(col("chars")).as("n_chars"),
            round(sum(col("n_bpe_tokens")) / sum(col("n_words")), 4)
              .as("fertility"),
            round(sum(col("chars")) / sum(col("n_bpe_tokens")), 4)
              .as("chars_per_token"))
      }),
      {
      val ms = FixedBpeMerges.map(m => s"'${m.left}|${m.right}'")
        .mkString("[", ", ", "]")
      s"""WITH RECURSIVE
        |toks AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split_regex(lower(text), '\\s+'),
        |                       w -> len(w) > 0)) AS word
        |  FROM documents),
        |words AS (SELECT DISTINCT word FROM toks),
        |enc AS (
        |  SELECT word, list_append(string_split(word, ''), '</w>') AS syms
        |  FROM words
        |  UNION ALL
        |  SELECT word,
        |    syms[1:bi-1] || [syms[bi] || syms[bi+1]] || syms[bi+2:] AS syms
        |  FROM (
        |    SELECT word, syms,
        |      list_sort(list_filter(
        |        list_transform(range(1, len(syms)),
        |          i -> {'r': list_position($ms,
        |                  syms[i] || '|' || syms[i+1]), 'i': i}),
        |        x -> x.r > 0))[1].i AS bi
        |    FROM enc
        |  ) WHERE bi IS NOT NULL),
        |fixed AS (
        |  SELECT word, len(syms) AS n_bpe FROM enc
        |  WHERE len(list_filter(list_transform(range(1, len(syms)),
        |      i -> list_position($ms, syms[i] || '|' || syms[i+1])),
        |    r -> r > 0)) = 0),
        |perdoc AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
        |    CAST(SUM(n_bpe) AS BIGINT) AS n_bpe_tokens
        |  FROM toks JOIN fixed USING (word)
        |  GROUP BY doc_id)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_words) AS BIGINT) AS n_words,
        |  CAST(SUM(n_bpe_tokens) AS BIGINT) AS n_bpe_tokens,
        |  CAST(SUM(length(text)) AS BIGINT) AS n_chars,
        |  ROUND(CAST(SUM(n_bpe_tokens) AS DOUBLE)
        |    / CAST(SUM(n_words) AS DOUBLE), 4) AS fertility,
        |  ROUND(CAST(SUM(length(text)) AS DOUBLE)
        |    / CAST(SUM(n_bpe_tokens) AS DOUBLE), 4) AS chars_per_token
        |FROM perdoc JOIN documents USING (doc_id)
        |GROUP BY lang""".stripMargin
    }),
    ("td_bpe_encode",
      ((s, dir) =>
      Tokenizer.docTokenCounts(docs(s, dir), "doc_id", "text",
        FixedBpeMerges)),
      {
      // same pinned merge table as the Spark side, rendered once — the
      // two sides cannot drift
      val ms = FixedBpeMerges.map(m => s"'${m.left}|${m.right}'")
        .mkString("[", ", ", "]")
      s"""WITH RECURSIVE
        |toks AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split_regex(lower(text), '\\s+'),
        |                       w -> len(w) > 0)) AS word
        |  FROM documents),
        |words AS (SELECT DISTINCT word FROM toks),
        |enc AS (
        |  SELECT word, list_append(string_split(word, ''), '</w>') AS syms
        |  FROM words
        |  UNION ALL
        |  SELECT word,
        |    syms[1:bi-1] || [syms[bi] || syms[bi+1]] || syms[bi+2:] AS syms
        |  FROM (
        |    SELECT word, syms,
        |      list_sort(list_filter(
        |        list_transform(range(1, len(syms)),
        |          i -> {'r': list_position($ms,
        |                  syms[i] || '|' || syms[i+1]), 'i': i}),
        |        x -> x.r > 0))[1].i AS bi
        |    FROM enc
        |  ) WHERE bi IS NOT NULL),
        |fixed AS (
        |  SELECT word, len(syms) AS n_bpe FROM enc
        |  WHERE len(list_filter(list_transform(range(1, len(syms)),
        |      i -> list_position($ms, syms[i] || '|' || syms[i+1])),
        |    r -> r > 0)) = 0)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
        |  CAST(SUM(n_bpe) AS BIGINT) AS n_bpe_tokens
        |FROM toks JOIN fixed USING (word)
        |GROUP BY doc_id""".stripMargin
    }),
    // SentencePiece unigram-LM ENCODE (Kudo 2018) under the pinned
    // piece vocab: per-DISTINCT-WORD Viterbi (vocab-sized work, the
    // BPE-encode tier), best score + piece count gated per word. The
    // oracle brute-force ENUMERATES every segmentation path with the
    // same left-to-right additions, so max-score comparison is on
    // bit-identical doubles — a DP vs exhaustive-search cross-check,
    // not just a replay
    ("td_unigram_encode",
      ((s, dir) =>
      Tokenizer.unigramEncodeWords(docs(s, dir), "text",
        FixedUnigramVocab, UnigramFallback)
        .select(col("word"), round(col("score"), 4).as("score"),
          col("n_pieces").cast("long").as("n_pieces"))),
      (unigramCte +
      """SELECT d.word, ROUND(b.s, 4) AS score,
        |  CAST(MIN(d.np) AS BIGINT) AS n_pieces
        |FROM done d JOIN best b ON d.word = b.word AND d.score = b.s
        |GROUP BY d.word, b.s""".stripMargin)),
    // the corpus-level rollup of the unigram encode: per-doc word and
    // piece counts (integer sums — engine-exact at any grouping order)
    ("td_unigram_doc",
      ((s, dir) =>
      Tokenizer.docUnigramCounts(docs(s, dir), "doc_id", "text",
        FixedUnigramVocab, UnigramFallback)),
      (unigramCte +
      """SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
        |  CAST(SUM(wn.n_pieces) AS BIGINT) AS n_unigram_tokens
        |FROM (
        |  SELECT doc_id, unnest(list_filter(
        |    string_split_regex(lower(text), '\s+'),
        |    x -> len(x) > 0)) AS word
        |  FROM documents) toks
        |JOIN (
        |  SELECT d.word, CAST(MIN(d.np) AS BIGINT) AS n_pieces
        |  FROM done d JOIN best b ON d.word = b.word AND d.score = b.s
        |  GROUP BY d.word) wn USING (word)
        |GROUP BY doc_id""".stripMargin)),
    // WordPiece (BERT) greedy longest-match-first encode under the
    // pinned `##`-continuation vocab — the third tokenizer regime next
    // to BPE merge-ranks and unigram Viterbi, same vocab-sized encode
    // tier (per-DISTINCT-word work broadcast back onto the corpus).
    // Greedy is pure string matching (no floats), so the oracle replays
    // the exact longest-match chain: per-(word, position) best piece
    // lengths precomputed, then a recursive walk
    ("td_wordpiece_encode",
      ((s, dir) =>
      Tokenizer.docWordpieceCounts(docs(s, dir), "doc_id", "text",
        FixedWordpieceVocab)),
      // the same pinned vocab rendered once; greedy = per-(word, pos)
          // longest matching piece precomputed (grouped by continuation
          // kind), then a recursive walk following exactly one edge per step
      {
      val vals = duckList(FixedWordpieceVocab)
      s"""WITH RECURSIVE vocab AS (SELECT unnest($vals) AS p),
         |vp AS (
         |  SELECT (p LIKE '##%') AS cont,
         |    CASE WHEN p LIKE '##%' THEN substr(p, 3) ELSE p END AS raw
         |  FROM vocab),
         |words AS (
         |  SELECT DISTINCT unnest(list_filter(
         |    string_split_regex(lower(text), '\\s+'),
         |    x -> len(x) > 0)) AS word
         |  FROM documents),
         |pos AS (SELECT word, unnest(range(0, len(word))) AS i FROM words),
         |best AS (
         |  SELECT p.word, p.i, v.cont, MAX(len(v.raw)) AS plen
         |  FROM pos p JOIN vp v
         |    ON substr(p.word, p.i + 1, len(v.raw)) = v.raw
         |  GROUP BY 1, 2, 3),
         |walk AS (
         |  SELECT word, 0 AS pos, 0 AS np FROM words
         |  UNION ALL
         |  SELECT w.word, w.pos + b.plen, w.np + 1
         |  FROM walk w JOIN best b ON b.word = w.word AND b.i = w.pos
         |    AND b.cont = (w.pos > 0)
         |  WHERE w.pos < len(w.word)),
         |enc AS (SELECT word, np FROM walk WHERE pos = len(word)),
         |dt AS (
         |  SELECT doc_id, unnest(list_filter(
         |    string_split_regex(lower(text), '\\s+'),
         |    x -> len(x) > 0)) AS word
         |  FROM documents)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
         |  CAST(SUM(COALESCE(np, 1)) AS BIGINT) AS n_pieces,
         |  CAST(SUM(CASE WHEN np IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_unk_words
         |FROM dt LEFT JOIN enc USING (word)
         |GROUP BY doc_id""".stripMargin
    }),
    // PMI collocations over adjacent word bigrams (Church & Hanks):
    // support-filtered bigram scores against the unigram expectation.
    // Two hash aggregations + a broadcast totals row; the support
    // filter cuts the pair set BEFORE the word-count joins. Only ln in
    // the score — oracle-exact before the display round
    ("td_pmi",
      ((s, dir) =>
      Collocations.pmiBigrams(docs(s, dir), "text", minCount = 20L)),
      // same count pipeline, same ln association; totals from the raw
          // streams (pre-support-filter), `+ 0.0` for IEEE -0.0
      (wordsOnlyCte +
      """, uni AS (SELECT unnest(w) AS t FROM ws),
        |uc AS (SELECT t, COUNT(*) AS c FROM uni GROUP BY 1),
        |bg AS (
        |  SELECT unnest(list_transform(range(1, len(w)),
        |    i -> w[i] || ' ' || w[i + 1])) AS b
        |  FROM ws WHERE len(w) >= 2),
        |bc AS (SELECT b, COUNT(*) AS cb FROM bg GROUP BY 1
        |  HAVING COUNT(*) >= 20),
        |tot AS (SELECT (SELECT COUNT(*) FROM uni) AS nu,
        |  (SELECT COUNT(*) FROM bg) AS nb)
        |SELECT b AS bigram, CAST(cb AS BIGINT) AS cb,
        |  CAST(u1.c AS BIGINT) AS c1, CAST(u2.c AS BIGINT) AS c2,
        |  ROUND(LN(
        |    (CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE)) /
        |    ((CAST(u1.c AS DOUBLE) / CAST(nu AS DOUBLE)) *
        |     (CAST(u2.c AS DOUBLE) / CAST(nu AS DOUBLE)))), 4) + 0.0
        |    AS pmi
        |FROM bc JOIN uc u1 ON u1.t = string_split(b, ' ')[1]
        |JOIN uc u2 ON u2.t = string_split(b, ' ')[2], tot""".stripMargin)),
    // BLEU-2 eval metrics in log space with CLIPPED (multiset) n-gram
    // counts — the real BLEU overlap next to td_rouge's distinct-set
    // recall. Candidate = the doc's own token stream with every 11th
    // word replaced by 'the' and every 7th dropped (deterministic
    // corruption both engines replay), reference = the original words;
    // only ln appears (never exp), so the log-BLEU doubles are
    // bit-identical before the display round
    ("td_bleu",
      ((s, dir) => {
      val w = TextFunctions.words(col("text"))
      val sub = transform(w, (t, i) =>
        when(pmod(i + 1, lit(11)) === 0, lit("the")).otherwise(t))
      val cand = filter(sub, (t, i) => pmod(i + 1, lit(7)) =!= 0)
      EvalMetrics.bleu2Log(
        docs(s, dir).select(col("doc_id"), cand.as("cand"), w.as("ref")),
        "doc_id", "cand", "ref")
    }),
      // tokens indexed once (1-based i = Spark's 0-based index + 1);
          // candidate bigrams re-sequence over the FILTERED stream via lead()
          // — matching the Spark side's post-filter array adjacency. The `+
          // 0.0` normalizes IEEE -0.0 (the td_dsir precedent).
      (wordsOnlyCte +
      """, idx AS (
        |  SELECT doc_id, w, len(w) AS n_ref,
        |    unnest(range(1, len(w) + 1)) AS i
        |  FROM ws),
        |tok AS (
        |  SELECT doc_id, i,
        |    CASE WHEN i % 11 = 0 THEN 'the' ELSE w[i] END AS t
        |  FROM idx),
        |candtok AS (SELECT doc_id, i, t FROM tok WHERE i % 7 <> 0),
        |cn AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_cand
        |  FROM candtok GROUP BY 1),
        |cgrams AS (
        |  SELECT doc_id, '1:' || t AS g FROM candtok
        |  UNION ALL
        |  SELECT doc_id, '2:' || t || ' ' || nxt AS g FROM (
        |    SELECT doc_id, t,
        |      LEAD(t) OVER (PARTITION BY doc_id ORDER BY i) AS nxt
        |    FROM candtok) WHERE nxt IS NOT NULL),
        |rgrams AS (
        |  SELECT doc_id, '1:' || unnest(w) AS g FROM ws
        |  UNION ALL
        |  SELECT doc_id, '2:' || unnest(list_transform(range(1, len(w)),
        |    i -> w[i] || ' ' || w[i + 1])) AS g
        |  FROM ws WHERE len(w) >= 2),
        |cc AS (SELECT doc_id, g, COUNT(*) AS nc FROM cgrams GROUP BY 1, 2),
        |rc AS (SELECT doc_id, g, COUNT(*) AS nr FROM rgrams GROUP BY 1, 2),
        |cl AS (
        |  SELECT doc_id,
        |    SUM(CASE WHEN g LIKE '1:%' THEN LEAST(nc, nr) ELSE 0 END)
        |      AS clip1,
        |    SUM(CASE WHEN g LIKE '2:%' THEN LEAST(nc, nr) ELSE 0 END)
        |      AS clip2
        |  FROM cc JOIN rc USING (doc_id, g) GROUP BY 1)
        |SELECT ws.doc_id,
        |  COALESCE(cn.n_cand, 0) AS n_cand,
        |  CAST(len(ws.w) AS BIGINT) AS n_ref,
        |  CAST(COALESCE(cl.clip1, 0) AS BIGINT) AS clip1,
        |  CAST(COALESCE(cl.clip2, 0) AS BIGINT) AS clip2,
        |  CASE WHEN COALESCE(cn.n_cand, 0) < 2
        |      OR COALESCE(cl.clip1, 0) = 0 OR COALESCE(cl.clip2, 0) = 0
        |    THEN NULL
        |    ELSE ROUND(
        |      LEAST(0.0, 1.0 - CAST(len(ws.w) AS DOUBLE) /
        |        CAST(cn.n_cand AS DOUBLE)) +
        |      0.5 * (LN(CAST(cl.clip1 AS DOUBLE) /
        |               CAST(cn.n_cand AS DOUBLE)) +
        |             LN(CAST(cl.clip2 AS DOUBLE) /
        |               CAST(cn.n_cand - 1 AS DOUBLE))), 4) + 0.0
        |  END AS log_bleu
        |FROM ws LEFT JOIN cn USING (doc_id) LEFT JOIN cl USING (doc_id)"""
        .stripMargin)),
    // corpus statistics card: one ROLLUP pass publishes the per-
    // (source, lang), per-source, and grand-total doc/char/token
    // counts a data team reports with every corpus release. ROLLUP is
    // partial-aggregation-friendly (each level is a re-aggregation of
    // the finer one, all map-side combinable) — one shuffle keyed on
    // the grouping tuple regardless of corpus size
    ("td_corpus_stats",
      ((s, dir) =>
      docs(s, dir)
        .select(col("source"), col("lang"), col("n_chars"),
          TextFunctions.tokenCountWs(col("text")).as("n_words"))
        .rollup(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          sum(col("n_words").cast("long")).as("total_words"),
          round(avg(col("n_words")), 2).as("avg_words"))
        .select(coalesce(col("source"), lit("(all)")).as("source"),
          coalesce(col("lang"), lit("(all)")).as("lang"),
          col("n_docs"), col("total_chars"), col("total_words"),
          col("avg_words"))),
      """SELECT COALESCE(source, '(all)') AS source,
        |  COALESCE(lang, '(all)') AS lang,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  CAST(SUM(n_words) AS BIGINT) AS total_words,
        |  ROUND(AVG(n_words), 2) AS avg_words
        |FROM (SELECT source, lang, n_chars,
        |        len(list_filter(string_split_regex(lower(text), '\s+'),
        |            w -> len(w) > 0)) AS n_words
        |      FROM documents)
        |GROUP BY ROLLUP(source, lang)""".stripMargin),
    // multimodal: metadata extraction over binary media column
    // multimodal: MP4 SAMPLE TABLES — real ISO-BMFF container parsing
    // (stsd codec+dims, stts timestamps, stsc/stco/stsz byte ranges)
    // over muxer-built single-track videos; every sample's offset, size,
    // timestamp, and the FIRST BYTE READ THROUGH THE PARSED OFFSET are
    // replayed by the oracle from the deterministic generation formulas
    // (mdat payload starts at 527 + 4n — the muxer's documented layout
    // constant). This is the container half of video frame-sampling; the
    // codec decode of a located sample stays the declared stub.
    ("mm_mp4_samples",
      ((s, dir) => {
      import s.implicits._
      val media = docs(s, dir).filter(col("doc_id") % 3 === 0)
        .select(col("doc_id")).as[Long]
        .map { id =>
          val n = 1 + (id % 5).toInt
          val sizes = (0 until n).map(k => 1 + ((id + k) % 9).toInt)
          val bytes = sizes.zipWithIndex.flatMap { case (sz, k) =>
            Array.fill(sz)(((id * 7 + k * 13) % 256).toByte) }.toArray
          (id, Multimodal.MediaFixtures.mp4TrackBytes(
            id % 100 + 1, 16 + (id % 64).toInt, 16 + ((id * 3) % 64).toInt,
            600L, 30 + (id % 60), sizes, bytes))
        }.toDF("media_id", "media")
      Multimodal.Mp4Tracks.sampleTable(media)
    }),
      """WITH m AS (
        |  SELECT doc_id, 1 + (doc_id % 5) AS n, 30 + (doc_id % 60) AS delta
        |  FROM documents WHERE doc_id % 3 = 0),
        |s AS (
        |  SELECT doc_id, n, delta, k
        |  FROM m, (SELECT UNNEST(range(0, 5)) AS k) r WHERE k < n)
        |SELECT doc_id AS media_id,
        |  CAST(doc_id % 100 + 1 AS BIGINT) AS track_id,
        |  'avc1' AS codec,
        |  CAST(16 + (doc_id % 64) AS INT) AS width,
        |  CAST(16 + ((doc_id * 3) % 64) AS INT) AS height,
        |  CAST(k AS INT) AS sample_idx,
        |  CAST(527 + 4 * n + COALESCE(list_sum(list_transform(range(0, k),
        |    j -> 1 + ((doc_id + j) % 9))), 0) AS BIGINT) AS "offset",
        |  CAST(1 + ((doc_id + k) % 9) AS BIGINT) AS size,
        |  CAST((k * delta * 1000) // 600 AS BIGINT) AS pts_ms,
        |  CAST((doc_id * 7 + k * 13) % 256 AS INT) AS first_byte
        |FROM s""".stripMargin),

    ("mm_meta",
      ((s, dir) =>
      Multimodal.extractMeta(Multimodal.synthesize(docs(s, dir)))
        .select(col("media_id"), col("meta.format").as("format"),
          col("meta.width").as("width"), col("meta.height").as("height"),
          col("meta.duration_ms").as("duration_ms"),
          col("meta.size_bytes").as("size_bytes"))),
      """SELECT doc_id AS media_id,
        |  CASE doc_id % 4 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png'
        |    WHEN 2 THEN 'wav' ELSE 'mp4' END AS format,
        |  CASE WHEN doc_id % 4 IN (0, 1)
        |    THEN CAST(64 + doc_id % 1024 AS INT) END AS width,
        |  CASE WHEN doc_id % 4 IN (0, 1)
        |    THEN CAST(64 + (doc_id * 7) % 1024 AS INT) END AS height,
        |  CASE
        |    WHEN doc_id % 4 = 2 THEN
        |      (CAST(strlen(text) AS BIGINT) * 100 * 1000)
        |        // ((8000 + (doc_id % 5) * 8000) * (1 + doc_id % 2) * 2)
        |    WHEN doc_id % 4 = 3 THEN CAST(strlen(text) AS BIGINT) * 50
        |  END AS duration_ms,
        |  CAST(strlen(text) AS BIGINT) +
        |    CASE doc_id % 4 WHEN 0 THEN 41 WHEN 1 THEN 45
        |      WHEN 2 THEN 44 ELSE 136 END AS size_bytes
        |FROM documents""".stripMargin),
    // multimodal: perceptual image dedup — REAL pixel decode → dHash →
    // the same pigeonhole Hamming pairing as text simhash. Planted
    // twins (PNG original + JPEG re-encode of the same pattern) have
    // different bytes but near-identical pixels; exact/byte dedup
    // cannot catch them, dHash must — and on a deterministic doc_id
    // subset the expected twin-pair list is pure id arithmetic, so the
    // oracle replays it exactly (measured: every planted twin lands at
    // hamming <= 3 at all three SFs — a brightness shift flips dHash
    // bits only where clamping flattens a gradient). Pixel decode
    // itself stays spec-pinned (not SQL-replayable).
    ("dedup_image",
      ((s, dir) =>
      Dedup.fingerprintPairs(
        Multimodal.imageDHash(
          Multimodal.synthesizeImageTwins(
            docs(s, dir).filter(col("doc_id") % 17 === 0)))
          .select(col("media_id").as("id"), col("dhash").as("fp")),
        maxHamming = 3, numChunks = 4)
        .filter(col("id_b") === col("id_a") + 1000000L)
        .select(col("id_a"), col("id_b"))),
      """SELECT doc_id AS id_a, doc_id + 1000000 AS id_b
        |FROM documents WHERE doc_id % 17 = 0""".stripMargin),
    // multimodal: REAL WAV/PCM audio decode (JDK javax.sound.sampled) —
    // per-file sample stats (the silence/clipping/length gates an audio
    // corpus filters on); the oracle recomputes every int16 sample from
    // the payload bytes (hex-string byte extraction) and replays
    // rms/peak exactly
    ("mm_audio",
      ((s, dir) =>
      Multimodal.audioStats(Multimodal.synthesize(docs(s, dir)))),
      // the oracle recomputes what the REAL header parsers must read back
          // from the deterministic fixture headers (doc_id-derived dims/rates,
          // UTF-8 payload bytes appended after a fixed-size header)
      """WITH wav AS (
        |  SELECT doc_id, hex(encode(text)) AS hx,
        |    CAST(1 + doc_id % 2 AS INTEGER) AS channels,
        |    CAST(8000 + (doc_id % 5) * 8000 AS INTEGER) AS sample_rate
        |  FROM documents WHERE doc_id % 4 = 2),
        |s AS (
        |  SELECT doc_id, channels, sample_rate,
        |    ((len(hx) // 2) // (2 * channels)) * channels AS nsamples, hx
        |  FROM wav),
        |sam AS (
        |  SELECT doc_id, channels, sample_rate, nsamples,
        |    list_transform(range(0, nsamples), k ->
        |      CASE WHEN CAST(('0x' || substr(hx, 4*k+3, 2)
        |                        || substr(hx, 4*k+1, 2)) AS INT) >= 32768
        |        THEN CAST(('0x' || substr(hx, 4*k+3, 2)
        |                     || substr(hx, 4*k+1, 2)) AS INT) - 65536
        |        ELSE CAST(('0x' || substr(hx, 4*k+3, 2)
        |                     || substr(hx, 4*k+1, 2)) AS INT) END) AS ss
        |  FROM s)
        |SELECT doc_id AS media_id, sample_rate, channels,
        |  CAST(nsamples AS BIGINT) AS n_samples,
        |  ROUND(CASE WHEN nsamples = 0 THEN 0.0
        |    ELSE sqrt(list_sum(list_transform(ss,
        |           x -> CAST(x AS DOUBLE) * x)) / nsamples) END, 2) AS rms,
        |  CAST(COALESCE(list_max(list_transform(ss, x -> abs(x))), 0)
        |    AS INTEGER) AS peak
        |FROM sam""".stripMargin),
    // multimodal: frame sampling with REAL image decode (JDK ImageIO) —
    // image rows yield the full packed-RGB raster + a 16x16 thumbnail
    // (so frame_bytes = w*h*3 + 768, oracle-recomputable from doc_id);
    // wav/mp4 rows keep the declared FakeCodec slices (lengths are a
    // pure function of the payload size, also oracle-recomputable)
    ("mm_frames",
      ((s, dir) =>
      Multimodal.sampleFrames(Multimodal.synthesizeDecodable(docs(s, dir)))
        .groupBy(col("media_id"))
        .agg(count(lit(1)).as("n_frames"),
          sum(length(col("frame"))).as("frame_bytes"))),
      // image rows: ImageIO-decoded raster (w*h*3) + 16x16 thumbnail (768);
          // av rows: 3 FakeCodec slices, each min(16, L - (idx*7 % L)) bytes
          // of an L-byte file (payload + fixed header)
      """WITH m AS (
        |  SELECT doc_id,
        |    8 + doc_id % 32 AS w,
        |    8 + (doc_id * 7) % 32 AS h,
        |    CAST(strlen(text) AS BIGINT) +
        |      CASE WHEN doc_id % 4 = 2 THEN 44 ELSE 136 END AS L,
        |    ((CAST(strlen(text) AS BIGINT) // (2 * (1 + doc_id % 2)))
        |      * (1 + doc_id % 2)) AS ns
        |  FROM documents)
        |SELECT doc_id AS media_id,
        |  CAST(CASE WHEN doc_id % 4 IN (0, 1) THEN 2
        |    WHEN doc_id % 4 = 2 THEN
        |      (CASE WHEN ns > 0 THEN 1 ELSE 0 END) +
        |      (CASE WHEN ns > 64 THEN 1 ELSE 0 END) +
        |      (CASE WHEN ns > 128 THEN 1 ELSE 0 END)
        |    ELSE 3 END AS BIGINT) AS n_frames,
        |  CAST(CASE WHEN doc_id % 4 IN (0, 1) THEN w * h * 3 + 768
        |    WHEN doc_id % 4 = 2 THEN
        |      2 * least(16, ns) +
        |      (CASE WHEN ns > 64 THEN 2 * least(16, ns - 64) ELSE 0 END) +
        |      (CASE WHEN ns > 128 THEN 2 * least(16, ns - 128) ELSE 0 END)
        |    ELSE least(16, L) + least(16, L - (28 % L)) + least(16, L - (56 % L))
        |    END AS BIGINT) AS frame_bytes
        |FROM m""".stripMargin),
    // SFT conversation assembly: gap-sessionize each user's events,
    // render every event as a templated turn, keep the prefix of turns
    // that fits the token budget, drop sub-2-turn conversations, and
    // emit the transcript — the record a chat-template tokenizer
    // consumes. Whole pipeline (sessionize, per-conv running token sum,
    // ordered render) replays in SQL; the epoch-second gap test is
    // floor-exact in both engines.
    ("td_sft_assemble",
      ((s, dir) => graft.operators.Conversations.assemble(
        s.read.parquet(s"$dir/events.parquet"), gapMinutes = 1440)),
      """WITH t AS (
        |  SELECT user_id, ts, event_id,
        |    event_type || ' value=' ||
        |      CAST(ROUND(value * 100) AS BIGINT) || ' k=' ||
        |      CAST(json_extract_string(props, '$.k') AS BIGINT)
        |      AS turn_text
        |  FROM events),
        |s AS (
        |  SELECT *, CASE WHEN lag(ts) OVER w IS NULL
        |      OR CAST(epoch(ts) AS BIGINT)
        |        - CAST(epoch(lag(ts) OVER w) AS BIGINT) > 86400
        |    THEN 1 ELSE 0 END AS new_conv
        |  FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |c AS (
        |  SELECT *, SUM(new_conv) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS conv,
        |    len(string_split(turn_text, ' ')) AS turn_tokens
        |  FROM s),
        |x AS (
        |  SELECT *, SUM(turn_tokens) OVER (PARTITION BY user_id, conv
        |      ORDER BY ts, event_id) AS cum,
        |    COUNT(*) OVER (PARTITION BY user_id, conv) AS all_turns
        |  FROM c)
        |SELECT CAST(user_id AS VARCHAR) || '-' || CAST(conv AS VARCHAR)
        |    AS conv_id,
        |  user_id, COUNT(*) AS n_turns, MAX(all_turns) AS all_turns,
        |  SUM(turn_tokens) AS total_tokens,
        |  MAX(all_turns) > COUNT(*) AS truncated,
        |  string_agg(turn_text, ' | ' ORDER BY ts, event_id) AS text
        |FROM x WHERE cum <= 30
        |GROUP BY user_id, conv HAVING COUNT(*) >= 2""".stripMargin),
    // preference-pair assembly (the DPO/RLHF reward-pair shape): per
    // (user, day) candidate group the highest- and lowest-scored events
    // become (chosen, rejected); tied extremes are skipped (no
    // preference signal); exact integer-cent margins
    ("td_pref_pairs",
      ((s, dir) => graft.operators.Conversations.preferencePairs(
        s.read.parquet(s"$dir/events.parquet"))),
      """WITH e AS (
        |  SELECT user_id, event_id,
        |    CAST(ROUND(value * 100) AS BIGINT) AS cents,
        |    strftime(ts, '%Y-%m-%d') AS day
        |  FROM events),
        |r AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, day
        |      ORDER BY cents DESC, event_id) AS rn_hi,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, day
        |      ORDER BY cents ASC, event_id) AS rn_lo,
        |    COUNT(*) OVER (PARTITION BY user_id, day) AS n
        |  FROM e),
        |g AS (
        |  SELECT user_id, day,
        |    MAX(CASE WHEN rn_hi = 1 THEN event_id END) AS chosen_id,
        |    MAX(CASE WHEN rn_hi = 1 THEN cents END) AS chosen_cents,
        |    MAX(CASE WHEN rn_lo = 1 THEN event_id END) AS rejected_id,
        |    MAX(CASE WHEN rn_lo = 1 THEN cents END) AS rejected_cents,
        |    MAX(n) AS n_candidates
        |  FROM r WHERE rn_hi = 1 OR rn_lo = 1
        |  GROUP BY user_id, day)
        |SELECT CAST(user_id AS VARCHAR) || '-' || day AS pair_id,
        |  user_id, day, chosen_id, rejected_id,
        |  chosen_cents - rejected_cents AS margin_cents, n_candidates
        |FROM g WHERE chosen_cents > rejected_cents""".stripMargin),
    // margin-based pair mining (the LASER/CCMatrix bitext recipe): the
    // label-parity halves of the embeddings table play the two
    // "languages"; a pair's score is its cosine over the mean of both
    // endpoints' top-4 neighborhoods, which discounts hubs. Integer-sum
    // neighborhood averages + rounded margins make the mining replay
    // exactly in SQL.
    ("emb_margin_mining",
      ((s, dir) => {
        val e = embs(s, dir)
        Similarity.marginMining(
          e.filter(col("label") % 2 === 0)
            .select(col("vec_id").as("xid"), col("embedding").as("vec")),
          e.filter(col("label") % 2 === 1)
            .select(col("vec_id").as("yid"), col("embedding").as("vec")),
          k = 4, minMargin = 1.02)
      }),
      marginMiningOracle),
    // the IVF-celled margin-mining scale path, driven at nprobe=nlist
    // where the cell routing is PROVABLY lossless (every pair is a
    // candidate) — so the oracle is the very same all-pairs SQL, and
    // the gate proves the cell-assign/probe/join machinery changes
    // nothing. The pruned form's recall is spec-gated on planted
    // clusters (ConversationsSpec).
    ("emb_margin_mining_ivf",
      ((s, dir) => {
        val e = embs(s, dir)
        Similarity.marginMiningIvf(
          e.filter(col("label") % 2 === 0)
            .select(col("vec_id").as("xid"), col("embedding").as("vec")),
          e.filter(col("label") % 2 === 1)
            .select(col("vec_id").as("yid"), col("embedding").as("vec")),
          k = 4, minMargin = 1.02, nlist = 8, nprobe = 8)
      }),
      marginMiningOracle),
    // the BOTH-SIDES-HUGE margin-mining form: same cell routing, but
    // the candidate join shuffles on the cell key instead of
    // broadcasting the probed side — no vector set need fit anywhere.
    // Driven at nprobe=nlist (lossless), so the same all-pairs SQL is
    // again the exact oracle; PlanShapeSpec pins the no-broadcast
    // plan shape.
    ("emb_margin_mining_cells",
      ((s, dir) => {
        val e = embs(s, dir)
        Similarity.marginMiningCells(
          e.filter(col("label") % 2 === 0)
            .select(col("vec_id").as("xid"), col("embedding").as("vec")),
          e.filter(col("label") % 2 === 1)
            .select(col("vec_id").as("yid"), col("embedding").as("vec")),
          k = 4, minMargin = 1.02, nlist = 8, nprobe = 8)
      }),
      marginMiningOracle))

  val queries: Map[String, Q] =
    gated.map(g => (g._1, g._2)).toMap

  val oracles: Map[String, String] =
    gated.map(g => (g._1, g._3)).toMap
}

package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.functions.expressions.SimHash64
import graft.operators.{Collocations, Dedup, EvalMetrics, FilterFunnel, Multimodal, QualityClassifier, Quantization, Sampling, Similarity, TextQuality, Tokenizer, UrlFilter}

/** Shared helpers + DuckDB oracle CTE fragments for the QueriesTd*
  * family registries (split from [[QueriesTrainingData]], round 12):
  * table readers, recall gates, pinned tokenizer vocabularies, and the
  * text-prep/DSIR/jaccard/margin oracle SQL chains used by gates in
  * more than one family.
  */
private[graft] object QueriesTdShared {
  import Queries.Q

  private[graft] def docs(s: org.apache.spark.sql.SparkSession, dir: String) =
    s.read.parquet(s"$dir/documents.parquet")
  private[graft] def embs(s: org.apache.spark.sql.SparkSession, dir: String) =
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
  private[graft] val UrlHosts = Seq(
    "news.example.com", "blog.sample.org", "spam.bad-site.com",
    "tracker.ads-network.net", "docs.example.com", "shop.example.co.uk",
    "mirror.bad-site.com", "wiki.opencorpus.org")
  private[graft] val UrlPaths = Seq(
    "/articles/", "/ads/banner/", "/posts/", "/guide/", "/click/")

  /** DuckDB list literal from a Scala string seq. */
  private[graft] def duckList(xs: Seq[String]): String =
    xs.map(x => s"'$x'").mkString("[", ", ", "]")

  /** Synthetic messy URL for a doc: the embedded page number is
    * `pageId` (vary it per doc for the canon gate; fold it mod K so
    * K docs share a page for the URL-dedup gate) while the
    * scheme-case / default-port / trailing-slash / tracking-param /
    * fragment variants cycle on the RAW id. Shared by `td_url_canon`
    * and `dedup_url`. */
  private[graft] def syntheticUrl(id: org.apache.spark.sql.Column,
      pageId: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(
      element_at(array(lit("https://"), lit("HTTPS://"), lit("http://")),
        pmod(id, lit(3)).cast("int") + 1),
      element_at(typedLit(UrlHosts), (pmod(id, lit(8)) + 1).cast("int")),
      element_at(array(lit(""), lit(":443"), lit(":80")),
        pmod(id, lit(3)).cast("int") + 1),
      element_at(typedLit(UrlPaths), (pmod(id, lit(5)) + 1).cast("int")),
      pageId,
      element_at(array(lit("/"), lit("")),
        pmod(id, lit(2)).cast("int") + 1),
      element_at(array(lit("?utm_source=x&q=1"),
        lit("?q=2&utm_campaign=y&gclid=g1"),
        lit("?fbclid=f&utm_medium=z"), lit("")),
        pmod(id, lit(4)).cast("int") + 1),
      element_at(array(lit("#frag"), lit("")),
        pmod(id, lit(2)).cast("int") + 1))

  /** The matching DuckDB `u(doc_id, url)` CTE body (no `WITH`):
    * `pageSql` is the SQL expression for the embedded page number. */
  private[graft] def syntheticUrlCte(pageSql: String): String =
    s"""u AS (
       |  SELECT doc_id,
       |    (CASE doc_id % 3 WHEN 0 THEN 'https://' WHEN 1 THEN 'HTTPS://'
       |       ELSE 'http://' END)
       |    || ${duckList(UrlHosts)}[CAST(doc_id % 8 AS INT) + 1]
       |    || (CASE doc_id % 3 WHEN 0 THEN '' WHEN 1 THEN ':443'
       |          ELSE ':80' END)
       |    || ${duckList(UrlPaths)}[CAST(doc_id % 5 AS INT) + 1]
       |    || $pageSql
       |    || (CASE doc_id % 2 WHEN 0 THEN '/' ELSE '' END)
       |    || (CASE doc_id % 4 WHEN 0 THEN '?utm_source=x&q=1'
       |          WHEN 1 THEN '?q=2&utm_campaign=y&gclid=g1'
       |          WHEN 2 THEN '?fbclid=f&utm_medium=z' ELSE '' END)
       |    || (CASE doc_id % 2 WHEN 0 THEN '#frag' ELSE '' END) AS url
       |  FROM documents)""".stripMargin

  /** The canonical-URL rewrite replayed in SQL, continuing from a
    * `u(doc_id, url)` CTE and ending in `cu(doc_id, url, canon)` —
    * byte-for-byte the [[graft.operators.UrlFilter.canonicalUrl]]
    * semantics (fragment drop, scheme/authority lowercase,
    * default-port strip, trailing-slash trim, tracking-param
    * removal). */
  private[graft] val urlCanonChainSql =
    """st AS (
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
      |canon0 AS (
      |  SELECT doc_id, url, shp,
      |    CASE WHEN p LIKE '%/' AND length(p) > 1
      |         THEN substr(p, 1, length(p) - 1) ELSE p END AS p2,
      |    list_filter(string_split(qs, '&'), x -> len(x) > 0
      |      AND NOT regexp_matches(x,
      |        '^(utm_[A-Za-z0-9_]+|gclid|fbclid|msclkid|ttclid|mc_eid)='))
      |      AS ps
      |  FROM pq),
      |cu AS (
      |  SELECT doc_id, url,
      |    shp || p2 || (CASE WHEN len(ps) > 0
      |      THEN '?' || array_to_string(ps, '&') ELSE '' END) AS canon
      |  FROM canon0)""".stripMargin

  /** Unigram-encode oracle CTE chain: enumerate EVERY segmentation
    * path of every distinct corpus word under the pinned vocab
    * (feasible because the synthetic vocabulary is small), with the
    * same left-to-right log-prob additions the Spark DP performs —
    * `done` holds every complete path's (score, piece count), `best`
    * the per-word max score. */
  private[graft] lazy val unigramCte = {
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
  private[graft] val wordsOnlyCte =
    """WITH ws AS (
      |  SELECT doc_id, lang, source, n_chars, text,
      |    list_filter(string_split_regex(lower(text), '\s+'),
      |                w -> len(w) > 0) AS w
      |  FROM documents)
      |""".stripMargin

  /** Shared DoReMi CTE chain (td_domain_reweight + td_epoch_schedule):
    * per-language mean-word-length-micro losses, clipped excess over
    * the global mean in bp of the worst domain, and three integer
    * multiplicative-weight rounds — ends in `n3(domain, n_docs,
    * mean_loss, excess_bp, w0..w3, ...)`. */
  private[graft] val doremiCore = wordsOnlyCte +
    """, l AS (
      |  SELECT lang,
      |    CAST(length(text) AS BIGINT) * 1000000
      |      // GREATEST(CAST(len(w) AS BIGINT), 1) AS loss
      |  FROM ws),
      |m AS (
      |  SELECT lang AS domain, COUNT(*) AS n_docs,
      |    CAST(SUM(loss) AS BIGINT) AS sl
      |  FROM l GROUP BY 1),
      |e0 AS (
      |  SELECT domain, n_docs, sl // n_docs AS mean_loss,
      |    CAST(SUM(sl) OVER () AS BIGINT)
      |      // CAST(SUM(n_docs) OVER () AS BIGINT) AS gmean,
      |    COUNT(*) OVER () AS nd
      |  FROM m),
      |e1 AS (SELECT *, GREATEST(mean_loss - gmean, 0) AS excess FROM e0),
      |e2 AS (
      |  SELECT *, CASE WHEN MAX(excess) OVER () > 0
      |      THEN excess * 10000 // MAX(excess) OVER () ELSE 0 END
      |      AS excess_bp,
      |    10000 // nd AS w0
      |  FROM e1),
      |i1 AS (SELECT *, w0 * (10000 + 2000 * excess_bp // 10000) AS r1
      |       FROM e2),
      |n1 AS (SELECT *, r1 * 10000
      |    // GREATEST(CAST(SUM(r1) OVER () AS BIGINT), 1) AS w1 FROM i1),
      |i2 AS (SELECT *, w1 * (10000 + 2000 * excess_bp // 10000) AS r2
      |       FROM n1),
      |n2 AS (SELECT *, r2 * 10000
      |    // GREATEST(CAST(SUM(r2) OVER () AS BIGINT), 1) AS w2 FROM i2),
      |i3 AS (SELECT *, w2 * (10000 + 2000 * excess_bp // 10000) AS r3
      |       FROM n2),
      |n3 AS (SELECT *, r3 * 10000
      |    // GREATEST(CAST(SUM(r3) OVER () AS BIGINT), 1) AS w3 FROM i3)
      |""".stripMargin


  /** Shared Bradley-Terry MM-fit SQL tail: assumes a prior CTE
    * `c(winner, loser)` of judgments (the WITH chain must end with a
    * trailing newline before this fragment); self-pairs (winner =
    * loser, a meaningless judgment) are excluded up front, mirroring
    * bradleyTerryFromCounts' filter; replays three
    * renormalized integer MM rounds and emits (player, n_wins,
    * n_matches, strength_micro, rank). */
  private[graft] val btFitSql: String =
    ("""|cpairs AS (SELECT winner, loser FROM c WHERE winner <> loser),
        |players AS (SELECT winner AS player FROM cpairs
        |            UNION SELECT loser FROM cpairs),
        |w AS (SELECT winner AS player, CAST(COUNT(*) AS BIGINT) AS wins
        |      FROM cpairs GROUP BY 1),
        |wp AS (SELECT p.player, COALESCE(w.wins, 0) AS wins
        |       FROM players p LEFT JOIN w ON p.player = w.player),
        |mm AS (
        |  SELECT i, j, CAST(SUM(n) AS BIGINT) AS n FROM (
        |    SELECT winner AS i, loser AS j, 1 AS n FROM cpairs
        |    UNION ALL SELECT loser, winner, 1 FROM cpairs) GROUP BY 1, 2),
        |nk AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM players),
        |p0 AS (SELECT player, 1000000 // k AS p FROM wp, nk),
        |d1 AS (
        |  SELECT mm.i AS player, CAST(SUM(mm.n * 1000000000
        |    // GREATEST(pi.p + pj.p, 1)) AS BIGINT) AS den
        |  FROM mm JOIN p0 pi ON mm.i = pi.player
        |  JOIN p0 pj ON mm.j = pj.player GROUP BY 1),
        |r1 AS (SELECT wp.player,
        |    wp.wins * 1000000000 // GREATEST(d1.den, 1) AS raw
        |  FROM wp JOIN d1 ON wp.player = d1.player),
        |s1 AS (SELECT CAST(SUM(raw) AS BIGINT) AS s FROM r1),
        |p1 AS (SELECT player, raw * 1000000 // GREATEST(s, 1) AS p
        |       FROM r1, s1),
        |d2 AS (
        |  SELECT mm.i AS player, CAST(SUM(mm.n * 1000000000
        |    // GREATEST(pi.p + pj.p, 1)) AS BIGINT) AS den
        |  FROM mm JOIN p1 pi ON mm.i = pi.player
        |  JOIN p1 pj ON mm.j = pj.player GROUP BY 1),
        |r2 AS (SELECT wp.player,
        |    wp.wins * 1000000000 // GREATEST(d2.den, 1) AS raw
        |  FROM wp JOIN d2 ON wp.player = d2.player),
        |s2 AS (SELECT CAST(SUM(raw) AS BIGINT) AS s FROM r2),
        |p2 AS (SELECT player, raw * 1000000 // GREATEST(s, 1) AS p
        |       FROM r2, s2),
        |d3 AS (
        |  SELECT mm.i AS player, CAST(SUM(mm.n * 1000000000
        |    // GREATEST(pi.p + pj.p, 1)) AS BIGINT) AS den
        |  FROM mm JOIN p2 pi ON mm.i = pi.player
        |  JOIN p2 pj ON mm.j = pj.player GROUP BY 1),
        |r3 AS (SELECT wp.player,
        |    wp.wins * 1000000000 // GREATEST(d3.den, 1) AS raw
        |  FROM wp JOIN d3 ON wp.player = d3.player),
        |s3 AS (SELECT CAST(SUM(raw) AS BIGINT) AS s FROM r3),
        |p3 AS (SELECT player, raw * 1000000 // GREATEST(s, 1) AS p
        |       FROM r3, s3),
        |tm AS (SELECT i AS player, CAST(SUM(n) AS BIGINT) AS n_matches
        |       FROM mm GROUP BY 1)
        |SELECT wp.player, wp.wins AS n_wins, tm.n_matches,
        |  CAST(p3.p AS BIGINT) AS strength_micro,
        |  ROW_NUMBER() OVER (ORDER BY p3.p DESC, wp.player) AS rank
        |FROM wp JOIN tm ON wp.player = tm.player
        |JOIN p3 ON wp.player = p3.player""").stripMargin

  /** Shared Kneser–Ney CTE chain (td_kn_bigram + td_kn_doc): the
    * per-doc bigram stream as `bg(doc_id, w1, w2)` and the trained
    * model as `m(w1, w2, c12, c1, n1p_left, n1p_right, cont_micro)` —
    * every count, marginal, and integer division replayed exactly. */
  private[graft] val knModelCte = wordsOnlyCte +
    """, pb AS (
      |  SELECT doc_id, w, unnest(range(1, len(w))) AS i
      |  FROM ws WHERE len(w) >= 2),
      |bg AS (SELECT doc_id, w[i] AS w1, w[i + 1] AS w2 FROM pb),
      |pc AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
      |       FROM bg GROUP BY 1, 2),
      |lt AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
      |         CAST(COUNT(*) AS BIGINT) AS n1p_left
      |       FROM pc GROUP BY 1),
      |rt AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1p_right
      |       FROM pc GROUP BY 1),
      |tt AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM pc),
      |m AS (
      |  SELECT pc.w1, pc.w2, pc.c12, lt.c1, lt.n1p_left, rt.n1p_right,
      |    rt.n1p_right * 1000000 // t AS cont_micro
      |  FROM pc JOIN lt USING (w1) JOIN rt USING (w2) CROSS JOIN tt)
      |""".stripMargin

  /** Shared Kneser–Ney TRIGRAM CTE chain (td_kn_trigram +
    * td_kn_trigram_doc): the per-doc trigram stream as
    * `tg(doc_id, w1, w2, w3)` and the two-level interpolated model as
    * `tm(w1, w2, w3, c123, c12, n1p_12, nc_23, nc_2d, n1p_2,
    * cont_micro, pkn2_micro, p_micro)` — every count, marginal, and
    * floored integer division of
    * [[graft.operators.NgramLm.trainTrigram]] replayed exactly
    * (cont_micro floors FIRST, then feeds pkn2, then p — the same
    * order the Spark columns compute in). */
  private[graft] val knTrigramCte = wordsOnlyCte +
    """, pt AS (
      |  SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i
      |  FROM ws WHERE len(w) >= 3),
      |tg AS (SELECT doc_id, w[i] AS w1, w[i + 1] AS w2,
      |         w[i + 2] AS w3 FROM pt),
      |tc AS (SELECT w1, w2, w3, CAST(COUNT(*) AS BIGINT) AS c123
      |       FROM tg GROUP BY 1, 2, 3),
      |pre AS (SELECT w1, w2, CAST(SUM(c123) AS BIGINT) AS c12,
      |          CAST(COUNT(*) AS BIGINT) AS n1p_12
      |        FROM tc GROUP BY 1, 2),
      |c23 AS (SELECT w2, w3, CAST(COUNT(*) AS BIGINT) AS nc_23
      |        FROM tc GROUP BY 1, 2),
      |mid AS (SELECT w2, CAST(SUM(nc_23) AS BIGINT) AS nc_2d,
      |          CAST(COUNT(*) AS BIGINT) AS n1p_2
      |        FROM c23 GROUP BY 1),
      |un AS (SELECT w3, CAST(COUNT(*) AS BIGINT) AS nc_3
      |       FROM c23 GROUP BY 1),
      |ttt AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM c23),
      |pair AS (
      |  SELECT c23.w2, c23.w3, c23.nc_23, mid.nc_2d, mid.n1p_2,
      |    CAST(un.nc_3 * 1000000 // GREATEST(t, 1) AS BIGINT)
      |      AS cont_micro,
      |    CAST(GREATEST(4 * c23.nc_23 - 3, 0) * 1000000
      |        // (4 * mid.nc_2d)
      |      + 3 * mid.n1p_2 * (un.nc_3 * 1000000 // GREATEST(t, 1))
      |        // (4 * mid.nc_2d) AS BIGINT) AS pkn2_micro
      |  FROM c23 JOIN mid USING (w2) JOIN un USING (w3)
      |  CROSS JOIN ttt),
      |tm AS (
      |  SELECT tc.w1, tc.w2, tc.w3, tc.c123, pre.c12, pre.n1p_12,
      |    pair.nc_23, pair.nc_2d, pair.n1p_2, pair.cont_micro,
      |    pair.pkn2_micro,
      |    CAST(GREATEST(4 * tc.c123 - 3, 0) * 1000000 // (4 * pre.c12)
      |      + 3 * pre.n1p_12 * pair.pkn2_micro // (4 * pre.c12)
      |      AS BIGINT) AS p_micro
      |  FROM tc JOIN pre USING (w1, w2) JOIN pair USING (w2, w3))
      |""".stripMargin

  /** Shared DSIR CTE chain: full-precision per-doc bigram
    * log-likelihood-ratio weights as `dw(doc_id, n_bigrams, li)`. */
  private[graft] val dsirCore = wordsOnlyCte +
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

  private[graft] val wordsCte =
    wordsOnlyCte.stripSuffix("\n").stripSuffix(")") +
      """),
        |sh AS (
        |  SELECT doc_id,
        |    unnest(list_distinct(list_transform(
        |      range(0, greatest(len(w) - 2, 0)),
        |      i -> array_to_string(w[i+1:i+3], ' ')))) AS sh
        |  FROM ws)
        |""".stripMargin

  private[graft] val jaccardSql =
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

  private[graft] def langHits(lang: String, stops: Seq[String]): String = {
    val lst = stops.map(s => s"'$s'").mkString("[", ", ", "]")
    s"len(list_filter(list_distinct(w), x -> list_contains($lst, x))) AS $lang"
  }

  /** Mirrors [[TextFunctions.htmlToText]] rule-for-rule: same synthetic
    * wrap as the Spark query, then the identical strip/decode/collapse
    * chain (the patterns are from the Java/RE2 common subset, so the two
    * engines must rewrite identically). */
  private[graft] val htmlExtractSql: String = {
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
  private[graft] val marginMiningOracle: String =
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

  /** Conversation-assembly CTE chain (events → templated turns →
    * gap-sessionized conversations → running token sums), shared by
    * the three SFT oracles (`td_sft_assemble`, `td_sft_filter`,
    * `td_sft_templates`) so a semantics change cannot silently drift
    * between them. Ends with CTE `x` carrying (user_id, ts, event_id,
    * turn_text, conv, turn_tokens, cum); each gate appends its own
    * final stage. */
  private[graft] val assembleCte: String =
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
      |      ORDER BY ts, event_id) AS cum
      |  FROM c)
      |""".stripMargin

  /** The kept-conversation projection shared by the transcript-consuming
    * oracles (`td_sft_loss_mask`, `td_sft_roles`): [[assembleCte]]'s `x`
    * reduced to (conv_id, user_id, text) under the gate's budget/minTurns
    * — the same final stage `td_sft_assemble` renders, minus the audit
    * columns those gates don't read. */
  private[graft] val assembleTextCte: String =
    """,a AS (
      |  SELECT CAST(user_id AS VARCHAR) || '-' || CAST(conv AS VARCHAR)
      |      AS conv_id,
      |    user_id,
      |    string_agg(turn_text, ' | ' ORDER BY ts, event_id) AS text
      |  FROM x WHERE cum <= 30
      |  GROUP BY user_id, conv HAVING COUNT(*) >= 2)
      |""".stripMargin
}

package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.functions.expressions.SimHash64
import graft.operators.{Collocations, Dedup, EvalMetrics, FilterFunnel, Multimodal, QualityClassifier, Quantization, Sampling, Similarity, TextQuality, Tokenizer, UrlFilter}

/** Deduplication + decontamination gates: exact/fingerprint/
  * MinHash-LSH/SimHash/embedding/substring dedup, cluster survivorship,
  * leak-free splits, n-gram novelty.
  *
  * Split from [[QueriesTrainingData]] (round 12) along the COVERAGE.md
  * family boundaries; the folded `gated` registry shape is unchanged and
  * [[QueriesTrainingData.gated]] concatenates the families. Shared
  * helpers/oracle CTEs live in [[QueriesTdShared]].
  */
private[graft] object QueriesTdDedup {
  import Queries.Q
  import QueriesTdShared._

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
    // split-leakage AUDIT (the verification step after any split): per
    // unordered split combination, how many near-dup pairs land there —
    // leakFreeSplit must show ZERO crossing rows while the naive
    // doc_id-bucket split (audited side by side) shows real leakage;
    // the oracle replays pairs, components, both split rules, and the
    // audit table
    ("td_split_audit",
      ((s, dir) => {
      val d = docs(s, dir)
      // three consumers read the pair frame (the component collect and
      // both audits) — eager-pin it once instead of re-running the LSH
      // pipeline per consumer (pairs are id pairs: bytes, not text)
      val pairs = Dedup.minhashLshPairs(d, "doc_id", "text",
        n = 3, threshold = 0.5, numHashes = 128, rowsPerBand = 2)
        .localCheckpoint(true)
      val leak = Dedup.leakFreeSplit(d.select(col("doc_id")), "doc_id",
        pairs, testBp = 1000, valBp = 1000)
      val naive = d.select(col("doc_id"),
        when(Sampling.bucket(col("doc_id")) < 1000, lit("test"))
          .when(Sampling.bucket(col("doc_id")) < 2000, lit("val"))
          .otherwise(lit("train")).as("split"))
      Dedup.splitAudit(leak, "doc_id", "split", pairs)
        .withColumn("scheme", lit("leakfree"))
        .unionByName(Dedup.splitAudit(naive, "doc_id", "split", pairs)
          .withColumn("scheme", lit("naive")))
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
        |  FROM keyed),
        |spn AS (
        |  SELECT doc_id,
        |    CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |             ::BIGINT % 10000 < 1000 THEN 'test'
        |         WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |             ::BIGINT % 10000 < 2000 THEN 'val'
        |         ELSE 'train' END AS split
        |  FROM documents),
        |audit AS (
        |  SELECT 'leakfree' AS scheme,
        |    LEAST(a.split, b.split) AS split_a,
        |    GREATEST(a.split, b.split) AS split_b
        |  FROM pairs p JOIN sp a ON p.id_a = a.doc_id
        |  JOIN sp b ON p.id_b = b.doc_id
        |  UNION ALL
        |  SELECT 'naive' AS scheme,
        |    LEAST(a.split, b.split) AS split_a,
        |    GREATEST(a.split, b.split) AS split_b
        |  FROM pairs p JOIN spn a ON p.id_a = a.doc_id
        |  JOIN spn b ON p.id_b = b.doc_id)
        |SELECT split_a, split_b, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |  split_a <> split_b AS crossing, scheme
        |FROM audit GROUP BY scheme, split_a, split_b""".stripMargin)),
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
        |FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id""".stripMargin))
}

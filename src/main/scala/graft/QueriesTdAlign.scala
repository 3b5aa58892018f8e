package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.functions.expressions.SimHash64
import graft.operators.{Collocations, Dedup, EvalMetrics, FilterFunnel, Multimodal, QualityClassifier, Quantization, Sampling, Similarity, TextQuality, Tokenizer, UrlFilter}

/** Alignment-data + multimodal gates: SFT conversation assembly,
  * DPO preference pairs, image/audio/mp4 plumbing.
  *
  * Split from [[QueriesTrainingData]] (round 12) along the COVERAGE.md
  * family boundaries; the folded `gated` registry shape is unchanged and
  * [[QueriesTrainingData.gated]] concatenates the families. Shared
  * helpers/oracle CTEs live in [[QueriesTdShared]].
  */
private[graft] object QueriesTdAlign {
  import Queries.Q
  import QueriesTdShared._

  val gated: Seq[(String, Q, String)] = Seq(
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
      (assembleCte +
      """,x2 AS (
        |  SELECT *, COUNT(*) OVER (PARTITION BY user_id, conv)
        |    AS all_turns
        |  FROM x)
        |SELECT CAST(user_id AS VARCHAR) || '-' || CAST(conv AS VARCHAR)
        |    AS conv_id,
        |  user_id, COUNT(*) AS n_turns, MAX(all_turns) AS all_turns,
        |  CAST(SUM(turn_tokens) AS BIGINT) AS total_tokens,
        |  MAX(all_turns) > COUNT(*) AS truncated,
        |  string_agg(turn_text, ' | ' ORDER BY ts, event_id) AS text
        |FROM x2 WHERE cum <= 30
        |GROUP BY user_id, conv HAVING COUNT(*) >= 2""".stripMargin)),
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
        |  -- unscored rows carry no preference signal: replay dayCents'
        |  -- cents-IS-NOT-NULL exclusion so the oracle diverges loudly
        |  -- (not silently) if the operator ever changes that rule
        |  FROM events WHERE value IS NOT NULL),
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
    // best-of-N rejection sampling (the synthetic-data selection step):
    // per candidate group keep ONLY the argmax-cents candidate, accept
    // the group iff its best clears the floor — one min(struct) fold,
    // O(1) state per group; the oracle replays the argmax, the tie rule,
    // and the accept verdict (150-cent floor so both verdicts appear)
    ("td_best_of_n",
      ((s, dir) => graft.operators.Conversations.bestOfN(
        s.read.parquet(s"$dir/events.parquet"), minCents = 150L)),
      """WITH e AS (
        |  SELECT user_id, event_id,
        |    CAST(ROUND(value * 100) AS BIGINT) AS cents,
        |    strftime(ts, '%Y-%m-%d') AS day
        |  -- unscored rows carry no preference signal: replay dayCents'
        |  -- cents-IS-NOT-NULL exclusion so the oracle diverges loudly
        |  -- (not silently) if the operator ever changes that rule
        |  FROM events WHERE value IS NOT NULL),
        |r AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, day
        |      ORDER BY cents DESC, event_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY user_id, day) AS n
        |  FROM e)
        |SELECT CAST(user_id AS VARCHAR) || '-' || day AS group_id,
        |  user_id, day, event_id AS chosen_id, cents AS best_cents,
        |  n AS n_candidates, cents >= 150 AS accepted
        |FROM r WHERE rn = 1""".stripMargin),
    // GRPO group-relative advantage (Shao et al. 2024): per candidate
    // group, reward minus group mean over group std — all integer
    // milli-cents with sign-split divisions (Spark div truncates,
    // DuckDB // floors; abs() makes them agree) and
    // floor(sqrt(integer variance)) for the std, replayed exactly
    ("td_group_advantage",
      ((s, dir) => graft.operators.Conversations.groupAdvantage(
        s.read.parquet(s"$dir/events.parquet"))),
      """WITH e AS (
        |  SELECT user_id, event_id,
        |    CAST(ROUND(value * 100) AS BIGINT) AS cents,
        |    strftime(ts, '%Y-%m-%d') AS day
        |  FROM events WHERE value IS NOT NULL),
        |g AS (
        |  SELECT *, COUNT(*) OVER w AS n_candidates,
        |    CAST(SUM(cents) OVER w AS BIGINT) AS s
        |  FROM e WINDOW w AS (PARTITION BY user_id, day)),
        |h AS (
        |  SELECT *, CASE WHEN s >= 0 THEN (s * 1000) // n_candidates
        |    ELSE -((-s * 1000) // n_candidates) END AS mean_milli
        |  FROM g WHERE n_candidates >= 2),
        |i AS (SELECT *, cents * 1000 - mean_milli AS dev_milli FROM h),
        |j AS (
        |  SELECT *, CAST(SUM(dev_milli * dev_milli)
        |      OVER (PARTITION BY user_id, day) // n_candidates
        |    AS BIGINT) AS var_m
        |  FROM i),
        |k AS (SELECT *, CAST(FLOOR(SQRT(var_m)) AS BIGINT) AS std_milli
        |      FROM j)
        |SELECT user_id, day, event_id, cents,
        |  CAST(n_candidates AS BIGINT) AS n_candidates,
        |  CAST(mean_milli AS BIGINT) AS mean_milli,
        |  CAST(dev_milli AS BIGINT) AS dev_milli, std_milli,
        |  CASE WHEN std_milli > 0 THEN
        |    CASE WHEN dev_milli >= 0
        |      THEN CAST((dev_milli * 10000) // std_milli AS BIGINT)
        |      ELSE -CAST(((-dev_milli) * 10000) // std_milli AS BIGINT)
        |      END
        |  ELSE 0 END AS adv_bp
        |FROM k""".stripMargin),
    // tree-shaped conversations flattened to root-to-leaf SFT
    // transcripts (the OASST pipeline): heap-rule message tree over
    // docs, pointer-doubled paths, leaf anti-join, ordered text
    // assembly — the oracle re-walks the tree recursively and
    // string_aggs along each path in position order
    ("td_tree_sft",
      ((s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
      val n = d.select(col("doc_id").as("id"),
        when(col("doc_id") > 0, expr("(doc_id - 1) div 2")).as("par"))
      graft.operators.Hierarchy.treeTranscripts(n, "id", "par",
        d, "doc_id", "text")
    }),
      """WITH RECURSIVE n AS (
        |  SELECT doc_id AS id,
        |    CASE WHEN doc_id > 0 THEN (doc_id - 1) // 2 END AS par,
        |    text
        |  FROM documents),
        |walk AS (
        |  SELECT id AS sid, id AS cur, par, CAST(0 AS BIGINT) AS depth,
        |    CAST(id AS VARCHAR) AS path
        |  FROM n
        |  UNION ALL
        |  SELECT w.sid, p.id, p.par, w.depth + 1,
        |    w.path || '>' || CAST(p.id AS VARCHAR)
        |  FROM walk w JOIN n p ON w.par = p.id WHERE w.depth < 64),
        |done AS (SELECT sid, cur AS root, depth, path FROM walk
        |         WHERE par IS NULL),
        |lv AS (SELECT d.* FROM done d
        |  WHERE d.sid NOT IN (SELECT par FROM n WHERE par IS NOT NULL)),
        |ex AS (
        |  SELECT sid, root, depth,
        |    unnest(range(1, len(l) + 1)) AS pos, l
        |  FROM (SELECT sid, root, depth,
        |          list_reverse(string_split(path, '>')) AS l
        |        FROM lv)),
        |ex2 AS (SELECT sid, root, depth, pos,
        |          CAST(l[pos] AS BIGINT) AS node
        |        FROM ex)
        |SELECT e.sid AS leaf_id, CAST(e.root AS BIGINT) AS root,
        |  e.depth, CAST(COUNT(*) AS BIGINT) AS n_turns,
        |  CAST(COALESCE(SUM(CASE WHEN n.text IS NULL THEN 1 END), 0)
        |    AS BIGINT) AS n_missing,
        |  CASE WHEN COUNT(*) = COUNT(n.text)
        |    THEN string_agg(n.text, ' | ' ORDER BY e.pos)
        |  END AS transcript
        |FROM ex2 e LEFT JOIN n ON e.node = n.id
        |GROUP BY 1, 2, 3""".stripMargin),
    // pairwise Cohen's kappa (which raters disagree): canonical rating
    // per (user, day) = the argmax-cents event type; a bounded rater
    // panel (user_id < 40 — annotator panels are small) pairs on
    // common days; strict per-pair marginals, all integer micros
    ("td_cohen_kappa",
      ((s, dir) => {
      val e = s.read.parquet(s"$dir/events.parquet")
        .filter(col("user_id") < 40)
        .withColumn("day",
          date_format(col("ts").cast("timestamp"), "yyyy-MM-dd"))
        .withColumn("cents", round(col("value") * 100).cast("long"))
        .filter(col("cents").isNotNull)
      val canon = e.groupBy(col("user_id"), col("day"))
        .agg(min(struct((-col("cents")).as("nc"), col("event_id"),
          col("event_type").as("et"))).as("hi"))
        .select(col("day").as("item"), col("user_id").as("rater"),
          col("hi.et").as("lab"))
      graft.operators.EvalMetrics.cohenKappaPairs(
        canon, "item", "rater", "lab", minCommon = 3)
    }),
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |    CAST(ROUND(value * 100) AS BIGINT) AS cents,
        |    strftime(ts, '%Y-%m-%d') AS day
        |  FROM events WHERE value IS NOT NULL AND user_id < 40),
        |c AS (
        |  SELECT day, user_id, event_type FROM (
        |    SELECT day, user_id, event_type,
        |      ROW_NUMBER() OVER (PARTITION BY user_id, day
        |        ORDER BY cents DESC, event_id) AS rn
        |    FROM e) WHERE rn = 1),
        |p AS (
        |  SELECT CAST(a.user_id AS VARCHAR) AS ra,
        |    CAST(b.user_id AS VARCHAR) AS rb,
        |    a.event_type AS la, b.event_type AS lb
        |  FROM c a JOIN c b ON a.day = b.day
        |  WHERE CAST(a.user_id AS VARCHAR) < CAST(b.user_id AS VARCHAR)),
        |po AS (
        |  SELECT ra, rb, CAST(COUNT(*) AS BIGINT) AS n_common,
        |    CAST(COALESCE(SUM(CASE WHEN la = lb THEN 1 END), 0)
        |      AS BIGINT) AS n_agree
        |  FROM p GROUP BY 1, 2 HAVING COUNT(*) >= 3),
        |ma AS (SELECT ra, rb, la AS lab, CAST(COUNT(*) AS BIGINT) AS ca
        |       FROM p GROUP BY 1, 2, 3),
        |mb AS (SELECT ra, rb, lb AS lab, CAST(COUNT(*) AS BIGINT) AS cb
        |       FROM p GROUP BY 1, 2, 3),
        |pe AS (
        |  SELECT COALESCE(ma.ra, mb.ra) AS ra,
        |    COALESCE(ma.rb, mb.rb) AS rb,
        |    CAST(COALESCE(SUM(COALESCE(ca, 0) * COALESCE(cb, 0)), 0)
        |      AS BIGINT) AS crossv
        |  FROM ma FULL JOIN mb ON ma.ra = mb.ra AND ma.rb = mb.rb
        |    AND ma.lab = mb.lab
        |  GROUP BY 1, 2),
        |f AS (
        |  SELECT po.ra, po.rb, n_common, n_agree,
        |    CAST(n_agree * 1000000 // n_common AS BIGINT) AS po_micro,
        |    CAST(crossv * 1000000 // (n_common * n_common) AS BIGINT)
        |      AS pe_micro
        |  FROM po JOIN pe ON po.ra = pe.ra AND po.rb = pe.rb)
        |SELECT ra AS rater_a, rb AS rater_b, n_common, n_agree,
        |  po_micro, pe_micro,
        |  CASE WHEN po_micro >= pe_micro
        |    THEN CAST((po_micro - pe_micro) * 1000000
        |      // GREATEST(1000000 - pe_micro, 1) AS BIGINT)
        |    ELSE -CAST((pe_micro - po_micro) * 1000000
        |      // GREATEST(1000000 - pe_micro, 1) AS BIGINT)
        |    END AS kappa_micro
        |FROM f""".stripMargin),
    // Fleiss' kappa inter-annotator agreement (the labeling-QA gate of
    // an annotation pipeline): items = days, raters' labels = event
    // types; per-item agreement, label marginals, and the chance-
    // corrected kappa all in exact integer micros with a sign-split
    // final division
    ("td_fleiss_kappa",
      ((s, dir) => graft.operators.EvalMetrics.fleissKappa(
        s.read.parquet(s"$dir/events.parquet")
          .withColumn("day",
            date_format(col("ts").cast("timestamp"), "yyyy-MM-dd")),
        "day", "event_type")),
      """WITH r AS (
        |  SELECT strftime(ts, '%Y-%m-%d') AS item, event_type AS label
        |  FROM events),
        |nij AS (SELECT item, label, CAST(COUNT(*) AS BIGINT) AS nij
        |        FROM r GROUP BY 1, 2),
        |it AS (SELECT item, CAST(SUM(nij) AS BIGINT) AS ni,
        |         CAST(SUM(nij * nij) AS BIGINT) AS sq
        |       FROM nij GROUP BY 1),
        |ke AS (SELECT *,
        |         (sq - ni) * 1000000 // (ni * (ni - 1)) AS agree_micro
        |       FROM it WHERE ni >= 2),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
        |    CAST(COALESCE(SUM(ni), 0) AS BIGINT) AS n_ratings,
        |    CAST(COALESCE(SUM(agree_micro), 0) AS BIGINT) AS agree_sum
        |  FROM ke),
        |mar AS (SELECT n.label, CAST(SUM(n.nij) AS BIGINT) AS lt
        |        FROM nij n JOIN ke ON n.item = ke.item GROUP BY 1),
        |pe AS (SELECT CAST(COALESCE(SUM(
        |    (lt * 1000000 // t.n_ratings) * (lt * 1000000 // t.n_ratings)
        |  ), 0) // 1000000 AS BIGINT) AS pe_micro FROM mar, tot t)
        |SELECT t.n_items, t.n_ratings,
        |  CAST(t.agree_sum // t.n_items AS BIGINT) AS pbar_micro,
        |  pe.pe_micro,
        |  CASE WHEN t.agree_sum // t.n_items >= pe.pe_micro
        |    THEN CAST((t.agree_sum // t.n_items - pe.pe_micro) * 1000000
        |      // GREATEST(1000000 - pe.pe_micro, 1) AS BIGINT)
        |    ELSE -CAST((pe.pe_micro - t.agree_sum // t.n_items) * 1000000
        |      // GREATEST(1000000 - pe.pe_micro, 1) AS BIGINT)
        |    END AS kappa_micro
        |FROM tot t, pe""".stripMargin),
    // Bradley-Terry strength fitting (the Arena-style leaderboard that
    // closes the preference loop): comparisons = top-4-ranked event
    // TYPES per (user, day) expanded into strict (winner, loser) pairs,
    // then 3 exact-integer MM rounds; the oracle replays the expansion,
    // the K² count matrix, and every renormalized iteration
    ("td_bradley_terry",
      ((s, dir) => {
      import graft.operators.{Conversations, EvalMetrics}
      val e = s.read.parquet(s"$dir/events.parquet")
        .withColumn("day",
          date_format(col("ts").cast("timestamp"), "yyyy-MM-dd"))
        .withColumn("cents", round(col("value") * 100).cast("long"))
      val part = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"), col("day"))
      val ranked = e
        .withColumn("rank", row_number().over(
          part.orderBy(col("cents").desc, col("event_id"))))
        .withColumn("n", count(lit(1)).over(part))
        .filter(col("rank") <= 4 && col("n") >= 2)
      val a = ranked.select(col("user_id"), col("day"),
        col("event_type").as("wt"), col("cents").as("wc"),
        col("rank").as("wr"))
      val b = ranked.select(col("user_id"), col("day"),
        col("event_type").as("lt"), col("cents").as("lc"),
        col("rank").as("lr"))
      val comps = a.join(b, Seq("user_id", "day"))
        .filter(col("wr") < col("lr") && col("wc") > col("lc") &&
          col("wt") =!= col("lt"))
        .select(col("wt").as("winner"), col("lt").as("loser"))
      EvalMetrics.bradleyTerry(comps, "winner", "loser", iters = 3)
    }),
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |    CAST(ROUND(value * 100) AS BIGINT) AS cents,
        |    strftime(ts, '%Y-%m-%d') AS day
        |  FROM events),
        |r AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, day
        |      ORDER BY cents DESC, event_id) AS rank,
        |    COUNT(*) OVER (PARTITION BY user_id, day) AS n
        |  FROM e),
        |kk AS (SELECT * FROM r WHERE rank <= 4 AND n >= 2),
        |c AS (
        |  SELECT a.event_type AS winner, b.event_type AS loser
        |  FROM kk a JOIN kk b ON a.user_id = b.user_id AND a.day = b.day
        |    AND a.rank < b.rank AND a.cents > b.cents
        |  WHERE a.event_type <> b.event_type),
        |""".stripMargin + btFitSql),
    // SFT quality filter over assembled conversations: exact-duplicate
    // transcripts (keep first by conv_id), degenerate short convs,
    // over-budget transcripts — every conversation emitted with its
    // verdict and first failing reason (severity-ordered)
    ("td_sft_filter",
      ((s, dir) => graft.operators.Conversations.sftFilter(
        graft.operators.Conversations.assemble(
          s.read.parquet(s"$dir/events.parquet"), gapMinutes = 1440),
        minTurns = 3, maxTokens = 25)),
      (assembleCte +
      """,a AS (
        |  SELECT CAST(user_id AS VARCHAR) || '-' || CAST(conv AS VARCHAR)
        |      AS conv_id,
        |    user_id, COUNT(*) AS n_turns,
        |    CAST(SUM(turn_tokens) AS BIGINT) AS total_tokens,
        |    string_agg(turn_text, ' | ' ORDER BY ts, event_id) AS text
        |  FROM x WHERE cum <= 30
        |  GROUP BY user_id, conv HAVING COUNT(*) >= 2),
        |f AS (
        |  SELECT conv_id, user_id, n_turns, total_tokens,
        |    ROW_NUMBER() OVER (PARTITION BY md5(text)
        |      ORDER BY conv_id) > 1 AS dup_text,
        |    n_turns < 3 AS too_short,
        |    total_tokens > 25 AS over_budget
        |  FROM a)
        |SELECT conv_id, user_id, n_turns, total_tokens,
        |  dup_text, too_short, over_budget,
        |  NOT (dup_text OR too_short OR over_budget) AS keep,
        |  CASE WHEN dup_text THEN 'dup_text'
        |    WHEN too_short THEN 'too_short'
        |    WHEN over_budget THEN 'over_budget' END AS reason
        |FROM f""".stripMargin)),
    // SFT loss-mask spans over assembled transcripts: per turn, its
    // exact [start_char, end_char) span inside the rendered transcript
    // plus the trainable flag (odd turn indices — the prompt/response
    // alternation convention). Offsets are computed array-side with
    // ZERO exchanges beyond assemble's one; the oracle replays every
    // span from the same string algebra.
    ("td_sft_loss_mask",
      ((s, dir) => graft.operators.Conversations.lossMaskSpans(
        graft.operators.Conversations.assemble(
          s.read.parquet(s"$dir/events.parquet"), gapMinutes = 1440))),
      (assembleCte + assembleTextCte +
      """,u AS (
        |  SELECT conv_id, user_id,
        |    UNNEST(string_split(text, ' | ')) AS turn_text,
        |    UNNEST(range(0, len(string_split(text, ' | ')))) AS turn_idx
        |  FROM a),
        |o AS (
        |  SELECT *, CAST(SUM(len(turn_text) + 3) OVER (
        |      PARTITION BY conv_id ORDER BY turn_idx)
        |    - len(turn_text) - 3 AS BIGINT) AS start_char
        |  FROM u)
        |SELECT conv_id, user_id, CAST(turn_idx AS INT) AS turn_idx,
        |  turn_text, start_char,
        |  CAST(start_char + len(turn_text) AS BIGINT) AS end_char,
        |  (turn_idx % 2 = 1) AS trainable
        |FROM o""".stripMargin)),
    // chat-structure role audit over assembled transcripts: a turn's
    // role is its leading token (the rendered event type); healthy
    // prompt/response data alternates roles, so consecutive same-role
    // pairs are the turn-merging signal. Zero exchanges beyond
    // assemble's one — roles fold array-side.
    ("td_sft_roles",
      ((s, dir) => graft.operators.Conversations.roleAlternationAudit(
        graft.operators.Conversations.assemble(
          s.read.parquet(s"$dir/events.parquet"), gapMinutes = 1440))),
      (assembleCte + assembleTextCte +
      """,t2 AS (
        |  SELECT conv_id, user_id,
        |    list_transform(string_split(text, ' | '),
        |      s -> string_split(s, ' ')[1]) AS roles
        |  FROM a)
        |SELECT conv_id, user_id,
        |  CAST(len(roles) AS INT) AS n_turns,
        |  CAST(len(list_distinct(roles)) AS INT) AS n_roles,
        |  CAST(COALESCE(list_sum(list_transform(range(1, len(roles)),
        |    i -> CASE WHEN roles[i] = roles[i+1] THEN 1 ELSE 0 END)), 0)
        |    AS BIGINT) AS n_role_repeats,
        |  roles[1] AS first_role,
        |  CAST(COALESCE(list_sum(list_transform(range(1, len(roles)),
        |    i -> CASE WHEN roles[i] = roles[i+1] THEN 1 ELSE 0 END)), 0)
        |    AS BIGINT) = 0 AS alternating
        |FROM t2""".stripMargin)),
    // k-wise preference rankings (the listwise reward-model shape —
    // several candidates per group in strict preference order, each
    // with its margin to the next): top-4 by exact cents per (user,
    // day), ties to the lower event_id, groups of >= 2 only
    ("td_pref_rankings",
      ((s, dir) => graft.operators.Conversations.preferenceRankings(
        s.read.parquet(s"$dir/events.parquet"), k = 4)),
      """WITH e AS (
        |  SELECT user_id, event_id,
        |    CAST(ROUND(value * 100) AS BIGINT) AS cents,
        |    strftime(ts, '%Y-%m-%d') AS day
        |  -- unscored rows carry no preference signal: replay dayCents'
        |  -- cents-IS-NOT-NULL exclusion so the oracle diverges loudly
        |  -- (not silently) if the operator ever changes that rule
        |  FROM events WHERE value IS NOT NULL),
        |r AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, day
        |      ORDER BY cents DESC, event_id) AS rnk,
        |    LEAD(cents, 1) OVER (PARTITION BY user_id, day
        |      ORDER BY cents DESC, event_id) AS next_cents,
        |    COUNT(*) OVER (PARTITION BY user_id, day) AS n_candidates
        |  FROM e)
        |SELECT CAST(user_id AS VARCHAR) || '-' || day AS group_id,
        |  user_id, day, CAST(rnk AS INT) AS rank, event_id, cents,
        |  cents - next_cents AS margin_next, n_candidates
        |FROM r WHERE rnk <= 4 AND n_candidates >= 2""".stripMargin),
    // template-leakage audit over assembled SFT transcripts: group by
    // the k-token opener, report shared prefixes with their frequency
    // and DISTINCT-transcript counts (1 variant = plain dup, many = a
    // live template) — the boilerplate-opener check exact-dup misses
    ("td_sft_templates",
      ((s, dir) => graft.operators.Conversations.templatePrefixes(
        graft.operators.Conversations.assemble(
          s.read.parquet(s"$dir/events.parquet"), gapMinutes = 1440),
        prefixTokens = 1, minConvs = 2)),
      (assembleCte +
      """,a AS (
        |  SELECT COUNT(*) AS n_turns,
        |    string_agg(turn_text, ' | ' ORDER BY ts, event_id) AS text
        |  FROM x WHERE cum <= 30
        |  GROUP BY user_id, conv HAVING COUNT(*) >= 2),
        |p AS (
        |  SELECT array_to_string(string_split(text, ' ')[1:1], ' ')
        |    AS prefix, text
        |  FROM a)
        |SELECT prefix, COUNT(*) AS n_convs,
        |  COUNT(DISTINCT text) AS n_variants
        |FROM p GROUP BY prefix HAVING COUNT(*) >= 2""".stripMargin)),
    // FIM (fill-in-the-middle) transform: md5-bucketed doc selection,
    // deterministic char cut points, PSM reorder — the oracle replays
    // selection, cuts, and the three-piece render byte-for-byte
    ("td_fim_transform",
      ((s, dir) => graft.operators.SpanTasks.fimTransform(
        docs(s, dir), "doc_id", "text")),
      """WITH d AS (
        |  SELECT doc_id, text, length(text) AS n,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '-fim'),
        |      1, 8))::BIGINT % 10000 < 5000 AS sel,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '-fim-a'),
        |      1, 8))::BIGINT % (length(text) + 1) AS a,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '-fim-b'),
        |      1, 8))::BIGINT % (length(text) + 1) AS b
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, text, n, sel,
        |    LEAST(a, b) AS lo, GREATEST(a, b) AS hi
        |  FROM d)
        |SELECT doc_id, sel AS fim,
        |  CASE WHEN sel THEN CAST(lo AS INT) END AS cut_lo,
        |  CASE WHEN sel THEN CAST(hi AS INT) END AS cut_hi,
        |  CASE WHEN sel THEN
        |      '<fim_prefix>' || substr(text, 1, lo)
        |      || '<fim_suffix>' || substr(text, CAST(hi + 1 AS INT), n - hi)
        |      || '<fim_middle>' || substr(text, CAST(lo + 1 AS INT), hi - lo)
        |    ELSE text END AS text_out
        |FROM c""".stripMargin),
    // MLM token masking: per-(doc, position) md5 draw, [MASK]
    // substitution + reconstruction targets — one transform/filter HOF
    // pair, no explode; the oracle replays every draw from range()
    ("td_mlm_mask",
      ((s, dir) => graft.operators.SpanTasks.mlmMask(
        docs(s, dir), "doc_id", "text")),
      """WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |m AS (
        |  SELECT doc_id,
        |    list_transform(range(0, len(toks)), k ->
        |      CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)
        |          || ':mlm:' || CAST(k AS VARCHAR)), 1, 8))::BIGINT
        |          % 10000 < 1500
        |        THEN '[MASK]' ELSE toks[CAST(k + 1 AS INT)] END) AS masked,
        |    list_filter(list_transform(range(0, len(toks)), k ->
        |      CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)
        |          || ':mlm:' || CAST(k AS VARCHAR)), 1, 8))::BIGINT
        |          % 10000 < 1500
        |        THEN CAST(k AS VARCHAR) || ':' || toks[CAST(k + 1 AS INT)]
        |      END), x -> x IS NOT NULL) AS tgt
        |  FROM d)
        |SELECT doc_id, array_to_string(masked, ' ') AS masked_text,
        |  CAST(len(tgt) AS INT) AS n_masked,
        |  COALESCE(array_to_string(tgt, ' | '), '') AS targets
        |FROM m""".stripMargin),
    // T5 span corruption (the third objective transform next to FIM /
    // MLM): block-aligned spans replaced by numbered sentinels, target
    // = sentinel-prefixed removed spans; every decision an md5 draw on
    // (doc, block), replayed exactly by the oracle
    ("td_span_corrupt",
      ((s, dir) => graft.operators.SpanTasks.spanCorrupt(
        docs(s, dir), "doc_id", "text", rateBp = 4000, spanLen = 3)),
      """WITH w AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'),
        |      x -> len(x) > 0) AS toks
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, toks,
        |    CAST(ceil(len(toks) / 3.0) AS BIGINT) AS nblocks
        |  FROM w),
        |c AS (
        |  SELECT doc_id, toks, nblocks,
        |    list_filter(range(0, nblocks), k ->
        |      ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':sc:'
        |        || CAST(k AS VARCHAR)), 1, 8))::BIGINT % 10000 < 4000)
        |      AS corr
        |  FROM b)
        |SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
        |  CAST(len(corr) AS INT) AS n_spans,
        |  COALESCE(array_to_string(flatten(list_transform(
        |    range(0, nblocks), k ->
        |    CASE WHEN list_contains(corr, k)
        |      THEN ['<extra_id_' ||
        |        CAST(list_position(corr, k) - 1 AS VARCHAR) || '>']
        |      ELSE toks[CAST(k*3+1 AS INT):CAST(k*3+3 AS INT)]
        |    END)), ' '), '') AS input_text,
        |  COALESCE(array_to_string(flatten(list_transform(corr, k ->
        |    list_concat(['<extra_id_' ||
        |        CAST(list_position(corr, k) - 1 AS VARCHAR) || '>'],
        |      toks[CAST(k*3+1 AS INT):CAST(k*3+3 AS INT)]))), ' '), '')
        |    AS target_text
        |FROM c""".stripMargin),
    // Bradley-Terry pairwise expansion of the k-wise rankings: every
    // strictly-ordered (better, worse) combination with rank gap and
    // exact margin — what a reward model actually trains on
    ("td_pref_pairs_expanded",
      ((s, dir) => graft.operators.Conversations.rankingsToPairs(
        graft.operators.Conversations.preferenceRankings(
          s.read.parquet(s"$dir/events.parquet"), k = 4))),
      """WITH e AS (
        |  SELECT user_id, event_id,
        |    CAST(ROUND(value * 100) AS BIGINT) AS cents,
        |    strftime(ts, '%Y-%m-%d') AS day
        |  -- unscored rows carry no preference signal: replay dayCents'
        |  -- cents-IS-NOT-NULL exclusion so the oracle diverges loudly
        |  -- (not silently) if the operator ever changes that rule
        |  FROM events WHERE value IS NOT NULL),
        |r AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, day
        |      ORDER BY cents DESC, event_id) AS rnk,
        |    COUNT(*) OVER (PARTITION BY user_id, day) AS n_candidates
        |  FROM e),
        |k AS (
        |  SELECT CAST(user_id AS VARCHAR) || '-' || day AS group_id,
        |    user_id, day, CAST(rnk AS INT) AS rnk, event_id, cents
        |  FROM r WHERE rnk <= 4 AND n_candidates >= 2)
        |SELECT a.group_id, a.user_id, a.day,
        |  a.rnk AS rank_hi, b.rnk AS rank_lo,
        |  a.event_id AS chosen_id, b.event_id AS rejected_id,
        |  a.cents - b.cents AS margin_cents
        |FROM k a JOIN k b ON a.group_id = b.group_id
        |WHERE a.rnk < b.rnk AND a.cents > b.cents""".stripMargin),
    // needle-in-a-haystack insertion (long-context eval construction):
    // a templated needle planted at a controlled per-doc depth of the
    // word stream; the gate carries the placement + the md5 of the
    // rewritten doc (bounded audit row), and the oracle replays the
    // splice with the same integer floor arithmetic
    ("td_needle_insert",
      ((s, dir) => graft.operators.SpanTasks.needleInsert(
        docs(s, dir), "doc_id", "text",
        needle = concat(lit("NEEDLE-"), col("doc_id"),
          lit(": magic="), pmod(col("doc_id") * 7, lit(100))),
        depthBp = pmod(col("doc_id"), lit(11)) * 1000)),
      """WITH w AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'),
        |      x -> len(x) > 0) AS ws,
        |    CAST(doc_id % 11 * 1000 AS BIGINT) AS depth_bp,
        |    'NEEDLE-' || doc_id || ': magic=' || (doc_id * 7 % 100)
        |      AS needle
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, ws, depth_bp, needle,
        |    CAST(len(ws) AS BIGINT) AS n_words,
        |    (len(ws) * depth_bp) // 10000 AS pos
        |  FROM w)
        |SELECT doc_id, n_words, depth_bp,
        |  CAST(pos AS BIGINT) AS insert_pos, needle,
        |  md5(array_to_string(list_concat(list_concat(
        |    ws[1:pos], [needle]), ws[pos+1:]), ' ')) AS new_md5
        |FROM p""".stripMargin))
}

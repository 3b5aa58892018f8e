package graft

import org.apache.spark.sql.functions._

import graft.functions.Scalars
import graft.operators.{EntityResolution, MetricsAgg, Profiles, SaasProjections, UserRecognition}
import graft.sources.DriverEventsAdapter

/** Coverage-widening queries: SaaS projections (K3), geo/UA enrichment
  * (F1/F2), config lookup join + connection fan-out (J3/J4), report
  * queries (A3), changed-users scan (S6), rollup (beyond-reference SQL
  * surface). Same determinism rules as [[Queries]].
  */
object QueriesExtra {
  import Queries.Q

  private def env(s: org.apache.spark.sql.SparkSession, dir: String) =
    DriverEventsAdapter.load(s, dir)

  /** Rebuild of the adapter-derived UA strings for the oracle CASE. */
  private val uaCase =
    """CASE (raw_event_id % 3)
      |  WHEN 0 THEN 'Chrome' WHEN 1 THEN 'Safari' ELSE 'unknown' END""".stripMargin

  /** The f2b planted UA corpus — same strings ChainSpec's drift guard
    * pins; the oracle hand-unrolls every expected field. */
  private[graft] val taxonomyUas = Seq(
    "Mozilla/5.0 (Macintosh) AppleWebKit/537.36 Chrome/120.0 Safari/537.36",
    "Mozilla/5.0 (iPhone; CPU iPhone OS 17_0 like Mac OS X) Safari/604.1",
    "Googlebot/2.1 (+http://www.google.com/bot.html)",
    "Mozilla/5.0 (Windows NT 10.0) Gecko/20100101 Firefox/121.0",
    "Mozilla/5.0 (Linux; Android 14) Chrome/120.0 Mobile Safari/537.36",
    "Mozilla/5.0 (Windows NT 10.0; Win64) Chrome/120.0 Safari/537.36 Edg/120.0.1",
    "Mozilla/5.0 (X11; Linux x86_64) Chrome/119.0 Safari/537.36 OPR/105.0.0.0",
    "Mozilla/5.0 (iPad; CPU OS 16_6 like Mac OS X) Version/16.6 Mobile/15E148 Safari/604.1",
    "Mozilla/5.0 (Linux; Android 13; SM-X700) Chrome/118.0 Safari/537.36",
    "Mozilla/5.0 (X11; CrOS x86_64 14541.0.0) Chrome/120.0 Safari/537.36",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 Chrome/64.0 Safari/537.36 Edge/18.18363",
    "Mozilla/5.0 (Windows NT 6.1; WOW64; Trident/7.0; rv:11.0) like Gecko",
    "Mozilla/5.0 (Linux; Android 14; SM-S928B) AppleWebKit/537.36 Chrome/121.0 Mobile Safari/537.36 SamsungBrowser/24.0",
    "Mozilla/5.0 (Linux; Android 14; Pixel 8 Pro) AppleWebKit/537.36 Chrome/121.0 Mobile Safari/537.36",
    "Mozilla/5.0 (PlayStation 5/SmartTV) AppleWebKit/605.1.15",
    "AppleTV11,1/11.1",
    "Mozilla/5.0 (Macintosh; ARM64 Mac OS X 14_2) AppleWebKit/605.1.15 Version/17.2 Safari/605.1.15",
    "Opera/9.80 (Windows NT 6.1) Presto/2.12.388 Version/12.16")

  // (queries is derived from gated, declared after the oracle helper CTEs below)

  private val adapterCte =
    """WITH env AS (
      |  SELECT 'm' || event_id AS message_id,
      |    CASE WHEN event_type = 'signup' THEN 'identify'
      |         WHEN event_type = 'view' THEN 'page'
      |         ELSE 'track' END AS type,
      |    event_type AS event,
      |    CAST(ts AS TIMESTAMP) AS timestamp,
      |    'a' || user_id AS anonymous_id,
      |    CASE WHEN event_type IN ('signup','purchase')
      |         THEN 'u' || user_id END AS user_id,
      |    'wk' || (user_id % 3) AS write_key,
      |    'c' || (event_id % 4) AS connection_id,
      |    user_id AS raw_user_id, event_id AS raw_event_id
      |  FROM events)
      |""".stripMargin

  /** One row per gate: (name, query, oracle SQL) — a gate reads as
    * ONE unit (the twin-map layout, query here / oracle hundreds of
    * lines below, was a recurring editing hazard). Helper CTE vals
    * stay declared above so object-init order is safe. */
  val gated: Seq[(String, Q, String)] = Seq(
    // Blocked fuzzy entity resolution: every part row as a "dirty"
    // record (deterministic end-of-name corruption keyed by partkey —
    // drop last char / append 'x' / double last char / unchanged)
    // matched back against the distinct clean-name catalog by
    // Levenshtein distance within first-token blocking buckets. Best
    // match = lowest (dist, name) — deterministic under ties. The
    // oracle replays the corruption, the blocking, and the
    // window-ranked best-match selection.
    ("er_match",
      ((s, dir) => {
      val p = s.read.parquet(s"$dir/part.parquet")
      val m = pmod(col("p_partkey"), lit(4))
      val dirty = p.select(col("p_partkey"),
        when(m === 0, expr("substring(p_name, 1, length(p_name) - 1)"))
          .when(m === 1, concat(col("p_name"), lit("x")))
          .when(m === 2,
            concat(col("p_name"), substring(col("p_name"), -1, 1)))
          .otherwise(col("p_name")).as("name"))
      EntityResolution.bestMatch(dirty, "p_partkey", "name",
        p.select(col("p_name")), "p_name", maxDist = 2)
    }),
      """WITH dirty AS (
        |  SELECT p_partkey,
        |    CASE (p_partkey % 4)
        |      WHEN 0 THEN substr(p_name, 1, length(p_name) - 1)
        |      WHEN 1 THEN p_name || 'x'
        |      WHEN 2 THEN p_name || substr(p_name, length(p_name), 1)
        |      ELSE p_name END AS dirty_name
        |  FROM part),
        |cat AS (SELECT DISTINCT p_name AS matched_name FROM part),
        |cand AS (
        |  SELECT d.p_partkey, d.dirty_name, c.matched_name,
        |    CAST(levenshtein(d.dirty_name, c.matched_name) AS INT) AS dist
        |  FROM dirty d JOIN cat c
        |    ON string_split(d.dirty_name, ' ')[1] =
        |       string_split(c.matched_name, ' ')[1]
        |  WHERE levenshtein(d.dirty_name, c.matched_name) <= 2),
        |ranked AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY p_partkey
        |    ORDER BY dist, matched_name) AS rn
        |  FROM cand)
        |SELECT p_partkey, dirty_name, matched_name, dist
        |FROM ranked WHERE rn = 1""".stripMargin),
    // Multi-pass blocking: the pk%4==0 corruption drops the FIRST char,
    // which breaks first-token blocking — the last-token second pass
    // recovers exactly those records (a corruption must break EVERY
    // key to escape). Oracle unions both blocked candidate sets.
    ("er_multiblock",
      ((s, dir) => {
      val p = s.read.parquet(s"$dir/part.parquet")
      val m = pmod(col("p_partkey"), lit(4))
      val dirty = p.select(col("p_partkey"),
        when(m === 0, expr("substring(p_name, 2)"))
          .when(m === 1, expr("substring(p_name, 1, length(p_name) - 1)"))
          .when(m === 2, concat(col("p_name"), lit("x")))
          .otherwise(col("p_name")).as("name"))
      EntityResolution.bestMatchMultiBlock(dirty, "p_partkey", "name",
        p.select(col("p_name")), "p_name", maxDist = 2,
        Seq(n => split(n, " ").getItem(0),
          n => element_at(split(n, " "), -1)))
    }),
      """WITH dirty AS (
        |  SELECT p_partkey,
        |    CASE (p_partkey % 4)
        |      WHEN 0 THEN substr(p_name, 2)
        |      WHEN 1 THEN substr(p_name, 1, length(p_name) - 1)
        |      WHEN 2 THEN p_name || 'x'
        |      ELSE p_name END AS dirty_name
        |  FROM part),
        |cat AS (SELECT DISTINCT p_name AS matched_name FROM part),
        |cand AS (
        |  SELECT DISTINCT p_partkey, dirty_name, matched_name
        |  FROM (
        |    SELECT d.p_partkey, d.dirty_name, c.matched_name
        |    FROM dirty d JOIN cat c
        |      ON string_split(d.dirty_name, ' ')[1] =
        |         string_split(c.matched_name, ' ')[1]
        |    UNION ALL
        |    SELECT d.p_partkey, d.dirty_name, c.matched_name
        |    FROM dirty d JOIN cat c
        |      ON string_split(d.dirty_name, ' ')[-1] =
        |         string_split(c.matched_name, ' ')[-1])),
        |scored AS (
        |  SELECT *, CAST(levenshtein(dirty_name, matched_name) AS INT)
        |    AS dist
        |  FROM cand
        |  WHERE levenshtein(dirty_name, matched_name) <= 2),
        |ranked AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY p_partkey
        |    ORDER BY dist, matched_name) AS rn
        |  FROM scored)
        |SELECT p_partkey, dirty_name, matched_name, dist
        |FROM ranked WHERE rn = 1""".stripMargin),
    // K3: mixpanel track projection + CLICK_IDS extraction from the page
    // URL. Click ids are planted deterministically; gclid and fbclid
    // co-occur on event_id%3==0 rows, so substring-matching extraction
    // (gclid reading "...fbclid=...") would hash-mismatch.
    ("k3_mixpanel",
      ((s, dir) => {
      val eid = expr("CAST(substring(message_id, 2) AS BIGINT)")
      val url2 = concat(col("context.page.url"),
        when(pmod(eid, lit(3)) === 0, concat(lit("&gclid=g"), eid))
          .otherwise(lit("")),
        when(pmod(eid, lit(3)) < 2, concat(lit("&fbclid=fb"), eid))
          .otherwise(lit("")),
        when(pmod(eid, lit(5)) === 0, concat(lit("&ttclid=tt"), eid))
          .otherwise(lit("")))
      val prepped = env(s, dir).withColumn("context",
        col("context").withField("page.url", url2))
      SaasProjections.mixpanelTrack(prepped)
        .select(col("distinct_id"), col("event"), col("time"),
          col("insert_id"), col("utm_source"), col("city"),
          col("gclid"), col("fbclid"), col("ttclid"), col("msclkid"))
    }),
      (adapterCte +
      """SELECT COALESCE(user_id, anonymous_id) AS distinct_id, event,
        |  CAST(epoch(date_trunc('second', timestamp)) AS BIGINT) * 1000
        |    AS time,
        |  md5(message_id) AS insert_id,
        |  'src' || (raw_user_id % 5) AS utm_source,
        |  CASE (raw_user_id % 5) WHEN 0 THEN 'New York' WHEN 1 THEN 'Berlin'
        |    WHEN 2 THEN 'Paris' WHEN 3 THEN 'London' ELSE 'Beijing' END
        |    AS city,
        |  CASE WHEN raw_event_id % 3 = 0 THEN 'g' || raw_event_id END
        |    AS gclid,
        |  CASE WHEN raw_event_id % 3 < 2 THEN 'fb' || raw_event_id END
        |    AS fbclid,
        |  CASE WHEN raw_event_id % 5 = 0 THEN 'tt' || raw_event_id END
        |    AS ttclid,
        |  CAST(NULL AS VARCHAR) AS msclkid
        |FROM env WHERE type = 'track'""".stripMargin)),
    // K3: ga4 projection (client_id fallback + name mapping)
    ("k3_ga4",
      ((s, dir) =>
      SaasProjections.ga4Events(env(s, dir))
        .select(col("client_id"), col("user_id"), col("event_name"),
          col("timestamp_micros"))),
      (adapterCte +
      """SELECT 'ga-' || raw_user_id AS client_id, user_id,
        |  CASE WHEN type = 'page' THEN 'page_view' ELSE event END
        |    AS event_name,
        |  CAST(epoch(date_trunc('second', timestamp)) AS BIGINT) * 1000000
        |    AS timestamp_micros
        |FROM env WHERE type IN ('track', 'page')""".stripMargin)),
    // K3: facebook conversions (hashed PII)
    ("k3_facebook",
      ((s, dir) =>
      SaasProjections.facebookConversions(env(s, dir))
        .select(col("event_name"), col("event_time"), col("em"),
          col("external_id"))),
      (adapterCte +
      """SELECT event AS event_name,
        |  CAST(epoch(date_trunc('second', timestamp)) AS BIGINT)
        |    AS event_time,
        |  CASE WHEN type = 'identify' THEN sha256(
        |    'user' || raw_user_id || '@example.com') END AS em,
        |  sha256(COALESCE(user_id, anonymous_id)) AS external_id
        |FROM env WHERE type = 'track'""".stripMargin)),
    // F2: UA parse over the envelope — full taxonomy columns
    ("f2_ua_parse",
      ((s, dir) => {
      val u = Scalars.parseUa(col("context.user_agent"))
      env(s, dir).select(
        col("message_id"),
        u.getField("name").as("browser"),
        u.getField("os_name").as("os"),
        u.getField("device_type").as("device"),
        u.getField("bot").as("is_bot"),
        u.getField("engine_name").as("engine"),
        u.getField("device_vendor").as("device_vendor"),
        u.getField("device_model").as("device_model"),
        u.getField("cpu_architecture").as("cpu"))
    }),
      (adapterCte +
      s"""SELECT message_id,
         |  $uaCase AS browser,
         |  CASE (raw_event_id % 3) WHEN 0 THEN 'macOS' WHEN 1 THEN 'iOS'
         |    ELSE 'unknown' END AS os,
         |  CASE (raw_event_id % 3) WHEN 1 THEN 'mobile' ELSE 'desktop' END
         |    AS device,
         |  (raw_event_id % 3) = 2 AS is_bot,
         |  CASE (raw_event_id % 3) WHEN 0 THEN 'Blink' ELSE 'unknown' END
         |    AS engine,
         |  CASE (raw_event_id % 3) WHEN 1 THEN 'Apple' ELSE '' END
         |    AS device_vendor,
         |  CASE (raw_event_id % 3) WHEN 1 THEN 'iPhone' ELSE '' END
         |    AS device_model,
         |  '' AS cpu
         |FROM env""".stripMargin)),
    // F2b: the planted-corpus taxonomy gate — 18 diverse real-world UA
    // shapes (Chromium skins, legacy EdgeHTML/Trident/Presto engines,
    // Apple/Samsung/Google devices, console/smarttv, amd64/arm64) with
    // every parsed field value-pinned in the oracle's VALUES table.
    ("f2b_ua_taxonomy",
      ((s, dir) => {
      import s.implicits._
      val df = taxonomyUas.zipWithIndex
        .map { case (u, i) => (i, u) }.toDF("ua_id", "ua")
      val u = Scalars.parseUa(col("ua"))
      df.select(col("ua_id"),
        u.getField("name").as("browser"),
        u.getField("version").as("version"),
        u.getField("major").as("major"),
        u.getField("engine_name").as("engine"),
        u.getField("engine_version").as("engine_version"),
        u.getField("os_name").as("os"),
        u.getField("os_version").as("os_version"),
        u.getField("device_type").as("device_type"),
        u.getField("device_vendor").as("device_vendor"),
        u.getField("device_model").as("device_model"),
        u.getField("cpu_architecture").as("cpu"),
        u.getField("bot").as("is_bot"))
    }),
      // every field hand-derived from the public taxonomy rules — NOT a
          // replay of the implementation
      """SELECT * FROM (VALUES
        |  (0,'Chrome','120.0','120','Blink','120.0','macOS','','desktop','','','',false),
        |  (1,'Safari','604.1','604','unknown','','iOS','17.0','mobile','Apple','iPhone','',false),
        |  (2,'unknown','','','unknown','','unknown','','desktop','','','',true),
        |  (3,'Firefox','121.0','121','Gecko','','Windows','10','desktop','','','',false),
        |  (4,'Chrome','120.0','120','Blink','120.0','Android','14','mobile','','','',false),
        |  (5,'Edge','120.0.1','120','Blink','120.0','Windows','10','desktop','','','amd64',false),
        |  (6,'Opera','105.0.0.0','105','Blink','119.0','Linux','','desktop','','','amd64',false),
        |  (7,'Safari','16.6','16','unknown','','iOS','16.6','tablet','Apple','iPad','',false),
        |  (8,'Chrome','118.0','118','Blink','118.0','Android','13','tablet','Samsung','SM-X700','',false),
        |  (9,'Chrome','120.0','120','Blink','120.0','ChromeOS','14541.0.0','desktop','','','amd64',false),
        |  (10,'Edge','18.18363','18','EdgeHTML','18.18363','Windows','10','desktop','','','amd64',false),
        |  (11,'IE','11.0','11','Trident','7.0','Windows','7','desktop','','','amd64',false),
        |  (12,'Samsung Internet','24.0','24','Blink','121.0','Android','14','mobile','Samsung','SM-S928B','',false),
        |  (13,'Chrome','121.0','121','Blink','121.0','Android','14','mobile','Google','Pixel 8 Pro','',false),
        |  (14,'unknown','','','WebKit','605.1.15','unknown','','console','','PlayStation 5','',false),
        |  (15,'unknown','','','unknown','','unknown','','smarttv','','','',false),
        |  (16,'Safari','17.2','17','WebKit','605.1.15','macOS','14.2','desktop','','','arm64',false),
        |  (17,'Opera','12.16','12','Presto','2.12.388','Windows','7','desktop','','','',false)
        |) t(ua_id, browser, version, major, engine, engine_version,
        |    os, os_version, device_type, device_vendor, device_model,
        |    cpu, is_bot)""".stripMargin),
    // F1: geo enrichment as broadcast lookup join (MaxMind stand-in:
    // a small dimension keyed by ip prefix)
    ("f1_geo_join",
      ((s, dir) => {
      val events = env(s, dir)
      val geoDim = s.range(0, 200)
        .select(col("id").cast("int").as("ip_prefix"),
          concat(lit("AS"), pmod(col("id"), lit(7))).as("asn"),
          (pmod(col("id"), lit(2)) === 0).as("is_datacenter"))
      events
        .withColumn("ip_prefix",
          split(col("context.ip"), "\\.").getItem(1).cast("int"))
        .join(broadcast(geoDim), Seq("ip_prefix"), "left")
        .groupBy(col("asn"), col("is_datacenter"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("anonymous_id")).as("n_users"))
    }),
      (adapterCte +
      """SELECT 'AS' || ((raw_user_id % 200) % 7) AS asn,
        |  ((raw_user_id % 200) % 2) = 0 AS is_datacenter,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COUNT(DISTINCT anonymous_id) AS BIGINT) AS n_users
        |FROM env GROUP BY 1, 2""".stripMargin)),
    // F1b: geo enrichment as a bucketed RANGE join (MaxMind shape: a dim
    // of (ip_lo, ip_hi] ranges; equi-join on /16 bucket + range residual,
    // not a nested loop)
    ("f1b_geo_range",
      ((s, dir) => {
      val ranges = s.range(0, 200).select(
        (lit(10L) * 16777216L + col("id") * 65536L).as("ip_lo"),
        (lit(10L) * 16777216L + col("id") * 65536L + 65535L).as("ip_hi"),
        element_at(array(lit("US"), lit("DE"), lit("FR"), lit("GB"), lit("CN")),
          (pmod(col("id"), lit(5)) + 1).cast("int")).as("range_country"),
        concat(lit("AS"), pmod(col("id"), lit(7))).as("range_asn"))
      operators.GeoIp.lookup(env(s, dir), col("context.ip"), ranges)
        .groupBy(col("range_country"), col("range_asn"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("anonymous_id")).as("n_users"))
    }),
      (adapterCte +
      """SELECT
        |  CASE ((raw_user_id % 200) % 5) WHEN 0 THEN 'US' WHEN 1 THEN 'DE'
        |    WHEN 2 THEN 'FR' WHEN 3 THEN 'GB' ELSE 'CN' END
        |    AS range_country,
        |  'AS' || ((raw_user_id % 200) % 7) AS range_asn,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COUNT(DISTINCT anonymous_id) AS BIGINT) AS n_users
        |FROM env GROUP BY 1, 2""".stripMargin)),
    // F1c: geo enrichment from a REAL .mmdb binary — the same 200 /16
    // ranges as f1b, but round-tripped through a spec-conformant
    // MaxMind DB file (tree + typed data section + metadata) written
    // and then decoded by graft.sources.Mmdb; the decoded ranges feed
    // the identical bucketed broadcast range join, so f1b's oracle
    // replays this query too.
    ("f1c_geo_mmdb",
      ((s, dir) => {
      val countries = Array("US", "DE", "FR", "GB", "CN")
      val entries = (0 until 200).map { i =>
        (10L * 16777216L + i.toLong * 65536L, 16, Map[String, Any](
          "country" -> Map[String, Any]("iso_code" -> countries(i % 5)),
          "traits" -> Map[String, Any]("asn" -> s"AS${i % 7}")))
      }
      val path = java.nio.file.Files
        .createTempFile("graft-geo", ".mmdb").toString
      sources.Mmdb.write(path, entries)
      val dim = sources.Mmdb.dim(s, path, Seq(
        "country.iso_code" -> "range_country", "traits.asn" -> "range_asn"))
      operators.GeoIp.lookup(env(s, dir), col("context.ip"), dim)
        .groupBy(col("range_country"), col("range_asn"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("anonymous_id")).as("n_users"))
    }),
      // identical semantics through the .mmdb round-trip
      (adapterCte +
      """SELECT
        |  CASE ((raw_user_id % 200) % 5) WHEN 0 THEN 'US' WHEN 1 THEN 'DE'
        |    WHEN 2 THEN 'FR' WHEN 3 THEN 'GB' ELSE 'CN' END
        |    AS range_country,
        |  'AS' || ((raw_user_id % 200) % 7) AS range_asn,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COUNT(DISTINCT anonymous_id) AS BIGINT) AS n_users
        |FROM env GROUP BY 1, 2""".stripMargin)),
    // J3b: temporal config lookup — AS-OF join events to versioned
    // connection configs (latest version at-or-before event time);
    // oracle = DuckDB's native ASOF JOIN
    ("j3b_asof_config",
      ((s, dir) => {
      val versions = s.createDataFrame(
        (for (c <- 0 to 3; v <- 0 to 2) yield (
          s"c$c",
          java.sql.Timestamp.valueOf(s"2024-0${v + 1}-0${c * 2 + 1} 00:00:00"),
          s"v$v-c$c",
          (v + 1) * 100 + c)).toSeq)
        .toDF("connection_id", "valid_from", "config_version", "budget")
      operators.AsOfJoin.asof(
        env(s, dir), versions, "connection_id", "timestamp", "valid_from",
        Seq("config_version", "budget"))
        .groupBy(col("connection_id"), col("config_version"), col("budget"))
        .agg(count(lit(1)).as("n_events"))
    }),
      (adapterCte +
      """, versions AS (
        |  SELECT 'c' || c AS connection_id,
        |    CAST(('2024-0' || (v + 1) || '-0' || (c * 2 + 1) || ' 00:00:00')
        |      AS TIMESTAMP) AS valid_from,
        |    'v' || v || '-c' || c AS config_version,
        |    (v + 1) * 100 + c AS budget
        |  FROM range(0, 4) t1(c), range(0, 3) t2(v))
        |SELECT e.connection_id, v.config_version, CAST(v.budget AS INT) AS budget,
        |  CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM env e ASOF LEFT JOIN versions v
        |  ON e.connection_id = v.connection_id AND e.timestamp >= v.valid_from
        |GROUP BY 1, 2, 3""".stripMargin)),
    // J3+J4: config lookup join + connection fan-out (explode)
    ("j4_fanout",
      ((s, dir) => {
      val events = env(s, dir)
      // connections config: each event's connection_id fans out to that
      // connection plus the catch-all c_all (J4); J3 = broadcast lookup
      val connections = s.createDataFrame(Seq(
        ("c0", "clickhouse", true), ("c1", "postgres", true),
        ("c2", "mixpanel", false), ("c3", "webhook", false),
        ("c_all", "s3", true))).toDF("connection_id", "destination", "uses_bulker")
      events
        .withColumn("connection_id",
          explode(array(col("connection_id"), lit("c_all"))))
        .join(broadcast(connections), Seq("connection_id"))
        .groupBy(col("connection_id"), col("destination"), col("uses_bulker"))
        .agg(count(lit(1)).as("n_events"))
    }),
      (adapterCte +
      """, fanned AS (
        |  SELECT connection_id FROM env
        |  UNION ALL SELECT 'c_all' FROM env),
        |conns AS (
        |  SELECT * FROM (VALUES
        |    ('c0', 'clickhouse', true), ('c1', 'postgres', true),
        |    ('c2', 'mixpanel', false), ('c3', 'webhook', false),
        |    ('c_all', 's3', true)) t(connection_id, destination, uses_bulker))
        |SELECT f.connection_id, c.destination, c.uses_bulker,
        |  CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM fanned f JOIN conns c USING (connection_id)
        |GROUP BY 1, 2, 3""".stripMargin)),
    // A3: event-stat report over the A2-shaped pre-agg (sumMerge analog)
    ("a3_event_stat",
      ((s, dir) => {
      val preAgg = env(s, dir)
        .withColumn("workspace_id", col("write_key"))
        .groupBy(date_trunc("minute", col("timestamp")).as("period"),
          col("workspace_id"), col("type").as("status"))
        .agg(count(lit(1)).as("events"))
      MetricsAgg.eventStatReport(preAgg, "wk0")
        .withColumn("period", date_format(col("period"), "yyyy-MM-dd"))
    }),
      (adapterCte +
      """SELECT strftime(date_trunc('day', timestamp), '%Y-%m-%d') AS period,
        |  type AS status, CAST(COUNT(*) AS BIGINT) AS events
        |FROM env WHERE write_key = 'wk0'
        |GROUP BY date_trunc('day', timestamp), type
        |ORDER BY 1 DESC, 3 DESC""".stripMargin)),
    // S6: changed-users scan (time-bounded distinct)
    ("s6_changed_users",
      ((s, dir) =>
      Profiles.changedUsers(env(s, dir),
        java.sql.Timestamp.valueOf("2024-01-05 00:00:00"),
        java.sql.Timestamp.valueOf("2024-01-20 00:00:00"))
        .orderBy(col("user_id"))),
      (adapterCte +
      """SELECT DISTINCT user_id FROM env
        |WHERE timestamp > TIMESTAMP '2024-01-05 00:00:00'
        |  AND timestamp <= TIMESTAMP '2024-01-20 00:00:00'
        |  AND user_id IS NOT NULL
        |ORDER BY user_id""".stripMargin)),
    // J1b: UR with configurable identifier fields — user_id AND the traits
    // JSON object are merged from the first identifying event onto
    // recovered anonymous events (email lands on page/click rows)
    ("j1b_identity_merge",
      ((s, dir) =>
      UserRecognition.resolveConfigured(env(s, dir),
        UserRecognition.URConfig(identifierFields = Seq("user_id", "traits")))
        .select(col("message_id"), col("user_id"),
          get_json_object(col("traits"), "$.email").as("email"),
          col("recognized"))),
      (adapterCte +
      """, marked AS (
        |  SELECT *,
        |    MIN(CASE WHEN user_id IS NOT NULL THEN timestamp END) OVER w
        |      AS ident_ts,
        |    FIRST_VALUE(CASE WHEN user_id IS NOT NULL THEN message_id END
        |      IGNORE NULLS) OVER w AS ident_mid
        |  FROM env
        |  WINDOW w AS (PARTITION BY anonymous_id
        |    ORDER BY timestamp, message_id
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
        |j AS (
        |  SELECT m.*, e.user_id AS ident_uid,
        |    CASE WHEN e.type = 'identify'
        |      THEN 'user' || e.raw_user_id || '@example.com' END AS ident_email
        |  FROM marked m LEFT JOIN env e ON e.message_id = m.ident_mid)
        |SELECT message_id,
        |  CASE WHEN user_id IS NOT NULL THEN user_id
        |       WHEN ident_ts IS NOT NULL
        |         AND ident_ts <= timestamp + INTERVAL 30 DAY
        |         THEN ident_uid END AS user_id,
        |  CASE WHEN user_id IS NOT NULL THEN
        |         (CASE WHEN type = 'identify'
        |            THEN 'user' || raw_user_id || '@example.com' END)
        |       WHEN ident_ts IS NOT NULL
        |         AND ident_ts <= timestamp + INTERVAL 30 DAY
        |         THEN ident_email END AS email,
        |  user_id IS NULL AND ident_ts IS NOT NULL
        |    AND ident_ts <= timestamp + INTERVAL 30 DAY AS recognized
        |FROM j""".stripMargin)),
    // J1c: dotted-path write-back (ref user-recognition.ts:66 `set(res,
    // path, f)`) — identity traits merged INTO the nested context struct,
    // which the operator rebuilds with withField. identify events carry
    // context.traits; click events carry an empty object (not an
    // identifier, but exercises the object-merge path); purchase events
    // identify via user_id only (their context.traits stays null).
    ("j1c_nested_writeback",
      ((s, dir) => {
      val uid = expr("substring(anonymous_id, 2)")
      val ctxTraits = when(col("type") === "identify",
          concat(lit("{\"email\": \"user"), uid,
            lit("@example.com\", \"vip\": true}")))
        .when(col("event") === "click", lit("{}"))
      val prepped = env(s, dir).withColumn("context",
        col("context").withField("traits", ctxTraits))
      UserRecognition.resolveConfigured(prepped,
        UserRecognition.URConfig(
          identifierFields = Seq("user_id", "context.traits"),
          jsonObjectFields = Set("context.traits")))
        .select(col("message_id"), col("user_id"),
          get_json_object(col("context.traits"), "$.email").as("email"),
          col("recognized"))
    }),
      (adapterCte +
      """, marked AS (
        |  SELECT *,
        |    MIN(CASE WHEN user_id IS NOT NULL THEN timestamp END) OVER w
        |      AS ident_ts,
        |    FIRST_VALUE(CASE WHEN user_id IS NOT NULL THEN message_id END
        |      IGNORE NULLS) OVER w AS ident_mid
        |  FROM env
        |  WINDOW w AS (PARTITION BY anonymous_id
        |    ORDER BY timestamp, message_id
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
        |j AS (
        |  SELECT m.*, e.user_id AS ident_uid,
        |    CASE WHEN e.type = 'identify'
        |      THEN 'user' || e.raw_user_id || '@example.com' END AS ident_email,
        |    m.ident_ts IS NOT NULL
        |      AND m.ident_ts <= m.timestamp + INTERVAL 30 DAY AS in_window
        |  FROM marked m LEFT JOIN env e ON e.message_id = m.ident_mid)
        |SELECT message_id,
        |  CASE WHEN user_id IS NOT NULL THEN user_id
        |       WHEN in_window THEN ident_uid END AS user_id,
        |  CASE WHEN user_id IS NOT NULL THEN
        |         (CASE WHEN type = 'identify'
        |            THEN 'user' || raw_user_id || '@example.com' END)
        |       WHEN in_window THEN ident_email END AS email,
        |  user_id IS NULL AND in_window AS recognized
        |FROM j""".stripMargin)),
    // J5b/A7/S5: the pluggable profile-UDF surface (per-user history scan
    // + arbitrary reduce), with a SQL-expressible reduce so the whole
    // groupByKey/mapGroups path is oracle-gated (not just spec'd)
    ("j5b_profile_fn",
      ((s, dir) => {
      val fn: Profiles.ProfileFunction = (_, events) => Map(
        "n_purchases" -> events.count(_.event == "purchase").toString,
        // (ts, type) tie-break — events.head would be order-unstable on
        // same-user timestamp collisions and the oracle could disagree
        "first_type" -> events.minBy(e => (e.timestamp.getTime, e.`type`)).`type`)
      Profiles.runProfileFunction(env(s, dir), fn)
        .toDF()
        .select(col("user_id"),
          element_at(col("properties"), "n_purchases").cast("long")
            .as("n_purchases"),
          element_at(col("properties"), "first_type").as("first_type"),
          unix_timestamp(col("updated_at")).as("updated_at_s"))
    }),
      (adapterCte +
      """, firsts AS (
        |  SELECT user_id, type AS first_type FROM (
        |    SELECT user_id, type,
        |      ROW_NUMBER() OVER (PARTITION BY user_id
        |        ORDER BY timestamp, type) AS rn
        |    FROM env WHERE user_id IS NOT NULL) WHERE rn = 1)
        |SELECT e.user_id,
        |  CAST(SUM(CASE WHEN e.event = 'purchase' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_purchases,
        |  f.first_type,
        |  CAST(epoch(date_trunc('second', MAX(e.timestamp))) AS BIGINT)
        |    AS updated_at_s
        |FROM env e JOIN firsts f USING (user_id)
        |WHERE e.user_id IS NOT NULL
        |GROUP BY e.user_id, f.first_type""".stripMargin)),
    // A1 mergeable-sketch form (uniqState/uniqMerge analogue), emitted
    // as the oracle-gateable error-bound property: the merged-sketch
    // estimate must land within 5% of the exact distinct count for
    // every (workspace, day) group (measured max relative error is
    // 1.9% at sf0.1, 0 below; DataSketches HLL is deterministic for a
    // fixed input so the bound check is hash-stable). The sketch
    // build + merge is still the timed work.
    ("a1_hll_sketch",
      ((s, dir) => {
      val e = env(s, dir).withColumn("workspace_id", col("write_key"))
      val approx = MetricsAgg.mergeActiveEvents(MetricsAgg.activeEventsSketch(e))
      val exact = MetricsAgg.activeEventsExact(e)
      approx.join(exact, Seq("workspace_id", "period"))
        .select(col("workspace_id"),
          date_format(col("period"), "yyyy-MM-dd").as("period"),
          col("count").as("exact_uniques"),
          (abs(col("active_events").cast("double") - col("count").cast("double"))
            <= col("count").cast("double") * 0.05).as("hll_ok"))
    }),
      (adapterCte +
      """SELECT write_key AS workspace_id,
        |  strftime(timestamp, '%Y-%m-%d') AS period,
        |  CAST(COUNT(DISTINCT message_id) AS BIGINT) AS exact_uniques,
        |  true AS hll_ok
        |FROM env GROUP BY 1, 2""".stripMargin)),
    // beyond-reference: exact interpolated percentiles per event type
    // (report-style latency/value distribution; approx_percentile is the
    // sketch form at scale, exact keeps the oracle hash-checkable)
    ("a5_value_percentiles",
      ((s, dir) =>
      s.read.parquet(s"$dir/events.parquet")
        .groupBy(col("event_type"))
        .agg(
          round(expr("percentile(value, 0.5)"), 4).as("p50"),
          round(expr("percentile(value, 0.95)"), 4).as("p95"),
          round(expr("percentile(value, 0.99)"), 4).as("p99"),
          count(lit(1)).as("n"))),
      """SELECT event_type,
        |  ROUND(quantile_cont(value, 0.5), 4) AS p50,
        |  ROUND(quantile_cont(value, 0.95), 4) AS p95,
        |  ROUND(quantile_cont(value, 0.99), 4) AS p99,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM events GROUP BY event_type""".stripMargin),
    // A5 sketch form — approx_percentile is the mergeable-quantile path
    // at 100 TB (KLL-style: micro-batches append partial sketches,
    // readers merge, exactly like the HLL story for distincts). Gated
    // as the RANK-SPACE error property (the guarantee the sketch
    // actually makes: accuracy 10000 bounds rank error to 1e-4, and
    // approx_percentile returns a real data value, not an
    // interpolation — so value-space deltas are meaningless at small
    // n): each approximate percentile must lie between the exact
    // interpolated percentiles at q +/- 1%. Both sides deterministic
    // -> hash-stable.
    ("a5b_percentile_sketch",
      ((s, dir) => {
      val e = graft.schema.EventSchema.readEvents(s, dir)
      def within(a: org.apache.spark.sql.Column,
                 lo: org.apache.spark.sql.Column,
                 hi: org.apache.spark.sql.Column) = a >= lo && a <= hi
      e.groupBy(col("event_type")).agg(
          expr("approx_percentile(value, array(0.5, 0.95, 0.99), 10000)")
            .as("ap"),
          expr("percentile(value, array(0.5, 0.95, 0.99))").as("ep"),
          expr("percentile(value, array(0.49, 0.51, 0.94, 0.96, 0.98, 1.0))")
            .as("eb"),
          count(lit(1)).as("n"))
        .select(col("event_type"), col("n"),
          round(element_at(col("ep"), 1), 4).as("p50"),
          round(element_at(col("ep"), 2), 4).as("p95"),
          round(element_at(col("ep"), 3), 4).as("p99"),
          (within(element_at(col("ap"), 1),
              element_at(col("eb"), 1), element_at(col("eb"), 2)) &&
            within(element_at(col("ap"), 2),
              element_at(col("eb"), 3), element_at(col("eb"), 4)) &&
            within(element_at(col("ap"), 3),
              element_at(col("eb"), 5), element_at(col("eb"), 6)))
            .as("sketch_ok"))
    }),
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  ROUND(quantile_cont(value, 0.5), 4) AS p50,
        |  ROUND(quantile_cont(value, 0.95), 4) AS p95,
        |  ROUND(quantile_cont(value, 0.99), 4) AS p99,
        |  true AS sketch_ok
        |FROM events GROUP BY event_type""".stripMargin),
    // beyond-reference: ROLLUP exposed through the Spark SQL surface
    ("a9_rollup",
      ((s, dir) =>
      s.read.parquet(s"$dir/lineitem.parquet")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
          count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
          col("sum_qty"), col("n"))),
      """SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
        |  COALESCE(l_linestatus, 'ALL') AS l_linestatus,
        |  ROUND(SUM(l_quantity), 2) AS sum_qty,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin),
    // beyond-reference: PIVOT report (daily event counts, one column per
    // event type — the classic dashboard crosstab). The type list is
    // pinned so the plan is a single partial-aggregable groupBy (no
    // distinct-scan to discover columns); the oracle replays it as
    // conditional aggregation, which is exactly what Spark lowers
    // pivot-with-values to
    ("a13_pivot",
      ((s, dir) =>
      graft.schema.EventSchema.readEvents(s, dir)
        .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd")
          .as("period"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("click", "error", "purchase", "signup", "view"))),
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS period,
        |  CAST(COUNT(*) FILTER (event_type = 'click') AS BIGINT) AS click,
        |  CAST(COUNT(*) FILTER (event_type = 'error') AS BIGINT) AS error,
        |  CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
        |  CAST(COUNT(*) FILTER (event_type = 'signup') AS BIGINT) AS signup,
        |  CAST(COUNT(*) FILTER (event_type = 'view') AS BIGINT) AS view
        |FROM events GROUP BY 1""".stripMargin),
    // beyond-reference: CUBE over (event_type, value band) — all four
    // grouping levels in one shuffle, every level map-side combinable
    ("a14_cube",
      ((s, dir) =>
      graft.schema.EventSchema.readEvents(s, dir)
        .withColumn("value_band", floor(col("value") / 25).cast("int"))
        .cube(col("event_type"), col("value_band"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .select(coalesce(col("event_type"), lit("ALL")).as("event_type"),
          coalesce(col("value_band").cast("string"), lit("ALL")).as("value_band"),
          col("n"), col("sum_value"))),
      """SELECT COALESCE(event_type, 'ALL') AS event_type,
        |  COALESCE(CAST(band AS VARCHAR), 'ALL') AS value_band,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  ROUND(SUM(value), 2) AS sum_value
        |FROM (SELECT event_type, CAST(FLOOR(value / 25) AS INT) AS band, value
        |      FROM events)
        |GROUP BY CUBE (event_type, band)""".stripMargin),
    // beyond-reference: ordered multi-step funnel (view -> signup ->
    // purchase, each step strictly after the previous) — all three step
    // times are windows over the SAME user partitioning, so the whole
    // funnel costs ONE shuffle; at 100 TB that is the floor for a
    // per-user ordered computation
    ("a10_funnel",
      ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = graft.schema.EventSchema.readEvents(s, dir)
      val w = Window.partitionBy(col("user_id"))
      val staged = e
        .withColumn("t1",
          min(when(col("event_type") === "view", col("ts"))).over(w))
        .withColumn("t2",
          min(when(col("event_type") === "signup" && col("ts") > col("t1"),
            col("ts"))).over(w))
        .withColumn("t3",
          min(when(col("event_type") === "purchase" && col("ts") > col("t2"),
            col("ts"))).over(w))
      staged.agg(
        countDistinct(when(col("t1").isNotNull, col("user_id"))).as("n_view"),
        countDistinct(when(col("t2").isNotNull, col("user_id"))).as("n_signup"),
        countDistinct(when(col("t3").isNotNull, col("user_id"))).as("n_purchase"))
    }),
      """WITH s1 AS (
        |  SELECT user_id,
        |    MIN(CASE WHEN event_type = 'view' THEN ts END) AS t1
        |  FROM events GROUP BY 1),
        |s2 AS (
        |  SELECT e.user_id, MIN(ts) AS t2
        |  FROM events e JOIN s1 USING (user_id)
        |  WHERE event_type = 'signup' AND ts > t1 GROUP BY 1),
        |s3 AS (
        |  SELECT e.user_id, MIN(ts) AS t3
        |  FROM events e JOIN s2 USING (user_id)
        |  WHERE event_type = 'purchase' AND ts > t2 GROUP BY 1)
        |SELECT
        |  CAST((SELECT COUNT(*) FROM s1 WHERE t1 IS NOT NULL) AS BIGINT)
        |    AS n_view,
        |  CAST((SELECT COUNT(*) FROM s2) AS BIGINT) AS n_signup,
        |  CAST((SELECT COUNT(*) FROM s3) AS BIGINT) AS n_purchase""".stripMargin),
    // beyond-reference: weekly cohort retention matrix (cohort = week of
    // first event; cell = distinct users from that cohort active in week
    // offset k) — two keyed aggregations + one equi-join on user_id
    ("a11_retention",
      ((s, dir) => {
      val e = graft.schema.EventSchema.readEvents(s, dir)
      val firsts = e.groupBy(col("user_id"))
        .agg(date_trunc("week", min(col("ts"))).as("cohort"))
      val active = e.select(col("user_id"),
        date_trunc("week", col("ts")).as("wk")).distinct()
      active.join(firsts, "user_id")
        .groupBy(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_week"),
          (datediff(col("wk"), col("cohort")) / 7).cast("int").as("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
    }),
      """WITH f AS (
        |  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort
        |  FROM events GROUP BY 1),
        |a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS wk
        |      FROM events)
        |SELECT strftime(cohort, '%Y-%m-%d') AS cohort_week,
        |  CAST(date_diff('day', cohort, wk) // 7 AS INT) AS week_offset,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM a JOIN f USING (user_id)
        |GROUP BY 1, 2""".stripMargin),
    // beyond-reference: EXACT heavy hitters (count >= n/k) in two passes
    // — per-partition Misra-Gries candidates (guaranteed superset), then
    // an exact count of candidates only. The oracle is the naive full
    // groupBy; at 100 TB only the candidates shuffle.
    ("a12_heavy_hitters",
      ((s, dir) =>
      graft.operators.Frequency.heavyHitters(
        graft.schema.EventSchema.readEvents(s, dir), "user_id", k = 150)),
      """SELECT CAST(user_id AS VARCHAR) AS item,
        |  CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM events WHERE user_id IS NOT NULL
        |GROUP BY 1
        |HAVING COUNT(*) * 150 >= (
        |  SELECT COUNT(*) FROM events WHERE user_id IS NOT NULL)""".stripMargin),
    // A12-beyond: count-min sketch — the MERGEABLE frequency sketch
    // (heavyHitters' exact-two-pass complement for shard/window merge).
    // md5-derived buckets make the sketch AND every min-estimate
    // engine-replayable, so the gate is hash-exact, not a bound check;
    // the output carries the exact count alongside so est >= cnt is
    // visible in the gated rows. CmsSpec holds mergeability + bounds.
    ("a12b_cms_freq",
      ((s, dir) => {
      val ev = graft.schema.EventSchema.readEvents(s, dir)
      val sk = graft.operators.Frequency.cmsSketch(ev, "user_id")
      graft.operators.Frequency.cmsEstimate(sk, ev, "user_id")
        .join(ev.filter(col("user_id").isNotNull)
          .groupBy(col("user_id").cast("string").as("item"))
          .agg(count(lit(1)).as("cnt")), Seq("item"))
        .select(col("item"), col("est"), col("cnt"))
    }),
      """WITH it AS (
        |  SELECT CAST(user_id AS VARCHAR) AS item FROM events
        |  WHERE user_id IS NOT NULL),
        |rs AS (SELECT unnest(range(4)) AS r),
        |bk AS (
        |  SELECT item, r,
        |    CAST(('0x' || substr(md5(item || '|' || CAST(r AS VARCHAR)),
        |      1, 8))::BIGINT % 512 AS INT) AS c
        |  FROM it CROSS JOIN rs),
        |sk AS (SELECT r, c, CAST(COUNT(*) AS BIGINT) AS cnt
        |       FROM bk GROUP BY r, c),
        |di AS (SELECT DISTINCT item FROM it),
        |db AS (
        |  SELECT item, r,
        |    CAST(('0x' || substr(md5(item || '|' || CAST(r AS VARCHAR)),
        |      1, 8))::BIGINT % 512 AS INT) AS c
        |  FROM di CROSS JOIN rs),
        |est AS (
        |  SELECT d.item, MIN(COALESCE(s.cnt, 0)) AS est
        |  FROM db d LEFT JOIN sk s ON d.r = s.r AND d.c = s.c
        |  GROUP BY d.item),
        |ex AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS cnt
        |       FROM it GROUP BY item)
        |SELECT e.item, e.est, x.cnt
        |FROM est e JOIN ex x ON e.item = x.item""".stripMargin),
    // J6-beyond: time-windowed attribution (view -> purchase within 10
    // min). Same Attribution.attribute code path the stream-stream join
    // runs (watermarks are analyzer-eliminated in batch), so the oracle
    // gates the join's time-bound semantics; StreamingSpec covers the
    // streaming state/append behavior.
    ("j6_attribution",
      ((s, dir) => {
      val ev = graft.schema.EventSchema.readEvents(s, dir)
        .filter(col("user_id").isNotNull)
      val imps = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"),
          col("event_id").cast("string").as("imp_id"))
      val convs = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"),
          col("event_id").cast("string").as("conv_id"))
      graft.streaming.Attribution.attribute(imps, convs, "user_id",
          windowSeconds = 600)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("lag_seconds")).as("sum_lag"))
    }),
      """WITH i AS (
        |  SELECT user_id, ts, CAST(event_id AS VARCHAR) AS imp_id
        |  FROM events WHERE user_id IS NOT NULL AND event_type = 'view'),
        |c AS (
        |  SELECT user_id, ts, CAST(event_id AS VARCHAR) AS conv_id
        |  FROM events WHERE user_id IS NOT NULL
        |    AND event_type = 'purchase'),
        |p AS (
        |  SELECT i.user_id,
        |    (epoch_ns(c.ts) // 1000000000)
        |      - (epoch_ns(i.ts) // 1000000000) AS lag
        |  FROM i JOIN c ON i.user_id = c.user_id
        |    AND c.ts >= i.ts AND c.ts <= i.ts + INTERVAL 600 SECONDS)
        |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |  CAST(SUM(lag) AS BIGINT) AS sum_lag
        |FROM p GROUP BY 1""".stripMargin),
    // beyond-reference: SCD Type-2 dimension maintenance. A per-user
    // "tier" attribute (value band of the day's latest event) is folded
    // into a versioned dim in TWO incremental merges (initial load up to
    // Jan 16, then the rest) — the oracle replays the whole chain in ONE
    // window pass, so the gate proves incremental folding == full
    // rebuild (Scd2.merge's associativity contract), plus the
    // valid_from/valid_to/is_current chain arithmetic itself.
    ("j7_scd2",
      ((s, dir) => {
      import graft.operators.Scd2
      val ev = graft.schema.EventSchema.readEvents(s, dir)
      val tier = when(col("value") >= 200, "high")
        .when(col("value") >= 50, "mid").otherwise("low")
      val updates = ev
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(max_by(struct(col("ts"), tier.as("tier")),
          struct(col("ts"), col("event_id"))).as("_r"))
        .select(col("user_id"), col("_r.ts").as("ts"), col("_r.tier").as("tier"))
      val split = lit("2024-01-16").cast("timestamp")
      val d0 = Scd2.emptyDim(updates, "user_id", "ts", Seq("tier"))
      val d1 = Scd2.merge(d0, updates.filter(col("ts") < split),
        "user_id", "ts", Seq("tier"))
      Scd2.merge(d1, updates.filter(col("ts") >= split),
        "user_id", "ts", Seq("tier"))
    }),
      """WITH up AS (
        |  SELECT user_id, ts, tier FROM (
        |    SELECT user_id, ts,
        |      CASE WHEN value >= 200 THEN 'high'
        |           WHEN value >= 50 THEN 'mid' ELSE 'low' END AS tier,
        |      ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE)
        |                         ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM events) WHERE rn = 1),
        |chg AS (
        |  SELECT user_id, ts, tier FROM (
        |    SELECT user_id, ts, tier,
        |      LAG(tier) OVER (PARTITION BY user_id ORDER BY ts) AS prev
        |    FROM up)
        |  WHERE prev IS NULL OR tier <> prev)
        |SELECT user_id, tier, ts AS valid_from,
        |  LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to,
        |  LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |    AS is_current
        |FROM chg""".stripMargin),
    // skew remedies: both must be ROW-IDENTICAL to the plain inner join
    // (the oracle is the plain join + aggregate). saltedJoin fans each
    // partkey over 8 reducers; hotColdJoin broadcast-joins the heavy-
    // hitter keys and shuffle-joins the cold tail.
    ("skew_salted_join",
      ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_partkey"), col("l_quantity"))
      val part = s.read.parquet(s"$dir/part.parquet")
        .select(col("p_partkey").as("l_partkey"), col("p_brand"))
      graft.operators.SkewJoin.saltedJoin(li, part, Seq("l_partkey"),
          saltFactor = 8)
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_quantity")), 2).as("sum_qty"))
    }),
      """SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n,
        |  ROUND(SUM(l_quantity), 2) AS sum_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1""".stripMargin),
    ("skew_hotcold_join",
      ((s, dir) => {
      val ev = graft.schema.EventSchema.readEvents(s, dir)
        .filter(col("user_id").isNotNull)
        .select(col("user_id"), col("event_type"))
      val users = graft.schema.EventSchema.readEvents(s, dir)
        .filter(col("user_id").isNotNull)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"))
      graft.operators.SkewJoin.hotColdJoin(ev, users, "user_id",
          hotKeyFraction = 0.005)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("n_events")).as("sum_user_events"))
    }),
      """WITH ev AS (
        |  SELECT user_id, event_type FROM events WHERE user_id IS NOT NULL),
        |u AS (
        |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(n_events) AS BIGINT) AS sum_user_events
        |FROM ev JOIN u USING (user_id)
        |GROUP BY 1""".stripMargin),
    // beyond-reference: declarative data-quality battery (dbt-test /
    // Great-Expectations family) — each check reduces to one violation
    // count, the union is the promotion gate. Includes checks that
    // REALLY fire on this data (qty<=30, date ordering) so the gate
    // proves the counting, not just a row of zeros.
    // order-independent table checksum (cross-warehouse sync verify):
    // per-row md5 digest folded by XOR and an exact SUM — commutative,
    // so no sort; the oracle recomputes the identical checksum in
    // DuckDB, which is the actual production use (warehouse-side SQL
    // checksum vs pipeline-side checksum)
    ("dq_checksum",
      ((s, dir) => {
      import graft.operators.DataChecks
      val liT = s.read.parquet(s"$dir/lineitem.parquet")
      val ordT = s.read.parquet(s"$dir/orders.parquet")
      DataChecks.tableChecksum(liT,
          Seq("l_orderkey", "l_linenumber", "l_returnflag",
            "l_linestatus"), "lineitem")
        .unionByName(DataChecks.tableChecksum(ordT,
          Seq("o_orderkey", "o_custkey", "o_orderstatus",
            "o_orderpriority"), "orders"))
        .withColumn("sum_sig", col("sum_sig").cast("string"))
    }),
      """WITH lv AS (
        |  SELECT CAST(('0x' || substring(md5(
        |    COALESCE(CAST(l_orderkey AS VARCHAR), chr(0)) || chr(1) ||
        |    COALESCE(CAST(l_linenumber AS VARCHAR), chr(0)) || chr(1) ||
        |    COALESCE(l_returnflag, chr(0)) || chr(1) ||
        |    COALESCE(l_linestatus, chr(0))), 1, 15)) AS BIGINT) AS v
        |  FROM lineitem),
        |ov AS (
        |  SELECT CAST(('0x' || substring(md5(
        |    COALESCE(CAST(o_orderkey AS VARCHAR), chr(0)) || chr(1) ||
        |    COALESCE(CAST(o_custkey AS VARCHAR), chr(0)) || chr(1) ||
        |    COALESCE(o_orderstatus, chr(0)) || chr(1) ||
        |    COALESCE(o_orderpriority, chr(0))), 1, 15)) AS BIGINT) AS v
        |  FROM orders)
        |SELECT 'lineitem' AS tbl, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(bit_xor(v) AS BIGINT) AS xor_sig,
        |  CAST(CAST(SUM(v) AS HUGEINT) AS VARCHAR) AS sum_sig
        |FROM lv
        |UNION ALL
        |SELECT 'orders', CAST(COUNT(*) AS BIGINT),
        |  CAST(bit_xor(v) AS BIGINT),
        |  CAST(CAST(SUM(v) AS HUGEINT) AS VARCHAR)
        |FROM ov""".stripMargin),
    ("dq_checks",
      ((s, dir) => {
      import graft.operators.DataChecks
      val liT = s.read.parquet(s"$dir/lineitem.parquet")
      val ordT = s.read.parquet(s"$dir/orders.parquet")
      val custT = s.read.parquet(s"$dir/customer.parquet")
      DataChecks.run(
        DataChecks.unique(ordT, Seq("o_orderkey"), "orders_pk_unique"),
        DataChecks.referential(liT, "l_orderkey", ordT, "o_orderkey",
          "lineitem_orderkey_ref"),
        DataChecks.referential(ordT, "o_custkey", custT, "c_custkey",
          "orders_custkey_ref"),
        DataChecks.notNull(liT, Seq("l_orderkey", "l_linenumber"),
          "lineitem_keys_notnull"),
        DataChecks.expression(liT,
          col("l_quantity") >= 1 && col("l_quantity") <= 30,
          "lineitem_qty_le30"),
        DataChecks.expression(liT,
          col("l_discount") >= 0 && col("l_discount") <= 0.1,
          "lineitem_discount_range"))
    }),
      """SELECT * FROM (
        |  SELECT 'orders_pk_unique' AS check_name,
        |    CAST((SELECT COALESCE(SUM(n - 1), 0) FROM (
        |        SELECT COUNT(*) AS n FROM orders
        |        WHERE o_orderkey IS NOT NULL GROUP BY o_orderkey) t)
        |      + (SELECT COUNT(*) FROM orders WHERE o_orderkey IS NULL)
        |      AS BIGINT) AS violations
        |  UNION ALL
        |  SELECT 'lineitem_orderkey_ref',
        |    CAST((SELECT COUNT(*) FROM lineitem l
        |      WHERE l_orderkey IS NOT NULL AND NOT EXISTS (
        |        SELECT 1 FROM orders o
        |        WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
        |  UNION ALL
        |  SELECT 'orders_custkey_ref',
        |    CAST((SELECT COUNT(*) FROM orders o
        |      WHERE o_custkey IS NOT NULL AND NOT EXISTS (
        |        SELECT 1 FROM customer c
        |        WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
        |  UNION ALL
        |  SELECT 'lineitem_keys_notnull',
        |    CAST((SELECT COUNT(*) FROM lineitem
        |      WHERE l_orderkey IS NULL OR l_linenumber IS NULL) AS BIGINT)
        |  UNION ALL
        |  SELECT 'lineitem_qty_le30',
        |    CAST((SELECT COUNT(*) FROM lineitem WHERE NOT COALESCE(
        |      l_quantity >= 1 AND l_quantity <= 30, FALSE)) AS BIGINT)
        |  UNION ALL
        |  SELECT 'lineitem_discount_range',
        |    CAST((SELECT COUNT(*) FROM lineitem WHERE NOT COALESCE(
        |      l_discount >= 0 AND l_discount <= 0.1, FALSE)) AS BIGINT)
        |) ORDER BY check_name""".stripMargin),
    // functional-dependency audit: one that HOLDS (nation determines
    // region — the normalized-dimension contract), one that VIOLATES
    // (customer does not determine order priority), and a composite
    // determinant that holds by construction (the orders pk determines
    // everything). Exact counts, one hash agg per dependency.
    ("dq_fd",
      ((s, dir) => {
      import graft.operators.DataChecks
      val nat = s.read.parquet(s"$dir/nation.parquet")
      val ord = s.read.parquet(s"$dir/orders.parquet")
      DataChecks.functionalDependency(nat, Seq("n_nationkey"),
          "n_regionkey", "nation_determines_region")
        .unionByName(DataChecks.functionalDependency(ord,
          Seq("o_custkey"), "o_orderpriority",
          "custkey_determines_priority"))
        .unionByName(DataChecks.functionalDependency(ord,
          Seq("o_orderkey"), "o_orderstatus",
          "orderkey_determines_status"))
        .orderBy(col("dependency"))
    }),
      """WITH f AS (
        |  SELECT 'nation_determines_region' AS dependency,
        |    COUNT(*) AS g,
        |    SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS v,
        |    SUM(CASE WHEN nd > 1 THEN n ELSE 0 END) AS r
        |  FROM (SELECT n_nationkey,
        |      COUNT(DISTINCT n_regionkey) AS nd, COUNT(*) AS n
        |    FROM nation GROUP BY 1)
        |  UNION ALL
        |  SELECT 'custkey_determines_priority', COUNT(*),
        |    SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END),
        |    SUM(CASE WHEN nd > 1 THEN n ELSE 0 END)
        |  FROM (SELECT o_custkey,
        |      COUNT(DISTINCT o_orderpriority) AS nd, COUNT(*) AS n
        |    FROM orders GROUP BY 1)
        |  UNION ALL
        |  SELECT 'orderkey_determines_status', COUNT(*),
        |    SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END),
        |    SUM(CASE WHEN nd > 1 THEN n ELSE 0 END)
        |  FROM (SELECT o_orderkey,
        |      COUNT(DISTINCT o_orderstatus) AS nd, COUNT(*) AS n
        |    FROM orders GROUP BY 1))
        |SELECT dependency, CAST(g AS BIGINT) AS n_groups,
        |  CAST(v AS BIGINT) AS n_violating_groups,
        |  CAST(r AS BIGINT) AS n_rows_in_violations
        |FROM f ORDER BY dependency""".stripMargin),
    // Merkle-style cross-warehouse reconciliation: a replica of orders
    // (o_orderkey is the unique pk — the dq_checks gate proves it) with
    // three planted drift classes — ~1/997 rows dropped
    // (missing_in_replica), ~1/997 with a flipped status
    // (value_mismatch), ~1/997 extra re-keyed rows (missing_in_source).
    // bucketDiff finds EXACTLY the drifted keys via per-bucket digests +
    // a key join restricted to the differing buckets; the oracle is the
    // naive full outer join, so any key the pruning wrongly skipped (or
    // invented) hash-mismatches.
    ("dq_bucket_diff",
      ((s, dir) => {
      import graft.operators.DataChecks
      val src = s.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_orderpriority"))
      val m = pmod(col("o_orderkey"), lit(997))
      val rep = src.withColumn("_m", m)
        .filter(col("_m") =!= 0)
        .withColumn("o_orderstatus",
          when(col("_m") === 1, lit("X")).otherwise(col("o_orderstatus")))
        .drop("_m")
        .unionByName(src.withColumn("_m", m).filter(col("_m") === 2)
          .withColumn("o_orderkey", -col("o_orderkey"))
          .drop("_m"))
      DataChecks.bucketDiff(src, rep,
        Seq("o_orderkey"),
        Seq("o_orderstatus", "o_orderpriority"), nBuckets = 4096)
    }),
      """WITH src AS (
        |  SELECT o_orderkey, o_orderstatus, o_orderpriority,
        |    o_orderkey % 997 AS m
        |  FROM orders),
        |rep AS (
        |  SELECT o_orderkey,
        |    CASE WHEN m = 1 THEN 'X' ELSE o_orderstatus
        |      END AS o_orderstatus,
        |    o_orderpriority
        |  FROM src WHERE m <> 0
        |  UNION ALL
        |  SELECT -o_orderkey, o_orderstatus, o_orderpriority
        |  FROM src WHERE m = 2)
        |SELECT COALESCE(s.o_orderkey, r.o_orderkey) AS o_orderkey,
        |  CASE WHEN r.o_orderkey IS NULL THEN 'missing_in_replica'
        |       WHEN s.o_orderkey IS NULL THEN 'missing_in_source'
        |       ELSE 'value_mismatch' END AS status
        |FROM src s FULL OUTER JOIN rep r
        |  ON s.o_orderkey = r.o_orderkey
        |WHERE r.o_orderkey IS NULL OR s.o_orderkey IS NULL
        |  OR s.o_orderstatus <> r.o_orderstatus
        |  OR s.o_orderpriority <> r.o_orderpriority""".stripMargin),
    // Population Stability Index between two corpus snapshots (even vs
    // odd doc ids) over token-length buckets — the distribution-drift
    // audit before accepting a refreshed dataset; shares in exact
    // integer micros, the only float is the final per-bucket ln
    // (rounded 6 dp on both sides, the PMI precedent)
    ("dq_psi_drift",
      ((s, dir) => {
      import graft.functions.TextFunctions
      val d = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"),
          size(TextFunctions.words(col("text"))).cast("long").as("n"))
      graft.operators.DataChecks.psi(
        d.filter(pmod(col("doc_id"), lit(2)) === 0),
        d.filter(pmod(col("doc_id"), lit(2)) === 1),
        "n", edges = Seq(10L, 30L, 60L, 100L))
    }),
      """WITH t AS (
        |  SELECT doc_id, CAST(len(list_filter(
        |    string_split_regex(lower(text), '\s+'),
        |    w -> len(w) > 0)) AS BIGINT) AS n
        |  FROM documents),
        |ab AS (
        |  SELECT CASE WHEN n <= 10 THEN 0 WHEN n <= 30 THEN 1
        |    WHEN n <= 60 THEN 2 WHEN n <= 100 THEN 3 ELSE 4
        |    END AS bucket,
        |    CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS isa
        |  FROM t),
        |bk(bucket) AS (VALUES (0), (1), (2), (3), (4)),
        |c AS (
        |  SELECT bk.bucket,
        |    CAST(COALESCE(SUM(CASE WHEN isa = 1 THEN 1 END), 0)
        |      AS BIGINT) AS n_a,
        |    CAST(COALESCE(SUM(CASE WHEN isa = 0 THEN 1 END), 0)
        |      AS BIGINT) AS n_b
        |  FROM bk LEFT JOIN ab ON ab.bucket = bk.bucket GROUP BY 1),
        |tt AS (SELECT GREATEST(SUM(n_a), 1) AS ta,
        |              GREATEST(SUM(n_b), 1) AS tb FROM c),
        |p AS (
        |  SELECT c.bucket, c.n_a, c.n_b,
        |    CAST(GREATEST(GREATEST(c.n_a, 1) * 1000000 // tt.ta, 1)
        |      AS BIGINT) AS pa_micro,
        |    CAST(GREATEST(GREATEST(c.n_b, 1) * 1000000 // tt.tb, 1)
        |      AS BIGINT) AS pb_micro
        |  FROM c, tt)
        |SELECT CAST(bucket AS INT) AS bucket,
        |  CAST(CASE bucket WHEN 0 THEN 10 WHEN 1 THEN 30 WHEN 2 THEN 60
        |    WHEN 3 THEN 100 END AS BIGINT) AS edge,
        |  n_a, n_b, pa_micro, pb_micro,
        |  ROUND((pa_micro - pb_micro) / 1e6
        |    * LN(CAST(pa_micro AS DOUBLE) / pb_micro), 6) AS psi_term
        |FROM p""".stripMargin),
    // k-anonymity audit over the released customer quasi-identifiers
    // (nation, market segment, account-balance band): every class below
    // k=5 is a re-identifiable combination. Exact hash aggregation; the
    // oracle is the same GROUP BY + HAVING.
    ("priv_kanon",
      ((s, dir) => {
      val c = s.read.parquet(s"$dir/customer.parquet")
        .withColumn("bal_band",
          floor(col("c_acctbal") / 1000).cast("long"))
      graft.operators.Privacy.kAnonymityViolations(
        c, Seq("c_nationkey", "c_mktsegment", "bal_band"), k = 5)
    }),
      """SELECT c_nationkey, c_mktsegment,
        |  CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_band,
        |  CAST(COUNT(*) AS BIGINT) AS class_size
        |FROM customer GROUP BY 1, 2, 3
        |HAVING COUNT(*) < 5""".stripMargin),
    // l-diversity: a k-anonymous class is still unsafe when everyone in
    // it shares the sensitive value — classes over (nation, balance
    // band) whose market segment takes < 3 distinct values.
    ("priv_ldiv",
      ((s, dir) => {
      val c = s.read.parquet(s"$dir/customer.parquet")
        .withColumn("bal_band",
          floor(col("c_acctbal") / 1000).cast("long"))
      graft.operators.Privacy.lDiversityViolations(
        c, Seq("c_nationkey", "bal_band"), "c_mktsegment", l = 3)
    }),
      """SELECT c_nationkey,
        |  CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_band,
        |  CAST(COUNT(*) AS BIGINT) AS class_size,
        |  CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT)
        |    AS distinct_sensitive
        |FROM customer GROUP BY 1, 2
        |HAVING COUNT(DISTINCT c_mktsegment) < 3""".stripMargin),
    // ε-differentially-private released counts per (event_type, day):
    // Laplace(1/ε) noise from the deterministic 48-bit md5 uniform —
    // ln-only inverse CDF, so the oracle re-derives the identical noise
    // and the integer-rounded release is hash-exact (the Gumbel
    // resampling precedent applied to private aggregate release).
    ("priv_dp_counts",
      ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
      graft.operators.Privacy.dpCounts(ev,
        Seq(col("event_type"), date_format(col("ts"), "yyyy-MM-dd")),
        Seq("event_type", "day"), eps = 1.0, seed = 7L)
    }),
      """WITH g AS (
        |  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
        |    COUNT(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |n AS (
        |  SELECT event_type, day, cnt,
        |    (CAST(('0x' || substring(md5(
        |        '7' || chr(1) || event_type || chr(1) || day),
        |      1, 12)) AS BIGINT) + 0.5) / 281474976710656.0 AS u
        |  FROM g)
        |SELECT event_type, day,
        |  GREATEST(0, CAST(ROUND(cnt
        |    - 1.0 * sign(u - 0.5) * ln(1 - 2 * abs(u - 0.5)))
        |    AS BIGINT)) AS noisy_count
        |FROM n""".stripMargin),
    // hierarchy path flattening (the OASST conversation-tree /
    // taxonomy shape): heap-rule parents over doc ids make a real
    // multi-level tree; pointer doubling collapses every chain in
    // O(log depth) joins; the oracle walks the same tree with WITH
    // RECURSIVE — ids, roots, depths, and path strings replay exactly
    ("g6_hierarchy",
      ((s, dir) => {
      val n = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id").as("id"),
          when(col("doc_id") > 0, expr("(doc_id - 1) div 2")).as("par"))
      graft.operators.Hierarchy.flattenPaths(n, "id", "par",
        maxDepth = 64)
    }),
      """WITH RECURSIVE n AS (
        |  SELECT doc_id AS id,
        |    CASE WHEN doc_id > 0 THEN (doc_id - 1) // 2 END AS par
        |  FROM documents),
        |walk AS (
        |  SELECT id AS sid, id AS cur, par, CAST(0 AS BIGINT) AS depth,
        |    CAST(id AS VARCHAR) AS path
        |  FROM n
        |  UNION ALL
        |  SELECT w.sid, p.id, p.par, w.depth + 1,
        |    w.path || '>' || CAST(p.id AS VARCHAR)
        |  FROM walk w JOIN n p ON w.par = p.id WHERE w.depth < 64)
        |SELECT sid AS id, CAST(cur AS BIGINT) AS root, depth, path,
        |  TRUE AS resolved
        |FROM walk WHERE par IS NULL""".stripMargin),
    // collaborative filtering (implicit ALS over the customer×part
    // purchase matrix): the trained-operator property gate — on the
    // deterministic ~20% holdout, the model must rank each held-out
    // positive above its deterministic negative counterpart well above
    // chance. Counts (train/holdout/scored) are SQL-replayable from the
    // same split rules; the AUC floor carries a wide margin so seed-
    // stable float jitter cannot flip it (the td_quality_classifier
    // pattern for learned operators).
    ("g4_als_recs",
      ((s, dir) => {
      import graft.operators.Recommend
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      val ord = s.read.parquet(s"$dir/orders.parquet")
      // The raw TPC-H purchase matrix is uniformly random — no latent
      // structure, so CF legitimately cannot beat chance on it
      // (measured 0.48). Plant recoverable preference structure the
      // planted-dup way: keep a purchase when the user's and item's
      // taste cluster (mod 8) agree, plus ~10% hash noise; the model
      // must REDISCOVER the clusters from interactions alone.
      val rawPairs = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .select(col("o_custkey").cast("int").as("user"),
          pmod(col("l_partkey"), lit(100)).cast("int").as("item"))
      val noise = pmod(conv(substring(md5(concat_ws(":", lit("z"),
        col("user"), col("item"))), 1, 8), 16, 10).cast("long"), lit(10))
      val inter = rawPairs
        .filter(pmod(col("user"), lit(8)) === pmod(col("item"), lit(8)) ||
          noise === 0)
        .groupBy("user", "item")
        .agg(count(lit(1)).cast("float").as("cnt"))
      // md5 split, NOT a modular rule: (u*31+i) % 5 == 0 holds out an
      // entire item-residue class per user, and ALS then LEARNS that
      // structured absence as negative signal (measured: pairwise
      // accuracy 0.11 — systematically anti-ranked). The hash split has
      // no residue structure; the same md5 arithmetic replays in SQL.
      val pairHash = conv(substring(md5(concat_ws(":",
        col("user"), col("item"))), 1, 8), 16, 10).cast("long")
      val hold = pmod(pairHash, lit(5)) === 0
      val train = inter.filter(!hold)
      val holdout = inter.filter(hold)
        .select(col("user"), col("item").as("pos_item"),
          pmod(conv(substring(md5(concat_ws(":", lit("n"),
            col("user"), col("item"))), 1, 8), 16, 10).cast("long"),
            lit(100)).cast("int").as("neg_item"))
      val model = Recommend.trainImplicit(train, rank = 12, maxIter = 10)
      val posScored = Recommend.scorePairs(model,
          holdout.select(col("user"), col("pos_item").as("item")))
        .select(col("user"), col("item").as("pos_item"),
          col("prediction").as("pos_score"))
      val negScored = Recommend.scorePairs(model,
          holdout.select(col("user"), col("pos_item"),
            col("neg_item").as("item")))
        .select(col("user"), col("pos_item"),
          col("prediction").as("neg_score"))
      val paired = posScored.join(negScored, Seq("user", "pos_item"))
      // measured 0.650 / 0.686 / 0.683 at sf0.001/0.01/0.1 — the floor
      // leaves ≥0.07 margin at every SF while staying far above the
      // ~0.5 chance level
      val floor = 0.58
      paired.agg(
          count(lit(1)).as("n_scored"),
          sum(when(col("pos_score") > col("neg_score"), 1L)
            .otherwise(0L)).as("_correct"))
        .select(col("n_scored"),
          (col("_correct").cast("double") / col("n_scored") >= floor)
            .as("auc_ok"))
        .crossJoin(train.agg(count(lit(1)).as("n_train")))
        .crossJoin(holdout.agg(count(lit(1)).as("n_holdout")))
        .select(col("n_train"), col("n_holdout"), col("n_scored"),
          col("auc_ok"))
    }),
      """WITH rawp AS (
        |  SELECT CAST(o_custkey AS INT) AS u,
        |    CAST(l_partkey % 100 AS INT) AS i
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |inter AS (
        |  SELECT u, i FROM rawp
        |  WHERE u % 8 = i % 8
        |    OR CAST(('0x' || substring(md5('z:' || u || ':' || i),
        |      1, 8)) AS BIGINT) % 10 = 0
        |  GROUP BY u, i),
        |sp AS (
        |  SELECT u, i,
        |    CAST(('0x' || substring(md5(u || ':' || i), 1, 8))
        |      AS BIGINT) % 5 = 0 AS hold
        |  FROM inter),
        |tr AS (SELECT u, i FROM sp WHERE NOT hold),
        |ho AS (SELECT u, i,
        |    CAST(CAST(('0x' || substring(md5('n:' || u || ':' || i),
        |      1, 8)) AS BIGINT) % 100 AS INT) AS neg
        |  FROM sp WHERE hold),
        |tu AS (SELECT DISTINCT u FROM tr),
        |ti AS (SELECT DISTINCT i FROM tr)
        |SELECT CAST((SELECT COUNT(*) FROM tr) AS BIGINT) AS n_train,
        |  CAST((SELECT COUNT(*) FROM ho) AS BIGINT) AS n_holdout,
        |  CAST((SELECT COUNT(*) FROM ho
        |    WHERE u IN (SELECT u FROM tu) AND i IN (SELECT i FROM ti)
        |      AND neg IN (SELECT i FROM ti)) AS BIGINT) AS n_scored,
        |  TRUE AS auc_ok""".stripMargin),
    // KMV/theta sketch set operations: per event-type pair, the
    // INTERSECTION estimate HLL cannot provide (audience overlap at
    // sketch cost), with the exact overlap alongside and the union
    // sketch md5'd — every value integer-arithmetic replayable, so the
    // sketch pipeline is HASH-gated, not just error-bounded (the
    // a12b_cms_freq precedent for the theta family).
    ("a23_theta_overlap",
      ((s, dir) => {
      import graft.operators.Frequency
      val ev = s.read.parquet(s"$dir/events.parquet")
      val k = 64
      val sk = Frequency.kmvSketches(ev, "event_type", "user_id", k)
      val d = ev.select(col("event_type"), col("user_id")).distinct()
      val exact = d.alias("x").join(d.alias("y"), Seq("user_id"))
        .filter(col("x.event_type") < col("y.event_type"))
        .groupBy(col("x.event_type").as("ta"),
          col("y.event_type").as("tb"))
        .agg(countDistinct(col("user_id")).as("exact_overlap"))
      sk.alias("a").join(sk.alias("b"), col("a.key") < col("b.key"))
        .select(col("a.key").as("ta"), col("b.key").as("tb"),
          Frequency.kmvDistinctEstimate(col("a.sketch"), k).as("est_a"),
          Frequency.kmvDistinctEstimate(col("b.sketch"), k).as("est_b"),
          Frequency.kmvIntersectEstimate(col("a.sketch"),
            col("b.sketch"), k).as("est_overlap"),
          md5(concat_ws(",", transform(
            Frequency.kmvUnion(col("a.sketch"), col("b.sketch"), k),
            _.cast("string")))).as("union_md5"))
        .join(exact, Seq("ta", "tb"))
    }),
      """WITH uh AS (
        |  SELECT DISTINCT event_type AS key,
        |    CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)),
        |      1, 12)) AS BIGINT) AS h
        |  FROM events),
        |rk AS (SELECT key, h,
        |    ROW_NUMBER() OVER (PARTITION BY key ORDER BY h) AS rn
        |  FROM uh),
        |sk AS (SELECT key, list_sort(list(h)) AS sketch
        |  FROM rk WHERE rn <= 64 GROUP BY key),
        |d AS (SELECT DISTINCT event_type, user_id FROM events),
        |ex AS (
        |  SELECT x.event_type AS ta, y.event_type AS tb,
        |    CAST(COUNT(DISTINCT x.user_id) AS BIGINT) AS exact_overlap
        |  FROM d x JOIN d y ON x.user_id = y.user_id
        |  WHERE x.event_type < y.event_type GROUP BY 1, 2),
        |pr AS (
        |  SELECT s1.key AS ta, s2.key AS tb,
        |    s1.sketch AS sa, s2.sketch AS sb,
        |    CASE WHEN len(s1.sketch) < 64 THEN 281474976710656
        |      ELSE s1.sketch[64] + 1 END AS tha,
        |    CASE WHEN len(s2.sketch) < 64 THEN 281474976710656
        |      ELSE s2.sketch[64] + 1 END AS thb
        |  FROM sk s1 JOIN sk s2 ON s1.key < s2.key),
        |est AS (
        |  SELECT ta, tb,
        |    CASE WHEN len(sa) < 64 THEN CAST(len(sa) AS DOUBLE)
        |      ELSE ROUND(63 * 281474976710656.0 / sa[64], 2)
        |    END AS est_a,
        |    CASE WHEN len(sb) < 64 THEN CAST(len(sb) AS DOUBLE)
        |      ELSE ROUND(63 * 281474976710656.0 / sb[64], 2)
        |    END AS est_b,
        |    ROUND(len(list_intersect(
        |        list_filter(sa, x -> x < LEAST(tha, thb)),
        |        list_filter(sb, x -> x < LEAST(tha, thb))))
        |      * 281474976710656.0 / LEAST(tha, thb), 2) AS est_overlap,
        |    md5(array_to_string(list_sort(list_distinct(
        |      list_concat(sa, sb)))[1:64], ',')) AS union_md5
        |  FROM pr)
        |SELECT est.ta, est.tb, est_a, est_b, est_overlap, union_md5,
        |  exact_overlap
        |FROM est JOIN ex ON est.ta = ex.ta AND est.tb = ex.tb""".stripMargin),
    // consent enforcement at ingest (the preventive GDPR half next to
    // k10's curative deleteWhere): users ending a deterministic opt-out
    // rule are dropped map-side before any sink; the gate pins the
    // surviving per-type counts AND the survivor id checksum, so a
    // leaked opted-out event or an over-dropped consenting one both
    // hash-mismatch.
    ("k16_consent_filter",
      ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
      val optOuts = ev.select(col("user_id")).distinct()
        .filter(pmod(col("user_id"), lit(11)) === 0)
      graft.operators.Privacy.enforceOptOut(ev, optOuts, "user_id")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          expr("bit_xor(event_id)").as("id_xor"))
    }),
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
        |  CAST(bit_xor(event_id) AS BIGINT) AS id_xor
        |FROM events WHERE user_id % 11 <> 0
        |GROUP BY event_type""".stripMargin),
    // billing quota admission (ref cloud free tier "200k events/mo",
    // README.md:62): per (workspace, month), first 2000 events by
    // (ts, event_id) order are billable, the rest over-quota — computed
    // with the two-phase prefix pattern, never a per-workspace-month
    // global window. Gate pins the admitted SET per group (count + sum +
    // bit_xor of billable ids) plus the exact cutoff event.
    ("a22_quota",
      ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
        .withColumn("workspace_id",
          concat(lit("wk"), pmod(col("user_id"), lit(3))))
      graft.operators.MetricsAgg.quotaAdmission(ev,
          col("workspace_id"), col("ts"), col("event_id"), quota = 2000L)
        .groupBy(col("workspace_id"),
          date_format(col("month"), "yyyy-MM").as("month"))
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("billable"), 1L).otherwise(0L)).as("n_billable"),
          sum(when(col("billable"), col("event_id")).otherwise(0L))
            .as("billable_id_sum"),
          expr("bit_xor(CASE WHEN billable THEN event_id ELSE 0 END)")
            .as("billable_id_xor"),
          min(when(col("seq") === 2001L, col("event_id")))
            .as("first_over_quota"))
    }),
      """WITH ev AS (
        |  SELECT event_id, ts, 'wk' || (user_id % 3) AS workspace_id,
        |    strftime(date_trunc('month', ts), '%Y-%m') AS month
        |  FROM events),
        |r AS (
        |  SELECT *, ROW_NUMBER() OVER (
        |    PARTITION BY workspace_id, month
        |    ORDER BY ts, event_id) AS seq
        |  FROM ev)
        |SELECT workspace_id, month, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CASE WHEN seq <= 2000 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_billable,
        |  CAST(SUM(CASE WHEN seq <= 2000 THEN event_id ELSE 0 END)
        |    AS BIGINT) AS billable_id_sum,
        |  CAST(bit_xor(CASE WHEN seq <= 2000 THEN event_id ELSE 0 END)
        |    AS BIGINT) AS billable_id_xor,
        |  CAST(MIN(CASE WHEN seq = 2001 THEN event_id END) AS BIGINT)
        |    AS first_over_quota
        |FROM r GROUP BY 1, 2""".stripMargin),
    // schema-drift report between two event batches' open props — the
    // alerting counterpart of schemaFreeze: per property key, inferred
    // type on each side + added/removed/type_changed/stable, with
    // per-side presence counts. Types come from the same distributed
    // spark.read.json inference hoistProperties uses; the spiking rules
    // make the expected report exact, and the counts are replayed from
    // the JSON itself (json_object_keys explode both engines).
    ("p13_schema_drift",
      ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
      val k = get_json_object(col("props"), "$.k")
      val before = ev.filter(pmod(col("event_id"), lit(2)) === 0)
        .withColumn("props2", concat(lit("{\"k\": "), k,
          lit(", \"ver\": 1, \"legacy\": \"x\"}")))
      val after = ev.filter(pmod(col("event_id"), lit(2)) === 1)
        .withColumn("props2", concat(lit("{\"k\": "), k,
          lit(", \"ver\": \"1.0\", \"batch\": true}")))
      val drift = graft.operators.Layouts.schemaDrift(
        before, after, "props2")
      val tagged = before.select(col("props2"), lit("a").as("side"))
        .unionByName(after.select(col("props2"), lit("b").as("side")))
      val counts = tagged
        .select(explode(json_object_keys(col("props2"))).as("key"),
          col("side"))
        .groupBy(col("key"))
        .agg(sum(when(col("side") === "a", 1L).otherwise(0L))
            .as("n_before"),
          sum(when(col("side") === "b", 1L).otherwise(0L)).as("n_after"))
      drift.join(counts, Seq("key"), "left")
        .select(col("key"), col("type_before"), col("type_after"),
          col("status"),
          coalesce(col("n_before"), lit(0L)).as("n_before"),
          coalesce(col("n_after"), lit(0L)).as("n_after"))
    }),
      """WITH ev AS (
        |  SELECT CASE WHEN event_id % 2 = 0
        |      THEN '{"k": ' || json_extract_string(props, '$.k')
        |        || ', "ver": 1, "legacy": "x"}'
        |      ELSE '{"k": ' || json_extract_string(props, '$.k')
        |        || ', "ver": "1.0", "batch": true}' END AS props2,
        |    CASE WHEN event_id % 2 = 0 THEN 'a' ELSE 'b' END AS side
        |  FROM events),
        |ks AS (SELECT side, unnest(json_keys(props2)) AS key FROM ev),
        |c AS (SELECT key,
        |    CAST(SUM(CASE WHEN side = 'a' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_before,
        |    CAST(SUM(CASE WHEN side = 'b' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_after
        |  FROM ks GROUP BY key),
        |d AS (SELECT * FROM (VALUES
        |    ('batch', NULL, 'boolean', 'added'),
        |    ('k', 'bigint', 'bigint', 'stable'),
        |    ('legacy', 'string', NULL, 'removed'),
        |    ('ver', 'bigint', 'string', 'type_changed'))
        |  t(key, type_before, type_after, status))
        |SELECT d.key, d.type_before, d.type_after, d.status,
        |  c.n_before, c.n_after
        |FROM d JOIN c ON d.key = c.key""".stripMargin),
    // identity-graph stitching: the graph-scale generalization of user
    // recognition — anonymous ids linked to shared email/device tokens
    // (deterministic synthetic linkage with breaks so components stay
    // bounded: ~1-13 identifiers each at sf0.01); every identifier maps
    // to its component's canonical (minimum) id. The oracle replays the
    // closure as a recursive CTE (the dedup_clusters pattern).
    ("j11_identity_graph",
      ((s, dir) => {
      val users = s.read.parquet(s"$dir/events.parquet")
        .select(col("user_id").as("uid")).distinct()
      val email = when(pmod(col("uid"), lit(5)) === 0,
          concat(lit("e!"), col("uid")))
        .otherwise(concat(lit("e"), expr("uid div 2")))
      val device = when(pmod(col("uid"), lit(7)) === 3,
          concat(lit("d!"), col("uid")))
        .otherwise(concat(lit("d"), expr("uid div 3")))
      val edges = users
        .select(concat(lit("a"), col("uid")).as("id_a"), email.as("id_b"))
        .unionByName(users.select(
          concat(lit("a"), col("uid")).as("id_a"), device.as("id_b")))
      graft.operators.UserRecognition.identityGraph(edges)
    }),
      """WITH RECURSIVE u AS (
        |  SELECT DISTINCT user_id AS uid FROM events),
        |edges0 AS (
        |  SELECT 'a' || uid AS src,
        |    CASE WHEN uid % 5 = 0 THEN 'e!' || uid
        |      ELSE 'e' || (uid // 2) END AS dst
        |  FROM u
        |  UNION ALL
        |  SELECT 'a' || uid,
        |    CASE WHEN uid % 7 = 3 THEN 'd!' || uid
        |      ELSE 'd' || (uid // 3) END
        |  FROM u),
        |edges AS (
        |  SELECT src, dst FROM edges0 UNION SELECT dst, src FROM edges0),
        |reach AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        |labels AS (
        |  SELECT src AS id, LEAST(src, MIN(dst)) AS canonical_id
        |  FROM reach GROUP BY src)
        |SELECT id, canonical_id,
        |  CAST(COUNT(*) OVER (PARTITION BY canonical_id) AS BIGINT)
        |    AS n_identifiers
        |FROM labels""".stripMargin),
    // cross-device sessions: the identity graph's canonical ids re-key
    // the event stream, THEN sessionization runs per stitched person —
    // the composition that turns per-device sessions into per-user
    // journeys (what a CDP actually reports). Oracle = recursive-CTE
    // closure + gap-window replay at microsecond precision.
    ("j12_stitched_sessions",
      ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
      val users = ev.select(col("user_id").as("uid")).distinct()
      val email = when(pmod(col("uid"), lit(5)) === 0,
          concat(lit("e!"), col("uid")))
        .otherwise(concat(lit("e"), expr("uid div 2")))
      val device = when(pmod(col("uid"), lit(7)) === 3,
          concat(lit("d!"), col("uid")))
        .otherwise(concat(lit("d"), expr("uid div 3")))
      val edges = users
        .select(concat(lit("a"), col("uid")).as("id_a"), email.as("id_b"))
        .unionByName(users.select(
          concat(lit("a"), col("uid")).as("id_a"), device.as("id_b")))
      val labels = graft.operators.UserRecognition.identityGraph(edges)
        .select(col("id"), col("canonical_id"))
      val keyed = ev
        .withColumn("id", concat(lit("a"), col("user_id")))
        .join(labels, Seq("id"))
      graft.operators.Sessionize
        .sessions(keyed, col("canonical_id"), col("ts"))
        .groupBy(col("key").as("canonical_id"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(col("n_events")).as("n_events"))
    }),
      """WITH RECURSIVE u AS (
        |  SELECT DISTINCT user_id AS uid FROM events),
        |edges0 AS (
        |  SELECT 'a' || uid AS src,
        |    CASE WHEN uid % 5 = 0 THEN 'e!' || uid
        |      ELSE 'e' || (uid // 2) END AS dst
        |  FROM u
        |  UNION ALL
        |  SELECT 'a' || uid,
        |    CASE WHEN uid % 7 = 3 THEN 'd!' || uid
        |      ELSE 'd' || (uid // 3) END
        |  FROM u),
        |edges AS (
        |  SELECT src, dst FROM edges0 UNION SELECT dst, src FROM edges0),
        |reach AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        |labels AS (
        |  SELECT src AS id, LEAST(src, MIN(dst)) AS canonical_id
        |  FROM reach GROUP BY src),
        |ek AS (
        |  SELECT l.canonical_id, e.ts, e.event_id
        |  FROM events e JOIN labels l ON l.id = 'a' || e.user_id),
        |marked AS (
        |  SELECT canonical_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
        |    THEN 1 ELSE 0 END AS new_session
        |  FROM ek
        |  WINDOW w AS (PARTITION BY canonical_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT canonical_id,
        |    SUM(new_session) OVER (PARTITION BY canonical_id
        |      ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
        |      AS session_idx
        |  FROM marked)
        |SELECT canonical_id,
        |  CAST(COUNT(DISTINCT session_idx) AS BIGINT) AS n_sessions,
        |  CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM sess GROUP BY canonical_id""".stripMargin),
    // retrieval-eval battery: per-query precision/recall@10, MRR, and
    // nDCG@10 of the exact cosine top-10 against same-label relevance —
    // DCG in pinned integer micro-discounts so both engines sum the
    // same integers (EvalMetrics.dcgDiscountsMicro literals appear
    // verbatim in the oracle).
    ("td_retrieval_eval",
      ((s, dir) => {
      val e = s.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id").as("id"), col("embedding").as("vec"),
          col("label"))
      val ranking = graft.operators.Similarity.bruteForceTopK(
        e.filter(col("id") < 10).select(col("id").as("qid"), col("vec")),
        e.select(col("id"), col("vec")), k = 10)
      val relevant = e.filter(col("id") < 10)
        .select(col("id").as("qid"), col("label"))
        .join(e.select(col("id"), col("label")), Seq("label"))
        .filter(col("qid") =!= col("id"))
        .select(col("qid"), col("id"))
      graft.operators.EvalMetrics.retrievalEval(ranking, relevant, k = 10)
        .withColumn("first_hit_rank",
          col("first_hit_rank").cast("long"))
    }),
      {
      val disc = graft.operators.EvalMetrics.dcgDiscountsMicro(10)
      val discCase = disc.zipWithIndex
        .map { case (w, i) => s"WHEN ${i + 1} THEN $w" }
        .mkString("CASE rank ", " ", " ELSE 0 END")
      val idcgCase = disc.scanLeft(0L)(_ + _).tail.zipWithIndex
        .map { case (w, i) => s"WHEN ${i + 1} THEN $w" }
        .mkString("CASE LEAST(COALESCE(nr.n_rel, 0), 10) ",
          " ", " ELSE 0 END")
      s"""WITH rk AS (
         |  SELECT qid, rank, id FROM (
         |    SELECT q.vec_id AS qid, c.vec_id AS id,
         |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |        ORDER BY ROUND(list_cosine_similarity(
         |          q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6)
         |          DESC, c.vec_id) AS rank
         |    FROM embeddings q, embeddings c
         |    WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id)
         |  WHERE rank <= 10),
         |rel AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS id
         |  FROM embeddings q, embeddings c
         |  WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id
         |    AND q.label = c.label),
         |nr AS (SELECT qid, CAST(COUNT(*) AS BIGINT) AS n_rel
         |       FROM rel GROUP BY qid),
         |h AS (SELECT rk.qid, rk.rank FROM rk
         |      JOIN rel ON rk.qid = rel.qid AND rk.id = rel.id),
         |pq AS (
         |  SELECT qid, CAST(COUNT(*) AS BIGINT) AS hits,
         |    CAST(MIN(rank) AS BIGINT) AS first_hit_rank,
         |    CAST(SUM($discCase) AS BIGINT) AS dcg_micro
         |  FROM h GROUP BY qid),
         |j AS (
         |  SELECT qs.qid, COALESCE(nr.n_rel, 0) AS n_rel,
         |    COALESCE(pq.hits, 0) AS hits, pq.first_hit_rank,
         |    COALESCE(pq.dcg_micro, 0) AS dcg_micro,
         |    $idcgCase AS idcg_micro
         |  FROM (SELECT DISTINCT qid FROM rk) qs
         |  LEFT JOIN nr ON qs.qid = nr.qid
         |  LEFT JOIN pq ON qs.qid = pq.qid)
         |SELECT qid, n_rel, hits, first_hit_rank, dcg_micro, idcg_micro,
         |  ROUND(hits / 10.0, 6) AS precision_k,
         |  CASE WHEN n_rel = 0 THEN NULL
         |    ELSE ROUND(CAST(hits AS DOUBLE) / n_rel, 6)
         |  END AS recall_k,
         |  CASE WHEN first_hit_rank IS NULL THEN 0.0
         |    ELSE ROUND(1.0 / first_hit_rank, 6) END AS rr,
         |  CASE WHEN idcg_micro = 0 THEN NULL
         |    ELSE ROUND(CAST(dcg_micro AS DOUBLE) / idcg_micro, 6)
         |  END AS ndcg
         |FROM j""".stripMargin
    }))

  val queries: Map[String, Q] =
    gated.map(g => (g._1, g._2)).toMap

  val oracles: Map[String, String] =
    gated.map(g => (g._1, g._3)).toMap
}

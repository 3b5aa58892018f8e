package graft

import org.apache.spark.sql.functions._

import graft.operators.SaasProjections
import graft.sources.DriverEventsAdapter

/** Oracle-gated queries for the 8 SaaS destination projections added in
  * round 3 (SURVEY §2.2 K3) — posthog, amplitude, intercom, hubspot,
  * braze, june, segment-proxy, webhook. Same determinism rules as
  * [[Queries]]: epoch-second/ms longs instead of raw timestamps, all
  * output columns name-aligned with the DuckDB oracle.
  */
object QueriesSaas {
  import Queries.Q

  private def env(s: org.apache.spark.sql.SparkSession, dir: String) =
    DriverEventsAdapter.load(s, dir)

  // (queries is derived from gated, declared after the oracle helper CTEs below)

  /** Adapter rebuild with the context fields these projections read. */
  private val cte =
    """WITH env AS (
      |  SELECT
      |    'm' || event_id AS message_id,
      |    CASE WHEN event_type = 'signup' THEN 'identify'
      |         WHEN event_type = 'view' THEN 'page'
      |         ELSE 'track' END AS type,
      |    event_type AS event,
      |    CAST(ts AS TIMESTAMP) AS timestamp,
      |    'a' || user_id AS anonymous_id,
      |    CASE WHEN event_type IN ('signup','purchase')
      |         THEN 'u' || user_id END AS user_id,
      |    'wk' || (user_id % 3) AS write_key,
      |    user_id AS uid, event_id AS eid, value, props,
      |    'https://shop.example.com/p/' || event_type || '?utm_source=src'
      |      || (user_id % 5) || '&utm_medium=cpc&ref=' || (event_id % 7)
      |      AS page_url,
      |    '/p/' || event_type AS page_path,
      |    'https://ref' || (event_id % 4) || '.example.org/x' AS referrer,
      |    'ref' || (event_id % 4) || '.example.org' AS referring_domain,
      |    '10.' || (user_id % 200) || '.' || (event_id % 250) || '.'
      |      || ((event_id % 254) + 1) AS ip,
      |    CASE (event_id % 3) WHEN 0 THEN 'Chrome' WHEN 1 THEN 'Safari'
      |      ELSE 'unknown' END AS ua_browser,
      |    CASE (event_id % 3) WHEN 0 THEN 'macOS' WHEN 1 THEN 'iOS'
      |      ELSE 'unknown' END AS ua_os,
      |    CASE (event_id % 3) WHEN 1 THEN 'mobile' ELSE 'desktop' END
      |      AS ua_device,
      |    CASE (event_id % 3)
      |      WHEN 0 THEN 'Mozilla/5.0 (Macintosh) AppleWebKit/537.36 Chrome/120.0 Safari/537.36'
      |      WHEN 1 THEN 'Mozilla/5.0 (iPhone; CPU iPhone OS 17_0 like Mac OS X) Safari/604.1'
      |      ELSE 'Googlebot/2.1 (+http://www.google.com/bot.html)' END AS ua,
      |    CASE (user_id % 5) WHEN 0 THEN 'New York' WHEN 1 THEN 'Berlin'
      |      WHEN 2 THEN 'Paris' WHEN 3 THEN 'London' ELSE 'Beijing' END
      |      AS geo_city,
      |    CASE (user_id % 5) WHEN 0 THEN 'US' WHEN 1 THEN 'DE'
      |      WHEN 2 THEN 'FR' WHEN 3 THEN 'GB' ELSE 'CN' END AS geo_country,
      |    (user_id % 5) * 10.0 + 0.5 AS geo_lat,
      |    (user_id % 5) * 20.0 + 0.5 AS geo_lon,
      |    CASE (user_id % 3) WHEN 0 THEN 'en-US' WHEN 1 THEN 'de-DE'
      |      ELSE 'fr-FR' END AS locale,
      |    CAST(1280 + 640 * (user_id % 2) AS INTEGER) AS screen_w,
      |    CAST(720 + 360 * (user_id % 2) AS INTEGER) AS screen_h,
      |    1.0 + (user_id % 2) AS screen_dpi,
      |    'src' || (user_id % 5) AS campaign_source,
      |    CASE WHEN event_type = 'signup'
      |      THEN 'user' || user_id || '@example.com' END AS traits_email,
      |    CASE WHEN event_type = 'signup'
      |      THEN 'User ' || user_id END AS traits_name
      |  FROM events)
      |""".stripMargin

  /** One row per gate: (name, query, oracle SQL) — a gate reads as
    * ONE unit (the twin-map layout, query here / oracle hundreds of
    * lines below, was a recurring editing hazard). Helper CTE vals
    * stay declared above so object-init order is safe. */
  val gated: Seq[(String, Q, String)] = Seq(
    ("k3_posthog",
      ((s, dir) => SaasProjections.posthogCapture(env(s, dir))),
      (cte +
      """SELECT COALESCE(user_id, anonymous_id) AS distinct_id,
        |  CASE WHEN type = 'page' THEN '$pageview' ELSE event END AS event,
        |  CAST(epoch(date_trunc('second', timestamp)) AS BIGINT) * 1000
        |    AS time,
        |  page_url AS current_url, 'shop.example.com' AS host,
        |  page_path AS pathname, referrer, referring_domain,
        |  ua_browser AS browser, ua_os AS os, ua_device AS device,
        |  geo_city AS geoip_city_name, geo_country AS geoip_country_code,
        |  screen_w AS screen_width, screen_h AS screen_height,
        |  screen_dpi AS screen_dpi
        |FROM env WHERE type IN ('track', 'page')""".stripMargin)),
    ("k3_amplitude",
      ((s, dir) => SaasProjections.amplitudeEvents(env(s, dir))),
      (cte +
      """, sess AS (
        |  SELECT message_id,
        |    anonymous_id || '-' || CAST(
        |      CAST(epoch(date_trunc('second',
        |        MIN(timestamp) OVER (PARTITION BY anonymous_id, session_idx)
        |      )) AS BIGINT) * 1000 AS VARCHAR) AS session_id
        |  FROM (
        |    SELECT message_id, anonymous_id, timestamp,
        |      SUM(new_session) OVER (PARTITION BY anonymous_id
        |        ORDER BY timestamp ROWS UNBOUNDED PRECEDING) AS session_idx
        |    FROM (
        |      SELECT message_id, anonymous_id, timestamp,
        |        CASE WHEN lag(timestamp) OVER (PARTITION BY anonymous_id
        |            ORDER BY timestamp) IS NULL
        |          OR date_diff('second', lag(timestamp) OVER (
        |            PARTITION BY anonymous_id ORDER BY timestamp),
        |            timestamp) > 1800
        |        THEN 1 ELSE 0 END AS new_session
        |      FROM env WHERE type IN ('track', 'page'))))
        |SELECT e.message_id AS insert_id,
        |  CAST(epoch(date_trunc('second', e.timestamp)) AS BIGINT) * 1000
        |    AS time,
        |  CASE WHEN e.type = 'page' THEN 'pageview' ELSE e.event END
        |    AS event_type,
        |  s.session_id, e.user_id, e.anonymous_id AS device_id,
        |  e.ua_os AS os_name, e.ua_device AS platform,
        |  e.locale AS language, e.ip, e.ua AS user_agent,
        |  e.geo_country AS country, e.geo_city AS city,
        |  e.geo_lat AS location_lat, e.geo_lon AS location_lng,
        |  CAST(NULL AS VARCHAR) AS user_email,
        |  CAST(NULL AS VARCHAR) AS user_name
        |FROM env e JOIN sess s USING (message_id)
        |WHERE e.type IN ('track', 'page')
        |UNION ALL
        |SELECT message_id AS insert_id,
        |  CAST(epoch(date_trunc('second', timestamp)) AS BIGINT) * 1000
        |    AS time,
        |  '$identify' AS event_type,
        |  CAST(NULL AS VARCHAR) AS session_id, user_id,
        |  CAST(NULL AS VARCHAR) AS device_id,
        |  CAST(NULL AS VARCHAR) AS os_name, CAST(NULL AS VARCHAR) AS platform,
        |  CAST(NULL AS VARCHAR) AS language, CAST(NULL AS VARCHAR) AS ip,
        |  CAST(NULL AS VARCHAR) AS user_agent,
        |  CAST(NULL AS VARCHAR) AS country, CAST(NULL AS VARCHAR) AS city,
        |  CAST(NULL AS DOUBLE) AS location_lat,
        |  CAST(NULL AS DOUBLE) AS location_lng,
        |  traits_email AS user_email, traits_name AS user_name
        |FROM env WHERE type = 'identify' AND user_id IS NOT NULL""".stripMargin)),
    ("k3_intercom",
      ((s, dir) => SaasProjections.intercomRows(env(s, dir))),
      (cte +
      """SELECT 'contact' AS kind, 'user' AS role, user_id AS external_id,
        |  traits_email AS email, traits_name AS name,
        |  strftime(timestamp, '%Y-%m-%dT%H:%M:%SZ') AS last_seen_at,
        |  CAST(NULL AS VARCHAR) AS event_name,
        |  CAST(NULL AS BIGINT) AS created_at,
        |  CAST(NULL AS VARCHAR) AS url, CAST(NULL AS VARCHAR) AS ip,
        |  CAST(NULL AS VARCHAR) AS timezone
        |FROM env WHERE type = 'identify' AND traits_email IS NOT NULL
        |UNION ALL
        |SELECT 'event' AS kind, CAST(NULL AS VARCHAR) AS role,
        |  user_id AS external_id, CAST(NULL AS VARCHAR) AS email,
        |  CAST(NULL AS VARCHAR) AS name, CAST(NULL AS VARCHAR) AS last_seen_at,
        |  CASE WHEN type = 'track' THEN event
        |       WHEN type = 'page' THEN 'page-view' ELSE type END AS event_name,
        |  CAST(epoch(date_trunc('second', timestamp)) AS BIGINT) AS created_at,
        |  page_url AS url, ip, 'UTC' AS timezone
        |FROM env WHERE type NOT IN ('identify', 'group')""".stripMargin)),
    ("k3_mixpanel_people",
      ((s, dir) => SaasProjections.mixpanelPeople(env(s, dir))),
      (cte +
      """SELECT COALESCE(user_id, anonymous_id) AS distinct_id,
        |  '{"$email":"' || traits_email || '","$name":"' || traits_name
        |    || '"}' AS set_payload
        |FROM env WHERE type = 'identify' AND traits_email IS NOT NULL""".stripMargin)),
    ("k3_hubspot",
      ((s, dir) => SaasProjections.hubspotContacts(env(s, dir))),
      (cte +
      """SELECT traits_email AS email,
        |  'User' AS firstname,
        |  CAST(uid AS VARCHAR) AS lastname,
        |  user_id AS jitsu_user_id
        |FROM env
        |WHERE type = 'identify' AND user_id IS NOT NULL
        |  AND traits_email IS NOT NULL""".stripMargin)),
    ("k3_braze",
      ((s, dir) => SaasProjections.brazeTrack(env(s, dir))),
      (cte +
      """SELECT user_id AS external_id,
        |  CASE WHEN user_id IS NULL THEN anonymous_id END AS alias_name,
        |  CASE WHEN user_id IS NULL THEN 'anonymous_id' END AS alias_label,
        |  'app' AS app_id, event AS name,
        |  strftime(timestamp, '%Y-%m-%dT%H:%M:%SZ') AS time,
        |  '{"k": ' || json_extract_string(props, '$.k') || ', "value": '
        |    || printf('%.2f', value) || '}' AS properties
        |FROM env WHERE type = 'track'""".stripMargin)),
    ("k3_june",
      ((s, dir) => SaasProjections.juneTrack(env(s, dir))),
      (cte +
      """SELECT 'track' AS type,
        |  CASE WHEN type = 'page' THEN 'Page View' ELSE event END AS event,
        |  CAST(epoch(date_trunc('second', timestamp)) AS BIGINT)
        |    AS timestamp_s,
        |  anonymous_id AS anonymousId, user_id AS userId,
        |  CAST(NULL AS VARCHAR) AS email,
        |  campaign_source, 'cpc' AS campaign_medium,
        |  screen_w AS screen_width, screen_h AS screen_height,
        |  ip, ua AS userAgent, locale
        |FROM env WHERE type IN ('track', 'page')""".stripMargin)),
    ("k3_segment",
      ((s, dir) => SaasProjections.segmentProxy(env(s, dir))),
      (cte +
      """SELECT 'https://api.segment.io/v1/' || type AS url,
        |  'POST' AS method,
        |  to_base64(encode(write_key || ':')) AS authorization,
        |  '{"message_id":"' || message_id || '","type":"' || type
        |    || '","event":"' || event || '","anonymous_id":"'
        |    || anonymous_id || '"}' AS payload
        |FROM env""".stripMargin)),
    // GA4 e-commerce items: the driver's purchase events carry no products
    // array, so (adapter-style) a deterministic one is synthesized from
    // (props.k, value) and pushed through the REAL parse→transform→explode
    // path of ga4PurchaseItems.
    ("k3_ga4_items",
      ((s, dir) => {
      val k = get_json_object(col("properties"), "$.k").cast("int")
      val price = get_json_object(col("properties"), "$.value")
      def prod(i: Int) = format_string(
        "{\"product_id\":\"p%s-%s\",\"name\":\"Product %s-%s\",\"price\":%s," +
          "\"quantity\":%s,\"category\":\"cat%s\",\"position\":%s}",
        k, lit(i), k, lit(i), price,
        lit(1) + pmod(k + lit(i), lit(3)), pmod(k, lit(4)), lit(i))
      val productsJson = concat(lit("["), prod(1),
        when(pmod(k, lit(2)) === 1, concat(lit(","), prod(2)))
          .otherwise(lit("")), lit("]"))
      SaasProjections.ga4PurchaseItems(
        env(s, dir).filter(col("event") === "purchase"), productsJson)
    }),
      (cte +
      """, p AS (
        |  SELECT *, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        |  FROM env WHERE event = 'purchase')
        |SELECT 'ga-' || uid AS client_id, user_id,
        |  'purchase' AS event_name, message_id AS transaction_id,
        |  'p' || k || '-' || i AS item_id,
        |  'Product ' || k || '-' || i AS item_name,
        |  CAST(printf('%.2f', value) AS DOUBLE) AS item_price,
        |  CAST(1 + ((k + i) % 3) AS INTEGER) AS item_quantity,
        |  'cat' || (k % 4) AS item_category
        |FROM p CROSS JOIN (VALUES (1), (2)) t(i)
        |WHERE i <= 1 + (k % 2)""".stripMargin)),
    ("k3_webhook",
      ((s, dir) => SaasProjections.webhookRequests(env(s, dir))),
      (cte +
      """SELECT 'https://hooks.example.com/jitsu' AS url, 'POST' AS method,
        |  'application/json' AS content_type,
        |  '{"message_id":"' || message_id || '","type":"' || type
        |    || '","event":"' || event || '","anonymous_id":"'
        |    || anonymous_id || '"'
        |    || CASE WHEN user_id IS NOT NULL
        |         THEN ',"user_id":"' || user_id || '"' ELSE '' END
        |    || '}' AS body
        |FROM env""".stripMargin)))

  val queries: Map[String, Q] =
    gated.map(g => (g._1, g._2)).toMap

  val oracles: Map[String, String] =
    gated.map(g => (g._1, g._3)).toMap
}

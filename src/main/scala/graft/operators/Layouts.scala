package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Scalars

/** Data-layout operators — SURVEY §2.3 (P1–P6).
  *
  * Each layout maps the AnalyticsServerEvent envelope to flat warehouse
  * rows tagged with a `_table` column; the sink router groups by `_table`.
  * All layouts are pure column projections (single narrow `select`, no
  * shuffle); the only row-multiplying case is the segment multi-table
  * track fan-out (one event -> `tracks` row + per-event-name row), done
  * with explode over a 2-element array, which stays in codegen.
  *
  * Ref: `libs/core-functions/src/functions/bulker-destination.ts:57-329`.
  */
object Layouts {

  private def ctx(name: String): Column = col(s"context.$name")

  /** Columns shared by all segment-style rows (ref :174-231). */
  private def segmentCommon: Seq[Column] = Seq(
    col("message_id"),
    col("type"),
    col("timestamp"),
    col("sent_at"),
    col("received_at"),
    col("anonymous_id"),
    col("user_id"),
    ctx("ip").as("context_ip"),
    ctx("locale").as("context_locale"),
    ctx("user_agent").as("context_user_agent"),
    ctx("page.url").as("context_page_url"),
    ctx("page.path").as("context_page_path"),
    ctx("page.search").as("context_page_search"),
    ctx("page.referrer").as("context_page_referrer"),
    ctx("page.referring_domain").as("context_page_referring_domain"),
    ctx("page.title").as("context_page_title"),
    ctx("campaign.source").as("context_campaign_source"),
    ctx("campaign.medium").as("context_campaign_medium"),
    ctx("geo.country").as("context_geo_country"),
    ctx("geo.city").as("context_geo_city"))

  /** P2 segmentLayout single-table: all types -> table `events`, `type`
    * kept, traits + properties carried (ref :165-261). `$table`
    * (JITSU_TABLE_NAME) overrides routing when set (ref
    * `functions.d.ts:44-49`). */
  def segmentSingleTable(events: DataFrame): DataFrame =
    events.select(
      (segmentCommon :+
        col("event") :+
        col("properties") :+
        coalesce(col("traits"), ctx("traits")).as("traits") :+
        coalesce(col("table_name"), lit("events")).as("_table")): _*)

  /** P1 segmentLayout multi-table: identify -> `identifies`, group ->
    * `groups`, page/screen -> `pages`/`screens`, track -> TWO rows:
    * `tracks` (no properties) + `{event}` table (with properties)
    * (ref :154-272; `plural` :310-323). */
  def segmentMultiTable(events: DataFrame): DataFrame = {
    val eventTable = Scalars.snakeCase(coalesce(col("event"), col("type")))
    val tables = when(col("table_name").isNotNull, array(col("table_name")))
      .when(col("type") === "track", array(lit("tracks"), eventTable))
      .otherwise(array(Scalars.plural(col("type"))))
    events
      .withColumn("_table", explode(tables))
      .select(
        (segmentCommon :+
          col("event") :+
          // tracks row carries no properties; the event-named row does
          when(col("type") =!= "track" || col("_table") =!= "tracks",
            col("properties")).as("properties") :+
          coalesce(col("traits"), ctx("traits")).as("traits") :+
          col("_table")): _*)
  }

  /** P3 jitsuLegacy layout: classic Jitsu column set (ref :57-152),
    * field-exact against the reference's own golden outputs
    * (`datalayout-jitsu-legacy.test.ts` legacyIdentifyExpected /
    * legacyPageExpected, gated by `p3b_jitsu_golden`): `doc_host`
    * drops the port, `api_key` is "" when the write key is absent,
    * `src` is the literal "jitsu", `source_ip` keeps the raw address
    * next to the zeroed `anon_ip`, and `user` is the id/anonymous_id
    * pair MERGED with every trait under its snake_cased name (traits
    * from the event for identify, from the context otherwise — the
    * coalesce covers both), envelope ids winning on collision. */
  def jitsuLegacy(events: DataFrame): DataFrame = {
    val traitsMap = from_json(coalesce(col("traits"), ctx("traits")),
      org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType,
        org.apache.spark.sql.types.StringType))
    val userIds = map_filter(map(
        lit("id"), col("user_id"),
        lit("anonymous_id"), col("anonymous_id")),
      (_, v) => v.isNotNull)
    val userTraits = map_filter(
      transform_keys(coalesce(traitsMap,
          map().cast("map<string,string>")),
        (k, _) => Scalars.snakeCase(k)),
      (k, _) => !k.isin("id", "anonymous_id"))
    events.select(
      Scalars.anonymizeIp(ctx("ip")).as("anon_ip"),
      ctx("ip").as("source_ip"),
      coalesce(col("write_key"), lit("")).as("api_key"),
      regexp_replace(ctx("page.host"), ":[0-9]+$", "").as("doc_host"),
      ctx("page.path").as("doc_path"),
      ctx("page.search").as("doc_search"),
      ctx("page.title").as("page_title"),
      ctx("page.referrer").as("referer"),
      ctx("page.url").as("url"),
      lit("jitsu").as("src"),
      col("message_id").as("eventn_ctx_event_id"),
      coalesce(col("event"), col("type")).as("event_type"),
      // click ids live here when the client captured them; the envelope
      // carries none, so the column is the reference's empty object
      map().cast("map<string,string>").as("click_id"),
      struct(
        ctx("geo.city").as("city"),
        ctx("geo.country").as("country"),
        ctx("geo.region").as("region"),
        ctx("geo.lat").as("latitude"),
        ctx("geo.lon").as("longitude"),
        ctx("geo.timezone").as("timezone")).as("location"),
      struct(
        ctx("client_ids.ga4").as("ga"),
        ctx("client_ids.fbp").as("fbp"),
        ctx("client_ids.fbc").as("fbc")).as("ids"),
      Scalars.parseUa(ctx("user_agent")).as("parsed_ua"),
      ctx("user_agent").as("user_agent"),
      ctx("locale").as("user_language"),
      Scalars.screenRes(ctx("screen.width"), ctx("screen.height"))
        .as("screen_resolution"),
      Scalars.screenRes(ctx("screen.width"), ctx("screen.height"))
        .as("vp_size"),
      map_concat(userIds, userTraits).as("user"),
      struct(
        ctx("campaign.name").as("name"),
        ctx("campaign.source").as("source"),
        ctx("campaign.medium").as("medium")).as("utm"),
      col("timestamp").as("utc_time"),
      col("timestamp").as("_timestamp"),
      col("properties"),
      lit("events").as("_table"))
  }

  // ---- segment layout, GOLDEN JVM twin --------------------------------
  // The reference's segmentLayout is a JSON-tree transformation run in
  // its function chain (`bulker-destination.ts:154-272`); the Column
  // layouts above are its warehouse-columnar re-expression. This twin
  // reproduces the reference field-for-field on arbitrary open JSON —
  // gated by `p1d_segment_golden` against the reference's own expected
  // outputs (datalayout-segment.test.ts / datalayout-test-data.ts).

  private val TableNameParameter = "JITSU_TABLE_NAME"

  private def snakeNode(
      n: com.fasterxml.jackson.databind.JsonNode,
      m: com.fasterxml.jackson.databind.ObjectMapper): com.fasterxml.jackson.databind.JsonNode =
    n match {
      case a: com.fasterxml.jackson.databind.node.ArrayNode =>
        val out = m.createArrayNode()
        a.forEach(e => { out.add(snakeNode(e, m)); () })
        out
      case o: com.fasterxml.jackson.databind.node.ObjectNode =>
        val out = m.createObjectNode()
        o.fields().forEachRemaining { e =>
          out.set[com.fasterxml.jackson.databind.JsonNode](
            Scalars.snakeCaseName(e.getKey), snakeNode(e.getValue, m)); ()
        }
        out
      case other => other
    }

  /** `transferAsSnakeCase` (ref :274-283): copy `source`'s entries into
    * `target`, keys snake_cased at every depth, `omit` matched on the
    * ORIGINAL keys. Non-objects (incl. absent) transfer nothing. */
  private def transferSnake(
      target: com.fasterxml.jackson.databind.node.ObjectNode,
      source: com.fasterxml.jackson.databind.JsonNode,
      m: com.fasterxml.jackson.databind.ObjectMapper,
      omit: Set[String] = Set.empty): Unit =
    source match {
      case o: com.fasterxml.jackson.databind.node.ObjectNode =>
        o.fields().forEachRemaining { e =>
          if (!omit(e.getKey)) {
            target.set[com.fasterxml.jackson.databind.JsonNode](
              Scalars.snakeCaseName(e.getKey), snakeNode(e.getValue, m))
            ()
          }
        }
      case _ => ()
    }

  /** JS truthiness for the reference's `a || b || c` fallbacks. */
  private def jsTruthy(n: com.fasterxml.jackson.databind.JsonNode): Boolean =
    n != null && !n.isNull && !n.isMissingNode &&
      !(n.isTextual && n.asText().isEmpty) &&
      !(n.isBoolean && !n.asBoolean()) &&
      !(n.isNumber && n.asDouble() == 0.0)

  /** P1/P2 segmentLayout, field-exact (ref :154-272). Input: the RAW
    * AnalyticsServerEvent JSON (camelCase client keys). Returns
    * (table, transformed event JSON) rows — two for a multi-table
    * track with an event name, one otherwise. */
  def segmentGolden(eventJson: String,
                    singleTable: Boolean): Seq[(String, String)] = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val event = m.readTree(eventJson)
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    def at(path: String*): com.fasterxml.jackson.databind.JsonNode =
      path.foldLeft(event: com.fasterxml.jackson.databind.JsonNode) {
        (cur, p) => if (cur == null) null else cur.get(p)
      }
    def firstTruthy(vals: com.fasterxml.jackson.databind.JsonNode*) =
      vals.find(jsTruthy).orNull
    def setValue(t: com.fasterxml.jackson.databind.node.ObjectNode,
                 prop: String,
                 v: com.fasterxml.jackson.databind.JsonNode): Unit =
      // transferValueAsSnakeCase: only `undefined` (absent) is skipped
      if (v != null) { t.set[com.fasterxml.jackson.databind.JsonNode](
        prop, snakeNode(v, m)); () }
    val eventType =
      Option(event.get("type")).map(_.asText()).getOrElse("")
    var transformed = m.createObjectNode()
    var baseTrackFlat: com.fasterxml.jackson.databind.node.ObjectNode = null
    eventType match {
      case "identify" if singleTable =>
        val ctx = transformed.putObject("context")
        val traits = ctx.putObject("traits")
        transferSnake(ctx, at("context"), m, Set("groupId", "traits"))
        transferSnake(traits, at("context", "traits"), m, Set("groupId"))
        transferSnake(traits, at("traits"), m, Set("groupId"))
        setValue(ctx, "group_id", firstTruthy(at("context", "groupId"),
          at("traits", "groupId"), at("context", "traits", "groupId")))
        transferSnake(transformed, at("properties"), m)
        transferSnake(transformed, event, m,
          Set("context", "properties", "traits", "type", TableNameParameter))
      case "identify" =>
        val ctx = transformed.putObject("context")
        transferSnake(ctx, at("context"), m, Set("traits"))
        transferSnake(transformed, at("properties"), m)
        transferSnake(transformed, at("context", "traits"), m)
        transferSnake(transformed, at("traits"), m)
        transferSnake(transformed, event, m,
          Set("context", "properties", "traits", "type", TableNameParameter))
      case "group" if singleTable =>
        val ctx = transformed.putObject("context")
        val grp = ctx.putObject("group")
        transferSnake(ctx, at("context"), m)
        transferSnake(grp, at("traits"), m)
        setValue(ctx, "group_id", at("groupId"))
        transferSnake(transformed, at("properties"), m)
        transferSnake(transformed, event, m, Set("context", "properties",
          "traits", "type", "groupId", TableNameParameter))
      case "group" =>
        val ctx = transformed.putObject("context")
        transferSnake(ctx, at("context"), m, Set("traits"))
        transferSnake(transformed, at("properties"), m)
        transferSnake(transformed, at("traits"), m)
        transferSnake(transformed, event, m,
          Set("context", "properties", "traits", "type", TableNameParameter))
      case "track" if singleTable =>
        val ctx = transformed.putObject("context")
        val traits = ctx.putObject("traits")
        transferSnake(ctx, at("context"), m, Set("groupId", "traits"))
        transferSnake(traits, at("context", "traits"), m, Set("groupId"))
        transferSnake(traits, at("properties", "traits"), m, Set("groupId"))
        setValue(ctx, "group_id", firstTruthy(at("context", "groupId"),
          at("context", "traits", "groupId")))
        transferSnake(transformed, at("properties"), m, Set("traits"))
        transferSnake(transformed, event, m,
          Set("context", "properties", "type", TableNameParameter))
      case "track" =>
        baseTrackFlat = m.createObjectNode()
        transferSnake(baseTrackFlat, event, m,
          Set("properties", "type", TableNameParameter))
        transformed = m.createObjectNode()
        transferSnake(transformed, at("properties"), m)
        transferSnake(transformed, event, m,
          Set("properties", "type", TableNameParameter))
      case _ if singleTable =>
        val ctx = transformed.putObject("context")
        val traits = ctx.putObject("traits")
        transferSnake(ctx, at("context"), m, Set("groupId", "traits"))
        transferSnake(traits, at("context", "traits"), m, Set("groupId"))
        setValue(ctx, "group_id", firstTruthy(at("context", "groupId"),
          at("context", "traits", "groupId")))
        transferSnake(transformed, at("properties"), m)
        transferSnake(transformed, event, m,
          Set("context", "properties", TableNameParameter))
      case _ =>
        transferSnake(transformed, at("properties"), m)
        transferSnake(transformed, event, m,
          Set("properties", TableNameParameter))
    }
    val tableOverride = Option(event.get(TableNameParameter))
      .filter(jsTruthy).map(_.asText())
    tableOverride match {
      case Some(t) =>
        transformed.put("type", eventType)
        Seq((t, m.writeValueAsString(transformed)))
      case None if singleTable =>
        transformed.put("type", eventType)
        Seq(("events", m.writeValueAsString(transformed)))
      case None if eventType == "track" && jsTruthy(event.get("event")) =>
        Seq(("tracks", m.writeValueAsString(baseTrackFlat)),
          (event.get("event").asText(), m.writeValueAsString(transformed)))
      case None =>
        Seq((Scalars.pluralName(eventType), m.writeValueAsString(transformed)))
    }
  }

  /** P4 passthrough layout: event minus control columns, table from
    * `$table`/JITSU_TABLE_NAME or `events` (ref :329). */
  def passthrough(events: DataFrame): DataFrame =
    events
      .withColumn("_table", coalesce(col("table_name"), lit("events")))
      .drop("table_name")

  /** Dynamic property hoisting — SURVEY §7.5 hard part #1 (ref
    * `bulker-destination.ts:148,233-246`): spread the open `properties`
    * JSON map into top-level warehouse columns, names snake_cased
    * (`transferAsSnakeCase`), envelope columns winning on collision (the
    * reference assigns envelope fields after properties). The JSON blob
    * column is dropped — its keys now live as real columns and flow
    * through the sink router's schema evolution / `schemaFreeze` gate.
    *
    * Schema inference is Spark's own distributed JSON inference
    * (`spark.read.json` over the batch's property strings): one map-side
    * pass + a treeAggregate schema merge, no shuffle of event rows — the
    * per-batch analogue of bulker's per-batch column discovery, and the
    * right shape at 100 TB because the inference pass carries only the
    * props column. Types arrive as JSON types (long/double/string/bool;
    * nested objects stay struct columns). */
  def hoistProperties(events: DataFrame, propsCol: String = "properties"): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val jsons = events.select(col(propsCol).cast("string"))
      .where(col(propsCol).isNotNull).as[String]
    val inferred = spark.read.json(jsons).schema
    val fields = inferred.fields.filterNot(_.name == "_corrupt_record")
    if (fields.isEmpty) events.drop(propsCol)
    else {
      val taken = scala.collection.mutable.Set(
        events.columns.map(Scalars.snakeCaseName).toIndexedSeq: _*)
      val parsed = from_json(col(propsCol),
        org.apache.spark.sql.types.StructType(fields))
      val hoisted = fields.toSeq.flatMap { f =>
        val name = Scalars.snakeCaseName(f.name)
        if (taken(name) || name == "_table") None
        else { taken += name; Some(parsed.getField(f.name).as(name)) }
      }
      events.select(
        events.columns.filterNot(_ == propsCol).map(col).toSeq ++ hoisted: _*)
    }
  }

  /** VARIANT twin of [[hoistProperties]] — SURVEY §1.1 names Spark 4's
    * `VariantType` the ideal carrier for the reference's open
    * `properties`/`traits` JSON maps, and the engine is on 4.1.2:
    * `parse_json` once into the binary variant encoding, then every
    * downstream access is `variant_get` on the pre-shredded value — no
    * per-access re-parse, which is what makes repeated key access cheap
    * at 100 TB (the JSON-string path re-tokenizes the blob for every
    * `get_json_object`).
    *
    * Schema discovery is ONE aggregation (`schema_of_variant_agg` —
    * map-side partials + a merge, keys-sized result to the driver)
    * instead of `spark.read.json`'s separate inference job; hoisted
    * names/collision rules match [[hoistProperties]] exactly
    * (snake_case, envelope wins, `_table` reserved). JSON numbers with
    * fractions surface as DECIMAL under variant inference (vs DOUBLE
    * under JSON-string inference) — hoisted decimal columns are cast to
    * DOUBLE here so the two paths stay hash-identical, which the
    * `p1c_variant` gate pins. */
  def hoistPropertiesVariant(events: DataFrame,
                             propsCol: String = "properties"): DataFrame = {
    val isVariant =
      events.schema(propsCol).dataType.typeName.contains("variant")
    val v =
      if (isVariant) col(propsCol)
      else try_parse_json(col(propsCol).cast("string"))
    val ddl = events.select(schema_of_variant_agg(v).as("s"))
      .head().getString(0)
    val dt = scala.util.Try(org.apache.spark.sql.types.DataType.fromDDL(
      ddl.replace("OBJECT<", "STRUCT<"))).toOption // variant spells objects OBJECT<>
    // (key name, target cast DDL), alphabetical — the same field order
    // spark.read.json inference gives the JSON-string twin, so snake_case
    // COLLISIONS resolve to the same winner on both paths
    def decimalToDouble(t: org.apache.spark.sql.types.DataType): String =
      t match {
        case _: org.apache.spark.sql.types.DecimalType => "DOUBLE"
        case other => other.sql
      }
    // The single-aggregation fast path can fail to round-trip the key
    // NAMES through DDL — a key containing a backtick breaks the parse,
    // and a pre-JEP-400 JVM on a POSIX locale folds non-ASCII names to
    // U+FFFD inside the variant stringification. Rediscover keys WITHOUT
    // any name→DDL→name round-trip: explode the variant as a map (names
    // stay real UTF8Strings end to end) and take per-key type partials.
    // Costs a (key, value) shuffle, so it is only the fallback; the
    // data-dependent trigger keys are vanishingly rare in practice.
    def rediscover(): Seq[(String, String)] =
      events.select(explode(map_entries(v.try_cast(
          org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.VariantType)))).as("e"))
        .select(col("e.key").as("k"), col("e.value").as("vv"))
        .groupBy("k").agg(schema_of_variant_agg(col("vv")).as("t"))
        .collect()
        .map { r =>
          val t = scala.util.Try(
            org.apache.spark.sql.types.DataType.fromDDL(
              r.getString(1).replace("OBJECT<", "STRUCT<"))).toOption
          (r.getString(0),
            t.map(decimalToDouble).getOrElse("STRING"))
        }
        .sortBy(_._1).toSeq
    val fields: Seq[(String, String)] = dt match {
      case Some(st: org.apache.spark.sql.types.StructType)
          if !ddl.contains('\uFFFD') =>
        st.fields.toSeq.map(f => (f.name, decimalToDouble(f.dataType)))
      case Some(_: org.apache.spark.sql.types.StructType) => rediscover()
      case Some(_) => Seq.empty // scalar / array / VOID blob: nothing to hoist
      case None => rediscover() // unparseable names (backticks, …)
    }
    if (fields.isEmpty) events.drop(propsCol)
    else {
      val taken = scala.collection.mutable.Set(
        events.columns.map(Scalars.snakeCaseName).toIndexedSeq: _*)
      val hoisted = fields.flatMap { case (key, target) =>
        val name = Scalars.snakeCaseName(key)
        if (taken(name) || name == "_table") None
        else {
          taken += name
          // `$.key` is only valid for identifier-shaped keys — the
          // variant path parser reads `.` / `[` as path structure, so
          // a property literally named "a.b" would be looked up as a
          // NESTED path, diverging from the JSON-string twin (whose
          // getField takes names literally). Exotic keys go through a
          // variant→map cast + element_at: a literal map lookup, no
          // path grammar at all, so every unicode/metachar key the
          // chain side can produce resolves identically.
          val extracted =
            if (key.matches("[A-Za-z_][A-Za-z0-9_]*"))
              variant_get(v, s"$$.$key", target)
            else
              element_at(
                v.try_cast(org.apache.spark.sql.types.MapType(
                  org.apache.spark.sql.types.StringType,
                  org.apache.spark.sql.types.VariantType)),
                key).cast(target)
          Some(extracted.as(name))
        }
      }
      events.select(
        events.columns.filterNot(_ == propsCol).map(col).toSeq ++
          hoisted: _*)
    }
  }

  /** Schema-drift report between two batches' open-props columns — the
    * alerting counterpart of `schemaFreeze` (ref `destinations.tsx:144`
    * rejects new columns silently; a pipeline operator wants to SEE
    * what changed between yesterday's and today's events before the
    * sink does): per property key, the inferred type on each side and
    * a status ∈ added / removed / type_changed / stable.
    *
    * Uses the same distributed `spark.read.json` inference as
    * [[hoistProperties]] (one map pass + treeAggregate schema merge per
    * side, no event-row shuffle); the report itself is keys-sized and
    * driver-built. */
  def schemaDrift(before: DataFrame, after: DataFrame,
                  propsCol: String = "properties"): DataFrame = {
    val spark = before.sparkSession
    import spark.implicits._
    def infer(df: DataFrame): Map[String, String] = {
      val js = df.select(col(propsCol).cast("string"))
        .where(col(propsCol).isNotNull).as[String]
      spark.read.json(js).schema.fields.toSeq
        .filterNot(_.name == "_corrupt_record")
        .map(f => f.name -> f.dataType.simpleString).toMap
    }
    val a = infer(before)
    val b = infer(after)
    val rows = (a.keySet ++ b.keySet).toSeq.sorted.map { k =>
      val (ta, tb) = (a.get(k), b.get(k))
      val status =
        if (ta.isEmpty) "added"
        else if (tb.isEmpty) "removed"
        else if (ta == tb) "stable"
        else "type_changed"
      (k, ta.orNull, tb.orNull, status)
    }
    rows.toDF("key", "type_before", "type_after", "status")
  }

  /** P7 event-type/name filter — `createFilter` semantics (ref
    * `lib/index.ts:231-242`): "*" everything, "" everything except
    * page/screen, else comma-list matching type OR event name. */
  def eventFilter(events: DataFrame, spec: String): DataFrame = spec match {
    case "*" => events
    case "" => events.filter(!col("type").isin("page", "screen"))
    case list =>
      val names = list.split(",").map(_.trim).filter(_.nonEmpty).toSeq
      events.filter(col("type").isin(names: _*) || col("event").isin(names: _*))
  }

  /** P8 bot filter (ref `mixpanel-destination.ts:497-501`). */
  def botFilter(events: DataFrame): DataFrame =
    events.filter(!Scalars.parseUa(ctx("user_agent")).getField("bot"))
}

package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.functions.Scalars
import graft.operators.{Layouts, Multimodal, Profiles, Sessionize, UserRecognition}
import graft.sources.DriverEventsAdapter

class OperatorsSpec extends GraftSpec {
  import spark.implicits._

  private lazy val env = DriverEventsAdapter.load(spark, sf)

  // ---- layouts (golden-output style, ref datalayout-segment.test.ts) ----

  test("segment multi-table: track fans out to tracks + event table") {
    val one = env.filter(col("type") === "track").limit(1)
    val out = Layouts.segmentMultiTable(one)
    val tables = out.select("_table").as[String].collect().sorted
    val ev = one.select("event").as[String].head()
    assert(tables.toSeq == Seq(ev, "tracks").sorted)
    // tracks row has no properties; event row does
    val props = out.select("_table", "properties").collect()
      .map(r => r.getString(0) -> (r.get(1) != null)).toMap
    assert(!props("tracks") && props(ev))
  }

  test("segment multi-table: identify -> identifies with traits") {
    val out = Layouts.segmentMultiTable(env.filter(col("type") === "identify"))
    assert(out.select("_table").distinct().as[String].collect().toSeq ==
      Seq("identifies"))
    assert(out.filter(col("traits").isNull).count() == 0)
  }

  test("$table override routes to the named table in both segment layouts") {
    val one = env.limit(4).withColumn("table_name", lit("custom_tbl"))
    assert(Layouts.segmentSingleTable(one).select("_table").distinct()
      .as[String].collect().toSeq == Seq("custom_tbl"))
    assert(Layouts.segmentMultiTable(one).select("_table").distinct()
      .as[String].collect().toSeq == Seq("custom_tbl"))
  }

  test("group/screen/alias types route to plural tables (full type matrix)") {
    val all = Seq("group", "screen", "alias").map(t =>
      env.limit(1).withColumn("type", lit(t)).withColumn("event",
        lit(null).cast("string")))
      .reduce(_ unionByName _)
    val tables = Layouts.segmentMultiTable(all)
      .select("_table").as[String].collect().sorted
    assert(tables.toSeq == Seq("aliases", "groups", "screens"))
  }

  test("jitsu legacy layout: anonymized ip + screen resolution shape") {
    val row = Layouts.jitsuLegacy(env).limit(50).collect()
    row.foreach { r =>
      assert(r.getAs[String]("anon_ip").endsWith(".0"))
      assert(r.getAs[String]("screen_resolution").matches("\\d+x\\d+"))
    }
  }

  // ---- scalar functions -------------------------------------------------

  test("snake_case semantics match reference idToSnakeCaseFast (full strings.test.ts table)") {
    // the reference's own expected table, ported verbatim
    // (strings.test.ts data + dataExtra)
    val table = Seq(
      "plain" -> "plain",
      "plain_" -> "plain_",
      "_plain" -> "_plain",
      "_plain_string" -> "_plain_string",
      "_plain__string" -> "_plain__string",
      "camelCase" -> "camel_case",
      "camelCaseA" -> "camel_case_a",
      "cCase" -> "c_case",
      "Camel" -> "camel",
      "CamelCase" -> "camel_case",
      "CCamel" -> "c_camel",
      "CCamelCase" -> "c_camel_case",
      "camelUSCase" -> "camel_u_s_case",
      "camelCaseEU" -> "camel_case_e_u",
      "_CamelCase" -> "_camel_case",
      "__CamelCase" -> "__camel_case",
      "Camel_Case" -> "camel_case",
      "Camel__Case" -> "camel__case",
      "_camelCase" -> "_camel_case",
      "camelCase_" -> "camel_case_",
      "camelCase__" -> "camel_case__",
      "__camelCase" -> "__camel_case",
      " CamelCase" -> "_camel_case",
      "  CamelCase" -> "__camel_case",
      "Camel Case" -> "camel_case",
      "Camel case" -> "camel_case",
      "Camel  Case" -> "camel__case",
      "Camel Case " -> "camel_case_",
      "Camel Case  " -> "camel_case__",
      "Camel _ Case" -> "camel___case",
      "Camel_ _Case" -> "camel___case",
      "_ CamelCase _" -> "__camel_case__",
      " _CamelCase_ " -> "__camel_case__",
      "Camel-Case" -> "camel-case",
      "Camel-case" -> "camel-case",
      "$camel-case" -> "$camel-case",
      "$Camel-Case" -> "$camel-case",
      "$camel##case" -> "$camel##case",
      "$Camel##Case#" -> "$camel##case#")
    table.foreach { case (in, want) =>
      assert(Scalars.snakeCaseName(in) == want,
        s"JVM: '$in' -> '${Scalars.snakeCaseName(in)}', want '$want'")
    }
    // Column twin agrees on the whole table
    val got = table.map(_._1).toDF("s")
      .select(Scalars.snakeCase(col("s")).as("o"))
      .collect().map(_.getString(0)).toSeq
    assert(got == table.map(_._2), "Column twin drift")
    // twin parity on NON-LATIN uppercase: the reference lowercases only
    // A-Z, so İstanbulCity keeps its İ — a Column form using lower()
    // would fold it and the hoisted column name would disagree with the
    // chain-side name (the ADVICE r8 drift)
    val unicode = Seq("İstanbulCity", "ÄrgerLevel", "ДомPage", "naïveScore",
      "ÜberMode", "日本語Key")
    val colGot = unicode.toDF("s")
      .select(Scalars.snakeCase(col("s")).as("o"))
      .collect().map(_.getString(0)).toSeq
    assert(colGot == unicode.map(Scalars.snakeCaseName),
      "Column twin drifts from JVM twin on non-Latin uppercase")
  }

  test("sha256Pii matches the reference's pinned facebookHash vectors") {
    // ref facebook-conversions.test.ts 'hashConsistency' — FB's own
    // published customer-information examples, exact hex
    import spark.implicits._
    val got = Seq("john_smith@gmail.com", "16505551212").toDF("v")
      .select(graft.functions.Scalars.sha256Pii(org.apache.spark.sql
        .functions.col("v")).as("h"))
      .as[String].collect().toSeq
    assert(got == Seq(
      "62a14e44f765419d10fea99367361a727c12365e2520f32218d505ed9aa0f62f",
      "e323ec626319ca94ee8bff2e4c87cf613be6ea19919ed1364124e16807ab3176"))
  }

  test("snakeCaseSchema renames nested struct fields") {
    val df = Seq((1, ("a", 2))).toDF("topLevel", "nestedStruct")
      .withColumn("nestedStruct", struct(lit("a").as("innerField"),
        lit(2).as("otherOne")))
    val out = Scalars.snakeCaseSchema(df)
    assert(out.columns.toSeq == Seq("top_level", "nested_struct"))
    val inner = out.schema("nested_struct").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames.toSeq
    assert(inner == Seq("inner_field", "other_one"))
  }

  test("plural matches reference table naming") {
    val out = Seq("identify", "page", "track", "group", "screen", "alias")
      .toDF("t").select(Scalars.plural(col("t"))).as[String].collect()
    assert(out.toSeq == Seq("identifies", "pages", "tracks", "groups",
      "screens", "aliases"))
  }

  // ---- user recognition (ref user-recognition.test.ts scenario) --------

  test("UR: 3 anonymous pages + 1 identified -> all 4 identified") {
    val rows = Seq(
      ("m1", "anon1", null, ts("2024-01-01 10:00:00")),
      ("m2", "anon1", null, ts("2024-01-01 10:05:00")),
      ("m3", "anon1", null, ts("2024-01-01 10:10:00")),
      ("m4", "anon1", "user42", ts("2024-01-01 10:15:00")),
      ("m5", "anon2", null, ts("2024-01-01 10:20:00"))
    ).toDF("message_id", "anonymous_id", "user_id", "timestamp")
    val out = UserRecognition.resolveBatch(rows)
    val got = out.select("message_id", "user_id").as[(String, String)]
      .collect().toMap
    assert(Seq("m1", "m2", "m3", "m4").forall(got(_) == "user42"))
    assert(got("m5") == null)
    assert(out.filter(col("recognized")).count() == 3)
  }

  test("UR: identity does not flow backwards beyond lookback") {
    val rows = Seq(
      ("m1", "a", null, ts("2023-01-01 00:00:00")), // 1y before identify
      ("m2", "a", "u1", ts("2024-01-01 00:00:00"))
    ).toDF("message_id", "anonymous_id", "user_id", "timestamp")
    val got = UserRecognition.resolveBatch(rows, lookbackDays = 30)
      .select("message_id", "user_id").as[(String, String)].collect().toMap
    assert(got("m1") == null && got("m2") == "u1")
  }

  // ---- sessionization ---------------------------------------------------

  test("sessions: 30-min gap splits sessions") {
    val rows = Seq(
      ("a", ts("2024-01-01 10:00:00")),
      ("a", ts("2024-01-01 10:20:00")), // same session (20 min)
      ("a", ts("2024-01-01 11:30:00")), // new session (70 min gap)
      ("b", ts("2024-01-01 10:00:00"))
    ).toDF("anonymous_id", "timestamp")
    val s = Sessionize.sessions(rows, col("anonymous_id"), col("timestamp"))
    val byKey = s.groupBy("key").count().as[(String, Long)].collect().toMap
    assert(byKey("a") == 2 && byKey("b") == 1)
    val tagged = Sessionize.tagEvents(rows, "anonymous_id", "timestamp")
    val ids = tagged.filter(col("anonymous_id") === "a")
      .select("session_id").distinct().count()
    assert(ids == 2)
  }

  // ---- profiles ---------------------------------------------------------

  test("profile traits fold: last non-null wins in timestamp order") {
    val rows = Seq(
      ("u1", "identify", "identify", ts("2024-01-01 10:00:00"), null,
        """{"email":"old@x.com","name":"Old"}"""),
      ("u1", "identify", "identify", ts("2024-01-02 10:00:00"), null,
        """{"email":"new@x.com"}"""),
      ("u1", "track", "click", ts("2024-01-03 10:00:00"), "{}", null)
    ).toDF("user_id", "type", "event", "timestamp", "properties", "traits")
      .withColumn("anonymous_id", lit("a1"))
    val p = Profiles.buildProfiles(rows).collect().head
    assert(p.getAs[String]("email") == "new@x.com")
    assert(p.getAs[String]("name") == "Old") // not overwritten by null
    assert(p.getAs[Long]("n_events") == 3)
  }

  test("pluggable profile function over event history") {
    val rows = Seq(
      ("u1", "track", "purchase", ts("2024-01-01 10:00:00"),
        """{"value": 10.5}""", null),
      ("u1", "track", "purchase", ts("2024-01-02 10:00:00"),
        """{"value": 4.5}""", null)
    ).toDF("user_id", "type", "event", "timestamp", "properties", "traits")
    val fn: Profiles.ProfileFunction = (uid, events) =>
      Map("n_purchases" -> events.count(_.event == "purchase").toString)
    val out = Profiles.runProfileFunction(rows, fn).collect().head
    assert(out.properties("n_purchases") == "2")
  }

  test("as-of join: latest at-or-before version attaches; earlier rows get nulls") {
    val left = Seq(
      ("k1", ts("2024-01-01 09:00:00"), "e1"), // before any version
      ("k1", ts("2024-01-01 10:00:00"), "e2"), // exactly at v1 (inclusive)
      ("k1", ts("2024-01-01 11:30:00"), "e3"), // between v1 and v2
      ("k1", ts("2024-01-01 12:00:00"), "e4"), // exactly at v2
      ("k2", ts("2024-01-01 12:00:00"), "e5")  // other key, no versions
    ).toDF("k", "event_ts", "name")
    val right = Seq(
      ("k1", ts("2024-01-01 10:00:00"), "v1"),
      ("k1", ts("2024-01-01 12:00:00"), "v2")
    ).toDF("k", "valid_from", "version")
    val out = graft.operators.AsOfJoin.asof(
      left, right, "k", "event_ts", "valid_from", Seq("version"))
      .select("name", "version").as[(String, Option[String])].collect().toMap
    assert(out("e1").isEmpty)
    assert(out("e2").contains("v1"))
    assert(out("e3").contains("v1"))
    assert(out("e4").contains("v2"))
    assert(out("e5").isEmpty)
  }

  test("as-of join: equal-(key, ts) right rows resolve to the greatest payload") {
    val left = Seq(("k1", ts("2024-01-01 11:00:00"), "e1"))
      .toDF("k", "event_ts", "name")
    // two versions stamped at the SAME instant: the payload tiebreak must
    // pick the greatest tuple on every run/partitioning (ADVICE r4)
    val right = Seq(
      ("k1", ts("2024-01-01 10:00:00"), "vB"),
      ("k1", ts("2024-01-01 10:00:00"), "vA")
    ).toDF("k", "valid_from", "version")
    (1 to 3).foreach { _ =>
      val out = graft.operators.AsOfJoin.asof(
        left, right.repartition(5), "k", "event_ts", "valid_from", Seq("version"))
        .select("version").as[String].collect()
      assert(out.toSeq == Seq("vB"))
    }
  }

  // ---- multimodal -------------------------------------------------------

  test("media sniffer parses hand-built real headers exactly") {
    import Multimodal.{MediaFixtures, MediaSniffer}
    val payload = "hello media".getBytes("UTF-8")
    val j = MediaSniffer.sniff(MediaFixtures.jpegBytes(640, 480, payload))
    assert(j.format == "jpeg" && j.width.contains(640) && j.height.contains(480))
    val p = MediaSniffer.sniff(MediaFixtures.pngBytes(1920, 1080, payload))
    assert(p.format == "png" && p.width.contains(1920) && p.height.contains(1080))
    // 16kHz stereo 16-bit -> 64000 B/s; 128000 bytes of data = 2000 ms
    val w = MediaSniffer.sniff(MediaFixtures.wavBytes(16000, 2, 128000L, payload))
    assert(w.format == "wav" && w.durationMs.contains(2000L))
    // timescale 600, duration 1800 units -> 3000 ms
    val m = MediaSniffer.sniff(MediaFixtures.mp4Bytes(600L, 1800L, payload))
    assert(m.format == "mp4" && m.durationMs.contains(3000L))
    assert(MediaSniffer.sniff("plain text".getBytes("UTF-8")).format == "unknown")
    assert(MediaSniffer.sniff(Array.emptyByteArray).format == "empty")
    // GIF89a logical screen 320x200, little-endian
    val gif = "GIF89a".getBytes("US-ASCII") ++
      Array[Byte](0x40, 0x01, 0xc8.toByte, 0x00, 0, 0)
    assert(MediaSniffer.sniff(gif).format == "gif")
    assert(MediaSniffer.sniff(gif).width.contains(320))
    assert(MediaSniffer.sniff(gif).height.contains(200))
  }

  test("mp4 sample tables: muxer/parser round-trip — codec+dims, per-sample offsets locate the REAL bytes, timestamps from stts, corrupt inputs inert") {
    import Multimodal.{MediaFixtures, Mp4Tracks}
    val sizes = Seq(3, 5, 2, 7)
    val samples = Array.tabulate(sizes.sum)(i => (i * 11 + 1).toByte)
    val bytes = MediaFixtures.mp4TrackBytes(trackId = 9, width = 320,
      height = 180, timescale = 600, sampleDelta = 60,
      sampleSizes = sizes, samples = samples)
    val parsed = Mp4Tracks.parse(bytes)
    assert(parsed.length == 4)
    assert(parsed.forall(s => s.trackId == 9 && s.codec == "avc1" &&
      s.width == 320 && s.height == 180))
    // the documented layout constant: mdat payload at 527 + 4n
    val base = 527 + 4 * sizes.length
    assert(parsed.map(_.offset) == Seq(base, base + 3, base + 8, base + 10)
      .map(_.toLong))
    assert(parsed.map(_.size) == sizes.map(_.toLong))
    // stts: uniform 60/600 s per sample -> 0/100/200/300 ms
    assert(parsed.map(_.ptsMs) == Seq(0L, 100L, 200L, 300L))
    // offsets really locate the sample bytes inside mdat
    parsed.zipWithIndex.foreach { case (s, k) =>
      val expectFirst = samples(sizes.take(k).sum)
      assert(bytes(s.offset.toInt) == expectFirst, s"sample $k bytes")
    }
    // robustness: truncation and garbage parse to empty, never throw
    assert(Mp4Tracks.parse(bytes.take(200)).isEmpty ||
      Mp4Tracks.parse(bytes.take(200)).forall(_.size >= 0))
    assert(Mp4Tracks.parse("nonsense".getBytes("UTF-8")).isEmpty)
    assert(Mp4Tracks.parse(Array.emptyByteArray).isEmpty)
    // the legacy ftyp+mvhd-only fixture has no sample tables -> empty
    assert(Mp4Tracks.parse(
      MediaFixtures.mp4Bytes(600L, 1800L, Array.emptyByteArray)).isEmpty)
  }

  test("multimodal meta + frames: real headers round-trip, deterministic frames") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(20)
    val media = Multimodal.synthesize(docs)
    val meta = Multimodal.extractMeta(media)
    assert(meta.count() == 20)
    meta.select(col("media_id"), col("meta.format"), col("meta.width"),
      col("meta.duration_ms")).collect().foreach { r =>
      val id = r.getLong(0)
      val expected = Seq("jpeg", "png", "wav", "mp4")((id % 4).toInt)
      assert(r.getString(1) == expected)
      if (id % 4 <= 1) assert(r.getInt(2) == (64 + id % 1024).toInt)
      else assert(!r.isNullAt(3)) // wav/mp4 carry a parsed duration
    }
    val frames = Multimodal.sampleFrames(media)
    // image/mp4 fixtures (no decodable pixels) -> 3 FakeCodec frames;
    // wav fixtures REALLY decode -> 1..3 PCM windows at stride 64
    val expected = docs.select("doc_id", "text").collect().map { r =>
      val id = r.getLong(0)
      if (id % 4 != 2) 3L
      else {
        val nb = r.getString(1).getBytes("UTF-8").length
        val ch = 1 + (id % 2).toInt
        val ns = (nb / (2 * ch)) * ch
        Seq(0, 64, 128).count(_ < ns).toLong
      }
    }.sum
    assert(frames.count() == expected)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getAs[Array[Byte]](2).toSeq)).sortBy(t => (t._1, t._2)).toSeq
    assert(key(frames) == key(Multimodal.sampleFrames(media)))
  }

  test("ImageIO codec: real PNG/JPEG decode, raster shape, resize, lossless PNG") {
    import Multimodal.{ImageCodec, MediaSniffer}
    val png = ImageCodec.encode("png", 20, 12, 7L)
    assert(MediaSniffer.sniff(png).format == "png") // real header too
    val img = ImageCodec.decode(png).get
    assert(img.getWidth == 20 && img.getHeight == 12)
    assert(ImageCodec.rgbBytes(img).length == 20 * 12 * 3)
    val jpg = ImageCodec.encode("jpg", 9, 33, 3L)
    assert(MediaSniffer.sniff(jpg).format == "jpeg")
    val jimg = ImageCodec.decode(jpg).get
    assert(jimg.getWidth == 9 && jimg.getHeight == 33)
    assert(ImageCodec.rgbBytes(ImageCodec.resize(img, 16, 16)).length == 768)
    // PNG is lossless: pixels round-trip exactly
    val img2 = ImageCodec.decode(ImageCodec.encode("png", 20, 12, 7L)).get
    assert((0 until 12).forall(y =>
      (0 until 20).forall(x => img.getRGB(x, y) == img2.getRGB(x, y))))
    // header-only fixtures (no pixel data) must NOT decode
    assert(ImageCodec.decode(
      Multimodal.MediaFixtures.jpegBytes(64, 64, Array.emptyByteArray)).isEmpty)
  }

  test("AudioCodec: real JDK WAV/PCM decode — samples, stereo frames, odd tail, non-audio") {
    import Multimodal.{AudioCodec, MediaFixtures}
    // mono 16-bit: bytes 0x01 0x02 0x03 0x04 -> samples 0x0201, 0x0403
    val mono = MediaFixtures.wavBytes(8000, 1, 4L,
      Array[Byte](0x01, 0x02, 0x03, 0x04))
    val (rate, ch, ss) = AudioCodec.pcmSamples(mono).get
    assert(rate == 8000 && ch == 1)
    assert(ss.toSeq == Seq[Short](0x0201, 0x0403))
    // negative sample: 0xFF 0xFF -> -1
    val neg = MediaFixtures.wavBytes(8000, 1, 2L,
      Array[Byte](0xff.toByte, 0xff.toByte))
    assert(AudioCodec.pcmSamples(neg).get._3.toSeq == Seq[Short](-1))
    // stereo: 6 payload bytes but declared larger; frame size 4 ->
    // only 1 complete frame (2 samples), tail truncated
    val st = MediaFixtures.wavBytes(16000, 2, 600L,
      Array[Byte](1, 0, 2, 0, 3, 0))
    val (r2, c2, s2) = AudioCodec.pcmSamples(st).get
    assert(r2 == 16000 && c2 == 2 && s2.toSeq == Seq[Short](1, 2))
    // non-audio bytes -> None
    assert(AudioCodec.pcmSamples("not a wav".getBytes).isEmpty)
    assert(AudioCodec.pcmSamples(Array.emptyByteArray).isEmpty)
  }

  test("image dHash: brightness twins pair within hamming 3, distinct patterns do not") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") < 6)
    val twins = Multimodal.synthesizeImageTwins(docs)
    assert(twins.count() == 12)
    val fp = Multimodal.imageDHash(twins)
      .select(col("media_id").as("id"), col("dhash").as("fp"))
    assert(fp.count() == 12) // every image decodes
    val pairs = graft.operators.Dedup.fingerprintPairs(fp, maxHamming = 3)
      .as[(Long, Long, Int)].collect()
    (0L until 6L).foreach { i =>
      assert(pairs.exists(p => p._1 == i && p._2 == i + 1000000L),
        s"twin of image $i not detected")
    }
    // the 6 distinct patterns must not collide with each other
    assert(!pairs.exists(p => p._2 < 1000000L),
      s"distinct patterns wrongly paired: ${pairs.mkString(",")}")
  }

  test("sampleFrames really decodes image rows of the decodable table") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(8)
    val frames = Multimodal.sampleFrames(Multimodal.synthesizeDecodable(docs))
      .collect().groupBy(_.getLong(0))
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    frames.foreach { case (id, rows) =>
      if (id % 4 <= 1) {
        val w = (8 + id % 32).toInt; val h = (8 + (id * 7) % 32).toInt
        assert(rows.length == 2)
        assert(rows.map(r => r.getAs[Array[Byte]](2).length).sorted.toSeq ==
          Seq(768, w * h * 3).sorted)
      } else if (id % 4 == 2) {
        // REAL PCM windows: each frame is the exact payload byte slice
        val payload = texts(id).getBytes("UTF-8")
        val ch = 1 + (id % 2).toInt
        val ns = (payload.length / (2 * ch)) * ch
        assert(rows.length == Seq(0, 64, 128).count(_ < ns))
        rows.sortBy(_.getInt(1)).zipWithIndex.foreach { case (r, f) =>
          val start = f * 64
          val len = math.min(16, ns - start)
          val want = payload.slice(2 * start, 2 * (start + len)).toSeq
          assert(r.getAs[Array[Byte]](2).toSeq == want, s"media $id frame $f")
        }
      } else assert(rows.length == 3)
    }
  }

  test("schemaDrift: added/removed/type_changed/stable per props key") {
    import spark.implicits._
    val before = Seq("""{"a": 1, "b": "x", "gone": true}""",
      """{"a": 2, "b": "y", "gone": false}""").toDF("properties")
    val after = Seq("""{"a": 3, "b": 1.5, "fresh": "hi"}""").toDF("properties")
    val got = graft.operators.Layouts.schemaDrift(before, after)
      .as[(String, String, String, String)].collect().toSet
    assert(got == Set(
      ("a", "bigint", "bigint", "stable"),
      ("b", "string", "double", "type_changed"),
      ("fresh", null, "string", "added"),
      ("gone", "boolean", null, "removed")))
  }

  test("identityGraph: chains stitch to one canonical id, islands stay apart") {
    import spark.implicits._
    // a1 —e1— a2 —d1— a3 form one person; a9 is alone on its own email
    val edges = Seq(
      ("a1", "e1"), ("a2", "e1"), ("a2", "d1"), ("a3", "d1"),
      ("a9", "e9")).toDF("id_a", "id_b")
    val got = graft.operators.UserRecognition.identityGraph(edges)
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(
      ("a1", "a1", 5L), ("a2", "a1", 5L), ("a3", "a1", 5L),
      ("e1", "a1", 5L), ("d1", "a1", 5L),
      ("a9", "a9", 2L), ("e9", "a9", 2L)))
  }

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)
}

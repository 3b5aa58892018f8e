package graft

import java.nio.file.Files

import graft.sources.Mmdb

/** MaxMind DB binary format: fixture write → decode round-trip, the
  * IPv4 tree walk over mixed prefix lengths, and the typed data
  * section. */
class MmdbSpec extends GraftSpec {

  private def tmpMmdb(): String =
    Files.createTempFile("mmdb-spec", ".mmdb").toString

  private def ip(a: Int, b: Int, c: Int, d: Int): Long =
    a.toLong * 16777216L + b * 65536L + c * 256L + d

  test("range enumeration: mixed /8 /16 /24 /32 prefixes come back with exact bounds and attrs") {
    val path = tmpMmdb()
    Mmdb.write(path, Seq(
      (ip(9, 0, 0, 0), 8, Map[String, Any]("country" ->
        Map[String, Any]("iso_code" -> "US"))),
      (ip(10, 20, 0, 0), 16, Map[String, Any]("country" ->
        Map[String, Any]("iso_code" -> "DE"))),
      (ip(10, 21, 7, 0), 24, Map[String, Any]("country" ->
        Map[String, Any]("iso_code" -> "FR"))),
      (ip(10, 21, 7, 0) + 256L + 9L, 32, Map[String, Any]("country" ->
        Map[String, Any]("iso_code" -> "GB")))))
    val got = Mmdb.readRanges(path)
      .map(r => (r.ipLo, r.ipHi, r.attrs("country.iso_code"))).toSet
    assert(got == Set(
      (ip(9, 0, 0, 0), ip(9, 255, 255, 255), "US"),
      (ip(10, 20, 0, 0), ip(10, 20, 255, 255), "DE"),
      (ip(10, 21, 7, 0), ip(10, 21, 7, 255), "FR"),
      (ip(10, 21, 8, 9), ip(10, 21, 8, 9), "GB")))
  }

  test("single-IP tree walk agrees with range enumeration; misses return None") {
    val path = tmpMmdb()
    Mmdb.write(path, Seq(
      (ip(10, 20, 0, 0), 16, Map[String, Any]("c" -> "DE")),
      (ip(10, 21, 7, 0), 24, Map[String, Any]("c" -> "FR"))))
    assert(Mmdb.lookupIp(path, ip(10, 20, 3, 4)).map(_("c")) ==
      Some("DE"))
    assert(Mmdb.lookupIp(path, ip(10, 21, 7, 200)).map(_("c")) ==
      Some("FR"))
    assert(Mmdb.lookupIp(path, ip(10, 21, 8, 1)).isEmpty)
    assert(Mmdb.lookupIp(path, ip(192, 168, 0, 1)).isEmpty)
    // every enumerated range's lo and hi resolve to the same record
    Mmdb.readRanges(path).foreach { r =>
      assert(Mmdb.lookupIp(path, r.ipLo).map(_("c")) ==
        Some(r.attrs("c")))
      assert(Mmdb.lookupIp(path, r.ipHi).map(_("c")) ==
        Some(r.attrs("c")))
    }
  }

  test("typed data section round-trips: string, uint, uint64, double, boolean, array, nested map") {
    val path = tmpMmdb()
    Mmdb.write(path, Seq(
      (ip(1, 2, 0, 0), 16, Map[String, Any](
        "name" -> "Zürich",
        "population" -> 421878L,
        "big" -> 10000000000L, // > uint32 -> uint64 encoding
        "lat" -> 47.3769,
        "eu" -> true,
        "langs" -> Seq("de", "fr"),
        "nested" -> Map[String, Any]("deep" ->
          Map[String, Any]("x" -> 1L))))))
    val attrs = Mmdb.readRanges(path).head.attrs
    assert(attrs("name") == "Zürich")
    assert(attrs("population") == "421878")
    assert(attrs("big") == "10000000000")
    assert(attrs("lat").toDouble == 47.3769)
    assert(attrs("eu") == "true")
    assert(attrs("langs.0") == "de" && attrs("langs.1") == "fr")
    assert(attrs("nested.deep.x") == "1")
  }

  test("dim() exposes requested dotted attrs as columns and feeds GeoIp.lookup") {
    import org.apache.spark.sql.functions._
    val path = tmpMmdb()
    Mmdb.write(path, Seq(
      (ip(10, 0, 0, 0), 16, Map[String, Any](
        "country" -> Map[String, Any]("iso_code" -> "US"),
        "traits" -> Map[String, Any]("asn" -> "AS1"))),
      (ip(10, 1, 0, 0), 16, Map[String, Any](
        "country" -> Map[String, Any]("iso_code" -> "DE"),
        "traits" -> Map[String, Any]("asn" -> "AS2")))))
    val dim = Mmdb.dim(spark, path,
      Seq("country.iso_code" -> "cc", "traits.asn" -> "asn"))
    assert(dim.columns.toSeq == Seq("ip_lo", "ip_hi", "cc", "asn"))
    import spark.implicits._
    val events = Seq("10.0.3.4", "10.1.200.9", "11.0.0.1").toDF("ip")
    val out = graft.operators.GeoIp.lookup(events, col("ip"), dim)
      .select(col("ip"), col("cc")).collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(out == Map("10.0.3.4" -> Some("US"),
      "10.1.200.9" -> Some("DE"), "11.0.0.1" -> None))
  }

  test("identical data records are DEDUPED in the data section (tree records share one offset)") {
    val pathA = tmpMmdb(); val pathB = tmpMmdb()
    val sameData = Map[String, Any]("country" ->
      Map[String, Any]("iso_code" -> "US"))
    val otherData = Map[String, Any]("country" ->
      Map[String, Any]("iso_code" -> "DE"))
    // A: 8 ranges, all the same data; B: 8 ranges, all distinct data
    Mmdb.write(pathA, (0 until 8).map(i =>
      (ip(10, i, 0, 0), 16, sameData)))
    Mmdb.write(pathB, (0 until 8).map(i =>
      (ip(10, i, 0, 0), 16, Map[String, Any]("country" ->
        Map[String, Any]("iso_code" -> f"C$i%02d")))))
    val a = java.nio.file.Files.size(java.nio.file.Paths.get(pathA))
    val b = java.nio.file.Files.size(java.nio.file.Paths.get(pathB))
    assert(a < b, s"dedup file ($a) should be smaller than distinct ($b)")
    // all 8 ranges still decode with the shared record
    val got = Mmdb.readRanges(pathA)
    assert(got.size == 8 &&
      got.forall(_.attrs("country.iso_code") == "US"))
    assert(Mmdb.readRanges(pathB).map(_.attrs("country.iso_code")).toSet
      .size == 8)
    otherData.size // keep otherData referenced
  }

  test("pointer decode: a map value referencing an earlier record resolves through the pointer") {
    // hand-crafted data section:
    //   offset 0: string "US"          -> 0x42 'U' 'S' (type 2, size 2)
    //   offset 3: map {c: pointer(0)}  -> 0xE1, key "c", 0x20 0x00
    // pointer control byte: 001 00 000 = 0x20, next byte 0x00 -> offset 0
    val buf = Array[Byte](
      0x42, 'U'.toByte, 'S'.toByte,
      0xE1.toByte, 0x41, 'c'.toByte, 0x20, 0x00)
    val v = Mmdb.decodeValue(buf, 0, 3)
    assert(v == Map("c" -> "US"))
    // a 19-bit pointer (ss=1): value = ((v3<<16)|next2) + 2048
    val buf2 = Array[Byte](
      0x42, 'U'.toByte, 'S'.toByte,
      0x28, 0x00, 0x00) // ss=1 v3=0 next2=0 -> 0+2048
    // target 2048 is out of range here; just verify the arithmetic by
    // placing the string AT sectionStart-2048+... instead: simpler to
    // verify ss=0 with a 3-bit high part: 0x21 0x00 -> (1<<8)|0 = 256
    val pad = Array.fill[Byte](256)(0)
    val buf3 = pad ++ Array[Byte](0x42, 'U'.toByte, 'S'.toByte) ++
      Array[Byte](0xE1.toByte, 0x41, 'c'.toByte, 0x21, 0x00)
    val v3 = Mmdb.decodeValue(buf3, 0, 259)
    assert(v3 == Map("c" -> "US"))
    buf2.length // keep referenced
  }

  test("metadata parses: node_count, record_size 24, ip_version 4") {
    val path = tmpMmdb()
    Mmdb.write(path, Seq(
      (ip(10, 0, 0, 0), 8, Map[String, Any]("c" -> "US"))))
    val meta = Mmdb.readMeta(
      Files.readAllBytes(java.nio.file.Paths.get(path)))
    assert(meta.recordSize == 24 && meta.ipVersion == 4)
    assert(meta.nodeCount == 8) // a /8 leaf hangs off 8 internal nodes
  }
}

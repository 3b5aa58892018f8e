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

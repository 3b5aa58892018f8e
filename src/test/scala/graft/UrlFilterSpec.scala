package graft

import org.apache.spark.sql.functions._

import graft.operators.UrlFilter

class UrlFilterSpec extends GraftSpec {
  import spark.implicits._

  private val urls = Seq(
    (1L, "https://news.example.com/articles/1"),
    (2L, "https://spam.bad-site.com/posts/2"),
    (3L, "https://bad-site.com/guide/3"),
    (4L, "https://notbad-site.com/guide/4"), // suffix of name, NOT subdomain
    (5L, "https://docs.example.com/ads/banner/5"),
    (6L, "https://shop.example.co.uk/product/6"),
    (7L, "http://tracker.ads-network.net/ads/click/7"), // domain beats path
    (8L, "https://example.com/top"))

  private def flagged = UrlFilter.flag(
    urls.toDF("id", "url"), "url",
    blockedDomains = Seq("bad-site.com", "ads-network.net"),
    blockedPathParts = Seq("/ads/"))

  test("host / path / registered domain extraction") {
    val byId = flagged.select("id", "host", "registered_domain")
      .as[(Long, String, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(byId(1L) == (("news.example.com", "example.com")))
    assert(byId(3L) == (("bad-site.com", "bad-site.com")))
    assert(byId(6L) == (("shop.example.co.uk", "example.co.uk"))) // eTLD+1
    assert(byId(8L) == (("example.com", "example.com")))
  }

  test("domain rules hit self + subdomains only; path rules; precedence") {
    val byId = flagged.select("id", "reason", "blocked")
      .as[(Long, String, Boolean)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(byId(2L) == (("domain", true))) // subdomain of listed domain
    assert(byId(3L) == (("domain", true))) // the listed domain itself
    assert(byId(4L) == (("ok", false)))    // name-suffix is NOT a subdomain
    assert(byId(5L) == (("path", true)))   // clean host, /ads/ path
    assert(byId(7L) == (("domain", true))) // domain listing is authoritative
    assert(byId(1L) == (("ok", false)))
  }

  test("keep drops exactly the blocked rows and restores the schema") {
    val kept = UrlFilter.keep(urls.toDF("id", "url"), "url",
      Seq("bad-site.com", "ads-network.net"), Seq("/ads/"))
    assert(kept.columns.toSeq == Seq("id", "url"))
    assert(kept.select("id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 4L, 6L, 8L))
  }
}

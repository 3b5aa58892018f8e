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

  test("canonicalUrl: case, ports, fragments, tracking params, slashes") {
    import org.apache.spark.sql.functions.col
    val cases = Seq(
      // scheme+host lowercase, path case preserved
      (1L, "HTTPS://Ex.COM/Path/X", "https://ex.com/Path/X"),
      // default ports strip; non-default survive
      (2L, "http://a.com:80/x", "http://a.com/x"),
      (3L, "https://a.com:443/x", "https://a.com/x"),
      (4L, "http://a.com:8080/x", "http://a.com:8080/x"),
      // https:80 is NOT a default port pair
      (5L, "https://a.com:80/x", "https://a.com:80/x"),
      // fragment drops, trailing slash trims (root slash survives)
      (6L, "https://a.com/x/#sec", "https://a.com/x"),
      (7L, "https://a.com/", "https://a.com/"),
      // tracking params drop wherever they sit; order of rest kept
      (8L, "https://a.com/p?utm_source=t&q=1&fbclid=f&r=2",
        "https://a.com/p?q=1&r=2"),
      (9L, "https://a.com/p?utm_campaign=x", "https://a.com/p"),
      (10L, "https://a.com/p?gclid=1&utm_x=2", "https://a.com/p"))
    val out = cases.toDF("id", "url", "want")
      .select(col("id"), col("want"),
        UrlFilter.canonicalUrl(col("url")).as("got")).collect()
    out.foreach(r => assert(r.getString(2) == r.getString(1),
      s"case ${r.getLong(0)}: got '${r.getString(2)}'"))
  }

  test("perKeyCap keeps exactly N per key by the seeded order, via WindowGroupLimit") {
    import org.apache.spark.sql.functions._
    import graft.operators.Sampling
    val df = (0L until 300L).map(i => (i, s"k${i % 3}")).toDF("id", "key")
    val kept = Sampling.perKeyCap(df, "key", "id", maxPerKey = 7, seed = "s")
    val byKey = kept.groupBy("key").count().as[(String, Long)].collect().toMap
    assert(byKey.values.toSet == Set(7L) && byKey.size == 3)
    // survivors = the 7 smallest md5("s:"+id) per key, exactly
    val expect = (0L until 300L).groupBy(i => i % 3).flatMap { case (_, ids) =>
      ids.sortBy(i => java.security.MessageDigest.getInstance("MD5")
        .digest(s"s:$i".getBytes).map("%02x".format(_)).mkString).take(7)
    }.toSet
    assert(kept.select("id").as[Long].collect().toSet == expect)
    // the cap must compile to WindowGroupLimit (map-side top-N per key)
    val plan = kept.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$plan")
  }

  test("canonicalDedup: variants of one page collapse, schemes stay split, min id survives") {
    val df = Seq(
      (1L, "https://ex.com/a?utm_source=1"),
      (2L, "HTTPS://ex.com:443/a/"),
      (3L, "http://ex.com/a"),
      (7L, "https://ex.com/a#frag")).toDF("doc_id", "url")
    val r = graft.operators.UrlFilter.canonicalDedup(df, "doc_id", "url")
      .collect()
      .map(x => x.getString(0) ->
        ((x.getAs[Long]("n_docs"), x.getAs[Long]("survivor_id"))))
      .toMap
    assert(r("https://ex.com/a") == ((3L, 1L)))
    assert(r("http://ex.com/a") == ((1L, 3L)))
    assert(r.size == 2)
  }
}

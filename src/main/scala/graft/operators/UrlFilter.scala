package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL / domain filtering for web-corpus curation (training-data
  * extension; the UT1-blocklist stage every web-scale pipeline runs —
  * RefinedWeb §3.1, Dolma's URL filters).
  *
  * Rules follow the blocklist convention: a listed domain blocks itself
  * and every subdomain (`bad-site.com` blocks `spam.bad-site.com` but
  * not `notbad-site.com`), and path substrings catch ad/click routes on
  * otherwise-fine hosts. Everything is a narrow codegen'd column
  * expression over the URL string — no shuffle, no UDF; at 100 TB this
  * runs inside the first scan's WholeStageCodegen span and the dropped
  * rows never reach later stages. Blocklists are plan literals: real UT1
  * lists (millions of domains) would swap the `exists` chain for a
  * broadcast left-semi join on [[registeredDomain]] — same output
  * contract, so the swap is an implementation detail behind this API.
  */
object UrlFilter {

  /** Multi-label public suffixes where the registrable domain needs three
    * labels (a tiny excerpt of the public-suffix list; extend as data). */
  val DefaultPublicSuffixes: Seq[String] =
    Seq("co.uk", "org.uk", "ac.uk", "com.au", "co.jp", "com.br")

  /** Hostname of an absolute URL (scheme required, port stripped). */
  def host(url: Column): Column =
    regexp_extract(lower(url), "^[a-z][a-z0-9+.-]*://([^/:?#]+)", 1)

  /** Path component (everything from the first `/` after the host). */
  def path(url: Column): Column =
    regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*(/[^?#]*)", 1)

  /** Tracking params dropped by [[canonicalUrl]] (anchored key match). */
  val TrackingParamPattern: String =
    "^(utm_[A-Za-z0-9_]+|gclid|fbclid|msclkid|ttclid|mc_eid)="

  /** Canonical URL form — the normalization a crawl pipeline applies
    * BEFORE url-dedup so trivially-different references collapse:
    * lowercase scheme+authority, drop the fragment, strip default ports
    * (`:80` on http, `:443` on https), drop tracking query params
    * ([[TrackingParamPattern]]), trim a trailing slash from a non-root
    * path. Every rule is from the Java/RE2 common subset and GROUP-FREE
    * on the replacement side (Java replacements use `$1` where RE2 uses
    * `\1` — a parity trap); splitting/filtering uses positions and
    * higher-order list ops instead, so a DuckDB oracle replays the
    * rewrite byte-for-byte. One codegen'd projection, no UDF. */
  def canonicalUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    val sh = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", 0)
    val tail = noFrag.substr(length(sh) + 1, length(noFrag))
    val shl = lower(sh)
    val shp = when(shl.startsWith("http://") && shl.endsWith(":80"),
        shl.substr(lit(1), length(shl) - 3))
      .when(shl.startsWith("https://") && shl.endsWith(":443"),
        shl.substr(lit(1), length(shl) - 4))
      .otherwise(shl)
    val qpos = instr(tail, "?")
    val pathPart = when(qpos === 0, tail)
      .otherwise(tail.substr(lit(1), qpos - 1))
    val qs = when(qpos === 0, lit(""))
      .otherwise(tail.substr(qpos + 1, length(tail)))
    val path2 = when(pathPart.endsWith("/") && length(pathPart) > 1,
        pathPart.substr(lit(1), length(pathPart) - 1))
      .otherwise(pathPart)
    val params = filter(split(qs, "&"),
      p => length(p) > 0 && !p.rlike(TrackingParamPattern))
    val q2 = when(size(params) > 0,
      concat(lit("?"), concat_ws("&", params))).otherwise(lit(""))
    concat(shp, path2, q2)
  }

  /** eTLD+1: last two host labels, or three when the last two form a
    * listed public suffix (`shop.example.co.uk` -> `example.co.uk`). */
  def registeredDomain(hostCol: Column,
                       suffixes: Seq[String] = DefaultPublicSuffixes): Column = {
    val labels = split(hostCol, "\\.")
    val last2 = concat_ws(".", slice(labels, -2, 2))
    val isPublic = suffixes.map(last2 === _)
      .reduceOption(_ || _).getOrElse(lit(false))
    when(isPublic && size(labels) >= 3, concat_ws(".", slice(labels, -3, 3)))
      .otherwise(last2)
  }

  /** True when `hostCol` is `domain` or any subdomain of it. */
  def domainMatches(hostCol: Column, domain: String): Column =
    hostCol === domain || hostCol.endsWith("." + domain)

  /** Per-row verdict over a URL column. Output adds `host`,
    * `registered_domain`, `blocked` and `reason` (`domain` beats `path`
    * beats `ok` — deterministic rule precedence, matching blocklist
    * semantics where a domain listing is authoritative). */
  def flag(df: DataFrame, urlCol: String,
           blockedDomains: Seq[String],
           blockedPathParts: Seq[String],
           suffixes: Seq[String] = DefaultPublicSuffixes): DataFrame = {
    val h = host(col(urlCol))
    val domainHit = blockedDomains.map(domainMatches(h, _))
      .reduceOption(_ || _).getOrElse(lit(false))
    val pathHit = blockedPathParts.map(p => path(col(urlCol)).contains(p))
      .reduceOption(_ || _).getOrElse(lit(false))
    df.withColumn("host", h)
      .withColumn("registered_domain", registeredDomain(col("host"), suffixes))
      .withColumn("reason",
        when(domainHit, "domain").when(pathHit, "path").otherwise("ok"))
      .withColumn("blocked", col("reason") =!= "ok")
  }

  /** The keep-side filter a pipeline composes: rows whose URL survives. */
  def keep(df: DataFrame, urlCol: String,
           blockedDomains: Seq[String],
           blockedPathParts: Seq[String]): DataFrame =
    flag(df, urlCol, blockedDomains, blockedPathParts)
      .filter(!col("blocked"))
      .drop("host", "registered_domain", "reason", "blocked")

  /** URL-keyed dedup groups — the crawl-corpus collapse step BEFORE
    * any content hashing: re-fetches of one page under scheme-case /
    * default-port / trailing-slash / tracking-param / fragment
    * variants all share a [[canonicalUrl]], so grouping on it finds
    * them at the cost of one hash aggregation (no shingles, no
    * signatures). Survivor = smallest id (the [[Dedup]] convention).
    * One row per canonical URL: (canon, n_docs, survivor_id) —
    * filter `n_docs >= 2` for the collapse report.
    *
    * Scale shape: one narrow projection (the canonicalizer is pure
    * string ops, codegen'd) + one hash aggregation on the canonical
    * key — map-side combined, no window, no join. */
  def canonicalDedup(df: DataFrame, idCol: String,
                     urlCol: String): DataFrame =
    df.select(col(idCol).as("id"),
        canonicalUrl(col(urlCol)).as("canon"))
      .groupBy(col("canon"))
      .agg(count(lit(1)).as("n_docs"), min(col("id")).as("survivor_id"))
}

package graft.chain

import java.util.concurrent.ConcurrentHashMap

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode

/** The function context surface — SURVEY §2.9 (ref `types/protocols/
  * functions.d.ts:68-73,140-176`): every event function receives
  * `{ log, store, props, geo, ua, retries, connection }` alongside the
  * event. [[FunctionChain.runOne]] builds one per event (geo/ua derive
  * from the event's own context, as rotor's ctx builder does).
  */
case class ChainContext(
    connectionId: String,
    props: Map[String, String],
    store: TTLStore,
    geo: Option[JsonNode],
    ua: Option[ObjectNode],
    retries: Int,
    /** When set (the [[FunctionChain.testRun]] harness), log calls are
      * captured as (level, message) instead of written to stderr. */
    logSink: Option[scala.collection.mutable.Buffer[(String, String)]] = None) {
  /** FunctionLogger surface (ref functions.d.ts:62-67). Log output is a
    * side channel in the reference (ClickHouse logger); here messages go
    * to the task's stderr, which is what Spark executors collect. */
  def logInfo(msg: String): Unit = logSink match {
    case Some(buf) => buf += (("info", msg)): Unit
    case None => System.err.println(s"[chain:$connectionId] $msg")
  }
  def logError(msg: String): Unit = logSink match {
    case Some(buf) => buf += (("error", msg)): Unit
    case None => System.err.println(s"[chain:$connectionId] ERROR $msg")
  }

  /** FetchType surface (ref `functions.d.ts:24-30`: fetch-with-logging
    * handed to every function). Minimal blocking HTTP returning the
    * response body; a non-2xx status throws (the reference's
    * destinations treat those as function errors, which the chain's
    * error/Retry handling then classifies). In this engine the SaaS
    * destinations are warehouse PROJECTIONS (K3), so fetch is the
    * escape hatch for custom user functions — egress policy is
    * deployment-specific, exactly as the reference's rotor relies on
    * its network. */
  def fetch(url: String, method: String = "GET",
            body: Option[String] = None,
            headers: Map[String, String] = Map.empty,
            timeoutMs: Int = 5000): String = {
    val conn = new java.net.URI(url).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    try {
      conn.setRequestMethod(method)
      conn.setConnectTimeout(timeoutMs)
      conn.setReadTimeout(timeoutMs)
      headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
      body.foreach { b =>
        conn.setDoOutput(true)
        val os = conn.getOutputStream
        try os.write(b.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally os.close()
      }
      val code = conn.getResponseCode
      val is = if (code >= 200 && code < 300) conn.getInputStream
               else conn.getErrorStream
      val text =
        if (is == null) ""
        else try new String(is.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8)
        finally is.close()
      if (code < 200 || code >= 300)
        throw new RuntimeException(s"fetch $method $url -> $code: $text")
      text
    } finally conn.disconnect()
  }
}

/** TTL key-value store exposed to functions (ref `functions.d.ts:9-22,
  * 36-38` + redis impl `lib/store.ts:28-56`): get/set/del/ttl/getWithTTL,
  * TTL from seconds, a duration string ("30m", "1d", "inf") or
  * `{ttl: n}`; default 31 days; `increment` mirrors the redis INCR the
  * amplitude session store leans on.
  *
  * Backing: a JVM-global concurrent map namespaced per connection, with
  * lazy expiry — the single-process stand-in for the reference's Redis.
  * Honest scale note: on a multi-executor cluster a per-JVM map is NOT
  * coherent; the production backing is an external KV (Redis, as in the
  * reference) reached from the executors — the SURFACE is what operators
  * and functions program against, and it is identical here.
  */
class TTLStore(namespace: String) extends Serializable {
  import TTLStore._

  private def k(key: String) = s"store:$namespace:$key"

  def get(key: String): Option[JsonNode] = entry(key).map(_._1)

  def getWithTTL(key: String): Option[(JsonNode, Long)] =
    entry(key).map { case (v, exp) =>
      (v, if (exp < 0) -1L else math.max(0L, (exp - now()) / 1000L))
    }

  def set(key: String, value: JsonNode, ttl: SetOpts = DefaultTtl): Unit = {
    val sec = ttlSeconds(ttl)
    val exp = if (sec < 0) -1L else now() + sec * 1000L
    data.put(k(key), (value.deepCopy[JsonNode](), exp)): Unit
  }

  def setLong(key: String, value: Long, ttl: SetOpts = DefaultTtl): Unit =
    set(key, mapper.getNodeFactory.numberNode(value), ttl)

  /** Atomic counter (redis INCR analogue). Returns the new value. */
  def increment(key: String, delta: Long = 1L, ttl: SetOpts = DefaultTtl): Long = {
    val sec = ttlSeconds(ttl)
    val exp = if (sec < 0) -1L else now() + sec * 1000L
    val updated = data.compute(k(key), (_, cur) => {
      val base = Option(cur).filter { case (_, e) => e < 0 || e > now() }
        .map(_._1.asLong(0L)).getOrElse(0L)
      (mapper.getNodeFactory.numberNode(base + delta), exp)
    })
    updated._1.asLong()
  }

  def del(key: String): Unit = data.remove(k(key)): Unit

  /** Remaining TTL in seconds; -1 = no expiry, -2 = missing (redis). */
  def ttl(key: String): Long = entry(key) match {
    case None => -2L
    case Some((_, exp)) if exp < 0 => -1L
    case Some((_, exp)) => math.max(0L, (exp - now()) / 1000L)
  }

  private def entry(key: String): Option[(JsonNode, Long)] =
    Option(data.get(k(key))).flatMap { case e @ (_, exp) =>
      if (exp >= 0 && exp <= now()) { data.remove(k(key), e); None }
      else Some(e)
    }

  /** Remove every entry of this namespace (fresh-store semantics of a
    * console test run) — test/console surface, not a hot path. */
  def clear(): Unit = {
    val prefix = s"store:$namespace:"
    import scala.jdk.CollectionConverters._
    data.keySet().asScala.filter(_.startsWith(prefix))
      .foreach(data.remove(_): Unit)
  }

  /** All live entries of this namespace (ref UDFTestRun returns the
    * store's final state, udf_wrapper.ts:346-498) — test/console
    * surface, not a hot path. */
  def dump(): Map[String, JsonNode] = {
    val prefix = s"store:$namespace:"
    import scala.jdk.CollectionConverters._
    data.asScala.collect {
      case (key, (v, exp)) if key.startsWith(prefix) &&
          (exp < 0 || exp > now()) =>
        key.substring(prefix.length) -> v
    }.toMap
  }
}

object TTLStore {
  /** ref `lib/store.ts:7` defaultTTL = 31 days. */
  val DefaultTtlSeconds: Long = 60L * 60 * 24 * 31

  sealed trait SetOpts
  case class TtlSeconds(seconds: Long) extends SetOpts
  case class TtlDuration(spec: String) extends SetOpts
  case object NoExpiry extends SetOpts
  val DefaultTtl: SetOpts = TtlSeconds(DefaultTtlSeconds)

  private[chain] val mapper = new ObjectMapper()
  /** JVM-global backing map: (namespaced key) -> (value, expireAtMs | -1). */
  private val data = new ConcurrentHashMap[String, (JsonNode, Long)]()
  private[chain] def now(): Long = System.currentTimeMillis()
  private[graft] def clearAll(): Unit = data.clear()

  private val DurationRe = "(?i)^(\\d+)\\s*(s|m|h|d|w)?$".r

  /** ref `getTtlSec` lib/store.ts:10-26. */
  def ttlSeconds(opts: SetOpts): Long = opts match {
    case NoExpiry => -1L
    case TtlSeconds(s) => s
    case TtlDuration(spec) => spec.trim.toLowerCase match {
      case "inf" => -1L
      case DurationRe(n, unit) =>
        val mult = Option(unit).map(_.toLowerCase) match {
          case Some("m") => 60L
          case Some("h") => 3600L
          case Some("d") => 86400L
          case Some("w") => 604800L
          case _ => 1L
        }
        n.toLong * mult
      case _ => DefaultTtlSeconds
    }
  }
}

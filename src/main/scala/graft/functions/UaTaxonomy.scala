package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** F2 user-agent taxonomy — ONE ordered rule table driving BOTH parser
  * twins (the Column form in [[Scalars.parseUa]] and the JVM form in
  * [[graft.chain.FunctionChain.parseUaNode]]), so the two cannot drift:
  * every rule is a plain Java regex evaluated with identical find()
  * semantics by `rlike`/`regexp_extract` on the Spark side and
  * `java.util.regex` on the chain side.
  *
  * The field shape is the reference's `UserAgent` protocol type
  * (`types/protocols/functions.d.ts:102-125`): browser{name, version,
  * major}, engine{name, version}, os{name, version}, device{model,
  * type, vendor}, cpu{architecture}, bot. Bot keywords are the
  * reference's list verbatim (`lib/ua.ts:6`). Detection ORDER is the
  * taxonomy, as in any UA parser: Edge/Opera/Samsung UAs all contain
  * "Chrome", nearly everything advertises "Safari", iOS UAs say "like
  * Mac OS X", ChromeOS says "X11" — most-specific first, first match
  * wins. */
object UaTaxonomy {

  /** ref lib/ua.ts:6 — substring match on the lowercased UA. */
  val botKeywords: Seq[String] =
    Seq("bot", "spider", "headless", "crawler", "uptimia")
  val botDetect: String = "(?i)" + botKeywords.mkString("|")

  /** (name, detect regex, version regexes — first with a group-1 match
    * wins). */
  final case class Rule(name: String, detect: String,
                        versions: Seq[String])

  val browsers: Seq[Rule] = Seq(
    Rule("Edge", "(?i)edg(?:e|a|ios)?/",
      Seq("(?i)edg(?:e|a|ios)?/([0-9.]+)")),
    Rule("Opera", "(?i)opr/|opera",
      Seq("OPR/([0-9.]+)", "Version/([0-9.]+)", "Opera[ /]([0-9.]+)")),
    Rule("Samsung Internet", "(?i)samsungbrowser",
      Seq("(?i)samsungbrowser/([0-9.]+)")),
    Rule("UC Browser", "(?i)ucbrowser",
      Seq("(?i)ucbrowser/([0-9.]+)")),
    Rule("Vivaldi", "(?i)vivaldi", Seq("(?i)vivaldi/([0-9.]+)")),
    Rule("Yandex", "(?i)yabrowser", Seq("(?i)yabrowser/([0-9.]+)")),
    Rule("IE", "(?i)msie |trident/",
      Seq("MSIE ([0-9.]+)", "rv:([0-9.]+)")),
    Rule("Chrome", "(?i)chrome|crios",
      Seq("(?:Chrome|CriOS)/([0-9.]+)")),
    Rule("Firefox", "(?i)firefox|fxios",
      Seq("(?:Firefox|FxiOS)/([0-9.]+)")),
    Rule("Safari", "(?i)safari",
      Seq("Version/([0-9.]+)", "Safari/([0-9.]+)")))

  val engines: Seq[Rule] = Seq(
    // legacy Edge ("Edge/18") is EdgeHTML; Chromium Edge ("Edg/") is
    // Blink like every other Chromium skin
    Rule("EdgeHTML", "(?i)edge/", Seq("(?i)edge/([0-9.]+)")),
    Rule("Blink",
      "(?i)chrome|crios|edg/|edga|edgios|opr/|samsungbrowser|yabrowser|vivaldi|ucbrowser",
      Seq("(?i)(?:chrome|crios)/([0-9.]+)")),
    Rule("Presto", "(?i)presto", Seq("(?i)presto/([0-9.]+)")),
    Rule("Trident", "(?i)trident", Seq("(?i)trident/([0-9.]+)")),
    Rule("Gecko", "(?i)gecko", Seq("rv:([0-9.]+)")),
    Rule("WebKit", "(?i)applewebkit",
      Seq("(?i)applewebkit/([0-9.]+)")))

  /** Version transform applied after extraction. */
  sealed trait Tx
  case object NoTx extends Tx
  case object UnderscoreDot extends Tx
  case object WinNt extends Tx

  /** NT build → marketing version (the public ua-parser windows map). */
  val winNtMap: Seq[(String, String)] = Seq(
    "10.0" -> "10", "6.4" -> "10", "6.3" -> "8.1", "6.2" -> "8",
    "6.1" -> "7", "6.0" -> "Vista", "5.2" -> "XP", "5.1" -> "XP",
    "5.0" -> "2000")

  final case class OsRule(name: String, detect: String,
                          versions: Seq[String], tx: Tx)

  val oses: Seq[OsRule] = Seq(
    OsRule("Windows Phone", "(?i)windows phone",
      Seq("(?i)windows phone(?: os)? ([0-9.]+)"), NoTx),
    OsRule("ChromeOS", "(?i)cros",
      Seq("(?i)cros [^ ]+ ([0-9.]+)"), NoTx),
    OsRule("iOS", "(?i)iphone|ipad|ipod|ios",
      Seq("(?i)os ([0-9_]+)"), UnderscoreDot),
    OsRule("Android", "(?i)android",
      Seq("(?i)android ([0-9.]+)"), NoTx),
    OsRule("macOS", "(?i)macintosh|mac os",
      Seq("(?i)mac os x ([0-9_.]+)"), UnderscoreDot),
    OsRule("Windows", "(?i)windows",
      Seq("Windows NT ([0-9.]+)"), WinNt),
    OsRule("Linux", "(?i)linux|x11|ubuntu", Seq(), NoTx))

  /** Device: vendor + model (literal or extracted) + type. Type default
    * is "desktop" per ref ua.ts:24. */
  final case class DeviceRule(detect: String, vendor: String,
                              model: Either[String, String],
                              dtype: String)

  val devices: Seq[DeviceRule] = Seq(
    DeviceRule("(?i)apple ?watch|watch ?os", "Apple",
      Left("Watch"), "wearable"),
    DeviceRule("(?i)playstation|xbox|nintendo", "",
      Right("(?i)(playstation [0-9a-z]+|xbox[^;)( ]*|nintendo [0-9a-z]+)"),
      "console"),
    DeviceRule("(?i)smart-?tv|appletv|googletv|hbbtv|tizen.*tv|web0?s.*tv",
      "", Left(""), "smarttv"),
    DeviceRule("(?i)ipad", "Apple", Left("iPad"), "tablet"),
    DeviceRule("(?i)iphone", "Apple", Left("iPhone"), "mobile"),
    DeviceRule("(?i)ipod", "Apple", Left("iPod"), "mobile"),
    DeviceRule("(?i)sm-[tx]", "Samsung",
      Right("(SM-[A-Za-z0-9]+)"), "tablet"),
    DeviceRule("(?i)sm-", "Samsung",
      Right("(SM-[A-Za-z0-9]+)"), "mobile"),
    DeviceRule("(?i)pixel", "Google",
      Right("(?i)(pixel(?: [0-9]+a?)?(?: pro| xl| fold)?)"), "mobile"),
    // Android without a "Mobile" token is a keyboard-less tablet
    DeviceRule("(?i)^(?!.*mobile).*android", "", Left(""), "tablet"),
    DeviceRule("(?i)mobile|android", "", Left(""), "mobile"))

  /** (architecture, detect) — ordered; amd64 before ia32 so "x86_64"
    * never half-matches "x86", arm64 before arm. */
  val cpus: Seq[(String, String)] = Seq(
    "amd64" -> "(?i)x86_64|x64|wow64|win64|amd64",
    "arm64" -> "(?i)arm64|aarch64",
    "arm" -> "(?i)\\barm",
    "ia32" -> "(?i)i[3-6]86|x86",
    "ppc" -> "(?i)ppc|powerpc")

  // ---- Column twin ----------------------------------------------------

  private def firstVersion(raw: Column, patterns: Seq[String]): Column =
    patterns.foldRight(lit("")) { (p, acc) =>
      val v = regexp_extract(raw, p, 1)
      when(length(v) > 0, v).otherwise(acc)
    }

  private def ruleName(raw: Column, rules: Seq[Rule]): Column =
    rules.foldRight(lit("unknown")) { (r, acc) =>
      when(raw.rlike(r.detect), r.name).otherwise(acc)
    }

  private def ruleVersion(raw: Column, name: Column,
                          rules: Seq[Rule]): Column =
    rules.foldRight(lit("")) { (r, acc) =>
      when(name === r.name, firstVersion(raw, r.versions)).otherwise(acc)
    }

  /** The flat struct [[Scalars.parseUa]] exposes. Field names keep the
    * pre-taxonomy ones (name/version/os_name/os_version/device_type/
    * bot) and add major, engine_name, engine_version, device_vendor,
    * device_model, cpu_architecture. */
  def parseColumn(ua: Column): Column = {
    val raw = coalesce(ua, lit(""))
    val name = ruleName(raw, browsers)
    val version = ruleVersion(raw, name, browsers)
    val engine = ruleName(raw, engines)
    val engineVersion = ruleVersion(raw, engine, engines)
    val osName = oses.foldRight(lit("unknown")) { (r, acc) =>
      when(raw.rlike(r.detect), r.name).otherwise(acc)
    }
    // device: first matching rule wins
    val (dVendor, dModel, dType) = devices.foldRight(
      (lit(""), lit(""), lit("desktop"))) { case (r, (av, am, at)) =>
      val hit = raw.rlike(r.detect)
      val model = r.model match {
        case Left(lit0) => lit(lit0)
        case Right(p) => regexp_extract(raw, p, 1)
      }
      (when(hit, r.vendor).otherwise(av),
        when(hit, model).otherwise(am),
        when(hit, r.dtype).otherwise(at))
    }
    val cpu = cpus.foldRight(lit("")) { case ((arch, p), acc) =>
      when(raw.rlike(p), arch).otherwise(acc)
    }
    val bot = lower(raw).rlike(botKeywords.mkString("|"))
    val major =
      when(length(version) > 0, split(version, "\\.").getItem(0))
        .otherwise(lit(""))
    struct(
      name.as("name"),
      version.as("version"),
      major.as("major"),
      engine.as("engine_name"),
      engineVersion.as("engine_version"),
      osName.as("os_name"),
      osVersionFor(raw, osName).as("os_version"),
      dType.as("device_type"),
      dVendor.as("device_vendor"),
      dModel.as("device_model"),
      cpu.as("cpu_architecture"),
      bot.as("bot"))
  }

  private def osVersionFor(raw: Column, osName: Column): Column =
    oses.foldRight(lit("")) { (r, acc) =>
      val v = firstVersion(raw, r.versions)
      val txd = r.tx match {
        case NoTx => v
        case UnderscoreDot => regexp_replace(v, "_", ".")
        case WinNt => winNtMap.foldRight(v) { case ((nt, mk), a) =>
          when(v === nt, mk).otherwise(a)
        }
      }
      when(osName === r.name, txd).otherwise(acc)
    }

  // ---- JVM twin -------------------------------------------------------

  final case class UaResult(name: String, version: String, major: String,
                            engineName: String, engineVersion: String,
                            osName: String, osVersion: String,
                            deviceType: String, deviceVendor: String,
                            deviceModel: String, cpuArchitecture: String,
                            bot: Boolean)

  private def jFind(p: String, s: String): Boolean =
    java.util.regex.Pattern.compile(p).matcher(s).find()
  private def jExtract(p: String, s: String): String = {
    val m = java.util.regex.Pattern.compile(p).matcher(s)
    if (m.find() && m.groupCount() >= 1 && m.group(1) != null) m.group(1)
    else ""
  }
  private def jFirstVersion(s: String, patterns: Seq[String]): String =
    patterns.iterator.map(jExtract(_, s)).find(_.nonEmpty).getOrElse("")

  def parse(ua: String): UaResult = {
    val s = if (ua == null) "" else ua
    val browser = browsers.find(r => jFind(r.detect, s))
    val name = browser.map(_.name).getOrElse("unknown")
    val version =
      browser.map(r => jFirstVersion(s, r.versions)).getOrElse("")
    val engine = engines.find(r => jFind(r.detect, s))
    val osRule = oses.find(r => jFind(r.detect, s))
    val osVersion = osRule.map { r =>
      val v = jFirstVersion(s, r.versions)
      r.tx match {
        case NoTx => v
        case UnderscoreDot => v.replace('_', '.')
        case WinNt => winNtMap.toMap.getOrElse(v, v)
      }
    }.getOrElse("")
    val device = devices.find(r => jFind(r.detect, s))
    val lower = s.toLowerCase
    UaResult(
      name = name,
      version = version,
      major = if (version.isEmpty) "" else version.split("\\.").head,
      engineName = engine.map(_.name).getOrElse("unknown"),
      engineVersion =
        engine.map(r => jFirstVersion(s, r.versions)).getOrElse(""),
      osName = osRule.map(_.name).getOrElse("unknown"),
      osVersion = osVersion,
      deviceType = device.map(_.dtype).getOrElse("desktop"),
      deviceVendor = device.map(_.vendor).getOrElse(""),
      deviceModel = device.map(_.model match {
        case Left(l) => l
        case Right(p) => jExtract(p, s)
      }).getOrElse(""),
      cpuArchitecture =
        cpus.find { case (_, p) => jFind(p, s) }.map(_._1).getOrElse(""),
      bot = botKeywords.exists(lower.contains))
  }
}

package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions.expressions._

/** Registers the graft native expressions with the SQL function registry
  * via the standard `SparkSessionExtensions` mechanism, so the guarded
  * SQL surface (and any `spark.sql(...)` user) can call them directly:
  *
  * {{{
  *   SELECT simhash64(words), minhash_sig(word_shingles(text, 3), 128)
  *   FROM documents
  * }}}
  *
  * Wire-up paths, both standard:
  *  - [[GraftSession.builder]] applies it to every session it builds;
  *  - `--conf spark.sql.extensions=graft.GraftExtensions` does the same
  *    for sessions built elsewhere (the class is a plain
  *    `SparkSessionExtensions => Unit` with a no-arg constructor, which
  *    is exactly what that conf expects).
  *
  * Only expressions whose parameters are SQL-expressible are registered:
  * the codebook/hyperplane kernels ([[PqEncode]], [[HyperplaneBuckets]])
  * take driver-side model objects and stay Column-API-only. Integer
  * parameters (shingle n, signature width) must be foldable literals —
  * they shape the expression itself, so a column there is rejected at
  * analysis, not at runtime.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.registerAll(ext)
}

object GraftExtensions {

  private def intLit(args: Seq[Expression], pos: Int, fn: String): Int =
    args(pos) match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${pos + 1} must be an INT literal " +
          s"(it fixes the expression's shape), got: $other")
    }

  private def arity(fn: String, args: Seq[Expression], n: Int): Seq[Expression] = {
    if (args.length != n)
      throw new IllegalArgumentException(
        s"$fn takes $n argument(s), got ${args.length}")
    args
  }

  private type FnRow = (String, Class[_], String, Seq[Expression] => Expression)

  /** (name, usage, builder) for every SQL-expressible native expression. */
  private val nativeFunctions: Seq[FnRow] = Seq(
    ("word_shingles", classOf[WordShingles],
      "word_shingles(text, n) - distinct lowercase word n-gram shingles",
      args => { arity("word_shingles", args, 2)
        WordShingles(args.head, intLit(args, 1, "word_shingles")) }),
    ("minhash_sig", classOf[MinHashSig],
      "minhash_sig(shingles, k) - k-wide MinHash signature of a string array",
      args => { arity("minhash_sig", args, 2)
        MinHashSig(args.head, intLit(args, 1, "minhash_sig")) }),
    ("simhash64", classOf[SimHash64],
      "simhash64(words) - 64-bit SimHash fingerprint of a string array",
      args => SimHash64(arity("simhash64", args, 1).head)),
    ("cosine_sim", classOf[CosineSimilarity],
      "cosine_sim(a, b) - cosine similarity of two float arrays",
      args => { arity("cosine_sim", args, 2)
        CosineSimilarity(args.head, args(1)) }),
    ("dot_product", classOf[DotProduct],
      "dot_product(a, b) - dot product of two float arrays",
      args => { arity("dot_product", args, 2)
        DotProduct(args.head, args(1)) }))

  private def functions: Seq[FnRow] = nativeFunctions ++ columnFunctions

  /** Column-composition functions (scalar library, no driver state):
    * registered by converting the composed Catalyst tree back to an
    * Expression via the shim — same codegen'd plan as the Column API,
    * still zero UDFs. */
  private def col1(fn: String, args: Seq[Expression])(
      f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Expression = {
    arity(fn, args, 1)
    org.apache.spark.sql.graftshim.expressionTree(
      f(org.apache.spark.sql.graftshim.column(args.head)))
  }

  private def columnFunctions: Seq[FnRow] = {
    import graft.functions.TextFunctions
    val cls = TextFunctions.getClass
    Seq(
      ("lang_id", cls,
        "lang_id(text) - stopword-profile language code (de/en/es/fr/zh/und)",
        args => col1("lang_id", args)(TextFunctions.langId)),
      ("token_count", cls,
        "token_count(text) - whitespace token count",
        args => col1("token_count", args)(TextFunctions.tokenCountWs)),
      ("doc_fingerprint", cls,
        "doc_fingerprint(text) - md5 of the sorted distinct word set",
        args => col1("doc_fingerprint", args)(TextFunctions.fingerprint)),
      ("redact_pii", cls,
        "redact_pii(text) - email/card(Luhn)/IP/SSN/phone redaction chain",
        args => col1("redact_pii", args)(TextFunctions.redactPiiAll)),
      ("luhn_valid", cls,
        "luhn_valid(str) - Luhn checksum over the digits of str (13-19 digits)",
        args => col1("luhn_valid", args)(TextFunctions.luhnValid)),
      ("html_to_text", cls,
        "html_to_text(html) - strip tags/script/style, decode entities, collapse ws",
        args => col1("html_to_text", args)(TextFunctions.htmlToText)),
      ("quality_score", cls,
        "quality_score(text) - heuristic [0,1] text quality",
        args => col1("quality_score", args)(TextFunctions.qualityScore)),
      ("canonical_url", graft.operators.UrlFilter.getClass,
        "canonical_url(url) - lowercase scheme+host, strip fragment/default port/tracking params/trailing slash",
        args => col1("canonical_url", args)(graft.operators.UrlFilter.canonicalUrl)),
      ("url_host", graft.operators.UrlFilter.getClass,
        "url_host(url) - hostname of an absolute URL (port stripped)",
        args => col1("url_host", args)(graft.operators.UrlFilter.host)),
      ("nfc_normalize", classOf[UnicodeNormalize],
        "nfc_normalize(text) - Unicode NFC composition",
        args => col1("nfc_normalize", args)(TextFunctions.nfc)),
      ("strip_accents", classOf[UnicodeNormalize],
        "strip_accents(text) - decompose, drop nonspacing marks, recompose",
        args => col1("strip_accents", args)(TextFunctions.stripAccents)))
  }

  def registerAll(ext: SparkSessionExtensions): Unit = {
    functions.foreach { case (name, cls, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(cls.getCanonicalName, null, name, usage,
          "", "", "", "", "", "", "built-in"),
        builder))
    }
    // optimizer rules (operator-optimization fixpoint batch)
    ext.injectOptimizerRule(_ => graft.plans.EditDistancePrefilter)
    // MV aggregate navigation — no-op until an MV is registered in
    // graft.plans.MvRewrite.MvCatalog
    ext.injectOptimizerRule(_ => graft.plans.MvRewrite)
  }
}

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

  /** (name, usage, builder) for every SQL-expressible native expression. */
  private val functions: Seq[(String, Class[_], String, Seq[Expression] => Expression)] = Seq(
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

  def registerAll(ext: SparkSessionExtensions): Unit =
    functions.foreach { case (name, cls, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(cls.getCanonicalName, null, name, usage,
          "", "", "", "", "", "", "built-in"),
        builder))
    }
}

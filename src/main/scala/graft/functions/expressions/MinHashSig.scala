package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types._

/** MinHash signature over a shingle set as a native Catalyst expression.
  *
  * `numHashes` minima of a 2-universal hash family (Carter-Wegman:
  * h_i(x) = a_i * fnv64(x) + b_i, odd a_i from a fixed seeded PRNG).
  * Each shingle's 64-bit base hash is computed ONCE from its UTF8 bytes;
  * the family values are derived with two arithmetic ops — versus the
  * naive `transform(sequence(...), i -> array_min(transform(shingles,
  * s -> hash(s, i))))` composition, which runs INTERPRETED (higher-order
  * functions don't codegen) and re-hashes every string numHashes times
  * (~450 s for 5000 docs x 128 hashes; this expression: < 1 s).
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes() = {
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig needs array<string>, got $other")
    }
  }

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.MinHashSig.compute($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

object MinHashSig {

  private val MaxHashes = 512

  /** Fixed Carter-Wegman coefficients (seeded, same on every JVM). */
  private val (coefA, coefB): (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(0x5eed5eedL)
    val a = Array.fill(MaxHashes)(rnd.nextLong() | 1L) // odd
    val b = Array.fill(MaxHashes)(rnd.nextLong())
    (a, b)
  }

  private def fnv64(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  def compute(shingles: ArrayData, numHashes: Int): ArrayData = {
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val h = fnv64(shingles.getUTF8String(i).getBytes)
        var k = 0
        while (k < numHashes) {
          val v = coefA(k) * h + coefB(k)
          if (v < mins(k)) mins(k) = v
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  def minhash_sig(shingles: Column, numHashes: Int): Column = {
    require(numHashes <= MaxHashes, s"numHashes <= $MaxHashes")
    graftshim.column(MinHashSig(graftshim.expression(shingles), numHashes))
  }
}

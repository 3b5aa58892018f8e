package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types._

/** All hyperplane-LSH bucket keys of a vector in ONE pass — native
  * Catalyst expression for the ANN/embedding-dedup path.
  *
  * Output: `numTables` sign-bucket ints; table t's key packs the sign
  * bits of projections onto planes [t*numBits, (t+1)*numBits). The
  * equivalent built-in composition (`aggregate(zip_with(...))` per bit
  * per table) is interpreted and allocates per element; this kernel is
  * a tight dims x planes loop over primitive arrays.
  *
  * Planes ship with the expression via `ctx.addReferenceObj` (plan-level
  * constant, no broadcast variable needed).
  */
case class HyperplaneBuckets(child: Expression, planes: Array[Array[Double]],
                             numBits: Int, numTables: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes() = {
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hyperplane_buckets needs array<float>, got $other")
    }
  }

  override def nullSafeEval(input: Any): Any =
    HyperplaneBuckets.compute(input.asInstanceOf[ArrayData], planes,
      numBits, numTables)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.HyperplaneBuckets.compute($c, $planesRef, $numBits, $numTables)")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)

  override def prettyName: String = "hyperplane_buckets"
}

object HyperplaneBuckets {

  def compute(vec: ArrayData, planes: Array[Array[Double]],
              numBits: Int, numTables: Int): ArrayData = {
    val xs = vec.toFloatArray()
    val out = new Array[Any](numTables)
    var t = 0
    while (t < numTables) {
      var bucket = 0
      var i = 0
      while (i < numBits) {
        val plane = planes(t * numBits + i)
        val n = math.min(xs.length, plane.length)
        var acc = 0.0
        var d = 0
        while (d < n) { acc += xs(d).toDouble * plane(d); d += 1 }
        if (acc >= 0) bucket |= (1 << i)
        i += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  def hyperplane_buckets(vec: Column, planes: Array[Array[Double]],
                         numBits: Int, numTables: Int): Column =
    graftshim.column(HyperplaneBuckets(graftshim.expression(vec), planes,
      numBits, numTables))
}

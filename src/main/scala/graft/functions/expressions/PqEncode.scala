package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types._

/** Product-quantization encoder as a native Catalyst expression: the
  * whole m-subspace argmin in ONE kernel call over primitive arrays.
  *
  * The pure-Column alternative (per subspace, an `array()` of k
  * squared-distance expressions each built from subDim `element_at`
  * nodes) creates an m*k*subDim-node tree — ~1000 nodes for the default
  * PQ shape — whose analysis/codegen dominates wall time and whose
  * generated code re-reads the slice per element. Here the codebook
  * rides along as a referenced object and the loop is three tight
  * `while`es (same shape as [[MinHashSig]]). Tie-break: strict `<`
  * keeps the lowest-index centroid, matching the driver-side trainer.
  */
case class PqEncode(child: Expression, centroids: Array[Array[Array[Double]]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes() = {
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_encode needs array<float>, got $other")
    }
  }

  override def nullSafeEval(input: Any): Any =
    PqEncode.compute(input.asInstanceOf[ArrayData], centroids)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCentroids", centroids, "double[][][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.PqEncode.compute($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)

  override def prettyName: String = "pq_encode"
}

object PqEncode {

  def compute(vec: ArrayData, cents: Array[Array[Array[Double]]]): ArrayData = {
    val xs = vec.toFloatArray()
    val m = cents.length
    val out = new Array[Int](m)
    var sub = 0
    while (sub < m) {
      val ck = cents(sub)
      val subDim = ck(0).length
      val off = sub * subDim
      var best = 0
      var bestD = Double.MaxValue
      var k = 0
      while (k < ck.length) {
        val c = ck(k)
        var d = 0.0
        var j = 0
        while (j < subDim && off + j < xs.length) {
          val t = xs(off + j).toDouble - c(j)
          d += t * t
          j += 1
        }
        if (d < bestD) { bestD = d; best = k }
        k += 1
      }
      out(sub) = best
      sub += 1
    }
    new GenericArrayData(out)
  }

  def pq_encode(vec: Column, centroids: Array[Array[Array[Double]]]): Column =
    graftshim.column(PqEncode(graftshim.expression(vec), centroids))
}

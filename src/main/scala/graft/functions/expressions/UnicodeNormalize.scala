package graft.functions.expressions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization — the text-preprocessing step a multilingual
  * corpus runs BEFORE tokenization/dedup so visually-identical strings
  * hash identically ('é' composed vs 'e'+U+0301 are different byte
  * sequences until normalized; fullwidth/ligature folding needs NFKC).
  * Spark ships no normalization function; this is a native codegen'd
  * expression over `java.text.Normalizer` (ICU-free, in the JDK).
  *
  * `form`: "NFC" | "NFD" | "NFKC" | "NFKD" | "STRIP_ACCENTS"
  * (decompose, drop nonspacing marks, recompose — DuckDB
  * `strip_accents` parity, proven by the `td_unicode_norm` oracle).
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  private val formId = UnicodeNormalize.formIds.getOrElse(
    form.toUpperCase, -1)

  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (formId < 0)
      TypeCheckResult.TypeCheckFailure(
        s"unknown normalization form '$form' " +
          s"(expected ${UnicodeNormalize.formIds.keys.mkString("/")})")
    else child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"unicode_normalize needs string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    UnicodeNormalize.compute(input.asInstanceOf[UTF8String], formId)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.UnicodeNormalize.compute($c, $formId)")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)

  override def prettyName: String = "unicode_normalize"
}

object UnicodeNormalize {

  private[expressions] val formIds: Map[String, Int] = Map(
    "NFC" -> 0, "NFD" -> 1, "NFKC" -> 2, "NFKD" -> 3,
    "STRIP_ACCENTS" -> 4)

  /** Static so codegen emits a direct call. */
  def compute(s: UTF8String, formId: Int): UTF8String = {
    val str = s.toString
    val out = formId match {
      case 0 => Normalizer.normalize(str, Normalizer.Form.NFC)
      case 1 => Normalizer.normalize(str, Normalizer.Form.NFD)
      case 2 => Normalizer.normalize(str, Normalizer.Form.NFKC)
      case 3 => Normalizer.normalize(str, Normalizer.Form.NFKD)
      case _ =>
        val nfd = Normalizer.normalize(str, Normalizer.Form.NFD)
        val sb = new java.lang.StringBuilder(nfd.length)
        var i = 0
        while (i < nfd.length) {
          val c = nfd.charAt(i)
          if (Character.getType(c) != Character.NON_SPACING_MARK)
            sb.append(c)
          i += 1
        }
        Normalizer.normalize(sb.toString, Normalizer.Form.NFC)
    }
    UTF8String.fromString(out)
  }

  def unicode_normalize(c: Column, form: String): Column =
    graftshim.column(UnicodeNormalize(graftshim.expression(c), form))
}

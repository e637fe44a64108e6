package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a codegen'd Catalyst
  * expression — Spark ships no normalization builtin, and a text
  * pipeline that hashes, dedups, or joins on raw strings treats
  * composed and decomposed spellings of the SAME text ("é" as U+00E9
  * vs e+U+0301) as different documents. Normalize first; every
  * downstream fingerprint/join sees one canonical spelling.
  *
  * Codegen: `doGenCode` emits a static-kernel call (preference (b) of
  * the build rules — scalar function, so an Expression, not an
  * operator). The kernel fast-paths `Normalizer.isNormalized` (true
  * for all-ASCII, the overwhelming hot path — no allocation) before
  * normalizing.
  */
case class UnicodeNormalizeExpr(child: Expression, form: String)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = {
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"normalize requires string, got ${child.dataType.simpleString}")
    else if (!UnicodeNormalizeExpr.Forms.contains(form))
      TypeCheckResult.TypeCheckFailure(
        s"form must be one of ${UnicodeNormalizeExpr.Forms.keys.mkString("/")}, got '$form'")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def nullSafeEval(input: Any): Any =
    UnicodeNormalizeExpr.normalize(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"""graft.functions.UnicodeNormalizeExpr.normalize($c, "$form")""")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalizeExpr =
    copy(child = newChild)
}

object UnicodeNormalizeExpr {
  private[functions] val Forms: Map[String, Normalizer.Form] = Map(
    "NFC" -> Normalizer.Form.NFC, "NFD" -> Normalizer.Form.NFD,
    "NFKC" -> Normalizer.Form.NFKC, "NFKD" -> Normalizer.Form.NFKD)

  /** Static kernel shared by interpreted eval and generated code. */
  def normalize(s: UTF8String, form: String): UTF8String = {
    val f = Forms(form)
    val str = s.toString
    if (Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(Normalizer.normalize(str, f))
  }

  /** Column API: unicode-normalize a string column. */
  def unicodeNormalize(text: Column, form: String = "NFC"): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      UnicodeNormalizeExpr(GraftColumnBridge.expression(text), form))
  }
}

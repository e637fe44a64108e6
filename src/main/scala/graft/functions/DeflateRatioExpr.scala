package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deflate compression ratio of a string (compressed bytes / raw
  * bytes) — the classic cheap quality signal for pre-training
  * curation: machine-generated repetition and boilerplate compress
  * far below natural prose, keyboard-mash and encoded binary compress
  * above it; filtering the tails removes both. Empty input yields
  * null.
  *
  * A codegen'd Catalyst expression calling a static kernel (one
  * Deflater per call — Deflater is not thread-safe and rows stream
  * through many codegen threads; `setInput`/`finish`/`end` keeps the
  * native memory bounded). Deterministic for a given JVM's zlib; NOT
  * cross-engine portable, hence no SQL oracle — the ORDERING contract
  * (repetitive < prose < random) is spec-pinned instead.
  */
case class DeflateRatioExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"deflate_ratio requires string, got ${child.dataType.simpleString}")

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val r = DeflateRatioExpr.ratio(input.asInstanceOf[UTF8String])
    if (r.isNaN) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("deflateRatio")
      s"""
        double $r = graft.functions.DeflateRatioExpr.ratio($c);
        if (Double.isNaN($r)) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = $r;
        }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): DeflateRatioExpr =
    copy(child = newChild)
}

object DeflateRatioExpr {
  /** Static kernel: deflate-compressed size over raw size; NaN marks
    * empty input (mapped to SQL null by the expression). */
  def ratio(s: UTF8String): Double = {
    val raw = s.getBytes
    if (raw.length == 0) return Double.NaN
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION)
    try {
      d.setInput(raw)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total.toDouble / raw.length
    } finally d.end()
  }

  /** Column API: deflate compression ratio of a text column. */
  def deflateRatio(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      DeflateRatioExpr(GraftColumnBridge.expression(text)))
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{lower, regexp_replace, trim}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** 64-bit SimHash of a token array.
  *
  * A custom Catalyst expression (preference (b) of the build rules): the
  * per-bit voting loop is a tight scalar kernel that would otherwise need
  * 64 nested lambda `aggregate` calls — unreadable and codegen-hostile.
  * Tokens are hashed with two seeded Murmur3_x86_32 runs combined into 64
  * bits (stable across JVMs); each token votes ±1 per bit; the sign
  * vector is the document's simhash. Near-duplicate documents differ in
  * few bits (small Hamming distance).
  *
  * Codegen: real `doGenCode` emitting a call into the static kernel —
  * stays inside whole-stage codegen instead of falling back to
  * interpreted eval.
  */
case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() = {
    if (child.dataType.isInstanceOf[ArrayType] &&
        child.dataType.asInstanceOf[ArrayType].elementType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash64 requires array<string>, got ${child.dataType.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    SimHash64Expr.simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SimHash64Expr.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

object SimHash64Expr {
  /** Static kernel shared by interpreted eval and generated code. */
  def simhash(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val s: UTF8String = tokens.getUTF8String(i)
        val bytes = s.getBytes
        val h1 = Murmur3_x86_32.hashUnsafeBytes(
          bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, bytes.length, 42)
        val h2 = Murmur3_x86_32.hashUnsafeBytes(
          bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, bytes.length, 811)
        val h64 = (h1.toLong << 32) | (h2.toLong & 0xffffffffL)
        var b = 0
        while (b < 64) {
          if (((h64 >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Column API: simhash64 of a text column (whitespace-tokenized,
    * case/whitespace-normalized). */
  def simhash64(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    import org.apache.spark.sql.functions.split
    val tokens = split(regexp_replace(lower(trim(text)), "\\s+", " "), " ")
    GraftColumnBridge.column(SimHash64Expr(GraftColumnBridge.expression(tokens)))
  }
}

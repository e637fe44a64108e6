package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Dot product of two double arrays as a native Catalyst expression.
  *
  * The vector hot path (cosine top-k, near-dup, LSH, IVF) evaluates one
  * dot per candidate pair; the higher-order `aggregate(zip_with(...))`
  * formulation allocates a zipped intermediate array per pair and runs
  * lambda plumbing per element. This expression is a tight fused
  * multiply-add loop over the two ArrayData buffers — same
  * left-to-right IEEE addition order, so results are bit-identical to
  * the fold (the DuckDB oracles keep matching).
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"dot_product requires two array<double>, got " +
          s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
    }

  override def nullable: Boolean = true

  /** Mismatched lengths and null elements yield null — the same result
    * as the `aggregate(zip_with(...))` fold this expression replaces
    * (zip_with pads with null, and null elements poison the sum); a
    * silent truncated/garbage partial sum would mask corrupt or ragged
    * vectors. */
  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (x.numElements() != y.numElements() || DotProductExpr.anyNull(x, y)) null
    else DotProductExpr.dot(x, y)
  }

  // Codegen note: no generated line may BEGIN with '|' — Spark's Block
  // plumbing treats a leading pipe as a stripMargin margin char and eats
  // it, producing uncompilable Java (observed: the '||' of a wrapped
  // condition vanished and every dot-product stage silently fell back
  // to interpreted eval).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |if ($a.numElements() != $b.numElements() ||
         |    graft.functions.DotProductExpr.anyNull($a, $b)) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.DotProductExpr.dot($a, $b);
         |}
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

object DotProductExpr {
  /** Null-element scan kept separate from the arithmetic kernel so the
    * non-null fast path stays a primitive (unboxed) loop. isNullAt on
    * UnsafeArrayData is a bitset probe — cheap relative to the FMA. */
  def anyNull(a: ArrayData, b: ArrayData): Boolean = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return true
      i += 1
    }
    false
  }

  /** Static kernel shared by interpreted eval and generated code.
    * Sequential left-to-right accumulation — the same addition order as
    * an `aggregate` fold. Callers must have screened nulls via
    * [[anyNull]]. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0d
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  /** Column API over double-castable array columns. */
  def dot_product(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProductExpr(
      GraftColumnBridge.expression(a.cast("array<double>")),
      GraftColumnBridge.expression(b.cast("array<double>"))))
}

package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketches, Union}
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, LongType}

/** Theta sketches (Datasketches) as first-class engine values — the
  * distinct-count sketch family that, unlike HLL, supports SET
  * ALGEBRA: intersections ("users who did A AND B") and differences
  * ("A but never B") over sketches built independently, possibly on
  * different days by different jobs. HLL unions only; the audience-
  * overlap questions a warehouse actually asks need theta.
  *
  * Exactness contract: a theta sketch is EXACT below its nominal
  * entries (default 4096) and a ±~2% estimate beyond — so small/medium
  * cardinalities hash-match an exact oracle while corpus-scale ones
  * degrade gracefully instead of failing. Sketch bytes are compact,
  * storable, and re-mergeable (the sketch-table pattern).
  */
object ThetaSketch {

  /** Aggregate a LONG key column into a compact theta sketch. */
  def thetaAgg(e: Column): Column =
    GraftColumnBridge.column(
      ThetaSketchAgg(GraftColumnBridge.expression(e.cast("long")))
        .toAggregateExpression())

  def thetaEstimate(sketch: Column): Column =
    GraftColumnBridge.column(
      ThetaEstimateExpr(GraftColumnBridge.expression(sketch)))

  def thetaIntersect(a: Column, b: Column): Column =
    GraftColumnBridge.column(ThetaSetOpExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b),
      intersect = true))

  /** A \ B — keys in `a`'s sketch and not in `b`'s. */
  def thetaDiff(a: Column, b: Column): Column =
    GraftColumnBridge.column(ThetaSetOpExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b),
      intersect = false))

  // ---- static kernels shared by interpreted eval and generated code

  def estimate(bytes: Array[Byte]): Double =
    Sketches.wrapCompactSketch(Memory.wrap(bytes)).getEstimate

  def setOp(a: Array[Byte], b: Array[Byte],
            intersect: Boolean): Array[Byte] = {
    val sa = Sketches.wrapCompactSketch(Memory.wrap(a))
    val sb = Sketches.wrapCompactSketch(Memory.wrap(b))
    if (intersect) {
      val op = SetOperation.builder().buildIntersection()
      op.intersect(sa); op.intersect(sb)
      op.getResult.toByteArray
    } else {
      val op = SetOperation.builder().buildANotB()
      op.aNotB(sa, sb).toByteArray
    }
  }

  def unionOf(bytes: Seq[Array[Byte]]): Union = {
    val u = SetOperation.builder().buildUnion()
    bytes.foreach(b =>
      u.union(Sketches.wrapCompactSketch(Memory.wrap(b))))
    u
  }
}

/** Builds a theta sketch over a long key column; result is the compact
  * sketch bytes (BinaryType). Nulls skipped. Buffer is a theta Union —
  * the natural mergeable form. */
case class ThetaSketchAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"theta sketch input must be long, got ${child.dataType.simpleString}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Union =
    SetOperation.builder().buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Union, other: Union): Union = {
    buf.union(other.getResult)
    buf
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArray

  override def serialize(buf: Union): Array[Byte] =
    buf.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union =
    ThetaSketch.unionOf(Seq(bytes))

  override def withNewMutableAggBufferOffset(offset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): ThetaSketchAgg =
    copy(child = newChild)

  override def prettyName: String = "theta_sketch"
}

/** `theta_estimate(sketch)` → double (exact below nominal entries). */
case class ThetaEstimateExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"theta_estimate needs binary, got ${child.dataType.simpleString}")

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(b: Any): Any =
    ThetaSketch.estimate(b.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b =>
      s"graft.functions.ThetaSketch.estimate($b)")

  override protected def withNewChildInternal(newChild: Expression): ThetaEstimateExpr =
    copy(child = newChild)
}

/** Theta set algebra over two compact sketches → compact result bytes.
  * `intersect = true` ⇒ A ∩ B, else A \ B. */
case class ThetaSetOpExpr(left: Expression, right: Expression,
                          intersect: Boolean)
  extends BinaryExpression with BinaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"theta set op needs (binary, binary), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = BinaryType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ThetaSketch.setOp(a.asInstanceOf[Array[Byte]],
      b.asInstanceOf[Array[Byte]], intersect)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ThetaSketch.setOp($a, $b, $intersect)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaSetOpExpr =
    copy(left = newLeft, right = newRight)
}

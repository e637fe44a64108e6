package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** Mergeable quantile sketch (KLL-family, deterministic compaction).
  *
  * The piece Spark's built-ins can't express (SURVEY.md round-5
  * candidate): `percentile_approx` answers a quantile question inside
  * ONE aggregation pass, but its state is not a first-class value — it
  * cannot be stored in a table, merged with last week's state, or
  * rolled up across snapshots. At 100 TB the pattern that matters is
  * the SKETCH TABLE: aggregate each day/partition once into a tiny
  * binary sketch row, persist it, and answer any later quantile
  * question (day, month, arbitrary slice union) by merging sketches —
  * never rescanning the raw data. [[QuantileSketchAgg]] emits that
  * binary sketch, [[QuantileSketchMergeAgg]] folds stored sketches
  * together, and [[SketchQuantilesExpr]] (codegen'd) evaluates
  * probabilities against one.
  *
  * Sketch structure: levels of value buffers, level `i` items carrying
  * weight 2^i. Updates append to level 0; a full level (capacity `k`)
  * is sorted and every other item promoted to the level above —
  * deterministic alternating selection instead of KLL's coin flip, so
  * the same input in the same order yields bit-identical sketches (the
  * property tests pin error bounds, which hold for either selection
  * rule). While the data fits in level 0 (n <= k) the sketch is EXACT
  * and layout-independent; past that, rank error grows as
  * O(log(n/k)/k) — with the default k=512, well under 1% observed at
  * n=10^5 (QuantileSketchSpec pins an empirical 2% ceiling).
  *
  * Memory: <= k doubles per level, ~k*log2(n/k) total per group —
  * ~40 KB at k=512 against a billion-row group.
  */
final class QSketch(val k: Int) {
  require(k >= 8, s"sketch capacity must be >= 8, got $k")

  private[functions] val levels = ArrayBuffer(new ArrayBuffer[Double](16))
  // per-level alternating selector: next compaction keeps odd positions?
  private[functions] val keepOdd = ArrayBuffer(false)
  private[functions] var count: Long = 0L

  def update(v: Double): Unit = {
    levels(0) += v
    count += 1
    if (levels(0).length >= k) compact(0)
  }

  /** Sort level i, promote every other survivor to level i+1. */
  private def compact(i: Int): Unit = {
    val buf = levels(i)
    val arr = buf.toArray
    java.util.Arrays.sort(arr)
    if (i + 1 >= levels.length) { levels += new ArrayBuffer[Double](16); keepOdd += false }
    val start = if (keepOdd(i)) 1 else 0
    keepOdd(i) = !keepOdd(i)
    val up = levels(i + 1)
    var j = start
    while (j < arr.length) { up += arr(j); j += 2 }
    buf.clear()
    if (up.length >= k) compact(i + 1)
  }

  def mergeWith(o: QSketch): Unit = {
    var i = 0
    while (i < o.levels.length) {
      if (i >= levels.length) { levels += new ArrayBuffer[Double](16); keepOdd += false }
      levels(i) ++= o.levels(i)
      i += 1
    }
    count += o.count
    i = 0
    while (i < levels.length) {
      if (levels(i).length >= k) compact(i)
      i += 1
    }
  }

  /** Discrete quantiles: for each p, the smallest sketched value whose
    * cumulative weight reaches ceil(p*n) (the percentile_disc rule —
    * exact while uncompacted). Null element for an empty sketch never
    * arises: callers receive null for the whole array instead. */
  def quantiles(ps: Array[Double]): Array[Double] = {
    var m = 0
    var i = 0
    while (i < levels.length) { m += levels(i).length; i += 1 }
    val values = new Array[Double](m)
    val weights = new Array[Long](m)
    var n = 0
    i = 0
    while (i < levels.length) {
      val w = 1L << i
      val buf = levels(i)
      var j = 0
      while (j < buf.length) { values(n) = buf(j); weights(n) = w; n += 1; j += 1 }
      i += 1
    }
    // indirect sort by value
    val idx = Array.range(0, m).sortBy(values(_))
    ps.map { p =>
      val target = math.max(1L, math.ceil(p * count).toLong)
      var cum = 0L
      var r = 0
      var out = values(idx(m - 1))
      var found = false
      while (r < m && !found) {
        cum += weights(idx(r))
        if (cum >= target) { out = values(idx(r)); found = true }
        r += 1
      }
      out
    }
  }

  def serialize: Array[Byte] = {
    var doubles = 0
    levels.foreach(doubles += _.length)
    val bb = ByteBuffer.allocate(4 + 8 + 4 + levels.length * 5 + doubles * 8)
    bb.putInt(k).putLong(count).putInt(levels.length)
    var i = 0
    while (i < levels.length) {
      bb.put(if (keepOdd(i)) 1.toByte else 0.toByte)
      bb.putInt(levels(i).length)
      levels(i).foreach(bb.putDouble)
      i += 1
    }
    bb.array()
  }
}

object QSketch {
  val DefaultK = 512

  def deserialize(bytes: Array[Byte]): QSketch = {
    val bb = ByteBuffer.wrap(bytes)
    val s = new QSketch(bb.getInt)
    s.count = bb.getLong
    val nLevels = bb.getInt
    var i = 0
    while (i < nLevels) {
      if (i >= s.levels.length) { s.levels += new ArrayBuffer[Double](16); s.keepOdd += false }
      s.keepOdd(i) = bb.get() == 1
      val n = bb.getInt
      var j = 0
      while (j < n) { s.levels(i) += bb.getDouble; j += 1 }
      i += 1
    }
    s
  }

  /** Static entry point for the codegen'd quantile expression. Returns
    * null for an empty sketch (no rows reached the aggregate). */
  def evalQuantiles(bytes: Array[Byte], ps: ArrayData): ArrayData = {
    val s = deserialize(bytes)
    if (s.count == 0L) null
    else new GenericArrayData(s.quantiles(ps.toDoubleArray()))
  }

  /** Aggregate a double column into a binary sketch. */
  def sketchAgg(e: Column, k: Int = DefaultK): Column =
    GraftColumnBridge.column(
      QuantileSketchAgg(GraftColumnBridge.expression(e.cast("double")), k)
        .toAggregateExpression())

  /** Merge a column of stored binary sketches into one. */
  def sketchMerge(e: Column, k: Int = DefaultK): Column =
    GraftColumnBridge.column(
      QuantileSketchMergeAgg(GraftColumnBridge.expression(e), k)
        .toAggregateExpression())

  /** Evaluate probabilities against a binary sketch → array<double>. */
  def sketchQuantiles(sketch: Column, ps: Seq[Double]): Column = {
    import org.apache.spark.sql.functions.{array, lit}
    GraftColumnBridge.column(SketchQuantilesExpr(
      GraftColumnBridge.expression(sketch),
      GraftColumnBridge.expression(array(ps.map(lit): _*))))
  }
}

/** Builds a [[QSketch]] over a double column; result is the serialized
  * sketch (BinaryType) — a first-class storable value, unlike
  * percentile_approx's internal buffer. Nulls skipped. */
case class QuantileSketchAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QSketch] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"quantile sketch input must be double, got ${child.dataType.simpleString}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): QSketch = new QSketch(k)

  override def update(buf: QSketch, input: InternalRow): QSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: QSketch, other: QSketch): QSketch = { buf.mergeWith(other); buf }

  override def eval(buf: QSketch): Any = buf.serialize

  override def serialize(buf: QSketch): Array[Byte] = buf.serialize
  override def deserialize(bytes: Array[Byte]): QSketch = QSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): QuantileSketchAgg =
    copy(child = newChild)

  override def prettyName: String = "quantile_sketch"
}

/** Folds a column of stored binary sketches (rows of a sketch table)
  * into one combined sketch — the rollup side of the sketch-table
  * pattern. Nulls skipped; capacities may differ (the merge result
  * keeps this aggregate's k). */
case class QuantileSketchMergeAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QSketch] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sketch merge input must be binary, got ${child.dataType.simpleString}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): QSketch = new QSketch(k)

  override def update(buf: QSketch, input: InternalRow): QSketch = {
    val v = child.eval(input)
    if (v != null) buf.mergeWith(QSketch.deserialize(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(buf: QSketch, other: QSketch): QSketch = { buf.mergeWith(other); buf }

  override def eval(buf: QSketch): Any = buf.serialize

  override def serialize(buf: QSketch): Array[Byte] = buf.serialize
  override def deserialize(bytes: Array[Byte]): QSketch = QSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): QuantileSketchMergeAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): QuantileSketchMergeAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): QuantileSketchMergeAgg =
    copy(child = newChild)

  override def prettyName: String = "quantile_sketch_merge"
}

/** `sketch_quantiles(sketch, array(p...))` → array<double>, one value
  * per probability; null for a null/empty sketch. Codegen'd through the
  * Scala static forwarder (runs once per GROUP, but staying inside
  * whole-stage codegen keeps the surrounding projection fused). */
case class SketchQuantilesExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType &&
        right.dataType.isInstanceOf[ArrayType] &&
        right.dataType.asInstanceOf[ArrayType].elementType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expected (binary, array<double>), got (${left.dataType.simpleString}, " +
        s"${right.dataType.simpleString})")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(sketch: Any, ps: Any): Any =
    QSketch.evalQuantiles(sketch.asInstanceOf[Array[Byte]], ps.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, p) => {
      s"""
         |${ev.value} = graft.functions.QSketch.evalQuantiles($s, $p);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SketchQuantilesExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sketch_quantiles"
}

package graft.functions

import java.util.{PriorityQueue => JPriorityQueue}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, RowOrdering, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType}

/** Bounded per-group top-k as a custom Catalyst aggregate: returns the
  * k smallest (or largest) values of any orderable input — scalars or
  * ordering structs — as a sorted array.
  *
  * Why an aggregate and not a window: the window form
  * (`row_number() OVER (PARTITION BY g ORDER BY v) <= k`) shuffles and
  * SORTS every row of every group; this aggregate carries at most k
  * values per group per partition, combines map-side like any partial
  * aggregate, and never materializes a group's full row set — the
  * physical shape that survives a group with a billion rows when only
  * k of them matter. Spark exposes no public bounded-top-k aggregate
  * (`collect_list` + `slice` materializes the unbounded list first),
  * which is what justifies dropping to a custom
  * `TypedImperativeAggregate` here.
  *
  * Null inputs are skipped (`collect_list` semantics); fewer than k
  * survivors yield a shorter array; zero yield an empty one.
  */
case class BoundedTopKAgg(
    child: Expression,
    k: Int,
    smallest: Boolean,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[JPriorityQueue[Any]]
  with UnaryLike[Expression] {

  require(k > 0, s"top-k needs k > 0, got $k")

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)

  /** Heap head = the value to EVICT: the current worst of the kept k
    * (largest kept when keeping smallest, and vice versa). */
  @transient private lazy val evictionOrder: java.util.Comparator[Any] =
    if (smallest) ordering.reverse else ordering

  override def checkInputDataTypes(): TypeCheckResult =
    if (RowOrdering.isOrderable(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"top-k input must be orderable, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): JPriorityQueue[Any] =
    new JPriorityQueue[Any](k + 1, evictionOrder)

  override def update(buf: JPriorityQueue[Any], input: InternalRow): JPriorityQueue[Any] = {
    val v = child.eval(input)
    if (v != null) {
      // only copy (values may live in reused UnsafeRow buffers) when
      // the candidate survives: either the heap is short, or it beats
      // the current eviction head
      if (buf.size < k) buf.add(InternalRow.copyValue(v))
      else if (evictionOrder.compare(v, buf.peek()) > 0) {
        buf.poll()
        buf.add(InternalRow.copyValue(v))
      }
    }
    buf
  }

  override def merge(buf: JPriorityQueue[Any], other: JPriorityQueue[Any]): JPriorityQueue[Any] = {
    val it = other.iterator()
    while (it.hasNext) {
      val v = it.next() // already copied at update time
      if (buf.size < k) buf.add(v)
      else if (evictionOrder.compare(v, buf.peek()) > 0) {
        buf.poll()
        buf.add(v)
      }
    }
    buf
  }

  override def eval(buf: JPriorityQueue[Any]): Any = {
    val arr = buf.toArray
    java.util.Arrays.sort(arr,
      if (smallest) ordering.asInstanceOf[java.util.Comparator[AnyRef]]
      else ordering.reverse.asInstanceOf[java.util.Comparator[AnyRef]])
    new GenericArrayData(arr)
  }

  // serialize the heap as a single-column UnsafeRow holding an array —
  // the same trick Spark's own Collect aggregates use
  @transient private lazy val projection =
    UnsafeProjection.create(Array[DataType](dataType))

  override def serialize(buf: JPriorityQueue[Any]): Array[Byte] =
    projection.apply(InternalRow.apply(new GenericArrayData(buf.toArray)))
      .getBytes

  override def deserialize(bytes: Array[Byte]): JPriorityQueue[Any] = {
    val buf = createAggregationBuffer()
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    row.getArray(0).foreach(child.dataType,
      (_, v) => buf.add(InternalRow.copyValue(v)))
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): BoundedTopKAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BoundedTopKAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): BoundedTopKAgg =
    copy(child = newChild)

  override def prettyName: String =
    if (smallest) "bounded_top_k_min" else "bounded_top_k_max"
}

object BoundedTopKAgg {

  /** The k smallest values of `e` per group, as a sorted (ascending)
    * array. */
  def minK(e: Column, k: Int): Column =
    GraftColumnBridge.column(
      BoundedTopKAgg(GraftColumnBridge.expression(e), k, smallest = true)
        .toAggregateExpression())

  /** The k largest values of `e` per group, as a sorted (descending)
    * array. */
  def maxK(e: Column, k: Int): Column =
    GraftColumnBridge.column(
      BoundedTopKAgg(GraftColumnBridge.expression(e), k, smallest = false)
        .toAggregateExpression())
}

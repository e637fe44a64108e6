package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters sketch as a mergeable Catalyst aggregate:
  * at most `m` (term, counter) pairs of state per partition, combined
  * map-side like any partial aggregate.
  *
  * Guarantee (classic MG; merge form per Agarwal et al., "Mergeable
  * Summaries", PODS'12): for every term with true frequency
  * f > n/(m+1) over n total rows, the term IS present in the sketch,
  * and its counter c satisfies  f - n/(m+1) <= c <= f  — counters are
  * lower bounds. The merge (pointwise add, then subtract the (m+1)-th
  * largest counter and drop non-positive) preserves the same additive
  * error, so partial sketches from any partitioning combine exactly as
  * well as one sequential pass.
  *
  * Why an aggregate and not `groupBy(term).count`: the full groupBy
  * shuffles one row per DISTINCT term — at 100 TB of text that is the
  * entire vocabulary, billions of grams, most of which are noise. This
  * sketch crosses the shuffle as ONE bounded row per partition
  * (m entries), turning heavy-hitter candidate generation into a
  * constant-size aggregation; an exact filtered recount over the
  * candidate set (see [[graft.ops.TextAnalysis.heavyHitterTerms]])
  * then restores exactness at a shuffle bounded by m terms.
  *
  * Output: `array<struct<term string, lb bigint>>` sorted by
  * (lb desc, term asc). Null inputs are skipped.
  */
case class HeavyHittersAgg(
    child: Expression,
    m: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
  with UnaryLike[Expression] {

  require(m > 0, s"heavy-hitters capacity must be > 0, got $m")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"heavy_hitters input must be string, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("lb", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[UTF8String, Long],
                      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      // probe with the buffer-backed UTF8String (content hash/equals —
      // no allocation); clone only on first insertion, since the input
      // may point into a reused UnsafeRow buffer
      val term = v.asInstanceOf[UTF8String]
      buf.get(term) match {
        case Some(c) => buf.update(term, c + 1)
        case None if buf.size < m => buf.update(term.clone(), 1L)
        case None =>
          // classic MG step: a new term against a full table decrements
          // every counter; zeros vacate their slots. O(m), amortized
          // O(1) per decremented unit of count.
          buf.mapValuesInPlace((_, c) => c - 1)
          buf.filterInPlace((_, c) => c > 0)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[UTF8String, Long],
                     other: mutable.HashMap[UTF8String, Long])
    : mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (t, c) => buf.update(t, buf.getOrElse(t, 0L) + c) }
    if (buf.size > m) {
      // subtract the (m+1)-th largest counter from all, drop <= 0:
      // leaves at most m survivors and preserves the MG error bound
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val d = counts(counts.length - (m + 1)) // (m+1)-th largest
      buf.mapValuesInPlace((_, c) => c - d)
      buf.filterInPlace((_, c) => c > 0)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val rows = buf.toArray
      .sortBy { case (t, c) => (-c, t) }
      .map { case (t, c) => new GenericInternalRow(Array[Any](t, c)) }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, c) =>
      val b = t.getBytes
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): HeavyHittersAgg =
    copy(child = newChild)

  override def prettyName: String = "heavy_hitters_sketch"
}

object HeavyHittersAgg {

  /** Misra-Gries sketch of `e` with capacity `m`:
    * `array<struct<term, lb>>` sorted by (lb desc, term asc); every
    * term with frequency > n/(m+1) is guaranteed present. */
  def sketch(e: Column, m: Int): Column =
    GraftColumnBridge.column(
      HeavyHittersAgg(GraftColumnBridge.expression(e), m)
        .toAggregateExpression())
}

package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Size-bounded `collect_list` over a long column: accumulates group elements
  * until the buffer holds `maxLen` of them, then drops the rest — so
  * per-group aggregation state is bounded by `maxLen` at ANY group
  * cardinality. The result array is sorted ascending (deterministic under
  * any partitioning / merge order).
  *
  * This is the aggregation a DF-capped inverted index needs at corpus scale
  * ([[graft.operators.Dedup.ngramJaccardPairs]]): posting lists are only
  * wanted while df ≤ cap, so collecting with `maxLen = cap + 1` yields the
  * exact list for every rare shingle (no truncation can occur below the
  * bound) and a cheap saturated marker — `size = cap + 1`, one bounded
  * buffer, not a df-sized list — for every stop shingle. The built-in
  * alternatives can't express this: `collect_list` materializes the full
  * df-sized list per key before any filter (unbounded state), and the
  * `row_number ≤ cap` window form pays a per-key sort of the whole incidence.
  *
  * Exactness property used by callers: a group's final size is
  * `min(true count, maxLen)` — partial buffers saturate only past `maxLen`,
  * and merging partials of an under-cap group concatenates disjoint exact
  * subsets, so a result with `size < maxLen` is always the complete,
  * untruncated element list.
  */
case class BoundedCollectList(
    child: Expression,
    maxLen: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Long]]
  with UnaryLike[Expression] {

  require(maxLen > 0, s"maxLen must be positive, got $maxLen")
  // no ExpectsInputTypes (its input-type ADT is private[sql] in Spark 4):
  // the child must already be LongType — callers cast at the boundary, and
  // a mistyped child fails in update()'s asInstanceOf on first use

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bounded_collect_list"

  override def createAggregationBuffer(): ArrayBuffer[Long] =
    new ArrayBuffer[Long](math.min(maxLen, 16))

  override def update(buf: ArrayBuffer[Long], input: InternalRow): ArrayBuffer[Long] = {
    if (buf.length < maxLen) {
      val v = child.eval(input)
      if (v != null) buf += v.asInstanceOf[Long]
    }
    buf
  }

  override def merge(buf: ArrayBuffer[Long], other: ArrayBuffer[Long]): ArrayBuffer[Long] = {
    var i = 0
    while (buf.length < maxLen && i < other.length) {
      buf += other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: ArrayBuffer[Long]): Any =
    new GenericArrayData(buf.toArray.sorted)

  override def serialize(buf: ArrayBuffer[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new ArrayBuffer[Long](bytes.length / 8)
    while (bb.remaining() >= 8) buf += bb.getLong
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedCollectList =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedCollectList =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedCollectList =
    copy(child = newChild)
}

object BoundedCollectList {
  /** Column-API surface: collect at most `maxLen` longs per group, sorted. */
  def boundedCollectList(e: Column, maxLen: Int): Column =
    ColumnBridge.column(
      BoundedCollectList(ColumnBridge.expression(e), maxLen).toAggregateExpression())
}

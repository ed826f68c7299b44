package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import scala.collection.mutable.ArrayBuffer

/** Bounded-state collect: `collect_list` with the degenerate-bucket
  * cap enforced INSIDE the aggregation buffer.
  *
  * The LSH candidate generators cap bucket membership at `maxItems`
  * (boilerplate buckets are dropped, their members pair in other
  * bands). `collect_list` + a size filter materializes the FULL hot
  * list on one reducer before the filter drops it — collect_list
  * partials only concatenate. Count-then-cap (a count aggregate + a
  * semi join back) fixes the skew but costs a second shuffle of the
  * banded rows. This aggregate gets both properties at once: state
  * grows to at most `maxItems + 1` elements — one past the cap, which
  * IS the saturation marker — then stops absorbing, so a
  * million-member bucket costs O(rows) comparisons but never holds
  * more than `maxItems + 1` values on ANY task, map-side partials
  * included. Saturated groups eval to NULL (the caller filters
  * `isNotNull`), exactly the rows the post-collect size filter
  * discarded — result-identical to both prior shapes, one shuffle,
  * bounded memory.
  *
  * Output order is the group's arrival order; callers wrap in
  * `sort_array` for determinism (as they did over collect_list).
  */
case class BoundedCollectAggExpr(
    child: Expression,
    maxItems: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Any]] with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = true

  override def createAggregationBuffer(): ArrayBuffer[Any] = ArrayBuffer.empty[Any]

  override def update(buf: ArrayBuffer[Any], input: InternalRow): ArrayBuffer[Any] = {
    if (buf.length <= maxItems) {
      val v = child.eval(input)
      if (v != null) buf += InternalRow.copyValue(v)
    }
    buf
  }

  override def merge(buf: ArrayBuffer[Any], other: ArrayBuffer[Any]): ArrayBuffer[Any] = {
    val it = other.iterator
    while (it.hasNext && buf.length <= maxItems) buf += it.next()
    buf
  }

  override def eval(buf: ArrayBuffer[Any]): Any =
    if (buf.length > maxItems) null else new GenericArrayData(buf.toArray)

  @transient private lazy val bufferSer =
    UnsafeProjection.create(Array[DataType](dataType))

  override def serialize(buf: ArrayBuffer[Any]): Array[Byte] =
    bufferSer(InternalRow(new GenericArrayData(buf.toArray))).getBytes

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Any] = {
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    val arr = row.getArray(0)
    val buf = createAggregationBuffer()
    arr.foreach(child.dataType,
      (_, v) => buf += InternalRow.copyValue(v))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedCollectAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedCollectAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedCollectAggExpr =
    copy(child = newChild)
}

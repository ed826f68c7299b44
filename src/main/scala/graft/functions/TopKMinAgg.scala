package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

import scala.collection.mutable.ArrayBuffer

/** Bounded top-k-smallest: the rank-window tail
  * (`row_number() OVER (PARTITION BY g ORDER BY key) <= k`) as a
  * map-side-combinable aggregate with k-row state.
  *
  * The ANN serving tails keep the k best candidates per query. A rank
  * window ships EVERY candidate row to the query's partition and sorts
  * them there — at serving scale that is sum-of-probed-list-sizes rows
  * per query (n·probes/K, ~10⁵ at billion scale) crossing the shuffle
  * to be sorted and then 99.99% discarded. This aggregate keeps the
  * k smallest elements (by the child's full lexicographic ordering —
  * callers order by `struct(key..., tiebreak...)`) in a sorted buffer:
  * partials reduce map-side to k rows per group per task, only those
  * cross the wire, and merge is a bounded sorted merge. Once a task's
  * buffer is full, a non-qualifying row costs one comparison against
  * the current k-th — the hot path for almost every row.
  *
  * Result-identical to the window tail (same key, same tiebreak — put
  * the tiebreak column(s) in the struct); eval returns the buffer
  * ascending, so `posexplode` positions are the ranks, 0-based.
  * Descending orders negate the key into the struct. Unlike the
  * window, this is also legal in Structured Streaming aggregations —
  * the streaming ANN serving path exists because of it. */
case class TopKMinAggExpr(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Any]] with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false

  @transient private lazy val ord: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)

  override def createAggregationBuffer(): ArrayBuffer[Any] = ArrayBuffer.empty[Any]

  // buf invariant: sorted ascending, length <= k
  private def insert(buf: ArrayBuffer[Any], v: Any): Unit = {
    if (buf.length >= k) {
      if (ord.gteq(v, buf.last)) return
      buf.remove(buf.length - 1)
    }
    var lo = 0
    var hi = buf.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ord.lt(buf(mid), v)) lo = mid + 1 else hi = mid
    }
    buf.insert(lo, v)
  }

  override def update(buf: ArrayBuffer[Any], input: InternalRow): ArrayBuffer[Any] = {
    val v = child.eval(input)
    if (v != null &&
        (buf.length < k || ord.lt(v, buf.last))) {
      insert(buf, InternalRow.copyValue(v))
    }
    buf
  }

  override def merge(buf: ArrayBuffer[Any], other: ArrayBuffer[Any]): ArrayBuffer[Any] = {
    // other is sorted ascending: once one element fails to qualify,
    // every later one fails too
    val it = other.iterator
    var go = true
    while (go && it.hasNext) {
      val v = it.next()
      if (buf.length < k || ord.lt(v, buf.last)) insert(buf, v)
      else go = false
    }
    buf
  }

  override def eval(buf: ArrayBuffer[Any]): Any = new GenericArrayData(buf.toArray)

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

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKMinAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKMinAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKMinAggExpr =
    copy(child = newChild)
}

package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import scala.collection.mutable

/** Grouped sum-then-top-k (`graft_sum_topk`): each input row carries an
  * array of (id, add) pairs; the aggregate sums `add` per id across the
  * whole group and returns the k ids with the LARGEST sums (ties → the
  * smallest id), sorted, as `array<struct<id, sum>>`.
  *
  * This is the two-level tail `SUM GROUP BY (g, id)` → `top-k per g`
  * collapsed into ONE aggregation — the packed form of a scoring
  * pipeline whose per-id contributions arrive as row-local arrays
  * (BM25 serving: one row per query term carrying that term's scored
  * posting list). In streaming that collapse is the difference between
  * one state-store row PER GROUP (this — the heavy-hitters stance) and
  * one row per (group, id) partial in the chained-aggregation form:
  * state round trips scale with groups, not candidates. The buffer
  * is bounded by the group's distinct ids — for retrieval, the
  * query's candidate set, the same working set the batch shuffle
  * carries for that query.
  *
  * Exact (integer sums are order-free), mergeable (pointwise map sum),
  * deterministic under any partitioning; eval's ordering matches the
  * rank-window `ORDER BY sum DESC, id` exactly. */
case class SumTopKAggExpr(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[Long, Long]]
  with UnaryLike[Expression] {

  require(k > 0, "graft_sum_topk k must be positive")

  private def entryType: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("sum", LongType, nullable = false)))

  override def dataType: DataType = ArrayType(entryType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StructType(fields), _)
          if fields.length == 2 && fields(0).dataType == LongType &&
            fields(1).dataType == LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_sum_topk expects array<struct<long, long>>, got $other")
    }

  override def createAggregationBuffer(): mutable.HashMap[Long, Long] =
    mutable.HashMap.empty[Long, Long]

  override def update(buf: mutable.HashMap[Long, Long],
      input: InternalRow): mutable.HashMap[Long, Long] = {
    val arr = child.eval(input)
    if (arr != null) {
      val a = arr.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      var i = 0
      val n = a.numElements()
      while (i < n) {
        // SQL-first callers can hand arrays with null slots; skip them
        // (the TopKMinAgg null stance) instead of NPEing mid-aggregate.
        // Null STRUCT FIELDS are skipped too: checkInputDataTypes can't
        // see field nullability, and getLong on a null slot silently
        // reads 0 — a null score (e.g. bm25 under degenerate corpus
        // stats) must not score as 0 (round-8 ADVICE)
        if (!a.isNullAt(i)) {
          val e = a.getStruct(i, 2)
          if (!e.isNullAt(0) && !e.isNullAt(1)) {
            val id = e.getLong(0)
            buf.update(id, buf.getOrElse(id, 0L) + e.getLong(1))
          }
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[Long, Long],
      other: mutable.HashMap[Long, Long]): mutable.HashMap[Long, Long] = {
    other.foreach { case (id, s) =>
      buf.update(id, buf.getOrElse(id, 0L) + s)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[Long, Long]): Any = {
    // bounded top-k selection: one O(n) pass with a k-sized sorted
    // buffer (the HeavyHittersAgg eval shape)
    val top = new mutable.ArrayBuffer[(Long, Long)](k)
    def beats(a: (Long, Long), b: (Long, Long)): Boolean =
      if (a._2 != b._2) a._2 > b._2 else a._1 < b._1
    buf.foreach { e =>
      if (top.length < k || beats(e, top.last)) {
        if (top.length >= k) top.remove(top.length - 1)
        var lo = 0
        var hi = top.length
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (beats(top(mid), e)) lo = mid + 1 else hi = mid
        }
        top.insert(lo, e)
      }
    }
    new GenericArrayData(top.toArray.map { case (id, s) =>
      new GenericInternalRow(Array[Any](id, s))
    })
  }

  @transient private lazy val bufferSer =
    UnsafeProjection.create(Array[DataType](dataType))

  override def serialize(buf: mutable.HashMap[Long, Long]): Array[Byte] = {
    val arr = new GenericArrayData(buf.toArray.map { case (id, s) =>
      new GenericInternalRow(Array[Any](id, s))
    })
    bufferSer(InternalRow(arr)).getBytes
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Long, Long] = {
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    val buf = createAggregationBuffer()
    val arr = row.getArray(0)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val e = arr.getStruct(i, 2)
      buf.update(e.getLong(0), e.getLong(1))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SumTopKAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SumTopKAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SumTopKAggExpr =
    copy(child = newChild)
}

package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

import scala.collection.mutable

/** Mergeable Misra-Gries heavy-hitters summary (`graft_heavy_hitters`):
  * frequent-item mining with HARD bounded state — the 100 TB path for
  * "which n-grams / lines / URLs dominate the corpus" that never
  * shuffles the item universe.
  *
  * An exact `GROUP BY item ORDER BY count DESC LIMIT k` over corpus
  * n-grams shuffles one row per DISTINCT item (at web scale, ~the
  * token count). This aggregate keeps at most `capacity` counters per
  * partial buffer; map-side partials reduce every task to one
  * ≤ capacity-entry summary, only those cross the wire, and the final
  * merge is pointwise. The guarantees are the published
  * mergeable-summaries results (Agarwal et al., PODS'12 / Misra-Gries
  * '82):
  *
  *  - each reported `cnt` is a LOWER bound on the item's true count,
  *    and `cnt + max_err` an UPPER bound (`max_err` is the summary's
  *    total decrement, shared by all rows of one group);
  *  - any item with true count > N/capacity of a group's N rows
  *    survives in the summary (the frequent-items guarantee; the
  *    batch-decrement update below pays for each decrement `m` with
  *    `m x capacity` stored mass, so total decrement <= N/capacity —
  *    one notch looser than decrement-by-1's N/(capacity+1), in
  *    exchange for O(1) amortized updates);
  *  - with fewer than `capacity` distinct items in the group the
  *    summary is EXACT (`max_err` = 0) and deterministic under any
  *    partitioning/merge order — the regime the DuckDB oracle
  *    hash-matches at every verification tier; at production scale
  *    `capacity` becomes the precision knob.
  *
  * Update is O(1) amortized: a full buffer meeting a new item batch-
  * decrements all counters by the current minimum and drops the zeros
  * (total decrement mass over a stream is ≤ N, paying for the O(size)
  * sweeps). Merge sums counts pointwise, then enforces capacity by
  * subtracting the (capacity+1)-th largest count (the paper's merge —
  * deterministic given the count ordering; sub-threshold survivors are
  * dropped into the error term, never silently).
  *
  * eval returns the k entries with the largest `cnt` (ties broken by
  * the item's own ordering, ascending) as
  * `array<struct<item, cnt, max_err>>`, sorted — `explode` yields
  * ranked rows. Legal in streaming aggregations (bounded state, no
  * window), like [[TopKMinAggExpr]].
  */
case class HeavyHittersAggExpr(
    child: Expression,
    capacity: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HeavyHittersAggExpr.Summary]
  with UnaryLike[Expression] {
  import HeavyHittersAggExpr.Summary

  require(capacity > 0, "graft_heavy_hitters capacity must be positive")
  require(k > 0, "graft_heavy_hitters k must be positive")

  private def entryType: StructType = StructType(Seq(
    StructField("item", child.dataType, nullable = false),
    StructField("cnt", LongType, nullable = false),
    StructField("max_err", LongType, nullable = false)))

  override def dataType: DataType = ArrayType(entryType, containsNull = false)
  override def nullable: Boolean = false

  @transient private lazy val itemOrd: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)

  override def createAggregationBuffer(): Summary =
    new Summary(mutable.HashMap.empty[Any, Long], 0L)

  override def update(buf: Summary, input: InternalRow): Summary = {
    val v = child.eval(input)
    if (v != null) {
      buf.counts.get(v) match {
        case Some(c) => buf.counts.update(v, c + 1L)
        case None =>
          if (buf.counts.size < capacity) {
            buf.counts.update(InternalRow.copyValue(v), 1L)
          } else {
            // Misra-Gries overflow: batch-decrement by the minimum
            // count — at least one counter hits zero and is dropped,
            // making room. Decrement mass is charged to max_err.
            val m = buf.counts.valuesIterator.min
            buf.decr += m
            buf.counts.filterInPlace((_, c) => c > m)
            buf.counts.mapValuesInPlace((_, c) => c - m)
            buf.counts.update(InternalRow.copyValue(v), 1L)
          }
      }
    }
    buf
  }

  override def merge(buf: Summary, other: Summary): Summary = {
    other.counts.foreach { case (item, c) =>
      buf.counts.update(item, buf.counts.getOrElse(item, 0L) + c)
    }
    buf.decr += other.decr
    if (buf.counts.size > capacity) {
      // the mergeable-summaries truncation: subtract the
      // (capacity+1)-th largest count from every counter, drop <= 0
      val vals = buf.counts.values.toArray
      java.util.Arrays.sort(vals)
      val t = vals(vals.length - capacity - 1)
      buf.decr += t
      buf.counts.filterInPlace((_, c) => c > t)
      buf.counts.mapValuesInPlace((_, c) => c - t)
    }
    buf
  }

  override def eval(buf: Summary): Any = {
    // bounded top-k selection over the counter map: one O(C) pass with
    // a k-sized sorted buffer (TopKMinAgg's insert shape) instead of
    // sorting all C=capacity entries — eval runs per group per trigger
    // in the streaming variants, so the full sort is the wrong cost
    val top = new scala.collection.mutable.ArrayBuffer[(Any, Long)](k)
    def beats(a: (Any, Long), b: (Any, Long)): Boolean =
      if (a._2 != b._2) a._2 > b._2 else itemOrd.lt(a._1, b._1)
    buf.counts.foreach { e =>
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
    new GenericArrayData(top.toArray.map { case (item, c) =>
      new GenericInternalRow(Array[Any](item, c, buf.decr))
    })
  }

  // serialized form: (entries array<struct<item, cnt>>, total decrement)
  private def serEntryType: StructType = StructType(Seq(
    StructField("item", child.dataType, nullable = false),
    StructField("cnt", LongType, nullable = false)))
  private def serArrType: DataType = ArrayType(serEntryType, containsNull = false)

  @transient private lazy val bufferSer =
    UnsafeProjection.create(Array[DataType](serArrType, LongType))

  override def serialize(buf: Summary): Array[Byte] = {
    val arr = new GenericArrayData(buf.counts.toArray.map { case (item, c) =>
      new GenericInternalRow(Array[Any](item, c))
    })
    bufferSer(InternalRow(arr, buf.decr)).getBytes
  }

  override def deserialize(bytes: Array[Byte]): Summary = {
    val row = new UnsafeRow(2)
    row.pointTo(bytes, bytes.length)
    val buf = createAggregationBuffer()
    val arr = row.getArray(0)
    val et = serEntryType
    arr.foreach(et, (_, e) => {
      val r = e.asInstanceOf[InternalRow]
      buf.counts.update(
        InternalRow.copyValue(r.get(0, child.dataType)), r.getLong(1))
    })
    buf.decr = row.getLong(1)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHittersAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHittersAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HeavyHittersAggExpr =
    copy(child = newChild)
}

object HeavyHittersAggExpr {
  /** Mutable Misra-Gries buffer: item -> lower-bound count, plus the
    * total decrement applied (the shared upper-bound slack). */
  final class Summary(val counts: mutable.HashMap[Any, Long], var decr: Long)
}

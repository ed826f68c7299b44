package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import scala.collection.mutable

/** Reciprocal-rank FUSION as one aggregate (`graft_rrf_fuse`): each
  * input row carries an array of (side, id, v) triples — side 0 rows
  * are LEXICAL contributions (v summed per id across the group, the
  * [[SumTopKAggExpr]] semantics; ranked by sum DESC, id ASC) and
  * side 1 rows are SEMANTIC candidates (v is a distance, deduped to
  * the min per id; ranked by v ASC, id ASC). At eval both sides are
  * ranked to their top `k`, fused with the standard integer RRF
  * (`Σ 1000000 div (60 + rank)` over the lists containing the id,
  * ties → smallest id — byte-identical to the batch
  * [[graft.llm.Retrieval.rrfFuse]] over the two k-row rankings), and
  * the fused top-k returns as
  * `array<struct<doc_id, rrf_ppm, rank_text, rank_vec>>` with 0 in a
  * rank slot meaning "absent from that side's list".
  *
  * The point is the STREAMING shape: hybrid search over a query
  * stream needs each side's rank within the (window, query) group —
  * naively two windowed rankings plus a stream-stream fusion join
  * (three stateful operators). Folding both sides into ONE buffer
  * makes hybrid serving a single windowed aggregation: state per
  * open (window, query) is the lexical candidate map (the same
  * working set the batch shuffle carries for that query) plus a
  * probes×k-bounded semantic map, emitted once on watermark close.
  * Exact and mergeable (pointwise sum / pointwise min), deterministic
  * under any partitioning and at-least-once replay of semantic rows
  * (min is idempotent); lexical duplicates must be deduped upstream
  * exactly like every other serving aggregate (the streamQueryTerms
  * contract). */
case class RrfFuseAggExpr(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[RrfFuseAggExpr.Buf]
  with UnaryLike[Expression] {

  require(k > 0, "graft_rrf_fuse k must be positive")

  import RrfFuseAggExpr.Buf

  private def entryType: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("rrf_ppm", LongType, nullable = false),
    StructField("rank_text", LongType, nullable = false),
    StructField("rank_vec", LongType, nullable = false)))

  override def dataType: DataType = ArrayType(entryType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StructType(fields), _)
          if fields.length == 3 &&
            fields.forall(_.dataType == LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_rrf_fuse expects array<struct<long, long, long>> " +
            s"(side, id, v), got $other")
    }

  override def createAggregationBuffer(): Buf = Buf()

  override def update(buf: Buf, input: InternalRow): Buf = {
    val arr = child.eval(input)
    if (arr != null) {
      val a = arr.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      var i = 0
      val n = a.numElements()
      while (i < n) {
        if (!a.isNullAt(i)) {
          val e = a.getStruct(i, 3)
          if (!e.isNullAt(0) && !e.isNullAt(1) && !e.isNullAt(2)) {
            val side = e.getLong(0)
            val id = e.getLong(1)
            val v = e.getLong(2)
            if (side == 0L) buf.text.update(id, buf.text.getOrElse(id, 0L) + v)
            else if (side == 1L)
              buf.vec.update(id, math.min(buf.vec.getOrElse(id, v), v))
            else
              // a value constraint checkInputDataTypes can't express:
              // silently folding an unknown side into either map would
              // corrupt the fusion ranks; a wiring bug must surface
              throw new IllegalArgumentException(
                s"graft_rrf_fuse: side must be 0 (text) or 1 (vec), got $side")
          }
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    other.text.foreach { case (id, s) =>
      buf.text.update(id, buf.text.getOrElse(id, 0L) + s)
    }
    other.vec.foreach { case (id, d) =>
      buf.vec.update(id, math.min(buf.vec.getOrElse(id, d), d))
    }
    buf
  }

  /** One O(n) pass with a k-sized sorted insert (the SumTopKAgg eval
    * shape), parameterized on the side's total order. */
  private def topK(m: mutable.HashMap[Long, Long],
      beats: ((Long, Long), (Long, Long)) => Boolean): Seq[(Long, Long)] = {
    val top = new mutable.ArrayBuffer[(Long, Long)](k)
    m.foreach { e =>
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
    top.toSeq
  }

  override def eval(buf: Buf): Any = {
    val textRanks = topK(buf.text, (a, b) =>
      if (a._2 != b._2) a._2 > b._2 else a._1 < b._1)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    val vecRanks = topK(buf.vec, (a, b) =>
      if (a._2 != b._2) a._2 < b._2 else a._1 < b._1)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    val fused = (textRanks.keySet ++ vecRanks.keySet).toSeq.map { id =>
      val rt = textRanks.getOrElse(id, 0L)
      val rv = vecRanks.getOrElse(id, 0L)
      val ppm = (if (rt > 0) 1000000L / (60L + rt) else 0L) +
        (if (rv > 0) 1000000L / (60L + rv) else 0L)
      (id, ppm, rt, rv)
    }.sortBy { case (id, ppm, _, _) => (-ppm, id) }.take(k)
    new GenericArrayData(fused.toArray.map { case (id, ppm, rt, rv) =>
      new GenericInternalRow(Array[Any](id, ppm, rt, rv))
    })
  }

  private def bufType: DataType = ArrayType(StructType(Seq(
    StructField("side", LongType, nullable = false),
    StructField("id", LongType, nullable = false),
    StructField("v", LongType, nullable = false))), containsNull = false)

  @transient private lazy val bufferSer =
    UnsafeProjection.create(Array[DataType](bufType))

  override def serialize(buf: Buf): Array[Byte] = {
    val rows =
      buf.text.toArray.map { case (id, s) =>
        new GenericInternalRow(Array[Any](0L, id, s)) } ++
      buf.vec.toArray.map { case (id, d) =>
        new GenericInternalRow(Array[Any](1L, id, d)) }
    bufferSer(InternalRow(new GenericArrayData(
      rows.asInstanceOf[Array[Any]]))).getBytes
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    val buf = createAggregationBuffer()
    val arr = row.getArray(0)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val e = arr.getStruct(i, 3)
      if (e.getLong(0) == 0L) buf.text.update(e.getLong(1), e.getLong(2))
      else buf.vec.update(e.getLong(1), e.getLong(2))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): RrfFuseAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): RrfFuseAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): RrfFuseAggExpr =
    copy(child = newChild)
}

object RrfFuseAggExpr {
  /** The two-sided buffer: lexical id → contribution sum, semantic
    * id → min distance. */
  case class Buf(
      text: mutable.HashMap[Long, Long] = mutable.HashMap.empty,
      vec: mutable.HashMap[Long, Long] = mutable.HashMap.empty)
}

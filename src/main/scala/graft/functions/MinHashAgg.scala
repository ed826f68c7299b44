package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import java.nio.ByteBuffer

/** MinHash sketch AGGREGATE: folds per-row shingle-hash arrays
  * (`array<long>`, already reduced mod p — ShingleHashesExpr output)
  * into one `numPerm`-slot signature per GROUP.
  *
  * The signature of a group equals MinHashSigExpr over the union of
  * the group's shingle sets (element-wise min commutes with union —
  * pinned by ScalaTest), so pairwise group similarity reduces to
  * comparing two constant-size arrays: estimated Jaccard = fraction of
  * equal slots. That is the 100 TB shape for corpus-level similarity
  * (per-source / per-domain dedup triage): state per group is
  * `numPerm` longs regardless of group size, partial aggregation
  * merges map-side, and no shuffle ever carries a shingle set.
  *
  * Permutation k shares MinHashSigExpr's universal-hash constants:
  * min over h of ((k·1000003 + 12345)·h + k·998244353 + 7) mod p,
  * p = 2³¹−1. Empty/absent input leaves slots at p (the empty-set
  * signature).
  */
case class MinHashAggExpr(
    child: Expression,
    numPerm: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  private val P = 2147483647L

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = Array.fill(numPerm)(P)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      var k = 0
      while (k < numPerm) {
        val a = k * 1000003L + 12345L
        val b = k * 998244353L + 7L
        var best = buf(k)
        var j = 0
        while (j < n) {
          val x = (a * arr.getLong(j) + b) % P
          val m = if (x < 0) x + P else x
          if (m < best) best = m
          j += 1
        }
        buf(k) = best
        k += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var k = 0
    while (k < numPerm) {
      if (other(k) < buf(k)) buf(k) = other(k)
      k += 1
    }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * numPerm)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numPerm)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashAggExpr =
    copy(child = newChild)
}

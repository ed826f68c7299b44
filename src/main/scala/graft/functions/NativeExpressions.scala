package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the compute-heavy sketch kernels.
  *
  * The pure-SQL formulations (higher-order `aggregate`/`transform`
  * lambdas) evaluate one boxed expression node per array element per
  * permutation/bit — ~30k interpreted ops per document. These
  * expressions make one eval call per row and run a tight primitive
  * JVM loop instead (~100× faster), while staying inside the Catalyst
  * planner: still codegen-compatible via CodegenFallback, still
  * null-safe, still prunable.
  *
  * Semantics are bit-for-bit identical to the SQL formulations they
  * replace (documented per expression), so ScalaTest golden values pin
  * both.
  */

/** SimHash over an array<long> of shingle hashes: bit i of the result
  * is set iff the sum over hashes of (2·bit_i(h) − 1) is positive.
  * Equivalent SQL: aggregate(sequence(0,63), 0L, (acc,i) -> acc +
  * IF(aggregate(th, 0L, (s,h) -> s + (pmod(shiftright(h,i),2)*2-1)) > 0,
  * shiftleft(1L,i), 0L)). */
case class SimHash64Expr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"simhash64 needs array<bigint>, got $t")
  }
  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var j = 0
    while (j < n) {
      val h = arr.getLong(j)
      var i = 0
      while (i < 64) {
        counts(i) += (((h >>> i) & 1L).toInt << 1) - 1
        i += 1
      }
      j += 1
    }
    var sim = 0L
    var i = 0
    while (i < 64) { if (counts(i) > 0) sim |= (1L << i); i += 1 }
    sim
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** MinHash signature over an array<long> of shingle hashes already
  * reduced mod p = 2^31−1: element k is min over h of
  * ((k·1000003 + 12345)·h + k·998244353 + 7) mod p.
  * Equivalent SQL: transform(sequence(0, numPerm-1), k ->
  * array_min(transform(th, h -> pmod((k*1000003+12345)*h +
  * k*998244353+7, 2147483647)))). Empty input yields an all-p
  * signature (array_min of empty is null in SQL; hashes are never
  * empty for non-empty shingle sets). */
case class MinHashSigExpr(child: Expression, numPerm: Int)
    extends UnaryExpression with CodegenFallback {
  private val P = 2147483647L
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = new Array[Long](numPerm)
    var k = 0
    while (k < numPerm) {
      val a = k * 1000003L + 12345L
      val b = k * 998244353L + 7L
      var best = Long.MaxValue
      var j = 0
      while (j < n) {
        val x = (a * arr.getLong(j) + b) % P
        val m = if (x < 0) x + P else x
        if (m < best) best = m
        j += 1
      }
      sig(k) = if (n == 0) P else best
      k += 1
    }
    new GenericArrayData(sig)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Dot product of two array<float> columns as double. Matches the SQL
  * aggregate(zip_with(a, b, (x,y) -> x*y), 0D, (acc,x) -> acc+x)
  * fold: per-element float multiply, left-to-right double accumulate —
  * deterministic and engine-exact. */
case class DotProductFExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getFloat(i) * b.getFloat(i); i += 1 }
    acc
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Session registration; idempotent, call before using
  * `graft_simhash64` / `graft_minhash_sig` / `graft_dot` in plans
  * (via expr(...) or call_udf). */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "graft_simhash64", es => SimHash64Expr(es.head), "scala_udf")
    reg.createOrReplaceTempFunction(
      "graft_minhash_sig", {
        case Seq(c, Literal(n: Int, IntegerType)) => MinHashSigExpr(c, n)
        case es => MinHashSigExpr(es.head, 64)
      }, "scala_udf")
    reg.createOrReplaceTempFunction(
      "graft_dot", es => DotProductFExpr(es(0), es(1)), "scala_udf")
  }
}

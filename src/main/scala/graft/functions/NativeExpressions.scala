package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, Literal, QuaternaryExpression, TernaryExpression, UnaryExpression}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the compute-heavy sketch kernels.
  *
  * The pure-SQL formulations (higher-order `aggregate`/`transform`
  * lambdas) evaluate one boxed expression node per array element per
  * permutation/bit — ~30k interpreted ops per document. These
  * expressions make one eval call per row and run a tight primitive
  * JVM loop instead (~100× faster), while staying inside the Catalyst
  * planner: null-safe and prunable.
  *
  * Every kernel implements `doGenCode` (round 15 — none is left on
  * CodegenFallback). The pure-arithmetic kernels (dot products, L2,
  * SimHash, MinHash signature, sign-LSH, quantize, sorted binary
  * search) inline their loops directly into the generated stage — no
  * per-row InternalRow boxing or interpreted dispatch. The
  * string/struct-shaped kernels (shingle hashing, fingerprints, doc
  * tf/positions, BPE, ADC probes) generate a call to the SAME static
  * helper their interpreted eval uses (one body per kernel — the
  * [[DocKernels]] discipline, so the two paths cannot drift), which
  * keeps the enclosing stage in one WholeStageCodegen span and drops
  * only the interpreted-expression wrapper. Every kernel's interpreted
  * and generated paths are exercised by the same bit-exact ScalaTest
  * pins.
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
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val counts = ctx.freshName("counts")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val sim = ctx.freshName("sim")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      s"""
         |int[] $counts = new int[64];
         |int $n = $c.numElements();
         |for (int $j = 0; $j < $n; $j++) {
         |  long $h = $c.getLong($j);
         |  for (int $i = 0; $i < 64; $i++) {
         |    $counts[$i] += (((int) (($h >>> $i) & 1L)) << 1) - 1;
         |  }
         |}
         |long $sim = 0L;
         |for (int $i = 0; $i < 64; $i++) {
         |  if ($counts[$i] > 0) $sim |= (1L << $i);
         |}
         |${ev.value} = $sim;
       """.stripMargin
    })
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
    extends UnaryExpression {
  private val P = 2147483647L
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val sig = ctx.freshName("sig")
      val n = ctx.freshName("n")
      val k = ctx.freshName("k")
      val a = ctx.freshName("a")
      val b = ctx.freshName("b")
      val best = ctx.freshName("best")
      val j = ctx.freshName("j")
      val x = ctx.freshName("x")
      val m = ctx.freshName("m")
      s"""
         |long[] $sig = new long[$numPerm];
         |int $n = $c.numElements();
         |for (int $k = 0; $k < $numPerm; $k++) {
         |  long $a = $k * 1000003L + 12345L;
         |  long $b = $k * 998244353L + 7L;
         |  long $best = java.lang.Long.MAX_VALUE;
         |  for (int $j = 0; $j < $n; $j++) {
         |    long $x = ($a * $c.getLong($j) + $b) % ${P}L;
         |    long $m = $x < 0 ? $x + ${P}L : $x;
         |    if ($m < $best) $best = $m;
         |  }
         |  $sig[$k] = $n == 0 ? ${P}L : $best;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions
         |  .UnsafeArrayData.fromPrimitiveArray($sig);
       """.stripMargin
    })
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
    // primitive-backed — see [[TextKernels.shingleHashes]]
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(sig)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distinct word-n-gram shingle hashes of a text column in one pass:
  * tokenize on single spaces (Java regex `" "` split, limit -1 — the
  * same tokens `split(text, " ")` yields), slide an n-token window,
  * join with single spaces, xxhash64 (seed 42, Spark's), keep the
  * first occurrence of each distinct shingle. Texts shorter than n
  * tokens fall back to the whole text as one shingle.
  *
  * Equivalent SQL (pinned by ScalaTest):
  *   modP=false: transform(shingleSet(text, n), t -> xxhash64(t))
  *   modP=true:  transform(shingleSet(text, n), t ->
  *                 pmod(xxhash64(t), 2147483647))
  * where shingleSet is TextDedup.shingleSet. The SQL chain evaluates
  * five interpreted higher-order lambdas per shingle; this kernel is
  * one eval per row. */
case class ShingleHashesExpr(child: Expression, n: Int, modP: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case StringType =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes needs string, got $t")
  }
  // doGenCode — the [[DocTfExpr]] stance: the generated code calls the
  // SAME static helper the interpreted path uses (one body, bit-exact
  // by construction), so the scan stage stays in one WholeStageCodegen
  // span and only the library-shaped work (tokenize + hash) leaves it.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.shingleHashes($c, $n, $modP);")
  override def nullSafeEval(v: Any): Any =
    TextKernels.shingleHashes(v.asInstanceOf[UTF8String], n, modP)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Cross-engine-verifiable variant of [[ShingleHashesExpr]]: the
  * per-shingle hash is MD5-derived instead of xxhash64, so the whole
  * LSH pipeline above it (MinHash signatures, band keys, bucket
  * joins, verification Jaccard) is DuckDB-oracle-checkable
  * end-to-end. Shingling is identical to ShingleHashesExpr; only the
  * hash differs:
  *  - modP=true  (MinHash path): first 4 MD5 bytes as unsigned
  *    big-endian mod 2^31−1 — DuckDB
  *    `CAST(('0x' || substr(md5(t),1,8)) AS BIGINT) % 2147483647`;
  *  - modP=false (SimHash path): first 8 MD5 bytes as unsigned
  *    big-endian, shifted right one bit to a 63-bit value — DuckDB
  *    `CAST((CAST(('0x' || substr(md5(t),1,16)) AS UBIGINT) >> 1)
  *    AS BIGINT)`. 63 bits (not 64) keeps the value non-negative in
  *    BOTH engines' signed BIGINT, so every downstream shift/mod
  *    agrees without two's-complement gymnastics; SimHash bit 63
  *    then gets only −1 votes and is constantly 0, costing one of 64
  *    sketch bits — an accepted trade for cross-engine checkability.
  */
case class Md5ShingleHashesExpr(child: Expression, n: Int, modP: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case StringType =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes_md5 needs string, got $t")
  }
  // doGenCode — see [[ShingleHashesExpr]]: same static helper on both
  // paths, scan stage stays in one WholeStageCodegen span
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.md5ShingleHashes($c, $n, $modP);")
  override def nullSafeEval(v: Any): Any =
    TextKernels.md5ShingleHashes(v.asInstanceOf[UTF8String], n, modP)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** POSITIONED md5 shingle hashes: array<struct<i:int, h:long>> with i
  * the 1-based start token of each n-gram and h the
  * [[Md5ShingleHashesExpr]] modP hash of that n-gram (NON-distinct —
  * position identity is the point; span removal needs to know WHERE a
  * duplicated n-gram sits, not just that it exists). Texts shorter
  * than n tokens emit the single whole-text shingle at position 1
  * (the same fallback as the distinct kernel, so the duplicated-hash
  * set built from per-doc-distinct kernel hashes joins this frame
  * consistently). Replaces TextDedup.spanScrub's expression chain
  * (md5 + substr + conv + pmod per position, each allocating) with
  * one digest per position in a single eval. DuckDB replay:
  * q_llm_span_scrub's `ph` CTE. */
case class Md5ShinglePosExpr(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("i", IntegerType, nullable = false),
    StructField("h", LongType, nullable = false))), containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case StringType =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"shingle_pos_md5 needs string, got $t")
  }
  // doGenCode — see [[ShingleHashesExpr]]: same static helper on both
  // paths, scan stage stays in one WholeStageCodegen span
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.md5ShinglePos($c, $n);")
  override def nullSafeEval(v: Any): Any =
    TextKernels.md5ShinglePos(v.asInstanceOf[UTF8String], n)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-document term frequencies in ONE pass: text →
  * array<struct<term, tf>> over whitespace tokens (split(' ', -1) —
  * the exact `split(text, ' ')` convention, empty tokens kept), terms
  * in first-occurrence order. Equivalent SQL: explode(tokens) →
  * groupBy(doc, term).count() — i.e. the index build's ONLY
  * corpus-sized Exchange, folded into a row-local hash map
  * (optimization round 14: the tf aggregate never needs to shuffle,
  * because a term's count within one document is a property of that
  * row alone). Output order is irrelevant downstream (everything
  * aggregates or joins), but deterministic anyway. */
case class DocTfExpr(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("tf", LongType, nullable = false))), containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case StringType =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_doc_tf needs string, got $t")
  }
  // doGenCode (round 15): the kernel sat on CodegenFallback in the
  // single hottest scan of the engine (every index build), breaking
  // the WholeStageCodegen span it sits in — every row paid an
  // interpreted-expression wrapper around the same work. The generated
  // code calls the SAME static helper the interpreted path uses
  // (DocKernels.docTf — one body, bit-identical), so the scan stage
  // stays fused and only the genuinely library-shaped work (tokenize +
  // hash map) leaves the generated code.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.DocKernels.docTf($c);")
  override def nullSafeEval(v: Any): Any =
    DocKernels.docTf(v.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-document positional postings in ONE pass: text →
  * array<struct<term, positions array<int>>> with 1-based ascending
  * positions — the row-local form of posexplode →
  * groupBy(doc, term).agg(sort_array(collect_list(p0 + 1))). Same
  * split convention and the same folded-Exchange rationale as
  * [[DocTfExpr]]; positions are ascending by construction (one
  * left-to-right scan). */
case class DocPositionsExpr(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("positions", ArrayType(IntegerType, containsNull = false),
      nullable = false))), containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case StringType =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_doc_pos needs string, got $t")
  }
  // doGenCode — see [[DocTfExpr]]: same static helper on both paths,
  // scan stage stays in one WholeStageCodegen span
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.DocKernels.docPositions($c);")
  override def nullSafeEval(v: Any): Any =
    DocKernels.docPositions(v.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The shared row bodies of [[DocTfExpr]] / [[DocPositionsExpr]]:
  * ONE implementation called by both the interpreted eval and the
  * generated code, so the two paths cannot drift (the bit-exact
  * NativeKernelSpec pins exercise both). */
object DocKernels {
  /** text → array<struct<term, tf>>, terms in first-occurrence order,
    * split(" ", -1) token convention (empty tokens kept). */
  def docTf(text: UTF8String): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val counts = new java.util.LinkedHashMap[String, Long](toks.length * 2)
    var i = 0
    while (i < toks.length) {
      counts.merge(toks(i), 1L, (a, b) => a + b)
      i += 1
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = new GenericInternalRow(Array[Any](
        UTF8String.fromString(e.getKey), e.getValue))
      j += 1
    }
    new GenericArrayData(out)
  }

  /** text → array<struct<term, positions>>, 1-based ascending. */
  def docPositions(text: UTF8String): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val pos = new java.util.LinkedHashMap[String, scala.collection.mutable.ArrayBuffer[Int]](
      toks.length * 2)
    var i = 0
    while (i < toks.length) {
      pos.computeIfAbsent(toks(i),
        _ => new scala.collection.mutable.ArrayBuffer[Int](4)) += (i + 1)
      i += 1
    }
    val out = new Array[Any](pos.size)
    val it = pos.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = new GenericInternalRow(Array[Any](
        UTF8String.fromString(e.getKey),
        new GenericArrayData(e.getValue.toArray[Any])))
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** The shared row bodies of the string-shaped kernels
  * ([[ShingleHashesExpr]], [[Md5ShingleHashesExpr]],
  * [[Md5ShinglePosExpr]], [[TopShingleRunExpr]], [[FingerprintExpr]],
  * [[Md5FingerprintExpr]]) — the [[DocKernels]] discipline: ONE
  * implementation called by both the interpreted eval and the
  * generated code, so the two paths cannot drift (the bit-exact
  * NativeKernelSpec pins exercise both). Bodies are verbatim moves of
  * the former per-expression eval code. */
object TextKernels {
  private val P = 2147483647L
  private val mdTL: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  private def xx(s: String): Long = {
    val u = UTF8String.fromString(s)
    org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(u, StringType, 42L)
  }

  /** Distinct word-n-gram shingle strings in first-occurrence order;
    * whole text as the single shingle when shorter than n tokens. */
  private def distinctShingles(text: String, n: Int): Iterator[String] = {
    val toks = text.split(" ", -1)
    if (toks.length >= n) {
      val seen = new java.util.LinkedHashSet[String]()
      var i = 0
      val sb = new java.lang.StringBuilder()
      while (i + n <= toks.length) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        seen.add(sb.toString)
        i += 1
      }
      import scala.jdk.CollectionConverters._
      seen.iterator().asScala
    } else Iterator.single(text)
  }

  def shingleHashes(text: UTF8String, n: Int, modP: Boolean): ArrayData = {
    val hs = distinctShingles(text.toString, n).map { s =>
      val h = xx(s)
      if (modP) { val m = h % P; if (m < 0) m + P else m } else h
    }.toArray
    // primitive-backed result: the downstream kernels (minhash_sig's
    // numPerm×n loop, simhash64) read this array element-wise in the
    // SAME fused stage — GenericArrayData would box every getLong
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(hs)
  }

  def md5ShingleHashes(text: UTF8String, n: Int, modP: Boolean): ArrayData = {
    val md = mdTL.get()
    val hs = distinctShingles(text.toString, n).map { s =>
      val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      if (modP) {
        (((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
          ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)) % P
      } else {
        (((d(0) & 0xFFL) << 56) | ((d(1) & 0xFFL) << 48) |
          ((d(2) & 0xFFL) << 40) | ((d(3) & 0xFFL) << 32) |
          ((d(4) & 0xFFL) << 24) | ((d(5) & 0xFFL) << 16) |
          ((d(6) & 0xFFL) << 8) | (d(7) & 0xFFL)) >>> 1
      }
    }.toArray
    // primitive-backed — see [[shingleHashes]]
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(hs)
  }

  def md5ShinglePos(text0: UTF8String, n: Int): ArrayData = {
    val text = text0.toString
    val toks = text.split(" ", -1)
    val md = mdTL.get()
    def hashOf(s: String): Long = {
      val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      (((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
        ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)) % P
    }
    val rows: Array[Any] =
      if (toks.length >= n) {
        val out = new Array[Any](toks.length - n + 1)
        val sb = new java.lang.StringBuilder()
        var i = 0
        while (i + n <= toks.length) {
          sb.setLength(0)
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(toks(i + j))
            j += 1
          }
          out(i) = new GenericInternalRow(Array[Any](i + 1, hashOf(sb.toString)))
          i += 1
        }
        out
      } else Array[Any](new GenericInternalRow(Array[Any](1, hashOf(text))))
    new GenericArrayData(rows)
  }

  def topShingleRun(text0: UTF8String, n: Int): GenericInternalRow = {
    val text = text0.toString
    val toks = text.split(" ", -1)
    val shingles: Array[String] =
      if (toks.length >= n) {
        val out = new Array[String](toks.length - n + 1)
        val sb = new java.lang.StringBuilder()
        var i = 0
        while (i + n <= toks.length) {
          sb.setLength(0)
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(toks(i + j))
            j += 1
          }
          out(i) = sb.toString
          i += 1
        }
        out
      } else Array(text)
    java.util.Arrays.sort(shingles, java.util.Comparator.naturalOrder[String]())
    var best = 0L
    var run = 0L
    var i = 0
    while (i < shingles.length) {
      if (i > 0 && shingles(i) == shingles(i - 1)) run += 1 else run = 1
      if (run > best) best = run
      i += 1
    }
    new GenericInternalRow(Array[Any](shingles.length.toLong, best))
  }

  def fingerprint(text: UTF8String): Long = {
    val toks = text.toString.split(" ", -1)
    var acc = 7L
    var i = 0
    while (i < toks.length) {
      val h = xx(toks(i))
      val th = { val m = h % 1000003L; if (m < 0) m + 1000003L else m }
      acc = (acc * 31L + th) % 1000000007L
      i += 1
    }
    acc
  }

  def md5Fingerprint(text: UTF8String): Long = {
    val toks = text.toString.split(" ", -1)
    val md = mdTL.get()
    var acc = 7L
    var i = 0
    while (i < toks.length) {
      val d = md.digest(toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val h = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
        ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
      acc = (acc * 31L + h % 1000003L) % 1000000007L
      i += 1
    }
    acc
  }
}

/** Binary-search membership in a SORTED array<long> — the probe side
  * of a broadcast hash-set scan without the O(|set|) linear walk
  * `array_contains` does per call: decontamScrub probes every n-gram
  * position of every document against the benchmark hash set, so a
  * 10k-token doc × a 100k-hash multi-benchmark suite is 1e9 long
  * compares under array_contains and ~1.7e5 under log2. The array
  * MUST be ascending (callers build it with sort_array); unsorted
  * input gives garbage, not an error — this is a kernel, not a
  * validator. Null-safe via UnaryExpression-style null propagation. */
case class SortedContainsExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, false), LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (ArrayType(LongType, true), LongType) =>
        // ArrayData.getLong reads a null slot as 0 — silently wrong
        // membership, so nullable-element arrays are a type error, not
        // a runtime hazard (callers build via sort_array(collect_set)).
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "sorted_contains needs array<bigint> with non-null elements " +
            "(containsNull=true would binary-search over 0-read null slots)")
      case (l, r) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"sorted_contains needs (array<bigint>, bigint), got ($l, $r)")
    }
  // doGenCode (round 15): pure primitive binary search — inlined into
  // the generated stage like the arithmetic kernels, so the probe scan
  // (decontamScrub: every n-gram position of every doc) stays in one
  // WholeStageCodegen span with no per-call interpreted dispatch.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, x) => {
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      val m = ctx.freshName("m")
      val found = ctx.freshName("found")
      s"""
         |boolean $found = false;
         |int $lo = 0;
         |int $hi = $a.numElements() - 1;
         |while ($lo <= $hi) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  long $m = $a.getLong($mid);
         |  if ($m == $x) { $found = true; break; }
         |  else if ($m < $x) $lo = $mid + 1;
         |  else $hi = $mid - 1;
         |}
         |${ev.value} = $found;
       """.stripMargin
    })
  override def nullSafeEval(arr: Any, x: Any): Any = {
    val a = arr.asInstanceOf[ArrayData]
    val v = x.asInstanceOf[Long]
    var lo = 0
    var hi = a.numElements() - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val m = a.getLong(mid)
      if (m == v) return true
      else if (m < v) lo = mid + 1
      else hi = mid - 1
    }
    false
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Binary-search VALUE lookup over parallel sorted-key/value long
  * arrays — the O(log B) form of `element_at(map, key)`, whose
  * ArrayBasedMapData implementation is a LINEAR scan: the streaming
  * IVFADC serve path evaluates m code-distance lookups per candidate
  * row against a ~(m·Kb)-entry per-query LUT, so a 20k-query soak at
  * Kb=256 is ~50e9 key compares under the map form and ~5e8 under
  * log2 (measured 17× end-to-end, SCALE.md §7). Same contract family
  * as [[SortedContainsExpr]]: `keys` MUST be ascending and parallel to
  * `vals` (callers build both from one array_sort'd struct array);
  * unsorted input gives garbage, not an error. Returns NULL when the
  * key is absent — exactly `element_at(map, key)`'s semantics, so the
  * swap is result-identical. */
case class SortedLookupExpr(keys: Expression, vals: Expression,
    key: Expression) extends TernaryExpression {
  override def first: Expression = keys
  override def second: Expression = vals
  override def third: Expression = key
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (keys.dataType, vals.dataType, key.dataType) match {
      // containsNull=true is admitted because the natural builders
      // (transform over struct getFields) type their results nullable
      // even when values never are; an ACTUAL null slot fails loudly
      // at eval rather than silently binary-searching 0-reads (the
      // SortedContainsExpr concern, enforced at runtime here)
      case (ArrayType(LongType, _), ArrayType(LongType, _), LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(
          s"sorted_lookup needs (array<bigint>, array<bigint>, bigint), got ($a, $b, $c)")
    }
  // doGenCode — the [[DocTfExpr]] stance: generated code calls the
  // SAME static helper as the interpreted path (boxed return carries
  // the absent-key NULL), keeping the serve stage in one codegen span.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (ks, vs, x) => {
      val r = ctx.freshName("r")
      s"""
         |java.lang.Long $r =
         |  graft.functions.ProbeKernels.sortedLookup($ks, $vs, $x);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })
  override def nullSafeEval(ks: Any, vs: Any, x: Any): Any =
    ProbeKernels.sortedLookup(ks.asInstanceOf[ArrayData],
      vs.asInstanceOf[ArrayData], x.asInstanceOf[Long])
  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(keys = newFirst, vals = newSecond, key = newThird)
}

/** Fused ADC distance: the whole per-candidate asymmetric-distance sum
  * `Σ_sub lut[sub·keyBase + codes[sub]]` as ONE kernel eval — the
  * [[SortedLookupExpr]] binary search per subspace, without the
  * per-subspace `aggregate()` HOF lambda machinery (one kernel call
  * per candidate row instead of m interpreted lambda frames + m calls;
  * the sf1 serve soak measured the HOF form at 148 queries/s and this
  * fusion above it — SCALE.md §7). NULL when any code's key is absent
  * (the `acc + null` propagation of the HOF form) or any code slot is
  * null — result-identical to the unfused chain, StreamingCurationSpec
  * pins stream == batch across the swap. */
case class AdcSumExpr(keys: Expression, vals: Expression,
    codes: Expression, keyBase: Expression)
    extends QuaternaryExpression {
  override def first: Expression = keys
  override def second: Expression = vals
  override def third: Expression = codes
  override def fourth: Expression = keyBase
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (keys.dataType, vals.dataType, codes.dataType, keyBase.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _),
          ArrayType(LongType, _), LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (a, b, c, d) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure("adc_sum needs (array<bigint>, array<bigint>, " +
          s"array<bigint>, bigint), got ($a, $b, $c, $d)")
    }
  // doGenCode — see [[SortedLookupExpr]]: same static helper on both
  // paths, boxed return carries the absent/null-poisoned NULL.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (ks, vs, cs, kb) => {
      val r = ctx.freshName("r")
      s"""
         |java.lang.Long $r =
         |  graft.functions.ProbeKernels.adcSum($ks, $vs, $cs, $kb);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })
  override def nullSafeEval(ks: Any, vs: Any, cs: Any, kb: Any): Any =
    ProbeKernels.adcSum(ks.asInstanceOf[ArrayData],
      vs.asInstanceOf[ArrayData], cs.asInstanceOf[ArrayData],
      kb.asInstanceOf[Long])
  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression,
      newFourth: Expression): Expression =
    copy(keys = newFirst, vals = newSecond, codes = newThird,
      keyBase = newFourth)
}

/** Whole-list ADC top-k: the real IVFADC inner loop as one kernel
  * eval per (query, probed list) — scan the list's PACKED member
  * codes, compute each member's asymmetric distance via binary-search
  * LUT lookups ([[AdcSumExpr]]'s arithmetic), and keep the k smallest
  * by the (adist, vec_id) total order. This replaces materializing a
  * row PER (query, candidate): the join-then-aggregate form copies the
  * (m·Kb)-entry LUT arrays into every candidate row (~16 KB × |list|
  * per query at Kb=256 — the sf1 soak measured that form at 148-156
  * queries/s), where the packed form attaches each list's member
  * array once and emits k structs. Members equal to `qId` are
  * skipped (the chain's vec_id != q_id filter); a member whose code
  * key is absent from the LUT is skipped (the unfused chain nulls its
  * adist, which the downstream min-k aggregate likewise never
  * selects). Output order is ascending (adist, vec_id); the
  * cross-list merge is the same `graft_topk_min` aggregate, so
  * serving results are identical (StreamingCurationSpec pins stream
  * == batch across the swap).
  *
  * children: (lkeys, lvals, members, qId, keyBase, k) where members is
  * array<struct<vec_id: long, codes: array<long>>> and k is a literal. */
case class AdcTopKExpr(children: Seq[Expression])
    extends Expression {
  require(children.size == 6, "adc_topk(lkeys, lvals, members, qId, keyBase, k)")
  private val outStruct = StructType(Seq(
    StructField("adist", LongType, nullable = false),
    StructField("vec_id", LongType, nullable = false)))
  override def dataType: DataType = ArrayType(outStruct, containsNull = false)
  override def nullable: Boolean = true
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (children(0).dataType, children(1).dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) => true
      case _ => false
    }
    val membersOk = children(2).dataType match {
      case ArrayType(StructType(fs), _) if fs.length == 2 &&
        fs(0).dataType == LongType &&
        fs(1).dataType.isInstanceOf[ArrayType] => true
      case _ => false
    }
    if (ok && membersOk && children(3).dataType == LongType &&
      children(4).dataType == LongType && children(5).dataType == IntegerType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"adc_topk signature mismatch: ${children.map(_.dataType)}")
  }
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val ks = children(0).eval(input)
    val vs = children(1).eval(input)
    val ms = children(2).eval(input)
    val qi = children(3).eval(input)
    val kb = children(4).eval(input)
    val kk = children(5).eval(input)
    if (ks == null || vs == null || ms == null || qi == null ||
      kb == null || kk == null) return null
    ProbeKernels.adcTopK(ks.asInstanceOf[ArrayData],
      vs.asInstanceOf[ArrayData], ms.asInstanceOf[ArrayData],
      qi.asInstanceOf[Long], kb.asInstanceOf[Long], kk.asInstanceOf[Int])
  }
  // doGenCode — see [[SortedLookupExpr]]: generated code calls the SAME
  // static helper as eval (any-null-child → NULL, matching eval above).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val evs = children.map(_.genCode(ctx))
    val childCode = evs.map(_.code).reduce(_ + _)
    val anyNull = evs.map(_.isNull.code).mkString(" || ")
    val jt = org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
      .javaType(dataType)
    val callArgs = evs.map(_.value.code).mkString(", ")
    ev.copy(code = childCode + code"""
      |boolean ${ev.isNull} = true;
      |$jt ${ev.value} = null;
      |if (!($anyNull)) {
      |  ${ev.isNull} = false;
      |  ${ev.value} = graft.functions.ProbeKernels.adcTopK($callArgs);
      |}
    """.stripMargin)
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

/** The shared bodies of the probe kernels ([[SortedLookupExpr]],
  * [[AdcSumExpr]], [[AdcTopKExpr]]) — the [[DocKernels]] discipline:
  * ONE implementation called by both the interpreted eval and the
  * generated code. Boxed returns carry the NULL semantics (absent key,
  * null-poisoned slot) across both paths identically; bodies are
  * verbatim moves of the former per-expression eval code. */
object ProbeKernels {
  /** Binary-search value lookup; null when the key is absent or its
    * value slot is null. Throws on a null KEY slot (contract breach). */
  def sortedLookup(ka: ArrayData, va: ArrayData, v: Long): java.lang.Long = {
    var lo = 0
    var hi = ka.numElements() - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (ka.isNullAt(mid))
        throw new IllegalArgumentException(
          "graft_sorted_lookup: null key slot — the keys array must be " +
            "null-free and ascending")
      val m = ka.getLong(mid)
      if (m == v) {
        if (va.isNullAt(mid)) return null
        return java.lang.Long.valueOf(va.getLong(mid))
      }
      else if (m < v) lo = mid + 1
      else hi = mid - 1
    }
    null
  }

  /** Fused ADC distance; null when any code slot is null or any code
    * key is absent (the `acc + null` propagation of the HOF form). */
  def adcSum(ka: ArrayData, va: ArrayData, ca: ArrayData,
      base: Long): java.lang.Long = {
    var acc = 0L
    var sub = 0
    while (sub < ca.numElements()) {
      if (ca.isNullAt(sub)) return null
      val key = sub.toLong * base + ca.getLong(sub)
      var lo = 0
      var hi = ka.numElements() - 1
      var found = false
      while (lo <= hi && !found) {
        val mid = (lo + hi) >>> 1
        if (ka.isNullAt(mid))
          throw new IllegalArgumentException(
            "graft_adc_sum: null key slot — the keys array must be " +
              "null-free and ascending")
        val m = ka.getLong(mid)
        if (m == key) {
          if (va.isNullAt(mid)) return null
          acc += va.getLong(mid)
          found = true
        }
        else if (m < key) lo = mid + 1
        else hi = mid - 1
      }
      if (!found) return null
      sub += 1
    }
    java.lang.Long.valueOf(acc)
  }

  /** Whole-list ADC top-k — [[AdcTopKExpr]]'s row body. */
  def adcTopK(ka: ArrayData, va: ArrayData, members: ArrayData,
      qId: Long, base: Long, k: Int): ArrayData = {
    // bounded selection: k is small (serving top-k), so an insertion
    // pass into parallel arrays beats heap overhead
    val topD = new Array[Long](k)
    val topV = new Array[Long](k)
    var n = 0
    def lookup(key: Long): Long = {
      var lo = 0
      var hi = ka.numElements() - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        if (ka.isNullAt(mid))
          throw new IllegalArgumentException(
            "graft_adc_topk: null key slot — keys must be null-free ascending")
        val m = ka.getLong(mid)
        if (m == key) {
          if (va.isNullAt(mid)) return Long.MinValue
          return va.getLong(mid)
        }
        else if (m < key) lo = mid + 1
        else hi = mid - 1
      }
      Long.MinValue // absent: candidate skipped, like the nulled adist
    }
    var i = 0
    while (i < members.numElements()) {
      if (!members.isNullAt(i)) {
        val mrow = members.getStruct(i, 2)
        val vecId = mrow.getLong(0)
        if (vecId != qId && !mrow.isNullAt(1)) {
          val codes = mrow.getArray(1)
          var acc = 0L
          var ok = true
          var sub = 0
          while (ok && sub < codes.numElements()) {
            if (codes.isNullAt(sub)) ok = false
            else {
              val d = lookup(sub.toLong * base + codes.getLong(sub))
              if (d == Long.MinValue) ok = false else acc += d
            }
            sub += 1
          }
          if (ok && (n < k || acc < topD(n - 1) ||
            (acc == topD(n - 1) && vecId < topV(n - 1)))) {
            // insertion by the (adist, vec_id) total order
            var pos = if (n < k) n else k - 1
            while (pos > 0 && (topD(pos - 1) > acc ||
              (topD(pos - 1) == acc && topV(pos - 1) > vecId))) {
              topD(pos) = topD(pos - 1); topV(pos) = topV(pos - 1); pos -= 1
            }
            topD(pos) = acc; topV(pos) = vecId
            if (n < k) n += 1
          }
        }
      }
      i += 1
    }
    val out = new Array[Any](n)
    var j = 0
    while (j < n) {
      out(j) = new GenericInternalRow(Array[Any](topD(j), topV(j)))
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** Repetition-dominance kernel: word n-gram shingles of a text column
  * (same tokenizer and shingling as [[ShingleHashesExpr]], but
  * NON-distinct — occurrence counts are the signal), returned as
  * struct(n_tri, top_count) where top_count is the most frequent
  * shingle's occurrence count (longest equal run of the sorted
  * shingles). Texts shorter than n tokens fall back to the whole text
  * as one shingle. Equivalent SQL (pinned by ScalaTest): the
  * array_sort + named_struct run-length fold in
  * TextAnalysis.repetitionSql — ~6 interpreted lambda nodes per
  * shingle; this kernel is one eval per row. */
case class TopShingleRunExpr(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_tri", LongType, nullable = false),
    StructField("top_count", LongType, nullable = false)))
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case StringType =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"top_shingle_run needs string, got $t")
  }
  // doGenCode — see [[ShingleHashesExpr]]: same static helper on both
  // paths, scan stage stays in one WholeStageCodegen span
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.topShingleRun($c, $n);")
  override def nullSafeEval(v: Any): Any =
    TextKernels.topShingleRun(v.asInstanceOf[UTF8String], n)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One greedy left-to-right BPE merge application over a token array:
  * each adjacent (a, b) occurrence collapses into the single token
  * "a b", and a token produced by a merge is never reused within the
  * same pass — "b b b" under merge (b, b) yields ["b b", "b"], the
  * standard single-pass semantics. Replaces an aggregate() HOF fold
  * whose array accumulator was rebuilt via concat/slice per token —
  * O(n²) copy work per document per induction round; this kernel is
  * one O(n) scan. Result-identical to the fold (the fold's "last
  * emitted token equals a" test can only fire on an original token:
  * a just-merged token is "a b", which never equals a). Null tokens
  * (not produced by the tokenizer, but legal in the array type) pass
  * through unmerged. */
case class BpeMergeExpr(tokens: Expression, a: Expression, b: Expression)
    extends TernaryExpression {
  override def first: Expression = tokens
  override def second: Expression = a
  override def third: Expression = b
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (tokens.dataType, a.dataType, b.dataType) match {
      case (ArrayType(StringType, _), StringType, StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_merge needs (array<string>, string, string), got $t")
    }
  // doGenCode — the [[DocTfExpr]] stance: same static helper on both
  // paths, stage stays in one WholeStageCodegen span.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (tv, av, bv) =>
      s"${ev.value} = graft.functions.BpeKernels.merge($tv, $av, $bv);")
  override def nullSafeEval(tv: Any, av: Any, bv: Any): Any =
    BpeKernels.merge(tv.asInstanceOf[ArrayData],
      av.asInstanceOf[UTF8String], bv.asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(tokens = newFirst, a = newSecond, b = newThird)
}

/** Greedy BPE ENCODE: fold a whole TRAINED merge table (array of
  * (a, b) structs in rank order — [[graft.llm.TextAnalysis.bpeInduce]]'s
  * output convention, merged token = `a + " " + b`) over a token
  * sequence, one left-to-right single pass per merge — in ONE
  * expression eval instead of a rank-deep applyMerge plan chain.
  *
  * Semantics are EXACTLY the induce loop's application order (each
  * round is one [[BpeMergeExpr]] pass, never re-applying an earlier
  * rank unless a later rank recreates its pair and the table lists it
  * again): a document the trainer saw re-encodes to precisely the
  * token state induction left it in — the training-consistency
  * invariant the ScalaTest pin states. Complexity is O(n) per APPLIED
  * merge plus one hash probe per table rank (the adjacent-pair set
  * makes skipped ranks O(1)), so a 30k-rank vocabulary costs ~30k
  * probes per doc, not 30k passes.
  *
  * Generated code calls the SAME static helper as the interpreted
  * path ([[BpeKernels.encode]]): the tokenizer family's cost is UTF8
  * comparison inside this loop, which generated code would call out
  * to anyway — keeping the stage fused removes only the per-row
  * interpreted-dispatch wrapper. */
case class BpeEncodeExpr(tokens: Expression, merges: Expression)
    extends BinaryExpression {
  override def left: Expression = tokens
  override def right: Expression = merges
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (tokens.dataType, merges.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StructType(fs), _))
          if fs.length == 2 && fs.forall(_.dataType == StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_encode needs (array<string>, array<struct<string,string>>), got $t")
    }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (tv, mv) =>
      s"${ev.value} = graft.functions.BpeKernels.encode($tv, $mv);")
  override def nullSafeEval(tv: Any, mv: Any): Any =
    BpeKernels.encode(tv.asInstanceOf[ArrayData], mv.asInstanceOf[ArrayData])
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(tokens = newLeft, merges = newRight)
}

/** The shared bodies of the BPE kernels ([[BpeMergeExpr]],
  * [[BpeEncodeExpr]]) — the [[DocKernels]] discipline: ONE
  * implementation called by both the interpreted eval and the
  * generated code. Bodies are verbatim moves of the former
  * per-expression eval code. */
object BpeKernels {
  /** One greedy left-to-right merge pass — [[BpeMergeExpr]]'s body. */
  def merge(arr: ArrayData, aStr: UTF8String, bStr: UTF8String): ArrayData = {
    val n = arr.numElements()
    lazy val merged = UTF8String.concat(aStr, UTF8String.fromString(" "), bStr)
    val out = new java.util.ArrayList[UTF8String](n)
    var i = 0
    while (i < n) {
      val t = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      val u = if (i + 1 < n && !arr.isNullAt(i + 1)) arr.getUTF8String(i + 1) else null
      if (t != null && u != null && t == aStr && u == bStr) {
        out.add(merged)
        i += 2
      } else {
        out.add(t)
        i += 1
      }
    }
    new GenericArrayData(out.toArray(new Array[AnyRef](out.size())))
  }

  /** Greedy whole-table BPE encode — [[BpeEncodeExpr]]'s body. */
  def encode(arr: ArrayData, table: ArrayData): ArrayData = {
    val n0 = arr.numElements()
    var toks = new java.util.ArrayList[UTF8String](n0)
    var i = 0
    while (i < n0) {
      toks.add(if (arr.isNullAt(i)) null else arr.getUTF8String(i))
      i += 1
    }
    // adjacent-pair presence set; rebuilt only after an APPLIED merge
    def pairSet(ts: java.util.ArrayList[UTF8String])
        : java.util.HashSet[(UTF8String, UTF8String)] = {
      val s = new java.util.HashSet[(UTF8String, UTF8String)](ts.size() * 2)
      var j = 0
      while (j + 1 < ts.size()) {
        val a = ts.get(j); val b = ts.get(j + 1)
        if (a != null && b != null) s.add((a, b))
        j += 1
      }
      s
    }
    var present = pairSet(toks)
    val m = table.numElements()
    var r = 0
    while (r < m) {
      val row = if (table.isNullAt(r)) null
        else table.getStruct(r, 2)
      if (row != null && !row.isNullAt(0) && !row.isNullAt(1)) {
        val a = row.getUTF8String(0)
        val b = row.getUTF8String(1)
        if (present.contains((a, b))) {
          // one merge pass: merge every occurrence, skip 2
          val merged = UTF8String.concat(a, UTF8String.fromString(" "), b)
          val out = new java.util.ArrayList[UTF8String](toks.size())
          var j = 0
          while (j < toks.size()) {
            val t = toks.get(j)
            val u = if (j + 1 < toks.size()) toks.get(j + 1) else null
            if (t != null && u != null && t == a && u == b) {
              out.add(merged)
              j += 2
            } else {
              out.add(t)
              j += 1
            }
          }
          toks = out
          present = pairSet(toks)
        }
      }
      r += 1
    }
    new GenericArrayData(toks.toArray(new Array[AnyRef](toks.size())))
  }
}

/** Dot product of two array<float> columns as double. Matches the SQL
  * aggregate(zip_with(a, b, (x,y) -> x*y), 0D, (acc,x) -> acc+x)
  * fold: per-element float multiply, left-to-right double accumulate —
  * deterministic and engine-exact. Length mismatch yields NULL, exactly
  * like the SQL form (zip_with pads the short side with nulls, which
  * null-poisons the fold) — a silently-truncated partial dot product
  * would score malformed vectors plausibly instead of flagging them. */
case class DotProductFExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      // float * float stays a float multiply before the double
      // accumulate — the exact interpreted (and DuckDB-oracle) op order
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $a.getFloat($i) * $b.getFloat($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getFloat(i) * b.getFloat(i); i += 1 }
    acc
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Polynomial rolling-hash fingerprint of a text column's token
  * sequence (TextAnalysis.qFingerprint): tokenize on single spaces
  * (Java split, limit -1 — identical to SQL `split(text, ' ')`), then
  * fold acc = (acc·31 + pmod(xxhash64(token), 1000003)) mod 1e9+7 from
  * acc₀ = 7. Order-sensitive by construction.
  * Equivalent SQL (pinned by ScalaTest):
  *   aggregate(split(text, ' '), CAST(7 AS BIGINT),
  *     (acc, t) -> pmod(acc * 31 + pmod(xxhash64(t), 1000003), 1000000007))
  * The SQL fold evaluates ~6 interpreted expression nodes per token;
  * this kernel is one eval per row. */
case class FingerprintExpr(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case StringType =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"fingerprint needs string, got $t")
  }
  // doGenCode — see [[ShingleHashesExpr]]: same static helper on both
  // paths, scan stage stays in one WholeStageCodegen span
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.fingerprint($c);")
  override def nullSafeEval(v: Any): Any =
    TextKernels.fingerprint(v.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Cross-engine-verifiable variant of [[FingerprintExpr]]: the
  * per-token hash is the first 4 bytes of MD5 (unsigned, big-endian)
  * mod 1000003 instead of xxhash64 — MD5 exists in every engine, so
  * the whole rolling hash is DuckDB-oracle-checkable.
  * Equivalent SQL (pinned by ScalaTest):
  *   aggregate(split(text, ' '), CAST(7 AS BIGINT), (acc, t) ->
  *     pmod(acc * 31 + pmod(CAST(conv(substring(md5(t), 1, 8), 16, 10)
  *       AS BIGINT), 1000003), 1000000007)) */
case class Md5FingerprintExpr(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  // doGenCode — see [[ShingleHashesExpr]]: same static helper on both
  // paths, scan stage stays in one WholeStageCodegen span
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.md5Fingerprint($c);")
  override def nullSafeEval(v: Any): Any =
    TextKernels.md5Fingerprint(v.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Exact integer geometry over two array<int> columns (the quantized
  * embedding domain): squared L2 distance and dot product as longs.
  * Semantics identical to the SQL zip_with/aggregate folds they replace
  * (Similarity.kmeansStep documents both; pinned by ScalaTest) —
  * length mismatch null-poisons exactly like zip_with's null padding.
  * One eval per (vector, centroid) pair instead of ~6 interpreted
  * nodes per dimension — the n×k assignment scoring is the k-means
  * hot loop. */
case class IntL2Expr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  // doGenCode (round 15): pure integer arithmetic — inlined into the
  // generated stage like [[DotProductFExpr]]. The n×k k-means
  // assignment scoring and the PQ codebook training loop evaluate this
  // once per (vector, centroid) pair; the interpreted wrapper was the
  // hottest non-codegen dispatch in the ANN family.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $d = (long) ($a.getInt($i) - $b.getInt($i));
         |    $acc += $d * $d;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = (a.getInt(i) - b.getInt(i)).toLong
      acc += d * d
      i += 1
    }
    acc
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class IntDotExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  // doGenCode — see [[IntL2Expr]]
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += (long) $a.getInt($i) * (long) $b.getInt($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) { acc += a.getInt(i).toLong * b.getInt(i); i += 1 }
    acc
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Symmetric int8 scalar quantization of an array<float> embedding:
  * q_i = floor(x_i / s · 127 + 0.5) with s = max |x_i|, zeros when
  * s = 0. One pass for the max, one for the emit — replaces the
  * two interpreted higher-order `transform`s of the SQL formulation
  * (Similarity.quantizeSql, pinned bit-for-bit by ScalaTest on the
  * corpus: float→double promotion, correctly rounded divide/multiply,
  * exact floor — identical IEEE sequences). */
case class QuantizeExpr(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"quantize needs array<float>, got $t")
  }
  // doGenCode — pure float/double arithmetic inlined like
  // [[MinHashSigExpr]]; the IEEE op sequence is byte-identical to the
  // interpreted loop (float abs/compare, double divide/multiply,
  // Math.floor), so both paths stay pinned by the same golden values.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val a = ctx.freshName("a")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      s"""
         |int $n = $c.numElements();
         |float $s = 0f;
         |for (int $i = 0; $i < $n; $i++) {
         |  float $a = Math.abs($c.getFloat($i));
         |  if ($a > $s) $s = $a;
         |}
         |int[] $out = new int[$n];
         |if ($s != 0f) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    $out[$i] = (int) Math.floor(
         |      ((double) $c.getFloat($i)) / ((double) $s) * 127.0 + 0.5);
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions
         |  .UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })
  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var s = 0f
    var i = 0
    while (i < n) {
      val a = math.abs(arr.getFloat(i))
      if (a > s) s = a
      i += 1
    }
    val out = new Array[Int](n)
    if (s != 0f) {
      i = 0
      while (i < n) {
        out(i) = math.floor(arr.getFloat(i).toDouble / s.toDouble * 127.0 + 0.5).toInt
        i += 1
      }
    }
    // primitive-backed — the quantized vectors feed graft_l2_int /
    // graft_dot_int n×k loops; see [[TextKernels.shingleHashes]]
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Sign-LSH signature of an array<float> embedding against `bits`
  * deterministic pseudo-random hyperplanes: bit b = [dot(v, plane_b)
  * >= 0], packed into a long. Planes are the same splitmix-style
  * derivation as Similarity.hyperplanes (component (b,d) =
  * mix(seed + b*10007 + d), mapped into [-0.5, 0.5)), so this kernel
  * is bit-identical to the SQL aggregate/zip_with formulation it
  * replaces — including the SQL's null-poisoning on a dimension
  * mismatch, which maps every bit to 0. */
case class SignLshExpr(child: Expression, bits: Int, dim: Int, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
      val sig = ctx.freshName("sig")
      val pl = ctx.freshName("pl")
      val acc = ctx.freshName("acc")
      val b = ctx.freshName("b")
      val d = ctx.freshName("d")
      s"""
         |if ($c.numElements() != $dim) {
         |  ${ev.value} = 0L;
         |} else {
         |  long $sig = 0L;
         |  for (int $b = 0; $b < $bits; $b++) {
         |    double[] $pl = $planesRef[$b];
         |    double $acc = 0.0;
         |    for (int $d = 0; $d < $dim; $d++) {
         |      $acc += $c.getFloat($d) * $pl[$d];
         |    }
         |    if ($acc >= 0) $sig |= (1L << $b);
         |  }
         |  ${ev.value} = $sig;
         |}
       """.stripMargin
    })
  @transient private lazy val planes: Array[Array[Double]] = {
    def mix(z0: Long): Double = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z = z ^ (z >>> 31)
      (z >>> 11).toDouble / (1L << 53).toDouble - 0.5
    }
    Array.tabulate(bits, dim)((b, d) => mix(seed + b * 10007L + d))
  }
  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    if (arr.numElements() != dim) 0L
    else {
      var sig = 0L
      var b = 0
      while (b < bits) {
        val p = planes(b)
        var acc = 0.0
        var d = 0
        while (d < dim) { acc += arr.getFloat(d) * p(d); d += 1 }
        if (acc >= 0) sig |= (1L << b)
        b += 1
      }
      sig
    }
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The `graft_*` kernel function surface, registerable two ways:
  *  - [[GraftFunctions.register]] — per-session temp functions (what
  *    the query builders call);
  *  - `spark.sql.extensions=graft.GraftExtensions` — cluster-wide
  *    injection at session build time, the idiomatic deployment path
  *    (no code change in the consuming job).
  */
object GraftFunctions {
  type Builder = Seq[Expression] => Expression

  /** A bound/size argument that is anything but an INT literal must
    * fail ANALYSIS, loudly: the historical fallback silently built the
    * aggregate with its default k, so a SQL-first caller passing a
    * BIGINT literal (DuckDB-style `10` parses as BIGINT in some
    * frontends) or a non-literal expression got a wrong-SIZED result
    * with no error (round-8 ADVICE). */
  private def badK(fn: String, es: Seq[Expression]): Throwable =
    new org.apache.spark.sql.AnalysisException(
      errorClass = "DATATYPE_MISMATCH.UNEXPECTED_INPUT_TYPE",
      messageParameters = Map(
        "sqlExpr" -> es.mkString(s"$fn(", ", ", ")"),
        "paramIndex" -> "second",
        "requiredType" -> "INT literal k",
        "inputSql" -> es.drop(1).mkString(", "),
        // an unresolved argument (e.g. a column-reference k reaching
        // this builder before reference resolution) has no dataType;
        // formatting must not replace the clean AnalysisException with
        // an UnresolvedException from the message builder itself
        "inputType" -> es.drop(1).map(e =>
          if (e.resolved) e.dataType.sql else "?").mkString(", ")))

  val builders: Seq[(String, Builder)] = Seq(
    "graft_simhash64" -> (es => SimHash64Expr(es.head)),
    "graft_minhash_sig" -> {
      case Seq(c, Literal(n: Int, IntegerType)) => MinHashSigExpr(c, n)
      case es => MinHashSigExpr(es.head, 64)
    },
    "graft_dot" -> (es => DotProductFExpr(es(0), es(1))),
    "graft_shingle_hashes" -> {
      case Seq(c, Literal(n: Int, IntegerType), Literal(m: Boolean, BooleanType)) =>
        ShingleHashesExpr(c, n, m)
      case es => ShingleHashesExpr(es.head, 3, modP = true)
    },
    "graft_minhash_agg" -> {
      case Seq(c, Literal(n: Int, IntegerType)) => MinHashAggExpr(c, n)
      case es => MinHashAggExpr(es.head, 64)
    },
    "graft_collect_capped" -> {
      case Seq(c, Literal(n: Int, IntegerType)) => BoundedCollectAggExpr(c, n)
      case Seq(c) => BoundedCollectAggExpr(c, 100)
      case es => throw badK("graft_collect_capped", es)
    },
    "graft_topk_min" -> {
      case Seq(c, Literal(n: Int, IntegerType)) => TopKMinAggExpr(c, n)
      case Seq(c) => TopKMinAggExpr(c, 10)
      case es => throw badK("graft_topk_min", es)
    },
    "graft_sum_topk" -> {
      case Seq(c, Literal(n: Int, IntegerType)) => SumTopKAggExpr(c, n)
      case Seq(c) => SumTopKAggExpr(c, 10)
      case es => throw badK("graft_sum_topk", es)
    },
    "graft_rrf_fuse" -> {
      case Seq(c, Literal(n: Int, IntegerType)) => RrfFuseAggExpr(c, n)
      case Seq(c) => RrfFuseAggExpr(c, 10)
      case es => throw badK("graft_rrf_fuse", es)
    },
    "graft_bpe_encode" -> (es => BpeEncodeExpr(es(0), es(1))),
    "graft_shingle_hashes_md5" -> {
      case Seq(c, Literal(n: Int, IntegerType), Literal(m: Boolean, BooleanType)) =>
        Md5ShingleHashesExpr(c, n, m)
      case es => Md5ShingleHashesExpr(es.head, 3, modP = true)
    },
    "graft_shingle_pos_md5" -> {
      case Seq(c, Literal(n: Int, IntegerType)) => Md5ShinglePosExpr(c, n)
      case es => Md5ShinglePosExpr(es.head, 10)
    },
    "graft_doc_tf" -> (es => DocTfExpr(es.head)),
    "graft_doc_pos" -> (es => DocPositionsExpr(es.head)),
    "graft_sorted_contains" -> (es => SortedContainsExpr(es(0), es(1))),
    "graft_sorted_lookup" -> (es => SortedLookupExpr(es(0), es(1), es(2))),
    "graft_adc_sum" -> (es => AdcSumExpr(es(0), es(1), es(2), es(3))),
    "graft_adc_topk" -> (es => AdcTopKExpr(es)),
    // Spark's internal bloom-filter pair (the runtime-filter machinery,
    // not exposed in the public function registry): a distributed
    // build over long keys + the codegen'd membership probe. Registered
    // here for the historical-dedup prefilter (TextDedup.newAgainstHistory).
    "graft_bloom_agg" -> {
      case Seq(c, Literal(n: Long, LongType)) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(c, n)
      case es =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(es.head)
    },
    "graft_bloom_might_contain" -> (es =>
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(es(0), es(1))),
    "graft_fingerprint" -> (es => FingerprintExpr(es.head)),
    "graft_fingerprint_md5" -> (es => Md5FingerprintExpr(es.head)),
    "graft_quantize" -> (es => QuantizeExpr(es.head)),
    "graft_l2_int" -> (es => IntL2Expr(es(0), es(1))),
    "graft_dot_int" -> (es => IntDotExpr(es(0), es(1))),
    "graft_bpe_merge" -> (es => BpeMergeExpr(es(0), es(1), es(2))),
    "graft_top_shingle_run" -> {
      case Seq(c, Literal(n: Int, IntegerType)) => TopShingleRunExpr(c, n)
      case es => TopShingleRunExpr(es.head, 3)
    },
    "graft_signlsh" -> {
      case Seq(c, Literal(b: Int, IntegerType), Literal(d: Int, IntegerType),
          Literal(s: Long, LongType)) => SignLshExpr(c, b, d, s)
      case Seq(c, Literal(b: Int, IntegerType), Literal(d: Int, IntegerType)) =>
        SignLshExpr(c, b, d, 42L)
      case es => SignLshExpr(es.head, 16, 64, 42L)
    },
    "graft_heavy_hitters" -> {
      case Seq(c, Literal(cap: Int, IntegerType), Literal(kk: Int, IntegerType)) =>
        HeavyHittersAggExpr(c, cap, kk)
      case Seq(c) => HeavyHittersAggExpr(c, 65536, 20)
      case es =>
        // capacity/k ARE the sketch's precision contract — silently
        // substituting defaults on a bad call shape would change
        // results, not fail the query
        throw new IllegalArgumentException(
          "graft_heavy_hitters expects (item) or (item, capacity, k) " +
            s"with INT literal capacity/k, got ${es.size} argument(s)")
    })

  /** Session registration; idempotent, call before using the
    * `graft_*` kernels in plans (via expr(...) or call_udf).
    * Skips names already present so repeat calls from every query
    * builder are true no-ops — createOrReplaceTempFunction logs a
    * "replaced a previously registered function" warning per call,
    * and those warnings flooded (and nearly truncated) the driver's
    * captured bench tail in round 3. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, b) =>
      if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(name))) {
        reg.createOrReplaceTempFunction(name, b, "scala_udf")
      }
    }
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.{Similarity, TempCache}

/** Fixed-K IVF-PQ encode throughput across data tiers — the
  * measurement behind SCALE.md's claim that the sf1 bench's >10× PQ
  * ratios are a bench-config artifact (stride-seeded codebooks couple
  * K to corpus size, so the ORACLE-REPLAYABLE configuration's encode
  * grows as n·K ∝ n²/stride) while a deployment's fixed-K encode is
  * linear in n. Trains with strides derived from the corpus count so
  * K (coarse lists) and Kb (entries per subspace book) stay CONSTANT
  * across tiers, then times [[Similarity.ivfPqEncode]] of the full
  * corpus to completion (count of the materialized code table).
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.tools.EncodeBench
  *
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_K (coarse
  * lists, default 64), SPARK_GRAFT_KB (book entries, default 256),
  * SPARK_GRAFT_M (subspaces, default 4), SPARK_GRAFT_ITERS (default 0 —
  * training cost is the same per-round shape; encode is what scales
  * with the corpus). SPARK_GRAFT_DELTA_PCT (default 0): when > 0,
  * additionally times [[Similarity.ivfPqEncodeIncremental]] with that
  * percentage of the corpus as the not-yet-encoded delta against a
  * pre-built stored table — the nightly-job cost, which should track
  * the delta fraction, not the corpus. Prints one JSON line.
  */
object EncodeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val k = sys.env.getOrElse("SPARK_GRAFT_K", "64").toInt
    val kb = sys.env.getOrElse("SPARK_GRAFT_KB", "256").toInt
    val m = sys.env.getOrElse("SPARK_GRAFT_M", "4").toInt
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "0").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val vecs = graft.Tables.load(spark, sfDir, "embeddings")
    val n = vecs.count()
    // fixed K/Kb across tiers: stride grows with n instead
    val coarseStride = math.max(1L, n / k).toInt
    val bookStride = math.max(1L, n / kb).toInt
    val temps = new TempCache
    val (coarse0, books0) = Similarity.ivfPqTrain(vecs, coarseStride, m,
      dim = 64, bookStride, iters = iters, temps = temps)
    val coarse = coarse0.localCheckpoint(true)
    val books = books0.localCheckpoint(true)
    temps.release()
    val nLists = coarse.count()
    val nBook = books.count()
    // timed region: the rebuild — encode the full corpus, write-
    // equivalent materialization (count touches every code row)
    val t0 = System.nanoTime()
    val nCodes = Similarity.ivfPqEncode(vecs, coarse, books, m, dim = 64)
      .count()
    val sec = (System.nanoTime() - t0) / 1e9
    val deltaPct = sys.env.getOrElse("SPARK_GRAFT_DELTA_PCT", "0").toInt
    val deltaJson = if (deltaPct > 0) {
      // stored table = the corpus minus a deltaPct% slice, frozen the
      // way a nightly table is (materialized, not lineage)
      val stored = Similarity.ivfPqEncode(
        vecs.filter(pmod(col("vec_id"), lit(100)) >= deltaPct),
        coarse, books, m, dim = 64).localCheckpoint(true)
      val t1 = System.nanoTime()
      val nInc = Similarity.ivfPqEncodeIncremental(stored, vecs, coarse,
        books, m, dim = 64).count()
      val isec = (System.nanoTime() - t1) / 1e9
      s""","delta_pct":$deltaPct,"inc_encoded":$nInc,""" +
        s""""inc_value":${math.rint(isec * 1000) / 1000}"""
    } else ""
    println(s"""{"metric":"ivfpq_encode","sf":"$sfDir","n":$n,""" +
      s""""lists":$nLists,"book_rows":$nBook,"m":$m,"iters":$iters,""" +
      s""""encoded":$nCodes,"value":${math.rint(sec * 1000) / 1000},""" +
      s""""unit":"sec"$deltaJson}""")
    spark.stop()
  }
}

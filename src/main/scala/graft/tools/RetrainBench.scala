package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.{IvfPqIndex, Similarity, TempCache}

/** Retrain cost vs nightly increment on the EPOCHAL maintained IVF-PQ
  * index — the number behind the drift-alarm policy's economics: an
  * increment pays (delta-sized encode + one generation write), a
  * retrain pays (quantizer training + FULL corpus re-encode + the new
  * epoch's genesis write). The alarm threshold (4× balanced list
  * share) is exactly the knob trading the retrain's O(corpus) cost
  * against the per-query serving degradation a skewed quantizer
  * causes — this bench quantifies both sides' denominator.
  *
  * Shape: genesis = 99% of the corpus, one nightly increment = the
  * remaining 1% (timed), then one full retrain over the whole corpus
  * (timed: ivfPqTrain + ivfPqEncode + atomic epoch cutover). Fixed
  * K/Kb across tiers (the EncodeBench stance: strides derived from n).
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.tools.RetrainBench
  *
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_K,
  * SPARK_GRAFT_KB, SPARK_GRAFT_M, SPARK_GRAFT_ITERS. One JSON line.
  */
object RetrainBench {
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
    val root = java.nio.file.Files
      .createTempDirectory("retrainbench").toString
    val vecs = graft.Tables.load(spark, sfDir, "embeddings")
      .localCheckpoint(true)
    val n = vecs.count()
    val coarseStride = math.max(1L, n / k).toInt
    val bookStride = math.max(1L, n / kb).toInt

    // setup (untimed): epoch 0 over the 99% slice
    val temps = new TempCache
    val base = vecs.filter(pmod(col("vec_id"), lit(100)) >= 1)
    val (coarse, books) = Similarity.ivfPqTrain(base, coarseStride, m,
      dim = 64, bookStride, iters = iters, temps = temps)
    IvfPqIndex.initEpochal(IvfPqIndex(m, 64, coarse, books,
      Similarity.ivfPqEncode(base, coarse, books, m, 64)), root)
    temps.release()

    // the nightly increment: the 1% delta against the committed store
    val t0 = System.nanoTime()
    IvfPqIndex.mergeEpochal(root)(vecs, 0L)
    val incSec = (System.nanoTime() - t0) / 1e9

    // the retrain: fresh quantizer over the FULL corpus, full
    // re-encode, atomic epoch cutover
    val t1 = System.nanoTime()
    val epoch = IvfPqIndex.retrain(spark, root, vecs, coarseStride,
      bookStride, iters = iters)
    val retrainSec = (System.nanoTime() - t1) / 1e9
    val nCodes = IvfPqIndex.loadEpochal(spark, root).codes.count()
    require(epoch == 1L && nCodes == n,
      s"retrain must cut over to a full re-encode: epoch=$epoch n=$nCodes")
    val ratio = math.rint(retrainSec / incSec * 10) / 10
    println(s"""{"metric":"ivfpq_retrain","sf":"$sfDir","n":$n,""" +
      s""""lists":$k,"m":$m,"iters":$iters,""" +
      s""""inc_sec":${math.rint(incSec * 1000) / 1000},""" +
      s""""retrain_sec":${math.rint(retrainSec * 1000) / 1000},""" +
      s""""retrain_over_inc":$ratio,"unit":"sec"}""")
    spark.stop()
  }
}

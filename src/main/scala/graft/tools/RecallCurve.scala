package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.{Similarity, TempCache}

/** IVF-PQ tuning loop as a one-command report: recall@k of the
  * TRAINED multi-probe IVFADC path vs the number of probed lists —
  * the curve an operator reads to pick `probes` for a target recall
  * (SCALE.md records the sf0.1 curve).
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.tools.RecallCurve
  *
  * Config mirrors the deployment shape the oracle'd stride-seed
  * queries approximate: trained coarse quantizer + trained residual
  * codebooks (iters > 0), k = 10, probes swept 1..all-lists. Env:
  * SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_ITERS,
  * SPARK_GRAFT_NQ (query count, default 50).
  */
object RecallCurve {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "2").toInt
    val nq = sys.env.getOrElse("SPARK_GRAFT_NQ", "50").toInt
    val m = sys.env.getOrElse("SPARK_GRAFT_M", "4").toInt
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
    val queries = vecs.filter(col("vec_id") < nq)
    val temps = new TempCache
    val (coarse0, books0) = Similarity.ivfPqTrain(vecs, coarseStride = 100,
      m = m, dim = 64, bookStride = 50, iters = iters, temps = temps)
    // the sweep re-reads the trained index per probe setting: pin both
    // frames so training runs once
    val coarse = coarse0.localCheckpoint(true)
    val books = books0.localCheckpoint(true)
    temps.release()
    val nLists = coarse.count()
    println(s"# sf=$sfDir iters=$iters k=10 nq=$nq lists=$nLists " +
      s"(m=$m dim=64 coarseStride=100 bookStride=50)")
    println(f"${"probes"}%6s ${"mean_recall@10"}%14s")
    Seq(1, 2, 4, 8, 16).filter(_ <= nLists).foreach { probes =>
      val r = Similarity.ivfPqRecall(vecs, queries, k = 10, coarse, books,
        m = m, dim = 64, probes = probes)
        .agg(avg(col("recall"))).collect()(0).getDouble(0)
      println(f"$probes%6d $r%14.4f")
    }
    spark.stop()
  }
}

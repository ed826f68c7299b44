package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.Similarity

/** Refine-stage economics: what the exact re-rank buys (recall@k vs
  * brute-force integer L2) and what it costs (serve wall vs the plain
  * ADC serve at the same probes) — the two numbers behind choosing a
  * `refine` factor. The refine pool removes the PQ-reconstruction
  * loss entirely; the residual miss is ONLY inverted-list pruning, so
  * recall should step up from ADC's and then flatten in `refine`
  * (raising `probes`, not `refine`, is the lever past that point —
  * the q_llm_ivf_stats occupancy card says when).
  *
  * Shape: FIXED-K production config (strides derived from n, the
  * EncodeBench stance), stored codes materialized once, then per
  * refine factor r ∈ {1(=plain ADC), 2, 3, 5}: serve wall (best of
  * `SPARK_GRAFT_REPS`) + mean recall@k over the query sample.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.tools.RefineBench
  *
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_K(=64 coarse),
  * SPARK_GRAFT_KB(=256 book), SPARK_GRAFT_TOPK(=10),
  * SPARK_GRAFT_PROBES(=2), SPARK_GRAFT_NQ(=100 query sample),
  * SPARK_GRAFT_REPS(=3). One JSON line.
  */
object RefineBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val kCoarse = sys.env.getOrElse("SPARK_GRAFT_K", "64").toInt
    val kb = sys.env.getOrElse("SPARK_GRAFT_KB", "256").toInt
    val topK = sys.env.getOrElse("SPARK_GRAFT_TOPK", "10").toInt
    val probes = sys.env.getOrElse("SPARK_GRAFT_PROBES", "2").toInt
    val nq = sys.env.getOrElse("SPARK_GRAFT_NQ", "100").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
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
      .select(col("vec_id"), col("embedding")).localCheckpoint(true)
    val n = vecs.count()
    val coarseStride = math.max(1L, n / kCoarse).toInt
    val bookStride = math.max(1L, n / kb).toInt
    val m = 4; val dim = 64
    val (coarse0, books0) = Similarity.ivfPqTrain(vecs, coarseStride,
      m, dim, bookStride, iters = 0)
    val coarse = coarse0.localCheckpoint(true)
    val books = books0.localCheckpoint(true)
    val codes = Similarity.ivfPqEncode(vecs, coarse, books, m, dim)
      .localCheckpoint(true)
    val qStride = math.max(1L, n / nq)
    val queries = vecs.filter(pmod(col("vec_id"), lit(qStride)) === 0)
      .localCheckpoint(true)

    def time(body: => Unit): Double = {
      val runs = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      runs.min
    }

    // exact ground truth once (drives every recall number)
    val exact = Similarity.ivfPqRefinedRecall(vecs, queries, topK,
      refine = 1, coarse, books, m, dim, probes) // shape warm-up only
    exact.count()

    val rows = Seq(1, 2, 3, 5).map { r =>
      val wall = time {
        (if (r == 1)
          Similarity.ivfPqTopKFromCodes(codes, queries, topK, coarse,
            books, m, dim, probes)
        else
          Similarity.ivfPqTopKRefined(codes, queries, vecs, topK, r,
            coarse, books, m, dim, probes))
          .write.format("noop").mode("overwrite").save()
      }
      val recall =
        (if (r == 1)
          Similarity.ivfPqRecall(vecs, queries, topK, coarse, books,
            m, dim, probes)
        else
          Similarity.ivfPqRefinedRecall(vecs, queries, topK, r, coarse,
            books, m, dim, probes))
          .agg(avg(col("recall"))).head.getDouble(0)
      f"""{"refine":$r,"wall_sec":$wall%.3f,"recall_at_$topK":$recall%.4f}"""
    }
    println(s"""{"bench":"refine","sf":"$sfDir","n":$n,"queries":${queries.count()},"probes":$probes,"rows":[${rows.mkString(",")}]}""")
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level wall breakdown for the MaxScore server on ONE
  * serving-batch-sized query set — the measurement that decides where
  * the next architecture iteration goes (the sf10 A/B showed 79%
  * of candidate rows skipped yet 2.2× the exhaustive wall; this
  * attributes the loss to specific passes).
  *
  *   tools/run_main.sh graft.tools.MaxScoreProbe <sfDir> [nQueries]
  */
object MaxScoreProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("testdata-derived/sf1")
    val nQ = args.lift(1).map(_.toInt).getOrElse(200)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    import graft.llm.{Retrieval, TempCache}

    val docs = graft.Tables.load(spark, sfDir, "documents")
    val vecs = graft.Tables.load(spark, sfDir, "embeddings")
    val seg = Retrieval.servingSegOf(spark, sfDir)
    val bounds = Retrieval.servingBoundsOf(spark, sfDir)
    val stats = Retrieval.corpusStats(docs).localCheckpoint()
    val queries = docs
      .join(vecs.select(col("vec_id").as("doc_id")), Seq("doc_id"))
      .filter(pmod(col("doc_id"), lit(100)) === 0)
      .limit(nQ)
      .select(col("doc_id"), col("text")).localCheckpoint()
    val qt = Retrieval.queryTerms(queries).localCheckpoint()

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // warm the store footers once
    t("warm: store scan count") { seg.postings.limit(1).count() }

    (1 to 2).foreach { rep =>
      println(s"--- rep $rep ---")
      t("baseline pushed server") {
        Retrieval.bm25TopKFromSegmentsPushed(seg, stats, qt, 10)
          .write.format("noop").mode("overwrite").save()
      }
      val temps = new TempCache
      val parts = t("maxscore plan construction " +
        "(pushable + qub + seed + theta collects)") {
        Retrieval.bm25MaxScoreParts(seg, bounds, stats, qt, 10, 10000,
          temps)
      }
      t("maxscore result (A + B + tail)") {
        parts.result.write.format("noop").mode("overwrite").save()
      }
      val sliceRows = t("diag: slice count") { parts.slice.count() }
      val aRows = t("diag: scoredA count") { parts.scoredA.count() }
      val bRows = t("diag: scoredB count") { parts.scoredB.count() }
      val survRows = t("diag: survivors count") {
        parts.survivors.map(_.count()).getOrElse(-1L) }
      println(f"[probe] rows slice=$sliceRows a=$aRows b=$bRows " +
        f"survivors=$survRows " +
        f"skip=${1.0 - (aRows + bRows).toDouble / math.max(1L, sliceRows)}%.3f")
      temps.release()
      spark.catalog.clearCache()
    }
  }
}

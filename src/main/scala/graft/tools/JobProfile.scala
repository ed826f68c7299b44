package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-Spark-job wall-clock profile of one declared query under the
  * bench session conf — answers "where do this query's seconds go"
  * without the UI (headless sandbox): one line per job with duration,
  * stage count, task count, and the first line of the job's call site.
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *     tools/run_main.sh graft.tools.JobProfile q_llm_curate_emb_rel [reps]
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: JobProfile <query> [reps]")
    val q = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-jobprofile")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String, Int)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    @volatile var repT0 = System.nanoTime()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val p = Option(js.properties)
        val site = p.flatMap(x => Option(x.getProperty("spark.job.description")))
          .orElse(p.flatMap(x => Option(x.getProperty("callSite.short"))))
          .getOrElse("?")
        val stageNames = js.stageInfos.map(_.name).mkString(" | ")
        starts.put(js.jobId, (System.nanoTime(),
          s"$site  [$stageNames]", js.stageInfos.size))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.get(je.jobId)).foreach { case (t0, site, nStages) =>
          val ms = (System.nanoTime() - t0) / 1e6
          val at = (t0 - repT0) / 1e6
          lines.add(f"job ${je.jobId}%4d  at ${at}%7.0f  ${ms}%8.0f ms  stages=$nStages%-3d $site")
        }
      }
    })

    val fn = graft.SparkEntry.queries(q)
    for (rep <- 1 to reps) {
      lines.clear()
      repT0 = System.nanoTime()
      val t0 = repT0
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      Thread.sleep(300) // drain listener bus
      println(s"=== rep $rep of $q: ${f"$t%.2f"} s, ${lines.size} jobs")
      lines.forEach(l => println(l))
    }
    spark.stop()
  }
}

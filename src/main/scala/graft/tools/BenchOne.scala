package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timing harness for plan/perf bisects:
  *
  *   runMain graft.tools.BenchOne q_llm_cosine_topk q_llm_emb_neardup
  *
  * Env:
  *  - SPARK_GRAFT_SF_DIR   data dir (default sf0.1)
  *  - SPARK_GRAFT_CPUS     local[N] (default 32)
  *  - SPARK_GRAFT_CONF     extra confs, `k=v;k=v` (e.g.
  *                         spark.sql.codegen.wholeStage=false)
  *  - SPARK_GRAFT_REPS     timed reps per query (default 3; prints all)
  *
  * Unlike Bench (driver contract: best-of-2, fixed query set), this
  * prints every rep so warm-up/compile effects are visible.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    sys.env.get("SPARK_GRAFT_CONF").foreach { confs =>
      confs.split(";").filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        builder.config(k, v)
      }
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    try graft.SparkEntry.queries("q_groupby_count")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[benchone] $name: ${times.map(t => f"$t%.3f").mkString(", ")} (min ${times.min}%.3f)")
    }
    spark.stop()
  }
}

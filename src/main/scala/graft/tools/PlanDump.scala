package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Dump `explain("formatted")` for declared queries to files — the
  * plan evidence the optimization rounds commit under plans/rNN/.
  *
  * Runs under the SAME session conf as Bench (master local[$CPUS],
  * shuffle.partitions = $CPUS, AQE on) so the dumped plan is the plan
  * the bench times (modulo AQE's runtime re-optimization, which
  * explain-before-execution cannot show).
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *     tools/run_main.sh graft.tools.PlanDump <outDir> <suffix> [q1 q2 ...]
  * With no query args, dumps every declared query. Files land at
  * `<outDir>/<query>_<suffix>.txt`.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <outDir> <suffix> [queries...]")
    val outDir = Paths.get(args(0))
    val suffix = args(1)
    Files.createDirectories(outDir)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-plandump")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val wanted =
      if (args.length > 2) args.drop(2).toSeq
      else graft.SparkEntry.specs.map(_.name)
    for (q <- wanted) {
      spark.catalog.clearCache()
      val plan =
        try graft.SparkEntry.queries(q)(spark, sfDir)
          .queryExecution.explainString(FormattedMode)
        catch { case e: Throwable => s"PLAN FAILED: $e" }
      Files.write(outDir.resolve(s"${q}_$suffix.txt"),
        plan.getBytes(StandardCharsets.UTF_8))
      println(s"dumped $q (${plan.length} chars)")
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** One-line plan census per query under the TEST session conf
  * (local[4], 4 shuffle partitions, AQE on) — the counts PlanSpec's
  * annotated budgets pin. Usage:
  *   tools/run_main.sh graft.tools.PlanCount q_llm_bm25 [more...]
  */
object PlanCount {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-plancount")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    for (q <- args) {
      spark.catalog.clearCache()
      val p = graft.SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.explainString(FormattedMode)
      def n(tok: String) = tok.r.findAllIn(p).length
      println(s"RESULT $q bnlj=${n("BroadcastNestedLoopJoin")} " +
        s"onepart=${n("Exchange SinglePartition")} " +
        s"termex=${n("Exchange hashpartitioning\\(term")} " +
        s"srvpost=${p.contains("graft_idx_srv_post")} " +
        s"srvdf=${p.contains("graft_idx_srv_df")} " +
        s"storedcodes=${p.contains("seg_ivfpq_attr")}")
      if (sys.env.contains("SPARK_GRAFT_PLAN_DUMP")) println(p)
    }
    spark.stop()
  }
}

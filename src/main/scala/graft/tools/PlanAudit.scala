package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-shape audit for declared queries — the per-operator scale
  * checklist (SCALE.md §1) as a one-command report:
  *
  *   runMain graft.tools.PlanAudit q_llm_drift q_llm_pq_ann
  *   runMain graft.tools.PlanAudit            # every declared query
  *
  * For each query, prints the counts that matter at 100 TB: shuffle
  * Exchanges, broadcast vs sort-merge joins, nested-loop joins (only
  * legitimate for broadcast single-row scalars), cartesian products
  * (always a bug — PlanSpec fails the build on them), and window
  * operators over SinglePartition (a one-reducer serialization).
  * Env: SPARK_GRAFT_SF_DIR (default sf0.001 — shape, not timing).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (args.nonEmpty) args.toSeq
      else graft.SparkEntry.specs.map(_.name)
    def count(p: String, token: String): Int =
      token.r.findAllIn(p).length
    // "exch" counts SHUFFLE exchanges only (hash/range/single-partition
    // repartitions) — BroadcastExchange moves a small side, not the
    // data, and ReusedExchange is a pointer, so neither is a shuffle.
    // "1part" isolates the single-partition subset: legitimate for
    // one-row scalar totals, a serialization bug under a window.
    def shuffles(p: String): Int =
      count(p, "Exchange hashpartitioning") +
        count(p, "Exchange rangepartitioning") +
        count(p, "Exchange SinglePartition")
    println(f"${"query"}%-28s ${"exch"}%5s ${"bhj"}%4s ${"smj"}%4s ${"bnlj"}%5s ${"cart"}%5s ${"1part"}%6s")
    names.foreach { name =>
      try {
        val p = graft.SparkEntry.queries(name)(spark, sfDir)
          .queryExecution.executedPlan.toString
        println(f"$name%-28s ${shuffles(p)}%5d ${count(p, "BroadcastHashJoin")}%4d " +
          f"${count(p, "SortMergeJoin")}%4d ${count(p, "BroadcastNestedLoopJoin")}%5d " +
          f"${count(p, "CartesianProduct")}%5d ${count(p, "Exchange SinglePartition")}%6d")
      } catch {
        case e: Throwable => println(f"$name%-28s FAILED: ${e.getMessage}")
      } finally spark.catalog.clearCache()
    }
    spark.stop()
  }
}

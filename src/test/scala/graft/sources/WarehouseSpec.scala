package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the bucketed-warehouse contract: equi joins between same-
  * bucketed tables and aggregates on the bucket key plan with ZERO
  * Exchange — the pre-paid-shuffle layout for long-lived tables. */
class WarehouseSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("same-bucketed tables join and aggregate with zero exchange") {
    val docs = graft.Tables.load(spark, sf0001, "documents")
    Warehouse.writeBucketed(docs, "wh_docs_a", buckets = 4)
    Warehouse.writeBucketed(
      docs.select(col("doc_id"), col("n_chars").as("nc")), "wh_docs_b",
      buckets = 4)
    try {
      val a = Warehouse.readBucketed(spark, "wh_docs_a")
      val b = Warehouse.readBucketed(spark, "wh_docs_b")
      // force the non-broadcast path: the point is shuffle avoidance
      val joined = a.hint("merge").join(b.hint("merge"), "doc_id")
        .select(col("doc_id"), col("source"), col("nc"))
      assert(!plan(joined).contains("Exchange"),
        s"bucketed join must not shuffle:\n${plan(joined)}")
      assert(joined.count() == docs.count())

      val agged = a.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      assert(!plan(agged).contains("Exchange"),
        s"groupBy on the bucket key must not shuffle:\n${plan(agged)}")

      // and a NON-bucketed copy of the same data DOES shuffle — the
      // bucketing, not the data size, removes the exchange
      val plain = docs.hint("merge")
        .join(docs.select(col("doc_id"), col("n_chars")).hint("merge")
          .withColumnRenamed("n_chars", "nc2"), "doc_id")
      assert(plan(plain).contains("Exchange"),
        "control: the unbucketed join shuffles")
    } finally {
      spark.sql("DROP TABLE IF EXISTS wh_docs_a")
      spark.sql("DROP TABLE IF EXISTS wh_docs_b")
    }
  }
}

package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed warehouse layout — the long-lived-table half of the scale
  * story (SCALE.md §1/§8): when a corpus or cert table is read many
  * times by key-equi joins and keyed aggregates, hash-bucketing it at
  * write time pre-pays the exchange ONCE. Every later join between
  * tables bucketed the same way on the same key, and every groupBy on
  * the bucket key, plans with ZERO Exchange — at 100 TB that is the
  * difference between re-shuffling the corpus per consumer query and
  * never shuffling it again (WarehouseSpec pins the exchange-free
  * plans).
  *
  * Spark-native: `bucketBy` + `sortBy` into the session catalog;
  * Catalyst's output-partitioning/ordering metadata does the rest —
  * no planner hints in the consumer queries.
  */
object Warehouse {

  /** Write `df` as a bucketed, in-bucket-sorted table. `buckets`
    * should match the cluster's target parallelism granularity (one
    * task per bucket per join); the key must be the dominant join /
    * aggregation key — doc_id for corpora, issuer_id for the cert
    * dimension workload. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int = 32,
      key: String = "doc_id"): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Read a bucketed table back (bucket metadata rides the catalog). */
  def readBucketed(spark: org.apache.spark.sql.SparkSession,
      table: String): DataFrame = spark.table(table)
}

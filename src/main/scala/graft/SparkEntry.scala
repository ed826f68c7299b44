package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Inventory, QuerySpec}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2's inventory is declared here as a
  * named query over the driver testdata, each (where SQL-expressible)
  * with a DuckDB oracle the driver hash-compares against at sf0.01.
  */
object SparkEntry {

  /** All declared query specs (relational inventory + LLM-pipeline ops). */
  def specs: Seq[QuerySpec] =
    Inventory.all ++ graft.queries.Skew.all ++
      graft.queries.Temporal.all ++ llm.TextAnalysis.all ++
      llm.TextDedup.all ++ llm.Similarity.all ++ llm.Retrieval.all ++
      llm.Classifier.all ++ llm.Multimodal.all ++
      llm.MultimodalCompressed.all ++
      llm.Curation.all ++ llm.Pipeline.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The hierarchical rollup report (storage-statistics.go:33-82). */
  def entry(spark: SparkSession): DataFrame =
    Inventory.qRollup.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    specs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    specs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}

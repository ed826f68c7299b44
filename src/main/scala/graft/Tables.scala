package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * All reads are plain parquet scans so Catalyst predicate pushdown /
  * column pruning apply naturally downstream. The only quirk is
  * `events.ts`, written as parquet INT64 TIMESTAMP(NANOS) which Spark
  * cannot map to its microsecond TimestampType; we read it as a raw
  * nanosecond long (`spark.sql.legacy.parquet.nanosAsLong`) and derive
  * a microsecond `ts_us` column. Keeping the raw long around preserves
  * full-precision ordering (used by first-seen dedup, SURVEY.md §2.E).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a session temp view so the entire engine
    * surface is reachable from plain `spark.sql(...)` — together with
    * `GraftExtensions` (which registers the graft_* kernels at session
    * build) this is the SQL-first entry point: a user can run the
    * documented pipelines without touching the Scala API. Views are
    * lazy scans; all pushdown/pruning behavior is identical to
    * [[load]]. */
  def registerViews(spark: SparkSession, dir: String): Unit = {
    names.foreach { n =>
      val df = if (n == "events") events(spark, dir) else load(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
  }

  /** events with `ts` as raw epoch-nanos long plus derived `ts_us` timestamp. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // Runtime-settable SQL conf; set defensively in case the session
    // builder (driver-owned Verify/Bench, or a test) didn't.
    try spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    catch { case _: Throwable => () }
    load(spark, dir, "events")
      .withColumn("ts_us", expr("timestamp_micros(ts div 1000)"))
  }
}

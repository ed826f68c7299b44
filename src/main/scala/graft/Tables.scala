package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * All reads are plain parquet scans so Catalyst predicate pushdown /
  * column pruning apply naturally downstream. The only quirk is
  * `events.ts`: the driver has shipped it both as parquet INT64
  * TIMESTAMP(NANOS) (which Spark cannot map to its microsecond
  * TimestampType — read as a raw nanosecond long via
  * `spark.sql.legacy.parquet.nanosAsLong`) and as TIMESTAMP(MICROS)
  * (plain timestamp read). [[events]] normalizes BOTH shapes to the
  * same downstream contract — `ts` = epoch-nanos long, `ts_us` =
  * microsecond timestamp — so every query and its DuckDB oracle
  * (`epoch_ns(ts)`) is unit-agnostic. Keeping the raw long around
  * preserves full-precision ordering (first-seen dedup, SURVEY §2.E).
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
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // TIMESTAMP(NANOS) tier: ts arrived as raw nanos.
        raw.withColumn("ts_us", expr("timestamp_micros(ts div 1000)"))
      case _ =>
        // TIMESTAMP(MICROS) tier: ts arrived as a (possibly NTZ)
        // timestamp. Session tz is UTC everywhere (Verify/Bench/tests),
        // so the NTZ->TZ cast is instant-preserving; rebuild the
        // nanos-long view exactly (micros * 1000 — the source has no
        // sub-microsecond precision to lose).
        raw
          .withColumn("ts_us", col("ts").cast(org.apache.spark.sql.types.TimestampType))
          .withColumn("ts", expr("unix_micros(CAST(ts AS TIMESTAMP)) * 1000"))
    }
  }
}

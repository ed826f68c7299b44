package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The storage-statistics report (SURVEY.md §3.2,
  * cmd/storage-statistics/storage-statistics.go:22-100) over the
  * ingested certificate layout, restated as two Catalyst plans instead
  * of the reference's N+1 cache round-trips (one SCAN + one
  * SMEMBERS/SCARD per issuer and date):
  *
  *  - a `rollup(issuer_id, exp_date)` over the cert table gives every
  *    per-(issuer, expDate) distinct-serial count, every per-issuer
  *    subtotal, and the grand total in ONE pass with partial
  *    aggregation (what the reference assembles by iterating Redis
  *    keys);
  *  - the issuer dimension (distinct DNs / CRL distribution points,
  *    issuermetadata.go:140-154) re-aggregates the per-batch issuer
  *    upserts and joins in as a broadcast (it is tiny: one row per CA).
  *
  * At 100 TB the cert scan shuffles once on the rollup keys; the
  * dimension side never exceeds the CA population (~10⁴ rows).
  */
object Statistics {

  /** Per-issuer dimension: distinct DN and filtered CRL-DP sets with
    * their sizes (the reference's `Issuers()` / `CRLs()` sets). */
  def issuerDim(spark: SparkSession, certRoot: String): DataFrame =
    spark.read.parquet(s"$certRoot/issuer_batches")
      .groupBy(col("issuer_id"))
      .agg(
        sort_array(array_distinct(flatten(collect_list(col("issuer_dns"))))).as("issuer_dns"),
        sort_array(array_distinct(flatten(collect_list(col("crl_dps"))))).as("crl_dps"))
      .withColumn("n_dns", size(col("issuer_dns")).cast("long"))
      .withColumn("n_crls", size(col("crl_dps")).cast("long"))

  /** The full hierarchical report. Row shape mirrors the reference's
    * output levels:
    *  - (issuer_id, exp_date) rows: distinct serials in that bucket;
    *  - (issuer_id, null) rows: per-issuer serial totals + dim sizes
    *    (`countIssuerSerials`, storage-statistics.go:52);
    *  - (null, null) row: grand totals (:82).
    */
  def report(spark: SparkSession, certRoot: String): DataFrame = {
    // exp_date back to the engine's string-id surface: a day-resolution
    // store's partition values parse as dates, so Spark's partition
    // type inference reads them as DATE (see listExpirationDates)
    val certs = spark.read.parquet(s"$certRoot/certs")
      .withColumn("exp_date", col("exp_date").cast("string"))
    // count(*), not countDistinct(serial): serials are only unique
    // within (exp_date, issuer_id) — the ingest's first-seen gate makes
    // the table unique on the triple key, and the reference's subtotals
    // and grand total SUM the per-bucket set sizes
    // (storage-statistics.go:52-53,82), so equal serial values under
    // different issuers/dates must count separately at every level.
    val cells = certs
      .rollup(col("issuer_id"), col("exp_date"))
      .agg(count(lit(1)).as("n_serials"))
    val dim = issuerDim(spark, certRoot)
      .select(col("issuer_id"), col("n_dns"), col("n_crls"))
    cells
      .join(broadcast(dim), Seq("issuer_id"), "left")
      .select(col("issuer_id"), col("exp_date"), col("n_serials"),
        col("n_dns"), col("n_crls"))
      .orderBy(asc_nulls_first("issuer_id"), asc_nulls_first("exp_date"))
  }

  /** The `ct-getcert` point query (§3.3, ct-getcert.go:16-57) over the
    * ingested layout: partition-pruned read of one PEM. */
  def certPem(spark: SparkSession, certRoot: String,
      expDate: String, issuerId: String, serialId: String): DataFrame =
    spark.read.parquet(s"$certRoot/certs")
      .filter(col("exp_date") === expDate && col("issuer_id") === issuerId &&
        col("serial_id") === serialId)
      .select(col("pem"))

  /** Point query by log position (entry_id), the other ct-getcert
    * addressing mode (`-log <url> -index <i>`). */
  def certPemByEntry(spark: SparkSession, certRoot: String,
      logUrl: String, entryId: Long): DataFrame =
    spark.read.parquet(s"$certRoot/certs")
      .filter(col("log_url") === logUrl && col("entry_id") === entryId)
      .select(col("pem"))
}

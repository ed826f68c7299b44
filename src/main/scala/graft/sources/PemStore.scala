package graft.sources

import graft.functions.CertFuncs
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Importer for an existing ct-mapreduce on-disk store: one PEM file
  * per certificate at `<root>/<expDate>/<issuerID>/<serial>`
  * (localdiskbackend.go:194-199). A reference user switching engines
  * reads their store once with this and lands in the engine's
  * partitioned parquet layout — no log re-fetch.
  *
  * Scale shape: `binaryFile` splits the file listing across the
  * cluster; parse and key derivation are per-row; the single wide op
  * is the final partitioned write. Issuer identity is taken from the
  * PATH (the legacy layout's issuer directory IS the reference's
  * issuer id — the issuing cert itself is not stored, so it cannot be
  * re-derived); expiration and serial are re-derived from the
  * certificate and cross-checked against the path.
  */
object PemStore {

  /** Read every PEM under a legacy store root into the raw import
    * shape: one row per file with the path-encoded keys. */
  def readLegacyStore(spark: SparkSession, root: String): DataFrame = {
    val files = spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .load(root)
      // the reference writes bare serial-named files; skip its `state/`
      // blobs and `dirty` markers
      .filter(!col("path").contains("/state/") && !col("path").endsWith("/dirty"))
    val parts = split(col("path"), "/")
    files.select(
      element_at(parts, -3).as("path_exp_date"),
      element_at(parts, -2).as("path_issuer_id"),
      element_at(parts, -1).as("path_serial"),
      col("content").cast("string").as("pem"))
  }

  /** Parse + re-key a legacy read into the engine's cert schema.
    * Unparseable files are dropped and counted (C7 analog).
    * `hourResolution=false` keys exp_date at day resolution
    * (types.go:21-23), so a day-bucketed legacy store round-trips with
    * its own ids instead of being re-bucketed to hours. */
  def parseLegacy(raw: DataFrame, hourResolution: Boolean = true): DataFrame =
    raw
      .withColumn("der", CertFuncs.pem_to_der(col("pem")))
      .withColumn("cert", CertFuncs.parse_cert(col("der")))
      .filter(col("cert").isNotNull)
      .select(
        (if (hourResolution) CertFuncs.expDateHourId(col("cert.not_after"))
        else CertFuncs.expDateDayId(col("cert.not_after"))).as("exp_date"),
        col("path_issuer_id").as("issuer_id"),
        CertFuncs.serialId(col("cert.serial")).as("serial_id"),
        lit(-1L).as("entry_id"),              // unknown in the legacy layout
        lit(0L).as("ts_ms"),
        lit("legacy-import").as("log_url"),
        col("cert.not_after").as("not_after"),
        col("cert.issuer_cn").as("issuer_cn"),
        col("cert.issuer_dn").as("issuer_dn"),
        CertFuncs.filterCrlDps(col("cert.crl_dps")).as("crl_dps"),
        col("pem"),
        col("path_exp_date"), col("path_serial"))

  /** Export the engine store BACK to the reference's on-disk layout —
    * one PEM file per cert at `<root>/<expDate>/<issuerID>/<serial>`
    * (localdiskbackend.go:194-199) — the escape hatch that makes
    * migration bidirectional: a user can leave as losslessly as they
    * arrived, and reference tooling can read the result directly.
    *
    * Scale shape: one scan of the narrow (exp_date, issuer_id,
    * serial_id, pem) projection, file writes distributed via
    * `foreachPartition` against the shared filesystem. This
    * deliberately reproduces the reference's one-file-per-cert layout
    * (including its small-file economics) because that IS the target
    * format; the parquet store remains the engine's native form.
    * Returns the number of files written. */
  def exportLegacyStore(spark: SparkSession, certRoot: String,
      outRoot: String): Long = {
    val written = spark.sparkContext.longAccumulator("pem_files_written")
    spark.read.parquet(s"$certRoot/certs")
      // serial_id is base64url — already filesystem-safe, and exactly
      // the file name the reference writes (types.go:210-212)
      .select(col("exp_date").cast("string"), col("issuer_id"),
        col("serial_id"), col("pem"))
      .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        rows.foreach { r =>
          val dir = java.nio.file.Paths.get(outRoot, r.getString(0), r.getString(1))
          java.nio.file.Files.createDirectories(dir)
          java.nio.file.Files.writeString(dir.resolve(r.getString(2)), r.getString(3))
          written.add(1L)
        }
      }
    written.value
  }

  /** Import a legacy store into `certRoot` (the engine layout): dedup
    * on the triple key (legacy stores written by a crashed reference
    * can hold duplicate appends), skip rows the target already holds
    * (issuer ids are the same SPKI digests in both layouts, so an
    * import into a non-empty store would otherwise create triple-key
    * duplicates), write partitioned, and upsert the issuer dimension
    * exactly like the streaming sink. Returns per-check import
    * counts, including how many rows the target already had.
    * `hourResolution` must match the TARGET store's bucketing (a day
    * store imported at hour keys — or vice versa — would duplicate
    * certs under differently-shaped ids). */
  def importLegacyStore(spark: SparkSession, legacyRoot: String,
      certRoot: String, hourResolution: Boolean = true): Map[String, Long] = {
    val parsed = parseLegacy(readLegacyStore(spark, legacyRoot), hourResolution)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = parsed.count()
    // path-vs-content consistency: exp_date dirs may be day-resolution
    // in old stores, so compare on the day prefix
    val keyMismatch = parsed.filter(
      !col("path_exp_date").startsWith(substring(col("exp_date"), 1, 10)) ||
        col("path_serial") =!= col("serial_id")).count()
    val deduped = parsed
      .dropDuplicates("exp_date", "issuer_id", "serial_id")
      .drop("path_exp_date", "path_serial")
    val certsPath = new org.apache.hadoop.fs.Path(s"$certRoot/certs")
    val targetExists = certsPath
      .getFileSystem(spark.sparkContext.hadoopConfiguration).exists(certsPath)
    // persisted: three consumers (count + both writes) would otherwise
    // re-run the dedup shuffle and re-scan the existing target each time
    val rows = (
      if (!targetExists) deduped
      else deduped.join(
        spark.read.parquet(certsPath.toString)
          .select(col("exp_date"), col("issuer_id"), col("serial_id")),
        Seq("exp_date", "issuer_id", "serial_id"), "left_anti")
    ).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val candidates = deduped.count()
    val stored = rows.count()
    rows.write.mode("append")
      .partitionBy("exp_date", "issuer_id")
      .parquet(s"$certRoot/certs")
    rows.groupBy(col("issuer_id"))
      .agg(sort_array(collect_set(col("issuer_cn"))).as("issuer_cns"),
        sort_array(collect_set(col("issuer_dn"))).as("issuer_dns"),
        sort_array(array_distinct(flatten(collect_list(col("crl_dps"))))).as("crl_dps"),
        count(lit(1)).as("n_new"))
      .withColumn("batch_id", lit(-1L))
      .write.mode("append").parquet(s"$certRoot/issuer_batches")
    rows.unpersist()
    parsed.unpersist()
    Map("files" -> total, "stored" -> stored,
      "already_present" -> (candidates - stored), "path_mismatches" -> keyMismatch)
  }
}

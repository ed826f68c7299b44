package graft.streaming

import graft.functions.CertFuncs
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The ingest pipeline (SURVEY.md §3.1 restated Spark-first): CT-log
  * source → parse (D10, null-tolerant C7) → filters (C1-C3, C6 analog)
  * → hour bucketing (D5) → stateful first-seen dedup with TTL at
  * domain expiry (E1+E2) → partitioned parquet write (B1) + issuer
  * dimension upsert (E3), checkpointed per micro-batch (J2/B3).
  *
  * Scale shape: the only stateful shuffle is keyed on
  * (exp_date, issuer_id, serial_id) — exactly the reference's dedup
  * set key — and the sink partitions by (exp_date, issuer_id), the
  * reference's on-disk layout (localdiskbackend.go:194-199), so
  * downstream map/reduce consumers get partition pruning for free.
  */
object IngestJob {

  case class DedupKey(exp_date: String, issuer_id: String, serial_id: String)
  case class CertRow(
      exp_date: String, issuer_id: String, serial_id: String,
      entry_id: Long, ts_ms: Long, log_url: String,
      not_after: java.sql.Timestamp, issuer_cn: String, pem: String)

  /** Parse + filter + derive keys; shared by stream and batch paths.
    * Parse totals/error counts ride along as observed metrics
    * (F5; the reference counts skipped entries, ct-fetch.go:198-209).
    *
    * Issuer identity comes from the ISSUING certificate — `chain(0)`
    * parsed alongside the leaf (H1, ct-fetch.go:221) and digested over
    * its raw SubjectPublicKeyInfo TLV (Store(cert, aIssuer) →
    * NewIssuer(aIssuer), filesystemdatabase.go:158 + types.go:109-130)
    * — NOT from the leaf's own key material. Entries with an empty
    * chain are skipped (C6, ct-fetch.go:215-219), as are entries whose
    * issuer cert fails to parse (ct-fetch.go:221-225). */
  def parsedEntries(raw: DataFrame, logExpiredEntries: Boolean,
      issuerCNFilter: Seq[String], asOf: Option[java.sql.Timestamp],
      hourResolution: Boolean = true): DataFrame = {
    val parsed = Observability.observed(
      raw.withColumn("cert", CertFuncs.parse_cert(col("der")))
        // issuer certs repeat massively (one CA, millions of leaves):
        // LRU-cached parse, the reference's hot-handle ARC cache analog
        .withColumn("issuer_cert",
          when(size(col("chain")) > 0,
            CertFuncs.parse_cert_cached(element_at(col("chain"), 1)))),
      "graft_ingest_parse",
      "n_entries" -> count(lit(1)),
      "n_parse_errors" -> sum(when(col("cert").isNull, 1L).otherwise(0L)),
      "n_empty_chain" -> sum(when(size(col("chain")) === 0, 1L).otherwise(0L)),
      "n_issuer_parse_errors" -> sum(
        when(size(col("chain")) > 0 && col("issuer_cert").isNull, 1L).otherwise(0L)))
      .filter(col("cert").isNotNull)                             // C7
      .filter(col("issuer_cert").isNotNull)                      // C6 + H1
      .filter(!(col("cert.bc_valid") && col("cert.is_ca")))      // C1
    val now = asOf.map(lit(_)).getOrElse(current_timestamp())
    val expiryFiltered =
      if (logExpiredEntries) parsed
      else parsed.filter(col("cert.not_after") >= now)           // C2
    val cnFiltered =
      if (issuerCNFilter.isEmpty) expiryFiltered
      else expiryFiltered.filter(                                 // C3 OR-fold
        issuerCNFilter.map(p => col("cert.issuer_cn").startsWith(p)).reduce(_ || _))
    // D5: the reference buckets at hour OR day resolution (types.go:
    // 21-23, 339-346); both are honored here — bucket id format, state
    // TTL (expDateExpireMs keys off the id's width), and expiry pruning
    // (listExpirationDates' day-prefix cut) all follow the id.
    val bucket =
      if (hourResolution) CertFuncs.expDateHourId(col("cert.not_after"))
      else CertFuncs.expDateDayId(col("cert.not_after"))
    cnFiltered
      .withColumn("exp_date", bucket)                              // D5
      // D3 over the issuing cert's raw SPKI — the reference never
      // applies the D2 SKI fallback to issuer identity (getSpki is
      // test-only, filesystemdatabase_test.go:80-106)
      .withColumn("issuer_id", CertFuncs.issuerId(col("issuer_cert.spki")))
      .withColumn("serial_id", CertFuncs.serialId(col("cert.serial")))
      .withColumn("pem", CertFuncs.derToPem(col("der")))          // D7
      // C5: keep only trimmed http/https CRL distribution points
      // (ldap/ldaps silently dropped, issuermetadata.go:48-73)
      .withColumn("crl_dps", CertFuncs.filterCrlDps(col("cert.crl_dps")))
  }

  /** The state TTL instant (E2) for an exp_date id at either
    * resolution: the bucket START, not its end — the reference's
    * `ExpireTime()` returns the truncated date itself
    * (types.go:371-373), so the dedup set for certs expiring within a
    * bucket is dropped when that bucket BEGINS (pinned by its own
    * Test_ExpireAt: notAfter 04:22:19 → expiry exactly 04:00:00,
    * knowncertificates_test.go:85-110). The id's width selects the
    * resolution: `yyyy-MM-dd-HH` (hour) or `yyyy-MM-dd` (day, start of
    * day — types.go:371: day-resolution ExpireTime is midnight). */
  def expDateExpireMs(expDateId: String): Long = {
    val ldt =
      if (expDateId.length > 10)
        java.time.LocalDateTime.parse(expDateId,
          java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd-HH"))
      else
        java.time.LocalDate.parse(expDateId).atStartOfDay()
    ldt.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
  }

  /** Run the streaming ingest from one (simulated) CT log directory. */
  def start(spark: SparkSession, logDir: String, certRoot: String,
      checkpoint: String, maxEntriesPerTrigger: Long = 16384,
      logExpiredEntries: Boolean = true, issuerCNFilter: Seq[String] = Nil,
      asOf: Option[java.sql.Timestamp] = None,
      runForever: Boolean = false, pollInterval: String = "10 minutes",
      startEntry: Long = 0L, limitEntries: Option[Long] = None,
      hourResolution: Boolean = true): StreamingQuery =
    startAll(spark, Seq(logDir), certRoot, checkpoint, maxEntriesPerTrigger,
      logExpiredEntries, issuerCNFilter, asOf, runForever, pollInterval,
      startEntry, limitEntries, hourResolution = hourResolution)

  /** Run the streaming ingest over MANY CT logs as ONE query: the
    * per-log sources union into a single pipeline, so the first-seen
    * gate holds ACROSS logs — the reference's dedup set is shared by
    * every log worker (one Redis behind all of them,
    * filesystemdatabase.go:179-182), and a cert appearing in two logs
    * must still be stored exactly once. One query also means one
    * checkpoint carrying every source's offsets (the reference keeps
    * one `log::<url>` state blob per log in the same store).
    *
    * Checkpoint contract: Spark's offset log keys each unioned source
    * by POSITION, not by path — so the log list is (a) canonicalized
    * (dedup + sort) before the union, making the caller's argument
    * order irrelevant, and (b) persisted as a manifest next to the
    * checkpoint and checked on every start. Adding, removing, or
    * renaming a log after a checkpoint exists fails fast instead of
    * silently replaying log A's offsets against log B (the reference
    * keys state by `log::<url>` and tolerates list edits,
    * rediscache.go:180-191 — here an edited list requires a FRESH
    * checkpoint, or per-log recovery via `startEntry` from the stored
    * `max(entry_id)`). */
  def startAll(spark: SparkSession, logDirs: Seq[String], certRoot: String,
      checkpoint: String, maxEntriesPerTrigger: Long = 16384,
      logExpiredEntries: Boolean = true, issuerCNFilter: Seq[String] = Nil,
      asOf: Option[java.sql.Timestamp] = None,
      runForever: Boolean = false, pollInterval: String = "10 minutes",
      startEntry: Long = 0L, limitEntries: Option[Long] = None,
      startEntries: Map[String, Long] = Map.empty,
      hourResolution: Boolean = true): StreamingQuery = {
    import spark.implicits._
    require(logDirs.nonEmpty, "at least one log directory")
    val orderedDirs = checkLogManifest(spark, logDirs, checkpoint)
    checkStoreResolution(spark, certRoot, hourResolution)
    // J4: the reference's 16384-entry buffer bounds the WHOLE pipeline,
    // not each log (one channel behind every downloader, ct-fetch
    // .go:132) — split the admission cap across sources so a trigger
    // admits at most ~maxEntriesPerTrigger rows however many logs feed
    // the union
    val perSourceCap = math.max(1L, maxEntriesPerTrigger / orderedDirs.size)
    val raw = orderedDirs.map { logDir =>
      val rawReader = spark.readStream
        .format("graft.streaming.CtLogSource")
        .option("path", logDir)
        .option("maxEntriesPerTrigger", perSourceCap)              // J4
        .option("startEntry", startEntries.getOrElse(logDir, startEntry)) // G3 --offset
      limitEntries.fold(rawReader)(l =>
        rawReader.option("limitEntries", l)).load()               // G3 --limit
    }.reduce(_.unionByName(_))
    val entries = parsedEntries(raw, logExpiredEntries, issuerCNFilter, asOf,
      hourResolution)
      .select(col("exp_date"), col("issuer_id"), col("serial_id"),
        col("entry_id"), col("ts_ms"), col("log_url"),
        col("cert.not_after").as("not_after"), col("cert.issuer_cn").as("issuer_cn"),
        col("cert.issuer_dn").as("issuer_dn"), col("crl_dps"),
        col("pem"))
      .withColumn("event_ts", timestamp_millis(col("ts_ms")))     // D6: exact ms
      .withWatermark("event_ts", "1 hour")                        // J7 lateness bound
      .as[CertRowWithTs]
    val deduped = StatefulDedup.firstSeen[DedupKey, CertRowWithTs](
      entries,
      r => DedupKey(r.exp_date, r.issuer_id, r.serial_id),
      k => expDateExpireMs(k.exp_date))                           // E1+E2
    deduped.writeStream
      .option("checkpointLocation", checkpoint)                   // J2/B3
      .foreachBatch { (batch: Dataset[CertRowWithTs], batchId: Long) =>
        // two sinks read the batch; spill-tolerant persist, not cache —
        // a catch-up batch can be admission-cap-sized (16384 full rows)
        val b = batch.drop("event_ts")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // B1: the reference's <root>/<expDate>/<issuerID>/<serial> layout
        b.write.mode("append")
          .partitionBy("exp_date", "issuer_id")
          .parquet(s"$certRoot/certs")
        // E3: issuer dimension accumulation (distinct DNs + CRL DPs per
        // issuer, issuermetadata.go:92-138; partial aggregation is the
        // map-side-combine the reference hand-codes)
        b.groupBy(col("issuer_id"))
          .agg(sort_array(collect_set(col("issuer_cn"))).as("issuer_cns"),
            sort_array(collect_set(col("issuer_dn"))).as("issuer_dns"),
            sort_array(array_distinct(flatten(collect_list(col("crl_dps"))))).as("crl_dps"),
            count(lit(1)).as("n_new"))
          .withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(s"$certRoot/issuer_batches")
        b.unpersist()
        ()
      }
      .trigger(if (runForever) Trigger.ProcessingTime(pollInterval)   // J3 daemon
      else Trigger.AvailableNow())                                    // J3 catch-up
      .start()
  }

  /** Per-log resume points recovered from the CERT STORE rather than a
    * checkpoint: for each log dir, `max(entry_id) + 1` over the rows
    * that log contributed (keyed by the log_url its pages carry — the
    * reference's `log::<url>` state key), 0 for a log with no stored
    * rows. This is the recovery path when the log list must change
    * under an existing checkpoint (see [[checkLogManifest]]): start a
    * FRESH checkpoint and pass the returned map as `startEntries` so
    * no log re-reads what it already stored. One scan of the
    * `(log_url, entry_id)` columns — parquet reads nothing else.
    *
    * The rebuilt dedup state starts empty, so a cert stored below some
    * OTHER log's resume point can be re-admitted once from the resumed
    * range (at-least-once across the recovery boundary, the
    * reference's own "gentle collision" stance) — compact() restores
    * triple-key uniqueness. */
  def recoveredStartEntries(spark: SparkSession, certRoot: String,
      logDirs: Seq[String]): Map[String, Long] = {
    val certsPath = new org.apache.hadoop.fs.Path(s"$certRoot/certs")
    val fs = certsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(certsPath)) return logDirs.map(_ -> 0L).toMap
    val maxByUrl = spark.read.parquet(certsPath.toString)
      .groupBy(col("log_url")).agg(max(col("entry_id")).as("max_entry"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    logDirs.map { dir =>
      dir -> CtLog.logUrlOf(dir).flatMap(maxByUrl.get).map(_ + 1L).getOrElse(0L)
    }.toMap
  }

  /** Canonicalize the log list (dedup + sort) and pin it to the
    * checkpoint via `<checkpoint>/_graft_log_list`. The pinned list is
    * only ENFORCED once the checkpoint holds committed offsets — a
    * first start that failed before any batch has nothing to misapply,
    * so a corrected list may simply overwrite the manifest. With
    * offsets present, a changed list refuses to run, because the
    * unioned sources' offsets are stored by position and would be
    * misapplied across logs. Returns the canonical ordering to build
    * the union with. */
  private[streaming] def checkLogManifest(spark: SparkSession,
      logDirs: Seq[String], checkpoint: String): Seq[String] = {
    import org.apache.hadoop.fs.Path
    val ordered = logDirs.distinct.sorted
    val manifest = new Path(checkpoint, "_graft_log_list")
    val fs = manifest.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val offsetsDir = new Path(checkpoint, "offsets")
    val offsetsCommitted = fs.exists(offsetsDir) &&
      fs.listStatus(offsetsDir).nonEmpty
    if (fs.exists(manifest) && offsetsCommitted) {
      val in = fs.open(manifest)
      val stored = try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().toList.filter(_.nonEmpty) finally in.close()
      if (stored != ordered)
        throw new IllegalStateException(
          s"log list changed under checkpoint $checkpoint: offsets are stored per " +
          s"source position, so resuming with a different list would apply one " +
          s"log's offsets to another. Stored=${stored.mkString(",")} " +
          s"requested=${ordered.mkString(",")}. Start a fresh checkpoint (optionally " +
          s"seeding startEntries from recoveredStartEntries, i.e. max(entry_id) " +
          s"per log in the cert store).")
    } else if (offsetsCommitted) {
      // Offsets exist but the manifest does not (pre-manifest-build
      // checkpoint, or a lost manifest file): the stored offsets' source
      // order is UNKNOWN, so silently re-pinning the requested list
      // would be exactly the positional misapplication the manifest
      // guards against. Fail fast instead.
      throw new IllegalStateException(
        s"checkpoint $checkpoint holds committed offsets but no _graft_log_list " +
        s"manifest — the stored offsets' source order is unknown, so they cannot " +
        s"be safely applied to the requested list (${ordered.mkString(",")}). " +
        s"If the list is KNOWN to be unchanged since the checkpoint was written, " +
        s"restore the manifest by hand (newline-separated canonical list); " +
        s"otherwise start a fresh checkpoint, optionally seeding startEntries " +
        s"from recoveredStartEntries.")
    } else {
      val out = fs.create(manifest, true)
      try out.write((ordered.mkString("\n") + "\n").getBytes("UTF-8"))
      finally out.close()
    }
    ordered
  }

  /** Refuse to append one resolution's bucket ids into a store built at
    * the other: resuming (or pointing) an ingest at an existing store
    * with a flipped `hourResolution` would silently interleave
    * `yyyy-MM-dd` and `yyyy-MM-dd-HH` partitions — every downstream
    * expiry cut, TTL, and report would straddle two key shapes. The
    * check reads the store's OWN partition directory names (hour ids
    * are 13 chars, day ids 10), so no extra metadata file is needed and
    * pre-existing stores are covered. */
  private[streaming] def checkStoreResolution(spark: SparkSession,
      certRoot: String, hourResolution: Boolean): Unit = {
    import org.apache.hadoop.fs.Path
    val certs = new Path(s"$certRoot/certs")
    val fs = certs.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(certs)) return
    val widths = fs.listStatus(certs).map(_.getPath.getName)
      .filter(_.startsWith("exp_date="))
      .map(_.stripPrefix("exp_date=").length).distinct
    if (widths.isEmpty) return
    val storeHour = widths.max >= 13
    if (storeHour != hourResolution)
      throw new IllegalStateException(
        s"store $certRoot is ${if (storeHour) "hour" else "day"}-resolution but " +
        s"ingest was configured hourResolution=$hourResolution — appending the " +
        s"other shape would interleave yyyy-MM-dd and yyyy-MM-dd-HH bucket ids. " +
        s"Use the store's resolution, or start a new certRoot.")
  }

  case class CertRowWithTs(
      exp_date: String, issuer_id: String, serial_id: String,
      entry_id: Long, ts_ms: Long, log_url: String,
      not_after: java.sql.Timestamp, issuer_cn: String,
      issuer_dn: String, crl_dps: Seq[String], pem: String,
      event_ts: java.sql.Timestamp)

  /** The map/reduce enumeration surface (SURVEY.md §3.4): partition-
    * pruned reads over the ingested layout — ListExpirationDates /
    * ListIssuersForExpirationDate / StreamSerials (types.go:61-67)
    * become trivial pruned scans.
    *
    * ListExpirationDates SKIPS expired buckets relative to `notBefore`
    * truncated to the DAY (localdiskbackend.go:93-119: the walk
    * day-truncates aNotBefore at :97 and `filepath.SkipDir`s expired
    * dirs) — so the whole current day stays live. An hour bucket is
    * unexpired iff its start >= the truncated instant, and the
    * `yyyy-MM-dd-HH` ids sort chronologically, so the cut is a string
    * partition filter Catalyst prunes with (the SkipDir analog). */
  def listExpirationDates(spark: SparkSession, certRoot: String,
      notBefore: Option[java.sql.Timestamp] = None): DataFrame = {
    val t = notBefore.map(lit(_)).getOrElse(current_timestamp())
    // cut at the DAY prefix: hour ids ("yyyy-MM-dd-HH") of the cut day
    // sort ≥ "yyyy-MM-dd" and earlier days sort <, and day-resolution
    // ids ("yyyy-MM-dd") compare directly — one filter serves both
    // store resolutions. (A day-resolution store's partition values
    // parse as dates, so Spark's partition-column type inference reads
    // exp_date back as DATE — the comparison then coerces and prunes on
    // the date; the cast below restores the engine's string-id surface
    // either way.)
    spark.read.parquet(s"$certRoot/certs")
      .filter(col("exp_date") >= date_format(date_trunc("DAY", t), "yyyy-MM-dd"))
      .select(col("exp_date").cast("string").as("exp_date")).distinct()
  }

  def listIssuers(spark: SparkSession, certRoot: String, expDate: String): DataFrame =
    spark.read.parquet(s"$certRoot/certs")
      .filter(col("exp_date") === expDate).select(col("issuer_id")).distinct()

  def serials(spark: SparkSession, certRoot: String, expDate: String,
      issuerId: String): DataFrame =
    spark.read.parquet(s"$certRoot/certs")
      .filter(col("exp_date") === expDate && col("issuer_id") === issuerId)
      .select(col("serial_id"))

  /** Compact the streaming sink's per-batch files: every micro-batch
    * appends one parquet file per touched (exp_date, issuer_id)
    * partition, so a long-running daemon accumulates small files. One
    * keyed repartition rewrites each partition as a single file.
    * (The reference sidesteps this by writing one file per cert —
    * which at 100 TB is exactly the small-file problem.)
    *
    * Swap protocol (crash-safe, FS-portable): Spark refuses to
    * overwrite a path it is reading, so the rewrite is staged and then
    * swapped with two Hadoop `FileSystem.rename`s. The two renames are
    * not atomic as a pair, so a `_COMPACT_SWAP` marker brackets them:
    * the marker is created only AFTER the staged rewrite fully commits,
    * which makes roll-FORWARD always safe — [[recoverCompaction]] (run
    * at the start of every compact; callable at startup) finishes the
    * swap from whichever window the crash hit, so readers always find a
    * complete `certs/` directory afterwards. Maintenance op: run
    * between, not during, ingest batches. */
  def compact(spark: SparkSession, certRoot: String): Unit = {
    import org.apache.hadoop.fs.Path
    val live = new Path(s"$certRoot/certs")
    val staged = new Path(s"$certRoot/certs_compacting")
    val retired = new Path(s"$certRoot/certs_old")
    val marker = new Path(s"$certRoot/_COMPACT_SWAP")
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverCompaction(spark, certRoot)
    fs.delete(staged, true)
    // Restore the triple-key uniqueness invariant the statistics report
    // counts on: the streaming first-seen gate can re-admit a duplicate
    // after its state evicts at the bucket START (E2) — or any dup of an
    // already-expired cert with logExpiredEntries=true — and a parquet
    // append is not idempotent the way the reference's per-path file
    // store is (localdiskbackend.go:194-199). The dedup rides the same
    // shuffle as the repartition: hash partitioning on (exp_date,
    // issuer_id) already clusters the triple key, so the window below
    // needs only a sort, no extra exchange. The survivor is the row
    // with the least (log_url, entry_id, ts_ms) — NOT an arbitrary
    // dropDuplicates pick — so compaction is idempotent and a log's
    // max(entry_id) (which recoveredStartEntries reads) never regresses
    // by re-compacting.
    val wDup = org.apache.spark.sql.expressions.Window
      .partitionBy(col("exp_date"), col("issuer_id"), col("serial_id"))
      .orderBy(col("log_url"), col("entry_id"), col("ts_ms"))
    spark.read.parquet(live.toString)
      .repartition(col("exp_date"), col("issuer_id"))
      .withColumn("_rn", row_number().over(wDup))
      .filter(col("_rn") === 1).drop("_rn")
      .write.mode("overwrite")
      .partitionBy("exp_date", "issuer_id")
      .parquet(staged.toString)
    fs.create(marker, true).close() // staged is complete from here on
    if (!fs.rename(live, retired))
      throw new java.io.IOException(s"rename $live -> $retired failed")
    if (!fs.rename(staged, live))
      throw new java.io.IOException(s"rename $staged -> $live failed")
    fs.delete(retired, true)
    fs.delete(marker, false)
    compactIssuerBatches(spark, certRoot)
  }

  /** [[compact]] for S3-semantics object stores: same dedup'd
    * single-file-per-partition rewrite, but promoted through
    * [[ManifestStore]]'s generation + manifest protocol instead of
    * directory renames (non-atomic O(data) copy+delete on S3). The
    * rewrite fills a fresh immutable generation dir; ONE atomic
    * single-object manifest write commits it; GC of retired and
    * orphaned generations is idempotent and runs here on every call —
    * that IS the crash recovery (roll-forward needs no special case:
    * an un-promoted generation is simply never visible, and the next
    * compact starts past its number and deletes it). First call seeds
    * from the streaming sink's plain `certs/` directory; after that
    * the newest manifest is the source of truth ([[readCertsManifested]]).
    * Single-writer maintenance op, like [[compact]]. */
  def compactManifested(spark: SparkSession, certRoot: String): Unit = {
    import org.apache.hadoop.fs.Path
    val root = new Path(certRoot)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // number first, THEN reclaim: nextGen must see crashed-writer
    // orphan dirs so their numbers are never reused — a re-created
    // path with the same name would be ambiguous to any observer
    // holding the old listing
    val gen = ManifestStore.nextGen(fs, root)
    ManifestStore.gc(fs, root) // reclaim crashed-writer orphans
    val src = ManifestStore.currentDataPath(fs, root)
      .getOrElse(new Path(s"$certRoot/certs"))
    val staged = ManifestStore.stagingPath(root, gen)
    val wDup = org.apache.spark.sql.expressions.Window
      .partitionBy(col("exp_date"), col("issuer_id"), col("serial_id"))
      .orderBy(col("log_url"), col("entry_id"), col("ts_ms"))
    spark.read.parquet(src.toString)
      .repartition(col("exp_date"), col("issuer_id"))
      .withColumn("_rn", row_number().over(wDup))
      .filter(col("_rn") === 1).drop("_rn")
      .write.mode("overwrite")
      .partitionBy("exp_date", "issuer_id")
      .parquet(staged.toString)
    ManifestStore.promote(fs, root, gen) // the atomic commit point
    ManifestStore.gc(fs, root)
  }

  /** The live manifested cert snapshot ([[compactManifested]]), falling
    * back to the streaming sink's plain `certs/` before the first
    * manifested compaction. */
  def readCertsManifested(spark: SparkSession, certRoot: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val root = new Path(certRoot)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = ManifestStore.currentDataPath(fs, root)
      .getOrElse(new Path(s"$certRoot/certs"))
    spark.read.parquet(p.toString)
  }

  /** Fold the append-only per-batch issuer upserts into one row per
    * issuer. A long-running daemon appends one row per (batch, issuer),
    * so reads of the dimension re-aggregate an ever-growing table;
    * after this pass it is one snapshot row per CA. Same staged-swap
    * protocol as the cert store, with its own marker. */
  def compactIssuerBatches(spark: SparkSession, certRoot: String): Unit = {
    import org.apache.hadoop.fs.Path
    val live = new Path(s"$certRoot/issuer_batches")
    val staged = new Path(s"$certRoot/issuer_batches_compacting")
    val marker = new Path(s"$certRoot/_ISSUER_COMPACT_SWAP")
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(live)) return
    fs.delete(staged, true)
    // (issuer_id, batch_id) dedup first: a foreachBatch replay (crash
    // between the append and the offset commit) re-appends the same
    // batch's rows, which would double-count n_new in the sum below
    val src = spark.read.parquet(live.toString)
      .dropDuplicates("issuer_id", "batch_id")
    src.groupBy(col("issuer_id"))
      .agg(
        sort_array(array_distinct(flatten(collect_list(col("issuer_cns"))))).as("issuer_cns"),
        sort_array(array_distinct(flatten(collect_list(col("issuer_dns"))))).as("issuer_dns"),
        sort_array(array_distinct(flatten(collect_list(col("crl_dps"))))).as("crl_dps"),
        sum(col("n_new")).as("n_new"),
        max(col("batch_id")).as("batch_id"))
      .write.mode("overwrite").parquet(staged.toString)
    fs.create(marker, true).close()
    fs.delete(live, true)
    if (!fs.rename(staged, live))
      throw new java.io.IOException(s"rename $staged -> $live failed")
    fs.delete(marker, false)
  }

  /** Finish (roll forward) a compaction swap interrupted between the
    * two renames. No-op when no `_COMPACT_SWAP` marker is present. The
    * marker's existence guarantees the staged directory was fully
    * written, so promoting it is always correct; the retired copy holds
    * the same rows and is discarded. */
  def recoverCompaction(spark: SparkSession, certRoot: String): Unit = {
    import org.apache.hadoop.fs.Path
    val live = new Path(s"$certRoot/certs")
    val staged = new Path(s"$certRoot/certs_compacting")
    val retired = new Path(s"$certRoot/certs_old")
    val marker = new Path(s"$certRoot/_COMPACT_SWAP")
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // issuer-dimension swap recovery first (same roll-forward logic:
    // its marker is only created after the staged snapshot commits)
    val iLive = new Path(s"$certRoot/issuer_batches")
    val iStaged = new Path(s"$certRoot/issuer_batches_compacting")
    val iMarker = new Path(s"$certRoot/_ISSUER_COMPACT_SWAP")
    if (fs.exists(iMarker)) {
      if (!fs.exists(iLive) && fs.exists(iStaged)) {
        if (!fs.rename(iStaged, iLive))
          throw new java.io.IOException(s"recovery rename $iStaged -> $iLive failed")
      }
      fs.delete(iStaged, true)
      fs.delete(iMarker, false)
    }
    if (!fs.exists(marker)) return
    if (!fs.exists(live) && fs.exists(staged)) {
      // crashed between the renames: promote the staged rewrite
      if (!fs.rename(staged, live))
        throw new java.io.IOException(s"recovery rename $staged -> $live failed")
    }
    if (fs.exists(live)) {
      fs.delete(retired, true)
      fs.delete(staged, true)
      fs.delete(marker, false)
    } else if (fs.exists(retired)) {
      // staged lost before the marker protocol could see it complete
      // (should not happen — marker implies staged committed); restore
      // the retired copy rather than leave no live directory
      if (!fs.rename(retired, live))
        throw new java.io.IOException(s"recovery rename $retired -> $live failed")
      fs.delete(marker, false)
    }
  }

  /** B4: sorted serial-list export — newline-delimited lowercase HEX
    * serials, one directory per (expDate, issuer) partition. The
    * reference writes `serial.HexString() + "\n"` per serial
    * (localdiskbackend.go:212-237; golden: serials 01,02,03 → bytes
    * `30310A30320A30330A`, localdiskbackend_test.go:60-85) — the
    * stored base64url id is decoded back to raw bytes for the hex
    * view. One shuffle keyed on the partition columns; each writer
    * task emits its partitions' files already sorted (hex sorts like
    * the raw bytes, the reference's byte-wise SerialList order, G1). */
  def exportSerialLists(spark: SparkSession, certRoot: String, outDir: String): Unit =
    spark.read.parquet(s"$certRoot/certs")
      .select(col("exp_date"), col("issuer_id"),
        lower(hex(unbase64(translate(col("serial_id"), "-_", "+/")))).as("value"))
      .repartition(col("exp_date"), col("issuer_id"))
      // distinct guards against triple-key dups an uncompacted store may
      // hold (see compact()); clustered by the repartition, no 2nd shuffle
      .distinct()
      .sortWithinPartitions(col("exp_date"), col("issuer_id"), col("value"))
      .write.mode("overwrite")
      .partitionBy("exp_date", "issuer_id")
      .text(outDir)
}

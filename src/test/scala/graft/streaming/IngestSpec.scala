package graft.streaming

import graft.{SparkSpec, TestCerts}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** End-to-end streaming ingest (SURVEY.md §3.1): simulated CT log →
  * custom micro-batch source → parse/filter → stateful first-seen
  * dedup → partitioned write; exactly-once counts across duplicate
  * entries and checkpoint resume (the reference's WasUnknown gate +
  * MaxEntry checkpoint, verified the way its own tests do:
  * knowncertificates_test.go first-seen semantics, §5).
  *
  * Fixture roles: kLeadingZeroes and the synthetic leaves are non-CA
  * (ingestible); kEmptySPKI and kRealSPKI are CA certs, so the C1
  * filter must drop them.
  */
class IngestSpec extends SparkSpec {

  private def decode(pem: String): Array[Byte] = {
    val body = pem.linesIterator
      .filterNot(l => l.startsWith("-----") || l.isBlank).mkString
    java.util.Base64.getMimeDecoder.decode(body)
  }

  lazy val leaf1 = decode(TestCerts.kLeadingZeroes)   // non-CA, issuer CN "ca"
  lazy val leafS = decode(TestCerts.kSyntheticLeaf)   // non-CA, CN "synthetic leaf"
  lazy val leafS2 = decode(TestCerts.kSyntheticLeaf2) // non-CA, CN "second leaf"
  lazy val ca1 = decode(TestCerts.kEmptySPKI)         // CA; issued kLeadingZeroes
  lazy val ca2 = decode(TestCerts.kRealSPKI)          // CA

  /** Issuer chain for a leaf: kLeadingZeroes was issued by kEmptySPKI
    * (same CA fixture pairing the reference uses); the synthetic
    * leaves are self-signed, so each is its own chain(0). */
  def chainOf(der: Array[Byte]): Seq[Array[Byte]] =
    if (der eq leaf1) Seq(ca1) else Seq(der)
  def entry(id: Long, ts: Long, url: String, der: Array[Byte]): CtLog.Entry =
    CtLog.Entry(id, ts, url, der, chainOf(der))

  private val ts0 = 1000000000000L // 2001-09: watermark stays below expiries

  test("batch read of the ctlog source returns every entry once") {
    val dir = Files.createTempDirectory("ctlog").toString
    val entries = (0L until 25L).map(i =>
      entry(i, ts0 + i, "log.example.com/2025", Seq(leaf1, leafS, ca1)((i % 3).toInt)))
    CtLog.writePages(dir, entries, pageSize = 10)
    val df = spark.read.format("ctlog")   // short name via DataSourceRegister
      .option("path", dir).load()
    assert(df.count() == 25L)
    assert(df.select(col("entry_id")).distinct().count() == 25L)
    assert(df.select(size(col("chain"))).collect().forall(_.getInt(0) == 1))
    assert(CtLog.treeSize(dir) == 25L)
  }

  test("streaming ingest: dedup, CA filter, partitioned layout, checkpoint resume") {
    val root = Files.createTempDirectory("ingest").toString
    val logDir = s"$root/log"
    val certRoot = s"$root/out"
    val ckpt = s"$root/ckpt"

    // entries: 2 distinct non-CA certs (each duplicated) + 2 CA certs
    val batch1 = Seq(leaf1, leafS, leaf1, leafS, ca1, ca2).zipWithIndex.map {
      case (der, i) => entry(i.toLong, ts0 + i, "log.example.com/2025", der)
    }
    CtLog.writePages(logDir, batch1, pageSize = 4)
    val q1 = IngestJob.start(spark, logDir, certRoot, ckpt,
      maxEntriesPerTrigger = 4, logExpiredEntries = true)
    q1.awaitTermination()

    val certs = spark.read.parquet(s"$certRoot/certs")
    assert(certs.count() == 2L, "first-seen gate must emit exactly once per key")
    val dirs = new java.io.File(s"$certRoot/certs").listFiles.map(_.getName)
    assert(dirs.exists(_.startsWith("exp_date=")), dirs.toSeq.toString)

    // resume: re-deliver old duplicates + 1 genuinely new cert; the
    // state + offsets restore from the checkpoint, so exactly one new
    // row lands
    val batch2 = Seq(leaf1, leafS, leafS2).zipWithIndex.map {
      case (der, i) => entry((i + 6).toLong, ts0 + 6 + i, "log.example.com/2025", der)
    }
    CtLog.writePages(logDir, batch1 ++ batch2, pageSize = 4)
    val q2 = IngestJob.start(spark, logDir, certRoot, ckpt,
      maxEntriesPerTrigger = 4, logExpiredEntries = true)
    q2.awaitTermination()

    val after = spark.read.parquet(s"$certRoot/certs")
    assert(after.count() == 3L, "one new cert after resume, duplicates suppressed")
    assert(after.select(col("serial_id")).distinct().count() == 3L)

    // enumeration surface (§3.4)
    val expDates = IngestJob.listExpirationDates(spark, certRoot)
      .collect().map(_.getString(0)).sorted
    assert(expDates.nonEmpty)
    val issuers = IngestJob.listIssuers(spark, certRoot, expDates.head)
      .collect().map(_.getString(0))
    assert(issuers.nonEmpty)
    assert(IngestJob.serials(spark, certRoot, expDates.head, issuers.head).count() >= 1L)
  }

  test("crash between sink append and checkpoint commit: the replayed batch's " +
    "duplicate appends are healed by compact (exactly-once per triple, none lost)") {
    val root = Files.createTempDirectory("ingest_crash").toString
    val logDir = s"$root/log"
    val certRoot = s"$root/out"
    val ckpt = s"$root/ckpt"
    val entries = Seq(leaf1, leafS, leafS2).zipWithIndex.map {
      case (der, i) => entry(i.toLong, ts0 + i, "log.example.com/2025", der)
    }
    CtLog.writePages(logDir, entries, pageSize = 4)
    IngestJob.start(spark, logDir, certRoot, ckpt,
      maxEntriesPerTrigger = 10, logExpiredEntries = true).awaitTermination()
    def triples() = spark.read.parquet(s"$certRoot/certs")
      .select(col("exp_date"), col("issuer_id"), col("serial_id"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    val before = triples()
    assert(before.size == 3 && before.distinct.size == 3)

    // INJECT THE CRASH: rewind the checkpoint to "offsets/0 planned,
    // nothing committed" — byte-for-byte the on-disk state of a
    // process killed after the DATA batch's foreachBatch parquet
    // appends but before its commit-log write (the commit protocol
    // guarantees at most the LAST planned epoch is uncommitted, so the
    // injected state must also drop the later watermark-advance
    // epoch's offsets, exactly as a crash at that instant leaves
    // them). On restart Spark MUST re-run epoch 0 (same batchId, same
    // admitted range) against the pre-epoch state-store version,
    // re-appending every row the crashed run already wrote.
    def rewind(dir: java.io.File, keepBelow: Int): Unit =
      dir.listFiles.filter(_.getName.forall(_.isDigit))
        .filter(_.getName.toInt >= keepBelow).foreach { f =>
          assert(f.delete(), s"failed to delete $f")
          // drop the local-fs checksum sidecar too, or the replay's
          // atomic re-create fails on the stale CRC (an artifact of
          // ChecksumFileSystem, not of the simulated crash)
          new java.io.File(dir, s".${f.getName}.crc").delete()
        }
    assert(new java.io.File(s"$ckpt/commits").listFiles
      .exists(_.getName.forall(_.isDigit)), "precondition: committed epochs")
    rewind(new java.io.File(s"$ckpt/commits"), 0)
    rewind(new java.io.File(s"$ckpt/offsets"), 1)

    IngestJob.start(spark, logDir, certRoot, ckpt,
      maxEntriesPerTrigger = 10, logExpiredEntries = true).awaitTermination()
    val replayed = triples()
    assert(replayed.size > before.size,
      "injection must be real: the replayed epoch re-appends its rows")
    assert(replayed.distinct.sorted == before.distinct.sorted,
      "replay duplicates, it must not invent or lose keys")

    // the maintenance pass restores the triple-key uniqueness invariant
    IngestJob.compact(spark, certRoot)
    val healed = triples()
    assert(healed.sorted == before.sorted,
      s"post-compact store must be exactly the pre-crash rows: $healed")
    // the issuer dimension saw the same replay; its (issuer_id,
    // batch_id) dedup must keep n_new counts exactly-once too
    val nNew = spark.read.parquet(s"$certRoot/issuer_batches")
      .agg(sum(col("n_new"))).collect()(0).getLong(0)
    assert(nNew == 3L, s"issuer n_new must not double-count the replay: $nNew")
    // and the recovery map still resumes past the stored max entry
    val resume = IngestJob.recoveredStartEntries(spark, certRoot, Seq(logDir))
    assert(resume(logDir) == 3L, resume.toString)
  }

  test("expiry filter drops expired certs unless logExpiredEntries (C2)") {
    // kLeadingZeroes expired in 2020 → with the filter on and a 2026
    // reference instant it is dropped
    val raw = {
      import spark.implicits._
      Seq((0L, ts0, "log.example.com/2025", leaf1, Seq(ca1)))
        .toDF("entry_id", "ts_ms", "log_url", "der", "chain")
    }
    val kept = IngestJob.parsedEntries(raw, logExpiredEntries = false,
      issuerCNFilter = Nil, asOf = Some(java.sql.Timestamp.valueOf("2026-01-01 00:00:00")))
    assert(kept.count() == 0L)
    val admitted = IngestJob.parsedEntries(raw, logExpiredEntries = true,
      issuerCNFilter = Nil, asOf = None)
    assert(admitted.count() == 1L)
  }

  test("issuer-CN prefix OR-fold filter (C3, ct-fetch.go:57-69)") {
    import spark.implicits._
    val raw = Seq(
      (0L, ts0, "u", leaf1, Seq(ca1)),    // issuer CN "ca"
      (1L, ts0, "u", leafS, Seq(leafS)))  // issuer CN "synthetic leaf"
      .toDF("entry_id", "ts_ms", "log_url", "der", "chain")
    val kept = IngestJob.parsedEntries(raw, logExpiredEntries = true,
      issuerCNFilter = Seq("synthetic", "nonexistent"), asOf = None)
    assert(kept.select(col("entry_id")).collect().map(_.getLong(0)).toSeq == Seq(1L))
    // empty filter list keeps everything (ct-fetch.go:58-60)
    val all = IngestJob.parsedEntries(raw, logExpiredEntries = true,
      issuerCNFilter = Nil, asOf = None)
    assert(all.count() == 2L)
  }

  test("daemon mode ingests pages as they arrive; graceful stop keeps state (J3/J9)") {
    val root = Files.createTempDirectory("daemon").toString
    val logDir = s"$root/log"
    val certRoot = s"$root/out"

    def certCount(): Long =
      try spark.read.parquet(s"$certRoot/certs").count()
      catch { case _: Throwable => -1L }
    def awaitCount(n: Long): Unit = {
      val deadline = System.currentTimeMillis() + 60000
      while (certCount() != n && System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(certCount() == n, s"expected $n certs")
    }

    CtLog.writePages(logDir, Seq(entry(0L, ts0, "log.example.com/2025", leaf1)))
    val q = IngestJob.start(spark, logDir, certRoot, s"$root/ckpt",
      logExpiredEntries = true, runForever = true, pollInterval = "100 milliseconds")
    try {
      awaitCount(1L)
      // a new page arrives while the daemon polls (ct-fetch runForever)
      CtLog.writePages(logDir, Seq(entry(1L, ts0 + 1, "log.example.com/2025", leafS)))
      awaitCount(2L)
    } finally q.stop() // J9: graceful — offsets/state committed per batch
    // catch-up restart from the same checkpoint sees nothing new
    val q2 = IngestJob.start(spark, logDir, certRoot, s"$root/ckpt",
      logExpiredEntries = true)
    q2.awaitTermination()
    assert(certCount() == 2L, "stop+restart must not re-ingest")
  }

  test("admission cap splits a page across triggers without loss or dups (J4)") {
    val root = Files.createTempDirectory("midpage").toString
    val entries = Seq(leaf1, leafS, leafS2, ca1, leaf1).zipWithIndex.map {
      case (der, i) => entry(i.toLong, ts0 + i, "log.example.com/2025", der)
    }
    CtLog.writePages(s"$root/log", entries, pageSize = 5) // one page, cap 2
    val q = IngestJob.start(spark, s"$root/log", s"$root/out", s"$root/ckpt",
      maxEntriesPerTrigger = 2, logExpiredEntries = true)
    q.awaitTermination()
    // the cap must bind in AvailableNow catch-up too
    // (SupportsTriggerAvailableNow): 5 entries / cap 2 → ≥ 3 batches
    assert(q.recentProgress.count(_.numInputRows > 0) >= 3,
      q.recentProgress.map(p => s"batch=${p.batchId} rows=${p.numInputRows}").toSeq.toString)
    assert(q.recentProgress.forall(_.numInputRows <= 2))
    val certs = spark.read.parquet(s"$root/out/certs")
    // 3 distinct non-CA certs; the duplicate leaf1 and the CA dropped
    assert(certs.count() == 3L)
    assert(certs.select(col("serial_id")).distinct().count() == 3L)
  }

  test("startEntry/limitEntries bound the ingestion window (G3, --offset/--limit)") {
    val root = Files.createTempDirectory("window").toString
    val entries = (0L until 10L).map(i =>
      entry(i, ts0 + i, "log.example.com/2025", Seq(leaf1, leafS, leafS2)((i % 3).toInt)))
    CtLog.writePages(s"$root/log", entries, pageSize = 4)
    // batch read honors the window
    val windowed = spark.read.format("graft.streaming.CtLogSource")
      .option("path", s"$root/log")
      .option("startEntry", 2).option("limitEntries", 5)
      .load()
    assert(windowed.select(col("entry_id")).collect().map(_.getLong(0)).sorted.toSeq ==
      (2L until 7L).toSeq)
    // streaming ingest stops at the limit
    val q = IngestJob.start(spark, s"$root/log", s"$root/out", s"$root/ckpt",
      logExpiredEntries = true, startEntry = 3L, limitEntries = Some(2L))
    q.awaitTermination()
    val ids = spark.read.parquet(s"$root/out/certs")
      .select(col("entry_id")).collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(3L, 4L), s"window [3, 5) expected: $ids")
  }

  test("issuer identity comes from chain(0)'s raw SPKI; empty chains drop (C6/H1)") {
    import spark.implicits._
    val raw = Seq(
      (0L, ts0, "u", leaf1, Seq(ca1)),            // issued by ca1
      (1L, ts0, "u", leafS, Seq(leafS)),          // self-issued
      (2L, ts0, "u", leafS2, Seq.empty),          // C6: no chain → dropped
      (3L, ts0, "u", leafS2, Seq(Array[Byte](1)))) // issuer unparseable → dropped
      .toDF("entry_id", "ts_ms", "log_url", "der", "chain")
    val out = IngestJob.parsedEntries(raw, logExpiredEntries = true,
      issuerCNFilter = Nil, asOf = None)
      .select(col("entry_id"), col("issuer_id")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.keySet == Set(0L, 1L), s"C6/parse guards must drop 2 and 3: $out")
    // NewIssuer(aIssuer) digests the ISSUING cert's RawSubjectPublicKeyInfo
    // (types.go:109-130): base64url(SHA256(spki TLV)) — never the leaf's
    // key, never the D2 SKI fallback.
    def expectedId(der: Array[Byte]): String = {
      val spki = graft.functions.CertFuncs.parseCert(der).spki
      java.util.Base64.getUrlEncoder.encodeToString(
        java.security.MessageDigest.getInstance("SHA-256").digest(spki))
    }
    assert(out(0L) == expectedId(ca1), "leaf1's issuer id = digest of ca1's SPKI")
    assert(out(1L) == expectedId(leafS), "self-issued: digest of own SPKI")
    // regression pin vs the old (wrong) identity: leafS carries an SKI
    // extension, so the D2 fallback path would have digested the SKI
    // bytes instead of the raw SPKI TLV — those must differ
    val skiId = {
      val ski = graft.functions.CertFuncs.parseCert(leafS).ski
      java.util.Base64.getUrlEncoder.encodeToString(
        java.security.MessageDigest.getInstance("SHA-256").digest(ski))
    }
    assert(out(1L) != skiId, "identity must digest the SPKI TLV, not the SKI")
  }

  test("listExpirationDates skips expired buckets, day-truncated (A4/C4)") {
    import spark.implicits._
    val root = Files.createTempDirectory("enum").toString
    Seq("2020-01-10-05", "2020-01-11-00", "2020-01-11-17", "2021-06-01-00")
      .zipWithIndex.map { case (d, i) => (d, "issuerX", s"s$i", "p") }
      .toDF("exp_date", "issuer_id", "serial_id", "pem")
      .write.partitionBy("exp_date", "issuer_id").parquet(s"$root/certs")
    def listedAt(ts: String): Set[String] =
      IngestJob.listExpirationDates(spark, root,
        Some(java.sql.Timestamp.valueOf(ts)))
        .collect().map(_.getString(0)).toSet
    // mid-day reference: truncation to the DAY keeps the whole current
    // day (even hour buckets already past), drops strictly older days
    assert(listedAt("2020-01-11 12:30:00") ==
      Set("2020-01-11-00", "2020-01-11-17", "2021-06-01-00"))
    assert(listedAt("2022-01-01 00:00:00") == Set.empty[String])
    assert(listedAt("2019-01-01 00:00:00").size == 4)
  }

  test("first-seen gate holds ACROSS logs in a multi-log ingest") {
    // the same cert lands in two different logs; the reference's shared
    // dedup set stores it once (filesystemdatabase.go:179-182) — one
    // unioned query with one state gives the same guarantee
    val root = Files.createTempDirectory("multilog").toString
    CtLog.writePages(s"$root/logA", Seq(
      entry(0L, ts0, "log-a.example.com/2025", leaf1),
      entry(1L, ts0 + 1, "log-a.example.com/2025", leafS)))
    CtLog.writePages(s"$root/logB", Seq(
      entry(0L, ts0 + 2, "log-b.example.com/2025", leaf1),   // cross-log dup
      entry(1L, ts0 + 3, "log-b.example.com/2025", leafS2)))
    val q = IngestJob.startAll(spark, Seq(s"$root/logA", s"$root/logB"),
      s"$root/out", s"$root/ckpt", logExpiredEntries = true)
    q.awaitTermination()
    val certs = spark.read.parquet(s"$root/out/certs")
    assert(certs.count() == 3L, "cross-log duplicate must be stored once")
    assert(certs.select(col("serial_id")).distinct().count() == 3L)
    // both logs contributed rows
    assert(certs.select(col("log_url")).distinct().count() >= 2L)
  }

  test("log-list manifest: reorder is canonicalized, edits fail fast") {
    // Spark's offset log keys unioned sources by POSITION; the manifest
    // pins the canonical list so a resume can never apply log A's
    // offsets to log B
    val root = Files.createTempDirectory("manifest").toString
    CtLog.writePages(s"$root/logA", Seq(entry(0L, ts0, "a", leaf1)))
    CtLog.writePages(s"$root/logB", Seq(entry(0L, ts0 + 1, "b", leafS)))
    CtLog.writePages(s"$root/logC", Seq(entry(0L, ts0 + 2, "c", leafS2)))
    val q = IngestJob.startAll(spark, Seq(s"$root/logB", s"$root/logA"),
      s"$root/out", s"$root/ckpt", logExpiredEntries = true)
    q.awaitTermination()
    // resuming with the same set in a different order is fine
    val q2 = IngestJob.startAll(spark, Seq(s"$root/logA", s"$root/logB"),
      s"$root/out", s"$root/ckpt", logExpiredEntries = true)
    q2.awaitTermination()
    assert(spark.read.parquet(s"$root/out/certs").count() == 2L)
    // resuming with an edited list must refuse, not silently misapply
    val err = intercept[IllegalStateException] {
      IngestJob.startAll(spark, Seq(s"$root/logA", s"$root/logC"),
        s"$root/out", s"$root/ckpt", logExpiredEntries = true)
    }
    assert(err.getMessage.contains("log list changed"))
  }

  test("log-list manifest only binds once offsets are committed") {
    // a first start that died before any batch pinned nothing: the
    // corrected list overwrites the manifest instead of failing
    val root = Files.createTempDirectory("manifest0").toString
    val ckpt = s"$root/ckpt"
    IngestJob.checkLogManifest(spark, Seq(s"$root/logX"), ckpt)
    // no offsets yet → a different list is accepted and re-pinned
    assert(IngestJob.checkLogManifest(spark, Seq(s"$root/logY"), ckpt) ==
      Seq(s"$root/logY"))
    // once an offset commit exists, the pinned list is enforced
    Files.createDirectories(java.nio.file.Paths.get(ckpt, "offsets"))
    Files.writeString(java.nio.file.Paths.get(ckpt, "offsets", "0"), "{}")
    intercept[IllegalStateException] {
      IngestJob.checkLogManifest(spark, Seq(s"$root/logZ"), ckpt)
    }
    // and the matching list still passes
    assert(IngestJob.checkLogManifest(spark, Seq(s"$root/logY"), ckpt) ==
      Seq(s"$root/logY"))
  }

  test("committed offsets without a manifest fail fast (unknown source order)") {
    // a pre-manifest-build checkpoint (or one whose manifest file was
    // lost) must NOT silently re-pin the requested list: the stored
    // offsets' source order is unknown, which is exactly the positional
    // misapplication the manifest exists to prevent
    val root = Files.createTempDirectory("manifestlost").toString
    val ckpt = s"$root/ckpt"
    Files.createDirectories(java.nio.file.Paths.get(ckpt, "offsets"))
    Files.writeString(java.nio.file.Paths.get(ckpt, "offsets", "0"), "{}")
    val err = intercept[IllegalStateException] {
      IngestJob.checkLogManifest(spark, Seq(s"$root/logA"), ckpt)
    }
    assert(err.getMessage.contains("no _graft_log_list"))
  }

  test("day-resolution ingest buckets at yyyy-MM-dd with day-start TTL (types.go:21-23)") {
    val root = Files.createTempDirectory("dayres").toString
    val logDir = s"$root/log"
    val certRoot = s"$root/out"
    // a duplicate leaf plus two distinct certs: the first-seen gate must
    // hold on the DAY-resolution triple key
    CtLog.writePages(logDir, Seq(
      entry(0L, ts0, "log.example.com/2025", leaf1),
      entry(1L, ts0 + 1, "log.example.com/2025", leafS),
      entry(2L, ts0 + 2, "log.example.com/2025", leaf1)))
    val q = IngestJob.start(spark, logDir, certRoot, s"$root/ckpt",
      logExpiredEntries = true, hourResolution = false)
    q.awaitTermination()
    val certs = spark.read.parquet(s"$certRoot/certs")
    assert(certs.count() == 2L, "dedup must hold under day buckets")
    // day-id partition values parse as dates, so read-back infers DATE;
    // the string view must be the day id itself
    val ids = certs.select(col("exp_date").cast("string")).collect().map(_.getString(0))
    assert(ids.forall(_.matches("""\d{4}-\d{2}-\d{2}""")), ids.toSeq.toString)
    // kLeadingZeroes expires 2020-02-05, kSyntheticLeaf 2046-08-07: the
    // enumeration cut works on day ids too
    val live = IngestJob.listExpirationDates(spark, certRoot,
      Some(java.sql.Timestamp.valueOf("2021-01-01 00:00:00")))
      .collect().map(_.getString(0)).toSeq
    assert(live == Seq("2046-08-07"), live.toString)
    // day-resolution TTL instant = start of day (types.go:371 midnight)
    assert(IngestJob.expDateExpireMs("2020-02-05") ==
      java.time.LocalDate.parse("2020-02-05").atStartOfDay()
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli)
    // and the hour id of the same instant expires later the same day
    assert(IngestJob.expDateExpireMs("2020-02-05-04") ==
      IngestJob.expDateExpireMs("2020-02-05") + 4L * 3600 * 1000)
    // statistics run over the day store (string-id surface restored)
    val grand = graft.queries.Statistics.report(spark, certRoot).collect()
      .filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.head.getLong(2) == 2L)
    // flipping the resolution against the existing store must refuse —
    // appending hour ids into a day store would interleave key shapes
    val err = intercept[IllegalStateException] {
      IngestJob.start(spark, logDir, certRoot, s"$root/ckpt2",
        logExpiredEntries = true, hourResolution = true)
    }
    assert(err.getMessage.contains("day-resolution"), err.getMessage)
  }

  test("recoveredStartEntries resumes each log from its stored max(entry_id)") {
    // the recovery path for an edited log list: fresh checkpoint,
    // per-log start positions recovered from the cert store itself
    val root = Files.createTempDirectory("recover").toString
    CtLog.writePages(s"$root/logA", Seq(
      entry(0L, ts0, "log-a.example.com/2025", leaf1),
      entry(1L, ts0 + 1, "log-a.example.com/2025", leafS)))
    val q = IngestJob.startAll(spark, Seq(s"$root/logA"),
      s"$root/out", s"$root/ckpt1", logExpiredEntries = true)
    q.awaitTermination()
    // the log list grows (logB appears) → manifest refuses the old
    // checkpoint; recovery computes per-log resume points instead
    CtLog.writePages(s"$root/logB", Seq(
      entry(0L, ts0 + 2, "log-b.example.com/2025", leafS2)))
    val starts = IngestJob.recoveredStartEntries(spark, s"$root/out",
      Seq(s"$root/logA", s"$root/logB"))
    assert(starts(s"$root/logA") == 2L, s"resume past stored entries: $starts")
    assert(starts(s"$root/logB") == 0L, s"new log starts from 0: $starts")
    // fresh checkpoint + recovered starts: logA re-reads nothing, logB
    // ingests from scratch
    val q2 = IngestJob.startAll(spark, Seq(s"$root/logA", s"$root/logB"),
      s"$root/out", s"$root/ckpt2", logExpiredEntries = true,
      startEntries = starts)
    q2.awaitTermination()
    val certs = spark.read.parquet(s"$root/out/certs")
    assert(certs.count() == 3L, "no re-ingest of logA's stored range")
    assert(certs.filter(col("entry_id") === 0L &&
      col("log_url") === "log-a.example.com/2025").count() == 1L)
  }

  test("dedup state evicts when a key's own expiry bucket passes (E2 TTL)") {
    // leaf1 expires 2020-02-05 → its dedup state times out once the
    // watermark (event time − 1h) passes the bucket end; the synthetic
    // leaves expire in 2045/2046 and must stay. The reference gets the
    // same bound from Redis ExpireAt(bucket end),
    // knowncertificates.go:98-104.
    val root = Files.createTempDirectory("ttl").toString
    val wmPush = java.time.Instant.parse("2020-03-01T00:00:00Z").toEpochMilli
    CtLog.writePages(s"$root/log", Seq(
      entry(0L, ts0, "u", leaf1),
      entry(1L, ts0 + 1, "u", leafS),
      // later entries push the watermark far past leaf1's bucket end
      entry(2L, wmPush, "u", leafS2),
      entry(3L, wmPush + 1, "u", leafS2)), pageSize = 1)
    val q = IngestJob.start(spark, s"$root/log", s"$root/out", s"$root/ckpt",
      maxEntriesPerTrigger = 1, logExpiredEntries = true)
    q.awaitTermination()
    val states = q.recentProgress.toSeq.flatMap(_.stateOperators.toSeq)
    val totals = states.map(_.numRowsTotal)
    assert(totals.max >= 3, s"three distinct keys entered state: $totals")
    assert(states.map(_.numRowsRemoved).sum >= 1 && totals.last < totals.max,
      s"expired key's state must be evicted, not retained forever: $totals")
  }

  test("E2 TTL instant is the bucket START (knowncertificates_test.go:85-110)") {
    // reference golden: cert with notAfter 2004-01-20 04:22:19 buckets
    // to 2004-01-20-04 and its dedup state expires at exactly 04:00:00Z
    assert(IngestJob.expDateExpireMs("2004-01-20-04") ==
      java.time.Instant.parse("2004-01-20T04:00:00Z").toEpochMilli)
  }
}

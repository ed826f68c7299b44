package graft.streaming

import graft.{SparkSpec, TestCerts}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.Files
import java.time.Instant

/** F5 observed metrics, J8 staleness probe, B4 serial-list export. */
class ObservabilitySpec extends SparkSpec {

  private def decode(pem: String): Array[Byte] = {
    val body = pem.linesIterator
      .filterNot(l => l.startsWith("-----") || l.isBlank).mkString
    java.util.Base64.getMimeDecoder.decode(body)
  }

  test("ingest parse metrics ride along via observe (F5)") {
    import spark.implicits._
    val listener = new Observability.MetricsListener
    spark.listenerManager.register(listener)
    try {
      val ca = decode(TestCerts.kEmptySPKI)
      val raw = Seq(
        (0L, 1L, "u", decode(TestCerts.kLeadingZeroes), Seq(ca)),
        (1L, 2L, "u", Array[Byte](1, 2, 3), Seq(ca)),  // undecodable → parse error
        (2L, 3L, "u", decode(TestCerts.kSyntheticLeaf), Seq.empty[Array[Byte]]))
        .toDF("entry_id", "ts_ms", "log_url", "der", "chain")
      IngestJob.parsedEntries(raw, logExpiredEntries = true,
        issuerCNFilter = Nil, asOf = None).count()
      // QueryExecutionListener delivery is async; poll briefly
      val deadline = System.currentTimeMillis() + 20000
      var m = listener.get("graft_ingest_parse")
      while (m.isEmpty && System.currentTimeMillis() < deadline) {
        Thread.sleep(100); m = listener.get("graft_ingest_parse")
      }
      assert(m.isDefined, "observed metrics never delivered")
      assert(m.get("n_entries") == 3L)
      assert(m.get("n_parse_errors") == 1L)
      assert(m.get("n_empty_chain") == 1L)
      assert(m.get("n_issuer_parse_errors") == 0L)
    } finally spark.listenerManager.unregister(listener)
  }

  test("health probe: Starting → Ok → Stale (J8, ct-fetch.go:566-608)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Int]
    val q = ms.toDF().writeStream.format("noop")
      .trigger(Trigger.ProcessingTime("50 milliseconds")).start()
    try {
      assert(Observability.health(q, 1000L) == Observability.Starting)
      ms.addData(1, 2, 3)
      val deadline = System.currentTimeMillis() + 20000
      while (q.lastProgress == null && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(q.lastProgress != null, "no progress recorded")
      val at = Instant.parse(q.lastProgress.timestamp)
      assert(Observability.health(q, 60000L, at.plusMillis(1000)) == Observability.Ok)
      assert(Observability.health(q, 1000L, at.plusMillis(60000)) == Observability.Stale)
      assert(Observability.Starting.httpCode == 503 &&
        Observability.Stale.httpCode == 500 && Observability.Ok.httpCode == 200)
    } finally q.stop()
  }

  test("/health endpoint serves 503/500/200 through the query lifecycle (healthAddr)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def get(port: Int): (Int, String, Option[String]) = {
      val conn = new java.net.URI(s"http://127.0.0.1:$port/health").toURL
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      try {
        val code = conn.getResponseCode
        val in = if (code >= 400) conn.getErrorStream else conn.getInputStream
        val body = new String(in.readAllBytes(), "UTF-8")
        (code, body, Option(conn.getHeaderField("Retry-After")))
      } finally conn.disconnect()
    }
    // the clock is injectable; the query thunk lets the server come up
    // before the query exists (reference starts its listener alongside)
    @volatile var q: org.apache.spark.sql.streaming.StreamingQuery = null
    @volatile var now: Instant = Instant.now()
    val srv = Observability.HealthServer.start(":0", 1000L, () => q, () => now)
    try {
      val (c0, b0, retry0) = get(srv.port)
      assert(c0 == 503 && b0.contains("no health updates yet") &&
        retry0.contains("30"))
      val ms = MemoryStream[Int]
      q = ms.toDF().writeStream.format("noop")
        .trigger(Trigger.ProcessingTime("50 milliseconds")).start()
      try {
        ms.addData(1, 2, 3)
        val deadline = System.currentTimeMillis() + 20000
        while (q.lastProgress == null && System.currentTimeMillis() < deadline)
          Thread.sleep(50)
        assert(q.lastProgress != null, "no progress recorded")
        now = Instant.parse(q.lastProgress.timestamp).plusMillis(100)
        val (c1, b1, _) = get(srv.port)
        assert(c1 == 200 && b1.startsWith("ok:"), s"$c1 $b1")
        now = Instant.parse(q.lastProgress.timestamp).plusMillis(60000)
        val (c2, b2, _) = get(srv.port)
        assert(c2 == 500 && b2.contains("longer than 2 * pollingDelayMean"), s"$c2 $b2")
      } finally q.stop()
    } finally srv.close()
  }

  test("compact merges per-batch files and preserves every row") {
    import spark.implicits._
    val root = Files.createTempDirectory("compact").toString
    val mk = (ids: Range) => ids.map(i =>
      ("2030-01-01-00", s"issuer${i % 2}", s"s$i", s"pem$i", i.toLong, i.toLong, "log"))
      .toDF("exp_date", "issuer_id", "serial_id", "pem", "entry_id", "ts_ms", "log_url")
    // three appends → ≥3 files per touched partition
    mk(0 until 4).write.partitionBy("exp_date", "issuer_id").mode("append").parquet(s"$root/certs")
    mk(4 until 8).write.partitionBy("exp_date", "issuer_id").mode("append").parquet(s"$root/certs")
    mk(8 until 12).write.partitionBy("exp_date", "issuer_id").mode("append").parquet(s"$root/certs")
    def files(): Int = {
      val it = java.nio.file.Files.walk(java.nio.file.Paths.get(root, "certs"))
      try it.filter(p => p.toString.endsWith(".parquet")).count().toInt
      finally it.close()
    }
    val before = spark.read.parquet(s"$root/certs")
      .orderBy(col("serial_id")).collect().toSeq
    val nBefore = files()
    IngestJob.compact(spark, root)
    val after = spark.read.parquet(s"$root/certs")
      .orderBy(col("serial_id")).collect().toSeq
    assert(after == before, "compaction must preserve every row")
    assert(files() < nBefore, s"expected fewer files than $nBefore")
  }

  test("compact restores triple-key uniqueness after duplicate appends") {
    import spark.implicits._
    // a late duplicate in the cert's final hour (post state-eviction,
    // pre not_after) re-appends; parquet append is not idempotent the
    // way the reference's per-path file store is — compact() must
    // restore the invariant the statistics rollup counts on
    val root = Files.createTempDirectory("compactdup").toString
    def put(serial: String, entryId: Long) = Seq(
      ("2030-01-01-00", "issuerA", serial, s"pem-$serial", entryId, entryId, "log"))
      .toDF("exp_date", "issuer_id", "serial_id", "pem", "entry_id", "ts_ms", "log_url")
      .write.partitionBy("exp_date", "issuer_id").mode("append").parquet(s"$root/certs")
    put("s1", 1L); put("s2", 2L)
    put("s1", 7L) // the re-admitted duplicate carries a later entry_id
    assert(spark.read.parquet(s"$root/certs").count() == 3L)
    IngestJob.compact(spark, root)
    val after = spark.read.parquet(s"$root/certs")
    assert(after.count() == 2L, "compact must drop triple-key duplicates")
    assert(after.select(col("exp_date"), col("issuer_id"), col("serial_id"))
      .distinct().count() == 2L)
    // the survivor is DETERMINISTIC: the least (log_url, entry_id,
    // ts_ms) row, so re-compacting is byte-for-byte idempotent and a
    // log's max(entry_id) never shifts between compactions
    assert(after.filter(col("serial_id") === "s1").collect()(0)
      .getAs[Long]("entry_id") == 1L, "must keep the first-admitted row")
    val snap1 = after.orderBy(col("serial_id")).collect().toSeq
    IngestJob.compact(spark, root)
    val snap2 = spark.read.parquet(s"$root/certs")
      .orderBy(col("serial_id")).collect().toSeq
    assert(snap1 == snap2, "compact must be idempotent")
  }

  test("manifested compaction: atomic manifest promotion, orphan roll-forward, GC") {
    import spark.implicits._
    import org.apache.hadoop.fs.Path
    val root = Files.createTempDirectory("manifestcompact").toString
    val rootP = new Path(root)
    val fs = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def put(serial: String, entryId: Long) = Seq(
      ("2030-01-01-00", "issuerA", serial, s"pem-$serial", entryId, entryId, "log"))
      .toDF("exp_date", "issuer_id", "serial_id", "pem", "entry_id", "ts_ms", "log_url")
      .write.partitionBy("exp_date", "issuer_id").mode("append").parquet(s"$root/certs")
    put("s1", 1L); put("s2", 2L)
    put("s1", 7L) // re-admitted duplicate, as in the rename-protocol test
    // 1) first compaction seeds from plain certs/, promotes gen 1
    IngestJob.compactManifested(spark, root)
    assert(ManifestStore.currentGen(fs, rootP).contains(1L))
    val snap1 = IngestJob.readCertsManifested(spark, root)
    assert(snap1.count() == 2L, "dedup applies on the manifested path too")
    assert(snap1.filter(col("serial_id") === "s1").collect()(0)
      .getAs[Long]("entry_id") == 1L, "deterministic survivor")
    // 2) crashed writer: a half-written generation dir with NO manifest
    //    is invisible to readers and reclaimed by the next compaction,
    //    whose own generation number moves PAST it
    val orphan = ManifestStore.stagingPath(rootP, ManifestStore.nextGen(fs, rootP))
    fs.mkdirs(orphan)
    val junk = fs.create(new Path(orphan, "part-junk.parquet"), true)
    junk.write("not parquet".getBytes); junk.close()
    assert(IngestJob.readCertsManifested(spark, root).count() == 2L,
      "un-promoted generation must be invisible")
    IngestJob.compactManifested(spark, root)
    assert(!fs.exists(orphan), "orphan generation must be GC'd")
    assert(ManifestStore.currentGen(fs, rootP).exists(_ > 2L),
      "new generation must not reuse the orphan's number")
    val snap2 = IngestJob.readCertsManifested(spark, root)
      .orderBy(col("serial_id")).collect().toSeq
    assert(snap2 == snap1.orderBy(col("serial_id")).collect().toSeq,
      "re-compaction is idempotent on the data")
    // 3) GC keeps exactly one retired generation (in-flight readers of
    //    the previous snapshot finish against intact files)
    val gens = fs.listStatus(new Path(rootP, "gens")).map(_.getPath.getName).sorted
    assert(gens.length == 2, s"current + one retired generation: ${gens.toSeq}")
    // 4) promotion is the commit point: deleting the newest manifest
    //    "uncommits" back to the retained generation (crash just
    //    before promote ≡ this state — readers still see gen N)
    val curGen = ManifestStore.currentGen(fs, rootP).get
    fs.delete(new Path(rootP, f"manifests/m-$curGen%08d"), false)
    assert(ManifestStore.currentGen(fs, rootP).contains(1L))
    assert(IngestJob.readCertsManifested(spark, root).count() == 2L)
  }

  test("compactIssuerBatches folds per-batch upserts into one row per issuer") {
    import spark.implicits._
    val root = Files.createTempDirectory("issuercompact").toString
    // needs a certs dir for compact()'s main pass
    Seq(("2030-01-01-00", "issuerA", "s1", "p", 0L, 0L, "log"))
      .toDF("exp_date", "issuer_id", "serial_id", "pem", "entry_id", "ts_ms", "log_url")
      .write.partitionBy("exp_date", "issuer_id").parquet(s"$root/certs")
    def batch(id: Long, cns: Seq[String], dns: Seq[String], crls: Seq[String], n: Long) =
      Seq(("issuerA", cns, dns, crls, n, id))
        .toDF("issuer_id", "issuer_cns", "issuer_dns", "crl_dps", "n_new", "batch_id")
        .write.mode("append").parquet(s"$root/issuer_batches")
    batch(0L, Seq("ca"), Seq("CN=ca"), Seq("http://a/crl"), 2L)
    batch(1L, Seq("ca"), Seq("CN=ca", "CN=ca2"), Seq.empty, 3L)
    val before = graft.queries.Statistics.issuerDim(spark, root)
      .collect().map(_.toString).sorted.toSeq
    IngestJob.compact(spark, root)
    val rows = spark.read.parquet(s"$root/issuer_batches").collect()
    assert(rows.length == 1, "one snapshot row per issuer after compaction")
    assert(rows.head.getAs[Long]("n_new") == 5L)
    assert(rows.head.getSeq[String](2).toSet == Set("CN=ca", "CN=ca2"))
    // the derived dimension is unchanged by compaction
    val after = graft.queries.Statistics.issuerDim(spark, root)
      .collect().map(_.toString).sorted.toSeq
    assert(after == before)
  }

  test("issuer-batch compaction survives a replayed micro-batch (no double count)") {
    import spark.implicits._
    // a foreachBatch replay re-appends the same (issuer, batch_id) row;
    // the n_new sum must count each batch once
    val root = Files.createTempDirectory("issuerreplay").toString
    Seq(("2030-01-01-00", "issuerA", "s1", "p", 0L, 0L, "log"))
      .toDF("exp_date", "issuer_id", "serial_id", "pem", "entry_id", "ts_ms", "log_url")
      .write.partitionBy("exp_date", "issuer_id").parquet(s"$root/certs")
    def append(id: Long, n: Long) =
      Seq(("issuerA", Seq("ca"), Seq("CN=ca"), Seq.empty[String], n, id))
        .toDF("issuer_id", "issuer_cns", "issuer_dns", "crl_dps", "n_new", "batch_id")
        .write.mode("append").parquet(s"$root/issuer_batches")
    append(0L, 2L)
    append(0L, 2L)  // replayed batch 0
    append(1L, 3L)
    IngestJob.compact(spark, root)
    val row = spark.read.parquet(s"$root/issuer_batches").collect().head
    assert(row.getAs[Long]("n_new") == 5L,
      s"2 + 3, replay of batch 0 counted once: ${row}")
  }

  test("ingest -> compact -> resumed ingest round-trip keeps all rows") {
    // the real maintenance cycle: catch-up ingest, compact between
    // runs, ingest more from the same checkpoint — nothing lost,
    // nothing duplicated
    val root = Files.createTempDirectory("cycle").toString
    def decodePem(pem: String) = decode(pem)
    val leaf1 = decodePem(graft.TestCerts.kLeadingZeroes)
    val ca1 = decodePem(graft.TestCerts.kEmptySPKI)
    val leafS = decodePem(graft.TestCerts.kSyntheticLeaf)
    val leafS2 = decodePem(graft.TestCerts.kSyntheticLeaf2)
    val ts0 = 1000000000000L
    CtLog.writePages(s"$root/log", Seq(
      CtLog.Entry(0L, ts0, "u", leaf1, Seq(ca1)),
      CtLog.Entry(1L, ts0 + 1, "u", leafS, Seq(leafS))))
    IngestJob.start(spark, s"$root/log", s"$root/out", s"$root/ckpt",
      logExpiredEntries = true).awaitTermination()
    IngestJob.compact(spark, s"$root/out")
    CtLog.writePages(s"$root/log", Seq(
      CtLog.Entry(0L, ts0, "u", leaf1, Seq(ca1)),
      CtLog.Entry(1L, ts0 + 1, "u", leafS, Seq(leafS)),
      CtLog.Entry(2L, ts0 + 2, "u", leaf1, Seq(ca1)),      // dup post-compact
      CtLog.Entry(3L, ts0 + 3, "u", leafS2, Seq(leafS2)))) // new
    IngestJob.start(spark, s"$root/log", s"$root/out", s"$root/ckpt",
      logExpiredEntries = true).awaitTermination()
    val certs = spark.read.parquet(s"$root/out/certs")
    assert(certs.count() == 3L, "2 pre-compact + 1 new, dup suppressed")
    assert(certs.select(col("serial_id")).distinct().count() == 3L)
    assert(graft.queries.Statistics.issuerDim(spark, s"$root/out").count() == 3L)
  }

  test("recoverCompaction rolls a half-completed swap forward") {
    import spark.implicits._
    val root = Files.createTempDirectory("recover").toString
    val df = (0 until 6).map(i => ("2030-01-01-00", s"issuer${i % 2}", s"s$i", s"pem$i"))
      .toDF("exp_date", "issuer_id", "serial_id", "pem")
    df.write.partitionBy("exp_date", "issuer_id").parquet(s"$root/certs")
    val rows = spark.read.parquet(s"$root/certs")
      .orderBy(col("serial_id")).collect().toSeq
    // simulate the worst crash window: staged rewrite committed, marker
    // created, live renamed aside — process died before staged→live
    df.repartition(col("exp_date"), col("issuer_id"))
      .write.partitionBy("exp_date", "issuer_id").parquet(s"$root/certs_compacting")
    java.nio.file.Files.createFile(java.nio.file.Paths.get(root, "_COMPACT_SWAP"))
    java.nio.file.Files.move(
      java.nio.file.Paths.get(root, "certs"), java.nio.file.Paths.get(root, "certs_old"))
    IngestJob.recoverCompaction(spark, root)
    assert(spark.read.parquet(s"$root/certs")
      .orderBy(col("serial_id")).collect().toSeq == rows,
      "recovery must leave a complete live directory")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(root, "_COMPACT_SWAP")))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(root, "certs_old")))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(root, "certs_compacting")))
    // idempotent: calling again with no marker is a no-op
    IngestJob.recoverCompaction(spark, root)
    assert(spark.read.parquet(s"$root/certs").count() == 6L)
  }

  test("exportSerialLists writes sorted hex serial files (B4 golden)") {
    import spark.implicits._
    val root = Files.createTempDirectory("export").toString
    // serial ids are base64url of the raw serial bytes; the reference
    // golden uses raw serials 0x01, 0x02, 0x03 out of order
    def id(b: Array[Byte]) = java.util.Base64.getUrlEncoder.encodeToString(b)
    Seq(
      ("2030-01-01-00", "issuerA", id(Array(3.toByte))),
      ("2030-01-01-00", "issuerA", id(Array(1.toByte))),
      ("2030-01-01-00", "issuerA", id(Array(2.toByte))),
      ("2030-01-01-00", "issuerB", id(Array(0.toByte, 0xAA.toByte))),
      ("2030-01-02-00", "issuerA", id(Array(9.toByte))))
      .toDF("exp_date", "issuer_id", "serial_id")
      .write.partitionBy("exp_date", "issuer_id").parquet(s"$root/certs")

    IngestJob.exportSerialLists(spark, root, s"$root/serials")

    // the reference's file-byte golden: "01\n02\n03\n" = 30310A30320A30330A
    // (localdiskbackend_test.go:60-85)
    val dirA = new java.io.File(s"$root/serials/exp_date=2030-01-01-00/issuer_id=issuerA")
    val partFile = dirA.listFiles.filter(_.getName.startsWith("part-")).head
    val bytes = java.nio.file.Files.readAllBytes(partFile.toPath)
    assert(bytes.map("%02X".format(_)).mkString == "30310A30320A30330A",
      s"file bytes must match the reference golden: ${new String(bytes)}")
    def readDir(p: String): Seq[String] =
      spark.read.text(p).collect().map(_.getString(0)).toSeq
    assert(readDir(s"$root/serials/exp_date=2030-01-01-00/issuer_id=issuerB") == Seq("00aa"),
      "leading-zero serials keep their zero byte in hex")
    assert(readDir(s"$root/serials/exp_date=2030-01-02-00/issuer_id=issuerA") == Seq("09"))
  }
}

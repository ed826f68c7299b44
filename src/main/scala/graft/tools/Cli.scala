package graft.tools

import graft.config.GraftConfig
import graft.queries.Statistics
import graft.streaming.{CtLogTransport, IngestJob, Observability}
import org.apache.spark.sql.SparkSession

/** The reference's three binaries as thin CLI mains over the library —
  * a ct-mapreduce user maps each command 1:1:
  *
  *   ct-fetch            → graft.tools.CtFetch [-config f] [-offset n] [-limit n]
  *   storage-statistics  → graft.tools.StorageStatistics [-config f]
  *   ct-getcert          → graft.tools.CtGetCert <logDir> <entryId>
  *                         | CtGetCert -log <url|dir> -index <i>  (storeless)
  *
  * Config keys/precedence match config/config.go (see GraftConfig).
  */
object Cli {
  /** Session for a CLI main. When embedded (tests, notebooks) an
    * active session is reused and `stop` becomes a no-op — the CLI
    * only tears down what it created. */
  private[tools] def session(name: String): (SparkSession, () => Unit) = {
    val preexisting = SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession).isDefined
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(name)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    (s, () => if (!preexisting) s.stop())
  }
}

/** Streaming ingest (cmd/ct-fetch/ct-fetch.go:490-638): ALL configured
  * logs feed one streaming query (union of per-log sources), so the
  * first-seen dedup gate holds across logs exactly as the reference's
  * shared Redis set does; the single checkpoint under
  * `<certPath>/state/ingest` carries every log's offsets (the
  * reference's per-log `log::<url>` blobs in one store). */
object CtFetch {
  def main(args: Array[String]): Unit = {
    val cfg = GraftConfig.load(args.toSeq)
    require(cfg.logList.nonEmpty, "logList is required (ini/env)")
    require(cfg.certPath.nonEmpty, "certPath is required (ini/env)")
    val (spark, stop) = Cli.session("ct-fetch")
    spark.sparkContext.setLogLevel("WARN")
    // /health on cfg.healthAddr, up BEFORE the query (503 until the
    // first progress — ct-fetch.go:566-608 starts its listener alongside
    // the downloaders the same way)
    @volatile var query: org.apache.spark.sql.streaming.StreamingQuery = null
    val pollMs = GraftConfig.goDurationToSpark(cfg.pollingDelayMean)
      .stripSuffix(" milliseconds").toLong
    val health = Observability.HealthServer.start(cfg.healthAddr, pollMs, () => query)
    val q = IngestJob.startAll(spark, cfg.logList,
      certRoot = cfg.certPath,
      checkpoint = s"${cfg.certPath}/state/ingest",
      logExpiredEntries = cfg.logExpiredEntries,
      issuerCNFilter = cfg.issuerCNFilter,
      runForever = cfg.runForever,
      pollInterval = cfg.pollTrigger,
      startEntry = cfg.offset,
      limitEntries = if (cfg.limit > 0) Some(cfg.limit) else None,
      hourResolution = cfg.hourResolution)
    query = q
    try q.awaitTermination() finally health.close()
    println(s"[ct-fetch] ${q.name}: health=${Observability.health(q, pollMs)}")
    stop()
  }
}

/** Batch rollup report (cmd/storage-statistics/storage-statistics.go:22-100).
  * `-v 2` additionally lists each bucket's serials, `-v 3` each
  * serial's encodings plus its PEM (storage-statistics.go:57-75).
  * Dumps stream through `toLocalIterator`, so the driver never holds
  * more than one partition of certs. */
object StorageStatistics {
  def main(args: Array[String]): Unit = {
    val cfg = GraftConfig.load(args.toSeq)
    require(cfg.certPath.nonEmpty, "certPath is required (ini/env)")
    val verbosity = args.toSeq.sliding(2).collectFirst {
      case Seq("-v", v) => v.toInt }.getOrElse(1)
    val (spark, stop) = Cli.session("storage-statistics")
    spark.sparkContext.setLogLevel("WARN")
    Statistics.report(spark, cfg.certPath).collect().foreach { r =>
      val issuer = if (r.isNullAt(0)) "<total>" else r.getString(0)
      val exp = if (r.isNullAt(1)) "<all dates>" else r.getString(1)
      println(s"$issuer\t$exp\tserials=${r.getLong(2)}" +
        (if (r.isNullAt(1) && !r.isNullAt(0))
          s"\tdns=${r.get(3)}\tcrls=${r.get(4)}" else ""))
    }
    // per-log sync report (storage-statistics.go:86-99: GetLogState per
    // log), derived from the stored data: latest entry + entry time
    locally {
      import org.apache.spark.sql.functions._
      spark.read.parquet(s"${cfg.certPath}/certs")
        .groupBy(col("log_url"))
        .agg(max(col("entry_id")).as("max_entry"),
          max(timestamp_millis(col("ts_ms"))).as("last_entry_time"),
          count(lit(1)).as("n_stored"))
        .orderBy(col("log_url"))
        .collect().foreach { r =>
          println(s"log ${r.getString(0)}\tmaxEntry=${r.getLong(1)}" +
            s"\tlastEntryTime=${r.getTimestamp(2)}\tstored=${r.getLong(3)}")
        }
    }
    if (verbosity >= 2) {
      import org.apache.spark.sql.functions._
      // serial_id is base64url of the raw serial bytes; recover the
      // hex form the reference logs alongside it (types.go:210-224)
      val certs = spark.read.parquet(s"${cfg.certPath}/certs")
        .select(col("exp_date"), col("issuer_id"), col("serial_id"),
          lower(hex(unbase64(translate(col("serial_id"), "-_", "+/")))).as("serial_hex"),
          col("pem"))
        .orderBy(col("issuer_id"), col("exp_date"), col("serial_id"))
      certs.toLocalIterator().forEachRemaining { r =>
        println(s"  ${r.getString(1)}/${r.getString(0)} serial " +
          s"hex={${r.getString(3)}} id={${r.getString(2)}}")
        if (verbosity >= 3) println(r.getString(4))
      }
    }
    stop()
  }
}

/** Point query (cmd/ct-getcert/ct-getcert.go:16-57): one entry by log
  * position, PEM to stdout. Two modes, like the reference:
  *
  *   CtGetCert <certRoot> <logUrl> <entryId>   — from the ingested store
  *   CtGetCert -log <url|dir> -index <i>       — straight from the log
  *
  * The `-log` mode is the reference's actual behavior (GetRawEntries
  * (idx, idx) → PEM, ct-getcert.go:32-56): no local store, no Spark
  * session — one transport fetch on the driver. */
object CtGetCert {
  /** Driver-side DER → PEM, the same 64-char-line block
    * [[graft.functions.CertFuncs.derToPem]] emits plan-side. */
  private[tools] def pem(der: Array[Byte]): String =
    "-----BEGIN CERTIFICATE-----\n" +
      java.util.Base64.getEncoder.encodeToString(der).grouped(64).mkString("\n") +
      "\n-----END CERTIFICATE-----"

  def main(args: Array[String]): Unit = args.toSeq match {
    case Seq("-log", path, "-index", idx) =>
      val i = idx.toLong
      val it = CtLogTransport.specFor(path, _ => None).transport.readRange(i, i + 1)
      if (it.hasNext) println(pem(it.next().der))
      else System.err.println(s"entry $idx not found")
    case Seq(certRoot, logUrl, entryId) =>
      val (spark, stop) = Cli.session("ct-getcert")
      spark.sparkContext.setLogLevel("WARN")
      val rows = Statistics.certPemByEntry(spark, certRoot, logUrl, entryId.toLong)
        .collect()
      if (rows.isEmpty) System.err.println(s"entry $entryId not found")
      else println(rows.head.getString(0))
      stop()
    case other =>
      System.err.println("usage: CtGetCert <certRoot> <logUrl> <entryId> " +
        "| CtGetCert -log <url|dir> -index <i>")
  }
}

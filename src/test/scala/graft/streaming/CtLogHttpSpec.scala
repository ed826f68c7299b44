package graft.streaming

import graft.{SparkSpec, TestCerts}
import org.apache.spark.sql.functions._

import java.util.Base64
import java.util.concurrent.atomic.AtomicInteger

/** The HTTP transport against an in-process RFC 6962 log server
  * (localhost, zero egress): get-sth/get-entries paging, TLS-struct
  * decode for x509 AND precert entries, §4.6 short pages, and the
  * 429 backoff-and-retry posture (ct-fetch.go:409-413). */
class CtLogHttpSpec extends SparkSpec {

  private def decode(pem: String): Array[Byte] = {
    val body = pem.linesIterator
      .filterNot(l => l.startsWith("-----") || l.isBlank).mkString
    java.util.Base64.getMimeDecoder.decode(body)
  }

  lazy val leaf1 = decode(TestCerts.kLeadingZeroes)
  lazy val leafS = decode(TestCerts.kSyntheticLeaf)
  lazy val ca1 = decode(TestCerts.kEmptySPKI)

  private val ts0 = 1000000000000L

  /** (leaf_input, extra_data) pairs served as the log's entries. */
  private def wireEntries(n: Int): IndexedSeq[(Array[Byte], Array[Byte])] =
    (0 until n).map { i =>
      if (i % 5 == 4) {
        // a precert entry: submitted precert in extra_data (what the
        // engine must store, ct-fetch.go:201-203); TBS in the leaf
        (CtLogWire.encodePrecertLeaf(ts0 + i, new Array[Byte](32),
          Array[Byte](1, 2, 3)),
          CtLogWire.encodePrecertExtra(leafS, Seq(leafS)))
      } else {
        val der = if (i % 2 == 0) leaf1 else leafS
        (CtLogWire.encodeX509Leaf(ts0 + i, der),
          CtLogWire.encodeX509Extra(if (i % 2 == 0) Seq(ca1) else Seq(der)))
      }
    }

  /** Minimal RFC 6962 server: honors start/end, serves at most
    * `maxPage` entries per request (`overDeliver` ignores the
    * requested end and sends maxPage entries regardless — a buggy
    * server), optionally 429s the first `deny429` get-entries calls. */
  private def startServer(entries: IndexedSeq[(Array[Byte], Array[Byte])],
      maxPage: Int = 1000, deny429: Int = 0, overDeliver: Boolean = false,
      denyCode: Int = 429)
      : (com.sun.net.httpserver.HttpServer, AtomicInteger, AtomicInteger) = {
    val calls = new AtomicInteger(0)
    val denied = new AtomicInteger(0)
    val srv = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress(0), 0)
    def respond(x: com.sun.net.httpserver.HttpExchange, code: Int, body: String): Unit = {
      val b = body.getBytes("UTF-8")
      x.sendResponseHeaders(code, b.length.toLong)
      val out = x.getResponseBody
      try out.write(b) finally out.close()
    }
    srv.createContext("/ct/v1/get-sth", (x: com.sun.net.httpserver.HttpExchange) =>
      respond(x, 200, s"""{"tree_size":${entries.length},"timestamp":$ts0}"""))
    srv.createContext("/ct/v1/get-entries", (x: com.sun.net.httpserver.HttpExchange) => {
      calls.incrementAndGet()
      if (denied.get < deny429) {
        denied.incrementAndGet()
        respond(x, denyCode, "slow down")
      } else {
        val q = x.getRequestURI.getQuery.split("&")
          .map(_.split("=", 2)).map(a => a(0) -> a(1)).toMap
        val start = q("start").toInt
        val reqEnd = if (overDeliver) Int.MaxValue else q("end").toInt
        val end = math.min(math.min(reqEnd, start + maxPage - 1),
          entries.length - 1)
        val body = (start to end).map { i =>
          val (leaf, extra) = entries(i)
          s"""{"leaf_input":"${Base64.getEncoder.encodeToString(leaf)}",""" +
            s""""extra_data":"${Base64.getEncoder.encodeToString(extra)}"}"""
        }.mkString("""{"entries":[""", ",", "]}")
        respond(x, 200, body)
      }
    })
    srv.start()
    (srv, calls, denied)
  }

  test("wire codec round-trips x509 and precert entries") {
    val x = CtLogWire.decodeEntry(
      CtLogWire.encodeX509Leaf(ts0, leaf1), CtLogWire.encodeX509Extra(Seq(ca1, leafS)))
    assert(x.tsMs == ts0 && !x.precert)
    assert(x.der.toSeq == leaf1.toSeq)
    assert(x.chain.map(_.toSeq) == Seq(ca1.toSeq, leafS.toSeq))
    val p = CtLogWire.decodeEntry(
      CtLogWire.encodePrecertLeaf(ts0 + 1, new Array[Byte](32), Array[Byte](9)),
      CtLogWire.encodePrecertExtra(leafS, Seq(ca1)))
    assert(p.tsMs == ts0 + 1 && p.precert)
    assert(p.der.toSeq == leafS.toSeq, "precert entries store the SUBMITTED precert")
    assert(p.chain.map(_.toSeq) == Seq(ca1.toSeq))
  }

  test("batch read pages get-entries over HTTP, one partition per page") {
    val (srv, calls, _) = startServer(wireEntries(25))
    try {
      val url = s"http://127.0.0.1:${srv.getAddress.getPort}"
      val df = spark.read.format("ctlog")
        .option("path", url).option("pageSize", 10).load()
      // ONE action (each action re-runs the scan end to end)
      val rows = df.select(col("entry_id"), col("log_url")).collect()
      assert(rows.length == 25)
      assert(rows.map(_.getLong(0)).distinct.length == 25)
      // every entry carries the shortURL state key (scheme stripped)
      assert(rows.map(_.getString(1)).distinct.toSeq ==
        Seq(s"127.0.0.1:${srv.getAddress.getPort}"))
      // 25 entries / pageSize 10 → 3 get-entries calls (3 partitions)
      assert(calls.get == 3, s"expected 3 paged fetches, saw ${calls.get}")
      assert(CtLog.logUrlOf(url).contains(s"127.0.0.1:${srv.getAddress.getPort}"))
    } finally srv.stop(0)
  }

  test("§4.6 short pages: the range loop advances by what arrived") {
    val (srv, calls, _) = startServer(wireEntries(20), maxPage = 3)
    try {
      val url = s"http://127.0.0.1:${srv.getAddress.getPort}"
      val df = spark.read.format("ctlog")
        .option("path", url).option("pageSize", 10).load()
      assert(df.collect().length == 20) // ONE action
      // 2 planned partitions of 10, each needing ceil(10/3)=4 fetches
      assert(calls.get == 8, s"expected 8 short-page fetches, saw ${calls.get}")
    } finally srv.stop(0)
  }

  test("429 responses back off and retry, then succeed (ct-fetch.go:409-413)") {
    val (srv, _, denied) = startServer(wireEntries(6), deny429 = 2)
    try {
      val url = s"http://127.0.0.1:${srv.getAddress.getPort}"
      val t0 = System.nanoTime()
      val df = spark.read.format("ctlog")
        .option("path", url).option("backoffBaseMs", 20).load()
      assert(df.count() == 6L)
      assert(denied.get == 2, "both denials must have been consumed by retries")
      // and the retries actually waited (2 backoffs ≥ 0.8×20ms each)
      assert((System.nanoTime() - t0) / 1e6 >= 30.0)
    } finally srv.stop(0)
  }

  test("an over-delivering server cannot bleed entries across partition bounds") {
    // the server ignores the requested end and always sends what it has;
    // without the client-side truncation every partition would re-emit
    // the following partitions' entries
    val (srv, _, _) = startServer(wireEntries(20), overDeliver = true)
    try {
      val url = s"http://127.0.0.1:${srv.getAddress.getPort}"
      val ids = spark.read.format("ctlog")
        .option("path", url).option("pageSize", 5).load()
        .select(col("entry_id")).collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == (0L until 20L), s"duplicated/bled entries: $ids")
    } finally srv.stop(0)
  }

  test("retries exhaust loudly, not silently, when the log keeps refusing") {
    val (srv, _, _) = startServer(wireEntries(5), deny429 = 1000)
    try {
      val url = s"http://127.0.0.1:${srv.getAddress.getPort}"
      val err = intercept[Exception] {
        spark.read.format("ctlog")
          .option("path", url).option("backoffBaseMs", 1)
          .option("maxRetries", 2).load().count()
      }
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: causes(t.getCause)
      assert(causes(err).exists(_.getMessage != null) &&
        causes(err).flatMap(c => Option(c.getMessage)).exists(_.contains("HTTP 429")),
        s"expected an HTTP 429 failure after retries: $err")
    } finally srv.stop(0)
  }

  test("permanent 4xx (404) fails after ONE attempt, no backoff burn") {
    // a typo'd or retired log URL must surface immediately, not after
    // maxRetries x up-to-5-min sleeps (only 429/5xx are transient)
    val (srv, calls, _) = startServer(wireEntries(5), deny429 = 1000,
      denyCode = 404)
    try {
      val url = s"http://127.0.0.1:${srv.getAddress.getPort}"
      val t0 = System.nanoTime()
      val err = intercept[Exception] {
        spark.read.format("ctlog")
          .option("path", url).option("backoffBaseMs", 60000)
          .load().count()
      }
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: causes(t.getCause)
      assert(causes(err).flatMap(c => Option(c.getMessage))
        .exists(m => m.contains("HTTP 404") && m.contains("permanent")),
        s"expected a permanent HTTP 404 failure: $err")
      assert(calls.get == 1, s"404 must not be retried, saw ${calls.get} calls")
      // and we did NOT sleep a 60 s backoff before failing
      assert((System.nanoTime() - t0) / 1e9 < 30.0)
    } finally srv.stop(0)
  }

  test("5xx is transient: backs off, retries, then succeeds") {
    val (srv, _, denied) = startServer(wireEntries(6), deny429 = 2,
      denyCode = 503)
    try {
      val url = s"http://127.0.0.1:${srv.getAddress.getPort}"
      val df = spark.read.format("ctlog")
        .option("path", url).option("backoffBaseMs", 5).load()
      assert(df.count() == 6L)
      assert(denied.get == 2, "both 503s must have been retried through")
    } finally srv.stop(0)
  }

  test("streaming ingest end-to-end over the HTTP transport") {
    val (srv, _, _) = startServer(wireEntries(10))
    try {
      val url = s"http://127.0.0.1:${srv.getAddress.getPort}"
      val root = java.nio.file.Files.createTempDirectory("httpingest").toString
      val q = IngestJob.start(spark, url, s"$root/out", s"$root/ckpt",
        maxEntriesPerTrigger = 4, logExpiredEntries = true)
      q.awaitTermination()
      val certs = spark.read.parquet(s"$root/out/certs")
      // 10 wire entries: leaf1/leafS alternating + 2 precerts whose
      // submitted cert is leafS and 1-2-3 TBS; distinct ingestible
      // certs after the first-seen gate = {leaf1, leafS}
      assert(certs.count() == 2L, "dedup must hold across HTTP pages")
      assert(certs.select(col("log_url")).distinct().collect()
        .map(_.getString(0)).toSeq == Seq(s"127.0.0.1:${srv.getAddress.getPort}"))
    } finally srv.stop(0)
  }
}

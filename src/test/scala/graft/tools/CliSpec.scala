package graft.tools

import graft.{SparkSpec, TestCerts}
import graft.streaming.CtLog
import java.nio.file.Files

/** End-to-end CLI smoke: ct-fetch ingests from an ini config,
  * storage-statistics reports (all verbosity levels), ct-getcert
  * emits the PEM — the reference's three binaries driven exactly as a
  * ct-mapreduce user would drive them. */
class CliSpec extends SparkSpec {

  private def decode(pem: String): Array[Byte] = {
    val body = pem.linesIterator
      .filterNot(l => l.startsWith("-----") || l.isBlank).mkString
    java.util.Base64.getMimeDecoder.decode(body)
  }

  private def captureOut(f: => Unit): String = {
    val bos = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(bos, true, "UTF-8"))(f)
    bos.toString("UTF-8")
  }

  lazy val root: String = {
    spark // shared session up first so the CLI reuses instead of owning it
    val root = Files.createTempDirectory("cli").toString
    val ca = decode(TestCerts.kEmptySPKI)
    val entries = Seq(
      decode(TestCerts.kLeadingZeroes) -> Seq(ca),
      decode(TestCerts.kSyntheticLeaf) -> Seq(decode(TestCerts.kSyntheticLeaf)))
      .zipWithIndex.map { case ((der, chain), i) =>
        CtLog.Entry(i.toLong, 1000000000000L + i, "log.example.com/2025", der, chain)
      }
    CtLog.writePages(s"$root/log", entries, pageSize = 10)
    Files.writeString(java.nio.file.Paths.get(root, "ct-fetch.ini"),
      s"""# reference-style ini (config.go:18-39)
         |logList = $root/log
         |certPath = $root/out
         |logExpiredEntries = true
         |healthAddr = :0
         |""".stripMargin)
    root
  }

  test("CtFetch ingests from ini config and reports health") {
    val out = captureOut {
      CtFetch.main(Array("-config", s"$root/ct-fetch.ini"))
    }
    assert(out.contains("health=Ok"), out)
    assert(spark.read.parquet(s"$root/out/certs").count() == 2L)
    assert(!spark.sparkContext.isStopped, "CLI must not stop a session it reused")
  }

  test("StorageStatistics prints report, serials at -v 2, PEMs at -v 3") {
    CtFetch.main(Array("-config", s"$root/ct-fetch.ini")) // idempotent resume
    val v1 = captureOut {
      StorageStatistics.main(Array("-config", s"$root/ct-fetch.ini"))
    }
    assert(v1.contains("<total>\t<all dates>\tserials=2"), v1)
    assert(v1.contains("log log.example.com/2025\tmaxEntry=1"), v1)
    val v2 = captureOut {
      StorageStatistics.main(Array("-config", s"$root/ct-fetch.ini", "-v", "2"))
    }
    // kLeadingZeroes: serial 0x00AA → hex 00aa, id AKo= (types_test.go:81-101)
    assert(v2.contains("hex={00aa} id={AKo=}"), v2)
    assert(!v2.contains("BEGIN CERTIFICATE"))
    val v3 = captureOut {
      StorageStatistics.main(Array("-config", s"$root/ct-fetch.ini", "-v", "3"))
    }
    assert(v3.contains("-----BEGIN CERTIFICATE-----"), v3)
  }

  test("CtGetCert prints the PEM for a log position") {
    CtFetch.main(Array("-config", s"$root/ct-fetch.ini"))
    val out = captureOut {
      CtGetCert.main(Array(s"$root/out", "log.example.com/2025", "1"))
    }
    assert(out.contains("-----BEGIN CERTIFICATE-----"), out)
    // round-trips to the ingested DER
    val der = graft.functions.CertFuncs.parseCert(
      decode(TestCerts.kSyntheticLeaf))
    assert(der != null)
  }

  test("CtGetCert -log -index fetches straight from the log, no store") {
    // the reference's actual ct-getcert behavior (ct-getcert.go:32-56):
    // GetRawEntries(idx, idx) → PEM, no local store involved
    root // materialize the fixture log
    val golden = decode(TestCerts.kLeadingZeroes)
    // 1) directory transport
    val out = captureOut {
      CtGetCert.main(Array("-log", s"$root/log", "-index", "0"))
    }
    assert(java.util.Arrays.equals(decode(out), golden),
      "directory-mode PEM must round-trip to the exact stored DER")
    // 2) HTTP transport: a minimal RFC 6962 server over the same entries
    import graft.streaming.CtLogWire
    val ca = decode(TestCerts.kEmptySPKI)
    val leaf = CtLogWire.encodeX509Leaf(1000000000000L, golden)
    val extra = CtLogWire.encodeX509Extra(Seq(ca))
    val srv = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress(0), 0)
    def respond(x: com.sun.net.httpserver.HttpExchange, body: String): Unit = {
      val b = body.getBytes("UTF-8")
      x.sendResponseHeaders(200, b.length.toLong)
      val os = x.getResponseBody
      try os.write(b) finally os.close()
    }
    val b64 = java.util.Base64.getEncoder
    srv.createContext("/ct/v1/get-sth",
      (x: com.sun.net.httpserver.HttpExchange) =>
        respond(x, """{"tree_size":1,"timestamp":1000000000000}"""))
    srv.createContext("/ct/v1/get-entries",
      (x: com.sun.net.httpserver.HttpExchange) => respond(x,
        s"""{"entries":[{"leaf_input":"${b64.encodeToString(leaf)}",""" +
          s""""extra_data":"${b64.encodeToString(extra)}"}]}"""))
    srv.start()
    try {
      val httpOut = captureOut {
        CtGetCert.main(Array("-log",
          s"http://127.0.0.1:${srv.getAddress.getPort}", "-index", "0"))
      }
      assert(java.util.Arrays.equals(decode(httpOut), golden),
        "HTTP-mode PEM must round-trip to the exact served DER")
      assert(httpOut.trim == out.trim, "both transports print one PEM block")
    } finally srv.stop(0)
  }
}

package graft.queries

import graft.{SparkSpec, TestCerts}
import graft.streaming.{CtLog, IngestJob}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The storage-statistics report (§3.2) end-to-end over an ingested
  * layout: ingest fixture certs through the streaming pipeline, then
  * check every report level against hand-computed truths.
  */
class StatisticsSpec extends SparkSpec {

  private def decode(pem: String): Array[Byte] = {
    val body = pem.linesIterator
      .filterNot(l => l.startsWith("-----") || l.isBlank).mkString
    java.util.Base64.getMimeDecoder.decode(body)
  }

  private lazy val certRoot: String = {
    val root = Files.createTempDirectory("stats").toString
    // kLeadingZeroes chains to its real issuer kEmptySPKI; the
    // synthetic leaves are self-signed → three distinct issuers
    val ca = decode(TestCerts.kEmptySPKI)
    val entries = Seq(
      decode(TestCerts.kLeadingZeroes) -> Seq(ca),
      decode(TestCerts.kSyntheticLeaf) -> Seq(decode(TestCerts.kSyntheticLeaf)),
      decode(TestCerts.kSyntheticLeaf2) -> Seq(decode(TestCerts.kSyntheticLeaf2)),
      decode(TestCerts.kLeadingZeroes) -> Seq(ca))   // dup → dedup'd
      .zipWithIndex.map { case ((der, chain), i) =>
        CtLog.Entry(i.toLong, 1000000000000L + i, "log.example.com/2025", der, chain)
      }
    CtLog.writePages(s"$root/log", entries, pageSize = 10)
    IngestJob.start(spark, s"$root/log", s"$root/out", s"$root/ckpt",
      logExpiredEntries = true).awaitTermination()
    s"$root/out"
  }

  test("report: per-cell, per-issuer subtotal, grand total (storage-statistics.go:33-82)") {
    val rows = Statistics.report(spark, certRoot).collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length == 1 && grand.head.getLong(2) == 3L,
      s"grand total must count 3 distinct serials: ${rows.toSeq}")
    // each fixture cert names a different issuer ("ca", "synthetic
    // leaf", "second leaf") → three subtotal rows of one serial each
    val issuerTotals = rows.filter(r => !r.isNullAt(0) && r.isNullAt(1))
    assert(issuerTotals.map(_.getLong(2)).sorted.toSeq == Seq(1L, 1L, 1L))
    val cells = rows.filter(r => !r.isNullAt(0) && !r.isNullAt(1))
    assert(cells.map(_.getLong(2)).sum == 3L)
    // dimension joined on issuer rows: every issuer has ≥1 distinct DN
    assert(issuerTotals.forall(r => r.getLong(3) >= 1L))
  }

  test("issuerDim accumulates distinct DNs across batches (E3)") {
    val dim = Statistics.issuerDim(spark, certRoot).collect()
    assert(dim.length == 3, s"three issuers expected: ${dim.toSeq}")
    assert(dim.forall(_.getSeq[String](1).nonEmpty))
  }

  test("rollup sums per-bucket set sizes: equal serials under different " +
      "issuers count separately (storage-statistics.go:52-53,82)") {
    import spark.implicits._
    val root = Files.createTempDirectory("stats2").toString
    // two issuers share serial "s1" — SCARD-sum semantics require the
    // grand total to be 3, not 2 (a distinct-over-serials would collapse)
    Seq(
      ("2030-01-01-00", "issuerA", "s1"),
      ("2030-01-01-00", "issuerB", "s1"),
      ("2030-01-02-00", "issuerA", "s2"))
      .toDF("exp_date", "issuer_id", "serial_id")
      .write.partitionBy("exp_date", "issuer_id").parquet(s"$root/certs")
    Seq(("issuerA", Seq("dnA"), Seq.empty[String]),
      ("issuerB", Seq("dnB"), Seq.empty[String]))
      .toDF("issuer_id", "issuer_dns", "crl_dps")
      .write.parquet(s"$root/issuer_batches")
    val rows = Statistics.report(spark, root).collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1)).head
    assert(grand.getLong(2) == 3L, s"grand total must sum buckets: ${rows.toSeq}")
    val subA = rows.filter(r => !r.isNullAt(0) && r.isNullAt(1) &&
      r.getString(0) == "issuerA").head
    assert(subA.getLong(2) == 2L, "issuerA subtotal sums its two buckets")
  }

  test("certPem point reads return exactly the stored PEM (§3.3)") {
    val one = spark.read.parquet(s"$certRoot/certs")
      .select(col("exp_date"), col("issuer_id"), col("serial_id"), col("pem"),
        col("log_url"), col("entry_id"))
      .collect().head
    val byKey = Statistics.certPem(spark, certRoot,
      one.getString(0), one.getString(1), one.getString(2)).collect()
    assert(byKey.length == 1 && byKey.head.getString(0) == one.getString(3))
    val byEntry = Statistics.certPemByEntry(spark, certRoot,
      one.getString(4), one.getLong(5)).collect()
    assert(byEntry.length == 1 && byEntry.head.getString(0) == one.getString(3))
  }
}

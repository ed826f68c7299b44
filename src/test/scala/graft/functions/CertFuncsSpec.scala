package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Golden conformance cases carried over from the reference's own test
  * fixtures (FIXTURES.md §A) — implementation-independent truths: the
  * same inputs must produce the same digests/encodings here as in
  * /root/reference/storage/{types,filesystemdatabase}_test.go.
  */
class CertFuncsSpec extends SparkSpec {
  import spark.implicits._

  import graft.TestCerts.{kLeadingZeroes, kEmptySPKI, kRealSPKI}

  lazy val parsed = {
    val df = Seq(
      ("leading_zeroes", kLeadingZeroes),
      ("empty_spki", kEmptySPKI),
      ("real_spki", kRealSPKI)).toDF("name", "pem")
      .withColumn("der", CertFuncs.pem_to_der(col("pem")))
      .withColumn("cert", CertFuncs.parse_cert(col("der")))
    df.cache()
    df
  }

  private def certRow(name: String) =
    parsed.filter(col("name") === name).select(col("cert.*"), col("der")).collect()(0)

  test("leading-zero serial survives: hex 00aa, id AKo= (types_test.go:81-101)") {
    val row = parsed.filter(col("name") === "leading_zeroes")
      .select(
        CertFuncs.serialHex(col("cert.serial")).as("hex"),
        CertFuncs.serialId(col("cert.serial")).as("id"))
      .collect()(0)
    assert(row.getString(0) == "00aa")
    assert(row.getString(1) == "AKo=")
  }

  test("serial big-int view: unsigned, arbitrary precision (types.go:251-255)") {
    val rows = Seq(
      Array(0x00.toByte, 0xAA.toByte),               // leading zero → 170
      Array(0xFF.toByte),                            // unsigned → 255, not -1
      Array.fill(20)(0xFF.toByte))                   // 2^160 − 1
      .zipWithIndex.map { case (b, i) => (i, b) }.toDF("i", "serial")
      .orderBy(col("i"))
      .select(CertFuncs.serial_bigint(col("serial"))).collect().map(_.getString(0))
    assert(rows(0) == "170")
    assert(rows(1) == "255")
    assert(rows(2) == new java.math.BigInteger("2").pow(160)
      .subtract(java.math.BigInteger.ONE).toString)
  }

  test("issuer digest golden: SPKI [0xFF] (types_test.go:41-57)") {
    val got = Seq(Tuple1(Array(0xFF.toByte))).toDF("spki")
      .select(CertFuncs.issuerId(col("spki"))).collect()(0).getString(0)
    assert(got == "qBAK5qoZQNC2Y7sxzUZhQuu9vVGHExuS2TgYmHgy64k=")
  }

  test("log ID goldens (types_test.go:172-200)") {
    val rows = Seq("log.example.com/2525", "yeti2021.ct.digicert.com/log/")
      .toDF("url").select(CertFuncs.logId(col("url"))).collect().map(_.getString(0))
    assert(rows(0) == "bG9nLmV4YW1wbGUuY29tLzI1MjU=")
    assert(rows(1) == "eWV0aTIwMjEuY3QuZGlnaWNlcnQuY29tL2xvZy8=")
  }

  test("SPKI fallback: no SKI → SHA1(raw SPKI), 20 bytes (filesystemdatabase_test.go:94-111)") {
    val r = parsed.select(col("name"),
      CertFuncs.spkiOrFallback(col("cert.ski"), col("cert.spki")).as("k"),
      col("cert.ski").as("ski")).collect()
      .map(x => x.getString(0) -> (x.getAs[Array[Byte]]("k"), x.getAs[Array[Byte]]("ski"))).toMap
    assert(r("empty_spki")._2 == null)          // no SKI extension
    assert(r("empty_spki")._1.length == 20)     // synthetic SHA1 digest
    assert(r("real_spki")._2 != null)
    assert(r("real_spki")._1.sameElements(r("real_spki")._2)) // verbatim SKI
  }

  test("parsed fields: CA flags, CN, CRL DP (ct-fetch.go:44-70; issuermetadata.go:92-138)") {
    val lz = certRow("leading_zeroes")
    assert(lz.getAs[String]("issuer_cn") == "ca")
    assert(lz.getAs[String]("subject_cn") == " leadingZeros")
    assert(!lz.getAs[Boolean]("bc_valid"))
    val ca = certRow("empty_spki")
    assert(ca.getAs[Boolean]("is_ca") && ca.getAs[Boolean]("bc_valid"))
    val wk = certRow("real_spki")
    assert(wk.getAs[scala.collection.Seq[String]]("crl_dps")
      .contains("http://public.wisekey.com/crl/wcidsg1ca.crl"))
  }

  test("cached parse is value-identical to the direct parse, hits included") {
    // repeat rows so the LRU serves hits; every field must match the
    // uncached parse (including null for malformed DER)
    val ders = parsed.select(col("der")).collect().map(_.getAs[Array[Byte]](0))
    val rep = (ders ++ ders ++ ders ++ Array(Array[Byte](9, 9))).zipWithIndex
      .map { case (d, i) => (i.toLong, d) }.toSeq.toDF("i", "der")
    val cmp = rep
      .withColumn("a", CertFuncs.parse_cert(col("der")))
      .withColumn("b", CertFuncs.parse_cert_cached(col("der")))
    assert(cmp.filter(not(col("a") <=> col("b"))).count() == 0L)
  }

  test("CRL DP filter: schemes + whitespace (issuermetadata_test.go:16-60)") {
    val got = Seq(Tuple1(Seq(
      "ldaps://ldap.example/cn=crl",     // dropped silently
      "gopher://odd.example/crl",        // unknown scheme dropped
      "  http://::1/file.crl ",          // kept, trimmed
      "https://ok.example/c.crl",        // kept
      "ldap://ldap.example/x")))         // dropped
      .toDF("dps")
      .select(CertFuncs.filterCrlDps(col("dps"))).collect()(0).getSeq[String](0)
    assert(got == Seq("http://::1/file.crl", "https://ok.example/c.crl"), got)
  }

  test("malformed DER parses to null, not an exception (C7)") {
    val n = Seq(Tuple1(Array[Byte](1, 2, 3))).toDF("der")
      .select(CertFuncs.parse_cert(col("der")).as("c"))
      .filter(col("c").isNull).count()
    assert(n == 1L)
  }

  test("ExpDate boundaries at ms resolution (types_test.go:203-252)") {
    val df = Seq(
      ("2004-01-19 00:00:00", "2004-01-20 00:00:00.000", false, true),
      ("2004-01-19 00:00:00", "2004-01-19 23:59:59.000", false, false),
      ("2004-01-19 04:00:00", "2004-01-19 05:00:00.000", true, true),
      ("2004-01-19 04:00:00", "2004-01-19 04:59:59.000", true, false),
      ("2004-01-19 23:00:00", "2004-01-20 00:00:00.000", true, true),
      ("2004-01-19 23:00:00", "2004-01-19 23:59:59.999", true, false))
      .toDF("bucket", "at", "hourRes", "want")
    val got = df.withColumn("got",
      when(col("hourRes"),
        CertFuncs.isExpiredAt(col("bucket").cast("timestamp"), col("at").cast("timestamp"), hourResolution = true))
        .otherwise(
          CertFuncs.isExpiredAt(col("bucket").cast("timestamp"), col("at").cast("timestamp"), hourResolution = false)))
    assert(got.filter(col("got") =!= col("want")).count() == 0L)
  }

  test("composite key round trip; 2-part key is null (types_test.go:254-269)") {
    val df = Seq("2019-04-28-22::an issuer::AESq_w==", "a::b").toDF("key")
      .select(col("key"), CertFuncs.parseUniqueCertId(col("key")).as("p"))
    val rows = df.orderBy(col("key")).collect()       // "2019-…" sorts first
    assert(rows(1).isNullAt(1))                       // "a::b"
    val p = rows(0).getStruct(1)
    assert(p.getString(0) == "2019-04-28-22")
    assert(p.getString(1) == "an issuer")
    assert(p.getString(2) == "AESq_w==")
    // re-serialize
    val rt = df.filter(col("p").isNotNull)
      .select(CertFuncs.uniqueCertId(col("p.exp_date"), col("p.issuer_id"), col("p.serial_id")))
      .collect()(0).getString(0)
    assert(rt == "2019-04-28-22::an issuer::AESq_w==")
  }

  test("exp-date bucket ids at both resolutions (types.go:339-365)") {
    val r = Seq(Tuple1("2020-02-05 17:42:11")).toDF("t")
      .select(
        CertFuncs.expDateDayId(col("t").cast("timestamp")),
        CertFuncs.expDateHourId(col("t").cast("timestamp")),
        CertFuncs.expDateHour(col("t").cast("timestamp")).cast("string"))
      .collect()(0)
    assert(r.getString(0) == "2020-02-05")
    assert(r.getString(1) == "2020-02-05-17")
    assert(r.getString(2) == "2020-02-05 17:00:00")
  }

  test("PEM round trip: der → pem → der") {
    val rt = parsed
      .withColumn("pem2", CertFuncs.derToPem(col("der")))
      .withColumn("der2", CertFuncs.pem_to_der(col("pem2")))
      .filter(not(col("der") === col("der2"))).count()
    assert(rt == 0L)
  }
}

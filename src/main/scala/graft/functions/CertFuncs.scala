package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import java.io.ByteArrayInputStream
import java.security.cert.{CertificateFactory, X509Certificate}
import java.sql.Timestamp

/** X.509 / CT-domain scalar functions (SURVEY.md §2.D).
  *
  * The parse itself (D10) is a null-tolerant Scala UDF
  * (`java.security.cert` + a small DER walk for the raw serial bytes,
  * reference storage/types.go:165-178); everything derived from the
  * parsed struct — digests, encodings, bucketing, composite keys — is
  * codegen'd built-ins so only the one-time parse leaves whole-stage
  * codegen.
  */
object CertFuncs {

  // ---- DER primitives ----------------------------------------------------

  /** Minimal DER reader: (tag, contentOffset, contentLength, nextOffset). */
  private def readTL(b: Array[Byte], off: Int): (Int, Int, Int, Int) = {
    val tag = b(off) & 0xFF
    var p = off + 1
    var len = b(p) & 0xFF
    p += 1
    if ((len & 0x80) != 0) {
      val n = len & 0x7F
      len = 0
      var i = 0
      while (i < n) { len = (len << 8) | (b(p) & 0xFF); p += 1; i += 1 }
    }
    (tag, p, len, p + len)
  }

  /** Raw ASN.1 serialNumber content bytes with leading zeros preserved
    * (reference storage/types.go:165-178 re-parses RawTBSCertificate
    * for exactly this; storage/types_test.go:81-101 is the conformance
    * case: serial 0x00AA must stay two bytes). Never a numeric type.
    * Also returns the raw SubjectPublicKeyInfo TLV (Go's
    * RawSubjectPublicKeyInfo). */
  def derSerialAndSpki(der: Array[Byte]): (Array[Byte], Array[Byte]) = {
    val (_, c0, _, _) = readTL(der, 0)       // Certificate ::= SEQUENCE
    val (_, c1, _, _) = readTL(der, c0)      // tbsCertificate SEQUENCE
    var p = c1
    val v = readTL(der, p)                   // optional [0] EXPLICIT version
    if (v._1 == 0xA0) p = v._4
    val s = readTL(der, p)                   // serialNumber INTEGER
    require(s._1 == 0x02, s"expected INTEGER tag, got ${s._1}")
    val serial = java.util.Arrays.copyOfRange(der, s._2, s._2 + s._3)
    // skip: signature AlgorithmIdentifier, issuer Name, validity, subject Name
    p = s._4
    var i = 0
    while (i < 4) { p = readTL(der, p)._4; i += 1 }
    val spki = readTL(der, p)                // subjectPublicKeyInfo SEQUENCE
    val spkiRaw = java.util.Arrays.copyOfRange(der, p, spki._4)
    (serial, spkiRaw)
  }

  /** Collect URI GeneralNames (context tag [6], 0x86) from a DER blob —
    * the CRL DistributionPoints shape the reference consumes
    * (issuermetadata.go:48-73 filters them to http/https anyway). */
  private[functions] def collectUris(b: Array[Byte], off: Int, end: Int,
      acc: scala.collection.mutable.ArrayBuffer[String]): Unit = {
    var p = off
    while (p < end && p >= 0) {
      val (tag, c, l, next) = readTL(b, p)
      if (tag == 0x86) acc += new String(b, c, l, "US-ASCII")
      else if ((tag & 0x20) != 0 || tag == 0x04 || tag == 0xA0)
        collectUris(b, c, c + l, acc)  // constructed (or OCTET-wrapped): recurse
      p = next
    }
  }

  // ---- the parse UDF (D10 / D1 / C7) -------------------------------------

  /** All cert fields the pipeline touches (SURVEY.md §1.2 canonical
    * schema, minus ingest metadata). */
  case class ParsedCert(
      serial: Array[Byte],
      not_before: Timestamp,
      not_after: Timestamp,
      issuer_dn: String,
      issuer_cn: String,
      subject_dn: String,
      subject_cn: String,
      is_ca: Boolean,
      bc_valid: Boolean,
      spki: Array[Byte],
      ski: Array[Byte],
      crl_dps: Seq[String])

  private def cnOf(rfc2253: String): String =
    try {
      import scala.jdk.CollectionConverters._
      new javax.naming.ldap.LdapName(rfc2253).getRdns.asScala
        .find(_.getType.equalsIgnoreCase("CN")).map(_.getValue.toString).orNull
    } catch { case _: Throwable => null }

  /** Factory per thread: getInstance costs a provider lookup per call
    * and thread-safety of a shared instance isn't guaranteed. */
  private val cfTL: ThreadLocal[CertificateFactory] =
    ThreadLocal.withInitial(() => CertificateFactory.getInstance("X.509"))

  /** Parse one DER certificate; null on any failure (the reference
    * skips undecodable entries and counts them, ct-fetch.go:198-209 —
    * PERMISSIVE-mode analog, C7). */
  def parseCert(der: Array[Byte]): ParsedCert =
    try {
      val cf = cfTL.get()
      val cert = cf.generateCertificate(new ByteArrayInputStream(der))
        .asInstanceOf[X509Certificate]
      val (serial, spkiRaw) = derSerialAndSpki(der)
      val skiExt = cert.getExtensionValue("2.5.29.14")
      val ski = if (skiExt == null) null else {
        // extension value = OCTET STRING( OCTET STRING( ski ) )
        val (_, c1x, _, _) = readTL(skiExt, 0)
        val inner = readTL(skiExt, c1x)
        java.util.Arrays.copyOfRange(skiExt, inner._2, inner._2 + inner._3)
      }
      val crlExt = cert.getExtensionValue("2.5.29.31")
      val crls = if (crlExt == null) Seq.empty[String] else {
        val acc = scala.collection.mutable.ArrayBuffer.empty[String]
        val (_, c, l, _) = readTL(crlExt, 0) // strip outer OCTET STRING
        collectUris(crlExt, c, c + l, acc)
        acc.toSeq
      }
      val issuerDn = cert.getIssuerX500Principal.getName("RFC2253")
      val subjectDn = cert.getSubjectX500Principal.getName("RFC2253")
      val bcValid = cert.getExtensionValue("2.5.29.19") != null
      ParsedCert(
        serial,
        new Timestamp(cert.getNotBefore.getTime),
        new Timestamp(cert.getNotAfter.getTime),
        issuerDn, cnOf(issuerDn), subjectDn, cnOf(subjectDn),
        is_ca = cert.getBasicConstraints >= 0,
        bc_valid = bcValid,
        spki = spkiRaw, ski = ski, crl_dps = crls)
    } catch { case _: Throwable => null }

  /** The UDF: der binary → parsed struct or null. */
  val parse_cert = udf(parseCert _)

  /** LRU-cached parse for hot repeated certs — the issuing certificate
    * in particular: one CA signs millions of leaves, so chain(0) is
    * drawn from a tiny population per partition. The per-thread LRU is
    * this engine's analog of the reference's ARC cache of hot
    * per-group handles (filesystemdatabase.go:32, 8192 entries).
    * Deterministic DER→struct means caching cannot change results
    * (pinned by CertFuncsSpec). */
  private val CacheSize = 8192
  private val parseCacheTL
      : ThreadLocal[java.util.LinkedHashMap[java.nio.ByteBuffer, ParsedCert]] =
    ThreadLocal.withInitial(() =>
      new java.util.LinkedHashMap[java.nio.ByteBuffer, ParsedCert](256, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[java.nio.ByteBuffer, ParsedCert]): Boolean =
          size() > CacheSize
      })

  def parseCertCached(der: Array[Byte]): ParsedCert = {
    val cache = parseCacheTL.get()
    val key = java.nio.ByteBuffer.wrap(der) // content-based equals/hashCode
    val hit = cache.get(key)
    if (hit != null || cache.containsKey(key)) hit
    else {
      val parsed = parseCert(der)
      cache.put(key, parsed)
      parsed
    }
  }

  /** The cached-parse UDF, for columns with heavy value repetition
    * (issuer chains). */
  val parse_cert_cached = udf(parseCertCached _)

  /** PEM text → DER bytes (null on malformed input). */
  val pem_to_der = udf((pem: String) =>
    try {
      val body = pem.linesIterator
        .filterNot(l => l.startsWith("-----") || l.isBlank).mkString
      java.util.Base64.getMimeDecoder.decode(body)
    } catch { case _: Throwable => null })

  // ---- codegen'd column functions (D2-D8) --------------------------------

  /** D3: issuer identity = base64url(SHA256(spki)), padding kept
    * (types.go:124-130, 155-159; golden: SPKI [0xFF] →
    * "qBAK5qoZQNC2Y7sxzUZhQuu9vVGHExuS2TgYmHgy64k="). */
  def issuerId(spki: Column): Column =
    translate(base64(unhex(sha2(spki, 256))), "+/", "-_")

  /** D2: SubjectKeyId if ≥ 8 bytes else SHA1(raw SPKI)
    * (filesystemdatabase.go:146-156). */
  def spkiOrFallback(ski: Column, spki: Column): Column =
    when(length(ski) >= 8, ski).otherwise(unhex(sha1(spki)))

  /** D4: serial display encodings (types.go:210-255): lowercase hex and
    * base64url ID. */
  def serialHex(serial: Column): Column = lower(hex(serial))
  def serialId(serial: Column): Column =
    translate(regexp_replace(base64(serial), "\r\n", ""), "+/", "-_")

  /** D4: big-integer view of a serial (types.go:251-255 AsBigInt) —
    * arbitrary precision, since CT serials run to 20 bytes; emitted as
    * a decimal string (no Spark numeric holds 2^160). */
  val serial_bigint = udf((b: Array[Byte]) =>
    if (b == null) null else new java.math.BigInteger(1, b).toString)

  /** Log identity: base64url of the short URL (types.go:36-42; golden
    * "log.example.com/2525" → "bG9nLmV4YW1wbGUuY29tLzI1MjU="). */
  def logId(shortUrl: Column): Column =
    translate(regexp_replace(base64(shortUrl.cast("binary")), "\r\n", ""), "+/", "-_")

  /** D5: expiration bucket keys at day / hour resolution
    * (types.go:21-23, 339-365). */
  def expDateDayId(ts: Column): Column = date_format(ts, "yyyy-MM-dd")
  def expDateHourId(ts: Column): Column = date_format(ts, "yyyy-MM-dd-HH")
  def expDateHour(ts: Column): Column = date_trunc("hour", ts)

  /** Expiry predicate: a bucket is expired at t iff t is past the
    * bucket's last good millisecond (types.go:348-369: lastGood =
    * bucketStart + period − 1ms; IsExpiredAt = lastGood < t). */
  def isExpiredAt(bucketStart: Column, t: Column, hourResolution: Boolean): Column = {
    val endExpr = if (hourResolution) "INTERVAL 1 HOUR" else "INTERVAL 1 DAY"
    t > bucketStart + expr(endExpr) - expr("INTERVAL 1 MILLISECOND")
  }

  /** C5: CRL distribution-point keep-list — trim whitespace, keep only
    * http/https, silently drop ldap/ldaps/unknown schemes
    * (issuermetadata.go:48-73; conformance cases
    * issuermetadata_test.go:16-60 incl. `http://::1/file.crl` with
    * padding whitespace). */
  def filterCrlDps(dps: Column): Column =
    filter(transform(dps, u => trim(u)), u => u.rlike("^https?://"))

  /** D8: composite keys (types.go:273-331). Strict-arity parse returns
    * null structs for malformed keys, mirroring the reference's parse
    * errors. */
  def uniqueCertId(expDateId: Column, issuerId: Column, serialId: Column): Column =
    concat_ws("::", expDateId, issuerId, serialId)
  def parseUniqueCertId(key: Column): Column = {
    val parts = split(key, "::")
    when(size(parts) === 3,
      struct(element_at(parts, 1).as("exp_date"),
        element_at(parts, 2).as("issuer_id"),
        element_at(parts, 3).as("serial_id")))
      .otherwise(lit(null))
  }
  def issuerAndDateId(expDateId: Column, issuerId: Column): Column =
    concat_ws("/", expDateId, issuerId)

  /** D7: DER → PEM block (64-char base64 lines, like encoding/pem). */
  def derToPem(der: Column): Column =
    concat(lit("-----BEGIN CERTIFICATE-----\n"),
      array_join(regexp_extract_all(
        regexp_replace(base64(der), "\r\n", ""), lit(".{1,64}"), lit(0)), "\n"),
      lit("\n-----END CERTIFICATE-----"))
}

package graft.streaming

import java.nio.charset.StandardCharsets
import java.util.Base64

/** Transport seam for the CT-log source (A1/A2): how entry ranges and
  * the STH are fetched is independent of the Spark source machinery.
  * Two implementations:
  *
  *  - [[DirectoryLogSpec]]: the zero-egress page-file layout
  *    (SURVEY.md §7.4) — the default for `path`s that are not URLs;
  *  - [[HttpLogSpec]]: the real thing — RFC 6962 `get-sth` /
  *    `get-entries` paging with the reference's client posture
  *    (ct-fetch.go:250-260: 10 s timeouts; :398-488: 1000-entry pages,
  *    429-aware jittered exponential backoff 500 ms → 5 min capped,
  *    :409-413). Selected automatically when `path` starts with
  *    `http://`/`https://`.
  *
  * Specs are small serializable values shipped inside input partitions;
  * the transport itself is constructed on the executor per reader, so
  * nothing stateful crosses the wire.
  */
trait CtLogTransport {
  /** STH high-watermark: one past the last available entry id (A2). */
  def treeSize(): Long
  /** The log's state-key URL (the reference's shortURL, types.go:36-42). */
  def logUrl(): Option[String]
  /** Entries with start <= entry_id < end (the get-entries range). */
  def readRange(start: Long, end: Long): Iterator[CtLog.Entry]
  /** Split [start, end) into fetch-parallel sub-ranges (J5). */
  def partitions(start: Long, end: Long): Seq[(Long, Long)]
}

sealed trait CtLogTransportSpec extends Serializable {
  def transport: CtLogTransport
}

final case class DirectoryLogSpec(path: String) extends CtLogTransportSpec {
  def transport: CtLogTransport = new DirectoryTransport(path)
}

final case class HttpLogSpec(baseUrl: String, pageSize: Int,
    timeoutMs: Int, backoffBaseMs: Long, maxRetries: Int)
    extends CtLogTransportSpec {
  def transport: CtLogTransport = new HttpTransport(this)
}

object CtLogTransport {
  /** A non-retryable HTTP failure (4xx other than 429): the URL is
    * wrong or the log is gone; backing off would only delay the error.
    * Extends IOException so existing callers' error handling still
    * sees an IO failure — the fetch loop rethrows it before its
    * IOException-retry arm can swallow it. */
  final class PermanentHttpException(msg: String)
      extends java.io.IOException(msg)

  /** Spec for a `path` option: URLs get the HTTP transport, everything
    * else the page-file directory. Option keys (HTTP): `pageSize`
    * (1000, ct-fetch.go:417), `httpTimeoutMs` (10000, :250-260),
    * `backoffBaseMs` (500, :409-413), `maxRetries` (10 — the same
    * resilience bound the reference applies to its state store,
    * rediscache.go:22-28). */
  def specFor(path: String, opt: String => Option[String]): CtLogTransportSpec =
    if (path.startsWith("http://") || path.startsWith("https://"))
      HttpLogSpec(path.stripSuffix("/"),
        pageSize = opt("pageSize").map(_.toInt).getOrElse(1000),
        timeoutMs = opt("httpTimeoutMs").map(_.toInt).getOrElse(10000),
        backoffBaseMs = opt("backoffBaseMs").map(_.toLong).getOrElse(500L),
        maxRetries = opt("maxRetries").map(_.toInt).getOrElse(10))
    else DirectoryLogSpec(path)

  def specFor(path: String): CtLogTransportSpec = specFor(path, _ => None)
}

/** The page-file directory transport (the pre-seam behavior, verbatim). */
final class DirectoryTransport(path: String) extends CtLogTransport {
  override def treeSize(): Long = CtLog.treeSize(path)
  override def logUrl(): Option[String] = CtLog.dirLogUrl(path)
  override def readRange(start: Long, end: Long): Iterator[CtLog.Entry] =
    CtLog.readRange(path, start, end)
  /** One sub-range per overlapping page file — fetch parallelism
    * mirrors the page layout. */
  override def partitions(start: Long, end: Long): Seq[(Long, Long)] = {
    if (start >= end) return Seq.empty
    val pages = CtLog.listPages(java.nio.file.Paths.get(path))
    pages.zipWithIndex.flatMap { case ((first, _), i) =>
      val pageEnd = pages.lift(i + 1).map(_._1).getOrElse(Long.MaxValue)
      val s = math.max(first, start)
      val e = math.min(pageEnd, end)
      if (s < e) Some((s, e)) else None
    }
  }
}

/** RFC 6962 client: `<base>/ct/v1/get-sth` for the tree size,
  * `<base>/ct/v1/get-entries?start=S&end=E` (inclusive E) for entries.
  * Servers may return fewer entries than requested (§4.6) — the range
  * loop advances by what actually arrived. HTTP 429 (and transient
  * IO errors) back off exponentially with ±20% jitter from
  * `backoffBaseMs`, capped at 5 minutes, for at most `maxRetries`
  * attempts per request. */
final class HttpTransport(spec: HttpLogSpec) extends CtLogTransport {
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** The reference's shortURL: scheme stripped, no trailing slash
    * (types.go:36-42) — the `log::<url>` state key. */
  override def logUrl(): Option[String] =
    Some(spec.baseUrl.replaceFirst("^https?://", ""))

  override def treeSize(): Long =
    mapper.readTree(fetch(s"${spec.baseUrl}/ct/v1/get-sth")).get("tree_size").asLong()

  override def partitions(start: Long, end: Long): Seq[(Long, Long)] =
    (start until end by spec.pageSize.toLong)
      .map(s => (s, math.min(s + spec.pageSize, end)))

  override def readRange(start: Long, end: Long): Iterator[CtLog.Entry] =
    new Iterator[CtLog.Entry] {
      private var nextId = start
      private var buf: Iterator[CtLog.Entry] = Iterator.empty
      override def hasNext: Boolean = buf.hasNext || nextId < end
      override def next(): CtLog.Entry = {
        if (!buf.hasNext) {
          val pageEnd = math.min(nextId + spec.pageSize, end)
          val body = fetch(
            s"${spec.baseUrl}/ct/v1/get-entries?start=$nextId&end=${pageEnd - 1}")
          val entries = mapper.readTree(body).get("entries")
          if (entries == null || entries.size() == 0)
            throw new java.io.IOException(
              s"get-entries [$nextId,${pageEnd - 1}] returned no entries " +
              s"(tree truncated below the requested range?)")
          val first = nextId
          // a server over-delivering past the requested end would bleed
          // entry ids into the NEXT partition's range — truncate hard
          val take = math.min(entries.size().toLong, end - first).toInt
          buf = (0 until take).iterator.map { i =>
            val e = entries.get(i)
            val dec = CtLogWire.decodeEntry(
              Base64.getDecoder.decode(e.get("leaf_input").asText()),
              Base64.getDecoder.decode(e.get("extra_data").asText()))
            CtLog.Entry(first + i, dec.tsMs, logUrl().get, dec.der, dec.chain)
          }
          nextId = first + take // §4.6: maybe fewer than asked
        }
        buf.next()
      }
    }

  /** GET with the reference's client posture; returns the body. */
  private def fetch(url: String): String = {
    var attempt = 0
    while (true) {
      val conn = new java.net.URI(url).toURL.openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      conn.setConnectTimeout(spec.timeoutMs)
      conn.setReadTimeout(spec.timeoutMs)
      try {
        val code = conn.getResponseCode
        if (code == 200) {
          return new String(conn.getInputStream.readAllBytes(), StandardCharsets.UTF_8)
        } else if (code != 429 && code < 500) {
          // Permanent client errors (404 retired log, 400/401/403 …)
          // won't heal with time — fail immediately instead of burning
          // maxRetries × up-to-5-min sleeps. The reference backs off
          // only on 429 (ct-fetch.go:409-413).
          throw new CtLogTransport.PermanentHttpException(
            s"GET $url failed with HTTP $code (permanent; not retried)")
        } else if (attempt >= spec.maxRetries) {
          throw new java.io.IOException(s"GET $url failed with HTTP $code " +
            s"after ${attempt + 1} attempts")
        }
        // 429 (and transient 5xx) → jittered exponential backoff,
        // 500 ms doubling to a 5 min cap (ct-fetch.go:409-413)
      } catch {
        case e: CtLogTransport.PermanentHttpException => throw e
        case e: java.io.IOException if attempt < spec.maxRetries => // retry
        case e: java.io.IOException => throw e
      } finally conn.disconnect()
      val base = math.min(spec.backoffBaseMs << attempt, 300000L)
      val jitter = 0.8 + 0.4 * java.util.concurrent.ThreadLocalRandom.current().nextDouble()
      Thread.sleep(math.max(1L, (base * jitter).toLong))
      attempt += 1
    }
    throw new IllegalStateException("unreachable")
  }
}

/** RFC 6962 TLS-struct codecs for `get-entries` payloads. Decode is the
  * transport's consumption path; encode exists for simulators and tests
  * (the in-process log server), mirroring [[CtLog.writePages]]'s role
  * for the directory transport.
  *
  * Shapes (RFC 6962 §3.4/§4.6, as consumed by ct-fetch via
  * certificate-transparency-go):
  *  - MerkleTreeLeaf: version(1) leaf_type(1) timestamp(8)
  *    entry_type(2) signed_entry extensions(2+n)
  *  - x509_entry signed_entry: ASN.1Cert = len3 + DER; extra_data =
  *    CertificateChain: len3 total + repeated (len3 + DER), leaf
  *    excluded
  *  - precert_entry signed_entry: issuer_key_hash(32) + len3 + TBS;
  *    extra_data = PrecertChainEntry: pre_certificate (len3 + DER of
  *    the SUBMITTED precert — what the reference parses and stores,
  *    ct-fetch.go:201-203) + precertificate_chain (len3 total +
  *    repeated len3 + DER)
  */
object CtLogWire {
  final case class Decoded(tsMs: Long, der: Array[Byte],
      chain: Seq[Array[Byte]], precert: Boolean)

  private def be(n: Long, width: Int): Array[Byte] =
    Array.tabulate(width)(i => ((n >>> (8 * (width - 1 - i))) & 0xFF).toByte)
  private def rd(b: Array[Byte], off: Int, width: Int): Long =
    (0 until width).foldLeft(0L)((acc, i) => (acc << 8) | (b(off + i) & 0xFFL))

  private def len3(payload: Array[Byte]): Array[Byte] =
    be(payload.length.toLong, 3) ++ payload

  /** Chain list: len3 total + repeated (len3 + DER). */
  private def chainBytes(chain: Seq[Array[Byte]]): Array[Byte] = {
    val items = chain.flatMap(c => len3(c)).toArray
    be(items.length.toLong, 3) ++ items
  }
  private def readChain(b: Array[Byte], off0: Int): Seq[Array[Byte]] = {
    val total = rd(b, off0, 3).toInt
    var off = off0 + 3
    val end = off + total
    val out = Seq.newBuilder[Array[Byte]]
    while (off < end) {
      val n = rd(b, off, 3).toInt
      out += b.slice(off + 3, off + 3 + n)
      off += 3 + n
    }
    out.result()
  }

  def encodeX509Leaf(tsMs: Long, der: Array[Byte]): Array[Byte] =
    Array[Byte](0, 0) ++ be(tsMs, 8) ++ be(0L, 2) ++ len3(der) ++ be(0L, 2)

  def encodeX509Extra(chain: Seq[Array[Byte]]): Array[Byte] =
    chainBytes(chain)

  def encodePrecertLeaf(tsMs: Long, issuerKeyHash: Array[Byte],
      tbs: Array[Byte]): Array[Byte] = {
    require(issuerKeyHash.length == 32, "issuer_key_hash is 32 bytes")
    Array[Byte](0, 0) ++ be(tsMs, 8) ++ be(1L, 2) ++ issuerKeyHash ++
      len3(tbs) ++ be(0L, 2)
  }

  def encodePrecertExtra(preCert: Array[Byte],
      chain: Seq[Array[Byte]]): Array[Byte] =
    len3(preCert) ++ chainBytes(chain)

  /** Decode one get-entries element into the engine's entry shape:
    * leaf DER (x509) or submitted precert DER (precert), issuer chain,
    * leaf timestamp. */
  def decodeEntry(leafInput: Array[Byte], extraData: Array[Byte]): Decoded = {
    require(leafInput.length >= 12, "MerkleTreeLeaf too short")
    val tsMs = rd(leafInput, 2, 8)
    rd(leafInput, 10, 2) match {
      case 0L => // x509_entry: DER in the leaf, chain in extra_data
        val n = rd(leafInput, 12, 3).toInt
        Decoded(tsMs, leafInput.slice(15, 15 + n), readChain(extraData, 0),
          precert = false)
      case 1L => // precert_entry: submitted precert + chain in extra_data
        val preLen = rd(extraData, 0, 3).toInt
        val pre = extraData.slice(3, 3 + preLen)
        Decoded(tsMs, pre, readChain(extraData, 3 + preLen), precert = true)
      case t =>
        throw new java.io.IOException(s"unknown CT entry_type $t")
    }
  }
}

package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.util.Base64
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A CT-log source as a Spark DataSource V2 (SURVEY.md §2.A A1/A2).
  *
  * The reference's ingest (ct-fetch.go:398-488) pages `get-entries` in
  * batches of 1000 from a checkpointed start position to the STH tree
  * size, with backpressure via a bounded channel. The Spark-native
  * restatement: a `MicroBatchStream` whose offsets are entry indices;
  * `latestOffset` is the STH high-watermark (A2); per-trigger admission
  * control (`maxEntriesPerTrigger`) is the bounded-channel analog (J4);
  * checkpoint restore is Spark's offset log (A9/B3 — the reference's
  * dual Redis+disk checkpoint collapses into the streaming checkpoint).
  *
  * Zero-egress stand-in for the HTTP transport: the "log" is a local
  * directory of fixed-size pages `page-<firstEntryId>.tsv`, one entry
  * per line (`entry_id \t ts_ms \t log_url \t base64(der) \t
  * base64(chain0),base64(chain1),...`) — the same pagination shape
  * `get-entries` returns (leaf + its issuer chain, the shape
  * ct-fetch.go:215-225 consumes as `LogEntry.Chain`), so only the byte
  * transport is simulated (SURVEY.md §7.4). Batch read is also
  * supported, for catch-up jobs.
  */
object CtLog {
  val schema: StructType = StructType(Seq(
    StructField("entry_id", LongType, nullable = false),
    StructField("ts_ms", LongType, nullable = false),
    StructField("log_url", StringType, nullable = false),
    StructField("der", BinaryType, nullable = false),
    StructField("chain", ArrayType(BinaryType, containsNull = false), nullable = false)))

  val DefaultPageSize = 1000

  /** One log entry: leaf DER + issuer chain DERs (chain(0) is the
    * direct issuing certificate, ct-fetch.go:221). */
  case class Entry(entryId: Long, tsMs: Long, logUrl: String,
      der: Array[Byte], chain: Seq[Array[Byte]])

  /** Test/sim helper: write entries as fixed-size pages. */
  def writePages(dir: String, entries: Seq[Entry],
      pageSize: Int): Unit = {
    val d = Paths.get(dir)
    Files.createDirectories(d)
    entries.sortBy(_.entryId).grouped(pageSize).foreach { page =>
      val first = page.head.entryId
      val body = page.map { e =>
        val chain = e.chain.map(Base64.getEncoder.encodeToString).mkString(",")
        s"${e.entryId}\t${e.tsMs}\t${e.logUrl}\t${Base64.getEncoder.encodeToString(e.der)}\t$chain"
      }.mkString("", "\n", "\n")
      Files.write(d.resolve(f"page-$first%012d.tsv"),
        body.getBytes(StandardCharsets.UTF_8))
    }
  }

  def writePages(dir: String, entries: Seq[Entry]): Unit =
    writePages(dir, entries, DefaultPageSize)

  /** Parse one page line; a missing/empty 5th field is an empty chain
    * (the C6 guard downstream drops such entries, ct-fetch.go:215-219). */
  private[streaming] def parseLine(line: String): Entry = {
    val f = line.split("\t", 5)
    val chain =
      if (f.length < 5 || f(4).isEmpty) Seq.empty[Array[Byte]]
      else f(4).split(",").toSeq.filter(_.nonEmpty).map(Base64.getDecoder.decode)
    Entry(f(0).toLong, f(1).toLong, f(2), Base64.getDecoder.decode(f(3)), chain)
  }

  /** The log_url a source path serves — the `log::<url>` state key.
    * Transport-aware: an HTTP log's shortURL, or a simulated directory's
    * url read from its first page's first entry. None for an
    * empty/missing directory. */
  def logUrlOf(path: String): Option[String] =
    CtLogTransport.specFor(path).transport.logUrl()

  /** Directory-transport log_url: every entry in a directory carries
    * the same url. */
  private[streaming] def dirLogUrl(dir: String): Option[String] = {
    val d = Paths.get(dir)
    if (!Files.isDirectory(d)) return None
    listPages(d).headOption.flatMap { case (_, p) =>
      Files.readAllLines(p).asScala.find(_.nonEmpty).map(parseLine(_).logUrl)
    }
  }

  /** STH: one past the max entry id present (tree size). */
  def treeSize(dir: String): Long = {
    val d = Paths.get(dir)
    if (!Files.isDirectory(d)) return 0L
    val pages = listPages(d)
    if (pages.isEmpty) 0L
    else {
      val last = pages.last
      last._1 + Files.readAllLines(last._2).asScala.count(_.nonEmpty)
    }
  }

  private[streaming] def listPages(d: Path): Seq[(Long, Path)] =
    Files.list(d).iterator.asScala
      .filter(_.getFileName.toString.matches("page-\\d+\\.tsv"))
      .map(p => (p.getFileName.toString.stripPrefix("page-").stripSuffix(".tsv").toLong, p))
      .toSeq.sortBy(_._1)

  /** Entries with start <= entry_id < end, streamed from the pages that
    * can contain them (the get-entries range fetch, ct-fetch.go:417). */
  private[streaming] def readRange(dir: String, start: Long, end: Long)
      : Iterator[Entry] = {
    val pages = listPages(Paths.get(dir)).filter { case (first, _) => first < end }
    pages.iterator.flatMap { case (_, p) =>
      Files.readAllLines(p).asScala.iterator.filter(_.nonEmpty)
        .map(parseLine)
        .filter(e => e.entryId >= start && e.entryId < end)
    }
  }
}

/** Entry point: `spark.readStream.format("ctlog")` (short name via
  * DataSourceRegister / META-INF services; the full class name
  * `graft.streaming.CtLogSource` also works)
  * `.option("path", dir).option("maxEntriesPerTrigger", n)`; batch
  * `spark.read.format("ctlog")` too. */
class CtLogSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "ctlog"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = CtLog.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new CtLogTable(properties.asScala.toMap)
}

class CtLogTable(props: Map[String, String]) extends Table with SupportsRead {
  private val path = props.getOrElse("path",
    throw new IllegalArgumentException("ctlog source requires option 'path'"))
  override def name(): String = s"ctlog($path)"
  override def schema(): StructType = CtLog.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new CtLogScan(
        CtLogTransport.specFor(path, k => Option(options.get(k))),
        Option(options.get("maxEntriesPerTrigger")).map(_.toLong),
        Option(options.get("startEntry")).map(_.toLong).getOrElse(0L),
        Option(options.get("limitEntries")).map(_.toLong))
    }
}

/** `startEntry` / `limitEntries` are the reference's `--offset X` /
  * `--limit Y` ingestion window (G3, ct-fetch.go:288-305): start
  * overrides the checkpointed position, limit caps the end position. */
class CtLogScan(spec: CtLogTransportSpec, maxPerTrigger: Option[Long],
    startEntry: Long = 0L, limitEntries: Option[Long] = None) extends Scan {
  private[streaming] def cappedEnd(sth: Long): Long =
    limitEntries.map(l => math.min(sth, startEntry + l)).getOrElse(sth)
  override def readSchema(): StructType = CtLog.schema
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new CtLogMicroBatchStream(spec, maxPerTrigger, startEntry, limitEntries)
  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      CtLogMicroBatchStream.partitionRange(spec, startEntry,
        cappedEnd(spec.transport.treeSize()))
    override def createReaderFactory(): PartitionReaderFactory = new CtLogReaderFactory
  }
}

case class CtLogOffset(entry: Long) extends Offset {
  override def json(): String = s"""{"entry":$entry}"""
}

object CtLogMicroBatchStream {
  /** One input partition per transport sub-range (a page file for the
    * directory transport, a get-entries page for HTTP) — partition
    * parallelism mirrors page fetch parallelism (J5's worker pool).
    * Sub-ranges never overlap across partitions. */
  def partitionRange(spec: CtLogTransportSpec, start: Long, end: Long)
      : Array[InputPartition] =
    spec.transport.partitions(start, end)
      .map { case (s, e) => CtLogInputPartition(spec, s, e): InputPartition }
      .toArray
}

class CtLogMicroBatchStream(spec: CtLogTransportSpec, maxPerTrigger: Option[Long],
    startEntry: Long = 0L, limitEntries: Option[Long] = None)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  @transient private lazy val transport = spec.transport

  /** Pinned high-watermark for Trigger.AvailableNow: without
    * SupportsTriggerAvailableNow, Spark bypasses admission control in
    * catch-up mode and the ENTIRE backlog lands in one micro-batch —
    * exactly the unbounded-buffer failure the reference's bounded
    * channel (J4, ct-fetch.go:132) exists to prevent. Pinning the STH
    * once also matches ct-fetch's run-to-head semantics (the end
    * position is the tree size observed at start, ct-fetch.go:288-305;
    * entries appended mid-run wait for the next poll). */
  @volatile private var fixedEnd: Option[Long] = None

  private def cappedSth(): Long = {
    val sth = transport.treeSize()
    limitEntries.map(l => math.min(sth, startEntry + l)).getOrElse(sth)
  }

  override def prepareForTriggerAvailableNow(): Unit =
    fixedEnd = Some(cappedSth())

  override def reportLatestOffset(): Offset =
    CtLogOffset(fixedEnd.getOrElse(cappedSth()))

  override def initialOffset(): Offset = CtLogOffset(startEntry)

  override def deserializeOffset(json: String): Offset =
    CtLogOffset("""\d+""".r.findFirstIn(json).map(_.toLong).getOrElse(0L))

  override def getDefaultReadLimit: ReadLimit =
    maxPerTrigger.map(n => ReadLimit.maxRows(n)).getOrElse(ReadLimit.allAvailable())

  /** STH fetch (A2), bounded by the --limit window (G3) and capped by
    * admission control (J4). */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val sth = fixedEnd.getOrElse(cappedSth())
    val from = start.asInstanceOf[CtLogOffset].entry
    val capped = limit match {
      case rows: org.apache.spark.sql.connector.read.streaming.ReadMaxRows =>
        math.min(sth, from + rows.maxRows())
      case _ => sth
    }
    CtLogOffset(math.max(from, capped))
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException("use latestOffset(start, limit)")

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    CtLogMicroBatchStream.partitionRange(spec,
      start.asInstanceOf[CtLogOffset].entry, end.asInstanceOf[CtLogOffset].entry)

  override def createReaderFactory(): PartitionReaderFactory = new CtLogReaderFactory

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** One transport sub-range: the spec to rebuild the transport on the
  * executor plus [start, end) entry-id bounds. */
case class CtLogInputPartition(spec: CtLogTransportSpec, start: Long, end: Long)
    extends InputPartition

class CtLogReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[CtLogInputPartition]
    new PartitionReader[InternalRow] {
      private val iter = p.spec.transport.readRange(p.start, p.end)
      private var current: CtLog.Entry = _
      override def next(): Boolean =
        if (iter.hasNext) { current = iter.next(); true } else false
      override def get(): InternalRow =
        new GenericInternalRow(Array[Any](
          current.entryId, current.tsMs, UTF8String.fromString(current.logUrl),
          current.der,
          new org.apache.spark.sql.catalyst.util.GenericArrayData(
            current.chain.toArray[Any])))
      override def close(): Unit = ()
    }
  }
}

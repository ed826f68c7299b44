package graft

import org.apache.spark.sql.SparkSession
import graft.streaming.{CtLog, IngestJob}

/** Streaming-ingest throughput bench: builds a synthetic CT log of
  * `SPARK_GRAFT_INGEST_ENTRIES` entries (default 100k; fixture leaf
  * certs cycled with their issuer chains, so the dedup gate suppresses
  * all but the distinct certs — the reference's catch-up workload
  * shape), runs the full pipeline (source → parse ×2 per entry →
  * filters → stateful first-seen dedup → partitioned write) with
  * `Trigger.AvailableNow`, and prints one JSON line of entries/sec.
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.IngestBench"
  */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_INGEST_ENTRIES", "100000").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // RocksDB state store: ~2x the HDFS-backed provider's throughput
      // at 100k live dedup keys, and the only provider whose state can
      // exceed executor memory — the 100 TB default
      .config("spark.sql.streaming.stateStore.providerClass",
        sys.env.getOrElse("SPARK_GRAFT_STATE_PROVIDER",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def decode(pem: String): Array[Byte] = {
      val body = pem.linesIterator
        .filterNot(l => l.startsWith("-----") || l.isBlank).mkString
      java.util.Base64.getMimeDecoder.decode(body)
    }
    val leaf1 = decode(TestCerts.kLeadingZeroes)
    val ca1 = decode(TestCerts.kEmptySPKI)
    val leafS = decode(TestCerts.kSyntheticLeaf)
    val leafS2 = decode(TestCerts.kSyntheticLeaf2)
    val pool: Array[(Array[Byte], Seq[Array[Byte]])] = Array(
      leaf1 -> Seq(ca1), leafS -> Seq(leafS), leafS2 -> Seq(leafS2))

    // distinct mode: overwrite each entry's serial content bytes with a
    // unique counter (parse reads, never verifies, so the mutated DER
    // stays loadable) — every entry then carries a distinct dedup key
    // and the stateful first-seen gate holds n live state rows, the
    // honest state-scaling measurement. Default mode cycles 3 certs:
    // state stays tiny and the run measures parse+pipeline throughput.
    val distinct = sys.env.get("SPARK_GRAFT_INGEST_DISTINCT").contains("true")
    def serialContentOffset(der: Array[Byte]): (Int, Int) = {
      def tl(off: Int): (Int, Int, Int, Int) = {
        val tag = der(off) & 0xFF
        var p = off + 1
        var len = der(p) & 0xFF
        p += 1
        if ((len & 0x80) != 0) {
          val k = len & 0x7F; len = 0
          var j = 0
          while (j < k) { len = (len << 8) | (der(p) & 0xFF); p += 1; j += 1 }
        }
        (tag, p, len, p + len)
      }
      val (_, c0, _, _) = tl(0)
      val (_, c1, _, _) = tl(c0)
      var p = c1
      val v = tl(p)
      if (v._1 == 0xA0) p = v._4
      val s = tl(p)
      (s._2, s._3)
    }
    def withSerial(der: Array[Byte], i: Int): Array[Byte] = {
      val (off, len) = serialContentOffset(der)
      val out = java.util.Arrays.copyOf(der, der.length)
      var v = i.toLong
      var j = math.min(len, 8)
      while (j > 0) { out(off + j - 1) = (v & 0xFF).toByte; v >>= 8; j -= 1 }
      out
    }

    val root = java.nio.file.Files.createTempDirectory("ingestbench").toString
    val ts0 = 1000000000000L
    val entries = (0 until n).map { i =>
      val (der0, chain) = pool(i % pool.length)
      val der = if (distinct) withSerial(der0, i) else der0
      CtLog.Entry(i.toLong, ts0 + i, "log.example.com/2025", der, chain)
    }
    CtLog.writePages(s"$root/log", entries, pageSize = 1000)

    val t0 = System.nanoTime()
    IngestJob.start(spark, s"$root/log", s"$root/out", s"$root/ckpt",
      maxEntriesPerTrigger = 16384, logExpiredEntries = true)
      .awaitTermination()
    val sec = (System.nanoTime() - t0) / 1e9
    val stored = spark.read.parquet(s"$root/out/certs").count()
    println(f"""{"metric":"ingest_entries_per_s","value":${n / sec}%.1f,"entries":$n,"seconds":$sec%.2f,"stored":$stored}""")
    spark.stop()
  }
}

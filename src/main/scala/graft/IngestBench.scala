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

    val root = java.nio.file.Files.createTempDirectory("ingestbench").toString
    val ts0 = 1000000000000L
    val entries = (0 until n).map { i =>
      val (der, chain) = pool(i % pool.length)
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

package graft.sources

import graft.{SparkSpec, TestCerts}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Legacy-store import: a reference-layout PEM tree
  * (`<root>/<expDate>/<issuerID>/<serial>`, localdiskbackend.go:194-199)
  * lands in the engine's partitioned layout with dedup and a working
  * issuer dimension. */
class PemStoreSpec extends SparkSpec {

  private def pemOf(s: String): String = s.stripMargin

  lazy val legacyRoot: String = {
    val root = Files.createTempDirectory("legacy").toString
    // layout keys as the reference writes them: day-resolution expDate
    // dir, issuer-id dir, serial-id file name
    def put(expDate: String, issuer: String, serial: String, pem: String): Unit = {
      val dir = Paths.get(root, expDate, issuer)
      Files.createDirectories(dir)
      Files.writeString(dir.resolve(serial), pem)
    }
    // kLeadingZeroes: notAfter 2020-02-05, serial id AKo=
    put("2020-02-05", "issuerA", "AKo=", TestCerts.kLeadingZeroes)
    put("2020-02-05", "issuerA", "AKo=_dup", TestCerts.kLeadingZeroes) // dup append
    put("2046-08-07", "issuerB", "JOlSbGjLf2rKREtCczv_fPBUNK4=", TestCerts.kSyntheticLeaf)
    // reference side files that must be skipped
    Files.createDirectories(Paths.get(root, "state"))
    Files.writeString(Paths.get(root, "state", "bG9n"), "{}")
    Files.writeString(Paths.get(root, "2020-02-05", "dirty"), "")
    root
  }

  test("importLegacyStore lands the reference layout in the engine layout") {
    val out = Files.createTempDirectory("imported").toString
    val counts = PemStore.importLegacyStore(spark, legacyRoot, out)
    assert(counts("files") == 3L, counts.toString)   // 2 certs + 1 dup; state/dirty skipped
    assert(counts("stored") == 2L, "duplicate appends dedup on the triple key")
    val certs = spark.read.parquet(s"$out/certs")
    assert(certs.count() == 2L)
    val lz = certs.filter(col("serial_id") === "AKo=").collect()(0)
    assert(lz.getAs[String]("issuer_id") == "issuerA", "issuer identity from the path")
    assert(lz.getAs[String]("exp_date").startsWith("2020-02-05"))
    assert(lz.getAs[String]("pem").contains("BEGIN CERTIFICATE"))
    // the issuer dimension works over the imported store
    val dim = graft.queries.Statistics.issuerDim(spark, out).collect()
    assert(dim.map(_.getString(0)).toSet == Set("issuerA", "issuerB"))
    // and the statistics report runs end-to-end
    val grand = graft.queries.Statistics.report(spark, out).collect()
      .filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.head.getLong(2) == 2L)
  }

  test("importing into a non-empty certRoot skips rows already present") {
    val out = Files.createTempDirectory("importedtwice").toString
    PemStore.importLegacyStore(spark, legacyRoot, out)
    // same SPKI-digest issuer ids in both layouts: a second import of
    // the same store must not create triple-key duplicates
    val counts = PemStore.importLegacyStore(spark, legacyRoot, out)
    assert(counts("stored") == 0L, counts.toString)
    assert(counts("already_present") == 2L, counts.toString)
    val certs = spark.read.parquet(s"$out/certs")
    assert(certs.count() == 2L, "re-import must be a no-op on the cert store")
  }

  test("day-resolution import round-trips a legacy store's own bucket ids") {
    // the reference's default layout is day-resolution dirs
    // (types.go:21-23); importing at hourResolution=false keeps the
    // legacy ids byte-identical instead of re-bucketing to hours
    val out = Files.createTempDirectory("importedday").toString
    val counts = PemStore.importLegacyStore(spark, legacyRoot, out,
      hourResolution = false)
    assert(counts("stored") == 2L, counts.toString)
    val certs = spark.read.parquet(s"$out/certs")
    assert(certs.select(col("exp_date").cast("string")).distinct().collect()
      .map(_.getString(0)).toSet == Set("2020-02-05", "2046-08-07"),
      "day ids must round-trip losslessly")
    // re-import into the day store is still a no-op
    val again = PemStore.importLegacyStore(spark, legacyRoot, out,
      hourResolution = false)
    assert(again("stored") == 0L && again("already_present") == 2L, again.toString)
  }

  test("exportLegacyStore writes the reference layout; re-import round-trips") {
    val engine = Files.createTempDirectory("engine").toString
    PemStore.importLegacyStore(spark, legacyRoot, engine)
    val exported = Files.createTempDirectory("exported").toString
    val n = PemStore.exportLegacyStore(spark, engine, exported)
    assert(n == 2L, "one PEM file per stored cert")
    // <expDate>/<issuerID>/<serial> exactly (hour ids — the reference
    // reads both resolutions, types.go:21-23)
    val files = java.nio.file.Files.walk(Paths.get(exported)).iterator()
    val paths = scala.jdk.CollectionConverters.IteratorHasAsScala(files).asScala
      .filter(java.nio.file.Files.isRegularFile(_)).map(_.toString).toSeq
    assert(paths.exists(_.matches(""".*/2020-02-05-\d\d/issuerA/AKo=""")),
      paths.toString)
    assert(paths.forall(_.contains("issuer")), paths.toString)
    // the exported tree is a valid legacy store: importing it lands the
    // identical logical set (and nothing extra)
    val back = Files.createTempDirectory("back").toString
    val counts = PemStore.importLegacyStore(spark, exported, back)
    assert(counts("stored") == 2L && counts("path_mismatches") == 0L, counts.toString)
    val a = spark.read.parquet(s"$engine/certs")
      .select(col("exp_date").cast("string"), col("issuer_id"), col("serial_id"))
      .collect().map(_.toString).sorted.toSeq
    val b = spark.read.parquet(s"$back/certs")
      .select(col("exp_date").cast("string"), col("issuer_id"), col("serial_id"))
      .collect().map(_.toString).sorted.toSeq
    assert(a == b, "export → import must round-trip the key set")
  }

  test("path/content mismatches are counted, not silently imported") {
    val root = Files.createTempDirectory("legacybad").toString
    val dir = Paths.get(root, "1999-01-01", "issuerX")
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("WRONG"), TestCerts.kLeadingZeroes)
    val out = Files.createTempDirectory("importedbad").toString
    val counts = PemStore.importLegacyStore(spark, root, out)
    assert(counts("path_mismatches") == 1L, counts.toString)
    assert(counts("stored") == 1L, "still imported under the re-derived key")
  }
}

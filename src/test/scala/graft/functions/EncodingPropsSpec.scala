package graft.functions

import graft.SparkSpec
import graft.streaming.IngestJob
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Generative round-trip tests for the encoding / key / bucketing
  * column functions (SURVEY.md §7.5): ScalaCheck generators produce the
  * cases, one DataFrame pass evaluates them all (per-sample Spark jobs
  * would be 1000× the cost for the same coverage).
  */
class EncodingPropsSpec extends SparkSpec {

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    Iterator.continually(g.sample).flatten.take(n).toSeq

  private val genBytes: Gen[Array[Byte]] = for {
    n <- Gen.chooseNum(1, 24)
    bytes <- Gen.listOfN(n, Gen.chooseNum(0, 255).map(_.toByte))
    leadingZero <- Gen.oneOf(true, false)
  } yield {
    val a = bytes.toArray
    if (leadingZero) a(0) = 0
    a
  }

  test("serial hex and base64url encodings round-trip (D4)") {
    import spark.implicits._
    val serials = sample(genBytes, 300).zipWithIndex.map { case (b, i) => (i.toLong, b) }
    val df = serials.toDF("id", "serial")
      .withColumn("hex_enc", CertFuncs.serialHex(col("serial")))
      .withColumn("hex_dec", unhex(upper(col("hex_enc"))))
      .withColumn("b64url", CertFuncs.serialId(col("serial")))
      .withColumn("b64_dec", unbase64(translate(col("b64url"), "-_", "+/")))
    assert(df.filter(col("hex_dec") =!= col("serial")).count() == 0L)
    assert(df.filter(col("b64_dec") =!= col("serial")).count() == 0L)
    // leading zeros survive: decoded length equals original length
    assert(df.filter(length(col("hex_dec")) =!= length(col("serial"))).count() == 0L)
  }

  test("composite cert keys round-trip; wrong arity parses to null (D8)") {
    import spark.implicits._
    val seg: Gen[String] = Gen.chooseNum(1, 12)
      .flatMap(n => Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))
    val triples = sample(Gen.zip(seg, seg, seg), 300)
    val df = triples.toDF("e", "i", "s")
      .withColumn("key", CertFuncs.uniqueCertId(col("e"), col("i"), col("s")))
      .withColumn("parsed", CertFuncs.parseUniqueCertId(col("key")))
    assert(df.filter(col("parsed.exp_date") =!= col("e") ||
      col("parsed.issuer_id") =!= col("i") ||
      col("parsed.serial_id") =!= col("s")).count() == 0L)
    val bad = sample(Gen.zip(seg, seg), 100)
    val badDf = bad.toDF("a", "b")
      .withColumn("parsed", CertFuncs.parseUniqueCertId(concat_ws("::", col("a"), col("b"))))
    assert(badDf.filter(col("parsed").isNotNull).count() == 0L)
  }

  test("PEM encode/decode round-trips arbitrary DER bytes (D7)") {
    import spark.implicits._
    // include sizes straddling the 64-char (48-byte) PEM line width
    val gen = Gen.chooseNum(1, 200).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0, 255).map(_.toByte)).map(_.toArray))
    val ders = sample(gen, 200).zipWithIndex.map { case (b, i) => (i.toLong, b) }
    val df = ders.toDF("id", "der")
      .withColumn("pem", CertFuncs.derToPem(col("der")))
      .withColumn("back", CertFuncs.pem_to_der(col("pem")))
    assert(df.filter(col("back") =!= col("der")).count() == 0L)
    // PEM body lines are 64 chars max, header/footer intact
    val pem = df.filter(col("id") === ders.maxBy(_._2.length)._1)
      .select(col("pem")).collect()(0).getString(0)
    assert(pem.startsWith("-----BEGIN CERTIFICATE-----\n"))
    assert(pem.endsWith("\n-----END CERTIFICATE-----"))
    assert(pem.linesIterator.filterNot(_.startsWith("-----")).forall(_.length <= 64))
  }

  test("hour buckets: id parses back to bucket start; expiry flips exactly at bucket end (D5/E2)") {
    import spark.implicits._
    // epoch millis across 1970..2200, arbitrary sub-hour offsets
    val genTs = Gen.chooseNum(0L, 7258118400000L)
    val tss = sample(genTs, 300).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = tss.toDF("id", "ms")
      .withColumn("ts", timestamp_millis(col("ms")))
      .withColumn("bucket", CertFuncs.expDateHour(col("ts")))
      .withColumn("hour_id", CertFuncs.expDateHourId(col("ts")))
      .withColumn("bucket_from_id", to_timestamp(col("hour_id"), "yyyy-MM-dd-HH"))
      // boundary probes around this bucket's end
      .withColumn("end_ms", col("ms") - col("ms") % 3600000 + 3600000)
      .withColumn("exp_at_last_good",
        CertFuncs.isExpiredAt(col("bucket"), timestamp_millis(col("end_ms") - 1), hourResolution = true))
      .withColumn("exp_at_end",
        CertFuncs.isExpiredAt(col("bucket"), timestamp_millis(col("end_ms")), hourResolution = true))
    assert(df.filter(col("bucket_from_id") =!= col("bucket")).count() == 0L,
      "hour id must parse back to the bucket start")
    assert(df.filter(col("exp_at_last_good")).count() == 0L,
      "bucket must not be expired at its last good millisecond")
    assert(df.filter(!col("exp_at_end")).count() == 0L,
      "bucket must be expired exactly at bucket end")
    // the streaming TTL instant is the bucket START (ExpireTime()
    // returns e.date, types.go:371-373) — one hour before bucket end
    val ends = df.select(col("hour_id"), col("end_ms")).distinct().collect()
    ends.foreach(r => assert(
      IngestJob.expDateExpireMs(r.getString(0)) == r.getLong(1) - 3600000L))
  }
}

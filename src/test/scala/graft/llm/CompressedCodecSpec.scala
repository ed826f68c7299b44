package graft.llm

import graft.SparkSpec

/** The compressed-codec family ([[MuLawCodec]], [[AdpcmCodec]],
  * [[MjpegCodec]]): algorithm identities, container round-trips,
  * lossy-compression error bounds, and the cross-codec transcode
  * contract (compressed resize output is [[WavCodec]]-decodable PCM).
  */
class CompressedCodecSpec extends SparkSpec {

  // ---- G.711 mu-law --------------------------------------------------------

  test("mu-law compress(expand(u)) == u for all codes except negative zero") {
    // 0x7F is the negative-zero code: expand(0x7F) = -0 = +0, which
    // re-encodes as the positive-zero code 0xFF (the G.711 identity's
    // documented single exception)
    (0 until 256).foreach { u =>
      val rt = MuLawCodec.compress(MuLawCodec.expand(u))
      if (u == 0x7f) assert(rt == 0xff) else assert(rt == u, s"code $u")
    }
  }

  test("mu-law expand covers the full companded range monotonically") {
    // positive codes 0xFF (=0) down to 0x80 (=32124): decreasing code
    // ordinal = increasing magnitude within the positive half
    val pos = (0x80 to 0xff).map(MuLawCodec.expand).reverse
    assert(pos.head == 0 && pos.last == 32124)
    assert(pos.zip(pos.tail).forall { case (a, b) => a < b }, "monotone")
    // negative half mirrors (negative zero folds to 0)
    assert(MuLawCodec.expand(0x00) == -32124)
    (0 until 128).foreach { u =>
      assert(MuLawCodec.expand(u) == -MuLawCodec.expand(u | 0x80) ||
        (u == 0x7f && MuLawCodec.expand(u) == 0))
    }
  }

  test("mu-law compress error is bounded by the segment step (companding)") {
    // quantization error of expand(compress(x)) grows with |x| but is
    // bounded by half the segment step: <= 2^(exp+3) with exp <= 7
    val rnd = new scala.util.Random(42)
    (0 until 2000).foreach { _ =>
      val x = rnd.nextInt(65536) - 32768
      val y = MuLawCodec.expand(MuLawCodec.compress(x))
      val clipped = math.max(-32635, math.min(32635, x))
      assert(math.abs(y - clipped) <= 1024, s"x=$x y=$y")
    }
  }

  test("mu-law WAV round-trip: parse rejects junk, skips chunks, validates fmt") {
    val codes = Array.tabulate[Byte](12)(i => (i * 17 + 3).toByte)
    val wav = MuLawCodec.encode(2, 8000, codes)
    val parsed = MuLawCodec.parseHeader(wav)
    assert(parsed.contains((2, 8000, 44, 12)))
    // junk chunk between fmt and data still parses (offset shifts)
    val junked = WavCodec.withJunkChunk(wav)
    val pj = MuLawCodec.parseHeader(junked)
    assert(pj.isDefined && pj.get._1 == 2 && pj.get._4 == 12)
    // a PCM16 WAV is NOT a mu-law WAV (format tag mismatch)
    assert(MuLawCodec.parseHeader(
      WavCodec.encode(1, 8000, Array[Byte](1, 2, 3, 4))).isEmpty)
    // and a mu-law WAV is NOT PCM16
    assert(WavCodec.parseHeader(wav).isEmpty)
    // truncated data declared longer than the payload
    assert(MuLawCodec.parseHeader(wav.dropRight(4)).isEmpty)
  }

  test("mu-law resize transcodes to a WavCodec-decodable PCM16 WAV") {
    val codes = Array.tabulate[Byte](20)(i => (i * 31).toByte)
    val wav = MuLawCodec.encode(2, 16000, codes) // 10 frames, 2 ch
    val rs = MuLawCodec.resize(7L, wav, 2, 6)
    assert(rs.ok && rs.width == 2 && rs.height == 6)
    val dec = WavCodec.decode(7L, rs.payload)
    assert(dec.ok && dec.width == 2 && dec.height == 16000 && dec.n_frames == 6)
    // identity-length resample reproduces expand() of every code
    val same = MuLawCodec.resize(7L, wav, 2, 10)
    val data = same.payload.drop(44)
    val got = Array.tabulate(data.length / 2)(
      k => (data(2 * k) & 0xff) | (data(2 * k + 1) << 8))
    val want = codes.map(c => MuLawCodec.expand(c & 0xff))
    assert(got.sameElements(want))
  }

  // ---- IMA ADPCM -----------------------------------------------------------

  test("adpcm decoder matches a hand-computed IMA state walk") {
    // pred=0, idx=0 (step 7): nibble 0 -> diff=0, nibble 4 -> diff=7,
    // index walks per the IMA table
    var st = (0, 0)
    st = AdpcmCodec.step(st._1, st._2, 0)
    assert(st == (0, 0)) // diff = 7>>3 = 0; idx 0 + (-1) clamps to 0
    st = AdpcmCodec.step(st._1, st._2, 4)
    assert(st == (7, 2)) // diff = 7 + 0 = 7... (7>>3=0)+(7)=7; idx 0+2
    st = AdpcmCodec.step(st._1, st._2, 12)
    // step(2)=9: diff = -(9>>3 + 9) = -10; idx 2 + 2 = 4
    assert(st == (-3, 4))
    // clamp both rails
    assert(AdpcmCodec.step(32767, 88, 7)._1 == 32767)
    assert(AdpcmCodec.step(-32768, 88, 15)._1 == -32768)
    assert(AdpcmCodec.step(0, 0, 8)._2 == 0)   // index floor clamp
    assert(AdpcmCodec.step(0, 88, 7)._2 == 88) // index ceil clamp
  }

  test("adpcm compress -> decode tracks the input within the step bound") {
    // a slow sine-ish ramp: adaptive prediction should track closely
    val samples = Array.tabulate(1001)(i =>
      (8000 * math.sin(i / 40.0)).toInt)
    val wav = AdpcmCodec.compress(8000, 12, samples) // 17 samples/block
    val parsed = AdpcmCodec.parseHeader(wav)
    assert(parsed.isDefined)
    val (_, ba, spb, off, dl) = parsed.get
    assert(ba == 12 && spb == 17)
    val decoded = AdpcmCodec.decodeSamples(wav, ba, off, dl)
    // padded to whole blocks
    assert(decoded.length == ((samples.length + spb - 1) / spb) * spb)
    // mean absolute error small relative to the signal swing (the 4:1
    // compression promise); worst-case bounded by the max step
    val errs = samples.indices.map(i => math.abs(decoded(i) - samples(i)))
    assert(errs.sum.toDouble / errs.length < 150.0, s"mae=${errs.sum / errs.length}")
    assert(errs.max <= 32767 / 4, s"max=${errs.max}")
  }

  test("adpcm container: geometry, junk tolerance boundaries, mono contract") {
    val blocks = Seq((100, 5, Array[Byte](0x21, 0x7f, -1, 8)),
      (-200, 88, Array[Byte](0, 0x34, 0x56, 0x12)))
    val wav = AdpcmCodec.encodeRaw(22050, 8, blocks)
    val meta = AdpcmCodec.decode(1L, wav)
    // 2 blocks x (1 + 2*4) samples
    assert(meta.ok && meta.width == 1 && meta.height == 22050 &&
      meta.n_frames == 18)
    val (_, ba, _, off, dl) = AdpcmCodec.parseHeader(wav).get
    val s = AdpcmCodec.decodeSamples(wav, ba, off, dl)
    // first sample of each block IS its header predictor
    assert(s(0) == 100 && s(9) == -200)
    // data not a whole number of blocks -> reject
    val bad = java.util.Arrays.copyOf(wav, wav.length)
    bad(44) = 9 // data chunk len 16 -> 9 (not % blockAlign)
    assert(AdpcmCodec.parseHeader(bad).isEmpty)
    // PCM16 and mu-law WAVs are not ADPCM
    assert(AdpcmCodec.parseHeader(
      WavCodec.encode(1, 8000, Array[Byte](1, 2))).isEmpty)
  }

  test("adpcm resize transcodes to PCM16; mono-only enforced") {
    val blocks = Seq((0, 20, Array[Byte](0x77, 0x11, 0x42, -1)))
    val wav = AdpcmCodec.encodeRaw(8000, 8, blocks)
    val rs = AdpcmCodec.resize(3L, wav, 1, 5)
    assert(rs.ok && rs.width == 1 && rs.height == 5)
    assert(WavCodec.decode(3L, rs.payload).ok)
    assert(!AdpcmCodec.resize(3L, wav, 2, 5).ok, "stereo target rejected")
  }

  // ---- Motion-JPEG AVI -----------------------------------------------------

  private def solidFrame(w: Int, h: Int, rgb: Int) = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
    img
  }

  test("mjpeg: container walk + REAL jpeg decode geometry cross-check") {
    assume(ImageIoCodec.available, "imageio unavailable in this JVM")
    val frames = Seq(0xff0000, 0x00ff00, 0x0000ff)
      .map(c => MjpegCodec.encodeJpeg(solidFrame(32, 16, c)))
    val avi = MjpegCodec.encode(32, 16, 40000, frames)
    val meta = MjpegCodec.decode(1L, avi)
    assert(meta.ok && meta.width == 32 && meta.height == 16 && meta.n_frames == 3)
    // header geometry lying about the real JPEG dims -> not ok
    val lied = MjpegCodec.encode(8, 8, 40000, frames)
    assert(!MjpegCodec.decode(1L, lied).ok)
    // a DIB AVI is not MJPEG (frame chunks are not JPEGs)
    val dib = AviCodec.encode(4, 2, 40000,
      Seq(Array.fill[Byte](AviCodec.rowStride(4) * 2)(7)))
    assert(!MjpegCodec.decode(1L, dib).ok)
  }

  test("mjpeg: jpeg encode is deterministic; solid-color decode error <= 1") {
    assume(ImageIoCodec.available, "imageio unavailable in this JVM")
    (0 until 24).foreach { t =>
      val (r, g, b) = ((t * 37 + 11) % 256, (t * 91 + 5) % 256, (t * 53 + 29) % 256)
      val img = solidFrame(16, 16, (r << 16) | (g << 8) | b)
      val j1 = MjpegCodec.encodeJpeg(img)
      val j2 = MjpegCodec.encodeJpeg(img)
      assert(java.util.Arrays.equals(j1, j2), "deterministic encode")
      val avi = MjpegCodec.encode(16, 16, 40000, Seq(j1))
      val Seq((0, mr, mg, mb)) = MjpegCodec.sampledFrameMeans(avi, 1)
      assert(math.abs(mr - r) <= 1 && math.abs(mg - g) <= 1 &&
        math.abs(mb - b) <= 1, s"($r,$g,$b) -> ($mr,$mg,$mb)")
    }
  }

  test("mjpeg: frame sampling picks every stride-th frame through the decode") {
    assume(ImageIoCodec.available, "imageio unavailable in this JVM")
    val grays = (0 until 5).map(f => 40 * f)
    val frames = grays.map(v =>
      MjpegCodec.encodeJpeg(solidFrame(16, 16, (v << 16) | (v << 8) | v)))
    val avi = MjpegCodec.encode(16, 16, 40000, frames)
    val means = MjpegCodec.sampledFrameMeans(avi, 2)
    assert(means.map(_._1) == Seq(0, 2, 4))
    means.foreach { case (f, mr, _, _) =>
      assert(math.abs(mr - grays(f)) <= 2, s"frame $f")
    }
  }

  test("mjpeg: decode-skip — unsampled frames NEVER enter ImageIO, and " +
    "sampled means are byte-equal to the full-decode run's") {
    assume(ImageIoCodec.available, "imageio unavailable in this JVM")
    val grays = (0 until 6).map(f => 30 * f)
    val frames = grays.map(v =>
      MjpegCodec.encodeJpeg(solidFrame(16, 16, (v << 16) | (v << 8) | v)))
    val avi = MjpegCodec.encode(16, 16, 40000, frames)
    // full decode first: the reference means per frame index
    val full = MjpegCodec.sampledFrameMeans(avi, 1)
    assert(full.map(_._1) == (0 until 6))
    // stride run: exactly ⌈6/3⌉ = 2 real JPEG reads — the chunk walk
    // skips unsampled frames by SIZE, they never reach the DCT
    val before = MjpegCodec.jpegReads.get()
    val sampled = MjpegCodec.sampledFrameMeans(avi, 3)
    val reads = MjpegCodec.jpegReads.get() - before
    assert(reads == 2, s"expected 2 ImageIO reads for stride 3, got $reads")
    assert(sampled.map(_._1) == Seq(0, 3))
    // and the sampled rows equal the full run's rows at those indices
    assert(sampled == full.filter(m => m._1 % 3 == 0))
  }

  test("mjpeg: resize decodes, resamples, re-encodes a valid MJPG AVI") {
    assume(ImageIoCodec.available, "imageio unavailable in this JVM")
    val frames = Seq(0x804020, 0x204080)
      .map(c => MjpegCodec.encodeJpeg(solidFrame(32, 32, c)))
    val avi = MjpegCodec.encode(32, 32, 40000, frames)
    val rs = MjpegCodec.resize(2L, avi, 16, 16)
    assert(rs.ok && rs.width == 16 && rs.height == 16)
    val meta = MjpegCodec.decode(2L, rs.payload)
    assert(meta.ok && meta.width == 16 && meta.n_frames == 2)
    // solid color survives the double lossy pass within tolerance
    val means = MjpegCodec.sampledFrameMeans(rs.payload, 1)
    assert(math.abs(means.head._2 - 0x80) <= 3)
  }

  test("mjpeg: embed histograms really-decoded pixels across all frames") {
    assume(ImageIoCodec.available, "imageio unavailable in this JVM")
    // two frames at opposite luminance extremes -> mass in both tails
    val frames = Seq(0x000000, 0xffffff)
      .map(c => MjpegCodec.encodeJpeg(solidFrame(16, 16, c)))
    val avi = MjpegCodec.encode(16, 16, 40000, frames)
    val hist = MjpegCodec.embed(1L, avi, 16)
    assert(hist.sum == 2 * 16 * 16)
    assert(hist.head > 0 && hist.last > 0, "both tails populated")
    assert(MjpegCodec.embed(1L, Array[Byte](1, 2, 3), 16).forall(_ == 0f))
  }

  // ---- mixed-corpus dispatch + the streaming twin ---------------------------

  private def mixedRows: Seq[(Long, Array[Byte], String)] = {
    val ppm = ("P6\n2 1\n255\n".getBytes("US-ASCII") ++
      Array[Byte](1, 2, 3, 4, 5, 6), "image/x-portable-pixmap")
    val mu = (MuLawCodec.encode(1, 8000, Array[Byte](10, 20, 30)),
      "audio/basic")
    val ad = (AdpcmCodec.encodeRaw(8000, 8,
      Seq((50, 3, Array[Byte](0x21, 0x43, 0x65, 0x07)))),
      "audio/vnd.ima-adpcm")
    Seq(
      (1L, ppm._1, ppm._2), (2L, mu._1, mu._2), (3L, ad._1, ad._2),
      (4L, Array[Byte](9, 9, 9), "audio/basic"),     // junk payload
      (5L, ppm._1, "application/unknown"),           // unknown mime
      (6L, Array.emptyByteArray, "audio/basic"))     // empty payload
  }

  private val mixedCodecs = Map(
    "image/x-portable-pixmap" -> (PpmCodec: MediaCodec),
    "audio/basic" -> (MuLawCodec: MediaCodec),
    "audio/vnd.ima-adpcm" -> (AdpcmCodec: MediaCodec))

  test("decodeMixed dispatches per mime in one pass; unknowns/junk are not-ok") {
    implicit val sp = spark
    import spark.implicits._
    val df = mixedRows.toDF("media_id", "payload", "mime")
    val got = Multimodal.decodeMixed(df, mixedCodecs)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getBoolean(5)))
      .toMap
    assert(got(1L) == (("image/x-portable-pixmap", 2, 1, 1, true)))
    assert(got(2L) == (("audio/basic", 1, 8000, 3, true)))
    assert(got(3L) == (("audio/vnd.ima-adpcm", 1, 8000, 9, true)))
    assert(!got(4L)._5 && !got(5L)._5 && !got(6L)._5)
    // the card rolls it up per mime with exact totals
    val card = Multimodal.mediaCard(Multimodal.decodeMixed(df, mixedCodecs))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(card("audio/basic") == ((3L, 1L)), "3 rows, 1 decodable")
    assert(card("application/unknown") == ((1L, 0L)))
  }

  test("decodeMixed is stateless: the same chain serves a stream equal to batch") {
    implicit val sp = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val batch = Multimodal.decodeMixed(
        mixedRows.toDF("media_id", "payload", "mime"), mixedCodecs)
      .collect().map(_.toSeq).toSet
    val in = MemoryStream[(Long, Array[Byte], String)]
    val q = Multimodal.decodeMixed(
        in.toDF().toDF("media_id", "payload", "mime"), mixedCodecs)
      .writeStream.format("memory").queryName("mmdecstream")
      .outputMode("append").start()
    try {
      in.addData(mixedRows: _*)
      q.processAllAvailable()
      val streamed = spark.table("mmdecstream").collect().map(_.toSeq).toSet
      assert(streamed == batch, s"stream=$streamed\nbatch=$batch")
    } finally q.stop()
  }

  // ---- cross-codec: the compressed family rides the shared seam ------------

  test("compressed audio embeds agree with WavCodec on identical signals") {
    // the same PCM signal, stored PCM16 vs mu-law(lossless subset):
    // mu-law codes expanding to values whose histogram buckets match.
    // Use exact mu-law decision levels: expand() outputs are identical
    // whether the container was PCM16-of-expanded or mu-law-of-code.
    val codes = Array.tabulate[Byte](40)(i => (i * 6 + 1).toByte)
    val expanded = codes.map(c => MuLawCodec.expand(c & 0xff))
    val pcmBytes = new Array[Byte](expanded.length * 2)
    expanded.zipWithIndex.foreach { case (v, i) =>
      pcmBytes(2 * i) = (v & 0xff).toByte
      pcmBytes(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val asPcm = WavCodec.encode(1, 8000, pcmBytes)
    val asMu = MuLawCodec.encode(1, 8000, codes)
    val h1 = WavCodec.embed(1L, asPcm, 16)
    val h2 = MuLawCodec.embed(1L, asMu, 16)
    assert(h1.sameElements(h2), "identical histograms across containers")
  }
}

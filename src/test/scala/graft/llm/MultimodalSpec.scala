package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  lazy val media = Multimodal.toMedia(
    Seq((1L, "hello"), (2L, ""), (3L, "world")).toDF("id", "payload"),
    "id", "payload", "application/octet-stream")

  test("toMedia produces the canonical schema with exact metadata") {
    assert(media.schema == Multimodal.mediaSchema)
    val r = media.filter(col("media_id") === 1).select(col("meta.*")).collect()(0)
    assert(r.getString(0) == "application/octet-stream")
    assert(r.getLong(1) == 5L)
    // sha256("hello")
    assert(r.getString(2) ==
      "2cf24dba5fb0a30e26e83b2ac5b9e29e1b161e5c1fa7425e73043362938b9824")
  }

  test("decodeStub is deterministic and flags empty payloads") {
    implicit val s = spark
    val d1 = Multimodal.decodeStub(media).orderBy("media_id").collect()
    val d2 = Multimodal.decodeStub(media).orderBy("media_id").collect()
    assert(d1.sameElements(d2))
    val empty = d1.find(_.getLong(0) == 2L).get
    assert(!empty.getBoolean(4) && empty.getInt(1) == 0)
    val ok = d1.find(_.getLong(0) == 1L).get
    assert(ok.getBoolean(4) && ok.getInt(1) >= 16 && ok.getInt(2) >= 16)
  }

  test("resizeStub rewrites dimensions, keeps payload shape, flags empties") {
    implicit val s = spark
    val out = Multimodal.resizeStub(media, 224, 224).orderBy("media_id").collect()
    val ok = out.find(_.getLong(0) == 1L).get
    assert(ok.getInt(1) == 224 && ok.getInt(2) == 224 && ok.getBoolean(4))
    assert(ok.getAs[Array[Byte]](3).nonEmpty)
    val empty = out.find(_.getLong(0) == 2L).get
    assert(!empty.getBoolean(4))
  }

  test("extractFeaturesStub yields deterministic unit-norm vectors feeding similarity ops") {
    implicit val s = spark
    val f1 = Multimodal.extractFeaturesStub(media).orderBy("media_id").collect()
    val f2 = Multimodal.extractFeaturesStub(media).orderBy("media_id").collect()
    assert(f1.map(_.getSeq[Float](1)).toSeq == f2.map(_.getSeq[Float](1)).toSeq)
    val v = f1.head.getSeq[Float](1)
    assert(v.length == 16)
    assert(math.abs(v.map(x => x.toDouble * x).sum - 1.0) < 1e-5, "unit norm")
    // the vectors plug into the similarity operators (cosine top-k)
    graft.functions.GraftFunctions.register(spark)
    val vecs = Multimodal.extractFeaturesStub(media)
      .select(col("media_id").as("vec_id"), col("embedding"),
        Similarity.norm(col("embedding")).as("nrm"))
    val top = Similarity.cosineTopK(vecs, vecs.filter(col("vec_id") === 1), k = 2)
    assert(top.count() == 2L)
  }

  test("MediaCodec seam: a second codec swaps in without touching the plumbing") {
    implicit val s = spark
    // trivial alternate codec: fixed geometry, constant-direction
    // embedding, payload reversed on resize — enough to prove every
    // surface dispatches through the seam (and that open/close run
    // per partition, counted via an accumulator)
    val opens = spark.sparkContext.longAccumulator("codec_opens")
    val closes = spark.sparkContext.longAccumulator("codec_closes")
    object FixedCodec extends MediaCodec {
      override def open(): Unit = opens.add(1)
      override def close(): Unit = closes.add(1)
      def decode(id: Long, p: Array[Byte]): Multimodal.DecodedMeta =
        Multimodal.DecodedMeta(id, 640, 480, 24, ok = true)
      def resize(id: Long, p: Array[Byte], w: Int, h: Int): Multimodal.ResizedMeta =
        Multimodal.ResizedMeta(id, w, h, p.reverse, ok = true)
      def embed(id: Long, p: Array[Byte], dim: Int): Array[Float] =
        Array.tabulate(dim)(d => if (d == 0) 1f else 0f)
    }
    val d = Multimodal.decodeWith(media, FixedCodec).orderBy("media_id").collect()
    val ok = d.find(_.getLong(0) == 1L).get
    assert(ok.getInt(1) == 640 && ok.getInt(2) == 480 && ok.getInt(3) == 24)
    // empty payload still short-circuits in the PLUMBING, not the codec
    val empty = d.find(_.getLong(0) == 2L).get
    assert(!empty.getBoolean(4) && empty.getInt(1) == 0)
    val r = Multimodal.resizeWith(media, 32, 32, FixedCodec)
      .orderBy("media_id").collect()
    assert(r.find(_.getLong(0) == 1L).get.getAs[Array[Byte]](3)
      .sameElements("hello".getBytes.reverse))
    val e = Multimodal.embedWith(media, FixedCodec).orderBy("media_id").collect()
    assert(e.head.getSeq[Float](1) == (1f +: Seq.fill(15)(0f)))
    assert(opens.value > 0 && closes.value > 0, "per-partition lifecycle ran")
    // and the default-stub entry points are unchanged by the refactor
    val stub = Multimodal.decodeStub(media).orderBy("media_id").collect()
    assert(stub.find(_.getLong(0) == 1L).get.getInt(1) >= 16)
  }

  test("sampleFrameIdx picks every k-th frame") {
    val out = Seq(Tuple1(10)).toDF("n")
      .select(Multimodal.sampleFrameIdx(col("n"), 3).as("idx"))
      .collect()(0).getSeq[Int](0)
    assert(out == Seq(0, 3, 6, 9))
  }

  private def ppm(w: Int, h: Int, raster: Array[Byte],
      header: String = null): Array[Byte] = {
    val hdr = Option(header).getOrElse(s"P6\n$w $h\n255\n")
    hdr.getBytes("US-ASCII") ++ raster
  }

  test("PpmCodec.decode parses real netpbm headers, rejects garbage") {
    val px = Array.tabulate[Byte](12)(_.toByte) // 2x2 RGB
    val d = PpmCodec.decode(1L, ppm(2, 2, px))
    assert(d == Multimodal.DecodedMeta(1L, 2, 2, 1, ok = true))
    // comments + arbitrary whitespace are legal netpbm
    val commented = "P6 # a comment\n# another\n 2\t2 \n255\n"
    assert(PpmCodec.decode(2L, ppm(2, 2, px, commented))
      == Multimodal.DecodedMeta(2L, 2, 2, 1, ok = true))
    // P5 grayscale: 4 raster bytes for 2x2
    assert(PpmCodec.decode(3L, ppm(2, 2, px.take(4), "P5\n2 2\n255\n"))
      == Multimodal.DecodedMeta(3L, 2, 2, 1, ok = true))
    // bad magic / truncated raster / oversize maxval all flag not-ok
    assert(!PpmCodec.decode(4L, ppm(2, 2, px, "P7\n2 2\n255\n")).ok)
    assert(!PpmCodec.decode(5L, ppm(2, 2, px.take(11))).ok)
    assert(!PpmCodec.decode(6L, ppm(2, 2, px, "P6\n2 2\n65535\n")).ok)
    assert(!PpmCodec.decode(7L, "not an image at all".getBytes).ok)
  }

  test("PpmCodec.resize is a real nearest-neighbor resample, re-encoded byte-exactly") {
    // 2x2 image with distinct solid pixels A B / C D
    val px = Array[Byte](
      10, 11, 12,  20, 21, 22,
      30, 31, 32,  40, 41, 42)
    val r = PpmCodec.resize(1L, ppm(2, 2, px), 4, 4)
    assert(r.ok && r.width == 4 && r.height == 4)
    val hdr = "P6\n4 4\n255\n".getBytes("US-ASCII")
    assert(r.payload.take(hdr.length).sameElements(hdr), "re-encode header")
    // sx = x*2/4 -> 0,0,1,1: each source pixel becomes a 2x2 block
    val out = r.payload.drop(hdr.length)
    val expect = Array(
      Seq(10, 11, 12, 10, 11, 12, 20, 21, 22, 20, 21, 22),
      Seq(10, 11, 12, 10, 11, 12, 20, 21, 22, 20, 21, 22),
      Seq(30, 31, 32, 30, 31, 32, 40, 41, 42, 40, 41, 42),
      Seq(30, 31, 32, 30, 31, 32, 40, 41, 42, 40, 41, 42)).flatten
    assert(out.map(_.toInt).toSeq == expect.toSeq, "quadrant replication")
    // downscale picks the top-left representative
    val down = PpmCodec.resize(1L, ppm(2, 2, px), 1, 1)
    assert(down.payload.drop("P6\n1 1\n255\n".length).map(_.toInt).toSeq
      == Seq(10, 11, 12))
    assert(!PpmCodec.resize(1L, "junk".getBytes, 4, 4).ok)
  }

  test("PpmCodec.resize rejects Int-overflow target buffers as not-ok") {
    val px = Array.tabulate[Byte](12)(_.toByte)
    // 50000*50000*3 overflows Int — must flag not-ok, not throw/OOM
    val big = PpmCodec.resize(1L, ppm(2, 2, px), 50000, 50000)
    assert(!big.ok && big.payload.isEmpty)
    // a non-overflowing but large-dim pair with the OTHER axis tiny is
    // fine (exercises the Long-side guard arithmetic, not a refusal of
    // all large dims)
    val tall = PpmCodec.resize(1L, ppm(2, 2, px), 1, 4096)
    assert(tall.ok && tall.height == 4096)
  }

  test("PpmCodec.embed is a luminance histogram over really-decoded pixels") {
    // P5 grayscale: values 0 and 255 split into first/last of 4 buckets
    val g = Array[Byte](0, 0, 0, -1) // -1 = 0xff unsigned
    val e = PpmCodec.embed(1L, ppm(2, 2, g, "P5\n2 2\n255\n"), 4)
    assert(e.toSeq == Seq(3f, 0f, 0f, 1f), e.toSeq.toString)
    // invalid payload embeds to zeros (caller's unit-norm guards 0-div)
    assert(PpmCodec.embed(2L, "junk".getBytes, 4).toSeq == Seq.fill(4)(0f))
  }

  test("PpmCodec rides the seam plumbing: valid rows decode, junk flags not-ok") {
    implicit val s = spark
    val px = Array.tabulate[Byte](12)(_.toByte)
    val frames = Seq(
      (1L, ppm(2, 2, px)),
      (2L, "definitely not netpbm".getBytes),
      (3L, Array.emptyByteArray)).toDF("id", "payload")
    val media = Multimodal.toMedia(frames, "id", "payload", "image/x-portable-pixmap")
    val got = Multimodal.decodeWith(media, PpmCodec).orderBy("media_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(4)))
    assert(got.toSeq == Seq((1L, 2, true), (2L, 0, false), (3L, 0, false)))
  }

  // ---- cross-codec contract suite ---------------------------------------
  // One behavior contract, three codecs: the stub (plumbing-only), the
  // pure-JVM netpbm codec, and the JDK-imageio PNG codec. Each REAL
  // codec entry supplies an encoder and a pixel reader for the same
  // deterministic test image, so the suite can assert true geometry,
  // true pixels, and cross-codec agreement — not just "returns ok".
  // ImageIO rows skip-gate when java.desktop is stripped (the
  // reference's optional-dependency pattern, rediscache_test.go:16-28).

  /** Deterministic RGB test pattern (same pixels whatever the container). */
  private def pxAt(x: Int, y: Int): (Int, Int, Int) =
    ((x * 37 + y * 11) % 256, (x * 91 + y * 7) % 256, (x * 3 + y * 53) % 256)

  private def ppmOf(w: Int, h: Int): Array[Byte] = {
    val raster = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = pxAt(x, y); val o = (y * w + x) * 3
      raster(o) = r.toByte; raster(o + 1) = g.toByte; raster(o + 2) = b.toByte
    }
    s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++ raster
  }

  private def pngOf(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = pxAt(x, y)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Read back pixel (x, y) of a codec's payload encoding. */
  private def ppmPixel(p: Array[Byte], w: Int, x: Int, y: Int): (Int, Int, Int) = {
    val off = p.indexOfSlice("255\n".getBytes("US-ASCII")) + 4
    val o = off + (y * w + x) * 3
    ((p(o) & 0xff, p(o + 1) & 0xff, p(o + 2) & 0xff))
  }
  private def pngPixel(p: Array[Byte], w: Int, x: Int, y: Int): (Int, Int, Int) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p))
    val rgb = img.getRGB(x, y)
    (((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff))
  }

  private case class RealCodecCase(name: String, codec: MediaCodec,
      enc: (Int, Int) => Array[Byte],
      pixel: (Array[Byte], Int, Int, Int) => (Int, Int, Int),
      gate: () => Boolean)

  private lazy val realCodecs = Seq(
    RealCodecCase("ppm", PpmCodec, ppmOf, ppmPixel, () => true),
    RealCodecCase("imageio", ImageIoCodec, pngOf, pngPixel,
      () => ImageIoCodec.available))

  for (c <- realCodecs) {
    test(s"codec contract [${c.name}]: true geometry, garbage rejection, determinism") {
      assume(c.gate(), s"${c.name} codec unavailable in this JVM")
      val img = c.enc(5, 4)
      assert(c.codec.decode(1L, img) ==
        Multimodal.DecodedMeta(1L, 5, 4, 1, ok = true))
      assert(!c.codec.decode(2L, "garbage bytes".getBytes).ok)
      assert(!c.codec.resize(2L, "garbage bytes".getBytes, 2, 2).ok)
      assert(c.codec.embed(2L, "garbage bytes".getBytes, 4).toSeq
        == Seq.fill(4)(0f))
      val r1 = c.codec.resize(1L, img, 3, 2)
      val r2 = c.codec.resize(1L, img, 3, 2)
      assert(r1.ok && r1.payload.sameElements(r2.payload),
        "re-encode must be byte-deterministic (dedup layers above)")
      assert(c.codec.embed(1L, img, 8).toSeq == c.codec.embed(1L, img, 8).toSeq)
    }

    test(s"codec contract [${c.name}]: resize really resamples (pixel-exact NN)") {
      assume(c.gate(), s"${c.name} codec unavailable in this JVM")
      val img = c.enc(4, 4)
      val r = c.codec.resize(1L, img, 2, 2)
      assert(r.ok && r.width == 2 && r.height == 2)
      // src = floor(dst*4/2) -> pixels (0,0) (2,0) (0,2) (2,2)
      for ((dx, dy) <- Seq((0, 0), (1, 0), (0, 1), (1, 1)))
        assert(c.pixel(r.payload, 2, dx, dy) == pxAt(dx * 2, dy * 2),
          s"resized pixel ($dx,$dy)")
      // oversize target: not-ok, not an allocation attempt
      assert(!c.codec.resize(1L, img, 50000, 50000).ok)
    }

    test(s"codec contract [${c.name}]: plumbing round-trip (short-circuit, unit norm)") {
      assume(c.gate(), s"${c.name} codec unavailable in this JVM")
      implicit val s = spark
      val frames = Seq((1L, c.enc(4, 4)), (2L, Array.emptyByteArray),
        (3L, "junk".getBytes)).toDF("id", "payload")
      val m = Multimodal.toMedia(frames, "id", "payload", "image/test")
      val d = Multimodal.decodeWith(m, c.codec).orderBy("media_id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(4)))
      assert(d.toSeq == Seq((1L, 4, true), (2L, 0, false), (3L, 0, false)))
      val e = Multimodal.embedWith(m, c.codec, dim = 8).orderBy("media_id")
        .collect()
      val v = e.find(_.getLong(0) == 1L).get.getSeq[Float](1)
      assert(v.length == 8 &&
        math.abs(v.map(x => x.toDouble * x).sum - 1.0) < 1e-5, "unit norm")
    }
  }

  test("ImageIoCodec decodes COMPRESSED JPEG through the same seam: true " +
    "geometry, near-true pixels, deterministic PNG re-encode") {
    assume(ImageIoCodec.available &&
      javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").hasNext,
      "imageio jpeg support unavailable in this JVM")
    // lossy container: geometry must be exact, pixels within JPEG
    // quantization error (a FLAT color is DC-only, so the error bound
    // is tight — the pseudo-random pattern's high frequencies land at
    // ±165 under 4:2:0 subsampling on an 8×6 tile), resize output
    // (always PNG, so downstream dedup stays byte-deterministic)
    // stable across calls
    val (w, h) = (8, 6)
    val (fr, fg, fb) = (90, 140, 190)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (fr << 16) | (fg << 8) | fb)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpeg", bos)
    val jpeg = bos.toByteArray
    assert(jpeg.length >= 2 && (jpeg(0) & 0xff) == 0xff && (jpeg(1) & 0xff) == 0xd8,
      "fixture must really be JPEG (SOI marker)")
    assert(ImageIoCodec.decode(7L, jpeg) ==
      Multimodal.DecodedMeta(7L, w, h, 1, ok = true))
    // decoded pixels approximate the source within JPEG error
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpeg))
    var worst = 0
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = back.getRGB(x, y)
      worst = math.max(worst, math.abs(((rgb >> 16) & 0xff) - fr)
        .max(math.abs(((rgb >> 8) & 0xff) - fg)).max(math.abs((rgb & 0xff) - fb)))
    }
    assert(worst <= 8, s"JPEG decode of a flat color must be near-exact (worst=$worst)")
    val r1 = ImageIoCodec.resize(7L, jpeg, 4, 3)
    val r2 = ImageIoCodec.resize(7L, jpeg, 4, 3)
    assert(r1.ok && r1.width == 4 && r1.height == 3 &&
      r1.payload.sameElements(r2.payload))
    // the resized payload is PNG (lossless re-encode), not JPEG
    assert((r1.payload(1) & 0xff) == 'P'.toInt, "resize must re-encode as PNG")
    val e = ImageIoCodec.embed(7L, jpeg, 8)
    assert(e.toSeq == ImageIoCodec.embed(7L, jpeg, 8).toSeq && e.sum > 0f)
  }

  test("mmNearDup finds pixel-identical planted copies at exactly cos 1.0") {
    implicit val s = spark
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val pairs = Multimodal.mmNearDup(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // every planted copy (id+1e9 preserves the id-derived geometry, so
    // the raster is byte-identical) must pair with its original at a
    // cosine of EXACTLY 1.0 — identical pixels, identical histograms
    val plantedIds = docs.filter(col("doc_id") < 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    for (id <- plantedIds) {
      val hit = pairs.find(p => p._1 == id && p._2 == id + 1000000000L)
      assert(hit.isDefined, s"planted copy of doc $id not flagged")
      // dot/(nrm*nrm) of identical vectors lands within one ulp of 1.0
      // (dot(a,a) and nrm² round independently)
      assert(math.abs(hit.get._3 - 1.0) < 1e-12,
        s"identical pixels must score 1.0 up to an ulp: $hit")
    }
    // and the threshold binds: nothing below tau leaks through
    assert(pairs.forall(_._3 >= 0.9999))
  }

  test("cross-codec agreement: PPM raster and PNG re-encode of the SAME pixels " +
    "decode, embed, and resample identically") {
    assume(ImageIoCodec.available, "imageio codec unavailable in this JVM")
    val (w, h) = (6, 5)
    val asPpm = ppmOf(w, h); val asPng = pngOf(w, h)
    // geometry agrees
    assert(PpmCodec.decode(1L, asPpm).width == ImageIoCodec.decode(1L, asPng).width)
    // the luminance-histogram embedding is container-independent
    assert(PpmCodec.embed(1L, asPpm, 16).toSeq
      == ImageIoCodec.embed(1L, asPng, 16).toSeq,
      "identical pixels must embed identically whatever the container")
    // nearest-neighbor resample picks identical source pixels
    val rp = PpmCodec.resize(1L, asPpm, 3, 2)
    val ri = ImageIoCodec.resize(1L, asPng, 3, 2)
    for (y <- 0 until 2; x <- 0 until 3)
      assert(ppmPixel(rp.payload, 3, x, y) == pngPixel(ri.payload, 3, x, y),
        s"resampled pixel ($x,$y) differs between codecs")
  }

  // ---- WavCodec: the audio leg of the seam ------------------------------

  /** Stereo 16-bit test signal: frame f carries samples (100·f, -100·f). */
  private def wavOf(frames: Int, rate: Int = 8000): Array[Byte] = {
    val data = new Array[Byte](frames * 4)
    for (f <- 0 until frames; c <- 0 until 2) {
      val v = (if (c == 0) 100 * f else -100 * f).toShort
      data(f * 4 + c * 2) = (v & 0xff).toByte
      data(f * 4 + c * 2 + 1) = ((v >> 8) & 0xff).toByte
    }
    WavCodec.encode(2, rate, data)
  }

  private def sampleAt(p: Array[Byte], frame: Int, ch: Int,
      channels: Int): Int = {
    val off = 44 + (frame * channels + ch) * 2
    (p(off) & 0xff) | (p(off + 1) << 8)
  }

  test("WavCodec.decode really walks the RIFF container; garbage is not-ok") {
    val wav = wavOf(10, rate = 44100)
    val m = WavCodec.decode(1L, wav)
    assert(m.ok && m.width == 2 && m.height == 44100 && m.n_frames == 10)
    // an unknown odd-length chunk between fmt and data parses through
    // (chunk-skip + even-padding paths)
    val mj = WavCodec.decode(1L, WavCodec.withJunkChunk(wav))
    assert(mj.ok && mj.width == 2 && mj.n_frames == 10)
    // rejections: wrong magic, truncated raster, bad block align,
    // non-PCM format tag
    assert(!WavCodec.decode(1L, "not audio at all".getBytes).ok)
    assert(!WavCodec.decode(1L, wav.dropRight(3)).ok)
    val badAlign = wav.clone(); badAlign(32) = 5 // blockAlign != ch*2
    assert(!WavCodec.decode(1L, badAlign).ok)
    val badFmt = wav.clone(); badFmt(20) = 3     // IEEE-float format tag
    assert(!WavCodec.decode(1L, badFmt).ok)
  }

  test("WavCodec.resize is a real time-axis NN resample, valid-WAV round-trip") {
    val wav = wavOf(8)
    val rs = WavCodec.resize(1L, wav, 2, 4) // 8 frames -> 4, keep stereo
    assert(rs.ok && rs.width == 2 && rs.height == 4)
    // src frame = floor(dst·8/4) = 2·dst, per channel
    for (f <- 0 until 4; c <- 0 until 2)
      assert(sampleAt(rs.payload, f, c, 2) ==
        (if (c == 0) 100 * (2 * f) else -100 * (2 * f)),
        s"frame $f ch $c")
    // the re-encoded output is itself a decodable WAV (round-trip)
    val back = WavCodec.decode(1L, rs.payload)
    assert(back.ok && back.width == 2 && back.n_frames == 4)
    // channel re-map: stereo -> mono keeps channel 0
    val mono = WavCodec.resize(1L, wav, 1, 8)
    assert(mono.ok && (0 until 8).forall(f =>
      sampleAt(mono.payload, f, 0, 1) == 100 * f))
    // Int-overflow targets are not-ok, never a wrong-size buffer
    assert(!WavCodec.resize(1L, wav, 1 << 16, 1 << 16).ok)
  }

  // ---- AviCodec: the video leg of the seam ------------------------------

  /** 2-frame 3x2 DIB video (w=3 exercises the padded row stride 12=
    * 3·3+3): pixel (x,y,frame f) carries BGR (x, y, f)·10+base. */
  private def aviOf(frames: Int, w: Int = 3, h: Int = 2): Array[Byte] = {
    val stride = AviCodec.rowStride(w)
    val fs = (0 until frames).map { f =>
      val r = new Array[Byte](stride * h)
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
        r(y * stride + x * 3 + c) = (f * 100 + y * 30 + x * 10 + c).toByte
      r
    }
    AviCodec.encode(w, h, 40000, fs)
  }

  test("AviCodec.decode really walks the RIFF tree; garbage/torn files are not-ok") {
    val avi = aviOf(4)
    val m = AviCodec.decode(1L, avi)
    assert(m.ok && m.width == 3 && m.height == 2 && m.n_frames == 4,
      "parsed geometry + REAL multi-frame count")
    assert(!AviCodec.decode(1L, "RIFFxxxxWAVE".getBytes).ok, "wrong form type")
    assert(!AviCodec.decode(1L, avi.dropRight(5)).ok, "torn frame chunk")
    // frame chunk length inconsistent with the DIB stride formula
    val bad = avi.clone()
    val firstDb = {
      var i = 0
      while (!(bad(i) == '0' && bad(i + 1) == '0' && bad(i + 2) == 'd')) i += 1
      i
    }
    bad(firstDb + 4) = (bad(firstDb + 4) - 1).toByte
    assert(!AviCodec.decode(1L, bad).ok, "bad frame length must reject")
  }

  test("AviCodec.resize resamples every frame (pixel-exact NN), round-trips") {
    val avi = aviOf(2, w = 4, h = 4)
    val rs = AviCodec.resize(1L, avi, 2, 2)
    assert(rs.ok && rs.width == 2 && rs.height == 2)
    val back = AviCodec.decode(1L, rs.payload)
    assert(back.ok && back.width == 2 && back.height == 2 && back.n_frames == 2,
      "re-encoded output is itself a decodable AVI")
    // NN mapping: dst (x,y) <- src (2x, 2y), per frame
    val Some((_, _, _, fs)) = AviCodec.parse(rs.payload)
    val stride = AviCodec.rowStride(2)
    for (((off, _), f) <- fs.zipWithIndex; y <- 0 until 2; x <- 0 until 2)
      assert((rs.payload(off + y * stride + x * 3) & 0xff) ==
        ((f * 100 + (2 * y) * 30 + (2 * x) * 10) & 0xff),
        s"frame $f pixel ($x,$y)")
    assert(!AviCodec.resize(1L, avi, 1 << 15, 1 << 15).ok,
      "overflow targets are not-ok")
  }

  test("AviCodec.embed and sampledRaster cover all/sampled frames exactly") {
    val avi = aviOf(5)
    assert(AviCodec.embed(1L, avi, 16).sum == 5f * 3 * 2,
      "one histogram hit per pixel per frame")
    val sampled = AviCodec.sampledRaster(avi, stride = 2)
    val frameLen = AviCodec.rowStride(3) * 2
    assert(sampled.length == 3 * frameLen, "frames 0, 2, 4 picked")
    // sampled bytes are the picked frames' rasters verbatim
    val Some((_, _, _, fs)) = AviCodec.parse(avi)
    for ((k, fi) <- Seq(0, 2, 4).zipWithIndex; j <- 0 until frameLen)
      assert(sampled(fi * frameLen + j) == avi(fs(k)._1 + j))
    assert(AviCodec.sampledRaster("junk".getBytes, 2).isEmpty)
  }

  test("WavCodec.embed is an exact amplitude histogram over decoded samples") {
    val wav = wavOf(16)
    val hist = WavCodec.embed(1L, wav, 8)
    assert(hist.sum == 32f, "every sample lands in exactly one bucket")
    // extreme samples land in the extreme buckets
    val extremes = WavCodec.encode(1, 8000,
      Array[Byte](0x00, 0x80.toByte, 0xff.toByte, 0x7f)) // -32768, 32767
    val eh = WavCodec.embed(1L, extremes, 8)
    assert(eh(0) == 1f && eh(7) == 1f)
    assert(WavCodec.embed(1L, Array[Byte](1, 2, 3), 8).sum == 0f)
  }
}

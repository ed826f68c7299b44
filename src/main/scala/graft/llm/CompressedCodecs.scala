package graft.llm

/** REAL codecs for genuinely COMPRESSED audio/video formats, in pure
  * JVM code — the in-environment answer to the "compressed formats
  * need an external library" seam note in [[MediaCodec]]. External
  * libraries are still the route for MP3/AAC/H.264, but three real
  * compressed codecs ARE implementable on the JDK alone, and each
  * enters through the exact same [[MediaCodec]] trait as the
  * uncompressed family:
  *
  *  - [[MuLawCodec]] — ITU-T G.711 μ-law: logarithmic companding,
  *    8 bits per sample standing in for 14 (2:1 vs 16-bit PCM storage).
  *    The expand step is stateless integer arithmetic, so the full
  *    decompress replays in DuckDB (q_llm_mm_mulaw hash-oracle).
  *  - [[AdpcmCodec]] — IMA/DVI ADPCM (WAV format tag 0x11): ADAPTIVE
  *    PREDICTIVE coding, 4 bits per sample (4:1). Decode is a
  *    per-block sequential state machine (predictor + step index);
  *    the oracle replays it with a DuckDB `list_reduce` carrying the
  *    state in the accumulator (q_llm_mm_adpcm).
  *  - [[MjpegCodec]] — Motion-JPEG AVI: every frame is a real
  *    DCT+Huffman JPEG, decoded by the JDK's own ImageIO JPEG reader
  *    (java.desktop — no external dependency). Lossy, so the oracle
  *    takes the q_approx_distinct tolerance stance: the in-plan check
  *    binds decoded frame means to the expected solid colors within a
  *    measured ±3 (JDK round-trip error on 16×16 solids measures ≤1),
  *    and the hash pins the SQL-replayable expectation
  *    (q_llm_mm_mjpeg).
  *
  * Geometry mapping for the audio codecs follows [[WavCodec]]:
  * width = channels, height = sample rate, n_frames = sample frames;
  * resize(targetChannels, targetFrames) time-resamples and — being
  * DECODERS — emits uncompressed 16-bit PCM (the transcode a real
  * pipeline runs before feature extraction), itself a valid
  * [[WavCodec]]-decodable WAV.
  *
  * Reference context: the reference pipeline stores opaque payloads
  * and never decodes media (storage/certdb.go handles DER blobs);
  * this family is part of the beyond-reference LLM-pipeline surface.
  */
object MuLawCodec extends MediaCodec {

  /** G.711 μ-law expand: 8-bit code → 16-bit linear PCM. Standard
    * bias-0x84 segment expansion; ~u = 255-u for u ∈ [0,255]. */
  def expand(code: Int): Int = {
    val u = ~code & 0xff
    val exp = (u >> 4) & 7
    val mant = u & 0x0f
    val x = (((mant << 3) + 0x84) << exp) - 0x84
    if ((u & 0x80) != 0) -x else x
  }

  /** G.711 μ-law compress: 16-bit linear PCM → 8-bit code. Identity
    * `compress(expand(u)) == u` holds for every code except 0x7F (the
    * negative-zero code: expand(0x7F) = -0 = +0 re-encodes as 0xFF) —
    * pinned by CompressedCodecSpec. */
  def compress(pcm: Int): Int = {
    val Bias = 0x84; val Clip = 32635
    var p = pcm; var sign = 0
    if (p < 0) { p = -p; sign = 0x80 }
    if (p > Clip) p = Clip
    p += Bias
    var exp = 7; var mask = 0x4000
    while (exp > 0 && (p & mask) == 0) { exp -= 1; mask >>= 1 }
    val mant = (p >> (exp + 3)) & 0x0f
    ~(sign | (exp << 4) | mant) & 0xff
  }

  /** (channels, sampleRate, dataOffset, dataLen) for format-tag-7
    * (μ-law) RIFF/WAVE: 8 bits per sample, blockAlign = channels.
    * Same chunk-walk contract as [[WavCodec.parseHeader]]. */
  private[llm] def parseHeader(b: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    def u16(i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    def u32(i: Int): Long = u16(i).toLong | (u16(i + 2).toLong << 16)
    def tag(i: Int): String = new String(b, i, 4, "US-ASCII")
    if (b.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var i = 12
    var fmt: Option[(Int, Int)] = None
    var data: Option[(Int, Int)] = None
    while (i + 8 <= b.length && (fmt.isEmpty || data.isEmpty)) {
      val id = tag(i); val len = u32(i + 4)
      if (len < 0 || len > b.length - i - 8) return None
      val body = i + 8
      if (id == "fmt ") {
        if (len < 16) return None
        val audioFormat = u16(body); val ch = u16(body + 2)
        val rate = u32(body + 4); val blockAlign = u16(body + 12)
        val bits = u16(body + 14)
        if (audioFormat != 7 || bits != 8 || ch < 1 || ch > 64 ||
          rate <= 0 || rate > Int.MaxValue || blockAlign != ch) return None
        fmt = Some((ch, rate.toInt))
      } else if (id == "data") data = Some((body, len.toInt))
      i = body + len.toInt + (len.toInt & 1)
    }
    for ((ch, rate) <- fmt; (off, dl) <- data if dl % ch == 0)
      yield (ch, rate, off, dl)
  }

  /** Canonical 44-byte-header μ-law encode (format tag 7, 8-bit). */
  private[llm] def encode(channels: Int, rate: Int,
      codes: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](44 + codes.length)
    def put(i: Int, s: String): Unit =
      System.arraycopy(s.getBytes("US-ASCII"), 0, out, i, 4)
    def p16(i: Int, v: Int): Unit = {
      out(i) = (v & 0xff).toByte; out(i + 1) = ((v >> 8) & 0xff).toByte
    }
    def p32(i: Int, v: Long): Unit = {
      p16(i, (v & 0xffff).toInt); p16(i + 2, ((v >> 16) & 0xffff).toInt)
    }
    put(0, "RIFF"); p32(4, 36L + codes.length); put(8, "WAVE")
    put(12, "fmt "); p32(16, 16L); p16(20, 7); p16(22, channels)
    p32(24, rate.toLong); p32(28, rate.toLong * channels)
    p16(32, channels); p16(34, 8)
    put(36, "data"); p32(40, codes.length.toLong)
    System.arraycopy(codes, 0, out, 44, codes.length)
    out
  }

  def decode(mediaId: Long, payload: Array[Byte]): Multimodal.DecodedMeta =
    parseHeader(payload) match {
      case Some((ch, rate, _, dl)) =>
        Multimodal.DecodedMeta(mediaId, ch, rate, dl / ch, ok = true)
      case None => Multimodal.DecodedMeta(mediaId, 0, 0, 0, ok = false)
    }

  /** Decompress + time-resample: nearest-neighbor on the frame axis
    * (the [[WavCodec.resize]] mapping), output EXPANDED 16-bit PCM —
    * the compressed family's resize is a transcode, so the result is
    * a valid PCM WAV ([[WavCodec]] round-trip pinned in spec). */
  def resize(mediaId: Long, payload: Array[Byte], targetW: Int,
      targetH: Int): Multimodal.ResizedMeta =
    parseHeader(payload) match {
      case Some((ch, rate, off, dl))
          // targetW ≤ 64: the output contract is "a WavCodec-decodable
          // PCM WAV", and WavCodec.parseHeader rejects channels > 64 —
          // an ok=true transcode must stay inside the family's own
          // decode envelope
          if targetW > 0 && targetW <= 64 && targetH > 0 && dl > 0 &&
            targetW.toLong * targetH * 2 <= Int.MaxValue =>
        val srcFrames = dl / ch
        val out = new Array[Byte](targetW * targetH * 2)
        var k = 0; var f = 0
        while (f < targetH) {
          val sf = (f.toLong * srcFrames / targetH).toInt
          var c = 0
          while (c < targetW) {
            val sc = (c.toLong * ch / targetW).toInt
            val v = expand(payload(off + sf * ch + sc) & 0xff)
            out(k) = (v & 0xff).toByte; out(k + 1) = ((v >> 8) & 0xff).toByte
            k += 2; c += 1
          }
          f += 1
        }
        Multimodal.ResizedMeta(mediaId, targetW, targetH,
          WavCodec.encode(targetW, rate, out), ok = true)
      case _ =>
        Multimodal.ResizedMeta(mediaId, 0, 0, Array.emptyByteArray, ok = false)
    }

  def embed(mediaId: Long, payload: Array[Byte], dim: Int): Array[Float] =
    parseHeader(payload) match {
      case Some((_, _, off, dl)) =>
        val hist = new Array[Float](dim)
        var p = off
        while (p < off + dl) {
          hist((expand(payload(p) & 0xff) + 32768) * dim / 65536) += 1f
          p += 1
        }
        hist
      case None => new Array[Float](dim)
    }
}

/** IMA/DVI ADPCM (WAV format tag 0x11), MONO: adaptive differential
  * PCM at 4 bits per sample — real predictive compression with
  * decoder state (predictor + step index) threaded through each
  * block. Block layout per the IMA spec: 4-byte header (int16 LE
  * initial predictor — which IS the block's first output sample —
  * uint8 step index, reserved byte), then data bytes carrying two
  * nibbles each, LOW nibble first. `samplesPerBlock` rides the fmt
  * chunk's 2-byte extension and must equal
  * `(blockAlign - 4) * 2 + 1`; the data section must be whole blocks.
  * Mono-only is a validated contract (stereo interleaves 4-byte
  * channel words — out of scope for the oracle replay). */
object AdpcmCodec extends MediaCodec {

  private[llm] val StepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  private[llm] val IndexTable: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  /** One decoder step: (predictor, stepIndex, nibble) → (sample,
    * stepIndex'). The emitted sample is the new predictor. */
  def step(pred: Int, idx: Int, n: Int): (Int, Int) = {
    val st = StepTable(idx)
    var diff = st >> 3
    if ((n & 1) != 0) diff += st >> 2
    if ((n & 2) != 0) diff += st >> 1
    if ((n & 4) != 0) diff += st
    if ((n & 8) != 0) diff = -diff
    val p = math.max(-32768, math.min(32767, pred + diff))
    val i = math.max(0, math.min(88, idx + IndexTable(n & 7)))
    (p, i)
  }

  /** One encoder step: pick the nibble for `sample` given state, then
    * run the DECODER step on it (encoder and decoder must share the
    * reconstruction, or drift accumulates). */
  def encodeStep(pred: Int, idx: Int, sample: Int): (Int, Int, Int) = {
    val st = StepTable(idx)
    var diff = sample - pred
    var n = 0
    if (diff < 0) { n = 8; diff = -diff }
    if (diff >= st) { n |= 4; diff -= st }
    if (diff >= (st >> 1)) { n |= 2; diff -= st >> 1 }
    if (diff >= (st >> 2)) n |= 1
    val (p, i) = step(pred, idx, n)
    (n, p, i)
  }

  /** (sampleRate, blockAlign, samplesPerBlock, dataOffset, dataLen)
    * for a valid mono IMA ADPCM WAV. */
  private[llm] def parseHeader(b: Array[Byte]): Option[(Int, Int, Int, Int, Int)] = {
    def u16(i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    def u32(i: Int): Long = u16(i).toLong | (u16(i + 2).toLong << 16)
    def tag(i: Int): String = new String(b, i, 4, "US-ASCII")
    if (b.length < 48 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var i = 12
    var fmt: Option[(Int, Int, Int)] = None // (rate, blockAlign, samplesPerBlock)
    var data: Option[(Int, Int)] = None
    while (i + 8 <= b.length && (fmt.isEmpty || data.isEmpty)) {
      val id = tag(i); val len = u32(i + 4)
      if (len < 0 || len > b.length - i - 8) return None
      val body = i + 8
      if (id == "fmt ") {
        if (len < 20) return None
        val audioFormat = u16(body); val ch = u16(body + 2)
        val rate = u32(body + 4); val blockAlign = u16(body + 12)
        val bits = u16(body + 14); val cbSize = u16(body + 16)
        val spb = u16(body + 18)
        if (audioFormat != 0x11 || bits != 4 || ch != 1 || cbSize < 2 ||
          rate <= 0 || rate > Int.MaxValue || blockAlign < 5 ||
          spb != (blockAlign - 4) * 2 + 1) return None
        fmt = Some((rate.toInt, blockAlign, spb))
      } else if (id == "data") data = Some((body, len.toInt))
      i = body + len.toInt + (len.toInt & 1)
    }
    for ((rate, ba, spb) <- fmt; (off, dl) <- data
      if dl > 0 && dl % ba == 0)
      yield (rate, ba, spb, off, dl)
  }

  /** Decode the whole data section to linear PCM samples. */
  private[llm] def decodeSamples(b: Array[Byte], blockAlign: Int,
      off: Int, dataLen: Int): Array[Int] = {
    val spb = (blockAlign - 4) * 2 + 1
    val nBlocks = dataLen / blockAlign
    val out = new Array[Int](nBlocks * spb)
    var k = 0; var blk = 0
    while (blk < nBlocks) {
      val base = off + blk * blockAlign
      var pred = ((b(base) & 0xff) | (b(base + 1) << 8)) // sign-extends
      var idx = math.max(0, math.min(88, b(base + 2) & 0xff))
      out(k) = pred; k += 1
      var j = base + 4
      while (j < base + blockAlign) {
        val byte = b(j) & 0xff
        val (p1, i1) = step(pred, idx, byte & 0x0f)
        out(k) = p1; k += 1
        val (p2, i2) = step(p1, i1, byte >> 4)
        out(k) = p2; k += 1
        pred = p2; idx = i2
        j += 1
      }
      blk += 1
    }
    out
  }

  /** Canonical mono IMA ADPCM encode from raw block parts — header
    * state + nibble data verbatim (the query builds nibbles from text
    * bytes; the lossy [[encodeStep]] path is spec-exercised). All
    * blocks share one blockAlign. */
  private[llm] def encodeRaw(rate: Int, blockAlign: Int,
      blocks: Seq[(Int, Int, Array[Byte])]): Array[Byte] = {
    require(blocks.forall(_._3.length == blockAlign - 4), "block data size")
    val spb = (blockAlign - 4) * 2 + 1
    val dataLen = blocks.length * blockAlign
    val out = new Array[Byte](48 + 8 + dataLen)
    def put(i: Int, s: String): Unit =
      System.arraycopy(s.getBytes("US-ASCII"), 0, out, i, 4)
    def p16(i: Int, v: Int): Unit = {
      out(i) = (v & 0xff).toByte; out(i + 1) = ((v >> 8) & 0xff).toByte
    }
    def p32(i: Int, v: Long): Unit = {
      p16(i, (v & 0xffff).toInt); p16(i + 2, ((v >> 16) & 0xffff).toInt)
    }
    put(0, "RIFF"); p32(4, (out.length - 8).toLong); put(8, "WAVE")
    put(12, "fmt "); p32(16, 20L); p16(20, 0x11); p16(22, 1)
    p32(24, rate.toLong)
    p32(28, rate.toLong * blockAlign / spb) // avg bytes/sec, informational
    p16(32, blockAlign); p16(34, 4); p16(36, 2); p16(38, spb)
    put(40, "data"); p32(44, dataLen.toLong)
    var o = 48
    blocks.foreach { case (pred, idx, data) =>
      p16(o, pred & 0xffff); out(o + 2) = (idx & 0xff).toByte
      out(o + 3) = 0
      System.arraycopy(data, 0, out, o + 4, data.length)
      o += blockAlign
    }
    out
  }

  /** Lossy compress: PCM samples → mono ADPCM blocks (step index
    * threaded across blocks, per-block predictor = first sample, the
    * standard encoder layout). Pads the tail block by repeating the
    * last sample. */
  private[llm] def compress(rate: Int, blockAlign: Int,
      samples: Array[Int]): Array[Byte] = {
    val spb = (blockAlign - 4) * 2 + 1
    require(samples.nonEmpty, "empty input")
    val nBlocks = (samples.length + spb - 1) / spb
    var idx = 0
    val blocks = (0 until nBlocks).map { blk =>
      def at(k: Int): Int =
        samples(math.min(blk * spb + k, samples.length - 1))
      var pred = at(0)
      val pred0 = pred; val idx0 = idx
      val data = new Array[Byte](blockAlign - 4)
      var j = 0
      while (j < data.length) {
        val (n1, p1, i1) = encodeStep(pred, idx, at(1 + 2 * j))
        val (n2, p2, i2) = encodeStep(p1, i1, at(2 + 2 * j))
        data(j) = ((n2 << 4) | n1).toByte
        pred = p2; idx = i2
        j += 1
      }
      (pred0, idx0, data)
    }
    encodeRaw(rate, blockAlign, blocks)
  }

  def decode(mediaId: Long, payload: Array[Byte]): Multimodal.DecodedMeta =
    parseHeader(payload) match {
      case Some((rate, ba, spb, _, dl)) =>
        Multimodal.DecodedMeta(mediaId, 1, rate, dl / ba * spb, ok = true)
      case None => Multimodal.DecodedMeta(mediaId, 0, 0, 0, ok = false)
    }

  /** Decompress + time-resample to PCM16 (the transcode stance of
    * [[MuLawCodec.resize]]; targetW must be 1 — the codec is mono). */
  def resize(mediaId: Long, payload: Array[Byte], targetW: Int,
      targetH: Int): Multimodal.ResizedMeta =
    parseHeader(payload) match {
      case Some((rate, ba, _, off, dl))
          if targetW == 1 && targetH > 0 && targetH.toLong * 2 <= Int.MaxValue =>
        val samples = decodeSamples(payload, ba, off, dl)
        val out = new Array[Byte](targetH * 2)
        var f = 0
        while (f < targetH) {
          val v = samples((f.toLong * samples.length / targetH).toInt)
          out(2 * f) = (v & 0xff).toByte
          out(2 * f + 1) = ((v >> 8) & 0xff).toByte
          f += 1
        }
        Multimodal.ResizedMeta(mediaId, 1, targetH,
          WavCodec.encode(1, rate, out), ok = true)
      case _ =>
        Multimodal.ResizedMeta(mediaId, 0, 0, Array.emptyByteArray, ok = false)
    }

  def embed(mediaId: Long, payload: Array[Byte], dim: Int): Array[Float] =
    parseHeader(payload) match {
      case Some((_, ba, _, off, dl)) =>
        val hist = new Array[Float](dim)
        decodeSamples(payload, ba, off, dl)
          .foreach(v => hist((v + 32768) * dim / 65536) += 1f)
        hist
      case None => new Array[Float](dim)
    }
}

/** Motion-JPEG AVI: the video leg's COMPRESSED codec. Container =
  * the same RIFF/AVI tree as [[AviCodec]] but with 'MJPG' streams
  * whose '00dc' chunks each hold one complete baseline JPEG
  * (DCT + Huffman — real lossy compression), decoded by the JDK's
  * ImageIO JPEG reader. Parse validates every frame chunk starts
  * with SOI (FFD8) and ends with EOI (FFD9); geometry comes from
  * avih and is cross-checked against the first frame's REAL decoded
  * dimensions in [[decode]]. Availability gates on
  * [[ImageIoCodec.available]] (java.desktop). */
object MjpegCodec extends MediaCodec {

  /** (width, height, usPerFrame, frame (offset, len) list). */
  private[llm] def parse(b: Array[Byte]): Option[(Int, Int, Int, List[(Int, Int)])] = {
    def u16(i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    def u32(i: Int): Long = u16(i).toLong | (u16(i + 2).toLong << 16)
    def tag(i: Int): String = new String(b, i, 4, "US-ASCII")
    if (b.length < 24 || tag(0) != "RIFF" || tag(8) != "AVI ") return None
    var w = 0; var h = 0; var usPerFrame = 0; var declaredFrames = -1L
    val frames = List.newBuilder[(Int, Int)]
    var nFrames = 0
    def walk(from: Int, to: Int, inMovi: Boolean): Boolean = {
      var i = from
      while (i + 8 <= to) {
        val id = tag(i); val len = u32(i + 4)
        if (len < 0 || len > to - i - 8) return false
        val body = i + 8
        if (id == "LIST") {
          if (len < 4) return false
          val form = tag(body)
          if (form == "hdrl" || form == "movi")
            if (!walk(body + 4, body + len.toInt, form == "movi")) return false
        } else if (id == "avih") {
          if (len < 56) return false
          usPerFrame = u32(body).toInt
          declaredFrames = u32(body + 16)
          w = u32(body + 32).toInt; h = u32(body + 36).toInt
        } else if (inMovi && id == "00dc") {
          // each frame must be a complete JPEG: SOI ... EOI
          val l = len.toInt
          if (l < 4 || (b(body) & 0xff) != 0xff || (b(body + 1) & 0xff) != 0xd8 ||
            (b(body + l - 2) & 0xff) != 0xff || (b(body + l - 1) & 0xff) != 0xd9)
            return false
          frames += ((body, l)); nFrames += 1
        }
        i = body + len.toInt + (len.toInt & 1)
      }
      true
    }
    if (!walk(12, b.length, inMovi = false)) return None
    val fs = frames.result()
    if (w <= 0 || h <= 0 || w > (1 << 15) || h > (1 << 15) ||
      declaredFrames != nFrames.toLong || nFrames == 0) None
    else Some((w, h, usPerFrame, fs))
  }

  // ImageIO reader/writer instances are NOT thread-safe but ARE
  // reusable: per-frame ImageIO.read/getImageWriters... pays plugin
  // lookup + context allocation on every 16x16 frame, which dominates
  // the codec cost at corpus scale. One instance per executor thread
  // (Spark reuses task threads) is the object-codec analog of the
  // seam's open()-per-partition contract. Marked transient-safe by
  // construction: ThreadLocal re-initializes per JVM.
  private val readerTl =
    new ThreadLocal[javax.imageio.ImageReader] {
      override def initialValue(): javax.imageio.ImageReader =
        javax.imageio.ImageIO.getImageReadersByFormatName("jpeg").next()
    }
  private val writerTl =
    new ThreadLocal[javax.imageio.ImageWriter] {
      override def initialValue(): javax.imageio.ImageWriter =
        javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    }

  /** ImageIO read counter — test instrumentation ONLY: the
    * decode-skip contract (unsampled frames never enter ImageIO —
    * [[sampledFrameMeans]] walks '00dc' chunk offsets from [[parse]]
    * and DCTs only the stride hits) is pinned by counting real reads,
    * not by inferring from outputs. */
  private[llm] val jpegReads = new java.util.concurrent.atomic.AtomicLong

  private def readJpeg(b: Array[Byte], off: Int,
      len: Int): Option[java.awt.image.BufferedImage] =
    try {
      jpegReads.incrementAndGet()
      val r = readerTl.get()
      val mis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(b, off, len))
      try {
        r.setInput(mis, true, true)
        Option(r.read(0))
      } finally { r.setInput(null); mis.close() }
    } catch { case _: java.io.IOException | _: RuntimeException => None }

  /** Deterministic JPEG encode at explicit quality (the JDK writer is
    * deterministic per (pixels, quality) — measured in spec). */
  private[llm] def encodeJpeg(img: java.awt.image.BufferedImage,
      quality: Float = 0.95f): Array[Byte] = {
    val w = writerTl.get()
    val p = w.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    val bos = new java.io.ByteArrayOutputStream()
    val mos = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      w.setOutput(mos)
      w.write(null, new javax.imageio.IIOImage(img, null, null), p)
    } finally { w.setOutput(null); mos.close() }
    bos.toByteArray
  }

  /** Canonical MJPG-AVI encode: same tree as [[AviCodec.encode]] with
    * 'MJPG' fourcc/biCompression and variable-length frame chunks
    * (RIFF even-padding applies per chunk). */
  private[llm] def encode(w: Int, h: Int, usPerFrame: Int,
      jpegFrames: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def put(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    def p16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def p32(v: Long): Unit = { p16((v & 0xffff).toInt); p16(((v >> 16) & 0xffff).toInt) }
    val hdrlLen = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
    val moviLen = 4 + jpegFrames.map(f => 8 + f.length + (f.length & 1)).sum
    val maxLen = jpegFrames.map(_.length).max
    put("RIFF"); p32(4L + (8 + hdrlLen) + (8 + moviLen)); put("AVI ")
    put("LIST"); p32(hdrlLen.toLong); put("hdrl")
    put("avih"); p32(56L)
    p32(usPerFrame.toLong); p32(maxLen.toLong * 1000000L / math.max(usPerFrame, 1))
    p32(0L); p32(0L); p32(jpegFrames.length.toLong); p32(0L); p32(1L)
    p32(maxLen.toLong); p32(w.toLong); p32(h.toLong)
    (0 until 4).foreach(_ => p32(0L))
    put("LIST"); p32(4L + (8 + 56) + (8 + 40)); put("strl")
    put("strh"); p32(56L)
    put("vids"); put("MJPG"); p32(0L); p16(0); p16(0); p32(0L)
    p32(usPerFrame.toLong); p32(1000000L)
    p32(0L); p32(jpegFrames.length.toLong); p32(maxLen.toLong); p32(0L); p32(0L)
    p16(0); p16(0); p16(w); p16(h)
    put("strf"); p32(40L)
    p32(40L); p32(w.toLong); p32(h.toLong); p16(1); p16(24)
    put("MJPG"); p32(w.toLong * h * 3); p32(0L); p32(0L); p32(0L); p32(0L)
    put("LIST"); p32(moviLen.toLong); put("movi")
    jpegFrames.foreach { f =>
      put("00dc"); p32(f.length.toLong); bos.write(f)
      if ((f.length & 1) == 1) bos.write(0) // RIFF even padding
    }
    bos.toByteArray
  }

  /** Container parse + REAL first-frame JPEG decode: ok only when the
    * avih geometry matches the actually-decoded frame dimensions. */
  def decode(mediaId: Long, payload: Array[Byte]): Multimodal.DecodedMeta =
    parse(payload) match {
      case Some((w, h, _, fs)) =>
        readJpeg(payload, fs.head._1, fs.head._2) match {
          case Some(img) if img.getWidth == w && img.getHeight == h =>
            Multimodal.DecodedMeta(mediaId, w, h, fs.length, ok = true)
          case _ => Multimodal.DecodedMeta(mediaId, 0, 0, 0, ok = false)
        }
      case None => Multimodal.DecodedMeta(mediaId, 0, 0, 0, ok = false)
    }

  /** Decode every frame, nearest-neighbor resample (the family
    * mapping), re-encode MJPG. */
  def resize(mediaId: Long, payload: Array[Byte], targetW: Int,
      targetH: Int): Multimodal.ResizedMeta =
    parse(payload) match {
      case Some((w, h, us, fs))
          if targetW > 0 && targetH > 0 &&
            targetW.toLong * targetH * 4 * fs.length <= Int.MaxValue =>
        val outFrames = fs.map { case (off, len) =>
          readJpeg(payload, off, len).map { img =>
            val out = new java.awt.image.BufferedImage(targetW, targetH,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < targetH) {
              val sy = (y.toLong * img.getHeight / targetH).toInt
              var x = 0
              while (x < targetW) {
                val sx = (x.toLong * img.getWidth / targetW).toInt
                out.setRGB(x, y, img.getRGB(sx, sy))
                x += 1
              }
              y += 1
            }
            encodeJpeg(out)
          }
        }
        if (outFrames.exists(_.isEmpty))
          Multimodal.ResizedMeta(mediaId, 0, 0, Array.emptyByteArray, ok = false)
        else Multimodal.ResizedMeta(mediaId, targetW, targetH,
          encode(targetW, targetH, us, outFrames.map(_.get)), ok = true)
      case _ =>
        Multimodal.ResizedMeta(mediaId, 0, 0, Array.emptyByteArray, ok = false)
    }

  /** Rec.709 luminance histogram over ALL frames' REALLY-decoded
    * pixels (the [[AviCodec.embed]] shape, through a lossy decode). */
  def embed(mediaId: Long, payload: Array[Byte], dim: Int): Array[Float] =
    parse(payload) match {
      case Some((_, _, _, fs)) =>
        val hist = new Array[Float](dim)
        fs.foreach { case (off, len) =>
          readJpeg(payload, off, len).foreach { img =>
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                val rgb = img.getRGB(x, y)
                val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff
                val b = rgb & 0xff
                hist(((2126 * r + 7152 * g + 722 * b) / 10000) * dim / 256) += 1f
                x += 1
              }
              y += 1
            }
          }
        }
        hist
      case None => new Array[Float](dim)
    }

  /** Frame sampling through the REAL lossy decode: for every
    * `stride`-th frame, the decoded per-channel pixel means (integer
    * floor division). The query layer binds these to expected values
    * within a tolerance — the lossy codec's analog of
    * [[AviCodec.sampledRaster]]. */
  def sampledFrameMeans(payload: Array[Byte],
      stride: Int): Seq[(Int, Int, Int, Int)] =
    parse(payload) match {
      case Some((_, _, _, fs)) =>
        fs.zipWithIndex.collect {
          case ((off, len), i) if i % stride == 0 =>
            readJpeg(payload, off, len) match {
              case Some(img) =>
                var sr = 0L; var sg = 0L; var sb = 0L
                var y = 0
                while (y < img.getHeight) {
                  var x = 0
                  while (x < img.getWidth) {
                    val rgb = img.getRGB(x, y)
                    sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff
                    sb += rgb & 0xff
                    x += 1
                  }
                  y += 1
                }
                val n = img.getWidth.toLong * img.getHeight
                (i, (sr / n).toInt, (sg / n).toInt, (sb / n).toInt)
              case None => (i, -1, -1, -1)
            }
        }
      case None => Seq.empty
    }
}

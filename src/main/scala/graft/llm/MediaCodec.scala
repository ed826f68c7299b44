package graft.llm

/** Pluggable codec seam for the multimodal pipeline ([[Multimodal]]).
  *
  * The Spark-side plumbing — media schema, per-partition batch
  * execution, metadata extraction, frame-sample arithmetic — is real
  * and oracle'd; the codec itself is this trait. The default
  * [[StubMediaCodec]] is the documented deterministic fake (this
  * container has no media libraries); a real deployment drops in a
  * javacv/ffmpeg-backed implementation without touching any of the
  * oracle'd plumbing:
  *
  * {{{
  * object JavacvCodec extends MediaCodec {
  *   @transient private var grabber: FFmpegFrameGrabber = _
  *   override def open(): Unit = { /* allocate codec contexts once */ }
  *   def decode(id, bytes) = { /* grabber.start(); read dims/frames */ }
  *   def resize(id, bytes, w, h) = { /* swscale + re-encode */ }
  *   def embed(id, bytes, dim) = { /* decoded frame -> encoder */ }
  *   override def close(): Unit = { /* release contexts */ }
  * }
  * Multimodal.decodeWith(media, JavacvCodec)
  * }}}
  *
  * Implementations MUST be deterministic per payload (the dedup /
  * fingerprint layers above assume content-determinism) and
  * serializable (the instance ships to executors; heavy native
  * contexts belong in [[open]], marked `@transient`, one per
  * partition — not in the constructor, which runs on the driver).
  */
trait MediaCodec extends Serializable {

  /** Per-partition context init: called once before a partition's
    * rows (codec contexts, model weights). */
  def open(): Unit = ()

  /** Per-partition teardown, called on task completion. */
  def close(): Unit = ()

  /** Decode one payload to frame geometry. Empty/null payloads never
    * reach this (the plumbing short-circuits them to the not-ok row). */
  def decode(mediaId: Long, payload: Array[Byte]): Multimodal.DecodedMeta

  /** Scale one payload to (targetW, targetH) and re-encode. */
  def resize(mediaId: Long, payload: Array[Byte], targetW: Int,
      targetH: Int): Multimodal.ResizedMeta

  /** Embed one payload as a `dim`-length feature vector (normalization
    * is the caller's concern — [[Multimodal.embedWith]] unit-norms). */
  def embed(mediaId: Long, payload: Array[Byte], dim: Int): Array[Float]
}

/** A REAL codec for the uncompressed netpbm formats — binary PPM (P6,
  * RGB) and PGM (P5, grayscale) — in pure JVM code (no media
  * libraries needed, so it runs in this container):
  *
  *  - [[decode]] parses the netpbm header for real: magic, arbitrary
  *    whitespace, `#` comments, width/height/maxval tokens, the single
  *    whitespace byte before the raster, and validates the raster
  *    length against the declared geometry;
  *  - [[resize]] is a real nearest-neighbor resample
  *    (`src = floor(dst · srcDim / dstDim)`, the classic integer
  *    mapping) re-encoded byte-exactly as `P6\nW H\nMV\n` + raster;
  *  - [[embed]] is a `dim`-bucket luminance histogram (Rec.709
  *    integer weights 2126/7152/722 over 10000) — a real, if crude,
  *    visual feature.
  *
  * Everything is integer arithmetic, so q_llm_mm_ppm can replay
  * decode + resample + re-encode in DuckDB and hash-match the resized
  * bytes — the multimodal path's first REAL codec with a cross-engine
  * oracle. Compressed formats (JPEG/PNG/video) still need an external
  * codec via the same seam. */
object PpmCodec extends MediaCodec {

  /** (isColor, width, height, maxval, rasterOffset), or None when the
    * bytes are not a valid binary netpbm image. */
  private[llm] def parseHeader(b: Array[Byte]): Option[(Boolean, Int, Int, Int, Int)] = {
    var i = 0
    def isWs(c: Byte) = c == ' ' || c == '\t' || c == '\n' || c == '\r' ||
      c == 0x0b || c == 0x0c
    def skipWs(): Unit = {
      var going = true
      while (going && i < b.length) {
        if (b(i) == '#') { while (i < b.length && b(i) != '\n') i += 1 }
        else if (isWs(b(i))) i += 1
        else going = false
      }
    }
    def token(): String = {
      skipWs(); val s = i
      while (i < b.length && !isWs(b(i)) && b(i) != '#') i += 1
      new String(b, s, i - s, "US-ASCII")
    }
    val magic = token()
    if (magic != "P6" && magic != "P5") return None
    try {
      val w = token().toInt; val h = token().toInt; val mv = token().toInt
      // exactly one whitespace byte separates maxval from the raster
      if (i >= b.length || !isWs(b(i))) return None
      i += 1
      if (w <= 0 || h <= 0 || mv <= 0 || mv > 255) None
      else Some((magic == "P6", w, h, mv, i))
    } catch { case _: NumberFormatException => None }
  }

  private def rasterLen(color: Boolean, w: Int, h: Int): Long =
    w.toLong * h * (if (color) 3 else 1)

  def decode(mediaId: Long, payload: Array[Byte]): Multimodal.DecodedMeta =
    parseHeader(payload) match {
      case Some((color, w, h, _, off))
          if payload.length - off == rasterLen(color, w, h) =>
        Multimodal.DecodedMeta(mediaId, w, h, 1, ok = true)
      case _ => Multimodal.DecodedMeta(mediaId, 0, 0, 0, ok = false)
    }

  def resize(mediaId: Long, payload: Array[Byte], targetW: Int,
      targetH: Int): Multimodal.ResizedMeta =
    parseHeader(payload) match {
      case Some((color, w, h, mv, off))
          if targetW > 0 && targetH > 0 &&
            // Int-overflow guard: a 50000x50000 RGB target is ~7.5e9
            // bytes — targetW*targetH*ch wraps negative (or to a small
            // wrong size) in Int. Oversize targets are not-ok, not OOM.
            targetW.toLong * targetH * (if (color) 3 else 1) <= Int.MaxValue &&
            payload.length - off == rasterLen(color, w, h) =>
        val ch = if (color) 3 else 1
        val out = new Array[Byte](targetW * targetH * ch)
        var k = 0; var y = 0
        while (y < targetH) {
          // Long intermediates: y*h (and x*w) overflow Int when both
          // the target and source dimensions are large.
          val sy = (y.toLong * h / targetH).toInt
          var x = 0
          while (x < targetW) {
            val sx = (x.toLong * w / targetW).toInt
            val src = off + (sy * w + sx) * ch
            var c = 0
            while (c < ch) { out(k) = payload(src + c); k += 1; c += 1 }
            x += 1
          }
          y += 1
        }
        val header = s"${if (color) "P6" else "P5"}\n$targetW $targetH\n$mv\n"
          .getBytes("US-ASCII")
        Multimodal.ResizedMeta(mediaId, targetW, targetH, header ++ out, ok = true)
      case _ =>
        Multimodal.ResizedMeta(mediaId, 0, 0, Array.emptyByteArray, ok = false)
    }

  def embed(mediaId: Long, payload: Array[Byte], dim: Int): Array[Float] =
    parseHeader(payload) match {
      case Some((color, w, h, _, off))
          if payload.length - off == rasterLen(color, w, h) =>
        val hist = new Array[Float](dim)
        var p = off
        while (p < payload.length) {
          val lum =
            if (color) {
              val r = payload(p) & 0xff; val g = payload(p + 1) & 0xff
              val b = payload(p + 2) & 0xff
              p += 3
              (2126 * r + 7152 * g + 722 * b) / 10000
            } else { val v = payload(p) & 0xff; p += 1; v }
          hist(lum * dim / 256) += 1f
        }
        hist
      case _ => new Array[Float](dim)
    }
}

/** A real COMPRESSED-format codec backed by the JDK's own
  * `javax.imageio` (the PNG/BMP/GIF/JPEG readers ship with the
  * `java.desktop` module — zero external dependencies): the proof
  * that MediaCodec.scala's documented drop-in recipe holds for an
  * actual compressed decode path, not just the uncompressed netpbm
  * one. Same contract as [[PpmCodec]]:
  *
  *  - [[decode]] really parses the container (PNG signature, IHDR,
  *    inflate — whatever `ImageIO.read` needs) and reports true frame
  *    geometry; undecodable bytes are the not-ok row, never a throw;
  *  - [[resize]] nearest-neighbor-resamples the decoded pixels with
  *    the same `src = floor(dst·srcDim/dstDim)` mapping as PpmCodec
  *    and re-encodes as PNG. The JDK PNG writer is
  *    deterministic-per-pixels (no timestamps/ancillary chunks —
  *    pinned by MultimodalSpec), which the dedup/fingerprint layers
  *    above require;
  *  - [[embed]] is the same Rec.709 integer luminance histogram as
  *    PpmCodec, over really-decoded pixels — so the two codecs embed
  *    IDENTICAL images identically whatever the container format
  *    (pinned: a PPM raster and its PNG re-encode agree).
  *
  * `ImageIO` holds static reader registries — nothing per-image lives
  * beyond the call, so the object is safely serializable and needs no
  * open()/close() context. Availability is probed via
  * [[ImageIoCodec.available]]; environments stripped of
  * `java.desktop` skip-gate (the reference's own optional-dependency
  * pattern, rediscache_test.go:16-28). */
object ImageIoCodec extends MediaCodec {

  /** True when a PNG reader is registered (i.e. java.desktop is
    * present and imageio initialized) — the spec's skip gate. */
  def available: Boolean =
    try javax.imageio.ImageIO.getImageReadersByFormatName("png").hasNext
    catch { case _: Throwable => false }

  private def read(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload)))
    catch { case _: java.io.IOException => None }

  def decode(mediaId: Long, payload: Array[Byte]): Multimodal.DecodedMeta =
    read(payload) match {
      case Some(img) =>
        Multimodal.DecodedMeta(mediaId, img.getWidth, img.getHeight, 1, ok = true)
      case None => Multimodal.DecodedMeta(mediaId, 0, 0, 0, ok = false)
    }

  def resize(mediaId: Long, payload: Array[Byte], targetW: Int,
      targetH: Int): Multimodal.ResizedMeta = {
    val notOk = Multimodal.ResizedMeta(mediaId, 0, 0, Array.emptyByteArray,
      ok = false)
    // same Int-overflow stance as PpmCodec: absurd targets are not-ok
    if (targetW <= 0 || targetH <= 0 ||
      targetW.toLong * targetH > Int.MaxValue / 4) notOk
    else read(payload) match {
      case Some(img) =>
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
        val bos = new java.io.ByteArrayOutputStream()
        if (!javax.imageio.ImageIO.write(out, "png", bos)) notOk
        else Multimodal.ResizedMeta(mediaId, targetW, targetH,
          bos.toByteArray, ok = true)
      case None => notOk
    }
  }

  def embed(mediaId: Long, payload: Array[Byte], dim: Int): Array[Float] =
    read(payload) match {
      case Some(img) =>
        val hist = new Array[Float](dim)
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff
            val b = rgb & 0xff
            val lum = (2126 * r + 7152 * g + 722 * b) / 10000
            hist(lum * dim / 256) += 1f
            x += 1
          }
          y += 1
        }
        hist
      case None => new Array[Float](dim)
    }
}

/** A REAL codec for RIFF/WAVE 16-bit PCM audio, in pure JVM code —
  * the audio leg of the multimodal surface, through the exact same
  * seam as the image codecs. The [[MediaCodec]] geometry fields are
  * image-named; for audio they carry the documented mapping
  *
  *   width = channels, height = sample rate (Hz), n_frames = sample
  *   frames; resize(targetW, targetH) = (target channels, target
  *   FRAME COUNT) — a nearest-neighbor resample on the time axis and
  *   a nearest-neighbor channel re-map, the 1-D analog of the image
  *   codecs' `src = floor(dst · srcDim / dstDim)`.
  *
  *  - [[decode]] walks the RIFF container for real: the RIFF/WAVE
  *    magic, the chunk list with LE sizes and even-byte padding
  *    (unknown chunks — LIST, fact, cue — are skipped, as a real
  *    parser must), the fmt fields (PCM format tag, channel count,
  *    rate, block align), and validates the data payload length
  *    against block alignment;
  *  - [[resize]] re-encodes byte-exactly as a canonical 44-byte
  *    header + resampled frames, so the output is itself a valid
  *    decodable WAV (pinned round-trip by MultimodalSpec);
  *  - [[embed]] is a `dim`-bucket amplitude histogram over the signed
  *    16-bit samples — the audio analog of the image codecs'
  *    luminance histogram, integer-exact.
  *
  * Everything is integer arithmetic, so q_llm_mm_wav replays the
  * parse + time-resample in DuckDB and sha256-matches the resampled
  * data section cross-engine (the q_llm_mm_ppm stance). Compressed
  * audio (MP3/AAC/FLAC) enters via the same trait with an external
  * library. */
object WavCodec extends MediaCodec {

  /** (channels, sampleRate, blockAlign, dataOffset, dataLen), or None
    * when the bytes are not valid 16-bit PCM RIFF/WAVE. */
  private[llm] def parseHeader(b: Array[Byte]): Option[(Int, Int, Int, Int, Int)] = {
    def u16(i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    def u32(i: Int): Long = (u16(i).toLong) | (u16(i + 2).toLong << 16)
    def tag(i: Int): String = new String(b, i, 4, "US-ASCII")
    if (b.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var i = 12
    var fmt: Option[(Int, Int, Int)] = None // (channels, rate, blockAlign)
    var data: Option[(Int, Int)] = None     // (offset, len)
    while (i + 8 <= b.length && (fmt.isEmpty || data.isEmpty)) {
      val id = tag(i); val len = u32(i + 4)
      if (len < 0 || len > b.length - i - 8) return None
      val body = i + 8
      if (id == "fmt ") {
        if (len < 16) return None
        val audioFormat = u16(body)
        val ch = u16(body + 2)
        val rate = u32(body + 4)
        val blockAlign = u16(body + 12)
        val bits = u16(body + 14)
        if (audioFormat != 1 || bits != 16 || ch < 1 || ch > 64 ||
          rate <= 0 || rate > Int.MaxValue || blockAlign != ch * 2) return None
        fmt = Some((ch, rate.toInt, blockAlign))
      } else if (id == "data") data = Some((body, len.toInt))
      i = body + len.toInt + (len.toInt & 1) // chunks pad to even length
    }
    for ((ch, rate, ba) <- fmt; (off, dl) <- data if dl % ba == 0)
      yield (ch, rate, ba, off, dl)
  }

  def decode(mediaId: Long, payload: Array[Byte]): Multimodal.DecodedMeta =
    parseHeader(payload) match {
      case Some((ch, rate, ba, _, dl)) =>
        Multimodal.DecodedMeta(mediaId, ch, rate, dl / ba, ok = true)
      case None => Multimodal.DecodedMeta(mediaId, 0, 0, 0, ok = false)
    }

  /** Canonical 44-byte-header PCM encode (the form [[resize]] emits). */
  private[llm] def encode(channels: Int, rate: Int,
      data: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](44 + data.length)
    def put(i: Int, s: String): Unit = {
      val sb = s.getBytes("US-ASCII"); System.arraycopy(sb, 0, out, i, 4)
    }
    def p16(i: Int, v: Int): Unit = {
      out(i) = (v & 0xff).toByte; out(i + 1) = ((v >> 8) & 0xff).toByte
    }
    def p32(i: Int, v: Long): Unit = { p16(i, (v & 0xffff).toInt); p16(i + 2, ((v >> 16) & 0xffff).toInt) }
    put(0, "RIFF"); p32(4, 36L + data.length); put(8, "WAVE")
    put(12, "fmt "); p32(16, 16L); p16(20, 1); p16(22, channels)
    p32(24, rate.toLong); p32(28, rate.toLong * channels * 2)
    p16(32, channels * 2); p16(34, 16)
    put(36, "data"); p32(40, data.length.toLong)
    System.arraycopy(data, 0, out, 44, data.length)
    out
  }

  /** Splice an odd-length unknown chunk (with its RIFF even-padding
    * byte) between fmt and data, fixing the RIFF size — used by
    * q_llm_mm_wav and MultimodalSpec so the parser's chunk-skip and
    * padding paths do real work on every payload (a canonical-encode →
    * decode round-trip alone would never exercise them). */
  private[llm] def withJunkChunk(canonical: Array[Byte]): Array[Byte] = {
    val junk = Array[Byte]('j', 'u', 'n', 'k', 5, 0, 0, 0, 9, 8, 7, 6, 5, 0)
    val out = new Array[Byte](canonical.length + junk.length)
    System.arraycopy(canonical, 0, out, 0, 36)
    System.arraycopy(junk, 0, out, 36, junk.length)
    System.arraycopy(canonical, 36, out, 36 + junk.length,
      canonical.length - 36)
    val sz = out.length - 8
    out(4) = (sz & 0xff).toByte; out(5) = ((sz >> 8) & 0xff).toByte
    out(6) = ((sz >> 16) & 0xff).toByte; out(7) = ((sz >> 24) & 0xff).toByte
    out
  }

  def resize(mediaId: Long, payload: Array[Byte], targetW: Int,
      targetH: Int): Multimodal.ResizedMeta =
    parseHeader(payload) match {
      case Some((ch, rate, ba, off, dl))
          if targetW > 0 && targetH > 0 && dl > 0 &&
            // same Int-overflow stance as the image codecs
            targetW.toLong * targetH * 2 <= Int.MaxValue =>
        val srcFrames = dl / ba
        val out = new Array[Byte](targetW * targetH * 2)
        var k = 0; var f = 0
        while (f < targetH) {
          val sf = (f.toLong * srcFrames / targetH).toInt
          var c = 0
          while (c < targetW) {
            val sc = (c.toLong * ch / targetW).toInt
            val src = off + sf * ba + sc * 2
            out(k) = payload(src); out(k + 1) = payload(src + 1)
            k += 2; c += 1
          }
          f += 1
        }
        Multimodal.ResizedMeta(mediaId, targetW, targetH,
          encode(targetW, rate, out), ok = true)
      case _ =>
        Multimodal.ResizedMeta(mediaId, 0, 0, Array.emptyByteArray, ok = false)
    }

  def embed(mediaId: Long, payload: Array[Byte], dim: Int): Array[Float] =
    parseHeader(payload) match {
      case Some((_, _, _, off, dl)) =>
        val hist = new Array[Float](dim)
        var p = off
        while (p < off + dl) {
          val v = ((payload(p) & 0xff) | (payload(p + 1) << 8)) // sign-extends
          hist((v + 32768) * dim / 65536) += 1f
          p += 2
        }
        hist
      case None => new Array[Float](dim)
    }
}

/** A REAL codec for multi-frame VIDEO — AVI containers carrying
  * uncompressed 24-bit DIB frames ('DIB ' fourcc, the format every
  * capture tool can emit) — in pure JVM code: the video leg of the
  * multimodal surface, through the same seam as the image and audio
  * codecs. Geometry mapping: width/height are the frame geometry and
  * n_frames is the REAL frame count from walking the movi list (the
  * first codec here where n_frames > 1 is parsed, not stubbed).
  *
  *  - [[decode]] walks the RIFF/AVI tree for real: the 'AVI ' form
  *    type, the 'hdrl' LIST with its 'avih' main header (geometry +
  *    declared frame count), nested 'strl' LISTs and unknown chunks
  *    skipped by size, the 'movi' LIST, and every '00db'/'00dc' frame
  *    chunk — validating each frame's byte length against the DIB
  *    row-stride formula `(3·w + 3) & ~3` (rows pad to 4 bytes) and
  *    the declared total;
  *  - [[resize]] nearest-neighbor-resamples EVERY frame spatially
  *    (same `src = floor(dst·srcDim/dstDim)` mapping as the image
  *    codecs, on the DIB's stored bottom-up rows) and re-encodes a
  *    valid decodable AVI;
  *  - [[embed]] is the Rec.709 luminance histogram over all frames'
  *    pixels (BGR byte order — DIBs store blue first);
  *  - [[sampledRaster]] is the codec half of frame sampling: the
  *    concatenated rasters of every `stride`-th frame, the
  *    `Multimodal.sampleFrameIdx` convention (`idx % stride == 0`)
  *    applied to real pixel data.
  *
  * Everything is integer arithmetic, so q_llm_mm_avi replays the
  * frame-chunk offsets, the stride picks, and the pixel layout in
  * DuckDB and sha256-matches the sampled rasters. Compressed video
  * (H.264 etc.) enters via the same trait with an external library. */
object AviCodec extends MediaCodec {

  private[llm] def rowStride(w: Int): Int = (3 * w + 3) & ~3

  /** (width, height, usPerFrame, frame chunk (offset, len) list), or
    * None when the bytes are not a valid DIB AVI. */
  private[llm] def parse(b: Array[Byte]): Option[(Int, Int, Int, List[(Int, Int)])] = {
    def u16(i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    def u32(i: Int): Long = u16(i).toLong | (u16(i + 2).toLong << 16)
    def tag(i: Int): String = new String(b, i, 4, "US-ASCII")
    if (b.length < 24 || tag(0) != "RIFF" || tag(8) != "AVI ") return None
    var w = 0; var h = 0; var usPerFrame = 0; var declaredFrames = -1L
    val frames = List.newBuilder[(Int, Int)]
    var nFrames = 0
    // walk one chunk run [from, to); recurse into hdrl/movi LISTs
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
          // other LISTs (strl, INFO, ...) skip by size
        } else if (id == "avih") {
          if (len < 56) return false
          usPerFrame = u32(body).toInt
          declaredFrames = u32(body + 16)
          w = u32(body + 32).toInt; h = u32(body + 36).toInt
        } else if (inMovi && (id == "00db" || id == "00dc")) {
          frames += ((body, len.toInt)); nFrames += 1
        }
        i = body + len.toInt + (len.toInt & 1) // chunks pad to even
      }
      true
    }
    if (!walk(12, b.length, inMovi = false)) return None
    val fs = frames.result()
    if (w <= 0 || h <= 0 || w > (1 << 15) || h > (1 << 15) ||
      declaredFrames != nFrames.toLong || nFrames == 0 ||
      fs.exists(_._2 != rowStride(w) * h)) None
    else Some((w, h, usPerFrame, fs))
  }

  def decode(mediaId: Long, payload: Array[Byte]): Multimodal.DecodedMeta =
    parse(payload) match {
      case Some((w, h, _, fs)) =>
        Multimodal.DecodedMeta(mediaId, w, h, fs.length, ok = true)
      case None => Multimodal.DecodedMeta(mediaId, 0, 0, 0, ok = false)
    }

  /** Canonical encode (the form [[resize]] emits): RIFF(AVI ) ←
    * LIST(hdrl){avih, LIST(strl){strh,strf}} + LIST(movi){00db...}. */
  private[llm] def encode(w: Int, h: Int, usPerFrame: Int,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    val frameLen = rowStride(w) * h
    require(frames.forall(_.length == frameLen), "frame raster size")
    val bos = new java.io.ByteArrayOutputStream()
    def put(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    def p16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def p32(v: Long): Unit = { p16((v & 0xffff).toInt); p16(((v >> 16) & 0xffff).toInt) }
    val hdrlLen = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
    val moviLen = 4 + frames.map(f => 8 + f.length).sum
    put("RIFF"); p32(4L + (8 + hdrlLen) + (8 + moviLen)); put("AVI ")
    put("LIST"); p32(hdrlLen.toLong); put("hdrl")
    put("avih"); p32(56L)
    p32(usPerFrame.toLong); p32(frameLen.toLong * 1000000L / math.max(usPerFrame, 1))
    p32(0L); p32(0L); p32(frames.length.toLong); p32(0L); p32(1L)
    p32(frameLen.toLong); p32(w.toLong); p32(h.toLong)
    (0 until 4).foreach(_ => p32(0L))
    put("LIST"); p32(4L + (8 + 56) + (8 + 40)); put("strl")
    put("strh"); p32(56L)
    put("vids"); put("DIB "); p32(0L); p16(0); p16(0); p32(0L)
    p32(usPerFrame.toLong); p32(1000000L) // scale/rate: frames per rate/scale
    p32(0L); p32(frames.length.toLong); p32(frameLen.toLong); p32(0L); p32(0L)
    p16(0); p16(0); p16(w); p16(h)
    put("strf"); p32(40L)
    p32(40L); p32(w.toLong); p32(h.toLong); p16(1); p16(24)
    p32(0L); p32(frameLen.toLong); p32(0L); p32(0L); p32(0L); p32(0L)
    put("LIST"); p32(moviLen.toLong); put("movi")
    frames.foreach { f => put("00db"); p32(f.length.toLong); bos.write(f) }
    bos.toByteArray
  }

  def resize(mediaId: Long, payload: Array[Byte], targetW: Int,
      targetH: Int): Multimodal.ResizedMeta =
    parse(payload) match {
      case Some((w, h, us, fs))
          if targetW > 0 && targetH > 0 &&
            // Int-overflow stance of the other codecs, times frames
            rowStride(targetW).toLong * targetH * fs.length <= Int.MaxValue =>
        val srcStride = rowStride(w); val dstStride = rowStride(targetW)
        val out = fs.map { case (off, _) =>
          val fr = new Array[Byte](dstStride * targetH)
          var y = 0
          while (y < targetH) {
            val sy = (y.toLong * h / targetH).toInt
            var x = 0
            while (x < targetW) {
              val sx = (x.toLong * w / targetW).toInt
              val src = off + sy * srcStride + sx * 3
              val dst = y * dstStride + x * 3
              fr(dst) = payload(src); fr(dst + 1) = payload(src + 1)
              fr(dst + 2) = payload(src + 2)
              x += 1
            }
            y += 1
          }
          fr
        }
        Multimodal.ResizedMeta(mediaId, targetW, targetH,
          encode(targetW, targetH, us, out), ok = true)
      case _ =>
        Multimodal.ResizedMeta(mediaId, 0, 0, Array.emptyByteArray, ok = false)
    }

  def embed(mediaId: Long, payload: Array[Byte], dim: Int): Array[Float] =
    parse(payload) match {
      case Some((w, h, _, fs)) =>
        val hist = new Array[Float](dim)
        val stride = rowStride(w)
        for ((off, _) <- fs; y <- 0 until h) {
          var x = 0
          while (x < w) {
            val p = off + y * stride + x * 3
            val b = payload(p) & 0xff; val g = payload(p + 1) & 0xff
            val r = payload(p + 2) & 0xff
            hist(((2126 * r + 7152 * g + 722 * b) / 10000) * dim / 256) += 1f
            x += 1
          }
        }
        hist
      case None => new Array[Float](dim)
    }

  /** Frame sampling over real pixels: the concatenated rasters of
    * every `stride`-th frame (indices 0, stride, 2·stride, ... — the
    * [[Multimodal.sampleFrameIdx]] convention), or empty when the
    * payload is not a valid DIB AVI. */
  def sampledRaster(payload: Array[Byte], stride: Int): Array[Byte] =
    parse(payload) match {
      case Some((_, _, _, fs)) =>
        val picked = fs.zipWithIndex.collect {
          case ((off, len), i) if i % stride == 0 =>
            java.util.Arrays.copyOfRange(payload, off, off + len)
        }
        val out = new Array[Byte](picked.map(_.length).sum)
        var k = 0
        picked.foreach { f =>
          System.arraycopy(f, 0, out, k, f.length); k += f.length
        }
        out
      case None => Array.emptyByteArray
    }
}

/** The deterministic fake standing in for a real codec: dimensions
  * derive from `java.util.Arrays.hashCode(payload)` (the 31-fold over
  * signed bytes in wrapping 32-bit arithmetic — SQL-expressible, which
  * is what buys the cross-engine oracle on q_llm_mm_decode), resize
  * passes the payload through with rewritten dimensions, and embed
  * folds bytes into a seeded 64-bit hash per coordinate. */
object StubMediaCodec extends MediaCodec {

  def decode(mediaId: Long, payload: Array[Byte]): Multimodal.DecodedMeta = {
    val h = java.util.Arrays.hashCode(payload)
    Multimodal.DecodedMeta(mediaId, 16 + math.floorMod(h, 1024),
      16 + math.floorMod(h >> 10, 1024), 1 + math.floorMod(h >> 20, 32),
      ok = true)
  }

  def resize(mediaId: Long, payload: Array[Byte], targetW: Int,
      targetH: Int): Multimodal.ResizedMeta =
    Multimodal.ResizedMeta(mediaId, targetW, targetH, payload, ok = true)

  def embed(mediaId: Long, payload: Array[Byte], dim: Int): Array[Float] =
    Array.tabulate(dim) { d =>
      var h = 1125899906842597L + d
      payload.foreach(b => h = h * 31 + b)
      ((h % 1000).toFloat / 1000f) - 0.5f
    }
}

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

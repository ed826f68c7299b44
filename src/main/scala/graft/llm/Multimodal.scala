package graft.llm

import graft.Tables
import graft.queries.QuerySpec
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed per-partition in
  * batches. The actual codec work (JPEG decode, audio resample, video
  * frame extraction) sits behind the pluggable [[MediaCodec]] seam —
  * this container has no media libraries, so the default
  * [[StubMediaCodec]] is a documented deterministic fake keyed on the
  * payload hash (drop-in recipe for a real javacv/ffmpeg codec:
  * MediaCodec.scala). Everything around the codec (schema, batched
  * per-partition execution with per-partition codec lifetime,
  * metadata extraction, partitioning) is real and is what matters at
  * 100 TB: payloads never pass through a shuffle; only extracted
  * features do.
  */
object Multimodal {

  /** The media-row schema: payload + typed metadata struct (meta and
    * mime are always populated by [[toMedia]], hence non-nullable). */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = false),
      StructField("n_bytes", LongType, nullable = true),
      StructField("sha256", StringType, nullable = true))), nullable = false)))

  /** Wrap any binary column into the canonical media shape. Metadata is
    * computed with codegen'd built-ins — no payload leaves the scan. */
  def toMedia(df: DataFrame, idCol: String, payloadCol: String, mime: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(payloadCol).cast("binary").as("payload"),
      struct(
        lit(mime).as("mime"),
        length(col(payloadCol).cast("binary")).cast("long").as("n_bytes"),
        sha2(col(payloadCol).cast("binary"), 256).as("sha256")).as("meta"))

  /** Decoded-frame features produced by the (stubbed) codec. */
  case class DecodedMeta(media_id: Long, width: Int, height: Int,
      n_frames: Int, ok: Boolean)

  /** Decode through a pluggable [[MediaCodec]] (seam contract and the
    * javacv drop-in recipe: MediaCodec.scala). The codec ships to
    * executors; [[MediaCodec.open]] runs once per partition before its
    * first row and [[MediaCodec.close]] on task completion — one codec
    * context per partition, the batch shape a Python `mapInPandas`
    * pipeline would also use. Empty/null payloads short-circuit to the
    * not-ok row without touching the codec. */
  def decodeWith(media: DataFrame, codec: MediaCodec)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val decoded = media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        codecScope(codec, rows).map { case (id, payload) =>
          if (payload == null || payload.isEmpty) DecodedMeta(id, 0, 0, 0, ok = false)
          else codec.decode(id, payload)
        }
      }
    decoded.toDF()
  }

  /** [[decodeWith]] under the default deterministic stub. */
  def decodeStub(media: DataFrame)(implicit spark: SparkSession): DataFrame =
    decodeWith(media, StubMediaCodec)

  /** Per-partition codec lifetime: open before the first row, close on
    * task completion (covers both exhaustion and task failure — an
    * iterator wrapper alone would leak the context on error). */
  private[llm] def codecScope[T](codec: MediaCodec, rows: Iterator[T]): Iterator[T] = {
    codec.open()
    Option(org.apache.spark.TaskContext.get())
      .foreach(_.addTaskCompletionListener[Unit](_ => codec.close()))
    rows
  }

  /** Deterministic frame sampling plumbing: pick every k-th frame index
    * from a decoded frame count — pure expression, no codec. */
  def sampleFrameIdx(nFrames: Column, stride: Int): Column =
    filter(sequence(lit(0), greatest(nFrames - 1, lit(0))),
      i => pmod(i, lit(stride)) === 0 && nFrames > 0)

  /** Resized-frame output of the (stubbed) resize kernel. */
  case class ResizedMeta(media_id: Long, width: Int, height: Int,
      payload: Array[Byte], ok: Boolean)

  /** Resize through a pluggable [[MediaCodec]] — binary in → binary
    * out, per-partition batches; the stub passes payloads through with
    * rewritten dimensions, a real codec decodes + swscales +
    * re-encodes in the same loop. */
  def resizeWith(media: DataFrame, targetW: Int, targetH: Int,
      codec: MediaCodec)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        codecScope(codec, rows).map { case (id, payload) =>
          if (payload == null || payload.isEmpty)
            ResizedMeta(id, 0, 0, Array.emptyByteArray, ok = false)
          else codec.resize(id, payload, targetW, targetH)
        }
      }.toDF()
  }

  /** [[resizeWith]] under the default deterministic stub. */
  def resizeStub(media: DataFrame, targetW: Int, targetH: Int)(
      implicit spark: SparkSession): DataFrame =
    resizeWith(media, targetW, targetH, StubMediaCodec)

  /** Feature extraction through a pluggable [[MediaCodec]] — one model
    * context per partition (the shape a `mapInPandas` batch would
    * take), codec output unit-normed here so downstream similarity
    * plumbing (cosine top-k, sign-LSH) sees consistent vectors
    * whatever the encoder. */
  def embedWith(media: DataFrame, codec: MediaCodec, dim: Int = 16)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        codecScope(codec, rows).map { case (id, payload) =>
          val bytes = if (payload == null) Array.emptyByteArray else payload
          val raw = codec.embed(id, bytes, dim)
          val n = math.sqrt(raw.map(x => x.toDouble * x).sum).toFloat
          (id, if (n == 0f) raw.toSeq else raw.map(_ / n).toSeq)
        }
      }.toDF("media_id", "embedding")
  }

  /** [[embedWith]] under the default deterministic stub. */
  def extractFeaturesStub(media: DataFrame, dim: Int = 16)(
      implicit spark: SparkSession): DataFrame =
    embedWith(media, StubMediaCodec, dim)

  /** Mixed-corpus decode: one pass over a media table whose rows span
    * FORMATS, dispatching each payload to its mime's codec — the shape
    * a real multimodal corpus scan takes (one partition iterator, all
    * codecs' contexts opened once per partition, every row routed
    * row-locally; no per-format re-scan). Unknown mimes and
    * empty/null payloads are the not-ok row, never a throw. Stateless
    * per row, so the SAME chain serves a readStream DataFrame
    * unchanged (spec-pinned). */
  def decodeMixed(media: DataFrame, codecs: Map[String, MediaCodec])(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val mimeCol =
      if (media.columns.contains("mime")) col("mime") else col("meta.mime")
    media.select(col("media_id"), col("payload"), mimeCol.as("mime"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { rows =>
        // track opens as they succeed and register the close-all
        // listener FIRST: if a later codec's open() throws, the
        // already-opened contexts still close on task completion
        // (opening everything before registering would leak them)
        val opened = scala.collection.mutable.ArrayBuffer.empty[MediaCodec]
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ =>
            opened.foreach(_.close())))
        codecs.values.foreach { c => c.open(); opened += c }
        rows.map { case (id, p, mime) =>
          codecs.get(mime) match {
            case Some(c) if p != null && p.nonEmpty =>
              val d = c.decode(id, p)
              (id, mime, d.width, d.height, d.n_frames, d.ok)
            case _ => (id, mime, 0, 0, 0, false)
          }
        }
      }.toDF("media_id", "mime", "width", "height", "n_frames", "ok")
  }

  /** The media data card over a [[decodeMixed]] frame: per-mime row
    * counts, decode-ok counts, and geometry totals — the release-card
    * numbers a multimodal corpus publishes (the q_llm_source_report
    * stance on media). One bounded-cardinality groupBy (mimes), all
    * sums map-side combined. */
  def mediaCard(decoded: DataFrame): DataFrame =
    decoded.groupBy(col("mime")).agg(
      count(lit(1)).as("n_media"),
      sum(when(col("ok"), 1L).otherwise(0L)).as("n_ok"),
      sum(col("n_frames").cast("long")).as("total_frames"),
      sum(col("width").cast("long")).as("total_width"),
      sum(col("height").cast("long")).as("total_height"))

  /** Oracle-checkable slice of the plumbing: metadata extraction over
    * binary payloads (documents.text cast to bytes stands in for a blob
    * column). The decode stub itself is exercised by ScalaTest. */
  val qMultimodalMeta = QuerySpec(
    "q_llm_multimodal_meta",
    (s, d) =>
      toMedia(Tables.load(s, d, "documents"), "doc_id", "text", "text/plain")
        .select(col("media_id"), col("meta.mime").as("mime"),
          col("meta.n_bytes").as("n_bytes"), col("meta.sha256").as("sha256"))
        .orderBy(col("media_id")),
    Some("""SELECT doc_id AS media_id, 'text/plain' AS mime,
           |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
           |  sha256(text) AS sha256
           |FROM documents ORDER BY media_id""".stripMargin))

  /** The full decode → frame-sample pipeline over real binary payloads
    * (documents.text as blobs). Oracle'd: the stub's "codec" is
    * `java.util.Arrays.hashCode` — the documented 31-fold over signed
    * bytes in wrapping 32-bit arithmetic — which the SQL restates over
    * the payload's hex bytes with an explicit wrap; dimensions and the
    * frame-sample stride follow arithmetically. (A real codec would
    * drop this to a rows-only check — the fake being SQL-expressible is
    * what buys the cross-engine hash here.) The sampled-frame list is
    * serialized to a comma-joined string so the driver harness (pandas
    * sort over result columns) can hash it — array cells are unhashable
    * there. */
  val qMultimodalDecode = QuerySpec(
    "q_llm_mm_decode",
    (s, d) => {
      implicit val sp: SparkSession = s
      val media = toMedia(Tables.load(s, d, "documents"), "doc_id", "text", "image/x-stub")
      decodeStub(media)
        .withColumn("sampled_frames",
          array_join(transform(sampleFrameIdx(col("n_frames"), 4), _.cast("string")), ","))
        .select(col("media_id"), col("width"), col("height"),
          col("n_frames"), col("ok"), col("sampled_frames"))
        .orderBy(col("media_id"))
    },
    Some("""WITH b AS (
           |  SELECT doc_id AS media_id,
           |         coalesce(hex(CAST(text AS BLOB)), '') AS hx,
           |         coalesce(octet_length(CAST(text AS BLOB)), 0) AS n
           |  FROM documents
           |), h AS (
           |  SELECT media_id, n,
           |    list_reduce(
           |      list_prepend(CAST(1 AS BIGINT),
           |        list_transform(range(1, n + 1), i ->
           |          CASE WHEN CAST(('0x' || substr(hx, i*2-1, 2)) AS BIGINT) > 127
           |               THEN CAST(('0x' || substr(hx, i*2-1, 2)) AS BIGINT) - 256
           |               ELSE CAST(('0x' || substr(hx, i*2-1, 2)) AS BIGINT) END)),
           |      (acc, bb) -> ((31 * acc + bb + 2147483648) % 4294967296
           |                     + 4294967296) % 4294967296 - 2147483648) AS hash
           |  FROM b
           |)
           |-- n = 0 branch mirrors decodeStub's empty/null-payload row:
           |-- (0, 0, 0, false, '')
           |SELECT media_id,
           |  CAST(CASE WHEN n = 0 THEN 0
           |    ELSE 16 + ((hash % 1024) + 1024) % 1024 END AS INT) AS width,
           |  CAST(CASE WHEN n = 0 THEN 0
           |    ELSE 16 + ((CAST(floor(hash / 1024.0) AS BIGINT) % 1024) + 1024) % 1024
           |    END AS INT) AS height,
           |  CAST(CASE WHEN n = 0 THEN 0
           |    ELSE 1 + ((CAST(floor(hash / 1048576.0) AS BIGINT) % 32) + 32) % 32
           |    END AS INT) AS n_frames,
           |  n > 0 AS ok,
           |  CASE WHEN n = 0 THEN '' ELSE array_to_string(range(0,
           |    CAST(1 + ((CAST(floor(hash / 1048576.0) AS BIGINT) % 32) + 32) % 32
           |      AS INT), 4), ',') END AS sampled_frames
           |FROM h ORDER BY media_id""".stripMargin))

  /** REAL-codec pipeline, oracle'd BYTE-EXACTLY: builds a valid binary
    * PPM (P6) per document in-plan (geometry from doc_id, raster =
    * the text's bytes cycled — the strip_markup seeding stance), then
    * [[PpmCodec]] REALLY parses the header, REALLY nearest-neighbor
    * resamples to 4×3, and re-encodes; the SQL replays the integer
    * resample over the constructed raster and sha256-matches the
    * re-encoded bytes. The corpus is ASCII, so chars ARE bytes in
    * both engines. This is the multimodal path's proof that the seam
    * carries a real codec, not just the stub — compressed formats
    * still enter through the same trait with an external library. */
  /** Deterministic PPM payloads from a (doc_id, text) frame: the
    * text's bytes tile a `(1 + id%8) × (1 + id%5)` RGB raster, with a
    * 1-byte fallback so a null/empty text still builds a valid image
    * (the oracle's % n guard) rather than tripping div-by-zero.
    * Shared by [[qMmPpm]] and [[mmNearDup]] so the SQL replays stay
    * single-sourced. */
  private def ppmPayloads(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      (lit(1) + pmod(col("doc_id"), lit(8))).as("w"),
      (lit(1) + pmod(col("doc_id"), lit(5))).as("h"),
      expr("CASE WHEN text IS NULL OR text = '' THEN 'x' ELSE text END").as("t"))
      .withColumn("npix", col("w") * col("h") * lit(3))
      .withColumn("payload", concat(
        lit("P6\n"), col("w").cast("string"), lit(" "),
        col("h").cast("string"), lit("\n255\n"),
        expr("""substring(repeat(t,
               |  cast((npix + length(t) - 1) div length(t) as int)),
               |  1, cast(npix as int))""".stripMargin)).cast("binary"))

  val qMmPpm = QuerySpec(
    "q_llm_mm_ppm",
    (s, d) => {
      implicit val sp: SparkSession = s
      import sp.implicits._
      val built = ppmPayloads(Tables.load(s, d, "documents"))
      // ONE codec pass per payload: decode meta AND the 4x3 resample in
      // the same partition iterator — the payload-build scan runs once
      // (two independent decodeWith/resizeWith branches would re-build
      // every payload per branch)
      val media = toMedia(built, "doc_id", "payload", "image/x-portable-pixmap")
      media.select(col("media_id"), col("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions { rows =>
          codecScope(PpmCodec, rows).map { case (id, p) =>
            val dec = PpmCodec.decode(id, p)
            val rs = PpmCodec.resize(id, p, 4, 3)
            (id, dec.width, dec.height, dec.n_frames, dec.ok,
              rs.width, rs.height, rs.payload)
          }
        }
        .toDF("media_id", "width", "height", "n_frames", "ok",
          "r_width", "r_height", "resized_payload")
        .withColumn("resized_sha256", sha2(col("resized_payload"), 256))
        .drop("resized_payload")
        .orderBy(col("media_id"))
    },
    Some("""WITH src AS (
           |  SELECT doc_id AS media_id,
           |    CAST(1 + doc_id % 8 AS INT) AS w,
           |    CAST(1 + doc_id % 5 AS INT) AS h,
           |    CASE WHEN text IS NULL OR text = '' THEN 'x' ELSE text END AS text,
           |    length(CASE WHEN text IS NULL OR text = '' THEN 'x' ELSE text END) AS n
           |  FROM documents
           |), res AS (
           |  SELECT media_id, w, h,
           |    'P6' || chr(10) || '4 3' || chr(10) || '255' || chr(10) ||
           |    array_to_string(list_transform(range(0, 36), k ->
           |      substr(text,
           |        CAST(((((k // 12) * h // 3 * w
           |          + ((k % 12) // 3) * w // 4) * 3 + k % 3) % n) + 1 AS INT),
           |        1)), '') AS resized_str
           |  FROM src
           |)
           |SELECT media_id, w AS width, h AS height,
           |  CAST(1 AS INT) AS n_frames, TRUE AS ok,
           |  CAST(4 AS INT) AS r_width, CAST(3 AS INT) AS r_height,
           |  sha256(resized_str) AS resized_sha256
           |FROM res ORDER BY media_id""".stripMargin))

  /** Image near-duplicate detection over REALLY-DECODED pixels: the
    * cross-family composition a multimodal curation pipeline runs —
    * codec decode → luminance-histogram feature ([[PpmCodec.embed]],
    * unit-normed by [[embedWith]]) → the embedding family's sign-LSH
    * capped-bucket candidate pairs ([[Similarity.embNearDupPairs]]) at
    * a cosine threshold. The synthetic rasters derive from doc_ids
    * (different ids ⇒ different geometry), so the query PLANTS one
    * exact copy of each of docs 0-9 at id+1e9 (the pii_report seeding
    * stance; 1e9 ≡ 0 mod 40 preserves the id-derived geometry, making
    * the copy pixel-identical) — the flag path does real work on every
    * run.
    *
    * Scale shape: one codec pass per payload (the mm_ppm stance), then
    * exactly [[Similarity.embNearDupPairs]]'s documented shape — one
    * groupBy on the signature with the bucket cap enforced inside the
    * aggregation buffer; nothing image-sized crosses a shuffle (16
    * floats per image do). */
  def mmNearDup(docs: DataFrame, bits: Int = 8, tau: Double = 0.9999,
      dim: Int = 16)(implicit spark: SparkSession): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val planted = docs.select(col("doc_id"), col("text"))
      .unionByName(docs.filter(col("doc_id") < 10)
        .select((col("doc_id") + lit(1000000000L)).as("doc_id"), col("text")))
    val media = toMedia(ppmPayloads(planted), "doc_id", "payload",
      "image/x-portable-pixmap")
    val vecs = embedWith(media, PpmCodec, dim)
      .select(col("media_id").as("vec_id"), col("embedding"),
        Similarity.norm(col("embedding")).as("nrm"))
    Similarity.embNearDupPairs(vecs, bits = bits, dim = dim)
      .filter(col("cos") >= tau)
  }

  /** Replayed in DuckDB end-to-end from the TEXT BYTES: the raster
    * tiling, the integer Rec.709 luminance histogram, the float
    * normalize (counts are small ints, so the double sums are exact
    * and the final float casts single-round — bit-equal to the JVM),
    * the sign-LSH hyperplane literals, the bucket cap, and the
    * float-product/double-accumulate cosine. A hash match means the
    * CODEC's decoded pixels, not just the plumbing, agree with SQL. */
  val qMmNearDup = QuerySpec(
    "q_llm_mm_neardup",
    (s, d) => {
      implicit val sp: SparkSession = s
      mmNearDup(Tables.load(s, d, "documents"))
        .orderBy(col("ida"), col("idb"))
    },
    Some {
      val planesSql = Similarity.hyperplanes(8, 16, 42L)
        .map(_.mkString("[", ",", "]")).mkString("[", ",", "]")
      val dotFF = (a: String, b: String) =>
        s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           |      list_transform(list_zip($a, $b), z -> CAST(z[1]*z[2] AS DOUBLE))),
           |      (acc, p) -> acc + p)""".stripMargin
      s"""WITH planted AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000000, text FROM documents WHERE doc_id < 10
         |), src AS (
         |  SELECT doc_id AS vec_id,
         |    CAST(1 + doc_id % 8 AS INT) AS w,
         |    CAST(1 + doc_id % 5 AS INT) AS h,
         |    CASE WHEN text IS NULL OR text = '' THEN 'x' ELSE text END AS text,
         |    length(CASE WHEN text IS NULL OR text = '' THEN 'x' ELSE text END) AS n
         |  FROM planted
         |), hist AS (
         |  SELECT vec_id,
         |    list_transform(range(16), b -> CAST(len(list_filter(range(w * h),
         |      p -> ((2126 * ascii(substr(text, ((p * 3) % n) + 1, 1))
         |           + 7152 * ascii(substr(text, ((p * 3 + 1) % n) + 1, 1))
         |           +  722 * ascii(substr(text, ((p * 3 + 2) % n) + 1, 1)))
         |            // 10000) * 16 // 256 = b)) AS DOUBLE)) AS hraw
         |  FROM src
         |), emb AS (
         |  SELECT vec_id,
         |    list_transform(hraw, x -> CAST(CAST(x AS FLOAT) /
         |      CAST(sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |        list_transform(hraw, y -> y * y)), (a, z) -> a + z)) AS FLOAT)
         |      AS FLOAT)) AS embedding
         |  FROM hist
         |), v AS (
         |  SELECT vec_id, embedding,
         |    sqrt(${dotFF("embedding", "embedding")}) AS nrm
         |  FROM emb
         |), pl AS (SELECT $planesSql::DOUBLE[][] AS planes),
         |sigs AS (
         |  SELECT vec_id, embedding, nrm,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(range(8), b ->
         |        CASE WHEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |            list_transform(list_zip(embedding, planes[b+1]),
         |              z -> CAST(z[1] AS DOUBLE) * z[2])),
         |            (acc, p) -> acc + p) >= 0
         |        THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END)),
         |      (a, x) -> a + x) AS sig
         |  FROM v, pl
         |), sized AS (
         |  SELECT *, count(*) OVER (PARTITION BY sig) AS cnt FROM sigs
         |)
         |SELECT a.vec_id AS ida, b.vec_id AS idb,
         |  ${dotFF("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cos
         |FROM sized a JOIN sized b ON a.sig = b.sig AND a.vec_id < b.vec_id
         |WHERE a.cnt > 1 AND a.cnt <= 1000
         |  AND ${dotFF("a.embedding", "b.embedding")} / (a.nrm * b.nrm) >= 0.9999
         |ORDER BY ida, idb""".stripMargin
    })

  /** REAL audio through the codec seam (the q_llm_mm_ppm stance, on
    * the time axis): 16-bit PCM RIFF/WAVE payloads built in-plan from
    * each document (frame count / channels / rate derive from doc_id,
    * sample bytes cycle the text — and an odd-length junk chunk is
    * spliced between fmt and data so the parser's chunk-skip and
    * even-padding paths fire on EVERY payload), then [[WavCodec]]
    * really parses the container and nearest-neighbor-resamples the
    * stream to 6 frames. One codec pass per payload. The oracle
    * replays the time-axis `src = floor(dst·srcFrames/dstFrames)`
    * resample from the text bytes and sha256-matches the resampled
    * DATA section — proof the parsed geometry AND the picked sample
    * bytes agree cross-engine. (The 44-byte output header is
    * deterministic-by-construction and its round-trip is
    * MultimodalSpec-pinned; only the data section carries
    * per-document content, so that is what the hash pins.) */
  val qMmWav = QuerySpec(
    "q_llm_mm_wav",
    (s, d) => {
      implicit val sp: SparkSession = s
      import sp.implicits._
      val built = Tables.load(s, d, "documents").select(
        col("doc_id"),
        expr("CASE WHEN text IS NULL OR text = '' THEN 'x' ELSE text END").as("t"))
      built.as[(Long, String)]
        .mapPartitions { rows =>
          codecScope(WavCodec, rows).map { case (id, t) =>
            val frames = (4 + id % 12).toInt
            val channels = (1 + id % 2).toInt
            val rate = (8000 + (id % 3) * 4000).toInt
            val tb = t.getBytes("UTF-8")
            val data = Array.tabulate[Byte](frames * channels * 2)(
              j => tb(j % tb.length))
            val payload = WavCodec.withJunkChunk(
              WavCodec.encode(channels, rate, data))
            val dec = WavCodec.decode(id, payload)
            val rs = WavCodec.resize(id, payload, channels, 6)
            (id, dec.width, dec.height, dec.n_frames, dec.ok,
              rs.height, rs.payload.drop(44))
          }
        }
        .toDF("media_id", "channels", "sample_rate", "n_frames", "ok",
          "r_frames", "data_part")
        .withColumn("data_sha256", sha2(col("data_part"), 256))
        .drop("data_part")
        .orderBy(col("media_id"))
    },
    Some("""WITH src AS (
           |  SELECT doc_id AS media_id,
           |    CAST(4 + doc_id % 12 AS INT) AS f,
           |    CAST(1 + doc_id % 2 AS INT) AS c,
           |    CAST(8000 + (doc_id % 3) * 4000 AS INT) AS rate,
           |    CASE WHEN text IS NULL OR text = '' THEN 'x' ELSE text END AS text,
           |    length(CASE WHEN text IS NULL OR text = '' THEN 'x'
           |      ELSE text END) AS n
           |  FROM documents
           |), res AS (
           |  SELECT media_id, f, c, rate,
           |    array_to_string(list_transform(range(0, 6 * c * 2), k ->
           |      substr(text,
           |        CAST((((k // (c * 2)) * f // 6) * (c * 2)
           |          + k % (c * 2)) % n + 1 AS INT), 1)), '') AS data_str
           |  FROM src
           |)
           |SELECT media_id, c AS channels, rate AS sample_rate,
           |  f AS n_frames, TRUE AS ok, CAST(6 AS INT) AS r_frames,
           |  sha256(data_str) AS data_sha256
           |FROM res ORDER BY media_id""".stripMargin))

  /** REAL multi-frame video through the codec seam: AVI containers of
    * uncompressed 24-bit DIB frames built in-plan from each document
    * (geometry and frame count derive from doc_id, frame rasters cycle
    * the text bytes — each frame from a different text offset, so
    * frame identity matters), then [[AviCodec]] really walks the RIFF
    * tree (hdrl/avih geometry, nested strl skipped by size, movi frame
    * chunks length-validated) and FRAME-SAMPLES every 2nd frame's raw
    * raster ([[Multimodal.sampleFrameIdx]]'s convention over real
    * pixels — the brief's video op). The oracle replays the stride
    * picks and the per-frame byte layout from the text and
    * sha256-matches the concatenated sampled rasters; n_frames is the
    * first REAL parsed multi-frame count in the family. Widths are
    * multiples of 4 so the DIB row stride is exactly 3·w (the general
    * padded-stride path is MultimodalSpec-pinned). */
  val qMmAvi = QuerySpec(
    "q_llm_mm_avi",
    (s, d) => {
      implicit val sp: SparkSession = s
      import sp.implicits._
      val built = Tables.load(s, d, "documents").select(
        col("doc_id"),
        expr("CASE WHEN text IS NULL OR text = '' THEN 'x' ELSE text END").as("t"))
      built.as[(Long, String)]
        .mapPartitions { rows =>
          codecScope(AviCodec, rows).map { case (id, t) =>
            val w = (4 * (1 + id % 2)).toInt
            val h = (1 + id % 3).toInt
            val nf = (2 + id % 5).toInt
            val tb = t.getBytes("UTF-8")
            val frameLen = 3 * w * h
            val frames = (0 until nf).map(f =>
              Array.tabulate[Byte](frameLen)(
                j => tb((f * frameLen + j) % tb.length)))
            val payload = AviCodec.encode(w, h, 40000, frames)
            val dec = AviCodec.decode(id, payload)
            (id, dec.width, dec.height, dec.n_frames, dec.ok,
              AviCodec.sampledRaster(payload, stride = 2))
          }
        }
        .toDF("media_id", "width", "height", "n_frames", "ok", "sampled")
        .withColumn("sampled_sha256", sha2(col("sampled"), 256))
        .drop("sampled")
        .orderBy(col("media_id"))
    },
    Some("""WITH src AS (
           |  SELECT doc_id AS media_id,
           |    CAST(4 * (1 + doc_id % 2) AS INT) AS w,
           |    CAST(1 + doc_id % 3 AS INT) AS h,
           |    CAST(2 + doc_id % 5 AS INT) AS nf,
           |    CASE WHEN text IS NULL OR text = '' THEN 'x' ELSE text END AS text,
           |    length(CASE WHEN text IS NULL OR text = '' THEN 'x'
           |      ELSE text END) AS n
           |  FROM documents
           |), samp AS (
           |  SELECT media_id, w, h, nf,
           |    array_to_string(list_transform(
           |      flatten(list_transform(range(0, nf, 2), f ->
           |        list_transform(range(0, 3 * w * h),
           |          j -> f * (3 * w * h) + j))),
           |      idx -> substr(text, CAST(idx % n + 1 AS INT), 1)), '') AS s
           |  FROM src
           |)
           |SELECT media_id, w AS width, h AS height, nf AS n_frames,
           |  TRUE AS ok, sha256(s) AS sampled_sha256
           |FROM samp ORDER BY media_id""".stripMargin))

  val all: Seq[QuerySpec] =
    Seq(qMultimodalMeta, qMultimodalDecode, qMmPpm, qMmNearDup, qMmWav,
      qMmAvi)
}

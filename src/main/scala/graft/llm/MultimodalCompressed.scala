package graft.llm

import graft.Tables
import graft.queries.QuerySpec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declared queries for the COMPRESSED-codec family
  * ([[MuLawCodec]], [[AdpcmCodec]], [[MjpegCodec]]): the q_llm_mm_ppm
  * stance — payloads built in-plan deterministically from the
  * documents table, REALLY decompressed by the codec on the Spark
  * side, and the decompression replayed arithmetically by the DuckDB
  * oracle. One codec pass per payload (decode meta + decompress in
  * the same partition iterator), nothing payload-sized crossing a
  * shuffle — the [[Multimodal]] family's scale contract.
  */
object MultimodalCompressed {

  import Multimodal.codecScope

  /** COMPRESSED audio #1 — G.711 μ-law: the text's bytes ARE the
    * 8-bit μ-law code stream (any byte is a valid code), wrapped in a
    * format-tag-7 RIFF/WAVE with an odd-length junk chunk spliced in
    * (the mm_wav stance — the parser's chunk-skip and even-padding
    * paths fire on every payload). [[MuLawCodec]] really walks the
    * container, time-resamples to 6 frames, and EXPANDS each picked
    * code through the G.711 segment formula; the oracle replays the
    * resample picks AND the companding expansion per code byte —
    * a hash match proves the cross-engine decompression, sample for
    * sample. */
  val qMmMulaw = QuerySpec(
    "q_llm_mm_mulaw",
    (s, d) => {
      implicit val sp: SparkSession = s
      import sp.implicits._
      val built = Tables.load(s, d, "documents").select(
        col("doc_id"),
        expr("CASE WHEN regexp_replace(coalesce(text, ''), '[^ -~]', '') = ''" +
          " THEN 'x' ELSE regexp_replace(text, '[^ -~]', '') END").as("t"))
      built.as[(Long, String)]
        .mapPartitions { rows =>
          codecScope(MuLawCodec, rows).map { case (id, t) =>
            val frames = (4 + id % 12).toInt
            val channels = (1 + id % 2).toInt
            val rate = (8000 + (id % 3) * 4000).toInt
            val tb = t.getBytes("UTF-8")
            val codes = Array.tabulate[Byte](frames * channels)(
              j => tb(j % tb.length))
            val payload = WavCodec.withJunkChunk(
              MuLawCodec.encode(channels, rate, codes))
            val dec = MuLawCodec.decode(id, payload)
            val rs = MuLawCodec.resize(id, payload, channels, 6)
            // the resize output is a PCM16 WAV: expanded samples sit in
            // its data section, little-endian
            val data = rs.payload.drop(44)
            val pcm = Array.tabulate(data.length / 2)(
              k => (data(2 * k) & 0xff) | (data(2 * k + 1) << 8))
            (id, dec.width, dec.height, dec.n_frames, dec.ok,
              rs.height, pcm.mkString(","))
          }
        }
        .toDF("media_id", "channels", "sample_rate", "n_frames", "ok",
          "r_frames", "pcm_csv")
        .orderBy(col("media_id"))
    },
    Some("""WITH src AS (
           |  SELECT doc_id AS media_id,
           |    CAST(4 + doc_id % 12 AS INT) AS f,
           |    CAST(1 + doc_id % 2 AS INT) AS c,
           |    CAST(8000 + (doc_id % 3) * 4000 AS INT) AS rate,
           |    CASE WHEN regexp_replace(coalesce(text, ''), '[^ -~]', '', 'g') = ''
           |      THEN 'x'
           |      ELSE regexp_replace(text, '[^ -~]', '', 'g') END AS text,
           |    length(CASE WHEN regexp_replace(coalesce(text, ''), '[^ -~]', '', 'g') = ''
           |      THEN 'x'
           |      ELSE regexp_replace(text, '[^ -~]', '', 'g') END) AS n
           |  FROM documents
           |), res AS (
           |  -- output sample k (6 frames x c channels, frame-major):
           |  -- source frame = floor(k/c * f / 6), channel = k % c,
           |  -- mu-law code byte = text[(frame*c + channel) % n],
           |  -- G.711 expand: u = 255 - code (the ~code & 0xff),
           |  --   mag = ((u%16)*8 + 132) << ((u//16)%8) - 132, sign = u//128
           |  SELECT media_id, f, c, rate,
           |    array_to_string(list_transform(range(0, 6 * c), k ->
           |      CAST(CASE WHEN (255 - ascii(substr(text,
           |          CAST(((k // c) * f // 6 * c + k % c) % n + 1 AS INT), 1)))
           |          // 128 = 1
           |        THEN -((((255 - ascii(substr(text,
           |          CAST(((k // c) * f // 6 * c + k % c) % n + 1 AS INT), 1)))
           |          % 16) * 8 + 132) * (1 << (((255 - ascii(substr(text,
           |          CAST(((k // c) * f // 6 * c + k % c) % n + 1 AS INT), 1)))
           |          // 16) % 8)) - 132)
           |        ELSE ((((255 - ascii(substr(text,
           |          CAST(((k // c) * f // 6 * c + k % c) % n + 1 AS INT), 1)))
           |          % 16) * 8 + 132) * (1 << (((255 - ascii(substr(text,
           |          CAST(((k // c) * f // 6 * c + k % c) % n + 1 AS INT), 1)))
           |          // 16) % 8)) - 132)
           |        END AS VARCHAR)), ',') AS pcm_csv
           |  FROM src
           |)
           |SELECT media_id, c AS channels, rate AS sample_rate,
           |  f AS n_frames, TRUE AS ok, CAST(6 AS INT) AS r_frames, pcm_csv
           |FROM res ORDER BY media_id""".stripMargin))

  /** COMPRESSED audio #2 — IMA ADPCM (4 bits/sample, adaptive
    * predictive): block nibbles come straight from the text's bytes
    * (low nibble first, the IMA layout), per-block initial predictor
    * and step index derive from (doc_id, block). [[AdpcmCodec]]
    * really parses the tag-0x11 container (fmt extension's
    * samplesPerBlock validated against blockAlign) and runs the
    * adaptive decoder — predictor clamp, step-index walk, sign
    * nibble — over every block. The oracle replays the SAME state
    * machine with a DuckDB `list_reduce` whose accumulator carries
    * `[samples..., stepIndex]` (the predictor IS the last emitted
    * sample), so a hash match proves the stateful decompression
    * end-to-end, not just the container walk. */
  val qMmAdpcm = QuerySpec(
    "q_llm_mm_adpcm",
    (s, d) => {
      implicit val sp: SparkSession = s
      import sp.implicits._
      val built = Tables.load(s, d, "documents").select(
        col("doc_id"),
        expr("CASE WHEN regexp_replace(coalesce(text, ''), '[^ -~]', '') = ''" +
          " THEN 'x' ELSE regexp_replace(text, '[^ -~]', '') END").as("t"))
      built.as[(Long, String)]
        .mapPartitions { rows =>
          codecScope(AdpcmCodec, rows).map { case (id, t) =>
            val nb = (1 + id % 2).toInt        // blocks
            val db = (4 + id % 4).toInt        // data bytes per block
            val blockAlign = 4 + db
            val tb = t.getBytes("UTF-8")
            val blocks = (0 until nb).map { b =>
              val pred0 = (((id * 31 + b * 17) % 65536) - 32768).toInt
              val idx0 = ((id + 13 * b) % 89).toInt
              val data = Array.tabulate[Byte](db)(
                j => tb((b * db + j) % tb.length))
              (pred0, idx0, data)
            }
            val payload = AdpcmCodec.encodeRaw(8000, blockAlign, blocks)
            val dec = AdpcmCodec.decode(id, payload)
            val samples = AdpcmCodec.parseHeader(payload) match {
              case Some((_, ba, _, off, dl)) =>
                AdpcmCodec.decodeSamples(payload, ba, off, dl)
              case None => Array.empty[Int]
            }
            (id, dec.width, dec.height, dec.n_frames, dec.ok,
              samples.mkString(","))
          }
        }
        .toDF("media_id", "channels", "sample_rate", "n_frames", "ok",
          "pcm_csv")
        .orderBy(col("media_id"))
    },
    Some {
      val stepSql = AdpcmCodec.StepTable.mkString("[", ",", "]")
      val idxSql = AdpcmCodec.IndexTable.mkString("[", ",", "]")
      s"""WITH tbl AS (
         |  SELECT $stepSql::BIGINT[] AS stp, $idxSql::BIGINT[] AS idt
         |), src AS (
         |  SELECT doc_id AS media_id,
         |    CAST(1 + doc_id % 2 AS INT) AS nb,
         |    CAST(4 + doc_id % 4 AS INT) AS db,
         |    CASE WHEN regexp_replace(coalesce(text, ''), '[^ -~]', '', 'g') = ''
         |      THEN 'x'
         |      ELSE regexp_replace(text, '[^ -~]', '', 'g') END AS text,
         |    length(CASE WHEN regexp_replace(coalesce(text, ''), '[^ -~]', '', 'g') = ''
         |      THEN 'x'
         |      ELSE regexp_replace(text, '[^ -~]', '', 'g') END) AS n
         |  FROM documents
         |), blocks AS (
         |  -- per block: nibble list from the text bytes (low first),
         |  -- then the IMA state machine via list_reduce; accumulator
         |  -- layout [s0, s1, ..., sk, idx] — predictor = acc[-2]
         |  SELECT media_id, nb, db,
         |    flatten(list_transform(range(0, nb), b ->
         |      (list_reduce(
         |        list_prepend([
         |            (media_id * 31 + b * 17) % 65536 - 32768,
         |            (media_id + 13 * b) % 89],
         |          list_transform(
         |            flatten(list_transform(range(0, db), j ->
         |              [ascii(substr(text,
         |                  CAST((b * db + j) % n + 1 AS INT), 1)) % 16,
         |               ascii(substr(text,
         |                  CAST((b * db + j) % n + 1 AS INT), 1)) // 16])),
         |            nib -> [CAST(nib AS BIGINT)])),
         |        (acc, x) -> list_concat(acc[1:len(acc)-1], [
         |          greatest(-32768, least(32767, acc[-2] +
         |            (1 - 2 * (x[1] // 8)) * ((stp[acc[-1]+1]) // 8
         |              + (x[1] % 2) * ((stp[acc[-1]+1]) // 4)
         |              + ((x[1] // 2) % 2) * ((stp[acc[-1]+1]) // 2)
         |              + ((x[1] // 4) % 2) * (stp[acc[-1]+1])))),
         |          greatest(0, least(88, acc[-1] + idt[(x[1] % 8) + 1]))]))
         |      )[1:2*db+1])) AS samples
         |  FROM src, tbl
         |)
         |SELECT media_id, CAST(1 AS INT) AS channels,
         |  CAST(8000 AS INT) AS sample_rate,
         |  CAST(nb * (2 * db + 1) AS INT) AS n_frames, TRUE AS ok,
         |  array_to_string(list_transform(samples,
         |    v -> CAST(v AS VARCHAR)), ',') AS pcm_csv
         |FROM blocks ORDER BY media_id""".stripMargin
    })

  /** COMPRESSED video — Motion-JPEG AVI: solid-color 16×16 frames
    * (colors derive from (doc_id, frame)) are REALLY JPEG-encoded
    * (JDK ImageIO, explicit quality — DCT + Huffman), wrapped in an
    * MJPG AVI, then [[MjpegCodec]] really walks the container
    * (SOI/EOI-validating every frame chunk), ImageIO-decodes the
    * first frame to cross-check geometry, and frame-samples every
    * 2nd frame through the REAL lossy decode. JPEG is lossy, so the
    * oracle takes the q_approx_distinct tolerance stance: the
    * in-plan gate binds each sampled frame's decoded channel means to
    * the expected color within ±3 (JDK solid-color round-trip error
    * measures ≤1, spec-pinned), emitting the SQL-replayable expected
    * string only when the gate holds — decode drift hash-mismatches.
    * Widths are multiples of 16 so chroma subsampling sees whole
    * MCUs. */
  val qMmMjpeg = QuerySpec(
    "q_llm_mm_mjpeg",
    (s, d) => {
      implicit val sp: SparkSession = s
      import sp.implicits._
      val built = Tables.load(s, d, "documents").select(col("doc_id"))
      built.as[Long]
        .mapPartitions { rows =>
          // availability gate (the CompressedCodecSpec assume() made
          // executable): on a JVM without java.desktop the declared
          // query reports not-ok rows instead of dying on
          // NoClassDefFoundError deep inside ImageIO
          if (!ImageIoCodec.available)
            rows.map(id => (id, 0, 0, 0, false, 0, 0, ""))
          else {
          // fixture-encode cache: every channel of the synthetic color
          // map depends only on (id mod 256, frame) — ≤ 256 × 6
          // distinct solid frames corpus-WIDE — and the JDK encoder is
          // deterministic per (pixels, quality), so caching by rgb
          // returns byte-identical payloads while cutting the
          // fixture-build ImageIO passes from n_docs × nf to ~1.5k
          // per partition (the sf10 wall was fixture-encode-bound:
          // the DECODE side already frame-samples by chunk offset)
          val encCache = new java.util.HashMap[Int, Array[Byte]]()
          codecScope(MjpegCodec, rows).map { id =>
            val nf = (2 + id % 5).toInt
            val colors = (0 until nf).map(f => (
              ((id * 37 + f * 11) % 256).toInt,
              ((id * 91 + f * 5) % 256).toInt,
              ((id * 53 + f * 29) % 256).toInt))
            val frames = colors.map { case (r, g, b) =>
              val rgb = (r << 16) | (g << 8) | b
              encCache.computeIfAbsent(rgb, { key =>
                val img = new java.awt.image.BufferedImage(16, 16,
                  java.awt.image.BufferedImage.TYPE_INT_RGB)
                var y = 0
                while (y < 16) {
                  var x = 0
                  while (x < 16) { img.setRGB(x, y, key); x += 1 }
                  y += 1
                }
                MjpegCodec.encodeJpeg(img)
              })
            }
            val payload = MjpegCodec.encode(16, 16, 40000, frames)
            val dec = MjpegCodec.decode(id, payload)
            val means = MjpegCodec.sampledFrameMeans(payload, stride = 2)
            val withinTol = means.count { case (f, mr, mg, mb) =>
              val (er, eg, eb) = colors(f)
              math.abs(mr - er) <= 3 && math.abs(mg - eg) <= 3 &&
                math.abs(mb - eb) <= 3
            }
            // expected string only when every sampled frame decoded
            // within tolerance; otherwise the actual means (which then
            // hash-mismatch the oracle's expectation)
            val sampled =
              if (withinTol == means.length)
                means.map { case (f, _, _, _) =>
                  val (er, eg, eb) = colors(f); s"$f:$er:$eg:$eb"
                }.mkString(",")
              else means.map { case (f, mr, mg, mb) => s"$f:$mr:$mg:$mb" }
                .mkString(",")
            (id, dec.width, dec.height, dec.n_frames, dec.ok,
              means.length, withinTol, sampled)
          }
          }
        }
        .toDF("media_id", "width", "height", "n_frames", "ok",
          "n_sampled", "n_within_tol", "sampled_colors")
        .orderBy(col("media_id"))
    },
    Some("""WITH src AS (
           |  SELECT doc_id AS media_id, CAST(2 + doc_id % 5 AS INT) AS nf
           |  FROM documents
           |), samp AS (
           |  SELECT media_id, nf,
           |    list_transform(range(0, nf, 2), f ->
           |      CAST(f AS VARCHAR) || ':' ||
           |      CAST((media_id * 37 + f * 11) % 256 AS VARCHAR) || ':' ||
           |      CAST((media_id * 91 + f * 5) % 256 AS VARCHAR) || ':' ||
           |      CAST((media_id * 53 + f * 29) % 256 AS VARCHAR)) AS cols
           |  FROM src
           |)
           |SELECT media_id, CAST(16 AS INT) AS width,
           |  CAST(16 AS INT) AS height, nf AS n_frames, TRUE AS ok,
           |  CAST(len(cols) AS INT) AS n_sampled,
           |  CAST(len(cols) AS INT) AS n_within_tol,
           |  array_to_string(cols, ',') AS sampled_colors
           |FROM samp ORDER BY media_id""".stripMargin))

  /** The MIXED-corpus media card: one pass over a corpus whose rows
    * span THREE formats (binary PPM images, μ-law WAVs, IMA ADPCM
    * WAVs — each built in-plan from its id class), every payload
    * dispatched row-locally to its mime's codec
    * ([[Multimodal.decodeMixed]] — all codec contexts opened once per
    * partition), rolled up to the per-mime release card
    * ([[Multimodal.mediaCard]]: counts, decode-ok, geometry totals).
    * The production shape for a real multimodal corpus scan: no
    * per-format re-scan, one bounded-cardinality groupBy. The oracle
    * replays every geometry total arithmetically per id class — a
    * hash match proves all three parsers agreed on every row. */
  val qMmCard = QuerySpec(
    "q_llm_mm_card",
    (s, d) => {
      implicit val sp: SparkSession = s
      import sp.implicits._
      val built = Tables.load(s, d, "documents").select(
        col("doc_id"),
        expr("CASE WHEN text IS NULL OR text = '' THEN 'x' ELSE text END").as("t"))
        .as[(Long, String)]
        .mapPartitions { rows =>
          rows.map { case (id, t) =>
            val tb = t.getBytes("UTF-8")
            (id % 3) match {
              case 0 =>
                val w = (1 + id % 8).toInt; val h = (1 + id % 5).toInt
                val npix = w * h * 3
                val raster = Array.tabulate[Byte](npix)(j => tb(j % tb.length))
                val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
                (id, header ++ raster, "image/x-portable-pixmap")
              case 1 =>
                val frames = (4 + id % 12).toInt
                val channels = (1 + id % 2).toInt
                val codes = Array.tabulate[Byte](frames * channels)(
                  j => tb(j % tb.length))
                (id, WavCodec.withJunkChunk(
                  MuLawCodec.encode(channels, 12000, codes)), "audio/basic")
              case _ =>
                val nb = (1 + id % 2).toInt
                val db = (4 + id % 4).toInt
                val blocks = (0 until nb).map { b =>
                  ((((id * 31 + b * 17) % 65536) - 32768).toInt,
                    ((id + 13 * b) % 89).toInt,
                    Array.tabulate[Byte](db)(j => tb((b * db + j) % tb.length)))
                }
                (id, AdpcmCodec.encodeRaw(8000, 4 + db, blocks),
                  "audio/vnd.ima-adpcm")
            }
          }
        }.toDF("media_id", "payload", "mime")
      val decoded = Multimodal.decodeMixed(built, Map(
        "image/x-portable-pixmap" -> PpmCodec,
        "audio/basic" -> MuLawCodec,
        "audio/vnd.ima-adpcm" -> AdpcmCodec))
      Multimodal.mediaCard(decoded).orderBy(col("mime"))
    },
    Some("""WITH src AS (
           |  SELECT doc_id AS media_id, doc_id % 3 AS cls FROM documents
           |), per AS (
           |  SELECT media_id,
           |    CASE cls WHEN 0 THEN 'image/x-portable-pixmap'
           |             WHEN 1 THEN 'audio/basic'
           |             ELSE 'audio/vnd.ima-adpcm' END AS mime,
           |    CASE cls WHEN 0 THEN 1
           |             WHEN 1 THEN 4 + media_id % 12
           |             ELSE (1 + media_id % 2) * (2 * (4 + media_id % 4) + 1)
           |             END AS frames,
           |    CASE cls WHEN 0 THEN 1 + media_id % 8
           |             WHEN 1 THEN 1 + media_id % 2
           |             ELSE 1 END AS w,
           |    CASE cls WHEN 0 THEN 1 + media_id % 5
           |             WHEN 1 THEN 12000
           |             ELSE 8000 END AS h
           |  FROM src
           |)
           |SELECT mime, count(*) AS n_media, count(*) AS n_ok,
           |  CAST(sum(frames) AS BIGINT) AS total_frames,
           |  CAST(sum(w) AS BIGINT) AS total_width,
           |  CAST(sum(h) AS BIGINT) AS total_height
           |FROM per GROUP BY mime ORDER BY mime""".stripMargin))

  val all: Seq[QuerySpec] = Seq(qMmMulaw, qMmAdpcm, qMmMjpeg, qMmCard)
}

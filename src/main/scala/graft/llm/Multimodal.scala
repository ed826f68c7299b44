package graft.llm

import graft.Tables
import graft.queries.QuerySpec
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed per-partition in
  * batches. The actual codec work (JPEG decode, audio resample, video
  * frame extraction) is STUBBED — this container has no media
  * libraries — behind [[decodeStub]], a deterministic fake keyed on the
  * payload hash. Everything around the stub (schema, batched
  * per-partition execution, metadata extraction, partitioning) is real
  * and is what matters at 100 TB: payloads never pass through a
  * shuffle; only extracted features do.
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

  /** STUB decoder — deterministic fake in place of a real codec.
    *
    * Real implementation would decode `payload` with an image/audio
    * library inside this same per-partition batch loop (so one JVM-side
    * codec context is reused across a partition's rows, the batch shape
    * a Python `mapInPandas` pipeline would also use). The fake derives
    * plausible dimensions from the payload bytes so tests can pin
    * determinism end-to-end.
    */
  def decodeStub(media: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val decoded = media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition "codec context" init would go here (real impl)
        rows.map { case (id, payload) =>
          if (payload == null || payload.isEmpty) DecodedMeta(id, 0, 0, 0, ok = false)
          else {
            // ??? real codec goes here; deterministic fake below
            val h = java.util.Arrays.hashCode(payload)
            DecodedMeta(id, 16 + math.floorMod(h, 1024), 16 + math.floorMod(h >> 10, 1024),
              1 + math.floorMod(h >> 20, 32), ok = true)
          }
        }
      }
    decoded.toDF()
  }

  /** Deterministic frame sampling plumbing: pick every k-th frame index
    * from a decoded frame count — pure expression, no codec. */
  def sampleFrameIdx(nFrames: Column, stride: Int): Column =
    filter(sequence(lit(0), greatest(nFrames - 1, lit(0))),
      i => pmod(i, lit(stride)) === 0 && nFrames > 0)

  /** Resized-frame output of the (stubbed) resize kernel. */
  case class ResizedMeta(media_id: Long, width: Int, height: Int,
      payload: Array[Byte], ok: Boolean)

  /** STUB resize — real impl would decode, scale to (targetW, targetH)
    * preserving the batch loop, and re-encode. The fake passes the
    * payload through and rewrites dimensions, keeping the Spark shape
    * (binary in → binary out, per-partition batches) real. */
  def resizeStub(media: DataFrame, targetW: Int, targetH: Int)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition codec/scaler context init would go here
        rows.map { case (id, payload) =>
          if (payload == null || payload.isEmpty)
            ResizedMeta(id, 0, 0, Array.emptyByteArray, ok = false)
          else ResizedMeta(id, targetW, targetH, /* ??? re-encode */ payload, ok = true)
        }
      }.toDF()
  }

  /** STUB feature extraction — real impl would run an image/audio
    * encoder over the decoded media in this same batch loop (one model
    * context per partition, the shape a `mapInPandas` batch would
    * take). The fake derives a deterministic unit-norm vector from the
    * payload bytes so downstream similarity plumbing (cosine top-k,
    * sign-LSH over these vectors) is testable end-to-end. */
  def extractFeaturesStub(media: DataFrame, dim: Int = 16)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition model load would go here (real impl)
        rows.map { case (id, payload) =>
          val bytes = if (payload == null) Array.emptyByteArray else payload
          val raw = Array.tabulate(dim) { d =>
            // ??? real encoder goes here; deterministic fake below
            var h = 1125899906842597L + d
            bytes.foreach(b => h = h * 31 + b)
            ((h % 1000).toFloat / 1000f) - 0.5f
          }
          val n = math.sqrt(raw.map(x => x.toDouble * x).sum).toFloat
          (id, if (n == 0f) raw.toSeq else raw.map(_ / n).toSeq)
        }
      }.toDF("media_id", "embedding")
  }

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

  val all: Seq[QuerySpec] = Seq(qMultimodalMeta, qMultimodalDecode)
}

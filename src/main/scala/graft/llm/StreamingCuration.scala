package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The curation core under Structured Streaming: a continuous document
  * feed (crawl output, upload queue) deduped and accounted as it
  * arrives, instead of in nightly batches. Same operators as the batch
  * path — content-hash identity, token counting — lifted onto streams
  * with watermarked state so a 24/7 pipeline's dedup memory is bounded
  * by the lateness horizon, not the corpus.
  *
  * Scale shape: the dedup state key is the 32-byte content digest
  * (never the text); state lives `watermark` long and is dropped by
  * the engine afterwards — the same bounded-state discipline the CT
  * ingest's E2 TTL applies, here with arrival-time bounds because
  * documents (unlike certificates) carry no domain expiry.
  */
object StreamingCuration {

  /** Content identity for state: the batch exact-dedup digest
    * (TextDedup.contentHashHex — one shared definition) in its binary
    * form, so each state-store key really is 32 bytes, not 64 hex
    * chars. */
  def contentHash(text: Column): Column = unhex(TextDedup.contentHashHex(text))

  /** Streaming exact dedup: emit each distinct content hash's FIRST
    * document, suppress duplicates arriving within the watermark
    * horizon. `dropDuplicatesWithinWatermark` keeps state only
    * `watermark` long — a duplicate arriving later than the horizon is
    * re-emitted (at-least-once dedup, the "gentle collision" stance);
    * the batch keep-list / compaction restores exactness downstream. */
  def streamingExactDedup(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("text_hash", contentHash(col("text")))
      .withWatermark("event_ts", watermark)
      .dropDuplicatesWithinWatermark("text_hash")

  /** Tumbling-window ingest accounting per source: docs and exact token
    * sums per (window, source) — the continuous form of the batch
    * q_llm_tokens rollup. Partial aggregation compresses map-side; the
    * watermark closes windows so state drains. */
  def tokenRates(docs: DataFrame, windowLen: String = "1 hour",
      watermark: String = "1 hour"): DataFrame =
    docs
      .withWatermark("event_ts", watermark)
      .groupBy(window(col("event_ts"), windowLen), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(TextAnalysis.tokens(col("text")))).cast("long").as("n_tokens"))
      .select(col("window.start").as("window_start"), col("source"),
        col("n_docs"), col("n_tokens"))
}

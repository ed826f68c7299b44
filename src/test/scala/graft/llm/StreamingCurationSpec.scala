package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming curation: exact dedup and token accounting over a
  * continuous document feed, exercised through MemoryStream micro-
  * batches so watermark/state behavior is real, not simulated. */
class StreamingCurationSpec extends SparkSpec {
  import spark.implicits._

  private case class Doc(doc_id: Long, event_ts: java.sql.Timestamp,
      source: String, text: String)
  private def doc(id: Long, minute: Int, source: String, text: String) =
    Doc(id, new java.sql.Timestamp(minute * 60000L), source, text)

  test("streaming exact dedup emits first occurrence, suppresses in-horizon dups") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Doc]
    val q = StreamingCuration.streamingExactDedup(in.toDF(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("sdedup")
      .outputMode("append").start()
    try {
      in.addData(
        doc(1, 0, "a", "same text"),
        doc(2, 1, "b", "same text"),       // duplicate content, other source
        doc(3, 2, "a", "other text"))
      q.processAllAvailable()
      in.addData(doc(4, 3, "c", "same text"))  // still within horizon
      q.processAllAvailable()
      val ids = spark.table("sdedup").select(col("doc_id"))
        .collect().map(_.getLong(0)).sorted.toSeq
      // within one micro-batch the surviving duplicate is engine-order
      // (either 1 or 2, exactly one); across batches state suppresses 4
      assert(ids.length == 2 && ids.contains(3L) &&
        (ids.contains(1L) ^ ids.contains(2L)) && !ids.contains(4L),
        s"one copy per content + cross-batch suppression: $ids")
    } finally q.stop()
  }

  test("tokenRates aggregates per closed (window, source) with exact sums") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Doc]
    val q = StreamingCuration.tokenRates(in.toDF(),
      windowLen = "10 minutes", watermark = "5 minutes")
      .writeStream.format("memory").queryName("srates")
      .outputMode("append").start()
    try {
      in.addData(
        doc(1, 0, "a", "one two three"),   // window [0, 10): 3 tokens
        doc(2, 4, "a", "four five"),       // same window: +2
        doc(3, 5, "b", "x"))               // same window, other source
      q.processAllAvailable()
      // advance the watermark far enough to close the first window
      in.addData(doc(9, 30, "a", "later"))
      q.processAllAvailable()
      val rows = spark.table("srates")
        .select(col("source"), col("n_docs"), col("n_tokens"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(rows == Set(("a", 2L, 5L), ("b", 1L, 1L)), rows.toString)
    } finally q.stop()
  }
}

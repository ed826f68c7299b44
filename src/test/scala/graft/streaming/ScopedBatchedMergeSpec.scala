package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The batched scoped merge (mergeScopedBatchPartitioned) must be
  * content-identical per scope to the pooled per-scope form across
  * multi-day merges, duplicate/overlap deltas, empty-text documents,
  * and committed replays — it collapses ~5 jobs × N scopes into a
  * constant job count, and this spec is the license for that swap. */
class ScopedBatchedMergeSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(n: String) =
    java.nio.file.Files.createTempDirectory(n).toString

  private def batchOf(rows: (Long, String, String)*): DataFrame =
    rows.toDF("doc_id", "text", "scope")

  private def scopeContent(root: String, attr: String)
      : Map[String, (Seq[(String, Long, Long, Long)], Seq[(String, Long)],
        Seq[Long])] =
    NightlyMaintenance.scopesOf(root, attr).map { v =>
      val seg = NightlyMaintenance.readScope(spark, root, attr, v).get
      v -> (
        seg.postings.select("term", "doc_id", "tf", "dl")
          .as[(String, Long, Long, Long)].collect().toSeq.sorted,
        seg.df.select("term", "df").as[(String, Long)]
          .collect().toSeq.sorted,
        seg.docIds.as[Long].collect().toSeq.sorted)
    }.toMap

  test("batched partitioned scoped merge == pooled per-scope merge " +
    "(multi-day, overlaps, empty text, replay no-op)") {
    val pooled = tmp("sb_pooled")
    val batched = tmp("sb_batched")
    val day1 = batchOf(
      (1L, "a b a", "en"), (2L, "b c", "en"),
      (3L, "x y", "de"), (4L, "", "de"), // empty text still indexes
      (5L, "m n m", "fr"),
      (5L, "dup row ignored", "fr")) // duplicate id inside the batch
    val day2 = batchOf(
      (2L, "already stored - must not re-index", "en"),
      (6L, "c d", "en"),
      (7L, "z", "ja")) // brand-new scope on day 2
    Seq(day1, day2).zipWithIndex.foreach { case (b, i) =>
      NightlyMaintenance.mergeScopedBatch(pooled, "scope")(b, i.toLong)
      NightlyMaintenance.mergeScopedBatchPartitioned(batched, "scope")(
        b, i.toLong)
    }
    val want = scopeContent(pooled, "scope")
    val got = scopeContent(batched, "scope")
    assert(got.keySet == want.keySet, s"${got.keySet} vs ${want.keySet}")
    want.keySet.foreach { v =>
      assert(got(v) == want(v), s"scope $v drifted:\n${got(v)}\nvs\n${want(v)}")
    }
    assert(want("de")._3.contains(4L), "empty-text doc must reach the manifest")

    // committed replay is a no-op in both forms
    NightlyMaintenance.mergeScopedBatchPartitioned(batched, "scope")(
      day1, 0L)
    assert(scopeContent(batched, "scope") == got, "replay changed state")

    // compaction + pin semantics are inherited per scope: fold one
    // scope's log and the serving view is unchanged
    val en = NightlyMaintenance.scopeDir(batched, "scope", "en")
    IndexMaintenance.compact(spark, en)
    assert(scopeContent(batched, "scope")("en") == got("en"),
      "compaction changed the batched scope's content")
  }

  test("batched scoped merge: unsafe attribute values fall back to the " +
    "pooled form and stay content-identical") {
    val pooled = tmp("sb_pooled2")
    val batched = tmp("sb_batched2")
    val b = batchOf((1L, "a b", "en/US"), (2L, "c", "plain"))
    NightlyMaintenance.mergeScopedBatch(pooled, "scope")(b, 0L)
    NightlyMaintenance.mergeScopedBatchPartitioned(batched, "scope")(b, 0L)
    assert(scopeContent(batched, "scope") == scopeContent(pooled, "scope"))
  }
}

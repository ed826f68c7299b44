package graft.streaming

import graft.llm.{IndexSegments, Retrieval, TempCache}
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming nightly index maintenance: the unified (BM25 +
  * positional) segment merge driven from an ingest stream via
  * `foreachBatch` — each micro-batch becomes one committed index
  * GENERATION, so the long-lived serving index is maintained by the
  * same delta-only economics as the batch [[Retrieval.segMerge]]
  * (reference resume economics: ct-fetch.go:288-305 re-fetches only
  * past its checkpoint; here the index re-tokenizes only never-seen
  * docs).
  *
  * Layout (`root/gen=<batchId>/{postings,df,doc_ids}` + `_COMMITTED`):
  *  - `postings`: the generation's FRESH rows only — append-only
  *    across generations, earlier generations are never read by the
  *    merge (only the manifest and the vocab df table are);
  *  - `df`: the merged FULL vocab-sized (term, df) table — the latest
  *    committed generation's copy supersedes all earlier ones;
  *  - `doc_ids`: the generation's fresh manifest ids.
  *
  * Exactly-once without a transaction log: the `_COMMITTED` marker is
  * written LAST, readers ([[read]]) see only marked generations, and
  * a replayed batchId is (a) a full no-op when its marker exists —
  * the crash landed after the marker, before the checkpoint commit —
  * or (b) recomputed byte-identically over the same pre-state when it
  * doesn't, because the uncommitted generation was invisible to
  * [[read]] (the crash landed between data writes and the marker).
  * Within a batch, upstream at-least-once duplicates collapse via
  * `dropDuplicates(doc_id)` and already-indexed docs via the manifest
  * anti join ([[Retrieval.segMergeParts]]'s probe).
  * RetrievalStreamSpec pins both crash legs and stream == batch.
  *
  * At warehouse scale, a generation is one bounded nightly delta;
  * accumulated small `postings` generations can be folded by a
  * background rewrite (the Lucene merge-policy move) without touching
  * this protocol — readers always union committed generations.
  */
object IndexMaintenance {

  private def genDir(root: String, id: Long) = f"$root/gen=$id%020d"
  private def marker(root: String, id: Long) =
    new java.io.File(genDir(root, id), "_COMMITTED")

  /** Committed generation ids, ascending. */
  def committedGens(root: String): Seq[Long] = {
    val d = new java.io.File(root)
    if (!d.isDirectory) Seq.empty
    else d.listFiles().toSeq.map(_.getName).filter(_.startsWith("gen="))
      .map(_.stripPrefix("gen=").toLong).filter(marker(root, _).exists())
      .sorted
  }

  /** The serving view of the maintained index: postings and manifest
    * are the union of all committed generations' deltas, df is the
    * latest generation's full table. None before the first commit. */
  def read(spark: SparkSession, root: String): Option[IndexSegments] = {
    val gens = committedGens(root)
    if (gens.isEmpty) None
    else Some(IndexSegments(
      spark.read.parquet(gens.map(g => s"${genDir(root, g)}/postings"): _*),
      spark.read.parquet(s"${genDir(root, gens.max)}/df"),
      spark.read.parquet(gens.map(g => s"${genDir(root, g)}/doc_ids"): _*)))
  }

  /** One micro-batch = one generation. Public for direct replay in
    * specs — `foreachBatch` calls exactly this. */
  def mergeBatch(root: String, positional: Boolean = true)
      (batch: DataFrame, batchId: Long): Unit = {
    if (marker(root, batchId).exists()) return // committed replay: no-op
    val spark = batch.sparkSession
    val docs = batch.select(col("doc_id"), col("text"))
      .dropDuplicates("doc_id")
    val temps = new TempCache
    try {
      val gen = read(spark, root) match {
        case Some(stored) =>
          Retrieval.segMergeGen(stored, docs, temps, positional)
        case None =>
          if (positional) Retrieval.segBuildUnified(docs, temps)
          else Retrieval.segBuild(docs, temps)
      }
      val dir = genDir(root, batchId)
      gen.postings.write.mode("overwrite").parquet(s"$dir/postings")
      gen.df.write.mode("overwrite").parquet(s"$dir/df")
      gen.docIds.write.mode("overwrite").parquet(s"$dir/doc_ids")
      val m = marker(root, batchId)
      assert(m.createNewFile() || m.exists(), s"marker write failed: $m")
      // a replay overwrites this generation's files in place; drop any
      // cached file listings so long-lived serving sessions (and the
      // next merge) see the rewritten generation, not stale part files
      spark.catalog.refreshByPath(dir)
    } finally temps.release()
  }

  /** Drive the maintenance from a streaming document feed. AvailableNow
    * by default — the nightly catch-up trigger (J3's stance): drain
    * everything available, commit, stop. */
  def start(docsStream: DataFrame, root: String, checkpoint: String,
      positional: Boolean = true,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docsStream.writeStream
      .foreachBatch((b: Dataset[Row], id: Long) =>
        mergeBatch(root, positional)(b.toDF(), id))
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
}

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
  * Accumulated small generations are folded by [[compact]] (the
  * Lucene merge-policy move) into a `cgen=<throughId>` dir holding
  * the full state through that batchId. The protocol stays monotone
  * and crash-safe: readers base on the LATEST committed cgen and
  * union only generations beyond it, so an uncommitted compaction is
  * simply invisible and superseded generation dirs are garbage that
  * can be deleted at leisure (compact deletes them after its marker
  * lands, but correctness never depends on the delete).
  */
object IndexMaintenance {

  private def genDir(root: String, id: Long) = f"$root/gen=$id%020d"
  private def cgenDir(root: String, id: Long) = f"$root/cgen=$id%020d"
  private def marker(dir: String) = new java.io.File(dir, "_COMMITTED")

  private def listIds(root: String, prefix: String): Seq[Long] = {
    val d = new java.io.File(root)
    if (!d.isDirectory) Seq.empty
    else d.listFiles().toSeq.map(_.getName).filter(_.startsWith(prefix))
      .map(_.stripPrefix(prefix).toLong)
      .filter(id => marker(s"$root/$prefix${"%020d".format(id)}").exists())
      .sorted
  }

  /** Committed generation ids, ascending (compacted-away gens are
    * deleted by [[compact]] and drop out naturally). */
  def committedGens(root: String): Seq[Long] = listIds(root, "gen=")

  /** Committed compaction ids (each holds the FULL state through that
    * batchId), ascending. */
  def committedCgens(root: String): Seq[Long] = listIds(root, "cgen=")

  /** The current state's constituent dirs: (postings+manifest dirs to
    * union, the dir holding the authoritative df). Base = the latest
    * committed compaction, if any; plus every generation beyond it. */
  private def stateDirs(root: String): Option[(Seq[String], String)] = {
    val cg = committedCgens(root)
    val base = cg.lastOption.map(cgenDir(root, _)).toSeq
    val tail = committedGens(root).filter(g => cg.lastOption.forall(g > _))
      .map(genDir(root, _))
    val all = base ++ tail
    if (all.isEmpty) None else Some((all, all.last))
  }

  /** The serving view of the maintained index: postings and manifest
    * are the union of the latest compaction (if any) and the
    * generation deltas beyond it; df is the newest dir's full table.
    * None before the first commit. */
  def read(spark: SparkSession, root: String): Option[IndexSegments] =
    stateDirs(root).map { case (dirs, latest) =>
      IndexSegments(
        spark.read.parquet(dirs.map(d => s"$d/postings"): _*),
        spark.read.parquet(s"$latest/df"),
        spark.read.parquet(dirs.map(d => s"$d/doc_ids"): _*))
    }

  /** Fold every committed dir into one `cgen=<throughId>` holding the
    * full state — the Lucene segment merge. Crash-safe by the same
    * marker monotonicity as [[mergeBatch]]: until the cgen marker
    * lands the compaction is invisible; after it lands the superseded
    * dirs are garbage (never load-bearing). No-op when the state is
    * already a single dir.
    *
    * GC AND LIVE READERS: deleting superseded dirs invalidates
    * [[graft.llm.IndexSegments]] handles a reader obtained from
    * [[read]] BEFORE the compaction (lazy frames hold the old paths)
    * — safe for the nightly batch cadence where readers re-[[read]]
    * per job, but a serving tier holding long-lived handles should
    * pass `gcSuperseded = false` and run [[gcSupersededDirs]] in its
    * own maintenance window, after re-resolving readers. */
  def compact(spark: SparkSession, root: String,
      gcSuperseded: Boolean = true): Unit = {
    val latestCg = committedCgens(root).lastOption
    val tailGens = committedGens(root).filter(g => latestCg.forall(g > _))
    if (tailGens.isEmpty) {
      // nothing to fold — but an earlier compaction may have crashed
      // between its marker and its GC, so finish the GC it promised
      if (gcSuperseded) latestCg.foreach(gcThrough(root, _))
      return
    }
    if (latestCg.isEmpty && tailGens.length == 1) return // already one dir
    // fold into a cgen named after the newest TAIL generation: always
    // strictly beyond any committed cgen, so a crashed-GC retry never
    // overwrites the cgen it is reading from
    val throughId = tailGens.max
    val state = read(spark, root).get
    val dir = cgenDir(root, throughId)
    state.postings.write.mode("overwrite").parquet(s"$dir/postings")
    state.df.write.mode("overwrite").parquet(s"$dir/df")
    state.docIds.write.mode("overwrite").parquet(s"$dir/doc_ids")
    val m = marker(dir)
    assert(m.createNewFile() || m.exists(), s"marker write failed: $m")
    spark.catalog.refreshByPath(dir)
    if (gcSuperseded) gcThrough(root, throughId)
  }

  /** Collect everything the LATEST committed compaction supersedes —
    * the deferred-GC half of `compact(gcSuperseded = false)`. */
  def gcSupersededDirs(root: String): Unit =
    committedCgens(root).lastOption.foreach(gcThrough(root, _))

  /** GC everything the committed `cgen=<throughId>` supersedes: older
    * cgens and ALL generations ≤ throughId — including generations an
    * earlier interrupted GC left behind. Correctness never depends on
    * these deletes landing (readers base on the latest cgen), so a
    * crash anywhere in here just leaves garbage for the next call. */
  private def gcThrough(root: String, throughId: Long): Unit = {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    val garbage =
      committedCgens(root).filter(_ < throughId).map(cgenDir(root, _)) ++
        committedGens(root).filter(_ <= throughId).map(genDir(root, _))
    garbage.foreach(d => rm(new java.io.File(d)))
  }

  /** One micro-batch = one generation. Public for direct replay in
    * specs — `foreachBatch` calls exactly this. */
  def mergeBatch(root: String, positional: Boolean = true)
      (batch: DataFrame, batchId: Long): Unit = {
    // committed replay: no-op — either the generation's own marker
    // stands, or a later compaction has folded (and GC'd) it
    if (marker(genDir(root, batchId)).exists() ||
      committedCgens(root).lastOption.exists(_ >= batchId)) return
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
      val m = marker(dir)
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

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
  * or (b) recomputed over the same pre-state when it doesn't, because
  * the uncommitted generation was invisible to [[read]] (the crash
  * landed between data writes and the marker). Within a batch,
  * upstream at-least-once duplicates collapse via
  * `dropDuplicates(doc_id)` — and the deduped frame is
  * `localCheckpoint`ed before the three artifact writes fan out, so a
  * lost-and-recomputed cache block can never re-elect a DIFFERENT
  * survivor between the postings and doc_ids jobs (the one
  * nondeterminism that could make a single generation internally
  * inconsistent). Already-indexed docs drop via the manifest anti
  * join ([[Retrieval.segMergeParts]]'s probe).
  * RetrievalStreamSpec pins both crash legs and stream == batch.
  *
  * All commit-protocol I/O (markers, generation listings, GC) goes
  * through Hadoop's [[FileSystem]] resolved from the root path, so
  * the exactly-once contract holds wherever Spark can write — local
  * disk, HDFS, or an object store with atomic single-object PUTs and
  * strongly consistent listings (S3 since 2020). Only the marker
  * create is required to be atomic; generation data files never need
  * renames (the [[ManifestStore]] stance).
  *
  * Accumulated small generations are folded by [[compact]] (the
  * Lucene merge-policy move) into a `cgen=<throughId>` dir holding
  * the full state through that batchId. The protocol stays monotone
  * and crash-safe: readers base on the LATEST committed cgen and
  * union only generations beyond it, so an uncommitted compaction is
  * simply invisible and superseded generation dirs are garbage that
  * can be deleted at leisure — by default they are NOT deleted
  * (`gcSuperseded = false`), because a long-lived serving session's
  * lazily-evaluated [[read]] handles still reference them; run
  * [[gcSupersededDirs]] in a maintenance window after re-resolving
  * readers, or opt into immediate GC when readers are known to be
  * per-job (the nightly batch cadence).
  */
object IndexMaintenance {

  import GenerationLog.{genDir, cgenDir, fsOf, marker, commitMarker,
    stateDirs, gcThrough}

  /** Committed generation ids, ascending (compacted-away gens are
    * deleted by GC and drop out naturally). */
  def committedGens(root: String): Seq[Long] =
    GenerationLog.committedGens(root)

  /** Committed compaction ids (each holds the FULL state through that
    * batchId), ascending. */
  def committedCgens(root: String): Seq[Long] =
    GenerationLog.committedCgens(root)

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

  /** The serving view PINNED to coverage point `throughId` — the
    * index as-of that batch (a later merge only adds ids beyond it,
    * so an evaluation run against a pinned point is reproducible
    * under concurrent maintenance). Valid while retention keeps the
    * pinned dirs: the deferred-GC default preserves superseded
    * generations until a [[gcSupersededDirs]] maintenance window, so
    * pin evaluation points within the retention cadence. None when
    * nothing ≤ throughId is committed. */
  def readAt(spark: SparkSession, root: String,
      throughId: Long): Option[IndexSegments] =
    GenerationLog.stateDirsAt(root, throughId).map { case (dirs, latest) =>
      IndexSegments(
        spark.read.parquet(dirs.map(d => s"$d/postings"): _*),
        spark.read.parquet(s"$latest/df"),
        spark.read.parquet(dirs.map(d => s"$d/doc_ids"): _*))
    }

  /** Read amplification of the current state: how many committed dirs
    * a serving [[read]] unions — the number [[compact]] resets to 1.
    * The size-tiered trigger ([[start]]'s `compactEvery`) bounds it. */
  def readAmplification(root: String): Int =
    stateDirs(root).map(_._1.size).getOrElse(0)

  /** Fold every committed dir into one `cgen=<throughId>` holding the
    * full state — the Lucene segment merge. Crash-safe by the same
    * marker monotonicity as [[mergeBatch]]: until the cgen marker
    * lands the compaction is invisible; after it lands the superseded
    * dirs are garbage (never load-bearing). No-op when the state is
    * already a single dir.
    *
    * GC AND LIVE READERS: deleting superseded dirs invalidates
    * [[graft.llm.IndexSegments]] handles a reader obtained from
    * [[read]] BEFORE the compaction (lazy frames hold the old paths),
    * so the DEFAULT defers GC — a reader pinned to the pre-compaction
    * generation set keeps serving against intact files while the
    * compaction commits (spec-pinned), and [[gcSupersededDirs]] runs
    * in a maintenance window after readers re-resolve. Pass
    * `gcSuperseded = true` only where readers are known to be per-job
    * (the nightly batch cadence). */
  def compact(spark: SparkSession, root: String,
      gcSuperseded: Boolean = false): Unit =
    GenerationLog.compactWith(root, gcSuperseded) { (_, dir) =>
      // fold through read() (not the dirs param) so the df side keeps
      // its newest-dir-wins semantics
      val state = read(spark, root).get
      // REBALANCE before each artifact write (guide §6) — see
      // [[mergeBatch]]: output files sized by AQE, not by the
      // shuffle-partition count of whatever plan produced the frame
      state.postings.hint("rebalance")
        .write.mode("overwrite").parquet(s"$dir/postings")
      state.df.hint("rebalance").write.mode("overwrite").parquet(s"$dir/df")
      state.docIds.hint("rebalance")
        .write.mode("overwrite").parquet(s"$dir/doc_ids")
      spark.catalog.refreshByPath(dir)
    }

  /** Collect everything the LATEST committed compaction supersedes —
    * the deferred-GC half of the default `compact()`. Run it after
    * serving readers have re-[[read]] past the compaction. */
  def gcSupersededDirs(root: String): Unit =
    committedCgens(root).lastOption.foreach(gcThrough(root, _))

  /** One micro-batch = one generation. Public for direct replay in
    * specs — `foreachBatch` calls exactly this.
    *
    * The delta-id manifest probe auto-selects its join strategy from
    * the ACTUAL batch size (the count is free: the deduped frame is
    * already localCheckpointed): a bounded nightly delta (≤
    * `maxBroadcastDelta` rows) force-broadcasts the id set — zero
    * stored-side shuffle, the nightly contract — while a large
    * catch-up batch (e.g. AvailableNow draining a long backlog after
    * the first generation exists) degrades to a planner-chosen
    * shuffled anti join instead of failing outright on the broadcast
    * size limit. Callers who want bounded batches end-to-end should
    * also bound the SOURCE (maxFilesPerTrigger / maxOffsetsPerTrigger
    * -style source options), which keeps every generation
    * delta-sized. */
  def mergeBatch(root: String, positional: Boolean = true,
      maxBroadcastDelta: Long = 4000000L)
      (batch: DataFrame, batchId: Long): Unit = {
    // committed replay: no-op — either the generation's own marker
    // stands, or a later compaction has folded (and GC'd) it
    if (fsOf(root).exists(marker(genDir(root, batchId))) ||
      committedCgens(root).lastOption.exists(_ >= batchId)) return
    val spark = batch.sparkSession
    // localCheckpoint pins the dropDuplicates survivor choice: the
    // three artifact writes below are separate jobs, and recomputing a
    // lost cache block could otherwise pick a different survivor for
    // a duplicate id carrying different text — postings/df/doc_ids
    // would disagree WITHIN one committed generation
    val docs = batch.select(col("doc_id"), col("text"))
      .dropDuplicates("doc_id")
      .localCheckpoint()
    val boundedDelta = docs.count() <= maxBroadcastDelta
    val temps = new TempCache
    try {
      val gen = read(spark, root) match {
        case Some(stored) =>
          Retrieval.segMergeGen(stored, docs, temps, positional,
            boundedDelta)
        case None =>
          if (positional) Retrieval.segBuildUnified(docs, temps)
          else Retrieval.segBuild(docs, temps)
      }
      val dir = genDir(root, batchId)
      // REBALANCE before each artifact write (guide §6): a nightly
      // delta otherwise lands as shuffle-partition-many micro files
      // (32 × ~15 KB per generation at the bench tier — measured) and
      // EVERY later serve of EVERY generation pays the per-file
      // open/footer cost. AQE coalesces the rebalance exchange to
      // advisoryPartitionSizeInBytes — one file for a tiny delta,
      // ~64 MB files for a production one. Content unchanged: the
      // survivor choice is already pinned by the localCheckpoint above.
      gen.postings.hint("rebalance")
        .write.mode("overwrite").parquet(s"$dir/postings")
      gen.df.hint("rebalance").write.mode("overwrite").parquet(s"$dir/df")
      gen.docIds.hint("rebalance")
        .write.mode("overwrite").parquet(s"$dir/doc_ids")
      commitMarker(fsOf(root), dir)
      // a replay overwrites this generation's files in place; drop any
      // cached file listings so long-lived serving sessions (and the
      // next merge) see the rewritten generation, not stale part files
      spark.catalog.refreshByPath(dir)
    } finally temps.release()
  }

  /** The size-tiered merge-policy trigger: fold when more than
    * `maxTailGens` generations have accumulated since the last
    * compaction (deferred GC — the [[compact]] default). ONE
    * definition shared by [[start]] and external drivers (the soak
    * harness), so the policy cannot drift. */
  def maybeCompact(spark: SparkSession, root: String,
      maxTailGens: Int): Unit = {
    val lastCg = committedCgens(root).lastOption
    if (committedGens(root).count(g => lastCg.forall(g > _)) > maxTailGens)
      compact(spark, root)
  }

  /** Drive the maintenance from a streaming document feed. AvailableNow
    * by default — the nightly catch-up trigger (J3's stance): drain
    * everything available, commit, stop.
    *
    * `compactEvery = Some(n)` is the size-tiered merge policy: after a
    * batch commits, if more than `n` generations have accumulated
    * since the last compaction, fold them — so serving read
    * amplification ([[readAmplification]]) stays ≤ n+1 regardless of
    * how many micro-batches the stream has committed. Compaction here
    * defers GC (the [[compact]] default): concurrent serving readers
    * keep their pinned generation sets; schedule [[gcSupersededDirs]]
    * separately. A compaction interrupted by a crash is invisible
    * (no cgen marker) and simply retried after the next batch. */
  def start(docsStream: DataFrame, root: String, checkpoint: String,
      positional: Boolean = true,
      trigger: Trigger = Trigger.AvailableNow(),
      compactEvery: Option[Int] = None,
      maxBroadcastDelta: Long = 4000000L): StreamingQuery =
    docsStream.writeStream
      .foreachBatch { (b: Dataset[Row], id: Long) =>
        mergeBatch(root, positional, maxBroadcastDelta)(b.toDF(), id)
        for (n <- compactEvery) maybeCompact(b.sparkSession, root, n)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
}

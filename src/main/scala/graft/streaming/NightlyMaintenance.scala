package graft.streaming

import graft.llm.{IvfPqIndex, Retrieval}
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** THE nightly job a serving deployment schedules: one curated
  * document stream drives a committed generation into EVERY index
  * family — BM25 segments, the positional index, the unified
  * (BM25+positional) index, and the IVF-PQ code table — then spends
  * one SHARED compaction budget across the stores, so the operator
  * schedules a single maintenance loop instead of four drifting ones
  * (the reference's one ct-fetch daemon owning every log's
  * checkpoint, ct-fetch.go:288-305, applied to index maintenance).
  *
  * Each store keeps its own [[GenerationLog]] root and its own
  * exactly-once markers, so the fan-out is NOT transactional across
  * stores — and does not need to be: a crash between store A's commit
  * and store B's commit replays the batch, A no-ops on its marker, B
  * recomputes the identical generation over its identical pre-state
  * (the per-store replay contract RetrievalStreamSpec pins). The
  * batch is deduplicated and `localCheckpoint`ed ONCE here, so every
  * store sees the same survivor rows — cross-store consistency within
  * a batch comes from pinning the input, not from coordination.
  *
  * Scale shape: each store's merge is delta-sized (manifest anti join
  * + fresh-rows-only tokenize/encode — the [[IndexMaintenance]] and
  * [[IvfPqIndex.mergeCodesBatch]] economics); the fan-out multiplies
  * the nightly cost by the number of families, never by corpus size.
  * The shared budget bounds TOTAL read amplification across stores:
  * the window folds the longest tails first until the sum of tail
  * generations fits the budget, so serving reads stay bounded even
  * when the families accumulate at different rates.
  */
object NightlyMaintenance {

  /** The maintained roots. `codes` is an EPOCHAL root
    * ([[IvfPqIndex.initEpochal]] must have opened epoch 0 with the
    * trained quantizer before the stream starts — training needs a
    * corpus sample, which is a batch decision, not a streaming one).
    * `scoped` (round 12) optionally adds the attribute-SCOPED BM25
    * family as a fifth maintained store: (root, attr) — one
    * independent segment log per scope value under the root
    * ([[mergeScopedBatch]]); the batch must then carry the attr
    * column. */
  final case class Stores(bm25: String, positional: String,
      unified: String, codes: String,
      scoped: Option[(String, String)] = None)

  /** One micro-batch = one committed generation in each store. The
    * batch must carry `doc_id`, `text`, and `embedding` (the
    * encoder's output riding the curated stream; rows with a null
    * embedding index as text only). Public for direct replay in
    * specs — `foreachBatch` calls exactly this. */
  def nightlyBatch(stores: Stores, maxBroadcastDelta: Long = 4000000L)
      (batch: DataFrame, batchId: Long): Unit = {
    // one dedup + one pin for every store: recomputing a lost cache
    // block must never elect DIFFERENT survivors for different stores
    val docs = batch.dropDuplicates("doc_id").localCheckpoint()
    IndexMaintenance.mergeBatch(stores.bm25, positional = false,
      maxBroadcastDelta)(docs.select(col("doc_id"), col("text")), batchId)
    IndexMaintenance.mergeBatch(stores.unified, positional = true,
      maxBroadcastDelta)(docs.select(col("doc_id"), col("text")), batchId)
    mergePositionalBatch(stores.positional)(
      docs.select(col("doc_id"), col("text")), batchId)
    // the epochal codes store may be attribute-embedded (filtered
    // serving): mergeCodesBatch infers the attr layout from the
    // maintained table and the encode REQUIRES those columns on the
    // delta, so forward them from the batch — a batch missing a
    // maintained attr column fails loudly here (analysis error on the
    // select), not deep inside the encode
    val codeAttrs = IvfPqIndex
      .loadEpochal(docs.sparkSession, stores.codes).attrColumns
    IvfPqIndex.mergeEpochal(stores.codes)(
      docs.filter(col("embedding").isNotNull)
        .select(col("doc_id").as("vec_id") +: col("embedding") +:
          codeAttrs.map(col): _*), batchId)
    stores.scoped.foreach { case (root, attr) =>
      mergeScopedBatch(root, attr, maxBroadcastDelta)(docs, batchId)
    }
  }

  /** Scoped-index maintenance (round 12): one INDEPENDENT segment log
    * per scope of a low-cardinality document attribute
    * (`root/<attr>=<value>/`). A scoped index IS the sub-corpus' index
    * (q_llm_bm25_scoped's serving semantics), so its maintained form
    * is simply the existing per-store protocol instantiated per scope
    * — in-scope df falls out for free because each scope's log only
    * ever sees its own documents, and every exactly-once property
    * (covered-replay no-op, crash-recompute, compaction) is inherited
    * per root. The batch routes by the attribute; a scope with no rows
    * in a batch commits nothing for it (each scope's covered() probe
    * is per-root, so later batches still merge). Scope values are
    * collected from the batch — bounded by the attribute's
    * cardinality, the same contract as the partition layout.
    *
    * Scopes merge CONCURRENTLY (round 13): each scope's log is an
    * independent root with its own markers, so nothing orders them —
    * a sequential loop made the nightly batch linear in scope count
    * (fine at 5 langs, a wall at a 100-scope corpus) while each
    * scope's merge is delta-sized and leaves most executor slots
    * idle. A bounded pool (`scopeParallelism`) submits the per-scope
    * merge JOBS in parallel and Spark's scheduler interleaves their
    * stages across the cluster; the shared `docs` frame is pinned
    * (localCheckpoint) before fan-out, so every thread reads the same
    * survivor rows. Crash mid-batch leaves a prefix of scopes
    * committed in ANY order — exactly the state a replay already
    * handles, since each scope's covered() probe is per-root. */
  def mergeScopedBatch(root: String, attr: String,
      maxBroadcastDelta: Long = 4000000L,
      scopeParallelism: Int = 8)(batch: DataFrame,
      batchId: Long): Unit = {
    // the attr is routed by its STRING form (scopeDir encodes it into
    // a path segment), so cast up front — a non-string attribute
    // (date, int) routes by its canonical string rendering instead of
    // throwing on the collect
    val docs = batch.select(col("doc_id"), col("text"),
        col(attr).cast("string").as(attr))
      .filter(col(attr).isNotNull)
      .dropDuplicates("doc_id").localCheckpoint()
    val scopes = docs.select(col(attr)).distinct()
      .collect().map(r => String.valueOf(r.get(0))).sorted
    if (scopes.isEmpty) return
    val spark = docs.sparkSession
    def mergeOne(v: String): Unit =
      IndexMaintenance.mergeBatch(scopeDir(root, attr, v),
        positional = false, maxBroadcastDelta)(
        docs.filter(col(attr) === v).select(col("doc_id"), col("text")),
        batchId)
    val width = math.max(1, math.min(scopeParallelism, scopes.length))
    if (width == 1) scopes.foreach(mergeOne)
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(width)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      try {
        val merges = scopes.toSeq.map(v => scala.concurrent.Future {
          // worker threads inherit no thread-local session; pin it so
          // fsOf resolves the same Hadoop conf (credentials) as the
          // caller
          org.apache.spark.sql.SparkSession.setActiveSession(spark)
          mergeOne(v)
        })
        scala.concurrent.Await.result(
          scala.concurrent.Future.sequence(merges),
          scala.concurrent.duration.Duration.Inf)
      } finally pool.shutdown()
    }
  }

  /** [[mergeScopedBatch]] with the per-scope JOBS collapsed into ONE
    * partitioned write set (round 14, the 100-scope ceiling): the
    * pooled form still runs ~5 Spark jobs PER SCOPE per batch (stored
    * read + merge + 3 artifact writes), so at a 100-language corpus
    * the nightly batch is fixed-job-cost-bound no matter how wide the
    * pool. Here the batch pays a CONSTANT number of jobs at any scope
    * count:
    *
    *  1. one GLOBAL fresh-id probe — scopes partition documents
    *     disjointly, so the union of every scope's committed manifest
    *     is an exact membership set for the whole batch (broadcast
    *     delta probe, zero manifest shuffle, the freshIdsOf stance);
    *  2. three `partitionBy(attr)` staging writes — per-scope
    *     postings, doc_ids, and the per-scope FULL df (each scope's
    *     stored vocab unioned as one scan leg + the fresh counts,
    *     summed per (attr, term));
    *  3. per-scope generation COMMIT = one filesystem RENAME of each
    *     staged partition into `scope/gen=<batchId>/…` + the marker —
    *     metadata operations, not jobs.
    *
    * Exactly-once inherits per scope: the covered() probe still gates
    * each scope's rename, a crash mid-commit leaves a prefix of
    * scopes committed (replay recomputes staging and renames only the
    * uncovered rest), and uncommitted target dirs are deleted before
    * rename. Result-identical to the pooled form (spec-pinned), with
    * one intended divergence: a scope whose batch rows are ALL
    * already-stored duplicates commits no (empty) generation —
    * serving reads and df views are unchanged either way.
    *
    * Attribute values must be path-literal (`[A-Za-z0-9._-]`) so
    * Spark's partition escaping and [[scopeDir]]'s URL encoding
    * agree; anything else falls back to the pooled form. */
  def mergeScopedBatchPartitioned(root: String, attr: String,
      maxBroadcastDelta: Long = 4000000L)(batch: DataFrame,
      batchId: Long): Unit = {
    val docs = batch.select(col("doc_id"), col("text"),
        col(attr).cast("string").as(attr))
      .filter(col(attr).isNotNull)
      .dropDuplicates("doc_id").localCheckpoint()
    val present = docs.select(col(attr)).distinct()
      .collect().map(r => String.valueOf(r.get(0))).sorted.toSeq
    if (present.isEmpty) return
    if (!present.forall(_.matches("[A-Za-z0-9._-]+"))) {
      mergeScopedBatch(root, attr, maxBroadcastDelta)(batch, batchId)
      return
    }
    val uncovered = present.filterNot(v =>
      GenerationLog.covered(scopeDir(root, attr, v), batchId))
    if (uncovered.isEmpty) return
    val spark = docs.sparkSession
    val fs = GenerationLog.fsOf(root)
    import org.apache.hadoop.fs.Path

    // 1. the global fresh probe off every committed scope's manifest
    val manifestDirs = scopesOf(root, attr).flatMap { v =>
      GenerationLog.stateDirs(scopeDir(root, attr, v)).toSeq
        .flatMap(_._1).map(d => s"$d/doc_ids")
    }
    val deltaIds = docs.select(col("doc_id")).distinct()
    val bounded = docs.count() <= maxBroadcastDelta
    val freshIds =
      if (manifestDirs.isEmpty) deltaIds
      else {
        val manifest = spark.read.parquet(manifestDirs: _*)
        if (bounded) {
          val overlap = manifest.join(broadcast(deltaIds), Seq("doc_id"))
          deltaIds.join(broadcast(overlap), Seq("doc_id"), "left_anti")
        } else deltaIds.join(manifest, Seq("doc_id"), "left_anti")
      }
    val fresh = docs
      .join(if (bounded) broadcast(freshIds) else freshIds, Seq("doc_id"))
      .filter(col(attr).isin(uncovered: _*))
      .localCheckpoint()

    // 2. the three staged partitioned write sets (constant job count)
    val staging = s"$root/.staging_gen=$batchId"
    fs.delete(new Path(staging), true)
    val perDoc = graft.llm.Retrieval.scopedPerDocTerms(fresh, attr)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    perDoc.select(col(attr), col("term"), col("doc_id"), col("tf"),
        col("dl"))
      .write.partitionBy(attr).mode("overwrite")
      .parquet(s"$staging/postings")
    fresh.select(col(attr), col("doc_id"))
      .write.partitionBy(attr).mode("overwrite")
      .parquet(s"$staging/doc_ids")
    val freshDf = perDoc.groupBy(col(attr), col("term"))
      .agg(count(lit(1)).as("df"))
    val storedDfLegs = uncovered.flatMap { v =>
      GenerationLog.stateDirs(scopeDir(root, attr, v)).map {
        case (_, latest) =>
          spark.read.parquet(s"$latest/df").withColumn(attr, lit(v))
            .select(col(attr), col("term"), col("df"))
      }
    }
    (storedDfLegs :+ freshDf.select(col(attr), col("term"), col("df")))
      .reduce(_.unionByName(_))
      .groupBy(col(attr), col("term"))
      .agg(sum(col("df")).as("df"))
      .write.partitionBy(attr).mode("overwrite").parquet(s"$staging/df")
    perDoc.unpersist()

    // 3. per-scope commit: rename staged partitions into gen dirs.
    // Commit scopes = staged doc_ids partitions (a scope whose rows
    // were all duplicates stages nothing and commits nothing); a
    // fresh doc with EMPTY text still commits (its id must reach the
    // manifest), with empty artifact dirs filled in.
    def staged(kind: String, v: String): Path =
      new Path(s"$staging/$kind/$attr=$v")
    val commitScopes = uncovered.filter(v => fs.exists(staged("doc_ids", v)))
    commitScopes.foreach { v =>
      val gen = GenerationLog.genDir(scopeDir(root, attr, v), batchId)
      fs.delete(new Path(gen), true) // uncommitted crash leftovers
      fs.mkdirs(new Path(gen))
      Seq("postings", "doc_ids", "df").foreach { kind =>
        val src = staged(kind, v)
        if (!fs.exists(src)) {
          // empty-text edge: stage an empty frame with the layout's
          // schema so the generation dir is complete
          val empty = kind match {
            case "postings" => fresh.limit(0).select(
              col("doc_id").cast("string").as("term"), col("doc_id"),
              lit(0L).as("tf"), lit(0L).as("dl"))
            case "df" => fresh.limit(0).select(
              col("doc_id").cast("string").as("term"), lit(0L).as("df"))
            case _ => fresh.limit(0).select(col("doc_id"))
          }
          empty.write.parquet(src.toString)
        }
        if (!fs.rename(src, new Path(s"$gen/$kind")))
          throw new java.io.IOException(
            s"staging rename failed: $src -> $gen/$kind")
      }
      GenerationLog.commitMarker(fs, gen)
      spark.catalog.refreshByPath(gen)
    }
    fs.delete(new Path(staging), true)
  }

  /** One scope's log directory — the value is URL-encoded so any
    * attribute value maps to a safe path segment. */
  def scopeDir(root: String, attr: String, value: String): String =
    s"$root/$attr=${java.net.URLEncoder.encode(value, "UTF-8")}"

  /** The maintained scoped store's serving view for one scope (None
    * before that scope's first commit). Serving a scope from here IS
    * q_llm_bm25_scoped over the maintained state: the segment's df is
    * in-scope by construction. */
  def readScope(spark: SparkSession, root: String, attr: String,
      value: String): Option[graft.llm.IndexSegments] =
    IndexMaintenance.read(spark, scopeDir(root, attr, value))

  /** Scope values with at least one committed generation. */
  def scopesOf(root: String, attr: String): Seq[String] = {
    val fs = GenerationLog.fsOf(root)
    Option(fs.globStatus(
        new org.apache.hadoop.fs.Path(root, s"$attr=*")))
      .map(_.toSeq).getOrElse(Seq.empty)
      .map(s => java.net.URLDecoder.decode(
        s.getPath.getName.stripPrefix(s"$attr="), "UTF-8"))
      .filter(v => GenerationLog.stateDirs(scopeDir(root, attr, v)).nonEmpty)
      .sorted
  }

  /** Positional-only generations: `gen=<batchId>/{postings, doc_ids}`
    * — the stored-positional (+inc) family as maintained state. Fresh
    * docs resolve against the union of committed doc-id manifests
    * (broadcast anti join — the delta never shuffles the store), and
    * only they pay the positions explode. */
  def mergePositionalBatch(root: String)(batch: DataFrame,
      batchId: Long): Unit = {
    import GenerationLog._
    if (covered(root, batchId)) return
    val spark = batch.sparkSession
    val docs = batch.select(col("doc_id"), col("text"))
      .dropDuplicates("doc_id").localCheckpoint()
    val fresh = stateDirs(root) match {
      case Some((dirs, _)) =>
        val storedIds = spark.read.parquet(dirs.map(d => s"$d/doc_ids"): _*)
        docs.join(broadcast(storedIds.select(col("doc_id"))),
          Seq("doc_id"), "left_anti")
      case None => docs
    }
    val pinned = fresh.localCheckpoint()
    val dir = genDir(root, batchId)
    // REBALANCE before the generation writes (guide §6): output files
    // sized by AQE instead of one micro file per shuffle partition —
    // see IndexMaintenance.mergeBatch
    Retrieval.positionalPostings(pinned).hint("rebalance")
      .write.mode("overwrite").parquet(s"$dir/postings")
    pinned.select(col("doc_id")).hint("rebalance")
      .write.mode("overwrite").parquet(s"$dir/doc_ids")
    commitMarker(fsOf(root), dir)
    spark.catalog.refreshByPath(dir)
  }

  /** The positional store's serving view: the union of committed
    * postings. None before the first commit. */
  def readPositional(spark: SparkSession, root: String): Option[DataFrame] =
    GenerationLog.stateDirs(root).map { case (dirs, _) =>
      spark.read.parquet(dirs.map(d => s"$d/postings"): _*)
    }

  private def compactPositional(spark: SparkSession, root: String): Unit =
    GenerationLog.compactWith(root, gc = false) { (dirs, out) =>
      spark.read.parquet(dirs.map(d => s"$d/postings"): _*)
        .hint("rebalance")
        .write.mode("overwrite").parquet(s"$out/postings")
      spark.read.parquet(dirs.map(d => s"$d/doc_ids"): _*)
        .hint("rebalance")
        .write.mode("overwrite").parquet(s"$out/doc_ids")
      spark.catalog.refreshByPath(out)
    }

  private def tailGens(root: String): Int = {
    val lastCg = GenerationLog.committedCgens(root).lastOption
    GenerationLog.committedGens(root).count(g => lastCg.forall(g > _))
  }

  /** The SHARED size-tiered compaction window: while the TOTAL tail
    * generations across the four stores exceed `maxTotalTailGens`,
    * fold the store with the longest tail (deferred GC — live readers
    * keep their pinned sets; schedule the gc passes separately).
    * Returns the roots folded this window, longest-tail first. */
  def maybeCompactAll(spark: SparkSession, stores: Stores,
      maxTotalTailGens: Int): Seq[String] = {
    val codesRoot = IvfPqIndex.activeEpochDir(stores.codes)
    def compactOf(root: String): () => Unit = root match {
      case r if r == stores.positional =>
        () => compactPositional(spark, r)
      case r if r == codesRoot =>
        () => IvfPqIndex.compactCodes(spark, r)
      case r => () => IndexMaintenance.compact(spark, r)
    }
    // the scoped family's per-scope logs join the SAME budget: each
    // scope is its own root, compacted by the segment-store fold
    val scopeRoots = stores.scoped.toSeq.flatMap { case (r, attr) =>
      scopesOf(r, attr).map(scopeDir(r, attr, _))
    }
    val roots = Seq(stores.bm25, stores.positional, stores.unified,
      codesRoot) ++ scopeRoots
    var tails = roots.map(r => r -> tailGens(r)).toMap
    val folded = Seq.newBuilder[String]
    var progress = true
    while (progress && tails.values.sum > maxTotalTailGens) {
      progress = false
      // longest tail first; a store whose fold is a no-op (a single
      // never-compacted generation) simply can't shrink — skip it
      for ((r, before) <- tails.toSeq.sortBy(-_._2)
          if !progress && before > 0) {
        compactOf(r)()
        val after = tailGens(r)
        if (after < before) {
          folded += r
          tails += r -> after
          progress = true
        }
      }
    }
    folded.result()
  }

  /** The drift-retrain leg of the nightly window: `corpus` supplies
    * the full accumulated vector set (the warehouse read retrain
    * re-encodes — an epochal retrain can never be derived from codes
    * alone, PQ is lossy), the strides/iters are the retrain knobs. */
  final case class RetrainPolicy(corpus: () => DataFrame,
      coarseStride: Int, bookStride: Int, iters: Int = 0,
      alarmFactor: Long = 4L)

  /** Everything the nightly window does AFTER the batch merges: spend
    * the shared compaction budget, then check the drift alarm and
    * retrain the ANN epoch when it fires. Returns the folded roots
    * and the new epoch id if a retrain ran. */
  def nightlyWindow(spark: SparkSession, stores: Stores,
      maxTotalTailGens: Int,
      retrain: Option[RetrainPolicy] = None): (Seq[String], Option[Long]) = {
    val folded = maybeCompactAll(spark, stores, maxTotalTailGens)
    val epoch = retrain.flatMap { p =>
      IvfPqIndex.retrainIfDrifted(spark, stores.codes, p.corpus(),
        p.coarseStride, p.bookStride, p.iters, p.alarmFactor)._2
    }
    (folded, epoch)
  }

  /** Drive every family from one curated document stream.
    * AvailableNow by default — the nightly catch-up trigger. */
  def start(docsStream: DataFrame, stores: Stores, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow(),
      maxTotalTailGens: Int = 8,
      maxBroadcastDelta: Long = 4000000L,
      retrain: Option[RetrainPolicy] = None): StreamingQuery =
    docsStream.writeStream
      .foreachBatch { (b: Dataset[Row], id: Long) =>
        nightlyBatch(stores, maxBroadcastDelta)(b.toDF(), id)
        nightlyWindow(b.sparkSession, stores, maxTotalTailGens, retrain)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
}

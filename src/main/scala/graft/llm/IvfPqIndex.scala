package graft.llm

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.ManifestStore

/** A persisted IVF-PQ index as one typed bundle: the coarse centroids,
  * the residual codebooks, the stored code table, and the PQ config
  * that binds them. The loose-frame API ([[Similarity.ivfPqTopKFromCodes]])
  * guards a wrong-m code table at execution time; this bundle makes
  * the mismatch UNREPRESENTABLE — `m`/`dim` travel with the tables in
  * the saved manifest, so a loaded index can only be served with the
  * config it was encoded under.
  *
  * Persistence rides [[graft.streaming.ManifestStore]], so an index
  * directory has the same crash-safe single-writer semantics as the
  * manifested cert store: each [[IvfPqIndex.save]] fills a fresh
  * immutable generation directory and commits it with ONE atomic
  * single-object manifest write — on S3-semantics stores there is no
  * rename, a crashed save is invisible (never promoted) and reclaimed
  * by the next save's gc, and in-flight readers finish against the
  * retired generation. The nightly loop is: load → [[withDelta]] →
  * save (a new generation, atomic swap under live serving). */
case class IvfPqIndex(m: Int, dim: Int, coarse: DataFrame,
    books: DataFrame, codes: DataFrame) {

  /** Batch serving from the stored codes — [[Similarity.ivfPqTopKFromCodes]]
    * with the manifest's own config. */
  def topK(queries: DataFrame, k: Int, probes: Int = 1): DataFrame =
    Similarity.ivfPqTopKFromCodes(codes, queries, k, coarse, books,
      m, dim, probes)

  /** Metadata-FILTERED serving (q_llm_ann_filtered semantics off the
    * maintained table): candidates restricted by `pred` BEFORE the
    * top-k aggregate — a pushed parquet filter on the code-table scan
    * when the predicate hits an attribute column the index was encoded
    * with ([[Similarity.ivfPqEncode]]'s `attrs`; [[attrColumns]] lists
    * them). Pre-filter ≡ serving an index of only the matching
    * sub-corpus (frozen-quantizer per-vector encode independence). */
  def topKFiltered(queries: DataFrame, k: Int,
      pred: org.apache.spark.sql.Column, probes: Int = 1): DataFrame =
    Similarity.ivfPqTopKFromCodes(codes.filter(pred), queries, k,
      coarse, books, m, dim, probes)

  /** The attribute columns this index's stored rows carry beyond the
    * (vec_id, list_id, codes) triple — the filterable surface. The
    * maintenance entry points infer THIS list to keep deltas,
    * compactions, and retrains schema-identical to the genesis. One
    * shared definition with the loose-frame merge
    * ([[Similarity.attrColumnsOf]]). */
  def attrColumns: Seq[String] = Similarity.attrColumnsOf(codes)

  /** Streaming serving — [[Similarity.streamingIvfPqServe]] with the
    * manifest's own config. */
  def serveStream(queries: DataFrame, k: Int, probes: Int = 1,
      windowDur: String = "1 minute", watermark: String = "1 hour"): DataFrame =
    Similarity.streamingIvfPqServe(queries, codes, coarse, books,
      m, dim, k, probes, windowDur, watermark)

  /** The nightly delta: encode only vectors not yet in the code table
    * ([[Similarity.ivfPqEncodeIncremental]]), quantizer frozen. Returns
    * the updated bundle; [[IvfPqIndex.save]] it to publish. */
  def withDelta(vecs: DataFrame): IvfPqIndex =
    copy(codes = Similarity.ivfPqEncodeIncremental(codes, vecs, coarse,
      books, m, dim))
}

object IvfPqIndex {
  private val ConfFile = "index.conf"

  import graft.streaming.GenerationLog

  /** Delta-generation maintenance for the CODE TABLE — the
    * [[graft.streaming.IndexMaintenance]] economics applied to ANN:
    * where [[save]] rewrites the full code table per publish
    * (O(corpus) nightly bytes), the maintained layout appends one
    * committed `gen=<batchId>/codes` delta per nightly run — encode
    * cost and write set are DELTA-sized — and [[compactCodes]] folds
    * accumulated generations Lucene-style. The frozen quantizer
    * (coarse, books, config) is written ONCE at `root/quantizer`;
    * re-training it is a rebuild, not an increment.
    *
    * Crash safety is [[GenerationLog]]'s: the `_COMMITTED` marker
    * lands last, a replayed batchId is a no-op when covered and a
    * byte-identical recompute when not (the uncommitted dir was
    * invisible to the fresh-id probe), and compaction is monotone
    * with deferred GC by default (live readers keep their pinned
    * generation sets). */
  def initMaintained(index: IvfPqIndex, root: String,
      coverageId: Long = -1L): Unit = {
    val spark = index.codes.sparkSession
    val fs = GenerationLog.fsOf(root)
    val qdir = s"$root/quantizer"
    // REBALANCE before stored writes (guide §6): files sized by AQE,
    // not one micro file per shuffle partition of the training plan
    index.coarse.hint("rebalance")
      .write.mode("overwrite").parquet(s"$qdir/coarse")
    index.books.hint("rebalance")
      .write.mode("overwrite").parquet(s"$qdir/books")
    val out = fs.create(new Path(qdir, ConfFile), true)
    try out.write(s"m=${index.m}\ndim=${index.dim}\n".getBytes("UTF-8"))
    finally out.close()
    // the base codes land as the GENESIS COMPACTION at `coverageId` —
    // "the full state through that batchId". The default, cgen=-1, is
    // "before any batch": a plain gen=0 would collide with Spark
    // streaming's batchId numbering (which starts at 0) —
    // GenerationLog.covered(root, 0) would see the init marker and
    // silently drop the first streamed delta. As a cgen strictly below
    // every batchId it covers nothing, readers base on it, and the
    // first real compaction (always folding through a gen id >= 0)
    // supersedes and GCs it like any other cgen. A RETRAIN epoch
    // ([[retrain]]) passes the retired epoch's coverage point instead,
    // so replayed batch ids no-op and fresh ids keep appending.
    val dir = GenerationLog.cgenDir(root, coverageId)
    index.codes.hint("rebalance")
      .write.mode("overwrite").parquet(s"$dir/codes")
    GenerationLog.commitMarker(fs, dir)
    spark.catalog.refreshByPath(dir)
  }

  /** One nightly delta = one committed generation: encode ONLY the
    * vectors absent from the maintained code table (the
    * [[Similarity.ivfPqEncodeIncremental]] probe against the union of
    * committed generations) and append the fresh codes. Idempotent
    * under at-least-once replay and overlapping deltas. */
  def mergeCodesBatch(root: String)(vecs: DataFrame,
      batchId: Long): Unit = {
    if (GenerationLog.covered(root, batchId)) return
    val spark = vecs.sparkSession
    val idx = loadMaintained(spark, root)
    // materialized BEFORE the encode: the attribute-embedded encode
    // reads its input through TWO subtrees (the code chain and the
    // attrs join), and dropDuplicates' pick is nondeterministic — an
    // unmaterialized plan evaluated twice could pair one duplicate
    // row's codes with another's attrs under at-least-once replay.
    // localCheckpoint (not persist): cached blocks are best-effort,
    // and a recompute after eviction could elect DIFFERENT survivors
    // for the two subtrees within one committed generation — the pin
    // must be immutable, exactly as nightlyBatch pins its batch. It
    // also keeps the corpus-sized anti-join probe from running twice
    // per nightly delta.
    val fresh = vecs
      .join(idx.codes.select(col("vec_id")), Seq("vec_id"), "left_anti")
      .dropDuplicates("vec_id")
      .localCheckpoint()
    // an attribute-embedded genesis keeps its filterable columns
    // across every delta: the schema is inferred from the maintained
    // table itself, never re-declared by the caller
    val freshCodes = Similarity.ivfPqEncode(fresh, idx.coarse,
      idx.books, idx.m, idx.dim, idx.attrColumns)
    val dir = GenerationLog.genDir(root, batchId)
    freshCodes.hint("rebalance")
      .write.mode("overwrite").parquet(s"$dir/codes")
    GenerationLog.commitMarker(GenerationLog.fsOf(root), dir)
    spark.catalog.refreshByPath(dir)
  }

  /** The maintained index: frozen quantizer + the union of committed
    * code generations (latest compaction base + deltas beyond it). */
  def loadMaintained(spark: SparkSession, root: String): IvfPqIndex = {
    val qdir = s"$root/quantizer"
    val fs = GenerationLog.fsOf(root)
    val conf = readConf(fs, new Path(qdir))
    val dirs = GenerationLog.stateDirs(root).map(_._1).getOrElse(
      throw new IllegalStateException(
        s"no committed code generation under $root"))
    IvfPqIndex(
      m = conf("m").toInt,
      dim = conf("dim").toInt,
      coarse = spark.read.parquet(s"$qdir/coarse"),
      books = spark.read.parquet(s"$qdir/books"),
      codes = spark.read.parquet(dirs.map(d => s"$d/codes"): _*))
  }

  /** [[loadMaintained]] PINNED to coverage point `throughId` — the
    * code table as-of that batch ([[graft.streaming.IndexMaintenance.readAt]]
    * applied to ANN). Valid while retention keeps the pinned dirs
    * (the deferred-GC default). None when nothing ≤ throughId is
    * committed. */
  def loadMaintainedAt(spark: SparkSession, root: String,
      throughId: Long): Option[IvfPqIndex] =
    GenerationLog.stateDirsAt(root, throughId).map { case (dirs, _) =>
      val qdir = s"$root/quantizer"
      val conf = readConf(GenerationLog.fsOf(root), new Path(qdir))
      IvfPqIndex(
        m = conf("m").toInt,
        dim = conf("dim").toInt,
        coarse = spark.read.parquet(s"$qdir/coarse"),
        books = spark.read.parquet(s"$qdir/books"),
        codes = spark.read.parquet(dirs.map(d => s"$d/codes"): _*))
    }

  /** Fold the committed code generations into one `cgen` — the
    * [[graft.streaming.IndexMaintenance.compact]] move on the code
    * table. Deferred GC by default (live readers); run
    * [[GenerationLog.gcSuperseded]] in a maintenance window. */
  def compactCodes(spark: SparkSession, root: String,
      gcSuperseded: Boolean = false): Unit =
    GenerationLog.compactWith(root, gcSuperseded) { (dirs, out) =>
      spark.read.parquet(dirs.map(d => s"$d/codes"): _*)
        .hint("rebalance")
        .write.mode("overwrite").parquet(s"$out/codes")
      spark.catalog.refreshByPath(out)
    }

  // ------------------------------------------------------------------
  // Epochal maintained index: the retrain-capable layer.
  //
  // PQ codes are residuals against one specific coarse quantizer, so a
  // retrained quantizer can never share a generation log with codes
  // encoded under the old one — the pairing must be unrepresentable-
  // wrong, like m/dim in the bundle. The epochal layout makes each
  // quantizer lifetime its own maintained table:
  //
  //   root/epoch=<E>/quantizer/{coarse,books,index.conf}
  //   root/epoch=<E>/cgen=…|gen=…   (that epoch's GenerationLog)
  //   root/epoch=<E>/_COMMITTED     (the epoch cutover marker)
  //
  // The epoch marker is written LAST — after the quantizer and the
  // genesis compaction are fully staged — so the serving cutover is
  // ONE atomic marker create: a crashed retrain is an invisible
  // unmarked epoch dir (reclaimed by the next retrain's number-first
  // discipline via [[gcEpochs]]), and readers resolve the ACTIVE
  // epoch as the newest committed one. Retired epochs stay on disk
  // (deferred GC) so readers pinned pre-retrain — via an epoch handle
  // or [[loadMaintainedAt]] on the retired epoch dir — keep serving
  // byte-identical results; run [[gcEpochs]] in a maintenance window
  // after evaluation pins expire.
  //
  // Batch-id coverage CONTINUES across epochs: the retrain epoch's
  // genesis compaction lands at the retired epoch's coverage point
  // (its max committed id), so a replayed batchId no-ops and the next
  // fresh delta appends to the new epoch — the reference's
  // checkpoint-resume economics (ct-fetch.go:288-305) applied to the
  // quantizer lifecycle.
  // ------------------------------------------------------------------

  def epochDir(root: String, e: Long): String = f"$root/epoch=$e%020d"

  /** Committed epoch ids, ascending. */
  def committedEpochs(root: String): Seq[Long] = {
    val fs = GenerationLog.fsOf(root)
    Option(fs.globStatus(new Path(root, "epoch=*/_COMMITTED")))
      .map(_.toSeq).getOrElse(Seq.empty)
      .map(_.getPath.getParent.getName)
      .flatMap(_.stripPrefix("epoch=").toLongOption)
      .sorted
  }

  /** The serving epoch: the newest committed one. */
  def activeEpochDir(root: String): String =
    committedEpochs(root).lastOption.map(epochDir(root, _)).getOrElse(
      throw new IllegalStateException(s"no committed epoch under $root"))

  /** Open epoch 0 (or, from [[retrain]], epoch E+1) with `index` as
    * its genesis state covering through `coverageId`. Everything is
    * staged first; the epoch `_COMMITTED` marker lands LAST and IS the
    * atomic cutover. Returns the epoch id. */
  def initEpochal(index: IvfPqIndex, root: String,
      coverageId: Long = -1L): Long = {
    val e = committedEpochs(root).lastOption.map(_ + 1L).getOrElse(0L)
    val edir = epochDir(root, e)
    val fs = GenerationLog.fsOf(root)
    // a crashed earlier attempt at this epoch number left an unmarked
    // orphan; its contents are invisible by construction but its INNER
    // cgen markers are real, so a retry staged at a different coverage
    // point must not leave residue a pinned as-of read could pair with
    // the WRONG quantizer — purge before staging
    val p = new Path(edir)
    if (fs.exists(p)) fs.delete(p, true)
    initMaintained(index, edir, coverageId)
    GenerationLog.commitMarker(fs, edir)
    e
  }

  /** [[mergeCodesBatch]] against the active epoch — the foreachBatch
    * hook of an epochal deployment. */
  def mergeEpochal(root: String)(vecs: DataFrame, batchId: Long): Unit =
    mergeCodesBatch(activeEpochDir(root))(vecs, batchId)

  /** [[compactCodes]] against the active epoch. */
  def compactEpochal(spark: SparkSession, root: String,
      gcSuperseded: Boolean = false): Unit =
    compactCodes(spark, activeEpochDir(root), gcSuperseded)

  /** The active epoch's serving view. */
  def loadEpochal(spark: SparkSession, root: String): IvfPqIndex =
    loadMaintained(spark, activeEpochDir(root))

  /** Pinned as-of read across retrains: the newest committed epoch
    * holding state at or below `throughId` serves the pin — after a
    * retrain whose genesis covers the pin point, that is the retrain
    * epoch (same corpus coverage, the now-authoritative codes); a pin
    * BELOW every epoch's genesis falls through to the retired epoch
    * that still holds per-generation state there. For byte-stable
    * evaluation across a retrain, pin the EPOCH too:
    * [[loadMaintainedAt]] on `epochDir(root, e)` is immune to
    * cutovers by construction (deferred [[gcEpochs]]). */
  def loadEpochalAt(spark: SparkSession, root: String,
      throughId: Long): Option[IvfPqIndex] =
    committedEpochs(root).reverseIterator
      .flatMap(e => loadMaintainedAt(spark, epochDir(root, e), throughId))
      .nextOption()

  /** Train a FRESH quantizer over `corpus` (which must be the same
    * vector set the active epoch's log has accumulated — the retrain
    * re-encodes it in full; an increment cannot fix a skewed quantizer
    * because stored codes are residuals against the old centroids),
    * keep the epoch's PQ config (m, dim), and cut over atomically to
    * a new epoch whose genesis compaction covers the retired epoch's
    * coverage point. `coarseStride`/`iters` are the retrain knobs
    * ("more centroids or more iterations"). Returns the new epoch id. */
  def retrain(spark: SparkSession, root: String, corpus: DataFrame,
      coarseStride: Int, bookStride: Int, iters: Int = 0,
      temps: TempCache = TempCache.noop): Long = {
    val edir = activeEpochDir(root)
    val old = loadMaintained(spark, edir)
    val coverage = (GenerationLog.committedCgens(edir) ++
      GenerationLog.committedGens(edir)).max
    val (coarse, books) = Similarity.ivfPqTrain(corpus, coarseStride,
      old.m, old.dim, bookStride, iters, temps)
    // the retrain epoch re-encodes with the SAME attribute layout the
    // retired epoch served — filtered queries keep working across the
    // cutover without re-declaration
    val codes = Similarity.ivfPqEncode(corpus, coarse, books, old.m,
      old.dim, old.attrColumns)
    initEpochal(IvfPqIndex(old.m, old.dim, coarse, books, codes), root,
      coverage)
  }

  /** The wired operational loop: [[driftAlarm]] on the active epoch's
    * code table; when it fires, [[retrain]]. Returns the alarm tuple
    * (n_lists, max_ppm, balanced_ppm, fired) plus the new epoch id
    * when a retrain ran. Single-writer like every maintenance entry
    * point here — run it from the nightly driver, not concurrently
    * with merges. */
  def retrainIfDrifted(spark: SparkSession, root: String,
      corpus: DataFrame, coarseStride: Int, bookStride: Int,
      iters: Int = 0, alarmFactor: Long = 4L,
      temps: TempCache = TempCache.noop)
      : ((Long, Long, Long, Boolean), Option[Long]) = {
    val alarm = driftAlarm(loadEpochal(spark, root).codes, alarmFactor)
    if (!alarm._4) (alarm, None)
    else (alarm, Some(retrain(spark, root, corpus, coarseStride,
      bookStride, iters, temps)))
  }

  /** Collect retired epochs (committed or not, strictly below the
    * active one) — the deferred-GC half of a cutover. An unmarked
    * orphan ABOVE the active epoch (a retrain crashed mid-stage) is
    * left alone: the next retrain recomputes the same epoch number
    * and overwrites it in place, so it self-heals without GC. Run
    * this after pinned evaluation readers have re-resolved past the
    * retrain. */
  def gcEpochs(root: String): Unit = {
    val fs = GenerationLog.fsOf(root)
    for (active <- committedEpochs(root).lastOption) {
      val dirs = Option(fs.globStatus(new Path(root, "epoch=*")))
        .map(_.toSeq).getOrElse(Seq.empty).map(_.getPath)
      dirs.filter(_.getName.stripPrefix("epoch=").toLongOption
          .exists(_ < active))
        .foreach(p => fs.delete(p, true))
    }
  }

  /** Quantizer drift alarm: the retrain decision wired to
    * q_llm_ivf_stats' skew signal. Serving cost per probe is
    * proportional to probed-list size, so when the largest list's
    * corpus share (ppm) exceeds `alarmFactor` × the balanced share
    * (1e6 / n_lists), few-probe serving has silently degraded toward
    * an exhaustive scan — retrain the coarse quantizer (more iters or
    * more centroids) and REBUILD; an increment cannot fix a skewed
    * quantizer because stored codes are residuals against the old
    * centroids. Computed from the stored code table alone (list_id
    * already assigned — one k-row aggregate, no vector arithmetic).
    * Returns (n_lists, max_ppm, balanced_ppm, retrain). */
  def driftAlarm(codes: DataFrame,
      alarmFactor: Long = 4L): (Long, Long, Long, Boolean) = {
    val row = codes.groupBy(col("list_id")).agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("n_lists"), max(col("n")).as("max_n"),
        sum(col("n")).as("total"))
      .select(col("n_lists"),
        expr("(1000000 * max_n) div total").as("max_ppm"),
        expr("1000000 div n_lists").as("balanced_ppm"))
      .head()
    if (row.getLong(0) == 0L)
      throw new IllegalArgumentException(
        "driftAlarm: empty code table — nothing encoded under this " +
          "index yet, so there is no list distribution to judge")
    val (nLists, maxPpm, balanced) =
      (row.getLong(0), row.getLong(1), row.getLong(2))
    (nLists, maxPpm, balanced, maxPpm > alarmFactor * balanced)
  }

  /** Train + encode in one call: [[Similarity.ivfPqTrain]] then
    * [[Similarity.ivfPqEncode]] over the corpus. `attrs` embeds filter
    * attribute columns in the stored rows (the [[topKFiltered]]
    * surface); the maintenance entry points preserve them from here
    * on via [[IvfPqIndex.attrColumns]] inference. */
  def build(vecs: DataFrame, coarseStride: Int, m: Int, dim: Int,
      bookStride: Int, iters: Int = 0,
      temps: TempCache = TempCache.noop,
      attrs: Seq[String] = Nil): IvfPqIndex = {
    val (coarse, books) = Similarity.ivfPqTrain(vecs, coarseStride, m,
      dim, bookStride, iters, temps)
    IvfPqIndex(m, dim, coarse, books,
      Similarity.ivfPqEncode(vecs, coarse, books, m, dim, attrs))
  }

  /** Publish the bundle as a new generation under `root`: stage the
    * three parquet tables + the config file, then ONE atomic manifest
    * write promotes them. Crash before promote = invisible orphan,
    * reclaimed by the next save. */
  def save(index: IvfPqIndex, root: String): Unit = {
    val spark = index.codes.sparkSession
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // number first, THEN reclaim (compactManifested's ordering): a
    // crashed writer's orphan number must never be reused
    val gen = ManifestStore.nextGen(fs, rootPath)
    ManifestStore.gc(fs, rootPath)
    val staged = ManifestStore.stagingPath(rootPath, gen)
    index.coarse.hint("rebalance")
      .write.mode("overwrite").parquet(s"$staged/coarse")
    index.books.hint("rebalance")
      .write.mode("overwrite").parquet(s"$staged/books")
    index.codes.hint("rebalance")
      .write.mode("overwrite").parquet(s"$staged/codes")
    val out = fs.create(new Path(staged, ConfFile), true)
    try out.write(s"m=${index.m}\ndim=${index.dim}\n".getBytes("UTF-8"))
    finally out.close()
    ManifestStore.promote(fs, rootPath, gen)
    ManifestStore.gc(fs, rootPath)
  }

  private def readConf(fs: org.apache.hadoop.fs.FileSystem,
      dir: Path): Map[String, String] = {
    val in = fs.open(new Path(dir, ConfFile))
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .flatMap { l =>
        l.split("=", 2) match {
          case Array(k, v) => Some(k.trim -> v.trim)
          case _ => None
        }
      }.toMap
    finally in.close()
  }

  /** Load the live generation: config from its manifest, tables from
    * its immutable directory. Raises if nothing was ever promoted. */
  def load(spark: SparkSession, root: String): IvfPqIndex = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = ManifestStore.currentDataPath(fs, rootPath).getOrElse(
      throw new IllegalStateException(
        s"no promoted index generation under $root"))
    val conf = readConf(fs, dir)
    IvfPqIndex(
      m = conf("m").toInt,
      dim = conf("dim").toInt,
      coarse = spark.read.parquet(s"$dir/coarse"),
      books = spark.read.parquet(s"$dir/books"),
      codes = spark.read.parquet(s"$dir/codes"))
  }
}

package graft.sources

import java.security.MessageDigest

import graft.streaming.ManifestStore
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Materialized storage for the build → store → serve split's STORED
  * half: index artifacts (postings segments, vocab-sized df tables,
  * doc-id manifests, code tables) written once per (corpus, variant)
  * and read back as plain scans, so queries that model "serve from /
  * merge into the stored index" actually measure the serve/merge —
  * not an in-plan rebuild of the stored side each run (the round-9
  * bench-harness caveat: `_inc` timings tracked index size because
  * the stored index was re-derived inside every rep).
  *
  * Object-store-safe (round 11): every filesystem touch goes through
  * Hadoop's [[FileSystem]] resolved from the configured root — never
  * java.io.File — and every artifact lives under the
  * [[graft.streaming.ManifestStore]] generation protocol: immutable
  * generation dirs promoted by ONE atomic single-object manifest
  * write, readers resolving only through manifests. No directory
  * rename, no in-place `overwrite` of live data, GC correctness-
  * independent (a crashed writer's orphan dir is never referenced and
  * is collected by the next successful build). The earlier layout —
  * plain dirs probed via `_SUCCESS`, rewritten in place — was safe
  * only on a local filesystem.
  *
  * Corpus keys are CONTENT fingerprints: a digest over each source
  * part-file's name, length, and tail bytes (parquet footers carry
  * row counts and column stats, so regenerated data changes the tail
  * even at identical byte length and mtime). A per-JVM memo keyed by
  * (size, newest mtime) keeps the steady-state cost at one `stat`
  * per call; any regeneration that touches size or mtime re-hashes.
  *
  * Two layouts:
  *  - [[parquet]]: plain parquet generations under
  *    `root/<key>/<name>/gens/...`, reused across sessions via the
  *    manifest. Stale sibling keys (older regenerations of the same
  *    corpus+table) are GC'd when a new key is first built.
  *  - [[bucketedTable]]: a hash-BUCKETED catalog table — term-bucketed
  *    postings and df tables joined on `term` plan with ZERO Exchange
  *    on either side, the vocab-exceeds-broadcast fallback and the
  *    repeated-serving shape. Bucket metadata lives in the
  *    (in-memory) session catalog; a fresh session re-REGISTERS the
  *    existing promoted files with one `CREATE TABLE ... CLUSTERED
  *    BY ... LOCATION` DDL — no rewrite, the production pre-pay paid
  *    once per corpus, not once per session.
  */
object IndexStore {

  private def root: String =
    sys.env.getOrElse("SPARK_GRAFT_SEG_DIR", "/root/repo/.segcache")

  /** Test seam: the (size, mtime) → digest memo survives for the JVM's
    * life; clearing it simulates a FRESH session re-probing a source
    * table whose bytes changed inside one stat tick. */
  private[graft] def clearTagMemoForTests(): Unit = tagMemo.clear()

  private def hconf(spark: SparkSession) = spark.sessionState.newHadoopConf()

  /** Corpus-content key: `<sanitized sfDir>__<table>_<digest16>`.
    * The source-table tag means a regenerated tier (same path, new
    * content — even at an identical byte length and mtime tick) never
    * reuses a stale cache, and keys for artifacts derived from
    * DIFFERENT tables of one sf dir (documents vs embeddings)
    * invalidate independently. `table` must be the table the stored
    * artifact derives from. */
  def corpusKey(spark: SparkSession, sfDir: String,
      table: String = "documents"): String =
    s"${keyPrefix(sfDir, table)}${tableTag(spark, sfDir, table)}"

  private def keyPrefix(sfDir: String, table: String): String =
    sfDir.replaceAll("[^A-Za-z0-9]", "_") + "__" + table + "_"

  /** file-metadata -> content digest memo: content hashing costs one
    * open per part file, so the steady state (plan re-construction per
    * bench rep) pays only the directory stat. The memo key folds in
    * EVERY file's (name, len, mtime) — not just the totals — so a
    * same-JVM regeneration whose per-file sizes merely swap (or that
    * lands inside one mtime tick at an identical total byte count)
    * still misses the memo and re-digests the content. */
  private val tagMemo =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]

  private def tableTag(spark: SparkSession, sfDir: String,
      table: String): String = {
    val src = new Path(s"$sfDir/$table.parquet")
    val fs = src.getFileSystem(hconf(spark))
    if (!fs.exists(src)) return "0"
    val files = listFiles(fs, src).sortBy(_.toString)
    val sizes = files.map(f => fs.getFileStatus(f))
    val metaKey = files.zip(sizes)
      .map { case (f, st) =>
        s"${f.getName}:${st.getLen}:${st.getModificationTime}" }
      .mkString("|")
    tagMemo.computeIfAbsent((src.toString, metaKey), _ => {
      val md = MessageDigest.getInstance("MD5")
      for ((f, st) <- files.zip(sizes)) {
        md.update(f.getName.getBytes("UTF-8"))
        md.update(st.getLen.toString.getBytes("UTF-8"))
        val tail = math.min(st.getLen, 65536L)
        val buf = new Array[Byte](tail.toInt)
        val in = fs.open(f)
        try { in.seek(st.getLen - tail); in.readFully(buf) }
        finally in.close()
        md.update(buf)
      }
      md.digest().take(8).map("%02x".format(_)).mkString
    })
  }

  private def listFiles(fs: FileSystem, p: Path): Seq[Path] = {
    val st = fs.getFileStatus(p)
    if (st.isFile) Seq(p)
    else fs.listStatus(p).toSeq.flatMap(s => listFiles(fs, s.getPath))
  }

  /** Cross-PROCESS serialization of a cold build-and-promote: two JVMs
    * that both find an artifact missing would otherwise build it
    * concurrently — the manifest swap keeps each write internally
    * consistent, but writer B's post-promote GC can delete the
    * generation writer A's reader just resolved, and maintainedRoot's
    * in-place generation replays are not concurrent-writer-safe. An
    * OS file lock on `<artifact>.lock` serializes builders; callers
    * re-probe INSIDE the lock, so the loser registers the winner's
    * build instead of repeating it. Only meaningful (and only
    * possible) on a local filesystem — exactly where concurrent
    * builders occur (parallel test JVMs, multi-process drivers on one
    * box); on object stores behavior is unchanged (single-driver
    * assumption, as before). */
  private val buildMonitors =
    new java.util.concurrent.ConcurrentHashMap[String, Object]

  private def withBuildLock[T](fs: FileSystem, artRoot: Path)(body: => T): T =
    if (fs.getUri.getScheme == "file") {
      // per-path JVM monitor first (FileLock throws
      // OverlappingFileLockException on same-JVM contention), then the
      // OS lock for cross-process exclusion
      val mon = buildMonitors.computeIfAbsent(artRoot.toString,
        _ => new Object)
      mon.synchronized {
        val lockFile = new java.io.File(
          artRoot.toUri.getPath + ".lock")
        Option(lockFile.getParentFile).foreach(_.mkdirs())
        val ch = java.nio.channels.FileChannel.open(lockFile.toPath,
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.WRITE)
        try {
          val lk = ch.lock()
          try body finally lk.release()
        } finally ch.close()
      }
    } else body

  /** Delete sibling dirs under `parent` that share `prefix` but are
    * not `current` — stale keys from older regenerations of the same
    * corpus+table. Correctness never depends on these deletes (a
    * stale key is simply never addressed again); this bounds storage
    * growth across driver regenerations. */
  private def gcStale(fs: FileSystem, parent: Path, prefix: String,
      current: String): Unit =
    if (fs.exists(parent))
      fs.listStatus(parent).toSeq
        .filter(s => s.getPath.getName.startsWith(prefix) &&
          s.getPath.getName != current)
        .foreach(s => fs.delete(s.getPath, true))

  /** Write `build` as a promoted parquet generation once (skipped
    * whenever a promoted generation already exists for this corpus
    * content) and return a reader over the promoted files. */
  def parquet(spark: SparkSession, sfDir: String, name: String,
      table: String = "documents")(build: => DataFrame): DataFrame =
    parquetAt(spark, root, sfDir, name, table)(build)

  /** [[parquet]] with an explicit store root (any Hadoop-resolvable
    * URI — the spec drives it over a rename-is-copy object-store
    * fake). `partitionBy` (when non-empty) writes the generation
    * partitioned by those columns — ONE generation protocol for the
    * flat and partitioned layouts. */
  def parquetAt(spark: SparkSession, rootDir: String, sfDir: String,
      name: String, table: String = "documents",
      partitionBy: Seq[String] = Nil)(build: => DataFrame): DataFrame = {
    val key = corpusKey(spark, sfDir, table)
    val artRoot = new Path(s"$rootDir/$key/$name")
    val fs = artRoot.getFileSystem(hconf(spark))
    val data = ManifestStore.currentDataPath(fs, artRoot).getOrElse {
      withBuildLock(fs, artRoot) {
        // re-probe inside the lock: a concurrent builder may have
        // promoted while this process waited
        ManifestStore.currentDataPath(fs, artRoot).getOrElse {
          val gen = ManifestStore.nextGen(fs, artRoot)
          // REBALANCE before the write (guide §6): without it every
          // stored artifact lands with shuffle-partition-many files
          // regardless of size (32 files of ~15 KB each at the bench
          // tier — measured), and every serve pays the per-file
          // open/footer cost; AQE sizes the output to
          // advisoryPartitionSizeInBytes instead (one file for a tiny
          // artifact, ~64 MB files at scale). Partitioned layouts
          // rebalance BY the partition columns so one directory gets
          // one writer, not one file per (task × partition value).
          val sized =
            if (partitionBy.nonEmpty)
              build.hint("rebalance",
                partitionBy.map(org.apache.spark.sql.functions.col): _*)
            else build.hint("rebalance")
          sized.write.mode("overwrite").partitionBy(partitionBy: _*)
            .parquet(ManifestStore.stagingPath(artRoot, gen).toString)
          ManifestStore.promote(fs, artRoot, gen)
          ManifestStore.gc(fs, artRoot)
          gcStale(fs, new Path(rootDir), keyPrefix(sfDir, table), key)
          ManifestStore.currentDataPath(fs, artRoot).get
        }
      }
    }
    spark.read.parquet(data.toString)
  }

  /** [[parquet]] written PARTITIONED by a low-cardinality attribute
    * column — the scoped-index layout: a filter on the partition
    * column prunes whole directories at PLAN time (PartitionFilters),
    * so an attribute-scoped serve never opens the other scopes' files
    * at all. The high-cardinality complement is the attribute-EMBEDDED
    * row layout (q_llm_ann_filtered's code table), where the predicate
    * prunes row groups via PushedFilters instead. Same manifest
    * promote/GC discipline as [[parquet]] (shared [[parquetAt]] body);
    * partition directories ride inside the immutable generation. */
  def partitionedParquet(spark: SparkSession, sfDir: String,
      name: String, partCol: String,
      table: String = "documents")(build: => DataFrame): DataFrame =
    parquetAt(spark, root, sfDir, name, table,
      partitionBy = Seq(partCol))(build)

  /** Whether a promoted generation already exists for this artifact
    * under the current corpus key — the probe a one-time migration
    * gate needs ([[Similarity.storedCodesOf]]'s legacy-layout
    * reclaim runs only when the REPLACEMENT artifact was just built,
    * never on the steady-state read path). */
  def artifactExists(spark: SparkSession, sfDir: String, name: String,
      table: String = "documents"): Boolean = {
    val dir = new Path(s"$root/${corpusKey(spark, sfDir, table)}/$name")
    val fs = dir.getFileSystem(hconf(spark))
    ManifestStore.currentDataPath(fs, dir).isDefined
  }

  /** Delete a retired artifact name under the current corpus key — the
    * migration hook for LAYOUT renames (e.g. the round-12
    * seg_ivfpq_full→_attr code-table change): [[gcStale]] collects
    * stale corpus KEYS, but a renamed artifact under a still-live key
    * (its siblings still read) is dead bytes nothing else reclaims.
    * Idempotent; a no-op when the name never existed. */
  def dropArtifact(spark: SparkSession, sfDir: String, name: String,
      table: String = "documents"): Unit = {
    val dir = new Path(s"$root/${corpusKey(spark, sfDir, table)}/$name")
    val fs = dir.getFileSystem(hconf(spark))
    if (fs.exists(dir)) fs.delete(dir, true)
  }

  /** A [[graft.streaming.GenerationLog]]-MAINTAINED artifact root per
    * corpus content: `build` receives the root directory and commits
    * generations through the log's own protocol (mergeBatch /
    * compact); a `_READY` marker written after the build completes
    * makes later calls skip it. Crash-safe without coordination: a
    * build that died mid-way left no marker, and the retry's
    * generation commits are idempotent (covered batch ids no-op), so
    * re-running `build` from the top converges on the same state.
    * This is the seam for queries that SERVE off pinned
    * generation-log states (readAt) rather than a flat promoted
    * artifact. */
  def maintainedRoot(spark: SparkSession, sfDir: String, name: String,
      table: String = "documents")(build: String => Unit): String = {
    val key = corpusKey(spark, sfDir, table)
    val dir = s"$root/$key/$name"
    val fs = new Path(dir).getFileSystem(hconf(spark))
    val ready = new Path(dir, "_READY")
    if (!fs.exists(ready)) withBuildLock(fs, new Path(dir)) {
      // re-probe inside the lock (see withBuildLock)
      if (!fs.exists(ready)) {
        build(dir)
        if (!fs.createNewFile(ready) && !fs.exists(ready))
          throw new java.io.IOException(s"ready-marker write failed: $ready")
        gcStale(fs, new Path(root), keyPrefix(sfDir, table), key)
      }
    }
    dir
  }

  /** A `buckets`-way hash-bucketed, in-bucket-sorted catalog table per
    * corpus content. First build per corpus writes a generation and
    * promotes it; later SESSIONS register the promoted files with one
    * external-table DDL (bucket spec + location — metadata only, no
    * rewrite); later CALLS in one session are a catalog hit. */
  def bucketedTable(spark: SparkSession, sfDir: String, name: String,
      key: String, buckets: Int = 32,
      table: String = "documents")(build: => DataFrame): DataFrame =
    bucketedTableAt(spark, root, sfDir, name, key, buckets, table)(build)

  /** [[bucketedTable]] with an explicit store root (the spec seam). */
  def bucketedTableAt(spark: SparkSession, rootDir: String, sfDir: String,
      name: String, key: String, buckets: Int = 32,
      table: String = "documents")(build: => DataFrame): DataFrame = {
    val corpus = corpusKey(spark, sfDir, table)
    val tbl = s"graft_idx_${name}_$corpus".toLowerCase
    if (!spark.catalog.tableExists(tbl)) {
      val artRoot = new Path(s"$rootDir/wh/$tbl")
      val fs = artRoot.getFileSystem(hconf(spark))
      withBuildLock(fs, artRoot) {
      // a promoted generation WITHOUT a _bucketspec predates the spec
      // guard (or lost it): treat it as unpromoted and rebuild — one
      // fresh generation supersedes it via the normal manifest swap
      ManifestStore.currentDataPath(fs, artRoot)
          .filter(d => fs.exists(new Path(d, "_bucketspec"))) match {
        case Some(data) =>
          // promoted by an earlier session: registration only. The
          // bucket spec is read from the _bucketspec file the WRITER
          // left in the generation — bucket ids ride in the part-file
          // names, so registering a different spec over the same files
          // would silently mis-route the exchange-free join (rows
          // hashed mod N against files laid out mod M). A caller
          // whose spec drifted from the stored one fails loudly here.
          val in = fs.open(new Path(data, "_bucketspec"))
          val spec = try scala.io.Source.fromInputStream(in, "UTF-8")
              .getLines().flatMap(_.split("=", 2) match {
                case Array(k, v) => Some(k.trim -> v.trim)
                case _ => None
              }).toMap
            finally in.close()
          if (spec("key") != key || spec("buckets").toInt != buckets)
            throw new java.io.IOException(
              s"bucket-spec drift on $tbl: stored (key=${spec("key")}, " +
                s"buckets=${spec("buckets")}) vs requested (key=$key, " +
                s"buckets=$buckets) — a rebuild, not a registration")
          val schema = spark.read.parquet(data.toString).schema.toDDL
          spark.sql(s"CREATE TABLE $tbl ($schema) USING PARQUET " +
            s"CLUSTERED BY ($key) SORTED BY ($key) INTO $buckets BUCKETS " +
            s"LOCATION '$data'")
        case None =>
          val gen = ManifestStore.nextGen(fs, artRoot)
          val staging = ManifestStore.stagingPath(artRoot, gen)
          build.write.mode("overwrite")
            .bucketBy(buckets, key)
            .sortBy(key)
            .option("path", staging.toString)
            .format("parquet")
            .saveAsTable(tbl)
          val out = fs.create(new Path(staging, "_bucketspec"), true)
          try out.write(s"key=$key\nbuckets=$buckets\n".getBytes("UTF-8"))
          finally out.close()
          ManifestStore.promote(fs, artRoot, gen)
          ManifestStore.gc(fs, artRoot)
          gcStale(fs, new Path(s"$rootDir/wh"),
            s"graft_idx_${name}_${keyPrefix(sfDir, table)}".toLowerCase, tbl)
      }
      }
    }
    spark.table(tbl)
  }
}

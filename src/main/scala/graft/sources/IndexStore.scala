package graft.sources

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
  * Two layouts:
  *  - [[parquet]]: plain parquet under `.segcache/` (gitignored),
  *    keyed by the SOURCE TABLE's byte size + newest mtime so a
  *    regenerated tier invalidates naturally; reused across sessions
  *    via the writer's own `_SUCCESS` marker. Stale sibling keys
  *    (older regenerations of the same corpus+table) are GC'd when a
  *    new key is first built.
  *  - [[bucketedTable]]: a hash-BUCKETED catalog table
  *    ([[Warehouse.writeBucketed]]'s layout with an explicit path) —
  *    term-bucketed postings and df tables joined on `term` plan with
  *    ZERO Exchange on either side, the vocab-exceeds-broadcast
  *    fallback and the repeated-serving shape. Bucket metadata lives
  *    in the (in-memory) session catalog, so a fresh session rebuilds
  *    the table once — the production pre-pay, amortized over every
  *    serve in the session. Stale same-variant table dirs under
  *    `wh/` are GC'd on rebuild the same way.
  */
object IndexStore {

  private def root: String =
    sys.env.getOrElse("SPARK_GRAFT_SEG_DIR", "/root/repo/.segcache")

  /** Corpus-content key: `<sanitized sfDir>__<table>_<size>_<mtime>`.
    * The source-table tag means a regenerated tier (same path, new
    * content — even at an identical byte length) never reuses a stale
    * cache, and keys for artifacts derived from DIFFERENT tables of
    * one sf dir (documents vs embeddings) invalidate independently.
    * `table` must be the table the stored artifact derives from. */
  def corpusKey(sfDir: String, table: String = "documents"): String =
    s"${keyPrefix(sfDir, table)}${tableTag(sfDir, table)}"

  private def keyPrefix(sfDir: String, table: String): String =
    sfDir.replaceAll("[^A-Za-z0-9]", "_") + "__" + table + "_"

  private def tableTag(sfDir: String, table: String): String = {
    def len(f: java.io.File): Long =
      if (f.isDirectory) f.listFiles().map(len).sum else f.length()
    def mt(f: java.io.File): Long =
      if (f.isDirectory) (0L +: f.listFiles().toSeq.map(mt)).max
      else f.lastModified()
    val src = new java.io.File(s"$sfDir/$table.parquet")
    if (src.exists()) s"${len(src)}_${mt(src)}" else "0"
  }

  /** Delete sibling dirs under `parent` that share `prefix` but are
    * not `current` — stale keys from older regenerations of the same
    * corpus+table. Correctness never depends on these deletes (a
    * stale key is simply never addressed again); this bounds disk
    * growth across driver regenerations. */
  private def gcStale(parent: String, prefix: String,
      current: String): Unit = {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    val d = new java.io.File(parent)
    if (d.isDirectory)
      d.listFiles().filter(f => f.getName.startsWith(prefix) &&
          f.getName != current)
        .foreach(rm)
  }

  /** Write `build` to parquet once (skipped when the writer's own
    * `_SUCCESS` marker already exists) and return a reader over it. */
  def parquet(spark: SparkSession, sfDir: String, name: String,
      table: String = "documents")(build: => DataFrame): DataFrame = {
    val key = corpusKey(sfDir, table)
    val dir = s"$root/$key/$name"
    if (!new java.io.File(s"$dir/_SUCCESS").exists()) {
      build.write.mode("overwrite").parquet(dir)
      gcStale(root, keyPrefix(sfDir, table), key)
    }
    spark.read.parquet(dir)
  }

  /** Write `build` as a `buckets`-way hash-bucketed, in-bucket-sorted
    * external table once per session and return the catalog reader
    * (bucket metadata only lives in the session catalog, so presence
    * is a catalog check, not a filesystem check). */
  def bucketedTable(spark: SparkSession, sfDir: String, name: String,
      key: String, buckets: Int = 32,
      table: String = "documents")(build: => DataFrame): DataFrame = {
    val corpus = corpusKey(sfDir, table)
    val tbl = s"graft_idx_${name}_$corpus".toLowerCase
    if (!spark.catalog.tableExists(tbl)) {
      build.write.mode("overwrite")
        .bucketBy(buckets, key)
        .sortBy(key)
        .option("path", s"$root/wh/$tbl")
        .format("parquet")
        .saveAsTable(tbl)
      gcStale(s"$root/wh",
        s"graft_idx_${name}_${keyPrefix(sfDir, table)}".toLowerCase, tbl)
    }
    spark.table(tbl)
  }
}

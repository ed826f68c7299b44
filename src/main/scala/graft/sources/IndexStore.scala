package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Materialized storage for the build → store → serve split's STORED
  * half: index artifacts (postings segments, vocab-sized df tables,
  * doc-id manifests) written once per (corpus, variant) and read back
  * as plain scans, so queries that model "serve from / merge into the
  * stored index" actually measure the serve/merge — not an in-plan
  * rebuild of the stored side each run (the round-9 bench-harness
  * caveat: `_inc` timings tracked index size because the stored index
  * was re-derived inside every rep).
  *
  * Two layouts:
  *  - [[parquet]]: plain parquet under `.segcache/` (gitignored),
  *    keyed by the corpus file's byte size so a regenerated tier
  *    invalidates naturally; reused across sessions via the writer's
  *    own `_SUCCESS` marker.
  *  - [[bucketedTable]]: a hash-BUCKETED catalog table
  *    ([[Warehouse.writeBucketed]]'s layout with an explicit path) —
  *    term-bucketed postings and df tables joined on `term` plan with
  *    ZERO Exchange on either side, the vocab-exceeds-broadcast
  *    fallback and the repeated-serving shape. Bucket metadata lives
  *    in the (in-memory) session catalog, so a fresh session rebuilds
  *    the table once — the production pre-pay, amortized over every
  *    serve in the session.
  */
object IndexStore {

  private def root: String =
    sys.env.getOrElse("SPARK_GRAFT_SEG_DIR", "/root/repo/.segcache")

  /** Corpus-content key: the sf dir sanitized plus the source table
    * file's total byte size AND newest mtime, so a driver-regenerated
    * tier (same path, new content — even at an identical byte length)
    * never reuses a stale cache. `table` must be the table the stored
    * artifact derives from (documents for text indexes, embeddings
    * for vector ones). */
  def corpusKey(sfDir: String, table: String = "documents"): String = {
    def len(f: java.io.File): Long =
      if (f.isDirectory) f.listFiles().map(len).sum else f.length()
    def mt(f: java.io.File): Long =
      if (f.isDirectory) (0L +: f.listFiles().toSeq.map(mt)).max
      else f.lastModified()
    val src = new java.io.File(s"$sfDir/$table.parquet")
    val tag = if (src.exists()) s"${len(src)}_${mt(src)}" else "0"
    sfDir.replaceAll("[^A-Za-z0-9]", "_") + "_" + tag
  }

  /** Write `build` to parquet once (skipped when the writer's own
    * `_SUCCESS` marker already exists) and return a reader over it. */
  def parquet(spark: SparkSession, sfDir: String, name: String,
      table: String = "documents")(build: => DataFrame): DataFrame = {
    val dir = s"$root/${corpusKey(sfDir, table)}/$name"
    if (!new java.io.File(s"$dir/_SUCCESS").exists())
      build.write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  /** Write `build` as a `buckets`-way hash-bucketed, in-bucket-sorted
    * external table once per session and return the catalog reader
    * (bucket metadata only lives in the session catalog, so presence
    * is a catalog check, not a filesystem check). */
  def bucketedTable(spark: SparkSession, sfDir: String, name: String,
      key: String, buckets: Int = 32)(build: => DataFrame): DataFrame = {
    val table = s"graft_idx_${name}_${corpusKey(sfDir)}".toLowerCase
    if (!spark.catalog.tableExists(table))
      build.write.mode("overwrite")
        .bucketBy(buckets, key)
        .sortBy(key)
        .option("path", s"$root/wh/$table")
        .format("parquet")
        .saveAsTable(table)
    spark.table(table)
  }
}

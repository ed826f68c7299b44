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

  /** Train + encode in one call: [[Similarity.ivfPqTrain]] then
    * [[Similarity.ivfPqEncode]] over the corpus. */
  def build(vecs: DataFrame, coarseStride: Int, m: Int, dim: Int,
      bookStride: Int, iters: Int = 0,
      temps: TempCache = TempCache.noop): IvfPqIndex = {
    val (coarse, books) = Similarity.ivfPqTrain(vecs, coarseStride, m,
      dim, bookStride, iters, temps)
    IvfPqIndex(m, dim, coarse, books,
      Similarity.ivfPqEncode(vecs, coarse, books, m, dim))
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
    index.coarse.write.mode("overwrite").parquet(s"$staged/coarse")
    index.books.write.mode("overwrite").parquet(s"$staged/books")
    index.codes.write.mode("overwrite").parquet(s"$staged/codes")
    val out = fs.create(new Path(staged, ConfFile), true)
    try out.write(s"m=${index.m}\ndim=${index.dim}\n".getBytes("UTF-8"))
    finally out.close()
    ManifestStore.promote(fs, rootPath, gen)
    ManifestStore.gc(fs, rootPath)
  }

  /** Load the live generation: config from its manifest, tables from
    * its immutable directory. Raises if nothing was ever promoted. */
  def load(spark: SparkSession, root: String): IvfPqIndex = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = ManifestStore.currentDataPath(fs, rootPath).getOrElse(
      throw new IllegalStateException(
        s"no promoted index generation under $root"))
    val in = fs.open(new Path(dir, ConfFile))
    val conf =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .flatMap { l =>
          l.split("=", 2) match {
            case Array(k, v) => Some(k.trim -> v.trim)
            case _ => None
          }
        }.toMap
      finally in.close()
    IvfPqIndex(
      m = conf("m").toInt,
      dim = conf("dim").toInt,
      coarse = spark.read.parquet(s"$dir/coarse"),
      books = spark.read.parquet(s"$dir/books"),
      codes = spark.read.parquet(s"$dir/codes"))
  }
}

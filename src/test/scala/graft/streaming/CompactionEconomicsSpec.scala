package graft.streaming

import graft.SparkSpec
import graft.llm.{IvfPqIndex, Similarity}
import graft.streaming.NightlyMaintenance.Stores
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A MONTH of nightly economics (VERDICT r13 item 5): the two-day
  * ProductionLoopSpec proves composition; this proves the quantities
  * an operator actually watches over 30 synthetic days of the
  * five-family loop with ONE shared compaction budget —
  *
  *  - generation COUNT stays inside the policy bound every day (read
  *    amplification per store and in total never drifts upward),
  *  - every day's WRITE SET stays delta-sized (the fresh arrivals,
  *    never the accumulated corpus),
  *  - accumulation is exactly-once across all 30 merges + folds,
  *  - a mid-month PIN stays byte-stable through two more weeks of
  *    merges and compactions (deferred GC), and the garbage is
  *    EVENTUALLY collected — after which live reads are unchanged.
  *
  * Wall-clock flatness at tier scale is StreamSoak `nightly5`'s job;
  * here the flatness claims are structural (row counts), which is
  * what makes them assertable. */
class CompactionEconomicsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(n: String) =
    java.nio.file.Files.createTempDirectory(n).toString

  test("30 nightly days under one compaction budget: bounded read amp, " +
    "delta-sized write sets, exactly-once accumulation, durable pin, " +
    "eventual GC") {
    graft.functions.GraftFunctions.register(spark)
    val docs = graft.Tables.load(spark, sf("sf0.01"), "documents")
      .select(col("doc_id"), col("text"), col("lang"))
      .localCheckpoint()
    val embs = graft.Tables.load(spark, sf("sf0.01"), "embeddings")
      .select(col("vec_id").as("doc_id"), col("embedding"))
      .localCheckpoint()

    val codesRoot = tmp("ce_codes")
    val vecs = embs.select(col("doc_id").as("vec_id"), col("embedding"))
    val (coarse, books) = Similarity.ivfPqTrain(vecs, coarseStride = 20,
      m = 4, dim = 64, bookStride = 10, iters = 0)
    IvfPqIndex.initEpochal(IvfPqIndex(4, 64, coarse, books,
      Similarity.ivfPqEncode(vecs.filter(col("vec_id") < 0), coarse,
        books, 4, 64)), codesRoot)
    val scopedRoot = tmp("ce_scoped")
    val stores = Stores(tmp("ce_bm25"), tmp("ce_pos"), tmp("ce_uni"),
      codesRoot, scoped = Some((scopedRoot, "lang")))
    val budget = 6

    def roots: Seq[String] =
      Seq(stores.bm25, stores.positional, stores.unified,
        IvfPqIndex.activeEpochDir(stores.codes)) ++
        NightlyMaintenance.scopesOf(scopedRoot, "lang")
          .map(NightlyMaintenance.scopeDir(scopedRoot, "lang", _))
    def totalAmp: Int = roots.map(GenerationLog.readAmplification).sum

    def day(d: Int): DataFrame = docs
      .filter(pmod(col("doc_id"), lit(30)) === d)
      .join(embs, Seq("doc_id"), "left")

    var pinHash: Seq[(Long, Long)] = Seq.empty
    val checkDays = Set(9, 19, 29)
    (0 until 30).foreach { d =>
      val batch = day(d).localCheckpoint()
      val fresh = batch.select(col("doc_id")).distinct().count()
      NightlyMaintenance.nightlyBatch(stores)(batch, d.toLong)
      if (checkDays(d)) {
        // the day's committed bm25 generation is EXACTLY the fresh
        // arrivals — delta-sized by construction, checked on disk
        // before the fold can absorb it
        val genIds = spark.read.parquet(
          s"${GenerationLog.genDir(stores.bm25, d.toLong)}/doc_ids")
          .count()
        assert(genIds == fresh,
          s"day $d write set $genIds != fresh arrivals $fresh")
      }
      NightlyMaintenance.maybeCompactAll(spark, stores, budget)
      // the quantity the budget bounds: TAIL generations past each
      // store's latest fold. readAmplification = tail + the fold
      // base, so the day-end total is ≤ budget + one base per root.
      assert(totalAmp <= budget + roots.size,
        s"day $d read amp $totalAmp past budget+bases " +
          s"${budget + roots.size}")
      if (d == 14)
        pinHash = IndexMaintenance.readAt(spark, stores.bm25, 14L).get
          .postings.select(col("term"), col("doc_id"))
          .as[(String, Long)].collect().toSeq.sorted
          .map(t => (t._2, t._1.hashCode.toLong))
    }

    // exactly-once accumulation: 30 disjoint merges + arbitrary folds
    // index each document exactly once in every text family
    val allIds = docs.select(col("doc_id")).as[Long].collect().sorted
    Seq(stores.bm25, stores.unified).foreach { r =>
      val got = IndexMaintenance.read(spark, r).get
        .docIds.as[Long].collect().sorted
      assert(got.toSeq == allIds.toSeq, s"$r accumulation drifted")
    }

    // the day-14 pin is byte-stable after two more weeks of merges,
    // folds, and df churn (deferred GC keeps its generation set)
    val pinNow = IndexMaintenance.readAt(spark, stores.bm25, 14L).get
      .postings.select(col("term"), col("doc_id"))
      .as[(String, Long)].collect().toSeq.sorted
      .map(t => (t._2, t._1.hashCode.toLong))
    assert(pinNow == pinHash, "day-14 pin drifted under later maintenance")

    // eventual GC: collect everything the latest folds superseded;
    // the on-disk dir count shrinks and the LIVE read is unchanged
    def dirCount(r: String): Int = {
      val fs = new org.apache.hadoop.fs.Path(r).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      Option(fs.globStatus(new org.apache.hadoop.fs.Path(r, "*gen=*")))
        .map(_.length).getOrElse(0)
    }
    // a final fold makes the GC deterministic even if the shared
    // budget never elected this store in the last window
    IndexMaintenance.compact(spark, stores.bm25)
    val liveBefore = IndexMaintenance.read(spark, stores.bm25).get
      .postings.count()
    val before = dirCount(stores.bm25)
    IndexMaintenance.gcSupersededDirs(stores.bm25)
    IndexMaintenance.gcSupersededDirs(stores.unified)
    GenerationLog.gcSuperseded(stores.positional)
    val after = dirCount(stores.bm25)
    assert(after < before,
      s"GC collected nothing ($before -> $after dirs)")
    assert(IndexMaintenance.read(spark, stores.bm25).get
      .postings.count() == liveBefore, "live read changed under GC")
  }
}

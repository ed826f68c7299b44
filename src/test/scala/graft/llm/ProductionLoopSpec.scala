package graft.llm

import graft.SparkSpec
import graft.streaming.{GenerationLog, IndexMaintenance, NightlyMaintenance}
import graft.streaming.NightlyMaintenance.Stores
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The "day in production" composition: every serving-side piece the
  * engine ships, chained as ONE loop and run for TWO days —
  *
  *   arrive → curation gate → nightly maintenance into all five index
  *   families (BM25, positional, unified, epochal IVF-PQ codes,
  *   lang-scoped) → shared compaction budget → scoped / filtered /
  *   hybrid serving + pinned evaluation → release manifest
  *
  * with the day-2 assertions the 100-TB economics depend on: every
  * store's second-day WRITE SET is delta-sized (exactly the fresh
  * survivors — never the corpus), serving sees day-2 documents
  * immediately, and a day-1 pinned reader stays byte-stable through
  * day 2's merges and compactions. The individual pieces are each
  * spec-pinned elsewhere; this is the end-to-end contract that they
  * compose. (CT ingest has its own crash/replay loop, IngestSpec —
  * certificates don't flow into the document pipeline.) */
class ProductionLoopSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(n: String) =
    java.nio.file.Files.createTempDirectory(n).toString

  test("two days in production: curate → 5-family nightly → serve " +
    "(scoped + filtered + hybrid + pinned eval) → manifest; day-2 " +
    "write sets are delta-sized everywhere and the day-1 pin survives") {
    graft.functions.GraftFunctions.register(spark)
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val embs = graft.Tables.load(spark, sf0001, "embeddings")

    // ---- the arrival split: day 1 = even ids, day 2 = odd ids ----
    def arrivals(day: Int): DataFrame =
      docs.filter(pmod(col("doc_id"), lit(2)) === (day - 1))
        .withColumn("event_ts",
          timestamp_millis(lit(1700000000000L) + col("doc_id")))

    // ---- the curation gate (the streaming gate, replayed in batch:
    // the per-batch transform IS the batch transform) + the encoder
    // riding the stream (embedding, label) and the scope attr ----
    def curated(day: Int): DataFrame =
      StreamingCuration.streamingCurate(
          arrivals(day).select(col("doc_id"), col("source"),
            col("event_ts"), col("text")))
        .filter(col("keep"))
        .select(col("doc_id"), col("cleaned").as("text"))
        .join(arrivals(day).select(col("doc_id"), col("lang"),
          col("source")), Seq("doc_id"))
        .join(embs.select(col("vec_id").as("doc_id"), col("embedding"),
          col("label")), Seq("doc_id"), "left")
        .localCheckpoint()

    // ---- the five maintained families; epoch 0 is ATTR-EMBEDDED so
    // filtered ANN serving works off the maintained codes ----
    val codesRoot = tmp("pl_codes")
    val scopedRoot = tmp("pl_scoped")
    val vecs = embs.select(col("vec_id"), col("embedding"), col("label"))
    val (coarse, books) = Similarity.ivfPqTrain(
      vecs.select(col("vec_id"), col("embedding")),
      coarseStride = 100, m = 4, dim = 64, bookStride = 50, iters = 0)
    IvfPqIndex.initEpochal(IvfPqIndex(4, 64, coarse, books,
      Similarity.ivfPqEncode(vecs.filter(col("vec_id") < 0), coarse,
        books, 4, 64, attrs = Seq("label"))), codesRoot)
    val stores = Stores(tmp("pl_bm25"), tmp("pl_pos"), tmp("pl_uni"),
      codesRoot, scoped = Some((scopedRoot, "lang")))

    // ---- serving surfaces, all off MAINTAINED state ----
    def seg = IndexMaintenance.read(spark, stores.bm25).get
    def idx = IvfPqIndex.loadEpochal(spark, codesRoot)
    def indexedIds: Set[Long] = seg.docIds.collect()
      .map(_.getLong(0)).toSet
    def queriesOf(ids: Seq[Long]) =
      docs.filter(col("doc_id").isin(ids: _*))
    def statsOf(ids: Set[Long]) = Retrieval.corpusStats(
      docs.filter(col("doc_id").isin(ids.toSeq: _*)))
    def textServe(qids: Seq[Long]): DataFrame =
      Retrieval.bm25TopKFromSegmentsPushed(seg, statsOf(indexedIds),
        Retrieval.queryTerms(queriesOf(qids)))
    def vecServe(qids: Seq[Long]): DataFrame =
      idx.topKFiltered(
          embs.filter(col("vec_id").isin(qids: _*))
            .select(col("vec_id"), col("embedding")),
          k = 10, pred = col("label") === 1, probes = 2)
        .select(col("q_id").as("query_id"), col("rank"),
          col("neighbor_id").as("doc_id"))
    def manifest(): Map[String, (Long, Long)] = {
      val ids = IndexMaintenance.read(spark, stores.unified).get.docIds
      docs.join(ids, Seq("doc_id"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"),
          sum(crc32(col("text"))).as("checksum"))
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2))).toMap
    }

    // ================= DAY 1 =================
    val day1 = curated(1)
    val day1Ids = day1.select(col("doc_id")).collect()
      .map(_.getLong(0)).toSet
    assert(day1Ids.nonEmpty && day1Ids.size < 300)
    NightlyMaintenance.nightlyBatch(stores)(day1, 0L)
    NightlyMaintenance.maybeCompactAll(spark, stores, maxTotalTailGens = 8)

    assert(indexedIds == day1Ids, "day-1 store must hold the survivors")
    val qids = day1Ids.toSeq.sorted.take(3)
    val text1 = textServe(qids).collect().map(_.toSeq).toSet
    assert(text1.nonEmpty)
    val vec1 = vecServe(qids)
    val vec1Hits = vec1.select(col("doc_id")).collect()
      .map(_.getLong(0)).toSet
    val label1 = embs.filter(col("label") === 1)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(vec1Hits.nonEmpty && vec1Hits.subsetOf(label1 & day1Ids),
      "filtered ANN must serve only in-predicate, indexed vectors")
    assert(Retrieval.rrfFuse(textServe(qids), vec1).count() > 0,
      "hybrid fusion must serve off the two maintained stores")
    // scoped serving off the maintained per-scope store
    val en1 = NightlyMaintenance.readScope(spark, scopedRoot,
      "lang", "en").get
    val en1Ids = en1.docIds.collect().map(_.getLong(0)).toSet
    val enAll = docs.filter(col("lang") === "en")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(en1Ids == (enAll & day1Ids), "en scope must hold exactly " +
      "day-1's en survivors")
    // the day-1 evaluation pin + manifest
    def pinnedDump() = Retrieval.segDenormalize(
        IndexMaintenance.readAt(spark, stores.unified, 0L).get)
      .select(col("term"), col("doc_id"), col("tf"), col("dl"), col("df"))
      .orderBy("term", "doc_id").collect().map(_.toSeq).toSeq
    val pin1 = pinnedDump()
    val man1 = manifest()
    assert(man1.values.map(_._1).sum == day1Ids.size)

    // ================= DAY 2 =================
    val day2 = curated(2)
    val day2Ids = day2.select(col("doc_id")).collect()
      .map(_.getLong(0)).toSet
    NightlyMaintenance.nightlyBatch(stores)(day2, 1L)
    NightlyMaintenance.maybeCompactAll(spark, stores, maxTotalTailGens = 8)

    // --- the economics: every family's day-2 WRITE SET is exactly
    // the fresh survivors, never the corpus ---
    def genIds(root: String, sub: String, idCol: String): Set[Long] =
      spark.read.parquet(s"${GenerationLog.genDir(root, 1L)}/$sub")
        .select(col(idCol)).distinct().collect()
        .map(_.getLong(0)).toSet
    assert(genIds(stores.bm25, "doc_ids", "doc_id") == day2Ids,
      "bm25 day-2 write set must be delta-sized")
    assert(genIds(stores.unified, "doc_ids", "doc_id") == day2Ids,
      "unified day-2 write set must be delta-sized")
    assert(genIds(stores.positional, "doc_ids", "doc_id") == day2Ids,
      "positional day-2 write set must be delta-sized")
    assert(genIds(IvfPqIndex.activeEpochDir(codesRoot), "codes",
      "vec_id") == day2Ids,
      "codes day-2 write set must be delta-sized")
    for (v <- NightlyMaintenance.scopesOf(scopedRoot, "lang")) {
      val d = GenerationLog.genDir(
        NightlyMaintenance.scopeDir(scopedRoot, "lang", v), 1L)
      val inScope = docs.filter(col("lang") === v)
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
      if (GenerationLog.fsOf(d).exists(GenerationLog.marker(d)))
        assert(spark.read.parquet(s"$d/doc_ids").select(col("doc_id"))
          .collect().map(_.getLong(0)).toSet == (inScope & day2Ids),
          s"scope $v day-2 write set must be delta-sized")
    }

    // --- serving sees day 2 immediately ---
    assert(indexedIds == (day1Ids ++ day2Ids))
    val qids2 = day2Ids.toSeq.sorted.take(3)
    assert(textServe(qids2).count() > 0)
    val vec2Hits = vecServe(qids2).select(col("doc_id")).collect()
      .map(_.getLong(0)).toSet
    assert(vec2Hits.subsetOf(label1 & (day1Ids ++ day2Ids)))
    val en2Ids = NightlyMaintenance.readScope(spark, scopedRoot,
      "lang", "en").get.docIds.collect().map(_.getLong(0)).toSet
    assert(en2Ids == (enAll & (day1Ids ++ day2Ids)))

    // --- the day-1 pin is byte-stable through day 2 ---
    assert(pinnedDump() == pin1,
      "the day-1 pinned evaluation state must survive day 2")

    // --- the release manifest moved by exactly the fresh docs ---
    val man2 = manifest()
    assert(man2.values.map(_._1).sum == day1Ids.size + day2Ids.size)
    val srcDelta = day2 .groupBy(col("source")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((src, (n2, _)) <- man2)
      assert(n2 == man1.get(src).map(_._1).getOrElse(0L) +
        srcDelta.getOrElse(src, 0L),
        s"manifest for $src must move by exactly day-2's survivors")

    // --- replayed day: the whole second day no-ops in every store ---
    val before = (manifest(), indexedIds, en2Ids)
    NightlyMaintenance.nightlyBatch(stores)(day2, 1L)
    assert((manifest(), indexedIds,
      NightlyMaintenance.readScope(spark, scopedRoot, "lang", "en").get
        .docIds.collect().map(_.getLong(0)).toSet) == before,
      "a replayed day must no-op across all five families")
  }
}

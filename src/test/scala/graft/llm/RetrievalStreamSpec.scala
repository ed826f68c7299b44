package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming BM25 serving: the chained-streaming-aggregation path
  * (windowed per-(query, doc) sum → windowed bounded top-k) pinned
  * result-equal to batch serving from the same frozen postings. */
class RetrievalStreamSpec extends SparkSpec {
  import spark.implicits._

  private case class Query(query_id: Long, event_ts: java.sql.Timestamp,
      text: String)
  private def q(id: Long, minute: Int, text: String) =
    Query(id, new java.sql.Timestamp(minute * 60000L), text)

  test("IndexMaintenance: streamed nightly merges == batch full build; " +
    "crash before the commit marker replays identically; committed " +
    "replay is a no-op") {
    import graft.streaming.IndexMaintenance
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("idxmaint").toString
    val ckpt = java.nio.file.Files.createTempDirectory("idxmaint_ck").toString
    val allDocs = ((0L until 8L).map(i => (i, s"w${i % 5} w${i % 3} shared")) ++
      (8L until 12L).map(i => (i, s"fresh$i w${i % 5} shared")))
    def dump(seg: IndexSegments) = Retrieval.segDenormalize(seg)
      .select(col("term"), col("doc_id"), col("tf"), col("dl"), col("df"),
        array_join(col("positions"), ",").as("positions"))
      .orderBy("term", "doc_id").collect().map(_.toSeq).toSeq
    val batchBuild = dump(Retrieval.segBuildUnified(
      allDocs.toDF("doc_id", "text")))

    // two nightly runs over one checkpoint → two generations, the
    // second including replayed ids 6-7 (at-least-once upstream) that
    // the manifest anti join must drop
    val in = MemoryStream[(Long, String)]
    def run(): Unit = {
      val s = IndexMaintenance.start(
        in.toDF().toDF("doc_id", "text"), root, ckpt)
      s.awaitTermination()
    }
    in.addData(allDocs.take(8): _*)
    run()
    in.addData(allDocs.drop(6): _*) // overlap: 6,7 already indexed
    run()
    assert(IndexMaintenance.committedGens(root).size == 2,
      IndexMaintenance.committedGens(root).toString)
    val streamed = IndexMaintenance.read(spark, root).get
    assert(dump(streamed) == batchBuild, "stream-maintained != batch build")
    // fresh postings of gen 1 are delta-only: ids 8-11, never 6-7
    val gen1Ids = spark.read.parquet(
        s"$root/gen=${"%020d".format(1)}/doc_ids")
      .collect().map(_.getLong(0)).toSet
    assert(gen1Ids == Set(8L, 9L, 10L, 11L), gen1Ids.toString)

    // CRASH LEG A — killed between the data writes and the marker:
    // byte-for-byte, gen 1 exists but uncommitted. foreachBatch then
    // replays batchId 1 over the same pre-state (gen 0 only) and must
    // rebuild gen 1 identically.
    val delta2 = allDocs.drop(6).toDF("doc_id", "text")
    assert(new java.io.File(
      s"$root/gen=${"%020d".format(1)}/_COMMITTED").delete())
    IndexMaintenance.mergeBatch(root)(delta2, 1L)
    assert(dump(IndexMaintenance.read(spark, root).get) == batchBuild,
      "replay after marker loss must restore the exact state")

    // CRASH LEG B — killed after the marker, before the checkpoint
    // commit: the replayed batchId is a committed generation and must
    // be a complete no-op (no duplicate postings, df untouched)
    val before = dump(IndexMaintenance.read(spark, root).get)
    IndexMaintenance.mergeBatch(root)(delta2, 1L)
    assert(dump(IndexMaintenance.read(spark, root).get) == before,
      "committed replay must not change the index")

    // COMPACTION — fold the two generations into one cgen: state
    // byte-identical, superseded dirs GC'd, and the protocol stays
    // monotone (an uncommitted compaction is invisible)
    IndexMaintenance.compact(spark, root, gcSuperseded = true)
    assert(IndexMaintenance.committedCgens(root) == Seq(1L))
    assert(IndexMaintenance.committedGens(root).isEmpty,
      "superseded generation dirs must be GC'd")
    assert(dump(IndexMaintenance.read(spark, root).get) == batchBuild,
      "compaction must not change the state")
    // a checkpoint replay of a compacted-away batchId is a no-op
    IndexMaintenance.mergeBatch(root)(delta2, 1L)
    assert(IndexMaintenance.committedGens(root).isEmpty &&
      dump(IndexMaintenance.read(spark, root).get) == batchBuild)
    // merges continue on top of the compaction (batchIds are
    // monotone past it), and a second compact folds again
    in.addData((12L, "brandnew w0 shared"))
    run()
    val withNew = dump(Retrieval.segBuildUnified(
      (allDocs :+ (12L, "brandnew w0 shared")).toDF("doc_id", "text")))
    assert(dump(IndexMaintenance.read(spark, root).get) == withNew)
    IndexMaintenance.compact(spark, root, gcSuperseded = true)
    assert(IndexMaintenance.committedCgens(root) == Seq(2L) &&
      dump(IndexMaintenance.read(spark, root).get) == withNew)

    // CRASH LEG C — a compaction killed between its marker and its
    // GC leaves committed-but-superseded dirs behind: readers must
    // ignore them and the next compact() must finish the GC instead
    // of wedging on a self-overwrite
    val stale = s"$root/gen=${"%020d".format(1)}"
    val junk = Seq((99L, "junk")).toDF("doc_id", "text")
    junk.write.parquet(s"$stale/postings")
    junk.write.parquet(s"$stale/df")
    junk.write.parquet(s"$stale/doc_ids")
    assert(new java.io.File(stale, "_COMMITTED").createNewFile())
    assert(IndexMaintenance.committedGens(root) == Seq(1L))
    assert(dump(IndexMaintenance.read(spark, root).get) == withNew,
      "a superseded committed gen must be invisible to readers")
    IndexMaintenance.compact(spark, root, gcSuperseded = true)
    assert(IndexMaintenance.committedGens(root).isEmpty &&
      IndexMaintenance.committedCgens(root) == Seq(2L) &&
      dump(IndexMaintenance.read(spark, root).get) == withNew,
      "compact() must finish an interrupted GC without refolding")

    // and the maintained index actually serves (fresh read: the
    // pre-crash `streamed` frames point at the replaced gen-1 files)
    val served = Retrieval.bm25TopKFromSegments(
      IndexMaintenance.read(spark, root).get,
      allDocs.toDF("doc_id", "text")
        .agg(count(lit(1)).as("n_docs"),
          (sum(size(split(col("text"), " ")).cast("long")).cast("double") /
            count(lit(1)).cast("double")).as("avgdl")),
      Retrieval.queryTerms(allDocs.take(2).toDF("doc_id", "text")), k = 3)
    assert(served.count() > 0)
  }

  test("ingest → stateless curation gate → nightly index generations: " +
    "the maintained index equals a batch build over the batch-curated " +
    "corpus") {
    import graft.streaming.IndexMaintenance
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("idxcur").toString
    val ckpt = java.nio.file.Files.createTempDirectory("idxcur_ck").toString
    // docs 0-5 pass the rule gates; 6 is a shingle-loop page and 7 is
    // too short — both must never reach the index
    val good = (0L until 6L).map(i => (i, "src", ts(i),
      s"the quick brown fox jumps over a lazy dog number$i and then " +
        s"walks away to rest for a while before it returns again"))
    val bad = Seq(
      (6L, "src", ts(6), ("spam ham " * 40).trim),
      (7L, "src", ts(7), "too short"))
    val in = MemoryStream[(Long, String, java.sql.Timestamp, String)]
    val curated = StreamingCuration.streamingCurate(
        in.toDF().toDF("doc_id", "source", "event_ts", "text"))
      .filter(col("keep"))
      .select(col("doc_id"), col("cleaned").as("text"))
    in.addData(good ++ bad: _*) // before start: AvailableNow snapshots offsets
    IndexMaintenance.start(curated, root, ckpt).awaitTermination()
    // batch reference: the SAME gate applied in batch, then a full
    // unified build over the survivors
    val batchCurated = StreamingCuration.streamingCurate(
        (good ++ bad).toDF("doc_id", "source", "event_ts", "text"))
      .filter(col("keep"))
      .select(col("doc_id"), col("cleaned").as("text"))
    def dump(seg: IndexSegments) = Retrieval.segDenormalize(seg)
      .select(col("term"), col("doc_id"), col("tf"), col("dl"), col("df"),
        array_join(col("positions"), ",").as("positions"))
      .orderBy("term", "doc_id").collect().map(_.toSeq).toSeq
    val got = dump(IndexMaintenance.read(spark, root).get)
    assert(got == dump(Retrieval.segBuildUnified(batchCurated)), "drift")
    val ids = IndexMaintenance.read(spark, root).get.docIds
      .collect().map(_.getLong(0)).toSet
    assert(ids == (0L until 6L).toSet, s"gated docs leaked: $ids")
  }

  test("one nightly driver for ALL FOUR index families: ingest → curate " +
    "→ BM25 + positional + unified + IVF-PQ generations per batch; each " +
    "store equals its batch build; the shared compaction budget folds " +
    "the longest tails; the fan-out replays exactly-once per store") {
    import graft.streaming.{GenerationLog, IndexMaintenance,
      NightlyMaintenance}
    import graft.streaming.NightlyMaintenance.Stores
    implicit val sqlCtx = spark.sqlContext
    graft.functions.GraftFunctions.register(spark)
    def tmp(n: String) =
      java.nio.file.Files.createTempDirectory(n).toString
    val stores = Stores(tmp("nb_bm25"), tmp("nb_pos"), tmp("nb_uni"),
      tmp("nb_codes"))
    val ckpt = tmp("nb_ck")
    // docs 0-5 pass the curation gates; 6 (shingle loop) and 7 (too
    // short) must reach NO store
    val good = (0L until 6L).map(i => (i, "src", ts(i),
      s"the quick brown fox jumps over a lazy dog number$i and then " +
        s"walks away to rest for a while before it returns again"))
    val bad = Seq(
      (6L, "src", ts(6), ("spam ham " * 40).trim),
      (7L, "src", ts(7), "too short"))
    def vecOf(i: Long): Seq[Float] =
      Seq.tabulate(8)(j => ((i * (j + 3)) % 23 - 11).toFloat)
    val embTable = (0L until 8L).map(i => i -> vecOf(i))
      .toDF("doc_id", "embedding")

    // the quantizer decision is a batch decision: train on a sample,
    // open epoch 0 with the already-indexed base slice (docs 0-1)
    val trainVecs = embTable.select(col("doc_id").as("vec_id"),
      col("embedding"))
    val (coarse, books) = Similarity.ivfPqTrain(trainVecs,
      coarseStride = 2, m = 2, dim = 8, bookStride = 3, iters = 0)
    IvfPqIndex.initEpochal(IvfPqIndex(2, 8, coarse, books,
      Similarity.ivfPqEncode(trainVecs.filter(col("vec_id") < 2),
        coarse, books, 2, 8)), stores.codes)

    val in = MemoryStream[(Long, String, java.sql.Timestamp, String)]
    val curated = StreamingCuration.streamingCurate(
        in.toDF().toDF("doc_id", "source", "event_ts", "text"))
      .filter(col("keep"))
      .select(col("doc_id"), col("cleaned").as("text"))
      .join(embTable, Seq("doc_id")) // the encoder riding the stream
    def run(): Unit = NightlyMaintenance.start(curated, stores, ckpt,
      maxTotalTailGens = 2).awaitTermination()
    in.addData((good.take(3) ++ bad.take(1)): _*); run()
    in.addData((good.drop(3) ++ bad.drop(1)): _*); run()

    // every family equals its batch build over the batch-curated corpus
    val batchCurated = StreamingCuration.streamingCurate(
        (good ++ bad).toDF("doc_id", "source", "event_ts", "text"))
      .filter(col("keep"))
      .select(col("doc_id"), col("cleaned").as("text"))
      .localCheckpoint()
    def dumpSeg(seg: IndexSegments) = Retrieval.segDenormalize(seg)
      .select(col("term"), col("doc_id"), col("tf"), col("dl"), col("df"))
      .orderBy("term", "doc_id").collect().map(_.toSeq).toSeq
    def dumpPos(pp: org.apache.spark.sql.DataFrame) = pp
      .select(col("term"), col("doc_id"),
        array_join(col("positions"), ",").as("positions"))
      .orderBy("term", "doc_id").collect().map(_.toSeq).toSeq
    def codesOf(idx: IvfPqIndex) = idx.codes.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getSeq[Int](2).toSeq))
      .toMap
    assert(dumpSeg(IndexMaintenance.read(spark, stores.bm25).get) ==
      dumpSeg(Retrieval.segBuild(batchCurated)), "bm25 store drift")
    assert(dumpSeg(IndexMaintenance.read(spark, stores.unified).get) ==
      dumpSeg(Retrieval.segBuildUnified(batchCurated)), "unified drift")
    assert(dumpPos(
      NightlyMaintenance.readPositional(spark, stores.positional).get) ==
      dumpPos(Retrieval.positionalPostings(batchCurated)),
      "positional store drift")
    val wantCodes = codesOf(IvfPqIndex(2, 8, coarse, books,
      Similarity.ivfPqEncode(trainVecs.filter(col("vec_id") < 6),
        coarse, books, 2, 8)))
    assert(codesOf(IvfPqIndex.loadEpochal(spark, stores.codes)) ==
      wantCodes, "code-table drift")
    // gated docs reached NO store
    assert(IndexMaintenance.read(spark, stores.unified).get.docIds
      .collect().map(_.getLong(0)).toSet == (0L until 6L).toSet)

    // the shared budget folded the longest tails: total tail gens
    // across the four stores is within budget
    val roots = Seq(stores.bm25, stores.positional, stores.unified,
      IvfPqIndex.activeEpochDir(stores.codes))
    def tailOf(r: String): Int = {
      val lastCg = GenerationLog.committedCgens(r).lastOption
      GenerationLog.committedGens(r).count(g => lastCg.forall(g > _))
    }
    assert(roots.map(tailOf).sum <= 2,
      s"budget breached: tails=${roots.map(tailOf)}")

    // exactly-once across the fan-out: a direct replay of batch 0
    // no-ops in every store (each is covered by marker or fold)
    val before = (dumpSeg(IndexMaintenance.read(spark, stores.bm25).get),
      dumpSeg(IndexMaintenance.read(spark, stores.unified).get),
      dumpPos(NightlyMaintenance.readPositional(spark,
        stores.positional).get),
      codesOf(IvfPqIndex.loadEpochal(spark, stores.codes)))
    NightlyMaintenance.nightlyBatch(stores)(
      (good.take(3) ++ bad.take(1)).map { case (i, _, _, t) =>
        (i, t, vecOf(i)) }.toDF("doc_id", "text", "embedding"), 0L)
    val after = (dumpSeg(IndexMaintenance.read(spark, stores.bm25).get),
      dumpSeg(IndexMaintenance.read(spark, stores.unified).get),
      dumpPos(NightlyMaintenance.readPositional(spark,
        stores.positional).get),
      codesOf(IvfPqIndex.loadEpochal(spark, stores.codes)))
    assert(before == after, "replayed batch must no-op in every store")

    // the drift-retrain leg of the window: a quiet alarm leaves the
    // epoch alone; a firing one (alarmFactor = 0 forces it) retrains,
    // cuts over, and the store keeps serving the same vector set
    val policy = NightlyMaintenance.RetrainPolicy(
      () => trainVecs.filter(col("vec_id") < 6),
      coarseStride = 2, bookStride = 3)
    assert(NightlyMaintenance.nightlyWindow(spark, stores, 2,
      Some(policy))._2.isEmpty, "a healthy epoch must not retrain")
    val (_, retrained) = NightlyMaintenance.nightlyWindow(spark, stores,
      2, Some(policy.copy(alarmFactor = 0L)))
    assert(retrained.contains(1L), "forced alarm must open epoch 1")
    assert(codesOf(IvfPqIndex.loadEpochal(spark, stores.codes)).keySet ==
      (0L until 6L).toSet,
      "the retrained epoch must serve the same vector set")
    // and the next nightly delta appends to the NEW epoch
    NightlyMaintenance.nightlyBatch(stores)(
      Seq((8L, "a fresh doc after the retrain cutover", vecOf(8L)))
        .toDF("doc_id", "text", "embedding"), 2L)
    assert(codesOf(IvfPqIndex.loadEpochal(spark, stores.codes)).keySet ==
      ((0L until 6L).toSet + 8L),
      "post-retrain deltas must land in the new epoch")
  }

  test("IndexMaintenance: size-tiered auto-compaction bounds read " +
    "amplification; a pre-compaction reader keeps serving (deferred GC); " +
    "gcSupersededDirs finishes the cleanup; an oversized batch degrades " +
    "to the shuffled probe with identical results") {
    import graft.streaming.IndexMaintenance
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("idxauto").toString
    val ckpt = java.nio.file.Files.createTempDirectory("idxauto_ck").toString
    val batches = (0 until 4).map(b =>
      (b * 3L until b * 3L + 3L).map(i => (i, s"w${i % 5} w${i % 3} shared")))
    def dump(seg: IndexSegments) = Retrieval.segDenormalize(seg)
      .select(col("term"), col("doc_id"), col("tf"), col("dl"), col("df"),
        array_join(col("positions"), ",").as("positions"))
      .orderBy("term", "doc_id").collect().map(_.toSeq).toSeq
    val in = MemoryStream[(Long, String)]
    def run(): Unit = IndexMaintenance.start(
        in.toDF().toDF("doc_id", "text"), root, ckpt,
        compactEvery = Some(2)).awaitTermination()
    // three nightly runs; after the third commit the tail exceeds 2
    // generations and the policy folds — read amplification is bounded
    in.addData(batches(0): _*); run()
    in.addData(batches(1): _*); run()
    // a long-lived serving reader resolved BEFORE the compaction
    val pinned = IndexMaintenance.read(spark, root).get
    val pinnedBefore = dump(pinned)
    in.addData(batches(2): _*); run()
    assert(IndexMaintenance.committedCgens(root) == Seq(2L),
      s"policy must fold past 2 tail gens: cgens=" +
        IndexMaintenance.committedCgens(root))
    assert(IndexMaintenance.readAmplification(root) == 1)
    // deferred GC (the compact default): the pinned reader's
    // generation dirs are intact — it serves the SAME pre-compaction
    // state while the compaction is already committed
    assert(dump(pinned) == pinnedBefore,
      "a pre-compaction reader must keep serving under deferred GC")
    // fresh readers resolve through the cgen and see everything
    val expect3 = dump(Retrieval.segBuildUnified(
      batches.take(3).flatten.toDF("doc_id", "text")))
    assert(dump(IndexMaintenance.read(spark, root).get) == expect3)
    // PINNED-POINT read (as-of batch 1): reproducible evaluation
    // against the frozen two-batch state, resolved from the retained
    // superseded generations while the later compaction is already
    // committed
    val expect2 = dump(Retrieval.segBuildUnified(
      batches.take(2).flatten.toDF("doc_id", "text")))
    assert(dump(IndexMaintenance.readAt(spark, root, 1L).get) == expect2,
      "readAt must serve the exact as-of state")
    assert(IndexMaintenance.readAt(spark, root, -1L).isEmpty,
      "nothing committed at or below the pin point")
    // the maintenance window: GC after readers re-resolve
    IndexMaintenance.gcSupersededDirs(root)
    assert(IndexMaintenance.committedGens(root).isEmpty,
      "gcSupersededDirs must collect the folded generations")
    assert(dump(IndexMaintenance.read(spark, root).get) == expect3)
    // catch-up batch larger than maxBroadcastDelta: the manifest probe
    // must degrade to the hint-free shuffled anti join (not fail on a
    // forced broadcast) and produce the identical merged state
    IndexMaintenance.mergeBatch(root, maxBroadcastDelta = 1L)(
      batches.take(4).flatten.toDF("doc_id", "text"), 3L)
    val expect4 = dump(Retrieval.segBuildUnified(
      batches.flatten.toDF("doc_id", "text")))
    assert(dump(IndexMaintenance.read(spark, root).get) == expect4,
      "shuffled-probe merge must equal the broadcast-probe result")
  }

  test("eval card + BM25 serving off a readAt PIN: byte-stable while a " +
    "merge and a compaction commit mid-evaluation; the pin survives " +
    "until the GC maintenance window") {
    import graft.streaming.IndexMaintenance
    val root = java.nio.file.Files.createTempDirectory("idxpin").toString
    val docs01 = Seq(
      (0L, "alpha beta shared"), (1L, "alpha gamma shared"),
      (2L, "beta gamma shared"), (3L, "alpha beta gamma"),
      (4L, "delta shared alpha"), (5L, "beta delta gamma"))
    val docs2 = Seq(
      (6L, "alpha alpha beta"), (7L, "gamma delta shared"))
    IndexMaintenance.mergeBatch(root)(
      docs01.take(3).toDF("doc_id", "text"), 0L)
    IndexMaintenance.mergeBatch(root)(docs01.toDF("doc_id", "text"), 1L)

    // the evaluation session pins the as-of-batch-1 state ONCE and
    // runs both the ranking and the relevance side off it
    val pin = IndexMaintenance.readAt(spark, root, 1L).get
    val stats = Retrieval.corpusStats(docs01.toDF("doc_id", "text"))
    val queries = docs01.take(2).toDF("doc_id", "text")
    val phrases = Seq((0L, "alpha", "beta"), (1L, "alpha", "gamma"))
      .toDF("query_id", "t1", "t2")
    def evalCard(seg: IndexSegments): Seq[Seq[Any]] = {
      val rel = Retrieval.phraseSearch(
        seg.postings.select(col("term"), col("doc_id"), col("positions")),
        phrases).select(col("query_id"), col("doc_id"))
      Retrieval.retrievalEval(
        Retrieval.bm25TopKFromSegments(seg, stats,
          Retrieval.queryTerms(queries)), rel)
        .orderBy(col("query_id")).collect().map(_.toSeq).toSeq
    }
    def serve(seg: IndexSegments): Seq[Seq[Any]] =
      Retrieval.bm25TopKFromSegments(seg, stats,
        Retrieval.queryTerms(queries))
        .orderBy(col("query_id"), col("rank"))
        .collect().map(_.toSeq).toSeq
    val evalBefore = evalCard(pin)
    val serveBefore = serve(pin)
    assert(evalBefore.nonEmpty && serveBefore.nonEmpty)

    // MID-EVALUATION maintenance: a nightly merge lands AND the
    // accumulated generations compact (deferred GC) while the pinned
    // session is still open
    IndexMaintenance.mergeBatch(root)(docs2.toDF("doc_id", "text"), 2L)
    IndexMaintenance.compact(spark, root)
    assert(IndexMaintenance.committedCgens(root) == Seq(2L))

    // the SAME pin handle and a RE-RESOLVED pin both serve the exact
    // pre-maintenance bytes
    assert(evalCard(pin) == evalBefore,
      "eval card off the open pin must be byte-stable across the compact")
    assert(serve(pin) == serveBefore,
      "BM25 serving off the open pin must be byte-stable across the compact")
    val repin = IndexMaintenance.readAt(spark, root, 1L).get
    assert(evalCard(repin) == evalBefore && serve(repin) == serveBefore,
      "a re-resolved pin at the same point must reproduce the evaluation")
    // while the LIVE view has moved past it
    assert(IndexMaintenance.read(spark, root).get.docIds.count() ==
      (docs01 ++ docs2).length)

    // retention contract: the pin is valid until the GC maintenance
    // window collects the superseded dirs
    IndexMaintenance.gcSupersededDirs(root)
    assert(IndexMaintenance.readAt(spark, root, 1L).isEmpty,
      "after gcSupersededDirs the pre-compaction pin point is gone")
    assert(IndexMaintenance.read(spark, root).nonEmpty)
  }

  private def ts(minute: Long) = new java.sql.Timestamp(minute * 60000L)

  test("streamingBm25Serve: stream top-k == batch stored-postings serving") {
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.Tables.load(spark, sf0001, "documents")
    // frozen snapshot: both engines read identical postings/stats
    val post = Retrieval.postings(docs).localCheckpoint(true)
    val stats = Retrieval.corpusStats(docs).localCheckpoint(true)
    val queryDocs = docs.filter(col("doc_id") < 3)
    val batch = Retrieval.bm25TopKFromPostings(post, stats,
        Retrieval.queryTerms(queryDocs), k = 5)
      .collect().map(_.toSeq).toSet
    val qtexts = queryDocs.select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val in = MemoryStream[Query]
    val stream = Retrieval.streamingBm25Serve(in.toDF(), post, stats,
      k = 5, windowDur = "1 minute", watermark = "10 minutes")
      .writeStream.format("memory").queryName("sbm25")
      .outputMode("append").start()
    try {
      in.addData(qtexts.map { case (id, t) => q(id, 60, t) }.toSeq: _*)
      stream.processAllAvailable()
      // push the watermark past the window so append emits it
      in.addData(q(999, 200, "late watermark pusher"))
      stream.processAllAvailable()
      val streamed = spark.table("sbm25")
        .filter(col("query_id") < 3)
        .select(col("query_id"), col("rank"), col("doc_id"),
          col("score_ppm"))
        .collect().map(_.toSeq).toSet
      assert(streamed == batch, s"stream=$streamed\nbatch=$batch")
    } finally stream.stop()
  }

  test("streaming scoped BM25: lang-scoped postings + in-scope stats " +
    "serve identically on the stream") {
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.Tables.load(spark, sf0001, "documents")
    // the q_llm_bm25_scoped layout: per-scope postings (in-scope df)
    // and per-scope stats, the scope predicate restricting the
    // stream-static join's static side — no new operator
    val post = Retrieval.scopedPostings(docs, "lang")
      .filter(col("lang") === "en")
      .select("term", "doc_id", "tf", "dl", "df").localCheckpoint(true)
    val stats = Retrieval.scopedStats(docs, "lang")
      .filter(col("lang") === "en")
      .select("n_docs", "avgdl").localCheckpoint(true)
    val queryDocs = docs.filter(col("doc_id") < 3)
    val batch = Retrieval.bm25TopKFromPostings(post, stats,
        Retrieval.queryTerms(queryDocs), k = 5)
      .collect().map(_.toSeq).toSet
    val qtexts = queryDocs.select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val in = MemoryStream[Query]
    val stream = Retrieval.streamingBm25Serve(in.toDF(), post, stats,
      k = 5, windowDur = "1 minute", watermark = "10 minutes")
      .writeStream.format("memory").queryName("sbm25sc")
      .outputMode("append").start()
    try {
      in.addData(qtexts.map { case (id, t) => q(id, 60, t) }.toSeq: _*)
      stream.processAllAvailable()
      in.addData(q(999, 200, "late watermark pusher"))
      stream.processAllAvailable()
      val streamed = spark.table("sbm25sc")
        .filter(col("query_id") < 3)
        .select(col("query_id"), col("rank"), col("doc_id"),
          col("score_ppm"))
        .collect().map(_.toSeq).toSet
      assert(streamed.nonEmpty && streamed == batch,
        s"stream=$streamed\nbatch=$batch")
    } finally stream.stop()
  }

  test("streamingBm25ServePacked: one-state-row-per-query form equals batch " +
    "and the chained-aggregation form") {
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val post = Retrieval.postings(docs).localCheckpoint(true)
    val packed = Retrieval.packPostings(post).localCheckpoint(true)
    val stats = Retrieval.corpusStats(docs).localCheckpoint(true)
    val queryDocs = docs.filter(col("doc_id") < 3)
    val batch = Retrieval.bm25TopKFromPostings(post, stats,
        Retrieval.queryTerms(queryDocs), k = 5)
      .collect().map(_.toSeq).toSet
    val qtexts = queryDocs.select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val in = MemoryStream[Query]
    val stream = Retrieval.streamingBm25ServePacked(in.toDF(), packed, stats,
      k = 5, windowDur = "1 minute", watermark = "10 minutes")
      .writeStream.format("memory").queryName("sbm25p")
      .outputMode("append").start()
    try {
      // split the same window across two micro-batches: partial maps
      // must merge in the single state row, not emit twice
      in.addData(qtexts.take(2).map { case (id, t) => q(id, 60, t) }: _*)
      stream.processAllAvailable()
      in.addData(qtexts.drop(2).map { case (id, t) => q(id, 60, t) }: _*)
      stream.processAllAvailable()
      in.addData(q(999, 200, "late watermark pusher"))
      stream.processAllAvailable()
      val streamed = spark.table("sbm25p")
        .filter(col("query_id") < 3)
        .select(col("query_id"), col("rank"), col("doc_id"),
          col("score_ppm"))
        .collect().map(_.toSeq).toSet
      assert(streamed == batch, s"stream=$streamed\nbatch=$batch")
    } finally stream.stop()
  }

  test("streamingRrfFusionServe: the one-aggregate hybrid equals batch " +
    "rrfFuse over the two stored-index servers; duplicate semantic " +
    "rows collapse idempotently") {
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val vecs = graft.Tables.load(spark, sf0001, "embeddings")
    // frozen stored state: packed postings + stats, codes + quantizer
    val packed = Retrieval.packPostings(Retrieval.postings(docs))
      .localCheckpoint(true)
    val post = Retrieval.postings(docs).localCheckpoint(true)
    val stats = Retrieval.corpusStats(docs).localCheckpoint(true)
    val (coarse0, books0) = Similarity.ivfPqTrain(vecs, coarseStride = 100,
      m = 4, dim = 64, bookStride = 50, iters = 0)
    val coarse = coarse0.localCheckpoint(true)
    val books = books0.localCheckpoint(true)
    val codes = Similarity.ivfPqEncode(vecs, coarse, books, m = 4, dim = 64)
      .localCheckpoint(true)
    val queryDocs = docs.filter(col("doc_id") < 3)
    // batch reference: RRF fusion of the two stored-index servers
    val batch = Retrieval.rrfFuse(
        Retrieval.bm25TopKFromPostings(post, stats,
          Retrieval.queryTerms(queryDocs), k = 10),
        Similarity.ivfPqTopKFromCodes(codes,
            vecs.filter(col("vec_id") < 3), k = 10, coarse, books,
            m = 4, dim = 64, probes = 2)
          .select(col("q_id").as("query_id"), col("rank"),
            col("neighbor_id").as("doc_id")))
      .collect().map(_.toSeq).toSet
    val qrows = queryDocs.join(
        vecs.withColumnRenamed("vec_id", "doc_id"), Seq("doc_id"))
      .select(col("doc_id"), col("text"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), new java.sql.Timestamp(60 * 60000L),
        r.getString(1), r.getSeq[Float](2)))
    val in = MemoryStream[(Long, java.sql.Timestamp, String, Seq[Float])]
    val stream = Retrieval.streamingRrfFusionServe(
        in.toDF().toDF("query_id", "event_ts", "text", "embedding"),
        packed, stats, codes, coarse, books, m = 4, dim = 64, k = 10,
        probes = 2, windowDur = "1 minute", watermark = "10 minutes")
      .writeStream.format("memory").queryName("srrf")
      .outputMode("append").start()
    try {
      // split the window across micro-batches AND replay one query
      // event whole (at-least-once): the semantic min-dedup and the
      // lexical (win, query, term) dedup must keep the result exact
      in.addData(qrows.take(1): _*)
      stream.processAllAvailable()
      in.addData(qrows: _*) // replays query 0
      stream.processAllAvailable()
      in.addData((999L, new java.sql.Timestamp(200 * 60000L),
        "late watermark pusher", qrows.head._4))
      stream.processAllAvailable()
      val streamed = spark.table("srrf")
        .filter(col("query_id") < 3)
        .select(col("query_id"), col("rank"), col("doc_id"),
          col("rrf_ppm"), col("rank_text"), col("rank_vec"))
        .collect().map(_.toSeq).toSet
      assert(streamed == batch, s"stream=$streamed\nbatch=$batch")
    } finally stream.stop()
  }

  test("scoped maintenance: per-scope generation logs equal per-scope " +
    "batch builds; a scope absent from a batch no-ops; maintained " +
    "scoped serving equals the one-shot scoped serve") {
    import graft.streaming.{IndexMaintenance, NightlyMaintenance}
    val root = java.nio.file.Files.createTempDirectory("scopedmaint").toString
    val all = Seq(
      (0L, "en", "a b a shared"), (1L, "de", "c d shared"),
      (2L, "en", "a c shared"), (3L, "de", "d d c shared"),
      (4L, "en", "b b shared"), (5L, "en", "a query terms shared"))
    val allDf = all.toDF("doc_id", "lang", "text")
    def dump(seg: IndexSegments) = Retrieval.segDenormalize(seg)
      .select(col("term"), col("doc_id"), col("tf"), col("dl"), col("df"))
      .orderBy("term", "doc_id").collect().map(_.toSeq).toSeq
    // batch 0 carries ONLY en docs — the de scope must stay empty and
    // still accept batch 1 (covered() is per scope root)
    NightlyMaintenance.mergeScopedBatch(root, "lang")(
      allDf.filter(col("lang") === "en" && col("doc_id") < 4), 0L)
    assert(NightlyMaintenance.scopesOf(root, "lang") == Seq("en"))
    NightlyMaintenance.mergeScopedBatch(root, "lang")(allDf, 1L)
    assert(NightlyMaintenance.scopesOf(root, "lang") == Seq("de", "en"))
    // de saw nothing in batch 0: exactly one committed generation
    assert(graft.streaming.GenerationLog.committedGens(
      NightlyMaintenance.scopeDir(root, "lang", "de")) == Seq(1L))
    // each scope's maintained state == the batch build of ONLY its docs
    for (v <- Seq("en", "de")) {
      val seg = NightlyMaintenance.readScope(spark, root, "lang", v).get
      val want = dump(Retrieval.segBuild(
        allDf.filter(col("lang") === v).select(col("doc_id"), col("text"))))
      assert(dump(seg) == want, s"scope $v drifted from its batch build")
    }
    // committed replay is a per-scope no-op
    val before = dump(NightlyMaintenance.readScope(spark, root,
      "lang", "en").get)
    NightlyMaintenance.mergeScopedBatch(root, "lang")(allDf, 1L)
    assert(dump(NightlyMaintenance.readScope(spark, root,
      "lang", "en").get) == before)
    // serving a scope from the maintained store == the one-shot scoped
    // serve (q_llm_bm25_scoped semantics: in-scope df/n_docs/avgdl)
    val docs = allDf.select(col("doc_id"), col("text"), col("lang"))
    val qt = Retrieval.queryTerms(docs.filter(col("doc_id") === 5))
    val enDocs = docs.filter(col("lang") === "en")
      .select(col("doc_id"), col("text"))
    val oneShot = Retrieval.bm25TopK(enDocs,
        docs.filter(col("doc_id") === 5), k = 5)
      .collect().map(_.toSeq).toSet
    val seg = NightlyMaintenance.readScope(spark, root, "lang", "en").get
    val served = Retrieval.bm25TopKFromSegments(seg,
        Retrieval.corpusStats(enDocs), qt, k = 5)
      .collect().map(_.toSeq).toSet
    assert(served.nonEmpty && served == oneShot,
      s"maintained scoped serve drifted:\n$served\n$oneShot")

    // the scoped family joins the SHARED compaction budget: with the
    // en scope holding two tail generations and a budget of 1,
    // maybeCompactAll folds the scope root (the other stores are
    // empty/genesis-only and cannot shrink) and serving is unchanged
    import graft.streaming.NightlyMaintenance.Stores
    def tmp(n: String) =
      java.nio.file.Files.createTempDirectory(n).toString
    val codesRoot = tmp("scm_codes")
    val vecs2 = Seq((0L, Seq(1f, 0f)), (1L, Seq(0f, 1f)))
      .toDF("vec_id", "embedding")
    val (c2, b2) = Similarity.ivfPqTrain(vecs2, coarseStride = 1,
      m = 1, dim = 2, bookStride = 1, iters = 0)
    IvfPqIndex.initEpochal(IvfPqIndex(1, 2, c2, b2,
      Similarity.ivfPqEncode(vecs2, c2, b2, 1, 2)), codesRoot)
    val stores = Stores(tmp("scm_bm25"), tmp("scm_pos"), tmp("scm_uni"),
      codesRoot, scoped = Some((root, "lang")))
    val folded = NightlyMaintenance.maybeCompactAll(spark, stores,
      maxTotalTailGens = 1)
    assert(folded.contains(NightlyMaintenance.scopeDir(root, "lang", "en")),
      s"the scoped root must join the shared budget: $folded")
    assert(dump(NightlyMaintenance.readScope(spark, root,
      "lang", "en").get) == before,
      "compaction must not change the scope's served state")

    // PINNED scoped read (q_llm_bm25_scoped_pinned's contract): the
    // as-of-batch-0 en state is byte-stable across a later merge AND
    // a compaction of the scope's log
    val enDir = NightlyMaintenance.scopeDir(root, "lang", "en")
    val pinned0 = dump(IndexMaintenance.readAt(spark, root =
      enDir, throughId = 0L).get)
    NightlyMaintenance.mergeScopedBatch(root, "lang")(
      Seq((9L, "en", "a b c freshly merged shared"))
        .toDF("doc_id", "lang", "text"), 2L)
    IndexMaintenance.compact(spark, enDir)
    assert(dump(IndexMaintenance.readAt(spark, enDir, 0L).get) ==
      pinned0, "pinned scoped read must survive merge + compaction")
    // and the live read moved on
    assert(dump(NightlyMaintenance.readScope(spark, root, "lang",
      "en").get) != pinned0)
  }

  test("streaming scoped+filtered fusion: both predicates restrict the " +
    "static sides and the stream equals the batch scoped fusion") {
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val vecs = graft.Tables.load(spark, sf0001, "embeddings")
    // the q_llm_rrf_fusion_scoped stored state: lang-scoped packed
    // postings + in-scope stats, label-filtered attr-embedded codes
    val scopedFlat = Retrieval.scopedPostings(docs, "lang")
      .filter(col("lang") === "en")
      .select("term", "doc_id", "tf", "dl", "df").localCheckpoint(true)
    val packed = Retrieval.packPostings(scopedFlat).localCheckpoint(true)
    val stats = Retrieval.scopedStats(docs, "lang")
      .filter(col("lang") === "en")
      .select("n_docs", "avgdl").localCheckpoint(true)
    val (coarse0, books0) = Similarity.ivfPqTrain(vecs, coarseStride = 100,
      m = 4, dim = 64, bookStride = 50, iters = 0)
    val coarse = coarse0.localCheckpoint(true)
    val books = books0.localCheckpoint(true)
    val codes = Similarity.ivfPqEncode(vecs, coarse, books, m = 4,
        dim = 64, attrs = Seq("label")).localCheckpoint(true)
      .filter(col("label") === 1)
    val queryDocs = docs.filter(col("doc_id") < 3)
    val batch = Retrieval.rrfFuse(
        Retrieval.bm25TopKFromPostings(scopedFlat, stats,
          Retrieval.queryTerms(queryDocs), k = 10),
        Similarity.ivfPqTopKFromCodes(codes,
            vecs.filter(col("vec_id") < 3), k = 10, coarse, books,
            m = 4, dim = 64, probes = 2)
          .select(col("q_id").as("query_id"), col("rank"),
            col("neighbor_id").as("doc_id")))
      .collect().map(_.toSeq).toSet
    val qrows = queryDocs.join(
        vecs.withColumnRenamed("vec_id", "doc_id"), Seq("doc_id"))
      .select(col("doc_id"), col("text"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), new java.sql.Timestamp(60 * 60000L),
        r.getString(1), r.getSeq[Float](2)))
    val in = MemoryStream[(Long, java.sql.Timestamp, String, Seq[Float])]
    val stream = Retrieval.streamingRrfFusionServe(
        in.toDF().toDF("query_id", "event_ts", "text", "embedding"),
        packed, stats, codes, coarse, books, m = 4, dim = 64, k = 10,
        probes = 2, windowDur = "1 minute", watermark = "10 minutes")
      .writeStream.format("memory").queryName("srrfsc")
      .outputMode("append").start()
    try {
      in.addData(qrows: _*)
      stream.processAllAvailable()
      in.addData((999L, new java.sql.Timestamp(200 * 60000L),
        "late watermark pusher", qrows.head._4))
      stream.processAllAvailable()
      val streamed = spark.table("srrfsc")
        .filter(col("query_id") < 3)
        .select(col("query_id"), col("rank"), col("doc_id"),
          col("rrf_ppm"), col("rank_text"), col("rank_vec"))
        .collect().map(_.toSeq).toSet
      assert(streamed.nonEmpty && streamed == batch,
        s"stream=$streamed\nbatch=$batch")
    } finally stream.stop()
  }

  test("rrfFusionServeEachBatch: the zero-state micro-batch hybrid equals " +
    "batch fusion over the same stored state; a replayed query " +
    "re-answers byte-identically (upsert idempotence)") {
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val vecs = graft.Tables.load(spark, sf0001, "embeddings")
    val seg0 = Retrieval.segBuild(docs)
    val seg = IndexSegments(seg0.postings.localCheckpoint(true),
      seg0.df.localCheckpoint(true), seg0.docIds.localCheckpoint(true))
    val stats = Retrieval.corpusStats(docs).localCheckpoint(true)
    val (coarse0, books0) = Similarity.ivfPqTrain(vecs, coarseStride = 100,
      m = 4, dim = 64, bookStride = 50, iters = 0)
    val coarse = coarse0.localCheckpoint(true)
    val books = books0.localCheckpoint(true)
    val codes = Similarity.ivfPqEncode(vecs, coarse, books, m = 4, dim = 64)
      .localCheckpoint(true)
    val queryDocs = docs.filter(col("doc_id") < 3)
    val batch = Retrieval.rrfFuse(
        Retrieval.bm25TopKFromSegmentsPushed(seg, stats,
          Retrieval.queryTerms(queryDocs)),
        Similarity.ivfPqTopKFromCodes(codes,
            vecs.filter(col("vec_id") < 3), k = 10, coarse, books,
            m = 4, dim = 64, probes = 2)
          .select(col("q_id").as("query_id"), col("rank"),
            col("neighbor_id").as("doc_id")))
      .collect().map(_.toSeq).toSet
    val qrows = queryDocs.join(
        vecs.withColumnRenamed("vec_id", "doc_id"), Seq("doc_id"))
      .select(col("doc_id"), col("text"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getSeq[Float](2)))
    val ckpt = java.nio.file.Files
      .createTempDirectory("hybridfb_ck").toString
    val in = MemoryStream[(Long, String, Seq[Float])]
    val got = scala.collection.mutable.ArrayBuffer.empty[Seq[Seq[Any]]]
    def drain(): Unit = {
      val q = Retrieval.rrfFusionServeEachBatch(
        in.toDF().toDF("query_id", "text", "embedding"),
        seg, stats, codes, coarse, books, m = 4, dim = 64, k = 10,
        probes = 2, checkpoint = ckpt) { (fused, _) =>
        val rows = fused
          .select(col("query_id"), col("rank"), col("doc_id"),
            col("rrf_ppm"), col("rank_text"), col("rank_vec"))
          .collect().map(_.toSeq).toSeq
        got.synchronized { got += rows; () }
      }
      q.awaitTermination()
    }
    in.addData(qrows: _*); drain()
    assert(got.flatten.toSet == batch,
      s"micro-batch twin drift:\n${got.flatten.toSet}\nvs\n$batch")
    // at-least-once upstream: the replayed query is RE-ANSWERED in its
    // batch, byte-identically — downstream idempotence is an upsert
    val firstAnswer = got.flatten.filter(_.head == 0L).toSet
    got.clear()
    in.addData(qrows.head); drain()
    assert(got.flatten.toSet == firstAnswer,
      "a replayed query must re-answer byte-identically")

    // ADAPTIVE slicing (round 13): a forced one-query-per-slice bound
    // must leave the fused answer byte-identical — both halves and
    // the fusion are per-query independent
    val sliced = Retrieval.rrfServeBatchAdaptive(seg, stats, codes,
        coarse, books, m = 4, dim = 64,
        queryDocs.join(vecs.withColumnRenamed("vec_id", "doc_id"),
            Seq("doc_id"))
          .select(col("doc_id").as("query_id"), col("text"),
            col("embedding")).localCheckpoint(true),
        k = 10, probes = 2, maxPushTerms = 10000,
        maxQueriesPerSlice = 1)
      .collect().map(_.toSeq).toSet
    assert(sliced == batch,
      "query-sliced hybrid serve drifted from the one-shot fusion")
  }

  test("rrfFusionServeEachBatch with MaxScore bounds: pruned hybrid " +
    "stream == unpruned hybrid stream, batch by batch") {
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val vecs = graft.Tables.load(spark, sf0001, "embeddings")
    val seg0 = Retrieval.segBuild(docs)
    val seg = IndexSegments(seg0.postings.localCheckpoint(true),
      seg0.df.localCheckpoint(true), seg0.docIds.localCheckpoint(true))
    val bounds = Retrieval.termBounds(seg.postings).localCheckpoint(true)
    val stats = Retrieval.corpusStats(docs).localCheckpoint(true)
    val (coarse0, books0) = Similarity.ivfPqTrain(vecs, coarseStride = 100,
      m = 4, dim = 64, bookStride = 50, iters = 0)
    val coarse = coarse0.localCheckpoint(true)
    val books = books0.localCheckpoint(true)
    val codes = Similarity.ivfPqEncode(vecs, coarse, books, m = 4, dim = 64)
      .localCheckpoint(true)
    val qrows = docs.filter(col("doc_id") < 12)
      .join(vecs.withColumnRenamed("vec_id", "doc_id"), Seq("doc_id"))
      .select(col("doc_id"), col("text"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getSeq[Float](2)))
    def serve(boundsOpt: Option[org.apache.spark.sql.DataFrame])
        : Set[Seq[Any]] = {
      val in = MemoryStream[(Long, String, Seq[Float])]
      val got = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
      in.addData(qrows: _*)
      val q = Retrieval.rrfFusionServeEachBatch(
        in.toDF().toDF("query_id", "text", "embedding"),
        seg, stats, codes, coarse, books, m = 4, dim = 64, k = 10,
        probes = 2,
        checkpoint = java.nio.file.Files
          .createTempDirectory("hybridfbms_ck").toString,
        boundsOpt = boundsOpt) { (fused, _) =>
        val rows = fused
          .select(col("query_id"), col("rank"), col("doc_id"),
            col("rrf_ppm"), col("rank_text"), col("rank_vec"))
          .collect().map(_.toSeq).toSeq
        got.synchronized { got ++= rows; () }
      }
      q.awaitTermination()
      got.toSet
    }
    val pruned = serve(Some(bounds))
    val plain = serve(None)
    assert(pruned == plain,
      s"MaxScore hybrid stream drifted:\n$pruned\nvs\n$plain")
    assert(pruned.nonEmpty, "vacuous hybrid comparison")
  }

  test("refineServeEachBatch: the zero-state micro-batch refined serve " +
    "equals the batch refine; replays re-answer byte-identically") {
    implicit val sqlCtx = spark.sqlContext
    val vecs = graft.Tables.load(spark, sf0001, "embeddings")
    val (coarse0, books0) = Similarity.ivfPqTrain(vecs, coarseStride = 100,
      m = 4, dim = 64, bookStride = 50, iters = 0)
    val coarse = coarse0.localCheckpoint(true)
    val books = books0.localCheckpoint(true)
    val codes = Similarity.ivfPqEncode(vecs, coarse, books, m = 4, dim = 64)
      .localCheckpoint(true)
    val rawVecs = vecs.localCheckpoint(true)
    val queries = vecs.filter(col("vec_id") < 3)
    val batch = Similarity.ivfPqTopKRefined(codes, queries, rawVecs,
        k = 5, refine = 3, coarse, books, m = 4, dim = 64, probes = 2)
      .collect().map(_.toSeq).toSet
    val qrows = queries.select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val ckpt = java.nio.file.Files
      .createTempDirectory("refinefb_ck").toString
    val in = MemoryStream[(Long, Seq[Float])]
    val got = scala.collection.mutable.ArrayBuffer.empty[Seq[Seq[Any]]]
    def drain(): Unit = {
      val q = Similarity.refineServeEachBatch(
        in.toDF().toDF("vec_id", "embedding"),
        codes, rawVecs, coarse, books, m = 4, dim = 64, k = 5,
        refine = 3, probes = 2, checkpoint = ckpt) { (out, _) =>
        val rows = out
          .select(col("q_id"), col("rank"), col("neighbor_id"), col("d"))
          .collect().map(_.toSeq).toSeq
        got.synchronized { got += rows; () }
      }
      q.awaitTermination()
    }
    in.addData(qrows: _*); drain()
    assert(got.flatten.toSet == batch,
      s"refined micro-batch twin drift:\n${got.flatten.toSet}\nvs\n$batch")
    val firstAnswer = got.flatten.filter(_.head == 0L).toSet
    got.clear()
    in.addData(qrows.head); drain()
    assert(got.flatten.toSet == firstAnswer,
      "a replayed query must re-answer byte-identically")
  }

  test("packed serving state (dedup + top-k map) survives a checkpointed restart") {
    import java.nio.file.Files
    val feedDir = Files.createTempDirectory("bm25_feed").toString
    val ckpt = Files.createTempDirectory("bm25_ckpt").toString
    val outDir = Files.createTempDirectory("bm25_out").toString
    val docs = Seq(
      (100L, "alpha beta gamma"),
      (101L, "alpha alpha delta"),
      (102L, "epsilon zeta eta")).toDF("doc_id", "text")
    val post = Retrieval.postings(docs).localCheckpoint(true)
    val packed = Retrieval.packPostings(post).localCheckpoint(true)
    val stats = Retrieval.corpusStats(docs).localCheckpoint(true)
    val batch = Retrieval.bm25TopKFromPostings(post, stats,
        Seq((1L, "alpha")).toDF("query_id", "term"), k = 5)
      .select("query_id", "rank", "doc_id", "score_ppm")
      .collect().map(_.toSeq).toSet
    def qrow(id: Long, minute: Int, text: String) =
      (id, new java.sql.Timestamp(minute * 60000L), text)
    def qdf(rows: (Long, java.sql.Timestamp, String)*) =
      rows.toDF("query_id", "event_ts", "text")
    val schema = qdf().schema
    def drain(): Unit = {
      val feed = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(feedDir)
      val query = Retrieval.streamingBm25ServePacked(feed, packed, stats,
          k = 5, windowDur = "1 minute", watermark = "10 minutes")
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      query.awaitTermination()
    }
    // wave 1: the query arrives; its window stays OPEN (state holds the
    // dedup row and the per-query sum map)
    qdf(qrow(1, 60, "alpha")).coalesce(1).write.mode("append").parquet(feedDir)
    drain()
    // wave 2, FRESH query from the same checkpoint: the same event
    // redelivered (recovered dedup state must drop it) plus the
    // watermark pusher that closes the window (recovered top-k map
    // must emit wave 1's scores, exactly once)
    qdf(qrow(1, 60, "alpha")).coalesce(1).write.mode("append").parquet(feedDir)
    qdf(qrow(999, 200, "pusher")).coalesce(1).write.mode("append").parquet(feedDir)
    drain()
    val got = spark.read.parquet(outDir)
      .filter(col("query_id") === 1L)
      .select(col("query_id"), col("rank"), col("doc_id"), col("score_ppm"))
      .collect().map(_.toSeq).toSet
    assert(got == batch,
      s"post-restart emission must equal batch exactly once: $got vs $batch")
  }

  test("at-least-once delivery: a replayed query event in one window " +
    "does not double-count (both serving forms)") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (100L, "alpha beta gamma"),
      (101L, "alpha alpha delta"),
      (102L, "epsilon zeta eta")).toDF("doc_id", "text")
    val post = Retrieval.postings(docs).localCheckpoint(true)
    val packed = Retrieval.packPostings(post).localCheckpoint(true)
    val stats = Retrieval.corpusStats(docs).localCheckpoint(true)
    val qt = Seq((1L, "alpha")).toDF("query_id", "term")
    val batch = Retrieval.bm25TopKFromPostings(post, stats, qt, k = 5)
      .select("query_id", "rank", "doc_id", "score_ppm")
      .collect().map(_.toSeq).toSet
    for ((name, serve) <- Seq[(String,
        (org.apache.spark.sql.DataFrame) => org.apache.spark.sql.DataFrame)](
      "sdup" -> (f => Retrieval.streamingBm25Serve(f, post, stats, k = 5,
        windowDur = "1 minute", watermark = "10 minutes")),
      "sdupp" -> (f => Retrieval.streamingBm25ServePacked(f, packed, stats,
        k = 5, windowDur = "1 minute", watermark = "10 minutes")))) {
      val in = MemoryStream[Query]
      val stream = serve(in.toDF())
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        // the SAME query event delivered twice: once per micro-batch
        in.addData(q(1, 60, "alpha"))
        stream.processAllAvailable()
        in.addData(q(1, 60, "alpha"))
        stream.processAllAvailable()
        in.addData(q(999, 200, "pusher"))
        stream.processAllAvailable()
        val streamed = spark.table(name)
          .filter(col("query_id") === 1L)
          .select(col("query_id"), col("rank"), col("doc_id"),
            col("score_ppm"))
          .collect().map(_.toSeq).toSet
        assert(streamed == batch,
          s"$name double-counted under replay: stream=$streamed batch=$batch")
      } finally stream.stop()
    }
  }

  test("streamingPhraseSearch: stateless, per-event equal to batch") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (0L, "x y query stub"),
      (10L, "x y z"),
      (11L, "x z y"),
      (12L, "x y x y")).toDF("doc_id", "text")
    val pp = Retrieval.positionalPostings(docs).localCheckpoint(true)
    val phrases = Seq((0L, "x", "y")).toDF("query_id", "t1", "t2")
    val batch = Retrieval.phraseSearch(pp, phrases)
      .collect().map(_.toSeq).toSet
    val in = MemoryStream[Query]
    val stream = Retrieval.streamingPhraseSearch(in.toDF(), pp)
      .writeStream.format("memory").queryName("sphrase")
      .outputMode("append").start()
    try {
      in.addData(q(0, 60, "x y query stub"))
      stream.processAllAvailable()
      val streamed = spark.table("sphrase")
        .select(col("query_id"), col("doc_id"), col("n_occ"))
        .collect().map(_.toSeq).toSet
      assert(streamed == batch, s"stream=$streamed batch=$batch")
      // stateless: the STREAMING query's own progress reports zero
      // state operators (the memory sink's batch plan would pass
      // vacuously — inspect the stream, not the sink)
      val progress = stream.lastProgress
      assert(progress != null && progress.stateOperators.isEmpty,
        s"must carry no state operators: ${Option(progress)
          .map(_.stateOperators.mkString(","))}")
    } finally stream.stop()
  }

  test("streamingProximitySearch: stateless, per-event equal to batch") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (0L, "x q y query stub"),            // pair (x, y) at slop 3
      (10L, "x a a y"),                    // distance 3: counts
      (11L, "x a a a y"),                  // distance 4: out
      (12L, "x y x a y")).toDF("doc_id", "text")
    val pp = Retrieval.positionalPostings(docs).localCheckpoint(true)
    val pairs = Seq((0L, "x", "y")).toDF("query_id", "t1", "t2")
    val batch = Retrieval.proximitySearch(pp, pairs, slop = 3)
      .collect().map(_.toSeq).toSet
    val in = MemoryStream[Query]
    val stream = Retrieval.streamingProximitySearch(in.toDF(), pp, slop = 3)
      .writeStream.format("memory").queryName("sprox")
      .outputMode("append").start()
    try {
      // event text's first/third tokens are the pair: "x q y ..."
      in.addData(q(0, 60, "x q y query stub"))
      stream.processAllAvailable()
      val streamed = spark.table("sprox")
        .select(col("query_id"), col("doc_id"), col("n_pairs"))
        .collect().map(_.toSeq).toSet
      assert(streamed == batch, s"stream=$streamed batch=$batch")
      val progress = stream.lastProgress
      assert(progress != null && progress.stateOperators.isEmpty,
        "must carry no state operators")
    } finally stream.stop()
  }

  test("graft_sum_topk skips null array slots instead of NPEing") {
    graft.functions.GraftFunctions.register(spark)
    val got = spark.sql(
      """SELECT graft_sum_topk(
        |  array(named_struct('id', CAST(1 AS BIGINT), 'add', CAST(2 AS BIGINT)),
        |        CAST(NULL AS STRUCT<id: BIGINT, add: BIGINT>)), 2) AS top""".stripMargin)
      .selectExpr("explode(top) AS t").select("t.id", "t.sum")
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L)), got.toString)
  }

  test("graft_sum_topk / graft_topk_min reject a non-INT-literal k at analysis") {
    graft.functions.GraftFunctions.register(spark)
    // the historical fallback silently built k=10 for a BIGINT literal
    // or expression k — wrong-SIZED results with no error (r8 ADVICE)
    for (bad <- Seq(
        "graft_sum_topk(array(named_struct('id', CAST(1 AS BIGINT), " +
          "'add', CAST(2 AS BIGINT))), CAST(2 AS BIGINT))",
        "graft_topk_min(named_struct('a', CAST(1 AS BIGINT)), 1 + 1)")) {
      val e = intercept[Exception](spark.sql(s"SELECT $bad").collect())
      assert(e.getMessage.contains("INT literal k"),
        s"expected a loud analysis failure for $bad, got: ${e.getMessage}")
    }
  }

  test("graft_sum_topk skips entries whose id or add FIELD is null") {
    graft.functions.GraftFunctions.register(spark)
    // a null add (bm25Ppm under degenerate corpus stats) must not
    // score as 0 silently (r8 ADVICE): the entry is dropped
    val got = spark.sql(
      """SELECT graft_sum_topk(
        |  array(named_struct('id', CAST(1 AS BIGINT), 'add', CAST(2 AS BIGINT)),
        |        named_struct('id', CAST(3 AS BIGINT), 'add', CAST(NULL AS BIGINT)),
        |        named_struct('id', CAST(NULL AS BIGINT), 'add', CAST(7 AS BIGINT))), 3) AS top""".stripMargin)
      .selectExpr("explode(top) AS t").select("t.id", "t.sum")
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L)), got.toString)
  }

  test("graft_sum_topk equals the two-level sum-then-rank tail in batch") {
    graft.functions.GraftFunctions.register(spark)
    val rows = Seq(
      (1L, Seq((10L, 5L), (11L, 3L))),
      (1L, Seq((10L, 2L), (12L, 9L))),
      (2L, Seq((10L, 1L))))
      .toDF("g", "contribs")
      .select(col("g"), expr(
        "transform(contribs, c -> named_struct('id', c._1, 'add', c._2))")
        .as("contribs"))
    val got = rows.groupBy(col("g"))
      .agg(call_udf("graft_sum_topk", col("contribs"), lit(2)).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("g"), (col("pos") + 1).as("rank"),
        col("t.id"), col("t.sum"))
      .as[(Long, Int, Long, Long)].collect().toSet
    // g=1: doc 12 sums 9, doc 10 sums 7, doc 11 sums 3 -> top-2
    assert(got == Set((1L, 1, 12L, 9L), (1L, 2, 10L, 7L), (2L, 1, 10L, 1L)),
      got.toString)
  }

  test("streamingBm25Serve: cross-micro-batch queries of one window merge; " +
    "separate windows emit separately") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (100L, "alpha beta gamma"),
      (101L, "alpha alpha delta"),
      (102L, "epsilon zeta eta")).toDF("doc_id", "text")
    val post = Retrieval.postings(docs).localCheckpoint(true)
    val stats = Retrieval.corpusStats(docs).localCheckpoint(true)
    val in = MemoryStream[Query]
    val stream = Retrieval.streamingBm25Serve(in.toDF(), post, stats,
      k = 5, windowDur = "1 minute", watermark = "10 minutes")
      .writeStream.format("memory").queryName("sbm25w")
      .outputMode("append").start()
    try {
      // same query id, same window, two micro-batches: the per-doc
      // sums must merge in state, not emit twice
      in.addData(q(1, 60, "alpha"))
      stream.processAllAvailable()
      in.addData(q(2, 75, "epsilon"))   // later window, same stream
      stream.processAllAvailable()
      in.addData(q(999, 200, "pusher"))
      stream.processAllAvailable()
      val rows = spark.table("sbm25w")
        .filter(col("query_id") < 999)
        .select(col("query_id"), col("rank"), col("doc_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // query 1 "alpha": doc 101 (tf=2) outranks doc 100 (tf=1)
      // query 2 "epsilon": only doc 102 matches
      assert(rows == Set((1L, 1L, 101L), (1L, 2L, 100L), (2L, 1L, 102L)),
        rows.toString)
    } finally stream.stop()
  }

  test("nightlyBatch forwards the maintained ATTR layout to the epochal " +
    "codes store (an attribute-embedded index survives its first nightly " +
    "delta) and scoped routing tolerates non-string attribute types") {
    import graft.streaming.NightlyMaintenance
    import graft.streaming.NightlyMaintenance.Stores
    graft.functions.GraftFunctions.register(spark)
    def tmp(n: String) =
      java.nio.file.Files.createTempDirectory(n).toString
    def vecOf(i: Long): Seq[Float] =
      Seq.tabulate(8)(j => ((i * (j + 3)) % 23 - 11).toFloat)
    val base = (0L until 4L).map(i =>
      (i, vecOf(i), (i % 2).toInt)).toDF("vec_id", "embedding", "label")
    val (coarse, books) = Similarity.ivfPqTrain(base, coarseStride = 2,
      m = 2, dim = 8, bookStride = 3, iters = 0)
    val codesRoot = tmp("attr_codes")
    // epoch 0 is ATTRIBUTE-EMBEDDED: stored rows carry `label`
    IvfPqIndex.initEpochal(IvfPqIndex(2, 8, coarse, books,
      Similarity.ivfPqEncode(base.filter(col("vec_id") < 2), coarse,
        books, 2, 8, attrs = Seq("label"))), codesRoot)
    val stores = Stores(tmp("attr_bm25"), tmp("attr_pos"),
      tmp("attr_uni"), codesRoot)
    // the first nightly delta through the FULL driver: the batch
    // carries the attr column and nightlyBatch must forward it into
    // the epochal merge (the round-12 shape crashed here)
    val batch = (2L until 6L).map(i =>
      (i, s"document number$i with enough text to index", vecOf(i),
        (i % 2).toInt)).toDF("doc_id", "text", "embedding", "label")
    NightlyMaintenance.nightlyBatch(stores)(batch, 0L)
    val idx = IvfPqIndex.loadEpochal(spark, codesRoot)
    assert(idx.attrColumns == Seq("label"),
      s"attr layout lost across the delta: ${idx.attrColumns}")
    assert(idx.codes.collect().map(_.getAs[Long]("vec_id")).toSet ==
      (0L until 6L).toSet)
    // filtered serving over the maintained table still prunes by attr
    val hits = idx.topKFiltered(
        Seq((100L, vecOf(1))).toDF("vec_id", "embedding"), k = 10,
        pred = col("label") === 1, probes = 2)
      .select(col("neighbor_id")).collect().map(_.getLong(0)).toSet
    assert(hits.nonEmpty && hits.subsetOf(Set(1L, 3L, 5L)),
      s"filtered serve leaked out-of-predicate rows: $hits")

    // non-string scoped attr: routing goes by the value's string form
    val root = tmp("int_scope")
    val docs = Seq((0L, "a b shared", 2024), (1L, "c d shared", 2025),
      (2L, "a c shared", 2024)).toDF("doc_id", "text", "year")
    NightlyMaintenance.mergeScopedBatch(root, "year")(docs, 0L)
    assert(NightlyMaintenance.scopesOf(root, "year") ==
      Seq("2024", "2025"))
    val seg = NightlyMaintenance.readScope(spark, root, "year", "2024").get
    assert(seg.docIds.collect().map(_.getLong(0)).toSet == Set(0L, 2L))
  }

  test("per-batch PUSHED scoped BM25 serving (bm25ServeEachBatch): " +
    "equals the batch scoped serve, a replayed query re-answers " +
    "identically, and the bounded term set lands on the stored scan " +
    "as PushedFilters inside the scope's PartitionFilters") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.FormattedMode
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val dir = java.nio.file.Files.createTempDirectory("scopedpush").toString
    Retrieval.scopedPostings(docs, "lang")
      .sortWithinPartitions(col("lang"), col("term"))
      .write.partitionBy("lang").mode("overwrite").parquet(dir)
    val post = spark.read.parquet(dir).filter(col("lang") === "en")
      .select(col("term"), col("doc_id"), col("tf"), col("dl"), col("df"))
    val stats = Retrieval.scopedStats(docs, "lang")
      .filter(col("lang") === "en")
      .select(col("n_docs"), col("avgdl")).localCheckpoint(true)
    val qset = docs.filter(pmod(col("doc_id"), lit(50)) === 0 &&
      col("doc_id") < 500)
    val qt = Retrieval.queryTerms(qset)
    def dump(df: org.apache.spark.sql.DataFrame) = df
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("score_ppm")).collect().map(_.toSeq).toSet
    val want = dump(Retrieval.bm25TopKFromPostings(post, stats, qt))
    assert(want.nonEmpty)

    // the pushed batch plan: term In(...) reaches the parquet scan,
    // and the scope predicate stays a partition filter
    val pushed = Retrieval.bm25TopKFromPostingsPushed(post, stats, qt)
    assert(dump(pushed) == want, "pushed serve drifted from unpushed")
    val pp = pushed.queryExecution.explainString(FormattedMode)
    assert("PushedFilters: \\[[^\\]]*In\\(term".r.findFirstIn(pp).isDefined,
      s"query-term set not pushed into the stored postings scan:\n$pp")
    assert("PartitionFilters: \\[[^\\]]*lang[^\\]]* = en".r
        .findFirstIn(pp).isDefined,
      s"scope predicate lost partition pruning:\n$pp")

    // the streaming form: each micro-batch answered from the stored
    // scan; a query replayed in a later batch re-answers identically
    val qrows = qset.select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val in = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Set[Seq[Any]])]
    val ckpt = java.nio.file.Files
      .createTempDirectory("scopedpush_ck").toString
    def run(): Unit = Retrieval.bm25ServeEachBatch(
        in.toDF().toDF("query_id", "text"), post, stats, k = 10,
        checkpoint = ckpt) { (served, id) =>
      got.synchronized { got += ((id, dump(served))); () }
    }.awaitTermination()
    in.addData(qrows.take(1): _*); run()
    in.addData(qrows: _*); run() // replays query 0 in a later batch
    val answered = got.flatMap(_._2).toSet
    assert(answered == want,
      s"per-batch pushed serving drifted from the batch scoped serve")
    // the replayed query's rows are byte-identical across batches
    val q0 = want.filter(_.head == qrows.head._1)
    assert(got.filter(_._2.exists(_.head == qrows.head._1))
      .forall(_._2.filter(_.head == qrows.head._1) == q0),
      "a replayed query must re-answer identically")

    // ADAPTIVE splitting: a push budget far below the batch's term
    // set forces the id-hash slice path — result-identical to the
    // one-shot serve (queries score independently, so slicing cannot
    // change any per-query top-k)
    val sliced = dump(Retrieval.bm25ServeBatchAdaptive(post, stats,
      qset.select(col("doc_id").as("query_id"), col("text"))
        .localCheckpoint(true),
      k = 10, maxPushTerms = 3))
    assert(sliced == want,
      "budget-forced slicing drifted from the one-shot serve")
  }

  test("retrain fires INSIDE the live nightly loop: the epoch cuts over " +
    "between batches, an epoch-pinned reader keeps serving " +
    "byte-identically across the cutover, post-cutover deltas land in " +
    "the new epoch, and gcEpochs defers until the pin is released") {
    import graft.streaming.NightlyMaintenance
    import graft.streaming.NightlyMaintenance.{RetrainPolicy, Stores}
    implicit val sqlCtx = spark.sqlContext
    graft.functions.GraftFunctions.register(spark)
    def tmp(n: String) =
      java.nio.file.Files.createTempDirectory(n).toString
    def vecOf(i: Long): Seq[Float] =
      Seq.tabulate(8)(j => ((i * (j + 3)) % 23 - 11).toFloat)
    val embTable = (0L until 8L).map(i => i -> vecOf(i))
      .toDF("doc_id", "embedding")
    val trainVecs = embTable.select(col("doc_id").as("vec_id"),
      col("embedding"))
    val (coarse, books) = Similarity.ivfPqTrain(trainVecs,
      coarseStride = 2, m = 2, dim = 8, bookStride = 3, iters = 0)
    val codesRoot = tmp("lrt_codes")
    IvfPqIndex.initEpochal(IvfPqIndex(2, 8, coarse, books,
      Similarity.ivfPqEncode(trainVecs.filter(col("vec_id") < 2),
        coarse, books, 2, 8)), codesRoot)
    val stores = Stores(tmp("lrt_bm25"), tmp("lrt_pos"), tmp("lrt_uni"),
      codesRoot)
    val ckpt = tmp("lrt_ck")
    // the policy retrains over whatever the epoch has accumulated;
    // alarmFactor = 0 forces the alarm every nightly window, so the
    // cutover runs INSIDE the live stream (not in a separate session)
    def accumulated(): org.apache.spark.sql.DataFrame = {
      val ids = IvfPqIndex.loadEpochal(spark, codesRoot).codes
        .select(col("vec_id"))
      trainVecs.join(ids, Seq("vec_id"))
    }
    val policy = RetrainPolicy(() => accumulated().localCheckpoint(),
      coarseStride = 2, bookStride = 3, alarmFactor = 0L)
    def codesOf(idx: IvfPqIndex) = idx.codes.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getSeq[Int](2).toSeq))
      .toMap

    val in = MemoryStream[(Long, String)]
    val docsStream = in.toDF().toDF("doc_id", "text")
      .join(embTable, Seq("doc_id"))
    def run(): Unit = NightlyMaintenance.start(docsStream, stores, ckpt,
      maxTotalTailGens = 8, retrain = Some(policy)).awaitTermination()

    // batch 0: docs 0-3 merge into epoch 0, then the in-loop window
    // retrains -> epoch 1 covering exactly {0,1,2,3}
    in.addData((0L until 4L).map(i => (i, s"doc number$i text")): _*)
    run()
    assert(IvfPqIndex.committedEpochs(codesRoot) == Seq(0L, 1L),
      "the in-loop alarm must have cut over to epoch 1")
    assert(codesOf(IvfPqIndex.loadEpochal(spark, codesRoot)).keySet ==
      (0L until 4L).toSet)

    // pin epoch 1 by DIR *and coverage point* (the byte-stable
    // evaluation pin: the epoch dir is immune to cutovers, the
    // throughId to later deltas landing in this epoch before the
    // next cutover) and dump
    val e1 = IvfPqIndex.epochDir(codesRoot, 1L)
    val pinned = codesOf(IvfPqIndex.loadMaintainedAt(spark, e1,
      0L).get)

    // batch 1 runs WHILE the pin is held: fresh docs 4-5 merge into
    // the active epoch, the window retrains again -> epoch 2
    in.addData((4L until 6L).map(i => (i, s"doc number$i text")): _*)
    run()
    assert(IvfPqIndex.committedEpochs(codesRoot) == Seq(0L, 1L, 2L))
    assert(codesOf(IvfPqIndex.loadEpochal(spark, codesRoot)).keySet ==
      (0L until 6L).toSet,
      "post-cutover deltas must be visible in the new epoch")
    // the epoch-pinned reader is BYTE-stable across the cutover
    assert(codesOf(IvfPqIndex.loadMaintainedAt(spark, e1,
      0L).get) == pinned,
      "the epoch-dir pin must survive a live-loop retrain")
    // the coverage-pinned read resolves on the NEWEST epoch covering
    // the pin point with the SAME vector set (retrain re-encodes)
    assert(codesOf(IvfPqIndex.loadEpochalAt(spark, codesRoot,
      0L).get).keySet == (0L until 4L).toSet)

    // deferred GC: gcEpochs drops the retired epochs only when run
    IvfPqIndex.gcEpochs(codesRoot)
    assert(IvfPqIndex.committedEpochs(codesRoot) == Seq(2L))
    assert(codesOf(IvfPqIndex.loadEpochal(spark, codesRoot)).keySet ==
      (0L until 6L).toSet, "serving must be unaffected by epoch GC")
  }
}

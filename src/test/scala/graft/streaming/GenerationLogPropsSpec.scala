package graft.streaming

import graft.SparkSpec
import graft.llm.{IndexSegments, Retrieval}
import org.apache.spark.sql.functions._

/** Property net over the committed-generation protocol: seeded random
  * interleavings of nightly merges, duplicate/overlapping deltas,
  * marker-loss crash replays, covered replays, deferred- and
  * immediate-GC compactions, and maintenance-window GC — after every
  * step the served state must equal a from-scratch batch build over
  * exactly the docs whose batches committed, and the protocol
  * invariants (marker monotonicity, bounded read amplification after
  * a fold, GC never load-bearing) must hold. The deterministic
  * RetrievalStreamSpec covers each leg once; this sweeps the
  * compositions. */
class GenerationLogPropsSpec extends SparkSpec {
  import spark.implicits._

  private def docText(i: Long) = s"w${i % 5} w${i % 3} shared doc$i"

  private def dump(seg: IndexSegments) = Retrieval.segDenormalize(seg)
    .select(col("term"), col("doc_id"), col("tf"), col("dl"), col("df"),
      array_join(col("positions"), ",").as("positions"))
    .orderBy("term", "doc_id").collect().map(_.toSeq).toSeq

  test("random merge/crash/compact/gc interleavings always serve the " +
    "exact union of committed batches (8 seeded scenarios)") {
    for (seed <- 0 until 8) {
      val rnd = new scala.util.Random(seed * 7919 + 13)
      val root = java.nio.file.Files
        .createTempDirectory(s"glprops_$seed").toString
      // batches of 3 docs each, overlapping by construction: batch b
      // owns ids [2b, 2b+3) — every batch shares one id with the next
      def batchDocs(b: Long) = (2 * b until 2 * b + 3).map(i =>
        (i, docText(i)))
      var applied = Set.empty[Long] // batch ids whose docs are in
      var nextBatch = 0L
      def expect(): Seq[Seq[Any]] = dump(Retrieval.segBuildUnified(
        applied.toSeq.sorted.flatMap(batchDocs).distinct
          .toDF("doc_id", "text")))
      def check(tag: String): Unit =
        if (applied.nonEmpty)
          assert(dump(IndexMaintenance.read(spark, root).get) == expect(),
            s"seed=$seed after $tag: served state != batch build of " +
              s"batches $applied")
      val steps = 7 + rnd.nextInt(3)
      for (step <- 0 until steps) {
        rnd.nextInt(6) match {
          case 0 | 1 => // nightly merge of the next batch
            IndexMaintenance.mergeBatch(root)(
              batchDocs(nextBatch).toDF("doc_id", "text"), nextBatch)
            applied += nextBatch
            nextBatch += 1
            check(s"merge($nextBatch)")
          case 2 => // covered replay of a random already-applied batch
            if (applied.nonEmpty) {
              val b = applied.toSeq(rnd.nextInt(applied.size))
              IndexMaintenance.mergeBatch(root)(
                batchDocs(b).toDF("doc_id", "text"), b)
              check(s"covered-replay($b)")
            }
          case 3 => // crash: lose the newest still-standing gen marker,
            // then replay that batch over the same pre-state
            val gens = IndexMaintenance.committedGens(root)
            if (gens.nonEmpty) {
              val b = gens.max
              val fs = GenerationLog.fsOf(root)
              assert(fs.delete(
                GenerationLog.marker(GenerationLog.genDir(root, b)), false))
              IndexMaintenance.mergeBatch(root)(
                batchDocs(b).toDF("doc_id", "text"), b)
              check(s"crash-replay($b)")
            }
          case 4 => // compaction, randomly deferred or immediate GC
            val gc = rnd.nextBoolean()
            IndexMaintenance.compact(spark, root, gcSuperseded = gc)
            if (IndexMaintenance.committedCgens(root).nonEmpty && gc)
              assert(IndexMaintenance.readAmplification(root) == 1,
                s"seed=$seed: immediate-GC fold must reset amplification")
            check(s"compact(gc=$gc)")
          case 5 => // maintenance-window GC: never load-bearing
            IndexMaintenance.gcSupersededDirs(root)
            check("gcSuperseded")
        }
      }
      // terminal invariants: one more fold + full GC leaves a single
      // dir serving the exact accumulated corpus
      IndexMaintenance.compact(spark, root, gcSuperseded = true)
      IndexMaintenance.gcSupersededDirs(root)
      if (applied.nonEmpty) {
        check("final fold")
        assert(IndexMaintenance.readAmplification(root) == 1 ||
          IndexMaintenance.committedCgens(root).isEmpty,
          s"seed=$seed: terminal state must be a single folded dir")
      }
    }
  }

  test("maintained IVF-PQ code table under random merge/crash/compact/gc " +
    "interleavings always equals one full encode of the committed " +
    "corpus (8 seeded scenarios, duplicate deltas included)") {
    import graft.llm.{IvfPqIndex, Similarity}
    graft.functions.GraftFunctions.register(spark)
    // fixed vector pool — every id any batch can reference — and the
    // FROZEN quantizer trained over it once (retrain is a different
    // net: SimilaritySpec's epochal case)
    def vecOf(i: Long): Seq[Float] =
      Seq.tabulate(8)(j => ((i * (j + 3)) % 23 - 11).toFloat)
    def vecsDf(ids: Seq[Long]) =
      ids.map(i => i -> vecOf(i)).toDF("vec_id", "embedding")
    val pool = vecsDf(0L until 32L)
    val (coarse, books) = Similarity.ivfPqTrain(pool, coarseStride = 5,
      m = 2, dim = 8, bookStride = 7, iters = 0)
    def codesOf(idx: IvfPqIndex): Map[Long, (Long, Seq[Int])] =
      idx.codes.collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getSeq[Int](2).toSeq)).toMap
    val fullPoolCodes = codesOf(IvfPqIndex(2, 8, coarse, books,
      Similarity.ivfPqEncode(pool, coarse, books, 2, 8)))

    for (seed <- 0 until 8) {
      val rnd = new scala.util.Random(seed * 6397 + 29)
      val root = java.nio.file.Files
        .createTempDirectory(s"cglprops_$seed").toString
      // batch b owns ids [2b, 2b+3): every batch overlaps the next,
      // and batch 0 overlaps the GENESIS slice (ids 0..2) — the
      // duplicate-delta legs are structural, not incidental
      def batchIds(b: Long): Seq[Long] = 2 * b until 2 * b + 3
      var ids = (0L until 3L).toSet // the genesis slice
      IvfPqIndex.initMaintained(IvfPqIndex(2, 8, coarse, books,
        Similarity.ivfPqEncode(vecsDf(ids.toSeq.sorted), coarse, books,
          2, 8)), root)
      var nextBatch = 0L
      def check(tag: String): Unit = {
        val got = codesOf(IvfPqIndex.loadMaintained(spark, root))
        val want = ids.map(i => i -> fullPoolCodes(i)).toMap
        assert(got == want,
          s"seed=$seed after $tag: maintained codes != full encode of $ids")
      }
      val steps = 7 + rnd.nextInt(3)
      for (step <- 0 until steps) {
        rnd.nextInt(6) match {
          case 0 | 1 => // nightly delta (overlapping the previous one)
            IvfPqIndex.mergeCodesBatch(root)(
              vecsDf(batchIds(nextBatch)), nextBatch)
            ids ++= batchIds(nextBatch)
            nextBatch += 1
            check(s"merge($nextBatch)")
          case 2 => // covered replay of a random earlier batch
            if (nextBatch > 0) {
              val b = rnd.nextInt(nextBatch.toInt).toLong
              IvfPqIndex.mergeCodesBatch(root)(vecsDf(batchIds(b)), b)
              check(s"covered-replay($b)")
            }
          case 3 => // crash: newest gen marker lost between data writes
            // and commit; the replay recomputes over the same pre-state
            val gens = GenerationLog.committedGens(root)
            if (gens.nonEmpty) {
              val b = gens.max
              val fs = GenerationLog.fsOf(root)
              assert(fs.delete(
                GenerationLog.marker(GenerationLog.genDir(root, b)), false))
              IvfPqIndex.mergeCodesBatch(root)(vecsDf(batchIds(b)), b)
              check(s"crash-replay($b)")
            }
          case 4 =>
            val gc = rnd.nextBoolean()
            IvfPqIndex.compactCodes(spark, root, gcSuperseded = gc)
            if (GenerationLog.committedCgens(root).nonEmpty && gc)
              assert(GenerationLog.readAmplification(root) == 1,
                s"seed=$seed: immediate-GC fold must reset amplification")
            check(s"compact(gc=$gc)")
          case 5 =>
            GenerationLog.gcSuperseded(root)
            check("gcSuperseded")
        }
      }
      IvfPqIndex.compactCodes(spark, root, gcSuperseded = true)
      GenerationLog.gcSuperseded(root)
      check("final fold")
      assert(GenerationLog.readAmplification(root) == 1,
        s"seed=$seed: terminal state must be a single folded dir")
    }
  }

  test("EPOCHAL maintained index under random merge/crash/compact/" +
    "retrain/epoch-crash/gc interleavings: the active epoch always " +
    "serves one full encode of the committed corpus under its own " +
    "quantizer (8 seeded scenarios)") {
    import graft.llm.{IvfPqIndex, Similarity}
    graft.functions.GraftFunctions.register(spark)
    def vecOf(i: Long): Seq[Float] =
      Seq.tabulate(8)(j => ((i * (j + 5)) % 19 - 9).toFloat)
    def vecsDf(ids: Seq[Long]) =
      ids.map(i => i -> vecOf(i)).toDF("vec_id", "embedding")
    def codesOf(idx: IvfPqIndex): Map[Long, (Long, Seq[Int])] =
      idx.codes.collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getSeq[Int](2).toSeq)).toMap

    for (seed <- 0 until 8) {
      val rnd = new scala.util.Random(seed * 4241 + 7)
      val root = java.nio.file.Files
        .createTempDirectory(s"epprops_$seed").toString
      def batchIds(b: Long): Seq[Long] = 2 * b until 2 * b + 3
      var ids = (0L until 3L).toSet
      // retrain strides vary per retrain (the "more centroids" knob) —
      // the invariant must hold under ANY quantizer the loop installs
      var stride = 4
      val pool0 = vecsDf(ids.toSeq.sorted)
      val (c0, b0) = Similarity.ivfPqTrain(pool0, coarseStride = 2,
        m = 2, dim = 8, bookStride = 2, iters = 0)
      IvfPqIndex.initEpochal(IvfPqIndex(2, 8, c0, b0,
        Similarity.ivfPqEncode(pool0, c0, b0, 2, 8)), root)
      var nextBatch = 0L
      def check(tag: String): Unit = {
        // the invariant: active-epoch state == one full encode of the
        // committed id set under the ACTIVE epoch's own quantizer
        val active = IvfPqIndex.loadEpochal(spark, root)
        val want = codesOf(IvfPqIndex(2, 8, active.coarse, active.books,
          Similarity.ivfPqEncode(vecsDf(ids.toSeq.sorted),
            active.coarse, active.books, 2, 8)))
        assert(codesOf(active) == want,
          s"seed=$seed after $tag: epochal state != full encode of $ids")
      }
      val steps = 6 + rnd.nextInt(3)
      for (_ <- 0 until steps) {
        rnd.nextInt(8) match {
          case 0 | 1 => // nightly delta into the active epoch
            IvfPqIndex.mergeEpochal(root)(vecsDf(batchIds(nextBatch)),
              nextBatch)
            ids ++= batchIds(nextBatch)
            nextBatch += 1
            check(s"merge($nextBatch)")
          case 2 => // covered replay (possibly from BEFORE a retrain —
            // the new epoch's genesis coverage must absorb it)
            if (nextBatch > 0) {
              val b = rnd.nextInt(nextBatch.toInt).toLong
              IvfPqIndex.mergeEpochal(root)(vecsDf(batchIds(b)), b)
              check(s"covered-replay($b)")
            }
          case 3 => // crash-replay of the newest gen in the active epoch
            val edir = IvfPqIndex.activeEpochDir(root)
            val gens = GenerationLog.committedGens(edir)
            if (gens.nonEmpty) {
              val b = gens.max
              assert(GenerationLog.fsOf(root).delete(
                GenerationLog.marker(GenerationLog.genDir(edir, b)), false))
              IvfPqIndex.mergeEpochal(root)(vecsDf(batchIds(b)), b)
              check(s"crash-replay($b)")
            }
          case 4 =>
            IvfPqIndex.compactEpochal(spark, root,
              gcSuperseded = rnd.nextBoolean())
            check("compact")
          case 5 => // RETRAIN: fresh quantizer over the accumulated
            // corpus, atomic epoch cutover
            stride = 2 + rnd.nextInt(3)
            IvfPqIndex.retrain(spark, root, vecsDf(ids.toSeq.sorted),
              coarseStride = stride, bookStride = 2)
            check(s"retrain(stride=$stride)")
          case 6 => // CRASHED retrain: stage a retrain, lose the epoch
            // marker — must be invisible; the next retrain self-heals
            val before = IvfPqIndex.committedEpochs(root).max
            stride = 2 + rnd.nextInt(3)
            val e = IvfPqIndex.retrain(spark, root,
              vecsDf(ids.toSeq.sorted), coarseStride = stride,
              bookStride = 2)
            assert(GenerationLog.fsOf(root).delete(
              new org.apache.hadoop.fs.Path(
                IvfPqIndex.epochDir(root, e), "_COMMITTED"), false))
            assert(IvfPqIndex.committedEpochs(root).max == before,
              s"seed=$seed: crashed cutover must be invisible")
            check("epoch-crash")
          case 7 => // epoch GC: retired epochs go, the active one serves
            IvfPqIndex.gcEpochs(root)
            check("gcEpochs")
        }
      }
      // terminal: one more retrain + full GC leaves exactly one epoch
      IvfPqIndex.retrain(spark, root, vecsDf(ids.toSeq.sorted),
        coarseStride = 2, bookStride = 2)
      IvfPqIndex.gcEpochs(root)
      assert(IvfPqIndex.committedEpochs(root).size == 1,
        s"seed=$seed: terminal state must be a single epoch")
      check("terminal retrain")
    }
  }

  test("parallel per-scope merges under random crash subsets: a batch " +
    "interrupted with an ARBITRARY subset of scopes committed always " +
    "converges on replay to the per-scope batch builds (6 seeded " +
    "scenarios)") {
    // the round-13 concurrency makes mid-batch crash states richer:
    // scopes commit in ANY order, so a crash leaves an arbitrary
    // committed SUBSET — simulate it by merging a random subset of
    // scopes directly (what a half-finished pool leaves behind), then
    // replay the FULL batch through mergeScopedBatch and require the
    // per-root covered() no-ops + fresh merges to converge on exactly
    // the per-scope builds
    import graft.streaming.NightlyMaintenance
    // scoped stores are positional-free: dump without positions
    def dumpS(seg: IndexSegments) = Retrieval.segDenormalize(seg)
      .select(col("term"), col("doc_id"), col("tf"), col("dl"), col("df"))
      .orderBy("term", "doc_id").collect().map(_.toSeq).toSeq
    def segDump(root: String, attr: String, v: String) =
      NightlyMaintenance.readScope(spark, root, attr, v).map(dumpS)
    for (seed <- 0 until 6) {
      val rnd = new scala.util.Random(seed * 104729 + 7)
      val root = java.nio.file.Files
        .createTempDirectory(s"scpar_$seed").toString
      val nScopes = 3 + rnd.nextInt(4) // 3-6 scopes
      def scopeOf(i: Long) = s"s${i % nScopes}"
      def batchDocs(b: Long) = (4 * b until 4 * b + 6).map(i =>
        (i, scopeOf(i), docText(i))) // overlapping ids across batches
      var applied = Set.empty[Long]
      for (b <- 0L until 3L) {
        val full = batchDocs(b).toDF("doc_id", "lang", "text")
        // the crash: a random strict subset of this batch's scopes
        // already committed (pool died mid-fan-out)
        val scopes = batchDocs(b).map(_._2).distinct
        val committed = rnd.shuffle(scopes).take(rnd.nextInt(scopes.size))
        for (v <- committed)
          IndexMaintenance.mergeBatch(
            NightlyMaintenance.scopeDir(root, "lang", v),
            positional = false)(
            full.filter(col("lang") === v)
              .select(col("doc_id"), col("text")), b)
        // the replay: the full batch through the parallel driver (a
        // random pool width, including 1)
        NightlyMaintenance.mergeScopedBatch(root, "lang",
          scopeParallelism = 1 + rnd.nextInt(8))(full, b)
        applied += b
        // every scope == the batch build over exactly its committed docs
        val docsSoFar = applied.toSeq.sorted.flatMap(batchDocs).distinct
        for (v <- docsSoFar.map(_._2).distinct.sorted) {
          val want = dumpS(Retrieval.segBuild(
            docsSoFar.filter(_._2 == v).map(d => (d._1, d._3))
              .toDF("doc_id", "text")))
          assert(segDump(root, "lang", v).contains(want),
            s"seed=$seed batch=$b scope=$v drifted after crash-subset " +
              s"$committed + parallel replay")
        }
      }
    }
  }
}

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
}

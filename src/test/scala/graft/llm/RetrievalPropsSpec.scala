package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Generative equivalence for the segment-index merge algebra: random
  * small-vocab corpora, ARBITRARY stored/delta splits (including empty
  * stored, full overlap, empty-tokenizing docs) and at-least-once
  * duplicated delta rows must satisfy, for both the BM25 and the
  * unified (positional) flavors:
  *
  *   segDenormalize(segMerge(stored, delta)) == full rebuild
  *   segMergeWriteSet(stored, delta)         == full rebuild ∖ stored ids
  *   manifest stays duplicate-free
  *
  * whenever stored ∪ delta covers the corpus. The fixed-example
  * RetrievalSpec cases pin the shapes; this enumerates the split/
  * duplication edges. Seeded like CurationPropsSpec, so a failure is
  * reproducible. */
class RetrievalPropsSpec extends SparkSpec {
  import spark.implicits._

  private val genScenario: Gen[(Seq[(Long, String)], Seq[Boolean], Boolean)] =
    for {
      n <- Gen.chooseNum(1, 10)
      texts <- Gen.listOfN(n, Gen.chooseNum(1, 8).flatMap(k =>
        Gen.listOfN(k, Gen.oneOf("aa", "bb", "cc", "dd", "ee"))
          .map(_.mkString(" "))))
      mask <- Gen.listOfN(n, Gen.oneOf(true, false))
      dup <- Gen.oneOf(true, false)
    } yield (texts.zipWithIndex.map { case (t, i) => (i.toLong, t) },
      mask, dup)

  private val scenarios: Seq[(Seq[(Long, String)], Seq[Boolean], Boolean)] = {
    val params = org.scalacheck.Gen.Parameters.default
    var seed = org.scalacheck.rng.Seed(4210L)
    (0 until 12).map { _ =>
      val s = genScenario.pureApply(params, seed)
      seed = seed.next
      s
    }
  }

  test("segMerge / segMergeWriteSet == full rebuild for arbitrary " +
    "splits and duplicated deltas (both flavors, 12 seeded scenarios)") {
    for ((c, mask, dup) <- scenarios) {
      val docs = c.toDF("doc_id", "text")
      val storedIds = c.zip(mask).collect { case ((id, _), true) => id }.toSet
      val storedDocs = docs.filter(col("doc_id").isin(storedIds.toSeq: _*))
      // delta = complement plus a slice of the stored ids (overlap leg)
      val deltaIds = c.map(_._1).filterNot(storedIds.contains) ++
        storedIds.toSeq.sorted.take(2)
      val delta0 = docs.filter(col("doc_id").isin(deltaIds: _*))
      val delta = if (dup) delta0.unionAll(delta0) else delta0
      val ctx = s"stored=$storedIds delta=$deltaIds dup=$dup"

      // BM25 flavor
      val full = Retrieval.postings(docs)
        .orderBy("term", "doc_id").collect().map(_.toSeq).toSeq
      val merged = Retrieval.segMerge(Retrieval.segBuild(storedDocs), delta)
      assert(Retrieval.segDenormalize(merged)
        .orderBy("term", "doc_id").collect().map(_.toSeq).toSeq == full, ctx)
      assert(merged.docIds.count() == c.length &&
        merged.docIds.distinct().count() == c.length, ctx)
      val ws = Retrieval.segMergeWriteSet(
          Retrieval.segBuild(storedDocs), delta)
        .orderBy("term", "doc_id").collect().map(_.toSeq).toSeq
      assert(ws == full.filterNot(r =>
        storedIds.contains(r(1).asInstanceOf[Long])), ctx)

      // unified flavor (positions ride the fresh rows)
      def flatU(df: org.apache.spark.sql.DataFrame) = df
        .select(col("term"), col("doc_id"), col("tf"), col("dl"),
          col("df"), array_join(col("positions"), ","))
        .orderBy("term", "doc_id").collect().map(_.toSeq).toSeq
      val fullU = flatU(Retrieval.buildIndexes(docs))
      val mergedU = Retrieval.segMergeUnified(
        Retrieval.segBuildUnified(storedDocs), delta)
      assert(flatU(Retrieval.segDenormalize(mergedU)) == fullU, ctx)
      spark.catalog.clearCache() // the merges persist per-scenario frames
    }
  }
}

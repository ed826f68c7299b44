package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MaxScore exact top-k pruning (Retrieval.bm25TopKFromSegmentsMaxScore):
  * row-identity with the unpruned segment server on randomized skewed
  * corpora, the no-pruning degenerate paths, the seed-term edge the
  * θ-completion guards, the bounds merge law, and proof the pruning
  * actually engages (skipped posting rows > 0 on a Zipf corpus).
  *
  * Reference semantics being matched: the reference scores every
  * candidate exhaustively (ct-mapreduce has no ranked retrieval at
  * all); MaxScore is the public Turtle & Flood term-at-a-time bound
  * prune re-expressed as dataflow phases — exactness is the property
  * under test, wall-clock is StreamSoak's job. */
class RetrievalMaxScoreSpec extends SparkSpec {
  import spark.implicits._

  /** Zipf-ish corpus: term i of `vocab` drawn with weight 1/(i+1) —
    * a few stopword-class terms own most posting rows, the shape
    * where MaxScore's essential/non-essential split pays. */
  private def zipfDocs(seed: Long, nDocs: Int, vocab: Int): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val cum = (0 until vocab).map(i => 1.0 / (i + 1)).scanLeft(0.0)(_ + _)
    val total = cum.last
    def draw(): String = {
      val x = rnd.nextDouble() * total
      val i = cum.indexWhere(_ > x) - 1
      s"t${math.max(i, 0)}"
    }
    (0 until nDocs).map { d =>
      val len = 5 + rnd.nextInt(25)
      (d.toLong, Seq.fill(len)(draw()).mkString(" "))
    }.toDF("doc_id", "text")
  }

  private def served(docs: DataFrame, queries: DataFrame, k: Int,
      pruned: Boolean): Seq[(Long, Long, Long, Long)] = {
    val seg = Retrieval.segBuild(docs)
    val stats = Retrieval.corpusStats(docs)
    val qt = Retrieval.queryTerms(queries)
    val out =
      if (pruned)
        Retrieval.bm25TopKFromSegmentsMaxScore(seg,
          Retrieval.termBounds(seg.postings), stats, qt, k)
      else Retrieval.bm25TopKFromSegments(seg, stats, qt, k)
    val r = out.select("query_id", "rank", "doc_id", "score_ppm")
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    spark.catalog.clearCache()
    r
  }

  test("maxscore == unpruned server on randomized zipf corpora") {
    for (seed <- Seq(1L, 7L, 23L); k <- Seq(3, 10)) {
      val docs = zipfDocs(seed, nDocs = 120, vocab = 40)
      val queries = docs.filter(pmod(col("doc_id"), lit(7)) === 0)
      val got = served(docs, queries, k, pruned = true)
      val want = served(docs, queries, k, pruned = false)
      assert(got == want, s"seed=$seed k=$k")
      assert(want.nonEmpty, s"vacuous at seed=$seed")
    }
  }

  test("maxscore: corpus smaller than k stays exact (θ=MinValue leg)") {
    val docs = Seq(
      0L -> "a b c d e",
      1L -> "a b x",
      2L -> "c y z").toDF("doc_id", "text")
    val queries = docs.filter(col("doc_id") === 0)
    assert(served(docs, queries, k = 10, pruned = true) ==
      served(docs, queries, k = 10, pruned = false))
  }

  test("maxscore: seed term whose only posting is the query doc itself") {
    // "uniq" is doc 0's rarest (highest-UB) term and appears ONLY in
    // doc 0 — the seed candidate set is empty after self-exclusion, so
    // θ must complete to MinValue instead of dropping the query
    val docs = Seq(
      0L -> "uniq common common",
      1L -> "common filler filler",
      2L -> "common pad pad",
      3L -> "pad pad filler").toDF("doc_id", "text")
    val queries = docs.filter(col("doc_id") === 0)
    val got = served(docs, queries, k = 2, pruned = true)
    val want = served(docs, queries, k = 2, pruned = false)
    assert(got == want)
    assert(got.nonEmpty, "query dropped by θ completion")
  }

  test("maxscore: score ties at θ survive the strict prune") {
    // docs 1..4 are identical ⇒ identical scores; k=2 puts the tie AT
    // θ — tie-break by doc_id must match the unpruned server exactly
    val docs = Seq(
      0L -> "a b",
      1L -> "a b c",
      2L -> "a b c",
      3L -> "a b c",
      4L -> "a b c").toDF("doc_id", "text")
    val queries = docs.filter(col("doc_id") === 0)
    assert(served(docs, queries, k = 2, pruned = true) ==
      served(docs, queries, k = 2, pruned = false))
  }

  test("termBounds merge law: merge(bounds(stored), fresh) == bounds(all)") {
    val stored = zipfDocs(3L, 60, 30)
    val fresh = zipfDocs(4L, 20, 30)
      .withColumn("doc_id", col("doc_id") + 1000L)
    val segS = Retrieval.segBuild(stored)
    val segAll = Retrieval.segBuild(stored.unionByName(fresh))
    val freshRows = Retrieval.segBuild(fresh).postings
    val merged = Retrieval
      .mergeTermBounds(Retrieval.termBounds(segS.postings), freshRows)
      .as[(String, Long, Long)].collect().toSeq.sorted
    val full = Retrieval.termBounds(segAll.postings)
      .as[(String, Long, Long)].collect().toSeq.sorted
    assert(merged == full)
    spark.catalog.clearCache()
  }

  test("maxscore pruning engages: skipped posting rows > 0 on zipf") {
    val docs = zipfDocs(11L, 200, 40)
    val queries = docs.filter(pmod(col("doc_id"), lit(11)) === 0)
    val seg = Retrieval.segBuild(docs)
    val parts = Retrieval.bm25MaxScoreParts(seg,
      Retrieval.termBounds(seg.postings), Retrieval.corpusStats(docs),
      Retrieval.queryTerms(queries), 3, 10000, TempCache.noop)
    val slice = parts.slice.count()
    val scored = parts.scoredA.count() + parts.scoredB.count()
    assert(scored < slice,
      s"no pruning: scored=$scored of slice=$slice")
    // and the pruned result is still exact
    val got = parts.result.select("query_id", "rank", "doc_id", "score_ppm")
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    val want = served(docs, queries, 3, pruned = false)
    assert(got == want)
    spark.catalog.clearCache()
  }
}

package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  test("postings: tf, dl and df are exact") {
    val docs = docsDf(
      0L -> "a b a c",
      1L -> "a b",
      2L -> "c c c")
    val got = Retrieval.postings(docs)
      .orderBy("term", "doc_id")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("a", 0L, 2L, 4L, 2L), // tf=2 in doc0, dl=4, df=2 (docs 0,1)
      ("a", 1L, 1L, 2L, 2L),
      ("b", 0L, 1L, 4L, 2L),
      ("b", 1L, 1L, 2L, 2L),
      ("c", 0L, 1L, 4L, 2L),
      ("c", 2L, 3L, 3L, 2L)))
  }

  test("corpusStats: avgdl is the exact long/long division") {
    val docs = docsDf(0L -> "a b a c", 1L -> "a b", 2L -> "c c c")
    val r = Retrieval.corpusStats(docs).collect().head
    assert(r.getLong(0) == 3L)
    assert(r.getDouble(1) == 9.0 / 3.0)
  }

  test("bm25 ranks a doc dense in the query term above a diluted one") {
    // query: "zebra". doc 10 is pure zebra; doc 11 mentions it once in
    // a long doc; doc 12 never does.
    val docs = docsDf(
      0L -> "zebra query stub",
      10L -> "zebra zebra zebra",
      11L -> ("zebra " + Seq.fill(60)("filler").mkString(" ")),
      12L -> "filler filler filler")
    val got = Retrieval.bm25TopK(docs, docs.filter(col("doc_id") === 0),
        k = 10, qLen = 1)
      .orderBy("rank").select("doc_id").as[Long].collect().toSeq
    assert(got == Seq(10L, 11L), s"got $got")
  }

  test("bm25 idf favors rare terms over common ones at equal tf") {
    // both candidate docs same length; doc 20 matches the rare term,
    // doc 21 the ubiquitous one.
    val docs = docsDf(
      0L -> "rare common",
      20L -> "rare pad pad",
      21L -> "common pad pad",
      22L -> "common x y",
      23L -> "common u v")
    val got = Retrieval.bm25TopK(docs, docs.filter(col("doc_id") === 0),
        k = 10, qLen = 2)
      .orderBy("rank").select("doc_id").as[Long].collect().toSeq
    assert(got.head == 20L, s"rare-term doc must outrank: $got")
  }

  test("serve-from-stored-postings equals the end-to-end chain") {
    val docs = docsDf((0L until 30L).map(i =>
      i -> s"t${i % 7} t${i % 5} t${i % 3} common pad${i % 2}"): _*)
    val queries = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
    val e2e = Retrieval.bm25TopK(docs, queries, k = 5)
      .orderBy("query_id", "rank").collect().toSeq
    val post = Retrieval.postings(docs)
    val served = Retrieval.bm25TopKFromPostings(post,
        Retrieval.corpusStats(docs), Retrieval.queryTerms(queries), k = 5)
      .orderBy("query_id", "rank").collect().toSeq
    assert(e2e == served)
  }

  test("attribute-scoped serving equals BM25 over an index of only the " +
    "matching sub-corpus (in-scope df / n_docs / avgdl)") {
    val docs = docsDf((0L until 30L).map(i =>
        i -> s"t${i % 7} t${i % 5} t${i % 3} common pad${i % 2}"): _*)
      .withColumn("lang",
        when(pmod(col("doc_id"), lit(3)) === 0, lit("en")).otherwise(lit("de")))
    // queries drawn from the FULL corpus (external to the scope)
    val queries = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
    val scopedPost = Retrieval.scopedPostings(docs, "lang")
    val scopedStat = Retrieval.scopedStats(docs, "lang")
    val served = Retrieval.bm25TopKFromPostings(
        scopedPost.filter(col("lang") === "en")
          .select("term", "doc_id", "tf", "dl", "df"),
        scopedStat.filter(col("lang") === "en").select("n_docs", "avgdl"),
        Retrieval.queryTerms(queries), k = 5)
      .orderBy("query_id", "rank").collect().toSeq
    // ... must equal the end-to-end chain over ONLY the scope's docs:
    // a scoped index is the index of exactly that sub-corpus
    val subCorpus = Retrieval.bm25TopK(docs.filter(col("lang") === "en"),
        queries, k = 5)
      .orderBy("query_id", "rank").collect().toSeq
    assert(served.nonEmpty && served == subCorpus,
      s"scoped=$served\nsub-corpus=$subCorpus")
    // per-scope stats are in-scope, not global: the en scope's n_docs
    // counts only en docs
    val statRow = scopedStat.filter(col("lang") === "en").collect().head
    assert(statRow.getLong(1) == 10L,
      s"in-scope n_docs must be the scope size: $statRow")
  }

  test("bounded top-k tail is result-identical to the rank window") {
    val docs = docsDf((0L until 40L).map(i =>
      i -> s"t${i % 7} t${i % 5} t${i % 3} common pad${i % 2}"): _*)
    val queries = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
    val qt = Retrieval.queryTerms(queries)
    val post = Retrieval.postings(docs)
    val stats = Retrieval.corpusStats(docs)
    val viaAgg = Retrieval.bm25TopKFromPostings(post, stats, qt, k = 5)
      .select("query_id", "rank", "doc_id", "score_ppm")
      .orderBy("query_id", "rank").collect().toSeq
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_ppm").desc, col("doc_id"))
    val viaWindow = post.join(broadcast(qt), Seq("term"))
      .filter(col("doc_id") =!= col("query_id"))
      .crossJoin(broadcast(stats))
      .withColumn("ppm", Retrieval.bm25Ppm(col("tf"), col("df"), col("dl"),
        col("n_docs"), col("avgdl")))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("ppm")).as("score_ppm"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select("query_id", "rank", "doc_id", "score_ppm")
      .orderBy("query_id", "rank").collect().toSeq
    assert(viaAgg == viaWindow)
  }

  test("postingsIncremental == full rebuild; overlapping deltas are idempotent") {
    val docs = docsDf((0L until 20L).map(i =>
      i -> s"t${i % 7} t${i % 5} t${i % 3} common"): _*)
    val full = Retrieval.postings(docs)
      .orderBy("term", "doc_id").collect().toSeq
    val stored = Retrieval.postings(docs.filter(col("doc_id") < 15))
    // delta passes the WHOLE corpus: stored ids must ride through the
    // anti join, not double-count
    val merged = Retrieval.postingsIncremental(stored, docs)
      .orderBy("term", "doc_id").collect().toSeq
    assert(merged == full)
    // and merging an already-complete index with itself changes nothing
    val again = Retrieval.postingsIncremental(
        Retrieval.postings(docs), docs)
      .orderBy("term", "doc_id").collect().toSeq
    assert(again == full)
  }

  test("segment merge: denormalized view == full rebuild; write set == " +
    "full rebuild restricted to fresh ids; idempotent; delta-only plan") {
    val docs = docsDf((0L until 20L).map(i =>
      i -> s"t${i % 7} t${i % 5} t${i % 3} common"): _*)
    val full = Retrieval.postings(docs)
      .orderBy("term", "doc_id").collect().toSeq
    val stored = Retrieval.segBuild(docs.filter(col("doc_id") >= 8))
    val delta = docs.filter(col("doc_id") < 12) // overlap: ids 8-11
    val merged = Retrieval.segMerge(stored, delta)
    assert(Retrieval.segDenormalize(merged)
      .orderBy("term", "doc_id").collect().toSeq == full)
    // the write set is exactly the full build's fresh-id rows, with
    // CORPUS-wide df values
    val ws = Retrieval.segMergeWriteSet(stored, delta)
      .orderBy("term", "doc_id").collect().toSeq
    assert(ws == full.filter(_.getLong(1) < 8L), s"ws=$ws")
    // idempotency: re-merging the same delta appends nothing
    val again = Retrieval.segMerge(merged, delta)
    assert(again.postings.count() == merged.postings.count())
    assert(Retrieval.segDenormalize(again)
      .orderBy("term", "doc_id").collect().toSeq == full)
    // (that the write set never touches stored POSTINGS is pinned at
    // the query level in PlanSpec: q_llm_bm25_inc_delta's scan set is
    // manifest + df parquet, without the postings parquet)

    // serving straight from segments == end-to-end inline
    val queries = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
    val e2e = Retrieval.bm25TopK(docs, queries, k = 5)
      .orderBy("query_id", "rank").collect().toSeq
    val seg = Retrieval.segBuild(docs)
    val served = Retrieval.bm25TopKFromSegments(seg,
        Retrieval.corpusStats(docs), Retrieval.queryTerms(queries), k = 5)
      .orderBy("query_id", "rank").collect().toSeq
    assert(e2e == served)
  }

  test("segment merge is duplicate-delta-safe: repeated delta rows " +
    "never inflate tf, df, or the manifest") {
    val docs = docsDf((0L until 10L).map(i =>
      i -> s"t${i % 4} t${i % 3} common"): _*)
    val full = Retrieval.postings(docs)
      .orderBy("term", "doc_id").collect().toSeq
    val stored = Retrieval.segBuild(docs.filter(col("doc_id") >= 6))
    // an at-least-once crawl: every delta doc delivered TWICE
    val delta = docs.filter(col("doc_id") < 8)
    val merged = Retrieval.segMerge(stored, delta.unionAll(delta))
    assert(Retrieval.segDenormalize(merged)
      .orderBy("term", "doc_id").collect().toSeq == full)
    assert(merged.docIds.count() == merged.docIds.distinct().count())
    val ws = Retrieval.segMergeWriteSet(stored, delta.unionAll(delta))
      .orderBy("term", "doc_id").collect().toSeq
    assert(ws == full.filter(_.getLong(1) < 6L), s"ws=$ws")
    // same contract through the manifest-probed positional merge
    val ppFull = Retrieval.positionalPostings(docs)
      .select(col("term"), col("doc_id"), array_join(col("positions"), ","))
      .orderBy("term", "doc_id").collect().toSeq
    val ppMerged = Retrieval.positionalPostingsInc(
        Retrieval.positionalPostings(docs.filter(col("doc_id") >= 6)),
        docs.filter(col("doc_id") >= 6).select(col("doc_id")),
        delta.unionAll(delta))
      .select(col("term"), col("doc_id"), array_join(col("positions"), ","))
      .orderBy("term", "doc_id").collect().toSeq
    assert(ppMerged == ppFull)
  }

  test("unified segment merge: denormalized view == full rebuild " +
    "(positions ride the fresh rows)") {
    val docs = docsDf(
      0L -> "a b a", 1L -> "b c", 2L -> "c a c", 3L -> "d b d")
    def flat(df: DataFrame) = df
      .select(col("term"), col("doc_id"), col("tf"), col("dl"), col("df"),
        array_join(col("positions"), ","))
      .orderBy("term", "doc_id")
      .as[(String, Long, Long, Long, Long, String)].collect().toSeq
    val full = flat(Retrieval.buildIndexes(docs))
    val stored = Retrieval.segBuildUnified(docs.filter(col("doc_id") >= 2))
    val merged = Retrieval.segMergeUnified(stored, docs)
    assert(flat(Retrieval.segDenormalize(merged)) == full)
    val ws = flat(Retrieval.segMergeWriteSet(stored, docs,
      positional = true))
    assert(ws == full.filter(_._2 < 2L), s"ws=$ws")
  }

  test("co-bucketed (term) postings ⋈ df plans with ZERO exchange — the " +
    "vocab-exceeds-broadcast denormalize fallback") {
    val docs = docsDf((0L until 12L).map(i =>
      i -> s"w${i % 5} w${i % 3} shared"): _*)
    val seg = Retrieval.segBuild(docs)
    spark.sql("DROP TABLE IF EXISTS seg_cobucket_post")
    spark.sql("DROP TABLE IF EXISTS seg_cobucket_df")
    seg.postings.write.mode("overwrite").bucketBy(4, "term").sortBy("term")
      .option("path", "/root/repo/.segcache/test/seg_cobucket_post")
      .saveAsTable("seg_cobucket_post")
    seg.df.write.mode("overwrite").bucketBy(4, "term").sortBy("term")
      .option("path", "/root/repo/.segcache/test/seg_cobucket_df")
      .saveAsTable("seg_cobucket_df")
    // force the non-broadcast path: this is the vocab-TOO-BIG case,
    // where the co-bucketed sort-merge join must need no exchange
    val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("seg_cobucket_post")
        .join(spark.table("seg_cobucket_df"), Seq("term"))
      val p = joined.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      assert(p.contains("SortMergeJoin"), s"expected the SMJ shape:\n$p")
      assert(!p.contains("Exchange"),
        s"co-bucketed term join must be exchange-free:\n$p")
      assert(joined.count() == seg.postings.count())
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
  }

  test("serving from an incrementally merged index equals end-to-end") {
    val docs = docsDf((0L until 30L).map(i =>
      i -> s"t${i % 7} t${i % 5} t${i % 3} common pad${i % 2}"): _*)
    val queries = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
    val e2e = Retrieval.bm25TopK(docs, queries, k = 5)
      .orderBy("query_id", "rank").collect().toSeq
    val merged = Retrieval.postingsIncremental(
      Retrieval.postings(docs.filter(col("doc_id") < 20)), docs)
    val served = Retrieval.bm25TopKFromPostings(merged,
        Retrieval.corpusStats(docs), Retrieval.queryTerms(queries), k = 5)
      .orderBy("query_id", "rank").collect().toSeq
    assert(e2e == served)
  }

  test("phraseSearch: adjacency only, exact occurrence counts, overlaps") {
    val docs = docsDf(
      0L -> "x y query stub",              // query doc: phrase "x y"
      10L -> "x y z",                      // one occurrence
      11L -> "x z y",                      // terms present, NOT adjacent
      12L -> "x y x y",                    // two occurrences
      13L -> "y x",                        // reversed
      14L -> "a x y b x y c x y")          // three occurrences
    val phrases = Seq((0L, "x", "y")).toDF("query_id", "t1", "t2")
    val got = Retrieval.phraseSearch(
        Retrieval.positionalPostings(docs), phrases)
      .orderBy("doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 10L, 1L), (0L, 12L, 2L), (0L, 14L, 3L)), got.toString)
  }

  test("phraseSearch: self-overlapping repeated-term phrase counts correctly") {
    // "a a" in "a a a" occurs at positions 1 and 2
    val docs = docsDf(0L -> "a a q", 20L -> "a a a")
    val phrases = Seq((0L, "a", "a")).toDF("query_id", "t1", "t2")
    val got = Retrieval.phraseSearch(
        Retrieval.positionalPostings(docs), phrases)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 20L, 2L)), got.toString)
  }

  test("phraseSearchK: all slots must match at one start; repeated-term " +
    "phrases and partial matches handled") {
    val docs = docsDf(
      0L -> "x y z query stub",            // query doc: phrase "x y z"
      10L -> "x y z",                      // one occurrence
      11L -> "x y w z",                    // slots present, broken run
      12L -> "a x y z b x y z",            // two occurrences
      13L -> "x y",                        // slot 3 term absent entirely
      14L -> "z y x")                      // all terms, wrong order
    val phrases = Seq((0L, Seq("x", "y", "z"))).toDF("query_id", "terms")
    val got = Retrieval.phraseSearchK(
        Retrieval.positionalPostings(docs), phrases)
      .orderBy("doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 10L, 1L), (0L, 12L, 2L)), got.toString)
  }

  test("phraseSearchK: duplicate term at two slots intersects both shifts") {
    // "a b a" occurs in "a b a b a" at starts 1 and 3
    val docs = docsDf(0L -> "a b a q", 20L -> "a b a b a", 21L -> "a b b")
    val phrases = Seq((0L, Seq("a", "b", "a"))).toDF("query_id", "terms")
    val got = Retrieval.phraseSearchK(
        Retrieval.positionalPostings(docs), phrases)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 20L, 2L)), got.toString)
  }

  test("phraseSearchK with a 2-term phrase equals phraseSearch") {
    val docs = docsDf(0L -> "x y q", 10L -> "x y z", 11L -> "x z y",
      12L -> "x y x y", 14L -> "a x y b x y c x y")
    val pp = Retrieval.positionalPostings(docs)
    val two = Retrieval.phraseSearch(pp,
        Seq((0L, "x", "y")).toDF("query_id", "t1", "t2"))
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    val k = Retrieval.phraseSearchK(pp,
        Seq((0L, Seq("x", "y"))).toDF("query_id", "terms"))
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(two == k, s"two=$two k=$k")
  }

  test("proximitySearch: ordered pairs within slop, boundaries exact") {
    // pair (x, y), slop 3: count p2 - p1 in [1, 3]
    val docs = docsDf(
      0L -> "x y q",                       // query doc
      10L -> "x a a y",                    // distance 3: counts
      11L -> "x a a a y",                  // distance 4: out of slop
      12L -> "y x",                        // reversed: not ordered
      13L -> "x y x a y")                  // pairs: (1,2) (1,5)x (3,5) -> 2
    val pairs = Seq((0L, "x", "y")).toDF("query_id", "t1", "t2")
    val got = Retrieval.proximitySearch(
        Retrieval.positionalPostings(docs), pairs, slop = 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 10L, 1L), (0L, 13L, 2L)), got.toString)
  }

  test("proximitySearch: same term both slots counts ordered pairs only") {
    // (a, a) in "a a a": pairs (1,2) (1,3) (2,3) at slop 2 -> 3
    val docs = docsDf(0L -> "a a q", 20L -> "a a a")
    val pairs = Seq((0L, "a", "a")).toDF("query_id", "t1", "t2")
    val got = Retrieval.proximitySearch(
        Retrieval.positionalPostings(docs), pairs, slop = 2)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 20L, 3L)), got.toString)
  }

  test("snippets: first-occurrence window, clamped at document start") {
    val docs = docsDf(
      0L -> "x y q",                       // query doc: phrase "x y"
      10L -> "a b c x y d e",              // mid-doc: full ±2 window
      11L -> "x y t u v",                  // match at pos 1: clamps left
      12L -> "x y p x y")                  // two occurrences: FIRST wins
    val phrases = Seq((0L, Seq("x", "y"))).toDF("query_id", "terms")
    val got = Retrieval.snippets(docs,
        Retrieval.positionalPostings(docs), phrases, width = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (0L, 10L, 1L, 4L, "b c x y d e"),
      (0L, 11L, 1L, 1L, "x y t u"),
      (0L, 12L, 2L, 1L, "x y p x")), got.toString)
  }

  test("positionalPostingsInc == full rebuild; overlapping deltas idempotent") {
    val docs = docsDf(
      0L -> "a b a", 1L -> "b c", 2L -> "c a c", 3L -> "d b d")
    val full = Retrieval.positionalPostings(docs)
      .select(col("term"), col("doc_id"), array_join(col("positions"), ","))
      .orderBy("term", "doc_id")
      .as[(String, Long, String)].collect().toSeq
    val stored = Retrieval.positionalPostings(docs.filter(col("doc_id") < 2))
    // delta overlaps stored (docs 0-1 already indexed): must not dup
    val merged = Retrieval.positionalPostingsInc(stored, docs)
      .select(col("term"), col("doc_id"), array_join(col("positions"), ","))
      .orderBy("term", "doc_id")
      .as[(String, Long, String)].collect().toSeq
    assert(merged == full, s"merged=$merged full=$full")
  }

  test("buildIndexes == postings columns + positionalPostings positions") {
    val docs = docsDf(0L -> "a b a c", 1L -> "a b", 2L -> "c c c")
    val uni = Retrieval.buildIndexes(docs)
    val post = Retrieval.postings(docs)
      .orderBy("term", "doc_id")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    val uniPost = uni.select("term", "doc_id", "tf", "dl", "df")
      .orderBy("term", "doc_id")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(uniPost == post, s"uni=$uniPost post=$post")
    val pp = Retrieval.positionalPostings(docs)
      .orderBy("term", "doc_id")
      .as[(Long, String, Seq[Int])].collect().toSeq
    val uniPp = uni.select("doc_id", "term", "positions")
      .orderBy("term", "doc_id")
      .as[(Long, String, Seq[Int])].collect().toSeq
    assert(uniPp == pp, s"uni=$uniPp pp=$pp")
  }

  test("buildIndexesIncremental == full rebuild; overlapping deltas " +
    "idempotent") {
    val docs = docsDf(
      0L -> "a b a", 1L -> "b c", 2L -> "c a c", 3L -> "d b d")
    def flat(df: DataFrame) = df
      .select(col("term"), col("doc_id"), col("tf"), col("dl"), col("df"),
        array_join(col("positions"), ","))
      .orderBy("term", "doc_id")
      .as[(String, Long, Long, Long, Long, String)].collect().toSeq
    val full = flat(Retrieval.buildIndexes(docs))
    val stored = Retrieval.buildIndexes(docs.filter(col("doc_id") < 2))
    val merged = flat(Retrieval.buildIndexesIncremental(stored, docs))
    assert(merged == full, s"merged=$merged full=$full")
  }

  test("retrievalEval: hits@k, first rank, rr ppm; empty-rel query kept") {
    val ranking = Seq(
      // q1: relevant docs at ranks 2 and 5
      (1L, 1L, 100L), (1L, 2L, 101L), (1L, 3L, 102L),
      (1L, 4L, 103L), (1L, 5L, 104L),
      // q2: nothing relevant ever
      (2L, 1L, 200L), (2L, 2L, 201L)).toDF("query_id", "rank", "doc_id")
    val rel = Seq(
      (1L, 101L), (1L, 104L), (1L, 999L) // 999 never retrieved
    ).toDF("query_id", "doc_id")
    val got = Retrieval.retrievalEval(ranking, rel, k = 10)
      .orderBy("query_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 3L, 2L, 2L, 500000L),  // 3 relevant, 2 hit, first at rank 2
      (2L, 0L, 0L, 0L, 0L)), got.toString)
  }

  test("retrievalEval: zero-retrieval queries kept; duplicate judgments " +
    "deduplicated") {
    val ranking = Seq((1L, 1L, 100L), (1L, 2L, 101L))
      .toDF("query_id", "rank", "doc_id")
    val rel = Seq(
      (1L, 101L), (1L, 101L),  // duplicate judgment row: counts once
      (7L, 500L))              // q7 has relevance but NO ranking rows
      .toDF("query_id", "doc_id")
    val got = Retrieval.retrievalEval(ranking, rel, k = 10)
      .orderBy("query_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, 1L, 2L, 500000L),  // not n_rel=2/hits=2
      (7L, 1L, 0L, 0L, 0L)), got.toString)
  }

  test("positionalPostings: 1-based sorted positions per (doc, term)") {
    val got = Retrieval.positionalPostings(docsDf(0L -> "b a b"))
      .orderBy("term")
      .as[(Long, String, Seq[Int])].collect().toSeq
    assert(got == Seq((0L, "a", Seq(2)), (0L, "b", Seq(1, 3))), got.toString)
  }

  test("rrfFuse: integer scores, full-outer semantics, tie on doc_id") {
    val a = Seq((1L, 1L, 100L), (1L, 2L, 200L))
      .toDF("query_id", "rank", "doc_id")
    val b = Seq((1L, 1L, 200L), (1L, 2L, 300L))
      .toDF("query_id", "rank", "doc_id")
    val got = Retrieval.rrfFuse(a, b, k = 10)
      .orderBy("rank")
      .select("doc_id", "rrf_ppm").as[(Long, Long)].collect().toSeq
    // doc 200: 1000000/62 + 1000000/61 = 16129 + 16393 = 32522
    // doc 100: 1000000/61 = 16393; doc 300: 1000000/62 = 16129
    assert(got == Seq((200L, 32522L), (100L, 16393L), (300L, 16129L)))
  }

  test("rrf fusion surfaces a doc ranked mid-tier by both lists") {
    // doc 5 is rank 2 in both lists; each list's rank-1 doc is unique
    // to it. RRF puts the consensus doc first.
    val a = Seq((1L, 1L, 10L), (1L, 2L, 5L)).toDF("query_id", "rank", "doc_id")
    val b = Seq((1L, 1L, 20L), (1L, 2L, 5L)).toDF("query_id", "rank", "doc_id")
    val top = Retrieval.rrfFuse(a, b).orderBy("rank")
      .select("doc_id").as[Long].collect().head
    assert(top == 5L)
  }

  test("query-term broadcast probe: only query-term postings are scored") {
    val docs = docsDf(
      0L -> "needle alpha",
      1L -> "needle beta",
      2L -> "haystack gamma",
      3L -> "haystack delta")
    val qt = Seq((0L, "needle")).toDF("query_id", "term")
    val got = Retrieval.bm25TopKFromPostings(Retrieval.postings(docs),
        Retrieval.corpusStats(docs), qt, k = 10)
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(1L), s"only the other needle doc qualifies: $got")
  }
}

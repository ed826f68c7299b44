package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("exactDedup groups identical texts, keeps min id") {
    val df = docsDf(
      1L -> "a b c", 2L -> "a b c", 3L -> "x y z", 7L -> "a b c")
    val out = exact(df)
    assert(out("a b c") == (1L, 3L))
    assert(out("x y z") == (3L, 1L))
  }

  private def exact(df: org.apache.spark.sql.DataFrame) =
    TextDedup.exactDedup(df)
      .join(df.select(sha2(col("text").cast("binary"), 256).as("text_hash"),
        col("text")).distinct(), Seq("text_hash"))
      .select(col("text"), col("keep_id"), col("n_copies"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("minhashPairs finds planted near-dup, skips dissimilar") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 40).map(i => if (i == 20) "CHANGED" else s"w$i").mkString(" ")
    val other = (100 to 140).map(i => s"v$i").mkString(" ")
    val df = docsDf(1L -> base, 2L -> nearDup, 3L -> other)
    val pairs = TextDedup.minhashPairs(df, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)))
    // exact trigram jaccard of base vs nearDup: changed word breaks 3
    // of 38 shingles → 35 shared / 41 union
    assert(math.abs(pairs.head._3 - 35.0 / 41.0) < 1e-12)
  }

  test("simhashPairs: identical docs collide at hamming 0") {
    val a = (1 to 50).map(i => s"w$i").mkString(" ")
    val b = (1 to 50).map(i => if (i == 25) "X" else s"w$i").mkString(" ")
    val far = (200 to 250).map(i => s"z$i").mkString(" ")
    val df = docsDf(1L -> a, 2L -> a, 3L -> far, 4L -> b)
    val pairs = TextDedup.simhashPairs(df, maxHamming = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val identical = pairs.find(p => p._1 == 1L && p._2 == 2L)
    assert(identical.exists(_._3 == 0), s"identical docs not at hamming 0: ${pairs.toSeq}")
    assert(!pairs.exists(p => p._2 == 3L || p._1 == 3L), "dissimilar doc paired")
  }

  test("connectedComponents labels every component with its min id") {
    // chain 1-2-3 (transitive, never directly paired 1-3), pair 10-11,
    // cross-linked 20-21-22-20 cycle
    val pairs = Seq((2L, 1L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L), (22L, 20L))
      .toDF("ida", "idb")
    val out = TextDedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L), out.toString)
  }

  test("connectedComponents converges on the adversarial path graph") {
    // a 12-node chain is the worst case for min-label propagation
    // (rounds ≈ diameter; SCALE.md documents star contraction as the
    // upgrade path) — it must still converge under maxIter and label
    // everything with the chain head
    val chain = (1L until 12L).map(i => (i, i + 1)).toDF("ida", "idb")
    val out = TextDedup.connectedComponents(chain, maxIter = 50).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet == (1L to 12L).toSet)
    assert(out.values.forall(_ == 1L), s"one component labeled by head: $out")
  }

  test("star contraction equals min-label propagation on varied graphs") {
    import org.scalacheck.{Gen, rng}
    val shapes: Seq[(String, Seq[(Long, Long)])] = Seq(
      "chain" -> (1L until 20L).map(i => (i, i + 1)),
      "clique" -> (for { a <- 1L to 6L; b <- (a + 1) to 6L } yield (a, b)),
      "star" -> (2L to 9L).map(i => (10L, i)),          // hub is NOT the min
      "two components" -> Seq((5L, 6L), (6L, 7L), (30L, 40L)),
      "self-ish pairs" -> Seq((3L, 3L), (3L, 4L)))      // self-loop tolerated
    val genEdge = for {
      a <- Gen.chooseNum(1L, 30L); b <- Gen.chooseNum(1L, 30L)
    } yield (a, b)
    val random = (0 until 4).map { s =>
      s"random$s" -> (0 until 25).map(i =>
        genEdge.pureApply(Gen.Parameters.default, rng.Seed(777L + 100 * s + i)))
        .filter { case (a, b) => a != b }
    }
    (shapes ++ random).foreach { case (name, pairList) =>
      val pairs = pairList.toDF("ida", "idb")
      val byProp = TextDedup.connectedComponents(pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val byStar = TextDedup.connectedComponentsStar(pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(byStar == byProp, s"graph '$name': star=$byStar prop=$byProp")
    }
  }

  test("star contraction converges in logarithmic rounds on a long chain") {
    // a 64-node chain: min-label propagation needs ~63 rounds (capped
    // by maxIter); star contraction must finish well under its cap
    val chain = (1L until 64L).map(i => (i, i + 1)).toDF("ida", "idb")
    val persistedBefore = spark.sparkContext.getPersistentRDDs.size
    val out = TextDedup.connectedComponentsStar(chain, maxIter = 12).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet == (1L to 64L).toSet)
    assert(out.values.forall(_ == 1L),
      s"must fully contract within 12 rounds: ${out.filter(_._2 != 1L)}")
    // prior rounds' local-checkpoint blocks must be released as rounds
    // retire — only the final round's edge frame may remain cached
    // (executor storage would otherwise grow O(rounds))
    val leaked = spark.sparkContext.getPersistentRDDs.size - persistedBefore
    assert(leaked <= 1, s"star CC leaked $leaked checkpointed frames")
  }

  test("star contraction: one materialization per star step, one confirm join total") {
    // convergence detection rides the checkpoint materializations as
    // observed metrics (count + xor-fingerprint); the exact set-equality
    // join runs only once, when the fingerprints first claim a fixpoint.
    // An already-star-shaped graph converges in one round, so the
    // expected Dataset actions are: initial ck + (undirectedL ck +
    // next ck) + the single confirm join = 4.
    val actions = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, duration: Long): Unit =
        actions.incrementAndGet()
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("ida", "idb")
      TextDedup.connectedComponentsStar(pairs)
      // the listener bus is async; wait for the expected count, then a
      // grace period to surface over-counting
      val deadline = System.currentTimeMillis + 20000
      while (System.currentTimeMillis < deadline && actions.get < 4) Thread.sleep(100)
      Thread.sleep(1000)
      assert(actions.get == 4,
        s"expected 4 actions (init ck + 2 ck/round + 1 confirm), got ${actions.get}")
    } finally spark.listenerManager.unregister(listener)
  }

  test("dedupKeepList keeps one canonical doc per cluster plus unpaired docs") {
    val docs = docsDf(1L -> "a", 2L -> "b", 3L -> "c", 10L -> "d", 99L -> "lonely")
    val pairs = Seq((2L, 1L), (2L, 3L)).toDF("ida", "idb")
    val kept = TextDedup.dedupKeepList(docs, pairs)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 10L, 99L), s"min of {1,2,3} + unpaired survive: $kept")
  }

  test("dedupKeepBest keeps the max-score doc per cluster, min-id on ties") {
    val docs = docsDf(
      1L -> "short", 2L -> "the much longer copy", 3L -> "mid len",
      4L -> "same", 5L -> "same", 99L -> "lonely")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("ida", "idb")
    val kept = TextDedup.dedupKeepBest(docs, pairs, length(col("text")))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    // cluster {1,2,3}: 2 is longest; cluster {4,5}: tie → min id 4
    assert(kept == Set(2L, 4L, 99L), s"longest (tie → min id) survive: $kept")
  }

  test("dedupKeepBest with score -doc_id reduces to dedupKeepList") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val temps = new TempCache
    try {
      val pairs = TextDedup.minhashPairs(docs, temps = temps)
      val best = TextDedup.dedupKeepBest(docs, pairs, -col("doc_id"))
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
      val list = TextDedup.dedupKeepList(docs, pairs)
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
      assert(best == list, "max(-id) winner IS the min-id survivor")
    } finally temps.release(blocking = true)
  }

  test("end-to-end LSH dedup: keep-list over minhash pairs drops the planted dup") {
    // the production path: MinHash+LSH candidate pairs (not the bounded
    // Jaccard block) feeding the keep-list
    val base = "the quick brown fox jumps over the lazy dog again and again " * 3
    val docs = docsDf(
      1L -> base,
      2L -> (base + "tail"),             // planted near-dup of 1
      3L -> "completely different text about nothing similar at all here")
    val kept = TextDedup.dedupKeepList(docs, TextDedup.minhashPairs(docs))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L), s"near-dup 2 dropped, canonical 1 kept: $kept")
  }

  test("contamination counts distinct shared n-grams against the benchmark") {
    // bench doc 1: tokens b1..b20. doc 10 copies tokens b5..b16 (12
    // tokens → 5 distinct 8-grams, all present in bench). doc 11 is
    // clean. doc 12 shares only a 7-token run — under the 8-gram
    // threshold, so NOT flagged.
    val bench = docsDf(1L -> (1 to 20).map(i => s"b$i").mkString(" "))
    val docs = docsDf(
      10L -> (5 to 16).map(i => s"b$i").mkString(" "),
      11L -> (1 to 20).map(i => s"c$i").mkString(" "),
      12L -> ((5 to 11).map(i => s"b$i") :+ "X").mkString(" "))
    val out = TextDedup.contamination(docs, bench)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(10L -> 5L), out.toString)
  }

  test("newAgainstHistory keeps only docs absent from history, at any bloom sizing") {
    val history = docsDf(1L -> "old one", 2L -> "old two", 3L -> "old three")
    val docs = docsDf(
      10L -> "old two",      // exact dup of history → dropped
      11L -> "brand new",
      12L -> "old three",    // dup → dropped
      13L -> "also new")
    def run(expectedItems: Long) =
      TextDedup.newAgainstHistory(docs, history, expectedItems)
        .select(col("doc_id")).collect().map(_.getLong(0)).sorted.toSeq
    assert(run(4000000L) == Seq(11L, 13L))
    // a deliberately undersized bloom (high false-positive rate) routes
    // more rows through the exact anti join but never changes the answer
    assert(run(1L) == Seq(11L, 13L))
  }

  test("newAgainstHistory with an EMPTY history returns every document") {
    // Zero history rows aggregate to a null bloom; might_contain(null)
    // is null, which must read as "not in history", not "drop the row".
    val docs = docsDf(10L -> "first ever", 11L -> "second ever")
    val out = TextDedup.newAgainstHistory(docs,
        docs.filter(col("doc_id") < 0))
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted.toSeq
    assert(out == Seq(10L, 11L))
  }

  test("spanOverlapPairs flags doc pairs sharing a long copied span") {
    // a 12-token span contributes exactly 3 distinct 10-grams wholly
    // inside it — shared verbatim between docs 1 and 2 at different
    // offsets; doc 3 shares nothing
    val span = (1 to 12).map(i => s"s$i").mkString(" ")
    val docs = docsDf(
      1L -> (span + " tail one two three"),
      2L -> ("prefix words here " + span),
      3L -> (100 to 130).map(i => s"z$i").mkString(" "))
    val out = TextDedup.spanOverlapPairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((1L, 2L, 3L)), out.toString)
  }

  test("spanOverlapPairs caps degenerate buckets (corpus-wide boilerplate)") {
    // the same span in every doc: bucket size 4 > maxBucket 3 → capped
    // out, no O(bucket²) pair explosion, no pairs reported
    val span = (1 to 15).map(i => s"s$i").mkString(" ")
    val docs = docsDf((1L to 4L).map(i => i -> s"doc$i $span"): _*)
    assert(TextDedup.spanOverlapPairs(docs, maxBucket = 3).isEmpty)
    // with the cap admitting them, all 6 pairs surface
    assert(TextDedup.spanOverlapPairs(docs, maxBucket = 10).count() == 6L)
  }

  test("shingleSet falls back to whole text when shorter than n") {
    val out = docsDf(1L -> "just two")
      .select(TextDedup.shingleSet(col("text")).as("s"))
      .collect()(0).getSeq[String](0)
    assert(out == Seq("just two"))
  }

  test("dupRuns: longest cross-document shingle run, gaps reset the island") {
    // docs 1/2 share a 5-token prefix → 3 consecutive shared trigrams;
    // doc 3 is disjoint; doc 4 shares with doc 1 a SECOND, separate run
    val docs = docsDf(
      1L -> "x1 x2 x3 x4 x5 a1 a2 y1 y2 y3 y4 a3",
      2L -> "x1 x2 x3 x4 x5 b1 b2",
      3L -> "c1 c2 c3 c4 c5 c6 c7",
      4L -> "d1 y1 y2 y3 y4 d2")
    val out = TextDedup.dupRuns(docs).orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc1: 10 shingles; dup: pos 0-2 (x-run) and pos 7-8 (y-run) →
    // n_dup 5, max run 3. doc2: 5 shingles, dup pos 0-2. doc4: 4
    // shingles, dup pos 1-2 (y1 y2 y3, y2 y3 y4).
    assert(out.toSeq == Seq(
      (1L, 10L, 5L, 3L), (2L, 5L, 3L, 3L),
      (3L, 5L, 0L, 0L), (4L, 4L, 2L, 2L)), out.toSeq)
  }

  test("nearDupAgainstHistory flags fuzzy matches exact hist-dedup misses") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val variant = (1 to 40).map(i => if (i == 20) "CHANGED" else s"w$i").mkString(" ")
    val history = docsDf(1L -> base,
      2L -> ("completely different history doc " +
        (1 to 30).map(i => s"h$i").mkString(" ")))
    val docs = docsDf(10L -> variant, // near-dup of history 1, not exact
      11L -> (200 to 240).map(i => s"z$i").mkString(" ")) // novel
    val out = TextDedup.nearDupAgainstHistory(docs, history)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.length == 1 && out(0)._1 == 10L && out(0)._2 == 1L &&
      out(0)._3 >= 0.5, out.toSeq)
    // the exact path would NOT flag the variant (different content hash)
    val exactNew = TextDedup.newAgainstHistory(docs, history)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(exactNew == Set(10L, 11L), "exact dedup keeps the rewrite")
  }

  test("dedupImpact: token-weighted keep rates per source") {
    import spark.implicits._
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, "web", "en", base),
      (2L, "web", "en", base), // dup of 1 → dropped, tokens and all
      (3L, "web", "en", "totally different text right here"),
      (4L, "forum", "en", "short post")
    ).toDF("doc_id", "source", "lang", "text")
    val out = TextDedup.dedupImpact(docs).orderBy(col("source")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      ("forum", 1L, 1L, 2L, 2L),
      ("web", 3L, 2L, 65L, 35L)), out.toSeq)
  }

  test("dedupClusterStats: histogram of component sizes") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("ida", "idb")
    val out = TextDedup.dedupClusterStats(pairs).orderBy(col("cluster_size"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((2L, 1L), (3L, 1L)), out.toSeq)
  }

  test("dupRuns: identical short docs count via the whole-text fallback hash") {
    val docs = docsDf(1L -> "same tiny", 2L -> "same tiny", 3L -> "other")
    val out = TextDedup.dupRuns(docs).orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 1L, 1L, 1L), (2L, 1L, 1L, 1L), (3L, 1L, 0L, 0L)), out.toSeq)
  }

  test("nearDupAgainstHistorySigs == recompute path, over a bucketed sig table") {
    // the recurring-run shape: history signed ONCE, written bucketed,
    // nightly runs read the table and hash only the new slice
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val history = docs.filter(col("doc_id") < 250)
      .select(col("doc_id"), col("text"))
    val fresh = docs.filter(col("doc_id") >= 250)
      .select(col("doc_id"), col("text"))
    graft.sources.Warehouse.writeBucketed(
      TextDedup.minhashSignatures(history), "hist_sigs_spec", buckets = 8)
    try {
      val histSigs = graft.sources.Warehouse.readBucketed(spark, "hist_sigs_spec")
      def key(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val viaSigs = key(TextDedup.nearDupAgainstHistorySigs(fresh, histSigs))
      val recompute = key(TextDedup.nearDupAgainstHistory(fresh, history))
      assert(viaSigs == recompute && viaSigs.nonEmpty,
        s"sig path must equal recompute: ${viaSigs.size} vs ${recompute.size}")
      // the bucketed read pre-pays the doc_id exchange: a groupBy on the
      // bucket key plans with no Exchange on the table side
      val p = histSigs.groupBy(col("doc_id")).agg(count(lit(1)))
        .queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        s"bucketed sig table must aggregate exchange-free:\n$p")
    } finally spark.sql("DROP TABLE IF EXISTS hist_sigs_spec")
  }

  test("nearDupAgainstHistorySigs RAISES on a numPerm mismatch") {
    // history signed with 32 perms, read back assuming 64: band slices
    // would run off the array and silently corrupt bucket keys — the
    // guard turns that into an execution-time error (ADVICE r6)
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val fresh = docsDf(10L -> base)
    val histSigs = TextDedup.minhashSignatures(
      docsDf(1L -> base), numPerm = 32)
    val err = intercept[Exception] {
      TextDedup.nearDupAgainstHistorySigs(fresh, histSigs, numPerm = 64)
        .collect()
    }
    assert(err.getMessage.contains("different permutation count"),
      s"expected the sig-length guard, got: ${err.getMessage}")
  }

  test("history variants RAISE when the doc_id spaces overlap") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = docsDf(1L -> base, 2L -> (50 to 90).map(i => s"y$i").mkString(" "))
    val history = docsDf(1L -> base) // id 1 on BOTH sides
    val err = intercept[Exception] {
      TextDedup.nearDupAgainstHistory(docs, history).collect()
    }
    assert(err.getMessage.contains("BOTH docs and history"),
      s"expected the disjointness guard, got: ${err.getMessage}")
  }

  test("dedupImpact over production minhash pairs (not just the oracle block)") {
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val near = (1 to 30).map(i => if (i == 15) "CHANGED" else s"w$i").mkString(" ")
    val docs = Seq(
      (1L, "web", "en", base),
      (2L, "web", "en", near), // near-dup of 1 → LSH drops one
      (3L, "forum", "en", (100 to 130).map(i => s"v$i").mkString(" "))
    ).toDF("doc_id", "source", "lang", "text")
    val out = TextDedup.dedupImpact(docs, TextDedup.minhashPairs(docs))
      .orderBy(col("source")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // web: 2 docs, 1 kept after near-dup collapse; forum untouched
    assert(out.toSeq == Seq(("forum", 1L, 1L), ("web", 2L, 1L)), out.toSeq)
  }

  test("TempCache releases every persisted intermediate after materialization") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val near = (1 to 40).map(i => if (i == 7) "X" else s"w$i").mkString(" ")
    val docs = docsDf(1L -> base, 2L -> near,
      3L -> (100 to 140).map(i => s"v$i").mkString(" "))
    // the shared session carries cached plans from earlier tests whose
    // entries CacheManager may dedupe against — start from a clean slate
    spark.catalog.clearCache()
    val temps = new TempCache
    // track the SPECIFIC rdd ids this call adds: earlier tests' stray
    // localCheckpoint rdds are reclaimed by the ContextCleaner at GC
    // whim, so global counts are racy
    val before = spark.sparkContext.getPersistentRDDs.keySet
    TextDedup.minhashPairs(docs, temps = temps).collect()
    assert(temps.size == 1, "minhashPairs registers its signature cache")
    val added = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(added.nonEmpty, "the signature frame is cached while in use")
    temps.release(blocking = true)
    assert((spark.sparkContext.getPersistentRDDs.keySet & added).isEmpty,
      "release must drop the cached blocks (the r5 ADVICE leak)")
  }

  test("dedupWeights: 1e6/cluster_size for members, exactly 1e6 for singletons") {
    val docs = docsDf(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d", 9L -> "solo")
    // pairs: {1,2,3} one cluster; 4 and 9 appear in no pair
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("ida", "idb")
    val out = TextDedup.dedupWeights(docs, pairs)
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (1L, 3L, 333333L), (2L, 3L, 333333L), (3L, 3L, 333333L),
      (4L, 1L, 1000000L), (9L, 1L, 1000000L)), out.toSeq.toString)
    // cluster exposure: member weights sum to ~1e6 (floor slack < size)
    val clusterSum = out.filter(_._2 == 3L).map(_._3).sum
    assert(clusterSum <= 1000000L && clusterSum > 1000000L - 3, clusterSum.toString)
  }

  test("spanScrub removes cross-doc copied spans, keeps unique text") {
    val shared = (1 to 10).map(i => s"s$i").mkString(" ") // one shared 10-gram
    val docs = docsDf(
      1L -> s"$shared k l",       // 10-grams at pos 1..3; pos 1 is shared
      2L -> s"x y $shared z",     // shared 10-gram at pos 3
      3L -> "m n o",              // short, unique -> untouched
      4L -> "p q r",              // short exact dup pair -> whole-doc span
      5L -> "p q r")
    val out = TextDedup.spanScrub(docs).orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out(0) == (1L, "k l", 12L, 10L), out(0).toString)
    assert(out(1) == (2L, "x y z", 13L, 10L), out(1).toString)
    assert(out(2) == (3L, "m n o", 3L, 0L), out(2).toString)
    assert(out(3) == (4L, "", 3L, 3L), out(3).toString)
    assert(out(4) == (5L, "", 3L, 3L), out(4).toString)
  }

  test("exactSpans reports maximal verbatim-dup spans at exact byte offsets") {
    // n=5 keeps the hand-computation manageable; semantics are n-free
    val docs = docsDf(
      1L -> "a b c d e f g h u1 u2",            // 5-gram hits at 1..4 -> one span over tokens 1..8
      2L -> "z1 z2 a b c d e f g h",            // same run shifted -> span over tokens 3..10
      3L -> "p q r s t u v w",                  // unique long doc -> no spans
      4L -> "x y z",                            // short exact dup pair ->
      5L -> "x y z",                            //   whole-doc span each
      6L -> "a b c d e M1 M2 M3 M4 M5 M6 a b c d e") // TWO disjoint spans
    val out = TextDedup.exactSpans(docs, n = 5)
      .orderBy(col("doc_id"), col("span_id")).collect()
    val byDoc = out.groupBy(_.getLong(0))
    assert(byDoc.keySet == Set(1L, 2L, 4L, 5L, 6L), "doc 3 has no dup span")
    def spans(id: Long) = byDoc(id).map(r =>
      (r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(spans(1L) == Seq((0L, 15L, 8L)), spans(1L).toString)
    assert(spans(2L) == Seq((6L, 21L, 8L)), spans(2L).toString)
    assert(spans(4L) == Seq((0L, 5L, 3L)) && spans(5L) == Seq((0L, 5L, 3L)))
    // disjoint hits (gap > span length) must NOT merge
    assert(spans(6L) == Seq((0L, 9L, 5L), (28L, 37L, 5L)), spans(6L).toString)
    // the byte-offset proof: substring the ORIGINAL text at the reported
    // offsets; its md5 must equal span_md5 and its token count the span's
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { r =>
      val (id, sb, eb) = (r.getLong(0), r.getLong(2).toInt, r.getLong(3).toInt)
      val sub = texts(id).substring(sb, eb)
      val md5hex = java.security.MessageDigest.getInstance("MD5")
        .digest(sub.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(md5hex == r.getString(5), s"span_md5 mismatch doc $id")
      assert(sub.split(" ").length == r.getLong(4), s"token count doc $id")
      assert(sb == 0 || texts(id).charAt(sb - 1) == ' ', "span starts at a token")
      assert(eb == texts(id).length || texts(id).charAt(eb) == ' ',
        "span ends at a token boundary")
    }
  }

  test("decontamScrub cuts only the leaked benchmark span, keeps the rest") {
    val passage = (1 to 8).map(i => s"b$i").mkString(" ") // one 8-gram
    val docs = docsDf(
      1L -> s"intro words here $passage and a long tail of clean text",
      2L -> "entirely unrelated document content",
      3L -> passage)                 // exact benchmark copy -> empty
    val benchmark = Seq((99L, passage)).toDF("doc_id", "text")
    val out = TextDedup.decontamScrub(docs, benchmark)
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    assert(out(0) == (1L,
      "intro words here and a long tail of clean text", 8L), out(0).toString)
    assert(out(1) == (2L, "entirely unrelated document content", 0L))
    assert(out(2) == (3L, "", 8L), out(2).toString)
    // empty benchmark is the identity scrub
    val id = TextDedup.decontamScrub(docs,
        Seq.empty[(Long, String)].toDF("doc_id", "text"))
      .orderBy(col("doc_id")).collect().map(_.getLong(3))
    assert(id.toSeq == Seq(0L, 0L, 0L))
  }

  test("spanScrub overlapping spans mask the union of their positions") {
    // docs share 10-grams at positions 1 AND 2 of doc 1 (an 11-token
    // copied run): covered = [1,11], survivor = the 12th token only
    val run = (1 to 11).map(i => s"r$i").mkString(" ")
    val docs = docsDf(
      1L -> s"$run tail1",
      2L -> s"$run tail2")
    val out = TextDedup.spanScrub(docs).orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    assert(out(0) == (1L, "tail1", 11L), out(0).toString)
    assert(out(1) == (2L, "tail2", 11L), out(1).toString)
  }
}

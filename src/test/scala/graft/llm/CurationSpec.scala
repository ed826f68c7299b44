package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Curation ops: content-determinism of sampling/splits, redaction. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("hashBucket depends only on content: stable across partitioning and order") {
    val texts = (1 to 50).map(i => (i.toLong, s"document number $i"))
    val a = texts.toDF("doc_id", "text")
    val b = texts.reverse.toDF("doc_id", "text").repartition(7)
    def buckets(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), Curation.hashBucket(col("text")).as("b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(buckets(a) == buckets(b))
    assert(buckets(a).values.forall(v => v >= 0 && v < 100))
  }

  test("splitByHash partitions every doc into exactly one split with stable bounds") {
    val df = (1 to 200).map(i => (i.toLong, s"text $i")).toDF("doc_id", "text")
      .select(col("doc_id"), Curation.hashBucket(col("text")).as("b"),
        Curation.splitByHash(col("text")).as("split"))
    val rows = df.collect()
    assert(rows.forall { r =>
      val (b, s) = (r.getLong(1), r.getString(2))
      (b < 90 && s == "train") || (b >= 90 && b < 95 && s == "val") ||
        (b >= 95 && s == "test")
    })
    // content-hash uniformity: train should dominate on 200 docs
    val n = rows.groupBy(_.getString(2)).view.mapValues(_.length).toMap
    assert(n.getOrElse("train", 0) > 150, n.toString)
  }

  test("sampleByHash keeps exactly the sub-pct buckets") {
    val df = (1 to 100).map(i => (i.toLong, s"text $i")).toDF("doc_id", "text")
    val kept = Curation.sampleByHash(df, col("text"), 10)
      .select(Curation.hashBucket(col("text")).as("b")).collect()
    assert(kept.forall(_.getLong(0) < 10))
    assert(kept.nonEmpty && kept.length < 30, s"~10% expected, got ${kept.length}")
  }

  test("mixSample admits per-source rates, content-deterministically") {
    val df = (1 to 300).map(i =>
      (i.toLong, s"src${i % 3}", s"document body number $i"))
      .toDF("doc_id", "source", "text")
    val rates = Map("src0" -> 10000, "src1" -> 0) // all of src0, none of src1
    val kept = Curation.mixSample(df, rates, defaultPer10k = 5000)
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(kept.count(_._2 == "src0") == 100, "rate 10000/10000 keeps all")
    assert(!kept.exists(_._2 == "src1"), "rate 0 keeps none")
    val src2 = kept.count(_._2 == "src2")
    assert(src2 > 25 && src2 < 75, s"default 50% rate, got $src2/100")
    // rerun on reshuffled input admits the identical set
    val again = Curation.mixSample(df.repartition(13), rates, 5000)
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted.toSeq
    assert(again == kept.map(_._1).sorted.toSeq)
  }

  test("temperatureMix: smallest source kept whole, larger admit ~sqrt-scaled") {
    // sources of 40 / 360 / 1000 docs: thresholds 1e6, floor(1e6/3),
    // floor(1e6/5) — admitted counts should land near 40 / 120 / 200
    val df = ((1 to 40).map(i => (i.toLong, "tiny", s"tiny doc $i")) ++
      (1 to 360).map(i => (1000L + i, "mid", s"mid doc $i")) ++
      (1 to 1000).map(i => (10000L + i, "big", s"big doc $i")))
      .toDF("doc_id", "source", "text")
    val out = Curation.temperatureMix(df)
      .select(col("source"), col("rate_ppm")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val bySrc = out.groupBy(_._1).view.mapValues(_.length).toMap
    val rates = out.toMap
    assert(rates("tiny") == 1000000L, "smallest source admits everything")
    assert(rates("mid") == 333333L && rates("big") == 200000L,
      s"thresholds must be the exact floored sqrt ratios: $rates")
    assert(bySrc("tiny") == 40, "ppm 1e6 keeps the whole source")
    // hash admission is ~uniform: expect 120 and 200 within wide bands
    assert(bySrc("mid") > 80 && bySrc("mid") < 160, bySrc.toString)
    assert(bySrc("big") > 140 && bySrc("big") < 260, bySrc.toString)
    // content-deterministic under repartitioning
    val again = Curation.temperatureMix(df.repartition(13))
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted.toSeq
    val first = Curation.temperatureMix(df)
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted.toSeq
    assert(again == first)
  }

  test("shuffleKey: seeded deterministic permutation, new seed → new order") {
    val df = (1 to 100).map(i => Tuple1(i.toLong)).toDF("doc_id")
    def order(seed: Long): Seq[Long] =
      df.select(col("doc_id"), Curation.shuffleKey(col("doc_id"), seed).as("k"))
        .orderBy(col("k"), col("doc_id")).collect().map(_.getLong(0)).toSeq
    val o7 = order(7L)
    assert(o7 == order(7L), "same seed must reproduce byte-identical order")
    assert(o7 != order(8L), "different seeds must permute differently")
    assert(o7.sorted == (1L to 100L), "a permutation, not a sample")
    assert(o7 != (1L to 100L).toSeq, "and actually shuffled")
  }

  test("stripMarkup drops script/style wholesale, tags, entities; collapses whitespace") {
    val html =
      """<html><head><style>p { color: red; }</style></head>
        |<body onload="go()">Hello <b>world</b>!&nbsp;&amp; more
        |<script type="text/js">if (a < b) { alert("<p>hi</p>"); }</script>
        |tail</body></html>""".stripMargin
    val out = Seq((1L, html)).toDF("doc_id", "text")
      .select(Curation.stripMarkup(col("text")).as("t")).collect()(0).getString(0)
    assert(out == "Hello world ! more tail", s"[$out]")
  }

  test("dedupParagraphs drops repeats, keeps first-occurrence order") {
    val out = Seq((1L, "x y. a b. x y. c d. a b"))
      .toDF("doc_id", "text")
      .select(Curation.dedupParagraphs(col("text")).as("t")).collect()(0).getString(0)
    assert(out == "x y. a b. c d", out)
  }

  test("lineDedup keeps a shared line only in its lowest-doc_id owner") {
    val docs = Seq(
      (1L, "unique one. SHARED FOOTER. unique two"),
      (2L, "other text. SHARED FOOTER"),
      (3L, "SHARED FOOTER"))
      .toDF("doc_id", "text")
    val out = Curation.lineDedup(docs).orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out(0) == ((1L, 3L, 3L, "unique one. SHARED FOOTER. unique two")))
    assert(out(1) == ((2L, 2L, 1L, "other text")))
    assert(out(2) == ((3L, 1L, 0L, "")), "all lines dropped -> empty doc")
    // hashed and raw line keys agree (the scale path shuffles longs)
    val raw = Curation.lineDedup(docs, hashKey = false)
      .orderBy(col("doc_id")).collect().map(_.toSeq)
    assert(out.map(t => Seq(t._1, t._2, t._3, t._4)).toSeq == raw.toSeq)
  }

  test("lineDedup invariants hold on generated corpora (property)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // small vocab of lines forces heavy cross-document sharing; fixed
    // per-doc seeds make any failure replayable
    val genLine = Gen.oneOf((1 to 12).map(i => s"line $i"))
    val genDoc = Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, genLine))
    val corpus = (0 until 40)
      .map(i => genDoc.pureApply(Gen.Parameters.default, Seed(9000L + i)))
      .zipWithIndex.map { case (ls, i) => (i.toLong, ls.mkString(". ")) }
    val docs = corpus.toDF("doc_id", "text")
    val out = Curation.lineDedup(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    val lineOwner = corpus
      .flatMap { case (id, t) => t.split(java.util.regex.Pattern.quote(". ")).map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    corpus.foreach { case (id, t) =>
      val orig = t.split(java.util.regex.Pattern.quote(". ")).toSeq
      val (nLines, nKept, cleaned) = out(id)
      // every original line counted; kept = exactly the owned occurrences
      assert(nLines == orig.length.toLong)
      val expectKept = orig.filter(l => lineOwner(l) == id)
      assert(nKept == expectKept.length.toLong, s"doc $id")
      // reassembly preserves original order of surviving occurrences
      assert(cleaned == expectKept.mkString(". "), s"doc $id")
    }
    // corpus-wide: each distinct line survives somewhere exactly once
    // per owned occurrence — no line is deleted from its owner
    lineOwner.foreach { case (line, owner) =>
      assert(out(owner)._3.split(java.util.regex.Pattern.quote(". ")).contains(line),
        s"'$line' missing from owner doc $owner")
    }
  }

  test("packSequences chunks each source stream at the token budget") {
    // 3 docs of 200 tokens: cumulative 200/400/600 → with budget 512
    // the 3rd doc starts at 400 < 512 (seq 0), 4th at 600 (seq 1)
    val docs = (1 to 4).map(i => (i.toLong, "s", ("w " * 199 + "w")))
      .toDF("doc_id", "source", "text")
    val out = Curation.packSequences(docs).orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, 200L, 0L, 0L), (2L, 200L, 0L, 200L),
      (3L, 200L, 0L, 400L), (4L, 200L, 1L, 88L)))
    // independent sources pack independently
    val two = docs.union(Seq((9L, "t", "w w w")).toDF("doc_id", "source", "text"))
    val t9 = Curation.packSequences(two).filter(col("source") === "t").collect()(0)
    assert(t9.getLong(3) == 0L && t9.getLong(4) == 0L)
  }

  test("redact scrubs emails and long digit runs, leaves short numbers") {
    val out = Seq((1L, "mail bob@example.com card 12345678 zip 02139 pin 123"))
      .toDF("doc_id", "text")
      .select(Curation.redact(col("text")).as("r")).collect()(0).getString(0)
    assert(out == "mail <EMAIL> card <NUM> zip 02139 pin 123", out)
  }

  test("normalize: control chars out, whitespace collapsed, lowercased") {
    val out = Seq((1L, "Hello\t  WORLD \r\n x"))
      .toDF("doc_id", "text")
      .select(Curation.normalize(col("text")).as("n")).collect()(0).getString(0)
    assert(out == "hello world x", s"[$out]")
    // already-normal text is a fixpoint
    val fix = Seq((1L, "already clean text")).toDF("doc_id", "text")
      .select(Curation.normalize(col("text")).as("n")).collect()(0).getString(0)
    assert(fix == "already clean text")
  }

  test("quotaSample: exactly quota per source, content-deterministic") {
    val docs = (1 to 60).map(i => (i.toLong, s"src${i % 3}", s"text number $i"))
      .toDF("doc_id", "source", "text")
    def ids(df: org.apache.spark.sql.DataFrame) =
      Curation.quotaSample(df, 5).select(col("doc_id"))
        .collect().map(_.getLong(0)).toSet
    val a = ids(docs)
    // identical sample whatever the partitioning or input order
    val b = ids(docs.repartition(13).orderBy(col("doc_id").desc))
    assert(a == b, s"$a vs $b")
    val perSource = Curation.quotaSample(docs, 5)
      .groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perSource == Map("src0" -> 5L, "src1" -> 5L, "src2" -> 5L))
    // a quota above the stratum size returns the whole stratum
    assert(Curation.quotaSample(docs, 100).count() == 60L)
  }

  test("chunkDocs: stride-aligned windows that tile the text; empty text keeps one chunk") {
    val text = "ab" * 500 // 1000 chars
    val docs = Seq((1L, text), (2L, "")).toDF("doc_id", "text")
    val rows = Curation.chunkDocs(docs, size = 500, stride = 400)
      .orderBy(col("doc_id"), col("chunk_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == Seq(
      (1L, 0L, 0L, 500L), (1L, 1L, 400L, 500L), (1L, 2L, 800L, 200L),
      (2L, 0L, 0L, 0L)), rows.toSeq)
    // overlapping windows really overlap: chunk 0's tail = chunk 1's head
    val md5s = Curation.chunkDocs(docs.filter(col("doc_id") === 1L))
      .select(col("chunk_md5")).collect().map(_.getString(0))
    assert(md5s.distinct.length == 2, // chunks 0 and 1 identical ("ab"*250)
      "500-char windows of a 2-periodic string repeat")
  }

  test("exportCorpus: (split, source) layout, rerun-identical memberships") {
    val docs = (1 to 80).map(i =>
      (i.toLong, s"src${i % 2}", s"document body number $i with words"))
      .toDF("doc_id", "source", "text")
    val d1 = java.nio.file.Files.createTempDirectory("corpus1").toString
    val d2 = java.nio.file.Files.createTempDirectory("corpus2").toString
    Curation.exportCorpus(docs, d1)
    Curation.exportCorpus(docs.repartition(13).orderBy(col("doc_id").desc), d2)
    def layout(d: String): Map[(String, String), Seq[Long]] =
      spark.read.parquet(d)
        .select(col("split"), col("source"), col("doc_id")).collect()
        .groupBy(r => (r.getString(0), r.getString(1)))
        .view.mapValues(_.map(_.getLong(2)).sorted.toSeq).toMap
    val (l1, l2) = (layout(d1), layout(d2))
    assert(l1 == l2, "partition membership must be content-deterministic")
    assert(l1.values.map(_.size).sum == 80)
    assert(l1.keys.map(_._1).toSet.subsetOf(Set("train", "val", "test")))
    // the physical layout is hive-partitioned directories
    val dirs = new java.io.File(d1).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.forall(_.startsWith("split=")), dirs.toSeq)
    // the skew valve spreads a partition over N files, data unchanged
    val d3 = java.nio.file.Files.createTempDirectory("corpus3").toString
    Curation.exportCorpus(docs, d3, filesPerPartition = 4)
    assert(layout(d3) == l1, "salting must not change memberships")
  }

  test("corpusDiff labels added/removed/changed/unchanged by id and content") {
    val v1 = Seq((1L, "same"), (2L, "old text"), (3L, "gone"))
      .toDF("doc_id", "text")
    val v2 = Seq((1L, "same"), (2L, "new text"), (4L, "fresh"))
      .toDF("doc_id", "text")
    val out = Curation.corpusDiff(v1, v2).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"), out.toString)
  }

  test("clusterTemperatureMix: min cluster kept whole, larger sqrt-throttled, un-embedded docs out") {
    graft.functions.GraftFunctions.register(spark)
    // 9 vecs hug centroid 0, 3 hug centroid 1; doc 13 has no embedding.
    val vecs = ((1L to 9L).map(i => (i, Array(1.0f, 0.1f * (i % 3)))) ++
      (10L to 12L).map(i => (i, Array(0.1f * (i % 2), 1.0f))))
      .toDF("vec_id", "embedding")
    val coarse = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)))
      .toDF("c_id", "embedding")
      .select(col("c_id"), Similarity.quantize(col("embedding")).as("c_q"))
    val docs = (1L to 13L).map(i => (i, s"body of document $i"))
      .toDF("doc_id", "text")
    val out = Curation.clusterTemperatureMix(docs, vecs, coarse)
      .select(col("doc_id"), col("cluster_id"), col("rate_ppm")).collect()
    val byCluster = out.groupBy(_.getLong(1))
    // rates: min cluster (3 docs) exactly 1e6; 9-doc cluster floor(1e6*sqrt(3)/sqrt(9))
    assert(out.filter(_.getLong(1) == 1L).forall(_.getLong(2) == 1000000L))
    assert(out.filter(_.getLong(1) == 0L).forall(_.getLong(2) == 577350L))
    // the whole min cluster is admitted (every ppm bucket < 1e6)
    assert(byCluster(1L).map(_.getLong(0)).toSet == Set(10L, 11L, 12L))
    // no un-embedded doc leaks in
    assert(out.forall(_.getLong(0) != 13L))
  }

  test("clusterSourceCard: dominant source per cluster with exact ppm, ties -> smallest source") {
    graft.functions.GraftFunctions.register(spark)
    val vecs = ((1L to 4L).map(i => (i, Array(1.0f, 0.0f))) ++
      (5L to 6L).map(i => (i, Array(0.0f, 1.0f))))
      .toDF("vec_id", "embedding")
    val coarse = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)))
      .toDF("c_id", "embedding")
      .select(col("c_id"), Similarity.quantize(col("embedding")).as("c_q"))
    // cluster 0: 3 of "w", 1 of "f" -> top w at 750000 ppm
    // cluster 1: 1 "b", 1 "a" tie  -> lexicographically smallest "a" wins
    val docs = Seq((1L, "w"), (2L, "w"), (3L, "w"), (4L, "f"),
      (5L, "b"), (6L, "a")).map { case (i, s) => (i, s, s"text $i") }
      .toDF("doc_id", "source", "text")
    val out = Curation.clusterSourceCard(docs, vecs, coarse)
      .orderBy(col("cluster_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(out.toSeq == Seq((0L, 4L, "w", 750000L), (1L, 2L, "a", 500000L)),
      out.toSeq.toString)
  }

  test("releaseManifest: order/partition-independent checksum that flips on any edit") {
    val docs = (1 to 60).map(i => (i.toLong, s"src${i % 3}", s"document body $i"))
      .toDF("doc_id", "source", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      Curation.releaseManifest(df).orderBy(col("split"), col("source"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSeq
    val base = rows(docs)
    // identical content in reversed order and odd partitioning: same manifest
    assert(rows(docs.orderBy(col("doc_id").desc).repartition(7)) == base)
    // one edited doc flips exactly the affected group's checksum
    val edited = docs.withColumn("text",
      when(col("doc_id") === 30L, lit("tampered")).otherwise(col("text")))
    assert(rows(edited) != base)
  }

  test("diffManifests: group statuses, count-vs-content drift split, outer sides") {
    val mk = (rows: Seq[(Long, String, String)]) =>
      Curation.releaseManifest(rows.toDF("doc_id", "source", "text"))
    // build via fixed split bucketing by using single-split texts is
    // fragile; assert on the group level instead: same docs -> all
    // unchanged; one edit -> exactly the affected groups flip
    val v1 = (1 to 40).map(i => (i.toLong, s"s${i % 2}", s"doc body $i"))
    val same = Curation.diffManifests(mk(v1), mk(v1)).collect()
    assert(same.nonEmpty && same.forall(_.getString(2) == "unchanged"))
    assert(same.forall(_.getLong(3) == 0L))
    // in-place edit: membership counts hold, checksum flips -> changed
    val v2 = v1.map { case (id, s, t) =>
      (id, s, if (id == 5L) "tampered body" else t) }
    val d2 = Curation.diffManifests(mk(v1), mk(v2)).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(d2.exists(_._3 == "changed"), d2.toSeq.toString)
    // a doc REMOVED from v2 entirely: its group goes changed with n_delta < 0
    val v3 = v1.filterNot(_._1 == 6L)
    val d3 = Curation.diffManifests(mk(v1), mk(v3)).collect()
      .map(r => (r.getString(2), r.getLong(3)))
    assert(d3.exists { case (s, nd) => s == "changed" && nd == -1L } ||
      d3.exists { case (s, nd) => s == "removed" && nd < 0L }, d3.toSeq.toString)
  }

  test("clusterTemperatureMix composes with the trained kmeansQuantized centroids") {
    graft.functions.GraftFunctions.register(spark)
    // the production wiring: train fixed-k centroids, then balance on them
    val vecs = graft.Tables.load(spark, sf0001, "embeddings").limit(300)
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val trained = Similarity.kmeansQuantized(vecs, centroidStride = 100, iters = 2)
      .select(col("c_id"), col("c_q"))
    val out = Curation.clusterTemperatureMix(docs, vecs, trained)
      .select(col("doc_id"), col("cluster_id"), col("rate_ppm")).collect()
    assert(out.nonEmpty)
    val byCluster = out.groupBy(_.getLong(1)).view.mapValues(_.length).toMap
    assert(byCluster.size >= 2, s"trained centroids must partition: $byCluster")
    // every admitted doc clears its cluster threshold by construction;
    // the min cluster's rate is exactly 1e6
    assert(out.map(_.getLong(2)).max == 1000000L)
  }

  test("piiReport: exact per-source counts over seeded hits") {
    val docs = Seq(
      ("s1", "contact me a@b.co now"),
      ("s1", "account 123456 ok"),
      ("s1", "clean text"),
      ("s2", "x@y.io and 9876543 twice 1234567"))
      .map { case (s, t) => (s, t) }.toDF("source", "text")
    val out = Curation.piiReport(docs).orderBy(col("source")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out.toSeq == Seq(
      ("s1", 3L, 1L, 1L, 1L, 1L, 666666L),
      ("s2", 1L, 1L, 1L, 1L, 2L, 1000000L)), out.toSeq.toString)
  }

  test("boilerplate: lines repeated across >=3 docs of one source flag; cross-source repeats don't") {
    val docs = Seq(
      (1L, "web", "COOKIE BANNER. unique one"),
      (2L, "web", "COOKIE BANNER. unique two"),
      (3L, "web", "COOKIE BANNER. unique three"),
      (4L, "forum", "COOKIE BANNER. forum text"), // only 1 forum doc has it
      (5L, "forum", "clean forum post")
    ).toDF("doc_id", "source", "text")
    val out = Curation.boilerplate(docs, minDf = 3).orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (1L, 2L, 1L), (2L, 2L, 1L), (3L, 2L, 1L),
      (4L, 2L, 0L), (5L, 1L, 0L)), out.toSeq)
  }

  test("canonicalizeUrl applies every rule; non-defaults survive") {
    val cases = Seq(
      // scheme+host lowercased, default port and www dropped, tracker
      // first-then-real tidied, fragment stripped
      "HTTP://WWW.Example.COM:80/p/1?utm_source=a&id=2#frag" ->
        "http://example.com/p/1?id=2",
      // https default port; bare root slash collapses
      "https://Example.com:443/" -> "https://example.com",
      // NON-default port survives; path/query case is significant
      "https://example.com:8080/Path?Q=Upper" ->
        "https://example.com:8080/Path?Q=Upper",
      // trackers mid/end of the query, multiple in a row
      "http://example.com/p?id=2&utm_campaign=x&gclid=z" ->
        "http://example.com/p?id=2",
      // tracker-only query disappears entirely
      "http://example.com/p?utm_medium=mail" -> "http://example.com/p",
      // mismatched scheme/port pair is NOT stripped
      "http://example.com:443/p" -> "http://example.com:443/p",
      // already canonical stays fixed (idempotence anchor)
      "http://example.com/p/1?id=2" -> "http://example.com/p/1?id=2")
    val got = cases.map(_._1).zipWithIndex.map { case (u, i) => (i, u) }
      .toDF("i", "url")
      .select(col("i"), Curation.canonicalizeUrl(col("url")).as("c"))
      .collect().sortBy(_.getInt(0)).map(_.getString(1)).toSeq
    assert(got == cases.map(_._2), got.mkString("\n"))
    // idempotence: canonicalizing a canonical URL is the identity
    val twice = cases.map(_._2).zipWithIndex.map { case (u, i) => (i, u) }
      .toDF("i", "url")
      .select(col("i"), Curation.canonicalizeUrl(col("url")).as("c"))
      .collect().sortBy(_.getInt(0)).map(_.getString(1)).toSeq
    assert(twice == cases.map(_._2), "canonical form must be a fixed point")
  }

  test("urlDedup collapses variants of one page to one keeper") {
    val docs = Seq(
      (10L, "HTTP://WWW.Site.COM:80/a?utm_source=x&id=1#top"),
      (11L, "http://site.com/a?id=1"),
      (12L, "http://site.com/a?id=1&utm_campaign=y"),
      (13L, "https://other.org/b")).toDF("doc_id", "url")
    val got = Curation.urlDedup(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.toSeq == Seq(
      ("http://site.com/a?id=1", 3L, 10L),
      ("https://other.org/b", 1L, 13L)), got.toSeq)
  }

  test("leakProofSplit: one split per cluster; unpaired docs keep the plain split") {
    import spark.implicits._
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val out = Curation.leakProofSplit(docs, TextDedup.jaccardBlockPairs(docs))
    // invariant: every group has exactly one split among its members
    val perGroup = out.groupBy(col("group_id"))
      .agg(countDistinct(col("split")).as("n"), count(lit(1)).as("sz"))
    assert(perGroup.filter(col("n") =!= 1).count() == 0,
      "a near-dup cluster must land in ONE split")
    assert(perGroup.filter(col("sz") > 1).count() > 0,
      "the block must produce at least one real multi-doc cluster")
    // unpaired docs (group_id == own doc_id AND nothing else in the
    // group) match the plain content split exactly
    val plain = docs.select(col("doc_id"),
      Curation.splitByHash(col("text")).as("plain_split"))
    val solo = out.join(perGroup.filter(col("sz") === 1),
        out("group_id") === perGroup("group_id"))
      .join(plain, "doc_id")
    assert(solo.filter(col("split") =!= col("plain_split")).count() == 0)
    assert(out.count() == docs.count(), "left-outer: every doc assigned")
  }

  test("budgetSelect: per-source token budget respected, admitted in rank order") {
    import spark.implicits._
    val docs = Seq(
      // (doc_id, source, text) — source a: scores 1e6 (all distinct),
      // 500000 (half), 333333; budget 7 admits the best two (3+4=7)
      (1L, "a", "x y z"),                  // 3 tokens, 1e6 ppm
      (2L, "a", "p p q q"),                // 4 tokens, 5e5
      (3L, "a", "r r r s s s"),            // 6 tokens, 333333 — over budget
      (4L, "b", "lone doc")                // other source: own budget
    ).toDF("doc_id", "source", "text")
    val out = Curation.budgetSelect(docs, 7L)
      .select("doc_id", "n_tokens", "score_ppm", "cum_tokens")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 3L, 1000000L, 3L), (2L, 4L, 500000L, 7L),
      (4L, 2L, 1000000L, 2L)), out.toSeq)
    // determinism under repartition (window order is total)
    val re = Curation.budgetSelect(docs.repartition(7), 7L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(re == Set(1L, 2L, 4L))
  }

  test("curriculumPhases: exact nearest-rank global thresholds, monotone phases") {
    import spark.implicits._
    // 8 docs with token counts 1..8: quartile thresholds at 2, 4, 6
    val docs = (1 to 8).map(n =>
      (n.toLong, (1 to n).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Curation.curriculumPhases(docs)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (1L, 1L, 1L), (2L, 2L, 1L), (3L, 3L, 2L), (4L, 4L, 2L),
      (5L, 5L, 3L), (6L, 6L, 3L), (7L, 7L, 4L), (8L, 8L, 4L)), out.toSeq)
    // phases are monotone in n_tokens and stable under repartition
    val re = Curation.curriculumPhases(docs.repartition(5))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(re.toSeq == out.map(t => (t._1, t._3)).toSeq)
  }
}

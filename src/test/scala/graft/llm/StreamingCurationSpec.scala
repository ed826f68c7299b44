package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming curation: exact dedup and token accounting over a
  * continuous document feed, exercised through MemoryStream micro-
  * batches so watermark/state behavior is real, not simulated. */
class StreamingCurationSpec extends SparkSpec {
  import spark.implicits._

  private case class Doc(doc_id: Long, event_ts: java.sql.Timestamp,
      source: String, text: String)
  private def doc(id: Long, minute: Int, source: String, text: String) =
    Doc(id, new java.sql.Timestamp(minute * 60000L), source, text)

  test("streaming near-dup flags LSH hits across micro-batches; horizon evicts state") {
    implicit val sqlCtx = spark.sqlContext
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 40).map(i => if (i == 20) "CHANGED" else s"w$i").mkString(" ")
    val other = (100 to 140).map(i => s"v$i").mkString(" ")
    val in = MemoryStream[Doc]
    val q = StreamingCuration.streamingNearDup(in.toDF(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("sneardup")
      .outputMode("append").start()
    def hits(): Set[(Long, Long)] =
      spark.table("sneardup").select(col("ida"), col("idb"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    try {
      // minute 60+, not 0: a row AT the initial watermark (epoch 0)
      // would be dropped as late before reaching the stateful operator
      in.addData(doc(1, 60, "a", base), doc(3, 61, "a", other))
      q.processAllAvailable()
      assert(hits().isEmpty, "no near-dups yet")
      // batch 2: the near-dup arrives — flagged against batch 1's state
      in.addData(doc(2, 62, "a", nearDup))
      q.processAllAvailable()
      assert(hits() == Set((1L, 2L)), hits().toString)
      val est = spark.table("sneardup").select(col("est_jaccard"))
        .collect().map(_.getDouble(0))
      assert(est.forall(_ >= 0.5), est.toSeq.toString)
      // advance the watermark far past the horizon; bucket state for the
      // old docs evicts, so a late copy of base is NOT flagged
      in.addData(doc(8, 120, "a", (200 to 240).map(i => s"z$i").mkString(" ")))
      q.processAllAvailable()
      in.addData(doc(9, 121, "a", base))
      q.processAllAvailable()
      assert(hits() == Set((1L, 2L)),
        s"evicted state must not flag the late duplicate: ${hits()}")
    } finally q.stop()
  }

  test("hot band buckets prune members past the horizon (no eternal pinning)") {
    // Steady traffic into ONE bucket family: exact copies of the same
    // text every 8 minutes with a 10-minute horizon. The bucket never
    // hits the whole-bucket timeout (it is always hot), so each new
    // copy must pair ONLY with members still inside the horizon — the
    // first member must stop flagging once the horizon passes it.
    implicit val sqlCtx = spark.sqlContext
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val in = MemoryStream[Doc]
    val q = StreamingCuration.streamingNearDup(in.toDF(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("shotbucket")
      .outputMode("append").start()
    def hits(): Set[(Long, Long)] =
      spark.table("shotbucket").select(col("ida"), col("idb"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    try {
      var stateRows = List.empty[Long]
      for ((id, minute) <- Seq((1L, 60), (2L, 68), (3L, 76), (4L, 84))) {
        in.addData(doc(id, minute, "a", base))
        q.processAllAvailable()
        stateRows ::= q.lastProgress.stateOperators(0).numRowsTotal
      }
      // three horizon-spans of hot traffic: each doc pairs only with
      // its in-horizon predecessor, never the pinned first members
      assert(hits() == Set((1L, 2L), (2L, 3L), (3L, 4L)),
        s"horizon-expired members must not keep flagging: ${hits()}")
      // and bucket state does not grow across the spans
      assert(stateRows.distinct.size == 1,
        s"state rows must stay flat on a hot bucket: ${stateRows.reverse}")
    } finally q.stop()
  }

  test("month-bearing watermarks are rejected up front, not read as 0 ms") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Doc]
    val err = intercept[IllegalArgumentException] {
      StreamingCuration.streamingNearDup(in.toDF(), watermark = "1 month")
    }
    assert(err.getMessage.contains("month"))
  }

  test("streaming exact dedup emits first occurrence, suppresses in-horizon dups") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Doc]
    val q = StreamingCuration.streamingExactDedup(in.toDF(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("sdedup")
      .outputMode("append").start()
    try {
      in.addData(
        doc(1, 0, "a", "same text"),
        doc(2, 1, "b", "same text"),       // duplicate content, other source
        doc(3, 2, "a", "other text"))
      q.processAllAvailable()
      in.addData(doc(4, 3, "c", "same text"))  // still within horizon
      q.processAllAvailable()
      val ids = spark.table("sdedup").select(col("doc_id"))
        .collect().map(_.getLong(0)).sorted.toSeq
      // within one micro-batch the surviving duplicate is engine-order
      // (either 1 or 2, exactly one); across batches state suppresses 4
      assert(ids.length == 2 && ids.contains(3L) &&
        (ids.contains(1L) ^ ids.contains(2L)) && !ids.contains(4L),
        s"one copy per content + cross-batch suppression: $ids")
    } finally q.stop()
  }

  test("tokenRates aggregates per closed (window, source) with exact sums") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Doc]
    val q = StreamingCuration.tokenRates(in.toDF(),
      windowLen = "10 minutes", watermark = "5 minutes")
      .writeStream.format("memory").queryName("srates")
      .outputMode("append").start()
    try {
      in.addData(
        doc(1, 0, "a", "one two three"),   // window [0, 10): 3 tokens
        doc(2, 4, "a", "four five"),       // same window: +2
        doc(3, 5, "b", "x"))               // same window, other source
      q.processAllAvailable()
      // advance the watermark far enough to close the first window
      in.addData(doc(9, 30, "a", "later"))
      q.processAllAvailable()
      val rows = spark.table("srates")
        .select(col("source"), col("n_docs"), col("n_tokens"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(rows == Set(("a", 2L, 5L), ("b", 1L, 1L)), rows.toString)
    } finally q.stop()
  }

  test("streamingVocabDrift: exact per-window novel rates against a static reference") {
    implicit val sqlCtx = spark.sqlContext
    // reference corpus "a a b c": a 500000, b 250000, c 250000 ppm
    val ref = TextAnalysis.unigramPpm(
      Seq((0L, "a a b c")).toDF("doc_id", "text"))
    val in = MemoryStream[Doc]
    val q = StreamingCuration.streamingVocabDrift(in.toDF(), ref,
      windowLen = "10 minutes", watermark = "5 minutes")
      .writeStream.format("memory").queryName("svdrift")
      .outputMode("append").start()
    try {
      in.addData(
        doc(1, 0, "s", "a b"),     // window [0,10): 2 in-ref tokens
        doc(2, 4, "s", "a x"))     // +1 in-ref, +1 novel
      q.processAllAvailable()
      in.addData(doc(9, 30, "s", "later")) // close the first window
      q.processAllAvailable()
      val rows = spark.table("svdrift")
        .select(col("n_tokens"), col("n_novel"), col("novel_rate"),
          col("mean_ref_ppm"))
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      // 4 tokens: a,b,a,x → 1 novel, rate 0.25; ref mass = 500000 +
      // 250000 + 500000 + 0 = 1250000 → mean 312500
      assert(rows.toSeq == Seq((4L, 1L, 0.25, 312500L)), rows.toSeq.toString)
    } finally q.stop()
  }

  test("vocabDriftAutoDiff: alarm windows trigger the exact batch drift, quiet ones don't") {
    implicit val sqlCtx = spark.sqlContext
    val refDocs = Seq((0L, "a a b c")).toDF("doc_id", "text")
    val ref = TextAnalysis.unigramPpm(refDocs)
    // the landed-document archive the trigger reads the window back from
    val w0docs = Seq((1L, "a b"), (2L, "a x")).toDF("doc_id", "text")
    val w1docs = Seq((3L, "a b")).toDF("doc_id", "text")
    def archive(ws: java.sql.Timestamp): org.apache.spark.sql.DataFrame =
      if (ws.getTime == 0L) w0docs else w1docs
    val fired = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Map[String, Long])]
    val in = MemoryStream[Doc]
    val q = StreamingCuration.streamingVocabDrift(in.toDF(), ref,
      windowLen = "10 minutes", watermark = "5 minutes")
      .writeStream.outputMode("append")
      .foreachBatch(StreamingCuration.vocabDriftAutoDiff(
        archive, refDocs, novelRateAlarm = 0.2,
        (ws, shifts) => fired.synchronized {
          fired += ws.getTime -> shifts.select(col("term"), col("shift"))
            .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        }))
      .start()
    try {
      in.addData(
        doc(1, 0, "s", "a b"),      // window [0,10): novel_rate 0.25 -> alarm
        doc(2, 4, "s", "a x"))
      in.addData(doc(3, 12, "s", "a b")) // window [10,20): rate 0 -> quiet
      q.processAllAvailable()
      in.addData(doc(9, 40, "s", "later z")) // watermark closes both
      q.processAllAvailable()
      val got = fired.synchronized(fired.toList)
      assert(got.map(_._1) == List(0L),
        s"exactly the alarmed window must trigger: $got")
      // the triggered table IS the exact batch corpusDrift of the
      // archived window slice vs the reference corpus
      val want = TextAnalysis.corpusDrift(refDocs, archive(new java.sql.Timestamp(0L)))
        .select(col("term"), col("shift"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got.head._2 == want, s"${got.head._2} != $want")
      assert(want.contains("x"), "the novel term must appear in the shift table")
    } finally q.stop()
  }

  test("streamingLmScore: stream-static join against a pinned count snapshot") {
    implicit val sqlCtx = spark.sqlContext
    // the nightly snapshot: corpus "a b", "a b", "a c" → c(a)=3, c(b)=2,
    // c(c)=1; bigrams (a,b)=2, (a,c)=1 — same toy corpus as the batch
    // lmScore test, so scores must line up with it
    val uni = Seq(("a", 3L), ("b", 2L), ("c", 1L)).toDF("w1", "cu")
    val bg = Seq(("a", "b", 2L), ("a", "c", 1L)).toDF("w1", "w2", "cb")
    val in = MemoryStream[Doc]
    val q = StreamingCuration.streamingLmScore(in.toDF(), uni, bg,
      watermark = "10 minutes")
      .writeStream.format("memory").queryName("slm")
      .outputMode("append").start()
    try {
      in.addData(
        doc(1, 60, "s", "a b"),    // in-snapshot: (1000000*2) div 3
        doc(2, 61, "s", "a c x"),  // (a,c) scores, (c,x) unseen → 0
        doc(3, 62, "s", "x y"))    // fully out-of-snapshot → 0
      q.processAllAvailable()
      in.addData(doc(9, 120, "s", "a b")) // push the watermark
      q.processAllAvailable()
      val rows = spark.table("slm")
        .select(col("doc_id"), col("n_bigrams"), col("lm_score"),
          col("mean_score"))
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      assert(rows(1L) == ((1L, 666666L, 666666L)), rows.toString)
      assert(rows(2L) == ((2L, 333333L, 166666L)), rows.toString)
      assert(rows(3L) == ((1L, 0L, 0L)), rows.toString)
      // agreement with the batch operator over the snapshot corpus
      val batch = TextAnalysis.lmScore(Seq((100L, "a b"), (101L, "a b"),
        (102L, "a c")).toDF("doc_id", "text"))
        .filter(col("doc_id") === 100L).collect()(0)
      assert((batch.getLong(1), batch.getLong(2), batch.getLong(3)) ==
        ((1L, 666666L, 666666L)), "stream score == batch score for in-snapshot text")
    } finally q.stop()
  }

  test("streamingImportance: stream score == batch importanceScore for in-snapshot text") {
    implicit val sqlCtx = spark.sqlContext
    // snapshot corpus {a b, a b, a c}; target domain {a b}
    val uni = Seq(("a", 3L), ("b", 2L), ("c", 1L)).toDF("w1", "cu")
    val bg = Seq(("a", "b", 2L), ("a", "c", 1L)).toDF("w1", "w2", "cb")
    val tUni = Seq(("a", 1L), ("b", 1L)).toDF("w1", "cu_t")
    val tBg = Seq(("a", "b", 1L)).toDF("w1", "w2", "cb_t")
    val in = MemoryStream[Doc]
    val q = StreamingCuration.streamingImportance(in.toDF(), uni, bg,
      tUni, tBg, watermark = "10 minutes")
      .writeStream.format("memory").queryName("simp")
      .outputMode("append").start()
    try {
      in.addData(
        doc(1, 60, "s", "a b"),  // target-favored: tgt 1e6, raw 666666
        doc(2, 61, "s", "a c"),  // raw-only: tgt 0, raw 333333
        doc(3, 62, "s", "x y"))  // out of both snapshots → 0 - 0
      q.processAllAvailable()
      in.addData(doc(9, 120, "s", "a b")) // push the watermark
      q.processAllAvailable()
      val rows = spark.table("simp")
        .select(col("doc_id"), col("raw_ppm"), col("target_ppm"),
          col("importance"))
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      assert(rows(1L) == ((666666L, 1000000L, 333334L)), rows.toString)
      assert(rows(2L) == ((333333L, 0L, -333333L)), rows.toString)
      assert(rows(3L) == ((0L, 0L, 0L)), rows.toString)
      // agreement with the batch operator: same corpus, same target
      val corpus = Seq((100L, "a b"), (101L, "a b"), (102L, "a c"))
        .toDF("doc_id", "text")
      val target = Seq((200L, "a b")).toDF("doc_id", "text")
      val batch = TextAnalysis.importanceScore(corpus, target)
        .filter(col("doc_id") === 100L).collect()(0)
      assert((batch.getLong(2), batch.getLong(3), batch.getLong(4)) ==
        ((666666L, 1000000L, 333334L)),
        "stream importance == batch importance for in-snapshot text")
    } finally q.stop()
  }

  test("streamingContamination flags benchmark 8-gram hits as docs arrive") {
    implicit val sqlCtx = spark.sqlContext
    val passage = (1 to 12).map(i => s"b$i").mkString(" ") // 12-token passage
    val benchmark = Seq((99L, passage)).toDF("doc_id", "text")
    val in = MemoryStream[Doc]
    val q = StreamingCuration.streamingContamination(in.toDF(), benchmark,
      watermark = "10 minutes")
      .writeStream.format("memory").queryName("scontam")
      .outputMode("append").start()
    try {
      in.addData(
        doc(1, 60, "s", s"leading words then $passage and trailing text"),
        doc(2, 61, "s", (100 to 140).map(i => s"c$i").mkString(" ")))
      q.processAllAvailable()
      in.addData(doc(9, 120, "s", "push the watermark forward now"))
      q.processAllAvailable()
      val rows = spark.table("scontam")
        .select(col("doc_id"), col("n_overlap"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // a 12-token passage inside doc 1 shares 5 distinct 8-grams
      assert(rows == Map(1L -> 5L), rows.toString)
      // agreement with the batch operator on the same inputs
      val batch = TextDedup.contamination(
        Seq((1L, s"leading words then $passage and trailing text"),
          (2L, (100 to 140).map(i => s"c$i").mkString(" ")))
          .toDF("doc_id", "text"), benchmark)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(batch == rows, "stream flags == batch flags")
    } finally q.stop()
  }

  private case class VDoc(vec_id: Long, event_ts: java.sql.Timestamp,
      embedding: Seq[Float])
  private def vdoc(id: Long, minute: Int, e: Seq[Float]) =
    VDoc(id, new java.sql.Timestamp(minute * 60000L), e)

  test("streaming embedding near-dup: cosine flags across batches, horizon evicts") {
    implicit val sqlCtx = spark.sqlContext
    val base = (0 until 64).map(i => (math.sin(i) * 0.3).toFloat)
    val sameDir = base.map(_ * 2f) // cos = 1, same sign signature
    val ortho = (0 until 64).map(i => (math.cos(i * 7 + 1) * 0.3).toFloat)
    val in = MemoryStream[VDoc]
    val q = StreamingCuration.streamingEmbNearDup(in.toDF(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("sembdup")
      .outputMode("append").start()
    def hits(): Set[(Long, Long)] =
      spark.table("sembdup").select(col("ida"), col("idb"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    try {
      in.addData(vdoc(1, 60, base), vdoc(3, 61, ortho))
      q.processAllAvailable()
      assert(hits().isEmpty, "no semantic dups yet")
      in.addData(vdoc(2, 62, sameDir)) // flagged against batch 1's state
      q.processAllAvailable()
      assert(hits() == Set((1L, 2L)), hits().toString)
      val cosOut = spark.table("sembdup").select(col("cos"))
        .collect().map(_.getDouble(0))
      assert(cosOut.forall(c => c > 0.999 && c <= 1.0000001), cosOut.toSeq)
      // push the watermark far past the horizon; a late same-direction
      // copy is NOT flagged against the evicted members
      in.addData(vdoc(8, 120, ortho.map(_ * 3f)))
      q.processAllAvailable()
      in.addData(vdoc(9, 121, base))
      q.processAllAvailable()
      assert(hits() == Set((1L, 2L)),
        s"evicted state must not flag the late duplicate: ${hits()}")
    } finally q.stop()
  }

  test("streamingHistNearDup: stream-static flags against precomputed history sigs") {
    implicit val sqlCtx = spark.sqlContext
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val variant = (1 to 40).map(i => if (i == 20) "CHANGED" else s"w$i").mkString(" ")
    val histDf = Seq((1L, base),
      (2L, (100 to 130).map(i => s"h$i").mkString(" "))).toDF("doc_id", "text")
    // history hashed ONCE, batch-side — the stream only reads the sigs
    val histSigs = TextDedup.minhashSignatures(histDf)
    val in = MemoryStream[Doc]
    val q = StreamingCuration.streamingHistNearDup(in.toDF(), histSigs,
      watermark = "10 minutes")
      .writeStream.format("memory").queryName("shistdup")
      .outputMode("append").start()
    try {
      in.addData(
        doc(10, 60, "s", variant),  // near-dup of history 1
        doc(11, 61, "s", (200 to 240).map(i => s"z$i").mkString(" "))) // novel
      q.processAllAvailable()
      in.addData(doc(99, 120, "s", "push the watermark forward"))
      q.processAllAvailable()
      val rows = spark.table("shistdup")
        .select(col("doc_id"), col("matched_history_id"), col("est_jaccard"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(rows.length == 1 && rows(0)._1 == 10L && rows(0)._2 == 1L &&
        rows(0)._3 >= 0.5, rows.toSeq.toString)
      // the batch pass over the same sigs flags the same (doc, match)
      val batch = TextDedup.nearDupAgainstHistorySigs(
        Seq((10L, variant), (11L, (200 to 240).map(i => s"z$i").mkString(" ")))
          .toDF("doc_id", "text"), histSigs)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(batch.toSeq == Seq((10L, 1L)),
        s"stream flag must match the batch verdict: ${batch.toSeq}")
    } finally q.stop()
    // the pre-banded static path (what a long-lived feed persists /
    // buckets) produces the identical flag
    val in2 = MemoryStream[Doc]
    val q2 = StreamingCuration.streamingHistNearDupBanded(in2.toDF(),
      StreamingCuration.bandHistorySigs(histSigs), watermark = "10 minutes")
      .writeStream.format("memory").queryName("shistdup2")
      .outputMode("append").start()
    try {
      in2.addData(doc(10, 60, "s", variant))
      q2.processAllAvailable()
      in2.addData(doc(99, 120, "s", "push the watermark forward"))
      q2.processAllAvailable()
      val rows2 = spark.table("shistdup2")
        .select(col("doc_id"), col("matched_history_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(rows2.toSeq == Seq((10L, 1L)), rows2.toSeq.toString)
    } finally q2.stop()
  }

  test("streamingHistNearDup RAISES on a numPerm-mismatched history sig table") {
    implicit val sqlCtx = spark.sqlContext
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    // history signed with 32 permutations, stream configured for 64:
    // zip_with would null-pad and silently underestimate agreement —
    // the guard must fail the query instead
    val histSigs32 = TextDedup.minhashSignatures(
      Seq((1L, base)).toDF("doc_id", "text"), numPerm = 32)
    val in = MemoryStream[Doc]
    val q = StreamingCuration.streamingHistNearDup(in.toDF(), histSigs32,
      numPerm = 64, watermark = "10 minutes")
      .writeStream.format("memory").queryName("shistbad")
      .outputMode("append").start()
    try {
      val err = intercept[Exception] {
        in.addData(doc(10, 60, "s", base))
        q.processAllAvailable()
      }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(e =>
          Option(e.getMessage).toSeq ++ messages(e.getCause))
      assert(messages(err).exists(_.contains("numPerm")),
        s"expected the signature-width guard, got: ${messages(err)}")
    } finally q.stop()
  }

  test("streamingCurateDedup: gate then dedup on the NORMALIZED identity") {
    implicit val sqlCtx = spark.sqlContext
    val body = "the quick brown fox jumps over that lazy dog again today friend"
    val in = MemoryStream[Doc]
    val q = StreamingCuration.streamingCurateDedup(in.toDF(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("scuratededup")
      .outputMode("append").start()
    try {
      in.addData(
        doc(1, 60, "a", body),
        doc(2, 61, "b", body.replace(" ", "  ")), // same modulo whitespace → dup
        doc(3, 62, "a", "hi"))             // gate-dropped, never reaches dedup
      q.processAllAvailable()
      in.addData(doc(4, 63, "c", body + "  ")) // whitespace variant → dup
      q.processAllAvailable()
      val ids = spark.table("scuratededup").select(col("doc_id"))
        .collect().map(_.getLong(0)).toSet
      // exactly one survivor of the {1,2} pair; 4 suppressed cross-batch
      assert(ids.size == 1 && ids.subsetOf(Set(1L, 2L)), ids.toString)
    } finally q.stop()
  }

  test("streamingCurate gates on NORMALIZED text: verdicts match the batch gate") {
    implicit val sqlCtx = spark.sqlContext
    // docs 5 and 6 are built to DIVERGE under raw-text gating: 5's
    // capitalized stopwords fail the lowercase stopword rule raw, and
    // 6's repeated whitespace inflates the token count with empties --
    // both gate correctly once normalize runs first, which is the
    // batch Pipeline.curate order (the r5 ADVICE divergence)
    val docs = Seq(
      doc(1, 0, "a",
        "the quick brown fox jumps over that lazy dog again today friend"),
      doc(2, 1, "a", "the spam ham spam ham spam ham spam ham spam ham a"),
      doc(3, 2, "b", "Contact me\u0001at  bob@example.com or 1234567 the a " +
        "and some more words here to pass the minimum length rule today"),
      doc(4, 3, "b", "hi"),
      doc(5, 4, "c",
        "The Quick Brown Fox Jumps Over That Lazy Dog Again Today Friend"),
      doc(6, 5, "c", "the  quick  brown  fox  jumps  over  that  lazy  " +
        "dog  again  today  friend"))
    val in = MemoryStream[Doc]
    val q = StreamingCuration.streamingCurate(in.toDF())
      .writeStream.format("memory").queryName("scurate")
      .outputMode("append").start()
    try {
      in.addData(docs: _*)
      q.processAllAvailable()
      val streamed = spark.table("scurate")
        .select(col("doc_id"), col("cleaned"), col("keep"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).toSet
      // the batch reference, in the batch order: normalize FIRST, then
      // the corpus-independent half of qualityGate (rules + repetition;
      // the LM floor is batch-only by design)
      val cleanedBatch = docs.map(d => (d.doc_id, d.text)).toDF("doc_id", "text")
        .withColumn("text", Curation.normalize(col("text")))
      val batchKeeps = TextAnalysis.qualityGate(cleanedBatch)
        .select(col("doc_id"), (col("keep_rules") && col("keep_rep")).as("keep"))
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      val streamKeeps = streamed.map(t => (t._1, t._3)).toMap
      assert(streamKeeps == batchKeeps,
        s"stream verdicts must match the batch normalize-then-gate order: " +
          s"stream=$streamKeeps batch=$batchKeeps")
      assert(streamKeeps == Map(1L -> true, 2L -> false, 3L -> true,
        4L -> false, 5L -> true, 6L -> true), streamKeeps.toString)
      val cleaned3 = streamed.find(_._1 == 3L).get._2
      assert(cleaned3.contains("<EMAIL>") && cleaned3.contains("<NUM>") &&
        !cleaned3.contains("bob@") && !cleaned3.contains("  "), cleaned3)
    } finally q.stop()
  }

  test("streamingIvfPqServe: stream top-k == batch stored-code serving") {
    implicit val sqlCtx = spark.sqlContext
    val m = 4; val dim = 64
    // trained index over the real corpus, frozen (localCheckpoint) so
    // both engines read identical centroids/codebooks/codes
    val vecs = graft.Tables.load(spark, sf0001, "embeddings")
    val (coarse0, books0) = Similarity.ivfPqTrain(vecs, coarseStride = 100,
      m, dim, bookStride = 50, iters = 2)
    val coarse = coarse0.localCheckpoint(true)
    val books = books0.localCheckpoint(true)
    val stored = Similarity.ivfPqEncode(vecs, coarse, books, m, dim)
      .localCheckpoint(true)
    val queries = vecs.filter(col("vec_id") < 3)
    val batch = Similarity.ivfPqTopKFromCodes(stored, queries, k = 5,
      coarse, books, m, dim, probes = 2)
      .collect().map(_.toSeq).toSet
    val qembs = queries.select(col("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val in = MemoryStream[VDoc]
    val q = Similarity.streamingIvfPqServe(in.toDF(), stored, coarse, books,
      m, dim, k = 5, probes = 2, windowDur = "1 minute",
      watermark = "10 minutes")
      .writeStream.format("memory").queryName("sivfpq")
      .outputMode("append").start()
    try {
      in.addData(qembs.map { case (id, e) => vdoc(id, 60, e) }.toSeq: _*)
      q.processAllAvailable()
      // push the watermark past the window so append emits it
      in.addData(vdoc(999, 200, qembs.head._2))
      q.processAllAvailable()
      val streamed = spark.table("sivfpq")
        .filter(col("q_id") < 3)
        .select(col("q_id"), col("rank"), col("neighbor_id"), col("adist"))
        .collect().map(_.toSeq).toSet
      assert(streamed == batch,
        s"stream=$streamed\nbatch=$batch")
    } finally q.stop()
  }

  test("streaming filtered ANN: a label predicate on the attribute-" +
    "embedded code table serves identically on the stream") {
    implicit val sqlCtx = spark.sqlContext
    val m = 4; val dim = 64
    val vecs = graft.Tables.load(spark, sf0001, "embeddings")
    val (coarse0, books0) = Similarity.ivfPqTrain(vecs, coarseStride = 100,
      m, dim, bookStride = 50, iters = 2)
    val coarse = coarse0.localCheckpoint(true)
    val books = books0.localCheckpoint(true)
    // the attribute-embedded stored table (q_llm_ann_filtered's
    // layout); the predicate restricts the stream-static join's
    // static side — no new operator, the same stored state
    val filtered = Similarity.ivfPqEncode(vecs, coarse, books, m, dim,
      attrs = Seq("label")).localCheckpoint(true)
      .filter(col("label") === 1)
    val queries = vecs.filter(col("vec_id") < 3)
    val batch = Similarity.ivfPqTopKFromCodes(filtered, queries, k = 5,
      coarse, books, m, dim, probes = 2).collect().map(_.toSeq).toSet
    val qembs = queries.select(col("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val in = MemoryStream[VDoc]
    val q = Similarity.streamingIvfPqServe(in.toDF(), filtered, coarse,
      books, m, dim, k = 5, probes = 2, windowDur = "1 minute",
      watermark = "10 minutes")
      .writeStream.format("memory").queryName("sivfpqf")
      .outputMode("append").start()
    try {
      in.addData(qembs.map { case (id, e) => vdoc(id, 60, e) }.toSeq: _*)
      q.processAllAvailable()
      in.addData(vdoc(999, 200, qembs.head._2))
      q.processAllAvailable()
      val streamed = spark.table("sivfpqf").filter(col("q_id") < 3)
        .select(col("q_id"), col("rank"), col("neighbor_id"), col("adist"))
        .collect().map(_.toSeq).toSet
      assert(streamed.nonEmpty && streamed == batch,
        s"stream=$streamed\nbatch=$batch")
    } finally q.stop()
  }

  private case class EDoc(doc_id: Long, event_ts: java.sql.Timestamp,
      text: String, embedding: Seq[Float])

  test("streamingClusterMix admits exactly the batch pass's rows under the same snapshot") {
    implicit val sqlCtx = spark.sqlContext
    graft.functions.GraftFunctions.register(spark)
    // two well-separated clusters, enough docs that both admit and
    // drop verdicts occur in the bigger one
    val e0 = (0 until 8).map(i => (if (i == 0) 1.0f else 0.05f * i))
    val e1 = (0 until 8).map(i => (if (i == 1) 1.0f else -0.04f * i))
    val rows = (1L to 9L).map(i =>
      (i, s"stream doc body $i", e0.map(_ + 0.001f * i))) ++
      (10L to 12L).map(i => (i, s"stream doc body $i", e1.map(_ + 0.001f * i)))
    val docs = rows.toDF("doc_id", "text", "embedding")
    val vecs = rows.map(r => (r._1, r._3)).toDF("vec_id", "embedding")
    val coarse = Seq((0L, e0), (1L, e1)).toDF("c_id", "embedding")
      .select(col("c_id"), Similarity.quantize(col("embedding")).as("c_q"))
    val batch = Curation.clusterTemperatureMix(docs, vecs, coarse)
      .select(col("doc_id"), col("cluster_id"), col("rate_ppm")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(batch.nonEmpty && batch.size < rows.size,
      s"need both admits and drops for a meaningful pin: $batch")
    // the nightly snapshot the stream reads: cluster thresholds
    val rated = batch.map(t => (t._2, t._3)).toSeq.toDF("cluster_id", "rate_ppm")
    val in = MemoryStream[EDoc]
    val q = StreamingCuration.streamingClusterMix(in.toDF(), coarse, rated,
      watermark = "10 minutes")
      .writeStream.format("memory").queryName("sclustermix")
      .outputMode("append").start()
    try {
      in.addData(rows.map(r =>
        EDoc(r._1, new java.sql.Timestamp((60 + r._1) * 60000L), r._2, r._3)))
      q.processAllAvailable()
      val streamed = spark.table("sclustermix")
        .select(col("doc_id"), col("cluster_id"), col("rate_ppm")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed == batch, s"stream $streamed != batch $batch")
    } finally q.stop()
  }

  test("streamingDecontamScrub cuts benchmark spans on ingest, byte-equal to batch") {
    implicit val sqlCtx = spark.sqlContext
    val passage = (1 to 8).map(i => s"e$i").mkString(" ")
    val benchmark = Seq((99L, passage)).toDF("doc_id", "text")
    val rows = Seq(
      (1L, s"clean head $passage clean tail words"),
      (2L, "nothing leaked in this one at all"))
    val in = MemoryStream[Doc]
    val q = StreamingCuration.streamingDecontamScrub(in.toDF(), benchmark)
      .writeStream.format("memory").queryName("sdscrub")
      .outputMode("append").start()
    try {
      in.addData(rows.map { case (id, t) => doc(id, 60, "s", t) })
      q.processAllAvailable()
      val streamed = spark.table("sdscrub")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toSet
      val batch = TextDedup.decontamScrub(rows.toDF("doc_id", "text"), benchmark)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toSet
      assert(streamed == batch, s"stream $streamed != batch $batch")
      assert(streamed.exists(t => t._1 == 1L && t._3 == 8L &&
        t._2 == "clean head clean tail words"), streamed.toString)
    } finally q.stop()
  }

  test("streaming embedding decontamination flags only τ-clearing arrivals, matching batch") {
    implicit val sqlCtx = spark.sqlContext
    val b0 = (0 until 64).map(i => (math.sin(i) * 0.3).toFloat)
    val b1 = (0 until 64).map(i => (math.cos(i * 3 + 1) * 0.3).toFloat)
    val far = (0 until 64).map(i => (math.cos(i * 7 + 2) * 0.3).toFloat)
    val benchmark = Seq((100L, b0), (200L, b1)).toDF("vec_id", "embedding")
    val in = MemoryStream[VDoc]
    val q = StreamingCuration.streamingEmbDecontam(in.toDF(), benchmark,
      tau = 0.95, watermark = "10 minutes")
      .writeStream.format("memory").queryName("sembdecon")
      .outputMode("append").start()
    try {
      in.addData(
        vdoc(1, 60, b0.map(_ * 2f)), // same direction as bench 100 -> cos 1
        vdoc(2, 60, far),            // unrelated -> below τ, never emitted
        vdoc(3, 61, b1))             // exact copy of bench 200
      q.processAllAvailable()
      in.addData(vdoc(9, 120, far)) // push the watermark past the window
      q.processAllAvailable()
      val rows = spark.table("sembdecon")
        .select(col("vec_id"), col("bench_id")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(rows == Map(1L -> 100L, 3L -> 200L), rows.toString)
      // a streamed flag is exactly a contaminated=1 row of the batch op:
      // same vectors through embContamination (no planting; bench ids
      // are disjoint from arrival ids so the != guard never bites)
      val batchAll = Similarity.embContamination(
        Seq((1L, b0.map(_ * 2f)), (2L, far), (3L, b1), (9L, far),
          (100L, b0), (200L, b1)).toDF("vec_id", "embedding")
          .withColumn("nrm", Similarity.norm(col("embedding"))),
        benchStride = 100, tau = 0.95, plantOffset = 1000000L)
        .filter(col("contaminated") === 1 && col("vec_id") < 100)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(batchAll == rows, s"stream $rows != batch $batchAll")
    } finally q.stop()
  }

  test("streaming heavy hitters: bounded-state sketch converges to the batch " +
    "top-k over a replayed feed") {
    implicit val sqlCtx = spark.sqlContext
    // a feed where "the quick fox" dominates and tail grams vary
    def txt(i: Int) = s"the quick fox jumps over lazy dog $i end"
    val rows = (1 to 30).map(i => doc(i.toLong, 60 + i, "a", txt(i)))
    val in = MemoryStream[Doc]
    val q = StreamingCuration.streamingHeavyHitters(in.toDF(), n = 3,
      capacity = 1024, k = 5)
      .writeStream.format("memory").queryName("shh")
      .outputMode("complete").start()
    try {
      // two micro-batches: the sketch state must carry across triggers
      in.addData(rows.take(15): _*)
      q.processAllAvailable()
      in.addData(rows.drop(15): _*)
      q.processAllAvailable()
      val got = spark.table("shh")
        .select(col("gram"), col("cnt"), col("max_err"))
        .as[(String, Long, Long)].collect().toSeq
        .sortBy { case (g, c, _) => (-c, g) }
      val batch = TextAnalysis.heavyHitterNgrams(
        rows.map(_.text).toDF("text"), n = 3, capacity = 1024, k = 5)
        .as[(String, Long, Long)].collect().toSeq
      assert(got == batch, s"stream $got != batch $batch")
      assert(got.forall(_._3 == 0L), "exact regime on the frozen feed")
      // all five stable grams appear in every row -> count 30 each
      assert(got.map(t => (t._1, t._2)).contains(("the quick fox", 30L)))
    } finally q.stop()
  }

  test("streaming heavy hitters: the sketch summary survives a checkpointed " +
    "restart (serialize/deserialize through the state store)") {
    import java.nio.file.Files
    val feedDir = Files.createTempDirectory("shh_feed").toString
    val ckpt = Files.createTempDirectory("shh_ckpt").toString
    def txt(i: Int) = s"alpha beta gamma delta run $i tail"
    val schema = Seq("x").toDF("text").schema
    def drain(name: String): Unit = {
      val q = StreamingCuration.streamingHeavyHitters(
        spark.readStream.schema(schema).parquet(feedDir),
        n = 3, capacity = 1024, k = 4)
        .writeStream.format("memory").queryName(name)
        .option("checkpointLocation", ckpt)
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // wave 1, then a FRESH query from the same checkpoint for wave 2:
    // the final counts cover BOTH waves only if the Misra-Gries buffer
    // round-tripped the state store across the restart
    (1 to 10).map(txt).toDF("text").coalesce(1)
      .write.mode("append").parquet(feedDir)
    drain("shh_r1")
    (11 to 25).map(txt).toDF("text").coalesce(1)
      .write.mode("append").parquet(feedDir)
    drain("shh_r2")
    val got = spark.table("shh_r2")
      .select(col("gram"), col("cnt"), col("max_err"))
      .as[(String, Long, Long)].collect().toSeq
      .sortBy { case (g, c, _) => (-c, g) }
    val batch = TextAnalysis.heavyHitterNgrams(
      (1 to 25).map(txt).toDF("text"), n = 3, capacity = 1024, k = 4)
      .as[(String, Long, Long)].collect().toSeq
    assert(got == batch, s"post-restart $got != batch $batch")
    assert(got.map(t => (t._1, t._2)).contains(("alpha beta gamma", 25L)))
  }

  test("windowed heavy hitters emit per closed window and equal the batch " +
    "sketch over that window's rows") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Doc]
    val q = StreamingCuration.streamingHeavyHittersWindowed(in.toDF(),
      windowLen = "10 minutes", watermark = "10 minutes",
      n = 2, capacity = 1024, k = 3)
      .writeStream.format("memory").queryName("shhw")
      .outputMode("append").start()
    try {
      // window [60,70): "red fox" dominates; window [70,80): "blue owl"
      in.addData((1 to 6).map(i => doc(i.toLong, 60 + i % 4, "a", "red fox runs")): _*)
      in.addData((10 to 13).map(i => doc(i.toLong, 71 + i % 5, "a", "blue owl sits")): _*)
      q.processAllAvailable()
      assert(spark.table("shhw").count() == 0L, "no window closed yet")
      // advance the watermark far past both windows
      in.addData(doc(99, 200, "a", "z z z"))
      q.processAllAvailable()
      val rows = spark.table("shhw")
        .select(col("window_start").cast("long"), col("gram"), col("cnt"))
        .as[(Long, String, Long)].collect().toSeq.sorted
      val w0 = rows.filter(_._1 == 3600L).map(t => (t._2, t._3))
      val w1 = rows.filter(_._1 == 4200L).map(t => (t._2, t._3))
      assert(w0.contains(("red fox", 6L)) && !w0.exists(_._1 == "blue owl"), w0)
      assert(w1.contains(("blue owl", 4L)) && !w1.exists(_._1 == "red fox"), w1)
      // each closed window equals the batch sketch over its own rows
      val batch0 = TextAnalysis.heavyHitterNgrams(
        Seq.fill(6)("red fox runs").toDF("text"), n = 2, capacity = 1024, k = 3)
        .as[(String, Long, Long)].collect().map(t => (t._1, t._2)).toSeq
      assert(w0.sortBy(t => (-t._2, t._1)) == batch0, s"$w0 vs $batch0")
    } finally q.stop()
  }
}

package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The curation core under Structured Streaming: a continuous document
  * feed (crawl output, upload queue) deduped and accounted as it
  * arrives, instead of in nightly batches. Same operators as the batch
  * path — content-hash identity, token counting — lifted onto streams
  * with watermarked state so a 24/7 pipeline's dedup memory is bounded
  * by the lateness horizon, not the corpus.
  *
  * Scale shape: the dedup state key is the 32-byte content digest
  * (never the text); state lives `watermark` long and is dropped by
  * the engine afterwards — the same bounded-state discipline the CT
  * ingest's E2 TTL applies, here with arrival-time bounds because
  * documents (unlike certificates) carry no domain expiry.
  */
object StreamingCuration {

  /** Content identity for state: the batch exact-dedup digest
    * (TextDedup.contentHashHex — one shared definition) in its binary
    * form, so each state-store key really is 32 bytes, not 64 hex
    * chars. */
  def contentHash(text: Column): Column = unhex(TextDedup.contentHashHex(text))

  /** Streaming exact dedup: emit each distinct content hash's FIRST
    * document, suppress duplicates arriving within the watermark
    * horizon. `dropDuplicatesWithinWatermark` keeps state only
    * `watermark` long — a duplicate arriving later than the horizon is
    * re-emitted (at-least-once dedup, the "gentle collision" stance);
    * the batch keep-list / compaction restores exactness downstream. */
  def streamingExactDedup(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("text_hash", contentHash(col("text")))
      .withWatermark("event_ts", watermark)
      .dropDuplicatesWithinWatermark("text_hash")

  /** Carries the WATERMARKED event_ts column through to the stateful
    * operator — EventTimeTimeout requires the tagged attribute to
    * survive into the FlatMapGroupsWithState child, so the banded rows
    * stay relational (`.as[]`, no typed map) until groupByKey. */
  case class BandedDoc(band_key: String, doc_id: Long, sig: Seq[Long],
      event_ts: java.sql.Timestamp)
  case class NearDupHit(ida: Long, idb: Long, est_jaccard: Double)
  /** Bucket state: (doc_id, signature, event-time ms) per member — the
    * timestamp lets a HOT bucket prune members the horizon has passed,
    * not just time out whole-bucket when traffic stops. */
  case class BandMembers(members: List[(Long, Seq[Long], Long)], maxTsMs: Long)

  /** Streaming MinHash near-dup detection: the batch LSH banding
    * (TextDedup.minhashPairs) lifted onto a continuous feed. Each
    * document's signature lands in its 16 band buckets; a bucket's
    * members live in keyed state, so a near-dup is flagged THE MOMENT
    * it arrives — against documents from any earlier micro-batch still
    * inside the horizon — rather than in a nightly batch join.
    *
    * Scale shape: state is keyed on band keys (hash-uniform by
    * construction) and holds at most `maxBucket` (doc_id, signature)
    * pairs per bucket — signatures, never text or shingles, so a
    * bucket entry is numPerm·8 bytes. EventTimeTimeout drops buckets
    * `watermark` past their last member, so a 24/7 feed's state is
    * bounded by the lateness horizon × arrival rate, not corpus size.
    *
    * Flag semantics: a pair sharing several bands is emitted once per
    * sharing band (at-least-once, the same "gentle collision" stance
    * as the ingest path — flags are idempotent to act on); similarity
    * is the signature-agreement estimate, the quantity LSH actually
    * banded on. Pairs are normalized (ida < idb). Docs past the
    * horizon are forgotten — a duplicate of an evicted document is
    * re-admitted, exactly like [[streamingExactDedup]], and the batch
    * keep-list restores global exactness downstream. */
  /** The watermark string as a fixed horizon in ms. Month-bearing
    * intervals have no fixed ms length, so the horizon would silently
    * read as 0 — reject them up front (Spark's own watermark-delay
    * restriction). */
  private[graft] def horizonMsOf(watermark: String): Long = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(watermark))
    require(iv.months == 0,
      s"watermark '$watermark' must not use month units; express the " +
      "horizon in days or smaller")
    iv.days * 86400000L + iv.microseconds / 1000L
  }

  def streamingNearDup(docs: DataFrame, numPerm: Int = 64, bands: Int = 16,
      threshold: Double = 0.5, maxBucket: Int = 100,
      watermark: String = "1 hour"): Dataset[NearDupHit] = {
    val spark = docs.sparkSession
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val horizonMs = horizonMsOf(watermark)
    val rows = numPerm / bands
    val banded = docs
      .withWatermark("event_ts", watermark)
      .withColumn("sig", call_udf("graft_minhash_sig",
        call_udf("graft_shingle_hashes", col("text"), lit(3), lit(true)),
        lit(numPerm)))
      .select(explode(TextDedup.lshBands(col("sig"), bands, rows)).as("band_key"),
        col("doc_id"), col("sig"), col("event_ts"))
      .as[BandedDoc]

    def estJaccard(a: Seq[Long], b: Seq[Long]): Double =
      a.iterator.zip(b.iterator).count { case (x, y) => x == y }.toDouble / a.size

    banded
      .groupByKey(_.band_key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (_: String, it: Iterator[BandedDoc], state: GroupState[BandMembers]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val prev = state.getOption.getOrElse(BandMembers(Nil, 0L))
            var members = prev.members
            var maxTs = prev.maxTsMs
            val hits = List.newBuilder[NearDupHit]
            // doc_id order makes within-batch pairing deterministic
            it.toSeq.sortBy(_.doc_id).foreach { d =>
              maxTs = math.max(maxTs, d.event_ts.getTime)
              // Prune members the horizon has passed BEFORE pairing: a
              // continuously-hot bucket never hits the whole-bucket
              // timeout, so without this its first maxBucket members
              // would pin state (and keep flagging) forever.
              members = members.filter(_._3 >= maxTs - horizonMs)
              members.foreach { case (mid, msig, _) =>
                if (mid != d.doc_id) {
                  val est = estJaccard(d.sig, msig)
                  if (est >= threshold)
                    hits += NearDupHit(math.min(mid, d.doc_id),
                      math.max(mid, d.doc_id), est)
                }
              }
              if (members.size < maxBucket &&
                  !members.exists(_._1 == d.doc_id))
                members = (d.doc_id, d.sig, d.event_ts.getTime) :: members
            }
            state.update(BandMembers(members, maxTs))
            state.setTimeoutTimestamp(maxTs + horizonMs)
            hits.result().iterator
          }
        })
  }

  case class EmbDoc(sig: Long, vec_id: Long, embedding: Seq[Float],
      nrm: Double, event_ts: java.sql.Timestamp)
  case class EmbHit(ida: Long, idb: Long, cos: Double)
  case class EmbMembers(members: List[(Long, Seq[Float], Double, Long)],
      maxTsMs: Long)

  /** Streaming semantic near-dup over an embedding feed — the
    * streaming cell of the similarity matrix, mirroring
    * [[streamingNearDup]]'s state discipline with sign-LSH buckets:
    * each vector lands in its signature bucket, pairs against the
    * in-horizon members, and flags when exact cosine ≥ `tau` (the
    * batch SemDeDup edge condition, so a flagged stream pair is
    * exactly an edge the nightly SemDeDup pass would draw).
    *
    * Scale shape: state keys are 8-bit signatures (bounded bucket
    * family); a member is vec_id + the embedding (dim·4 B) + norm —
    * buckets cap at `maxBucket` members and prune to the lateness
    * horizon on every update, so 24/7 state is horizon-bounded. Flags
    * are at-least-once; the batch semDedupKeepList restores global
    * exactness downstream. */
  def streamingEmbNearDup(vecs: DataFrame, bits: Int = 8, dim: Int = 64,
      tau: Double = 0.3, maxBucket: Int = 1000,
      watermark: String = "1 hour"): Dataset[EmbHit] = {
    val spark = vecs.sparkSession
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val horizonMs = horizonMsOf(watermark)
    val banded = vecs
      .withWatermark("event_ts", watermark)
      .withColumn("nrm", Similarity.norm(col("embedding")))
      .withColumn("sig", call_udf("graft_signlsh",
        col("embedding"), lit(bits), lit(dim), lit(42L)))
      .select(col("sig"), col("vec_id"), col("embedding"), col("nrm"),
        col("event_ts"))
      .as[EmbDoc]
    // the kernels' IEEE order: float products, left-fold double sum
    def cos(a: Seq[Float], b: Seq[Float], na: Double, nb: Double): Double =
      a.iterator.zip(b.iterator).foldLeft(0.0)((s, p) => s + p._1 * p._2) /
        (na * nb)
    banded
      .groupByKey(_.sig)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (_: Long, it: Iterator[EmbDoc], state: GroupState[EmbMembers]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val prev = state.getOption.getOrElse(EmbMembers(Nil, 0L))
            var members = prev.members
            var maxTs = prev.maxTsMs
            val hits = List.newBuilder[EmbHit]
            it.toSeq.sortBy(_.vec_id).foreach { d =>
              maxTs = math.max(maxTs, d.event_ts.getTime)
              members = members.filter(_._4 >= maxTs - horizonMs)
              members.foreach { case (mid, memb, mnrm, _) =>
                if (mid != d.vec_id) {
                  val c = cos(d.embedding, memb, d.nrm, mnrm)
                  if (c >= tau)
                    hits += EmbHit(math.min(mid, d.vec_id),
                      math.max(mid, d.vec_id), c)
                }
              }
              if (members.size < maxBucket &&
                  !members.exists(_._1 == d.vec_id))
                members = (d.vec_id, d.embedding, d.nrm,
                  d.event_ts.getTime) :: members
            }
            state.update(EmbMembers(members, maxTs))
            state.setTimeoutTimestamp(maxTs + horizonMs)
            hits.result().iterator
          }
        })
  }

  /** The per-row curation stack lifted onto the feed: normalization +
    * PII redaction of the text, and the corpus-independent quality
    * vetoes (the Gopher rule set and the repetition-kernel ceiling).
    * NORMALIZE-THEN-GATE, in exactly the batch Pipeline.curate order:
    * the rules and the repetition kernel are evaluated over the
    * NORMALIZED text — on raw text, a capitalized stopword ('The')
    * fails the lowercase stopword rule and repeated whitespace breaks
    * the word-length band via empty tokens, so a raw-text verdict
    * silently drops documents the nightly batch pass keeps. The same
    * column expressions as batch `qualityRules`/`qualityGate` over the
    * same (normalized) input, so stream and batch verdicts agree —
    * StreamingCurationSpec pins the agreement on a corpus built to
    * diverge under raw-text gating.
    * STATELESS: no watermark, no shuffle — each micro-batch is one
    * codegen'd projection, which is exactly why this subset of the
    * gate belongs on the hot path while the corpus-dependent LM floor
    * stays a batch pass. */
  def streamingCurate(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs
      // rebind `text` to its normalized form FIRST: ruleSet and the
      // repetition kernel read col("text"), so everything downstream
      // gates on what the batch pass gates on
      .withColumn("text", Curation.normalize(col("text")))
      .select(col("*") +: TextAnalysis.ruleSet: _*)
      .withColumn("r",
        call_udf("graft_top_shingle_run", col("text"), lit(3)))
      .select(col("doc_id"), col("source"), col("event_ts"),
        Curation.redact(col("text")).as("cleaned"),
        (col("rule_min_tokens") && col("rule_word_len") &&
          col("rule_punct") && col("rule_stopwords") &&
          col("r.top_count") * 5 <= col("r.n_tri")).as("keep"))
  }

  /** The streaming half of Pipeline.curate: per-row curation (gate
    * vetoes + normalize/redact into `cleaned`) followed by watermarked
    * exact dedup ON THE CLEANED TEXT — so trivially-different copies
    * collapse in-stream, the same normalize-before-hash identity the
    * batch pass uses. Near-dup flagging and decontamination stay in
    * [[streamingNearDup]] / the nightly batch pass (the documented
    * split: corpus-dependent signals are batch-side). */
  def streamingCurateDedup(docs: DataFrame,
      watermark: String = "1 hour"): DataFrame =
    streamingCurate(docs)
      .filter(col("keep"))
      .withColumn("text_hash", contentHash(col("cleaned")))
      .withWatermark("event_ts", watermark)
      .dropDuplicatesWithinWatermark("text_hash")

  /** Watermarked (doc_id, event_ts, w1, w2) adjacent-pair explode of a
    * streaming docs frame — shared by the stream-static LM scorers. */
  private def streamPairsOf(docs: DataFrame, watermark: String): DataFrame = {
    val toksDf = docs
      .withWatermark("event_ts", watermark)
      .select(col("doc_id"), col("event_ts"),
        split(col("text"), " ").as("toks"))
    val toks = col("toks")
    toksDf.select(col("doc_id"), col("event_ts"),
      explode(when(size(toks) >= 2,
        transform(sequence(lit(0), size(toks) - 2),
          i => struct(element_at(toks, i + 1).as("w1"),
            element_at(toks, i + 2).as("w2"))))
        .otherwise(array().cast("array<struct<w1:string,w2:string>>")))
        .as("p"))
      .select(col("doc_id"), col("event_ts"),
        col("p.w1").as("w1"), col("p.w2").as("w2"))
  }

  /** The corpus-dependent LM fluency score on a STREAM, done the only
    * way it can be correct: against a PINNED batch snapshot of the
    * corpus counts (stream–static joins — the static side is the
    * nightly batch's unigram/bigram count tables). A stream cannot
    * compute corpus frequencies over itself without unbounded state
    * and shifting scores; pinning the snapshot makes scores exact,
    * reproducible, and identical to the batch lmScore over the same
    * counts (spec-pinned). Bigrams explode per-row (the lmScore
    * expression), join the static tables, and aggregate per
    * (doc_id, event_ts) under the watermark — a document's bigrams
    * all arrive in its own input row, so the aggregate state drains
    * at the horizon like every other streaming rollup here; unseen
    * bigrams/prefixes score 0, the conservative floor for
    * out-of-snapshot text.
    *
    * Scale shape: the static count tables are real tables (bucketed
    * via Warehouse if long-lived); per-doc aggregates combine
    * map-side; state is horizon-bounded. */
  def streamingLmScore(docs: DataFrame, uni: DataFrame, bg: DataFrame,
      watermark: String = "1 hour"): DataFrame = {
    val pairs = streamPairsOf(docs, watermark)
    pairs
      .join(bg.select(col("w1"), col("w2"), col("cb")), Seq("w1", "w2"), "left")
      .join(uni.select(col("w1"), col("cu")), Seq("w1"), "left")
      .withColumn("s",
        coalesce(expr("(1000000 * cb) div cu"), lit(0L)))
      .groupBy(col("doc_id"), col("event_ts"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("s")).as("lm_score"))
      .withColumn("mean_score", expr("lm_score div n_bigrams"))
      .select(col("doc_id"), col("n_bigrams"), col("lm_score"),
        col("mean_score"))
  }

  /** DSIR importance scoring ON INGEST — the batch importanceScore as
    * a stream–static join: each arriving document's bigrams score
    * against BOTH a static target-domain LM snapshot (tUni/tBg:
    * (w1, cu_t) / (w1, w2, cb_t)) and a static raw-corpus LM snapshot
    * (uni/bg, the same tables streamingLmScore reads), and the per-doc
    * integer-ppm mean difference emits when the batch closes — the
    * admit/route-by-domain-affinity signal, available the moment a
    * document arrives rather than at the nightly batch. An unbounded
    * stream has no "corpus-wide counts of itself", so the raw LM is
    * the nightly snapshot by construction; a doc whose text matches a
    * snapshot-corpus doc scores exactly what the batch operator gave
    * it (ScalaTest-pinned). Unseen bigrams floor to 0 under either LM,
    * matching the batch floor.
    *
    * Scale shape: identical to streamingLmScore — static count tables
    * broadcast or hash-join per micro-batch, per-doc aggregates
    * combine map-side, state is horizon-bounded by the watermark. */
  def streamingImportance(docs: DataFrame, uni: DataFrame, bg: DataFrame,
      tUni: DataFrame, tBg: DataFrame,
      watermark: String = "1 hour"): DataFrame = {
    streamPairsOf(docs, watermark)
      .join(bg.select(col("w1"), col("w2"), col("cb")), Seq("w1", "w2"), "left")
      .join(uni.select(col("w1"), col("cu")), Seq("w1"), "left")
      .join(tBg.select(col("w1"), col("w2"), col("cb_t")), Seq("w1", "w2"), "left")
      .join(tUni.select(col("w1"), col("cu_t")), Seq("w1"), "left")
      .withColumn("s_raw", coalesce(expr("(1000000 * cb) div cu"), lit(0L)))
      .withColumn("s_tgt", coalesce(expr("(1000000 * cb_t) div cu_t"), lit(0L)))
      .groupBy(col("doc_id"), col("event_ts"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("s_raw")).as("raw_sum"), sum(col("s_tgt")).as("tgt_sum"))
      .select(col("doc_id"), col("n_bigrams"),
        expr("raw_sum div n_bigrams").as("raw_ppm"),
        expr("tgt_sum div n_bigrams").as("target_ppm"),
        (expr("tgt_sum div n_bigrams") - expr("raw_sum div n_bigrams"))
          .as("importance"))
  }

  /** Benchmark decontamination ON INGEST — the batch contamination
    * check as a stream–static join: each arriving document's distinct
    * 8-gram hashes (the decontamination convention) join the static
    * benchmark shingle set, and in-horizon per-doc overlap counts
    * emit for every flagged document the moment its batch closes.
    * The benchmark set is an eval suite — KBs–MBs — so Spark
    * broadcasts the static side into every micro-batch; only flagged
    * shingle hits reach the aggregate. Same kernel, same hashes, same
    * n as the batch operator, so a streamed flag is exactly a row the
    * nightly q_llm_contamination would report. */
  def streamingContamination(docs: DataFrame, benchmark: DataFrame,
      n: Int = 8, minOverlap: Int = 1,
      watermark: String = "1 hour"): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val benchSet = benchmark.select(
      explode(call_udf("graft_shingle_hashes_md5",
        col("text"), lit(n), lit(true))).as("h")).distinct()
    docs
      .withWatermark("event_ts", watermark)
      .select(col("doc_id"), col("event_ts"),
        explode(call_udf("graft_shingle_hashes_md5",
          col("text"), lit(n), lit(true))).as("h"))
      .join(broadcast(benchSet), Seq("h"))
      .groupBy(col("doc_id"), col("event_ts"))
      .agg(count(lit(1)).as("n_overlap"))
      .filter(col("n_overlap") >= minOverlap)
      .select(col("doc_id"), col("n_overlap"))
  }

  /** Embedding-space decontamination ON INGEST — the streaming half of
    * [[Similarity.embContamination]], stream–static like
    * [[streamingContamination]]: each arriving vector scores against
    * the broadcast static benchmark-embedding set and emits its best
    * match when the cosine clears `tau` — catching PARAPHRASED eval
    * material at the door, before it ever lands in the corpus. The
    * τ-filter runs BEFORE the aggregate, so only contaminated
    * (vector, benchmark) rows reach state; the best-match tie-break
    * (highest cos, then lowest bench_id) is the batch operator's
    * max_by exactly, and filtering to ≥ τ cannot change the argmax
    * (the winning pair's cos IS the max, hence ≥ τ) — a streamed flag
    * is exactly a `contaminated = 1` row of the nightly
    * q_llm_emb_contam.
    *
    * Scale shape: benchmark suites are KBs–MBs of vectors and
    * broadcast into every micro-batch; the stream holds only the
    * per-(vec, ts) best-match aggregate, which drains at the
    * watermark horizon. */
  def streamingEmbDecontam(vecs: DataFrame, benchmark: DataFrame,
      tau: Double = 0.95, watermark: String = "1 hour"): DataFrame = {
    graft.functions.GraftFunctions.register(vecs.sparkSession)
    val bench = broadcast(benchmark.select(
      col("vec_id").as("bench_id"), col("embedding").as("b_emb"),
      Similarity.norm(col("embedding")).as("b_nrm")))
    vecs
      .withWatermark("event_ts", watermark)
      .withColumn("nrm", Similarity.norm(col("embedding")))
      .join(bench, col("vec_id") =!= col("bench_id"))
      .withColumn("cos", Similarity.cosine(
        col("embedding"), col("b_emb"), col("nrm"), col("b_nrm")))
      .filter(col("cos") >= lit(tau))
      .groupBy(col("vec_id"), col("event_ts"))
      .agg(
        max_by(col("bench_id"),
          struct(col("cos"), (-col("bench_id")).as("neg"))).as("bench_id"),
        max(col("cos")).as("cos"))
      .select(col("vec_id"), col("bench_id"), col("cos"))
  }

  /** Surgical decontamination ON INGEST — [[TextDedup.decontamScrub]]
    * applied to the feed: the batch chain is deliberately STATELESS
    * (benchmark hash set as one broadcast row, positioned kernel +
    * index mask per row — no aggregate, no watermark, no stream
    * state), so the same function IS the streaming operator; each
    * arriving document leaves with its leaked benchmark spans cut out.
    * StreamingCurationSpec pins stream output == batch output on the
    * same documents. */
  def streamingDecontamScrub(docs: DataFrame, benchmark: DataFrame,
      n: Int = 8): DataFrame =
    TextDedup.decontamScrub(docs.select(col("doc_id"), col("text")),
      benchmark, n)

  /** Fuzzy historical dedup ON INGEST — the streaming half of
    * [[TextDedup.nearDupAgainstHistorySigs]], done stream–static like
    * [[streamingLmScore]]/[[streamingContamination]]: the reference
    * corpus arrives as its PRECOMPUTED signature frame
    * `(doc_id, th, sig)` (TextDedup.minhashSignatures, persisted once,
    * bucketed via Warehouse for a long-lived table), banded statically;
    * each arriving document's 16 band keys join the static bands, and
    * in-bucket signature agreement ≥ `threshold` flags the doc with
    * its best history match (highest agreement, ties to the lowest
    * history id — the batch rollup's tie-break).
    *
    * Similarity is the signature-agreement ESTIMATE (the quantity LSH
    * banded on — [[streamingNearDup]]'s stance); the nightly batch
    * pass verifies with exact Jaccard. History is never re-hashed and
    * the stream holds NO keyed history state — only the per-doc
    * best-match aggregate, which drains at the watermark horizon.
    *
    * Scale shape: the static side is history-banded — (band_key,
    * hist_id, sig), numPerm·8 B per row × bands — a real table worth
    * bucketing on band_key so the per-micro-batch join never
    * re-shuffles it; only band-collided (doc, hist) rows reach the
    * agreement filter, and only flagged rows reach the aggregate. */
  def streamingHistNearDup(docs: DataFrame, historySigs: DataFrame,
      numPerm: Int = 64, bands: Int = 16, threshold: Double = 0.5,
      watermark: String = "1 hour",
      shingleKernel: String = "graft_shingle_hashes"): DataFrame =
    streamingHistNearDupBanded(docs,
      bandHistorySigs(historySigs, numPerm, bands),
      numPerm, bands, threshold, watermark, shingleKernel)

  /** Band a history signature frame `(doc_id, th, sig)` into the
    * static side [[streamingHistNearDupBanded]] joins: `(band_key,
    * hist_id, hsig)`. Materialize the RESULT for a long-lived feed —
    * persist it, or `Warehouse.writeBucketed(_, table, key =
    * "band_key")` — so micro-batches join a ready table instead of
    * re-deriving and re-shuffling the banding every trigger. */
  def bandHistorySigs(historySigs: DataFrame, numPerm: Int = 64,
      bands: Int = 16): DataFrame =
    historySigs.select(col("doc_id").as("hist_id"), col("sig").as("hsig"))
      .withColumn("band_key",
        explode(TextDedup.lshBands(col("hsig"), bands, numPerm / bands)))
      .select(col("band_key"), col("hist_id"), col("hsig"))

  /** The pre-banded form: `historyBands` is [[bandHistorySigs]] output
    * (persisted / bucketed by the caller). The signature kernel on the
    * stream side MUST match the one that built the history sigs —
    * `shingleKernel` selects it — and a history signature whose length
    * differs from `numPerm` RAISES at execution (zip_with would
    * otherwise null-pad and silently underestimate agreement). */
  def streamingHistNearDupBanded(docs: DataFrame, historyBands: DataFrame,
      numPerm: Int = 64, bands: Int = 16, threshold: Double = 0.5,
      watermark: String = "1 hour",
      shingleKernel: String = "graft_shingle_hashes"): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val rows = numPerm / bands
    val est = when(size(col("hsig")) === numPerm,
      expr(
        s"""aggregate(zip_with(sig, hsig, (a, b) -> IF(a = b, 1, 0)),
           |  0, (s, x) -> s + x) / CAST($numPerm AS DOUBLE)""".stripMargin))
      .otherwise(raise_error(concat(
        lit(s"history signature length "), size(col("hsig")),
        lit(s" != numPerm $numPerm: history sigs were built with a " +
          "different permutation count"))))
    docs
      .withWatermark("event_ts", watermark)
      .withColumn("sig", call_udf("graft_minhash_sig",
        call_udf(shingleKernel, col("text"), lit(3), lit(true)),
        lit(numPerm)))
      .select(col("doc_id"), col("event_ts"), col("sig"),
        explode(TextDedup.lshBands(col("sig"), bands, rows)).as("band_key"))
      .join(historyBands, Seq("band_key"))
      .withColumn("est", est)
      .filter(col("est") >= threshold)
      .groupBy(col("doc_id"), col("event_ts"))
      .agg(
        max_by(col("hist_id"),
          struct(col("est"), (-col("hist_id")).as("n"))).as("matched_history_id"),
        max(col("est")).as("est_jaccard"))
      .select(col("doc_id"), col("matched_history_id"), col("est_jaccard"))
  }

  /** Tumbling-window ingest accounting per source: docs and exact token
    * sums per (window, source) — the continuous form of the batch
    * q_llm_tokens rollup. Partial aggregation compresses map-side; the
    * watermark closes windows so state drains. */
  def tokenRates(docs: DataFrame, windowLen: String = "1 hour",
      watermark: String = "1 hour"): DataFrame =
    docs
      .withWatermark("event_ts", watermark)
      .groupBy(window(col("event_ts"), windowLen), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(TextAnalysis.tokens(col("text")))).cast("long").as("n_tokens"))
      .select(col("window.start").as("window_start"), col("source"),
        col("n_docs"), col("n_tokens"))

  /** Streaming vocabulary-drift alarm: per closed tumbling window, how
    * far the arriving token stream has moved from a static reference
    * unigram distribution ([[TextAnalysis.unigramPpm]] of the corpus
    * the current model was trained on). Reports exact token counts,
    * the NOVEL-token count/rate (tokens outside the reference vocab —
    * the new-language/new-spam leading indicator), and the mean
    * reference-ppm of observed tokens (drops when the stream shifts
    * toward the reference's tail, even with zero novel tokens). The
    * full TV distance needs the window's own totals inside a second
    * stateful pass; these per-token-linear signals need ONE — a window
    * that alarms here gets the exact batch [[TextAnalysis.corpusDrift]]
    * run against it offline.
    *
    * Scale shape: the reference table (vocab-sized, KBs–MBs) broadcasts
    * onto the exploded stream; one watermarked aggregate with map-side
    * partials; state is one row per open window, drained on close. */
  def streamingVocabDrift(docs: DataFrame, refPpm: DataFrame,
      windowLen: String = "1 hour", watermark: String = "1 hour"): DataFrame =
    docs
      .withWatermark("event_ts", watermark)
      .select(col("event_ts"),
        explode(TextAnalysis.tokens(col("text"))).as("term"))
      .join(broadcast(refPpm.select(col("term"), col("ppm"))),
        Seq("term"), "left")
      .groupBy(window(col("event_ts"), windowLen))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("ppm").isNull, 1L).otherwise(0L)).as("n_novel"),
        sum(coalesce(col("ppm"), lit(0L))).as("ref_mass"))
      .select(col("window.start").as("window_start"),
        col("n_tokens"), col("n_novel"),
        (col("n_novel") / col("n_tokens")).as("novel_rate"),
        expr("ref_mass div n_tokens").as("mean_ref_ppm"))

  /** Auto-trigger for the drift alarm (closes the manual handoff the
    * round-6 review noted): a `foreachBatch` handler for
    * [[streamingVocabDrift]]'s output stream that, for every closed
    * window whose novel-token rate exceeds `novelRateAlarm`, runs the
    * EXACT batch [[TextAnalysis.corpusDrift]] of that window's
    * archived documents against the reference corpus and hands the
    * per-term shift table to `onDrift`. Usage:
    *
    * {{{
    * streamingVocabDrift(stream, refPpm)
    *   .writeStream.outputMode("append")
    *   .foreachBatch(vocabDriftAutoDiff(ws => archived.filter(...),
    *     refDocs, 0.10, (w, shifts) => shifts.write...))
    * }}}
    *
    * The per-batch `collect()` is one row per CLOSED window (the
    * append-mode alarm stream) — a bounded driver-side decision loop,
    * not a data path; the heavy work (two unigramPpm scans + the
    * vocab-sized full-outer join) stays distributed inside
    * corpusDrift. `archive` maps a window start to the landed
    * documents of that window (the raw stream's own sink — the alarm
    * cannot re-read the stream, which has moved on by the time the
    * watermark closes the window). `onDrift` must MATERIALIZE the
    * shift frame inside the callback (write/collect): its persisted
    * unigram intermediates are released when the callback returns. */
  def vocabDriftAutoDiff(
      archive: java.sql.Timestamp => DataFrame,
      refDocs: DataFrame,
      novelRateAlarm: Double,
      onDrift: (java.sql.Timestamp, DataFrame) => Unit)
      : (DataFrame, Long) => Unit = (alarms, _) =>
    alarms.filter(col("novel_rate") > novelRateAlarm)
      .select(col("window_start")).collect()
      .foreach { r =>
        val ws = r.getTimestamp(0)
        val temps = new TempCache
        try onDrift(ws, TextAnalysis.corpusDrift(refDocs, archive(ws), temps))
        finally temps.release()
      }

  /** Topic-balanced admission ON INGEST — the batch
    * [[Curation.clusterTemperatureMix]] as a stream–static operator:
    * each arriving (doc, embedding) row is assigned to its nearest
    * coarse centroid ROW-LOCALLY (the [[Similarity.streamingIvfPqServe]]
    * stance: centroids fold to one broadcast array row, the argmin is
    * an array_sort over (dist, c_id) structs — the batch chain's exact
    * integer distances and tiebreak with no stateful aggregate), then
    * admitted iff its content-hash ppm bucket clears the cluster's
    * threshold. `rated` is the nightly batch snapshot
    * ((cluster_id, rate_ppm) from clusterTemperatureMix's counts): an
    * unbounded stream has no corpus-wide cluster sizes of itself, the
    * same static-snapshot stance as [[streamingLmScore]]'s LM tables.
    * A doc admitted here is exactly a row the nightly batch pass
    * would admit under the same snapshot (ScalaTest-pinned).
    *
    * Scale shape: both static sides broadcast (centroids are k rows,
    * thresholds k more); assignment and admission are pure per-row
    * expressions — the stream shuffles nothing and keeps NO state
    * beyond the watermark bookkeeping. */
  def streamingClusterMix(docs: DataFrame, coarse: DataFrame,
      rated: DataFrame, watermark: String = "1 hour"): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val carr = coarse
      .agg(collect_list(struct(col("c_id"), col("c_q"))).as("carr"))
      .withColumn("one", lit(1))
    docs
      .withWatermark("event_ts", watermark)
      .select(col("doc_id"), col("event_ts"), col("text"),
        Similarity.quantize(col("embedding")).as("qfull"), lit(1).as("one"))
      .join(broadcast(carr), Seq("one"))
      .withColumn("w", element_at(array_sort(transform(col("carr"),
        c => struct(
          call_udf("graft_l2_int", col("qfull"), c.getField("c_q")).as("pd"),
          c.getField("c_id").as("cluster_id")))), 1))
      .select(col("doc_id"), col("event_ts"), col("text"),
        col("w.cluster_id").as("cluster_id"))
      .join(broadcast(rated.select(col("cluster_id"), col("rate_ppm"))),
        Seq("cluster_id"))
      .filter(Curation.ppmBucket(col("text")) < col("rate_ppm"))
      .select(col("doc_id"), col("cluster_id"), col("rate_ppm"),
        col("event_ts"))
  }

  /** Live corpus heavy hitters — the batch
    * [[TextAnalysis.heavyHitterNgrams]] sketch running continuously: a
    * complete-mode global aggregation whose ONLY state is the one
    * Misra-Gries summary (≤ `capacity` counters), updated map-side per
    * micro-batch and emitting the current top-k each trigger. This is
    * the operations dashboard "what boilerplate is flooding the crawl
    * RIGHT NOW" feed; because the summary is a mergeable sketch the
    * state never grows with the stream, only with `capacity` — a
    * GROUP BY n-gram in complete mode would hold the full n-gram
    * universe in the state store forever.
    *
    * Same exactness regime as batch (distinct ≤ capacity ⇒ exact,
    * max_err 0): on a replayed frozen feed the final trigger's output
    * equals the batch query row-for-row (spec-pinned). */
  def streamingHeavyHitters(docs: DataFrame, n: Int = 3,
      capacity: Int = 65536, k: Int = 20): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    TextAnalysis.explodeNgrams(docs, n)
      .agg(expr(s"graft_heavy_hitters(gram, $capacity, $k)").as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item").as("gram"), col("e.cnt").as("cnt"),
        col("e.max_err").as("max_err"))
  }

  /** Windowed heavy hitters — the append-mode ops feed: one
    * Misra-Gries summary per tumbling event-time window, emitted when
    * the watermark closes the window ("what flooded the crawl between
    * 14:00 and 15:00"). State is one bounded summary per OPEN window
    * (a handful at any moment under a sane lateness horizon), dropped
    * by the engine at close — against [[streamingHeavyHitters]]'s
    * single forever-summary this trades all-time totals for
    * closed-window finality and append semantics (downstream sinks
    * need no complete-mode rewrite). Per-window output equals the
    * batch sketch over that window's rows (spec-pinned). */
  def streamingHeavyHittersWindowed(docs: DataFrame,
      windowLen: String = "1 hour", watermark: String = "30 minutes",
      n: Int = 3, capacity: Int = 65536, k: Int = 20): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    TextAnalysis.explodeNgrams(docs.withWatermark("event_ts", watermark),
        n, keep = Seq("event_ts"))
      .groupBy(window(col("event_ts"), windowLen))
      .agg(expr(s"graft_heavy_hitters(gram, $capacity, $k)").as("hh"))
      .select(col("window.start").as("window_start"), explode(col("hh")).as("e"))
      .select(col("window_start"), col("e.item").as("gram"),
        col("e.cnt").as("cnt"), col("e.max_err").as("max_err"))
  }
}

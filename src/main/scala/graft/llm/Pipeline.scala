package graft.llm

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** The canonical training-data curation pass — the composition a user
  * of this engine actually runs nightly, wired from the individually
  * oracle'd operators:
  *
  *   normalize → quality gate → near-dup keep-list →
  *   benchmark decontamination → split assignment
  *
  * Each stage only narrows the corpus (monotone row counts, pinned in
  * PipelineSpec), every decision is content-deterministic (reruns and
  * backfills produce byte-identical output), and the whole pass is
  * ONE lazy plan — no intermediate materialization unless Spark
  * decides to (the MinHash signature / LM pair caches are the
  * deliberate exceptions, released via the caller's [[TempCache]]).
  *
  * Scale shape: inherits each operator's documented shape (SCALE.md
  * §2); nothing here adds a shuffle beyond the stages' own — the
  * gate verdict and keep-list joins are doc_id-keyed semi/anti joins
  * against frames far smaller than the corpus.
  */
object Pipeline {

  private val obsSeq = new java.util.concurrent.atomic.AtomicLong(0)

  /** Assemble the pass once for both entry points. `tap` instruments
    * the SPINE — a strictly linear parallel chain where each stage
    * node is consumed exactly once, so an attached CollectMetrics
    * counts each stage's rows exactly once. The frames the side
    * branches consume (gate verdict, pair generation, contamination
    * probe) are the UN-tapped variants: a tapped frame feeding two
    * branches would execute its metrics node once per branch and
    * double-count. The connected-components drop list is computed
    * once and shared by both chains (CC is eager — its loop must not
    * run per consumer). */
  private def stages(docs: DataFrame, benchmark: DataFrame,
      lmThresholdPpm: Long, temps: TempCache,
      tap: (DataFrame, String) => DataFrame,
      shingleKernel: String = "graft_shingle_hashes",
      survivorScore: Option[org.apache.spark.sql.Column] = None,
      sharedPairs: Option[DataFrame] = None,
      lmQuantile: Option[Double] = None): DataFrame = {
    val cleaned = docs.withColumn("text", Curation.normalize(col("text")))
    // the gate VERDICT (id-only, 8 B/row — narrow even at 100 TB) is
    // persisted: both its consumers (the pair-generation branch and
    // the spine's semi join) would otherwise re-execute the whole
    // rules + repetition + LM gate lineage. lmQuantile switches the
    // fluency floor from the fixed ppm to the corpus-relative
    // nearest-rank quantile (TextAnalysis.qualityGateRelative) — the
    // tier-robust form; everything downstream is identical.
    val gate = lmQuantile match {
      case Some(q) =>
        TextAnalysis.qualityGateRelative(cleaned, q, temps, sharedPairs)
      case None =>
        TextAnalysis.qualityGate(cleaned, lmThresholdPpm, temps, sharedPairs)
    }
    val gateIds = temps.register(
      gate.filter(col("keep")).select(col("doc_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val gated = cleaned.join(gateIds, Seq("doc_id"), "left_semi")
    // one CC run regardless of survivor policy: min-id reads the
    // labels directly; max-score ranks cluster members by the caller's
    // quality column (dedupKeepBest's policy) over the same assignment
    val cc = TextDedup.connectedComponents(
      TextDedup.minhashPairs(gated, shingleKernel = shingleKernel,
        temps = temps))
    val dropIds = survivorScore match {
      case None => cc.filter(col("id") =!= col("cluster_id"))
        .select(col("id").as("doc_id"))
      case Some(score) => TextDedup.keepBestDropIds(gated, cc, score)
    }
    val deduped = gated.join(dropIds, Seq("doc_id"), "left_anti")
    val contaminatedIds = TextDedup.contamination(deduped, benchmark)
      .select(col("doc_id"))
    // the spine: same joins over the same id frames, tapped per stage
    val spineGated = tap(cleaned, "input").join(gateIds, Seq("doc_id"), "left_semi")
    val spineDeduped = tap(spineGated, "gated")
      .join(dropIds, Seq("doc_id"), "left_anti")
    val clean = tap(spineDeduped, "deduped")
      .join(contaminatedIds, Seq("doc_id"), "left_anti")
      .withColumn("split", Curation.splitByHash(col("text")))
    tap(clean, "decontaminated")
  }

  /** Run the full pass. `benchmark` is the eval suite to decontaminate
    * against (pass an empty frame to skip). Returns the curated corpus
    * with a `split` column; per-stage surviving counts are observable
    * via [[curateWithCounts]]. Long-running drivers pass a [[TempCache]]
    * and release it after materializing. `survivorScore` switches the
    * dedup survivor policy from min-doc_id to max-score (ties → lowest
    * id) over the SAME cluster assignment — e.g. `length(col("text"))`
    * for keep-the-longest-copy; cluster structure, and therefore the
    * survivor COUNT, is policy-independent (PipelineSpec pins it). */
  def curate(docs: DataFrame, benchmark: DataFrame,
      lmThresholdPpm: Long = 34000L,
      temps: TempCache = TempCache.noop,
      shingleKernel: String = "graft_shingle_hashes",
      survivorScore: Option[org.apache.spark.sql.Column] = None): DataFrame =
    stages(docs, benchmark, lmThresholdPpm, temps, (df, _) => df,
      shingleKernel, survivorScore)

  /** [[curate]] with the CORPUS-RELATIVE fluency floor
    * ([[TextAnalysis.qualityGateRelative]], nearest-rank quantile `q`
    * of the bigram-LM mean over the normalized corpus) instead of the
    * fixed ppm threshold. Same downstream stages, same oracle CTEs
    * with only the gate predicate swapped. This is the tier-robust
    * end-to-end pass: the fixed floor keeps 0 documents at the 10×
    * expanded tier (SCALE.md §7), the median floor keeps ~half the
    * scored docs at ANY corpus scale. */
  def curateRel(docs: DataFrame, benchmark: DataFrame,
      q: Double = 0.5,
      temps: TempCache = TempCache.noop,
      shingleKernel: String = "graft_shingle_hashes",
      survivorScore: Option[org.apache.spark.sql.Column] = None): DataFrame =
    stages(docs, benchmark, 0L, temps, (df, _) => df,
      shingleKernel, survivorScore, lmQuantile = Some(q))

  /** Curate + DSIR importance over ONE shared corpus pair frame.
    *
    * Composed separately, [[curate]]'s quality gate (lmScore) and
    * [[TextAnalysis.importanceScore]] each explode, shuffle, and cache
    * their own corpus (doc_id, w1, w2) pair frame — the dominant
    * intermediate of both (corpus-token-count rows). This entry builds
    * [[TextAnalysis.corpusPairs]] once over the normalized corpus and
    * threads it through both consumers; `targetExpr` carves the DSIR
    * target domain from the same normalized corpus (the
    * q_llm_importance shape, e.g. `col("source") === "src18"`).
    * Returns (curated-with-split, per-doc importance). PipelineSpec
    * pins the sharing: exactly one fewer registered persist than the
    * two passes run independently, identical results. */
  def curateWithImportance(docs: DataFrame, benchmark: DataFrame,
      targetExpr: org.apache.spark.sql.Column,
      lmThresholdPpm: Long = 34000L,
      temps: TempCache = TempCache.noop): (DataFrame, DataFrame) = {
    val cleaned = docs.withColumn("text", Curation.normalize(col("text")))
    val pairs = Some(TextAnalysis.corpusPairs(cleaned, temps))
    val curated = stages(docs, benchmark, lmThresholdPpm, temps,
      (df, _) => df, sharedPairs = pairs)
    val importance = TextAnalysis.importanceScore(cleaned,
      cleaned.filter(targetExpr), temps, pairs)
    (curated, importance)
  }

  /** The same pass with per-stage survivor counts — the audit numbers
    * a data card publishes. The counts ride `observe()` metrics on ONE
    * materialization (a noop-sink write): each stage's CollectMetrics
    * node sits on the spine, so the audit costs one pipeline execution
    * total, not one re-execution of the upstream lineage per stage
    * (the r5 shape: 4 `.count()` actions ≈ 4× the nightly bill).
    * The returned frame is PERSISTED across the counting run — the
    * caller's own sink reads the materialized blocks instead of
    * re-executing the full upstream lineage (whose CollectMetrics
    * nodes would not refresh on a second action anyway). The persist
    * is registered in `temps`; callers release it after their sink
    * materializes, per the TempCache contract. */
  def curateWithCounts(docs: DataFrame, benchmark: DataFrame,
      lmThresholdPpm: Long = 34000L,
      temps: TempCache = TempCache.noop): (DataFrame, Map[String, Long]) = {
    val names = Seq("input", "gated", "deduped", "decontaminated")
    // unique per call: Spark rejects duplicate observation names across
    // ACTIVE queries, so concurrent pipelines in one session must not
    // collide (the bloomViewSeq stance)
    val runId = obsSeq.incrementAndGet()
    val obs = names.map(n => n -> new Observation(s"curate_${runId}_$n")).toMap
    val clean = temps.register(
      stages(docs, benchmark, lmThresholdPpm, temps,
        (df, name) => df.observe(obs(name), count(lit(1)).as("n")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    clean.write.format("noop").mode("overwrite").save()
    // metric delivery rides the (async) listener bus; poll the timed
    // getOrEmpty (via the package bridge) against a deadline — no
    // unbounded Observation.get park, no sacrificial thread to leak
    val counts = names.map { n =>
      val deadline = System.currentTimeMillis + 120000
      var m = org.apache.spark.sql.GraftObservationBridge.getOrEmpty(obs(n))
      while (m.isEmpty && System.currentTimeMillis < deadline)
        m = org.apache.spark.sql.GraftObservationBridge.getOrEmpty(obs(n))
      require(m.nonEmpty,
        s"observed metric curate_${runId}_$n never arrived (listener bus)")
      n -> m("n").asInstanceOf[Long]
    }.toMap
    (clean, counts)
  }

  /** Incremental recompute of a PER-ROW verdict table between corpus
    * snapshots: rescore only the added/changed slice (corpusDiff),
    * keep old verdicts for unchanged docs, drop removed ones. Valid
    * ONLY for corpus-independent signals — the quality-rule verdicts
    * here, fingerprints, normalization — where a document's result
    * depends on its own bytes; corpus-dependent scores (LM floor,
    * novelty, df) shift with every snapshot and must recompute in
    * full. PipelineSpec pins the invariant that makes this safe:
    * incremental == full recompute, exactly.
    *
    * Scale shape: corpusDiff's narrow hash join, then the scorer runs
    * over ONLY the changed slice — for the typical crawl delta that
    * is orders of magnitude less compute than a full pass. */
  def incrementalRules(oldDocs: DataFrame, newDocs: DataFrame,
      oldVerdicts: DataFrame): DataFrame = {
    val diff = Curation.corpusDiff(oldDocs, newDocs)
    val toScore = newDocs.join(
      diff.filter(col("status").isin("added", "changed")).select(col("doc_id")),
      Seq("doc_id"), "left_semi")
    val carried = oldVerdicts.join(
      diff.filter(col("status") === "unchanged").select(col("doc_id")),
      Seq("doc_id"), "left_semi")
    TextAnalysis.qualityRules(toScore).unionByName(carried)
  }

  /** The WHOLE pass as one declared, ORACLE'D query — the composition
    * itself gets a correctness row, not just its stages: normalize →
    * full quality gate (rules + repetition + LM floor) → MinHash/LSH
    * keep-list (md5 kernel so DuckDB replays the banding) → benchmark
    * decontamination (first 10 docs as the eval suite) → split
    * assignment. The oracle replays every stage in DuckDB, including
    * the recursive-CTE transitive closure standing in for the CC
    * loop. */
  /** The EMBEDDING-AWARE end-to-end pass: [[curate]]'s text pipeline
    * (normalize → quality gate → MinHash/LSH dedup → decontaminate →
    * split), then the surviving documents' embeddings flow through
    * SemDeDup ([[Similarity.semDedupKeepList]] — semantic near-dups
    * the shingle LSH can't see) and D4 prototype pruning
    * ([[Similarity.diversifyKeepList]] — over-sample the diverse
    * tail). One plan, five pipeline families: the full modern
    * LLM-training-data recipe as a single oracle'd query.
    *
    * Documents without an embedding row (vec_id = doc_id contract)
    * exit at the embedding semi join — the semantic stages only see
    * embedded docs, in both engines. The curated id frame (id +
    * source + split, narrow) is persisted once for its two consumers
    * (the embedding semi join and the final attribute join-back).
    *
    * CACHE LIFETIME CONTRACT: with the default `temps =
    * TempCache.noop` the internal persist is never released — correct
    * only for one-shot JVMs (Verify/Bench) or callers that
    * `catalog.clearCache()` afterwards. A long-lived driver MUST pass
    * a real [[TempCache]] and call `release()` after materializing the
    * result, or the narrow id frame leaks one cached copy per call.
    *
    * Scale shape: each stage keeps its own documented shape (gate
    * verdict persisted id-only; capped LSH buckets; log-round CC ×2;
    * broadcast centroids with map-side argmin); the stages couple
    * ONLY through narrow id/verdict frames — no text and no embedding
    * ever crosses between families. */
  def curateEmb(docs: DataFrame, embeddings: DataFrame,
      benchmark: DataFrame, lmThresholdPpm: Long = 34000L,
      temps: TempCache = TempCache.noop,
      shingleKernel: String = "graft_shingle_hashes",
      bits: Int = 8, tau: Double = 0.3,
      centroidStride: Int = 100, dropPpm: Long = 250000L,
      lmQuantile: Option[Double] = None): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val curated = lmQuantile match {
      case Some(q) => curateRel(docs, benchmark, q, temps, shingleKernel)
      case None => curate(docs, benchmark, lmThresholdPpm, temps, shingleKernel)
    }
    val keptIds = temps.register(
      curated
        .select(col("doc_id"), col("source"), col("split"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val vecs = embeddings
      .join(keptIds.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi")
      .select(col("vec_id"), col("embedding"),
        Similarity.norm(col("embedding")).as("nrm"))
    val surv = Similarity.semDedupKeepList(vecs, bits, tau)
    Similarity.diversifyKeepList(surv, centroidStride, dropPpm)
      .join(keptIds.withColumnRenamed("doc_id", "vec_id"), Seq("vec_id"))
      .select(col("vec_id").as("doc_id"), col("source"), col("split"),
        col("c_id"), col("cos"))
  }

  /** The shared DuckDB CTE stack of the curate oracle, through the
    * `deduped` and `contam` frames — reused verbatim by the
    * embedding-aware composition oracle below. Parameterized on the
    * gate's LM clause so the fixed-floor and corpus-relative curates
    * share every other CTE byte-for-byte: `gateCtes` splices extra
    * CTEs after `rules` (the relative form's threshold chain),
    * `gatePred` is the LM predicate inside `gated`. */
  private def curateCtes(gateCtes: String, gatePred: String): String =
    raw"""WITH RECURSIVE nd AS (
           |  SELECT doc_id, source,
           |    lower(trim(regexp_replace(regexp_replace(
           |      text, '[\x00-\x1f\x7f]', ' ', 'g'), '\s+', ' ', 'g'))) AS text
           |  FROM documents
           |), t AS (
           |  SELECT doc_id, string_split(text, ' ') AS toks FROM nd
           |), wpairs AS (
           |  SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2
           |  FROM t, LATERAL (SELECT unnest(range(1, len(toks))) AS i) x
           |  WHERE len(toks) >= 2
           |), uni AS (
           |  SELECT w1, count(*) AS cu FROM (
           |    SELECT unnest(toks) AS w1 FROM t) GROUP BY w1
           |), bg AS (
           |  SELECT w1, w2, count(*) AS cb FROM wpairs GROUP BY w1, w2
           |), lm AS (
           |  SELECT p.doc_id,
           |    CAST(sum((1000000 * b.cb) // u.cu) // count(*) AS BIGINT)
           |      AS mean_score
           |  FROM wpairs p
           |  JOIN bg b ON p.w1 = b.w1 AND p.w2 = b.w2
           |  JOIN uni u ON p.w1 = u.w1
           |  GROUP BY p.doc_id
           |), tris AS (
           |  SELECT doc_id,
           |    CASE WHEN len(string_split(text, ' ')) >= 3 THEN
           |      list_transform(range(1, len(string_split(text, ' ')) - 1),
           |        i -> array_to_string((string_split(text, ' '))[i:i+2], ' '))
           |    ELSE [text] END AS tris
           |  FROM nd
           |), rep AS (
           |  SELECT doc_id, len(tris) AS n_tri,
           |    list_max(list_transform(list_distinct(tris),
           |      t2 -> len(list_filter(tris, x -> x = t2)))) AS top_count
           |  FROM tris
           |), rules AS (
           |  SELECT doc_id,
           |    len(string_split(text, ' ')) >= 10
           |      AND length(text) - len(string_split(text, ' ')) + 1
           |        >= len(string_split(text, ' ')) * 2
           |      AND length(text) - len(string_split(text, ' ')) + 1
           |        <= len(string_split(text, ' ')) * 12
           |      AND length(regexp_replace(text, '[^.,!?;:]', '', 'g')) * 10
           |        <= length(text) * 3
           |      AND len(list_filter(string_split(text, ' '),
           |            tk2 -> tk2 IN ('the', 'a'))) >= 1
           |      AS keep_rules
           |  FROM nd
           |)$gateCtes, gated AS (
           |  SELECT nd.doc_id, nd.source, nd.text
           |  FROM nd
           |  JOIN rules r ON nd.doc_id = r.doc_id
           |  JOIN rep ON nd.doc_id = rep.doc_id
           |  LEFT JOIN lm ON nd.doc_id = lm.doc_id
           |  WHERE r.keep_rules AND rep.top_count * 5 <= rep.n_tri
           |    AND $gatePred
           |), tk AS (
           |  SELECT doc_id, string_split(text, ' ') AS tk, text FROM gated
           |), sh AS (
           |  SELECT doc_id,
           |    CASE WHEN len(tk) >= 3 THEN
           |      list_distinct(list_transform(range(1, len(tk) - 1),
           |        i -> array_to_string(tk[i:i+2], ' ')))
           |    ELSE [text] END AS shingles
           |  FROM tk
           |), th AS (
           |  SELECT doc_id, list_transform(shingles,
           |    t2 -> CAST(('0x' || substr(md5(t2), 1, 8)) AS BIGINT) % 2147483647) AS th
           |  FROM sh
           |), sig AS (
           |  SELECT doc_id, th, list_transform(range(0, 64), k ->
           |    list_min(list_transform(th,
           |      h -> ((k*1000003 + 12345)*h + k*998244353 + 7) % 2147483647))) AS sig
           |  FROM th
           |), bands AS (
           |  SELECT doc_id, unnest(list_transform(range(0, 16),
           |    b -> b::VARCHAR || ':' || array_to_string(sig[b*4+1:b*4+4], ','))) AS band_key
           |  FROM sig
           |), ok AS (
           |  SELECT band_key FROM bands GROUP BY band_key
           |  HAVING count(*) > 1 AND count(*) <= 100
           |), cand AS (
           |  SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb
           |  FROM bands a JOIN bands b
           |    ON a.band_key = b.band_key AND a.doc_id < b.doc_id
           |  WHERE a.band_key IN (SELECT band_key FROM ok)
           |), scored AS (
           |  SELECT c.ida, c.idb,
           |    len(list_intersect(ta.th, tb.th)) /
           |    len(list_distinct(list_concat(ta.th, tb.th))) AS jac
           |  FROM cand c
           |  JOIN th ta ON ta.doc_id = c.ida
           |  JOIN th tb ON tb.doc_id = c.idb
           |), edges AS (
           |  SELECT ida AS a, idb AS b FROM scored WHERE jac >= 0.5
           |  UNION SELECT idb, ida FROM scored WHERE jac >= 0.5
           |), reach(a, b) AS (
           |  SELECT a, a FROM (SELECT DISTINCT a FROM edges) e0
           |  UNION
           |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
           |), drop_ids AS (
           |  SELECT a FROM reach GROUP BY a HAVING a <> min(b)
           |), deduped AS (
           |  SELECT * FROM gated WHERE doc_id NOT IN (SELECT a FROM drop_ids)
           |), bsh AS (
           |  SELECT doc_id,
           |    CASE WHEN len(string_split(text, ' ')) >= 8 THEN
           |      list_distinct(list_transform(
           |        range(1, len(string_split(text, ' ')) - 6),
           |        i -> array_to_string((string_split(text, ' '))[i:i+7], ' ')))
           |    ELSE [text] END AS shingles
           |  FROM documents WHERE doc_id < 10
           |), bth AS (
           |  SELECT DISTINCT unnest(list_transform(shingles,
           |    t2 -> CAST(('0x' || substr(md5(t2), 1, 8)) AS BIGINT) % 2147483647)) AS h
           |  FROM bsh
           |), dsh AS (
           |  SELECT doc_id,
           |    CASE WHEN len(string_split(text, ' ')) >= 8 THEN
           |      list_distinct(list_transform(
           |        range(1, len(string_split(text, ' ')) - 6),
           |        i -> array_to_string((string_split(text, ' '))[i:i+7], ' ')))
           |    ELSE [text] END AS shingles
           |  FROM deduped
           |), dth AS (
           |  SELECT doc_id, unnest(list_transform(shingles,
           |    t2 -> CAST(('0x' || substr(md5(t2), 1, 8)) AS BIGINT) % 2147483647)) AS h
           |  FROM dsh
           |), contam AS (
           |  SELECT DISTINCT d.doc_id FROM dth d JOIN bth b ON d.h = b.h
           |)
           |""".stripMargin

  private val curateCtePrefix: String =
    curateCtes("", "coalesce(lm.mean_score, 0) >= 34000")

  /** The relative-gate curate CTEs: the median-threshold chain over
    * the SAME lm frame (TextAnalysis.qGateRel's replay), predicate
    * swapped — everything else identical to the fixed-floor oracle. */
  private val curateRelCtePrefix: String =
    curateCtes(
      """, byv AS (
        |  SELECT mean_score, count(*) AS c FROM lm GROUP BY mean_score
        |), cum AS (
        |  SELECT mean_score,
        |    CAST(sum(c) OVER (ORDER BY mean_score
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
        |    CAST(sum(c) OVER () AS BIGINT) AS n
        |  FROM byv
        |), thr AS (
        |  SELECT min(CASE WHEN cum >= CAST(ceil(0.5 * n) AS BIGINT)
        |    THEN mean_score END) AS lm_thr FROM cum
        |)""".stripMargin,
      "lm.mean_score IS NOT NULL AND lm.mean_score >= (SELECT lm_thr FROM thr)")

  val qCurate = graft.queries.QuerySpec(
    "q_llm_curate",
    (s, d) => {
      val docs = graft.Tables.load(s, d, "documents")
      val benchmark = docs.filter(col("doc_id") < 10)
        .select(col("doc_id"), col("text"))
      curate(docs, benchmark, shingleKernel = "graft_shingle_hashes_md5")
        .select(col("doc_id"), col("source"), col("split"))
        .orderBy(col("doc_id"))
    },
    Some(curateCtePrefix + """
           |SELECT doc_id, source,
           |  CASE WHEN b2 < 90 THEN 'train' WHEN b2 < 95 THEN 'val'
           |       ELSE 'test' END AS split
           |FROM (SELECT doc_id, source,
           |        CAST(('0x' || substr(sha256(text), 1, 4)) AS BIGINT) % 100 AS b2
           |      FROM deduped
           |      WHERE doc_id NOT IN (SELECT doc_id FROM contam)) f
           |ORDER BY doc_id""".stripMargin))

  /** The whole embedding-aware recipe as ONE correctness row: the
    * curate stack's CTEs verbatim, then the restricted SemDeDup
    * replay (sign-LSH signatures with the same hyperplane literals,
    * capped buckets, cosine threshold, recursive closure) and the
    * diversify replay (assignment + per-cluster rank + integer floor
    * threshold), all over only the curated-and-embedded survivors —
    * five families hash-matched through one composition. */
  val qCurateEmb = graft.queries.QuerySpec(
    "q_llm_curate_emb",
    (s, d) => {
      val docs = graft.Tables.load(s, d, "documents")
      val benchmark = docs.filter(col("doc_id") < 10)
        .select(col("doc_id"), col("text"))
      curateEmb(docs, graft.Tables.load(s, d, "embeddings"), benchmark,
        shingleKernel = "graft_shingle_hashes_md5")
        .orderBy(col("doc_id"))
    },
    Some(
      curateCtePrefix + curateEmbSqlSuffix))

  /** The embedding-stage CTE suffix of the curate_emb oracles
    * (curated/split frame → norm'd vectors → SemDeDup replay →
    * diversify replay), shared by the fixed- and relative-gate
    * compositions. */
  private def curateEmbSqlSuffix: String = s"""
           |, curated AS MATERIALIZED (
           |  SELECT doc_id, source,
           |    CASE WHEN b2 < 90 THEN 'train' WHEN b2 < 95 THEN 'val'
           |         ELSE 'test' END AS split
           |  FROM (SELECT doc_id, source,
           |          CAST(('0x' || substr(sha256(text), 1, 4)) AS BIGINT) % 100 AS b2
           |        FROM deduped
           |        WHERE doc_id NOT IN (SELECT doc_id FROM contam)) f
           |), v AS MATERIALIZED (
           |  SELECT e.vec_id, e.embedding,
           |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           |      list_transform(e.embedding, x -> CAST(x*x AS DOUBLE))),
           |      (acc, p) -> acc + p)) AS nrm
           |  FROM embeddings e JOIN curated c ON e.vec_id = c.doc_id
           |), ${Similarity.semDedupReplayCtes("v", "e", materialized = true)}
           |, surv AS MATERIALIZED (
           |  SELECT * FROM v WHERE vec_id NOT IN (SELECT a FROM edropset)
           |), ${Similarity.diversifyReplayCtes("surv", "d", materialized = true)}
           |SELECT d.vec_id AS doc_id, c.source, c.split, d.c_id, d.cos
           |FROM dranked d JOIN curated c ON d.vec_id = c.doc_id
           |WHERE ${Similarity.diversifyKeepSql()}
           |ORDER BY doc_id""".stripMargin

  /** Five families under the tier-robust gate: [[curateEmb]] with the
    * relative fluency floor — the one configuration of the flagship
    * embedding composition whose oracle is non-vacuous at the
    * expanded tiers. Same SemDeDup/diversify replay, same curate CTEs
    * with only the gate predicate swapped. */
  val qCurateEmbRel = graft.queries.QuerySpec(
    "q_llm_curate_emb_rel",
    (s, d) => {
      val docs = graft.Tables.load(s, d, "documents")
      val benchmark = docs.filter(col("doc_id") < 10)
        .select(col("doc_id"), col("text"))
      curateEmb(docs, graft.Tables.load(s, d, "embeddings"), benchmark,
        shingleKernel = "graft_shingle_hashes_md5",
        lmQuantile = Some(0.5))
        .orderBy(col("doc_id"))
    },
    Some(curateRelCtePrefix + curateEmbSqlSuffix))

  /** The end-to-end pass under the corpus-relative gate — the
    * tier-robust flagship: non-vacuously oracle-verified at every sf
    * (the fixed-floor q_llm_curate keeps 0 docs at the expanded
    * tiers; this keeps ~half the scored corpus through the gate at
    * any scale, then dedups/decontaminates/splits it identically). */
  val qCurateRel = graft.queries.QuerySpec(
    "q_llm_curate_rel",
    (s, d) => {
      val docs = graft.Tables.load(s, d, "documents")
      val benchmark = docs.filter(col("doc_id") < 10)
        .select(col("doc_id"), col("text"))
      curateRel(docs, benchmark, shingleKernel = "graft_shingle_hashes_md5")
        .select(col("doc_id"), col("source"), col("split"))
        .orderBy(col("doc_id"))
    },
    Some(curateRelCtePrefix + """
           |SELECT doc_id, source,
           |  CASE WHEN b2 < 90 THEN 'train' WHEN b2 < 95 THEN 'val'
           |       ELSE 'test' END AS split
           |FROM (SELECT doc_id, source,
           |        CAST(('0x' || substr(sha256(text), 1, 4)) AS BIGINT) % 100 AS b2
           |      FROM deduped
           |      WHERE doc_id NOT IN (SELECT doc_id FROM contam)) f
           |ORDER BY doc_id""".stripMargin))

  val all: Seq[graft.queries.QuerySpec] =
    Seq(qCurate, qCurateRel, qCurateEmb, qCurateEmbRel)
}

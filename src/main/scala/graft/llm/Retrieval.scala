package graft.llm

import graft.Tables
import graft.queries.QuerySpec
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Segment-style inverted-index state (the stored half of the build →
  * store → serve split): append-only postings withOUT the
  * cross-document df column, the vocab-sized (term, df) side table,
  * and the doc-id manifest. See the segment block in [[Retrieval]] —
  * this normalization is what makes the nightly merge touch only
  * delta + vocab frames instead of rewriting the index. */
final case class IndexSegments(postings: DataFrame, df: DataFrame,
    docIds: DataFrame)

/** Sparse lexical retrieval over the `documents` table: BM25 scoring
  * from an inverted-index-shaped postings frame, the build → store →
  * serve split (the text twin of the IVF-PQ `codes`/`serve` pair), and
  * reciprocal-rank fusion of the lexical and embedding rankings — the
  * hybrid-search stack a training-data pipeline uses for eval-set
  * mining, targeted corpus slicing, and retrieval-based decontamination
  * triage.
  *
  * Determinism stance (driver hash-compares against DuckDB): BM25's
  * usual `ln`-based idf differs in ULPs across libm implementations, so
  * scores use the exact rational idf `(N - df + 0.5) / (df + 0.5)` —
  * same monotone ranking family — and every per-(term, doc)
  * contribution is floored to integer PARTS-PER-MILLION before the
  * cross-term sum: long additions are order-free, so the aggregated
  * score is bit-identical regardless of execution order in either
  * engine. The per-row double arithmetic inside one contribution is a
  * fixed parenthesized sequence of correctly-rounded IEEE ops, written
  * identically in the Spark plan and the oracle SQL.
  *
  * Scale shape: postings build is ONE corpus scan exploded and
  * map-side-combined per (doc, term); document frequency is a
  * term-keyed aggregate joined back on the same key (the join form,
  * not `count OVER (PARTITION BY term)` — a stopword's postings would
  * land on one window task, while AQE can split a skewed join key).
  * Serving broadcasts the QUERY term set against the postings scan —
  * the inverted-index probe: only postings of query terms survive the
  * scan — and the top-k tail is the bounded `graft_topk_min` aggregate
  * (k rows per query per task cross the shuffle, never the full
  * candidate set).
  *
  * STORED form (round 10): the long-lived index is the normalized
  * [[IndexSegments]] — append-only postings withOUT the
  * cross-document df column, a vocab-sized (term, df) side table, and
  * a doc-id manifest — because df is the only column a delta
  * invalidates corpus-wide; once it is off the postings rows, the
  * nightly [[segMerge]] writes delta + vocab + manifest bytes only
  * and never reads, joins, or rewrites stored postings (measured flat
  * across 100×, SCALE.md §7). Serving ([[bm25TopKFromSegments]])
  * reads df per query term and needs no denormalize; a denormalized
  * view, when wanted, is the read-time broadcast join
  * [[segDenormalize]]. At warehouse scale store postings AND df
  * co-bucketed on `term` ([[graft.sources.IndexStore.bucketedTable]])
  * so repeated serving — and the vocab-exceeds-broadcast denormalize
  * fallback — never re-shuffles the index.
  *
  * CACHE LIFETIME CONTRACT (applies to every method here taking a
  * `temps` parameter — [[postings]], [[buildIndexes]], [[bm25TopK]],
  * [[buildIndexesIncremental]]): with the default `temps =
  * TempCache.noop` the internal MEMORY_AND_DISK persist is never
  * released — correct only for one-shot JVMs (Verify/Bench) or
  * callers that `catalog.clearCache()` afterwards. A long-running
  * driver composing these (a serving tier, a nightly index chain)
  * MUST pass a real [[TempCache]] and `release()` after
  * materializing the result, or each call leaks one corpus-sized
  * cached frame (the [[Pipeline.curateEmb]] contract; StreamSoak's
  * bm25 modes exist because of exactly this).
  */
object Retrieval {

  import TextAnalysis.tokens

  /** (doc_id, dl, term, tf): one row per distinct term of each
    * document, with the document's whitespace-token length. One scan,
    * ZERO exchanges (round 14): a term's tf within one document is a
    * property of that row alone, so the per-(doc, term) count folds
    * into the row-local graft_doc_tf kernel instead of the
    * explode → groupBy(doc, term) shuffle that used to be the index
    * build's only corpus-sized Exchange. Row-identical by
    * construction (same split(' ') token convention, same counts). */
  def perDocTerms(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    TextDedup.spreadSmallInput(docs)
      .select(col("doc_id"),
        size(tokens(col("text"))).cast("long").as("dl"),
        explode(call_udf("graft_doc_tf", col("text"))).as("e"))
      .select(col("doc_id"), col("dl"),
        col("e.term").as("term"), col("e.tf").as("tf"))
  }

  /** The stored inverted-index deliverable: (term, doc_id, tf, dl, df)
    * — postings denormalized with the document length and the term's
    * document frequency, the impact-style layout a serving tier reads
    * without any join at query time. df is a term-keyed aggregate of
    * the SAME persisted exploded frame joined back (novelty's
    * skew-safe stance). */
  def postings(docs: DataFrame,
      temps: TempCache = TempCache.noop): DataFrame = {
    val perDoc = temps.register(perDocTerms(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val dfT = perDoc.groupBy(col("term")).agg(count(lit(1)).as("df"))
    perDoc.join(dfT, Seq("term"))
      .select(col("term"), col("doc_id"), col("tf"), col("dl"), col("df"))
  }

  /** UNIFIED index build: the BM25 postings row (tf, dl, df) AND the
    * positional row (sorted positions) from ONE corpus scan — what a
    * nightly index job ships instead of running [[postings]] and
    * [[positionalPostings]] as two passes over the same text. One
    * posexploded scan aggregates per (doc, term) — tf is the
    * positions-array length, dl rides the scan projection — and the
    * term-keyed df joins back on the SAME persisted frame (the
    * novelty skew-safe stance). Row-identical to the two separate
    * builds by construction (spec-pinned and oracle'd). */
  def buildIndexes(docs: DataFrame,
      temps: TempCache = TempCache.noop): DataFrame = {
    val perDoc = temps.register(perDocPositions(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val dfT = perDoc.groupBy(col("term")).agg(count(lit(1)).as("df"))
    perDoc.join(dfT, Seq("term"))
      .select(col("term"), col("doc_id"), col("tf"), col("dl"),
        col("df"), col("positions"))
  }

  /** (doc_id, dl, term, positions, tf): the one-scan per-document
    * positional frame shared by [[buildIndexes]] and
    * [[buildIndexesIncremental]] — one definition so the full build
    * and the nightly merge cannot drift (the perDocTerms stance). */
  private def perDocPositions(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    TextDedup.spreadSmallInput(docs)
      .select(col("doc_id"),
        size(tokens(col("text"))).cast("long").as("dl"),
        explode(call_udf("graft_doc_pos", col("text"))).as("e"))
      .select(col("doc_id"), col("dl"), col("e.term").as("term"),
        col("e.positions").as("positions"))
      .withColumn("tf", size(col("positions")).cast("long"))
  }

  /** One-row corpus statistics: (n_docs, avgdl). avgdl is ONE exact
    * long/long IEEE division — identical in DuckDB. */
  def corpusStats(docs: DataFrame): DataFrame =
    docs
      .agg(count(lit(1)).as("n_docs"),
        sum(size(tokens(col("text"))).cast("long")).as("total_tokens"))
      .select(col("n_docs"),
        (col("total_tokens").cast("double") / col("n_docs").cast("double"))
          .as("avgdl"))

  /** Deterministic short queries from a document frame: the DISTINCT
    * first-`qLen` whitespace tokens, keyed by the source doc_id. */
  def queryTerms(queries: DataFrame, qLen: Int = 5): DataFrame =
    queries
      .select(col("doc_id").as("query_id"),
        explode(slice(tokens(col("text")), 1, qLen)).as("term"))
      .distinct()

  /** The per-(term, doc) BM25 contribution in integer ppm, k1 = 1.2 /
    * b = 0.75 (literals written identically in the oracle SQL — the
    * constants are NOT parameters precisely so the Spark plan and the
    * SQL can never drift, the round-7-advice lesson). Every
    * intermediate is a correctly-rounded IEEE double op on exactly
    * convertible longs, so the floored ppm is bit-identical across
    * engines; the cross-term SUM is then order-free long addition. */
  def bm25Ppm(tf: Column, df: Column, dl: Column,
      nDocs: Column, avgdl: Column): Column = {
    val idf = ((nDocs - df).cast("double") + lit(0.5)) /
      (df.cast("double") + lit(0.5))
    val tfn = (tf.cast("double") * lit(2.2)) /
      (tf.cast("double") +
        (lit(1.2) * (lit(0.25) + (lit(0.75) * (dl.cast("double") / avgdl)))))
    floor((idf * tfn) * lit(1000000.0)).cast("long")
  }

  // ------------------------------------------------------------------
  // Segment-style index state: the scale form of incremental
  // maintenance.
  //
  // The round-8/9 denormalized merge refreshed the per-posting `df`
  // column by joining the new vocab frame against the FULL stored ∪
  // fresh union — a term-keyed shuffle and rewrite of the whole index
  // for a 1% delta (the r8 ladder: merge time tracked index size, not
  // delta size). The fix is the Lucene economics: `df` is the ONLY
  // cross-document column, so it does not belong on the stored rows at
  // all. Stored state is three frames —
  //   postings  (term, doc_id, tf, dl [, positions])  append-only
  //   df        (term, df)                            vocab-sized
  //   docIds    (doc_id)                              manifest
  // — and the nightly merge touches ONLY delta + vocab + manifest
  // frames: never-seen delta docs pay the one-scan build, the df table
  // is a vocab-sized full-outer sum, and stored postings are appended
  // to WITHOUT being read, joined, or rewritten. Serving reads df
  // per query term ([[bm25TopKFromSegments]]); a full denormalized
  // view, when one is wanted, is a read-time broadcast join
  // ([[segDenormalize]]) — a streamed scan, not a shuffle.
  // ------------------------------------------------------------------

  /** One per-doc-term builder per index flavor: BM25 ([[perDocTerms]])
    * or unified BM25+positional ([[perDocPositions]]). */
  private val bm25Cols = Seq("term", "doc_id", "tf", "dl")
  private val unifiedCols = Seq("term", "doc_id", "tf", "dl", "positions")

  /** Full segment build of the BM25 index state from a corpus. */
  def segBuild(docs: DataFrame,
      temps: TempCache = TempCache.noop): IndexSegments =
    segBuildOn(docs, temps)(perDocTerms, bm25Cols)

  /** Full segment build of the UNIFIED (BM25 + positional) state. */
  def segBuildUnified(docs: DataFrame,
      temps: TempCache = TempCache.noop): IndexSegments =
    segBuildOn(docs, temps)(perDocPositions, unifiedCols)

  private def segBuildOn(docs: DataFrame, temps: TempCache)
      (perDoc: DataFrame => DataFrame, cols: Seq[String]): IndexSegments = {
    val pd = temps.register(perDoc(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    IndexSegments(
      pd.select(cols.map(col): _*),
      pd.groupBy(col("term")).agg(count(lit(1)).as("df")),
      docs.select(col("doc_id")))
  }

  /** Never-seen delta ids via the manifest probe — ONE definition of
    * the fresh-delta idiom shared by [[segMergeParts]] and the 3-arg
    * [[positionalPostingsInc]], so the two merge families cannot
    * drift. The delta id set is DEDUPED first (an at-least-once crawl
    * may repeat a doc; without the distinct, the downstream inner
    * join would square duplicates into the index). `boundedDelta` =
    * true force-broadcasts the delta ids and the (at most delta-
    * sized) overlap — zero stored-side shuffle, the nightly contract;
    * false keeps the anti join hint-free so an unbounded "delta" (the
    * compat shims' whole-corpus idempotency replays) degrades to a
    * planner-chosen shuffle instead of failing on a forced
    * corpus-sized broadcast. */
  private def freshIdsOf(manifest: DataFrame, deltaDocs: DataFrame,
      boundedDelta: Boolean): DataFrame = {
    val deltaIds = deltaDocs.select(col("doc_id")).distinct()
    if (boundedDelta) {
      val overlap = manifest.join(broadcast(deltaIds), Seq("doc_id"))
      deltaIds.join(broadcast(overlap), Seq("doc_id"), "left_anti")
    } else deltaIds.join(manifest, Seq("doc_id"), "left_anti")
  }

  /** The fresh delta DOCUMENT rows: never-seen ids only, exactly one
    * row per id (duplicate delta rows collapse AFTER the id probe, so
    * only fresh rows pay the dedup shuffle). */
  private def freshDocsOf(manifest: DataFrame, deltaDocs: DataFrame,
      freshIds: DataFrame, boundedDelta: Boolean): DataFrame =
    deltaDocs
      .join(if (boundedDelta) broadcast(freshIds) else freshIds,
        Seq("doc_id"))
      .dropDuplicates("doc_id")

  /** The shared merge core: (fresh per-doc rows, merged vocab df,
    * fresh doc ids). The stored side contributes one streamed MANIFEST
    * scan (broadcast-probed by the delta ids — never shuffled) and the
    * vocab-sized df table; stored POSTINGS are not touched at all.
    * Idempotent under overlapping crawls AND duplicate delta rows:
    * already-stored delta ids drop before the explode and repeated
    * delta rows collapse to one, so re-merging is a no-op and tf is
    * never inflated (spec-pinned). `boundedDelta` — see
    * [[freshIdsOf]]: the public merges keep the nightly
    * bounded-delta broadcasts, the compat shims pass false. */
  private def segMergeParts(stored: IndexSegments, deltaDocs: DataFrame,
      temps: TempCache, boundedDelta: Boolean = true)
      (perDoc: DataFrame => DataFrame)
      : (DataFrame, DataFrame, DataFrame) = {
    val freshIds = temps.register(
      freshIdsOf(stored.docIds, deltaDocs, boundedDelta)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // two consumers (df count + postings append): persisted so the
    // delta pays the tokenize+explode ONCE
    val fresh = temps.register(
      perDoc(freshDocsOf(stored.docIds, deltaDocs, freshIds, boundedDelta))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val dfDelta = fresh.groupBy(col("term")).agg(count(lit(1)).as("df_b"))
    val dfNew = stored.df.join(dfDelta, Seq("term"), "full_outer")
      .select(col("term"),
        (coalesce(col("df"), lit(0L)) + coalesce(col("df_b"), lit(0L)))
          .as("df"))
    (fresh, dfNew, freshIds)
  }

  /** Nightly BM25 segment merge: stored postings append-only, df and
    * manifest refreshed from delta + vocab frames only. */
  def segMerge(stored: IndexSegments, deltaDocs: DataFrame,
      temps: TempCache = TempCache.noop): IndexSegments =
    segMergeOn(stored, deltaDocs, temps)(perDocTerms, bm25Cols)

  /** Nightly UNIFIED segment merge (positions ride the fresh rows). */
  def segMergeUnified(stored: IndexSegments, deltaDocs: DataFrame,
      temps: TempCache = TempCache.noop): IndexSegments =
    segMergeOn(stored, deltaDocs, temps)(perDocPositions, unifiedCols)

  private def segMergeOn(stored: IndexSegments, deltaDocs: DataFrame,
      temps: TempCache, boundedDelta: Boolean = true)
      (perDoc: DataFrame => DataFrame, cols: Seq[String]): IndexSegments = {
    val (fresh, dfNew, freshIds) =
      segMergeParts(stored, deltaDocs, temps, boundedDelta)(perDoc)
    IndexSegments(
      stored.postings.select(cols.map(col): _*)
        .unionByName(fresh.select(cols.map(col): _*)),
      dfNew,
      stored.docIds.unionByName(freshIds))
  }

  /** The nightly merge's WRITE SET, denormalized for verification:
    * the fresh postings rows carrying the merged CORPUS-WIDE df —
    * exactly the bytes a segment-style nightly job writes (plus the
    * vocab df table itself), delta + vocab sized at every tier. The
    * full-build oracle restricted to the fresh ids replays it. The df
    * broadcast is pruned to the FRESH terms first (the
    * [[bm25TopKFromSegments]] probe stance) — the full vocab table
    * outgrows the broadcast budget long before the delta does. */
  def segMergeWriteSet(stored: IndexSegments, deltaDocs: DataFrame,
      temps: TempCache = TempCache.noop,
      positional: Boolean = false): DataFrame = {
    val (perDoc, cols) =
      if (positional) (perDocPositions _, unifiedCols)
      else (perDocTerms _, bm25Cols)
    val (fresh, dfNew, _) = segMergeParts(stored, deltaDocs, temps)(perDoc)
    val freshDf = dfNew.join(
      broadcast(fresh.select(col("term")).distinct()), Seq("term"))
    fresh.join(broadcast(freshDf), Seq("term"))
      .select((cols.take(4) ++ Seq("df") ++ cols.drop(4)).map(col): _*)
  }

  /** One nightly GENERATION of segment state (what
    * [[graft.streaming.IndexMaintenance]] persists per micro-batch):
    * the fresh postings delta, the merged FULL vocab df table, and the
    * fresh manifest ids. Stored postings/manifest are never rewritten;
    * the new df table supersedes the old one. `boundedDelta` — see
    * [[freshIdsOf]]: true force-broadcasts the delta id probe (the
    * nightly contract), false lets a catch-up-sized delta degrade to
    * a planner-chosen shuffled anti join instead of failing on the
    * broadcast limit (IndexMaintenance auto-selects from the actual
    * batch row count). */
  private[graft] def segMergeGen(stored: IndexSegments, deltaDocs: DataFrame,
      temps: TempCache, positional: Boolean,
      boundedDelta: Boolean = true): IndexSegments = {
    val (perDoc, cols) =
      if (positional) (perDocPositions _, unifiedCols)
      else (perDocTerms _, bm25Cols)
    val (fresh, dfNew, freshIds) =
      segMergeParts(stored, deltaDocs, temps, boundedDelta)(perDoc)
    IndexSegments(fresh.select(cols.map(col): _*), dfNew, freshIds)
  }

  /** Read-time denormalized view of a segment state: (term, doc_id,
    * tf, dl, df [, positions]). The vocab df table rides a broadcast,
    * so the postings side is a streamed scan with ZERO exchange — at
    * a vocab too large to broadcast, co-bucket postings and df on
    * `term` ([[graft.sources.IndexStore.bucketedTable]]) and the same
    * join plans exchange-free as a bucket-local sort-merge
    * (RetrievalSpec pins both shapes). */
  def segDenormalize(seg: IndexSegments): DataFrame = {
    val cols = seg.postings.columns.toSeq
    seg.postings.join(broadcast(seg.df), Seq("term"))
      .select((cols.take(4) ++ Seq("df") ++ cols.drop(4)).map(col): _*)
  }

  /** Serve BM25 top-k straight from SEGMENT state — no denormalize:
    * the vocab df table pruned to the query terms (broadcast probe,
    * at most |query terms| rows) broadcasts onto the postings scan
    * together with the query set, so the postings side needs no
    * exchange of any kind. */
  def bm25TopKFromSegments(seg: IndexSegments, stats: DataFrame,
      qTerms: DataFrame, k: Int = 10): DataFrame = {
    val qdf = seg.df.join(
      broadcast(qTerms.select(col("term")).distinct()), Seq("term"))
    bm25TopKFromPostings(
      seg.postings.join(broadcast(qdf), Seq("term")), stats, qTerms, k)
  }

  /** [[bm25TopKFromSegments]] with the query-term set PUSHED into the
    * stored-index scans as a literal `term IN (…)` — the inverted-
    * index LOOKUP, not a table scan: against the term-bucketed
    * serving tables the filter prunes whole buckets
    * (SelectedBucketsCount — at production bucket counts a 50-term
    * batch touches ~50/N of the index) and row groups via min/max +
    * dictionary pages, so serving cost tracks the query batch, not
    * the index. The term set is collected to the driver first — a
    * BOUNDED serving-batch collect (≤ queries × qLen distinct terms,
    * the k-row-handoff class, never corpus-shaped); a set larger than
    * `maxPushTerms` (corpus-coupled verification workloads like the
    * %50 set at big tiers) falls back to the pure broadcast-probe
    * plan. Result-identical either way: the broadcast probes below
    * re-apply the exact term semi-filter, the pushdown only removes
    * never-matching storage early. */
  def bm25TopKFromSegmentsPushed(seg: IndexSegments, stats: DataFrame,
      qTerms: DataFrame, k: Int = 10,
      maxPushTerms: Int = 10000): DataFrame = {
    val pruned = pushableTerms(qTerms, maxPushTerms) match {
      case Some(ts) => IndexSegments(
        seg.postings.filter(col("term").isin(ts: _*)),
        seg.df.filter(col("term").isin(ts: _*)),
        seg.docIds)
      case None => seg
    }
    bm25TopKFromSegments(pruned, stats, qTerms, k)
  }

  /** [[bm25TopKFromPostings]] with the SAME bounded pushed-`In(term,…)`
    * stance as [[bm25TopKFromSegmentsPushed]], for serving off a
    * stored DENORMALIZED postings frame (the scoped partitioned
    * layout): when the query-term set fits the push budget it lands
    * as a data filter ON the stored scan — PushedFilters + row-group
    * pruning on a parquet store, batch pruning on a cached one — so
    * non-matching storage is dropped before any join or shuffle.
    * Result-identical either way (the broadcast probe re-applies the
    * exact term semi-filter). */
  def bm25TopKFromPostingsPushed(post: DataFrame, stats: DataFrame,
      qTerms: DataFrame, k: Int = 10,
      maxPushTerms: Int = 10000): DataFrame = {
    val pruned = pushableTerms(qTerms, maxPushTerms) match {
      case Some(ts) => post.filter(col("term").isin(ts: _*))
      case None => post
    }
    bm25TopKFromPostings(pruned, stats, qTerms, k)
  }

  /** The bounded probe-term collect shared by every pushed server:
    * Some(distinct terms) when the set fits the push budget, None when
    * a corpus-coupled workload exceeds it (fall back to the pure
    * broadcast-probe plan). One definition so the cap and null
    * semantics cannot drift between the BM25 and positional paths. */
  private def pushableTerms(termsOf: DataFrame,
      maxPushTerms: Int): Option[Seq[String]] = {
    // flatMap(Option(…)) drops null terms in the driver probe — the
    // downstream joins drop them anyway, so the pushed and non-pushed
    // plans stay result-identical, and a future tokenizer emitting a
    // null row can't NPE at plan-construction time
    val rows = termsOf.select(col("term")).distinct()
      .limit(maxPushTerms + 1).collect()
    val terms = rows.toSeq.flatMap(r => Option(r.getString(0)))
    if (rows.length > maxPushTerms) None else Some(terms)
  }

  /** COMPAT SHIM over [[segMerge]] for a denormalized stored table:
    * derives the segment state from the input (the df/manifest
    * derivations are vocab- and manifest-sized shuffles thanks to
    * map-side partials, but they do re-scan the stored frame — a
    * production caller maintains [[IndexSegments]] and never pays
    * them), merges, and returns the denormalized view.
    * Result-identical to [[postings]] over the whole corpus;
    * q_llm_bm25_inc replays that equality through the full-build
    * oracle SQL. */
  def postingsIncremental(stored: DataFrame, deltaDocs: DataFrame,
      temps: TempCache = TempCache.noop): DataFrame =
    segDenormalize(segMergeOn(segFromDenormalized(stored, bm25Cols),
      deltaDocs, temps, boundedDelta = false)(perDocTerms, bm25Cols))

  /** COMPAT SHIM over [[segMergeUnified]] — see
    * [[postingsIncremental]]. Result-identical to a from-scratch
    * [[buildIndexes]] (oracle'd through the full-build SQL). */
  def buildIndexesIncremental(stored: DataFrame, deltaDocs: DataFrame,
      temps: TempCache = TempCache.noop): DataFrame =
    segDenormalize(segMergeOn(segFromDenormalized(stored, unifiedCols),
      deltaDocs, temps, boundedDelta = false)(perDocPositions, unifiedCols))

  /** Segment state derived from a legacy denormalized postings frame:
    * per-term df (any row; all copies agree) and the doc manifest are
    * map-side-combined aggregates — vocab- and n_docs-sized shuffles,
    * never postings-sized. */
  private def segFromDenormalized(stored: DataFrame,
      cols: Seq[String]): IndexSegments =
    IndexSegments(
      stored.select(cols.map(col): _*),
      stored.groupBy(col("term")).agg(max(col("df")).as("df")),
      stored.select(col("doc_id")).distinct())

  /** Serve BM25 top-k from a STORED postings frame (term, doc_id, tf,
    * dl, df) + one-row stats. `qTerms` (query_id, term) is the small
    * side and broadcasts — the postings scan hash-probes it, so only
    * query-term postings survive (the inverted-index probe); the
    * scored candidates map-side-combine to (query, doc) sums and the
    * tail is the bounded top-k aggregate, k rows per query per task. */
  def bm25TopKFromPostings(post: DataFrame, stats: DataFrame,
      qTerms: DataFrame, k: Int = 10): DataFrame = {
    graft.functions.GraftFunctions.register(post.sparkSession)
    post.join(broadcast(qTerms), Seq("term"))
      .filter(col("doc_id") =!= col("query_id"))
      .crossJoin(broadcast(stats))
      .withColumn("ppm",
        bm25Ppm(col("tf"), col("df"), col("dl"), col("n_docs"), col("avgdl")))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("ppm")).as("score_ppm"))
      .groupBy(col("query_id"))
      .agg(call_udf("graft_topk_min",
        struct((-col("score_ppm")).as("nscore"), col("doc_id"),
          col("score_ppm")), lit(k)).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("t.doc_id").as("doc_id"), col("t.score_ppm").as("score_ppm"))
  }

  /** End-to-end BM25 top-k: corpus scan → postings SLICE pruned to the
    * query-term set → df over the slice (exact: the slice holds every
    * posting of each query term, so the per-term doc count is the
    * corpus-global df) → score → bounded top-k. The pruned slice is
    * persisted for its two consumers (the df aggregate and the
    * candidate join) — without it the corpus explode runs twice. */
  def bm25TopK(docs: DataFrame, queries: DataFrame, k: Int = 10,
      qLen: Int = 5, temps: TempCache = TempCache.noop): DataFrame = {
    val qt = queryTerms(queries, qLen)
    val termSet = qt.select(col("term")).distinct()
    val slice = temps.register(
      perDocTerms(docs).join(broadcast(termSet), Seq("term"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val dfT = slice.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val post = slice.join(dfT, Seq("term"))
      .select(col("term"), col("doc_id"), col("tf"), col("dl"), col("df"))
    bm25TopKFromPostings(post, corpusStats(docs), qt, k)
  }

  // ------------------------------------------------------------------
  // MaxScore exact top-k pruning (round 14).
  //
  // The exact-unscoped servers above score EVERY posting of every
  // query term — the sf10 soak adjudicated the zero-state hybrid
  // stream candidate-volume-bound at 3.6-5.9 q/s precisely because a
  // stopword-class term contributes a corpus-shaped posting list to
  // the (query, doc) partial-sum shuffle. The classic IR answer
  // (Turtle & Flood's MaxScore; Ding & Suel's block-max refinement)
  // is exact and public: keep a per-term score UPPER BOUND beside the
  // vocab table, split each query's terms into essential / non-
  // essential by whether the UB suffix-sum can still reach the
  // current top-k threshold, and never materialize a document that
  // appears only in non-essential lists. Here as three bounded plan
  // phases (document-at-a-time cursors don't exist in a dataflow
  // engine; term-at-a-time MaxScore maps cleanly):
  //
  //   seed    θ = k-th EXACT score among the top-k docs of the single
  //           highest-UB term per query (valid lower bound on the
  //           k-th true score — any k real scores are);
  //   phase A score ONLY essential-term postings → per-doc partial
  //           sums; a doc's total is ≤ partial + Σ non-essential UB,
  //           so candidates strictly below θ drop (survivor prune);
  //   phase B add non-essential contributions for SURVIVORS only —
  //           a semi-join, so the stopword lists never enter the
  //           aggregate for docs already proven out.
  //
  // Exactness: every true top-k doc appears in ≥1 essential list
  // (a doc confined to non-essential lists scores ≤ the non-essential
  // UB suffix-sum < θ ≤ k-th true score — STRICT, so doc_id
  // tie-breaks can't resurrect it), and survivors are scored over ALL
  // their posting rows. RetrievalMaxScoreSpec pins row-identity with
  // the unpruned server on randomized skewed corpora.
  //
  // The UB table is vocab-sized state with a merge law as cheap as
  // df's: bm25Ppm is monotone increasing in tf and decreasing in dl
  // (idf is per-term constant and non-negative — the rational idf is
  // a positive ratio, never log-negative), so ppm(max_tf, min_dl)
  // bounds every posting, and (max, min) fold across nightly deltas
  // without reading stored postings ([[mergeTermBounds]]).
  // ------------------------------------------------------------------

  /** Per-term score-bound statistics (term, max_tf, min_dl): the
    * vocab-sized side table MaxScore serving reads next to
    * [[IndexSegments.df]]. One postings scan, map-side-combined —
    * built once per store, merged per delta, never per query. */
  def termBounds(postings: DataFrame): DataFrame =
    postings.groupBy(col("term"))
      .agg(max(col("tf")).as("max_tf"), min(col("dl")).as("min_dl"))

  /** Nightly merge of the bounds table: stored bounds ∪ the FRESH
    * delta's per-doc rows, folded under (max, min) — vocab-sized work
    * keyed like the df full-outer sum, stored postings untouched.
    * Law (spec-pinned): mergeTermBounds(termBounds(stored),
    * freshRows) == termBounds(stored ∪ freshRows). Monotone-safe:
    * bounds only widen, so a stale (wider) row can never under-bound
    * a posting — deletes may leave bounds loose, never wrong. */
  def mergeTermBounds(storedBounds: DataFrame,
      freshPostings: DataFrame): DataFrame =
    storedBounds.unionByName(termBounds(freshPostings))
      .groupBy(col("term"))
      .agg(max(col("max_tf")).as("max_tf"), min(col("min_dl")).as("min_dl"))

  /** The MaxScore plan's intermediate frames, exposed so the soak can
    * count scored-vs-skipped posting rows without duplicating plan
    * logic. `slice` is every candidate posting row (what the unpruned
    * server aggregates); `scoredA`/`scoredB` are the rows that
    * actually enter the two scoring aggregates — the skipped fraction
    * is 1 − (|scoredA| + |scoredB|) / |slice|. */
  private[graft] final case class MaxScoreParts(slice: DataFrame,
      scoredA: DataFrame, scoredB: DataFrame, result: DataFrame,
      survivors: Option[DataFrame] = None)

  /** Exact BM25 top-k from segment state with MaxScore pruning —
    * result-identical to [[bm25TopKFromSegmentsPushed]] (same pushed
    * `In(term,…)` scan prune, same broadcast probes, same bounded
    * top-k tail) but the (query, doc) aggregate only receives
    * essential-term postings plus the survivors' non-essential tail,
    * so the partial-sum shuffle volume tracks the DISCRIMINATIVE
    * terms' lists, not the stopwords'. `bounds` is the stored
    * [[termBounds]] table (served pruned to the query terms — a
    * broadcast probe, never a vocab scan). */
  def bm25TopKFromSegmentsMaxScore(seg: IndexSegments, bounds: DataFrame,
      stats: DataFrame, qTerms: DataFrame, k: Int = 10,
      maxPushTerms: Int = 10000,
      temps: TempCache = TempCache.noop): DataFrame =
    bm25MaxScoreParts(seg, bounds, stats, qTerms, k, maxPushTerms,
      temps).result

  private[graft] def bm25MaxScoreParts(seg: IndexSegments,
      bounds: DataFrame, stats: DataFrame, qTerms: DataFrame, k: Int,
      maxPushTerms: Int, temps: TempCache): MaxScoreParts = {
    val sp = seg.postings.sparkSession
    import sp.implicits._
    graft.functions.GraftFunctions.register(sp)
    val qt = qTerms.select(col("query_id"), col("term")).distinct()
    val termSet = qt.select(col("term")).distinct()
    // the pushed-In scan prune (the bm25TopKFromSegmentsPushed stance):
    // bounded driver collect or fall back to pure broadcast probes
    val (post0, df0) = pushableTerms(qt, maxPushTerms) match {
      case Some(ts) => (seg.postings.filter(col("term").isin(ts: _*)),
        seg.df.filter(col("term").isin(ts: _*)))
      case None => (seg.postings, seg.df)
    }
    val qdf = df0.join(broadcast(termSet), Seq("term"))
    // ONE bounded collect of the one-row stats frame: the per-phase
    // crossJoin(broadcast(stats)) subtrees each re-ran the corpus
    // aggregate as their own broadcast job (4× per serve — round-14
    // isolation measured them as pure fixed latency). As literals the
    // ppm arithmetic is bit-identical (same exact long count and
    // double avgdl), and the subtree disappears from every phase.
    val statsRow = stats
      .select(col("n_docs").cast("long"), col("avgdl").cast("double"))
      .collect().headOption
    // Empty-corpus guard (round 15 ADVICE): n_docs == 0 leaves avgdl
    // NULL (0/0) — there are no postings to score, so any finite
    // literal yields the same (empty) result; 0.0 keeps the old
    // crossJoin form's graceful degradation instead of an NPE.
    val (nDocsLit, avgdlLit) = statsRow match {
      case Some(r) if !r.isNullAt(1) =>
        (lit(r.getLong(0)), lit(r.getDouble(1)))
      case Some(r) => (lit(r.getLong(0)), lit(0.0))
      case None => (lit(0L), lit(0.0))
    }
    // Candidate posting rows for an arbitrary (query, term) pair set,
    // scored in-stream — NEVER persisted: a stopword-heavy batch's
    // candidate slice is tens of millions of rows (48.8M per 200-query
    // batch measured at sf10), and caching it traded one term-pruned
    // store scan for heap-pressure GC that ran 1.9× SLOWER than the
    // exhaustive server. Each phase instead re-reads the store scan
    // with its own pre-scoring broadcast filter — phase A's
    // non-essential rows are never scored, shuffled, OR materialized.
    // Each phase also pushes ITS OWN term set into the scan (the
    // phase term lists are already driver values from the qub
    // collect, so this costs nothing): the seed and essential sets
    // are the RARE high-UB terms, so those two passes read
    // lookup-sized bucket slices instead of re-paying the full
    // candidate-volume scan IO three times — only phase B's
    // stopword-list scan stays corpus-candidate-shaped, and its rows
    // never reach an aggregate.
    def sliceFor(pairs: DataFrame, phaseTerms: Option[Seq[String]],
        dfSide: DataFrame = qdf): DataFrame = {
      val base = phaseTerms match {
        case Some(ts) if ts.nonEmpty && ts.size <= maxPushTerms =>
          seg.postings.filter(col("term").isin(ts: _*))
        case _ => post0
      }
      base.join(broadcast(pairs), Seq("term"))
        .filter(col("doc_id") =!= col("query_id"))
        .join(broadcast(dfSide), Seq("term"))
        .withColumn("ppm",
          bm25Ppm(col("tf"), col("df"), col("dl"), nDocsLit, avgdlLit))
        .select(col("query_id"), col("term"), col("doc_id"), col("ppm"))
    }
    val slice = sliceFor(qt, None)
    // the unpruned tail over the same slice — the no-pruning fallback
    // AND the shape the phase plan must equal (RetrievalMaxScoreSpec)
    def plainTail(rows: DataFrame): DataFrame = rows
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("ppm")).as("score_ppm"))
      .groupBy(col("query_id"))
      .agg(call_udf("graft_topk_min",
        struct((-col("score_ppm")).as("nscore"), col("doc_id"),
          col("score_ppm")), lit(k)).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("t.doc_id").as("doc_id"), col("t.score_ppm").as("score_ppm"))
    // per-(query, term) score upper bound, COLLECTED: bounded by
    // queries × qLen (the serving-batch contract, the pushableTerms
    // class) — every split decision then happens on the driver and
    // the split frames ship as LocalRelations, so the plan has no
    // nested broadcast-subtree chains (the first cut of this operator
    // ran the seed → θ → split as ~10 sequential broadcast jobs per
    // batch and lost 6× to fixed job latency at sf1). A qub past the
    // cap is a corpus-coupled verification workload, not a serving
    // batch: fall back to the exhaustive plan, result-identical.
    val qubCap = 300000
    val qubRows: Seq[(Long, String, Long, Long)] = qt
      .join(broadcast(qdf), Seq("term"))
      .join(broadcast(bounds.join(broadcast(termSet), Seq("term"))),
        Seq("term"))
      .withColumn("ub_ppm",
        bm25Ppm(col("max_tf"), col("df"), col("min_dl"), nDocsLit,
          avgdlLit))
      .select(col("query_id"), col("term"), col("ub_ppm"), col("df"))
      .limit(qubCap + 1)
      .as[(Long, String, Long, Long)].collect().toSeq
    if (qubRows.size > qubCap)
      return MaxScoreParts(slice, slice, slice.limit(0), plainTail(slice))
    // (term, df) for every scorable (query, term) pair is already on
    // the driver in qubRows — a term absent from qubRows is absent
    // from the stored df/bounds tables alike (both derive from the
    // same postings), so it can contribute nothing to any phase.
    // Shipping the pairs back as a LocalRelation removes the df-table
    // scan + broadcast subtree from all three phase slices (round 14).
    val dfLocal = qubRows.map(r => (r._2, r._4)).distinct
      .toDF("term", "df")
    // split order per query: (ub desc, term asc); df rides along for
    // the seed-term volume decision
    val byQuery = qubRows.groupBy(_._1).map { case (q, rows) =>
      q -> rows.map(r => (r._2, r._3, r._4)).sortBy(t => (-t._2, t._1))
    }
    if (byQuery.isEmpty)
      return MaxScoreParts(slice, slice, slice.limit(0), plainTail(slice))
    // seed θ in ONE BOUNDED-VOLUME pass: per query, walk terms in UB
    // order until their df covers k docs with margin (the rare
    // high-UB lists — usually a tiny fraction of the candidate
    // volume), aggregate (query, doc) PARTIAL sums over just those
    // lists, and take θ = k-th best partial. Partials are lower
    // bounds of totals over k real docs, so θ ≤ k-th true score —
    // exact pruning, no full-volume pass. (The previous cut seeded
    // from a full-slice top-row pool + a second full-slice exact
    // pass: 58 s of the 97 s sf10 batch wall was those two passes —
    // the probe showed a bare candidate pass costs 24 s, so seeding
    // must never touch the whole slice.) Queries whose seed lists
    // yield < k docs keep θ = MinValue (no pruning, still exact).
    val seedPairs = byQuery.toSeq.flatMap { case (q, terms) =>
      var cum = 0L
      terms.takeWhile { t =>
        val need = cum < 8L * k
        if (need) cum += t._3
        need
      }.map(t => (q, t._1))
    }
    val thetaMap: Map[Long, Long] =
      if (seedPairs.isEmpty) Map.empty
      else sliceFor(seedPairs.toDF("query_id", "term"),
        Some(seedPairs.map(_._2).distinct), dfLocal)
        .groupBy(col("query_id"), col("doc_id"))
        .agg(sum(col("ppm")).as("partial"))
        .groupBy(col("query_id"))
        .agg(call_udf("graft_topk_min",
          struct((-col("partial")).as("nscore"), col("doc_id"),
            col("partial")), lit(k)).as("top"))
        .select(col("query_id"), size(col("top")).as("n_seed"),
          element_at(col("top"), k).getField("partial").as("kth"))
        .select(col("query_id"),
          when(col("n_seed") >= k, col("kth"))
            .otherwise(lit(Long.MinValue)).as("theta"))
        .as[(Long, Long)].collect().toMap
    // essential split ON THE DRIVER: terms sorted by UB desc; a term
    // is NON-essential iff the UB suffix-sum from it on is STRICTLY
    // below θ (strict, so score ties at θ survive to tie-break).
    // A query with no θ row (seed term had only self-postings) keeps
    // MinValue — the no-pruning leg, never dropped.
    val splits = byQuery.toSeq.map { case (q, terms) =>
      val theta = thetaMap.getOrElse(q, Long.MinValue)
      val suffix = terms.scanRight(0L)((t, acc) => acc + t._2).init
      val (ess, ness) = terms.zip(suffix).partition(_._2 >= theta)
      (q, theta, ess.map(_._1._1), ness.map(_._1._1),
        ness.map(_._1._2).sum)
    }
    val nonEssPairs = splits.flatMap { case (q, _, _, ness, _) =>
      ness.map(t => (q, t))
    }
    if (nonEssPairs.isEmpty) // nothing prunable anywhere: one-job plan
      return MaxScoreParts(slice, slice, slice.limit(0), plainTail(slice))
    val essPairs = splits.flatMap { case (q, _, ess, _, _) =>
      ess.map(t => (q, t))
    }
    // phase A: essential postings only → per-doc partials; prune
    // candidates whose optimistic total (partial + all non-essential
    // UB) is strictly below θ. θ and the non-essential UB sums ride
    // the LocalRelation join (q rows).
    val thetaDf = splits.map { case (q, th, _, _, nUb) => (q, th, nUb) }
      .toDF("query_id", "theta", "ness_ub")
    val scoredA = sliceFor(essPairs.toDF("query_id", "term"),
      Some(essPairs.map(_._2).distinct), dfLocal)
    val survivors = temps.register(scoredA
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("ppm")).as("partial"))
      .join(broadcast(thetaDf), Seq("query_id"))
      .filter(col("partial") + col("ness_ub") >= col("theta"))
      .select(col("query_id"), col("doc_id"), col("partial"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // phase B: non-essential postings for survivors only. The
    // survivor probe must be a BROADCAST semi — a shuffle semi would
    // move every non-essential posting row on (query, doc), the exact
    // volume the prune exists to skip (and the soak session disables
    // AQE, so no runtime rescue). survivors is persisted, so the
    // bounded count is one cheap action; a pathological survivor set
    // past the cap falls back to the hint-free shuffle semi — slower,
    // still exact.
    val survIds = survivors.select(col("query_id"), col("doc_id"))
    val survProbe =
      if (survivors.limit(2000001).count() <= 2000000L)
        broadcast(survIds)
      else survIds
    val scoredB = sliceFor(nonEssPairs.toDF("query_id", "term"),
      Some(nonEssPairs.map(_._2).distinct), dfLocal)
      .join(survProbe, Seq("query_id", "doc_id"), "left_semi")
    val result = survivors
      .select(col("query_id"), col("doc_id"), col("partial").as("ppm"))
      .unionByName(scoredB.select(col("query_id"), col("doc_id"),
        col("ppm")))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("ppm")).as("score_ppm"))
      .groupBy(col("query_id"))
      .agg(call_udf("graft_topk_min",
        struct((-col("score_ppm")).as("nscore"), col("doc_id"),
          col("score_ppm")), lit(k)).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("t.doc_id").as("doc_id"), col("t.score_ppm").as("score_ppm"))
    MaxScoreParts(slice, scoredA, scoredB, result, Some(survivors))
  }

  /** Attribute-SCOPED postings: one inverted index PER SCOPE of a
    * low-cardinality document attribute (language, source, license) —
    * (attr, term, doc_id, tf, dl, df) with df computed WITHIN the
    * scope. Serving a scope is then BM25 over exactly the sub-corpus
    * index: statistics (df, and [[scopedStats]]' n_docs/avgdl) are
    * in-scope, so scores match an index that only ever contained the
    * matching documents — the text-side analogue of
    * q_llm_ann_filtered's sub-corpus equivalence.
    *
    * Scale shape: stored `partitionBy(attr)`
    * ([[graft.sources.IndexStore.partitionedParquet]]), so a scope
    * predicate prunes whole directories at plan time
    * (PartitionFilters) — a lang='en' serve never opens the other
    * languages' files. The build is the [[postings]] chain with the
    * attribute riding the scan projection and keying the df
    * aggregate; one corpus scan, map-side-combined. */
  def scopedPostings(docs: DataFrame, attr: String,
      temps: TempCache = TempCache.noop): DataFrame = {
    val perDoc = temps.register(
      scopedPerDocTerms(docs, attr)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val dfT = perDoc.groupBy(col(attr), col("term"))
      .agg(count(lit(1)).as("df"))
    perDoc.join(dfT, Seq(attr, "term"))
      .select(col(attr), col("term"), col("doc_id"), col("tf"),
        col("dl"), col("df"))
  }

  /** Per-doc term rows with the scope attribute riding the scan —
    * (attr, term, doc_id, tf, dl), NO df: the fresh-delta half of the
    * BATCHED scoped merge
    * ([[graft.streaming.NightlyMaintenance.mergeScopedBatchPartitioned]]),
    * where one job builds every scope's generation and df merges
    * separately against each scope's stored vocab. One scan,
    * map-side-combined (the [[scopedPostings]] shape minus the df
    * join). */
  def scopedPerDocTerms(docs: DataFrame, attr: String): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    TextDedup.spreadSmallInput(docs)
      .select(col(attr), col("doc_id"),
        size(tokens(col("text"))).cast("long").as("dl"),
        explode(call_udf("graft_doc_tf", col("text"))).as("e"))
      .select(col(attr), col("e.term").as("term"), col("doc_id"),
        col("e.tf").as("tf"), col("dl"))
  }

  /** Per-scope corpus statistics: (attr, n_docs, avgdl) — the
    * [[corpusStats]] row per attribute scope, scope-count-sized. */
  def scopedStats(docs: DataFrame, attr: String): DataFrame =
    docs
      .groupBy(col(attr))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(tokens(col("text"))).cast("long")).as("total_tokens"))
      .select(col(attr), col("n_docs"),
        (col("total_tokens").cast("double") / col("n_docs").cast("double"))
          .as("avgdl"))

  /** POSITIONAL postings: (term, doc_id, positions) with 1-based
    * token positions, sorted — the index layout that upgrades term
    * search to exact PHRASE search (and proximity scoring) without
    * touching the text again. One scan posexploded and
    * map-side-combined per (doc, term); the positions array is bounded
    * by the document's own length (documents are the bounded unit of
    * this engine, the chunking stance). */
  def positionalPostings(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    TextDedup.spreadSmallInput(docs)
      .select(col("doc_id"),
        explode(call_udf("graft_doc_pos", col("text"))).as("e"))
      .select(col("doc_id"), col("e.term").as("term"),
        col("e.positions").as("positions"))
  }

  /** Exact two-term phrase search from the positional index: documents
    * where `t1` is immediately followed by `t2`, with the exact
    * occurrence count — `|pos(t1) ∩ (pos(t2) − 1)|`, a pure per-row
    * array intersection once the two posting rows meet.
    *
    * Scale shape: the phrase set broadcasts against the positional
    * postings scan twice (the inverted-index probe per phrase slot);
    * the (query, doc) pair join touches only matched posting rows —
    * no text, no corpus shuffle beyond the index build. */
  def phraseSearch(pp: DataFrame, phrases: DataFrame): DataFrame = {
    val m1 = pp.join(broadcast(phrases
        .select(col("query_id"), col("t1").as("term"))), Seq("term"))
      .select(col("query_id"), col("doc_id"), col("positions").as("pos1"))
    val m2 = pp.join(broadcast(phrases
        .select(col("query_id"), col("t2").as("term"))), Seq("term"))
      .select(col("query_id"), col("doc_id"), col("positions").as("pos2"))
    adjacentOcc(m1.join(m2, Seq("query_id", "doc_id")))
      .select(col("query_id"), col("doc_id"), col("n_occ"))
  }

  /** The adjacency semantics shared by [[phraseSearch]] and
    * [[streamingPhraseSearch]] — one definition so batch and stream
    * cannot drift: self-hits excluded, `n_occ = |pos1 ∩ (pos2 − 1)|`,
    * zero-occurrence pairs dropped. Input must carry `query_id`,
    * `doc_id`, `pos1`, `pos2`. */
  private def adjacentOcc(joined: DataFrame): DataFrame =
    joined
      .filter(col("doc_id") =!= col("query_id"))
      .withColumn("n_occ",
        size(array_intersect(col("pos1"),
          transform(col("pos2"), x => x - 1))).cast("long"))
      .filter(col("n_occ") > 0)

  /** ARBITRARY-LENGTH phrase search from the positional index:
    * phrases arrive as (query_id, terms array<string>); a document
    * matches at start p iff terms(i) occurs at p + i for every slot i.
    * `n_occ` = |∩_i (pos_i − i)|, the k-way generalization of
    * [[phraseSearch]]'s two-way intersection.
    *
    * Scale shape — ONE index join regardless of phrase length (not k
    * self-joins): the phrase set explodes to (slot, term) rows and
    * broadcasts against a single postings scan; the per-(query, doc)
    * group collects at most k position arrays (each bounded by the
    * document's own length) and the all-slots-present guard plus the
    * intersection fold are row-local array lambdas. Only matched
    * posting rows shuffle, keyed on (query, doc). */
  def phraseSearchK(pp: DataFrame, phrases: DataFrame): DataFrame =
    phraseMatchesK(pp, phrases)
      .select(col("query_id"), col("doc_id"), col("n_occ"))

  /** The k-way matcher behind [[phraseSearchK]] and [[snippets]]:
    * (query_id, doc_id, k, n_occ, first_pos) with `first_pos` the
    * smallest matching start — one definition of the match set for
    * both consumers. */
  private def phraseMatchesK(pp: DataFrame,
      phrases: DataFrame): DataFrame = {
    val slots = phrases.select(col("query_id"),
      size(col("terms")).cast("long").as("k"),
      posexplode(col("terms")).as(Seq("slot", "term")))
    pp.join(broadcast(slots), Seq("term"))
      .filter(col("doc_id") =!= col("query_id"))
      .withColumn("shifted",
        transform(col("positions"), x => x - col("slot")))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(countDistinct(col("slot")).as("ns"), max(col("k")).as("k"),
        collect_list(col("shifted")).as("sp"))
      .filter(col("ns") === col("k"))
      .withColumn("starts",
        aggregate(col("sp"), lit(null).cast("array<int>"),
          (acc, a) => when(acc.isNull, a)
            .otherwise(array_intersect(acc, a))))
      .withColumn("n_occ", size(col("starts")).cast("long"))
      .filter(col("n_occ") > 0)
      .select(col("query_id"), col("doc_id"), col("k"), col("n_occ"),
        array_min(col("starts")).cast("long").as("first_pos"))
  }

  /** KWIC (keyword-in-context) snippet extraction: for every phrase
    * match, the token window of `width` tokens around the FIRST
    * occurrence — the human-review artifact every retrieval triage
    * ships (eval-set mining, decontamination review queues).
    *
    * Scale shape: the match frame (k rows per query, not corpus-sized)
    * joins the corpus ONCE on doc_id — only matched documents'
    * text is ever re-tokenized, and the slice is a row-local lambda.
    * Window clamps at the document start (greatest(first−width, 1)),
    * identically in the oracle. */
  def snippets(docs: DataFrame, pp: DataFrame, phrases: DataFrame,
      width: Int = 2): DataFrame = {
    val m = phraseMatchesK(pp, phrases)
    m.join(docs.select(col("doc_id"), col("text")), Seq("doc_id"))
      .withColumn("s", greatest(col("first_pos") - width, lit(1L)))
      .withColumn("len",
        (col("first_pos") + col("k") - 1 + width - col("s") + 1)
          .cast("int"))
      .select(col("query_id"), col("doc_id"), col("n_occ"),
        col("first_pos"),
        array_join(slice(tokens(col("text")), col("s").cast("int"),
          col("len")), " ").as("snippet"))
  }

  /** Deterministic tier-fixed k-term phrase set: the first `n` tokens
    * of the base-tier every-50th documents (shorter documents yield
    * shorter phrases — `phraseSearchK` keys off the actual slot
    * count). */
  def phrasesKOf(docs: DataFrame, n: Int = 3): DataFrame =
    docs.filter(pmod(col("doc_id"), lit(50)) === 0 && col("doc_id") < 500)
      .select(col("doc_id").as("query_id"),
        slice(tokens(col("text")), 1, n).as("terms"))

  /** PROXIMITY (slop) search: ordered co-occurrence within a window —
    * `n_pairs` = |{(p1, p2) : p1 ∈ pos(t1), p2 ∈ pos(t2),
    * 1 ≤ p2 − p1 ≤ slop}| per (query, doc). The relevance signal
    * between exact-phrase and bag-of-words: same two broadcast index
    * probes as [[phraseSearch]], with the adjacency intersection
    * widened to a row-local pair count over the two position arrays
    * (O(|pos1|·|pos2|) per row, both bounded by the document's own
    * length — documents are the bounded unit of this engine). */
  def proximitySearch(pp: DataFrame, pairs: DataFrame,
      slop: Int = 3): DataFrame = {
    val m1 = pp.join(broadcast(pairs
        .select(col("query_id"), col("t1").as("term"))), Seq("term"))
      .select(col("query_id"), col("doc_id"), col("positions").as("pos1"))
    val m2 = pp.join(broadcast(pairs
        .select(col("query_id"), col("t2").as("term"))), Seq("term"))
      .select(col("query_id"), col("doc_id"), col("positions").as("pos2"))
    proximityOcc(m1.join(m2, Seq("query_id", "doc_id")), slop)
      .select(col("query_id"), col("doc_id"), col("n_pairs"))
  }

  /** The slop-count semantics shared by [[proximitySearch]] and
    * [[streamingProximitySearch]] — one definition so batch and
    * stream cannot drift (the adjacentOcc stance): self-hits
    * excluded, n_pairs = |{(p1, p2) : 1 ≤ p2 − p1 ≤ slop}|, zero-pair
    * rows dropped. Input must carry `query_id`, `doc_id`, `pos1`,
    * `pos2`. */
  private def proximityOcc(joined: DataFrame, slop: Int): DataFrame =
    joined
      .filter(col("doc_id") =!= col("query_id"))
      .withColumn("n_pairs",
        aggregate(col("pos2"), lit(0L), (acc, y) =>
          acc + size(filter(col("pos1"),
            x => (y - x >= 1) && (y - x <= lit(slop)))).cast("long")))
      .filter(col("n_pairs") > 0)

  /** Deterministic tier-fixed proximity pairs: first and third tokens
    * of the base-tier every-50th documents (documents shorter than
    * three tokens yield a null t2 and drop out of the equi join —
    * same in the oracle). */
  def proximityPairsOf(docs: DataFrame): DataFrame =
    docs.filter(pmod(col("doc_id"), lit(50)) === 0 && col("doc_id") < 500)
      .select(col("doc_id").as("query_id"),
        element_at(tokens(col("text")), 1).as("t1"),
        element_at(tokens(col("text")), 3).as("t2"))

  /** Retrieval-quality evaluation — the lexical twin of the ANN
    * recall harness: score a (query_id, rank, doc_id) ranking against
    * a (query_id, doc_id) relevance set. Per query: the relevant-doc
    * count, hits inside the top `k`, the first relevant rank, and the
    * reciprocal rank in integer ppm (`1000000 div first_rank` — MRR's
    * per-query term with no float anywhere, the rrfFuse stance).
    * Queries with an empty relevance set stay in the card with zeros,
    * and so do queries with relevant docs but NO retrieved rows (an
    * eval that silently drops no-answer queries in either direction
    * overstates quality); duplicate judgment rows are deduplicated
    * before counting.
    *
    * Scale shape: both inputs are k-rows-per-query frames (the
    * ranking by construction, the relevance set by its own join
    * selectivity) — every join here is query-keyed and dwarfed by the
    * ranking job that produced the inputs. */
  def retrievalEval(ranking: DataFrame, rel: DataFrame,
      k: Int = 10): DataFrame = {
    // judgment files may carry duplicate rows; dedup so join fan-out
    // cannot inflate hits_at_k or n_rel
    val relD = rel.select(col("query_id"), col("doc_id")).distinct()
    val relN = relD.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_rel"))
    val hit = ranking.filter(col("rank") <= k)
      .join(relD.withColumn("r", lit(1L)),
        Seq("query_id", "doc_id"), "left")
      .groupBy(col("query_id"))
      .agg(sum(coalesce(col("r"), lit(0L))).as("hits_at_k"),
        min(when(col("r") === 1L, col("rank"))).as("first_rank"))
    // FULL outer: a query with relevant docs but zero retrieved rows
    // must appear with zeros, symmetrically with the empty-relevance
    // case — dropping either side overstates aggregate quality
    hit.join(relN, Seq("query_id"), "full_outer")
      .select(col("query_id"),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        coalesce(col("hits_at_k"), lit(0L)).as("hits_at_k"),
        coalesce(col("first_rank"), lit(0L)).as("first_rank"),
        coalesce(expr("1000000 div first_rank"), lit(0L)).as("rr_ppm"))
  }

  /** The nightly positional-index merge: stored (term, doc_id,
    * positions) rows ride through on a narrow doc-keyed anti join;
    * only never-seen delta documents pay the tokenize + posexplode.
    * Unlike [[postingsIncremental]] there is no cross-document column
    * to reconcile (positions are per-document facts), so the merge is
    * exactly union-of-disjoint-doc-sets — result-identical to a
    * from-scratch build (oracle'd through the full-build SQL). */
  def positionalPostingsInc(stored: DataFrame,
      deltaDocs: DataFrame): DataFrame = {
    val storedIds = stored.select(col("doc_id")).distinct()
    stored.unionByName(positionalPostings(
      deltaDocs.join(storedIds, Seq("doc_id"), "left_anti")))
  }

  /** Manifest-probed variant (sharing [[freshIdsOf]]/[[freshDocsOf]]
    * with the segment merges — one probe definition): when the stored
    * doc-id manifest is a maintained artifact, never-seen delta docs
    * are found by one manifest scan broadcast-probed with the delta
    * ids — the stored postings are appended to without being read at
    * all, no per-merge distinct over the index is paid, and duplicate
    * delta rows collapse before the explode. */
  def positionalPostingsInc(stored: DataFrame, storedIds: DataFrame,
      deltaDocs: DataFrame): DataFrame = {
    val freshIds = freshIdsOf(storedIds, deltaDocs, boundedDelta = true)
    stored.unionByName(positionalPostings(
      freshDocsOf(storedIds, deltaDocs, freshIds, boundedDelta = true)))
  }

  /** Deterministic tier-fixed phrase set: the first two tokens of the
    * base-tier every-50th documents. */
  def phrasesOf(docs: DataFrame): DataFrame =
    docs.filter(pmod(col("doc_id"), lit(50)) === 0 && col("doc_id") < 500)
      .select(col("doc_id").as("query_id"),
        element_at(tokens(col("text")), 1).as("t1"),
        element_at(tokens(col("text")), 2).as("t2"))

  /** Streaming phrase search over the STORED positional index —
    * completely STATELESS: a query event derives its (t1, t2) slots
    * row-locally, the first stream-static equi join fans out to the
    * t1 posting rows, the second lands on (t2, doc_id) — an equi key,
    * so only the co-occurring docs' rows survive — and the adjacency
    * count is the same per-row position intersection as batch. No
    * watermark, no state store, no window: the decontamScrub stance
    * for retrieval, legal at any point in a streaming pipeline.
    * Result-equal per event to [[phraseSearch]] (spec-pinned);
    * duplicate query events pass through as duplicate answers — dedup
    * upstream if delivery is at-least-once. */
  def streamingPhraseSearch(queries: DataFrame, pp: DataFrame): DataFrame = {
    val p1 = pp.select(col("term").as("t1"), col("doc_id"),
      col("positions").as("pos1"))
    val p2 = pp.select(col("term").as("t2"), col("doc_id"),
      col("positions").as("pos2"))
    queries
      .select(col("query_id"), col("event_ts"),
        element_at(tokens(col("text")), 1).as("t1"),
        element_at(tokens(col("text")), 2).as("t2"))
      .join(p1, Seq("t1"))
      .join(p2, Seq("t2", "doc_id"))
      .transform(adjacentOcc)
      .select(col("query_id"), col("event_ts"), col("doc_id"), col("n_occ"))
  }

  /** Streaming proximity search over the stored positional index —
    * the slop-widened twin of [[streamingPhraseSearch]], equally
    * STATELESS: (t1, t2) derive row-locally as the event text's first
    * and third tokens (the [[proximityPairsOf]] contract), the two
    * stream-static equi joins land on (t1) then (t2, doc_id), and the
    * pair count is [[proximityOcc]]'s row-local fold. No watermark, no
    * state store; result-equal per event to [[proximitySearch]]
    * (spec-pinned). */
  def streamingProximitySearch(queries: DataFrame, pp: DataFrame,
      slop: Int = 3): DataFrame = {
    val p1 = pp.select(col("term").as("t1"), col("doc_id"),
      col("positions").as("pos1"))
    val p2 = pp.select(col("term").as("t2"), col("doc_id"),
      col("positions").as("pos2"))
    queries
      .select(col("query_id"), col("event_ts"),
        element_at(tokens(col("text")), 1).as("t1"),
        element_at(tokens(col("text")), 3).as("t2"))
      .join(p1, Seq("t1"))
      .join(p2, Seq("t2", "doc_id"))
      .transform(j => proximityOcc(j, slop))
      .select(col("query_id"), col("event_ts"), col("doc_id"),
        col("n_pairs"))
  }

  /** The positional-index CTE chain (tokens → 1-based positions →
    * sorted per-(doc, term) position lists), shared by every
    * positional-index oracle so variants cannot drift (the
    * bm25CteFor stance). */
  private val posCtes =
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      |), pos AS (
      |  SELECT doc_id, toks[i] AS term, i
      |  FROM t, LATERAL (SELECT unnest(range(1, len(toks) + 1)) AS i) x
      |), pp AS (
      |  SELECT doc_id, term, list_sort(list(i)) AS positions
      |  FROM pos GROUP BY doc_id, term
      |)""".stripMargin

  private val posIndexTailSql =
    """
      |SELECT term, doc_id,
      |  array_to_string(positions, ',') AS positions
      |FROM pp ORDER BY term, doc_id""".stripMargin

  /** The positional-index BUILD deliverable (positions as a joined
    * string — the driver hash-compares scalars, the ivfpq_codes
    * stance; the production table keeps the real array). */
  val qPosIndex = QuerySpec(
    "q_llm_pos_index",
    (s, d) =>
      positionalPostings(docsOf(s, d))
        .select(col("term"), col("doc_id"),
          array_join(col("positions"), ",").as("positions"))
        .orderBy(col("term"), col("doc_id")),
    Some(posCtes + posIndexTailSql))

  /** The stored POSITIONAL index for phrase/proximity serving, as a
    * term-bucketed warehouse table (the servingSegOf stance). */
  private[llm] def servingPosOf(s: SparkSession, d: String): DataFrame =
    graft.sources.IndexStore.bucketedTable(s, d, "srv_pos", "term")(
      positionalPostings(docsOf(s, d)))

  /** Prune a stored postings table to the terms a BOUNDED probe set
    * references, pushed as a literal `term IN (…)` into the scan —
    * [[bm25TopKFromSegmentsPushed]]'s lookup stance shared by the
    * phrase/proximity servers: the term-bucketed serving table prunes
    * whole buckets + row groups, so lookup cost tracks the query
    * batch, not the index. `termsOf` must be a one-column (`term`)
    * frame; the bounded collect is the k-row-handoff class. Falls
    * back to the plain scan past `maxPushTerms`; result-identical
    * either way (downstream broadcast probes re-apply the exact term
    * semantics). */
  private def termPushed(pp: DataFrame, termsOf: DataFrame,
      maxPushTerms: Int = 10000): DataFrame =
    pushableTerms(termsOf, maxPushTerms)
      .map(ts => pp.filter(col("term").isin(ts: _*)))
      .getOrElse(pp)

  /** Both slots of a (t1, t2) probe frame as one `term` column — the
    * [[termPushed]] input for the two-slot phrase/proximity sets. */
  private def pairTerms(pairs: DataFrame): DataFrame =
    pairs.select(explode(array(col("t1"), col("t2"))).as("term"))

  /** Exact phrase search over the stored positional table, oracle'd
    * end-to-end with the tier-fixed phrase set (feasible at every
    * tier). */
  val qPhraseSearch = QuerySpec(
    "q_llm_phrase_search",
    (s, d) => {
      val docs = docsOf(s, d)
      val phr = phrasesOf(docs)
      phraseSearch(termPushed(servingPosOf(s, d), pairTerms(phr)), phr)
        .orderBy(col("query_id"), col("doc_id"))
    },
    Some(posCtes + """, phr AS (
           |  SELECT doc_id AS query_id,
           |    (string_split(text, ' '))[1] AS t1,
           |    (string_split(text, ' '))[2] AS t2
           |  FROM documents WHERE doc_id % 50 = 0 AND doc_id < 500
           |), m1 AS (
           |  SELECT phr.query_id, pp.doc_id, pp.positions AS pos1
           |  FROM phr JOIN pp ON pp.term = phr.t1
           |), m2 AS (
           |  SELECT phr.query_id, pp.doc_id, pp.positions AS pos2
           |  FROM phr JOIN pp ON pp.term = phr.t2
           |)
           |SELECT m1.query_id, m1.doc_id,
           |  CAST(len(list_intersect(pos1,
           |    list_transform(pos2, x -> x - 1))) AS BIGINT) AS n_occ
           |FROM m1 JOIN m2
           |  ON m1.query_id = m2.query_id AND m1.doc_id = m2.doc_id
           |WHERE m1.doc_id != m1.query_id
           |  AND len(list_intersect(pos1,
           |    list_transform(pos2, x -> x - 1))) > 0
           |ORDER BY m1.query_id, m1.doc_id""".stripMargin))

  /** The k-way hit CTE chain (slot-exploded tier-fixed phrase set →
    * per-start matched-slot counts), shared by the phrase-k and
    * snippet oracles. */
  private val phraseHitsCtes = posCtes + """, phr AS (
           |  SELECT doc_id AS query_id, toks3[s] AS term,
           |    s - 1 AS slot, len(toks3) AS k
           |  FROM (SELECT doc_id, (string_split(text, ' '))[1:3] AS toks3
           |        FROM documents WHERE doc_id % 50 = 0 AND doc_id < 500) p,
           |  LATERAL (SELECT unnest(range(1, len(toks3) + 1)) AS s) x
           |), hits AS (
           |  SELECT phr.query_id, pos.doc_id, pos.i - phr.slot AS strt,
           |    count(DISTINCT phr.slot) AS ns, max(phr.k) AS k
           |  FROM phr JOIN pos ON pos.term = phr.term
           |  WHERE pos.doc_id != phr.query_id
           |  GROUP BY phr.query_id, pos.doc_id, pos.i - phr.slot
           |)""".stripMargin

  /** k-term phrase search, oracle'd end-to-end with the tier-fixed
    * 3-token phrase set. The oracle states the definition directly:
    * candidate starts are `position − slot` per matched slot, a start
    * survives iff all k slots matched there, `n_occ` counts surviving
    * starts — provably the same set the intersection fold computes. */
  val qPhraseK = QuerySpec(
    "q_llm_phrase_k",
    (s, d) => {
      val docs = docsOf(s, d)
      val phr = phrasesKOf(docs)
      phraseSearchK(termPushed(servingPosOf(s, d),
          phr.select(explode(col("terms")).as("term"))), phr)
        .orderBy(col("query_id"), col("doc_id"))
    },
    Some(phraseHitsCtes + """
           |SELECT query_id, doc_id, CAST(count(*) AS BIGINT) AS n_occ
           |FROM hits WHERE ns = k
           |GROUP BY query_id, doc_id
           |ORDER BY query_id, doc_id""".stripMargin))

  /** KWIC snippets for the tier-fixed phrase set, oracle'd
    * end-to-end: first-occurrence token windows, clamped at the
    * document start identically in both engines. */
  val qPhraseSnippet = QuerySpec(
    "q_llm_phrase_snippet",
    (s, d) => {
      val docs = docsOf(s, d)
      val phr = phrasesKOf(docs)
      snippets(docs, termPushed(servingPosOf(s, d),
          phr.select(explode(col("terms")).as("term"))), phr)
        .orderBy(col("query_id"), col("doc_id"))
    },
    Some(phraseHitsCtes + """, m AS (
           |  SELECT query_id, doc_id, CAST(count(*) AS BIGINT) AS n_occ,
           |    CAST(min(strt) AS BIGINT) AS first_pos, max(k) AS k
           |  FROM hits WHERE ns = k
           |  GROUP BY query_id, doc_id
           |)
           |SELECT m.query_id, m.doc_id, m.n_occ, m.first_pos,
           |  array_to_string(t.toks[greatest(m.first_pos - 2, 1):
           |    (m.first_pos + m.k - 1 + 2)], ' ') AS snippet
           |FROM m JOIN t ON m.doc_id = t.doc_id
           |ORDER BY m.query_id, m.doc_id""".stripMargin))

  /** Proximity search at slop 3, oracle'd end-to-end: the oracle
    * counts qualifying (p1, p2) position pairs by a positions-level
    * self-join — the definition the row-local array fold computes. */
  val qProxSearch = QuerySpec(
    "q_llm_prox_search",
    (s, d) => {
      val docs = docsOf(s, d)
      val prx = proximityPairsOf(docs)
      proximitySearch(termPushed(servingPosOf(s, d), pairTerms(prx)), prx)
        .orderBy(col("query_id"), col("doc_id"))
    },
    Some(posCtes + """, phr AS (
           |  SELECT doc_id AS query_id,
           |    (string_split(text, ' '))[1] AS t1,
           |    (string_split(text, ' '))[3] AS t2
           |  FROM documents WHERE doc_id % 50 = 0 AND doc_id < 500
           |)
           |SELECT q.query_id, a.doc_id, CAST(count(*) AS BIGINT) AS n_pairs
           |FROM phr q
           |  JOIN pos a ON a.term = q.t1
           |  JOIN pos b ON b.term = q.t2 AND b.doc_id = a.doc_id
           |WHERE a.doc_id != q.query_id AND b.i - a.i BETWEEN 1 AND 3
           |GROUP BY q.query_id, a.doc_id
           |ORDER BY q.query_id, a.doc_id""".stripMargin))

  /** The positional-index nightly merge, oracle'd through the
    * full-build SQL (the q_llm_bm25_inc stance: tier-sized stored
    * postings + manifest read from [[graft.sources.IndexStore]],
    * fixed-size overlapping delta; the merge is a pure append — no
    * cross-document column to reconcile). */
  val qPosInc = QuerySpec(
    "q_llm_pos_inc",
    (s, d) => {
      val docs = docsOf(s, d)
      val stored = graft.sources.IndexStore.parquet(s, d,
        "seg_pos/postings")(
        positionalPostings(docs.filter(col("doc_id") >= 400)))
      val manifest = graft.sources.IndexStore.parquet(s, d,
        "seg_pos/doc_ids")(
        docs.filter(col("doc_id") >= 400).select(col("doc_id")))
      positionalPostingsInc(stored, manifest,
        docs.filter(col("doc_id") < 500))
        .select(col("term"), col("doc_id"),
          array_join(col("positions"), ",").as("positions"))
        .orderBy(col("term"), col("doc_id"))
    },
    qPosIndex.oracle)

  /** Reciprocal-rank fusion of two (query_id, rank, doc_id) rankings:
    * score = Σ 1000000 div (60 + rank) over the lists containing the
    * doc — the standard RRF with k0 = 60, in pure integer arithmetic
    * (no floats anywhere, so cross-engine exact by construction).
    * Docs in either list qualify (full outer pair join); ties break on
    * doc_id. */
  def rrfFuse(a: DataFrame, b: DataFrame, k: Int = 10): DataFrame = {
    graft.functions.GraftFunctions.register(a.sparkSession)
    val left = a.select(col("query_id"), col("doc_id"),
      col("rank").as("rank_a"))
    val right = b.select(col("query_id"), col("doc_id"),
      col("rank").as("rank_b"))
    left.join(right, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf_ppm",
        coalesce(expr("1000000 div (60 + rank_a)"), lit(0L)) +
          coalesce(expr("1000000 div (60 + rank_b)"), lit(0L)))
      .groupBy(col("query_id"))
      .agg(call_udf("graft_topk_min",
        struct((-col("rrf_ppm")).as("nscore"), col("doc_id"),
          col("rrf_ppm"), col("rank_a"), col("rank_b")), lit(k)).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("t.doc_id").as("doc_id"), col("t.rrf_ppm").as("rrf_ppm"),
        col("t.rank_a").as("rank_text"), col("t.rank_b").as("rank_vec"))
  }

  /** Shared stream-side query-term derivation for both serving forms:
    * watermark → row-local first-`qLen` distinct terms → streaming
    * dedup on (window, query, term). The dedup is what makes serving
    * idempotent under at-least-once delivery: batch's global DISTINCT
    * on (query_id, term) restated per window, with state (≤ qLen rows
    * per query) evicted when the watermark passes the window. Emits
    * (win, query_id, term, one). */
  private def streamQueryTerms(queries: DataFrame, qLen: Int,
      windowDur: String, watermark: String): DataFrame =
    queries
      .withWatermark("event_ts", watermark)
      .select(col("query_id"), col("event_ts"),
        explode(array_distinct(slice(tokens(col("text")), 1, qLen)))
          .as("term"),
        lit(1).as("one"))
      .withColumn("win", window(col("event_ts"), windowDur))
      .dropDuplicates("win", "query_id", "term")

  /** Streaming BM25 serving: a continuous query feed (query_id, text,
    * event_ts) answered from the PRECOMPUTED postings table — the
    * online half of the build → store → serve split, the text twin of
    * [[Similarity.streamingIvfPqServe]]. Emits, per closed event-time
    * window, each query's top-k documents with the same integer ppm
    * semantics as [[bm25TopKFromPostings]] (spec-pinned equal).
    *
    * Unlike ADC — where a candidate lives in exactly ONE probed list,
    * so a per-list kernel top-k preserves the global top-k — a BM25
    * candidate accumulates score across ALL the query's term lists, so
    * the per-(query, doc) sum is irreducibly an aggregation. This is
    * Spark's chained-streaming-aggregation shape (multiple stateful
    * operators, append mode): the windowed sum keys per-(window,
    * query, doc) partials in the state store, and the second
    * aggregation — windowed via `window_time` on the first's closed
    * window — is the bounded [[graft.functions.TopKMinAggExpr]], k
    * rows of state per (window, query). Query terms are derived
    * ROW-LOCALLY (array_distinct over the first-qLen slice), then
    * deduplicated per (window, query, term) with a watermark-evicted
    * streaming dedup — batch serving's global DISTINCT on (query_id,
    * term), restated per window, so AT-LEAST-ONCE delivery (a replayed
    * query event landing twice in one window) cannot double-count the
    * per-doc sums; dedup state is ≤ qLen rows per query. The postings
    * join is stream-static on term, and the one-row stats frame rides
    * a broadcast key-1 join. */
  def streamingBm25Serve(queries: DataFrame, post: DataFrame,
      stats: DataFrame, k: Int = 10, qLen: Int = 5,
      windowDur: String = "1 minute",
      watermark: String = "1 hour"): DataFrame = {
    graft.functions.GraftFunctions.register(queries.sparkSession)
    val statsOne = broadcast(stats.withColumn("one", lit(1)))
    val scored = streamQueryTerms(queries, qLen, windowDur, watermark)
      .join(post, Seq("term"))
      .filter(col("doc_id") =!= col("query_id"))
      .join(statsOne, Seq("one"))
      .withColumn("ppm",
        bm25Ppm(col("tf"), col("df"), col("dl"), col("n_docs"), col("avgdl")))
    scored
      .groupBy(col("win").as("window"), col("query_id"), col("doc_id"))
      .agg(sum(col("ppm")).as("score_ppm"))
      .groupBy(window(window_time(col("window")), windowDur),
        col("query_id"))
      .agg(call_udf("graft_topk_min",
        struct((-col("score_ppm")).as("nscore"), col("doc_id"),
          col("score_ppm")), lit(k)).as("top"))
      .select(col("window.start").as("win_start"), col("query_id"),
        posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("win_start"), col("query_id"),
        (col("pos") + 1).cast("long").as("rank"),
        col("t.doc_id").as("doc_id"), col("t.score_ppm").as("score_ppm"))
  }

  /** Postings PACKED per term — (term, df, members array<struct<doc_id,
    * tf, dl>>) — the serving-tier layout [[streamingBm25ServePacked]]
    * reads: one storage row per vocabulary term, the member array
    * holding the same bytes as the flat rows. */
  def packPostings(post: DataFrame): DataFrame =
    post.groupBy(col("term"), col("df"))
      .agg(collect_list(struct(col("doc_id"), col("tf"), col("dl")))
        .as("members"))

  /** Streaming BM25 serving over PACKED postings — the state-shape fix
    * the sf1 soak demanded (the [[Similarity.streamingIvfPqServe]]
    * packed-ADC lesson applied to text). [[streamingBm25Serve]]'s
    * chained aggregations keep one state-store row per (window, query,
    * candidate DOC) partial sum: correct, but a stopword-heavy query
    * holds tens of thousands of RocksDB entries until window close and
    * state round trips dominate the drain. Here each stream-static
    * term match carries the term's WHOLE scored posting list as one
    * row-local array (member filter + ppm transform — no per-candidate
    * row ever materializes), and the single stateful operator is
    * [[graft.functions.SumTopKAggExpr]]: the per-doc sums and the
    * top-k tail collapsed into ONE aggregation whose state is one row
    * per (window, query) — state round trips scale with QUERIES, not
    * candidates. Result-identical to the chained form and to batch
    * serving (spec-pinned): integer sums are order-free and the eval
    * ordering is the same (score desc, doc_id). */
  def streamingBm25ServePacked(queries: DataFrame, packed: DataFrame,
      stats: DataFrame, k: Int = 10, qLen: Int = 5,
      windowDur: String = "1 minute",
      watermark: String = "1 hour"): DataFrame = {
    graft.functions.GraftFunctions.register(queries.sparkSession)
    val statsOne = broadcast(stats.withColumn("one", lit(1)))
    streamQueryTerms(queries, qLen, windowDur, watermark)
      .join(packed, Seq("term"))
      .join(statsOne, Seq("one"))
      .select(col("query_id"), col("win"),
        transform(
          filter(col("members"), m => m.getField("doc_id") =!= col("query_id")),
          m => struct(
            m.getField("doc_id").as("id"),
            bm25Ppm(m.getField("tf"), col("df"), m.getField("dl"),
              col("n_docs"), col("avgdl")).as("add"))).as("contribs"))
      .groupBy(col("win").as("window"), col("query_id"))
      .agg(call_udf("graft_sum_topk", col("contribs"), lit(k)).as("top"))
      .select(col("window.start").as("win_start"), col("query_id"),
        posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("win_start"), col("query_id"),
        (col("pos") + 1).cast("long").as("rank"),
        col("t.id").as("doc_id"), col("t.sum").as("score_ppm"))
  }

  /** STREAMING hybrid search served from the stored indexes — the
    * online twin of q_llm_rrf_fusion_serve: a query stream carrying
    * BOTH text and embedding
    * (query_id, text, embedding, event_ts) is answered per closed
    * event-time window with the RRF fusion of the packed-BM25 lexical
    * ranking and the IVF-PQ semantic ranking, all index state static
    * (packed postings + one-row stats; code table + frozen
    * quantizer).
    *
    * Shape: both sides are STATELESS derivations — the lexical side
    * is [[streamingBm25ServePacked]]'s per-term packed contribution
    * rows, the semantic side [[Similarity.streamingAdcCandidates]]'
    * probed-list candidates — unioned as (side, id, v) triples and
    * folded by the ONE stateful operator, the windowed
    * [[graft.functions.RrfFuseAggExpr]] aggregation: both rankings
    * AND the fusion happen inside a single aggregation buffer (state
    * per open (window, query) = the lexical candidate map + a
    * probes×k-bounded semantic map), emitted on watermark close. The
    * naive composition is three stateful operators (two windowed
    * rankings + a stream-stream fusion join); this is one. Duplicate
    * semantic rows collapse by min (idempotent); duplicate lexical
    * term rows are deduped by streamQueryTerms' (win, query, term)
    * state exactly as in the packed server. Spec-pinned result-equal
    * to batch rrfFuse over the two stored-index servers.
    *
    * STATE BOUND (measured, sf10 soak): the lexical half of the
    * fusion buffer is an exact per-doc sum map — candidate-
    * proportional per open (window, query), because exact BM25 top-k
    * cannot truncate partial sums. At bounded vocabularies that map
    * is small and this one-operator form is the windowed-serving
    * contract; at corpus-scale posting lists (stopword-class terms ×
    * a 500k-doc tier) one buffer holds a corpus-shaped map and the
    * state path OOMs by construction. Past that point serve with
    * [[rrfFusionServeEachBatch]] — the zero-state micro-batch twin
    * whose sums run in spillable hash aggregation. */
  def streamingRrfFusionServe(queries: DataFrame, packed: DataFrame,
      stats: DataFrame, codeTable: DataFrame, coarse: DataFrame,
      books: DataFrame, m: Int, dim: Int, k: Int = 10, probes: Int = 2,
      qLen: Int = 5, windowDur: String = "1 minute",
      watermark: String = "1 hour"): DataFrame = {
    graft.functions.GraftFunctions.register(queries.sparkSession)
    val statsOne = broadcast(stats.withColumn("one", lit(1)))
    val textItems = streamQueryTerms(
        queries.select(col("query_id"), col("text"), col("event_ts")),
        qLen, windowDur, watermark)
      .join(packed, Seq("term"))
      .join(statsOne, Seq("one"))
      .select(col("win"), col("query_id"),
        transform(
          filter(col("members"), m => m.getField("doc_id") =!= col("query_id")),
          m => struct(
            lit(0L).as("side"),
            m.getField("doc_id").as("id"),
            bm25Ppm(m.getField("tf"), col("df"), m.getField("dl"),
              col("n_docs"), col("avgdl")).as("v"))).as("items"))
    val vecItems = Similarity.streamingAdcCandidates(
        queries.select(col("query_id").as("vec_id"), col("embedding"),
          col("event_ts")),
        codeTable, coarse, books, m, dim, k, probes, watermark)
      .select(window(col("event_ts"), windowDur).as("win"),
        col("q_id").as("query_id"),
        array(struct(lit(1L).as("side"), col("vec_id").as("id"),
          col("adist").as("v"))).as("items"))
    textItems.unionByName(vecItems)
      .groupBy(col("win").as("window"), col("query_id"))
      .agg(call_udf("graft_rrf_fuse", col("items"), lit(k)).as("top"))
      .select(col("window.start").as("win_start"), col("query_id"),
        posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("win_start"), col("query_id"),
        (col("pos") + 1).cast("long").as("rank"),
        col("t.doc_id").as("doc_id"), col("t.rrf_ppm").as("rrf_ppm"),
        when(col("t.rank_text") > 0, col("t.rank_text")).as("rank_text"),
        when(col("t.rank_vec") > 0, col("t.rank_vec")).as("rank_vec"))
  }

  /** The ZERO-STATE twin of [[streamingRrfFusionServe]] — the hybrid
    * serving configuration for CORPUS-SCALE posting lists. The
    * one-buffer form's fusion state is candidate-proportional per open
    * (window, query): BM25 totals are exact sums over every matched
    * posting row, so a stopword-class query at a 500k-doc tier holds a
    * corpus-sized map in ONE aggregation buffer — the sf10 soak OOMs
    * the state path by construction, not by accident (the buffer can
    * neither spill nor truncate without breaking exact top-k). Here
    * each batch-complete query micro-batch is answered inside
    * `foreachBatch` by the BATCH stored-index servers
    * ([[bm25TopKFromSegmentsPushed]] + [[Similarity.ivfPqTopKFromCodes]]
    * + [[rrfFuse]]): the per-doc sums run in Spark's SPILLABLE hash
    * aggregation, memory is bounded regardless of posting-list
    * length, and state held across batches is NONE. Trade: answers
    * come per micro-batch, not per event-time window — a replayed
    * query in a later batch is re-answered BYTE-IDENTICALLY (the
    * servers are deterministic), so downstream idempotence is an
    * upsert on query_id. Pick the one-buffer form at bounded
    * vocabularies (its state is the windowed-serving contract); pick
    * this past the point where candidate maps are corpus-shaped. */
  def rrfFusionServeEachBatch(queries: DataFrame, seg: IndexSegments,
      stats: DataFrame, codes: DataFrame, coarse: DataFrame,
      books: DataFrame, m: Int, dim: Int, k: Int = 10, probes: Int = 2,
      checkpoint: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow(),
      maxPushTerms: Int = 10000, maxQueriesPerSlice: Int = 512,
      boundsOpt: Option[DataFrame] = None)
      (sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    queries.writeStream
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            id: Long) =>
        val qb = b.toDF().dropDuplicates("query_id").localCheckpoint()
        // the MaxScore text half persists its per-batch SURVIVOR
        // frame (k-adjacent, never the candidate slice) — released
        // after the sink has materialized, so stream state across
        // batches stays NONE
        val temps = if (boundsOpt.isDefined) new TempCache else
          TempCache.noop
        try sink(rrfServeBatchAdaptive(seg, stats, codes, coarse, books,
          m, dim, qb, k, probes, maxPushTerms, maxQueriesPerSlice,
          boundsOpt, temps), id)
        finally temps.release()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()

  /** One hybrid query micro-batch with the [[bm25ServeBatchAdaptive]]
    * slice bounds: both halves AND the fusion are per-query
    * independent, so an oversized batch slices by query-id hash with
    * no result change — the text half keeps its pushed term set
    * inside the budget and the per-slice partial-sum volume stays
    * under the measured spill bound at any arrival batch size. */
  private[llm] def rrfServeBatchAdaptive(seg: IndexSegments,
      stats: DataFrame, codes: DataFrame, coarse: DataFrame,
      books: DataFrame, m: Int, dim: Int, qb: DataFrame, k: Int,
      probes: Int, maxPushTerms: Int,
      maxQueriesPerSlice: Int,
      boundsOpt: Option[DataFrame] = None,
      temps: TempCache = TempCache.noop): DataFrame = {
    def serveOne(slice: DataFrame): DataFrame = {
      val qt = queryTerms(slice.select(col("query_id").as("doc_id"),
        col("text")))
      val text = boundsOpt match {
        case Some(bounds) => bm25TopKFromSegmentsMaxScore(seg, bounds,
          stats, qt, k, maxPushTerms, temps)
        case None => bm25TopKFromSegmentsPushed(seg, stats, qt, k,
          maxPushTerms)
      }
      val vec = Similarity.ivfPqTopKFromCodes(codes,
          slice.select(col("query_id").as("vec_id"), col("embedding")),
          k, coarse, books, m, dim, probes)
        .select(col("q_id").as("query_id"), col("rank"),
          col("neighbor_id").as("doc_id"))
      rrfFuse(text, vec, k)
    }
    val nTerms = queryTerms(qb.select(col("query_id").as("doc_id"),
      col("text"))).select(col("term")).distinct().count()
    val groups = math.max(1, math.max(
      math.ceil(nTerms.toDouble / maxPushTerms).toInt,
      math.ceil(qb.count().toDouble / maxQueriesPerSlice).toInt))
    if (groups == 1) serveOne(qb)
    else (0 until groups).map(g => serveOne(
      qb.filter(pmod(col("query_id"), lit(groups)) === g)))
      .reduce(_.unionByName(_))
  }

  /** Per-micro-batch BM25 serving with the pushed-term stance — the
    * [[rrfFusionServeEachBatch]] shape applied to the (scoped) text
    * stream. The windowed stream-static form
    * ([[streamingBm25ServePacked]]) declares its static side ONCE, so
    * every micro-batch re-scans (and re-shuffles) the whole stored
    * postings frame regardless of which terms the batch actually
    * asks for — fine at bounded corpora, but the sf10 soak measured
    * the scoped drain falling 27 → 8 q/s across sf1→sf10 while the
    * BATCH scoped serve held flat, precisely because the batch path
    * pushes its bounded `In(term,…)` set into the stored scan
    * ([[bm25TopKFromSegmentsPushed]]). Here each batch-complete query
    * micro-batch is answered inside `foreachBatch` by
    * [[bm25TopKFromPostingsPushed]]: the batch's term set (bounded by
    * qLen × queries-per-trigger, the [[pushableTerms]] contract) lands
    * on the static scan as PushedFilters — partition pruning for a
    * scoped store, row-group pruning for term-clustered files — so
    * per-batch cost tracks the QUERY terms' postings, not the store.
    * Trade (the rrfFusionServeEachBatch contract): answers come per
    * micro-batch, not per event-time window; a replayed query is
    * re-answered byte-identically, so downstream idempotence is an
    * upsert on query_id.
    *
    * ADAPTIVE batching (round 13, from the measured sf10 trigger
    * sweep): a batch whose distinct term set exceeds the push budget
    * would fall back to an unpushed full-store scan — the sweep
    * showed exactly that cliff (q/s DROPPING as triggers coarsen once
    * the term set outgrows the budget). Queries score independently,
    * so an oversized batch is SPLIT into id-hash slices sized to keep
    * each slice's term set inside the budget, served pushed, and
    * unioned — result-identical (per-query top-k never crosses
    * slices), bounded driver state per slice, and the pushdown
    * survives ANY arrival batch size. */
  def bm25ServeEachBatch(queries: DataFrame, post: DataFrame,
      stats: DataFrame, k: Int = 10, checkpoint: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow(),
      maxPushTerms: Int = 10000)
      (sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    queries.writeStream
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            id: Long) =>
        val qb = b.toDF().dropDuplicates("query_id").localCheckpoint()
        sink(bm25ServeBatchAdaptive(post, stats, qb, k, maxPushTerms), id)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()

  /** One query micro-batch against a stored postings frame with the
    * push budget enforced by SPLITTING, not by falling back: when the
    * batch's distinct terms fit `maxPushTerms` this is exactly
    * [[bm25TopKFromPostingsPushed]]; past it, queries are sliced by
    * id hash into the fewest groups whose EXPECTED term sets fit, and
    * each slice serves pushed. A slice that still exceeds the budget
    * (pathological term skew) degrades to the safe unpushed plan for
    * that slice alone — result-identical in every path. */
  private[llm] def bm25ServeBatchAdaptive(post: DataFrame,
      stats: DataFrame, qb: DataFrame, k: Int,
      maxPushTerms: Int, maxQueriesPerSlice: Int = 512): DataFrame = {
    val qt = queryTerms(qb.select(col("query_id").as("doc_id"),
      col("text")))
    val nTerms = qt.select(col("term")).distinct().count()
    val nQueries = qb.count()
    // two slice bounds, both measured on the sf10 trigger sweep:
    // term count (past the push budget the slice falls back to an
    // unpushed full-store scan) and QUERY count (per-slice
    // (query, doc) partial-sum volume grows with queries × matched
    // postings, and past ~0.5-1k stopword-class queries the hash
    // aggregation tips into spill — 14.5 → 11.8 q/s at 505 → 1,262
    // queries per trigger on the 505k-doc tier)
    val groups = math.max(1, math.max(
      math.ceil(nTerms.toDouble / maxPushTerms).toInt,
      math.ceil(nQueries.toDouble / maxQueriesPerSlice).toInt))
    if (groups == 1) bm25TopKFromPostingsPushed(post, stats, qt, k,
      maxPushTerms)
    else
      (0 until groups).map { g =>
        val slice = qb.filter(
          pmod(col("query_id"), lit(groups)) === g)
        bm25TopKFromPostingsPushed(post, stats,
          queryTerms(slice.select(col("query_id").as("doc_id"),
            col("text"))), k, maxPushTerms)
      }.reduce(_.unionByName(_))
  }

  // ---- declared queries --------------------------------------------------

  private def docsOf(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "documents")

  /** The whole BM25 oracle chain with the query-set predicate
    * parameterized (the curate_rel gate-predicate stance: every other
    * CTE byte is shared, so variants cannot drift). `corpusPred`
    * scopes the CANDIDATE corpus and its df / n_docs / avgdl
    * statistics — a scoped index is the index of exactly that
    * sub-corpus (q_llm_bm25_scoped); the query set stays drawn from
    * the full documents table. Default TRUE = the unscoped family. */
  private def bm25CteFor(queryPred: String, corpusPred: String = "TRUE") =
    s"""WITH qt AS (
      |  SELECT DISTINCT query_id, term FROM (
      |    SELECT doc_id AS query_id,
      |      unnest((string_split(text, ' '))[1:5]) AS term
      |    FROM documents WHERE $queryPred)
      |), per_doc AS (
      |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |        FROM documents WHERE $corpusPred)
      |  GROUP BY doc_id, term
      |), dls AS (
      |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
      |  FROM documents WHERE $corpusPred
      |), slice AS (
      |  SELECT * FROM per_doc WHERE term IN (SELECT term FROM qt)
      |), dft AS (
      |  SELECT term, CAST(count(*) AS BIGINT) AS df FROM slice GROUP BY term
      |), stats AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(len(string_split(text, ' '))) AS DOUBLE)
      |      / CAST(count(*) AS DOUBLE) AS avgdl
      |  FROM documents WHERE $corpusPred
      |), cand AS (
      |  SELECT qt.query_id, s.doc_id,
      |    CAST(floor(
      |      ((CAST(n_docs - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
      |      * ((CAST(tf AS DOUBLE) * 2.2) /
      |         (CAST(tf AS DOUBLE) +
      |          (1.2 * (0.25 + (0.75 * (CAST(dl AS DOUBLE) / avgdl))))))
      |      * 1000000.0) AS BIGINT) AS ppm
      |  FROM slice s
      |    JOIN qt ON s.term = qt.term
      |    JOIN dft ON s.term = dft.term
      |    JOIN dls ON s.doc_id = dls.doc_id, stats
      |  WHERE s.doc_id != qt.query_id
      |), scoresum AS (
      |  SELECT query_id, doc_id, CAST(sum(ppm) AS BIGINT) AS score_ppm
      |  FROM cand GROUP BY query_id, doc_id
      |)""".stripMargin

  private val bm25Cte = bm25CteFor("doc_id % 50 = 0")

  /** Tier-FIXED query set: the workload a production serving tier has
    * — bounded queries against a growing corpus. `doc_id % 50 = 0`
    * alone makes the oracle query COUNT scale with the tier (at the
    * 100x tier that is ~10k queries x the whole corpus of candidates,
    * a quadratic verification artifact); capping at the base-tier id
    * range keeps exactly the sf0.001-tier 10 queries at every tier,
    * so serving cost grows linearly in postings and the 100x replay
    * stays feasible. */
  private val bm25CteFixed = bm25CteFor("doc_id % 50 = 0 AND doc_id < 500")

  private val bm25TailSql =
    """SELECT query_id,
      |  CAST(row_number() OVER (PARTITION BY query_id
      |    ORDER BY score_ppm DESC, doc_id) AS BIGINT) AS "rank",
      |  doc_id, score_ppm
      |FROM scoresum
      |QUALIFY "rank" <= 10
      |ORDER BY query_id, "rank"""".stripMargin

  /** BM25 end-to-end: deterministic short queries (first-5-token
    * distinct term sets of every 50th document) against the whole
    * corpus, top-10 per query. */
  val qBm25 = QuerySpec(
    "q_llm_bm25",
    (s, d) => {
      val docs = docsOf(s, d)
      bm25TopK(docs, docs.filter(pmod(col("doc_id"), lit(50)) === 0))
        .orderBy(col("query_id"), col("rank"))
    },
    Some(bm25Cte + "\n" + bm25TailSql))

  /** The stored-index deliverable, oracle'd end-to-end: the full
    * denormalized postings table. */
  val qBm25Index = QuerySpec(
    "q_llm_bm25_index",
    (s, d) =>
      postings(docsOf(s, d)).orderBy(col("term"), col("doc_id")),
    Some("""WITH per_doc AS (
           |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
           |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
           |        FROM documents)
           |  GROUP BY doc_id, term
           |), dls AS (
           |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
           |  FROM documents
           |), dft AS (
           |  SELECT term, CAST(count(*) AS BIGINT) AS df
           |  FROM per_doc GROUP BY term
           |)
           |SELECT p.term, p.doc_id, p.tf, dls.dl, dft.df
           |FROM per_doc p
           |  JOIN dls ON p.doc_id = dls.doc_id
           |  JOIN dft ON p.term = dft.term
           |ORDER BY p.term, p.doc_id""".stripMargin))

  /** The full-corpus SERVING segments: postings and the vocab df
    * table stored as co-bucketed (term) in-bucket-sorted warehouse
    * tables — repeated serving (and any term-keyed maintenance, e.g.
    * a vocab-too-big-to-broadcast denormalize) re-shuffles NOTHING
    * (RetrievalSpec pins the exchange-free shapes). Built once per
    * session per corpus ([[graft.sources.IndexStore.bucketedTable]]). */
  private[graft] def servingSegOf(s: SparkSession, d: String): IndexSegments = {
    val docs = docsOf(s, d)
    // lazy + by-name: the build (one corpus explode, shared persisted
    // per-doc frame) only runs when a table is actually missing
    lazy val seg = segBuild(docs)
    IndexSegments(
      graft.sources.IndexStore.bucketedTable(s, d, "srv_post", "term")(
        seg.postings),
      graft.sources.IndexStore.bucketedTable(s, d, "srv_df", "term")(
        seg.df),
      docs.select(col("doc_id")))
  }

  /** Serving from the STORED index (build → store → serve split):
    * segment state read from the term-bucketed warehouse tables,
    * scored without ever denormalizing — the query-term set and the
    * query-pruned df slice both broadcast onto the postings scan, so
    * the postings side plans with ZERO exchange (RetrievalSpec pins
    * it). Must be result-identical to the inline end-to-end chain, so
    * the q_llm_bm25 SQL verbatim checks both — the IVF-PQ codes/serve
    * pattern applied to text. */
  val qBm25Serve = QuerySpec(
    "q_llm_bm25_serve",
    (s, d) => {
      val docs = docsOf(s, d)
      bm25TopKFromSegmentsPushed(servingSegOf(s, d), corpusStats(docs),
        queryTerms(docs.filter(pmod(col("doc_id"), lit(50)) === 0)))
        .orderBy(col("query_id"), col("rank"))
    },
    qBm25.oracle)

  /** Tier-fixed twin of q_llm_bm25_serve (the q_llm_bm25_fixed
    * stance): the SAME stored-segment serving chain with the query
    * set capped to the base-tier id range, so the serving oracle
    * stays replayable at the 100× tier. Shares the parameterized CTE
    * prefix with every other BM25 variant. */
  val qBm25ServeFixed = QuerySpec(
    "q_llm_bm25_serve_fixed",
    (s, d) => {
      val docs = docsOf(s, d)
      bm25TopKFromSegmentsPushed(servingSegOf(s, d), corpusStats(docs),
        queryTerms(docs.filter(pmod(col("doc_id"), lit(50)) === 0 &&
          col("doc_id") < 500)))
        .orderBy(col("query_id"), col("rank"))
    },
    Some(bm25CteFixed + "\n" + bm25TailSql))

  /** The stored [[termBounds]] table for the full-corpus serving
    * segments — vocab-sized, term-bucketed beside srv_post/srv_df so
    * the whole serving-state trio shares one warehouse layout. */
  private[graft] def servingBoundsOf(s: SparkSession,
      d: String): DataFrame =
    graft.sources.IndexStore.bucketedTable(s, d, "srv_bounds", "term")(
      termBounds(servingSegOf(s, d).postings))

  /** MaxScore-pruned exact serving (round 14): the
    * [[bm25TopKFromSegmentsMaxScore]] two-phase bound prune over the
    * SAME stored segments and tier-fixed query set as
    * q_llm_bm25_serve_fixed, sharing its oracle VERBATIM — the
    * exactness claim (top-k identical to exhaustive scoring) is
    * hash-checked cross-engine, not just spec-asserted. The pruning
    * economics (skipped posting fraction, sf10 q/s) are StreamSoak's
    * `hybridfbms` row. */
  val qBm25MaxScore = QuerySpec(
    "q_llm_bm25_maxscore",
    (s, d) => {
      val docs = docsOf(s, d)
      bm25TopKFromSegmentsMaxScore(servingSegOf(s, d),
        servingBoundsOf(s, d), corpusStats(docs),
        queryTerms(docs.filter(pmod(col("doc_id"), lit(50)) === 0 &&
          col("doc_id") < 500)))
        .orderBy(col("query_id"), col("rank"))
    },
    Some(bm25CteFixed + "\n" + bm25TailSql))

  /** Attribute-SCOPED BM25 serving — restrict retrieval to one scope
    * of a document attribute (here lang='en'), scored against the
    * SCOPE's own statistics: the stored index is partitioned by the
    * attribute ([[scopedPostings]] via
    * [[graft.sources.IndexStore.partitionedParquet]]), so the scope
    * predicate prunes whole partition directories at plan time
    * (PlanSpec pins PartitionFilters) and serving equals BM25 over an
    * index that only ever contained the matching documents
    * (RetrievalSpec pins that equivalence against [[bm25TopK]] on the
    * filtered corpus). The tier-fixed query set stays drawn from the
    * FULL corpus — queries are external to the scope, candidates are
    * not. Low-cardinality attr ⇒ partition layout here;
    * high-cardinality ⇒ the attribute-embedded row layout
    * (q_llm_ann_filtered). */
  /** The stored scoped serving state shared by q_llm_bm25_scoped, the
    * scoped fusion, and the streaming soak (one builder so the
    * variants cannot drift): lang-PARTITIONED postings — the scope
    * predicate prunes whole directories at plan time — with rows
    * term-SORTED within each written file, so a pushed `In(term,…)`
    * set also prunes row groups INSIDE the scope (already-promoted
    * generations keep serving unsorted; the sort only shapes fresh
    * builds). */
  private[graft] def scopedPostStoredOf(s: SparkSession,
      d: String): DataFrame =
    graft.sources.IndexStore.partitionedParquet(s, d,
      "srv_post_scoped_lang", "lang")(
      scopedPostings(docsOf(s, d), "lang")
        .sortWithinPartitions(col("lang"), col("term")))

  private[graft] def scopedStatsStoredOf(s: SparkSession,
      d: String): DataFrame =
    graft.sources.IndexStore.parquet(s, d, "srv_stats_scoped_lang")(
      scopedStats(docsOf(s, d), "lang"))

  val qBm25Scoped = QuerySpec(
    "q_llm_bm25_scoped",
    (s, d) => {
      val docs = docsOf(s, d)
      val post = scopedPostStoredOf(s, d)
      val stats = scopedStatsStoredOf(s, d)
      val qt = queryTerms(docs.filter(pmod(col("doc_id"), lit(50)) === 0 &&
        col("doc_id") < 500))
      bm25TopKFromPostings(
        post.filter(col("lang") === "en")
          .select(col("term"), col("doc_id"), col("tf"), col("dl"),
            col("df")),
        stats.filter(col("lang") === "en")
          .select(col("n_docs"), col("avgdl")),
        qt)
        .orderBy(col("query_id"), col("rank"))
    },
    Some(bm25CteFor("doc_id % 50 = 0 AND doc_id < 500",
      corpusPred = "lang = 'en'") + "\n" + bm25TailSql))

  /** The en scope of the lang-scoped store MAINTAINED as per-scope
    * generation-log state ([[graft.streaming.NightlyMaintenance
    * .mergeScopedBatch]]: gen 0 = the base slice routed by lang,
    * gen 1 = the catch-up over the whole corpus), built once per
    * corpus content, served PINNED at readAt(scope, 1) — the
    * [[pinnedUnifiedOf]] stance applied to scopes, closing the gap
    * between "scoped artifact built in-session" (q_llm_bm25_scoped)
    * and "serving the nightly-maintained scoped state". */
  private def pinnedScopeOf(s: SparkSession, d: String,
      value: String): IndexSegments = {
    import graft.streaming.{IndexMaintenance, NightlyMaintenance}
    val root = graft.sources.IndexStore.maintainedRoot(s, d,
      "maint_scoped_lang") { dir =>
      val docs = docsOf(s, d)
        .select(col("doc_id"), col("text"), col("lang"))
      NightlyMaintenance.mergeScopedBatch(dir, "lang")(
        docs.filter(col("doc_id") < 500), 0L)
      NightlyMaintenance.mergeScopedBatch(dir, "lang")(docs, 1L)
    }
    IndexMaintenance.readAt(s,
      NightlyMaintenance.scopeDir(root, "lang", value), 1L).getOrElse(
      throw new IllegalStateException(
        s"pinned scoped state missing under $root for lang=$value"))
  }

  /** q_llm_bm25_scoped SERVED FROM THE MAINTAINED PER-SCOPE STORE,
    * PINNED: ranking runs off the en scope's generation-log state at
    * readAt(scope, 1) — byte-stable under concurrent merges and
    * compactions (the q_llm_retrieval_eval_pinned stance applied to
    * scopes) — with the scope's stored statistics and the pushed
    * bounded term set. In-scope df/n_docs/avgdl are structural: the
    * scope's log only ever saw its own documents. Oracle = the scoped
    * SQL verbatim (the pin covers the full corpus by construction, so
    * the maintained state must be result-identical to the one-shot
    * scoped index). */
  val qBm25ScopedPinned = QuerySpec(
    "q_llm_bm25_scoped_pinned",
    (s, d) => {
      val docs = docsOf(s, d)
      val seg = pinnedScopeOf(s, d, "en")
      val stats = scopedStatsStoredOf(s, d)
        .filter(col("lang") === "en")
        .select(col("n_docs"), col("avgdl"))
      val qt = queryTerms(docs.filter(pmod(col("doc_id"), lit(50)) === 0 &&
        col("doc_id") < 500))
      bm25TopKFromSegmentsPushed(seg, stats, qt)
        .orderBy(col("query_id"), col("rank"))
    },
    qBm25Scoped.oracle)

  /** The tier-FIXED serving workload: the SAME end-to-end chain with
    * the query set capped to the base-tier id range (10 queries at
    * every tier), so serving cost grows linearly in postings as the
    * corpus expands — the configuration whose oracle stays feasible
    * (and is verified) at the 100× tier, where the %50 set's query
    * count growing with the corpus makes q_llm_bm25's replay a
    * quadratic verification artifact. */
  val qBm25Fixed = QuerySpec(
    "q_llm_bm25_fixed",
    (s, d) => {
      val docs = docsOf(s, d)
      bm25TopK(docs, docs.filter(pmod(col("doc_id"), lit(50)) === 0 &&
        col("doc_id") < 500))
        .orderBy(col("query_id"), col("rank"))
    },
    Some(bm25CteFixed + "\n" + bm25TailSql))

  /** The stored segment state for the `_inc` family: everything BUT
    * the fixed base slice (tier-sized — the production shape: a large
    * stored index, a bounded nightly delta), materialized to parquet
    * once per corpus so the merge queries measure the MERGE, not an
    * in-plan rebuild of the stored side (the round-9 bench caveat). */
  private def storedSegOf(s: SparkSession, d: String,
      unified: Boolean): IndexSegments = {
    val name = if (unified) "seg_unified" else "seg_bm25"
    // lazy + by-name (the servingSegOf stance): the build — and its
    // CacheManager persist registration — only happens when a parquet
    // cache is actually missing, not on every plan construction
    lazy val seg =
      if (unified) segBuildUnified(docsOf(s, d).filter(col("doc_id") >= 400))
      else segBuild(docsOf(s, d).filter(col("doc_id") >= 400))
    IndexSegments(
      graft.sources.IndexStore.parquet(s, d, s"$name/postings")(seg.postings),
      graft.sources.IndexStore.parquet(s, d, s"$name/df")(seg.df),
      graft.sources.IndexStore.parquet(s, d, s"$name/doc_ids")(seg.docIds))
  }

  /** The nightly index-merge job, oracle'd through the FULL-build SQL:
    * the stored segments (every doc outside the fixed base slice,
    * read from [[graft.sources.IndexStore]] — tier-sized) merged with
    * a FIXED-size delta (doc_id < 500, overlapping the stored range
    * for the idempotency leg) must equal a from-scratch build of the
    * whole corpus. The merge itself touches only delta + vocab +
    * manifest frames; the denormalized view this query emits for
    * verification is a read-time broadcast join — a streamed scan of
    * the stored postings with zero exchange. */
  val qBm25Inc = QuerySpec(
    "q_llm_bm25_inc",
    (s, d) => {
      val docs = docsOf(s, d)
      segDenormalize(segMerge(storedSegOf(s, d, unified = false),
        docs.filter(col("doc_id") < 500)))
        .orderBy(col("term"), col("doc_id"))
    },
    qBm25Index.oracle)

  /** The merge's WRITE SET — what the nightly job actually persists:
    * fresh postings under the merged corpus-wide df. Delta + vocab
    * sized at EVERY tier (the fresh slice is the fixed base ids), so
    * this is the ladder row that must stay flat as the stored corpus
    * grows 10×. Oracle: the full-build chain restricted to the fresh
    * ids — corpus-wide df values on delta-only rows. */
  val qBm25IncDelta = QuerySpec(
    "q_llm_bm25_inc_delta",
    (s, d) => {
      val docs = docsOf(s, d)
      segMergeWriteSet(storedSegOf(s, d, unified = false),
        docs.filter(col("doc_id") < 500))
        .orderBy(col("term"), col("doc_id"))
    },
    qBm25Index.oracle.map(_.replace("ORDER BY p.term, p.doc_id",
      "WHERE p.doc_id < 400\nORDER BY p.term, p.doc_id")))

  /** The unified one-scan index build, oracle'd end-to-end: BM25
    * postings columns and positional lists from a single corpus
    * pass. */
  val qIndexUnified = QuerySpec(
    "q_llm_index_unified",
    (s, d) =>
      buildIndexes(docsOf(s, d))
        .select(col("term"), col("doc_id"), col("tf"), col("dl"),
          col("df"), array_join(col("positions"), ",").as("positions"))
        .orderBy(col("term"), col("doc_id")),
    Some("""WITH pos AS (
           |  SELECT doc_id, toks[i] AS term, i, len(toks) AS dl
           |  FROM (SELECT doc_id, string_split(text, ' ') AS toks
           |        FROM documents) t,
           |  LATERAL (SELECT unnest(range(1, len(toks) + 1)) AS i) x
           |), pd AS (
           |  SELECT doc_id, term, CAST(max(dl) AS BIGINT) AS dl,
           |    CAST(count(*) AS BIGINT) AS tf,
           |    list_sort(list(i)) AS positions
           |  FROM pos GROUP BY doc_id, term
           |), dft AS (
           |  SELECT term, CAST(count(*) AS BIGINT) AS df
           |  FROM pd GROUP BY term
           |)
           |SELECT pd.term, pd.doc_id, pd.tf, pd.dl, dft.df,
           |  array_to_string(pd.positions, ',') AS positions
           |FROM pd JOIN dft ON pd.term = dft.term
           |ORDER BY pd.term, pd.doc_id""".stripMargin))

  /** The unified index's nightly merge, oracle'd through the
    * full-build SQL (the q_llm_bm25_inc stance: stored segments from
    * [[graft.sources.IndexStore]], fixed-size delta, read-time
    * broadcast denormalize for verification only). */
  val qIndexUnifiedInc = QuerySpec(
    "q_llm_index_unified_inc",
    (s, d) => {
      val docs = docsOf(s, d)
      segDenormalize(segMergeUnified(storedSegOf(s, d, unified = true),
        docs.filter(col("doc_id") < 500)))
        .select(col("term"), col("doc_id"), col("tf"), col("dl"),
          col("df"), array_join(col("positions"), ",").as("positions"))
        .orderBy(col("term"), col("doc_id"))
    },
    qIndexUnified.oracle)

  /** The unified merge's write set (q_llm_bm25_inc_delta's stance,
    * positions riding the fresh rows). */
  val qIndexUnifiedIncDelta = QuerySpec(
    "q_llm_index_unified_inc_delta",
    (s, d) => {
      val docs = docsOf(s, d)
      segMergeWriteSet(storedSegOf(s, d, unified = true),
        docs.filter(col("doc_id") < 500), positional = true)
        .select(col("term"), col("doc_id"), col("tf"), col("dl"),
          col("df"), array_join(col("positions"), ",").as("positions"))
        .orderBy(col("term"), col("doc_id"))
    },
    qIndexUnified.oracle.map(_.replace("ORDER BY pd.term, pd.doc_id",
      "WHERE pd.doc_id < 400\nORDER BY pd.term, pd.doc_id")))

  /** Retrieval eval card: the tier-fixed BM25 top-10 scored against
    * exact-phrase relevance (documents containing the query's leading
    * 2-token phrase — a deterministic, engine-independent relevance
    * definition). Oracle'd end-to-end by composing the BM25 and
    * positional-index CTE chains (no name collisions: the two chains
    * were built disjoint). */
  val qRetrievalEval = QuerySpec(
    "q_llm_retrieval_eval",
    (s, d) => {
      val docs = docsOf(s, d)
      val fixed = docs.filter(pmod(col("doc_id"), lit(50)) === 0 &&
        col("doc_id") < 500)
      val phr = phrasesOf(docs)
      val rel = phraseSearch(
        termPushed(servingPosOf(s, d), pairTerms(phr)), phr)
        .select(col("query_id"), col("doc_id"))
      retrievalEval(bm25TopK(docs, fixed), rel)
        .orderBy(col("query_id"))
    },
    Some(bm25CteFixed + ", " + posCtes.stripPrefix("WITH ") + """, phr AS (
           |  SELECT doc_id AS query_id,
           |    (string_split(text, ' '))[1] AS t1,
           |    (string_split(text, ' '))[2] AS t2
           |  FROM documents WHERE doc_id % 50 = 0 AND doc_id < 500
           |), r1 AS (
           |  SELECT phr.query_id, pp.doc_id, pp.positions AS pos1
           |  FROM phr JOIN pp ON pp.term = phr.t1
           |), r2 AS (
           |  SELECT phr.query_id, pp.doc_id, pp.positions AS pos2
           |  FROM phr JOIN pp ON pp.term = phr.t2
           |), rel AS (
           |  SELECT r1.query_id, r1.doc_id
           |  FROM r1 JOIN r2
           |    ON r1.query_id = r2.query_id AND r1.doc_id = r2.doc_id
           |  WHERE r1.doc_id != r1.query_id
           |    AND len(list_intersect(pos1,
           |      list_transform(pos2, x -> x - 1))) > 0
           |), trank AS (
           |  SELECT query_id, doc_id,
           |    CAST(row_number() OVER (PARTITION BY query_id
           |      ORDER BY score_ppm DESC, doc_id) AS BIGINT) AS rnk
           |  FROM scoresum QUALIFY rnk <= 10
           |), relns AS (
           |  SELECT query_id, CAST(count(*) AS BIGINT) AS n_rel
           |  FROM rel GROUP BY query_id
           |), hit AS (
           |  SELECT t.query_id,
           |    CAST(sum(CASE WHEN r.doc_id IS NOT NULL THEN 1 ELSE 0 END)
           |      AS BIGINT) AS hits_at_k,
           |    min(CASE WHEN r.doc_id IS NOT NULL THEN t.rnk END)
           |      AS first_rank
           |  FROM trank t LEFT JOIN rel r
           |    ON t.query_id = r.query_id AND t.doc_id = r.doc_id
           |  GROUP BY t.query_id
           |)
           |SELECT coalesce(h.query_id, relns.query_id) AS query_id,
           |  CAST(coalesce(relns.n_rel, 0) AS BIGINT) AS n_rel,
           |  CAST(coalesce(h.hits_at_k, 0) AS BIGINT) AS hits_at_k,
           |  CAST(coalesce(h.first_rank, 0) AS BIGINT) AS first_rank,
           |  CAST(coalesce(1000000 // h.first_rank, 0) AS BIGINT) AS rr_ppm
           |FROM hit h FULL OUTER JOIN relns ON h.query_id = relns.query_id
           |ORDER BY query_id""".stripMargin))

  /** The unified index MAINTAINED as committed generation-log state
    * (gen 0 = the base-tier slice, gen 1 = the catch-up over the whole
    * corpus — mergeBatch's manifest anti join keeps only the fresh
    * docs), built once per corpus content under
    * [[graft.sources.IndexStore.maintainedRoot]]. The serving read is
    * PINNED: [[graft.streaming.IndexMaintenance.readAt]](root, 1) —
    * the as-of-batch-1 state, which a concurrent compaction or a
    * later merge never changes (RetrievalStreamSpec proves the
    * byte-stability end-to-end). */
  private def pinnedUnifiedOf(s: SparkSession, d: String): IndexSegments = {
    import graft.streaming.IndexMaintenance
    val root = graft.sources.IndexStore.maintainedRoot(s, d,
      "maint_unified") { dir =>
      val docs = docsOf(s, d)
      IndexMaintenance.mergeBatch(dir)(docs.filter(col("doc_id") < 500), 0L)
      IndexMaintenance.mergeBatch(dir)(docs, 1L)
    }
    IndexMaintenance.readAt(s, root, 1L).getOrElse(
      throw new IllegalStateException(
        s"pinned unified state missing under $root"))
  }

  /** The eval card SERVED OFF A PINNED INDEX STATE — the
    * serve-during-maintenance configuration: both the BM25 ranking
    * AND the phrase-relevance side read the generation-log state
    * pinned at readAt(root, 1) (which covers the full corpus by
    * construction), so a concurrent nightly merge or compaction
    * cannot perturb a running evaluation. Oracle = the same composed
    * SQL as [[qRetrievalEval]]: the pinned state must be
    * result-identical to the live full-corpus index. */
  val qRetrievalEvalPinned = QuerySpec(
    "q_llm_retrieval_eval_pinned",
    (s, d) => {
      val docs = docsOf(s, d)
      val fixed = docs.filter(pmod(col("doc_id"), lit(50)) === 0 &&
        col("doc_id") < 500)
      val pinned = pinnedUnifiedOf(s, d)
      val phr = phrasesOf(docs)
      val rel = phraseSearch(
        termPushed(pinned.postings
          .select(col("term"), col("doc_id"), col("positions")),
          pairTerms(phr)), phr)
        .select(col("query_id"), col("doc_id"))
      retrievalEval(
        bm25TopKFromSegmentsPushed(pinned, corpusStats(docs),
          queryTerms(fixed)),
        rel)
        .orderBy(col("query_id"))
    },
    qRetrievalEval.oracle)

  /** Hybrid search: RRF-fuse the BM25 top-10 with the embedding cosine
    * top-10 for the same query ids (vec_id = doc_id contract), pure
    * integer scores. The cosine side reuses q_llm_cosine_topk's
    * bit-exact IEEE replay. The Spark plan and the oracle SQL are both
    * parameterized on the query predicate alone (the bm25CteFor
    * stance), so the %50 and tier-fixed variants cannot drift. */
  private def rrfFusionPlan(s: SparkSession, d: String,
      fixed: Boolean): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val docs = docsOf(s, d)
    def pred(c: Column) = if (fixed) pmod(c, lit(50)) === 0 && c < 500
      else pmod(c, lit(50)) === 0
    val text = bm25TopK(docs, docs.filter(pred(col("doc_id"))))
    val vs = Tables.load(s, d, "embeddings")
      .select(col("vec_id"), col("embedding"),
        Similarity.norm(col("embedding")).as("nrm"))
    val vec = Similarity.cosineTopK(vs,
        vs.filter(pred(col("vec_id"))), k = 10)
      .select(col("q_id").as("query_id"), col("rank"),
        col("neighbor_id").as("doc_id"))
    rrfFuse(text, vec).orderBy(col("query_id"), col("rank"))
  }

  val qRrfFusion = QuerySpec(
    "q_llm_rrf_fusion",
    (s, d) => rrfFusionPlan(s, d, fixed = false),
    Some(rrfSqlFor(bm25Cte, "vec_id % 50 = 0")))

  /** Tier-fixed twin of q_llm_rrf_fusion (the bm25_fixed stance):
    * both rankings' query sets capped to the base-tier id range, so
    * the whole serving + fusion family is 100×-replayable. */
  val qRrfFusionFixed = QuerySpec(
    "q_llm_rrf_fusion_fixed",
    (s, d) => rrfFusionPlan(s, d, fixed = true),
    Some(rrfSqlFor(bm25CteFixed, "vec_id % 50 = 0 AND vec_id < 500")))

  /** Hybrid search served ENTIRELY from the STORED indexes — the
    * production nightly configuration: the text ranking reads the
    * term-bucketed warehouse segment tables ([[servingSegOf]], zero
    * postings-side exchange) and the semantic ranking probes the
    * MATERIALIZED IVF-PQ code table ([[Similarity.storedCodesOf]],
    * probes = 2 — candidates come from probed inverted lists only,
    * never a corpus-wide cosine scan), fused by the same integer RRF.
    * This is the configuration q_llm_rrf_fusion's exact-cosine side
    * cannot scale to (its cost is linear in corpus per query set);
    * here the semantic side is probed-list-sized, so the whole hybrid
    * chain inherits the flat serving economics of its two stored
    * halves. The exact-cosine fusion forms remain as the recall/eval
    * harness they are. Tier-fixed query set (the bm25_fixed stance),
    * so the oracle replays at the 100× tier. */
  val qRrfFusionServe = QuerySpec(
    "q_llm_rrf_fusion_serve",
    (s, d) => {
      graft.functions.GraftFunctions.register(s)
      val docs = docsOf(s, d)
      def pred(c: Column) = pmod(c, lit(50)) === 0 && c < 500
      val text = bm25TopKFromSegmentsPushed(servingSegOf(s, d),
        corpusStats(docs), queryTerms(docs.filter(pred(col("doc_id")))))
      val (codes, coarse, books) = Similarity.storedCodesOf(s, d)
      val vs = Tables.load(s, d, "embeddings")
      val vec = Similarity.ivfPqTopKFromCodes(codes,
          vs.filter(pred(col("vec_id"))), k = 10, coarse, books,
          m = 4, dim = 64, probes = 2)
        .select(col("q_id").as("query_id"), col("rank"),
          col("neighbor_id").as("doc_id"))
      rrfFuse(text, vec).orderBy(col("query_id"), col("rank"))
    },
    Some(rrfServeSql))

  /** The round-12 capstone composition: hybrid search where BOTH
    * stored halves carry a predicate — the text ranking reads the
    * lang-scoped partition of the scoped index (q_llm_bm25_scoped's
    * layout: directory pruning + in-scope statistics) and the semantic
    * ranking serves the label-filtered attribute-embedded code table
    * (q_llm_ann_filtered's layout: row-group pruning, zero serve-time
    * joins), fused by the same integer RRF. The production shape of
    * "search English docs, among vectors licensed for training": every
    * predicate lands on a stored-index scan, so the fusion inherits
    * BOTH pruned floors. Oracle composes the two standalone halves'
    * SQL through the shared builders. */
  val qRrfFusionScoped = QuerySpec(
    "q_llm_rrf_fusion_scoped",
    (s, d) => {
      graft.functions.GraftFunctions.register(s)
      val docs = docsOf(s, d)
      def pred(c: Column) = pmod(c, lit(50)) === 0 && c < 500
      val post = scopedPostStoredOf(s, d)
      val stats = scopedStatsStoredOf(s, d)
      val text = bm25TopKFromPostings(
        post.filter(col("lang") === "en")
          .select(col("term"), col("doc_id"), col("tf"), col("dl"),
            col("df")),
        stats.filter(col("lang") === "en")
          .select(col("n_docs"), col("avgdl")),
        queryTerms(docs.filter(pred(col("doc_id")))))
      val (codes, coarse, books) = Similarity.storedCodesOf(s, d)
      val vs = Tables.load(s, d, "embeddings")
      val vec = Similarity.ivfPqTopKFromCodes(
          codes.filter(col("label") === 1),
          vs.filter(pred(col("vec_id"))), k = 10, coarse, books,
          m = 4, dim = 64, probes = 2)
        .select(col("q_id").as("query_id"), col("rank"),
          col("neighbor_id").as("doc_id"))
      rrfFuse(text, vec).orderBy(col("query_id"), col("rank"))
    },
    Some(rrfServeScopedSql))

  /** The serving-matrix diagonal (round 14): scoped text × REFINED
    * filtered ANN — the q_llm_rrf_fusion_scoped composition with the
    * semantic half upgraded to the two-stage retrieve-then-rerank
    * serve (q_llm_ann_refine_filtered's chain: label-filtered ADC
    * candidates at k·refine, exact integer-L2 re-rank to k). Both
    * predicates still land on stored scans; the exact pass touches
    * only the bounded candidate pool, so the composed plan inherits
    * every floor it is built from. Oracle = the scoped fusion SQL
    * with its vrank block swapped for the refine tail — all three
    * surgeries (scope, label, refine) compose on the same shared
    * builders, so the row can never drift from its standalone
    * halves. */
  val qRrfFusionScopedRefined = QuerySpec(
    "q_llm_rrf_fusion_scoped_refined",
    (s, d) => {
      graft.functions.GraftFunctions.register(s)
      val docs = docsOf(s, d)
      def pred(c: Column) = pmod(c, lit(50)) === 0 && c < 500
      val post = scopedPostStoredOf(s, d)
      val stats = scopedStatsStoredOf(s, d)
      val text = bm25TopKFromPostings(
        post.filter(col("lang") === "en")
          .select(col("term"), col("doc_id"), col("tf"), col("dl"),
            col("df")),
        stats.filter(col("lang") === "en")
          .select(col("n_docs"), col("avgdl")),
        queryTerms(docs.filter(pred(col("doc_id")))))
      val (codes, coarse, books) = Similarity.storedCodesOf(s, d)
      val vs = Tables.load(s, d, "embeddings")
      val vec = Similarity.ivfPqTopKRefined(
          codes.filter(col("label") === 1),
          vs.filter(pred(col("vec_id"))), vs, k = 10, refine = 3,
          coarse, books, m = 4, dim = 64, probes = 2)
        .select(col("q_id").as("query_id"), col("rank"),
          col("neighbor_id").as("doc_id"))
      rrfFuse(text, vec).orderBy(col("query_id"), col("rank"))
    },
    Some {
      val anchor =
        """), vrank AS (
          |  SELECT q_id AS query_id, vec_id AS doc_id,
          |    CAST(row_number() OVER (PARTITION BY q_id
          |      ORDER BY adist, vec_id) AS BIGINT) AS rank_vec
          |  FROM ivadist QUALIFY rank_vec <= 10""".stripMargin
      require(rrfServeScopedSql.contains(anchor),
        "scoped fusion oracle shape changed under " +
          "q_llm_rrf_fusion_scoped_refined — update the vrank anchor")
      rrfServeScopedSql.replace(anchor,
        """), ivcand AS (
          |  SELECT q_id, vec_id FROM ivadist
          |  QUALIFY row_number() OVER (PARTITION BY q_id
          |    ORDER BY adist, vec_id) <= 30
          |), ivrefined AS (
          |  SELECT c.q_id, c.vec_id,
          |    list_reduce(list_prepend(CAST(0 AS BIGINT),
          |      list_transform(list_zip(v.qfull, u.qfull),
          |        z -> CAST(z[1] - z[2] AS BIGINT) * (z[1] - z[2]))),
          |      (a, x) -> a + x) AS d
          |  FROM ivcand c
          |  JOIN ivq v ON c.vec_id = v.vec_id
          |  JOIN ivq u ON c.q_id = u.vec_id
          |), vrank AS (
          |  SELECT q_id AS query_id, vec_id AS doc_id,
          |    CAST(row_number() OVER (PARTITION BY q_id
          |      ORDER BY d, vec_id) AS BIGINT) AS rank_vec
          |  FROM ivrefined QUALIFY rank_vec <= 10""".stripMargin)
    })

  private def rrfSqlFor(bmCte: String, vqPred: String): String =
    bmCte.replace("WITH qt AS (", s"""WITH v AS (
      |  SELECT vec_id, embedding,
      |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |      list_transform(embedding, x -> CAST(x*x AS DOUBLE))),
      |      (acc, p) -> acc + p)) AS nrm
      |  FROM embeddings
      |), vq AS (SELECT * FROM v WHERE $vqPred),
      |vscored AS (
      |  SELECT vq.vec_id AS query_id, c.vec_id AS doc_id,
      |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |      list_transform(list_zip(c.embedding, vq.embedding),
      |        z -> CAST(z[1]*z[2] AS DOUBLE))),
      |      (acc, p) -> acc + p) / (c.nrm * vq.nrm) AS cos
      |  FROM v c, vq WHERE c.vec_id != vq.vec_id
      |), vrank AS (
      |  SELECT query_id, doc_id,
      |    CAST(row_number() OVER (PARTITION BY query_id
      |      ORDER BY cos DESC, doc_id) AS BIGINT) AS rank_vec
      |  FROM vscored QUALIFY rank_vec <= 10
      |), qt AS (""".stripMargin) + """,
      |trank AS (
      |  SELECT query_id, doc_id,
      |    CAST(row_number() OVER (PARTITION BY query_id
      |      ORDER BY score_ppm DESC, doc_id) AS BIGINT) AS rank_text
      |  FROM scoresum QUALIFY rank_text <= 10
      |), fused AS (
      |  SELECT coalesce(t.query_id, v.query_id) AS query_id,
      |    coalesce(t.doc_id, v.doc_id) AS doc_id,
      |    coalesce(1000000 // (60 + t.rank_text), 0)
      |      + coalesce(1000000 // (60 + v.rank_vec), 0) AS rrf_ppm,
      |    t.rank_text, v.rank_vec
      |  FROM trank t FULL OUTER JOIN vrank v
      |    ON t.query_id = v.query_id AND t.doc_id = v.doc_id
      |)
      |SELECT query_id,
      |  CAST(row_number() OVER (PARTITION BY query_id
      |    ORDER BY rrf_ppm DESC, doc_id) AS BIGINT) AS "rank",
      |  doc_id, rrf_ppm, rank_text, rank_vec
      |FROM fused
      |QUALIFY "rank" <= 10
      |ORDER BY query_id, "rank"""".stripMargin

  /** The q_llm_ivfpq_ann_p2 oracle chain, iv-prefixed so its CTE names
    * stay disjoint from the BM25 chain's, with the query-side probe
    * slice on the tier-fixed predicate and k = 10 — composed with
    * [[bm25CteFixed]] and the RRF tail into the stored-stored hybrid
    * oracle. Every scoring byte matches the standalone IVF-PQ and BM25
    * oracles (the shared-CTE-prefix discipline), so the fusion cannot
    * drift from its two halves. */
  private lazy val rrfServeSql = rrfServeSqlFor(bm25CteFixed)

  /** The scoped+filtered hybrid's oracle: the SAME stored-stored
    * fusion chain with the text half scoped (corpusPred) and the
    * semantic half's candidates restricted by the attribute predicate
    * — both derived from the shared builders (guarded surgery, the
    * qAnnFiltered discipline) so the composed oracle can never drift
    * from its two standalone halves. */
  private lazy val rrfServeScopedSql = {
    val base = rrfServeSqlFor(bm25CteFor(
      "doc_id % 50 = 0 AND doc_id < 500", corpusPred = "lang = 'en'"))
    val anchor = "  WHERE c.vec_id != q.q_id"
    require(base.contains(anchor),
      "rrf serve oracle shape changed under q_llm_rrf_fusion_scoped — " +
        "update the filtered anchor")
    base.replace(anchor,
      "  JOIN embeddings attr ON c.vec_id = attr.vec_id\n" +
        "  WHERE c.vec_id != q.q_id AND attr.label = 1")
  }

  private def rrfServeSqlFor(bmCte: String): String =
    bmCte + """, ivq AS (
      |  SELECT vec_id,
      |    CASE WHEN list_max(list_transform(embedding, x -> abs(x))) = 0
      |      THEN list_transform(embedding, x -> 0)
      |      ELSE list_transform(embedding, x -> CAST(floor(
      |        CAST(x AS DOUBLE) /
      |        CAST(list_max(list_transform(embedding, y -> abs(y))) AS DOUBLE)
      |        * 127.0 + 0.5) AS INTEGER))
      |    END AS qfull
      |  FROM embeddings
      |), ivcoarse AS (
      |  SELECT vec_id AS c_id, qfull AS c_q FROM ivq WHERE vec_id % 100 = 0
      |), ivcscore AS (
      |  SELECT q.vec_id, q.qfull, c.c_id, c.c_q,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(list_zip(q.qfull, c.c_q),
      |        z -> CAST(z[1] - z[2] AS BIGINT) * (z[1] - z[2]))),
      |      (a, x) -> a + x) AS dist
      |  FROM ivq q, ivcoarse c
      |), ivassigned AS (
      |  SELECT vec_id, qfull, c_id AS list_id, c_q AS list_q FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id
      |      ORDER BY dist, c_id) AS rn FROM ivcscore) WHERE rn = 1
      |), ivrsub AS (
      |  SELECT vec_id, list_id, j.sub_id,
      |    (list_transform(list_zip(qfull, list_q), z -> z[1] - z[2]))
      |      [j.sub_id * 16 + 1 : j.sub_id * 16 + 16] AS sq
      |  FROM ivassigned, LATERAL (SELECT unnest(range(0, 4)) AS sub_id) j
      |), ivbooks AS (
      |  SELECT sub_id, vec_id AS c_id, sq AS c_q FROM ivrsub
      |  WHERE vec_id % 50 = 0
      |), ivscored AS (
      |  SELECT r.vec_id, r.list_id, r.sub_id, b.c_id,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(list_zip(r.sq, b.c_q),
      |        z -> CAST(z[1] - z[2] AS BIGINT) * (z[1] - z[2]))),
      |      (a, x) -> a + x) AS dist
      |  FROM ivrsub r JOIN ivbooks b USING (sub_id)
      |), ivcodes AS (
      |  SELECT vec_id, list_id, sub_id, c_id AS code FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id, sub_id
      |      ORDER BY dist, c_id) AS rn FROM ivscored) WHERE rn = 1
      |), ivprobed AS (
      |  SELECT vec_id AS q_id, qfull, c_id AS list_id, c_q AS list_q
      |  FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id
      |      ORDER BY dist, c_id) AS rn FROM ivcscore
      |    WHERE vec_id % 50 = 0 AND vec_id < 500)
      |  WHERE rn <= 2
      |), ivqrsub AS (
      |  SELECT q_id, list_id, j.sub_id,
      |    (list_transform(list_zip(qfull, list_q), z -> z[1] - z[2]))
      |      [j.sub_id * 16 + 1 : j.sub_id * 16 + 16] AS sq
      |  FROM ivprobed, LATERAL (SELECT unnest(range(0, 4)) AS sub_id) j
      |), ivqt AS (
      |  SELECT r.q_id, r.list_id, r.sub_id, b.c_id AS code,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(list_zip(r.sq, b.c_q),
      |        z -> CAST(z[1] - z[2] AS BIGINT) * (z[1] - z[2]))),
      |      (a, x) -> a + x) AS d
      |  FROM ivqrsub r JOIN ivbooks b USING (sub_id)
      |), ivadist AS (
      |  SELECT q.q_id, c.vec_id, CAST(sum(q.d) AS BIGINT) AS adist
      |  FROM ivcodes c JOIN ivqt q
      |    ON c.list_id = q.list_id AND c.sub_id = q.sub_id
      |    AND c.code = q.code
      |  WHERE c.vec_id != q.q_id
      |  GROUP BY q.q_id, c.vec_id
      |), vrank AS (
      |  SELECT q_id AS query_id, vec_id AS doc_id,
      |    CAST(row_number() OVER (PARTITION BY q_id
      |      ORDER BY adist, vec_id) AS BIGINT) AS rank_vec
      |  FROM ivadist QUALIFY rank_vec <= 10
      |), trank AS (
      |  SELECT query_id, doc_id,
      |    CAST(row_number() OVER (PARTITION BY query_id
      |      ORDER BY score_ppm DESC, doc_id) AS BIGINT) AS rank_text
      |  FROM scoresum QUALIFY rank_text <= 10
      |), fused AS (
      |  SELECT coalesce(t.query_id, v.query_id) AS query_id,
      |    coalesce(t.doc_id, v.doc_id) AS doc_id,
      |    coalesce(1000000 // (60 + t.rank_text), 0)
      |      + coalesce(1000000 // (60 + v.rank_vec), 0) AS rrf_ppm,
      |    t.rank_text, v.rank_vec
      |  FROM trank t FULL OUTER JOIN vrank v
      |    ON t.query_id = v.query_id AND t.doc_id = v.doc_id
      |)
      |SELECT query_id,
      |  CAST(row_number() OVER (PARTITION BY query_id
      |    ORDER BY rrf_ppm DESC, doc_id) AS BIGINT) AS "rank",
      |  doc_id, rrf_ppm, rank_text, rank_vec
      |FROM fused
      |QUALIFY "rank" <= 10
      |ORDER BY query_id, "rank"""".stripMargin

  /** Text-index health: the per-source stats an index data card
    * publishes — the operational twin of q_llm_ivf_stats for the
    * inverted index. One row per source: document count, postings
    * rows (Σ distinct terms per doc — the index's dominant stored
    * volume), exact token total, vocabulary size, and the
    * vocab-to-postings row ratio in ppm (how much of the index the
    * per-term df side table costs relative to the postings — the
    * number that decides whether the df table still broadcasts or
    * must co-bucket). A source whose ratio spikes is boilerplate-
    * degenerate (few distinct terms repeated everywhere — candidate
    * for the heavy-hitters scrub); one whose postings dwarf its token
    * count signals tokenizer breakage.
    *
    * Scale shape: ONE corpus scan exploded and map-side-combined per
    * (source, doc, term), persisted for its two aggregate consumers;
    * n_docs comes from the raw table (no distinct); the vocab count
    * is a map-side-partial distinct on (source, term); all joins are
    * source-cardinality-sized. No Expand (a two-countDistinct agg
    * would double the postings shuffle), no windows. */
  def indexStats(docs: DataFrame,
      temps: TempCache = TempCache.noop): DataFrame = {
    // pd feeds TWO aggregations (base totals + the vocab distinct):
    // persisted so the corpus tokenize/explode runs once, not twice
    // (the bm25TopK slice stance)
    val pd = temps.register(docs
      .select(col("source"), col("doc_id"),
        explode(tokens(col("text"))).as("term"))
      .groupBy(col("source"), col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val base = pd.groupBy(col("source"))
      .agg(count(lit(1)).as("postings_rows"),
        sum(col("tf")).as("total_tokens"))
    val nDocs = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"))
    val vocab = pd.select(col("source"), col("term")).distinct()
      .groupBy(col("source")).agg(count(lit(1)).as("vocab"))
    base.join(nDocs, Seq("source")).join(vocab, Seq("source"))
      .select(col("source"), col("n_docs"), col("postings_rows"),
        col("total_tokens"), col("vocab"),
        expr("(1000000 * vocab) div postings_rows").as("df_ratio_ppm"))
  }

  val qIndexStats = QuerySpec(
    "q_llm_index_stats",
    (s, d) => indexStats(docsOf(s, d)).orderBy(col("source")),
    Some("""WITH pd AS (
           |  SELECT source, doc_id, term, CAST(count(*) AS BIGINT) AS tf
           |  FROM (SELECT source, doc_id,
           |          unnest(string_split(text, ' ')) AS term
           |        FROM documents)
           |  GROUP BY source, doc_id, term
           |), base AS (
           |  SELECT source, CAST(count(*) AS BIGINT) AS postings_rows,
           |    CAST(sum(tf) AS BIGINT) AS total_tokens
           |  FROM pd GROUP BY source
           |), nd AS (
           |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs
           |  FROM documents GROUP BY source
           |), voc AS (
           |  SELECT source, CAST(count(DISTINCT term) AS BIGINT) AS vocab
           |  FROM pd GROUP BY source
           |)
           |SELECT base.source, n_docs, postings_rows, total_tokens, vocab,
           |  CAST((1000000 * vocab) // postings_rows AS BIGINT)
           |    AS df_ratio_ppm
           |FROM base JOIN nd ON base.source = nd.source
           |  JOIN voc ON base.source = voc.source
           |ORDER BY base.source""".stripMargin))

  def all: Seq[QuerySpec] =
    Seq(qBm25, qBm25Index, qBm25Serve, qBm25ServeFixed, qBm25MaxScore,
      qBm25Scoped,
      qBm25ScopedPinned, qBm25Fixed,
      qBm25Inc, qBm25IncDelta, qRrfFusion, qRrfFusionFixed,
      qRrfFusionServe, qRrfFusionScoped, qRrfFusionScopedRefined,
      qPosIndex, qPhraseSearch, qPhraseK, qProxSearch, qPosInc,
      qPhraseSnippet, qRetrievalEval, qRetrievalEvalPinned,
      qIndexUnified, qIndexUnifiedInc,
      qIndexUnifiedIncDelta, qIndexStats)
}

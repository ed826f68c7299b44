package graft.llm

import graft.Tables
import graft.queries.QuerySpec
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Supervised document classification for curation: the
  * fastText/CCNet-style linear classifier over hashed bag-of-token
  * features, trained IN-PLAN as a batch perceptron — the quality- and
  * language-filtering stage of a training-data pipeline expressed as
  * pure relational algebra.
  *
  * Determinism stance: gradient methods need a learning rate and a
  * sigmoid — transcendental, ULP-divergent across libm builds. The
  * batch perceptron needs neither: weights live in ℤ (updates are
  * ±1 feature-count sums over the misclassified set, applied once per
  * full pass), margins are integer dot products, and the prediction is
  * a sign test — every number in training AND inference is an exact
  * long, so the whole trained model hash-matches across engines.
  * Features are 32-bit md5 prefixes of distinct tokens mod `dims`
  * (binary presence — collisions fold, identically in both engines).
  *
  * Scale shape: the feature frame is ONE corpus scan exploded to
  * distinct (doc, feature) pairs — the only corpus-sized shuffle. Each
  * training pass is: weight vector (`dims` rows, BROADCAST) joined
  * back, margins map-side-summed per doc, misclassified docs'
  * per-feature ±1 sums reduced map-side to another `dims`-row frame.
  * Passes chain in one plan — no driver-side collect, no mutable
  * state; at a fixed pass count the whole job is a linear number of
  * scans over the persisted feature frame.
  *
  * CACHE LIFETIME CONTRACT: every `temps`-taking method here persists
  * the feature frame at MEMORY_AND_DISK; under the default
  * `TempCache.noop` it is never released — one-shot JVMs only. A
  * long-running driver MUST pass a real [[TempCache]] and `release()`
  * after materializing (the [[Retrieval]] / [[Pipeline.curateEmb]]
  * contract). */
object Classifier {

  import TextAnalysis.tokens

  /** 32-bit md5-prefix feature id of a term, mod `dims` — replayed in
    * DuckDB as `CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT) % dims`. */
  def featureId(term: Column, dims: Int): Column =
    pmod(conv(substring(md5(term), 1, 8), 16, 10).cast("long"), lit(dims))

  /** Distinct (doc_id, y, f) presence pairs: the sparse binary feature
    * matrix. `label` must be ±1. */
  def featureFrame(docs: DataFrame, label: Column,
      dims: Int = 1024): DataFrame =
    docs
      .select(col("doc_id"), label.as("y"),
        explode(array_distinct(tokens(col("text")))).as("term"))
      .select(col("doc_id"), col("y"), featureId(col("term"), dims).as("f"))
      .distinct()

  /** [[featureFrame]]'s rows packed per document WITHOUT any shuffle:
    * (doc_id, y, fs) where fs is the doc's distinct hashed feature set
    * as a row-local array — `array_distinct` dedups inside the token
    * array (term-level then feature-level, so md5 collisions fold
    * identically to the exploded `.distinct()`), exactly the
    * [[streamingScore]] derivation. Replaces featureFrame's
    * corpus-sized distinct Exchange with zero exchanges (optimization
    * round 14, guide §2.4); content-equal by construction since every
    * consumer folds or sums over the set. */
  private def featureArrays(docs: DataFrame, label: Column,
      dims: Int): DataFrame =
    TextDedup.spreadSmallInput(docs)
      .select(col("doc_id"), label.as("y"),
        array_distinct(transform(array_distinct(tokens(col("text"))),
          t => featureId(t, dims))).as("fs"))

  /** Train `passes` batch-perceptron passes from w = 0 and return the
    * `dims`-row integer weight vector. The feature frame is persisted
    * once for its 2·passes+1 consumers.
    *
    * Reworked in optimization round 14 to the ROW-LOCAL margin shape
    * the multiclass trainer already uses: the per-doc feature set
    * rides as an array ([[featureArrays]] — no corpus-sized distinct),
    * the weight vector pivots to a one-row dense array broadcast per
    * pass, margins are an O(|fs|) row-local fold (no per-pass
    * groupBy(doc_id) Exchange and no misclassified-set semi-join
    * shuffle), and the only per-pass shuffle is the ≤dims-group
    * map-side-combined ±1 aggregate. Weight-identical to the exploded
    * form — integer sums over the same feature sets (ClassifierSpec's
    * sequential-reference test pins it). */
  def train(docs: DataFrame, label: Column, dims: Int = 1024,
      passes: Int = 2, temps: TempCache = TempCache.noop): DataFrame =
    trainOnArr(persistFeat(featureArrays(docs, label, dims), temps),
      passes, dims)

  private def persistFeat(feat: DataFrame, temps: TempCache): DataFrame =
    temps.register(feat
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** Run `passes` binary batch passes from w = 0 (an empty (f, w)
    * frame) over a prebuilt per-doc feature-array frame. */
  private def trainOnArr(featA: DataFrame, passes: Int,
      dims: Int): DataFrame = {
    val w0 = featA.sparkSession.range(0).select(col("id").as("f"),
      col("id").as("w")) // empty (f, w): w = 0 everywhere
    // each pass's ≤dims-row weight frame is CHECKPOINTED (the
    // Similarity.kmeansStep idiom): pass N's plan references pass N−1
    // twice (the dense pivot and the update join), so without the
    // truncation pass 1's dw aggregate re-executes ~2^passes times by
    // scoring and the plan tree doubles per pass. Passes are
    // inherently sequential — eager materialization loses no
    // concurrency (unlike the rejected ivfPqTrain checkpoint).
    // pass N−1's checkpointed blocks are dead once pass N is
    // materialized (localCheckpoint(true) is eager) — free them, or a
    // long-running driver that retrains repeatedly (the StreamSoak
    // drift→retrain loop) accumulates small cached RDDs unboundedly
    // (clearCache() does not drop RDD-level checkpoint blocks).
    // freeCheckpoint is a no-op on the non-checkpointed w0.
    (1 to passes).foldLeft(w0) { (w, _) =>
      val next = passArr(featA, w, dims).localCheckpoint(true)
      TextDedup.freeCheckpoint(w)
      next
    }
  }

  /** The (f, w) vector pivoted to a ONE-ROW dense long array (slot f
    * holds w, absent features 0) — the binary twin of [[weightsOne]]:
    * O(1) slot reads per margin term instead of a per-pass broadcast
    * hash join against the exploded corpus. Densified by sorted-array
    * binary search (absent slot → null → coalesce 0, element_at's
    * missing-key semantics — ANSI-safe on the pass-1 empty vector). */
  private def weightsOneBinary(w: DataFrame, dims: Int): DataFrame = {
    graft.functions.GraftFunctions.register(w.sparkSession)
    w.agg(sort_array(collect_list(struct(col("f").as("k"),
        col("w").as("v")))).as("kv"))
      .select(expr("transform(kv, e -> e.k)").as("ks"),
        expr("transform(kv, e -> e.v)").as("vs"))
      .select(transform(sequence(lit(0L), lit(dims - 1L)),
        k => coalesce(
          call_udf("graft_sorted_lookup", col("ks"), col("vs"), k),
          lit(0L))).as("wa"))
  }

  /** Per-doc integer margin under `w`, computed row-locally from the
    * feature array and the broadcast dense weight row. f < dims by
    * construction, so the 1-based slot read is always in bounds. */
  private def marginArr(featA: DataFrame, w: DataFrame,
      dims: Int): DataFrame =
    featA.crossJoin(broadcast(weightsOneBinary(w, dims)))
      .withColumn("m", aggregate(col("fs"), lit(0L),
        (acc, f) => acc + element_at(col("wa"), (f + 1L).cast("int"))))

  /** One batch-perceptron pass in the row-local shape: margins from
    * [[marginArr]], then the misclassified docs' features explode and
    * sum ±1 per feature — ≤dims groups, map-side combined. Exactly
    * [[pass]]'s algebra with the corpus-sized exchanges removed. */
  private def passArr(featA: DataFrame, w: DataFrame,
      dims: Int): DataFrame = {
    val dw = marginArr(featA, w, dims)
      .filter(col("y") * col("m") <= 0)
      .select(col("y"), explode(col("fs")).as("f"))
      .groupBy(col("f")).agg(sum(col("y")).as("dw"))
    w.join(dw, Seq("f"), "full_outer")
      .select(col("f"),
        (coalesce(col("w"), lit(0L)) + coalesce(col("dw"), lit(0L))).as("w"))
  }

  /** Score every document under a trained weight vector: integer
    * margin, sign prediction (margin ≤ 0 → −1), correctness flag. */
  def score(feat: DataFrame, w: DataFrame): DataFrame =
    feat.join(broadcast(w), Seq("f"), "left")
      .groupBy(col("doc_id"), col("y"))
      .agg(sum(coalesce(col("w"), lit(0L))).as("margin"))
      .select(col("doc_id"), col("y").as("label"), col("margin"),
        when(col("margin") > 0, 1L).otherwise(-1L).as("pred"))
      .withColumn("correct", (col("label") === col("pred")).cast("boolean"))

  /** Train-and-score in one plan on the `documents` table with
    * lang = 'en' as the positive class — the fastText language-filter
    * shape. Two passes, 1024 hashed dims. Scoring is the same
    * row-local margin fold as training — the whole train-and-score
    * chain's only corpus-sized exchanges are gone (the per-pass dw
    * aggregates shuffle ≤dims groups). */
  def langClassifier(docs: DataFrame,
      temps: TempCache = TempCache.noop): DataFrame = {
    val label = when(col("lang") === "en", 1L).otherwise(-1L)
    val dims = 1024
    val featA = persistFeat(featureArrays(docs, label, dims), temps)
    marginArr(featA, trainOnArr(featA, passes = 2, dims), dims)
      .select(col("doc_id"), col("y").as("label"), col("m").as("margin"),
        when(col("m") > 0, 1L).otherwise(-1L).as("pred"))
      .withColumn("correct", (col("label") === col("pred")).cast("boolean"))
  }

  /** Multiclass one-vs-all perceptron as ONE relational plan,
    * returning the (c, f, w) weight table (n_classes · dims rows) —
    * the same margin/update algebra as the binary [[train]], so the
    * trained weights are exact longs that hash-match across engines.
    *
    * Scale shape (reworked round 9 — the r8 ladder showed the
    * class-replicated form's last 10× step at 5.5×): the corpus never
    * replicates per class. The ONLY corpus-sized frame is the per-doc
    * distinct-feature ARRAY frame (one row per document, the array
    * bounded by the document's own token count — the bounded-unit
    * stance), built row-locally with ZERO shuffles (round 14: the
    * explode→distinct→collect_list exchanges folded into the array
    * expression) and persisted across passes.
    * Each pass pivots the (c, f, w) table into a ONE-ROW broadcast
    * map keyed classIdx·dims + f (≤ n_classes·dims entries — KBs,
    * the streamingScore layout), computes every class's margin
    * ROW-LOCALLY per document, and aggregates the misclassified
    * (class, feature, ±1) bag straight to (c, f) — n_classes·dims
    * groups, so map-side partials collapse each task's contribution
    * to ≤ one summary per group and the per-pass shuffle is
    * vocabulary-sized, not corpus-sized. */
  def multiclassTrain(docs: DataFrame, classCol: Column,
      dims: Int = 1024, passes: Int = 2,
      temps: TempCache = TempCache.noop): DataFrame =
    multiTrainOnFeat(
      persistFeat(docFeatures(docs, classCol, dims), temps),
      persistCls(classesOne(docs, classCol), temps), passes, dims)

  /** The multiclass twin of [[trainOnFeat]]: empty (c, f, w) start. */
  private def multiTrainOnFeat(docFeat: DataFrame, cls: DataFrame,
      passes: Int, dims: Int): DataFrame = {
    val w0 = docFeat.sparkSession.range(0).select(
      col("id").cast("string").as("c"), col("id").as("f"), col("id").as("w"))
    // per-pass checkpoint — see trainOnArr: the (c, f, w) frame is
    // n_classes·dims rows at most, its plan otherwise doubles per pass
    // and pass-1 work re-executes at every later reference.
    // free pass N−1's checkpoint blocks once pass N is materialized —
    // see trainOnArr (the StreamSoak retrain-loop leak)
    (1 to passes).foldLeft(w0) { (w, _) =>
      val next = passMulti(docFeat, cls, w, dims).localCheckpoint(true)
      TextDedup.freeCheckpoint(w)
      next
    }
  }

  /** (doc_id, lab, fs): one row per document carrying its DISTINCT
    * hashed feature ids as an array — bounded by the document's own
    * token count. The single corpus-sized frame of multiclass
    * training; every pass and the final scoring read it. Null-labeled
    * docs are filtered out — the [[classesOne]] exclusion contract
    * (they could never be predicted, only distort real weights). */
  private def docFeatures(docs: DataFrame, classCol: Column,
      dims: Int): DataFrame =
    TextDedup.spreadSmallInput(docs.filter(classCol.isNotNull))
      .select(col("doc_id"), classCol.as("lab"),
        array_distinct(transform(array_distinct(tokens(col("text"))),
          t => featureId(t, dims))).as("fs"))

  /** One-row (cs) frame: the sorted class list — sorted so the
    * row-local argmax's keep-first tie rule IS "lexicographically
    * smallest class". Classes come from the raw docs (not the feature
    * frame), so a class whose docs all tokenize empty still trains.
    *
    * NULL labels are EXCLUDED from training by contract (collect_set
    * drops them here, and [[docFeatures]] filters the same rows out of
    * the feature frame): a null class can never be predicted, so
    * letting its docs ride through as permanent −1 updates would
    * silently distort every real class's weights. ClassifierSpec pins
    * the exclusion. Referenced ~3× per pass plus scoring, so entry
    * points persist it via [[persistCls]] — without that each
    * reference re-scans the raw corpus for the collect_set. */
  private def classesOne(docs: DataFrame, classCol: Column): DataFrame =
    docs.agg(sort_array(collect_set(classCol)).as("cs"))

  private def persistCls(cls: DataFrame, temps: TempCache): DataFrame =
    temps.register(cls
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** The (c, f, w) table pivoted to a ONE-ROW broadcastable DENSE
    * array: slot `classIdx·dims + f` holds w (classIdx = position in
    * the sorted class list), absent pairs hold 0. Dense deliberately —
    * Spark's `element_at` on a MAP column is a linear scan over the
    * entries, so a map pivot costs O(n_classes·dims) per lookup and
    * turned the sf10 margin fold into ~10¹¹ comparisons (measured 185 s
    * vs 9 s at 10×); the array slot read is O(1). n_classes·dims longs
    * ≈ 40 KB at 5×1024 — trivially broadcastable. Empty w (pass 1)
    * pivots to all zeros, the w = 0 start. */
  private def weightsOne(w: DataFrame, cls: DataFrame, dims: Int): DataFrame = {
    graft.functions.GraftFunctions.register(w.sparkSession)
    val cIdx = cls.select(posexplode(col("cs")).as(Seq("ci", "c")))
    w.join(broadcast(cIdx), Seq("c"))
      // sorted (k, v) arrays + per-slot BINARY SEARCH (round 14): the
      // previous map pivot's try_element_at is a linear scan over the
      // entries, so densifying cost (n_classes·dims)² ≈ 26M boxed
      // comparisons in ONE single-threaded row eval per pass;
      // graft_sorted_lookup has element_at's exact semantics (null on
      // miss — the pass-1 empty-pivot / ANSI case lands in the same
      // coalesce) at slots·log(entries). Keys are unique (one (c, f)
      // per slot id), so the struct sort orders by k alone.
      .agg(sort_array(collect_list(struct(
        (col("ci").cast("long") * dims + col("f")).as("k"),
        col("w").as("v")))).as("kv"))
      .select(expr("transform(kv, e -> e.k)").as("ks"),
        expr("transform(kv, e -> e.v)").as("vs"))
      .crossJoin(cls.select(size(col("cs")).as("ncls")))
      .select(transform(
        sequence(lit(0L), col("ncls").cast("long") * dims - 1),
        k => coalesce(
          call_udf("graft_sorted_lookup", col("ks"), col("vs"), k),
          lit(0L))).as("wa"))
  }

  /** Every class's margin per document, computed ROW-LOCALLY from the
    * per-doc feature array and the one-row dense weight array: adds
    * `mm` — array<struct<c, m>> in sorted-class order — to the docFeat
    * rows. No shuffle: the weight/class row rides a broadcast, and
    * each lookup is an O(1) array slot read (1-based element_at,
    * always in bounds: f < dims by construction, i < n_classes). */
  private def marginsLocal(docFeat: DataFrame, cls: DataFrame,
      wOne: DataFrame, dims: Int): DataFrame =
    docFeat.crossJoin(broadcast(cls.crossJoin(wOne)))
      .withColumn("mm", transform(col("cs"), (c, i) => struct(
        c.as("c"),
        aggregate(col("fs"), lit(0L), (acc, f) =>
          acc + element_at(col("wa"),
            (i.cast("long") * dims + f + 1L).cast("int")))
          .as("m"))))

  /** One batch pass: row-local margins under `w`, then the
    * misclassified (margin·y ≤ 0) classes explode against the doc's
    * feature array and sum ±1 per (class, feature) — the exact
    * algebra of the class-replicated form, with the corpus-sized
    * shuffle replaced by an n_classes·dims-group aggregate. */
  private def passMulti(docFeat: DataFrame, cls: DataFrame, w: DataFrame,
      dims: Int): DataFrame = {
    val dw = marginsLocal(docFeat, cls, weightsOne(w, cls, dims), dims)
      .select(col("lab"), col("fs"),
        filter(col("mm"), e =>
          (when(col("lab") === e.getField("c"), lit(1L)).otherwise(lit(-1L)) *
            e.getField("m")) <= 0).as("miss"))
      .select(explode(col("miss")).as("e"), col("lab"), col("fs"))
      .select(col("e.c").as("c"),
        when(col("lab") === col("e.c"), lit(1L)).otherwise(lit(-1L)).as("y"),
        explode(col("fs")).as("f"))
      .groupBy(col("c"), col("f")).agg(sum(col("y")).as("dw"))
    w.join(dw, Seq("c", "f"), "full_outer")
      .select(col("c"), col("f"),
        (coalesce(col("w"), lit(0L)) + coalesce(col("dw"), lit(0L))).as("w"))
  }

  /** Learned language ID: train one-vs-all on `lang`, predict each
    * doc's argmax-margin class (ties → lexicographically smallest
    * class), compare with the true label — the trained sibling of the
    * q_llm_lang_id marker heuristic. The argmax is a row-local fold
    * over the sorted-class margin array (keep-first on ties), so
    * scoring adds no shuffle at all. */
  def langClassifierMulti(docs: DataFrame,
      temps: TempCache = TempCache.noop): DataFrame = {
    val dims = 1024
    val cls = persistCls(classesOne(docs, col("lang")), temps)
    val docFeat = persistFeat(docFeatures(docs, col("lang"), dims), temps)
    val w = multiTrainOnFeat(docFeat, cls, passes = 2, dims)
    marginsLocal(docFeat, cls, weightsOne(w, cls, dims), dims)
      .withColumn("best",
        aggregate(col("mm"),
          lit(null).cast("struct<c:string,m:bigint>"),
          (acc, e) => when(acc.isNull || e.getField("m") > acc.getField("m"),
            e).otherwise(acc)))
      .select(col("doc_id"), col("lab").as("lang"),
        col("best.c").as("pred"), col("best.m").as("margin"),
        (col("lab") === col("best.c")).cast("boolean").as("correct"))
  }

  /** The multiclass training-and-ranking CTE chain (through `ranked`),
    * parameterized on the source relation (and an optional prelude CTE
    * defining it), shared by the lang-clf, confusion-card, and —
    * with `documents` swapped for a normalized `nd` CTE — curate-lang
    * oracles, so variants cannot drift (the bm25CteFor stance). */
  private def langClfCtesFor(src: String, prelude: String = ""): String =
    s"""WITH ${prelude}classes AS (SELECT DISTINCT lang AS c FROM $src
           |  WHERE lang IS NOT NULL),
           |featd AS (
           |  SELECT DISTINCT doc_id, lab,
           |    CAST(('0x' || substr(md5(term), 1, 8)) AS BIGINT) % 1024 AS f
           |  FROM (
           |    SELECT doc_id, lang AS lab,
           |      unnest(list_distinct(string_split(text, ' '))) AS term
           |    FROM $src WHERE lang IS NOT NULL)
           |)""".stripMargin + langClfTrainCtes

  /** The source-independent tail of the chain: featc → two perceptron
    * passes → per-doc ranking. */
  private val langClfTrainCtes = """, featc AS (
           |  SELECT doc_id, lab, f, c,
           |    CASE WHEN lab = c THEN 1 ELSE -1 END AS y
           |  FROM featd CROSS JOIN classes
           |), w1 AS (
           |  SELECT c, f, CAST(sum(y) AS BIGINT) AS w
           |  FROM featc GROUP BY c, f
           |), m1 AS (
           |  SELECT featc.doc_id, featc.c, featc.y,
           |    CAST(sum(coalesce(w1.w, 0)) AS BIGINT) AS m
           |  FROM featc LEFT JOIN w1 ON featc.c = w1.c AND featc.f = w1.f
           |  GROUP BY featc.doc_id, featc.c, featc.y
           |), dw2 AS (
           |  SELECT featc.c, featc.f, CAST(sum(featc.y) AS BIGINT) AS dw
           |  FROM featc
           |  JOIN (SELECT doc_id, c FROM m1 WHERE y * m <= 0) e
           |    ON featc.doc_id = e.doc_id AND featc.c = e.c
           |  GROUP BY featc.c, featc.f
           |), w2 AS (
           |  SELECT coalesce(w1.c, dw2.c) AS c,
           |    coalesce(w1.f, dw2.f) AS f,
           |    coalesce(w1.w, 0) + coalesce(dw2.dw, 0) AS w
           |  FROM w1 FULL OUTER JOIN dw2
           |    ON w1.c = dw2.c AND w1.f = dw2.f
           |), m2 AS (
           |  SELECT featc.doc_id, featc.lab, featc.c,
           |    CAST(sum(coalesce(w2.w, 0)) AS BIGINT) AS m
           |  FROM featc LEFT JOIN w2 ON featc.c = w2.c AND featc.f = w2.f
           |  GROUP BY featc.doc_id, featc.lab, featc.c
           |), ranked AS (
           |  SELECT doc_id, lab, c, m,
           |    row_number() OVER (PARTITION BY doc_id
           |      ORDER BY m DESC, c) AS rn
           |  FROM m2
           |)""".stripMargin

  private val langClfCtes = langClfCtesFor("documents")

  val qLangClf = QuerySpec(
    "q_llm_lang_clf",
    (s, d) =>
      langClassifierMulti(Tables.load(s, d, "documents"))
        .orderBy(col("doc_id")),
    Some(langClfCtes + """
           |SELECT doc_id, lab AS lang, c AS pred, m AS margin,
           |  (lab = c) AS correct
           |FROM ranked WHERE rn = 1
           |ORDER BY doc_id""".stripMargin))

  /** The confusion matrix of the learned language ID — the eval
    * artifact every shipped classifier carries: exact doc counts per
    * (true label, predicted class). Shares the training CTE chain with
    * q_llm_lang_clf verbatim; the Spark side is one k×k map-side
    * aggregate over [[langClassifierMulti]]'s output. */
  val qClfConfusion = QuerySpec(
    "q_llm_clf_confusion",
    (s, d) =>
      langClassifierMulti(Tables.load(s, d, "documents"))
        .groupBy(col("lang"), col("pred"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("pred")),
    Some(langClfCtes + """
           |SELECT lab AS lang, c AS pred, count(*) AS n
           |FROM ranked WHERE rn = 1
           |GROUP BY lab, c
           |ORDER BY lang, pred""".stripMargin))

  /** Streaming inference under a FROZEN weight vector: score a
    * document feed row-locally — the nightly-trained / online-served
    * split (train with [[train]], snapshot w, serve the crawl stream).
    * The weight vector rides as ONE collected map literal-row
    * broadcast (dims entries — KBs), the margin is a row-local fold
    * over the doc's distinct hashed features, and there is NO stateful
    * operator at all: the gate is stream-legal anywhere in a curation
    * feed, the [[TextDedup.decontamScrub]] stance. Result-equal to
    * [[score]] under the same w (spec-pinned). */
  def streamingScore(docs: DataFrame, w: DataFrame,
      dims: Int = 1024): DataFrame = {
    val wOne = broadcast(w
      .agg(map_from_entries(collect_list(struct(col("f"), col("w"))))
        .as("wmap"))
      .withColumn("one", lit(1)))
    docs
      .withColumn("one", lit(1))
      .join(wOne, Seq("one"))
      .withColumn("feats",
        array_distinct(transform(array_distinct(tokens(col("text"))),
          t => featureId(t, dims))))
      .withColumn("margin",
        aggregate(col("feats"), lit(0L),
          (acc, f) => acc + coalesce(element_at(col("wmap"), f), lit(0L))))
      .select(col("doc_id"), col("margin"),
        when(col("margin") > 0, 1L).otherwise(-1L).as("pred"))
  }

  /** The binary-perceptron training-and-scoring CTE chain (through
    * `scored`), parameterized on the source relation and an optional
    * prelude CTE (the langClfCtesFor stance), shared by the doc-clf
    * and curate-clf oracles so variants cannot drift. */
  private def docClfCtesFor(src: String, prelude: String = ""): String =
    s"""WITH ${prelude}feat AS (
           |  SELECT DISTINCT doc_id, y,
           |    CAST(('0x' || substr(md5(term), 1, 8)) AS BIGINT) % 1024 AS f
           |  FROM (
           |    SELECT doc_id,
           |      CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y,
           |      unnest(list_distinct(string_split(text, ' '))) AS term
           |    FROM $src)
           |), w1 AS (
           |  -- pass 1 from w = 0: every margin is 0, every doc
           |  -- misclassified, so w1 = per-feature label sums
           |  SELECT f, CAST(sum(y) AS BIGINT) AS w FROM feat GROUP BY f
           |), m1 AS (
           |  SELECT feat.doc_id, feat.y,
           |    CAST(sum(coalesce(w1.w, 0)) AS BIGINT) AS m
           |  FROM feat LEFT JOIN w1 ON feat.f = w1.f
           |  GROUP BY feat.doc_id, feat.y
           |), dw2 AS (
           |  SELECT f, CAST(sum(y) AS BIGINT) AS dw FROM feat
           |  WHERE doc_id IN (SELECT doc_id FROM m1 WHERE y * m <= 0)
           |  GROUP BY f
           |), w2 AS (
           |  SELECT coalesce(w1.f, dw2.f) AS f,
           |    coalesce(w1.w, 0) + coalesce(dw2.dw, 0) AS w
           |  FROM w1 FULL OUTER JOIN dw2 ON w1.f = dw2.f
           |), scored AS (
           |  SELECT feat.doc_id, feat.y AS label,
           |    CAST(sum(coalesce(w2.w, 0)) AS BIGINT) AS margin
           |  FROM feat LEFT JOIN w2 ON feat.f = w2.f
           |  GROUP BY feat.doc_id, feat.y
           |)""".stripMargin

  val qDocClf = QuerySpec(
    "q_llm_doc_clf",
    (s, d) =>
      langClassifier(Tables.load(s, d, "documents"))
        .orderBy(col("doc_id")),
    Some(docClfCtesFor("documents") + """
           |SELECT doc_id, label, margin,
           |  CASE WHEN margin > 0 THEN CAST(1 AS BIGINT)
           |       ELSE CAST(-1 AS BIGINT) END AS pred,
           |  (label = CASE WHEN margin > 0 THEN 1 ELSE -1 END) AS correct
           |FROM scored
           |ORDER BY doc_id""".stripMargin))

  /** LANGUAGE-FILTERED curation: normalize → in-plan-trained
    * multiclass lang filter (keep docs predicted `keepLang`) → exact
    * dedup (min-id survivor per content hash) → content split — the
    * "English-only release" pass with the LEARNED filter as a
    * first-class pipeline stage, trained on the same normalized text
    * it filters. Every stage is an existing oracle'd operator
    * ([[Curation.normalize]], [[langClassifierMulti]],
    * [[TextDedup.exactDedup]]'s survivor rule,
    * [[Curation.splitByHash]]); this entry gives the COMPOSITION its
    * own correctness row, the q_llm_curate stance.
    *
    * Scale shape: one normalize scan persisted for its two consumers
    * (the classifier's feature frame and the survivor join-back); the
    * classifier stages keep their documented shapes; dedup is one
    * map-side-combined hash groupBy + a doc-keyed semi join; split is
    * a per-row hash. */
  def curateLang(docs: DataFrame, keepLang: String = "en",
      temps: TempCache = TempCache.noop): DataFrame =
    curateWithGate(docs, temps)(nd =>
      langClassifierMulti(nd, temps)
        .filter(col("pred") === lit(keepLang))
        .select(col("doc_id"), col("margin")))

  /** The shared learned-filter curation composition behind
    * [[curateLang]] and [[curateClf]]: normalize → the caller's
    * classifier gate (any (doc_id, margin) keep set trained on the
    * normalized frame) → exact dedup (min-id survivor per content
    * hash) → content split. ONE definition so the language and
    * quality variants cannot drift (the docClfCtesFor stance applied
    * to the Scala side). */
  private def curateWithGate(docs: DataFrame, temps: TempCache)
      (gate: DataFrame => DataFrame): DataFrame = {
    val nd = temps.register(docs
      .select(col("doc_id"), col("lang"), col("source"),
        Curation.normalize(col("text")).as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // two consumers (the survivor aggregate and the final semi join):
    // persisted so the classifier scoring chain above executes once
    val kept = temps.register(nd.join(gate(nd), Seq("doc_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val survivors = kept
      .groupBy(sha2(col("text"), 256).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    kept.join(survivors, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("source"), col("margin"),
        Curation.splitByHash(col("text")).as("split"))
  }

  val qCurateLang = QuerySpec(
    "q_llm_curate_lang",
    (s, d) =>
      curateLang(Tables.load(s, d, "documents"))
        .orderBy(col("doc_id")),
    Some(langClfCtesFor("nd", raw"""nd AS (
           |  SELECT doc_id, lang, source,
           |    lower(trim(regexp_replace(regexp_replace(
           |      text, '[\x00-\x1f\x7f]', ' ', 'g'), '\s+', ' ', 'g'))) AS text
           |  FROM documents
           |), """.stripMargin) + """, kept AS (
           |  SELECT nd.doc_id, nd.source, nd.text, r.m AS margin
           |  FROM nd JOIN ranked r ON nd.doc_id = r.doc_id
           |  WHERE r.rn = 1 AND r.c = 'en'
           |), dd AS (
           |  SELECT min(doc_id) AS doc_id FROM kept GROUP BY sha256(text)
           |)
           |SELECT k.doc_id, k.source, k.margin,
           |  CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val'
           |       ELSE 'test' END AS split
           |FROM (SELECT kept.*,
           |        CAST(('0x' || substr(sha256(text), 1, 4)) AS BIGINT) % 100
           |          AS b
           |      FROM kept JOIN dd ON kept.doc_id = dd.doc_id) k
           |ORDER BY k.doc_id""".stripMargin))

  /** QUALITY-FILTERED curation with the LEARNED binary filter in the
    * loop: normalize → in-plan-trained binary perceptron
    * ([[langClassifier]], q_llm_doc_clf's model — keep positive-margin
    * docs) → exact dedup (min-id survivor per content hash) → content
    * split. The learned-quality sibling of [[curateLang]]: same
    * composition, binary quality gate instead of the multiclass
    * argmax. Same scale shape: one normalize scan persisted for its
    * two consumers, perceptron passes broadcast dims-row weight
    * frames, dedup is one map-side-combined hash groupBy + a
    * doc-keyed semi join. */
  def curateClf(docs: DataFrame,
      temps: TempCache = TempCache.noop): DataFrame =
    curateWithGate(docs, temps)(nd =>
      langClassifier(nd, temps)
        .filter(col("margin") > 0)
        .select(col("doc_id"), col("margin")))

  val qCurateClf = QuerySpec(
    "q_llm_curate_clf",
    (s, d) =>
      curateClf(Tables.load(s, d, "documents"))
        .orderBy(col("doc_id")),
    Some(docClfCtesFor("nd", raw"""nd AS (
           |  SELECT doc_id, lang, source,
           |    lower(trim(regexp_replace(regexp_replace(
           |      text, '[\x00-\x1f\x7f]', ' ', 'g'), '\s+', ' ', 'g'))) AS text
           |  FROM documents
           |), """.stripMargin) + """, kept AS (
           |  SELECT nd.doc_id, nd.source, nd.text, s.margin
           |  FROM nd JOIN scored s ON nd.doc_id = s.doc_id
           |  WHERE s.margin > 0
           |), dd AS (
           |  SELECT min(doc_id) AS doc_id FROM kept GROUP BY sha256(text)
           |)
           |SELECT k.doc_id, k.source, k.margin,
           |  CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val'
           |       ELSE 'test' END AS split
           |FROM (SELECT kept.*,
           |        CAST(('0x' || substr(sha256(text), 1, 4)) AS BIGINT) % 100
           |          AS b
           |      FROM kept JOIN dd ON kept.doc_id = dd.doc_id) k
           |ORDER BY k.doc_id""".stripMargin))

  def all: Seq[QuerySpec] =
    Seq(qDocClf, qLangClf, qClfConfusion, qCurateLang, qCurateClf)
}

package graft.llm

import graft.Tables
import graft.queries.QuerySpec
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline: exact
  * (hash-groupBy), n-gram Jaccard, MinHash+LSH, and SimHash. Everything
  * is built from Catalyst expressions (xxhash64, higher-order array
  * functions) — no UDFs — so the hot path stays codegen'd, and every
  * shuffle is keyed on bounded-cardinality bucket keys (band signatures
  * / simhash bands), which is what makes the approach survive 100 TB:
  * candidate generation is a hash-partitioned groupBy, never a cross
  * join.
  */
object TextDedup {

  /** Distinct whitespace tokens (the unigram shingle set). */
  def tokenSet(text: Column): Column = array_distinct(split(text, " "))

  /** Word n-gram shingle set (default 3). Order-sensitive — unlike the
    * unigram set, shuffled copies of the same vocabulary do NOT
    * collide, which keeps LSH buckets honest on repetitive corpora.
    * Short texts fall back to the whole text as a single shingle. */
  def shingleSet(text: Column, n: Int = 3): Column = {
    val toks = split(text, " ")
    when(size(toks) >= n,
      array_distinct(transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n))))))
      .otherwise(array(text))
  }

  /** Content identity: sha256 over the text's UTF-8 bytes, as hex. THE
    * single definition of document identity — the streaming dedup path
    * (StreamingCuration.contentHash) derives its binary state key from
    * this same expression, so batch and streaming can never diverge on
    * what "the same document" means. */
  def contentHashHex(text: Column): Column = sha2(text.cast("binary"), 256)

  /** Exact dedup via content hash: one shuffle on the digest, keep the
    * smallest doc_id per group (E1's WasUnknown gate in batch form). */
  def exactDedup(docs: DataFrame): DataFrame =
    docs.select(contentHashHex(col("text")).as("text_hash"), col("doc_id"))
      .groupBy(col("text_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))

  val qExactDedup = QuerySpec(
    "q_llm_exact_dedup",
    (s, d) => exactDedup(Tables.load(s, d, "documents")).orderBy(col("text_hash")),
    Some("""SELECT sha256(text) AS text_hash, min(doc_id) AS keep_id,
           |  count(*) AS n_copies
           |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Bounded pairwise token-set Jaccard pairs within a keyed block
    * (same lang, doc_id < `blockMax`) — the exact oracle-checkable
    * form; LSH below is the scale path. The block bound keeps the pair
    * count O(block²) regardless of corpus size. */
  def jaccardBlockPairs(docs0: DataFrame, threshold: Double = 0.5,
      blockMax: Long = 200L): DataFrame = {
    val docs = docs0
      .filter(col("doc_id") < blockMax)
      .select(col("doc_id"), col("lang"), tokenSet(col("text")).as("toks"))
    val a = docs.select(col("lang"), col("doc_id").as("ida"), col("toks").as("ta"))
    val b = docs.select(col("lang"), col("doc_id").as("idb"), col("toks").as("tb"))
    a.join(b, Seq("lang")).filter(col("ida") < col("idb"))
      .withColumn("jac",
        size(array_intersect(col("ta"), col("tb"))) / size(array_union(col("ta"), col("tb"))))
      .filter(col("jac") >= threshold)
      .select(col("lang"), col("ida"), col("idb"), col("jac"))
  }

  val qNgramJaccard = QuerySpec(
    "q_llm_ngram_jaccard",
    (s, d) =>
      jaccardBlockPairs(Tables.load(s, d, "documents"))
        .orderBy(col("lang"), col("ida"), col("idb")),
    Some("""SELECT a.lang AS lang, a.doc_id AS ida, b.doc_id AS idb,
           |  len(list_intersect(list_distinct(string_split(a.text, ' ')),
           |                     list_distinct(string_split(b.text, ' ')))) /
           |  len(list_distinct(list_concat(string_split(a.text, ' '),
           |                                string_split(b.text, ' ')))) AS jac
           |FROM documents a JOIN documents b
           |  ON a.lang = b.lang AND a.doc_id < b.doc_id
           |WHERE a.doc_id < 200 AND b.doc_id < 200
           |  AND len(list_intersect(list_distinct(string_split(a.text, ' ')),
           |                         list_distinct(string_split(b.text, ' ')))) /
           |      len(list_distinct(list_concat(string_split(a.text, ' '),
           |                                    string_split(b.text, ' ')))) >= 0.5
           |ORDER BY lang, ida, idb""".stripMargin))

  // ---- MinHash + LSH -----------------------------------------------------

  /** MinHash signature from a once-hashed shingle array `th` (each
    * element already reduced mod 2^31-1): permutation k is the
    * universal hash (a_k·h + b_k) mod p — pure long arithmetic, no
    * per-permutation string rehash, overflow-safe under ANSI
    * (a_k < 2^26, h < 2^31). */
  def minhashSignature(th: Column, numPerm: Int): Column =
    transform(sequence(lit(0), lit(numPerm - 1)),
      k => array_min(transform(th,
        h => pmod((k * 1000003L + 12345L) * h + k * 998244353L + 7L, lit(2147483647L)))))

  /** Shingle hashes for signature computation. */
  def shingleHashes(toks: Column): Column =
    transform(toks, t => pmod(xxhash64(t), lit(2147483647L)))

  /** LSH banding: docs sharing any band of the signature become
    * candidate pairs. Returns (doc_id, band_key) exploded rows; the
    * band index is folded into the key so all bands shuffle together
    * yet never collide across bands. */
  def lshBands(sig: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => concat_ws(":", b.cast("string"),
        concat_ws(",", transform(slice(sig, b * rows + 1, lit(rows)), x => x.cast("string")))))

  /** The signature kernels are CPU-bound: when the input is too small
    * to fill the cluster's cores with scan splits (single small file —
    * the local-test shape), spread it first. Inputs big enough to split
    * across every core (any real-scale table) pass through unshuffled —
    * repartitioning 100 TB of text to "spread" it would double the
    * job's IO for nothing. The decision reads Catalyst's logical size
    * estimate (file size for a parquet scan) against cores ×
    * maxPartitionBytes — the planner's own split arithmetic — instead
    * of probing `.rdd.getNumPartitions`, which forced a plan-to-RDD
    * conversion of the kernel entry just to count splits. */
  private[llm] def spreadSmallInput(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val par = spark.sparkContext.defaultParallelism
    val maxSplit = spark.sessionState.conf.filesMaxPartitionBytes
    if (docs.queryExecution.optimizedPlan.stats.sizeInBytes <
        BigInt(maxSplit) * par) docs.repartition(par)
    else docs
  }

  /** Candidate pairs from LSH buckets over word-trigram shingles,
    * verified with exact shingle Jaccard. The groupBy(band_key) is the
    * only wide op; bucket member lists are tiny for honest hash bands.
    * `maxBucket` drops degenerate buckets (boilerplate shingles) —
    * the standard guard that keeps the pair explosion local at scale;
    * a dropped bucket's members still pair up in their other bands.
    *
    * The whole pipeline carries only `(doc_id, th)` where th is the
    * hashed distinct-shingle array (one native-kernel pass over the
    * text, graft_shingle_hashes): signatures derive from th, and the
    * verification Jaccard runs set ops over longs rather than shingle
    * strings — identical up to xxhash64 collisions (~n²/2³¹), at a
    * fraction of the width on the wire. */
  def minhashPairs(docs: DataFrame, numPerm: Int = 64, bands: Int = 16,
      threshold: Double = 0.5, maxBucket: Int = 100,
      shingleKernel: String = "graft_shingle_hashes",
      temps: TempCache = TempCache.noop): DataFrame = {
    // Persisted because three downstream branches read it (banding +
    // both sides of the verification join): without the persist the
    // shingle+signature kernels — the dominant CPU cost — re-run per
    // branch. (doc_id, th, sig) is the narrow projection of the corpus,
    // spilling to disk if it outgrows memory.
    val withSig = temps.register(
      minhashSignatures(docs, numPerm, shingleKernel)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    minhashPairsFromSigs(withSig, numPerm, bands, threshold, maxBucket)
  }

  /** The signature frame `(doc_id, th, sig)` of a corpus: hashed
    * distinct-shingle array + numPerm-long MinHash signature, one
    * kernel pass over the text. This is the frame worth PERSISTING
    * long-term for recurring dedup against a fixed history — write it
    * once via [[graft.sources.Warehouse.writeBucketed]] and every
    * nightly [[nearDupAgainstHistorySigs]] run skips re-hashing
    * history entirely. Small-file inputs are spread first (the kernel
    * is the CPU-bound stage). */
  def minhashSignatures(docs: DataFrame, numPerm: Int = 64,
      shingleKernel: String = "graft_shingle_hashes"): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    spreadSmallInput(docs)
      .select(col("doc_id"),
        call_udf(shingleKernel, col("text"), lit(3), lit(true)).as("th"))
      .withColumn("sig", call_udf("graft_minhash_sig", col("th"), lit(numPerm)))
  }

  /** The banding + verification half of [[minhashPairs]], over an
    * already-computed signature frame `(doc_id, th, sig)`. The caller
    * owns the frame's storage (persist it, or read it from a bucketed
    * warehouse table) — three branches read it. */
  def minhashPairsFromSigs(withSig: DataFrame, numPerm: Int = 64,
      bands: Int = 16, threshold: Double = 0.5,
      maxBucket: Int = 100): DataFrame = {
    graft.functions.GraftFunctions.register(withSig.sparkSession)
    val rows = numPerm / bands
    // Band keys are high-entropy for DISTINCT documents, but a doc
    // mass-duplicated beyond maxBucket makes ALL its band buckets
    // hot — exactly the corpus a dedup pass exists for. The capped
    // collect (BoundedCollectAggExpr) enforces the bucket cap INSIDE
    // the aggregation buffer: state tops out at maxBucket+1 members on
    // any task (map-side partials included), saturated buckets eval to
    // NULL and are dropped — same result as the collect-then-filter
    // shape, one shuffle, no hot list ever materialized.
    val candidates = withSig
      .select(col("doc_id"), explode(lshBands(col("sig"), bands, rows)).as("band_key"))
      .groupBy(col("band_key"))
      .agg(sort_array(call_udf("graft_collect_capped",
        col("doc_id"), lit(maxBucket))).as("ids"))
      .filter(col("ids").isNotNull && size(col("ids")) > 1)
      .select(explode(expr(
        """flatten(transform(ids, (x, i) ->
          |  transform(slice(ids, i + 2, size(ids)), y -> struct(x AS ida, y AS idb))))"""
          .stripMargin)).as("p"))
      .select(col("p.ida").as("ida"), col("p.idb").as("idb"))
      .distinct()
    val th = withSig.select(col("doc_id"), col("th"))
    candidates
      .join(th.select(col("doc_id").as("ida"), col("th").as("ta")), Seq("ida"))
      .join(th.select(col("doc_id").as("idb"), col("th").as("tb")), Seq("idb"))
      .withColumn("jac",
        size(array_intersect(col("ta"), col("tb"))) / size(array_union(col("ta"), col("tb"))))
      .filter(col("jac") >= threshold)
      .select(col("ida"), col("idb"), col("jac"))
  }

  /** No oracle (banding isn't SQL-expressible in DuckDB at reasonable
    * cost); determinism + agreement with exact Jaccard is pinned by
    * ScalaTest. */
  val qMinhash = QuerySpec(
    "q_llm_minhash",
    (s, d) =>
      minhashPairs(Tables.load(s, d, "documents"))
        .orderBy(col("jac").desc, col("ida"), col("idb"))
        .limit(1000),
    None)

  /** The shared DuckDB CTE prefix: per-doc distinct word-trigram
    * shingles with the short-text whole-text fallback — the SQL mirror
    * of the kernels' shingling (ShingleHashesExpr /
    * Md5ShingleHashesExpr). */
  private val duckShinglesCte: String =
    """tk AS (SELECT doc_id, string_split(text, ' ') AS tk, text FROM documents),
      |sh AS (
      |  SELECT doc_id,
      |    CASE WHEN len(tk) >= 3 THEN
      |      list_distinct(list_transform(range(1, len(tk) - 1),
      |        i -> array_to_string(tk[i:i+2], ' ')))
      |    ELSE [text] END AS shingles
      |  FROM tk)""".stripMargin

  /** The MD5-shingle-hash MinHash+LSH variant (Md5ShingleHashesExpr):
    * the identical banding pipeline, but every stage — shingle
    * hashing, the 64-permutation signature, band keys, the
    * bucket-size cap, candidate pairs, and the verification Jaccard
    * over hashed shingle sets — is replayed in DuckDB, so the whole
    * LSH path is hash-match-verified cross-engine (the xxhash64
    * production variant above is pinned by ScalaTest instead, DuckDB
    * having no xxhash64). */
  val qMinhashMd5 = QuerySpec(
    "q_llm_minhash_md5",
    (s, d) =>
      minhashPairs(Tables.load(s, d, "documents"),
        shingleKernel = "graft_shingle_hashes_md5")
        .orderBy(col("jac").desc, col("ida"), col("idb"))
        .limit(1000),
    Some(s"""WITH $duckShinglesCte,
            |th AS (
            |  SELECT doc_id, list_transform(shingles,
            |    t -> CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT) % 2147483647) AS th
            |  FROM sh),
            |sig AS (
            |  SELECT doc_id, th, list_transform(range(0, 64), k ->
            |    list_min(list_transform(th,
            |      h -> ((k*1000003 + 12345)*h + k*998244353 + 7) % 2147483647))) AS sig
            |  FROM th),
            |bands AS (
            |  SELECT doc_id, unnest(list_transform(range(0, 16),
            |    b -> b::VARCHAR || ':' || array_to_string(sig[b*4+1:b*4+4], ','))) AS band_key
            |  FROM sig),
            |ok AS (
            |  SELECT band_key FROM bands GROUP BY band_key
            |  HAVING count(*) > 1 AND count(*) <= 100),
            |cand AS (
            |  SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb
            |  FROM bands a JOIN bands b
            |    ON a.band_key = b.band_key AND a.doc_id < b.doc_id
            |  WHERE a.band_key IN (SELECT band_key FROM ok)),
            |scored AS (
            |  SELECT c.ida, c.idb,
            |    len(list_intersect(ta.th, tb.th)) /
            |    len(list_distinct(list_concat(ta.th, tb.th))) AS jac
            |  FROM cand c
            |  JOIN th ta ON ta.doc_id = c.ida
            |  JOIN th tb ON tb.doc_id = c.idb)
            |SELECT ida, idb, jac FROM scored WHERE jac >= 0.5
            |ORDER BY jac DESC, ida, idb LIMIT 1000""".stripMargin))

  // ---- SimHash -----------------------------------------------------------

  /** 64-bit SimHash over a token-hash array column named `th`: bit i is
    * the sign of the sum of (±1) votes from each token's xxhash64 bit
    * i. Pure SQL expressions; `pmod(shiftright(h, i), 2)` is the
    * two's-complement bit test. */
  val simhash64OfTh: Column = expr(
    """aggregate(sequence(0, 63), CAST(0 AS BIGINT), (acc, i) ->
      |  acc + IF(aggregate(th, CAST(0 AS BIGINT),
      |             (s, h) -> s + (pmod(shiftright(h, i), 2) * 2 - 1)) > 0,
      |           shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT)))""".stripMargin)

  /** Near-dup pairs by SimHash over word-trigram shingles: bucket on
    * 4×16-bit bands (any matching band → candidate), verify with
    * hamming distance via bit_count(xor) — the classic "hamming ≤ k
    * implies some band equal" pigeonhole. Bucket cap as in
    * [[minhashPairs]]. */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3, maxBucket: Int = 100,
      shingleKernel: String = "graft_shingle_hashes"): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val withSim = spreadSmallInput(docs)
      .select(col("doc_id"),
        call_udf(shingleKernel, col("text"), lit(3), lit(false)).as("th"))
      .withColumn("simhash", call_udf("graft_simhash64", col("th")))
    val banded = withSim.select(col("doc_id"), col("simhash"),
      explode(expr(
        """transform(sequence(0, 3), b ->
          |  concat(b, ':', pmod(shiftright(simhash, b * 16), 65536)))""".stripMargin))
        .as("band_key"))
    // capped collect (BoundedCollectAggExpr): mass-duplicated docs
    // share all 4 bands — buffer state tops out at maxBucket+1 on any
    // task, saturated buckets eval to NULL and drop (see
    // minhashPairsFromSigs)
    val pairs = banded.groupBy(col("band_key"))
      .agg(sort_array(call_udf("graft_collect_capped",
        struct(col("doc_id"), col("simhash")), lit(maxBucket))).as("xs"))
      .filter(col("xs").isNotNull && size(col("xs")) > 1)
      .select(explode(expr(
        """flatten(transform(xs, (x, i) ->
          |  transform(slice(xs, i + 2, size(xs)), y ->
          |    struct(x.doc_id AS ida, y.doc_id AS idb,
          |           bit_count(x.simhash ^ y.simhash) AS hamming))))""".stripMargin)).as("p"))
      .select(col("p.ida").as("ida"), col("p.idb").as("idb"), col("p.hamming").as("hamming"))
      .distinct()
    pairs.filter(col("hamming") <= maxHamming)
  }

  val qSimhash = QuerySpec(
    "q_llm_simhash",
    (s, d) =>
      simhashPairs(Tables.load(s, d, "documents"))
        .orderBy(col("hamming"), col("ida"), col("idb"))
        .limit(1000),
    None)

  /** The MD5-shingle-hash SimHash variant: 63-bit per-shingle hashes
    * (see Md5ShingleHashesExpr — bit 63 of the sketch is constantly 0)
    * through the identical band/verify pipeline, fully replayed in
    * DuckDB: sketch construction, the 4×16-bit band pigeonhole, the
    * bucket cap, and the bit_count(xor) hamming verification all
    * hash-match cross-engine. */
  val qSimhashMd5 = QuerySpec(
    "q_llm_simhash_md5",
    (s, d) =>
      simhashPairs(Tables.load(s, d, "documents"),
        shingleKernel = "graft_shingle_hashes_md5")
        .orderBy(col("hamming"), col("ida"), col("idb"))
        .limit(1000),
    Some(s"""WITH $duckShinglesCte,
            |th AS (
            |  SELECT doc_id, list_transform(shingles, t ->
            |    CAST((CAST(('0x' || substr(md5(t), 1, 16)) AS UBIGINT) >> 1) AS BIGINT)) AS th
            |  FROM sh),
            |sim AS (
            |  SELECT doc_id,
            |    list_reduce(list_prepend(CAST(0 AS BIGINT),
            |      list_transform(range(0, 64), i ->
            |        CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT),
            |            list_transform(th, h -> ((h >> i) & 1) * 2 - 1)),
            |            (a, x) -> a + x) > 0
            |        THEN (CAST(1 AS BIGINT) << i) ELSE CAST(0 AS BIGINT) END)),
            |      (a, x) -> a + x) AS simhash
            |  FROM th),
            |bands AS (
            |  SELECT doc_id, simhash, unnest(list_transform(range(0, 4),
            |    b -> b::VARCHAR || ':' || ((simhash >> (b*16)) % 65536)::VARCHAR)) AS band_key
            |  FROM sim),
            |ok AS (
            |  SELECT band_key FROM bands GROUP BY band_key
            |  HAVING count(*) > 1 AND count(*) <= 100),
            |cand AS (
            |  SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb,
            |    CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
            |  FROM bands a JOIN bands b
            |    ON a.band_key = b.band_key AND a.doc_id < b.doc_id
            |  WHERE a.band_key IN (SELECT band_key FROM ok))
            |SELECT ida, idb, hamming FROM cand WHERE hamming <= 3
            |ORDER BY hamming, ida, idb LIMIT 1000""".stripMargin))

  // ---- dedup clusters (connected components over near-dup pairs) ---------

  /** Connected components over an undirected pair list `(ida, idb)` by
    * iterative min-label propagation: every node starts labeled with
    * its own id; each round every node takes the min of its own and
    * its neighbors' labels; at fixpoint each component is labeled with
    * its minimum member id — the canonical representative.
    *
    * Scale shape: each round is ONE shuffle keyed on node id (join +
    * min-aggregate), with `localCheckpoint` truncating the lineage so
    * plan depth stays constant across rounds. Rounds needed = max
    * component diameter, which for near-dup clusters (dense blobs of
    * mutual duplicates) is small; for adversarially long chains the
    * known upgrade path is alternating star contraction (O(log n)
    * rounds), same per-round shuffle shape. Convergence is detected by
    * counting changed labels, so the `maxIter` cap is a guard, not a
    * tuning knob.
    *
    * `reliable = true` uses reliable checkpoints (requires
    * `sparkContext.setCheckpointDir`) instead of `localCheckpoint`:
    * local checkpoints live in executor storage, so on a real cluster
    * a lost executor kills the job mid-iteration — fine for short
    * local runs, wrong for a 100 TB multi-hour clustering pass.
    *
    * Returns `(id, cluster_id)` for every node present in `pairs`. */
  /** Release the storage behind an eagerly checkpointed DataFrame once
    * no later round can re-read it: unpersists the local-checkpoint
    * blocks (they otherwise accumulate O(rounds) in executor storage)
    * and deletes reliable-checkpoint files (the cleaner only removes
    * them under `spark.cleaner.referenceTracking.cleanCheckpoints`,
    * which defaults false). Safe ONLY after every consumer of `df` has
    * itself been materialized. */
  private[llm] def freeCheckpoint(df: DataFrame): Unit =
    df.queryExecution.logical.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.foreach { rdd =>
      rdd.getCheckpointFile.foreach { f =>
        val p = new org.apache.hadoop.fs.Path(f)
        p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
          .delete(p, true)
      }
      rdd.unpersist(blocking = false)
    }

  def connectedComponents(pairs: DataFrame, maxIter: Int = 50,
      reliable: Boolean = false): DataFrame = {
    def ck(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint(true) else df.localCheckpoint(true)
    // CHECKPOINTED, not persisted (round 14): a persisted edges frame
    // keeps its full upstream LOGICAL plan (in the curate composition:
    // the gate + LSH + verification lineage, hundreds of nodes), and
    // every round's new plan embeds it twice — Catalyst re-analyzes
    // and re-optimizes the whole tree per round, measured ~600 ms of
    // DRIVER time per round at sf0.1 against ~50 ms of actual task
    // work. The checkpoint truncates the lineage to a LogicalRDD, so
    // each round plans a three-node tree; the materialization job is
    // the same one the persist paid on first use.
    val edges = ck(pairs
      .select(col("ida").cast("long").as("src"), col("idb").cast("long").as("dst"))
      .union(pairs.select(col("idb").cast("long"), col("ida").cast("long")))
      .distinct())
    // Convergence detection (round 15) uses the star variant's
    // fingerprint trick on the LABEL frame: cardinality + order-
    // independent XOR of per-row hashes, observed on the checkpoint
    // materialization. The previous shape re-joined each round's
    // result against the OLD labels frame just to count changed rows —
    // an extra per-round join (and an Exchange of the old frame).
    // Fingerprint equality is necessary but not sufficient, so a
    // claimed fixpoint is confirmed with ONE exact set-difference
    // anti join (runs once, on the final round; a colliding
    // non-fixpoint merely loops on) — labels are bit-identical.
    def labelMetrics: Seq[Column] = Seq(
      count(lit(1)).as("n_labels"),
      bit_xor(xxhash64(col("id"), col("cluster_id"))).as("x_labels"))
    def xOf(o: org.apache.spark.sql.Observation): Long =
      o.get("x_labels") match { case null => 0L; case x => x.asInstanceOf[Long] }
    // round 0 folds the first neighbor-min in directly: label = min(id,
    // neighbors), one round fewer to converge
    val obs0 = new org.apache.spark.sql.Observation()
    var labels = edges
      .groupBy(col("src").as("id"))
      .agg(least(min(col("dst")), col("src")).as("cluster_id"))
      .observe(obs0, labelMetrics.head, labelMetrics.tail: _*)
      .transform(ck)
    var prevN = obs0.get("n_labels").asInstanceOf[Long]
    var prevX = xOf(obs0)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // neighbor labels flow along edges; min with the node's own label.
      // The fingerprint rides the checkpoint materialization as an
      // observed metric — one Spark job per round, not two.
      pairs.sparkSession.sparkContext.setJobDescription(s"cc round $i")
      val viaEdges = edges
        .join(labels.select(col("id").as("src"), col("cluster_id")), "src")
        .select(col("dst").as("id"), col("cluster_id"))
      val obs = new org.apache.spark.sql.Observation()
      val next = labels.select(col("id"), col("cluster_id"))
        .union(viaEdges)
        .groupBy(col("id"))
        .agg(min(col("cluster_id")).as("cluster_id"))
        .observe(obs, labelMetrics.head, labelMetrics.tail: _*)
        .transform(ck)
      val nextN = obs.get("n_labels").asInstanceOf[Long]
      val nextX = xOf(obs)
      // the id set is fixed (every node of `edges`), and labels only
      // decrease — so labels-unchanged ⟺ multiset equality, claimed
      // by the fingerprint and confirmed exactly below
      converged = nextN == prevN && nextX == prevX &&
        next.join(labels, Seq("id", "cluster_id"), "left_anti").isEmpty
      freeCheckpoint(labels) // next is materialized; round i−1's blocks are dead
      labels = next
      prevN = nextN
      prevX = nextX
      i += 1
    }
    pairs.sparkSession.sparkContext.setJobDescription(null)
    freeCheckpoint(edges)
    labels
  }

  /** Connected components by alternating large-star / small-star
    * contraction (the MapReduce CC algorithm of Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC'14):
    * converges in O(log n) rounds on ANY graph — including the long
    * chains that cost min-label propagation ([[connectedComponents]])
    * diameter-many rounds — with the same per-round shuffle shape.
    *
    *  - large-star: every node links its LARGER neighbors to its
    *    minimum neighborhood label;
    *  - small-star: every node links its smaller-or-equal neighbors to
    *    that label.
    *
    * Both are a window-min over the edge list keyed on the center node
    * plus a projection — NO collect_list, so a hot node (a near-dup
    * blob's hub) never materializes its neighbor list on one task.
    * Fixpoint: the edge multiset is star-shaped and stable; labels are
    * then each node's remaining neighbor minimum. Equivalence with
    * min-label propagation is property-pinned in ScalaTest; rounds are
    * logarithmic where propagation's are linear (chain test). */
  def connectedComponentsStar(pairs: DataFrame, maxIter: Int = 50,
      reliable: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def ck(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint(true) else df.localCheckpoint(true)
    // The per-round edge-set fingerprint: cardinality + order-independent
    // XOR of per-edge hashes. Both ride the checkpoint materialization as
    // observed metrics, so convergence detection costs NO extra Spark
    // jobs — the definitive set-equality join below runs only once, when
    // the fingerprints first claim a fixpoint.
    def edgeMetrics: Seq[Column] = Seq(
      count(lit(1)).as("n_edges"),
      bit_xor(xxhash64(col("u"), col("v"))).as("x_edges"))
    // undirected edge list, self-loops kept out; u is the center node
    val obs0 = new org.apache.spark.sql.Observation()
    var edges = pairs
      .select(col("ida").cast("long").as("u"), col("idb").cast("long").as("v"))
      .union(pairs.select(col("idb").cast("long"), col("ida").cast("long")))
      .filter(col("u") =!= col("v"))
      .distinct()
      .observe(obs0, edgeMetrics.head, edgeMetrics.tail: _*)
      .transform(ck)
    var prevN = obs0.get("n_edges").asInstanceOf[Long]
    var prevX = obs0.get("x_edges") match { case null => 0L; case x => x.asInstanceOf[Long] }
    val wU = Window.partitionBy(col("u"))
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // large-star: (v, m) for v > u, where m = min(N(u) ∪ {u})
      val large = edges
        .withColumn("m", least(min(col("v")).over(wU), col("u")))
        .filter(col("v") > col("u") && col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
      val undirectedL = large.union(large.select(col("v"), col("u")))
        .filter(col("u") =!= col("v")).distinct().transform(ck)
      // small-star: (v, m) for v < u (and u itself when m changed)
      val small = undirectedL
        .withColumn("m", least(min(col("v")).over(wU), col("u")))
        .filter(col("v") < col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(undirectedL
          .withColumn("m", least(min(col("v")).over(wU), col("u")))
          .select(col("u"), col("m").as("v")))
      val obs = new org.apache.spark.sql.Observation()
      val next = small.union(small.select(col("v"), col("u")))
        .filter(col("u") =!= col("v")).distinct()
        .observe(obs, edgeMetrics.head, edgeMetrics.tail: _*)
        .transform(ck)
      val nextN = obs.get("n_edges").asInstanceOf[Long]
      val nextX = obs.get("x_edges") match { case null => 0L; case x => x.asInstanceOf[Long] }
      // fixpoint when the canonical (undirected) edge set is stable.
      // Fingerprint equality is necessary but (theoretically) not
      // sufficient, so a claimed fixpoint is confirmed with one exact
      // set-difference join — correctness never rests on the hash; a
      // colliding non-fixpoint merely costs one extra job and loops on.
      converged = nextN == prevN && nextX == prevX &&
        next.join(edges, Seq("u", "v"), "left_anti").isEmpty
      freeCheckpoint(undirectedL) // dead once next is materialized
      freeCheckpoint(edges)       // ditto (the confirm join above already ran)
      edges = next
      prevN = nextN
      prevX = nextX
      i += 1
    }
    // star-shaped fixpoint: each non-root points at its component root
    edges
      .groupBy(col("u").as("id"))
      .agg(least(min(col("v")), col("u")).as("cluster_id"))
  }

  /** The keep-list: one canonical survivor (the min doc_id) per
    * near-dup cluster, all other members marked for drop. Docs that
    * appear in no pair are implicitly kept (they are their own
    * cluster). */
  def dedupKeepList(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val drop = connectedComponents(pairs)
      .filter(col("id") =!= col("cluster_id"))
      .select(col("id").as("doc_id"))
    docs.join(drop, Seq("doc_id"), "left_anti")
  }

  /** Quality-aware cluster representative selection: keep the doc
    * maximizing `score` per near-dup cluster (ties → lowest doc_id)
    * instead of keep-list's arbitrary min-id survivor — the production
    * dedup policy ("keep the longest / highest-quality copy") used by
    * web-scale curation pipelines. `score` is any Column over the doc
    * row (length(text), a quality signal, a source-priority rank).
    *
    * With score = -doc_id the winner is the min id, so this reduces to
    * dedupKeepList exactly (ScalaTest-pinned equivalence).
    *
    * Scale shape: only the graph-member slice (docs that appear in a
    * pair — tiny vs the corpus) carries its score through the
    * per-cluster shuffle, and max_by is a declarative aggregate
    * (map-side combinable, constant state). The corpus itself sees one
    * anti join on doc_id — identical to dedupKeepList's shape. */
  def dedupKeepBest(docs: DataFrame, pairs: DataFrame, score: Column): DataFrame =
    docs.join(keepBestDropIds(docs, connectedComponents(pairs), score),
      Seq("doc_id"), "left_anti")

  /** The drop list under the max-score survivor policy, given a
    * cluster assignment (id, cluster_id) — exposed separately so the
    * Pipeline composition can swap survivor policies over ONE CC run. */
  def keepBestDropIds(docs: DataFrame, clusters: DataFrame,
      score: Column): DataFrame = {
    val winners = docs
      .join(clusters.withColumnRenamed("id", "doc_id"), Seq("doc_id"))
      .groupBy(col("cluster_id"))
      .agg(max_by(col("doc_id"),
        struct(score.as("s"), (-col("doc_id")).as("t"))).as("doc_id"))
    // the drop side starts from the tiny cluster-id frame, NOT the
    // corpus-joined members frame — the corpus join runs once (for the
    // winners' scores), and graph ids absent from docs are no-ops in
    // the caller's anti join
    clusters.select(col("id").as("doc_id"))
      .join(winners.select(col("doc_id")), Seq("doc_id"), "left_anti")
  }

  /** Oracle'd: over the bounded Jaccard block pairs the component
    * assignment is expressible in DuckDB as a recursive transitive
    * closure with min-reachable-id labeling. */
  val qDedupClusters = QuerySpec(
    "q_llm_dedup_clusters",
    (s, d) =>
      connectedComponents(jaccardBlockPairs(Tables.load(s, d, "documents")))
        .select(col("id").as("doc_id"), col("cluster_id"))
        .orderBy(col("doc_id")),
    Some("""WITH RECURSIVE pairs AS (
           |  SELECT a.doc_id AS ida, b.doc_id AS idb
           |  FROM documents a JOIN documents b
           |    ON a.lang = b.lang AND a.doc_id < b.doc_id
           |  WHERE a.doc_id < 200 AND b.doc_id < 200
           |    AND len(list_intersect(list_distinct(string_split(a.text, ' ')),
           |                           list_distinct(string_split(b.text, ' ')))) /
           |        len(list_distinct(list_concat(string_split(a.text, ' '),
           |                                      string_split(b.text, ' ')))) >= 0.5
           |), edges AS (
           |  SELECT ida AS a, idb AS b FROM pairs
           |  UNION SELECT idb, ida FROM pairs
           |), reach(a, b) AS (
           |  SELECT a, a FROM (SELECT DISTINCT a FROM edges) t
           |  UNION
           |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
           |)
           |SELECT a AS doc_id, min(b) AS cluster_id
           |FROM reach GROUP BY a ORDER BY doc_id""".stripMargin))

  /** The end-to-end dedup deliverable as a first-class query: the
    * keep-list over the bounded Jaccard pairs — every unpaired doc plus
    * one canonical survivor (min doc_id) per near-dup cluster. This is
    * the query a pipeline actually materializes (the filtered corpus);
    * clusters/pairs above are its diagnostics. */
  val qKeepList = QuerySpec(
    "q_llm_keep_list",
    (s, d) => {
      val docs = Tables.load(s, d, "documents")
      dedupKeepList(docs, jaccardBlockPairs(docs))
        .select(col("doc_id"), col("source"), col("lang"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH RECURSIVE pairs AS (
           |  SELECT a.doc_id AS ida, b.doc_id AS idb
           |  FROM documents a JOIN documents b
           |    ON a.lang = b.lang AND a.doc_id < b.doc_id
           |  WHERE a.doc_id < 200 AND b.doc_id < 200
           |    AND len(list_intersect(list_distinct(string_split(a.text, ' ')),
           |                           list_distinct(string_split(b.text, ' ')))) /
           |        len(list_distinct(list_concat(string_split(a.text, ' '),
           |                                      string_split(b.text, ' ')))) >= 0.5
           |), edges AS (
           |  SELECT ida AS a, idb AS b FROM pairs
           |  UNION SELECT idb, ida FROM pairs
           |), reach(a, b) AS (
           |  SELECT a, a FROM (SELECT DISTINCT a FROM edges) t
           |  UNION
           |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
           |), drop_ids AS (
           |  SELECT a FROM reach GROUP BY a HAVING a <> min(b)
           |)
           |SELECT doc_id, source, lang FROM documents
           |WHERE doc_id NOT IN (SELECT a FROM drop_ids)
           |ORDER BY doc_id""".stripMargin))

  /** Keep-best over the same bounded pairs, scored by text length —
    * "keep the longest copy", the policy real pipelines prefer over
    * min-id because near-dup clusters usually contain one full document
    * plus truncated variants. Winner per cluster = max length, ties →
    * lowest doc_id; DuckDB replays the closure then ranks members with
    * the identical (len DESC, doc_id ASC) ordering. */
  val qKeepBest = QuerySpec(
    "q_llm_keep_best",
    (s, d) => {
      val docs = Tables.load(s, d, "documents")
      dedupKeepBest(docs, jaccardBlockPairs(docs), length(col("text")))
        .select(col("doc_id"), col("source"), col("lang"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH RECURSIVE pairs AS (
           |  SELECT a.doc_id AS ida, b.doc_id AS idb
           |  FROM documents a JOIN documents b
           |    ON a.lang = b.lang AND a.doc_id < b.doc_id
           |  WHERE a.doc_id < 200 AND b.doc_id < 200
           |    AND len(list_intersect(list_distinct(string_split(a.text, ' ')),
           |                           list_distinct(string_split(b.text, ' ')))) /
           |        len(list_distinct(list_concat(string_split(a.text, ' '),
           |                                      string_split(b.text, ' ')))) >= 0.5
           |), edges AS (
           |  SELECT ida AS a, idb AS b FROM pairs
           |  UNION SELECT idb, ida FROM pairs
           |), reach(a, b) AS (
           |  SELECT a, a FROM (SELECT DISTINCT a FROM edges) t
           |  UNION
           |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
           |), members AS (
           |  SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a
           |), ranked AS (
           |  SELECT m.doc_id,
           |    row_number() OVER (PARTITION BY m.cluster_id
           |      ORDER BY len(d.text) DESC, m.doc_id ASC) AS rn
           |  FROM members m JOIN documents d ON m.doc_id = d.doc_id
           |), drop_ids AS (
           |  SELECT doc_id FROM ranked WHERE rn > 1
           |)
           |SELECT doc_id, source, lang FROM documents
           |WHERE doc_id NOT IN (SELECT doc_id FROM drop_ids)
           |ORDER BY doc_id""".stripMargin))

  // ---- historical-corpus dedup (bloom prefilter + exact anti join) -------

  /** Documents NOT already in a historical corpus — the incremental-
    * ingest hygiene pass ("only train on what the last crawl didn't
    * have"). Correct answer = anti join on the content hash; at 100 TB
    * the interesting part is not shuffling this crawl against ALL of
    * history to learn that most documents are new.
    *
    * Scale shape: history's 64-bit content keys fold into a BLOOM
    * FILTER via Spark's own runtime-filter aggregate (distributed
    * build, map-side partials, one ~MB-scale binary out), broadcast to
    * the corpus scan. `might_contain = false` proves a doc is NEW (no
    * false negatives) — those rows skip the shuffle entirely; only the
    * maybe-dup sliver (true dups + the configured false-positive rate)
    * reaches the exact anti join that removes bloom false positives.
    * Correctness never depends on the bloom: it shares the plain anti
    * join's oracle, result-identical by construction. */
  private val bloomViewSeq = new java.util.concurrent.atomic.AtomicLong(0)

  /** The two probe branches each scan the corpus — deliberate: two
    * NARROW parquet scans beat caching a 100 TB keyed projection, and
    * neither branch shuffles corpus-wide (the definitely-new branch is
    * scan→filter→output; only the maybe-dup sliver enters the join). */
  def newAgainstHistory(docs: DataFrame, history: DataFrame,
      expectedItems: Long = 4000000L): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    def key(c: Column) = xxhash64(contentHashHex(c))
    // might_contain requires its bloom binary as a constant or scalar
    // subquery — the subquery IS the broadcast: the distributed build's
    // single-row result feeds every probe task. View name is unique per
    // call so concurrent pipelines in one session can't cross-wire.
    val view = s"graft_hist_bloom_${bloomViewSeq.incrementAndGet()}"
    history.agg(
      call_udf("graft_bloom_agg", key(col("text")), lit(expectedItems)).as("bf"))
      .createOrReplaceTempView(view)
    val keyed = docs.withColumn("_h", contentHashHex(col("text")))
      .withColumn("_k", xxhash64(col("_h")))
    // An EMPTY history aggregates to a null bloom, and might_contain
    // over null is null — which would make BOTH branches drop every
    // row. A null bloom means "nothing in history": probe = false.
    val probe = coalesce(expr(
      s"graft_bloom_might_contain((SELECT bf FROM $view), _k)"), lit(false))
    val definitelyNew = keyed.filter(!probe)
    val maybeDup = keyed.filter(probe)
      .join(history.select(contentHashHex(col("text")).as("_h")).distinct(),
        Seq("_h"), "left_anti")
    definitelyNew.unionByName(maybeDup).drop("_k")
      .withColumnRenamed("_h", "text_hash")
  }

  /** Shares the exact anti join's oracle — the bloom is a pure
    * prefilter, so the result is identical however it is sized. */
  val qHistDedup = QuerySpec(
    "q_llm_hist_dedup",
    (s, d) => {
      val docs = Tables.load(s, d, "documents")
      newAgainstHistory(docs.filter(col("doc_id") >= 250),
        docs.filter(col("doc_id") < 250))
        .select(col("doc_id"), col("text_hash"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id, sha256(text) AS text_hash
           |FROM documents
           |WHERE doc_id >= 250 AND sha256(text) NOT IN
           |  (SELECT sha256(text) FROM documents WHERE doc_id < 250)
           |ORDER BY doc_id""".stripMargin))

  /** The FUZZY companion of [[newAgainstHistory]]: new documents that
    * near-duplicate ANY history document (rewrites, boilerplate
    * variants, truncations — content-hash equality misses all of
    * them). MinHash banding runs over the union; candidate pairs are
    * filtered to cross-corpus ones; each flagged new doc reports its
    * best history match (highest verified Jaccard, ties to the lowest
    * history id — deterministic).
    *
    * Scale shape: inherits minhashPairs end to end — signatures
    * persisted once over the union, capped band buckets, hashed-long
    * verification. The cross filter and best-match rollup add one
    * doc_id-keyed aggregate over the (tiny) verified-pair set. */
  def nearDupAgainstHistory(docs: DataFrame, history: DataFrame,
      threshold: Double = 0.5, maxBucket: Int = 100,
      shingleKernel: String = "graft_shingle_hashes",
      temps: TempCache = TempCache.noop): DataFrame = {
    val union = docs.select(col("doc_id"), col("text"))
      .unionByName(history.select(col("doc_id"), col("text")))
    val pairs = minhashPairs(union, threshold = threshold,
      maxBucket = maxBucket, shingleKernel = shingleKernel, temps = temps)
    crossCorpusBestMatch(pairs, docs.select(col("doc_id")),
      history.select(col("doc_id")))
  }

  /** The recurring-run form of [[nearDupAgainstHistory]]: history
    * arrives as its PRECOMPUTED signature frame `(doc_id, th, sig)`
    * ([[minhashSignatures]], persisted once via
    * [[graft.sources.Warehouse.writeBucketed]]), so the nightly pass
    * hashes only the new slice — at 100 TB of history, re-running the
    * shingle+signature kernels over the full union every night is the
    * dominant cost this variant deletes. Result-identical to the
    * recompute path (the kernels are content-deterministic; pinned in
    * TextDedupSpec).
    *
    * CONTRACT: `numPerm` and `shingleKernel` MUST match the run that
    * built `historySigs` — record both with the warehouse table. A
    * history signature whose length differs from `numPerm` RAISES at
    * execution (same guard as the streaming twin,
    * [[StreamingCuration.streamingHistNearDupBanded]]): out-of-range
    * band slices would otherwise make degenerate shared buckets that
    * saturate and silently DROP candidate pairs. Kernel identity is
    * not detectable from the frame (same hash width either way), so
    * that half stays a documented caller obligation. */
  def nearDupAgainstHistorySigs(docs: DataFrame, historySigs: DataFrame,
      numPerm: Int = 64, threshold: Double = 0.5, maxBucket: Int = 100,
      shingleKernel: String = "graft_shingle_hashes",
      temps: TempCache = TempCache.noop): DataFrame = {
    // guard evaluates once: it rides the persisted union's one
    // materialization, not a separate action
    val guardedHist = historySigs.select(col("doc_id"), col("th"),
      when(size(col("sig")) === numPerm, col("sig"))
        .otherwise(raise_error(concat(
          lit("history signature length "), size(col("sig")).cast("string"),
          lit(s" != numPerm $numPerm: history sigs were built with a " +
            "different permutation count")))).as("sig"))
    val unionSigs = temps.register(
      minhashSignatures(docs, numPerm, shingleKernel)
        .unionByName(guardedHist)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val pairs = minhashPairsFromSigs(unionSigs, numPerm,
      threshold = threshold, maxBucket = maxBucket)
    crossCorpusBestMatch(pairs, docs.select(col("doc_id")),
      historySigs.select(col("doc_id")))
  }

  /** Cross-corpus filter + best-match rollup shared by both history
    * variants. PRECONDITION: the two id spaces are disjoint — an id
    * present on both sides would carry both tags, duplicating its
    * joined pairs and corrupting the cross filter. The tag aggregate
    * ENFORCES it: any id seen with both tags raises at execution time
    * (no extra action — the check rides the tag build the join needs
    * anyway, and the id-only aggregate is map-side combinable). */
  private def crossCorpusBestMatch(pairs: DataFrame, newIds: DataFrame,
      histIds: DataFrame): DataFrame = {
    val tags = newIds.select(col("doc_id"), lit(true).as("is_new"))
      .unionByName(histIds.select(col("doc_id"), lit(false).as("is_new")))
      .groupBy(col("doc_id"))
      .agg(min(col("is_new")).as("mn"), max(col("is_new")).as("mx"))
      .select(col("doc_id"),
        when(col("mn") === col("mx"), col("mn"))
          .otherwise(raise_error(concat(lit("doc_id "), col("doc_id"),
            lit(" present in BOTH docs and history: the id spaces must " +
              "be disjoint")))).as("is_new"))
    pairs
      .join(tags.select(col("doc_id").as("ida"), col("is_new").as("na")), Seq("ida"))
      .join(tags.select(col("doc_id").as("idb"), col("is_new").as("nb")), Seq("idb"))
      .filter(col("na") =!= col("nb"))
      .select(
        when(col("na"), col("ida")).otherwise(col("idb")).as("doc_id"),
        when(col("na"), col("idb")).otherwise(col("ida")).as("matched_history_id"),
        col("jac"))
      .groupBy(col("doc_id"))
      .agg(
        max_by(col("matched_history_id"),
          struct(col("jac"), (-col("matched_history_id")).as("n")))
          .as("matched_history_id"),
        max(col("jac")).as("jac"))
  }

  /** Oracle'd end-to-end on the MD5 kernel (the qMinhashMd5 replay
    * plus the cross filter and best-match window). */
  val qHistNearDup = QuerySpec(
    "q_llm_hist_neardup",
    (s, d) => {
      val docs = Tables.load(s, d, "documents")
      nearDupAgainstHistory(docs.filter(col("doc_id") >= 250),
        docs.filter(col("doc_id") < 250),
        shingleKernel = "graft_shingle_hashes_md5")
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH $duckShinglesCte,
            |th AS (
            |  SELECT doc_id, list_transform(shingles,
            |    t -> CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT) % 2147483647) AS th
            |  FROM sh),
            |sig AS (
            |  SELECT doc_id, th, list_transform(range(0, 64), k ->
            |    list_min(list_transform(th,
            |      h -> ((k*1000003 + 12345)*h + k*998244353 + 7) % 2147483647))) AS sig
            |  FROM th),
            |bands AS (
            |  SELECT doc_id, unnest(list_transform(range(0, 16),
            |    b -> b::VARCHAR || ':' || array_to_string(sig[b*4+1:b*4+4], ','))) AS band_key
            |  FROM sig),
            |ok AS (
            |  SELECT band_key FROM bands GROUP BY band_key
            |  HAVING count(*) > 1 AND count(*) <= 100),
            |cand AS (
            |  SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb
            |  FROM bands a JOIN bands b
            |    ON a.band_key = b.band_key AND a.doc_id < b.doc_id
            |  WHERE a.band_key IN (SELECT band_key FROM ok)),
            |scored AS (
            |  SELECT c.ida, c.idb,
            |    len(list_intersect(ta.th, tb.th)) /
            |    len(list_distinct(list_concat(ta.th, tb.th))) AS jac
            |  FROM cand c
            |  JOIN th ta ON ta.doc_id = c.ida
            |  JOIN th tb ON tb.doc_id = c.idb),
            |cross_pairs AS (
            |  SELECT CASE WHEN ida >= 250 THEN ida ELSE idb END AS doc_id,
            |    CASE WHEN ida >= 250 THEN idb ELSE ida END AS matched_history_id,
            |    jac
            |  FROM scored
            |  WHERE jac >= 0.5 AND ((ida < 250) <> (idb < 250)))
            |SELECT doc_id, matched_history_id, jac FROM cross_pairs
            |QUALIFY row_number() OVER (PARTITION BY doc_id
            |  ORDER BY jac DESC, matched_history_id) = 1
            |ORDER BY doc_id""".stripMargin))

  /** Train/test SPLIT LEAKAGE: held-out documents whose near-duplicate
    * sits in the training split — the eval-integrity check exact
    * decontamination misses (a rewrite of a training doc in the test
    * set still leaks). Pure composition: the deterministic content-hash
    * split partitions the corpus, and [[nearDupAgainstHistory]] treats
    * the held-out side as "docs" and the training side as "history",
    * so every flagged row is (test doc, its best training-side match).
    * Same scale shape as the history variants; the split predicate is
    * the per-row [[Curation.hashBucket]] — no extra shuffle. */
  val qSplitLeak = QuerySpec(
    "q_llm_split_leak",
    (s, d) => {
      val docs = Tables.load(s, d, "documents")
      val b = Curation.hashBucket(col("text"))
      nearDupAgainstHistory(docs.filter(b >= 90), docs.filter(b < 90),
        shingleKernel = "graft_shingle_hashes_md5")
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH $duckShinglesCte,
            |th AS (
            |  SELECT doc_id, list_transform(shingles,
            |    t -> CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT) % 2147483647) AS th
            |  FROM sh),
            |sig AS (
            |  SELECT doc_id, th, list_transform(range(0, 64), k ->
            |    list_min(list_transform(th,
            |      h -> ((k*1000003 + 12345)*h + k*998244353 + 7) % 2147483647))) AS sig
            |  FROM th),
            |bands AS (
            |  SELECT doc_id, unnest(list_transform(range(0, 16),
            |    b -> b::VARCHAR || ':' || array_to_string(sig[b*4+1:b*4+4], ','))) AS band_key
            |  FROM sig),
            |ok AS (
            |  SELECT band_key FROM bands GROUP BY band_key
            |  HAVING count(*) > 1 AND count(*) <= 100),
            |cand AS (
            |  SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb
            |  FROM bands a JOIN bands b
            |    ON a.band_key = b.band_key AND a.doc_id < b.doc_id
            |  WHERE a.band_key IN (SELECT band_key FROM ok)),
            |scored AS (
            |  SELECT c.ida, c.idb,
            |    len(list_intersect(ta.th, tb.th)) /
            |    len(list_distinct(list_concat(ta.th, tb.th))) AS jac
            |  FROM cand c
            |  JOIN th ta ON ta.doc_id = c.ida
            |  JOIN th tb ON tb.doc_id = c.idb),
            |sp AS (
            |  SELECT doc_id,
            |    CAST(('0x' || substr(sha256(text), 1, 4)) AS BIGINT) % 100 >= 90
            |      AS is_test
            |  FROM documents),
            |cross_pairs AS (
            |  SELECT CASE WHEN sa.is_test THEN ida ELSE idb END AS doc_id,
            |    CASE WHEN sa.is_test THEN idb ELSE ida END AS matched_history_id,
            |    jac
            |  FROM scored
            |  JOIN sp sa ON sa.doc_id = scored.ida
            |  JOIN sp sb ON sb.doc_id = scored.idb
            |  WHERE jac >= 0.5 AND sa.is_test <> sb.is_test)
            |SELECT doc_id, matched_history_id, jac FROM cross_pairs
            |QUALIFY row_number() OVER (PARTITION BY doc_id
            |  ORDER BY jac DESC, matched_history_id) = 1
            |ORDER BY doc_id""".stripMargin))

  // ---- benchmark contamination ------------------------------------------

  /** Benchmark-contamination detection: documents sharing any word
    * n-gram (default 8 — the eval-decontamination convention) with a
    * benchmark set, with the shared-shingle count as evidence. The
    * standard pre-training hygiene pass: anything overlapping the eval
    * suite is flagged (and typically dropped via the keep-list
    * machinery above).
    *
    * Scale shape: the benchmark (an eval suite — thousands of docs) is
    * tiny next to the corpus, so its distinct shingle-hash set is
    * BROADCAST; the corpus is scanned once, exploded to hashed
    * shingles, and the overlap count is a map-side-combined groupBy on
    * doc_id. Nothing corpus-sized shuffles except flagged hits. MD5
    * shingle hashes (Md5ShingleHashesExpr) keep the whole operator
    * DuckDB-verifiable; the kernel's distinct-shingle output makes
    * count(*) a distinct-overlap count with no extra dedup. */
  def contamination(docs: DataFrame, benchmark: DataFrame, n: Int = 8,
      minOverlap: Int = 1): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    def shingles(df: DataFrame) = df.select(col("doc_id"),
      explode(call_udf("graft_shingle_hashes_md5",
        col("text"), lit(n), lit(true))).as("h"))
    val benchSet = shingles(benchmark).select(col("h")).distinct()
    shingles(docs)
      .join(broadcast(benchSet), Seq("h"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_overlap"))
      .filter(col("n_overlap") >= minOverlap)
  }

  /** Benchmark = the first 10 docs; the corpus under test is everything
    * else. Fully replayed in DuckDB (8-gram md5 shingles, broadcast-set
    * semantics as a plain join). */
  val qContamination = QuerySpec(
    "q_llm_contamination",
    (s, d) => {
      val docs = Tables.load(s, d, "documents")
      contamination(docs.filter(col("doc_id") >= 10), docs.filter(col("doc_id") < 10))
        .orderBy(col("n_overlap").desc, col("doc_id"))
    },
    Some("""WITH sh AS (
           |  SELECT doc_id,
           |    CASE WHEN len(string_split(text, ' ')) >= 8 THEN
           |      list_distinct(list_transform(
           |        range(1, len(string_split(text, ' ')) - 6),
           |        i -> array_to_string((string_split(text, ' '))[i:i+7], ' ')))
           |    ELSE [text] END AS shingles
           |  FROM documents
           |), th AS (
           |  SELECT doc_id, unnest(list_transform(shingles,
           |    t -> CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT) % 2147483647)) AS h
           |  FROM sh
           |), bench AS (SELECT DISTINCT h FROM th WHERE doc_id < 10)
           |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_overlap
           |FROM th JOIN bench USING (h)
           |WHERE doc_id >= 10
           |GROUP BY doc_id
           |HAVING count(*) >= 1
           |ORDER BY n_overlap DESC, doc_id""".stripMargin))

  // ---- cross-document long-span overlap ----------------------------------

  /** Cross-document long-span overlap: pairs of documents sharing at
    * least `minShared` distinct word `n`-grams — the cross-doc form of
    * the substring-dedup hygiene pass (long verbatim spans copied
    * between documents inflate memorization; dedup work on exactly
    * this signal is public literature). `n` defaults to 10: long
    * enough that a shared n-gram is essentially never coincidence,
    * and k shared n-grams from one copied region witness a span of
    * ~n+k-1 tokens.
    *
    * Scale shape: one corpus scan exploded to per-doc DISTINCT hashed
    * n-grams (8-byte md5-derived hashes — nothing text-sized crosses
    * the wire), then COUNT-THEN-CAP: per-hash doc counts aggregate
    * first (map-side partials — a boilerplate n-gram shared by 10M
    * documents reaches its reducer as ~one partial per map task, not
    * 10M rows), the in-range hashes (1 < count ≤ `maxBucket`) semi-
    * join back onto the exploded frame, and only THEN does each
    * surviving bucket collect its doc list. collect_list has no
    * map-side reduction — partials only concatenate — so capping
    * AFTER collection would materialize the full hot-key list on one
    * task; capping by count first means a hot key never aggregates
    * anywhere. (The oracle SQL's own `buckets` CTE is this exact
    * count-based shape, so the result is identical by construction.)
    * Pair explosion stays inside the capped buckets; the pair count
    * is map-side combined. The exploded frame is persisted for its
    * two consumers (count build + probe side). */
  def spanOverlapPairs(docs: DataFrame, n: Int = 10, minShared: Int = 3,
      maxBucket: Int = 100, temps: TempCache = TempCache.noop): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val th = temps.register(spreadSmallInput(docs)
      .select(col("doc_id"),
        explode(call_udf("graft_shingle_hashes_md5",
          col("text"), lit(n), lit(true))).as("h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // the kernel emits per-doc DISTINCT shingles, so count(*) per hash
    // IS the bucket's doc count
    val inRange = th.groupBy(col("h")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > lit(1) && col("cnt") <= lit(maxBucket))
      .select(col("h"))
    th.join(inRange, Seq("h"), "left_semi")
      .groupBy(col("h"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .select(explode(expr(
        """flatten(transform(ids, (x, i) ->
          |  transform(slice(ids, i + 2, size(ids)), y -> struct(x AS ida, y AS idb))))"""
          .stripMargin)).as("p"))
      .groupBy(col("p.ida").as("ida"), col("p.idb").as("idb"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Fully replayed in DuckDB: 10-gram md5 shingles, the bucket cap,
    * and the pair counts (a self-join stands in for the capped-bucket
    * pair explosion — identical output by construction). */
  val qSpanOverlap = QuerySpec(
    "q_llm_span_overlap",
    (s, d) =>
      spanOverlapPairs(Tables.load(s, d, "documents"))
        .orderBy(col("ida"), col("idb")),
    Some("""WITH sh AS (
           |  SELECT doc_id, unnest(
           |    CASE WHEN len(string_split(text, ' ')) >= 10 THEN
           |      list_distinct(list_transform(
           |        range(1, len(string_split(text, ' ')) - 8),
           |        i -> array_to_string((string_split(text, ' '))[i:i+9], ' ')))
           |    ELSE [text] END) AS t
           |  FROM documents
           |), th AS (
           |  SELECT doc_id,
           |    CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT) % 2147483647 AS h
           |  FROM sh
           |), buckets AS (
           |  SELECT h FROM th GROUP BY h
           |  HAVING count(*) > 1 AND count(*) <= 100
           |)
           |SELECT a.doc_id AS ida, b.doc_id AS idb,
           |  CAST(count(*) AS BIGINT) AS n_shared
           |FROM th a JOIN th b USING (h) JOIN buckets USING (h)
           |WHERE a.doc_id < b.doc_id
           |GROUP BY 1, 2
           |HAVING count(*) >= 3
           |ORDER BY ida, idb""".stripMargin))

  // ---- group-level similarity via the MinHash sketch aggregate -----------

  /** Per-group MinHash signatures (the MinHashAggExpr sketch): state per
    * group is numPerm longs however large the group, merged map-side —
    * shingle sets never cross a shuffle. */
  def groupSignatures(docs: DataFrame, groupCol: String, numPerm: Int = 64,
      shingleKernel: String = "graft_shingle_hashes"): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs
      .select(col(groupCol),
        call_udf(shingleKernel, col("text"), lit(3), lit(true)).as("th"))
      .groupBy(col(groupCol))
      .agg(call_udf("graft_minhash_agg", col("th"), lit(numPerm)).as("sig"))
  }

  /** Pairwise estimated Jaccard between groups' shingle sets: equal-slot
    * fraction of the two signatures. Group count is small (sources,
    * domains, shards), so the pair join is over sketches, never docs. */
  def groupSimilarity(docs: DataFrame, groupCol: String, numPerm: Int = 64,
      shingleKernel: String = "graft_shingle_hashes",
      temps: TempCache = TempCache.noop): DataFrame = {
    // both pair-join sides read the signatures; persist the (group ×
    // numPerm·8B, i.e. KB-sized) sketch table so the corpus-wide
    // aggregation runs once, not once per side
    val sigs = temps.register(
      groupSignatures(docs, groupCol, numPerm, shingleKernel)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val a = sigs.select(col(groupCol).as("ga"), col("sig").as("sa"))
    val b = sigs.select(col(groupCol).as("gb"), col("sig").as("sb"))
    a.join(b, col("ga") < col("gb"))
      .withColumn("est_jaccard",
        expr("size(filter(zip_with(sa, sb, (x, y) -> x = y), v -> v))") / lit(numPerm))
      .select(col("ga"), col("gb"), col("est_jaccard"))
  }

  /** No oracle (sketch estimate keyed on xxhash64); agreement of the
    * aggregate with the per-document signature path and estimate sanity
    * are pinned by ScalaTest, and the md5 variant below hash-matches
    * the whole pipeline cross-engine. */
  val qSourceSim = QuerySpec(
    "q_llm_source_sim",
    (s, d) =>
      groupSimilarity(Tables.load(s, d, "documents"), "source")
        .orderBy(col("ga"), col("gb")),
    None)

  /** The group-sketch pipeline on MD5 shingle hashes, oracle'd
    * END-TO-END: per-doc signatures, the group's element-wise-min
    * sketch (MinHashAggExpr's merge = DuckDB's per-slot min over the
    * group), and the pairwise equal-slot estimate all replayed in
    * DuckDB and hash-matched. */
  val qSourceSimMd5 = QuerySpec(
    "q_llm_source_sim_md5",
    (s, d) =>
      groupSimilarity(Tables.load(s, d, "documents"), "source",
        shingleKernel = "graft_shingle_hashes_md5")
        .orderBy(col("ga"), col("gb")),
    Some(s"""WITH $duckShinglesCte,
            |th AS (
            |  SELECT d.source, sh.doc_id, list_transform(sh.shingles,
            |    t -> CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT) % 2147483647) AS th
            |  FROM sh JOIN documents d USING (doc_id)),
            |sig AS (
            |  SELECT source, doc_id, list_transform(range(0, 64), k ->
            |    list_min(list_transform(th,
            |      h -> ((k*1000003 + 12345)*h + k*998244353 + 7) % 2147483647))) AS sig
            |  FROM th),
            |slots AS (
            |  SELECT source, t.k, min(sig[t.k + 1]) AS v
            |  FROM sig, LATERAL (SELECT unnest(range(0, 64)) AS k) t
            |  GROUP BY source, t.k),
            |gsig AS (
            |  SELECT source, list(v ORDER BY k) AS g FROM slots GROUP BY source)
            |SELECT a.source AS ga, b.source AS gb,
            |  len(list_filter(list_zip(a.g, b.g), z -> z[1] = z[2])) / 64
            |    AS est_jaccard
            |FROM gsig a JOIN gsig b ON a.source < b.source
            |ORDER BY ga, gb""".stripMargin))

  /** Duplicated-substring runs (Lee et al., "Deduplicating Training
    * Data Makes Language Models Better"): for each document, the
    * longest consecutive run of trigram shingles that also appear in
    * at least one OTHER document, plus the duplicated-shingle total —
    * the exact-substring-dedup signal that catches long verbatim
    * passages MinHash's set view dilutes away (a 50-token quote inside
    * a 5000-token document barely moves Jaccard but shows up here as
    * max_dup_run ≈ 48).
    *
    * Scale shape: one scan exploded to positional 8-byte shingle
    * hashes; the cross-document frequency is a groupBy(h) aggregate
    * joined back on the same key (map-side partials, AQE-splittable —
    * not a window over h, where one boilerplate shingle would pin a
    * task); run lengths use the gaps-and-islands window PARTITIONED BY
    * doc_id, so the window state is bounded by one document's
    * shingles regardless of corpus size. */
  def dupRuns(docs: DataFrame, minDocs: Int = 2,
      temps: TempCache = TempCache.noop): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // PERSISTED (round 15): three downstream consumers read this frame
    // (the cross-document df aggregate, the run join's probe side, and
    // the per-doc shingle count) — without the persist each one re-ran
    // the tokenize + shingle-hash kernel over the whole corpus, the
    // minhashPairs lesson applied here. Narrow projection (doc_id,
    // pos, h — 20 B/row), spills to disk if it outgrows memory.
    val sh = temps.register(spreadSmallInput(docs)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"),
        posexplode(TextAnalysis.shingleHashesOfToks(col("toks"))))
      .withColumnRenamed("col", "h")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val dfs = sh.groupBy(col("h"))
      .agg(count_distinct(col("doc_id")).as("df_docs"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val runs = sh.join(dfs, Seq("h"))
      .filter(col("df_docs") >= minDocs)
      .withColumn("grp", col("pos") - row_number().over(w))
      .groupBy(col("doc_id"), col("grp"))
      .agg(count(lit(1)).as("run"))
      .groupBy(col("doc_id"))
      .agg(sum(col("run")).as("n_dup"), max(col("run")).as("max_dup_run"))
    sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
      .join(runs, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        coalesce(col("max_dup_run"), lit(0L)).as("max_dup_run"))
  }

  val qDupRun = QuerySpec(
    "q_llm_dup_run",
    (s, d) =>
      dupRuns(Tables.load(s, d, "documents"))
        .orderBy(col("doc_id")),
    Some("""WITH t AS (
           |  SELECT doc_id, string_split(text, ' ') AS toks, text
           |  FROM documents
           |), sh AS (
           |  SELECT doc_id, i - 1 AS pos,
           |    CAST(('0x' || substr(md5(array_to_string(toks[i:i+2], ' ')),
           |      1, 8)) AS BIGINT) % 2147483647 AS h
           |  FROM t, LATERAL (SELECT unnest(range(1, len(toks) - 1)) AS i) x
           |  WHERE len(toks) >= 3
           |  UNION ALL
           |  SELECT doc_id, 0 AS pos,
           |    CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT)
           |      % 2147483647 AS h
           |  FROM t WHERE len(toks) < 3
           |), dfs AS (
           |  SELECT h, count(DISTINCT doc_id) AS df_docs FROM sh GROUP BY h
           |), islands AS (
           |  SELECT s.doc_id,
           |    s.pos - row_number() OVER (PARTITION BY s.doc_id
           |                               ORDER BY s.pos) AS grp
           |  FROM sh s JOIN dfs d ON s.h = d.h WHERE d.df_docs >= 2
           |), rl AS (
           |  SELECT doc_id, grp, count(*) AS run FROM islands
           |  GROUP BY doc_id, grp
           |), agg AS (
           |  SELECT doc_id, sum(run) AS n_dup, max(run) AS max_dup_run
           |  FROM rl GROUP BY doc_id
           |), tot AS (
           |  SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY doc_id
           |)
           |SELECT t.doc_id,
           |  CAST(t.n_shingles AS BIGINT) AS n_shingles,
           |  CAST(coalesce(a.n_dup, 0) AS BIGINT) AS n_dup,
           |  CAST(coalesce(a.max_dup_run, 0) AS BIGINT) AS max_dup_run
           |FROM tot t LEFT JOIN agg a ON t.doc_id = a.doc_id
           |ORDER BY t.doc_id""".stripMargin))

  /** Dedup data card: the cluster-size histogram of the near-dup
    * graph — how many singleton pairs, how many 5-doc blobs, whether
    * one mega-cluster is eating the corpus (the first diagnostic a
    * dedup run is judged by, and the early warning for a too-loose
    * threshold: cluster sizes should decay geometrically). Clustered
    * docs only; unpaired docs are the complement of the node set.
    *
    * Scale shape: CC as elsewhere, then two tiny aggregates — sizes
    * per label, counts per size; both shuffle keys are bounded by the
    * cluster structure, both combine map-side. */
  def dedupClusterStats(pairs: DataFrame): DataFrame =
    connectedComponents(pairs)
      .groupBy(col("cluster_id")).agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size")).agg(count(lit(1)).as("n_clusters"))

  val qDedupStats = QuerySpec(
    "q_llm_dedup_stats",
    (s, d) =>
      dedupClusterStats(jaccardBlockPairs(Tables.load(s, d, "documents")))
        .orderBy(col("cluster_size")),
    Some("""WITH RECURSIVE pairs AS (
           |  SELECT a.doc_id AS ida, b.doc_id AS idb
           |  FROM documents a JOIN documents b
           |    ON a.lang = b.lang AND a.doc_id < b.doc_id
           |  WHERE a.doc_id < 200 AND b.doc_id < 200
           |    AND len(list_intersect(list_distinct(string_split(a.text, ' ')),
           |                           list_distinct(string_split(b.text, ' ')))) /
           |        len(list_distinct(list_concat(string_split(a.text, ' '),
           |                                      string_split(b.text, ' ')))) >= 0.5
           |), edges AS (
           |  SELECT ida AS a, idb AS b FROM pairs
           |  UNION SELECT idb, ida FROM pairs
           |), reach(a, b) AS (
           |  SELECT a, a FROM (SELECT DISTINCT a FROM edges) t
           |  UNION
           |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
           |), labels AS (
           |  SELECT a AS id, min(b) AS cluster_id FROM reach GROUP BY a
           |), sizes AS (
           |  SELECT cluster_id, count(*) AS cluster_size
           |  FROM labels GROUP BY cluster_id
           |)
           |SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
           |  CAST(count(*) AS BIGINT) AS n_clusters
           |FROM sizes GROUP BY cluster_size
           |ORDER BY cluster_size""".stripMargin))

  /** Dedup impact report — the data-card line a curation run publishes:
    * per source, how many documents and tokens the keep-list retains
    * ("dedup removed 12% of web tokens"). Token-weighted, because a
    * dedup pass that drops 1% of documents can still drop 30% of
    * tokens when the duplicates are long.
    *
    * Scale shape: the keep-list's CC + anti-join machinery, then one
    * narrow (doc_id, source, token-count) scan left-joined to the
    * kept set on doc_id and rolled up per source — token counts are
    * per-row ints, text never reaches the rollup. */
  def dedupImpact(docs: DataFrame): DataFrame =
    dedupImpact(docs, jaccardBlockPairs(docs))

  /** The production form: impact of ANY pair source — pass
    * [[minhashPairs]] output for the report a real nightly run
    * publishes (the no-arg overload keeps the bounded oracle pair
    * generator for the DuckDB-replayable qid). */
  def dedupImpact(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val kept = dedupKeepList(docs, pairs)
      .select(col("doc_id"), lit(true).as("kept"))
    docs
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .join(kept, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("kept_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(when(col("kept"), col("n_tokens")).otherwise(0L)).as("kept_tokens"))
  }

  val qDedupImpact = QuerySpec(
    "q_llm_dedup_impact",
    (s, d) =>
      dedupImpact(Tables.load(s, d, "documents"))
        .orderBy(col("source")),
    Some("""WITH RECURSIVE pairs AS (
           |  SELECT a.doc_id AS ida, b.doc_id AS idb
           |  FROM documents a JOIN documents b
           |    ON a.lang = b.lang AND a.doc_id < b.doc_id
           |  WHERE a.doc_id < 200 AND b.doc_id < 200
           |    AND len(list_intersect(list_distinct(string_split(a.text, ' ')),
           |                           list_distinct(string_split(b.text, ' ')))) /
           |        len(list_distinct(list_concat(string_split(a.text, ' '),
           |                                      string_split(b.text, ' ')))) >= 0.5
           |), edges AS (
           |  SELECT ida AS a, idb AS b FROM pairs
           |  UNION SELECT idb, ida FROM pairs
           |), reach(a, b) AS (
           |  SELECT a, a FROM (SELECT DISTINCT a FROM edges) t
           |  UNION
           |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
           |), drop_ids AS (
           |  SELECT a FROM reach GROUP BY a HAVING a <> min(b)
           |)
           |SELECT source,
           |  CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(CASE WHEN doc_id NOT IN (SELECT a FROM drop_ids)
           |           THEN 1 ELSE 0 END) AS BIGINT) AS kept_docs,
           |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           |  CAST(sum(CASE WHEN doc_id NOT IN (SELECT a FROM drop_ids)
           |           THEN len(string_split(text, ' ')) ELSE 0 END) AS BIGINT)
           |    AS kept_tokens
           |FROM documents
           |GROUP BY source ORDER BY source""".stripMargin))

  /** Soft dedup: per-document downweight instead of a hard drop. Every
    * doc gets weight_ppm = floor(1e6 / near-dup-cluster-size) — a
    * cluster of 4 copies contributes ~1× total exposure instead of 4×,
    * singletons stay at exactly 1e6. The alternative to
    * [[dedupKeepList]] when survivorship is too blunt (the copies may
    * carry distinct metadata, or the trainer wants sampling weights
    * rather than a filtered corpus). Integer ppm floor keeps the
    * weights hash-replayable cross-engine.
    *
    * Scale shape: identical to keep-list — only the graph-member slice
    * (docs appearing in a pair) rides the CC rounds and the k-row
    * size aggregate; the corpus sees ONE left join against that
    * narrow (doc_id, cl_size) frame, text never shuffles. */
  def dedupWeights(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val cc = connectedComponents(pairs)
    val sizes = cc.groupBy(col("cluster_id")).agg(count(lit(1)).as("cl_size"))
    val member = cc.join(sizes, Seq("cluster_id"))
      .select(col("id").as("doc_id"), col("cl_size"))
    docs.join(member, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cl_size"), lit(1L)).as("cluster_size"),
        expr("1000000 div coalesce(cl_size, 1)").as("weight_ppm"))
  }

  /** Oracle'd over the same bounded Jaccard block as the cluster
    * queries (recursive-CTE closure), extended with per-cluster sizes
    * and the corpus-wide left join. */
  val qDedupWeights = QuerySpec(
    "q_llm_dedup_weights",
    (s, d) => {
      val docs = Tables.load(s, d, "documents")
      dedupWeights(docs, jaccardBlockPairs(docs))
        .orderBy(col("doc_id"))
    },
    Some("""WITH RECURSIVE pairs AS (
           |  SELECT a.doc_id AS ida, b.doc_id AS idb
           |  FROM documents a JOIN documents b
           |    ON a.lang = b.lang AND a.doc_id < b.doc_id
           |  WHERE a.doc_id < 200 AND b.doc_id < 200
           |    AND len(list_intersect(list_distinct(string_split(a.text, ' ')),
           |                           list_distinct(string_split(b.text, ' ')))) /
           |        len(list_distinct(list_concat(string_split(a.text, ' '),
           |                                      string_split(b.text, ' ')))) >= 0.5
           |), edges AS (
           |  SELECT ida AS a, idb AS b FROM pairs
           |  UNION SELECT idb, ida FROM pairs
           |), reach(a, b) AS (
           |  SELECT a, a FROM (SELECT DISTINCT a FROM edges) t
           |  UNION
           |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
           |), clusters AS (
           |  SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a
           |), sizes AS (
           |  SELECT cluster_id, count(*) AS cl_size FROM clusters GROUP BY cluster_id
           |), weights AS (
           |  SELECT c.doc_id, s.cl_size FROM clusters c JOIN sizes s USING (cluster_id)
           |)
           |SELECT d.doc_id,
           |  CAST(coalesce(w.cl_size, 1) AS BIGINT) AS cluster_size,
           |  CAST(1000000 // coalesce(w.cl_size, 1) AS BIGINT) AS weight_ppm
           |FROM documents d LEFT JOIN weights w USING (doc_id)
           |ORDER BY d.doc_id""".stripMargin))

  // ---- cross-document span REMOVAL (Lee et al. scrub) ---------------------

  /** Cross-document duplicated-span REMOVAL — the other half of
    * [[spanOverlapPairs]]'s detection (Lee et al. 2022: don't drop the
    * whole document, cut the copied substring out of every copy).
    * Tokens covered by any `n`-gram whose hash appears in MORE THAN
    * ONE document are removed; the survivors re-join into
    * `text_scrubbed`. Documents shorter than `n` tokens are treated as
    * one whole-document span (an exact short dup scrubs to empty).
    *
    * Scale shape: the duplicated-hash set builds from the per-doc
    * DISTINCT kernel shingles (count per hash is map-side combinable;
    * nothing text-sized crosses that shuffle), the POSITIONED shingle
    * frame semi-joins against it, and each doc's hit positions come
    * back as one tiny sorted int array (bounded by doc length, keyed
    * by doc_id — no hot key). The mask itself is a per-row array
    * filter: O(len·|hits|) with no further shuffle. */
  /** Shared scrub tail: a frame of (doc_id, toks, his, sl) — sorted
    * 1-based hit start positions and the span length — masked to the
    * scrubbed output columns. The 0-based Spark lambda index aligns to
    * the kernel's 1-based positions as j0 + 1; single source for
    * [[spanScrub]] and [[decontamScrub]] so a mask-semantics fix can't
    * reach one and miss the other. */
  private def maskSpans(withHits: DataFrame): DataFrame =
    withHits
      .withColumn("keep", expr(
        "filter(toks, (x, j0) -> NOT exists(his, i -> i <= j0 + 1 AND j0 + 1 < i + sl))"))
      .select(col("doc_id"),
        concat_ws(" ", col("keep")).as("text_scrubbed"),
        size(col("toks")).cast("long").as("n_tokens"),
        (size(col("toks")) - size(col("keep"))).cast("long").as("n_removed"))

  /** DuckDB replay of the positioned-hash frame: `tk` (tokens) + `ph`
    * (1-based n-gram start positions + md5 hashes, whole-text fallback
    * at position 1 for short docs). Shared prefix of the two scrub
    * oracles; the caller appends its own bad-hash CTE (which may
    * reference `ph`) and then [[duckScrubTailSql]]. */
  private def duckScrubPrefixSql(n: Int): String =
    s"""tk AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
       |), ph AS (
       |  SELECT doc_id, i,
       |    CAST(('0x' || substr(md5(
       |      CASE WHEN len(toks) >= $n
       |           THEN array_to_string(toks[i:i+${n - 1}], ' ')
       |           ELSE array_to_string(toks, ' ') END), 1, 8)) AS BIGINT)
       |      % 2147483647 AS h
       |  FROM tk, unnest(range(1, greatest(len(toks) - ${n - 2}, 2))) AS u(i)
       |)""".stripMargin

  /** DuckDB replay of the mask tail over `ph` and a bad-hash CTE named
    * `badCte` (DuckDB lambda indices are 1-based where Spark's are
    * 0-based — the replay aligns them explicitly). */
  private def duckScrubTailSql(n: Int, badCte: String): String =
    s"""hits AS (
       |  SELECT doc_id, list_sort(list(i)) AS his
       |  FROM ph SEMI JOIN $badCte USING (h) GROUP BY doc_id
       |), scrub AS (
       |  SELECT t.doc_id, t.toks, coalesce(h.his, []) AS his,
       |    CASE WHEN len(t.toks) >= $n THEN $n ELSE len(t.toks) END AS sl
       |  FROM tk t LEFT JOIN hits h USING (doc_id)
       |), kept AS (
       |  SELECT doc_id, len(toks) AS n_tokens,
       |    list_filter(toks, (x, j) ->
       |      len(list_filter(his, i -> i <= j AND j < i + sl)) = 0) AS keep
       |  FROM scrub
       |)
       |SELECT doc_id,
       |  coalesce(array_to_string(keep, ' '), '') AS text_scrubbed,
       |  CAST(n_tokens AS BIGINT) AS n_tokens,
       |  CAST(n_tokens - len(keep) AS BIGINT) AS n_removed
       |FROM kept ORDER BY doc_id""".stripMargin

  def spanScrub(docs: DataFrame, n: Int = 10,
      temps: TempCache = TempCache.noop): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val toks = split(col("text"), " ")
    val base = temps.register(spreadSmallInput(docs)
      .select(col("doc_id"), col("text"), toks.as("toks"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // per-doc DISTINCT hashes (the spanOverlapPairs kernel) -> corpus
    // duplicated-hash set. countDistinct(doc_id), NOT count(*): the
    // kernel dedups by shingle STRING, so two different n-grams of one
    // doc colliding into the same 31-bit hash would emit that hash
    // twice for a single doc — count(*) would flip it into the dup set
    // (and diverge from the oracle's SELECT DISTINCT doc_id, h form)
    // even though no other document shares it
    val dup = base
      .select(col("doc_id"),
        explode(call_udf("graft_shingle_hashes_md5",
          col("text"), lit(n), lit(true))).as("h"))
      .groupBy(col("h")).agg(countDistinct(col("doc_id")).as("cnt"))
      .filter(col("cnt") > lit(1)).select(col("h"))
    // positioned (doc_id, i, h) frame: 1-based start positions; a doc
    // shorter than n tokens hashes its whole text at position 1. One
    // kernel eval per row (Md5ShinglePosExpr) — same md5 fold as the
    // distinct kernel, so positioned and distinct frames agree by
    // construction (NativeKernelSpec pins the identity against the
    // expression chain; the q_llm_span_scrub oracle replays it in SQL).
    val positioned = base.select(col("doc_id"),
      explode(call_udf("graft_shingle_pos_md5", col("text"), lit(n))).as("p"))
      .select(col("doc_id"), col("p.i").as("i"), col("p.h").as("h"))
    val hits = positioned.join(dup, Seq("h"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("i"))).as("his"))
    maskSpans(base.join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("toks"),
        coalesce(col("his"), expr("array()").cast("array<int>")).as("his"),
        when(size(col("toks")) >= n, lit(n)).otherwise(size(col("toks"))).as("sl")))
  }

  /** EXACT substring duplication at byte offsets — the precise form of
    * Lee et al.'s exact-substring dedup (their suffix-array pass finds
    * verbatim duplicated substrings of ≥50 tokens; here the SAME spans
    * come out of the positioned-hash frame the scrub family already
    * builds): every maximal run of tokens covered by 50-gram windows
    * whose verbatim text appears in MORE THAN ONE document is reported
    * as one span with its BYTE offsets into the original text —
    * `[start_byte, end_byte)` half-open, 0-based — plus the span's
    * md5. A consumer can `substr` the original document at those
    * offsets and get exactly the duplicated text (the oracle proves
    * it: the DuckDB replay computes `span_md5` from
    * `substr(text, start_byte+1, end_byte-start_byte)` while Spark
    * computes it from the token slice — a hash match is a
    * cross-representation proof the offsets address the verbatim
    * substring; byte = char on this ASCII corpus, which the replay
    * relies on for `substr`). Docs shorter than `n` tokens fall back
    * to the whole-text hash (an exact short dup is one whole-doc
    * span), the positioned-kernel convention.
    *
    * Scale shape: identical to [[spanScrub]]'s (dup set by map-side
    * combinable per-hash doc counts, positioned frame semi-joined,
    * per-doc sorted hit arrays) — the only addition is the span-merge,
    * which is TWO O(k) array lambdas (start/end boundary detection by
    * neighbor gap, `zip_with` pairing), NOT an array-accumulator fold
    * (the O(k²) per-row HOF trap this codebase flags): a fully
    * duplicated 10k-token doc merges its ~10k hits in one linear
    * pass. Offsets are computed per SPAN (few per doc), each one
    * `octet_length` over a token-slice join. */
  def exactSpans(docs: DataFrame, n: Int = 50,
      temps: TempCache = TempCache.noop): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val base = temps.register(spreadSmallInput(docs)
      .select(col("doc_id"), col("text"), split(col("text"), " ").as("toks"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // verbatim-duplicated window set: countDistinct(doc_id) per hash
    // (the spanScrub stance — a same-doc 31-bit collision must not
    // mint a dup)
    val dup = base
      .select(col("doc_id"),
        explode(call_udf("graft_shingle_hashes_md5",
          col("text"), lit(n), lit(true))).as("h"))
      .groupBy(col("h")).agg(countDistinct(col("doc_id")).as("cnt"))
      .filter(col("cnt") > lit(1)).select(col("h"))
    val positioned = base.select(col("doc_id"),
      explode(call_udf("graft_shingle_pos_md5", col("text"), lit(n))).as("p"))
      .select(col("doc_id"), col("p.i").as("i"), col("p.h").as("h"))
    val hits = positioned.join(dup, Seq("h"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("i"))).as("his"))
    // merge overlapping/adjacent [i, i+sl) windows into maximal spans:
    // a hit STARTS a span iff its predecessor is more than sl behind;
    // ENDS one iff its successor is more than sl ahead. Both are
    // linear neighbor-gap scans; zip_with pairs them up (counts match
    // by construction on a sorted array).
    base.join(hits, Seq("doc_id"))
      .withColumn("sl",
        when(size(col("toks")) >= n, lit(n)).otherwise(size(col("toks"))))
      .withColumn("spans", expr(
        """zip_with(
          |  filter(transform(his, (x, j) ->
          |    IF(j = 0 OR x - element_at(his, j) > sl, x, -1)), v -> v >= 0),
          |  filter(transform(his, (x, j) ->
          |    IF(j = size(his) - 1 OR element_at(his, j + 2) - x > sl,
          |       x + sl, -1)), v -> v >= 0),
          |  (s, e) -> named_struct('s', s, 'e', e))""".stripMargin))
      .select(col("doc_id"), col("toks"),
        posexplode(col("spans")).as(Seq("span_id", "sp")))
      .select(
        col("doc_id"),
        col("span_id").cast("long").as("span_id"),
        when(col("sp.s") === 1, lit(0)).otherwise(
          octet_length(concat_ws(" ",
            slice(col("toks"), lit(1), col("sp.s") - 1))) + 1)
          .cast("long").as("start_byte"),
        octet_length(concat_ws(" ",
          slice(col("toks"), lit(1), col("sp.e") - 1))).cast("long")
          .as("end_byte"),
        (col("sp.e") - col("sp.s")).cast("long").as("n_span_tokens"),
        md5(concat_ws(" ",
          slice(col("toks"), col("sp.s"), col("sp.e") - col("sp.s"))))
          .as("span_md5"))
  }

  /** The oracle is the cross-representation substring replay: DuckDB
    * recomputes the spans from the same positioned-hash frame, but
    * derives `span_md5` from `substr(text, start_byte+1, ...)` — the
    * BYTE offsets — where Spark derived it from the token slice; a
    * hash match proves the offsets are exact. */
  val qExactSpans = QuerySpec(
    "q_llm_exact_spans",
    (s, d) =>
      exactSpans(Tables.load(s, d, "documents"))
        .orderBy(col("doc_id"), col("span_id")),
    Some(s"""WITH ${duckScrubPrefixSql(50)}, dup AS (
            |  SELECT h FROM (SELECT DISTINCT doc_id, h FROM ph)
            |  GROUP BY h HAVING count(*) > 1
            |), hits AS (
            |  SELECT doc_id, list_sort(list(i)) AS his
            |  FROM ph SEMI JOIN dup USING (h) GROUP BY doc_id
            |), merged AS (
            |  SELECT t.doc_id, t.toks, d0.text, h.his,
            |    CASE WHEN len(t.toks) >= 50 THEN 50 ELSE len(t.toks) END AS sl
            |  FROM tk t JOIN hits h USING (doc_id)
            |  JOIN documents d0 USING (doc_id)
            |), spans AS (
            |  SELECT doc_id, toks, text,
            |    list_transform(list_zip(
            |      list_filter(list_transform(his, (x, j) ->
            |        CASE WHEN j = 1 OR x - his[j - 1] > sl THEN x ELSE -1 END),
            |        v -> v >= 0),
            |      list_filter(list_transform(his, (x, j) ->
            |        CASE WHEN j = len(his) OR his[j + 1] - x > sl
            |             THEN x + sl ELSE -1 END),
            |        v -> v >= 0)),
            |      (p, i) -> {'span_id': i - 1, 's': p[1], 'e': p[2]}) AS sps
            |  FROM merged
            |), ex AS (
            |  SELECT doc_id, toks, text,
            |    CAST(u.sp.span_id AS BIGINT) AS span_id,
            |    u.sp.s AS s, u.sp.e AS e
            |  FROM spans, unnest(sps) AS u(sp)
            |), offs AS (
            |  SELECT doc_id, span_id, text,
            |    CAST(CASE WHEN s = 1 THEN 0
            |      ELSE strlen(array_to_string(toks[1:s-1], ' ')) + 1 END
            |      AS BIGINT) AS start_byte,
            |    CAST(strlen(array_to_string(toks[1:e-1], ' ')) AS BIGINT)
            |      AS end_byte,
            |    CAST(e - s AS BIGINT) AS n_span_tokens
            |  FROM ex
            |)
            |SELECT doc_id, span_id, start_byte, end_byte, n_span_tokens,
            |  md5(substr(text, CAST(start_byte + 1 AS BIGINT),
            |      CAST(end_byte - start_byte AS BIGINT))) AS span_md5
            |FROM offs
            |ORDER BY doc_id, span_id""".stripMargin))

  /** SURGICAL decontamination: cut every `n`-gram span that appears in
    * the benchmark set out of each document, instead of dropping the
    * whole document (the [[contamination]] policy) — keeps the 99% of
    * a long document that ISN'T the leaked eval passage. Same mask
    * semantics as [[spanScrub]] with the benchmark's shingle hashes as
    * the bad set; documents shorter than `n` tokens are one whole-doc
    * span (an exact short benchmark copy scrubs to empty). n = 8, the
    * decontamination convention.
    *
    * Scale shape: the benchmark hash set is EVAL-SUITE-sized, so
    * instead of spanScrub's positioned-explode + semi join + join-back
    * (needed when the bad set is corpus-sized), the whole set rides as
    * ONE broadcast row and the scrub is a zero-shuffle per-row chain:
    * positioned kernel → array_contains filter → index mask. That
    * also makes the chain STATELESS and stream-legal —
    * [[StreamingCuration.streamingDecontamScrub]] is this exact
    * function on the feed. */
  def decontamScrub(docs: DataFrame, benchmark: DataFrame,
      n: Int = 8): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val bad = broadcast(benchmark
      .select(explode(call_udf("graft_shingle_hashes_md5",
        col("text"), lit(n), lit(true))).as("h"))
      .agg(sort_array(collect_set(col("h"))).as("bad")))
    // the set is sort_array'd so membership is the binary-search kernel
    // (graft_sorted_contains), not array_contains' linear walk: every
    // n-gram position of every doc probes the set, so a 10k-token doc
    // against a 100k-hash multi-benchmark suite is ~1e9 compares linear
    // vs ~1.7e5 at log2
    maskSpans(docs.crossJoin(bad)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("his", expr(
        s"""transform(filter(graft_shingle_pos_md5(text, $n),
           |  p -> graft_sorted_contains(bad, p.h)), p -> p.i)""".stripMargin))
      .withColumn("sl",
        when(size(col("toks")) >= n, lit(n)).otherwise(size(col("toks"))))
      .select(col("doc_id"), col("toks"), col("his"), col("sl")))
  }

  /** Replayed in DuckDB with the benchmark-hash set standing where
    * span_scrub's duplicated set stands (8-gram positioned hashes,
    * same 1-based/0-based index alignment). */
  val qDecontamScrub = QuerySpec(
    "q_llm_decontam_scrub",
    (s, d) => {
      val docs = Tables.load(s, d, "documents")
      decontamScrub(docs, docs.filter(col("doc_id") < 10)
        .select(col("doc_id"), col("text")))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH ${duckScrubPrefixSql(8)}, bh AS (
            |  SELECT DISTINCT
            |    CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT) % 2147483647 AS h
            |  FROM (
            |    SELECT unnest(
            |      CASE WHEN len(toks) >= 8 THEN
            |        list_distinct(list_transform(range(1, len(toks) - 6),
            |          i -> array_to_string(toks[i:i+7], ' ')))
            |      ELSE [array_to_string(toks, ' ')] END) AS t
            |    FROM tk WHERE doc_id < 10)
            |), ${duckScrubTailSql(8, "bh")}""".stripMargin))

  /** Fully replayed in DuckDB: positioned 10-gram md5 hashes, the
    * per-doc-distinct duplicated set, and the index mask (DuckDB
    * lambda indices are 1-based where Spark's are 0-based — the
    * replay aligns them explicitly). */
  val qSpanScrub = QuerySpec(
    "q_llm_span_scrub",
    (s, d) =>
      spanScrub(Tables.load(s, d, "documents"))
        .orderBy(col("doc_id")),
    Some(s"""WITH ${duckScrubPrefixSql(10)}, dup AS (
            |  SELECT h FROM (SELECT DISTINCT doc_id, h FROM ph)
            |  GROUP BY h HAVING count(*) > 1
            |), ${duckScrubTailSql(10, "dup")}""".stripMargin))

  val all: Seq[QuerySpec] =
    Seq(qExactDedup, qNgramJaccard, qMinhash, qMinhashMd5, qSimhash,
      qSimhashMd5, qSourceSim, qSourceSimMd5, qDedupClusters, qKeepList,
      qKeepBest, qContamination, qHistDedup, qHistNearDup, qSplitLeak,
      qSpanOverlap, qSpanScrub, qExactSpans, qDecontamScrub, qDupRun,
      qDedupStats, qDedupImpact, qDedupWeights)
}

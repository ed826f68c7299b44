package graft.llm

import graft.Tables
import graft.queries.QuerySpec
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (Array[Float]
  * vectors): brute-force cosine top-k as the exact baseline, plus two
  * scale paths — random-hyperplane LSH bucketing (near-dup pairs) and
  * IVF-style centroid partitioning (ANN search). The 100 TB shape:
  * queries are tiny and broadcast; the corpus is only ever scanned,
  * never self-joined; LSH/IVF turn O(n²) candidate generation into a
  * hash-partitioned groupBy on bucket keys.
  */
object Similarity {

  /** Sequential-fold dot product of two float-array columns (exact
    * left-to-right double accumulation — deterministic). Resolves to
    * the native DotProductFExpr kernel; requires
    * GraftFunctions.register on the session (vectors() does it). */
  def dot(a: Column, b: Column): Column = call_udf("graft_dot", a, b)

  /** Pure-SQL reference formulation of [[dot]] (same fold semantics);
    * kept for equivalence testing. */
  def dotSql(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(v: Column): Column = sqrt(dot(v, v))

  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)

  private def vectors(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    Tables.load(s, d, "embeddings")
      .select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
  }

  /** Brute-force cosine top-k: broadcast the query set, scan the corpus
    * once, rank per query. Exact; the baseline the ANN paths are
    * measured against. */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val q = broadcast(queries
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("nrm").as("q_nrm")))
    val scored = corpus.join(q, col("vec_id") =!= col("q_id"))
      .withColumn("cos", cosine(col("embedding"), col("q_emb"), col("nrm"), col("q_nrm")))
    // bounded top-k agg: k rows per query leave each task instead of
    // the whole scored corpus crossing a rank-window shuffle. The
    // descending double key negates exactly (IEEE sign flip); a NaN
    // cosine (zero-norm vector) ranks LAST here where the window put
    // it first — top-k of a similarity search should never be NaN.
    scored
      .groupBy(col("q_id"))
      .agg(call_udf("graft_topk_min",
        struct((-col("cos")).as("ncos"), col("vec_id"), col("cos")),
        lit(k)).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("q_id"), (col("pos") + 1).cast("long").as("rank"),
        col("t.vec_id").as("neighbor_id"), col("t.cos").as("cos"))
  }

  /** Oracle'd BIT-EXACTLY despite the float math: the kernel multiplies
    * float pairs in float precision and accumulates the products
    * left-to-right in double ([[dot]]) — DuckDB's `list_reduce` over
    * `CAST(x*y AS DOUBLE)` (float×float stays float there too) is the
    * identical IEEE operation sequence, so cosines, and therefore
    * ranks, hash-match across engines. ScalaTest pins the ranking
    * semantics besides. */
  val qCosineTopK = QuerySpec(
    "q_llm_cosine_topk",
    (s, d) => {
      val vs = vectors(s, d)
      cosineTopK(vs, vs.filter(col("vec_id") < 5), k = 5)
        .orderBy(col("q_id"), col("rank"))
    },
    Some("""WITH v AS (
           |  SELECT vec_id, embedding,
           |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           |      list_transform(embedding, x -> CAST(x*x AS DOUBLE))),
           |      (acc, p) -> acc + p)) AS nrm
           |  FROM embeddings
           |), qs AS (SELECT * FROM v WHERE vec_id < 5),
           |scored AS (
           |  SELECT qs.vec_id AS q_id, c.vec_id AS neighbor_id,
           |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           |      list_transform(list_zip(c.embedding, qs.embedding),
           |        z -> CAST(z[1]*z[2] AS DOUBLE))),
           |      (acc, p) -> acc + p) / (c.nrm * qs.nrm) AS cos
           |  FROM v c, qs WHERE c.vec_id != qs.vec_id
           |)
           |SELECT q_id,
           |  CAST(row_number() OVER (PARTITION BY q_id
           |    ORDER BY cos DESC, neighbor_id) AS BIGINT) AS "rank",
           |  neighbor_id, cos
           |FROM scored
           |QUALIFY "rank" <= 5
           |ORDER BY q_id, "rank"""".stripMargin))

  // ---- random-hyperplane LSH --------------------------------------------

  /** Deterministic pseudo-random hyperplanes: component (b, d) is
    * derived from a seeded splitmix-style integer hash, mapped into
    * [-0.5, 0.5). Constant-folded into the plan as a literal. */
  def hyperplanes(bits: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    def mix(z0: Long): Double = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z = z ^ (z >>> 31)
      (z >>> 11).toDouble / (1L << 53).toDouble - 0.5
    }
    (0 until bits).map(b => (0 until dim).map(d => mix(seed + b * 10007L + d)))
  }

  /** Pure-SQL reference formulation of the sign-LSH signature over a
    * `embedding` column (bit b = [dot(v, plane_b) >= 0], packed into a
    * long); kept for kernel-equivalence testing. */
  def signLshSql(df: DataFrame, bits: Int, dim: Int): DataFrame = {
    val planesLit = typedLit(hyperplanes(bits, dim))
    val sig = expr(
      s"""aggregate(sequence(0, ${bits - 1}), CAST(0 AS BIGINT), (acc, b) ->
         |  acc + IF(aggregate(zip_with(embedding, element_at(planes, b + 1),
         |                              (x, y) -> x * y), CAST(0.0 AS DOUBLE),
         |                     (s, x) -> s + x) >= 0,
         |           shiftleft(CAST(1 AS BIGINT), b), CAST(0 AS BIGINT)))""".stripMargin)
    df.withColumn("planes", planesLit).withColumn("sig", sig).drop("planes")
  }

  /** Embedding near-dup candidates: bucket by 16-bit sign-LSH
    * signature (the native SignLshExpr kernel — one eval per row
    * against deterministic pseudo-random hyperplanes), emit
    * within-bucket pairs ranked by exact cosine. `maxBucket` drops
    * degenerate buckets (correlated embeddings collapsing onto one
    * signature would otherwise collect an unbounded embedding list on
    * one reducer and explode O(bucket²) pairs — the same guard the
    * text-LSH paths carry). */
  def embNearDupPairs(vecs: DataFrame, bits: Int = 16, dim: Int = 64,
      maxBucket: Int = 1000): DataFrame = {
    graft.functions.GraftFunctions.register(vecs.sparkSession)
    val withSig = vecs.withColumn("sig",
      call_udf("graft_signlsh", col("embedding"), lit(bits), lit(dim), lit(42L)))
    // capped collect (BoundedCollectAggExpr): correlated embeddings
    // collapsing onto one signature are exactly the degenerate bucket
    // the cap guards against — buffer state tops out at maxBucket+1
    // members (embeddings included) on any task, map-side partials
    // too; saturated buckets eval to NULL and drop
    val pairs = withSig
      .groupBy(col("sig"))
      .agg(sort_array(call_udf("graft_collect_capped",
        struct(col("vec_id"), col("embedding"), col("nrm")),
        lit(maxBucket))).as("xs"))
      .filter(col("xs").isNotNull && size(col("xs")) > 1)
      .select(explode(expr(
        """flatten(transform(xs, (x, i) ->
          |  transform(slice(xs, i + 2, size(xs)), y ->
          |    struct(x.vec_id AS ida, y.vec_id AS idb,
          |           x.embedding AS ea, y.embedding AS eb,
          |           x.nrm AS na, y.nrm AS nb))))""".stripMargin)).as("p"))
      .select(col("p.ida").as("ida"), col("p.idb").as("idb"),
        cosine(col("p.ea"), col("p.eb"), col("p.na"), col("p.nb")).as("cos"))
    pairs
  }

  /** The DuckDB `list_reduce` dot product with the kernels' exact IEEE
    * operation order (see [[qCosineTopK]]'s oracle): float products
    * (or float×double-plane products) accumulated left-to-right in
    * double. */
  private[llm] def duckDot(a: String, b: String): String =
    s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(list_zip($a, $b), z -> CAST(z[1]*z[2] AS DOUBLE))),
       |      (acc, p) -> acc + p)""".stripMargin

  private[llm] val duckNormCte: String =
    """SELECT vec_id, embedding,
      |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |      list_transform(embedding, x -> CAST(x*x AS DOUBLE))),
      |      (acc, p) -> acc + p)) AS nrm
      |  FROM embeddings""".stripMargin

  /** Oracle'd bit-exactly, hyperplanes included: the SQL embeds the
    * same [[hyperplanes]] values as double literals (shortest-decimal
    * round-trip), and the kernel's float→double promotion before the
    * plane multiply is DuckDB's promotion too, so signatures, buckets,
    * pairs, and cosines all hash-match. */
  val qEmbNearDup = QuerySpec(
    "q_llm_emb_neardup",
    (s, d) =>
      embNearDupPairs(vectors(s, d))
        .orderBy(col("cos").desc, col("ida"), col("idb"))
        .limit(200),
    Some {
      val planesSql = hyperplanes(16, 64, 42L)
        .map(_.mkString("[", ",", "]")).mkString("[", ",", "]")
      s"""WITH v AS (
         |  $duckNormCte
         |), pl AS (SELECT $planesSql::DOUBLE[][] AS planes),
         |sigs AS (
         |  SELECT vec_id, embedding, nrm,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(range(16), b ->
         |        CASE WHEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |            list_transform(list_zip(embedding, planes[b+1]),
         |              z -> CAST(z[1] AS DOUBLE) * z[2])),
         |            (acc, p) -> acc + p) >= 0
         |        THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END)),
         |      (a, x) -> a + x) AS sig
         |  FROM v, pl
         |), sized AS (
         |  SELECT *, count(*) OVER (PARTITION BY sig) AS n FROM sigs
         |)
         |SELECT a.vec_id AS ida, b.vec_id AS idb,
         |  ${duckDot("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cos
         |FROM sized a JOIN sized b
         |  ON a.sig = b.sig AND a.vec_id < b.vec_id
         |WHERE a.n > 1 AND a.n <= 1000
         |ORDER BY cos DESC, ida, idb LIMIT 200""".stripMargin
    })

  // ---- IVF ---------------------------------------------------------------

  /** IVF-style ANN: a deterministic centroid subset partitions the
    * corpus (argmax-cosine assignment); each query searches its
    * `probes` closest centroids' buckets (probes=1 = classic IVF;
    * more probes trade scan width for recall). At scale the centroid
    * list is broadcast and corpus assignment is one scan.
    *
    * Corpus assignment is an aggregation, not a window: the broadcast
    * nested-loop join scores n×k (vector, centroid) rows, and
    * `max_by` reduces them to n map-side before any shuffle — a
    * window rank would shuffle all n×k scored rows just to keep one
    * per vector. Tiebreak on equal cosine = smallest centroid id
    * (the negated id in the max_by key). The query side's top-`probes`
    * selection is the bounded top-k aggregate for the same reason —
    * a batch-scoring job carries millions of queries. */
  def ivfTopK(vecs: DataFrame, queries: DataFrame, k: Int, centroidStride: Int,
      probes: Int = 1): DataFrame = {
    graft.functions.GraftFunctions.register(vecs.sparkSession)
    val centroids = broadcast(
      vecs.filter(pmod(col("vec_id"), lit(centroidStride)) === 0)
        .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"), col("nrm").as("c_nrm")))
    val corpusAssigned = vecs.join(centroids)
      .withColumn("c_cos", cosine(col("embedding"), col("c_emb"), col("nrm"), col("c_nrm")))
      .groupBy(col("vec_id"))
      .agg(
        first(col("embedding")).as("embedding"),
        first(col("nrm")).as("nrm"),
        max_by(col("c_id"), struct(col("c_cos"), (-col("c_id")).as("neg"))).as("c_id"))
    val queriesAssigned = queries.join(centroids)
      .withColumn("c_cos", cosine(col("embedding"), col("c_emb"), col("nrm"), col("c_nrm")))
      .groupBy(col("vec_id"))
      .agg(first(col("embedding")).as("q_emb"), first(col("nrm")).as("q_nrm"),
        call_udf("graft_topk_min",
          struct((-col("c_cos")).as("ncos"), col("c_id")), lit(probes)).as("pl"))
      .select(col("vec_id").as("q_id"), col("q_emb"), col("q_nrm"),
        explode(col("pl")).as("p"))
      .select(col("q_id"), col("q_emb"), col("q_nrm"), col("p.c_id").as("c_id"))
    corpusAssigned.join(broadcast(queriesAssigned), Seq("c_id"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", cosine(col("embedding"), col("q_emb"), col("nrm"), col("q_nrm")))
      .groupBy(col("q_id"))
      .agg(call_udf("graft_topk_min",
        struct((-col("cos")).as("ncos"), col("vec_id"), col("cos"),
          col("c_id")), lit(k)).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("q_id"), (col("pos") + 1).cast("long").as("rank"),
        col("t.vec_id").as("neighbor_id"), col("t.cos").as("cos"),
        col("t.c_id").as("c_id"))
  }

  /** Oracle'd bit-exactly: centroid assignment's max_by tiebreak
    * (highest cosine, then lowest centroid id) is the row_number
    * `ORDER BY c_cos DESC, c_id` in SQL; every cosine is the same
    * IEEE sequence as the kernel (see [[qCosineTopK]]). */
  val qAnnIvf = QuerySpec(
    "q_llm_ann_ivf",
    (s, d) => {
      val vs = vectors(s, d)
      ivfTopK(vs, vs.filter(col("vec_id") < 5), k = 5, centroidStride = 100)
        .orderBy(col("q_id"), col("rank"))
    },
    Some(s"""WITH v AS (
            |  $duckNormCte
            |), c AS (
            |  SELECT vec_id AS c_id, embedding AS c_emb, nrm AS c_nrm
            |  FROM v WHERE vec_id % 100 = 0
            |), scored_vc AS (
            |  SELECT v.vec_id, v.embedding, v.nrm, c.c_id,
            |    ${duckDot("v.embedding", "c.c_emb")} / (v.nrm * c.c_nrm) AS c_cos
            |  FROM v, c
            |), assigned AS (
            |  SELECT vec_id, embedding, nrm, c_id FROM (
            |    SELECT *, row_number() OVER (PARTITION BY vec_id
            |      ORDER BY c_cos DESC, c_id) AS crn
            |    FROM scored_vc) WHERE crn = 1
            |), qs AS (
            |  SELECT vec_id AS q_id, embedding AS q_emb, nrm AS q_nrm, c_id
            |  FROM assigned WHERE vec_id < 5
            |)
            |SELECT q_id,
            |  CAST(row_number() OVER (PARTITION BY q_id
            |    ORDER BY cos DESC, neighbor_id) AS BIGINT) AS "rank",
            |  neighbor_id, cos, c_id
            |FROM (
            |  SELECT qs.q_id, a.vec_id AS neighbor_id, qs.c_id,
            |    ${duckDot("a.embedding", "qs.q_emb")} / (a.nrm * qs.q_nrm) AS cos
            |  FROM assigned a JOIN qs ON a.c_id = qs.c_id AND a.vec_id != qs.q_id)
            |QUALIFY "rank" <= 5
            |ORDER BY q_id, "rank"""".stripMargin))

  // ---- centroid-distance outliers ----------------------------------------

  /** Embedding outlier detection: each vector's cosine to its NEAREST
    * centroid (the IVF assignment), worst `k` reported — vectors far
    * from every centroid are encoding damage, out-of-domain content,
    * or novel clusters worth a look; the standard embedding-space
    * hygiene scan over a training corpus.
    *
    * Scale shape: identical to [[ivfTopK]]'s corpus assignment — the
    * centroid list is broadcast, the n×k scoring is reduced map-side
    * by max/max_by before any shuffle (never a window over n×k), and
    * only the k-row result sorts globally. Same max-cosine tiebreak
    * (lowest centroid id). */
  def centroidOutliers(vecs: DataFrame, centroidStride: Int, k: Int): DataFrame = {
    val centroids = broadcast(
      vecs.filter(pmod(col("vec_id"), lit(centroidStride)) === 0)
        .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"),
          col("nrm").as("c_nrm")))
    vecs.join(centroids)
      .withColumn("c_cos", cosine(col("embedding"), col("c_emb"), col("nrm"), col("c_nrm")))
      .groupBy(col("vec_id"))
      .agg(
        max_by(col("c_id"), struct(col("c_cos"), (-col("c_id")).as("neg"))).as("c_id"),
        max(col("c_cos")).as("cos"))
      .withColumn("dist", lit(1.0) - col("cos"))
      .orderBy(col("cos").asc, col("vec_id")).limit(k)
  }

  /** Oracle'd bit-exactly: cosines are the [[qCosineTopK]] IEEE
    * sequence, the assignment replay is [[qAnnIvf]]'s row_number form,
    * and 1−cos is one further exact IEEE subtraction. */
  val qEmbOutlier = QuerySpec(
    "q_llm_emb_outlier",
    (s, d) =>
      centroidOutliers(vectors(s, d), centroidStride = 100, k = 25)
        .orderBy(col("cos"), col("vec_id")),
    Some(s"""WITH v AS (
            |  $duckNormCte
            |), c AS (
            |  SELECT vec_id AS c_id, embedding AS c_emb, nrm AS c_nrm
            |  FROM v WHERE vec_id % 100 = 0
            |), scored AS (
            |  SELECT v.vec_id, c.c_id,
            |    ${duckDot("v.embedding", "c.c_emb")} / (v.nrm * c.c_nrm) AS c_cos
            |  FROM v, c
            |), assigned AS (
            |  SELECT vec_id, c_id, c_cos AS cos FROM (
            |    SELECT *, row_number() OVER (PARTITION BY vec_id
            |      ORDER BY c_cos DESC, c_id) AS crn
            |    FROM scored) WHERE crn = 1
            |)
            |SELECT vec_id, c_id, cos, 1.0 - cos AS dist
            |FROM assigned
            |ORDER BY cos, vec_id LIMIT 25""".stripMargin))

  // ---- int8 scalar quantization + integer k-means ------------------------

  /** Symmetric int8 scalar quantization: q_i = round(x_i / s · 127)
    * with s = max |x_i|, expressed as floor(x/s·127 + 0.5) over doubles
    * — every step (cast, correctly-rounded divide/multiply, floor) is
    * IEEE-exact, so quantized vectors hash-match across engines, unlike
    * a float pipeline's rounding-mode roulette. Zero vectors quantize
    * to zeros (s = 0 guard). 4× narrower vectors on the wire; the
    * integer domain is what makes exact distributed k-means below
    * possible at all. */
  def quantize(e: Column): Column = call_udf("graft_quantize", e)

  /** Pure-SQL reference formulation of [[quantize]] (identical IEEE
    * sequence); kept for kernel-equivalence testing. */
  def quantizeSql(e: Column): Column = {
    val s = array_max(transform(e, x => abs(x)))
    when(s === 0.0f, transform(e, _ => lit(0)))
      .otherwise(transform(e, x =>
        floor(x.cast("double") / s.cast("double") * 127.0 + 0.5).cast("int")))
  }

  def quantScale(e: Column): Column = array_max(transform(e, x => abs(x)))

  /** Serialized array view for the oracle compare (the driver's
    * comparator is scalar-typed; same convention as q_llm_mm_decode). */
  private def joined(a: Column): Column =
    array_join(transform(a, x => x.cast("string")), ",")

  val qQuantize = QuerySpec(
    "q_llm_quantize",
    (s, d) => {
      graft.functions.GraftFunctions.register(s)
      Tables.load(s, d, "embeddings")
        .select(col("vec_id"), quantScale(col("embedding")).as("scale"),
          joined(quantize(col("embedding"))).as("q"))
        .orderBy(col("vec_id"))
    },
    Some("""SELECT vec_id,
           |  list_max(list_transform(embedding, x -> abs(x))) AS scale,
           |  array_to_string(CASE
           |    WHEN list_max(list_transform(embedding, x -> abs(x))) = 0
           |    THEN list_transform(embedding, x -> 0)
           |    ELSE list_transform(embedding, x -> CAST(floor(
           |      CAST(x AS DOUBLE) /
           |      CAST(list_max(list_transform(embedding, y -> abs(y))) AS DOUBLE)
           |      * 127.0 + 0.5) AS INTEGER))
           |  END, ',') AS q
           |FROM embeddings ORDER BY vec_id""".stripMargin))

  /** One exact k-means step over int8-quantized vectors: assign each
    * vector to its nearest centroid (squared euclidean over ints —
    * exact long arithmetic; ties → lowest centroid id), then recompute
    * each centroid as the component-wise rounded mean of its members.
    *
    * Scale shape: centroids (k × dim ints) BROADCAST against one
    * corpus scan; `max_by` reduces the n×k scored pairs map-side
    * (exactly [[ivfTopK]]'s assignment shape); the mean runs as
    * posexploded (c_id, dim) partial LONG sums — map-side combine
    * leaves k·dim rows per partition on the wire, and integer sums are
    * order-independent, so the result is bit-stable under ANY
    * partitioning (the property float k-means lacks). Empty clusters
    * keep their previous centroid. */
  /** SQL reference forms of the integer geometry (kept for
    * kernel-equivalence testing; the kernels graft_l2_int /
    * graft_dot_int are the production path). */
  def intL2Sql(a: Column, b: Column): Column = aggregate(
    zip_with(a, b, (x, y) => (x - y).cast("long") * (x - y)),
    lit(0L), (acc, x) => acc + x)
  def intDotSql(a: Column, b: Column): Column = aggregate(
    zip_with(a, b, (x, y) => x.cast("long") * y),
    lit(0L), (acc, x) => acc + x)

  def kmeansStep(vecs: DataFrame, centroids: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(vecs.sparkSession)
    val dist = call_udf("graft_l2_int", col("q"), col("c_q"))
    val assigned = vecs.join(broadcast(centroids))
      .withColumn("dist", dist)
      .groupBy(col("vec_id"))
      .agg(first(col("q")).as("q"),
        max_by(col("c_id"), struct((-col("dist")).as("nd"), (-col("c_id")).as("nc")))
          .as("c_id"))
    val sums = assigned
      .select(col("c_id"), posexplode(col("q")))
      .groupBy(col("c_id"), col("pos"))
      .agg(sum(col("col")).as("s"), count(lit(1)).as("n"))
      .withColumn("m", floor(col("s").cast("double") / col("n").cast("double") + 0.5)
        .cast("int"))
      .groupBy(col("c_id"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("next_q"))
    centroids.join(sums, Seq("c_id"), "left")
      .select(col("c_id"), coalesce(col("next_q"), col("c_q")).as("c_q"))
  }

  /** Lloyd's iterations over [[kmeansStep]] with the deterministic
    * stride seed (every `stride`-th vector, the [[ivfTopK]]
    * convention). A fixed iteration count, not a convergence test:
    * every quantity is exact, so runs are byte-identical, and a fixed
    * depth keeps the job graph static for the scheduler. Returns
    * (c_id, c_q). */
  def kmeansQuantized(vecs0: DataFrame, centroidStride: Int,
      iters: Int = 5): DataFrame = {
    graft.functions.GraftFunctions.register(vecs0.sparkSession)
    val vecs = vecs0.select(col("vec_id"), quantize(col("embedding")).as("q"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var centroids = vecs
      .filter(pmod(col("vec_id"), lit(centroidStride)) === 0)
      .select(col("vec_id").as("c_id"), col("q").as("c_q"))
    // the centroid frame is k rows of k·dim ints — checkpointing it per
    // round is ~free and keeps the final plan one round deep instead of
    // `iters` nested broadcast+shuffle stages replanned together
    for (_ <- 1 to iters)
      centroids = kmeansStep(vecs, centroids).localCheckpoint(true)
    vecs.unpersist() // the checkpointed result no longer reads it
    centroids
  }

  /** IVF search ENTIRELY in the quantized integer domain, against
    * [[kmeansQuantized]]-trained centroids: corpus and queries assign
    * to centroids by exact long L2 (the training metric — consistent
    * train/serve assignment), and within-bucket ranking is the exact
    * integer dot product, descending, ties to the lowest vector id.
    * Every comparison is integer, so results are bit-stable under any
    * partitioning AND reproducible across engines/hardware — the
    * determinism story scalar-quantized ANN serving actually wants.
    * Same scale shape as [[ivfTopK]]: centroids broadcast, corpus
    * scanned once, `max_by` map-side assignment, bounded top-k
    * aggregates for both the probe selection and the serving tail. */
  def ivfTopKQuantized(vecs: DataFrame, queries: DataFrame, k: Int,
      centroids: DataFrame, probes: Int = 1): DataFrame = {
    graft.functions.GraftFunctions.register(vecs.sparkSession)
    val dist = call_udf("graft_l2_int", col("q"), col("c_q"))
    val bCentroids = broadcast(centroids)
    def assign(df: DataFrame): DataFrame = df.join(bCentroids)
      .withColumn("dist", dist)
      .groupBy(col("vec_id"))
      .agg(first(col("q")).as("q"),
        max_by(col("c_id"), struct((-col("dist")).as("nd"), (-col("c_id")).as("nc")))
          .as("c_id"))
    val queriesAssigned = queries.join(bCentroids)
      .withColumn("dist", dist)
      .groupBy(col("vec_id"))
      .agg(first(col("q")).as("q_q"),
        call_udf("graft_topk_min",
          struct(col("dist"), col("c_id")), lit(probes)).as("pl"))
      .select(col("vec_id").as("q_id"), col("q_q"), explode(col("pl")).as("p"))
      .select(col("q_id"), col("q_q"), col("p.c_id").as("c_id"))
    val idot = call_udf("graft_dot_int", col("q"), col("q_q"))
    // descending long key → negate into the struct (exact on integers)
    assign(vecs).join(broadcast(queriesAssigned), Seq("c_id"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("idot", idot)
      .groupBy(col("q_id"))
      .agg(call_udf("graft_topk_min",
        struct((-col("idot")).as("nidot"), col("vec_id"), col("idot"),
          col("c_id")), lit(k)).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("q_id"), (col("pos") + 1).cast("long").as("rank"),
        col("t.vec_id").as("neighbor_id"), col("t.idot").as("idot"),
        col("t.c_id").as("c_id"))
  }

  /** One step oracle'd exactly in DuckDB (assignment argmin, tiebreak,
    * long-exact distances, rounded integer means); the fixed-depth
    * trainer is the step iterated, pinned by ScalaTest against an
    * independent driver-side implementation. */
  val qKmeansStep = QuerySpec(
    "q_llm_kmeans_step",
    (s, d) => {
      graft.functions.GraftFunctions.register(s)
      val vecs = Tables.load(s, d, "embeddings")
        .select(col("vec_id"), quantize(col("embedding")).as("q"))
      val seeds = vecs.filter(pmod(col("vec_id"), lit(100)) === 0)
        .select(col("vec_id").as("c_id"), col("q").as("c_q"))
      kmeansStep(vecs, seeds)
        .select(col("c_id"), joined(col("c_q")).as("c_q"))
        .orderBy(col("c_id"))
    },
    Some("""WITH q AS (
           |  SELECT vec_id,
           |    CASE WHEN list_max(list_transform(embedding, x -> abs(x))) = 0
           |      THEN list_transform(embedding, x -> 0)
           |      ELSE list_transform(embedding, x -> CAST(floor(
           |        CAST(x AS DOUBLE) /
           |        CAST(list_max(list_transform(embedding, y -> abs(y))) AS DOUBLE)
           |        * 127.0 + 0.5) AS INTEGER))
           |    END AS q
           |  FROM embeddings
           |), seeds AS (
           |  SELECT vec_id AS c_id, q AS c_q FROM q WHERE vec_id % 100 = 0
           |), scored AS (
           |  SELECT q.vec_id, q.q, seeds.c_id,
           |    list_reduce(list_prepend(CAST(0 AS BIGINT),
           |      list_transform(list_zip(q.q, seeds.c_q),
           |        z -> CAST(z[1] - z[2] AS BIGINT) * (z[1] - z[2]))),
           |      (a, x) -> a + x) AS dist
           |  FROM q, seeds
           |), assigned AS (
           |  SELECT vec_id, q, c_id FROM (
           |    SELECT *, row_number() OVER (PARTITION BY vec_id
           |      ORDER BY dist, c_id) AS rn FROM scored) WHERE rn = 1
           |), comp AS (
           |  SELECT a.c_id, t.d,
           |    CAST(floor(CAST(sum(a.q[t.d]) AS DOUBLE) /
           |               CAST(count(*) AS DOUBLE) + 0.5) AS INTEGER) AS m
           |  FROM assigned a, LATERAL (SELECT unnest(range(1, len(a.q) + 1)) AS d) t
           |  GROUP BY a.c_id, t.d
           |), next AS (
           |  SELECT c_id, list(m ORDER BY d) AS next_q FROM comp GROUP BY c_id
           |)
           |SELECT seeds.c_id,
           |  array_to_string(coalesce(next.next_q, seeds.c_q), ',') AS c_q
           |FROM seeds LEFT JOIN next USING (c_id)
           |ORDER BY c_id""".stripMargin))

  // ---- product quantization (PQ) ANN -------------------------------------

  /** Per-subspace PQ codebooks (Jégou et al., "Product Quantization
    * for Nearest Neighbor Search"): each int8-quantized vector splits
    * into `m` contiguous subvectors of dim/m components, and every
    * subspace trains its own small codebook with `iters` rounds of the
    * exact integer [[kmeansStep]] from deterministic stride seeds.
    * iters = 0 keeps the seeds verbatim — the fully-SQL-replayable
    * form the oracle uses; the trained path is ScalaTest-pinned
    * against a sequential reference (the [[kmeansQuantized]] stance).
    * Returns (sub_id, c_id, c_q).
    *
    * Scale shape: `m` independent small training chains over sliced
    * projections of ONE persisted quantized scan; each chain is
    * [[kmeansStep]]'s broadcast + map-side-combine shape. */
  def pqCodebooks(vecs0: DataFrame, m: Int, dim: Int,
      centroidStride: Int, iters: Int = 0): DataFrame = {
    graft.functions.GraftFunctions.register(vecs0.sparkSession)
    pqCodebooksOfQuantized(
      vecs0.select(col("vec_id"), quantize(col("embedding")).as("qfull")),
      m, dim, centroidStride, iters)
  }

  /** [[pqCodebooks]] over an already-integer (vec_id, qfull) frame —
    * the form [[ivfPqTrain]] reuses to train codebooks on RESIDUALS. */
  private def pqCodebooksOfQuantized(q0: DataFrame, m: Int, dim: Int,
      centroidStride: Int, iters: Int): DataFrame = {
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val subDim = dim / m
    // skip the internal persist when the caller already persisted the
    // input (ivfPqTrain hands in its TempCache-registered resid frame):
    // a second persist+unpersist here would drop the caller's cache out
    // from under its registry
    val ownPersist = iters > 0 &&
      q0.storageLevel == org.apache.spark.storage.StorageLevel.NONE
    val q = if (ownPersist)
      q0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else q0
    val books = (0 until m).map { j =>
      val sub = q.select(col("vec_id"),
        slice(col("qfull"), j * subDim + 1, subDim).as("q"))
      var cb = sub.filter(pmod(col("vec_id"), lit(centroidStride)) === 0)
        .select(col("vec_id").as("c_id"), col("q").as("c_q"))
      for (_ <- 1 to iters) cb = kmeansStep(sub, cb).localCheckpoint(true)
      cb.select(lit(j).as("sub_id"), col("c_id"), col("c_q"))
    }.reduce(_ unionByName _)
    if (ownPersist) q.unpersist() // every chain ends in a checkpoint
    books
  }

  /** (id, sub_id, q) sliced subvector view of a quantized frame. */
  private def pqSubvectors(vecs: DataFrame, idCol: String, m: Int,
      dim: Int): DataFrame = {
    val subDim = dim / m
    vecs.select(col("vec_id").as(idCol), quantize(col("embedding")).as("qfull"))
      .select(col(idCol), explode(sequence(lit(0), lit(m - 1))).as("sub_id"),
        col("qfull"))
      .select(col(idCol), col("sub_id"),
        slice(col("qfull"), col("sub_id") * subDim + 1, lit(subDim)).as("q"))
  }

  /** PQ encoding: each vector compresses to `m` codebook ids — the
    * argmin exact long L2 per subspace, ties → lowest c_id. At dim=64
    * that is m bytes instead of 64, the memory ratio that lets a
    * billion-vector index live in RAM. Returns (vec_id, codes).
    *
    * Scale shape: codebooks (m × K × subDim ints) broadcast against
    * one corpus scan; max_by reduces the per-subspace scoring
    * map-side; the code array reassembles in a per-vector aggregate —
    * the corpus never joins itself. */
  def pqEncode(vecs: DataFrame, codebooks: DataFrame, m: Int,
      dim: Int): DataFrame = {
    graft.functions.GraftFunctions.register(vecs.sparkSession)
    pqSubvectors(vecs, "vec_id", m, dim)
      .join(broadcast(codebooks), Seq("sub_id"))
      .withColumn("dist", call_udf("graft_l2_int", col("q"), col("c_q")))
      .groupBy(col("vec_id"), col("sub_id"))
      .agg(max_by(col("c_id"),
        struct((-col("dist")).as("nd"), (-col("c_id")).as("nc"))).as("code"))
      .groupBy(col("vec_id"))
      .agg(transform(array_sort(collect_list(struct(col("sub_id"), col("code")))),
        s => s.getField("code")).as("codes"))
  }

  /** PQ ANN serving via asymmetric distance computation (ADC): the
    * query stays exact (quantized, un-encoded); its per-subspace L2
    * distances to every codebook entry form a tiny nq × m × K lookup
    * table, and each encoded corpus vector's approximate distance is
    * the sum of m table lookups — never a full-dimension distance at
    * serving time. Top-k ascending, ties → lowest vector id; all
    * integer, so results are bit-stable under any partitioning.
    *
    * Scale shape: the lookup table broadcasts; the corpus-side cost is
    * one scan of the m-byte codes joined against it with a map-side-
    * combinable sum; only k rows per query per task cross the final
    * bounded-top-k shuffle. */
  def pqTopK(vecs: DataFrame, queries: DataFrame, k: Int,
      codebooks: DataFrame, m: Int, dim: Int): DataFrame = {
    graft.functions.GraftFunctions.register(vecs.sparkSession)
    val table = pqSubvectors(queries, "q_id", m, dim)
      .join(codebooks, Seq("sub_id"))
      .withColumn("d", call_udf("graft_l2_int", col("q"), col("c_q")))
      .select(col("q_id"), col("sub_id"), col("c_id").as("code"), col("d"))
    val codes = pqEncode(vecs, codebooks, m, dim)
      .select(col("vec_id"), posexplode(col("codes")).as(Seq("sub_id", "code")))
    codes.join(broadcast(table), Seq("sub_id", "code"))
      .filter(col("vec_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(sum(col("d")).as("adist"))
      .groupBy(col("q_id"))
      .agg(call_udf("graft_topk_min",
        struct(col("adist"), col("vec_id")), lit(k)).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("q_id"), (col("pos") + 1).cast("long").as("rank"),
        col("t.vec_id").as("neighbor_id"), col("t.adist").as("adist"))
  }

  /** Oracle'd END-TO-END at iters = 0 (stride-seed codebooks): slice,
    * quantize, per-subspace argmin encode, ADC table, summed lookups,
    * rank — every step exact integer/IEEE arithmetic restated in
    * DuckDB. The trained-codebook path differs only in the codebook
    * rows it reads (ScalaTest pins it against a sequential PQ). */
  val qPqAnn = QuerySpec(
    "q_llm_pq_ann",
    (s, d) => {
      graft.functions.GraftFunctions.register(s)
      val vs = Tables.load(s, d, "embeddings")
      val cb = pqCodebooks(vs, m = 4, dim = 64, centroidStride = 50, iters = 0)
      pqTopK(vs, vs.filter(col("vec_id") < 5), k = 5, cb, m = 4, dim = 64)
        .orderBy(col("q_id"), col("rank"))
    },
    Some("""WITH q AS (
           |  SELECT vec_id,
           |    CASE WHEN list_max(list_transform(embedding, x -> abs(x))) = 0
           |      THEN list_transform(embedding, x -> 0)
           |      ELSE list_transform(embedding, x -> CAST(floor(
           |        CAST(x AS DOUBLE) /
           |        CAST(list_max(list_transform(embedding, y -> abs(y))) AS DOUBLE)
           |        * 127.0 + 0.5) AS INTEGER))
           |    END AS qfull
           |  FROM embeddings
           |), sub AS (
           |  SELECT vec_id, j.sub_id,
           |    qfull[j.sub_id * 16 + 1 : j.sub_id * 16 + 16] AS sq
           |  FROM q, LATERAL (SELECT unnest(range(0, 4)) AS sub_id) j
           |), cb AS (
           |  SELECT sub_id, vec_id AS c_id, sq AS c_q FROM sub
           |  WHERE vec_id % 50 = 0
           |), scored AS (
           |  SELECT s.vec_id, s.sub_id, c.c_id,
           |    list_reduce(list_prepend(CAST(0 AS BIGINT),
           |      list_transform(list_zip(s.sq, c.c_q),
           |        z -> CAST(z[1] - z[2] AS BIGINT) * (z[1] - z[2]))),
           |      (a, x) -> a + x) AS dist
           |  FROM sub s JOIN cb c USING (sub_id)
           |), codes AS (
           |  SELECT vec_id, sub_id, c_id AS code FROM (
           |    SELECT *, row_number() OVER (PARTITION BY vec_id, sub_id
           |      ORDER BY dist, c_id) AS rn FROM scored) WHERE rn = 1
           |), qt AS (
           |  SELECT vec_id AS q_id, sub_id, c_id AS code, dist AS d
           |  FROM scored WHERE vec_id < 5
           |), adist AS (
           |  SELECT qt.q_id, codes.vec_id, CAST(sum(qt.d) AS BIGINT) AS adist
           |  FROM codes JOIN qt
           |    ON codes.sub_id = qt.sub_id AND codes.code = qt.code
           |  WHERE codes.vec_id != qt.q_id
           |  GROUP BY qt.q_id, codes.vec_id
           |)
           |SELECT q_id,
           |  CAST(row_number() OVER (PARTITION BY q_id
           |    ORDER BY adist, vec_id) AS BIGINT) AS "rank",
           |  vec_id AS neighbor_id, adist
           |FROM adist
           |QUALIFY "rank" <= 5
           |ORDER BY q_id, "rank"""".stripMargin))

  /** IVF-PQ training (the FAISS IVFADC architecture, Jégou et al.):
    * a coarse integer-k-means quantizer partitions the corpus into
    * inverted lists, and the PQ codebooks train on the RESIDUALS
    * (vector − assigned coarse centroid) — residuals concentrate near
    * zero, so the same codebook budget quantizes them far better than
    * raw vectors. All integer end-to-end: residual components are
    * exact int differences, every argmin/mean inherits the k-means
    * bit-stability. iters = 0 keeps both the coarse seeds and the
    * residual-seed codebooks verbatim (the SQL-replayable form).
    * Returns (coarse (c_id, c_q), books (sub_id, c_id, c_q)).
    *
    * Scale shape: coarse training is [[kmeansQuantized]]'s shape; the
    * residual projection is one broadcast join over the persisted
    * quantized scan; codebooks train per-subspace on sliced residual
    * projections exactly as [[pqCodebooks]]. */
  def ivfPqTrain(vecs: DataFrame, coarseStride: Int, m: Int, dim: Int,
      bookStride: Int, iters: Int = 0,
      temps: TempCache = TempCache.noop): (DataFrame, DataFrame) = {
    graft.functions.GraftFunctions.register(vecs.sparkSession)
    val q = temps.register(
      vecs.select(col("vec_id"), quantize(col("embedding")).as("qfull"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    var coarse = q.filter(pmod(col("vec_id"), lit(coarseStride)) === 0)
      .select(col("vec_id").as("c_id"), col("qfull").as("c_q"))
    val step = q.select(col("vec_id"), col("qfull").as("q"))
    for (_ <- 1 to iters) coarse = kmeansStep(step, coarse).localCheckpoint(true)
    // persisted: each of the m subspace codebook chains consumes the
    // residual frame — without the persist every branch re-runs the
    // corpus-wide coarse assignment join
    val resid = temps.register(assignCoarse(q, coarse)
      .select(col("vec_id"),
        zip_with(col("qfull"), col("list_q"), (a, b) => a - b).as("qfull"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    (coarse, pqCodebooksOfQuantized(resid, m, dim, bookStride, iters))
  }

  /** (vec_id, qfull, list_id, list_q): each quantized vector with its
    * nearest coarse centroid (exact long L2, ties → lowest c_id). */
  private[llm] def assignCoarse(q: DataFrame, coarse: DataFrame): DataFrame =
    q.join(broadcast(coarse))
      .withColumn("dist", call_udf("graft_l2_int", col("qfull"), col("c_q")))
      .groupBy(col("vec_id"))
      .agg(first(col("qfull")).as("qfull"),
        max_by(struct(col("c_id"), col("c_q")),
          struct((-col("dist")).as("nd"), (-col("c_id")).as("nc"))).as("w"))
      .select(col("vec_id"), col("qfull"),
        col("w.c_id").as("list_id"), col("w.c_q").as("list_q"))

  /** (id, list_id, sub_id, q) residual subvectors under a coarse
    * assignment — the IVF-PQ slicing shared by encode and serving. */
  private def residualSubvectors(assigned: DataFrame, idCol: String,
      m: Int, dim: Int): DataFrame = {
    val subDim = dim / m
    assigned
      .select(col("vec_id").as(idCol), col("list_id"),
        zip_with(col("qfull"), col("list_q"), (a, b) => a - b).as("rfull"))
      .select(col(idCol), col("list_id"),
        explode(sequence(lit(0), lit(m - 1))).as("sub_id"), col("rfull"))
      .select(col(idCol), col("list_id"), col("sub_id"),
        slice(col("rfull"), col("sub_id") * subDim + 1, lit(subDim)).as("q"))
  }

  /** IVF-PQ ANN serving (IVFADC): queries probe their `probes` nearest
    * coarse lists; within a probed list, distances are asymmetric —
    * the query's exact residual against each member's PQ-coded
    * residual, summed from a per-(query, list) lookup table. Only
    * same-list candidates are scored at all (the inverted-list
    * pruning that makes billion-scale serving tractable); all
    * arithmetic integer, ties → lowest vector id.
    *
    * Scale shape: coarse centroids and the nq×probes×m×K lookup table
    * broadcast; the corpus-side cost is one assign + encode scan and a
    * map-side-combinable sum per (query, candidate) pair within probed
    * lists only; per-query top-k rows cross the rank window. */
  def ivfPqTopK(vecs: DataFrame, queries: DataFrame, k: Int,
      coarse: DataFrame, books: DataFrame, m: Int, dim: Int,
      probes: Int = 1): DataFrame = {
    graft.functions.GraftFunctions.register(vecs.sparkSession)
    val dist = call_udf("graft_l2_int", col("q"), col("c_q"))
    val q = vecs.select(col("vec_id"), quantize(col("embedding")).as("qfull"))
    // corpus: assign → residual subvectors → per-subspace codes
    val codes = residualSubvectors(assignCoarse(q, coarse), "vec_id", m, dim)
      .join(broadcast(books), Seq("sub_id"))
      .withColumn("dist", dist)
      .groupBy(col("vec_id"), col("sub_id"))
      .agg(first(col("list_id")).as("list_id"),
        max_by(col("c_id"),
          struct((-col("dist")).as("nd"), (-col("c_id")).as("nc"))).as("code"))
    adcServe(codes, adcQueryTable(queries, coarse, books, m, dim, probes), k)
  }

  /** (q_id, list_id, sub_id, code, d): the per-(query, probed-list)
    * ADC lookup table — each query probes its `probes` nearest coarse
    * lists and scores its residual (per probed list) against every
    * codebook entry. nq × probes × m × K rows, the broadcast side of
    * serving. */
  private def adcQueryTable(queries: DataFrame, coarse: DataFrame,
      books: DataFrame, m: Int, dim: Int, probes: Int): DataFrame = {
    val qq = queries.select(col("vec_id"), quantize(col("embedding")).as("qfull"))
    // probe selection as the bounded top-k agg: a batch-scoring job
    // carries millions of queries, and a rank window would shuffle
    // nq×K scored rows just to keep `probes` per query
    val probed = qq.join(broadcast(coarse))
      .withColumn("pdist", call_udf("graft_l2_int", col("qfull"), col("c_q")))
      .groupBy(col("vec_id"))
      .agg(first(col("qfull")).as("qfull"),
        call_udf("graft_topk_min",
          struct(col("pdist"), col("c_id"), col("c_q")), lit(probes)).as("pl"))
      .select(col("vec_id"), col("qfull"), explode(col("pl")).as("p"))
      .select(col("vec_id"), col("qfull"),
        col("p.c_id").as("list_id"), col("p.c_q").as("list_q"))
    residualSubvectors(probed, "q_id", m, dim)
      .join(books, Seq("sub_id"))
      .withColumn("d", call_udf("graft_l2_int", col("q"), col("c_q")))
      .select(col("q_id"), col("list_id"), col("sub_id"),
        col("c_id").as("code"), col("d"))
  }

  /** ADC scoring tail shared by the encode-inline and stored-code
    * serving paths: same-list lookup-table sum per candidate, top-k
    * ascending, ties → lowest vector id. `codes` is the per-
    * (vec_id, sub_id) row form (vec_id, list_id, sub_id, code).
    *
    * Top-k is the bounded [[graft.functions.TopKMinAggExpr]] rather
    * than a rank window: the window ships every probed-list candidate
    * (n·probes/K rows per query) to the query's partition to sort and
    * discard; the aggregate reduces to k rows per query map-side, so
    * only k·tasks rows per query cross the final shuffle. */
  private def adcServe(codes: DataFrame, table: DataFrame,
      k: Int): DataFrame =
    codes.join(broadcast(table), Seq("list_id", "sub_id", "code"))
      .filter(col("vec_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(sum(col("d")).as("adist"))
      .groupBy(col("q_id"))
      .agg(call_udf("graft_topk_min",
        struct(col("adist"), col("vec_id")), lit(k)).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("q_id"), (col("pos") + 1).cast("long").as("rank"),
        col("t.vec_id").as("neighbor_id"), col("t.adist").as("adist"))

  /** IVF-PQ index BUILD: the stored form of the index — one row per
    * vector with its coarse list id and m-entry residual PQ code. A
    * deployment encodes the corpus ONCE (nightly or incrementally),
    * persists this table, and serves every query batch from it via
    * [[ivfPqTopKFromCodes]] — the precomputed-signature pattern the
    * historical near-dup path uses ([[TextDedup.nearDupAgainstHistorySigs]]),
    * applied to ANN. At fixed codebook sizes (K coarse lists, Kb
    * entries per subspace book) encode cost is n · (K + m·Kb) integer
    * L2s — LINEAR in corpus size (tools/EncodeBench measures it).
    *
    * Scale shape: centroids and codebooks broadcast against one corpus
    * scan; the per-subspace argmin reduces map-side; the code array
    * reassembles in a per-vector aggregate — the corpus never joins
    * itself, and the stored row is a list id + m small ints. */
  def ivfPqEncode(vecs: DataFrame, coarse: DataFrame, books: DataFrame,
      m: Int, dim: Int, attrs: Seq[String] = Nil): DataFrame = {
    graft.functions.GraftFunctions.register(vecs.sparkSession)
    val q = vecs.select(col("vec_id"), quantize(col("embedding")).as("qfull"))
    val enc = residualSubvectors(assignCoarse(q, coarse), "vec_id", m, dim)
      .join(broadcast(books), Seq("sub_id"))
      .withColumn("dist", call_udf("graft_l2_int", col("q"), col("c_q")))
      .groupBy(col("vec_id"), col("sub_id"))
      .agg(first(col("list_id")).as("list_id"),
        max_by(col("c_id"),
          struct((-col("dist")).as("nd"), (-col("c_id")).as("nc"))).as("code"))
      .groupBy(col("vec_id"))
      .agg(first(col("list_id")).as("list_id"),
        transform(array_sort(collect_list(struct(col("sub_id"), col("code")))),
          s => s.getField("code")).as("codes"))
    // filter ATTRIBUTES ride the stored row (the attribute-embedded
    // index layout filtered serving needs — q_llm_ann_filtered): one
    // build-time id join, amortized over every serve; attrs = Nil
    // leaves the plan untouched. The attrs join reads `vecs` through a
    // SECOND subtree — a caller whose input is nondeterministically
    // deduplicated must materialize it first so codes and attrs cannot
    // pair rows from different duplicate picks (mergeCodesBatch does).
    if (attrs.isEmpty) enc
    else {
      val missing = attrs.filterNot(vecs.columns.contains)
      require(missing.isEmpty,
        s"ivfPqEncode: input frame lacks attribute column(s) " +
          s"${missing.mkString(", ")} — an attribute-embedded index's " +
          s"delta feed must carry the attrs its genesis was encoded with")
      enc.join(vecs.select(col("vec_id") +: attrs.map(col): _*),
        Seq("vec_id"))
    }
  }

  /** The attribute columns a stored code frame carries beyond the
    * (vec_id, list_id, codes) triple — ONE definition of reserved-vs-
    * attribute, shared by the loose-frame merge and the
    * [[IvfPqIndex]] bundle API so the two maintenance paths cannot
    * drift. */
  private[llm] def attrColumnsOf(codes: DataFrame): Seq[String] =
    codes.columns.toSeq.filterNot(Set("vec_id", "list_id", "codes"))

  /** IVFADC serving against a PRECOMPUTED code table (the output of
    * [[ivfPqEncode]], typically read back from storage): identical
    * semantics and results to [[ivfPqTopK]], but the corpus side is a
    * scan of the m-byte codes instead of a re-encode — the serving
    * cost a real deployment pays per query batch. The encode/serve
    * split also means the stored table must match the index config:
    * `size(codes) === m` is enforced at execution time (the sig-length
    * guard pattern), since codes built with a different m would
    * silently mis-join the lookup table. */
  def ivfPqTopKFromCodes(codeTable: DataFrame, queries: DataFrame, k: Int,
      coarse: DataFrame, books: DataFrame, m: Int, dim: Int,
      probes: Int = 1): DataFrame = {
    graft.functions.GraftFunctions.register(queries.sparkSession)
    val codes = guardCodes(codeTable, m)
      .select(col("vec_id"), col("list_id"),
        posexplode(col("codes")).as(Seq("sub_id", "code")))
    adcServe(codes, adcQueryTable(queries, coarse, books, m, dim, probes), k)
  }

  /** Execution-time config guard on a stored code table: codes built
    * with a different m silently mis-join the ADC lookup table, so the
    * mismatch raises instead (the sig-length-guard pattern). */
  private def guardCodes(codeTable: DataFrame, m: Int): DataFrame =
    codeTable
      .withColumn("codes", when(size(col("codes")) === m, col("codes"))
        .otherwise(raise_error(concat(lit("code length "),
          size(col("codes")).cast("string"),
          lit(s" != m $m: codes were built with a different PQ config")))))

  /** Incremental index build: keep every stored row, encode ONLY the
    * vectors not yet in the code table, and append — the nightly
    * delta job. The stored side pays one id anti join (no vector
    * arithmetic, no re-encode); only the delta pays the
    * [[ivfPqEncode]] scan, so a 1%-new day costs 1% of a rebuild.
    * Same precomputed-signature shape as
    * [[TextDedup.nearDupAgainstHistorySigs]]. The centroids and
    * codebooks must be the ones the stored table was encoded with
    * (a frozen quantizer — re-training them is a rebuild, not an
    * increment); a wrong-m stored table raises via [[guardCodes]].
    * Result-identical to a from-scratch [[ivfPqEncode]] of the whole
    * corpus by construction — q_llm_ivfpq_inc replays exactly that
    * equality through the full-encode oracle SQL. */
  def ivfPqEncodeIncremental(codeTable: DataFrame, vecs: DataFrame,
      coarse: DataFrame, books: DataFrame, m: Int, dim: Int): DataFrame = {
    // one hint-free anti join on the id columns: the planner broadcasts
    // the stored id set while it is small and AQE degrades to a shuffle
    // when it is not. Deliberately NOT Retrieval.segMergeParts's
    // forced-broadcast manifest probe — that shape's contract is a
    // BOUNDED delta, and this entry point's own oracle replays
    // idempotency with delta ≈ the whole corpus, where a forced
    // corpus-sized broadcast fails outright instead of degrading. A
    // caller with a maintained manifest and a bounded nightly delta
    // should anti-join against the manifest upstream (the
    // segMergeParts stance) and pass only never-seen vectors here.
    val fresh = vecs.join(codeTable.select(col("vec_id")),
      Seq("vec_id"), "left_anti")
    // attribute columns the stored table carries (anything beyond the
    // code triple) are INFERRED and preserved: the delta encodes with
    // the same attrs, so an attribute-embedded index stays filterable
    // across increments without the caller re-declaring its layout
    val attrs = attrColumnsOf(codeTable)
    if (attrs.isEmpty)
      guardCodes(codeTable, m)
        .select(col("vec_id"), col("list_id"), col("codes"))
        .unionByName(ivfPqEncode(fresh, coarse, books, m, dim))
    else
      guardCodes(codeTable, m)
        .unionByName(ivfPqEncode(fresh, coarse, books, m, dim, attrs))
  }

  /** Streaming IVFADC serving: a continuous query feed (vec_id,
    * embedding, event_ts) answered from the PRECOMPUTED code table —
    * the online half of the encode → store → serve split
    * ([[ivfPqEncode]] is the nightly half). Emits, per closed event-
    * time window, each query's top-k neighbors with the same integer
    * ADC semantics as [[ivfPqTopKFromCodes]] (spec-pinned equal).
    *
    * The batch chain's windows and its query-side aggregations are
    * illegal on a stream, so the probe selection and the lookup table
    * are computed ROW-LOCALLY instead: the coarse centroids and the
    * codebooks — index-sized, the exact frames the batch path
    * broadcasts — ride in as single-row collected arrays, and each
    * query row derives its probed lists (sort by (dist, c_id), take
    * `probes`) and its per-list ADC map with higher-order functions.
    * One stream-static equi join on list_id against the stored codes
    * scores only probed-list candidates, and the single stateful
    * operator is the windowed [[graft.functions.TopKMinAggExpr]]
    * aggregation — k rows of state per open (window, query), emitted
    * on watermark close. Intermediate arrays (qfull, resid) are
    * materialized as their own projections so HOF lambdas never
    * re-evaluate an upstream expression per element. */
  def streamingIvfPqServe(queries: DataFrame, codeTable: DataFrame,
      coarse: DataFrame, books: DataFrame, m: Int, dim: Int, k: Int,
      probes: Int = 1, windowDur: String = "1 minute",
      watermark: String = "1 hour"): DataFrame =
    streamingAdcCandidates(queries, codeTable, coarse, books, m, dim,
      k, probes, watermark)
      .groupBy(window(col("event_ts"), windowDur), col("q_id"))
      .agg(call_udf("graft_topk_min",
        struct(col("adist"), col("vec_id")), lit(k)).as("top"))
      .select(col("window.start").as("win_start"), col("q_id"),
        posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("win_start"), col("q_id"),
        (col("pos") + 1).cast("long").as("rank"),
        col("t.vec_id").as("neighbor_id"), col("t.adist").as("adist"))

  /** The pre-aggregation SEMANTIC candidate stream shared by
    * [[streamingIvfPqServe]] and the hybrid fusion
    * ([[Retrieval.streamingRrfFusionServe]]): per query event, the
    * probed-list ADC candidates as (q_id, event_ts, adist, vec_id) —
    * everything below is stateless (row-local probe selection and LUT
    * derivation, one stream-static equi join on list_id, the per-list
    * bounded top-k inside the kernel), so the caller chooses the one
    * stateful windowed tail. */
  private[llm] def streamingAdcCandidates(queries: DataFrame,
      codeTable: DataFrame, coarse: DataFrame, books: DataFrame,
      m: Int, dim: Int, k: Int, probes: Int,
      watermark: String): DataFrame = {
    graft.functions.GraftFunctions.register(queries.sparkSession)
    val subDim = dim / m
    val keyBase = 1L << 32
    // static single-row frames: the whole index metadata as arrays
    val carr = coarse
      .agg(collect_list(struct(col("c_id"), col("c_q"))).as("carr"))
      .withColumn("one", lit(1))
    val barr = books
      .agg(collect_list(struct(col("sub_id"), col("c_id"), col("c_q"))).as("barr"))
      .withColumn("one", lit(1))
    val probed = queries
      .withWatermark("event_ts", watermark)
      .select(col("vec_id").as("q_id"), col("event_ts"),
        quantize(col("embedding")).as("qfull"), lit(1).as("one"))
      .join(broadcast(carr), Seq("one"))
      .join(broadcast(barr), Seq("one"))
      // row-local probe selection: (dist, c_id) sort = the batch
      // window's ORDER BY pdist, c_id
      .withColumn("probed", slice(array_sort(transform(col("carr"),
        c => struct(
          call_udf("graft_l2_int", col("qfull"), c.getField("c_q")).as("pd"),
          c.getField("c_id").as("list_id"),
          c.getField("c_q").as("list_q")))), 1, probes))
      .select(col("q_id"), col("event_ts"), col("qfull"), col("barr"),
        explode(col("probed")).as("p"))
      .select(col("q_id"), col("event_ts"), col("barr"),
        col("p.list_id").as("list_id"),
        zip_with(col("qfull"), col("p.list_q"), (a, b) => a - b).as("resid"))
    // per (query, probed list): the ADC lookup table as a map keyed
    // sub_id·2³² + code — the batch path's broadcast table rows,
    // folded into one row-local value
    // The ADC tail is the PACKED-LIST form — the real IVFADC inner
    // loop: one row per (query, probed list), the list's member codes
    // attached ONCE as a packed array, and graft_adc_topk scanning the
    // whole list in a single kernel eval (binary-search LUT lookups,
    // k smallest by the (adist, vec_id) total order). The previous
    // join-then-aggregate form materialized a row PER candidate, each
    // carrying the (m·Kb)-entry LUT arrays (~16 KB × |list| per query
    // at Kb=256) — the sf1 soak measured it at 34 q/s with a map LUT
    // and 148-156 q/s with sorted-array lookups; packing removes the
    // per-candidate row entirely. The per-list top-k under a total
    // order preserves the global top-k exactly, and the cross-list /
    // cross-trigger merge is the same bounded graft_topk_min
    // aggregate — results are identical (spec-pinned vs batch).
    val lut = probed
      .withColumn("lsorted", array_sort(transform(col("barr"),
        b => struct(
          (b.getField("sub_id").cast("long") * keyBase +
            b.getField("c_id")).as("k"),
          call_udf("graft_l2_int",
            slice(col("resid"), b.getField("sub_id") * subDim + 1, lit(subDim)),
            b.getField("c_q")).as("v")))))
      .select(col("q_id"), col("event_ts"), col("list_id"),
        transform(col("lsorted"), s => s.getField("k")).as("lkeys"),
        transform(col("lsorted"), s => s.getField("v")).as("lvals"))
    // static: each list's members packed into one row (list count ×
    // ~|list| structs — the same bytes the codes table holds, grouped)
    val packed = guardCodes(codeTable, m)
      .groupBy(col("list_id"))
      .agg(collect_list(struct(col("vec_id"),
        col("codes").cast("array<long>").as("codes"))).as("members"))
    lut
      .join(packed, Seq("list_id"))
      .select(col("q_id"), col("event_ts"),
        explode(call_udf("graft_adc_topk", col("lkeys"), col("lvals"),
          col("members"), col("q_id"), lit(keyBase), lit(k))).as("t"))
      .select(col("q_id"), col("event_ts"),
        col("t.adist").as("adist"), col("t.vec_id").as("vec_id"))
  }

  /** Oracle'd END-TO-END at iters = 0, probes = 1: coarse stride
    * seeds, residual-seed codebooks, same-list ADC — quantize, coarse
    * argmin, integer residuals, per-subspace encode, lookup-table
    * sums, rank, all restated in DuckDB. With probes = 1 a query's
    * probed list IS its assigned list, so its residual table rows come
    * from the same scored frame as the corpus codes. The trained path
    * (iters > 0, probes > 1) is ScalaTest-pinned against a sequential
    * IVFADC reference. */
  val qIvfPqAnn = QuerySpec(
    "q_llm_ivfpq_ann",
    (s, d) => {
      graft.functions.GraftFunctions.register(s)
      val vs = Tables.load(s, d, "embeddings")
      val (coarse, books) = ivfPqTrain(vs, coarseStride = 100, m = 4,
        dim = 64, bookStride = 50, iters = 0)
      ivfPqTopK(vs, vs.filter(col("vec_id") < 5), k = 5, coarse, books,
        m = 4, dim = 64, probes = 1)
        .orderBy(col("q_id"), col("rank"))
    },
    Some("""WITH q AS (
           |  SELECT vec_id,
           |    CASE WHEN list_max(list_transform(embedding, x -> abs(x))) = 0
           |      THEN list_transform(embedding, x -> 0)
           |      ELSE list_transform(embedding, x -> CAST(floor(
           |        CAST(x AS DOUBLE) /
           |        CAST(list_max(list_transform(embedding, y -> abs(y))) AS DOUBLE)
           |        * 127.0 + 0.5) AS INTEGER))
           |    END AS qfull
           |  FROM embeddings
           |), coarse AS (
           |  SELECT vec_id AS c_id, qfull AS c_q FROM q WHERE vec_id % 100 = 0
           |), cscore AS (
           |  SELECT q.vec_id, q.qfull, c.c_id, c.c_q,
           |    list_reduce(list_prepend(CAST(0 AS BIGINT),
           |      list_transform(list_zip(q.qfull, c.c_q),
           |        z -> CAST(z[1] - z[2] AS BIGINT) * (z[1] - z[2]))),
           |      (a, x) -> a + x) AS dist
           |  FROM q, coarse c
           |), assigned AS (
           |  SELECT vec_id, qfull, c_id AS list_id, c_q AS list_q FROM (
           |    SELECT *, row_number() OVER (PARTITION BY vec_id
           |      ORDER BY dist, c_id) AS rn FROM cscore) WHERE rn = 1
           |), rsub AS (
           |  SELECT vec_id, list_id, j.sub_id,
           |    (list_transform(list_zip(qfull, list_q), z -> z[1] - z[2]))
           |      [j.sub_id * 16 + 1 : j.sub_id * 16 + 16] AS sq
           |  FROM assigned, LATERAL (SELECT unnest(range(0, 4)) AS sub_id) j
           |), books AS (
           |  SELECT sub_id, vec_id AS c_id, sq AS c_q FROM rsub
           |  WHERE vec_id % 50 = 0
           |), scored AS (
           |  SELECT r.vec_id, r.list_id, r.sub_id, b.c_id,
           |    list_reduce(list_prepend(CAST(0 AS BIGINT),
           |      list_transform(list_zip(r.sq, b.c_q),
           |        z -> CAST(z[1] - z[2] AS BIGINT) * (z[1] - z[2]))),
           |      (a, x) -> a + x) AS dist
           |  FROM rsub r JOIN books b USING (sub_id)
           |), codes AS (
           |  SELECT vec_id, list_id, sub_id, c_id AS code FROM (
           |    SELECT *, row_number() OVER (PARTITION BY vec_id, sub_id
           |      ORDER BY dist, c_id) AS rn FROM scored) WHERE rn = 1
           |), qt AS (
           |  SELECT vec_id AS q_id, list_id, sub_id, c_id AS code, dist AS d
           |  FROM scored WHERE vec_id < 5
           |), adist AS (
           |  SELECT qt.q_id, codes.vec_id, CAST(sum(qt.d) AS BIGINT) AS adist
           |  FROM codes JOIN qt
           |    ON codes.list_id = qt.list_id AND codes.sub_id = qt.sub_id
           |    AND codes.code = qt.code
           |  WHERE codes.vec_id != qt.q_id
           |  GROUP BY qt.q_id, codes.vec_id
           |)
           |SELECT q_id,
           |  CAST(row_number() OVER (PARTITION BY q_id
           |    ORDER BY adist, vec_id) AS BIGINT) AS "rank",
           |  vec_id AS neighbor_id, adist
           |FROM adist
           |QUALIFY "rank" <= 5
           |ORDER BY q_id, "rank"""".stripMargin))

  /** Multi-probe IVFADC, oracle'd END-TO-END at probes = 2 — the
    * configuration shape a deployment actually runs (probing only the
    * assigned list caps recall at whatever the coarse quantizer got
    * right; real serving always probes several). Unlike the probes = 1
    * replay, a query's probed lists are NOT just its assigned list, so
    * the SQL builds the query-side residual table from the rn <= 2
    * probed slice: one residual per (query, probed list), scored
    * against the same corpus codes/books as q_llm_ivfpq_ann. Each
    * candidate still matches exactly one probed list (a corpus vector
    * has one assigned list), so the per-candidate ADC sum is
    * unambiguous. Everything else — stride seeds, integer residuals,
    * ties → lowest id — is the oracle'd q_llm_ivfpq_ann chain. */
  val qIvfPqAnnP2 = QuerySpec(
    "q_llm_ivfpq_ann_p2",
    (s, d) => {
      graft.functions.GraftFunctions.register(s)
      val vs = Tables.load(s, d, "embeddings")
      val (coarse, books) = ivfPqTrain(vs, coarseStride = 100, m = 4,
        dim = 64, bookStride = 50, iters = 0)
      ivfPqTopK(vs, vs.filter(col("vec_id") < 5), k = 5, coarse, books,
        m = 4, dim = 64, probes = 2)
        .orderBy(col("q_id"), col("rank"))
    },
    Some("""WITH q AS (
           |  SELECT vec_id,
           |    CASE WHEN list_max(list_transform(embedding, x -> abs(x))) = 0
           |      THEN list_transform(embedding, x -> 0)
           |      ELSE list_transform(embedding, x -> CAST(floor(
           |        CAST(x AS DOUBLE) /
           |        CAST(list_max(list_transform(embedding, y -> abs(y))) AS DOUBLE)
           |        * 127.0 + 0.5) AS INTEGER))
           |    END AS qfull
           |  FROM embeddings
           |), coarse AS (
           |  SELECT vec_id AS c_id, qfull AS c_q FROM q WHERE vec_id % 100 = 0
           |), cscore AS (
           |  SELECT q.vec_id, q.qfull, c.c_id, c.c_q,
           |    list_reduce(list_prepend(CAST(0 AS BIGINT),
           |      list_transform(list_zip(q.qfull, c.c_q),
           |        z -> CAST(z[1] - z[2] AS BIGINT) * (z[1] - z[2]))),
           |      (a, x) -> a + x) AS dist
           |  FROM q, coarse c
           |), assigned AS (
           |  SELECT vec_id, qfull, c_id AS list_id, c_q AS list_q FROM (
           |    SELECT *, row_number() OVER (PARTITION BY vec_id
           |      ORDER BY dist, c_id) AS rn FROM cscore) WHERE rn = 1
           |), rsub AS (
           |  SELECT vec_id, list_id, j.sub_id,
           |    (list_transform(list_zip(qfull, list_q), z -> z[1] - z[2]))
           |      [j.sub_id * 16 + 1 : j.sub_id * 16 + 16] AS sq
           |  FROM assigned, LATERAL (SELECT unnest(range(0, 4)) AS sub_id) j
           |), books AS (
           |  SELECT sub_id, vec_id AS c_id, sq AS c_q FROM rsub
           |  WHERE vec_id % 50 = 0
           |), scored AS (
           |  SELECT r.vec_id, r.list_id, r.sub_id, b.c_id,
           |    list_reduce(list_prepend(CAST(0 AS BIGINT),
           |      list_transform(list_zip(r.sq, b.c_q),
           |        z -> CAST(z[1] - z[2] AS BIGINT) * (z[1] - z[2]))),
           |      (a, x) -> a + x) AS dist
           |  FROM rsub r JOIN books b USING (sub_id)
           |), codes AS (
           |  SELECT vec_id, list_id, sub_id, c_id AS code FROM (
           |    SELECT *, row_number() OVER (PARTITION BY vec_id, sub_id
           |      ORDER BY dist, c_id) AS rn FROM scored) WHERE rn = 1
           |), probed AS (
           |  SELECT vec_id AS q_id, qfull, c_id AS list_id, c_q AS list_q
           |  FROM (
           |    SELECT *, row_number() OVER (PARTITION BY vec_id
           |      ORDER BY dist, c_id) AS rn FROM cscore WHERE vec_id < 5)
           |  WHERE rn <= 2
           |), qrsub AS (
           |  SELECT q_id, list_id, j.sub_id,
           |    (list_transform(list_zip(qfull, list_q), z -> z[1] - z[2]))
           |      [j.sub_id * 16 + 1 : j.sub_id * 16 + 16] AS sq
           |  FROM probed, LATERAL (SELECT unnest(range(0, 4)) AS sub_id) j
           |), qt AS (
           |  SELECT r.q_id, r.list_id, r.sub_id, b.c_id AS code,
           |    list_reduce(list_prepend(CAST(0 AS BIGINT),
           |      list_transform(list_zip(r.sq, b.c_q),
           |        z -> CAST(z[1] - z[2] AS BIGINT) * (z[1] - z[2]))),
           |      (a, x) -> a + x) AS d
           |  FROM qrsub r JOIN books b USING (sub_id)
           |), adist AS (
           |  SELECT qt.q_id, codes.vec_id, CAST(sum(qt.d) AS BIGINT) AS adist
           |  FROM codes JOIN qt
           |    ON codes.list_id = qt.list_id AND codes.sub_id = qt.sub_id
           |    AND codes.code = qt.code
           |  WHERE codes.vec_id != qt.q_id
           |  GROUP BY qt.q_id, codes.vec_id
           |)
           |SELECT q_id,
           |  CAST(row_number() OVER (PARTITION BY q_id
           |    ORDER BY adist, vec_id) AS BIGINT) AS "rank",
           |  vec_id AS neighbor_id, adist
           |FROM adist
           |QUALIFY "rank" <= 5
           |ORDER BY q_id, "rank"""".stripMargin))

  /** The index-build deliverable, oracle'd END-TO-END at stride
    * seeds: the same chain as q_llm_ivfpq_ann through the per-subspace
    * argmin, reassembled to the stored (vec_id, list_id, codes) row —
    * DuckDB replays it with `list(code ORDER BY sub_id)`. */
  val qIvfPqCodes = QuerySpec(
    "q_llm_ivfpq_codes",
    (s, d) => {
      graft.functions.GraftFunctions.register(s)
      val vs = Tables.load(s, d, "embeddings")
      val (coarse, books) = ivfPqTrain(vs, coarseStride = 100, m = 4,
        dim = 64, bookStride = 50, iters = 0)
      ivfPqEncode(vs, coarse, books, m = 4, dim = 64)
        // oracle-facing string form (driver hash-compares scalars; the
        // production table keeps the real array)
        .select(col("vec_id"), col("list_id"), joined(col("codes")).as("codes"))
        .orderBy(col("vec_id"))
    },
    Some("""WITH q AS (
           |  SELECT vec_id,
           |    CASE WHEN list_max(list_transform(embedding, x -> abs(x))) = 0
           |      THEN list_transform(embedding, x -> 0)
           |      ELSE list_transform(embedding, x -> CAST(floor(
           |        CAST(x AS DOUBLE) /
           |        CAST(list_max(list_transform(embedding, y -> abs(y))) AS DOUBLE)
           |        * 127.0 + 0.5) AS INTEGER))
           |    END AS qfull
           |  FROM embeddings
           |), coarse AS (
           |  SELECT vec_id AS c_id, qfull AS c_q FROM q WHERE vec_id % 100 = 0
           |), cscore AS (
           |  SELECT q.vec_id, q.qfull, c.c_id, c.c_q,
           |    list_reduce(list_prepend(CAST(0 AS BIGINT),
           |      list_transform(list_zip(q.qfull, c.c_q),
           |        z -> CAST(z[1] - z[2] AS BIGINT) * (z[1] - z[2]))),
           |      (a, x) -> a + x) AS dist
           |  FROM q, coarse c
           |), assigned AS (
           |  SELECT vec_id, qfull, c_id AS list_id, c_q AS list_q FROM (
           |    SELECT *, row_number() OVER (PARTITION BY vec_id
           |      ORDER BY dist, c_id) AS rn FROM cscore) WHERE rn = 1
           |), rsub AS (
           |  SELECT vec_id, list_id, j.sub_id,
           |    (list_transform(list_zip(qfull, list_q), z -> z[1] - z[2]))
           |      [j.sub_id * 16 + 1 : j.sub_id * 16 + 16] AS sq
           |  FROM assigned, LATERAL (SELECT unnest(range(0, 4)) AS sub_id) j
           |), books AS (
           |  SELECT sub_id, vec_id AS c_id, sq AS c_q FROM rsub
           |  WHERE vec_id % 50 = 0
           |), scored AS (
           |  SELECT r.vec_id, r.list_id, r.sub_id, b.c_id,
           |    list_reduce(list_prepend(CAST(0 AS BIGINT),
           |      list_transform(list_zip(r.sq, b.c_q),
           |        z -> CAST(z[1] - z[2] AS BIGINT) * (z[1] - z[2]))),
           |      (a, x) -> a + x) AS dist
           |  FROM rsub r JOIN books b USING (sub_id)
           |), pcodes AS (
           |  SELECT vec_id, list_id, sub_id, c_id AS code FROM (
           |    SELECT *, row_number() OVER (PARTITION BY vec_id, sub_id
           |      ORDER BY dist, c_id) AS rn FROM scored) WHERE rn = 1
           |)
           |SELECT vec_id, list_id,
           |  array_to_string(list(code ORDER BY sub_id), ',') AS codes
           |FROM pcodes GROUP BY vec_id, list_id ORDER BY vec_id""".stripMargin))

  /** The full-corpus stored code table at the stride-seed config
    * (coarse stride 100, m = 4, book stride 50, iters = 0),
    * MATERIALIZED once per corpus via [[graft.sources.IndexStore]] —
    * the semantic half of the stored-index serving surface, shared by
    * q_llm_ivfpq_serve and the hybrid q_llm_rrf_fusion_serve so both
    * measure the serve, not an in-plan re-encode. The name pins the
    * quantizer config (a different config is a rebuild, not a reuse);
    * the frozen coarse/books frames are stride slices — centroid-count
    * sized, derived in-plan each session. */
  private[graft] def storedCodesOf(s: SparkSession, d: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val (coarse, books) = storedQuantizerOf(s, d)
    val vs = Tables.load(s, d, "embeddings")
    // encode against the STORED quantizer readers, not the in-memory
    // trained frames: if the codes artifact is ever rebuilt separately
    // (crash between artifact builds, selective GC), the new codes
    // must be residuals against exactly the centroids serving reads
    // back — and the rebuild must not re-pay the training scan.
    // The stored row ALSO carries the vector's filter attribute
    // (label) — the attribute-embedded index layout filtered ANN
    // serving needs: a metadata predicate lands on the code-table
    // parquet scan itself (PushedFilters + row-group pruning) instead
    // of paying a corpus-sized join per query batch. The one join here
    // is build-time, amortized over every serve. Name carries `_attr`
    // so caches written before the layout change rebuild instead of
    // serving a label-less table.
    val firstBuild = !graft.sources.IndexStore.artifactExists(s, d,
      "seg_ivfpq_attr_c100_m4_b50/codes", table = "embeddings")
    val stored = graft.sources.IndexStore.parquet(s, d,
      "seg_ivfpq_attr_c100_m4_b50/codes", table = "embeddings")(
      ivfPqEncode(vs, coarse, books, m = 4, dim = 64,
        attrs = Seq("label")))
    // the pre-round-12 label-less codes artifact lives under the
    // still-live quantizer root, so the store's stale-KEY gc never
    // reaches it — reclaim the dead corpus-sized generation on the
    // ONE call that migrated (built the replacement), never on the
    // steady-state read path: a recursive delete in a serve accessor
    // could race a concurrent session still scanning the old artifact
    if (firstBuild)
      graft.sources.IndexStore.dropArtifact(s, d,
        "seg_ivfpq_full_c100_m4_b50/codes", table = "embeddings")
    (stored, coarse, books)
  }

  /** The stored frozen QUANTIZER alone — for consumers (the delta
    * encode job q_llm_ivfpq_inc) that must never force the full-corpus
    * codes build as a side effect. The codebooks' derivation embeds a
    * corpus-wide coarse assignment (n × K integer L2s — 211 s/rep
    * measured at sf10 when left in-plan), so both frames are
    * IndexStore artifacts; training runs only when one is missing. */
  private[llm] def storedQuantizerOf(s: SparkSession, d: String)
      : (DataFrame, DataFrame) = {
    graft.functions.GraftFunctions.register(s)
    val vs = Tables.load(s, d, "embeddings")
    lazy val trained = ivfPqTrain(vs, coarseStride = 100, m = 4,
      dim = 64, bookStride = 50, iters = 0)
    val coarse = graft.sources.IndexStore.parquet(s, d,
      "seg_ivfpq_full_c100_m4_b50/coarse", table = "embeddings")(trained._1)
    val books = graft.sources.IndexStore.parquet(s, d,
      "seg_ivfpq_full_c100_m4_b50/books", table = "embeddings")(trained._2)
    (coarse, books)
  }

  /** Serving from the STORED code table, oracle'd at probes = 2 with
    * the q_llm_ivfpq_ann_p2 SQL verbatim: the encode → store → serve
    * split must be result-identical to the inline end-to-end chain, so
    * the same DuckDB replay checks both. The code table is the
    * [[storedCodesOf]] materialized artifact (the bm25_serve stance),
    * so reps measure the serve alone. The trained config (iters > 0)
    * is pinned equal to [[ivfPqTopK]] in SimilaritySpec. */
  val qIvfPqServe = QuerySpec(
    "q_llm_ivfpq_serve",
    (s, d) => {
      val (stored, coarse, books) = storedCodesOf(s, d)
      val vs = Tables.load(s, d, "embeddings")
      ivfPqTopKFromCodes(stored, vs.filter(col("vec_id") < 5), k = 5,
        coarse, books, m = 4, dim = 64, probes = 2)
        .orderBy(col("q_id"), col("rank"))
    },
    qIvfPqAnnP2.oracle)

  /** Exact REFINE stage over IVFADC candidates (the classic
    * two-stage retrieve-then-rerank every production vector store
    * offers, e.g. FAISS's IndexRefineFlat): serve top-(k·refine) per
    * query by ADC from the stored code table, then re-score ONLY
    * those candidates by exact integer L2 against the raw vectors and
    * keep the exact-ranked top-k. Buys back the PQ reconstruction
    * error at candidate-set prices: the exact pass touches q·k·refine
    * vectors, never the corpus (vs q·n for brute force).
    *
    * Scale shape: the candidate frame is aggregate-bounded
    * (k·refine rows per query — [[ivfPqTopKFromCodes]]'s TopKMinAgg
    * tail), broadcast into ONE raw-vector scan (no shuffle of
    * embeddings), queries ride the same single-row-ish broadcast as
    * every serving path, and the re-rank tail is again the bounded
    * TopKMinAgg — nothing anywhere is corpus-sized but the one scan.
    * Recall: refined@k ≥ ADC@k against the exact ranking whenever the
    * ADC top-k ⊆ ADC top-(k·refine) candidate pool (always), with
    * equality to EXACT top-k once the pool covers it —
    * SimilaritySpec pins both directions. */
  def ivfPqTopKRefined(codeTable: DataFrame, queries: DataFrame,
      rawVecs: DataFrame, k: Int, refine: Int, coarse: DataFrame,
      books: DataFrame, m: Int, dim: Int, probes: Int = 1): DataFrame = {
    graft.functions.GraftFunctions.register(queries.sparkSession)
    val cands = ivfPqTopKFromCodes(codeTable, queries, k * refine, coarse,
      books, m, dim, probes)
      .select(col("q_id"), col("neighbor_id").as("vec_id"))
    val qv = rawVecs.select(col("vec_id"), quantize(col("embedding")).as("q"))
    val qq = broadcast(queries.select(col("vec_id").as("q_id"),
      quantize(col("embedding")).as("qq")))
    broadcast(cands).join(qv, Seq("vec_id"))
      .join(qq, Seq("q_id"))
      .withColumn("d", call_udf("graft_l2_int", col("q"), col("qq")))
      .groupBy(col("q_id"))
      .agg(call_udf("graft_topk_min",
        struct(col("d"), col("vec_id")), lit(k)).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("q_id"), (col("pos") + 1).cast("long").as("rank"),
        col("t.vec_id").as("neighbor_id"), col("t.d").as("d"))
  }

  /** Zero-state micro-batch twin of the REFINED serve (the
    * [[Retrieval.rrfFusionServeEachBatch]] stance applied to ANN):
    * each arriving query micro-batch is answered inside `foreachBatch`
    * by the batch [[ivfPqTopKRefined]] over the stored code table and
    * raw vectors — candidate pools and re-rank tails are
    * TopKMinAgg-bounded per batch, cross-batch state is NONE, so the
    * path carries any arrival rate the batch server carries. The
    * windowed [[streamingIvfPqServe]] cannot host the refine join
    * (its candidate aggregation is the stream's one legal stateful
    * operator — a post-aggregation stream-static join + second
    * aggregation is illegal in append mode), which is exactly the
    * per-batch family's niche. Replayed queries re-answer
    * byte-identically (deterministic servers) — downstream
    * idempotence is an upsert on q_id. */
  def refineServeEachBatch(queries: DataFrame, codeTable: DataFrame,
      rawVecs: DataFrame, coarse: DataFrame, books: DataFrame,
      m: Int, dim: Int, k: Int = 10, refine: Int = 3, probes: Int = 2,
      checkpoint: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      (sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    queries.writeStream
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            id: Long) =>
        val qb = b.toDF().dropDuplicates("vec_id").localCheckpoint()
        sink(ivfPqTopKRefined(codeTable, qb, rawVecs, k, refine,
          coarse, books, m, dim, probes), id)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()

  /** The refine stage as a declared serving query: stored codes +
    * frozen stored quantizer (the q_llm_ivfpq_serve stance), ADC
    * candidate pool of k·3, exact integer-L2 re-rank to top-5.
    * Oracle derived from the p2 replay by string surgery on its final
    * ranking block (the q_llm_ann_filtered drift-proofing stance):
    * candidates = ADC rank ≤ 15, then the exact re-rank replayed over
    * the `q` CTE's quantized vectors — the integer L2 is the same
    * wrap-free BIGINT fold both engines compute bit-equally. */
  val qAnnRefine = QuerySpec(
    "q_llm_ann_refine",
    (s, d) => {
      val (stored, coarse, books) = storedCodesOf(s, d)
      val vs = Tables.load(s, d, "embeddings")
      ivfPqTopKRefined(stored, vs.filter(col("vec_id") < 5), vs, k = 5,
        refine = 3, coarse, books, m = 4, dim = 64, probes = 2)
        .orderBy(col("q_id"), col("rank"))
    },
    qIvfPqAnnP2.oracle.map(refineTailSurgery))

  /** The refine-tail string surgery shared by q_llm_ann_refine and
    * its fixed-quantizer twin — applied to a p2-shaped replay (the
    * uncapped or the train-capped base), so the exact re-rank CTEs
    * can never drift between the two. */
  private def refineTailSurgery(sql: String): String = {
    val anchor =
      """SELECT q_id,
        |  CAST(row_number() OVER (PARTITION BY q_id
        |    ORDER BY adist, vec_id) AS BIGINT) AS "rank",
        |  vec_id AS neighbor_id, adist
        |FROM adist
        |QUALIFY "rank" <= 5
        |ORDER BY q_id, "rank"""".stripMargin
    require(sql.endsWith(anchor), "p2 oracle shape changed under " +
      "q_llm_ann_refine — update the refine anchor")
    // the dropped tail leaves "...)\n" closing the adist CTE — the
    // refine chain continues the WITH list, hence the leading comma
    sql.dropRight(anchor.length).stripSuffix("\n") + ", " +
      """cand AS (
        |  SELECT q_id, vec_id FROM adist
        |  QUALIFY row_number() OVER (PARTITION BY q_id
        |    ORDER BY adist, vec_id) <= 15
        |), refined AS (
        |  SELECT c.q_id, c.vec_id,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(list_zip(v.qfull, u.qfull),
        |        z -> CAST(z[1] - z[2] AS BIGINT) * (z[1] - z[2]))),
        |      (a, x) -> a + x) AS d
        |  FROM cand c
        |  JOIN q v ON c.vec_id = v.vec_id
        |  JOIN q u ON c.q_id = u.vec_id
        |)
        |SELECT q_id,
        |  CAST(row_number() OVER (PARTITION BY q_id
        |    ORDER BY d, vec_id) AS BIGINT) AS "rank",
        |  vec_id AS neighbor_id, d
        |FROM refined
        |QUALIFY "rank" <= 5
        |ORDER BY q_id, "rank"""".stripMargin
  }

  /** The ANN code table MAINTAINED as generation-log state
    * ([[IvfPqIndex.initMaintained]] genesis = the even-id half at
    * coverage −1, batch 0 = the catch-up delta over the whole corpus,
    * batch 1 = "tomorrow's" vectors at shifted ids, then a compaction
    * folding all of it), built once per corpus content and served
    * PINNED at `loadMaintainedAt(root, 0)` — the pinnedScopeOf stance
    * applied to ANN. The pin resolves the full corpus and NOTHING
    * later: batch 1's shifted near-copies would dominate any top-k
    * they entered (identical embeddings ⇒ adist 0), so the oracle
    * match is also the proof the pinned read excludes post-pin
    * merges, and deferred GC is what keeps the pinned generation set
    * readable under the later compaction. */
  private[llm] def pinnedIvfPqOf(s: SparkSession, d: String): IvfPqIndex = {
    val (coarse, books) = storedQuantizerOf(s, d)
    val root = graft.sources.IndexStore.maintainedRoot(s, d,
      "maint_ivfpq_c100_m4_b50", table = "embeddings") { dir =>
      val vs = Tables.load(s, d, "embeddings")
      IvfPqIndex.initMaintained(
        IvfPqIndex(m = 4, dim = 64, coarse, books,
          ivfPqEncode(vs.filter(pmod(col("vec_id"), lit(2)) === 0),
            coarse, books, m = 4, dim = 64)), dir)
      IvfPqIndex.mergeCodesBatch(dir)(vs, 0L)
      IvfPqIndex.mergeCodesBatch(dir)(
        vs.select((col("vec_id") + lit(10000000L)).as("vec_id"),
          col("embedding")), 1L)
      IvfPqIndex.compactCodes(s, dir)
    }
    IvfPqIndex.loadMaintainedAt(s, root, 0L).getOrElse(
      throw new IllegalStateException(
        s"pinned maintained ivfpq state missing under $root"))
  }

  /** q_llm_ivfpq_serve SERVED FROM THE MAINTAINED CODE TABLE, PINNED:
    * ranking runs off the generation-log state as-of batch 0 —
    * byte-stable under the later delta and compaction the builder
    * already committed (the q_llm_bm25_scoped_pinned stance applied
    * to the ANN family, closing the same "artifact built in-session"
    * vs "serving the nightly-maintained state" gap). Oracle = the p2
    * replay verbatim: the pin covers exactly the corpus, so the
    * maintained state must be result-identical to the one-shot
    * stored-code serve. */
  val qIvfPqServePinned = QuerySpec(
    "q_llm_ivfpq_serve_pinned",
    (s, d) => {
      val idx = pinnedIvfPqOf(s, d)
      val vs = Tables.load(s, d, "embeddings")
      idx.topK(vs.filter(col("vec_id") < 5), k = 5, probes = 2)
        .orderBy(col("q_id"), col("rank"))
    },
    qIvfPqAnnP2.oracle)

  /** Metadata-FILTERED ANN serving — "top-k among vectors whose
    * attribute matches" (the filtered-search semantics of every
    * production vector store: restrict by language, source, license,
    * time range BEFORE ranking, not after). Implementation is the
    * attribute-embedded index: [[storedCodesOf]]'s stored row carries
    * the label beside the codes, so the predicate is a plain filter on
    * the code-table scan — pushed to parquet (PlanSpec pins
    * PushedFilters), pruning row groups before a single ADC lookup
    * runs, with ZERO serve-time joins. Candidates are filtered BEFORE
    * the top-k aggregate (pre-filter), so the result is exactly the
    * top-k of the matching sub-corpus — equivalently, serving an index
    * built over only the matching vectors (SimilaritySpec pins that
    * equivalence; it holds because a frozen quantizer encodes each
    * vector independently of the rest of the corpus).
    *
    * Scale shape: the per-query candidate set is the probed lists
    * INTERSECTED with the predicate — selectivity multiplies the
    * serving cost DOWN (a 10% filter scores ~10% of the probed rows).
    * The flip side a deployment must know: at high selectivity the
    * probed lists may hold fewer than k matches, so recall targets
    * need `probes` raised as the filter narrows — the q_llm_ivf_stats
    * occupancy card is the tuning input. Oracle: the q_llm_ivfpq_ann_p2
    * replay with the label predicate applied to candidates. */
  val qAnnFiltered = QuerySpec(
    "q_llm_ann_filtered",
    (s, d) => {
      val (stored, coarse, books) = storedCodesOf(s, d)
      val vs = Tables.load(s, d, "embeddings")
      ivfPqTopKFromCodes(stored.filter(col("label") === 1),
        vs.filter(col("vec_id") < 5), k = 5, coarse, books,
        m = 4, dim = 64, probes = 2)
        .orderBy(col("q_id"), col("rank"))
    },
    qIvfPqAnnP2.oracle.map(filteredCandSurgery))

  /** The candidate attribute-predicate surgery shared by
    * q_llm_ann_filtered and its fixed-quantizer twin: identical
    * chain, candidates restricted to the attribute match — derived
    * from the p2-shaped replay so the oracles can never drift. */
  private def filteredCandSurgery(sql: String): String = {
    val anchor = "  WHERE codes.vec_id != qt.q_id"
    require(sql.contains(anchor), "p2 oracle shape changed under " +
      "q_llm_ann_filtered — update the filtered anchor")
    sql.replace(anchor,
      "  JOIN embeddings attr ON codes.vec_id = attr.vec_id\n" +
        "  WHERE codes.vec_id != qt.q_id AND attr.label = 1")
  }

  /** The serving-matrix capstone: metadata-FILTERED candidates
    * (q_llm_ann_filtered's pushed-predicate code-table scan) exactly
    * RE-RANKED (q_llm_ann_refine's candidate-bounded raw-vector
    * pass) — filter × refine composed in one serve, because the two
    * stages touch different frames: the predicate prunes the stored
    * scan BEFORE any ADC lookup, the refine re-scores only the
    * k·refine survivors. Oracle = the filtered replay with the refine
    * tail (both string surgeries compose on the p2 SQL — the refine
    * anchor sits after the filtered oracle's candidate-predicate
    * rewrite, so the candidates the exact pass re-ranks are already
    * the label-restricted ones). */
  val qAnnRefineFiltered = QuerySpec(
    "q_llm_ann_refine_filtered",
    (s, d) => {
      val (stored, coarse, books) = storedCodesOf(s, d)
      val vs = Tables.load(s, d, "embeddings")
      ivfPqTopKRefined(stored.filter(col("label") === 1),
        vs.filter(col("vec_id") < 5), vs, k = 5, refine = 3,
        coarse, books, m = 4, dim = 64, probes = 2)
        .orderBy(col("q_id"), col("rank"))
    },
    qAnnFiltered.oracle.map { sql =>
      val anchor =
        """SELECT q_id,
          |  CAST(row_number() OVER (PARTITION BY q_id
          |    ORDER BY adist, vec_id) AS BIGINT) AS "rank",
          |  vec_id AS neighbor_id, adist
          |FROM adist
          |QUALIFY "rank" <= 5
          |ORDER BY q_id, "rank"""".stripMargin
      require(sql.endsWith(anchor), "filtered oracle shape changed " +
        "under q_llm_ann_refine_filtered — update the refine anchor")
      sql.dropRight(anchor.length).stripSuffix("\n") + ", " +
        """cand AS (
          |  SELECT q_id, vec_id FROM adist
          |  QUALIFY row_number() OVER (PARTITION BY q_id
          |    ORDER BY adist, vec_id) <= 15
          |), refined AS (
          |  SELECT c.q_id, c.vec_id,
          |    list_reduce(list_prepend(CAST(0 AS BIGINT),
          |      list_transform(list_zip(v.qfull, u.qfull),
          |        z -> CAST(z[1] - z[2] AS BIGINT) * (z[1] - z[2]))),
          |      (a, x) -> a + x) AS d
          |  FROM cand c
          |  JOIN q v ON c.vec_id = v.vec_id
          |  JOIN q u ON c.q_id = u.vec_id
          |)
          |SELECT q_id,
          |  CAST(row_number() OVER (PARTITION BY q_id
          |    ORDER BY d, vec_id) AS BIGINT) AS "rank",
          |  vec_id AS neighbor_id, d
          |FROM refined
          |QUALIFY "rank" <= 5
          |ORDER BY q_id, "rank"""".stripMargin
    })

  /** The nightly delta job, oracle'd through the FULL-encode SQL: a
    * stored table holding the even-id half of the corpus plus an
    * incremental pass over the whole corpus must equal a from-scratch
    * encode of everything — the stored half rides through untouched
    * (one anti join), only the odd-id delta is encoded. */
  val qIvfPqInc = QuerySpec(
    "q_llm_ivfpq_inc",
    (s, d) => {
      graft.functions.GraftFunctions.register(s)
      val vs = Tables.load(s, d, "embeddings")
      // stored code table AND frozen quantizer are MATERIALIZED
      // artifacts (the bm25_inc stance, extended round 11: the
      // codebook derivation embeds a corpus-wide coarse assignment, so
      // leaving it in-plan re-paid n×K integer L2s per rep): the
      // measured cost is the delta encode + id anti join only. The
      // names pin the quantizer config — a different config is a
      // rebuild. The quantizer-only accessor never forces the
      // full-corpus codes artifact this query doesn't read.
      val (coarse, books) = storedQuantizerOf(s, d)
      val stored = graft.sources.IndexStore.parquet(s, d,
        "seg_ivfpq_c100_m4_b50/codes", table = "embeddings")(
        ivfPqEncode(vs.filter(pmod(col("vec_id"), lit(2)) === 0),
          coarse, books, m = 4, dim = 64))
      ivfPqEncodeIncremental(stored, vs, coarse, books, m = 4, dim = 64)
        .select(col("vec_id"), col("list_id"), joined(col("codes")).as("codes"))
        .orderBy(col("vec_id"))
    },
    qIvfPqCodes.oracle)

  /** IVF index health: the per-list occupancy table an index data
    * card publishes. Serving cost per probe is proportional to list
    * size, so a skewed coarse quantizer (dead centroids, one list
    * holding half the corpus) silently turns "probes=2" into a
    * near-exhaustive scan — the list-size histogram is the
    * centroid-rebalance alarm (retrain with more iters, or raise the
    * centroid count, when max_ppm dwarfs 1e6/k). Output: one row per
    * OCCUPIED list — (list_id, n_vecs, ppm share of corpus).
    *
    * Scale shape: the coarse assignment is [[assignCoarse]]'s
    * broadcast + map-side argmin; the stats are a k-row aggregate of
    * it; the corpus total rides one scalar-subquery broadcast
    * (single-row exchange, the hist_dedup pattern). */
  def ivfListStats(vecs: DataFrame, coarse: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(vecs.sparkSession)
    val q = vecs.select(col("vec_id"), quantize(col("embedding")).as("qfull"))
    val total = q.select(count(lit(1)).as("n_total"))
    assignCoarse(q, coarse)
      .groupBy(col("list_id")).agg(count(lit(1)).as("n_vecs"))
      .join(broadcast(total))
      .select(col("list_id"), col("n_vecs"),
        expr("(1000000 * n_vecs) div n_total").as("ppm"))
  }

  /** Oracle'd end-to-end at stride seeds over the q_llm_ivfpq_ann
    * coarse assignment — same quantize/argmin chain, aggregated to
    * list occupancy. */
  val qIvfStats = QuerySpec(
    "q_llm_ivf_stats",
    (s, d) => {
      graft.functions.GraftFunctions.register(s)
      val vs = Tables.load(s, d, "embeddings")
      val coarse = vs.select(col("vec_id"), quantize(col("embedding")).as("qfull"))
        .filter(pmod(col("vec_id"), lit(100)) === 0)
        .select(col("vec_id").as("c_id"), col("qfull").as("c_q"))
      ivfListStats(vs, coarse).orderBy(col("list_id"))
    },
    Some("""WITH q AS (
           |  SELECT vec_id,
           |    CASE WHEN list_max(list_transform(embedding, x -> abs(x))) = 0
           |      THEN list_transform(embedding, x -> 0)
           |      ELSE list_transform(embedding, x -> CAST(floor(
           |        CAST(x AS DOUBLE) /
           |        CAST(list_max(list_transform(embedding, y -> abs(y))) AS DOUBLE)
           |        * 127.0 + 0.5) AS INTEGER))
           |    END AS qfull
           |  FROM embeddings
           |), coarse AS (
           |  SELECT vec_id AS c_id, qfull AS c_q FROM q WHERE vec_id % 100 = 0
           |), cscore AS (
           |  SELECT q.vec_id, c.c_id,
           |    list_reduce(list_prepend(CAST(0 AS BIGINT),
           |      list_transform(list_zip(q.qfull, c.c_q),
           |        z -> CAST(z[1] - z[2] AS BIGINT) * (z[1] - z[2]))),
           |      (a, x) -> a + x) AS dist
           |  FROM q, coarse c
           |), assigned AS (
           |  SELECT vec_id, c_id AS list_id FROM (
           |    SELECT *, row_number() OVER (PARTITION BY vec_id
           |      ORDER BY dist, c_id) AS rn FROM cscore) WHERE rn = 1
           |)
           |SELECT list_id, CAST(count(*) AS BIGINT) AS n_vecs,
           |  CAST((1000000 * count(*)) //
           |    (SELECT count(*) FROM q) AS BIGINT) AS ppm
           |FROM assigned GROUP BY list_id ORDER BY list_id""".stripMargin))

  /** PQ quality harness: exact recall@k of [[pqTopK]] against the
    * brute-force integer-L2 top-k over the same quantized vectors —
    * the metric PQ approximates, so the recall number isolates the
    * codebook quantization loss (not the int8 scalar loss). Both sides
    * are exact integer rankings with the same (distance, vec_id)
    * tiebreak, so the membership sets — and the intersection counts —
    * replay in SQL verbatim, exactly like [[annRecall]].
    *
    * Scale shape: the query block broadcasts against one corpus scan
    * on each side; only per-query top-k rows cross the rank windows;
    * the recall rollup is a k-row join. */
  def pqRecall(vecs: DataFrame, queries: DataFrame, k: Int,
      codebooks: DataFrame, m: Int, dim: Int): DataFrame = {
    val approx = pqTopK(vecs, queries, k, codebooks, m, dim)
      .select(col("q_id"), col("neighbor_id"))
    recallOf(exactIntTopK(vecs, queries, k), approx, queries, k)
  }

  /** IVF-PQ quality harness: recall@k of [[ivfPqTopK]] against
    * brute-force integer L2 — quantifies the combined inverted-list
    * pruning loss (raise `probes`) and residual-codebook loss (raise
    * K) in one number; a trivial composition of the oracle'd exact
    * ranking and the oracle'd IVFADC chain through [[recallOf]].
    * Pinned at the lossless limit: every list probed + stride-1
    * residual codebooks degenerate ADC to exact L2 → recall 1.0. */
  def ivfPqRecall(vecs: DataFrame, queries: DataFrame, k: Int,
      coarse: DataFrame, books: DataFrame, m: Int, dim: Int,
      probes: Int = 1): DataFrame = {
    val approx = ivfPqTopK(vecs, queries, k, coarse, books, m, dim, probes)
      .select(col("q_id"), col("neighbor_id"))
    recallOf(exactIntTopK(vecs, queries, k), approx, queries, k)
  }

  /** Refined-serve quality harness: recall@k of [[ivfPqTopKRefined]]
    * against brute-force integer L2 — the number that justifies the
    * refine stage's extra raw-vector scan (vs [[ivfPqRecall]] at the
    * same probes). The exact re-rank removes the PQ-reconstruction
    * loss entirely; what remains is ONLY the inverted-list pruning
    * loss on the candidate pool, so refined recall at pool ≥ corpus
    * is 1.0 by construction (SimilaritySpec pins the equality). */
  def ivfPqRefinedRecall(vecs: DataFrame, queries: DataFrame, k: Int,
      refine: Int, coarse: DataFrame, books: DataFrame, m: Int, dim: Int,
      probes: Int = 1): DataFrame = {
    val codes = ivfPqEncode(vecs, coarse, books, m, dim)
    val approx = ivfPqTopKRefined(codes, queries, vecs, k, refine,
      coarse, books, m, dim, probes)
      .select(col("q_id"), col("neighbor_id"))
    recallOf(exactIntTopK(vecs, queries, k), approx, queries, k)
  }

  /** Brute-force integer-L2 top-k membership — the ground truth both
    * PQ harnesses rank against (broadcast queries, one corpus scan). */
  private def exactIntTopK(vecs: DataFrame, queries: DataFrame,
      k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(vecs.sparkSession)
    val qv = vecs.select(col("vec_id"), quantize(col("embedding")).as("q"))
    val qq = broadcast(queries
      .select(col("vec_id").as("q_id"), quantize(col("embedding")).as("qq")))
    qv.join(qq, col("vec_id") =!= col("q_id"))
      .withColumn("d", call_udf("graft_l2_int", col("q"), col("qq")))
      .groupBy(col("q_id"))
      .agg(call_udf("graft_topk_min",
        struct(col("d"), col("vec_id")), lit(k)).as("top"))
      .select(col("q_id"), explode(col("top")).as("t"))
      .select(col("q_id"), col("t.vec_id").as("neighbor_id"))
  }

  /** recall@k rollup shared by the ANN harnesses ([[annRecall]],
    * [[pqRecall]], [[ivfPqRecall]]): exact-side hits found in the
    * approx top-k, counted per query, with zero-hit queries kept at
    * recall 0. */
  private def recallOf(exact: DataFrame, approx: DataFrame,
      queries: DataFrame, k: Int): DataFrame = {
    val hits = exact.join(approx, Seq("q_id", "neighbor_id"), "left_semi")
      .groupBy(col("q_id")).agg(count(lit(1)).as("n_hit"))
    queries.select(col("vec_id").as("q_id"))
      .join(hits, Seq("q_id"), "left")
      .select(col("q_id"), coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        lit(k.toLong).as("k"),
        (coalesce(col("n_hit"), lit(0L)) / k).as("recall"))
  }

  val qPqRecall = QuerySpec(
    "q_llm_pq_recall",
    (s, d) => {
      graft.functions.GraftFunctions.register(s)
      val vs = Tables.load(s, d, "embeddings")
      val cb = pqCodebooks(vs, m = 4, dim = 64, centroidStride = 50, iters = 0)
      pqRecall(vs, vs.filter(col("vec_id") < 5), k = 5, cb, m = 4, dim = 64)
        .orderBy(col("q_id"))
    },
    Some("""WITH q AS (
           |  SELECT vec_id,
           |    CASE WHEN list_max(list_transform(embedding, x -> abs(x))) = 0
           |      THEN list_transform(embedding, x -> 0)
           |      ELSE list_transform(embedding, x -> CAST(floor(
           |        CAST(x AS DOUBLE) /
           |        CAST(list_max(list_transform(embedding, y -> abs(y))) AS DOUBLE)
           |        * 127.0 + 0.5) AS INTEGER))
           |    END AS qfull
           |  FROM embeddings
           |), sub AS (
           |  SELECT vec_id, j.sub_id,
           |    qfull[j.sub_id * 16 + 1 : j.sub_id * 16 + 16] AS sq
           |  FROM q, LATERAL (SELECT unnest(range(0, 4)) AS sub_id) j
           |), cb AS (
           |  SELECT sub_id, vec_id AS c_id, sq AS c_q FROM sub
           |  WHERE vec_id % 50 = 0
           |), scored AS (
           |  SELECT s.vec_id, s.sub_id, c.c_id,
           |    list_reduce(list_prepend(CAST(0 AS BIGINT),
           |      list_transform(list_zip(s.sq, c.c_q),
           |        z -> CAST(z[1] - z[2] AS BIGINT) * (z[1] - z[2]))),
           |      (a, x) -> a + x) AS dist
           |  FROM sub s JOIN cb c USING (sub_id)
           |), codes AS (
           |  SELECT vec_id, sub_id, c_id AS code FROM (
           |    SELECT *, row_number() OVER (PARTITION BY vec_id, sub_id
           |      ORDER BY dist, c_id) AS rn FROM scored) WHERE rn = 1
           |), qt AS (
           |  SELECT vec_id AS q_id, sub_id, c_id AS code, dist AS d
           |  FROM scored WHERE vec_id < 5
           |), approx AS (
           |  SELECT q_id, vec_id AS neighbor_id FROM (
           |    SELECT qt.q_id, codes.vec_id, CAST(sum(qt.d) AS BIGINT) AS adist
           |    FROM codes JOIN qt
           |      ON codes.sub_id = qt.sub_id AND codes.code = qt.code
           |    WHERE codes.vec_id != qt.q_id
           |    GROUP BY qt.q_id, codes.vec_id)
           |  QUALIFY row_number() OVER (PARTITION BY q_id
           |    ORDER BY adist, neighbor_id) <= 5
           |), exact AS (
           |  SELECT q_id, neighbor_id FROM (
           |    SELECT qs.vec_id AS q_id, c.vec_id AS neighbor_id,
           |      list_reduce(list_prepend(CAST(0 AS BIGINT),
           |        list_transform(list_zip(c.qfull, qs.qfull),
           |          z -> CAST(z[1] - z[2] AS BIGINT) * (z[1] - z[2]))),
           |        (a, x) -> a + x) AS d
           |    FROM q c, (SELECT * FROM q WHERE vec_id < 5) qs
           |    WHERE c.vec_id != qs.vec_id)
           |  QUALIFY row_number() OVER (PARTITION BY q_id
           |    ORDER BY d, neighbor_id) <= 5
           |), hits AS (
           |  SELECT e.q_id, count(*) AS n_hit
           |  FROM exact e JOIN approx a
           |    ON e.q_id = a.q_id AND e.neighbor_id = a.neighbor_id
           |  GROUP BY e.q_id
           |)
           |SELECT q.vec_id AS q_id,
           |  CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
           |  CAST(5 AS BIGINT) AS k,
           |  coalesce(h.n_hit, 0) / 5 AS recall
           |FROM (SELECT vec_id FROM embeddings WHERE vec_id < 5) q
           |LEFT JOIN hits h ON q.vec_id = h.q_id
           |ORDER BY q_id""".stripMargin))

  // ---- scalar-quantization recall + signed random projection ------------

  /** The int8-quantization replay CTE (`q` = (vec_id, qfull)) shared by
    * the SQ/RP oracles — the same IEEE sequence as [[quantize]] and the
    * PQ family's oracles. */
  private val duckQuantCte: String =
    """SELECT vec_id,
      |    CASE WHEN list_max(list_transform(embedding, x -> abs(x))) = 0
      |      THEN list_transform(embedding, x -> 0)
      |      ELSE list_transform(embedding, x -> CAST(floor(
      |        CAST(x AS DOUBLE) /
      |        CAST(list_max(list_transform(embedding, y -> abs(y))) AS DOUBLE)
      |        * 127.0 + 0.5) AS INTEGER))
      |    END AS qfull
      |  FROM embeddings""".stripMargin

  /** Scalar-quantization quality harness: recall@k of the int8
    * integer-L2 ranking against the BIT-EXACT float cosine ranking
    * over the same vectors — isolates the loss the scalar quantizer
    * itself introduces, the layer every integer-domain path in this
    * engine (IVF / PQ / IVF-PQ / k-means) sits on. [[pqRecall]]
    * measures codebook loss GIVEN quantized vectors; this measures
    * the step before it, so the two compose into a loss budget.
    *
    * Scale shape: both sides broadcast the query set and scan the
    * corpus once with bounded top-k aggregates; the intersection is a
    * semi join over 2·|queries|·k rows. */
  def sqRecall(vecs: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val exact = cosineTopK(vecs, queries, k)
      .select(col("q_id"), col("neighbor_id"))
    recallOf(exact, exactIntTopK(vecs, queries, k), queries, k)
  }

  /** Oracle'd exactly: the float-cosine side is q_llm_cosine_topk's
    * IEEE sequence, the integer side is the PQ harnesses' exact-L2
    * CTE, so both membership sets — and the intersection counts —
    * replay in SQL verbatim. */
  val qSqRecall = QuerySpec(
    "q_llm_sq_recall",
    (s, d) => {
      val vs = vectors(s, d)
      sqRecall(vs, vs.filter(col("vec_id") < 5), k = 5)
        .orderBy(col("q_id"))
    },
    Some(s"""WITH v AS (
            |  $duckNormCte
            |), qs AS (SELECT * FROM v WHERE vec_id < 5),
            |exact AS (
            |  SELECT q_id, neighbor_id FROM (
            |    SELECT qs.vec_id AS q_id, c.vec_id AS neighbor_id,
            |      ${duckDot("c.embedding", "qs.embedding")} / (c.nrm * qs.nrm) AS cos
            |    FROM v c, qs WHERE c.vec_id != qs.vec_id)
            |  QUALIFY row_number() OVER (PARTITION BY q_id
            |    ORDER BY cos DESC, neighbor_id) <= 5
            |), q AS (
            |  $duckQuantCte
            |), approx AS (
            |  SELECT q_id, neighbor_id FROM (
            |    SELECT qq.vec_id AS q_id, c.vec_id AS neighbor_id,
            |      list_reduce(list_prepend(CAST(0 AS BIGINT),
            |        list_transform(list_zip(c.qfull, qq.qfull),
            |          z -> CAST(z[1] - z[2] AS BIGINT) * (z[1] - z[2]))),
            |        (a, x) -> a + x) AS d
            |    FROM q c, (SELECT * FROM q WHERE vec_id < 5) qq
            |    WHERE c.vec_id != qq.vec_id)
            |  QUALIFY row_number() OVER (PARTITION BY q_id
            |    ORDER BY d, neighbor_id) <= 5
            |), hits AS (
            |  SELECT e.q_id, count(*) AS n_hit
            |  FROM exact e JOIN approx a
            |    ON e.q_id = a.q_id AND e.neighbor_id = a.neighbor_id
            |  GROUP BY e.q_id
            |)
            |SELECT q2.vec_id AS q_id,
            |  CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
            |  CAST(5 AS BIGINT) AS k,
            |  coalesce(h.n_hit, 0) / 5 AS recall
            |FROM (SELECT vec_id FROM embeddings WHERE vec_id < 5) q2
            |LEFT JOIN hits h ON q2.vec_id = h.q_id
            |ORDER BY q_id""".stripMargin))

  /** Deterministic ±1 sign matrix for the signed random projection —
    * the signs of the [[hyperplanes]] doubles, so the projection
    * shares the LSH family's audited pseudo-random source. */
  def signMatrix(rDim: Int, dim: Int, seed: Long = 42L): Seq[Seq[Int]] =
    hyperplanes(rDim, dim, seed).map(_.map(x => if (x >= 0) 1 else -1))

  /** Johnson–Lindenstrauss-style dimensionality reduction in the
    * INTEGER domain: project each int8-quantized vector onto `rDim`
    * ±1 hyperplanes — rp_j = Σ_i sign(j,i)·q_i in exact 64-bit sums,
    * so the reduced vectors are engine- and partitioning-exact (the
    * float JL transform is neither). A 64→16 reduction cuts
    * brute-force scan cost 4× at a measurable recall cost
    * ([[rpRecall]] quantifies it) — the cheap pre-filter tier under
    * the IVF/PQ serving stack.
    *
    * Scale shape: zero shuffle — the sign matrix rides the plan as a
    * literal and every row projects independently inside its scan
    * task. */
  def rpReduce(vecs: DataFrame, rDim: Int, dim: Int,
      seed: Long = 42L): DataFrame = {
    graft.functions.GraftFunctions.register(vecs.sparkSession)
    val signs = typedLit(signMatrix(rDim, dim, seed))
    vecs.select(col("vec_id"), quantize(col("embedding")).as("q"))
      .select(col("vec_id"),
        transform(signs, row =>
          aggregate(zip_with(row, col("q"), (s0, x) => (s0 * x).cast("long")),
            lit(0L), (acc, x) => acc + x)).as("rp"))
  }

  /** The rp CTE (`vec_id, rp`) over the quantize CTE, sign literals
    * included — shared by the RP oracles. */
  private def duckRpCte(rDim: Int, dim: Int): String = {
    val signsSql = signMatrix(rDim, dim)
      .map(_.mkString("[", ",", "]")).mkString("[", ",", "]")
    s"""q AS (
       |  $duckQuantCte
       |), sg AS (SELECT $signsSql::BIGINT[][] AS signs),
       |rp AS (
       |  SELECT vec_id, list_transform(range(1, ${rDim + 1}), j ->
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(list_zip(signs[j], qfull),
       |        z -> CAST(z[1] * z[2] AS BIGINT))),
       |      (a, x) -> a + x)) AS rp
       |  FROM q, sg
       |)""".stripMargin
  }

  /** Oracle'd exactly (component-exploded so the compare is scalar):
    * quantization, sign literals, and the integer sums all replay. */
  val qRpReduce = QuerySpec(
    "q_llm_rp_reduce",
    (s, d) =>
      rpReduce(Tables.load(s, d, "embeddings"), rDim = 16, dim = 64)
        .select(col("vec_id"), posexplode(col("rp")).as(Seq("j", "rp")))
        .select(col("vec_id"), col("j").cast("long").as("j"), col("rp"))
        .orderBy(col("vec_id"), col("j")),
    Some(s"""WITH ${duckRpCte(16, 64)}
            |SELECT vec_id, CAST(jj.j - 1 AS BIGINT) AS j, rp[jj.j] AS rp
            |FROM rp, LATERAL (SELECT unnest(range(1, 17)) AS j) jj
            |ORDER BY vec_id, j""".stripMargin))

  /** RP quality harness: recall@k of brute-force integer L2 in the
    * REDUCED space against exact integer L2 in the full space — the
    * number that sets how wide a reduced-space candidate pass must be
    * before exact re-ranking. Both sides exact integers, so the
    * harness replays cross-engine like its SQ/PQ siblings.
    *
    * Scale shape: the reduced scan moves rDim/dim of the bytes; both
    * sides broadcast queries and reduce with bounded top-k
    * aggregates. */
  def rpRecall(vecs: DataFrame, queries: DataFrame, k: Int, rDim: Int,
      dim: Int): DataFrame = {
    graft.functions.GraftFunctions.register(vecs.sparkSession)
    val r = rpReduce(vecs, rDim, dim)
    val rq = broadcast(rpReduce(queries, rDim, dim)
      .select(col("vec_id").as("q_id"), col("rp").as("qrp")))
    val approx = r.join(rq, col("vec_id") =!= col("q_id"))
      .withColumn("d", aggregate(
        zip_with(col("rp"), col("qrp"), (a, b) => (a - b) * (a - b)),
        lit(0L), (acc, x) => acc + x))
      .groupBy(col("q_id"))
      .agg(call_udf("graft_topk_min",
        struct(col("d"), col("vec_id")), lit(k)).as("top"))
      .select(col("q_id"), explode(col("top")).as("t"))
      .select(col("q_id"), col("t.vec_id").as("neighbor_id"))
    recallOf(exactIntTopK(vecs, queries, k), approx, queries, k)
  }

  val qRpRecall = QuerySpec(
    "q_llm_rp_recall",
    (s, d) => {
      val vs = Tables.load(s, d, "embeddings")
      rpRecall(vs, vs.filter(col("vec_id") < 5), k = 5, rDim = 16, dim = 64)
        .orderBy(col("q_id"))
    },
    Some(s"""WITH ${duckRpCte(16, 64)},
            |exact AS (
            |  SELECT q_id, neighbor_id FROM (
            |    SELECT qq.vec_id AS q_id, c.vec_id AS neighbor_id,
            |      list_reduce(list_prepend(CAST(0 AS BIGINT),
            |        list_transform(list_zip(c.qfull, qq.qfull),
            |          z -> CAST(z[1] - z[2] AS BIGINT) * (z[1] - z[2]))),
            |        (a, x) -> a + x) AS d
            |    FROM q c, (SELECT * FROM q WHERE vec_id < 5) qq
            |    WHERE c.vec_id != qq.vec_id)
            |  QUALIFY row_number() OVER (PARTITION BY q_id
            |    ORDER BY d, neighbor_id) <= 5
            |), approx AS (
            |  SELECT q_id, neighbor_id FROM (
            |    SELECT qq.vec_id AS q_id, c.vec_id AS neighbor_id,
            |      list_reduce(list_prepend(CAST(0 AS BIGINT),
            |        list_transform(list_zip(c.rp, qq.rp),
            |          z -> CAST(z[1] - z[2] AS BIGINT) * (z[1] - z[2]))),
            |        (a, x) -> a + x) AS d
            |    FROM rp c, (SELECT * FROM rp WHERE vec_id < 5) qq
            |    WHERE c.vec_id != qq.vec_id)
            |  QUALIFY row_number() OVER (PARTITION BY q_id
            |    ORDER BY d, neighbor_id) <= 5
            |), hits AS (
            |  SELECT e.q_id, count(*) AS n_hit
            |  FROM exact e JOIN approx a
            |    ON e.q_id = a.q_id AND e.neighbor_id = a.neighbor_id
            |  GROUP BY e.q_id
            |)
            |SELECT q2.vec_id AS q_id,
            |  CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
            |  CAST(5 AS BIGINT) AS k,
            |  coalesce(h.n_hit, 0) / 5 AS recall
            |FROM (SELECT vec_id FROM embeddings WHERE vec_id < 5) q2
            |LEFT JOIN hits h ON q2.vec_id = h.q_id
            |ORDER BY q_id""".stripMargin))

  /** SemDeDup (Abbas et al.): semantic deduplication over the
    * embedding space — sign-LSH candidate pairs above a cosine
    * threshold become edges, connected components group semantic
    * duplicates, and one canonical member (min vec_id) survives per
    * component. The same keep-list shape as the text-LSH dedup, with
    * cosine-over-embeddings as the similarity instead of Jaccard-over-
    * shingles; 8 signature bits widen the candidate buckets so chains
    * of moderately-similar vectors cluster transitively.
    *
    * Scale shape: inherits [[embNearDupPairs]]'s capped-bucket
    * groupBy (no cross join, only hashed candidates shuffle) and the
    * text path's logarithmic-round connected components; the final
    * keep-list is one anti join on vec_id. */
  def semDedupKeepList(vecs: DataFrame, bits: Int = 8,
      tau: Double = 0.3, maxBucket: Int = 1000): DataFrame = {
    val pairs = embNearDupPairs(vecs, bits = bits, maxBucket = maxBucket)
      .filter(col("cos") >= tau)
      .select(col("ida"), col("idb"))
    val drop = TextDedup.connectedComponents(pairs)
      .filter(col("id") =!= col("cluster_id"))
      .select(col("id").as("vec_id"))
    vecs.join(drop, Seq("vec_id"), "left_anti")
  }

  /** Oracle'd bit-exactly end-to-end: signatures, bucket caps, cosine
    * threshold, and the transitive closure are all replayed in SQL
    * (the closure as a recursive CTE with min-reachable-id labeling,
    * as the text dedup clusters oracle does). */
  /** The SemDeDup DuckDB replay CTE chain over a `(vec_id, embedding,
    * nrm)` source CTE named `src`: sign-LSH signatures (the same
    * hyperplane literals the kernel uses), capped buckets, cosine
    * threshold, recursive closure. CTE names get prefix `p` (so a
    * composition can avoid collisions); `materialized` pins the
    * multiply-referenced frames against DuckDB's exponential CTE
    * inlining (the q_llm_curate_emb lesson: the self-join doubles the
    * whole upstream chain per level). SHARED by [[qSemDedup]] and the
    * composition oracle (Pipeline.qCurateEmb) so thresholds and plane
    * literals live in exactly one place. Emits `${p}dropset(a)` as the
    * final drop-set CTE. The hyperparameters (bits/tau/maxBucket)
    * mirror [[semDedupKeepList]]'s — interpolated, not hardcoded, so a
    * QuerySpec exercising non-default params stays oracle-equal. */
  private[llm] def semDedupReplayCtes(src: String, p: String = "",
      materialized: Boolean = false, bits: Int = 8, tau: Double = 0.3,
      maxBucket: Int = 1000): String = {
    val m = if (materialized) " MATERIALIZED" else ""
    val planesSql = hyperplanes(bits, 64, 42L)
      .map(_.mkString("[", ",", "]")).mkString("[", ",", "]")
    s"""pl AS (SELECT $planesSql::DOUBLE[][] AS planes),
       |${p}sigs AS$m (
       |  SELECT vec_id, embedding, nrm,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(range($bits), b ->
       |        CASE WHEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |            list_transform(list_zip(embedding, planes[b+1]),
       |              z -> CAST(z[1] AS DOUBLE) * z[2])),
       |            (acc, p) -> acc + p) >= 0
       |        THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END)),
       |      (a, x) -> a + x) AS sig
       |  FROM $src, pl
       |), ${p}sized AS$m (
       |  SELECT *, count(*) OVER (PARTITION BY sig) AS n FROM ${p}sigs
       |), ${p}pairs AS (
       |  SELECT a.vec_id AS ida, b.vec_id AS idb
       |  FROM ${p}sized a JOIN ${p}sized b
       |    ON a.sig = b.sig AND a.vec_id < b.vec_id
       |  WHERE a.n > 1 AND a.n <= $maxBucket
       |    AND ${duckDot("a.embedding", "b.embedding")} / (a.nrm * b.nrm)
       |        >= $tau
       |), ${p}edges AS (
       |  SELECT ida AS a, idb AS b FROM ${p}pairs
       |  UNION SELECT idb, ida FROM ${p}pairs
       |), ${p}reach(a, b) AS (
       |  SELECT a, a FROM (SELECT DISTINCT a FROM ${p}edges) t0
       |  UNION
       |  SELECT r.a, e.b FROM ${p}reach r JOIN ${p}edges e ON r.b = e.a
       |), ${p}dropset AS (
       |  SELECT a FROM ${p}reach GROUP BY a HAVING a <> min(b)
       |)""".stripMargin
  }

  /** The diversify DuckDB replay CTE chain over a `(vec_id, embedding,
    * nrm)` source CTE named `src`: stride centroids, the qEmbOutlier
    * assignment replay, per-cluster rank/count. Shared by
    * [[qDiversify]] and the composition oracle. Emits `${p}ranked`;
    * pair with [[diversifyKeepSql]] as the WHERE predicate. */
  private[llm] def diversifyReplayCtes(src: String, p: String = "",
      materialized: Boolean = false, centroidStride: Int = 100): String = {
    val m = if (materialized) " MATERIALIZED" else ""
    s"""${p}c AS (
       |  SELECT vec_id AS c_id, embedding AS c_emb, nrm AS c_nrm
       |  FROM $src WHERE vec_id % $centroidStride = 0
       |), ${p}scored AS$m (
       |  SELECT s0.vec_id, ${p}c.c_id,
       |    ${duckDot("s0.embedding", s"${p}c.c_emb")} / (s0.nrm * ${p}c.c_nrm) AS c_cos
       |  FROM $src s0, ${p}c
       |), ${p}assigned AS (
       |  SELECT vec_id, c_id, c_cos AS cos FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |      ORDER BY c_cos DESC, c_id) AS crn
       |    FROM ${p}scored) WHERE crn = 1
       |), ${p}ranked AS (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY c_id
       |      ORDER BY cos DESC, vec_id) AS BIGINT) AS rn,
       |    CAST(count(*) OVER (PARTITION BY c_id) AS BIGINT) AS n_cluster
       |  FROM ${p}assigned
       |)""".stripMargin
  }

  /** The diversify keep predicate (drop the floor(ppm) most
    * prototypical per cluster) — the SQL twin of
    * [[diversifyKeepList]]'s dropPpm filter, parameterized so
    * non-default QuerySpecs can't silently diverge. */
  private[llm] def diversifyKeepSql(dropPpm: Long = 250000L): String =
    s"rn > (n_cluster * $dropPpm) // 1000000"

  val qSemDedup = QuerySpec(
    "q_llm_semdedup",
    (s, d) =>
      semDedupKeepList(vectors(s, d))
        .select(col("vec_id"))
        .orderBy(col("vec_id")),
    Some(s"""WITH RECURSIVE v AS (
            |  $duckNormCte
            |), ${semDedupReplayCtes("v")}
            |SELECT vec_id FROM embeddings
            |WHERE vec_id NOT IN (SELECT a FROM dropset)
            |ORDER BY vec_id""".stripMargin))

  /** ANN quality harness: recall@k of the IVF index against the exact
    * brute-force top-k, per query — the number every index deployment
    * is tuned by (probes/centroid count vs recall). Composes the two
    * implemented pipelines; because both are bit-exact, recall is an
    * exact set-intersection count, not an approximate estimate.
    *
    * Scale shape: both sides broadcast the query set and scan the
    * corpus once; the intersection is a semi join on (q_id,
    * neighbor_id) over 2·|queries|·k rows — negligible next to the
    * scans — and the per-query hit count aggregates map-side. */
  def annRecall(vecs: DataFrame, queries: DataFrame, k: Int,
      centroidStride: Int, probes: Int = 1): DataFrame = {
    val exact = cosineTopK(vecs, queries, k)
      .select(col("q_id"), col("neighbor_id"))
    val approx = ivfTopK(vecs, queries, k, centroidStride, probes)
      .select(col("q_id"), col("neighbor_id"))
    recallOf(exact, approx, queries, k)
  }

  /** Oracle'd exactly: both sides' cosines are the same IEEE sequences
    * as their standalone oracles, so the top-k membership sets — and
    * hence the intersection counts — replay in SQL verbatim. */
  val qAnnRecall = QuerySpec(
    "q_llm_ann_recall",
    (s, d) => {
      val vs = vectors(s, d)
      annRecall(vs, vs.filter(col("vec_id") < 5), k = 5, centroidStride = 100)
        .orderBy(col("q_id"))
    },
    Some(s"""WITH v AS (
            |  $duckNormCte
            |), qs AS (SELECT * FROM v WHERE vec_id < 5),
            |exact AS (
            |  SELECT q_id, neighbor_id FROM (
            |    SELECT qs.vec_id AS q_id, c.vec_id AS neighbor_id,
            |      ${duckDot("c.embedding", "qs.embedding")} / (c.nrm * qs.nrm) AS cos
            |    FROM v c, qs WHERE c.vec_id != qs.vec_id)
            |  QUALIFY row_number() OVER (PARTITION BY q_id
            |    ORDER BY cos DESC, neighbor_id) <= 5
            |), c AS (
            |  SELECT vec_id AS c_id, embedding AS c_emb, nrm AS c_nrm
            |  FROM v WHERE vec_id % 100 = 0
            |), assigned AS (
            |  SELECT vec_id, embedding, nrm, c_id FROM (
            |    SELECT v.vec_id, v.embedding, v.nrm, c.c_id,
            |      row_number() OVER (PARTITION BY v.vec_id ORDER BY
            |        ${duckDot("v.embedding", "c.c_emb")} / (v.nrm * c.c_nrm)
            |          DESC, c.c_id) AS crn
            |    FROM v, c) WHERE crn = 1
            |), q2 AS (
            |  SELECT vec_id AS q_id, embedding AS q_emb, nrm AS q_nrm, c_id
            |  FROM assigned WHERE vec_id < 5
            |), approx AS (
            |  SELECT q_id, neighbor_id FROM (
            |    SELECT q2.q_id, a.vec_id AS neighbor_id,
            |      ${duckDot("a.embedding", "q2.q_emb")} / (a.nrm * q2.q_nrm) AS cos
            |    FROM assigned a JOIN q2 ON a.c_id = q2.c_id AND a.vec_id != q2.q_id)
            |  QUALIFY row_number() OVER (PARTITION BY q_id
            |    ORDER BY cos DESC, neighbor_id) <= 5
            |), hits AS (
            |  SELECT e.q_id, count(*) AS n_hit
            |  FROM exact e JOIN approx a
            |    ON e.q_id = a.q_id AND e.neighbor_id = a.neighbor_id
            |  GROUP BY e.q_id
            |)
            |SELECT q.vec_id AS q_id,
            |  CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
            |  CAST(5 AS BIGINT) AS k,
            |  coalesce(h.n_hit, 0) / 5 AS recall
            |FROM (SELECT vec_id FROM embeddings WHERE vec_id < 5) q
            |LEFT JOIN hits h ON q.vec_id = h.q_id
            |ORDER BY q_id""".stripMargin))

  // ---- D4-style prototype pruning (diversification) ----------------------

  /** D4-style diversification keep-list (Tirumala et al. 2023: after
    * dedup, PRUNE the most prototypical documents — the ones closest
    * to their cluster centroid — so the kept corpus over-samples the
    * diverse tail instead of the dense cluster cores). Assigns each
    * vector to its nearest stride-seeded centroid (the exact
    * [[centroidOutliers]] argmax chain), ranks each cluster by cosine
    * DESC (rank 1 = most prototypical), and drops the top
    * `dropPpm`/1e6 fraction per cluster (floor, exact integer math).
    *
    * Scale shape: centroids broadcast, assignment reduces map-side via
    * max_by (never an n×k window); only the narrow (vec_id, c_id, cos)
    * frame crosses the one per-cluster window shuffle, and cluster
    * sizes are ~n/k with k growing with the corpus (the IVF stance) —
    * a skewed quantizer shows up in q_llm_ivf_stats before it shows
    * up here. */
  def diversifyKeepList(vecs: DataFrame, centroidStride: Int,
      dropPpm: Long = 250000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(vecs.sparkSession)
    val centroids = broadcast(
      vecs.filter(pmod(col("vec_id"), lit(centroidStride)) === 0)
        .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"),
          col("nrm").as("c_nrm")))
    val assigned = vecs.join(centroids)
      .withColumn("c_cos",
        cosine(col("embedding"), col("c_emb"), col("nrm"), col("c_nrm")))
      .groupBy(col("vec_id"))
      .agg(
        max_by(col("c_id"), struct(col("c_cos"), (-col("c_id")).as("neg"))).as("c_id"),
        max(col("c_cos")).as("cos"))
    val byCluster = Window.partitionBy(col("c_id"))
    assigned
      .withColumn("rn", row_number()
        .over(byCluster.orderBy(col("cos").desc, col("vec_id"))).cast("long"))
      .withColumn("n_cluster", count(lit(1)).over(byCluster))
      .filter(col("rn") > expr(s"(n_cluster * ${dropPpm}L) div 1000000"))
  }

  /** Oracle'd bit-exactly: the assignment replay is [[qEmbOutlier]]'s
    * row_number form, the per-cluster rank/count windows replay
    * verbatim, and the drop threshold is exact integer floor division
    * in both engines. */
  val qDiversify = QuerySpec(
    "q_llm_diversify",
    (s, d) =>
      diversifyKeepList(vectors(s, d), centroidStride = 100, dropPpm = 250000L)
        .orderBy(col("vec_id")),
    Some(s"""WITH v AS (
            |  $duckNormCte
            |), ${diversifyReplayCtes("v")}
            |SELECT vec_id, c_id, cos, rn, n_cluster FROM ranked
            |WHERE ${diversifyKeepSql()}
            |ORDER BY vec_id""".stripMargin))

  // ---- embedding-space decontamination ------------------------------------

  /** Embedding-space benchmark contamination scan: per corpus vector,
    * the nearest benchmark-set vector by cosine and a contaminated
    * flag at `tau` — the decontamination pass that catches PARAPHRASED
    * eval material the n-gram check ([[TextDedup.qContamination]])
    * admits. The synthetic corpus has no real benchmark near-dups, so
    * the query PLANTS one exact copy of each benchmark vector in-plan
    * (id-offset by 1e9 — the q_llm_pii_report seeding stance), making
    * the flag path do real work on every run.
    *
    * Scale shape: the benchmark set is tiny and broadcast; the corpus
    * is scanned once and the per-vector best match reduces map-side
    * via max_by — no window over n×|bench|, no corpus shuffle at all
    * beyond the final per-vec_id aggregation. */
  def embContamination(vecs: DataFrame, benchStride: Int = 97,
      tau: Double = 0.95, plantOffset: Long = 1000000000L): DataFrame = {
    graft.functions.GraftFunctions.register(vecs.sparkSession)
    val bench = broadcast(
      vecs.filter(pmod(col("vec_id"), lit(benchStride)) === 0)
        .select(col("vec_id").as("bench_id"), col("embedding").as("b_emb"),
          col("nrm").as("b_nrm")))
    val planted = vecs.filter(pmod(col("vec_id"), lit(benchStride)) === 0)
      .select((col("vec_id") + lit(plantOffset)).as("vec_id"),
        col("embedding"), col("nrm"))
    vecs.unionByName(planted)
      .join(bench, col("vec_id") =!= col("bench_id"))
      .withColumn("cos",
        cosine(col("embedding"), col("b_emb"), col("nrm"), col("b_nrm")))
      .groupBy(col("vec_id"))
      .agg(
        max_by(col("bench_id"),
          struct(col("cos"), (-col("bench_id")).as("neg"))).as("bench_id"),
        max(col("cos")).as("cos"))
      .withColumn("contaminated", (col("cos") >= lit(tau)).cast("int"))
  }

  /** Oracle'd bit-exactly: cosines are the [[qCosineTopK]] IEEE
    * sequence (a planted copy's self-cosine is the same
    * sqrt-then-square rounding in both engines), the best-match
    * replay is the row_number form, and the flag is one exact double
    * comparison. */
  val qEmbContam = QuerySpec(
    "q_llm_emb_contam",
    (s, d) =>
      embContamination(vectors(s, d))
        .orderBy(col("vec_id")),
    Some(s"""WITH v AS (
            |  $duckNormCte
            |), b AS (
            |  SELECT vec_id AS bench_id, embedding AS b_emb, nrm AS b_nrm
            |  FROM v WHERE vec_id % 97 = 0
            |), corpus AS (
            |  SELECT vec_id, embedding, nrm FROM v
            |  UNION ALL
            |  SELECT bench_id + 1000000000, b_emb, b_nrm FROM b
            |), scored AS (
            |  SELECT c.vec_id, b.bench_id,
            |    ${duckDot("c.embedding", "b.b_emb")} / (c.nrm * b.b_nrm) AS cos
            |  FROM corpus c JOIN b ON c.vec_id != b.bench_id
            |)
            |SELECT vec_id, bench_id, cos,
            |  CAST(CASE WHEN cos >= 0.95 THEN 1 ELSE 0 END AS INT) AS contaminated
            |FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
            |    ORDER BY cos DESC, bench_id) AS rn FROM scored)
            |WHERE rn = 1
            |ORDER BY vec_id""".stripMargin))

  // ------------------------------------------------------------------
  // FIXED-quantizer twins (round 14): the stride-seed oracle configs
  // couple the centroid/codebook COUNT to corpus size (coarse = n/100,
  // books = n/50 entries per subspace), so their DuckDB replays are
  // n·K ~ n² and the whole ANN family sits `_excluded` at the sf10
  // tier. The retrieval family solved exactly this with
  // q_llm_bm25_fixed (bounded config against a growing corpus); these
  // twins apply the same stance to the vector half: the TRAINING SET
  // is capped at `vec_id < 2000` — the base sf0.1 id range, replica-0
  // identity under the deterministic tier expanders — so the
  // quantizer is a FIXED artifact at every expanded tier (20 coarse
  // centroids, 40 codebook entries per subspace from sf0.1 up) while
  // encode and serving still cover the FULL corpus. The replay cost
  // becomes n·K with K constant — linear, 100×-replayable. Oracles
  // derive from the stride SQLs by ONE train-cap surgery so the fixed
  // and stride forms can never drift.
  // ------------------------------------------------------------------

  /** Train-cap string surgery: append `AND vec_id < 2000` to the
    * coarse-seed and codebook-seed stride predicates of a replay SQL.
    * Requires each present anchor to be unique in the input. */
  private def trainCapSurgery(sql: String): String = {
    val anchors = Seq("WHERE vec_id % 100 = 0", "WHERE vec_id % 50 = 0")
    val present = anchors.filter(sql.contains)
    require(present.nonEmpty, "no stride anchor found for the " +
      "fixed-quantizer surgery — oracle shape changed")
    present.foldLeft(sql) { (acc, a) =>
      require(acc.indexOf(a) == acc.lastIndexOf(a),
        s"ambiguous stride anchor '$a' under the fixed-quantizer surgery")
      acc.replace(a, a + " AND vec_id < 2000")
    }
  }

  private[llm] lazy val ivfPqP2FixedSql: Option[String] =
    qIvfPqAnnP2.oracle.map(trainCapSurgery)

  /** The FIXED quantizer: the stride seeds drawn from the capped
    * base-tier id range only — constant-size coarse/books artifacts
    * regardless of corpus size. */
  private[llm] def ivfPqTrainFixedOf(vs: DataFrame)
      : (DataFrame, DataFrame) =
    ivfPqTrain(vs.filter(col("vec_id") < 2000), coarseStride = 100,
      m = 4, dim = 64, bookStride = 50, iters = 0)

  /** Stored code table under the FIXED quantizer — the
    * [[storedCodesOf]] layout (attribute-embedded rows for filtered
    * serving) keyed to its own artifact root so the two configs'
    * caches never collide. */
  private[graft] def storedCodesFixedOf(s: SparkSession, d: String)
      : (DataFrame, DataFrame, DataFrame) = {
    graft.functions.GraftFunctions.register(s)
    val vs = Tables.load(s, d, "embeddings")
    lazy val trained = ivfPqTrainFixedOf(vs)
    val root = "seg_ivfpq_fixed_cap2k_c100_m4_b50"
    val coarse = graft.sources.IndexStore.parquet(s, d,
      s"$root/coarse", table = "embeddings")(trained._1)
    val books = graft.sources.IndexStore.parquet(s, d,
      s"$root/books", table = "embeddings")(trained._2)
    val stored = graft.sources.IndexStore.parquet(s, d,
      s"$root/codes", table = "embeddings")(
      ivfPqEncode(vs, coarse, books, m = 4, dim = 64,
        attrs = Seq("label")))
    (stored, coarse, books)
  }

  /** Inline IVFADC end-to-end under the fixed quantizer — the
    * q_llm_ivfpq_ann_p2 chain with a 100×-replayable oracle. */
  val qIvfPqAnnFixed = QuerySpec(
    "q_llm_ivfpq_ann_fixed",
    (s, d) => {
      graft.functions.GraftFunctions.register(s)
      val vs = Tables.load(s, d, "embeddings")
      val (coarse, books) = ivfPqTrainFixedOf(vs)
      ivfPqTopK(vs, vs.filter(col("vec_id") < 5), k = 5, coarse, books,
        m = 4, dim = 64, probes = 2)
        .orderBy(col("q_id"), col("rank"))
    },
    ivfPqP2FixedSql)

  /** Stored-code serving under the fixed quantizer — the
    * q_llm_ivfpq_serve split, hash-matched at the 100× tier. */
  val qIvfPqServeFixed = QuerySpec(
    "q_llm_ivfpq_serve_fixed",
    (s, d) => {
      val (stored, coarse, books) = storedCodesFixedOf(s, d)
      val vs = Tables.load(s, d, "embeddings")
      ivfPqTopKFromCodes(stored, vs.filter(col("vec_id") < 5), k = 5,
        coarse, books, m = 4, dim = 64, probes = 2)
        .orderBy(col("q_id"), col("rank"))
    },
    ivfPqP2FixedSql)

  /** Metadata-filtered serving under the fixed quantizer (the
    * q_llm_ann_filtered pushed-predicate scan, fixed-config replay). */
  val qAnnFilteredFixed = QuerySpec(
    "q_llm_ann_filtered_fixed",
    (s, d) => {
      val (stored, coarse, books) = storedCodesFixedOf(s, d)
      val vs = Tables.load(s, d, "embeddings")
      ivfPqTopKFromCodes(stored.filter(col("label") === 1),
        vs.filter(col("vec_id") < 5), k = 5, coarse, books,
        m = 4, dim = 64, probes = 2)
        .orderBy(col("q_id"), col("rank"))
    },
    ivfPqP2FixedSql.map(filteredCandSurgery))

  /** Exact refine over fixed-quantizer candidates (the
    * q_llm_ann_refine two-stage serve, fixed-config replay). */
  val qAnnRefineFixed = QuerySpec(
    "q_llm_ann_refine_fixed",
    (s, d) => {
      val (stored, coarse, books) = storedCodesFixedOf(s, d)
      val vs = Tables.load(s, d, "embeddings")
      ivfPqTopKRefined(stored, vs.filter(col("vec_id") < 5), vs, k = 5,
        refine = 3, coarse, books, m = 4, dim = 64, probes = 2)
        .orderBy(col("q_id"), col("rank"))
    },
    ivfPqP2FixedSql.map(refineTailSurgery))

  /** Flat-PQ ANN under a fixed codebook set (the q_llm_pq_ann chain
    * with the codebook count decoupled from corpus size). */
  val qPqAnnFixed = QuerySpec(
    "q_llm_pq_ann_fixed",
    (s, d) => {
      graft.functions.GraftFunctions.register(s)
      val vs = Tables.load(s, d, "embeddings")
      val cb = pqCodebooks(vs.filter(col("vec_id") < 2000), m = 4,
        dim = 64, centroidStride = 50, iters = 0)
      pqTopK(vs, vs.filter(col("vec_id") < 5), k = 5, cb, m = 4, dim = 64)
        .orderBy(col("q_id"), col("rank"))
    },
    qPqAnn.oracle.map(trainCapSurgery))

  /** The stored-code-table dump under the fixed quantizer — the
    * q_llm_ivfpq_codes deliverable at a 100×-replayable config. */
  val qIvfPqCodesFixed = QuerySpec(
    "q_llm_ivfpq_codes_fixed",
    (s, d) => {
      graft.functions.GraftFunctions.register(s)
      val vs = Tables.load(s, d, "embeddings")
      val (coarse, books) = ivfPqTrainFixedOf(vs)
      ivfPqEncode(vs, coarse, books, m = 4, dim = 64)
        .select(col("vec_id"), col("list_id"), joined(col("codes")).as("codes"))
        .orderBy(col("vec_id"))
    },
    qIvfPqCodes.oracle.map(trainCapSurgery))

  val all: Seq[QuerySpec] =
    Seq(qCosineTopK, qEmbNearDup, qAnnIvf, qEmbOutlier, qQuantize, qKmeansStep,
      qPqAnn, qPqRecall, qIvfPqAnn, qIvfPqAnnP2, qIvfPqCodes, qIvfPqServe,
      qAnnFiltered, qAnnRefine, qAnnRefineFiltered, qIvfPqServePinned,
      qIvfPqAnnFixed, qIvfPqServeFixed, qAnnFilteredFixed, qAnnRefineFixed,
      qPqAnnFixed, qIvfPqCodesFixed,
      qIvfPqInc, qIvfStats,
      qSqRecall, qRpReduce, qRpRecall,
      qSemDedup, qAnnRecall, qDiversify, qEmbContam)
}

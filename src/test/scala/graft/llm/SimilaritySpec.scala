package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vecsDf(rows: (Long, Seq[Float])*) = {
    graft.functions.GraftFunctions.register(spark)
    rows.toDF("vec_id", "embedding")
      .withColumn("nrm", Similarity.norm(col("embedding")))
  }

  test("cosineTopK ranks by cosine, excludes self, deterministic ties") {
    // q = (1,0); neighbors at known angles
    val vs = vecsDf(
      0L -> Seq(1f, 0f),
      1L -> Seq(1f, 0.01f),   // ~1.0
      2L -> Seq(1f, 1f),      // ~0.707
      3L -> Seq(0f, 1f),      // 0.0
      4L -> Seq(-1f, 0f))     // -1.0
    val got = Similarity.cosineTopK(vs, vs.filter(col("vec_id") === 0), k = 3)
      .orderBy(col("rank")).collect()
      .map(r => (r.getLong(2), r.getLong(1)))
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L))
  }

  test("ivfTopK returns k neighbors per query from its bucket") {
    val vs = vecsDf((0L until 40L).map(i =>
      i -> Seq(math.cos(i / 40.0 * math.Pi).toFloat, math.sin(i / 40.0 * math.Pi).toFloat)): _*)
    val out = Similarity.ivfTopK(vs, vs.filter(col("vec_id") < 2), k = 3, centroidStride = 10)
      .collect()
    assert(out.groupBy(_.getLong(0)).forall(_._2.length == 3))
    // neighbors of query 0 must be angle-near (small ids, same bucket)
    val n0 = out.filter(_.getLong(0) == 0L).map(_.getLong(2)).toSet
    assert(n0.forall(_ < 10L), s"IVF bucket leak: $n0")
  }

  test("multi-probe IVF recall dominates single-probe and approaches brute force") {
    val vs = vecsDf((0L until 40L).map(i =>
      i -> Seq(math.cos(i / 40.0 * math.Pi).toFloat, math.sin(i / 40.0 * math.Pi).toFloat)): _*)
    // query 9 sits at a bucket boundary (stride 10): its true neighbors
    // 8 and 10 straddle two buckets
    val q = vs.filter(col("vec_id") === 9)
    def neighbors(probes: Int): Set[Long] =
      Similarity.ivfTopK(vs, q, k = 3, centroidStride = 10, probes = probes)
        .collect().map(_.getLong(2)).toSet
    val exact = Similarity.cosineTopK(vs, q, k = 3)
      .collect().map(_.getLong(2)).toSet
    val p1 = neighbors(1)
    val p2 = neighbors(2)
    assert(p1.subsetOf(p2.union(exact)), "probe sets are nested searches")
    assert((p2 & exact).size >= (p1 & exact).size, "recall must not drop with probes")
    assert(p2 == exact, s"2 probes cover the boundary query's true top-3: $p2 vs $exact")
  }

  test("embNearDupPairs finds the planted duplicate vector") {
    val base = (0 until 64).map(i => (math.sin(i) * 0.3).toFloat)
    val nearDup = base.updated(0, base(0) + 0.001f)
    val noise = (0 until 64).map(i => (math.cos(i * 7 + 1) * 0.3).toFloat)
    val vs = vecsDf(1L -> base, 2L -> nearDup, 3L -> noise)
    val pairs = Similarity.embNearDupPairs(vs)
      .filter(col("cos") > 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet == Set((1L, 2L)))
  }

  test("hyperplanes are deterministic across calls") {
    assert(Similarity.hyperplanes(16, 64) == Similarity.hyperplanes(16, 64))
  }

  test("annRecall: exact hit counts, monotone in probes, full probing = recall 1") {
    val vecs = graft.Tables.load(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding"),
        Similarity.norm(col("embedding")).as("nrm"))
    val queries = vecs.filter(col("vec_id") < 3)
    def recall(probes: Int): Map[Long, Double] =
      Similarity.annRecall(vecs, queries, k = 5, centroidStride = 10, probes)
        .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val nCentroids = vecs.filter(pmod(col("vec_id"), lit(10)) === 0).count().toInt
    val full = recall(nCentroids) // probing every bucket searches the whole corpus
    assert(full.values.forall(_ == 1.0), s"full probing must be exact: $full")
    val one = recall(1)
    assert(one.keySet == full.keySet && one.values.forall(v => v >= 0.0 && v <= 1.0))
    assert(one.forall { case (q, v) => v <= full(q) }, "recall monotone in probes")
  }

  test("semDedupKeepList keeps one canonical vector per semantic cluster") {
    val base = (0 until 64).map(i => (math.sin(i) * 0.3).toFloat)
    val dupA = base.map(x => x * 2f) // same direction, cos = 1
    val dupB = base.updated(0, base(0) + 0.001f)
    val other = (0 until 64).map(i => (math.cos(i * 7 + 1) * 0.3).toFloat)
    val vs = vecsDf(1L -> base, 2L -> dupA, 3L -> dupB, 4L -> other)
    val kept = Similarity.semDedupKeepList(vs)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 4L), s"min id survives each cluster: $kept")
    // threshold above every pairwise cosine keeps everything
    val all = Similarity.semDedupKeepList(vs, tau = 1.1)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(all == Set(1L, 2L, 3L, 4L))
  }

  test("quantized IVF over trained centroids equals the sequential reference exactly") {
    val vecs = graft.Tables.load(spark, sf0001, "embeddings")
    val qv = vecs.select(col("vec_id"), Similarity.quantize(col("embedding")).as("q"))
    val centroids = Similarity.kmeansQuantized(vecs, centroidStride = 100, iters = 3)
    val queries = qv.filter(col("vec_id") < 3)
    def run() = Similarity.ivfTopKQuantized(qv, queries, k = 5, centroids, probes = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val got = run()
    assert(got == run(), "integer ranking must be run-stable")

    // independent in-memory IVF with identical semantics: L2 assignment
    // (ties → lowest c_id), probed buckets, integer-dot ranking
    // (ties → lowest vec_id)
    val all = qv.collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toVector).toMap
    val cs = centroids.collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toVector)
    def l2(a: Vector[Int], b: Vector[Int]): Long =
      a.zip(b).map { case (x, y) => (x - y).toLong * (x - y) }.sum
    val assigned = all.map { case (id, v) =>
      id -> cs.map { case (cid, cv) => (l2(v, cv), cid) }.min._2 }
    val expect = (0L until 3L).flatMap { qid =>
      val probed = cs.map { case (cid, cv) => (l2(all(qid), cv), cid) }
        .sorted.take(2).map(_._2).toSet
      val ranked = all.toSeq
        .filter { case (id, _) => id != qid && probed.contains(assigned(id)) }
        .map { case (id, v) =>
          (all(qid).zip(v).map { case (a, b) => a.toLong * b }.sum, id) }
        .sortBy { case (d, id) => (-d, id) }.take(5)
      ranked.zipWithIndex.map { case ((d, id), i) =>
        (qid, i + 1L) -> (id, d) }
    }.toMap
    assert(got == expect, s"got=$got\nexpect=$expect")
  }

  test("trained PQ ADC equals a sequential product-quantization reference") {
    val m = 4; val dim = 64; val subDim = dim / m
    val vecs = graft.Tables.load(spark, sf0001, "embeddings")
    val cb = Similarity.pqCodebooks(vecs, m, dim, centroidStride = 50, iters = 2)
    val got = Similarity.pqTopK(vecs, vecs.filter(col("vec_id") < 3), k = 5,
      cb, m, dim)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    // run-stability of the whole chain (train + encode + ADC)
    val cb2 = Similarity.pqCodebooks(vecs.repartition(7), m, dim,
      centroidStride = 50, iters = 2)
    val got2 = Similarity.pqTopK(vecs, vecs.filter(col("vec_id") < 3), k = 5,
      cb2, m, dim)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == got2, "PQ must be bit-stable under repartitioned training")

    // sequential PQ with identical semantics over the quantized vectors
    val q = vecs.select(col("vec_id"), Similarity.quantize(col("embedding")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toVector).toMap
    def l2(a: Vector[Int], b: Vector[Int]): Long =
      a.zip(b).map { case (x, y) => (x - y).toLong * (x - y) }.sum
    def subv(v: Vector[Int], j: Int): Vector[Int] =
      v.slice(j * subDim, (j + 1) * subDim)
    // per-subspace k-means: stride seeds, 2 rounds, argmin tie → lowest
    // c_id, rounded integer means, empty clusters keep their centroid
    val books: Map[Int, Map[Long, Vector[Int]]] = (0 until m).map { j =>
      var cents = q.filter(_._1 % 50 == 0).map { case (id, v) => id -> subv(v, j) }
      for (_ <- 1 to 2) {
        val assigned = q.values.map { v =>
          val sv = subv(v, j)
          (cents.toSeq.map { case (c, cv) => (l2(sv, cv), c) }.min._2, sv)
        }
        val byC = assigned.groupBy(_._1)
        cents = cents.map { case (cid, cv) =>
          cid -> byC.get(cid).fold(cv) { vs =>
            cv.indices.map(d0 => math.floor(
              vs.map(_._2(d0).toLong).sum.toDouble / vs.size + 0.5).toInt).toVector
          }
        }
      }
      j -> cents
    }.toMap
    val codes: Map[Long, Vector[Long]] = q.map { case (id, v) =>
      id -> (0 until m).map { j =>
        books(j).toSeq.map { case (c, cv) => (l2(subv(v, j), cv), c) }.min._2
      }.toVector
    }
    val expect = (0L until 3L).flatMap { qid =>
      val ranked = q.keys.filter(_ != qid).map { id =>
        val d = (0 until m).map(j => l2(subv(q(qid), j), books(j)(codes(id)(j)))).sum
        (d, id)
      }.toSeq.sorted.take(5)
      ranked.zipWithIndex.map { case ((d, id), i) => (qid, i + 1L) -> (id, d) }
    }.toMap
    assert(got == expect, s"got=$got\nexpect=$expect")
  }

  test("trained IVF-PQ (IVFADC) equals a sequential reference, probes > 1") {
    val m = 4; val dim = 64; val subDim = dim / m
    val iters = 2; val probes = 2
    val vecs = graft.Tables.load(spark, sf0001, "embeddings")
    val (coarse, books) = Similarity.ivfPqTrain(vecs, coarseStride = 100,
      m, dim, bookStride = 50, iters = iters)
    val got = Similarity.ivfPqTopK(vecs, vecs.filter(col("vec_id") < 3), k = 5,
      coarse, books, m, dim, probes = probes)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap

    // ---- sequential IVFADC with identical semantics ----
    val q = vecs.select(col("vec_id"), Similarity.quantize(col("embedding")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toVector).toMap
    def l2(a: Vector[Int], b: Vector[Int]): Long =
      a.zip(b).map { case (x, y) => (x - y).toLong * (x - y) }.sum
    def kmeans(pts: Map[Long, Vector[Int]], stride: Int, rounds: Int,
        dims: Int): Map[Long, Vector[Int]] = {
      var cents = pts.filter(_._1 % stride == 0)
      for (_ <- 1 to rounds) {
        val assigned = pts.values.map { v =>
          (cents.toSeq.map { case (c, cv) => (l2(v, cv), c) }.min._2, v)
        }
        val byC = assigned.groupBy(_._1)
        cents = cents.map { case (cid, cv) =>
          cid -> byC.get(cid).fold(cv) { vs =>
            (0 until dims).map(d0 => math.floor(
              vs.map(_._2(d0).toLong).sum.toDouble / vs.size + 0.5).toInt).toVector
          }
        }
      }
      cents
    }
    val coarseRef = kmeans(q, 100, iters, dim)
    def nearest(v: Vector[Int], cents: Map[Long, Vector[Int]]): Long =
      cents.toSeq.map { case (c, cv) => (l2(v, cv), c) }.min._2
    val resid = q.map { case (id, v) =>
      id -> v.zip(coarseRef(nearest(v, coarseRef))).map { case (a, b) => a - b }
    }
    def subv(v: Vector[Int], j: Int): Vector[Int] =
      v.slice(j * subDim, (j + 1) * subDim)
    val booksRef = (0 until m).map { j =>
      j -> kmeans(resid.map { case (id, v) => id -> subv(v, j) }, 50, iters, subDim)
    }.toMap
    val codesRef = resid.map { case (id, v) =>
      id -> (0 until m).map(j => nearest(subv(v, j), booksRef(j))).toVector
    }
    val listOf = q.map { case (id, v) => id -> nearest(v, coarseRef) }
    val expect = (0L until 3L).flatMap { qid =>
      val probedLists = coarseRef.toSeq
        .map { case (c, cv) => (l2(q(qid), cv), c) }.sorted.take(probes)
      val ranked = probedLists.flatMap { case (_, listC) =>
        val rq = q(qid).zip(coarseRef(listC)).map { case (a, b) => a - b }
        q.keys.filter(id => id != qid && listOf(id) == listC).map { id =>
          val d = (0 until m).map(j =>
            l2(subv(rq, j), booksRef(j)(codesRef(id)(j)))).sum
          (d, id)
        }
      }.sorted.take(5)
      ranked.zipWithIndex.map { case ((d, id), i) => (qid, i + 1L) -> (id, d) }
    }.toMap
    assert(got == expect, s"got=$got\nexpect=$expect")
  }

  test("stored-code serving equals the inline IVFADC chain (trained, probes > 1)") {
    // the production split: encode ONCE into the stored code table,
    // serve from it — must be bit-identical to ivfPqTopK's re-encode
    val m = 4; val dim = 64
    val vecs = graft.Tables.load(spark, sf0001, "embeddings")
    val (coarse, books) = Similarity.ivfPqTrain(vecs, coarseStride = 100,
      m, dim, bookStride = 50, iters = 2)
    val queries = vecs.filter(col("vec_id") < 3)
    val inline = Similarity.ivfPqTopK(vecs, queries, k = 5, coarse, books,
      m, dim, probes = 2).collect().map(_.toSeq).toSet
    // round-trip through storage: the served path reads the table a
    // nightly encode job would have written
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_codes").toString
    Similarity.ivfPqEncode(vecs, coarse, books, m, dim)
      .write.mode("overwrite").parquet(dir)
    val stored = spark.read.parquet(dir)
    val served = Similarity.ivfPqTopKFromCodes(stored, queries, k = 5,
      coarse, books, m, dim, probes = 2).collect().map(_.toSeq).toSet
    assert(served == inline, s"served=$served\ninline=$inline")
  }

  test("filtered ANN: a label predicate on the attribute-embedded code " +
    "table equals an index built over only the matching sub-corpus") {
    val m = 4; val dim = 64
    val vecs = graft.Tables.load(spark, sf0001, "embeddings")
    val queries = vecs.filter(col("vec_id") < 3)
    val (coarse, books) = Similarity.ivfPqTrain(vecs, coarseStride = 100,
      m = m, dim = dim, bookStride = 50, iters = 0)
    val codes = Similarity.ivfPqEncode(vecs, coarse, books, m, dim)
      .join(vecs.select(col("vec_id"), col("label")), Seq("vec_id"))
    // pre-filter semantics: candidates restricted BEFORE the top-k agg
    val filteredServe = Similarity.ivfPqTopKFromCodes(
      codes.filter(col("label") === 1), queries, k = 5, coarse, books,
      m, dim, probes = 2).collect().map(_.toSeq).toSet
    // ... must equal serving an index that only ever contained the
    // matching vectors: a frozen quantizer encodes each vector
    // independently of the rest of the corpus, so the two states are
    // row-identical on the matching subset — the classic filtered-ANN
    // correctness statement
    val subCorpus = Similarity.ivfPqTopKFromCodes(
      Similarity.ivfPqEncode(vecs.filter(col("label") === 1),
        coarse, books, m, dim),
      queries, k = 5, coarse, books, m, dim, probes = 2)
      .collect().map(_.toSeq).toSet
    assert(filteredServe.nonEmpty, "filter must leave candidates to rank")
    assert(filteredServe == subCorpus,
      s"filtered=$filteredServe\nsub-corpus=$subCorpus")
    // and every returned neighbor satisfies the predicate
    val allowed = vecs.filter(col("label") === 1)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val neighbors = filteredServe.map(_.apply(2).asInstanceOf[Long])
    assert(neighbors.subsetOf(allowed),
      s"neighbors outside the predicate: ${neighbors -- allowed}")
  }

  test("IvfPqIndex: build/save/load round-trip, delta generation, crash-orphan invisibility") {
    import org.apache.hadoop.fs.Path
    val m = 4; val dim = 64
    val vecs = graft.Tables.load(spark, sf0001, "embeddings")
    val queries = vecs.filter(col("vec_id") < 3)
    val root = java.nio.file.Files.createTempDirectory("ivfpq_index").toString
    // generation 1: index over the even-id half
    val half = vecs.filter(pmod(col("vec_id"), lit(2)) === 0)
    val idx1 = IvfPqIndex.build(half, coarseStride = 100, m, dim,
      bookStride = 50, iters = 2)
    IvfPqIndex.save(idx1, root)
    val loaded1 = IvfPqIndex.load(spark, root)
    assert(loaded1.m == m && loaded1.dim == dim)
    // loaded serving == the inline chain over the same trained frames
    val inline = Similarity.ivfPqTopK(half, queries, k = 5, idx1.coarse,
      idx1.books, m, dim, probes = 2).collect().map(_.toSeq).toSet
    val served1 = loaded1.topK(queries, k = 5, probes = 2)
      .collect().map(_.toSeq).toSet
    assert(served1 == inline, s"loaded=$served1\ninline=$inline")
    // generation 2: nightly delta — full corpus appended, quantizer
    // frozen; published as an atomic new generation
    IvfPqIndex.save(loaded1.withDelta(vecs), root)
    val loaded2 = IvfPqIndex.load(spark, root)
    assert(loaded2.codes.count() == vecs.count(),
      "delta generation must cover the full corpus")
    val fullInline = Similarity.ivfPqTopK(vecs, queries, k = 5, idx1.coarse,
      idx1.books, m, dim, probes = 2).collect().map(_.toSeq).toSet
    val served2 = loaded2.topK(queries, k = 5, probes = 2)
      .collect().map(_.toSeq).toSet
    assert(served2 == fullInline, "delta index must serve like a full encode")
    // crashed writer: a staged-but-never-promoted generation is
    // invisible to load
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val orphanGen = graft.streaming.ManifestStore.nextGen(fs, rootPath)
    fs.mkdirs(graft.streaming.ManifestStore.stagingPath(rootPath, orphanGen))
    val afterCrash = IvfPqIndex.load(spark, root)
    assert(afterCrash.codes.count() == vecs.count(),
      "an unpromoted generation must never be resolved")

    // TORN generation: the writer died MID-DATA-WRITE, leaving a
    // staging dir with a half-written (garbage) parquet file and no
    // manifest. Readers must keep resolving the promoted snapshot
    // without ever opening the torn files; the next save must number
    // PAST the torn dir (never append into it) and its GC must reclaim
    // it. This is the object-store analog of the ingest spec's
    // commit-window kill.
    val tornGen = graft.streaming.ManifestStore.nextGen(fs, rootPath)
    val tornDir = graft.streaming.ManifestStore.stagingPath(rootPath, tornGen)
    fs.mkdirs(tornDir)
    val tornFile = fs.create(new Path(tornDir, "part-00000.parquet"), true)
    tornFile.write("PAR1 then the process died".getBytes("UTF-8"))
    tornFile.close()
    assert(tornGen > orphanGen, "numbers must advance past every orphan")
    val afterTorn = IvfPqIndex.load(spark, root)
    assert(afterTorn.codes.count() == vecs.count(),
      "a torn generation must be invisible — load never lists gens/ directly")
    assert(afterTorn.topK(queries, k = 5, probes = 2)
      .collect().map(_.toSeq).toSet == served2,
      "serving after the torn write is byte-identical to the promoted snapshot")
    // recovery is structural: the NEXT successful save numbers past the
    // torn dir and garbage-collects it
    IvfPqIndex.save(afterTorn.withDelta(vecs), root)
    assert(!fs.exists(tornDir),
      "the next promote's GC must reclaim the torn generation")
    val gens = fs.listStatus(new Path(rootPath, "gens"))
      .map(_.getPath.getName).sorted
    assert(graft.streaming.ManifestStore.currentGen(fs, rootPath)
      .exists(_ > tornGen), s"new generation must number past the torn one: $gens")
    assert(IvfPqIndex.load(spark, root).codes.count() == vecs.count(),
      "post-recovery index serves the full corpus")
  }

  test("IvfPqIndex maintained code table: delta generations == full " +
    "encode; replay/crash legs; compaction folds; drift alarm fires " +
    "on quantizer skew") {
    import org.apache.spark.sql.functions.pmod
    val root = java.nio.file.Files.createTempDirectory("ivfmaint").toString
    val vecs = graft.Tables.load(spark, sf0001, "embeddings")
    val (coarse, books) = Similarity.ivfPqTrain(vecs, coarseStride = 100,
      m = 4, dim = 64, bookStride = 50, iters = 0)
    def codesOf(idx: IvfPqIndex): Map[Long, (Long, Seq[Int])] =
      idx.codes.collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getSeq[Int](2).toSeq)).toMap
    val want = codesOf(IvfPqIndex(4, 64, coarse, books,
      Similarity.ivfPqEncode(vecs, coarse, books, 4, 64)))

    // base codes land as the GENESIS cgen=-1: batchId numbering
    // starts at 0 in Spark streaming, so the very first streamed
    // delta must NOT read as already-committed (the silent-drop bug
    // a gen=0 init would reintroduce)
    import graft.streaming.GenerationLog
    IvfPqIndex.initMaintained(IvfPqIndex(4, 64, coarse, books,
      Similarity.ivfPqEncode(vecs.filter(pmod(col("vec_id"), lit(3)) === 0),
        coarse, books, 4, 64)), root)
    assert(GenerationLog.committedCgens(root) == Seq(-1L))
    assert(!GenerationLog.covered(root, 0L),
      "batchId 0 must not be covered by the genesis state")
    IvfPqIndex.mergeCodesBatch(root)(
      vecs.filter(pmod(col("vec_id"), lit(3)) <= 1), 0L)
    IvfPqIndex.mergeCodesBatch(root)(vecs, 2L) // full-overlap catch-up
    val maintained = IvfPqIndex.loadMaintained(spark, root)
    assert(codesOf(maintained) == want,
      "maintained generations must union to the full encode")
    assert(maintained.m == 4 && maintained.dim == 64)

    // committed replay: a covered batchId is a no-op
    IvfPqIndex.mergeCodesBatch(root)(vecs, 2L)
    assert(GenerationLog.committedGens(root) == Seq(0L, 2L))
    // crash leg: marker lost between data writes and commit — the
    // replay recomputes the SAME generation over the same pre-state
    val fs = GenerationLog.fsOf(root)
    assert(fs.delete(GenerationLog.marker(
      GenerationLog.genDir(root, 2L)), false))
    IvfPqIndex.mergeCodesBatch(root)(vecs, 2L)
    assert(codesOf(IvfPqIndex.loadMaintained(spark, root)) == want)

    // compaction folds the generations; deferred GC leaves a pinned
    // reader intact, gcSuperseded collects after re-resolution. The
    // pinned handle is resolved AFTER the crash replay (the replay
    // rewrote gen=2's files in place — like any in-place rewrite, it
    // legitimately invalidates handles older than itself)
    val rereader = IvfPqIndex.loadMaintained(spark, root)
    val pinned = codesOf(rereader)
    IvfPqIndex.compactCodes(spark, root)
    assert(GenerationLog.committedCgens(root) == Seq(-1L, 2L),
      "deferred GC keeps the superseded genesis cgen on disk")
    assert(codesOf(IvfPqIndex.loadMaintained(spark, root)) == want)
    assert(codesOf(rereader) == pinned,
      "pre-compaction reader must keep serving under deferred GC")
    GenerationLog.gcSuperseded(root)
    assert(GenerationLog.committedGens(root).isEmpty &&
      GenerationLog.committedCgens(root) == Seq(2L),
      "gcSuperseded must collect the folded gens AND the genesis cgen")
    assert(codesOf(IvfPqIndex.loadMaintained(spark, root)) == want)
    // merges continue past the compaction
    IvfPqIndex.mergeCodesBatch(root)(vecs, 3L) // nothing fresh: empty gen
    assert(codesOf(IvfPqIndex.loadMaintained(spark, root)) == want)

    // drift alarm: balanced lists stay quiet, an 80%-in-one-list
    // quantizer trips the retrain signal
    import spark.implicits._
    val balanced = (0L until 100L).map(i => (i, i % 20, Seq(1, 2)))
      .toDF("vec_id", "list_id", "codes")
    val (nl, maxP, balP, fire) = IvfPqIndex.driftAlarm(balanced)
    assert(nl == 20 && maxP == 50000 && balP == 50000 && !fire)
    val skewed = (0L until 100L).map(i =>
        (i, if (i < 81) 0L else i % 19 + 1, Seq(1, 2)))
      .toDF("vec_id", "list_id", "codes")
    val (_, maxS, _, fireS) = IvfPqIndex.driftAlarm(skewed)
    assert(maxS == 810000 && fireS,
      "a skewed coarse quantizer must trip the retrain alarm")
  }

  test("attribute-embedded maintained index: filter attrs survive delta " +
    "generations, compaction, and a retrain epoch; filtered serving " +
    "equals the loose-frame filtered serve") {
    import org.apache.spark.sql.functions.pmod
    val root = java.nio.file.Files.createTempDirectory("ivfattr").toString
    val vecs = graft.Tables.load(spark, sf0001, "embeddings")
    val (coarse, books) = Similarity.ivfPqTrain(vecs, coarseStride = 100,
      m = 4, dim = 64, bookStride = 50, iters = 0)
    val queries = vecs.filter(col("vec_id") < 3)
    // genesis: attr-carrying codes over a third of the corpus
    val genesis = IvfPqIndex(4, 64, coarse, books,
      Similarity.ivfPqEncode(vecs.filter(pmod(col("vec_id"), lit(3)) === 0),
        coarse, books, 4, 64, attrs = Seq("label")))
    assert(genesis.attrColumns == Seq("label"))
    IvfPqIndex.initEpochal(genesis, root)
    // deltas infer the attribute layout from the maintained table
    // itself — the caller never re-declares it
    IvfPqIndex.mergeEpochal(root)(vecs, 0L)
    IvfPqIndex.compactEpochal(spark, root)
    val maintained = IvfPqIndex.loadEpochal(spark, root)
    assert(maintained.attrColumns == Seq("label"),
      "delta + compaction must preserve the attribute layout")
    // filtered serving off the maintained table == the loose-frame
    // filtered serve over an equivalent one-shot encode
    val expect = Similarity.ivfPqTopKFromCodes(
      Similarity.ivfPqEncode(vecs, coarse, books, 4, 64, Seq("label"))
        .filter(col("label") === 1),
      queries, k = 5, coarse, books, 4, 64, probes = 2)
      .collect().map(_.toSeq).toSet
    val got = maintained.topKFiltered(queries, k = 5,
      col("label") === 1, probes = 2).collect().map(_.toSeq).toSet
    assert(got.nonEmpty && got == expect,
      s"maintained filtered serve drifted:\ngot=$got\nexpect=$expect")
    // a retrain epoch re-encodes with the same filterable layout, so
    // filtered queries keep working across the cutover
    val e = IvfPqIndex.retrain(spark, root, vecs, coarseStride = 50,
      bookStride = 50)
    val retrained = IvfPqIndex.loadEpochal(spark, root)
    assert(e == 1L && retrained.attrColumns == Seq("label"))
    val allowed = vecs.filter(col("label") === 1).select(col("vec_id"))
      .collect().map(_.getLong(0)).toSet
    val nbrs = retrained.topKFiltered(queries, k = 5,
      col("label") === 1, probes = 2).collect().map(_.getLong(2)).toSet
    assert(nbrs.nonEmpty && nbrs.subsetOf(allowed),
      s"retrained filtered serve leaked outside the predicate: " +
        s"${nbrs -- allowed}")
  }

  test("epochal retrain loop: drift fires the alarm, retrain cuts over " +
    "atomically to a fresh-quantizer epoch, recall@k recovers, batch-id " +
    "coverage continues, pinned pre-retrain reads stay byte-stable, " +
    "crashed cutover is invisible and self-heals") {
    import graft.streaming.GenerationLog
    val root = java.nio.file.Files.createTempDirectory("ivfepoch").toString
    graft.functions.GraftFunctions.register(spark)
    def mk(rows: Seq[(Long, Seq[Float])]) =
      rows.toDF("vec_id", "embedding")
        .withColumn("nrm", Similarity.norm(col("embedding")))
    // region A: 20 spread vectors — the world the initial quantizer
    // was trained on (10 centroids via stride 2)
    val aRows = (0L until 20L).map(i => i -> Seq.tabulate(8)(j =>
      if (j == (i % 8).toInt) 60f + i else (i % 5).toFloat))
    // drift region B: 120 near-duplicate vectors far from every A
    // centroid — the corpus the deployment ACTUALLY accumulates; all
    // of B lands in one inverted list of the A-trained quantizer
    val bRows = (0L until 120L).map(i => (1000L + i) -> Seq.tabulate(8)(j =>
      100f + ((i * (j + 3)) % 17)))
    val vecsA = mk(aRows)
    val all = mk(aRows ++ bRows)
    val queries = mk((aRows ++ bRows).filter(r =>
      Seq(1000L, 1007L, 1033L, 1060L, 1111L).contains(r._1)))
    def recallAt5(idx: IvfPqIndex): Double = {
      val exact = Similarity.cosineTopK(all, queries, 5)
        .select(col("q_id"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val approx = idx.topK(queries, 5, probes = 1)
        .select(col("q_id"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact intersect approx).size.toDouble / exact.size
    }
    def codesOf(idx: IvfPqIndex): Map[Long, (Long, Seq[Int])] =
      idx.codes.collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getSeq[Int](2).toSeq)).toMap

    // epoch 0: quantizer trained on A, genesis = A's codes
    val (coarse0, books0) = Similarity.ivfPqTrain(vecsA, coarseStride = 2,
      m = 2, dim = 8, bookStride = 4, iters = 0)
    assert(IvfPqIndex.initEpochal(IvfPqIndex(2, 8, coarse0, books0,
      Similarity.ivfPqEncode(vecsA, coarse0, books0, 2, 8)), root) == 0L)
    // the drifted nightly delta lands as batch 0 of the active epoch
    IvfPqIndex.mergeEpochal(root)(all, 0L)
    val drifted = IvfPqIndex.loadEpochal(spark, root)
    assert(codesOf(drifted).keySet ==
      (aRows ++ bRows).map(_._1).toSet)
    val (_, maxPpm0, balPpm0, fired) = IvfPqIndex.driftAlarm(drifted.codes)
    assert(fired && maxPpm0 > 4 * balPpm0,
      s"drift must trip the alarm: max=$maxPpm0 balanced=$balPpm0")
    val recallBefore = recallAt5(drifted)
    val pinnedEpoch0 = IvfPqIndex.loadMaintainedAt(spark,
      IvfPqIndex.epochDir(root, 0L), 0L).get
    val pinnedBefore = codesOf(pinnedEpoch0)

    // the wired loop: alarm -> fresh quantizer over the accumulated
    // corpus -> full re-encode -> atomic epoch cutover
    val (alarm1, retrained) = IvfPqIndex.retrainIfDrifted(spark, root,
      all, coarseStride = 10, bookStride = 10, iters = 1)
    assert(alarm1._4 && retrained.contains(1L))
    val healthyCodes = codesOf(IvfPqIndex.loadEpochal(spark, root))

    // crashed cutover: the epoch marker never landed — the retrain is
    // INVISIBLE (old epoch keeps serving) and the retry recomputes the
    // same epoch number over the same corpus, byte-identically
    val fs = GenerationLog.fsOf(root)
    assert(fs.delete(GenerationLog.marker(
      IvfPqIndex.epochDir(root, 1L)), false))
    assert(IvfPqIndex.activeEpochDir(root) == IvfPqIndex.epochDir(root, 0L))
    assert(IvfPqIndex.driftAlarm(
      IvfPqIndex.loadEpochal(spark, root).codes)._4,
      "with the cutover invisible, the alarm still stands")
    assert(IvfPqIndex.retrain(spark, root, all, coarseStride = 10,
      bookStride = 10, iters = 1) == 1L)
    assert(codesOf(IvfPqIndex.loadEpochal(spark, root)) == healthyCodes,
      "the healed cutover must reproduce the crashed one byte-stably")

    // post-retrain: alarm quiet, recall recovered, loop is a no-op
    val after = IvfPqIndex.loadEpochal(spark, root)
    val (_, maxPpm1, balPpm1, fired1) = IvfPqIndex.driftAlarm(after.codes)
    assert(!fired1,
      s"retrained quantizer must quiet the alarm: max=$maxPpm1 balanced=$balPpm1")
    val recallAfter = recallAt5(after)
    assert(recallAfter > recallBefore,
      s"recall@5 must recover: before=$recallBefore after=$recallAfter")
    assert(recallAfter >= 0.8, s"retrained recall@5 too low: $recallAfter")
    assert(IvfPqIndex.retrainIfDrifted(spark, root, all,
      coarseStride = 10, bookStride = 10, iters = 1)._2.isEmpty,
      "a healthy index must not retrain")

    // batch-id coverage continues across the cutover: the retrain
    // genesis covers through the retired epoch's max id (0), so a
    // replayed batch 0 no-ops and batch 1 appends to the new epoch
    IvfPqIndex.mergeEpochal(root)(all, 0L)
    assert(GenerationLog.committedGens(IvfPqIndex.activeEpochDir(root)).isEmpty,
      "a replayed covered batchId must not write a generation")
    val cRows = (0L until 4L).map(i => (2000L + i) -> Seq.tabulate(8)(j =>
      (i + j).toFloat))
    IvfPqIndex.mergeEpochal(root)(mk(aRows ++ bRows ++ cRows), 1L)
    assert(codesOf(IvfPqIndex.loadEpochal(spark, root)).keySet ==
      (aRows ++ bRows ++ cRows).map(_._1).toSet)

    // pinned reads: a pre-retrain pin on the retired epoch is
    // byte-stable under the cutover (deferred epoch GC); the as-of
    // resolver serves pins below the new genesis from the retired
    // epoch and pins at/above it from the retrain epoch
    assert(codesOf(pinnedEpoch0) == pinnedBefore,
      "pinned pre-retrain reader must keep serving across the cutover")
    assert(codesOf(IvfPqIndex.loadEpochalAt(spark, root, -1L).get).keySet ==
      aRows.map(_._1).toSet,
      "a pin below the retrain genesis falls through to the retired epoch")
    assert(codesOf(IvfPqIndex.loadEpochalAt(spark, root, 0L).get) ==
      healthyCodes,
      "a pin at the retrain coverage point serves the retrain epoch")

    // deferred GC: after eval pins expire, the retired epoch goes
    IvfPqIndex.gcEpochs(root)
    assert(IvfPqIndex.committedEpochs(root) == Seq(1L))
    assert(IvfPqIndex.loadEpochalAt(spark, root, -1L).isEmpty)
    assert(codesOf(IvfPqIndex.loadEpochalAt(spark, root, 1L).get).keySet ==
      (aRows ++ bRows ++ cRows).map(_._1).toSet)
  }

  test("stored-code serving raises on a code table built with a different m") {
    val vecs = graft.Tables.load(spark, sf0001, "embeddings")
    val (coarse, books) = Similarity.ivfPqTrain(vecs, coarseStride = 100,
      m = 4, dim = 64, bookStride = 50, iters = 0)
    val wrongM = Similarity.ivfPqEncode(vecs, coarse, books, m = 2, dim = 64)
    val ex = intercept[Exception] {
      Similarity.ivfPqTopKFromCodes(wrongM, vecs.filter(col("vec_id") < 2),
        k = 5, coarse, books, m = 4, dim = 64, probes = 1).collect()
    }
    assert(ex.getMessage.contains("different PQ config"),
      s"unexpected error: ${ex.getMessage}")
  }

  test("ivfPqRecall: all lists probed + lossless books give recall 1.0") {
    // probes >= list count and stride-1 residual codebooks: every
    // candidate is scored and each residual encodes to itself, so ADC
    // degenerates to exact L2 — the IVFADC lossless limit
    val vecs = graft.Tables.load(spark, sf0001, "embeddings")
      .filter(col("vec_id") < 60)
    val (coarse, books) = Similarity.ivfPqTrain(vecs, coarseStride = 20,
      m = 4, dim = 64, bookStride = 1, iters = 0)
    val out = Similarity.ivfPqRecall(vecs, vecs.filter(col("vec_id") < 3),
      k = 5, coarse, books, m = 4, dim = 64, probes = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out.size == 3 && out.values.forall(_ == 1.0), out.toString)
  }

  test("pqRecall: lossless codebooks (stride 1) give recall 1.0 everywhere") {
    // with every corpus subvector in the codebook, each vector encodes
    // to (a tie-broken copy of) itself and ADC degenerates to exact L2
    // on codebook representatives — recall must be perfect
    val vecs = graft.Tables.load(spark, sf0001, "embeddings")
      .filter(col("vec_id") < 60)
    val cb = Similarity.pqCodebooks(vecs, m = 4, dim = 64,
      centroidStride = 1, iters = 0)
    val out = Similarity.pqRecall(vecs, vecs.filter(col("vec_id") < 3), k = 5,
      cb, m = 4, dim = 64)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out.size == 3 && out.values.forall(_ == 1.0), out.toString)
  }

  test("integer k-means equals an independent driver-side implementation, bit-stable") {
    val vecs = graft.Tables.load(spark, sf0001, "embeddings")
    def run(df: org.apache.spark.sql.DataFrame): Map[Long, Vector[Int]] =
      Similarity.kmeansQuantized(df, centroidStride = 100, iters = 3)
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toVector).toMap
    val got = run(vecs)

    // independent in-memory Lloyd's over the same quantized vectors
    val q = vecs.select(col("vec_id"), Similarity.quantize(col("embedding")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toVector)
    var cents = q.filter(_._1 % 100 == 0).toMap
    for (_ <- 1 to 3) {
      val assigned = q.map { case (_, v) =>
        val cid = cents.toSeq.map { case (c, cv) =>
          (v.zip(cv).map { case (a, b) => (a - b).toLong * (a - b) }.sum, c)
        }.min._2 // min (dist, c_id): nearest, ties to lowest centroid id
        (cid, v)
      }
      val byC = assigned.groupBy(_._1)
      cents = cents.map { case (cid, cv) =>
        cid -> byC.get(cid).fold(cv) { vs =>
          cv.indices.map(d => math.floor(
            vs.map(_._2(d).toLong).sum.toDouble / vs.size + 0.5).toInt).toVector
        }
      }
    }
    assert(got == cents, "distributed trainer must equal the sequential reference")
    // exact integer arithmetic ⇒ bit-stable under any partitioning
    assert(run(vecs.repartition(7)) == got)
  }

  test("centroidOutliers ranks by distance to the nearest centroid") {
    // stride 100 makes vec 0 the single centroid; worst-2 by cosine:
    // the orthogonal vec 2, then vec 3, never the centroid itself
    val vs = vecsDf(
      0L -> Seq(1f, 0f),
      1L -> Seq(1f, 0.1f),
      2L -> Seq(0f, 1f),
      3L -> Seq(0.9f, 0.3f))
    val out = Similarity.centroidOutliers(vs, centroidStride = 100, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((2L, 0L), (3L, 0L)), out.toSeq)
    // dist is exactly 1 - cos
    val full = Similarity.centroidOutliers(vs, 100, 4).collect()
    full.foreach(r => assert(r.getDouble(3) == 1.0 - r.getDouble(2)))
  }

  test("signMatrix is deterministic ±1 and tracks the hyperplane signs") {
    val m = Similarity.signMatrix(4, 8)
    assert(m == Similarity.signMatrix(4, 8))
    assert(m.size == 4 && m.forall(_.size == 8))
    assert(m.flatten.forall(s => s == 1 || s == -1))
    val planes = Similarity.hyperplanes(4, 8)
    assert(m.flatten == planes.flatten.map(x => if (x >= 0) 1 else -1))
  }

  test("rpReduce equals a sequential signed projection of the quantized vectors") {
    val rows = Seq(
      0L -> Seq(0.5f, -1f, 0.25f, 0f, 1f, -0.5f, 0.125f, 2f),
      1L -> Seq(0f, 0f, 0f, 0f, 0f, 0f, 0f, 0f), // zero vector → rp all 0
      2L -> Seq(-3f, 1f, 4f, -1f, 5f, -9f, 2f, 6f))
    val got = Similarity.rpReduce(rows.toDF("vec_id", "embedding"), 4, 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def quant(v: Seq[Float]): Seq[Int] = {
      val s = v.map(math.abs).max
      if (s == 0f) v.map(_ => 0)
      else v.map(x => math.floor(x.toDouble / s.toDouble * 127.0 + 0.5).toInt)
    }
    val signs = Similarity.signMatrix(4, 8)
    val want = rows.map { case (id, v) =>
      val q = quant(v)
      id -> signs.map(row => row.zip(q).map { case (s, x) => (s * x).toLong }.sum)
    }.toMap
    assert(got == want)
    // partitioning-independent (exact integers end to end)
    val re = Similarity.rpReduce(
      rows.toDF("vec_id", "embedding").repartition(3), 4, 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(re == got)
  }

  test("sqRecall and rpRecall hit 1.0 when k covers the whole corpus") {
    // k >= n-1 ⇒ both rankings contain every other vector ⇒ recall 1
    val vs = vecsDf(
      0L -> Seq(1f, 0f, 0f, 0f),
      1L -> Seq(0.9f, 0.1f, 0f, 0f),
      2L -> Seq(0f, 1f, 0f, 0f),
      3L -> Seq(0.2f, -0.4f, 0.8f, 0f))
    val sq = Similarity.sqRecall(vs, vs.filter(col("vec_id") < 2), k = 3)
      .collect().map(r => r.getAs[Double]("recall"))
    assert(sq.length == 2 && sq.forall(_ == 1.0), sq.toSeq)
    val rp = Similarity.rpRecall(vs, vs.filter(col("vec_id") < 2), k = 3,
      rDim = 4, dim = 4)
      .collect().map(r => r.getAs[Double]("recall"))
    assert(rp.length == 2 && rp.forall(_ == 1.0), rp.toSeq)
  }

  test("rpRecall is bounded by the exact side and keeps zero-hit queries") {
    // rDim=1 collapses geometry: recalls stay in [0,1] and every query
    // appears exactly once even when the reduced ranking finds nothing
    val vs = vecsDf(
      0L -> Seq(1f, 0f, 0f, 0f), 1L -> Seq(0f, 1f, 0f, 0f),
      2L -> Seq(0f, 0f, 1f, 0f), 3L -> Seq(0f, 0f, 0f, 1f),
      4L -> Seq(1f, 1f, 0f, 0f))
    val rows = Similarity.rpRecall(vs, vs.filter(col("vec_id") < 3), k = 2,
      rDim = 1, dim = 4).collect()
    assert(rows.map(_.getAs[Long]("q_id")).toSet == Set(0L, 1L, 2L))
    rows.foreach { r =>
      val rec = r.getAs[Double]("recall")
      assert(rec >= 0.0 && rec <= 1.0)
      assert(r.getAs[Long]("n_hit") <= r.getAs[Long]("k"))
    }
  }

  test("diversifyKeepList drops the most-prototypical quarter per cluster") {
    // two clean clusters of 10 around orthogonal centroids (ids 0, 10);
    // within each, cos to centroid decreases with id
    def at(angle: Double, base: Double) =
      Seq(math.cos(base + angle).toFloat, math.sin(base + angle).toFloat)
    val vs = vecsDf(
      ((0L until 10L).map(i => i -> at(i * 0.05, 0.0)) ++
        (10L until 20L).map(i => i -> at((i - 10) * 0.05, math.Pi / 2))): _*)
    val kept = Similarity.diversifyKeepList(vs, centroidStride = 10,
        dropPpm = 250000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("rn"),
        r.getAs[Long]("n_cluster")))
    // floor(10 * 0.25) = 2 dropped per cluster: the centroid itself and
    // its nearest member (ranks 1-2 = ids 0,1 and 10,11)
    assert(kept.length == 16, kept.length.toString)
    assert(kept.map(_._1).toSet ==
      ((2L until 10L) ++ (12L until 20L)).toSet, kept.mkString(","))
    assert(kept.forall(_._3 > 2L))
    assert(kept.forall(_._4 == 10L))
    assert(kept.filter(_._1 < 10L).forall(_._2 == 0L))
    assert(kept.filter(_._1 >= 10L).forall(_._2 == 10L))
  }

  test("embContamination flags the planted copies, not the distant corpus") {
    // bench stride 3 over ids 0..3 -> bench = {0, 3}; both get an exact
    // planted copy at id + offset; 1 and 2 sit far from both bench vecs
    val vs = vecsDf(
      0L -> Seq(1f, 0f, 0f, 0f),
      1L -> Seq(0f, 1f, 0.1f, 0f),
      2L -> Seq(0f, 0.1f, 1f, 0f),
      3L -> Seq(0f, 0f, 0f, 1f))
    val out = Similarity.embContamination(vs, benchStride = 3, tau = 0.95,
        plantOffset = 100L)
      .orderBy(col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Int]("contaminated")))
    // bench members score only against the OTHER bench vec (self excluded)
    assert(out.map(x => (x._1, x._3)).toSeq ==
      Seq((0L, 0), (1L, 0), (2L, 0), (3L, 0), (100L, 1), (103L, 1)),
      out.mkString(","))
    assert(out.filter(_._1 >= 100L).map(x => x._1 - 100L -> x._2).toMap ==
      Map(0L -> 0L, 3L -> 3L), "planted copies must match their source")
  }

  test("pinned maintained ANN serve excludes post-pin merges; the live read sees them") {
    // building the pinned state also commits batch 1 (every corpus
    // vector re-merged at vec_id + 1e7 — identical embeddings) and a
    // compaction; the pin at batch 0 must see none of that
    val pinned = Similarity.pinnedIvfPqOf(spark, sf0001)
    val root = graft.sources.IndexStore.maintainedRoot(spark, sf0001,
      "maint_ivfpq_c100_m4_b50", table = "embeddings")(_ =>
      fail("root must already be built by pinnedIvfPqOf"))
    val live = IvfPqIndex.loadMaintained(spark, root)
    val vs = graft.Tables.load(spark, sf0001, "embeddings")
    val queries = vs.filter(col("vec_id") < 3)
    val pinnedIds = pinned.topK(queries, k = 5, probes = 2)
      .select(col("neighbor_id")).collect().map(_.getLong(0))
    assert(pinnedIds.nonEmpty && pinnedIds.forall(_ < 10000000L),
      "pinned read must never surface batch-1 codes")
    // the live state holds exactly the pinned corpus PLUS its shifted
    // batch-1 copy (a serving-tail membership check would be tie-
    // fragile: the copies share their originals' codes, so they TIE at
    // minimal ADC distance and the (adist, vec_id) tie-break keeps
    // small ids — the state-level equality is the deterministic pin)
    val n = pinned.codes.count()
    assert(live.codes.count() == 2 * n, "live = corpus + shifted batch 1")
    assert(pinned.codes.agg(max(col("vec_id"))).head.getLong(0) < 10000000L)
    assert(live.codes.agg(max(col("vec_id"))).head.getLong(0) >= 10000000L)
    // and the live serve DOES score batch-1 candidates: a query only
    // batch 1 answers (every original excluded by a filter on the
    // stored scan) must return purely shifted neighbors
    val onlyNew = IvfPqIndex(live.m, live.dim, live.coarse, live.books,
      live.codes.filter(col("vec_id") >= 10000000L))
      .topK(queries, k = 5, probes = 2)
      .select(col("neighbor_id")).collect().map(_.getLong(0))
    assert(onlyNew.nonEmpty && onlyNew.forall(_ >= 10000000L))
  }

  test("ivfPqTopKRefined: exact re-rank dominates plain ADC recall and " +
    "converges to the exact ranking when the pool covers the corpus") {
    val m = 4; val dim = 64; val k = 5
    val vecs = graft.Tables.load(spark, sf0001, "embeddings")
    val (coarse, books) = Similarity.ivfPqTrain(vecs, coarseStride = 100,
      m, dim, bookStride = 50, iters = 0)
    val codes = Similarity.ivfPqEncode(vecs, coarse, books, m, dim)
      .localCheckpoint()
    val queries = vecs.filter(col("vec_id") < 3)

    // driver-side exact ground truth over the same quantized vectors
    val q = vecs.select(col("vec_id"), Similarity.quantize(col("embedding")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toVector).toMap
    def l2(a: Vector[Int], b: Vector[Int]): Long =
      a.zip(b).map { case (x, y) => (x - y).toLong * (x - y) }.sum
    val qids = q.keys.filter(_ < 3).toSeq.sorted
    val exact = qids.map { qid =>
      qid -> q.toSeq.filter(_._1 != qid)
        .map { case (vid, v) => (l2(v, q(qid)), vid) }
        .sorted.take(k).map { case (d, vid) => (vid, d) }
    }.toMap

    def neighborSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select(col("q_id"), col("neighbor_id")).collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    def recallVs(exactSide: Map[Long, Seq[(Long, Long)]],
        approx: Map[Long, Set[Long]]): Double =
      qids.map(qid => exactSide(qid).count(p => approx(qid)(p._1))).sum.toDouble /
        (qids.size * k)

    // refined@k recall >= plain ADC@k recall at the same probes: the
    // refine pool contains the ADC top-k, and the exact re-rank can
    // only improve agreement with the exact ranking
    val adc = neighborSets(Similarity.ivfPqTopKFromCodes(codes, queries, k,
      coarse, books, m, dim, probes = 2))
    val refined = neighborSets(Similarity.ivfPqTopKRefined(codes, queries,
      vecs, k, refine = 3, coarse, books, m, dim, probes = 2))
    assert(recallVs(exact, refined) >= recallVs(exact, adc),
      s"refine must not lose recall: ${recallVs(exact, refined)} vs ${recallVs(exact, adc)}")

    // full coverage: every list probed + pool >= corpus => the refined
    // result IS the exact ranking, rank for rank, distance for distance
    val nLists = q.keys.count(_ % 100 == 0)
    val full = Similarity.ivfPqTopKRefined(codes, queries, vecs, k,
      refine = (q.size + k - 1) / k, coarse, books, m, dim, probes = nLists)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    qids.foreach { qid =>
      exact(qid).zipWithIndex.foreach { case ((vid, d), i) =>
        assert(full((qid, i + 1L)) == ((vid, d)),
          s"q=$qid rank=${i + 1}: got ${full((qid, i + 1L))}, want ($vid, $d)")
      }
    }
  }
}

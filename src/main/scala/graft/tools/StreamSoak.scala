package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryListener, Trigger}

import graft.Tables
import graft.llm.{IvfPqIndex, StreamingCuration}

/** Streaming soak harness: replay a testdata tier as a bounded
  * multi-batch file feed through the streaming operators on the
  * RocksDB state store, and report sustained throughput, state size,
  * and watermark lag from the engine's own progress events.
  *
  *   SPARK_GRAFT_CPUS=32 tools/run_main.sh graft.tools.StreamSoak \
  *     testdata-derived/sf1 curate,neardup,serve
  *
  * Feed shape: the tier's documents (or embeddings for `serve`) are
  * split into `SPARK_GRAFT_SOAK_CHUNKS` (default 40) files with
  * `event_ts = base + doc_id ms`, read back with maxFilesPerTrigger so
  * `Trigger.AvailableNow` drains the feed as a sequence of bounded
  * micro-batches — catch-up shape, like IngestBench. Per-mode output
  * is one JSON line from the StreamingQueryListener's progress events:
  * rows, wall, entries/s, peak state rows/bytes, final watermark.
  *
  * Modes:
  *  - `curate`  — [[StreamingCuration.streamingCurateDedup]]: the gate
  *    chain + watermarked exact dedup (state = one 16-byte hash per
  *    distinct kept doc within horizon);
  *  - `neardup` — [[StreamingCuration.streamingNearDup]]: banded LSH
  *    state (bounded buckets, the heavy-state path);
  *  - `serve`   — [[IvfPqIndex.serveStream]] over a FIXED-K index
  *    built from the same tier (the production serving config, not
  *    the stride-seeded oracle config): windowed top-k state;
  *  - `asof`    — [[graft.streaming.StreamingTemporal.streamingAsofJoin]]
  *    over the tier's events replayed in event-time order (purchases
  *    enriched against errors per user): pending-left + right-history
  *    state, the exactness-buffering path;
  *  - `bm25`    — [[graft.llm.Retrieval.streamingBm25Serve]] over a
  *    materialized postings index of the tier (every 100th doc replayed
  *    as a query): the chained-streaming-aggregation path — per-(query,
  *    doc) windowed sums then the bounded top-k — under the synthetic
  *    corpus's worst case, where every query term is a corpus-wide
  *    stopword and each query scores tens of thousands of candidates;
  *  - `bm25p`   — [[graft.llm.Retrieval.streamingBm25ServePacked]]:
  *    the same feed and index PACKED per term, scored row-locally and
  *    merged by the one-state-row-per-query `graft_sum_topk`
  *    aggregate (measured 6.9× the chained form at sf1, state 246
  *    rows vs 12.6M).
  */
object StreamSoak {

  private class Collector extends StreamingQueryListener {
    case class P(batchId: Long, rows: Long, stateRows: Long,
        stateBytes: Long, watermark: String)
    val progresses = scala.collection.mutable.ArrayBuffer.empty[P]
    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
      synchronized {
        val p = e.progress
        val st = p.stateOperators
        progresses += P(p.batchId, p.numInputRows,
          if (st.isEmpty) 0L else st.map(_.numRowsTotal).sum,
          if (st.isEmpty) 0L else st.map(_.memoryUsedBytes).sum,
          Option(p.eventTime.get("watermark")).getOrElse(""))
      }
  }

  /** Write `df` as a `chunks`-file feed dir; returns (path, schema). */
  private def buildFeed(df: DataFrame, chunks: Int, dir: String): Unit =
    df.repartitionByRange(chunks, col("event_ts"))
      .write.mode("overwrite").parquet(dir)

  private def runDrain(spark: SparkSession, out: DataFrame,
      mode: String, col0: Collector,
      outputMode: String = "append"): Map[String, Any] = {
    val t0 = System.nanoTime()
    val q = out.writeStream
      .format("noop")
      .outputMode(outputMode)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory(s"soak_ckpt_$mode").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val wallSec = (System.nanoTime() - t0) / 1e9
    val ps = col0.synchronized(col0.progresses.toVector)
    Map(
      "mode" -> mode,
      "batches" -> ps.size,
      "input_rows" -> ps.map(_.rows).sum,
      "wall_sec" -> f"$wallSec%.2f",
      "rows_per_sec" -> f"${ps.map(_.rows).sum / wallSec}%.0f",
      "peak_state_rows" -> (if (ps.isEmpty) 0L else ps.map(_.stateRows).max),
      "peak_state_mb" ->
        f"${(if (ps.isEmpty) 0L else ps.map(_.stateBytes).max) / 1048576.0}%.1f",
      "final_watermark" -> ps.lastOption.map(_.watermark).getOrElse(""))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val modes = args.lift(1).getOrElse("curate,neardup,serve").split(',').toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val chunks = sys.env.getOrElse("SPARK_GRAFT_SOAK_CHUNKS", "40").toInt
    val perTrigger = sys.env.getOrElse("SPARK_GRAFT_SOAK_FILES_PER_TRIGGER", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false") // streaming plans
      .config("spark.sql.streaming.stateStore.providerClass",
        sys.env.getOrElse("SPARK_GRAFT_STATE_PROVIDER",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)

    val base = 1700000000000L
    val feedRoot = java.nio.file.Files.createTempDirectory("soak_feed").toString

    def docFeed(): DataFrame = {
      val dir = s"$feedRoot/docs"
      val docs = Tables.load(spark, sfDir, "documents")
        .withColumn("event_ts", timestamp_millis(lit(base) + col("doc_id")))
      buildFeed(docs, chunks, dir)
      spark.readStream.schema(spark.read.parquet(dir).schema)
        .option("maxFilesPerTrigger", perTrigger).parquet(dir)
    }

    def queryFeed(docs: DataFrame, dir: String): DataFrame = {
      val qs = docs.filter(pmod(col("doc_id"), lit(100)) === 0)
        .select(col("doc_id").as("query_id"), col("text"))
        .withColumn("event_ts",
          timestamp_millis(lit(base) + col("query_id")))
      buildFeed(qs, chunks, dir)
      spark.readStream.schema(spark.read.parquet(dir).schema)
        .option("maxFilesPerTrigger", perTrigger).parquet(dir)
    }

    def vecFeed(): DataFrame = {
      val dir = s"$feedRoot/vecs"
      val vecs = Tables.load(spark, sfDir, "embeddings")
        .withColumn("event_ts", timestamp_millis(lit(base) + col("vec_id")))
      buildFeed(vecs, chunks, dir)
      spark.readStream.schema(spark.read.parquet(dir).schema)
        .option("maxFilesPerTrigger", perTrigger).parquet(dir)
    }

    val results = modes.map { mode =>
      val coll = new Collector
      spark.streams.addListener(coll)
      try mode match {
        case "curate" =>
          runDrain(spark, StreamingCuration.streamingCurateDedup(docFeed()),
            mode, coll)
        case "neardup" =>
          runDrain(spark, StreamingCuration.streamingNearDup(docFeed()).toDF(),
            mode, coll)
        case "serve" =>
          // FIXED-K production config: ~64 coarse lists / ~256-entry
          // books regardless of corpus size (the EncodeBench stance)
          val vecs = Tables.load(spark, sfDir, "embeddings")
            .select(col("vec_id"), col("embedding"))
          val n = vecs.count()
          val idx = IvfPqIndex.build(vecs,
            coarseStride = math.max(1, (n / 64).toInt), m = 4, dim = 64,
            bookStride = math.max(1, (n / 256).toInt))
          idx.codes.persist().count() // serve from a materialized table
          try runDrain(spark,
            idx.serveStream(vecFeed(), k = 10, probes = 2), mode, coll)
          finally idx.codes.unpersist()
        case "servef" =>
          // FILTERED serving soak (q_llm_ann_filtered's layout under
          // the fixed-K production config): the label predicate
          // restricts the stream-static join's static side, so the
          // state shape is identical to `serve` and the drain
          // measures the candidate-pruning benefit directly
          val vecs = Tables.load(spark, sfDir, "embeddings")
            .select(col("vec_id"), col("embedding"), col("label"))
          val n = vecs.count()
          val idx = IvfPqIndex.build(vecs,
            coarseStride = math.max(1, (n / 64).toInt), m = 4, dim = 64,
            bookStride = math.max(1, (n / 256).toInt),
            attrs = Seq("label"))
          val filtered = idx.copy(
            codes = idx.codes.filter(col("label") === 1))
          filtered.codes.persist().count()
          try runDrain(spark,
            filtered.serveStream(vecFeed(), k = 10, probes = 2), mode, coll)
          finally filtered.codes.unpersist()
        case "bm25sc" =>
          // SCOPED serving soak (q_llm_bm25_scoped's layout): per-scope
          // postings with in-scope statistics; the scope restricts the
          // static side, state shape identical to `bm25`
          val temps = new graft.llm.TempCache
          val docs = Tables.load(spark, sfDir, "documents")
          val post = graft.llm.Retrieval.scopedPostings(docs, "lang", temps)
            .filter(col("lang") === "en")
            .select(col("term"), col("doc_id"), col("tf"), col("dl"),
              col("df"))
          post.persist().count()
          val stats = graft.llm.Retrieval.scopedStats(docs, "lang")
            .filter(col("lang") === "en")
            .select(col("n_docs"), col("avgdl")).persist()
          stats.count()
          try runDrain(spark, graft.llm.Retrieval.streamingBm25Serve(
            queryFeed(docs, s"$feedRoot/queries_sc"), post, stats, k = 10),
            mode, coll)
          finally { post.unpersist(); stats.unpersist(); temps.release() }
        case "bm25scp" =>
          // the PACKED scoped form — the production configuration
          // (the chained `bm25sc` run confirms the same candidate-
          // proportional state blowup the unscoped chained form has;
          // packing collapses it to one state row per (window, query))
          val temps = new graft.llm.TempCache
          val docs = Tables.load(spark, sfDir, "documents")
          val packed = graft.llm.Retrieval.packPostings(
            graft.llm.Retrieval.scopedPostings(docs, "lang", temps)
              .filter(col("lang") === "en")
              .select(col("term"), col("doc_id"), col("tf"), col("dl"),
                col("df")))
          packed.persist().count()
          val stats = graft.llm.Retrieval.scopedStats(docs, "lang")
            .filter(col("lang") === "en")
            .select(col("n_docs"), col("avgdl")).persist()
          stats.count()
          try runDrain(spark, graft.llm.Retrieval.streamingBm25ServePacked(
            queryFeed(docs, s"$feedRoot/queries_scp"), packed, stats,
            k = 10), mode, coll)
          finally { packed.unpersist(); stats.unpersist(); temps.release() }
        case "bm25scf" =>
          // the PUSHED scoped serving twin (bm25ServeEachBatch): the
          // static side is the STORED lang-partitioned postings
          // artifact — q_llm_bm25_scoped's exact serving state — and
          // each query micro-batch pushes its bounded In(term,…) set
          // into that scan, so per-batch cost tracks the batch's
          // query-term postings instead of re-scanning (and
          // re-shuffling) the whole scope per trigger. The answer to
          // the bm25scp 27→8 q/s drop across sf1→sf10.
          val docs = Tables.load(spark, sfDir, "documents")
          val post = graft.llm.Retrieval.scopedPostStoredOf(spark, sfDir)
            .filter(col("lang") === "en")
            .select(col("term"), col("doc_id"), col("tf"), col("dl"),
              col("df"))
          val stats = graft.llm.Retrieval
            .scopedStatsStoredOf(spark, sfDir)
            .filter(col("lang") === "en")
            .select(col("n_docs"), col("avgdl"))
          val answered = new java.util.concurrent.atomic.AtomicLong
          val batches = new java.util.concurrent.atomic.AtomicLong
          val t0 = System.nanoTime()
          val q = graft.llm.Retrieval.bm25ServeEachBatch(
            queryFeed(docs, s"$feedRoot/queries_scf"), post, stats,
            k = 10,
            checkpoint = java.nio.file.Files
              .createTempDirectory("soak_ckpt_bm25scf").toString) {
            (served, _) =>
              answered.addAndGet(
                served.select(col("query_id")).distinct().count())
              batches.incrementAndGet()
              ()
          }
          q.awaitTermination()
          val wall = (System.nanoTime() - t0) / 1e9
          Map(
            "mode" -> mode,
            "batches" -> batches.get(),
            "queries_answered" -> answered.get(),
            "wall_sec" -> f"$wall%.2f",
            "q_per_sec" -> f"${answered.get() / wall}%.1f",
            "state_rows" -> 0L)
        case "asof" =>
          val dir = s"$feedRoot/events"
          val ev = Tables.events(spark, sfDir)
            .select(col("event_id"), col("user_id"), col("event_type"),
              col("ts_us").as("event_ts"), col("value"))
          buildFeed(ev, chunks, dir)
          def feed(tpe: String): DataFrame =
            spark.readStream.schema(spark.read.parquet(dir).schema)
              .option("maxFilesPerTrigger", perTrigger).parquet(dir)
              .filter(col("event_type") === tpe)
              .select(col("user_id").as("key"), col("event_id").as("id"),
                col("event_ts"), col("value").as("payload"))
          runDrain(spark, graft.streaming.StreamingTemporal
            .streamingAsofJoin(feed("purchase"), feed("error"), "1 hour")
            .toDF(), mode, coll)
        case "bm25" =>
          // temps releases postings' INTERNAL perDocTerms persist too —
          // the noop cache would leak a corpus-sized exploded frame
          // into subsequent modes' memory measurements
          val temps = new graft.llm.TempCache
          val docs = Tables.load(spark, sfDir, "documents")
          val post = graft.llm.Retrieval.postings(docs, temps)
          post.persist().count() // serve from a materialized index
          val stats = graft.llm.Retrieval.corpusStats(docs).persist()
          stats.count()
          try runDrain(spark, graft.llm.Retrieval.streamingBm25Serve(
            queryFeed(docs, s"$feedRoot/queries"), post, stats, k = 10),
            mode, coll)
          finally { post.unpersist(); stats.unpersist(); temps.release() }
        case "bm25p" =>
          // the packed one-state-row-per-query form (SumTopKAgg)
          val temps = new graft.llm.TempCache
          val docs = Tables.load(spark, sfDir, "documents")
          val packed = graft.llm.Retrieval.packPostings(
            graft.llm.Retrieval.postings(docs, temps))
          packed.persist().count()
          val stats = graft.llm.Retrieval.corpusStats(docs).persist()
          stats.count()
          try runDrain(spark, graft.llm.Retrieval.streamingBm25ServePacked(
            queryFeed(docs, s"$feedRoot/queries_p"), packed, stats, k = 10),
            mode, coll)
          finally { packed.unpersist(); stats.unpersist(); temps.release() }
        case "hybrid" =>
          // streaming hybrid search (one-aggregate RRF fusion) over
          // frozen stored state: every 100th doc replayed as a query
          // carrying BOTH its text and its embedding (vec_id = doc_id
          // contract). The lexical side is the packed worst case
          // (stopword-heavy queries scoring tens of thousands of
          // candidates); the semantic side probes 2 IVF lists of the
          // FIXED-K production index. State = one fusion buffer per
          // (window, query) + the qLen-bounded term dedup.
          val temps = new graft.llm.TempCache
          val docs = Tables.load(spark, sfDir, "documents")
          val vecs = Tables.load(spark, sfDir, "embeddings")
            .select(col("vec_id"), col("embedding"))
          val packedPost = graft.llm.Retrieval.packPostings(
            graft.llm.Retrieval.postings(docs, temps))
          packedPost.persist().count()
          val stats = graft.llm.Retrieval.corpusStats(docs).persist()
          stats.count()
          val n = vecs.count()
          val idx = IvfPqIndex.build(vecs,
            coarseStride = math.max(1, (n / 64).toInt), m = 4, dim = 64,
            bookStride = math.max(1, (n / 256).toInt))
          val codes = idx.codes.persist()
          codes.count()
          val dir = s"$feedRoot/hybrid_queries"
          val qs = docs.filter(pmod(col("doc_id"), lit(100)) === 0)
            .join(vecs.withColumnRenamed("vec_id", "doc_id"), Seq("doc_id"))
            .select(col("doc_id").as("query_id"), col("text"),
              col("embedding"))
            .withColumn("event_ts",
              timestamp_millis(lit(base) + col("query_id")))
          buildFeed(qs, chunks, dir)
          val feed = spark.readStream
            .schema(spark.read.parquet(dir).schema)
            .option("maxFilesPerTrigger", perTrigger).parquet(dir)
          try runDrain(spark, graft.llm.Retrieval.streamingRrfFusionServe(
            feed, packedPost, stats, codes, idx.coarse, idx.books,
            m = 4, dim = 64, k = 10, probes = 2), mode, coll)
          finally {
            packedPost.unpersist(); stats.unpersist(); codes.unpersist()
            temps.release()
          }
        case "hybridfb" | "hybridfbmem" | "hybridfbms" =>
          // the ZERO-STATE hybrid twin (rrfFusionServeEachBatch): the
          // corpus-scale serving configuration — batch-complete query
          // micro-batches answered by the batch stored-index servers
          // (term-bucketed segments + materialized IVF-PQ codes),
          // per-doc sums in SPILLABLE hash aggregation, state across
          // batches NONE. The one-buffer `hybrid` mode's fusion state
          // is candidate-proportional per open query and OOMs at sf10
          // (stopword posting lists × 5k queries) — this mode is the
          // measured answer past that point.
          val docs = Tables.load(spark, sfDir, "documents")
          val vecs = Tables.load(spark, sfDir, "embeddings")
            .select(col("vec_id"), col("embedding"))
          val seg0 = graft.llm.Retrieval.servingSegOf(spark, sfDir)
          val stats = graft.llm.Retrieval.corpusStats(docs).persist()
          stats.count()
          val (codes0, coarse, books) =
            graft.llm.Similarity.storedCodesOf(spark, sfDir)
          // `hybridfbmem` = the HOT serving tier: the static sides
          // pinned in executor memory, so each micro-batch scans
          // cached columnar batches (with stats-based batch pruning
          // under the pushed term filter) instead of re-reading the
          // store per trigger — memory traded for per-batch scan cost
          val hot = mode == "hybridfbmem"
          val seg =
            if (!hot) seg0
            else graft.llm.IndexSegments(seg0.postings.persist(),
              seg0.df.persist(), seg0.docIds)
          val codes = if (hot) codes0.persist() else codes0
          if (hot) { seg.postings.count(); seg.df.count(); codes.count() }
          // `hybridfbms` = the MaxScore text half: exact top-k with
          // the Turtle & Flood bound prune off the stored termBounds
          // table — the answer to the adjudicated candidate-volume
          // bound of the exact-unscoped hybrid (VERDICT r13 item 1)
          // the bounds table is vocab-sized serving state: pinned in
          // memory for the life of the server (the production stance),
          // not re-scanned per micro-batch
          val boundsOpt =
            if (mode == "hybridfbms") {
              val b = graft.llm.Retrieval.servingBoundsOf(spark, sfDir)
                .persist()
              b.count()
              Some(b)
            } else None
          val dir = s"$feedRoot/hybridfb_queries"
          val qs = docs.filter(pmod(col("doc_id"), lit(100)) === 0)
            .join(vecs.withColumnRenamed("vec_id", "doc_id"), Seq("doc_id"))
            .select(col("doc_id").as("query_id"), col("text"),
              col("embedding"))
            .withColumn("event_ts",
              timestamp_millis(lit(base) + col("query_id")))
          buildFeed(qs, chunks, dir)
          val feed = spark.readStream
            .schema(spark.read.parquet(dir).schema)
            .option("maxFilesPerTrigger", perTrigger).parquet(dir)
          val answered = new java.util.concurrent.atomic.AtomicLong
          val batches = new java.util.concurrent.atomic.AtomicLong
          val t0 = System.nanoTime()
          val q = graft.llm.Retrieval.rrfFusionServeEachBatch(feed, seg,
            stats, codes, coarse, books, m = 4, dim = 64, k = 10,
            probes = 2,
            checkpoint = java.nio.file.Files
              .createTempDirectory("soak_ckpt_hybridfb").toString,
            boundsOpt = boundsOpt) {
            (fused, _) =>
              answered.addAndGet(
                fused.select(col("query_id")).distinct().count())
              batches.incrementAndGet()
              ()
          }
          q.awaitTermination()
          val wall = (System.nanoTime() - t0) / 1e9
          stats.unpersist()
          // skipped-posting fraction for the MaxScore mode: one
          // representative batch-sized query set re-run through the
          // diagnostic parts AFTER the timed soak (never inside it)
          val skipDiag = boundsOpt.map { bounds =>
            val nq = math.max(1L,
              spark.read.parquet(dir).count() / math.max(1, chunks))
            // batch-sized sample SPANNING the id range (an orderBy
            // + limit would take the lowest ids — one expander
            // replica, not the feed's query mix)
            val diagQt = graft.llm.Retrieval.queryTerms(
              spark.read.parquet(dir)
                .filter(pmod(col("query_id").divide(lit(100)).cast("long"),
                  lit(math.max(1, chunks))) === 0)
                .limit(nq.toInt)
                .select(col("query_id").as("doc_id"), col("text")))
            val temps = new graft.llm.TempCache
            val parts = graft.llm.Retrieval.bm25MaxScoreParts(seg,
              bounds, stats, diagQt, 10, 10000, temps)
            val slice = parts.slice.count()
            val scored = parts.scoredA.count() + parts.scoredB.count()
            temps.release()
            (slice, scored)
          }
          Map(
            "mode" -> mode,
            "batches" -> batches.get(),
            "queries_answered" -> answered.get(),
            "wall_sec" -> f"$wall%.2f",
            "q_per_sec" -> f"${answered.get() / wall}%.1f",
            "state_rows" -> 0L) ++
            skipDiag.map { case (slice, scored) => Map(
              "slice_rows" -> slice,
              "scored_rows" -> scored,
              "skipped_frac" ->
                f"${1.0 - scored.toDouble / math.max(1L, slice)}%.3f")
            }.getOrElse(Map.empty)

        case "refinefb" =>
          // the REFINED per-batch ANN serve (refineServeEachBatch):
          // stored fixed-K codes answer each query micro-batch with
          // an ADC pool of k·refine, then ONLY those candidates
          // re-score exactly against the raw vectors — measures what
          // the exact re-rank adds on top of the `serve` floor at
          // this tier (the candidate-bounded exact pass, one raw
          // scan per batch)
          val vecs = Tables.load(spark, sfDir, "embeddings")
            .select(col("vec_id"), col("embedding"))
          val n = vecs.count()
          val idx = IvfPqIndex.build(vecs,
            coarseStride = math.max(1, (n / 64).toInt), m = 4, dim = 64,
            bookStride = math.max(1, (n / 256).toInt))
          idx.codes.persist().count()
          val dir = s"$feedRoot/refinefb_queries"
          val qs = vecs.filter(pmod(col("vec_id"), lit(100)) === 0)
            .withColumn("event_ts",
              timestamp_millis(lit(base) + col("vec_id")))
          buildFeed(qs, chunks, dir)
          val feed = spark.readStream
            .schema(spark.read.parquet(dir).schema)
            .option("maxFilesPerTrigger", perTrigger).parquet(dir)
          val answered = new java.util.concurrent.atomic.AtomicLong
          val batches = new java.util.concurrent.atomic.AtomicLong
          val t0 = System.nanoTime()
          val q = graft.llm.Similarity.refineServeEachBatch(feed,
            idx.codes, vecs, idx.coarse, idx.books, m = 4, dim = 64,
            k = 10, refine = 3, probes = 2,
            checkpoint = java.nio.file.Files
              .createTempDirectory("soak_ckpt_refinefb").toString) {
            (out, _) =>
              answered.addAndGet(
                out.select(col("q_id")).distinct().count())
              batches.incrementAndGet()
              ()
          }
          q.awaitTermination()
          val wall = (System.nanoTime() - t0) / 1e9
          idx.codes.unpersist()
          Map(
            "mode" -> mode,
            "batches" -> batches.get(),
            "queries_answered" -> answered.get(),
            "wall_sec" -> f"$wall%.2f",
            "q_per_sec" -> f"${answered.get() / wall}%.1f",
            "state_rows" -> 0L)

        case "hybridfbsc" =>
          // the zero-state SCOPED+FILTERED hybrid (q_llm_rrf_fusion_scoped
          // served per micro-batch): the production configuration past
          // the exact-unscoped floor — the text half serves the
          // lang-scoped stored postings with the batch's pushed term
          // set (partition + row-group pruning), the semantic half the
          // label-filtered attribute-embedded code table (pushed
          // attribute filter), fused by the same integer RRF. Both
          // sides prune BEFORE scoring, so candidate volume — the
          // unscoped form's measured bound — is cut at the scan.
          val docs = Tables.load(spark, sfDir, "documents")
          val vecs = Tables.load(spark, sfDir, "embeddings")
            .select(col("vec_id"), col("embedding"))
          val post = graft.llm.Retrieval.scopedPostStoredOf(spark, sfDir)
            .filter(col("lang") === "en")
            .select(col("term"), col("doc_id"), col("tf"), col("dl"),
              col("df"))
          val stats = graft.llm.Retrieval
            .scopedStatsStoredOf(spark, sfDir)
            .filter(col("lang") === "en")
            .select(col("n_docs"), col("avgdl"))
          val (codes, coarse, books) =
            graft.llm.Similarity.storedCodesOf(spark, sfDir)
          val fcodes = codes.filter(col("label") === 1)
          val dir = s"$feedRoot/hybridfbsc_queries"
          val qs = docs.filter(pmod(col("doc_id"), lit(100)) === 0)
            .join(vecs.withColumnRenamed("vec_id", "doc_id"), Seq("doc_id"))
            .select(col("doc_id").as("query_id"), col("text"),
              col("embedding"))
            .withColumn("event_ts",
              timestamp_millis(lit(base) + col("query_id")))
          buildFeed(qs, chunks, dir)
          val feed = spark.readStream
            .schema(spark.read.parquet(dir).schema)
            .option("maxFilesPerTrigger", perTrigger).parquet(dir)
          val answered = new java.util.concurrent.atomic.AtomicLong
          val batches = new java.util.concurrent.atomic.AtomicLong
          val t0 = System.nanoTime()
          val q = feed.writeStream
            .foreachBatch {
              (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                  id: Long) =>
                val qb = b.toDF().dropDuplicates("query_id")
                  .localCheckpoint()
                val text = graft.llm.Retrieval.bm25TopKFromPostingsPushed(
                  post, stats, graft.llm.Retrieval.queryTerms(
                    qb.select(col("query_id").as("doc_id"), col("text"))),
                  k = 10)
                val vec = graft.llm.Similarity.ivfPqTopKFromCodes(fcodes,
                    qb.select(col("query_id").as("vec_id"),
                      col("embedding")),
                    k = 10, coarse, books, m = 4, dim = 64, probes = 2)
                  .select(col("q_id").as("query_id"), col("rank"),
                    col("neighbor_id").as("doc_id"))
                val fused = graft.llm.Retrieval.rrfFuse(text, vec, k = 10)
                answered.addAndGet(
                  fused.select(col("query_id")).distinct().count())
                batches.incrementAndGet()
                ()
            }
            .option("checkpointLocation", java.nio.file.Files
              .createTempDirectory("soak_ckpt_hybridfbsc").toString)
            .trigger(Trigger.AvailableNow())
            .start()
          q.awaitTermination()
          val wall = (System.nanoTime() - t0) / 1e9
          Map(
            "mode" -> mode,
            "batches" -> batches.get(),
            "queries_answered" -> answered.get(),
            "wall_sec" -> f"$wall%.2f",
            "q_per_sec" -> f"${answered.get() / wall}%.1f",
            "state_rows" -> 0L)

        case "nightly" | "nightly5" =>
          // THE combined nightly job (NightlyMaintenance): every
          // micro-batch commits one generation into ALL FOUR index
          // families — BM25 segments, positional, unified, epochal
          // IVF-PQ codes — then spends the shared compaction budget.
          // The soak claim: the fan-out multiplies nightly cost by
          // the family count, never by corpus size, and per-batch
          // wall stays flat as every store accumulates the tier.
          // `nightly5` adds the scoped family (round 12): per-lang
          // segment logs riding the same loop and the same budget.
          import graft.streaming.NightlyMaintenance
          import graft.streaming.NightlyMaintenance.Stores
          val scoped =
            if (mode == "nightly5") Some((s"$feedRoot/n_scoped", "lang"))
            else None
          val stores = Stores(s"$feedRoot/n_bm25", s"$feedRoot/n_pos",
            s"$feedRoot/n_uni", s"$feedRoot/n_codes", scoped)
          val vecs = Tables.load(spark, sfDir, "embeddings")
            .select(col("vec_id"), col("embedding")).persist()
          val nv = vecs.count()
          // quantizer decision is a batch decision: fixed-K train on
          // the tier, epoch 0 opens EMPTY of codes beyond a seed slice
          val (coarse, books) = graft.llm.Similarity.ivfPqTrain(vecs,
            math.max(1, (nv / 64).toInt), m = 4, dim = 64,
            math.max(1, (nv / 256).toInt))
          IvfPqIndex.initEpochal(IvfPqIndex(4, 64, coarse, books,
            graft.llm.Similarity.ivfPqEncode(
              vecs.filter(col("vec_id") < 0), coarse, books, 4, 64)),
            stores.codes)
          val embByDoc = vecs.withColumnRenamed("vec_id", "doc_id")
          val langByDoc = Tables.load(spark, sfDir, "documents")
            .select(col("doc_id"), col("lang")).persist()
          if (scoped.isDefined) langByDoc.count()
          val times = scala.collection.mutable.ArrayBuffer.empty[Double]
          val t0 = System.nanoTime()
          val q = docFeed().select(col("doc_id"), col("text"))
            .writeStream
            .foreachBatch {
              (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                  id: Long) =>
                val withEmb = b.toDF().join(embByDoc, Seq("doc_id"), "left")
                val withAttr =
                  if (scoped.isDefined)
                    withEmb.join(langByDoc, Seq("doc_id"), "left")
                  else withEmb
                val bt = System.nanoTime()
                NightlyMaintenance.nightlyBatch(stores)(withAttr, id)
                times += (System.nanoTime() - bt) / 1e9
                NightlyMaintenance.maybeCompactAll(b.sparkSession,
                  stores, 8)
                ()
            }
            .option("checkpointLocation", java.nio.file.Files
              .createTempDirectory("soak_ckpt_nightly").toString)
            .trigger(Trigger.AvailableNow())
            .start()
          q.awaitTermination()
          val wallSec = (System.nanoTime() - t0) / 1e9
          import graft.streaming.{GenerationLog, IndexMaintenance}
          val uni = IndexMaintenance.read(spark, stores.unified).get
          val docsIndexed = uni.docIds.count()
          val nCodes = IvfPqIndex.loadEpochal(spark, stores.codes)
            .codes.count()
          val ts = times.toVector.sorted
          def tailAmp(r: String): Int =
            GenerationLog.readAmplification(r)
          vecs.unpersist()
          Map(
            "mode" -> mode,
            "batches" -> times.size,
            "docs_indexed" -> docsIndexed,
            "codes_rows" -> nCodes,
            "wall_sec" -> f"$wallSec%.2f",
            "docs_per_sec" -> f"${docsIndexed / wallSec}%.0f",
            "batch_sec_first" -> f"${times.headOption.getOrElse(0.0)}%.2f",
            "batch_sec_median" ->
              f"${if (ts.isEmpty) 0.0 else ts(ts.size / 2)}%.2f",
            "batch_sec_last" -> f"${times.lastOption.getOrElse(0.0)}%.2f",
            "read_amp" -> (Seq(stores.bm25, stores.positional,
              stores.unified,
              IvfPqIndex.activeEpochDir(stores.codes)) ++
              scoped.toSeq.flatMap { case (r, attr) =>
                NightlyMaintenance.scopesOf(r, attr)
                  .map(NightlyMaintenance.scopeDir(r, attr, _))
              }).map(tailAmp).sum)

        case "retrainmid" =>
          // DRIFT → RETRAIN → CUTOVER under the LIVE maintenance loop:
          // the vector feed drains through epochal merges; at the
          // middle batch the drift alarm is forced (alarmFactor = 0 —
          // the real trigger needs organic skew) so retrain + cutover
          // run INSIDE the stream. Around the cutover the soak samples
          // the SERVING path (loadEpochal + fixed ADC query batch):
          // the serving-visible pause is serve_after_cutover minus the
          // pre-cutover serve floor — expected ~zero, because the
          // cutover is ONE atomic marker create and readers simply
          // resolve the new epoch on their next load; the retrain
          // itself blocks only the maintenance loop (merges), never a
          // reader. A pre-cutover epoch-pinned read is re-taken after
          // the cutover and must match byte-for-byte (deferred
          // gcEpochs).
          import graft.streaming.NightlyMaintenance
          val root = s"$feedRoot/retrainmid_codes"
          val vecs = Tables.load(spark, sfDir, "embeddings")
            .select(col("vec_id"), col("embedding")).persist()
          val nv = vecs.count()
          val (coarse, books) = graft.llm.Similarity.ivfPqTrain(vecs,
            math.max(1, (nv / 64).toInt), m = 4, dim = 64,
            math.max(1, (nv / 256).toInt))
          IvfPqIndex.initEpochal(IvfPqIndex(4, 64, coarse, books,
            graft.llm.Similarity.ivfPqEncode(
              vecs.filter(col("vec_id") < 0), coarse, books, 4, 64)),
            root)
          val queries = vecs.filter(pmod(col("vec_id"), lit(1000)) === 0)
            .localCheckpoint()
          def serveSec(): Double = {
            val t = System.nanoTime()
            IvfPqIndex.loadEpochal(spark, root)
              .topK(queries, k = 10, probes = 2).count()
            (System.nanoTime() - t) / 1e9
          }
          val dir = s"$feedRoot/retrainmid_feed"
          buildFeed(vecs.withColumn("event_ts",
            timestamp_millis(lit(base) + col("vec_id"))), chunks, dir)
          val feed = spark.readStream
            .schema(spark.read.parquet(dir).schema)
            .option("maxFilesPerTrigger", perTrigger).parquet(dir)
            .select(col("vec_id"), col("embedding"))
          val nBatches = math.max(1, chunks / perTrigger.toInt)
          val mid = nBatches / 2
          var serveBefore = 0.0
          var serveAfter = 0.0
          var serveAfterWarm = 0.0
          var retrainSec = 0.0
          var pinStable = false
          val mergeTimes =
            scala.collection.mutable.ArrayBuffer.empty[Double]
          val t0 = System.nanoTime()
          val q = feed.writeStream
            .foreachBatch {
              (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                  id: Long) =>
                val bt = System.nanoTime()
                IvfPqIndex.mergeEpochal(root)(b.toDF(), id)
                mergeTimes += (System.nanoTime() - bt) / 1e9
                if (id == mid) {
                  serveBefore = serveSec()
                  val preEpoch = IvfPqIndex.committedEpochs(root).last
                  val preDir = IvfPqIndex.epochDir(root, preEpoch)
                  val pinCount = IvfPqIndex
                    .loadMaintained(spark, preDir).codes.count()
                  val rt = System.nanoTime()
                  val accumulated = vecs.join(
                    IvfPqIndex.loadEpochal(spark, root).codes
                      .select(col("vec_id")), Seq("vec_id"))
                  IvfPqIndex.retrain(spark, root, accumulated,
                    coarseStride = math.max(1, (nv / 64).toInt),
                    bookStride = math.max(1, (nv / 256).toInt))
                  retrainSec = (System.nanoTime() - rt) / 1e9
                  serveAfter = serveSec()
                  serveAfterWarm = serveSec()
                  pinStable = IvfPqIndex.loadMaintained(spark, preDir)
                    .codes.count() == pinCount
                }
                ()
            }
            .option("checkpointLocation", java.nio.file.Files
              .createTempDirectory("soak_ckpt_retrainmid").toString)
            .trigger(Trigger.AvailableNow())
            .start()
          q.awaitTermination()
          val wallSec = (System.nanoTime() - t0) / 1e9
          val codesN = IvfPqIndex.loadEpochal(spark, root).codes.count()
          vecs.unpersist()
          Map(
            "mode" -> mode,
            "batches" -> mergeTimes.size,
            "codes_rows" -> codesN,
            "epochs" -> IvfPqIndex.committedEpochs(root).size,
            "wall_sec" -> f"$wallSec%.2f",
            "merge_sec_median" -> f"${mergeTimes.sorted.apply(
              mergeTimes.size / 2)}%.2f",
            "retrain_sec" -> f"$retrainSec%.2f",
            "serve_before_cutover_sec" -> f"$serveBefore%.2f",
            "serve_after_cutover_sec" -> f"$serveAfter%.2f",
            "serve_after_cutover_warm_sec" -> f"$serveAfterWarm%.2f",
            "retired_epoch_pin_stable" -> pinStable)

        case "scopesN" =>
          // SCOPE-EXPLOSION soak: mergeScopedBatch alone, driven over
          // a synthetic N-value attribute (pmod(doc_id, N)) so the
          // scope count is a dial — SPARK_GRAFT_SOAK_SCOPES (default
          // 20) and SPARK_GRAFT_SOAK_SCOPE_PAR (merge parallelism,
          // default 8). The claim: per-batch cost is SUBLINEAR in
          // scope count because the per-scope merges are independent
          // roots running concurrently — compare N=5 vs N=20 rows at
          // the same tier. Timings bracket mergeScopedBatch itself.
          import graft.streaming.NightlyMaintenance
          val nScopes = sys.env.getOrElse(
            "SPARK_GRAFT_SOAK_SCOPES", "20").toInt
          val scopePar = sys.env.getOrElse(
            "SPARK_GRAFT_SOAK_SCOPE_PAR", "8").toInt
          // "partitioned" = the round-14 batched write set (constant
          // job count at any scope width) vs the pooled per-scope jobs
          val scopeMode = sys.env.getOrElse(
            "SPARK_GRAFT_SOAK_SCOPE_MODE", "pooled")
          val root = s"$feedRoot/scopesN_root"
          val times = scala.collection.mutable.ArrayBuffer.empty[Double]
          val t0 = System.nanoTime()
          val q = docFeed()
            .select(col("doc_id"), col("text"),
              pmod(col("doc_id"), lit(nScopes)).cast("string").as("scope"))
            .writeStream
            .foreachBatch {
              (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                  id: Long) =>
                val bt = System.nanoTime()
                if (scopeMode == "partitioned")
                  NightlyMaintenance.mergeScopedBatchPartitioned(
                    root, "scope")(b.toDF(), id)
                else NightlyMaintenance.mergeScopedBatch(root, "scope",
                  scopeParallelism = scopePar)(b.toDF(), id)
                times += (System.nanoTime() - bt) / 1e9
                ()
            }
            .option("checkpointLocation", java.nio.file.Files
              .createTempDirectory("soak_ckpt_scopesN").toString)
            .trigger(Trigger.AvailableNow())
            .start()
          q.awaitTermination()
          val wallSec = (System.nanoTime() - t0) / 1e9
          val scopes = NightlyMaintenance.scopesOf(root, "scope")
          val docsIndexed = scopes.map(v =>
            NightlyMaintenance.readScope(spark, root, "scope", v)
              .get.docIds.count()).sum
          val ts = times.toVector.sorted
          Map(
            "mode" -> mode,
            "scopes" -> scopes.size,
            "scope_par" -> scopePar,
            "scope_mode" -> scopeMode,
            "batches" -> times.size,
            "docs_indexed" -> docsIndexed,
            "wall_sec" -> f"$wallSec%.2f",
            "docs_per_sec" -> f"${docsIndexed / wallSec}%.0f",
            "batch_sec_first" -> f"${times.headOption.getOrElse(0.0)}%.2f",
            "batch_sec_median" ->
              f"${if (ts.isEmpty) 0.0 else ts(ts.size / 2)}%.2f",
            "batch_sec_last" -> f"${times.lastOption.getOrElse(0.0)}%.2f")

        case "idxmaint" =>
          // nightly index maintenance under the replayed feed: one
          // committed generation per micro-batch on RocksDB-era
          // bounded batches, auto-compaction past 4 tail generations.
          // The soak claim is the MERGE ECONOMICS: per-batch merge
          // wall time must stay flat as the stored index accumulates
          // the whole tier (the write set is delta + vocab + manifest
          // sized — never O(index)), and compaction bounds read
          // amplification. Per-batch timings are measured around
          // mergeBatch itself.
          import graft.streaming.IndexMaintenance
          val root = s"$feedRoot/idxmaint_root"
          val times = scala.collection.mutable.ArrayBuffer.empty[Double]
          val t0 = System.nanoTime()
          val q = docFeed().select(col("doc_id"), col("text"))
            .writeStream
            .foreachBatch {
              (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                  id: Long) =>
                val bt = System.nanoTime()
                IndexMaintenance.mergeBatch(root)(b.toDF(), id)
                times += (System.nanoTime() - bt) / 1e9
                IndexMaintenance.maybeCompact(b.sparkSession, root, 4)
            }
            .option("checkpointLocation", java.nio.file.Files
              .createTempDirectory("soak_ckpt_idxmaint").toString)
            .trigger(Trigger.AvailableNow())
            .start()
          q.awaitTermination()
          val wallSec = (System.nanoTime() - t0) / 1e9
          val seg = IndexMaintenance.read(spark, root).get
          val docsIndexed = seg.docIds.count()
          val postings = seg.postings.count()
          val ts = times.toVector.sorted
          Map(
            "mode" -> mode,
            "batches" -> times.size,
            "docs_indexed" -> docsIndexed,
            "postings_rows" -> postings,
            "wall_sec" -> f"$wallSec%.2f",
            "docs_per_sec" -> f"${docsIndexed / wallSec}%.0f",
            "merge_sec_first" -> f"${times.headOption.getOrElse(0.0)}%.2f",
            "merge_sec_median" ->
              f"${if (ts.isEmpty) 0.0 else ts(ts.size / 2)}%.2f",
            "merge_sec_last" -> f"${times.lastOption.getOrElse(0.0)}%.2f",
            "read_amplification" ->
              graft.streaming.GenerationLog.readAmplification(root),
            "committed_gens" ->
              IndexMaintenance.committedGens(root).size,
            "committed_cgens" ->
              IndexMaintenance.committedCgens(root).size)
        case "hh" =>
          // complete-mode sketch aggregation: state is the ONE summary
          runDrain(spark, StreamingCuration.streamingHeavyHitters(docFeed()),
            mode, coll, outputMode = "complete")
        case "hhw" =>
          // append-mode windowed sketch: the feed's event time spans
          // ~55 s (doc_id ms), so 10 s windows give a handful of open
          // summaries at any moment, closed as the watermark advances
          runDrain(spark, StreamingCuration.streamingHeavyHittersWindowed(
            docFeed(), windowLen = "10 seconds", watermark = "5 seconds"),
            mode, coll)
        case other => Map[String, Any]("mode" -> other, "err" -> "unknown mode")
      } finally spark.streams.removeListener(coll)
    }
    results.foreach { r =>
      println(r.map { case (k, v) => s""""$k":"$v"""" }
        .mkString("{", ",", "}"))
    }
    spark.stop()
  }
}

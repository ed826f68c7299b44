package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** End-to-end curation pass over real testdata: stage counts narrow
  * monotonically, planted artifacts are removed by the right stage,
  * and the whole pass is rerun-deterministic. */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("curate: monotone stage narrowing, rerun-identical output on sf0.001") {
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val benchmark = docs.filter(col("doc_id") < 10)
      .select(col("doc_id"), col("text"))
    // pin the audit cost: the four stage counts must ride observe()
    // metrics on ONE materialization (a single noop save) — never a
    // .count() action per stage re-executing the upstream lineage
    // CopyOnWriteArrayList: the listener-bus thread appends while the
    // poll below iterates — synchronizedList iteration would need the
    // monitor held and risks ConcurrentModificationException
    val actions = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = actions.add(funcName)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    val (out, counts) = try {
      val r = Pipeline.curateWithCounts(docs, benchmark)
      val deadline = System.currentTimeMillis + 15000
      import scala.jdk.CollectionConverters._
      // the V2 noop write surfaces as "overwrite" ("save" on the V1 path)
      def isSave(a: String) = a == "save" || a == "overwrite"
      while (!actions.asScala.exists(isSave) &&
        System.currentTimeMillis < deadline) Thread.sleep(50)
      assert(actions.asScala.count(isSave) == 1,
        s"audit counts must ride one noop save: $actions")
      assert(!actions.asScala.contains("count"),
        s"no per-stage count action may re-execute the pipeline: $actions")
      r
    } finally spark.listenerManager.unregister(listener)
    assert(counts("input") >= counts("gated"))
    assert(counts("gated") >= counts("deduped"))
    assert(counts("deduped") >= counts("decontaminated"))
    assert(counts("decontaminated") > 0, counts.toString)
    // the benchmark docs themselves are corpus members sharing all
    // their 8-grams → decontamination must have removed something
    assert(counts("decontaminated") < counts("deduped"), counts.toString)
    assert(out.columns.contains("split"))
    // the returned frame is persisted by contract: the caller's sink
    // reads materialized blocks, not a re-execution of the lineage
    assert(out.storageLevel != org.apache.spark.storage.StorageLevel.NONE,
      "curateWithCounts must return a persisted frame")
    val a = out.select(col("doc_id"), col("split")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Pipeline.curate(docs.repartition(11), benchmark)
      .select(col("doc_id"), col("split")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b, "the pass must be content-deterministic")
    out.unpersist() // don't leak the cached spine into later tests
  }

  test("curateWithImportance shares ONE corpus pair frame across gate + importance") {
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val benchmark = docs.filter(col("doc_id") < 10)
      .select(col("doc_id"), col("text"))
    val tgt = col("source") === "src1"
    // independent runs: each pass persists (and registers) its own
    // pair frame — registration happens at plan-construction time, so
    // TempCache size IS the persist count for the pass
    val tCur = new TempCache
    val curAlone = Pipeline.curate(docs, benchmark, temps = tCur)
    val aCur = curAlone.select(col("doc_id"), col("split")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val nCur = tCur.size
    val tImp = new TempCache
    val cleaned = docs.withColumn("text", Curation.normalize(col("text")))
    val impAlone = TextAnalysis.importanceScore(cleaned,
      cleaned.filter(tgt), temps = tImp)
    val aImp = impAlone.select(col("doc_id"), col("importance")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nImp = tImp.size
    tCur.release(); tImp.release()
    // composed: exactly ONE fewer registered persist — the shared
    // corpus pair frame
    val tBoth = new TempCache
    val (cur, imp) = Pipeline.curateWithImportance(docs, benchmark, tgt,
      temps = tBoth)
    val curRows = cur.select(col("doc_id"), col("split")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val impRows = imp.select(col("doc_id"), col("importance")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tBoth.size == nCur + nImp - 1,
      s"composed run must persist exactly one fewer frame " +
        s"(shared pairs): ${tBoth.size} != $nCur + $nImp - 1")
    // and sharing must not change either result
    assert(curRows == aCur, "curation result must be share-invariant")
    assert(impRows == aImp, "importance result must be share-invariant")
    tBoth.release()
  }

  test("curate survivor policy: keep-best swaps survivors, not cluster structure") {
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val benchmark = docs.filter(col("doc_id") < 0) // empty: isolate dedup
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val minId = ids(Pipeline.curate(docs, benchmark))
    val best = ids(Pipeline.curate(docs, benchmark,
      survivorScore = Some(length(col("text")))))
    // one survivor per cluster either way: the assignment is shared,
    // only the representative changes
    assert(minId.size == best.size,
      s"policy must not change the survivor count: ${minId.size} vs ${best.size}")
    // and keep-best genuinely picks by score: sf0.001's near-dup
    // clusters include at least one whose longest member is not its
    // min id, so the survivor sets must differ (a degenerate all-
    // singleton fixture would pass policy-equal and fail here loudly)
    assert(minId != best, "expected keep-best to pick different survivors")
  }

  test("incrementalRules == full recompute on the new snapshot, exactly") {
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val v1 = docs.filter(col("doc_id") < 40)
    // v2: drops 0-9, keeps 10-39 (5 of them edited), adds 40-49
    val v2 = docs.filter(col("doc_id") >= 10 && col("doc_id") < 50)
      .withColumn("text",
        when(col("doc_id") % 7 === 0, concat(col("text"), lit(" edited")))
          .otherwise(col("text")))
    val oldVerdicts = TextAnalysis.qualityRules(v1)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4),
          r.getBoolean(5))).toMap
    val inc = key(Pipeline.incrementalRules(v1, v2, oldVerdicts))
    val full = key(TextAnalysis.qualityRules(v2))
    assert(inc == full, "incremental must equal the full recompute")
    // and it really is incremental: only the added/changed slice scores
    val diff = Curation.corpusDiff(v1, v2)
    val rescored = diff.filter(col("status").isin("added", "changed")).count()
    assert(rescored < v2.count(), s"only $rescored of ${v2.count()} rescored")
  }

  test("curate: each stage drops its own planted artifact") {
    val fluent = "the a " + (1 to 40).map(i => s"w$i").mkString(" ")
    val near = fluent.replace(" w20 ", " changed ") // J ≈ 0.86 vs fluent
    val docs = Seq(
      (1L, "web", "en", fluent),
      (2L, "web", "en", near),       // near-dup of 1 → dedup drops one
      (3L, "web", "en", "x"),        // gate drops (short)
      (4L, "web", "en", "the secret benchmark passage appears here " +
        "word for word exactly as published in the eval suite today")
    ).toDF("doc_id", "source", "lang", "text")
    val benchmark = Seq((99L, "the secret benchmark passage appears here " +
      "word for word exactly as published in the eval suite today"))
      .toDF("doc_id", "text")
    val kept = Pipeline.curate(docs, benchmark, lmThresholdPpm = 1L)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(!kept.contains(3L), "gate must drop the short doc")
    assert(!kept.contains(4L), "decontamination must drop the benchmark hit")
    assert(kept.intersect(Set(1L, 2L)).size == 1,
      s"dedup keeps exactly one of the near-dup pair: $kept")
  }

  test("curateEmb: each embedding stage narrows the curated survivors, attrs join back") {
    graft.functions.GraftFunctions.register(spark)
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val embeddings = graft.Tables.load(spark, sf0001, "embeddings")
    val benchmark = docs.filter(col("doc_id") < 10)
      .select(col("doc_id"), col("text"))
    val temps = new TempCache
    val curated = Pipeline.curate(docs, benchmark,
        shingleKernel = "graft_shingle_hashes_md5")
      .select(col("doc_id"), col("split")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = Pipeline.curateEmb(docs, embeddings, benchmark,
        temps = temps, shingleKernel = "graft_shingle_hashes_md5")
      .collect()
    temps.release(blocking = true)
    val outIds = out.map(_.getLong(0)).toSet
    // embedding stages only ever NARROW the text-curated set
    assert(outIds.subsetOf(curated.keySet), "semantic stages must not resurrect docs")
    assert(out.nonEmpty && outIds.size < curated.size,
      s"semdedup+diversify must drop something: ${outIds.size} of ${curated.size}")
    // split/source attributes survive the join-back unchanged
    out.foreach { r =>
      assert(r.getString(2) == curated(r.getLong(0)), s"split drift on ${r.getLong(0)}")
      assert(r.getString(1) != null && r.getString(1).nonEmpty, "source join-back")
    }
    // assignments point at stride-rule centroids (the centroid itself
    // may legitimately be pruned as its own cluster's most-prototypical)
    val cids = out.map(_.getLong(3)).toSet
    assert(cids.forall(_ % 100 == 0), s"centroids follow the stride rule: $cids")
  }

  test("curateRel == curate AT the corpus-median threshold; non-vacuous " +
    "where the fixed floor would be") {
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val benchmark = docs.filter(col("doc_id") < 10)
      .select(col("doc_id"), col("text"))
    // the relative gate's threshold over the NORMALIZED corpus (the
    // composition normalizes before gating)
    val cleaned = docs.withColumn("text",
      Curation.normalize(col("text")))
    val scores = TextAnalysis.lmScore(cleaned)
      .select(col("mean_score")).collect().map(_.getLong(0)).sorted
    val median = scores((math.ceil(0.5 * scores.length) - 1).toInt)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), col("source"), col("split"))
        .orderBy(col("doc_id")).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val rel = rows(Pipeline.curateRel(docs, benchmark))
    assert(rel.nonEmpty, "median-floor curate must keep documents")
    val fixedAtMedian = rows(Pipeline.curate(docs, benchmark,
      lmThresholdPpm = median))
    assert(rel == fixedAtMedian,
      "curateRel must equal curate at the computed median threshold")
  }
}

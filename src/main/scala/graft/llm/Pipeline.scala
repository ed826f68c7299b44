package graft.llm

import org.apache.spark.sql.DataFrame
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
  * decides to (the MinHash signature cache inside minhashPairs is the
  * deliberate exception).
  *
  * Scale shape: inherits each operator's documented shape (SCALE.md
  * §2); nothing here adds a shuffle beyond the stages' own — the
  * gate verdict and keep-list joins are doc_id-keyed semi/anti joins
  * against frames far smaller than the corpus.
  */
object Pipeline {

  /** Run the full pass. `benchmark` is the eval suite to decontaminate
    * against (pass an empty frame to skip). Returns the curated corpus
    * with a `split` column; per-stage surviving counts are observable
    * via [[curateWithCounts]]. */
  def curate(docs: DataFrame, benchmark: DataFrame,
      lmThresholdPpm: Long = 34000L): DataFrame = {
    val cleaned = docs.withColumn("text", Curation.normalize(col("text")))
    val gate = TextAnalysis.qualityGate(cleaned, lmThresholdPpm)
      .filter(col("keep")).select(col("doc_id"))
    val gated = cleaned.join(gate, Seq("doc_id"), "left_semi")
    val deduped = TextDedup.dedupKeepList(gated, TextDedup.minhashPairs(gated))
    val contaminated = TextDedup.contamination(deduped, benchmark)
      .select(col("doc_id"))
    val clean = deduped.join(contaminated, Seq("doc_id"), "left_anti")
    clean.withColumn("split", Curation.splitByHash(col("text")))
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

  /** The same pass with per-stage survivor counts (one extra count
    * job per stage — the audit numbers a data card publishes). */
  def curateWithCounts(docs: DataFrame, benchmark: DataFrame,
      lmThresholdPpm: Long = 34000L): (DataFrame, Map[String, Long]) = {
    val cleaned = docs.withColumn("text", Curation.normalize(col("text")))
    val gate = TextAnalysis.qualityGate(cleaned, lmThresholdPpm)
      .filter(col("keep")).select(col("doc_id"))
    val gated = cleaned.join(gate, Seq("doc_id"), "left_semi")
    val deduped = TextDedup.dedupKeepList(gated, TextDedup.minhashPairs(gated))
    val contaminated = TextDedup.contamination(deduped, benchmark)
      .select(col("doc_id"))
    val clean = deduped.join(contaminated, Seq("doc_id"), "left_anti")
      .withColumn("split", Curation.splitByHash(col("text")))
    val counts = Map(
      "input" -> docs.count(),
      "gated" -> gated.count(),
      "deduped" -> deduped.count(),
      "decontaminated" -> clean.count())
    (clean, counts)
  }
}

package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Consolidated release data card — the document a dataset release
  * ships with, assembled from the individually oracle'd card queries:
  *
  *   runMain graft.tools.DataCard /root/testdata/sf0.01 [out.md]
  *
  * Each section IS a declared query (`SparkEntry.queries`), so every
  * number on the card is a value the DuckDB oracle hash-checks at
  * sf0.01 — the card can't drift from the verified operators. Output
  * is GitHub markdown to stdout (and optionally a file).
  *
  * Sections are k-row aggregates (sources × splits × signals), so the
  * collect here is the legitimate driver-side display of tiny frames
  * (the Cli.scala stance) — the heavy lifting stays distributed inside
  * each query's own documented plan shape.
  */
object DataCard {

  /** (section title, qid, one-line caption) in report order. */
  private val sections: Seq[(String, String, String)] = Seq(
    ("Release manifest", "q_llm_manifest",
      "doc count, char volume, and an order-independent content checksum per (split, source) — two releases match iff manifests match"),
    ("Source composition", "q_llm_source_report",
      "docs, exact token sums, distinct texts, exact-dup rate per source in one scan"),
    ("Quality gate pass rates", "q_llm_quality_card",
      "ppm pass rate of each gate signal (rules / repetition / LM fluency) per source"),
    ("Length distribution", "q_llm_len_percentiles",
      "exact nearest-rank p50/p90/p99 token counts per source"),
    ("Near-dup cluster histogram", "q_llm_dedup_stats",
      "cluster-size histogram of the near-dup graph — the mega-cluster early warning"),
    ("Dedup impact", "q_llm_dedup_impact",
      "docs AND tokens retained by the keep-list per source (token-weighted: long duplicates dominate)"),
    ("PII incidence", "q_llm_pii_report",
      "docs with email / long-number hits, total hits, ppm of PII-bearing docs per source"),
    ("Tokenizer fertility", "q_llm_fertility",
      "BPE pieces per million chars per source under the trained merge table"),
    ("Topic clusters vs sources", "q_llm_cluster_card",
      "per embedding cluster: doc count + dominant source with exact ppm share"),
    ("ANN index health", "q_llm_ivf_stats",
      "per-IVF-list occupancy — a skewed quantizer turns few-probe serving into a near-exhaustive scan"),
    ("Text index health", "q_llm_index_stats",
      "per-source postings rows, exact token totals, vocabulary size, and the vocab-to-postings ppm ratio — the broadcast-vs-co-bucket decision input and the boilerplate-degeneracy alarm"),
    ("Dominant n-grams (boilerplate watch)", "q_llm_heavy_hitters",
      "top-20 corpus trigrams with exact-in-regime counts from the bounded Misra-Gries sketch — the 'what template is flooding the corpus' feed"),
    ("Relative quality gate pass rates", "q_llm_quality_card_rel",
      "per-source pass rates under the corpus-median fluency floor — the tier-robust view (the fixed floor's lm column reads 0 across the board at expanded tiers)"),
    ("Retrieval quality (BM25 eval card)", "q_llm_retrieval_eval",
      "tier-fixed BM25 top-10 scored against exact-phrase relevance: hits@k, first relevant rank, reciprocal rank in integer ppm per query"),
    ("Learned language-ID confusion matrix", "q_llm_clf_confusion",
      "exact doc counts per (true label, predicted class) for the in-plan-trained multiclass perceptron — the shipped-classifier eval artifact"),
    ("Multimodal media card", "q_llm_mm_card",
      "per-mime rows, decode-ok counts, and geometry totals from ONE dispatching codec pass over the mixed-format corpus — the 'is the media column healthy' feed"))

  /** Pipes and newlines in cell values would split/break the markdown
    * row — escape them so the table stays well-formed whatever the
    * query emits. */
  private def cell(v: Any): String =
    String.valueOf(v).replace("|", "\\|").replace("\n", " ").replace("\r", " ")

  private def renderTable(df: DataFrame, maxRows: Int): String = {
    val cols = df.columns.toSeq
    val rows = df.limit(maxRows + 1).collect()
    val shown = rows.take(maxRows)
    val header = cols.map(cell).mkString("| ", " | ", " |")
    val rule = cols.map(_ => "---").mkString("| ", " | ", " |")
    val body = shown.map(r =>
      cols.indices.map(i => cell(r.get(i))).mkString("| ", " | ", " |"))
    val more = if (rows.length > maxRows) s"\n_…truncated at $maxRows rows_" else ""
    (header +: rule +: body).mkString("\n") + more
  }

  /** The two tables every section reads. With `shareScans` (default),
    * each is persisted ONCE up front; Spark's CacheManager then
    * substitutes the cached relation into every section plan that
    * contains the same analyzed scan — 10 sections cost ONE parquet
    * read of each table instead of ~10 (cache matching happens on the
    * analyzed plan, before column pruning, so every section hits
    * whatever columns it projects). Sections stay byte-identical to
    * their standalone oracle'd forms — caching substitutes storage,
    * never semantics (DataCardSpec pins equality with shareScans off).
    * The trade is deliberate and card-local: a cached full-width scan
    * forfeits per-query parquet column pruning, the right exchange
    * when 10 queries read the same corpus back-to-back. */
  private val sharedTables = Seq("documents", "embeddings")

  def render(spark: SparkSession, sfDir: String, maxRows: Int = 30,
      shareScans: Boolean = true): String = {
    val qs = graft.SparkEntry.queries // build the spec inventory ONCE
    val temps = new graft.llm.TempCache
    if (shareScans) sharedTables.foreach { t =>
      temps.register(graft.Tables.load(spark, sfDir, t)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    }
    try {
      val parts = sections.map { case (title, qid, caption) =>
        val body =
          try renderTable(qs(qid)(spark, sfDir), maxRows)
          // NonFatal only: a section degrades to a footnote, but an OOM
          // or interrupt must not masquerade as one bad section; toString
          // keeps the exception identity (getMessage is often null)
          catch { case scala.util.control.NonFatal(e) => s"_section failed: $e _" }
        s"## $title\n\n$caption (`$qid`).\n\n$body\n"
      }
      s"# Dataset release card\n\nCorpus: `$sfDir`\n\n" + parts.mkString("\n")
    } finally {
      // frees the shared scans AND every section's internal noop-cache
      // persist (they accumulate across sections by design — released
      // here in one sweep rather than per-section, which would also
      // evict the shared scans between sections)
      temps.release()
      spark.catalog.clearCache()
      // clearCache only empties the CacheManager; the CC sections'
      // terminal localCheckpoint RDDs (TextDedup.connectedComponents
      // returns a checkpointed frame) live outside it and would
      // otherwise outlast the card — nothing re-reads them once the
      // sections are rendered
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val card = render(spark, sfDir)
    println(card)
    args.drop(1).headOption.foreach { out =>
      java.nio.file.Files.write(java.nio.file.Paths.get(out),
        card.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    spark.stop()
  }
}

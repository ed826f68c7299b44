package graft.tools

import graft.SparkSpec

/** The consolidated release card must render every section from its
  * declared (oracle'd) query and degrade per-section, not fail whole. */
class DataCardSpec extends SparkSpec {

  test("render emits every section as a markdown table over sf0.001") {
    val card = DataCard.render(spark, sf0001, maxRows = 5)
    assert(card.startsWith("# Dataset release card"))
    for (title <- Seq("Release manifest", "Source composition",
        "Quality gate pass rates", "Length distribution",
        "Near-dup cluster histogram", "Dedup impact", "PII incidence",
        "Tokenizer fertility", "Topic clusters vs sources",
        "ANN index health", "Text index health",
        "Retrieval quality (BM25 eval card)",
        "Learned language-ID confusion matrix")) {
      assert(card.contains(s"## $title"), s"missing section: $title")
    }
    assert(!card.contains("_section failed"),
      card.linesIterator.filter(_.contains("_section failed")).mkString("\n"))
    // every section renders an actual table (header + rule + >= 1 row)
    val tables = card.split("\n## ").drop(1)
    tables.foreach { sec =>
      val rows = sec.linesIterator.count(_.startsWith("| "))
      assert(rows >= 3, s"section too thin:\n${sec.take(200)}")
    }
    // truncation marker honored at tiny maxRows
    val tiny = DataCard.render(spark, sf0001, maxRows = 1)
    assert(tiny.contains("_…truncated at 1 rows_"))
  }

  test("shared-scan card is byte-identical to the per-section form and leaks nothing") {
    val shared = DataCard.render(spark, sf0001, maxRows = 5)
    val isolated = DataCard.render(spark, sf0001, maxRows = 5, shareScans = false)
    assert(shared == isolated,
      "caching must substitute storage, never change a section's bytes")
    // both paths release every persisted frame (shared scans AND the
    // sections' internal noop-cache persists)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty, "cache leak")
  }

  test("section plans actually read the shared cached scan (CacheManager substitution)") {
    val docs = graft.Tables.load(spark, sf0001, "documents")
    docs.persist()
    try {
      val plan = graft.SparkEntry.queries("q_llm_manifest")(spark, sf0001)
        .queryExecution.executedPlan.toString
      assert(plan.contains("InMemoryTableScan"),
        s"section did not substitute the cached documents scan:\n${plan.take(500)}")
    } finally { docs.unpersist(); spark.catalog.clearCache() }
  }
}

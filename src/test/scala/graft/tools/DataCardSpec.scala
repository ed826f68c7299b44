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
        "ANN index health")) {
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
}

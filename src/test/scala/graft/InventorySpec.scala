package graft

import org.apache.spark.sql.functions._

/** Contract checks for every declared query (SURVEY.md §7.3): runs at
  * sf0.001, returns rows, and (for oracle'd queries) its column names
  * are exactly the SQL's projected aliases — the driver hash-compares
  * on name-sorted columns, so a drift here is an automatic mismatch.
  */
class InventorySpec extends SparkSpec {

  test("entry smoke: flagship rollup returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("specs are uniquely named and oracle keys are a subset") {
    val names = SparkEntry.specs.map(_.name)
    assert(names.distinct.size == names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  for (spec <- SparkEntry.specs) {
    test(s"${spec.name} runs at sf0.001 and is deterministic") {
      val df1 = spec.fn(spark, sf0001)
      val rows1 = df1.collect()
      assert(rows1.nonEmpty, s"${spec.name} returned no rows")
      // re-run: identical results (ordering included)
      val rows2 = spec.fn(spark, sf0001).collect()
      assert(rows1.sameElements(rows2), s"${spec.name} not deterministic across runs")
    }
  }
}

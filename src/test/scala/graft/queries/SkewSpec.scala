package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The salted operators must produce exactly what their direct
  * (skew-exposed) forms produce, on data with a planted hot key.
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  // hot key "h" owns 90% of rows; values repeat to exercise dedup
  private lazy val skewed = {
    val hot = (0 until 900).map(i => ("h", s"v${i % 37}", i))
    val cold = (0 until 100).map(i => (s"k${i % 7}", s"v${i % 11}", i))
    (hot ++ cold).toDF("key", "value", "ord")
  }

  test("saltedCollectSet equals direct sort_array(collect_set)") {
    val direct = skewed.groupBy($"key")
      .agg(sort_array(collect_set($"value")).as("values"))
    val salted = Skew.saltedCollectSet(skewed, Seq($"key"), $"value", buckets = 8)
    assert(salted.join(direct.withColumnRenamed("values", "expect"), "key")
      .filter($"values" =!= $"expect").count() == 0L)
    assert(salted.count() == direct.count())
  }

  test("distinctCountByPair equals direct countDistinct") {
    val direct = skewed.groupBy($"key")
      .agg(countDistinct($"value").as("expect"))
    val got = Skew.distinctCountByPair(skewed, Seq($"key"), $"value")
    assert(got.join(direct, "key")
      .filter($"n_distinct" =!= $"expect").count() == 0L)
  }

  test("saltedTopK equals direct row_number top-k") {
    // total order per key: (ord, value) is unique within the data
    val order = Seq($"ord".asc, $"value".asc)
    val w = Window.partitionBy($"key").orderBy(order: _*)
    val direct = skewed
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 5)
      .select($"key", $"rank", $"value", $"ord")
    val salted = Skew.saltedTopK(skewed, Seq($"key"), order, k = 5, buckets = 8)
      .select($"key", $"rank", $"value", $"ord")
    assert(salted.count() == direct.count())
    assert(salted.except(direct).count() == 0L)
    assert(direct.except(salted).count() == 0L)
    // the third posture: bounded aggregate, same answer
    val agg = Skew.aggTopK(skewed, Seq($"key"),
        struct($"ord", $"value"), k = 5)
      .select($"key", $"rank", $"__t.value".as("value"), $"__t.ord".as("ord"))
    assert(agg.count() == direct.count())
    assert(agg.except(direct).count() == 0L)
    assert(direct.except(agg).count() == 0L)
  }
}

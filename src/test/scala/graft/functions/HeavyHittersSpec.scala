package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Misra-Gries heavy-hitters aggregate: exactness regime, bound
  * properties under overflow, merge/partitioning invariance, and the
  * declared-query path over the testdata documents. */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def registered = { GraftFunctions.register(spark); spark }

  test("exact regime equals groupBy count, invariant to partitioning") {
    registered
    val words = Seq.tabulate(500)(i => s"w${i % 23}") ++ Seq.fill(40)("hot")
    val expected = words.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (w, c) => (-c, w) }.take(10)
    for (parts <- Seq(1, 3, 8)) {
      val got = words.toDF("w").repartition(parts)
        .agg(expr("graft_heavy_hitters(w, 64, 10)").as("hh"))
        .select(explode($"hh").as("e"))
        .select($"e.item", $"e.cnt", $"e.max_err")
        .as[(String, Long, Long)].collect().toSeq
      assert(got.map(t => (t._1, t._2)) === expected, s"parts=$parts")
      assert(got.forall(_._3 == 0L), "exact regime must report max_err 0")
    }
  }

  test("overflow regime: bounds hold and a dominant item survives") {
    registered
    // 1000 rows, capacity 8: "dom" holds 40% >> the N/cap = 125-row
    // survivor threshold (the batch-decrement variant's bound)
    val words = Seq.tabulate(1000)(i =>
      if (i % 5 < 2) "dom" else s"tail${i % 97}")
    val truth = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = words.toDF("w").repartition(4)
      .agg(expr("graft_heavy_hitters(w, 8, 8)").as("hh"))
      .select(explode($"hh").as("e"))
      .select($"e.item", $"e.cnt", $"e.max_err")
      .as[(String, Long, Long)].collect()
    assert(got.nonEmpty && got.length <= 8)
    val surv = got.map(_._1).toSet
    assert(surv.contains("dom"), s"dominant item must survive: $surv")
    got.foreach { case (w, cnt, err) =>
      assert(cnt <= truth(w), s"$w: cnt $cnt must lower-bound ${truth(w)}")
      assert(cnt + err >= truth(w),
        s"$w: cnt+max_err ${cnt + err} must upper-bound ${truth(w)}")
    }
  }

  test("null items are skipped; empty input yields an empty summary") {
    registered
    val got = Seq[Option[String]](Some("a"), None, Some("a"), None)
      .toDF("w")
      .agg(expr("graft_heavy_hitters(w, 4, 4)").as("hh"))
      .select(explode($"hh").as("e")).select($"e.item", $"e.cnt")
      .as[(String, Long)].collect()
    assert(got.toSeq === Seq(("a", 2L)))
    val empty = Seq.empty[String].toDF("w")
      .agg(expr("graft_heavy_hitters(w, 4, 4)").as("hh"))
      .select(size($"hh")).as[Int].collect()
    assert(empty.toSeq === Seq(0))
  }

  test("declared trigram query: sketch equals the exact groupBy on testdata") {
    val df = graft.llm.TextAnalysis.heavyHitterNgrams(
      graft.Tables.load(spark, sf0001, "documents"))
    val got = df.select($"gram", $"cnt", $"max_err")
      .as[(String, Long, Long)].collect().toSeq
    // exact replay: explode the same trigrams, full groupBy, same order
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val exact = docs.select(split($"text", " ").as("t"))
      .where(size($"t") >= 3)
      .select(explode(expr(
        "transform(sequence(1, size(t) - 2), i -> concat_ws(' ', slice(t, i, 3)))"))
        .as("gram"))
      .groupBy($"gram").agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"gram").limit(20)
      .as[(String, Long)].collect().toSeq
    assert(got.map(t => (t._1, t._2)) === exact)
    assert(got.forall(_._3 == 0L))
  }
}

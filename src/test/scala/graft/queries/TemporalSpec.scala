package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Temporal join semantics + plan shape (SURVEY §7.3 q_asof_join /
  * q_range_join). The small frames pin the boundary/tie rules; the
  * sf0.001 cross-checks prove the scalable forms equal the naive
  * inequality-join formulations they replace; the plan tests pin that
  * neither operator ever degenerates to a nested-loop join.
  */
class TemporalSpec extends SparkSpec {

  import spark.implicits._

  test("asofJoin: at-or-before boundary, latest-wins, tie on id, no-match nulls") {
    val left = Seq(
      // (event_id, user_id, ts_us, value)
      (1L, 10L, 100L, 1.0),  // errors at 90,100 → inclusive boundary picks 100
      (2L, 10L, 95L, 2.0),   // only the 90 error precedes
      (3L, 10L, 50L, 3.0),   // nothing at-or-before → nulls
      (4L, 20L, 100L, 4.0)   // two errors at ts=100 → greatest err_id wins
    ).toDF("event_id", "user_id", "ts_us", "value")
    val right = Seq(
      (10L, 90L, 7L, 0.9),
      (10L, 100L, 8L, 1.1),
      (20L, 100L, 11L, 2.1),
      (20L, 100L, 12L, 2.2),
      (30L, 10L, 13L, 3.1)   // other key: never leaks across users
    ).toDF("user_id", "ts_us", "err_id", "err_value")

    val out = Temporal.asofJoin(left, right, Seq("user_id"), "ts_us", "err_id")
      .select("event_id", "err_id", "err_value")
      .orderBy("event_id").collect()
    assert(out.map(r => (r.getLong(0), Option(r.get(1)))).toSeq ==
      Seq((1L, Some(8L)), (2L, Some(7L)), (3L, None), (4L, Some(12L))))
    assert(out(3).getDouble(2) == 2.2)
  }

  test("rangeJoin: (t, t+span] boundaries, each pair exactly once, bin < span") {
    val left = Seq((1L, 5L, 1000L), (2L, 5L, 5000L))
      .toDF("a_id", "user_id", "a_ts")
    val right = Seq(
      (100L, 5L, 1000L),  // == a_ts → excluded (strict lower bound)
      (101L, 5L, 1001L),  // inside
      (102L, 5L, 2000L),  // == a_ts+span for span=1000 → included
      (103L, 5L, 2001L),  // just past → excluded
      (104L, 6L, 1500L)   // other key
    ).toDF("b_id", "user_id", "b_ts")

    def pairs(bin: Long) =
      Temporal.rangeJoin(left, right, Seq("user_id"), "a_ts", "b_ts",
          span = 1000L, bin = bin)
        .select("a_id", "b_id").orderBy("a_id", "b_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

    val expected = Seq((1L, 101L), (1L, 102L))
    assert(pairs(0L) == expected)      // default bin = span (2 bins/row)
    assert(pairs(300L) == expected)    // bin ∤ span, more bins — same pairs
    assert(pairs(7L) == expected)      // tiny bins — still exactly once
  }

  test("q_asof_join equals the naive inequality-join formulation (sf0.001)") {
    val e = graft.Tables.events(spark, sf0001)
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("ts div 1000").as("ts_us"), col("value"))
    val a = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_us"), col("value"))
    val b = e.filter(col("event_type") === "error")
      .select(col("user_id").as("b_uid"), col("ts_us").as("err_ts_us"),
        col("event_id").as("err_id"), col("value").as("err_value"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_id"))
      .orderBy(col("err_ts_us").desc_nulls_last, col("err_id").desc_nulls_last)
    val naive = a.join(b,
        col("user_id") === col("b_uid") && col("err_ts_us") <= col("ts_us"),
        "left")
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("event_id"), col("user_id"), col("ts_us"), col("value"),
        col("err_id"), col("err_ts_us"), col("err_value"))
      .orderBy(col("event_id"))
    val fast = Temporal.qAsofJoin.fn(spark, sf0001)
    assert(fast.collect().toSeq == naive.collect().toSeq)
    assert(fast.count() ==
      e.filter(col("event_type") === "purchase").count())
  }

  test("q_range_join equals the naive inequality join (sf0.001)") {
    val e = graft.Tables.events(spark, sf0001)
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("ts div 1000").as("ts_us"))
    val a = e.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts_us").as("click_ts_us"))
    val b = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("b_uid"),
        col("ts_us").as("purchase_ts_us"))
    val naive = a.join(b,
        col("user_id") === col("b_uid") &&
          col("purchase_ts_us") > col("click_ts_us") &&
          col("purchase_ts_us") <= col("click_ts_us") + 3600000000L)
      .select(col("click_id"), col("purchase_id"), col("user_id"),
        col("click_ts_us"), col("purchase_ts_us"),
        (col("purchase_ts_us") - col("click_ts_us")).as("delta_us"))
      .orderBy(col("click_id"), col("purchase_id"))
    val fast = Temporal.qRangeJoin.fn(spark, sf0001)
    assert(fast.count() > 0, "attribution window must match at least once")
    assert(fast.collect().toSeq == naive.collect().toSeq)
  }

  test("plans: no nested-loop/cartesian in either temporal operator") {
    for (q <- Temporal.all) {
      val plan = q.fn(spark, sf0001).queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"${q.name} degenerated to BNLJ")
      assert(!plan.contains("CartesianProduct"),
        s"${q.name} degenerated to a cartesian")
    }
    // the range join is a hash/merge EQUI join on (user_id, _bin)
    val rp = Temporal.qRangeJoin.fn(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(rp.contains("Join") && rp.contains("_bin"))
  }
}

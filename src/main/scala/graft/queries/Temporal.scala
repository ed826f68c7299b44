package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators — as-of join and banded range join.
  *
  * Not in the reference (its only temporal logic is J1's fixed
  * expiry buckets, types.go:339-365); declared because event-time
  * enrichment is a standard training-data-pipeline shape over the
  * events table, and because Spark has no native as-of/range join —
  * the naive formulations (an inequality theta join) plan as
  * BroadcastNestedLoopJoin and die at scale. Both operators here are
  * the canonical scalable rewrites:
  *
  *  - [[asofJoin]]: union-tag both sides on the key, ONE shuffle
  *    partitioned by key, sort by (time, side, tie-break) inside the
  *    partition, and carry the latest right payload forward with
  *    `last(_, ignoreNulls)` over a running window. O((|L|+|R|) log)
  *    per key group, zero row amplification, no theta join. This is
  *    the merge-scan as-of of kdb+/QuestDB/Flink temporal joins
  *    re-expressed as a Catalyst window.
  *
  *  - [[rangeJoin]]: bucket the right side's time into fixed bins
  *    (one bin per row), explode the LEFT side over the ceil(span/
  *    bin)+1 bins its window overlaps, equi-join on (key, bin), then
  *    apply the exact range predicate. The shuffle is an equi hash
  *    join; amplification is bounded by the bin count per window
  *    (2 when bin = span). Each (left, right) pair meets at most
  *    once — the right row lives in exactly one bin — so no dedup
  *    pass is needed. This is the binned range join of Databricks'
  *    range-join optimization / the interval-join of Flink.
  *
  * 100 TB shape: both shuffle once on the join key; skew on a hot
  * key is bounded by that key's own row count (as-of: one sorted
  * scan; range: bin granularity spreads a hot key's probe rows over
  * time). No CartesianProduct / BNLJ anywhere (TemporalSpec pins the
  * plans).
  */
object Temporal {

  /** Scalable as-of join: for each left row, the single right row
    * with the greatest `timeCol` such that `right.timeCol <=
    * left.timeCol` and the keys match (at-or-before semantics; ties
    * between right rows at the same time resolve to the greatest
    * `rightIdCol`). Left rows with no prior right row survive with
    * nulls (left-outer semantics).
    *
    * Requirements: `timeCol` is an orderable numeric/timestamp column
    * present on both sides under the same name; `rightIdCol` makes
    * (timeCol, rightIdCol) unique on the right side per key group
    * (the tie-break); left/right non-key column names must not
    * collide (rename before calling).
    *
    * Plan shape: one Exchange on `keyCols`, one in-partition sort,
    * one window pass — the right payload rides as a single struct
    * column so the window carries one value regardless of payload
    * width.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      timeCol: String, rightIdCol: String): DataFrame = {
    val leftPayload = left.columns.filterNot(c =>
      keyCols.contains(c) || c == timeCol)
    // The right's own time column is dropped from the payload (it
    // would collide with the left's); a caller that wants the matched
    // instant aliases a copy into the right frame first.
    val rightPayload = right.columns.filterNot(c =>
      keyCols.contains(c) || c == timeCol)

    val rStruct = struct(rightPayload.map(col): _*)
    val rType = right.select(rStruct).schema.head.dataType

    val lTagged = left.select(
      keyCols.map(col) ++ Seq(
        col(timeCol).as("_t"),
        lit(1).as("_side"),
        lit(null).cast("long").as("_rid"),
        lit(null).cast(rType).as("_r"),
        col(timeCol)) ++ leftPayload.map(col): _*)
    val rTagged = right.select(
      keyCols.map(col) ++ Seq(
        col(timeCol).as("_t"),
        lit(0).as("_side"),
        col(rightIdCol).cast("long").as("_rid"),
        rStruct.as("_r"),
        lit(null).cast(left.schema(timeCol).dataType).as(timeCol)) ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    // Right rows sort BEFORE left rows at the same instant (side 0 <
    // 1) — that is exactly the inclusive at-or-before boundary. Among
    // right rows at one instant the running `last` lands on the
    // greatest _rid. The ordering is total over the rows that matter,
    // so the window result is partition-layout independent.
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_t"), col("_side"), col("_rid").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = lTagged.unionByName(rTagged)
      .withColumn("_match", last(col("_r"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)

    matched.select(
      keyCols.map(col) ++ Seq(col(timeCol)) ++ leftPayload.map(col) ++
        rightPayload.map(c => col("_match").getField(c).as(c)): _*)
  }

  /** Scalable banded range join: all (left, right) pairs with equal
    * keys and `right.timeCol` in the half-open-from-below interval
    * `(left.timeCol, left.timeCol + span]`. `span` and the time
    * columns share one integer unit (the queries below use epoch
    * micros). Inner-join semantics: unmatched rows drop.
    *
    * The left side explodes over `span / bin + 1` bins (2 at the
    * default bin = span); the right side keeps its single home bin,
    * so every qualifying pair meets exactly once and the join stays
    * a hash equi join on (keys..., _bin).
    */
  def rangeJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTime: String, rightTime: String, span: Long,
      bin: Long = 0L): DataFrame = {
    val binSize = if (bin > 0L) bin else span
    require(binSize > 0L && span > 0L, "span and bin must be positive")
    // the left side explodes over span/bin+1 bins per row — an
    // accidentally tiny bin (bin=1ms against an hour span) would
    // sequence() millions of elements per row before any task fails
    require(span / binSize < 4096,
      s"span/bin = ${span / binSize} bins per left row; use a coarser bin")

    // Integer `div` throughout — a double `/` would round near bin
    // boundaries at epoch-micros magnitudes.
    val lBinned = left.withColumn("_bin",
      explode(sequence(
        expr(s"CAST($leftTime AS BIGINT) div ${binSize}L"),
        expr(s"(CAST($leftTime AS BIGINT) + ${span}L) div ${binSize}L"))))
    val rBinned = right.withColumn("_bin",
      expr(s"CAST($rightTime AS BIGINT) div ${binSize}L"))

    lBinned.join(rBinned, keyCols :+ "_bin")
      .where(col(rightTime) > col(leftTime) &&
        col(rightTime) <= col(leftTime) + lit(span))
      .drop("_bin")
  }

  private def ev(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("ts div 1000").as("ts_us"), col("value"))

  /** As-of enrichment on the events stream: each purchase joined to
    * the user's most recent error at-or-before the purchase instant
    * (the classic "what state was the account in when the money
    * moved" lookup). Oracle restates it as the inequality join +
    * row_number pick — quadratic as written there, which is exactly
    * why the engine-side union-scan form exists. */
  val qAsofJoin = QuerySpec(
    "q_asof_join",
    (s, d) => {
      val e = ev(s, d)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts_us"), col("value"))
      val errors = e.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts_us"),
          col("event_id").as("err_id"), col("ts_us").as("err_ts_us"),
          col("value").as("err_value"))
      asofJoin(purchases, errors, Seq("user_id"), "ts_us", "err_id")
        .select(col("event_id"), col("user_id"), col("ts_us"), col("value"),
          col("err_id"), col("err_ts_us"), col("err_value"))
        .orderBy(col("event_id"))
    },
    Some("""WITH e AS (
           |  SELECT event_id, user_id, event_type,
           |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value
           |  FROM events
           |), a AS (
           |  SELECT event_id, user_id, ts_us, value FROM e
           |  WHERE event_type = 'purchase'
           |), b AS (
           |  SELECT user_id, ts_us AS err_ts_us, event_id AS err_id,
           |    value AS err_value
           |  FROM e WHERE event_type = 'error'
           |)
           |SELECT event_id, user_id, ts_us, value, err_id, err_ts_us,
           |  err_value
           |FROM (
           |  SELECT a.event_id, a.user_id, a.ts_us, a.value,
           |    b.err_id, b.err_ts_us, b.err_value,
           |    row_number() OVER (PARTITION BY a.event_id
           |      ORDER BY b.err_ts_us DESC NULLS LAST,
           |               b.err_id DESC NULLS LAST) AS rn
           |  FROM a LEFT JOIN b
           |    ON a.user_id = b.user_id AND b.err_ts_us <= a.ts_us) q
           |WHERE rn = 1
           |ORDER BY event_id""".stripMargin))

  /** Range (interval) join on the events stream: every (click,
    * purchase) pair of one user where the purchase lands within the
    * hour after the click — the attribution-window join. Oracle is
    * the plain inequality join (DuckDB plans it as IEJoin); the
    * engine side is the binned equi join. */
  val qRangeJoin = QuerySpec(
    "q_range_join",
    (s, d) => {
      val spanUs = 3600L * 1000000L
      val e = ev(s, d)
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          col("ts_us").as("click_ts_us"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts_us").as("purchase_ts_us"))
      rangeJoin(clicks, purchases, Seq("user_id"),
          "click_ts_us", "purchase_ts_us", spanUs)
        .select(col("click_id"), col("purchase_id"), col("user_id"),
          col("click_ts_us"), col("purchase_ts_us"),
          (col("purchase_ts_us") - col("click_ts_us")).as("delta_us"))
        .orderBy(col("click_id"), col("purchase_id"))
    },
    Some("""WITH e AS (
           |  SELECT event_id, user_id, event_type,
           |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
           |  FROM events
           |), a AS (
           |  SELECT event_id AS click_id, user_id, ts_us AS click_ts_us
           |  FROM e WHERE event_type = 'click'
           |), b AS (
           |  SELECT event_id AS purchase_id, user_id,
           |    ts_us AS purchase_ts_us
           |  FROM e WHERE event_type = 'purchase'
           |)
           |SELECT a.click_id, b.purchase_id, a.user_id, a.click_ts_us,
           |  b.purchase_ts_us, b.purchase_ts_us - a.click_ts_us AS delta_us
           |FROM a JOIN b ON a.user_id = b.user_id
           |  AND b.purchase_ts_us > a.click_ts_us
           |  AND b.purchase_ts_us <= a.click_ts_us + 3600000000
           |ORDER BY click_id, purchase_id""".stripMargin))

  val all: Seq[QuerySpec] = Seq(qAsofJoin, qRangeJoin)
}

package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew-safe variants of the shuffle-heavy operators (SURVEY.md §7.4's
  * 100 TB design rule).
  *
  * Plain `sum`/`count` aggregations are already skew-tolerant: Spark's
  * partial aggregation compresses every hot key map-side before the
  * shuffle. The operators that are NOT are the ones whose partial state
  * grows with input — set/list accumulation (the reference's issuer
  * metadata, issuermetadata.go:92-138, where one mega-CA can own most
  * of the corpus) and per-key top-k windows — because every row of the
  * hot key still lands on one reducer. These helpers split such keys
  * over `buckets` salt partitions and merge, trading one extra (much
  * smaller) shuffle for bounded per-task state. Equivalence with the
  * direct forms is pinned by ScalaTest.
  *
  * Joins need no helper here: AQE's skew-join splitting
  * (spark.sql.adaptive.skewJoin.enabled, on by default) re-plans hot
  * partitions at runtime.
  */
object Skew {

  /** `groupBy(keys).agg(sort_array(collect_set(value)))`, salted: the
    * hot key's values spread over `buckets` partial sets (salt = hash
    * of the VALUE, so duplicates of one value land in one bucket and
    * partial sets stay disjoint-ish), then merge-distinct. */
  def saltedCollectSet(df: DataFrame, keys: Seq[Column], value: Column,
      buckets: Int): DataFrame =
    df.groupBy((keys :+ pmod(hash(value), lit(buckets)).as("__salt")): _*)
      .agg(collect_set(value).as("__partial"))
      .groupBy(keys: _*)
      .agg(sort_array(array_distinct(flatten(collect_list(col("__partial")))))
        .as("values"))

  /** Exact distinct count per key without `countDistinct`'s single-
    * reducer exposure: dedup on (key, value) — a shuffle keyed on the
    * PAIR, which a hot key cannot concentrate — then count. */
  def distinctCountByPair(df: DataFrame, keys: Seq[Column], value: Column): DataFrame =
    df.select((keys :+ value.as("__v")): _*)
      .dropDuplicates()
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n_distinct"))

  /** Per-key top-k by `order`, salted two-phase: phase 1 takes top-k
    * within (key, salt) — bounding any task to k·rows/buckets — phase 2
    * re-ranks the ≤ k·buckets survivors per key. Identical to a direct
    * row_number window when `order` is a total order per key. */
  def saltedTopK(df: DataFrame, keys: Seq[Column], order: Seq[Column],
      k: Int, buckets: Int): DataFrame = {
    // salt on the raw row (order expressions may carry sort direction,
    // which hash() must not see); any deterministic spread is correct —
    // per-bucket rank is a lower bound on global rank, so phase 1 never
    // drops a global top-k row
    val salted = df.withColumn("__salt",
      pmod(hash(df.columns.map(col).toSeq: _*), lit(buckets)))
    val w1 = Window.partitionBy((keys :+ col("__salt")): _*).orderBy(order: _*)
    val survivors = salted
      .withColumn("__rn", row_number().over(w1))
      .filter(col("__rn") <= k)
      .drop("__salt", "__rn")
    val w2 = Window.partitionBy(keys: _*).orderBy(order: _*)
    survivors
      .withColumn("rank", row_number().over(w2).cast("long"))
      .filter(col("rank") <= k)
  }

  // ---- driver-oracle'd forms ----------------------------------------------
  // The salted operators must be RESULT-identical to the direct forms,
  // so they share the direct forms' DuckDB oracles — the driver gate
  // proves the skew-safe rewrites change the plan, not the answer.

  /** Salted collect_set, same output shape + oracle as q_collect_set. */
  val qSkewCollectSet = QuerySpec(
    "q_skew_collect_set",
    (s, d) =>
      saltedCollectSet(Tables.load(s, d, "customer"),
        Seq(col("c_mktsegment")), col("c_nationkey"), buckets = 8)
        .select(col("c_mktsegment"),
          array_join(transform(col("values"),
            x => lpad(x.cast("string"), 3, "0")), ",").as("nations_csv"),
          size(col("values")).cast("long").as("n_nations"))
        .orderBy(col("c_mktsegment")),
    Some("""SELECT c_mktsegment,
           |  array_to_string(list_sort(list_transform(list_distinct(list(c_nationkey)),
           |    x -> lpad(CAST(x AS VARCHAR), 3, '0'))), ',') AS nations_csv,
           |  len(list_distinct(list(c_nationkey))) AS n_nations
           |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Pair-keyed distinct count, same oracle as a direct countDistinct. */
  val qSkewDistinct = QuerySpec(
    "q_skew_distinct",
    (s, d) =>
      distinctCountByPair(Tables.events(s, d),
        Seq(col("event_type")), col("user_id"))
        .withColumnRenamed("n_distinct", "n_users")
        .orderBy(col("event_type")),
    Some("""SELECT event_type, count(DISTINCT user_id) AS n_users
           |FROM events GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Per-key top-k as the bounded aggregate
    * ([[graft.functions.TopKMinAggExpr]]): the third skew posture, and
    * the strongest — no salt parameter to tune, one shuffle, and a hot
    * key's rows reduce to k per task MAP-SIDE (the salted form still
    * ships k·buckets survivors and re-sorts them). `ord` is a struct
    * whose ASCENDING lexicographic order is the desired ranking
    * (negate numeric keys for descending; include the tiebreak
    * columns). Output: the grouping keys, `rank`, and the `ord` struct
    * as `__t` for the caller to unpack. */
  def aggTopK(df: DataFrame, keys: Seq[Column], ord: Column, k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.groupBy(keys: _*)
      .agg(call_udf("graft_topk_min", ord, lit(k)).as("__top"))
      .select(col("*"), posexplode(col("__top")).as(Seq("__pos", "__t")))
      .withColumn("rank", (col("__pos") + 1).cast("long"))
      .drop("__top", "__pos")
  }

  /** Salted two-phase top-k, same output + oracle as q_window_rank. */
  val qSkewTopK = QuerySpec(
    "q_skew_topk",
    (s, d) =>
      saltedTopK(
        Tables.load(s, d, "orders")
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice")),
        Seq(col("o_custkey")),
        Seq(col("o_totalprice").desc, col("o_orderkey")),
        k = 3, buckets = 8)
        .select(col("o_custkey"), col("rank").as("rn"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_custkey"), col("rn")),
    Some("""SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
           |  SELECT o_custkey, o_orderkey, o_totalprice,
           |    row_number() OVER (PARTITION BY o_custkey
           |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
           |  FROM orders) WHERE rn <= 3
           |ORDER BY o_custkey, rn""".stripMargin))

  /** Bounded-aggregate top-k, same output + oracle as [[qSkewTopK]] —
    * the driver gate proves all three top-k postures (window, salted
    * two-phase, bounded aggregate) answer identically. */
  val qSkewTopKAgg = QuerySpec(
    "q_skew_topk_agg",
    (s, d) =>
      aggTopK(
        Tables.load(s, d, "orders")
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice")),
        Seq(col("o_custkey")),
        struct((-col("o_totalprice")).as("np"), col("o_orderkey"),
          col("o_totalprice")),
        k = 3)
        .select(col("o_custkey"), col("rank").as("rn"),
          col("__t.o_orderkey").as("o_orderkey"),
          col("__t.o_totalprice").as("o_totalprice"))
        .orderBy(col("o_custkey"), col("rn")),
    qSkewTopK.oracle)

  val all: Seq[QuerySpec] =
    Seq(qSkewCollectSet, qSkewDistinct, qSkewTopK, qSkewTopKAgg)
}

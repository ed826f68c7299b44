package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A declared query: the Spark plan plus (when SQL-expressible) the
  * DuckDB oracle the driver hash-compares it against. Column names and
  * output types must line up exactly between the two (driver sorts
  * columns by name and hashes values).
  */
final case class QuerySpec(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** The relational declared-query inventory (SURVEY.md §7.3): every
  * operator row in SURVEY.md §2 that maps to a DuckDB-checkable query
  * over the driver testdata. The CT-domain semantics (issuer ≈ nation,
  * expDate ≈ month buckets, serial ≈ composite keys) are exercised on
  * the star schema + events, per SURVEY.md §7.3's table.
  *
  * Determinism rules (driver hash-compares results):
  *  - every query ends in a total-order `orderBy` mirrored in the SQL
  *    (with NULLS FIRST where rollup introduces nulls);
  *  - double sums go through exact DECIMAL(18,2) accumulation (all
  *    money-ish testdata columns are 2-decimal) then cast back to
  *    double, so aggregation order can't flip low bits;
  *  - per-row double arithmetic is identical IEEE in both engines and
  *    is left as-is;
  *  - counts/sizes are cast to long to match DuckDB's BIGINT.
  */
object Inventory {

  // ---- helpers -----------------------------------------------------------

  /** Exact-decimal sum of a 2-decimal double column, emitted as double. */
  private def decSum(c: Column): Column =
    sum(c.cast("decimal(18,2)")).cast("double")

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  // ---- scans / projections (A6, A3, A4, D4) ------------------------------

  /** A6 scan + project + derived columns (reference: serial scan per
    * partition, localdiskbackend.go:141-186, re-expressed as a pruned
    * column scan). */
  val qScanProject = QuerySpec(
    "q_scan_project",
    (s, d) =>
      t(s, d, "lineitem")
        .select(
          col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("net_price"),
          concat(col("l_returnflag"), col("l_linestatus")).as("flag_status"))
        // total order over every output column: (l_orderkey,
        // l_linenumber) is NOT unique in the testdata, and tie order
        // is engine-dependent once the scan parallelizes (caught by
        // the sf1 rehearsal); rows still tied under the full sort are
        // identical, so any order is value-identical
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("net_price"), col("flag_status")),
    Some("""SELECT l_orderkey, l_linenumber, l_quantity,
           |  l_extendedprice * (1 - l_discount) AS net_price,
           |  l_returnflag || l_linestatus AS flag_status
           |FROM lineitem
           |ORDER BY l_orderkey, l_linenumber, l_quantity, net_price,
           |  flag_status""".stripMargin))

  /** A3/A10 point lookup by key (ct-getcert.go:32-56): partition-pruned
    * single-key read, no shuffle. */
  val qPointLookup = QuerySpec(
    "q_point_lookup",
    (s, d) =>
      t(s, d, "orders").filter(col("o_orderkey") === 42)
        .orderBy(col("o_orderkey")),
    Some("SELECT * FROM orders WHERE o_orderkey = 42 ORDER BY o_orderkey"))

  /** A4/C4 partition pruning by date range (expired-dir skip,
    * localdiskbackend.go:93-119): a date-range filter Catalyst pushes
    * into the scan. */
  val qPartitionPrune = QuerySpec(
    "q_partition_prune",
    (s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1999-01-01").cast("timestamp"))
        .groupBy(date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_day"))
        .agg(count(lit(1)).as("n_items"), decSum(col("l_extendedprice")).as("sum_price"))
        .orderBy(col("ship_day")),
    Some("""SELECT strftime(l_shipdate, '%Y-%m-%d') AS ship_day,
           |  count(*) AS n_items,
           |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
           |FROM lineitem
           |WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_shipdate < TIMESTAMP '1999-01-01'
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  // ---- filters (C1-C6) ---------------------------------------------------

  /** C1/C2/C6 multi-predicate AND/OR filter (CA + expiry filters,
    * ct-fetch.go:44-70). */
  val qFilterPred = QuerySpec(
    "q_filter_pred",
    (s, d) =>
      t(s, d, "orders")
        .filter(col("o_orderstatus") === "F" &&
          (col("o_totalprice") > 150000.0 || col("o_orderpriority").startsWith("1-")))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("o_orderpriority"))
        .orderBy(col("o_orderkey")),
    Some("""SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
           |FROM orders
           |WHERE o_orderstatus = 'F'
           |  AND (o_totalprice > 150000.0 OR starts_with(o_orderpriority, '1-'))
           |ORDER BY o_orderkey""".stripMargin))

  /** C3 issuer-CN prefix OR-fold (ct-fetch.go:57-69) on p_type. */
  val qPrefixFilter = QuerySpec(
    "q_prefix_filter",
    (s, d) => {
      val prefixes = Seq("STA", "PRO", "ECO")
      val pred = prefixes.map(p => col("p_type").startsWith(p)).reduce(_ || _)
      t(s, d, "part").filter(pred)
        .select(col("p_partkey"), col("p_name"), col("p_type"))
        .orderBy(col("p_partkey"))
    },
    Some("""SELECT p_partkey, p_name, p_type FROM part
           |WHERE starts_with(p_type, 'STA') OR starts_with(p_type, 'PRO')
           |   OR starts_with(p_type, 'ECO')
           |ORDER BY p_partkey""".stripMargin))

  /** C5 URL scheme filter: trim + regexp keep-list
    * (issuermetadata.go:48-73). */
  val qUrlFilter = QuerySpec(
    "q_url_filter",
    (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), trim(col("source")).as("src"))
        .filter(col("src").rlike("^src[0-3]$"))
        .orderBy(col("doc_id")),
    Some("""SELECT doc_id, trim(source) AS src FROM documents
           |WHERE regexp_matches(trim(source), '^src[0-3]$')
           |ORDER BY doc_id""".stripMargin))

  // ---- scalar functions (D1-D8) ------------------------------------------

  /** D2-D4 digest/encoding projections (issuer-ID digest, serial
    * encodings; types.go:124-130, 210-255). sha1 is exercised in
    * ScalaTest (DuckDB 1.0 lacks it); hex is lower()-normalized since
    * Spark emits uppercase and DuckDB lowercase; Spark's base64 is
    * MIME-chunked (CRLF every 76 chars) so the line breaks are
    * stripped to get canonical RFC 4648. */
  val qScalarHash = QuerySpec(
    "q_scalar_hash",
    (s, d) => {
      def b64flat(c: Column): Column = regexp_replace(base64(c), "\r\n", "")
      t(s, d, "documents")
        .select(
          col("doc_id"),
          sha2(col("text").cast("binary"), 256).as("sha_hex"),
          md5(col("text").cast("binary")).as("md5_hex"),
          b64flat(col("text").cast("binary")).as("b64"),
          translate(b64flat(col("text").cast("binary")), "+/", "-_").as("b64url"),
          lower(hex(col("text").cast("binary"))).as("hex_str"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id,
           |  sha256(text) AS sha_hex,
           |  md5(text) AS md5_hex,
           |  to_base64(CAST(text AS BLOB)) AS b64,
           |  translate(to_base64(CAST(text AS BLOB)), '+/', '-_') AS b64url,
           |  lower(hex(CAST(text AS BLOB))) AS hex_str
           |FROM documents ORDER BY doc_id""".stripMargin))

  /** D8 composite-key concat/parse round trip (types.go:279-331). */
  val qStringFuncs = QuerySpec(
    "q_string_funcs",
    (s, d) =>
      t(s, d, "customer")
        .select(col("c_custkey"),
          concat_ws("::", col("c_mktsegment"), col("c_custkey")).as("ckey"))
        .withColumn("seg_parsed", element_at(split(col("ckey"), "::"), 1))
        .withColumn("id_parsed", element_at(split(col("ckey"), "::"), 2).cast("long"))
        .orderBy(col("c_custkey")),
    Some("""SELECT c_custkey,
           |  concat_ws('::', c_mktsegment, c_custkey) AS ckey,
           |  str_split(concat_ws('::', c_mktsegment, c_custkey), '::')[1] AS seg_parsed,
           |  CAST(str_split(concat_ws('::', c_mktsegment, c_custkey), '::')[2] AS BIGINT) AS id_parsed
           |FROM customer ORDER BY c_custkey""".stripMargin))

  /** D5/D6 time bucketing + epoch-ms conversion (types.go:339-365,
    * ct-fetch.go:72-75 — exact ms, not the reference's ns-remainder bug). */
  val qTimeFuncs = QuerySpec(
    "q_time_funcs",
    (s, d) =>
      Tables.events(s, d)
        .select(
          col("event_id"),
          date_trunc("hour", col("ts_us")).as("ts_hour"),
          date_format(col("ts_us"), "yyyy-MM-dd").as("ts_day"),
          expr("ts div 1000000").as("epoch_ms"),
          expr("ts div 1000000000").as("epoch_s"))
        .orderBy(col("event_id")),
    Some("""SELECT event_id,
           |  date_trunc('hour', CAST(ts AS TIMESTAMP)) AS ts_hour,
           |  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS ts_day,
           |  epoch_ns(ts) // 1000000 AS epoch_ms,
           |  epoch_ns(ts) // 1000000000 AS epoch_s
           |FROM events ORDER BY event_id""".stripMargin))

  // ---- dedup / distinct (E1, E4) -----------------------------------------

  /** E1/E4 exact dedup on a composite key (WasUnknown gate +
    * SSCAN-duplicate removal, knowncertificates.go:38-96). */
  val qDedupDistinct = QuerySpec(
    "q_dedup_distinct",
    (s, d) =>
      Tables.events(s, d)
        .select(col("user_id"), col("event_type")).distinct()
        .orderBy(col("user_id"), col("event_type")),
    Some("""SELECT DISTINCT user_id, event_type FROM events
           |ORDER BY user_id, event_type""".stripMargin))

  /** E1 first-seen per key: the batch form of the WasUnknown gate —
    * first event per (user, day). Ordering and output use microsecond
    * precision on both sides (DuckDB 1.0 truncates parquet
    * TIMESTAMP(NANOS) to micros on read), tiebroken by event_id. */
  val qFirstSeen = QuerySpec(
    "q_first_seen",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, d)
        .withColumn("day", date_format(col("ts_us"), "yyyy-MM-dd"))
        .withColumn("ts_epoch_us", expr("ts div 1000"))
      val w = Window.partitionBy(col("user_id"), col("day"))
        .orderBy(col("ts_epoch_us"), col("event_id"))
      ev.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("day"), col("event_id"), col("ts_epoch_us"))
        .orderBy(col("user_id"), col("day"))
    },
    Some("""SELECT user_id, strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
           |  event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_epoch_us
           |FROM events
           |QUALIFY row_number() OVER (
           |  PARTITION BY user_id, strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d')
           |  ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) = 1
           |ORDER BY user_id, day""".stripMargin))

  // ---- aggregations (F1-F6) ----------------------------------------------

  /** A5/F6 grouped counts (issuer enumeration + queue length). */
  val qGroupbyCount = QuerySpec(
    "q_groupby_count",
    (s, d) =>
      t(s, d, "orders").groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderstatus")),
    Some("""SELECT o_orderstatus, count(*) AS n_orders FROM orders
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** F1/F4 exact distinct counts per group (SCARD per set). */
  val qCountDistinct = QuerySpec(
    "q_count_distinct",
    (s, d) =>
      Tables.events(s, d).groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))
        .orderBy(col("event_type")),
    Some("""SELECT event_type, count(DISTINCT user_id) AS n_users,
           |  count(*) AS n_events
           |FROM events GROUP BY 1 ORDER BY 1""".stripMargin))

  /** F1-at-scale: approximate distinct (HLL), oracle'd WITH TOLERANCE
    * (SURVEY §2.F's declared option). An HLL estimate can't hash-match
    * a foreign engine, so the query emits (a) the exact per-group
    * count — pinned verbatim by DuckDB's `count(DISTINCT …)` — and
    * (b) a boolean asserting the HLL estimate landed within ±5% of
    * that SAME exact count, evaluated in-plan. The oracle side states
    * the tolerance contract as literal `true`: the check is
    * non-vacuous because the exact count the boolean was computed
    * against is itself the hash-compared column (a drifting estimate
    * flips the boolean and fails the hash). The sketch runs at
    * rsd = 0.01, so the ±5% bound sits ~5 standard deviations out —
    * tier-robust, not a coin flip on the 1-sigma default. The
    * production form remains the approx-only aggregate — the exact
    * leg here is the verification harness, not the serving plan. */
  val qApproxDistinct = QuerySpec(
    "q_approx_distinct",
    (s, d) => {
      val ev = Tables.events(s, d)
      // The exact and approximate distincts run as SEPARATE aggregates
      // joined on the 5-row group key (round 14): mixed in one agg,
      // the count(DISTINCT) Expand rewrite keys phase-1 partials by
      // (event_type, user_id, gid) and allocates the rsd=0.01 HLL++
      // register array (2^14 registers, 16 KB) per PAIR group — ~100k
      // sketch buffers at sf0.1 where the query needs 5 (measured
      // 3.2-4.6 s; split form ~0.6 s). Same aggregates over the same
      // rows, identical output.
      val approx = ev.groupBy(col("event_type").as("event_type_a"))
        .agg(approx_count_distinct(col("user_id"), 0.01).as("approx_users"))
      val exact = ev.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"))
      // null-SAFE equality (round 15 ADVICE): both sides group the same
      // rows, but a NULL event_type group would be dropped by a plain
      // equi-join where the original single mixed aggregate kept it
      exact.join(broadcast(approx),
          col("event_type") <=> col("event_type_a"))
        .select(col("event_type"), col("n_users"),
          (abs(col("approx_users") - col("n_users")).cast("double") <=
            col("n_users").cast("double") * 0.05).as("approx_within_5pct"))
        .orderBy(col("event_type"))
    },
    Some("""SELECT event_type, count(DISTINCT user_id) AS n_users,
           |  true AS approx_within_5pct
           |FROM events GROUP BY 1 ORDER BY 1""".stripMargin))

  /** F2 FLAGSHIP hierarchical rollup (storage-statistics.go:33-82):
    * per issuer(≈nation) × expDate(≈month) counts, per-issuer
    * subtotals, grand totals — the reference's N+1 Redis round-trips
    * collapsed into one Catalyst plan with partial aggregation. */
  val qRollup = QuerySpec(
    "q_rollup",
    (s, d) => {
      val orders = t(s, d, "orders")
      val customer = t(s, d, "customer")
      val nation = t(s, d, "nation")
      orders
        .join(customer, col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .withColumn("month", date_format(col("o_orderdate"), "yyyy-MM"))
        .rollup(col("n_name"), col("month"))
        .agg(count(lit(1)).as("n_orders"),
          decSum(col("o_totalprice")).as("sum_price"),
          countDistinct(col("o_custkey")).as("n_custs"))
        .orderBy(asc_nulls_first("n_name"), asc_nulls_first("month"))
    },
    Some("""SELECT n_name, strftime(o_orderdate, '%Y-%m') AS month,
           |  count(*) AS n_orders,
           |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
           |  count(DISTINCT o_custkey) AS n_custs
           |FROM orders
           |JOIN customer ON o_custkey = c_custkey
           |JOIN nation ON c_nationkey = n_nationkey
           |GROUP BY ROLLUP(n_name, month)
           |ORDER BY n_name NULLS FIRST, month NULLS FIRST""".stripMargin))

  /** E3/E5/F3/I4 distinct-set accumulation per group
    * (IssuerMetadata.Accumulate, issuermetadata.go:92-138), emitted
    * deterministically as a sorted CSV plus set size. */
  val qCollectSet = QuerySpec(
    "q_collect_set",
    (s, d) =>
      t(s, d, "customer").groupBy(col("c_mktsegment"))
        .agg(
          array_join(transform(sort_array(collect_set(col("c_nationkey"))),
            x => lpad(x.cast("string"), 3, "0")), ",").as("nations_csv"),
          size(collect_set(col("c_nationkey"))).cast("long").as("n_nations"))
        .orderBy(col("c_mktsegment")),
    Some("""SELECT c_mktsegment,
           |  array_to_string(list_sort(list_transform(list_distinct(list(c_nationkey)),
           |    x -> lpad(CAST(x AS VARCHAR), 3, '0'))), ',') AS nations_csv,
           |  len(list_distinct(list(c_nationkey))) AS n_nations
           |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin))

  // ---- sorts / limits / windows (G, J1) ----------------------------------

  /** G1-G3/B4 multi-column sort + offset/limit window
    * (sorted serial export + --offset/--limit, ct-fetch.go:288-305). */
  val qSortLimit = QuerySpec(
    "q_sort_limit",
    (s, d) =>
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .offset(10).limit(20),
    Some("""SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
           |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
           |LIMIT 20 OFFSET 10""".stripMargin))

  /** top-k per group via row_number (the windowed form of first-seen,
    * SURVEY.md §2.G). */
  val qWindowRank = QuerySpec(
    "q_window_rank",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_custkey"), col("rn"))
    },
    Some("""SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
           |  SELECT o_custkey, o_orderkey, o_totalprice,
           |    row_number() OVER (PARTITION BY o_custkey
           |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
           |  FROM orders) WHERE rn <= 3
           |ORDER BY o_custkey, rn""".stripMargin))

  /** Sessionization over event time: a session breaks where the gap
    * from the previous event exceeds 30 minutes (gaps-and-islands —
    * lag → gap flag → running sum as session id → group). The same
    * formulation runs in DuckDB for the oracle; equivalence with
    * Spark's native `session_window` is pinned by ScalaTest
    * (InventorySpec). Not in the reference (its only time bucketing is
    * J1's fixed buckets); declared because event sessionization is a
    * standard training-data-pipeline shape over the events table. */
  val qWindowSession = QuerySpec(
    "q_window_session",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val gapMs = 30L * 60 * 1000
      val ev = Tables.events(s, d)
        .select(col("user_id"), expr("ts div 1000").as("ts_us"))
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"))
      val sessions = ev
        .withColumn("prev", lag(col("ts_us"), 1).over(byUser))
        .withColumn("brk",
          when(col("prev").isNull || col("ts_us") - col("prev") > gapMs * 1000, 1L)
            .otherwise(0L))
        .withColumn("session_no", sum(col("brk")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      sessions.groupBy(col("user_id"), col("session_no"))
        .agg(min(col("ts_us")).as("session_start_us"),
          max(col("ts_us")).as("session_end_us"),
          count(lit(1)).as("n_events"))
        .orderBy(col("user_id"), col("session_no"))
    },
    Some("""SELECT user_id, session_no,
           |  min(ts_us) AS session_start_us, max(ts_us) AS session_end_us,
           |  count(*) AS n_events
           |FROM (
           |  SELECT user_id, ts_us,
           |    CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us
           |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
           |  FROM (
           |    SELECT user_id, ts_us,
           |      CASE WHEN prev IS NULL OR ts_us - prev > 1800000000 THEN 1
           |           ELSE 0 END AS brk
           |    FROM (
           |      SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
           |        lag(epoch_us(CAST(ts AS TIMESTAMP)), 1) OVER (
           |          PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP))) AS prev
           |      FROM events) a) b) c
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  /** J1 tumbling 1-hour buckets on event time (day/hour expiration
    * buckets, types.go:339-365). */
  val qWindowBucket = QuerySpec(
    "q_window_bucket",
    (s, d) =>
      Tables.events(s, d)
        .groupBy(date_trunc("hour", col("ts_us")).as("bucket"))
        .agg(count(lit(1)).as("n_events"), decSum(col("value")).as("sum_value"))
        .orderBy(col("bucket")),
    Some("""SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket,
           |  count(*) AS n_events,
           |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
           |FROM events GROUP BY 1 ORDER BY 1""".stripMargin))

  // ---- joins (H1-H6) -----------------------------------------------------

  /** H1 equi inner join on the fact keys. */
  val qJoinInner = QuerySpec(
    "q_join_inner",
    (s, d) =>
      t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .filter(col("o_orderstatus") === "F")
        .select(col("l_orderkey"), col("l_linenumber"), col("o_custkey"), col("l_quantity"))
        // total order: (l_orderkey, l_linenumber) is non-unique in the
        // testdata (see qScanProject) — tie rows must be identical for
        // the row-wise oracle compare to be order-independent
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("o_custkey"),
          col("l_quantity")),
    Some("""SELECT l_orderkey, l_linenumber, o_custkey, l_quantity
           |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           |WHERE o_orderstatus = 'F'
           |ORDER BY l_orderkey, l_linenumber, o_custkey, l_quantity""".stripMargin))

  /** H2 broadcast join against tiny dimensions (issuer-metadata
    * enrichment, filesystemdatabase.go:40-57): nation+region are
    * broadcast, no shuffle on the dim side. */
  val qBroadcastJoin = QuerySpec(
    "q_broadcast_join",
    (s, d) =>
      t(s, d, "orders")
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_orders"), decSum(col("o_totalprice")).as("sum_price"))
        .orderBy(col("r_name"), col("n_name")),
    Some("""SELECT r_name, n_name, count(*) AS n_orders,
           |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
           |FROM orders
           |JOIN customer ON o_custkey = c_custkey
           |JOIN nation ON c_nationkey = n_nationkey
           |JOIN region ON n_regionkey = r_regionkey
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  /** H4 left outer join + coalesce fallthrough (checkpoint cache →
    * backend → fresh default, filesystemdatabase.go:120-139). */
  val qOuterJoin = QuerySpec(
    "q_outer_join",
    (s, d) => {
      val spend = t(s, d, "orders").groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n"), decSum(col("o_totalprice")).as("sp"))
      t(s, d, "customer")
        .join(spend, col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"), col("c_name"),
          coalesce(col("n"), lit(0L)).as("n_orders"),
          coalesce(col("sp"), lit(0.0)).as("total_spend"))
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey, c_name,
           |  COALESCE(n, 0) AS n_orders, COALESCE(sp, 0.0) AS total_spend
           |FROM customer LEFT JOIN (
           |  SELECT o_custkey, count(*) AS n,
           |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sp
           |  FROM orders GROUP BY 1) ON c_custkey = o_custkey
           |ORDER BY c_custkey""".stripMargin))

  /** C8/H5 semi join — membership test (SIsMember). */
  val qSemiJoin = QuerySpec(
    "q_semi_join",
    (s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey")),
    Some("""SELECT c_custkey, c_name FROM customer
           |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
           |ORDER BY c_custkey""".stripMargin))

  /** H6 anti join — set removal (SRem). Keyed to the rarer 'P' status
    * so the result is non-empty at every scale factor. */
  val qAntiJoin = QuerySpec(
    "q_anti_join",
    (s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders").filter(col("o_orderstatus") === "P"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey")),
    Some("""SELECT c_custkey, c_name FROM customer
           |WHERE NOT EXISTS (SELECT 1 FROM orders
           |  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
           |ORDER BY c_custkey""".stripMargin))

  // ---- set operations (I1-I3) --------------------------------------------

  private def custkeysOf(s: SparkSession, d: String, status: String): DataFrame =
    t(s, d, "orders").filter(col("o_orderstatus") === status).select(col("o_custkey"))

  /** I1 union-insert (SADD): SQL UNION dedups, so union + distinct. */
  val qUnion = QuerySpec(
    "q_union",
    (s, d) =>
      custkeysOf(s, d, "F").union(custkeysOf(s, d, "P"))
        .distinct().orderBy(col("o_custkey")),
    Some("""SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
           |UNION SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
           |ORDER BY o_custkey""".stripMargin))

  /** I2 except-remove (SRem): F-status customers minus the (rare)
    * P-status ones — non-empty at every scale factor. */
  val qExcept = QuerySpec(
    "q_except",
    (s, d) =>
      custkeysOf(s, d, "F").except(custkeysOf(s, d, "P"))
        .orderBy(col("o_custkey")),
    Some("""SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
           |EXCEPT SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
           |ORDER BY o_custkey""".stripMargin))

  /** I3 intersect-test (SIsMember). */
  val qIntersect = QuerySpec(
    "q_intersect",
    (s, d) =>
      custkeysOf(s, d, "F").intersect(custkeysOf(s, d, "O"))
        .orderBy(col("o_custkey")),
    Some("""SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
           |INTERSECT SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
           |ORDER BY o_custkey""".stripMargin))

  /** All relational specs, in SURVEY.md §7.3 order. */
  val all: Seq[QuerySpec] = Seq(
    qScanProject, qPointLookup, qPartitionPrune, qFilterPred, qPrefixFilter,
    qUrlFilter, qScalarHash, qStringFuncs, qTimeFuncs, qDedupDistinct,
    qFirstSeen, qGroupbyCount, qCountDistinct, qApproxDistinct, qRollup,
    qCollectSet, qSortLimit, qWindowRank, qWindowSession, qWindowBucket, qJoinInner,
    qBroadcastJoin, qOuterJoin, qSemiJoin, qAntiJoin, qUnion, qExcept,
    qIntersect)
}

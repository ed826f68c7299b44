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

  test("registerViews: the whole table surface is reachable from spark.sql") {
    Tables.registerViews(spark, sf0001)
    val n = spark.sql(
      "SELECT count(*) FROM documents JOIN embeddings ON doc_id = vec_id")
      .collect()(0).getLong(0)
    assert(n > 0)
    // the kernel registry composes with the SQL surface
    graft.functions.GraftFunctions.register(spark)
    val fp = spark.sql(
      "SELECT graft_fingerprint_md5(text) AS fp FROM documents LIMIT 1")
    assert(fp.collect()(0).getLong(0) != 0L)
    assert(Tables.names.forall(spark.catalog.tableExists))
  }

  test("specs are uniquely named and oracle keys are a subset") {
    val names = SparkEntry.specs.map(_.name)
    assert(names.distinct.size == names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("every declared query emits only atomic columns (driver-hash contract)") {
    // the driver loads each result into pandas and sorts on every
    // column; array/struct/map cells are unhashable there and abort the
    // whole verify pass (round-2 q_llm_mm_decode regression) —
    // serialize complex values (array_join etc.) before declaring
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val offenders = SparkEntry.specs.flatMap { q =>
      q.fn(spark, sf0001).schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
            f.dataType.isInstanceOf[MapType] ||
            f.dataType.isInstanceOf[StructType] => s"${q.name}.${f.name}"
      }
    }
    assert(offenders.isEmpty, s"complex output columns: $offenders")
  }

  test("q_window_session's gaps-and-islands equals native session_window") {
    import spark.implicits._
    // fixture with known sessions: user 1 has two (gap 45m), user 2 one
    val m = 60L * 1000 * 1000 // a minute in micros
    val ev = Seq(
      (1L, 0L * m), (1L, 10L * m), (1L, 20L * m),       // session A: 3 events
      (1L, 65L * m), (1L, 70L * m),                     // session B: 2 events
      (2L, 5L * m))                                     // session C: 1 event
      .toDF("user_id", "ts_us")
    val native = ev
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(min(col("ts_us")).as("session_start_us"),
        max(col("ts_us")).as("session_end_us"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_start_us"),
        col("session_end_us"), col("n_events"))
      .orderBy(col("user_id"), col("session_start_us"))
      .collect().toSeq
    // the declared query's manual formulation over the same rows
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
    val manual = ev
      .withColumn("prev", lag(col("ts_us"), 1).over(byUser))
      .withColumn("brk", when(col("prev").isNull ||
        col("ts_us") - col("prev") > 30L * m, 1L).otherwise(0L))
      .withColumn("session_no", sum(col("brk")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_no"))
      .agg(min(col("ts_us")).as("session_start_us"),
        max(col("ts_us")).as("session_end_us"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_start_us"),
        col("session_end_us"), col("n_events"))
      .orderBy(col("user_id"), col("session_start_us"))
      .collect().toSeq
    assert(native == manual, s"native $native vs manual $manual")
    assert(manual.map(_.getLong(3)).toSeq == Seq(3L, 2L, 1L))
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

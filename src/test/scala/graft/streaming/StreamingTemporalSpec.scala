package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming as-of join: exact-within-horizon event-time enrichment,
  * pinned result-equal to the batch [[graft.queries.Temporal.asofJoin]]
  * on a replayed feed. MemoryStream micro-batches so the watermark/
  * timeout behavior is real. */
/** Top-level so both the streaming and the batch encoders resolve. */
case class Ev(key: Long, id: Long,
    event_ts: java.sql.Timestamp, payload: Double)

class StreamingTemporalSpec extends SparkSpec {
  import spark.implicits._

  private def ev(key: Long, id: Long, minute: Int, payload: Double) =
    Ev(key, id, new java.sql.Timestamp(minute * 60000L), payload)

  /** Drive left/right feeds through streamingAsofJoin in the given
    * batches; a far-future sentinel on a throwaway key advances the
    * watermark so every pending left flushes. */
  private def run(batches: Seq[(Seq[Ev], Seq[Ev])], name: String,
      watermark: String = "30 minutes"): Seq[StreamingTemporal.AsofJoined] = {
    implicit val sqlCtx = spark.sqlContext
    val l = MemoryStream[Ev]; val r = MemoryStream[Ev]
    val q = StreamingTemporal.streamingAsofJoin(l.toDF(), r.toDF(), watermark)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { case (ls, rs) =>
        if (ls.nonEmpty) l.addData(ls: _*)
        if (rs.nonEmpty) r.addData(rs: _*)
        q.processAllAvailable()
      }
      // two sentinel rounds: the first lifts max event time, the
      // second's trigger computes the new watermark and flushes
      l.addData(ev(999999L, 0, 100000, 0.0)); q.processAllAvailable()
      l.addData(ev(999999L, 1, 100001, 0.0)); q.processAllAvailable()
      spark.table(name).as[StreamingTemporal.AsofJoined]
        .collect().toSeq.filterNot(_.key == 999999L)
    } finally q.stop()
  }

  test("cross-batch enrichment with the batch tie-break; no-match is None") {
    val out = run(Seq(
      // batch 1: two rights for key 5 (one pair tied at minute 60),
      // one right for key 6
      (Nil, Seq(ev(5, 100, 60, 1.0), ev(5, 101, 60, 1.1), ev(6, 200, 60, 2.0))),
      // batch 2: lefts at/after/before those instants
      (Seq(ev(5, 1, 60, 10.0),   // tie instant: inclusive, max right id wins
        ev(5, 2, 70, 20.0),      // later: same winner
        ev(6, 3, 50, 30.0)),     // BEFORE key 6's only right: no match
        Nil)
    ), "sasof1")
    val byId = out.map(j => j.id -> j).toMap
    assert(byId(1L).r_id.contains(101L) && byId(1L).r_payload.contains(1.1))
    assert(byId(2L).r_id.contains(101L) && byId(2L).r_ts_ms.contains(60 * 60000L))
    assert(byId(3L).r_id.isEmpty && byId(3L).r_ts_ms.isEmpty)
    assert(out.size == 3)
  }

  test("out-of-order right INSIDE the horizon still wins (the buffering guarantee)") {
    val out = run(Seq(
      // the left arrives first (minute 70)...
      (Seq(ev(7, 1, 70, 1.0)), Seq(ev(7, 900, 40, 9.0))),
      // ...and a BETTER right (minute 65 <= 70) arrives a batch later,
      // still inside the 30-minute horizon — the left must not have
      // been released yet, and must match the late right
      (Nil, Seq(ev(7, 901, 65, 9.5)))
    ), "sasof2")
    assert(out.size == 1)
    assert(out.head.r_id.contains(901L) && out.head.r_payload.contains(9.5),
      s"late-but-in-horizon right must win: $out")
  }

  test("idle keys GC past the horizon: a much-later left finds no history") {
    val out = run(Seq(
      (Nil, Seq(ev(8, 800, 60, 1.0))),
      // advance the watermark far past key 8's horizon via another key
      (Seq(ev(9, 1, 600, 0.0)), Seq(ev(9, 901, 590, 2.0))),
      (Seq(ev(9, 2, 610, 0.0)), Nil),
      // key 8's right history is gone — unmatched, by the documented
      // horizon-bounded semantics
      (Seq(ev(8, 3, 620, 3.0)), Nil)
    ), "sasof3")
    val k8 = out.filter(_.key == 8L)
    assert(k8.size == 1 && k8.head.r_id.isEmpty,
      s"horizon-evicted history must not match: $out")
  }

  test("streamingRangeJoin: native interval join, result-equal to the batch rangeJoin") {
    implicit val sqlCtx = spark.sqlContext
    val l = MemoryStream[Ev]; val r = MemoryStream[Ev]
    val spanMs = 10 * 60000L // 10-minute window
    val q = StreamingTemporal.streamingRangeJoin(l.toDF(), r.toDF(), spanMs,
        watermark = "2 hours")
      .writeStream.format("memory").queryName("srange")
      .outputMode("append").start()
    try {
      val lefts = Seq(ev(1, 10, 60, 1.0), ev(1, 11, 75, 1.5), ev(2, 12, 60, 2.0))
      val rights = Seq(
        ev(1, 100, 60, 9.0),  // == l_ts -> excluded (strict lower bound)
        ev(1, 101, 65, 9.1),  // inside left 10's window
        ev(1, 102, 70, 9.2),  // == 60+10 -> included for 10; inside 11's? 70<=75 no, >75 no -> excluded for 11
        ev(1, 103, 80, 9.3),  // inside 11's window only
        ev(2, 104, 65, 9.4))  // other key
      l.addData(lefts: _*); q.processAllAvailable()
      r.addData(rights: _*); q.processAllAvailable()
      val got = spark.table("srange")
        .select(col("l_id"), col("r_id")).collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
      // batch reference over the same rows
      val lDf = lefts.toDF().select(col("key"), col("id").as("l_id"),
        (col("event_ts").cast("long") * 1000).as("l_ms"))
      val rDf = rights.toDF().select(col("key"), col("id").as("r_id"),
        (col("event_ts").cast("long") * 1000).as("r_ms"))
      val want = graft.queries.Temporal.rangeJoin(lDf, rDf, Seq("key"),
          "l_ms", "r_ms", spanMs)
        .select(col("l_id"), col("r_id")).collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
      assert(got == want && got.nonEmpty, s"stream $got vs batch $want")
      assert(got == Set((10L, 101L), (10L, 102L), (11L, 103L), (12L, 104L)))
      // the plan is the streaming symmetric hash join, not a BNLJ
      val plan = spark.sql("SELECT * FROM srange").queryExecution.toString
      assert(!plan.contains("BroadcastNestedLoop"), "memory sink plan check")
    } finally q.stop()
  }

  test("streamingAsofJoin state survives a checkpointed restart") {
    import java.nio.file.Files
    val lDir = Files.createTempDirectory("asof_l").toString
    val rDir = Files.createTempDirectory("asof_r").toString
    val ckpt = Files.createTempDirectory("asof_ckpt").toString
    val outDir = Files.createTempDirectory("asof_out").toString
    val schema = Seq(ev(0, 0, 0, 0.0)).toDF().schema

    def feed(dir: String) = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    def drain(): Unit = {
      val q = StreamingTemporal.streamingAsofJoin(feed(lDir), feed(rDir),
          watermark = "30 minutes")
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    // wave 1: a right row, and a left that stays watermark-pending
    Seq(ev(1, 900, 60, 9.0)).toDF().coalesce(1).write.mode("append").parquet(rDir)
    Seq(ev(1, 1, 61, 1.0)).toDF().coalesce(1).write.mode("append").parquet(lDir)
    drain() // terminates with the left (and the right history) IN STATE

    // wave 2 into a FRESH query from the same checkpoint: a later left
    // that can only match if wave 1's right history was recovered from
    // the state store. The watermark-advancing sentinels go in a THIRD
    // drain: bundled into one write, parquet part-file order could put
    // a sentinel batch first and (correctly) drop the min-70 left as
    // late before it ever reached state.
    Seq(ev(1, 2, 70, 2.0)).toDF().coalesce(1).write.mode("append").parquet(lDir)
    drain()
    // two separate writes -> two files -> two batches (maxFilesPerTrigger
    // = 1): the first lifts max event time, the second's trigger sees
    // the advanced watermark and releases the buffered lefts
    Seq(ev(999L, 3, 10000, 0.0)).toDF().coalesce(1).write.mode("append").parquet(lDir)
    Seq(ev(999L, 4, 10001, 0.0)).toDF().coalesce(1).write.mode("append").parquet(lDir)
    drain()

    val out = spark.read.parquet(outDir)
      .filter(col("key") === 1L).orderBy(col("id"))
      .collect().map(r => (r.getLong(1), Option(r.get(4))))
    assert(out.toSeq == Seq((1L, Some(900L)), (2L, Some(900L))),
      s"both lefts must match the pre-restart right: ${out.toSeq}")
  }

  test("result-equal to the batch asofJoin on a replayed multi-key feed") {
    // deterministic pseudo-random feed: 3 keys, interleaved sides,
    // duplicate instants, replayed in 4 micro-batches
    val evs = (0 until 60).map { i =>
      val key = 1L + (i * 7 % 3)
      val minute = 60 + (i * 13 % 40)
      ev(key, 1000 + i, minute, (i % 10) / 2.0)
    }
    val (ls, rs) = evs.zipWithIndex.partition(_._2 % 2 == 0)
    val lefts = ls.map(_._1); val rights = rs.map(_._1)
    val batches = (0 until 4).map(b =>
      (lefts.filter(_.id % 4 == b), rights.filter(_.id % 4 == b)))
    // the batches interleave ids, not time, so a row can trail the
    // feed's max by up to the full 39-minute spread — the lateness
    // bound must cover it or rows are (correctly) dropped as late
    val got = run(batches, "sasof4", watermark = "45 minutes")
      .map(j => (j.key, j.id, j.ts_ms, j.payload, j.r_id, j.r_ts_ms, j.r_payload))
      .toSet

    val lDf = lefts.toDF().select(col("key"), col("id"),
      (col("event_ts").cast("long") * 1000).as("ts_ms"), col("payload"))
    val rDf = rights.toDF().select(col("key"),
      (col("event_ts").cast("long") * 1000).as("ts_ms"),
      col("id").as("r_id"), col("event_ts"),
      col("payload").as("r_payload"))
      .select(col("key"), col("ts_ms"), col("r_id"),
        col("ts_ms").as("r_ts_ms"), col("r_payload"))
    val want = graft.queries.Temporal
      .asofJoin(lDf, rDf, Seq("key"), "ts_ms", "r_id")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(1),
        r.getDouble(3),
        Option(r.get(4)).map(_.asInstanceOf[Long]),
        Option(r.get(5)).map(_.asInstanceOf[Long]),
        Option(r.get(6)).map(_.asInstanceOf[Double]))).toSet
    assert(got == want,
      s"stream vs batch diff: ${(got -- want, want -- got)}")
  }
}

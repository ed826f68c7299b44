package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.queries.Temporal.asofJoin]]: continuous
  * event-time as-of enrichment of a left stream against a right
  * stream, EXACT within the lateness horizon.
  *
  * The batch as-of is a window over a completed frame; a stream can't
  * sort the future, so exactness needs buffering: a left row at time L
  * is only safe to enrich once the watermark has passed L — any right
  * row still to arrive must carry a time beyond the watermark, hence
  * beyond L, hence cannot be its at-or-before match. So the state per
  * key holds (a) the pending left rows the watermark hasn't released
  * and (b) the right history, pruned to ONE settled row at-or-before
  * the watermark (the only one any future left can prefer) plus the
  * still-unsettled tail. Out-of-order arrivals inside the horizon are
  * therefore handled exactly — a right row arriving AFTER a pending
  * left it precedes still wins — which is the Flink temporal-join
  * guarantee, delivered here with flatMapGroupsWithState.
  *
  * Scale shape: state is keyed on the join key; per key it holds the
  * horizon's worth of pending lefts plus a right history that prunes
  * to (settled best + unsettled tail) on every trigger, so 24/7 state
  * is bounded by lateness horizon × per-key arrival rate, never by
  * stream length ([[graft.llm.StreamingCuration]]'s state stance).
  * Keys idle past the horizon drop their state entirely; a left
  * arriving after that finds no history and emits unmatched — the
  * same horizon-bounded semantics as streamingExactDedup, with the
  * nightly batch as-of restoring global exactness downstream.
  *
  * Semantics pinned result-equal to the batch operator
  * (StreamingTemporalSpec): at-or-before boundary inclusive, ties
  * between right rows at one instant resolve to the greatest id,
  * unmatched lefts survive with nulls (left-outer).
  */
object StreamingTemporal {

  /** Streaming twin of [[graft.queries.Temporal.rangeJoin]] — and the
    * deliberate contrast to [[streamingAsofJoin]]: the batch range
    * join needed the binned-equi rewrite (Spark's batch planner turns
    * an inequality join into a BNLJ), but Structured Streaming's
    * stream-stream join NATIVELY supports time-interval conditions —
    * the watermark plus the `(t, t+span]` bounds tell the symmetric
    * hash join exactly when each side's state is droppable, so the
    * built-in operator is already the scalable form and a custom
    * rewrite would only obscure it. Both inputs need (key, id,
    * event_ts, payload); output is one row per qualifying pair,
    * result-equal to the batch operator on a replayed feed
    * (StreamingTemporalSpec).
    *
    * Scale shape: state on each side is horizon-bounded by the join's
    * own time bounds (left rows expire once the right watermark
    * passes `t + span`, right rows once the left watermark passes
    * their instant); shuffle is the key-hash exchange both sides pay
    * once. */
  def streamingRangeJoin(left: DataFrame, right: DataFrame, spanMs: Long,
      watermark: String = "1 hour"): DataFrame = {
    require(spanMs > 0L, "span must be positive")
    val l = left.select(col("key"), col("id").as("l_id"),
      col("event_ts").as("l_ts"), col("payload").as("l_payload"))
      .withWatermark("l_ts", watermark)
    val r = right.select(col("key").as("r_key"), col("id").as("r_id"),
      col("event_ts").as("r_ts"), col("payload").as("r_payload"))
      .withWatermark("r_ts", watermark)
    l.join(r,
      col("key") === col("r_key") &&
        col("r_ts") > col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL ${spanMs} MILLISECOND"))
      .select(col("key"), col("l_id"), col("l_ts"), col("l_payload"),
        col("r_id"), col("r_ts"), col("r_payload"))
  }

  /** One tagged input event (side 1 = left/probe, 0 = right/build). */
  case class AsofEvent(key: Long, side: Int, id: Long,
      event_ts: java.sql.Timestamp, payload: Double)

  /** One enriched left row; `r_*` are None when no right row at or
    * before `ts_ms` was inside the horizon. */
  case class AsofJoined(key: Long, id: Long, ts_ms: Long, payload: Double,
      r_id: Option[Long], r_ts_ms: Option[Long], r_payload: Option[Double])

  /** Keyed state: right history + watermark-pending lefts, both as
    * (tsMs, id, payload). */
  case class AsofState(rights: List[(Long, Long, Double)],
      lefts: List[(Long, Long, Double)], maxTsMs: Long)

  /** Both inputs need columns (key: long, id: long, event_ts:
    * timestamp, payload: double); rename/pack upstream. `watermark`
    * is both the lateness bound and the idle-key state horizon. */
  def streamingAsofJoin(left: DataFrame, right: DataFrame,
      watermark: String = "1 hour"): Dataset[AsofJoined] = {
    val spark = left.sparkSession
    import spark.implicits._
    val horizonMs = graft.llm.StreamingCuration.horizonMsOf(watermark)
    val cols = Seq("key", "side", "id", "event_ts", "payload")

    val tagged = left
      .select(col("key"), lit(1).as("side"), col("id"), col("event_ts"),
        col("payload"))
      .unionByName(right.select(col("key"), lit(0).as("side"), col("id"),
        col("event_ts"), col("payload")))
      .select(cols.map(col): _*)
      .withWatermark("event_ts", watermark)
      .as[AsofEvent]

    val tupleOrd = Ordering.Tuple2[Long, Long]

    tagged
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: Long, it: Iterator[AsofEvent], state: GroupState[AsofState]) => {
          val prev = state.getOption.getOrElse(AsofState(Nil, Nil, 0L))
          var rights = prev.rights
          var lefts = prev.lefts
          var maxTs = prev.maxTsMs
          it.foreach { e =>
            val ts = e.event_ts.getTime
            maxTs = math.max(maxTs, ts)
            if (e.side == 0) rights = (ts, e.id, e.payload) :: rights
            else lefts = (ts, e.id, e.payload) :: lefts
          }
          val wm = state.getCurrentWatermarkMs()
          // Release lefts STRICTLY below the watermark: Spark admits
          // rows at exactly the watermark, so a right at ts == wm can
          // still arrive and must be able to match a left at the same
          // instant (inclusive at-or-before boundary).
          val (ready, pending) = lefts.partition(_._1 < wm)
          val out = ready.sortBy(l => (l._1, l._2)).map { case (lts, lid, lp) =>
            val cands = rights.filter(_._1 <= lts)
            if (cands.isEmpty) AsofJoined(key, lid, lts, lp, None, None, None)
            else {
              val (rts, rid, rp) =
                cands.maxBy(r => (r._1, r._2))(tupleOrd)
              AsofJoined(key, lid, lts, lp, Some(rid), Some(rts), Some(rp))
            }
          }
          // Prune right history: any future or pending left carries
          // ts >= wm, so of the rights at-or-below the watermark only
          // the greatest-(ts, id) one can ever win again.
          val (unsettled, settled) = rights.partition(_._1 >= wm)
          rights =
            if (settled.isEmpty) unsettled
            else settled.maxBy(r => (r._1, r._2))(tupleOrd) :: unsettled
          lefts = pending
          if (lefts.isEmpty && wm >= maxTs + horizonMs) {
            state.remove() // idle key past the horizon: full GC
          } else {
            state.update(AsofState(rights, lefts, maxTs))
            // wake when the watermark can release the earliest pending
            // left; with none pending, at the idle-GC horizon
            val next =
              if (lefts.nonEmpty) lefts.map(_._1).min + 1
              else maxTs + horizonMs
            state.setTimeoutTimestamp(math.max(next, wm + 1))
          }
          out.iterator
        })
  }
}

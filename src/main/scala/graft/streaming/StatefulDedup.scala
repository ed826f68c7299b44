package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** First-seen dedup with state TTL at domain expiry (SURVEY.md §2.E
  * E1+E2, §2.J J6) — the one genuinely custom stateful operator.
  *
  * The reference gates every store on `WasUnknown(serial)`
  * (knowncertificates.go:38-55): true exactly once per
  * (expDate, issuer, serial), and the Redis dedup set is told to
  * expire at the key's own expiration bucket START — `ExpireAt`
  * passes `ExpDate.ExpireTime()`, the hour-truncated bucket time
  * itself (knowncertificates.go:98-104, types.go:371-373; pinned by
  * Test_ExpireAt: notAfter 04:22:19 → expiry 04:00:00) — state
  * eviction keyed to FUTURE event-domain time, not arrival time. A
  * plain watermark can't express "evict when the key's own expiry
  * passes", so this uses flatMapGroupsWithState with
  * EventTimeTimeout: the timeout timestamp for each key is its own
  * `exp_date` bucket start; once the watermark passes that, the
  * state is dropped.
  *
  * Known window (inherited from the reference): during the key's
  * FINAL HOUR — between the bucket start, when state evicts, and
  * `not_after`, when the expiry filter (C2) starts dropping the cert
  * — a late duplicate is neither state-suppressed nor C2-filtered
  * and is re-admitted. Downstream maintenance restores the
  * triple-key uniqueness invariant (IngestJob.compact dedups on the
  * triple key), matching the reference, whose per-path file store
  * makes the re-admitted write idempotent.
  */
object StatefulDedup {

  /** Emit the first row per key; suppress the rest while state lives.
    * `expiryMs(key)` = the key's own domain-expiry instant (the
    * bucket START, `ExpireTime()` semantics), which becomes the state
    * timeout. */
  def firstSeen[K, V](
      ds: Dataset[V], key: V => K, expiryMs: K => Long)(
      implicit ke: Encoder[K], ve: Encoder[V]): Dataset[V] = {
    implicit val stateEncoder: Encoder[Boolean] = Encoders.scalaBoolean
    ds.groupByKey(key)
      .flatMapGroupsWithState[Boolean, V](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (k: K, rows: Iterator[V], state: GroupState[Boolean]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else if (state.exists) {
            Iterator.empty // seen before: suppress every duplicate
          } else if (rows.hasNext) {
            state.update(true)
            // evict when this key's own expiration bucket STARTS
            state.setTimeoutTimestamp(math.max(expiryMs(k),
              state.getCurrentWatermarkMs() + 1))
            Iterator.single(rows.next())
          } else Iterator.empty
      }
  }
}

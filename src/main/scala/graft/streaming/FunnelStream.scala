package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.Relational.funnel]]: per-user
  * conversion-funnel state maintained incrementally over the event
  * stream with `mapGroupsWithState` — each micro-batch folds its
  * (time-sorted) events into the user's acceptance list exactly like
  * one step of the batch fold, so for IN-ORDER delivery (each batch's
  * event times at or after the previous batch's — the shape a
  * replayed log or a watermark-ordered upstream produces) the final
  * state equals the one-shot batch funnel, spec- and oracle-pinned.
  *
  * Honesty note (same class of declared trade as
  * [[NearDupGate]]'s accepted-only state): a stage event that arrives
  * in an EARLIER batch than its logically-preceding stage (cross-batch
  * reordering) is gone by the time the earlier stage lands — streams
  * cannot revisit. The exact-under-reordering form buffers events in
  * state until the watermark passes and folds only then (state =
  * O(buffered window) per user, not O(stages)); this twin is the
  * O(stages)-state in-order form.
  *
  * State is O(stages) longs per user — the minimal funnel state — and
  * `seen` (events folded so far) strictly increases, so the LAST
  * emission per user is its final state (the replay harness keys on
  * `max(seen)`).
  */
object FunnelStream {

  /** Input row: event time pre-converted to epoch micros
    * (`unix_micros`) so state holds pure longs — no Timestamp
    * encoder subtleties, and the strictly-after compare is exact at
    * full precision.
    */
  final case class FunnelEvent(
      user_id: Long,
      event_type: String,
      event_id: Long,
      ts_us: Long)

  /** Per-user funnel progress: acceptance times (micros, one per
    * reached stage) and the count of events folded so far.
    */
  final case class FunnelState(reached: Seq[Long], seen: Long)

  /** One emission per (user, micro-batch with data for that user). */
  final case class FunnelRow(user_id: Long, reached: Seq[Long], seen: Long)

  /** Incremental funnel fold (run the query in Update output mode). */
  def fold(events: Dataset[FunnelEvent], stages: Seq[String]): Dataset[FunnelRow] = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (user: Long, rows: Iterator[FunnelEvent], state: GroupState[FunnelState]) => {
          val prev = state.getOption.getOrElse(FunnelState(Seq.empty, 0L))
          var acc = prev.reached
          var seen = prev.seen
          // batch-local sort = the batch fold's time order; ties on
          // event_id for a total order (same tiebreak as batch)
          rows.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
            seen += 1
            if (acc.length < stages.length &&
                e.event_type == stages(acc.length) &&
                (acc.isEmpty || e.ts_us > acc.last))
              acc = acc :+ e.ts_us
          }
          val next = FunnelState(acc, seen)
          state.update(next)
          FunnelRow(user, next.reached, next.seen)
        })
  }

  /** Input row for [[foldExact]]: a real timestamp column, because
    * the watermark tracks it.
    */
  final case class FunnelEventT(
      user_id: Long,
      event_type: String,
      event_id: Long,
      ts: java.sql.Timestamp)

  /** [[fold]] state plus the not-yet-finalized buffer:
    * `(ts_us, event_id, event_type)` triples newer than the
    * watermark.
    */
  final case class ExactState(
      folded: Seq[Long],
      seen: Long,
      buf: Seq[(Long, Long, String)])

  private def tsUs(t: java.sql.Timestamp): Long =
    (t.getTime / 1000L) * 1000000L + t.getNanos / 1000L

  /** EXACT-under-reordering streaming funnel: events buffer in state
    * until the watermark passes them, then fold in global
    * `(event time, event_id)` order — so any cross-batch reordering
    * the watermark contract admits (late by ≤ `delay`) produces the
    * SAME final state as the one-shot batch fold, spec-pinned under
    * an adversarial parity split. This is the trade [[fold]]
    * documents: exactness costs O(events inside the lateness window)
    * state per user instead of O(stages).
    *
    * Mechanics: each invocation banks incoming events, finalizes the
    * buffered prefix strictly older than the current watermark, and
    * arms an event-time timeout at the earliest still-buffered event
    * so the group is re-invoked (and drains) when the watermark
    * passes it even if no new data arrives. Strictly-older (not
    * older-or-equal) because rows AT the watermark may still arrive;
    * a replay harness flushes the tail by appending one
    * past-every-event sentinel per user (any non-stage type) and
    * letting the closing no-data batch fire the timeouts.
    */
  def foldExact(
      events: Dataset[FunnelEventT],
      stages: Seq[String],
      delay: String): Dataset[FunnelRow] = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", delay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.EventTimeTimeout)(
        (user: Long, rows: Iterator[FunnelEventT], state: GroupState[ExactState]) => {
          val st = state.getOption.getOrElse(ExactState(Seq.empty, 0L, Seq.empty))
          val incoming = rows.map(e => (tsUs(e.ts), e.event_id, e.event_type)).toSeq
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (ready, hold) = (st.buf ++ incoming).partition(_._1 < wmUs)
          var acc = st.folded
          var seen = st.seen
          ready.sortBy(t => (t._1, t._2)).foreach { case (ts, _, et) =>
            seen += 1
            if (acc.length < stages.length && et == stages(acc.length) &&
                (acc.isEmpty || ts > acc.last))
              acc = acc :+ ts
          }
          state.update(ExactState(acc, seen, hold))
          if (hold.nonEmpty)
            state.setTimeoutTimestamp(math.max(
              hold.map(_._1).min / 1000L + 1L,
              state.getCurrentWatermarkMs() + 1L))
          Iterator.single(FunnelRow(user, acc, seen))
        })
  }
}

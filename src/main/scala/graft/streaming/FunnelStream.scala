package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

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
}

package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.util.LongAccumulator

/** Last-touch attribution for STREAMS — the live twin of the
  * oracle-checked batch `EventQueries.eventsAttribution`: maintain
  * each user's most recent click/view frontier and credit every
  * arriving purchase to whichever touched LAST within the 7-day
  * lookback (or `direct`), emitting one credit row per purchase as it
  * happens — the shape a marketing pipeline needs live, not in a
  * nightly rollup.
  *
  * Semantics are the batch window's, bit for bit, including its
  * documented quirk: a within-lookback click LOSES to a newer view
  * even when that view has itself aged OUT of the lookback (the
  * `last_click >= last_view` guard fires before the view's own
  * lookback test) — the spec replays the real corpus and diffs
  * per-purchase channels against an independent fold plus the batch
  * query's channel rollup. Events are folded per user in `(s,
  * event_id)` order within each micro-batch, so a replayed log
  * produces exactly the batch verdicts; cross-batch late data is
  * bounded by the watermark like every stateful operator here.
  *
  * State is TWO timestamps + a frontier per user, and it expires: the
  * event-time timeout fires once the watermark passes the user's last
  * activity + lookback, when no future purchase could credit the
  * stored touches anyway — state is bounded by ACTIVE users in the
  * lookback horizon, not by all users ever seen (the
  * [[StreamTopPaths]] lesson). The timeout clamps to just past the
  * current watermark for users already beyond the horizon, so a long-
  * idle user's state drops on the next trigger instead of throwing on
  * a stale timestamp.
  *
  * Exact batch parity requires IN-ORDER replay across micro-batches:
  * a touch that arrives within the watermark but in a LATER batch
  * than a same-user event it precedes mutates the frontier after
  * earlier purchases were already credited, so the live credits
  * silently diverge from the batch query. The optional `lateTouches`
  * accumulator counts exactly those events (event time behind the
  * user's already-advanced frontier at batch entry) so an operator
  * can tell when live output is no longer batch-reconcilable —
  * `lateTouches == 0` over a replay certifies parity; a non-zero
  * count says "reconcile against the nightly batch rollup instead".
  * (Task retries can over-count the accumulator; it is a detection
  * signal, not an exact ledger.)
  */
object StreamAttribution {

  /** Lookback shared with the batch twin — one constant, no drift. */
  val LookbackS: Long = graft.analytics.EventQueries.LookbackS

  final case class Touch(userId: Long, eventId: Long, eventType: String,
      valueMilli: Long, s: Long, et: java.sql.Timestamp)

  final case class TState(lastClick: Option[Long], lastView: Option[Long],
      lastSeenS: Long)

  final case class Credit(userId: Long, eventId: Long, channel: String,
      valueMilli: Long)

  def apply(stream: Dataset[Touch],
      watermark: String = "10 seconds",
      lateTouches: Option[LongAccumulator] = None): Dataset[Credit] = {
    import stream.sparkSession.implicits._
    stream.withWatermark("et", watermark)
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, it: Iterator[Touch], state: GroupState[TState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var st = state.getOption
              .getOrElse(TState(None, None, Long.MinValue))
            // frontier as of batch ENTRY: any event older than this
            // arrived out of order across micro-batches — the case
            // where live credits can diverge from the batch query
            val frontierAtEntry = st.lastSeenS
            val out = Vector.newBuilder[Credit]
            // fold in event order: same-second ties resolve on
            // event_id, exactly the batch window's ORDER BY (s, eid)
            it.toSeq.sortBy(t => (t.s, t.eventId)).foreach { t =>
              if (t.s < frontierAtEntry) lateTouches.foreach(_.add(1L))
              t.eventType match {
                case "click" =>
                  st = st.copy(lastClick =
                    Some(st.lastClick.fold(t.s)(math.max(_, t.s))))
                case "view" =>
                  st = st.copy(lastView =
                    Some(st.lastView.fold(t.s)(math.max(_, t.s))))
                case "purchase" =>
                  val within = (x: Option[Long]) =>
                    x.exists(v => t.s - v <= LookbackS)
                  val ch =
                    if (within(st.lastClick) && (st.lastView.isEmpty ||
                      st.lastClick.get >= st.lastView.get)) "click"
                    else if (within(st.lastView)) "view"
                    else "direct"
                  out += Credit(uid, t.eventId, ch, t.valueMilli)
                case _ => () // unknown types advance the frontier only
              }
              st = st.copy(lastSeenS = math.max(st.lastSeenS, t.s))
            }
            state.update(st)
            // expire once no future purchase could use these touches;
            // clamp past the watermark so stale users drop next
            // trigger instead of failing the timestamp precondition
            state.setTimeoutTimestamp(math.max(
              (st.lastSeenS + LookbackS + 1L) * 1000L,
              state.getCurrentWatermarkMs() + 1L))
            out.result().iterator
          }
      }
  }
}

package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch `events_gapfill` query: per-key hourly
  * buckets where a SILENT hour emits an explicit zero row instead of
  * vanishing — the freshness signal a monitoring pipeline needs while
  * the stream is live, not after the fact.
  *
  * Semantics: for each key, every hour from the key's first event
  * hour onward is emitted exactly once, in order, as soon as the
  * watermark passes the hour's end — with the hour's (count, sum) or
  * (0, 0.0) if the key was silent. This is exactly the batch query's
  * per-key slice of its dense spine, restricted to hours the
  * watermark has closed (spec-proven: StreamGapfillSpec replays one
  * timeline through both paths and diffs).
  *
  * Mechanics: `flatMapGroupsWithState` with an event-time timeout.
  * State per key is only the next unemitted hour plus the pending
  * (count, sum) for hours the watermark has not yet closed — bounded
  * by the watermark delay, NOT by stream length. The timeout re-arms
  * at the next hour boundary, so zero rows flow even when the key
  * receives no events at all (that is the part a windowed aggregation
  * cannot express: it has no rows to window). Late events past the
  * watermark are dropped by the operator, matching the append-mode
  * contract of every other stateful op here.
  */
object StreamGapfill {

  val HourMs: Long = 3600L * 1000L

  final case class Bucket(eventType: String, hour: Timestamp, n: Long,
      sumValue: Double)

  /** (next hour to emit, pending per open hour, whether anything has
    * been emitted yet). Pending is keyed by hour-start millis; size ≤
    * watermarkDelay/1h + 1. Before the first emission `nextHourMs` is
    * merely the earliest hour SEEN, and a non-late out-of-order event
    * may still lower it; once emission starts it is the frontier and
    * anything behind it is by construction behind the watermark.
    */
  final case class GapState(nextHourMs: Long,
      pending: Map[Long, (Long, Double)], emitted: Boolean)

  private def hourFloor(ms: Long): Long = ms - math.floorMod(ms, HourMs)

  /** Wire the operator over a stream keyed by `eventType` with event
    * time `ts` and a payload `value`. The input MUST already carry a
    * watermark on `ts` (the caller owns the delay trade-off).
    */
  def apply(events: Dataset[(Timestamp, String, Double)])
      : Dataset[Bucket] = {
    implicit val stateEnc: Encoder[GapState] = Encoders.product[GapState]
    implicit val outEnc: Encoder[Bucket] = Encoders.product[Bucket]
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    events
      .groupByKey(_._2)
      .flatMapGroupsWithState[GapState, Bucket](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: String, evs: Iterator[(Timestamp, String, Double)],
            state: GroupState[GapState]) =>
          val wm = state.getCurrentWatermarkMs()
          var st = state.getOption.getOrElse(GapState(-1L, Map.empty, false))
          // fold the micro-batch into pending hour buckets
          val newEvs = evs.toSeq
          if (newEvs.nonEmpty) {
            var pending = st.pending
            var first = st.nextHourMs
            newEvs.foreach { case (ts, _, v) =>
              val h = hourFloor(ts.getTime)
              // an hour behind the frontier was only truly emitted if
              // emission has started; before that, a non-late
              // out-of-order event legitimately extends the spine down
              if (h >= st.nextHourMs || !st.emitted) {
                val (n0, s0) = pending.getOrElse(h, (0L, 0.0))
                pending = pending + (h -> (n0 + 1L, s0 + v))
                if (first < 0L || h < first) first = h
              }
            }
            st = GapState(first, pending, st.emitted)
          }
          // emit every hour the watermark has closed, silent ones as 0
          val out = Vector.newBuilder[Bucket]
          if (st.nextHourMs >= 0L) {
            var h = st.nextHourMs
            var pending = st.pending
            while (h + HourMs <= wm) {
              val (n, s) = pending.getOrElse(h, (0L, 0.0))
              out += Bucket(key, new Timestamp(h), n, s)
              pending -= h
              h += HourMs
            }
            st = GapState(h, pending, st.emitted || h > st.nextHourMs)
            state.update(st)
            // re-arm: wake when the watermark passes the next hour end,
            // even if no further event for this key ever arrives
            state.setTimeoutTimestamp(st.nextHourMs + HourMs)
          }
          out.result().iterator
      }
  }
}

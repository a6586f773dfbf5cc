package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch `events_ewma` recursive-CTE query: a
  * per-key exponentially-weighted moving average of hourly volume,
  * maintained INCREMENTALLY as the watermark closes each hour — the
  * smoothed load signal an alerting pipeline reads live, with silent
  * hours decaying the average through explicit zero steps exactly as
  * the batch recurrence does.
  *
  * The recurrence is the batch query's, verbatim: fixed-point ×8
  * integers, `e' = (e·7)/8 + n·8`, seeded at the key's first closed
  * hour with `n·8`. A multiplicative carry is exactly what windowed
  * streaming aggregation cannot express (every output depends on the
  * whole prefix) and what `flatMapGroupsWithState` holds as ONE long
  * per key — state is the EWMA accumulator plus the open-hour counts
  * bounded by the watermark delay, not stream length.
  *
  * Mechanics mirror [[StreamGapfill]] (frontier + pending + event-time
  * timeout re-armed at the next hour close, pre-emission out-of-order
  * lowering); the spec proves stream/batch agreement by replaying one
  * timeline through both and folding the dense spine.
  */
object StreamEwma {

  val HourMs: Long = 3600L * 1000L

  final case class EwmaPoint(eventType: String, hour: Timestamp, n: Long,
      ewmaFp8: Long)

  /** (frontier hour, open-hour counts, EWMA accumulator ×8, whether
    * anything has been emitted). Before first emission the frontier is
    * only the earliest hour SEEN and may still move down on a non-late
    * out-of-order event; after, it is authoritative.
    */
  final case class EwmaState(nextHourMs: Long, pending: Map[Long, Long],
      ewmaFp8: Long, emitted: Boolean)

  private def hourFloor(ms: Long): Long = ms - math.floorMod(ms, HourMs)

  /** Wire over a stream of (event time, key). The input MUST already
    * carry a watermark on `_1`.
    */
  def apply(events: Dataset[(Timestamp, String)]): Dataset[EwmaPoint] = {
    implicit val stateEnc: Encoder[EwmaState] = Encoders.product[EwmaState]
    implicit val outEnc: Encoder[EwmaPoint] = Encoders.product[EwmaPoint]
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    events
      .groupByKey(_._2)
      .flatMapGroupsWithState[EwmaState, EwmaPoint](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: String, evs: Iterator[(Timestamp, String)],
            state: GroupState[EwmaState]) =>
          val wm = state.getCurrentWatermarkMs()
          var st = state.getOption
            .getOrElse(EwmaState(-1L, Map.empty, 0L, false))
          val newEvs = evs.toSeq
          if (newEvs.nonEmpty) {
            var pending = st.pending
            var first = st.nextHourMs
            newEvs.foreach { case (ts, _) =>
              val h = hourFloor(ts.getTime)
              if (h >= st.nextHourMs || !st.emitted) {
                pending = pending + (h -> (pending.getOrElse(h, 0L) + 1L))
                if (first < 0L || h < first) first = h
              }
            }
            st = EwmaState(first, pending, st.ewmaFp8, st.emitted)
          }
          val out = Vector.newBuilder[EwmaPoint]
          if (st.nextHourMs >= 0L) {
            var h = st.nextHourMs
            var pending = st.pending
            var e = st.ewmaFp8
            var emitted = st.emitted
            while (h + HourMs <= wm) {
              val n = pending.getOrElse(h, 0L)
              // batch recurrence verbatim: seed n·8, then decay+add
              e = if (!emitted) n * 8L else (e * 7L) / 8L + n * 8L
              out += EwmaPoint(key, new Timestamp(h), n, e)
              emitted = true
              pending -= h
              h += HourMs
            }
            st = EwmaState(h, pending, e, emitted)
            state.update(st)
            state.setTimeoutTimestamp(st.nextHourMs + HourMs)
          }
          out.result().iterator
      }
  }
}

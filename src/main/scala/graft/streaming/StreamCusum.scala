package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch `dq_cusum` change-point monitor: the
  * per-key one-sided CUSUM sums over hourly volume, maintained
  * INCREMENTALLY as the watermark closes each hour — the live
  * sustained-shift detector, firing while the drift is happening
  * instead of at the nightly batch audit.
  *
  * The recurrence is the batch query's, verbatim: exact longs,
  * `pos' = max(0, pos + n − target − k)` / `neg' = max(0, neg +
  * target − n − k)`, alarm above 5k; silent hours step the sums with
  * an explicit n = 0 exactly like the batch walk's dense fill. The
  * ONE deliberate difference: the batch query derives (target, k)
  * from the full series it can see, while a stream cannot see the
  * future — so here the baseline is a PARAMETER, the trained-control
  * split every production CUSUM deployment makes (same
  * train-once/score-forever seam as
  * [[StreamCentroidAssign]] vs its batch trainer).
  *
  * A truncating max() recurrence is exactly what windowed streaming
  * aggregation cannot express (every output depends on the whole
  * prefix through the clamps); `flatMapGroupsWithState` holds it as
  * two longs per key. Mechanics mirror [[StreamEwma]]: frontier +
  * pending open-hour counts bounded by the watermark delay +
  * event-time timeout re-armed at the next hour close.
  */
object StreamCusum {

  val HourMs: Long = 3600L * 1000L

  final case class CusumPoint(eventType: String, hour: Timestamp, n: Long,
      cusumPos: Long, cusumNeg: Long, alarm: Boolean)

  /** (frontier hour, open-hour counts, pos/neg sums, emitted). Before
    * first emission the frontier may still move down on a non-late
    * out-of-order event; after, it is authoritative.
    */
  final case class CusumState(nextHourMs: Long, pending: Map[Long, Long],
      pos: Long, neg: Long, emitted: Boolean)

  private def hourFloor(ms: Long): Long = ms - math.floorMod(ms, HourMs)

  /** Wire over a stream of (event time, key). The input MUST already
    * carry a watermark on `_1`. `target` is the trained per-hour
    * baseline volume, `k` the slack (both exact longs, same roles as
    * the batch query's self-derived pair).
    */
  def apply(events: Dataset[(Timestamp, String)], target: Long,
      k: Long): Dataset[CusumPoint] = {
    require(k >= 1L, "slack k must be >= 1")
    implicit val stateEnc: Encoder[CusumState] = Encoders.product[CusumState]
    implicit val outEnc: Encoder[CusumPoint] = Encoders.product[CusumPoint]
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    events
      .groupByKey(_._2)
      .flatMapGroupsWithState[CusumState, CusumPoint](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: String, evs: Iterator[(Timestamp, String)],
            state: GroupState[CusumState]) =>
          val wm = state.getCurrentWatermarkMs()
          var st = state.getOption
            .getOrElse(CusumState(-1L, Map.empty, 0L, 0L, false))
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
            st = CusumState(first, pending, st.pos, st.neg, st.emitted)
          }
          val out = Vector.newBuilder[CusumPoint]
          if (st.nextHourMs >= 0L) {
            var h = st.nextHourMs
            var pending = st.pending
            var pos = st.pos
            var neg = st.neg
            var emitted = st.emitted
            while (h + HourMs <= wm) {
              val n = pending.getOrElse(h, 0L)
              // batch recurrence verbatim (seed state is (0, 0))
              pos = math.max(0L, pos + n - target - k)
              neg = math.max(0L, neg + target - n - k)
              out += CusumPoint(key, new Timestamp(h), n, pos, neg,
                pos > 5 * k || neg > 5 * k)
              emitted = true
              pending -= h
              h += HourMs
            }
            st = CusumState(h, pending, pos, neg, emitted)
            state.update(st)
            state.setTimeoutTimestamp(st.nextHourMs + HourMs)
          }
          out.result().iterator
      }
  }
}

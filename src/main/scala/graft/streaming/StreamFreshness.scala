package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch `dq_freshness` lag report: a per-key
  * SILENCE alarm. The batch query measures how far each stream's
  * newest event trails the table's high-water mark at audit time;
  * this operator fires WHILE the feed is down — when a key's
  * event-time frontier falls more than the SLO behind the watermark,
  * one `stale` alert is emitted (with the realized lag), and the
  * key's next event emits a `recovered` row carrying how long the
  * outage was. One alert per outage, not one per trigger: an
  * alerting pipeline wants edges, not levels.
  *
  * Why `flatMapGroupsWithState` and not a windowed aggregate: silence
  * produces NO rows, so no row-driven operator can speak when a feed
  * stops — only an event-time TIMEOUT (armed at last-seen + SLO,
  * re-armed on every event) turns the absence of data into a signal.
  * State is two fields per key (frontier, alerted flag); it must
  * outlive silence by design — a dead feed is exactly the thing
  * being watched — so state is |keys|-bounded, the same explicit
  * contract as [[StreamTopPaths]] documents for its suffixes.
  *
  * Determinism: lag is computed from the group-state watermark, which
  * is a pure function of the fed event times and the watermark delay;
  * replays produce identical alerts.
  */
object StreamFreshness {

  /** `kind` is "stale" (the feed went silent past the SLO; `lagS` =
    * watermark − frontier at detection) or "recovered" (a new event
    * arrived after an alert; `lagS` = how far the frontier jumped).
    */
  final case class Alert(eventType: String, kind: String,
      lastSeen: Timestamp, lagS: Long)

  /** Frontier (max event time ever seen, ms) + whether the current
    * outage has already alerted.
    */
  final case class FState(maxTsMs: Long, alerted: Boolean)

  /** Wire over a stream of (event time, key). The input MUST already
    * carry a watermark on `_1`; `sloMs` is the silence budget.
    */
  def apply(events: Dataset[(Timestamp, String)],
      sloMs: Long): Dataset[Alert] = {
    require(sloMs > 0L, "slo must be positive")
    implicit val stateEnc: Encoder[FState] = Encoders.product[FState]
    implicit val outEnc: Encoder[Alert] = Encoders.product[Alert]
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    events
      .groupByKey(_._2)
      .flatMapGroupsWithState[FState, Alert](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: String, evs: Iterator[(Timestamp, String)],
            state: GroupState[FState]) =>
          val wm = state.getCurrentWatermarkMs()
          if (state.hasTimedOut) {
            // wm >= frontier + slo: the feed is silent past budget.
            // One edge per outage — no re-arm until events return
            // (re-arming would re-alert every trigger of a long
            // outage; recovery resets the cycle)
            val st = state.get
            state.update(FState(st.maxTsMs, alerted = true))
            Iterator(Alert(key, "stale", new Timestamp(st.maxTsMs),
              (wm - st.maxTsMs) / 1000L))
          } else {
            val newMax = evs.map(_._1.getTime).max
            val prev = state.getOption
            val frontier = math.max(newMax, prev.map(_.maxTsMs)
              .getOrElse(Long.MinValue))
            val recovered = prev.filter(_.alerted).map { st =>
              Alert(key, "recovered", new Timestamp(frontier),
                (frontier - st.maxTsMs) / 1000L)
            }
            state.update(FState(frontier, alerted = false))
            // the timeout must be strictly beyond the watermark or
            // registration throws — a frontier already more than one
            // SLO behind re-fires at the next possible instant
            state.setTimeoutTimestamp(math.max(frontier + sloMs, wm + 1L))
            recovered.iterator
          }
      }
  }
}

package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions.{col, timestamp_millis}
import org.apache.spark.sql.streaming.{GroupStateTimeout, GroupState, OutputMode}

/** Streaming three-step path mining — the stream twin of the batch
  * `events_top_paths` query: every time a user's journey extends by
  * one event, emit the completed (e1, e2, e3) trigram. Downstream, a
  * plain streaming count over the emitted trigrams maintains the
  * live path table the batch query computes offline.
  *
  * Per-user state is EXACTLY the last two event types — two short
  * strings, regardless of how long the journey runs — which is the
  * whole reason this shape survives unbounded streams: the batch twin
  * re-sorts each user's full history per run; this never holds more
  * than the suffix the next trigram needs. Events are processed in
  * (ts, event_id) order within each micro-batch; cross-batch order is
  * the arrival order, same as any log-ordered source partitioned by
  * user key.
  *
  * Per-user state is tiny but the USER COUNT is not: without expiry
  * the state store grows with every user ever seen. An idle-user
  * EVENT-TIME timeout (default 24 h past the user's last event, fired
  * when the WATERMARK passes that deadline) drops suffixes of users
  * who stopped producing events — the only loss is trigrams that
  * would straddle the expiry gap, which a journey idle that long has
  * arguably ended anyway. State is therefore bounded by ACTIVE users,
  * not lifetime users. Event-time (not processing-time) expiry is
  * deliberate twice over: replaying a historical log expires users
  * identically to live operation (deterministic — no wall clock), and
  * the engine only schedules timeout sweeps when the watermark MOVES
  * (a registered processing-time timeout makes the micro-batch engine
  * re-trigger continuously — `shouldRunAnotherBatch` is always true
  * once wall time advances, which busy-loops a drained stream).
  */
object StreamTopPaths {

  final case class Ev(userId: Long, tsMs: Long, eventId: Long,
      eventType: String)

  /** [[Ev]] plus the watermark-bearing timestamp column (public only
    * because Catalyst's generated deserializer must construct it).
    */
  final case class EvW(userId: Long, tsMs: Long, eventId: Long,
      eventType: String, et: java.sql.Timestamp)

  /** Last ≤2 event types seen, oldest first, plus the max event time
    * observed (`lastMs`) — the idle-expiry deadline derives from the
    * LATEST event ever seen, not from whatever slice arrived last, so
    * a delayed out-of-order slice can never pull the deadline earlier.
    */
  final case class Suffix(e1: Option[String], e2: Option[String],
      lastMs: Long)

  final case class Path(userId: Long, e1: String, e2: String, e3: String)

  def apply(events: Dataset[Ev],
      idleExpiryMs: Long = 24L * 3600 * 1000,
      watermarkDelay: String = "10 minutes"): Dataset[Path] = {
    implicit val evwEnc: Encoder[EvW] = Encoders.product[EvW]
    implicit val stateEnc: Encoder[Suffix] = Encoders.product[Suffix]
    implicit val outEnc: Encoder[Path] = Encoders.product[Path]
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    events.toDF()
      .withColumn("et", timestamp_millis(col("tsMs")))
      .withWatermark("et", watermarkDelay)
      .as[EvW]
      .groupByKey(_.userId)
      .flatMapGroupsWithState[Suffix, Path](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, evs: Iterator[EvW], state: GroupState[Suffix]) =>
          if (state.hasTimedOut) {
            // idle user: drop the 2-string suffix; a later event starts
            // a fresh journey (loses only gap-straddling trigrams)
            state.remove()
            Iterator.empty
          } else {
          var st = state.getOption.getOrElse(Suffix(None, None, -1L))
          val out = Vector.newBuilder[Path]
          // micro-batch slice of this user's log, in event order — the
          // sort is bounded by the per-trigger slice, not the journey
          val slice = evs.toSeq.sortBy(e => (e.tsMs, e.eventId))
          val lastMs = math.max(st.lastMs, slice.map(_.tsMs).max)
          slice.foreach { e =>
            (st.e1, st.e2) match {
              case (Some(a), Some(b)) =>
                out += Path(user, a, b, e.eventType)
                st = Suffix(Some(b), Some(e.eventType), lastMs)
              case (Some(a), None) =>
                st = Suffix(Some(a), Some(e.eventType), lastMs)
              case _ => st = Suffix(Some(e.eventType), None, lastMs)
            }
          }
          state.update(st.copy(lastMs = lastMs))
          // expire this user idleExpiry past the LATEST event ever
          // seen (monotone — an out-of-order slice can't pull the
          // deadline earlier); the engine requires the deadline to
          // sit above the watermark
          state.setTimeoutTimestamp(
            math.max(lastMs + idleExpiryMs,
              state.getCurrentWatermarkMs() + 1))
          out.result().iterator
          }
      }
  }
}

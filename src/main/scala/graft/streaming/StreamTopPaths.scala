package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
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
  */
object StreamTopPaths {

  final case class Ev(userId: Long, tsMs: Long, eventId: Long,
      eventType: String)

  /** Last ≤2 event types seen, oldest first. */
  final case class Suffix(e1: Option[String], e2: Option[String])

  final case class Path(userId: Long, e1: String, e2: String, e3: String)

  def apply(events: Dataset[Ev]): Dataset[Path] = {
    implicit val stateEnc: Encoder[Suffix] = Encoders.product[Suffix]
    implicit val outEnc: Encoder[Path] = Encoders.product[Path]
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState[Suffix, Path](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, evs: Iterator[Ev], state: GroupState[Suffix]) =>
          var st = state.getOption.getOrElse(Suffix(None, None))
          val out = Vector.newBuilder[Path]
          // micro-batch slice of this user's log, in event order — the
          // sort is bounded by the per-trigger slice, not the journey
          evs.toSeq.sortBy(e => (e.tsMs, e.eventId)).foreach { e =>
            (st.e1, st.e2) match {
              case (Some(a), Some(b)) =>
                out += Path(user, a, b, e.eventType)
                st = Suffix(Some(b), Some(e.eventType))
              case (Some(a), None) => st = Suffix(Some(a), Some(e.eventType))
              case _ => st = Suffix(Some(e.eventType), None)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }
}

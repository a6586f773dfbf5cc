package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions.{col, timestamp_millis}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** STREAMING row-pattern matching — the live half of the CEP family
  * (`events_pattern_match`/`_spans` are the batch/oracle forms): each
  * user's event-type initials accumulate in per-user state, and every
  * micro-batch emits the matches the new events COMPLETED, with the
  * same non-overlapping left-to-right (AFTER MATCH SKIP PAST LAST
  * ROW) semantics and the same absolute event ordinals the batch
  * spans query reports — StreamCepSpec pins stream-equals-batch on
  * journeys split across micro-batches.
  *
  * Incremental emission is only sound for PREFIX-STABLE patterns:
  * once a match is found in the buffered prefix, no later event can
  * change it, and no position that failed on a complete char can
  * succeed later. All three library patterns qualify (each ends at a
  * definite character its quantifiers cannot cross — `p` after
  * `c{0,3}`/`[cv]*`, `[cv]` after `e{2,}` — and a viable-but-
  * incomplete position blocks any later start inside its own run),
  * which is why the spec's equality check is exact, not approximate.
  * A position that merely ran out of input stays in the buffer and is
  * re-scanned when more events arrive — the cursor only advances past
  * EMITTED matches.
  *
  * State per user is the journey suffix no pattern has consumed yet
  * (trimmed to the minimum per-pattern cursor) plus one cursor per
  * pattern — NOT the full journey. `maxBuffer` caps a pathological
  * never-matching suffix (cap exceeded → oldest chars drop and
  * cursors clamp, the windowed-journey trade `events_pattern_windowed`
  * makes per day); idle users expire on an event-time timeout like
  * every stateful operator here, so the store is bounded by ACTIVE
  * users × a capped suffix.
  */
object StreamCep {

  final case class Ev(userId: Long, tsUs: Long, eventId: Long,
      eventType: String)

  /** [[Ev]] plus the watermark-bearing timestamp column (public only
    * because Catalyst's generated deserializer must construct it).
    */
  final case class EvW(userId: Long, tsUs: Long, eventId: Long,
      eventType: String, et: java.sql.Timestamp)

  /** `base` = absolute 1-based ordinal of `buf`'s first char; `cur` =
    * per-pattern absolute cursor (next scan start); `cnt` = matches
    * emitted so far per pattern (the 1-based match ordinal source);
    * `lastMs` = max event time seen (the idle-expiry deadline,
    * monotone).
    */
  final case class CepSt(base: Long, buf: String, cur: Seq[Long],
      cnt: Seq[Long], lastMs: Long)

  final case class Match(userId: Long, patternName: String,
      matchOrd: Long, startOrd: Long, endOrd: Long)

  def apply(events: Dataset[Ev],
      patterns: Seq[(String, String)],
      maxBuffer: Int = 4096,
      idleExpiryMs: Long = 24L * 3600 * 1000,
      watermarkDelay: String = "10 minutes"): Dataset[Match] = {
    require(patterns.nonEmpty)
    implicit val evwEnc: Encoder[EvW] = Encoders.product[EvW]
    implicit val stEnc: Encoder[CepSt] = Encoders.product[CepSt]
    implicit val outEnc: Encoder[Match] = Encoders.product[Match]
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    val pats = patterns // stable capture for the task closure
    events.toDF()
      .withColumn("et", timestamp_millis(
        (col("tsUs") / 1000).cast("long")))
      .withWatermark("et", watermarkDelay)
      .as[EvW]
      .groupByKey(_.userId)
      .flatMapGroupsWithState[CepSt, Match](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, evs: Iterator[EvW], state: GroupState[CepSt]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val compiled = pats.map { case (n, p) =>
              (n, java.util.regex.Pattern.compile(p))
            }
            var st = state.getOption.getOrElse(
              CepSt(1L, "", pats.map(_ => 1L), pats.map(_ => 0L), -1L))
            // per-trigger slice in event order (bounded by the slice)
            val slice = evs.toSeq.sortBy(e => (e.tsUs, e.eventId))
            val lastMs =
              if (slice.isEmpty) st.lastMs
              else math.max(st.lastMs, slice.map(_.tsUs / 1000).max)
            val appended = st.buf +
              slice.map(_.eventType.charAt(0)).mkString
            val out = Vector.newBuilder[Match]
            val walked = compiled.zip(st.cur.zip(st.cnt)).map {
              case ((name, pat), (cur0, cnt0)) =>
                var cur = cur0
                var cnt = cnt0
                val m = pat.matcher(appended)
                var scanning = true
                while (scanning) {
                  val from = (cur - st.base).toInt
                  if (from >= appended.length || !m.find(from)) {
                    scanning = false
                  } else {
                    val sAbs = st.base + m.start
                    val eAbs = st.base + m.end - 1
                    cnt += 1
                    out += Match(user, name, cnt, sAbs, eAbs)
                    cur = eAbs + 1
                  }
                }
                (cur, cnt)
            }
            val newCur = walked.map(_._1)
            // trim the buffer to the minimum cursor; cap at maxBuffer
            val keepFrom = math.max(newCur.min,
              st.base + appended.length - maxBuffer)
            val newBuf = appended.substring((keepFrom - st.base).toInt)
            st = CepSt(keepFrom, newBuf,
              newCur.map(c => math.max(c, keepFrom)),
              walked.map(_._2), lastMs)
            state.update(st)
            state.setTimeoutTimestamp(
              math.max(lastMs + idleExpiryMs,
                state.getCurrentWatermarkMs() + 1))
            out.result().iterator
          }
      }
  }
}

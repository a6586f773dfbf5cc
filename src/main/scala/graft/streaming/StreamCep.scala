package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions.{col, timestamp_millis}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** STREAMING row-pattern matching — the live half of the CEP family
  * (`events_pattern_match`/`_spans` are the batch/oracle forms): each
  * user's event-type initials accumulate in per-user state, and
  * matches are emitted with the same non-overlapping left-to-right
  * (AFTER MATCH SKIP PAST LAST ROW) semantics and the same absolute
  * event ordinals the batch spans query reports — StreamCepSpec pins
  * stream-equals-batch on journeys split across micro-batches,
  * including a batch split that delivers a user's events ACROSS
  * triggers out of time order.
  *
  * ORDERING: events are folded into the journey only once the
  * WATERMARK has passed them. Arrivals first land in a per-user
  * pending buffer; each trigger folds (in global (ts, eventId) order)
  * exactly the pending events with event time strictly below the
  * current watermark — by the watermark contract no future arrival
  * can precede those, so the journey string is built in true event
  * order even when a later trigger delivers earlier-timestamped
  * events (allowed inside the watermark delay). Pending events of a
  * quiet user are flushed by an event-time timeout set to the
  * earliest pending timestamp, so emission lags the watermark, never
  * an arrival. Events older than the watermark at arrival are dropped
  * by Spark's late-row filter upstream — the standard watermark loss
  * contract.
  *
  * Incremental emission is only sound for PREFIX-STABLE patterns:
  * once a match is found in the buffered prefix, no later event can
  * change it, and no position that failed on a complete char can
  * succeed later. [[StreamCep.requirePrefixStable]] enforces the
  * validated shape structurally at the API boundary — atoms are
  * literal letters/digits or simple character classes, quantifiers
  * `* + ? {m,n}` may follow any atom EXCEPT the last (a match must
  * end at a definite character its quantifiers cannot cross). All
  * three library patterns qualify (`vc{0,3}p`, `e{2,}[cv]`,
  * `s[cv]*p`); a non-prefix-stable pattern (e.g. one ending in a
  * greedy quantifier) would silently diverge from batch semantics, so
  * it is rejected loudly instead. A position that merely ran out of
  * input stays in the buffer and is re-scanned when more events
  * arrive — the cursor only advances past EMITTED matches.
  *
  * State per user is the journey suffix no pattern has consumed yet
  * (trimmed to the minimum per-pattern cursor) plus one cursor per
  * pattern plus the pending (post-watermark) arrivals — NOT the full
  * journey. `maxBuffer` caps a pathological never-matching suffix
  * (cap exceeded → oldest chars drop and cursors clamp, the
  * windowed-journey trade `events_pattern_windowed` makes per day);
  * idle users expire on an event-time timeout like every stateful
  * operator here (any still-pending events fold and emit at expiry —
  * the watermark is past all of them by then), so the store is
  * bounded by ACTIVE users × a capped suffix × the watermark-delay
  * window.
  */
object StreamCep {

  final case class Ev(userId: Long, tsUs: Long, eventId: Long,
      eventType: String)

  /** [[Ev]] plus the watermark-bearing timestamp column (public only
    * because Catalyst's generated deserializer must construct it).
    */
  final case class EvW(userId: Long, tsUs: Long, eventId: Long,
      eventType: String, et: java.sql.Timestamp)

  /** A watermark-pending arrival: event time + id (the global sort
    * key) and the journey char it will contribute once folded.
    */
  final case class PendEv(tsUs: Long, eventId: Long, c: String)

  /** `base` = absolute 1-based ordinal of `buf`'s first char; `cur` =
    * per-pattern absolute cursor (next scan start); `cnt` = matches
    * emitted so far per pattern (the 1-based match ordinal source);
    * `lastMs` = max event time seen (the idle-expiry deadline,
    * monotone); `pend` = arrivals the watermark has not passed yet.
    */
  final case class CepSt(base: Long, buf: String, cur: Seq[Long],
      cnt: Seq[Long], lastMs: Long, pend: Seq[PendEv])

  final case class Match(userId: Long, patternName: String,
      matchOrd: Long, startOrd: Long, endOrd: Long)

  /** Structural prefix-stability check — the validated library shape
    * incremental emission is sound for. Grammar: one or more atoms
    * (a literal letter/digit, or a character class of them), each
    * optionally followed by ONE quantifier (`*`, `+`, `?`, `{m}`,
    * `{m,}`, `{m,n}`) — except the FINAL atom, which must be
    * unquantified: the match then ends at a definite character no
    * quantifier can cross, so later input can never extend an emitted
    * match. Groups, alternation, anchors, dots, and backrefs are
    * outside the validated shape and rejected.
    */
  private[streaming] def requirePrefixStable(name: String,
      pattern: String): Unit = {
    def fail(why: String): Nothing = throw new IllegalArgumentException(
      s"StreamCep pattern '$name' ('$pattern') is not a validated " +
        s"prefix-stable shape: $why (incremental emission would " +
        "silently diverge from batch semantics)")
    var i = 0
    var atoms = 0
    var lastQuantified = false
    while (i < pattern.length) {
      val c = pattern.charAt(i)
      if (c.isLetterOrDigit) i += 1
      else if (c == '[') {
        val j = pattern.indexOf(']', i + 1)
        if (j < 0) fail("unterminated character class")
        if (j == i + 1 ||
          !pattern.substring(i + 1, j).forall(_.isLetterOrDigit))
          fail("character classes hold literal letters/digits only")
        i = j + 1
      } else fail(s"unsupported construct '$c' — literal letters/" +
        "digits, [classes], and quantifiers (* + ? {m,n}) only")
      atoms += 1
      lastQuantified = false
      if (i < pattern.length) pattern.charAt(i) match {
        case '*' | '+' | '?' => i += 1; lastQuantified = true
        case '{' =>
          val j = pattern.indexOf('}', i + 1)
          if (j < 0 ||
            !pattern.substring(i + 1, j).matches("\\d+(,\\d*)?"))
            fail("malformed {m,n} quantifier")
          i = j + 1; lastQuantified = true
        case _ =>
      }
    }
    if (atoms == 0) fail("empty pattern")
    if (lastQuantified) fail("the final atom must be unquantified — " +
      "a trailing quantifier lets later input extend an emitted match")
  }

  def apply(events: Dataset[Ev],
      patterns: Seq[(String, String)],
      maxBuffer: Int = 4096,
      idleExpiryMs: Long = 24L * 3600 * 1000,
      watermarkDelay: String = "10 minutes"): Dataset[Match] = {
    require(patterns.nonEmpty)
    patterns.foreach { case (n, p) => requirePrefixStable(n, p) }
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
          val compiled = pats.map { case (n, p) =>
            (n, java.util.regex.Pattern.compile(p))
          }
          val wm = state.getCurrentWatermarkMs()
          var st = state.getOption.getOrElse(
            CepSt(1L, "", pats.map(_ => 1L), pats.map(_ => 0L), -1L,
              Seq.empty))
          val arrived = evs.toSeq
          val lastMs = (st.lastMs +: arrived.map(_.tsUs / 1000)).max
          // idle expiry: reached only via the event-time timeout (the
          // watermark passed the user's last event by the full expiry)
          val expired = state.hasTimedOut && arrived.isEmpty &&
            wm >= st.lastMs + idleExpiryMs
          val pendAll = st.pend ++ arrived.map(e =>
            PendEv(e.tsUs, e.eventId, e.eventType.take(1)))
          // fold ONLY what the watermark has passed (strictly below:
          // an event AT the watermark can still arrive) — in global
          // event order, so cross-trigger out-of-order delivery inside
          // the watermark delay lands in its true position. At idle
          // expiry the watermark is past everything pending; fold all.
          val (ready, still) =
            if (expired) (pendAll, Seq.empty[PendEv])
            else pendAll.partition(_.tsUs / 1000 < wm)
          val slice = ready.sortBy(p => (p.tsUs, p.eventId))
          val appended = st.buf + slice.map(_.c).mkString
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
          if (expired) {
            state.remove()
          } else {
            val newCur = walked.map(_._1)
            // trim the buffer to the minimum cursor; cap at maxBuffer
            val keepFrom = math.max(newCur.min,
              st.base + appended.length - maxBuffer)
            val newBuf = appended.substring((keepFrom - st.base).toInt)
            st = CepSt(keepFrom, newBuf,
              newCur.map(c => math.max(c, keepFrom)),
              walked.map(_._2), lastMs, still)
            state.update(st)
            // wake when the earliest pending event becomes foldable
            // (the watermark passes it), else at idle expiry; Spark
            // requires the timeout to sit above the current watermark
            val nextWake = still.map(_.tsUs / 1000 + 1)
              .minOption.getOrElse(lastMs + idleExpiryMs)
            state.setTimeoutTimestamp(math.max(nextWake, wm + 1))
          }
          out.result().iterator
      }
  }
}

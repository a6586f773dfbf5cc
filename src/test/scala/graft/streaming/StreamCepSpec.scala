package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.analytics.{EventQueries, QueryUtil}
import graft.streaming.StreamCep.{Ev, Match}

/** Streaming CEP equals the batch span extraction on the REAL events
  * table, with every user's journey split across micro-batches — the
  * watermark-gated pending buffer and the cursor/buffer hand-off
  * across triggers are the things under test, and the batch
  * `events_pattern_spans` derivation (itself DuckDB-oracle-gated) is
  * the ground truth. Matches emit once the WATERMARK passes the
  * events (not on arrival), so each run ends with a far-future flush
  * sentinel for a user id outside the corpus: it advances the
  * watermark past every real event and the no-data batch's event-time
  * timeouts fold the remaining pending buffers.
  */
class StreamCepSpec extends SparkSuite {

  private def batchSpans(): Set[(Long, String, Long, Long, Long)] =
    EventQueries.eventsPatternSpans(spark, sf0001)
      .select("user_id", "pattern_name", "match_ord", "start_ord",
        "end_ord")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet

  private def sortedEvents(): Array[Ev] = {
    import spark.implicits._
    QueryUtil.table(spark, sf0001, "events")
      .select(col("user_id").as("userId"),
        unix_micros(col("ts").cast("timestamp")).as("tsUs"),
        col("event_id").as("eventId"),
        col("event_type").as("eventType"))
      .as[Ev].collect().sortBy(e => (e.tsUs, e.eventId))
  }

  /** A user id no real event carries — its single far-future event
    * advances the watermark without touching any real journey.
    */
  private def flushSentinel(evs: Array[Ev], afterMs: Long): Ev =
    Ev(Long.MaxValue / 2, (evs.map(_.tsUs / 1000).max + afterMs) * 1000,
      Long.MaxValue / 2, "zz")

  private def runStream(chunks: Seq[Seq[Ev]], sentinel: Ev,
      watermarkDelay: String,
      name: String): Set[(Long, String, Long, Long, Long)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Ev]
    // idle expiry effectively off: the batch twin never expires, and
    // the synthetic events span multi-day gaps that would otherwise
    // reset mid-journey (that reset IS the production contract — the
    // equality claim here is absent-expiry)
    val q = StreamCep(ms.toDS(), EventQueries.EventCepPatterns,
        idleExpiryMs = Long.MaxValue / 4,
        watermarkDelay = watermarkDelay).toDF()
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      chunks.foreach { c => ms.addData(c); q.processAllAvailable() }
      ms.addData(Seq(sentinel)); q.processAllAvailable()
      spark.table(name).as[Match].collect()
        .map(m => (m.userId, m.patternName, m.matchOrd, m.startOrd,
          m.endOrd)).filterNot(_._1 == sentinel.userId).toSet
    } finally q.stop()
  }

  test("stream matches equal the batch spans across micro-batch splits") {
    val evs = sortedEvents()
    assert(evs.nonEmpty)
    // three time-ordered chunks: journeys straddle both boundaries
    val chunks = Seq(
      evs.slice(0, evs.length / 3).toSeq,
      evs.slice(evs.length / 3, 2 * evs.length / 3).toSeq,
      evs.slice(2 * evs.length / 3, evs.length).toSeq)

    val got = runStream(chunks, flushSentinel(evs, 3600L * 1000),
      "10 minutes", "cep")
    val want = batchSpans()
    assert(got == want,
      s"stream≠batch: only-stream=${(got -- want).take(5)} " +
        s"only-batch=${(want -- got).take(5)}")
    assert(want.nonEmpty, "no matches — vacuous")
    // non-vacuity of the hand-off: some user whose events span all
    // three chunks produced a match, so its state really crossed
    // trigger boundaries (not every journey fit one micro-batch)
    val spanningUsers = chunks.map(_.map(_.userId).toSet).reduce(_ & _)
    assert(spanningUsers.exists(u => got.exists(_._1 == u)),
      "no chunk-spanning user matched — the hand-off went untested")
  }

  test("out-of-order delivery across triggers still equals batch") {
    val evs = sortedEvents()
    val half = evs.length / 2
    val firstHalf = evs.slice(0, half)
    val maxFirstMs = firstHalf.map(_.tsUs / 1000).max
    // hold back the first half's final 24 hours and deliver them in
    // the SECOND trigger, after newer events — genuine cross-trigger
    // disorder, within the 48-hour watermark delay (never late-dropped)
    val (held, onTime) =
      firstHalf.partition(_.tsUs / 1000 > maxFirstMs - 24L * 3600 * 1000)
    assert(held.nonEmpty, "no events to hold back — vacuous")
    val chunk2 = evs.slice(half, evs.length).toSeq ++ held.toSeq
    // the disorder is real per user: some held event belongs to a user
    // whose on-time chunk-1 events it precedes in journey order
    val heldUsers = held.map(_.userId).toSet
    assert(onTime.exists(e => heldUsers.contains(e.userId) &&
      held.exists(h => h.userId == e.userId && h.tsUs < e.tsUs)) ||
      held.exists(h => evs.slice(half, evs.length).exists(n =>
        n.userId == h.userId && n.tsUs > h.tsUs)),
      "held-back events created no per-user disorder — vacuous")

    val got = runStream(Seq(onTime.toSeq, chunk2),
      flushSentinel(evs, 49L * 3600 * 1000), "48 hours", "cep_ooo")
    val want = batchSpans()
    assert(got == want,
      s"out-of-order stream≠batch: only-stream=${(got -- want).take(5)} " +
        s"only-batch=${(want -- got).take(5)}")
  }

  test("non-prefix-stable patterns are rejected at the API boundary") {
    // library shapes pass
    EventQueries.EventCepPatterns.foreach { case (n, p) =>
      StreamCep.requirePrefixStable(n, p)
    }
    def rejected(p: String): Unit = {
      val e = intercept[IllegalArgumentException](
        StreamCep.requirePrefixStable("t", p))
      assert(e.getMessage.contains("prefix-stable"), e.getMessage)
    }
    rejected("s[cv]*")   // trailing greedy quantifier
    rejected("ab+")      // trailing +
    rejected("vc{0,3}")  // trailing bounded quantifier
    rejected("a(b)c")    // groups outside the validated shape
    rejected("a|b")      // alternation outside the validated shape
    rejected("a.c")      // dot outside the validated shape
    rejected("")         // empty
  }
}

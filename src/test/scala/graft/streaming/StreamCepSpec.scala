package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.analytics.{EventQueries, QueryUtil}
import graft.streaming.StreamCep.{Ev, Match}

/** Streaming CEP equals the batch span extraction on the REAL events
  * table, with every user's journey split across three micro-batches —
  * the cursor/buffer hand-off across triggers is the thing under
  * test, and the batch `events_pattern_spans` derivation (itself
  * DuckDB-oracle-gated) is the ground truth.
  */
class StreamCepSpec extends SparkSuite {

  test("stream matches equal the batch spans across micro-batch splits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val evs = QueryUtil.table(spark, sf0001, "events")
      .select(col("user_id").as("userId"),
        unix_micros(col("ts").cast("timestamp")).as("tsUs"),
        col("event_id").as("eventId"),
        col("event_type").as("eventType"))
      .as[Ev].collect().sortBy(e => (e.tsUs, e.eventId))
    assert(evs.nonEmpty)
    // three time-ordered chunks: journeys straddle both boundaries
    val chunks = Seq(
      evs.slice(0, evs.length / 3),
      evs.slice(evs.length / 3, 2 * evs.length / 3),
      evs.slice(2 * evs.length / 3, evs.length))

    val ms = MemoryStream[Ev]
    // idle expiry effectively off: the batch twin never expires, and
    // the synthetic events span multi-day gaps that would otherwise
    // reset mid-journey (that reset IS the production contract — the
    // equality claim here is absent-expiry)
    val q = StreamCep(ms.toDS(), EventQueries.EventCepPatterns,
        idleExpiryMs = Long.MaxValue / 4).toDF()
      .writeStream.format("memory").queryName("cep")
      .outputMode("append").start()
    try {
      chunks.foreach { c => ms.addData(c.toSeq); q.processAllAvailable() }
      val got = spark.table("cep").as[Match].collect()
        .map(m => (m.userId, m.patternName, m.matchOrd, m.startOrd,
          m.endOrd)).toSet

      val want = EventQueries.eventsPatternSpans(spark, sf0001)
        .select("user_id", "pattern_name", "match_ord", "start_ord",
          "end_ord")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet

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
    } finally q.stop()
  }
}

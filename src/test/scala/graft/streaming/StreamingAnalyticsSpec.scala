package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

import graft.SparkSuite

final case class StreamEvent(ts: Timestamp, userId: Long,
    eventType: String, value: Double)

final case class UserAgg(userId: Long, nEvents: Long, sumValue: Double)

final case class Sess(userId: Long, start: Timestamp, n: Long)

final case class Heartbeat(lastSeen: Timestamp, n: Long)

final case class GapAlert(eventType: String, lastSeen: Timestamp, n: Long)

/** Event-time streaming semantics over the real `readStream` path:
  * watermarks, windowed aggregation, late-data dropping, and custom
  * state via mapGroupsWithState. The batch-mode twins of these
  * operators are oracle-checked in EventQueries; this suite proves the
  * streaming execution with deterministic micro-batch boundaries
  * (processAllAvailable between feeds).
  */
class StreamingAnalyticsSpec extends SparkSuite {

  private def t(s: String): Timestamp = Timestamp.valueOf(s)

  test("windowed aggregation with watermark over a stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[StreamEvent]
    val agg = ms.toDS()
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("eventType"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
    val q = agg.writeStream.format("memory").queryName("win_agg")
      .outputMode("complete").start()
    try {
      ms.addData(
        StreamEvent(t("2024-01-01 10:05:00"), 1, "click", 1.0),
        StreamEvent(t("2024-01-01 10:25:00"), 2, "click", 2.0),
        StreamEvent(t("2024-01-01 11:05:00"), 1, "view", 4.0))
      q.processAllAvailable()
      val rows = spark.table("win_agg")
        .select(col("window.start").cast("string"), col("eventType"),
          col("n"), col("sum_value"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getDouble(3))).toSet
      assert(rows == Set(
        ("2024-01-01 10:00:00", "click", 2L, 3.0),
        ("2024-01-01 11:00:00", "view", 1L, 4.0)))
    } finally q.stop()
  }

  test("append mode emits closed windows and drops late data past the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[StreamEvent]
    val agg = ms.toDS()
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("late_drop")
      .outputMode("append").start()
    try {
      // window [10:00, 11:00) accumulates two events
      ms.addData(StreamEvent(t("2024-01-01 10:05:00"), 1, "click", 1.0),
        StreamEvent(t("2024-01-01 10:50:00"), 2, "click", 1.0))
      q.processAllAvailable()
      assert(spark.table("late_drop").count() == 0) // window still open
      // advance event time: watermark 13:00-10m = 12:50 > 11:00 closes it
      ms.addData(StreamEvent(t("2024-01-01 13:00:00"), 3, "view", 1.0))
      q.processAllAvailable()
      // a straggler for the closed window must be DROPPED
      ms.addData(StreamEvent(t("2024-01-01 10:30:00"), 4, "late", 9.0))
      q.processAllAvailable()
      ms.addData(StreamEvent(t("2024-01-01 16:00:00"), 5, "view", 1.0))
      q.processAllAvailable() // closes the 13:00 window too
      val byStart = spark.table("late_drop")
        .select(col("window.start").cast("string"), col("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(byStart("2024-01-01 10:00:00") == 2L) // late event excluded
      assert(byStart("2024-01-01 13:00:00") == 1L)
    } finally q.stop()
  }

  test("native session_window merges and closes sessions under the watermark") {
    // the batch events_session query is oracle-checked on exactly this
    // operator; here the SAME session_window expression runs in
    // streaming mode — sessions merge across micro-batches and emit
    // only once the watermark passes the session end
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[StreamEvent]
    val sessions = ms.toDS()
      .withWatermark("ts", "10 minutes")
      .groupBy(col("userId"),
        session_window(col("ts"), "30 minutes").as("win"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
    val q = sessions.writeStream.format("memory").queryName("native_sessions")
      .outputMode("append").start()
    try {
      // two events 20 min apart in DIFFERENT micro-batches must merge
      // into one session (gap 30 min covers the spread)
      ms.addData(StreamEvent(t("2024-01-01 10:00:00"), 1, "click", 1.0))
      q.processAllAvailable()
      ms.addData(StreamEvent(t("2024-01-01 10:20:00"), 1, "view", 2.0))
      q.processAllAvailable()
      assert(spark.table("native_sessions").count() == 0) // still open
      // watermark passes 10:50 (session end) → the merged session emits
      ms.addData(StreamEvent(t("2024-01-01 12:00:00"), 2, "click", 1.0))
      q.processAllAvailable()
      ms.addData(StreamEvent(t("2024-01-01 13:00:00"), 2, "view", 1.0))
      q.processAllAvailable()
      val rows = spark.table("native_sessions")
        .select(col("userId"), col("win.start").cast("string"),
          col("win.end").cast("string"), col("n"), col("sum_value"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getLong(3), r.getDouble(4))).toSet
      // user 1's merged session AND user 2's 12:00 session (closed by
      // the 13:00 watermark advance) are both out
      assert(rows == Set(
        (1L, "2024-01-01 10:00:00", "2024-01-01 10:50:00", 2L, 3.0),
        (2L, "2024-01-01 12:00:00", "2024-01-01 12:30:00", 1L, 1.0)))
    } finally q.stop()
  }

  test("flatMapGroupsWithState closes sessions on event-time timeout") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[StreamEvent]
    val sessions = ms.toDS()
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.userId)
      .flatMapGroupsWithState[Sess, Sess](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, events: Iterator[StreamEvent], state: GroupState[Sess]) =>
          if (state.hasTimedOut) {
            // watermark passed the session deadline → emit and clear
            val closed = state.get
            state.remove()
            Iterator.single(closed)
          } else {
            val evs = events.toSeq
            val prev = state.getOption
            val start = prev.map(_.start).getOrElse(evs.map(_.ts).min)
            val sess = Sess(userId, start,
              prev.map(_.n).getOrElse(0L) + evs.size)
            state.update(sess)
            // close 30 event-time minutes after the last seen event
            val lastMs = evs.map(_.ts.getTime).max
            state.setTimeoutTimestamp(lastMs + 30 * 60 * 1000)
            Iterator.empty
          }
      }
    val q = sessions.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      ms.addData(StreamEvent(t("2024-01-01 10:00:00"), 1, "click", 1.0),
        StreamEvent(t("2024-01-01 10:10:00"), 1, "view", 1.0))
      q.processAllAvailable()
      assert(spark.table("sessions").count() == 0) // session still open
      // event far ahead advances the watermark past 10:40 → timeout fires
      ms.addData(StreamEvent(t("2024-01-01 12:00:00"), 2, "click", 1.0))
      q.processAllAvailable()
      ms.addData(StreamEvent(t("2024-01-01 13:00:00"), 2, "view", 1.0))
      q.processAllAvailable()
      val closed = spark.table("sessions").as[Sess].collect()
      assert(closed.map(s => (s.userId, s.n)).toSet == Set((1L, 2L)))
      assert(closed.head.start == t("2024-01-01 10:00:00"))
    } finally q.stop()
  }

  test("gap detector alerts on per-key silence via event-time timers") {
    // the streaming complement of the batch events_gapfill query: a
    // dense spine can report zero-count buckets after the fact, but
    // only an event-time TIMER can notice that a key has gone silent
    // while the stream is live — the monitoring/freshness shape
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val gapMs = 15 * 60 * 1000L
    val ms = MemoryStream[StreamEvent]
    val alerts = ms.toDS()
      .withWatermark("ts", "5 minutes")
      .groupByKey(_.eventType)
      .flatMapGroupsWithState[Heartbeat, GapAlert](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: String, events: Iterator[StreamEvent],
            state: GroupState[Heartbeat]) =>
          if (state.hasTimedOut) {
            // watermark passed lastSeen + gap with no new events:
            // the key is silent — alert once and drop the heartbeat
            // (it re-arms when the key speaks again)
            val hb = state.get
            state.remove()
            Iterator.single(GapAlert(key, hb.lastSeen, hb.n))
          } else {
            val evs = events.toSeq
            val prev = state.getOption
            val lastMs = (prev.map(_.lastSeen.getTime).toSeq ++
              evs.map(_.ts.getTime)).max
            state.update(Heartbeat(new Timestamp(lastMs),
              prev.map(_.n).getOrElse(0L) + evs.size))
            state.setTimeoutTimestamp(lastMs + gapMs)
            Iterator.empty
          }
      }
    val q = alerts.writeStream.format("memory").queryName("gap_alerts")
      .outputMode("append").start()
    try {
      // both keys alive at 10:00; click stops, view keeps beating
      ms.addData(StreamEvent(t("2024-01-01 10:00:00"), 1, "click", 1.0),
        StreamEvent(t("2024-01-01 10:05:00"), 2, "click", 1.0),
        StreamEvent(t("2024-01-01 10:00:00"), 3, "view", 1.0))
      q.processAllAvailable()
      assert(spark.table("gap_alerts").count() == 0) // nothing silent yet
      // view beats advance the watermark past click's 10:20 deadline
      ms.addData(StreamEvent(t("2024-01-01 10:30:00"), 3, "view", 1.0))
      q.processAllAvailable()
      ms.addData(StreamEvent(t("2024-01-01 10:45:00"), 3, "view", 1.0))
      q.processAllAvailable()
      val a = spark.table("gap_alerts").as[GapAlert].collect()
      assert(a.map(g => (g.eventType, g.n)).toSet == Set(("click", 2L)))
      assert(a.head.lastSeen == t("2024-01-01 10:05:00"))
      // the silent key coming back re-arms without a duplicate alert
      ms.addData(StreamEvent(t("2024-01-01 10:50:00"), 1, "click", 1.0))
      q.processAllAvailable()
      assert(spark.table("gap_alerts").count() == 1)
    } finally q.stop()
  }

  test("streaming aggregation state survives a checkpointed restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val checkpoint = java.nio.file.Files
      .createTempDirectory("graft-ckpt").toString
    val ms = MemoryStream[StreamEvent]
    def startQuery() = ms.toDS()
      .groupBy(col("eventType"))
      .agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("ckpt_agg")
      .option("checkpointLocation", checkpoint)
      .outputMode("complete").start()
    val q1 = startQuery()
    ms.addData(StreamEvent(t("2024-01-01 10:00:00"), 1, "click", 1.0),
      StreamEvent(t("2024-01-01 10:01:00"), 2, "click", 1.0))
    q1.processAllAvailable()
    assert(spark.table("ckpt_agg").where(col("eventType") === "click")
      .head.getLong(1) == 2L)
    q1.stop()
    // restart from the checkpoint: prior counts must carry over
    val q2 = startQuery()
    try {
      ms.addData(StreamEvent(t("2024-01-01 10:02:00"), 3, "click", 1.0))
      q2.processAllAvailable()
      assert(spark.table("ckpt_agg").where(col("eventType") === "click")
        .head.getLong(1) == 3L)
    } finally q2.stop()
  }

  test("stream-stream join matches clicks to impressions within the time bound") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Long, Timestamp)] // (ad_id, imp_ts)
    val clicks = MemoryStream[(Long, Timestamp)] // (ad_id, click_ts)
    val i = imps.toDS().toDF("ad_id", "imp_ts")
      .withWatermark("imp_ts", "10 minutes")
    val c = clicks.toDS().toDF("c_ad_id", "click_ts")
      .withWatermark("click_ts", "10 minutes")
    // click must land within 30 minutes AFTER its impression — the
    // state-bounded interval join (watermarks let Spark drop old state)
    val joined = i.join(c,
      col("ad_id") === col("c_ad_id") &&
        col("click_ts") >= col("imp_ts") &&
        col("click_ts") <= col("imp_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("ad_id"), col("imp_ts"), col("click_ts"))
    val q = joined.writeStream.format("memory").queryName("attributed")
      .outputMode("append").start()
    try {
      imps.addData((10L, t("2024-01-01 10:00:00")),
        (20L, t("2024-01-01 10:05:00")))
      q.processAllAvailable()
      clicks.addData((10L, t("2024-01-01 10:20:00")), // within 30m → match
        (20L, t("2024-01-01 11:30:00"))) // 85m later → no match
      q.processAllAvailable()
      val rows = spark.table("attributed")
        .collect().map(_.getLong(0)).toSeq
      assert(rows == Seq(10L))
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER join emits unmatched rows on watermark close") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp)]
    val i = imps.toDS().toDF("ad_id", "imp_ts")
      .withWatermark("imp_ts", "10 minutes")
    val c = clicks.toDS().toDF("c_ad_id", "click_ts")
      .withWatermark("click_ts", "10 minutes")
    // outer semantics: an impression with no click inside its 30-minute
    // attribution window must STILL emit (click columns null) — but only
    // once the watermark proves no matching click can arrive, which is
    // what bounds the join state at scale
    val joined = i.join(c,
      col("ad_id") === col("c_ad_id") &&
        col("click_ts") >= col("imp_ts") &&
        col("click_ts") <= col("imp_ts") + expr("INTERVAL 30 MINUTES"),
      "left_outer")
      .select(col("ad_id"), col("imp_ts"), col("click_ts"))
    val q = joined.writeStream.format("memory").queryName("attributed_outer")
      .outputMode("append").start()
    try {
      imps.addData((10L, t("2024-01-01 10:00:00")),
        (20L, t("2024-01-01 10:05:00")))
      clicks.addData((10L, t("2024-01-01 10:20:00"))) // ad 10 converts
      q.processAllAvailable()
      // nothing for ad 20 yet: its window is still open
      assert(!spark.table("attributed_outer").collect()
        .exists(_.getLong(0) == 20L))
      // advance BOTH watermarks far past 10:05 + 30m window + 10m delay
      imps.addData((99L, t("2024-01-01 13:00:00")))
      clicks.addData((98L, t("2024-01-01 13:00:00")))
      q.processAllAvailable()
      imps.addData((97L, t("2024-01-01 14:00:00")))
      clicks.addData((96L, t("2024-01-01 14:00:00")))
      q.processAllAvailable()
      val rows = spark.table("attributed_outer")
        .where(col("ad_id").isin(10L, 20L))
        .collect()
        .map(r => (r.getLong(0), Option(r.getTimestamp(2)))).toSet
      assert(rows == Set(
        (10L, Some(t("2024-01-01 10:20:00"))),
        (20L, None)), s"got: $rows")
    } finally q.stop()
  }

  test("windowed aggregation runs on the RocksDB state store provider") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    // RocksDB keeps streaming state off-heap + on local disk — the
    // production choice once keyed state outgrows executor memory; the
    // operator code is IDENTICAL, only the provider conf changes
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    val ms = MemoryStream[StreamEvent]
    val q = ms.toDS()
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("eventType"))
      .agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("rocks_agg")
      .outputMode("complete").start()
    try {
      ms.addData(
        StreamEvent(t("2024-01-01 10:05:00"), 1, "click", 1.0),
        StreamEvent(t("2024-01-01 10:25:00"), 2, "click", 2.0),
        StreamEvent(t("2024-01-01 11:05:00"), 1, "view", 4.0))
      q.processAllAvailable()
      val rows = spark.table("rocks_agg")
        .select(col("eventType"), col("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(rows == Set(("click", 2L), ("view", 1L)))
      // the provider really is RocksDB: its custom metrics surface in
      // the query progress
      assert(q.lastProgress.toString.contains("rocksdb"),
        q.lastProgress.toString.take(500))
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("stream-static join enriches a stream against a broadcast dimension") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val ms = MemoryStream[StreamEvent]
    val enriched = ms.toDS()
      .join(org.apache.spark.sql.functions.broadcast(dim),
        col("userId") === dim("user_id"), "left_outer")
      .select(col("userId"), col("eventType"),
        coalesce(col("tier"), lit("none")).as("tier"))
    val q = enriched.writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      ms.addData(StreamEvent(t("2024-01-01 10:00:00"), 1, "click", 1.0),
        StreamEvent(t("2024-01-01 10:01:00"), 3, "view", 1.0))
      q.processAllAvailable()
      val rows = spark.table("enriched")
        .collect().map(r => (r.getLong(0), r.getString(2))).toSet
      assert(rows == Set((1L, "gold"), (3L, "none")))
    } finally q.stop()
  }

  test("streaming dedup drops replayed event ids across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, Timestamp, String)]
    val deduped = ms.toDS().toDF("event_id", "ts", "payload")
      .withWatermark("ts", "10 minutes")
      // state for an id is held until the watermark passes its ts + gap,
      // so at-least-once upstream delivery becomes exactly-once here
      .dropDuplicatesWithinWatermark("event_id")
    val q = deduped.writeStream.format("memory").queryName("stream_dedup")
      .outputMode("append").start()
    try {
      ms.addData((1L, t("2024-01-01 10:00:00"), "a"),
        (2L, t("2024-01-01 10:01:00"), "b"))
      q.processAllAvailable()
      // replay of id 1 in a LATER micro-batch (the at-least-once case)
      ms.addData((1L, t("2024-01-01 10:00:00"), "a-dup"),
        (3L, t("2024-01-01 10:02:00"), "c"))
      q.processAllAvailable()
      val seen = spark.table("stream_dedup")
        .select("event_id").as[Long].collect().sorted
      assert(seen.toSeq == Seq(1L, 2L, 3L)) // id 1 exactly once
    } finally q.stop()
  }

  test("mapGroupsWithState maintains custom per-key state across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[StreamEvent]
    val updated = ms.toDS()
      .groupByKey(_.userId)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (userId: Long, events: Iterator[StreamEvent], state: GroupState[UserAgg]) =>
          val prev = state.getOption.getOrElse(UserAgg(userId, 0L, 0.0))
          val evs = events.toSeq
          val next = UserAgg(userId, prev.nEvents + evs.size,
            prev.sumValue + evs.map(_.value).sum)
          state.update(next)
          next
      }
    val q = updated.writeStream.format("memory").queryName("user_state")
      .outputMode("update").start()
    try {
      ms.addData(StreamEvent(t("2024-01-01 10:00:00"), 1, "click", 1.0),
        StreamEvent(t("2024-01-01 10:01:00"), 1, "click", 2.0),
        StreamEvent(t("2024-01-01 10:02:00"), 2, "view", 5.0))
      q.processAllAvailable()
      ms.addData(StreamEvent(t("2024-01-01 10:10:00"), 1, "view", 4.0))
      q.processAllAvailable()
      // state carried across micro-batches: user 1 saw 2 then 3 events
      val last = spark.table("user_state")
        .groupBy(col("userId"))
        .agg(max(col("nEvents")).as("n"), max(col("sumValue")).as("s"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
        .toMap
      assert(last(1L) == ((3L, 7.0)))
      assert(last(2L) == ((1L, 5.0)))
    } finally q.stop()
  }
}

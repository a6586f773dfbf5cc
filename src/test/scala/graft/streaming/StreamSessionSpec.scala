package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The streaming session twin must agree with the one-shot batch
  * session_window aggregation on a replayed timeline — INCLUDING the
  * case that makes sessions the hard streaming shape: an out-of-order
  * event arriving in a LATER micro-batch that bridges two already-open
  * provisional sessions, forcing a state-side merge before anything
  * was emitted. Events behind the watermark are dropped by contract
  * (pinned), and sessions emit exactly once, only after the watermark
  * passes their end.
  */
class StreamSessionSpec extends SparkSuite {

  private def t(s: String): Timestamp = Timestamp.valueOf(s)

  test("streaming sessions merge across batches and match the batch result") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Timestamp, Long, Double)]
    val q = StreamSession(ms.toDF()
        .toDF("ts", "user_id", "value")
        .withWatermark("ts", "60 minutes"))
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    // user 7: one clean session (10:00, 10:10), then a second after an
    // 80-minute gap (11:30). user 8: batch 1 leaves TWO provisional
    // sessions (10:00 and 10:50, gap 50 min > 30); batch 2's 10:25
    // event is out of order but inside the watermark and bridges them
    // — the engine must merge all three into ONE session.
    val feeds = Seq(
      Seq((t("2024-01-01 10:00:00"), 7L, 1.0),
        (t("2024-01-01 10:10:00"), 7L, 2.0),
        (t("2024-01-01 10:00:00"), 8L, 4.0),
        (t("2024-01-01 10:50:00"), 8L, 8.0)),
      Seq((t("2024-01-01 10:25:00"), 8L, 16.0),
        (t("2024-01-01 11:30:00"), 7L, 32.0)),
      // watermark driver: pushes WM to 13:00, closing every session
      // above (latest end = 11:30 + 30 min = 12:00 ≤ 13:00)
      Seq((t("2024-01-01 14:00:00"), 9L, 0.5)))
    try {
      feeds.foreach { f => ms.addData(f: _*); q.processAllAvailable() }

      val streamed = spark.table("sessions")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1),
          r.getLong(2), r.getDouble(3))).toSet
      // batch ground truth: the SAME aggregation, one shot, over every
      // event the stream accepted — restricted to sessions the final
      // watermark (13:00) actually closed (user 9's is still open)
      val batch = StreamSession(
          feeds.flatten.toDF("ts", "user_id", "value"))
        .where(col("session_start") < lit(t("2024-01-01 12:00:00")))
        .collect().map(r => (r.getLong(0), r.getTimestamp(1),
          r.getLong(2), r.getDouble(3))).toSet
      assert(streamed == batch,
        s"stream-only: ${streamed -- batch}; batch-only: ${batch -- streamed}")
      // the merge really happened: user 8 has ONE session, 3 events,
      // starting at the earliest bridged event
      assert(streamed.count(_._1 == 8L) == 1)
      assert(streamed.contains((8L, t("2024-01-01 10:00:00"), 3L, 28.0)))
      // user 7: the 80-minute gap split two sessions
      assert(streamed.count(_._1 == 7L) == 2)
      assert(streamed.contains((7L, t("2024-01-01 10:00:00"), 2L, 3.0)))
      assert(streamed.contains((7L, t("2024-01-01 11:30:00"), 1L, 32.0)))
      // user 9's session end (14:30) is ahead of the watermark — NOT
      // emitted yet: append mode only ships finalized sessions
      assert(!streamed.exists(_._1 == 9L))

      // late-drop contract: an event behind the watermark (13:00) is
      // discarded — no new session appears, nothing reopens
      ms.addData((t("2024-01-01 11:00:00"), 7L, 999.0))
      ms.addData((t("2024-01-01 16:00:00"), 9L, 0.25))
      q.processAllAvailable()
      val after = spark.table("sessions")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1),
          r.getLong(2), r.getDouble(3))).toSet
      assert(!after.exists(r => r._1 == 7L && r._4 == 999.0),
        "late event must be dropped, not start a phantom session")
      // and the watermark advance finalized user 9's first session
      assert(after.contains((9L, t("2024-01-01 14:00:00"), 1L, 0.5)))
    } finally q.stop()
  }
}

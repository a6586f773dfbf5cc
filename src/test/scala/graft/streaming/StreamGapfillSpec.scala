package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.analytics.EventQueries

/** The streaming gapfill twin must agree with the oracle-checked batch
  * query on a replayed timeline: every (key, hour) the watermark has
  * closed carries exactly the batch result's count/sum — including
  * explicit ZERO rows for hours where the key was silent — and hours
  * the watermark has not closed are not emitted at all.
  *
  * Span semantics differ by design and the diff accounts for it: the
  * batch query fills one GLOBAL spine (min..max hour × every key);
  * the stream can only start a key at its own first event (it cannot
  * know a key exists before then) and can only close hours behind the
  * watermark. So agreement = batch rows restricted to
  * [key's first hour, last watermark-closed hour].
  */
class StreamGapfillSpec extends SparkSuite {

  private def t(s: String): Timestamp = Timestamp.valueOf(s)

  test("streaming gapfill agrees with the batch query on a replayed timeline") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Timestamp, String, Double)]
    val q = StreamGapfill(ms.toDS().withWatermark("_1", "10 minutes"))
      .writeStream.format("memory").queryName("gapfill")
      .outputMode("append").start()
    // click: active in hour 10, then SILENT; view: starts later (hour
    // 11), beats sparsely — its beats drive the watermark that must
    // zero-fill click's silent hours
    val feeds = Seq(
      Seq((t("2024-01-01 10:05:00"), "click", 1.0),
        (t("2024-01-01 10:40:00"), "click", 2.5)),
      Seq((t("2024-01-01 11:20:00"), "view", 4.0)),
      Seq((t("2024-01-01 13:40:00"), "view", 1.5)),
      Seq((t("2024-01-01 16:00:00"), "view", 0.25)))
    try {
      feeds.foreach { f => ms.addData(f: _*); q.processAllAvailable() }
      // one more empty-ish cycle so event-time timers behind the final
      // watermark all fire
      ms.addData((t("2024-01-01 16:00:01"), "view", 0.0))
      q.processAllAvailable()

      val streamed = spark.table("gapfill")
        .select(col("eventType").as("event_type"), col("hour"),
          col("n"), col("sumValue").as("sum_value"))
      // final watermark = 16:00:01 - 10 min; last closed hour = 14:00
      val lastClosed = t("2024-01-01 14:00:00")
      val input = feeds.flatten
        .toDF("ts", "event_type", "value")
      val firstHours = input.groupBy(col("event_type"))
        .agg(date_trunc("hour", min(col("ts"))).as("first_hour"))
      val expected = EventQueries.gapfillFrame(input)
        .join(firstHours, "event_type")
        .where(col("hour") >= col("first_hour") &&
          col("hour") <= lit(lastClosed))
        .select(col("event_type"), col("hour"), col("n"), col("sum_value"))

      def asSet(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getString(0), r.getTimestamp(1),
          r.getLong(2), r.getDouble(3))).toSet
      val s = asSet(streamed)
      val e = asSet(expected)
      assert(s == e, s"stream-only: ${s -- e}; batch-only: ${e -- s}")

      // the property that a windowed aggregation cannot express: the
      // silent hours are PRESENT as explicit zero rows
      assert(s.contains(("click", t("2024-01-01 11:00:00"), 0L, 0.0)))
      assert(s.contains(("click", t("2024-01-01 14:00:00"), 0L, 0.0)))
      assert(s.contains(("view", t("2024-01-01 12:00:00"), 0L, 0.0)))
      // view starts at ITS first hour, not the global one
      assert(!s.exists(r => r._1 == "view" &&
        r._2.before(t("2024-01-01 11:00:00"))))
      // nothing beyond the watermark leaked
      assert(!s.exists(_._2.after(lastClosed)))
    } finally q.stop()
  }

  test("a non-late out-of-order event before first emission extends the spine down") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Timestamp, String, Double)]
    val q = StreamGapfill(ms.toDS().withWatermark("_1", "10 minutes"))
      .writeStream.format("memory").queryName("gapfill_ooo")
      .outputMode("append").start()
    try {
      // first batch pins the frontier at 12:00 (nothing emitted: wm=0)
      ms.addData((t("2024-01-01 12:05:00"), "click", 1.0))
      q.processAllAvailable()
      // wm is now 11:55; 11:58 is NOT late and must reopen hour 11:00
      ms.addData((t("2024-01-01 11:58:00"), "click", 2.0))
      q.processAllAvailable()
      ms.addData((t("2024-01-01 13:30:00"), "click", 0.0)) // closes 11,12
      q.processAllAvailable()
      ms.addData((t("2024-01-01 13:31:00"), "click", 0.0))
      q.processAllAvailable()
      val rows = spark.table("gapfill_ooo")
        .collect().map(r => (r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(rows.contains((t("2024-01-01 11:00:00"), 1L, 2.0)),
        s"hour 11 lost: $rows")
      assert(rows.contains((t("2024-01-01 12:00:00"), 1L, 1.0)))
    } finally q.stop()
  }

  test("streaming gapfill emits each closed hour exactly once across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Timestamp, String, Double)]
    val q = StreamGapfill(ms.toDS().withWatermark("_1", "10 minutes"))
      .writeStream.format("memory").queryName("gapfill_once")
      .outputMode("append").start()
    try {
      // two events in the same hour arriving in DIFFERENT micro-batches
      ms.addData((t("2024-01-01 10:05:00"), "click", 1.0))
      q.processAllAvailable()
      ms.addData((t("2024-01-01 10:50:00"), "click", 0.5))
      q.processAllAvailable()
      ms.addData((t("2024-01-01 12:30:00"), "click", 2.0))
      q.processAllAvailable()
      ms.addData((t("2024-01-01 12:31:00"), "click", 0.0))
      q.processAllAvailable()
      val rows = spark.table("gapfill_once")
        .groupBy(col("eventType"), col("hour"))
        .agg(count(lit(1)).as("emits"), max(col("n")).as("n"),
          max(col("sumValue")).as("s"))
        .collect()
        .map(r => (r.getTimestamp(1), r.getLong(2), r.getLong(3),
          r.getDouble(4)))
      // every emitted (key, hour) appears exactly once
      assert(rows.forall(_._2 == 1L))
      val byHour = rows.map(r => r._1 -> ((r._3, r._4))).toMap
      // both same-hour events landed in one bucket despite the batch split
      assert(byHour(t("2024-01-01 10:00:00")) == ((2L, 1.5)))
      assert(byHour(t("2024-01-01 11:00:00")) == ((0L, 0.0)))
    } finally q.stop()
  }
}

package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The streaming EWMA must agree with the batch recurrence folded over
  * the same dense hourly spine: per key, every watermark-closed hour
  * carries (count, ewma×8) with silent hours decaying the accumulator
  * through explicit zero steps, each hour emitted exactly once.
  */
class StreamEwmaSpec extends SparkSuite {

  private def t(s: String): Timestamp = Timestamp.valueOf(s)

  test("streaming EWMA equals the batch fold over the closed spine") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Timestamp, String)]
    val q = StreamEwma(ms.toDS().withWatermark("_1", "10 minutes"))
      .writeStream.format("memory").queryName("ewma")
      .outputMode("append").start()
    // click: 2 events in hour 10, silent 11–13, 1 event in hour 14;
    // the trailing beat closes hours through 14
    val feeds = Seq(
      Seq((t("2024-01-01 10:05:00"), "click"),
        (t("2024-01-01 10:40:00"), "click")),
      Seq((t("2024-01-01 14:20:00"), "click")),
      Seq((t("2024-01-01 15:30:00"), "click")),
      Seq((t("2024-01-01 16:20:00"), "click")))
    try {
      feeds.foreach { f => ms.addData(f: _*); q.processAllAvailable() }
      val rows = spark.table("ewma")
        .orderBy(col("hour"))
        .collect()
        .map(r => (r.getTimestamp(1), r.getLong(2), r.getLong(3)))
      // watermark after last feed = 16:10 → closed hours 10..15
      val hours = (10 to 15)
        .map(h => t(f"2024-01-01 $h%02d:00:00"))
      assert(rows.map(_._1).toSeq == hours,
        s"closed spine mismatch: ${rows.toSeq}")
      // fold the batch recurrence over the dense series
      val counts = Map(10 -> 2L, 14 -> 1L, 15 -> 1L).withDefaultValue(0L)
      var e = 0L
      val expect = (10 to 15).map { h =>
        val n = counts(h)
        e = if (h == 10) n * 8L else (e * 7L) / 8L + n * 8L
        (t(f"2024-01-01 $h%02d:00:00"), n, e)
      }
      assert(rows.toSeq == expect,
        s"got ${rows.toSeq}\nwant $expect")
      // decay is strict through silent hours: 16 → 14 → 12 → 10
      assert(rows.map(_._3).take(4).toSeq == Seq(16L, 14L, 12L, 10L))
      // each hour emitted exactly once
      assert(rows.map(_._1).distinct.length == rows.length)
    } finally q.stop()
  }
}

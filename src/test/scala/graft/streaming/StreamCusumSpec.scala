package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The streaming CUSUM must agree with the batch recurrence folded
  * over the same dense hourly spine: per key, every watermark-closed
  * hour carries (count, pos, neg, alarm), silent hours step the sums
  * with explicit zeros, and a sustained shortfall accumulates into an
  * alarm that a per-hour threshold check would never fire.
  */
class StreamCusumSpec extends SparkSuite {

  private def t(s: String): Timestamp = Timestamp.valueOf(s)

  test("streaming CUSUM equals the batch fold and alarms on drift") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Timestamp, String)]
    // baseline 4 events/hour, slack 1: a single quiet hour moves
    // neg by only 3 (< alarm 5), but three quiet hours accumulate 9
    val q = StreamCusum(ms.toDS().withWatermark("_1", "10 minutes"),
        target = 4L, k = 1L)
      .writeStream.format("memory").queryName("cusum")
      .outputMode("append").start()
    // hour 10 on-target (4 events), hours 11-13 silent (the sustained
    // shortfall), hour 14 has 1 event; the 16:20 beat closes through 15
    val feeds = Seq(
      (0 until 4).map(i => (t(f"2024-01-01 10:${10 + i}%02d:00"), "click")),
      Seq((t("2024-01-01 14:20:00"), "click")),
      Seq((t("2024-01-01 16:20:00"), "click")))
    try {
      feeds.foreach { f => ms.addData(f: _*); q.processAllAvailable() }
      val rows = spark.table("cusum").orderBy(col("hour")).collect()
        .map(r => (r.getTimestamp(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getBoolean(5)))
      val counts = Map(10 -> 4L, 14 -> 1L, 15 -> 0L).withDefaultValue(0L)
      var (pos, neg) = (0L, 0L)
      val expect = (10 to 15).map { h =>
        val n = counts(h)
        pos = math.max(0L, pos + n - 4L - 1L)
        neg = math.max(0L, neg + 4L - n - 1L)
        (t(f"2024-01-01 $h%02d:00:00"), n, pos, neg, pos > 5L || neg > 5L)
      }
      assert(rows.toSeq == expect, s"got ${rows.toSeq}\nwant $expect")
      // the drift story the operator exists for: hour 10 is clean,
      // no single hour breaches on its own, and the alarm first fires
      // only once the shortfall has ACCUMULATED (hour 12: neg = 6)
      assert(!rows(0)._5 && !rows(1)._5)
      assert(rows(2)._5, s"accumulated drift must alarm: ${rows(2)}")
      // sums are one-sided: pos never goes negative through the dip
      assert(rows.forall(r => r._3 >= 0L && r._4 >= 0L))
      // each hour emitted exactly once, dense spine 10..15
      assert(rows.map(_._1).toSeq ==
        (10 to 15).map(h => t(f"2024-01-01 $h%02d:00:00")))
    } finally q.stop()
  }
}

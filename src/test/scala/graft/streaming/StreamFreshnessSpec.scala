package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The silence alarm must fire exactly once per outage, with the
  * realized lag, and close the loop with a recovery edge when the
  * feed returns — while a continuously healthy key on the same
  * stream never alerts.
  */
class StreamFreshnessSpec extends SparkSuite {

  private def t(s: String): Timestamp = Timestamp.valueOf(s)

  test("one stale edge per outage, recovery closes it, healthy key silent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Timestamp, String)]
    // SLO = 30 min silence; watermark delay 10 min
    val q = StreamFreshness(ms.toDS().withWatermark("_1", "10 minutes"),
        sloMs = 30L * 60L * 1000L)
      .writeStream.format("memory").queryName("fresh")
      .outputMode("append").start()
    try {
      // both feeds alive at 10:00
      ms.addData((t("2024-01-01 10:00:00"), "orders"),
        (t("2024-01-01 10:00:00"), "clicks"))
      q.processAllAvailable()
      // clicks keeps beating; orders goes silent. Watermark reaches
      // 10:50 (11:00 - 10m): orders' 10:00 + 30m SLO has passed
      ms.addData((t("2024-01-01 11:00:00"), "clicks"))
      q.processAllAvailable()
      ms.addData((t("2024-01-01 11:30:00"), "clicks"))
      q.processAllAvailable()
      val afterOutage = spark.table("fresh").collect()
        .map(r => (r.getString(0), r.getString(1), r.getTimestamp(2),
          r.getLong(3)))
      // exactly ONE stale edge, for orders only, lag = wm(10:50) - 10:00
      assert(afterOutage.toSeq ==
        Seq(("orders", "stale", t("2024-01-01 10:00:00"), 3000L)),
        s"got ${afterOutage.toSeq}")
      // orders comes back at 12:00: one recovery edge with the outage
      // span, and the alert cycle re-arms
      ms.addData((t("2024-01-01 12:00:00"), "orders"),
        (t("2024-01-01 12:00:00"), "clicks"))
      q.processAllAvailable()
      val afterRecovery = spark.table("fresh").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(3)))
      assert(afterRecovery.count(_._2 == "recovered") == 1)
      assert(afterRecovery.contains(("orders", "recovered", 7200L)),
        s"got ${afterRecovery.toSeq}")
      // a second outage must alert AGAIN (the flag reset on recovery)
      ms.addData((t("2024-01-01 13:30:00"), "clicks"))
      q.processAllAvailable()
      ms.addData((t("2024-01-01 14:00:00"), "clicks"))
      q.processAllAvailable()
      val second = spark.table("fresh").collect()
        .map(r => (r.getString(0), r.getString(1)))
        .count(_ == ("orders", "stale"))
      assert(second == 2, "second outage must produce a second edge")
      // clicks never alerted through the whole timeline
      assert(!spark.table("fresh").collect().exists(_.getString(0) == "clicks"))
    } finally q.stop()
  }
}

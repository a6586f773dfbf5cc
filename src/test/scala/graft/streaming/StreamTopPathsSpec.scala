package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.streaming.StreamTopPaths.Ev

/** Streaming trigram mining equals the batch window recompute, with
  * journeys spanning micro-batch boundaries (the state hand-off is
  * the thing under test).
  */
class StreamTopPathsSpec extends SparkSuite {

  test("stream trigram counts equal the batch lead-window recompute") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // two users; user 1's journey spans all three batches, so two of
    // its trigrams straddle a batch boundary; user 2 has exactly one
    // trigram; user 3 never completes one
    val batches = Seq(
      Seq(Ev(1L, 10L, 1L, "view"), Ev(1L, 20L, 2L, "click"),
        Ev(2L, 10L, 3L, "view")),
      Seq(Ev(1L, 30L, 4L, "cart"), Ev(2L, 20L, 5L, "view"),
        Ev(3L, 10L, 6L, "view")),
      Seq(Ev(1L, 40L, 7L, "purchase"), Ev(2L, 30L, 8L, "click"),
        Ev(3L, 20L, 9L, "click")))

    val ms = MemoryStream[Ev]
    val q = StreamTopPaths(ms.toDS()).toDF()
      .writeStream.format("memory").queryName("paths")
      .outputMode("append").start()
    try {
      batches.foreach { b => ms.addData(b); q.processAllAvailable() }
      val got = spark.table("paths")
        .groupBy("e1", "e2", "e3").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getString(1),
          r.getString(2)) -> r.getLong(3)).toMap

      // batch twin: the same double-lead recompute events_top_paths runs
      val all = batches.flatten.toDS()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("userId")).orderBy(col("tsMs"), col("eventId"))
      val want = all
        .withColumn("e2", lead(col("eventType"), 1).over(w))
        .withColumn("e3", lead(col("eventType"), 2).over(w))
        .where(col("e3").isNotNull)
        .groupBy(col("eventType").as("e1"), col("e2"), col("e3"))
        .agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getString(1),
          r.getString(2)) -> r.getLong(3)).toMap

      assert(got == want, s"got $got\nwant $want")
      // the boundary-straddling journey really produced its trigrams
      assert(got(("view", "click", "cart")) == 1L)
      assert(got(("click", "cart", "purchase")) == 1L)
      assert(got.values.sum == 3L) // 2 (user 1) + 1 (user 2) + 0 (user 3)
    } finally q.stop()
  }

  test("idle users expire on the watermark and restart their journeys") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val ms = MemoryStream[Ev]
    // 50 ms event-time idle expiry, zero watermark delay: once the
    // watermark moves 50 ms past a user's last event, their suffix
    // must be GONE — the next events start a fresh journey
    val q = StreamTopPaths(ms.toDS(), idleExpiryMs = 50L,
        watermarkDelay = "0 milliseconds").toDF()
      .writeStream.format("memory").queryName("paths_exp")
      .outputMode("append").start()
    try {
      // user 1 accumulates a 2-event suffix (one event short of a path)
      ms.addData(Ev(1L, 1000L, 1L, "view"), Ev(1L, 1100L, 2L, "click"))
      q.processAllAvailable()
      // another user drives the watermark far past 1100 + 50
      ms.addData(Ev(9L, 1000000L, 3L, "view"))
      q.processAllAvailable()
      ms.addData(Ev(9L, 1000001L, 4L, "click"))
      q.processAllAvailable() // timeout sweep fires here: user 1 reset
      // user 1 returns: three fresh events = exactly ONE trigram; a
      // surviving suffix would instead complete (view, click, cart)
      ms.addData(Ev(1L, 1000100L, 5L, "cart"),
        Ev(1L, 1000200L, 6L, "purchase"), Ev(1L, 1000300L, 7L, "view"))
      q.processAllAvailable()
      val got = spark.table("paths_exp").where(col("userId") === 1L)
        .collect().map(r => (r.getString(1), r.getString(2),
          r.getString(3))).toSeq
      assert(got == Seq(("cart", "purchase", "view")),
        s"expiry failed, user-1 paths: $got")
    } finally q.stop()
  }
}

package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.analytics.{EventQueries, QueryUtil}
import graft.streaming.StreamAttribution.Touch

/** The streaming attributor must reproduce the batch window's
  * verdicts purchase-for-purchase on a replayed log, and its state
  * must expire once the lookback horizon passes.
  */
class StreamAttributionSpec extends SparkSuite {

  test("streamed credits equal the batch attribution on a corpus replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ev = QueryUtil.table(spark, sf0001, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        floor(col("value") * 1000).cast("long").as("vm"),
        unix_timestamp(col("ts")).as("s"))
      .collect()
      .map(r => Touch(r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4), new Timestamp(r.getLong(4) * 1000L)))
      .sortBy(t => (t.s, t.eventId))
    val ms = MemoryStream[Touch]
    val late = spark.sparkContext.longAccumulator("late_touches")
    val q = StreamAttribution(ms.toDS(), lateTouches = Some(late))
      .writeStream.format("memory").queryName("attr_live").start()
    try {
      ev.grouped(math.max(1, ev.length / 3)).foreach { slice =>
        ms.addData(slice.toSeq); q.processAllAvailable()
      }
      assert(late.value == 0L,
        "in-order replay must report zero late touches")
      val got = spark.table("attr_live")
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2))
        .toMap
      // independent per-user fold sharing no code with the operator
      val want = scala.collection.mutable.Map[(Long, Long), String]()
      ev.groupBy(_.userId).values.foreach { ts =>
        var lastClick = Option.empty[Long]
        var lastView = Option.empty[Long]
        ts.sortBy(t => (t.s, t.eventId)).foreach { t =>
          t.eventType match {
            case "click" => lastClick = Some(lastClick.fold(t.s)(_ max t.s))
            case "view" => lastView = Some(lastView.fold(t.s)(_ max t.s))
            case "purchase" =>
              val within = (x: Option[Long]) =>
                x.exists(v => t.s - v <= StreamAttribution.LookbackS)
              want((t.userId, t.eventId)) =
                if (within(lastClick) && (lastView.isEmpty ||
                  lastClick.get >= lastView.get)) "click"
                else if (within(lastView)) "view"
                else "direct"
            case _ => ()
          }
        }
      }
      assert(got == want.toMap,
        "streamed per-purchase channels diverge from the reference fold")
      // and the channel totals must equal the ORACLE-CHECKED batch
      // query's n_purchases — chaining the stream to the DuckDB gate
      val batch = EventQueries.eventsAttribution(spark, sf0001)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val gotCounts = got.values.groupBy(identity).map {
        case (c, g) => c -> g.size.toLong
      }
      assert(gotCounts == batch.filter(_._2 > 0),
        s"channel rollup diverges: $gotCounts vs $batch")
    } finally q.stop()
  }

  test("state expires past the lookback horizon; verdicts unchanged") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val day = 86400L
    def t(u: Long, e: Long, ty: String, s: Long) =
      Touch(u, e, ty, 1000L, s, new Timestamp(s * 1000L))
    val ms = MemoryStream[Touch]
    val q = StreamAttribution(ms.toDS())
      .writeStream.format("memory").queryName("attr_expiry").start()
    try {
      // u1 clicks on day 0; u2 keeps the watermark moving
      ms.addData(t(1, 1, "click", 0), t(2, 2, "view", 0))
      q.processAllAvailable()
      // u2 activity on day 8 pushes the watermark past u1's horizon
      ms.addData(t(2, 3, "view", 8 * day))
      q.processAllAvailable()
      ms.addData(t(2, 4, "view", 8 * day + 60))
      q.processAllAvailable()
      // u1's state is gone — but the verdict matches batch anyway: an
      // 8-day-old click is outside the lookback either way
      ms.addData(t(1, 5, "purchase", 9 * day), t(2, 6, "purchase", 9 * day))
      q.processAllAvailable()
      val rows = spark.table("attr_expiry")
        .collect().map(r => r.getLong(1) -> r.getString(2)).toMap
      assert(rows(5L) == "direct", "expired touch must not credit")
      assert(rows(6L) == "view", "in-lookback view must credit")
      val stateRows = q.lastProgress.stateOperators.head.numRowsTotal
      assert(stateRows <= 2, s"state must stay horizon-bounded: $stateRows")
    } finally q.stop()
  }

  test("cross-batch late touch trips the divergence counter") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def t(u: Long, e: Long, ty: String, s: Long) =
      Touch(u, e, ty, 1000L, s, new Timestamp(s * 1000L))
    val ms = MemoryStream[Touch]
    val late = spark.sparkContext.longAccumulator("late_touches")
    val q = StreamAttribution(ms.toDS(), watermark = "1 hour",
        lateTouches = Some(late))
      .writeStream.format("memory").queryName("attr_late").start()
    try {
      // batch 1: the purchase is credited "direct" (no touch yet)
      ms.addData(t(1, 1, "purchase", 100))
      q.processAllAvailable()
      assert(late.value == 0L)
      // batch 2: a click whose event time PRECEDES the already-
      // credited purchase arrives within the 1h watermark — the batch
      // query would have credited "click"; live output already said
      // "direct" and cannot be amended (Append mode). The counter is
      // the only signal that parity is gone.
      ms.addData(t(1, 2, "click", 50))
      q.processAllAvailable()
      assert(late.value == 1L,
        "a frontier-regressing touch must be counted as late")
      val rows = spark.table("attr_late")
        .collect().map(r => r.getLong(1) -> r.getString(2)).toMap
      assert(rows(1L) == "direct",
        "the already-emitted credit stays as emitted — hence the counter")
    } finally q.stop()
  }
}

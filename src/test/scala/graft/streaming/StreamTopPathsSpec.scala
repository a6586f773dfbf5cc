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
}

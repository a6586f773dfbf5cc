package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.core.Tables

/** File-based streaming source — the production ingress shape when
  * there's no broker (SURVEY.md §2 S1: rows land somewhere the engine
  * reads). New files appear in a directory; the stream discovers and
  * processes them incrementally with bounded per-trigger intake.
  */
class FileStreamSpec extends SparkSuite {

  test("file source discovers arriving parquet and aggregates incrementally") {
    val dir = Files.createTempDirectory("graft-filestream").toString
    val events = Tables.load(spark, sf0001, "events").cache()
    val schema = events.schema
    // first file lands before the stream starts
    events.where(col("event_id") < 500)
      .coalesce(1).write.mode("append").parquet(dir)
    val counts = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1) // bounded intake per micro-batch
      .parquet(dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))
    val q = counts.writeStream.format("memory").queryName("file_counts")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val first = spark.table("file_counts")
        .agg(sum(col("n"))).head.getLong(0)
      assert(first == 500)
      // late-arriving file is picked up without restart
      events.where(col("event_id") >= 500)
        .coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
      val total = spark.table("file_counts")
        .agg(sum(col("n"))).head.getLong(0)
      assert(total == events.count())
    } finally q.stop()
  }

  test("Trigger.AvailableNow drains the backlog in bounded batches and stops") {
    val dir = Files.createTempDirectory("graft-availnow").toString
    val events = Tables.load(spark, sf0001, "events")
    val schema = events.schema
    // a multi-file backlog exists before the query starts — the
    // batch-catchup shape: process everything that is there, in
    // rate-limited micro-batches, then terminate (no always-on query)
    events.where(col("event_id") % 2 === 0)
      .coalesce(1).write.mode("append").parquet(dir)
    events.where(col("event_id") % 2 === 1)
      .coalesce(1).write.mode("append").parquet(dir)
    val counts = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))
    val q = counts.writeStream.format("memory").queryName("avail_now")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    // terminates on its own once the backlog is consumed
    assert(q.awaitTermination(120000))
    assert(spark.table("avail_now").agg(sum(col("n"))).head.getLong(0) ==
      events.count())
  }
}

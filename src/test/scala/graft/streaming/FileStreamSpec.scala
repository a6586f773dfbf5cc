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

  test("kill-and-resume from checkpoint is exactly-once end-to-end") {
    // VERDICT r10 item 4: stop a RUNNING query mid-backlog, restart it
    // against the SAME checkpointLocation, and prove the committed
    // output equals the uninterrupted run's — no loss, no duplicates.
    // The write side is the production recipe: foreachBatch +
    // IdempotentSink ledger + per-batch overwrite directories, so a
    // batch redelivered after the kill lands on the same path instead
    // of appending twice.
    val in = Files.createTempDirectory("graft-killresume-in").toString
    val out = Files.createTempDirectory("graft-killresume-out").toString
    val ckpt = Files.createTempDirectory("graft-killresume-ckpt").toString
    val ledgerDir = Files.createTempDirectory("graft-killresume-led").toString
    val events = Tables.load(spark, sf0001, "events").cache()
    val schema = events.schema
    val nFiles = 8
    (0 until nFiles).foreach { k =>
      events.where(pmod(col("event_id"), lit(nFiles)) === k)
        .coalesce(1).write.mode("append").parquet(in)
    }
    val sink = new graft.sources.IdempotentSink("kill_resume", ledgerDir)
    def startQuery() = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1) // one file per micro-batch
      .parquet(in)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        sink.commitOnce(id) {
          batch.write.mode("overwrite").parquet(s"$out/b$id")
        }
        ()
      }
      .start()

    // Run 1: let SOME batches commit, then kill the query mid-backlog.
    val q1 = startQuery()
    val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
    while (sink.lastCommitted < 1 && System.nanoTime() < deadline)
      Thread.sleep(20)
    q1.stop()
    val committedAtKill = sink.lastCommitted
    assert(committedAtKill >= 1, "at least two batches before the kill")
    assert(committedAtKill < nFiles - 1,
      s"kill must land mid-backlog, got batch $committedAtKill of $nFiles")

    // Run 2: same checkpoint, same ledger — resume and drain.
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()
    assert(sink.lastCommitted == nFiles - 1)

    // Exactly-once: the committed view is the input, bit-for-bit.
    val resumed = spark.read.parquet((0 until nFiles).map(k => s"$out/b$k"): _*)
    assert(resumed.count() == events.count())
    assert(resumed.except(events).isEmpty && events.except(resumed).isEmpty)
    // event_ids are unique in the fixture, so count==distinct ⇒ no dups
    assert(resumed.select(col("event_id")).distinct().count() == events.count())
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

package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSuite
import graft.ingest.{GraftConfig, Priority, Status}

/** Structured Streaming integration: the real queries (rate-source
  * processor loop, bulk-ingest stream) end-to-end with delay=0 so the
  * suite stays fast. Timing semantics are covered deterministically in
  * [[EngineSpec]]; this proves the Spark plumbing.
  */
class StreamingSpec extends SparkSuite {

  test("streaming processor drains ingestions to completed") {
    val engine = new IngestEngine(GraftConfig.bench, SystemSleeper)
    val proc = new StreamingProcessor(spark, engine, triggerMs = 50L)
    val Right(a) = engine.ingest(1L to 7L, Priority.Medium)
    val Right(b) = engine.ingest(Seq(100L, 200L), Priority.High)
    val query = proc.start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      while (System.currentTimeMillis() < deadline &&
        !(engine.status(a).get.status == Status.Completed &&
          engine.status(b).get.status == Status.Completed)) {
        Thread.sleep(100)
      }
      assert(engine.status(a).get.status == Status.Completed)
      assert(engine.status(b).get.status == Status.Completed)
      // every batch went through the full transition
      assert(engine.snapshotBatches.forall(_.status == Status.Completed))
    } finally query.stop()
  }

  test("bulk-ingest stream chunks requests on executors into engine state") {
    import spark.implicits._
    val engine = new IngestEngine(GraftConfig.bench, SystemSleeper)
    val proc = new StreamingProcessor(spark, engine)
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, Seq[Long], String, Long)]
    val query = proc.startBulkIngest(stream)
    try {
      stream.addData(("ing-1", 1L to 7L, Priority.High, 42L))
      stream.addData(("ing-2", Seq(9L), Priority.Low, 43L))
      stream.addData(("bad", Seq(-1L), Priority.Low, 44L)) // filtered out
      query.processAllAvailable()
      val doc = engine.status("ing-1").get
      assert(doc.batches.map(_.ids) ==
        Seq(Seq(1L, 2L, 3L), Seq(4L, 5L, 6L), Seq(7L)))
      assert(doc.status == Status.YetToStart)
      assert(engine.status("ing-2").get.batches.map(_.ids) == Seq(Seq(9L)))
      assert(engine.status("bad").isEmpty) // invalid request never landed
      // queue order respects priority across stream-ingested work
      assert(engine.pendingTop.get.ingestionId == "ing-1")
    } finally query.stop()
  }
}

package graft.sources

import java.nio.file.Files

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The exactly-once foreachBatch contract: duplicate deliveries are
  * skipped, crash-before-commit replays, and a live stream through the
  * adapter lands every row exactly once in a non-transactional target.
  */
class IdempotentSinkSpec extends SparkSuite {

  test("duplicate batch ids are skipped, commit is ordered and durable") {
    val dir = Files.createTempDirectory("graft-ledger").toString
    val sink = new IdempotentSink("t1", dir)
    var writes = 0
    assert(sink.lastCommitted == -1L)
    assert(sink.commitOnce(0) { writes += 1 })
    assert(sink.commitOnce(1) { writes += 1 })
    assert(!sink.commitOnce(1) { writes += 1 }) // redelivery → skipped
    assert(!sink.commitOnce(0) { writes += 1 }) // stale → skipped
    assert(sink.commitOnce(2) { writes += 1 })
    assert(writes == 3 && sink.lastCommitted == 2L)
    // a new instance over the same ledger (post-crash restart) agrees
    val recovered = new IdempotentSink("t1", dir)
    assert(recovered.lastCommitted == 2L)
    assert(!recovered.commitOnce(2) { writes += 1 })
    // reset pairs with checkpoint deletion: ids restart at 0
    recovered.reset()
    assert(recovered.lastCommitted == -1L)
    assert(recovered.commitOnce(0) { writes += 1 } && writes == 4)
  }

  test("a failed write does not commit — the batch replays") {
    val dir = Files.createTempDirectory("graft-ledger2").toString
    val sink = new IdempotentSink("t2", dir)
    intercept[RuntimeException] {
      sink.commitOnce(0) { throw new RuntimeException("sink down") }
    }
    assert(sink.lastCommitted == -1L) // not committed
    assert(sink.commitOnce(0) {}) // replay succeeds
    assert(sink.lastCommitted == 0L)
  }

  test("stream through the adapter lands rows exactly once despite re-runs") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-ledger3").toString
    val sink = new IdempotentSink("t3", dir)
    val target = mutable.ArrayBuffer.empty[Long] // non-transactional
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Long]
    val q = input.toDS().writeStream
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[Long], id: Long) =>
        val rows = ds.collect()
        // simulate at-least-once delivery: run the handler twice
        sink.commitOnce(id) { target ++= rows }
        sink.commitOnce(id) { target ++= rows }
        ()
      }
      .start()
    try {
      input.addData(1L, 2L, 3L)
      q.processAllAvailable()
      input.addData(4L, 5L)
      q.processAllAvailable()
      assert(target.sorted == Seq(1L, 2L, 3L, 4L, 5L))
    } finally q.stop()
  }
}

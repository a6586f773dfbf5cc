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

  test("streaming processor respects priority order across live arrivals") {
    // per-id delay keeps each cycle long enough that the HIGH ingest
    // lands while LOW batch 1 is in flight; ordering is then asserted
    // from the deterministic process log, not from wall-clock phases
    val engine = new IngestEngine(
      graft.ingest.GraftConfig(rateLimitMs = 0L, perIdDelayMs = 40L),
      SystemSleeper)
    val proc = new StreamingProcessor(spark, engine, triggerMs = 20L)
    val Right(low) = engine.ingest(1L to 6L, Priority.Low) // L1, L2
    val query = proc.start()
    try {
      // wait until L1 is actually in flight, then submit HIGH
      val deadline = System.currentTimeMillis() + 30000
      while (System.currentTimeMillis() < deadline &&
        engine.status(low).get.status != Status.Triggered) Thread.sleep(5)
      val Right(high) = engine.ingest(Seq(7L, 8L), Priority.High)
      while (System.currentTimeMillis() < deadline &&
        !(engine.status(low).get.status == Status.Completed &&
          engine.status(high).get.status == Status.Completed))
        Thread.sleep(20)
      val order = engine.processLog.map(_._2)
      assert(order.length == 3)
      // HIGH ran before LOW's remaining batch
      assert(order.indexOf(high) < order.lastIndexOf(low))
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

  test("table-backed store twin: ingest, status reads, transitions, compaction") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val engine = new IngestEngine(GraftConfig.bench, SystemSleeper)
    val proc = new StreamingProcessor(spark, engine)
    val dir = java.nio.file.Files.createTempDirectory("graft-state").toString
    val store = new TableStateStore(spark, s"$dir/state", buckets = 8)
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, Seq[Long], String, Long)]
    val query = proc.startBulkIngestToTable(stream, store)
    try {
      stream.addData(("ing-1", 1L to 7L, Priority.High, 42L))
      stream.addData(("ing-2", Seq(9L), Priority.Low, 43L))
      stream.addData(("bad", Seq(-1L), Priority.Low, 44L)) // filtered out
      stream.addData(("empty", Seq.empty[Long], Priority.Low, 45L))
      query.processAllAvailable()

      // status reads over the table match the driver-map semantics
      val doc = store.statusOf("ing-1").get
      assert(doc.batches.map(_.ids) ==
        Seq(Seq(1L, 2L, 3L), Seq(4L, 5L, 6L), Seq(7L)))
      assert(doc.status == Status.YetToStart)
      assert(store.statusOf("ing-2").get.batches.map(_.ids) == Seq(Seq(9L)))
      assert(store.statusOf("bad").isEmpty) // invalid never landed
      assert(store.statusOf("nope").isEmpty) // unknown id is a 404
      // the reference's vacuous-completed for a zero-batch ingestion
      assert(store.statusOf("empty").get.status == Status.Completed)

      // the queue view orders by priority weight, then created_at
      val top = store.pendingView()
        .select("batch_id", "ingestion_id", "ordinal").limit(1).head
      assert(top.getString(1) == "ing-1" && top.getInt(2) == 0)

      // status transitions append; latest seq_no wins on read
      store.markStatus(Seq(top.getString(0)), Status.Triggered)
      assert(store.statusOf("ing-1").get.status == Status.Triggered)
      assert(store.pendingView()
        .where(col("ingestion_id") === "ing-1").count() == 2)
      val rest = store.statusOf("ing-1").get.batches.map(_.batchId)
      store.markStatus(rest, Status.Completed)
      assert(store.statusOf("ing-1").get.status == Status.Completed)

      // compaction folds the log without changing any answer
      val before = (store.statusOf("ing-1").get,
        store.statusOf("ing-2").get, store.statusOf("empty").get)
      store.compact()
      assert(store.latestBatches()
        .groupBy(col("ingestion_id"), col("batch_id")).count()
        .where(col("count") > 1).count() == 0)
      val after = (store.statusOf("ing-1").get,
        store.statusOf("ing-2").get, store.statusOf("empty").get)
      assert(after == before)
      // a reopened store resumes the seq_no ordering (append still wins)
      val reopened = new TableStateStore(spark, s"$dir/state", buckets = 8)
      assert(reopened.statusOf("ing-1").get.status == Status.Completed)
    } finally query.stop()
  }

  test("source adapter seam: spool-directory transport lands on the same pipeline") {
    // the FileSourceAdapter drives the IDENTICAL validate→chunk→upsert
    // pipeline the Memory adapter does — proving the SourceAdapter seam
    // with a second transport. (The Kafka binding builds the same
    // canonical frame; no broker/connector exists in this sandbox, so
    // its coverage IS this shared downstream path — see SourceAdapter
    // scaladoc.)
    val engine = new IngestEngine(GraftConfig.bench, SystemSleeper)
    val proc = new StreamingProcessor(spark, engine)
    val dir = java.nio.file.Files.createTempDirectory("graft-spool").toString
    val stateDir = java.nio.file.Files.createTempDirectory("graft-state-sa").toString
    val store = new TableStateStore(spark, s"$stateDir/state", buckets = 8)
    def spool(fileName: String, lines: String*): Unit = {
      import java.nio.file.{Files, Paths, StandardCopyOption}
      // write-then-rename so the stream never reads a half-written file
      val tmp = Paths.get(dir, s".$fileName.tmp")
      Files.write(tmp, lines.mkString("\n").getBytes("UTF-8"))
      Files.move(tmp, Paths.get(dir, fileName),
        StandardCopyOption.ATOMIC_MOVE)
    }
    spool("r1.json",
      """{"ingestion_id":"ing-f1","ids":[1,2,3,4,5,6,7],"priority":"HIGH","created_at":42}""",
      """{"ingestion_id":"bad","ids":[-1],"priority":"LOW","created_at":44}""")
    val query = proc.startBulkIngestFrom(new FileSourceAdapter(dir), store)
    try {
      query.processAllAvailable()
      val doc = store.statusOf("ing-f1").get
      assert(doc.batches.map(_.ids) ==
        Seq(Seq(1L, 2L, 3L), Seq(4L, 5L, 6L), Seq(7L)))
      assert(doc.status == Status.YetToStart)
      assert(store.statusOf("bad").isEmpty) // invalid filtered, same as memory path
      // a late-arriving spool file is discovered without restart
      spool("r2.json",
        """{"ingestion_id":"ing-f2","ids":[9],"priority":"LOW","created_at":43}""")
      query.processAllAvailable()
      assert(store.statusOf("ing-f2").get.batches.map(_.ids) == Seq(Seq(9L)))
      // priority order holds across transports' requests
      val top = store.pendingView()
        .select("ingestion_id").limit(1).head.getString(0)
      assert(top == "ing-f1")
    } finally query.stop()
  }

  test("table store is safe when empty and idempotent under epoch replay") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-state3").toString
    val store = new TableStateStore(spark, s"$dir/state", buckets = 4)
    // empty store: the loop reports no work instead of throwing
    assert(!store.processOnce(GraftConfig.bench, SystemSleeper))
    assert(store.pendingView().collect().isEmpty)
    store.markStatus(Seq("nope"), Status.Triggered) // no-op, no throw
    // at-least-once foreachBatch: the same request batch applied twice
    // (a crashed epoch replay) must not duplicate state — batch ids
    // are deterministic, so latest-seq_no-wins absorbs the replay
    val reqs = Seq(("ing-r", Seq(1L, 2L, 3L, 4L), Priority.High, 7L))
      .toDF("ingestion_id", "ids", "priority", "created_at")
    store.ingestRequests(reqs, GraftConfig.bench)
    store.ingestRequests(reqs, GraftConfig.bench) // replay
    val doc = store.statusOf("ing-r").get
    assert(doc.batches.map(_.ids) == Seq(Seq(1L, 2L, 3L), Seq(4L)))
    assert(doc.batches.map(_.batchId).distinct.size == 2)
    // the harder replay: the loop PROCESSES the batches, then the
    // crashed epoch replays its yet_to_start rows with a higher
    // seq_no — monotone status-rank resolution must not resurrect them
    while (store.processOnce(GraftConfig.bench, SystemSleeper)) ()
    assert(store.statusOf("ing-r").get.status == Status.Completed)
    store.ingestRequests(reqs, GraftConfig.bench) // late replay
    assert(store.statusOf("ing-r").get.status == Status.Completed)
    assert(store.pendingView().collect().isEmpty)
  }

  test("multi-writer claims give exactly-once processing under contention") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-state4").toString
    val store = new TableStateStore(spark, s"$dir/state", buckets = 4)
    val reqs = (1 to 10)
      .map(i => (s"ing-$i", Seq(i.toLong), Priority.Low, 100L + i))
      .toDF("ingestion_id", "ids", "priority", "created_at")
    store.ingestRequests(reqs, GraftConfig.bench)

    // four workers drain the same queue concurrently; each records
    // which batches IT won, then we prove the claim ledger made the
    // processed set a partition: nothing lost, nothing claimed twice
    // (violations are collected, not asserted, because an exception
    // inside a thread would fail silently)
    val processed =
      new java.util.concurrent.ConcurrentHashMap[String, String]()
    val violations =
      new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val threads = (1 to 4).map { w =>
      new Thread(() => {
        val me = s"worker-$w"
        var live = true
        while (live) {
          store.processOnceMulti(GraftConfig.bench, SystemSleeper,
            me) match {
            case TableStateStore.Processed(id) =>
              val prev = processed.putIfAbsent(id, me)
              if (prev != null)
                violations.add(s"$id claimed twice: $prev and $me")
            case TableStateStore.Contended => () // peers hold the head
            case TableStateStore.Drained => live = false
          }
        }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(120000))
    assert(violations.isEmpty, violations.toString)
    val done = store.latestBatches()
      .where(col("batch_id") =!= "" &&
        col("status") === Status.Completed)
      .select("batch_id").collect().map(_.getString(0)).toSet
    val all = store.latestBatches().where(col("batch_id") =!= "")
      .select("batch_id").collect().map(_.getString(0)).toSet
    assert(done == all && all.size == 10,
      s"completed ${done.size} of ${all.size}")
    assert(processed.size == 10, s"workers processed ${processed.size}")
    // every batch's claim owner is the worker that processed it
    processed.forEach((id, owner) =>
      if (store.claimOwner(id) != Some(owner))
        violations.add(s"$id owner mismatch"))
    assert(violations.isEmpty, violations.toString)
    // a late sweep sees a drained queue, not contention
    assert(store.processOnceMulti(GraftConfig.bench, SystemSleeper,
      "sweeper") == TableStateStore.Drained)
  }

  test("lease expiry reclaims a dead worker's batch exactly once") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-state5").toString
    val store = new TableStateStore(spark, s"$dir/state", buckets = 4)
    val lease = 60000L
    def backdateClaim(batchId: String): Unit =
      java.nio.file.Files.setLastModifiedTime(
        java.nio.file.Paths.get(s"$dir/state_claims", batchId),
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() - lease - 1000))
    def completedAppends(batchId: String): Long =
      spark.read.parquet(s"$dir/state")
        .where(col("batch_id") === batchId &&
          col("status") === Status.Completed).count()

    // --- death mode 1: worker claims, then dies BEFORE `triggered`
    store.ingestRequests(Seq(("ing-a", Seq(1L, 2L), Priority.Low, 1L))
      .toDF("ingestion_id", "ids", "priority", "created_at"),
      GraftConfig.bench)
    val batchA = store.statusOf("ing-a").get.batches.head.batchId
    assert(store.tryClaim(batchA, "dead-1")) // the doomed claim
    // a FRESH claim must not be stealable: the peer reports
    // contention, not a theft of a live worker's batch
    assert(store.processOnceMulti(GraftConfig.bench, SystemSleeper,
      "peer", leaseMs = lease) == TableStateStore.Contended)
    backdateClaim(batchA) // the lease clock runs out
    assert(store.processOnceMulti(GraftConfig.bench, SystemSleeper,
      "peer", leaseMs = lease) == TableStateStore.Processed(batchA))
    assert(store.claimOwner(batchA) == Some("peer")) // ledger reassigned
    assert(completedAppends(batchA) == 1L) // exactly one completion
    assert(store.statusOf("ing-a").get.status == Status.Completed)

    // --- death mode 2: worker dies MID-WORK (after `triggered`) —
    // the batch is invisible to pendingView, so only the stale-scan
    // recovery path can ever find it
    store.ingestRequests(Seq(("ing-b", Seq(3L), Priority.Low, 2L))
      .toDF("ingestion_id", "ids", "priority", "created_at"),
      GraftConfig.bench)
    val batchB = store.statusOf("ing-b").get.batches.head.batchId
    assert(store.tryClaim(batchB, "dead-2"))
    store.markStatus(Seq(batchB), Status.Triggered) // died right here
    // without leases the orphan is stuck forever: nothing pending
    assert(store.processOnceMulti(GraftConfig.bench, SystemSleeper,
      "peer") == TableStateStore.Drained)
    backdateClaim(batchB)
    assert(store.processOnceMulti(GraftConfig.bench, SystemSleeper,
      "peer", leaseMs = lease) == TableStateStore.Processed(batchB))
    assert(store.claimOwner(batchB) == Some("peer"))
    assert(completedAppends(batchB) == 1L)
    assert(store.statusOf("ing-b").get.status == Status.Completed)
    // the stolen claims left tombstones for audit
    val tombs = java.nio.file.Files.list(
      java.nio.file.Paths.get(s"$dir/state_claims")).toArray
      .map(_.toString).count(_.contains(".expired_"))
    assert(tombs == 2, s"expected 2 tombstones, saw $tombs")
    // everything settled: a final sweep drains
    assert(store.processOnceMulti(GraftConfig.bench, SystemSleeper,
      "peer", leaseMs = lease) == TableStateStore.Drained)
  }

  test("racing stealers of one expired claim: exactly one wins") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-state6").toString
    val store = new TableStateStore(spark, s"$dir/state", buckets = 4)
    val lease = 60000L
    store.ingestRequests(Seq(("ing-r", Seq(1L), Priority.Low, 1L))
      .toDF("ingestion_id", "ids", "priority", "created_at"),
      GraftConfig.bench)
    val batch = store.statusOf("ing-r").get.batches.head.batchId
    assert(store.tryClaim(batch, "dead"))
    java.nio.file.Files.setLastModifiedTime(
      java.nio.file.Paths.get(s"$dir/state_claims", batch),
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - lease - 1000))
    // 8 peers race the steal path simultaneously; the atomic
    // rename-to-tombstone arbitration must admit EXACTLY one — a
    // double steal would double-process, a deadlocked steal would
    // orphan the batch a second time
    val barrier = new java.util.concurrent.CyclicBarrier(8)
    val wins = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val threads = (1 to 8).map { i =>
      new Thread(() => {
        barrier.await()
        if (store.tryClaim(batch, s"stealer-$i", leaseMs = lease))
          wins.add(s"stealer-$i")
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(60000))
    assert(wins.size == 1, s"steal winners: $wins")
    assert(store.claimOwner(batch) == Some(wins.peek()))
    // the loser claims are gone, not queued: a fresh (unexpired)
    // claim by the winner blocks everyone else
    assert(!store.tryClaim(batch, "late", leaseMs = lease))
  }

  test("table-backed processing loop drains the queue in priority order") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val engine = new IngestEngine(GraftConfig.bench, SystemSleeper)
    val proc = new StreamingProcessor(spark, engine)
    val dir = java.nio.file.Files.createTempDirectory("graft-state2").toString
    val store = new TableStateStore(spark, s"$dir/state", buckets = 4)
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, Seq[Long], String, Long)]
    val query = proc.startBulkIngestToTable(stream, store)
    try {
      stream.addData(("low", 1L to 6L, Priority.Low, 10L)) // 2 batches
      stream.addData(("high", Seq(7L, 8L), Priority.High, 20L))
      query.processAllAvailable()
    } finally query.stop()
    var cycles = 0
    while (store.processOnce(GraftConfig.bench, SystemSleeper)) cycles += 1
    assert(cycles == 3)
    assert(store.statusOf("low").get.status == Status.Completed)
    assert(store.statusOf("high").get.status == Status.Completed)
    // completion ORDER lives in the log's seq_no trail: the HIGH batch
    // must have completed before either LOW batch despite arriving later
    val doneSeq = store.latestBatches()
      .where(col("batch_id") =!= "" && col("status") === Status.Completed)
      .select(col("ingestion_id"), col("seq_no"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val highDone = doneSeq.filter(_._1 == "high").map(_._2).min
    assert(doneSeq.filter(_._1 == "low").map(_._2).forall(_ > highDone))
  }
}

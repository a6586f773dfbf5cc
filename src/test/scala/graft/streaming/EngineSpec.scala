package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.{GraftConfig, Priority, Status}

/** Reference-parity suite (SURVEY.md §5): the test_api.js scenarios
  * against the Scala engine, with VIRTUAL time so the reference's
  * 25-second timelines run instantly and deterministically (fixing its
  * one admitted flake, README.md:125-126).
  */
class EngineSpec extends AnyFunSuite {

  private def freshEngine(): (IngestEngine, VirtualSleeper) = {
    val clock = new VirtualSleeper
    (new IngestEngine(GraftConfig.parity, clock), clock)
  }

  // ---- input validation (test_api.js:23-45) ----
  test("rejects out-of-range ids") {
    val (e, _) = freshEngine()
    assert(e.ingest(Seq(0L), Priority.Low) == Left("Invalid input"))
    assert(e.ingest(Seq(1000000008L), Priority.Low) == Left("Invalid input"))
  }

  test("rejects unknown priority") {
    val (e, _) = freshEngine()
    assert(e.ingest(Seq(1L, 2L, 3L), "VERY_HIGH") == Left("Invalid input"))
  }

  // ---- empty ids edge case (test_api.js:47-57) ----
  test("empty ids are valid; status is immediately completed with no batches") {
    val (e, _) = freshEngine()
    val Right(id) = e.ingest(Seq.empty, Priority.Low)
    val doc = e.status(id).get
    assert(doc.status == Status.Completed)
    assert(doc.batches.isEmpty)
  }

  // ---- accept + id shape (test_api.js:60-66) ----
  test("accepts a valid request and returns a uuid") {
    val (e, _) = freshEngine()
    val Right(id) = e.ingest(Seq(1L, 2L, 3L), Priority.Medium)
    assert(id.matches("[0-9a-f-]{36}"))
  }

  // ---- batch split exactness (test_api.js:68-82) ----
  test("splits [1..7] into [1,2,3],[4,5,6],[7] in order") {
    val (e, _) = freshEngine()
    val Right(id) = e.ingest(1L to 7L, Priority.High)
    val doc = e.status(id).get
    assert(doc.batches.map(_.ids) == Seq(Seq(1L, 2L, 3L), Seq(4L, 5L, 6L), Seq(7L)))
    assert(doc.batches.forall(_.status == Status.YetToStart))
  }

  // ---- 404 (test_api.js:86-89) ----
  test("unknown ingestion id yields None") {
    val (e, _) = freshEngine()
    assert(e.status("no-such-id").isEmpty)
  }

  // ---- initial status (test_api.js:91-106) ----
  test("initial status is yet_to_start for all batches") {
    val (e, _) = freshEngine()
    val Right(id) = e.ingest(1L to 5L, Priority.Medium)
    val doc = e.status(id).get
    assert(doc.status == Status.YetToStart)
    assert(doc.batches.map(_.status).forall(_ == Status.YetToStart))
  }

  // ---- rate limit: cycle = work + 5 s (test_api.js:188-214) ----
  test("strict rate limit: each batch cycle is 0.5s*|ids| + 5s") {
    val (e, clock) = freshEngine()
    val Right(_) = e.ingest(1L to 6L, Priority.High) // 2 batches of 3
    assert(clock.now() == 0L)
    assert(e.processOnce())
    assert(clock.now() == 3 * 500L + 5000L) // 6500: batch-1 work + rate gap
    assert(e.processOnce())
    assert(clock.now() == 2 * 6500L)
    assert(!e.processOnce()) // queue drained
    assert(clock.now() == 2 * 6500L) // empty cycle consumes no time
  }

  // ---- status transitions observed mid-flight (test_api.js:275-307) ----
  test("overall status is triggered while a batch is in flight, completed after") {
    val (e, clock) = freshEngine()
    val Right(id) = e.ingest(1L to 6L, Priority.High)
    val seen = scala.collection.mutable.Set.empty[String]
    clock.onAdvance { _ => e.status(id).foreach(d => seen += d.status) }
    assert(e.processOnce())
    assert(seen.contains(Status.Triggered)) // observed during batch-1 work
    val mid = e.status(id).get
    // Reference quirk (src/app.js:168-173): with [completed, yet_to_start]
    // the overall fold is yet_to_start — `triggered` only while in flight.
    assert(mid.status == Status.YetToStart)
    assert(mid.batches.map(_.status) ==
      Seq(Status.Completed, Status.YetToStart))
    assert(e.processOnce())
    assert(e.status(id).get.status == Status.Completed)
  }

  // ---- HIGH preempts queued LOW (test_api.js:216-267) ----
  test("a HIGH arrival preempts LOW batches queued behind the in-flight one") {
    val (e, clock) = freshEngine()
    val Right(low) = e.ingest(1L to 6L, Priority.Low) // L1, L2
    // HIGH arrives while L1 is mid-work (virtual T=200ms)
    var highId: Option[String] = None
    clock.onAdvance { t =>
      if (t >= 200L && highId.isEmpty)
        highId = Some(e.ingest(Seq(7L, 8L, 9L), Priority.High).toOption.get)
    }
    assert(e.processOnce()) // processes L1; HIGH lands mid-flight
    assert(highId.isDefined)
    assert(e.processOnce()) // must pick H1, not L2
    assert(e.status(highId.get).get.status == Status.Completed)
    // L2 still pending → overall folds to yet_to_start (reference quirk)
    assert(e.status(low).get.batches.map(_.status) ==
      Seq(Status.Completed, Status.YetToStart))
    assert(e.processOnce())
    assert(e.status(low).get.status == Status.Completed)
  }

  // ---- full interleave timeline (test_api.js:110-186) ----
  test("MEDIUM then HIGH interleave processes M1, H1, H2, M2 on the reference timeline") {
    val (e, clock) = freshEngine()
    val Right(med) = e.ingest(1L to 5L, Priority.Medium) // M1=[1,2,3] M2=[4,5]
    var high: Option[String] = None
    clock.onAdvance { t =>
      if (t >= 4000L && high.isEmpty)
        high = Some(e.ingest(6L to 9L, Priority.High).toOption.get)
    }
    // cycle 1: M1 (work 1.5s; HIGH arrives at T=4s during the rate gap)
    assert(e.processOnce())
    assert(clock.now() == 6500L)
    assert(high.isDefined)
    // T≈7.5s reference phase: M1 done, H queued
    assert(e.status(med).get.batches.map(_.status) ==
      Seq(Status.Completed, Status.YetToStart))
    // cycle 2+3: H1=[6,7,8], H2=[9]
    assert(e.processOnce())
    assert(clock.now() == 6500L + 6500L)
    assert(e.processOnce())
    assert(clock.now() == 13000L + 500L + 5000L) // H2: one id
    assert(e.status(high.get).get.status == Status.Completed)
    assert(e.status(med).get.batches.map(_.status) ==
      Seq(Status.Completed, Status.YetToStart))
    // cycle 4: M2=[4,5]
    assert(e.processOnce())
    assert(clock.now() == 18500L + 2 * 500L + 5000L) // T=24.5s
    assert(e.status(med).get.status == Status.Completed)
  }

  // ---- FIFO within a priority, same-millisecond arrivals ----
  test("two ingestions in the same millisecond drain fully in arrival order") {
    val (e, _) = freshEngine() // clock never advances during ingest
    val Right(a) = e.ingest(1L to 6L, Priority.Low) // A0, A1
    val Right(b) = e.ingest(Seq(7L), Priority.Low) // B0, same createdAt
    // the reference's stable sort keeps ALL of A before B; a naive
    // (createdAt, ordinal) key would interleave A0, B0, A1
    assert(e.processOnce() && e.processOnce())
    assert(e.status(a).get.status == Status.Completed)
    assert(e.status(b).get.status == Status.YetToStart)
    assert(e.drain() == 1)
    assert(e.processLog.map(_._2) == Seq(a, a, b))
  }

  // ---- FIFO within a priority ----
  test("same-priority ingestions process in arrival order") {
    val (e, clock) = freshEngine()
    val Right(a) = e.ingest(Seq(1L), Priority.Medium)
    clock.sleep(1) // strictly later createdAt
    val Right(b) = e.ingest(Seq(2L), Priority.Medium)
    assert(e.processOnce())
    assert(e.status(a).get.status == Status.Completed)
    assert(e.status(b).get.status == Status.YetToStart)
    assert(e.drain() == 1)
    assert(e.status(b).get.status == Status.Completed)
  }

  // ---- concurrent ingest vs. drain (the event-loop atomicity claim) ----
  test("concurrent ingests while draining lose no batches and keep valid transitions") {
    val e = new IngestEngine(GraftConfig.bench, SystemSleeper)
    val nThreads = 8
    val perThread = 50
    val ids = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(nThreads + 1)
    val done = new java.util.concurrent.CountDownLatch(nThreads)
    (1 to nThreads).foreach { t =>
      pool.submit(new Runnable {
        def run(): Unit = {
          (1 to perThread).foreach { i =>
            e.ingest(Seq(t * 1000L + i), Priority.values(i % 3)) match {
              case Right(id) => ids.add(id)
              case Left(err) => fail(s"unexpected reject: $err")
            }
          }
          done.countDown()
        }
      })
    }
    // drain concurrently with the ingests
    val drainer = pool.submit(new Runnable {
      def run(): Unit = { while (!done.await(0, java.util.concurrent.TimeUnit.MILLISECONDS) || e.processOnce()) () }
    })
    done.await()
    drainer.get()
    e.drain()
    pool.shutdown()
    // every ingestion completed exactly once; nothing lost or duplicated
    assert(ids.size == nThreads * perThread)
    ids.forEach { id =>
      assert(e.status(id).exists(_.status == Status.Completed))
    }
    assert(e.processLog.size == nThreads * perThread)
    assert(e.processLog.map(_._1).distinct.size == e.processLog.size)
  }

  // ---- bench mode: no simulated latency ----
  test("bench config drains without advancing the virtual clock") {
    val clock = new VirtualSleeper
    val e = new IngestEngine(GraftConfig.bench, clock)
    val Right(_) = e.ingest(1L to 30L, Priority.Low)
    assert(e.drain() == 10)
    assert(clock.now() == 0L)
  }
}

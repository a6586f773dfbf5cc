package graft.streaming

import java.util.UUID

import scala.collection.mutable

import graft.ingest.{GraftConfig, IngestOps, Priority, Status}

/** Time abstraction so parity tests run the reference's 25-second
  * timelines in virtual time (the reference's own suite flakes on real
  * sleeps — README.md:125-126; we fix that, per SURVEY.md §5).
  */
trait Sleeper {
  def sleep(ms: Long): Unit
  def now(): Long
}

object SystemSleeper extends Sleeper {
  def sleep(ms: Long): Unit = if (ms > 0) Thread.sleep(ms)
  def now(): Long = System.currentTimeMillis()
}

/** Virtual clock: sleeps advance a counter instantly. `onAdvance`
  * callbacks fire with the new time at each advance — tests use them
  * to inject ingests mid-timeline or observe in-flight status.
  */
final class VirtualSleeper(start: Long = 0L) extends Sleeper {
  @volatile private var t: Long = start
  private val callbacks = mutable.ArrayBuffer.empty[Long => Unit]
  def onAdvance(f: Long => Unit): Unit = synchronized { callbacks += f }
  def sleep(ms: Long): Unit = {
    val cbs = synchronized { t += ms; callbacks.toList }
    cbs.foreach(_(t))
  }
  def now(): Long = t
}

/** One batch's live state (the reference's `batches` map entry,
  * src/app.js:131-137). `createdAt` is the INGESTION's timestamp —
  * the queue tiebreak key (src/app.js:53, SURVEY.md §2 O1).
  */
final case class BatchState(
    batchId: String,
    ingestionId: String,
    ids: Seq[Long],
    var status: String,
    priority: String,
    createdAt: Long,
    ordinal: Int,
    /** Engine-wide arrival sequence of the OWNING INGESTION. The
      * reference's FIFO within a priority comes from a stable sort on
      * ms-resolution createdAt — two ingestions in the same ms stay in
      * arrival order there; this explicit sequence preserves that
      * without relying on clock resolution.
      */
    ingestSeq: Long = 0L)

final case class BatchDoc(batchId: String, ids: Seq[Long], status: String)
final case class StatusDoc(ingestionId: String, status: String,
    batches: Seq[BatchDoc])

/** The reference engine re-expressed (SURVEY.md §2/§3): validation F1,
  * chunking W1, priority queue O1/O3, status fold A1, processing loop
  * T1-T3 — with the three hard-coded constants injectable via
  * [[GraftConfig]] and time injectable via [[Sleeper]].
  *
  * State lives driver-side in synchronized maps: the reference gets
  * atomic interleaving free from Node's event loop (SURVEY.md §7 hard
  * part 3); `synchronized` is the explicit equivalent. The data-plane
  * bulk path (millions of requests) is the distributed
  * [[graft.ingest.IngestOps]] DataFrame pipeline; this class is the
  * control plane, deliberately tiny like its reference.
  */
final class IngestEngine(
    val cfg: GraftConfig = GraftConfig.parity,
    val sleeper: Sleeper = SystemSleeper) {

  private val ingestions = mutable.LinkedHashMap.empty[String, (String, Long)]
  // batchId -> state; insertion-ordered like the reference's Map
  private val batches = mutable.LinkedHashMap.empty[String, BatchState]
  // deterministic record of completed batch cycles, in processing
  // order — lets tests assert ordering without timing assumptions
  private val processed = mutable.ArrayBuffer.empty[(String, String)]
  private var ingestCounter = 0L
  // arrival sequence per ingestion (stable across importBatches calls)
  private val ingestionSeq = mutable.Map.empty[String, Long]

  /** F1 validation, driver-side twin of [[IngestOps.validRequest]]
    * (reference: src/app.js:110-116). Empty ids are VALID.
    */
  def isValid(ids: Seq[Long], priority: String): Boolean =
    ids != null && ids.forall(id => id >= cfg.minId && id <= cfg.maxId) &&
      Priority.values.contains(priority)

  /** POST /ingest (reference: src/app.js:106-155): validate → mint id →
    * chunk → store. Returns Left("Invalid input") on validation failure.
    */
  def ingest(ids: Seq[Long], priority: String): Either[String, String] = {
    if (!isValid(ids, priority)) Left("Invalid input")
    else {
      val ingestionId = UUID.randomUUID().toString
      val createdAt = sleeper.now()
      val chunks = IngestOps.chunkSeq(ids, cfg.batchSize)
      synchronized {
        val seq = nextSeq(ingestionId)
        ingestions(ingestionId) = (priority, createdAt)
        chunks.zipWithIndex.foreach { case (chunk, ordinal) =>
          val bid = UUID.randomUUID().toString
          batches(bid) = BatchState(bid, ingestionId, chunk,
            Status.YetToStart, priority, createdAt, ordinal, seq)
        }
      }
      Right(ingestionId)
    }
  }

  /** GET /status/:id (reference: src/app.js:158-187): per-batch docs +
    * A1 fold (`completed` vacuously for zero batches — test_api.js:47-57).
    */
  def status(ingestionId: String): Option[StatusDoc] = synchronized {
    ingestions.get(ingestionId).map { _ =>
      val bs = batches.values.filter(_.ingestionId == ingestionId).toSeq
        .sortBy(_.ordinal)
      val overall =
        if (bs.forall(_.status == Status.Completed)) Status.Completed
        else if (bs.exists(_.status == Status.Triggered)) Status.Triggered
        else Status.YetToStart
      StatusDoc(ingestionId, overall,
        bs.map(b => BatchDoc(b.batchId, b.ids, b.status)))
    }
  }

  /** O1/O3: highest-priority pending batch — weight DESC, ingestion
    * createdAt ASC, ordinal ASC (reference: src/app.js:37-42 + stable
    * sort; SURVEY.md §2 O1). Evaluated against LIVE state at each call,
    * which is what makes HIGH arrivals preempt queued LOW work between
    * batch slots (reference: test_api.js:216-267).
    */
  def pendingTop: Option[BatchState] = synchronized {
    // ingestSeq before ordinal: two same-priority ingestions created in
    // the same millisecond must drain in arrival order (the reference
    // gets this from sort stability), not interleave by batch ordinal
    batches.values.filter(_.status == Status.YetToStart).toSeq
      .sortBy(b => (-Priority.weights.getOrElse(b.priority, 1),
        b.createdAt, b.ingestSeq, b.ordinal))
      .headOption
  }

  /** Atomically claim the top pending batch: select it AND mark it
    * `triggered` under one lock, so two concurrent `processOnce` callers
    * can never pick the same batch (check-then-act would otherwise race
    * between the selection and the status write).
    */
  private def claimTop(): Option[BatchState] = synchronized {
    pendingTop.map { b => b.status = Status.Triggered; b }
  }

  /** One T1 cycle (reference: src/app.js:61-103): top-1 → `triggered` →
    * sequential 500 ms-per-id simulated external call (src/app.js:28-34,
    * results deliberately discarded like the reference's, :79-85) →
    * `completed` → 5 s rate-limit sleep AFTER the work (so cycle =
    * work + 5 s, the reference's exact timing model, src/app.js:90-95).
    * Returns true iff a batch was processed.
    */
  def processOnce(): Boolean = claimTop() match {
    case None => false
    case Some(batch) =>
      batch.ids.foreach { id =>
        sleeper.sleep(cfg.perIdDelayMs) // simulateExternalApiCall
        val _ = (id, "processed") // result shape, discarded (app.js:31)
      }
      synchronized {
        batch.status = Status.Completed
        processed += ((batch.batchId, batch.ingestionId))
      }
      sleeper.sleep(cfg.rateLimitMs)
      true
  }

  /** (batchId, ingestionId) pairs in completion order. */
  def processLog: Seq[(String, String)] = synchronized(processed.toSeq)

  /** Drain everything (test convenience; the reference loops while the
    * queue is non-empty, src/app.js:65).
    */
  def drain(maxCycles: Int = 10000): Int = {
    var n = 0
    while (n < maxCycles && processOnce()) n += 1
    n
  }

  /** Fold externally-produced batch rows (the distributed bulk-ingest
    * path) into control-plane state. Ingestions are registered
    * implicitly; zero-batch ingestions must be registered via
    * [[ingest]] (an empty chunk list produces no rows by design).
    */
  def importBatches(rows: Seq[BatchState]): Unit = synchronized {
    rows.foreach { b =>
      val seq = nextSeq(b.ingestionId)
      ingestions.getOrElseUpdate(b.ingestionId, (b.priority, b.createdAt))
      batches(b.batchId) = b.copy(ingestSeq = seq)
    }
  }

  /** Arrival-sequence number for an ingestion; first sight assigns the
    * next counter value, later batches of the same ingestion reuse it.
    */
  private def nextSeq(ingestionId: String): Long =
    ingestionSeq.getOrElseUpdate(ingestionId, {
      val s = ingestCounter; ingestCounter += 1; s
    })

  def resetState(): Unit = synchronized {
    ingestions.clear(); batches.clear(); processed.clear()
    ingestionSeq.clear(); ingestCounter = 0L
  }

  def snapshotBatches: Seq[BatchState] = synchronized {
    batches.values.toSeq
  }
}

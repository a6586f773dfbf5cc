package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Exactly-once adapter for `foreachBatch` against non-transactional
  * sinks — the batchId commit-ledger pattern.
  *
  * Structured Streaming guarantees `foreachBatch` sees each
  * `(batchId, data)` pair at-least-once, with the SAME deterministic
  * batch contents after a checkpoint recovery. Recording the highest
  * committed batchId per sink therefore upgrades at-least-once to
  * exactly-once: a redelivered batch is recognized and skipped, a new
  * batch commits its id atomically after the write succeeds.
  *
  * The ledger is a single file updated by atomic rename (crash between
  * write and commit → the batch replays, which is exactly the safe
  * direction). A production deployment pointing at a transactional
  * store would use the store's own transaction for write+commit; the
  * call shape stays identical.
  *
  * LEDGER LIFETIME = CHECKPOINT LIFETIME. Batch ids are scoped to one
  * streaming checkpoint: a query restarted against a FRESH checkpoint
  * restarts ids at 0, and a stale ledger would then silently skip
  * every batch until the old high-water mark is passed. Delete (or
  * [[reset]]) the ledger exactly when the checkpoint is deleted —
  * they are one unit of progress state.
  *
  * Usage:
  * {{{
  * val sink = new IdempotentSink("events_out", ledgerDir)
  * stream.writeStream.foreachBatch { (ds, id) =>
  *   sink.commitOnce(id) { writeSomewhere(ds) }; ()
  * }
  * }}}
  */
final class IdempotentSink(name: String, ledgerDir: String) {

  private val ledger: Path = Paths.get(ledgerDir, s"$name.ledger")

  /** Forget all commits — call iff the query's checkpoint is also
    * being discarded (see the ledger-lifetime note above).
    */
  def reset(): Unit = synchronized { Files.deleteIfExists(ledger); () }

  /** Highest committed batch id, or -1 before any commit. */
  def lastCommitted: Long =
    if (Files.exists(ledger))
      new String(Files.readAllBytes(ledger), StandardCharsets.UTF_8)
        .trim.toLong
    else -1L

  /** Run `write` iff `batchId` has not been committed yet; record the
    * commit only after the write returns. Returns true iff the write
    * ran (false = duplicate delivery, skipped).
    */
  def commitOnce(batchId: Long)(write: => Unit): Boolean = synchronized {
    if (batchId <= lastCommitted) false
    else {
      write
      Files.createDirectories(ledger.getParent)
      val tmp = ledger.resolveSibling(s"$name.ledger.tmp")
      Files.write(tmp, batchId.toString.getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, ledger, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
      true
    }
  }
}

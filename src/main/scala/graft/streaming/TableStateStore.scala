package graft.streaming

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ingest.{GraftConfig, IngestOps, Status}

/** Spark-managed batch-state store — the at-scale alternative to
  * [[IngestEngine]]'s driver-side maps.
  *
  * The driver-map store is faithful to the reference (a 243-line
  * Express app holds everything in one process) but bounds
  * control-plane throughput: every bulk-ingested batch row passes
  * through a single JVM's memory. This store keeps the SAME state
  * model fully distributed:
  *
  *  - an APPEND-ONLY state log in parquet, hash-partitioned into
  *    [[buckets]] directories by `md5(ingestion_id) % buckets` — a
  *    status point-lookup prunes to ONE partition directory however
  *    large the log grows, and the bucket count is fixed so small
  *    files do not proliferate with ingestion count;
  *  - every write (new batches from a stream epoch, status
  *    transitions from the processing loop) APPENDS rows stamped with
  *    a monotonically increasing `seq_no`; current state is resolved
  *    at read time as latest-seq_no-wins per batch_id — the classic
  *    log+merge-on-read model that needs no file rewrites on the hot
  *    path (an upsert-capable table format would fold the resolution
  *    into the commit; plain parquet keeps this dependency-free);
  *  - [[compact]] is the maintenance job: fold the log to its
  *    resolved rows and atomically swap, bounding read amplification.
  *
  * Zero-batch ingestions (valid empty `ids`) are recorded as marker
  * rows (`ordinal = -1`) so the reference's vacuous-`completed` status
  * survives the move out of the driver (test_api.js:47-57 semantics).
  *
  * Concurrency: `seq_no` comes from one [[AtomicLong]] per store
  * instance, re-seeded from `max(seq_no)` on open. The default
  * [[processOnce]] loop assumes a single writer (the streaming query +
  * its processing loop), exactly like the reference's single event
  * loop. [[processOnceMulti]] lifts that: workers arbitrate batch
  * ownership through the `_claims/` exclusive-create ledger (see
  * [[tryClaim]]), after which every status append for a batch comes
  * from one owner — the log stays single-writer per batch, which is
  * all the latest-wins resolution needs. Cross-writer `seq_no`
  * collisions can then only occur BETWEEN batches, where resolution
  * is independent.
  */
object TableStateStore {
  /** See [[TableStateStore# append]]: the local stand-in for a table
    * format's atomic-commit protocol. Keyed by table path — stores on
    * different paths have no shared committer staging and must not
    * serialize against each other.
    */
  private val AppendLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private[streaming] def appendLock(path: String): Object =
    AppendLocks.computeIfAbsent(path, _ => new Object)

  /** Result of one multi-writer cycle — `false` alone cannot tell a
    * drained queue from a head window transiently claimed by peers.
    */
  sealed trait MultiCycle
  /** This worker claimed and fully processed `batchId`. */
  final case class Processed(batchId: String) extends MultiCycle
  /** Pending work exists but every candidate in the lookahead window
    * is claimed by a peer — retry later (or report, if peers died
    * holding claims; lease expiry is the production answer).
    */
  case object Contended extends MultiCycle
  /** No pending batches at all. */
  case object Drained extends MultiCycle
}

final class TableStateStore(spark: SparkSession, path: String,
    val buckets: Int = 64) {

  private val seq = new AtomicLong(
    read().map(_.agg(max(col("seq_no"))).head).flatMap(r =>
      if (r.isNullAt(0)) None else Some(r.getLong(0))).getOrElse(0L))

  // ------------------------------------------------------------ writes
  /** Fold one micro-batch of VALIDATED requests (columns:
    * ingestion_id, ids, priority, created_at) into the log: one
    * marker row per ingestion + one row per exploded batch. Chunking
    * runs distributed ([[IngestOps.explodeBatches]]); nothing is
    * collected to the driver.
    *
    * Batch ids are DETERMINISTIC (`md5(ingestion_id-ordinal)`), not
    * minted uuids: `foreachBatch` is at-least-once, and when a crashed
    * epoch replays, re-derived rows carry the SAME keys. Together with
    * the monotone status-rank resolution (see [[latestBatches]]) the
    * duplicate append is a true no-op even when the processing loop
    * advanced a batch BETWEEN the original epoch and its replay — the
    * replayed `yet_to_start` row can never outrank a transition —
    * idempotence by construction, the same at-least-once × idempotent
    * = exactly-once argument as IdempotentSink.
    */
  def ingestRequests(requests: DataFrame,
      cfg: GraftConfig = GraftConfig.parity): Unit = {
    val s = seq.incrementAndGet()
    val markers = requests.select(
      col("ingestion_id"),
      lit("").as("batch_id"),
      array().cast("array<bigint>").as("ids"),
      lit(Status.Completed).as("status"), // vacuous unless batches exist
      col("created_at"),
      lit(-1).as("ordinal"),
      col("priority"))
    val batches = IngestOps.explodeBatches(requests, cfg)
      .withColumn("batch_id",
        md5(concat_ws("-", col("ingestion_id"), col("ordinal"))
          .cast("binary")))
      .select(col("ingestion_id"), col("batch_id"), col("ids"),
        col("status"), col("created_at"), col("ordinal"), col("priority"))
    append(markers.unionByName(batches), s)
  }

  /** Record a status transition for the given batches (the processing
    * loop's `yet_to_start → triggered → completed` writes): re-emit
    * their resolved rows with the new status and a fresh `seq_no`.
    */
  def markStatus(batchIds: Seq[String], newStatus: String): Unit = {
    val latest = latestBatches()
    if (latest.columns.nonEmpty) { // empty store → nothing to mark
      val s = seq.incrementAndGet()
      val rows = latest
        .where(col("batch_id").isin(batchIds: _*))
        .withColumn("status", lit(newStatus))
        .drop("part", "seq_no")
      append(rows, s)
    }
  }

  /** Appends serialize through [[TableStateStore.AppendLock]]: two
    * concurrent Spark append jobs share one `_temporary` committer
    * staging directory and corrupt each other's renames — the concrete
    * reason bare parquet is not a multi-writer table. A production
    * table format makes each append an atomic commit (log rename on
    * HDFS, conditional put on object stores); this JVM-wide lock is
    * that commit protocol's stand-in for local multi-threaded writers.
    * Ownership arbitration does NOT depend on it — that is
    * [[tryClaim]]'s exclusive-create ledger, which stays correct
    * across separate processes.
    */
  private def append(rows: DataFrame, seqNo: Long): Unit =
    TableStateStore.appendLock(path).synchronized {
      rows
        .withColumn("seq_no", lit(seqNo))
        .withColumn("part",
          pmod(graft.functions.CrossHash.md5Long(col("ingestion_id")),
            lit(buckets.toLong)))
        .write.partitionBy("part").mode("append").parquet(path)
    }

  // ------------------------------------------------------------- reads
  private def read(): Option[DataFrame] =
    try {
      val df = spark.read.parquet(path)
      if (df.columns.isEmpty) None else Some(df)
    } catch { case _: org.apache.spark.sql.AnalysisException => None }

  /** Status transitions are MONOTONE (`yet_to_start → triggered →
    * completed`, never backward), so the furthest-advanced status IS
    * the current state; `seq_no` only tiebreaks equal-status rows.
    * Ranking by status first makes resolution replay-proof: a crashed
    * epoch's re-appended `yet_to_start` rows (stamped with a fresh,
    * HIGHER seq_no) can never resurrect a batch the processing loop
    * already advanced.
    */
  private def statusRank: Column =
    when(col("status") === Status.Completed, 2)
      .when(col("status") === Status.Triggered, 1)
      .otherwise(0)

  /** Resolved current state per batch_id (per ingestion_id for the
    * zero-batch markers): max status rank, then latest `seq_no`.
    */
  def latestBatches(): DataFrame = read() match {
    case None =>
      spark.emptyDataFrame // no log yet; callers see zero rows
    case Some(df) =>
      val w = Window.partitionBy(col("ingestion_id"), col("batch_id"))
        .orderBy(statusRank.desc, col("seq_no").desc)
      df.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1).drop("rn")
  }

  /** Driver-side twin of `Engine.bucketCol`: which partition directory
    * holds this ingestion (same md5 the write side uses, so a status
    * read prunes to one directory).
    */
  private def bucketOf(id: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(id.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 14), 16) % buckets
  }

  /** GET /status/:id over the table: a partition-pruned point read
    * (filter on `part` reaches the parquet scan), latest-wins
    * resolution, then the reference's A1 fold. The per-ingestion row
    * set is a handful of batches, so collecting it is a point lookup,
    * not a driver-side loop.
    */
  def statusOf(ingestionId: String): Option[StatusDoc] = read().flatMap { df =>
    val w = Window.partitionBy(col("batch_id"))
      .orderBy(statusRank.desc, col("seq_no").desc)
    val rows = df
      .where(col("part") === bucketOf(ingestionId) &&
        col("ingestion_id") === ingestionId)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .orderBy(col("ordinal"))
      .select(col("batch_id"), col("ids"), col("status"))
      .collect()
    if (rows.isEmpty) None
    else {
      val docs = rows.toSeq
        .filter(_.getString(0).nonEmpty) // drop the ingestion marker
        .map(r => BatchDoc(r.getString(0), r.getSeq[Long](1), r.getString(2)))
      val overall =
        if (docs.forall(_.status == Status.Completed)) Status.Completed
        else if (docs.exists(_.status == Status.Triggered)) Status.Triggered
        else Status.YetToStart
      Some(StatusDoc(ingestionId, overall, docs))
    }
  }

  /** The live queue as a view: pending batches in O1 order (weight
    * DESC, created_at ASC, ordinal ASC). `limit(1)` on this compiles
    * to TakeOrderedAndProject — the scheduler's claim read never
    * sorts the full table.
    */
  def pendingView(): DataFrame = {
    val latest = latestBatches()
    if (latest.columns.isEmpty) latest // empty store: zero-row view
    else latest
      .where(col("batch_id") =!= "" && col("status") === Status.YetToStart)
      .orderBy(IngestOps.queueOrder(col("priority"),
        col("created_at"), col("ordinal")): _*)
  }

  /** One T1 processing cycle driven ENTIRELY off the table — the
    * at-scale twin of [[IngestEngine.processOnce]]: claim the O1-top
    * pending batch from [[pendingView]] (a TakeOrderedAndProject point
    * read), mark it `triggered`, run the simulated per-id external
    * calls, mark `completed`, then the post-work rate-limit sleep —
    * the reference's exact cycle shape with no driver map anywhere.
    * Claim atomicity rests on the store's single-writer contract (the
    * class doc); a multi-writer deployment would swap the two
    * markStatus appends for a table format's conditional commit.
    */
  def processOnce(cfg: GraftConfig, sleeper: Sleeper): Boolean = {
    val top = pendingView().limit(1).collect().headOption
    top match {
      case None => false
      case Some(r) => runBatch(r, cfg, sleeper); true
    }
  }

  private def runBatch(r: org.apache.spark.sql.Row, cfg: GraftConfig,
      sleeper: Sleeper): Unit = {
    val batchId = r.getAs[String]("batch_id")
    val ids = r.getSeq[Long](r.fieldIndex("ids"))
    markStatus(Seq(batchId), Status.Triggered)
    ids.foreach { _ =>
      sleeper.sleep(cfg.perIdDelayMs)
      touchClaim(batchId) // lease heartbeat, no-op in single-writer mode
    }
    markStatus(Seq(batchId), Status.Completed)
    sleeper.sleep(cfg.rateLimitMs)
  }

  /** Lease heartbeat: bump the claim file's mtime after every per-id
    * step so a slow-but-alive owner is never mistaken for dead (the
    * lease clock measures silence, not total batch duration). No-op
    * when no claim file exists — single-writer mode has no ledger.
    */
  private def touchClaim(batchId: String): Unit = {
    val f = java.nio.file.Paths.get(claimsDir, batchId)
    try java.nio.file.Files.setLastModifiedTime(f,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
    catch { case _: java.io.IOException => () }
  }

  // ------------------------------------------------ multi-writer mode
  /** Exclusive claim on one batch for MULTI-writer deployments. The
    * append-only state rows cannot arbitrate two workers racing for
    * the same batch (both appends land; any deterministic resolution
    * rule flips as late rows arrive), so claims go through the one
    * primitive that IS atomic on every real filesystem: exclusive
    * file creation. This is exactly the role the commit lock plays in
    * production table formats (rename-based mutual exclusion on HDFS,
    * a conditional put / lock service on object stores); the claim
    * ledger lives in a SIBLING directory (`<path>_claims`), NOT inside
    * the table path — [[compact]]'s overwrite deletes the table
    * directory wholesale, and wiping the ledger there would reopen
    * every in-flight batch to re-claiming. Claim files record the
    * owner for audit.
    *
    * LEASE EXPIRY (`leaseMs`): a claim whose mtime is older than the
    * lease belongs to a dead worker — the owner heartbeats the file
    * after every per-id step ([[touchClaim]]), so silence, not batch
    * length, is what expires it. Stealing serializes on an exclusive
    * STEAL LOCK (`<batch>.steal`, CREATE_NEW — one stealer at a time),
    * because rename alone is not enough: a stealer that observed the
    * old claim as expired could otherwise rename away the claim a
    * FASTER stealer had just re-created, and both would believe they
    * won. Under the lock the expiry re-check is race-free; the claim
    * then renames to a tombstone (audit trail of the dead owner) and
    * the fresh claim is CREATE_NEW'd — a plain (non-stealing) claimant
    * racing the rename→create gap just wins the create and the
    * stealer backs off, so there is never more than one live claim
    * per batch. A stealer that dies HOLDING the steal lock is covered
    * by the same mtime rule: the lock protects microseconds of work,
    * so a lock older than the lease is garbage and any peer deletes
    * it (idempotent) before retrying. The standard lease caveat
    * applies: an owner paused PAST the lease (GC, VM freeze) can be
    * doubled; the monotone status-rank resolution makes the duplicate
    * completion idempotent at the state level, and full fencing (a
    * token checked on every append) is what a table format's
    * conditional commit would add.
    */
  def tryClaim(batchId: String, writerId: String,
      leaseMs: Long = Long.MaxValue): Boolean = {
    val dir = java.nio.file.Paths.get(claimsDir)
    java.nio.file.Files.createDirectories(dir)
    val f = dir.resolve(batchId)
    def create(): Boolean =
      try {
        java.nio.file.Files.write(f, writerId.getBytes("UTF-8"),
          java.nio.file.StandardOpenOption.CREATE_NEW)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      }
    create() || (claimExpired(batchId, leaseMs) && {
      val lock = dir.resolve(s"$batchId.steal")
      // a crashed stealer's lock is reclaimed by age, like any lease
      try {
        if (java.nio.file.Files.exists(lock) &&
            System.currentTimeMillis() - java.nio.file.Files
              .getLastModifiedTime(lock).toMillis > leaseMs)
          java.nio.file.Files.deleteIfExists(lock)
      } catch { case _: java.io.IOException => () }
      val locked =
        try {
          java.nio.file.Files.write(lock, writerId.getBytes("UTF-8"),
            java.nio.file.StandardOpenOption.CREATE_NEW)
          true
        } catch { case _: java.io.IOException => false }
      locked && (try {
        // race-free under the lock: re-check the claim is STILL the
        // expired one (a faster stealer may have already replaced it)
        claimExpired(batchId, leaseMs) && {
          val tomb = dir.resolve(
            s".expired_${batchId}_${System.nanoTime()}")
          val stole =
            try {
              java.nio.file.Files.move(f, tomb,
                java.nio.file.StandardCopyOption.ATOMIC_MOVE)
              true
            } catch { case _: java.io.IOException => false }
          stole && create()
        }
      } finally {
        try java.nio.file.Files.deleteIfExists(lock)
        catch { case _: java.io.IOException => () }
      })
    })
  }

  /** Is this batch's claim older than the lease? False when no claim
    * exists or leases are disabled (`Long.MaxValue`, the default).
    */
  def claimExpired(batchId: String, leaseMs: Long): Boolean =
    leaseMs != Long.MaxValue && {
      val f = java.nio.file.Paths.get(claimsDir, batchId)
      try System.currentTimeMillis() -
        java.nio.file.Files.getLastModifiedTime(f).toMillis > leaseMs
      catch { case _: java.io.IOException => false }
    }

  private def claimsDir: String = path.stripPrefix("file:") + "_claims"

  /** Who holds a batch's claim, if anyone (audit read). */
  def claimOwner(batchId: String): Option[String] = {
    val f = java.nio.file.Paths.get(claimsDir, batchId)
    if (java.nio.file.Files.exists(f))
      Some(new String(java.nio.file.Files.readAllBytes(f), "UTF-8"))
    else None
  }

  /** One processing cycle under the multi-writer protocol: read the
    * top `lookahead` pending batches in O1 order and process the FIRST
    * one whose claim this worker wins — claim-skip scheduling, so
    * contending workers fan out across the queue head instead of
    * serializing on the single top batch. The three-state result
    * distinguishes a drained queue from a head window transiently
    * claimed by peers (a plain Boolean cannot, and a drain loop would
    * exit early under contention). Each batch is processed by exactly
    * one worker: the claim file is the arbiter, and status appends for
    * a claimed batch come only from its owner, so the append-only log
    * stays single-writer PER BATCH — which is all the latest-wins
    * resolution needs.
    *
    * With a finite `leaseMs` the cycle also RECOVERS crashed peers'
    * batches: (1) a pending batch whose claim expired is re-claimable
    * through [[tryClaim]]'s steal path (owner died before marking
    * `triggered`), and (2) batches stuck in `triggered` whose claim
    * expired are appended to the candidate list (owner died
    * mid-work) — re-running them is safe because the monotone
    * status-rank resolution absorbs the duplicate `triggered` append.
    * The recovery read is bounded: only the ≤lookahead stale rows are
    * collected, and each costs one claim-file stat.
    */
  def processOnceMulti(cfg: GraftConfig, sleeper: Sleeper,
      writerId: String, lookahead: Int = 4,
      leaseMs: Long = Long.MaxValue): TableStateStore.MultiCycle = {
    val pending = pendingView().limit(lookahead).collect()
    val stale: Array[org.apache.spark.sql.Row] =
      if (leaseMs == Long.MaxValue) Array.empty
      else {
        val latest = latestBatches()
        if (latest.columns.isEmpty) Array.empty
        else latest
          .where(col("batch_id") =!= "" &&
            col("status") === Status.Triggered)
          .orderBy(IngestOps.queueOrder(col("priority"),
            col("created_at"), col("ordinal")): _*)
          // collect ALL triggered rows, then filter by expiry: the
          // triggered set is bounded by in-flight work (≈ live workers
          // + orphans — control-plane-sized), and limiting BEFORE the
          // expiry filter would let ≥lookahead live high-priority
          // batches permanently shadow a lower-priority orphan
          .collect()
          .filter(r => claimExpired(r.getAs[String]("batch_id"), leaseMs))
          .take(lookahead)
      }
    val cands = pending ++ stale
    if (cands.isEmpty) TableStateStore.Drained
    else cands.find(r =>
      tryClaim(r.getAs[String]("batch_id"), writerId, leaseMs)) match {
      case None => TableStateStore.Contended
      case Some(r) =>
        runBatch(r, cfg, sleeper)
        TableStateStore.Processed(r.getAs[String]("batch_id"))
    }
  }

  // ------------------------------------------------------- maintenance
  /** Fold the log down to its resolved rows: read latest-wins state,
    * materialize it off the source files (`localCheckpoint` truncates
    * the lineage so the overwrite below never reads what it is
    * deleting), rewrite the table. On a cluster this would be a
    * reliable checkpoint / staging path + atomic rename; the model —
    * append-log reads stay cheap because a periodic job folds history
    * — is the same.
    */
  def compact(): Unit = read().foreach { _ =>
    val resolved = latestBatches().localCheckpoint(true)
    resolved.write.partitionBy("part").mode("overwrite").parquet(path)
  }
}

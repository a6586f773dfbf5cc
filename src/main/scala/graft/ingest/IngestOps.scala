package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's dataflow operators (SURVEY.md §2) as pure, codegen
  * friendly column expressions and DataFrame transforms. Nothing here
  * touches the driver: every operator distributes.
  */
object IngestOps {

  // ---------------------------------------------------------------- F1
  /** Ingest validation predicate (reference: src/app.js:110-116).
    * Accepts an empty ids array (valid per test/test_api.js:47-57).
    */
  def validIds(ids: Column, cfg: GraftConfig = GraftConfig.parity): Column =
    ids.isNotNull && forall(ids, id =>
      id.isNotNull && id >= cfg.minId && id <= cfg.maxId)

  def validPriority(priority: Column): Column =
    priority.isNotNull && priority.isin(Priority.values: _*)

  def validRequest(ids: Column, priority: Column,
      cfg: GraftConfig = GraftConfig.parity): Column =
    validIds(ids, cfg) && validPriority(priority)

  // ---------------------------------------------------------------- O1
  /** Priority weight (reference: src/app.js:10-14). Unknown → 1, as in
    * the reference's `?? 1` fallback style (only reachable pre-validation).
    */
  def priorityWeight(priority: Column): Column =
    when(priority === Priority.High, 3)
      .when(priority === Priority.Medium, 2)
      .otherwise(1)

  /** Queue ordering (reference: src/app.js:37-42): weight DESC, then
    * ingestion createdAt ASC (FIFO within a priority). The reference
    * gets intra-ingestion order from a stable sort; we add the batch
    * ordinal as an explicit third key so the order is deterministic
    * under distributed execution.
    */
  def queueOrder(priority: Column, createdAt: Column,
      ordinal: Column): Seq[Column] =
    Seq(priorityWeight(priority).desc, createdAt.asc, ordinal.asc)

  // ---------------------------------------------------------------- W1
  /** Fixed-size order-preserving chunking (reference: src/app.js:123-124
    * — `ids.slice(i, i+3)` for i = 0, 3, 6 …). Pure expression: no
    * explode/shuffle, stays inside whole-stage codegen. Empty input →
    * empty array of chunks (an ingestion with zero batches).
    */
  def chunk(ids: Column, n: Int): Column = {
    require(n > 0, s"chunk size must be positive, got $n")
    when(coalesce(size(ids), lit(0)) <= 0,
        array().cast("array<array<bigint>>"))
      .otherwise(transform(
        sequence(lit(0L), floor((size(ids) - 1) / n)),
        i => slice(ids, (i * n + 1).cast("int"), lit(n))))
  }

  /** Driver-side twin of [[chunk]] for the point-ingest API path, where
    * launching a Spark job per HTTP request would be absurd. Semantics
    * identical; property-tested against each other.
    */
  def chunkSeq(ids: Seq[Long], n: Int): Seq[Seq[Long]] = {
    require(n > 0)
    ids.grouped(n).toSeq
  }

  // ---------------------------------------------------------------- P1
  /** Batch-split projection (reference: src/app.js:122-138): one row per
    * ingestion → one row per batch, preserving order via `ordinal`.
    * Input columns: ingestion_id, ids, priority, created_at.
    * Output: batch rows ready for the state table.
    */
  def explodeBatches(requests: DataFrame,
      cfg: GraftConfig = GraftConfig.parity): DataFrame =
    requests
      .select(
        col("ingestion_id"), col("priority"), col("created_at"),
        posexplode_outer(chunk(col("ids"), cfg.batchSize))
          .as(Seq("ordinal", "batch_ids")))
      .where(col("batch_ids").isNotNull) // empty ingestion → zero batches
      .select(
        expr("uuid()").as("batch_id"),
        col("ingestion_id"),
        col("batch_ids").as("ids"),
        lit(Status.YetToStart).as("status"),
        col("created_at"),
        col("ordinal"),
        col("priority"))

  // ---------------------------------------------------------------- A1
  /** Overall-status fold (reference: src/app.js:168-173): `completed`
    * iff EVERY batch completed (vacuously true for zero batches —
    * test/test_api.js:47-57), else `triggered` if ANY batch triggered,
    * else `yet_to_start`. Count-based: one partial-aggregatable pass,
    * no UDAF, no collect.
    */
  def overallStatus(nBatches: Column, nCompleted: Column,
      nTriggered: Column): Column =
    when(coalesce(nBatches, lit(0L)) === coalesce(nCompleted, lit(0L)),
        Status.Completed)
      .when(coalesce(nTriggered, lit(0L)) > 0, Status.Triggered)
      .otherwise(Status.YetToStart)

  /** Full status derivation: ingestions × their batch statuses →
    * one row per ingestion with the folded status. Left join keeps
    * zero-batch ingestions (→ completed). `batches` needs columns
    * ingestion_id, status.
    */
  def statusOf(ingestions: DataFrame, batches: DataFrame): DataFrame = {
    val agg = batches
      .groupBy(col("ingestion_id"))
      .agg(
        count(lit(1)).as("n_batches"),
        count(when(col("status") === Status.Completed, 1)).as("n_completed"),
        count(when(col("status") === Status.Triggered, 1)).as("n_triggered"))
    ingestions
      .join(agg, Seq("ingestion_id"), "left_outer")
      .select(
        col("ingestion_id"),
        overallStatus(col("n_batches"), col("n_completed"),
          col("n_triggered")).as("status"))
  }

  // ---------------------------------------------------------------- J1
  /** Per-batch status lookup with default (reference: src/app.js:166,
    * 179 — `batches.get(id)?.status || 'yet_to_start'`). Left outer
    * join + coalesce; `statusTable` is small (live state) → broadcast.
    */
  def withBatchStatus(batchStubs: DataFrame, statusTable: DataFrame): DataFrame =
    batchStubs
      .join(broadcast(statusTable.select(col("batch_id"),
        col("status").as("live_status"))), Seq("batch_id"), "left_outer")
      .withColumn("status",
        coalesce(col("live_status"), lit(Status.YetToStart)))
      .drop("live_status")
}

package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ingest.{GraftConfig, IngestOps, IngestRequest}

/** Structured Streaming surfaces of the engine (SURVEY.md §7 Phase 2).
  *
  * Two independent streams mirror the reference's split between its
  * processing loop and its ingest path:
  *
  *  1. [[start]] — the T1 processing loop: a rate-source tick stream
  *     whose `foreachBatch` runs [[IngestEngine.processOnce]].
  *     Structured Streaming serializes micro-batches, which IS the
  *     reference's `isProcessing` latch (src/app.js:24,62-63,98);
  *     the work+5s cycle comes from the sleeps inside processOnce,
  *     exactly like the reference's post-work setTimeout
  *     (src/app.js:90-95) — NOT from the trigger interval, so parity
  *     timing survives slow batches.
  *
  *  2. [[startBulkIngest]] — the data-plane path the reference never
  *     had: a stream of IngestRequests chunked by the DISTRIBUTED W1
  *     pipeline ([[IngestOps.explodeBatches]]) and upserted into the
  *     engine state per micro-batch. At 100 TB this is the path that
  *     scales: validation + chunking run on executors; only the tiny
  *     batch-state records land in the control-plane store.
  */
final class StreamingProcessor(
    spark: SparkSession,
    val engine: IngestEngine,
    triggerMs: Long = 100L) {

  /** Start the processing-loop query. One tick row per trigger is
    * plenty — the batch content is ignored; state selection happens
    * against the live store inside processOnce (SURVEY.md §7 hard
    * part 1: never bake priority order into source offsets).
    */
  def start(): StreamingQuery =
    spark.readStream
      .format("rate")
      // rate must keep pace with the trigger: a micro-batch with no new
      // offsets skips foreachBatch entirely, so rowsPerSecond=1 would
      // gate processOnce to ~1/sec no matter how fast the trigger fires
      .option("rowsPerSecond", // ceiling: floor would undersupply when
        (1000L + triggerMs - 1) / math.max(1L, triggerMs)) // 1000 % triggerMs != 0
      .load()
      .writeStream
      .queryName("graft-processor")
      .trigger(Trigger.ProcessingTime(s"$triggerMs milliseconds"))
      .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) =>
        engine.processOnce()
        ()
      }
      .start()

  /** Streaming bulk ingest: requests arrive with pre-minted ids and
    * timestamps, are validated + chunked on executors, and the
    * resulting batch rows are folded into engine state.
    */
  def startBulkIngest(stream: MemoryStream[(String, Seq[Long], String, Long)])
      : StreamingQuery = {
    import spark.implicits._
    val cfg = engine.cfg
    stream.toDS()
      .toDF("ingestion_id", "ids", "priority", "created_at")
      .where(IngestOps.validRequest(col("ids"), col("priority"), cfg))
      .writeStream
      .queryName("graft-bulk-ingest")
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val batchRows = IngestOps.explodeBatches(df, cfg)
          .select("batch_id", "ingestion_id", "ids", "status",
            "created_at", "ordinal", "priority")
          .collect()
        engine.importBatches(batchRows.map { r =>
          BatchState(r.getString(0), r.getString(1),
            r.getSeq[Long](2), r.getString(3), r.getString(6),
            r.getLong(4), r.getInt(5))
        })
        ()
      }
      .start()
  }

  /** [[startBulkIngest]]'s at-scale twin: the same validated stream,
    * but the batch rows land in a [[TableStateStore]] instead of the
    * driver map — NOTHING is collected; validation, chunking and the
    * state write all stay on executors, so control-plane throughput
    * scales with the cluster, not one JVM's heap. Status reads become
    * partition-pruned queries over the table.
    */
  def startBulkIngestToTable(
      stream: MemoryStream[(String, Seq[Long], String, Long)],
      store: TableStateStore): StreamingQuery =
    startBulkIngestFrom(new MemorySourceAdapter(stream), store)

  /** Transport-agnostic bulk ingest: any [[SourceAdapter]] (memory,
    * spool directory, Kafka on a real cluster) lands on the SAME
    * validate → chunk → table-upsert pipeline. The transport changes;
    * the tested data plane does not — that is the point of the seam.
    */
  def startBulkIngestFrom(
      adapter: SourceAdapter,
      store: TableStateStore): StreamingQuery = {
    val cfg = engine.cfg
    adapter.requests(spark)
      .where(IngestOps.validRequest(col("ids"), col("priority"), cfg))
      .writeStream
      .queryName(s"graft-bulk-ingest-${adapter.name}")
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        store.ingestRequests(df, cfg)
        ()
      }
      .start()
  }
}

package graft.ingest

/** Domain model re-expressing the reference's data shapes
  * (reference: src/app.js:17-21, 110-146) as typed Spark rows.
  */

/** POST /ingest body (reference: src/app.js:106-116). */
final case class IngestRequest(ids: Seq[Long], priority: String)

/** One accepted ingestion (reference: src/app.js:141-146).
  * `createdAt` is epoch millis — ordering is all the reference uses it
  * for (src/app.js:41), so a Long is simpler than TimestampType.
  */
final case class Ingestion(
    ingestionId: String,
    priority: String,
    createdAt: Long)

/** One batch of ≤ batchSize ids (reference: src/app.js:131-137).
  * `ordinal` is the batch's position within its ingestion — the
  * reference relies on stable array order (src/app.js:46-57); we make
  * the ordering key explicit so it survives a shuffle.
  */
final case class Batch(
    batchId: String,
    ingestionId: String,
    ids: Seq[Long],
    status: String,
    createdAt: Long,
    ordinal: Int)

/** Priority enum and weights (reference: src/app.js:10-14). */
object Priority {
  val High = "HIGH"
  val Medium = "MEDIUM"
  val Low = "LOW"
  val weights: Map[String, Int] = Map(High -> 3, Medium -> 2, Low -> 1)
  val values: Seq[String] = Seq(High, Medium, Low)
}

/** Batch/ingestion status domain (reference: src/app.js:51, 76, 88).
  * Transitions are strictly yet_to_start → triggered → completed.
  */
object Status {
  val YetToStart = "yet_to_start"
  val Triggered = "triggered"
  val Completed = "completed"
  val values: Seq[String] = Seq(YetToStart, Triggered, Completed)
}

/** Engine configuration. The reference hard-codes all three constants
  * (batch size src/app.js:123, rate limit src/app.js:92-94, per-id
  * delay src/app.js:32); we make them injectable so parity tests can
  * run with virtual time and bench mode can run flat out.
  */
final case class GraftConfig(
    batchSize: Int = 3,
    rateLimitMs: Long = 5000L,
    perIdDelayMs: Long = 500L,
    minId: Long = 1L,
    maxId: Long = 1000000007L)

object GraftConfig {
  val parity: GraftConfig = GraftConfig()
  /** Bench mode: no simulated latency, full parallelism. */
  val bench: GraftConfig = GraftConfig(rateLimitMs = 0L, perIdDelayMs = 0L)
  /** Test mode: real semantics, compressed timers. */
  def scaled(factor: Double): GraftConfig = GraftConfig(
    rateLimitMs = (5000L * factor).toLong,
    perIdDelayMs = (500L * factor).toLong)
}

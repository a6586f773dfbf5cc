package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Streaming twin of the batch `events_session` query
  * (EventQueries.scala): per-user sessions closed by a 30-minute
  * inactivity gap, computed LIVE with Spark's native streaming
  * `session_window` aggregation — fully declarative, no custom state
  * machine. This is the canonical hard streaming aggregation: session
  * boundaries are data-dependent, so the engine must keep sessions
  * OPEN across micro-batches, MERGE provisional sessions when an
  * out-of-order (but within-watermark) event bridges the gap between
  * them, and emit a session only once the watermark passes its end
  * (last event + gap) — after which nothing can extend it. Append
  * mode therefore emits each finalized session exactly once, and the
  * emitted rows match the batch query's gaps-and-islands result over
  * the same events (StreamSessionSpec replays one timeline through
  * both paths and diffs; events later than the watermark are dropped
  * by contract and the spec pins that too).
  *
  * The money sum rides the same exact-DECIMAL cast as the batch
  * query's `dsum`, so stream and batch agree bit-for-bit, not just
  * approximately.
  *
  * Scale: state per key is the set of OPEN sessions only — bounded by
  * the watermark delay, not stream length; the shuffle is keyed by
  * (user, session candidate) exactly like the batch aggregation.
  *
  * Caller owns the watermark: `events` must already carry
  * `withWatermark("ts", ...)` — the delay is the caller's
  * lateness-vs-latency trade-off, same contract as every other
  * streaming component here.
  */
object StreamSession {

  def apply(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "30 minutes").as("win"),
        col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double")
          .as("sum_value"))
      .select(col("user_id"), col("win.start").as("session_start"),
        col("n"), col("sum_value"))
}

package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Watermarked stream-stream join — the attribution primitive: every
  * impression looks for the clicks that landed on the same user within
  * an attribution horizon, live, with neither stream ever materialized
  * whole. This is the one join family batch composition cannot
  * substitute at ingest time (both sides are unbounded), and the state
  * story is exactly what makes it survive at scale:
  *
  *  - both sides carry an event-time watermark, and the join condition
  *    carries an explicit time range (`cts ∈ [its, its + horizon]`),
  *    so Spark's symmetric hash join keeps per-side state ONLY for
  *    rows still inside `watermark + horizon` — state is bounded by
  *    delay × rate, not stream length;
  *  - the join key (`user`) shuffles both streams to the same
  *    executors — 8-byte keys, the same partitioning every micro-batch;
  *  - LEFT OUTER emits unmatched impressions (null click) only once
  *    the watermark proves no matching click can still arrive — the
  *    "impression never converted" signal falls out of state eviction,
  *    not a separate scan.
  *
  * Inputs are `(event_time, user, id)` triples; output columns are
  * `(imp_id, user, its, click_id, cts)` with null click columns for
  * unconverted impressions. A click inside two impressions' horizons
  * attributes to BOTH (plain join semantics — last-touch selection is
  * a downstream aggregation choice, not the join's).
  *
  * The spec replays one timeline through this and through the
  * equivalent batch left-outer join and asserts row-set equality once
  * the watermark has closed the window — the same stream/batch
  * diff-exact contract as [[StreamEwma]] and [[StreamGapfill]].
  */
object StreamJoin {

  /** Attribution horizon: clicks count for `horizonMin` minutes after
    * the impression; both streams tolerate `delayMin` of disorder.
    */
  def attribute(imps: Dataset[(Timestamp, Long, Long)],
      clicks: Dataset[(Timestamp, Long, Long)],
      horizonMin: Int = 30, delayMin: Int = 10): DataFrame = {
    val i = imps.toDF("its", "user", "imp_id")
      .withWatermark("its", s"$delayMin minutes")
    val c = clicks.toDF("cts", "cuser", "click_id")
      .withWatermark("cts", s"$delayMin minutes")
    i.join(c,
      expr(s"""user = cuser AND cts >= its
              |AND cts <= its + interval $horizonMin minutes""".stripMargin),
      "leftOuter")
      .select(col("imp_id"), col("user"), col("its"),
        col("click_id"), col("cts"))
  }

  /** The batch twin: the same left-outer join over bounded frames —
    * what [[attribute]] must converge to once the watermark passes
    * everything. Kept here so stream and batch can't drift apart.
    */
  def attributeBatch(imps: DataFrame, clicks: DataFrame,
      horizonMin: Int = 30): DataFrame =
    imps.toDF("its", "user", "imp_id")
      .join(clicks.toDF("cts", "cuser", "click_id"),
        expr(s"""user = cuser AND cts >= its
                |AND cts <= its + interval $horizonMin minutes""".stripMargin),
        "leftOuter")
      .select(col("imp_id"), col("user"), col("its"),
        col("click_id"), col("cts"))
}

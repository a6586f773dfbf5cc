package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-contract GATE for streams — the live twin of the batch
  * `LakehouseQueries.dqContract` publish check: every arriving event
  * row is scored against the same six contracted rules and emits its
  * verdict plus the FIRST violated rule (the audit column a
  * quarantine sink routes on), before the row can land in a published
  * table. Batch checks the table after the fact; the gate keeps the
  * table clean in the first place.
  *
  * Stateless and shuffle-free by construction — every rule is a pure
  * per-row predicate, so the plan runs in append mode with no state
  * store, no watermark, and no exchange, the same contract as
  * [[StreamContamGate]]. Rule order (and therefore the audit
  * column's tiebreak) is fixed and documented: null keys before
  * ranges before domain, most-fundamental first. The spec replays
  * the real corpus and proves the gate's per-rule violation counts
  * equal the oracle-checked batch report exactly.
  */
object StreamContractGate {

  /** (rule name, per-row violation predicate) in audit order — the
    * SAME six rules dqContract aggregates, factored per row.
    */
  private def rules: Seq[(String, Column)] = Seq(
    "user_id:not_null" -> col("user_id").isNull,
    "user_id:non_negative" -> (col("user_id") < 0),
    "event_id:not_null" -> col("event_id").isNull,
    "event_type:in_domain" -> !col("event_type").isin(
      "view", "click", "purchase", "signup", "error"),
    "value:in_range" -> (col("value") < 0 || col("value") > 1e9),
    "ts:in_range" -> (unix_timestamp(col("ts")) < 1577836800L ||
      unix_timestamp(col("ts")) >= 1925000000L))

  /** `stream` needs the events shape `(user_id, event_id, event_type,
    * value, ts)`. Output: the input row's keys plus `keep` and
    * `reject_reason` (null when the row passes; the FIRST violated
    * rule otherwise).
    */
  def apply(stream: DataFrame): DataFrame = {
    // null-safe: a null column must READ as its not_null violation,
    // not poison later predicates into null verdicts
    val firstViolation = rules.reverse.foldLeft(lit(null).cast("string")) {
      case (acc, (name, pred)) => when(coalesce(pred, lit(false)), name)
        .otherwise(acc)
    }
    stream.select(col("user_id"), col("event_id"),
      firstViolation.as("reject_reason"))
      .withColumn("keep", col("reject_reason").isNull)
  }
}

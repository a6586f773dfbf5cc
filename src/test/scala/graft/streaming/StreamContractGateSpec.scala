package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.analytics.{LakehouseQueries, QueryUtil}

final case class GateEv(user_id: Option[Long], event_id: Option[Long],
    event_type: String, value: Option[Double], ts: Timestamp)

/** The streaming contract gate must agree with the oracle-checked
  * batch report on the real corpus, fire each rule on a crafted
  * violation, resolve multi-violations in the documented audit order,
  * and hold zero state.
  */
class StreamContractGateSpec extends SparkSuite {

  test("gate passes the clean corpus exactly where the batch report does") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batch = LakehouseQueries.dqContract(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(batch.values.forall(_ == 0L), "corpus should satisfy the contract")
    val evs = QueryUtil.table(spark, sf0001, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), unix_timestamp(col("ts")).as("s"))
      .collect().map(r => GateEv(Some(r.getLong(0)), Some(r.getLong(1)),
        r.getString(2), Some(r.getDouble(3)),
        new Timestamp(r.getLong(4) * 1000L)))
    val ms = MemoryStream[GateEv]
    val q = StreamContractGate(ms.toDF())
      .writeStream.format("memory").queryName("contract_gate").start()
    try {
      ms.addData(evs.toSeq); q.processAllAvailable()
      val rows = spark.table("contract_gate").collect()
      assert(rows.length == evs.length)
      assert(rows.forall(_.getBoolean(3)),
        "a clean-corpus row was rejected; gate diverges from batch")
      assert(q.lastProgress.stateOperators.isEmpty,
        "contract gate must not hold state")
    } finally q.stop()
  }

  test("each rule fires; multi-violations resolve in audit order") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ok = new Timestamp(1700000000L * 1000)
    val ms = MemoryStream[GateEv]
    val q = StreamContractGate(ms.toDF())
      .writeStream.format("memory").queryName("contract_bad").start()
    try {
      ms.addData(
        GateEv(None, Some(1L), "view", Some(1.0), ok),
        GateEv(Some(-5L), Some(2L), "view", Some(1.0), ok),
        GateEv(Some(1L), None, "view", Some(1.0), ok),
        GateEv(Some(1L), Some(4L), "teleport", Some(1.0), ok),
        GateEv(Some(1L), Some(5L), "view", Some(-2.0), ok),
        GateEv(Some(1L), Some(6L), "view", Some(1.0),
          new Timestamp(946684800L * 1000)), // year 2000: out of range
        // violates BOTH non_negative and in_domain: the audit column
        // must carry the earlier (more fundamental) rule
        GateEv(Some(-1L), Some(7L), "teleport", Some(1.0), ok),
        GateEv(Some(1L), Some(8L), "view", Some(1.0), ok))
      q.processAllAvailable()
      val got = spark.table("contract_bad")
        .collect().map(r => Option(r.get(1)).map(_.toString).getOrElse("-")
          -> (Option(r.getString(2)), r.getBoolean(3))).toMap
      assert(got("1") == ((Some("user_id:not_null"), false)))
      assert(got("2") == ((Some("user_id:non_negative"), false)))
      assert(got("-") == ((Some("event_id:not_null"), false)))
      assert(got("4") == ((Some("event_type:in_domain"), false)))
      assert(got("5") == ((Some("value:in_range"), false)))
      assert(got("6") == ((Some("ts:in_range"), false)))
      assert(got("7") == ((Some("user_id:non_negative"), false)),
        "audit order must pick the earliest violated rule")
      assert(got("8") == ((None, true)))
    } finally q.stop()
  }
}

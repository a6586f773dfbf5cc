package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The watermarked attribution join must converge to the batch
  * left-outer join over the same timeline: matched pairs emit as both
  * sides arrive; unconverted impressions emit with a null click only
  * after the watermark proves no click can still land in their
  * horizon.
  */
class StreamJoinSpec extends SparkSuite {

  private def t(s: String): Timestamp = Timestamp.valueOf(s)

  test("stream attribution equals the batch left-outer join when closed") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Timestamp, Long, Long)]
    val clicks = MemoryStream[(Timestamp, Long, Long)]
    val q = StreamJoin.attribute(imps.toDS(), clicks.toDS())
      .writeStream.format("memory").queryName("attr")
      .outputMode("append").start()
    // user 1: imp 100 at 10:00 → clicks 500 (10:10, in) and 501
    //   (10:45, OUT of 30-min horizon);
    // user 2: imp 101 at 10:05 → click 502 at 10:20 (in);
    // user 3: imp 102 at 10:06 → never clicks (must emit null);
    // user 2: second imp 103 at 10:18 — click 502 (10:20) is inside
    //   ITS horizon too → 502 attributes to both 101 and 103
    val impRows = Seq(
      (t("2024-01-01 10:00:00"), 1L, 100L),
      (t("2024-01-01 10:05:00"), 2L, 101L),
      (t("2024-01-01 10:06:00"), 3L, 102L),
      (t("2024-01-01 10:18:00"), 2L, 103L))
    val clickRows = Seq(
      (t("2024-01-01 10:10:00"), 1L, 500L),
      (t("2024-01-01 10:45:00"), 1L, 501L),
      (t("2024-01-01 10:20:00"), 2L, 502L))
    try {
      imps.addData(impRows: _*)
      clicks.addData(clickRows: _*)
      q.processAllAvailable()
      // push both watermarks past every horizon so unmatched state
      // evicts (12:00 - 10min delay > 10:18 + 30min horizon)
      imps.addData((t("2024-01-01 12:00:00"), 99L, 999L))
      clicks.addData((t("2024-01-01 12:00:00"), 99L, 998L))
      q.processAllAvailable()
      val got = spark.table("attr")
        .where(col("user") =!= 99L) // drop the watermark beat
        .collect()
        .map(r => (r.getLong(0), r.getLong(1),
          Option(r.get(3)).map(_.asInstanceOf[Long])))
        .toSet
      val want = StreamJoin.attributeBatch(
          impRows.toDF("ts", "user", "id"),
          clickRows.toDF("ts", "user", "id"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1),
          Option(r.get(3)).map(_.asInstanceOf[Long])))
        .toSet
      assert(got == want, s"stream $got\nbatch $want")
      // the semantics the comment block promises, re-proved directly:
      assert(got.contains((100L, 1L, Some(500L)))) // in-horizon match
      assert(!got.exists(_._3.contains(501L))) // out-of-horizon click
      assert(got.contains((102L, 3L, None))) // unconverted emits null
      // one click inside two horizons attributes to both impressions
      assert(got.contains((101L, 2L, Some(502L))) &&
        got.contains((103L, 2L, Some(502L))))
    } finally q.stop()
  }

  /** The checkpoint-restart replay, shared verbatim by the default
    * (HDFS-backed in-memory) and RocksDB provider tests — only the
    * session conf differs, which is the whole point: the operator is
    * provider-agnostic. Returns the restarted query's last progress
    * string so callers can assert on provider-specific metrics.
    */
  private def checkpointRestartScenario(): String = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-attr-ckpt").toString
    val out = java.nio.file.Files
      .createTempDirectory("graft-attr-out").toString
    val imps = MemoryStream[(Timestamp, Long, Long)]
    val clicks = MemoryStream[(Timestamp, Long, Long)]
    // the memory sink refuses checkpoint recovery in append mode —
    // the file sink is the fault-tolerant surface, and its manifest
    // also proves output exactly-once across the restart
    def startQuery() = StreamJoin.attribute(imps.toDS(), clicks.toDS())
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    // buffer an impression in join state, then kill the query
    val q1 = startQuery()
    imps.addData((t("2024-01-01 10:00:00"), 1L, 100L))
    q1.processAllAvailable()
    q1.stop()
    // the click arrives only AFTER the restart: a match can only emit
    // if the buffered impression state came back from the checkpoint
    val q2 = startQuery()
    try {
      clicks.addData((t("2024-01-01 10:10:00"), 1L, 500L))
      imps.addData((t("2024-01-01 12:00:00"), 99L, 999L))
      clicks.addData((t("2024-01-01 12:00:00"), 99L, 998L))
      q2.processAllAvailable()
      val got = spark.read.parquet(out).where(col("user") === 1L)
        .collect().map(r => (r.getLong(0), Option(r.get(3))))
      assert(got.toSeq == Seq((100L, Some(500L))),
        s"state not recovered: ${got.toSeq}")
      String.valueOf(q2.lastProgress)
    } finally q2.stop()
  }

  test("attribution join state survives a checkpointed restart") {
    checkpointRestartScenario()
  }

  test("attribution restart recovery holds on the RocksDB state store") {
    // at 100 TB the state store is the scale bottleneck: RocksDB
    // keeps the buffered impression horizon off-heap + on local disk.
    // Same scenario, same operator — only the provider conf changes,
    // and the checkpoint it recovers from is RocksDB-format too
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val progress = checkpointRestartScenario()
      // the provider really was RocksDB: its custom metrics surface
      // in the restarted query's progress
      assert(progress.contains("rocksdb"), progress.take(500))
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}

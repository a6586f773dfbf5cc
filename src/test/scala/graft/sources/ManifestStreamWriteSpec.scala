package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.types._

import graft.SparkSuite

/** STREAMING_WRITE into manifest tables: `writeStream.format("graft-
  * manifest")` lands each micro-batch as one committed, snapshotted,
  * time-travelable version, exactly-once — the txn ledger rides the
  * manifest body's atomic pointer rename, survives restarts with the
  * checkpoint, and makes replayed epochs no-ops. Idle epochs mint no
  * versions; streamed commits read/prune/time-travel exactly like
  * batch ones.
  */
class ManifestStreamWriteSpec extends SparkSuite {

  private def tmp(): String =
    Files.createTempDirectory("graft-swrite").toString

  test("writeStream lands exactly-once across stop/restart from the " +
    "same checkpoint; streamed commits are versioned and readable") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = tmp()
    val cp = tmp()
    val ms = MemoryStream[(Long, String)]
    def start() = ms.toDF().toDF("id", "s")
      .writeStream.format("graft-manifest")
      .option("checkpointLocation", cp)
      .outputMode("append")
      .start(dir)

    val q1 = start()
    try {
      ms.addData((1L, "a"), (2L, "b"))
      q1.processAllAvailable()
      assert(ManifestV2Sink.readCommitted(spark, dir).orderBy("id")
        .as[(Long, String)].collect().toSeq ==
        Seq((1L, "a"), (2L, "b")))
      val v1 = ManifestV2Sink.versions(dir).max
      // second micro-batch appends exactly once
      ms.addData((3L, "c"))
      q1.processAllAvailable()
      assert(ManifestV2Sink.versions(dir).max == v1 + 1)
      // idle processing mints no versions
      q1.processAllAvailable()
      assert(ManifestV2Sink.versions(dir).max == v1 + 1)
    } finally q1.stop()

    // restart from the SAME checkpoint: ledger continuity — nothing
    // replays, new data lands once
    val q2 = start()
    try {
      ms.addData((4L, "d"))
      q2.processAllAvailable()
      val got = ManifestV2Sink.readCommitted(spark, dir).orderBy("id")
        .as[(Long, String)].collect().toSeq
      assert(got == Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")),
        s"duplicates or losses after restart: $got")
    } finally q2.stop()

    // the streamed table is a NORMAL manifest table: time travel to
    // the first streamed commit works
    val v = ManifestV2Sink.versions(dir).min
    assert(ManifestV2Sink.readVersion(spark, dir, v).count() == 2L)
    // and the txn ledger survived every commit
    assert(ManifestV2Sink.parseTxns(
      java.nio.file.Paths.get(dir, "_MANIFEST")).nonEmpty)
  }

  test("maxFilesPerTrigger paces the table-as-stream read: one " +
    "file-sized version per micro-batch, totals exact") {
    import spark.implicits._
    val dir = tmp()
    val cp = tmp()
    // three single-file commits = three versions of one file each
    (0 until 3).foreach { i =>
      Seq((i.toLong, s"v$i")).toDF("id", "s").coalesce(1)
        .write.format("graft-manifest").mode("append").save(dir)
    }
    val q = spark.readStream.format("graft-manifest")
      .option("maxFilesPerTrigger", "1").load(dir)
      .writeStream.format("memory").queryName("mft_paced")
      .option("checkpointLocation", cp)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("mft_paced").count() == 3L)
      val dataBatches = q.recentProgress.count(_.numInputRows > 0)
      assert(dataBatches == 3,
        s"want 3 paced micro-batches, got $dataBatches: " +
          q.recentProgress.map(p => p.batchId -> p.numInputRows)
            .mkString(","))
    } finally q.stop()
    // a single oversized commit still makes progress (admit-one rule)
    val dir2 = tmp()
    val cp2 = tmp()
    spark.range(0, 10).selectExpr("id", "CAST(id AS STRING) AS s")
      .repartition(4)
      .write.format("graft-manifest").mode("append").save(dir2)
    val q2 = spark.readStream.format("graft-manifest")
      .option("maxFilesPerTrigger", "1").load(dir2)
      .writeStream.format("memory").queryName("mft_big")
      .option("checkpointLocation", cp2)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      q2.processAllAvailable()
      assert(spark.table("mft_big").count() == 10L,
        "oversized single version must still be consumed whole")
    } finally q2.stop()
  }

  test("a replayed epoch is a no-op: same epoch re-commit publishes " +
    "nothing and leaves the table unchanged") {
    val dir = tmp()
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("s", StringType)))
    val w = new ManifestStreamingWrite(dir, schema, "qid-stable",
      replaceEachEpoch = false, Seq.empty, Seq.empty)
    def stage(epoch: Long, rows: Seq[(Long, String)])
        : Array[org.apache.spark.sql.connector.write.WriterCommitMessage] = {
      val dw = new ManifestWriterFactory(dir, schema, s"qid-stable-e$epoch")
        .createWriter(0, 0)
      rows.foreach { case (i, s) =>
        dw.write(org.apache.spark.sql.catalyst.InternalRow(
          i, org.apache.spark.unsafe.types.UTF8String.fromString(s)))
      }
      Array(dw.commit())
    }
    w.commit(0L, stage(0L, Seq((1L, "a"), (2L, "b"))))
    assert(ManifestV2Sink.readCommitted(spark, dir).count() == 2L)
    val vAfter = ManifestV2Sink.versions(dir).max
    assert(ManifestV2Sink.streamEpochCommitted(dir, "qid-stable") == 0L)
    // the replay: same epoch, re-staged contents → must not publish
    w.commit(0L, stage(0L, Seq((1L, "a"), (2L, "b"))))
    assert(ManifestV2Sink.versions(dir).max == vAfter,
      "replayed epoch minted a version")
    assert(ManifestV2Sink.readCommitted(spark, dir).count() == 2L,
      "replayed epoch duplicated rows")
    // staged debris of the replay was swept
    assert(!Files.exists(
      java.nio.file.Paths.get(dir, "_staged", "qid-stable-e0")))
    // the NEXT epoch commits normally and the ledger advances
    w.commit(1L, stage(1L, Seq((3L, "c"))))
    assert(ManifestV2Sink.readCommitted(spark, dir).count() == 3L)
    assert(ManifestV2Sink.streamEpochCommitted(dir, "qid-stable") == 1L)
    // ledger survives an unrelated batch commit in between — then a
    // late replay of epoch 1 still skips
    import spark.implicits._
    Seq((100L, "batch")).toDF("id", "s").coalesce(1)
      .write.format("graft-manifest").mode("append").save(dir)
    w.commit(1L, stage(1L, Seq((3L, "c"))))
    assert(ManifestV2Sink.readCommitted(spark, dir).count() == 4L,
      "late replay after an intervening commit re-applied")
  }
}

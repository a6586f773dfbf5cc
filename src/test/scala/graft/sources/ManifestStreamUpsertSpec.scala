package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSuite

/** The streaming lakehouse ingestion loop: a CDC stream applied to the
  * manifest table by `foreachBatch` + [[ManifestV2Sink.upsert]] — each
  * micro-batch lands as ONE transactional overwrite commit (the
  * Delta-streaming-MERGE shape). The invariant: after every batch the
  * table equals the hand-applied upsert fold, and the commit log grew
  * by exactly one snapshot per non-empty batch (exactly-once at the
  * table level).
  */
class ManifestStreamUpsertSpec extends SparkSuite {

  test("foreachBatch upsert stream equals the batch-applied fold") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-manifest-cdc").toString

    Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "v")
      .write.format("graft-manifest").mode("append").save(dir)
    val v0 = ManifestV2Sink.versions(dir).size

    val ms = MemoryStream[(Long, Long)]
    val q = ms.toDS().toDF("id", "v")
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          ManifestV2Sink.upsert(spark, dir, batch, "id")
        ()
      }
      .start()

    def state(): Map[Long, Long] =
      ManifestV2Sink.readCommitted(spark, dir)
        .as[(Long, Long)].collect().toMap

    try {
      ms.addData((2L, 200L), (4L, 400L)) // update 2, insert 4
      q.processAllAvailable()
      assert(state() == Map(1L -> 10L, 2L -> 200L, 3L -> 30L, 4L -> 400L))
      assert(ManifestV2Sink.versions(dir).size == v0 + 1,
        "one commit per applied micro-batch")

      ms.addData((4L, 4000L), (5L, 500L)) // update the inserted row
      q.processAllAvailable()
      assert(state() == Map(1L -> 10L, 2L -> 200L, 3L -> 30L,
        4L -> 4000L, 5L -> 500L))
      assert(ManifestV2Sink.versions(dir).size == v0 + 2)

      // pre-stream state remains exactly time-travelable
      val orig = ManifestV2Sink.readVersion(spark, dir, 1)
        .as[(Long, Long)].collect().toMap
      assert(orig == Map(1L -> 10L, 2L -> 20L, 3L -> 30L))
    } finally q.stop()
  }
}

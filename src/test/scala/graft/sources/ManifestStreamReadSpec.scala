package graft.sources

import java.nio.file.Files

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite

/** TABLE-AS-STREAM contract of the manifest sink's MICRO_BATCH_READ
  * path: each committed batch write becomes a micro-batch, offsets
  * are snapshot versions through the engine's checkpoint, restart
  * resumes with no duplicates and no gaps, and tombstones visible at
  * a batch's end snapshot reconcile that batch's arrivals.
  */
class ManifestStreamReadSpec extends SparkSuite {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def append(dir: String, rows: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    rows.toDF("id", "s").coalesce(1)
      .write.format("graft-manifest").mode("append").save(dir)
  }

  private def drain(dir: String, ckpt: String, out: String): Unit = {
    val q = spark.readStream.format("graft-manifest").load(dir)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("each committed write is one micro-batch; the first batch is " +
    "the whole current table") {
    import spark.implicits._
    val dir = tmp("graft-msr")
    append(dir, Seq((1L, "a"), (2L, "b"))) // v1
    append(dir, Seq((3L, "c")))            // v2
    val seen = mutable.ArrayBuffer.empty[Seq[Long]]
    val q = spark.readStream.format("graft-manifest").load(dir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val ids = batch.select("id").as[Long].collect().toSeq.sorted
        seen.synchronized { seen += ids }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val batches = seen.synchronized(seen.toVector).filter(_.nonEmpty)
    // AvailableNow plans start→latest in one batch: the whole table
    assert(batches.flatten.sorted == Seq(1L, 2L, 3L))
    assert(batches.flatten.size == 3, "no duplicates")
  }

  test("restart from checkpoint consumes exactly what arrived since") {
    import spark.implicits._
    val dir = tmp("graft-msr")
    val ckpt = tmp("graft-msr-ckpt")
    val out = tmp("graft-msr-out")
    append(dir, Seq((1L, "a"), (2L, "b"))) // v1
    drain(dir, ckpt, out)                  // consumes v1
    append(dir, Seq((3L, "c")))            // v2
    append(dir, Seq((4L, "d")))            // v3
    drain(dir, ckpt, out)                  // must emit ONLY 3, 4
    val ids = spark.read.parquet(out).select("id").as[Long]
      .collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L, 4L),
      "resume must produce no duplicates and no gaps")
  }

  test("tombstones at the batch's end snapshot reconcile its " +
    "arrivals; already-emitted rows are not retracted") {
    import spark.implicits._
    val dir = tmp("graft-msr")
    val ckpt = tmp("graft-msr-ckpt")
    val out = tmp("graft-msr-out")
    append(dir, Seq((1L, "a")))            // v1
    drain(dir, ckpt, out)                  // emits id=1
    append(dir, Seq((2L, "b"), (3L, "c"))) // v2
    ManifestV2Sink.delete(spark, dir, "id",
      Seq(1L, 3L).toDF("id"))              // v3: kills 1 (emitted), 3 (pending)
    drain(dir, ckpt, out)
    val ids = spark.read.parquet(out).select("id").as[Long]
      .collect().sorted.toSeq
    // 3 never emitted (tombstoned before its batch was planned);
    // 1 was already emitted — an append stream does not retract
    assert(ids == Seq(1L, 2L))
  }

  test("table-to-table mirror: streaming one manifest table into " +
    "another is exactly-once across restarts") {
    import spark.implicits._
    val src = tmp("graft-mirror-src")
    val dst = tmp("graft-mirror-dst")
    val ckpt = tmp("graft-mirror-ckpt")
    val ledger = new IdempotentSink("mirror", tmp("graft-mirror-ledger"))
    def mirrorOnce(): Unit = {
      val q = spark.readStream.format("graft-manifest").load(src)
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          ledger.commitOnce(id) {
            if (!df.isEmpty)
              df.write.format("graft-manifest").mode("append").save(dst)
          }
          ()
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    append(src, Seq((1L, "a"), (2L, "b"))) // v1
    mirrorOnce()
    append(src, Seq((3L, "c")))            // v2
    append(src, Seq((4L, "d")))            // v3
    mirrorOnce()                           // restart from checkpoint
    mirrorOnce()                           // idle restart: nothing new
    val got = ManifestV2Sink.readCommitted(spark, dst)
      .select("id").as[Long].collect().sorted.toSeq
    val want = ManifestV2Sink.readCommitted(spark, src)
      .select("id").as[Long].collect().sorted.toSeq
    assert(got == want && got == Seq(1L, 2L, 3L, 4L),
      "mirror must equal the source exactly once — no dup, no loss")
  }

  test("streamed rows round-trip the writer's encodings: nulls, " +
    "special characters, non-finite doubles, schema evolution") {
    import spark.implicits._
    val dir = tmp("graft-msr")
    Seq((1L, "tab\tand\nnewline \"quoted\" back\\slash", 1.5),
      (2L, null.asInstanceOf[String], Double.NaN),
      (3L, "inf", Double.PositiveInfinity))
      .toDF("id", "s", "d")
      .write.format("graft-manifest").mode("append").save(dir)
    // evolved generation: adds v, so pre-evolution rows stream as null
    Seq((4L, "plain", 0.25, 40L)).toDF("id", "s", "d", "v")
      .write.format("graft-manifest").mode("append").save(dir)
    val got = mutable.ArrayBuffer.empty[(Long, Option[String], Double,
      Option[Long])]
    val q = spark.readStream.format("graft-manifest").load(dir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val rows = batch.select("id", "s", "d", "v").collect().map { r =>
          (r.getLong(0), Option(r.getString(1)), r.getDouble(2),
            if (r.isNullAt(3)) None else Some(r.getLong(3)))
        }
        got.synchronized { got ++= rows }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val byId = got.synchronized(got.toVector).sortBy(_._1)
    assert(byId.map(_._1) == Vector(1L, 2L, 3L, 4L))
    assert(byId(0)._2.contains("tab\tand\nnewline \"quoted\" back\\slash"))
    assert(byId(1)._2.isEmpty && byId(1)._3.isNaN)
    assert(byId(2)._3.isPosInfinity)
    assert(byId.map(_._4) == Vector(None, None, None, Some(40L)),
      "pre-evolution rows must stream the added column as null")
  }
}

package graft.sources

import java.nio.file.Files

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite

/** MICRO_BATCH_READ on the synthetic DSv2 source: exactly-once
  * coverage under admission control, and checkpoint resume with no
  * duplicates and no gaps — the two properties that make a streaming
  * source trustworthy.
  */
class SynthStreamSpec extends SparkSuite {

  test("AvailableNow drains the interval exactly once, " +
    "rowsPerBatch bounds every micro-batch") {
    import spark.implicits._
    val seen = mutable.ArrayBuffer.empty[(Long, Seq[Long])]
    val q = spark.readStream.format("graft-synth")
      .option("rows", 3000).option("rowsPerBatch", 1000)
      .load()
      .select(col("id"), col("bucket"), col("hv"))
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val ids = batch.select("id").as[Long].collect().toSeq
        seen.synchronized { seen += ((id, ids)) }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val batches = seen.synchronized(seen.toVector)
    val nonEmpty = batches.filter(_._2.nonEmpty)
    // admission control: 3000 rows at maxRows=1000 is exactly 3 batches
    assert(nonEmpty.size == 3,
      s"expected 3 admission-capped batches, got ${nonEmpty.map(_._2.size)}")
    assert(nonEmpty.forall(_._2.size == 1000))
    val all = batches.flatMap(_._2)
    assert(all.size == 3000 && all.toSet == (0L until 3000L).toSet,
      "stream must cover the interval exactly once")
  }

  test("a filtered streaming read emits exactly the predicate's rows") {
    import spark.implicits._
    // whether or not the id-range predicate folds into the streamed
    // interval (batch scans consume it; the streaming planner may
    // keep it Spark-side), the emitted set must be exactly the
    // filtered rows, exactly once
    val seen = mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format("graft-synth")
      .option("rows", 5000).option("rowsPerBatch", 2000)
      .load()
      .where(col("id") >= 1200 && col("id") < 3300)
      .select("id")
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val ids = batch.as[Long].collect()
        seen.synchronized { seen ++= ids }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = seen.synchronized(seen.toVector)
    assert(got.size == got.distinct.size, "duplicate rows emitted")
    assert(got.toSet == (1200L until 3300L).toSet)
  }

  test("restart from checkpoint resumes at the committed offset") {
    import spark.implicits._
    val ckpt = Files.createTempDirectory("graft-synth-ckpt").toString
    val out = Files.createTempDirectory("graft-synth-out").toString

    def drain(rows: Long): Unit = {
      val q = spark.readStream.format("graft-synth")
        .option("rows", rows).option("rowsPerBatch", 1500)
        .load()
        .select("id")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    drain(2000) // first run commits offset 2000
    drain(3000) // restart: must emit ONLY [2000, 3000)

    val ids = spark.read.parquet(out).select("id").as[Long]
      .collect().sorted.toSeq
    assert(ids == (0L until 3000L),
      "resume must produce no duplicates and no gaps")
  }
}

package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The streamed per-source histogram equals the batch recompute and
  * its state stays bounded by the bucket domain, not the doc count.
  */
class StreamQuantileHistSpec extends SparkSuite {

  test("streamed histogram equals batch and state stays bucket-bounded") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // three sources, lengths crossing the 255-bucket cap, split over
    // batches so most (source, bucket) cells accumulate across triggers
    val docs = (1 to 90).map { i =>
      (s"src${i % 3}", (i * 97 % 5000).toLong)
    }
    val batches = docs.grouped(30).toSeq

    val ms = MemoryStream[(String, Long)]
    val q = StreamQuantileHist(ms.toDS().toDF("source", "n_chars"))
      .writeStream.format("memory").queryName("qhist")
      .outputMode("complete").start()
    try {
      batches.foreach { b => ms.addData(b); q.processAllAvailable() }

      val got = spark.table("qhist").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      val want = docs.toDF("source", "n_chars")
        .select(col("source"),
          least(floor(col("n_chars").cast("double") / 16).cast("long"),
            lit(255L)).as("bkt"))
        .groupBy("source", "bkt").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
        .toMap
      assert(got == want)
      assert(got.values.sum == docs.size.toLong) // every doc counted once
      // the cap bucket really collects the tail (lengths ≥ 4080)
      assert(got.keys.exists(_._2 == 255L))

      // bounded-state claim: aggregation state is (source, bucket)
      // cells — never more than 256 per source, regardless of volume
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows == got.size.toLong && stateRows <= 3L * 256L,
        s"state rows $stateRows vs cells ${got.size}")
    } finally q.stop()
  }
}

package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSuite
import graft.streaming.StreamCentroidAssign.Centroid

/** The streaming frozen-centroid scorer: exact agreement with a plain
  * Scala oracle (same integer dot, same one-step IEEE ppm floor, same
  * lower-cell tie-break), across micro-batch boundaries, with a
  * stateless plan.
  */
class StreamCentroidSpec extends SparkSuite {

  private val cents = Seq(
    Centroid(3L, Seq(5L, 0L, -2L, 1L)),
    Centroid(1L, Seq(-1L, 4L, 4L, 0L)),
    // cell 7 duplicates cell 3's direction: every vector ties between
    // them and the lower cell id (3) must win
    Centroid(7L, Seq(5L, 0L, -2L, 1L)),
    Centroid(2L, Seq(0L, -3L, 6L, 2L)))

  private def oracle(q: Seq[Long]): (Long, Long) = {
    val n2 = q.map(x => x * x).sum
    val scored = cents.map { c =>
      val tn2 = c.tq.map(x => x * x).sum
      val dot = q.zip(c.tq).map { case (a, b) => a * b }.sum
      val s = math.floor(1e6 * dot.toDouble /
        math.sqrt((n2 * tn2).toDouble)).toLong
      (c.cell, s)
    }
    scored.minBy { case (cell, s) => (-s, cell) }
  }

  test("stream assignment equals the scalar oracle across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val batches = Seq(
      Seq((10L, Seq(5L, 0L, -2L, 1L)), (11L, Seq(-1L, 4L, 4L, 0L)),
        (12L, Seq(1L, 1L, 1L, 1L))),
      Seq((13L, Seq(-5L, 0L, 2L, -1L)), (14L, Seq(0L, -3L, 6L, 2L)),
        (15L, Seq(2L, -2L, 3L, 9L))))

    val ms = MemoryStream[(Long, Seq[Long])]
    val assigned = StreamCentroidAssign(
      ms.toDS().toDF("vec_id", "q"), cents)
    val query = assigned.writeStream
      .format("memory").queryName("cent_assign")
      .outputMode("append").start()
    try {
      batches.foreach { b => ms.addData(b); query.processAllAvailable() }
      // stateless claim: append mode ran with zero state operators
      assert(query.lastProgress.stateOperators.isEmpty)

      val got = spark.table("cent_assign")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
      val want = batches.flatten.map { case (id, q) => id -> oracle(q) }.toMap
      assert(got == want, s"got $got\nwant $want")
      // the tie really happened and really resolved to the lower cell
      assert(got(10L)._1 == 3L)
      // no row was dropped or duplicated across the two micro-batches
      assert(got.size == batches.map(_.size).sum)
    } finally query.stop()
  }
}

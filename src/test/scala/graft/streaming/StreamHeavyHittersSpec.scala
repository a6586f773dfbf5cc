package graft.streaming

import scala.util.Random

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The streaming Misra–Gries summary must honor the sketch's two
  * classical guarantees against exact counts recomputed from the same
  * replayed stream — across micro-batch boundaries, which is where a
  * naive per-batch sketch (state reset each batch) would silently fail.
  */
class StreamHeavyHittersSpec extends SparkSuite {

  test("Misra-Gries summary keeps true heavy hitters within the error bound") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val buckets = 4
    val k = 8
    val rnd = new Random(41)
    // skewed stream: two heavy tokens + a long uniform noise tail,
    // interleaved and split across three micro-batches
    val heavy = Seq.fill(300)("the") ++ Seq.fill(200)("spark")
    val noise = Seq.fill(500)(s"w${rnd.nextInt(200)}")
    val all = rnd.shuffle(heavy ++ noise)
    val feeds = all.grouped((all.size + 2) / 3).toSeq

    val ms = MemoryStream[String]
    val q = StreamHeavyHitters(ms.toDS(), buckets, k)
      .writeStream.format("memory").queryName("hh")
      .outputMode("update").start()
    try {
      feeds.foreach { f => ms.addData(f: _*); q.processAllAvailable() }
      // latest summary per bucket = max-ver rows
      val raw = spark.table("hh")
      val latest = raw.join(
          raw.groupBy(col("bucket").as("b")).agg(max(col("ver")).as("mv")),
          col("bucket") === col("b") && col("ver") === col("mv"))
        .select(col("bucket"), col("token"), col("n"))
        .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2))
        .toMap
      // ≤ k counters per bucket whatever the stream length
      latest.keys.groupBy(_._1).foreach { case (_, ks) =>
        assert(ks.size <= k)
      }
      val exact = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val bucketOf = (t: String) => math.floorMod(t.hashCode, buckets)
      val bucketN = all.groupBy(bucketOf).view.mapValues(_.size.toLong).toMap
      exact.foreach { case (tok, trueN) =>
        val bound = bucketN(bucketOf(tok)) / (k + 1)
        val est = latest.getOrElse((bucketOf(tok), tok), 0L)
        // no false negatives among true heavy hitters...
        if (trueN > bound) assert(est > 0, s"$tok ($trueN > $bound) missing")
        // ...and every estimate within the MG undercount bound
        assert(est <= trueN, s"$tok overcounted: $est > $trueN")
        assert(est >= trueN - bound, s"$tok undercounted: $est < $trueN-$bound")
      }
      // the two actual heavy hitters survived with near-exact counts
      assert(latest((bucketOf("the"), "the")) >= 300 -
        bucketN(bucketOf("the")) / (k + 1))
      assert(latest((bucketOf("spark"), "spark")) >= 200 -
        bucketN(bucketOf("spark")) / (k + 1))
    } finally q.stop()
  }
}

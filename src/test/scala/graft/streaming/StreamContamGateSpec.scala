package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.analytics.PipelineQueries
import graft.functions.CrossHash

final case class GateDoc(doc_id: Long, text: String)

/** The streaming contamination gate must score a document EXACTLY as
  * the batch scan scores it at rest, stay stateless, and guard the
  * short-document edge.
  */
class StreamContamGateSpec extends SparkSuite {

  /** Eval-side gram hashes, derived the same way textContamination
    * builds its broadcast side (doc_id ≡ 0 mod 97 slice).
    */
  private def evalGrams(dir: String): Seq[Long] = {
    val toks = split(col("text"), " ")
    graft.analytics.QueryUtil.table(spark, dir, "documents")
      .where(col("doc_id") % 97 === 0 && size(toks) >= 4)
      .select(explode(transform(sequence(lit(0), size(toks) - 4),
        i => array_join(slice(toks, i + 1, lit(4)), " "))).as("gram"))
      .select(CrossHash.md5Long(col("gram")).as("gh"))
      .distinct().collect().map(_.getLong(0)).toSeq
  }

  test("gate scores streaming docs identically to the batch scan") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ev = evalGrams(sf0001)
    val docs = graft.analytics.QueryUtil.table(spark, sf0001, "documents")
      .where(col("doc_id") % 97 =!= 0)
      .select(col("doc_id"), col("text"))
      .collect().map(r => GateDoc(r.getLong(0), r.getString(1)))
    val ms = MemoryStream[GateDoc]
    val q = StreamContamGate(ms.toDF(), ev)
      .writeStream.format("memory").queryName("contam_gate").start()
    try {
      // three arrival slices: the verdict must not depend on batching
      docs.grouped(math.max(1, docs.length / 3)).foreach { slice =>
        ms.addData(slice.toSeq); q.processAllAvailable()
      }
      val got = spark.table("contam_gate")
        .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3)))
        .toMap
      assert(got.size == docs.length, "one verdict per document")
      // batch truth: textContamination reports exactly the docs with
      // shared grams, with DISTINCT shared-gram counts
      val want = PipelineQueries.textContamination(spark, sf0001)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got.filter(_._2._1 > 0).map { case (d, (n, _)) => d -> n } ==
        want, "streamed contamination scores diverge from the batch scan")
      got.foreach { case (d, (n, keep)) =>
        assert(keep == (n == 0L), s"doc $d verdict inconsistent")
      }
      // a gate must be STATELESS: nothing to checkpoint, replay, or
      // grow — the plan carries zero state operators
      assert(q.lastProgress.stateOperators.isEmpty,
        "contamination gate must not hold state")
    } finally q.stop()
  }

  test("short documents score zero grams, not phantom ones") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[GateDoc]
    val q = StreamContamGate(ms.toDF(), Seq(1L, 2L))
      .writeStream.format("memory").queryName("contam_short").start()
    try {
      ms.addData(GateDoc(1L, "a b c"), GateDoc(2L, ""),
        GateDoc(3L, "a b c d"))
      q.processAllAvailable()
      val rows = spark.table("contam_short")
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
      // < 4 tokens → no grams; exactly 4 → one gram
      assert(rows(1L) == ((0L, 0L, true)))
      assert(rows(2L) == ((0L, 0L, true)))
      assert(rows(3L) == ((1L, 0L, true)))
    } finally q.stop()
  }
}

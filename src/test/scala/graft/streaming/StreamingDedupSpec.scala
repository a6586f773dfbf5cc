package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSuite
import graft.analytics.DedupQueries

/** End-to-end streaming dedup: documents arrive as a stream; each
  * micro-batch bands ONLY the new docs, joins them against the
  * persisted banded corpus (new×all, never all×all), folds the new
  * edges in, and re-clusters with a warm start from the previous
  * fixpoint — the foreachBatch maintenance loop the propagateLabels
  * scaladoc describes, here driven through a real streaming query.
  * The invariant: after every batch, the incrementally maintained
  * labels equal a from-scratch batch clustering of everything seen.
  */
class StreamingDedupSpec extends SparkSuite {

  test("streaming doc ingestion maintains clusters equal to batch recompute") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // duplicates deliberately SPAN batch boundaries: doc 5 repeats doc
    // 1's text, doc 9 repeats it again (one growing cluster); doc 6
    // repeats doc 2; the rest are distinct
    def text(i: Long) =
      s"document number $i with some shared filler tokens about spark " +
        s"engines and data pipelines plus unique salt ${i * 7919}"
    val dup = text(1)
    val dup2 = text(2)
    val batches = Seq(
      Seq((1L, dup), (2L, dup2), (3L, text(3))),
      Seq((5L, dup), (6L, dup2), (7L, text(7))),
      Seq((9L, dup), (10L, text(10))))

    var bandedCorpus: DataFrame = null
    var edges: DataFrame = null
    var labels: DataFrame = null
    val ms = MemoryStream[(Long, String)]
    val q = ms.toDS().toDF("doc_id", "text")
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val newBanded = DedupQueries.simhashBanded(batch)
          .localCheckpoint(true)
        bandedCorpus =
          (if (bandedCorpus == null) newBanded
           else bandedCorpus.union(newBanded)).localCheckpoint(true)
        // new×all candidate join on the band key (both directions of
        // each pair covered because the new side is IN the corpus)
        val cand = newBanded.as("a")
          .join(bandedCorpus.as("b"),
            col("a.band") === col("b.band") &&
              col("a.key") === col("b.key") &&
              col("a.doc_id") =!= col("b.doc_id"))
          .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
            greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"),
            DedupQueries.simhashHamming("a", "b").as("hamming"))
          .distinct()
          .where(col("hamming") <= 3)
          .select(col("doc_a"), col("doc_b"))
        val newEdges = cand.union(cand.select(col("doc_b"), col("doc_a")))
          .toDF("src", "dst")
        edges = (if (edges == null) newEdges else edges.union(newEdges))
          .distinct().localCheckpoint(true)
        val seed =
          if (labels == null) DedupQueries.identityLabels(edges)
          else DedupQueries.warmStart(edges, labels)
        labels = DedupQueries.propagateLabels(edges, seed)
          .localCheckpoint(true)
        ()
      }
      .start()
    try {
      var seen = Seq.empty[(Long, String)]
      batches.foreach { b =>
        seen ++= b
        ms.addData(b: _*)
        q.processAllAvailable()
        // invariant after EVERY batch: incremental == from-scratch
        val corpus = seen.toDF("doc_id", "text")
        val batchPairs = DedupQueries.simhashPairsFrame(corpus)
          .select(col("doc_a"), col("doc_b"))
        val batchEdges = batchPairs
          .union(batchPairs.select(col("doc_b"), col("doc_a")))
          .toDF("src", "dst")
        val fromScratch = DedupQueries
          .propagateLabels(batchEdges, DedupQueries.identityLabels(batchEdges))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val incremental =
          labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(incremental == fromScratch)
        spark.catalog.clearCache() // simhashPairsFrame caches its banding
      }
      // the duplicate chains actually merged across batches
      val byDoc = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(byDoc(1L) == byDoc(5L) && byDoc(5L) == byDoc(9L))
      assert(byDoc(2L) == byDoc(6L))
      assert(byDoc(1L) != byDoc(2L)) // distinct texts stay apart
    } finally q.stop()
  }
}

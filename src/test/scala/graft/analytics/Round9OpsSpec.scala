package graft.analytics

import graft.SparkSuite

/** Round-9 operator pins (cross-engine equality lives in the DuckDB
  * oracle gate; these pin the semantic claims the oracle can't see).
  */
class Round9OpsSpec extends SparkSuite {

  test("graph-ANN beam search fills its beam and clears a recall floor") {
    val rows = EmbeddingQueries.knnGraphSearch(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(rows.nonEmpty, "no held-out queries — vacuous")
    // the beam always fills: GsBeam candidates exist within 3 hops of
    // the seeds on any connected-enough K-NN graph of this corpus
    assert(rows.forall(_._2 == EmbeddingQueries.NndK.toLong),
      s"unfilled beams: ${rows.filter(_._2 != EmbeddingQueries.NndK.toLong)}")
    // every query finds at least one TRUE neighbor — the walk is a
    // search, not a random sample (random would find K/n ≈ 1.6% here)
    assert(rows.forall(_._3 >= 1L), s"zero-hit queries: ${rows.filter(_._3 == 0L)}")
    // mean recall floor: well above random, in line with the graph's
    // own recall (knn_graph_nnd) on this unstructured corpus
    val meanRecall = rows.map(_._4).sum / rows.length
    assert(meanRecall >= 200000L, s"mean recall_ppm $meanRecall < 0.2")
  }
}

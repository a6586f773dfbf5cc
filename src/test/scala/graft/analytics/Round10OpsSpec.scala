package graft.analytics

import graft.SparkSuite

/** Round-10 operator pins (cross-engine equality lives in the DuckDB
  * oracle gate; these pin the semantic claims the oracle can't see).
  */
class Round10OpsSpec extends SparkSuite {

  test("graph-delta insert fills K, clears a recall floor vs the rebuild") {
    val rows = EmbeddingQueries.knnGraphDelta(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty, "no delta vectors — vacuous")
    // every delta's neighbor list fills to K (seeds + 3 hops reach
    // enough of the base graph; refine adds the delta-delta tail)
    assert(rows.forall(_._2 == EmbeddingQueries.NndK.toLong),
      s"unfilled: ${rows.filter(_._2 != EmbeddingQueries.NndK.toLong).toSeq}")
    // the refine wavefront is non-trivial somewhere: deltas that share
    // an inserted base neighbor exist on this corpus
    assert(rows.map(_._3).sum > 0, "refine stage never fired — vacuous")
    // nightly maintenance must approximate the full rebuild: mean
    // recall vs the persisted graph's own delta rows clears a floor
    // comfortably above random (K/n ≈ 1.6%)
    val meanVsRebuild = rows.map(_._5).sum / rows.length
    assert(meanVsRebuild >= 150000L,
      s"mean recall_rebuild_ppm $meanVsRebuild < 0.15")
  }

  test("graph-delta maintenance path never sort-merge-joins") {
    // the insert walk is broadcast-candidate probes of the base graph
    // and corpus — the knnGraphSearch plan discipline; an SMJ would
    // mean a corpus-keyed shuffle crept into the per-delta path
    val plan = EmbeddingQueries.knnGraphDelta(spark, sf0001)
      .queryExecution.sparkPlan.toString
    assert(!plan.contains("SortMergeJoin"), "graph-delta shuffles its corpus")
  }
}

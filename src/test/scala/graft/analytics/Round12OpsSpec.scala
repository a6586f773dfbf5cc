package graft.analytics

import graft.SparkSuite

/** Round-12 operator pins (cross-engine equality lives in the DuckDB
  * oracle gate; these pin the semantic claims the oracle can't see).
  */
class Round12OpsSpec extends SparkSuite {

  test("filtered ANN search clears a recall floor vs the filtered " +
    "brute floor, and the beam widening carries it") {
    val rows = EmbeddingQueries.knnFilteredSearch(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(rows.nonEmpty, "no filtered queries — vacuous")
    val k = EmbeddingQueries.NndK.toLong
    // sanity of the report shape: found ≤ K, matched ≤ found
    assert(rows.forall(t => t._2 >= 1L && t._2 <= k), s"n_found out of [1,K]")
    assert(rows.forall(t => t._3 <= t._2), "matched exceeds found")
    // mean recall vs the EXACT filtered brute force clears a floor
    // far above random (K over a ~10%-selectivity corpus slice);
    // measured 0.52 at sf0.001 — 0.3 is the conservative floor
    val meanRecall = rows.map(_._4).sum / rows.length
    assert(meanRecall >= 300000L, s"mean recall_ppm $meanRecall < 0.3")
    // the WIDENED walk must find at least as many true filtered
    // neighbors as the naive unwidened post-filter — the widening is
    // the fix for high-selectivity post-filtering, not decoration
    val naive = EmbeddingQueries.filteredSearchFrame(spark, sf0001, 1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val wide = rows.map(t => t._1 -> t._3).toMap
    assert(wide.values.sum >= naive.values.sum,
      s"widened walk matched ${wide.values.sum} < naive ${naive.values.sum}")
    spark.catalog.clearCache()
  }
}

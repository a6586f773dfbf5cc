package graft.analytics

import org.apache.spark.sql.DataFrame

import graft.SparkSuite

/** The persisted near-dup artifact must be indistinguishable from the
  * live derivations it replaces: pairs ≡ simhashPairsFrame, labels ≡
  * cold star clustering, and the warm-only incremental fold over the
  * persisted base fixpoint ≡ the cold full recompute. These are the
  * same claims the DuckDB oracle gate re-proves at sf0.01; here they
  * are pinned engine-side at sf0.001 so a sink or artifact regression
  * fails fast in `sbt test`.
  */
class NearDupArtifactSpec extends SparkSuite {

  private def assertSame(a: DataFrame, b: DataFrame): Unit = {
    assert(a.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      b.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("artifact pairs round-trip equals the live pair derivation") {
    val live = DedupQueries.dedupSimhashPairs(spark, sf0001)
    val art = NearDupArtifact.pairs(spark, sf0001)
    assert(art.count() > 0, "fixture has no near-dup pairs — vacuous")
    assertSame(art, live)
  }

  test("artifact labels equal cold star-contraction clustering") {
    assertSame(NearDupArtifact.labels(spark, sf0001),
      DedupQueries.dedupClustersStar(spark, sf0001))
  }

  test("warm-only incremental fold equals cold full recompute") {
    assertSame(DedupQueries.dedupClustersIncremental(spark, sf0001),
      DedupQueries.dedupClusters(spark, sf0001))
  }

  test("persisted build job round-trips and equals cold clustering") {
    assertSame(DedupQueries.dedupClustersPersisted(spark, sf0001),
      DedupQueries.dedupClusters(spark, sf0001))
  }
}

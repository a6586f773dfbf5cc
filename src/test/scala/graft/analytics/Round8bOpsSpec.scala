package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Round-8 continuation operators. */
class Round8bOpsSpec extends SparkSuite {

  test("pipeline_dedup_weight: cluster loss mass sums to one, " +
    "singletons keep full weight") {
    val w = PipelineQueries.pipelineDedupWeight(spark, sf0001)
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
        col("weight_ppm"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val nDocs = QueryUtil.table(spark, sf0001, "documents").count()
    assert(w.length == nDocs, "every document gets a weight row")
    assert(w.map(_._1).distinct.length == w.length, "one row per doc")

    val byCluster = w.groupBy(_._2)
    byCluster.foreach { case (c, members) =>
      val sz = members.head._3
      assert(members.forall(_._3 == sz), s"cluster $c size disagreement")
      assert(sz == members.length, s"cluster $c size != member count")
      assert(members.forall(_._4 == 1000000L / sz),
        s"cluster $c weight != 1e6 div size")
      // Σ weight over the cluster ≈ 1 unit of loss mass (exact up to
      // the integer floor: shortfall < cluster_size ppm)
      val total = members.map(_._4).sum
      assert(total <= 1000000L && total > 1000000L - sz,
        s"cluster $c mass $total out of bound")
    }
    // non-vacuity both ways: real multi-doc clusters AND singletons
    assert(byCluster.exists(_._2.length > 1), "no multi-doc cluster")
    val singles = byCluster.filter(_._2.length == 1)
    assert(singles.nonEmpty, "no singleton cluster")
    assert(singles.forall(_._2.head._4 == 1000000L),
      "singleton must keep full weight")
    spark.catalog.clearCache()
  }

  test("knn_graph_nnd: NN-Descent strictly improves the warm init, " +
    "graph invariants hold") {
    import org.apache.spark.sql.functions.{col, sum}
    val g0 = EmbeddingQueries.nndGraph(spark, sf0001, 0)
    val g = EmbeddingQueries.nndGraph(spark, sf0001,
      EmbeddingQueries.NndRounds)
    val rows = g.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2)))
    val n = QueryUtil.table(spark, sf0001, "embeddings").count()
    // invariants: exactly K directed edges per vertex, no self-loops,
    // no duplicate edges
    assert(rows.length == n * EmbeddingQueries.NndK)
    assert(rows.forall { case (v, u, _) => v != u })
    assert(rows.map(t => (t._1, t._2)).distinct.length == rows.length)
    // the local join must strictly shrink the total graph distance
    // (exact integers — no tolerance needed)
    def total(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum(col("d"))).head.getLong(0)
    assert(total(g) < total(g0),
      "NN-Descent failed to improve over the ring init")
    // and the reported recall must reflect it
    val rep = EmbeddingQueries.knnGraphNnd(spark, sf0001)
      .agg(sum(col("n_matched")), sum(col("n_matched_init")))
      .head
    assert(rep.getLong(0) > rep.getLong(1),
      "final recall must beat init recall")
    spark.catalog.clearCache()
  }
}

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
}

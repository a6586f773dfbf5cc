package graft.analytics

import graft.{SparkEntry, SparkSuite}

/** Plan-quality regression gate: the properties the manual
  * `graft.Explain` audits have been checking each round, pinned as
  * tests so a regression fails CI instead of waiting for a human to
  * re-read plans. All assertions are on the pre-AQE physical plan of
  * each registered query at sf0.001 (planning only — no execution,
  * except queries whose construction itself runs jobs, e.g. the
  * iterative clustering ones).
  */
class PlanAuditSpec extends SparkSuite {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf0001).queryExecution.sparkPlan.toString

  test("no query plans a CartesianProduct") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted.filter { n =>
      plan(n).contains("CartesianProduct")
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }

  test("selective scans reach the parquet reader as pushed filters") {
    // q6: the date/discount/quantity conjunction must be pushed
    val q6 = plan("sql_revenue_q6")
    assert(q6.contains("PushedFilters: [IsNotNull"), q6.take(800))
    // point lookup: the IN-list itself reaches the scan
    val pt = plan("ingest_point_lookup")
    assert(pt.contains("In(o_orderkey"), pt.take(800))
  }

  test("top-k compiles to TakeOrderedAndProject, not a global sort") {
    assert(plan("text_heavy_hitters").contains("TakeOrderedAndProject"))
    assert(plan("graph_pagerank").contains("TakeOrderedAndProject"))
  }

  test("projection pruning reaches the scan") {
    // layout_zorder touches only o_custkey + o_orderdate of orders
    val z = plan("layout_zorder")
    val read = z.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("o_custkey") && read.contains("o_orderdate") &&
      !read.contains("o_totalprice"), read)
  }

  private def optimized(name: String): String =
    SparkEntry.queries(name)(spark, sf0001)
      .queryExecution.optimizedPlan.toString

  test("bounded dimensions stay hinted; unbounded sides stay unhinted") {
    // TPC-H q3: nation/customer-sized dims are pinned broadcast (and
    // the physical plan honors it at any SF)
    assert(optimized("q3_shipping_priority").contains("strategy=broadcast"))
    assert(plan("q3_shipping_priority").contains("BroadcastHashJoin"))
    // these queries had data-growing broadcast hints removed in past
    // rounds (q17 per-part thresholds + brand slice, pipeline_filter
    // dup-id set, text_cooccurrence vocab marginals) — a reintroduced
    // hint is a scale regression the oracle cannot see, so pin the
    // ABSENCE of hints in the optimized plan (AQE stays free to choose
    // broadcast at runtime when a side measures small)
    for (q <- Seq("q17_smallqty_revenue", "pipeline_filter")) {
      val p = optimized(q)
      assert(!p.contains("strategy=broadcast"),
        s"$q carries a forced broadcast hint")
    }
    // text_cooccurrence keeps exactly ONE hint — the 1-row corpus
    // total; its vocabulary-sized marginals must stay unhinted
    assert("strategy=broadcast".r
      .findAllIn(optimized("text_cooccurrence")).size == 1)
  }
}

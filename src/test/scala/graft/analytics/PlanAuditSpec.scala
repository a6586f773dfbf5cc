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

  test("DSv2 aggregate pushdown erases the aggregate from the plan") {
    // SyntheticV2Source claim: COUNT/MIN(id)/MAX(id) answer in closed
    // form — complete pushdown means the plan carries the pushed
    // marker and NO aggregate exec at all (a partial pushdown or a
    // silent fallback would leave a HashAggregate pair behind)
    for (q <- Seq("source_dsv2_agg_pushdown", "source_dsv2_agg_groupby")) {
      val p = plan(q)
      assert(p.contains("graft_synth"), s"$q: ${p.take(400)}")
      assert(!p.contains("HashAggregate") && !p.contains("SortAggregate"),
        s"$q kept an aggregate exec: ${p.take(400)}")
    }
    // the unpushable siblings must KEEP their aggregate — if SUM ever
    // classified as pushable the closed form would silently lie
    assert(plan("source_dsv2").contains("HashAggregate"))
    // the executed scan must be the closed-form aggregate scan, not a
    // row scan whose aggregate Spark later re-planned
    val cls = SparkEntry.queries("source_dsv2_agg_pushdown")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(cls.contains("SynthAggScan") ||
      SparkEntry.queries("source_dsv2_agg_pushdown")(spark, sf0001)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        .contains("SynthAggScan"))
  }

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

  test("manifest-table SQL scans push filters and prune columns") {
    // a catalog-table read must show the pushed predicate and a
    // pruned ReadSchema in the scan (the parquet payload decodes only
    // requested columns; ManifestSkipping prunes whole files) — the
    // planning-time contract sink_manifest_typed's in-band
    // files_read/files_total gate end-to-end
    val t = s"audit_${java.util.UUID.randomUUID().toString.take(8)}"
    try {
      spark.sql(s"CREATE TABLE graft.$t (k BIGINT, v STRING, w DOUBLE)")
      spark.sql(s"INSERT INTO graft.$t VALUES (1, 'a', 0.5)")
      val p = spark.sql(s"SELECT v FROM graft.$t WHERE k = 1")
        .queryExecution.executedPlan.toString()
      assert(p.contains("PushedFilters: [") && p.contains("EqualTo(k,1)"),
        p.take(800))
      assert(p.contains("ReadSchema: struct<") && !p.contains("w:double"),
        p.take(800))
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  test("ORC read-back pushes its predicate down to the ORC reader") {
    // sourceOrcRoundtrip's read side (factored pre-checkpoint): the
    // price filter must reach the ORC scan, not sit only in a
    // post-scan Filter
    val dir = java.nio.file.Files.createTempDirectory("graft-orc-pin")
    val sub = dir.resolve("t").toString
    try {
      QueryUtil.table(spark, sf0001, "orders")
        .select(org.apache.spark.sql.functions.col("o_orderkey"),
          org.apache.spark.sql.functions.col("o_orderstatus"),
          org.apache.spark.sql.functions.col("o_totalprice"),
          org.apache.spark.sql.functions.col("o_orderdate"))
        .write.orc(sub)
      val p = ScalarBreadthQueries.orcAggRead(spark, sub)
        .queryExecution.sparkPlan.toString
      assert(p.contains("GreaterThan(o_totalprice,150000.0)"),
        p.take(1200))
      assert(p.contains("PushedFilters"), p.take(1200))
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("top-k compiles to TakeOrderedAndProject, not a global sort") {
    assert(plan("text_heavy_hitters").contains("TakeOrderedAndProject"))
    assert(plan("graph_pagerank").contains("TakeOrderedAndProject"))
    // text_bm25's top-100 and events_top_paths' top-10 make the same
    // "per-partition heaps, no global sort" claim
    assert(plan("text_bm25").contains("TakeOrderedAndProject"))
    assert(plan("events_top_paths").contains("TakeOrderedAndProject"))
    // text_vocab_coverage: the top-K vocabulary cut is a heap, and
    // the membership join is against the K-row broadcast
    val vc = plan("text_vocab_coverage")
    assert(vc.contains("TakeOrderedAndProject"), vc.take(400))
    assert(!vc.contains("SortMergeJoin"), vc.take(400))
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

  private def formatted(name: String): String =
    SparkEntry.queries(name)(spark, sf0001).queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)

  // ----- round-6 audit: every "bounded/capped" comment claim in
  // src/main that a plan can witness, pinned here so prose and plan
  // can't drift apart again (the round-5 inverted-index finding was
  // exactly such a drift)

  test("inverted index aggregates through the k-capped BottomKAgg") {
    // TextQueries claim: "reducer-side state per token really is
    // bounded and the partial buffers merge map-side". Witness: the
    // typed aggregator appears as a partial + final pair, and
    // collect_list (the round-5 unbounded-buffer finding) is gone
    val inv = plan("text_inverted_index").toLowerCase
    assert(inv.contains("partial_bottomkagg"), inv.take(600))
    assert(inv.contains("bottomkagg(doc_id") ||
      inv.split("bottomkagg").length > 2, inv.take(600))
    assert(!inv.contains("collect_list"))
  }

  test("capped reports compile to TakeOrderedAndProject") {
    // PipelineQueries claim: dedup_chunk's "report is capped at the
    // top 1000 duplicated chunks" — the cap must be O(k)-per-partition
    // top-k, not a global sort feeding a limit
    val p = formatted("dedup_chunk")
    assert(p.contains("TakeOrderedAndProject"), p.take(400))
    assert(!p.contains("SinglePartition"), p.take(400))
  }

  test("textrank's report tail is a top-k, not a global vocab window") {
    // TextQueries claim: the final ranking top-k's the vocabulary
    // frame (TakeOrderedAndProject) before any global window forms —
    // the r11 verdict flagged the previous global row_number as the
    // query's only single-partition stage at web-corpus vocab sizes.
    // The ordinal window that remains runs over the ≤TextrankTopK
    // survivors of the TakeOrderedAndProject, never the full vocab.
    val p = formatted("text_textrank")
    assert(p.contains("TakeOrderedAndProject"), p.take(600))
  }

  test("weighted sampling windows by source, never a global partition") {
    // pipelineSampleWeighted claim: "the window never forms a global
    // single partition — each source's line scans independently"; a
    // SinglePartition exchange here would be the classic global-cumsum
    // scale killer
    val p = formatted("pipeline_sample_weighted")
    assert(!p.contains("SinglePartition"), p.take(600))
  }

  test("replica diff drills through broadcast bucket pruning") {
    // lakeReplicaDiff claim: digests partial-aggregate to 64 rows and
    // the row-level drill joins only diverging buckets through a
    // broadcast semi-join — the full-table rows must never meet in a
    // sort-merge pruning join (the bucket list is metadata-sized)
    val p = formatted("lake_replica_diff")
    assert(p.contains("BroadcastHashJoin") &&
      p.contains("LeftSemi"), p.take(800))
    assert(p.contains("partial_bit_xor") || p.contains("bit_xor"),
      "digest must partial-aggregate: " + p.take(600))
  }

  test("two-phase scan keeps exactly one single-partition exchange") {
    // scanPos claim: "phase 2 computes per-bucket offsets on a
    // (…×256)-row frame — bounded regardless of corpus size"; the ONE
    // SinglePartition exchange is that metadata frame's offset window.
    // A second one would mean a global sort crept onto the fact table.
    // (formatted plan: exchanges are only inserted by EnsureRequirements,
    // after `sparkPlan`)
    val p = formatted("pipeline_pack")
    assert("SinglePartition".r.findAllIn(p).size == 1, p.take(600))
  }

  test("ANN assignment joins stay broadcast, never corpus-shuffled") {
    // EmbeddingQueries claim: "O(n·k) assignment against a
    // ≤CentKMax-row broadcast … nothing grows with n". Witness: no
    // sort-merge join anywhere in the search plans — every join is
    // against a broadcast (centroids, codebooks, query sets)
    for (q <- Seq("knn_ivf", "knn_ivf_trained",
        "knn_pq_adc", "knn_sq8", "knn_binary", "emb_kmeans_train",
        "knn_graph_search")) {
      assert(!plan(q).contains("SortMergeJoin"), s"$q shuffles its corpus")
    }
    // knn_brute_force is now the ground-truth BUILD job (its query
    // plan is the artifact read-back) — audit the build frame itself
    assert(!EmbeddingQueries.bruteForceFrame(spark, sf0001)
      .queryExecution.sparkPlan.toString.contains("SortMergeJoin"),
      "knn_brute_force build shuffles its corpus")
    // the IVF×PQ chains join two corpus-scaled frames (candidates ×
    // code table) — un-broadcastable by nature, so an SMJ is the
    // RIGHT plan there, but only on the narrow 8-byte vec_id key
    // (both sides arrive hash-partitioned by vec_id from their
    // aggregations, so the exchange is reused); an SMJ on any other
    // key would mean a vector-payload or per-code shuffle crept in
    for (q <- Seq("knn_ivfpq", "knn_ivf_residual")) {
      val smjKeys = "SortMergeJoin \\[(\\w+)".r
        .findAllMatchIn(plan(q)).map(_.group(1)).toSet
      assert(smjKeys.subsetOf(Set("vec_id")),
        s"$q sort-merge-joins on ${smjKeys.mkString(",")}")
    }
  }

  test("IVF cell assignment partial-aggregates before its exchange") {
    // EmbeddingQueries claim: argmaxCell "collapses the k candidate
    // rows of a vector map-side … the shuffle moves |corpus| rows, not
    // |corpus|·k through a sort". Witness: the per-vector argmax plans
    // as a partial_max_by aggregate (map-side combine), and no window
    // function partitions the full corpus-by-centroid frame anymore —
    // remaining windows are the query-side probe (10·k rows) and the
    // final per-query top-k, both corpus-independent
    for (q <- Seq("knn_ivf", "knn_ivf_trained", "knn_ivf_stats",
        "knn_ivf_delta", "emb_kmeans_train")) {
      val p = plan(q).toLowerCase
      assert(p.contains("partial_max_by"), s"$q lost its map-side argmax")
    }
    // knn_ivf_trained_heldout is now a publishing build job — the
    // witness lives in its build frame, not the artifact read-back
    val heldoutBuild = EmbeddingQueries
      .ivfTrainedHeldoutFrame(spark, sf0001)
      .queryExecution.sparkPlan.toString.toLowerCase
    assert(heldoutBuild.contains("partial_max_by"),
      "knn_ivf_trained_heldout build lost its map-side argmax")
  }

  test("Gramian pair expansion collapses map-side before its exchange") {
    // EmbeddingQueries claim: covUpper's d²/2-per-row pair expansion
    // "partial aggregation collapses every partition to ≤ d(d+1)/2 =
    // 2080 rows before the one shuffle — the reduce side sees 2080
    // keys total regardless of corpus size". Witness: the sums plan
    // as a partial + final HashAggregate pair on the (i, j) keys, so
    // what crosses the exchange between them is the 2080-key partial
    // state, not the inflated row stream (sparkPlan is pre-
    // EnsureRequirements, so the exchange node itself is not visible
    // here — the partial/final split is the load-bearing witness)
    val p = plan("emb_covariance").toLowerCase
    assert(p.contains("partial_sum"), p.take(600))
    assert("(?s)hashaggregate.*hashaggregate".r
      .findFirstIn(p).nonEmpty, p.take(600))
  }

  test("multimodal content bytes never enter an exchange") {
    // MultimodalOps claim: "never shuffles content". Witness: in the
    // formatted plan every Exchange block lists its Input columns;
    // none may carry the opaque binary `content` column — decode
    // happens strictly before any shuffle
    for (q <- Seq("multimodal_features", "multimodal_frames",
        "multimodal_resize", "multimodal_dedup_apply")) {
      val blocks = formatted(q).split("\\n\\(\\d+\\) ")
        .filter(_.startsWith("Exchange"))
      assert(blocks.nonEmpty, s"$q plan shape changed: no Exchange found")
      blocks.foreach { b =>
        assert(!b.contains("content"),
          s"$q shuffles content bytes: ${b.take(200)}")
      }
    }
  }

  test("bucketed layout removes the join-side exchanges") {
    // LakehouseQueries claim: bucketBy on the join key means "NO
    // Exchange on either join side" — the only exchange left is the
    // post-join rollup's. A second exchange means the bucket layout
    // stopped being consumed and both fact tables shuffle every run.
    val p = formatted("layout_bucket_join")
    assert(p.contains("SortMergeJoin"), p.take(400))
    // count node-detail headers — each physical Exchange appears once
    // as "(n) Exchange" (the tree line would double-count it)
    assert("""\(\d+\) Exchange""".r.findAllIn(p).size == 1,
      "bucketed join sides re-shuffled:\n" + p.take(800))
    assert(p.contains("SelectedBucketsCount"), p.take(800))
  }

  test("key-grouped DSv2 scan feeds its aggregation with zero exchanges") {
    // SyntheticV2Source claim: keyed=true reports a KeyGroupedPartitioning
    // over bucket, so groupBy(bucket) runs straight off the scan. Any
    // Exchange in this plan means the source's layout report stopped
    // being honored and the scan is re-shuffled.
    val p = formatted("source_dsv2_keyed")
    assert(!p.contains("Exchange"),
      "keyed scan re-shuffled:\n" + p.take(800))
  }

  test("DSv2 top-N pushdown erases Sort and Limit from the plan") {
    // SyntheticV2Source claim: ORDER BY id LIMIT k is COMPLETELY
    // pushed — a TakeOrderedAndProject (or a global Sort, or a
    // surviving limit over a full scan) means the source stopped
    // folding top-N and a 10^8-row table would actually be read
    val p = plan("source_dsv2_topn")
    assert(p.contains("order=asc") && p.contains("order=desc"),
      "top-N truncation missing from the scans:\n" + p.take(800))
    assert(!p.contains("TakeOrderedAndProject") && !p.contains("Sort "),
      "top-N not fully pushed:\n" + p.take(800))
  }

  test("DSv2 join pushdown erases the join exec from the plan") {
    // SupportsPushDownJoin claim: the inner equi-join of two synthetic
    // scans on id IS one interval-intersected scan — any Join exec
    // (or a second BatchScan) means the fold silently stopped and a
    // 10^12-row join would actually shuffle
    val p = plan("source_dsv2_join")
    assert(!p.contains("Join"), "join not folded:\n" + p.take(800))
    assert("BatchScan".r.findAllIn(p).size == 1,
      "both sides must collapse into one scan:\n" + p.take(800))
    assert(p.contains("lo=50000") && p.contains("hi=250000"),
      "interval intersection missing:\n" + p.take(800))
  }

  test("storage-partitioned join plans with zero exchanges end-to-end") {
    // ScalarBreadthQueries claim: two keyed scans join and re-aggregate
    // on the shared bucket key with "zero exchanges" — scan layouts
    // feed the SMJ, and the groupBy rides the preserved partitioning
    val p = formatted("source_dsv2_spj")
    assert(p.contains("SortMergeJoin"), p.take(400))
    assert(!p.contains("Exchange"), "SPJ re-shuffled:\n" + p.take(800))
  }

  test("day-partitioned fact scan carries a dynamic pruning filter") {
    // LakehouseQueries claim: the dimension's weekday filter reaches
    // the fact scan as a runtime partition filter (1/7th of partitions
    // read), not as a post-scan filter over the full table
    val p = formatted("layout_dpp_prune")
    assert(p.toLowerCase.contains("dynamicpruning"),
      "fact scan reads all partitions:\n" + p.take(800))
  }

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
    // text_lm_backoff's vocabulary-keyed count tables follow the same
    // rule: its ONE hint is the 1-row token total — bigram/unigram
    // joins must stay unhinted
    assert("strategy=broadcast".r
      .findAllIn(optimized("text_lm_backoff")).size == 1)
    // dq_referential: parents join on the shuffled key with no forced
    // broadcast (orders-as-parent is fact-sized); its one-row parent
    // counts are the only hints — one per FK family
    assert("strategy=broadcast".r
      .findAllIn(optimized("dq_referential")).size == 4)
    // text_cooccurrence keeps exactly ONE hint — the 1-row corpus
    // total; its vocabulary-sized marginals must stay unhinted
    assert("strategy=broadcast".r
      .findAllIn(optimized("text_cooccurrence")).size == 1)
  }
}

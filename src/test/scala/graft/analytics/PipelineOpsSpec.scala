package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Semantic invariants for the round-2 pipeline operators (the oracle
  * hash-compare proves engine agreement; these pin the properties the
  * numbers must have to MEAN what they claim).
  */
class PipelineOpsSpec extends SparkSuite {

  test("dedup_clusters is a valid connected-components labeling") {
    val clusters = DedupQueries.dedupClusters(spark, sf0001)
      .select("doc_id", "cluster_id", "cluster_size").cache()
    val pairs = DedupQueries.dedupSimhashPairs(spark, sf0001)
      .select("doc_a", "doc_b").cache()

    // every near-dup pair lands in one cluster
    val split = pairs
      .join(clusters.select(col("doc_id").as("doc_a"),
        col("cluster_id").as("ca")), "doc_a")
      .join(clusters.select(col("doc_id").as("doc_b"),
        col("cluster_id").as("cb")), "doc_b")
      .where(col("ca") =!= col("cb")).count()
    assert(split == 0, s"$split pairs straddle clusters")

    // the label is the minimum member (the canonical doc to keep)
    val badLabel = clusters.groupBy("cluster_id")
      .agg(min("doc_id").as("lo"))
      .where(col("cluster_id") =!= col("lo")).count()
    assert(badLabel == 0)

    // sizes partition the corpus: every doc appears exactly once
    val nDocs = spark.read.parquet(s"$sf0001/documents.parquet").count()
    assert(clusters.count() == nDocs)
    assert(clusters.select("cluster_id", "cluster_size").distinct()
      .agg(sum("cluster_size")).head.getLong(0) == nDocs)

    // docs in no pair are singletons labeled by themselves
    val inPairs = pairs.select(col("doc_a").as("doc_id"))
      .union(pairs.select(col("doc_b").as("doc_id"))).distinct()
    val badSingleton = clusters.join(inPairs, Seq("doc_id"), "left_anti")
      .where(col("cluster_id") =!= col("doc_id") ||
        col("cluster_size") =!= 1).count()
    assert(badSingleton == 0)
    clusters.unpersist(); pairs.unpersist()
  }

  test("knn_ivf scores agree with brute force on shared pairs") {
    val ivf = EmbeddingQueries.knnIvf(spark, sf0001)
      .select(col("query_id"), col("vec_id"),
        col("score_ppm").as("ivf_score"))
    val brute = EmbeddingQueries.knnBruteForce(spark, sf0001)
      .select(col("query_id"), col("vec_id"),
        col("score_ppm").as("bf_score"))
    val joined = ivf.join(brute, Seq("query_id", "vec_id")).cache()
    assert(joined.where(col("ivf_score") =!= col("bf_score")).count() == 0)
    // the probe actually finds most of the true top-k (cell recall);
    // exact recall is data-dependent — pin a sane floor, not equality
    val recall = joined.count().toDouble /
      brute.count().toDouble
    assert(recall > 0.3, f"IVF recall $recall%.2f vs brute force")
    joined.unpersist()
  }

  test("knn_ivf per-query result shape") {
    val ivf = EmbeddingQueries.knnIvf(spark, sf0001).cache()
    assert(ivf.where(col("query_id") === col("vec_id")).count() == 0)
    val byQuery = ivf.groupBy("query_id")
      .agg(count(lit(1)).as("n"), max("rnk").as("mx"), min("rnk").as("mn"))
    assert(byQuery.where(col("n") > EmbeddingQueries.TopK).count() == 0)
    assert(byQuery.where(col("mn") =!= 1).count() == 0)
    assert(byQuery.where(col("mx") =!= col("n")).count() == 0)
    ivf.unpersist()
  }

  test("trained IVF keeps exact scores and a recall floor vs brute force") {
    val ivf = EmbeddingQueries.knnIvfTrained(spark, sf0001)
      .select(col("query_id"), col("vec_id"),
        col("score_ppm").as("ivf_score"))
    val brute = EmbeddingQueries.knnBruteForce(spark, sf0001)
      .select(col("query_id"), col("vec_id"),
        col("score_ppm").as("bf_score"))
    val joined = ivf.join(brute, Seq("query_id", "vec_id")).cache()
    // candidates the probe finds carry EXACT scores (training changes
    // which cells are probed, never the scoring)
    assert(joined.where(col("ivf_score") =!= col("bf_score")).count() == 0)
    val recall = joined.count().toDouble / brute.count().toDouble
    assert(recall > 0.3, f"trained-IVF recall $recall%.2f vs brute force")
    joined.unpersist()
  }

  test("PQ-ADC re-ranked scores are exact and recall clears the floor") {
    val pq = EmbeddingQueries.knnPqAdc(spark, sf0001)
      .select(col("query_id"), col("vec_id"),
        col("score_ppm").as("pq_score"))
    val brute = EmbeddingQueries.knnBruteForce(spark, sf0001)
      .select(col("query_id"), col("vec_id"),
        col("score_ppm").as("bf_score"))
    val joined = pq.join(brute, Seq("query_id", "vec_id")).cache()
    // the 4-byte codes only pick CANDIDATES; survivors carry exact
    // cosine from the re-rank, so shared rows must agree to the ppm
    assert(joined.where(col("pq_score") =!= col("bf_score")).count() == 0)
    val recall = joined.count().toDouble / brute.count().toDouble
    assert(recall > 0.3, f"PQ-ADC recall $recall%.2f vs brute force")
    joined.unpersist()
  }

  test("IVF-PQ candidates score exactly and clear the recall floor") {
    val ivfpq = EmbeddingQueries.knnIvfPq(spark, sf0001)
      .select(col("query_id"), col("vec_id"),
        col("score_ppm").as("ivfpq_score"))
    val brute = EmbeddingQueries.knnBruteForce(spark, sf0001)
      .select(col("query_id"), col("vec_id"),
        col("score_ppm").as("bf_score"))
    val joined = ivfpq.join(brute, Seq("query_id", "vec_id")).cache()
    assert(joined.where(col("ivfpq_score") =!= col("bf_score")).count() == 0)
    // two pruning stages stack (cells × codes), so the floor is lower
    // than either alone — what matters is exactness + a sane recall
    val recall = joined.count().toDouble / brute.count().toDouble
    assert(recall > 0.2, f"IVF-PQ recall $recall%.2f vs brute force")
    joined.unpersist()
  }

  test("SQ8 candidates score exactly and clear the recall floor") {
    val sq = EmbeddingQueries.knnSq8(spark, sf0001)
      .select(col("query_id"), col("vec_id"),
        col("score_ppm").as("sq_score"))
    val brute = EmbeddingQueries.knnBruteForce(spark, sf0001)
      .select(col("query_id"), col("vec_id"),
        col("score_ppm").as("bf_score"))
    val joined = sq.join(brute, Seq("query_id", "vec_id")).cache()
    // uint8 codes only pick candidates; survivors carry exact cosine
    assert(joined.where(col("sq_score") =!= col("bf_score")).count() == 0)
    val recall = joined.count().toDouble / brute.count().toDouble
    assert(recall > 0.3, f"SQ8 recall $recall%.2f vs brute force")
    joined.unpersist()
  }

  test("count-min estimates never undercount and bound by corpus size") {
    val cm = TextQueries.sketchCountmin(spark, sf0001).cache()
    // the CM guarantee: est >= exact for EVERY point query
    assert(cm.where(col("overcount") < 0).count() == 0,
      "count-min undercounted a token")
    val totalTokens = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(size(split(col("text"), " ")).as("n"))
      .agg(sum(col("n"))).collect()(0).getLong(0)
    // a cell can never exceed the whole corpus token count
    assert(cm.where(col("est_n") > totalTokens).count() == 0)
    cm.unpersist()
  }

  test("lm score: every bigram counts itself, so mean frequency >= 1") {
    val lm = TextQueries.textLmScore(spark, sf0001).cache()
    assert(lm.where(col("sum_freq") < col("n_bigrams")).count() == 0,
      "a bigram's corpus count fell below its own occurrence")
    assert(lm.where(col("mean_bigram_freq_x1e6") < 1000000L).count() == 0)
    lm.unpersist()
  }

  test("classifier verdicts respect the score thresholds and all occur") {
    val cls = PipelineQueries.pipelineClassifier(spark, sf0001).cache()
    assert(cls.where(col("verdict") === "high" &&
      col("score") <= 5400000L).count() == 0)
    assert(cls.where(col("verdict") === "drop" &&
      col("score") > 4500000L).count() == 0)
    val verdicts = cls.select(col("verdict")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(verdicts == Set("high", "mid", "drop"),
      s"fixture only exercises $verdicts — thresholds no longer split")
    cls.unpersist()
  }

  test("KMV set-algebra estimates land within the sketch's error regime") {
    val r = TpchQueries.sketchKmvSetops(spark, sf0001).collect()(0)
    def rel(est: Long, exact: Long): Double =
      math.abs(est - exact).toDouble / exact
    assert(rel(r.getAs[Long]("est_a"), r.getAs[Long]("n_a")) < 0.5)
    assert(rel(r.getAs[Long]("est_b"), r.getAs[Long]("n_b")) < 0.5)
    assert(rel(r.getAs[Long]("est_union"), r.getAs[Long]("n_union")) < 0.5)
    assert(rel(r.getAs[Long]("est_inter"), r.getAs[Long]("n_inter")) < 0.5)
    // inclusion-exclusion on the EXACT side is definitional
    assert(r.getAs[Long]("n_inter") ==
      r.getAs[Long]("n_a") + r.getAs[Long]("n_b") - r.getAs[Long]("n_union"))
  }

  test("correlated-sample join estimate lands near the true cardinality") {
    val r = TpchQueries.joinCardinalityEst(spark, sf0001).collect()(0)
    val err = math.abs(r.getAs[Long]("err_ppm"))
    assert(err < 300000L, s"sampling error ${err}ppm exceeds 30%")
  }

  test("CDC apply honors tombstones: deleted users are absent") {
    val out = LakehouseQueries.eventsCdcApply(spark, sf0001).cache()
    assert(out.where(col("op_type") === "error").count() == 0)
    // users whose LAST event is a tombstone must not appear at all
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val deleted = spark.read.parquet(s"$sf0001/events.parquet")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1 && col("event_type") === "error")
      .select(col("user_id"))
    assert(out.join(deleted, "user_id", "left_semi").count() == 0,
      "a tombstoned user survived the merge")
    assert(deleted.count() > 0, "fixture exercises no tombstones")
    out.unpersist()
  }

  test("PIT join is a bijection on purchase facts with no future leakage") {
    val pit = EventQueries.eventsPitJoin(spark, sf0001).cache()
    val facts = spark.read.parquet(s"$sf0001/events.parquet")
      .where(col("event_type") === "purchase")
    // every fact matched exactly once (runs tile each user's history)
    assert(pit.count() == facts.count(),
      "PIT join is not 1:1 on facts")
    assert(pit.select(col("fact_id")).distinct().count() == pit.count())
    // anti-leakage: the joined dimension run never starts after the fact
    val dim = EventQueries.eventsScd2(spark, sf0001)
      .select(col("user_id").as("du"), col("first_rn").as("dim_run"),
        col("valid_from"))
    val leaked = pit.join(dim,
      col("user_id") === col("du") && pit("dim_run") === dim("dim_run"))
      .where(col("valid_from") > col("fact_ts"))
    assert(leaked.count() == 0, "a fact joined a FUTURE dimension version")
    pit.unpersist()
  }

  test("min/max pruning: clustering skips blocks, scattering cannot") {
    val rows = LakehouseQueries.layoutMinmaxPrune(spark, sf0001)
      .collect().map(r => r.getAs[String]("layout") -> r).toMap
    val clustered = rows("date_clustered").getAs[Long]("prune_ppm")
    val scattered = rows("hash_scattered").getAs[Long]("prune_ppm")
    assert(clustered > 500000L,
      s"date-clustered layout pruned only ${clustered}ppm")
    assert(scattered < 100000L,
      s"hash layout pruned ${scattered}ppm — min/max spans should cover the domain")
    assert(clustered > scattered * 5)
  }

  test("dataset card rollup rows cohere with the grand total") {
    val card = PipelineQueries.pipelineDatasetCard(spark, sf0001).cache()
    val total = spark.read.parquet(s"$sf0001/documents.parquet").count()
    val grand = card.where(col("g_lang") === 1 && col("g_source") === 1)
    assert(grand.count() == 1)
    assert(grand.collect()(0).getAs[Long]("n_docs") == total)
    // per-lang subtotals tile the corpus exactly
    val perLang = card.where(col("g_lang") === 0 && col("g_source") === 1)
      .agg(sum(col("n_docs"))).collect()(0).getLong(0)
    assert(perLang == total, s"per-lang rollup $perLang != corpus $total")
    card.unpersist()
  }

  test("volume anomaly flags match the deviation threshold exactly") {
    val dq = LakehouseQueries.dqAnomaly(spark, sf0001).cache()
    assert(dq.where(col("is_anomaly") =!=
      (abs(col("dev_ppm")) > 500000L)).count() == 0)
    assert(dq.where(col("tcnt") < 3 || col("tcnt") > 7).count() == 0)
    // the detector is live on the fixture (both classes occur)
    assert(dq.where(col("is_anomaly")).count() > 0)
    assert(dq.where(!col("is_anomaly")).count() > 0)
    dq.unpersist()
  }

  test("text_repetition ratios are well-formed ppm signals") {
    val rep = TextQueries.textRepetition(spark, sf0001).cache()
    val bad = rep.where(
      col("dup_token_ppm") < 0 || col("dup_token_ppm") > 1000000 ||
      col("dup_3gram_ppm") < 0 || col("dup_3gram_ppm") > 1000000 ||
      col("top_2gram_ppm") <= 0 || col("top_2gram_ppm") > 1000000 ||
      col("top_2gram_n") < 1 || col("n_tokens") < 3).count()
    assert(bad == 0)
    // more token duplication than 3-gram duplication, always (a
    // repeated 3-gram forces repeated tokens, not vice versa)
    assert(rep.where(col("dup_3gram_ppm") > col("dup_token_ppm") * 3)
      .count() == 0)
    rep.unpersist()
  }

  test("text_tfidf emits a ranked top-3 per document") {
    val tfidf = TextQueries.textTfidf(spark, sf0001).cache()
    val byDoc = tfidf.groupBy("doc_id").agg(count(lit(1)).as("n"),
      min("rnk").as("mn"), max("rnk").as("mx"))
    assert(byDoc.where(col("n") > 3 || col("mn") =!= 1 ||
      col("mx") =!= col("n")).count() == 0)
    // rank order follows score order within a doc
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("rnk")
    val misordered = tfidf
      .withColumn("prev", lag("score_ppm", 1).over(w))
      .where(col("prev").isNotNull && col("prev") < col("score_ppm"))
      .count()
    assert(misordered == 0)
    assert(tfidf.where(col("tf") < 1 || col("df") < 1).count() == 0)
    tfidf.unpersist()
  }

  test("sample_stratified realized rates track the stratum thresholds") {
    val s = TpchQueries.sampleStratifiedOrders(spark, sf001).cache()
    assert(s.where(col("n_sampled") > col("n_total")).count() == 0)
    val rates = s.select(col("o_orderpriority"), col("realized_ppm"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val high = Seq("1-URGENT", "2-HIGH").flatMap(rates.get).min
    val mid = rates("3-MEDIUM")
    val low = (rates.keySet -- Set("1-URGENT", "2-HIGH", "3-MEDIUM"))
      .map(rates).max
    assert(high > mid && mid > low,
      s"stratum ordering violated: high=$high mid=$mid low=$low")
    s.unpersist()
  }

  test("pipeline_pack tiles the token stream without gaps") {
    val packed = PipelineQueries.pipelinePack(spark, sf0001).cache()
    val nDocs = QueryUtil.table(spark, sf0001, "documents").count()
    assert(packed.count() == nDocs, "packing must place every document")
    val total = packed.agg(sum("n_tok")).head.getLong(0)
    val maxSeq = packed.agg(max("end_seq")).head.getLong(0)
    // the last sequence index is exactly ceil(total/512) - 1: the
    // concatenation covers the token space with no padding slack
    assert(maxSeq == (total - 1) / 512, s"maxSeq=$maxSeq total=$total")
    // every sequence index in [0, maxSeq] is owned by some document
    val covered = packed
      .select(explode(sequence(col("start_seq"), col("end_seq"))).as("s"))
      .distinct().count()
    assert(covered == maxSeq + 1, "sequence index space has holes")
    assert(packed.where(col("end_seq") < col("start_seq")).count() == 0)
    assert(packed
      .where(col("n_crossed") =!= col("end_seq") - col("start_seq"))
      .count() == 0)
    packed.unpersist()
  }

  test("pipeline_mix never overflows a budget and is greedily maximal") {
    val mix = PipelineQueries.pipelineMix(spark, sf0001).cache()
    assert(mix.where(col("n_tok_kept") > col("tgt_tok")).count() == 0)
    assert(mix.where(col("fill_ppm") > 1000000L).count() == 0)
    // greedy maximality in aggregate: for each language, either the
    // whole corpus slice was kept (budget not reached) or the unfilled
    // remainder is smaller than the language's largest document (so no
    // whole document could have been added without overflow)
    val docs = QueryUtil.table(spark, sf0001, "documents")
      .select(col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .groupBy("lang")
      .agg(sum("n_tok").as("avail"), max("n_tok").as("biggest"))
    val bad = mix.join(docs, "lang")
      .where(col("n_tok_kept") =!= col("avail") &&
        col("tgt_tok") - col("n_tok_kept") >= col("biggest"))
      .count()
    assert(bad == 0, "a whole document was skippable without overflow")
    mix.unpersist()
  }

  test("graph_pagerank ranks a star's hub first and floors at 1-d") {
    import spark.implicits._
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L))
      .toDF("doc_a", "doc_b")
    val pr = PipelineQueries.pagerankFrame(star).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr.keySet == Set(0L, 1L, 2L, 3L, 4L))
    assert(pr(0L) > pr(1L), "hub must outrank leaves")
    assert(Set(1L, 2L, 3L, 4L).map(pr).size == 1, "leaves tie by symmetry")
    assert(pr.values.forall(_ >= 150000L), "rank floor is (1-d)")
    // chain: interior nodes outrank endpoints
    val chain = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L))
      .toDF("doc_a", "doc_b")
    val cr = PipelineQueries.pagerankFrame(chain).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cr(2L) > cr(0L) && cr(2L) > cr(4L))
    assert(cr(0L) == cr(4L) && cr(1L) == cr(3L), "chain is symmetric")
  }

  test("events_scd2 runs tile each user's history exactly") {
    import org.apache.spark.sql.expressions.Window
    val scd = EventQueries.eventsScd2(spark, sf0001).cache()
    val w = Window.partitionBy("user_id").orderBy("first_rn")
    // adjacent runs never carry the same segment (they'd be one run)
    assert(scd.withColumn("next_seg", lead(col("seg"), 1).over(w))
      .where(col("next_seg") === col("seg")).count() == 0)
    // exactly one open (current) row per user
    assert(scd.groupBy("user_id")
      .agg(sum(when(col("is_current"), 1).otherwise(0)).as("n"))
      .where(col("n") =!= 1).count() == 0)
    // run event counts partition the user's events
    val ev = QueryUtil.table(spark, sf0001, "events")
      .groupBy("user_id").agg(count(lit(1)).as("ne"))
    assert(scd.groupBy("user_id").agg(sum("n_events").as("n"))
      .join(ev, "user_id").where(col("n") =!= col("ne")).count() == 0)
    // each run's valid_to is exactly the successor's valid_from
    assert(scd.withColumn("nf", lead(col("valid_from"), 1).over(w))
      .where(!(col("valid_to") <=> col("nf"))).count() == 0)
    scd.unpersist()
  }

  test("pipeline_remove_chunks accounting coheres with the chunk report") {
    val rm = PipelineQueries.pipelineRemoveChunks(spark, sf0001).cache()
    // kept + removed partitions the document's chunks, never negative
    assert(rm.where(col("n_chunks_kept") + col("n_chunks_removed") =!=
      col("n_chunks_total")).count() == 0)
    assert(rm.where(col("n_chunks_kept") < 0 ||
      col("n_chunks_removed") < 0).count() == 0)
    // every occurrence of a dedup_chunk-reported duplicate span was
    // removed: total removals across the corpus must be at least the
    // sum of occurrences of the reported (capped top-1000) hashes
    val reported = PipelineQueries.dedupChunk(spark, sf0001)
      .agg(sum("n_occurrences")).head.getLong(0)
    val removed = rm.agg(sum("n_chunks_removed")).head.getLong(0)
    assert(removed >= reported,
      s"removed=$removed < reported duplicate occurrences=$reported")
    // a document with nothing removed keeps its original token count
    val docs = QueryUtil.table(spark, sf0001, "documents")
      .select(col("doc_id"),
        ceil(size(split(col("text"), " ")) / lit(5.0)).cast("long")
          .as("n_expected"))
    assert(rm.where(col("n_chunks_removed") === 0).join(docs, "doc_id")
      .where(col("n_chunks_total") =!= col("n_expected")).count() == 0)
    rm.unpersist()
  }

  test("graph_kcore equals an independent in-process peel of the pairs") {
    val core = PipelineQueries.graphKcore(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // re-run the same peel in plain Scala collections from the raw
    // pair list — an independent implementation, so a broken round
    // (wrong edge set, wrong degree source) diverges here even though
    // the query's own output filter would mask it
    var edges = DedupQueries
      .simhashPairsFrame(QueryUtil.table(spark, sf0001, "documents"))
      .select(col("doc_a"), col("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    def degs(es: Seq[(Long, Long)]): Map[Long, Long] =
      (es.map(_._1) ++ es.map(_._2)).groupBy(identity)
        .map { case (v, os) => v -> os.size.toLong }
    var d = degs(edges)
    for (_ <- 2 to PipelineQueries.KcoreRounds) {
      val keep = d.filter(_._2 >= PipelineQueries.KcoreK).keySet
      edges = edges.filter(e => keep(e._1) && keep(e._2))
      d = degs(edges)
    }
    val want = d.filter(_._2 >= PipelineQueries.KcoreK)
    assert(core == want, s"got $core\nwant $want")
    // a 2-core vertex needs >= 2 neighbors, so its connected component
    // has at least k+1 members — cross-check against dedup_clusters
    val small = DedupQueries.dedupClusters(spark, sf0001)
      .where(col("cluster_size") < PipelineQueries.KcoreK + 1)
      .collect().map(_.getLong(0)).toSet
    assert(core.keySet.intersect(small).isEmpty)
  }

  test("pipeline_curriculum takes a rank-prefix that straddles the budget") {
    val cur = PipelineQueries.pipelineCurriculum(spark, sf0001).cache()
    // a 60% budget with no dominant stratum must drop something; an
    // empty drop set would also NPE the min() below with a confusing
    // error instead of a real failure message
    assert(cur.where(!col("taken")).count() > 0,
      "no stratum dropped — budget property untestable on this data")
    // taken must be exactly the strata ranked before the first drop
    val firstDrop = cur.where(!col("taken"))
      .agg(min("sel_rank")).head.getLong(0)
    assert(cur.where(col("taken") && col("sel_rank") >= firstDrop)
      .count() == 0)
    // tokens before the cut stay under budget; adding the first
    // dropped stratum's predecessor crosses it — the straddle property
    val total = cur.agg(sum("n_tokens")).head.getLong(0)
    val budget = total * 3 / 5
    val takenTokens = cur.where(col("taken"))
      .agg(sum("n_tokens")).head.getLong(0)
    val beforeLast = cur.where(col("taken"))
      .agg(max("cum_before")).head.getLong(0)
    assert(beforeLast < budget)
    assert(takenTokens >= budget,
      s"cut stopped short: taken=$takenTokens budget=$budget")
    cur.unpersist()
  }

  test("pipeline_provenance dup counts equal dedup_exact's duplicates") {
    val prov = PipelineQueries.pipelineProvenance(spark, sf0001)
    // dup_doc_ppm uses the same min-doc_id canonical convention as
    // dedup_exact — the corpus-wide duplicate counts must agree
    val provDups = prov
      .select((col("dup_doc_ppm") * col("n_docs")).as("scaled"))
      .agg(sum("scaled")).head.getLong(0) / 1000000L
    val exactDups = DedupQueries.dedupExact(spark, sf0001)
      .where(col("is_duplicate")).count()
    // ppm floors per source; allow at most one lost doc per stratum
    val strata = prov.count()
    assert(math.abs(provDups - exactDups) <= strata,
      s"prov=$provDups exact=$exactDups strata=$strata")
  }

  test("agg_bitwise booleans agree with recomputed extremes") {
    val agg = TpchQueries.aggBitwiseOrders(spark, sf0001)
    val check = spark.read.parquet(s"$sf0001/orders.parquet")
      .groupBy(col("o_orderstatus"))
      .agg(min("o_totalprice").as("lo"), max("o_totalprice").as("hi"))
    val joined = agg.join(check, "o_orderstatus")
    assert(joined.where(col("all_over_900") =!= (col("lo") > 900))
      .count() == 0)
    assert(joined.where(col("any_over_500k") =!= (col("hi") > 500000))
      .count() == 0)
    // OR contains AND bit-wise: and & or == and
    assert(agg.where((col("flags_and").bitwiseAND(col("flags_or"))) =!=
      col("flags_and")).count() == 0)
  }
}

package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Semantic invariants for the round-5 third-context operators (the
  * oracle hash-compare proves engine agreement; these pin the
  * properties the numbers must have to MEAN what they claim).
  */
class Round5OpsSpec extends SparkSuite {

  test("interval merge islands tile each user's coverage") {
    val islands = EventQueries.eventsIntervalMerge(spark, sf0001).cache()
    val events = spark.read.parquet(s"$sf0001/events.parquet")

    // islands partition the events: per-user counts add up
    assert(islands.agg(sum("n_events")).head.getLong(0) == events.count())

    // islands are well-formed and maximal: each covers a positive
    // span, and consecutive islands of a user do NOT touch (a touch
    // would mean the merge failed to coalesce them)
    assert(islands.where(col("covered_s") <= 0).count() == 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("island_start_s")
    val overlapping = islands
      .withColumn("prev_end", lag("island_end_s", 1).over(w))
      .where(col("prev_end").isNotNull &&
        col("island_start_s") <= col("prev_end"))
      .count()
    assert(overlapping == 0, s"$overlapping islands touch their predecessor")
    islands.unpersist()
  }

  test("containment dominates jaccard on every shared pair") {
    val cont = DedupQueries.dedupContainment(spark, sf0001)
    val jac = DedupQueries.dedupNgramJaccard(spark, sf0001)
    val joined = cont.join(jac, Seq("doc_a", "doc_b")).cache()
    // |A∩B|/min ≥ |A∩B|/|A∪B| always; ppm floor preserves ≥
    assert(joined.where(col("containment_ppm") < col("jaccard_ppm"))
      .count() == 0)
    assert(cont.where(col("containment_ppm") > 1000000).count() == 0)
    joined.unpersist()
  }

  test("distribution drift is a bounded L1 distance over all days") {
    val drift = LakehouseQueries.dqDistributionDrift(spark, sf0001).cache()
    val events = spark.read.parquet(s"$sf0001/events.parquet")
    // every day is reported and day volumes re-add to the corpus
    assert(drift.agg(sum("n_d")).head.getLong(0) == events.count())
    // L1 distance of two probability distributions is ≤ 2 (2e6 ppm)
    assert(drift.where(col("drift_ppm") < 0 ||
      col("drift_ppm") > 2000000).count() == 0)
    drift.unpersist()
  }

  test("centroid outliers score every vector once, in cosine range") {
    val out = EmbeddingQueries.embOutliers(spark, sf0001).cache()
    val n = spark.read.parquet(s"$sf0001/embeddings.parquet").count()
    assert(out.count() == n)
    assert(out.select("vec_id").distinct().count() == n)
    // cosine is in [-1, 1] ⇒ ppm in [-1e6, 1e6]
    assert(out.where(col("cos_ppm") > 1000000 ||
      col("cos_ppm") < -1000000).count() == 0)
    // the flag is exactly the threshold predicate
    assert(out.where(col("is_outlier") =!=
      (col("cos_ppm") < EmbeddingQueries.OutlierPpm)).count() == 0)
    out.unpersist()
  }

  test("vacuum plan never reclaims a user's live version") {
    val plan = LakehouseQueries.layoutVacuum(spark, sf0001).cache()
    val events = spark.read.parquet(s"$sf0001/events.parquet")
    assert(plan.agg(sum("n_rows")).head.getLong(0) == events.count())
    // each user's latest row is kept, so at least n_users rows survive
    val nUsers = events.select("user_id").distinct().count()
    val reclaimed = plan.agg(sum("n_reclaimable")).head.getLong(0)
    assert(reclaimed <= events.count() - nUsers)
    assert(plan.where(col("n_reclaimable") > col("n_rows")).count() == 0)
    plan.unpersist()
  }

  test("transition matrix rows are probability distributions") {
    val t = EventQueries.eventsTransitions(spark, sf0001).cache()
    // each from-row's ppm mass sums to 1e6 (up to one floor ulp per
    // cell — floor(1e6·n/total) loses < 1 ppm per transition cell)
    val nTypes = t.select("to_type").distinct().count()
    val bad = t.groupBy("from_type")
      .agg(sum("p_ppm").as("mass"), count(lit(1)).as("cells"))
      .where(col("mass") > 1000000 ||
        col("mass") <= lit(1000000) - col("cells"))
      .count()
    assert(bad == 0)
    // transition counts re-add to (events − one per user sequence)
    val events = spark.read.parquet(s"$sf0001/events.parquet")
    val nUsers = events.select("user_id").distinct().count()
    assert(t.agg(sum("n")).head.getLong(0) == events.count() - nUsers)
    assert(nTypes <= 5)
    t.unpersist()
  }

  test("basket lift agrees with independent recounts on a sample pair") {
    val lift = TpchDeepQueries.basketLift(spark, sf0001).cache()
    // spot-verify the top-lift pair against first-principles recounts
    val top = lift.orderBy(col("lift_ppm").desc, col("pa"), col("pb")).head
    val (pa, pb) = (top.getLong(0), top.getLong(1))
    val items = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct().cache()
    val nAb = items.where(col("pk") === pa).select("ok")
      .intersect(items.where(col("pk") === pb).select("ok")).count()
    assert(top.getLong(2) == nAb, "n_ab mismatch vs recount")
    // support is monotone with n_ab and every pair meets min-support
    assert(lift.where(col("n_ab") < TpchDeepQueries.MinSupport)
      .count() == 0)
    items.unpersist(); lift.unpersist()
  }

  test("quantile sketch lands inside the covering bucket") {
    val sk = TextQueries.sketchQuantile(spark, sf0001).cache()
    assert(sk.count() == 3)
    // est and the exact quantile share the covering bucket on this
    // data (adjacent order statistics are dense around the quantiles;
    // interpolation across a wide gap could leave the bucket on
    // adversarial data — see the QW contract note), so the sketch is
    // within one bucket width of the interpolated exact here
    val off = sk.where(abs(col("est") * 100 - col("exact_cents")) >
      TextQueries.QW * 100).count()
    assert(off == 0)
    val n = spark.read.parquet(s"$sf0001/lineitem.parquet").count()
    assert(sk.where(col("t") < 1 || col("t") > n).count() == 0)
    sk.unpersist()
  }

  test("RFM segments partition the customer base with valid scores") {
    val seg = TpchDeepQueries.ordersRfm(spark, sf0001).cache()
    val nCust = spark.read.parquet(s"$sf0001/orders.parquet")
      .select("o_custkey").distinct().count()
    assert(seg.agg(sum("n_customers")).head.getLong(0) == nCust)
    // segment digits are each 1..5
    val bad = seg.where(
      col("segment") < 111 || col("segment") > 555 ||
        col("segment") % 10 < 1 || col("segment") % 10 > 5 ||
        expr("(segment div 10) % 10") < 1 ||
        expr("(segment div 10) % 10") > 5)
      .count()
    assert(bad == 0)
    seg.unpersist()
  }

  test("attribution credits every purchase to exactly one channel") {
    val att = EventQueries.eventsAttribution(spark, sf0001).cache()
    val purchases = spark.read.parquet(s"$sf0001/events.parquet")
      .where(col("event_type") === "purchase").count()
    assert(att.agg(sum("n_purchases")).head.getLong(0) == purchases)
    val channels = att.select("channel").collect().map(_.getString(0)).toSet
    assert(channels.subsetOf(Set("click", "view", "direct")))
    att.unpersist()
  }

  test("LPA separates bridged triangles that connectivity would merge") {
    import spark.implicits._
    // two triangles joined by one bridge edge (3–4): ONE connected
    // component, but TWO density communities — hand-traced through 3
    // deterministic (count DESC, label ASC) rounds
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L)).toDF("doc_a", "doc_b")
    val got = PipelineQueries.lpaFrame(edges)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got(1L) == (1L, 3L) && got(2L) == (1L, 3L) &&
      got(3L) == (1L, 3L), s"left triangle: $got")
    assert(got(4L) == (3L, 3L) && got(5L) == (3L, 3L) &&
      got(6L) == (3L, 3L), s"right triangle: $got")
    // the fixture is one connected component — LPA still splits it
    assert(got.values.map(_._1).toSet.size == 2)
  }

  test("pareto, OLS, and DAU/WAU readouts satisfy their definitions") {
    val par = TpchDeepQueries.ordersPareto(spark, sf0001).head
    // covering slice reaches 80% and is a subset of the customer base
    assert(par.getAs[Long]("covered_ppm") >= 800000L)
    assert(par.getAs[Long]("n_top_customers") <=
      par.getAs[Long]("n_customers"))

    val ols = TpchDeepQueries.statOlsRevenue(spark, sf0001).head
    val r2 = ols.getAs[Long]("r2_ppm")
    assert(r2 >= 0 && r2 <= 1000000L, s"r² out of range: $r2")

    val dw = EventQueries.eventsDauWau(spark, sf0001).cache()
    // a day's actives are a subset of its trailing week's actives
    assert(dw.where(col("dau") > col("wau")).count() == 0)
    assert(dw.where(col("stickiness_ppm") > 1000000).count() == 0)
    dw.unpersist()
  }

  test("BPE merge round: applied merges never exceed counted pairs") {
    val bpe = TextQueries.textBpeMerge(spark, sf0001).cache()
    assert(bpe.count() == 10)
    // overlapping positions count pairs the greedy merge can't apply,
    // so applied ≤ pair_count always; both are positive
    assert(bpe.where(col("applied") > col("pair_count")).count() == 0)
    assert(bpe.where(col("applied") <= 0 || col("pair_count") <= 0)
      .count() == 0)
    bpe.unpersist()
  }

  test("HHI sits between perfect competition and monopoly per nation") {
    val hhi = TpchDeepQueries.supplierHhi(spark, sf0001).cache()
    // Σ share² over shares summing to ≤1e6: bounded by 1e12 (monopoly)
    // and below by 1e12/n (perfect competition), up to ppm floor loss
    assert(hhi.where(col("hhi_pptr") > 1000000000000L).count() == 0)
    assert(hhi.where(col("hhi_pptr") * col("n_suppliers") <
      lit(1000000000000L) - col("n_suppliers") * lit(2000000L))
      .count() == 0)
    hhi.unpersist()
  }

  test("contrastive batches emit exactly size-choose-2 pairs each") {
    val pairs = EmbeddingQueries.embContrastivePairs(spark, sf0001).cache()
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet").count()
    // per-batch pair counts re-add to Σ size·(size−1)/2 — recomputed
    // from the same hash assignment
    val nb = math.max(emb / 8, 1L)
    val sizes = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(graft.functions.CrossHash
        .md5Long(col("vec_id").cast("string")).mod(nb).as("batch"))
      .groupBy("batch").count()
    val expect = sizes.agg(sum(expr("count * (count - 1) div 2")))
      .head.getLong(0)
    assert(pairs.count() == expect)
    assert(pairs.where(col("cos_ppm") > 1000000 ||
      col("cos_ppm") < -1000000).count() == 0)
    pairs.unpersist()
  }

  test("perceptual buckets partition the corpus in fingerprint space") {
    val ph = MultimodalQueries.multimodalPhash(spark, sf0001).cache()
    val nDocs = spark.read.parquet(s"$sf0001/documents.parquet").count()
    // every (byte==char) doc lands in exactly one bucket; the corpus
    // here is pure ASCII so that is all of it
    assert(ph.agg(sum("n_media")).head.getLong(0) == nDocs)
    // 16-bit fingerprint domain
    assert(ph.where(col("phash") < 0 || col("phash") >= 65536)
      .count() == 0)
    ph.unpersist()
  }

  test("MAD anomaly flags match the robust rule they claim") {
    val mad = LakehouseQueries.dqAnomalyMad(spark, sf0001).cache()
    // centi-scaled medians are consistent with the flag on every row:
    // flagged ⟺ |n·100 − med_centi| > 3·mad_centi, allowing the one
    // floor ulp the centi scaling can lose on each side
    val bad = mad.where(
      (col("is_anomaly") &&
        abs(col("n") * 100 - col("med_centi")) <= lit(3) * col("mad_centi")) ||
      (!col("is_anomaly") &&
        abs(col("n") * 100 - col("med_centi")) > lit(3) * col("mad_centi") + 4))
      .count()
    assert(bad == 0)
    mad.unpersist()
  }

  test("compaction groups partition the file list in order") {
    val groups = LakehouseQueries.layoutCompaction(spark, sf0001).cache()
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
    assert(groups.agg(sum("total_rows")).head.getLong(0) == orders.count())
    // packing is order-preserving: group fid ranges never interleave
    val w = org.apache.spark.sql.expressions.Window.orderBy("out_group")
    val interleaved = groups
      .withColumn("prev_last", lag("last_fid", 1).over(w))
      .where(col("prev_last").isNotNull &&
        col("first_fid") <= col("prev_last"))
      .count()
    assert(interleaved == 0)
    // prefix-div packing bound: a non-last group's total is at least
    // target − (largest file − 1) — the exact worst case when a big
    // file straddles the group boundary (equality to target is NOT a
    // theorem; sizes 800,800,800,800 at target 1000 give a middle
    // group of one 800-row file)
    val maxFile = orders.groupBy((col("o_orderkey") % 256).as("fid"))
      .count().agg(max("count")).head.getLong(0)
    val undersized = groups
      .withColumn("next", lead("out_group", 1).over(w))
      .where(col("next").isNotNull && col("total_rows") <
        LakehouseQueries.CompactTarget - maxFile + 1)
      .count()
    assert(undersized == 0)
    groups.unpersist()
  }
}

package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Semantic invariants for the round-6 operators (the oracle
  * hash-compare proves engine agreement; these pin the properties the
  * numbers must have to MEAN what they claim).
  */
class Round6OpsSpec extends SparkSuite {

  test("phash pairs are exactly the Hamming-≤2 fingerprint pairs") {
    val pairs = MultimodalQueries.multimodalPhashPairs(spark, sf0001)
      .cache()
    val clusters = MultimodalQueries.multimodalPhash(spark, sf0001).cache()

    // soundness: every reported pair is distinct fingerprints within
    // the distance bound
    assert(pairs.where(col("hamming") < 1 || col("hamming") > 2)
      .count() == 0)
    assert(pairs.where(col("phash_a") >= col("phash_b")).count() == 0)

    // completeness: brute-force over the (≤2^16) fingerprint set finds
    // no pair the 6/5/5 banding missed — the pigeonhole guarantee,
    // checked literally
    val fps = clusters.select("phash").collect().map(_.getLong(0)).sorted
    val brute = (for {
      i <- fps.indices; j <- (i + 1) until fps.length
      if java.lang.Long.bitCount(fps(i) ^ fps(j)) <= 2
    } yield (fps(i), fps(j))).toSet
    val got = pairs.select("phash_a", "phash_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute,
      s"banding missed ${(brute -- got).size}, invented ${(got -- brute).size}")

    // pair metadata is consistent with the cluster report
    val byFp = clusters.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    pairs.collect().foreach { r =>
      assert(byFp(r.getAs[Long]("phash_a")) ==
        (r.getAs[Long]("n_media_a"), r.getAs[Long]("rep_a")))
      assert(byFp(r.getAs[Long]("phash_b")) ==
        (r.getAs[Long]("n_media_b"), r.getAs[Long]("rep_b")))
    }
    pairs.unpersist(); clusters.unpersist()
  }

  test("kmeans training conserves the corpus and bounds cohesion") {
    val cells = EmbeddingQueries.embKmeansTrain(spark, sf0001).collect()
    val n = QueryUtil.table(spark, sf0001, "embeddings").count()
    // every vector lands in exactly one surviving cell
    assert(cells.map(_.getAs[Long]("cnt")).sum == n)
    assert(cells.forall(_.getAs[Long]("cnt") > 0))
    // cohesion is a sum of ppm cosines: per-cell it can never exceed
    // cnt (perfect alignment) nor fall below -cnt
    cells.foreach { c =>
      val cnt = c.getAs[Long]("cnt")
      val coh = c.getAs[Long]("cohesion_ppm")
      assert(coh <= cnt * 1000000L && coh >= -cnt * 1000000L)
    }
    // the trained model is a real clustering, not one megacell
    assert(cells.length > 1)
  }

  test("pca power iteration: corpus conserved, eigenvalue within trace") {
    val rows = EmbeddingQueries.embPcaPower(spark, sf0001).collect()
    val n = QueryUtil.table(spark, sf0001, "embeddings").count()
    assert(rows.map(_.getAs[Long]("n")).sum == n)
    // one Rayleigh estimate, shared by every label row
    val lambdas = rows.map(_.getAs[Long]("lambda_milli")).distinct
    assert(lambdas.length == 1)
    // 0 < R(v) <= trace(A): the Rayleigh quotient of ANY vector is
    // bounded by the largest eigenvalue, itself at most the trace
    val trace = EmbeddingQueries.embCovariance(spark, sf0001)
      .where(col("i") === col("j"))
      .agg(sum(col("cov_milli"))).collect().head.getLong(0)
    assert(lambdas.head > 0 && lambdas.head <= trace,
      s"lambda ${lambdas.head} outside (0, trace=$trace]")
  }

  test("per-source quantile normalization is a true within-source CDF") {
    val rows = PipelineQueries.pipelineQuantileNorm(spark, sf0001)
      .collect()
    val n = QueryUtil.table(spark, sf0001, "documents").count()
    assert(rows.length == n) // every document is normalized
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, docs) =>
      // percentiles live in [0, 1e6) and are monotone in the score
      docs.foreach { d =>
        val p = d.getAs[Long]("pct_ppm")
        assert(p >= 0L && p < 1000000L, s"$src: pct $p out of range")
      }
      val bySorted = docs.sortBy(_.getAs[Long]("n_chars"))
      bySorted.sliding(2).foreach { w =>
        if (w.length == 2)
          assert(w(0).getAs[Long]("pct_ppm") <= w(1).getAs[Long]("pct_ppm"),
            s"$src: percentile not monotone in n_chars")
      }
      // the shortest docs of a source sit at percentile zero
      assert(bySorted.head.getAs[Long]("pct_ppm") == 0L)
    }
  }

  test("referential profile proves the star schema's FK edges hold") {
    val rows = LakehouseQueries.dqReferential(spark, sf0001).collect()
      .map(r => r.getAs[String]("key_family") -> r).toMap
    assert(rows.keySet == Set("lineitem.l_partkey", "lineitem.l_suppkey",
      "lineitem.l_orderkey", "orders.o_custkey"))
    rows.values.foreach { r =>
      // TPC-H-shaped data: zero orphans, and the query PROVES it
      assert(r.getAs[Long]("n_orphan_rows") == 0L &&
        r.getAs[Long]("n_orphan_keys") == 0L)
      assert(r.getAs[Long]("n_child_keys") <= r.getAs[Long]("n_child_rows"))
      val cov = r.getAs[Long]("parent_used_ppm")
      assert(cov > 0L && cov <= 1000000L)
    }
    // child row totals equal the fact tables
    val li = QueryUtil.table(spark, sf0001, "lineitem").count()
    val ord = QueryUtil.table(spark, sf0001, "orders").count()
    assert(rows("lineitem.l_partkey").getAs[Long]("n_child_rows") == li)
    assert(rows("orders.o_custkey").getAs[Long]("n_child_rows") == ord)
    // the order-edge coverage matches an independent distinct-count
    // recompute (this corpus HAS childless orders, so it's < 1e6 and
    // the ppm is doing real work)
    val usedOrders = QueryUtil.table(spark, sf0001, "lineitem")
      .select("l_orderkey").distinct().count()
    val wantPpm = math.floor(1e6 * usedOrders.toDouble / ord.toDouble).toLong
    assert(rows("lineitem.l_orderkey").getAs[Long]("parent_used_ppm")
      == wantPpm)
    assert(wantPpm < 1000000L)
  }

  test("prefix-filtered setsim join equals brute-force shingle Jaccard") {
    // scalar re-derivation of the shingle universe (md5Long % P on
    // 3-gram strings), then brute force over ALL doc pairs — the
    // prefix filter must find exactly the J >= 0.6 set: completeness
    // is the AllPairs THEOREM, checked literally here
    val P = graft.functions.CrossHash.P
    def shingles(text: String): Set[Long] = {
      val t = text.split(" ", -1)
      val grams = if (t.length >= 3) t.sliding(3).map(_.mkString(" ")).toSeq
        else Seq(text)
      grams.map { g =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(g.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(14)
        java.lang.Long.parseLong(hex, 16) % P
      }.toSet
    }
    val docs = QueryUtil.table(spark, sf0001, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> shingles(r.getString(1)))
    val brute = (for {
      i <- docs.indices; j <- (i + 1) until docs.length
      (ida, sa) = docs(i); (idb, sb) = docs(j)
      common = (sa & sb).size
      jac = math.floor(1e6 * common.toDouble /
        (sa.size + sb.size - common).toDouble).toLong
      if jac >= 600000L
    } yield (math.min(ida, idb), math.max(ida, idb)) -> jac).toMap
    val got = DedupQueries.dedupSetsimJoin(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Long]("jaccard_ppm")).toMap
    assert(got == brute,
      s"missed ${(brute.keySet -- got.keySet).size}, " +
        s"invented ${(got.keySet -- brute.keySet).size}")
    assert(got.nonEmpty) // the corpus really has near-dups to find
  }

  test("hash shuffle conserves the corpus and mixes sources") {
    val shards = PipelineQueries.pipelineShuffle(spark, sf0001).collect()
    val docs = QueryUtil.table(spark, sf0001, "documents")
    val n = docs.count()
    val nSources = docs.select("source").distinct().count()
    assert(shards.map(_.getAs[Long]("n_docs")).sum == n)
    shards.foreach { s =>
      val id = s.getAs[Long]("shard")
      assert(id >= 0L && id < 64L)
      assert(s.getAs[Long]("n_sources") >= 1L &&
        s.getAs[Long]("n_sources") <= nSources)
      val share = s.getAs[Long]("max_source_share_ppm")
      assert(share > 0L && share <= 1000000L)
    }
    // the shuffle actually decorrelates: no shard is single-source
    // unless it holds a handful of docs (tiny shards can collapse)
    shards.filter(_.getAs[Long]("n_docs") >= 8L).foreach { s =>
      assert(s.getAs[Long]("max_source_share_ppm") < 1000000L,
        s"shard ${s.getAs[Long]("shard")} is single-source")
    }
  }

  test("burstiness profile is consistent with the raw event log") {
    val rows = EventQueries.eventsBurstiness(spark, sf0001).collect()
    val ev = QueryUtil.table(spark, sf0001, "events")
    assert(rows.map(_.getAs[Long]("n_events")).sum == ev.count())
    assert(rows.length == ev.select("user_id").distinct().count())
    rows.foreach { r =>
      val n = r.getAs[Long]("n_events")
      val span = r.getAs[Long]("span_s")
      val burst = r.getAs[Long]("min_burst10_s")
      assert(span >= 0L)
      assert(r.getAs[Long]("n_types") >= 1L)
      if (n < 10L) assert(burst == -1L)
      else {
        // any 10-event window is at least as fast as the full span and
        // can never be negative
        assert(burst >= 0L && burst <= span)
      }
    }
  }

  test("incremental dedup never pairs corpus docs with each other") {
    val pairs = DedupQueries.dedupIncremental(spark, sf0001).cache()
    assert(pairs.count() > 0) // the query proves something on this corpus
    // every pair has a delta doc on the new side — corpus×corpus work
    // is structurally impossible, which is the whole point
    assert(pairs.where(col("doc_new") % 17 =!= 0).count() == 0)
    // delta-vs-delta pairs are oriented (old < new) so none repeats;
    // corpus partners are never delta docs
    assert(pairs.where(col("vs") === "delta" &&
      (col("doc_old") % 17 =!= 0 || col("doc_old") >= col("doc_new")))
      .count() == 0)
    assert(pairs.where(col("vs") === "corpus" && col("doc_old") % 17 === 0)
      .count() == 0)
    // verification is a true Jaccard: bounded, and common ≤ union
    assert(pairs.where(col("jaccard_ppm") < 0 || col("jaccard_ppm") > 1000000
      || col("n_common") > col("n_union")).count() == 0)
    // agreement with the full pair search: every incremental pair that
    // a full LSH sweep would also emit carries the SAME jaccard
    val full = DedupQueries.dedupLshPairs(spark, sf0001)
      .select(least(col("doc_a"), col("doc_b")).as("lo"),
        greatest(col("doc_a"), col("doc_b")).as("hi"),
        col("jaccard_ppm").as("full_j"))
    val joined = pairs.select(least(col("doc_new"), col("doc_old")).as("lo"),
        greatest(col("doc_new"), col("doc_old")).as("hi"), col("jaccard_ppm"))
      .join(full, Seq("lo", "hi"))
    assert(joined.where(col("jaccard_ppm") =!= col("full_j")).count() == 0)
    pairs.unpersist()
  }

  test("semantic dedup covers the corpus and keeps exactly the cell-first docs") {
    val sd = EmbeddingQueries.embSemanticDedup(spark, sf0001).cache()
    val n = graft.core.Tables.load(spark, sf0001, "embeddings").count()
    // one verdict per corpus vector, no threshold-dependent row count
    assert(sd.count() == n)
    assert(sd.select("vec_id").distinct().count() == n)
    // flag/agg consistency: duplicate ⇔ an earlier mate exists
    assert(sd.where(col("is_duplicate") =!=
      (col("n_earlier_dups") > 0)).count() == 0)
    assert(sd.where(col("is_duplicate") && col("dup_of") >= col("vec_id"))
      .count() == 0)
    assert(sd.where(!col("is_duplicate") && col("dup_of") =!= col("vec_id"))
      .count() == 0)
    // the earliest vector of every cell can never be a duplicate
    val firsts = sd.groupBy(col("cell")).agg(min(col("vec_id")).as("vec_id"))
    assert(sd.join(firsts, Seq("cell", "vec_id"))
      .where(col("is_duplicate")).count() == 0)
    // dup_of points inside the same cell (comparisons are cell-local)
    val byId = sd.select(col("vec_id").as("dup_of"), col("cell").as("oc"))
    assert(sd.where(col("is_duplicate")).join(byId, "dup_of")
      .where(col("cell") =!= col("oc")).count() == 0)
    sd.unpersist()
  }

  test("normalized dedup collapses casing/punctuation twins, and only those") {
    import spark.implicits._
    val docs = Seq(
      (1L, "The quick brown fox."), // canonical of the norm-twin group
      (2L, "the  QUICK brown fox"), // casing + double space + no period
      (3L, "the quick brown fox!!"), // punctuation only
      (4L, "the quick brown fox"), // already normal — still the same group
      (5L, "a different document"), // unique
      (6L, "a different document"), // RAW duplicate of 5
      (7L, "thequickbrownfox")) // normalization must NOT merge this
      .toDF("doc_id", "text")
    val out = DedupQueries.dedupExactNormFrame(docs).cache()
    val byId = out.collect().map(r =>
      r.getLong(0) -> ((r.getLong(2), r.getBoolean(3), r.getBoolean(4)))).toMap
    // the four norm-twins share canonical 1; only 2..4 are duplicates
    assert(byId(1L) == ((1L, false, false)))
    for (id <- Seq(2L, 3L, 4L))
      assert(byId(id) == ((1L, true, true)), s"doc $id")
    // raw duplicates are duplicates here too, but NOT norm-only catches
    assert(byId(5L) == ((5L, false, false)))
    assert(byId(6L) == ((5L, true, false)))
    // no over-merge: token-joined text stays its own group
    assert(byId(7L) == ((7L, false, false)))
    // norm groups refine to a partition: every group's canonical is a
    // member with the minimum id
    assert(out.groupBy(col("norm_hash"))
      .agg(min(col("doc_id")).as("lo"), min(col("canonical_id")).as("c"))
      .where(col("lo") =!= col("c")).count() == 0)
    out.unpersist()
  }

  test("held-out ANN searches clear their recall floor vs brute force") {
    val brute = EmbeddingQueries.knnBruteHeldout(spark, sf0001).cache()
    val nQueries = brute.select("query_id").distinct().count()
    assert(nQueries == EmbeddingQueries.HeldoutQueries)

    // queries are DISJOINT from the searched corpus: a query id never
    // appears as a result id anywhere (it is held out of the index)
    val qids = brute.select(col("query_id").as("vec_id")).distinct()
    assert(brute.join(qids, "vec_id").count() == 0)

    def recall(approx: org.apache.spark.sql.DataFrame): Double = {
      val hits = approx.select("query_id", "vec_id")
        .join(brute.select("query_id", "vec_id"), Seq("query_id", "vec_id"))
        .count()
      hits.toDouble / brute.count()
    }
    // deterministic numbers (exact integer pipelines): observed 0.51
    // and 1.00 at sf0.001 — the floors leave margin without letting a
    // real regression (a broken probe or coder) through
    val rIvf = recall(EmbeddingQueries.knnIvfTrainedHeldout(spark, sf0001))
    assert(rIvf >= 0.4, s"trained-IVF held-out recall $rIvf < 0.4")
    val rSq8 = recall(EmbeddingQueries.knnSq8Heldout(spark, sf0001))
    assert(rSq8 >= 0.9, s"SQ8 held-out recall $rSq8 < 0.9")

    // every query gets a full top-k result from every search
    assert(brute.count() == nQueries * EmbeddingQueries.TopK)
    brute.unpersist()
  }

  test("IVF occupancy stats are an exact accounting of the index") {
    val row = EmbeddingQueries.knnIvfStats(spark, sf0001).collect().head
    val nCells = row.getAs[Long]("n_cells")
    val nOcc = row.getAs[Long]("n_occupied")
    val nVecs = row.getAs[Long]("n_vecs")
    val minOcc = row.getAs[Long]("min_occ")
    val maxOcc = row.getAs[Long]("max_occ")
    // every corpus vector sits in exactly one cell
    assert(nVecs == QueryUtil.table(spark, sf0001, "embeddings").count())
    // occupied cells are a subset of trained cells; n_empty balances
    assert(nOcc >= 1 && nOcc <= nCells)
    assert(row.getAs[Long]("n_empty") == nCells - nOcc)
    // occupancy extremes bracket the mean, so imbalance >= 1.0 exactly
    assert(minOcc >= 1 && minOcc <= maxOcc && maxOcc <= nVecs)
    assert(minOcc * nOcc <= nVecs && maxOcc * nOcc >= nVecs)
    assert(row.getAs[Long]("imbalance_ppm") >= 1000000L)
  }

  test("delta-indexed IVF search reaches delta vectors and holds recall") {
    val res = EmbeddingQueries.knnIvfDelta(spark, sf0001).cache()
    val brute = EmbeddingQueries.knnBruteForce(spark, sf0001)
      .select("query_id", "vec_id").cache()
    // the frozen-centroid index serves every query a full top-k
    val nq = res.select("query_id").distinct().count()
    assert(res.count() == nq * EmbeddingQueries.TopK)
    // delta vectors (md5 % 11 == 3) are REACHABLE: at least one shows
    // up across the result lists — they were indexed, not dropped
    import graft.functions.CrossHash
    val nDeltaHits = res.where(
      CrossHash.md5Long(col("vec_id").cast("string")) %
        EmbeddingQueries.DeltaMod === 3).count()
    assert(nDeltaHits > 0, "no delta vector in any result list")
    // recall vs exact brute force stays at the trained-IVF level
    // (deterministic pipeline: observed 0.43 at sf0.001)
    val hits = res.select("query_id", "vec_id")
      .join(brute, Seq("query_id", "vec_id")).count()
    val recall = hits.toDouble / brute.count()
    info(f"delta-IVF recall@10 = $recall%.2f")
    assert(recall >= 0.4, s"delta-IVF recall $recall < 0.4")
    res.unpersist(); brute.unpersist()
  }

  test("e2e funnel is monotone and composes the standalone primitives") {
    val f = PipelineQueries.pipelineE2e(spark, sf0001)
      .orderBy("stage").collect()
    assert(f.map(_.getString(1)).toSeq ==
      Seq("raw", "lang", "quality", "exact_dedup", "neardup_dedup"))
    // each stage keeps a subset of the previous (docs AND tokens)
    f.sliding(2).foreach { w =>
      assert(w(1).getAs[Long]("n_docs") <= w(0).getAs[Long]("n_docs"))
      assert(w(1).getAs[Long]("n_tokens") <= w(0).getAs[Long]("n_tokens"))
    }
    // stage 0 is the corpus; no stage is vacuously empty at sf0.001
    val nDocs = QueryUtil.table(spark, sf0001, "documents").count()
    assert(f(0).getAs[Long]("n_docs") == nDocs)
    assert(f.last.getAs[Long]("n_docs") > 0)
    // stage 1 agrees with the standalone langid query's 'en' verdicts —
    // the composition really runs the same classifier
    val en = TextQueries.textLangid(spark, sf0001)
      .where(col("pred_lang") === "en").count()
    assert(f(1).getAs[Long]("n_docs") == en)
  }

  test("shard plan conserves the corpus and balances within one document") {
    val docs = QueryUtil.table(spark, sf0001, "documents")
      .select(size(split(coalesce(col("text"), lit("")), " "))
        .cast("long").as("n_tok"))
      .agg(count(lit(1)).as("nd"), sum(col("n_tok")).as("nt"),
        max(col("n_tok")).as("mx")).collect().head
    val shards = PipelineQueries.pipelineShard(spark, sf0001).collect()
    // conservation: every document and token lands in exactly one shard
    assert(shards.map(_.getAs[Long]("n_docs")).sum == docs.getAs[Long]("nd"))
    assert(shards.map(_.getAs[Long]("n_tokens")).sum == docs.getAs[Long]("nt"))
    // shard ids are contiguous from zero (prefix positions are dense)
    assert(shards.map(_.getAs[Long]("shard_id")).sorted
      .sameElements(shards.indices.map(_.toLong)))
    // balance: every non-final shard holds 16384 tokens give or take
    // one straddling document (the whole-document placement slack)
    val slack = docs.getAs[Long]("mx") - 1
    shards.sortBy(_.getAs[Long]("shard_id")).dropRight(1).foreach { s =>
      val t = s.getAs[Long]("n_tokens")
      assert(t >= 16384L - slack && t <= 16384L + slack,
        s"shard ${s.getAs[Long]("shard_id")}: $t tokens vs target 16384±$slack")
    }
  }

  test("skew report totals and concentration bounds are exact") {
    val li = QueryUtil.table(spark, sf0001, "lineitem").count()
    val ord = QueryUtil.table(spark, sf0001, "orders").count()
    val rows = LakehouseQueries.dqSkewReport(spark, sf0001).collect()
      .map(r => r.getAs[String]("key_family") -> r).toMap
    assert(rows.keySet == Set("lineitem.l_suppkey", "lineitem.l_partkey",
      "orders.o_custkey"))
    rows.foreach { case (fam, r) =>
      val n = r.getAs[Long]("n_rows")
      assert(n == (if (fam.startsWith("lineitem")) li else ord))
      val k = r.getAs[Long]("n_keys")
      val mx = r.getAs[Long]("max_cnt")
      // the hottest key is at least the mean, so imbalance >= 1.0
      assert(mx * k >= n && r.getAs[Long]("imbalance_ppm") >= 1000000L)
      // top-10 concentration at least covers the hottest key, never
      // exceeds the whole table
      val maxSharePpm = math.floor(1e6 * mx.toDouble / n.toDouble).toLong
      assert(r.getAs[Long]("top10_share_ppm") >= maxSharePpm &&
        r.getAs[Long]("top10_share_ppm") <= 1000000L)
    }
  }
}

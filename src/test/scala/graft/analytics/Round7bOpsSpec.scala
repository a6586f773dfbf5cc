package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Semantic invariants for the round-7 continuation operators (the
  * oracle hash-compare proves engine agreement; these pin the
  * properties the numbers must have to MEAN what they claim).
  */
class Round7bOpsSpec extends SparkSuite {

  test("binary-quantized search clears a recall floor vs brute force") {
    // 1 bit/dim is the coarsest quantizer in the family; the exact
    // re-rank tail can only surface what Hamming candidates admit, so
    // recall against exact top-10 is the number that says the sign
    // codes carry signal at all
    val exact = EmbeddingQueries.knnBruteForce(spark, sf0001)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = EmbeddingQueries.knnBinary(spark, sf0001)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.3, s"binary-code recall $recall < 0.3")
  }

  test("MMR greedy picks the argmax of the MMR objective at every step") {
    // recompute the objective independently from the pool: for each
    // query, step t's pick must maximize rel − max-sim-to-selected
    // over the remaining candidates (ties to the smaller vec_id) —
    // a wrong join or a stale selected-set would break this for some
    // step even while both engines agree on the wrong answer
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .selectExpr("vec_id",
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 4096) AS LONG)) AS q")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    def ppmCos(a: Array[Long], b: Array[Long]): Long = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      val na = a.map(x => x * x).sum; val nb = b.map(x => x * x).sum
      math.floor(1e6 * d.toDouble / math.sqrt((na * nb).toDouble)).toLong
    }
    val out = EmbeddingQueries.knnMmr(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(1), r.getLong(3),
        r.getLong(4))) // (query, rnk, vec, rel, mmr)
    assert(out.length == 10 * EmbeddingQueries.MmrK)
    out.groupBy(_._1).foreach { case (qid, rows) =>
      val qv = e(qid)
      // rebuild the pool exactly as the query defines it
      val pool = e.toSeq.filter(_._1 != qid)
        .map { case (id, v) => (id, ppmCos(qv, v)) }
        .sortBy { case (id, s) => (-s, id) }.take(EmbeddingQueries.MmrPool)
      val rel = pool.toMap
      val steps = rows.sortBy(_._2)
      var selected = List.empty[Long]
      steps.foreach { case (_, rnk, vec, relOut, mmrOut) =>
        val best = pool.filterNot(p => selected.contains(p._1))
          .map { case (id, r) =>
            val ms = if (selected.isEmpty) 0L
              else selected.map(s => ppmCos(e(id), e(s))).max
            (id, r - ms, r)
          }.minBy { case (id, m, _) => (-m, id) }
        assert(vec == best._1, s"query $qid step $rnk picked $vec, " +
          s"greedy argmax is ${best._1}")
        assert(mmrOut == best._2 && relOut == best._3,
          s"query $qid step $rnk objective mismatch")
        selected ::= vec
      }
    }
  }

  test("MMR trades relevance for diversity against plain top-k") {
    // the whole point of the operator: within each query, the MMR
    // set's worst-case pairwise similarity is never WORSE (higher)
    // than plain top-MmrK's — and the sets differ somewhere on this
    // corpus (if they never differed the operator would be vacuous
    // here). Uses the same independent scorer as the greedy test.
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .selectExpr("vec_id",
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 4096) AS LONG)) AS q")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    def ppmCos(a: Array[Long], b: Array[Long]): Long = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      val na = a.map(x => x * x).sum; val nb = b.map(x => x * x).sum
      math.floor(1e6 * d.toDouble / math.sqrt((na * nb).toDouble)).toLong
    }
    def maxPairSim(ids: Seq[Long]): Long =
      ids.combinations(2).map { case Seq(a, b) => ppmCos(e(a), e(b)) }.max
    val mmr = EmbeddingQueries.knnMmr(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSeq).toMap
    val k = EmbeddingQueries.MmrK
    var differs = false
    mmr.foreach { case (qid, picked) =>
      val qv = e(qid)
      val topk = e.toSeq.filter(_._1 != qid)
        .map { case (id, v) => (id, ppmCos(qv, v)) }
        .sortBy { case (id, s) => (-s, id) }.take(k).map(_._1)
      assert(maxPairSim(picked) <= maxPairSim(topk),
        s"query $qid: MMR set is LESS diverse than plain top-$k")
      if (picked.toSet != topk.toSet) differs = true
    }
    assert(differs, "MMR never diverged from plain top-k (vacuous)")
  }

  test("nprobe curve is monotone and its NProbe point reproduces knn_ivf") {
    // recall is |exactTop ∩ pool| by the dominance argument (any exact
    // top-k member beats every non-member, so all admitted members
    // rank inside the pool's top-k): a larger probe can never lose a
    // hit. scanned is a superset count. And the curve's p = NProbe
    // point must admit exactly the candidate set knn_ivf searches, so
    // its top-k ids must equal the production search's output —
    // otherwise the curve is advising on a different index
    val curve = EmbeddingQueries.knnNprobeCurve(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(curve.map(_._1).toSeq == EmbeddingQueries.NprobeCurve.map(_.toLong))
    curve.sliding(2).foreach {
      case Array(lo, hi) =>
        assert(lo._2 <= hi._2, s"recall not monotone: $lo -> $hi")
        assert(lo._3 <= hi._3, s"scan cost not monotone: $lo -> $hi")
      case _ =>
    }
    assert(curve.last._2 > curve.head._2 || curve.head._2 == 1000000L,
      "curve is flat below full recall (vacuous probe sweep)")
    // p = NProbe cross-check against the production IVF search
    val ivf = EmbeddingQueries.knnIvf(spark, sf0001)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = EmbeddingQueries.knnBruteForce(spark, sf0001)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val atNprobe = curve.find(_._1 == EmbeddingQueries.NProbe.toLong).get
    val ivfRecallPpm =
      math.floor(1e6 * (ivf intersect exact).size.toDouble / exact.size).toLong
    assert(atNprobe._2 == ivfRecallPpm,
      s"curve recall ${atNprobe._2} != knn_ivf's realized $ivfRecallPpm")
  }

  test("source matrix pair mass re-adds to the setsim join exactly") {
    // the matrix is a rollup OF the pair join; if total n_pairs
    // drifts from the join's row count, a source lookup dropped or
    // duplicated pairs (e.g. a doc_id miss silently inner-joined away)
    val nPairs = DedupQueries.dedupSetsimJoin(spark, sf0001).count()
    assert(nPairs > 0, "no near-dup pairs at sf0.001 (vacuous)")
    val m = DedupQueries.dedupSourceMatrix(spark, sf0001)
      .agg(sum(col("n_pairs"))).collect()(0).getLong(0)
    assert(m == nPairs, s"matrix pair mass $m != join pairs $nPairs")
    // side alignment: recompute each cell's per-side distinct-doc counts
    // from the raw pairs — n_docs_a must count ONLY source_a docs
    // (both engines shared the original swap defect, so the oracle
    // alone cannot pin this)
    val srcOf = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = DedupQueries.dedupSetsimJoin(spark, sf0001)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expect = pairs.map { case (a, b) =>
      val (sa, sb) = (srcOf(a), srcOf(b))
      if (sa <= sb) ((sa, sb), (a, b)) else ((sb, sa), (b, a))
    }.groupBy(_._1).map { case (k, v) =>
      k -> (v.map(_._2._1).distinct.size.toLong,
        v.map(_._2._2).distinct.size.toLong)
    }
    val cells = DedupQueries.dedupSourceMatrix(spark, sf0001).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(3), r.getLong(4)))).toMap
    assert(cells.keySet == expect.keySet)
    expect.foreach { case (k, v) =>
      assert(cells(k) == v, s"cell $k side counts ${cells(k)} != $v")
    }
  }

  test("epoch plan conserves the budget and scales with source size") {
    val rows = PipelineQueries.pipelineEpochPlan(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6)))
    // (source, tokens, weight, share_ppm, alloc, epochs_milli)
    val totTokens = rows.map(_._2).sum
    val budget = totTokens * PipelineQueries.EpochBudgetX
    val alloc = rows.map(_._5).sum
    // each floor loses < 1 token; the sum can't lose more than one
    // per source and can never overshoot
    assert(alloc <= budget, s"allocated $alloc > budget $budget")
    assert(budget - alloc < rows.length,
      s"floor loss ${budget - alloc} >= ${rows.length} sources")
    val shareSum = rows.map(_._4).sum
    assert(shareSum <= 1000000L && 1000000L - shareSum < rows.length)
    // τ=½ weights: allocation must be monotone in weight, and the
    // epoch count must be the exact milli ratio of alloc to tokens
    rows.sortBy(_._3).sliding(2).foreach {
      case Array(lo, hi) =>
        assert(lo._5 <= hi._5, s"alloc not monotone: $lo vs $hi")
      case _ =>
    }
    rows.foreach { case (s, toks, _, _, a, em) =>
      val expect = (a / toks) * 1000 + ((a % toks) * 1000) / toks
      assert(em == expect, s"$s epochs_milli $em != $expect")
    }
  }

  test("filtered-search eval matches a from-scratch recomputation") {
    // rebuild the whole report in plain collections: exact prefilter
    // truth, the top-PqRerank-then-filter shortcut, selectivity, and
    // recall — every column must agree (the pre/post windows share a
    // frame in the query, so a window-ordering slip would poison both
    // engines identically and pass the oracle)
    val rows = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .selectExpr("vec_id", "label",
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 4096) AS LONG)) AS q")
      .collect().map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Long](2).toArray))
    val vecs = rows.map(r => r._1 -> r._3).toMap
    val labels = rows.map(r => r._1 -> r._2).toMap
    def ppmCos(a: Array[Long], b: Array[Long]): Long = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      val na = a.map(x => x * x).sum; val nb = b.map(x => x * x).sum
      math.floor(1e6 * d.toDouble / math.sqrt((na * nb).toDouble)).toLong
    }
    val got = EmbeddingQueries.knnFilteredEval(spark, sf0001).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    val k = EmbeddingQueries.TopK
    (0L until 10L).foreach { qid =>
      val qv = vecs(qid); val ql = labels(qid)
      val scored = rows.filter(_._1 != qid)
        .map { case (id, lb, v) => (id, lb, ppmCos(qv, v)) }
        .sortBy { case (id, _, s) => (-s, id) }
      val pre = scored.filter(_._2 == ql).take(k).map(_._1).toSet
      val post = scored.take(EmbeddingQueries.PqRerank)
        .filter(_._2 == ql).take(k).map(_._1)
      val nMatching = scored.count(_._2 == ql).toLong
      val recall =
        math.floor(1e6 * post.count(pre).toDouble / k.toDouble).toLong
      assert(got(qid) == ((ql.toLong, nMatching, post.length.toLong,
        recall)), s"query $qid: got ${got(qid)}")
    }
    // the lesson must be visible on this corpus: at ~1/|labels|
    // selectivity, post-filtering leaves at least one query short
    assert(got.values.exists(_._3 < k.toLong),
      "post-filter never starved (vacuous at this selectivity)")
  }

  test("drift shares are ppm of the true parity-split totals") {
    // every vector assigns to exactly one frozen cell, so each side's
    // share denominator must be that side's TOTAL corpus half —
    // recomputed here from the raw table via the same md5 parity —
    // and drift must be the literal |new − old| of the shares, sorted
    import graft.functions.CrossHash
    val ids = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"),
        (CrossHash.md5Long(col("vec_id").cast("string")) % 2).as("p"))
      .collect().map(r => r.getLong(1))
    val (totNew, totOld) =
      (ids.count(_ == 1L).toLong, ids.count(_ == 0L).toLong)
    val rows = EmbeddingQueries.embDrift(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty && rows.length <= EmbeddingQueries.DriftTop)
    rows.foreach { case (cell, nOld, nNew, shOld, shNew, drift) =>
      assert(shOld ==
        math.floor(1e6 * nOld.toDouble / totOld.toDouble).toLong,
        s"cell $cell old share not ppm of the parity total $totOld")
      assert(shNew ==
        math.floor(1e6 * nNew.toDouble / totNew.toDouble).toLong,
        s"cell $cell new share not ppm of the parity total $totNew")
      assert(drift == math.abs(shNew - shOld), s"cell $cell drift")
    }
    assert(rows.map(_._6).toSeq == rows.map(_._6).sortBy(-_).toSeq,
      "rows must rank by drift")
    assert(rows.head._6 > 0L, "zero drift everywhere (vacuous split)")
  }

  test("dim curve is monotone with an exact full-dimension anchor") {
    // truncation can only lose information, so recall must not
    // decrease with dimensions, the d = 64 point IS the baseline
    // search (recall exactly 10⁶ — any drift means the curve and the
    // baseline diverged in scoring), and the curve must actually bend
    // on this corpus or the sweep is vacuous
    val curve = EmbeddingQueries.knnDimCurve(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(curve.map(_._1).toSeq == EmbeddingQueries.DimCurve.map(_.toLong))
    curve.sliding(2).foreach {
      case Array(lo, hi) =>
        assert(lo._2 <= hi._2, s"recall not monotone: $lo -> $hi")
      case _ =>
    }
    assert(curve.last._2 == 1000000L, s"full-dim anchor ${curve.last}")
    assert(curve.head._2 < 1000000L, "truncation curve is flat (vacuous)")
  }

  test("MRR report is the literal rank arithmetic of its searches") {
    // recompute one family end-to-end: the reported found_rank must
    // be exactly where the brute top-1 sits in the approximate
    // output, and rr_ppm its integer reciprocal — a join that lost or
    // duplicated a query would survive the oracle (both engines
    // sharing it) but not this
    val top1 = EmbeddingQueries.knnBruteHeldout(spark, sf0001)
      .where(col("rnk") === 1).select("query_id", "vec_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ivf = EmbeddingQueries.knnIvfTrainedHeldout(spark, sf0001)
      .select("query_id", "vec_id", "rnk").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val rep = EmbeddingQueries.knnMrrReport(spark, sf0001)
      .where(col("family") === "ivf_trained").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rep.map(_._1).toSet == top1.keySet, "one row per held-out query")
    rep.foreach { case (qid, trueTop, found, rr) =>
      assert(trueTop == top1(qid))
      val expect = ivf.getOrElse((qid, trueTop), 0L)
      assert(found == expect, s"query $qid found_rank $found != $expect")
      assert(rr == (if (found == 0L) 0L else 1000000L / found),
        s"query $qid rr_ppm $rr")
    }
    assert(rep.exists(_._4 > 0L), "IVF never found any true top-1 (vacuous)")
  }

  test("fertility rollup re-adds the per-document tokenizer counts") {
    val perDoc = TextQueries.textTokenBpe(spark, sf0001)
      .join(spark.read.parquet(s"$sf0001/documents.parquet")
        .select("doc_id", "source"), "doc_id")
      .groupBy(col("source"))
      .agg(sum(col("n_ws_tokens")).as("ws"),
        sum(col("n_bpe_pieces")).as("bp"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val rolled = TextQueries.textFertility(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(5)))
    assert(rolled.map(_._1).toSet == perDoc.keySet)
    rolled.foreach { case (src, ws, bp, fert) =>
      assert((ws, bp) == perDoc(src), s"$src sums drifted")
      assert(fert == math.floor(1e6 * bp.toDouble / ws.toDouble).toLong,
        s"$src fertility not the exact ppm of its own sums")
    }
  }

  test("perplexity filter drops a clean per-source score prefix") {
    // the decision is bucket-granular but buckets are score ranges,
    // so within a source every dropped document must score <= every
    // kept one, the cutoff must be the realized min kept score, and
    // whenever anything is kept the dropped mass reaches the decile
    // (the crossing bucket goes with the tail)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val scores = TextQueries.textLmScore(spark, sf0001)
      .select("doc_id", "mean_bigram_freq_x1e6").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bySource = docs.toSeq.map { case (id, src) =>
      (src, scores.getOrElse(id, 0L))
    }.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val out = PipelineQueries.pipelinePerplexityFilter(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.map(_._1).toSet == bySource.keySet)
    out.foreach { case (src, nDocs, nDropped, droppedPpm, cutoff) =>
      val all = bySource(src)
      assert(nDocs == all.size, s"$src doc count")
      assert(nDropped > 0, s"$src dropped nothing (vacuous)")
      // independent recomputation of the bucket rule: drop every doc
      // whose 2^18-wide score bucket has strictly-below mass < 10% —
      // the count AND the decile floor must match the query's output
      val byBkt = all.groupBy(s => math.min(s / 262144L, 255L))
      val expectDropped = byBkt.toSeq.map { case (b, ss) =>
        val below = all.count(s => math.min(s / 262144L, 255L) < b)
        if (math.floor(1e6 * below.toDouble / all.size).toLong < 100000L)
          ss.size else 0
      }.sum
      assert(nDropped == expectDropped,
        s"$src dropped $nDropped, bucket rule says $expectDropped")
      if (nDropped < nDocs) {
        assert(droppedPpm >= 100000L, s"$src under-dropped: $droppedPpm")
        assert(cutoff == all(nDropped.toInt),
          s"$src cutoff $cutoff != realized min kept ${all(nDropped.toInt)}")
      } else assert(cutoff == -1L, s"$src kept nothing but cutoff $cutoff")
    }
  }

  test("freshness lag is zero exactly at the high-water stream") {
    val rows = LakehouseQueries.dqFreshness(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    // (event_type, n_events, max_ts_us, lag_s, n_recent_24h, stale)
    val gmax = rows.map(_._3).max
    rows.foreach { case (t, n, mx, lag, recent, stale) =>
      assert(lag == (gmax - mx) / 1000000L, s"$t lag wrong")
      // NOT iff: a stream trailing by < 1 s also floors to lag 0
      if (mx == gmax) assert(lag == 0L, s"$t at high water but lag $lag")
      assert(recent <= n, s"$t recent $recent > total $n")
      assert(stale == (lag > 3600L), s"$t stale flag wrong")
    }
    assert(rows.exists(_._4 == 0L), "some stream must sit at the high water")
  }
}

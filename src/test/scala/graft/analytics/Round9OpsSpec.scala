package graft.analytics

import graft.SparkSuite

/** Round-9 operator pins (cross-engine equality lives in the DuckDB
  * oracle gate; these pin the semantic claims the oracle can't see).
  */
class Round9OpsSpec extends SparkSuite {

  test("graph-ANN beam search fills its beam and clears a recall floor") {
    val rows = EmbeddingQueries.knnGraphSearch(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(rows.nonEmpty, "no held-out queries — vacuous")
    // the beam always fills: GsBeam candidates exist within 3 hops of
    // the seeds on any connected-enough K-NN graph of this corpus
    assert(rows.forall(_._2 == EmbeddingQueries.NndK.toLong),
      s"unfilled beams: ${rows.filter(_._2 != EmbeddingQueries.NndK.toLong)}")
    // every query finds at least one TRUE neighbor — the walk is a
    // search, not a random sample (random would find K/n ≈ 1.6% here)
    assert(rows.forall(_._3 >= 1L), s"zero-hit queries: ${rows.filter(_._3 == 0L)}")
    // mean recall floor: well above random, in line with the graph's
    // own recall (knn_graph_nnd) on this unstructured corpus
    val meanRecall = rows.map(_._4).sum / rows.length
    assert(meanRecall >= 200000L, s"mean recall_ppm $meanRecall < 0.2")
  }

  test("classifier AUC equals the definitional all-pairs Mann-Whitney") {
    // brute-force the statistic from the query's own scored input:
    // every (pos, neg) pair within a lang, concordant iff the positive
    // outscores the negative, ties at half weight — the definition the
    // windowed per-score-level rewrite must reproduce exactly
    val docs = PipelineQueries.classifierAucScored(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = docs.groupBy(_._1).map { case (lang, rows) =>
      val pos = rows.filter(_._3 == 1L).map(_._2)
      val neg = rows.filter(_._3 == 0L).map(_._2)
      val conc = pos.iterator.map(p => neg.count(_ < p).toLong).sum
      val tied = pos.iterator.map(p => neg.count(_ == p).toLong).sum
      lang -> (pos.length.toLong, neg.length.toLong, conc, tied)
    }
    val got = PipelineQueries.pipelineClassifierAuc(spark, sf0001)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5))).toMap
    assert(got.keySet == expect.keySet)
    for ((lang, e) <- expect) assert(got(lang) == e,
      s"$lang: query ${got(lang)} != brute-force $e")
    // both classes must be populated or the audit is vacuous
    assert(expect.values.forall(v => v._1 > 0 && v._2 > 0),
      "a lang has an empty class — threshold no longer splits")
  }

  test("calibration buckets partition docs in score order, levels unsplit") {
    val b = PipelineQueries.pipelineClassifierCalibration(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(b.length > 1 && b.length <= 10, s"${b.length} buckets")
    // contiguous in score: each bucket's range ends before the next
    // begins (score levels are whole — no level straddles a boundary)
    for (Array(lo, hi) <- b.sliding(2))
      assert(lo._3 < hi._2, s"overlap: $lo vs $hi")
    // the buckets partition the scored docs exactly
    val nDocs = PipelineQueries.classifierAucScored(spark, sf0001).count()
    assert(b.map(_._4).sum == nDocs)
    // decile targeting: no bucket exceeds 1/10 of docs by more than
    // one whole score level can force (trivially bounded by 2 deciles
    // here since fixture score levels are near-distinct)
    assert(b.map(_._4).max <= nDocs / 10 * 2 + 2,
      s"bucket sizes ${b.map(_._4).toSeq} vs n=$nDocs")
  }

  test("vocab growth slices account for every doc, token, and term") {
    import org.apache.spark.sql.functions._
    val rows = TextQueries.textVocabGrowth(spark, sf0001).collect()
    val docs = QueryUtil.table(spark, sf0001, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val (nDocs, nToks, nVocab) = (
      docs.select(countDistinct(col("doc_id"))).head.getLong(0),
      docs.count(),
      docs.select(countDistinct(col("term"))).head.getLong(0))
    val last = rows.last
    // cumulative columns must close the books exactly: every doc,
    // token, and distinct term lands in exactly one slice
    assert(last.getAs[Long]("cum_docs") == nDocs)
    assert(last.getAs[Long]("cum_tokens") == nToks)
    assert(last.getAs[Long]("cum_vocab") == nVocab)
    // first-seen semantics: the first slice contributes all its own
    // vocabulary as new (nothing can precede it)
    assert(rows.head.getAs[Long]("new_terms") > 0)
    // cumulatives are monotone
    val cv = rows.map(_.getAs[Long]("cum_vocab"))
    assert(cv.zip(cv.tail).forall { case (a, b2) => a <= b2 })
  }
}

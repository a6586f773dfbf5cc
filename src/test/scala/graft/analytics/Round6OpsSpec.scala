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
}

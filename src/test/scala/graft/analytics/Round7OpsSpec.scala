package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Semantic invariants for the round-7 operators (the oracle
  * hash-compare proves engine agreement; these pin the properties the
  * numbers must have to MEAN what they claim).
  */
class Round7OpsSpec extends SparkSuite {

  test("materialized release equals the funnel's stage-4 totals") {
    // pipeline_e2e reports the funnel; pipeline_e2e_materialized
    // ships the survivors through the manifest sink. If the release
    // buckets don't re-add to stage 4's (n_docs, n_tokens) exactly,
    // the sink lost or duplicated documents between report and release
    val funnel = PipelineQueries.pipelineE2e(spark, sf0001)
      .where(col("stage") === 4L).collect()
    assert(funnel.length == 1)
    val (nDocs, nToks) = (funnel(0).getLong(2), funnel(0).getLong(3))
    val release = PipelineQueries
      .pipelineE2eMaterialized(spark, sf0001)
      .agg(sum(col("n_docs")), sum(col("n_tokens")))
      .collect()(0)
    assert(release.getLong(0) == nDocs,
      s"release docs ${release.getLong(0)} != funnel stage-4 $nDocs")
    assert(release.getLong(1) == nToks,
      s"release tokens ${release.getLong(1)} != funnel stage-4 $nToks")
  }

  test("context chunks tile every document with the exact overlap") {
    // the zero-shuffle chunker must COVER each document: starts
    // advance by exactly the stride, every token lands in >=1 chunk,
    // and the final chunk ends exactly at the document's last token —
    // a truncating chunker (lost tail) or an off-by-one stride would
    // pass the oracle only if both engines shared the bug; this pins
    // the geometry independently
    val w = PipelineQueries.CtxWindow.toLong
    val s = PipelineQueries.CtxStride.toLong
    val chunks = PipelineQueries.pipelineContextChunk(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val nToks = spark.read.parquet(s"$sf0001/documents.parquet")
      .selectExpr("doc_id", "CAST(size(split(text, ' ')) AS LONG) AS n")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(chunks.keySet == nToks.keySet, "every document must chunk")
    chunks.foreach { case (doc, cs) =>
      val n = nToks(doc)
      val sorted = cs.sortBy(_._2)
      // chunk ids are 0..k-1, the expected count for this length
      val expected = if (n <= w) 1L else (n - w + s - 1) / s + 1
      assert(sorted.map(_._2).toSeq == (0L until expected),
        s"doc $doc chunk ids: ${sorted.map(_._2).toSeq}")
      sorted.foreach { case (_, ci, len) =>
        assert(len == math.min(w, n - ci * s) && len >= 1,
          s"doc $doc chunk $ci len $len (n=$n)")
      }
      // coverage: the last chunk ends exactly at token n
      val (_, lastCi, lastLen) = sorted.last
      assert(lastCi * s + lastLen == n, s"doc $doc tail lost")
    }
  }

  test("ewma output equals an independent fold of the daily series") {
    // the driver fold is re-run here from the day aggregate with an
    // independently written BigInt recurrence (dense fill included),
    // the same re-derivation style as the k-core peel cross-check
    val got = EventQueries.eventsEwma(spark, sf0001).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // raw parquet read; floor-dividing unix micros is a genuinely
    // independent derivation of the epoch day (QueryUtil.epochDay
    // goes through a calendar datediff on a DATE cast instead — a
    // timezone bug in the date path would NOT cancel out here; the
    // session timezone is UTC so the two agree by construction)
    val daily = spark.read
      .parquet(s"$sf0001/events.parquet")
      .select(expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000")
        .as("day"))
      .groupBy("day").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val d0 = daily.keys.min
    val d1 = daily.keys.max
    assert(got.size == (d1 - d0 + 1), "output must be the dense span")
    var s = BigInt(daily(d0)) * 8
    assert(got(d0) == ((daily(d0), s.toLong, (s / 8).toLong)))
    ((d0 + 1) to d1).foreach { day =>
      val n = daily.getOrElse(day, 0L)
      s = (s * 7) / 8 + BigInt(n) * 8
      assert(got(day) == ((n, s.toLong, (s / 8).toLong)),
        s"recurrence diverges at day $day")
    }
  }
}

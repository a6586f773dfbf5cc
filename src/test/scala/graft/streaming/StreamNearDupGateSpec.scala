package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSuite
import graft.analytics.DedupQueries

/** [[StreamNearDupGate]] — the stateless vet-on-arrival LSH gate.
  * Pins (1) exact agreement with the oracle-gated batch
  * `dedup_incremental` delta-vs-corpus pass over the synthetic corpus
  * (same shingles, same band keys, same Jaccard — the two derivations
  * cannot drift), (2) per-document coverage (clean docs emit their
  * pass-through row), and (3) verdict semantics on a constructed
  * fixture where the outcome is known by hand.
  */
class StreamNearDupGateSpec extends SparkSuite {

  test("streamed delta docs equal the batch dedup_incremental corpus rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read
      .parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val corpus = docs.where(col("doc_id") % 17 =!= 0)
    val delta = docs.where(col("doc_id") % 17 === 0)
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
    assert(delta.size >= 2, "fixture needs a multi-batch delta")

    val (buckets, shingles) = StreamNearDupGate.corpusIndex(corpus)
    val bucketsC = buckets.localCheckpoint(true)
    val shinglesC = shingles.localCheckpoint(true)

    val ms = MemoryStream[(Long, String)]
    val gated = StreamNearDupGate(
      ms.toDS().toDF("doc_id", "text"), bucketsC, shinglesC)
    val q = gated.writeStream.format("memory").queryName("neardup_gate")
      .outputMode("append").start()
    try {
      val (b1, b2) = delta.splitAt(delta.size / 2)
      ms.addData(b1: _*)
      q.processAllAvailable()
      ms.addData(b2: _*)
      q.processAllAvailable()

      val out = spark.table("neardup_gate")
      // every arriving doc emits at least its pass-through row
      val seen = out.select(col("doc_new")).as[Long].collect().toSet
      assert(seen == delta.map(_._1).toSet)

      val got = out.where(col("doc_old").isNotNull)
        .select(col("doc_new"), col("doc_old"), col("n_common"),
          col("n_union"), col("jaccard_ppm"))
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      val want = DedupQueries.dedupIncremental(spark, sf0001)
        .where(col("vs") === "corpus")
        .select(col("doc_new"), col("doc_old"), col("n_common"),
          col("n_union"), col("jaccard_ppm"))
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(want.nonEmpty, "vacuous fixture: no corpus collisions at sf0.001")
      assert(got == want)
    } finally q.stop()
    spark.catalog.clearCache()
  }

  test("published-index gate replays the timeline to the batch verdicts") {
    // the gate reading the PUBLISHED nightly tables (SessionArtifact
    // manifest seam) must give verdicts identical to the batch
    // artifact consumers' on the same corpus: replay the delta in two
    // micro-batches against publishedIndex and compare against the
    // oracle-gated dedup_incremental corpus rows — one source of truth
    // for the frozen base side, streaming and nightly
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val delta = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text"))
      .where(col("doc_id") % 17 === 0)
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
    val (buckets, shingles) = StreamNearDupGate.publishedIndex(spark, sf0001)
    val ms = MemoryStream[(Long, String)]
    val gated = StreamNearDupGate(
      ms.toDS().toDF("doc_id", "text"), buckets, shingles)
    val q = gated.writeStream.format("memory").queryName("neardup_pub")
      .outputMode("append").start()
    try {
      val (b1, b2) = delta.splitAt(delta.size / 2)
      ms.addData(b1: _*); q.processAllAvailable()
      ms.addData(b2: _*); q.processAllAvailable()
      val out = spark.table("neardup_pub")
      assert(out.select(col("doc_new")).as[Long].collect().toSet ==
        delta.map(_._1).toSet)
      val got = out.where(col("doc_old").isNotNull)
        .select(col("doc_new"), col("doc_old"), col("n_common"),
          col("n_union"), col("jaccard_ppm"), col("keep"))
        .as[(Long, Long, Long, Long, Long, Boolean)].collect().toSet
      val want = DedupQueries.dedupIncremental(spark, sf0001)
        .where(col("vs") === "corpus")
        .select(col("doc_new"), col("doc_old"), col("n_common"),
          col("n_union"), col("jaccard_ppm"),
          (col("jaccard_ppm") < 600000L).as("keep"))
        .as[(Long, Long, Long, Long, Long, Boolean)].collect().toSet
      assert(want.nonEmpty, "vacuous fixture: no corpus collisions")
      assert(got == want)
      // a "restarted" session (cleared slots) REUSES the published
      // index: resolving again adds no snapshot to either table
      def snaps(): Seq[Int] = {
        val wh = spark.conf.get("spark.sql.warehouse.dir")
        val whPath = new org.apache.hadoop.fs.Path(wh).toUri.getPath
        val tag = graft.core.DatasetFingerprint.codeTag
        val fp = graft.core.DatasetFingerprint.of(sf0001)
        Seq("gate_lsh_buckets", "gate_lsh_shingles").map(n =>
          graft.sources.ManifestV2Sink.versions(
            s"$whPath/graft_art_${tag}_${fp}_$n").size)
      }
      val before = snaps()
      assert(before.forall(_ >= 1), s"index not published: $before")
      graft.analytics.SessionArtifact.resetSlotsForTest()
      StreamNearDupGate.publishedIndex(spark, sf0001)
      assert(snaps() == before, "re-resolve republished instead of reusing")
    } finally q.stop()
    spark.catalog.clearCache()
  }

  test("planted duplicate is flagged, clean doc passes, replay self-flags") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // corpus docs share NO tokens with each other, so the only LSH
    // collisions possible are the ones the test plants
    val t1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val t2 = "red orange yellow green blue indigo violet crimson amber teal"
    val t3 = "monday tuesday wednesday thursday friday saturday sunday dawn dusk noon"
    val corpus = Seq((1L, t1), (2L, t2), (3L, t3))
      .toDF("doc_id", "text")
    val (buckets, shingles) = StreamNearDupGate.corpusIndex(corpus)

    val ms = MemoryStream[(Long, String)]
    val gated = StreamNearDupGate(
      ms.toDS().toDF("doc_id", "text"), buckets, shingles)
    val q = gated.writeStream.format("memory").queryName("neardup_fixture")
      .outputMode("append").start()
    try {
      ms.addData(
        (100L, t1), // verbatim copy of corpus doc 1
        (101L, "completely different content nothing shared here at all " +
          "zebra quantum raspberry telescope"),
        (2L, t2)) // replayed corpus member
      q.processAllAvailable()
      val rows = spark.table("neardup_fixture")
        .select(col("doc_new"), col("doc_old"), col("jaccard_ppm"),
          col("keep"))
        .collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2), r.getBoolean(3)))
        .toSet
      // copy: exact-match pair with corpus doc 1, flagged
      assert(rows.contains((100L, 1L, 1000000L, false)))
      // clean doc: pass-through row, kept
      assert(rows.contains((101L, -1L, -1L, true)))
      // replayed member: self-pair, flagged
      assert(rows.contains((2L, 2L, 1000000L, false)))
      // the copy collides ONLY with doc 1 (salts differ elsewhere)
      assert(rows.collect { case (100L, old, _, _) => old } == Set(1L))
      // the gate is STATELESS by construction: pure stream-static
      // joins, no aggregation — the engine must report zero state
      // operators (state growth here would be a scale leak)
      assert(q.lastProgress.stateOperators.isEmpty,
        "near-dup gate must not hold streaming state")
    } finally q.stop()
  }
}

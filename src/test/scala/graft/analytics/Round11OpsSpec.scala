package graft.analytics

import graft.SparkSuite

/** Round-11 operator pins (cross-engine equality lives in the DuckDB
  * oracle gate; these pin the semantic claims the oracle can't see).
  */
class Round11OpsSpec extends SparkSuite {

  private def h56(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(14)
    java.lang.Long.parseLong(hex, 16)
  }

  test("DSIR weights match an independent plain-Scala refold") {
    // definitional reimplementation: tokenize -> bigram -> hash-bucket
    // -> smoothed target share per bucket -> count-weighted doc mean
    // -> per-source rollup with the global-share selection rule
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "source", "lang", "text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3)))
    val grams = docs.toSeq.flatMap { case (id, src, lang, text) =>
      val ts = text.split(" ", -1)
      if (ts.length < 2) Seq.empty
      else ts.sliding(2).map(w =>
        (id, src, lang, h56(w.mkString(" ")) % 256)).toSeq
    }
    assert(grams.nonEmpty, "no bigrams at sf0.001 — vacuous")
    val byBucket = grams.groupBy(_._4).map { case (b, g) =>
      b -> ((1000000L * (g.count(_._3 == "en") + 1)) / (g.size + 2))
    }
    val weights = grams.groupBy(g => (g._1, g._2)).map { case ((id, src), g) =>
      val perB = g.groupBy(_._4).view.mapValues(_.size.toLong)
      val num = perB.map { case (b, c) => c * byBucket(b) }.sum
      (id, src, num / perB.values.sum)
    }
    val gshare =
      (1000000L * (grams.count(_._3 == "en") + 1)) / (grams.size + 2)
    val expect = weights.groupBy(_._2).map { case (src, ws) =>
      (src, ws.size.toLong, ws.map(_._3).sum,
        ws.count(_._3 >= gshare).toLong, gshare)
    }.toSet
    val got = PipelineQueries.pipelineDsirWeights(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == expect)
    // selection is non-vacuous in both directions: some docs beat the
    // global share, some do not (else the gate filters nothing)
    val (sel, tot) = (got.toSeq.map(_._4).sum, got.toSeq.map(_._2).sum)
    assert(sel > 0 && sel < tot,
      s"selection vacuous: $sel of $tot selected")
  }

  test("DSIR bucket-score join broadcasts; no corpus-keyed SMJ") {
    val plan = PipelineQueries.pipelineDsirWeights(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      "the 256-row score table must broadcast, never shuffle the corpus")
  }

  test("Vamana prune removes edges, keeps rank-1, and an independent " +
    "greedy refold agrees") {
    val pruned = EmbeddingQueries.prunedGraph(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(pruned.nonEmpty)
    val byV = pruned.groupBy(_._1)
    // rank-1 (the nearest neighbor) is unconditionally kept
    assert(byV.values.forall(_.exists(_._4 == 1L)),
      "a vertex lost its rank-1 edge — the greedy must seed with it")
    // non-vacuous in both directions at α=1 on this corpus
    val n = byV.size.toLong
    val after = pruned.length.toLong
    assert(after < n * EmbeddingQueries.NndK,
      "pruning removed nothing — vacuous")
    assert(after > n, "pruning collapsed everything to rank-1 only")
    // independent greedy refold over the same candidate lists: rebuild
    // the kept set per vertex from raw vectors and exact int distances
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)
        .map(x => math.floor(x.toDouble * EmbeddingQueries.Scale).toLong)
        .toArray)
      .toMap
    def d2(a: Array[Long], b: Array[Long]): Long = {
      var i = 0; var na = 0L; var nb = 0L; var dt = 0L
      while (i < a.length) {
        na += a(i) * a(i); nb += b(i) * b(i); dt += a(i) * b(i); i += 1
      }
      na + nb - 2 * dt
    }
    // the same deterministic construction prunedGraph reads through
    // the artifact seam — rebuilt here so the refold is independent
    // of the published table
    val graph = EmbeddingQueries
      .nndGraph(spark, sf0001, EmbeddingQueries.NndRounds)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    graph.groupBy(_._1).foreach { case (v, edges) =>
      val ordered = edges.sortBy(t => (t._3, t._2))
      val kept = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      ordered.foreach { case (_, u, dvu) =>
        val occluded = kept.exists { case (w, _) =>
          d2(e(w), e(u)) <= dvu
        }
        if (!occluded) kept += ((u, dvu))
      }
      val got = byV(v).sortBy(_._4).map(_._2).toSeq
      assert(got == kept.map(_._1).toSeq, s"vertex $v kept-set mismatch")
    }
  }

  test("beam search over the pruned graph retains most of the " +
    "unpruned search's recall") {
    val base = EmbeddingQueries.knnGraphSearch(spark, sf0001)
      .select("query_id", "recall_ppm").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val prunedG = EmbeddingQueries.prunedGraph(spark, sf0001)
      .select("v", "u", "d")
    val pr = EmbeddingQueries.searchOver(spark, sf0001, prunedG)
      .select("query_id", "recall_ppm").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr.keySet == base.keySet)
    val (bm, pm) = (base.values.sum / base.size, pr.values.sum / pr.size)
    // pruned graph keeps >= 60% of the unpruned mean recall — the
    // diverse-edge tradeoff, not a collapse
    assert(pm * 10 >= bm * 6, s"pruned search collapsed: $pm vs $bm")
  }

  test("TextRank scores match an independent plain-Scala power " +
    "iteration") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getString(1).split(" ", -1).toSeq)
    // co-occurrence edges, window <= 2, undirected corpus counts
    val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
    docs.foreach { ts =>
      for (i <- ts.indices; off <- 1 to TextQueries.TextrankWindow) {
        val j = i + off
        if (j < ts.length && ts(i) != ts(j)) {
          val k = if (ts(i) < ts(j)) (ts(i), ts(j)) else (ts(j), ts(i))
          pairCounts(k) = pairCounts.getOrElse(k, 0L) + 1L
        }
      }
    }
    val sym = pairCounts.toSeq.flatMap { case ((u, v), w) =>
      Seq((u, v, w), (v, u, w))
    }
    val wtot = sym.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val verts = sym.map(_._1).distinct.sorted
    var s = verts.map(_ -> 1000000L).toMap
    for (_ <- 1 to TextQueries.TextrankRounds) {
      val inflow = scala.collection.mutable.Map.empty[String, Long]
      sym.foreach { case (u, v, w) =>
        inflow(v) = inflow.getOrElse(v, 0L) + (s(u) * w) / wtot(u)
      }
      s = verts.map(v =>
        v -> (150000L + (850000L * inflow.getOrElse(v, 0L)) / 1000000L))
        .toMap
    }
    val expect = verts.map(v => v -> s(v)).sortBy { case (w, sc) =>
      (-sc, w)
    }.zipWithIndex.map { case ((w, sc), i) => (w, sc, i + 1L) }.toSet
    val got = TextQueries.textTextrank(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == expect)
    // scores actually separate words (not a fixed point at init)
    assert(got.map(_._2).size > 1, "degenerate: all scores equal")
  }

  test("CEP pattern counts match a plain-Scala journey rebuild") {
    import org.apache.spark.sql.functions.{col, unix_micros}
    val ev = QueryUtil.table(spark, sf0001, "events")
      .select(col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"),
        col("event_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    val journeys = ev.groupBy(_._1).view.mapValues { es =>
      es.sortBy(e => (e._2, e._3)).map(_._4.head).mkString
    }.toMap
    val expect = EventQueries.EventCepPatterns.map { case (name, pat) =>
      val ns = journeys.values.toSeq
        .map(j => pat.r.findAllIn(j).size.toLong)
      (name, ns.count(_ > 0).toLong, ns.sum, ns.max)
    }.toSet
    val got = EventQueries.eventsPatternMatch(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == expect)
    // every pattern matches someone, and at least one pattern is
    // selective (doesn't match every user) — at sf0.001 only 15 users
    // exist and the broad patterns legitimately cover them all
    assert(got.forall(_._2 > 0) &&
      got.exists(_._2 < journeys.size), s"vacuous patterns: $got")
  }

  test("manifest schema evolution survives upsert and compaction") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-schevo").toString
    Seq((1L, 10L), (2L, 20L)).toDF("id", "v")
      .write.format("graft-manifest").mode("append").save(dir)
    Seq((3L, 30L, "c")).toDF("id", "v", "tag")
      .write.format("graft-manifest").mode("append").save(dir)
    // copy-on-write upsert through the evolved 3-column schema
    graft.sources.ManifestV2Sink.upsert(spark,
      dir, Seq((2L, 21L, "b")).toDF("id", "v", "tag"), "id")
    val afterUpsert = graft.sources.ManifestV2Sink
      .readCommitted(spark, dir).orderBy("id")
      .select("id", "v", "tag").collect().toSeq
    assert(afterUpsert.map(r => (r.getLong(0), r.getLong(1),
      Option(r.getString(2)))) == Seq(
      (1L, 10L, None), (2L, 21L, Some("b")), (3L, 30L, Some("c"))))
    // compaction rewrites through the merged schema too
    graft.sources.ManifestV2Sink.compact(spark, dir, parts = 1)
    val afterCompact = graft.sources.ManifestV2Sink
      .readCommitted(spark, dir).orderBy("id")
      .select("id", "v", "tag").collect().toSeq
    assert(afterCompact == afterUpsert)
    new scala.reflect.io.Directory(new java.io.File(dir))
      .deleteRecursively()
  }
}

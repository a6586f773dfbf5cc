package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Semantic invariants for the round-8 operators — independent
  * plain-Scala refolds sharing no code with the queries, plus the
  * by-construction guarantees each report claims.
  */
class Round8OpsSpec extends SparkSuite {

  private def h56(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(14)
    java.lang.Long.parseLong(hex, 16)
  }

  private def splitOf(key: Long): String = {
    val b = h56(s"split:$key") % 1000
    if (b < 900) "train" else if (b < 950) "valid" else "test"
  }

  test("split leakage: cluster_hash cannot straddle; doc_hash refolds") {
    val rows = PipelineQueries.pipelineSplitLeakage(spark, sf0001)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val (clC, clD) = (rows("cluster_hash"), rows("doc_hash"))
    // the fix is structural: a cluster-keyed hash can never straddle
    assert(clC._3 == 0L && clC._4 == 0L,
      "cluster_hash scheme must have zero straddling / zero leakage")
    // cluster structure is scheme-independent
    assert(clC._1 == clD._1 && clC._2 == clD._2)

    // independent refold of the doc_hash row: union-find over the
    // simhash pairs (plain Scala), JVM md5 split — no query code
    val pairs = DedupQueries.dedupSimhashPairs(spark, sf0001)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val docs = QueryUtil.table(spark, sf0001, "documents")
      .select(col("doc_id")).collect().map(_.getLong(0))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    pairs.foreach { case (a, b) => union(a, b) }
    val clusters = docs.groupBy(find)
    val want = {
      var (nMulti, nStraddle, nLeaked) = (0L, 0L, 0L)
      clusters.values.foreach { members =>
        val splits = members.map(splitOf).toSet
        if (members.length > 1) nMulti += 1
        if (splits.size > 1) nStraddle += 1
        if (members.exists(splitOf(_) == "train"))
          nLeaked += members.count(splitOf(_) != "train")
      }
      (clusters.size.toLong, nMulti, nStraddle, nLeaked)
    }
    assert(clD == want, s"doc_hash refold diverges: $clD vs $want")
    // and the data must actually exercise the failure mode, or the
    // audit proves nothing
    assert(clD._3 > 0L,
      "corpus has no straddling cluster — the audit is vacuous")
  }

  test("weighted systematic sample refolds exactly and is size-proportional") {
    val got = PipelineQueries.pipelineSampleWeighted(spark, sf0001)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val docs = QueryUtil.table(spark, sf0001, "documents")
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val s = PipelineQueries.SampleStride
    val want = docs.groupBy(_._2).map { case (src, ds) =>
      var cum = 0L
      var (nS, tS) = (0L, 0L)
      ds.sortBy(d => (h56(s"samp:${d._1}"), d._1)).foreach { case (_, _, n) =>
        val before = cum; cum += n
        if (before / s < cum / s) { nS += 1; tS += n }
      }
      src -> (ds.length.toLong, nS, ds.map(_._3).sum, tS)
    }
    assert(got == want, "sample refold diverges")
    // certainty for stride-exceeding docs: every such doc is taken —
    // their token mass alone bounds the sample from below
    got.foreach { case (src, (_, nSamp, tok, tokSamp)) =>
      val whales = docs.filter(d => d._2 == src && d._3 >= s)
      assert(nSamp >= whales.length,
        s"$src: ${whales.length} stride-exceeding docs but $nSamp sampled")
      // one stride multiple per stride of line length, each selecting
      // exactly one doc: n_sampled == floor(tokens/stride)
      assert(nSamp == tok / s, s"$src: $nSamp != ${tok / s}")
      assert(tokSamp >= nSamp) // every taken doc has ≥1 token
    }
  }

  test("replica diff classifies exactly the injected drift") {
    val got = LakehouseQueries.lakeReplicaDiff(spark, sf0001)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    val keys = QueryUtil.table(spark, sf0001, "orders")
      .select(col("o_orderkey")).collect().map(_.getLong(0))
    val missing = keys.filter(_ % 9973 == 0)
    val corrupt = keys.filter(k => k % 7919 == 1 && k % 9973 != 0)
    val extra = keys.filter(_ % 7717 == 2).map(_ + 2000000000L)
    // per-bucket expectation from the injected drift alone
    val expect = (missing.map(k => (k % 64, "a")) ++
      extra.map(k => (k % 64, "b")) ++ corrupt.map(k => (k % 64, "m")))
      .groupBy(_._1).map { case (bkt, ds) =>
        bkt -> (ds.count(_._2 == "a").toLong, ds.count(_._2 == "b").toLong,
          ds.count(_._2 == "m").toLong)
      }
    assert(got.keySet == expect.keySet,
      s"diverging buckets ${got.keySet} != drifted buckets ${expect.keySet}")
    got.foreach { case (bkt, (nA, nB, onlyA, onlyB, mod)) =>
      val (wA, wB, wM) = expect(bkt)
      assert((onlyA, onlyB, mod) == ((wA, wB, wM)),
        s"bucket $bkt drill-down misclassified")
      // count columns reconcile with the drill-down
      assert(nA - onlyA == nB - onlyB,
        s"bucket $bkt common-row counts disagree")
    }
    // drift must exist in all three classes or the test is vacuous
    assert(missing.nonEmpty && corrupt.nonEmpty && extra.nonEmpty)
  }

  test("persisted-IVF layout: unprobed cell directories are never read") {
    // the knn_ivf_persisted scale claim: a cell-partitioned parquet
    // index + a literal probe list = static partition pruning, so
    // search I/O is nprobe/nlist of the index. Pin the mechanism on
    // the same layout: the pruned scan carries PartitionFilters and
    // the files it actually selects live ONLY under probed cell dirs.
    // (The query itself is pinned by sharing knn_ivf's oracle hash —
    // this pins that the layout prunes, which the hash cannot see.)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ivfprune").toString
    try {
      spark.range(1000)
        .select(col("id").as("vec_id"), (col("id") % 7).as("cell"))
        .write.partitionBy("cell").mode("overwrite").parquet(dir)
      val probed = spark.read.parquet(dir)
        .where(col("cell").isin(1L, 3L))
      val plan = probed.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters: [") &&
        !plan.contains("PartitionFilters: []"),
        s"probe list did not become a partition filter:\n${plan.take(600)}")
      val files = probed.select(input_file_name()).distinct()
        .collect().map(_.getString(0))
      assert(files.nonEmpty && files.forall(f =>
        f.contains("cell=1/") || f.contains("cell=3/")),
        s"unprobed directories were read: ${files.toSeq}")
      assert(probed.count() == 1000 / 7 * 2 + 2)
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
      ()
    }
  }

  test("exact-substring audit + removal refold in plain Scala") {
    val W = DedupQueries.SubW
    // split(-1): Spark's split() KEEPS trailing empty tokens — the
    // refold must tokenize identically or window counts drift
    val docs = QueryUtil.table(spark, sf0001, "documents")
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val wins = docs.flatMap { case (id, _, text) =>
      val t = text.split(" ", -1)
      (0 to t.length - W).map(i =>
        (id, i + 1, t.slice(i, i + W).mkString(" ")))
    }
    val cnt = wins.groupBy(_._3).map { case (w, os) => w -> os.length }

    // audit refold: per-doc duplicated windows + covered positions
    val audit = DedupQueries.dedupSubstring(spark, sf0001).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    assert(audit.size == docs.length, "one audit row per document")
    docs.foreach { case (id, _, text) =>
      val t = text.split(" ", -1)
      val mine = wins.filter(_._1 == id)
      val dups = mine.filter(w => cnt(w._3) >= 2)
      val covered = dups.flatMap(w => w._2 until w._2 + W).distinct
      val (nTok, nW, nD, nP, pp) = audit(id)
      assert(nTok == t.length && nW == mine.length && nD == dups.length
        && nP == covered.length, s"doc $id audit refold mismatch")
      assert(pp == math.floor(1e6 * covered.length / t.length).toLong)
    }
    // non-vacuity: the corpus must actually contain duplicated windows
    assert(audit.values.map(_._3).sum > 0, "no duplicated windows found")

    // removal refold: first (doc_id, pos) occurrence survives, every
    // other occurrence's span is removed
    val removedByDoc = wins.groupBy(_._3).values.flatMap { os =>
      if (os.length < 2) Nil
      else os.sortBy(o => (o._1, o._2)).tail
    }.toSeq.groupBy(_._1).map { case (id, os) =>
      id -> os.flatMap(o => o._2 until o._2 + W).distinct.length.toLong
    }
    val apply = DedupQueries.dedupSubstringApply(spark, sf0001).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val bySource = docs.groupBy(_._2)
    assert(apply.keySet == bySource.keySet)
    bySource.foreach { case (src, ds) =>
      val nToks = ds.map(d => d._3.split(" ", -1).length.toLong).sum
      val touched = ds.count(d => removedByDoc.contains(d._1)).toLong
      val removed = ds.map(d => removedByDoc.getOrElse(d._1, 0L)).sum
      assert(apply(src) == ((ds.length.toLong, touched, nToks, removed)),
        s"source $src removal refold mismatch")
    }
    // removal is SAFE: every duplicated content keeps one occurrence,
    // so the removed token count is strictly under the duplicated
    // coverage — and something must actually be removed
    val totalRemoved = removedByDoc.values.sum
    assert(totalRemoved > 0, "removal pass removed nothing")
    assert(totalRemoved < audit.values.map(_._4).sum,
      "first-occurrence keep rule must strictly shrink the removal set")
  }
}

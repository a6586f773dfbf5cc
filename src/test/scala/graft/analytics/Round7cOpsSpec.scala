package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Semantic invariants for the round-7 third-context operators. The
  * oracle hash-compare proves engine agreement; these pin the
  * properties the numbers must have to MEAN what they claim — in
  * particular the two BPE merge subtleties a shared-bug oracle compare
  * could never catch on natural text alone.
  */
class Round7cOpsSpec extends SparkSuite {

  /** Independent plain-Scala BPE trainer: the classic token-list
    * algorithm (count adjacent pairs including overlaps, argmax by
    * (count DESC, pair ASC), greedy left-to-right merge), sharing NO
    * code with the relational formulation under test.
    */
  private def refBpe(words: Map[String, Long], rounds: Int)
      : Seq[(Long, String, Long, Long, Long)] = {
    var segs: Map[String, (Vector[String], Long)] =
      words.map { case (w, wc) => w -> (w.map(_.toString).toVector, wc) }
    (1 to rounds).map { r =>
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      segs.values.foreach { case (ts, wc) =>
        ts.indices.dropRight(1).foreach { i =>
          val k = (ts(i), ts(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + wc
        }
      }
      val ((pa, pb), pc) = counts.toSeq
        .minBy { case ((a, b), c) => (-c, a + " " + b) }
      var applied = 0L
      var tokensAfter = 0L
      segs = segs.map { case (w, (ts, wc)) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < ts.length) {
          if (i + 1 < ts.length && ts(i) == pa && ts(i + 1) == pb) {
            out += (pa + pb); applied += wc; i += 2
          } else { out += ts(i); i += 1 }
        }
        val v = out.result()
        tokensAfter += wc * v.length
        w -> (v, wc)
      }
      (r.toLong, pa + " " + pb, pc, applied, tokensAfter)
    }
  }

  private def trainRows(dir: String): Seq[(Long, String, Long, Long, Long)] =
    TextQueries.textBpeTrain(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSeq

  test("BPE trainer: overlap chains and token boundaries on a fixture") {
    import spark.implicits._
    // crafted so round 1 merges (a,b), round 2 (a,a), round 3 (b,c),
    // round 4 (ab,c) — exercising BOTH traps:
    //  - 'aaaa' has THREE (a,a) pair positions but admits TWO merges
    //    (greedy left-to-right: aa|aa, never aa|a|a)
    //  - by round 3, 'abc' is segmented [ab, c]; the (b,c) merge must
    //    NOT fire inside it (a string replace would corrupt: 'ab c'
    //    contains the substring 'b c')
    val words = Seq.fill(10)("ab") ++ Seq.fill(5)("abc") ++
      Seq.fill(7)("bc") ++ Seq.fill(3)("aaaa")
    val dir = java.nio.file.Files.createTempDirectory("bpefix").toString
    words.grouped(5).map(_.mkString(" ")).toSeq.toDF("text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = trainRows(dir)
    val want = refBpe(
      words.groupBy(identity).map { case (w, g) => w -> g.size.toLong },
      TextQueries.BpeRounds)
    assert(got == want, s"got $got\nwant $want")
    // the hand-traced trajectory, asserted literally so a shared bug
    // in refBpe and the query cannot hide
    assert(got(0) == ((1L, "a b", 15L, 15L, 46L)))
    assert(got(1) == ((2L, "a a", 9L, 6L, 40L)), "overlap chain: " +
      "9 pair positions, 6 merges (2 per 'aaaa'), aa|aa not aa|a|a")
    assert(got(2) == ((3L, "b c", 7L, 7L, 33L)), "boundary trap: " +
      "(b,c) applies only in 'bc' — [ab, c] has no (b,c) token pair")
    assert(got(3) == ((4L, "ab c", 5L, 5L, 28L)))
  }

  test("residual IVFPQ: exact re-rank scores and recall floor") {
    // the oracle pins engine agreement; this pins that the returned
    // scores really ARE the exact ppm cosine of the raw embeddings
    // (recomputed here from the parquet floats, sharing no query
    // code) and that the residual-coded index still finds the true
    // neighborhood: recall@10 vs brute force above a floor
    val vecs = QueryUtil.table(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map { r =>
        r.getLong(0) -> r.getSeq[Float](1)
          .map(x => math.floor(x.toDouble * 4096).toLong).toArray
      }.toMap
    def dotL(a: Array[Long], b: Array[Long]): Long =
      a.indices.map(i => a(i) * b(i)).sum
    def ppmCos(a: Long, b: Long): Long = {
      val (va, vb) = (vecs(a), vecs(b))
      math.floor(1e6 * dotL(va, vb).toDouble /
        math.sqrt((dotL(va, va) * dotL(vb, vb)).toDouble)).toLong
    }
    val res = graft.SparkEntry.queries("knn_ivf_residual")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(res.nonEmpty)
    res.foreach { case (q, v, s) =>
      assert(s == ppmCos(q, v), s"score for ($q,$v) is not the exact cosine")
    }
    val brute = graft.SparkEntry.queries("knn_brute_force")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, g) => q -> g.map(_._2).toSet }
    val approx = res.map(t => (t._1, t._2))
      .groupBy(_._1).map { case (q, g) => q -> g.map(_._2).toSet }
    def recallOf(m: Map[Long, Set[Long]]): Double = {
      val hits = brute.keys.toSeq.map(q =>
        (m.getOrElse(q, Set.empty) intersect brute(q)).size).sum
      hits.toDouble / brute.values.map(_.size).sum
    }
    val recall = recallOf(approx)
    // sf0.001's near-random embeddings cap ANY NProbe=2 search at the
    // coarse-cell recall; 0.25 is the conservative floor the PQ
    // families clear here (measured 0.29)
    assert(recall >= 0.25, s"residual IVFPQ recall@10 $recall < 0.25")
    // pool dominance: candidates come from the probed cells, and
    // knn_ivf returns the exact top of that same pool — the residual
    // index can approach but never beat it
    val ivf = graft.SparkEntry.queries("knn_ivf")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, g) => q -> g.map(_._2).toSet }
    assert(recall <= recallOf(ivf) + 1e-9,
      "residual recall exceeded its probed-cell ceiling")
  }

  test("PQ distortion report matches a from-scratch reimplementation") {
    // full independent rebuild of all three families from the raw
    // parquet floats: hash ranking, centroid sample, argmax cells,
    // residuals, codebooks, per-subspace argmin — sharing zero code
    // with the query. The oracle proves engine agreement; this proves
    // the NUMBERS are the distortions they claim to be (it already
    // caught the all-zero residual codebook bug in development)
    val raw = QueryUtil.table(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map { r =>
        r.getLong(0) -> r.getSeq[Float](1)
          .map(x => math.floor(x.toDouble * 4096).toLong).toArray
      }
    val md = java.security.MessageDigest.getInstance("MD5")
    def h56(id: Long): Long = {
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(14)
      java.lang.Long.parseLong(hex, 16)
    }
    val ranked = raw.sortBy { case (id, _) => (h56(id), id) }
    val n = ranked.length
    val k = math.max(4, math.min(4096, math.ceil(math.sqrt(n)).toInt))
    def dotL(a: Array[Long], b: Array[Long]): Long =
      a.indices.map(i => a(i) * b(i)).sum
    val cents = ranked.take(k)
    def homeResidual(v: Array[Long]): Array[Long] = {
      val n2 = dotL(v, v)
      val best = cents.minBy { case (cid, cq) =>
        val s = math.floor(1e6 * dotL(v, cq).toDouble /
          math.sqrt((n2 * dotL(cq, cq)).toDouble)).toLong
        (-s, cid)
      }
      v.indices.map(i => v(i) - best._2(i)).toArray
    }
    val resid = ranked.map { case (id, v) => id -> homeResidual(v) }
    def pqErr(vs: Seq[Array[Long]], cb: Seq[Array[Long]]): Long =
      vs.map { v =>
        (0 until 8).map { s =>
          cb.map { c =>
            (0 until 8).map { d =>
              val diff = v(s * 8 + d) - c(s * 8 + d); diff * diff
            }.sum
          }.min
        }.sum
      }.sum
    val wantRaw = pqErr(ranked.map(_._2).toSeq, ranked.take(16).map(_._2).toSeq)
    val wantCent = resid.map(r => dotL(r._2, r._2)).sum
    val wantRes = pqErr(resid.map(_._2).toSeq,
      resid.slice(k, k + 16).map(_._2).toSeq)
    val got = EmbeddingQueries.knnPqDistortion(spark, sf0001)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got("pq_raw") == ((n.toLong, wantRaw)))
    assert(got("ivf_centroid") == ((n.toLong, wantCent)))
    assert(got("ivfpq_residual") == ((n.toLong, wantRes)))
  }

  test("re-rank curve is monotone and pinned to its siblings") {
    def topSets(q: String): Map[Long, Set[Long]] =
      graft.SparkEntry.queries(q)(spark, sf0001)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (k, g) => k -> g.map(_._2).toSet }
    val brute = topSets("knn_brute_force")
    def hitsOf(m: Map[Long, Set[Long]]): Long = brute.keys.toSeq.map(q =>
      (m.getOrElse(q, Set.empty) intersect brute(q)).size.toLong).sum
    val curve = EmbeddingQueries.knnRerankCurve(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(curve.map(_._1).toSeq == Seq(10L, 20L, 50L, 100L))
    // monotone by the superset argument, in BOTH recall and cost
    curve.toSeq.sliding(2).foreach { case Seq(a, b) =>
      assert(a._2 <= b._2, s"recall fell with depth: $a -> $b")
      assert(a._3 <= b._3, s"re-rank cost fell with depth: $a -> $b")
    case _ => ()
    }
    // the depth-50 point IS knn_ivfpq (same pool, same PqRerank=50
    // tail): its realized recall must reproduce exactly
    val ivfpqHits = hitsOf(topSets("knn_ivfpq"))
    assert(curve.find(_._1 == 50L).get._2 == 10000L * ivfpqHits,
      "depth-50 point diverges from knn_ivfpq's realized recall")
    // ceiling: no depth can beat the exact top of the probed pool,
    // which is exactly what knn_ivf returns
    val ivfHits = hitsOf(topSets("knn_ivf"))
    assert(curve.last._2 <= 10000L * ivfHits,
      "curve exceeded its probed-cell ceiling")
  }

  test("novelty trend conserves first-seen attribution exactly") {
    // every distinct gram is novel in exactly one document (its
    // minimum doc_id), so sum(n_novel) must equal the corpus's
    // distinct gram count and sum(n_grams) the distinct (doc, gram)
    // pair count — exact identities, not bounds
    val toks = split(col("text"), " ")
    val g = QueryUtil.table(spark, sf0001, "documents")
      .where(size(toks) >= 4)
      .select(col("doc_id"), explode(transform(sequence(lit(0),
        size(toks) - 4),
        i => array_join(slice(toks, i + 1, lit(4)), " "))).as("gram"))
      .select(col("doc_id"), graft.functions.CrossHash
        .md5Long(col("gram")).as("gh"))
      .distinct().cache()
    val rows = PipelineQueries.textNovelty(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(rows.map(_._3).sum == g.count(), "gram mass must re-add")
    assert(rows.map(_._4).sum == g.select("gh").distinct().count(),
      "each distinct gram must be novel exactly once")
    assert(rows.map(_._1).toSet.subsetOf((0L until 8L).toSet))
    assert(rows.map(_._2).sum ==
      g.select("doc_id").distinct().count(), "every doc lands in a bucket")
    g.unpersist()
  }

  test("Holt forecast: independent refold, negative trend exercised") {
    // refold with fresh code; beyond equality, require that the data
    // actually DRIVES the negative-numerator division at least once —
    // that is the case where truncating vs floor division diverge
    // (the bug the oracle caught in development), so a corpus that
    // never went downhill would leave the parity claim untested
    val daily = QueryUtil.table(spark, sf0001, "events")
      .groupBy(QueryUtil.epochDay(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val d0 = daily.keys.min
    var (l, b) = (daily(d0) * 16, 0L)
    var sawNegative = false
    val want = (d0 + 1 to daily.keys.max).map { day =>
      val n = daily.getOrElse(day, 0L)
      val f = (l + b) / 16
      val lN = (n * 16 + 3 * (l + b)) / 4
      val num = (lN - l) + 7 * b
      if (num < 0) sawNegative = true
      b = num / 8; l = lN
      (day, n, f)
    }
    val got = EventQueries.eventsForecastHolt(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == want.toSeq, "refold diverges")
    assert(sawNegative,
      "corpus never drove a negative trend numerator; parity untested")
  }

  test("data contract: clean corpus passes, violations count exactly") {
    val rows = LakehouseQueries.dqContract(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))
    assert(rows.length == 6)
    val n = QueryUtil.table(spark, sf0001, "events").count()
    rows.foreach { case (cn, rule, v, nr, pass) =>
      assert(nr == n, s"$cn/$rule reports wrong row count")
      assert(pass == (v == 0L), s"$cn/$rule verdict inconsistent")
    }
    // independent recompute of the domain rule
    val offDomain = QueryUtil.table(spark, sf0001, "events")
      .where(!col("event_type").isin(
        "view", "click", "purchase", "signup", "error")).count()
    assert(rows.find(r => r._1 == "event_type").get._3 == offDomain)
  }

  test("stationary distribution: independent refold and convergence") {
    // refold the power iteration from the transition matrix with
    // fresh code; the query's driver fold must match exactly, the
    // mass leak must be only floor dust, and 8 rounds must actually
    // have converged (one more round barely moves any entry)
    val p = EventQueries.eventsTransitions(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(3)))
    val types = p.map(_._1).distinct.sorted
    def step(pi: Map[String, Long]): Map[String, Long] = {
      val acc = scala.collection.mutable.Map[String, Long]()
      p.foreach { case (f, t, pp) =>
        if (pi.getOrElse(f, 0L) > 0 && types.contains(t))
          acc(t) = acc.getOrElse(t, 0L) + pi(f) * pp
      }
      acc.view.mapValues(_ / 1000000L).toMap
    }
    var pi: Map[String, Long] = types.map(_ -> 1000000L / types.length).toMap
    (1 to EventQueries.MarkovRounds).foreach(_ => pi = step(pi))
    val got = EventQueries.eventsMarkovStationary(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).sorted.toSeq == types.toSeq, "one row per from-type")
    got.foreach { case (t, v, _) =>
      assert(v == pi.getOrElse(t, 0L), s"$t: $v != refold ${pi.get(t)}")
    }
    val mass = got.head._3
    assert(mass == pi.values.sum && mass <= 1000000L,
      "mass must be the refold's, never above unity")
    assert(1000000L - mass <=
      (EventQueries.MarkovRounds.toLong + 1) * types.length,
      s"mass leak ${1000000L - mass} exceeds the floor-dust budget")
    val next = step(pi)
    types.foreach { t =>
      val d = math.abs(next.getOrElse(t, 0L) - pi.getOrElse(t, 0L))
      assert(d <= 5000, s"$t moved $d ppm after round 8: not converged")
    }
  }

  test("LSH curve: nested-band monotonicity and the production point") {
    val curve = DedupQueries.dedupLshCurve(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .sortBy(_._2) // ascending rows-per-band: (8,2), (4,4), (2,8)
    assert(curve.map(t => (t._1, t._2)).toSeq ==
      Seq((8L, 2L), (4L, 4L), (2L, 8L)))
    // divisor-nested bands: a length-2r band match implies both its
    // length-r halves match, so candidate sets shrink as r grows —
    // counts, hits, and recall must be monotone nonincreasing
    curve.toSeq.sliding(2).foreach {
      case Seq(a, b) =>
        assert(a._3 >= b._3, s"candidates grew with band length: $a -> $b")
        assert(a._4 >= b._4, s"hits grew with band length: $a -> $b")
      case _ => ()
    }
    curve.foreach { t =>
      assert(t._4 <= t._5, "cannot hit more than the exact truth set")
      assert(t._4 <= t._3, "hits are a subset of candidates")
    }
    // the (4,4) point IS the production banding: its candidate count
    // must reproduce dedup_lsh_pairs' distinct pair count exactly
    val prod = DedupQueries.dedupLshPairs(spark, sf0001)
      .select(col("doc_a"), col("doc_b")).distinct().count()
    assert(curve.find(t => t._1 == 4L).get._3 == prod,
      "curve's (4,4) point diverges from dedup_lsh_pairs")
  }

  test("balanced-PQ report matches a from-scratch permutation rebuild") {
    // independent rebuild: exact variance numerators via BigInt, the
    // snake deal, the permuted encode — then both report rows must
    // match exactly, and the permutation must actually balance the
    // per-subspace variance mass it claims to
    val raw = QueryUtil.table(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map { r =>
        r.getLong(0) -> r.getSeq[Float](1)
          .map(x => math.floor(x.toDouble * 4096).toLong).toArray
      }
    val n = raw.length
    val dims = 0 until 64
    val varNum: Map[Int, BigInt] = dims.map { d =>
      val xs = raw.map(_._2(d))
      val sx = xs.map(BigInt(_)).sum
      val sxx = xs.map(x => BigInt(x) * BigInt(x)).sum
      d -> (BigInt(n) * sxx - sx * sx)
    }.toMap
    val ranked = dims.sortBy(d => (-varNum(d), d))
    val bySub = Array.fill(8)(Vector.newBuilder[Int])
    ranked.zipWithIndex.foreach { case (d, i) =>
      bySub(if ((i / 8) % 2 == 0) i % 8 else 7 - i % 8) += d
    }
    val perm = bySub.toSeq.flatMap(_.result())
    val md = java.security.MessageDigest.getInstance("MD5")
    def h56(id: Long): Long = java.lang.Long.parseLong(
      md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(14), 16)
    def pqErr(vs: Seq[Array[Long]], cb: Seq[Array[Long]]): Long =
      vs.map { v =>
        (0 until 8).map { s =>
          cb.map { c =>
            (0 until 8).map { d =>
              val diff = v(s * 8 + d) - c(s * 8 + d); diff * diff
            }.sum
          }.min
        }.sum
      }.sum
    val sorted = raw.sortBy { case (id, _) => (h56(id), id) }
    val wantRaw = pqErr(sorted.map(_._2).toSeq,
      sorted.take(16).map(_._2).toSeq)
    val permuted = sorted.map { case (_, v) => perm.map(v).toArray }
    val wantBal = pqErr(permuted.toSeq, permuted.take(16).toSeq)
    val got = EmbeddingQueries.knnPqBalanced(spark, sf0001)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got("pq_raw") == ((n.toLong, wantRaw)))
    assert(got("pq_balanced") == ((n.toLong, wantBal)))
    // the deal's whole purpose: subspace variance mass spread must
    // not be worse than the natural [0..7][8..15]... layout
    def imbalance(assign: Seq[Seq[Int]]): BigInt = {
      val sums = assign.map(_.map(varNum).sum)
      sums.max - sums.min
    }
    val natural = dims.grouped(8).toSeq.map(_.toSeq)
    val snaked = bySub.toSeq.map(_.result().toSeq)
    assert(imbalance(snaked) <= imbalance(natural),
      "snake deal failed to balance subspace variance mass")
  }

  test("multi-touch credit conserves purchase value up to floor dust") {
    // independent recompute of both models from the raw events, plus
    // the conservation law: per purchase, each model's credited total
    // is within n floor-truncations of the full milli-value
    val ev = QueryUtil.table(spark, sf0001, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), unix_timestamp(col("ts")).as("s"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        math.floor(r.getDouble(3) * 1000).toLong, r.getLong(4)))
    val byUser = ev.groupBy(_._1)
    var expLinear = Map.empty[String, Long].withDefaultValue(0L)
    var expUshape = Map.empty[String, Long].withDefaultValue(0L)
    var expN = Map.empty[String, Long].withDefaultValue(0L)
    val look = EventQueries.LookbackS
    byUser.values.foreach { rows =>
      val touches = rows.filter(r => r._3 == "click" || r._3 == "view")
      rows.filter(_._3 == "purchase").foreach { p =>
        val pre = touches.filter(t => (t._5 < p._5 ||
          (t._5 == p._5 && t._2 < p._2)) && p._5 - t._5 <= look)
          .sortBy(t => (t._5, t._2))
        val pv = p._4
        if (pre.isEmpty) {
          expLinear += "direct" -> (expLinear("direct") + pv)
          expUshape += "direct" -> (expUshape("direct") + pv)
          expN += "direct" -> (expN("direct") + 1)
        } else {
          val n = pre.length
          var linSum = 0L; var uSum = 0L
          pre.zipWithIndex.foreach { case (t, i) =>
            val w = if (n == 1) 1000L else if (n == 2) 500L
              else if (i == 0 || i == n - 1) 400L else 200L / (n - 2)
            expLinear += t._3 -> (expLinear(t._3) + pv / n)
            expUshape += t._3 -> (expUshape(t._3) + pv * w / 1000)
            expN += t._3 -> (expN(t._3) + 1)
            linSum += pv / n; uSum += pv * w / 1000
          }
          // conservation: floor dust only. Linear loses < 1 milli-unit
          // per touch; u-shape additionally loses the permille
          // shortfall when (n-2) does not divide 200 evenly
          assert(pv - linSum >= 0 && pv - linSum < n,
            s"linear credit lost more than dust: $pv vs $linSum over $n")
          val sw = if (n <= 2) 0L else 200L - (n - 2) * (200L / (n - 2))
          assert(pv - uSum >= 0 && pv - uSum <= pv * sw / 1000 + n,
            s"u-shape credit lost more than dust: $pv vs $uSum over $n")
        }
      }
    }
    val got = EventQueries.eventsAttributionMulti(spark, sf0001)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val chans = expN.keySet ++ got.keySet
    chans.foreach { c =>
      assert(got.contains(c), s"channel $c missing from query output")
      assert(got(c) == ((expN(c), expLinear(c), expUshape(c))),
        s"channel $c: got ${got(c)}, want " +
          s"(${expN(c)}, ${expLinear(c)}, ${expUshape(c)})")
    }
  }

  test("decontamination apply drops exactly the reported documents") {
    // the apply's accounting must re-add to the report: contaminated
    // docs across sources == the docs textContamination reports, and
    // every corpus doc is either kept or contaminated, never both
    val rep = PipelineQueries.textContamination(spark, sf0001).count()
    val rows = PipelineQueries.pipelineDecontaminate(spark, sf0001)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._2).sum == rep,
      "applied drop set diverges from the contamination report")
    rows.foreach { case (n, bad, kept) =>
      assert(n == bad + kept, "kept + contaminated must partition docs")
    }
    val corpus = QueryUtil.table(spark, sf0001, "documents")
      .where(col("doc_id") % 97 =!= 0).count()
    assert(rows.map(_._1).sum == corpus, "accounting must cover the corpus")
  }

  test("schema evolution nulls exactly the old generation") {
    val rows = LakehouseQueries.lakeSchemaEvolution(spark, sf0001)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    val total = QueryUtil.table(spark, sf0001, "events").count()
    assert(rows.keySet == Set(1, 2))
    val (n1, present1) = rows(1)
    val (n2, present2) = rows(2)
    assert(n1 + n2 == total, "generations must partition the table")
    assert(present1 == 0L,
      "old-writer files must read the evolved column as NULL")
    assert(present2 == n2,
      "new-writer files must carry the evolved column everywhere")
  }

  test("applied tokenizer's bill re-adds to the trainer's trajectory") {
    // the apply joins the corpus to the trainer's FINAL segmentation,
    // so corpus-wide pieces must equal round-4 tokens_after plus one
    // piece per word under the trainer's 2-char floor — an exact
    // identity linking the two queries, not a bound
    val train = trainRows(sf0001)
    val tokensAfter = train.last._5
    val rows = TextQueries.textBpeApply(spark, sf0001).collect()
    val totalPieces = rows.map(_.getLong(3)).sum
    val totalWords = rows.map(_.getLong(2)).sum
    val totalChars = rows.map(_.getLong(4)).sum
    val shortWords = QueryUtil.table(spark, sf0001, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) < 2).count()
    assert(totalPieces == tokensAfter + shortWords,
      s"pieces $totalPieces != trainer tokens_after $tokensAfter + " +
        s"short-word singletons $shortWords")
    assert(totalPieces >= totalWords, "every word is at least one piece")
    assert(totalPieces <= totalChars + shortWords,
      "pieces cannot exceed character-level tokenization")
  }

  test("BPE trainer matches the independent reference on the corpus") {
    val words = QueryUtil.table(spark, sf0001, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) >= 2)
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = refBpe(words, TextQueries.BpeRounds)
    val got = trainRows(sf0001)
    assert(got == want)
    // the trajectory must be internally consistent: each round's
    // tokens_after drops by exactly its applied count
    val tokens0 = words.map { case (w, wc) => wc * w.length }.sum
    got.foldLeft(tokens0) { case (prev, (_, _, pc, applied, after)) =>
      assert(applied <= pc, "cannot apply more merges than pair positions")
      assert(after == prev - applied, "token count must shrink by applied")
      after
    }
  }
}

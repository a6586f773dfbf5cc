package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Methodology: a warmup pass at sf0.001 first (JIT + codegen + parquet
  * footer caching happen there, not inside the measured run), then
  * SPARK_GRAFT_BENCH_PASSES (default 3) timed passes in sorted query
  * order, reporting the per-query MINIMUM across passes. Passes are
  * temporally separated (pass-major order), so a transient host-load
  * spike in one time window cannot contaminate all samples of any
  * query. Results are fully materialized through the noop sink —
  * `count()` would let Spark prune the projection and under-report the
  * real work.
  *
  * Noise instrumentation: a fixed CPU-bound calibration job (a
  * 64M-row codegen'd sum that never touches disk) runs once unwarmed
  * in the warmup phase (absorbing its own codegen cost), then at the
  * START of every timed pass, then once AFTER the final pass — N+1
  * recorded markers truly book-ending the N passes, so contention
  * that begins during the last pass still leaves a trace. Its wall
  * time moves with host contention and nothing else, so the
  * "calibration" array in the detail JSON is the host-load record:
  * if calibration drifted 1.3× between rounds, a uniform 1.3× query
  * smear is machine noise, not regression — and tools/bench_diff.py
  * refuses to normalize a median-query smear the calibration ratio
  * cannot explain.
  *
  * Env knobs (all optional):
  *   SPARK_GRAFT_BENCH_QUERIES  comma-separated query subset (exact
  *                              names or prefix match with trailing *)
  *   SPARK_GRAFT_BENCH_PASSES   timed pass count (default 3)
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARMUP_DIR",
      "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nPasses = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt
      .max(1)
    val spark = graft.core.GraftSession.builder("graft-bench")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def materialize(name: String, dir: String): Option[Double] = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, dir)
          .write.mode("overwrite").format("noop").save()
        Some((System.nanoTime() - t0) / 1e9)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        None
      } finally {
        // some queries (DedupQueries) cache() self-join inputs scoped to
        // one materialization; drop them so repeated runs in this
        // long-lived session don't accumulate orphaned blocks
        spark.catalog.clearCache()
      }
    }

    // /proc/loadavg (1m, 5m, 15m) sampled at every calibration point:
    // the calibration job says how fast THIS JVM ran just now; loadavg
    // says what the rest of the host was doing to it. Together they
    // make a round-over-round smear adjudication mechanical
    // (tools/drift_check.py) instead of a per-round investigation.
    def loadavg(): Seq[Double] =
      try {
        val src = scala.io.Source.fromFile("/proc/loadavg")
        try src.getLines().next().split(" ").take(3).toSeq.map(_.toDouble)
        finally src.close()
      } catch { case _: Throwable => Seq.empty }

    // fixed CPU-bound marker: wall time tracks host contention only
    // (no IO, no shuffle, single codegen'd stage over an in-memory
    // range). Measured at the start of every timed pass.
    def calibrate(): Double = {
      val t0 = System.nanoTime()
      // mod keeps the running sum < 2^56: ANSI mode would throw on a
      // bigint sum overflow, and the multiply alone overflows it
      spark.range(1L << 26)
        .selectExpr("sum((id * 2654435761) % 1000000007)").collect()
      (System.nanoTime() - t0) / 1e9
    }

    val all = SparkEntry.queries.keys.toSeq.sorted
    val names = sys.env.get("SPARK_GRAFT_BENCH_QUERIES") match {
      case Some(spec) if spec.trim.nonEmpty =>
        val pats = spec.split(",").map(_.trim).filter(_.nonEmpty)
        all.filter(n => pats.exists(p =>
          if (p.endsWith("*")) n.startsWith(p.dropRight(1)) else n == p))
      case _ => all
    }
    // testdata is frozen for the duration of a bench run, so dataset
    // fingerprints are memoized for the whole run: hundreds of
    // artifact resolves (every rider query per pass) cost ONE
    // walk+probe per dataset dir instead of re-walking it each time
    val calibrations = new scala.collection.mutable.ArrayBuffer[Double]
    val loadavgs = new scala.collection.mutable.ArrayBuffer[Seq[Double]]
    val passes: Seq[Map[String, Option[Double]]] =
        graft.core.DatasetFingerprint.withCache {
    names.foreach(materialize(_, warmDir)) // warmup, unmeasured
    // ARTIFACT PRE-WARM (unmeasured): force every session artifact
    // fresh for this code/data before any timed pass, so riding
    // consumers' samples are artifact-read cost in EVERY pass —
    // execution-order independent — while the build jobs themselves
    // still pay the full rebuild in each timed pass. Deliberately NOT
    // filtered to the selected subset: a subset run timing only a
    // RIDER (e.g. knn_recall_report) must still find its build jobs'
    // artifacts warm, or pass 1 times a lazy build instead of the
    // artifact read
    SparkEntry.artifactWarmup.foreach(materialize(_, sfDir))
    calibrate() // unrecorded: absorbs the calibration job's own codegen
    // N timed passes, per-query minimum: a single pass is hostage to
    // transient host contention (observed 3-5× swings on individual
    // queries between identical runs); the min of temporally separated
    // samples reports the machine's actual capability.
    // A query must succeed in EVERY pass to count — an intermittent
    // crash must surface in failed[], never hide behind a good pass
    val timed: Seq[Map[String, Option[Double]]] = (1 to nPasses).map { _ =>
      loadavgs += loadavg()
      calibrations += calibrate()
      names.map(n => n -> materialize(n, sfDir)).toMap
    }
    loadavgs += loadavg() // closing book-ends after the last pass
    calibrations += calibrate()
    timed
    } // end DatasetFingerprint.withCache: passes is its result
    val samples: Seq[(String, Seq[Option[Double]])] =
      names.map(n => n -> passes.map(_(n)))
    val results = samples.map { case (n, ss) =>
      n -> (if (ss.forall(_.isDefined)) Some(ss.flatten.min) else None)
    }
    val ok = results.collect { case (k, Some(v)) => k -> v }
    val failed = results.collect { case (k, None) => k }

    // failed queries are excluded from the timings and listed — a
    // crash's elapsed time must never read as a fast green result
    val qs = ok.map { case (k, v) => s""""$k":$v""" }
      .mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = ok.map(_._2).sum
    // per-pass totals (queries that succeeded in all passes) ride
    // along so round-over-round comparisons can see the raw samples
    // behind the min — host contention shows up as pass spread
    def passTotal(p: Map[String, Option[Double]]): Double =
      ok.map { case (k, _) => p(k).getOrElse(0.0) }.sum
    val passTotals = passes.map(passTotal)
    val passesJson = passTotals.mkString("[", ",", "]")
    val calJson = calibrations.mkString("[", ",", "]")
    val loadJson = loadavgs
      .map(_.mkString("[", ",", "]")).mkString("[", ",", "]")
    // raw per-pass samples per query: lets bench_diff separate a
    // one-pass spike (noise) from a consistent slowdown (regression)
    val samplesJson = samples.map { case (k, ss) =>
      s""""$k":${ss.map(_.map(_.toString).getOrElse("null")).mkString("[", ",", "]")}"""
    }.mkString("{", ",", "}")
    val detailLine = s"""{"metric":"total","value":$total,"unit":"sec","pass_totals":$passesJson,"calibration":$calJson,"loadavg":$loadJson,"queries":$qs,"samples":$samplesJson,"failed":$failedJson,"sf":"$sfDir"}"""

    // The harness that snapshots this output keeps only the last ~2000
    // characters of stdout; with 90+ queries the full-precision line
    // above is ~3100 chars and gets truncated mid-JSON, so nothing
    // machine-parses. Persist the full detail to a file, then print a
    // compact headline line LAST — short enough to always survive the
    // tail window intact (total + per-pass totals + slowest queries).
    // a SPARK_GRAFT_BENCH_QUERIES subset run must never clobber the
    // full-sweep baseline bench_diff reads — route it to a _partial
    // file unless the caller pointed somewhere explicitly
    val subsetRun = names.size < all.size
    val detailPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_DETAIL",
      if (subsetRun) "BENCH_DETAIL_partial.json" else "BENCH_DETAIL.json")
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get(detailPath),
        (detailLine + "\n").getBytes("UTF-8"))
    } catch { case e: Throwable =>
      System.err.println(s"[bench] detail write failed: ${e.getMessage}")
    }
    println(detailLine)
    def r3(v: Double): Double = math.rint(v * 1000) / 1000
    val slow = ok.sortBy(-_._2).take(15)
      .map { case (k, v) => s""""$k":${r3(v)}""" }.mkString("{", ",", "}")
    val passesR3 = passTotals.map(r3).mkString("[", ",", "]")
    val calR3 = calibrations.map(r3).mkString("[", ",", "]")
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","pass_totals":$passesR3,"calibration":$calR3,"n_queries":${ok.size},"queries":$slow,"queries_note":"slowest 15 of ${ok.size}; full per-query timings in $detailPath","failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}

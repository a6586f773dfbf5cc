package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.analytics.ScaleCorpus

/** Isolated 100× harness (VERDICT r14 item 8): the heavy-family scale
  * smoke, run as its OWN JVM (via tools/run_main.sh — no sbt server,
  * no sibling suites) with the same pass-major min-of-N methodology
  * as graft.Bench, so round-over-round 100× comparisons need no
  * contention adjudication.
  *
  * Methodology:
  *  - the corpus (mult × sf0.1 documents+embeddings, ScaleCorpus
  *    shape) is generated and written BEFORE any timing starts, and
  *    a first untimed warmup pass of every family absorbs JIT +
  *    codegen + parquet-footer caching;
  *  - then GRAFT_SCALE_PASSES (default 3) timed passes run the
  *    families in FIXED sorted order, pass-major (a transient host
  *    spike in one time window cannot contaminate every sample of
  *    one family); per-family result is the MINIMUM across passes,
  *    with all samples recorded;
  *  - graft.Bench's CPU-bound calibration marker + /proc/loadavg
  *    book-end every pass, so a uniform smear is attributable to
  *    host load mechanically (tools/drift_check.py semantics);
  *  - the scale-critical plan pins run once per family (no
  *    CartesianProduct anywhere; the k-means / graph-search corpus
  *    joins stay broadcast — no SortMergeJoin).
  *
  * Prints ONE JSON line:
  *   {"metric":"scale_total","value":S,"unit":"sec","mult":M,
  *    "passes":N,"queries":{f:min},"samples":{f:[...]},
  *    "calibration":[...],"loadavg":[[...]],"failed":[]}
  *
  * Env knobs: GRAFT_SCALE_MULT (default 100), GRAFT_SCALE_PASSES
  * (default 3), GRAFT_SCALE_ONLY (comma subset), GRAFT_SCALE_DIR
  * (reuse a pre-generated corpus dir — skips generation),
  * GRAFT_SCALE_KEEP=1 (keep the generated corpus for reuse).
  */
object ScaleBench {

  /** Fixed measurement order (sorted). kmeans/graph-search must stay
    * broadcast-only; NN-Descent and LSH are the shuffle-heavy pair.
    */
  val families: Seq[String] = Seq(
    "dedup_clusters_persisted", // LSH pairs + star contraction + sink
    "emb_kmeans_train",         // Lloyd rounds, broadcast centroids
    "knn_graph_nnd",            // NN-Descent graph build
    "knn_graph_search",         // beam search over the built graph
    "pipeline_e2e",             // funnel: score→filter→dedup→pack
    "text_bpe_train").sorted    // multi-round pair-count merges

  private val noSmj = Set("emb_kmeans_train", "knn_graph_search")

  def main(args: Array[String]): Unit = {
    val mult = sys.env.getOrElse("GRAFT_SCALE_MULT", "100").toInt
    val nPasses = sys.env.getOrElse("GRAFT_SCALE_PASSES", "3").toInt.max(1)
    val only = sys.env.get("GRAFT_SCALE_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val targets = families.filter(q => only.forall(_.contains(q)))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.builder("graft-scale-bench")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = sys.env.get("GRAFT_SCALE_DIR").getOrElse {
      val d = Files.createTempDirectory(s"graft-scale-${mult}x").toString
      val t0 = System.nanoTime()
      ScaleCorpus.writeCorpus(spark, mult, d)
      System.err.println(
        f"[scale] corpus ${mult}x generated in ${(System.nanoTime() - t0) / 1e9}%.1f s: $d")
      d
    }

    def loadavg(): Seq[Double] =
      try {
        val src = scala.io.Source.fromFile("/proc/loadavg")
        try src.getLines().next().split(" ").take(3).toSeq.map(_.toDouble)
        finally src.close()
      } catch { case _: Throwable => Seq.empty }

    // same fixed CPU-bound marker as graft.Bench: wall time tracks
    // host contention only (no IO, single codegen'd stage)
    def calibrate(): Double = {
      val t0 = System.nanoTime()
      // mod keeps the running sum < 2^56 (ANSI overflow), as in Bench
      spark.range(1L << 26)
        .selectExpr("sum((id * 2654435761) % 1000000007)").collect()
      (System.nanoTime() - t0) / 1e9
    }

    val failed = scala.collection.mutable.ListBuffer[String]()

    def runOne(q: String, pin: Boolean): Option[Double] = {
      val t0 = System.nanoTime()
      try {
        val df = SparkEntry.queries(q)(spark, dir)
        if (pin) {
          val p = df.queryExecution.sparkPlan.toString
          require(!p.contains("CartesianProduct"), s"$q plans a cartesian")
          if (noSmj(q))
            require(!p.contains("SortMergeJoin"), s"$q shuffles its corpus")
        }
        val n = df.count()
        require(n > 0, s"$q returned no rows at ${mult}x")
        Some((System.nanoTime() - t0) / 1e9)
      } catch { case e: Throwable =>
        System.err.println(s"[scale] $q failed: ${e.getMessage}")
        failed += q; None
      } finally spark.catalog.clearCache()
    }

    // warmup pass (untimed, plan pins checked here once)
    val calib = scala.collection.mutable.ListBuffer[Double]()
    val loads = scala.collection.mutable.ListBuffer[Seq[Double]]()
    calib += calibrate(); loads += loadavg()
    targets.foreach(q => runOne(q, pin = true))

    val samples = scala.collection.mutable.LinkedHashMap[String,
      List[Double]](targets.map(_ -> List.empty[Double]): _*)
    for (_ <- 1 to nPasses) {
      calib += calibrate(); loads += loadavg()
      targets.foreach { q =>
        runOne(q, pin = false).foreach(s => samples(q) = samples(q) :+ s)
      }
    }
    calib += calibrate(); loads += loadavg()

    val mins = samples.collect { case (q, ss) if ss.nonEmpty =>
      q -> ss.min }
    def jnum(d: Double): String = f"$d%.3f"
    def jarr(ds: Seq[Double]): String = ds.map(jnum).mkString("[", ",", "]")
    val json = "{" +
      s""""metric":"scale_total","value":${jnum(mins.values.sum)},""" +
      s""""unit":"sec","mult":$mult,"passes":$nPasses,""" +
      s""""queries":{${mins.map { case (q, m) => s""""$q":${jnum(m)}""" }.mkString(",")}},""" +
      s""""samples":{${samples.map { case (q, ss) => s""""$q":${jarr(ss)}""" }.mkString(",")}},""" +
      s""""calibration":${jarr(calib.toSeq)},""" +
      s""""loadavg":[${loads.map(jarr).mkString(",")}],""" +
      s""""failed":[${failed.distinct.map(q => s""""$q"""").mkString(",")}]}"""
    println(json)

    if (!sys.env.get("GRAFT_SCALE_KEEP").contains("1") &&
        sys.env.get("GRAFT_SCALE_DIR").isEmpty)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}

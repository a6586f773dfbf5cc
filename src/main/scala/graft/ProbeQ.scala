package graft

/** Per-query job/stage/task profiler: runs named queries (all of
  * [[SparkEntry.queries]] if none given) once warm at the target SF
  * and prints wall seconds plus deterministic structural counts
  * (jobs, stages, tasks) from a listener — the contention-immune
  * metrics ProbeCc introduced, generalized to any query (dev tool).
  *
  *   runMain graft.ProbeQ [name...]   (SPARK_GRAFT_SF_DIR targets)
  */
object ProbeQ {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local(32, "graft-probe-q")
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); stages.addAndGet(j.stageInfos.size)
          tasks.addAndGet(j.stageInfos.map(_.numTasks).sum)
        }
      })
    val names =
      if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    def once(name: String, d: String): Unit = {
      SparkEntry.queries(name)(spark, d)
        .write.mode("overwrite").format("noop").save()
      spark.catalog.clearCache()
    }
    graft.core.DatasetFingerprint.withCache {
      // artifact pre-warm, same as Bench: riders must measure
      // artifact-READ cost, not a lazy build
      SparkEntry.artifactWarmup.foreach { n =>
        try once(n, dir)
        catch { case e: Throwable =>
          println(s"PROBEQ warmup $n FAILED: ${e.getMessage}") }
      }
      names.foreach { n =>
        try {
          once(n, "/root/testdata/sf0.001") // warm: JIT + codegen
          val (j0, s0, t0) = (jobs.get, stages.get, tasks.get)
          val w0 = System.nanoTime()
          once(n, dir)
          println(f"PROBEQ $n%-34s ${(System.nanoTime() - w0) / 1e9}%7.2f s" +
            f"  jobs=${jobs.get - j0}%4d stages=${stages.get - s0}%5d" +
            f" tasks=${tasks.get - t0}%6d")
        } catch { case e: Throwable =>
          println(s"PROBEQ $n FAILED: ${e.getMessage}")
        }
      }
    }
    spark.stop()
  }
}

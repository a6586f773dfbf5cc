package graft

import org.apache.spark.sql.functions._

/** Stage-level profiler for the dedup-clusters family at sf0.1 — the
  * [[Probe]] discipline applied to connected components: per-phase
  * walls (simhash pairs, CC rounds, finish tail) for both labelers,
  * so optimization targets are measured, not argued (dev tool).
  */
object ProbeCc {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local(32, "graft-probe-cc")
    spark.sparkContext.setLogLevel("WARN")
    import graft.analytics.DedupQueries

    // deterministic structural metric alongside the wall: Spark job
    // and stage counts per phase (job count is what the lazy-
    // checkpoint fusion changes; immune to host contention)
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); stages.addAndGet(j.stageInfos.size)
        }
      })

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val j0 = jobs.get(); val s0 = stages.get()
      val r = f
      println(f"PROBECC $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s" +
        f"  jobs=${jobs.get() - j0}%3d stages=${stages.get() - s0}%3d")
      r
    }

    // warm at sf0.001 so JIT/codegen are out of the measured numbers
    DedupQueries.queries("dedup_clusters")(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").format("noop").save()
    DedupQueries.queries("dedup_clusters_star")(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").format("noop").save()
    spark.catalog.clearCache()

    // one-round plan shape: does the checkpointed partitioning
    // actually eliminate the per-round exchanges?
    {
      val pairs = DedupQueries.dedupSimhashPairs(spark, dir)
        .select(col("doc_a"), col("doc_b")).localCheckpoint(true)
      val edges = pairs.union(pairs.select(col("doc_b"), col("doc_a")))
        .toDF("src", "dst").localCheckpoint(true)
      import org.apache.spark.sql.graftbridge.bridge.checkpointKeyed
      val parts = 4 // emulate scale: multi-partition co-partitioning
      val e = checkpointKeyed(edges, parts, "dst")
      val labels = checkpointKeyed(
        edges.select(col("src").as("v")).distinct()
          .withColumn("label", col("v")), parts, "v")
      val nbr = e.join(labels.withColumnRenamed("v", "dst"), "dst")
        .select(col("src").as("v"), col("label"))
      val stepped = labels.unionByName(nbr)
        .groupBy(col("v")).agg(min(col("label")).as("label"))
      println("PROBECC e.partitioning: " +
        e.queryExecution.executedPlan.outputPartitioning)
      println("PROBECC labels.partitioning: " +
        labels.queryExecution.executedPlan.outputPartitioning)
      val plan = stepped.queryExecution.executedPlan.toString
      val nEx = "(?<!Reused)Exchange".r.findAllIn(plan).size
      println(s"PROBECC one-round nbr+agg plan: exchanges=$nEx")
      println(plan.linesIterator.filter(l =>
        l.contains("Exchange") || l.contains("Join") || l.contains("Scan"))
        .mkString("\n"))
      spark.catalog.clearCache()
    }
    for (pass <- 1 to 2) {
      println(s"--- pass $pass ---")
      val pairs = t("pairs(materialize)") {
        val p = DedupQueries.dedupSimhashPairs(spark, dir)
          .select(col("doc_a"), col("doc_b")).localCheckpoint(true)
        p
      }
      spark.catalog.clearCache()
      val edges = t("edges(sym+checkpoint)") {
        pairs.union(pairs.select(col("doc_b"), col("doc_a")))
          .toDF("src", "dst").localCheckpoint(true)
      }
      val (lbl, r1) = t("propagateLabels") {
        val (l, r) = DedupQueries.propagateLabelsWithRounds(
          edges, DedupQueries.identityLabels(edges))
        l.write.mode("overwrite").format("noop").save(); (l, r)
      }
      println(s"PROBECC propagate rounds=$r1")
      val (lbl2, r2) = t("starContract") {
        val (l, r) = DedupQueries.starContractWithRounds(edges)
        l.write.mode("overwrite").format("noop").save(); (l, r)
      }
      println(s"PROBECC star rounds=$r2")
      val _ = (lbl, lbl2) // labels consumed above; tail is in the fulls
      t("full dedup_clusters") {
        DedupQueries.queries("dedup_clusters")(spark, dir)
          .write.mode("overwrite").format("noop").save()
      }
      spark.catalog.clearCache()
      t("full dedup_clusters_star") {
        DedupQueries.queries("dedup_clusters_star")(spark, dir)
          .write.mode("overwrite").format("noop").save()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}

package graft.analytics

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Incremental connected components: maintaining cluster labels across
  * arriving edge batches (the `foreachBatch` loop of a streaming dedup
  * pipeline) must land on exactly the labeling a from-scratch batch
  * run produces — and the warm start must actually pay (fewer rounds
  * touched than a cold re-cluster).
  */
class IncrementalClusterSpec extends SparkSuite {

  import DedupQueries.propagateLabels

  private def bidir(pairs: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    val df = pairs.toDF("a", "b")
    df.select(col("a").as("src"), col("b").as("dst"))
      .union(df.select(col("b"), col("a")))
  }

  private def identityLabels(edges: DataFrame): DataFrame =
    edges.select(col("src").as("v")).distinct()
      .withColumn("label", col("v"))

  private def labelMap(labels: DataFrame): Map[Long, Long] =
    labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("incremental maintenance over edge batches equals batch clustering") {
    val rnd = new Random(13)
    // a random graph delivered in three batches, including batches
    // that MERGE previously separate components
    val all = Seq.fill(120)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter(p => p._1 != p._2)
    val batches = all.grouped((all.size + 2) / 3).toSeq
    // incremental: each arriving batch re-propagates over the
    // accumulated edges, warm-started from the previous fixpoint
    var accumulated = Seq.empty[(Long, Long)]
    var labels: Option[DataFrame] = None
    batches.foreach { batch =>
      accumulated ++= batch
      val edges = bidir(accumulated).localCheckpoint(true)
      val warm = labels match {
        case None => identityLabels(edges)
        case Some(prev) =>
          // new vertices start as themselves; known ones keep their
          // previous component label
          identityLabels(edges).as("i")
            .join(prev.as("p"), col("i.v") === col("p.v"), "left_outer")
            .select(col("i.v"),
              coalesce(col("p.label"), col("i.label")).as("label"))
      }
      labels = Some(propagateLabels(edges, warm))
    }
    val incremental = labelMap(labels.get)
    val batchRun = labelMap(
      propagateLabels(bidir(all).localCheckpoint(true),
        identityLabels(bidir(all))))
    assert(incremental == batchRun)
    // and the labeling is a true CC fixpoint: every edge intra-cluster
    val l = labels.get
    val split = bidir(all)
      .join(l.withColumnRenamed("v", "src")
        .withColumnRenamed("label", "ls"), "src")
      .join(l.withColumnRenamed("v", "dst")
        .withColumnRenamed("label", "ld"), "dst")
      .where(col("ls") =!= col("ld")).count()
    assert(split == 0)
  }

  test("a merging edge relabels both components to the joint minimum") {
    // components {1,2,3} and {10,11} form, then edge (3,10) merges them
    val e1 = bidir(Seq((1L, 2L), (2L, 3L), (10L, 11L))).localCheckpoint(true)
    val first = propagateLabels(e1, identityLabels(e1))
    assert(labelMap(first) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    val e2 = bidir(Seq((1L, 2L), (2L, 3L), (10L, 11L), (3L, 10L)))
      .localCheckpoint(true)
    val warm = identityLabels(e2).as("i")
      .join(first.as("p"), col("i.v") === col("p.v"), "left_outer")
      .select(col("i.v"),
        coalesce(col("p.label"), col("i.label")).as("label"))
    val merged = labelMap(propagateLabels(e2, warm))
    assert(merged.values.toSet == Set(1L))
    assert(merged.keySet == Set(1L, 2L, 3L, 10L, 11L))
  }
}

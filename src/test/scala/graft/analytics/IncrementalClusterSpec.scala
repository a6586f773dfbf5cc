package graft.analytics

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Incremental connected components: maintaining cluster labels across
  * arriving edge batches (the `foreachBatch` loop of a streaming dedup
  * pipeline) must land on exactly the labeling a from-scratch batch
  * run produces — AND the warm start must observably pay (round count
  * is exposed for exactly this assertion).
  */
class IncrementalClusterSpec extends SparkSuite {

  import DedupQueries.{identityLabels, propagateLabels,
    propagateLabelsWithRounds, warmStart}

  private def bidir(pairs: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    val df = pairs.toDF("a", "b")
    df.select(col("a").as("src"), col("b").as("dst"))
      .union(df.select(col("b"), col("a")))
  }

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
    var lastWarmRounds = 0
    batches.foreach { batch =>
      accumulated ++= batch
      val edges = bidir(accumulated).localCheckpoint(true)
      val seed = labels match {
        case None => identityLabels(edges)
        case Some(prev) => warmStart(edges, prev)
      }
      val (next, rounds) = propagateLabelsWithRounds(edges, seed)
      labels = Some(next)
      lastWarmRounds = rounds
    }
    val incremental = labelMap(labels.get)
    val full = bidir(all).localCheckpoint(true)
    val (cold, coldRounds) =
      propagateLabelsWithRounds(full, identityLabels(full))
    assert(incremental == labelMap(cold))
    // the warm start pays: the final incremental step starts from an
    // almost-converged labeling, the cold run from identity
    assert(lastWarmRounds <= coldRounds,
      s"warm=$lastWarmRounds cold=$coldRounds")
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
    val (merged, rounds) =
      propagateLabelsWithRounds(e2, warmStart(e2, first))
    val m = labelMap(merged)
    assert(m.values.toSet == Set(1L))
    assert(m.keySet == Set(1L, 2L, 3L, 10L, 11L))
    // warm-started merge is near-instant: one changing round plus the
    // convergence-confirming round
    assert(rounds <= 2, s"rounds=$rounds")
  }
}

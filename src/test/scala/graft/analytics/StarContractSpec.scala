package graft.analytics

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Large-star/small-star contraction must be EXACTLY connected
  * components — same labels as min-label propagation on every graph —
  * and must show its diameter-independence: on a long chain (the
  * adversarial case for propagation) it converges in no more rounds,
  * while both remain exact.
  */
class StarContractSpec extends SparkSuite {

  import DedupQueries.{identityLabels, propagateLabels,
    propagateLabelsWithRounds, starContractLabels, starContractWithRounds}

  private def bidir(pairs: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    val df = pairs.toDF("a", "b")
    df.select(col("a").as("src"), col("b").as("dst"))
      .union(df.select(col("b"), col("a")))
  }

  private def labelMap(labels: DataFrame): Map[Long, Long] =
    labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("star contraction equals propagation on random graphs") {
    val rnd = new Random(29)
    val pairs = Seq.fill(150)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter(p => p._1 != p._2)
    val edges = bidir(pairs).localCheckpoint(true)
    val prop = labelMap(propagateLabels(edges, identityLabels(edges)))
    val star = labelMap(starContractLabels(edges))
    assert(star == prop)
  }

  test("star contraction equals propagation on the simhash near-dup graph") {
    val spairs = DedupQueries.dedupSimhashPairs(spark, sf0001)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .localCheckpoint(true)
    val edges = spairs.union(spairs.select(col("dst").as("src"),
      col("src").as("dst")))
    val prop = labelMap(propagateLabels(edges, identityLabels(edges)))
    val star = labelMap(starContractLabels(edges))
    assert(star == prop)
    spark.catalog.clearCache() // dedupSimhashPairs caches its banding
  }

  test("star contraction is diameter-independent on a long chain") {
    import spark.implicits._
    // path graph 1-2-3-...-512: diameter 511, one component, min label 1
    val n = 512L
    val chain = spark.range(1, n)
      .select(col("id").as("src"), (col("id") + 1).as("dst"))
    val edges = chain.union(chain.select(col("dst").as("src"),
      col("src").as("dst"))).localCheckpoint(true)
    val (starLabels, starRounds) = starContractWithRounds(edges)
    val (propLabels, propRounds) =
      propagateLabelsWithRounds(edges, identityLabels(edges))
    val star = labelMap(starLabels)
    assert(star.size == n.toInt && star.values.forall(_ == 1L))
    assert(labelMap(propLabels) == star)
    // the point of the variant: round count bounded by log²n, not
    // diameter — on the chain it must not lose to pointer jumping
    assert(starRounds <= propRounds,
      s"star took $starRounds rounds vs propagation's $propRounds")
    assert(starRounds <= 12, s"star rounds $starRounds not O(log² n)-ish")
  }

  test("star contraction handles empty and self-loop-only edge sets") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(starContractLabels(empty).count() == 0)
    val selfLoops = Seq((3L, 3L), (7L, 7L)).toDF("src", "dst")
    assert(starContractLabels(selfLoops).count() == 0)
  }
}

package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Proves the engine's runtime skew handling: a hot key that dwarfs
  * every other shuffle partition is split by AQE's OptimizeSkewedJoin
  * at execution time (visible as `skew=true` in the final adaptive
  * plan) with unchanged join results. This is the no-code-change
  * complement to the explicit salting operator (`agg_salted_skew` /
  * `Skew.saltedJoin`): salting rewrites the query, AQE rewrites the
  * RUNTIME plan — at 100 TB both matter (AQE for joins, salting for
  * aggregations AQE cannot split).
  */
class AqeSkewJoinSpec extends SparkSuite {

  test("AQE splits the hot partition of a skewed shuffle join") {
    val confs = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force shuffle join
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB")
    val saved = confs.keys
      .map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // one hot key carrying 200k rows vs 1000 uniform keys of ~50 each
      val fact = spark.range(200000)
        .select(lit(0L).as("k"), col("id").as("v"))
        .union(spark.range(50000)
          .select((col("id") % 1000 + 1).as("k"), col("id").as("v")))
      val dim = spark.range(1001)
        .select(col("id").as("k"), (col("id") * 7).as("d"))
      val joined = fact.join(dim, "k")
      // execute THIS DataFrame's own QueryExecution (count() would plan
      // a separate execution and leave this one's adaptive plan
      // unfinalized), then read the finalized adaptive plan
      assert(joined.collect().length == 250000) // every fact row matches once
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n${plan.takeRight(1500)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}

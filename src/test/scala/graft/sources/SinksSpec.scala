package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.core.Tables

/** Proves the scale-relevant properties, not just round-trips: the
  * partition filter must appear in the scan (pruning), and the
  * bucketed join plan must contain no shuffle.
  */
class SinksSpec extends SparkSuite {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("partitioned write prunes: day filter becomes a PartitionFilter") {
    val dir = tmp("graft-part")
    val events = Tables.load(spark, sf0001, "events")
      .withColumn("day", to_date(col("ts")))
    Sinks.writePartitioned(events, dir, Seq("day"))
    val read = spark.read.parquet(dir)
      .where(col("day") === "2024-01-02")
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"))
    assert(plan.contains("2024-01-02"))
    // pruned read returns exactly that day's events
    val expected = events.where(to_date(col("ts")) === "2024-01-02").count()
    assert(read.count() == expected && expected > 0)
  }

  test("bucketed tables join without a shuffle") {
    val o = Tables.load(spark, sf0001, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val l = Tables.load(spark, sf0001, "lineitem")
      .select("l_orderkey", "l_quantity")
    Sinks.writeBucketed(o, "orders_b", "o_orderkey", 8)
    Sinks.writeBucketed(l, "lineitem_b", "l_orderkey", 8)
    // disable auto-broadcast: at test scale everything broadcasts, but
    // the property under test is the 100 TB fact-to-fact case where it
    // can't — the sort-merge join must use bucketing, not a shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg(sum(col("l_quantity")).as("qty"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      // no shuffle anywhere: the join uses bucket partitioning and the
      // follow-up groupBy inherits it
      assert(!plan.contains("Exchange hashpartitioning"))
      assert(joined.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("orc round-trips and pushes filters into the scan") {
    val dir = tmp("graft-orc")
    val orders = Tables.load(spark, sf0001, "orders")
    Sinks.writeOrc(orders, dir)
    val read = Sinks.readOrc(spark, dir)
      .where(col("o_totalprice") > 300000)
      .select("o_orderkey", "o_totalprice")
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("o_totalprice"), plan.take(500))
    // pruned projection: only the two selected columns are read
    assert(plan.contains("struct<o_orderkey:bigint,o_totalprice:double>"))
    assert(read.count() ==
      orders.where(col("o_totalprice") > 300000).count())
  }

  test("csv and json round-trip with explicit schemas") {
    val dir = tmp("graft-fmt")
    val nation = Tables.load(spark, sf0001, "nation")
    nation.write.mode("overwrite").option("header", "true")
      .csv(s"$dir/csv")
    nation.write.mode("overwrite").json(s"$dir/json")
    val ddl = "n_nationkey INT, n_name STRING, n_regionkey INT"
    val fromCsv = Sinks.readCsv(spark, s"$dir/csv", ddl)
    val fromJson = Sinks.readJson(spark, s"$dir/json", ddl)
    assert(fromCsv.count() == 25)
    assert(fromJson.count() == 25)
    assert(fromCsv.schema.map(_.dataType) == fromJson.schema.map(_.dataType))
    assert(fromCsv.agg(sum("n_nationkey")).head.getLong(0) ==
      fromJson.agg(sum("n_nationkey")).head.getLong(0))
  }
}

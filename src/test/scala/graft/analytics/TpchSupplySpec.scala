package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Semantic invariants of the derived-partsupp TPC-H queries — cross-
  * checks the oracle can't express (it would just re-run the same SQL).
  */
class TpchSupplySpec extends SparkSuite {

  test("q2: every reported supplier offers its part at the regional minimum") {
    val rows = TpchSupplyQueries.q2MinCostSupplier(spark, sf0001)
    // recompute the per-part regional min from raw facts and check no
    // reported (part, supplier) offers above it
    val ps = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("cost"))
    val euroSupp = spark.read.parquet(s"$sf0001/supplier.parquet")
      .join(spark.read.parquet(s"$sf0001/nation.parquet"),
        col("s_nationkey") === col("n_nationkey"))
      .join(spark.read.parquet(s"$sf0001/region.parquet")
        .where(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"))
    val regionalMin = ps
      .join(euroSupp, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey").as("mpk")).agg(min(col("cost")).as("minc"))
    val offered = rows
      .join(euroSupp.select(col("s_name"), col("s_suppkey").as("rk")),
        Seq("s_name"))
      .join(ps, col("rk") === col("l_suppkey") &&
        col("p_partkey") === col("l_partkey"))
      .join(regionalMin, col("p_partkey") === col("mpk"))
    assert(offered.count() > 0)
    assert(offered.where(col("cost") > col("minc")).count() == 0,
      "a reported supplier's cost exceeds the regional minimum")
  }

  test("q11: reported parts are exactly those above 2x the mean share") {
    val rows = TpchSupplyQueries.q11ImportantStock(spark, sf0001).collect()
    val reported = rows.map(_.getAs[Long]("ps_partkey")).toSet
    val values = rows.map(_.getAs[Double]("part_value"))
    assert(values.nonEmpty)
    assert(values.sameElements(values.sortBy(-(_: Double))),
      "not sorted by value desc")
    // independent recompute with PLAIN double sums (not the query's
    // floor-scaled path): the threshold semantics must survive a
    // different summation, so dropping the 2x factor — the one thing
    // this query adds over a group-by — fails here even though the
    // oracle (same formula) cannot see it
    val ps = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("cost"),
        sum(col("l_quantity")).as("qty"))
    val asia = spark.read.parquet(s"$sf0001/supplier.parquet")
      .join(spark.read.parquet(s"$sf0001/nation.parquet"),
        col("s_nationkey") === col("n_nationkey"))
      .join(spark.read.parquet(s"$sf0001/region.parquet")
        .where(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"))
    val perPart = ps.join(asia, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"))
      .agg(sum(col("cost") * col("qty")).as("pv"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val thr = 2.0 * perPart.values.sum / perPart.size
    val eps = 1e-9
    val above = perPart.filter { case (_, v) => v > thr * (1 + eps) }.keySet
    val below = perPart.filter { case (_, v) => v <= thr * (1 - eps) }.keySet
    assert(above.subsetOf(reported),
      s"parts clearly above threshold missing: ${above -- reported}")
    assert(below.intersect(reported).isEmpty,
      s"parts clearly below threshold reported: ${below.intersect(reported)}")
  }

  test("q12: bucket line counts tile the filtered join exactly") {
    val out = TpchSupplyQueries.q12ShipBuckets(spark, sf0001)
      .agg(sum(col("high_line_count") + col("low_line_count")))
      .collect()(0).getLong(0)
    val l = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .where(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1997-01-01"))
    val o = spark.read.parquet(s"$sf0001/orders.parquet")
    val want = l.join(o, col("l_orderkey") === col("o_orderkey")).count()
    assert(out == want, s"bucket counts $out != joined lineitems $want")
  }

  test("q16: the complaint-supplier exclusion strictly shrinks the counts") {
    // sf0.01 is the smallest SF whose fixture HAS negative-balance
    // suppliers; compare the query's total against the same recompute
    // without the exclusion — it must be strictly smaller, proving the
    // anti-join actually bites
    val neg = spark.read.parquet(s"$sf001/supplier.parquet")
      .where(col("s_acctbal") < 0).count()
    assert(neg > 0, "fixture has no negative-balance supplier; exclusion untested")
    val out = TpchSupplyQueries.q16PartsSupplier(spark, sf001)
    assert(out.where(col("supplier_cnt") < 1).count() == 0)
    val withExcl = out.agg(sum(col("supplier_cnt"))).collect()(0).getLong(0)
    val sizes = Seq(1, 4, 9, 14, 19, 24, 29, 34).map(Integer.valueOf)
    val slice = spark.read.parquet(s"$sf001/part.parquet")
      .where(col("p_brand") =!= "Brand#13" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(sizes: _*))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    val noExcl = spark.read.parquet(s"$sf001/lineitem.parquet")
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      .join(slice, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("cnt"))
      .agg(sum(col("cnt"))).collect()(0).getLong(0)
    assert(withExcl < noExcl,
      s"exclusion had no effect: with=$withExcl without=$noExcl")
  }

  test("q20: reported suppliers are exactly the AMERICA excess-stock set") {
    val out = TpchSupplyQueries.q20ExcessStock(spark, sf0001)
      .select(col("s_name")).collect().map(_.getString(0)).toSet
    val america = spark.read.parquet(s"$sf0001/supplier.parquet")
      .join(spark.read.parquet(s"$sf0001/nation.parquet"),
        col("s_nationkey") === col("n_nationkey"))
      .join(spark.read.parquet(s"$sf0001/region.parquet")
        .where(col("r_name") === "AMERICA"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_name")).collect().map(_.getString(0)).toSet
    assert(out.nonEmpty && out.subsetOf(america),
      s"q20 returned non-AMERICA suppliers: ${out -- america}")
  }

  test("q9: profit decomposes as revenue minus derived cost") {
    // the grand total of sum_profit equals revenue(widgets) - cost(widgets)
    // computed independently without the per-nation grouping
    val total = TpchSupplyQueries.q9ProductProfit(spark, sf0001)
      .agg(sum(col("sum_profit"))).collect()(0).getDouble(0)
    val l = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val ps = l.groupBy(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("cost"))
    val widgets = spark.read.parquet(s"$sf0001/part.parquet")
      .where(col("p_name").like("%widget%")).select(col("p_partkey"))
    val want = l
      .join(widgets, col("l_partkey") === col("p_partkey"))
      .join(ps, col("l_partkey") === col("pk") && col("l_suppkey") === col("sk"))
      .agg(QueryUtil.fsum(col("l_extendedprice") * (lit(1) - col("l_discount")) -
        col("cost") * col("l_quantity")))
      .collect()(0).getDouble(0)
    assert(math.abs(total - want) < 1e-6,
      s"q9 total $total != independent recompute $want")
  }
}

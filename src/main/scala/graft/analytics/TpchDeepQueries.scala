package graft.analytics

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import QueryUtil._

/** Deeper TPC-H-shaped relational coverage (round 4): the remaining
  * dwarf shapes expressible over the driver's column subset — nation
  * pair flow analysis (q7), market-share ratio over a double
  * aggregation (q8), outer-join distribution (q13), argmax-by-group via
  * scalar subquery (q15), correlated per-group average threshold (q17),
  * double-correlated EXISTS/NOT-EXISTS (q21), and anti-join +
  * ungrouped-average threshold (q22).
  *
  * Column adaptations (testdata lacks some TPC-H columns; semantics
  * preserved, parameters renamed):
  *  - q13 drops the o_comment NOT LIKE filter (no comment column).
  *  - q17 keys the quantity threshold on p_brand only (no p_container).
  *  - q21 defines "late" as l_shipdate > o_orderdate + 60 days (no
  *    l_receiptdate/l_commitdate), keeping the exists/not-exists shape.
  *  - q22 selects countries by c_nationkey parity-slice (no c_phone).
  *
  * Scale notes: every plan shuffles fact tables on their join keys
  * only; nation/region/supplier and all derived per-group thresholds
  * are broadcast; q21's per-order supplier profile is ONE extra
  * aggregation on the already-shuffled order key (no second lineitem
  * scan pass beyond the self-aggregate); ratios/averages go through
  * DECIMAL so results are partition-order independent (QueryUtil).
  */
object TpchDeepQueries {

  private def ts(s: String): Column = lit(Timestamp.valueOf(s))

  // ------------------------------------------------------------ Q7
  /** Q7 volume shipping: cross-border revenue by (supplier nation,
    * customer nation, year). Adapted from the spec's fixed two-nation
    * literal to the full cross-nation matrix — the synthetic data's
    * supplier table is tiny at small SFs, so any hardcoded pair can be
    * legitimately empty there; the matrix keeps the join/agg shape and
    * is non-empty at every SF. lineitem⨝orders shuffles on orderkey;
    * both nation sides and customer/supplier are broadcast dims.
    */
  def q7VolumeShipping(spark: SparkSession, dir: String): DataFrame = {
    val l = table(spark, dir, "lineitem")
      .where(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
        col("l_shipdate") < ts("1998-01-01 00:00:00"))
    val o = table(spark, dir, "orders")
    val c = table(spark, dir, "customer")
    val s = table(spark, dir, "supplier")
    val n1 = table(spark, dir, "nation")
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = table(spark, dir, "nation")
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(s), l("l_suppkey") === s("s_suppkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .where(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
        .as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  val q7Sql: String =
    s"""SELECT supp_nation, cust_nation, l_year,
       |  ${sqlDsum("volume", 4)} AS revenue
       |FROM (
       |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       |    CAST(year(l_shipdate) AS BIGINT) AS l_year,
       |    l_extendedprice * (1 - l_discount) AS volume
       |  FROM lineitem
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
       |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
       |  WHERE n1.n_name <> n2.n_name
       |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00') shipping
       |GROUP BY supp_nation, cust_nation, l_year
       |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  // ------------------------------------------------------------ Q8
  /** Q8 market share of NATION_2 suppliers within ASIA-customer ECONOMY
    * orders, per year, as an integer ppm ratio (ratio of two exact
    * DECIMAL sums → one IEEE divide → engine-identical).
    */
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val p = table(spark, dir, "part").where(col("p_type") === "ECONOMY")
    val l = table(spark, dir, "lineitem")
    val o = table(spark, dir, "orders")
      .where(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
        col("o_orderdate") < ts("1998-01-01 00:00:00"))
    val c = table(spark, dir, "customer")
    val s = table(spark, dir, "supplier")
    val n1 = table(spark, dir, "nation")
      .select(col("n_nationkey").as("c_nk"), col("n_regionkey"))
    val r = table(spark, dir, "region").where(col("r_name") === "ASIA")
    val n2 = table(spark, dir, "nation")
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val dec = org.apache.spark.sql.types.DecimalType(18, 4)
    l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(s), l("l_suppkey") === s("s_suppkey"))
      .join(broadcast(n1), col("c_nationkey") === col("c_nk"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .join(broadcast(n2), col("s_nationkey") === col("s_nk"))
      .select(year(col("o_orderdate")).cast("long").as("o_year"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("volume"),
        col("supp_nation"))
      .groupBy(col("o_year"))
      .agg(ppm(
        sum(when(col("supp_nation") === "NATION_2", col("volume"))
          .otherwise(lit(0.0)).cast(dec)),
        sum(col("volume").cast(dec))).as("mkt_share_ppm"))
      .orderBy(col("o_year"))
  }

  val q8Sql: String =
    s"""SELECT o_year,
       |  ${sqlPpm(
        "SUM(CAST(CASE WHEN supp_nation = 'NATION_2' THEN volume ELSE 0.0 END AS DECIMAL(18,4)))",
        "SUM(CAST(volume AS DECIMAL(18,4)))")} AS mkt_share_ppm
       |FROM (
       |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       |    l_extendedprice * (1 - l_discount) AS volume,
       |    n2.n_name AS supp_nation
       |  FROM lineitem
       |  JOIN part ON l_partkey = p_partkey
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
       |  JOIN region ON n1.n_regionkey = r_regionkey
       |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
       |  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
       |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
       |    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00') all_nations
       |GROUP BY o_year
       |ORDER BY o_year""".stripMargin

  // ------------------------------------------------------------ Q13
  /** Q13 customer order-count distribution: LEFT OUTER join (customers
    * with zero orders must appear as c_count=0), double aggregation.
    * The outer join shuffles on custkey; the second aggregate is over
    * ≤ a few hundred distinct counts — near-free.
    */
  def q13CustomerDistribution(spark: SparkSession, dir: String): DataFrame = {
    val c = table(spark, dir, "customer").select(col("c_custkey"))
    val o = table(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val q13Sql: String =
    """SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
      |FROM (
      |  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
      |  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      |  GROUP BY c_custkey) c_orders
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  // ------------------------------------------------------------ Q15
  /** Q15 top supplier: per-supplier quarterly revenue, then the
    * supplier(s) achieving the global max (argmax via scalar subquery —
    * revenue is an exact DECIMAL sum, so the max and the equality
    * comparison are engine-identical). The revenue aggregate shuffles
    * on suppkey; the max is a 1-row broadcast back over it.
    */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = table(spark, dir, "lineitem")
      .where(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
        col("l_shipdate") < ts("1996-04-01 00:00:00"))
      .groupBy(col("l_suppkey").as("supplier_no"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
        .as("total_revenue"))
    val top = rev.agg(max(col("total_revenue")).as("mx"))
    val s = table(spark, dir, "supplier")
    rev.join(broadcast(top), rev("total_revenue") === top("mx"))
      .join(broadcast(s), col("supplier_no") === s("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  val q15Sql: String =
    s"""WITH revenue AS (
       |  SELECT l_suppkey AS supplier_no,
       |    ${sqlDsum("l_extendedprice * (1 - l_discount)", 4)} AS total_revenue
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
       |  GROUP BY l_suppkey)
       |SELECT s_suppkey, s_name, total_revenue
       |FROM supplier JOIN revenue ON s_suppkey = supplier_no
       |WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
       |ORDER BY s_suppkey""".stripMargin

  // ------------------------------------------------------------ Q17
  /** Q17 small-quantity-order revenue: lineitems of one brand whose
    * quantity is below 20% of that part's average quantity (exact
    * DECIMAL sum over exact count, then one IEEE multiply+compare).
    * The per-part threshold has |part| rows — it grows with the data,
    * so it joins back on the shuffle key rather than a forced
    * broadcast (AQE can still pick broadcast when it measures small).
    * Adapted: threshold keyed on p_brand parts only (no p_container).
    */
  def q17SmallQtyRevenue(spark: SparkSession, dir: String): DataFrame = {
    val p = table(spark, dir, "part").where(col("p_brand") === "Brand#13")
      .select(col("p_partkey"))
    val l = table(spark, dir, "lineitem")
    val branded = l.join(p, l("l_partkey") === p("p_partkey"))
    val avgQ = l.groupBy(col("l_partkey").as("ak"))
      .agg(davg(col("l_quantity")).as("avg_qty"))
    branded.join(avgQ, col("l_partkey") === col("ak"))
      .where(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg((dsum(col("l_extendedprice")).cast("double") / lit(7.0))
        .as("avg_yearly"))
  }

  val q17Sql: String =
    s"""SELECT ${sqlDsum("l_extendedprice")} / 7.0 AS avg_yearly
       |FROM lineitem
       |JOIN part ON p_partkey = l_partkey
       |JOIN (
       |  SELECT l_partkey AS ak, ${sqlDavg("l_quantity")} AS avg_qty
       |  FROM lineitem GROUP BY l_partkey) pa ON l_partkey = ak
       |WHERE p_brand = 'Brand#13' AND l_quantity < 0.2 * avg_qty""".stripMargin

  // ------------------------------------------------------------ Q21
  /** Q21 suppliers who kept orders waiting (adapted): for finished
    * orders, a lineitem is "late" when it shipped more than 60 days
    * after the order date; count, per supplier of one nation, the late
    * lineitems in multi-supplier orders where NO other supplier was
    * late. The EXISTS / NOT-EXISTS pair collapses into one per-order
    * profile aggregate (distinct suppliers, distinct late suppliers) —
    * one extra shuffle on the order key the join already uses, instead
    * of two correlated re-scans of lineitem.
    */
  def q21WaitingSupplier(spark: SparkSession, dir: String): DataFrame = {
    val o = table(spark, dir, "orders").where(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"))
    val l = table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
    val lo = l.join(o, l("l_orderkey") === o("o_orderkey"))
      .withColumn("late",
        datediff(col("l_shipdate").cast("date"),
          col("o_orderdate").cast("date")) > lit(60))
    val profile = lo.groupBy(col("l_orderkey").as("pk"))
      .agg(countDistinct(col("l_suppkey")).as("nsupp"),
        countDistinct(when(col("late"), col("l_suppkey"))).as("nlate"))
    val s = table(spark, dir, "supplier")
    val n = table(spark, dir, "nation").where(col("n_name") === "NATION_3")
    lo.join(profile, col("l_orderkey") === col("pk"))
      .where(col("late") && col("nsupp") > 1 && col("nlate") === 1)
      .join(broadcast(s), col("l_suppkey") === s("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === n("n_nationkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  val q21Sql: String =
    """WITH lo AS (
      |  SELECT l_orderkey, l_suppkey,
      |    date_diff('day', CAST(o_orderdate AS DATE),
      |      CAST(l_shipdate AS DATE)) > 60 AS late
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE o_orderstatus = 'F'),
      |profile AS (
      |  SELECT l_orderkey AS pk,
      |    COUNT(DISTINCT l_suppkey) AS nsupp,
      |    COUNT(DISTINCT CASE WHEN late THEN l_suppkey END) AS nlate
      |  FROM lo GROUP BY l_orderkey)
      |SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
      |FROM lo
      |JOIN profile ON l_orderkey = pk
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE late AND nsupp > 1 AND nlate = 1 AND n_name = 'NATION_3'
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name
      |LIMIT 100""".stripMargin

  // ------------------------------------------------------------ Q22
  /** Q22 global sales opportunity (adapted): customers in an odd-keyed
    * nation slice with above-average positive balance and no RECENT
    * orders (none since 2000-01-01 — q22's "lapsed customers" intent;
    * an unqualified no-orders-ever set is empty in this data) — an
    * ungrouped-average broadcast threshold plus a left-anti join
    * against the filtered orders (shuffles custkey only, and the date
    * filter prunes the anti-join's build side before the shuffle).
    */
  def q22GlobalSales(spark: SparkSession, dir: String): DataFrame = {
    val nations = Seq(1, 3, 5, 7, 9, 11, 13).map(_.toString)
    val c = table(spark, dir, "customer")
      .where(col("c_nationkey").isin(nations: _*))
    val avgBal = c.where(col("c_acctbal") > 0)
      .agg(davg(col("c_acctbal")).as("ab"))
    val o = table(spark, dir, "orders")
      .where(col("o_orderdate") >= ts("2000-01-01 00:00:00"))
      .select(col("o_custkey"))
    c.join(broadcast(avgBal))
      .where(col("c_acctbal") > col("ab"))
      .join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey").cast("long").as("cntry"))
      .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("totacctbal"))
      .orderBy(col("cntry"))
  }

  val q22Sql: String =
    s"""SELECT CAST(c_nationkey AS BIGINT) AS cntry,
       |  CAST(COUNT(*) AS BIGINT) AS numcust,
       |  ${sqlDsum("c_acctbal")} AS totacctbal
       |FROM customer
       |WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
       |  AND c_acctbal > (
       |    SELECT ${sqlDavg("c_acctbal")} FROM customer
       |    WHERE c_acctbal > 0 AND c_nationkey IN (1, 3, 5, 7, 9, 11, 13))
       |  AND NOT EXISTS (
       |    SELECT 1 FROM orders WHERE o_custkey = c_custkey
       |      AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
       |GROUP BY c_nationkey
       |ORDER BY cntry""".stripMargin

  // ------------------------------------------ market-basket mining
  /** Association mining over order baskets — support and LIFT for
    * part pairs co-purchased in the same order (the market-basket /
    * recommender primitive: lift > 1e6 ppm ⇒ the parts co-occur more
    * than independence predicts).
    *
    * Scale shape: baskets come from ONE distinct over (orderkey,
    * partkey); the pair generation is a self-join co-partitioned on
    * orderkey whose per-order work is bounded by basket size² (TPC-H
    * baskets are ≤ 7 lines — bounded by schema, not corpus); pair
    * counts aggregate with map-side combine on the (pa, pb) key; the
    * two item-frequency joins key on partkey. The min-support filter
    * keeps the output to genuinely repeated pairs. No step is
    * quadratic in the corpus.
    *
    * Overflow: lift's n_ab·N product would exceed int64 once the
    * order count passes ~2^31.5, so the ratio multiplies exact longs
    * AS DOUBLES — identical IEEE ops on identical integer operands in
    * both engines, corpus-size-safe.
    */
  val MinSupport = 2L

  def basketLift(spark: SparkSession, dir: String): DataFrame = {
    val items = table(spark, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
      .cache() // feeds both self-join sides + item frequencies
    val freq = items.groupBy(col("pk")).agg(count(lit(1)).as("n_item"))
    val nOrders = items.select(col("ok")).distinct()
      .agg(count(lit(1)).as("n_orders"))
    val a = items.select(col("ok"), col("pk").as("pa"))
    val b = items.select(col("ok"), col("pk").as("pb"))
    val pairs = a.join(b, Seq("ok"))
      .where(col("pa") < col("pb"))
      .groupBy(col("pa"), col("pb"))
      .agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= MinSupport)
    pairs
      .join(freq.select(col("pk").as("pa"), col("n_item").as("n_a")), "pa")
      .join(freq.select(col("pk").as("pb"), col("n_item").as("n_b")), "pb")
      .crossJoin(broadcast(nOrders))
      .select(col("pa"), col("pb"), col("n_ab"),
        ppm(col("n_ab"), col("n_orders")).as("support_ppm"),
        floor(lit(1e6) * col("n_ab").cast("double") *
          col("n_orders").cast("double") /
          (col("n_a").cast("double") * col("n_b").cast("double")))
          .cast("long").as("lift_ppm"))
  }

  val basketLiftSql: String =
    s"""WITH items AS (
       |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
       |freq AS (SELECT pk, COUNT(*) AS n_item FROM items GROUP BY pk),
       |no AS (SELECT COUNT(DISTINCT ok) AS n_orders FROM items),
       |pairs AS (
       |  SELECT a.pk AS pa, b.pk AS pb, COUNT(*) AS n_ab
       |  FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
       |  GROUP BY 1, 2 HAVING COUNT(*) >= $MinSupport)
       |SELECT pa, pb, n_ab,
       |  ${sqlPpm("n_ab", "n_orders")} AS support_ppm,
       |  CAST(floor(1e6 * CAST(n_ab AS DOUBLE) * CAST(n_orders AS DOUBLE)
       |    / (CAST(fa.n_item AS DOUBLE) * CAST(fb.n_item AS DOUBLE)))
       |    AS BIGINT) AS lift_ppm
       |FROM pairs
       |JOIN freq fa ON pairs.pa = fa.pk
       |JOIN freq fb ON pairs.pb = fb.pk
       |CROSS JOIN no""".stripMargin

  // ------------------------------------- revenue concentration
  /** Pareto / revenue-concentration readout: the smallest top slice
    * of customers covering ≥ 80% of total spend ("do 20% of
    * customers carry 80% of revenue?"). Spend is bucketed into 256
    * fixed-width cells so the cumulative walk runs top-down over a
    * METADATA-sized histogram — no global sort of the customer table
    * at any scale (the per-customer aggregate is the only corpus-size
    * shuffle). The 80% threshold test is pure integer arithmetic
    * (`cum·5 ≥ total·4`), and the covering bucket's exact coverage
    * ships in-band.
    */
  val ParetoBucketCents = 5000000L // 50k-dollar cells

  def ordersPareto(spark: SparkSession, dir: String): DataFrame = {
    val cust = table(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("cents"))
    val buckets = cust
      .groupBy(least(expr(s"cents div $ParetoBucketCents"), lit(255L))
        .as("b"))
      .agg(count(lit(1)).as("n_cust"), sum(col("cents")).as("cents_b"))
    val w = Window.orderBy(col("b").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val walked = buckets
      .withColumn("cum_cents", sum(col("cents_b")).over(w))
      .withColumn("cum_cust", sum(col("n_cust")).over(w))
    val totals = cust.agg(count(lit(1)).as("n_customers"),
      sum(col("cents")).as("total_cents"))
    // threshold compare in DECIMAL(38,0): cents·5 would pass 2^63 once
    // total revenue exceeds ~1.8e18 cents — exact at any corpus, and
    // the oracle's HUGEINT arithmetic matches
    val dec38 = (c: Column) =>
      c.cast(org.apache.spark.sql.types.DecimalType(38, 0))
    walked.crossJoin(broadcast(totals))
      .where(dec38(col("cum_cents")) * 5 >= dec38(col("total_cents")) * 4 &&
        dec38(col("cum_cents") - col("cents_b")) * 5 <
          dec38(col("total_cents")) * 4)
      .select(col("n_customers"), col("total_cents"),
        col("cum_cust").as("n_top_customers"),
        col("cum_cents").as("covered_cents"),
        ppm(col("cum_cents"), col("total_cents")).as("covered_ppm"),
        ppm(col("cum_cust"), col("n_customers")).as("top_customer_ppm"))
  }

  val ordersParetoSql: String =
    s"""WITH cust AS (
       |  SELECT o_custkey,
       |    CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
       |      AS cents
       |  FROM orders GROUP BY 1),
       |buckets AS (
       |  SELECT least(cents // $ParetoBucketCents, 255) AS b,
       |    COUNT(*) AS n_cust, CAST(SUM(cents) AS BIGINT) AS cents_b
       |  FROM cust GROUP BY 1),
       |walked AS (
       |  SELECT b, n_cust, cents_b,
       |    CAST(SUM(cents_b) OVER (ORDER BY b DESC
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents,
       |    CAST(SUM(n_cust) OVER (ORDER BY b DESC
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cust
       |  FROM buckets),
       |totals AS (
       |  SELECT COUNT(*) AS n_customers, CAST(SUM(cents) AS BIGINT)
       |    AS total_cents
       |  FROM cust)
       |SELECT n_customers, total_cents, cum_cust AS n_top_customers,
       |  cum_cents AS covered_cents,
       |  ${sqlPpm("cum_cents", "total_cents")} AS covered_ppm,
       |  ${sqlPpm("cum_cust", "n_customers")} AS top_customer_ppm
       |FROM walked, totals
       |WHERE CAST(cum_cents AS HUGEINT) * 5
       |    >= CAST(total_cents AS HUGEINT) * 4
       |  AND CAST(cum_cents - cents_b AS HUGEINT) * 5
       |    < CAST(total_cents AS HUGEINT) * 4""".stripMargin

  // --------------------------------------------- cohort LTV matrix
  /** Cohort lifetime-value matrix — the BI readout behind every
    * retention-revenue dashboard: customers are cohorted by their
    * FIRST order month, and each (cohort, months-since-first) cell
    * accumulates the cohort's revenue, with per-customer LTV as exact
    * integer division. Month arithmetic uses a flat year·12+month
    * index so both engines subtract identical integers.
    *
    * Scale shape: one shuffle on custkey for the first-order
    * aggregate, one co-partitioned join back, then a (cohort, age)
    * aggregate — cells are calendar-bounded metadata regardless of
    * corpus size.
    */
  def ordersCohortLtv(spark: SparkSession, dir: String): DataFrame = {
    val midx = (d: Column) => (year(d) * 12 + month(d) - 1).cast("long")
    val o = table(spark, dir, "orders")
      .select(col("o_custkey"),
        midx(col("o_orderdate").cast("date")).as("m"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"))
    val first = o.groupBy(col("o_custkey")).agg(min(col("m")).as("m0"))
    val sized = first.groupBy(col("m0"))
      .agg(count(lit(1)).as("n_customers"))
    o.join(first, "o_custkey")
      .groupBy(col("m0").as("cohort_month"), (col("m") - col("m0"))
        .as("age_months"))
      .agg(sum(col("cents")).as("cents"))
      .join(sized.select(col("m0").as("cohort_month"),
        col("n_customers")), "cohort_month")
      .select(col("cohort_month"), col("age_months"), col("n_customers"),
        col("cents"),
        expr("cents div n_customers").as("cents_per_customer"))
  }

  val ordersCohortLtvSql: String =
    """WITH o AS (
      |  SELECT o_custkey,
      |    CAST(year(CAST(o_orderdate AS DATE)) * 12
      |      + month(CAST(o_orderdate AS DATE)) - 1 AS BIGINT) AS m,
      |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders),
      |f AS (SELECT o_custkey, MIN(m) AS m0 FROM o GROUP BY 1),
      |sz AS (SELECT m0, COUNT(*) AS n_customers FROM f GROUP BY 1),
      |cells AS (
      |  SELECT f.m0 AS cohort_month, o.m - f.m0 AS age_months,
      |    CAST(SUM(o.cents) AS BIGINT) AS cents
      |  FROM o JOIN f ON o.o_custkey = f.o_custkey
      |  GROUP BY 1, 2)
      |SELECT c.cohort_month, c.age_months, sz.n_customers, c.cents,
      |  c.cents // sz.n_customers AS cents_per_customer
      |FROM cells c JOIN sz ON c.cohort_month = sz.m0""".stripMargin

  // ----------------------------------------- seasonality profile
  /** Day-of-week seasonality: per-weekday order volume and revenue
    * indexed against the uniform expectation in exact ppm (1e6/7 per
    * day ⇒ index > 1e6 means an over-trafficked weekday). One
    * shuffle collapsing the fact table to 7 cells; both engines use
    * the same 0=Sunday weekday numbering via explicit `dayofweek`
    * alignment (DuckDB is 0-based, Spark 1-based — normalized here).
    */
  def ordersSeasonality(spark: SparkSession, dir: String): DataFrame = {
    val byDow = table(spark, dir, "orders")
      .groupBy((dayofweek(col("o_orderdate").cast("date")) - 1)
        .cast("long").as("dow"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("o_totalprice") * 100).cast("long")).as("cents"))
    val tot = byDow.agg(sum(col("n")).as("n_total"),
      sum(col("cents")).as("cents_total"))
    byDow.crossJoin(broadcast(tot))
      .select(col("dow"), col("n"), col("cents"),
        ppm(col("n") * 7, col("n_total")).as("volume_index_ppm"),
        ppm(col("cents") * 7, col("cents_total")).as("revenue_index_ppm"))
      .orderBy(col("dow"))
  }

  val ordersSeasonalitySql: String =
    s"""WITH d AS (
       |  SELECT CAST(dayofweek(CAST(o_orderdate AS DATE)) AS BIGINT)
       |      AS dow,
       |    COUNT(*) AS n,
       |    CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
       |      AS cents
       |  FROM orders GROUP BY 1),
       |t AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total,
       |  CAST(SUM(cents) AS BIGINT) AS cents_total FROM d)
       |SELECT dow, n, cents,
       |  ${sqlPpm("n * 7", "n_total")} AS volume_index_ppm,
       |  ${sqlPpm("cents * 7", "cents_total")} AS revenue_index_ppm
       |FROM d, t ORDER BY dow""".stripMargin

  // ------------------------------------- market concentration (HHI)
  /** Herfindahl–Hirschman market-concentration index per nation: the
    * sum of squared supplier market shares (shares of the nation's
    * derived supply volume, in ppm) — the antitrust-style
    * concentration readout; 1e12 = monopoly, 1e12/n = perfect
    * competition. Overflow-safe at ANY supplier count: non-negative
    * shares summing to ≤ 1e6 give Σ share² ≤ (Σ share)² = 1e12 — the
    * per-nation SUM is bounded by the monopoly value itself, not by
    * the supplier count. One lineitem shuffle on suppkey,
    * nation-sized joins after.
    */
  def supplierHhi(spark: SparkSession, dir: String): DataFrame = {
    val supVol = table(spark, dir, "lineitem")
      .groupBy(col("l_suppkey"))
      .agg(sum(floor(col("l_extendedprice") * 100).cast("long"))
        .as("cents"))
      .join(table(spark, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
    val natTot = supVol.groupBy(col("s_nationkey"))
      .agg(sum(col("cents")).as("nat_cents"),
        count(lit(1)).as("n_suppliers"))
    supVol.join(natTot, "s_nationkey")
      .select(col("s_nationkey"),
        ppm(col("cents"), col("nat_cents")).as("share_ppm"),
        col("n_suppliers"))
      .groupBy(col("s_nationkey"))
      .agg(first(col("n_suppliers")).as("n_suppliers"),
        sum(col("share_ppm") * col("share_ppm")).as("hhi_pptr"))
      .join(broadcast(table(spark, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("n_suppliers"), col("hhi_pptr"))
      .orderBy(col("n_name"))
  }

  val supplierHhiSql: String =
    s"""WITH sv AS (
       |  SELECT l_suppkey,
       |    CAST(SUM(CAST(floor(l_extendedprice * 100) AS BIGINT))
       |      AS BIGINT) AS cents
       |  FROM lineitem GROUP BY 1),
       |sn AS (
       |  SELECT sv.l_suppkey, sv.cents, s.s_nationkey
       |  FROM sv JOIN supplier s ON sv.l_suppkey = s.s_suppkey),
       |nt AS (
       |  SELECT s_nationkey, CAST(SUM(cents) AS BIGINT) AS nat_cents,
       |    COUNT(*) AS n_suppliers
       |  FROM sn GROUP BY 1),
       |shares AS (
       |  SELECT sn.s_nationkey, n_suppliers,
       |    ${sqlPpm("sn.cents", "nt.nat_cents")} AS share_ppm
       |  FROM sn JOIN nt ON sn.s_nationkey = nt.s_nationkey)
       |SELECT n.n_name, ANY_VALUE(n_suppliers) AS n_suppliers,
       |  CAST(SUM(share_ppm * share_ppm) AS BIGINT) AS hhi_pptr
       |FROM shares JOIN nation n ON shares.s_nationkey = n.n_nationkey
       |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin

  // --------------------------------------- OLS trend regression
  /** Ordinary-least-squares revenue trend — the statistics family:
    * regress daily revenue on the day index with slope, intercept,
    * and r² all derived from EXACT sums (the normal equations'
    * Σx, Σy, Σxy, Σx², Σy² accumulate as integers — second-order sums
    * through DECIMAL(38,0)/HUGEINT so y² cannot overflow int64 at any
    * corpus — and the final divides are IEEE ops on identical
    * operands). The fact table collapses to the per-day series first;
    * the regression itself runs over metadata.
    */
  def statOlsRevenue(spark: SparkSession, dir: String): DataFrame = {
    val daily = table(spark, dir, "orders")
      .groupBy(epochDay(col("o_orderdate")).as("day"))
      .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("cents"))
    val d0 = daily.agg(min(col("day")).as("d0"))
    val xy = daily.crossJoin(broadcast(d0))
      .select((col("day") - col("d0")).as("x"), col("cents").as("y"))
    val dec = (c: Column) => c.cast(org.apache.spark.sql.types
      .DecimalType(38, 0))
    val sums = xy.agg(
      count(lit(1)).as("n"), sum(col("x")).as("sx"),
      sum(col("y")).as("sy"),
      sum(dec(col("x")) * dec(col("y"))).as("sxy"),
      sum(dec(col("x")) * dec(col("x"))).as("sxx"),
      sum(dec(col("y")) * dec(col("y"))).as("syy"))
    val d = (c: Column) => c.cast("double")
    val covN = d(sums("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))
    val varX = d(sums("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))
    val varY = d(sums("n")) * d(col("syy")) - d(col("sy")) * d(col("sy"))
    // degenerate series (single day, or constant revenue) make varX or
    // varY zero: Spark's non-ANSI floor(NaN).cast(long) would emit 0
    // while the DuckDB twin's CAST errors — guard BOTH sides with the
    // same explicit zero (same divergence class as events_abtest)
    sums.select(
      col("n"),
      when(varX === 0, lit(0L)).otherwise(
        floor(lit(1e3) * covN / varX).cast("long")).as("slope_milli"),
      when(varX === 0, lit(0L)).otherwise(
        floor((d(col("sy")) - (covN / varX) * d(col("sx"))) / d(sums("n")))
          .cast("long")).as("intercept_cents"),
      when(varX === 0 || varY === 0, lit(0L)).otherwise(
        floor(lit(1e6) * covN * covN / (varX * varY)).cast("long"))
        .as("r2_ppm"))
  }

  val statOlsRevenueSql: String = {
    val covN = "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) " +
      "- CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    val varX = "(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) " +
      "- CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    val varY = "(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) " +
      "- CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))"
    s"""WITH daily AS (
       |  SELECT ${sqlEpochDay("o_orderdate")} AS day,
       |    CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
       |      AS cents
       |  FROM orders GROUP BY 1),
       |xy AS (
       |  SELECT day - (SELECT MIN(day) FROM daily) AS x, cents AS y
       |  FROM daily),
       |sums AS (
       |  SELECT COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS sx,
       |    CAST(SUM(y) AS BIGINT) AS sy,
       |    SUM(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
       |    SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
       |    SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy
       |  FROM xy)
       |SELECT n,
       |  CASE WHEN $varX = 0 THEN 0
       |    ELSE CAST(floor(1e3 * $covN / $varX) AS BIGINT)
       |  END AS slope_milli,
       |  CASE WHEN $varX = 0 THEN 0
       |    ELSE CAST(floor((CAST(sy AS DOUBLE) - ($covN / $varX)
       |      * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)) AS BIGINT)
       |  END AS intercept_cents,
       |  CASE WHEN $varX = 0 OR $varY = 0 THEN 0
       |    ELSE CAST(floor(1e6 * $covN * $covN / ($varX * $varY)) AS BIGINT)
       |  END AS r2_ppm
       |FROM sums""".stripMargin
  }

  // ------------------------------------------- RFM segmentation
  /** RFM customer segmentation — the classic BI scoring: per customer
    * Recency (days since last order), Frequency (order count), and
    * Monetary (exact total spend), each scored 1–5 against the
    * customer population's quintile boundaries, rolled up to segment
    * counts.
    *
    * Scale shape: the per-customer aggregate is one shuffle on
    * custkey with map-side combine; quintile boundaries collapse to
    * ONE broadcast row, so scoring is a per-row comparison — no
    * global sort, no ntile window over the customer table (the
    * rank-based formulation would order all customers globally; the
    * boundary-based one is the distributed form, and at 100 TB the
    * exact-percentile boundary aggregate swaps for the
    * [[TextQueries.sketchQuantile]] histogram — same contract,
    * mergeable build).
    *
    * Determinism: counts and day-diffs are exact ints, spend is
    * fsum-floored; `percentile`/`quantile_cont` interpolate
    * identically on identical operands (the proven
    * percentile_quantity pattern), and score assignment only
    * compares those exact values against the shared boundaries.
    */
  def ordersRfm(spark: SparkSession, dir: String): DataFrame = {
    val cust = table(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(max(col("o_orderdate").cast("date")).as("last_order"),
        count(lit(1)).as("freq"),
        fsum(col("o_totalprice"), 100.0).as("spend"))
    val refDate = table(spark, dir, "orders")
      .agg(max(col("o_orderdate").cast("date")).as("ref_date"))
    val rfm = cust.crossJoin(broadcast(refDate))
      .select(col("o_custkey"),
        datediff(col("ref_date"), col("last_order")).cast("long")
          .as("recency"),
        col("freq"), col("spend"))
      .cache() // feeds both the boundary aggregate and the scoring pass
    val bounds = rfm.agg(
      percentile(col("recency"), lit(0.2)).as("r20"),
      percentile(col("recency"), lit(0.4)).as("r40"),
      percentile(col("recency"), lit(0.6)).as("r60"),
      percentile(col("recency"), lit(0.8)).as("r80"),
      percentile(col("freq"), lit(0.2)).as("f20"),
      percentile(col("freq"), lit(0.4)).as("f40"),
      percentile(col("freq"), lit(0.6)).as("f60"),
      percentile(col("freq"), lit(0.8)).as("f80"),
      percentile(col("spend"), lit(0.2)).as("m20"),
      percentile(col("spend"), lit(0.4)).as("m40"),
      percentile(col("spend"), lit(0.6)).as("m60"),
      percentile(col("spend"), lit(0.8)).as("m80"))
    def above(x: Column, b: String*): Column =
      b.map(n => (x > col(n)).cast("long")).reduce(_ + _) + 1L
    rfm.crossJoin(broadcast(bounds))
      // recency: LOWER is better, so invert the ascending score
      .withColumn("r_score",
        lit(6L) - above(col("recency"), "r20", "r40", "r60", "r80"))
      .withColumn("f_score", above(col("freq"), "f20", "f40", "f60", "f80"))
      .withColumn("m_score", above(col("spend"), "m20", "m40", "m60", "m80"))
      .groupBy((col("r_score") * 100 + col("f_score") * 10 +
        col("m_score")).as("segment"))
      .agg(count(lit(1)).as("n_customers"),
        fsum(col("spend"), 100.0).as("segment_spend"))
      .orderBy(col("segment"))
  }

  val ordersRfmSql: String = {
    def above(x: String, pfx: String): String =
      Seq(20, 40, 60, 80)
        .map(p => s"(CASE WHEN $x > $pfx$p THEN 1 ELSE 0 END)")
        .mkString("(", " + ", " + 1)")
    s"""WITH cust AS (
       |  SELECT o_custkey, MAX(CAST(o_orderdate AS DATE)) AS last_order,
       |    COUNT(*) AS freq, ${sqlFsum("o_totalprice", "100.0")} AS spend
       |  FROM orders GROUP BY 1),
       |ref AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS ref_date FROM orders),
       |rfm AS (
       |  SELECT o_custkey,
       |    CAST(date_diff('day', last_order, ref_date) AS BIGINT) AS recency,
       |    freq, spend
       |  FROM cust, ref),
       |bounds AS (
       |  SELECT
       |    quantile_cont(recency, 0.2) AS r20, quantile_cont(recency, 0.4) AS r40,
       |    quantile_cont(recency, 0.6) AS r60, quantile_cont(recency, 0.8) AS r80,
       |    quantile_cont(freq, 0.2) AS f20, quantile_cont(freq, 0.4) AS f40,
       |    quantile_cont(freq, 0.6) AS f60, quantile_cont(freq, 0.8) AS f80,
       |    quantile_cont(spend, 0.2) AS m20, quantile_cont(spend, 0.4) AS m40,
       |    quantile_cont(spend, 0.6) AS m60, quantile_cont(spend, 0.8) AS m80
       |  FROM rfm),
       |scored AS (
       |  SELECT
       |    6 - ${above("recency", "r")} AS r_score,
       |    ${above("freq", "f")} AS f_score,
       |    ${above("spend", "m")} AS m_score,
       |    spend
       |  FROM rfm, bounds)
       |SELECT CAST(r_score * 100 + f_score * 10 + m_score AS BIGINT)
       |    AS segment,
       |  COUNT(*) AS n_customers, ${sqlFsum("spend", "100.0")} AS segment_spend
       |FROM scored GROUP BY 1 ORDER BY segment""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "orders_seasonality" -> (ordersSeasonality _),
    "orders_cohort_ltv" -> (ordersCohortLtv _),
    "supplier_hhi" -> (supplierHhi _),
    "orders_pareto" -> (ordersPareto _),
    "stat_ols_revenue" -> (statOlsRevenue _),
    "orders_rfm" -> (ordersRfm _),
    "basket_lift" -> (basketLift _),
    "q7_volume_shipping" -> (q7VolumeShipping _),
    "q8_market_share" -> (q8MarketShare _),
    "q13_customer_distribution" -> (q13CustomerDistribution _),
    "q15_top_supplier" -> (q15TopSupplier _),
    "q17_smallqty_revenue" -> (q17SmallQtyRevenue _),
    "q21_waiting_supplier" -> (q21WaitingSupplier _),
    "q22_global_sales" -> (q22GlobalSales _))

  val oracles: Map[String, String] = Map(
    "orders_seasonality" -> ordersSeasonalitySql,
    "orders_cohort_ltv" -> ordersCohortLtvSql,
    "supplier_hhi" -> supplierHhiSql,
    "orders_pareto" -> ordersParetoSql,
    "stat_ols_revenue" -> statOlsRevenueSql,
    "orders_rfm" -> ordersRfmSql,
    "basket_lift" -> basketLiftSql,
    "q7_volume_shipping" -> q7Sql,
    "q8_market_share" -> q8Sql,
    "q13_customer_distribution" -> q13Sql,
    "q15_top_supplier" -> q15Sql,
    "q17_smallqty_revenue" -> q17Sql,
    "q21_waiting_supplier" -> q21Sql,
    "q22_global_sales" -> q22Sql)
}

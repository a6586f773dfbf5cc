package graft.analytics

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import QueryUtil._

/** Relational breadth layer (SURVEY.md §7 Phase 4): scan / filter /
  * multi-way join / semi / anti / window / rollup / cube / set-op /
  * distinct / having / top-k over the driver's TPC-H-ish tables.
  *
  * Scale notes baked into every plan:
  *  - dimensions (`region`, `nation`, `supplier`, `customer`) are
  *    broadcast explicitly — at 100 TB the fact tables shuffle on
  *    join keys only when both sides are large;
  *  - aggregates run partial (map-side combine) because they are
  *    plain `groupBy.agg` over codegen'd expressions;
  *  - top-k is `orderBy.limit` which compiles to
  *    TakeOrderedAndProject (per-partition heap, no global sort);
  *  - money math is DECIMAL-cast so results are order-independent
  *    and engine-independent (see [[QueryUtil.dsum]]).
  */
object TpchQueries {

  private def ts(s: String): Column = lit(Timestamp.valueOf(s))

  // ------------------------------------------------------------ Q1
  /** Q1-style pricing summary: full-scan partial aggregation; at 100 TB
    * this is the map-side-combine workhorse — one shuffle of ~6 groups.
    */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .where(col("l_shipdate") <= ts("1998-09-02 00:00:00"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
          .as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) *
          (lit(1) + col("l_tax")), 6).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))

  val q1Sql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${sqlDsum("l_quantity")} AS sum_qty,
       |  ${sqlDsum("l_extendedprice")} AS sum_base_price,
       |  ${sqlDsum("l_extendedprice * (1 - l_discount)", 4)} AS sum_disc_price,
       |  ${sqlDsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 6)} AS sum_charge,
       |  ${sqlDavg("l_quantity")} AS avg_qty,
       |  ${sqlDavg("l_extendedprice")} AS avg_price,
       |  ${sqlDavg("l_discount")} AS avg_disc,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
       |GROUP BY l_returnflag, l_linestatus""".stripMargin

  // ------------------------------------------------------------ Q3
  /** Q3-style shipping priority: filtered 3-way join, aggregate,
    * global top-10. `customer` is a broadcast dim; `orders ⨝ lineitem`
    * shuffles on the order key — the natural co-partitioning at scale.
    */
  def q3ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val c = table(spark, dir, "customer")
      .where(col("c_mktsegment") === "BUILDING")
    val o = table(spark, dir, "orders")
      .where(col("o_orderdate") < ts("1998-01-01 00:00:00"))
    val l = table(spark, dir, "lineitem")
      .where(col("l_shipdate") > ts("1998-01-01 00:00:00"))
    broadcast(c)
      .join(o, c("c_custkey") === o("o_custkey"))
      .join(l, o("o_orderkey") === l("l_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderdate").asc,
        col("l_orderkey").asc)
      .limit(10)
  }

  val q3Sql: String =
    s"""SELECT l_orderkey, o_orderdate,
       |  ${sqlDsum("l_extendedprice * (1 - l_discount)", 4)} AS revenue
       |FROM customer JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON o_orderkey = l_orderkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
       |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
       |GROUP BY l_orderkey, o_orderdate
       |ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
       |LIMIT 10""".stripMargin

  // ------------------------------------------------------------ Q5
  /** Q5-style local-supplier volume: 6-way join; all four dims are
    * broadcast so the only shuffle is lineitem ⨝ orders. The
    * customer-nation = supplier-nation condition is applied post-join
    * as a filter on two broadcast-sourced columns.
    */
  def q5LocalSupplier(spark: SparkSession, dir: String): DataFrame = {
    val r = table(spark, dir, "region").where(col("r_name") === "ASIA")
    val n = table(spark, dir, "nation")
    val c = table(spark, dir, "customer")
    val s = table(spark, dir, "supplier")
    val o = table(spark, dir, "orders")
      .where(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
        col("o_orderdate") < ts("1998-01-01 00:00:00"))
    val l = table(spark, dir, "lineitem")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(s), l("l_suppkey") === s("s_suppkey") &&
        c("c_nationkey") === s("s_nationkey"))
      .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
        .as("revenue"))
  }

  val q5Sql: String =
    s"""SELECT n_name,
       |  ${sqlDsum("l_extendedprice * (1 - l_discount)", 4)} AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE r_name = 'ASIA'
       |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
       |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
       |GROUP BY n_name""".stripMargin

  // ----------------------------------------------------- semi / anti
  /** Left-semi join: orders with at least one high-quantity lineitem.
    * Semi joins ship only the join key of the right side — at scale
    * this is the EXISTS idiom that avoids materializing the match.
    */
  def joinSemiHighQty(spark: SparkSession, dir: String): DataFrame = {
    val o = table(spark, dir, "orders")
    val l = table(spark, dir, "lineitem").where(col("l_quantity") >= 48)
    o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
      .select(col("o_orderkey"), col("o_orderstatus"))
  }

  val joinSemiSql: String =
    """SELECT o_orderkey, o_orderstatus FROM orders o
      |WHERE EXISTS (SELECT 1 FROM lineitem l
      |  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 48)""".stripMargin

  /** Left-anti join: customers with no order since 2000. The anti side
    * only needs the distinct key set — Spark builds a hash of o_custkey
    * from the filtered (small) order subset.
    */
  def joinAntiNoOrders(spark: SparkSession, dir: String): DataFrame = {
    val c = table(spark, dir, "customer")
    val o = table(spark, dir, "orders")
      .where(col("o_orderdate") >= ts("2000-01-01 00:00:00"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
  }

  val joinAntiSql: String =
    """SELECT c_custkey, c_name FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |  WHERE o.o_custkey = c.c_custkey
      |    AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')""".stripMargin

  // ------------------------------------------------------- windows
  /** Ranking window: top-3 orders per customer by total price.
    * Partitioned window (one shuffle on o_custkey), deterministic
    * tiebreak on the key.
    */
  def windowTopkOrders(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    table(spark, dir, "orders")
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= 3)
      .select(col("o_custkey"), col("rnk"), col("o_orderkey"),
        col("o_totalprice"))
  }

  val windowTopkSql: String =
    """SELECT o_custkey, rnk, o_orderkey, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |         row_number() OVER (PARTITION BY o_custkey
      |           ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
      |  FROM orders) WHERE rnk <= 3""".stripMargin

  /** Running-total + lag window over an unbounded-preceding frame,
    * DECIMAL-cast so the running double sums agree across engines.
    */
  def windowRunningTotal(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    table(spark, dir, "orders")
      .select(
        col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        sum(col("o_totalprice").cast("decimal(18,2)"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("running_total"),
        lag(col("o_orderkey"), 1).over(w).as("prev_orderkey"))
  }

  val windowRunningSql: String =
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    AS running_total,
      |  lag(o_orderkey, 1) OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate ASC, o_orderkey ASC) AS prev_orderkey
      |FROM orders""".stripMargin

  // ------------------------------------------------- rollup / cube
  /** ROLLUP with GROUPING markers: subtotal + grand-total rows. The
    * grouping-id columns disambiguate genuine NULL keys from subtotal
    * rows — required for an unambiguous oracle compare.
    */
  def aggRollupLineitem(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n"),
        grouping(col("l_returnflag")).cast("long").as("g_rf"),
        grouping(col("l_linestatus")).cast("long").as("g_ls"))

  val aggRollupSql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${sqlDsum("l_quantity")} AS sum_qty, COUNT(*) AS n,
       |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
       |  CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls
       |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin

  /** CUBE over status × order year (all four grouping combinations). */
  def aggCubeOrders(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .select(col("o_orderstatus"),
        year(col("o_orderdate")).cast("long").as("o_year"),
        col("o_totalprice"))
      .cube(col("o_orderstatus"), col("o_year"))
      .agg(
        count(lit(1)).as("n"),
        dsum(col("o_totalprice")).as("sum_price"),
        grouping(col("o_orderstatus")).cast("long").as("g_st"),
        grouping(col("o_year")).cast("long").as("g_yr"))

  val aggCubeSql: String =
    s"""WITH t AS (SELECT o_orderstatus,
       |  CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
       |  o_totalprice FROM orders)
       |SELECT o_orderstatus, o_year, COUNT(*) AS n,
       |  ${sqlDsum("o_totalprice")} AS sum_price,
       |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_st,
       |  CAST(GROUPING(o_year) AS BIGINT) AS g_yr
       |FROM t GROUP BY CUBE(o_orderstatus, o_year)""".stripMargin

  /** Explicit GROUPING SETS (disjoint dimension rollups in one pass)
    * through the SQL front door — Spark plans one Expand + aggregate,
    * not two scans.
    */
  def aggGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    graft.core.Tables.registerAll(spark, dir)
    spark.sql(
      s"""SELECT l_returnflag, l_linestatus,
         |  ${sqlDsum("l_quantity")} AS sum_qty, COUNT(*) AS n,
         |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
         |  CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls
         |FROM lineitem
         |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""".stripMargin)
  }

  val aggGroupingSetsSql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${sqlDsum("l_quantity")} AS sum_qty, COUNT(*) AS n,
       |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
       |  CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls
       |FROM lineitem
       |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""".stripMargin

  /** Deterministic 10% sample by key hash — the reproducible sampling
    * pattern (TABLESAMPLE/df.sample draw engine-specific randomness;
    * a hash-mod predicate gives the same sample everywhere, pushes
    * into the scan, and stays stable across reruns — what you want
    * for debugging subsets of 100 TB).
    */
  def sampleHashOrders(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .where(pmod(graft.functions.CrossHash.md5Long(
        col("o_orderkey").cast("string")), lit(10)) === 0)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))

  val sampleHashSql: String =
    s"""SELECT o_orderstatus, COUNT(*) AS n,
       |  ${sqlDsum("o_totalprice")} AS sum_price
       |FROM orders
       |WHERE ${graft.functions.CrossHash.sqlMd5Long(
           "CAST(o_orderkey AS VARCHAR)")} % 10 = 0
       |GROUP BY o_orderstatus""".stripMargin

  /** Q14-style promo revenue ratio: one month of lineitem joined to
    * the part dimension (broadcast), two conditional exact-decimal
    * sums, ratio as ppm. The classic "what fraction of revenue came
    * from segment X" shape — dimension broadcast + one scan, no
    * fact-side shuffle at all (global aggregate, map-side partials).
    */
  def q14PromoRevenue(spark: SparkSession, dir: String): DataFrame = {
    val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
    val promo = when(col("p_type") === "ECONOMY", rev)
    table(spark, dir, "lineitem")
      .where(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
        col("l_shipdate") < ts("1996-02-01 00:00:00"))
      .join(broadcast(table(spark, dir, "part")),
        col("l_partkey") === col("p_partkey"))
      .agg(dsum(promo, 4).as("promo_revenue"),
        dsum(rev, 4).as("total_revenue"),
        count(lit(1)).as("n"))
      .withColumn("promo_ppm",
        ppm(col("promo_revenue"), col("total_revenue")))
  }

  val q14PromoRevenueSql: String = {
    val rev = "l_extendedprice * (1 - l_discount)"
    s"""SELECT
       |  ${sqlDsum(s"CASE WHEN p_type = 'ECONOMY' THEN $rev END", 4)}
       |    AS promo_revenue,
       |  ${sqlDsum(rev, 4)} AS total_revenue,
       |  COUNT(*) AS n,
       |  ${sqlPpm(
           s"CAST(SUM(CAST((CASE WHEN p_type = 'ECONOMY' THEN $rev END) AS DECIMAL(18,4))) AS DOUBLE)",
           s"CAST(SUM(CAST(($rev) AS DECIMAL(18,4))) AS DOUBLE)")} AS promo_ppm
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |  AND l_shipdate < TIMESTAMP '1996-02-01 00:00:00'""".stripMargin
  }

  /** RANGE window frame (vs. the ROWS frames elsewhere): trailing
    * 30-day spend per customer. A RANGE frame is defined by the ORDER
    * BY *values*, so peer rows (same day) always share a frame — the
    * result is deterministic even under tied sort keys, where a ROWS
    * frame would depend on shuffle order. The order key is an integer
    * day number (exact in both engines).
    */
  def windowRangeFrame(spark: SparkSession, dir: String): DataFrame = {
    val day = datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("day"))
      .rangeBetween(-30, 0)
    table(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        day.cast("long").as("day"), col("o_totalprice"))
      .withColumn("trailing30_spend",
        sum(col("o_totalprice").cast("decimal(18,2)")).over(w)
          .cast("double"))
      .select(col("o_custkey"), col("o_orderkey"), col("day"),
        col("trailing30_spend"))
  }

  val windowRangeFrameSql: String =
    """SELECT o_custkey, o_orderkey,
      |  CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
      |    AS BIGINT) AS day,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
      |    PARTITION BY o_custkey
      |    ORDER BY date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
      |    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    AS trailing30_spend
      |FROM orders""".stripMargin

  /** KMV (k-minimum-values / bottom-k) distinct-count sketch: keep the
    * k smallest distinct hash values per group; the k-th one estimates
    * the distinct count as `(k-1)·2^56 / h_k` (hashes are uniform in
    * [0, 2^56)). Unlike HLL, the sketch content is DETERMINISTIC given
    * the hash function, so this approx-distinct is exactly
    * oracle-checkable — and like HLL it is mergeable with bounded
    * state (a production aggregate keeps k values per partial, same
    * shape as [[graft.functions.TopKAgg]]; here the bottom-k is
    * expressed as distinct+rank, whose shuffle is also one key). The
    * exact count rides along to expose the estimation error.
    */
  val KmvK = 64
  def approxDistinctKmv(spark: SparkSession, dir: String): DataFrame = {
    val h = graft.functions.CrossHash.md5Long(col("o_custkey").cast("string"))
    val o = table(spark, dir, "orders")
    val hashes = o.select(col("o_orderstatus"), h.as("h")).distinct()
    val w = Window.partitionBy(col("o_orderstatus")).orderBy(col("h"))
    val kth = hashes.withColumn("r", row_number().over(w))
      .where(col("r") === KmvK)
      .select(col("o_orderstatus"), col("h").as("kth_hash"))
    val exact = o.groupBy(col("o_orderstatus"))
      .agg(countDistinct(col("o_custkey")).as("n_exact"))
    exact.join(kth, "o_orderstatus")
      .select(col("o_orderstatus"), col("n_exact"), col("kth_hash"),
        floor(lit((KmvK - 1).toLong << 56).cast("double") /
          col("kth_hash").cast("double")).cast("long").as("est_distinct"))
  }

  val approxDistinctKmvSql: String =
    s"""WITH h AS (
       |  SELECT DISTINCT o_orderstatus,
       |    ${graft.functions.CrossHash.sqlMd5Long(
             "CAST(o_custkey AS VARCHAR)")} AS h
       |  FROM orders),
       |r AS (SELECT o_orderstatus, h,
       |  row_number() OVER (PARTITION BY o_orderstatus ORDER BY h) AS r
       |  FROM h),
       |kth AS (SELECT o_orderstatus, h AS kth_hash FROM r WHERE r = $KmvK),
       |e AS (SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_exact
       |  FROM orders GROUP BY 1)
       |SELECT e.o_orderstatus, e.n_exact, kth.kth_hash,
       |  CAST(floor(CAST(${(KmvK - 1).toLong << 56} AS DOUBLE)
       |    / CAST(kth.kth_hash AS DOUBLE)) AS BIGINT) AS est_distinct
       |FROM e JOIN kth USING (o_orderstatus)""".stripMargin

  /** KMV sketch ALGEBRA — the mergeability that makes bottom-k the
    * production distinct sketch: two customer sets (1996 vs 1997
    * buyers) each reduce to a [[KmvK]]-value sketch, the UNION
    * estimate comes from merging the two sketches (bottom-k of their
    * concatenation — raw data is never revisited), and the
    * INTERSECTION estimate is ρ·|U| where ρ is the fraction of the
    * union sketch present in both input sketches (the standard KMV
    * Jaccard estimator). Exact counts ride along to expose the error.
    * Short-set guard: a sketch with fewer than k values IS its set,
    * so the estimate collapses to the exact count (`m < k ⇒ est = m`).
    *
    * Scale shape: each sketch is `orderBy(h).limit(k)` —
    * TakeOrderedAndProject, O(k) state per partition, no global sort;
    * every estimator after that runs on ≤3k rows on the driver-side
    * plan. Deterministic because the sketch CONTENT (not just the
    * estimate) is a pure function of the md5 hash order.
    */
  def sketchKmvSetops(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.CrossHash.md5Long
    val o = table(spark, dir, "orders")
    def slice(y: Int): DataFrame = o
      .where(year(col("o_orderdate")) === y)
      .select(md5Long(col("o_custkey").cast("string")).as("h"))
      .distinct()
    val a = slice(1996).cache()
    val b = slice(1997).cache()
    def sk(s: DataFrame): DataFrame = s.orderBy(col("h")).limit(KmvK)
    val skA = sk(a).cache()
    val skB = sk(b).cache()
    val skU = sk(skA.union(skB).distinct()).cache()
    // est from a sketch: m < k ⇒ exact m; else (k-1)·2^56 / kth.
    // The sketch size m rides along (aliased per caller) so the union
    // estimator can reuse THIS code path for its ρ denominator instead
    // of re-deriving the formula inline
    def est(s: DataFrame, out: String, mOut: String): DataFrame =
      s.agg(count(lit(1)).as("m"), max(col("h")).as("kth"))
        .select(when(col("m") < KmvK, col("m"))
          .otherwise(floor(lit((KmvK - 1).toLong << 56).cast("double") /
            col("kth").cast("double")).cast("long")).as(out),
          col("m").as(mOut))
    // ρ = |skU present in both A and B| / |skU|
    val common = skU.join(skA, "h").join(skB, "h")
      .agg(count(lit(1)).as("c"))
    val estU = est(skU, "est_union", "mu")
    val exact = a.agg(count(lit(1)).as("n_a"))
      .crossJoin(b.agg(count(lit(1)).as("n_b")))
      .crossJoin(a.union(b).distinct().agg(count(lit(1)).as("n_union")))
    val estA = est(skA, "est_a", "ma").drop("ma")
    val estB = est(skB, "est_b", "mb").drop("mb")
    exact.crossJoin(estA).crossJoin(estB)
      .crossJoin(estU).crossJoin(common)
      .select(col("n_a"), col("n_b"), col("n_union"),
        (col("n_a") + col("n_b") - col("n_union")).as("n_inter"),
        col("est_a"), col("est_b"), col("est_union"),
        floor(col("c").cast("double") * col("est_union").cast("double") /
          col("mu").cast("double")).cast("long").as("est_inter"))
  }

  val sketchKmvSetopsSql: String = {
    val h = graft.functions.CrossHash.sqlMd5Long("CAST(o_custkey AS VARCHAR)")
    val top = (KmvK - 1).toLong << 56
    def est(src: String, m: String, kth: String): String =
      s"CASE WHEN $m < $KmvK THEN $m ELSE CAST(floor(CAST($top AS DOUBLE) " +
        s"/ CAST($kth AS DOUBLE)) AS BIGINT) END"
    s"""WITH a AS (SELECT DISTINCT $h AS h FROM orders
       |  WHERE year(o_orderdate) = 1996),
       |b AS (SELECT DISTINCT $h AS h FROM orders
       |  WHERE year(o_orderdate) = 1997),
       |ska AS (SELECT h FROM a ORDER BY h LIMIT $KmvK),
       |skb AS (SELECT h FROM b ORDER BY h LIMIT $KmvK),
       |sku AS (SELECT h FROM (SELECT DISTINCT h FROM (
       |  SELECT h FROM ska UNION ALL SELECT h FROM skb))
       |  ORDER BY h LIMIT $KmvK),
       |ea AS (SELECT ${est("ska", "COUNT(*)", "MAX(h)")} AS est_a FROM ska),
       |eb AS (SELECT ${est("skb", "COUNT(*)", "MAX(h)")} AS est_b FROM skb),
       |eu AS (SELECT ${est("sku", "COUNT(*)", "MAX(h)")} AS est_union,
       |  COUNT(*) AS mu FROM sku),
       |cm AS (SELECT COUNT(*) AS c FROM sku
       |  JOIN ska USING (h) JOIN skb USING (h)),
       |ex AS (SELECT (SELECT COUNT(*) FROM a) AS n_a,
       |  (SELECT COUNT(*) FROM b) AS n_b,
       |  (SELECT COUNT(*) FROM (SELECT DISTINCT h FROM (
       |    SELECT h FROM a UNION ALL SELECT h FROM b))) AS n_union)
       |SELECT n_a, n_b, n_union, n_a + n_b - n_union AS n_inter,
       |  est_a, est_b, est_union,
       |  CAST(floor(CAST(c AS DOUBLE) * CAST(est_union AS DOUBLE)
       |    / CAST(mu AS DOUBLE)) AS BIGINT) AS est_inter
       |FROM ex, ea, eb, eu, cm""".stripMargin
  }

  /** Join-cardinality estimation by CORRELATED key sampling — the
    * planner-statistics technique for sizing a join without running
    * it: sample both sides with the SAME hash predicate on the join
    * key (keeping 1/[[CardMod]] of the KEY space, not of the rows),
    * join the samples, and scale the count back up by [[CardMod]].
    * Independent per-side row sampling would square the keep rate and
    * massively undercount; key-correlated sampling keeps matching
    * pairs together and is unbiased over key buckets. Exact count and
    * signed error (ppm of exact) ride along in-band.
    */
  val CardMod = 16L
  def joinCardinalityEst(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.CrossHash.md5Long
    val keep = (c: Column) => md5Long(c.cast("string")) % CardMod === 0L
    val l = table(spark, dir, "lineitem").select(col("l_orderkey"))
    val o = table(spark, dir, "orders").select(col("o_orderkey"))
    val exact = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .agg(count(lit(1)).as("n_exact"))
    val sampled = l.where(keep(col("l_orderkey")))
      .join(o.where(keep(col("o_orderkey"))),
        col("l_orderkey") === col("o_orderkey"))
      .agg((count(lit(1)) * CardMod).as("n_est"))
    exact.crossJoin(sampled)
      .select(col("n_exact"), col("n_est"),
        (floor(lit(1e6) * (col("n_est") - col("n_exact")).cast("double") /
          col("n_exact").cast("double"))).cast("long").as("err_ppm"))
  }

  val joinCardinalityEstSql: String = {
    def keep(c: String): String =
      s"${graft.functions.CrossHash.sqlMd5Long(s"CAST($c AS VARCHAR)")} % $CardMod = 0"
    s"""WITH ex AS (
       |  SELECT COUNT(*) AS n_exact
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |sm AS (
       |  SELECT COUNT(*) * $CardMod AS n_est
       |  FROM (SELECT l_orderkey FROM lineitem WHERE ${keep("l_orderkey")}) l
       |  JOIN (SELECT o_orderkey FROM orders WHERE ${keep("o_orderkey")}) o
       |    ON l_orderkey = o_orderkey)
       |SELECT n_exact, n_est,
       |  CAST(floor(1e6 * CAST(n_est - n_exact AS DOUBLE)
       |    / CAST(n_exact AS DOUBLE)) AS BIGINT) AS err_ppm
       |FROM ex, sm""".stripMargin
  }

  /** Fixed-width histogram over order totals: bucket ordinal, bounds,
    * count, and an exact mass sum per bucket — the one-shuffle shape
    * of any distribution profile at scale (bucketing is a pure row
    * expression; only the per-bucket aggregation moves data).
    */
  def histogramPrices(spark: SparkSession, dir: String): DataFrame = {
    val width = 50000.0
    val bucket = floor(col("o_totalprice") / width).cast("long")
    table(spark, dir, "orders")
      .groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
      .withColumn("lo", (col("bucket") * width).cast("double"))
      .withColumn("hi", ((col("bucket") + 1) * width).cast("double"))
      .select(col("bucket"), col("lo"), col("hi"), col("n"),
        col("sum_price"))
  }

  val histogramPricesSql: String =
    s"""SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bucket,
       |  CAST(CAST(floor(o_totalprice / 50000.0) AS BIGINT) * 50000.0
       |    AS DOUBLE) AS lo,
       |  CAST((CAST(floor(o_totalprice / 50000.0) AS BIGINT) + 1) * 50000.0
       |    AS DOUBLE) AS hi,
       |  COUNT(*) AS n, ${sqlDsum("o_totalprice")} AS sum_price
       |FROM orders GROUP BY 1""".stripMargin

  /** Rank-ratio window functions: PERCENT_RANK and CUME_DIST are the
    * two built-ins that emit doubles, and both stay bit-identical
    * cross-engine because they are single IEEE divides of exact
    * integers ((rank-1)/(N-1) and peers_cum/N) — no accumulation. Ties
    * are handled by the rank definition itself, so no tiebreak column
    * is needed for determinism.
    */
  def windowRankRatios(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"))
    table(spark, dir, "orders")
      .where(col("o_totalprice") > 250000) // keep the output focused
      .select(col("o_orderkey"), col("o_orderpriority"),
        col("o_totalprice"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
  }

  val windowRankRatiosSql: String =
    """SELECT o_orderkey, o_orderpriority, o_totalprice,
      |  percent_rank() OVER w AS pct_rank,
      |  cume_dist() OVER w AS cume
      |FROM orders WHERE o_totalprice > 250000
      |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice)""".stripMargin

  /** Stratified deterministic sampling: per-stratum keep rates (the
    * training-data shape: oversample scarce high-quality strata,
    * downsample the bulk), implemented as a hash-mod threshold that
    * varies by stratum. Still a pure scan predicate — no shuffle to
    * sample, one aggregation to audit realized rates.
    */
  def sampleStratifiedOrders(spark: SparkSession, dir: String): DataFrame = {
    val h = pmod(graft.functions.CrossHash.md5Long(
      col("o_orderkey").cast("string")), lit(1000))
    val thresh = when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
      500).when(col("o_orderpriority") === "3-MEDIUM", 200).otherwise(50)
    table(spark, dir, "orders")
      .select(col("o_orderpriority"), col("o_totalprice"),
        (h < thresh).as("keep"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_total"),
        count(when(col("keep"), 1)).as("n_sampled"),
        dsum(when(col("keep"), col("o_totalprice"))).as("sampled_price"))
      .withColumn("realized_ppm", ppm(col("n_sampled"), col("n_total")))
  }

  val sampleStratifiedSql: String = {
    val h = s"${graft.functions.CrossHash.sqlMd5Long(
      "CAST(o_orderkey AS VARCHAR)")} % 1000"
    val keep = s"""($h) < CASE
      WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 500
      WHEN o_orderpriority = '3-MEDIUM' THEN 200 ELSE 50 END"""
    s"""SELECT o_orderpriority, COUNT(*) AS n_total,
       |  COUNT(CASE WHEN $keep THEN 1 END) AS n_sampled,
       |  ${sqlDsum(s"CASE WHEN $keep THEN o_totalprice END")} AS sampled_price,
       |  ${sqlPpm(s"COUNT(CASE WHEN $keep THEN 1 END)", "COUNT(*)")}
       |    AS realized_ppm
       |FROM orders GROUP BY o_orderpriority""".stripMargin
  }

  /** Bitwise and boolean aggregate breadth: BIT_OR/BIT_AND/BIT_XOR
    * (compact set/flag summaries — e.g. a membership bitmap per group)
    * and BOOL_AND/BOOL_OR. All are associative single-pass aggregates
    * with map-side partials, so they scale like SUM.
    */
  def aggBitwiseOrders(spark: SparkSession, dir: String): DataFrame = {
    val flag = pmod(col("o_custkey"), lit(4096))
    table(spark, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(bit_or(flag).as("flags_or"),
        bit_and(flag).as("flags_and"),
        bit_xor(flag).as("flags_xor"),
        bool_and(col("o_totalprice") > 900).as("all_over_900"),
        bool_or(col("o_totalprice") > 500000).as("any_over_500k"),
        count(lit(1)).as("n"))
  }

  val aggBitwiseSql: String =
    """SELECT o_orderstatus,
      |  BIT_OR(o_custkey % 4096) AS flags_or,
      |  BIT_AND(o_custkey % 4096) AS flags_and,
      |  BIT_XOR(o_custkey % 4096) AS flags_xor,
      |  BOOL_AND(o_totalprice > 900) AS all_over_900,
      |  BOOL_OR(o_totalprice > 500000) AS any_over_500k,
      |  COUNT(*) AS n
      |FROM orders GROUP BY o_orderstatus""".stripMargin

  /** Bag-semantics set operations — INTERSECT ALL / EXCEPT ALL keep
    * duplicate multiplicities (min/difference of per-value counts),
    * unlike the distinct variants in [[setopSegments]]. Spark plans
    * these as an aggregate of per-side counts plus a generate — one
    * shuffle on the value, no join.
    */
  def setopAllSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val l = table(spark, dir, "lineitem")
    val a = l.where(col("l_quantity") >= 45).select(col("l_suppkey"))
    val b = l.where(col("l_discount") >= 0.09).select(col("l_suppkey"))
    val i = a.intersectAll(b)
      .select(lit("both_bag").as("op"), col("l_suppkey"))
    val e = a.exceptAll(b)
      .select(lit("a_minus_b_bag").as("op"), col("l_suppkey"))
    i.union(e)
  }

  val setopAllSql: String =
    """WITH a AS (SELECT l_suppkey FROM lineitem WHERE l_quantity >= 45),
      |b AS (SELECT l_suppkey FROM lineitem WHERE l_discount >= 0.09)
      |SELECT 'both_bag' AS op, l_suppkey FROM
      |  (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
      |UNION ALL
      |SELECT 'a_minus_b_bag' AS op, l_suppkey FROM
      |  (SELECT * FROM a EXCEPT ALL SELECT * FROM b)""".stripMargin

  /** Null-safe equality join: `<=>` treats NULL as a joinable value
    * (one extra null-bucket on the shuffle key) where plain `=` drops
    * those rows — the semantics a dimension with genuinely-missing
    * keys needs. DuckDB twin: `IS NOT DISTINCT FROM`.
    */
  def joinNullSafe(spark: SparkSession, dir: String): DataFrame = {
    val s = table(spark, dir, "supplier")
      .select(when(col("s_suppkey") % 5 === 0, lit(null))
        .otherwise(col("s_suppkey") % 50).as("k"),
        col("s_suppkey"))
    val c = table(spark, dir, "customer")
      .select(when(col("c_custkey") % 7 === 0, lit(null))
        .otherwise(col("c_custkey") % 50).as("k"),
        col("c_custkey"))
    s.join(c, s("k") <=> c("k"))
      .groupBy(s("k").as("k"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("c_custkey")).as("n_customers"))
  }

  val joinNullSafeSql: String =
    """WITH s AS (
      |  SELECT CASE WHEN s_suppkey % 5 = 0 THEN NULL
      |    ELSE s_suppkey % 50 END AS k, s_suppkey FROM supplier),
      |c AS (
      |  SELECT CASE WHEN c_custkey % 7 = 0 THEN NULL
      |    ELSE c_custkey % 50 END AS k, c_custkey FROM customer)
      |SELECT s.k, COUNT(*) AS n_pairs,
      |  COUNT(DISTINCT c.c_custkey) AS n_customers
      |FROM s JOIN c ON s.k IS NOT DISTINCT FROM c.k
      |GROUP BY s.k""".stripMargin

  /** Two-stage salted aggregation — the hot-key mitigation written
    * out: stage 1 aggregates (key, salt) partials so a skewed key's
    * rows spread over 16 reducers, stage 2 merges the ≤16 partials per
    * key. The DECIMAL partials stay exact through BOTH stages (cast to
    * double only at the end), so the result is bit-identical to the
    * single-stage plain GROUP BY the oracle runs — the equality IS the
    * proof that salting preserves semantics. (AQE's skew handling
    * covers sort-merge joins; aggregation skew still wants this shape
    * when one group dominates.)
    */
  def aggSaltedSkew(spark: SparkSession, dir: String): DataFrame = {
    val salt = pmod(graft.functions.CrossHash.md5Long(
      col("l_orderkey").cast("string")), lit(16))
    val partials = table(spark, dir, "lineitem")
      .withColumn("salt", salt)
      .groupBy(col("l_returnflag"), col("salt"))
      .agg(sum(col("l_extendedprice").cast(
          org.apache.spark.sql.types.DecimalType(18, 2))).as("p_sum"),
        count(lit(1)).as("p_n"))
    partials.groupBy(col("l_returnflag"))
      .agg(sum(col("p_sum")).cast("double").as("sum_price"),
        sum(col("p_n")).as("n"))
  }

  val aggSaltedSkewSql: String =
    s"""SELECT l_returnflag, ${sqlDsum("l_extendedprice")} AS sum_price,
       |  COUNT(*) AS n
       |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** Salted JOIN under the oracle gate — [[graft.functions.Skew
    * .saltedJoin]]'s hot-key replication (large side salted 8 ways by
    * a whole-row hash, small side replicated once per salt, join on
    * (key, salt)) must be RESULT-identical to the plain equi-join the
    * oracle runs; the equality is the proof that salting preserves
    * join semantics, the [[aggSaltedSkew]] argument applied to joins.
    * This is the explicit rewrite for skew AQE cannot fix (e.g. when
    * the hot side must stay sort-merge but one key owns a partition);
    * AqeSkewJoinSpec covers the no-rewrite runtime path.
    */
  def joinSaltedSkew(spark: SparkSession, dir: String): DataFrame = {
    val o = table(spark, dir, "orders")
      .select(col("o_custkey"), col("o_totalprice"))
    val c = table(spark, dir, "customer")
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    graft.functions.Skew.saltedJoin(o, c, "o_custkey", n = 8)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("sum_price"),
        countDistinct(col("o_custkey")).as("n_customers"))
  }

  val joinSaltedSkewSql: String =
    s"""SELECT c_mktsegment, COUNT(*) AS n_orders,
       |  ${sqlDsum("o_totalprice")} AS sum_price,
       |  COUNT(DISTINCT o_custkey) AS n_customers
       |FROM orders JOIN customer ON o_custkey = c_custkey
       |GROUP BY c_mktsegment""".stripMargin

  /** JSON generation: `to_json(named_struct(...))` — the outbound
    * twin of the parsing queries (events_json reads JSON; this writes
    * it). Both engines emit compact `{"k":v}` with field order as
    * declared, so the string itself is oracle-comparable for
    * integer/string fields (doubles are excluded: float formatting is
    * the one place the engines' printers may diverge).
    */
  def jsonGenOrders(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .where(col("o_totalprice") > 450000)
      .select(col("o_orderkey"),
        to_json(struct(
          col("o_orderkey").as("key"),
          col("o_orderstatus").as("status"),
          col("o_custkey").as("cust"))).as("doc"))

  val jsonGenOrdersSql: String =
    """SELECT o_orderkey,
      |  CAST(to_json(struct_pack(key := o_orderkey,
      |    status := o_orderstatus, cust := o_custkey)) AS VARCHAR) AS doc
      |FROM orders WHERE o_totalprice > 450000""".stripMargin

  // ------------------------------------------------------- set ops
  /** UNION / INTERSECT / EXCEPT (distinct semantics) over customer key
    * sets, tagged so one result exercises all three operators.
    */
  def setopSegments(spark: SparkSession, dir: String): DataFrame = {
    val c = table(spark, dir, "customer")
    val building = c.where(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val rich = c.where(col("c_acctbal") > 5000)
      .select(col("c_custkey"))
    val i = building.intersect(rich).select(lit("both").as("op"),
      col("c_custkey"))
    val e = building.except(rich).select(lit("building_only").as("op"),
      col("c_custkey"))
    val u = building.union(rich).distinct()
      .select(lit("either").as("op"), col("c_custkey"))
    i.union(e).union(u)
  }

  val setopSql: String =
    """WITH b AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
      |r AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
      |SELECT 'both' AS op, c_custkey FROM (SELECT * FROM b INTERSECT SELECT * FROM r)
      |UNION ALL
      |SELECT 'building_only' AS op, c_custkey FROM (SELECT * FROM b EXCEPT SELECT * FROM r)
      |UNION ALL
      |SELECT 'either' AS op, c_custkey FROM (SELECT * FROM b UNION SELECT * FROM r)""".stripMargin

  // ------------------------------------------- distinct aggregation
  /** Exact COUNT(DISTINCT) per group — expands to a two-phase
    * aggregate; at scale prefer approx_count_distinct (provided as a
    * separate rows-only query since HLL sketches are engine-specific).
    */
  def distinctCustomers(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(
        countDistinct(col("o_custkey")).as("n_customers"),
        count(lit(1)).as("n_orders"))

  val distinctSql: String =
    """SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_customers,
      |  COUNT(*) AS n_orders
      |FROM orders GROUP BY o_orderstatus""".stripMargin

  /** Approximate distinct (HLL) — it exists because exact distinct at
    * 100 TB is the wrong default. The sketch is a RELATIONAL
    * HyperLogLog (Flajolet et al. 2007): registers are ROWS, not an
    * opaque buffer — `idx` = low 14 hash bits (m = 2^14, the same
    * precision as rsd ≈ 0.01), `rho` = leftmost-1 rank of the
    * remaining 42 bits, and the register value is a plain `max(rho)`
    * per (group, idx), with linear counting below 2.5m (exactly the
    * small-range regime these cardinalities sit in). Why not the
    * built-in `approx_count_distinct`: its ImperativeAggregate buffer
    * disables whole-stage codegen for every aggregate sharing its
    * stage — measured 0.89 s vs 0.47 s at sf0.1 for the identical
    * result. Declarative max/sum keep every stage codegen'd: the
    * register rollup (which, being duplicate-insensitive, skips the
    * dedup entirely — raw rows fold straight into ≤ 3·m register
    * rows) and the exact countDistinct twin run as two independent
    * two-exchange chains over the same narrow scan, met by one
    * broadcast join of two 3-row results.
    *
    * The estimate itself still never crosses engines (libm `ln` in the
    * linear-counting branch): it enters the output only through the
    * banded relative error `|est − exact|·20 div exact` (0 ⇔ within
    * ±5%) plus the within-bound verdict, and the oracle asserts band
    * 0 / true. At m = 2^14 the 5% band is ≥5σ for both the HLL and
    * linear-counting regimes, so the claim is a REAL check of the
    * sketch — a broken register map fails the hash.
    */
  def approxDistinctCustomers(spark: SparkSession, dir: String): DataFrame = {
    val m = 16384L // 2^14 registers, rsd ≈ 1.04/√m ≈ 0.8%
    // xxhash64, not the cross-engine md5 family: the estimate never
    // leaves Spark (only the band does), so the native codegen'd hash
    // is the right choice
    val h = xxhash64(col("o_custkey"))
    val w = shiftright(h, 14).bitwiseAND(lit((1L << 42) - 1))
    // leftmost-1 rank in a 42-bit word: bin() length IS floor(log2)+1
    val rho = when(w === 0L, lit(43L))
      .otherwise(lit(43L) - length(bin(w)).cast("long"))
    val pairs = table(spark, dir, "orders")
      .select(col("o_orderstatus"), col("o_custkey"))
    // two independent 2-exchange chains over the one scan, runnable
    // concurrently: the codegen'd exact distinct, and the register
    // rollup (duplicate-insensitive, so it skips the dedup entirely)
    val exact = pairs.groupBy(col("o_orderstatus"))
      .agg(countDistinct(col("o_custkey")).as("n_exact"))
    val sketch = pairs
      .select(col("o_orderstatus"), h.bitwiseAND(lit(16383L)).as("idx"),
        rho.as("rho"))
      .groupBy(col("o_orderstatus"), col("idx"))
      .agg(max(col("rho")).as("mx"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_regs"),
        // Σ 2^(62−M) as exact DECIMAL — order-independent, overflow-free
        sum(expr("cast(shiftleft(cast(1 as bigint), cast(62 - mx as int))" +
          " as decimal(38,0))")).as("s_present"))
    exact.join(broadcast(sketch), "o_orderstatus")
      .select(col("o_orderstatus"), col("n_exact"), {
        val zeros = (lit(m) - col("n_regs")).cast("double")
        val sTot = col("s_present").cast("double") +
          zeros * lit(math.pow(2, 62)) // empty registers contribute 2^0
        val alpha = 0.7213 / (1 + 1.079 / m)
        val raw = lit(alpha * m * m * math.pow(2, 62)) / sTot
        val est = when(raw <= lit(2.5 * m) && zeros > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / zeros)).otherwise(raw)
        floor(abs(est - col("n_exact")) * 20.0 / col("n_exact"))
          .cast("long").as("err_band")
      }, {
        val zeros = (lit(m) - col("n_regs")).cast("double")
        val sTot = col("s_present").cast("double") +
          zeros * lit(math.pow(2, 62))
        val alpha = 0.7213 / (1 + 1.079 / m)
        val raw = lit(alpha * m * m * math.pow(2, 62)) / sTot
        val est = when(raw <= lit(2.5 * m) && zeros > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / zeros)).otherwise(raw)
        (abs(est - col("n_exact")) * 20 <= col("n_exact"))
          .as("within_bound")
      })
  }

  val approxDistinctCustomersSql: String =
    """SELECT o_orderstatus,
      |  COUNT(DISTINCT o_custkey) AS n_exact,
      |  CAST(0 AS BIGINT) AS err_band,
      |  TRUE AS within_bound
      |FROM orders GROUP BY o_orderstatus""".stripMargin

  // --------------------------------------------------- having + join back
  /** Q18-style: large orders by total quantity (HAVING), joined back to
    * order + customer detail. The aggregate runs first and is the
    * small side of the join-back — broadcast it.
    */
  def q18LargeOrders(spark: SparkSession, dir: String): DataFrame = {
    val big = table(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(dsum(col("l_quantity")).as("total_qty"))
      .where(col("total_qty") > 250)
    val o = table(spark, dir, "orders")
    val c = table(spark, dir, "customer")
    broadcast(big)
      .join(o, big("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("total_qty"))
  }

  val q18Sql: String =
    s"""WITH big AS (
       |  SELECT l_orderkey, ${sqlDsum("l_quantity")} AS total_qty
       |  FROM lineitem GROUP BY l_orderkey
       |  HAVING ${sqlDsum("l_quantity")} > 250)
       |SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       |  total_qty
       |FROM big JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey""".stripMargin

  // ---------------------------------------------- scalar functions
  /** Scalar-function breadth: date parts, formatting, string ops —
    * all codegen'd built-ins, grouped to a small result.
    */
  def scalarFuncsOrders(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .select(
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
        quarter(col("o_orderdate")).cast("long").as("qtr"),
        upper(substring(col("o_orderpriority"), 3, 20)).as("prio_name"),
        length(col("o_orderpriority")).cast("long").as("prio_len"),
        col("o_totalprice"))
      .groupBy(col("ym"), col("qtr"), col("prio_name"), col("prio_len"))
      .agg(count(lit(1)).as("n"),
        dsum(col("o_totalprice")).as("sum_price"),
        max(col("o_totalprice")).as("max_price"),
        min(col("o_totalprice")).as("min_price"))

  val scalarFuncsSql: String =
    s"""SELECT strftime(o_orderdate, '%Y-%m') AS ym,
       |  CAST(EXTRACT(quarter FROM o_orderdate) AS BIGINT) AS qtr,
       |  upper(substr(o_orderpriority, 3, 20)) AS prio_name,
       |  CAST(length(o_orderpriority) AS BIGINT) AS prio_len,
       |  COUNT(*) AS n, ${sqlDsum("o_totalprice")} AS sum_price,
       |  MAX(o_totalprice) AS max_price, MIN(o_totalprice) AS min_price
       |FROM orders GROUP BY 1, 2, 3, 4""".stripMargin

  // ------------------------------------------------- percentiles
  /** Exact percentiles (median / p90) per group. Exact `percentile`
    * needs the group's values together (fine for bounded groups); at
    * unbounded scale swap for approx_percentile — provided as the
    * rows-only companion below.
    */
  def percentileQuantity(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        percentile(col("l_quantity"), lit(0.5)).as("median_qty"),
        percentile(col("l_quantity"), lit(0.9)).as("p90_qty"),
        count(lit(1)).as("n"))

  val percentileSql: String =
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.5) AS median_qty,
      |  quantile_cont(l_quantity, 0.9) AS p90_qty,
      |  COUNT(*) AS n
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** Approximate percentile (KLL-style sketch), the 100 TB default.
    * The sketch value is engine-specific, so the HASHED columns are
    * restructured to be deterministic (the [[approxDistinctKmv]]
    * gating pattern): the exact median rides along as the twin, and
    * the approx value enters the output only through its RANK-BOUND
    * verdict — `approx_percentile(…, accuracy)` documents rank error
    * ≤ n/accuracy, so the approx value's CDF interval
    * [n_lt/n, n_le/n] must cover 0.5 to within 1/accuracy (checked
    * in exact integer cross-multiplication, with 0.05% slack on top
    * of the documented 0.01%). The oracle asserts the verdict true —
    * a sketch whose answer drifts off-rank fails the hash. The bound
    * check is one broadcast join of the 3-row sketch result back to
    * the fact table: one extra scan, no extra shuffle.
    */
  def approxPercentileQuantity(spark: SparkSession, dir: String): DataFrame = {
    val l = table(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_quantity"))
    val ap = l.groupBy(col("l_returnflag"))
      .agg(approx_percentile(col("l_quantity"), lit(0.5), lit(10000))
          .as("av"),
        count(lit(1)).as("n"),
        percentile(col("l_quantity"), lit(0.5)).as("median_exact"))
    val ranks = l
      .join(broadcast(ap.select(col("l_returnflag"), col("av"))),
        Seq("l_returnflag"))
      .groupBy(col("l_returnflag"))
      .agg(sum(when(col("l_quantity") <= col("av"), 1L).otherwise(0L))
          .as("n_le"),
        sum(when(col("l_quantity") < col("av"), 1L).otherwise(0L))
          .as("n_lt"))
    ap.join(ranks, Seq("l_returnflag"))
      .select(col("l_returnflag"), col("n"), col("median_exact"),
        (col("n_lt") * 10000L <= col("n") * 5006L &&
          col("n_le") * 10000L >= col("n") * 4994L).as("within_bound"))
  }

  val approxPercentileQuantitySql: String =
    """SELECT l_returnflag, COUNT(*) AS n,
      |  quantile_cont(l_quantity, 0.5) AS median_exact,
      |  TRUE AS within_bound
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** Q10-style returned-item customer ranking: 4-way join (customer ⨝
    * orders ⨝ lineitem ⨝ nation), revenue aggregate, global top-20.
    */
  def q10ReturnedItems(spark: SparkSession, dir: String): DataFrame = {
    val c = table(spark, dir, "customer")
    val n = table(spark, dir, "nation")
    val o = table(spark, dir, "orders")
      .where(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
        col("o_orderdate") < ts("1997-01-01 00:00:00"))
    val l = table(spark, dir, "lineitem").where(col("l_returnflag") === "R")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(20)
  }

  val q10Sql: String =
    s"""SELECT c_custkey, c_name, n_name,
       |  ${sqlDsum("l_extendedprice * (1 - l_discount)", 4)} AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |WHERE l_returnflag = 'R'
       |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
       |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
       |GROUP BY c_custkey, c_name, n_name
       |ORDER BY revenue DESC, c_custkey ASC
       |LIMIT 20""".stripMargin

  // ------------------------------------------------------------ Q4
  /** Q4-style order-priority checking: EXISTS over a correlated
    * non-equi condition — counts orders in a quarter having at least
    * one line item shipped after the order date (the testdata's
    * lateness signal; TPC-H proper uses commit < receipt, columns this
    * schema does not carry). Compiles to a left-semi join on the order
    * key with the date comparison as a residual condition: only the
    * key and two dates cross the shuffle, the match is never
    * materialized — the EXISTS idiom that survives a 100 TB lineitem.
    */
  def q4OrderPriority(spark: SparkSession, dir: String): DataFrame = {
    val o = table(spark, dir, "orders")
      .where(col("o_orderdate") >= ts("1996-07-01 00:00:00") &&
        col("o_orderdate") < ts("1996-10-01 00:00:00"))
    val l = table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_shipdate"))
    o.join(l, o("o_orderkey") === l("l_orderkey") &&
        l("l_shipdate") > o("o_orderdate"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
  }

  val q4Sql: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem
      |    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority""".stripMargin

  // ----------------------------------------------------------- Q19
  /** Q19-style disjunctive revenue: an OR-of-ANDs predicate across
    * both sides of `part ⨝ lineitem` (brand/size/quantity bands, the
    * testdata's columns). The per-side conjuncts that appear in every
    * branch cannot be pushed below the join, but Catalyst derives and
    * pushes the PER-TABLE disjunctions (size ranges to the part scan,
    * quantity bands to the lineitem scan), so the join sees pre-shrunk
    * inputs and `part` broadcasts; the full disjunction evaluates as
    * the join's residual. The classic "predicate too tangled to
    * factor by hand" plan test.
    */
  def q19DisjunctiveRevenue(spark: SparkSession, dir: String): DataFrame = {
    val p = table(spark, dir, "part")
    val l = table(spark, dir, "lineitem")
    val branch1 = col("p_brand") === "Brand#11" &&
      col("p_size").between(1, 15) && col("l_quantity").between(1, 20)
    val branch2 = col("p_brand") === "Brand#22" &&
      col("p_size").between(1, 30) && col("l_quantity").between(10, 30)
    val branch3 = col("p_brand") === "Brand#33" &&
      col("p_size").between(1, 45) && col("l_quantity").between(20, 40)
    l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .where(branch1 || branch2 || branch3)
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
        .as("revenue"),
        count(lit(1)).as("n"))
  }

  val q19Sql: String =
    s"""SELECT ${sqlDsum("l_extendedprice * (1 - l_discount)", 4)} AS revenue,
       |  COUNT(*) AS n
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
       |       AND l_quantity BETWEEN 1 AND 20)
       |   OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 30
       |       AND l_quantity BETWEEN 10 AND 30)
       |   OR (p_brand = 'Brand#33' AND p_size BETWEEN 1 AND 45
       |       AND l_quantity BETWEEN 20 AND 40)""".stripMargin

  // ------------------------------------------------------ UDAF
  /** Typed-Aggregator UDAF: top-3 order prices (exact cents) per
    * status via [[graft.functions.TopKAgg]] — k-element buffers
    * map-side, only k values cross the shuffle. DECIMAL-cast cents
    * keep the values exact for the oracle.
    */
  def udafTopkPrices(spark: SparkSession, dir: String): DataFrame = {
    val topk = udaf(graft.functions.TopKAgg(3))
    table(spark, dir, "orders")
      .select(col("o_orderstatus"),
        (col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("long").as("cents"))
      .groupBy(col("o_orderstatus"))
      .agg(topk(col("cents")).as("top3_cents_csv"))
  }

  val udafTopkSql: String =
    """WITH c AS (
      |  SELECT o_orderstatus,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM orders),
      |r AS (
      |  SELECT o_orderstatus, cents, row_number() OVER (
      |    PARTITION BY o_orderstatus ORDER BY cents DESC) AS rn
      |  FROM c)
      |SELECT o_orderstatus,
      |  string_agg(CAST(cents AS VARCHAR), ',' ORDER BY cents DESC)
      |    AS top3_cents_csv
      |FROM r WHERE rn <= 3 GROUP BY o_orderstatus""".stripMargin

  // ------------------------------------------------ SQL front door
  /** Q6-style revenue delta through the spark.sql entry point over
    * registered views — the SQL surface users of the library get for
    * free (same ANSI text runs in DuckDB modulo the decimal helper).
    */
  def sqlRevenueQ6(spark: SparkSession, dir: String): DataFrame = {
    graft.core.Tables.registerAll(spark, dir)
    spark.sql(
      s"""SELECT ${sqlDsum("l_extendedprice * l_discount", 4)} AS revenue,
         |  COUNT(*) AS n
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
         |  AND l_discount BETWEEN 0.05 AND 0.07
         |  AND l_quantity < 24""".stripMargin)
  }

  val sqlRevenueQ6Sql: String =
    s"""SELECT ${sqlDsum("l_extendedprice * l_discount", 4)} AS revenue,
       |  COUNT(*) AS n
       |FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
       |  AND l_discount BETWEEN 0.05 AND 0.07
       |  AND l_quantity < 24""".stripMargin

  // --------------------------------------- window-function breadth
  /** lead / dense_rank / first_value / ntile over one partitioned
    * window pass (single shuffle on o_custkey; dates+keys give a
    * total order so every function is deterministic).
    */
  def windowFuncsBreadth(spark: SparkSession, dir: String): DataFrame = {
    val byDate = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val byPrice = Window.partitionBy(col("o_custkey"))
      .orderBy(col("cents").desc)
    table(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate"),
        (col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("long").as("cents"))
      .select(col("o_custkey"), col("o_orderkey"), col("cents"),
        dense_rank().over(byPrice).cast("long").as("price_rank"),
        lead(col("o_orderkey"), 1).over(byDate).as("next_orderkey"),
        first_value(col("o_orderkey")).over(byDate).as("first_orderkey"),
        ntile(4).over(byDate).cast("long").as("quartile"))
  }

  val windowFuncsSql: String =
    """WITH c AS (
      |  SELECT o_custkey, o_orderkey, o_orderdate,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM orders)
      |SELECT o_custkey, o_orderkey, cents,
      |  CAST(dense_rank() OVER (PARTITION BY o_custkey ORDER BY cents DESC)
      |    AS BIGINT) AS price_rank,
      |  lead(o_orderkey, 1) OVER w AS next_orderkey,
      |  first_value(o_orderkey) OVER w AS first_orderkey,
      |  CAST(ntile(4) OVER w AS BIGINT) AS quartile
      |FROM c
      |WINDOW w AS (PARTITION BY o_custkey
      |  ORDER BY o_orderdate ASC, o_orderkey ASC)""".stripMargin

  // ------------------------------------------------ scalar subquery
  /** Scalar-subquery shape: customers above the global mean balance.
    * The scalar aggregates once and broadcasts; the mean goes through
    * DECIMAL so the comparison threshold is identical in both engines.
    */
  def scalarSubqueryRich(spark: SparkSession, dir: String): DataFrame = {
    val c = table(spark, dir, "customer")
    val thr = c.agg(davg(col("c_acctbal")).as("mean_bal"))
    c.crossJoin(broadcast(thr))
      .where(col("c_acctbal") > col("mean_bal"))
      .select(col("c_custkey"), col("c_acctbal"))
  }

  val scalarSubquerySql: String =
    s"""SELECT c_custkey, c_acctbal FROM customer
       |WHERE c_acctbal > (SELECT ${sqlDavg("c_acctbal")} FROM customer)""".stripMargin

  // ---------------------------------------------------------- maps
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> (q1PricingSummary _),
    "q3_shipping_priority" -> (q3ShippingPriority _),
    "q5_local_supplier" -> (q5LocalSupplier _),
    "join_semi_highqty" -> (joinSemiHighQty _),
    "join_anti_no_orders" -> (joinAntiNoOrders _),
    "window_topk_orders" -> (windowTopkOrders _),
    "window_running_total" -> (windowRunningTotal _),
    "agg_rollup_lineitem" -> (aggRollupLineitem _),
    "agg_cube_orders" -> (aggCubeOrders _),
    "setop_segments" -> (setopSegments _),
    "distinct_customers" -> (distinctCustomers _),
    "approx_distinct_customers" -> (approxDistinctCustomers _),
    "q18_large_orders" -> (q18LargeOrders _),
    "q4_order_priority" -> (q4OrderPriority _),
    "q19_disjunctive_revenue" -> (q19DisjunctiveRevenue _),
    "scalar_funcs_orders" -> (scalarFuncsOrders _),
    "percentile_quantity" -> (percentileQuantity _),
    "approx_percentile_quantity" -> (approxPercentileQuantity _),
    "udaf_topk_prices" -> (udafTopkPrices _),
    "sql_revenue_q6" -> (sqlRevenueQ6 _),
    "window_funcs_breadth" -> (windowFuncsBreadth _),
    "scalar_subquery_rich" -> (scalarSubqueryRich _),
    "agg_grouping_sets" -> (aggGroupingSets _),
    "q10_returned_items" -> (q10ReturnedItems _),
    "sample_hash_orders" -> (sampleHashOrders _),
    "sketch_kmv_setops" -> (sketchKmvSetops _),
    "join_cardinality_est" -> (joinCardinalityEst _),
    "sample_stratified_orders" -> (sampleStratifiedOrders _),
    "agg_bitwise_orders" -> (aggBitwiseOrders _),
    "window_rank_ratios" -> (windowRankRatios _),
    "approx_distinct_kmv" -> (approxDistinctKmv _),
    "histogram_prices" -> (histogramPrices _),
    "window_range_frame" -> (windowRangeFrame _),
    "q14_promo_revenue" -> (q14PromoRevenue _),
    "setop_all_suppliers" -> (setopAllSuppliers _),
    "join_null_safe" -> (joinNullSafe _),
    "json_gen_orders" -> (jsonGenOrders _),
    "agg_salted_skew" -> (aggSaltedSkew _),
    "join_salted_skew" -> (joinSaltedSkew _))

  val oracles: Map[String, String] = Map(
    "q1_pricing_summary" -> q1Sql,
    "q3_shipping_priority" -> q3Sql,
    "q5_local_supplier" -> q5Sql,
    "join_semi_highqty" -> joinSemiSql,
    "join_anti_no_orders" -> joinAntiSql,
    "window_topk_orders" -> windowTopkSql,
    "window_running_total" -> windowRunningSql,
    "agg_rollup_lineitem" -> aggRollupSql,
    "agg_cube_orders" -> aggCubeSql,
    "setop_segments" -> setopSql,
    "distinct_customers" -> distinctSql,
    "approx_distinct_customers" -> approxDistinctCustomersSql,
    "approx_percentile_quantity" -> approxPercentileQuantitySql,
    "q18_large_orders" -> q18Sql,
    "q4_order_priority" -> q4Sql,
    "q19_disjunctive_revenue" -> q19Sql,
    "scalar_funcs_orders" -> scalarFuncsSql,
    "percentile_quantity" -> percentileSql,
    "udaf_topk_prices" -> udafTopkSql,
    "sql_revenue_q6" -> sqlRevenueQ6Sql,
    "window_funcs_breadth" -> windowFuncsSql,
    "scalar_subquery_rich" -> scalarSubquerySql,
    "agg_grouping_sets" -> aggGroupingSetsSql,
    "q10_returned_items" -> q10Sql,
    "sample_hash_orders" -> sampleHashSql,
    "sketch_kmv_setops" -> sketchKmvSetopsSql,
    "join_cardinality_est" -> joinCardinalityEstSql,
    "sample_stratified_orders" -> sampleStratifiedSql,
    "agg_bitwise_orders" -> aggBitwiseSql,
    "window_rank_ratios" -> windowRankRatiosSql,
    "approx_distinct_kmv" -> approxDistinctKmvSql,
    "histogram_prices" -> histogramPricesSql,
    "window_range_frame" -> windowRangeFrameSql,
    "q14_promo_revenue" -> q14PromoRevenueSql,
    "setop_all_suppliers" -> setopAllSql,
    "join_null_safe" -> joinNullSafeSql,
    "json_gen_orders" -> jsonGenOrdersSql,
    "agg_salted_skew" -> aggSaltedSkewSql,
    "join_salted_skew" -> joinSaltedSkewSql)
}

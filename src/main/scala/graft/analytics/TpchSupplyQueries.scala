package graft.analytics

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import QueryUtil._

/** The supply-side TPC-H dwarfs (round 5): the six spec queries whose
  * canonical form needs the `partsupp` table, which the driver's
  * testdata does not ship. The part↔supplier relation is instead
  * DERIVED from lineitem facts — `ps(partkey, suppkey, supplycost,
  * availqty)` with supplycost = MIN unit price ever charged and
  * availqty = total quantity ever supplied — which preserves every
  * query's join/subquery shape while staying oracle-checkable (the
  * identical derivation CTE feeds DuckDB).
  *
  * Determinism notes: supplycost is a MIN over per-row IEEE divides
  * (identical operands in both engines → identical doubles; min is
  * order-independent); availqty sums a RAW column through exact DECIMAL
  * (QueryUtil). Aggregates over COMPUTED doubles (q9 profit, q11
  * value) use floor-scaled integer sums instead — double→DECIMAL cast
  * rounding diverges between engines at .00005 boundaries, while
  * floor(x·1e4) of the identical IEEE double is bit-identical.
  * Threshold comparisons (q11, q20) compare doubles both engines
  * computed from the same exact inputs.
  *
  * Scale notes: the ps derivation is ONE shuffle of lineitem on its
  * natural (partkey, suppkey) key with map-side partial aggregation —
  * at 100 TB it is the same shuffle a real partsupp scan would replace,
  * and AQE coalesces the tail. Supplier/nation/region and every
  * filtered part slice are broadcast dims; per-part thresholds (q2 min
  * cost, q20 half shipped quantity) join back on the partkey the data
  * is already shuffled by, never forced broadcast (|part| grows with
  * the corpus — the advisor-flagged q17 failure mode, avoided here by
  * construction).
  *
  * Reference scope: /root/reference/src/app.js has no SQL surface; this
  * breadth targets the north-star analytics layer (BASELINE.json).
  */
object TpchSupplyQueries {

  private def ts(s: String): Column = lit(Timestamp.valueOf(s))

  /** Derived partsupp: one lineitem shuffle on (partkey, suppkey). */
  private def partsupp(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .groupBy(col("l_partkey").as("ps_partkey"),
        col("l_suppkey").as("ps_suppkey"))
      .agg(min(col("l_extendedprice") / col("l_quantity"))
        .as("ps_supplycost"),
        dsum(col("l_quantity")).as("ps_availqty"))

  private val psSql: String =
    """ps AS (SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
      |  MIN(l_extendedprice / l_quantity) AS ps_supplycost,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS ps_availqty
      |  FROM lineitem GROUP BY 1, 2)""".stripMargin

  /** Suppliers of one region offering each STANDARD part at that
    * region's minimum supply cost. */
  private def supplierRegion(spark: SparkSession, dir: String,
      rName: String): DataFrame = {
    val s = table(spark, dir, "supplier")
    val n = table(spark, dir, "nation")
    val r = table(spark, dir, "region").where(col("r_name") === rName)
    s.join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"),
        col("n_name"))
  }

  // ------------------------------------------------------------ Q2
  /** Q2 minimum-cost supplier: for every STANDARD part, the EUROPE
    * supplier(s) whose derived supply cost equals the part's regional
    * minimum. The correlated-min subquery becomes a per-part min
    * aggregate joined back on the partkey (same shuffle key), with the
    * equality on doubles both engines computed identically. Supplier ×
    * nation × region collapses to a broadcast dim before touching ps.
    */
  def q2MinCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val ps = partsupp(spark, dir)
    val euro = ps
      .join(broadcast(supplierRegion(spark, dir, "EUROPE")),
        col("ps_suppkey") === col("s_suppkey"))
      .cache() // feeds both the per-part min and the final join
    val minCost = euro.groupBy(col("ps_partkey").as("mk"))
      .agg(min(col("ps_supplycost")).as("mc"))
    val p = table(spark, dir, "part").where(col("p_type") === "STANDARD")
      .select(col("p_partkey"), col("p_name"))
    euro
      .join(minCost,
        col("ps_partkey") === col("mk") && col("ps_supplycost") === col("mc"))
      .join(broadcast(p), col("ps_partkey") === col("p_partkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_name"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
        col("p_partkey"))
      .limit(100)
  }

  val q2Sql: String =
    s"""WITH $psSql,
       |euro AS (
       |  SELECT ps_partkey, ps_supplycost, s_acctbal, s_name, n_name
       |  FROM ps
       |  JOIN supplier ON ps_suppkey = s_suppkey
       |  JOIN nation ON s_nationkey = n_nationkey
       |  JOIN region ON n_regionkey = r_regionkey
       |  WHERE r_name = 'EUROPE'),
       |mincost AS (
       |  SELECT ps_partkey AS mk, MIN(ps_supplycost) AS mc
       |  FROM euro GROUP BY ps_partkey)
       |SELECT s_acctbal, s_name, n_name, p_partkey, p_name
       |FROM euro
       |JOIN mincost ON ps_partkey = mk AND ps_supplycost = mc
       |JOIN part ON ps_partkey = p_partkey
       |WHERE p_type = 'STANDARD'
       |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
       |LIMIT 100""".stripMargin

  // ------------------------------------------------------------ Q9
  /** Q9 product-type profit: per (supplier nation, order year) profit
    * of widget parts, profit = revenue − derived supply cost × qty.
    * lineitem joins ps on the composite (partkey, suppkey) it derives
    * from — AQE sees both sides shuffled compatibly; part is a filtered
    * broadcast; orders shuffles on the orderkey.
    */
  def q9ProductProfit(spark: SparkSession, dir: String): DataFrame = {
    val l = table(spark, dir, "lineitem")
    val ps = partsupp(spark, dir)
    val p = table(spark, dir, "part")
      .where(col("p_name").like("%widget%")).select(col("p_partkey"))
    val s = table(spark, dir, "supplier")
    val n = table(spark, dir, "nation")
    val o = table(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderdate"))
    l.join(ps, l("l_partkey") === col("ps_partkey") &&
        l("l_suppkey") === col("ps_suppkey"))
      .join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .join(broadcast(s), l("l_suppkey") === s("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === n("n_nationkey"))
      .join(o, l("l_orderkey") === o("o_orderkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      // fsum, not dsum: the profit term is a computed double, and
      // double→DECIMAL rounding diverges between engines at .00005
      // boundaries (observed: 1 row in 70 at sf0.001)
      .agg(fsum(col("l_extendedprice") * (lit(1) - col("l_discount")) -
        col("ps_supplycost") * col("l_quantity")).as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  val q9Sql: String =
    s"""WITH $psSql
       |SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       |  ${sqlFsum("l_extendedprice * (1 - l_discount) - ps_supplycost * l_quantity")} AS sum_profit
       |FROM lineitem
       |JOIN ps ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
       |JOIN part ON l_partkey = p_partkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN orders ON l_orderkey = o_orderkey
       |WHERE p_name LIKE '%widget%'
       |GROUP BY n_name, o_year
       |ORDER BY nation, o_year DESC""".stripMargin

  // ------------------------------------------------------------ Q11
  /** Q11 important stock: parts whose ASIA-supplied inventory value
    * exceeds 2× the mean per-part share — the spec's fixed fraction
    * made scale-ADAPTIVE (a constant fraction of a growing total
    * empties as |part| grows; the mean-share multiple keeps the "heavy
    * parts" semantics at every corpus size). The threshold is a 1-row
    * broadcast; the per-part aggregate shuffles on partkey once.
    */
  def q11ImportantStock(spark: SparkSession, dir: String): DataFrame = {
    val ps = partsupp(spark, dir)
    // fsum (floor-scaled sums through DECIMAL), not dsum: v is a
    // computed double product, and double→DECIMAL rounding diverges
    // between engines at boundary values; the DECIMAL leg also keeps
    // the GLOBAL threshold sum overflow-free at any corpus size
    val regional = ps
      .join(broadcast(supplierRegion(spark, dir, "ASIA")
        .select(col("s_suppkey"))),
        col("ps_suppkey") === col("s_suppkey"))
      .select(col("ps_partkey"),
        (col("ps_supplycost") * col("ps_availqty")).as("v"))
      .cache() // feeds both the threshold and the per-part aggregate
    val thresh = regional.agg(
      (fsum(col("v")) * lit(2.0) /
        countDistinct(col("ps_partkey")).cast("double")).as("t"))
    regional.groupBy(col("ps_partkey"))
      .agg(fsum(col("v")).as("part_value"))
      .join(broadcast(thresh))
      .where(col("part_value") > col("t"))
      .select(col("ps_partkey"), col("part_value"))
      .orderBy(col("part_value").desc, col("ps_partkey"))
  }

  val q11Sql: String =
    s"""WITH $psSql,
       |regional AS (
       |  SELECT ps_partkey, ps_supplycost * ps_availqty AS v
       |  FROM ps JOIN supplier ON ps_suppkey = s_suppkey
       |  JOIN nation ON s_nationkey = n_nationkey
       |  JOIN region ON n_regionkey = r_regionkey
       |  WHERE r_name = 'ASIA'),
       |thresh AS (
       |  SELECT ${sqlFsum("v")} * 2.0 /
       |    CAST(COUNT(DISTINCT ps_partkey) AS DOUBLE) AS t
       |  FROM regional)
       |SELECT ps_partkey, ${sqlFsum("v")} AS part_value
       |FROM regional
       |GROUP BY ps_partkey
       |HAVING ${sqlFsum("v")} > (SELECT t FROM thresh)
       |ORDER BY part_value DESC, ps_partkey""".stripMargin

  // ------------------------------------------------------------ Q12
  /** Q12 shipping-delay priority mix (adapted: no l_shipmode column —
    * lineitems bucket by ship delay instead, keeping the CASE-sum
    * pivot shape). One lineitem⨝orders shuffle on the orderkey; the
    * 3-row aggregate is free.
    */
  def q12ShipBuckets(spark: SparkSession, dir: String): DataFrame = {
    val l = table(spark, dir, "lineitem")
      .where(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
        col("l_shipdate") < ts("1997-01-01 00:00:00"))
      .select(col("l_orderkey"), col("l_shipdate"))
    val o = table(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    val delay = datediff(col("l_shipdate").cast("date"),
      col("o_orderdate").cast("date"))
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .groupBy(when(delay <= 30, "FAST").when(delay <= 60, "NORMAL")
        .otherwise("SLOW").as("ship_bucket"))
      // low counts via the NEGATED predicate, not otherwise(1): a NULL
      // priority must count in neither bucket (the oracle's CASE WHEN
      // NOT IN ... THEN 1 ELSE 0 yields 0 for NULL; otherwise(1)
      // would yield 1 and silently diverge)
      .agg(sum(when(high, 1).otherwise(0)).as("high_line_count"),
        sum(when(!high, 1).otherwise(0)).as("low_line_count"))
      .orderBy(col("ship_bucket"))
  }

  val q12Sql: String =
    """SELECT
      |  CASE WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) <= 30 THEN 'FAST'
      |       WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) <= 60 THEN 'NORMAL'
      |       ELSE 'SLOW' END AS ship_bucket,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY ship_bucket
      |ORDER BY ship_bucket""".stripMargin

  // ------------------------------------------------------------ Q16
  /** Q16 parts/supplier relationship: distinct supplier count per
    * (brand, type, size) slice, excluding one brand, one type, and
    * "complaint" suppliers (adapted: negative account balance — no
    * comment column). The exclusion set is a broadcast anti-join;
    * countDistinct shuffles once on the group key.
    */
  def q16PartsSupplier(spark: SparkSession, dir: String): DataFrame = {
    val sizes = Seq(1, 4, 9, 14, 19, 24, 29, 34).map(Integer.valueOf)
    val p = table(spark, dir, "part")
      .where(col("p_brand") =!= "Brand#13" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(sizes: _*))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    val bad = table(spark, dir, "supplier").where(col("s_acctbal") < 0)
      .select(col("s_suppkey"))
    partsupp(spark, dir)
      .join(broadcast(p), col("ps_partkey") === col("p_partkey"))
      .join(broadcast(bad), col("ps_suppkey") === col("s_suppkey"),
        "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  val q16Sql: String =
    s"""WITH $psSql
       |SELECT p_brand, p_type, p_size,
       |  CAST(COUNT(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
       |FROM ps JOIN part ON ps_partkey = p_partkey
       |WHERE p_brand <> 'Brand#13' AND p_type <> 'PROMO'
       |  AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
       |  AND NOT EXISTS (SELECT 1 FROM supplier
       |    WHERE s_acctbal < 0 AND s_suppkey = ps_suppkey)
       |GROUP BY p_brand, p_type, p_size
       |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  // ------------------------------------------------------------ Q20
  /** Q20 potential part promotion: AMERICA suppliers holding excess
    * stock of a bolt part — availqty above half of what shipped in
    * 1996. The IN-chain becomes semi-joins: ps × filtered parts
    * (broadcast) × per-part shipped totals (same partkey shuffle),
    * then a semi-join into the supplier dim.
    */
  def q20ExcessStock(spark: SparkSession, dir: String): DataFrame = {
    val shipped = table(spark, dir, "lineitem")
      .where(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
        col("l_shipdate") < ts("1997-01-01 00:00:00"))
      .groupBy(col("l_partkey").as("sk"))
      .agg(dsum(col("l_quantity")).as("total_qty"))
    val bolts = table(spark, dir, "part")
      .where(col("p_name").like("%bolt%")).select(col("p_partkey"))
    val excessSupp = partsupp(spark, dir)
      .join(broadcast(bolts), col("ps_partkey") === col("p_partkey"))
      .join(shipped, col("ps_partkey") === col("sk"))
      .where(col("ps_availqty") > lit(0.5) * col("total_qty"))
      .select(col("ps_suppkey")).distinct()
    supplierRegion(spark, dir, "AMERICA")
      .join(excessSupp, col("s_suppkey") === col("ps_suppkey"), "left_semi")
      .select(col("s_name"), col("s_acctbal"))
      .orderBy(col("s_name"))
  }

  val q20Sql: String =
    s"""WITH $psSql,
       |shipped AS (
       |  SELECT l_partkey AS sk, ${sqlDsum("l_quantity")} AS total_qty
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
       |  GROUP BY l_partkey)
       |SELECT s_name, s_acctbal
       |FROM supplier
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE r_name = 'AMERICA'
       |  AND s_suppkey IN (
       |    SELECT ps_suppkey FROM ps
       |    JOIN shipped ON ps_partkey = sk
       |    WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%bolt%')
       |      AND ps_availqty > 0.5 * total_qty)
       |ORDER BY s_name""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q2_mincost_supplier" -> (q2MinCostSupplier _),
    "q9_product_profit" -> (q9ProductProfit _),
    "q11_important_stock" -> (q11ImportantStock _),
    "q12_ship_buckets" -> (q12ShipBuckets _),
    "q16_parts_supplier" -> (q16PartsSupplier _),
    "q20_excess_stock" -> (q20ExcessStock _))

  val oracles: Map[String, String] = Map(
    "q2_mincost_supplier" -> q2Sql,
    "q9_product_profit" -> q9Sql,
    "q11_important_stock" -> q11Sql,
    "q12_ship_buckets" -> q12Sql,
    "q16_parts_supplier" -> q16Sql,
    "q20_excess_stock" -> q20Sql)
}

package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import QueryUtil._
import graft.functions.CrossHash

/** Table-maintenance / governance operators — the lakehouse jobs that
  * run AROUND a 100 TB corpus rather than inside a single query:
  *
  *  - GDPR deletion cascade (right-to-be-forgotten impact across the
  *    customer → orders → lineitem key chain),
  *  - incremental aggregate maintenance (merge a delta partition's
  *    partial aggregate into a base aggregate without rescanning the
  *    base's inputs — the materialized-view refresh primitive),
  *  - Z-order layout analysis (interleaved-bit space-filling curve
  *    over two predicate columns; the locality score that justifies a
  *    `OPTIMIZE ZORDER BY` rewrite),
  *  - point-in-time state reconstruction (latest event per key AS OF a
  *    timestamp — the time-travel read over an append-only changelog).
  *
  * Scale notes: cohort membership is a pure hash predicate wherever
  * the key is locally available (no join to decide membership), and
  * only propagates through joins where the chain genuinely requires it
  * (lineitem has no customer key); those joins shuffle 8-byte keys
  * with no broadcast hints, since a deletion cohort grows with the
  * data. The aggregate merge touches only (base agg ⨝ delta agg) —
  * group-cardinality-sized inputs, never the raw fact rows. All money
  * sums stay DECIMAL until the final cast ([[QueryUtil]] rationale).
  */
object LakehouseQueries {

  private val GdprMod = 20L // 1-in-20 customers request deletion

  // ---------------------------------------------- replica anti-entropy
  /** Replica divergence audit, Merkle style — "did my cross-region
    * copy drift, and where": two replicas of a derived table are
    * compared by exchanging ONE xor-folded 56-bit digest per key
    * bucket (64 buckets here; xor is commutative/associative, so the
    * digest is partition-order-independent and partial-aggregating —
    * each replica's side costs one scan collapsing to 64 rows), then
    * row-level drill-down joins ONLY the buckets whose digests or
    * counts disagree. At 100 TB that is the whole point: agreement
    * costs 64 rows of network, and repair work scales with the DIFF,
    * not the table (the DynamoDB/Cassandra anti-entropy shape, done
    * as two dataflow passes instead of a tree walk).
    *
    * Replica B's drift is injected deterministically so the oracle
    * can re-derive it: rows at key ≡ 0 (mod 9973) are MISSING, rows
    * at key ≡ 1 (mod 7919) have a corrupted payload, and rows at key
    * ≡ 2 (mod 7717) gained an EXTRA shifted-key clone. The report —
    * one row per diverging bucket with only-in-A / only-in-B /
    * modified counts — classifies all three.
    */
  def lakeReplicaDiff(spark: SparkSession, dir: String): DataFrame = {
    def base = table(spark, dir, "orders")
      .select(col("o_orderkey").as("key"), col("o_custkey").as("ck"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"))
    val a = base
    val extra = base.where(col("key") % 7717 === 2)
      .select((col("key") + 2000000000L).as("key"), col("ck"), col("cents"))
    val b = base.where(col("key") % 9973 =!= 0)
      .withColumn("cents",
        when(col("key") % 7919 === 1, col("cents") + 1L)
          .otherwise(col("cents")))
      .unionByName(extra)
    def digested(r: DataFrame): DataFrame = r
      .withColumn("bucket", pmod(col("key"), lit(64L)))
      .withColumn("h", CrossHash.md5Long(concat_ws(":", lit("replica"),
        col("key"), col("ck"), col("cents"))))
    def bucketDigest(r: DataFrame): DataFrame = digested(r)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), expr("bit_xor(h)").as("digest"))
    val da = bucketDigest(a)
    val db = bucketDigest(b)
    // full outer on bucket: a bucket empty on one side still diverges
    val diverging = da.as("da").join(db.as("db"), Seq("bucket"), "full_outer")
      .where(not(col("da.digest") <=> col("db.digest")) ||
        not(col("da.n") <=> col("db.n")))
      .select(col("bucket"),
        coalesce(col("da.n"), lit(0L)).as("n_a"),
        coalesce(col("db.n"), lit(0L)).as("n_b"))
    // drill-down joins ONLY the diverging buckets (broadcast semi —
    // the bucket list is metadata-sized by construction)
    val keep = broadcast(diverging.select(col("bucket")))
    val ra = digested(a).join(keep, Seq("bucket"), "left_semi")
      .select(col("bucket"), col("key"), col("h").as("h_a"))
    val rb = digested(b).join(keep, Seq("bucket"), "left_semi")
      .select(col("bucket"), col("key"), col("h").as("h_b"))
    val drill = ra.join(rb, Seq("bucket", "key"), "full_outer")
      .groupBy(col("bucket"))
      .agg(
        sum(when(col("h_b").isNull, 1L).otherwise(0L)).as("rows_only_a"),
        sum(when(col("h_a").isNull, 1L).otherwise(0L)).as("rows_only_b"),
        sum(when(col("h_a").isNotNull && col("h_b").isNotNull &&
          col("h_a") =!= col("h_b"), 1L).otherwise(0L)).as("rows_modified"))
    diverging.join(drill, Seq("bucket"))
      .orderBy(col("bucket"))
  }

  val lakeReplicaDiffSql: String = {
    val h = CrossHash.sqlMd5Long(
      "'replica' || ':' || CAST(key AS VARCHAR) || ':' || " +
        "CAST(ck AS VARCHAR) || ':' || CAST(cents AS VARCHAR)")
    s"""WITH base AS (
       |  SELECT o_orderkey AS key, o_custkey AS ck,
       |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
       |  FROM orders),
       |a AS (SELECT * FROM base),
       |b AS (
       |  SELECT key, ck,
       |    CASE WHEN key % 7919 = 1 THEN cents + 1 ELSE cents END AS cents
       |  FROM base WHERE key % 9973 <> 0
       |  UNION ALL
       |  SELECT key + 2000000000, ck, cents FROM base WHERE key % 7717 = 2),
       |ha AS (SELECT key % 64 AS bucket, key, $h AS h FROM a),
       |hb AS (SELECT key % 64 AS bucket, key, $h AS h FROM b),
       |da AS (SELECT bucket, COUNT(*) AS n, bit_xor(h) AS digest
       |  FROM ha GROUP BY bucket),
       |db AS (SELECT bucket, COUNT(*) AS n, bit_xor(h) AS digest
       |  FROM hb GROUP BY bucket),
       |div AS (
       |  SELECT COALESCE(da.bucket, db.bucket) AS bucket,
       |    COALESCE(da.n, 0) AS n_a, COALESCE(db.n, 0) AS n_b
       |  FROM da FULL OUTER JOIN db ON da.bucket = db.bucket
       |  WHERE da.digest IS DISTINCT FROM db.digest
       |    OR da.n IS DISTINCT FROM db.n),
       |drill AS (
       |  SELECT COALESCE(ha.bucket, hb.bucket) AS bucket,
       |    CAST(SUM(CASE WHEN hb.key IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |      AS rows_only_a,
       |    CAST(SUM(CASE WHEN ha.key IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |      AS rows_only_b,
       |    CAST(SUM(CASE WHEN ha.key IS NOT NULL AND hb.key IS NOT NULL
       |      AND ha.h <> hb.h THEN 1 ELSE 0 END) AS BIGINT)
       |      AS rows_modified
       |  FROM (SELECT * FROM ha WHERE bucket IN (SELECT bucket FROM div)) ha
       |  FULL OUTER JOIN
       |    (SELECT * FROM hb WHERE bucket IN (SELECT bucket FROM div)) hb
       |    ON ha.bucket = hb.bucket AND ha.key = hb.key
       |  GROUP BY 1)
       |SELECT div.bucket, div.n_a, div.n_b,
       |  drill.rows_only_a, drill.rows_only_b, drill.rows_modified
       |FROM div JOIN drill ON div.bucket = drill.bucket
       |ORDER BY div.bucket""".stripMargin
  }

  // ------------------------------------------------ deletion cascade
  /** GDPR cascade impact report: rows purged vs kept in each table of
    * the customer → orders → lineitem foreign-key chain when a
    * deterministic 5% customer cohort exercises deletion. customer and
    * orders decide membership from their own key column (pure hash
    * predicate, zero joins); lineitem inherits through a semi-join on
    * purged order keys — the one place the chain forces a join.
    */
  def gdprCascade(spark: SparkSession, dir: String): DataFrame = {
    def inCohort(key: Column): Column =
      CrossHash.md5Long(concat(lit("gdpr:"), key.cast("string"))) %
        GdprMod === 0
    val cust = table(spark, dir, "customer")
      .select(lit("1_customer").as("tbl"),
        inCohort(col("c_custkey")).as("purged"))
    val orders = table(spark, dir, "orders")
    val ordersFlag = orders
      .select(lit("2_orders").as("tbl"),
        inCohort(col("o_custkey")).as("purged"))
    val purgedOrders = orders.where(inCohort(col("o_custkey")))
      .select(col("o_orderkey").as("l_orderkey"))
    val lineFlag = table(spark, dir, "lineitem")
      .join(purgedOrders.withColumn("hit", lit(true)),
        Seq("l_orderkey"), "left_outer")
      .select(lit("3_lineitem").as("tbl"),
        coalesce(col("hit"), lit(false)).as("purged"))
    cust.union(ordersFlag).union(lineFlag)
      .groupBy(col("tbl"))
      .agg(count(when(col("purged"), 1)).as("n_purged"),
        count(when(!col("purged"), 1)).as("n_kept"))
      .withColumn("purged_ppm", ppm(col("n_purged"),
        col("n_purged") + col("n_kept")))
      .orderBy(col("tbl"))
  }

  val gdprCascadeSql: String = {
    def inCohort(key: String): String =
      s"${CrossHash.sqlMd5Long(s"'gdpr:' || CAST($key AS VARCHAR)")} % $GdprMod = 0"
    s"""WITH flags AS (
       |  SELECT '1_customer' AS tbl, ${inCohort("c_custkey")} AS purged
       |  FROM customer
       |  UNION ALL
       |  SELECT '2_orders' AS tbl, ${inCohort("o_custkey")} AS purged
       |  FROM orders
       |  UNION ALL
       |  SELECT '3_lineitem' AS tbl, o.o_orderkey IS NOT NULL AS purged
       |  FROM lineitem l
       |  LEFT JOIN (SELECT o_orderkey FROM orders
       |             WHERE ${inCohort("o_custkey")}) o
       |    ON l.l_orderkey = o.o_orderkey)
       |SELECT tbl,
       |  CAST(COUNT(CASE WHEN purged THEN 1 END) AS BIGINT) AS n_purged,
       |  CAST(COUNT(CASE WHEN NOT purged THEN 1 END) AS BIGINT) AS n_kept,
       |  ${sqlPpm("COUNT(CASE WHEN purged THEN 1 END)", "COUNT(*)")}
       |    AS purged_ppm
       |FROM flags GROUP BY tbl ORDER BY tbl""".stripMargin
  }

  // ------------------------------------------------ aggregate merge
  private val MergeCut = "1997-01-01 00:00:00"

  /** Incremental aggregate maintenance: per-customer order counts and
    * revenue are maintained as base (before the cut date) plus delta
    * (on/after), merged by FULL OUTER JOIN with coalesced partials —
    * the materialized-view refresh that never rescans the base facts.
    * The report is self-verifying: it joins the merged aggregate
    * against a direct recompute over all facts and emits the mismatch
    * count in-band (must be 0), alongside the group provenance split.
    * Count and DECIMAL sum are the mergeable-aggregate pair (avg and
    * ratios derive from them after the merge, never merged directly).
    */
  def incrAggMerge(spark: SparkSession, dir: String): DataFrame = {
    val orders = table(spark, dir, "orders")
    def slice(pred: Column, nc: String, sc: String): DataFrame = orders
      .where(pred)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as(nc),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).as(sc))
    val cut = lit(java.sql.Timestamp.valueOf(MergeCut))
    val base = slice(col("o_orderdate") < cut, "n_b", "s_b")
    val delta = slice(col("o_orderdate") >= cut, "n_d", "s_d")
    val merged = base.join(delta, Seq("o_custkey"), "full_outer")
      .select(col("o_custkey"),
        col("n_b").isNotNull.as("in_base"),
        col("n_d").isNotNull.as("in_delta"),
        (coalesce(col("n_b"), lit(0L)) + coalesce(col("n_d"), lit(0L)))
          .as("n_m"),
        (coalesce(col("s_b"), lit(0).cast(DecimalType(18, 2))) +
          coalesce(col("s_d"), lit(0).cast(DecimalType(18, 2))))
          .as("s_m"))
    val direct = orders.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_t"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).as("s_t"))
    merged.join(direct, Seq("o_custkey"), "full_outer")
      .agg(count(lit(1)).as("n_groups"),
        count(when(col("in_base") && !col("in_delta"), 1))
          .as("n_base_only"),
        count(when(!col("in_base") && col("in_delta"), 1))
          .as("n_delta_only"),
        count(when(col("in_base") && col("in_delta"), 1)).as("n_both"),
        count(when(!(col("n_m") <=> col("n_t")) ||
          !(col("s_m") <=> col("s_t")), 1)).as("n_mismatch"))
  }

  val incrAggMergeSql: String =
    s"""WITH base AS (
       |  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_b,
       |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS s_b
       |  FROM orders WHERE o_orderdate < TIMESTAMP '$MergeCut'
       |  GROUP BY o_custkey),
       |delta AS (
       |  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_d,
       |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS s_d
       |  FROM orders WHERE o_orderdate >= TIMESTAMP '$MergeCut'
       |  GROUP BY o_custkey),
       |merged AS (
       |  SELECT COALESCE(base.o_custkey, delta.o_custkey) AS o_custkey,
       |    base.o_custkey IS NOT NULL AS in_base,
       |    delta.o_custkey IS NOT NULL AS in_delta,
       |    COALESCE(n_b, 0) + COALESCE(n_d, 0) AS n_m,
       |    COALESCE(s_b, CAST(0 AS DECIMAL(18,2)))
       |      + COALESCE(s_d, CAST(0 AS DECIMAL(18,2))) AS s_m
       |  FROM base FULL OUTER JOIN delta ON base.o_custkey = delta.o_custkey),
       |direct AS (
       |  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_t,
       |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS s_t
       |  FROM orders GROUP BY o_custkey)
       |SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
       |  CAST(COUNT(CASE WHEN in_base AND NOT in_delta THEN 1 END)
       |    AS BIGINT) AS n_base_only,
       |  CAST(COUNT(CASE WHEN NOT in_base AND in_delta THEN 1 END)
       |    AS BIGINT) AS n_delta_only,
       |  CAST(COUNT(CASE WHEN in_base AND in_delta THEN 1 END)
       |    AS BIGINT) AS n_both,
       |  CAST(COUNT(CASE WHEN n_m IS DISTINCT FROM n_t
       |    OR s_m IS DISTINCT FROM s_t THEN 1 END) AS BIGINT)
       |    AS n_mismatch
       |FROM merged FULL OUTER JOIN direct USING (o_custkey)""".stripMargin

  // ------------------------------------------------ join maintenance
  /** Incremental JOIN maintenance — the delta-join identity that keeps
    * a materialized join view fresh without rescanning the base
    * tables: with each table split into base/delta by its OWN clock
    * (orders by order date, lineitem by ship date — independent
    * ingestion times, as in a real lakehouse),
    *
    *   A ⨝ B  =  Ab⨝Bb  ∪  Ab⨝Bd  ∪  Ad⨝Bb  ∪  Ad⨝Bd
    *
    * and a refresh only computes the three delta quadrants (the bb
    * quadrant is the previously materialized view). The report carries
    * each quadrant's row count and DECIMAL revenue, the incremental
    * totals, a direct-join recompute, and the match verdicts in-band
    * (must be true) — the same self-verifying shape as
    * [[incrAggMerge]]. Every quadrant shuffles only on the 8-byte join
    * key; the split predicates reach both parquet scans.
    */
  def incrJoinMerge(spark: SparkSession, dir: String): DataFrame = {
    val cut = lit(java.sql.Timestamp.valueOf(MergeCut))
    val o = table(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderdate"))
    val l = table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_shipdate"), col("l_extendedprice"))
    def quad(tag: String, oldO: Boolean, oldL: Boolean): DataFrame =
      o.where(if (oldO) col("o_orderdate") < cut
              else col("o_orderdate") >= cut)
        .join(l.where(if (oldL) col("l_shipdate") < cut
                      else col("l_shipdate") >= cut),
          col("o_orderkey") === col("l_orderkey"))
        .agg(count(lit(1)).as("n"),
          coalesce(sum(col("l_extendedprice").cast(DecimalType(18, 2))),
            lit(0).cast(DecimalType(18, 2))).as("s"))
        .withColumn("quad", lit(tag))
    val quads = quad("bb", oldO = true, oldL = true)
      .unionByName(quad("bd", oldO = true, oldL = false))
      .unionByName(quad("db", oldO = false, oldL = true))
      .unionByName(quad("dd", oldO = false, oldL = false))
    val incr = quads.agg(
      max(when(col("quad") === "bb", col("n"))).as("n_bb"),
      max(when(col("quad") === "bd", col("n"))).as("n_bd"),
      max(when(col("quad") === "db", col("n"))).as("n_db"),
      max(when(col("quad") === "dd", col("n"))).as("n_dd"),
      sum(col("n")).as("n_incr"),
      sum(col("s")).as("s_incr_d"))
    val direct = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .agg(count(lit(1)).as("n_direct"),
        coalesce(sum(col("l_extendedprice").cast(DecimalType(18, 2))),
          lit(0).cast(DecimalType(18, 2))).as("s_direct_d"))
    incr.join(broadcast(direct)) // 1 row × 1 row
      .select(col("n_bb"), col("n_bd"), col("n_db"), col("n_dd"),
        col("n_incr"), col("n_direct"),
        col("s_incr_d").cast("double").as("s_incr"),
        col("s_direct_d").cast("double").as("s_direct"),
        (col("n_incr") === col("n_direct")).as("counts_match"),
        (col("s_incr_d").cast("double") ===
          col("s_direct_d").cast("double")).as("sums_match"))
  }

  val incrJoinMergeSql: String = {
    def quadSql(tag: String, oldO: Boolean, oldL: Boolean): String = {
      val po = if (oldO) "<" else ">="
      val pl = if (oldL) "<" else ">="
      s"""q$tag AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |    COALESCE(SUM(CAST(l_extendedprice AS DECIMAL(18,2))),
         |      CAST(0 AS DECIMAL(18,2))) AS s
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         |  WHERE o_orderdate $po TIMESTAMP '$MergeCut'
         |    AND l_shipdate $pl TIMESTAMP '$MergeCut')"""
    }
    s"""WITH ${quadSql("bb", true, true)},
       |${quadSql("bd", true, false)},
       |${quadSql("db", false, true)},
       |${quadSql("dd", false, false)},
       |direct AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_direct,
       |    COALESCE(SUM(CAST(l_extendedprice AS DECIMAL(18,2))),
       |      CAST(0 AS DECIMAL(18,2))) AS s_direct_d
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey)
       |SELECT qbb.n AS n_bb, qbd.n AS n_bd, qdb.n AS n_db, qdd.n AS n_dd,
       |  qbb.n + qbd.n + qdb.n + qdd.n AS n_incr, n_direct,
       |  CAST(qbb.s + qbd.s + qdb.s + qdd.s AS DOUBLE) AS s_incr,
       |  CAST(s_direct_d AS DOUBLE) AS s_direct,
       |  qbb.n + qbd.n + qdb.n + qdd.n = n_direct AS counts_match,
       |  CAST(qbb.s + qbd.s + qdb.s + qdd.s AS DOUBLE)
       |    = CAST(s_direct_d AS DOUBLE) AS sums_match
       |FROM qbb, qbd, qdb, qdd, direct""".stripMargin
  }

  // ------------------------------------------------ Z-order layout
  private val ZBits = 8 // bits per dimension; z-values span 16 bits
  private val ZBucketShift = 8 // z-values per file bucket = 1 << shift

  /** Z-order (Morton curve) layout analysis over the two predicate
    * columns a warehouse filters orders by — customer key and order
    * day. Each row's interleaved-bit z-value is computed in pure
    * integer arithmetic (per-bit divide/mod — the identical expression
    * text runs on both engines); rows are then grouped into 256
    * curve-contiguous file buckets and each bucket reports its x/y
    * bounding box. Small boxes on both dimensions are the point:
    * a file-level min/max index prunes on BOTH columns, where a
    * single-column sort gives perfect pruning on one and none on the
    * other. The whole analysis is one scan plus a 256-group aggregate;
    * at 100 TB the same z-value is the clustering key a writer sorts
    * by before producing files.
    */
  def layoutZorder(spark: SparkSession, dir: String): DataFrame = {
    def z(xe: String, ye: String, divOp: String): String =
      (0 until ZBits).map { i =>
        val p = 1L << i
        s"((($xe) $divOp $p) % 2 + 2 * ((($ye) $divOp $p) % 2)) * ${1L << (2 * i)}"
      }.mkString(" + ")
    val x = s"o_custkey % 256"
    val orders = table(spark, dir, "orders")
      .withColumn("yday",
        (datediff(to_date(col("o_orderdate")), lit("1992-01-01")) % 256)
          .cast("long"))
    val zcol = expr(z(x, "yday", "div"))
    orders
      .select(col("o_custkey"), col("yday"), zcol.as("zval"))
      .withColumn("bucket", shiftright(col("zval"), ZBucketShift))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        (max(expr(x)) - min(expr(x))).as("x_span"),
        (max(col("yday")) - min(col("yday"))).as("y_span"))
      .orderBy(col("bucket"))
  }

  val layoutZorderSql: String = {
    def z(xe: String, ye: String): String =
      (0 until ZBits).map { i =>
        val p = 1L << i
        s"((($xe) // $p) % 2 + 2 * ((($ye) // $p) % 2)) * ${1L << (2 * i)}"
      }.mkString(" + ")
    s"""WITH pts AS (
       |  SELECT o_custkey % 256 AS x,
       |    date_diff('day', DATE '1992-01-01',
       |      CAST(o_orderdate AS DATE)) % 256 AS yday
       |  FROM orders),
       |zed AS (SELECT x, yday, ${z("x", "yday")} AS zval FROM pts)
       |SELECT zval // ${1L << ZBucketShift} AS bucket,
       |  CAST(COUNT(*) AS BIGINT) AS n_rows,
       |  MAX(x) - MIN(x) AS x_span, MAX(yday) - MIN(yday) AS y_span
       |FROM zed GROUP BY zval // ${1L << ZBucketShift}
       |ORDER BY bucket""".stripMargin
  }

  // ------------------------------------------------ time travel read
  private val AsOf = "2024-01-15 00:00:00" // mid-range of the event log

  /** Point-in-time state reconstruction: each user's latest event at
    * or before the AS-OF timestamp, read from the append-only event
    * log — the time-travel query a changelog-backed table serves
    * without any snapshot having been materialized. One shuffle on the
    * user key; the window is per-user (no global sort), and the
    * timestamp filter reaches the scan so the log's future is never
    * read. (ts, event_id) ordering makes the winner tie-deterministic.
    */
  def eventsStateAt(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    table(spark, dir, "events")
      .where(col("ts") <= lit(java.sql.Timestamp.valueOf(AsOf)))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("last_type"),
        col("value").as("last_value"), col("ts").as("last_ts"),
        col("event_id").as("last_event_id"))
      .orderBy(col("user_id"))
  }

  val eventsStateAtSql: String =
    s"""SELECT user_id, event_type AS last_type, value AS last_value,
       |  ts AS last_ts, event_id AS last_event_id
       |FROM events
       |WHERE ts <= TIMESTAMP '$AsOf'
       |QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
       |  ORDER BY ts DESC, event_id DESC) = 1
       |ORDER BY user_id""".stripMargin

  /** CDC apply — MERGE with delete semantics: treat the event log as
    * a change stream per user (`error` = tombstone/DELETE, anything
    * else = UPSERT of the row's value), apply in event order, and emit
    * the surviving final table. This is the lakehouse `MERGE INTO`
    * core: latest-wins conflict resolution plus tombstone filtering in
    * ONE window pass over the log — no iterative apply loop, one
    * shuffle on the merge key, which is how a 100 TB change backlog
    * replays in a single job. Deletes must actually delete: a user
    * whose LAST event is a tombstone is absent from the output even
    * though earlier upserts exist.
    */
  def eventsCdcApply(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    table(spark, dir, "events")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1 && col("event_type") =!= "error")
      .select(col("user_id"), col("event_type").as("op_type"),
        col("value").as("merged_value"), col("event_id").as("version_id"))
      .orderBy(col("user_id"))
  }

  val eventsCdcApplySql: String =
    """SELECT user_id, event_type AS op_type, value AS merged_value,
      |  event_id AS version_id
      |FROM events
      |QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
      |  ORDER BY ts DESC, event_id DESC) = 1 AND event_type <> 'error'
      |ORDER BY user_id""".stripMargin

  /** Min/max data-skipping analyzer: the quantified case for
    * clustering. The same orders rows are laid out two ways —
    * date-clustered (partitioned by month, 128-row blocks in date
    * order: the layout a date-sorted write produces) and
    * hash-scattered (64 hash buckets, blocks in hash order: the
    * layout an unsorted parallel write produces) — and each block
    * records the min/max of the predicate column, exactly what
    * parquet row-group footers (and Delta/Iceberg file stats) hold. A
    * six-month predicate then prunes every block whose [min,max]
    * window misses it. The date-clustered layout skips ~the
    * predicate's non-selectivity; the scattered layout skips ~nothing
    * (every block's min/max spans the whole domain) — the before/after
    * that justifies OPTIMIZE/ZORDER, measured in-band as ppm.
    *
    * Windows partition by the LAYOUT's physical unit (month dir /
    * hash bucket), so no global sort exists at any scale — mirroring
    * how a real analyzer reads per-file footer stats, a
    * metadata-sized table.
    */
  val PruneBlockRows = 128L
  val PruneLo = "1996-01-01 00:00:00"
  val PruneHi = "1996-07-01 00:00:00"

  def layoutMinmaxPrune(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.CrossHash.md5Long
    val w = Window
    val o = table(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderdate"))
    val monthly = o.withColumn("unit",
      (year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
        .cast("long"))
      .withColumn("blk", floor((row_number().over(
        w.partitionBy(col("unit"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))) - 1)
        / PruneBlockRows))
      .withColumn("layout", lit("date_clustered"))
    val hashed = o.withColumn("h", md5Long(col("o_orderkey").cast("string")))
      .withColumn("unit", col("h") % 64)
      .withColumn("blk", floor((row_number().over(
        w.partitionBy(col("unit")).orderBy(col("h"), col("o_orderkey"))) - 1)
        / PruneBlockRows))
      .withColumn("layout", lit("hash_scattered"))
    val lo = lit(java.sql.Timestamp.valueOf(PruneLo))
    val hi = lit(java.sql.Timestamp.valueOf(PruneHi))
    monthly.select(col("layout"), col("unit"), col("blk"), col("o_orderdate"))
      .union(hashed.select(col("layout"), col("unit"), col("blk"),
        col("o_orderdate")))
      .groupBy(col("layout"), col("unit"), col("blk"))
      .agg(min(col("o_orderdate")).as("mn"), max(col("o_orderdate")).as("mx"),
        count(lit(1)).as("n_rows"))
      .withColumn("pruned", col("mx") < lo || col("mn") >= hi)
      .groupBy(col("layout"))
      .agg(count(lit(1)).as("n_blocks"),
        sum(when(col("pruned"), 1L).otherwise(0L)).as("pruned_blocks"),
        sum(when(col("pruned"), col("n_rows")).otherwise(0L))
          .as("rows_skipped"))
      .withColumn("prune_ppm", ppm(col("pruned_blocks"), col("n_blocks")))
      .orderBy(col("layout"))
  }

  val layoutMinmaxPruneSql: String =
    s"""WITH o AS (SELECT o_orderkey, o_orderdate FROM orders),
       |monthly AS (
       |  SELECT 'date_clustered' AS layout,
       |    CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)
       |      AS unit,
       |    CAST(floor((ROW_NUMBER() OVER (
       |      PARTITION BY year(o_orderdate) * 100 + month(o_orderdate)
       |      ORDER BY o_orderdate, o_orderkey) - 1) / $PruneBlockRows)
       |      AS BIGINT) AS blk,
       |    o_orderdate
       |  FROM o),
       |hashed AS (
       |  SELECT 'hash_scattered' AS layout,
       |    ${graft.functions.CrossHash.sqlMd5Long(
             "CAST(o_orderkey AS VARCHAR)")} % 64 AS unit,
       |    CAST(floor((ROW_NUMBER() OVER (
       |      PARTITION BY ${graft.functions.CrossHash.sqlMd5Long(
             "CAST(o_orderkey AS VARCHAR)")} % 64
       |      ORDER BY ${graft.functions.CrossHash.sqlMd5Long(
             "CAST(o_orderkey AS VARCHAR)")}, o_orderkey) - 1)
       |      / $PruneBlockRows) AS BIGINT) AS blk,
       |    o_orderdate
       |  FROM o),
       |blocks AS (
       |  SELECT layout, unit, blk, MIN(o_orderdate) AS mn,
       |    MAX(o_orderdate) AS mx, COUNT(*) AS n_rows
       |  FROM (SELECT * FROM monthly UNION ALL SELECT * FROM hashed)
       |  GROUP BY 1, 2, 3),
       |flagged AS (
       |  SELECT layout,
       |    (mx < TIMESTAMP '$PruneLo' OR mn >= TIMESTAMP '$PruneHi')
       |      AS pruned,
       |    n_rows
       |  FROM blocks)
       |SELECT layout, CAST(COUNT(*) AS BIGINT) AS n_blocks,
       |  CAST(SUM(CASE WHEN pruned THEN 1 ELSE 0 END) AS BIGINT)
       |    AS pruned_blocks,
       |  CAST(SUM(CASE WHEN pruned THEN n_rows ELSE 0 END) AS BIGINT)
       |    AS rows_skipped,
       |  ${sqlPpm("SUM(CASE WHEN pruned THEN 1 ELSE 0 END)", "COUNT(*)")}
       |    AS prune_ppm
       |FROM flagged
       |GROUP BY layout
       |ORDER BY layout""".stripMargin

  /** Ingest-volume anomaly detection — the data-quality monitor that
    * pages someone before a broken upstream poisons a week of
    * training data: daily order counts against their trailing 7-day
    * mean, deviation as integer ppm of the baseline, rows flagged
    * beyond ±50%. The deviation is `(n·c − s)/s` over exact integers
    * (n today's count, s/c the trailing sum/count), so both engines
    * floor the identical IEEE quotient. Warm-up days (fewer than 3
    * trailing observations) are excluded rather than compared against
    * a meaningless baseline.
    *
    * Scale shape: the per-day aggregate shuffles once on the date key
    * and collapses to one row per day, so the unpartitioned trailing
    * window runs over a METADATA-sized series (thousands of rows per
    * decade), not the fact table.
    */
  val AnomalyPpm = 500000L

  def dqAnomaly(spark: SparkSession, dir: String): DataFrame = {
    // day as an epoch-day integer: a DATE output column reads back
    // with engine-specific pandas dtypes in the driver compare
    val daily = table(spark, dir, "orders")
      .groupBy(epochDay(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("n"))
    val w = Window.orderBy(col("day")).rowsBetween(-7, -1)
    daily
      .withColumn("tsum", sum(col("n")).over(w))
      .withColumn("tcnt", count(col("n")).over(w))
      .where(col("tcnt") >= 3)
      .withColumn("dev_ppm",
        floor(lit(1e6) * (col("n") * col("tcnt") - col("tsum")).cast("double")
          / col("tsum").cast("double")).cast("long"))
      .withColumn("is_anomaly",
        col("dev_ppm") > AnomalyPpm || col("dev_ppm") < -AnomalyPpm)
      .select(col("day"), col("n"), col("tsum"), col("tcnt"),
        col("dev_ppm"), col("is_anomaly"))
      .orderBy(col("day"))
  }

  val dqAnomalySql: String =
    s"""WITH daily AS (
       |  SELECT ${sqlEpochDay("o_orderdate")} AS day, COUNT(*) AS n
       |  FROM orders GROUP BY 1),
       |trail AS (
       |  SELECT day, n,
       |    SUM(n) OVER (ORDER BY day
       |      ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS tsum,
       |    COUNT(n) OVER (ORDER BY day
       |      ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS tcnt
       |  FROM daily)
       |SELECT day, n, CAST(tsum AS BIGINT) AS tsum,
       |  CAST(tcnt AS BIGINT) AS tcnt,
       |  CAST(floor(1e6 * CAST(n * tcnt - tsum AS DOUBLE)
       |    / CAST(tsum AS DOUBLE)) AS BIGINT) AS dev_ppm,
       |  (CAST(floor(1e6 * CAST(n * tcnt - tsum AS DOUBLE)
       |    / CAST(tsum AS DOUBLE)) AS BIGINT) > $AnomalyPpm
       |   OR CAST(floor(1e6 * CAST(n * tcnt - tsum AS DOUBLE)
       |    / CAST(tsum AS DOUBLE)) AS BIGINT) < -$AnomalyPpm) AS is_anomaly
       |FROM trail
       |WHERE tcnt >= 3
       |ORDER BY day""".stripMargin

  // ------------------------------------------------ CUSUM change-point
  /** CUSUM change-point detection over daily order volume — the
    * SUSTAINED-shift monitor the point-anomaly queries miss: a 20%
    * drift that never breaches the per-day threshold accumulates in
    * the one-sided sums `pos_d = max(0, pos_{d-1} + n_d − target − k)`
    * / `neg_d = max(0, neg_{d-1} + target − n_d − k)` until the alarm
    * (> 5k) fires. Target and slack derive from the series itself
    * (dense-day integer mean, k = max(1, target/10)), so the whole
    * walk is exact long arithmetic — identical in both engines.
    *
    * Scale shape: one shuffle collapses the fact table to the
    * per-day aggregate; the inherently sequential max-recurrence then
    * folds the METADATA-sized dense day series on the driver (one row
    * per day — the [[EventQueries.eventsEwma]] argument; the
    * truncating max() recurrence has no closed form and no window
    * expression). The oracle runs the identical walk as a recursive
    * CTE.
    */
  def dqCusum(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = table(spark, dir, "orders")
      .groupBy(epochDay(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    if (daily.isEmpty)
      spark.emptyDataset[(Long, Long, Long, Long, Boolean)]
        .toDF("day", "n", "cusum_pos", "cusum_neg", "alarm")
    else {
      val d0 = daily.keys.min
      val d1 = daily.keys.max
      val target = daily.values.sum / (d1 - d0 + 1)
      val k = math.max(1L, target / 10)
      val out = Vector.newBuilder[(Long, Long, Long, Long, Boolean)]
      var (pos, neg) = (0L, 0L)
      (d0 to d1).foreach { day =>
        val n = daily.getOrElse(day, 0L)
        pos = math.max(0L, pos + n - target - k)
        neg = math.max(0L, neg + target - n - k)
        out += ((day, n, pos, neg, pos > 5 * k || neg > 5 * k))
      }
      out.result().toDF("day", "n", "cusum_pos", "cusum_neg", "alarm")
    }
  }

  val dqCusumSql: String =
    s"""WITH RECURSIVE daily AS (
       |  SELECT ${sqlEpochDay("o_orderdate")} AS day,
       |    CAST(COUNT(*) AS BIGINT) AS n
       |  FROM orders GROUP BY 1),
       |b AS (
       |  SELECT MIN(day) AS d0, MAX(day) AS d1,
       |    CAST(SUM(n) AS BIGINT) AS total
       |  FROM daily),
       |p AS (
       |  SELECT d0, d1, total // (d1 - d0 + 1) AS target,
       |    greatest(1, (total // (d1 - d0 + 1)) // 10) AS k
       |  FROM b),
       |walk(day, n, cpos, cneg) AS (
       |  SELECT p.d0, COALESCE(d.n, 0),
       |    greatest(0, COALESCE(d.n, 0) - p.target - p.k),
       |    greatest(0, p.target - COALESCE(d.n, 0) - p.k)
       |  FROM p LEFT JOIN daily d ON d.day = p.d0
       |  UNION ALL
       |  SELECT w.day + 1, COALESCE(d.n, 0),
       |    greatest(0, w.cpos + COALESCE(d.n, 0) - p.target - p.k),
       |    greatest(0, w.cneg + p.target - COALESCE(d.n, 0) - p.k)
       |  FROM walk w CROSS JOIN p LEFT JOIN daily d ON d.day = w.day + 1
       |  WHERE w.day < p.d1)
       |SELECT w.day, w.n, CAST(w.cpos AS BIGINT) AS cusum_pos,
       |  CAST(w.cneg AS BIGINT) AS cusum_neg,
       |  (w.cpos > 5 * p.k OR w.cneg > 5 * p.k) AS alarm
       |FROM walk w, p""".stripMargin

  // ------------------------------------------------ vacuum planner
  /** VACUUM planner — quantifies what a retention sweep would delete
    * before anyone runs it: treating `events` as the append-only
    * versioned log (the same framing as [[eventsCdcApply]] /
    * [[eventsStateAt]]), a row is reclaimable when it is SUPERSEDED
    * (not its user's latest version) AND older than the retention
    * cutoff (max ts − 7 days) — Delta/Iceberg VACUUM semantics, where
    * only stale versions past the retention window are eligible and
    * the current version is always kept.
    *
    * Scale shape: one shuffle on user_id for the latest-version
    * window, the cutoff is a 1-row broadcast, and the report
    * aggregates to one row per day. No global sort.
    */
  def layoutVacuum(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val v = table(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"),
        epochDay(col("ts")).as("day"))
      .withColumn("rn", row_number().over(w))
    val cutoff = table(spark, dir, "events")
      .agg((max(col("ts")) - expr("INTERVAL 7 DAYS")).as("cutoff"))
    v.crossJoin(broadcast(cutoff))
      .withColumn("reclaimable", col("rn") > 1 && col("ts") < col("cutoff"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_rows"),
        count(when(col("reclaimable"), 1)).as("n_reclaimable"))
      .select(col("day"), col("n_rows"), col("n_reclaimable"),
        ppm(col("n_reclaimable"), col("n_rows")).as("reclaim_ppm"))
      .orderBy(col("day"))
  }

  val layoutVacuumSql: String =
    s"""WITH v AS (
       |  SELECT user_id, event_id, ts,
       |    ${sqlEpochDay("ts")} AS day,
       |    ROW_NUMBER() OVER (PARTITION BY user_id
       |      ORDER BY ts DESC, event_id DESC) AS rn
       |  FROM events),
       |wm AS (SELECT MAX(ts) - INTERVAL 7 DAY AS cutoff FROM events)
       |SELECT day, COUNT(*) AS n_rows,
       |  CAST(COUNT(*) FILTER (WHERE rn > 1 AND ts < cutoff) AS BIGINT)
       |    AS n_reclaimable,
       |  ${sqlPpm(
      "COUNT(*) FILTER (WHERE rn > 1 AND ts < cutoff)", "COUNT(*)")}
       |    AS reclaim_ppm
       |FROM v, wm GROUP BY day ORDER BY day""".stripMargin

  // --------------------------------------------- compaction planner
  /** Small-file compaction planner — the OPTIMIZE bin-packer: files
    * (simulated as 256 hash buckets of orders, sizes = row counts)
    * are packed in file order into output groups of ≥ [[CompactTarget]]
    * rows via an exclusive prefix sum (`group = prefix div target` —
    * the same deterministic placement primitive as pipeline_pack,
    * applied at FILE granularity where the list is metadata-sized).
    *
    * Scale shape: the per-file aggregate shuffles once with map-side
    * combine and collapses to the file count (thousands of rows for
    * millions of files); the unpartitioned packing window runs over
    * that metadata-sized list, never the fact table. Real OPTIMIZE
    * planners work exactly on this file-stats table.
    */
  val CompactTarget = 1000L

  def layoutCompaction(spark: SparkSession, dir: String): DataFrame = {
    val files = table(spark, dir, "orders")
      .groupBy((col("o_orderkey") % 256).as("fid"))
      .agg(count(lit(1)).as("n_rows"))
    val w = Window.orderBy(col("fid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    files
      .withColumn("pre", coalesce(sum(col("n_rows")).over(w), lit(0L)))
      .withColumn("out_group", expr(s"pre div $CompactTarget"))
      .groupBy(col("out_group"))
      .agg(count(lit(1)).as("n_files"), sum(col("n_rows")).as("total_rows"),
        min(col("fid")).as("first_fid"), max(col("fid")).as("last_fid"))
      .orderBy(col("out_group"))
  }

  val layoutCompactionSql: String =
    s"""WITH files AS (
       |  SELECT o_orderkey % 256 AS fid, COUNT(*) AS n_rows
       |  FROM orders GROUP BY 1),
       |packed AS (
       |  SELECT fid, n_rows,
       |    CAST(COALESCE(SUM(n_rows) OVER (ORDER BY fid
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS BIGINT) // $CompactTarget AS out_group
       |  FROM files)
       |SELECT out_group, COUNT(*) AS n_files,
       |  CAST(SUM(n_rows) AS BIGINT) AS total_rows,
       |  MIN(fid) AS first_fid, MAX(fid) AS last_fid
       |FROM packed GROUP BY out_group ORDER BY out_group""".stripMargin

  // ------------------------------------------- bucketed co-located join
  /** Fact-to-fact join with the shuffle REMOVED by physical layout:
    * both sides are written as bucketed tables on the join key
    * (`bucketBy(8, orderkey)` + in-bucket sort), so the sort-merge
    * join consumes the buckets' partitioning and ordering directly —
    * the formatted plan has NO Exchange on either join side (pinned in
    * PlanAuditSpec). This is the layout lever for the joins broadcast
    * can't save: at 100 TB neither lineitem nor orders fits in an
    * executor, and an unbucketed join shuffles BOTH fact tables every
    * run; bucketing pays that shuffle once at write time and every
    * subsequent join of the pair rides it free. The join is hinted
    * `merge` only to keep the demonstration stable at test scale,
    * where the small side would otherwise broadcast.
    *
    * The tables land in the session warehouse under fixed names
    * (overwritten per run, so repeated invocations don't accumulate);
    * the oracle computes the same aggregate straight from parquet, so
    * a row lost or duplicated by the bucketed write path diverges the
    * hash.
    */
  /** Drop `name` and remove its warehouse directory: `overwrite` alone
    * is not enough across JVM sessions — the in-memory catalog starts
    * empty but the warehouse directory persists, and saveAsTable
    * refuses to reuse an existing location for an "unknown" table.
    */
  private def resetManagedTable(spark: SparkSession, name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    val p = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), name)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }

  def layoutBucketJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = "graft_bucketed_lineitem"
    val ord = "graft_bucketed_orders"
    resetManagedTable(spark, li)
    resetManagedTable(spark, ord)
    table(spark, dir, "lineitem")
      .select(col("l_orderkey"),
        floor(col("l_extendedprice") * 100).cast("long").as("cents"))
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").format("parquet").saveAsTable(li)
    table(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"))
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").format("parquet").saveAsTable(ord)
    spark.table(li).hint("merge")
      .join(spark.table(ord), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"),
        sum(col("l_orderkey")).as("sum_keys"))
  }

  val layoutBucketJoinSql: String =
    """SELECT o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
      |    AS sum_cents,
      |  CAST(SUM(l_orderkey) AS BIGINT) AS sum_keys
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority""".stripMargin

  // ------------------------------------------- dynamic partition pruning
  /** Dynamic partition pruning over a day-partitioned fact: events are
    * written `partitionBy(day)` (the standard time-partitioned layout
    * for a 100 TB event lake), then joined to a small day-dimension
    * filtered to one weekday. The dimension's filter can't be pushed
    * statically — the matching days are only known at runtime — so
    * Catalyst injects a `dynamicpruning` subquery into the fact scan's
    * PartitionFilters (pinned in PlanAuditSpec): the fact side reads
    * 1/7th of the partitions instead of all of them. At 100 TB that
    * is the difference between scanning 14 TB and 100 TB for every
    * dimension-filtered query.
    *
    * The day dimension is generated (`spark.range` over the epoch-day
    * space), NOT derived from the fact — mirroring a real calendar
    * dim — and its weekday attribute is pure integer arithmetic so
    * the DuckDB twin reproduces the filter exactly.
    */
  def layoutDppPrune(spark: SparkSession, dir: String): DataFrame = {
    // fixed location + overwrite, same discipline as the bucketed
    // tables: a fresh temp dir per invocation would leave a full copy
    // of events behind on every bench pass / verify sweep
    val out = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), "graft_dpp_events")
      .toString
    table(spark, dir, "events")
      .select(col("event_type"), col("value"), epochDay(col("ts")).as("day"))
      .repartition(col("day")) // one file per day partition, not 32
      .write.partitionBy("day").mode("overwrite").parquet(out)
    val fact = spark.read.parquet(out)
    // partition columns read back type-INFERRED from directory names
    // (int for epoch days); the dim must match exactly — a cast on the
    // fact's partition column would block the pruning subquery
    val days = spark.range(0, 30000)
      .select(col("id").cast("int").as("day"), (col("id") % 7).as("dow"))
      .where(col("dow") === 3)
    fact.join(days, "day")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("day")).as("n_days"),
        sum(floor(col("value") * 100).cast("long")).as("sum_centi"))
  }

  val layoutDppPruneSql: String =
    s"""SELECT event_type, COUNT(*) AS n,
       |  CAST(COUNT(DISTINCT ${sqlEpochDay("ts")}) AS BIGINT) AS n_days,
       |  CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
       |    AS sum_centi
       |FROM events
       |WHERE ${sqlEpochDay("ts")} % 7 = 3
       |GROUP BY event_type""".stripMargin

  // ------------------------------------------- data contract check
  /** Declarative data-contract check over the `events` stream — the
    * Great-Expectations-style gate a pipeline runs before PUBLISHING
    * a table, as a query: each contracted rule (non-null keys,
    * non-negative ids, a closed event-type domain, value and
    * event-time ranges) reports its violation count and verdict.
    * [[dqProfile]] describes what the data IS; this checks it against
    * what a consumer was PROMISED, and a failing rule is a report
    * row, not an exception — the publish gate decides.
    *
    * Scale shape: ONE partial-aggregatable pass computes every rule's
    * violation count (conditional sums fused into a single aggregate
    * — no per-rule scans), then a 6-row literal unpivot. At 100 TB
    * the contract costs exactly one scan of the columns it names.
    */
  def dqContract(spark: SparkSession, dir: String): DataFrame = {
    val viol = (c: Column) => sum(when(c, 1L).otherwise(0L))
    val agg = table(spark, dir, "events")
      .withColumn("s", unix_timestamp(col("ts")))
      .agg(count(lit(1)).as("n_rows"),
        viol(col("user_id").isNull).as("v_uid_null"),
        viol(col("user_id") < 0).as("v_uid_neg"),
        viol(col("event_id").isNull).as("v_eid_null"),
        viol(!col("event_type").isin(
          "view", "click", "purchase", "signup", "error"))
          .as("v_type_domain"),
        viol(col("value") < 0 || col("value") > 1e9).as("v_value_range"),
        viol(col("s") < 1577836800L || col("s") >= 1925000000L)
          .as("v_ts_range"))
    agg.select(col("n_rows"), expr(
      """stack(6,
        |  'user_id', 'not_null', v_uid_null,
        |  'user_id', 'non_negative', v_uid_neg,
        |  'event_id', 'not_null', v_eid_null,
        |  'event_type', 'in_domain', v_type_domain,
        |  'value', 'in_range', v_value_range,
        |  'ts', 'in_range', v_ts_range) AS (column_name, rule,
        |    n_violations)""".stripMargin))
      .select(col("column_name"), col("rule"), col("n_violations"),
        col("n_rows"), (col("n_violations") === 0L).as("pass"))
  }

  val dqContractSql: String =
    """WITH a AS (
      |  SELECT COUNT(*) AS n_rows,
      |    CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |      AS v_uid_null,
      |    CAST(SUM(CASE WHEN user_id < 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS v_uid_neg,
      |    CAST(SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |      AS v_eid_null,
      |    CAST(SUM(CASE WHEN event_type NOT IN
      |      ('view', 'click', 'purchase', 'signup', 'error')
      |      THEN 1 ELSE 0 END) AS BIGINT) AS v_type_domain,
      |    CAST(SUM(CASE WHEN value < 0 OR value > 1e9 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS v_value_range,
      |    CAST(SUM(CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) < 1577836800
      |      OR CAST(floor(epoch(ts)) AS BIGINT) >= 1925000000
      |      THEN 1 ELSE 0 END) AS BIGINT) AS v_ts_range
      |  FROM events)
      |SELECT u.column_name, u.rule, u.n_violations, a.n_rows,
      |  u.n_violations = 0 AS pass
      |FROM a, LATERAL (
      |  SELECT 'user_id' AS column_name, 'not_null' AS rule,
      |    v_uid_null AS n_violations
      |  UNION ALL SELECT 'user_id', 'non_negative', v_uid_neg
      |  UNION ALL SELECT 'event_id', 'not_null', v_eid_null
      |  UNION ALL SELECT 'event_type', 'in_domain', v_type_domain
      |  UNION ALL SELECT 'value', 'in_range', v_value_range
      |  UNION ALL SELECT 'ts', 'in_range', v_ts_range) u""".stripMargin

  // ------------------------------------------- schema evolution
  /** Schema-evolution read — the lakehouse behavior every long-lived
    * table depends on: files written by an OLD writer (no
    * `value_centi` column) and a NEW writer (with it) under one table
    * root, read back through `mergeSchema` into the union schema with
    * the old generation's missing column surfacing as NULL. The
    * report proves the semantics per generation: row counts survive,
    * the evolved column is non-null exactly where the new writer
    * wrote it, and aggregates over it skip the old files (SQL
    * null-skipping) rather than polluting them with zeros.
    *
    * The generations split `events` by `event_id` parity and land as
    * `gen=1/` / `gen=2/` partition directories under a PER-INVOCATION
    * temp root (unlike [[layoutDppPrune]]'s fixed path, this query
    * writes as a side effect of a read — a unique root keeps
    * concurrent invocations from racing each other's overwrites; the
    * 2-row report is eagerly materialized so the finally can delete
    * the directory), so partition discovery also exercises the
    * directory-derived column.
    * The oracle never reads the files: it recomputes the same split
    * with `CASE`-nulled values from the source table — the Spark side
    * can only match if the merged read truly nulls the old
    * generation. Scale shape: two one-pass projections at write, one
    * partial-aggregating groupBy at read; `mergeSchema` costs one
    * footer read per FILE at planning time, which is why production
    * tables pin the merged schema in a catalog — the read semantics
    * proven here are identical.
    */
  def lakeSchemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    val outPath = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      s"graft_evo_events_${java.util.UUID.randomUUID().toString.take(8)}")
    val out = outPath.toString
    val fs = outPath.getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    try {
      val ev = table(spark, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          floor(col("value") * 100).cast("long").as("value_centi"))
      ev.where(col("event_id") % 2 === 0).drop("value_centi")
        .write.mode("overwrite").parquet(s"$out/gen=1")
      ev.where(col("event_id") % 2 =!= 0)
        .write.mode("overwrite").parquet(s"$out/gen=2")
      spark.read.option("mergeSchema", "true").parquet(out)
        .groupBy(col("gen"))
        .agg(count(lit(1)).as("n_rows"),
          count(col("value_centi")).as("n_value_present"),
          sum(col("value_centi")).as("sum_value_centi"),
          countDistinct(col("event_type")).as("n_types"))
        .localCheckpoint(true) // eager: the finally deletes the files
    } finally fs.delete(outPath, true)
  }

  val lakeSchemaEvolutionSql: String =
    """WITH ev AS (
      |  SELECT CAST(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 2 END AS INTEGER)
      |      AS gen,
      |    event_type,
      |    CASE WHEN event_id % 2 = 0 THEN NULL
      |      ELSE CAST(floor(value * 100) AS BIGINT) END AS value_centi
      |  FROM events)
      |SELECT gen, COUNT(*) AS n_rows,
      |  COUNT(value_centi) AS n_value_present,
      |  CAST(SUM(value_centi) AS BIGINT) AS sum_value_centi,
      |  CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
      |FROM ev GROUP BY gen""".stripMargin

  // ------------------------------------------- distribution drift
  /** Distribution drift monitor — [[dqAnomaly]] flags VOLUME spikes;
    * this flags SHAPE changes that volume alone misses (a day with a
    * normal event count but values suddenly skewed is the classic
    * silent-upstream-change failure). Each day's value histogram
    * (10 fixed-width buckets) is compared to the corpus-wide histogram
    * by L1 distance in exact integer ppm — the total-variation-style
    * score drift monitors report.
    *
    * Scale shape: one shuffle on (day, bucket) with map-side combine
    * collapses the fact table to histogram cells; everything after
    * runs on METADATA-sized rows (days × 10 buckets), with the corpus
    * histogram a 10-row broadcast. Missing cells are restored by a
    * day×bucket grid so absent buckets contribute their full corpus
    * share to the distance (a day missing a bucket IS drift).
    */
  val DriftPpm = 200000L

  def dqDistributionDrift(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
      .select(epochDay(col("ts")).as("day"),
        least(floor(col("value") / 50).cast("long"), lit(9L)).as("bucket"))
    // ONE fact-table scan: the day/corpus/total marginals are all
    // rollups of the (day, bucket) cells
    val daily = ev.groupBy(col("day"), col("bucket"))
      .agg(count(lit(1)).as("n_db"))
      .cache()
    val dayTot = daily.groupBy(col("day")).agg(sum(col("n_db")).as("n_d"))
    val corpus = daily.groupBy(col("bucket"))
      .agg(sum(col("n_db")).as("n_b"))
    val total = daily.agg(sum(col("n_db")).as("n_total"))
    dayTot.crossJoin(broadcast(corpus.crossJoin(total)))
      .join(daily, Seq("day", "bucket"), "left_outer")
      .withColumn("n_db", coalesce(col("n_db"), lit(0L)))
      .withColumn("diff_ppm",
        abs(ppm(col("n_db"), col("n_d")) - ppm(col("n_b"), col("n_total"))))
      .groupBy(col("day"), col("n_d"))
      .agg(sum(col("diff_ppm")).as("drift_ppm"))
      .select(col("day"), col("n_d"), col("drift_ppm"),
        (col("drift_ppm") > DriftPpm).as("is_drift"))
      .orderBy(col("day"))
  }

  val dqDistributionDriftSql: String =
    s"""WITH ev AS (
       |  SELECT ${sqlEpochDay("ts")} AS day,
       |    least(CAST(floor(value / 50) AS BIGINT), 9) AS bucket
       |  FROM events),
       |daily AS (SELECT day, bucket, COUNT(*) AS n_db FROM ev GROUP BY 1, 2),
       |daytot AS (SELECT day, CAST(SUM(n_db) AS BIGINT) AS n_d
       |  FROM daily GROUP BY 1),
       |corpus AS (SELECT bucket, COUNT(*) AS n_b FROM ev GROUP BY 1),
       |total AS (SELECT COUNT(*) AS n_total FROM ev),
       |cells AS (
       |  SELECT g.day, g.n_d,
       |    abs(${sqlPpm("COALESCE(dl.n_db, 0)", "g.n_d")}
       |      - ${sqlPpm("g.n_b", "g.n_total")}) AS diff_ppm
       |  FROM (SELECT d.day, d.n_d, c.bucket, c.n_b, t.n_total
       |        FROM daytot d, corpus c, total t) g
       |  LEFT JOIN daily dl ON g.day = dl.day AND g.bucket = dl.bucket)
       |SELECT day, n_d, CAST(SUM(diff_ppm) AS BIGINT) AS drift_ppm,
       |  CAST(SUM(diff_ppm) AS BIGINT) > $DriftPpm AS is_drift
       |FROM cells GROUP BY day, n_d ORDER BY day""".stripMargin

  // --------------------------------------- robust (MAD) anomaly
  /** Robust anomaly detection via median absolute deviation — the
    * estimator [[dqAnomaly]]'s trailing MEAN lacks: a mean-based
    * monitor is dragged by the very outliers it hunts (one 10× day
    * inflates the baseline and masks the next spike), while the
    * median/MAD pair has a 50% breakdown point. Flags days where
    * |n − median| > 3·MAD — the standard robust z-score rule.
    *
    * The fact table collapses to the per-day series first; both
    * median aggregates run over that METADATA-sized series and
    * broadcast back as one row. Exact-percentile interpolation on
    * identical integer operands is engine-identical (the proven
    * percentile_quantity pattern); centi-scaled floors ship the
    * medians as exact integers.
    */
  def dqAnomalyMad(spark: SparkSession, dir: String): DataFrame = {
    val daily = table(spark, dir, "orders")
      .groupBy(epochDay(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("n"))
      .cache() // feeds the median, the MAD, and the final scan
    val med = daily.agg(percentile(col("n"), lit(0.5)).as("med"))
    val mad = daily.crossJoin(broadcast(med))
      .agg(percentile(abs(col("n") - col("med")), lit(0.5)).as("mad"),
        first(col("med")).as("med"))
    daily.crossJoin(broadcast(mad))
      .select(col("day"), col("n"),
        floor(col("med") * 100).cast("long").as("med_centi"),
        floor(col("mad") * 100).cast("long").as("mad_centi"),
        (abs(col("n") - col("med")) > lit(3.0) * col("mad"))
          .as("is_anomaly"))
      .orderBy(col("day"))
  }

  val dqAnomalyMadSql: String =
    s"""WITH daily AS (
      |  SELECT ${sqlEpochDay("o_orderdate")} AS day, COUNT(*) AS n
      |  FROM orders GROUP BY 1),
      |med AS (SELECT quantile_cont(n, 0.5) AS med FROM daily),
      |mad AS (
      |  SELECT quantile_cont(abs(n - med), 0.5) AS mad,
      |    ANY_VALUE(med) AS med
      |  FROM daily, med)
      |SELECT day, n,
      |  CAST(floor(med * 100) AS BIGINT) AS med_centi,
      |  CAST(floor(mad * 100) AS BIGINT) AS mad_centi,
      |  abs(n - med) > 3.0 * mad AS is_anomaly
      |FROM daily, mad ORDER BY day""".stripMargin

  // --------------------------------------------- join-key skew report
  /** Join-key skew diagnostics — the "why is my shuffle stage slow"
    * report, run over the three join-key families the TPC-H-ish
    * workload shuffles on: per family, row/key counts, the hottest
    * key's count, the max/mean imbalance (the straggler-task bound:
    * an imbalance of k·10^6 means the worst shuffle partition holds
    * ≥k× its fair share), and the top-10-key concentration — the two
    * numbers that decide between plain hash join, AQE skew split, and
    * salting (the remedies `agg_salted_skew` and the AQE proof spec
    * demonstrate).
    *
    * Scale shape: each family is one partial-aggregatable count per
    * key; everything after runs on the counts frame, which is
    * key-cardinality-sized, and the top-10 read compiles to
    * TakeOrderedAndProject. Integer-exact: counts are int64 and both
    * ppm ratios are the shared floor-divide on identical operands
    * (operand products stay under 2^53 for any per-family profile
    * with max_cnt·n_keys < 9·10^15 — comfortably true wherever a
    * single key count still fits a task).
    */
  // -------------------------------------- referential integrity
  /** Foreign-key profile across the star schema's four FK edges: per
    * family, child rows/keys, orphan rows/keys (child keys with no
    * parent — the broken-FK count a DQ gate alerts on), and what
    * fraction of parent keys the children actually reference (ppm) —
    * the "parts never ordered" coverage number capacity planning
    * reads. On healthy TPC-H-shaped data orphans are zero; the query
    * PROVES that instead of assuming it.
    *
    * Scale shape: each family first collapses the child to one row
    * per key (partial-aggregatable count — the fact table never
    * reaches the join), then left-joins parent KEYS ONLY on that key;
    * both sides shuffle on the 8-byte key, unhinted (orders-as-parent
    * is fact-sized — the [[TpchSupplyQueries]] hint-hygiene rule).
    * Everything after runs on key-cardinality frames; the parent
    * total is a one-row broadcast.
    */
  private def fkOf(spark: SparkSession, dir: String, child: String,
      key: String, parent: String, pkey: String): DataFrame = {
    val c = table(spark, dir, child).groupBy(col(key).as("k"))
      .agg(count(lit(1)).as("rows"))
    val p = table(spark, dir, parent).select(col(pkey).as("k"),
      lit(1L).as("hit"))
    val pcnt = table(spark, dir, parent).agg(count(lit(1)).as("n_parent"))
    c.join(p, Seq("k"), "left")
      .agg(sum(col("rows")).as("n_child_rows"),
        count(lit(1)).as("n_child_keys"),
        sum(when(col("hit").isNull, col("rows")).otherwise(0L))
          .as("n_orphan_rows"),
        sum(when(col("hit").isNull, 1L).otherwise(0L)).as("n_orphan_keys"),
        sum(when(col("hit").isNotNull, 1L).otherwise(0L)).as("mk"))
      .crossJoin(broadcast(pcnt))
      .select(lit(s"$child.$key").as("key_family"), col("n_child_rows"),
        col("n_child_keys"), col("n_orphan_rows"), col("n_orphan_keys"),
        ppm(col("mk"), col("n_parent")).as("parent_used_ppm"))
  }

  def dqReferential(spark: SparkSession, dir: String): DataFrame =
    fkOf(spark, dir, "lineitem", "l_partkey", "part", "p_partkey")
      .unionByName(fkOf(spark, dir, "lineitem", "l_suppkey",
        "supplier", "s_suppkey"))
      .unionByName(fkOf(spark, dir, "lineitem", "l_orderkey",
        "orders", "o_orderkey"))
      .unionByName(fkOf(spark, dir, "orders", "o_custkey",
        "customer", "c_custkey"))

  val dqReferentialSql: String = {
    def fam(child: String, key: String, parent: String, pkey: String,
        tag: String): String =
      s"""c_$tag AS (
         |  SELECT $key AS k, COUNT(*) AS rows FROM $child GROUP BY 1),
         |j_$tag AS (
         |  SELECT c.rows, p.$pkey IS NOT NULL AS hit
         |  FROM c_$tag c LEFT JOIN $parent p ON c.k = p.$pkey),
         |r_$tag AS (
         |  SELECT '$child.$key' AS key_family,
         |    CAST(SUM(rows) AS BIGINT) AS n_child_rows,
         |    CAST(COUNT(*) AS BIGINT) AS n_child_keys,
         |    CAST(SUM(CASE WHEN NOT hit THEN rows ELSE 0 END) AS BIGINT)
         |      AS n_orphan_rows,
         |    CAST(SUM(CASE WHEN NOT hit THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_orphan_keys,
         |    ${sqlPpm("SUM(CASE WHEN hit THEN 1 ELSE 0 END)",
              s"(SELECT COUNT(*) FROM $parent)")} AS parent_used_ppm
         |  FROM j_$tag)""".stripMargin
    s"""WITH ${fam("lineitem", "l_partkey", "part", "p_partkey", "lp")},
       |${fam("lineitem", "l_suppkey", "supplier", "s_suppkey", "ls")},
       |${fam("lineitem", "l_orderkey", "orders", "o_orderkey", "lo")},
       |${fam("orders", "o_custkey", "customer", "c_custkey", "oc")}
       |SELECT * FROM r_lp UNION ALL SELECT * FROM r_ls
       |UNION ALL SELECT * FROM r_lo UNION ALL SELECT * FROM r_oc""".stripMargin
  }

  private def skewOf(df: DataFrame, key: String, fam: String): DataFrame = {
    val counts = df.groupBy(col(key).as("k"))
      .agg(count(lit(1)).as("cnt"))
      .cache() // feeds the totals and the top-10 read
    val top10 = counts.orderBy(col("cnt").desc, col("k").asc).limit(10)
      .agg(sum(col("cnt")).as("top10"))
    counts.agg(sum(col("cnt")).as("n_rows"), count(lit(1)).as("n_keys"),
        max(col("cnt")).as("max_cnt"))
      .crossJoin(broadcast(top10))
      .select(lit(fam).as("key_family"), col("n_rows"), col("n_keys"),
        col("max_cnt"),
        ppm(col("max_cnt") * col("n_keys"), col("n_rows"))
          .as("imbalance_ppm"),
        ppm(col("top10"), col("n_rows")).as("top10_share_ppm"))
  }

  def dqSkewReport(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem")
    skewOf(li, "l_suppkey", "lineitem.l_suppkey")
      .unionByName(skewOf(li, "l_partkey", "lineitem.l_partkey"))
      .unionByName(skewOf(table(spark, dir, "orders"), "o_custkey",
        "orders.o_custkey"))
      .orderBy(col("key_family"))
  }

  val dqSkewReportSql: String = {
    def fam(tbl: String, key: String, tag: String): String =
      s"""c_$tag AS (
         |  SELECT $key AS k, CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM $tbl GROUP BY 1),
         |t_$tag AS (
         |  SELECT CAST(SUM(cnt) AS BIGINT) AS top10 FROM (
         |    SELECT cnt FROM c_$tag ORDER BY cnt DESC, k LIMIT 10)),
         |a_$tag AS (
         |  SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows,
         |    CAST(COUNT(*) AS BIGINT) AS n_keys, MAX(cnt) AS max_cnt
         |  FROM c_$tag),
         |r_$tag AS (
         |  SELECT '$tbl.$key' AS key_family, n_rows, n_keys, max_cnt,
         |    ${sqlPpm("max_cnt * n_keys", "n_rows")} AS imbalance_ppm,
         |    ${sqlPpm("top10", "n_rows")} AS top10_share_ppm
         |  FROM a_$tag, t_$tag)""".stripMargin
    s"""WITH ${fam("lineitem", "l_suppkey", "ls")},
       |${fam("lineitem", "l_partkey", "lp")},
       |${fam("orders", "o_custkey", "oc")}
       |SELECT * FROM r_ls UNION ALL
       |SELECT * FROM r_lp UNION ALL
       |SELECT * FROM r_oc
       |ORDER BY key_family""".stripMargin
  }

  // ------------------------------------------------- freshness SLO
  /** Per-stream freshness report: for each event_type, how far its
    * newest event lags the table's global high-water mark, how much
    * volume landed in the trailing 24 h before that mark, and whether
    * the lag breaches a 1-hour staleness SLO. This is the first page
    * of any ingestion dashboard — a partner feed that silently stops
    * emitting fails THIS check days before it fails a volume-anomaly
    * check, because lag grows monotonically while daily volume decays
    * into the noise floor.
    *
    * Determinism: all arithmetic on exact epoch-microsecond integers
    * (`unix_micros`/`epoch_us` — both engines' native exact
    * extraction); the division to whole seconds is integer `div`.
    * Scale shape: one partial-aggregating groupBy to |event_type|
    * rows (min/max/conditional-count all collapse map-side against
    * the broadcast 1-row global max), so the report never shuffles
    * event rows — the 24 h window is a conditional aggregate, not a
    * filtered second scan.
    */
  def dqFreshness(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
      // ts is TIMESTAMP_NTZ; the session is pinned UTC, so the cast
      // is the identity reinterpretation DuckDB's epoch_us applies
      .select(col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("ts_us"))
    val gmax = ev.agg(max(col("ts_us")).as("gmax_us"))
    ev.crossJoin(broadcast(gmax))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        max(col("ts_us")).as("max_ts_us"),
        max(col("gmax_us")).as("gmax_us"),
        count(when(col("ts_us") >= col("gmax_us") - lit(86400000000L),
          lit(1))).as("n_recent_24h"))
      .withColumn("lag_s", expr("(gmax_us - max_ts_us) div 1000000"))
      .withColumn("stale", col("lag_s") > 3600L)
      .select(col("event_type"), col("n_events"), col("max_ts_us"),
        col("lag_s"), col("n_recent_24h"), col("stale"))
  }

  val dqFreshnessSql: String =
    """WITH ev AS (
      |  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
      |  FROM events),
      |g AS (SELECT MAX(ts_us) AS gmax_us FROM ev)
      |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
      |  MAX(ts_us) AS max_ts_us,
      |  (gmax_us - MAX(ts_us)) // 1000000 AS lag_s,
      |  CAST(COUNT(CASE WHEN ts_us >= gmax_us - 86400000000
      |    THEN 1 END) AS BIGINT) AS n_recent_24h,
      |  ((gmax_us - MAX(ts_us)) // 1000000) > 3600 AS stale
      |FROM ev, g
      |GROUP BY event_type, gmax_us""".stripMargin

  // ------------------------------------------------- ANALYZE stats
  /** ANALYZE-style COLUMN STATISTICS over orders — the table profile a
    * cost-based optimizer consumes (and the one
    * [[graft.sources.SyntheticV2Source]] answers in closed form for
    * its generated interval): per column, exact NDV, null count, and
    * min/max rendered to strings so one long-format report covers
    * heterogeneous types. Exact NDV is deliberate — this is the
    * nightly stats JOB (one shuffle per column on the value, the
    * price of exactness); the in-flight estimator is
    * `approx_distinct_*`'s HLL, already gated with its error bound.
    * Long format (one row per column) is what a stats CATALOG stores,
    * and it keeps the oracle comparison schema-stable as columns are
    * added.
    */
  def lakeAnalyzeStats(spark: SparkSession, dir: String): DataFrame = {
    val o = table(spark, dir, "orders")
    def statsOf(c: String, render: Column => Column): DataFrame =
      o.agg(count(lit(1)).as("n_rows"),
          countDistinct(col(c)).as("ndv"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
          render(min(col(c))).as("min_val"),
          render(max(col(c))).as("max_val"))
        .select(lit(c).as("column_name"), col("n_rows"), col("ndv"),
          col("n_null"), col("min_val"), col("max_val"))
    statsOf("o_orderkey", _.cast("string"))
      .unionByName(statsOf("o_custkey", _.cast("string")))
      .unionByName(statsOf("o_orderstatus", _.cast("string")))
      .unionByName(statsOf("o_orderpriority", _.cast("string")))
      .unionByName(statsOf("o_orderdate",
        c => date_format(c, "yyyy-MM-dd")))
      .unionByName(statsOf("o_totalprice",
        c => floor(c * 100).cast("long").cast("string")))
  }

  val lakeAnalyzeStatsSql: String = {
    def row(c: String, minMax: String => String) =
      s"""SELECT '$c' AS column_name, COUNT(*) AS n_rows,
         |  COUNT(DISTINCT $c) AS ndv,
         |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_null,
         |  ${minMax(s"MIN($c)")} AS min_val,
         |  ${minMax(s"MAX($c)")} AS max_val
         |FROM orders""".stripMargin
    Seq(
      row("o_orderkey", v => s"CAST($v AS VARCHAR)"),
      row("o_custkey", v => s"CAST($v AS VARCHAR)"),
      row("o_orderstatus", v => s"CAST($v AS VARCHAR)"),
      row("o_orderpriority", v => s"CAST($v AS VARCHAR)"),
      row("o_orderdate",
        v => s"strftime(CAST($v AS DATE), '%Y-%m-%d')"),
      row("o_totalprice",
        v => s"CAST(CAST(floor($v * 100) AS BIGINT) AS VARCHAR)"))
      .mkString("\nUNION ALL\n")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "lake_analyze_stats" -> (lakeAnalyzeStats _),
    "dq_freshness" -> (dqFreshness _),
    "dq_anomaly_mad" -> (dqAnomalyMad _),
    "dq_referential" -> (dqReferential _),
    "dq_skew_report" -> (dqSkewReport _),
    "layout_vacuum" -> (layoutVacuum _),
    "layout_compaction" -> (layoutCompaction _),
    "dq_distribution_drift" -> (dqDistributionDrift _),
    "dq_anomaly" -> (dqAnomaly _),
    "dq_cusum" -> (dqCusum _),
    "layout_minmax_prune" -> (layoutMinmaxPrune _),
    "events_cdc_apply" -> (eventsCdcApply _),
    "gdpr_cascade" -> (gdprCascade _),
    "incr_agg_merge" -> (incrAggMerge _),
    "incr_join_merge" -> (incrJoinMerge _),
    "layout_zorder" -> (layoutZorder _),
    "layout_bucket_join" -> (layoutBucketJoin _),
    "layout_dpp_prune" -> (layoutDppPrune _),
    "lake_schema_evolution" -> (lakeSchemaEvolution _),
    "lake_replica_diff" -> (lakeReplicaDiff _),
    "dq_contract" -> (dqContract _),
    "events_state_at" -> (eventsStateAt _))

  val oracles: Map[String, String] = Map(
    "lake_analyze_stats" -> lakeAnalyzeStatsSql,
    "dq_freshness" -> dqFreshnessSql,
    "dq_anomaly_mad" -> dqAnomalyMadSql,
    "dq_referential" -> dqReferentialSql,
    "dq_skew_report" -> dqSkewReportSql,
    "layout_vacuum" -> layoutVacuumSql,
    "layout_compaction" -> layoutCompactionSql,
    "dq_distribution_drift" -> dqDistributionDriftSql,
    "dq_anomaly" -> dqAnomalySql,
    "dq_cusum" -> dqCusumSql,
    "layout_minmax_prune" -> layoutMinmaxPruneSql,
    "events_cdc_apply" -> eventsCdcApplySql,
    "gdpr_cascade" -> gdprCascadeSql,
    "incr_agg_merge" -> incrAggMergeSql,
    "incr_join_merge" -> incrJoinMergeSql,
    "layout_zorder" -> layoutZorderSql,
    "layout_bucket_join" -> layoutBucketJoinSql,
    "layout_dpp_prune" -> layoutDppPruneSql,
    "lake_schema_evolution" -> lakeSchemaEvolutionSql,
    "lake_replica_diff" -> lakeReplicaDiffSql,
    "dq_contract" -> dqContractSql,
    "events_state_at" -> eventsStateAtSql)
}

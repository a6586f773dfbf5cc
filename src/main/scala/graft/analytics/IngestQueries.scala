package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.ingest.{GraftConfig, IngestOps, Priority, Status}
import QueryUtil._

/** The reference's operator inventory (SURVEY.md §2: F1 validation, W1
  * chunking, A1 status fold, O1 priority ordering, J1 lookup join)
  * exercised over the driver's TPC-H-ish tables so each op gets a
  * DuckDB-oracle correctness check. The lineitem/orders columns stand
  * in for ids/priorities; the operator logic is the production code in
  * [[graft.ingest.IngestOps]], not test-only copies.
  */
object IngestQueries {

  private val cfg = GraftConfig.parity

  /** W1 — chunk each order's linenumbers into batches of ≤3, one row
    * per batch, order preserving (reference: src/app.js:123-124).
    * Emitted as CSV strings so the compare is type-stable.
    */
  def ingestChunk(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem")
    val perOrder = li
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_list(col("l_linenumber").cast("long")))
        .as("ids"))
    perOrder
      .select(col("l_orderkey"),
        posexplode(IngestOps.chunk(col("ids"), cfg.batchSize))
          .as(Seq("ordinal", "batch_ids")))
      .select(
        col("l_orderkey"),
        col("ordinal").cast("long").as("ordinal"),
        concat_ws(",", col("batch_ids")).as("ids_csv"),
        size(col("batch_ids")).cast("long").as("batch_size"))
  }

  val ingestChunkSql: String =
    """WITH expl AS (
      |  SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS id,
      |         row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) AS rn
      |  FROM lineitem)
      |SELECT l_orderkey,
      |       CAST(floor((rn - 1) / 3) AS BIGINT) AS ordinal,
      |       string_agg(CAST(id AS VARCHAR), ',' ORDER BY rn) AS ids_csv,
      |       COUNT(*) AS batch_size
      |FROM expl GROUP BY 1, 2""".stripMargin

  /** F1 — validation predicate over synthesized requests: per order,
    * ids = l_partkey × 1,000,000 (some exceed the 1e9+7 cap) and
    * priority mapped from o_orderpriority ('4-NOT SPECIFIED' maps to an
    * out-of-domain value, exercising the enum check;
    * reference: src/app.js:110-116).
    */
  def ingestValidate(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem")
    val o = table(spark, dir, "orders")
    val reqs = li
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_list(col("l_partkey") * 1000000L)).as("ids"))
    val mapped = o.select(
      col("o_orderkey"),
      when(substring(col("o_orderpriority"), 1, 1).isin("1", "2"),
          Priority.High)
        .when(substring(col("o_orderpriority"), 1, 1) === "3", Priority.Medium)
        .when(substring(col("o_orderpriority"), 1, 1) === "5", Priority.Low)
        .otherwise("NOT_A_PRIORITY").as("priority"))
    mapped
      .join(reqs, mapped("o_orderkey") === reqs("l_orderkey"), "left_outer")
      .select(
        col("o_orderkey"),
        col("priority"),
        coalesce(size(col("ids")), lit(0)).cast("long").as("n_ids"),
        (IngestOps.validIds(coalesce(col("ids"),
            array().cast("array<bigint>")), cfg) &&
          IngestOps.validPriority(col("priority"))).as("valid"))
  }

  val ingestValidateSql: String =
    """WITH reqs AS (
      |  SELECT l_orderkey, COUNT(*) AS n_ids,
      |         bool_and(l_partkey * 1000000 BETWEEN 1 AND 1000000007) AS ids_ok
      |  FROM lineitem GROUP BY 1),
      |mapped AS (
      |  SELECT o_orderkey,
      |         CASE WHEN substr(o_orderpriority, 1, 1) IN ('1','2') THEN 'HIGH'
      |              WHEN substr(o_orderpriority, 1, 1) = '3' THEN 'MEDIUM'
      |              WHEN substr(o_orderpriority, 1, 1) = '5' THEN 'LOW'
      |              ELSE 'NOT_A_PRIORITY' END AS priority
      |  FROM orders)
      |SELECT m.o_orderkey, m.priority,
      |       COALESCE(r.n_ids, 0) AS n_ids,
      |       (COALESCE(r.ids_ok, TRUE)
      |        AND m.priority IN ('HIGH','MEDIUM','LOW')) AS valid
      |FROM mapped m LEFT JOIN reqs r ON m.o_orderkey = r.l_orderkey""".stripMargin

  /** A1 — overall-status fold: each lineitem row plays a batch whose
    * status derives from l_returnflag (A→completed, R→triggered,
    * N→yet_to_start); fold per order with the reference's exact
    * semantics incl. the vacuous-completed empty case
    * (reference: src/app.js:168-173; test/test_api.js:47-57).
    */
  def ingestStatusFold(spark: SparkSession, dir: String): DataFrame = {
    val o = table(spark, dir, "orders")
    val li = table(spark, dir, "lineitem")
    val batches = li.select(
      col("l_orderkey").as("ingestion_id"),
      when(col("l_returnflag") === "A", Status.Completed)
        .when(col("l_returnflag") === "R", Status.Triggered)
        .otherwise(Status.YetToStart).as("status"))
    val ingestions = o.select(col("o_orderkey").as("ingestion_id"))
    IngestOps.statusOf(ingestions, batches)
      .select(col("ingestion_id").as("o_orderkey"), col("status"))
  }

  val ingestStatusFoldSql: String =
    """WITH batches AS (
      |  SELECT l_orderkey AS ingestion_id,
      |         CASE l_returnflag WHEN 'A' THEN 'completed'
      |                           WHEN 'R' THEN 'triggered'
      |                           ELSE 'yet_to_start' END AS status
      |  FROM lineitem),
      |agg AS (
      |  SELECT ingestion_id, COUNT(*) AS n,
      |         COUNT(CASE WHEN status = 'completed' THEN 1 END) AS nc,
      |         COUNT(CASE WHEN status = 'triggered' THEN 1 END) AS nt
      |  FROM batches GROUP BY 1)
      |SELECT o.o_orderkey,
      |       CASE WHEN COALESCE(a.n, 0) = COALESCE(a.nc, 0) THEN 'completed'
      |            WHEN COALESCE(a.nt, 0) > 0 THEN 'triggered'
      |            ELSE 'yet_to_start' END AS status
      |FROM orders o LEFT JOIN agg a ON o.o_orderkey = a.ingestion_id""".stripMargin

  /** O1/O3 — priority-queue ordering: orders as queue entries with
    * weight from o_orderpriority, ordered weight DESC then createdAt
    * ASC with an explicit key tiebreak (reference: src/app.js:37-42).
    * Top 100 queue positions.
    */
  def ingestPriorityQueue(spark: SparkSession, dir: String): DataFrame = {
    val o = table(spark, dir, "orders")
    val weighted = o.select(
      col("o_orderkey"),
      when(substring(col("o_orderpriority"), 1, 1).isin("1", "2"),
          Priority.High)
        .when(substring(col("o_orderpriority"), 1, 1) === "3", Priority.Medium)
        .otherwise(Priority.Low).as("priority"),
      col("o_orderdate"))
    // Global top-k: orderBy+limit compiles to TakeOrderedAndProject
    // (per-partition top-100 then a 100-row merge on the driver) — no
    // single-partition global sort. The row_number window then runs
    // over only the 100 surviving rows.
    weighted
      .orderBy(IngestOps.priorityWeight(col("priority")).desc,
        col("o_orderdate").asc, col("o_orderkey").asc)
      .limit(100)
      .withColumn("position",
        row_number().over(Window.orderBy(
          IngestOps.priorityWeight(col("priority")).desc,
          col("o_orderdate").asc, col("o_orderkey").asc)))
      .select(col("position").cast("long").as("position"),
        col("o_orderkey"), col("priority"))
  }

  val ingestPriorityQueueSql: String =
    """WITH weighted AS (
      |  SELECT o_orderkey,
      |         CASE WHEN substr(o_orderpriority, 1, 1) IN ('1','2') THEN 'HIGH'
      |              WHEN substr(o_orderpriority, 1, 1) = '3' THEN 'MEDIUM'
      |              ELSE 'LOW' END AS priority,
      |         o_orderdate
      |  FROM orders)
      |SELECT * FROM (
      |  SELECT row_number() OVER (ORDER BY
      |           CASE priority WHEN 'HIGH' THEN 3 WHEN 'MEDIUM' THEN 2 ELSE 1 END DESC,
      |           o_orderdate ASC, o_orderkey ASC) AS position,
      |         o_orderkey, priority
      |  FROM weighted) WHERE position <= 100""".stripMargin

  /** J1 — the reference's only join: per-batch status lookup with
    * yet_to_start default for misses (reference: src/app.js:166, 179 —
    * `batches.get(id)?.status || 'yet_to_start'`). Batch stubs are all
    * lineitem rows; the live-status side holds only A/R rows, so N
    * rows exercise the coalesce default. Runs the production
    * [[IngestOps.withBatchStatus]] (broadcast left join).
    */
  def ingestBatchStatusJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem")
    val stubs = li.select(
      concat_ws("-", col("l_orderkey"), col("l_linenumber")).as("batch_id"),
      col("l_orderkey"))
    val live = li
      .where(col("l_returnflag").isin("A", "R"))
      .select(
        concat_ws("-", col("l_orderkey"), col("l_linenumber")).as("batch_id"),
        when(col("l_returnflag") === "A", Status.Completed)
          .otherwise(Status.Triggered).as("status"))
    IngestOps.withBatchStatus(stubs, live)
  }

  val ingestBatchStatusJoinSql: String =
    """WITH stubs AS (
      |  SELECT l_orderkey || '-' || l_linenumber AS batch_id, l_orderkey
      |  FROM lineitem),
      |live AS (
      |  SELECT l_orderkey || '-' || l_linenumber AS batch_id,
      |         CASE l_returnflag WHEN 'A' THEN 'completed'
      |                           ELSE 'triggered' END AS status
      |  FROM lineitem WHERE l_returnflag IN ('A', 'R'))
      |SELECT s.batch_id, s.l_orderkey,
      |       COALESCE(l.status, 'yet_to_start') AS status
      |FROM stubs s LEFT JOIN live l ON s.batch_id = l.batch_id""".stripMargin

  /** S4 — point lookup by key (reference: src/app.js:160 —
    * `ingestions.get(id)`). The predicate reaches the parquet scan as
    * an In filter, so at scale this reads only matching row groups.
    */
  def ingestPointLookup(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .where(col("o_orderkey").isin(1L, 2L, 3L))
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("o_orderpriority"), col("o_totalprice"))

  val ingestPointLookupSql: String =
    """SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
      |FROM orders WHERE o_orderkey IN (1, 2, 3)""".stripMargin

  /** Data-quality profile: the analytics-scale face of the
    * reference's F1 validation — instead of accepting/rejecting one
    * request, profile WHOLE TABLES for constraint violations before
    * training consumes them. One metric row per check: row counts,
    * domain-range violations (the reference's [1, 1e9+7] id window
    * applied to order keys), null/empty payloads, schema-shape drift
    * (embedding dimensionality), and referential orphans both ways
    * across orders ⨝ customer / lineitem ⨝ orders (anti-join counts —
    * only join keys shuffle). Each check is a partial-aggregatable
    * scan or a key-only anti join, so the profile costs one pass per
    * table at any scale; the union is of 1-row aggregates.
    */
  def dqProfile(spark: SparkSession, dir: String): DataFrame = {
    val o = table(spark, dir, "orders")
    val l = table(spark, dir, "lineitem")
    val c = table(spark, dir, "customer")
    val d = table(spark, dir, "documents")
    val e = table(spark, dir, "embeddings")
    // all of a table's conditional counts ride ONE aggregate over one
    // scan, then stack() unpivots the single row into metric rows —
    // so the profile genuinely costs one pass per table
    def metrics(from: DataFrame, checks: (String, Column)*): DataFrame = {
      val agged = from.agg(
        checks.head._2.cast("long").as(checks.head._1),
        checks.tail.map { case (n, v) => v.cast("long").as(n) }: _*)
      val stackArgs = checks.map { case (n, _) => s"'$n', `$n`" }
        .mkString(", ")
      agged.select(
        expr(s"stack(${checks.size}, $stackArgs) AS (metric, value)"))
    }
    metrics(o,
      "orders_rows" -> count(lit(1)),
      "orders_key_out_of_domain" -> count(when(col("o_orderkey") < 1 ||
        col("o_orderkey") > 1000000007L, 1)),
      "orders_null_date" -> count(when(col("o_orderdate").isNull, 1)),
      "orders_nonpositive_total" -> count(when(col("o_totalprice") <= 0, 1)))
      .unionByName(metrics(
        o.join(c, o("o_custkey") === c("c_custkey"), "left_anti"),
        "orders_orphan_custkey" -> count(lit(1))))
      .unionByName(metrics(
        l.join(o, l("l_orderkey") === o("o_orderkey"), "left_anti"),
        "lineitem_orphan_orderkey" -> count(lit(1))))
      .unionByName(metrics(l,
        "lineitem_qty_out_of_range" ->
          count(when(col("l_quantity") <= 0 || col("l_quantity") > 50, 1)),
        "lineitem_discount_out_of_range" ->
          count(when(col("l_discount") < 0 || col("l_discount") > 1, 1))))
      .unionByName(metrics(d,
        "documents_empty_text" -> count(when(length(col("text")) === 0, 1)),
        "documents_nchars_drift" ->
          count(when(length(col("text")) =!= col("n_chars"), 1))))
      .unionByName(metrics(e,
        "embeddings_dim_violations" ->
          count(when(size(col("embedding")) =!= 64, 1))))
  }

  val dqProfileSql: String =
    """SELECT 'orders_rows' AS metric, COUNT(*) AS value FROM orders
      |UNION ALL SELECT 'orders_key_out_of_domain',
      |  COUNT(CASE WHEN o_orderkey < 1 OR o_orderkey > 1000000007 THEN 1 END)
      |  FROM orders
      |UNION ALL SELECT 'orders_null_date',
      |  COUNT(CASE WHEN o_orderdate IS NULL THEN 1 END) FROM orders
      |UNION ALL SELECT 'orders_nonpositive_total',
      |  COUNT(CASE WHEN o_totalprice <= 0 THEN 1 END) FROM orders
      |UNION ALL SELECT 'orders_orphan_custkey', COUNT(*) FROM orders
      |  WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
      |UNION ALL SELECT 'lineitem_orphan_orderkey', COUNT(*) FROM lineitem
      |  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
      |UNION ALL SELECT 'lineitem_qty_out_of_range',
      |  COUNT(CASE WHEN l_quantity <= 0 OR l_quantity > 50 THEN 1 END)
      |  FROM lineitem
      |UNION ALL SELECT 'lineitem_discount_out_of_range',
      |  COUNT(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 END)
      |  FROM lineitem
      |UNION ALL SELECT 'documents_empty_text',
      |  COUNT(CASE WHEN length(text) = 0 THEN 1 END) FROM documents
      |UNION ALL SELECT 'documents_nchars_drift',
      |  COUNT(CASE WHEN length(text) <> n_chars THEN 1 END) FROM documents
      |UNION ALL SELECT 'embeddings_dim_violations',
      |  COUNT(CASE WHEN len(embedding) <> 64 THEN 1 END) FROM embeddings""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dq_profile" -> (dqProfile _),
    "ingest_chunk" -> (ingestChunk _),
    "ingest_validate" -> (ingestValidate _),
    "ingest_status_fold" -> (ingestStatusFold _),
    "ingest_priority_queue" -> (ingestPriorityQueue _),
    "ingest_batch_status_join" -> (ingestBatchStatusJoin _),
    "ingest_point_lookup" -> (ingestPointLookup _))

  val oracles: Map[String, String] = Map(
    "dq_profile" -> dqProfileSql,
    "ingest_chunk" -> ingestChunkSql,
    "ingest_validate" -> ingestValidateSql,
    "ingest_status_fold" -> ingestStatusFoldSql,
    "ingest_priority_queue" -> ingestPriorityQueueSql,
    "ingest_batch_status_join" -> ingestBatchStatusJoinSql,
    "ingest_point_lookup" -> ingestPointLookupSql)
}

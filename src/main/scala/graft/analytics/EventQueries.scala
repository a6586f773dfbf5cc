package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import QueryUtil._

/** Event-time analytics over the `events` table (SURVEY.md §7 Phase 4).
  *
  * These run here in batch mode for the oracle gate, but every operator
  * is chosen to be streaming-transplantable: `window`/`session_window`
  * are the exact expressions a `readStream` pipeline uses with a
  * watermark (see [[graft.streaming]]); the JSON extraction is a
  * codegen'd built-in. At 100 TB the tumbling/sliding aggregations are
  * partial-aggregatable (map-side combine on (window, key)); session
  * windows shuffle once on user_id.
  */
object EventQueries {

  /** Tumbling 1-hour event-time windows per event type. */
  def eventsTumbling(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(col("win.start").as("win_start"), col("event_type"),
        col("n"), col("sum_value"))

  val eventsTumblingSql: String =
    s"""SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS win_start,
       |  event_type, COUNT(*) AS n, ${sqlDsum("value")} AS sum_value
       |FROM events GROUP BY 1, 2""".stripMargin

  /** Sliding windows: 1-hour length, 30-minute slide — every event
    * lands in exactly two windows. The oracle reproduces Spark's
    * epoch-aligned window assignment with a lateral offset join.
    */
  def eventsSliding(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("win"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(col("win.start").as("win_start"), col("n"), col("sum_value"))

  val eventsSlidingSql: String =
    s"""WITH assigned AS (
       |  SELECT time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP))
       |           - k.k * INTERVAL '30 minutes' AS win_start, value
       |  FROM events, LATERAL (SELECT unnest(generate_series(0, 1)) AS k) k)
       |SELECT win_start, COUNT(*) AS n, ${sqlDsum("value")} AS sum_value
       |FROM assigned GROUP BY 1""".stripMargin

  /** Session windows: per-user sessions closed by a 30-minute
    * inactivity gap. Spark's `session_window` ends `gap` after the
    * last event, so session_start = min(ts) matches the oracle's
    * gaps-and-islands formulation exactly.
    */
  def eventsSession(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .groupBy(session_window(col("ts"), "30 minutes").as("win"),
        col("user_id"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(col("user_id"), col("win.start").as("session_start"),
        col("n"), col("sum_value"))

  val eventsSessionSql: String =
    s"""WITH marked AS (
       |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
       |    CASE WHEN CAST(ts AS TIMESTAMP)
       |           - lag(CAST(ts AS TIMESTAMP)) OVER w >= INTERVAL '30 minutes'
       |         OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |ids AS (
       |  SELECT user_id, ts, value,
       |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |      ROWS UNBOUNDED PRECEDING) AS sess_id
       |  FROM marked)
       |SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n,
       |  ${sqlDsum("value")} AS sum_value
       |FROM ids GROUP BY user_id, sess_id""".stripMargin

  /** Semi-structured extraction: JSON string column → typed field,
    * aggregated. `get_json_object` is a codegen'd built-in — no UDF.
    */
  def eventsJson(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        max(col("k")).as("max_k"))

  val eventsJsonSql: String =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      |FROM events GROUP BY event_type""".stripMargin

  /** Map-type function breadth: build a typed map per event (JSON
    * prop, scaled value, user bucket) and drive the map family —
    * `element_at`, `size`, `map_keys` (construction order is
    * preserved), `aggregate` over `map_values`, and the higher-order
    * `map_filter`. The oracle re-derives every scalar from the flat
    * columns, pinning the map pipeline's arithmetic end to end. All
    * pure per-row expressions — no shuffle.
    */
  def eventsMapFuncs(spark: SparkSession, dir: String): DataFrame = {
    val k = get_json_object(col("props"), "$.k").cast("long")
    val m = map(
      lit("k"), k,
      lit("cents"), floor(col("value") * 100).cast("long"),
      // `%` (not pmod): Spark's % matches DuckDB's sign-of-dividend
      // semantics on ALL inputs; pmod would diverge on negatives
      lit("uid"), col("user_id") % 100)
    table(spark, dir, "events")
      .select(col("event_id"),
        element_at(m, "k").as("k_val"),
        size(m).cast("long").as("m_size"),
        concat_ws(",", map_keys(m)).as("keys_csv"),
        aggregate(map_values(m), lit(0L), (acc, x) => acc + x)
          .as("vals_sum"),
        size(map_filter(m, (_, v) => v > 50)).cast("long")
          .as("n_over_50"))
  }

  val eventsMapFuncsSql: String = {
    val k = "CAST(json_extract_string(props, '$.k') AS BIGINT)"
    val cents = "CAST(floor(value * 100) AS BIGINT)"
    val uid = "user_id % 100"
    s"""SELECT event_id,
       |  $k AS k_val,
       |  CAST(3 AS BIGINT) AS m_size,
       |  'k,cents,uid' AS keys_csv,
       |  $k + $cents + $uid AS vals_sum,
       |  CAST((CASE WHEN $k > 50 THEN 1 ELSE 0 END)
       |     + (CASE WHEN $cents > 50 THEN 1 ELSE 0 END)
       |     + (CASE WHEN $uid > 50 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_over_50
       |FROM events""".stripMargin
  }

  /** Pivot: per-day counts by event type as columns. Spark's `pivot`
    * with an explicit value list (never let it scan for values at
    * scale — that is an extra job over 100 TB).
    */
  def eventsPivot(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .select(to_date(col("ts")).as("day"), col("event_type"))
      .groupBy(col("day"))
      .pivot("event_type",
        Seq("click", "purchase", "error", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .select(col("day").cast("string").as("day"), col("click"),
        col("purchase"), col("error"), col("signup"), col("view"))

  val eventsPivotSql: String =
    """SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
      |  COUNT(*) FILTER (WHERE event_type = 'click') AS click,
      |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
      |  COUNT(*) FILTER (WHERE event_type = 'error') AS error,
      |  COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
      |  COUNT(*) FILTER (WHERE event_type = 'view') AS view
      |FROM events GROUP BY 1""".stripMargin

  /** UNPIVOT — the inverse reshape of [[eventsPivot]]: the wide daily
    * count matrix back to long (day, event_type, n) rows via `stack`
    * (Spark's unpivot generator — a pure per-row expansion, no
    * shuffle beyond the pivot's own aggregation). Zero-count cells
    * survive the round trip, which is what makes unpivot the
    * gap-preserving inverse rather than a re-aggregation.
    */
  def eventsUnpivot(spark: SparkSession, dir: String): DataFrame =
    eventsPivot(spark, dir).select(col("day"),
      expr("""stack(5,
        'click', click, 'purchase', purchase, 'error', error,
        'signup', signup, 'view', view) AS (event_type, n)"""))

  val eventsUnpivotSql: String =
    s"""WITH p AS ($eventsPivotSql)
       |SELECT day, 'click' AS event_type, click AS n FROM p
       |UNION ALL SELECT day, 'purchase', purchase FROM p
       |UNION ALL SELECT day, 'error', error FROM p
       |UNION ALL SELECT day, 'signup', signup FROM p
       |UNION ALL SELECT day, 'view', view FROM p""".stripMargin

  /** Funnel: per user, first signup vs. first purchase, conversion
    * flag. One shuffle on user_id; conditional aggregation instead of
    * a self-join.
    */
  def eventsFunnel(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "signup", col("ts"))).as("first_signup"),
        min(when(col("event_type") === "purchase", col("ts"))).as("first_purchase"))
      .select(col("user_id"), col("first_signup"), col("first_purchase"),
        (col("first_purchase").isNotNull && col("first_signup").isNotNull &&
          col("first_purchase") > col("first_signup")).as("converted"))

  val eventsFunnelSql: String =
    """WITH f AS (
      |  SELECT user_id,
      |    MIN(CASE WHEN event_type = 'signup' THEN CAST(ts AS TIMESTAMP) END)
      |      AS first_signup,
      |    MIN(CASE WHEN event_type = 'purchase' THEN CAST(ts AS TIMESTAMP) END)
      |      AS first_purchase
      |  FROM events GROUP BY user_id)
      |SELECT user_id, first_signup, first_purchase,
      |  (first_purchase IS NOT NULL AND first_signup IS NOT NULL
      |   AND first_purchase > first_signup) AS converted
      |FROM f""".stripMargin

  /** As-of join — an operator Spark has no built-in for, composed the
    * scalable way (SURVEY.md §7 preference (a)): for each purchase,
    * the user's most recent click at or before it.
    *
    * Instead of a range-condition join (which explodes) or a per-key
    * sort-merge UDF, tag both sides, union them, and take a running
    * `last(click, ignoreNulls)` over one (user, time)-ordered window —
    * one shuffle on user_id, linear work, arbitrarily skew-tolerant
    * via AQE — and ONE scan of events (side is derived, not two
    * filtered reads). Clicks sort before purchases at equal
    * timestamps, so "at or before" matches DuckDB's native ASOF (>=)
    * semantics the oracle uses. Clicks are pre-deduped to one per
    * (user, ts) — μs truncation can manufacture timestamp ties, and
    * ASOF's pick among tied right rows is engine-arbitrary; a
    * tie-free right side makes both engines deterministic.
    */
  def eventsAsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val both = table(spark, dir, "events")
      .where(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("ts"),
        when(col("event_type") === "click", 0).otherwise(1).as("side"),
        when(col("event_type") === "click", col("event_id")).as("click_id"),
        when(col("event_type") === "purchase", col("event_id"))
          .as("purchase_id"))
    val clicks = both.where(col("side") === 0)
      .groupBy(col("user_id"), col("ts"), col("side"))
      .agg(max(col("click_id")).as("click_id"),
        max(col("purchase_id")).as("purchase_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("side").asc,
        coalesce(col("click_id"), col("purchase_id")).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    clicks.select("user_id", "ts", "side", "click_id", "purchase_id")
      .union(both.where(col("side") === 1))
      .withColumn("asof_click_id",
        last(col("click_id"), ignoreNulls = true).over(w))
      .where(col("side") === 1)
      .select(col("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"), col("asof_click_id"))
  }

  val eventsAsofJoinSql: String =
    """WITH clicks AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
      |    MAX(event_id) AS event_id
      |  FROM events WHERE event_type = 'click' GROUP BY 1, 2)
      |SELECT p.event_id AS purchase_id, p.user_id,
      |  CAST(p.ts AS TIMESTAMP) AS purchase_ts,
      |  c.event_id AS asof_click_id
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN clicks c
      |  ON p.user_id = c.user_id
      |  AND CAST(p.ts AS TIMESTAMP) >= c.ts""".stripMargin

  /** Range join: events against derived hour-of-day activity bands
    * (non-equi `BETWEEN` condition). The band table is tiny, so Spark
    * correctly picks BroadcastNestedLoopJoin — the right plan for a
    * small range dimension. When BOTH sides are large, the scale path
    * is bucketing the range into an equi-join (assign each row every
    * bucket its interval overlaps, join on bucket, re-filter) — the
    * sliding-window oracle in [[eventsSliding]] is exactly that trick.
    */
  def eventsRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bands = Seq(
      ("night", 0, 5), ("morning", 6, 11),
      ("afternoon", 12, 17), ("evening", 18, 23))
      .toDF("band", "h_lo", "h_hi")
    val ev = table(spark, dir, "events")
      .select(col("event_type"), hour(col("ts")).as("h"))
    ev.join(broadcast(bands),
        col("h") >= col("h_lo") && col("h") <= col("h_hi"))
      .groupBy(col("band"), col("event_type"))
      .agg(count(lit(1)).as("n"))
  }

  val eventsRangeJoinSql: String =
    """WITH bands(band, h_lo, h_hi) AS (VALUES
      |  ('night', 0, 5), ('morning', 6, 11),
      |  ('afternoon', 12, 17), ('evening', 18, 23)),
      |ev AS (SELECT event_type,
      |  CAST(EXTRACT(hour FROM CAST(ts AS TIMESTAMP)) AS INT) AS h
      |  FROM events)
      |SELECT band, event_type, COUNT(*) AS n
      |FROM ev JOIN bands ON h >= h_lo AND h <= h_hi
      |GROUP BY band, event_type""".stripMargin

  // ---------------------------------------------------- gap-fill
  /** Time-series resampling with gap-fill: hourly counts per event
    * type over a dense hour spine, missing buckets zero-filled — what
    * a monitoring/training-data freshness query needs (a bucket with
    * no rows must REPORT ZERO, not vanish). The spine is
    * `sequence(min_hour, max_hour)` exploded from a 1-row aggregate
    * and cross-joined with the distinct-type dimension: both sides are
    * tiny whatever the fact-table size (hours × types, not rows), so
    * Spark broadcasts them against the one real shuffle (the hourly
    * aggregation).
    */
  def eventsGapfill(spark: SparkSession, dir: String): DataFrame =
    gapfillFrame(table(spark, dir, "events"))

  /** The gap-fill core over any `(ts, event_type, value)` frame —
    * shared with the streaming twin's batch/stream agreement spec
    * (StreamGapfillSpec replays a timeline through both paths).
    */
  def gapfillFrame(e: DataFrame): DataFrame = {
    val hourly = e.groupBy(date_trunc("hour", col("ts")).as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
    val spine = e
      .agg(date_trunc("hour", min(col("ts"))).as("lo"),
        date_trunc("hour", max(col("ts"))).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"),
        expr("interval 1 hour"))).as("hour"))
    val types = e.select(col("event_type")).distinct()
    spine.crossJoin(types)
      .join(hourly, Seq("hour", "event_type"), "left_outer")
      .select(col("hour"), col("event_type"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
  }

  val eventsGapfillSql: String =
    s"""WITH hourly AS (
       |  SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS hour,
       |    event_type, COUNT(*) AS n, ${sqlDsum("value")} AS sum_value
       |  FROM events GROUP BY 1, 2),
       |span AS (
       |  SELECT time_bucket(INTERVAL '1 hour', CAST(MIN(ts) AS TIMESTAMP)) AS lo,
       |    time_bucket(INTERVAL '1 hour', CAST(MAX(ts) AS TIMESTAMP)) AS hi
       |  FROM events),
       |spine AS (
       |  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
       |  FROM span),
       |types AS (SELECT DISTINCT event_type FROM events)
       |SELECT s.hour, t.event_type,
       |  CAST(COALESCE(h.n, 0) AS BIGINT) AS n,
       |  COALESCE(h.sum_value, 0.0) AS sum_value
       |FROM spine s CROSS JOIN types t
       |LEFT JOIN hourly h ON h.hour = s.hour AND h.event_type = t.event_type""".stripMargin

  // ------------------------------------------------ SCD2 dimension
  /** Slowly-changing-dimension (type 2) build from the event log: each
    * user's activity segment (value tercile of the event) collapsed
    * into validity intervals — the lakehouse dimension-maintenance
    * operator (one history row per contiguous segment run, with
    * `valid_to` = next run's start and NULL marking the current row).
    * Gaps-and-islands via two ROW_NUMBERs (their difference is
    * constant within a run); both windows partition by user_id, so at
    * 100 TB this is one shuffle on the user key and no global sort.
    * Runs are ordered by first_rn — the first member's global
    * (ts, event_id) row number — which is unique per run and
    * temporally monotone even when two runs share a start timestamp.
    * Bound: row_number is 32-bit in Spark, capping a SINGLE user's
    * history at 2^31 events (per-key, not corpus-wide — ample).
    */
  def eventsScd2(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val seg = when(col("value") < 10, "low")
      .when(col("value") < 100, "mid").otherwise("high")
    val byTime = w.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val bySeg = w.partitionBy(col("user_id"), col("seg"))
      .orderBy(col("ts"), col("event_id"))
    // first_rn — the run's first event's global (ts, event_id) row
    // number — is unique per run AND temporally monotone, so it orders
    // runs correctly even when two runs of a user share a valid_from
    // timestamp (min(event_id) would not: a later run can contain a
    // smaller id)
    val runs = table(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), seg.as("seg"))
      .withColumn("rn", row_number().over(byTime))
      .withColumn("grp", col("rn") - row_number().over(bySeg))
      .groupBy(col("user_id"), col("seg"), col("grp"))
      .agg(min(col("ts")).as("valid_from"),
        min(col("rn")).cast("long").as("first_rn"),
        count(lit(1)).as("n_events"))
    val byStart = w.partitionBy(col("user_id")).orderBy(col("first_rn"))
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byStart))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col("user_id"), col("seg"), col("valid_from"),
        col("valid_to"), col("first_rn"), col("n_events"),
        col("is_current"))
      .orderBy(col("user_id"), col("first_rn"))
  }

  val eventsScd2Sql: String =
    """WITH marked AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN value < 10 THEN 'low'
      |         WHEN value < 100 THEN 'mid' ELSE 'high' END AS seg
      |  FROM events),
      |grps AS (
      |  SELECT user_id, ts, event_id, seg,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |                       ORDER BY ts, event_id) AS rn,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |    - ROW_NUMBER() OVER (PARTITION BY user_id, seg
      |                         ORDER BY ts, event_id) AS grp
      |  FROM marked),
      |runs AS (
      |  SELECT user_id, seg, grp, MIN(ts) AS valid_from,
      |    CAST(MIN(rn) AS BIGINT) AS first_rn,
      |    CAST(COUNT(*) AS BIGINT) AS n_events
      |  FROM grps GROUP BY user_id, seg, grp)
      |SELECT user_id, seg, valid_from,
      |  LEAD(valid_from, 1) OVER (PARTITION BY user_id
      |    ORDER BY first_rn) AS valid_to,
      |  first_rn, n_events,
      |  LEAD(valid_from, 1) OVER (PARTITION BY user_id
      |    ORDER BY first_rn) IS NULL AS is_current
      |FROM runs
      |ORDER BY user_id, first_rn""".stripMargin

  // --------------------------------------------- point-in-time join
  /** Point-in-time (PIT) join — the feature-store anti-leakage
    * operation: each purchase event (the label row) joins the SCD2
    * dimension run that was valid AT ITS TIMESTAMP, never a later one
    * (training-serving skew comes precisely from joining "current"
    * dimension values onto historical facts). Composes the
    * [[eventsScd2]] build: runs tile each user's history, so every
    * fact lands in EXACTLY one run — proven by the bijectivity spec.
    *
    * Scale shape: both sides shuffle once on user_id; the interval
    * predicate evaluates inside the co-partitioned join, and per-user
    * run counts bound the within-key work (no global interval index
    * needed). `valid_from <= ts < valid_to` with a NULL-open current
    * row is the standard SCD2 lookup predicate.
    */
  def eventsPitJoin(spark: SparkSession, dir: String): DataFrame = {
    val dim = eventsScd2(spark, dir)
      .select(col("user_id").as("d_user"), col("seg"),
        col("valid_from"), col("valid_to"), col("first_rn"))
    val facts = table(spark, dir, "events")
      .where(col("event_type") === "purchase")
      .select(col("event_id").as("fact_id"), col("user_id"),
        col("ts").as("fact_ts"), col("value").as("fact_value"))
    facts.join(dim, col("user_id") === col("d_user") &&
        col("valid_from") <= col("fact_ts") &&
        (col("valid_to").isNull || col("fact_ts") < col("valid_to")))
      .select(col("fact_id"), col("user_id"), col("fact_ts"),
        col("fact_value"), col("seg").as("seg_at_fact"),
        col("first_rn").as("dim_run"))
      .orderBy(col("fact_id"))
  }

  val eventsPitJoinSql: String =
    s"""WITH marked AS (
       |  SELECT user_id, ts, event_id,
       |    CASE WHEN value < 10 THEN 'low'
       |         WHEN value < 100 THEN 'mid' ELSE 'high' END AS seg
       |  FROM events),
       |grps AS (
       |  SELECT user_id, ts, event_id, seg,
       |    ROW_NUMBER() OVER (PARTITION BY user_id
       |                       ORDER BY ts, event_id) AS rn,
       |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
       |    - ROW_NUMBER() OVER (PARTITION BY user_id, seg
       |                         ORDER BY ts, event_id) AS grp
       |  FROM marked),
       |runs AS (
       |  SELECT user_id, seg, grp, MIN(ts) AS valid_from,
       |    CAST(MIN(rn) AS BIGINT) AS first_rn
       |  FROM grps GROUP BY user_id, seg, grp),
       |dim AS (
       |  SELECT user_id AS d_user, seg, valid_from, first_rn,
       |    LEAD(valid_from, 1) OVER (PARTITION BY user_id
       |      ORDER BY first_rn) AS valid_to
       |  FROM runs),
       |facts AS (
       |  SELECT event_id AS fact_id, user_id, ts AS fact_ts,
       |    value AS fact_value
       |  FROM events WHERE event_type = 'purchase')
       |SELECT fact_id, user_id, fact_ts, fact_value,
       |  seg AS seg_at_fact, first_rn AS dim_run
       |FROM facts JOIN dim ON user_id = d_user
       |  AND valid_from <= fact_ts
       |  AND (valid_to IS NULL OR fact_ts < valid_to)
       |ORDER BY fact_id""".stripMargin

  // --------------------------------------- forecast backtest (MAPE)
  /** Seasonal-naive forecast backtest: each day's volume is predicted
    * as the truncated mean of all PRIOR same-weekday volumes, and the
    * absolute percentage error ships per day in exact ppm — the
    * walk-forward baseline every forecasting system is benchmarked
    * against (and the honest way to report a forecaster: backtested,
    * never in-sample).
    *
    * The prior-mean is a window over the per-day series partitioned
    * by weekday — metadata-sized, exact integers (`tsum div tcnt`
    * truncation identical in both engines). Days with no prior
    * same-weekday observation are excluded rather than predicted
    * from nothing.
    */
  def eventsForecast(spark: SparkSession, dir: String): DataFrame = {
    val daily = table(spark, dir, "events")
      .groupBy(epochDay(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .withColumn("dow", col("day") % 7)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("dow")).orderBy(col("day"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    daily
      .withColumn("tsum", sum(col("n")).over(w))
      .withColumn("tcnt", count(col("n")).over(w))
      .where(col("tcnt") >= 1)
      .withColumn("fcst", expr("tsum div tcnt"))
      .select(col("day"), col("n"), col("fcst"),
        ppm(abs(col("n") - col("fcst")), col("n")).as("ape_ppm"))
      .orderBy(col("day"))
  }

  val eventsForecastSql: String =
    s"""WITH daily AS (
       |  SELECT ${sqlEpochDay("ts")} AS day, COUNT(*) AS n
       |  FROM events GROUP BY 1),
       |t AS (
       |  SELECT day, n,
       |    SUM(n) OVER (PARTITION BY day % 7 ORDER BY day
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS tsum,
       |    COUNT(n) OVER (PARTITION BY day % 7 ORDER BY day
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS tcnt
       |  FROM daily)
       |SELECT day, n,
       |  CAST(tsum AS BIGINT) // tcnt AS fcst,
       |  ${sqlPpm("abs(n - CAST(tsum AS BIGINT) // tcnt)", "n")} AS ape_ppm
       |FROM t WHERE tcnt >= 1 ORDER BY day""".stripMargin

  // ------------------------------------- Holt trend forecasting
  /** Holt's linear (double-exponential) smoothing over daily volume —
    * the trend-aware forecaster [[eventsForecast]]'s seasonal-naive
    * baseline cannot be: level and trend update per day
    * (`l = α·n + (1−α)(l+b)`, `b = β·Δl + (1−β)b`, α=¼ β=⅛) and the
    * one-step-ahead forecast is `l+b` — a ramping or decaying series
    * is tracked instead of lagged. All arithmetic is fixed-point ×16
    * integer with TRUNCATING division on both sides: DuckDB's `//`
    * truncates toward zero on negatives (−7//2 = −3, verified — it is
    * NOT floor division), and Scala's `Long./` truncates identically,
    * so the parity holds exactly where the trend goes NEGATIVE, the
    * case a trend model exists for (a floorDiv driver fold diverged
    * by 1 the first time Δl went negative — caught by the oracle
    * gate). Missing days decay through zero-volume
    * steps; APE ships per day with a −1 sentinel on zero-volume days
    * rather than a division blow-up.
    *
    * Scale shape: the [[eventsEwma]] argument verbatim — one
    * partial-aggregating day collapse, then the inherently sequential
    * recurrence folds over the metadata-sized dense spine on the
    * driver; the oracle replays it as a `WITH RECURSIVE` twin.
    */
  def eventsForecastHolt(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = table(spark, dir, "events")
      .select(epochDay(col("ts")).as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    if (daily.isEmpty)
      spark.emptyDataset[(Long, Long, Long, Long)]
        .toDF("day", "n", "fcst", "ape_ppm")
    else {
      val d0 = daily.keys.min
      val d1 = daily.keys.max
      val out = Vector.newBuilder[(Long, Long, Long, Long)]
      var l = daily(d0) * 16 // level fp16; trend starts flat
      var b = 0L
      (d0 + 1 to d1).foreach { day =>
        val n = daily.getOrElse(day, 0L)
        val fcst = (l + b) / 16
        val ape = if (n > 0)
          math.floor(1e6 * math.abs(n - fcst).toDouble / n.toDouble).toLong
        else -1L
        out += ((day, n, fcst, ape))
        val lNew = (n * 16 + 3 * (l + b)) / 4
        b = ((lNew - l) + 7 * b) / 8
        l = lNew
      }
      out.result().toDF("day", "n", "fcst", "ape_ppm")
    }
  }

  val eventsForecastHoltSql: String =
    s"""WITH RECURSIVE
       |daily AS (
       |  SELECT ${sqlEpochDay("ts")} AS day, COUNT(*) AS n
       |  FROM events GROUP BY 1),
       |bounds AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily),
       |holt(day, n, l, b) AS (
       |  SELECT d.day, d.n, d.n * 16, CAST(0 AS BIGINT)
       |  FROM daily d JOIN bounds bo ON d.day = bo.d0
       |  UNION ALL
       |  SELECT e.day + 1, COALESCE(d.n, 0),
       |    (COALESCE(d.n, 0) * 16 + 3 * (e.l + e.b)) // 4,
       |    (((COALESCE(d.n, 0) * 16 + 3 * (e.l + e.b)) // 4 - e.l)
       |      + 7 * e.b) // 8
       |  FROM holt e
       |  CROSS JOIN bounds bo
       |  LEFT JOIN daily d ON d.day = e.day + 1
       |  WHERE e.day < bo.d1),
       |fc AS (
       |  SELECT day, n,
       |    (lag(l) OVER (ORDER BY day) + lag(b) OVER (ORDER BY day)) // 16
       |      AS fcst
       |  FROM holt)
       |SELECT day, CAST(n AS BIGINT) AS n, CAST(fcst AS BIGINT) AS fcst,
       |  CASE WHEN n > 0 THEN ${sqlPpm("abs(n - fcst)", "n")}
       |    ELSE -1 END AS ape_ppm
       |FROM fc WHERE fcst IS NOT NULL ORDER BY day""".stripMargin

  // -------------------------------------------- DAU/WAU stickiness
  /** DAU / trailing-7-day WAU / stickiness — the daily-active product
    * metric. Rolling DISTINCT counts cannot come from a window sum
    * (users overlap between days), so each (day, user) activity pair
    * is exploded to the 7 trailing report days it supports and
    * re-distinct-counted — the standard distributed rolling-distinct
    * shape: one corpus-size shuffle for the (day, user) dedup, a
    * bounded 7× expansion of that already-reduced pair set, and one
    * (day, user) count-distinct per report day. Only days with a full
    * 7-day lookback are reported (no partial-window lies).
    */
  def eventsDauWau(spark: SparkSession, dir: String): DataFrame = {
    val ad = table(spark, dir, "events")
      .select(epochDay(col("ts")).as("day"),
        col("user_id"))
      .distinct()
      .cache() // feeds DAU, the WAU expansion, and the day bounds
    val dau = ad.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val wau = ad
      .select(explode(sequence(col("day"), col("day") + 6))
        .as("report_day"), col("user_id"))
      .groupBy(col("report_day"))
      .agg(countDistinct(col("user_id")).as("wau"))
    val bounds = ad.agg(min(col("day")).as("dmin"), max(col("day")).as("dmax"))
    dau.join(wau, col("day") === col("report_day"))
      .crossJoin(broadcast(bounds))
      .where(col("day") >= col("dmin") + 6 && col("day") <= col("dmax"))
      .select(col("day"), col("dau"), col("wau"),
        ppm(col("dau"), col("wau")).as("stickiness_ppm"))
      .orderBy(col("day"))
  }

  val eventsDauWauSql: String =
    s"""WITH ad AS (
       |  SELECT DISTINCT ${sqlEpochDay("ts")} AS day, user_id
       |  FROM events),
       |dau AS (SELECT day, COUNT(*) AS dau FROM ad GROUP BY 1),
       |wau AS (
       |  SELECT day + k.k AS report_day, COUNT(DISTINCT user_id) AS wau
       |  FROM ad, LATERAL (SELECT unnest(generate_series(0, 6)) AS k) k
       |  GROUP BY 1),
       |bounds AS (SELECT MIN(day) AS dmin, MAX(day) AS dmax FROM ad)
       |SELECT day, dau, wau,
       |  ${sqlPpm("dau", "wau")} AS stickiness_ppm
       |FROM dau JOIN wau ON day = report_day, bounds
       |WHERE day >= dmin + 6 AND day <= dmax
       |ORDER BY day""".stripMargin

  // ------------------------------------------- A/B test readout
  /** A/B experiment readout: users are deterministically bucketed by
    * md5-hash parity (the stable assignment every experimentation
    * platform uses — engine-reproducible, uniform, independent of
    * arrival order), conversion = any purchase, and the readout ships
    * rates in exact ppm plus the two-proportion pooled z statistic
    * (×1000) — the significance number an experimenter actually reads.
    *
    * Determinism: counts are exact longs; the z formula is IEEE
    * arithmetic on identical integer operands in both engines (one
    * divide chain + one sqrt — no libm beyond sqrt, which is
    * correctly-rounded by IEEE 754). Scale: one shuffle on user_id,
    * then a single 1-row conditional aggregate.
    */
  def eventsAbtest(spark: SparkSession, dir: String): DataFrame = {
    // conversion = a purchase of at least 100 — thresholded so both
    // outcomes occur at every SF (an all-convert cohort would zero the
    // pooled variance; the guard below also handles that degenerate
    // case explicitly rather than dividing by zero under ANSI mode)
    val users = table(spark, dir, "events")
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase" &&
        col("value") >= 100, 1L).otherwise(0L)).as("converted"))
      .withColumn("variant",
        graft.functions.CrossHash.md5Long(col("user_id").cast("string")) % 2)
    val d = (c: Column) => c.cast("double")
    val p = d(col("conv_a") + col("conv_b")) / d(col("n_a") + col("n_b"))
    val se = sqrt(p * (lit(1.0) - p) *
      (lit(1.0) / d(col("n_a")) + lit(1.0) / d(col("n_b"))))
    users.agg(
      count(when(col("variant") === 0, 1)).as("n_a"),
      sum(when(col("variant") === 0, col("converted")).otherwise(0L))
        .as("conv_a"),
      count(when(col("variant") === 1, 1)).as("n_b"),
      sum(when(col("variant") === 1, col("converted")).otherwise(0L))
        .as("conv_b"))
      .select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
        // empty-variant guard, same reason as the z guard below
        when(col("n_a") > 0, ppm(col("conv_a"), col("n_a")))
          .otherwise(0L).as("rate_a_ppm"),
        when(col("n_b") > 0, ppm(col("conv_b"), col("n_b")))
          .otherwise(0L).as("rate_b_ppm"),
        when(col("n_a") > 0 && col("n_b") > 0 && se > 0,
          floor(lit(1000.0) *
            (d(col("conv_a")) / d(col("n_a")) -
              d(col("conv_b")) / d(col("n_b"))) / se)
            .cast("long")).otherwise(0L).as("z_milli"))
  }

  val eventsAbtestSql: String = {
    import graft.functions.CrossHash.sqlMd5Long
    val p = "(CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))"
    val se = s"sqrt($p * (1.0 - $p) * " +
      "(1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))"
    s"""WITH u AS (
       |  SELECT user_id,
       |    MAX(CASE WHEN event_type = 'purchase' AND value >= 100
       |      THEN 1 ELSE 0 END) AS converted
       |  FROM events GROUP BY 1),
       |v AS (
       |  SELECT ${sqlMd5Long("CAST(user_id AS VARCHAR)")} % 2 AS variant,
       |    converted
       |  FROM u),
       |agg AS (
       |  SELECT
       |    COUNT(CASE WHEN variant = 0 THEN 1 END) AS n_a,
       |    CAST(SUM(CASE WHEN variant = 0 THEN converted ELSE 0 END)
       |      AS BIGINT) AS conv_a,
       |    COUNT(CASE WHEN variant = 1 THEN 1 END) AS n_b,
       |    CAST(SUM(CASE WHEN variant = 1 THEN converted ELSE 0 END)
       |      AS BIGINT) AS conv_b
       |  FROM v)
       |SELECT n_a, conv_a, n_b, conv_b,
       |  CASE WHEN n_a > 0 THEN ${sqlPpm("conv_a", "n_a")}
       |    ELSE 0 END AS rate_a_ppm,
       |  CASE WHEN n_b > 0 THEN ${sqlPpm("conv_b", "n_b")}
       |    ELSE 0 END AS rate_b_ppm,
       |  CASE WHEN n_a > 0 AND n_b > 0 AND $se > 0
       |    THEN CAST(floor(1000.0 *
       |    (CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
       |      - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
       |    / $se) AS BIGINT) ELSE 0 END AS z_milli
       |FROM agg""".stripMargin
  }

  // ----------------------------------- ordered multi-step funnel
  /** Strict-order 3-step funnel (signup → click → purchase): each
    * later step must happen AFTER the user's earliest completion of
    * the previous step — the product-analytics funnel, not just
    * co-occurrence (a click before signup does not count).
    *
    * Three chained conditional-min aggregates, each one shuffle on
    * user_id against the co-partitioned join of the previous step's
    * timestamps (AQE coalesces; no window over raw events needed).
    * Emits per-step user counts and step-to-step conversion in ppm.
    */
  def eventsFunnel3(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
      .select(col("user_id"), col("event_type"),
        unix_timestamp(col("ts")).as("s"), col("event_id"))
    val s1 = ev.groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "signup", col("s"))).as("t1"))
    val s2 = ev.join(s1, "user_id")
      .groupBy(col("user_id"))
      .agg(first(col("t1")).as("t1"),
        min(when(col("event_type") === "click" && col("t1").isNotNull &&
          col("s") > col("t1"), col("s"))).as("t2"))
    val s3 = ev.join(s2, "user_id")
      .groupBy(col("user_id"))
      .agg(first(col("t1")).as("t1"), first(col("t2")).as("t2"),
        min(when(col("event_type") === "purchase" && col("t2").isNotNull &&
          col("s") > col("t2"), col("s"))).as("t3"))
    s3.agg(
      count(when(col("t1").isNotNull, 1)).as("n_signup"),
      count(when(col("t2").isNotNull, 1)).as("n_clicked"),
      count(when(col("t3").isNotNull, 1)).as("n_purchased"))
      .select(col("n_signup"), col("n_clicked"), col("n_purchased"),
        // guard empty steps: 0/0 would floor(NaN) and throw under
        // ANSI; an empty funnel stage reads as 0 conversion
        when(col("n_signup") > 0,
          ppm(col("n_clicked"), col("n_signup"))).otherwise(0L)
          .as("step2_ppm"),
        when(col("n_clicked") > 0,
          ppm(col("n_purchased"), col("n_clicked"))).otherwise(0L)
          .as("step3_ppm"))
  }

  val eventsFunnel3Sql: String =
    s"""WITH ev AS (
       |  SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS s
       |  FROM events),
       |s1 AS (
       |  SELECT user_id,
       |    MIN(CASE WHEN event_type = 'signup' THEN s END) AS t1
       |  FROM ev GROUP BY 1),
       |s2 AS (
       |  SELECT ev.user_id, ANY_VALUE(t1) AS t1,
       |    MIN(CASE WHEN event_type = 'click' AND t1 IS NOT NULL
       |      AND s > t1 THEN s END) AS t2
       |  FROM ev JOIN s1 ON ev.user_id = s1.user_id GROUP BY 1),
       |s3 AS (
       |  SELECT ev.user_id, ANY_VALUE(t1) AS t1, ANY_VALUE(t2) AS t2,
       |    MIN(CASE WHEN event_type = 'purchase' AND t2 IS NOT NULL
       |      AND s > t2 THEN s END) AS t3
       |  FROM ev JOIN s2 ON ev.user_id = s2.user_id GROUP BY 1)
       |SELECT
       |  COUNT(CASE WHEN t1 IS NOT NULL THEN 1 END) AS n_signup,
       |  COUNT(CASE WHEN t2 IS NOT NULL THEN 1 END) AS n_clicked,
       |  COUNT(CASE WHEN t3 IS NOT NULL THEN 1 END) AS n_purchased,
       |  CASE WHEN COUNT(CASE WHEN t1 IS NOT NULL THEN 1 END) > 0
       |    THEN ${sqlPpm("COUNT(CASE WHEN t2 IS NOT NULL THEN 1 END)",
      "COUNT(CASE WHEN t1 IS NOT NULL THEN 1 END)")}
       |    ELSE 0 END AS step2_ppm,
       |  CASE WHEN COUNT(CASE WHEN t2 IS NOT NULL THEN 1 END) > 0
       |    THEN ${sqlPpm("COUNT(CASE WHEN t3 IS NOT NULL THEN 1 END)",
      "COUNT(CASE WHEN t2 IS NOT NULL THEN 1 END)")}
       |    ELSE 0 END AS step3_ppm
       |FROM s3""".stripMargin

  // ----------------------------------------- EWMA (prefix recurrence)
  /** Exponentially-weighted moving average of daily event volume —
    * the one aggregation family window functions cannot express: the
    * multiplicative carry `s_d = (s_{d-1}·7)/8 + n_d·8` makes every
    * output depend on the whole prefix, not a frame, and the
    * truncating integer division defeats any closed form.
    *
    * Fixed-point ×8 integer arithmetic: `div` truncation is identical
    * in both engines over the nonnegative operands here, so the
    * smoothed series is exact — no float accumulation order to
    * diverge. Missing days decay through a zero-volume step rather
    * than stalling the walk.
    *
    * Scale shape: the fact table collapses to the per-day aggregate
    * first (one shuffle, map-side combine) — after that the series is
    * ONE ROW PER DAY, metadata by construction (a decade is 3650
    * rows), and the inherently SEQUENTIAL fold runs on the driver —
    * the same bounded-collect argument as [[EmbeddingQueries]]'s
    * power iteration over its 64×64 Gramian. Earlier rounds ran the
    * fold as a stride-packed `WITH RECURSIVE` (UnionLoop); correct,
    * but every CTE edge is a scheduler round-trip, and at 64-day
    * packing the recursion machinery still cost ~2 s against the
    * driver fold's microseconds. The recursive formulation survives
    * as the DuckDB oracle twin below, and Spark's recursive-CTE
    * envelope stays pinned by RecursiveCteProbeSpec. The production
    * path for continuous series is the incremental
    * [[graft.streaming.StreamEwma]] twin, which pays per new hour,
    * not per history replay.
    */
  def eventsEwma(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = table(spark, dir, "events")
      .select(epochDay(col("ts")).as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    if (daily.isEmpty)
      spark.emptyDataset[(Long, Long, Long, Long)]
        .toDF("day", "n", "ewma_fp8", "ewma")
    else {
      val d0 = daily.keys.min
      val d1 = daily.keys.max
      val out = Vector.newBuilder[(Long, Long, Long, Long)]
      var s = daily(d0) * 8
      out += ((d0, daily(d0), s, s / 8))
      (d0 + 1 to d1).foreach { day =>
        val n = daily.getOrElse(day, 0L)
        s = (s * 7) / 8 + n * 8 // nonneg: Long / == SQL div == DuckDB //
        out += ((day, n, s, s / 8))
      }
      out.result().toDF("day", "n", "ewma_fp8", "ewma")
    }
  }

  val eventsEwmaSql: String =
    s"""WITH RECURSIVE
      |daily AS (
      |  SELECT ${sqlEpochDay("ts")} AS day, COUNT(*) AS n
      |  FROM events GROUP BY 1),
      |bounds AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily),
      |ewma(day, n, s) AS (
      |  SELECT d.day, d.n, d.n * 8 AS s
      |  FROM daily d JOIN bounds b ON d.day = b.d0
      |  UNION ALL
      |  SELECT e.day + 1, COALESCE(d.n, 0),
      |    (e.s * 7) // 8 + COALESCE(d.n, 0) * 8
      |  FROM ewma e
      |  CROSS JOIN bounds b
      |  LEFT JOIN daily d ON d.day = e.day + 1
      |  WHERE e.day < b.d1)
      |SELECT day, CAST(n AS BIGINT) AS n, CAST(s AS BIGINT) AS ewma_fp8,
      |  CAST(s // 8 AS BIGINT) AS ewma
      |FROM ewma ORDER BY day""".stripMargin

  // ------------------------------------- last-touch attribution
  /** Last-touch marketing attribution: each purchase is credited to
    * the user's most recent click or view within a 7-day lookback —
    * whichever touched LAST — or to "direct" when neither did. The
    * revenue-attribution primitive behind every channel report, and a
    * per-event as-of lookup expressed as running window maxima (no
    * self-join): `max(when(type=click, ts))` over earlier rows IS the
    * as-of predecessor of each purchase.
    *
    * Scale shape: one shuffle on user_id for the two running maxima,
    * then a channel-sized aggregate. Epoch-seconds arithmetic keeps
    * the lookback compare exact; all sums are fsum-floored.
    */
  val LookbackS = 604800L // 7 days

  def eventsAttribution(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("s"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    val within = (t: Column) =>
      t.isNotNull && (col("s") - t) <= LookbackS
    val touched = table(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), unix_timestamp(col("ts")).as("s"))
      .withColumn("last_click",
        max(when(col("event_type") === "click", col("s"))).over(w))
      .withColumn("last_view",
        max(when(col("event_type") === "view", col("s"))).over(w))
    touched
      .where(col("event_type") === "purchase")
      .withColumn("channel",
        when(within(col("last_click")) &&
          (col("last_view").isNull || col("last_click") >= col("last_view")),
          "click")
          .when(within(col("last_view")), "view")
          .otherwise("direct"))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_purchases"),
        fsum(col("value")).as("attributed_value"))
  }

  val eventsAttributionSql: String =
    s"""WITH t AS (
       |  SELECT user_id, event_id, event_type, value,
       |    CAST(floor(epoch(ts)) AS BIGINT) AS s, ts
       |  FROM events),
       |touched AS (
       |  SELECT *,
       |    MAX(CASE WHEN event_type = 'click' THEN s END)
       |      OVER (PARTITION BY user_id ORDER BY s, event_id
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |      AS last_click,
       |    MAX(CASE WHEN event_type = 'view' THEN s END)
       |      OVER (PARTITION BY user_id ORDER BY s, event_id
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |      AS last_view
       |  FROM t)
       |SELECT CASE
       |    WHEN last_click IS NOT NULL AND s - last_click <= $LookbackS
       |      AND (last_view IS NULL OR last_click >= last_view)
       |    THEN 'click'
       |    WHEN last_view IS NOT NULL AND s - last_view <= $LookbackS
       |    THEN 'view'
       |    ELSE 'direct' END AS channel,
       |  COUNT(*) AS n_purchases,
       |  ${sqlFsum("value")} AS attributed_value
       |FROM touched
       |WHERE event_type = 'purchase'
       |GROUP BY 1""".stripMargin

  // ------------------------------------- multi-touch attribution
  /** Multi-touch attribution — the two standard credit splits beside
    * [[eventsAttribution]]'s last-touch: LINEAR (every click/view in
    * the 7-day lookback shares the purchase equally) and
    * POSITION-BASED / U-shaped (40% first touch, 40% last touch, the
    * remaining 20% split over the middles; 100%/50-50 for one/two
    * touches — the Google-Analytics rule). Purchases with no touch in
    * the lookback credit `direct` in full under both models, so each
    * model's total credit re-adds to total purchase value minus only
    * deterministic floor dust (spec-pinned).
    *
    * Exactness: purchase value fixes to milli-units once
    * (`floor(1000·v)`); the linear share is `pv div n`, the U-shape
    * weight table is integer permille with the middle share
    * `200 div (n−2)`, credits are `(pv·w) div 1000` — identical
    * truncating integer division in both engines, no float path.
    *
    * Scale shape: one equi-join on `user_id` pairs each purchase with
    * its lookback touches (candidate volume is per-user activity ×
    * lookback density — the retention-bounded quantity a marketing
    * warehouse carries), one window over the per-purchase touch group
    * for (n, rank), then a channel-sized rollup. A pathological
    * single user is an AQE-skew-split case, not a plan change.
    */
  def eventsAttributionMulti(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), unix_timestamp(col("ts")).as("s"))
    val p = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_eid"),
        col("s").as("p_s"),
        floor(col("value") * 1000).cast("long").as("pv"))
    val t = ev.where(col("event_type").isin("click", "view"))
      .select(col("user_id").as("t_uid"), col("event_id").as("t_eid"),
        col("event_type").as("channel"), col("s").as("t_s"))
    // strictly-earlier by the (s, event_id) tuple order the last-touch
    // window uses, within the lookback
    val touches = p.join(t,
      col("user_id") === col("t_uid") &&
        (col("t_s") < col("p_s") ||
          (col("t_s") === col("p_s") && col("t_eid") < col("p_eid"))) &&
        col("p_s") - col("t_s") <= LookbackS)
    val wP = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("p_eid"))
    val ranked = touches
      .withColumn("n", count(lit(1)).over(wP))
      .withColumn("rn",
        row_number().over(wP.orderBy(col("t_s"), col("t_eid"))))
      .withColumn("w", when(col("n") === 1, 1000L)
        .when(col("n") === 2, 500L)
        .otherwise(when(col("rn") === 1 || col("rn") === col("n"), 400L)
          .otherwise(expr("200 div (n - 2)"))))
      .select(col("channel"),
        expr("pv div n").as("linear_milli"),
        expr("(pv * w) div 1000").as("ushape_milli"))
    val direct = p.join(t,
        col("user_id") === col("t_uid") &&
          (col("t_s") < col("p_s") ||
            (col("t_s") === col("p_s") && col("t_eid") < col("p_eid"))) &&
          col("p_s") - col("t_s") <= LookbackS,
        "left_anti")
      .select(lit("direct").as("channel"), col("pv").as("linear_milli"),
        col("pv").as("ushape_milli"))
    ranked.unionByName(direct)
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_credits"),
        sum(col("linear_milli")).as("linear_milli"),
        sum(col("ushape_milli")).as("ushape_milli"))
  }

  val eventsAttributionMultiSql: String =
    s"""WITH ev AS (
       |  SELECT user_id, event_id, event_type, value,
       |    CAST(floor(epoch(ts)) AS BIGINT) AS s
       |  FROM events),
       |p AS (
       |  SELECT user_id, event_id AS p_eid, s AS p_s,
       |    CAST(floor(value * 1000) AS BIGINT) AS pv
       |  FROM ev WHERE event_type = 'purchase'),
       |t AS (
       |  SELECT user_id AS t_uid, event_id AS t_eid,
       |    event_type AS channel, s AS t_s
       |  FROM ev WHERE event_type IN ('click', 'view')),
       |touches AS (
       |  SELECT p.*, t.t_eid, t.channel, t.t_s
       |  FROM p JOIN t ON p.user_id = t.t_uid
       |    AND (t.t_s < p.p_s OR (t.t_s = p.p_s AND t.t_eid < p.p_eid))
       |    AND p.p_s - t.t_s <= $LookbackS),
       |ranked AS (
       |  SELECT channel, pv,
       |    COUNT(*) OVER (PARTITION BY user_id, p_eid) AS n,
       |    ROW_NUMBER() OVER (PARTITION BY user_id, p_eid
       |      ORDER BY t_s, t_eid) AS rn
       |  FROM touches),
       |credits AS (
       |  SELECT channel, pv // n AS linear_milli,
       |    (pv * (CASE WHEN n = 1 THEN 1000 WHEN n = 2 THEN 500
       |      WHEN rn = 1 OR rn = n THEN 400
       |      ELSE 200 // (n - 2) END)) // 1000 AS ushape_milli
       |  FROM ranked
       |  UNION ALL
       |  SELECT 'direct' AS channel, pv AS linear_milli,
       |    pv AS ushape_milli
       |  FROM p WHERE NOT EXISTS (
       |    SELECT 1 FROM t WHERE p.user_id = t.t_uid
       |      AND (t.t_s < p.p_s OR (t.t_s = p.p_s AND t.t_eid < p.p_eid))
       |      AND p.p_s - t.t_s <= $LookbackS))
       |SELECT channel, COUNT(*) AS n_credits,
       |  CAST(SUM(linear_milli) AS BIGINT) AS linear_milli,
       |  CAST(SUM(ushape_milli) AS BIGINT) AS ushape_milli
       |FROM credits GROUP BY channel""".stripMargin

  // ------------------------------------------- per-user burstiness
  /** Per-user activity + burstiness profile — the objective inputs a
    * bot/abuse filter thresholds over, without baking an arbitrary
    * cutoff into the engine: event count, active span, distinct type
    * count, and the FASTEST 10-event burst (minimum seconds covering
    * any 10 consecutive events; superhuman bursts are the classic
    * automation tell). Users with fewer than 10 events carry the
    * sentinel −1.
    *
    * Scale shape: one window shuffle on the user key serves the
    * 9-ahead lead, and the rollup is a partial-aggregatable per-user
    * fold (the distinct-type count expands to (user, type) pairs —
    * type vocabulary is enum-sized, so the expansion is a constant
    * factor). All integer seconds, deterministic (ts, event_id)
    * ordering.
    */
  def eventsBurstiness(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("s"), col("event_id"))
    table(spark, dir, "events")
      .select(col("user_id"), unix_timestamp(col("ts")).as("s"),
        col("event_id"), col("event_type"))
      .withColumn("s10", lead(col("s"), 9).over(w))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        (max(col("s")) - min(col("s"))).as("span_s"),
        countDistinct(col("event_type")).as("n_types"),
        coalesce(min(col("s10") - col("s")), lit(-1L)).as("min_burst10_s"))
  }

  val eventsBurstinessSql: String =
    """WITH e AS (
      |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS s,
      |    event_id, event_type
      |  FROM events),
      |l AS (
      |  SELECT user_id, s, event_type,
      |    LEAD(s, 9) OVER (PARTITION BY user_id ORDER BY s, event_id)
      |      AS s10
      |  FROM e)
      |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(MAX(s) - MIN(s) AS BIGINT) AS span_s,
      |  CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
      |  CAST(COALESCE(MIN(s10 - s), -1) AS BIGINT) AS min_burst10_s
      |FROM l GROUP BY user_id""".stripMargin

  // ------------------------------------------- top event trigrams
  /** Top-10 three-step event paths across all user journeys — the
    * depth-3 sibling of [[eventsTransitions]] (sequence mining lite:
    * "what do users actually do, in order"). Two `lead`s over the
    * same (user, time, id) order, a type-vocabulary-bounded count,
    * and a deterministic tie-broken top-10.
    *
    * Scale shape: ONE shuffle on the user key serves both leads (same
    * window), counts collapse to ≤|types|³ cells with map-side
    * combine, and the top-10 compiles to TakeOrderedAndProject — no
    * global sort of anything corpus-sized.
    */
  def eventsTopPaths(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    table(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("e1"))
      .withColumn("e2", lead(col("e1"), 1).over(w))
      .withColumn("e3", lead(col("e1"), 2).over(w))
      .where(col("e3").isNotNull)
      .groupBy(col("e1"), col("e2"), col("e3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("e1").asc, col("e2").asc, col("e3").asc)
      .limit(10)
  }

  val eventsTopPathsSql: String =
    """WITH seq AS (
      |  SELECT event_type AS e1,
      |    LEAD(event_type, 1) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS e2,
      |    LEAD(event_type, 2) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS e3
      |  FROM events)
      |SELECT e1, e2, e3, COUNT(*) AS n FROM seq
      |WHERE e3 IS NOT NULL GROUP BY 1, 2, 3
      |ORDER BY n DESC, e1 ASC, e2 ASC, e3 ASC LIMIT 10""".stripMargin

  // -------------------------------------- Markov transition matrix
  /** First-order transition matrix over per-user event sequences —
    * the sequence-modeling primitive behind next-action prediction
    * and journey analysis: for each (from, to) event-type pair, the
    * transition count and row-normalized probability in exact ppm.
    *
    * Scale shape: `lead` over (user_id, time) is one shuffle on the
    * user key; the transition counts collapse to |types|² cells with
    * map-side combine, and the row-total join is enum-sized. Linear
    * in the corpus, output bounded by the type vocabulary.
    */
  def eventsTransitions(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val trans = table(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .where(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = trans.groupBy(col("from_type"))
      .agg(sum(col("n")).as("n_from"))
    trans.join(totals, "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        ppm(col("n"), col("n_from")).as("p_ppm"))
  }

  /** Shared CTE body (`seq`, `trans`, `tot`) behind the transition
    * matrix — reused by [[eventsTransitionsSql]] and
    * [[eventsMarkovStationarySql]] so the two programs can never
    * derive different chains.
    */
  private val sqlTransCtes: String =
    s"""seq AS (
       |  SELECT event_type AS from_type,
       |    LEAD(event_type, 1) OVER (PARTITION BY user_id
       |      ORDER BY ts, event_id) AS to_type
       |  FROM events),
       |trans AS (
       |  SELECT from_type, to_type, COUNT(*) AS n FROM seq
       |  WHERE to_type IS NOT NULL GROUP BY 1, 2),
       |tot AS (
       |  SELECT from_type, CAST(SUM(n) AS BIGINT) AS n_from
       |  FROM trans GROUP BY 1)""".stripMargin

  val eventsTransitionsSql: String =
    s"""WITH $sqlTransCtes
       |SELECT t.from_type, t.to_type, t.n,
       |  ${sqlPpm("t.n", "tot.n_from")} AS p_ppm
       |FROM trans t JOIN tot ON t.from_type = tot.from_type""".stripMargin

  // --------------------------------------- stationary distribution
  /** Stationary distribution of the [[eventsTransitions]] chain by
    * power iteration — where a user's long-run attention settles if
    * behavior keeps following today's transition matrix, the number a
    * capacity planner or recommender prior wants beside the raw
    * matrix. [[MarkovRounds]] rounds of `π' = π·P` in exact integer
    * ppm (int64 sums, ONE floor-divide per entry per round), starting
    * uniform over the from-types; mass lost to floor dust and to
    * terminal types (to-types with no outgoing row) ships in-band as
    * `mass_ppm`, so the report is honest about both leaks instead of
    * silently renormalizing.
    *
    * Scale shape: the corpus collapses to the |types|² transition
    * matrix first ([[eventsTransitions]]'s one shuffle); the
    * iteration then runs on METADATA (a handful of event types) on
    * the driver — the [[eventsEwma]]/PCA bounded-collect argument —
    * and the oracle replays it as a GENERATED unrolled-CTE program
    * sharing [[MarkovRounds]].
    */
  val MarkovRounds = 8

  def eventsMarkovStationary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val p = eventsTransitions(spark, dir)
      .select(col("from_type"), col("to_type"), col("p_ppm"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val fromTypes = p.map(_._1).distinct.sorted
    if (fromTypes.isEmpty)
      spark.emptyDataset[(String, Long, Long)]
        .toDF("event_type", "pi_ppm", "mass_ppm")
    else {
      var pi: Map[String, Long] =
        fromTypes.map(_ -> 1000000L / fromTypes.length).toMap
      (1 to MarkovRounds).foreach { _ =>
        val next = scala.collection.mutable.Map[String, Long]()
        p.foreach { case (f, t, pp) =>
          if (pi.getOrElse(f, 0L) > 0 && fromTypes.contains(t))
            next(t) = next.getOrElse(t, 0L) + pi(f) * pp
        }
        pi = next.view.mapValues(_ / 1000000L).toMap
      }
      val mass = pi.values.sum
      fromTypes.toSeq.map(t => (t, pi.getOrElse(t, 0L), mass))
        .toDF("event_type", "pi_ppm", "mass_ppm")
    }
  }

  val eventsMarkovStationarySql: String = {
    val rounds = (1 to MarkovRounds).map { r =>
      s"""pi$r AS (
         |  SELECT p.to_type AS t,
         |    CAST(SUM(pi.pi * p.p_ppm) // 1000000 AS BIGINT) AS pi
         |  FROM pi${r - 1} pi
         |  JOIN tp p ON pi.t = p.from_type
         |  JOIN ft f ON p.to_type = f.t
         |  WHERE pi.pi > 0
         |  GROUP BY p.to_type)""".stripMargin
    }.mkString(",\n")
    s"""WITH $sqlTransCtes,
       |tp AS (
       |  SELECT t.from_type, t.to_type,
       |    ${sqlPpm("t.n", "tot.n_from")} AS p_ppm
       |  FROM trans t JOIN tot ON t.from_type = tot.from_type),
       |ft AS (SELECT DISTINCT from_type AS t FROM trans),
       |pi0 AS (
       |  SELECT t, CAST(1000000 // (SELECT COUNT(*) FROM ft) AS BIGINT)
       |    AS pi
       |  FROM ft),
       |$rounds,
       |mass AS (SELECT CAST(COALESCE(SUM(pi), 0) AS BIGINT) AS m
       |  FROM pi$MarkovRounds)
       |SELECT f.t AS event_type,
       |  CAST(COALESCE(p.pi, 0) AS BIGINT) AS pi_ppm,
       |  mass.m AS mass_ppm
       |FROM ft f LEFT JOIN pi$MarkovRounds p ON f.t = p.t, mass""".stripMargin
  }

  // ----------------------------------------- interval merge (coalesce)
  /** Overlapping-interval merge (temporal coalesce): each event opens
    * an availability window of `floor(value·60)` seconds; per user,
    * transitively overlapping windows collapse into maximal islands.
    * This is the interval analog of sessionization — sessions close on
    * a FIXED inactivity gap, islands close when the (variable-length)
    * coverage actually ends — and the primitive behind uptime/coverage
    * reporting and SCD row compaction.
    *
    * Classic two-window-pass algorithm: running max of interval end
    * over earlier rows detects breaks (`start > max end so far` ⇒ new
    * island), then a running sum of breaks numbers the islands. Both
    * windows partition by user_id — one shuffle on the user key, no
    * global sort at any scale; per-user history length bounds the
    * within-key work. All arithmetic in epoch seconds (exact longs;
    * `unix_timestamp` floors sub-second parts, the oracle's
    * `floor(epoch(ts))` twin matches bit-for-bit).
    */
  def eventsIntervalMerge(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val byTime = w.partitionBy(col("user_id"))
      .orderBy(col("s"), col("event_id"))
    val iv = table(spark, dir, "events")
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("s"),
        (unix_timestamp(col("ts")) +
          floor(col("value") * 60).cast("long")).as("e"))
    iv
      .withColumn("prev_max_e",
        max(col("e")).over(byTime.rowsBetween(w.unboundedPreceding, -1)))
      .withColumn("brk",
        when(col("prev_max_e").isNull || col("s") > col("prev_max_e"), 1L)
          .otherwise(0L))
      .withColumn("island", sum(col("brk")).over(
        byTime.rowsBetween(w.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("island"))
      .agg(min(col("s")).as("island_start_s"),
        max(col("e")).as("island_end_s"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("island_start_s"), col("island_end_s"),
        (col("island_end_s") - col("island_start_s")).as("covered_s"),
        col("n_events"))
  }

  val eventsIntervalMergeSql: String =
    """WITH iv AS (
      |  SELECT user_id, event_id,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS s,
      |    CAST(floor(epoch(ts)) AS BIGINT)
      |      + CAST(floor(value * 60) AS BIGINT) AS e
      |  FROM events),
      |marked AS (
      |  SELECT user_id, s, e,
      |    CASE WHEN MAX(e) OVER (PARTITION BY user_id ORDER BY s, event_id
      |                           ROWS BETWEEN UNBOUNDED PRECEDING
      |                           AND 1 PRECEDING) IS NULL
      |           OR s > MAX(e) OVER (PARTITION BY user_id ORDER BY s, event_id
      |                               ROWS BETWEEN UNBOUNDED PRECEDING
      |                               AND 1 PRECEDING)
      |         THEN 1 ELSE 0 END AS brk,
      |    event_id
      |  FROM iv),
      |isl AS (
      |  SELECT user_id, s, e,
      |    SUM(brk) OVER (PARTITION BY user_id ORDER BY s, event_id
      |                   ROWS UNBOUNDED PRECEDING) AS island
      |  FROM marked)
      |SELECT user_id, MIN(s) AS island_start_s, MAX(e) AS island_end_s,
      |  MAX(e) - MIN(s) AS covered_s, COUNT(*) AS n_events
      |FROM isl GROUP BY user_id, island""".stripMargin

  // ------------------------------------- CEP pattern matching (journeys)
  /** Complex-event-processing pattern match over per-user journeys —
    * the MATCH_RECOGNIZE shape (SQL:2016 row pattern recognition)
    * re-expressed as regex over the ordered event-type string: each
    * user's events sort by (ts, event_id) into a journey of type
    * initials (c/e/p/s/v — the five types have distinct initials),
    * and each business pattern is a regex counted non-overlapping
    * left-to-right — identical semantics in Java regex and DuckDB's
    * RE2 for these quantifier-only patterns (no backrefs, no empty
    * matches). Patterns: view→≤3 clicks→purchase (conversion with
    * bounded distraction), ≥2 consecutive errors then any activity
    * (retry-recovery), signup→browse*→purchase (activation funnel).
    *
    * Scale shape: ONE user-keyed aggregation builds journeys
    * (collect_list is per-user bounded — journeys are entity-bounded
    * by definition; a production stream windows them per day);
    * pattern counting is a per-row regex over the journey, the rollup
    * a |patterns|-sized aggregate. No corpus-sized sort, no second
    * shuffle.
    */
  val EventCepPatterns: Seq[(String, String)] = Seq(
    ("view_to_purchase", "vc{0,3}p"),
    ("error_retry_recovery", "e{2,}[cv]"),
    ("signup_funnel", "s[cv]*p"))

  /** Journey-length CAP: a pathological power user at 100 TB would
    * otherwise make one giant per-user string (the r12 caveat); the
    * journey keeps the LAST [[CepJourneyCap]] event initials —
    * bounded per-user state, the same trade the windowed variant
    * makes per day. `ord_base` (events dropped from the front) keeps
    * span ordinals ABSOLUTE, so [[eventsPatternMeasures]]'s
    * event-ordinal join stays aligned across truncation. No user
    * approaches the cap at the test SFs (oracle hashes unchanged);
    * the truncation behavior itself is pinned by Round13OpsSpec on a
    * constructed fixture.
    */
  val CepJourneyCap = 100000

  /** (user_id, journey, ord_base) over an events frame — factored so
    * the cap is spec-testable on constructed fixtures.
    */
  private[analytics] def journeysOf(ev: DataFrame): DataFrame = {
    val wU = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    ev.select(col("user_id"), col("ts"), col("event_id"),
        substring(col("event_type"), 1, 1).as("c"))
      .withColumn("rn", row_number().over(wU))
      .groupBy(col("user_id"))
      .agg(
        // collect_list drops nulls: only the newest CepJourneyCap
        // events enter the journey, in one aggregation pass
        array_join(transform(array_sort(collect_list(
          when(col("rn") <= lit(CepJourneyCap),
            struct(col("ts"), col("event_id"), col("c"))))),
          s => s.getField("c")), "").as("journey"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("journey"),
        (col("n_events") - length(col("journey"))).cast("long")
          .as("ord_base"))
  }

  def eventsPatternMatch(spark: SparkSession, dir: String): DataFrame = {
    val j = journeysOf(table(spark, dir, "events"))
    val perPattern = EventCepPatterns.map { case (name, pat) =>
      j.select(col("user_id"),
        lit(name).as("pattern_name"),
        regexp_count(col("journey"), lit(pat)).cast("long").as("n"))
    }.reduce(_ unionByName _)
    perPattern.groupBy(col("pattern_name"))
      .agg(sum(when(col("n") > 0, 1L).otherwise(0L)).as("users_matched"),
        sum(col("n")).as("n_matches_total"),
        max(col("n")).as("max_user_matches"))
  }

  val eventsPatternMatchSql: String = {
    val vals = EventCepPatterns
      .map { case (n, p) => s"('$n', '$p')" }.mkString(", ")
    s"""WITH j AS (
       |  SELECT user_id, string_agg(substr(event_type, 1, 1), ''
       |    ORDER BY ts, event_id) AS journey
       |  FROM events GROUP BY user_id),
       |m AS (
       |  SELECT j.user_id, p.name AS pattern_name,
       |    CAST(len(regexp_extract_all(j.journey, p.pat)) AS BIGINT) AS n
       |  FROM j, (VALUES $vals) p(name, pat))
       |SELECT pattern_name,
       |  CAST(SUM(CASE WHEN n > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS users_matched,
       |  CAST(SUM(n) AS BIGINT) AS n_matches_total,
       |  CAST(MAX(n) AS BIGINT) AS max_user_matches
       |FROM m GROUP BY pattern_name""".stripMargin
  }

  // --------------------------------------- CEP per-match span extraction
  /** MATCH_RECOGNIZE's per-match output — one row per pattern MATCH
    * (user, pattern, match ordinal, start/end event ordinal in the
    * user's time-ordered journey), where [[eventsPatternMatch]] only
    * tallies. Semantics are AFTER MATCH SKIP PAST LAST ROW: matches
    * are non-overlapping, scanned left to right — exactly the
    * `Matcher.find()` loop both regex engines implement.
    *
    * Span reconstruction: `regexp_extract_all` yields the matched
    * TEXTS in scan order but not positions, so positions are re-derived
    * by a cursor fold — match i starts at the FIRST occurrence of its
    * text at-or-after the previous match's end. That first occurrence
    * IS the match position: if the text occurred earlier (but past the
    * previous end), the scanner would have matched there instead —
    * so the fold is exact, not heuristic. Spark folds with the
    * `aggregate` HOF (per-row, no extra shuffle); the oracle twin walks
    * the same cursor with a recursive CTE. Patterns here never match
    * empty, so the cursor strictly advances.
    *
    * Scale shape: identical to [[eventsPatternMatch]] — one user-keyed
    * journey aggregation per pattern, then PER-ROW string work; output
    * is matches-sized (≤ journey length / min match length per user),
    * entity-bounded like the journey itself.
    */
  def eventsPatternSpans(spark: SparkSession, dir: String): DataFrame =
    spansOf(table(spark, dir, "events"))

  private[analytics] def spansOf(ev: DataFrame): DataFrame = {
    val j = journeysOf(ev)
    val perPattern = EventCepPatterns.map { case (name, pat) =>
      j.select(col("user_id"), lit(name).as("pattern_name"),
        col("journey"), col("ord_base"),
        regexp_extract_all(col("journey"), lit(pat), lit(0)).as("ms"))
    }.reduce(_ unionByName _)
    perPattern.where(size(col("ms")) > 0)
      .withColumn("spans", expr(
        """aggregate(ms,
          |  struct(CAST(array() AS ARRAY<STRUCT<s: INT, e: INT>>) AS sp,
          |         1 AS cur),
          |  (acc, m) -> struct(
          |    array_append(acc.sp, struct(
          |      locate(m, journey, acc.cur) AS s,
          |      locate(m, journey, acc.cur) + length(m) - 1 AS e)),
          |    locate(m, journey, acc.cur) + length(m) AS cur),
          |  acc -> acc.sp)""".stripMargin))
      .select(col("user_id"), col("pattern_name"), col("ord_base"),
        posexplode(col("spans")).as(Seq("i", "sp")))
      .select(col("user_id"), col("pattern_name"),
        (col("i") + 1).cast("long").as("match_ord"),
        // ord_base keeps ordinals ABSOLUTE across journey truncation
        (col("ord_base") + col("sp.s")).cast("long").as("start_ord"),
        (col("ord_base") + col("sp.e")).cast("long").as("end_ord"),
        (col("sp.e") - col("sp.s") + 1).cast("long").as("match_len"))
  }

  /** The recursive cursor-walk CTE chain (`j` → `jm` → `walk`) shared
    * by the spans and measures oracles — the walk is the span
    * semantics; keeping it in one string means the twins can't drift.
    * Callers prepend `WITH RECURSIVE`.
    */
  private lazy val sqlCepWalk: String = {
    val vals = EventCepPatterns
      .map { case (n, p) => s"('$n', '$p')" }.mkString(", ")
    s"""j AS (
       |  SELECT user_id, string_agg(substr(event_type, 1, 1), ''
       |    ORDER BY ts, event_id) AS journey
       |  FROM events GROUP BY user_id),
       |jm AS (
       |  SELECT j.user_id, p.name AS pattern_name, j.journey,
       |    regexp_extract_all(j.journey, p.pat) AS ms
       |  FROM j, (VALUES $vals) p(name, pat)
       |  WHERE len(regexp_extract_all(j.journey, p.pat)) > 0),
       |walk AS (
       |  SELECT user_id, pattern_name, journey, ms,
       |    CAST(0 AS BIGINT) AS ord, CAST(1 AS BIGINT) AS nxt,
       |    CAST(0 AS BIGINT) AS spos, CAST(0 AS BIGINT) AS epos
       |  FROM jm
       |  UNION ALL
       |  SELECT user_id, pattern_name, journey, ms, ord + 1,
       |    instr(substr(journey, CAST(nxt AS INT)), ms[CAST(ord AS INT) + 1])
       |      + nxt - 1 + len(ms[CAST(ord AS INT) + 1]),
       |    instr(substr(journey, CAST(nxt AS INT)), ms[CAST(ord AS INT) + 1])
       |      + nxt - 1,
       |    instr(substr(journey, CAST(nxt AS INT)), ms[CAST(ord AS INT) + 1])
       |      + nxt - 2 + len(ms[CAST(ord AS INT) + 1])
       |  FROM walk WHERE ord < len(ms))""".stripMargin
  }

  val eventsPatternSpansSql: String =
    s"""WITH RECURSIVE $sqlCepWalk
       |SELECT user_id, pattern_name, ord AS match_ord,
       |  spos AS start_ord, epos AS end_ord,
       |  epos - spos + 1 AS match_len
       |FROM walk WHERE ord >= 1""".stripMargin

  // ------------------------------------------- CEP per-match measures
  /** MATCH_RECOGNIZE's MEASURES clause over the span extraction: each
    * match row carries aggregates of the EVENTS inside the match —
    * first/last event time, duration, exact value sum, event count —
    * what a user acts on (alert enrichment, funnel revenue, recovery
    * latency) once the span tells them WHERE the match is.
    *
    * Shape: spans explode to their member ordinals and equi-join the
    * ordinal-numbered events on (user_id, ord) — a plain co-partitioned
    * join (no range predicate, no per-user quadratic frame); the
    * ordinal numbering is the same one user-keyed window the journey
    * aggregation already implies. Output is matches·match_len-bounded.
    */
  def eventsPatternMeasures(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val ev = table(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withColumn("ord", row_number().over(w).cast("long"))
      .select(col("user_id"), col("ord"),
        unix_timestamp(col("ts")).as("ts_s"), col("value"))
    val spans = eventsPatternSpans(spark, dir)
      .select(col("user_id"), col("pattern_name"), col("match_ord"),
        explode(sequence(col("start_ord"), col("end_ord"))).as("ord"))
    spans.join(ev, Seq("user_id", "ord"))
      .groupBy(col("user_id"), col("pattern_name"), col("match_ord"))
      .agg(min(col("ts_s")).as("start_ts_s"),
        max(col("ts_s")).as("end_ts_s"),
        dsum(col("value")).as("value_sum"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("pattern_name"), col("match_ord"),
        col("start_ts_s"), col("end_ts_s"),
        (col("end_ts_s") - col("start_ts_s")).as("duration_s"),
        col("value_sum"), col("n_events"))
  }

  val eventsPatternMeasuresSql: String =
    s"""WITH RECURSIVE $sqlCepWalk,
       |eo AS (
       |  SELECT user_id,
       |    CAST(row_number() OVER (PARTITION BY user_id
       |      ORDER BY ts, event_id) AS BIGINT) AS ord2,
       |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_s, value
       |  FROM events)
       |SELECT w.user_id, w.pattern_name, w.ord AS match_ord,
       |  MIN(e.ts_s) AS start_ts_s, MAX(e.ts_s) AS end_ts_s,
       |  MAX(e.ts_s) - MIN(e.ts_s) AS duration_s,
       |  ${sqlDsum("e.value")} AS value_sum,
       |  CAST(COUNT(*) AS BIGINT) AS n_events
       |FROM walk w JOIN eo e ON w.user_id = e.user_id
       |  AND e.ord2 BETWEEN w.spos AND w.epos
       |WHERE w.ord >= 1
       |GROUP BY 1, 2, 3""".stripMargin

  // ------------------------------------ CEP over WINDOWED journeys
  /** The production form of the journey CEP: journeys bounded per
    * (user, event-time day) instead of whole-history — the windowing
    * [[eventsPatternMatch]]'s scaladoc names as the mitigation for
    * entity-unbounded state (a streaming deployment would use the
    * same keying with a watermark; a match can no longer span a day
    * boundary, which is the deliberate trade). State per key is a
    * day's events, not a lifetime's; the rollup carries the day so
    * match rates are trendable.
    */
  def eventsPatternWindowed(spark: SparkSession, dir: String): DataFrame = {
    val j = table(spark, dir, "events")
      .groupBy(col("user_id"), epochDay(col("ts")).as("day"))
      .agg(array_join(transform(array_sort(collect_list(struct(
        col("ts"), col("event_id"),
        substring(col("event_type"), 1, 1).as("c")))),
        s => s.getField("c")), "").as("journey"))
    val perPattern = EventCepPatterns.map { case (name, pat) =>
      j.select(col("day"),
        lit(name).as("pattern_name"),
        regexp_count(col("journey"), lit(pat)).cast("long").as("n"))
    }.reduce(_ unionByName _)
    perPattern.groupBy(col("pattern_name"), col("day"))
      .agg(sum(when(col("n") > 0, 1L).otherwise(0L)).as("users_matched"),
        sum(col("n")).as("n_matches_total"))
      .where(col("n_matches_total") > 0)
  }

  val eventsPatternWindowedSql: String = {
    val vals = EventCepPatterns
      .map { case (n, p) => s"('$n', '$p')" }.mkString(", ")
    s"""WITH j AS (
       |  SELECT user_id, ${QueryUtil.sqlEpochDay("ts")} AS day,
       |    string_agg(substr(event_type, 1, 1), ''
       |      ORDER BY ts, event_id) AS journey
       |  FROM events GROUP BY 1, 2),
       |m AS (
       |  SELECT j.day, p.name AS pattern_name,
       |    CAST(len(regexp_extract_all(j.journey, p.pat)) AS BIGINT) AS n
       |  FROM j, (VALUES $vals) p(name, pat))
       |SELECT pattern_name, day,
       |  CAST(SUM(CASE WHEN n > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS users_matched,
       |  CAST(SUM(n) AS BIGINT) AS n_matches_total
       |FROM m GROUP BY pattern_name, day
       |HAVING SUM(n) > 0""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_pattern_windowed" -> (eventsPatternWindowed _),
    "events_pattern_spans" -> (eventsPatternSpans _),
    "events_pattern_measures" -> (eventsPatternMeasures _),
    "events_pattern_match" -> (eventsPatternMatch _),
    "events_dau_wau" -> (eventsDauWau _),
    "events_forecast" -> (eventsForecast _),
    "events_abtest" -> (eventsAbtest _),
    "events_funnel3" -> (eventsFunnel3 _),
    "events_ewma" -> (eventsEwma _),
    "events_attribution" -> (eventsAttribution _),
    "events_attribution_multi" -> (eventsAttributionMulti _),
    "events_markov_stationary" -> (eventsMarkovStationary _),
    "events_forecast_holt" -> (eventsForecastHolt _),
    "events_transitions" -> (eventsTransitions _),
    "events_top_paths" -> (eventsTopPaths _),
    "events_burstiness" -> (eventsBurstiness _),
    "events_interval_merge" -> (eventsIntervalMerge _),
    "events_pit_join" -> (eventsPitJoin _),
    "events_scd2" -> (eventsScd2 _),
    "events_gapfill" -> (eventsGapfill _),
    "events_unpivot" -> (eventsUnpivot _),
    "events_map_funcs" -> (eventsMapFuncs _),
    "events_tumbling" -> (eventsTumbling _),
    "events_sliding" -> (eventsSliding _),
    "events_session" -> (eventsSession _),
    "events_json" -> (eventsJson _),
    "events_pivot" -> (eventsPivot _),
    "events_funnel" -> (eventsFunnel _),
    "events_asof_join" -> (eventsAsofJoin _),
    "events_range_join" -> (eventsRangeJoin _))

  val oracles: Map[String, String] = Map(
    "events_pattern_match" -> eventsPatternMatchSql,
    "events_pattern_spans" -> eventsPatternSpansSql,
    "events_pattern_windowed" -> eventsPatternWindowedSql,
    "events_pattern_measures" -> eventsPatternMeasuresSql,
    "events_dau_wau" -> eventsDauWauSql,
    "events_forecast" -> eventsForecastSql,
    "events_abtest" -> eventsAbtestSql,
    "events_funnel3" -> eventsFunnel3Sql,
    "events_ewma" -> eventsEwmaSql,
    "events_attribution" -> eventsAttributionSql,
    "events_attribution_multi" -> eventsAttributionMultiSql,
    "events_markov_stationary" -> eventsMarkovStationarySql,
    "events_forecast_holt" -> eventsForecastHoltSql,
    "events_transitions" -> eventsTransitionsSql,
    "events_top_paths" -> eventsTopPathsSql,
    "events_burstiness" -> eventsBurstinessSql,
    "events_interval_merge" -> eventsIntervalMergeSql,
    "events_pit_join" -> eventsPitJoinSql,
    "events_scd2" -> eventsScd2Sql,
    "events_gapfill" -> eventsGapfillSql,
    "events_unpivot" -> eventsUnpivotSql,
    "events_map_funcs" -> eventsMapFuncsSql,
    "events_tumbling" -> eventsTumblingSql,
    "events_sliding" -> eventsSlidingSql,
    "events_session" -> eventsSessionSql,
    "events_json" -> eventsJsonSql,
    "events_pivot" -> eventsPivotSql,
    "events_funnel" -> eventsFunnelSql,
    "events_asof_join" -> eventsAsofJoinSql,
    "events_range_join" -> eventsRangeJoinSql)
}

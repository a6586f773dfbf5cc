package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import QueryUtil._

/** Scalar/collection function breadth — the expression-library surface
  * a reference user would expect from an analytics engine: array ops,
  * regexp extraction, null handling, conditionals. All codegen'd
  * built-ins over single scans (no shuffle beyond the final small
  * aggregate where present).
  */
object ScalarBreadthQueries {

  /** Array-function breadth over quantized embeddings: slice, reverse,
    * sort, element access, containment, position arithmetic.
    */
  def arrayFuncsEmbeddings(spark: SparkSession, dir: String): DataFrame = {
    val q = transform(col("embedding"),
      x => floor(x.cast("double") * 1024).cast("long"))
    table(spark, dir, "embeddings")
      .select(col("vec_id"), q.as("q"))
      .select(
        col("vec_id"),
        size(col("q")).cast("long").as("dim"),
        element_at(col("q"), 1).as("first_q"),
        element_at(col("q"), -1).as("last_q"),
        element_at(reverse(col("q")), 1).as("rev_first_q"),
        element_at(array_sort(col("q")), 1).as("min_q"),
        element_at(array_sort(col("q")), 64).as("max_q"),
        concat_ws(",", slice(col("q"), 1, 4)).as("head4_csv"),
        array_position(col("q"), element_at(array_sort(col("q")), 64))
          .cast("long").as("argmax_1based"),
        array_contains(col("q"), 0L).as("has_zero"))
  }

  val arrayFuncsSql: String =
    """WITH t AS (
      |  SELECT vec_id, list_transform(embedding,
      |    x -> CAST(floor(CAST(x AS DOUBLE) * 1024) AS BIGINT)) AS q
      |  FROM embeddings)
      |SELECT vec_id,
      |  CAST(len(q) AS BIGINT) AS dim,
      |  q[1] AS first_q,
      |  q[-1] AS last_q,
      |  list_reverse(q)[1] AS rev_first_q,
      |  list_sort(q)[1] AS min_q,
      |  list_sort(q)[64] AS max_q,
      |  array_to_string(q[1:4], ',') AS head4_csv,
      |  CAST(list_position(q, list_sort(q)[64]) AS BIGINT) AS argmax_1based,
      |  list_contains(q, 0) AS has_zero
      |FROM t""".stripMargin

  /** Regexp breadth over documents: group extraction, match filters,
    * global replacement length accounting.
    */
  def regexpDocs(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(col("doc_id"), col("text"),
        regexp_extract(col("text"), "^(\\w+) (\\w+)", 2).as("second_word"),
        col("text").rlike("merge .* spark").as("has_merge_then_spark"),
        length(regexp_replace(col("text"), "[aeiou]", "")).cast("long")
          .as("len_no_vowels"),
        size(regexp_extract_all(col("text"), lit("\\bspark\\b"), lit(0)))
          .cast("long").as("n_spark"))
      .drop("text")

  val regexpDocsSql: String =
    """SELECT doc_id,
      |  regexp_extract(text, '^(\w+) (\w+)', 2) AS second_word,
      |  regexp_matches(text, 'merge .* spark') AS has_merge_then_spark,
      |  CAST(length(regexp_replace(text, '[aeiou]', '', 'g')) AS BIGINT)
      |    AS len_no_vowels,
      |  CAST(len(regexp_extract_all(text, '\bspark\b')) AS BIGINT) AS n_spark
      |FROM documents""".stripMargin

  /** Null-handling breadth: nullif / coalesce / null-aware aggregation
    * over a derived nullable column.
    */
  def nullHandlingOrders(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .select(col("o_orderstatus"),
        nullif(col("o_orderstatus"), lit("O")).as("status_or_null"),
        when(col("o_totalprice") > 300000, col("o_totalprice")).as("big_price"))
      .groupBy(col("o_orderstatus"))
      .agg(
        count(col("status_or_null")).as("n_nonnull_status"),
        count(lit(1)).as("n_rows"),
        count(col("big_price")).as("n_big"),
        dsum(coalesce(col("big_price"), lit(0.0))).as("sum_big_or_zero"),
        max(coalesce(col("status_or_null"), lit("ZZZ"))).as("max_coalesced"))

  val nullHandlingSql: String =
    s"""SELECT o_orderstatus,
       |  COUNT(nullif(o_orderstatus, 'O')) AS n_nonnull_status,
       |  COUNT(*) AS n_rows,
       |  COUNT(CASE WHEN o_totalprice > 300000 THEN o_totalprice END) AS n_big,
       |  ${sqlDsum("COALESCE(CASE WHEN o_totalprice > 300000 THEN o_totalprice END, 0.0)")}
       |    AS sum_big_or_zero,
       |  MAX(COALESCE(nullif(o_orderstatus, 'O'), 'ZZZ')) AS max_coalesced
       |FROM orders GROUP BY o_orderstatus""".stripMargin

  /** Day-over-day retention: users active on day d who return on d+1 —
    * the self-join-on-time pattern (one shuffle on user_id+day).
    */
  def eventsRetention(spark: SparkSession, dir: String): DataFrame = {
    val days = table(spark, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val d0 = days.as("d0")
    val d1 = days.as("d1")
    d0.join(d1, col("d0.user_id") === col("d1.user_id") &&
        date_add(col("d0.day"), 1) === col("d1.day"))
      .groupBy(col("d0.day").cast("string").as("day"))
      .agg(countDistinct(col("d0.user_id")).as("retained_users"))
  }

  val eventsRetentionSql: String =
    """WITH days AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
      |SELECT strftime(d0.day, '%Y-%m-%d') AS day,
      |  COUNT(DISTINCT d0.user_id) AS retained_users
      |FROM days d0 JOIN days d1
      |  ON d0.user_id = d1.user_id AND d0.day + 1 = d1.day
      |GROUP BY 1""".stripMargin

  /** Datetime arithmetic breadth: day difference, month shifting,
    * truncation, epoch extraction, day-of-week — grouped to a small
    * result so the expressions, not the scan, are under test.
    */
  def dateArithOrders(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .select(
        date_trunc("month", col("o_orderdate")).as("month"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
          .cast("long").as("days_since_epoch_start"),
        add_months(col("o_orderdate"), 3).cast("date").as("plus3m"),
        dayofweek(col("o_orderdate")).cast("long").as("dow"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"))
      .groupBy(col("month"))
      .agg(count(lit(1)).as("n"),
        min(col("days_since_epoch_start")).as("min_days"),
        max(col("plus3m")).cast("string").as("max_plus3m"),
        sum(col("dow")).as("sum_dow"),
        min(col("epoch_s")).as("min_epoch_s"))

  val dateArithSql: String =
    """SELECT date_trunc('month', CAST(o_orderdate AS TIMESTAMP)) AS month,
      |  COUNT(*) AS n,
      |  MIN(date_diff('day', DATE '1995-01-01',
      |    CAST(o_orderdate AS DATE))) AS min_days,
      |  strftime(MAX(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH),
      |    '%Y-%m-%d') AS max_plus3m,
      |  CAST(SUM(CAST(dayofweek(CAST(o_orderdate AS DATE)) AS BIGINT) + 1)
      |    AS BIGINT) AS sum_dow,
      |  CAST(MIN(epoch(CAST(o_orderdate AS TIMESTAMP))) AS BIGINT) AS min_epoch_s
      |FROM orders GROUP BY 1""".stripMargin

  // ------------------------------------------- DSv2 custom source
  /** Aggregate over the [[graft.sources.SyntheticV2Source]] DSv2
    * table: the `id` range predicate is CONSUMED by the source's
    * `pushFilters` (the scan generates only [25000, 175000)), the
    * `tag` predicate stays residual, and column pruning reaches the
    * readers. The deterministic generator lets DuckDB's `range()`
    * reproduce the table exactly, so the custom-source path sits
    * behind the same oracle gate as every file-based query. The `dir`
    * parameter is unused — this source reads no files by design.
    */
  def sourceDsv2(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("graft-synth")
      .option("rows", "200000").option("parts", "8").load()
      .where(col("id") >= 25000 && col("id") < 175000 &&
        col("tag") =!= "t3")
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("hv")).as("sum_hv"),
        min(col("id")).as("min_id"), max(col("id")).as("max_id"))

  val sourceDsv2Sql: String = {
    import graft.functions.CrossHash
    s"""WITH t AS (
       |  SELECT CAST(r.range AS BIGINT) AS id FROM range(0, 200000) r),
       |s AS (
       |  SELECT id, id % 97 AS bucket,
       |    ${CrossHash.sqlAffine("id", 0)} AS hv,
       |    't' || CAST(id % 7 AS VARCHAR) AS tag
       |  FROM t)
       |SELECT bucket, COUNT(*) AS n, CAST(SUM(hv) AS BIGINT) AS sum_hv,
       |  MIN(id) AS min_id, MAX(id) AS max_id
       |FROM s
       |WHERE id >= 25000 AND id < 175000 AND tag <> 't3'
       |GROUP BY bucket""".stripMargin
  }

  /** [[sourceDsv2]]'s aggregation with the shuffle REMOVED by the
    * source itself: `keyed=true` makes [[graft.sources
    * .SyntheticV2Source]] lay its partitions out one-per-bucket and
    * report a key-grouped partitioning over `bucket`
    * (`SupportsReportPartitioning` + `HasPartitionKey`), so the
    * groupBy's clustered distribution is satisfied straight off the
    * scan — the plan has NO exchange at all (pinned in
    * PlanAuditSpec). This is the DSv2 storage-partitioned analog of
    * [[LakehouseQueries.layoutBucketJoin]]'s bucketed tables: at
    * 100 TB, a source that knows its own layout saves the first —
    * often the only — shuffle of every aggregation that follows it.
    * Same filters and aggregate as [[sourceDsv2]], so the one oracle
    * body double-checks both layouts against each other.
    */
  def sourceDsv2Keyed(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("graft-synth")
      .option("rows", "200000").option("keyed", "true").load()
      .where(col("id") >= 25000 && col("id") < 175000 &&
        col("tag") =!= "t3")
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("hv")).as("sum_hv"),
        min(col("id")).as("min_id"), max(col("id")).as("max_id"))

  /** Storage-partitioned JOIN: two key-grouped DSv2 scans of different
    * sizes join on their shared bucket key and aggregate — and the
    * WHOLE plan runs with zero exchanges (pinned in PlanAuditSpec).
    * Both scans report the same KeyGroupedPartitioning, so the
    * sort-merge join consumes their layouts directly (Spark's SPJ
    * machinery), and the post-join groupBy on the same key rides the
    * preserved partitioning. This is the full fact-to-fact story for
    * sources that know their layout: at 100 TB the plan's only data
    * movement is the scan itself. The `merge` hint exists solely to
    * keep the small test-scale sides off the broadcast path.
    */
  def sourceDsv2Spj(spark: SparkSession, dir: String): DataFrame = {
    def keyed(rows: Int) = spark.read.format("graft-synth")
      .option("rows", rows.toString).option("keyed", "true").load()
    val a = keyed(20000)
      .select(col("bucket"), col("id").as("a_id"), col("hv").as("a_hv"))
    val b = keyed(30000).select(col("bucket"), col("id").as("b_id"))
    a.hint("merge").join(b, "bucket")
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("a_hv")).as("sum_hv"),
        max(col("a_id") + col("b_id")).as("max_idsum"))
  }

  val sourceDsv2SpjSql: String = {
    import graft.functions.CrossHash
    s"""WITH a AS (
       |  SELECT CAST(r.range AS BIGINT) % 97 AS bucket,
       |    CAST(r.range AS BIGINT) AS a_id,
       |    ${CrossHash.sqlAffine("CAST(r.range AS BIGINT)", 0)} AS a_hv
       |  FROM range(0, 20000) r),
       |b AS (
       |  SELECT CAST(r.range AS BIGINT) % 97 AS bucket,
       |    CAST(r.range AS BIGINT) AS b_id
       |  FROM range(0, 30000) r)
       |SELECT a.bucket, COUNT(*) AS n_pairs,
       |  CAST(SUM(a_hv) AS BIGINT) AS sum_hv,
       |  MAX(a_id + b_id) AS max_idsum
       |FROM a JOIN b ON a.bucket = b.bucket
       |GROUP BY a.bucket""".stripMargin
  }

  /** DSv2 top-N pushdown under the oracle gate: `ORDER BY id LIMIT k`
    * over a 10^8-row synthetic table folds — completely, via
    * `SupportsPushDownTopN` — to a closed-form k-row read at the
    * matching end of the scanned interval, in BOTH directions, plus a
    * bare `LIMIT k` via `SupportsPushDownLimit`. Spark drops its Sort
    * and Limit nodes entirely (pinned in PlanAuditSpec: no global
    * Sort, no TakeOrderedAndProject above the scan), so the work is
    * k rows, not 10^8 — the contract that turns a trillion-row
    * ORDER-BY-LIMIT into a per-partition k-row read. The table size
    * is deliberately big enough that a silent fallback to a real scan
    * would show up as a bench cliff, not hide in the noise.
    */
  def sourceDsv2Topn(spark: SparkSession, dir: String): DataFrame = {
    def t = spark.read.format("graft-synth")
      .option("rows", "100000000").option("parts", "8").load()
    val asc = t.where(col("id") >= 777)
      .orderBy(col("id").asc).limit(5)
      .select(lit("asc").as("dir"), col("id"), col("hv"))
    val desc = t.where(col("id") < 99999000)
      .orderBy(col("id").desc).limit(5)
      .select(lit("desc").as("dir"), col("id"), col("hv"))
    // bare limit: any k rows are valid, but the fold is deterministic
    // (the ascending head of the narrowed interval) — assert it
    val bare = t.where(col("id") >= 50000000).limit(5)
      .select(lit("limit").as("dir"), col("id"), col("hv"))
    asc.unionByName(desc).unionByName(bare)
  }

  val sourceDsv2TopnSql: String = {
    import graft.functions.CrossHash
    val hv = CrossHash.sqlAffine("CAST(r.range AS BIGINT)", 0)
    s"""WITH t AS (
       |  SELECT CAST(r.range AS BIGINT) AS id, $hv AS hv
       |  FROM range(0, 100000000) r)
       |SELECT * FROM (
       |  SELECT 'asc' AS dir, id, hv FROM t WHERE id >= 777
       |  ORDER BY id ASC LIMIT 5)
       |UNION ALL
       |SELECT * FROM (
       |  SELECT 'desc' AS dir, id, hv FROM t WHERE id < 99999000
       |  ORDER BY id DESC LIMIT 5)
       |UNION ALL
       |SELECT * FROM (
       |  SELECT 'limit' AS dir, id, hv FROM t WHERE id >= 50000000
       |  ORDER BY id ASC LIMIT 5)""".stripMargin
  }

  /** DSv2 WRITE path under the oracle gate: a deterministic orders
    * slice goes THROUGH the manifest-committed sink
    * ([[graft.sources.ManifestV2Sink]]) — staged files, commit,
    * manifest publish — and the aggregate is computed from
    * `readCommitted` (manifest-listed files only). The DuckDB twin
    * aggregates the same slice straight from parquet, so any loss,
    * duplication, or mangling in the sink round-trip (escaping,
    * nulls, promotion, manifest) diverges the hashes. (Special-char
    * and null escaping are pinned separately in ManifestSinkSpec.)
    */
  def sinkManifestRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val outPath = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      s"graft_manifest_rt_${java.util.UUID.randomUUID().toString.take(8)}")
    val fs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = outPath.toUri.getPath // scheme-less for the nio sink side
    try {
      table(spark, dir, "orders")
        .where(col("o_orderkey") % 13 === 0)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"),
          col("o_orderstatus"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
        .write.format("graft-manifest").mode("append").save(out)
      graft.sources.ManifestV2Sink.readCommitted(spark, out)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(col("cents")).as("sum_cents"),
          sum(col("o_orderkey")).as("sum_keys"),
          sum(length(col("o_orderstatus"))).as("sum_status_chars"))
        .localCheckpoint(true) // eager: the finally deletes the table
    } finally fs.delete(outPath, true)
  }

  val sinkManifestRoundtripSql: String =
    """SELECT o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |    AS sum_cents,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
      |  CAST(SUM(length(o_orderstatus)) AS BIGINT) AS sum_status_chars
      |FROM orders
      |WHERE o_orderkey % 13 = 0
      |GROUP BY o_orderpriority""".stripMargin

  /** TABLESAMPLE pushed into the V2 connector — and, uniquely,
    * ORACLE-CHECKABLE: `df.sample(f, seed)` normally means an RNG
    * whose output no other engine can reproduce, but the source's
    * `SupportsPushDownTableSample` implements the sample as a
    * seed-indexed CrossHash affine membership test
    * ([[graft.sources.SyntheticV2Source.sampleSpec]]), so the EXACT
    * row set is deterministic and the DuckDB twin applies the
    * identical predicate. Spark drops its Sample node (plan-pinned);
    * the readers stream past non-members with O(1) state — at
    * 10^12 rows the sample never materializes the unsampled 99%.
    */
  def sourceDsv2Sample(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("graft-synth")
      .option("rows", "1000000").option("parts", "8").load()
      .sample(0.01, 42L)
      .agg(count(lit(1)).as("n"), sum(col("hv")).as("sum_hv"),
        min(col("id")).as("min_id"), max(col("id")).as("max_id"))

  val sourceDsv2SampleSql: String = {
    import graft.functions.CrossHash
    val (loT, hiT, sIdx) =
      graft.sources.SyntheticV2Source.sampleSpec(0.0, 0.01, 42L)
    val m = s"((${CrossHash.coefA(sIdx)} * (id % ${CrossHash.P}) + " +
      s"${CrossHash.coefB(sIdx)}) % ${CrossHash.P})"
    s"""WITH t AS (
       |  SELECT CAST(r.range AS BIGINT) AS id,
       |    ${CrossHash.sqlAffine("CAST(r.range AS BIGINT)", 0)} AS hv
       |  FROM range(0, 1000000) r),
       |s AS (
       |  SELECT id, hv, (m * m + 3 * m + 5) % ${CrossHash.P} AS h
       |  FROM (SELECT id, hv, $m AS m FROM t))
       |SELECT COUNT(*) AS n, CAST(SUM(hv) AS BIGINT) AS sum_hv,
       |  MIN(id) AS min_id, MAX(id) AS max_id
       |FROM s WHERE h >= $loT AND h < $hiT""".stripMargin
  }

  /** JOIN pushdown into the V2 connector (`SupportsPushDownJoin`,
    * Spark 4.1's newest read contract, enabled via
    * `spark.sql.optimizer.datasourceV2JoinPushdown` in GraftSession):
    * an INNER equi-join of two synthetic scans on `id` folds to the
    * INTERVAL INTERSECTION — both sides generate the identical row at
    * a given id, so the join collapses into ONE scan emitting both
    * sides' (aliased) projections over a single id walk. The plan has
    * NO join exec at all (pinned in PlanAuditSpec); at 10^12 rows the
    * join costs the narrower scan, which is the whole point of the
    * contract. The two sides carry different filters so the
    * intersection arithmetic is visible in the oracle-checked result.
    */
  def sourceDsv2Join(spark: SparkSession, dir: String): DataFrame = {
    val a = spark.read.format("graft-synth")
      .option("rows", "300000").option("parts", "8").load()
      .where(col("id") < 250000).select(col("id"), col("hv"))
    val b = spark.read.format("graft-synth")
      .option("rows", "400000").option("parts", "8").load()
      .where(col("id") >= 50000).select(col("id"), col("bucket"))
    a.join(b, "id")
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("hv")).as("sum_hv"),
        min(col("id")).as("min_id"), max(col("id")).as("max_id"))
  }

  val sourceDsv2JoinSql: String = {
    import graft.functions.CrossHash
    s"""WITH t AS (
       |  SELECT CAST(r.range AS BIGINT) AS id,
       |    ${CrossHash.sqlAffine("CAST(r.range AS BIGINT)", 0)} AS hv
       |  FROM range(50000, 250000) r)
       |SELECT id % 97 AS bucket, COUNT(*) AS n,
       |  CAST(SUM(hv) AS BIGINT) AS sum_hv,
       |  MIN(id) AS min_id, MAX(id) AS max_id
       |FROM t GROUP BY 1""".stripMargin
  }

  /** TIME TRAVEL through the manifest sink's snapshot versions: three
    * commits land in one table — append (v1), append (v2), OVERWRITE
    * (v3) — and all three snapshots are read back side by side via
    * `readVersion`. Each publish writes an immutable versioned
    * manifest before moving the current pointer, and data files are
    * never rewritten in place, so v1/v2 remain exactly readable after
    * the v3 truncate — the Iceberg/Delta snapshot-read contract in
    * miniature, and the thing a pipeline needs to reproduce "the
    * corpus as of last Tuesday" for a training-run audit. The oracle
    * recomputes each snapshot from its deterministic slice
    * definition, so any cross-version file leakage (v2 rows visible
    * at v1, v3 truncate losing isolation) diverges the hash.
    *
    * Scale: snapshot resolution is one small-file read; the data cost
    * is the files the snapshot lists, same as the current view.
    */
  def sinkManifestTimetravel(spark: SparkSession, dir: String): DataFrame = {
    val outPath = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      s"graft_timetravel_${java.util.UUID.randomUUID().toString.take(8)}")
    val fs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = outPath.toUri.getPath // scheme-less for the nio sink side
    try {
      def slice(m: Long) = table(spark, dir, "orders")
        .where(col("o_orderkey") % 17 === m)
        .select(col("o_orderkey"), col("o_custkey"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
      slice(0).write.format("graft-manifest").mode("append").save(out)
      slice(1).write.format("graft-manifest").mode("append").save(out)
      slice(2).write.format("graft-manifest").mode("overwrite").save(out)
      graft.sources.ManifestV2Sink.versions(out).map { v =>
        graft.sources.ManifestV2Sink.readVersion(spark, out, v)
          .agg(count(lit(1)).as("n"),
            sum(col("cents")).as("sum_cents"),
            sum(col("o_orderkey")).as("sum_keys"))
          .select(lit(v.toLong).as("version"), col("n"), col("sum_cents"),
            col("sum_keys"))
      }.reduce(_ unionByName _).orderBy(col("version"))
        .localCheckpoint(true) // eager: the finally deletes the table
    } finally fs.delete(outPath, true)
  }

  val sinkManifestTimetravelSql: String =
    """WITH s AS (
      |  SELECT o_orderkey % 17 AS m, o_orderkey,
      |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders),
      |v AS (
      |  SELECT 1 AS version, o_orderkey, cents FROM s WHERE m = 0
      |  UNION ALL
      |  SELECT 2, o_orderkey, cents FROM s WHERE m IN (0, 1)
      |  UNION ALL
      |  SELECT 3, o_orderkey, cents FROM s WHERE m = 2)
      |SELECT CAST(version AS BIGINT) AS version, COUNT(*) AS n,
      |  CAST(SUM(cents) AS BIGINT) AS sum_cents,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys
      |FROM v GROUP BY version ORDER BY version""".stripMargin

  /** EXECUTED small-file compaction — the OPTIMIZE rewrite half
    * (`layout_compaction` is the bin-packing planner): eight tiny
    * single-file appends land eight committed data files — the
    * streaming-ingest pathology every lakehouse maintains against —
    * then [[graft.sources.ManifestV2Sink.compact]] rewrites the
    * content into two files as ONE copy-on-write commit under the
    * per-path commit lock. The report carries the content rollup from
    * the POST-compaction read-back (the oracle recomputes it straight
    * from `orders`, so a row lost, duplicated, or mangled by the
    * rewrite diverges the hash) plus the lifecycle observables as
    * closed-form constants: files 8→2 (every partition writer emits
    * its file, so both counts are exact), snapshots 9 = 8 appends + 1
    * compaction (history intact — every pre-compaction state stays
    * time-travelable), and ZERO unreferenced files while snapshots are
    * retained (the small files release only at snapshot expiry — the
    * OPTIMIZE→VACUUM contract, spec-pinned in ManifestSinkSpec).
    */
  def sinkManifestCompact(spark: SparkSession, dir: String): DataFrame = {
    val outPath = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      s"graft_compact_${java.util.UUID.randomUUID().toString.take(8)}")
    val fs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = outPath.toUri.getPath // scheme-less for the nio sink side
    try {
      val src = table(spark, dir, "orders")
        .where(col("o_orderkey") % 31 === 0)
        .select(col("o_orderkey"), col("o_orderpriority"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
      for (b <- 0L until 8L)
        src.where(col("o_orderkey") % 8 === b).coalesce(1)
          .write.format("graft-manifest").mode("append").save(out)
      val filesBefore = graft.sources.ManifestV2Sink.committedFileCount(out)
      graft.sources.ManifestV2Sink.compact(spark, out, 2)
      val filesAfter = graft.sources.ManifestV2Sink.committedFileCount(out)
      val nSnapshots = graft.sources.ManifestV2Sink.versions(out).size
      val nOrphans =
        graft.sources.ManifestV2Sink.unreferencedFiles(out).size
      graft.sources.ManifestV2Sink.readCommitted(spark, out)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"),
          sum(col("o_orderkey")).as("sum_keys"))
        .select(col("o_orderpriority"), col("n"), col("sum_cents"),
          col("sum_keys"),
          lit(filesBefore.toLong).as("files_before"),
          lit(filesAfter.toLong).as("files_after"),
          lit(nSnapshots.toLong).as("n_snapshots"),
          lit(nOrphans.toLong).as("n_unreferenced"))
        .localCheckpoint(true) // eager: the finally deletes the table
    } finally fs.delete(outPath, true)
  }

  val sinkManifestCompactSql: String =
    """SELECT o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |    AS sum_cents,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
      |  CAST(8 AS BIGINT) AS files_before,
      |  CAST(2 AS BIGINT) AS files_after,
      |  CAST(9 AS BIGINT) AS n_snapshots,
      |  CAST(0 AS BIGINT) AS n_unreferenced
      |FROM orders
      |WHERE o_orderkey % 31 = 0
      |GROUP BY o_orderpriority""".stripMargin

  /** MANIFEST DATA SKIPPING under the oracle gate: seven year-sliced
    * appends land seven data files whose write-time min/max stats the
    * manifest records per file; a two-year windowed read then goes
    * through [[graft.sources.ManifestV2Sink.readPruned]], which skips
    * every file whose recorded range is disjoint from the window —
    * the mechanism that turns a selective read of a 100-TB table into
    * a 10-file scan. BOTH directions are hash-gated: the in-band
    * `files_read`/`files_total` columns equal the oracle's
    * COUNT(DISTINCT year) twins (one file per populated year by
    * construction), so reading too MANY files diverges the count
    * columns and skipping too many loses aggregate rows. The exact
    * predicate rides on top of the file skip, exactly like a residual
    * after Iceberg/Delta pruning.
    */
  def sinkManifestPrune(spark: SparkSession, dir: String): DataFrame = {
    val outPath = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      s"graft_prune_${java.util.UUID.randomUUID().toString.take(8)}")
    val fs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = outPath.toUri.getPath // scheme-less for the nio sink side
    try {
      val src = table(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"),
          year(col("o_orderdate")).cast("long").as("yr"))
      // one commit per populated year = one data file per year with a
      // tight [min,max] — the layout a date-partitioned nightly ingest
      // produces naturally
      val years = src.select(col("yr")).distinct().orderBy(col("yr"))
        .collect().map(_.getLong(0)) // calendar-bounded, never data-sized
      years.foreach { y =>
        src.where(col("yr") === y).coalesce(1)
          .write.format("graft-manifest").mode("append").save(out)
      }
      val (lo, hi) = (1996L, 1997L)
      val filesTotal = graft.sources.ManifestV2Sink.committedFileCount(out)
      val filesRead = graft.sources.ManifestV2Sink
        .prunedDataFiles(out, "yr", lo, hi).size
      graft.sources.ManifestV2Sink.readPruned(spark, out, "yr", lo, hi)
        .where(col("yr").between(lo, hi)) // exact residual atop the skip
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"),
          sum(col("o_orderkey")).as("sum_keys"))
        .select(col("o_orderpriority"), col("n"), col("sum_cents"),
          col("sum_keys"),
          lit(filesRead.toLong).as("files_read"),
          lit(filesTotal.toLong).as("files_total"))
        .localCheckpoint(true) // eager: the finally deletes the table
    } finally fs.delete(outPath, true)
  }

  /** BIN-PACKED OPTIMIZE under the oracle gate — the compaction a
    * real table runs nightly: one RIGHT-SIZED file (a full order
    * slice) plus five SMALL commits (the slice's %5 shards, the
    * trickle-ingest shape); `CALL graft.system.binpack` with
    * min_bytes = the big file's recorded size rewrites ONLY the five
    * small files into one bin while the big file CARRIES OVER as a
    * raw manifest entry — zero bytes moved for it, O(small), never
    * O(table), unlike whole-table OPTIMIZE. All three tier counts and
    * the final file count are in-band literals, and the post-pack
    * aggregate over BOTH slices proves not a row moved.
    */
  def sinkManifestBinpack(spark: SparkSession, dir: String): DataFrame = {
    val t = s"bp_${java.util.UUID.randomUUID().toString.take(8)}"
    val out = spark.conf.get("spark.sql.catalog.graft.root") + s"/$t"
    try {
      spark.sql(s"CREATE TABLE graft.$t (o_orderkey BIGINT, " +
        "o_orderstatus STRING, cents BIGINT)")
      val src = table(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
      src.where(col("o_orderkey") % 13 === 4).coalesce(1)
        .write.insertInto(s"graft.$t")
      (0 until 5).foreach { i =>
        src.where(col("o_orderkey") % 13 === 10 &&
            col("o_orderkey") % 5 === i).coalesce(1)
          .write.insertInto(s"graft.$t")
      }
      // dogfood the metadata table for the size threshold
      val bigSize = spark.sql(
        s"SELECT max(size_bytes) FROM graft.$t.files").head.getLong(0)
      val r = spark.sql(s"CALL graft.system.binpack(table => '$t', " +
        s"target_bytes => ${1L << 30}, min_bytes => $bigSize)")
        .collect()(0)
      val filesAfter = graft.sources.ManifestV2Sink
        .committedFileCount(out).toLong
      spark.sql(
        s"""SELECT o_orderstatus, COUNT(*) AS n,
           |  CAST(SUM(cents) AS BIGINT) AS sum_cents,
           |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys
           |FROM graft.$t GROUP BY o_orderstatus""".stripMargin)
        .select(col("*"),
          lit(r.getInt(0).toLong).as("files_compacted"),
          lit(r.getInt(1).toLong).as("bins_written"),
          lit(r.getInt(2).toLong).as("files_carried"),
          lit(filesAfter).as("files_after"))
        .localCheckpoint(true) // eager: the finally drops the table
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  val sinkManifestBinpackSql: String =
    """SELECT o_orderstatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |    AS sum_cents,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
      |  CAST(5 AS BIGINT) AS files_compacted,
      |  CAST(1 AS BIGINT) AS bins_written,
      |  CAST(1 AS BIGINT) AS files_carried,
      |  CAST(2 AS BIGINT) AS files_after
      |FROM orders
      |WHERE o_orderkey % 13 = 4 OR o_orderkey % 13 = 10
      |GROUP BY o_orderstatus""".stripMargin

  /** STRING data skipping under the oracle gate: orders lands one
    * file per o_orderstatus (a category-clustered layout), each
    * file's manifest entry records truncated STRING bounds (`T|`
    * blobs — Iceberg's truncate-down/up in miniature), and a pushed
    * string range predicate (`>= 'P'`) plans only the files whose
    * bounds can match — the skip every date=string or
    * category-partitioned 100-TB layout needs where numeric stats
    * never apply. BOTH directions gated: `files_read`/`files_total`
    * equal the oracle's COUNT(DISTINCT status) twins, and the
    * aggregates lose rows if pruning over-skips.
    */
  def sinkManifestStringPrune(spark: SparkSession,
      dir: String): DataFrame = {
    val t = s"sprune_${java.util.UUID.randomUUID().toString.take(8)}"
    try {
      spark.sql(s"CREATE TABLE graft.$t (o_orderkey BIGINT, " +
        "o_orderstatus STRING, cents BIGINT)")
      val src = table(spark, dir, "orders")
        .where(col("o_orderkey") % 13 === 6)
        .select(col("o_orderkey"), col("o_orderstatus"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
      val statuses = src.select(col("o_orderstatus")).distinct()
        .orderBy(col("o_orderstatus"))
        .collect().map(_.getString(0)) // 3 TPC-H statuses, never data-sized
      statuses.foreach { st =>
        src.where(col("o_orderstatus") === st).coalesce(1)
          .write.insertInto(s"graft.$t")
      }
      val filesTotal = graft.sources.ManifestV2Sink.committedFileCount(
        spark.conf.get("spark.sql.catalog.graft.root") + s"/$t").toLong
      val q = spark.sql(s"SELECT o_orderstatus, o_orderkey, cents " +
        s"FROM graft.$t WHERE o_orderstatus >= 'P'")
      val filesRead = q.rdd.getNumPartitions.toLong
      q.groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"),
          sum(col("o_orderkey")).as("sum_keys"))
        .select(col("*"), lit(filesRead).as("files_read"),
          lit(filesTotal).as("files_total"))
        .localCheckpoint(true) // eager: the finally drops the table
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  val sinkManifestStringPruneSql: String =
    """WITH s AS (
      |  SELECT o_orderkey, o_orderstatus,
      |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders WHERE o_orderkey % 13 = 6)
      |SELECT o_orderstatus, COUNT(*) AS n,
      |  CAST(SUM(cents) AS BIGINT) AS sum_cents,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
      |  (SELECT COUNT(DISTINCT o_orderstatus) FROM s
      |     WHERE o_orderstatus >= 'P') AS files_read,
      |  (SELECT COUNT(DISTINCT o_orderstatus) FROM s) AS files_total
      |FROM s WHERE o_orderstatus >= 'P'
      |GROUP BY o_orderstatus""".stripMargin

  /** FULL ANSI MERGE (table-sync idiom) under the oracle gate: the
    * target starts as a STALE copy of an orders slice (a third of the
    * keys missing, every key's cents off by −1), the source is the
    * truth (half the slice, cents+5), and ONE statement syncs them —
    * `WHEN MATCHED UPDATE`, `WHEN NOT MATCHED INSERT`, `WHEN NOT
    * MATCHED BY SOURCE DELETE` (r13 refused BY SOURCE; this round's
    * general rewrite covers the whole ANSI action surface). The final
    * table must equal the source EXACTLY — a missed delete leaves
    * stale rows, a missed update leaves the −1 skew, a missed insert
    * loses keys — and the aggregate is the oracle's direct twin over
    * the source slice, so every action is hash-gated.
    */
  def sinkManifestSqlMergeSync(spark: SparkSession,
      dir: String): DataFrame = {
    val t = s"sync_${java.util.UUID.randomUUID().toString.take(8)}"
    try {
      spark.sql(s"CREATE TABLE graft.$t (o_orderkey BIGINT, " +
        "o_orderstatus STRING, cents BIGINT)")
      val slice = table(spark, dir, "orders")
        .where(col("o_orderkey") % 13 === 2)
        .select(col("o_orderkey"), col("o_orderstatus"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
      // stale target: a third of keys missing, cents skewed by -1
      slice.where(col("o_orderkey") % 3 =!= 0)
        .select(col("o_orderkey"), col("o_orderstatus"),
          (col("cents") - 1).as("cents"))
        .write.insertInto(s"graft.$t")
      slice.where(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_orderstatus"),
          (col("cents") + 5).as("nv"))
        .createOrReplaceTempView(s"src_$t")
      spark.sql(s"""MERGE INTO graft.$t tgt
        |USING src_$t src
        |ON tgt.o_orderkey = src.o_orderkey
        |WHEN MATCHED THEN UPDATE SET cents = src.nv
        |WHEN NOT MATCHED THEN INSERT (o_orderkey, o_orderstatus, cents)
        |  VALUES (src.o_orderkey, src.o_orderstatus, src.nv)
        |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
      spark.sql(
        s"""SELECT o_orderstatus, COUNT(*) AS n,
           |  CAST(SUM(cents) AS BIGINT) AS sum_cents,
           |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys
           |FROM graft.$t GROUP BY o_orderstatus""".stripMargin)
        .localCheckpoint(true) // eager: the finally drops the table
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS graft.$t")
      spark.catalog.dropTempView(s"src_$t")
      ()
    }
  }

  val sinkManifestSqlMergeSyncSql: String =
    """SELECT o_orderstatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT) + 5)
      |    AS BIGINT) AS sum_cents,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys
      |FROM orders
      |WHERE o_orderkey % 13 = 2 AND o_orderkey % 2 = 0
      |GROUP BY o_orderstatus""".stripMargin

  /** METADATA TABLES under the oracle gate — `graft.t.files` and
    * `graft.t.snapshots` ([[graft.sources.ManifestMetaTables]],
    * Iceberg's metadata tables in miniature) audited against the
    * data's own profile: the per-file `row_count`s recorded at commit
    * must SUM to the slice's true cardinality, the file count must
    * equal the per-year layout's distinct years, and the snapshot log
    * must show one commit per year plus the CREATE, with the current
    * head listing every file. A wrong R| record, a lost commit, or a
    * stale head pointer each diverges a pinned column — this is the
    * ops surface a 100-TB table owner trusts for layout health.
    */
  def sinkManifestMeta(spark: SparkSession, dir: String): DataFrame = {
    val t = perYearTable(spark, dir, "meta", 12)
    try {
      spark.sql(
        s"""SELECT f.format, COUNT(*) AS n_files,
           |  CAST(SUM(f.row_count) AS BIGINT) AS total_rows,
           |  (SELECT COUNT(*) FROM graft.$t.snapshots) AS n_snapshots,
           |  (SELECT CAST(s.n_files AS BIGINT)
           |     FROM graft.$t.snapshots s
           |     WHERE s.is_current) AS current_files
           |FROM graft.$t.files f
           |GROUP BY f.format""".stripMargin)
        .localCheckpoint(true) // eager: the finally drops the table
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  val sinkManifestMetaSql: String =
    """WITH s AS (
      |  SELECT year(o_orderdate) AS yr
      |  FROM orders WHERE o_orderkey % 13 = 12)
      |SELECT 'parquet' AS format,
      |  (SELECT COUNT(DISTINCT yr) FROM s) AS n_files,
      |  (SELECT COUNT(*) FROM s) AS total_rows,
      |  (SELECT COUNT(DISTINCT yr) + 1 FROM s) AS n_snapshots,
      |  (SELECT COUNT(DISTINCT yr) FROM s) AS current_files""".stripMargin

  /** SQL MAINTENANCE PROCEDURES under the oracle gate — the full
    * OPTIMIZE / retention / reclamation lifecycle as `CALL graft
    * .system.*` statements ([[graft.sources.ManifestProcedures]],
    * Spark 4's ProcedureCatalog): a per-year table compacts 7→2
    * files, snapshot expiry retains only the post-compaction head,
    * and vacuum reclaims exactly the de-referenced pre-compaction
    * files — every count in-band against oracle year-count twins, and
    * the post-lifecycle aggregate proves not a row moved. This is the
    * day-two surface a 100-TB table owner runs from a SQL console.
    */
  def sinkManifestProc(spark: SparkSession, dir: String): DataFrame = {
    val t = perYearTable(spark, dir, "proc", 11)
    try {
      val c = spark.sql(s"CALL graft.system.compact('$t', 2)").collect()(0)
      val e = spark.sql(
        s"CALL graft.system.expire_snapshots(table => '$t', keep => 1)")
        .collect()(0)
      val v = spark.sql(s"CALL graft.system.vacuum('$t')").collect()(0)
      spark.sql(
        s"""SELECT o_orderstatus, COUNT(*) AS n,
           |  CAST(SUM(cents) AS BIGINT) AS sum_cents,
           |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys
           |FROM graft.$t GROUP BY o_orderstatus""".stripMargin)
        .select(col("*"),
          lit(c.getInt(0).toLong).as("files_before"),
          lit(c.getInt(1).toLong).as("files_after"),
          lit(e.getInt(0).toLong).as("expired"),
          lit(v.getInt(0).toLong).as("vacuumed"))
        .localCheckpoint(true) // eager: the finally drops the table
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  val sinkManifestProcSql: String =
    """WITH s AS (
      |  SELECT o_orderkey, o_orderstatus,
      |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
      |    year(o_orderdate) AS yr
      |  FROM orders WHERE o_orderkey % 13 = 11)
      |SELECT o_orderstatus, COUNT(*) AS n,
      |  CAST(SUM(cents) AS BIGINT) AS sum_cents,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
      |  (SELECT COUNT(DISTINCT yr) FROM s) AS files_before,
      |  CAST(2 AS BIGINT) AS files_after,
      |  (SELECT COUNT(DISTINCT yr) + 1 FROM s) AS expired,
      |  (SELECT COUNT(DISTINCT yr) FROM s) AS vacuumed
      |FROM s GROUP BY o_orderstatus""".stripMargin

  /** ALTER TABLE RENAME/DROP COLUMN under the oracle gate: half the
    * order slice lands BEFORE `RENAME COLUMN cents TO pennies`, half
    * after (the new files carry the new name natively), and a
    * `DROP COLUMN flag` retires a column — all metadata-only commits
    * (`files_changed` = 0 pinned in-band; data files keep their
    * write-time names forever and resolve through the column-identity
    * ledger [[graft.sources.ManifestV2Sink.columnAliases]]). The
    * post-ALTER aggregate under the NEW name must equal the oracle's
    * whole-slice twin — losing either era's files (the classic
    * rename-by-name bug: new-name reads null out pre-rename files)
    * diverges count and sums immediately.
    */
  def sinkManifestRenameDrop(spark: SparkSession,
      dir: String): DataFrame = {
    val t = s"ren_${java.util.UUID.randomUUID().toString.take(8)}"
    val out = spark.conf.get("spark.sql.catalog.graft.root") + s"/$t"
    try {
      spark.sql(s"CREATE TABLE graft.$t (o_orderkey BIGINT, " +
        "o_orderstatus STRING, cents BIGINT, flag BIGINT)")
      val src = table(spark, dir, "orders")
        .where(col("o_orderkey") % 13 === 1)
        .select(col("o_orderkey"), col("o_orderstatus"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"),
          (col("o_orderkey") % 2).as("flag"))
      src.where(col("flag") === 0).write.insertInto(s"graft.$t")
      val filesBefore =
        graft.sources.ManifestV2Sink.committedDataFiles(out).toSet
      spark.sql(s"ALTER TABLE graft.$t RENAME COLUMN cents TO pennies")
      spark.sql(s"ALTER TABLE graft.$t DROP COLUMN flag")
      val filesAfter =
        graft.sources.ManifestV2Sink.committedDataFiles(out).toSet
      // the post-ALTER half lands under the new 3-column schema
      src.where(col("flag") === 1)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("cents").as("pennies"))
        .write.insertInto(s"graft.$t")
      val changed = ((filesAfter -- filesBefore) ++
        (filesBefore -- filesAfter)).size.toLong
      val nCols = spark.table(s"graft.$t").columns.length.toLong
      spark.sql(
        s"""SELECT o_orderstatus, COUNT(*) AS n,
           |  CAST(SUM(pennies) AS BIGINT) AS sum_pennies,
           |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys
           |FROM graft.$t GROUP BY o_orderstatus""".stripMargin)
        .select(col("*"),
          lit(changed).as("files_changed"),
          lit(nCols).as("n_cols"))
        .localCheckpoint(true) // eager: the finally drops the table
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  val sinkManifestRenameDropSql: String =
    """SELECT o_orderstatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |    AS sum_pennies,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
      |  CAST(0 AS BIGINT) AS files_changed,
      |  CAST(3 AS BIGINT) AS n_cols
      |FROM orders WHERE o_orderkey % 13 = 1
      |GROUP BY o_orderstatus""".stripMargin

  /** STORAGE-PARTITIONED JOIN between two manifest tables under the
    * oracle gate: both tables are `PARTITIONED BY (yr)` catalog
    * tables, so their scans report a KeyGroupedPartitioning built
    * from the per-file P| blobs ([[graft.sources.ManifestScan
    * .outputPartitioning]]); the equi-join on `yr` and the post-join
    * `(yr, status)` aggregate then run with ZERO shuffle exchanges —
    * at 100 TB the plan's only data movement is the scan itself (the
    * DSv2 bucketed-table join). Gated both ways: the pair aggregates
    * are the oracle's join twins, and `n_exchanges` (counted off the
    * EXECUTED plan) is pinned to the oracle's literal 0 — if the
    * layout claim ever breaks, the shuffle shows up in-band. The
    * merge hint only keeps the test-scale side off the broadcast
    * path.
    */
  def sinkManifestSpj(spark: SparkSession, dir: String): DataFrame = {
    val ta = s"spja_${java.util.UUID.randomUUID().toString.take(8)}"
    val tb = s"spjb_${java.util.UUID.randomUUID().toString.take(8)}"
    try {
      spark.sql(s"CREATE TABLE graft.$ta (o_orderkey BIGINT, " +
        "o_orderstatus STRING, cents BIGINT, yr INT) PARTITIONED BY (yr)")
      spark.sql(s"CREATE TABLE graft.$tb (o_orderkey BIGINT, yr INT) " +
        "PARTITIONED BY (yr)")
      val src = table(spark, dir, "orders")
      src.where(col("o_orderkey") % 13 === 3)
        .select(col("o_orderkey"), col("o_orderstatus"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"),
          year(col("o_orderdate")).as("yr"))
        .write.insertInto(s"graft.$ta")
      src.where(col("o_orderkey") % 13 === 7)
        .select(col("o_orderkey"), year(col("o_orderdate")).as("yr"))
        .write.insertInto(s"graft.$tb")
      val a = spark.table(s"graft.$ta").select(col("yr"),
        col("o_orderkey").as("a_key"), col("o_orderstatus"),
        col("cents"))
      val b = spark.table(s"graft.$tb").select(col("yr"),
        col("o_orderkey").as("b_key"))
      val agg = a.hint("merge").join(b, Seq("yr"))
        .groupBy(col("yr"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("cents")).as("sum_cents"),
          max(col("a_key") + col("b_key")).as("max_keysum"))
      val materialized = agg.localCheckpoint(true) // executes the join
      val nExchanges = "(?<![A-Za-z])Exchange(?![A-Za-z])".r
        .findAllIn(agg.queryExecution.executedPlan.toString()).length
      materialized.select(col("*"),
        lit(nExchanges.toLong).as("n_exchanges"))
        .localCheckpoint(true) // eager: the finally drops the tables
    } finally Seq(ta, tb).foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS graft.$t"))
  }

  val sinkManifestSpjSql: String =
    """WITH a AS (
      |  SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
      |    o_orderkey AS a_key, o_orderstatus,
      |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders WHERE o_orderkey % 13 = 3),
      |b AS (
      |  SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
      |    o_orderkey AS b_key
      |  FROM orders WHERE o_orderkey % 13 = 7)
      |SELECT a.yr, o_orderstatus, COUNT(*) AS n_pairs,
      |  CAST(SUM(cents) AS BIGINT) AS sum_cents,
      |  MAX(a_key + b_key) AS max_keysum,
      |  CAST(0 AS BIGINT) AS n_exchanges
      |FROM a JOIN b ON a.yr = b.yr
      |GROUP BY a.yr, o_orderstatus""".stripMargin

  /** DELETION VECTORS under the oracle gate — the merge-on-read tier
    * predicate DELETE takes for point-ish matches: deleting ONE row
    * (the table's minimum order key, spelled as a half-open range so
    * it routes to the predicate path, not the key-tombstone path) of
    * a per-year table writes a positions sidecar against the one file
    * whose key range can hold it — ZERO data files move
    * (`files_changed` = 0, `dv_files` = 1, both oracle-pinned), the
    * GDPR answer at 100 TB where a COW rewrite would move terabytes.
    * Every read surface applies the DV (the aggregates are the
    * oracle's `<> MIN(key)` twins), and a follow-up compaction merges
    * the DV away (`dv_after` = 0) with counts unchanged — the
    * OPTIMIZE lifecycle.
    */
  def sinkManifestDv(spark: SparkSession, dir: String): DataFrame = {
    val t = perYearTable(spark, dir, "dv", 9)
    val out = spark.conf.get("spark.sql.catalog.graft.root") + s"/$t"
    try {
      val filesBefore =
        graft.sources.ManifestV2Sink.committedDataFiles(out).toSet
      val minKey = spark.sql(s"SELECT MIN(o_orderkey) FROM graft.$t")
        .head.getLong(0)
      spark.sql(s"DELETE FROM graft.$t " +
        s"WHERE o_orderkey >= $minKey AND o_orderkey < ${minKey + 1}")
      val filesAfter =
        graft.sources.ManifestV2Sink.committedDataFiles(out).toSet
      def dvCount(): Long =
        graft.sources.ManifestV2Sink.dvFileCount(out).toLong
      val dvFiles = dvCount()
      val changed = ((filesAfter -- filesBefore) ++
        (filesBefore -- filesAfter)).size.toLong
      // OPTIMIZE merges the deletion vector away
      graft.sources.ManifestV2Sink.compact(spark, out, 2)
      val dvAfter = dvCount()
      spark.sql(
        s"""SELECT o_orderstatus, COUNT(*) AS n,
           |  CAST(SUM(cents) AS BIGINT) AS sum_cents,
           |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys
           |FROM graft.$t GROUP BY o_orderstatus""".stripMargin)
        .select(col("*"),
          lit(dvFiles).as("dv_files"),
          lit(changed).as("files_changed"),
          lit(dvAfter).as("dv_after"))
        .localCheckpoint(true) // eager: the finally drops the table
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  val sinkManifestDvSql: String =
    """WITH s AS (
      |  SELECT o_orderkey, o_orderstatus,
      |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders WHERE o_orderkey % 13 = 9)
      |SELECT o_orderstatus, COUNT(*) AS n,
      |  CAST(SUM(cents) AS BIGINT) AS sum_cents,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
      |  CAST(1 AS BIGINT) AS dv_files,
      |  CAST(0 AS BIGINT) AS files_changed,
      |  CAST(0 AS BIGINT) AS dv_after
      |FROM s WHERE o_orderkey <> (SELECT MIN(o_orderkey) FROM s)
      |GROUP BY o_orderstatus""".stripMargin

  /** AGGREGATE PUSHDOWN under the oracle gate: COUNT/MIN/MAX over a
    * partitioned manifest table — grouped by the partition column —
    * answered ENTIRELY from manifest metadata (the `R|`/`S|`/`N|`/
    * `P|` blobs recorded at publish): the executed plan is a
    * LocalTableScan, zero data files read, the Aggregate erased
    * (complete DSv2 pushdown, [[graft.sources.ManifestAggPushdown]]).
    * Pinned in-band: `meta_grouped`/`meta_count` = 1 iff the plans
    * were metadata-only; after a one-row deletion-vector delete,
    * COUNT(*) stays pushable (DV position counts are exact,
    * `n_after_dv`) while MIN must DECLINE to the row scan
    * (`dv_min_declined` — the deleted row could have been the
    * extreme) yet still answers correctly (`min_after_dv`). At
    * 100 TB this is the difference between a count that reads a
    * manifest and one that scans the table.
    */
  def sinkManifestAggPushdown(spark: SparkSession,
      dir: String): DataFrame = {
    val t = s"aggpd_${java.util.UUID.randomUUID().toString.take(8)}"
    try {
      spark.sql(s"CREATE TABLE graft.$t (o_orderkey BIGINT, " +
        "cents BIGINT, o_orderstatus STRING) " +
        "PARTITIONED BY (o_orderstatus)")
      table(spark, dir, "orders").where(col("o_orderkey") % 13 === 8)
        .select(col("o_orderkey"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"),
          col("o_orderstatus"))
        .createOrReplaceTempView(s"${t}_src")
      spark.sql(s"INSERT INTO graft.$t SELECT * FROM ${t}_src")
      val grouped = spark.sql(
        s"""SELECT o_orderstatus, count(*) AS n,
           |  min(o_orderkey) AS mn_key, max(o_orderkey) AS mx_key,
           |  count(cents) AS n_cents
           |FROM graft.$t GROUP BY o_orderstatus""".stripMargin)
      val metaGrouped = {
        val p = grouped.queryExecution.executedPlan.toString()
        p.contains("LocalTableScan") && !p.contains("BatchScan")
      }
      val g = grouped.localCheckpoint(true)
      val minKey = spark.sql(s"SELECT min(o_orderkey) FROM graft.$t")
        .head.getLong(0)
      spark.sql(s"DELETE FROM graft.$t WHERE o_orderkey >= $minKey " +
        s"AND o_orderkey < ${minKey + 1}")
      val cq = spark.sql(s"SELECT count(*) AS c FROM graft.$t")
      val metaCount = cq.queryExecution.executedPlan.toString()
        .contains("LocalTableScan")
      val nAfter = cq.head.getLong(0)
      val mq = spark.sql(s"SELECT min(o_orderkey) AS m FROM graft.$t")
      val declined = mq.queryExecution.executedPlan.toString()
        .contains("BatchScan")
      val minAfter = mq.head.getLong(0)
      g.select(col("*"),
        lit(if (metaGrouped) 1L else 0L).as("meta_grouped"),
        lit(if (metaCount) 1L else 0L).as("meta_count"),
        lit(if (declined) 1L else 0L).as("dv_min_declined"),
        lit(nAfter).as("n_after_dv"),
        lit(minAfter).as("min_after_dv"))
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  val sinkManifestAggPushdownSql: String =
    """WITH s AS (
      |  SELECT o_orderkey,
      |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
      |    o_orderstatus
      |  FROM orders WHERE o_orderkey % 13 = 8)
      |SELECT o_orderstatus, COUNT(*) AS n,
      |  MIN(o_orderkey) AS mn_key, MAX(o_orderkey) AS mx_key,
      |  COUNT(cents) AS n_cents,
      |  CAST(1 AS BIGINT) AS meta_grouped,
      |  CAST(1 AS BIGINT) AS meta_count,
      |  CAST(1 AS BIGINT) AS dv_min_declined,
      |  (SELECT COUNT(*) - 1 FROM s) AS n_after_dv,
      |  (SELECT MIN(o_orderkey) FROM s
      |   WHERE o_orderkey > (SELECT MIN(o_orderkey) FROM s))
      |    AS min_after_dv
      |FROM s GROUP BY o_orderstatus""".stripMargin

  /** LIMIT / TOP-N PUSHDOWN under the oracle gate: over a 7-file
    * year-clustered manifest table, `ORDER BY key LIMIT 10` (both
    * directions) plans ONLY the files whose stats bounds can hold
    * the 10 extreme rows ([[graft.sources.ManifestScanPlanner
    * .boundEntries]] — zone-map top-k pruning over the `S|`/`R|`/`N|`
    * blobs), pinned in-band as `bounded` = 1 iff files_planned <
    * files_total. The row VALUES are the real gate: whatever the
    * bound does, the 10 keys must equal DuckDB's. A year-clustered
    * 100 TB table answers "latest k" from its newest files only.
    */
  def sinkManifestLimitPushdown(spark: SparkSession,
      dir: String): DataFrame = {
    val t = perYearTable(spark, dir, "limpd", 10)
    val out = spark.conf.get("spark.sql.catalog.graft.root") + s"/$t"
    try {
      val total = graft.sources.ManifestV2Sink.committedFileCount(out)
      def run(q: String): (Seq[Long], Int) = {
        val rows = spark.sql(q).collect().map(_.getLong(0)).toSeq
        (rows, graft.sources.ManifestV2Sink.lastPlannedFiles(out)
          .map(_._1).getOrElse(-1))
      }
      // order by the CLUSTERED column (files are year-partitioned on
      // od, so their od ranges are disjoint and zone-map pruning can
      // bite; o_orderkey ranges overlap across every file) with the
      // key as deterministic tiebreak — bounding uses the PRIMARY key
      val (ascRows, ascPlanned) = run(
        s"SELECT o_orderkey FROM graft.$t " +
          "ORDER BY od, o_orderkey LIMIT 10")
      val (descRows, descPlanned) = run(
        s"SELECT o_orderkey FROM graft.$t " +
          "ORDER BY od DESC, o_orderkey DESC LIMIT 10")
      // bare LIMIT may return ANY rows — only its cardinality and
      // file bound are pinnable
      val (bareRows, barePlanned) = run(
        s"SELECT o_orderkey FROM graft.$t LIMIT 10")
      import spark.implicits._
      val asc = ascRows.map(k => ("asc", k,
        if (ascPlanned < total) 1L else 0L))
      val desc = descRows.map(k => ("desc", k,
        if (descPlanned < total) 1L else 0L))
      val bare = Seq(("bare", bareRows.length.toLong,
        if (barePlanned < total) 1L else 0L))
      (asc ++ desc ++ bare)
        .toDF("dirn", "o_orderkey", "bounded")
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  val sinkManifestLimitPushdownSql: String =
    """WITH s AS (
      |  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od
      |  FROM orders WHERE o_orderkey % 13 = 10),
      |a AS (SELECT 'asc' AS dirn, o_orderkey,
      |        CAST(1 AS BIGINT) AS bounded
      |      FROM s ORDER BY od, o_orderkey LIMIT 10),
      |d AS (SELECT 'desc' AS dirn, o_orderkey,
      |        CAST(1 AS BIGINT) AS bounded
      |      FROM s ORDER BY od DESC, o_orderkey DESC LIMIT 10)
      |SELECT * FROM a
      |UNION ALL SELECT * FROM d
      |UNION ALL SELECT 'bare', CAST(10 AS BIGINT),
      |  CAST(1 AS BIGINT)""".stripMargin

  /** ALTER COLUMN TYPE widening under the oracle gate: an INT-keyed
    * table widens to BIGINT as a metadata-only commit, a post-widen
    * insert lands a beyond-int value, and every read tier serves
    * BOTH file eras promoted — aggregates, filters, and the
    * manifest's width-agnostic `L`-kind stats skipping (the
    * beyond-int point lookup pins that the pre-widen file is still
    * PRUNED, `pruned` = 1). On a 100 TB table this is the evolution
    * path that avoids rewriting every historical file when ids
    * outgrow int32.
    */
  def sinkManifestWiden(spark: SparkSession, dir: String): DataFrame = {
    val t = s"widen_${java.util.UUID.randomUUID().toString.take(8)}"
    try {
      spark.sql(s"CREATE TABLE graft.$t (k INT, cents BIGINT)")
      table(spark, dir, "orders").where(col("o_orderkey") % 13 === 3)
        .select(col("o_orderkey").cast("int").as("k"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
        .createOrReplaceTempView(s"${t}_src")
      spark.sql(s"INSERT INTO graft.$t SELECT /*+ COALESCE(1) */ * " +
        s"FROM ${t}_src")
      spark.sql(s"ALTER TABLE graft.$t ALTER COLUMN k TYPE BIGINT")
      spark.sql(s"INSERT INTO graft.$t VALUES (4000000005, 999)")
      val isLong = spark.table(s"graft.$t").schema("k").dataType ==
        org.apache.spark.sql.types.LongType
      val out = spark.conf.get("spark.sql.catalog.graft.root") + s"/$t"
      val nBig = spark.sql(
        s"SELECT count(*) FROM graft.$t WHERE k = 4000000005")
        .head.getLong(0)
      // the beyond-int lookup must PRUNE the pre-widen file by stats
      spark.sql(s"SELECT * FROM graft.$t WHERE k = 4000000005").collect()
      val pruned = graft.sources.ManifestV2Sink.lastPlannedFiles(out)
        .contains((1, 2))
      spark.sql(
        s"""SELECT count(*) AS n, sum(k) AS sum_k,
           |  sum(cents) AS sum_cents FROM graft.$t""".stripMargin)
        .select(col("*"),
          lit(nBig).as("n_big"),
          lit(if (pruned) 1L else 0L).as("pruned"),
          lit(if (isLong) 1L else 0L).as("is_long"))
        .localCheckpoint(true)
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  val sinkManifestWidenSql: String =
    """WITH s AS (
      |  SELECT o_orderkey AS k,
      |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders WHERE o_orderkey % 13 = 3)
      |SELECT CAST((SELECT COUNT(*) FROM s) + 1 AS BIGINT) AS n,
      |  CAST((SELECT SUM(k) FROM s) + 4000000005 AS BIGINT) AS sum_k,
      |  CAST((SELECT SUM(cents) FROM s) + 999 AS BIGINT) AS sum_cents,
      |  CAST(1 AS BIGINT) AS n_big,
      |  CAST(1 AS BIGINT) AS pruned,
      |  CAST(1 AS BIGINT) AS is_long""".stripMargin

  /** PARTITION EVOLUTION under the oracle gate: an unpartitioned
    * table evolves to PARTITIONED BY (o_orderstatus) mid-history
    * (`CALL graft.system.set_partition_spec`) — no data moves, the
    * old-era file keeps its untagged layout, the new-era insert
    * fans out one file per status, and the mixed-era read stays
    * exact with CONSERVATIVE pruning (a status filter skips only
    * new-era files that recorded a different value; the old era is
    * always read — pinned by `pruned_mixed`). One compaction then
    * migrates every file to the new spec, after which the
    * partition-grouped COUNT folds from metadata again
    * (`meta_after`). The 100 TB story: re-layout is a sidecar write
    * plus the compactions you were running anyway.
    */
  def sinkManifestPartEvolve(spark: SparkSession,
      dir: String): DataFrame = {
    val t = s"pevo_${java.util.UUID.randomUUID().toString.take(8)}"
    try {
      spark.sql(s"CREATE TABLE graft.$t (o_orderkey BIGINT, " +
        "o_orderstatus STRING, cents BIGINT)")
      table(spark, dir, "orders").where(col("o_orderkey") % 13 === 12)
        .select(col("o_orderkey"), col("o_orderstatus"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
        .createOrReplaceTempView(s"${t}_src")
      spark.sql(s"INSERT INTO graft.$t SELECT /*+ COALESCE(1) */ * " +
        s"FROM ${t}_src WHERE o_orderkey % 2 = 0") // era A: untagged
      spark.sql(
        s"CALL graft.system.set_partition_spec('$t', 'o_orderstatus')")
      spark.sql(s"INSERT INTO graft.$t SELECT * FROM ${t}_src " +
        "WHERE o_orderkey % 2 = 1") // era B: one file per status
      val out = spark.conf.get("spark.sql.catalog.graft.root") + s"/$t"
      spark.sql(s"SELECT count(*) FROM graft.$t " +
        "WHERE o_orderstatus = 'F'").collect()
      val (p1, t1) = graft.sources.ManifestV2Sink
        .lastPlannedFiles(out).get
      val prunedMixed = p1 < t1 // era-B pruning bites, era-A carried
      graft.sources.ManifestV2Sink.compact(spark, out, 2)
      val migrated = spark
        .sql(s"SELECT partition FROM graft.$t.files").collect()
        .forall(r => !r.isNullAt(0) &&
          r.getString(0).startsWith("o_orderstatus="))
      val gq = spark.sql(s"SELECT o_orderstatus, count(*) AS n, " +
        s"sum(cents) AS sum_cents FROM graft.$t GROUP BY o_orderstatus")
      // metadata-fold probe is count-only: SUM can never fold from
      // file stats, COUNT over a fully-migrated spec does.
      val metaAfter = spark.sql(s"SELECT o_orderstatus, count(*) " +
          s"FROM graft.$t GROUP BY o_orderstatus")
        .queryExecution.executedPlan.toString()
        .contains("LocalTableScan")
      gq.select(col("*"),
        lit(if (prunedMixed) 1L else 0L).as("pruned_mixed"),
        lit(if (migrated) 1L else 0L).as("migrated"),
        lit(if (metaAfter) 1L else 0L).as("meta_after"))
        .localCheckpoint(true)
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  val sinkManifestPartEvolveSql: String =
    """WITH s AS (
      |  SELECT o_orderkey, o_orderstatus,
      |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders WHERE o_orderkey % 13 = 12)
      |SELECT o_orderstatus, COUNT(*) AS n,
      |  CAST(SUM(cents) AS BIGINT) AS sum_cents,
      |  CAST(1 AS BIGINT) AS pruned_mixed,
      |  CAST(1 AS BIGINT) AS migrated,
      |  CAST(1 AS BIGINT) AS meta_after
      |FROM s GROUP BY o_orderstatus""".stripMargin

  /** SEGMENTED MANIFEST METADATA under the oracle gate: 24 small
    * commits against one table force the head past the inline
    * threshold, so entries spill to immutable `_MANIFEST.seg.*`
    * files and later commits REUSE them (`seg_reused` pins at least
    * one segment carried across a commit unchanged; `head_small`
    * pins the head below 8 KB — i.e. commit cost stopped scaling
    * with table file count). The aggregate itself is checked
    * value-exact against DuckDB over the same source rows. The
    * 100 TB story: a streaming trigger's commit writes KBs of
    * metadata, not a re-serialization of the whole file inventory.
    */
  def sinkManifestSeg(spark: SparkSession, dir: String): DataFrame = {
    val t = s"seg_${java.util.UUID.randomUUID().toString.take(8)}"
    try {
      spark.sql(s"CREATE TABLE graft.$t (o_orderkey BIGINT, cents BIGINT)")
      table(spark, dir, "orders").where(col("o_orderkey") % 17 === 3)
        .select(col("o_orderkey"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
        .createOrReplaceTempView(s"${t}_src")
      for (i <- 0 until 24)
        spark.sql(s"INSERT INTO graft.$t SELECT /*+ COALESCE(1) */ * " +
          s"FROM ${t}_src WHERE o_orderkey % 24 = $i")
      val out = spark.conf.get("spark.sql.catalog.graft.root") + s"/$t"
      val headP = java.nio.file.Paths.get(out, "_MANIFEST")
      val refsBefore = graft.sources.ManifestV2Sink.segRefsOf(headP).toSet
      spark.sql(s"INSERT INTO graft.$t VALUES (-1, 0)")
      val refsAfter = graft.sources.ManifestV2Sink.segRefsOf(headP).toSet
      val segReused = refsBefore.nonEmpty &&
        refsBefore.intersect(refsAfter) == refsBefore
      val headSmall = java.nio.file.Files.size(headP) < 8192
      spark.sql(s"SELECT o_orderkey % 3 AS g, count(*) AS n, " +
        s"sum(cents) AS sum_cents FROM graft.$t WHERE o_orderkey >= 0 " +
        "GROUP BY o_orderkey % 3")
        .select(col("*"),
          lit(if (segReused) 1L else 0L).as("seg_reused"),
          lit(if (headSmall) 1L else 0L).as("head_small"))
        .localCheckpoint(true)
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  val sinkManifestSegSql: String =
    """WITH s AS (
      |  SELECT o_orderkey,
      |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders WHERE o_orderkey % 17 = 3)
      |SELECT o_orderkey % 3 AS g, COUNT(*) AS n,
      |  CAST(SUM(cents) AS BIGINT) AS sum_cents,
      |  CAST(1 AS BIGINT) AS seg_reused,
      |  CAST(1 AS BIGINT) AS head_small
      |FROM s GROUP BY o_orderkey % 3""".stripMargin

  /** TAGS under the oracle gate: pin the "audit corpus" with
    * `CALL graft.system.tag`, then mutate the table (append + DELETE),
    * expire history down to 1 retained snapshot and vacuum — and read
    * the EXACT pinned corpus back through `VERSION AS OF 'tag'`,
    * value-checked against DuckDB recomputing the same subset. The
    * in-band pins: `tag_survived` (the tagged version walked around
    * expiry — a tag is a retention promise) and `reclaimed` (vacuum
    * still deleted something, i.e. the pin is precise, not a vacuum
    * no-op). The 100 TB story: "the exact corpus the model saw" is a
    * named, immutable, GC-exempt ref — not a copied dataset.
    */
  def sinkManifestTag(spark: SparkSession, dir: String): DataFrame = {
    val t = s"tag_${java.util.UUID.randomUUID().toString.take(8)}"
    try {
      spark.sql(s"CREATE TABLE graft.$t (o_orderkey BIGINT, cents BIGINT)")
      table(spark, dir, "orders").where(col("o_orderkey") % 19 === 7)
        .select(col("o_orderkey"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
        .createOrReplaceTempView(s"${t}_src")
      spark.sql(s"INSERT INTO graft.$t SELECT * FROM ${t}_src")
      spark.sql(s"CALL graft.system.tag('$t', 'audit')")
      val out = spark.conf.get("spark.sql.catalog.graft.root") + s"/$t"
      val vTagged = graft.sources.ManifestV2Sink.tags(out)
        .toMap.apply("audit")
      // post-tag mutations the pinned read must NOT see; the insert's
      // files are later whole-file-dropped, so after expiry they are
      // referenced by NO retained snapshot — vacuum provably reclaims
      spark.sql(s"INSERT INTO graft.$t SELECT /*+ COALESCE(1) */ " +
        "id * 2 + 1000000000, id FROM range(50)")
      spark.sql(s"DELETE FROM graft.$t WHERE o_orderkey >= 1000000000")
      spark.sql(s"CALL graft.system.expire_snapshots('$t', 1)").collect()
      val reclaimedN = spark.sql(s"CALL graft.system.vacuum('$t')").count()
      val tagSurvived = graft.sources.ManifestV2Sink.versions(out)
        .contains(vTagged)
      spark.sql(s"SELECT o_orderkey % 4 AS g, count(*) AS n, " +
        "sum(cents) AS sum_cents " +
        s"FROM graft.$t VERSION AS OF 'audit' GROUP BY o_orderkey % 4")
        .select(col("*"),
          lit(if (tagSurvived) 1L else 0L).as("tag_survived"),
          lit(if (reclaimedN > 0) 1L else 0L).as("reclaimed"))
        .localCheckpoint(true)
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  val sinkManifestTagSql: String =
    """WITH s AS (
      |  SELECT o_orderkey,
      |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders WHERE o_orderkey % 19 = 7)
      |SELECT o_orderkey % 4 AS g, COUNT(*) AS n,
      |  CAST(SUM(cents) AS BIGINT) AS sum_cents,
      |  CAST(1 AS BIGINT) AS tag_survived,
      |  CAST(1 AS BIGINT) AS reclaimed
      |FROM s GROUP BY o_orderkey % 4""".stripMargin

  /** CHANGE FEED under the oracle gate: replay an insert → DV-delete
    * → MERGE → compact history through `graft_table_changes` and pin
    * the EXACT per-commit delta multiset against DuckDB's closed
    * form. The insert commit emits its slice; the deletion-vector
    * commit emits exactly the newly-dead keys; the MERGE (stats-
    * narrowed copy-on-write) emits the rewritten file's pre-image as
    * deletes and post-image as inserts (the CDC encoding of an
    * update); the compaction emits NOTHING (kind=rewrite in the
    * commit log) — the property that makes a change feed usable on a
    * 100 TB table that compacts nightly.
    */
  def sinkManifestCdf(spark: SparkSession, dir: String): DataFrame = {
    val t = s"cdf_${java.util.UUID.randomUUID().toString.take(8)}"
    try {
      spark.sql(s"CREATE TABLE graft.$t (k BIGINT, cents BIGINT)") // v1
      table(spark, dir, "orders").where(col("o_orderkey") % 13 === 7)
        .select(col("o_orderkey").as("k"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
        .createOrReplaceTempView(s"${t}_src")
      spark.sql(s"INSERT INTO graft.$t SELECT /*+ COALESCE(1) */ * " +
        s"FROM ${t}_src") // v2
      val minKey = spark.sql(s"SELECT min(k) FROM graft.$t")
        .head.getLong(0)
      spark.sql(s"DELETE FROM graft.$t WHERE k >= $minKey " +
        s"AND k < ${minKey + 40}") // v3: the DV tier
      spark.sql(
        s"""MERGE INTO graft.$t tgt
           |USING (SELECT k, cents * 2 AS cents FROM ${t}_src
           |       WHERE k % 2 = 0) src
           |ON tgt.k = src.k
           |WHEN MATCHED THEN UPDATE SET cents = src.cents
           |""".stripMargin) // v4: COW rewrite
      val out = spark.conf.get("spark.sql.catalog.graft.root") + s"/$t"
      graft.sources.ManifestV2Sink.compact(spark, out, 1) // v5: silent
      val head = graft.sources.ManifestV2Sink.versions(out).max
      spark.sql(
        s"""SELECT _commit_version AS v, _change_type AS ct,
           |  count(*) AS n, sum(k) AS sum_k, sum(cents) AS sum_cents
           |FROM graft_table_changes('$t', 0, $head)
           |GROUP BY 1, 2""".stripMargin)
        .localCheckpoint(true) // eager: the finally drops the table
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  val sinkManifestCdfSql: String =
    """WITH s AS (
      |  SELECT o_orderkey AS k,
      |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders WHERE o_orderkey % 13 = 7),
      |mn AS (SELECT MIN(k) AS m FROM s),
      |dead AS (SELECT k, cents FROM s, mn
      |         WHERE k >= m AND k < m + 40),
      |live3 AS (SELECT k, cents FROM s
      |          WHERE k NOT IN (SELECT k FROM dead)),
      |post AS (SELECT k, CASE WHEN k % 2 = 0 THEN cents * 2
      |                        ELSE cents END AS cents FROM live3)
      |SELECT CAST(2 AS BIGINT) AS v, 'insert' AS ct,
      |  COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS sum_k,
      |  CAST(SUM(cents) AS BIGINT) AS sum_cents
      |FROM s
      |UNION ALL
      |SELECT 3, 'delete', COUNT(*), CAST(SUM(k) AS BIGINT),
      |  CAST(SUM(cents) AS BIGINT) FROM dead
      |UNION ALL
      |SELECT 4, 'delete', COUNT(*), CAST(SUM(k) AS BIGINT),
      |  CAST(SUM(cents) AS BIGINT) FROM live3
      |UNION ALL
      |SELECT 4, 'insert', COUNT(*), CAST(SUM(k) AS BIGINT),
      |  CAST(SUM(cents) AS BIGINT) FROM post""".stripMargin

  /** STREAMING INGEST into the transactional sink under the oracle
    * gate — the production shape of the reference's ingestion API
    * (app.js:106-155): a 4-file staged copy of an orders slice is
    * consumed as an AvailableNow file stream with maxFilesPerTrigger=1
    * (4 deterministic micro-batches), `writeStream.format("graft-
    * manifest")` lands each epoch as ONE committed, snapshotted table
    * version via the txn-ledger streaming write
    * ([[graft.sources.ManifestStreamingWrite]]), and the committed
    * table is read back through the normal scan. Gated BOTH ways: the
    * aggregates must equal the batch slice exactly (any replayed or
    * lost epoch diverges counts/sums — the exactly-once contract),
    * and `n_versions`/`n_epochs` pin that each micro-batch minted
    * exactly one commit and the ledger recorded every epoch.
    */
  def sinkManifestStreamWrite(spark: SparkSession,
      dir: String): DataFrame = {
    val outPath = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      s"graft_swrite_${java.util.UUID.randomUUID().toString.take(8)}")
    val fs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val base = outPath.toUri.getPath
    try {
      val src = table(spark, dir, "orders")
        .where(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey"), col("o_orderpriority"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
      src.repartition(4).write.parquet(s"$base/in")
      val q = spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$base/in")
        .writeStream.format("graft-manifest")
        .option("checkpointLocation", s"$base/cp")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start(s"$base/t")
      q.awaitTermination()
      val nVersions =
        graft.sources.ManifestV2Sink.versions(s"$base/t").size.toLong
      val nEpochs = graft.sources.ManifestV2Sink.streamTxns(s"$base/t")
        .values.maxOption.map(_ + 1).getOrElse(0L)
      spark.read.format("graft-manifest").load(s"$base/t")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"),
          sum(col("o_orderkey")).as("sum_keys"))
        .select(col("o_orderpriority"), col("n"), col("sum_cents"),
          col("sum_keys"), lit(nVersions).as("n_versions"),
          lit(nEpochs).as("n_epochs"))
        .localCheckpoint(true) // eager: the finally deletes the table
    } finally fs.delete(outPath, true)
  }

  val sinkManifestStreamWriteSql: String =
    """SELECT o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |    AS sum_cents,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
      |  CAST(4 AS BIGINT) AS n_versions,
      |  CAST(4 AS BIGINT) AS n_epochs
      |FROM orders WHERE o_orderkey % 7 = 0
      |GROUP BY o_orderpriority""".stripMargin

  /** RUNTIME FILE PRUNING (DSv2 dynamic partition pruning) under the
    * oracle gate: the fact side lands one manifest data file per
    * order-year (tight per-file `yr` stats), the dim side is a
    * calendar-bounded year dimension with a selective `tag = 'hot'`
    * predicate, and the join key `yr` is a declared runtime-filter
    * attribute of the manifest scan ([[graft.sources.ManifestScan]]).
    * Executing the join makes Spark plant a dynamic-pruning subquery;
    * after the broadcast dim runs, the fact scan RE-PLANS to only the
    * files whose recorded ranges can hold the surviving keys — the
    * single biggest read saver of a 100-TB star join. BOTH directions
    * hash-gated: `files_read`/`files_total` (read back from the
    * planner's post-execution record) equal the oracle's
    * COUNT(DISTINCT yr) twins, so a scan that stops pruning diverges
    * the counts and one that over-prunes loses aggregate rows.
    */
  def sinkManifestRuntimePrune(spark: SparkSession,
      dir: String): DataFrame = {
    val outPath = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      s"graft_rtprune_${java.util.UUID.randomUUID().toString.take(8)}")
    val fs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = outPath.toUri.getPath + "/fact"
    val dimOut = outPath.toUri.getPath + "/dim"
    try {
      val src = table(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"),
          year(col("o_orderdate")).cast("long").as("yr"))
      val years = src.select(col("yr")).distinct().orderBy(col("yr"))
        .collect().map(_.getLong(0)) // calendar-bounded, never data-sized
      years.foreach { y =>
        src.where(col("yr") === y).coalesce(1)
          .write.format("graft-manifest").mode("append").save(out)
      }
      val hot = Set(1996L, 1997L)
      // the dim is a SECOND manifest table, not a LocalRelation: the
      // optimizer folds a filtered LocalRelation into literal rows
      // (no Filter node survives), and without a selective predicate
      // on the filtering side Spark never plants the pruning subquery
      spark.createDataFrame(
        years.map(y => (y, if (hot(y)) "hot" else "cold")).toSeq)
        .toDF("yr", "tag").coalesce(1)
        .write.format("graft-manifest").mode("append").save(dimOut)
      val dim = spark.read.format("graft-manifest").load(dimOut)
      val fact = spark.read.format("graft-manifest").load(out)
      val agg = fact
        .join(dim.where(col("tag") === "hot"), Seq("yr"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"),
          sum(col("o_orderkey")).as("sum_keys"))
        .localCheckpoint(true) // EXECUTES the join → runtime filter fires
      val (filesRead, filesTotal) = graft.sources.ManifestV2Sink
        .lastPlannedFiles(out).getOrElse((-1, -1))
      agg.select(col("o_orderpriority"), col("n"), col("sum_cents"),
        col("sum_keys"),
        lit(filesRead.toLong).as("files_read"),
        lit(filesTotal.toLong).as("files_total"))
        .localCheckpoint(true) // eager: the finally deletes the table
    } finally fs.delete(outPath, true)
  }

  val sinkManifestRuntimePruneSql: String =
    """WITH s AS (
      |  SELECT o_orderkey, o_orderpriority,
      |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
      |    year(o_orderdate) AS yr
      |  FROM orders)
      |SELECT o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(cents) AS BIGINT) AS sum_cents,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
      |  (SELECT COUNT(DISTINCT yr) FROM s
      |     WHERE yr IN (1996, 1997)) AS files_read,
      |  (SELECT COUNT(DISTINCT yr) FROM s) AS files_total
      |FROM s WHERE yr IN (1996, 1997)
      |GROUP BY o_orderpriority""".stripMargin

  val sinkManifestPruneSql: String =
    """WITH s AS (
      |  SELECT o_orderkey, o_orderpriority,
      |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
      |    year(o_orderdate) AS yr
      |  FROM orders)
      |SELECT o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(cents) AS BIGINT) AS sum_cents,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
      |  (SELECT COUNT(DISTINCT yr) FROM s
      |     WHERE yr BETWEEN 1996 AND 1997) AS files_read,
      |  (SELECT COUNT(DISTINCT yr) FROM s) AS files_total
      |FROM s WHERE yr BETWEEN 1996 AND 1997
      |GROUP BY o_orderpriority""".stripMargin

  /** TYPED COLUMNS through the transactional sink under the oracle
    * gate: TPC-H orders lands in a `graft` CATALOG table with native
    * DATE and DECIMAL(12,2) columns (the columns every real first
    * table has — r12's primitives-only gap), committed one file per
    * order-year so each file's manifest entry records tight
    * DATE-column day stats, then read back through the SQL scan with
    * a pushed two-year date-range predicate. BOTH directions gated:
    * the `files_read`/`files_total` columns equal the PLANNED scan
    * partition count vs the committed file count — so if the pushed
    * filter stops pruning files via the recorded date stats
    * ([[graft.sources.ManifestSkipping]]) the counts diverge, and if
    * pruning over-skips the aggregates lose rows. The decimal rides
    * as exact cents/100, so the sum re-multiplied is integral on both
    * engines; min/max date strings pin the DATE round-trip through
    * the parquet payload.
    */
  def sinkManifestTyped(spark: SparkSession, dir: String): DataFrame = {
    val t = s"typed_${java.util.UUID.randomUUID().toString.take(8)}"
    val root = spark.conf.get("spark.sql.catalog.graft.root")
    val out = s"$root/$t"
    try {
      spark.sql(s"CREATE TABLE graft.$t (o_orderkey BIGINT, " +
        "o_orderstatus STRING, price DECIMAL(12,2), od DATE)")
      val src = table(spark, dir, "orders")
        .where(col("o_orderkey") % 11 === 0)
        .select(col("o_orderkey"), col("o_orderstatus"),
          // exact decimal from integral cents — engine-identical
          (floor(col("o_totalprice") * 100).cast("long")
            .cast(org.apache.spark.sql.types.DecimalType(14, 2)) / 100)
            .cast(org.apache.spark.sql.types.DecimalType(12, 2))
            .as("price"),
          col("o_orderdate").cast("date").as("od"),
          year(col("o_orderdate")).as("yr"))
      val years = src.select(col("yr")).distinct().orderBy(col("yr"))
        .collect().map(_.getInt(0)) // calendar-bounded, never data-sized
      years.foreach { y =>
        src.where(col("yr") === y).drop("yr").coalesce(1)
          .write.format("graft-manifest").mode("append").save(out)
      }
      val filesTotal = graft.sources.ManifestV2Sink.committedFileCount(out)
      val window = "od >= DATE'1996-01-01' AND od < DATE'1998-01-01'"
      // planned partitions = files surviving manifest-level skipping
      // on the pushed date predicate (one partition per kept file)
      val filesRead = spark.sql(
        s"SELECT od FROM graft.$t WHERE $window").rdd.getNumPartitions
      spark.sql(
        s"""SELECT o_orderstatus, COUNT(*) AS n,
           |  CAST(SUM(price) * 100 AS BIGINT) AS sum_cents,
           |  CAST(MIN(od) AS STRING) AS od_min,
           |  CAST(MAX(od) AS STRING) AS od_max
           |FROM graft.$t WHERE $window
           |GROUP BY o_orderstatus""".stripMargin)
        .select(col("o_orderstatus"), col("n"), col("sum_cents"),
          col("od_min"), col("od_max"),
          lit(filesRead.toLong).as("files_read"),
          lit(filesTotal.toLong).as("files_total"))
        .localCheckpoint(true) // eager: the finally drops the table
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  val sinkManifestTypedSql: String =
    """WITH s AS (
      |  SELECT o_orderkey, o_orderstatus,
      |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
      |    CAST(o_orderdate AS DATE) AS od,
      |    year(o_orderdate) AS yr
      |  FROM orders WHERE o_orderkey % 11 = 0)
      |SELECT o_orderstatus, COUNT(*) AS n,
      |  CAST(SUM(cents) AS BIGINT) AS sum_cents,
      |  CAST(MIN(od) AS STRING) AS od_min,
      |  CAST(MAX(od) AS STRING) AS od_max,
      |  (SELECT COUNT(DISTINCT yr) FROM s
      |     WHERE od >= DATE '1996-01-01' AND od < DATE '1998-01-01')
      |    AS files_read,
      |  (SELECT COUNT(DISTINCT yr) FROM s) AS files_total
      |FROM s WHERE od >= DATE '1996-01-01' AND od < DATE '1998-01-01'
      |GROUP BY o_orderstatus""".stripMargin

  /** Shared fixture for the predicate-DELETE / narrowed-UPDATE gates:
    * an orders slice landed in a `graft` catalog table with a DATE
    * column, ONE data file per order-year (tight per-file day stats +
    * recorded zero null counts — the metadata the file-narrowed plans
    * read). Returns the table name; caller drops it.
    */
  private def perYearTable(spark: SparkSession, dir: String,
      tag: String, mod: Int): String = {
    val t = s"${tag}_${java.util.UUID.randomUUID().toString.take(8)}"
    spark.sql(s"CREATE TABLE graft.$t (o_orderkey BIGINT, " +
      "o_orderstatus STRING, cents BIGINT, od DATE)")
    val out = spark.conf.get("spark.sql.catalog.graft.root") + s"/$t"
    val src = table(spark, dir, "orders")
      .where(col("o_orderkey") % 13 === mod)
      .select(col("o_orderkey"), col("o_orderstatus"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"),
        col("o_orderdate").cast("date").as("od"),
        year(col("o_orderdate")).as("yr"))
    val years = src.select(col("yr")).distinct().orderBy(col("yr"))
      .collect().map(_.getInt(0)) // calendar-bounded, never data-sized
    years.foreach { y =>
      src.where(col("yr") === y).drop("yr").coalesce(1)
        .write.format("graft-manifest").mode("append").save(out)
    }
    t
  }

  /** PREDICATE SQL DELETE under the oracle gate — `DELETE FROM t
    * WHERE od < cutoff`, the retention cut r12 refused (and the
    * lifecycle queries worked around with driver-collected IN
    * lists): the file-narrowed copy-on-write
    * ([[graft.sources.ManifestV2Sink.deleteWhere]]) DROPS the years
    * provably inside the cutoff as pure metadata (stats containment +
    * recorded zero null counts — no bytes read), REWRITES only the
    * boundary year without its matching rows, and carries everything
    * else over untouched. All three tiers are pinned in-band against
    * oracle twins: `files_kept` (years above the boundary, carried as
    * raw entries), `files_new` (1 iff the boundary year has survivor
    * rows — the one rewritten file), `files_removed` (years at or
    * below the boundary: dropped wholes + the rewrite source). On a
    * time-clustered 100-TB table this is O(boundary), not O(table).
    */
  def sinkManifestSqlDeletePred(spark: SparkSession,
      dir: String): DataFrame = {
    val t = perYearTable(spark, dir, "delpred", 5)
    val out = spark.conf.get("spark.sql.catalog.graft.root") + s"/$t"
    try {
      val before =
        graft.sources.ManifestV2Sink.committedDataFiles(out).toSet
      spark.sql(s"DELETE FROM graft.$t WHERE od < DATE'1995-07-01'")
      val after =
        graft.sources.ManifestV2Sink.committedDataFiles(out).toSet
      spark.sql(
        s"""SELECT o_orderstatus, COUNT(*) AS n,
           |  CAST(SUM(cents) AS BIGINT) AS sum_cents,
           |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
           |  CAST(MIN(od) AS STRING) AS od_min
           |FROM graft.$t GROUP BY o_orderstatus""".stripMargin)
        .select(col("*"),
          lit((before & after).size.toLong).as("files_kept"),
          lit((after -- before).size.toLong).as("files_new"),
          lit((before -- after).size.toLong).as("files_removed"))
        .localCheckpoint(true) // eager: the finally drops the table
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  val sinkManifestSqlDeletePredSql: String =
    """WITH s AS (
      |  SELECT o_orderkey, o_orderstatus,
      |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
      |    CAST(o_orderdate AS DATE) AS od,
      |    year(o_orderdate) AS yr
      |  FROM orders WHERE o_orderkey % 13 = 5)
      |SELECT o_orderstatus, COUNT(*) AS n,
      |  CAST(SUM(cents) AS BIGINT) AS sum_cents,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
      |  CAST(MIN(od) AS STRING) AS od_min,
      |  (SELECT COUNT(DISTINCT yr) FROM s WHERE yr > 1995) AS files_kept,
      |  (SELECT CAST(CASE WHEN EXISTS (SELECT 1 FROM s
      |     WHERE yr = 1995 AND od >= DATE '1995-07-01') THEN 1 ELSE 0
      |     END AS BIGINT)) AS files_new,
      |  (SELECT COUNT(DISTINCT yr) FROM s WHERE yr <= 1995)
      |    AS files_removed
      |FROM s WHERE od >= DATE '1995-07-01'
      |GROUP BY o_orderstatus""".stripMargin

  /** STATS-NARROWED SQL UPDATE under the oracle gate — `UPDATE t SET
    * cents = cents + 7 WHERE od >= boundary` plans against the same
    * per-file date stats: years before the boundary CARRY OVER as raw
    * manifest entries (`files_carried`, zero bytes moved) and only
    * the boundary-and-later years rewrite (`files_new` — one output
    * file per touched year by construction). r12's UPDATE was an
    * honest whole-table COW; this is the [[graft.sources
    * .ManifestV2Sink.upsertNarrow]] treatment applied to SQL UPDATE,
    * so a one-day touch-up of a 100-TB time-clustered table rewrites
    * one file. The post-update aggregate is the oracle's CASE twin,
    * so a lost carry-over file, double-applied update, or mis-skipped
    * year all diverge the hash.
    */
  def sinkManifestSqlUpdateNarrow(spark: SparkSession,
      dir: String): DataFrame = {
    val t = perYearTable(spark, dir, "updnarrow", 6)
    val out = spark.conf.get("spark.sql.catalog.graft.root") + s"/$t"
    try {
      val before =
        graft.sources.ManifestV2Sink.committedDataFiles(out).toSet
      spark.sql(s"UPDATE graft.$t SET cents = cents + 7 " +
        "WHERE od >= DATE'1997-01-01'")
      val after =
        graft.sources.ManifestV2Sink.committedDataFiles(out).toSet
      spark.sql(
        s"""SELECT o_orderstatus, COUNT(*) AS n,
           |  CAST(SUM(cents) AS BIGINT) AS sum_cents,
           |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys
           |FROM graft.$t GROUP BY o_orderstatus""".stripMargin)
        .select(col("*"),
          lit((before & after).size.toLong).as("files_carried"),
          lit((after -- before).size.toLong).as("files_new"))
        .localCheckpoint(true) // eager: the finally drops the table
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  val sinkManifestSqlUpdateNarrowSql: String =
    """WITH s AS (
      |  SELECT o_orderkey, o_orderstatus,
      |    CASE WHEN CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
      |      THEN CAST(floor(o_totalprice * 100) AS BIGINT) + 7
      |      ELSE CAST(floor(o_totalprice * 100) AS BIGINT) END AS cents,
      |    year(o_orderdate) AS yr
      |  FROM orders WHERE o_orderkey % 13 = 6)
      |SELECT o_orderstatus, COUNT(*) AS n,
      |  CAST(SUM(cents) AS BIGINT) AS sum_cents,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
      |  (SELECT COUNT(DISTINCT yr) FROM s WHERE yr < 1997)
      |    AS files_carried,
      |  (SELECT COUNT(DISTINCT yr) FROM s WHERE yr >= 1997) AS files_new
      |FROM s GROUP BY o_orderstatus""".stripMargin

  /** SQL `PARTITIONED BY` under the oracle gate — the DDL half of the
    * partition story (`sink_manifest_partition` gates the DataFrame
    * option path): a catalog table DECLARES its identity partition
    * column at CREATE, every INSERT fans out one file per partition
    * value (no per-write option — the sidecar spec governs), each
    * file's manifest entry records its value, and a partition-equality
    * SQL read plans ONLY that partition's files
    * ([[graft.sources.ManifestSkipping]] consults the recorded
    * values before any stats). `files_read`/`files_total` pin both
    * directions against the oracle's distinct-year counts: reading
    * too many files diverges the counts, over-pruning loses rows.
    */
  def sinkManifestPartitionDdl(spark: SparkSession,
      dir: String): DataFrame = {
    val t = s"pddl_${java.util.UUID.randomUUID().toString.take(8)}"
    val out = spark.conf.get("spark.sql.catalog.graft.root") + s"/$t"
    try {
      spark.sql(s"CREATE TABLE graft.$t (o_orderkey BIGINT, " +
        "cents BIGINT, yr BIGINT) PARTITIONED BY (yr)")
      table(spark, dir, "orders")
        .where(col("o_orderkey") % 19 === 0)
        .select(col("o_orderkey"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"),
          year(col("o_orderdate")).cast("long").as("yr"))
        // repartition by the partition column so each task fans out
        // to ~1 sink (the writer stays correct either way)
        .repartition(col("yr"))
        .write.format("graft-manifest").mode("append").save(out)
      val filesTotal = graft.sources.ManifestV2Sink.committedFileCount(out)
      val filesRead = spark.sql(
        s"SELECT cents FROM graft.$t WHERE yr = 1997").rdd.getNumPartitions
      spark.sql(
        s"""SELECT COUNT(*) AS n,
           |  CAST(SUM(cents) AS BIGINT) AS sum_cents,
           |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys
           |FROM graft.$t WHERE yr = 1997""".stripMargin)
        .select(col("*"),
          lit(filesRead.toLong).as("files_read"),
          lit(filesTotal.toLong).as("files_total"))
        .localCheckpoint(true) // eager: the finally drops the table
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  val sinkManifestPartitionDdlSql: String =
    """WITH s AS (
      |  SELECT o_orderkey,
      |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
      |    year(o_orderdate) AS yr
      |  FROM orders WHERE o_orderkey % 19 = 0)
      |SELECT COUNT(*) AS n,
      |  CAST(SUM(cents) AS BIGINT) AS sum_cents,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
      |  (SELECT COUNT(DISTINCT yr) FROM s WHERE yr = 1997)
      |    AS files_read,
      |  (SELECT COUNT(DISTINCT yr) FROM s) AS files_total
      |FROM s WHERE yr = 1997""".stripMargin

  /** CDC-APPLY as ONE SQL MERGE under the oracle gate — the general
    * shape r12 refused at analysis (`events_cdc_apply`'s semantics,
    * now through the SQL front door): one change batch carrying
    * deletes, updates, and inserts applies in a single `MERGE INTO`
    * with a conditional DELETE action, a partial-SET UPDATE action
    * (first-true-wins, ANSI order), and a conditional INSERT — one
    * atomic commit (`merge_commits` pinned in-band), pre-merge state
    * still time-travelable (spec-pinned). The oracle twin recomputes
    * the post-apply table with the equivalent join/anti-join algebra,
    * so a mis-ordered action, leaked delete, or double-applied update
    * diverges the hash.
    */
  def sinkManifestSqlMergeCdc(spark: SparkSession,
      dir: String): DataFrame = {
    val t = s"cdc_${java.util.UUID.randomUUID().toString.take(8)}"
    val view = s"cdc_chg_$t"
    val out = spark.conf.get("spark.sql.catalog.graft.root") + s"/$t"
    try {
      spark.sql(s"CREATE TABLE graft.$t (o_orderkey BIGINT, " +
        "cents BIGINT, o_orderstatus STRING)")
      val src = table(spark, dir, "orders")
        .select(col("o_orderkey"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"),
          col("o_orderstatus"))
      src.where(col("o_orderkey") % 17 === 0)
        .write.format("graft-manifest").mode("append").save(out)
      // the change batch: matched keys carry D/U ops, unmatched D/I
      src.where(col("o_orderkey") % 17 isin (0L, 3L))
        .select(col("o_orderkey"),
          when(col("o_orderkey") % 5 === 0, "D")
            .when(col("o_orderkey") % 17 === 0, "U")
            .otherwise("I").as("op"),
          (col("cents") + 1000L).as("nv"))
        .createOrReplaceTempView(view)
      val vBefore = graft.sources.ManifestV2Sink.versions(out).max
      spark.sql(
        s"""MERGE INTO graft.$t tgt
           |USING $view src
           |ON tgt.o_orderkey = src.o_orderkey
           |WHEN MATCHED AND src.op = 'D' THEN DELETE
           |WHEN MATCHED THEN UPDATE SET cents = src.nv
           |WHEN NOT MATCHED AND src.op = 'I' THEN
           |  INSERT (o_orderkey, cents, o_orderstatus)
           |  VALUES (src.o_orderkey, src.nv, 'NEW')""".stripMargin)
      val commits = graft.sources.ManifestV2Sink.versions(out).max - vBefore
      spark.sql(
        s"""SELECT o_orderstatus, COUNT(*) AS n,
           |  CAST(SUM(cents) AS BIGINT) AS sum_cents,
           |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys
           |FROM graft.$t GROUP BY o_orderstatus""".stripMargin)
        .select(col("*"), lit(commits.toLong).as("merge_commits"))
        .localCheckpoint(true) // eager: the finally drops the table
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS graft.$t")
      spark.catalog.dropTempView(view)
      ()
    }
  }

  val sinkManifestSqlMergeCdcSql: String =
    """WITH base AS (
      |  SELECT o_orderkey, CAST(floor(o_totalprice * 100) AS BIGINT)
      |    AS cents, o_orderstatus
      |  FROM orders WHERE o_orderkey % 17 = 0),
      |chg AS (
      |  SELECT o_orderkey,
      |    CASE WHEN o_orderkey % 5 = 0 THEN 'D'
      |         WHEN o_orderkey % 17 = 0 THEN 'U' ELSE 'I' END AS op,
      |    CAST(floor(o_totalprice * 100) AS BIGINT) + 1000 AS nv
      |  FROM orders WHERE o_orderkey % 17 IN (0, 3)),
      |merged AS (
      |  SELECT b.o_orderkey,
      |    CASE WHEN c.op = 'U' THEN c.nv ELSE b.cents END AS cents,
      |    b.o_orderstatus
      |  FROM base b LEFT JOIN chg c ON b.o_orderkey = c.o_orderkey
      |  WHERE c.op IS NULL OR c.op <> 'D'
      |  UNION ALL
      |  SELECT c.o_orderkey, c.nv, 'NEW'
      |  FROM chg c
      |  WHERE c.op = 'I' AND NOT EXISTS (
      |    SELECT 1 FROM base b WHERE b.o_orderkey = c.o_orderkey))
      |SELECT o_orderstatus, COUNT(*) AS n,
      |  CAST(SUM(cents) AS BIGINT) AS sum_cents,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
      |  CAST(1 AS BIGINT) AS merge_commits
      |FROM merged GROUP BY o_orderstatus""".stripMargin

  /** MERGE-ON-READ DELETE under the oracle gate — the 100-TB shape
    * copy-on-write cannot afford: deleting 1-in-5 keys of a committed
    * table lands TOMBSTONE files ([[graft.sources.ManifestV2Sink
    * .delete]]), rewriting ZERO data files (`files_rewritten` is
    * in-band and the oracle pins it to 0), and every read reconciles
    * by anti join. The oracle recomputes the reconciled aggregate
    * from the slice + delete predicates, so a tombstone that leaks
    * rows back, over-deletes, or misses a file diverges the hash;
    * ManifestSinkSpec separately pins COW equivalence, time travel to
    * the pre-delete snapshot, and compaction materializing the
    * reconcile.
    */
  def sinkManifestMor(spark: SparkSession, dir: String): DataFrame = {
    val outPath = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      s"graft_mor_${java.util.UUID.randomUUID().toString.take(8)}")
    val fs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = outPath.toUri.getPath // scheme-less for the nio sink side
    try {
      val src = table(spark, dir, "orders")
        .where(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey"), col("o_orderpriority"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
      src.coalesce(4).write.format("graft-manifest").mode("append").save(out)
      val filesBefore = graft.sources.ManifestV2Sink.committedFileCount(out)
      graft.sources.ManifestV2Sink.delete(spark, out, "o_orderkey",
        src.where(col("o_orderkey") % 35 === 0).select(col("o_orderkey")))
      val filesAfter = graft.sources.ManifestV2Sink.committedFileCount(out)
      val tombstones =
        graft.sources.ManifestV2Sink.committedDeleteFileCount(out)
      graft.sources.ManifestV2Sink.readCommitted(spark, out)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"),
          sum(col("o_orderkey")).as("sum_keys"))
        .select(col("o_orderpriority"), col("n"), col("sum_cents"),
          col("sum_keys"),
          lit((filesAfter - filesBefore).toLong).as("files_rewritten"),
          lit(if (tombstones > 0) 1L else 0L).as("has_tombstones"))
        .localCheckpoint(true) // eager: the finally deletes the table
    } finally fs.delete(outPath, true)
  }

  val sinkManifestMorSql: String =
    """WITH s AS (
      |  SELECT o_orderkey, o_orderpriority,
      |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders WHERE o_orderkey % 7 = 0)
      |SELECT o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(cents) AS BIGINT) AS sum_cents,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
      |  CAST(0 AS BIGINT) AS files_rewritten,
      |  CAST(1 AS BIGINT) AS has_tombstones
      |FROM s WHERE NOT (o_orderkey % 35 = 0)
      |GROUP BY o_orderpriority""".stripMargin

  /** OPTIMIZE ZORDER BY under the oracle gate — multi-dimensional data
    * skipping the linear layouts can't give: orders land as 16
    * hash-distributed files (every file's o_custkey AND o_orderkey
    * stats span the full range — the "sorted by nothing" baseline a
    * real ingest produces), then [[graft.sources.ManifestV2Sink
    * .compactZOrder]] rewrites them clustered by the 4-bit Morton cell
    * of (o_custkey, o_orderkey) in ONE atomic commit. A quarter×quarter
    * box query then shows the whole story in-band, every count pinned
    * by construction and hash-gated: 16 files before pruning, 16 still
    * read under the linear layout (all stats straddle the box), 4
    * under single-column pruning of the z-layout (one x-quarter =
    * four y-cells), and exactly 1 under conjunctive
    * [[graft.sources.ManifestV2Sink.readPrunedMulti]] box pruning —
    * the 1-file-instead-of-a-stripe read that makes 2-D slice queries
    * on a 100-TB table metadata-bounded. The aggregate itself rides
    * the pruned read with the exact box predicate as residual, so
    * skipping a file that held box rows diverges the hash.
    *
    * Quarter boundaries use the SAME exact integer quantization as
    * the Morton cells (`((v - lo) * 4) div span`), so box edges align
    * with cell edges and the expected file counts are exact, not
    * probabilistic.
    */
  def sinkManifestZorder(spark: SparkSession, dir: String): DataFrame = {
    val outPath = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      s"graft_zorder_${java.util.UUID.randomUUID().toString.take(8)}")
    val fs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = outPath.toUri.getPath // scheme-less for the nio sink side
    try {
      val src = table(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
      src.repartition(16, col("o_orderkey"))
        .write.format("graft-manifest").mode("append").save(out)
      val b = src.agg(min(col("o_custkey")), max(col("o_custkey")),
        min(col("o_orderkey")), max(col("o_orderkey"))).head
      val (cLo, cHi, oLo, oHi) =
        (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
      val (cSpan, oSpan) = (cHi - cLo + 1, oHi - oLo + 1)
      // box = custkey quarter 1 × orderkey quarter 2, cell-aligned:
      // value bounds of quarter q are [lo+ceil(q·span/4), lo+ceil((q+1)·span/4)-1]
      def ceilDiv(a: Long, q: Long) = (a + q - 1) / q
      val box = Seq(
        ("o_custkey", cLo + ceilDiv(cSpan, 4), cLo + ceilDiv(2 * cSpan, 4) - 1),
        ("o_orderkey", oLo + ceilDiv(2 * oSpan, 4), oLo + ceilDiv(3 * oSpan, 4) - 1))
      val filesTotal = graft.sources.ManifestV2Sink.committedFileCount(out)
      val filesLinear =
        graft.sources.ManifestV2Sink.prunedDataFilesMulti(out, box).size
      graft.sources.ManifestV2Sink
        .compactZOrder(spark, out, Seq("o_custkey", "o_orderkey"), bits = 2)
      val filesZCust = graft.sources.ManifestV2Sink
        .prunedDataFiles(out, "o_custkey", box.head._2, box.head._3).size
      val filesZBox =
        graft.sources.ManifestV2Sink.prunedDataFilesMulti(out, box).size
      graft.sources.ManifestV2Sink.readPrunedMulti(spark, out, box)
        // exact residual predicate, in the same integer-cell arithmetic
        .where(expr(s"((o_custkey - ${cLo}L) * 4) div ${cSpan}L = 1") &&
          expr(s"((o_orderkey - ${oLo}L) * 4) div ${oSpan}L = 2"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"),
          sum(col("o_orderkey")).as("sum_keys"))
        .select(col("o_orderpriority"), col("n"), col("sum_cents"),
          col("sum_keys"),
          lit(filesTotal.toLong).as("files_total"),
          lit(filesLinear.toLong).as("files_linear"),
          lit(filesZCust.toLong).as("files_z_custkey"),
          lit(filesZBox.toLong).as("files_z_box"))
        .localCheckpoint(true) // eager: the finally deletes the table
    } finally fs.delete(outPath, true)
  }

  val sinkManifestZorderSql: String =
    """WITH s AS (
      |  SELECT o_orderkey, o_custkey, o_orderpriority,
      |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders),
      |b AS (
      |  SELECT min(o_custkey) AS clo, max(o_custkey) - min(o_custkey) + 1
      |    AS cspan, min(o_orderkey) AS olo,
      |    max(o_orderkey) - min(o_orderkey) + 1 AS ospan FROM s)
      |SELECT o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(cents) AS BIGINT) AS sum_cents,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
      |  CAST(16 AS BIGINT) AS files_total,
      |  CAST(16 AS BIGINT) AS files_linear,
      |  CAST(4 AS BIGINT) AS files_z_custkey,
      |  CAST(1 AS BIGINT) AS files_z_box
      |FROM s, b
      |WHERE ((o_custkey - clo) * 4) // cspan = 1
      |  AND ((o_orderkey - olo) * 4) // ospan = 2
      |GROUP BY o_orderpriority""".stripMargin

  /** STATS-NARROWED COPY-ON-WRITE MERGE under the oracle gate — the
    * file-level rewrite planning [[sinkManifestUpsert]]'s full COW
    * deliberately skips: orders land as 8 key-range-sliced files
    * (disjoint per-file o_orderkey stats, the layout any time- or
    * key-partitioned ingest produces), then an update targeting keys
    * inside ONE slice goes through [[graft.sources.ManifestV2Sink
    * .upsertNarrow]], which plans against the manifest's per-file key
    * ranges and rewrites exactly that one file — `files_rewritten` is
    * in-band and the oracle pins it to 1, with the post-merge file
    * count still 8 (7 untouched entries carried over as pure
    * metadata). The final aggregate recomputes every updated cent from
    * the slice + update predicates, so a lost update, a leaked stale
    * row, or an over-wide rewrite diverges the hash. At 100 TB this is
    * "update one day's partition = rewrite one day's files", not the
    * table.
    */
  def sinkManifestUpsertNarrow(spark: SparkSession, dir: String): DataFrame = {
    val outPath = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      s"graft_narrow_${java.util.UUID.randomUUID().toString.take(8)}")
    val fs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = outPath.toUri.getPath // scheme-less for the nio sink side
    try {
      val src = table(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
      val b = src.agg(min(col("o_orderkey")), max(col("o_orderkey"))).head
      val (oLo, oHi) = (b.getLong(0), b.getLong(1))
      val oSpan = oHi - oLo + 1
      val sliceCol = expr(s"((o_orderkey - ${oLo}L) * 8) div ${oSpan}L")
      // 8 key-range-disjoint files — one commit per slice, like a
      // key-partitioned nightly ingest
      (0L until 8L).foreach { i =>
        src.where(sliceCol === i).coalesce(1)
          .write.format("graft-manifest").mode("append").save(out)
      }
      // the update: slice 5's keys divisible by 3 get +7777 cents
      val updates = src.where(sliceCol === 5 && col("o_orderkey") % 3 === 0)
        .withColumn("cents", col("cents") + 7777L)
      val rewritten = graft.sources.ManifestV2Sink
        .upsertNarrow(spark, out, updates, "o_orderkey")
      val filesAfter = graft.sources.ManifestV2Sink.committedFileCount(out)
      graft.sources.ManifestV2Sink.readCommitted(spark, out)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"),
          sum(col("o_orderkey")).as("sum_keys"))
        .select(col("o_orderpriority"), col("n"), col("sum_cents"),
          col("sum_keys"),
          lit(rewritten.toLong).as("files_rewritten"),
          lit(filesAfter.toLong).as("files_total"))
        .localCheckpoint(true) // eager: the finally deletes the table
    } finally fs.delete(outPath, true)
  }

  val sinkManifestUpsertNarrowSql: String =
    """WITH s AS (
      |  SELECT o_orderkey, o_orderpriority,
      |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders),
      |b AS (
      |  SELECT min(o_orderkey) AS olo,
      |    max(o_orderkey) - min(o_orderkey) + 1 AS ospan FROM s)
      |SELECT o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(CASE WHEN ((o_orderkey - olo) * 8) // ospan = 5
      |    AND o_orderkey % 3 = 0 THEN cents + 7777 ELSE cents END)
      |    AS BIGINT) AS sum_cents,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
      |  CAST(1 AS BIGINT) AS files_rewritten,
      |  CAST(8 AS BIGINT) AS files_total
      |FROM s, b
      |GROUP BY o_orderpriority""".stripMargin

  /** PER-FILE BLOOM-FILTER POINT LOOKUP under the oracle gate — the
    * equality complement of [[sinkManifestPrune]]'s range skipping:
    * orders land as 8 files HASH-DISTRIBUTED on the key (every file's
    * recorded [min, max] spans the whole key range, so min/max stats
    * prune nothing — the layout a keyed ingest naturally produces),
    * written with `.option("bloomColumns", "o_orderkey")` so each
    * file carries a sized Bloom filter (~12 bits/key, ~1% FP). The
    * max-key point lookup then goes through [[graft.sources
    * .ManifestV2Sink.readPrunedEq]]: only files whose Bloom may
    * contain the key are read — `bloom_pruned` pins in-band that the
    * lookup read strictly fewer than all files (the no-false-negative
    * half is pinned by the result row itself: skipping the file that
    * holds the key would lose the row and diverge the hash). At
    * 100 TB this is the difference between a point lookup reading one
    * file and scanning the table when the predicate is equality on a
    * hash-distributed key.
    */
  def sinkManifestBloom(spark: SparkSession, dir: String): DataFrame = {
    val outPath = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      s"graft_bloom_${java.util.UUID.randomUUID().toString.take(8)}")
    val fs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = outPath.toUri.getPath // scheme-less for the nio sink side
    try {
      val src = table(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
      src.repartition(8, col("o_orderkey"))
        .write.format("graft-manifest")
        .option("bloomColumns", "o_orderkey")
        .mode("append").save(out)
      val key = src.agg(max(col("o_orderkey"))).head.getLong(0)
      val filesTotal = graft.sources.ManifestV2Sink.committedFileCount(out)
      val filesRead = graft.sources.ManifestV2Sink
        .prunedDataFilesEq(out, "o_orderkey", key).size
      graft.sources.ManifestV2Sink
        .readPrunedEq(spark, out, "o_orderkey", key)
        .where(col("o_orderkey") === key) // exact residual atop the skip
        .select(col("o_orderkey"), col("o_orderpriority"), col("cents"),
          lit(filesTotal.toLong).as("files_total"),
          lit(if (filesRead < filesTotal) 1L else 0L).as("bloom_pruned"))
        .localCheckpoint(true) // eager: the finally deletes the table
    } finally fs.delete(outPath, true)
  }

  val sinkManifestBloomSql: String =
    """WITH s AS (
      |  SELECT o_orderkey, o_orderpriority,
      |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders)
      |SELECT o_orderkey, o_orderpriority, cents,
      |  CAST(8 AS BIGINT) AS files_total,
      |  CAST(1 AS BIGINT) AS bloom_pruned
      |FROM s WHERE o_orderkey = (SELECT max(o_orderkey) FROM s)""".stripMargin

  /** SCHEMA EVOLUTION on the manifest sink under the oracle gate —
    * metadata-only add-column, the change a year-long ingest makes
    * most often. Three writer generations land with THREE DIFFERENT
    * schemas: gen-1 (o_orderkey, priority, cents), gen-2 ADDS `yr`,
    * gen-3 OMITS `cents` (an old writer still deploying). The commit
    * path merges schemas (prior ∪ incoming, type changes rejected —
    * [[graft.sources.ManifestV2Sink.mergeSchemas]]); no file is ever
    * rewritten — the JSONL data format null-fills absent fields, so
    * evolution costs one manifest line at ANY table size. The read
    * back proves the union semantics: gen-1 rows are the only `yr`
    * NULLs, gen-3 rows the only `cents` NULLs, and the per-priority
    * rollup over all three generations hash-matches the oracle's
    * CASE-built twin. In-band metadata pins the evolution itself:
    * snapshot v1 still reads with 3 columns (time travel keeps each
    * snapshot's own schema) while the current head has 4.
    * ManifestSinkSpec pins the rejection half: re-typing a column
    * fails the commit.
    */
  def sinkManifestSchemaEvo(spark: SparkSession, dir: String): DataFrame = {
    val outPath = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      s"graft_schevo_${java.util.UUID.randomUUID().toString.take(8)}")
    val fs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = outPath.toUri.getPath // scheme-less for the nio sink side
    try {
      val src = table(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"),
          year(col("o_orderdate")).cast("long").as("yr"))
      src.where(col("o_orderkey") % 3 === 0)
        .select(col("o_orderkey"), col("o_orderpriority"), col("cents"))
        .coalesce(2)
        .write.format("graft-manifest").mode("append").save(out)
      src.where(col("o_orderkey") % 3 === 1) // ADDS yr
        .coalesce(2)
        .write.format("graft-manifest").mode("append").save(out)
      src.where(col("o_orderkey") % 3 === 2) // OMITS cents
        .select(col("o_orderkey"), col("o_orderpriority"), col("yr"))
        .coalesce(2)
        .write.format("graft-manifest").mode("append").save(out)
      val v1Cols = graft.sources.ManifestV2Sink
        .readVersion(spark, out, 1).schema.size
      val cur = graft.sources.ManifestV2Sink.readCommitted(spark, out)
      val colsNow = cur.schema.size
      cur.groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(col("cents")).as("sum_cents"),
          sum(when(col("yr").isNull, 1L).otherwise(0L)).as("yr_nulls"),
          sum(when(col("cents").isNull, 1L).otherwise(0L))
            .as("cents_nulls"),
          sum(col("yr")).as("sum_yr"))
        .select(col("o_orderpriority"), col("n"), col("sum_cents"),
          col("yr_nulls"), col("cents_nulls"), col("sum_yr"),
          lit(v1Cols.toLong).as("v1_cols"),
          lit(colsNow.toLong).as("cols_now"))
        .localCheckpoint(true) // eager: the finally deletes the table
    } finally fs.delete(outPath, true)
  }

  val sinkManifestSchemaEvoSql: String =
    """WITH s AS (
      |  SELECT o_orderkey, o_orderpriority,
      |    CASE WHEN o_orderkey % 3 <= 1
      |      THEN CAST(floor(o_totalprice * 100) AS BIGINT) END AS cents,
      |    CASE WHEN o_orderkey % 3 >= 1
      |      THEN CAST(year(o_orderdate) AS BIGINT) END AS yr
      |  FROM orders)
      |SELECT o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(cents) AS BIGINT) AS sum_cents,
      |  CAST(SUM(CASE WHEN yr IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS yr_nulls,
      |  CAST(SUM(CASE WHEN cents IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS cents_nulls,
      |  CAST(SUM(yr) AS BIGINT) AS sum_yr,
      |  CAST(3 AS BIGINT) AS v1_cols,
      |  CAST(4 AS BIGINT) AS cols_now
      |FROM s GROUP BY o_orderpriority""".stripMargin

  /** INCREMENTAL READ off the manifest sink under the oracle gate —
    * the consume-what-arrived path a nightly backfill or a polling
    * stream runs: three append generations land, then a merge-on-read
    * delete; [[graft.sources.ManifestV2Sink.readAppendedSince]] (v1)
    * returns exactly generations 2+3 MINUS the since-deleted keys,
    * reading ONLY the files that arrived after the base snapshot —
    * `files_new` of `files_total` is in-band and pinned by
    * construction (4 of 6), the work-∝-arrivals property that makes
    * incremental consumption of a 100-TB table cost its daily growth,
    * not its size. The oracle recomputes the incremental content from
    * the generation/delete predicates, so a carried-over base row, a
    * leaked deleted row, or a skipped arrival diverges the hash.
    */
  def sinkManifestIncr(spark: SparkSession, dir: String): DataFrame = {
    val outPath = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      s"graft_incr_${java.util.UUID.randomUUID().toString.take(8)}")
    val fs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = outPath.toUri.getPath // scheme-less for the nio sink side
    try {
      val src = table(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
      (0 to 2).foreach { g =>
        // repartition (not coalesce): each generation must land as
        // exactly 2 files at EVERY sf — a single-partition source
        // cannot be coalesced up, and the in-band file counts are
        // pinned by construction
        src.where(col("o_orderkey") % 3 === g)
          .repartition(2, col("o_orderkey"))
          .write.format("graft-manifest").mode("append").save(out)
      }
      graft.sources.ManifestV2Sink.delete(spark, out, "o_orderkey",
        src.where(col("o_orderkey") % 7 === 3).select(col("o_orderkey")))
      val filesNew =
        graft.sources.ManifestV2Sink.appendedFileCount(out, 1)
      val filesTotal =
        graft.sources.ManifestV2Sink.committedFileCount(out)
      graft.sources.ManifestV2Sink.readAppendedSince(spark, out, 1)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"),
          sum(col("o_orderkey")).as("sum_keys"))
        .select(col("o_orderpriority"), col("n"), col("sum_cents"),
          col("sum_keys"),
          lit(filesNew.toLong).as("files_new"),
          lit(filesTotal.toLong).as("files_total"))
        .localCheckpoint(true) // eager: the finally deletes the table
    } finally fs.delete(outPath, true)
  }

  val sinkManifestIncrSql: String =
    """WITH s AS (
      |  SELECT o_orderkey, o_orderpriority,
      |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders)
      |SELECT o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(cents) AS BIGINT) AS sum_cents,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
      |  CAST(4 AS BIGINT) AS files_new,
      |  CAST(6 AS BIGINT) AS files_total
      |FROM s
      |WHERE o_orderkey % 3 <> 0 AND NOT (o_orderkey % 7 = 3)
      |GROUP BY o_orderpriority""".stripMargin

  /** METADATA-ONLY AGGREGATES under the oracle gate — the planner's
    * zero-I/O answer to `SELECT min(c), max(c)`: the per-file stats
    * recorded at commit time fold to exact table-wide bounds
    * ([[graft.sources.ManifestV2Sink.statsMinMax]]) without reading
    * one data byte — O(files) manifest metadata at any table size,
    * the Iceberg `use-table-stats` shape. Files land hash-distributed
    * across 4 commits so no single file's bounds equal the table's
    * (the fold is non-vacuous); the oracle recomputes each bound from
    * the raw table, so a stats blob that clipped, missed a file, or
    * rounded a bound diverges the hash. The soundness rule (ANY
    * statless file ⇒ None, never a wrong answer) is pinned in
    * ManifestSinkSpec.
    */
  def sinkManifestStatsAgg(spark: SparkSession, dir: String): DataFrame = {
    val outPath = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      s"graft_statsagg_${java.util.UUID.randomUUID().toString.take(8)}")
    val fs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = outPath.toUri.getPath // scheme-less for the nio sink side
    try {
      val src = table(spark, dir, "orders")
        .select(col("o_orderkey"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"),
          year(col("o_orderdate")).cast("long").as("yr"))
      (0 to 3).foreach { g =>
        src.where(col("o_orderkey") % 4 === g).coalesce(2)
          .write.format("graft-manifest").mode("append").save(out)
      }
      // the DISTRIBUTED metadata seam: the fold runs as a Spark agg
      // over the manifest scan (ManifestMeta), so the metadata path
      // itself survives millions of files — parity with the
      // driver-side fold is pinned in ManifestMetaSpec
      val cols = Seq("o_orderkey", "cents", "yr")
      // ONE metadata pass answers all three columns (statsMinMaxMany)
      val folded = graft.sources.ManifestMeta.statsMinMaxMany(
        spark, out, cols)
      val rows = cols.map { c =>
        val (lo, hi) = folded(c)
          .getOrElse(sys.error(s"no sound metadata bounds for $c"))
        (c, lo.longValue, hi.longValue)
      }
      import spark.implicits._
      rows.toDF("col_name", "meta_min", "meta_max")
    } finally fs.delete(outPath, true)
  }

  val sinkManifestStatsAggSql: String =
    """WITH s AS (
      |  SELECT o_orderkey,
      |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
      |    CAST(year(o_orderdate) AS BIGINT) AS yr
      |  FROM orders)
      |SELECT 'o_orderkey' AS col_name,
      |  CAST(min(o_orderkey) AS BIGINT) AS meta_min,
      |  CAST(max(o_orderkey) AS BIGINT) AS meta_max FROM s
      |UNION ALL
      |SELECT 'cents', CAST(min(cents) AS BIGINT),
      |  CAST(max(cents) AS BIGINT) FROM s
      |UNION ALL
      |SELECT 'yr', CAST(min(yr) AS BIGINT),
      |  CAST(max(yr) AS BIGINT) FROM s""".stripMargin

  /** PURE-SQL TABLE LIFECYCLE through the [[graft.sources
    * .ManifestCatalog]] under the oracle gate — proof a SQL-only user
    * can drive the manifest sink end to end with no DataFrame API:
    * `CREATE TABLE graft.t`, `INSERT INTO ... SELECT`, `ALTER TABLE
    * ADD COLUMN` (the metadata-only schema evolution, now reachable
    * from DDL), a second INSERT with the widened schema, and a
    * SQL aggregate read back through the DSv2 batch scan. The oracle
    * recomputes the final rollup from the generation predicates, so a
    * row lost by the catalog resolver, the scan, or the evolution
    * diverges the hash. DDL/DML error paths (duplicate create, type
    * change, rename, drop) are pinned in ManifestCatalogSpec.
    */
  def sinkManifestSql(spark: SparkSession, dir: String): DataFrame = {
    val t = s"t_${java.util.UUID.randomUUID().toString.take(8)}"
    try {
      val src = table(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"),
          year(col("o_orderdate")).cast("long").as("yr"))
      src.where(col("o_orderkey") % 2 === 0)
        .select("o_orderkey", "o_orderpriority", "cents")
        .createOrReplaceTempView("graft_sql_gen1")
      src.where(col("o_orderkey") % 2 === 1)
        .createOrReplaceTempView("graft_sql_gen2")
      spark.sql(s"CREATE TABLE graft.$t " +
        "(o_orderkey BIGINT, o_orderpriority STRING, cents BIGINT)")
      spark.sql(s"INSERT INTO graft.$t SELECT * FROM graft_sql_gen1")
      spark.sql(s"ALTER TABLE graft.$t ADD COLUMN yr BIGINT")
      spark.sql(s"INSERT INTO graft.$t " +
        "SELECT o_orderkey, o_orderpriority, cents, yr FROM graft_sql_gen2")
      spark.sql(
        s"""SELECT o_orderpriority, COUNT(*) AS n,
           |  SUM(cents) AS sum_cents,
           |  SUM(CASE WHEN yr IS NULL THEN 1 ELSE 0 END) AS yr_nulls,
           |  SUM(yr) AS sum_yr
           |FROM graft.$t GROUP BY o_orderpriority""".stripMargin)
        .localCheckpoint(true) // eager: the finally drops the table
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  val sinkManifestSqlSql: String =
    """WITH s AS (
      |  SELECT o_orderkey, o_orderpriority,
      |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
      |    CASE WHEN o_orderkey % 2 = 1
      |      THEN CAST(year(o_orderdate) AS BIGINT) END AS yr
      |  FROM orders)
      |SELECT o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(cents) AS BIGINT) AS sum_cents,
      |  CAST(SUM(CASE WHEN yr IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS yr_nulls,
      |  CAST(SUM(yr) AS BIGINT) AS sum_yr
      |FROM s GROUP BY o_orderpriority""".stripMargin

  /** CHANGELOG RECONSTRUCTION from manifest snapshots — the change
    * data feed a training pipeline derives when the upstream never
    * shipped one: for each consecutive snapshot pair, rows added,
    * removed, and carried over, with their money deltas. Computed by
    * keyed anti/semi joins between adjacent snapshot reads (work ∝
    * the two snapshots compared, partitioned on the key — at corpus
    * scale each pair compare is one co-partitioned join, and a real
    * table format would narrow it further to the files that differ,
    * which [[sinkManifestTimetravel]]'s immutable file lists make a
    * pure metadata operation). The append→append→truncate history
    * makes all three change classes non-vacuous: v1→v2 is pure
    * growth, v2→v3 is a replacement (everything removed, a disjoint
    * slice added). The oracle recomputes every cell from the slice
    * definitions, so a row leaking across snapshots or a truncate
    * retaining state diverges the hash.
    */
  def sinkManifestChangelog(spark: SparkSession, dir: String): DataFrame = {
    val outPath = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      s"graft_changelog_${java.util.UUID.randomUUID().toString.take(8)}")
    val fs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // scheme-less: the runtime conf qualifies warehouse.dir to
    // file:/..., which the sink's java.nio side would treat as a
    // RELATIVE directory literally named "file:"
    val out = outPath.toUri.getPath
    try {
      def slice(m: Long) = table(spark, dir, "orders")
        .where(col("o_orderkey") % 17 === m)
        .select(col("o_orderkey"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
      slice(0).write.format("graft-manifest").mode("append").save(out)
      slice(1).write.format("graft-manifest").mode("append").save(out)
      slice(2).write.format("graft-manifest").mode("overwrite").save(out)
      val vs = graft.sources.ManifestV2Sink.versions(out)
      vs.zip(vs.tail).map { case (va, vb) =>
        val a = graft.sources.ManifestV2Sink.readVersion(spark, out, va)
        val b = graft.sources.ManifestV2Sink.readVersion(spark, out, vb)
        val added = b.join(a, Seq("o_orderkey"), "left_anti")
        val removed = a.join(b, Seq("o_orderkey"), "left_anti")
        val kept = b.join(a.select(col("o_orderkey")),
          Seq("o_orderkey"), "left_semi")
        def stat(df: DataFrame, nc: String, sc: String) =
          df.agg(count(lit(1)).as(nc),
            coalesce(sum(col("cents")), lit(0L)).as(sc))
        stat(added, "n_added", "cents_added")
          .crossJoin(stat(removed, "n_removed", "cents_removed"))
          .crossJoin(stat(kept, "n_kept", "cents_kept"))
          .select(lit(va.toLong).as("from_version"),
            lit(vb.toLong).as("to_version"),
            col("n_added"), col("n_removed"), col("n_kept"),
            col("cents_added"), col("cents_removed"), col("cents_kept"))
      }.reduce(_ unionByName _).orderBy(col("from_version"))
        .localCheckpoint(true) // eager: the finally deletes the table
    } finally fs.delete(outPath, true)
  }

  val sinkManifestChangelogSql: String =
    """WITH s AS (
      |  SELECT o_orderkey % 17 AS m, o_orderkey,
      |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders),
      |agg AS (SELECT m, COUNT(*) AS n, SUM(cents) AS c FROM s
      |  WHERE m IN (0, 1, 2) GROUP BY m)
      |SELECT CAST(1 AS BIGINT) AS from_version, CAST(2 AS BIGINT) AS to_version,
      |  (SELECT n FROM agg WHERE m = 1) AS n_added,
      |  CAST(0 AS BIGINT) AS n_removed,
      |  (SELECT n FROM agg WHERE m = 0) AS n_kept,
      |  CAST((SELECT c FROM agg WHERE m = 1) AS BIGINT) AS cents_added,
      |  CAST(0 AS BIGINT) AS cents_removed,
      |  CAST((SELECT c FROM agg WHERE m = 0) AS BIGINT) AS cents_kept
      |UNION ALL
      |SELECT 2, 3,
      |  (SELECT n FROM agg WHERE m = 2),
      |  (SELECT n FROM agg WHERE m = 0) + (SELECT n FROM agg WHERE m = 1),
      |  CAST(0 AS BIGINT),
      |  CAST((SELECT c FROM agg WHERE m = 2) AS BIGINT),
      |  CAST((SELECT c FROM agg WHERE m = 0)
      |    + (SELECT c FROM agg WHERE m = 1) AS BIGINT),
      |  CAST(0 AS BIGINT)
      |ORDER BY from_version""".stripMargin

  /** BRANCHED writes on the manifest sink — the Nessie/git-for-data
    * workflow a pipeline team runs to stage a risky backfill: fork
    * `exp` from main, append to the branch (main readers see nothing),
    * let main advance INDEPENDENTLY meanwhile, then merge — a pure
    * metadata union of immutable files, no rows moved at any table
    * size. Four states are read back and oracle-recomputed from the
    * deterministic slice definitions: main before the branch work,
    * the branch view, main after its own independent commit (branch
    * still invisible — isolation both ways), and main after the
    * merge (everything, exactly once). A file leaking across heads or
    * a merge double-listing a shared file diverges the hash.
    */
  def sinkManifestBranch(spark: SparkSession, dir: String): DataFrame = {
    val outPath = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      s"graft_branch_${java.util.UUID.randomUUID().toString.take(8)}")
    val fs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = outPath.toUri.getPath // scheme-less for the nio sink side
    try {
      def slice(m: Long) = table(spark, dir, "orders")
        .where(col("o_orderkey") % 17 === m)
        .select(col("o_orderkey"), col("o_custkey"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
      val M = graft.sources.ManifestV2Sink
      slice(0).write.format("graft-manifest").mode("append").save(out)
      M.createBranch(out, "exp")
      slice(1).write.format("graft-manifest").option("branch", "exp")
        .mode("append").save(out)
      val mainPre = M.readCommitted(spark, out)
      val branchView = M.readBranch(spark, out, "exp")
      slice(2).write.format("graft-manifest").mode("append").save(out)
      val mainMid = M.readCommitted(spark, out)
      // force the pre-merge reads before merge mutates the pointers
      def stat(state: String, df: DataFrame) =
        df.agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"),
            sum(col("o_orderkey")).as("sum_keys"))
          .select(lit(state).as("state"), col("n"), col("sum_cents"),
            col("sum_keys")).localCheckpoint(true)
      val pre = Seq(stat("1_main_pre", mainPre),
        stat("2_branch", branchView), stat("3_main_concurrent", mainMid))
      M.mergeBranch(out, "exp")
      val all = pre :+ stat("4_main_merged", M.readCommitted(spark, out))
      all.reduce(_ unionByName _).orderBy(col("state"))
        .localCheckpoint(true) // eager: the finally deletes the table
    } finally fs.delete(outPath, true)
  }

  val sinkManifestBranchSql: String =
    """WITH s AS (
      |  SELECT o_orderkey % 17 AS m, o_orderkey,
      |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders),
      |v AS (
      |  SELECT '1_main_pre' AS state, o_orderkey, cents FROM s WHERE m = 0
      |  UNION ALL
      |  SELECT '2_branch', o_orderkey, cents FROM s WHERE m IN (0, 1)
      |  UNION ALL
      |  SELECT '3_main_concurrent', o_orderkey, cents FROM s
      |  WHERE m IN (0, 2)
      |  UNION ALL
      |  SELECT '4_main_merged', o_orderkey, cents FROM s
      |  WHERE m IN (0, 1, 2))
      |SELECT state, COUNT(*) AS n,
      |  CAST(SUM(cents) AS BIGINT) AS sum_cents,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys
      |FROM v GROUP BY state ORDER BY state""".stripMargin

  /** Copy-on-write MERGE (upsert) through the manifest sink — the
    * Delta/Iceberg `MERGE INTO` shape in miniature: a base commit, an
    * update batch that REWRITES half the existing keys (×10 cents) and
    * INSERTS a disjoint slice, folded in by
    * [[graft.sources.ManifestV2Sink.upsert]] as one transactional
    * overwrite (updates win per key via anti join, everything else
    * carries over). The final state is read back and rolled up per
    * key class, so the oracle catches every merge failure mode: a lost
    * update (m=1 summing at 1×), a dropped carry-over (m=0 missing),
    * a duplicated key (counts off), a leaked pre-merge file (sums
    * off). The pre-merge state stays time-travelable — snapshot
    * isolation is [[sinkManifestTimetravel]]'s gate.
    */
  def sinkManifestUpsert(spark: SparkSession, dir: String): DataFrame = {
    val outPath = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      s"graft_upsert_${java.util.UUID.randomUUID().toString.take(8)}")
    val fs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = outPath.toUri.getPath // scheme-less for the nio sink side
    try {
      def slice(ms: Long*) = table(spark, dir, "orders")
        .where(col("o_orderkey") % 17 isin (ms: _*))
        .select(col("o_orderkey"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
      slice(0, 1).write.format("graft-manifest").mode("append").save(out)
      val updates = slice(1, 2)
        .select(col("o_orderkey"), (col("cents") * 10).as("cents"))
      graft.sources.ManifestV2Sink.upsert(spark, out, updates, "o_orderkey")
      graft.sources.ManifestV2Sink.readCommitted(spark, out)
        .groupBy((col("o_orderkey") % 17).as("m"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"),
          sum(col("o_orderkey")).as("sum_keys"))
        .orderBy(col("m"))
        .localCheckpoint(true) // eager: the finally deletes the table
    } finally fs.delete(outPath, true)
  }

  val sinkManifestUpsertSql: String =
    """WITH s AS (
      |  SELECT o_orderkey % 17 AS m, o_orderkey,
      |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders),
      |f AS (
      |  SELECT m, o_orderkey, cents FROM s WHERE m = 0
      |  UNION ALL
      |  SELECT m, o_orderkey, cents * 10 FROM s WHERE m IN (1, 2))
      |SELECT m, COUNT(*) AS n,
      |  CAST(SUM(cents) AS BIGINT) AS sum_cents,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys
      |FROM f GROUP BY m ORDER BY m""".stripMargin

  // ------------------------------------------- file-format breadth
  /** CSV ROUND-TRIP — the interchange format every ingestion pipeline
    * still meets at its edges: a documents projection (including a
    * column with embedded commas, so quoting is actually exercised)
    * is written with headers, read back under an EXPLICIT schema (the
    * production discipline — header inference on a 100 TB drop is a
    * full extra pass and a type roulette), and rolled up. A quoting
    * or escaping bug shifts columns and diverges count/sum/max
    * against the oracle, which recomputes from the parquet truth.
    */
  def sourceCsvRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val outPath = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      s"graft_csv_${java.util.UUID.randomUUID().toString.take(8)}")
    val fs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      table(spark, dir, "documents")
        .select(col("doc_id"), col("lang"), col("source"),
          concat_ws(",", col("source"), col("lang")).as("tagged"),
          col("n_chars"))
        .write.option("header", "true").csv(outPath.toString)
      spark.read
        .schema("doc_id LONG, lang STRING, source STRING, " +
          "tagged STRING, n_chars LONG")
        .option("header", "true").csv(outPath.toString)
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"),
          max(col("tagged")).as("max_tagged"))
        .localCheckpoint(true) // eager: the finally deletes the files
    } finally fs.delete(outPath, true)
  }

  val sourceCsvRoundtripSql: String =
    """SELECT lang, source, COUNT(*) AS n,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |  MAX(source || ',' || lang) AS max_tagged
      |FROM documents GROUP BY lang, source""".stripMargin

  /** ORC ROUND-TRIP with a selective read-back — the columnar
    * alternative Spark ships natively: an orders slice is written,
    * then read back under a price predicate and pruned projection
    * (both reach the ORC reader — PlanAuditSpec pins the pushed
    * filter) and rolled up per status. The oracle recomputes from the
    * parquet truth, so a lossy write (decimal/date mangling) or an
    * unpushed filter reading the wrong rows diverges the hash.
    */
  def sourceOrcRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val outPath = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      s"graft_orc_${java.util.UUID.randomUUID().toString.take(8)}")
    val fs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      table(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"), col("o_orderdate"))
        .write.orc(outPath.toString)
      orcAggRead(spark, outPath.toString)
        .localCheckpoint(true) // eager: the finally deletes the files
    } finally fs.delete(outPath, true)
  }

  /** The read side of [[sourceOrcRoundtrip]], factored so
    * PlanAuditSpec can pin the pushed ORC filter and pruned
    * projection on the live (pre-checkpoint) plan.
    */
  private[analytics] def orcAggRead(spark: SparkSession,
      path: String): DataFrame =
    spark.read.orc(path)
      .where(col("o_totalprice") > 150000.0)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("rev"),
        min(col("o_orderdate").cast("date")).cast("string").as("min_date"),
        max(col("o_orderkey")).as("max_key"))

  val sourceOrcRoundtripSql: String =
    s"""SELECT o_orderstatus, COUNT(*) AS n,
       |  ${sqlDsum("o_totalprice")} AS rev,
       |  strftime(MIN(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS min_date,
       |  MAX(o_orderkey) AS max_key
       |FROM orders WHERE o_totalprice > 150000.0
       |GROUP BY o_orderstatus""".stripMargin

  // ----------------------------------- DSv2 aggregate pushdown
  /** COMPLETE aggregate pushdown through the V2 connector: the
    * source's ScanBuilder implements `SupportsPushDownAggregates`, so
    * Catalyst hands COUNT/MIN(id)/MAX(id) (after the id-range filter
    * has already narrowed the scan) to the source, which answers them
    * in closed form — the plan carries NO aggregate exec at all, the
    * scan emits ONE row, and zero data rows move. This is the
    * connector contract that lets a catalog answer `SELECT count(*)`
    * from statistics instead of a table scan — the difference between
    * a metadata lookup and reading 100 TB. PlanAuditSpec pins the
    * pushed marker and the absence of any HashAggregate.
    */
  def sourceDsv2AggPushdown(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("graft-synth")
      .option("rows", "1000000").option("parts", "8").load()
      .where(col("id") >= 123457 && col("id") < 987654)
      .agg(count(lit(1)).as("n_rows"), min(col("id")).as("min_id"),
        max(col("id")).as("max_id"))

  val sourceDsv2AggPushdownSql: String =
    """WITH t AS (
      |  SELECT CAST(r.range AS BIGINT) AS id FROM range(0, 1000000) r)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  MIN(id) AS min_id, MAX(id) AS max_id
      |FROM t WHERE id >= 123457 AND id < 987654""".stripMargin

  /** GROUPED complete pushdown: `GROUP BY bucket` with COUNT/MIN/MAX
    * folds per residue class of the filter-narrowed [lo, hi) — one
    * closed-form row per nonempty class, still zero data read. The
    * grouped twin of [[sourceDsv2AggPushdown]]; only id-range
    * predicates appear so every filter is consumed (a residual
    * filter structurally blocks aggregate pushdown in Catalyst).
    */
  def sourceDsv2AggGroupBy(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("graft-synth")
      .option("rows", "500000").option("parts", "8").load()
      .where(col("id") >= 1234 && col("id") < 400000)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), min(col("id")).as("min_id"),
        max(col("id")).as("max_id"))

  val sourceDsv2AggGroupBySql: String =
    """WITH t AS (
      |  SELECT CAST(r.range AS BIGINT) AS id FROM range(0, 500000) r)
      |SELECT id % 97 AS bucket, CAST(COUNT(*) AS BIGINT) AS n,
      |  MIN(id) AS min_id, MAX(id) AS max_id
      |FROM t WHERE id >= 1234 AND id < 400000
      |GROUP BY 1""".stripMargin

  /** PARTITIONED WRITES + PARTITION PRUNING under the oracle gate —
    * the first layout every 100-TB ingest writes (date/source/lang
    * partitions) and the skip a lake consults BEFORE per-file stats:
    * two slices commit with `.option("partitionBy",
    * "o_orderpriority")`, each task fanning out one file per priority
    * (coalesce(1) per commit ⇒ one file per populated (commit,
    * priority) cell — exact, closed-form). A one-partition read then
    * goes through [[graft.sources.ManifestV2Sink.readPartition]].
    * BOTH directions are hash-gated, and crucially the partition
    * column is a STRING — no min/max stats exist for it anywhere, so
    * every skipped file is skipped by the partition value alone: the
    * in-band `files_read` equals the oracle's populated-cell count
    * for the queried priority and `files_total` the full cell count,
    * so reading too many files or losing a partition diverges the
    * hash. The exact predicate rides on top as the usual residual.
    */
  def sinkManifestPartition(spark: SparkSession, dir: String): DataFrame = {
    val outPath = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      s"graft_part_${java.util.UUID.randomUUID().toString.take(8)}")
    val fs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = outPath.toUri.getPath // scheme-less for the nio sink side
    try {
      val src = table(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_orderpriority"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
      // two ingest batches (e.g. two nightly loads), each partitioned
      // by priority: one task per commit ⇒ one file per (commit,
      // priority) cell, both counts closed-form for the oracle
      Seq(0L, 1L).foreach { m =>
        src.where(col("o_orderkey") % 3 === m).coalesce(1)
          .write.format("graft-manifest")
          .option("partitionBy", "o_orderpriority")
          .mode("append").save(out)
      }
      val want = "1-URGENT"
      val filesTotal = graft.sources.ManifestV2Sink.committedFileCount(out)
      val filesRead = graft.sources.ManifestV2Sink
        .prunedPartitionFiles(out, "o_orderpriority", want).size
      graft.sources.ManifestV2Sink
        .readPartition(spark, out, "o_orderpriority", want)
        .where(col("o_orderpriority") === want) // residual atop the skip
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"),
          sum(col("o_orderkey")).as("sum_keys"))
        .select(col("o_orderstatus"), col("n"), col("sum_cents"),
          col("sum_keys"),
          lit(filesRead.toLong).as("files_read"),
          lit(filesTotal.toLong).as("files_total"))
        .localCheckpoint(true) // eager: the finally deletes the table
    } finally fs.delete(outPath, true)
  }

  val sinkManifestPartitionSql: String =
    """WITH s AS (
      |  SELECT o_orderkey, o_orderstatus, o_orderpriority,
      |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
      |    o_orderkey % 3 AS m
      |  FROM orders WHERE o_orderkey % 3 IN (0, 1))
      |SELECT o_orderstatus, COUNT(*) AS n,
      |  CAST(SUM(cents) AS BIGINT) AS sum_cents,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
      |  (SELECT COUNT(DISTINCT m) FROM s
      |     WHERE o_orderpriority = '1-URGENT') AS files_read,
      |  (SELECT COUNT(*) FROM
      |     (SELECT DISTINCT m, o_orderpriority FROM s)) AS files_total
      |FROM s WHERE o_orderpriority = '1-URGENT'
      |GROUP BY o_orderstatus""".stripMargin

  /** PURE-SQL WRITE lifecycle through the `graft` TableCatalog — the
    * moment a table is SQL-visible users expect SQL writes, and here
    * every mutation is a SQL statement riding the same transactional
    * commit protocol as the DataFrame surface: CTAS creates and
    * populates in one statement, `INSERT INTO ... SELECT` appends a
    * second commit, and `DELETE FROM ... WHERE key IN (...)` routes to
    * the MERGE-ON-READ tombstone path ([[graft.sources.ManifestTable
    * .deleteWhere]]) — the in-band `files_rewritten` column pins the
    * delete to ZERO rewritten data files (a literal IN-list is exactly
    * the GDPR-scale delete shape; table-scale deletes belong on the
    * batch anti-join surface). The read-back is SQL too, so the whole
    * loop never touches the DataFrame API; the oracle recomputes the
    * reconciled aggregate from the slice + delete predicates, so a
    * tombstone that leaks rows back or over-deletes diverges the hash.
    */
  def sinkManifestSqlWrite(spark: SparkSession, dir: String): DataFrame = {
    val t = s"sqlw_${java.util.UUID.randomUUID().toString.take(8)}"
    val view = s"orders_src_$t"
    try {
      table(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
        .createOrReplaceTempView(view)
      spark.sql(s"CREATE TABLE graft.$t AS SELECT * FROM $view " +
        "WHERE o_orderkey % 11 = 0")
      spark.sql(s"INSERT INTO graft.$t SELECT * FROM $view " +
        "WHERE o_orderkey % 11 = 1")
      val tableDir = spark.conf.get("spark.sql.catalog.graft.root") + s"/$t"
      val filesBefore =
        graft.sources.ManifestV2Sink.committedFileCount(tableDir)
      // GDPR-scale SQL delete: a literal key list BOUNDED at 20 keys
      // (the 20 smallest of the 1-in-70 slice) — genuinely
      // entity-sized at any corpus scale; table-scale predicates go
      // through sink_manifest_sql_delete_pred's file-narrowed COW
      val delKeys = spark.sql(s"SELECT o_orderkey FROM $view " +
        "WHERE o_orderkey % 11 IN (0, 1) AND o_orderkey % 70 = 0 " +
        "ORDER BY o_orderkey LIMIT 20")
        .collect().map(_.getLong(0)).sorted
      if (delKeys.nonEmpty)
        spark.sql(s"DELETE FROM graft.$t " +
          s"WHERE o_orderkey IN (${delKeys.mkString(", ")})")
      val filesAfter =
        graft.sources.ManifestV2Sink.committedFileCount(tableDir)
      val tombstones =
        graft.sources.ManifestV2Sink.committedDeleteFileCount(tableDir)
      spark.sql(
        s"""SELECT o_orderstatus, COUNT(*) AS n,
           |  CAST(SUM(cents) AS BIGINT) AS sum_cents,
           |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys
           |FROM graft.$t GROUP BY o_orderstatus""".stripMargin)
        .select(col("o_orderstatus"), col("n"), col("sum_cents"),
          col("sum_keys"),
          lit((filesAfter - filesBefore).toLong).as("files_rewritten"),
          lit(if (tombstones > 0) 1L else 0L).as("has_tombstones"))
        .localCheckpoint(true) // eager: the finally drops the table
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS graft.$t")
      spark.catalog.dropTempView(view)
      ()
    }
  }

  val sinkManifestSqlWriteSql: String =
    """WITH s AS (
      |  SELECT o_orderkey, o_orderstatus,
      |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders WHERE o_orderkey % 11 IN (0, 1)),
      |del AS (
      |  SELECT o_orderkey FROM s WHERE o_orderkey % 70 = 0
      |  ORDER BY o_orderkey LIMIT 20)
      |SELECT o_orderstatus, COUNT(*) AS n,
      |  CAST(SUM(cents) AS BIGINT) AS sum_cents,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
      |  CAST(0 AS BIGINT) AS files_rewritten,
      |  CAST(CASE WHEN EXISTS (SELECT 1 FROM del)
      |       THEN 1 ELSE 0 END AS BIGINT) AS has_tombstones
      |FROM s WHERE o_orderkey NOT IN (SELECT o_orderkey FROM del)
      |GROUP BY o_orderstatus""".stripMargin

  // ------------------------------------- SQL time travel (catalog)
  /** PURE-SQL TIME TRAVEL through the catalog — `VERSION AS OF` over
    * a table whose whole lifecycle also ran in SQL (CTAS → INSERT →
    * MOR DELETE): each snapshot is read back AT its version and must
    * restate the slice exactly as published then — inserts invisible
    * to earlier snapshots, the tombstone invisible to pre-delete
    * snapshots, the head equal to the newest. Versions are captured
    * from the table's own history (no numbering assumptions about how
    * many commits CTAS takes). The TIMESTAMP AS OF resolution and the
    * frozen-snapshot write/stream rejections are spec-pinned
    * (ManifestCatalogSpec) — they need clocks and error shapes, not a
    * hash.
    */
  def sinkManifestSqlTimetravel(spark: SparkSession,
      dir: String): DataFrame = {
    val t = s"sqltt_${java.util.UUID.randomUUID().toString.take(8)}"
    val view = s"orders_tt_$t"
    try {
      table(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"))
        .createOrReplaceTempView(view)
      val tableDir = spark.conf.get("spark.sql.catalog.graft.root") + s"/$t"
      def headV: Int = graft.sources.ManifestV2Sink.versions(tableDir).max
      spark.sql(s"CREATE TABLE graft.$t AS SELECT * FROM $view " +
        "WHERE o_orderkey % 13 = 0")
      val vCtas = headV
      spark.sql(s"INSERT INTO graft.$t SELECT * FROM $view " +
        "WHERE o_orderkey % 13 = 1")
      val vIns = headV
      // bounded at the 25 smallest — entity-sized at any corpus scale
      val delKeys = spark.sql(s"SELECT o_orderkey FROM $view " +
        "WHERE o_orderkey % 39 = 0 ORDER BY o_orderkey LIMIT 25")
        .collect().map(_.getLong(0)).sorted
      if (delKeys.nonEmpty)
        spark.sql(s"DELETE FROM graft.$t " +
          s"WHERE o_orderkey IN (${delKeys.mkString(", ")})")
      val vDel = headV
      def snap(label: String, suffix: String) =
        s"""SELECT '$label' AS snap, COUNT(*) AS n,
           |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys
           |FROM graft.$t $suffix""".stripMargin
      spark.sql(Seq(
        snap("head", ""),
        snap("v_ctas", s"VERSION AS OF $vCtas"),
        snap("v_delete", s"VERSION AS OF $vDel"),
        snap("v_insert", s"VERSION AS OF $vIns"))
        .mkString("\nUNION ALL\n"))
        .localCheckpoint(true) // eager: the finally drops the table
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS graft.$t")
      spark.catalog.dropTempView(view)
      ()
    }
  }

  val sinkManifestSqlTimetravelSql: String =
    """WITH s AS (
      |  SELECT o_orderkey FROM orders WHERE o_orderkey % 13 IN (0, 1)),
      |del AS (
      |  SELECT o_orderkey FROM orders WHERE o_orderkey % 39 = 0
      |  ORDER BY o_orderkey LIMIT 25)
      |SELECT 'head' AS snap, COUNT(*) AS n,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys
      |FROM s WHERE o_orderkey NOT IN (SELECT o_orderkey FROM del)
      |UNION ALL
      |SELECT 'v_ctas', COUNT(*), CAST(SUM(o_orderkey) AS BIGINT)
      |FROM s WHERE o_orderkey % 13 = 0
      |UNION ALL
      |SELECT 'v_delete', COUNT(*), CAST(SUM(o_orderkey) AS BIGINT)
      |FROM s WHERE o_orderkey NOT IN (SELECT o_orderkey FROM del)
      |UNION ALL
      |SELECT 'v_insert', COUNT(*), CAST(SUM(o_orderkey) AS BIGINT)
      |FROM s""".stripMargin

  // --------------------------------------- SQL MERGE INTO (catalog)
  /** PURE-SQL MERGE: the canonical upsert (`WHEN MATCHED UPDATE SET *
    * / WHEN NOT MATCHED INSERT *`) routed by [[graft.sources.
    * ManifestMergeRule]] to the sink's stats-narrowed copy-on-write
    * merge. The gate proves row semantics (matched keys REPLACED —
    * never duplicated — unmatched keys inserted), single-commit
    * atomicity and the pre-merge snapshot's time-travelability
    * in-band; the rejection shapes are spec-pinned
    * (ManifestCatalogSpec).
    */
  def sinkManifestSqlMerge(spark: SparkSession, dir: String): DataFrame = {
    val t = s"sqlm_${java.util.UUID.randomUUID().toString.take(8)}"
    val view = s"orders_m_$t"
    try {
      table(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
        .createOrReplaceTempView(view)
      val tableDir = spark.conf.get("spark.sql.catalog.graft.root") + s"/$t"
      spark.sql(s"CREATE TABLE graft.$t AS SELECT * FROM $view " +
        "WHERE o_orderkey % 17 = 0")
      val vBefore = graft.sources.ManifestV2Sink.versions(tableDir).max
      val sumBefore = spark.sql(s"SELECT CAST(SUM(cents) AS BIGINT) " +
        s"FROM graft.$t").head.getLong(0)
      // source: matched rows (%17=0) get cents+7, plus fresh inserts
      // (%17=1) at cents+7 — one canonical upsert statement
      spark.sql(
        s"""MERGE INTO graft.$t tgt
           |USING (SELECT o_orderkey, o_orderstatus,
           |         cents + 7 AS cents FROM $view
           |       WHERE o_orderkey % 17 IN (0, 1)) src
           |ON tgt.o_orderkey = src.o_orderkey
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      val vAfter = graft.sources.ManifestV2Sink.versions(tableDir).max
      spark.sql(
        s"""SELECT o_orderstatus, COUNT(*) AS n,
           |  CAST(SUM(cents) AS BIGINT) AS sum_cents,
           |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys
           |FROM graft.$t GROUP BY o_orderstatus""".stripMargin)
        .select(col("o_orderstatus"), col("n"), col("sum_cents"),
          col("sum_keys"),
          lit((vAfter - vBefore).toLong).as("merge_commits"),
          // the pre-merge snapshot must still restate its own sum
          lit(spark.sql(s"SELECT CAST(SUM(cents) AS BIGINT) FROM " +
            s"graft.$t VERSION AS OF $vBefore").head.getLong(0) ==
            sumBefore).cast("long").as("pre_merge_travelable"))
        .localCheckpoint(true) // eager: the finally drops the table
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS graft.$t")
      spark.catalog.dropTempView(view)
      ()
    }
  }

  val sinkManifestSqlMergeSql: String =
    """WITH s AS (
      |  SELECT o_orderkey, o_orderstatus,
      |    CAST(floor(o_totalprice * 100) AS BIGINT) + 7 AS cents
      |  FROM orders WHERE o_orderkey % 17 IN (0, 1))
      |SELECT o_orderstatus, COUNT(*) AS n,
      |  CAST(SUM(cents) AS BIGINT) AS sum_cents,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
      |  CAST(1 AS BIGINT) AS merge_commits,
      |  CAST(1 AS BIGINT) AS pre_merge_travelable
      |FROM s GROUP BY o_orderstatus""".stripMargin

  // ----------------------------------------- SQL UPDATE (catalog)
  /** PURE-SQL UPDATE: copy-on-write rewrite through [[graft.sources.
    * ManifestMergeRule]]'s UpdateTable branch — `IF(pred, value, old)`
    * per assigned column, one overwrite commit, pre-update snapshot
    * travelable (pinned in-band like the MERGE gate). */
  def sinkManifestSqlUpdate(spark: SparkSession, dir: String): DataFrame = {
    val t = s"squ_${java.util.UUID.randomUUID().toString.take(8)}"
    val view = s"orders_u_$t"
    try {
      table(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
        .createOrReplaceTempView(view)
      val tableDir = spark.conf.get("spark.sql.catalog.graft.root") + s"/$t"
      spark.sql(s"CREATE TABLE graft.$t AS SELECT * FROM $view " +
        "WHERE o_orderkey % 19 = 0")
      val vBefore = graft.sources.ManifestV2Sink.versions(tableDir).max
      val sumBefore = spark.sql(s"SELECT CAST(SUM(cents) AS BIGINT) " +
        s"FROM graft.$t").head.getLong(0)
      spark.sql(s"UPDATE graft.$t SET cents = cents * 2 + 1 " +
        "WHERE o_orderstatus = 'F'")
      val vAfter = graft.sources.ManifestV2Sink.versions(tableDir).max
      spark.sql(
        s"""SELECT o_orderstatus, COUNT(*) AS n,
           |  CAST(SUM(cents) AS BIGINT) AS sum_cents
           |FROM graft.$t GROUP BY o_orderstatus""".stripMargin)
        .select(col("o_orderstatus"), col("n"), col("sum_cents"),
          lit((vAfter - vBefore).toLong).as("update_commits"),
          lit(spark.sql(s"SELECT CAST(SUM(cents) AS BIGINT) FROM " +
            s"graft.$t VERSION AS OF $vBefore").head.getLong(0) ==
            sumBefore).cast("long").as("pre_update_travelable"))
        .localCheckpoint(true) // eager: the finally drops the table
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS graft.$t")
      spark.catalog.dropTempView(view)
      ()
    }
  }

  val sinkManifestSqlUpdateSql: String =
    """WITH s AS (
      |  SELECT o_orderkey, o_orderstatus,
      |    CASE WHEN o_orderstatus = 'F'
      |      THEN CAST(floor(o_totalprice * 100) AS BIGINT) * 2 + 1
      |      ELSE CAST(floor(o_totalprice * 100) AS BIGINT) END AS cents
      |  FROM orders WHERE o_orderkey % 19 = 0)
      |SELECT o_orderstatus, COUNT(*) AS n,
      |  CAST(SUM(cents) AS BIGINT) AS sum_cents,
      |  CAST(1 AS BIGINT) AS update_commits,
      |  CAST(1 AS BIGINT) AS pre_update_travelable
      |FROM s GROUP BY o_orderstatus""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sink_manifest_sql_update" -> (sinkManifestSqlUpdate _),
    "sink_manifest_sql_merge" -> (sinkManifestSqlMerge _),
    "sink_manifest_sql_timetravel" -> (sinkManifestSqlTimetravel _),
    "sink_manifest_partition" -> (sinkManifestPartition _),
    "sink_manifest_sql_write" -> (sinkManifestSqlWrite _),
    "source_dsv2_agg_pushdown" -> (sourceDsv2AggPushdown _),
    "source_dsv2_agg_groupby" -> (sourceDsv2AggGroupBy _),
    "source_dsv2" -> (sourceDsv2 _),
    "source_dsv2_keyed" -> (sourceDsv2Keyed _),
    "source_dsv2_spj" -> (sourceDsv2Spj _),
    "source_dsv2_topn" -> (sourceDsv2Topn _),
    "source_dsv2_sample" -> (sourceDsv2Sample _),
    "source_dsv2_join" -> (sourceDsv2Join _),
    "sink_manifest_roundtrip" -> (sinkManifestRoundtrip _),
    "sink_manifest_compact" -> (sinkManifestCompact _),
    "sink_manifest_timetravel" -> (sinkManifestTimetravel _),
    "sink_manifest_branch" -> (sinkManifestBranch _),
    "sink_manifest_upsert" -> (sinkManifestUpsert _),
    "sink_manifest_prune" -> (sinkManifestPrune _),
    "sink_manifest_runtime_prune" -> (sinkManifestRuntimePrune _),
    "sink_manifest_stream_write" -> (sinkManifestStreamWrite _),
    "sink_manifest_agg_pushdown" -> (sinkManifestAggPushdown _),
    "sink_manifest_cdf" -> (sinkManifestCdf _),
    "sink_manifest_widen" -> (sinkManifestWiden _),
    "sink_manifest_part_evolve" -> (sinkManifestPartEvolve _),
    "sink_manifest_seg" -> (sinkManifestSeg _),
    "sink_manifest_tag" -> (sinkManifestTag _),
    "sink_manifest_limit_pushdown" -> (sinkManifestLimitPushdown _),
    "sink_manifest_dv" -> (sinkManifestDv _),
    "sink_manifest_spj" -> (sinkManifestSpj _),
    "sink_manifest_rename_drop" -> (sinkManifestRenameDrop _),
    "sink_manifest_proc" -> (sinkManifestProc _),
    "sink_manifest_meta" -> (sinkManifestMeta _),
    "sink_manifest_sql_merge_sync" -> (sinkManifestSqlMergeSync _),
    "sink_manifest_string_prune" -> (sinkManifestStringPrune _),
    "sink_manifest_binpack" -> (sinkManifestBinpack _),
    "sink_manifest_typed" -> (sinkManifestTyped _),
    "sink_manifest_sql_delete_pred" -> (sinkManifestSqlDeletePred _),
    "sink_manifest_sql_update_narrow" -> (sinkManifestSqlUpdateNarrow _),
    "sink_manifest_sql_merge_cdc" -> (sinkManifestSqlMergeCdc _),
    "sink_manifest_partition_ddl" -> (sinkManifestPartitionDdl _),
    "sink_manifest_mor" -> (sinkManifestMor _),
    "sink_manifest_zorder" -> (sinkManifestZorder _),
    "sink_manifest_upsert_narrow" -> (sinkManifestUpsertNarrow _),
    "sink_manifest_bloom" -> (sinkManifestBloom _),
    "sink_manifest_schema_evo" -> (sinkManifestSchemaEvo _),
    "sink_manifest_incr" -> (sinkManifestIncr _),
    "sink_manifest_stats_agg" -> (sinkManifestStatsAgg _),
    "sink_manifest_sql" -> (sinkManifestSql _),
    "source_csv_roundtrip" -> (sourceCsvRoundtrip _),
    "source_orc_roundtrip" -> (sourceOrcRoundtrip _),
    "sink_manifest_changelog" -> (sinkManifestChangelog _),
    "array_funcs_embeddings" -> (arrayFuncsEmbeddings _),
    "regexp_docs" -> (regexpDocs _),
    "null_handling_orders" -> (nullHandlingOrders _),
    "events_retention" -> (eventsRetention _),
    "date_arith_orders" -> (dateArithOrders _))

  val oracles: Map[String, String] = Map(
    "sink_manifest_partition" -> sinkManifestPartitionSql,
    "sink_manifest_sql_write" -> sinkManifestSqlWriteSql,
    "sink_manifest_sql_timetravel" -> sinkManifestSqlTimetravelSql,
    "sink_manifest_sql_merge" -> sinkManifestSqlMergeSql,
    "sink_manifest_sql_update" -> sinkManifestSqlUpdateSql,
    "source_dsv2_agg_pushdown" -> sourceDsv2AggPushdownSql,
    "source_dsv2_agg_groupby" -> sourceDsv2AggGroupBySql,
    "source_dsv2" -> sourceDsv2Sql,
    "source_dsv2_keyed" -> sourceDsv2Sql,
    "source_dsv2_spj" -> sourceDsv2SpjSql,
    "source_dsv2_topn" -> sourceDsv2TopnSql,
    "source_dsv2_sample" -> sourceDsv2SampleSql,
    "source_dsv2_join" -> sourceDsv2JoinSql,
    "sink_manifest_roundtrip" -> sinkManifestRoundtripSql,
    "sink_manifest_compact" -> sinkManifestCompactSql,
    "sink_manifest_timetravel" -> sinkManifestTimetravelSql,
    "sink_manifest_branch" -> sinkManifestBranchSql,
    "sink_manifest_upsert" -> sinkManifestUpsertSql,
    "sink_manifest_prune" -> sinkManifestPruneSql,
    "sink_manifest_runtime_prune" -> sinkManifestRuntimePruneSql,
    "sink_manifest_stream_write" -> sinkManifestStreamWriteSql,
    "sink_manifest_agg_pushdown" -> sinkManifestAggPushdownSql,
    "sink_manifest_cdf" -> sinkManifestCdfSql,
    "sink_manifest_widen" -> sinkManifestWidenSql,
    "sink_manifest_part_evolve" -> sinkManifestPartEvolveSql,
    "sink_manifest_seg" -> sinkManifestSegSql,
    "sink_manifest_tag" -> sinkManifestTagSql,
    "sink_manifest_limit_pushdown" -> sinkManifestLimitPushdownSql,
    "sink_manifest_dv" -> sinkManifestDvSql,
    "sink_manifest_spj" -> sinkManifestSpjSql,
    "sink_manifest_rename_drop" -> sinkManifestRenameDropSql,
    "sink_manifest_proc" -> sinkManifestProcSql,
    "sink_manifest_meta" -> sinkManifestMetaSql,
    "sink_manifest_sql_merge_sync" -> sinkManifestSqlMergeSyncSql,
    "sink_manifest_string_prune" -> sinkManifestStringPruneSql,
    "sink_manifest_binpack" -> sinkManifestBinpackSql,
    "sink_manifest_typed" -> sinkManifestTypedSql,
    "sink_manifest_sql_delete_pred" -> sinkManifestSqlDeletePredSql,
    "sink_manifest_sql_update_narrow" -> sinkManifestSqlUpdateNarrowSql,
    "sink_manifest_sql_merge_cdc" -> sinkManifestSqlMergeCdcSql,
    "sink_manifest_partition_ddl" -> sinkManifestPartitionDdlSql,
    "sink_manifest_mor" -> sinkManifestMorSql,
    "sink_manifest_zorder" -> sinkManifestZorderSql,
    "sink_manifest_upsert_narrow" -> sinkManifestUpsertNarrowSql,
    "sink_manifest_bloom" -> sinkManifestBloomSql,
    "sink_manifest_schema_evo" -> sinkManifestSchemaEvoSql,
    "sink_manifest_incr" -> sinkManifestIncrSql,
    "sink_manifest_stats_agg" -> sinkManifestStatsAggSql,
    "sink_manifest_sql" -> sinkManifestSqlSql,
    "source_csv_roundtrip" -> sourceCsvRoundtripSql,
    "source_orc_roundtrip" -> sourceOrcRoundtripSql,
    "sink_manifest_changelog" -> sinkManifestChangelogSql,
    "array_funcs_embeddings" -> arrayFuncsSql,
    "regexp_docs" -> regexpDocsSql,
    "null_handling_orders" -> nullHandlingSql,
    "events_retention" -> eventsRetentionSql,
    "date_arith_orders" -> dateArithSql)
}

package graft.sources

import graft.SparkSuite

/** Aggregate + limit/top-N pushdown on manifest tables: COUNT/MIN/MAX
  * (± partition grouping) answered from manifest metadata with the
  * Aggregate node erased and ZERO data files read; LIMIT/ORDER-LIMIT
  * bounding the planned file set. Every exactness hazard (filters,
  * tombstones, DVs under extremes, missing stats) must decline to the
  * row scan — correctness first, metadata savings second.
  */
class ManifestAggPushdownSpec extends SparkSuite {

  private def fresh(): String =
    s"t_${java.util.UUID.randomUUID().toString.take(8)}"

  private def root: String = spark.conf.get("spark.sql.catalog.graft.root")

  private def planOf(sql: String): String =
    spark.sql(sql).queryExecution.executedPlan.toString()

  test("COUNT(*)/MIN/MAX fold to a metadata-only local scan; " +
    "DVs subtract exactly from COUNT(*)") {
    val t = fresh()
    val dir = s"$root/$t"
    try {
      spark.sql(s"CREATE TABLE graft.$t (k BIGINT, v STRING)")
      (0 until 3).foreach { i =>
        spark.sql(s"INSERT INTO graft.$t SELECT /*+ COALESCE(1) */ id, " +
          s"CAST(id AS STRING) FROM range(${i * 100}, ${i * 100 + 100})")
      }
      val q = "SELECT count(*) AS n, min(k) AS mn, max(k) AS mx " +
        s"FROM graft.$t"
      val r = spark.sql(q).head
      assert((r.getLong(0), r.getLong(1), r.getLong(2)) ==
        ((300L, 0L, 299L)))
      val plan = planOf(q)
      assert(plan.contains("LocalTableScan") &&
        !plan.contains("BatchScan"),
        s"aggregate not erased to metadata:\n$plan")
      // a DV delete keeps COUNT(*) pushable (positions are exact)
      spark.sql(s"DELETE FROM graft.$t WHERE k >= 10 AND k < 15")
      assert(ManifestV2Sink.dvFileCount(dir) == 1)
      val qc = s"SELECT count(*) AS n FROM graft.$t"
      assert(spark.sql(qc).head.getLong(0) == 295L)
      assert(planOf(qc).contains("LocalTableScan"),
        "DV-adjusted COUNT(*) must stay metadata-only")
      // … but MIN/MAX must DECLINE under a DV (the extreme row may
      // be the deleted one) — and still answer correctly
      val qm = s"SELECT min(k) AS mn FROM graft.$t"
      assert(planOf(qm).contains("BatchScan"),
        "MIN under a DV must fall back to the row scan")
      assert(spark.sql(qm).head.getLong(0) == 0L)
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  test("COUNT(col) uses null counts; doubles decline unless the " +
    "zero-null proof holds (NaN hides in N|)") {
    val t = fresh()
    try {
      spark.sql(s"CREATE TABLE graft.$t (k BIGINT, s STRING, d DOUBLE)")
      spark.sql(s"INSERT INTO graft.$t SELECT /*+ COALESCE(1) */ id, " +
        "CASE WHEN id % 10 = 0 THEN NULL ELSE CAST(id AS STRING) END, " +
        "CAST(id AS DOUBLE) FROM range(0, 100)")
      val q = s"SELECT count(s) AS n FROM graft.$t"
      assert(spark.sql(q).head.getLong(0) == 90L)
      assert(planOf(q).contains("LocalTableScan"),
        "COUNT(col) with N| blob must be metadata-only")
      // doubles with zero nulls/NaNs: provable
      val qd = s"SELECT count(d) AS n, max(d) AS mx FROM graft.$t"
      val rd = spark.sql(qd).head
      assert(rd.getLong(0) == 100L && rd.getDouble(1) == 99.0)
      assert(planOf(qd).contains("LocalTableScan"))
      // a NaN makes the double column unprovable (N| counts NaN as
      // null, SQL COUNT/MAX do not) → decline, still correct
      spark.sql(s"INSERT INTO graft.$t VALUES (1000, 'x', " +
        "CAST('NaN' AS DOUBLE))")
      val r2 = spark.sql(qd).head
      assert(r2.getLong(0) == 101L && r2.getDouble(1).isNaN,
        s"NaN semantics wrong: $r2")
      assert(planOf(qd).contains("BatchScan"),
        "NaN-bearing double aggregates must use the row scan")
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  test("partition-grouped counts fold from P| blobs; filtered " +
    "aggregates decline") {
    val t = fresh()
    try {
      spark.sql(s"CREATE TABLE graft.$t (k BIGINT, p BIGINT) " +
        "PARTITIONED BY (p)")
      spark.sql(s"INSERT INTO graft.$t SELECT id, id % 3 FROM " +
        "range(0, 90)")
      val q = s"SELECT p, count(*) AS n, min(p) AS mn FROM graft.$t " +
        "GROUP BY p"
      val rows = spark.sql(q).collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
      assert(rows == Seq((0L, 30L, 0L), (1L, 30L, 1L), (2L, 30L, 2L)))
      assert(planOf(q).contains("LocalTableScan"),
        "partition-grouped count must be metadata-only")
      // grouped by a NON-partition column → decline
      assert(planOf(s"SELECT k, count(*) AS n FROM graft.$t GROUP BY k")
        .contains("BatchScan"))
      // a WHERE clause → decline (filters are residual by contract)
      val qf = s"SELECT count(*) AS n FROM graft.$t WHERE k < 10"
      assert(planOf(qf).contains("BatchScan"))
      assert(spark.sql(qf).head.getLong(0) == 10L)
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  test("empty and all-null shapes: global aggregate over an empty " +
    "table yields one row; all-null column yields null extremes") {
    val t = fresh()
    try {
      spark.sql(s"CREATE TABLE graft.$t (k BIGINT, v BIGINT)")
      val q = "SELECT count(*) AS n, count(v) AS nv, min(v) AS mn " +
        s"FROM graft.$t"
      val r0 = spark.sql(q).head
      assert(r0.getLong(0) == 0L && r0.getLong(1) == 0L && r0.isNullAt(2))
      assert(planOf(q).contains("LocalTableScan"))
      spark.sql(s"INSERT INTO graft.$t SELECT /*+ COALESCE(1) */ id, " +
        "CAST(NULL AS BIGINT) FROM range(0, 10)")
      val r1 = spark.sql(q).head
      assert(r1.getLong(0) == 10L && r1.getLong(1) == 0L &&
        r1.isNullAt(2), s"all-null fold wrong: $r1")
      assert(planOf(q).contains("LocalTableScan"),
        "all-null MIN must fold (N| proves no values), not decline")
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  test("LIMIT bounds the planned file set; ORDER BY + LIMIT keeps " +
    "only stats-reachable files") {
    val t = fresh()
    val dir = s"$root/$t"
    try {
      spark.sql(s"CREATE TABLE graft.$t (k BIGINT, v STRING)")
      (0 until 6).foreach { i =>
        spark.sql(s"INSERT INTO graft.$t SELECT /*+ COALESCE(1) */ id, " +
          s"CAST(id AS STRING) FROM range(${i * 100}, ${i * 100 + 100})")
      }
      // bare LIMIT: 10 rows live in the first file — plan ONE file
      assert(spark.sql(s"SELECT * FROM graft.$t LIMIT 10")
        .collect().length == 10)
      assert(ManifestScanPlanner.lastPlanned(dir).contains((1, 6)),
        s"LIMIT 10 planned ${ManifestScanPlanner.lastPlanned(dir)}")
      // ORDER BY ASC: the 150 smallest ks live in files 1-2
      val asc = spark.sql(
        s"SELECT k FROM graft.$t ORDER BY k LIMIT 150").collect()
      assert(asc.length == 150 && asc.head.getLong(0) == 0L &&
        asc.last.getLong(0) == 149L)
      assert(ManifestScanPlanner.lastPlanned(dir).contains((2, 6)),
        s"topN asc planned ${ManifestScanPlanner.lastPlanned(dir)}")
      // DESC: the 50 largest live in the last file
      val desc = spark.sql(
        s"SELECT k FROM graft.$t ORDER BY k DESC LIMIT 50").collect()
      assert(desc.length == 50 && desc.head.getLong(0) == 599L)
      assert(ManifestScanPlanner.lastPlanned(dir).contains((1, 6)),
        s"topN desc planned ${ManifestScanPlanner.lastPlanned(dir)}")
      // secondary sort keys ride along (primary-key bounding is
      // sound for lexicographic orders)
      val two = spark.sql(s"SELECT k, v FROM graft.$t " +
        "ORDER BY k, v DESC LIMIT 80").collect()
      assert(two.length == 80 && two.last.getLong(0) == 79L)
      assert(ManifestScanPlanner.lastPlanned(dir).contains((1, 6)))
      // a WHERE clause declines the bound (residual filters): all
      // matching files planned, result still exact
      val f = spark.sql(s"SELECT k FROM graft.$t WHERE v LIKE '%9' " +
        "ORDER BY k LIMIT 5").collect()
      assert(f.map(_.getLong(0)).toSeq == Seq(9L, 19L, 29L, 39L, 49L))
      assert(ManifestScanPlanner.lastPlanned(dir).contains((6, 6)),
        s"filtered topN planned ${ManifestScanPlanner.lastPlanned(dir)}")
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }
}

package graft.sources

import org.apache.spark.sql.types._

import graft.SparkSuite

/** ALTER COLUMN TYPE widening through the manifest catalog:
  * int→bigint and decimal precision widening are metadata-only
  * commits; pre-widen files keep their narrow physical encoding and
  * every read tier promotes at decode time (Spark's vectorized
  * parquet reader natively, the row materializer via promotion
  * converters); parquet-level filters on widened columns are
  * suppressed (physical-type mismatch) while manifest-level stats
  * skipping still applies; narrowing and cross-family changes are
  * refused loudly.
  */
class ManifestWidenSpec extends SparkSuite {

  private def fresh(): String =
    s"t_${java.util.UUID.randomUUID().toString.take(8)}"

  private def root: String = spark.conf.get("spark.sql.catalog.graft.root")

  test("int->bigint: both file eras read, filters work, stats " +
    "pruning and aggregate pushdown stay exact") {
    val t = fresh()
    val dir = s"$root/$t"
    try {
      spark.sql(s"CREATE TABLE graft.$t (k INT, v STRING)")
      spark.sql(s"INSERT INTO graft.$t SELECT /*+ COALESCE(1) */ " +
        "CAST(id AS INT), CAST(id AS STRING) FROM range(0, 100)")
      val vOld = ManifestV2Sink.versions(dir).max
      spark.sql(s"ALTER TABLE graft.$t ALTER COLUMN k TYPE BIGINT")
      assert(spark.table(s"graft.$t").schema("k").dataType == LongType)
      assert(ManifestV2Sink.widenedColumns(dir) == Set("k"))
      // post-widen era writes long physical (value beyond int range)
      spark.sql(s"INSERT INTO graft.$t VALUES (${Int.MaxValue.toLong + 5}, 'big')")
      // both eras served, promoted
      assert(spark.sql(s"SELECT count(*) FROM graft.$t")
        .head.getLong(0) == 101L)
      assert(spark.sql(s"SELECT sum(k) FROM graft.$t").head.getLong(0)
        == (0L until 100L).sum + Int.MaxValue.toLong + 5)
      // filters across both eras (parquet filter suppressed on k,
      // residual still applied; stats skipping still exact)
      assert(spark.sql(s"SELECT count(*) FROM graft.$t WHERE k >= 90")
        .head.getLong(0) == 11L)
      assert(spark.sql(
        s"SELECT v FROM graft.$t WHERE k = ${Int.MaxValue.toLong + 5}")
        .head.getString(0) == "big")
      // the pre-widen file is PRUNED for a beyond-int predicate
      // (L-kind stats are width-agnostic)
      spark.sql(s"SELECT * FROM graft.$t " +
        s"WHERE k = ${Int.MaxValue.toLong + 5}").collect()
      assert(ManifestV2Sink.lastPlannedFiles(dir).contains((1, 2)),
        s"stats skip lost: ${ManifestV2Sink.lastPlannedFiles(dir)}")
      // vectorized path still taken (no DV/tombstones)
      val q = spark.sql(s"SELECT k FROM graft.$t")
      assert(q.queryExecution.executedPlan.toString()
        .contains("ColumnarToRow"), "widened scan must stay columnar")
      // aggregate pushdown folds across both eras
      val agg = spark.sql(s"SELECT min(k) AS mn, max(k) AS mx " +
        s"FROM graft.$t")
      assert(agg.queryExecution.executedPlan.toString()
        .contains("LocalTableScan"))
      val r = agg.head
      assert(r.getLong(0) == 0L &&
        r.getLong(1) == Int.MaxValue.toLong + 5)
      // time travel serves the pre-widen SNAPSHOT with its own schema
      val old = ManifestV2Sink.readVersion(spark, dir, vOld)
      assert(old.schema("k").dataType == IntegerType)
      assert(old.count() == 100L)
      // row path (DV probe) promotes too: point delete via DV tier
      // keyed on the widened column, hitting the PRE-widen file
      spark.sql(s"DELETE FROM graft.$t WHERE k >= 10 AND k < 13")
      assert(ManifestV2Sink.dvFileCount(dir) == 1)
      assert(spark.sql(s"SELECT count(*) FROM graft.$t")
        .head.getLong(0) == 98L)
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  test("decimal precision widening within and across the physical " +
    "encoding boundary") {
    val t = fresh()
    try {
      spark.sql(s"CREATE TABLE graft.$t (d DECIMAL(10,2))")
      spark.sql(s"INSERT INTO graft.$t VALUES (1.50), (2.75)")
      spark.sql(s"ALTER TABLE graft.$t ALTER COLUMN d TYPE DECIMAL(14,2)")
      spark.sql(s"INSERT INTO graft.$t VALUES (123456789012.25)")
      assert(spark.sql(s"SELECT sum(d) FROM graft.$t")
        .head.getDecimal(0).toPlainString == "123456789016.50")
      // across the INT64/binary boundary
      spark.sql(s"ALTER TABLE graft.$t ALTER COLUMN d TYPE DECIMAL(22,2)")
      spark.sql(s"INSERT INTO graft.$t VALUES (12345678901234567.25)")
      assert(spark.sql(s"SELECT sum(d) FROM graft.$t")
        .head.getDecimal(0).toPlainString == "12345802358023583.75")
      assert(spark.sql(s"SELECT count(*) FROM graft.$t WHERE d < 3")
        .head.getLong(0) == 2L)
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  test("narrowing, cross-family, scale changes and partition " +
    "columns are refused loudly") {
    val t = fresh()
    try {
      spark.sql(s"CREATE TABLE graft.$t (k BIGINT, d DECIMAL(10,2), " +
        "p INT) PARTITIONED BY (p)")
      def refuse(ddl: String, frag: String): Unit = {
        val e = intercept[Exception] { spark.sql(ddl) }
        assert(e.getMessage.contains(frag),
          s"wrong error for $ddl: ${e.getMessage}")
      }
      // true narrowings are rejected by Spark's analyzer upfront
      refuse(s"ALTER TABLE graft.$t ALTER COLUMN k TYPE INT",
        "NOT_SUPPORTED_CHANGE_COLUMN")
      refuse(s"ALTER TABLE graft.$t ALTER COLUMN d TYPE DECIMAL(8,2)",
        "NOT_SUPPORTED_CHANGE_COLUMN")
      // shapes Spark's upcast rule permits but old parquet files
      // cannot serve — OUR catalog must refuse them
      refuse(s"ALTER TABLE graft.$t ALTER COLUMN k TYPE STRING",
        "not a widening")
      refuse(s"ALTER TABLE graft.$t ALTER COLUMN d TYPE DECIMAL(12,4)",
        "not a widening")
      refuse(s"ALTER TABLE graft.$t ALTER COLUMN k TYPE DOUBLE",
        "not a widening")
      refuse(s"ALTER TABLE graft.$t ALTER COLUMN p TYPE BIGINT",
        "partition column")
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }
}

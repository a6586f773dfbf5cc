package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** ALTER TABLE RENAME/DROP COLUMN via the column-identity ledger:
  * data files keep write-time names forever, so renames resolve old
  * files through the id's past names on every read path (row,
  * columnar, JSONL, rewrite reads), drops tombstone the id, retired
  * names can never be re-bound, tombstone keys survive a rename of
  * their column, and time travel serves pre-change schemas.
  */
class ManifestAlterColumnSpec extends SparkSuite {

  private def fresh(): String =
    s"t_${java.util.UUID.randomUUID().toString.take(8)}"

  private def root: String = spark.conf.get("spark.sql.catalog.graft.root")

  test("RENAME COLUMN: pre-rename files serve their data under the " +
    "new name on every read path; new writes land the new name") {
    val t = fresh()
    val dir = s"$root/$t"
    try {
      spark.sql(s"CREATE TABLE graft.$t (k BIGINT, v STRING)")
      spark.sql(s"INSERT INTO graft.$t SELECT id, concat('a', id) " +
        "FROM range(0, 50)")
      spark.sql(s"ALTER TABLE graft.$t RENAME COLUMN v TO txt")
      spark.sql(s"INSERT INTO graft.$t SELECT id, concat('b', id) " +
        "FROM range(50, 100)")
      // both eras of files answer under the new name (columnar path —
      // no tombstones — with per-file footer translation)
      val q = spark.sql(s"SELECT txt FROM graft.$t " +
        "WHERE txt IN ('a7', 'b57') ORDER BY txt")
      assert(q.collect().map(_.getString(0)).toSeq == Seq("a7", "b57"))
      assert(q.queryExecution.executedPlan.toString()
        .contains("ColumnarToRow"), "renamed scan lost the columnar path")
      assert(spark.sql(s"SELECT count(txt) FROM graft.$t")
        .head.getLong(0) == 100L)
      // API read surface resolves aliases too
      assert(ManifestV2Sink.readCommitted(spark, dir)
        .where(col("txt") === "a7").count() == 1L)
      // ledger recorded the history
      assert(ManifestV2Sink.columnAliases(dir) == Map("txt" -> Seq("v")))
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  test("DROP COLUMN: column gone from reads, time travel serves the " +
    "pre-drop schema, retired names are never re-bound") {
    val t = fresh()
    val dir = s"$root/$t"
    try {
      spark.sql(s"CREATE TABLE graft.$t (k BIGINT, v STRING, w DOUBLE)")
      spark.sql(s"INSERT INTO graft.$t VALUES (1, 'x', 1.5), " +
        "(2, 'y', 2.5)")
      val vBefore = ManifestV2Sink.versions(dir).max
      spark.sql(s"ALTER TABLE graft.$t DROP COLUMN w")
      assert(spark.table(s"graft.$t").columns.toSeq == Seq("k", "v"))
      assert(spark.sql(s"SELECT k, v FROM graft.$t ORDER BY k").count()
        == 2L)
      // the dropped column time-travels (old snapshot, old schema)
      val old = spark.sql(
        s"SELECT w FROM graft.$t VERSION AS OF $vBefore ORDER BY w")
      assert(old.collect().map(_.getDouble(0)).toSeq == Seq(1.5, 2.5))
      // re-binding the retired name is refused (old files still carry
      // the data; a new column named w would resurrect it)
      val e1 = intercept[Exception] {
        spark.sql(s"ALTER TABLE graft.$t ADD COLUMN w BIGINT") }
      assert(e1.getMessage.contains("renamed away or dropped"),
        e1.getMessage)
      val e2 = intercept[Exception] {
        spark.sql(s"ALTER TABLE graft.$t RENAME COLUMN v TO w") }
      assert(e2.getMessage.contains("renamed away or dropped"),
        e2.getMessage)
      // a FRESH name is fine
      spark.sql(s"ALTER TABLE graft.$t ADD COLUMN w2 BIGINT")
      assert(spark.table(s"graft.$t").columns.toSeq ==
        Seq("k", "v", "w2"))
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  test("tombstones keyed on a since-renamed column still reconcile; " +
    "rewrites of pre-rename files keep their data") {
    import spark.implicits._
    val t = fresh()
    val dir = s"$root/$t"
    try {
      spark.sql(s"CREATE TABLE graft.$t (k BIGINT, v STRING)")
      spark.sql(s"INSERT INTO graft.$t SELECT id, concat('a', id) " +
        "FROM range(0, 20)")
      // merge-on-read tombstone keyed on k, THEN rename k
      ManifestV2Sink.delete(spark, dir, "k", Seq(3L, 7L).toDF("k"))
      spark.sql(s"ALTER TABLE graft.$t RENAME COLUMN k TO id")
      assert(spark.sql(s"SELECT count(*) FROM graft.$t").head.getLong(0)
        == 18L, "tombstones lost after renaming their key column")
      assert(spark.sql(s"SELECT count(*) FROM graft.$t WHERE id = 3")
        .head.getLong(0) == 0L)
      // a COW rewrite of the renamed table (compaction) must carry the
      // pre-rename files' data — the raw-by-name read would null it
      ManifestV2Sink.compact(spark, dir, 1)
      val rows = spark.sql(s"SELECT id, v FROM graft.$t ORDER BY id")
        .collect()
      assert(rows.length == 18 && rows.head.getLong(0) == 0L &&
        rows.head.getString(1) == "a0",
        s"rewrite lost renamed data: ${rows.take(3).mkString(",")}")
      // post-compaction files carry the CURRENT name natively
      assert(spark.sql(s"SELECT count(v) FROM graft.$t").head.getLong(0)
        == 18L)
      // narrowed UPDATE on the renamed table stays exact
      spark.sql(s"UPDATE graft.$t SET v = 'u' WHERE id < 5")
      assert(spark.sql(s"SELECT count(*) FROM graft.$t WHERE v = 'u'")
        .head.getLong(0) == 4L) // ids 0,1,2,4 (3 tombstoned)
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  test("renaming a partition column updates the DDL sidecar; new " +
    "writes fan out under the new name") {
    val t = fresh()
    val dir = s"$root/$t"
    try {
      spark.sql(s"CREATE TABLE graft.$t (k BIGINT, p BIGINT) " +
        "PARTITIONED BY (p)")
      spark.sql(s"INSERT INTO graft.$t SELECT id, id % 2 FROM range(0, 10)")
      spark.sql(s"ALTER TABLE graft.$t RENAME COLUMN p TO bucket")
      assert(ManifestV2Sink.tablePartitionColumns(dir) == Seq("bucket"))
      spark.sql(s"INSERT INTO graft.$t SELECT id, id % 2 " +
        "FROM range(10, 20)")
      assert(spark.sql(s"SELECT count(*) FROM graft.$t WHERE bucket = 1")
        .head.getLong(0) == 10L)
      // dropping a partition column is refused
      val e = intercept[Exception] {
        spark.sql(s"ALTER TABLE graft.$t DROP COLUMN bucket") }
      assert(e.getMessage.contains("partition column"), e.getMessage)
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }
}

package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The vectorized read path: tombstone-free all-parquet manifest
  * scans decode through Spark's VectorizedParquetRecordReader into
  * ColumnarBatches (plan shows ColumnarToRow above the BatchScan);
  * tombstoned or mixed-format tables fall back to the row readers;
  * values, typed columns, schema evolution and pushed-filter
  * row-group skipping are identical either way.
  */
class ManifestColumnarSpec extends SparkSuite {

  private def fresh(): String =
    s"t_${java.util.UUID.randomUUID().toString.take(8)}"

  private def root: String = spark.conf.get("spark.sql.catalog.graft.root")

  test("clean parquet tables scan columnar; values and typed columns " +
    "identical to the row path") {
    val t = fresh()
    try {
      spark.sql(s"CREATE TABLE graft.$t (id BIGINT, d DATE, " +
        "ts TIMESTAMP, price DECIMAL(12,2), big DECIMAL(25,4), s STRING)")
      spark.sql(s"INSERT INTO graft.$t VALUES " +
        "(1, DATE'2024-03-01', TIMESTAMP'2024-03-01 12:34:56.789', " +
        "  1234.56, 123456789012345678901.2345, 'a')," +
        "(2, DATE'1969-07-20', TIMESTAMP'1969-07-20 20:17:00', " +
        "  -0.01, -9.0001, 'b')," +
        "(3, NULL, NULL, NULL, NULL, NULL)")
      val q = spark.sql(s"SELECT id, CAST(d AS STRING) AS d, " +
        "CAST(ts AS STRING) AS ts, CAST(price AS STRING) AS p, " +
        s"CAST(big AS STRING) AS b, s FROM graft.$t ORDER BY id")
      val got = q.collect().map(r => (0 until 6).map(i =>
        if (r.isNullAt(i)) "null" else r.get(i).toString).mkString("|"))
      val plan = q.queryExecution.executedPlan.toString()
      assert(plan.contains("ColumnarToRow"),
        s"clean parquet scan not columnar:\n$plan")
      assert(got.toSeq == Seq(
        "1|2024-03-01|2024-03-01 12:34:56.789|1234.56|" +
          "123456789012345678901.2345|a",
        "2|1969-07-20|1969-07-20 20:17:00|-0.01|-9.0001|b",
        "3|null|null|null|null|null"), got.toSeq)
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  test("schema evolution null-fills through the columnar path; " +
    "pushed filters stay sound over pre-evolution files") {
    val t = fresh()
    try {
      spark.sql(s"CREATE TABLE graft.$t (id BIGINT)")
      spark.sql(s"INSERT INTO graft.$t VALUES (1), (2)")
      spark.sql(s"ALTER TABLE graft.$t ADD COLUMN p DECIMAL(10,2)")
      spark.sql(s"INSERT INTO graft.$t VALUES (3, 9.99)")
      val q = spark.sql(s"SELECT id, CAST(p AS STRING) AS p " +
        s"FROM graft.$t ORDER BY id")
      assert(q.collect().map(r => s"${r.getLong(0)}|${
        if (r.isNullAt(1)) "null" else r.getString(1)}").toSeq ==
        Seq("1|null", "2|null", "3|9.99"))
      assert(q.queryExecution.executedPlan.toString()
        .contains("ColumnarToRow"), "evolved scan not columnar")
      assert(spark.sql(s"SELECT id FROM graft.$t WHERE p > 5").collect()
        .map(_.getLong(0)).toSeq == Seq(3L))
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  test("tombstoned and mixed-format tables fall back to the row " +
    "readers; compaction restores the columnar path") {
    import spark.implicits._
    val t = fresh()
    val dir = s"$root/$t"
    try {
      spark.sql(s"CREATE TABLE graft.$t (id BIGINT, s STRING)")
      spark.sql(s"INSERT INTO graft.$t " +
        "SELECT id, CAST(id AS STRING) FROM range(0, 10)")
      // merge-on-read tombstone → row path (reconcile is row-level)
      ManifestV2Sink.delete(spark, dir, "id", Seq(3L, 7L).toDF("id"))
      val q1 = spark.table(s"graft.$t")
      assert(q1.count() == 8L)
      assert(!q1.queryExecution.executedPlan.toString()
        .contains("ColumnarToRow"), "tombstoned scan must be row-based")
      // compaction materializes the reconcile → columnar again
      ManifestV2Sink.compact(spark, dir, 1)
      val q2 = spark.table(s"graft.$t")
      assert(q2.count() == 8L)
      assert(q2.queryExecution.executedPlan.toString()
        .contains("ColumnarToRow"), "compacted scan must be columnar")
      // a legacy JSONL append forces the whole scan back to rows
      ManifestV2Sink.appendExternal(dir,
        Seq("""{"id":100,"s":"jl"}"""), "mixed")
      val q3 = spark.table(s"graft.$t")
      assert(q3.count() == 9L)
      assert(!q3.queryExecution.executedPlan.toString()
        .contains("ColumnarToRow"), "mixed-format scan must be row-based")
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }
}

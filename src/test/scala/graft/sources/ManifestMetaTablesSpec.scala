package graft.sources

import graft.SparkSuite

/** Metadata tables: `graft.t.files` / `.snapshots` / `.txns` serve
  * the manifest's bookkeeping as SQL tables — layout health, snapshot
  * history, streaming-ingest ledger — always reflecting the CURRENT
  * state; unknown suffixes and missing base tables still fail loudly.
  */
class ManifestMetaTablesSpec extends SparkSuite {

  private def fresh(): String =
    s"t_${java.util.UUID.randomUUID().toString.take(8)}"

  test("files/snapshots reflect layout and history; rows track " +
    "commits live") {
    val t = fresh()
    try {
      spark.sql(s"CREATE TABLE graft.$t (k BIGINT, p BIGINT, v STRING)" +
        " PARTITIONED BY (p)")
      spark.sql(s"INSERT INTO graft.$t SELECT id, id % 2, " +
        "CAST(id AS STRING) FROM range(0, 100)")
      val files = spark.sql(s"SELECT file, format, row_count, " +
        s"size_bytes, partition FROM graft.$t.files ORDER BY partition")
        .collect()
      assert(files.length == 2, files.mkString(","))
      assert(files.forall(r => r.getString(1) == "parquet" &&
        r.getLong(2) == 50L && r.getLong(3) > 0L))
      assert(files.map(_.getString(4)).toSeq == Seq("p=0", "p=1"))
      // snapshots: create + insert; the head is current
      val snaps = spark.sql(s"SELECT version, n_files, is_current " +
        s"FROM graft.$t.snapshots ORDER BY version").collect()
      assert(snaps.length == 2 && snaps(0).getLong(1) == 0L &&
        snaps(1).getLong(1) == 2L && snaps(1).getBoolean(2),
        snaps.mkString(","))
      // live: another commit shows up without re-resolving the table
      spark.sql(s"INSERT INTO graft.$t SELECT id, id % 2, " +
        "CAST(id AS STRING) FROM range(100, 110)")
      assert(spark.sql(s"SELECT count(*) FROM graft.$t.files")
        .head.getLong(0) == 4L)
      assert(spark.sql(
        s"SELECT sum(row_count) FROM graft.$t.files").head.getLong(0)
        == 110L)
      // a DV shows its position count in-band
      spark.sql(s"DELETE FROM graft.$t WHERE k >= 4 AND k < 6")
      assert(spark.sql(s"SELECT sum(dv_positions) FROM graft.$t.files")
        .head.getLong(0) == 2L)
      // unknown suffix / missing base still fail
      intercept[Exception] {
        spark.sql(s"SELECT * FROM graft.$t.nope").collect() }
      intercept[Exception] {
        spark.sql(s"SELECT * FROM graft.zzz_missing.files").collect() }
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  test("txns surfaces the streaming-commit ledger") {
    import spark.implicits._
    val t = fresh()
    val dir = spark.conf.get("spark.sql.catalog.graft.root") + s"/$t"
    try {
      spark.sql(s"CREATE TABLE graft.$t (id BIGINT, s STRING)")
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("s",
          org.apache.spark.sql.types.StringType)))
      val w = new ManifestStreamingWrite(dir, schema, "q-meta",
        replaceEachEpoch = false, Seq.empty, Seq.empty)
      val dw = new ManifestWriterFactory(dir, schema, "q-meta-e0")
        .createWriter(0, 0)
      dw.write(org.apache.spark.sql.catalyst.InternalRow(
        1L, org.apache.spark.unsafe.types.UTF8String.fromString("a")))
      w.commit(0L, Array(dw.commit()))
      val txns = spark.sql(s"SELECT writer_id, epoch FROM graft.$t.txns")
        .as[(String, Long)].collect().toSeq
      assert(txns == Seq(("q-meta", 0L)), txns)
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }
}

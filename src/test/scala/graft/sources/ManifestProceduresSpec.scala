package graft.sources

import graft.SparkSuite

/** SQL maintenance procedures (`CALL graft.system.*`): compact,
  * zorder, expire_snapshots and vacuum run the full OPTIMIZE/
  * retention/reclamation lifecycle from pure SQL, each returning a
  * summary row; unknown procedures and tables fail loudly.
  */
class ManifestProceduresSpec extends SparkSuite {

  private def fresh(): String =
    s"t_${java.util.UUID.randomUUID().toString.take(8)}"

  private def root: String = spark.conf.get("spark.sql.catalog.graft.root")

  test("compact + expire_snapshots + vacuum lifecycle via CALL") {
    val t = fresh()
    val dir = s"$root/$t"
    try {
      spark.sql(s"CREATE TABLE graft.$t (k BIGINT, v STRING)")
      (0 until 6).foreach { i =>
        spark.sql(s"INSERT INTO graft.$t SELECT /*+ COALESCE(1) */ id, " +
          s"CAST(id AS STRING) FROM range(${i * 10}, ${i * 10 + 10})")
      }
      assert(ManifestV2Sink.committedFileCount(dir) == 6)
      // OPTIMIZE: 6 small files → 2
      val c = spark.sql(s"CALL graft.system.compact('$t', 2)").collect()
      assert(c.length == 1 && c(0).getInt(0) == 6 && c(0).getInt(1) == 2,
        c.mkString(","))
      assert(spark.sql(s"SELECT count(*) FROM graft.$t").head.getLong(0)
        == 60L)
      // retention: keep only the newest snapshot (the post-compaction
      // one) — the pre-compaction snapshots still referenced the six
      // small files
      val nV = ManifestV2Sink.versions(dir).length
      val e = spark.sql(
        s"CALL graft.system.expire_snapshots(table => '$t', keep => 1)")
        .collect()
      assert(e(0).getInt(0) == nV - 1 && e(0).getInt(1) == 1,
        e.mkString(","))
      // reclamation: the 6 pre-compaction files lost their last
      // references with the expiry — but a min_age_ms far in the
      // future skips them all (Delta-style retention guard) …
      val v0 = spark.sql(s"CALL graft.system.vacuum(table => '$t', " +
        "min_age_ms => 3600000)").collect()
      assert(v0(0).getInt(0) == 0, v0.mkString(","))
      assert(ManifestV2Sink.unreferencedFiles(dir).size == 6)
      // … and the default sweep deletes them
      val v = spark.sql(s"CALL graft.system.vacuum('$t')").collect()
      assert(v(0).getInt(0) == 6, v.mkString(","))
      assert(ManifestV2Sink.unreferencedFiles(dir).isEmpty)
      assert(spark.sql(s"SELECT count(*) FROM graft.$t").head.getLong(0)
        == 60L)
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  test("binpack compacts ONLY small files: right-sized files carry " +
    "over untouched") {
    val t = fresh()
    val dir = s"$root/$t"
    try {
      spark.sql(s"CREATE TABLE graft.$t (k BIGINT, v STRING)")
      // one BIG file (5000 rows) + 6 tiny ones (10 rows each)
      spark.sql(s"INSERT INTO graft.$t SELECT /*+ COALESCE(1) */ id, " +
        "repeat(CAST(id AS STRING), 8) FROM range(0, 5000)")
      (0 until 6).foreach { i =>
        spark.sql(s"INSERT INTO graft.$t SELECT /*+ COALESCE(1) */ id, " +
          s"CAST(id AS STRING) FROM range(${5000 + i * 10}, " +
          s"${5000 + i * 10 + 10})")
      }
      val bigFile = ManifestV2Sink.readManifest(dir).get._2
        .maxBy(e => ManifestV2Sink.entryRowsBytes(e).map(_._2).getOrElse(0L))
      val bigName = ManifestV2Sink.entryFile(bigFile)
      val bigSize = ManifestV2Sink.entryRowsBytes(bigFile).get._2
      val r = spark.sql(s"CALL graft.system.binpack(table => '$t', " +
        s"target_bytes => ${1L << 30}, min_bytes => $bigSize)").collect()
      assert(r(0).getInt(0) == 6 && r(0).getInt(1) == 1 &&
        r(0).getInt(2) == 1, r.mkString(","))
      // the big file is byte-identical and still listed — zero bytes
      // moved for it
      val after = ManifestV2Sink.committedDataFiles(dir)
      assert(after.size == 2 && after.contains(bigName),
        s"big file not carried: $after")
      assert(spark.sql(s"SELECT count(*) FROM graft.$t").head.getLong(0)
        == 5060L)
      // nothing to pack (all files right-sized) → no-op, no commit
      val vNow = ManifestV2Sink.versions(dir).max
      val r2 = spark.sql(s"CALL graft.system.binpack(table => '$t', " +
        s"target_bytes => ${1L << 30}, min_bytes => 1)").collect()
      assert(r2(0).getInt(0) == 0 && r2(0).getInt(2) == 2,
        r2.mkString(","))
      assert(ManifestV2Sink.versions(dir).max == vNow,
        "no-op binpack must not mint a version")
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  test("zorder via CALL re-clusters; unknown procedure/table fail " +
    "loudly") {
    val t = fresh()
    val dir = s"$root/$t"
    try {
      spark.sql(s"CREATE TABLE graft.$t (x BIGINT, y BIGINT)")
      spark.sql(s"INSERT INTO graft.$t SELECT id % 64, id div 64 " +
        "FROM range(0, 4096)")
      val z = spark.sql(
        s"CALL graft.system.zorder(table => '$t', cols => 'x,y', " +
          "bits => 2)").collect()
      assert(z(0).getInt(0) == 16, z.mkString(",")) // 2 bits × 2 cols
      assert(ManifestV2Sink.committedFileCount(dir) == 16)
      assert(spark.sql(s"SELECT count(*) FROM graft.$t").head.getLong(0)
        == 4096L)
      val e1 = intercept[Exception] {
        spark.sql(s"CALL graft.system.no_such_proc('$t')") }
      def chain(x: Throwable): String = {
        var c: Throwable = x; val sb = new StringBuilder
        while (c != null) { sb.append(c.getMessage).append(' '); c = c.getCause }
        sb.toString
      }
      assert(chain(e1).contains("no graft procedure") ||
        chain(e1).contains("FAILED_TO_LOAD_ROUTINE"), chain(e1))
      val e2 = intercept[Exception] {
        spark.sql("CALL graft.system.compact('no_such_table', 2)") }
      assert(e2.getMessage.toLowerCase.contains("table"), e2.getMessage)
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }
}
